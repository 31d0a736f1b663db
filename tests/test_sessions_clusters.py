"""Boundary semantics for sessionization, rank-percentiles, and the
connected-components dedup clustering — the parts where an off-by-one
silently changes results without failing any smoke test."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators.dedup import connected_components

GAP_US = 30 * 60 * 1_000_000


def _sessions(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts_us long")
    return (
        df.groupBy(
            "user_id",
            F.session_window(F.timestamp_micros(F.col("ts_us")), "30 minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
        .collect()
    )


def test_session_window_exact_gap_splits(spark):
    # Spark merges TOUCHING windows: exactly 30 min apart → ONE session;
    # one microsecond more → two. The oracle's `diff > gap` flag matches.
    out = _sessions(spark, [(1, GAP_US), (1, 2 * GAP_US)])
    assert [r.n for r in out] == [2]
    out = _sessions(spark, [(1, GAP_US), (1, 2 * GAP_US + 1)])
    assert sorted(r.n for r in out) == [1, 1]


def test_session_window_sub_gap_chains(spark):
    # 29-min hops chain indefinitely even though the span exceeds 30 min
    hop = GAP_US - 60_000_000
    out = _sessions(spark, [(1, 0), (1, hop), (1, 2 * hop), (1, 3 * hop)])
    assert [r.n for r in out] == [4]


def test_nearest_rank_percentile_formula(spark):
    # ceil(0.5*4)=2 → second-smallest; ceil(0.95*4)=4 → max
    import math

    vals = [10, 20, 30, 40]
    assert vals[math.ceil(0.50 * len(vals)) - 1] == 20
    assert vals[math.ceil(0.95 * len(vals)) - 1] == 40


def test_connected_components_chain_merges(spark):
    # A-B, B-C, D-E: two components; labels are component minima
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    labels = {r.doc_id: r.label for r in connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 12-node path needs several propagation rounds — exercises the
    # fixpoint loop, not just the first iteration
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    labels = {r.doc_id: r.label for r in connected_components(pairs).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 13


def test_prefix_doubling_matches_python_suffix_sort(spark, tmp_path):
    """Property check for the distributed suffix-array build: on a
    corpus of adversarial short strings (runs, periodic patterns,
    overlapping repeats — the inputs where rank-pair logic usually
    breaks), the prefix-doubling ranks must equal a Python brute-force
    suffix sort exactly."""
    import pandas as pd

    from financial_arbitrage_data_pipeline_spark.operators.dedup import (
        suffix_array_fingerprint,
    )

    texts = [
        "aaaaaaaaaa",
        "abababababab",
        "banana",
        "mississippi",
        "abcabcabcabcabcx",
        "zyxwvutsrq",
        "aabaabaabaab",
        "a",
        "ab",
        "ba",
        "abracadabra abracadabra",
        "the quick brown fox jumps over the lazy dog",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": "en",
            "source": "test",
            "n_chars": [len(t) for t in texts],
        }
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        r.doc_id: (r.n_suffixes, r.suffix_order_md5, r.top_pos)
        for r in suffix_array_fingerprint(spark, sf_dir).collect()
    }
    import hashlib

    for doc_id, t in enumerate(texts):
        order = sorted(range(len(t)), key=lambda i: t[i:])
        rank = [0] * len(t)
        for pos_rank, i in enumerate(order, start=1):
            rank[i] = pos_rank
        expected_md5 = hashlib.md5(
            ",".join(str(x) for x in rank).encode()
        ).hexdigest()
        assert got[doc_id] == (len(t), expected_md5, order[0]), t


def test_shared_pairs_cache_invalidates_and_isolates(spark, tmp_path):
    """ADVICE r9 / VERDICT r9 task 7: the shared verified-edge cache
    (a) does not cross-contaminate two sf_dirs, (b) invalidates when
    the corpus at one sf_dir is regenerated in the SAME application,
    and (c) stays size-bounded."""
    import pandas as pd

    from financial_arbitrage_data_pipeline_spark.operators import dedup as D

    def write_corpus(d, texts):
        pdf = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": "en",
                "source": "test",
                "n_chars": [len(t) for t in texts],
            }
        )
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )

    base = "the quick brown fox jumps over the lazy dog and runs far away "
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    # corpus A: doc 7's recrawl twin (doc_id % 7 == 0) guarantees a pair
    write_corpus(a_dir, [base * 3, "completely different text here ok"])
    write_corpus(b_dir, ["unrelated single doc with no twin pairs"])

    builds = []
    real = D._lsh_verified_pairs

    def counting(spark_, sf_dir_):
        builds.append(sf_dir_)
        return real(spark_, sf_dir_)

    D._lsh_verified_pairs = counting
    try:
        D._SHARED_PAIRS.clear()
        a1 = D._lsh_verified_pairs_shared(spark, a_dir).count()
        a2 = D._lsh_verified_pairs_shared(spark, a_dir).count()
        assert a1 == a2 and len(builds) == 1  # cache hit, no rebuild
        D._lsh_verified_pairs_shared(spark, b_dir).count()
        assert len(builds) == 2  # (a) different sf_dir = different entry
        assert builds[-1] == b_dir  # ...built from B's corpus, not A's

        # (b) regenerate corpus A in place -> fingerprint changes -> rebuild
        import time

        time.sleep(0.05)  # ensure mtime_ns moves even on coarse clocks
        write_corpus(a_dir, [base * 3] * 4)  # 4 near-identical docs
        a3 = D._lsh_verified_pairs_shared(spark, a_dir).count()
        assert len(builds) == 3, "stale cache served after corpus rewrite"
        assert a3 > a1  # the new corpus has more verified pairs

        # (c) bound: hammer distinct fingerprints, cache never exceeds max
        for i in range(D._SHARED_PAIRS_MAX + 3):
            time.sleep(0.01)
            write_corpus(b_dir, [f"doc variant number {i} stands alone"])
            D._lsh_verified_pairs_shared(spark, b_dir).count()
        assert len(D._SHARED_PAIRS) <= D._SHARED_PAIRS_MAX
    finally:
        D._lsh_verified_pairs = real
        D._SHARED_PAIRS.clear()
