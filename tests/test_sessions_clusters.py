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
