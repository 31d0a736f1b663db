"""Unit/property tests for the corpus-preparation decision operators
(`operators/corpusprep.py`) beyond what oracle parity covers: plan
shape, conservation laws, and short-input guards."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_arbitrage_data_pipeline_spark.operators import corpusprep
from financial_arbitrage_data_pipeline_spark.operators.dedup import crawl_union


def test_quality_gate_mask_partitions_corpus(spark, sf_dir):
    rows = corpusprep.corpus_quality_gate(spark, sf_dir).collect()
    docs_total = crawl_union(spark, sf_dir).filter(
        F.col("doc_id") < 1_000_000
    ).count()
    assert len(rows) == docs_total
    for r in rows:
        assert 0 <= r.reason_mask <= 7
        assert r.keep == (r.reason_mask == 0)


def test_quality_gate_is_pure_projection(spark, sf_dir):
    plan = corpusprep.corpus_quality_gate(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dedup_keep_canonical_conserves_docs(spark, sf_dir):
    out = corpusprep.dedup_keep_canonical(spark, sf_dir).collect()
    corpus = crawl_union(spark, sf_dir)
    total = corpus.count()
    distinct_fp = corpus.select(F.md5("text")).distinct().count()
    assert sum(r.n_docs for r in out) == total
    assert sum(r.n_survivors for r in out) == distinct_fp
    assert sum(r.n_dropped for r in out) == total - distinct_fp
    for r in out:
        assert r.n_survivors + r.n_dropped == r.n_docs
        assert (r.chars_dropped > 0) == (r.n_dropped > 0)


def test_global_shuffle_is_a_deterministic_permutation(spark, sf_dir):
    a = corpusprep.global_shuffle_order(spark, sf_dir).collect()
    n = len(a)
    positions = sorted(
        r.shard_id * corpusprep._SHARD_SIZE + r.pos_in_shard for r in a
    )
    assert positions == list(range(n))
    # full shards except possibly the last
    by_shard: dict[int, int] = {}
    for r in a:
        by_shard[r.shard_id] = by_shard.get(r.shard_id, 0) + 1
    last = max(by_shard)
    for shard, cnt in by_shard.items():
        assert cnt == corpusprep._SHARD_SIZE or shard == last
    # rerun → identical assignment (reproducible training order)
    b = corpusprep.global_shuffle_order(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_mixture_plan_targets_sum_to_budget(spark, sf_dir):
    rows = corpusprep.mixture_epoch_plan(spark, sf_dir).collect()
    assert sum(r.target_tokens for r in rows) == corpusprep._MIX_BUDGET
    for r in rows:
        assert 1 <= r.epochs <= corpusprep._MIX_MAX_EPOCHS
        cap = r.available_tokens * corpusprep._MIX_MAX_EPOCHS
        assert r.planned_tokens == min(r.target_tokens, cap)
        assert r.deficit_tokens == max(r.target_tokens - cap, 0)
        # epochs is exactly ceil(target/available), capped
        import math

        assert r.epochs == min(
            math.ceil(r.target_tokens / r.available_tokens),
            corpusprep._MIX_MAX_EPOCHS,
        )


def test_ngram_span_column_guards_short_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g"),           # 7 tokens < 8 → no grams
            (2, "a b c d e f g h"),         # exactly 8 → one gram
            (3, "a b c d e f g h i j"),     # 10 → three grams
            (4, ""),                        # empty text
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.grams
        for r in df.select(
            "doc_id", corpusprep.ngram_span_column(8).alias("grams")
        ).collect()
    }
    assert rows[1] == []
    assert rows[2] == ["a b c d e f g h"]
    assert rows[3] == ["a b c d e f g h", "b c d e f g h i", "c d e f g h i j"]
    assert rows[4] == []


def test_ngram_duplicate_spans_only_cross_doc(spark, sf_dir):
    rows = corpusprep.ngram_duplicate_spans(spark, sf_dir).collect()
    assert rows, "recrawl duplicates must produce repeated spans"
    for r in rows:
        assert r.n_docs >= 2
        assert r.n_occurrences >= r.n_docs
        assert r.first_doc_id < r.last_doc_id


def test_bpe_merge_application_is_greedy_non_overlapping(spark):
    """'a a a' must merge ONCE (left pair), not twice — the sentinel-
    wrapped replace() encodes BPE's greedy application order, with
    identical semantics in DuckDB (see _bpe_oracle)."""
    df = spark.createDataFrame([("\x02a\x02\x02a\x02\x02a\x02",)], "s string")
    out = df.select(
        F.expr(
            "replace(s, concat(chr(2), 'a', chr(2), chr(2), 'a', chr(2)),"
            " concat(chr(2), 'a', chr(1), 'a', chr(2)))"
        ).alias("m")
    ).first()
    assert out.m == "\x02a\x01a\x02\x02a\x02"


def test_bpe_train_merges_rounds_are_consistent(spark, sf_dir):
    from financial_arbitrage_data_pipeline_spark.operators.textstats import (
        bpe_train_merges,
    )

    rows = sorted(
        bpe_train_merges(spark, sf_dir).collect(), key=lambda r: r.merge_round
    )
    assert [r.merge_round for r in rows] == [0, 1, 2]
    for prev, cur in zip(rows, rows[1:]):
        # token total strictly decreases, by at most the pre-merge pair
        # count (overlaps merge fewer times than they are counted)
        assert cur.tokens_after < prev.tokens_after
        assert prev.tokens_after - cur.tokens_after <= cur.pair_count + prev.pair_count
    for r in rows:
        assert "|" in r.merged_pair and r.pair_count > 0


def test_shard_manifest_matches_shuffle_order(spark, sf_dir):
    manifest = {
        r.shard_id: r
        for r in corpusprep.shard_manifest(spark, sf_dir).collect()
    }
    order = corpusprep.global_shuffle_order(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in order:
        by_shard.setdefault(r.shard_id, []).append(r)
    assert set(manifest) == set(by_shard)
    for sid, rows in by_shard.items():
        rows.sort(key=lambda r: r.pos_in_shard)
        m = manifest[sid]
        assert m.n_docs == len(rows)
        assert m.first_doc_id == rows[0].doc_id
        assert m.last_doc_id == rows[-1].doc_id


def test_bpe_encode_consistent_with_trainer_totals(spark, sf_dir):
    from financial_arbitrage_data_pipeline_spark.operators.textstats import (
        bpe_encode_corpus,
        bpe_train_merges,
    )

    enc = bpe_encode_corpus(spark, sf_dir).collect()
    rounds = sorted(
        bpe_train_merges(spark, sf_dir).collect(), key=lambda r: r.merge_round
    )
    # the corpus token total after the last merge equals the trainer's
    # final tokens_after, and every doc shrank by exactly its merges
    assert sum(r.n_tokens_after for r in enc) == rounds[-1].tokens_after
    for r in enc:
        assert r.n_tokens_before - r.n_tokens_after >= 0
        assert r.n_merged_symbols <= r.n_tokens_before - r.n_tokens_after + r.n_merged_symbols


def test_quality_percentile_cut_keeps_top_fraction_per_lang(spark, sf_dir):
    from financial_arbitrage_data_pipeline_spark.operators.dedup import (
        crawl_union as _cu,
    )

    kept = corpusprep.quality_percentile_cut(spark, sf_dir).collect()
    totals = {
        r.lang: r.n
        for r in _cu(spark, sf_dir)
        .filter(F.col("doc_id") < 1_000_000)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_lang: dict[str, int] = {}
    for r in kept:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    for lang, n_total in totals.items():
        # exactly floor(f*n) lowest-ranked docs are dropped per stratum
        drop = n_total * int(corpusprep._CUT_FRACTION * 100) // 100
        assert by_lang.get(lang, 0) == n_total - drop


def test_doc_duplicate_span_load_bounds(spark, sf_dir):
    rows = corpusprep.doc_duplicate_span_load(spark, sf_dir).collect()
    assert rows
    full_dup = 0
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert abs(r.dup_load - r.n_dup_spans / r.n_spans) < 1e-12
        if r.dup_load == 1.0:
            full_dup += 1
    # recrawled docs (every 7th, duplicated verbatim under a new id)
    # must show up as 100%-duplicate-span documents
    assert full_dup > 0


def test_lr_train_negative_moment_downscale_parity(spark, tmp_path):
    """Regression (ADVICE r10): when the downscale dd > 1 and a signed
    moment (r1/rt/rs) is negative and not divisible by dd, Python //
    floors while DuckDB // truncates toward zero — the engine and
    oracle betas diverged. Build a corpus that forces dd = 2 with an
    ODD NEGATIVE rs (and rt), and assert the published betas still
    hash-match the oracle SQL bit for bit."""
    import duckdb

    rows = []
    # 280 max-length docs push stt = sum(t^2) past the 1e9 downscale
    # threshold (280 * 2000^2 = 1.12e9 => dd = 2); all lang 'xx' so the
    # signed moments go negative.
    filler = ("w " * corpusprep._LR_FEAT_CAP).strip()
    for i in range(280):
        rows.append((i, filler, "xx", "synth", len(filler)))
    # variety docs: varying t and s so the 3x3 system is nonsingular
    for j in range(20):
        s = j % 4
        t = 100 + j
        text = ("the " * s + "w " * (t - s)).strip()
        rows.append((1000 + j, text, "xx" if j else "en", "synth", len(text)))
    # one extra doc with s=3 stopwords makes sum(s*u) odd => rs odd
    rows.append((2000, ("the the the w w").strip(), "xx", "synth", 15))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    # pre-flight: the corpus really exercises the hazard
    b0, b1, b2 = corpusprep._lr_model(spark, sf_dir)
    feat = duckdb.sql(
        f"""
        WITH {corpusprep._LR_MOMENTS_SQL.replace("FROM documents",
            f"FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')", 1)}
        SELECT b0, b1, b2 FROM beta
        """
    ).fetchone()
    assert (b0, b1, b2) == tuple(int(x) for x in feat)
    assert (b0, b1, b2) != (0, 0, 0), "det must be nonzero for the pin to bite"
