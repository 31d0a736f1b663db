"""Corpus-preparation operators for LLM training pipelines: the
keep/drop quality gate, the materialized dedup accounting, the
deterministic global shuffle, the mixture/epoch upsampling plan, and the
repeated-n-gram span detector.

These compose the per-signal passes in `textstats.py` / `dedup.py` into
the DECISION operators a 100 TB pipeline actually runs: which docs
survive, in what order they are written, and how each source is
up/downsampled to hit the training mixture.

Scale notes: the gate and shuffle are single-pass (one projection, one
range-partitioned sort); dedup accounting and span detection shuffle on
content hashes (bounded by corpus tokens, the unavoidable minimum); the
mixture plan's only data-sized stage is one per-source aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .dedup import _CRAWL_UNION_SQL, crawl_union
from .textstats import STOPWORDS

# ---------------------------------------------------------------------------
# Composite quality gate (Gopher/C4-style rule stack → keep/drop + reasons)
# ---------------------------------------------------------------------------
_GATE_MIN_TOKENS = 30
_GATE_MAX_REPETITION = 0.65  # 1 - distinct/total
_GATE_MAX_AVG_TOKLEN = 4.9

_GATE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, source,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, lang, source,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         list_sum(list_transform(toks, x -> length(x))) AS tok_chars
  FROM t
),
r AS (
  SELECT doc_id, lang, source, n_tokens,
         CASE WHEN n_tokens < {_GATE_MIN_TOKENS} THEN 1 ELSE 0 END
         + CASE WHEN 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens
                     > {_GATE_MAX_REPETITION} THEN 2 ELSE 0 END
         + CASE WHEN CAST(tok_chars AS DOUBLE) / n_tokens
                     > {_GATE_MAX_AVG_TOKLEN} THEN 4 ELSE 0 END
         AS reason_mask
  FROM m
)
SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(reason_mask AS INTEGER) AS reason_mask,
       reason_mask = 0 AS keep
FROM r
"""


def quality_gate_columns(docs: DataFrame) -> DataFrame:
    """Apply the gate rule stack to any documents-shaped frame (batch OR
    streaming — every expression is a stateless per-row projection, so
    the same column builder serves both lanes and their semantics
    cannot diverge)."""
    toks = F.expr("filter(split(text, ' '), x -> x <> '')")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    repetition = F.lit(1.0) - n_distinct.cast("double") / n_tokens
    avg_toklen = tok_chars.cast("double") / n_tokens
    mask = (
        F.when(n_tokens < _GATE_MIN_TOKENS, 1).otherwise(0)
        + F.when(repetition > _GATE_MAX_REPETITION, 2).otherwise(0)
        + F.when(avg_toklen > _GATE_MAX_AVG_TOKLEN, 4).otherwise(0)
    )
    return docs.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.cast("long").alias("n_tokens"),
        mask.cast("int").alias("reason_mask"),
        (mask == 0).alias("keep"),
    )


@query(
    "corpus_quality_gate",
    oracle=_GATE_SQL,
    tags=("corpus-prep", "quality-gate"),
)
def corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop DECISION operator: composes the standard
    pre-training heuristics (minimum length, repetition ceiling, mean
    token length ceiling — the Gopher/C4 rule stack shape) into one
    reason BITMASK per document, so a dropped doc carries exactly which
    rules it failed (auditable filtering, not a silent gate). Pure
    in-row projection — array HOFs only, no explode, no shuffle — so at
    100 TB this is a single corpus scan that co-schedules with whatever
    pass runs next."""
    return quality_gate_columns(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Materialized exact-dedup accounting: what the deduped corpus looks like
# ---------------------------------------------------------------------------
@query(
    "dedup_keep_canonical",
    oracle=f"""
WITH corpus AS ({_CRAWL_UNION_SQL}),
fp AS (
  SELECT doc_id, lang, length(text) AS n_chars_fp, md5(text) AS fingerprint,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_doc_id
  FROM corpus
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE doc_id = keep_doc_id) AS BIGINT) AS n_survivors,
       CAST(COUNT(*) FILTER (WHERE doc_id <> keep_doc_id) AS BIGINT) AS n_dropped,
       CAST(COALESCE(SUM(n_chars_fp) FILTER (WHERE doc_id <> keep_doc_id), 0)
            AS BIGINT) AS chars_dropped
FROM fp GROUP BY lang
""",
    tags=("canonical-scale", "corpus-prep", "dedup-exact"),
)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized DEDUP OUTPUT accounting: apply keep-min-doc_id over
    exact content fingerprints to the two-crawl corpus and report, per
    language, how many documents survive and how many bytes the dedup
    actually saves — the number a storage planner needs before
    committing the deduped corpus. `exact_dedup` reports the duplicate
    GROUPS; this operator reports the resulting CORPUS. Plan: one
    shuffle on the md5 fingerprint (window min per fingerprint — the
    keeper assignment), then a per-lang aggregate over L rows. At 100 TB
    the fingerprint shuffle is the unavoidable minimum for exact dedup;
    wide text never crosses the exchange (only doc_id/lang/md5/length
    are carried)."""
    corpus = crawl_union(spark, sf_dir)
    fp = corpus.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_fp"),
        F.md5("text").alias("fingerprint"),
    ).withColumn(
        "keep_doc_id", F.min("doc_id").over(Window.partitionBy("fingerprint"))
    )
    dropped = F.col("doc_id") != F.col("keep_doc_id")
    return fp.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(~dropped, 1)).alias("n_survivors"),
        F.count(F.when(dropped, 1)).alias("n_dropped"),
        F.coalesce(
            F.sum(F.when(dropped, F.col("n_chars_fp"))), F.lit(0)
        ).cast("long").alias("chars_dropped"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle → sharded training order
# ---------------------------------------------------------------------------
_SHARD_SIZE = 64
_SHUF_BUCKETS = 128  # 2^32 hash space / 2^25 per bucket

_SHUF_HEX8 =" + ".join(
    f"(strpos('0123456789abcdef',"
    f" substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), {1 + i}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)


@query(
    "global_shuffle_order",
    oracle=f"""
WITH h AS (SELECT doc_id, ({_SHUF_HEX8}) AS shuffle_key FROM documents),
r AS (
  SELECT doc_id, shuffle_key,
         ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1 AS pos
  FROM h
)
SELECT doc_id, CAST(shuffle_key AS BIGINT) AS shuffle_key,
       CAST(pos // {_SHARD_SIZE} AS BIGINT) AS shard_id,
       CAST(pos % {_SHARD_SIZE} AS BIGINT) AS pos_in_shard
FROM r
""",
    tags=("corpus-prep", "shuffle", "W1"),
)
def global_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE into fixed-size training shards:
    order the corpus by a salted content-independent hash of the row id
    and assign (shard_id, pos_in_shard). Reproducible under reruns,
    repartitioning, and cluster-size changes — unlike orderBy(rand()) —
    so a training run can be resumed or exactly re-created from the
    shard manifest.

    The naive formulation (row_number over a global-ORDER window) plans
    as a SinglePartition exchange — every row through one task, the
    classic global-window bottleneck. Instead the global rank is
    computed in TWO bounded phases: (1) bucket each row by the high
    bits of its hash key (order-preserving: key div 2^25, so bucket
    order = key order), rank locally inside each bucket — one keyed
    shuffle, {_SHUF_BUCKETS} ways parallel, uniform by construction
    because the keys are hashes; (2) prefix-sum the {_SHUF_BUCKETS}
    bucket counts into starting offsets (a window over B rows, not N)
    and broadcast-join them back. global_pos = offset + local_rank - 1
    is exact regardless of how rows spread across buckets. At 100 TB
    nothing funnels: the data path is one hash shuffle + one broadcast
    join, and B scales with the cluster, not the data."""
    docs = load_table(spark, sf_dir, "documents")
    hkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    # keys are uniform in [0, 2^32); high 7 bits → _SHUF_BUCKETS buckets
    keyed = docs.select("doc_id", hkey.alias("shuffle_key")).withColumn(
        "bucket_id", (F.col("shuffle_key") / F.lit(2 ** 25)).cast("long")
    )
    w_local = Window.partitionBy("bucket_id").orderBy("shuffle_key", "doc_id")
    local = keyed.withColumn("local_rank", F.row_number().over(w_local))
    counts = keyed.groupBy("bucket_id").agg(F.count(F.lit(1)).alias("n"))
    w_off = Window.orderBy("bucket_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "bucket_id",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    pos = (F.col("offset") + F.col("local_rank") - 1).cast("long")
    return local.join(F.broadcast(offsets), "bucket_id").select(
        "doc_id",
        "shuffle_key",
        (pos / _SHARD_SIZE).cast("long").alias("shard_id"),
        (pos % _SHARD_SIZE).cast("long").alias("pos_in_shard"),
    )


# ---------------------------------------------------------------------------
# Mixture/epoch upsampling plan (data-constrained scaling accounting)
# ---------------------------------------------------------------------------
_MIX_BUDGET = 200_000
_MIX_MAX_EPOCHS = 4


@query(
    "mixture_epoch_plan",
    oracle=f"""
WITH avail AS (
  SELECT source, SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
           AS available_tokens
  FROM documents GROUP BY source
),
shares AS (
  SELECT source, available_tokens,
         {_MIX_BUDGET} // (SELECT COUNT(*) FROM avail) AS base,
         {_MIX_BUDGET} % (SELECT COUNT(*) FROM avail) AS leftover,
         ROW_NUMBER() OVER (ORDER BY source) AS rr
  FROM avail
),
tgt AS (
  SELECT source, available_tokens,
         base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS target_tokens
  FROM shares
)
SELECT source, CAST(available_tokens AS BIGINT) AS available_tokens,
       CAST(target_tokens AS BIGINT) AS target_tokens,
       CAST(LEAST((target_tokens + available_tokens - 1) // available_tokens,
                  {_MIX_MAX_EPOCHS}) AS BIGINT) AS epochs,
       CAST(LEAST(target_tokens,
                  available_tokens * {_MIX_MAX_EPOCHS}) AS BIGINT)
         AS planned_tokens,
       CAST(GREATEST(target_tokens - available_tokens * {_MIX_MAX_EPOCHS}, 0)
            AS BIGINT) AS deficit_tokens
FROM tgt
""",
    tags=("corpus-prep", "mixture"),
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source UPSAMPLING plan for a uniform target mixture: each
    source owes budget/S tokens (largest-remainder integer split, so
    targets sum exactly to the budget); a source short of its target is
    repeated for ceil(target/available) epochs, capped at
    {_MIX_MAX_EPOCHS} passes (the data-constrained-scaling repeat
    ceiling), and anything still short is reported as an explicit
    deficit instead of being silently re-weighted. All integer-exact —
    ceilings via (a+b-1) div b, no float apportionment. Plan: ONE
    per-source aggregate is the only data-sized stage; the
    apportionment is a window over S rows."""
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(F.size(F.expr("filter(split(text, ' '), x -> x <> '')")))
        .cast("long")
        .alias("available_tokens")
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy("source")
    n_src = F.count(F.lit(1)).over(w_all)
    shares = avail.select(
        "source",
        "available_tokens",
        (F.lit(_MIX_BUDGET) / n_src).cast("long").alias("base"),
        (F.lit(_MIX_BUDGET) % n_src).alias("leftover"),
        F.row_number().over(w_rank).alias("rr"),
    )
    target = F.col("base") + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
    tgt = shares.select(
        "source", "available_tokens", target.cast("long").alias("target_tokens")
    )
    ceil_epochs = (
        (F.col("target_tokens") + F.col("available_tokens") - 1)
        / F.col("available_tokens")
    ).cast("long")
    cap = F.col("available_tokens") * _MIX_MAX_EPOCHS
    return tgt.select(
        "source",
        "available_tokens",
        "target_tokens",
        F.least(ceil_epochs, F.lit(_MIX_MAX_EPOCHS)).cast("long").alias("epochs"),
        F.least(F.col("target_tokens"), cap).cast("long").alias("planned_tokens"),
        F.greatest(F.col("target_tokens") - cap, F.lit(0))
        .cast("long")
        .alias("deficit_tokens"),
    )


# ---------------------------------------------------------------------------
# Repeated-n-gram span detection (substring-dedup signal, Lee et al. shape)
# ---------------------------------------------------------------------------
_SPAN_N = 8


def ngram_span_column(n: int) -> "F.Column":
    """Array of all whitespace n-grams of `text`, built in-row. Guarded:
    docs with fewer than n tokens yield an EMPTY array on both engines —
    Spark's sequence(1, k) with k < 1 would produce a DESCENDING array
    (the BPE short-doc trap, ADVICE r4), so the CASE must short-circuit
    before sequence() is evaluated."""
    return F.expr(
        f"""
        CASE WHEN size(filter(split(text, ' '), x -> x <> '')) >= {n}
             THEN transform(
                    sequence(1, size(filter(split(text, ' '), x -> x <> '')) - {n - 1}),
                    i -> array_join(
                          slice(filter(split(text, ' '), x -> x <> ''), i, {n}), ' '))
             ELSE array()
        END
        """
    )


@query(
    "ngram_duplicate_spans",
    oracle=f"""
WITH corpus AS ({_CRAWL_UNION_SQL}),
tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM corpus
),
g AS (
  SELECT doc_id,
         array_to_string(list_slice(t, i, i + {_SPAN_N - 1}), ' ') AS gram
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {_SPAN_N - 1})) AS i
        FROM tok WHERE len(t) >= {_SPAN_N})
)
SELECT md5(gram) AS gram_hash,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc_id,
       MAX(doc_id) AS last_doc_id
FROM g
GROUP BY md5(gram)
HAVING COUNT(DISTINCT doc_id) > 1
""",
    tags=("corpus-prep", "dedup-spans"),
)
def ngram_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact repeated {_SPAN_N}-gram SPANS across documents — the
    substring-duplication signal (Lee et al., "Deduplicating Training
    Data Makes Language Models Better"): a span occurring in more than
    one document marks boilerplate/quotation that document-level dedup
    cannot see. Per-position grams are built IN-ROW (slice + join over
    the token array — guarded so docs shorter than {_SPAN_N} tokens
    yield zero grams on both engines, no descending-sequence trap), then
    one explode + one aggregate keyed on the gram hash. At 100 TB the
    shuffle carries one md5 per token position — the floor for exact
    span detection; only hashes cross the exchange, never gram text."""
    corpus = crawl_union(spark, sf_dir)
    grams = ngram_span_column(_SPAN_N)
    exploded = corpus.select(
        "doc_id", F.explode(grams).alias("gram")
    ).select("doc_id", F.md5("gram").alias("gram_hash"))
    return (
        exploded.groupBy("gram_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Streaming corpus gate: the quality gate run as a Structured Streaming
# lane with a physically-bifurcating (partitioned) sink.
# ---------------------------------------------------------------------------
@query(
    "streaming_corpus_gate",
    oracle=f"""
WITH g AS ({_GATE_SQL})
SELECT lang, keep,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM g GROUP BY lang, keep
""",
    tags=("corpus-prep", "quality-gate", "streaming", "T4"),
)
def streaming_corpus_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality gate as a STREAMING lane: documents arrive in
    micro-batches (file replay, one chunk per trigger), the gate columns
    are computed in-stream by the SAME `quality_gate_columns` builder
    the batch query uses (shared kernel — semantics cannot diverge), and
    the sink physically BIFURCATES accepted from rejected docs via a
    keep-partitioned parquet layout (the T4 two-lane shape: downstream
    training readers scan keep=true only, audit readers scan
    keep=false, no second pass). Checkpointed availableNow execution =
    exactly-once landing; the oracle recomputes the gate on the
    ORIGINAL table, so equality proves no doc was lost, duplicated, or
    re-scored across micro-batch boundaries. At 100 TB this is the
    shape incremental crawls actually run — only new chunks flow, and
    the gate is a stateless projection so there is no streaming state
    at all."""
    import os
    import shutil

    from .streaming_queries import _workdir

    root = _workdir()
    try:
        docs = load_table(spark, sf_dir, "documents")
        chunk_dir = os.path.join(root, "chunks")
        docs.repartition(4).write.parquet(chunk_dir)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(chunk_dir)
        )
        gated = quality_gate_columns(stream)
        out_dir = os.path.join(root, "gated")
        q = (
            gated.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(root, "ckpt"))
            .partitionBy("keep")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # `keep` rides as a PARTITION value; Spark's partition-type
        # inference yields string, so restore the oracle's boolean type
        landed = spark.read.parquet(out_dir).withColumn(
            "keep", F.col("keep").cast("boolean")
        )
        return (
            landed.groupBy("lang", "keep")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("total_tokens"),
            )
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Shard manifest: the writer-side artifact of the global shuffle
# ---------------------------------------------------------------------------
@query(
    "shard_manifest",
    oracle=f"""
WITH h AS (SELECT doc_id, ({_SHUF_HEX8}) AS shuffle_key FROM documents),
r AS (
  SELECT doc_id, shuffle_key,
         ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1 AS pos
  FROM h
),
j AS (
  SELECT r.doc_id, r.pos // {_SHARD_SIZE} AS shard_id,
         r.pos % {_SHARD_SIZE} AS pos_in_shard,
         len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS n_toks
  FROM r JOIN documents d ON d.doc_id = r.doc_id
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       min_by(doc_id, pos_in_shard) AS first_doc_id,
       max_by(doc_id, pos_in_shard) AS last_doc_id
FROM j GROUP BY shard_id
""",
    tags=("corpus-prep", "shuffle", "manifest"),
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MANIFEST a training-shard writer commits next to the shards:
    per shard_id, the document count, token total, and the first/last
    document in shard order — what a dataloader needs to resume an
    epoch mid-shard and what an auditor needs to re-derive any shard
    without re-running the shuffle. Built ON TOP of
    `global_shuffle_order` (the same deterministic bucket-ranked
    permutation), joined back to the corpus for token weights and
    reduced per shard. At 100 TB: the join is keyed on doc_id (both
    sides hash-partition; text never moves — only its token count) and
    the manifest itself is ~N/{_SHARD_SIZE} rows, written once."""
    order = global_shuffle_order(spark, sf_dir)
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
        .cast("long")
        .alias("n_toks"),
    )
    return (
        order.join(toks, "doc_id")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.min_by("doc_id", "pos_in_shard").alias("first_doc_id"),
            F.max_by("doc_id", "pos_in_shard").alias("last_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Relative quality cut: drop the worst X% per language (the percentile
# sibling of the absolute-threshold gate)
# ---------------------------------------------------------------------------
_CUT_FRACTION = 0.2  # drop the bottom 20% per language


@query(
    "quality_percentile_cut",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_distinct,
         list_sum(list_transform(toks, x -> length(x))) AS tok_chars
  FROM t
),
s AS (
  SELECT doc_id, lang,
         LEAST(1.0, n_tokens / 100.0) * 0.5
           + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3
           + LEAST(1.0, (CAST(tok_chars AS DOUBLE) / n_tokens) / 8.0) * 0.2
           AS score
  FROM m
),
r AS (
  SELECT doc_id, lang, score,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score, doc_id)
           AS quality_rank,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM s
)
SELECT doc_id, lang, score, CAST(quality_rank AS BIGINT) AS quality_rank
FROM r WHERE quality_rank > (n * {int(_CUT_FRACTION * 100)}) // 100
""",
    tags=("corpus-prep", "quality-gate", "percentile"),
)
def quality_percentile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIVE quality filtering: score every document (the
    `text_quality` blend restated with distinct-ratio in place of
    stop-ratio so it is self-contained) and keep everything at or above
    the per-language {_CUT_FRACTION:.0%} mark — the
    budget-against-distribution cut a pipeline uses when an absolute
    threshold would gut one language and pass everything in another.
    The cut is COUNT-exact, not percent_rank-based: drop exactly
    floor(f*n) lowest-ranked docs per stratum (integer arithmetic,
    identical in both engines) — percent_rank would silently drop the
    only document of a 1-doc stratum (its pct_rank is 0.0), where the
    count rule correctly drops floor(0.2*1) = 0. Deterministic under
    ties (rank ordered by score THEN doc_id). Plan: pure projection +
    one per-lang window sort — one shuffle keyed on the stratum, the
    same WindowGroupLimit-family shape as the exact-N sampler."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), x -> x <> '')")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = (
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * 0.5
        + (n_distinct.cast("double") / n_tokens) * 0.3
        + F.least(
            F.lit(1.0), (tok_chars.cast("double") / n_tokens) / F.lit(8.0)
        )
        * 0.2
    )
    w = Window.partitionBy("lang").orderBy("score", "doc_id")
    wn = Window.partitionBy("lang")
    drop_n = (F.count(F.lit(1)).over(wn) * int(_CUT_FRACTION * 100) / 100).cast(
        "long"
    )
    return (
        docs.select("doc_id", "lang", score.alias("score"))
        .withColumn("quality_rank", F.row_number().over(w).cast("long"))
        .withColumn("__drop_n", drop_n)
        .filter(F.col("quality_rank") > F.col("__drop_n"))
        .drop("__drop_n")
    )


# ---------------------------------------------------------------------------
# Per-document duplicate-span load: how much of each doc is boilerplate
# ---------------------------------------------------------------------------
@query(
    "doc_duplicate_span_load",
    oracle=f"""
WITH corpus AS ({_CRAWL_UNION_SQL}),
tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM corpus
),
g AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(t, i, i + {_SPAN_N - 1}), ' '))
           AS gram_hash
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {_SPAN_N - 1})) AS i
        FROM tok WHERE len(t) >= {_SPAN_N})
),
dup AS (
  SELECT gram_hash FROM g GROUP BY gram_hash
  HAVING COUNT(DISTINCT doc_id) > 1
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(*) FILTER (WHERE d.gram_hash IS NOT NULL) AS BIGINT)
         AS n_dup_spans,
       CAST(COUNT(*) FILTER (WHERE d.gram_hash IS NOT NULL) AS DOUBLE)
         / COUNT(*) AS dup_load
FROM g LEFT JOIN dup d ON d.gram_hash = g.gram_hash
GROUP BY g.doc_id
""",
    tags=("corpus-prep", "dedup-spans"),
)
def doc_duplicate_span_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BOILERPLATE LOAD: the fraction of a doc's
    {_SPAN_N}-gram positions that also occur in some other document —
    the per-doc decision signal substring dedup acts on (a doc that is
    90% shared spans is a template; 5% is a quotation). Two passes over
    the same in-row gram stream: the cross-doc duplicate span set
    (`ngram_duplicate_spans`' keyed aggregate) LEFT-joined back to each
    doc's positions, then one per-doc reduce. Shuffles are keyed on
    gram hash and doc_id only — gram text never crosses an exchange.
    The dup-set side is O(duplicated grams) — corpus-scale, so it is
    pinned SHUFFLE_HASH: at sf1 under the driver's vanilla 1 GB heap
    Catalyst's post-agg estimate let it broadcast and the build OOMed
    (SCALE.md §39); at 100 TB the same side is terabytes."""
    corpus = crawl_union(spark, sf_dir)
    grams = ngram_span_column(_SPAN_N)
    g = corpus.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", F.md5("gram").alias("gram_hash")
    )
    dup = (
        g.groupBy("gram_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram_hash", F.lit(True).alias("is_dup"))
    )
    joined = g.join(dup.hint("shuffle_hash"), "gram_hash", "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count(F.when(F.col("is_dup"), 1)).alias("n_dup_spans"),
        (
            F.count(F.when(F.col("is_dup"), 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("dup_load"),
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: refresh per-language stats from a
# snapshot DIFF instead of re-scanning the new corpus
# ---------------------------------------------------------------------------
@query(
    "incremental_lang_stats",
    oracle="""
WITH v2 AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, lang, text
  FROM documents WHERE doc_id % 11 = 0
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM v2 GROUP BY lang
""",
    tags=("corpus-prep", "incremental", "ivm"),
)
def incremental_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE: the per-language corpus statistics
    are refreshed by applying the v1→v2 snapshot DELTA to the v1
    aggregate — one signed aggregation over the CHANGED rows only —
    instead of re-scanning the new corpus. Additions contribute
    (+1, +chars); removals (-1, -chars); rewrites (0, chars_new −
    chars_old). The ORACLE is the full recompute over v2, so a hash
    match PROVES the maintenance algebra (the classic count/sum IVM
    delta rules) reaches the exact same state. Uses the same
    fixture-derived v2 as `corpus_snapshot_diff` (drop %13, rewrite %7,
    add %11 re-keyed). At 100 TB this is the difference between a
    churn-sized and a corpus-sized refresh — the delta aggregation is
    keyed on lang and touches only changed keys."""
    base = load_table(spark, sf_dir, "documents")
    v1_stats = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    # the delta stream (what a CDC feed / snapshot diff would emit)
    removed = base.filter(
        (F.col("doc_id") % 13 == 0)
    ).select("lang", F.lit(-1).alias("d_docs"), (-F.length("text")).alias("d_chars"))
    rewritten = base.filter(
        (F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 7 == 0)
    ).select(
        "lang",
        F.lit(0).alias("d_docs"),
        # ' v2' suffix adds exactly 3 chars
        F.lit(3).alias("d_chars"),
    )
    added = base.filter(F.col("doc_id") % 11 == 0).select(
        "lang", F.lit(1).alias("d_docs"), F.length("text").alias("d_chars")
    )
    delta = (
        removed.unionByName(rewritten)
        .unionByName(added)
        .groupBy("lang")
        .agg(
            F.sum("d_docs").alias("dd"),
            F.sum("d_chars").alias("dc"),
        )
    )
    return (
        v1_stats.join(delta, "lang", "left")
        .select(
            "lang",
            (F.col("n_docs") + F.coalesce(F.col("dd"), F.lit(0)))
            .cast("long")
            .alias("n_docs"),
            (F.col("total_chars") + F.coalesce(F.col("dc"), F.lit(0)))
            .cast("long")
            .alias("total_chars"),
        )
        .filter(F.col("n_docs") > 0)
    )


# ---------------------------------------------------------------------------
# PPS systematic sampling (probability proportional to size) — the exact,
# integer-arithmetic cousin of weighted reservoir sampling
# ---------------------------------------------------------------------------
_PPS_K = 100


@query(
    "pps_systematic_sample",
    oracle=f"""
WITH h AS (SELECT doc_id, n_chars, ({_SHUF_HEX8}) AS skey FROM documents),
c AS (
  SELECT doc_id, n_chars, skey,
         SUM(n_chars) OVER (ORDER BY skey, doc_id ROWS UNBOUNDED PRECEDING) AS cum_w
  FROM h
),
t AS (SELECT SUM(n_chars) // {_PPS_K} AS step FROM documents)
SELECT doc_id, n_chars, CAST(cum_w AS BIGINT) AS cum_w,
       CAST(cum_w // step - (cum_w - n_chars) // step AS BIGINT) AS n_ticks
FROM c, t
WHERE (cum_w - n_chars) // step < cum_w // step
""",
    tags=("corpus-prep", "sampling", "W1"),
)
def pps_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample (probability proportional to size): walk the
    corpus in a deterministic salted-hash order, accumulate token weight
    (n_chars), and select every document whose cumulative weight crosses
    a multiple of step = total_weight / k. Each selection's `n_ticks`
    (multiples crossed) is the standard PPS multiplicity — a document
    heavier than the step is drawn more than once. This is the exact
    integer-arithmetic construction of the weighted training-mixture
    draw (the A-ES exponential-race formulation needs log/pow, whose
    libm rounding differs across engines; the systematic walk needs only
    integer sums and floor divides, so the oracle hash-matches).

    Scale shape: the cumulative sum is NOT a single-partition global
    window — it reuses global_shuffle_order's two-phase prefix sum
    (hash-high-bit buckets are uniform by construction: rank locally per
    bucket, prefix-sum the bucket TOTALS on the driver-sized side,
    broadcast the offsets back). The only all-rows reduction is the
    1-row total-weight scalar, combined via a broadcast (allowlisted
    1-row BNLJ pattern). At 100 TB: one keyed shuffle + one broadcast —
    the same plan the shard assignment runs.

    Weights here are n_chars (the tokenizer-cost proxy);
    `token_budget_allocation` holds the per-source budget variant."""
    docs = load_table(spark, sf_dir, "documents")
    hkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    keyed = docs.select(
        "doc_id", F.col("n_chars").cast("long").alias("w"), hkey.alias("skey")
    ).withColumn("bucket_id", (F.col("skey") / F.lit(2 ** 25)).cast("long"))
    w_local = (
        Window.partitionBy("bucket_id")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = keyed.withColumn("local_cum", F.sum("w").over(w_local))
    totals = keyed.groupBy("bucket_id").agg(F.sum("w").alias("bw"))
    w_off = Window.orderBy("bucket_id").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket_id", F.coalesce(F.sum("bw").over(w_off), F.lit(0)).alias("offset")
    )
    step_df = docs.agg(
        F.expr(f"sum(cast(n_chars as bigint)) div {_PPS_K}").alias("step")
    )
    cum = (
        local.join(F.broadcast(offsets), "bucket_id")
        .withColumn("cum_w", F.col("offset") + F.col("local_cum"))
        .join(F.broadcast(step_df))
    )
    return (
        cum.withColumn(
            "n_ticks",
            F.expr("cum_w div step") - F.expr("(cum_w - w) div step"),
        )
        .filter(F.col("n_ticks") > 0)
        .select("doc_id", F.col("w").alias("n_chars"), "cum_w", "n_ticks")
    )


# ---------------------------------------------------------------------------
# Quality-classifier training: exact decision-stump split scoring (the
# fastText-classifier stage of a corpus pipeline, reduced to its
# integer-exact core)
# ---------------------------------------------------------------------------
_SPLIT_PPM = 1_000_000


@query(
    "feature_split_gini",
    oracle=f"""
WITH t AS (
  SELECT n_chars, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
m AS (
  SELECT CAST(n_chars AS BIGINT) AS n_chars,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         list_sum(list_transform(toks, x -> length(x))) AS tok_chars
  FROM t WHERE len(toks) > 0
),
lab AS (
  SELECT n_chars, n_tokens,
         n_distinct * {_SPLIT_PPM} // n_tokens AS distinct_ppm,
         CASE WHEN n_tokens >= {_GATE_MIN_TOKENS}
               AND 1.0 - CAST(n_distinct AS DOUBLE) / n_tokens
                   <= {_GATE_MAX_REPETITION}
               AND CAST(tok_chars AS DOUBLE) / n_tokens
                   <= {_GATE_MAX_AVG_TOKLEN}
              THEN 1 ELSE 0 END AS y
  FROM m
),
f AS (
  SELECT 'n_chars' AS feature, n_chars AS v, y FROM lab
  UNION ALL SELECT 'n_tokens', n_tokens, y FROM lab
  UNION ALL SELECT 'distinct_ppm', distinct_ppm, y FROM lab
),
pv AS (
  SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM f GROUP BY feature, v
),
cum AS (
  SELECT feature, v,
         SUM(cnt) OVER (PARTITION BY feature ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS nl,
         SUM(pos) OVER (PARTITION BY feature ORDER BY v
                        ROWS UNBOUNDED PRECEDING) AS posl,
         SUM(cnt) OVER (PARTITION BY feature) AS n,
         SUM(pos) OVER (PARTITION BY feature) AS p
  FROM pv
),
sc AS (
  SELECT feature, v, nl, posl, nl - posl AS negl,
         n - nl AS nr, p - posl AS posr, (n - nl) - (p - posl) AS negr
  FROM cum
  WHERE nl < n
),
g AS (
  SELECT feature, v, nl, posl, nr, posr,
         CAST(nr * (nl * nl - posl * posl - negl * negl)
              + nl * (nr * nr - posr * posr - negr * negr) AS DOUBLE)
         / CAST(nl * nr AS DOUBLE) AS gini_x2
  FROM sc
)
SELECT feature, v AS split_value,
       CAST(nl AS BIGINT) AS n_left, CAST(posl AS BIGINT) AS pos_left,
       CAST(nr AS BIGINT) AS n_right, CAST(posr AS BIGINT) AS pos_right,
       gini_x2
FROM g
QUALIFY ROW_NUMBER() OVER (PARTITION BY feature ORDER BY gini_x2, v) = 1
""",
    tags=("corpus-prep", "quality-classifier", "ml"),
)
def feature_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training over the corpus: for each candidate
    feature (n_chars, n_tokens, distinct-token ppm), the threshold that
    best predicts the quality gate's keep/drop label by weighted Gini
    impurity — the split-scoring kernel of the fastText/CART quality
    classifier every production corpus pipeline trains once the
    hand-written gate becomes the bottleneck (train a cheap model on the
    expensive gate's labels, then run the model). The stump recovering
    the gate's own dominant rule (n_tokens at ~30) is
    the expected answer and the test of the machinery.

    Exactness: the weighted impurity of a split is
    G = giniL·nL + giniR·nR = [nR·(nL²−posL²−negL²) + nL·(nR²−…)]
    / (nL·nR) — an exact integer numerator and denominator, ranked via
    ONE double divide per candidate (gini_x2 = 2·n·G, the monotone
    scaling that keeps everything integral); argmin ties break on the
    threshold. No logs (entropy) anywhere, so both engines hash-match.

    Shape: candidate generation is a map-side 3× explode; the only
    corpus-sized exchange is the (feature, value) pre-aggregation
    (map-combined), after which the cumulative window, the per-feature
    TOTALS (integer full-partition window sums on the same exchange —
    no join-back, no duplicated corpus subtree), and the argmin all run
    on the distinct-VALUE table — value-cardinality-sized, not
    corpus-sized. At 100 TB: one shuffle of (feature, value, y) triples,
    then megabyte-scale windows; int64 holds to ~2M docs per feature and
    the numerator swaps to decimal(38,0) beyond (same plan)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), x -> x <> '')")
    n_tokens = F.size(toks).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    keep = (
        (n_tokens >= _GATE_MIN_TOKENS)
        & (F.lit(1.0) - n_distinct.cast("double") / n_tokens <= _GATE_MAX_REPETITION)
        & (tok_chars.cast("double") / n_tokens <= _GATE_MAX_AVG_TOKLEN)
    )
    lab = docs.select(
        F.col("n_chars").cast("long").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("y"),
    ).filter(F.col("n_tokens") > 0)
    feats = lab.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("n_chars").alias("feature"), F.col("n_chars").alias("v")
                ),
                F.struct(
                    F.lit("n_tokens").alias("feature"), F.col("n_tokens").alias("v")
                ),
                F.struct(
                    F.lit("distinct_ppm").alias("feature"),
                    F.expr(f"n_distinct * {_SPLIT_PPM} div n_tokens").alias("v"),
                ),
            )
        ).alias("f"),
        "y",
    ).select("f.feature", "f.v", "y")
    pv = feats.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    wc = (
        Window.partitionBy("feature")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("feature")
    cum = pv.select(
        "feature",
        "v",
        F.sum("cnt").over(wc).alias("nl"),
        F.sum("pos").over(wc).alias("posl"),
        F.sum("cnt").over(wt).alias("n"),
        F.sum("pos").over(wt).alias("p"),
    )
    nl, posl = F.col("nl"), F.col("posl")
    negl = nl - posl
    nr = F.col("n") - nl
    posr = F.col("p") - posl
    negr = nr - posr
    sc = (
        cum.filter(nl < F.col("n"))
        .select(
            "feature",
            "v",
            "nl",
            "posl",
            nr.alias("nr"),
            posr.alias("posr"),
            (
                (
                    nr * (nl * nl - posl * posl - negl * negl)
                    + nl * (nr * nr - posr * posr - negr * negr)
                ).cast("double")
                / (nl * nr).cast("double")
            ).alias("gini_x2"),
        )
    )
    wr = Window.partitionBy("feature").orderBy("gini_x2", "v")
    return (
        sc.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "feature",
            F.col("v").alias("split_value"),
            F.col("nl").alias("n_left"),
            F.col("posl").alias("pos_left"),
            F.col("nr").alias("n_right"),
            F.col("posr").alias("pos_right"),
            "gini_x2",
        )
    )


# ---------------------------------------------------------------------------
# Duplicate-span coalescing: merge overlapping duplicated n-gram positions
# into the maximal cut intervals substring dedup would actually remove
# ---------------------------------------------------------------------------
@query(
    "duplicate_span_coalesce",
    oracle=f"""
WITH corpus AS ({_CRAWL_UNION_SQL}),
tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM corpus
),
g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS i,
         md5(array_to_string(list_slice(t, i, i + {_SPAN_N - 1}), ' ')) AS h
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - {_SPAN_N - 1})) AS i
        FROM tok WHERE len(t) >= {_SPAN_N})
),
dup AS (SELECT h FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1),
p AS (SELECT g.doc_id, g.i FROM g JOIN dup ON dup.h = g.h),
m AS (
  SELECT doc_id, i,
         CASE WHEN MAX(i + {_SPAN_N - 1}) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              IS NOT DISTINCT FROM NULL
           OR i > MAX(i + {_SPAN_N - 1}) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         THEN 1 ELSE 0 END AS new_run
  FROM p
),
r AS (
  SELECT doc_id, i,
         SUM(new_run) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM m
),
iv AS (
  SELECT doc_id, run_id,
         MIN(i) AS span_start,
         MAX(i) + {_SPAN_N - 1} AS span_end
  FROM r GROUP BY doc_id, run_id
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(span_end - span_start + 1) AS BIGINT) AS covered_tokens,
       CAST(MAX(span_end - span_start + 1) AS BIGINT) AS longest_span,
       CAST(MIN(span_start) AS BIGINT) AS first_span_start
FROM iv GROUP BY doc_id
""",
    tags=("corpus-prep", "dedup-spans"),
)
def duplicate_span_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT LIST substring dedup executes: duplicated 8-gram
    positions (grams occurring in >1 document) merged into MAXIMAL
    non-overlapping intervals per document — the classic interval
    coalesce stated as windows: an interval starts where a position
    exceeds the running max end of every earlier span (exclusive-frame
    MAX), interval ids are the running sum of those starts. Where
    `ngram_duplicate_spans` reports the grams and
    `doc_duplicate_span_load` the per-doc fraction, this operator emits
    what a remove-duplicates pass actually needs: span count, covered
    tokens, longest run, first cut. All integer.

    Shape: gram hashes aggregate and join back on the hash (two
    hash-keyed exchanges carrying 16-byte hashes + ints, never text),
    then ONE doc-keyed sort window chain does the entire merge. At
    100 TB this is the ngram-family plan plus one tape-style window —
    no per-interval iteration, no UDFs."""
    docs = crawl_union(spark, sf_dir)
    g = docs.select(
        "doc_id",
        F.posexplode(ngram_span_column(_SPAN_N)).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("i"), F.md5("gram").alias("h"))
    dup = (
        g.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    # dup is O(duplicated grams) — corpus-scale, never broadcast
    # (sf1 vanilla-session OOM, SCALE.md §39)
    p = g.join(dup.hint("shuffle_hash"), "h").select("doc_id", "i")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max(F.col("i") + (_SPAN_N - 1)).over(w_prev)
    m = p.withColumn(
        "new_run",
        F.when(prev_end.isNull() | (F.col("i") > prev_end), 1).otherwise(0),
    )
    r = m.withColumn("run_id", F.sum("new_run").over(w_run))
    iv = r.groupBy("doc_id", "run_id").agg(
        F.min("i").alias("span_start"),
        (F.max("i") + (_SPAN_N - 1)).alias("span_end"),
    )
    ln = F.col("span_end") - F.col("span_start") + 1
    return iv.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(ln).alias("covered_tokens"),
        F.max(ln).alias("longest_span"),
        F.min("span_start").alias("first_span_start"),
    )
# ---------------------------------------------------------------------------
# DSIR-style data selection: importance weights from a target/raw ratio
# ---------------------------------------------------------------------------
_DSIR_TARGET_SOURCES = (
    "src0", "src2", "src4", "src6", "src8",
    "src10", "src12", "src14", "src16", "src18",
)
_DSIR_TOP_K = 50

_DSIR_SRC_LIST = ", ".join(f"'{s}'" for s in _DSIR_TARGET_SOURCES)
_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         (source IN ({_DSIR_SRC_LIST}) AND lang = 'en') AS is_target,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents
),
vocab AS (
  SELECT w,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tf_t,
         CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS tf_r
  FROM toks GROUP BY w
),
tot AS (SELECT SUM(tf_t) AS nt, SUM(tf_r) AS nr FROM vocab),
wts AS (
  SELECT w, ((tf_t + 1) * nr * 1000000) // ((tf_r + 1) * nt) AS w_ppm
  FROM vocab, tot
),
doc AS (
  SELECT t.doc_id, t.lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(w_ppm) AS BIGINT) AS sum_ppm
  FROM toks t JOIN wts ON wts.w = t.w
  WHERE NOT t.is_target
  GROUP BY t.doc_id, t.lang
)
SELECT doc_id, lang, n_tokens, sum_ppm,
       sum_ppm // n_tokens AS affinity_ppm
FROM doc
ORDER BY affinity_ppm DESC, doc_id
LIMIT {_DSIR_TOP_K}
"""


@query(
    "dsir_importance_weights",
    oracle=_DSIR_ORACLE,
    tags=("llm", "sampling", "selection", "A1"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023)
    restated exactly: score every RAW document by how much its token
    distribution looks like a TARGET corpus (here: English docs from the
    even-numbered sources — the 'wiki-quality' stand-in), then keep the
    top-K. Each vocabulary token gets an add-one-smoothed importance
    ratio w_ppm = ((tf_target+1) * N_raw * 10^6) // ((tf_raw+1) *
    N_target) — the per-feature target/raw likelihood ratio in integer
    parts-per-million (DSIR's log-sum restated as an exact integer SUM
    of ratios, so no platform log enters the hash) — and a document's
    affinity is the token-average of its ratios, floor-divided. Top-K
    selection orders by (affinity_ppm DESC, doc_id): exact integers, so
    the cut line is deterministic.

    Plan: one explode of the corpus into tokens; vocabulary counts are
    ONE map-combined aggregation with venue-conditional sums (target
    and raw tallied in the same pass); corpus totals are a 1-row
    broadcast scalar bound (the allowlisted crossJoin shape); the
    weight table joins back to raw tokens on the token key — a shuffle
    join bounded by corpus tokens, the DSIR minimum (at 100 TB this is
    the hashed-feature join; hashing tokens into 10^4 buckets shrinks
    the weight side to a broadcast, the documented scale knob) — then a
    map-combined per-doc rollup and a TakeOrdered top-K (no global
    sort). Reference: the reference pipeline has no selection layer;
    this is the training-data north star (BASELINE.md), the decision
    operator quality_percentile_cut ranks WITHIN a language and DSIR
    ranks AGAINST a target."""
    docs = load_table(spark, sf_dir, "documents")
    is_target = F.col("source").isin(*_DSIR_TARGET_SOURCES) & (F.col("lang") == "en")
    toks = docs.select(
        "doc_id",
        "lang",
        is_target.alias("is_target"),
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias("w"),
        # token table: checkpoint once so the corpus explode runs once
        # for its two consumers (vocabulary counts + raw-doc scoring)
    ).localCheckpoint()
    vocab = toks.groupBy("w").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("tf_t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("tf_r"),
    )
    tot = vocab.agg(
        F.sum("tf_t").alias("nt"), F.sum("tf_r").alias("nr")
    )
    wts = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        F.expr("((tf_t + 1) * nr * 1000000) div ((tf_r + 1) * nt)").alias("w_ppm"),
    )
    doc = (
        toks.filter(~F.col("is_target"))
        .join(wts, "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_ppm").alias("sum_ppm"),
        )
    )
    scored = doc.select(
        "doc_id",
        "lang",
        "n_tokens",
        "sum_ppm",
        F.expr("sum_ppm div n_tokens").alias("affinity_ppm"),
    )
    return scored.orderBy(F.col("affinity_ppm").desc(), "doc_id").limit(_DSIR_TOP_K)


# ---------------------------------------------------------------------------
# N-gram novelty decay: how much NEW content each marginal corpus slice adds
# ---------------------------------------------------------------------------
@query(
    "ngram_novelty_decay",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         md5(array_to_string(list_slice(t, i, i + {_SPAN_N - 1}), ' '))
           AS gram_hash
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, len(t) - {_SPAN_N - 1})) AS i
        FROM tok WHERE len(t) >= {_SPAN_N})
),
bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM g),
per_gram AS (SELECT gram_hash, MIN(doc_id) AS first_doc FROM g
             GROUP BY gram_hash),
novel AS (SELECT first_doc AS doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_novel FROM per_gram
          GROUP BY first_doc),
total AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total FROM g
          GROUP BY doc_id),
per_doc AS (
  SELECT t.doc_id, t.n_total, COALESCE(v.n_novel, 0) AS n_novel,
         CASE WHEN b.hi > b.lo
              THEN CAST((t.doc_id - b.lo) * 10 // (b.hi - b.lo + 1)
                        AS BIGINT)
              ELSE 0 END AS decile
  FROM total t LEFT JOIN novel v ON t.doc_id = v.doc_id
  CROSS JOIN bounds b
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_total) AS BIGINT) AS grams_total,
       CAST(SUM(n_novel) AS BIGINT) AS grams_novel,
       CAST(SUM(n_novel) AS BIGINT) * 1000000
         // CAST(SUM(n_total) AS BIGINT) AS novelty_ppm
FROM per_doc GROUP BY decile
""",
    tags=("corpus-prep", "dedup-spans", "curation"),
)
def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The marginal-novelty curve of the corpus: for each doc, how many
    of its distinct {_SPAN_N}-gram spans appear for the FIRST time in
    the corpus (by doc_id order)? Aggregated into 10 doc_id-range
    slices, this is the diminishing-returns measurement behind data-
    curation decisions ("does shard 9 still add content, or is it
    restating shards 0-8?") — the corpus-level complement of the
    per-pair dedup family (Lee et al. 2021 measure exactly this decay
    to justify dedup before training).

    Exactness: all counts are exact int64; novelty_ppm is an integer
    floor divide (both engines truncate non-negative BIGINT divides
    identically). Plan: novel-per-doc is computed WITHOUT a join-back —
    a gram's min(doc_id) IS its novelty event, so
    per_gram.groupBy(first_doc).count() replaces the gram-table
    self-join; the doc-slice bucketing uses broadcast min/max bounds
    (one 1-row scalar), never a global sort/ntile. Only gram HASHES
    shuffle (one md5 per token position — the exact-span floor); the
    doc-level tables that join at the end are corpus-doc-count sized,
    broadcast-joinable at any SF."""
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams = ngram_span_column(_SPAN_N)
    g = (
        corpus.select("doc_id", F.explode(grams).alias("gram"))
        .select("doc_id", F.md5("gram").alias("gram_hash"))
        .distinct()
    )
    bounds = g.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    per_gram = g.groupBy("gram_hash").agg(F.min("doc_id").alias("first_doc"))
    novel = per_gram.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    total = g.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_total"))
    per_doc = (
        total.join(novel, "doc_id", "left")
        .join(F.broadcast(bounds))
        .select(
            "n_total",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.col("hi") > F.col("lo"),
                F.expr("((doc_id - lo) * 10) div (hi - lo + 1)"),
            ).otherwise(F.lit(0)).cast("long").alias("decile"),
        )
    )
    return per_doc.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_total").alias("grams_total"),
        F.sum("n_novel").alias("grams_novel"),
    ).withColumn(
        "novelty_ppm",
        F.expr("(grams_novel * 1000000) div grams_total"),
    )


# ---------------------------------------------------------------------------
# In-engine trained quality/language classifier: one exact Newton step
# of logistic regression over surface features (the fastText-style
# linear gate, trained distributed instead of shipped as a binary)
# ---------------------------------------------------------------------------
_LR_FEAT_CAP = 2000  # per-doc feature cap: robustness + overflow bound
_LR_DOWNSCALE = 1_000_000_000  # keep |S| entries < 1e9 before inversion
# Built from the SAME list the Spark side filters with — one source of
# truth, so an edit to textstats.STOPWORDS can never desynchronize the
# oracle (ADVICE r10).
_LR_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

_LR_MOMENTS_SQL = f"""
feat AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS u,
         LEAST(len(list_filter(string_split(text, ' '), x -> x <> '')),
               {_LR_FEAT_CAP}) AS t,
         LEAST(len(list_filter(string_split(text, ' '),
                               x -> x IN ({_LR_STOP_SQL}))),
               {_LR_FEAT_CAP}) AS s,
         lang
  FROM documents
),
m AS (
  SELECT COUNT(*) AS n, SUM(t) AS st, SUM(s) AS ss,
         SUM(t*t) AS stt, SUM(t*s) AS sts, SUM(s*s) AS sss,
         SUM(u) AS r1, SUM(t*u) AS rt, SUM(s*u) AS rs
  FROM feat
),
sc AS (
  SELECT 1 + GREATEST(n, st, ss, stt, sts, sss) // {_LR_DOWNSCALE} AS dd
  FROM m
),
z AS (
  -- a..h are sums of non-negative terms, so plain // is exact and
  -- sign-free; p/q/w can be NEGATIVE, where DuckDB // truncates toward
  -- zero but Python // floors — so both sides divide magnitudes and
  -- re-apply the sign explicitly (ADVICE r10)
  SELECT n//dd AS a, st//dd AS b, ss//dd AS c,
         stt//dd AS e, sts//dd AS g, sss//dd AS h,
         CASE WHEN r1 < 0 THEN -(ABS(r1) // dd) ELSE r1 // dd END AS p,
         CASE WHEN rt < 0 THEN -(ABS(rt) // dd) ELSE rt // dd END AS q,
         CASE WHEN rs < 0 THEN -(ABS(rs) // dd) ELSE rs // dd END AS w
  FROM m, sc
),
det AS (
  SELECT a*(e*h - g*g) - b*(b*h - g*c) + c*(b*g - e*c) AS d,
         (e*h - g*g) AS a00, (c*g - b*h) AS a01, (b*g - c*e) AS a02,
         (a*h - c*c) AS a11, (c*b - a*g) AS a12, (a*e - b*b) AS a22,
         p, q, w
  FROM z
),
nums AS (
  SELECT d,
         a00*p + a01*q + a02*w AS n0,
         a01*p + a11*q + a12*w AS n1,
         a02*p + a12*q + a22*w AS n2
  FROM det
),
beta AS (
  -- magnitude-divide + explicit sign: floor on non-negatives equals
  -- truncation, so DuckDB // and Python // agree for every sign mix
  SELECT CASE WHEN d = 0 THEN 0 ELSE
           (CASE WHEN (n0 < 0) <> (d < 0) THEN -1 ELSE 1 END)
           * ((2000000 * ABS(n0)) // ABS(d)) END AS b0,
         CASE WHEN d = 0 THEN 0 ELSE
           (CASE WHEN (n1 < 0) <> (d < 0) THEN -1 ELSE 1 END)
           * ((2000000 * ABS(n1)) // ABS(d)) END AS b1,
         CASE WHEN d = 0 THEN 0 ELSE
           (CASE WHEN (n2 < 0) <> (d < 0) THEN -1 ELSE 1 END)
           * ((2000000 * ABS(n2)) // ABS(d)) END AS b2
  FROM nums
)
"""


def _lr_model(spark: SparkSession, sf_dir: str) -> tuple[int, int, int]:
    """Exact one-step-Newton logistic coefficients (ppm-quantized) for
    P(lang = en | tokens, stopwords). Bounded driver state: the NINE
    int64 moments — the same collect discipline as the PCA cell matrix.
    All arithmetic is integer (Python arbitrary precision mirrors the
    oracle's HUGEINT). Divides on NON-NEGATIVE operands use plain `//`
    (floor == truncate there, so Python and DuckDB agree); divides whose
    numerator can be negative (the r1/rt/rs moments and the final betas)
    use sign-explicit magnitude division on BOTH sides, because Python
    `//` floors while DuckDB `//` truncates toward zero."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    feat = docs.select(
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1)).alias("u"),
        F.least(F.size(toks), F.lit(_LR_FEAT_CAP)).cast("long").alias("t"),
        F.least(
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))),
            F.lit(_LR_FEAT_CAP),
        ).cast("long").alias("s"),
    )
    row = feat.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("st"),
        F.sum("s").alias("ss"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
        F.sum(F.col("t") * F.col("s")).alias("sts"),
        F.sum(F.col("s") * F.col("s")).alias("sss"),
        F.sum("u").alias("r1"),
        F.sum(F.col("t") * F.col("u")).alias("rt"),
        F.sum(F.col("s") * F.col("u")).alias("rs"),
    ).collect()[0]
    n, st, ss = int(row["n"]), int(row["st"]), int(row["ss"])
    stt, sts, sss = int(row["stt"]), int(row["sts"]), int(row["sss"])
    r1, rt, rs = int(row["r1"]), int(row["rt"]), int(row["rs"])
    dd = 1 + max(n, st, ss, stt, sts, sss) // _LR_DOWNSCALE
    a, b, c = n // dd, st // dd, ss // dd
    e, g, h = stt // dd, sts // dd, sss // dd

    def tdiv(x: int) -> int:
        # truncate-toward-zero via magnitude divide: Python // floors
        # (-3008 // 3 = -1003) while DuckDB // truncates (= -1002) —
        # both sides use |x|//dd with the sign re-applied (ADVICE r10)
        return -(-x // dd) if x < 0 else x // dd

    p, q, w = tdiv(r1), tdiv(rt), tdiv(rs)
    det = a * (e * h - g * g) - b * (b * h - g * c) + c * (b * g - e * c)
    if det == 0:
        return (0, 0, 0)
    a00, a01, a02 = e * h - g * g, c * g - b * h, b * g - c * e
    a11, a12, a22 = a * h - c * c, c * b - a * g, a * e - b * b

    def ppm(num: int) -> int:
        # magnitude-divide + explicit sign (floor==truncate on
        # non-negatives), mirroring the oracle exactly for any sign mix
        sg = -1 if (num < 0) != (det < 0) else 1
        return sg * ((2_000_000 * abs(num)) // abs(det))

    b0 = ppm(a00 * p + a01 * q + a02 * w)
    b1 = ppm(a01 * p + a11 * q + a12 * w)
    b2 = ppm(a02 * p + a12 * q + a22 * w)
    return (b0, b1, b2)


@query(
    "quality_lr_train",
    oracle=f"""
WITH {_LR_MOMENTS_SQL}
SELECT f.feature, CAST(f.beta_ppm AS BIGINT) AS beta_ppm
FROM beta, LATERAL (VALUES ('intercept', b0), ('tokens', b1), ('stopwords', b2))
     AS f(feature, beta_ppm)
""",
    tags=("training-prep", "classifier", "linalg", "exact-int"),
)
def quality_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the linear document gate IN the engine: one exact Newton
    step of logistic regression from beta=0 for P(lang='en') on two
    surface features (token count, English-stopword count) plus
    intercept. At beta=0 the Hessian is X'X/4 and the gradient is
    X'(y-1/2), so the step is beta = 2*(X'X)^{{-1}}*X'(2y-1) — a
    closed form requiring only NINE integer moments from one map-side-
    combined aggregation pass, at ANY corpus size. The 3x3 solve runs
    driver-side on those nine numbers (the bounded-state pattern of
    `portfolio_risk_pca`), via the exact adjugate/determinant with a
    truncating pre-downscale (keeps every product within 128-bit
    range; the oracle's HUGEINT replays it term for term).
    Coefficients are published ppm-quantized — the form a production
    gate ships — and `quality_lr_eval` scores the corpus with exactly
    these published integers.

    Overflow ledger: features capped at {_LR_FEAT_CAP}, so each moment
    <= 4e6 * n_docs (int64-safe to ~2e12 docs; past that the sums
    promote to decimal(38) with no other change). After the downscale
    every |S| entry < 1e9 => |det| < 6e27, |adjugate| < 3e18,
    |numerator| < ~2e28 — inside HUGEINT/Python-int exactness.

    Reference basis: the reference hard-codes its market-quality
    thresholds (`/root/reference/virginia/api/data_feed.py` filter
    constants); here the equivalent gate is FIT from the data by the
    engine itself."""
    b0, b1, b2 = _lr_model(spark, sf_dir)
    return spark.createDataFrame(
        [("intercept", b0), ("tokens", b1), ("stopwords", b2)],
        "feature string, beta_ppm bigint",
    )


@query(
    "quality_lr_eval",
    oracle=f"""
WITH {_LR_MOMENTS_SQL}
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN b0 + b1*t + b2*s > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pred_en,
       CAST(SUM(CASE WHEN (b0 + b1*t + b2*s > 0) = (u = 1)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM feat, beta
GROUP BY lang
""",
    tags=("training-prep", "classifier", "exact-int"),
)
def quality_lr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCORE the corpus with the published quantized model from
    `quality_lr_train`: per language, how many docs the linear gate
    flags as English and how many verdicts are correct — the training-
    accuracy readout that decides whether the gate ships. The decision
    rule uses the ppm-quantized integer coefficients verbatim (score =
    b0 + b1*t + b2*s in int64: |b| <= ~1e7 x features <= {_LR_FEAT_CAP}
    => |score| < 1e11), so the verdict is bit-deterministic under any
    partitioning — no float crosses the gate. One aggregation pass;
    the model itself is a 3-int broadcast."""
    b0, b1, b2 = _lr_model(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    feat = docs.select(
        "lang",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1)).alias("u"),
        F.least(F.size(toks), F.lit(_LR_FEAT_CAP)).cast("long").alias("t"),
        F.least(
            F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))),
            F.lit(_LR_FEAT_CAP),
        ).cast("long").alias("s"),
    )
    score = F.lit(b0) + F.lit(b1) * F.col("t") + F.lit(b2) * F.col("s")
    pred = (score > 0).cast("int")
    correct = (pred == ((F.col("u") == 1).cast("int"))).cast("long")
    return feat.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(pred.cast("long")).alias("n_pred_en"),
        F.sum(correct).alias("n_correct"),
    )
