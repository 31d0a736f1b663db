"""Text-analysis operators for training-data pipelines: quality scoring,
token counting, language ID, and document fingerprinting — all pure
built-in/higher-order expressions over the documents table.

Scale notes (100 TB): every operator here except lang-ID is a narrow
per-row projection (no shuffle at all — ideal for a trillion-row corpus
scan). Lang-ID is one explode + two small aggregations whose shuffle keys
are (lang, bigram) — bounded by vocabulary, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------
_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, text,
         string_split(text, ' ') AS toks,
         length(text) AS n_chars_m
  FROM documents
),
m AS (
  SELECT doc_id, lang, n_chars_m,
         len(toks) AS n_tokens,
         len(list_filter(toks, x -> list_contains([{_STOP_SQL}], x))) AS n_stop,
         list_sum(list_transform(toks, x -> length(x))) AS tok_chars,
         length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_punct
  FROM t
)
SELECT doc_id, lang, n_tokens,
       CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       CAST(n_punct AS DOUBLE) / n_chars_m AS punct_ratio,
       CAST(tok_chars AS DOUBLE) / n_tokens AS avg_token_len,
       least(1.0, n_tokens / 100.0) * 0.5
         + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
         + least(1.0, (CAST(tok_chars AS DOUBLE) / n_tokens) / 8.0) * 0.2
         AS quality_score
FROM m
"""


@query(
    "text_quality",
    oracle=_QUALITY_SQL,
    headline=True,
    tags=("text-quality",),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals (length / stopword ratio / punctuation
    ratio / mean token length) folded into a [0,1] score — the standard
    pre-training heuristic filter stack. Pure projection: no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    # expr STRINGS (r12, guide §1.2 applied to the driver): one py4j
    # round trip per output column instead of one per Column node; the
    # parsed trees are identical (D-suffixed double literals match
    # F.lit(float) exactly)
    toks = "split(text, ' ')"
    n_tokens = f"size({toks})"
    n_stop = f"size(filter({toks}, x -> x IN ({_STOP_SQL})))"
    tok_chars = (
        f"aggregate(transform({toks}, x -> CAST(length(x) AS BIGINT)), "
        "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    n_punct = "(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '')))"
    stop_ratio = f"CAST({n_stop} AS DOUBLE) / {n_tokens}"
    avg_tok = f"CAST({tok_chars} AS DOUBLE) / {n_tokens}"
    return docs.selectExpr(
        "doc_id",
        "lang",
        f"{n_tokens} AS n_tokens",
        f"{stop_ratio} AS stop_ratio",
        f"CAST({n_punct} AS DOUBLE) / length(text) AS punct_ratio",
        f"{avg_tok} AS avg_token_len",
        f"least(1.0D, {n_tokens} / 100.0D) * 0.5D"
        f" + (1.0D - {stop_ratio}) * 0.3D"
        f" + least(1.0D, ({avg_tok}) / 8.0D) * 0.2D AS quality_score",
    )


# ---------------------------------------------------------------------------
# Token counting (whitespace + regex "BPE-ish" word/number pieces)
# ---------------------------------------------------------------------------
@query(
    "token_counts",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       CAST(regexp_extract_all(text, '[a-z]+|[0-9]+') AS VARCHAR[]).len() AS re_tokens,
       length(text) AS n_chars_m,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
FROM documents
""",
    tags=("text-tokens",),
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace and regex token counts per doc (the 'how many tokens is
    this corpus' accounting pass). Narrow projection, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " "))
    re_toks = F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+"), 0))
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        re_toks.alias("re_tokens"),
        F.length("text").alias("n_chars_m"),
        (F.length("text").cast("double") / ws).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# Language ID: character-bigram profile classifier (TextCat-style)
# ---------------------------------------------------------------------------
_LANGID_SQL = """
WITH bi AS (
  SELECT doc_id, lang, substr(text, i, 2) AS bigram
  FROM (SELECT doc_id, lang, text, unnest(generate_series(1, length(text) - 1)) AS i
        FROM documents)
),
profile AS (
  SELECT lang, bigram, COUNT(*) AS freq
  FROM bi GROUP BY lang, bigram
  QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, bigram) <= 40
),
db AS (SELECT DISTINCT doc_id, lang AS actual_lang, bigram FROM bi),
scores AS (
  SELECT d.doc_id, d.actual_lang, p.lang AS cand_lang, COUNT(*) AS score
  FROM db d JOIN profile p ON p.bigram = d.bigram
  GROUP BY d.doc_id, d.actual_lang, p.lang
)
SELECT doc_id, actual_lang,
       cand_lang AS predicted_lang,
       score
FROM scores
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand_lang) = 1
"""


@query("lang_id_ngram", oracle=_LANGID_SQL, tags=("text-langid",))
def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language ID: build a top-40-bigram profile per
    language from the corpus, score each doc by profile overlap, predict
    argmax (deterministic tie-break). The profile aggregation shuffles on
    (lang, bigram) — vocabulary-bounded — and the scoring join broadcasts
    the tiny profile; corpus-size work is one explode + one aggregation.
    The per-doc DISTINCT bigram set is `array_distinct` BEFORE the
    explode — per-row inside codegen — so no corpus-sized distinct
    shuffle exists anywhere in the plan."""
    docs = load_table(spark, sf_dir, "documents")
    idx = F.sequence(F.lit(1), F.length("text") - 1)
    arr = F.transform(idx, lambda i: F.col("text").substr(i, F.lit(2)))
    base = docs.select(
        "doc_id", F.col("lang").alias("actual_lang"), arr.alias("bigrams")
    )
    bi = base.select("doc_id", "actual_lang", F.explode("bigrams").alias("bigram"))
    profile = (
        bi.groupBy(F.col("actual_lang").alias("lang"), "bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("freq").desc(), F.col("bigram"))
            ),
        )
        .filter(F.col("rn") <= 40)
        .select("lang", "bigram")
    )
    # Score WITHOUT re-exploding the corpus: fold each language's top-40
    # profile into one array (a handful of rows), broadcast-cross-join,
    # and count overlap per doc with array_intersect — per-row codegen.
    # The only corpus-sized shuffle left in the whole plan is the profile
    # frequency aggregation. lang_rank makes the argmax tie-break
    # (score DESC, cand_lang ASC) expressible as a single max_by — no
    # per-doc sort window.
    prof_arrays = (
        profile.groupBy("lang")
        .agg(F.collect_list("bigram").alias("prof"))
        .withColumn("lang_rank", F.row_number().over(Window.orderBy("lang")))
    )
    distinct_bigrams = base.select(
        "doc_id", "actual_lang", F.array_distinct("bigrams").alias("dbig")
    )
    scored = (
        distinct_bigrams.join(F.broadcast(prof_arrays))
        .select(
            "doc_id",
            "actual_lang",
            "lang",
            "lang_rank",
            F.size(F.array_intersect("dbig", "prof")).alias("score"),
        )
        .filter(F.col("score") >= 1)
    )
    best = F.max_by(
        F.struct(F.col("lang"), F.col("score")),
        F.struct(F.col("score"), (-F.col("lang_rank")).alias("neg_rank")),
    )
    return (
        scored.groupBy("doc_id", "actual_lang")
        .agg(best.alias("b"))
        .select(
            "doc_id",
            "actual_lang",
            F.col("b.lang").alias("predicted_lang"),
            F.col("b.score").alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (polynomial rolling hash)
# ---------------------------------------------------------------------------
@query(
    "doc_fingerprints",
    oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (acc, x) -> (acc * 131 + x) % 1000000007
       ) AS fingerprint
FROM documents
""",
    tags=("text-fingerprint",),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash fingerprint per doc (h = h*131 + byte mod
    1e9+7) — the content-defined-chunking primitive. A single fold over
    the characters via the `aggregate()` HOF; integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    chars = F.split("text", "")
    fp = F.aggregate(
        F.transform(chars, lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 131 + x) % 1_000_000_007,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (hash-based stratified sampling)
# ---------------------------------------------------------------------------
_SPLIT_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {1 + i}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)


def split_label(id_col: str = "doc_id") -> "F.Column":
    """Deterministic 80/10/10 split assignment: bucket = first 8 hex
    digits of md5(id) mod 100 → 'train'/'val'/'test'. The one Spark-side
    definition of the split (its SQL twin is _SPLIT_HEX8) — shared by
    train_val_test_split and training_corpus_manifest so the two can't
    drift."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    return F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")


@query(
    "train_val_test_split",
    oracle=f"""
WITH b AS (
  SELECT lang, n_chars, ({_SPLIT_HEX8}) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b
GROUP BY 1, 2
""",
    tags=("sampling-split",),
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 corpus split: bucket = first 8 hex digits
    of md5(doc_id) mod 100 — a pure projection, so membership is stable
    under re-runs, re-partitioning, and incremental appends (the property
    `df.randomSplit` does NOT have: seeded RNG sampling depends on
    partition layout). At 100 TB the split is a free WHERE clause on any
    scan, no materialization needed; here summarized per (split, lang)
    to verify both the assignment and the strata proportions against the
    oracle's identical hash arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(split_label().alias("split"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus vocabulary (top-K tokens — the BPE/tokenizer-training first pass)
# ---------------------------------------------------------------------------
@query(
    "token_vocabulary",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
FROM tok
WHERE token <> ''
GROUP BY token
ORDER BY freq DESC, token
LIMIT 100
""",
    tags=("text-vocab", "W2"),
)
def token_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus vocabulary by frequency (deterministic tie-break on
    the token) — the first pass of tokenizer training. One explode + one
    count aggregation shuffling on the token (vocabulary-bounded), then
    TakeOrderedAndProject: every partition keeps only its local top-100,
    so the global sort never materializes — the ordering cost is O(K) per
    partition regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Capstone composition: the training-corpus manifest (quality gate x
# exact-dedup canonical x deterministic split, in one declarative plan)
# ---------------------------------------------------------------------------
@query(
    "training_corpus_manifest",
    oracle=f"""
WITH tq AS ({_QUALITY_SQL}),
canon AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
  FROM documents
),
b AS (
  SELECT doc_id, ({_SPLIT_HEX8}) % 100 AS bucket FROM documents
)
SELECT CASE WHEN b.bucket < 80 THEN 'train'
            WHEN b.bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       tq.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(tq.n_tokens) AS BIGINT) AS total_tokens
FROM tq
JOIN canon ON canon.doc_id = tq.doc_id
JOIN b ON b.doc_id = tq.doc_id
WHERE canon.keep AND tq.quality_score >= 0.5
GROUP BY 1, 2
""",
    tags=("corpus-manifest", "pipeline-composition"),
)
def training_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus materialization step: keep docs that (a)
    pass the quality gate, (b) are the canonical copy of their exact-dup
    group (md5 fingerprint, keep-lowest-id — exact_dedup's policy), and
    (c) land in each split of the deterministic hash bucket — then
    manifest counts/token totals per (split, lang). Built by COMPOSING
    the registered builders (text_quality) and shared conventions, so
    the pipeline stays one declarative plan: Catalyst sees through the
    composition, and the only shuffles are the dup-group window and the
    final rollup. The quality threshold compares bit-identical doubles
    (same IEEE op sequence both engines), so the gate is
    engine-independent."""
    tq = text_quality(spark, sf_dir).select("doc_id", "lang", "quality_score", "n_tokens")
    docs = load_table(spark, sf_dir, "documents")
    canon = docs.select(
        "doc_id",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy(F.md5("text")))
        ).alias("keep"),
    )
    b = docs.select("doc_id", split_label().alias("split"))
    return (
        tq.join(canon, "doc_id")
        .join(b, "doc_id")
        .filter(F.col("keep") & (F.col("quality_score") >= 0.5))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (the relevance-weighting first pass)
# ---------------------------------------------------------------------------
@query(
    "doc_tfidf_topterms",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE token <> '' GROUP BY doc_id, token
),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token)
SELECT t.doc_id, t.token, t.tf, d.df,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rank,
       CAST(t.tf AS DOUBLE) / d.df AS tf_over_df
FROM tf t JOIN df d ON d.token = t.token
WINDOW w AS (PARTITION BY t.doc_id
             ORDER BY CAST(t.tf AS DOUBLE) / d.df DESC, t.token)
QUALIFY ROW_NUMBER() OVER w <= 3
""",
    tags=("text-tfidf", "A7"),
)
def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most-characteristic terms per document by tf·idf ranking.
    The idf here is the log-free rank-equivalent form idf = N/df (N is
    constant per run, so ordering by tf/df orders identically to
    tf·log-idf for any monotone idf) — chosen because a transcendental
    log is the one step whose last-ulp could differ across engines,
    while tf/df is a single IEEE divide of two exact integers.

    Plan shape: one explode over the corpus → (doc, token) counts (the
    only corpus-sized shuffle) → document frequencies derived from the
    tf table itself (vocabulary-sized aggregate, NOT a second corpus
    pass) → joined back on token → per-doc top-3 window. At 100 TB the
    df table is small enough to broadcast and the window partitions by
    doc_id — embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = Window.partitionBy("doc_id").orderBy(score.desc(), "token")
    return (
        tf.join(F.broadcast(df), "token")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "df", "rank", score.alias("tf_over_df"))
    )


# ---------------------------------------------------------------------------
# Stratified corpus sampling (deterministic hash-gate, per-stratum rates)
# ---------------------------------------------------------------------------
SAMPLE_RATES = {"en": 10, "*": 50}  # percent kept per language stratum

_SAMPLE_HEX8 = " + ".join(
    f"(strpos('0123456789abcdef',"
    f" substr(md5('samp:' || CAST(doc_id AS VARCHAR)), {1 + i}, 1)) - 1)"
    f" * {16 ** (7 - i)}"
    for i in range(8)
)


@query(
    "stratified_corpus_sample",
    oracle=f"""
WITH b AS (
  SELECT doc_id, lang, n_chars, ({_SAMPLE_HEX8}) % 100 AS bucket
  FROM documents
)
SELECT doc_id, lang, bucket,
       CASE WHEN lang = 'en' THEN 10.0 ELSE 2.0 END AS weight
FROM b
WHERE bucket < (CASE WHEN lang = 'en' THEN {SAMPLE_RATES["en"]} ELSE {SAMPLE_RATES["*"]} END)
""",
    tags=("sampling-stratified",),
)
def stratified_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing by deterministic stratified downsampling: keep
    10% of the dominant language (en) and 50% of everything else, with
    an inverse-rate weight column so downstream estimates stay unbiased.
    Membership is a hash gate on the row's own id ('samp:'-salted so it
    is independent of the train/val/test split hash) — a pure WHERE
    clause: stable under reruns, re-partitioning, and appends, and
    composable with any scan at 100 TB with zero materialization.
    `df.sampleBy` gives none of those guarantees (partition-layout-
    dependent RNG)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % 100
    )
    is_en = F.col("lang") == "en"
    rate_pct = F.when(is_en, F.lit(SAMPLE_RATES["en"])).otherwise(F.lit(SAMPLE_RATES["*"]))
    return (
        docs.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate_pct)
        .select(
            "doc_id",
            "lang",
            "bucket",
            F.when(is_en, F.lit(10.0)).otherwise(F.lit(2.0)).alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# Array-predicate HOFs (exists / forall) — §2.8 array family closure
# ---------------------------------------------------------------------------
@query(
    "doc_token_predicates",
    oracle="""
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(CASE WHEN len(list_filter(toks, x -> length(x) >= 8)) > 0
                  THEN 1 END) AS has_long_token,
       COUNT(CASE WHEN len(list_filter(toks, x -> length(x) < 3)) = 0
                  THEN 1 END) AS all_tokens_3plus
FROM t GROUP BY lang
""",
    tags=("text", "array-hof"),
)
def doc_token_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`exists()` / `forall()` array predicates per document, rolled up
    per language — the declarative form of the reference's list
    comprehensions with any()/all() (`etl/query.py:191,212-213`). Scale
    notes: both HOFs short-circuit per row inside codegen — no explode,
    no shuffle before the 3-group rollup; at 100 TB this is the shape to
    prefer over explode+groupBy whenever the question is per-row
    (exists?) rather than per-element (how many?)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    has_long = F.exists(toks, lambda x: F.length(x) >= 8)
    all_3plus = F.forall(toks, lambda x: F.length(x) >= 3)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(has_long, 1)).alias("has_long_token"),
        F.count(F.when(all_3plus, 1)).alias("all_tokens_3plus"),
    )


# ---------------------------------------------------------------------------
# posexplode — position-aware flatten (§2.8 array family)
# ---------------------------------------------------------------------------
@query(
    "token_position_lengths",
    oracle="""
WITH flat AS (
  SELECT unnest(toks) AS term, unnest(range(len(toks))) AS pos
  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
)
SELECT CAST(pos // 5 AS BIGINT) AS pos_bucket,
       COUNT(*) AS n_tokens,
       CAST(SUM(length(term)) AS BIGINT) AS total_chars,
       MIN(length(term)) AS min_len,
       MAX(length(term)) AS max_len
FROM flat
GROUP BY pos // 5
""",
    tags=("text", "posexplode"),
)
def token_position_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-aware explode (`posexplode`): token-length statistics by
    position-in-document bucket — the 'do sentences start with shorter
    words' sweep. The oracle zips unnest(toks) with unnest(range(len)) —
    both engines 0-based, same buckets. Scale notes:
    posexplode is a flatMap; the only shuffle is the bounded-cardinality
    bucket rollup, partially aggregated map-side."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(F.posexplode(F.split("text", " ")).alias("pos", "term"))
    bucket = (F.col("pos") - F.col("pos") % 5) / 5
    return t.groupBy(bucket.cast("long").alias("pos_bucket")).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.length("term")).alias("total_chars"),
        F.min(F.length("term")).alias("min_len"),
        F.max(F.length("term")).alias("max_len"),
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters: the third sketch tier (after HLL
# cardinality and GK percentiles), banded-oracle-checked like both.
# ---------------------------------------------------------------------------
_CMS_TOPN = 20


@query(
    "token_heavyhitters_cms",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS freq,
       true AS overestimates
FROM tok WHERE token <> ''
GROUP BY token
ORDER BY freq DESC, token
LIMIT {_CMS_TOPN}
""",
    tags=("text-vocab", "approx", "sketch"),
)
def token_heavyhitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter token counts through a count-min sketch, verified
    against the exact counts under the CMS contract: the estimate NEVER
    undercounts, and overcounts by at most (e/width) x total-tokens.
    The sketch is built AS A DATAFRAME AGGREGATION — d hash rows x width
    counters via xxhash64(token, row) buckets, one groupBy producing at
    most d x width rows regardless of input size (that bounded output is
    the whole point of a sketch: fixed memory, one pass, mergeable by
    addition, order-independent so estimates are deterministic). This is
    the 100 TB path for 'top tokens without carrying the full vocabulary
    through a shuffle'. The exact top-N here is the harness keeping the
    sketch honest. Only `overestimates` is hash-gated: est = min over d
    counters each of which counts a superset of the token's occurrences,
    so est >= freq is a DETERMINISTIC CMS guarantee. The epsilon band
    (overcount <= ceil(e/width * N)) is only probabilistic (>= 1 - e^-d
    per item), so gating it would make the oracle flaky under testdata
    regeneration — it is asserted on the fixed fixture in
    tests/test_training_ops.py::test_cms_band_holds_on_fixture instead."""
    import math

    d, width = 5, 2719  # depth 5, width ~ e/0.001
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    total = tokens.count()

    # the sketch: one aggregation, <= d*width output rows at ANY scale
    sk = (
        tokens.select(
            "token", F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i")
        )
        .groupBy(
            "i", F.pmod(F.xxhash64("token", F.col("i")), F.lit(width)).alias("b")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counters = {(r.i, r.b): r.cnt for r in sk.collect()}

    buckets = F.array(
        *[F.pmod(F.xxhash64("token", F.lit(i)), F.lit(width)) for i in range(d)]
    )
    top = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(_CMS_TOPN)
        .select("token", "freq", buckets.alias("bks"))
        .collect()
    )
    band = math.ceil(math.e / width * total)
    rows = []
    # (token, freq, est, band) per heavy hitter — exposed for the
    # in-suite probabilistic band assertion (not hash-gated).
    token_heavyhitters_cms.last_band_check = []
    for r in top:
        est = min(counters.get((i, b), 0) for i, b in enumerate(r.bks))
        rows.append((r.token, int(r.freq), est >= r.freq))
        token_heavyhitters_cms.last_band_check.append(
            (r.token, int(r.freq), est, band)
        )
    return spark.createDataFrame(
        rows, "token string, freq long, overestimates boolean"
    )


# ---------------------------------------------------------------------------
# BPE-style pair statistics: adjacent-token pair frequencies — the count
# step of a byte-pair/merge-rule trainer, as one narrow HOF pipeline.
# ---------------------------------------------------------------------------
_BPE_TOPN = 50


def adjacent_token_pairs(docs: DataFrame) -> DataFrame:
    """(a, b) adjacent whitespace-token pairs, one output row per pair
    occurrence. zip_with over two shifted slices of length
    greatest(n-1, 0) so docs with <2 tokens (where sequence(1, n-1)
    would yield a descending [1, 0] and element_at(toks, 0) would
    throw) contribute zero pairs. Empty tokens are dropped on both
    sides, matching the oracle."""
    return (
        docs.select(F.split("text", " ").alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "zip_with("
                    "slice(toks, 1, greatest(size(toks) - 1, 0)), "
                    "slice(toks, 2, greatest(size(toks) - 1, 0)), "
                    "(a, b) -> struct(a, b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )


@query(
    "bpe_pair_counts",
    oracle=f"""
WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
p AS (SELECT unnest(generate_series(1, len(toks) - 1)) AS i, toks FROM t),
pairs AS (
  SELECT toks[i] AS a, toks[i + 1] AS b FROM p
  WHERE toks[i] <> '' AND toks[i + 1] <> ''
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS freq
FROM pairs GROUP BY a, b
ORDER BY freq DESC, a, b
LIMIT {_BPE_TOPN}
""",
    tags=("text-bpe", "W2"),
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_BPE_TOPN} adjacent token pairs across the corpus — the
    counting pass a BPE/merge-rule tokenizer trainer iterates (each
    round merges the argmax pair and recounts). Pairing happens INSIDE
    the row via a sequence→element_at HOF (no posexplode self-join, no
    per-doc window): one explode of ready-made pairs, one count shuffle,
    TakeOrdered top-N with deterministic (a, b) tie-break. At 100 TB the
    per-round plan is identical — the HOF pipeline re-runs with the
    merge table broadcast.

    Short-doc guard: Spark's sequence(1, n) with n < 1 yields a
    DESCENDING [1, 0] (not empty like DuckDB's generate_series), and
    element_at(toks, 0) then throws — so pairing is expressed as
    zip_with over two shifted slices, whose length greatest(n-1, 0)
    makes docs with fewer than two tokens yield zero pairs, matching
    the oracle's semantics for them."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        adjacent_token_pairs(docs).groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "a", "b")
        .limit(_BPE_TOPN)
    )


# ---------------------------------------------------------------------------
# Sliding-window document chunking: the step that turns documents into
# fixed-size training sequences (context-window W, stride S < W for
# overlap) — the shape every LLM pretraining pipeline runs right before
# tokenizer encoding and packing.
# ---------------------------------------------------------------------------
_CHUNK_W = 64  # context window, tokens
_CHUNK_S = 48  # stride (W - S = 16 tokens of overlap between chunks)


@query(
    "doc_sliding_chunks",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
d AS (SELECT doc_id, toks, len(toks) AS n FROM t),
c AS (
  SELECT doc_id, toks, n,
         1 + (GREATEST(n - {_CHUNK_W}, 0) + {_CHUNK_S - 1}) // {_CHUNK_S}
           AS n_chunks
  FROM d
),
i AS (
  SELECT doc_id, toks, n,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM c
),
s AS (
  SELECT doc_id, chunk_id,
         toks[chunk_id * {_CHUNK_S} + 1 :
              chunk_id * {_CHUNK_S} + LEAST({_CHUNK_W}, n - chunk_id * {_CHUNK_S})]
           AS ctoks
  FROM i
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(ctoks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(list_sum(list_transform(ctoks, x -> len(x))), 0) AS BIGINT)
         AS n_chars,
       ctoks[1] AS first_token,
       ctoks[-1] AS last_token
FROM s
""",
    tags=("text-chunking", "training-prep"),
)
def doc_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into {_CHUNK_W}-token context windows with a
    {_CHUNK_S}-token stride ({_CHUNK_W - _CHUNK_S} tokens of overlap so
    no boundary context is lost) — the document→training-sequence step
    of a pretraining data pipeline. Chunking happens ENTIRELY IN-ROW
    (sequence → transform → slice HOFs, then one explode): no shuffle,
    no per-doc window function, output size ≈ n/S rows per doc. The
    chunk count 1 + ceil(max(n−W, 0)/S) guarantees full coverage with a
    ragged final chunk; every chunk carries its token/char accounting
    and boundary tokens so the oracle pins the exact slice arithmetic.
    At 100 TB this is a pure map stage — it scales with scan bandwidth."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = (
        docs.select(
            "doc_id",
            F.split("text", " ").alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .withColumn(
            "n_chunks",
            F.lit(1)
            + (F.greatest(F.col("n") - _CHUNK_W, F.lit(0)) + (_CHUNK_S - 1))
            .cast("long")
            / F.lit(_CHUNK_S),
        )
        .withColumn("n_chunks", F.floor("n_chunks").cast("int"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, n_chunks - 1), i -> struct("
                    f"i as chunk_id, "
                    f"slice(toks, i * {_CHUNK_S} + 1, "
                    f"least({_CHUNK_W}, n - i * {_CHUNK_S})) as ctoks))"
                )
            ).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.chunk_id").cast("long").alias("chunk_id"),
            F.size("c.ctoks").cast("long").alias("n_tokens"),
            F.expr(
                "aggregate(c.ctoks, 0L, (a, x) -> a + length(x))"
            ).alias("n_chars"),
            F.element_at("c.ctoks", 1).alias("first_token"),
            F.element_at("c.ctoks", -1).alias("last_token"),
        )
    )
    return chunks


# ---------------------------------------------------------------------------
# Train/eval contamination: exact n-gram containment between an eval
# probe set and the training corpus — the decontamination gate every
# serious pretraining pipeline runs before training.
# ---------------------------------------------------------------------------
_CONTAM_N = 5      # n-gram length
_CONTAM_PCT = 20   # flag a probe doc when >= 20% of its n-grams appear


@query(
    "train_probe_contamination",
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         (doc_id % 101 = 0) AS is_probe,
         unnest(list_transform(
           generate_series(1, GREATEST(len(string_split(text, ' ')) - {_CONTAM_N - 1}, 0)),
           i -> array_to_string(string_split(text, ' ')[i : i + {_CONTAM_N - 1}], ' ')
         )) AS gram
  FROM documents
),
probe AS (SELECT DISTINCT doc_id, gram FROM g WHERE is_probe),
corpus AS (SELECT DISTINCT gram FROM g WHERE NOT is_probe),
hits AS (
  SELECT p.doc_id, COUNT(*) AS n_matched
  FROM probe p JOIN corpus c ON c.gram = p.gram
  GROUP BY p.doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM probe GROUP BY doc_id)
SELECT t.doc_id,
       CAST(t.n_grams AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_matched, 0) AS BIGINT) AS n_matched,
       COALESCE(h.n_matched, 0) * 100 >= t.n_grams * {_CONTAM_PCT}
         AS flagged
FROM tot t LEFT JOIN hits h ON h.doc_id = t.doc_id
""",
    tags=("text-decontamination", "training-prep", "J3"),
)
def train_probe_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {_CONTAM_N}-gram containment decontamination: probe docs
    (an eval-set stand-in, doc_id % 101 == 0) are checked against the
    training corpus (everything else); a probe doc is flagged when ≥
    {_CONTAM_PCT}% of its distinct {_CONTAM_N}-grams occur verbatim in
    the corpus — the GPT-3-style n-gram overlap gate. Plan shape for
    100 TB: probe n-grams are TINY (eval sets are small by definition)
    and broadcast; the corpus side streams through the broadcast hash
    join with NO corpus-wide distinct or shuffle — only matched (probe
    doc, gram) pairs (bounded by probe size) are shuffled for the
    distinct+count. The flag threshold is integer arithmetic
    (n_matched·100 ≥ n_grams·{_CONTAM_PCT}), no float compare. In-row
    n-gram construction via sequence→slice→array_join HOFs (short-doc
    safe: greatest(n−{_CONTAM_N - 1}, 0)). At production scale you'd
    join on xxhash64(gram) to shrink the broadcast; the string join
    here keeps the oracle engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        (F.col("doc_id") % 101 == 0).alias("is_probe"),
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(split(text, ' ')) - {_CONTAM_N - 1}, 0)),"
                f" i -> array_join(slice(split(text, ' '), i, {_CONTAM_N}), ' '))"
            )
        ).alias("gram"),
    )
    probe = grams.filter("is_probe").select("doc_id", "gram").distinct()
    corpus = grams.filter(~F.col("is_probe")).select("gram")
    hits = (
        corpus.join(F.broadcast(probe), "gram")
        .select("doc_id", "gram")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    tot = probe.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    # hits is probe-sized (tiny by definition) — broadcast the result
    # join too, so the whole query's only non-broadcast shuffle is the
    # bounded matched-pairs distinct
    return tot.join(F.broadcast(hits), "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
        (
            F.coalesce("n_matched", F.lit(0)) * 100
            >= F.col("n_grams") * _CONTAM_PCT
        ).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# Packed-sequence boundaries: concat-then-split sequence packing (the
# GPT-pretraining layout — documents concatenated in a deterministic
# order, split at exact context-length boundaries) restated as window
# arithmetic: each doc's span of packed sequences from the running
# token cumsum.
# ---------------------------------------------------------------------------
_PACK_C = 512  # packed context length, tokens


@query(
    "packed_sequence_boundaries",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM t
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(before // {_PACK_C} AS BIGINT) AS first_seq,
       CAST((before + n_tokens - 1) // {_PACK_C} AS BIGINT) AS last_seq,
       before // {_PACK_C} <> (before + n_tokens - 1) // {_PACK_C}
         AS straddles_boundary
FROM w
""",
    tags=("text-packing", "training-prep", "A8"),
)
def packed_sequence_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split sequence packing: documents are laid out in
    deterministic (lang, doc_id) order and the token stream is cut
    every {_PACK_C} tokens — each doc's packed-sequence span
    [first_seq, last_seq] and whether it straddles a cut falls out of
    ONE running-cumsum window per language (no explosion of the token
    stream, no iteration): first_seq = floor(before/C), last_seq =
    floor((before+n−1)/C). This is the attention-mask accounting a
    packing-aware loader needs (straddling docs leak context across
    sequence boundaries unless masked). At 100 TB: one shuffle on lang
    (the window partition key), integer-exact everywhere."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    first_seq = F.floor(before / _PACK_C).cast("long")
    last_seq = F.floor((before + F.col("n_tokens") - 1) / _PACK_C).cast("long")
    return t.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (first_seq != last_seq).alias("straddles_boundary"),
    )


# ---------------------------------------------------------------------------
# Token-budget allocation: largest-remainder apportionment of a global
# training-token budget across languages — integer-exact, so both
# engines agree bit-for-bit.
# ---------------------------------------------------------------------------
_BUDGET_TOKENS = 100_000
_LANG_WEIGHTS = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}  # per mille*10


@query(
    "token_budget_allocation",
    oracle=f"""
WITH w(lang, weight) AS (VALUES
  ('en', 40), ('de', 15), ('es', 15), ('fr', 15), ('zh', 15)
),
avail AS (
  SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS available_tokens
  FROM documents GROUP BY lang
),
base AS (
  SELECT a.lang, a.available_tokens, w.weight,
         ({_BUDGET_TOKENS} * w.weight) // 100 AS base_alloc,
         ({_BUDGET_TOKENS} * w.weight) % 100 AS rem
  FROM avail a JOIN w ON w.lang = a.lang
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rr,
         {_BUDGET_TOKENS} - SUM(base_alloc) OVER () AS leftover
  FROM base
)
SELECT lang, available_tokens, CAST(weight AS BIGINT) AS weight,
       CAST(base_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS allocated_tokens,
       LEAST(CAST(base_alloc + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT),
             available_tokens) AS final_tokens
FROM ranked
""",
    tags=("sampling", "allocation"),
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apportion a global training-token budget across languages by
    declared mixture weights using LARGEST-REMAINDER (Hamilton) rounding:
    integer base shares, the leftover units going to the largest
    fractional remainders with a deterministic language tie-break —
    allocations sum exactly to the budget, no float drift, bit-identical
    in both engines. `final_tokens` caps each share at what the corpus
    actually has (the signal a mixture planner uses to trigger
    upsampling or re-weighting). The same plan at 100 TB: the per-lang
    aggregate is the only data-sized stage; apportionment is a window
    over L rows."""
    docs = load_table(spark, sf_dir, "documents")
    avail = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("available_tokens")
    )
    weights = F.create_map(
        *[F.lit(x) for kv in _LANG_WEIGHTS.items() for x in kv]
    )
    base = (
        avail.withColumn("weight", F.element_at(weights, F.col("lang")))
        .filter(F.col("weight").isNotNull())  # = the oracle's inner join on w
    ).select(
        "lang",
        "available_tokens",
        "weight",
        F.expr(f"({_BUDGET_TOKENS}L * weight) div 100").alias("base_alloc"),
        F.expr(f"({_BUDGET_TOKENS}L * weight) % 100").alias("rem"),
    )
    w_rank = Window.orderBy(F.col("rem").desc(), "lang")
    w_all = Window.partitionBy()
    ranked = base.select(
        "lang",
        "available_tokens",
        F.col("weight").cast("long").alias("weight"),
        "base_alloc",
        F.row_number().over(w_rank).alias("rr"),
        (F.lit(_BUDGET_TOKENS) - F.sum("base_alloc").over(w_all)).alias("leftover"),
    )
    alloc = F.col("base_alloc") + F.when(
        F.col("rr") <= F.col("leftover"), F.lit(1)
    ).otherwise(F.lit(0))
    return ranked.select(
        "lang",
        "available_tokens",
        "weight",
        alloc.cast("long").alias("allocated_tokens"),
        F.least(alloc.cast("long"), F.col("available_tokens")).alias("final_tokens"),
    )


# ---------------------------------------------------------------------------
# Data-hygiene passes: PII-pattern extraction/redaction and boilerplate
# repetition scoring — the remaining two members of the standard
# pre-training quality stack (alongside text_quality and lang_id).
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9-]+@[a-z.]+"


@query(
    "pii_redaction_stats",
    oracle=f"""
WITH seeded AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact-' || doc_id || '@example.com'
              ELSE text END AS t
  FROM documents
)
SELECT doc_id, lang,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       len(regexp_extract_all(
             regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'), '{_EMAIL_RE}')) = 0
         AS redacted_clean,
       md5(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g')) AS redacted_md5
FROM seeded
""",
    tags=("text-hygiene", "pii"),
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern pass over the corpus: count email-shaped spans and
    emit the checksum of the redacted text — the shape of the scrub
    every pre-training pipeline runs before anything else. The fixture
    text carries no organic PII, so deterministic needles are derived
    per doc (1-in-7 docs get a synthesized contact address — the same
    derivation restated in the oracle), making the extraction, the
    global redaction, and the checksum all non-trivially exercised and
    hash-gated. Pure projection — no shuffle; at 100 TB this runs as a
    mapper fused into the ingest scan. `redacted_clean` asserts the
    redacted text no longer matches the pattern."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"), F.lit(" contact-"), F.col("doc_id"), F.lit("@example.com")
        ),
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(t, _EMAIL_RE, "<EMAIL>")
    return docs.select(
        "doc_id",
        "lang",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), 0)).cast("long").alias(
            "n_emails"
        ),
        (F.size(F.regexp_extract_all(redacted, F.lit(_EMAIL_RE), 0)) == 0).alias(
            "redacted_clean"
        ),
        F.md5(F.encode(redacted, "utf-8")).alias("redacted_md5"),
    )


@query(
    "doc_repetition_stats",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
cnt AS (
  SELECT doc_id, token, COUNT(*) AS c FROM tok WHERE token <> ''
  GROUP BY doc_id, token
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(MAX(c) AS BIGINT) AS top_token_freq,
       1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS repetition_score
FROM cnt GROUP BY doc_id
""",
    tags=("text-hygiene", "repetition"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition scoring per document: distinct-token ratio
    and the mode token's frequency, folded into a repetition score (the
    gate that drops template spam and looping generations). Computed
    ENTIRELY in-row with array HOFs — distinct via array_distinct, the
    mode frequency by counting each distinct token's occurrences inside
    the row — so the pass is a pure projection with no explode and no
    shuffle; the oracle states the same stats the relational way
    (unnest + two aggregates) and the values hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr("filter(split(text, ' '), x -> x <> '')")
    dist = F.array_distinct(toks)
    top = F.array_max(
        F.transform(dist, lambda t: F.size(F.filter(toks, lambda x: x == t)))
    )
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(dist).cast("long").alias("n_distinct"),
        top.cast("long").alias("top_token_freq"),
        (
            F.lit(1.0) - F.size(dist).cast("double") / F.size(toks).cast("double")
        ).alias("repetition_score"),
    )


# ---------------------------------------------------------------------------
# Exact-N stratified sampling: hash-RANK (not hash-gate) membership —
# "exactly N docs per language, reproducibly", the fixed-budget sibling
# of the rate-based stratified_corpus_sample.
# ---------------------------------------------------------------------------
_EXACT_N_PER_LANG = 40


@query(
    "exact_stratified_sample",
    oracle=f"""
WITH h AS (
  SELECT doc_id, lang, ({_SAMPLE_HEX8}) AS hkey FROM documents
),
r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hkey, doc_id) AS sample_rank
  FROM h
)
SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
FROM r WHERE sample_rank <= {_EXACT_N_PER_LANG}
""",
    tags=("sampling-stratified", "W2"),
)
def exact_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly {_EXACT_N_PER_LANG} documents per language, chosen by
    HASH RANK: order each stratum by a salted content-independent hash
    of the row id and keep the first N. Unlike a rate gate (which only
    hits a budget in expectation) this lands the budget exactly; unlike
    limit()/sample() it is reproducible under reruns, repartitioning,
    and cluster-size changes, and appends only perturb membership near
    the rank boundary. Plan: one shuffle on the stratum key and a
    rank-limited window — Spark runs it as WindowGroupLimit, so
    partial top-N per task bounds what reaches the exchange (the same
    machinery as the W2 sort+limit family)."""
    docs = load_table(spark, sf_dir, "documents")
    hkey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("lang").orderBy("hkey", "doc_id")
    return (
        docs.select("doc_id", "lang", hkey.alias("hkey"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= _EXACT_N_PER_LANG)
        .select("doc_id", "lang", "sample_rank")
    )


# ---------------------------------------------------------------------------
# Incremental corpus maintenance: snapshot diff between two crawl
# versions — the added/removed/changed accounting that decides how much
# of a 100 TB corpus actually needs re-processing.
# ---------------------------------------------------------------------------
@query(
    "corpus_snapshot_diff",
    oracle="""
WITH v1 AS (SELECT doc_id, text FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
),
j AS (
  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.doc_id IS NULL THEN 'added'
              WHEN md5(a.text) <> md5(b.text) THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM j GROUP BY status
""",
    tags=("corpus-diff", "incremental"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff two corpus snapshots by key and content fingerprint:
    added / removed / changed / unchanged counts (with id ranges as a
    sanity band). The second crawl is fixture-derived — every 13th doc
    dropped, every 7th rewritten, every 11th re-added under a new id —
    with the identical derivation in the oracle. This is the accounting
    pass an incremental pipeline runs BEFORE dedup/tokenize/embed: only
    'added' + 'changed' move on, so downstream cost is proportional to
    churn, not corpus size. One full-outer hash join on the key (both
    sides hash-partition; content comparison by md5 so wide text never
    crosses the exchange twice) + a 4-group aggregate."""
    v1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = load_table(spark, sf_dir, "documents")
    v2 = (
        base.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
            )
        )
    )
    a = v1.select("doc_id", F.md5("text").alias("fp_a"))
    b = v2.select(F.col("doc_id").alias("doc_id_b"), F.md5("text").alias("fp_b"))
    j = a.join(b, a.doc_id == b.doc_id_b, "full_outer").select(
        F.coalesce(F.col("doc_id"), F.col("doc_id_b")).alias("doc_id"),
        F.when(F.col("doc_id_b").isNull(), F.lit("removed"))
        .when(F.col("doc_id").isNull(), F.lit("added"))
        .when(F.col("fp_a") != F.col("fp_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    return j.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# The actual BPE TRAINING LOOP: iterate (count adjacent pairs → pick the
# most frequent merge → apply it greedily corpus-wide), the algorithm a
# tokenizer trainer runs — `bpe_pair_counts` is its round-0 counting
# pass; this runs the full loop with exact cross-engine parity.
# ---------------------------------------------------------------------------
_BPE_ROUNDS = 3

# Greedy left-to-right merge application is expressed through plain
# string replace() over sentinel-wrapped tokens: every token is wrapped
# in \x02 and adjacent tokens share a \x02\x02 boundary, so the pattern
# \x02 p1 \x02\x02 p2 \x02 can only match whole-token pairs, and both
# engines' replace() scan left-to-right over non-overlapping matches —
# exactly BPE's greedy application order ("a a a" merges once, not
# twice). Merged symbols carry \x01 between their parts.


def _bpe_oracle(rounds: int) -> str:
    ctes = [
        "d0 AS (SELECT doc_id, chr(2) || array_to_string("
        "list_filter(string_split(text, ' '), x -> x <> ''), chr(2)||chr(2))"
        " || chr(2) AS s FROM documents)"
    ]
    rows = []
    for r in range(rounds):
        ctes.append(
            f"t{r} AS (SELECT doc_id, string_split(trim(s, chr(2)),"
            f" chr(2)||chr(2)) AS t FROM d{r})"
        )
        ctes.append(
            f"p{r} AS (SELECT t[i] AS p1, t[i+1] AS p2, COUNT(*) AS c"
            f" FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i"
            f" FROM t{r} WHERE len(t) >= 2) GROUP BY 1, 2)"
        )
        ctes.append(
            f"b{r} AS (SELECT p1, p2, c FROM p{r}"
            f" ORDER BY c DESC, p1, p2 LIMIT 1)"
        )
        ctes.append(
            f"d{r + 1} AS (SELECT doc_id,"
            f" replace(s, chr(2)||b.p1||chr(2)||chr(2)||b.p2||chr(2),"
            f" chr(2)||b.p1||chr(1)||b.p2||chr(2)) AS s FROM d{r}, b{r} b)"
        )
        ctes.append(
            f"a{r} AS (SELECT SUM(len(string_split(trim(s, chr(2)),"
            f" chr(2)||chr(2)))) AS n FROM d{r + 1})"
        )
        rows.append(
            f"SELECT {r} AS merge_round,"
            f" replace(b.p1 || chr(1) || b.p2, chr(1), '|') AS merged_pair,"
            f" CAST(b.c AS BIGINT) AS pair_count,"
            f" CAST(a.n AS BIGINT) AS tokens_after"
            f" FROM b{r} b, a{r} a"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


@query(
    "bpe_train_merges",
    oracle=_bpe_oracle(_BPE_ROUNDS),
    tags=("text-bpe", "iterative"),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, the real loop: for each of
    {_BPE_ROUNDS} rounds, count adjacent symbol pairs corpus-wide, pick
    the most frequent (ties → lexicographically smallest, both engines),
    and apply the merge greedily left-to-right everywhere. Emits one row
    per round: the merged pair, its pre-merge count, and the corpus
    token total after application. The oracle unrolls the IDENTICAL
    rounds as chained CTEs (the `ivf_kmeans_clusters` pattern), so pair
    counting, tie-breaking, and greedy application order are all
    value-checked — including the overlap rule ("a a a" merges once).

    Spark-first shape per round: in-row pair construction (zip_with
    over two shifted slices — no self-join), one keyed count shuffle,
    a TakeOrdered(1) for the winner, then the merge applied as a 1-row
    broadcast join + string replace (no UDF anywhere). localCheckpoint
    between rounds cuts lineage, so N rounds = N bounded plans — the
    same discipline as distributed KMeans/connected-components. At
    100 TB each round is one aggregation over the corpus; the winner
    selection and merge broadcast are O(vocab) and O(1)."""
    _, round_rows = _bpe_rounds(spark, sf_dir, _BPE_ROUNDS)
    out = round_rows[0]
    for extra in round_rows[1:]:
        out = out.unionByName(extra)
    return out


_BPE_TOKS_EXPR = "split(btrim(s, chr(2)), concat(chr(2), chr(2)))"


def _bpe_rounds(
    spark: SparkSession, sf_dir: str, rounds: int
) -> tuple[DataFrame, list[DataFrame]]:
    """Run the BPE training loop; returns (final merged corpus as
    (doc_id, s) with sentinel-wrapped symbols, one 1-row stats frame per
    round). Shared by the trainer query and the corpus encoder so the
    merges they report/apply are definitionally the same."""
    docs = load_table(spark, sf_dir, "documents")
    wrap = F.concat(
        F.lit("\x02"),
        F.array_join(
            F.expr("filter(split(text, ' '), x -> x <> '')"), "\x02\x02"
        ),
        F.lit("\x02"),
    )
    cur = docs.select("doc_id", wrap.alias("s")).localCheckpoint()
    toks_expr = _BPE_TOKS_EXPR
    pairs_expr = f"""
        CASE WHEN size({toks_expr}) >= 2
             THEN zip_with(
                    slice({toks_expr}, 1, size({toks_expr}) - 1),
                    slice({toks_expr}, 2, size({toks_expr}) - 1),
                    (a, b) -> named_struct('p1', a, 'p2', b))
             ELSE array()
        END
    """
    round_rows = []
    for r in range(rounds):
        best = (
            cur.select(F.explode(F.expr(pairs_expr)).alias("pr"))
            .select("pr.p1", "pr.p2")
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), "p1", "p2")
            .limit(1)
            .localCheckpoint()
        )
        merged = (
            cur.crossJoin(F.broadcast(best))
            .select(
                "doc_id",
                F.expr(
                    "replace(s, concat(chr(2), p1, chr(2), chr(2), p2, chr(2)),"
                    " concat(chr(2), p1, chr(1), p2, chr(2)))"
                ).alias("s"),
            )
            .localCheckpoint()
        )
        after = merged.agg(
            F.sum(F.size(F.expr(toks_expr))).cast("long").alias("tokens_after")
        )
        round_rows.append(
            best.crossJoin(after).select(
                F.lit(r).cast("long").alias("merge_round"),
                F.expr(
                    "replace(concat(p1, chr(1), p2), chr(1), '|')"
                ).alias("merged_pair"),
                F.col("c").cast("long").alias("pair_count"),
                "tokens_after",
            )
        )
        cur = merged
    return cur, round_rows


@query(
    "bpe_encode_corpus",
    oracle=_bpe_oracle(_BPE_ROUNDS).split("\nSELECT 0 AS merge_round")[0]
    + """
SELECT d.doc_id,
       CAST(len(string_split(trim(d0.s, chr(2)), chr(2)||chr(2))) AS BIGINT)
         AS n_tokens_before,
       CAST(len(string_split(trim(d.s, chr(2)), chr(2)||chr(2))) AS BIGINT)
         AS n_tokens_after,
       CAST(len(list_filter(string_split(trim(d.s, chr(2)), chr(2)||chr(2)),
                            x -> contains(x, chr(1)))) AS BIGINT)
         AS n_merged_symbols
FROM d3 d JOIN d0 ON d0.doc_id = d.doc_id
""",
    tags=("text-bpe", "iterative"),
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE the corpus with the trained merges: after the
    {_BPE_ROUNDS}-round training loop, every document's symbol stream
    has the winning merges applied greedily — this query reports the
    per-document compression accounting (tokens before/after, merged
    symbols present), i.e. what a tokenizer-application pass feeds to
    sequence packing. Shares `_bpe_rounds` with the trainer, and the
    oracle reuses the trainer's unrolled CTE chain ending at the merged
    corpus d3, so training and application cannot diverge. Per-doc
    arithmetic only on top of the loop — no additional shuffle."""
    merged, _ = _bpe_rounds(spark, sf_dir, _BPE_ROUNDS)
    before = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
        .cast("long")
        .alias("n_tokens_before"),
    )
    toks = F.expr(_BPE_TOKS_EXPR)
    after = merged.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens_after"),
        F.size(F.filter(toks, lambda x: x.contains("\x01")))
        .cast("long")
        .alias("n_merged_symbols"),
    )
    return before.join(after, "doc_id")


# ---------------------------------------------------------------------------
# BM25 relevance ranking in exact fixed-point integer arithmetic
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "merge", "window")
_BM25_TOPK = 10
_BM25_TFCAP = 20  # tf saturation cap keeps the integer numerator in int64


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, L, bm25_x1000) for every document containing at
    least one query term — the shared scoring table behind bm25_topdocs
    and the hybrid RRF retrieval composite."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != F.lit(""))
    base = docs.select("doc_id", "lang", toks.alias("toks")).withColumn(
        "L", F.size("toks").cast("long")
    )

    def _eq(term):  # one-arg lambda: a 2-arg one would bind (element, index)
        return lambda x: x == F.lit(term)

    term_tfs = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                F.size(F.filter(F.col("toks"), _eq(t))).cast("long").alias("tf"),
            )
            for t in _BM25_TERMS
        ]
    )
    tf = (
        base.select("doc_id", "L", F.explode(term_tfs).alias("e"))
        .select("doc_id", "L", "e.t", "e.tf")
        .filter(F.col("tf") > 0)
    )
    df = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus"),
        F.sum("L").cast("long").alias("t_corpus"),
    )
    ctf = f"LEAST(tf, {_BM25_TFCAP})"
    contrib = (
        tf.join(F.broadcast(df), "t")
        .join(F.broadcast(tot))
        .withColumn(
            "c",
            F.expr(
                f"((2 * n_corpus - 2 * df + 1) * 1000 div (2 * df + 1))"
                f" * (44 * t_corpus * {ctf})"
                f" div (20 * t_corpus * {ctf} + 6 * t_corpus"
                f" + 18 * L * n_corpus)"
            ),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("bm25_x1000")
    )
    return scored.join(base.select("doc_id", "lang", "L"), "doc_id")


@query(
    "bm25_topdocs",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
lens AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS L
  FROM tok WHERE t <> '' GROUP BY doc_id
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS N, CAST(SUM(L) AS BIGINT) AS T FROM lens
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE t IN {repr(tuple(_BM25_TERMS))}
  GROUP BY doc_id, t
),
df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t),
contrib AS (
  SELECT tf.doc_id,
         ((2 * tot.N - 2 * df.df + 1) * 1000 // (2 * df.df + 1))
         * (44 * tot.T * LEAST(tf.tf, {_BM25_TFCAP}))
         // (20 * tot.T * LEAST(tf.tf, {_BM25_TFCAP}) + 6 * tot.T
             + 18 * lens.L * tot.N) AS c
  FROM tf
  JOIN df ON df.t = tf.t
  JOIN lens ON lens.doc_id = tf.doc_id
  CROSS JOIN tot
),
scored AS (
  SELECT c.doc_id, CAST(SUM(c.c) AS BIGINT) AS bm25_x1000
  FROM contrib c GROUP BY c.doc_id
)
SELECT s.doc_id, d.lang, lens.L AS n_tokens, s.bm25_x1000,
       CAST(ROW_NUMBER() OVER (ORDER BY s.bm25_x1000 DESC, s.doc_id)
            AS BIGINT) AS rank
FROM scored s
JOIN documents d ON d.doc_id = s.doc_id
JOIN lens ON lens.doc_id = s.doc_id
ORDER BY s.bm25_x1000 DESC, s.doc_id
LIMIT {_BM25_TOPK}
""",
    tags=("text-ranking", "bm25"),
)
def bm25_topdocs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a fixed query term set,
    computed ENTIRELY in integer arithmetic so the score — normally a
    float with a log idf — is bit-exact and order-independent. The
    algebra: with k1 = 6/5 and b = 3/4, tf·(k1+1)/(tf + k1(1-b+b·L/avg))
    multiplied through by the corpus totals becomes
    44·T·tf / (20·T·tf + 6·T + 18·L·N); the Robertson idf ratio
    (N-df+1/2)/(df+1/2) is scaled x1000 as (2N-2df+1)·1000 // (2df+1)
    (log-free — monotone in the same argument, so ranking-equivalent;
    the absolute scores are the declared fixed-point semantics). tf is
    capped at {_BM25_TFCAP} (BM25 saturates anyway), which bounds the
    integer numerator within int64 through sf10.

    Plan shape: per-term tf via in-row array filters (NO corpus
    explode-shuffle for the query terms), document stats from one
    projection, term df + corpus totals as tiny broadcast sides, final
    top-{_BM25_TOPK} as TakeOrderedAndProject. At 100 TB this is one
    narrow scan + vocabulary-sized joins."""
    scored = bm25_scored(spark, sf_dir)
    w = Window.orderBy(F.col("bm25_x1000").desc(), "doc_id")
    return (
        scored.orderBy(F.col("bm25_x1000").desc(), "doc_id")
        .limit(_BM25_TOPK)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "doc_id", "lang", F.col("L").alias("n_tokens"), "bm25_x1000", "rank"
        )
    )


# ---------------------------------------------------------------------------
# Bigram language model with Kneser-Ney discounting, in exact fixed point
# ---------------------------------------------------------------------------

_KN_TOPK = 20
_KN_SCALE = 1_000_000  # probabilities reported as floor(p * 1e6)


@query(
    "bigram_kn_lm",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
idx AS (
  SELECT doc_id, tk,
         unnest(generate_series(1, GREATEST(len(tk) - 1, 0))) AS i
  FROM toks
),
pairs AS (
  SELECT tk[i] AS a, tk[i + 1] AS b FROM idx
  WHERE tk[i] <> '' AND tk[i + 1] <> ''
),
big AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c12 FROM pairs GROUP BY a, b
),
uni AS (SELECT a, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY a),
fol AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS n_follow FROM big GROUP BY a),
pre AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_precede FROM big GROUP BY b),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM big)
SELECT big.a, big.b, big.c12, uni.c1, fol.n_follow, pre.n_precede,
       ({_KN_SCALE} * (4 * big.c12 - 3)) // (4 * uni.c1)
       + ({_KN_SCALE} * 3 * fol.n_follow * pre.n_precede)
         // (4 * uni.c1 * tot.n_types) AS pkn_x1e6
FROM big
JOIN uni ON uni.a = big.a
JOIN fol ON fol.a = big.a
JOIN pre ON pre.b = big.b
CROSS JOIN tot
ORDER BY big.c12 DESC, big.a, big.b
LIMIT {_KN_TOPK}
""",
    tags=("text-lm", "kneser-ney"),
)
def bigram_kn_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram language model over the corpus —
    the classic n-gram LM estimator (Chen & Goodman 1999), in EXACT
    fixed-point arithmetic: with discount D = 3/4,

      p_kn(b|a) = max(c(a,b) - D, 0)/c(a)
                + D·N1+(a,·)/c(a) · N1+(·,b)/B

    becomes, multiplied through by 4 and floored at x1e6 scale,
    1e6·(4c12-3) // (4c1)  +  1e6·3·n_follow·n_precede // (4c1·B) —
    two integer floor divisions whose sum is bit-identical on any
    engine and any aggregation order (c12 >= 1 for every emitted
    bigram, so the max() clamp never binds).

    Plan shape: ONE corpus-sized shuffle (the bigram count); unigram
    totals, continuation counts (the novel-context counts that make KN
    better than Katz backoff), and the type total B are all derived
    from the vocabulary-sized bigram table itself — the same
    derive-from-the-aggregate discipline as doc_tfidf_topterms. Final
    top-{_KN_TOPK} by count is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = adjacent_token_pairs(docs)
    big = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("long").alias("c12"))
    big = big.persist()
    uni = big.groupBy("a").agg(F.sum("c12").cast("long").alias("c1"))
    fol = big.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("n_follow"))
    pre = big.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("n_precede"))
    tot = big.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    return (
        big.join(F.broadcast(uni.join(fol, "a")), "a")
        .join(F.broadcast(pre), "b")
        .join(F.broadcast(tot))
        .withColumn(
            "pkn_x1e6",
            F.expr(
                f"({_KN_SCALE} * (4 * c12 - 3)) div (4 * c1)"
                f" + ({_KN_SCALE} * 3 * n_follow * n_precede)"
                f" div (4 * c1 * n_types)"
            ),
        )
        .orderBy(F.col("c12").desc(), "a", "b")
        .limit(_KN_TOPK)
        .select("a", "b", "c12", "c1", "n_follow", "n_precede", "pkn_x1e6")
    )


# ---------------------------------------------------------------------------
# Quality-score calibration: does the heuristic score actually predict
# dedup survival? (the check you run before trusting a filter threshold)
# ---------------------------------------------------------------------------


@query(
    "quality_survival_calibration",
    oracle=f"""
WITH q AS ({_QUALITY_SQL}),
s AS (
  SELECT doc_id,
         (doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))) AS keep
  FROM documents
),
b AS (
  SELECT LEAST(CAST(FLOOR(q.quality_score * 10) AS BIGINT), 9) AS bucket,
         s.keep
  FROM q JOIN s ON s.doc_id = q.doc_id
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1000 // COUNT(*)
            AS BIGINT) AS survival_x1000
FROM b GROUP BY bucket
""",
    tags=("text-quality", "calibration"),
)
def quality_survival_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALIBRATION of the heuristic quality score against an observed
    outcome: bucket every document into score deciles and measure, per
    bucket, the exact-dedup survival rate (keep-first policy). This is
    the check a pipeline runs before trusting a score threshold — if
    survival is flat across buckets the score is not measuring what the
    filter assumes. Deciles come from a fixed formula bucket
    (floor(score*10), clamped), NOT ntile — no single-partition global
    window, and the bucketing is reproducible across runs and engines
    because the score itself is a fixed float op sequence. One md5
    window for the outcome + one bucket aggregation; survival reported
    as an integer rate (x1000, floor) so the gate stays hash-exact."""
    q = text_quality(spark, sf_dir).select("doc_id", "quality_score")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    keep = docs.select(
        "doc_id",
        (
            F.col("doc_id")
            == F.min("doc_id").over(Window.partitionBy(F.md5("text")))
        ).alias("keep"),
    )
    b = q.join(keep, "doc_id").select(
        F.least(
            F.floor(F.col("quality_score") * 10).cast("long"), F.lit(9)
        ).alias("bucket"),
        "keep",
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_survivors"),
        F.expr(
            "CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) * 1000"
            " div COUNT(*) AS BIGINT)"
        ).alias("survival_x1000"),
    )


# ---------------------------------------------------------------------------
# Vocabulary concentration (collision probability — the Rényi-2 entropy
# proxy a corpus-health dashboard tracks without a transcendental log)
# ---------------------------------------------------------------------------


@query(
    "vocab_concentration_stats",
    oracle="""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents
),
tf AS (
  SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok WHERE t <> '' GROUP BY lang, t
),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY lang)
SELECT tf.lang,
       CAST(MAX(tot.n) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(((tf.c * 1000000000) // tot.n) * tf.c // tot.n) AS BIGINT)
         AS collision_x1e9,
       CAST(MAX(tf.c) * 1000 // MAX(tot.n) AS BIGINT) AS top_share_x1000
FROM tf JOIN tot ON tot.lang = tf.lang
GROUP BY tf.lang
""",
    tags=("text-vocab", "corpus-health"),
)
def vocab_concentration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary CONCENTRATION: the token-collision
    probability Σ(c/N)² — the Rényi-2 entropy proxy (2^-H2) — plus the
    head token's share. A language whose collision probability climbs
    between crawls is losing diversity (template flooding); unlike
    Shannon entropy there is no transcendental log, so the declared
    fixed-point estimator Σ ((c·1e9)//N)·c//N is bit-identical across
    engines and merge orders. One corpus explode into (lang, term)
    counts (the same exchange the vocabulary/TF-IDF family already
    pays), then a vocabulary-sized aggregation."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("lang", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    tf = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = tf.groupBy("lang").agg(F.sum("c").cast("long").alias("n"))
    return (
        tf.join(F.broadcast(tot), "lang")
        .groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.expr("((c * 1000000000) div n) * c div n"))
            .cast("long")
            .alias("collision_x1e9"),
            F.expr("CAST(MAX(c) * 1000 div MAX(n) AS BIGINT)").alias(
                "top_share_x1000"
            ),
        )
    )


# ---------------------------------------------------------------------------
# LM-likelihood quality gate: score every document under the corpus
# Kneser-Ney bigram LM (the CCNet/Gopher-style perplexity filter, in the
# engine's exact fixed-point restatement)
# ---------------------------------------------------------------------------

_LM_GATE_X1E6 = 20_000  # mean bigram probability below 2% → gibberish flag


@query(
    "doc_lm_likelihood_gate",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
idx AS (
  SELECT doc_id, tk,
         unnest(generate_series(1, GREATEST(len(tk) - 1, 0))) AS i
  FROM toks
),
dpairs AS (
  SELECT doc_id, tk[i] AS a, tk[i + 1] AS b FROM idx
  WHERE tk[i] <> '' AND tk[i + 1] <> ''
),
big AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c12 FROM dpairs GROUP BY a, b
),
uni AS (SELECT a, CAST(SUM(c12) AS BIGINT) AS c1 FROM big GROUP BY a),
fol AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS n_follow FROM big GROUP BY a),
pre AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_precede FROM big GROUP BY b),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM big),
prob AS (
  SELECT big.a, big.b,
         ({_KN_SCALE} * (4 * big.c12 - 3)) // (4 * uni.c1)
         + ({_KN_SCALE} * 3 * fol.n_follow * pre.n_precede)
           // (4 * uni.c1 * tot.n_types) AS pkn_x1e6
  FROM big
  JOIN uni ON uni.a = big.a
  JOIN fol ON fol.a = big.a
  JOIN pre ON pre.b = big.b
  CROSS JOIN tot
),
scored AS (
  SELECT dp.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(p.pkn_x1e6) AS BIGINT) AS sum_pkn_x1e6
  FROM dpairs dp JOIN prob p ON p.a = dp.a AND p.b = dp.b
  GROUP BY dp.doc_id
)
SELECT s.doc_id, d.lang, s.n_bigrams,
       CAST(s.sum_pkn_x1e6 // s.n_bigrams AS BIGINT) AS mean_pkn_x1e6,
       (s.sum_pkn_x1e6 // s.n_bigrams) < {_LM_GATE_X1E6} AS flag_gibberish
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
""",
    tags=("text-lm", "quality-gate", "kneser-ney"),
)
def doc_lm_likelihood_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-DOCUMENT likelihood under the corpus bigram LM — the
    CCNet/Gopher-style LM quality filter (score each doc with a language
    model trained on the corpus, flag the improbable tail as gibberish)
    composed from `bigram_kn_lm`'s exact fixed-point KN estimator: every
    bigram occurrence in a doc scores its corpus p_kn (x1e6), and the
    doc's mean (one integer floor divide) gates against a declared 2%
    threshold. Unlike real perplexity (a float log-sum), the fixed-point
    mean is bit-exact on any engine and merge order — the declared
    semantics, rank-equivalent for thresholding.

    Plan: one corpus bigram-count shuffle; uni/fol/pre/tot derive from
    the vocabulary-sized bigram table and broadcast back onto the
    doc-keyed pair stream; the per-doc aggregation is the only other
    exchange. At 100 TB: corpus-sized work is 2 shuffles, everything
    else is vocabulary-sized."""
    docs = load_table(spark, sf_dir, "documents")
    dpairs = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with("
                    "slice(toks, 1, greatest(size(toks) - 1, 0)), "
                    "slice(toks, 2, greatest(size(toks) - 1, 0)), "
                    "(a, b) -> struct(a, b))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.a", "p.b")
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )
    big = dpairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    big = big.persist()
    uni = big.groupBy("a").agg(F.sum("c12").cast("long").alias("c1"))
    fol = big.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("n_follow"))
    pre = big.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("n_precede"))
    tot = big.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    prob = (
        big.join(F.broadcast(uni.join(fol, "a")), "a")
        .join(F.broadcast(pre), "b")
        .join(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.expr(
                f"({_KN_SCALE} * (4 * c12 - 3)) div (4 * c1)"
                f" + ({_KN_SCALE} * 3 * n_follow * n_precede)"
                f" div (4 * c1 * n_types)"
            ).alias("pkn_x1e6"),
        )
    )
    scored = (
        dpairs.join(F.broadcast(prob), ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("pkn_x1e6").cast("long").alias("sum_pkn_x1e6"),
        )
    )
    return (
        scored.join(docs.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            F.expr("cast(sum_pkn_x1e6 div n_bigrams as bigint)").alias(
                "mean_pkn_x1e6"
            ),
            (
                F.expr("sum_pkn_x1e6 div n_bigrams") < _LM_GATE_X1E6
            ).alias("flag_gibberish"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility by language (the metric tokenizer teams track:
# subword tokens per whitespace word, per language)
# ---------------------------------------------------------------------------
@query(
    "tokenizer_fertility_by_lang",
    oracle=_bpe_oracle(_BPE_ROUNDS).split("\nSELECT 0 AS merge_round")[0]
    + """
, fert AS (
  SELECT doc.lang,
         CAST(SUM(len(string_split(trim(d0.s, chr(2)), chr(2)||chr(2))))
              AS BIGINT) AS n_words,
         CAST(SUM(len(string_split(trim(d3.s, chr(2)), chr(2)||chr(2))))
              AS BIGINT) AS n_tokens
  FROM d3 JOIN d0 ON d0.doc_id = d3.doc_id
  JOIN documents doc ON doc.doc_id = d3.doc_id
  GROUP BY doc.lang
)
SELECT lang, n_words, n_tokens,
       CAST(n_tokens * 1000 // n_words AS BIGINT) AS fertility_x1000
FROM fert
""",
    tags=("text-bpe", "tokenizer-metrics"),
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per language — subword tokens emitted per
    whitespace word, the number tokenizer teams watch when a vocabulary
    under-serves a language (high fertility = more sequence length spent
    per word = worse effective context and higher training cost for that
    language). Uses the engine's own trained BPE (shared `_bpe_rounds`
    kernel, so the merges are definitionally the trainer's); with only
    3 merge rounds fertility sits just under the pre-merge 1.0
    baseline — on a real vocab the same query reports the 1.2-2x spreads
    that drive per-language budget corrections (`token_budget_allocation`
    is the downstream consumer). Fixed-point x1000 ratio, one floor
    divide per language; per-lang rollup adds one vocabulary-bounded
    shuffle on top of the training loop."""
    merged, _ = _bpe_rounds(spark, sf_dir, _BPE_ROUNDS)
    docs = load_table(spark, sf_dir, "documents")
    before = docs.select(
        "doc_id",
        "lang",
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')"))
        .cast("long")
        .alias("n_w"),
    )
    toks = F.expr(_BPE_TOKS_EXPR)
    after = merged.select(
        "doc_id", F.size(toks).cast("long").alias("n_t")
    )
    return (
        before.join(after, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_w").cast("long").alias("n_words"),
            F.sum("n_t").cast("long").alias("n_tokens"),
        )
        .select(
            "lang",
            "n_words",
            "n_tokens",
            F.expr("cast(n_tokens * 1000 div n_words as bigint)").alias(
                "fertility_x1000"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Collocation extraction: top bigrams by lift (the PMI ranking, stated
# without transcendentals)
# ---------------------------------------------------------------------------
_COLL_MIN_SUPPORT = 5
_COLL_TOPN = 50


@query(
    "bigram_collocations_lift",
    oracle=f"""
WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
bi AS (
  SELECT ts[i] AS x, ts[i + 1] AS y
  FROM toks, unnest(range(1, len(ts))) AS u(i)
),
cxy AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c_xy FROM bi GROUP BY x, y),
uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bi FROM bi)
SELECT x, y, c_xy,
       CAST(ROW_NUMBER() OVER (ORDER BY lift DESC, x, y) AS BIGINT) AS rank,
       lift
FROM (
  SELECT cxy.x, cxy.y, cxy.c_xy,
         CAST(cxy.c_xy * n.n_bi AS DOUBLE) / CAST(ux.c * uy.c AS DOUBLE) AS lift
  FROM cxy
  JOIN uni ux ON ux.tok = cxy.x
  JOIN uni uy ON uy.tok = cxy.y
  CROSS JOIN n
  WHERE cxy.c_xy >= {_COLL_MIN_SUPPORT}
)
QUALIFY rank <= {_COLL_TOPN}
""",
    tags=("corpus-analysis", "A1", "collocations"),
)
def bigram_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction: the top bigrams by LIFT — c(x,y)·N /
    (c(x)·c(y)), the monotone transform of PMI (PMI = ln lift), ranked
    without computing a logarithm so every comparison is on one
    correctly-rounded IEEE divide of exact int64 cross-products and the
    oracle hash-matches (libm ln/pow rounding differs across engines;
    the ratio does not).

    Plan shape: bigrams are extracted MAP-SIDE with two array slices
    zipped (no window, no per-token shuffle): each doc row emits its
    n−1 adjacent pairs in one projection. Then one groupBy for pair
    counts, one for unigram counts, two equi-joins (vocab-sized right
    sides), a 1-row total broadcast, and a top-N sort of the
    support-filtered survivors (TakeOrderedAndProject — never a global
    sort of the full pair space). At 100 TB every stage is a keyed
    hash aggregation; the support filter keeps the ranked set tiny.

    This is the statistical phrase-mining stage (collocation tables)
    of a training-corpus pipeline, next to `bigram_kn_lm` (which
    smooths these same counts into an LM) and `doc_lm_likelihood_gate`
    (which filters with them)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("ts"))
    sz = F.size("ts")
    bi = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("ts", 1, sz - 1).alias("x"),
                F.slice(F.col("ts"), 2, sz - 1).alias("y"),
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    cxy = bi.groupBy("x", "y").agg(F.count(F.lit(1)).alias("c_xy"))
    uni = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = bi.agg(F.count(F.lit(1)).alias("n_bi"))
    scored = (
        cxy.filter(F.col("c_xy") >= _COLL_MIN_SUPPORT)
        .join(uni.withColumnRenamed("tok", "x").withColumnRenamed("c", "cx"), "x")
        .join(uni.withColumnRenamed("tok", "y").withColumnRenamed("c", "cy"), "y")
        .join(F.broadcast(n))
        .select(
            "x",
            "y",
            "c_xy",
            (
                (F.col("c_xy") * F.col("n_bi")).cast("double")
                / (F.col("cx") * F.col("cy")).cast("double")
            ).alias("lift"),
        )
    )
    top = scored.orderBy(F.col("lift").desc(), "x", "y").limit(_COLL_TOPN)
    w = Window.orderBy(F.col("lift").desc(), "x", "y")
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "x", "y", "c_xy", "rank", "lift"
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction: stopword-delimited phrases scored by word
# degree/frequency (Rose et al. 2010), in integer fixed-point
# ---------------------------------------------------------------------------
_RAKE_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "as")
_RAKE_MAX_PHRASE = 4
_RAKE_TOPN = 25
_RAKE_PPM = 1_000_000


@query(
    "rake_keyword_extraction",
    oracle=f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
),
e AS (
  SELECT doc_id, z[1] AS tok, CAST(z[2] AS BIGINT) AS pos
  FROM t, unnest(list_zip(toks,
                 list_transform(range(1, len(toks) + 1),
                                x -> CAST(x AS VARCHAR)))) AS u(z)
),
ns AS (
  SELECT doc_id, tok, pos,
         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM e WHERE tok NOT IN {_RAKE_STOPWORDS!r}
),
ph AS (
  SELECT doc_id, run_id, array_agg(tok ORDER BY pos) AS words
  FROM ns GROUP BY doc_id, run_id
  HAVING COUNT(*) <= {_RAKE_MAX_PHRASE}
),
wstats AS (
  SELECT w AS tok,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(len(words)) AS BIGINT) AS degree
  FROM ph, unnest(words) AS uw(w)
  GROUP BY w
),
wscore AS (
  SELECT tok, degree * {_RAKE_PPM} // freq AS score_ppm FROM wstats
),
pocc AS (
  SELECT array_to_string(words, ' ') AS phrase,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM ph GROUP BY 1
),
pscore AS (
  SELECT p.phrase, p.n_occurrences,
         CAST(len(string_split(p.phrase, ' ')) AS BIGINT) AS n_words,
         CAST(SUM(ws.score_ppm) AS BIGINT) AS score_ppm
  FROM pocc p, unnest(string_split(p.phrase, ' ')) AS uw(w)
  JOIN wscore ws ON ws.tok = uw.w
  GROUP BY 1, 2, 3
)
SELECT phrase, n_words, n_occurrences, score_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY score_ppm DESC, phrase) AS BIGINT) AS rank
FROM pscore
QUALIFY rank <= {_RAKE_TOPN}
""",
    tags=("corpus-analysis", "keywords", "A1"),
)
def rake_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs (length <= 4);
    each word scores degree/freq, where freq counts its phrase
    occurrences and degree sums the lengths of the phrases containing
    it; a phrase scores the sum of its words' scores. The corpus-level
    top-25 is the keyword table an indexing/tagging stage
    materializes next to TF-IDF (rank-equivalent but co-occurrence
    aware — multi-word terms beat bare frequency).

    Exactness: word scores are integer fixed-point (degree·1e6 div
    freq), so the phrase score is an INTEGER sum — aggregation
    order-independent where a sum of float ratios would not be; ties
    rank by phrase text. Run construction uses the classic
    pos − row_number gap trick, and phrase words are recovered by
    splitting the phrase STRING (deterministic, no first()-of-array).

    Shape: the only corpus-sized exchange is the per-doc position
    window (one sort-shuffle of non-stopword tokens); phrase groups
    reuse the doc partitioning; everything after — word stats, phrase
    occurrence counts, the score join (vocab broadcast), the
    top-25 TakeOrdered — is vocabulary/phrase-sized. At
    100 TB this is the n-gram-family plan (cf. ngram_duplicate_spans):
    one keyed shuffle of token metadata, never of documents."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.expr("filter(split(text, ' '), x -> x <> '')")).alias(
            "pos0", "tok"
        ),
    ).select("doc_id", "tok", (F.col("pos0") + 1).alias("pos"))
    ns = (
        toks.filter(~F.col("tok").isin(*_RAKE_STOPWORDS))
        .withColumn(
            "run_id",
            F.col("pos")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("pos")),
        )
    )
    ph = (
        ns.groupBy("doc_id", "run_id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ).alias("words")
        )
        .filter(F.size("words") <= _RAKE_MAX_PHRASE)
        # word stats and phrase counts both consume the phrase table:
        # checkpoint it once so the corpus position window runs once,
        # not once per branch (phrase-granular data)
        .localCheckpoint()
    )
    wstats = (
        ph.select(F.explode("words").alias("tok"), F.size("words").alias("plen"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree"))
    )
    wscore = wstats.select(
        "tok", F.expr(f"degree * {_RAKE_PPM} div freq").alias("score_ppm")
    )
    pocc = ph.select(F.array_join("words", " ").alias("phrase")).groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    pw = pocc.select(
        "phrase",
        "n_occurrences",
        F.size(F.split("phrase", " ")).cast("long").alias("n_words"),
        F.explode(F.split("phrase", " ")).alias("tok"),
    )
    pscore = (
        pw.join(F.broadcast(wscore), "tok")
        .groupBy("phrase", "n_occurrences", "n_words")
        .agg(F.sum("score_ppm").alias("score_ppm"))
    )
    top = pscore.orderBy(F.col("score_ppm").desc(), "phrase").limit(_RAKE_TOPN)
    wr = Window.orderBy(F.col("score_ppm").desc(), "phrase")
    return top.withColumn("rank", F.row_number().over(wr).cast("long")).select(
        "phrase", "n_words", "n_occurrences", "score_ppm", "rank"
    )


# ---------------------------------------------------------------------------
# Classifier audit: language-ID confusion matrix with per-language recall
# ---------------------------------------------------------------------------
_LANGID_CONFUSION_SQL = f"""
WITH pred AS ({_LANGID_SQL}),
cells AS (
  SELECT actual_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY actual_lang, predicted_lang
)
SELECT actual_lang, predicted_lang, n_docs,
       CAST(SUM(n_docs) OVER (PARTITION BY actual_lang) AS BIGINT)
         AS actual_total,
       CAST(n_docs AS DOUBLE)
         / CAST(SUM(n_docs) OVER (PARTITION BY actual_lang) AS DOUBLE)
         AS cell_share
FROM cells
"""


@query("lang_id_confusion", oracle=_LANGID_CONFUSION_SQL, tags=("text-langid", "eval"))
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONFUSION MATRIX of the engine's own language identifier —
    the eval readout a pipeline publishes before trusting lang-routed
    processing (per-language gates, per-lang percentile cuts, fertility
    audits all key on lang): each (actual, predicted) cell count, the
    actual-language row total, and the cell share (diagonal = recall).
    Composes the registered lang_id_ngram builder unchanged — the audit
    measures the exact operator the pipeline runs, not a reimplementation
    (same composition discipline as training_corpus_manifest).

    Exactness: counts are integers; cell_share is one IEEE divide of a
    cell count by a window-summed row total (no join-back — the
    SCALE.md §19 rule). Plan: everything past lang_id_ngram's own plan
    is alphabet-sized (|langs|² cells); the row totals are a window over
    the cell table, adding one tiny exchange."""
    pred = lang_id_ngram(spark, sf_dir)
    cells = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("actual_lang")
    total = F.sum("n_docs").over(w)
    return cells.select(
        "actual_lang",
        "predicted_lang",
        "n_docs",
        total.alias("actual_total"),
        (F.col("n_docs").cast("double") / total.cast("double")).alias("cell_share"),
    )


# ---------------------------------------------------------------------------
# Zipf doubling profile: rank-frequency law fit without a single logarithm
# ---------------------------------------------------------------------------
_ZIPF_TOP = 1024


@query(
    "zipf_doubling_profile",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS f
  FROM tok WHERE token <> '' GROUP BY token
),
ranked AS (
  SELECT token, f,
         ROW_NUMBER() OVER (ORDER BY f DESC, token) AS r
  FROM freq
  QUALIFY ROW_NUMBER() OVER (ORDER BY f DESC, token) <= {_ZIPF_TOP}
)
SELECT a.r AS rank, a.f AS freq_r, b.f AS freq_2r,
       a.f * 1000000 // b.f AS doubling_ratio_ppm
FROM ranked a JOIN ranked b ON b.r = 2 * a.r
WHERE a.r IN (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)
""",
    tags=("text-vocab", "curation"),
)
def zipf_doubling_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit by FREQUENCY DOUBLING RATIOS — f(r)/f(2r) at
    dyadic ranks r = 1..512. Under Zipf with exponent s the ratio is
    2^s at every doubling, so a flat column of ratios ≈ 2,000,000 ppm
    IS the law (s = 1) and drift across ranks exposes where the fit
    breaks (the head/tail deviations every real corpus has) — the
    rank-frequency diagnostic next to heaps_vocab_growth's type-token
    curve, computed without a single logarithm so both engines agree
    bit-for-bit (exact int64 counts, one integer ppm floor-divide).

    Plan: one token explode + one map-combined count (the
    token_vocabulary shuffle); the top-{_ZIPF_TOP} cut is
    TakeOrderedAndProject (distributed partial top-K — NO global vocab
    sort, the 100 TB-safe form); ranking and the r→2r self-join happen
    on the {_ZIPF_TOP}-row result (broadcast-trivial at any SF)."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("f"))
    top = freq.orderBy(F.col("f").desc(), F.col("token")).limit(_ZIPF_TOP)
    ranked = top.select(
        "f",
        F.row_number()
        .over(
            Window.partitionBy().orderBy(F.col("f").desc(), F.col("token"))
        )
        .alias("r"),
    )
    a = ranked.select(F.col("r").alias("rank"), F.col("f").alias("freq_r"))
    b = ranked.select((F.col("r")).alias("r2"), F.col("f").alias("freq_2r"))
    return (
        a.filter(F.col("rank").isin(1, 2, 4, 8, 16, 32, 64, 128, 256, 512))
        .join(F.broadcast(b), F.col("r2") == 2 * F.col("rank"))
        .select(
            "rank",
            "freq_r",
            "freq_2r",
            F.expr("freq_r * 1000000 div freq_2r").alias("doubling_ratio_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# BPE round-trip audit: encoding must be lossless, corpus-wide, by algebra
# ---------------------------------------------------------------------------
@query(
    "bpe_roundtrip_audit",
    oracle=_bpe_oracle(_BPE_ROUNDS).split("\nSELECT 0 AS merge_round")[0]
    + """
SELECT (replace(d.s, chr(1), chr(2)||chr(2)) = d0.s) AS roundtrip_ok,
       (contains(d.s, chr(1))) AS has_merges,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(trim(d.s, chr(2)), chr(2)||chr(2))))
            AS BIGINT) AS total_tokens_after
FROM d3 d JOIN d0 ON d0.doc_id = d.doc_id
GROUP BY 1, 2
""",
    tags=("text-bpe", "audit"),
)
def bpe_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer LOSSLESSNESS audit: decode(encode(doc)) must equal
    doc for every document — the property a training pipeline asserts
    before committing a tokenizer, because a lossy merge table silently
    corrupts every downstream token count and decoded sample. Decoding
    is pure algebra here: merges glue symbols with \\x01, so replacing
    \\x01 with the \\x02\\x02 symbol boundary un-applies every merge in
    one pass; equality with the PRE-merge stream proves no merge
    crossed a token boundary and none collided with document text
    (the sentinel-wrapping guarantee, stated as data instead of
    argument). Grouped by (roundtrip_ok, has_merges) so the result also
    shows how many docs the 3-round merge table actually touches.

    Shares `_bpe_rounds` with the trainer/encoder (same merges by
    construction); the oracle reuses the trainer's unrolled CTE chain.
    Per-doc string compare + one map-combined aggregate on top of the
    training loop — no new shuffle."""
    merged, _ = _bpe_rounds(spark, sf_dir, _BPE_ROUNDS)
    docs = load_table(spark, sf_dir, "documents")
    wrap = F.concat(
        F.lit("\x02"),
        F.array_join(
            F.expr("filter(split(text, ' '), x -> x <> '')"), "\x02\x02"
        ),
        F.lit("\x02"),
    )
    d0 = docs.select("doc_id", wrap.alias("s0"))
    toks = F.expr(_BPE_TOKS_EXPR)
    return (
        merged.join(d0, "doc_id")
        .select(
            (
                F.regexp_replace(F.col("s"), "\x01", "\x02\x02") == F.col("s0")
            ).alias("roundtrip_ok"),
            F.col("s").contains("\x01").alias("has_merges"),
            F.size(toks).cast("long").alias("nt"),
        )
        .groupBy("roundtrip_ok", "has_merges")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens_after"),
        )
    )
