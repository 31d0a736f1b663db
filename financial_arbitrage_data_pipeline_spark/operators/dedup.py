"""Deduplication operators for large-scale training-data pipelines:
exact (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.

All Spark-side logic is built-in functions + higher-order functions —
md5 / array_min / transform / aggregate — so the hot path stays in
whole-stage codegen with zero Python. The shapes are the standard
web-scale dedup pipeline (shingle → minhash → band → bucket-join →
verify), sized so the only shuffles are on dedup keys / band buckets,
never all-pairs.

The driver corpus contains no duplicates, so dedup queries run over a
deterministic "two-crawl" union: documents ∪ a re-crawl copy of every
7th doc (doc_id + 1_000_000). This models cross-crawl dedup and
guarantees every operator has true positives to find; the derivation is
identical in the DuckDB oracles.

Scale notes (100 TB):
- exact dedup: one shuffle on the 128-bit fingerprint; map-side partial
  aggregation collapses most groups before the exchange.
- MinHash+LSH: signatures are per-row narrow transforms (no shuffle);
  candidate generation shuffles on (band_id, band_signature) — cardinality
  ~n_docs*bands, each bucket tiny; verification joins only candidates.
  Never materializes the O(n^2) pair space.
- SimHash: per-row signature, then pairs within small blocking keys.
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

N_MINHASH = 16
N_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed long exactly


# ---------------------------------------------------------------------------
# The two-crawl corpus
# ---------------------------------------------------------------------------


# Scan-parallelism probe cache for crawl_union: the corpus's physical
# split count is a property of (application, sf_dir, corpus fingerprint),
# so the one-time .rdd conversion that measures it is not re-paid per
# builder call. The FINGERPRINT in the value doubles as regeneration
# detection: when the corpus at an sf_dir is rewritten in place, Spark's
# session-shared FileStatusCache still serves the OLD file listing to
# new reads (a path-based overwrite does not invalidate it), so the
# first post-regen build must refreshByPath or it fails FAILED_READ_FILE
# on vanished part files. r12 was accidentally shielded by the
# never-unpersisted shingle caches (the overwrite recached those
# relations, refreshing their file index); with the r13 persist sweep
# the staleness must be handled where it belongs — at the corpus read.
_CU_PARTS: dict[tuple[str, str], tuple[tuple, int]] = {}


def crawl_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    fp = _corpus_fingerprint(sf_dir)
    cached = _CU_PARTS.get(key)
    if cached is not None and cached[0] != fp:
        # corpus regenerated in place: drop the stale split count,
        # Spark's cached file listing for the path, AND load_table's
        # memoized resolved plan (its FileIndex pins the OLD listing —
        # sources/tables.py documents that replaced paths need a fresh
        # resolution)
        docs_path = os.path.join(sf_dir, "documents.parquet")
        spark.catalog.refreshByPath(docs_path)
        getattr(spark, "_fadp_table_cache", {}).pop(docs_path, None)
        cached = None
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    recrawl = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang"
    )
    union = docs.unionByName(recrawl)
    # Parallelism FLOOR (r13, guide §2.5 input skew / §6 split sizing):
    # the driver testdata ships documents as ONE small parquet file with
    # one row group, so every downstream shingle/md5 map stage ran as
    # 2 tasks on a 32-core box (event-log: minhash's two 5-6 s cold
    # stages had tasks=2 — the per-row crypto-hash work was serialized,
    # and minPartitionNum cannot split a single row group). One hash
    # repartition of the ~600 KB corpus unlocks the cores. Strictly a
    # floor: applied only when the scan yields fewer partitions than the
    # cluster's parallelism, so at 100 TB (thousands of splits) it is
    # inert and the corpus is never gratuitously reshuffled.
    if cached is None:
        cached = (fp, union.rdd.getNumPartitions())
        _CU_PARTS[key] = cached
    n = cached[1]
    target = spark.sparkContext.defaultParallelism
    if n < target:
        union = union.repartition(target, "doc_id")
    return union


_CRAWL_UNION_SQL = """
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents WHERE doc_id % 7 = 0
"""


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy
# ---------------------------------------------------------------------------
@query(
    "exact_dedup",
    oracle=f"""
WITH corpus AS ({_CRAWL_UNION_SQL})
SELECT md5(text) AS fingerprint,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) - 1 AS n_dropped
FROM corpus
GROUP BY md5(text)
HAVING COUNT(*) > 1
""",
    tags=("dedup-exact",),
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash; keep the lowest doc_id
    (the canonical keep-first policy). One shuffle on the fingerprint."""
    corpus = crawl_union(spark, sf_dir)
    return (
        corpus.groupBy(F.md5("text").alias("fingerprint"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_doc_id"),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# Shingles + MinHash signatures (shared by LSH and n-gram Jaccard)
# ---------------------------------------------------------------------------


def with_shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """Word n-gram shingle set per doc (distinct), via pure HOFs:
    sequence → transform(concat of token window) → array_distinct.

    Built as ONE expr string (r12, guide §1.2 applied to the driver):
    the Column-API form costs a py4j round trip per element_at/literal —
    ~a hundred JVM calls of pure plan-construction overhead billed to
    every consumer's build; the parsed expression tree is the same."""
    tokens = "split(text, ' ')"
    window = ", ".join(
        f"element_at({tokens}, i + {k})" if k else f"element_at({tokens}, i)"
        for k in range(n)
    )
    return df.withColumn(
        "shingles",
        F.expr(
            f"array_distinct(transform("
            f"sequence(1, greatest(size({tokens}) - {n - 1}, 0)), "
            f"i -> concat_ws(' ', {window})))"
        ),
    )


MINHASH_MOD = (1 << 59) - 55  # 16*M - 16 < 2^63-1: h1%M + 15*(h2%M) can't overflow


def with_minhash(df: DataFrame, k: int = N_MINHASH) -> DataFrame:
    """k MinHash values per doc via double hashing: ONE md5 per shingle
    split into two 60-bit halves (h1, h2), permutation i = min over
    shingles of (h1 + i*h2) mod M — the standard Kirsch-Mitzenmacher
    construction, engine-independent and exactly reproducible in SQL
    (unlike seeded murmur), at 1/k of the crypto-hash cost of hashing
    per-permutation. Narrow per-row transforms, no shuffle."""
    hashed = (
        "transform(shingles, s -> named_struct("
        f"'h1', CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) % {MINHASH_MOD}L, "
        f"'h2', CAST(conv(substring(md5(s), 16, 15), 16, 10) AS BIGINT) % {MINHASH_MOD}L))"
    )
    # materialize `hashed` at a projection boundary so the k min-scans
    # reference one computed array instead of re-hashing k times; every
    # expression is a single expr STRING (one py4j round trip each —
    # r12, guide §1.2 applied to the driver's plan construction)
    cols = list(df.columns)
    sigs = [
        f"array_min(transform(_hashed, h -> (h.h1 + {i}L * h.h2) % {MINHASH_MOD}L)) AS mh{i}"
        for i in range(k)
    ]
    return df.withColumn("_hashed", F.expr(hashed)).selectExpr(*cols, *sigs)


def band_signatures(df: DataFrame, bands: int = N_BANDS, k: int = N_MINHASH) -> DataFrame:
    """Fold minhashes into `bands` signatures (rows = k/bands each);
    explode to (doc_id, band_id, band_sig) for the bucket join. The
    signature is the plain '|'-joined minhash tuple — a join key needs
    equality, not another hash pass."""
    rows = k // bands
    structs = ", ".join(
        "named_struct('band_id', {b}, 'band_sig', concat_ws('|', {sigs}))".format(
            b=b,
            sigs=", ".join(f"CAST(mh{b * rows + r} AS STRING)" for r in range(rows)),
        )
        for b in range(bands)
    )
    return df.selectExpr("doc_id", f"explode(array({structs})) AS band").selectExpr(
        "doc_id", "band.band_id AS band_id", "band.band_sig AS band_sig"
    )


def _hex15_at_to_bigint_sql(expr: str, start: int) -> str:
    """DuckDB: 15 hex chars of `expr` starting at 1-based `start` → BIGINT
    (no conv() in DuckDB)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"({terms})"


def _minhash_sql(corpus_sql: str, k: int = N_MINHASH, bands: int = N_BANDS) -> str:
    """DuckDB mirror of the shingle→minhash→band pipeline (one md5 per
    shingle, double-hashed into k permutations — same construction as
    with_minhash)."""
    mh_cols = ",\n         ".join(
        f"MIN((h1 + {i} * h2) % {MINHASH_MOD}) AS mh{i}" for i in range(k)
    )
    rows = k // bands
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band_id, {concat} AS band_sig FROM mh".format(
            b=b,
            concat=" || '|' || ".join(
                f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for b in range(bands)
    )
    return f"""
corpus AS ({corpus_sql}),
tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i FROM tok)
),
shh AS (
  SELECT doc_id,
         {_hex15_at_to_bigint_sql("md5(shingle)", 1)} % {MINHASH_MOD} AS h1,
         {_hex15_at_to_bigint_sql("md5(shingle)", 16)} % {MINHASH_MOD} AS h2
  FROM sh
),
mh AS MATERIALIZED (
  SELECT doc_id,
         {mh_cols}
  FROM shh GROUP BY doc_id
),
bands AS MATERIALIZED (
{band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
),
sh_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)"""


@query(
    "minhash_lsh_dedup",
    oracle=f"""
WITH {_minhash_sql(_CRAWL_UNION_SQL)}
SELECT i.doc_a, i.doc_b,
       CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN sh_sizes za ON za.doc_id = i.doc_a
JOIN sh_sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
""",
    headline=True,
    tags=("dedup-minhash-lsh", "pairs-audit-tier"),
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate detection: shingle → 16 minhashes →
    4 bands → bucket-join candidates → exact Jaccard verification ≥ 0.5.
    The pair space is never materialized; candidates come from equi-joining
    band signatures (one shuffle on (band_id, sig)), then only candidates
    pay the verification join."""
    return _lsh_verified_pairs(spark, sf_dir)


# The dup-graph family (triangles / PageRank / LPA / k-core / BFS) all
# consume the SAME verified near-dup edge table; at warehouse scale that
# table is written out once per crawl and the graph jobs read it. The
# in-session analogue: build it once per (application, corpus), eagerly
# localCheckpoint it (so downstream iterative plans start from a
# materialized RDD, not the whole LSH lineage), and let every graph
# query share the result (VERDICT r9 task 3 — kcore was overhead-bound
# on re-materializing this pipeline).
#
# Cache contract (ADVICE r9 / VERDICT r9 task 7): the key carries a
# cheap DATA FINGERPRINT of the crawl inputs (file count + bytes + max
# mtime of documents.parquet), so regenerating the corpus at the same
# sf_dir within one Spark application invalidates naturally instead of
# serving stale edges. Access is lock-guarded (no double-build under
# concurrent first callers) and the cache is size-bounded (FIFO evict;
# a dropped localCheckpoint is just an unreferenced RDD for GC).
_SHARED_PAIRS: "OrderedDict[tuple[str, str, tuple], DataFrame]" = OrderedDict()
_SHARED_PAIRS_LOCK = threading.Lock()
_SHARED_PAIRS_MAX = 8


def _corpus_fingerprint(sf_dir: str) -> tuple:
    """(n_files, total_bytes, max_mtime_ns) over the crawl input files —
    O(#files) stat calls, no data read."""
    root = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    paths = [root] if os.path.isfile(root) else [
        os.path.join(dirpath, f)
        for dirpath, _, files in os.walk(root)
        for f in files
        if not f.startswith(("_", "."))
    ]
    n, total, mtime = 0, 0, 0
    for p in paths:
        try:
            st = os.stat(p)
        except OSError:
            continue
        n += 1
        total += st.st_size
        mtime = max(mtime, st.st_mtime_ns)
    return (n, total, mtime)


def _lsh_verified_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(sf_dir),
        _corpus_fingerprint(sf_dir),
    )
    with _SHARED_PAIRS_LOCK:
        df = _SHARED_PAIRS.get(key)
        if df is None:
            df = (
                _lsh_verified_pairs(spark, sf_dir)
                .select("doc_a", "doc_b")
                .localCheckpoint()
            )
            _SHARED_PAIRS[key] = df
            while len(_SHARED_PAIRS) > _SHARED_PAIRS_MAX:
                _SHARED_PAIRS.popitem(last=False)
        else:
            _SHARED_PAIRS.move_to_end(key)
    return df


def _lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = with_minhash(with_shingles(crawl_union(spark, sf_dir)))
    # Both derived tables feed two join branches each. r12 persisted
    # them, but the persist (a) was never dropped, so repeat executions
    # of the identical plan hit Spark's CacheManager and the bench's
    # best-of reported a WARM number (VERDICT r12 item 4), and (b) buys
    # nothing cold: the branches share their shuffle via ReusedExchange,
    # so the un-persisted form is cold-equal on wall and cheaper on cpu
    # (measured A/B at sf0.1, 2 rounds interleaved: persist 6.10 s /
    # 16.0 cpu-sec vs none 6.04 s / 15.3 cpu-sec vs localCheckpoint
    # 9.43 s). At warehouse scale the reuse move is writing the
    # signature table out once per crawl, not caching it per query.
    shingle_sets = corpus.select("doc_id", "shingles")
    bands = band_signatures(corpus)

    # Band self-join build side pinned SHUFFLE_HASH like every other
    # O(docs) join side (SCALE.md §39): the bands relation is 4 rows/doc
    # and Catalyst's (cached-)relation estimate otherwise broadcasts it
    # — the 100 TB OOM class. Measured at sf0.1 (minhash form): cold
    # 6.40 → 5.25 s, warm-cache 0.59 → 0.42 s — the pin is also the
    # locally faster shape (per-bucket hash build is tiny).
    a, b = bands.alias("a"), bands.alias("b").hint("shuffle_hash")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .selectExpr("a.doc_id AS doc_a", "b.doc_id AS doc_b")
        .distinct()
    )
    sa = shingle_sets.selectExpr("doc_id AS doc_a", "shingles AS sh_a")
    sb = shingle_sets.selectExpr("doc_id AS doc_b", "shingles AS sh_b")
    # SHUFFLE_HASH pins: the shingle-set sides are O(docs) and carry the
    # token arrays — they must NEVER broadcast (r11: at sf1 under the
    # driver's vanilla 1 GB heap, Catalyst's post-agg size estimate let
    # one through and the BroadcastExchange build OOMed; at 100 TB the
    # same side is terabytes). Hash join on the long key, no sort.
    return (
        cand.join(sa.hint("shuffle_hash"), "doc_a")
        .join(sb.hint("shuffle_hash"), "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE) / "
            "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b))) AS jaccard",
        )
        .where("jaccard >= 0.5D")
    )


# ---------------------------------------------------------------------------
# Connected-components dedup clustering over the near-dup pair graph
# ---------------------------------------------------------------------------
@query(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_minhash_sql(_CRAWL_UNION_SQL)},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
reach AS (
  SELECT doc_id, doc_id AS r FROM nodes
  UNION
  SELECT e.dst AS doc_id, r.r
  FROM reach r JOIN edges e ON e.src = r.doc_id
),
labeled AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id)
SELECT doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       (doc_id = cluster_id) AS is_canonical
FROM labeled
""",
    tags=("dedup-clusters", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS, not just pairs: connected components over the
    LSH-verified near-dup graph, labeling every clustered doc with the
    min doc_id of its component (the canonical keeper — everything else
    is droppable). This is the step an actual training-data pipeline
    needs after pair finding: near-dup is not transitive, so A~B and B~C
    must collapse into one keep-group even when A~C wasn't found.

    Spark-first shape: iterative min-label propagation (the standard
    distributed CC — GraphX/GraphFrames run the same loop). Each round is
    one join + one aggregation, all keyed shuffles; `localCheckpoint`
    cuts lineage per round so plans don't grow with iterations. Rounds
    needed = graph diameter, which for dup clusters is tiny (single-digit
    even at web scale — see the large/small-star literature). The oracle
    states the same fixpoint declaratively as a recursive CTE, so the
    loop's convergence is value-checked, not just asserted.
    """
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    labels = connected_components(pairs)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_id"),
        "cluster_size",
        (F.col("doc_id") == F.col("label")).alias("is_canonical"),
    )


def connected_components(pairs: DataFrame, max_rounds: int = 30) -> DataFrame:
    """Min-label propagation over an undirected pair graph → (doc_id,
    label) where label = min doc_id reachable. Each round: one keyed join
    + one min-aggregation; `localCheckpoint` cuts lineage so the plan
    stays round-sized. Converges in O(diameter) rounds."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )

    # Fixpoint detection without a per-round join: labels are per-element
    # monotonically non-increasing under min-propagation, so the label sum
    # strictly decreases until the fixpoint — equal consecutive sums imply
    # element-wise equality. One scalar aggregate over the checkpointed
    # labels replaces the join+filter+count change probe. decimal(38,0)
    # keeps the sum exact at any scale (1e12 ids × 1e12 rows fits 38
    # digits; a long would overflow).
    def label_sum(df: DataFrame):
        s, n = df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")), F.count(F.lit(1))
        ).first()
        # Under non-ANSI mode a decimal(38,0) overflow returns NULL; two
        # consecutive overflowed rounds would compare None == None and
        # declare a bogus fixpoint. Unreachable below ~1e38 total label
        # mass, but fail loudly rather than converge silently wrong.
        # (NULL with zero rows is just the empty graph, which is fine.)
        if s is None and n > 0:
            raise ArithmeticError(
                "connected_components: label sum overflowed decimal(38,0) "
                "— fixpoint detection cannot proceed"
            )
        return s

    prev_sum = label_sum(labels)
    for _ in range(max_rounds):  # diameter bound; real dup graphs converge in ~2-3
        msgs = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "label")
        )
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError("connected_components: no fixpoint in "
                           f"{max_rounds} rounds")
    edges.unpersist()
    return labels


# ---------------------------------------------------------------------------
# n-gram Jaccard with length/lang blocking (no LSH — the exact variant)
# ---------------------------------------------------------------------------
@query(
    "ngram_jaccard_pairs",
    oracle=f"""
WITH corpus AS ({_CRAWL_UNION_SQL}),
tok AS (
  SELECT doc_id, lang, len(text) // 64 AS lbucket, string_split(text, ' ') AS t
  FROM corpus
),
sh AS (
  SELECT DISTINCT doc_id, lang, lbucket, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
  FROM (SELECT doc_id, lang, lbucket, t, unnest(generate_series(1, len(t) - 2)) AS i FROM tok)
),
sizes AS (SELECT doc_id, lang, lbucket, COUNT(*) AS n_sh FROM sh GROUP BY 1, 2, 3),
inter AS (
  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh sa
  JOIN sh sb ON sa.lang = sb.lang AND sa.lbucket = sb.lbucket
            AND sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.4
""",
    tags=("dedup-ngram-jaccard", "pairs-audit-tier"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs within (lang, length-bucket)
    blocks: the shuffle key is the shared shingle (an inverted-index join),
    so cost is Σ posting-list², not n² — the classic blocked exact
    variant to contrast with minhash_lsh_dedup's approximate path."""
    corpus = with_shingles(crawl_union(spark, sf_dir)).select(
        "doc_id",
        "lang",
        (F.length("text") / 64).cast("long").alias("lbucket"),
        "shingles",
    )
    sh = corpus.select(
        "doc_id", "lang", "lbucket", F.explode("shingles").alias("shingle")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    sa, sb = sh.alias("sa"), sh.alias("sb")
    # The inverted-index self-join: both sides are the full exploded
    # posting table — pin SORT-MERGE (spills per key group), never
    # broadcast (Catalyst's post-distinct estimate let one side through
    # at sf1 under the vanilla 1 GB heap, SCALE.md §39) and never
    # shuffle-hash (the per-partition build side is the whole posting
    # partition, O(corpus/partitions) resident).
    inter = (
        sa.hint("merge").join(
            sb,
            (F.col("sa.lang") == F.col("sb.lang"))
            & (F.col("sa.lbucket") == F.col("sb.lbucket"))
            & (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        # size sides are O(docs): shuffle-hash, never broadcast
        # (SCALE.md §39)
        inter.join(za.hint("shuffle_hash"), "doc_a")
        .join(zb.hint("shuffle_hash"), "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.4)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _hex15_to_bigint_sql(expr: str) -> str:
    """DuckDB: first 15 hex chars of an md5 → BIGINT (no conv() there)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"({terms})"


def _simhash_sql(corpus_sql: str, bits: int = SIMHASH_BITS) -> str:
    h = _hex15_to_bigint_sql("md5(token)")
    bit_sums = ",\n         ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(bits)
    )
    sig = " + ".join(f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(bits))
    return f"""
corpus AS ({corpus_sql}),
tok AS (
  SELECT DISTINCT doc_id, lang, unnest(string_split(text, ' ')) AS token
  FROM corpus
),
th AS (SELECT doc_id, lang, {h} AS h FROM tok),
bitsums AS (
  SELECT doc_id, ANY_VALUE(lang) AS lang,
         {bit_sums}
  FROM th GROUP BY doc_id
),
sig AS (SELECT doc_id, lang, {sig} AS simhash FROM bitsums)"""


SIMHASH_MAX_HAMMING = 3  # near-dup threshold; bands below guarantee recall=1
SIMHASH_BANDS = 4  # 4 bands × 15 bits: pigeonhole — ≤3 flipped bits can
#                    touch at most 3 bands, so every qualifying pair
#                    shares at least one exact band


@query(
    "simhash_dedup",
    oracle=f"""
WITH {_simhash_sql(_CRAWL_UNION_SQL)}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
""",
    tags=("dedup-simhash", "pairs-audit-tier"),
)
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit signature from the token set (bit j
    votes +1/-1 by bit j of md5(token)), all pairs at Hamming distance
    ≤ 3. Candidates come from banding, not an all-pairs join: the
    signature splits into 4×15-bit bands and candidate pairs share at
    least one exact band (pigeonhole makes this exact, not approximate,
    at distance ≤ 3) — so the only shuffles are the signature aggregation
    and the band-bucket equi-join, Σ bucket² not n². The exact Hamming
    verify runs BEFORE the pair-dedup distinct (r11), so false band
    candidates die inside the pipelined join stage and the distinct
    exchange carries only qualifying pairs. The oracle is the *semantic*
    quadratic definition, so it also proves the banding loses nothing.

    Scale note (r11, measured): this query's output is the FULL pair
    set, which is replica-quadratic by contract — 44.7M pairs at sf10
    (125x the sf0.1 output for 100x the docs), so its wall is
    OUTPUT-bound, already sublinear per emitted pair. Two-level
    sub-banding (the perceptual-gate fix) was tried and REJECTED here:
    identical-signature replica groups collide in all 16 sub-keys vs 4
    bands, quadrupling the dominant join term (measured 2-5x slower at
    sf10). When downstream only needs dedup decisions, use
    `simhash_dedup_canonical` — O(docs) output at any replica density.
    Signature is one aggregation (60 conditional sums, all codegen);
    exact dups hash to identical signatures."""
    # No persist (r13): the signature self-join shares its aggregation
    # exchange via ReusedExchange within the single action, so the
    # persist only registered a never-dropped CacheManager entry (warm
    # bench bias + leaked blocks; same A/B class as minhash_lsh_dedup).
    sig = _simhash_signatures(crawl_union(spark, sf_dir))
    cand = _simhash_band_self_join(sig)
    return (
        cand.filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


def _simhash_signatures(corpus: DataFrame) -> DataFrame:
    """(doc_id, simhash) — the ONE signature kernel both simhash queries
    share (and their shared oracle CTE states): bit j of the 60-bit
    signature votes +1/-1 by bit j of md5(token) over the distinct token
    set. One F.expr per bit (and one for the signature fold) instead of
    hand-built Column trees: 60 bits x ~14 py4j calls is ~1 s of driver
    plan-construction time; sql strings ship the same expressions to
    Catalyst in 61 calls total."""
    tok = corpus.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    h = F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
    th = tok.select("doc_id", h.alias("h"))
    bit_sums = [
        F.expr(f"sum(if((shiftright(h, {j}) & 1) = 1, 1, -1)) AS s{j}")
        for j in range(SIMHASH_BITS)
    ]
    sums = th.groupBy("doc_id").agg(*bit_sums)
    sig_expr = F.expr(
        " + ".join(f"if(s{j} > 0, {1 << j}L, 0L)" for j in range(SIMHASH_BITS))
    )
    return sums.select("doc_id", sig_expr.alias("simhash"))


def _simhash_band_self_join(sig: DataFrame) -> DataFrame:
    """Raw (doc_a, doc_b, hamming) candidate stream from the 4x15-bit
    band self-join, BEFORE the Hamming filter and pair dedup. Single-
    level banding on purpose: sub-band multi-indexing multiplies the
    identical-signature (exact-replica) join term by keys/bands and
    replica groups dominate this corpus (see simhash_dedup docstring)."""
    band_bits = SIMHASH_BITS // SIMHASH_BANDS
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND((1 << band_bits) - 1)
                        .alias("band_val"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")

    # Band self-join build side pinned SHUFFLE_HASH like every other
    # O(docs) join side (SCALE.md §39): the bands relation is 4 rows/doc
    # and Catalyst's (cached-)relation estimate otherwise broadcasts it
    # — the 100 TB OOM class. Measured at sf0.1 (minhash form): cold
    # 6.40 → 5.25 s, warm-cache 0.59 → 0.42 s — the pin is also the
    # locally faster shape (per-bucket hash build is tiny).
    a, b = bands.alias("a"), bands.alias("b").hint("shuffle_hash")
    return a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
            "hamming"
        ),
    )


@query(
    "simhash_dedup_canonical",
    oracle=f"""
WITH {_simhash_sql(_CRAWL_UNION_SQL)},
nb AS (
  SELECT a.doc_id AS d, MIN(b.doc_id) AS canon_nb
  FROM sig a JOIN sig b
    ON b.doc_id < a.doc_id
   AND bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
  GROUP BY 1
)
SELECT s.doc_id,
       CASE WHEN nb.canon_nb IS NULL THEN 'keep' ELSE 'drop' END AS verdict,
       COALESCE(nb.canon_nb, s.doc_id) AS canonical_id
FROM sig s LEFT JOIN nb ON nb.d = s.doc_id
""",
    tags=("dedup-simhash", "incremental", "canonical-scale"),
)
def simhash_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash dedup with CLUSTER-REPRESENTATIVE output (VERDICT r10
    tasks 1+3 applied to the text family): each doc resolves to its
    lowest-id qualifying neighbor (Hamming <= {SIMHASH_MAX_HAMMING}) or
    to itself — the keep-lowest-id policy the dedup family's connected
    components use, restricted to one hop (the transitive closure stays
    `dedup_connected_components`' job). Output and EVERY exchange are
    O(docs) at any replica density: the band self-join is restricted to
    lower-id partners, the exact Hamming verify runs inside the
    pipelined join stage, and the only aggregate is MIN — duplicate-
    blind and map-side combinable, so no stage ever materializes or
    distincts the 44.7M-pair set `simhash_dedup` emits by contract at
    sf10. The oracle states the argmin quadratically; a hash match
    proves the banding loses no qualifying neighbor and the tie-break
    is deterministic."""
    # No persist (r13): consumers share the signature aggregation's
    # exchange via ReusedExchange within one action; the persist only
    # leaked a CacheManager entry (warm bench bias, same class as
    # minhash_lsh_dedup's measured-neutral persist drop).
    sig = _simhash_signatures(crawl_union(spark, sf_dir))
    cand = _simhash_band_self_join(sig)
    # doc_a < doc_b by construction: doc_b's lowest-id qualifying
    # neighbor is min(doc_a) over its qualifying pairs
    nb = (
        cand.filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("canon_nb"))
    )
    return sig.select("doc_id").join(nb, "doc_id", "left_outer").select(
        "doc_id",
        F.when(F.col("canon_nb").isNull(), F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("verdict"),
        F.coalesce(F.col("canon_nb"), F.col("doc_id")).alias("canonical_id"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator quality: estimated vs exact Jaccard per candidate pair
# ---------------------------------------------------------------------------
_EST_MATCH_SQL = " + ".join(
    f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
)


@query(
    "minhash_estimate_quality",
    oracle=f"""
WITH {_minhash_sql(_CRAWL_UNION_SQL)}
SELECT c.doc_a, c.doc_b,
       CAST(({_EST_MATCH_SQL}) AS DOUBLE) / {N_MINHASH} AS est_jaccard,
       CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)) AS jaccard,
       ABS(CAST(({_EST_MATCH_SQL}) AS DOUBLE) / {N_MINHASH}
           - CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
             / (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0))) AS abs_err
FROM cand c
JOIN mh a ON a.doc_id = c.doc_a
JOIN mh b ON b.doc_id = c.doc_b
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sh_sizes za ON za.doc_id = c.doc_a
JOIN sh_sizes zb ON zb.doc_id = c.doc_b
""",
    tags=("dedup-minhash-estimator",),
)
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-accuracy audit a production dedup pipeline runs before
    trusting MinHash at scale: for every LSH candidate pair, the
    signature-based Jaccard ESTIMATE (fraction of the 16 minhash
    components that agree) next to the exact shingle-set Jaccard, plus
    the absolute error. At 100 TB only the estimate is affordable for
    all pairs — this query is how you measure, on a sample, whether 16
    permutations are enough for your threshold, or the band/row split
    needs retuning. The estimate needs only the (doc, 16×int64)
    signature table; the exact side reuses the verification join the
    dedup path already pays."""
    corpus = with_minhash(with_shingles(crawl_union(spark, sf_dir)))
    # No persist (r13): same measured-neutral drop as minhash_lsh_dedup
    # (the persist leaked a never-dropped CacheManager entry).
    sigs = corpus.select(
        "doc_id", "shingles", *[f"mh{i}" for i in range(N_MINHASH)]
    )
    bands = band_signatures(corpus)

    # Band self-join build side pinned SHUFFLE_HASH like every other
    # O(docs) join side (SCALE.md §39): the bands relation is 4 rows/doc
    # and Catalyst's (cached-)relation estimate otherwise broadcasts it
    # — the 100 TB OOM class. Measured at sf0.1 (minhash form): cold
    # 6.40 → 5.25 s, warm-cache 0.59 → 0.42 s — the pin is also the
    # locally faster shape (per-bucket hash build is tiny).
    a, b = bands.alias("a"), bands.alias("b").hint("shuffle_hash")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(N_MINHASH)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(N_MINHASH)],
    )
    n_match = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    est = n_match.cast("double") / F.lit(N_MINHASH)
    exact = inter.cast("double") / union
    return (
        # signature sides are O(docs): shuffle-hash, never broadcast
        # (SCALE.md §39)
        cand.join(sa.hint("shuffle_hash"), "doc_a")
        .join(sb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_jaccard"),
            exact.alias("jaccard"),
            F.abs(est - exact).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Triangle enumeration over the near-dup graph: the cohesion metric that
# separates "A~B~C chains" (cluster by transitivity only) from genuinely
# mutually-similar groups (every pair found independently).
# ---------------------------------------------------------------------------
@query(
    "dup_graph_triangles",
    oracle=f"""
WITH {_minhash_sql(_CRAWL_UNION_SQL)},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
)
SELECT p1.doc_a, p1.doc_b, p2.doc_b AS doc_c
FROM pairs p1
JOIN pairs p2 ON p2.doc_a = p1.doc_b
JOIN pairs p3 ON p3.doc_a = p1.doc_a AND p3.doc_b = p2.doc_b
""",
    tags=("dedup-graph", "triangles"),
)
def dup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every triangle {a<b<c} in the LSH-verified near-dup graph,
    enumerated exactly once via the ordered-edge join (each edge stored
    a<b, so (a,b)⋈(b,c)⋈(a,c) hits each triangle in its one canonical
    orientation — the standard distributed triangle count, no dedup
    pass needed). A cluster whose docs form triangles is mutually
    similar (safe to keep one representative); a triangle-free chain is
    transitive-closure glue that deserves a second look before dropping
    docs. Scale: two shuffles on edge keys; at 100 TB the same join runs
    per graph partition after the high-degree-vertex split the triangle
    literature prescribes."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    p1 = pairs.alias("p1")
    p2 = pairs.select(
        F.col("doc_a").alias("b2"), F.col("doc_b").alias("doc_c")
    ).alias("p2")
    p3 = pairs.select(
        F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3")
    ).alias("p3")
    return (
        p1.join(p2, F.col("p1.doc_b") == F.col("b2"))
        .join(
            p3,
            (F.col("p1.doc_a") == F.col("a3")) & (F.col("doc_c") == F.col("c3")),
        )
        .select("doc_a", "doc_b", "doc_c")
    )


# ---------------------------------------------------------------------------
# Integer-exact PageRank over the near-dup graph (iterative, hash-gated)
# ---------------------------------------------------------------------------

_PR_SCALE = 1_000_000  # initial token mass per node
_PR_TELEPORT = 150_000  # 0.15 * scale, the constant teleport term
_PR_ROUNDS = 3


def _pagerank_round_sql(prev: str, out: str) -> str:
    """One unrolled power-iteration round in DuckDB SQL: every node's
    tokens = teleport + sum over in-neighbors of floor(floor(tok*85/100)
    / deg). Floor division makes the semantics integer-exact on both
    engines."""
    return f"""
{out} AS (
  SELECT d.doc_id,
         {_PR_TELEPORT} + SUM(((p.tok * 85) // 100) // pd.deg) AS tok,
         d.deg
  FROM deg d
  JOIN edges e ON e.dst = d.doc_id
  JOIN {prev} p ON p.doc_id = e.src
  JOIN deg pd ON pd.doc_id = e.src
  GROUP BY d.doc_id, d.deg
)"""


@query(
    "dup_graph_pagerank",
    oracle=f"""
WITH {_minhash_sql(_CRAWL_UNION_SQL)},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src AS doc_id, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT doc_id, CAST({_PR_SCALE} AS BIGINT) AS tok, deg FROM deg),
{_pagerank_round_sql("r0", "r1")},
{_pagerank_round_sql("r1", "r2")},
{_pagerank_round_sql("r2", "r3")}
SELECT doc_id,
       CAST(deg AS BIGINT) AS degree,
       CAST(tok AS BIGINT) AS rank_tokens
FROM r3
""",
    tags=("dedup-graph", "iterative", "pagerank"),
)
def dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality over the near-dup graph: which documents are the HUBS
    of duplication (templates, boilerplate sources, mirror roots)? Three
    power-iteration rounds of PageRank, computed in INTEGER token
    arithmetic — tokens' = teleport + Σ floor(floor(tok·85/100)/deg) —
    so the result is bit-exact under any partitioning/merge order and
    the oracle can unroll the identical rounds as chained CTEs (the same
    verification pattern as the k-means and BPE training loops).

    Spark-first shape: each round is ONE keyed join (edges ⋈ ranks ⋈
    degrees, all on src) plus ONE aggregation on dst — the GraphX/Pregel
    message-passing schedule expressed as DataFrame ops, with
    `localCheckpoint` cutting lineage per round. At 100 TB: edges
    pre-partitioned by src make the join co-located; rounds = O(1) by
    declared iteration count, not data size. The teleport term is a
    constant (not mass-conserving), which is the standard fixed-alpha
    power iteration restated over integers for exact verifiability."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    # edges is a narrow map over the SHARED localCheckpointed pair table
    # — recomputing it per round costs one pass over checkpoint blocks,
    # so the r12 persist bought nothing and leaked a CacheManager entry
    # per query (r13, guide §5 "persist only when recomputing is more
    # expensive than the memory pressure").
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(
        F.col("src").alias("doc_id"),
        F.lit(_PR_SCALE).cast("long").alias("tok"),
    ).localCheckpoint()
    for _ in range(_PR_ROUNDS):
        contrib = (
            edges.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("tok * 85 div 100 div deg").alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("doc_id")
            .agg((F.lit(_PR_TELEPORT) + F.sum("c")).cast("long").alias("tok"))
            .localCheckpoint()
        )
    out = ranks.join(deg.withColumnRenamed("src", "doc_id"), "doc_id").select(
        "doc_id",
        F.col("deg").cast("long").alias("degree"),
        F.col("tok").alias("rank_tokens"),
    )
    edges.unpersist()
    return out


# ---------------------------------------------------------------------------
# Incremental near-dup gate: dedupe the DELTA against the corpus (asymmetric
# LSH — the shape a daily crawl actually needs)
# ---------------------------------------------------------------------------

_INC_BASE_MAX = 1_000_000  # ids below this are the existing corpus

_INC_CORPUS_SQL = """
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents
  WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text,
         lang
  FROM documents WHERE doc_id % 7 = 3
"""


def _incremental_incoming(docs: DataFrame) -> DataFrame:
    """The incoming crawl batch alone: exact recrawl copies (ids +1M,
    expected DROP) and token-order rewrites (ids +2M — every 3-shingle
    changes, expected KEEP)."""
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang"
    )
    rewrites = docs.filter(F.col("doc_id") % 7 == 3).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
        "lang",
    )
    return copies.unionByName(rewrites)


def _incremental_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existing corpus (all documents) + the incoming crawl batch."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return docs.unionByName(_incremental_incoming(docs))


_INC_GATE_ORACLE = f"""
WITH {_minhash_sql(_INC_CORPUS_SQL)},
matches AS (
  SELECT i.doc_b AS incoming_id,
         COUNT(*) AS n_base_matches,
         MIN(i.doc_a) AS best_base_id
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE i.doc_a < {_INC_BASE_MAX} AND i.doc_b >= {_INC_BASE_MAX}
    AND CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
  GROUP BY i.doc_b
),
incoming AS (SELECT doc_id FROM corpus WHERE doc_id >= {_INC_BASE_MAX})
SELECT inc.doc_id AS incoming_id,
       CAST(COALESCE(m.n_base_matches, 0) AS BIGINT) AS n_base_matches,
       CAST(m.best_base_id AS BIGINT) AS best_base_id,
       (m.incoming_id IS NOT NULL) AS is_duplicate
FROM incoming inc LEFT JOIN matches m ON m.incoming_id = inc.doc_id
"""


@query(
    "incremental_neardup_gate",
    oracle=_INC_GATE_ORACLE,
    tags=("dedup-incremental", "lsh", "canonical-scale"),
)
def incremental_neardup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL dedup: gate an incoming crawl batch against the
    EXISTING corpus without ever pairing the corpus with itself — the
    shape a daily ingest actually runs (the batch is small, the corpus
    is 100 TB; corpus x corpus candidate generation would be both
    wasted and already-done). One shingle->minhash->band pipeline over
    base + delta, then an ASYMMETRIC band join (incoming bands probe
    base bands only), Jaccard verification on the candidate pairs, and
    a per-incoming-doc verdict: matched docs are duplicates of the
    corpus (with their best existing doc id), unmatched docs are new.
    The fixture encodes both outcomes: exact recrawl copies must DROP,
    token-order rewrites (every shingle changes) must KEEP.

    Scale: at 100 TB the base signatures are a materialized table
    maintained by the same pipeline (computed once per doc ever); the
    per-batch cost is sig(delta) + a band-bucket join whose base side
    is partition-pruned by band_id — nothing rescans the corpus text."""
    corpus = with_minhash(with_shingles(_incremental_corpus(spark, sf_dir)))
    # No persist (r13): same measured-neutral drop as minhash_lsh_dedup
    # (the persists leaked never-dropped CacheManager entries).
    shingle_sets = corpus.select("doc_id", "shingles")
    bands = band_signatures(corpus)

    base_b = bands.filter(F.col("doc_id") < _INC_BASE_MAX)
    inc_b = bands.filter(F.col("doc_id") >= _INC_BASE_MAX)
    cand = (
        inc_b.alias("i")
        .join(
            base_b.alias("b"),
            (F.col("i.band_id") == F.col("b.band_id"))
            & (F.col("i.band_sig") == F.col("b.band_sig")),
        )
        .select(
            F.col("b.doc_id").alias("base_id"),
            F.col("i.doc_id").alias("incoming_id"),
        )
        .distinct()
    )
    sa = shingle_sets.select(
        F.col("doc_id").alias("base_id"), F.col("shingles").alias("sh_a")
    )
    sb = shingle_sets.select(
        F.col("doc_id").alias("incoming_id"), F.col("shingles").alias("sh_b")
    )
    incoming = shingle_sets.filter(F.col("doc_id") >= _INC_BASE_MAX).select(
        F.col("doc_id").alias("incoming_id")
    )
    return _neardup_gate_verdicts(cand, sa, sb, incoming)


def _neardup_gate_verdicts(
    cand: DataFrame, sa: DataFrame, sb: DataFrame, incoming: DataFrame
) -> DataFrame:
    """Shared verification + verdict aggregation of the incremental
    near-dup gates: Jaccard-verify (base_id, incoming_id) candidates
    against the shingle sides sa=(base_id, sh_a) / sb=(incoming_id,
    sh_b), then one verdict row per incoming doc. Shingle-set sides
    are O(docs): shuffle-hash, never broadcast (sf1 vanilla-session
    OOM, SCALE.md §39)."""
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    matches = (
        cand.join(sa.hint("shuffle_hash"), "base_id")
        .join(sb.hint("shuffle_hash"), "incoming_id")
        .filter((inter.cast("double") / union) >= 0.5)
        .groupBy("incoming_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_base_matches"),
            F.min("base_id").cast("long").alias("best_base_id"),
        )
    )
    return (
        incoming.join(matches, "incoming_id", "left")
        .select(
            "incoming_id",
            F.coalesce("n_base_matches", F.lit(0)).cast("long").alias(
                "n_base_matches"
            ),
            "best_base_id",
            F.col("n_base_matches").isNotNull().alias("is_duplicate"),
        )
    )


@query(
    "incremental_neardup_gate_persisted",
    oracle=_INC_GATE_ORACLE,
    tags=("dedup-incremental", "lsh", "persisted-index", "canonical-scale"),
)
def incremental_neardup_gate_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`incremental_neardup_gate` against a PERSISTED index (VERDICT
    r11 task 3): the warehouse shape, where the base corpus's band
    signatures and shingle sets live in BUCKETED tables maintained
    across runs, and a per-batch gate touches ONLY (a) the incoming
    batch's text and (b) those index tables — the base corpus text is
    never re-shingled, re-hashed, or even re-scanned per batch (the
    in-query gate plan is lineage-cut from the index build; tests pin
    that its scans are the two index tables plus the incoming batch).

    Index layout: `band_index(band_key, doc_id)` bucketed by band_key
    — the probe join inherits the bucketing, so the index side joins
    with NO exchange (the shuffle moved into the one-time write) — and
    `shingle_store(doc_id, shingles)` bucketed by doc_id for the
    verify join. At 100 TB both are the materialized state a daily
    ingest maintains; per-batch cost is sig(batch) + one co-bucketed
    probe, independent of corpus TEXT size (the index is ~2 longs per
    doc-band, ~1% of corpus bytes; BENCH_persist_gate_curve.json
    carries the measured batch-cost curve).

    LIFECYCLE, not just a read: after gating, the accepted (novel)
    docs' bands and shingles are APPENDED into the index tables —
    self-enforced to have grown by exactly the accepted counts — so
    the next batch gates against base ∪ accepted, the reference's
    pair-universe refresh loop re-expressed as index maintenance
    (`/root/reference/virginia/coordinator.py:748-840`). Oracle:
    identical to `incremental_neardup_gate` (the persisted path must
    change WHERE bytes live, never the verdicts)."""
    import shutil
    import tempfile
    import uuid

    suffix = uuid.uuid4().hex[:10]
    band_tbl = f"sg_band_index_{suffix}"
    sh_tbl = f"sg_shingle_store_{suffix}"
    root = tempfile.mkdtemp(prefix="sgpersistidx_")
    try:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        # ---- one-time index build (amortized across every later batch)
        base = with_minhash(with_shingles(docs))
        band_key = F.concat_ws(
            ":", F.col("band_id").cast("string"), F.col("band_sig")
        ).alias("band_key")
        (
            band_signatures(base)
            .select(band_key, "doc_id")
            .write.format("parquet")
            .bucketBy(16, "band_key")
            .sortBy("band_key")
            .option("path", os.path.join(root, "band_index"))
            .mode("overwrite")
            .saveAsTable(band_tbl)
        )
        (
            base.select("doc_id", "shingles")
            .write.format("parquet")
            .bucketBy(16, "doc_id")
            .sortBy("doc_id")
            .option("path", os.path.join(root, "shingle_store"))
            .mode("overwrite")
            .saveAsTable(sh_tbl)
        )

        # ---- the per-batch gate: incoming text + index tables ONLY.
        # localCheckpoint cuts lineage: the gate plan provably cannot
        # reach back into the corpus-text pipeline above.
        inc = with_minhash(with_shingles(_incremental_incoming(docs))).select(
            "doc_id", "shingles", *[f"mh{i}" for i in range(N_MINHASH)]
        ).localCheckpoint()
        inc_bands = band_signatures(inc).select(
            band_key, F.col("doc_id").alias("incoming_id")
        )
        idx = spark.table(band_tbl)
        cand = (
            inc_bands.join(idx, "band_key")
            .select(
                F.col("doc_id").alias("base_id"),
                "incoming_id",
            )
            .distinct()
        )
        store = spark.table(sh_tbl)
        sa = store.select(
            F.col("doc_id").alias("base_id"), F.col("shingles").alias("sh_a")
        )
        sb = inc.select(
            F.col("doc_id").alias("incoming_id"),
            F.col("shingles").alias("sh_b"),
        )
        incoming = inc.select(F.col("doc_id").alias("incoming_id"))
        out = _neardup_gate_verdicts(cand, sa, sb, incoming).localCheckpoint()

        # ---- index maintenance: accepted docs join the index, so the
        # NEXT batch gates against base ∪ accepted
        accepted = inc.join(
            out.filter(~F.col("is_duplicate")).select(
                F.col("incoming_id").alias("doc_id")
            ),
            "doc_id",
            "semi",
        )
        n_band_before = spark.table(band_tbl).count()
        n_accepted = accepted.count()
        band_signatures(accepted).select(band_key, "doc_id").write.mode(
            "append"
        ).insertInto(band_tbl)
        accepted.select("doc_id", "shingles").write.mode("append").insertInto(
            sh_tbl
        )
        grown = spark.table(band_tbl).count() - n_band_before
        if grown != n_accepted * N_BANDS:
            raise RuntimeError(
                f"index maintenance drifted: band index grew by {grown}, "
                f"expected {n_accepted * N_BANDS}"
            )
        return out
    finally:
        for t in (band_tbl, sh_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Content-defined chunking (rsync/LBFS-style): rolling-hash cut points →
# variable-length chunks shared across documents
# ---------------------------------------------------------------------------

_CDC_DIVISOR = 32  # expected chunk length ~ divisor tokens
_CDC_TOPK = 20

_CDC_HEX15_SQL = "(" + " + ".join(
    "(strpos('0123456789abcdef', substr(md5(array_to_string("
    f"list_slice(t, i, i + 3), ' ')), {j + 1}, 1)) - 1) * {16 ** (14 - j)}"
    for j in range(15)
) + ")"


@query(
    "cdc_shared_chunks",
    oracle=f"""
WITH corpus AS ({_CRAWL_UNION_SQL}),
tok AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM corpus
),
cutsq AS (
  SELECT doc_id, t, len(t) AS n,
         list_filter(generate_series(1, GREATEST(len(t) - 3, 0)),
                     i -> {_CDC_HEX15_SQL} % {_CDC_DIVISOR} = 0) AS cuts
  FROM tok WHERE len(t) > 0
),
endsq AS (
  SELECT doc_id, t,
         list_sort(list_distinct(
           list_concat(list_transform(cuts, i -> i + 3), [n]))) AS ends
  FROM cutsq
),
chunksq AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ends)),
            j -> array_to_string(
                   list_slice(t,
                     CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END,
                     ends[j]),
                   ' ')) AS chunks
  FROM endsq
),
c AS (SELECT doc_id, unnest(chunks) AS chunk_text FROM chunksq)
SELECT md5(chunk_text) AS chunk_hash,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(MAX(len(list_filter(string_split(chunk_text, ' '), x -> x <> '')))
            AS BIGINT) AS chunk_tokens
FROM c GROUP BY 1
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_occurrences DESC, chunk_hash
LIMIT {_CDC_TOPK}
""",
    tags=("dedup-cdc", "chunking"),
)
def cdc_shared_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED chunking, the rsync/LBFS/backup-dedup technique:
    cut each document where the rolling hash of its 4-token window is
    ≡ 0 mod {_CDC_DIVISOR}, producing variable-length chunks whose
    boundaries move WITH the content — an insertion early in a recrawled
    page shifts every fixed-size block but leaves all later CDC chunks
    identical, which is why real dedup storage uses it over fixed
    blocks. Emits the chunks shared across documents (the crawl-union
    fixture guarantees exact recrawls share every chunk), top-{_CDC_TOPK}
    by occurrence. Complements ngram_duplicate_spans (fixed 8-grams):
    same signal family, boundary-stable variant.

    Plan shape: the whole cut/slice/chunk pipeline is in-row array HOFs
    (zero shuffles until the final chunk-hash aggregation — the one
    exchange carries md5s, never chunk text beyond the md5 preimage
    evaluation). At 100 TB chunk hashes are the natural bucketing key
    for a chunk store; this query IS its build pass."""
    corpus = crawl_union(spark, sf_dir)
    ends_expr = (
        "array_sort(array_distinct(concat(transform("
        "filter(sequence(1, greatest(size(t) - 3, 0)),"
        " i -> cast(conv(substring(md5(concat_ws(' ', slice(t, i, 4))),"
        f" 1, 15), 16, 10) as bigint) % {_CDC_DIVISOR} = 0),"
        " i -> i + 3), array(size(t)))))"
    )
    chunks = (
        corpus.select(
            "doc_id", F.expr("filter(split(text, ' '), x -> x != '')").alias("t")
        )
        .filter(F.size("t") > 0)
        .withColumn("ends", F.expr(ends_expr))
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(ends)),"
                " j -> concat_ws(' ', slice(t,"
                " if(j = 1, 1, element_at(ends, j - 1) + 1),"
                " element_at(ends, j)"
                " - if(j = 1, 1, element_at(ends, j - 1) + 1) + 1)))"
            ).alias("chunks"),
        )
    )
    c = chunks.select("doc_id", F.explode("chunks").alias("chunk_text"))
    return (
        c.groupBy(F.md5("chunk_text").alias("chunk_hash"))
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.max(
                F.size(F.expr("filter(split(chunk_text, ' '), x -> x != '')"))
            )
            .cast("long")
            .alias("chunk_tokens"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_occurrences").desc(), "chunk_hash")
        .limit(_CDC_TOPK)
    )


# ---------------------------------------------------------------------------
# LSH tuning curve: candidate volume & precision as the band count varies
# ---------------------------------------------------------------------------

_SENS_CONFIGS = (2, 4, 8)  # bands over the 16 minhashes → rows 8 / 4 / 2


def _band_cte_sql(b: int, k: int = N_MINHASH) -> str:
    rows = k // b
    selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {j} AS band_id, {concat} AS sig FROM mh".format(
            j=j,
            concat=" || '|' || ".join(
                f"CAST(mh{j * rows + r} AS VARCHAR)" for r in range(rows)
            ),
        )
        for j in range(b)
    )
    return f"""
bands{b} AS (
{selects}
),
cand{b} AS (
  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
  FROM bands{b} a JOIN bands{b} c
    ON a.band_id = c.band_id AND a.sig = c.sig AND a.doc_id < c.doc_id
),
ver{b} AS (
  SELECT COUNT(*) AS n_true FROM (
    SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
    FROM cand{b} c
    JOIN sh sa ON sa.doc_id = c.doc_a
    JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
    GROUP BY c.doc_a, c.doc_b
  ) i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
)"""


def _sens_select_sql(b: int, k: int = N_MINHASH) -> str:
    return f"""
SELECT CAST({b} AS BIGINT) AS n_bands,
       CAST({k // b} AS BIGINT) AS rows_per_band,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{b}) AS n_candidates,
       (SELECT CAST(n_true AS BIGINT) FROM ver{b}) AS n_true_pairs,
       (SELECT CAST(n_true * 1000 // GREATEST((SELECT COUNT(*) FROM cand{b}), 1)
                    AS BIGINT) FROM ver{b}) AS precision_x1000"""


@query(
    "lsh_band_sensitivity",
    oracle=f"""
WITH {_minhash_sql(_CRAWL_UNION_SQL)},
{",".join(_band_cte_sql(b) for b in _SENS_CONFIGS)}
{" UNION ALL ".join(_sens_select_sql(b) for b in _SENS_CONFIGS)}
""",
    tags=("dedup-lsh", "tuning"),
)
def lsh_band_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH TUNING CURVE: from ONE 16-minhash signature table, sweep
    the band split (2x8 / 4x4 / 8x2) and report, per configuration, the
    candidate-pair volume and how many candidates are true near-dups
    (Jaccard >= 0.5) — i.e. the precision/volume trade the s-curve
    theory predicts (more bands with fewer rows = lower effective
    threshold = more candidates, lower precision). This is the
    measurement a pipeline runs BEFORE fixing its production (b, r):
    the signatures are computed once, each config is only a different
    fold of the same columns. Scale shape: per config one
    band-bucket self-join (exactly minhash_lsh_dedup's plan) + one
    verification join over candidates only; the three 1-row summaries
    union — no cross-config interaction, no all-pairs anywhere."""
    corpus = with_minhash(with_shingles(crawl_union(spark, sf_dir)))
    # No persist (r13): each config's counts recompute the narrow
    # shingle+minhash projection — measured neutral (the minhash A/B)
    # and leak-free, vs two never-dropped CacheManager entries.
    shingle_sets = corpus.select("doc_id", "shingles")
    sigs = corpus

    results = None
    for b in _SENS_CONFIGS:
        bands = band_signatures(sigs, bands=b)
        a, c = bands.alias("a"), bands.alias("c")
        cand = (
            a.join(
                c,
                (F.col("a.band_id") == F.col("c.band_id"))
                & (F.col("a.band_sig") == F.col("c.band_sig"))
                & (F.col("a.doc_id") < F.col("c.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("c.doc_id").alias("doc_b"),
            )
            .distinct()
            .persist()
        )
        sa = shingle_sets.select(
            F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
        )
        sb = shingle_sets.select(
            F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        verified = (
            # shingle-set sides are O(docs): shuffle-hash (SCALE.md §39)
            cand.join(sa.hint("shuffle_hash"), "doc_a")
            .join(sb.hint("shuffle_hash"), "doc_b")
            .filter((inter.cast("double") / union) >= 0.5)
        )
        n_cand = cand.count()
        n_true = verified.count()
        row = spark.createDataFrame(
            [
                (
                    b,
                    N_MINHASH // b,
                    n_cand,
                    n_true,
                    n_true * 1000 // max(n_cand, 1),
                )
            ],
            "n_bands long, rows_per_band long, n_candidates long,"
            " n_true_pairs long, precision_x1000 long",
        )
        results = row if results is None else results.unionByName(row)
        cand.unpersist()
    return results


# ---------------------------------------------------------------------------
# Distributed suffix-array construction by PREFIX DOUBLING — the
# O(n log n) algorithm behind exact substring-duplication dedup (Lee et
# al.'s suffix-array pass; `ngram_duplicate_spans` is the fixed-length
# approximation, this is the real thing). The oracle verifies the ENTIRE
# array per document against a brute-force suffix sort.
# ---------------------------------------------------------------------------


def _suffix_rounds(max_len: int) -> int:
    r = 0
    while (1 << r) < max(int(max_len), 1):
        r += 1
    return r


def _suffix_ranks(docs: DataFrame) -> DataFrame:
    """The prefix-doubling core shared by `suffix_array_fingerprint` and
    `longest_repeated_substring`: (doc_id, i, rank) with rank the
    suffix's final lexicographic position within its document. One
    1-row driver collect (the corpus max length fixes the round count);
    each round is a single doc-keyed window stage.

    Round-state memory discipline: a localCheckpoint per round RETAINS
    every round's materialization for the session (no reliable
    unpersist), which at sf3 is rounds x positions x row ≈ 20 GB and
    OOMs the 16 GB local heap. Instead each round persists DISK_ONLY
    (cache-manager storage, where unpersist IS reliable), the
    superseded round is dropped as soon as the next materializes, and
    ONE terminal localCheckpoint truncates the accumulated lineage —
    peak footprint is two rounds on disk plus one in the checkpoint."""
    from pyspark.storagelevel import StorageLevel

    stats = docs.agg(
        F.max(F.length("text")), F.sum(F.length("text"))
    ).collect()[0]
    max_len = stats[0] or 1
    total_pos = stats[1] or 1
    rounds = _suffix_rounds(max_len)
    pos = docs.select(
        "doc_id",
        F.explode(F.expr("sequence(1, length(text))")).alias("p"),
        F.expr("text").alias("t"),
    ).select(
        "doc_id",
        (F.col("p") - 1).alias("i"),
        F.ascii(F.expr("substr(t, p, 1)")).cast("long").alias("rank"),
    )
    # Position-proportional partitioning: every round is a doc-keyed
    # window SORT over the full position table, and per-task sort pages
    # are resident — at ~2M positions/partition the footprint stays
    # bounded whatever the corpus size (sf1 under the driver's vanilla
    # 1 GB heap OOMed with positions/8 per task; at 100 TB the same
    # dial is executor-count-proportional). HashPartitioning(doc_id, n)
    # satisfies the windows' ClusteredDistribution, so the explicit
    # repartition replaces — not precedes — the windows' own exchange
    # and every round inherits it.
    # The conf can be the non-numeric 'auto' in AQE-managed
    # environments (ADVICE r11 item 4) — fall back to the cluster's
    # default parallelism so the position-proportional floor still
    # applies instead of raising before any work runs.
    try:
        conf_parts = int(
            docs.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (ValueError, TypeError):
        conf_parts = docs.sparkSession.sparkContext.defaultParallelism
    n_parts = max(
        conf_parts,
        min(512, -(-int(total_pos) // 2_000_000)),
    )
    pos = pos.repartition(n_parts, "doc_id")
    r = pos.persist(StorageLevel.DISK_ONLY)
    r.count()
    w_ord = Window.partitionBy("doc_id").orderBy("i")
    for k in range(rounds):
        off = 1 << k
        paired = r.select(
            "doc_id",
            "i",
            "rank",
            F.lead("rank", off, -1).over(w_ord).alias("r2"),
        )
        w_rank = Window.partitionBy("doc_id").orderBy("rank", "r2")
        new = paired.select(
            "doc_id",
            "i",
            F.dense_rank().over(w_rank).cast("long").alias("rank"),
        ).persist(StorageLevel.DISK_ONLY)
        # Early-fixpoint exit (r13, guide §1.2 "don't compute things you
        # throw away"): once every document's ranks are pairwise
        # distinct, dense_rank over (rank, r2) orders exactly by rank and
        # every further round is the identity — the standard
        # prefix-doubling termination. The probe IS the materializing
        # action (replacing the bare count()), and it needs NO exchange:
        # `new` is hash-partitioned by doc_id, which co-locates every
        # (doc_id, rank) group, so the duplicate count is a per-partition
        # hash aggregation over the just-persisted round. Round count
        # drops from ceil(log2(max_len)) to the corpus's true
        # convergence depth (text with short repeats converges in 3-5).
        n_dup = (
            new.groupBy("doc_id", "rank")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        r.unpersist()
        r = new
        if n_dup == 0:
            break
    out = r.localCheckpoint()
    r.unpersist()
    return out


@query(
    "suffix_array_fingerprint",
    oracle="""
WITH pos AS (
  SELECT doc_id, text, unnest(generate_series(1, len(text))) AS ip
  FROM documents
),
ranked AS (
  SELECT doc_id, ip - 1 AS i,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY substr(text, CAST(ip AS INT)))
              AS BIGINT) AS rank
  FROM pos
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_suffixes,
       md5(string_agg(CAST(rank AS VARCHAR), ',' ORDER BY i))
         AS suffix_order_md5,
       CAST(MIN(CASE WHEN rank = 1 THEN i END) AS BIGINT) AS top_pos
FROM ranked GROUP BY doc_id
""",
    tags=("dedup-substring", "suffix-array", "iterative"),
)
def suffix_array_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document SUFFIX ARRAY built distributively by prefix
    doubling — ceil(log2(max_len)) rounds, each round one doc-keyed
    window stage: lead(rank, 2^k) pairs each suffix's rank with the
    rank 2^k ahead (absent → -1, so a shorter suffix that is a prefix
    of a longer one sorts first, the lexicographic rule), then
    dense_rank over the pair re-ranks. After the last round every rank
    is distinct and equals the suffix's lexicographic position — the
    structure substring-duplication dedup walks for arbitrary-length
    repeats, where `ngram_duplicate_spans` can only see fixed 8-grams.

    The oracle brute-force sorts every suffix STRING per document
    (O(n^2) memory — viable exactly because it is the oracle, not the
    engine) and md5-fingerprints the rank sequence in position order;
    a hash match proves every rank of every position. Binary/codepoint
    collation on both engines; corpus is ASCII (driver testdata), so
    character order is unambiguous.

    Scale shape: each round is ONE hash-partition-by-doc exchange (both
    windows share the doc_id partitioning; the two sorts happen within
    the partition), rounds = log2 of the LONGEST document (10 here) —
    not corpus size; `localCheckpoint` per round cuts the lineage like
    every iterative operator in this engine. At 100 TB the same plan
    runs with documents hash-spread across executors; a single giant
    document would instead shard its position table (the DC3/pDC3
    construction) — out of scope, documented, and irrelevant to
    crawl-shaped corpora whose documents are MBs at most."""
    r = _suffix_ranks(load_table(spark, sf_dir, "documents"))
    return (
        r.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suffixes"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr(
                        "transform(array_sort(collect_list(struct(i, rank))),"
                        " x -> cast(x.rank as string))"
                    ),
                )
            ).alias("suffix_order_md5"),
            F.min_by("i", "rank").cast("long").alias("top_pos"),
        )
        .select("doc_id", "n_suffixes", "suffix_order_md5", "top_pos")
    )


@query(
    "longest_repeated_substring",
    oracle="""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
),
pos AS (
  SELECT doc_id, text, unnest(generate_series(1, len(text))) AS ip FROM d
),
ranked AS (
  SELECT doc_id, text, ip - 1 AS i,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY substr(text, CAST(ip AS INT))) AS rank
  FROM pos
),
pairs AS (
  SELECT doc_id, text, i,
         LAG(i) OVER (PARTITION BY doc_id ORDER BY rank) AS j
  FROM ranked
),
p AS (
  SELECT doc_id, text, i, j,
         LEAST(len(text) - i, len(text) - j) AS minlen
  FROM pairs WHERE j IS NOT NULL
),
expand AS (
  SELECT doc_id, text, i, j, minlen, unnest(range(0, minlen)) AS m FROM p
),
mm AS (
  SELECT doc_id, i, j,
         MIN(CASE WHEN substr(text, CAST(i + 1 + m AS INT), 1)
                   <> substr(text, CAST(j + 1 + m AS INT), 1)
                  THEN m END) AS first_mm
  FROM expand GROUP BY doc_id, i, j
),
lcps AS (
  SELECT p.doc_id, p.text, p.i, p.j,
         COALESCE(mm.first_mm, p.minlen) AS lcp
  FROM p LEFT JOIN mm ON mm.doc_id = p.doc_id AND mm.i = p.i AND mm.j = p.j
),
best AS (
  SELECT doc_id, text, lcp, LEAST(i, j) AS s,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY lcp DESC, LEAST(i, j), GREATEST(i, j))
           AS rn
  FROM lcps
)
SELECT doc_id,
       CAST(lcp AS BIGINT) AS lrs_len,
       CAST(CASE WHEN lcp = 0 THEN -1 ELSE s END AS BIGINT) AS lrs_start,
       CASE WHEN lcp = 0 THEN ''
            ELSE substr(text, CAST(s + 1 AS INT), CAST(lcp AS INT)) END
         AS lrs_text
FROM best WHERE rn = 1
""",
    tags=("dedup-substring", "suffix-array", "iterative"),
)
def longest_repeated_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LONGEST REPEATED SUBSTRING per document — the actual
    boilerplate/template signal substring dedup acts on (a doc whose
    LRS is half its length is a template; `doc_duplicate_span_load`
    approximates this with fixed 8-grams). Classic suffix-array result:
    the max LCP over ALL O(n^2) suffix pairs is attained by a pair
    ADJACENT in suffix order, so after the shared prefix-doubling build
    (`_suffix_ranks`) only n-1 adjacent pairs are compared. Each LCP is
    an in-row HOF scan for the first mismatching character (documents
    here are < 1 KB; for giant documents the rank tables support
    O(log n) LCP by binary lifting — documented trade, same plan
    shape). Runs on the doc_id % 10 stratum so the oracle's
    per-character brute force stays tractable at sf0.1; ties broken
    (max lcp, min start, min partner) for a deterministic winner.

    Plan: the doubling rounds' doc-keyed exchanges, one lag window on
    the same key, a doc-keyed text join, then per-row HOF arithmetic
    and a per-doc top-1 — nothing quadratic anywhere in the engine
    path."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    r = _suffix_ranks(docs)
    w = Window.partitionBy("doc_id").orderBy("rank")
    # carry the text as a pre-split char ARRAY: element_at is O(1)
    # where substr(text, k, 1) is O(k) (UTF8 byte navigation), which
    # would make each pair's LCP scan O(L^2)
    pairs = (
        r.select("doc_id", "i", F.lag("i").over(w).alias("j"))
        .filter(F.col("j").isNotNull())
        .join(
            docs.select(
                "doc_id", "text", F.split("text", "").alias("chars")
            ),
            "doc_id",
        )
        .withColumn(
            "minlen",
            F.least(
                F.length("text") - F.col("i"), F.length("text") - F.col("j")
            ),
        )
    )
    first_mismatch = F.expr(
        "array_min(filter(transform(sequence(0, minlen - 1),"
        " m -> if(element_at(chars, cast(i + 1 + m as int))"
        "      <> element_at(chars, cast(j + 1 + m as int)), m,"
        "      cast(null as int))),"
        " x -> x is not null))"
    )
    lcps = pairs.select(
        "doc_id",
        "text",
        "i",
        "j",
        F.coalesce(first_mismatch, F.col("minlen")).cast("long").alias("lcp"),
    )
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("lcp").desc(), F.least("i", "j"), F.greatest("i", "j")
    )
    return (
        lcps.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("lcp").alias("lrs_len"),
            F.when(F.col("lcp") == 0, F.lit(-1))
            .otherwise(F.least("i", "j"))
            .cast("long")
            .alias("lrs_start"),
            F.when(F.col("lcp") == 0, F.lit(""))
            .otherwise(
                F.expr(
                    "substr(text, cast(least(i, j) + 1 as int), cast(lcp as int))"
                )
            )
            .alias("lrs_text"),
        )
    )


# ---------------------------------------------------------------------------
# Label-propagation communities over the near-dup graph
# ---------------------------------------------------------------------------
_LPA_ROUNDS = 3


def _lpa_round_sql(prev: str, cur: str) -> str:
    return f"""{cur}m AS (
  SELECT e.dst AS doc_id, l.lab, COUNT(*) AS c
  FROM edges e JOIN {prev} l ON l.doc_id = e.src
  GROUP BY e.dst, l.lab
),
{cur} AS (
  SELECT doc_id, lab FROM {cur}m
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, lab) = 1
)"""


@query(
    "dup_graph_communities",
    oracle=f"""
WITH {{MINHASH}},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
lp0 AS (SELECT DISTINCT src AS doc_id, src AS lab FROM edges),
{_lpa_round_sql("lp0", "lp1")},
{_lpa_round_sql("lp1", "lp2")},
{_lpa_round_sql("lp2", "lp3")}
SELECT doc_id, CAST(lab AS BIGINT) AS community,
       CAST(COUNT(*) OVER (PARTITION BY lab) AS BIGINT) AS community_size
FROM lp3
""".replace("{MINHASH}", _minhash_sql(_CRAWL_UNION_SQL)),
    tags=("dedup-graph", "iterative", "communities"),
)
def dup_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the near-dup graph by synchronous LABEL
    PROPAGATION (Raghavan et al. 2007): every node starts as its own
    label; each round it adopts the MODE of its neighbors' labels (ties
    to the smallest label, so each round is a deterministic function of
    the previous — the property that lets the oracle unroll identical
    rounds as chained CTEs). Three declared rounds. Where
    `dedup_clusters` answers "which docs are transitively connected",
    communities answer "which docs form DENSE duplication families" —
    a long chain of pairwise-similar docs splits into locally-cohesive
    groups instead of one giant component, which is what a
    keep-one-per-group dedup policy actually wants.

    Spark-first shape: per round ONE keyed join (edges ⋈ labels on src)
    + one (dst, label) count + one max_by argmax — the same Pregel
    message schedule as dup_graph_pagerank, `localCheckpoint` cutting
    lineage per round; all arithmetic integer, ties integral. At
    100 TB: edges pre-partitioned by src co-locate every round's join;
    rounds are O(1) by declaration, not data-dependent."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    # edges is a narrow map over the SHARED localCheckpointed pair table
    # — recomputing it per round costs one pass over checkpoint blocks,
    # so the r12 persist bought nothing and leaked a CacheManager entry
    # per query (r13, guide §5 "persist only when recomputing is more
    # expensive than the memory pressure").
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("lab"))
        .localCheckpoint()
    )
    for _ in range(_LPA_ROUNDS):
        counted = (
            edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
            .groupBy(F.col("dst").alias("doc_id"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            counted.groupBy("doc_id")
            .agg(
                F.expr("max_by(lab, named_struct('c', c, 'nl', -lab))").alias("lab")
            )
            .localCheckpoint()
        )
    return labels.select(
        "doc_id",
        F.col("lab").alias("community"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lab"))
        .cast("long")
        .alias("community_size"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition of the near-dup graph (bounded peeling rounds)
# ---------------------------------------------------------------------------
_KCORE_K = 2
_KCORE_ROUNDS = 3


def _kcore_round_sql(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT e.src AS doc_id
  FROM edges e
  JOIN {prev} pa ON pa.doc_id = e.src
  JOIN {prev} pb ON pb.doc_id = e.dst
  GROUP BY e.src
  HAVING COUNT(*) >= {_KCORE_K}
)"""


@query(
    "dup_graph_kcore",
    oracle=f"""
WITH {{MINHASH}},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
n0 AS (SELECT DISTINCT src AS doc_id FROM edges),
{_kcore_round_sql("n0", "n1")},
{_kcore_round_sql("n1", "n2")},
{_kcore_round_sql("n2", "n3")}
SELECT e.src AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM edges e
JOIN n3 a ON a.doc_id = e.src
JOIN n3 b ON b.doc_id = e.dst
GROUP BY e.src
""".replace("{MINHASH}", _minhash_sql(_CRAWL_UNION_SQL)),
    tags=("dedup-graph", "iterative", "kcore"),
)
def dup_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2, 3 declared peeling rounds) of the
    near-dup graph: iteratively drop every node with fewer than k
    surviving neighbors, keeping the maximal subgraph where everyone
    has >= k near-duplicates — the DENSE template families (mirror
    farms, boilerplate clusters) that pairwise edges and even LPA
    communities overstate: a chain of coincidental pairwise matches
    peels away, a true mirror family survives. Completes the graph
    family (CC, PageRank, triangles, LPA, now coreness). Each peel
    round is a deterministic function of the previous node set, so the
    oracle unrolls identical rounds as chained CTEs — the same
    declared-rounds contract as LPA (a fixed-point loop would be
    data-dependent; 3 rounds is the documented approximation and
    removes >= 95% of peelable nodes on every tested SF).

    Spark-first shape: per round TWO LEFT SEMI joins (edges vs the
    surviving node set on src and dst) + one src-keyed count filter;
    `localCheckpoint` cuts lineage per round; all arithmetic integer.
    At 100 TB: edges pre-partitioned on src co-locate every round's
    semi-join and degree count; the node set shrinks monotonically so
    rounds get cheaper."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    # edges is a narrow map over the SHARED localCheckpointed pair table
    # — recomputing it per round costs one pass over checkpoint blocks,
    # so the r12 persist bought nothing and leaked a CacheManager entry
    # per query (r13, guide §5 "persist only when recomputing is more
    # expensive than the memory pressure").
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    nodes = edges.select(F.col("src").alias("doc_id")).distinct().localCheckpoint()
    for _ in range(_KCORE_ROUNDS):
        nodes = (
            edges.join(
                nodes.withColumnRenamed("doc_id", "src"), "src", "left_semi"
            )
            .join(nodes.withColumnRenamed("doc_id", "dst"), "dst", "left_semi")
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= _KCORE_K)
            .select("doc_id")
            .localCheckpoint()
        )
    return (
        edges.join(nodes.withColumnRenamed("doc_id", "src"), "src", "left_semi")
        .join(nodes.withColumnRenamed("doc_id", "dst"), "dst", "left_semi")
        .groupBy(F.col("src").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )


# ---------------------------------------------------------------------------
# PPJoin: exact set-similarity join with PREFIX FILTERING (Xiao et al. 2011)
# ---------------------------------------------------------------------------
_PP_THR_NUM, _PP_THR_DEN = 17, 20  # Jaccard threshold t = 0.85, exact rational

_PPJOIN_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         list_sort(list_distinct(
           list_filter(string_split(text, ' '), x -> x <> ''))) AS toks
  FROM documents WHERE doc_id % 5 = 0
),
dt AS (SELECT doc_id, unnest(toks) AS w FROM docs),
sizes AS (SELECT doc_id, len(toks) AS m FROM docs),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM dt a JOIN dt b ON b.w = a.w AND b.doc_id > a.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(sa.m AS BIGINT) AS n_a, CAST(sb.m AS BIGINT) AS n_b,
       CAST(i.n_inter AS BIGINT) AS n_inter,
       CAST(i.n_inter AS DOUBLE)
         / CAST(sa.m + sb.m - i.n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE {_PP_THR_DEN} * i.n_inter
      >= {_PP_THR_NUM} * (sa.m + sb.m - i.n_inter)
"""


@query("ppjoin_prefix_filter", oracle=_PPJOIN_ORACLE, tags=("dedup-ngram-jaccard", "J5", "pairs-audit-tier"))
def ppjoin_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join with PREFIX FILTERING (PPJoin, Xiao et
    al. 2011): a pair of documents with Jaccard >= t MUST share a token
    within the first m - ceil(t*m) + 1 tokens of each document in any
    GLOBAL token order — so candidate generation explodes only those
    prefix tokens (rarest-first order shrinks posting lists hardest),
    then every candidate is verified by the exact intersection. The
    ORACLE generates candidates from ALL tokens (the plain inverted-
    index join of ngram_jaccard_pairs beside it) — a value-hash match
    therefore PROVES the prefix filter lost no qualifying pair, which
    is the theorem the algorithm rests on, checked end to end on real
    data. Threshold t = 17/20 is held as an exact rational (the gate is
    20*|A∩B| >= 17*|A∪B|, integers), ceil(t*m) = (17m+19) div 20.

    Plan: token df and the global rarity rank are vocabulary-sized (the
    rank window is a single-partition sort over the VOCABULARY, not the
    corpus — documented bound); per-doc prefix positions ride one
    (doc) window over rank-joined tokens; candidates self-join ONLY
    prefix entries on the token key (equi-join); verification joins the
    distinct pairs back to the docs' sorted token arrays and counts
    array_intersect per row in codegen. At 100 TB the win IS the prefix:
    candidate volume per token falls from |posting|² to |prefix-posting|²
    — on adversarially self-similar corpora like this fixture the filter
    degrades gracefully toward the full join, never below it."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            F.array_sort(
                F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
            ).alias("toks"),
        )
        # token-array table: checkpoint once for its three consumers
        # (prefix build, verify side A, verify side B)
        .localCheckpoint()
    )
    sizes = docs.select("doc_id", F.size("toks").alias("m"))
    dt = docs.select("doc_id", F.explode("toks").alias("w"))
    df_rank = (
        dt.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "w",
            F.row_number()
            .over(Window.orderBy(F.col("df").asc(), F.col("w").asc()))
            .alias("rank"),
        )
    )
    ranked = dt.join(F.broadcast(df_rank), "w").join(F.broadcast(sizes), "doc_id")
    w_doc = Window.partitionBy("doc_id").orderBy("rank")
    prefix = ranked.select(
        "doc_id",
        "w",
        F.row_number().over(w_doc).alias("pos"),
        (F.col("m") - F.expr(f"({_PP_THR_NUM} * m + {_PP_THR_DEN} - 1) div {_PP_THR_DEN}") + 1).alias("plen"),
    ).filter(F.col("pos") <= F.col("plen")).select("doc_id", "w")
    cand = (
        prefix.alias("pa")
        .join(prefix.alias("pb"), (F.col("pa.w") == F.col("pb.w"))
              & (F.col("pa.doc_id") < F.col("pb.doc_id")))
        .select(F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b"))
        .distinct()
    )
    verified = (
        cand.join(docs.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")), "doc_a")
        .join(docs.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size("ta").alias("n_a"),
            F.size("tb").alias("n_b"),
            F.size(F.array_intersect("ta", "tb")).alias("n_inter"),
        )
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return verified.filter(
        F.lit(_PP_THR_DEN) * F.col("n_inter") >= F.lit(_PP_THR_NUM) * union
    ).select(
        "doc_a",
        "doc_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_inter").cast("long").alias("n_inter"),
        (F.col("n_inter").cast("double") / union.cast("double")).alias("jaccard"),
    )
