"""Quality-aware dedup representative selection — the composition of the
dedup and quality families: inside each near-dup cluster keep the BEST
document, not the lowest-id one.

dedup_keep_canonical's min-doc_id rule is the cheap default; real corpus
prep (e.g. CCNet, RefinedWeb) keeps the highest-quality copy of each
duplicate family — the longest, most lexically diverse crawl of a page
rather than whichever was crawled first. Same clusters, better survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .dedup import _CRAWL_UNION_SQL, _lsh_verified_pairs, _lsh_verified_pairs_shared, _minhash_sql, connected_components, crawl_union

_BESTQ_ORACLE = f"""
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
labeled AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
scored AS (
  SELECT l.doc_id, l.cluster_id,
         len(list_distinct(string_split(c.text, ' '))) * 1000
           + length(c.text) AS quality,
         length(c.text) AS n_chars
  FROM labeled l JOIN ({_CRAWL_UNION_SQL}) c ON c.doc_id = l.doc_id
),
rk AS (
  SELECT cluster_id, doc_id, quality, n_chars,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
                            ORDER BY quality DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         SUM(n_chars) OVER (PARTITION BY cluster_id) AS total_chars
  FROM scored
)
SELECT cluster_id,
       CAST(doc_id AS BIGINT) AS best_doc,
       CAST(quality AS BIGINT) AS best_quality,
       CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(total_chars - n_chars AS BIGINT) AS chars_saved
FROM rk WHERE rn = 1
"""


@query("dedup_keep_best_quality", oracle=_BESTQ_ORACLE, tags=("dedup-clusters", "corpus"))
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster survivor: for every near-dup cluster, keep
    the HIGHEST-QUALITY member (quality = distinct-token count × 1000 +
    chars — lexical diversity first, length as tiebreak; final tie →
    lowest doc_id) and report the cluster size and the characters saved
    by dropping the rest. This is what CCNet/RefinedWeb-style corpus
    prep actually does — the first-crawled copy (min doc_id,
    dedup_keep_canonical) is often the truncated or boilerplate-heavy
    one; the integer quality rule here is deterministic, auditable, and
    cheap enough to compute inline with the cluster labels.

    Plan: the verified-pair graph and its O(diameter) min-label CC reuse
    the dedup module's kernels verbatim (localCheckpoint per round);
    scores join doc text only for CLUSTERED docs (cluster-member-sized,
    not corpus-sized); the survivor pick and the size/chars rollup share
    one cluster-keyed window exchange. Oracle: same fixpoint as a
    recursive CTE + the identical integer quality rule."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    labels = connected_components(pairs)
    docs = crawl_union(spark, sf_dir).select(
        "doc_id",
        (
            F.size(F.array_distinct(F.split("text", " "))) * 1000
            + F.length("text")
        ).alias("quality"),
        F.length("text").alias("n_chars"),
    )
    scored = labels.select("doc_id", F.col("label").alias("cluster_id")).join(
        docs, "doc_id"
    )
    from pyspark.sql import Window

    wc = Window.partitionBy("cluster_id")
    rk = scored.select(
        "cluster_id",
        "doc_id",
        "quality",
        "n_chars",
        F.row_number()
        .over(wc.orderBy(F.col("quality").desc(), F.col("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cluster_size"),
        F.sum("n_chars").over(wc).alias("total_chars"),
    )
    return rk.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").cast("long").alias("best_doc"),
        F.col("quality").cast("long").alias("best_quality"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (F.col("total_chars") - F.col("n_chars")).cast("long").alias("chars_saved"),
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split: split by CLUSTER, audit the naive split
# ---------------------------------------------------------------------------
def _split_hex8(ident: str) -> str:
    """DuckDB SQL for the first-8-hex-digits-of-md5 bucket of `ident` —
    textstats._SPLIT_HEX8 parametrized over the id expression, so the
    split hash can key on the CLUSTER id."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST({ident} AS VARCHAR)),"
        f" {1 + i}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )


_LEAK_ORACLE = f"""
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
labeled AS (SELECT doc_id, MIN(r) AS cluster_id FROM reach GROUP BY doc_id),
assign AS (
  SELECT c.doc_id,
         COALESCE(l.cluster_id, c.doc_id) AS cluster_id,
         ({_split_hex8('COALESCE(l.cluster_id, c.doc_id)')}) % 100
           AS cbucket,
         ({_split_hex8('c.doc_id')}) % 100 AS nbucket
  FROM corpus c LEFT JOIN labeled l ON l.doc_id = c.doc_id
),
splits AS (
  SELECT doc_id, cluster_id,
         CASE WHEN cbucket < 80 THEN 'train'
              WHEN cbucket < 90 THEN 'val' ELSE 'test' END AS split,
         CASE WHEN nbucket < 80 THEN 'train'
              WHEN nbucket < 90 THEN 'val' ELSE 'test' END AS naive_split
  FROM assign
),
pair_audit AS (
  SELECT sa.split AS split,
         CAST(COUNT(*) FILTER (sa.split <> sb.split) AS BIGINT)
           AS safe_leaked_pairs,
         CAST(COUNT(*) FILTER (sa.naive_split <> sb.naive_split) AS BIGINT)
           AS naive_leaked_pairs
  FROM pairs p
  JOIN splits sa ON sa.doc_id = p.doc_a
  JOIN splits sb ON sb.doc_id = p.doc_b
  GROUP BY sa.split
),
members AS (
  SELECT split,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
  FROM splits GROUP BY split
)
SELECT m.split, m.n_docs, m.n_clusters,
       COALESCE(a.safe_leaked_pairs, 0) AS safe_leaked_pairs,
       COALESCE(a.naive_leaked_pairs, 0) AS naive_leaked_pairs
FROM members m LEFT JOIN pair_audit a ON a.split = m.split
"""


@query(
    "leakage_safe_split",
    oracle=_LEAK_ORACLE,
    tags=("sampling-split", "dedup-clusters", "corpus"),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup-aware train/val/test split: hash the CLUSTER id
    (connected component of the LSH-verified near-dup graph), not the
    doc id, so a whole duplicate family always lands in one split —
    the standard defense against train/test contamination via
    near-duplicates (evaluation on a near-copy of a training doc
    silently inflates scores). Unclustered docs are their own
    singleton cluster, so the split stays deterministic and
    append-stable (the split_label property).

    The result is simultaneously the split manifest and its audit:
    safe_leaked_pairs counts verified near-dup pairs straddling the
    CLUSTER split (provably 0 — both endpoints share a cluster id, so
    they share a hash), next to naive_leaked_pairs — the SAME pairs
    under the doc_id-hashed split — quantifying exactly how much
    contamination the naive split would have shipped.

    Plan: the pair/cluster machinery is the dedup_clusters lane
    (banded equi-joins, bounded-round CC); the split itself is a pure
    hash projection; the audit joins are doc-level (broadcast-sized
    keys at any SF since only CLUSTERED docs appear in pairs)."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    labels = connected_components(pairs).select(
        "doc_id", F.col("label").alias("cluster_id")
    )
    corpus = crawl_union(spark, sf_dir).select("doc_id")
    assign = (
        corpus.join(labels, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
    )
    bucket = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    label = lambda b: (  # noqa: E731
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    splits = assign.select(
        "doc_id",
        "cluster_id",
        label(bucket("cluster_id")).alias("split"),
        label(bucket("doc_id")).alias("naive_split"),
    ).localCheckpoint()
    sa = splits.select(
        F.col("doc_id").alias("doc_a"),
        F.col("split").alias("split_a"),
        F.col("naive_split").alias("naive_a"),
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"),
        F.col("split").alias("split_b"),
        F.col("naive_split").alias("naive_b"),
    )
    audit = (
        # split labels are O(docs): shuffle-hash, never broadcast
        pairs.join(sa.hint("shuffle_hash"), "doc_a")
        .join(sb.hint("shuffle_hash"), "doc_b")
        .groupBy(F.col("split_a").alias("split"))
        .agg(
            F.sum(
                F.when(F.col("split_a") != F.col("split_b"), 1).otherwise(0)
            ).cast("long").alias("safe_leaked_pairs"),
            F.sum(
                F.when(F.col("naive_a") != F.col("naive_b"), 1).otherwise(0)
            ).cast("long").alias("naive_leaked_pairs"),
        )
    )
    members = splits.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("cluster_id").alias("n_clusters"),
    )
    return members.join(audit, "split", "left").select(
        "split",
        "n_docs",
        "n_clusters",
        F.coalesce("safe_leaked_pairs", F.lit(0)).alias("safe_leaked_pairs"),
        F.coalesce("naive_leaked_pairs", F.lit(0)).alias("naive_leaked_pairs"),
    )


# ---------------------------------------------------------------------------
# Cross-language near-dup audit: translation / lang-id contamination signal
# ---------------------------------------------------------------------------
_XLANG_ORACLE = f"""
WITH {_minhash_sql(_CRAWL_UNION_SQL)},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
),
labeled AS (
  SELECT p.doc_a, p.doc_b,
         least(ca.lang, cb.lang) AS lang_lo,
         greatest(ca.lang, cb.lang) AS lang_hi
  FROM pairs p
  JOIN corpus ca ON ca.doc_id = p.doc_a
  JOIN corpus cb ON cb.doc_id = p.doc_b
)
SELECT lang_lo, lang_hi,
       (lang_lo <> lang_hi) AS cross_lang,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MIN(doc_a) AS example_doc_a,
       CAST(MIN(CASE WHEN doc_a = (SELECT MIN(doc_a) FROM labeled l2
                                   WHERE l2.lang_lo = labeled.lang_lo
                                     AND l2.lang_hi = labeled.lang_hi)
                     THEN doc_b END) AS BIGINT) AS example_doc_b
FROM labeled
GROUP BY lang_lo, lang_hi
"""


@query(
    "crosslang_neardup_pairs",
    oracle=_XLANG_ORACLE,
    tags=("dedup-clusters", "pairs-audit-tier", "lang-id", "audit", "corpus"),
)
def crosslang_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CROSS-LANGUAGE near-dup audit: break the verified near-dup
    pair set down by the (unordered) language-label pair of its
    endpoints. Same-language pairs are ordinary duplication;
    cross-language pairs are the interesting residue — either a
    translated/copied document (the multilingual-dedup problem MinHash
    on raw tokens partially sees) or a LANG-ID ERROR on one endpoint
    (near-identical text cannot honestly carry two languages), so this
    one table is simultaneously a contamination signal and a labeler
    audit. Each (lang, lang) cell carries a reproducible example pair
    (min doc_a, then min doc_b for that doc_a) for manual triage.

    Plan: the pair machinery is the dedup lane's banded equi-join
    (pair space never materialized); the two label joins are doc-level
    lookups on the clustered-doc subset; one small rollup keyed by the
    unordered lang pair. Exact counts; no floats anywhere past the
    Jaccard gate both engines share."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    langs = crawl_union(spark, sf_dir).select("doc_id", "lang")
    la = langs.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a")
    )
    lb = langs.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b")
    )
    labeled = (
        # doc-level label sides are O(docs): shuffle-hash, never broadcast
        # (sf1 vanilla-session OOM, see _lsh_verified_pairs)
        pairs.join(la.hint("shuffle_hash"), "doc_a")
        .join(lb.hint("shuffle_hash"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.least("lang_a", "lang_b").alias("lang_lo"),
            F.greatest("lang_a", "lang_b").alias("lang_hi"),
        )
        .localCheckpoint()
    )
    first_a = labeled.groupBy("lang_lo", "lang_hi").agg(
        F.min("doc_a").alias("example_doc_a"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    ex_b = (
        labeled.join(
            first_a.select(
                "lang_lo", "lang_hi", F.col("example_doc_a").alias("doc_a")
            ),
            ["lang_lo", "lang_hi", "doc_a"],
        )
        .groupBy("lang_lo", "lang_hi")
        .agg(F.min("doc_b").alias("example_doc_b"))
    )
    return (
        first_a.join(ex_b, ["lang_lo", "lang_hi"])
        .select(
            "lang_lo",
            "lang_hi",
            (F.col("lang_lo") != F.col("lang_hi")).alias("cross_lang"),
            "n_pairs",
            "example_doc_a",
            "example_doc_b",
        )
    )
