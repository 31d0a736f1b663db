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
from .dedup import _CRAWL_UNION_SQL, _lsh_verified_pairs, _minhash_sql, connected_components, crawl_union

_BESTQ_ORACLE = f"""
WITH RECURSIVE {_minhash_sql(_CRAWL_UNION_SQL)},
pairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sh_sizes za ON za.doc_id = i.doc_a
  JOIN sh_sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.5
),
edges AS (
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
    pairs = _lsh_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
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
