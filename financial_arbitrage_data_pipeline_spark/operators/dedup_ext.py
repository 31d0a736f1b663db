"""Near-dup graph BFS and MOSS winnowing — dedup-family extensions.

- ``dup_graph_bfs_distance`` — multi-source BFS over the LSH-verified
  near-dup graph: hop distance from a labeled seed set, the provenance
  question ("how many dedup steps from a known-bad doc?") that CC /
  PageRank / triangles / LPA / k-core don't answer. Bounded-round
  iterative join, the O(diameter) pattern the engine's dedup_clusters
  already pins.
- ``winnowing_fingerprints`` — the MOSS winnowing fingerprint (Schleimer,
  Wilkerson, Aiken, SIGMOD 2003): k-gram rolling hashes, then within
  every window of w consecutive hashes select the leftmost minimum. The
  guarantee: any match of length >= w+k-1 shares a fingerprint, with
  density ~2/(w+1) — the position-aware substring-dedup signature next
  to the set-based MinHash and the bit-based SimHash.

Both reuse the dedup module's corpus and verified-pair machinery so the
graph/corpus is identical across the whole dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from .dedup import _CRAWL_UNION_SQL, _lsh_verified_pairs, _lsh_verified_pairs_shared, _minhash_sql, crawl_union

# ---------------------------------------------------------------------------
# Multi-source BFS over the near-dup graph
# ---------------------------------------------------------------------------
_BFS_ROUNDS = 4
_SEED_MOD = 97

_BFS_ORACLE = f"""
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
nodes AS (SELECT doc_id FROM ({_CRAWL_UNION_SQL})),
bfs AS (
  SELECT doc_id, 0 AS dist FROM nodes WHERE doc_id % {_SEED_MOD} = 0
  UNION
  SELECT e.dst AS doc_id, b.dist + 1 AS dist
  FROM bfs b JOIN edges e ON e.src = b.doc_id
  WHERE b.dist < {_BFS_ROUNDS}
)
SELECT doc_id, CAST(MIN(dist) AS BIGINT) AS dist
FROM bfs GROUP BY doc_id
"""


@query("dup_graph_bfs_distance", oracle=_BFS_ORACLE, tags=("dedup-graph", "iterative"))
def dup_graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS DISTANCE over the LSH-verified near-dup graph:
    hop count from the nearest labeled seed (doc_id % 97 == 0 — stand-in
    for a known-contaminated / known-pirated list), bounded at 4 rounds.
    The provenance readout contamination audits need: dist 1 is a direct
    near-dup of a flagged doc, dist 2 a near-dup of a near-dup, etc. —
    CC says only "same blob", PageRank only "central"; BFS says HOW FAR.

    Plan: the verified pair table is localCheckpointed ONCE (the LSH
    pipeline never re-executes across rounds — the dedup_clusters
    discipline), then each round is frontier ⋈ edges → distinct →
    anti-join vs settled, with a localCheckpoint cutting the lineage.
    Frontier-sized work per round, O(diameter ≤ 4) rounds; at 100 TB
    each round is one shuffle on doc_id keyed by the frontier, never the
    corpus. Unreached docs are absent (their distance is > 4), so output
    is reachable-set-sized. The oracle unrolls the same search as a
    recursive CTE with MIN(dist)."""
    pairs = _lsh_verified_pairs_shared(spark, sf_dir)
    edges = pairs.selectExpr("doc_a as src", "doc_b as dst").unionByName(
        pairs.selectExpr("doc_b as src", "doc_a as dst")
    )
    nodes = crawl_union(spark, sf_dir).select("doc_id")
    settled = (
        nodes.filter(F.col("doc_id") % _SEED_MOD == 0)
        .select("doc_id", F.lit(0).cast("long").alias("dist"))
        .localCheckpoint()
    )
    frontier = settled.select("doc_id")
    for r in range(1, _BFS_ROUNDS + 1):
        nxt = (
            frontier.join(edges, frontier["doc_id"] == edges["src"])
            .select(edges["dst"].alias("doc_id"))
            .distinct()
            .join(settled, "doc_id", "left_anti")
            .select("doc_id", F.lit(r).cast("long").alias("dist"))
            .localCheckpoint()
        )
        settled = settled.unionByName(nxt).localCheckpoint()
        frontier = nxt.select("doc_id")
    return settled


# ---------------------------------------------------------------------------
# MOSS winnowing fingerprints
# ---------------------------------------------------------------------------
_WIN_K = 5  # k-gram length (chars)
_WIN_W = 4  # winnowing window (grams)
_WIN_MOD = 1_000_000_007

_WINNOW_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         list_transform(string_split_regex(text, ''),
                        ch -> CAST(ascii(ch) AS BIGINT)) AS codes
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(codes) >= {_WIN_K}
              THEN list_transform(range(1, len(codes) - {_WIN_K} + 2),
                     i -> list_reduce(
                            list_prepend(CAST(0 AS BIGINT),
                                         list_slice(codes, i, i + {_WIN_K} - 1)),
                            (acc, x) -> (acc * 131 + x) % {_WIN_MOD}))
              ELSE [] END AS grams
  FROM c
),
s AS (
  SELECT doc_id, grams,
         CASE WHEN len(grams) >= {_WIN_W}
              THEN list_distinct(list_transform(
                     range(1, len(grams) - {_WIN_W} + 2),
                     j -> j - 1 + list_position(
                            list_slice(grams, j, j + {_WIN_W} - 1),
                            list_min(list_slice(grams, j, j + {_WIN_W} - 1)))))
              ELSE [] END AS fps
  FROM g
)
SELECT doc_id,
       CAST(len(grams) AS BIGINT) AS n_grams,
       CAST(GREATEST(len(grams) - {_WIN_W} + 1, 0) AS BIGINT) AS n_windows,
       CAST(len(fps) AS BIGINT) AS n_fingerprints,
       CAST(COALESCE(list_sum(list_transform(fps, ix -> grams[ix])), 0)
            AS BIGINT) AS fp_hash_sum,
       CAST(COALESCE(list_min(list_transform(fps, ix -> grams[ix])),
                     -1) AS BIGINT) AS fp_hash_min
FROM s
"""


@query("winnowing_fingerprints", oracle=_WINNOW_ORACLE, tags=("dedup", "text-fingerprint"))
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS WINNOWING (Schleimer/Wilkerson/Aiken 2003) per document:
    5-gram rolling hashes, then every window of 4 consecutive hashes
    selects its LEFTMOST MINIMUM; the distinct selected positions are
    the fingerprint set. Guarantee: any two docs sharing a substring of
    length >= w+k-1 = 8 share at least one fingerprint, at ~2/(w+1)
    density — position-aware substring dedup between the set-based
    MinHash and the full suffix-array build, and the standard
    plagiarism/mirror detector. Emitted per doc: gram/window counts,
    fingerprint count, and integer sum/min of selected hashes (the
    value-hash the oracle pins covers every selected position).

    Plan: entirely IN-ROW — one projection of nested HOFs (char codes →
    gram-hash fold → window argmin via array_min + first-position →
    array_distinct), zero shuffles, zero UDFs; per-doc cost O(L·k +
    windows·w). At 100 TB this is embarrassingly parallel scan work and
    whole-stage-codegen eligible; the shuffle-bearing consumer (joining
    fingerprints across docs) is the existing banded-join family. Docs
    shorter than k+w-1 grams degrade exactly as documented: no windows →
    no fingerprints (fp_hash_min = -1 sentinel)."""
    docs = load_table(spark, sf_dir, "documents")
    codes = F.transform(F.split("text", ""), lambda ch: F.ascii(ch).cast("long"))
    d = docs.select("doc_id", codes.alias("codes"))
    n_grams = F.greatest(F.size("codes") - _WIN_K + 1, F.lit(0))
    gram_at = lambda i: F.aggregate(  # noqa: E731
        F.slice("codes", i, _WIN_K),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 131 + x) % _WIN_MOD,
    )
    g = d.select(
        "doc_id",
        F.when(
            F.size("codes") >= _WIN_K,
            F.transform(F.sequence(F.lit(1), n_grams), lambda i: gram_at(i)),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("grams"),
    )
    n_windows = F.greatest(F.size("grams") - _WIN_W + 1, F.lit(0))
    win = lambda j: F.slice("grams", j, _WIN_W)  # noqa: E731
    s = g.select(
        "doc_id",
        "grams",
        F.when(
            F.size("grams") >= _WIN_W,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n_windows),
                    lambda j: j - 1 + F.array_position(win(j), F.array_min(win(j))),
                )
            ),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("fps"),
    )
    sel_hashes = F.transform(
        F.col("fps"), lambda ix: F.element_at("grams", ix.cast("int"))
    )
    return s.select(
        "doc_id",
        F.size("grams").cast("long").alias("n_grams"),
        F.greatest(F.size("grams") - _WIN_W + 1, F.lit(0))
        .cast("long")
        .alias("n_windows"),
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.coalesce(
            F.aggregate(sel_hashes, F.lit(0).cast("long"), lambda a, x: a + x),
            F.lit(0),
        )
        .cast("long")
        .alias("fp_hash_sum"),
        F.coalesce(F.array_min(sel_hashes), F.lit(-1)).cast("long").alias(
            "fp_hash_min"
        ),
    )
