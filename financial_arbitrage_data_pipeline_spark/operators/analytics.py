"""Analytics shapes: reshaping (pivot/unpivot), cohort retention,
exact distribution statistics (correlation moments, equi-width
histograms, cumulative distribution), and a corpus inverted index.

These extend the reference's reporting surface (the per-pair performance
rollups of `database/postgres/writer.py:409-468` and the ETL summaries of
`etl/query.py`) with the wide↔long reshapes and distribution sweeps an
analyst would run over the landed data at warehouse scale.

Exactness discipline: every statistic that accumulates is computed over
integers/decimals (cents, counts, integer moments) so results are
partition-order independent — see functions/core.py. Floats appear only
as a final single division/cast, mirrored exactly in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import money, ns_to_us
from ..plans.registry import query
from ..sources.tables import load_table

# One week in microseconds; precomputed (DuckDB integer literals are INT32,
# and 7*86400*1000000 would overflow an INT32 multiply there).
WEEK_US = 7 * 86_400 * 1_000_000


def _idiv(col: Column, n: int) -> Column:
    """Exact integer division for non-negative longs (subtract the
    remainder first so the float division is exact, same trick as
    ns_to_us)."""
    return ((col - col % F.lit(n)) / F.lit(n)).cast("long")


# ---------------------------------------------------------------------------
# Pivot: long → wide. The status-by-priority count matrix.
# ---------------------------------------------------------------------------
@query(
    "status_priority_pivot",
    oracle="""
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
FROM orders
GROUP BY o_orderpriority
""",
    tags=("A9", "pivot"),
)
def status_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`groupBy().pivot(values=...)` with the pivot values DECLARED — an
    undeclared pivot runs an extra distinct-scan job just to discover the
    columns, which at 100 TB is a full pass over the fact table. Declared
    values keep it to one shuffle with map-side partial counts (Catalyst
    rewrites pivot-count into exactly the oracle's conditional
    aggregates). Missing cells surface as NULL from pivot; coalesce to 0
    to match COUNT's no-match result."""
    wide = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return wide.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).alias(f"cnt_{s.lower()}")
            for s in ("F", "O", "P")
        ],
    )


# ---------------------------------------------------------------------------
# Unpivot: wide → long. Per-priority money measures as (measure, value).
# ---------------------------------------------------------------------------
@query(
    "priority_measures_unpivot",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
         CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
         CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'total_price' AS measure, total_price AS value FROM wide
UNION ALL
SELECT o_orderpriority, 'max_price' AS measure, max_price AS value FROM wide
UNION ALL
SELECT o_orderpriority, 'min_price' AS measure, min_price AS value FROM wide
""",
    tags=("A1", "unpivot"),
)
def priority_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`DataFrame.unpivot` (SQL STACK) — the wide→long reshape for
    metric-per-row sinks (the reference's line-protocol export is exactly
    this: one measurement row per field, `database/influx/writer.py`).
    Scale notes: unpivot is a per-row flatMap — no shuffle beyond the
    5-group aggregate feeding it; the long form multiplies rows by the
    measure count, so project only the measures you need BEFORE
    unpivoting."""
    wide = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(money("o_totalprice")).cast("double").alias("total_price"),
            F.max(money("o_totalprice")).cast("double").alias("max_price"),
            F.min(money("o_totalprice")).cast("double").alias("min_price"),
        )
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["total_price", "max_price", "min_price"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Cohort retention: first-seen week × weeks-since, distinct users.
# ---------------------------------------------------------------------------
@query(
    "weekly_cohort_retention",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) // {WEEK_US} AS week FROM events
),
cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id
)
SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
       COUNT(DISTINCT e.user_id) AS active_users
FROM e JOIN cohorts c ON e.user_id = c.user_id
GROUP BY c.cohort_week, e.week - c.cohort_week
""",
    tags=("A4", "A8", "cohort"),
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: assign each user to the week of their
    first event, then count distinct users per (cohort, offset). Scale
    notes: both the MIN-per-user and the join back are keyed on user_id,
    so one hash partitioning serves both (AQE reuses the exchange); the
    final COUNT(DISTINCT) re-shuffles on the 2-column group key — at
    100 TB swap in approx_count_distinct to keep it one pass. Weeks are
    integer µs-epoch buckets (ts div 1000 discipline — events.parquet is
    TIMESTAMP(NANOS), read as ns-longs Spark-side, µs in DuckDB)."""
    e = (
        load_table(spark, sf_dir, "events")
        .select("user_id", _idiv(ns_to_us("ts"), WEEK_US).alias("week"))
    )
    cohorts = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        e.join(cohorts, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Exact correlation/regression moments (integer arithmetic end-to-end).
# ---------------------------------------------------------------------------
@query(
    "qty_price_corr_moments",
    oracle="""
WITH t AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM t GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(n * sxy - sx * sy AS DOUBLE) AS cov_num,
       CAST(n * sxx - sx * sx AS DOUBLE) AS varx_num,
       CAST(n * syy - sy * sy AS DOUBLE) AS vary_num
FROM m
""",
    tags=("A1", "statistics"),
)
def qty_price_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation/regression moments (n·Σxy − ΣxΣy etc.) computed in
    exact integer arithmetic: quantity as-is, price in cents, per-row
    products summed as DECIMAL(38,0) (Σy² reaches ~2e19 at sf0.1 — past
    int64 — so the SUM itself must be wide; DuckDB uses HUGEINT for the
    same reason). Built-in corr() accumulates doubles and is
    partition-order dependent — useless for reproducible pipelines.
    Scale notes: one map-side-combinable aggregate, 3 groups; the five
    sums travel as one partial state per partition. Pearson r or an OLS
    slope is a driver-side divide of these moments."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = (money("l_extendedprice") * 100).cast("bigint")
    t = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    d18 = lambda c: c.cast("decimal(18,0)")  # noqa: E731 — per-row exact widen
    m = t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d18(F.col("x"))).alias("sx"),
        F.sum(d18(F.col("y"))).alias("sy"),
        F.sum(d18(F.col("x")) * d18(F.col("y"))).alias("sxy"),
        F.sum(d18(F.col("x")) * d18(F.col("x"))).alias("sxx"),
        F.sum(d18(F.col("y")) * d18(F.col("y"))).alias("syy"),
    )
    n38 = F.col("n").cast("decimal(38,0)")
    # Final cast to double (the exact integer moment is correctly rounded
    # identically by both engines) — a wide-decimal column would come back
    # from DuckDB's pandas bridge as float64 anyway, mismatching Spark's
    # Decimal objects in the driver's value hash.
    dbl = lambda c: c.cast("double")  # noqa: E731
    return m.select(
        "l_returnflag",
        "n",
        dbl(n38 * F.col("sxy") - F.col("sx") * F.col("sy")).alias("cov_num"),
        dbl(n38 * F.col("sxx") - F.col("sx") * F.col("sx")).alias("varx_num"),
        dbl(n38 * F.col("syy") - F.col("sy") * F.col("sy")).alias("vary_num"),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram over order value ($50k buckets, exact cents).
# ---------------------------------------------------------------------------
@query(
    "order_value_histogram",
    oracle="""
WITH t AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
)
SELECT cents // 5000000 AS bucket,
       (cents // 5000000) * 50000 AS lo_dollars,
       COUNT(*) AS n,
       CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) / 100 AS sum_dollars
FROM t GROUP BY cents // 5000000
""",
    tags=("A1", "histogram"),
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram on exact cents (double → decimal →
    integer cents, so bucket edges are unambiguous — float width_bucket
    puts edge values in different buckets depending on rounding). Scale
    notes: bucket count is data-independent (~10 here), so the aggregate
    collapses map-side to next-to-nothing; this is the shape to prefer
    over sort-based quantiles when the bucket scheme can be fixed
    up-front."""
    cents = (money("o_totalprice") * 100).cast("bigint")
    t = load_table(spark, sf_dir, "orders").select(cents.alias("cents"))
    bucket = _idiv(F.col("cents"), 5_000_000)
    return (
        t.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("cents").cast("decimal(18,0)")).cast("double") / 100).alias(
                "sum_dollars"
            ),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50_000).alias("lo_dollars"),
            "n",
            "sum_dollars",
        )
    )


# ---------------------------------------------------------------------------
# Cumulative distribution within segment (cume_dist window).
# ---------------------------------------------------------------------------
@query(
    "acctbal_cume_dist",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal) AS cume,
       CAST(CAST(c_acctbal AS DECIMAL(12,2))
            - MAX(CAST(c_acctbal AS DECIMAL(12,2)))
                OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS gap_to_top
FROM customer
""",
    tags=("W2", "A8", "distribution"),
)
def acctbal_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment cumulative distribution: cume_dist (tie-safe — peers
    share rank-of-last-peer / n, an exact ratio of ints → one float
    divide) plus the exact-decimal gap to the segment maximum. Scale
    notes: one shuffle on the segment key; within a partition the sort is
    the only cost. Skewed segment sizes are the hazard at 100 TB — if one
    segment dominates, pre-aggregate or switch the distribution question
    to the fixed-bucket histogram (order_value_histogram), which needs no
    per-key sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    wmax = Window.partitionBy("c_mktsegment")
    bal = money("c_acctbal")
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.cume_dist().over(w).alias("cume"),
        (bal - F.max(bal).over(wmax)).cast("double").alias("gap_to_top"),
    )


# ---------------------------------------------------------------------------
# Inverted index: term → document frequency / total frequency / first doc.
# ---------------------------------------------------------------------------
@query(
    "inverted_index_terms",
    oracle="""
SELECT term,
       COUNT(DISTINCT doc_id) AS df,
       COUNT(*) AS tf,
       MIN(doc_id) AS first_doc
FROM (
  SELECT d.doc_id, u.term
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS u(term)
)
WHERE length(term) >= 4
GROUP BY term
HAVING COUNT(DISTINCT doc_id) >= 5
ORDER BY df DESC, term
LIMIT 200
""",
    tags=("text", "A4", "W2"),
)
def inverted_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics for a corpus inverted index: explode terms,
    aggregate df (distinct docs) / tf / first posting per term. Scale
    notes: the explode is a flatMap (no shuffle); the length filter drops
    stop-shaped tokens BEFORE the exchange; df uses a two-level distinct
    shuffle keyed on (term, doc_id) then term — at 100 TB the first level
    is the big one, and it's exactly the layout a real posting-list build
    needs anyway (term-partitioned). Top-200 by df runs as
    TakeOrderedAndProject with the unique term as tie-break."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.length("term") >= 4)
    return (
        toks.groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("df") >= 5)
        .orderBy(F.col("df").desc(), "term")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS (the two one-dimension rollups + grand total,
# without CUBE's full 2^n expansion).
# ---------------------------------------------------------------------------
@query(
    "brand_type_grouping_sets",
    oracle="""
SELECT p_brand, p_type,
       CAST(GROUPING(p_brand, p_type) AS BIGINT) AS gid,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_retail
FROM part
GROUP BY GROUPING SETS ((p_brand), (p_type), ())
""",
    tags=("A9", "grouping-sets"),
)
def brand_type_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-picked grouping sets — per-brand, per-type, grand total —
    via `DataFrame.groupingSets` (Spark 4 API). Unlike CUBE this expands
    each row to exactly the 3 requested sets (not 2^n), so the pre-shuffle
    blow-up is bounded by the list you wrote. gid disambiguates rolled-up
    NULLs, same bit order as the oracle's GROUPING(). Scale notes: one
    scan, one shuffle; per-set cardinality stays dimension-sized."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.groupingSets([["p_brand"], ["p_type"], []], "p_brand", "p_type")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum(money("p_retailprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_retail"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Pivot over the big event stream: weekly activity matrix by event type.
# ---------------------------------------------------------------------------
@query(
    "event_type_week_pivot",
    oracle=f"""
WITH e AS (
  SELECT epoch_us(ts) // {WEEK_US} AS week, event_type FROM events
)
SELECT week,
       COUNT(CASE WHEN event_type = 'click'    THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'error'    THEN 1 END) AS n_error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup'   THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'view'     THEN 1 END) AS n_view
FROM e GROUP BY week
""",
    tags=("A6", "pivot"),
)
def event_type_week_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The activity-matrix reshape on the fact stream: µs-epoch week
    buckets (ts div 1000 discipline for the NANOS column) × declared
    event-type pivot. Scale notes: declared values avoid the discovery
    scan; counts partial-aggregate map-side so the shuffle carries ~5
    longs per (partition, week); at 100 TB this is the cheapest possible
    wide summary of a stream table."""
    e = load_table(spark, sf_dir, "events").select(
        _idiv(ns_to_us("ts"), WEEK_US).alias("week"), "event_type"
    )
    types = ["click", "error", "purchase", "signup", "view"]
    wide = e.groupBy("week").pivot("event_type", types).count()
    return wide.select(
        "week",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    )


# ---------------------------------------------------------------------------
# Map functions: build → merge → invert (the §2.8 map family end-to-end).
# ---------------------------------------------------------------------------
@query(
    "user_activity_map_invert",
    oracle="""
WITH per AS (
  SELECT user_id, event_type AS map_key, COUNT(*) AS v
  FROM events GROUP BY user_id, event_type
),
tot AS (
  SELECT user_id, 'all' AS map_key, COUNT(*) AS v
  FROM events GROUP BY user_id
),
u AS (SELECT * FROM per UNION ALL SELECT * FROM tot)
SELECT map_key,
       COUNT(*) AS n_users,
       CAST(SUM(v) AS BIGINT) AS total_events
FROM u GROUP BY map_key
""",
    tags=("map-functions", "A4"),
)
def user_activity_map_invert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's per-key dict workflow (merge with `update()`,
    invert by re-keying — `opportunity_scanner.py:120,191,297`) as engine
    map columns: per-user activity map via map_from_entries(collect_list),
    merged with a computed entry via map_concat (the dict-merge), then
    EXPLODED back to rows and re-aggregated by map key (the invert).
    Scale notes: per-user maps are bounded (≤5 event types + 1), so the
    collect_list is safe; the explode is a flatMap with no shuffle of its
    own; both aggregations key cleanly (user_id, then map_key). At 100 TB
    prefer keeping data LONG until presentation — this query is the proof
    that the map detour round-trips losslessly."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("v"))
    per_user = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "v"))).alias("m"),
        F.sum("v").alias("tot"),
    )
    merged = per_user.select(
        "user_id",
        F.map_concat("m", F.create_map(F.lit("all"), F.col("tot"))).alias("m"),
    )
    inverted = merged.select("user_id", F.explode("m").alias("map_key", "v"))
    return inverted.groupBy("map_key").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("v").alias("total_events"),
    )


# ---------------------------------------------------------------------------
# Per-group exact median (nearest-rank), the grouped percentile shape.
# ---------------------------------------------------------------------------
def grouped_lower_median(
    df: DataFrame, key: str, value: str, tie: str
) -> DataFrame:
    """Exact lower median per group by nearest rank: row_number over
    (value, tie) vs the explicit `(n+1) div 2` rank. Returns one row per
    key: (key, n, median). Shared by segment_median_acctbal and its
    Hypothesis property test so the shipped formula is the tested one."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(value, tie)
    wn = Window.partitionBy(key)
    ranked = df.select(
        key,
        value,
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    half = (((F.col("n") + 1) - (F.col("n") + 1) % 2) / 2).cast("long")
    return ranked.groupBy(key).agg(
        F.max("n").alias("n"),
        F.max(F.when(F.col("rn") == half, F.col(value))).alias("median"),
    )


@query(
    "segment_median_acctbal",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM customer
)
SELECT c_mktsegment,
       MAX(n) AS n_customers,
       MAX(CASE WHEN rn = (n + 1) // 2 THEN c_acctbal END) AS median_bal
FROM ranked
GROUP BY c_mktsegment
""",
    tags=("A8", "percentile"),
)
def segment_median_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median by nearest rank (lower median, explicit
    `(n+1) div 2` formula stated identically in both engines — built-in
    median()/percentile_cont interpolate and would re-open float drift).
    Scale notes: one shuffle on the segment key + a per-group sort; for
    100 TB-sized groups switch to approx_percentile (t-digest, one pass,
    map-side mergeable) and keep this exact form for the small-group
    tier — same query surface, documented swap."""
    out = grouped_lower_median(
        load_table(spark, sf_dir, "customer"), "c_mktsegment", "c_acctbal", "c_custkey"
    )
    return out.select(
        "c_mktsegment",
        F.col("n").alias("n_customers"),
        F.col("median").alias("median_bal"),
    )


# ---------------------------------------------------------------------------
# LIKE-pattern scan (§2.8 string family) with pushdown-visible predicates.
# ---------------------------------------------------------------------------
@query(
    "promo_bolt_parts_like",
    oracle="""
SELECT p_brand,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_retail
FROM part
WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%bolt%'
GROUP BY p_brand
""",
    tags=("F3", "string-like"),
)
def promo_bolt_parts_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's LIKE scan (`database/postgres/writer.py:489`) as a
    declarative predicate pair: a prefix pattern and an infix pattern.
    Scale notes: Catalyst turns `LIKE 'PROMO%'` into StringStartsWith and
    `LIKE '%bolt%'` into StringContains, BOTH pushed into the parquet
    reader (see the plan guard) — the row groups whose min/max rule out
    the prefix never decompress. Only leading-wildcard-with-suffix
    patterns defeat pushdown."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("PROMO%") & F.col("p_name").like("%bolt%"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum(money("p_retailprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_retail"
            ),
        )
    )


# ---------------------------------------------------------------------------
# ISO-8601 format/parse round-trip (§2.8 date/time family, the reference's
# strftime('%Y-%m-%dT%H:%M:%SZ') export + ISO re-parse).
# ---------------------------------------------------------------------------
@query(
    "iso_export_roundtrip",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts,
       CAST(strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'),
                     '%Y-%m-%dT%H:%M:%SZ') AS TIMESTAMP) AS parsed_back
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-06-01 00:00:00'
  AND o_orderdate < TIMESTAMP '2000-06-08 00:00:00'
""",
    tags=("scalar-datetime", "P10"),
)
def iso_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference serializes timestamps as `strftime('%Y-%m-%dT%H:%M:%SZ')`
    on export and re-parses ISO strings on query entry
    (`etl/query.py:112-131`). Engine form: date_format → to_timestamp,
    proven lossless for second-precision data by emitting both the string
    and the round-tripped timestamp. Scale notes: pure per-row projection
    inside codegen — zero shuffles; the week filter pushes to the scan, so
    the export only reads the slice it ships."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-06-08").cast("timestamp"))
    )
    fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    iso = F.date_format("o_orderdate", fmt)
    return o.select(
        "o_orderkey",
        iso.alias("iso_ts"),
        F.to_timestamp(iso, fmt).alias("parsed_back"),
    )


# ---------------------------------------------------------------------------
# SCD2 history build: change rows → effective-dated validity ranges.
# ---------------------------------------------------------------------------
@query(
    "customer_status_scd2",
    oracle="""
WITH h AS (
  SELECT o_custkey,
         o_orderstatus,
         o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS valid_to,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS version
  FROM orders
)
SELECT o_custkey, o_orderstatus, valid_from, valid_to, version,
       CAST(valid_to IS NULL AS BOOLEAN) AS is_current
FROM h
WHERE o_custkey % 20 = 0
""",
    tags=("W3", "scd2", "temporal"),
)
def customer_status_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build: each change event becomes
    a versioned row whose validity closes at the NEXT change (LEAD), the
    open row flagged current — the standard way to keep queryable history
    of the reference's mutable Postgres rows (pair status, ticket fills)
    in an append-only lake. Scale notes: one shuffle on the business key,
    LEAD and ROW_NUMBER share the same window sort; the key-sampled
    output filter pushes to the scan. Rebuilds are idempotent — the same
    input always yields the same versions, so the table can be
    incrementally recomputed per partition."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    return o.select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


# ---------------------------------------------------------------------------
# Ratio-to-report: share-of-parent via window sums (no self-join).
# ---------------------------------------------------------------------------
@query(
    "nation_revenue_share",
    oracle="""
WITH rev AS (
  SELECT n.n_name AS nation, r.r_name AS region,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name, r.r_name
)
SELECT nation, region,
       CAST(rev_dec AS DOUBLE) AS revenue,
       CAST(rev_dec AS DOUBLE)
         / CAST(SUM(rev_dec) OVER (PARTITION BY region) AS DOUBLE) AS region_share,
       CAST(rev_dec AS DOUBLE)
         / CAST(SUM(rev_dec) OVER () AS DOUBLE) AS global_share
FROM rev
""",
    tags=("A1", "W2", "ratio-to-report"),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent at two levels (region, global) via window sums
    over the AGGREGATED rows — the ratio-to-report shape. Scale notes:
    the windows run over #nations rows (dimension-sized), so the
    unpartitioned global window is safe here; never put an unpartitioned
    window over fact rows — aggregate first, window after. Dimension
    joins broadcast. Exactness: revenue stays DECIMAL through the window
    sums (a double window-sum accumulates in engine-specific order) and
    is cast to double only for the final divisions, so both shares are
    bit-stable."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    from pyspark.sql import Window

    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(money("o_totalprice")).alias("rev_dec"))
    )
    revenue = F.col("rev_dec").cast("double")
    return rev.select(
        "nation",
        "region",
        revenue.alias("revenue"),
        (
            revenue
            / F.sum("rev_dec").over(Window.partitionBy("region")).cast("double")
        ).alias("region_share"),
        (
            revenue / F.sum("rev_dec").over(Window.partitionBy()).cast("double")
        ).alias("global_share"),
    )


# ---------------------------------------------------------------------------
# Point-in-time (as-of) lookup against the SCD2 dimension — the query
# side of the type-2 history customer_status_scd2 builds.
# ---------------------------------------------------------------------------
@query(
    "order_status_asof_lookup",
    oracle="""
WITH h AS (
  SELECT o_custkey,
         o_orderstatus,
         o_orderdate AS valid_from,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS version
  FROM orders WHERE o_custkey % 20 = 0
),
p AS (
  SELECT o_orderkey, o_custkey, o_orderdate - INTERVAL 1 DAY AS probe_t
  FROM orders WHERE o_custkey % 20 = 0
),
sel AS (
  SELECT p.o_orderkey, MAX(h.version) AS v
  FROM p JOIN h ON h.o_custkey = p.o_custkey AND h.valid_from <= p.probe_t
  GROUP BY p.o_orderkey
)
SELECT p.o_orderkey, p.o_custkey,
       h.o_orderstatus AS status_asof,
       h.version AS version_asof
FROM p
LEFT JOIN sel ON sel.o_orderkey = p.o_orderkey
LEFT JOIN h ON h.o_custkey = p.o_custkey AND h.version = sel.v
""",
    tags=("scd2", "temporal", "asof"),
)
def order_status_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every order of the tracked customers: the customer's status
    VERSION in force the day before that order — the point-in-time
    dimension lookup every warehouse runs against a type-2 history.
    Spark-first it is the union+window as-of idiom (the same merge-not-
    probe discipline as asof_quote_join): history rows and probe rows
    union into one stream, one window per business key ordered by
    (time, kind, version) carries the last-seen status forward, probes
    read it — ONE sort-shuffle, no range join, no per-probe scan. Ties
    (several versions effective the same day) resolve to the highest
    version deterministically; the oracle states the same rule as
    MAX(version) among valid_from <= probe date."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    w_v = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    h = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("t"),
        F.col("o_orderstatus").alias("status"),
        F.row_number().over(w_v).alias("version"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    p = o.select(
        "o_custkey",
        (F.col("o_orderdate") - F.expr("INTERVAL 1 DAY")).alias("t"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("int").alias("version"),
        F.lit(1).alias("kind"),
        "o_orderkey",
    )
    u = h.unionByName(p)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("t", "kind", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "o_custkey",
        "o_orderkey",
        "kind",
        F.last("status", ignorenulls=True).over(w).alias("status_asof"),
        F.last("version", ignorenulls=True).over(w).alias("version_asof"),
    )
    return carried.filter(F.col("kind") == 1).select(
        "o_orderkey",
        "o_custkey",
        "status_asof",
        F.col("version_asof").cast("long").alias("version_asof"),
    )


# ---------------------------------------------------------------------------
# Shuffle-key skew diagnostics: the measurement that decides whether a
# key needs salting / AQE skew-join handling BEFORE the expensive join
# runs — the operational prelude to functions/salting.py.
# ---------------------------------------------------------------------------
@query(
    "key_skew_report",
    oracle="""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM c
)
SELECT c.user_id, c.cnt,
       CAST(c.cnt AS DOUBLE) / t.total AS share,
       CAST(c.cnt AS DOUBLE) * t.n_keys / t.total AS skew_factor,
       CAST(ROW_NUMBER() OVER (ORDER BY c.cnt DESC, c.user_id) AS BIGINT) AS rank
FROM c CROSS JOIN tot t
QUALIFY ROW_NUMBER() OVER (ORDER BY c.cnt DESC, c.user_id) <= 10
""",
    tags=("skew", "diagnostics", "A9"),
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest shuffle keys with their share of the table and
    skew factor (count ÷ perfectly-uniform count) — the report that
    tells an operator whether the next join on this key needs salting
    (functions/salting.py, oracle-proven output-equivalent by
    skew_salted_supplier_rollup) or can rely on AQE skew splitting
    (split trigger plan-pinned by tests/test_salting.py::
    test_aqe_skew_split_triggers_on_skewed_join), and by how much. One count aggregation over the fact table; the totals are
    a 1-row broadcast bound (the allowlisted tiny-BNLJ shape); the
    top-10 runs as WindowGroupLimit, never a full sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = c.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    w = Window.orderBy(F.col("cnt").desc(), "user_id")
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
            (
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("total")
            ).alias("skew_factor"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 10)
    )


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance) entity matching with blocking — the ER join family
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 2


@query(
    "fuzzy_name_match",
    oracle=f"""
WITH names AS (
  SELECT p_name,
         string_split(p_name, ' ')[2] AS blk,
         CAST(COUNT(*) AS BIGINT) AS n_parts
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a,
       b.p_name AS name_b,
       a.blk AS block_key,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance,
       a.n_parts AS n_parts_a,
       b.n_parts AS n_parts_b
FROM names a
JOIN names b
  ON a.blk = b.blk AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
""",
    tags=("entity-resolution", "fuzzy-join"),
)
def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join: part names within Levenshtein
    distance {_FUZZY_MAX_DIST} of each other, candidate-generated by a
    BLOCKING key (the type word) so the comparison space is
    per-block-quadratic in DISTINCT names — never all-pairs over rows.
    This is the standard ER pipeline shape (block -> compare -> match):
    dedupe to the name level first (carrying per-name row counts for
    the merge step), equi-join on the block key, then the expensive
    edit-distance predicate runs only inside blocks. Both engines
    implement classic DP Levenshtein, so the distance — and therefore
    the match set — is exactly comparable. At 100 TB: names table is
    vocabulary-sized (distinct entities, not rows); blocks bound the
    quadratic term; swapping the block key for an LSH band generalizes
    this to the minhash candidate generator in dedup.py."""
    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .withColumn("blk", F.split("p_name", " ").getItem(1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("blk").alias("block_key"),
        F.col("n_parts").alias("n_parts_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("blk").alias("blk_b"),
        F.col("n_parts").alias("n_parts_b"),
    )
    return (
        a.join(
            b,
            (F.col("block_key") == F.col("blk_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .withColumn(
            "edit_distance",
            F.levenshtein("name_a", "name_b").cast("long"),
        )
        .filter(F.col("edit_distance") <= _FUZZY_MAX_DIST)
        .select(
            "name_a", "name_b", "block_key",
            "edit_distance", "n_parts_a", "n_parts_b",
        )
    )


# ---------------------------------------------------------------------------
# Inequality measure: per-region Gini coefficient of account balances
# ---------------------------------------------------------------------------


@query(
    "region_acctbal_gini",
    oracle="""
WITH c AS (
  SELECT n.n_regionkey AS region,
         CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS w,
         c_custkey
  FROM customer JOIN nation n ON n.n_nationkey = c_nationkey
),
r AS (
  SELECT region, w,
         ROW_NUMBER() OVER (PARTITION BY region ORDER BY w, c_custkey) AS i
  FROM c
),
s AS (
  SELECT region,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(w) AS BIGINT) AS total,
         CAST(SUM(i * w) AS BIGINT) AS rank_weighted
  FROM r GROUP BY region
)
SELECT region, n, total, rank_weighted,
       CAST(2 * rank_weighted - (n + 1) * total AS DOUBLE)
         / CAST(n * total AS DOUBLE) AS gini
FROM s
""",
    tags=("analytics-distribution", "gini"),
)
def region_acctbal_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region GINI coefficient of (shifted, non-negative) account
    balances — the inequality summary next to the deciles/median family:
    G = (2·Σ i·w_i − (n+1)·Σw) / (n·Σw) over rank-sorted weights. The
    rank-weighted sums are exact integers (one deterministic sort order:
    balance then custkey), the coefficient is one IEEE divide of two
    exact int64 products — no float accumulation. Balances are shifted
    by +1000.00 so the weight domain is non-negative (Gini's
    precondition; TPC-H balances go to -999.99). One region-keyed
    window sort + one aggregation."""
    c = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").select(
                    "n_nationkey", "n_regionkey"
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_regionkey").alias("region"),
            (F.expr("cast(round(c_acctbal * 100) as bigint)") + 100000).alias(
                "w"
            ),
            "c_custkey",
        )
    )
    from pyspark.sql import Window  # noqa: PLC0415

    win = Window.partitionBy("region").orderBy("w", "c_custkey")
    r = c.withColumn("i", F.row_number().over(win))
    s = r.groupBy("region").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("w")).cast("long").alias("rank_weighted"),
    )
    return s.select(
        "region", "n", "total", "rank_weighted",
        (
            (2 * F.col("rank_weighted") - (F.col("n") + 1) * F.col("total")).cast(
                "double"
            )
            / (F.col("n") * F.col("total")).cast("double")
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily order count (integer moments)
# ---------------------------------------------------------------------------


@query(
    "daily_orders_autocorr",
    oracle="""
WITH d AS (
  SELECT o_orderdate AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY o_orderdate
),
l AS (
  SELECT day, x,
         LAG(x) OVER (ORDER BY day) AS xp
  FROM d
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(xp) AS BIGINT) AS sy,
         CAST(SUM(x * xp) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(xp * xp) AS BIGINT) AS syy
  FROM l WHERE xp IS NOT NULL
)
SELECT n, sx, sy, sxy,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr_lag1
FROM m
""",
    tags=("timeseries", "autocorrelation"),
)
def daily_orders_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily order count — the
    is-there-weekly-memory probe a capacity planner runs before
    forecasting. Day counts and all five cross-moments are exact
    integers; the Pearson coefficient over (x_t, x_{t-1}) is the same
    fixed op sequence as qty_price_corr_moments (two sqrt, one divide),
    so it is bit-identical across engines. The LAG runs on the
    DAY-level series (one row per date — thousands of rows at any SF),
    so the unpartitioned window is bounded by the calendar, never the
    order table."""
    from pyspark.sql import Window  # noqa: PLC0415

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    l = d.withColumn("xp", F.lag("x").over(Window.orderBy("day"))).filter(
        F.col("xp").isNotNull()
    )
    m = l.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("xp").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("xp")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("xp") * F.col("xp")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        "n", "sx", "sy", "sxy", (num / den).alias("autocorr_lag1")
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto-dominance (multi-objective "best" — an operator class
# SQL engines lack natively)
# ---------------------------------------------------------------------------
@query(
    "pareto_parts_skyline",
    oracle="""
SELECT p.p_partkey,
       CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents,
       CAST(p.p_size AS BIGINT) AS size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE round(q.p_retailprice * 100) <= round(p.p_retailprice * 100)
    AND q.p_size >= p.p_size
    AND (round(q.p_retailprice * 100) < round(p.p_retailprice * 100)
         OR q.p_size > p.p_size)
)
""",
    tags=("skyline", "pareto", "W2"),
)
def pareto_parts_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKYLINE (Pareto front) of parts over (minimize price,
    maximize size): every part no other part beats on both axes — the
    multi-objective 'best' that no ORDER BY can express (Börzsönyi et
    al.'s skyline operator). The oracle states it as the quadratic
    NOT EXISTS dominance test; the engine runs the DISTRIBUTED
    two-phase algorithm:

    1. GRID PRUNE — bucket by $10 price bands; a part is dead if any
       strictly-cheaper band contains an equal-or-larger size, decided
       against a broadcast prefix-max table of one row per band. This
       eliminates ~everything (survivors ≲ #distinct sizes) with one
       narrow scan + a bands-sized broadcast join — the shape that
       holds at 100 TB.
    2. EXACT MERGE — the survivors (bounded by the skyline plus band-
       boundary strays, documented single-partition) run the classic
       sort-sweep: keep a row iff no strictly-cheaper survivor has size
       ≥ mine (RANGE-frame running max) and no same-price survivor has
       size > mine.

    Integer cents everywhere, deterministic ties (equal (price, size)
    pairs are mutually non-dominating and all kept)."""
    from pyspark.sql import Window

    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("cast(round(p_retailprice * 100) as bigint)").alias(
            "price_cents"
        ),
        F.col("p_size").cast("long").alias("size"),
    )
    band = (F.col("price_cents") / 1000).cast("long")
    banded = parts.withColumn("band", band)
    band_max = banded.groupBy("band").agg(F.max("size").alias("bmax"))
    w_pref = (
        Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    )
    # prefix over the ~10-row band table: tiny single-partition window
    prefix = band_max.select(
        "band", F.max("bmax").over(w_pref).alias("premax")
    )
    survivors = (
        banded.join(F.broadcast(prefix), "band")
        .filter(F.col("premax").isNull() | (F.col("premax") < F.col("size")))
        .drop("band", "premax")
    )
    # exact sweep over the pruned (skyline-sized) survivor set
    w_cheaper = Window.orderBy("price_cents").rangeBetween(
        Window.unboundedPreceding, -1
    )
    w_same = Window.partitionBy("price_cents")
    return (
        survivors.withColumn("m1", F.max("size").over(w_cheaper))
        .withColumn("m2", F.max("size").over(w_same))
        .filter(
            (F.col("m1").isNull() | (F.col("m1") < F.col("size")))
            & (F.col("size") == F.col("m2"))
        )
        .select("p_partkey", "price_cents", "size")
    )


# ---------------------------------------------------------------------------
# A/B experiment readout: Mann-Whitney U with exact integer rank algebra
# ---------------------------------------------------------------------------
_MW_A = "click"
_MW_B = "purchase"
_MW_SEGMENTS = 10

_MANN_WHITNEY_ORACLE = f"""
WITH s AS (
  SELECT user_id % {_MW_SEGMENTS} AS segment,
         CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('{_MW_A}', '{_MW_B}')
),
pv AS (
  SELECT segment, v,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(is_a) AS BIGINT) AS ca
  FROM s GROUP BY segment, v
),
cum AS (
  SELECT segment, v, c, ca,
         CAST(SUM(c) OVER (PARTITION BY segment ORDER BY v
                           ROWS UNBOUNDED PRECEDING) - c AS BIGINT) AS prior
  FROM pv
),
agg AS (
  SELECT segment,
         CAST(SUM(ca) AS BIGINT) AS na,
         CAST(SUM(c - ca) AS BIGINT) AS nb,
         CAST(SUM(ca * (2 * prior + c + 1)) AS BIGINT) AS r2a,
         CAST(SUM(c * c * c - c) AS BIGINT) AS ties
  FROM cum GROUP BY segment
)
SELECT segment, na, nb,
       r2a - na * (na + 1) AS u2,
       ties,
       (CAST(r2a - na * (na + 1) AS DOUBLE) / 2.0
        - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
       / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
              * ((CAST(na + nb AS DOUBLE) + 1.0)
                 - CAST(ties AS DOUBLE)
                   / (CAST(na + nb AS DOUBLE)
                      * (CAST(na + nb AS DOUBLE) - 1.0))))
         AS z_score
FROM agg
WHERE na > 0 AND nb > 0 AND na + nb > ties + 1
"""


@query("ab_test_mannwhitney", oracle=_MANN_WHITNEY_ORACLE, tags=("ab-test", "A2"))
def ab_test_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test per user segment: does the 'click' arm's
    value distribution stochastically dominate the 'purchase' arm's? The
    nonparametric two-sample test every experimentation platform runs
    when means are skew-fragile — here in EXACT integer rank algebra.

    The trick that keeps it hashable: with ties, midranks are
    half-integers, so the engine carries 2×(rank sum) instead — for a
    tied value block of size c starting after `prior` rows, each member
    holds midrank (2·prior + c + 1)/2, so the A-side block contributes
    ca·(2·prior + c + 1) to 2R_A, an exact int64. U then satisfies
    2U = 2R_A − na(na+1), and the tie-corrected normal approximation
    z = (U − na·nb/2) / sqrt(na·nb/12·((n+1) − Σ(t³−t)/(n(n−1)))) is one
    fixed IEEE expression over those exact integers — bit-identical in
    both engines. Degenerate segments (one arm empty, or all values
    tied) are excluded by integer predicates.

    Shape: one (segment, value) pre-aggregation is the only event-sized
    exchange (map-combined); the midrank window and the final per-segment
    rollup run on the distinct-value table. Same two-tier shape as
    feature_split_gini — the 100 TB plan is one shuffle of (segment,
    cents) pairs. Reference anchor: the reference reports only per-pair
    mean performance (`database/postgres/writer.py:409-468`); the U test
    is the comparison its reporting layer would bolt on first."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin(_MW_A, _MW_B)).select(
        (F.col("user_id") % _MW_SEGMENTS).alias("segment"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == _MW_A, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_a"),
    )
    pv = s.groupBy("segment", "v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("is_a").alias("ca")
    )
    from pyspark.sql import Window

    wc = (
        Window.partitionBy("segment")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = pv.select(
        "segment",
        "c",
        "ca",
        (F.sum("c").over(wc) - F.col("c")).alias("prior"),
    )
    agg = cum.groupBy("segment").agg(
        F.sum("ca").alias("na"),
        F.sum(F.col("c") - F.col("ca")).alias("nb"),
        F.sum(F.col("ca") * (2 * F.col("prior") + F.col("c") + 1)).alias("r2a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
    )
    na, nb, ties = F.col("na"), F.col("nb"), F.col("ties")
    u2 = F.col("r2a") - na * (na + 1)
    nd = (na + nb).cast("double")
    z = (u2.cast("double") / F.lit(2.0) - na.cast("double") * nb.cast("double") / F.lit(2.0)) / F.sqrt(
        na.cast("double") * nb.cast("double") / F.lit(12.0)
        * ((nd + F.lit(1.0)) - ties.cast("double") / (nd * (nd - F.lit(1.0))))
    )
    return agg.filter((na > 0) & (nb > 0) & (na + nb > ties + 1)).select(
        "segment", "na", "nb", u2.alias("u2"), "ties", z.alias("z_score")
    )


# ---------------------------------------------------------------------------
# A/B experiment readout #2: two-sample Kolmogorov-Smirnov, exact integers
# ---------------------------------------------------------------------------
_KS_ORACLE = f"""
WITH s AS (
  SELECT user_id % {_MW_SEGMENTS} AS segment,
         CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END AS is_a
  FROM events WHERE event_type IN ('{_MW_A}', '{_MW_B}')
),
pv AS (
  SELECT segment, v,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(is_a) AS BIGINT) AS ca
  FROM s GROUP BY segment, v
),
cum AS (
  SELECT segment, v,
         CAST(SUM(ca) OVER (PARTITION BY segment ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
         CAST(SUM(c - ca) OVER (PARTITION BY segment ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb,
         CAST(SUM(ca) OVER (PARTITION BY segment) AS BIGINT) AS na,
         CAST(SUM(c - ca) OVER (PARTITION BY segment) AS BIGINT) AS nb
  FROM pv
),
d AS (
  SELECT segment, v, na, nb,
         abs(nb * cuma - na * cumb) AS d_num
  FROM cum WHERE na > 0 AND nb > 0
)
SELECT segment, na, nb, d_num, v AS ks_at_v,
       CAST(d_num AS DOUBLE)
         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS d_stat,
       CAST(d_num AS DOUBLE)
         / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
         * sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
                / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))) AS ks_stat
FROM d
QUALIFY ROW_NUMBER() OVER (PARTITION BY segment
                           ORDER BY d_num DESC, v) = 1
"""


@query("ab_test_ks", oracle=_KS_ORACLE, tags=("ab-test", "A2"))
def ab_test_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test per user segment over the same
    click-vs-purchase arms as `ab_test_mannwhitney` — the DISTRIBUTION-
    SHAPE complement to the U test's location shift: D is the largest
    gap between the two empirical CDFs, so it catches variance and tail
    differences a rank-sum test is blind to.

    Exact-integer trick: with both arms scaled to the common denominator
    na*nb, the ECDF gap at each distinct value is the INTEGER
    |nb*cuma - na*cumb| (ECDFs evaluated after the tied block, the
    correct ties convention), so the argmax over values — the statistic
    AND the value where the distributions diverge most — is decided
    entirely in int64; D and the asymptotic KS statistic
    D*sqrt(na*nb/(na+nb)) are one fixed IEEE expression each over those
    integers. Ties in the argmax break to the smallest value.

    Shape: the only event-sized exchange is the map-combined
    (segment, value) pre-aggregation; the two cumsums, the per-segment
    totals, and the argmax row_number all ride ONE segment-keyed window
    exchange over the distinct-value table — the same two-tier 100 TB
    plan as the U test beside it. Reference anchor: the reference's
    reporting layer stops at per-pair means
    (`database/postgres/writer.py:409-468`)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type").isin(_MW_A, _MW_B)).select(
        (F.col("user_id") % _MW_SEGMENTS).alias("segment"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("event_type") == _MW_A, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_a"),
    )
    pv = s.groupBy("segment", "v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("is_a").alias("ca")
    )
    wc = (
        Window.partitionBy("segment")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("segment")
    cum = pv.select(
        "segment",
        "v",
        F.sum("ca").over(wc).alias("cuma"),
        F.sum(F.col("c") - F.col("ca")).over(wc).alias("cumb"),
        F.sum("ca").over(wt).alias("na"),
        F.sum(F.col("c") - F.col("ca")).over(wt).alias("nb"),
    )
    d = cum.filter((F.col("na") > 0) & (F.col("nb") > 0)).select(
        "segment",
        "v",
        "na",
        "nb",
        F.abs(F.col("nb") * F.col("cuma") - F.col("na") * F.col("cumb")).alias(
            "d_num"
        ),
    )
    wr = Window.partitionBy("segment").orderBy(F.col("d_num").desc(), "v")
    nad, nbd = F.col("na").cast("double"), F.col("nb").cast("double")
    d_stat = F.col("d_num").cast("double") / (nad * nbd)
    return (
        d.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "segment",
            "na",
            "nb",
            "d_num",
            F.col("v").alias("ks_at_v"),
            d_stat.alias("d_stat"),
            (d_stat * F.sqrt(nad * nbd / (nad + nbd))).alias("ks_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event journeys
# ---------------------------------------------------------------------------
@query(
    "event_transition_matrix",
    oracle="""
WITH s AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
),
t AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM s WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
r AS (
  SELECT from_type, to_type, n,
         CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total
  FROM t
)
SELECT from_type, to_type, n, row_total,
       CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS p
FROM r
""",
    tags=("A2", "user-journey", "markov"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event journeys:
    P(next event type | current event type), estimated from every
    adjacent pair in each user's time-ordered stream — the user-journey
    model behind next-action prediction, anomalous-flow alerting, and
    absorbing-state (churn) analysis. Counts are exact integers; each
    probability is one IEEE divide of two of them.

    Plan: ONE sort-shuffle (the per-user LAG window); the transition
    groupBy collapses to at most |types|^2 rows map-side, and row
    totals come from an INTEGER window sum over that alphabet-sized
    table (order-independent, so no join and no duplicated tape
    subtree). At 100 TB the tape shuffles once and everything
    downstream is alphabet-sized."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("from_type")
    ).filter(F.col("from_type").isNotNull())
    t = s.groupBy("from_type", F.col("event_type").alias("to_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(wt).alias("row_total"),
    ).select(
        "from_type",
        "to_type",
        "n",
        "row_total",
        (F.col("n").cast("double") / F.col("row_total").cast("double")).alias("p"),
    )


# ---------------------------------------------------------------------------
# Association-rule mining over daily activity baskets (Apriori level 2)
# ---------------------------------------------------------------------------
_BASKET_DAY_US = 86_400_000_000


@query(
    "daily_basket_rules",
    oracle=f"""
WITH p AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_BASKET_DAY_US} AS day, event_type
  FROM events
),
n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM p)
),
pairs AS (
  SELECT a.event_type AS x, b.event_type AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM p a JOIN p b ON a.user_id = b.user_id AND a.day = b.day
                    AND a.event_type < b.event_type
  GROUP BY 1, 2
),
singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY event_type
),
directed AS (
  SELECT x AS antecedent, y AS consequent, c_xy FROM pairs
  UNION ALL
  SELECT y, x, c_xy FROM pairs
)
SELECT d.antecedent, d.consequent, d.c_xy AS n_both,
       sa.c AS n_ant, sc.c AS n_cons, n.n_baskets,
       CAST(d.c_xy AS DOUBLE) / CAST(n.n_baskets AS DOUBLE) AS support,
       CAST(d.c_xy AS DOUBLE) / CAST(sa.c AS DOUBLE) AS confidence,
       (CAST(d.c_xy AS DOUBLE) * CAST(n.n_baskets AS DOUBLE))
       / (CAST(sa.c AS DOUBLE) * CAST(sc.c AS DOUBLE)) AS lift
FROM directed d
JOIN singles sa ON sa.event_type = d.antecedent
JOIN singles sc ON sc.event_type = d.consequent
CROSS JOIN n
""",
    tags=("A2", "market-basket", "association-rules"),
)
def daily_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over daily activity baskets (the level-2
    Apriori pass): for every directed event-type pair A→B, its support,
    confidence, and lift across (user, day) baskets — the market-basket
    operator behind 'users who X also Y' recommendations and funnel
    hypothesis mining. Counts are exact integers; the three ratios are
    one IEEE divide each.

    Shape: baskets form in ONE corpus shuffle (groupBy (user, day) with
    a map-combined collect_set of the ≤|alphabet| types); candidate
    pairs are generated IN-ROW from the sorted item array (index-aware
    transform + slice — at most C(|alphabet|,2) structs per basket, no
    self-join of the event table, which is the naive plan's quadratic
    trap); everything downstream — pair counts, single counts, the
    1-row basket total (allowlisted scalar broadcast) — is
    alphabet-sized. At 100 TB the event table shuffles once."""
    ev = load_table(spark, sf_dir, "events")
    baskets = (
        ev.groupBy("user_id", F.expr(f"(ts div 1000) div {_BASKET_DAY_US}").alias("day"))
        .agg(F.array_sort(F.collect_set("event_type")).alias("items"))
        # three aggregates (pairs, singles, basket total) consume the
        # basket table: checkpoint it once so the corpus groupBy runs
        # once instead of once per branch (basket-granular data, the
        # same lineage-cut discipline as the iterative operators)
        .localCheckpoint()
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("items"),
            lambda x, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )
    singles = (
        baskets.select(F.explode("items").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("x").alias("antecedent"),
                    F.col("y").alias("consequent"),
                    F.col("c_xy"),
                ),
                F.struct(
                    F.col("y").alias("antecedent"),
                    F.col("x").alias("consequent"),
                    F.col("c_xy"),
                ),
            )
        ).alias("r")
    ).select("r.antecedent", "r.consequent", "r.c_xy")
    sa = singles.select(F.col("event_type").alias("antecedent"), F.col("c").alias("n_ant"))
    sc_ = singles.select(
        F.col("event_type").alias("consequent"), F.col("c").alias("n_cons")
    )
    out = (
        directed.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sc_), "consequent")
        .join(F.broadcast(n))
    )
    dd = lambda c_: F.col(c_).cast("double")  # noqa: E731
    return out.select(
        "antecedent",
        "consequent",
        F.col("c_xy").alias("n_both"),
        "n_ant",
        "n_cons",
        "n_baskets",
        (dd("c_xy") / dd("n_baskets")).alias("support"),
        (dd("c_xy") / dd("n_ant")).alias("confidence"),
        ((dd("c_xy") * dd("n_baskets")) / (dd("n_ant") * dd("n_cons"))).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Exact trimmed mean: the robust location estimate between mean and median
# ---------------------------------------------------------------------------
_TRIM_PCT_NUM = 1  # trim floor(n/10) from each tail
_TRIM_PCT_DEN = 10


@query(
    "trimmed_mean_by_type",
    oracle=f"""
WITH c AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY cents, event_id) AS BIGINT) AS rk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT) AS s_all
  FROM c
),
t AS (
  SELECT event_type, n, s_all,
         n * {_TRIM_PCT_NUM} // {_TRIM_PCT_DEN} AS k,
         CAST(SUM(cents) FILTER (WHERE rk > n * {_TRIM_PCT_NUM} // {_TRIM_PCT_DEN}
                                   AND rk <= n - n * {_TRIM_PCT_NUM} // {_TRIM_PCT_DEN})
              AS BIGINT) AS s_kept
  FROM r GROUP BY event_type, n, s_all
)
SELECT event_type, n, k AS n_trimmed_each_tail,
       CAST(s_all AS DOUBLE) / CAST(n AS DOUBLE) AS raw_mean,
       CAST(s_kept AS DOUBLE) / CAST(n - 2 * k AS DOUBLE) AS trimmed_mean
FROM t WHERE n > 2 * k
""",
    tags=("A2", "robust-stats"),
)
def trimmed_mean_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed mean per event type: drop floor(n/10) values
    from EACH tail (deterministic (value, event_id) rank order) and
    average the interior — the robust location estimate between the
    outlier-fragile mean and the information-discarding median, reported
    next to the raw mean so the gap itself is the contamination signal
    (sits beside value_anomaly_mad in the robust-stats family).

    Exactness: ranks, trim counts, and both sums are exact integers; the
    two means are one IEEE divide each. Plan: ONE sort-shuffle — the
    rank window, the full-partition integer totals, and the per-type
    rollup all share the event_type exchange. At 100 TB the swap is
    approx_percentile cut points (documented on segment_median_acctbal)
    if the per-type sort ever dominates."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    wo = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wall = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(wo).cast("long").alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("cents").over(wall).alias("s_all"),
    )
    k = F.expr(f"n * {_TRIM_PCT_NUM} div {_TRIM_PCT_DEN}")
    t = (
        r.withColumn("k", k)
        .groupBy("event_type", "n", "s_all", "k")
        .agg(
            F.sum(
                F.when(
                    (F.col("rk") > F.col("k"))
                    & (F.col("rk") <= F.col("n") - F.col("k")),
                    F.col("cents"),
                )
            ).alias("s_kept")
        )
    )
    return t.filter(F.col("n") > 2 * F.col("k")).select(
        "event_type",
        "n",
        F.col("k").alias("n_trimmed_each_tail"),
        (F.col("s_all").cast("double") / F.col("n").cast("double")).alias("raw_mean"),
        (
            F.col("s_kept").cast("double")
            / (F.col("n") - 2 * F.col("k")).cast("double")
        ).alias("trimmed_mean"),
    )
