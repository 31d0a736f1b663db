"""Pair-universe and market-catalog operators — the reference's
subscription/diffing/catalog surface (SURVEY §2.1 S2, §2.4 J5, §2.5 A5,
§2.6 W2/W4, §2.7 set ops) plus the Polymarket best-of-book metrics (P4).

These are the operators around the hot path: maintaining which markets
are watched (set algebra on subscription keys), cataloging venues'
markets (bulk scan + ticker filter), and the per-book derived metrics.
All built-ins; every shuffle is on small dimension-sized data except the
book build (one keyed aggregation, same shape as kalshi_book_summary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table
from . import orderbook as ob

# ---------------------------------------------------------------------------
# P4: Polymarket best-of-book + derived metrics, through the JSON path
# ---------------------------------------------------------------------------
_POLY_LEVELS_SQL = """
  SELECT l_orderkey AS ticker,
         (l_partkey % 97 + 1) / 100.0 AS bid_price,
         (l_partkey % 89 + 3) / 100.0 AS ask_price,
         CAST(l_quantity AS DOUBLE) AS size,
         (l_linenumber % 2 = 1) AS is_bid
  FROM lineitem
"""


@query(
    "poly_book_summary",
    oracle=f"""
WITH lv AS ({_POLY_LEVELS_SQL})
SELECT ticker,
       MAX(CASE WHEN is_bid THEN bid_price END) AS best_bid,
       MIN(CASE WHEN NOT is_bid THEN ask_price END) AS best_ask,
       (MAX(CASE WHEN is_bid THEN bid_price END)
        + MIN(CASE WHEN NOT is_bid THEN ask_price END)) / 2.0 AS midpoint,
       MIN(CASE WHEN NOT is_bid THEN ask_price END)
        - MAX(CASE WHEN is_bid THEN bid_price END) AS spread,
       COUNT(CASE WHEN is_bid THEN 1 END) AS n_bids,
       COUNT(CASE WHEN NOT is_bid THEN 1 END) AS n_asks
FROM lv
GROUP BY ticker
HAVING COUNT(CASE WHEN is_bid THEN 1 END) > 0
   AND COUNT(CASE WHEN NOT is_bid THEN 1 END) > 0
""",
    tags=("P4", "P11", "F9"),
)
def poly_book_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymarket best-of-book + derived metrics (P4,
    `ireland/api/data_feed.py:70-93`): books built best-first (bids sorted
    price-desc, asks price-asc — the API contract `data_feed.py:81` that
    `bids[0]` relies on), serialized to the stored JSON blob, re-parsed
    with from_json (P11), then element_at-based extraction with
    midpoint/spread arithmetic and level counts. F9 shape guard: both
    sides non-empty."""
    li = load_table(spark, sf_dir, "lineitem")
    is_bid = F.col("l_linenumber") % 2 == 1
    bid_level = F.struct(
        ((F.col("l_partkey") % 97 + 1) / 100.0).alias("price"),
        F.col("l_quantity").cast("double").alias("size"),
    )
    ask_level = F.struct(
        ((F.col("l_partkey") % 89 + 3) / 100.0).alias("price"),
        F.col("l_quantity").cast("double").alias("size"),
    )
    books = li.groupBy(F.col("l_orderkey").alias("ticker")).agg(
        F.sort_array(F.collect_list(F.when(is_bid, bid_level)), asc=False).alias("bids"),
        F.sort_array(F.collect_list(F.when(~is_bid, ask_level))).alias("asks"),
    )
    snap = books.select(
        "ticker",
        F.to_json(F.struct(F.struct("bids", "asks").alias("orderbook"))).alias(
            "full_orderbook"
        ),
    )
    parsed = snap.select(
        "ticker", ob.parse_polymarket_book("full_orderbook").alias("book")
    )
    bids, asks = F.col("book.orderbook.bids"), F.col("book.orderbook.asks")
    return parsed.filter((F.size(bids) > 0) & (F.size(asks) > 0)).select(
        "ticker",
        ob.poly_best_bid(bids).alias("best_bid"),
        ob.poly_best_ask(asks).alias("best_ask"),
        ob.poly_midpoint(bids, asks).alias("midpoint"),
        ob.poly_spread(bids, asks).alias("spread"),
        F.size(bids).cast("long").alias("n_bids"),
        F.size(asks).cast("long").alias("n_asks"),
    )


# ---------------------------------------------------------------------------
# §2.7 set ops: subscription diffing (SUBSCRIBE / UNSUBSCRIBE)
# ---------------------------------------------------------------------------
@query(
    "pair_universe_diff",
    oracle="""
WITH old AS (
  SELECT c_custkey AS pair_id FROM customer WHERE c_custkey < 200 AND c_custkey % 10 <> 0
),
new AS (
  SELECT c_custkey AS pair_id FROM customer WHERE c_custkey < 220 AND c_custkey % 7 <> 0
)
SELECT pair_id, 'subscribe' AS change FROM (SELECT pair_id FROM new EXCEPT SELECT pair_id FROM old)
UNION ALL
SELECT pair_id, 'unsubscribe' AS change FROM (SELECT pair_id FROM old EXCEPT SELECT pair_id FROM new)
""",
    tags=("set-ops", "S4"),
)
def pair_universe_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-universe diffing (§2.7): the reference refreshes its active
    set from the DB and sends SUBSCRIBE for added keys / UNSUBSCRIBE for
    removed (`virginia/api/data_feed.py:185-198`,
    `ireland/broker/client.py:199-213`). Declaratively: two `exceptAll`s
    over the key DataFrames, unioned with a change label. Dimension-sized
    data — every exchange is trivial; at scale this is still correct
    because the universe is orders of magnitude smaller than the stream."""
    cust = load_table(spark, sf_dir, "customer")
    old = cust.filter((F.col("c_custkey") < 200) & (F.col("c_custkey") % 10 != 0)).select(
        F.col("c_custkey").alias("pair_id")
    )
    new = cust.filter((F.col("c_custkey") < 220) & (F.col("c_custkey") % 7 != 0)).select(
        F.col("c_custkey").alias("pair_id")
    )
    added = new.exceptAll(old).select("pair_id", F.lit("subscribe").alias("change"))
    removed = old.exceptAll(new).select("pair_id", F.lit("unsubscribe").alias("change"))
    return added.unionByName(removed)


# ---------------------------------------------------------------------------
# A5: order-preserving dedup (first occurrence wins)
# ---------------------------------------------------------------------------
@query(
    "ticker_first_seen",
    oracle="""
WITH firsts AS (
  SELECT user_id AS ticker, MIN(event_id) AS first_event_id
  FROM events GROUP BY user_id
)
SELECT ticker, first_event_id,
       CAST(ROW_NUMBER() OVER (ORDER BY first_event_id) AS BIGINT) AS position
FROM firsts
""",
    tags=("A5",),
)
def ticker_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving dedup (A5, `read_from.py:169-183`
    `dict.fromkeys(tickers)`): first occurrence of each key, with its
    position in first-seen order. Declaratively: min(event_id) per key +
    a rank — `dropDuplicates` keeps *a* row; keeping the *first* needs
    the explicit min, which is also the deterministic choice."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy(F.col("user_id").alias("ticker")).agg(
        F.min("event_id").alias("first_event_id")
    )
    w = Window.orderBy("first_event_id")
    return firsts.select(
        "ticker",
        "first_event_id",
        F.row_number().over(w).cast("long").alias("position"),
    )


# ---------------------------------------------------------------------------
# S2 + J5: bulk market scan projected + ticker-list filter
# ---------------------------------------------------------------------------
_TICKER_LIST = list(range(1, 400, 13))


@query(
    "bulk_market_scan",
    oracle=f"""
SELECT p_partkey AS market_id,
       p_name AS title,
       p_brand AS category,
       p_type AS market_type,
       p_size AS tick_size,
       p_retailprice AS last_price,
       CASE WHEN p_retailprice > 1500 THEN 'active' ELSE 'settled' END AS status
FROM part
WHERE p_partkey IN ({", ".join(str(t) for t in _TICKER_LIST)})
""",
    tags=("S2", "J5", "A9"),
)
def bulk_market_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk market catalog scan (S2, `virginia/api/connection.py:223-304`:
    one call returns <=1000 markets projected to a fixed record) filtered
    to a requested ticker list (J5, `read_from.py:319-322`). `isin` over a
    literal list compiles to an in-set predicate pushed to the parquet
    scan — no join, no shuffle. With a DataFrame of tickers instead, the
    same query is a broadcast semi-join."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(F.col("p_partkey").isin(_TICKER_LIST)).select(
        F.col("p_partkey").alias("market_id"),
        F.col("p_name").alias("title"),
        F.col("p_brand").alias("category"),
        F.col("p_type").alias("market_type"),
        F.col("p_size").alias("tick_size"),
        F.col("p_retailprice").alias("last_price"),
        F.when(F.col("p_retailprice") > 1500, F.lit("active"))
        .otherwise(F.lit("settled"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# W2/W4/F7: the keep-last-N recency ring
# ---------------------------------------------------------------------------
@query(
    "recent_events_ring",
    oracle="""
SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 100
""",
    tags=("W2", "W4", "F7"),
)
def recent_events_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep-last-100 ring buffer (W4,
    `opportunity_scanner.py:519-521` `[-100:]`) as a query: global top-100
    by recency with a deterministic tiebreak (W2 sort+limit, F7 recency
    filter). Spark executes this as a per-partition top-K + single-reduce
    TakeOrderedAndProject — no full sort, no full shuffle — which is the
    100 TB-safe form of 'the last N things'."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        "value",
    ).orderBy(F.col("ts_us").desc(), F.col("event_id").desc()).limit(100)


# ---------------------------------------------------------------------------
# INTERSECT set op (the survivor complement of the universe diff)
# ---------------------------------------------------------------------------
@query(
    "repeat_buyers_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
""",
    tags=("set-ops", "F2"),
)
def repeat_buyers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who bought in BOTH 1999 and 2001 — INTERSECT, the
    set-op sibling of pair_universe_diff's EXCEPT (together they cover
    the added/removed/retained triad of the reference's subscription
    diffing, `virginia/api/data_feed.py:185-198`). Spark plans INTERSECT
    as a left-semi aggregate join on distinct keys: one shuffle per
    side, output bounded by the smaller key set."""
    o = load_table(spark, sf_dir, "orders")
    y1 = o.filter(F.year("o_orderdate") == 1999).select("o_custkey")
    y2 = o.filter(F.year("o_orderdate") == 2001).select("o_custkey")
    return y1.intersect(y2)


# ---------------------------------------------------------------------------
# UNION DISTINCT — completes the EXCEPT / INTERSECT / UNION set-op triad
# ---------------------------------------------------------------------------
@query(
    "either_year_buyers_union",
    oracle="""
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1999
UNION
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2001
""",
    tags=("set-ops", "F2"),
)
def either_year_buyers_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who bought in EITHER year — UNION (distinct), closing
    the set-op family next to pair_universe_diff's EXCEPT and
    repeat_buyers_intersect's INTERSECT. Spark plans it as
    union-then-HashAggregate on the key: the concat is free (no shuffle),
    the distinct is one exchange over the combined key set, and partial
    aggregation dedups map-side first — at 100 TB prefer this over
    `dropDuplicates` on a wide row, because only the key column travels."""
    o = load_table(spark, sf_dir, "orders")
    y1 = o.filter(F.year("o_orderdate") == 1999).select("o_custkey")
    y2 = o.filter(F.year("o_orderdate") == 2001).select("o_custkey")
    return y1.union(y2).distinct()


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch overlap — the mergeable-sketch tier of the
# EXCEPT / INTERSECT / UNION triad above
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_DOMAIN = 1 << 60  # md5 15-hex prefix domain
_KMV_RATIO_CAP = 10**12  # caps DOMAIN/kth so 63*ratio can't overflow int64


def _kmv_hash(col):
    """Engine-portable 60-bit hash: first 15 hex chars of md5(string)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _kmv_sketch(df: DataFrame, key: str) -> DataFrame:
    """The K smallest distinct hash values of a key set. orderBy+limit
    plans as TakeOrderedAndProject: per-partition top-K, then a K-row
    merge on one reducer — never a full sort, never a big collect."""
    return (
        df.select(_kmv_hash(F.col(key)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
    )


_KMV_EST = (
    f"CASE WHEN n_sk < {_KMV_K} THEN n_sk "
    f"ELSE {_KMV_K - 1} * LEAST({_KMV_DOMAIN} div kth, {_KMV_RATIO_CAP}) END"
)


def _kmv_stats(sk: DataFrame, prefix: str) -> DataFrame:
    return sk.agg(
        F.count(F.lit(1)).alias("n_sk"), F.max("h").alias("kth")
    ).select(F.expr(_KMV_EST).cast("long").alias(f"est_{prefix}"))


def _kmv_est_sql(sketch_cte: str) -> str:
    return f"""(
  SELECT CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
              ELSE {_KMV_K - 1} * LEAST({_KMV_DOMAIN} // MAX(h), {_KMV_RATIO_CAP}) END
  FROM {sketch_cte}
)"""


_KMV_HASH_SQL = (
    "("
    + " + ".join(
        "(strpos('0123456789abcdef', "
        f"substr(md5(CAST(o_custkey AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    + ")"
)


@query(
    "kmv_buyers_overlap",
    oracle=f"""
WITH ha AS (
  SELECT DISTINCT {_KMV_HASH_SQL} AS h
  FROM orders WHERE year(o_orderdate) = 1999
),
hb AS (
  SELECT DISTINCT {_KMV_HASH_SQL} AS h
  FROM orders WHERE year(o_orderdate) = 2001
),
ska AS (SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}),
skb AS (SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}),
sku AS (
  SELECT DISTINCT h FROM (SELECT h FROM ska UNION ALL SELECT h FROM skb)
  ORDER BY h LIMIT {_KMV_K}
),
est AS (
  SELECT {_kmv_est_sql("ska")} AS est_a,
         {_kmv_est_sql("skb")} AS est_b,
         {_kmv_est_sql("sku")} AS est_union,
         (SELECT COUNT(DISTINCT o_custkey) FROM orders
          WHERE year(o_orderdate) = 1999) AS n_a_exact,
         (SELECT COUNT(DISTINCT o_custkey) FROM orders
          WHERE year(o_orderdate) = 2001) AS n_b_exact
)
SELECT CAST({_KMV_K} AS BIGINT) AS k,
       CAST(n_a_exact AS BIGINT) AS n_a_exact,
       CAST(n_b_exact AS BIGINT) AS n_b_exact,
       CAST(est_a AS BIGINT) AS est_a,
       CAST(est_b AS BIGINT) AS est_b,
       CAST(est_union AS BIGINT) AS est_union,
       CAST(GREATEST(est_a + est_b - est_union, 0) AS BIGINT) AS est_inter,
       CAST(GREATEST(est_a + est_b - est_union, 0) * 1000 // est_union
            AS BIGINT) AS jaccard_x1000
FROM est
""",
    tags=("set-ops", "sketch", "kmv"),
)
def kmv_buyers_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SKETCH tier of the set-op triad: estimate |A|, |B|, |A∪B|,
    |A∩B| and Jaccard for the 1999-vs-2001 buyer sets from K=64-value
    KMV sketches instead of exact distincts. KMV is the mergeable
    sketch: the union estimate is computed purely from the two K-row
    sketches (K smallest of their union) — the property that lets
    100 TB jobs keep one tiny sketch per partition/day/source and
    combine them later without rescanning. Deterministic by
    construction (md5-derived hashes, floor arithmetic, capped ratio),
    so the oracle restates the identical estimator in SQL and the gate
    is an exact hash match — no probabilistic band. The exact
    cardinalities ride along as audit columns (they're what
    `either_year_buyers_union` / `repeat_buyers_intersect` compute the
    slow way). Scale shape: each sketch is distinct → TakeOrdered top-K
    (partial per partition, K-row merge); everything after operates on
    ≤3K rows."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.year("o_orderdate") == 1999).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 2001).select("o_custkey")
    ska, skb = _kmv_sketch(a, "o_custkey"), _kmv_sketch(b, "o_custkey")
    ska = ska.persist()
    skb = skb.persist()
    sku = ska.unionByName(skb).distinct().orderBy("h").limit(_KMV_K)

    key = F.lit(1).alias("_k")
    est_a = _kmv_stats(ska, "a").select(key, "est_a")
    est_b = _kmv_stats(skb, "b").select(key, "est_b")
    est_u = _kmv_stats(sku, "union").select(key, "est_union")
    n_a = a.agg(F.countDistinct("o_custkey").alias("n_a_exact")).select(
        key, "n_a_exact"
    )
    n_b = b.agg(F.countDistinct("o_custkey").alias("n_b_exact")).select(
        key, "n_b_exact"
    )
    return (
        est_a.join(est_b, "_k")
        .join(est_u, "_k")
        .join(n_a, "_k")
        .join(n_b, "_k")
        .select(
            F.lit(_KMV_K).cast("long").alias("k"),
            F.col("n_a_exact").cast("long"),
            F.col("n_b_exact").cast("long"),
            F.col("est_a").cast("long"),
            F.col("est_b").cast("long"),
            F.col("est_union").cast("long"),
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
            )
            .cast("long")
            .alias("est_inter"),
            F.expr(
                "CAST(GREATEST(est_a + est_b - est_union, 0) * 1000 "
                "div est_union AS BIGINT)"
            ).alias("jaccard_x1000"),
        )
    )


# ---------------------------------------------------------------------------
# Custom Python DataSource (Spark 4 plugin API): the market feed as a
# first-class `spark.read.format("market_feed")` source
# ---------------------------------------------------------------------------

_FEED_ROWS = 10_000


@query(
    "pyds_market_feed",
    oracle=f"""
WITH i AS (SELECT unnest(generate_series(0, {_FEED_ROWS - 1})) AS i),
r AS (
  SELECT CASE WHEN i % 2 = 0 THEN 'kalshi' ELSE 'polymarket' END AS source,
         'T' || CAST(i % 500 AS VARCHAR) AS ticker,
         1700000000000000 + i * 1000 AS ts_us,
         (i * 17) % 100 AS yes_cents,
         (i * 31) % 1000 AS volume
  FROM i
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_quotes,
       CAST(COUNT(DISTINCT ticker) AS BIGINT) AS n_tickers,
       CAST(SUM(volume) AS BIGINT) AS total_volume,
       CAST(SUM(yes_cents) AS BIGINT) AS sum_yes_cents,
       CAST(MAX(ts_us) AS BIGINT) AS max_ts_us
FROM r GROUP BY source
""",
    tags=("S1", "S3", "python-datasource"),
)
def pyds_market_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's poll-loop feed as a PLUGGABLE Spark data source
    (Spark 4 Python DataSource API, `sources/pysource.py`): planned by
    Catalyst like any V2 source — one task per InputPartition, venue
    equality and ts range predicates absorbed into the generator via
    pushFilters (plan-pinned: the pushed predicate leaves the post-scan
    Filter), and a streaming twin whose offsets are checkpointable row
    indices. The oracle recomputes the deterministic feed formula with
    generate_series, so a hash match proves the full plugin path —
    registration, partition planning, Python row generation, Arrow
    transfer, aggregation — byte-exact. (sf-independent by design: the
    source IS the data.)"""
    from ..sources import pysource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pysource.register(spark)
    feed = (
        spark.read.format("market_feed")
        .option("n_rows", str(_FEED_ROWS))
        .option("n_partitions", "8")
        .load()
    )
    return feed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_quotes"),
        F.countDistinct("ticker").cast("long").alias("n_tickers"),
        F.sum("volume").cast("long").alias("total_volume"),
        F.sum("yes_cents").cast("long").alias("sum_yes_cents"),
        F.max("ts_us").cast("long").alias("max_ts_us"),
    )
