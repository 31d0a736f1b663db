"""Subquery decorrelation shapes — the remaining classic correlated /
nested-query forms a relational engine must handle, expressed as the
Catalyst-friendly join plans they decorrelate to (SURVEY §2.4/§2.5 join +
aggregate families; the reference leans on Postgres for these shapes, e.g.
the nested latest-row lookups in `virginia/database/read_from.py:129-167`
and the per-pair rollups in `database/postgres/writer.py:409-468`).

Each query states its scale plan in the docstring: what shuffles, what
broadcasts, and why the decorrelated form beats a per-row subquery at
100 TB (a correlated subquery re-evaluated per outer row is a join the
optimizer can't reorder; writing the join explicitly keeps it in the
cost-based planner's hands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import money, rate
from ..plans.registry import query
from ..sources.tables import load_table


# ---------------------------------------------------------------------------
# Q2 shape: correlated MIN — "the cheapest part within its type class".
# ---------------------------------------------------------------------------
@query(
    "min_price_part_per_type",
    oracle="""
SELECT p_type, p_partkey, p_name, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
)
""",
    tags=("J2", "A7", "subquery-min"),
)
def min_price_part_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-MIN subquery, decorrelated: one grouped MIN over the
    correlation key, joined back on (key, min). Scale notes: the grouped
    MIN is a map-side-combinable aggregate whose output has one row per
    p_type (low cardinality) — it broadcasts, so the join adds NO shuffle
    beyond the aggregate's own; the naive correlated form would be a
    per-row re-scan. MIN over doubles is exact (no accumulation), so
    equality on the join is parity-safe."""
    part = load_table(spark, sf_dir, "part")
    mins = part.groupBy(F.col("p_type").alias("min_type")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        part.join(
            F.broadcast(mins),
            (F.col("p_type") == F.col("min_type"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join with a non-equi residual — late-shipping
# orders counted per priority bucket.
# ---------------------------------------------------------------------------
@query(
    "order_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '2000-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
    tags=("J1", "F7", "A9", "subquery-exists"),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → LEFT SEMI join: equi key (orderkey) drives a shuffled hash
    join, the date comparison rides along as a residual predicate, and the
    semi form stops probing an order at its first qualifying line (no
    fan-out, no dedup pass). Scale notes: the orders-side date filter
    pushes to the parquet scan BEFORE the shuffle, so only the six-month
    slice is exchanged; the post-semi GROUP BY has 5 keys and collapses
    map-side."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# Q15 shape: aggregate view + "equal to the MAX of the view" scalar
# subquery — the top-revenue supplier(s).
# ---------------------------------------------------------------------------
@query(
    "top_supplier_by_revenue",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
              AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    tags=("A2", "J2", "subquery-scalar"),
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-MAX-of-a-view subquery: materialize the revenue aggregate
    once (exact decimal sum → double, so the MAX equality is bit-stable),
    reduce it to a single-row MAX, and broadcast that row back against the
    same aggregate. Scale notes: ONE shuffle total (the groupBy); the MAX
    side is one row, and the supplier dimension joins broadcast. The
    quarter filter prunes the lineitem scan to 1/4 of the fact table
    before anything moves."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    one = F.lit(1).cast("decimal(3,2)")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(money("l_extendedprice") * (one - rate("l_discount")))
        .cast("double")
        .alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top), revenue.total_revenue == top.max_revenue)
        .join(F.broadcast(sup), F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS double correlation — the supplier who
# solely returned lines in multi-supplier orders.
# ---------------------------------------------------------------------------
@query(
    "sole_returning_suppliers",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    tags=("J1", "subquery-exists", "subquery-not-exists", "W2"),
)
def sole_returning_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXISTS + NOT EXISTS pair becomes LEFT SEMI + LEFT ANTI joins on
    the same equi key (orderkey) with a suppkey-inequality residual — the
    canonical Q21 plan. Scale notes: all three lineitem legs shuffle on
    l_orderkey, so AQE can reuse one exchange partitioning for the whole
    chain; the 'F'-status orders filter and the 'R'-flag filter both push
    to their scans, and the final top-20 runs as TakeOrderedAndProject
    (per-partition heap, no global sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders_f = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = load_table(spark, sf_dir, "supplier")

    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )

    base = (
        l1.join(orders_f, F.col("l1.l_orderkey") == F.col("o_orderkey"), "inner")
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
    )
    return (
        base.join(F.broadcast(sup), F.col("l1.l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar AVG subquery + NOT EXISTS anti-join — well-funded
# customers who never ordered, rolled up by segment.
# ---------------------------------------------------------------------------
@query(
    "idle_rich_customers",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_mktsegment
""",
    tags=("J2", "A1", "subquery-scalar", "anti-join"),
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar AVG threshold (computed once, broadcast as a 1-row cross
    join) + LEFT ANTI against orders. Scale notes: the threshold is an
    exact-decimal sum divided once (same IEEE op sequence as the oracle,
    so the `>` comparison is bit-stable); the anti join is the only
    shuffle, keyed on custkey; the segment rollup is 5 groups, collapsed
    map-side. A correlated NOT EXISTS per customer would be the same anti
    join — writing it directly saves the optimizer the rewrite. The anti
    side is pre-filtered to the recency horizon (every customer has SOME
    order, so 'never ordered' would be vacuous; 'not ordered since the
    horizon' is the dormant-account question and also shrinks the build
    side before the shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    thresh = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            )
        )
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated AVG threshold — "revenue locked in small orders".
# ---------------------------------------------------------------------------
@query(
    "small_quantity_revenue",
    oracle="""
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_small_lineitems,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN pa ON pa.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < 0.2 * pa.avg_qty
GROUP BY p.p_brand
""",
    tags=("subquery-avg", "A1", "J2"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — correlated AVG subquery ("lineitems below 20% of
    their part's average quantity"), decorrelated into one grouped AVG
    joined back on the correlation key, then rolled up per brand with
    the /7 yearly convention. Exactness: the AVG is an exact decimal
    sum divided by a count (one correctly-rounded double divide,
    bit-identical in both engines), so the 0.2x threshold comparison
    can't flap; revenue sums through decimal. Scale: the grouped AVG
    and the join both key on l_partkey — ONE shuffle partitioning
    serves both (Catalyst reuses the exchange), the part dim broadcasts,
    and the naive per-row correlated re-scan never exists."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pa = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.sum(money("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li.join(pa, li.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lineitems"),
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunction of conjunctive predicates (OR-of-ANDs pushdown).
# ---------------------------------------------------------------------------
@query(
    "disjunctive_brand_revenue",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    tags=("F-pushdown", "J2", "predicate-disjunction"),
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — an OR of three (brand, size, quantity) conjunctions
    across the join. The single-table legs of the disjunction
    (p_brand/p_size on part, l_quantity bounds on lineitem) are
    factored by Catalyst into scan-level filters on BOTH sides before
    the join (CNF extraction: every disjunct constrains brand ∈ {1,2,3}
    and quantity ∈ [1,30]), so the join probes only candidate rows and
    the full predicate re-checks the cross-table residual. Revenue
    through exact decimals. One fact shuffle... no: part broadcasts, so
    ZERO extra shuffles beyond the final single-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    disj = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - rate("l_discount"))
    return j.filter(disj).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Q7 shape: bilateral flows — volume shipped between two specific nations.
# ---------------------------------------------------------------------------
@query(
    "bilateral_nation_volume",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
         AS volume
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM l.l_shipdate)
""",
    tags=("J2", "A1", "star-join"),
)
def bilateral_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — trade volume between two named nations, per direction
    and ship year: the bilateral-flow join (fact → orders → customer →
    nation on one leg, fact → supplier → nation on the other) with a
    symmetric two-nation disjunction. Scale plan: supplier, customer,
    and nation broadcast (customer is the largest at ~1.5 MB/SF — still
    broadcast range at any realistic cluster); orders joins the fact on
    l_orderkey — the single real shuffle; the nation-pair filter
    reaches both dimension scans (each nation leg prunes to 2 rows)
    and AQE can convert even the orders join to broadcast after the
    customer semi-reduction. Volume through exact decimals; year via
    EXTRACT on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    rev = money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - rate("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(pair)
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("ship_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        F.sum(rev).cast("double").alias("volume"),
    )


# ---------------------------------------------------------------------------
# Native recursive CTE (Spark 4): iterative schedule generation in pure SQL
# ---------------------------------------------------------------------------

_REC_PERIODS = 12
_REC_RATE_BP = 150  # 1.5% per period, integer basis points


@query(
    "recursive_interest_schedule",
    oracle=f"""
WITH RECURSIVE s(custkey, t, bal) AS (
  SELECT c_custkey, 0, ABS(CAST(round(c_acctbal * 100) AS BIGINT))
  FROM customer
  UNION ALL
  SELECT custkey, t + 1, bal + (bal * {_REC_RATE_BP}) // 10000
  FROM s WHERE t < {_REC_PERIODS}
)
SELECT f.custkey,
       f0.bal AS seed_cents,
       f.bal AS final_cents,
       f.bal - f0.bal AS interest_cents
FROM s f JOIN s f0 ON f0.custkey = f.custkey AND f0.t = 0
WHERE f.t = {_REC_PERIODS}
""",
    tags=("recursive-cte", "iterative", "sql-surface"),
)
def recursive_interest_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A NATIVE recursive CTE (Spark 4's WITH RECURSIVE, planned as an
    iterative UnionLoop) generating a {_REC_PERIODS}-period integer
    compounding schedule per customer: bal' = bal + floor(bal·rate/1e4).
    All arithmetic is non-negative integer floor division, so Spark's
    truncating `div` and DuckDB's flooring `//` agree and the hash gate
    is exact. This is the declarative twin of the engine's driver-side
    iterative operators (connected components, k-means, BPE, PageRank):
    the same fixed-round iteration, but entirely inside the SQL planner.
    Termination is by the explicit period bound — the shape to prefer
    over unbounded recursion at any scale. Each round is one narrow
    projection over the previous round's rows; total rows =
    customers × ({_REC_PERIODS}+1)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_rec_customer_seed"
    )
    return spark.sql(
        f"""
WITH RECURSIVE s(custkey, t, bal) AS (
  SELECT c_custkey, 0, ABS(CAST(round(c_acctbal * 100) AS BIGINT))
  FROM _rec_customer_seed
  UNION ALL
  SELECT custkey, t + 1, bal + (bal * {_REC_RATE_BP}) div 10000
  FROM s WHERE t < {_REC_PERIODS}
)
SELECT f.custkey,
       f0.bal AS seed_cents,
       f.bal AS final_cents,
       f.bal - f0.bal AS interest_cents
FROM s f JOIN s f0 ON f0.custkey = f.custkey AND f0.t = 0
WHERE f.t = {_REC_PERIODS}
"""
    )


# ---------------------------------------------------------------------------
# Three-valued-logic audit: NOT IN vs NOT EXISTS over a NULL-bearing key
# ---------------------------------------------------------------------------


@query(
    "null_semantics_audit",
    oracle="""
WITH dirty AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS k
  FROM orders WHERE year(o_orderdate) = 1999
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_customers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dirty WHERE k IS NULL)
         AS n_null_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM dirty)) AS n_not_in,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM dirty d WHERE d.k = c.c_custkey))
         AS n_not_exists
""",
    tags=("sql-surface", "null-semantics", "F9"),
)
def null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic three-valued-logic trap, pinned as data: customers
    "with no 1999 orders" via NOT IN against a NULL-bearing key column is
    EMPTY whenever any key is NULL (x NOT IN (..., NULL) is never TRUE),
    while NOT EXISTS with an equality predicate gives the intended
    anti-join answer — both engines implement the same ANSI semantics,
    and the hash gate proves this engine preserves them. Spark plans the
    NOT IN as its null-aware anti join (broadcast NAAJ — a dedicated
    operator precisely because naive anti-join would be WRONG here);
    the NOT EXISTS is an ordinary null-rejecting LeftAnti. The audit
    shape matters at 100 TB because dirty FK columns are the norm, and
    a pipeline that silently swaps NOT IN for an anti join changes
    answers."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "_nsa_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_nsa_orders")
    return spark.sql(
        """
WITH dirty AS (
  SELECT CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_custkey END AS k
  FROM _nsa_orders WHERE year(o_orderdate) = 1999
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM _nsa_customer) AS n_customers,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dirty WHERE k IS NULL)
         AS n_null_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM _nsa_customer
        WHERE c_custkey NOT IN (SELECT k FROM dirty)) AS n_not_in,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM _nsa_customer c
        WHERE NOT EXISTS (SELECT 1 FROM dirty d WHERE d.k = c.c_custkey))
         AS n_not_exists
"""
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year (big-big join + star).
# ---------------------------------------------------------------------------
@query(
    "part_profit_by_nation_year",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(3,2)))
                - CAST(p.p_retailprice AS DECIMAL(12,2))
                  * CAST(0.80 AS DECIMAL(3,2))
                  * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE 'red%'
GROUP BY n.n_name, year(o.o_orderdate)
""",
    tags=("J2", "A1", "star-join", "tpch-q9"),
)
def part_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape on this schema's columns (no partsupp table, so
    supply cost is the 80%-of-retail convention): profit per supplier
    nation per order year over a name-filtered part slice. Scale plan:
    the ONLY big-big join is lineitem-orders on the order key (one
    shuffle); part (name-filtered at the scan — LIKE 'red%' pushes as a
    StartsWith), supplier, and nation all broadcast; profit sums through
    exact decimals (scale-6 subtraction, no intermediate rounding) with
    one terminal cast to double, so partial-aggregation order can't
    move the hash. The grouping keys arrive from broadcast sides, so
    the rollup re-partitions only (nation, year) — 175 groups, combined
    map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    cost_rate = F.lit("0.80").cast("decimal(3,2)")
    amount = money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - rate("l_discount")
    ) - money("p_retailprice") * cost_rate * money("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item reporting — top customers by lost revenue.
# ---------------------------------------------------------------------------
@query(
    "returned_item_customers",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    tags=("J1", "A1", "W2", "tpch-q10"),
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: which customers returned the most revenue in a
    half-year window — join + group + global top-20. Scale plan: the
    date filter pushes to the orders scan and the return flag to the
    lineitem scan BEFORE the one big-big orderkey shuffle; customer
    joins on custkey (second shuffle, already reduced to the surviving
    orders); nation broadcasts. The top-20 runs as
    TakeOrderedAndProject — no global sort materializes — with the
    custkey tiebreak making the cut deterministic when revenues tie.
    Revenue is the exact-decimal sum cast once to double (identical
    IEEE sequence to the oracle), so the ORDER BY can't flap."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    revenue = money("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - rate("l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 shape: important-stock identification — global scalar threshold.
# ---------------------------------------------------------------------------
@query(
    "supplier_part_value_share",
    oracle="""
WITH v AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey < 13
  GROUP BY l_suppkey, l_partkey
),
t AS (SELECT SUM(val) AS tot, COUNT(*) AS n FROM v)
SELECT v.l_suppkey AS supp_key, v.l_partkey AS part_key,
       CAST(v.val AS DOUBLE) AS line_value
FROM v, t
WHERE v.val * t.n > t.tot * 2
""",
    tags=("A1", "subquery-scalar", "tpch-q11"),
)
def supplier_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape on this schema's columns (no partsupp: the
    (supplier, part) inventory value is re-derived from shipped
    lineitems): keep the (suppkey, partkey) groups whose value exceeds
    a SCALE-FREE threshold — more than 2x the mean group value over the
    nation slice (TPC-H itself divides its fraction by SF for exactly
    this reason: a fixed fraction of the total empties as group counts
    grow; the mean-multiple form stays meaningful at any scale). Scale
    plan: supplier (nation-filtered) broadcasts into the lineitem scan;
    ONE shuffle builds the (supp, part) aggregate; the grand total
    folds that aggregate to a single row broadcast back as a 1-row
    cross join (the allowlisted scalar-bound BNLJ pattern). Exactness:
    the cut is stated multiplication-only — val*n > tot*2 — entirely in
    decimals and integers (no divide anywhere), so the comparison is
    exact integer arithmetic in both engines; the one double cast
    happens on output."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    v = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_extendedprice")).alias("val"))
        # two consumers (the grand-total scalar and the filtered output)
        # read the aggregate: checkpoint it once so the lineitem scan +
        # (supp, part) shuffle run once instead of once per branch
        .localCheckpoint()
    )
    thresh = v.agg(
        F.sum("val").alias("tot"),
        F.count(F.lit(1)).cast("decimal(12,0)").alias("n"),
    )
    return (
        v.crossJoin(F.broadcast(thresh))
        .filter(F.col("val") * F.col("n") > F.col("tot") * F.lit(2))
        .select(
            F.col("l_suppkey").alias("supp_key"),
            F.col("l_partkey").alias("part_key"),
            F.col("val").cast("double").alias("line_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier variety per part class, with an exclusion anti-join.
# ---------------------------------------------------------------------------
@query(
    "part_supplier_variety",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    tags=("A4", "anti-join", "tpch-q16"),
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape on this schema's columns (no s_comment, so the
    complaint exclusion becomes the negative-balance exclusion — the
    anti-join survives): how many DISTINCT suppliers serve each
    (brand, type, size) class, excluding a blacklist. Scale plan: the
    three part predicates (<>, <>, IN-list) all push to the part scan,
    which then broadcasts; the blacklist is a handful of rows —
    broadcast LEFT ANTI (s_suppkey is non-null, so NOT IN and the anti
    join agree); COUNT(DISTINCT) runs as the standard two-phase expand
    (partial distinct on (class, suppkey) map-side, then the count) —
    one logical shuffle keyed on the class."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested semi-join chain — suppliers with excess shipped stock.
# ---------------------------------------------------------------------------
@query(
    "excess_stock_suppliers",
    oracle="""
SELECT s.s_suppkey, s.s_name, s.s_nationkey
FROM supplier s
WHERE s.s_nationkey < 8
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'red%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 40
  )
""",
    tags=("subquery-exists", "J5", "tpch-q20"),
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape on this schema's columns (no partsupp, so
    "availqty" is the quantity actually shipped in the year): suppliers
    in a nation slice who moved more than the threshold of any
    name-filtered part — the nested IN → grouped HAVING → semi-join
    chain. Scale plan: part filters at its scan (StartsWith pushdown)
    and broadcasts; the ship-year filter prunes lineitem BEFORE its one
    (suppkey, partkey) aggregation shuffle; the HAVING survivors
    project to a distinct supplier-key set that joins LEFT SEMI (the IN
    decorrelation) against the nation-filtered supplier dim. The
    threshold compares exact decimals, so the HAVING cut is
    deterministic."""
    supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 8)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(money("l_quantity")).alias("shipped"))
        .filter(F.col("shipped") > F.lit("40").cast("decimal(12,2)"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
    )
