"""Cross-venue econometrics beyond the lead-lag family: pair
cointegration (Engle-Granger) — the statistical foundation of pairs
trading on the two-venue tape.

The reference's scanner acts on INSTANTANEOUS cross-venue price gaps
(`/root/reference/virginia/logic/opportunity_scanner.py:269-344`); the
question its users ask next is whether the two venue prices share a
long-run equilibrium at all — i.e. whether the spread is
mean-reverting (tradeable) or a random walk (a trend, not an edge).
Engle-Granger answers it in two OLS steps, both of which reduce to
exact integer cross-moments here, so the whole test is one window pass
plus one aggregation per pair.

Exactness discipline: every data-dependent sum is an exact int64
cross-moment (prices are small bounded ints, <= 30 daily observations
per pair, sums < 10^6 — no overflow at any SF since scale adds PAIRS,
not days). The two OLS solves and the ADF t-statistic are a fixed IEEE
double tree over those integers; the tree's SQL text is generated from
the SAME Python fragments for both Spark (`selectExpr`) and the DuckDB
oracle, so the engines evaluate a structurally identical expression —
bit-equal results by construction (int64 -> double conversions are
lossless at these magnitudes; sqrt is IEEE correctly-rounded in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import query
from ..sources.tables import load_table

_DAY_US = 86_400_000_000

# ---------------------------------------------------------------------------
# The fixed IEEE float tree, shared TEXTUALLY between Spark and DuckDB.
#
# Stage 1 (hedge OLS  p = alpha + beta*k + e):
#   dd = m*Skk - Sk^2,  na = Sp*Skk - Sk*Spk,  nb = m*Spk - Sk*Sp  (int64)
#   a = na/dd, b = nb/dd
# Stage 2 (Dickey-Fuller on residuals e_t = p_t - a - b*k_t, no
# constant — residuals are OLS-centered):  de_t = rho*e_{t-1} + u_t
#   rho  = (S[e'e] - S[e'^2]) / S[e'^2]
#   SSR  = S[de^2] - S[e'de]^2 / S[e'^2]
#   t    = rho * sqrt(S[e'^2]*(m-1)/SSR)
# where each S[.] expands into the int64 lagged cross-moments below
# (e is affine in (p, k), so its second moments are polynomial in the
# raw moments with coefficients 1, a, b).
# ---------------------------------------------------------------------------
_E_A = "CAST(na AS DOUBLE) / CAST(dd AS DOUBLE) AS a"
_E_B = "CAST(nb AS DOUBLE) / CAST(dd AS DOUBLE) AS b"
_E_SPREV2 = (
    "CAST(sp2p AS DOUBLE) - 2*a*CAST(spp AS DOUBLE)"
    " - 2*b*CAST(spkp AS DOUBLE) + CAST(m AS DOUBLE)*a*a"
    " + 2*a*b*CAST(skp AS DOUBLE) + b*b*CAST(sk2p AS DOUBLE) AS sprev2"
)
_E_SCUR2 = (
    "CAST(sp2c AS DOUBLE) - 2*a*CAST(spc AS DOUBLE)"
    " - 2*b*CAST(spkc AS DOUBLE) + CAST(m AS DOUBLE)*a*a"
    " + 2*a*b*CAST(skc AS DOUBLE) + b*b*CAST(sk2c AS DOUBLE) AS scur2"
)
_E_SCROSS = (
    "CAST(xpp AS DOUBLE) - a*CAST(spp AS DOUBLE) - b*CAST(xpk AS DOUBLE)"
    " - a*CAST(spc AS DOUBLE) + CAST(m AS DOUBLE)*a*a"
    " + a*b*CAST(skc AS DOUBLE) - b*CAST(xkp AS DOUBLE)"
    " + a*b*CAST(skp AS DOUBLE) + b*b*CAST(xkk AS DOUBLE) AS scross"
)
_E_SNUM = "scross - sprev2 AS snum"
_E_SDD2 = "scur2 - 2*scross + sprev2 AS sdd2"
_E_RHO = "snum / sprev2 AS adf_rho"
_E_SSR = "sdd2 - (snum*snum)/sprev2 AS ssr"
_E_T = "adf_rho * sqrt((sprev2 * CAST(m - 1 AS DOUBLE)) / ssr) AS adf_t"
# Dickey-Fuller 5% critical value, no-constant specification
_E_FLAG = "adf_t < CAST('-1.95' AS DOUBLE) AS cointegrated"

_FINAL_COLS = (
    "pair_key, m, dd, na, nb, a AS alpha, b AS beta, adf_rho, adf_t, "
    "cointegrated"
)

_COINT_ORACLE = f"""
WITH closes AS (
  SELECT user_id AS pair_key, epoch_us(ts) // {_DAY_US} AS bkt,
         arg_max(CASE WHEN event_type IN ('click', 'view')
                      THEN CAST(round(value * 100) AS BIGINT) % 97 + 1 END,
                 epoch_us(ts) * 4096 + event_id % 4096)
           FILTER (event_type IN ('click', 'view')) AS k,
         arg_max(CASE WHEN event_type IN ('purchase', 'signup', 'error')
                      THEN CAST(round(value * 100) AS BIGINT) % 99 + 1 END,
                 epoch_us(ts) * 4096 + event_id % 4096)
           FILTER (event_type IN ('purchase', 'signup', 'error')) AS p
  FROM events GROUP BY 1, 2
),
both_sides AS (
  SELECT pair_key, bkt, k, p FROM closes
  WHERE k IS NOT NULL AND p IS NOT NULL
),
lagged AS (
  SELECT pair_key, bkt, k AS kc, p AS pc,
         LAG(k) OVER w AS kp, LAG(p) OVER w AS pp,
         LAG(bkt) OVER w AS bkt1
  FROM both_sides WINDOW w AS (PARTITION BY pair_key ORDER BY bkt)
),
obs AS (
  SELECT pair_key, pc, kc, pp, kp
  FROM lagged WHERE bkt1 = bkt - 1
),
mom AS (
  SELECT pair_key,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(pc) AS BIGINT) AS spc,
         CAST(SUM(kc) AS BIGINT) AS skc,
         CAST(SUM(pp) AS BIGINT) AS spp,
         CAST(SUM(kp) AS BIGINT) AS skp,
         CAST(SUM(pc * pc) AS BIGINT) AS sp2c,
         CAST(SUM(kc * kc) AS BIGINT) AS sk2c,
         CAST(SUM(pp * pp) AS BIGINT) AS sp2p,
         CAST(SUM(kp * kp) AS BIGINT) AS sk2p,
         CAST(SUM(pc * kc) AS BIGINT) AS spkc,
         CAST(SUM(pp * kp) AS BIGINT) AS spkp,
         CAST(SUM(pp * pc) AS BIGINT) AS xpp,
         CAST(SUM(kp * kc) AS BIGINT) AS xkk,
         CAST(SUM(pp * kc) AS BIGINT) AS xpk,
         CAST(SUM(kp * pc) AS BIGINT) AS xkp
  FROM obs GROUP BY pair_key
),
ints AS (
  SELECT *, m * sk2c - skc * skc AS dd,
         spc * sk2c - skc * spkc AS na,
         m * spkc - skc * spc AS nb
  FROM mom WHERE m >= 8 AND m * sk2c - skc * skc > 0
),
f1 AS (SELECT *, {_E_A}, {_E_B} FROM ints),
f2 AS (SELECT *, {_E_SPREV2}, {_E_SCUR2}, {_E_SCROSS} FROM f1),
f3 AS (SELECT *, {_E_SNUM}, {_E_SDD2} FROM f2
       WHERE sprev2 > CAST('0' AS DOUBLE)),
f4 AS (SELECT *, {_E_RHO}, {_E_SSR} FROM f3),
f5 AS (SELECT *, {_E_T} FROM f4 WHERE ssr > CAST('0' AS DOUBLE)),
f6 AS (SELECT *, {_E_FLAG} FROM f5)
SELECT {_FINAL_COLS} FROM f6
"""


@query(
    "pair_cointegration_test",
    oracle=_COINT_ORACLE,
    tags=("J1", "A2", "econometrics", "finance"),
)
def pair_cointegration_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle-Granger cointegration test per pair: are the Kalshi and
    Polymarket daily closes of the same pair tied to a long-run
    equilibrium? Step 1 fits the hedge ratio (OLS p on k); step 2 runs
    a Dickey-Fuller unit-root test on the residual spread (no
    constant — residuals are OLS-centered by construction). adf_t
    below the 5% critical value (-1.95) = the spread mean-reverts =
    the pair is statistically arbitrageable; a unit root = the venues
    drift apart and the instantaneous-gap scanner is picking up trend,
    not edge. The capstone over venue_lead_lag (correlation) and
    granger_lead_lag (causation): equilibrium.

    Exactness: residual moments are never summed as floats — S[e'^2],
    S[e'e], S[e^2] expand algebraically into 15 exact int64 lagged
    cross-moments (e is affine in (p, k)), and both OLS solves + the
    t-statistic are ONE fixed IEEE tree whose SQL text is shared
    verbatim with the oracle (module fragments _E_*). Degenerate pairs
    are excluded by integer gates (m >= 8, dd > 0) and same-tree float
    gates (sprev2 > 0, ssr > 0).

    Plan: venue-conditional max_by closes per (pair, day) in ONE scan
    of the tape (raw ticks never shuffle — granger_lead_lag's idiom at
    timeseries.py:3050); one pair-keyed window for the LAG pass; the
    per-pair moment rollup rides the window's exchange (subset rule).
    Two exchanges total, both over the tiny daily-close table."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    is_kalshi = F.col("event_type").isin("click", "view")
    okey = F.expr("(ts div 1000) * 4096 + event_id % 4096")
    closes = (
        ev.groupBy(
            F.col("user_id").alias("pair_key"),
            F.expr(f"(ts div 1000) div {_DAY_US}").alias("bkt"),
        )
        .agg(
            F.max_by(cents % 97 + 1, F.when(is_kalshi, okey)).alias("k"),
            F.max_by(cents % 99 + 1, F.when(~is_kalshi, okey)).alias("p"),
        )
        .filter(F.col("k").isNotNull() & F.col("p").isNotNull())
    )
    w = Window.partitionBy("pair_key").orderBy("bkt")
    obs = (
        closes.select(
            "pair_key",
            "bkt",
            F.col("p").alias("pc"),
            F.col("k").alias("kc"),
            F.lag("p").over(w).alias("pp"),
            F.lag("k").over(w).alias("kp"),
            F.lag("bkt").over(w).alias("bkt1"),
        )
        .filter(F.col("bkt1") == F.col("bkt") - 1)
    )
    mom = obs.groupBy("pair_key").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("pc").alias("spc"),
        F.sum("kc").alias("skc"),
        F.sum("pp").alias("spp"),
        F.sum("kp").alias("skp"),
        F.sum(F.col("pc") * F.col("pc")).alias("sp2c"),
        F.sum(F.col("kc") * F.col("kc")).alias("sk2c"),
        F.sum(F.col("pp") * F.col("pp")).alias("sp2p"),
        F.sum(F.col("kp") * F.col("kp")).alias("sk2p"),
        F.sum(F.col("pc") * F.col("kc")).alias("spkc"),
        F.sum(F.col("pp") * F.col("kp")).alias("spkp"),
        F.sum(F.col("pp") * F.col("pc")).alias("xpp"),
        F.sum(F.col("kp") * F.col("kc")).alias("xkk"),
        F.sum(F.col("pp") * F.col("kc")).alias("xpk"),
        F.sum(F.col("kp") * F.col("pc")).alias("xkp"),
    )
    ints = mom.selectExpr(
        "*",
        "m * sk2c - skc * skc AS dd",
        "spc * sk2c - skc * spkc AS na",
        "m * spkc - skc * spc AS nb",
    ).filter("m >= 8 AND dd > 0")
    f1 = ints.selectExpr("*", _E_A, _E_B)
    f2 = f1.selectExpr("*", _E_SPREV2, _E_SCUR2, _E_SCROSS)
    f3 = f2.filter("sprev2 > CAST('0' AS DOUBLE)").selectExpr(
        "*", _E_SNUM, _E_SDD2
    )
    f4 = f3.selectExpr("*", _E_RHO, _E_SSR)
    f5 = f4.filter("ssr > CAST('0' AS DOUBLE)").selectExpr("*", _E_T)
    f6 = f5.selectExpr("*", _E_FLAG)
    return f6.selectExpr(*[c.strip() for c in _FINAL_COLS.split(",")])


# ---------------------------------------------------------------------------
# Pairwise covariance/correlation matrix over the top-K active pairs
# ---------------------------------------------------------------------------
_COV_TOP_K = 20


def _cov_obs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(pair, day) consecutive-day moves of the top-K universe (the
    Spark half of `_COV_CELLS_SQL`'s obs CTE), shared by the covariance
    matrix, the risk PCA, and the factor-residual decomposition."""
    q = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.expr("ts div 1000").alias("ts_us"),
            "event_id",
            F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        )
    )
    act = (
        q.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_quotes"))
        .orderBy(F.col("n_quotes").desc(), F.col("user_id"))
        .limit(_COV_TOP_K)
        .select("user_id")
    )
    closes = (
        q.join(F.broadcast(act), "user_id")
        .groupBy(
            F.col("user_id").alias("pair_key"),
            F.expr(f"ts_us div {_DAY_US}").alias("day"),
        )
        .agg(
            F.max_by(
                "cents", F.expr("ts_us * 4096 + event_id % 4096")
            ).alias("close_c")
        )
    )
    w = Window.partitionBy("pair_key").orderBy("day")
    mv = closes.select(
        "pair_key",
        "day",
        (F.col("close_c") - F.lag("close_c").over(w)).alias("m"),
        (F.col("day") - F.lag("day").over(w)).alias("dgap"),
    )
    return mv.filter(F.col("dgap") == 1).select("pair_key", "day", "m")


def _cov_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cell moments over `_cov_obs` (the Spark half of
    `_COV_CELLS_SQL`'s cells CTE)."""
    obs = _cov_obs(spark, sf_dir)
    a = obs.select(
        F.col("pair_key").alias("pair_a"), "day", F.col("m").alias("ma")
    )
    b = obs.select(
        F.col("pair_key").alias("pair_b"), "day", F.col("m").alias("mb")
    )
    return (
        a.join(b, (a.day == b.day) & (F.col("pair_a") <= F.col("pair_b")))
        .groupBy("pair_a", "pair_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ma").alias("sx"),
            F.sum("mb").alias("sy"),
            F.sum(F.col("ma") * F.col("mb")).alias("sxy"),
            F.sum(F.col("ma") * F.col("ma")).alias("sx2"),
            F.sum(F.col("mb") * F.col("mb")).alias("sy2"),
        )
    )


# The top-K daily-move covariance CELL chain, shared by the matrix query
# and the PCA on top of it (both oracles splice it verbatim).
_COV_CELLS_SQL = f"""q AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'view'
),
act AS (
  SELECT user_id, COUNT(*) AS n_quotes FROM q GROUP BY user_id
  QUALIFY ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, user_id)
          <= {_COV_TOP_K}
),
closes AS (
  SELECT q.user_id AS pair_key, q.ts_us // {_DAY_US} AS day,
         arg_max(q.cents, q.ts_us * 4096 + q.event_id % 4096) AS close_c
  FROM q JOIN act ON act.user_id = q.user_id
  GROUP BY q.user_id, q.ts_us // {_DAY_US}
),
mv AS (
  SELECT pair_key, day,
         close_c - LAG(close_c) OVER w AS m,
         day - LAG(day) OVER w AS dgap
  FROM closes WINDOW w AS (PARTITION BY pair_key ORDER BY day)
),
obs AS MATERIALIZED (SELECT pair_key, day, m FROM mv WHERE dgap = 1),
cells AS (
  SELECT a.pair_key AS pair_a, b.pair_key AS pair_b,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a.m) AS BIGINT) AS sx,
         CAST(SUM(b.m) AS BIGINT) AS sy,
         CAST(SUM(a.m * b.m) AS BIGINT) AS sxy,
         CAST(SUM(a.m * a.m) AS BIGINT) AS sx2,
         CAST(SUM(b.m * b.m) AS BIGINT) AS sy2
  FROM obs a JOIN obs b ON a.day = b.day AND a.pair_key <= b.pair_key
  GROUP BY a.pair_key, b.pair_key
)"""


@query(
    "pair_covariance_matrix",
    oracle=f"""
WITH {_COV_CELLS_SQL}
SELECT pair_a, pair_b, n,
       n * sxy - sx * sy AS cov_num,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM cells
WHERE n >= 5 AND n * sx2 > sx * sx AND n * sy2 > sy * sy
""",
    tags=("J1", "econometrics", "finance", "risk"),
)
def pair_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COVARIANCE/CORRELATION MATRIX of daily moves over the
    top-{_COV_TOP_K} most-quoted pairs — the input every portfolio-risk
    computation (VaR aggregation, hedge construction, concentration
    limits) starts from. Restricting to a top-K slice is the 100 TB
    shape: the full pairwise matrix is quadratic in pairs, so
    production risk systems estimate it over the liquid universe (and
    factor-model the tail) — here the K×K cell space is bounded by
    construction (day-aligned equi-join over K pairs' daily moves,
    never a corpus self-join).

    Exactness: per-cell moments are exact int64; cov_num = n·Σxy−ΣxΣy
    stays int64; the correlation is the fixed two-sqrt IEEE tree (the
    venue_lead_lag/signal_ic tree); degenerate cells gated by integer
    variance tests, thin cells by n >= 5. Diagonal cells (pair_a =
    pair_b) carry the variances, so the result IS the full symmetric
    matrix in upper-triangular form.

    Plan: activity top-K via a map-combined count + TakeOrdered (no
    global sort); closes aggregate map-combined per (pair, day); one
    pair window for LAG; the day-keyed matrix join shuffles only the
    K-pair move table (K·days rows)."""
    cells = _cov_cells(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return cells.filter(
        (F.col("n") >= 5)
        & (F.col("n") * F.col("sx2") > F.col("sx") * F.col("sx"))
        & (F.col("n") * F.col("sy2") > F.col("sy") * F.col("sy"))
    ).select(
        "pair_a",
        "pair_b",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "cov_num"
        ),
        (
            (d("n") * d("sxy") - d("sx") * d("sy"))
            / (
                F.sqrt(d("n") * d("sx2") - d("sx") * d("sx"))
                * F.sqrt(d("n") * d("sy2") - d("sy") * d("sy"))
            )
        ).alias("corr"),
    )


# ---------------------------------------------------------------------------
# Portfolio risk PCA: top eigenvector of the K x K covariance matrix
# ---------------------------------------------------------------------------
_PCA_ROUNDS = 4
_PCA_SCALE = 100_000


def _pca_rounds_sql() -> str:
    """The unrolled integer power iteration (declared rounds, truncating
    rescale) — identical arithmetic to the driver loop in
    `portfolio_risk_pca`."""
    parts = []
    for r in range(1, _PCA_ROUNDS + 1):
        prev = f"v{r - 1}"
        # every CTE here is multiply-referenced downstream — without
        # MATERIALIZED, DuckDB 1.0 re-inlines each reference and the
        # unrolled rounds recompute the cell chain ~3^rounds times
        # (the dup_graph_kcore lesson)
        parts.append(f"""w{r} AS MATERIALIZED (
  SELECT s.i AS pair_key, CAST(SUM(s.a * v.v) AS BIGINT) AS w
  FROM sym s JOIN {prev} v ON v.pair_key = s.j GROUP BY 1
),
st{r} AS MATERIALIZED (
  SELECT MAX(ABS(w)) // {_PCA_SCALE} + 1 AS step FROM w{r}
),
v{r} AS MATERIALIZED (
  SELECT pair_key,
         CASE WHEN w >= 0 THEN w // (SELECT step FROM st{r})
              ELSE -((-w) // (SELECT step FROM st{r})) END AS v
  FROM w{r}
)""")
    return ",\n".join(parts)


_PCA_ORACLE = f"""
WITH {_COV_CELLS_SQL},
sym AS MATERIALIZED (
  SELECT pair_a AS i, pair_b AS j, n * sxy - sx * sy AS a FROM cells
  UNION ALL
  SELECT pair_b, pair_a, n * sxy - sx * sy FROM cells WHERE pair_a <> pair_b
),
v0 AS (SELECT DISTINCT i AS pair_key, CAST({_PCA_SCALE} AS BIGINT) AS v
       FROM sym),
{_pca_rounds_sql()},
sgn AS (
  SELECT COALESCE((SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END
                   FROM v{_PCA_ROUNDS} WHERE v <> 0
                   ORDER BY pair_key LIMIT 1), 1) AS f
),
tot AS (SELECT SUM(v * v) AS s2 FROM v{_PCA_ROUNDS})
SELECT t.pair_key,
       CAST(t.v * (SELECT f FROM sgn) AS BIGINT) AS loading,
       CAST(CASE WHEN (SELECT s2 FROM tot) > 0
            THEN (t.v * t.v * 1000000) // (SELECT s2 FROM tot)
            ELSE 0 END AS BIGINT) AS variance_share_ppm
FROM v{_PCA_ROUNDS} t
"""


def _pca_loadings(spark: SparkSession, sf_dir: str):
    """(universe, raw loading dict, orientation flip) from the bounded
    driver-side power iteration — shared by `portfolio_risk_pca` and
    `factor_residual_risk`. Pure integer arithmetic, identical to the
    oracle's unrolled rounds (truncating divides throughout)."""
    cells = _cov_cells(spark, sf_dir).select(
        "pair_a",
        "pair_b",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("a"),
    )
    rows = cells.collect()  # bounded: K*(K+1)/2 cells, K = _COV_TOP_K
    sym: dict[tuple[int, int], int] = {}
    for r in rows:
        sym[(r.pair_a, r.pair_b)] = r.a
        if r.pair_a != r.pair_b:
            sym[(r.pair_b, r.pair_a)] = r.a
    universe = sorted({i for i, _ in sym})
    v = {i: _PCA_SCALE for i in universe}
    for _ in range(_PCA_ROUNDS):
        w = {i: 0 for i in universe}
        for (i, j), a in sym.items():
            w[i] += a * v[j]
        step = max(abs(x) for x in w.values()) // _PCA_SCALE + 1
        v = {
            i: (abs(x) // step if x >= 0 else -(abs(x) // step))
            for i, x in w.items()
        }
    flip = 1
    for i in universe:
        if v[i] != 0:
            flip = -1 if v[i] < 0 else 1
            break
    return universe, v, flip


@query(
    "portfolio_risk_pca",
    oracle=_PCA_ORACLE,
    tags=("econometrics", "finance", "risk", "iterative", "linalg"),
)
def portfolio_risk_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DOMINANT RISK FACTOR of the top-{_COV_TOP_K} pair universe:
    the first eigenvector of the K x K daily-move covariance matrix
    (`pair_covariance_matrix`'s cell table, shared builder), computed by
    {_PCA_ROUNDS} declared rounds of INTEGER power iteration with a
    truncating rescale each round — the `embedding_top_eigvec`
    discipline applied to portfolio risk. Loadings answer the risk
    question the covariance matrix only sets up: how much of the book's
    variance is ONE factor (market mode), and which pairs carry it —
    the input to hedge construction and concentration limits.
    Orientation is pinned (the first nonzero loading by pair order is
    made positive), so the eigenvector's sign ambiguity cannot flap the
    hash; `variance_share_ppm` = v_i^2 / |v|^2 in exact ppm.

    Exactness: the matrix entries are exact int64 cov numerators
    (n*Sxy - Sx*Sy); every matvec is an int64 sum (magnitudes bounded:
    |a| <~ 2e11, |v| <= {_PCA_SCALE}, K = {_COV_TOP_K} => |w| < 1e18);
    the rescale is a truncating divide — identical in Python, Spark and
    DuckDB — so the oracle unrolls the SAME rounds and value-hash
    equality proves the whole iteration, not just the final rotation.

    Plan/scale shape: the cell table is K x K-BOUNDED by construction
    (the pair_covariance_matrix argument), so collecting it to the
    driver for the K-dimensional iteration is the same bounded-state
    pattern as the k-means centroid loop — at 100 TB the data-sized
    work is the cell aggregation, which shuffles only the K-pair move
    table."""
    universe, v, flip = _pca_loadings(spark, sf_dir)
    s2 = sum(x * x for x in v.values())
    out = [
        (
            i,
            v[i] * flip,
            (v[i] * v[i] * 1_000_000) // s2 if s2 > 0 else 0,
        )
        for i in universe
    ]
    return spark.createDataFrame(
        out, "pair_key bigint, loading bigint, variance_share_ppm bigint"
    )


# ---------------------------------------------------------------------------
# Factor-residual decomposition: how much of each pair's variance the
# dominant factor explains, and what is genuinely idiosyncratic
# ---------------------------------------------------------------------------
_FAC_W_DIV = 1000  # loading -> factor weight downscale, keeps every
#                    int64 moment bounded (see overflow ledger below)

_E_BETA = "CAST(cmf AS DOUBLE) / CAST(cf2 AS DOUBLE) AS beta"
_E_R2 = (
    "(CAST(cmf AS DOUBLE) * CAST(cmf AS DOUBLE))"
    " / (CAST(cm2 AS DOUBLE) * CAST(cf2 AS DOUBLE)) AS factor_r2"
)
_E_IDIO = "CAST('1' AS DOUBLE) - factor_r2 AS idio_share"

_FAC_ORACLE = f"""
WITH {_COV_CELLS_SQL},
sym AS MATERIALIZED (
  SELECT pair_a AS i, pair_b AS j, n * sxy - sx * sy AS a FROM cells
  UNION ALL
  SELECT pair_b, pair_a, n * sxy - sx * sy FROM cells WHERE pair_a <> pair_b
),
v0 AS (SELECT DISTINCT i AS pair_key, CAST({_PCA_SCALE} AS BIGINT) AS v
       FROM sym),
{_pca_rounds_sql()},
sgn AS (
  SELECT COALESCE((SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END
                   FROM v{_PCA_ROUNDS} WHERE v <> 0
                   ORDER BY pair_key LIMIT 1), 1) AS f
),
wts AS MATERIALIZED (
  SELECT pair_key, (v * (SELECT f FROM sgn)) // {_FAC_W_DIV} AS w
  FROM v{_PCA_ROUNDS}
),
fac AS MATERIALIZED (
  SELECT o.day, CAST(SUM(w.w * o.m) AS BIGINT) AS f
  FROM obs o JOIN wts w ON w.pair_key = o.pair_key
  GROUP BY o.day
),
mom AS (
  SELECT o.pair_key,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(o.m) AS BIGINT) AS sm,
         CAST(SUM(fc.f) AS BIGINT) AS sf,
         CAST(SUM(o.m * fc.f) AS BIGINT) AS smf,
         CAST(SUM(o.m * o.m) AS BIGINT) AS sm2,
         CAST(SUM(fc.f * fc.f) AS BIGINT) AS sf2
  FROM obs o JOIN fac fc ON fc.day = o.day
  GROUP BY 1
),
ints AS (
  SELECT *, n * smf - sm * sf AS cmf,
         n * sm2 - sm * sm AS cm2,
         n * sf2 - sf * sf AS cf2
  FROM mom
  WHERE n >= 5 AND n * sm2 > sm * sm AND n * sf2 > sf * sf
),
f1 AS (SELECT *, {_E_BETA}, {_E_R2} FROM ints),
f2 AS (SELECT *, {_E_IDIO} FROM f1)
SELECT pair_key, n, cmf, cm2, cf2, beta, factor_r2, idio_share FROM f2
"""


@query(
    "factor_residual_risk",
    oracle=_FAC_ORACLE,
    tags=("econometrics", "finance", "risk", "iterative"),
)
def factor_residual_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step AFTER `portfolio_risk_pca`: regress every pair's daily
    moves on the DOMINANT FACTOR's realized series (f_t = sum of
    loading-weighted moves of the pairs observed that day) and split
    each pair's variance into factor-explained (factor_r2) and
    IDIOSYNCRATIC (idio_share = 1 - r2) — the decomposition hedge
    construction actually consumes: beta says how much market-mode
    exposure to hedge, idio_share says how much risk survives the
    hedge.

    Exactness/overflow ledger: loadings (<= {_PCA_SCALE}) downscale by
    {_FAC_W_DIV} to weights <= 100, so |f_t| <= K*100*|m| <= 2e7,
    Sf2 <= 30*4e14 = 1.2e16 and every c-term (n*S.. - S..*S..) stays
    int64 with >1 order of headroom. The beta/r2 tail is the shared
    two-term IEEE tree (_E_BETA/_E_R2/_E_IDIO spliced verbatim into
    both engines); degenerate pairs gated by integer variance tests.

    Plan/scale: the factor series is a day-keyed aggregation of the
    K-pair move table (tiny); the per-pair moment rollup joins obs to
    the broadcast-sized factor series — nothing corpus-sized shuffles
    beyond the close aggregation the whole family shares. The PCA
    weights come from the bounded driver iteration (`_pca_loadings`),
    exactly as the oracle unrolls them."""
    universe, v, flip = _pca_loadings(spark, sf_dir)

    def trunc_div(x: int, d: int) -> int:
        return abs(x) // d if x >= 0 else -(abs(x) // d)

    wts = [(i, trunc_div(v[i] * flip, _FAC_W_DIV)) for i in universe]
    wdf = spark.createDataFrame(wts, "pair_key long, w long")
    obs = _cov_obs(spark, sf_dir)
    fac = (
        obs.join(F.broadcast(wdf), "pair_key")
        .groupBy("day")
        .agg(F.sum(F.col("w") * F.col("m")).cast("long").alias("f"))
    )
    mom = (
        obs.join(fac, "day")
        .groupBy("pair_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("m").alias("sm"),
            F.sum("f").alias("sf"),
            F.sum(F.col("m") * F.col("f")).alias("smf"),
            F.sum(F.col("m") * F.col("m")).alias("sm2"),
            F.sum(F.col("f") * F.col("f")).alias("sf2"),
        )
    )
    ints = mom.filter(
        (F.col("n") >= 5)
        & (F.col("n") * F.col("sm2") > F.col("sm") * F.col("sm"))
        & (F.col("n") * F.col("sf2") > F.col("sf") * F.col("sf"))
    ).selectExpr(
        "*",
        "n * smf - sm * sf AS cmf",
        "n * sm2 - sm * sm AS cm2",
        "n * sf2 - sf * sf AS cf2",
    )
    f1 = ints.selectExpr("*", _E_BETA, _E_R2)
    f2 = f1.selectExpr("*", _E_IDIO)
    return f2.selectExpr(
        "pair_key", "n", "cmf", "cm2", "cf2", "beta", "factor_r2",
        "idio_share",
    )
