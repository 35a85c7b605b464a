"""Round-14 window seeds, batch A: the 19 first-time queries that join the
31-name R13_POOL to form the round-13 DRIVER_WINDOW (50 first-time names).

Families chosen to keep live window anchors on §2.2 rows the pool does not
itself cover: anti/except/decorrelated-subquery joins, an as-of self-join,
an ORC partitioned sink roundtrip, a Python-DataSource degree histogram, a
graph radius/center golden, integer-exact trend/association/runs/circular
statistics, and embedding/text censuses. Every float that crosses the
driver's value hash is either exact decimal/integer arithmetic surfaced as
DOUBLE, a single IEEE op on identical inputs, or an 8dp-rounded term summed
as DECIMAL — the repo-wide cross-engine discipline (queries/helpers.py).
All parity-verified at sf0.001/0.01/0.1 at registration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import (
    dec,
    dsum,
    scratch_dir,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


def _daily_orders_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, rev) daily order revenue with rev an EXACT DECIMAL sum, so
    every pairwise comparison downstream (trend signs, run signs, cusum
    ranks) is integer-exact, never a float race. ~2.4k rows at any SF —
    the bounded per-period aggregate contract shared by every daily-series
    statistic in this repo."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )


_DAILY_SQL = """
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
"""


# --- Mann-Kendall trend test ------------------------------------------------------


@query(
    "orders_mann_kendall_trend",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    pairs AS (
      SELECT CASE WHEN b.rev > a.rev THEN 1
                  WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(SUM(sgn) AS BIGINT) AS s_stat,
           CAST(COUNT(*) FILTER (sgn = 1) AS BIGINT) AS n_concordant,
           CAST(COUNT(*) FILTER (sgn = -1) AS BIGINT) AS n_discordant,
           CAST(COUNT(*) FILTER (sgn = 0) AS BIGINT) AS n_ties
    FROM pairs
    """,
    tags=("stats", "trend", "mann-kendall", "rank"),
)
def orders_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall S over the daily-revenue series: S = Σ_{i<j}
    sign(x_j − x_i) — the standard nonparametric monotone-trend test,
    INTEGER-exact end to end (revenues compare as decimals, the statistic
    is a sum of ±1/0). The all-pairs join runs over the bounded daily
    AGGREGATE (~2.4k days → ~3M sign pairs however large the fact table),
    the same scale contract as the Kendall/Theil-Sen family."""
    daily = _daily_orders_rev(spark, sf_dir)
    a = daily.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    sgn = (
        F.when(F.col("rb") > F.col("ra"), 1)
        .when(F.col("rb") < F.col("ra"), -1)
        .otherwise(0)
    )
    pairs = a.join(b, F.col("da") < F.col("db")).select(sgn.alias("sgn"))
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        pairs.agg(
            F.sum("sgn").cast("bigint").alias("s_stat"),
            F.count(F.when(F.col("sgn") == 1, 1))
            .cast("bigint")
            .alias("n_concordant"),
            F.count(F.when(F.col("sgn") == -1, 1))
            .cast("bigint")
            .alias("n_discordant"),
            F.count(F.when(F.col("sgn") == 0, 1)).cast("bigint").alias("n_ties"),
        )
        .crossJoin(F.broadcast(n_days))
        .select("n_days", "s_stat", "n_concordant", "n_discordant", "n_ties")
    )


# --- Cramér's V association -------------------------------------------------------


@query(
    "customer_nation_segment_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT c_nationkey AS nk, c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM customer GROUP BY 1, 2
    ), rows_t AS (
      SELECT nk, CAST(SUM(o) AS BIGINT) AS rn FROM obs GROUP BY nk
    ), cols_t AS (
      SELECT seg, CAST(SUM(o) AS BIGINT) AS cn FROM obs GROUP BY seg
    ), tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT nk) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT seg) AS BIGINT) AS c
      FROM obs
    ), terms AS (
      SELECT CAST(ROUND(
               POW(o - CAST(rn AS DOUBLE) * cn / n, 2)
                 / (CAST(rn AS DOUBLE) * cn / n), 8) AS DECIMAL(28,8)) AS t
      FROM obs JOIN rows_t USING (nk) JOIN cols_t USING (seg) CROSS JOIN tot
    )
    SELECT n AS n_customers, r AS n_nations, c AS n_segments,
           ROUND(CAST((SELECT SUM(t) FROM terms) AS DOUBLE), 6) AS chi2,
           ROUND(SQRT(CAST((SELECT SUM(t) FROM terms) AS DOUBLE)
                      / (n * LEAST(r - 1, c - 1))), 6) AS cramers_v
    FROM tot
    """,
    tags=("stats", "association", "cramers-v", "chi-squared"),
)
def customer_nation_segment_cramers_v(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cramér's V between customer nation and market segment — the
    normalized-association companion to the chi² independence screen.
    Observed counts are exact integers over a 25×5 contingency (bounded
    by the dimension domains, never by |customer|); each (O−E)²/E term
    rounds to 8dp and folds as DECIMAL so the chi² sum is order-free;
    V = sqrt(chi²/(N·min(r−1,c−1))) is two IEEE ops on identical
    doubles."""
    c = load_table(spark, sf_dir, "customer")
    obs = c.groupBy(
        F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("seg")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    rows_t = obs.groupBy("nk").agg(F.sum("o").cast("bigint").alias("rn"))
    cols_t = obs.groupBy("seg").agg(F.sum("o").cast("bigint").alias("cn"))
    tot = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count_distinct("nk").cast("bigint").alias("r"),
        F.count_distinct("seg").cast("bigint").alias("c"),
    )
    e = F.col("rn").cast("double") * F.col("cn") / F.col("n")
    term = F.round(F.pow(F.col("o") - e, 2) / e, 8).cast("decimal(28,8)")
    chi2 = (
        obs.join(rows_t, "nk")
        .join(cols_t, "seg")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("t"))
        .agg(F.sum("t").cast("double").alias("chi2_raw"))
    )
    return (
        tot.crossJoin(F.broadcast(chi2))
        .select(
            F.col("n").alias("n_customers"),
            F.col("r").alias("n_nations"),
            F.col("c").alias("n_segments"),
            F.round(F.col("chi2_raw"), 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2_raw")
                    / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# --- Wald-Wolfowitz runs test -----------------------------------------------------


@query(
    "orders_daily_updown_runs_test",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    diffs AS (
      SELECT day,
             CASE WHEN rev > LAG(rev) OVER (ORDER BY day) THEN 1
                  WHEN rev < LAG(rev) OVER (ORDER BY day) THEN -1
                  ELSE NULL END AS sgn
      FROM daily
    ), runs AS (
      SELECT sgn,
             CASE WHEN sgn <> LAG(sgn) OVER (ORDER BY day)
                       OR LAG(sgn) OVER (ORDER BY day) IS NULL
                  THEN 1 ELSE 0 END AS new_run
      FROM diffs WHERE sgn IS NOT NULL
    ), agg AS (
      SELECT CAST(COUNT(*) FILTER (sgn = 1) AS BIGINT) AS n_up,
             CAST(COUNT(*) FILTER (sgn = -1) AS BIGINT) AS n_down,
             CAST(SUM(new_run) AS BIGINT) AS n_runs
      FROM runs
    )
    SELECT n_up, n_down, n_runs,
           ROUND((n_runs - (1.0 + 2.0 * n_up * n_down / (n_up + n_down)))
                 / SQRT((2.0 * n_up * n_down
                          * (2.0 * n_up * n_down - (n_up + n_down)))
                        / (CAST(n_up + n_down AS DOUBLE)
                           * (n_up + n_down) * (n_up + n_down - 1.0))),
                 6) AS z_stat
    FROM agg
    """,
    tags=("stats", "runs-test", "wald-wolfowitz", "window"),
)
def orders_daily_updown_runs_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wald-Wolfowitz up/down runs test on daily revenue: sign each
    day-over-day change (exact decimal comparison; flat days drop), count
    maximal same-sign runs, and z-score against the random-ordering null.
    The LAG windows ride the bounded daily series (~2.4k rows — the
    documented per-period-aggregate contract); counts are exact integers
    and z is a fixed chain of IEEE ops on them, identical in both
    engines."""
    daily = _daily_orders_rev(spark, sf_dir)
    w = W.orderBy("day")
    sgn = (
        F.when(F.col("rev") > F.lag("rev").over(w), 1)
        .when(F.col("rev") < F.lag("rev").over(w), -1)
        .otherwise(F.lit(None).cast("int"))
    )
    diffs = daily.select(F.col("day"), sgn.alias("sgn")).where(
        F.col("sgn").isNotNull()
    )
    w2 = W.orderBy("day")
    runs = diffs.select(
        "sgn",
        F.when(
            (F.col("sgn") != F.lag("sgn").over(w2))
            | F.lag("sgn").over(w2).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = runs.agg(
        F.count(F.when(F.col("sgn") == 1, 1)).cast("bigint").alias("n_up"),
        F.count(F.when(F.col("sgn") == -1, 1)).cast("bigint").alias("n_down"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    n1, n2, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    n = n1 + n2
    mu = F.lit(1.0) + F.lit(2.0) * n1 * n2 / n
    var = (F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n)) / (
        n.cast("double") * n * (n - F.lit(1.0))
    )
    return agg.select(
        "n_up",
        "n_down",
        "n_runs",
        F.round((r - mu) / F.sqrt(var), 6).alias("z_stat"),
    )


# --- Rayleigh circular-uniformity test --------------------------------------------

# One Python source of truth for the 24 hour-angle terms: cos/sin of
# 2πh/24 rounded to 8dp, emitted as LITERALS into both the Spark plan and
# the DuckDB oracle, so no libm call happens at query time in either
# engine — the circular statistic is deterministic by construction.
_HOUR_COS = {h: round(math.cos(2 * math.pi * h / 24), 8) for h in range(24)}
_HOUR_SIN = {h: round(math.sin(2 * math.pi * h / 24), 8) for h in range(24)}
_HOUR_TRIG_VALUES = ", ".join(
    f"({h}, {_HOUR_COS[h]!r}, {_HOUR_SIN[h]!r})" for h in range(24)
)


@query(
    "events_hour_rayleigh",
    oracle=f"""
    WITH trig(h, c, s) AS (VALUES {_HOUR_TRIG_VALUES}),
    hist AS (
      SELECT hour(ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), folded AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(SUM(n * CAST(c AS DECIMAL(12,8))) AS DOUBLE) AS c_sum,
             CAST(SUM(n * CAST(s AS DECIMAL(12,8))) AS DOUBLE) AS s_sum
      FROM hist JOIN trig USING (h)
    )
    SELECT n_events, ROUND(c_sum, 6) AS c_sum, ROUND(s_sum, 6) AS s_sum,
           ROUND((c_sum * c_sum + s_sum * s_sum) / n_events, 6)
             AS rayleigh_z
    FROM folded
    """,
    tags=("stats", "circular", "rayleigh", "datetime"),
)
def events_hour_rayleigh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rayleigh test for circular uniformity of event hour-of-day:
    z = R²/n with R² = (Σcosθ)² + (Σsinθ)² — the standard screen for a
    daily-rhythm concentration. The 24 hour angles' cos/sin enter BOTH
    engines as the same pre-rounded 8dp literals (module constant), the
    hour histogram is exact integers, and the sums fold n·trig as exact
    decimal products — so the only float ops are the final squares and
    division, identical IEEE on identical inputs."""
    e = load_table(spark, sf_dir, "events")
    trig = spark.createDataFrame(
        [(h, _HOUR_COS[h], _HOUR_SIN[h]) for h in range(24)],
        "h INT, c DOUBLE, s DOUBLE",
    )
    hist = e.groupBy(F.hour("ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    folded = (
        hist.join(F.broadcast(trig), "h")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum(F.col("n") * F.col("c").cast("decimal(12,8)"))
            .cast("double")
            .alias("c_sum"),
            F.sum(F.col("n") * F.col("s").cast("decimal(12,8)"))
            .cast("double")
            .alias("s_sum"),
        )
    )
    return folded.select(
        "n_events",
        F.round("c_sum", 6).alias("c_sum"),
        F.round("s_sum", 6).alias("s_sum"),
        F.round(
            (F.col("c_sum") * F.col("c_sum") + F.col("s_sum") * F.col("s_sum"))
            / F.col("n_events"),
            6,
        ).alias("rayleigh_z"),
    )


# --- exact covariance / correlation from integer moments --------------------------


@query(
    "lineitem_discount_quantity_cov",
    oracle="""
    WITH q AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_discount AS DECIMAL(8,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(n * sxy - sx * sy AS DOUBLE) AS cov_n2,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS pearson_r
    FROM m
    """,
    tags=("stats", "covariance", "pearson", "integer-exact"),
)
def lineitem_discount_quantity_cov(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pearson correlation between quantity and discount from EXACT
    integer moments: quantity is already integral, discount quantizes to
    cents, and all five sums fold as DECIMAL(38,0) — the n²-scaled
    covariance n·Σxy − Σx·Σy is exact with no division anywhere until
    the final ratio (two casts, one sqrt, one divide — deterministic
    IEEE). The map-side-combining single aggregate is the whole plan."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        F.col("l_quantity").cast("bigint").alias("x"),
        (dec("l_discount", 8, 2) * 100).cast("bigint").alias("y"),
    )
    d38 = "decimal(38,0)"
    m = q.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(d38).alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast(d38).alias("sxy"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_rows"),
        cov.alias("cov_n2"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("pearson_r"),
    )


# --- weekday seasonal strength (variance decomposition) ----------------------------


@query(
    "orders_weekday_seasonal_strength",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1
    ), g AS (
      SELECT date_part('isodow', day) AS dow,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS ng,
             CAST(SUM(rev_c) AS DECIMAL(38,0)) AS sg,
             CAST(SUM(CAST(rev_c AS DECIMAL(38,0)) * rev_c) AS DECIMAL(38,0))
               AS qg
      FROM daily GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(ng) AS DECIMAL(38,0)) AS n,
             CAST(SUM(sg) AS DECIMAL(38,0)) AS s,
             CAST(SUM(qg) AS DECIMAL(38,0)) AS q,
             CAST(SUM(CAST(ROUND(CAST(sg * sg AS DOUBLE)
                                 / CAST(ng AS DOUBLE), 4)
                           AS DECIMAL(38,4))) AS DOUBLE) AS bsum
      FROM g
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND((bsum - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(q AS DOUBLE)
                    - CAST(s * s AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS seasonal_strength
    FROM t
    """,
    tags=("stats", "anova", "seasonality", "isodow"),
)
def orders_weekday_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekday seasonal strength of daily revenue: SSB/SST — the share of
    daily-revenue variance explained by ISO weekday (an ANOVA R², the
    classic seasonality screen). Daily revenues quantize to exact integer
    cents; all raw moments fold as DECIMAL(38,0); the only rounding is
    the 4dp per-group Sg²/ng term (7 terms, decimal-summed, order-free)
    before the final ratio of identical IEEE expressions."""
    daily = load_table(spark, sf_dir, "orders").groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_c"))
    d38 = "decimal(38,0)"
    g = daily.groupBy((F.weekday("day") + 1).alias("dow")).agg(
        F.count(F.lit(1)).cast(d38).alias("ng"),
        F.sum("rev_c").cast(d38).alias("sg"),
        F.sum(F.col("rev_c").cast(d38) * F.col("rev_c")).cast(d38).alias("qg"),
    )
    bterm = F.round(
        (F.col("sg") * F.col("sg")).cast("double") / F.col("ng").cast("double"),
        4,
    ).cast("decimal(38,4)")
    t = g.agg(
        F.sum("ng").cast(d38).alias("n"),
        F.sum("sg").cast(d38).alias("s"),
        F.sum("qg").cast(d38).alias("q"),
        F.sum(bterm).cast("double").alias("bsum"),
    )
    corr = (F.col("s") * F.col("s")).cast("double") / F.col("n").cast("double")
    return t.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(
            (F.col("bsum") - corr) / (F.col("q").cast("double") - corr), 6
        ).alias("seasonal_strength"),
    )


# --- median absolute deviation ----------------------------------------------------


@query(
    "supplier_acctbal_mad",
    oracle="""
    WITH s AS (
      SELECT s_nationkey AS nk,
             CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_c
      FROM supplier
    ), med AS (
      SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY bal_c) AS med_c
      FROM s GROUP BY nk
    ), dev AS (
      SELECT s.nk, med.n_suppliers, med.med_c, ABS(s.bal_c - med.med_c) AS d
      FROM s JOIN med ON s.nk = med.nk
    )
    SELECT nk AS nationkey, n_suppliers,
           CAST(med_c AS DOUBLE) / 100 AS median_bal,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY d) AS DOUBLE)
             / 100 AS mad_bal
    FROM dev GROUP BY nk, n_suppliers, med_c ORDER BY nationkey
    """,
    tags=("stats", "robust", "mad", "percentile"),
)
def supplier_acctbal_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation of supplier balances per nation — the
    robust scale estimate (MAD) built from two discrete medians: balances
    quantize to exact integer cents and BOTH medians route through
    operators/quantile.py group_quantiles_disc (the two-pass global-rank
    machinery whose per-task state is bounded by the PARTITION size —
    the builtin percentile_disc aggregate buffers the whole group, which
    grows with SF here since suppliers-per-nation is SF/25). Same
    ceil(q·n) order-statistic rule as both engines' builtins, so the
    oracle is unchanged."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk"),
        (dec("s_acctbal", 12, 2) * 100).cast("bigint").alias("bal_c"),
    )
    counts = s.groupBy("nk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers")
    )
    med = group_quantiles_disc(s, "bal_c", [0.5], ["nk"]).withColumnRenamed(
        _qcolname(0.5), "med_c"
    )
    dev = s.join(F.broadcast(med), "nk").select(
        "nk", F.abs(F.col("bal_c") - F.col("med_c")).alias("d")
    )
    mad = group_quantiles_disc(dev, "d", [0.5], ["nk"]).withColumnRenamed(
        _qcolname(0.5), "mad_c"
    )
    return (
        counts.join(F.broadcast(med), "nk")
        .join(F.broadcast(mad), "nk")
        .select(
            F.col("nk").alias("nationkey"),
            "n_suppliers",
            (F.col("med_c").cast("double") / 100).alias("median_bal"),
            (F.col("mad_c").cast("double") / 100).alias("mad_bal"),
        )
        .orderBy("nationkey")
    )


# --- first-digit (Benford) census -------------------------------------------------

# Benford expected shares log10(1 + 1/d), pre-rounded once in Python and
# emitted as literals to both engines (same discipline as the hour-trig
# table above).
_BENFORD_SHARE = {d: round(math.log10(1 + 1 / d), 8) for d in range(1, 10)}
_BENFORD_VALUES = ", ".join(
    f"({d}, {_BENFORD_SHARE[d]!r})" for d in range(1, 10)
)


@query(
    "lineitem_quantity_first_digit",
    oracle=f"""
    WITH expected(digit, benford_share) AS (VALUES {_BENFORD_VALUES}),
    hist AS (
      SELECT CAST(substr(CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
    GROUP BY 1
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM hist)
    SELECT e.digit, COALESCE(h.n, 0) AS n,
           ROUND(CAST(COALESCE(h.n, 0) AS DOUBLE) / tot.nt, 6) AS share,
           e.benford_share
    FROM expected e LEFT JOIN hist h ON h.digit = e.digit CROSS JOIN tot
    ORDER BY e.digit
    """,
    tags=("stats", "forensic", "benford", "census"),
)
def lineitem_quantity_first_digit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-significant-digit census of lineitem quantity against the
    Benford reference shares — the forensic screen's first-digit
    companion to the second-digit and cents-uniformity tests already in
    the registry. Quantities are small integers (a uniform domain, so the
    EXPECTED outcome is non-Benford — the screen must report the
    deviation, not assume conformance); counts are exact, shares one
    division, reference shares enter both engines as the same pre-rounded
    literals."""
    li = load_table(spark, sf_dir, "lineitem")
    expected = spark.createDataFrame(
        [(d, _BENFORD_SHARE[d]) for d in range(1, 10)],
        "digit INT, benford_share DOUBLE",
    )
    hist = li.groupBy(
        F.substring(F.col("l_quantity").cast("bigint").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = hist.agg(F.sum("n").cast("bigint").alias("nt"))
    return (
        expected.join(hist, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.round(
                F.coalesce("n", F.lit(0)).cast("double") / F.col("nt"), 6
            ).alias("share"),
            "benford_share",
        )
        .orderBy("digit")
    )


# --- CUSUM level-shift screen -----------------------------------------------------


@query(
    "orders_daily_cusum_extreme",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1
    ), t AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(rev_c) AS DECIMAL(38,0)) AS s
      FROM daily
    ), c AS (
      SELECT day,
             CAST((SELECT n FROM t)
                  * SUM(CAST(rev_c AS DECIMAL(38,0)))
                      OVER (ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - CAST(ROW_NUMBER() OVER (ORDER BY day) AS DECIMAL(38,0))
                      * (SELECT s FROM t) AS DECIMAL(38,0)) AS cus
      FROM daily
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM t) AS n_days,
           CAST(day AS TIMESTAMP) AS peak_day,
           CAST(cus AS DOUBLE) AS peak_cusum_scaled
    FROM c ORDER BY ABS(cus) DESC, day LIMIT 1
    """,
    tags=("stats", "cusum", "changepoint", "prefix-sum"),
)
def orders_daily_cusum_extreme(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift screen on daily revenue: the n-scaled cumulative
    deviation C_k = n·P_k − k·S (P_k the prefix sum, S the total) peaks at
    the most likely changepoint — reported as the single extreme row.
    Scaling by n keeps EVERYTHING integer (no mean, no division): cents
    are exact, the prefix sum rides the bounded ~2.4k-row daily series,
    and the argmax tie-breaks on day."""
    daily = load_table(spark, sf_dir, "orders").groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_c"))
    d38 = "decimal(38,0)"
    t = daily.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("rev_c").cast(d38).alias("s"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    c = (
        daily.crossJoin(F.broadcast(t))
        .select(
            "day",
            "n",
            (
                F.col("n") * F.sum(F.col("rev_c").cast(d38)).over(w)
                - F.row_number().over(W.orderBy("day")).cast(d38) * F.col("s")
            )
            .cast(d38)
            .alias("cus"),
        )
    )
    return (
        c.orderBy(F.abs(F.col("cus")).desc(), "day")
        .limit(1)
        .select(
            F.col("n").cast("bigint").alias("n_days"),
            F.col("day").cast("timestamp").alias("peak_day"),
            F.col("cus").cast("double").alias("peak_cusum_scaled"),
        )
    )


# --- Theil's U (uncertainty coefficient) -------------------------------------------


@query(
    "events_weekday_type_theil_u",
    oracle="""
    WITH joint AS (
      SELECT date_part('isodow', ts) AS dow, event_type AS et,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM joint),
    col_t AS (SELECT et, CAST(SUM(c) AS BIGINT) AS ct FROM joint GROUP BY et),
    row_t AS (SELECT dow, CAST(SUM(c) AS BIGINT) AS rt FROM joint GROUP BY dow),
    h_type AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(CAST(ct AS DOUBLE) / n) * LN(CAST(ct AS DOUBLE) / n), 8)
             AS DECIMAL(28,8))) AS DOUBLE) AS h
      FROM col_t CROSS JOIN tot
    ), h_cond AS (
      SELECT CAST(SUM(CAST(ROUND(
               -(CAST(c AS DOUBLE) / n)
                 * LN(CAST(c AS DOUBLE) / rt), 8)
             AS DECIMAL(28,8))) AS DOUBLE) AS hc
      FROM joint JOIN row_t USING (dow) CROSS JOIN tot
    )
    SELECT (SELECT n FROM tot) AS n_events,
           ROUND((SELECT h FROM h_type), 6) AS h_type,
           ROUND((SELECT hc FROM h_cond), 6) AS h_type_given_dow,
           ROUND(((SELECT h FROM h_type) - (SELECT hc FROM h_cond))
                 / (SELECT h FROM h_type), 6) AS theil_u
    """,
    tags=("stats", "entropy", "theil-u", "association"),
)
def events_weekday_type_theil_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's uncertainty coefficient U(type | weekday): the entropy
    fraction of the event-type distribution explained by ISO weekday —
    the information-theoretic twin of the chi² screen, normalized to
    [0,1]. The contingency is exact integers over a 7×5 joint; each
    p·ln(p) entropy term rounds to 8dp and folds as DECIMAL (the repo's
    rounded-term libm discipline), so the cross-engine hash is stable."""
    e = load_table(spark, sf_dir, "events")
    joint = e.groupBy(
        (F.weekday("ts") + 1).alias("dow"), F.col("event_type").alias("et")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = joint.agg(F.sum("c").cast("bigint").alias("n"))
    col_t = joint.groupBy("et").agg(F.sum("c").cast("bigint").alias("ct"))
    row_t = joint.groupBy("dow").agg(F.sum("c").cast("bigint").alias("rt"))
    hterm = lambda p_num, p_den, ln_num, ln_den: F.round(  # noqa: E731
        -(p_num.cast("double") / p_den) * F.log(ln_num.cast("double") / ln_den),
        8,
    ).cast("decimal(28,8)")
    h_type = (
        col_t.crossJoin(F.broadcast(tot))
        .select(
            hterm(F.col("ct"), F.col("n"), F.col("ct"), F.col("n")).alias("t")
        )
        .agg(F.sum("t").cast("double").alias("h"))
    )
    h_cond = (
        joint.join(row_t, "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            hterm(F.col("c"), F.col("n"), F.col("c"), F.col("rt")).alias("t")
        )
        .agg(F.sum("t").cast("double").alias("hc"))
    )
    return (
        tot.crossJoin(F.broadcast(h_type))
        .crossJoin(F.broadcast(h_cond))
        .select(
            F.col("n").alias("n_events"),
            F.round("h", 6).alias("h_type"),
            F.round("hc", 6).alias("h_type_given_dow"),
            F.round((F.col("h") - F.col("hc")) / F.col("h"), 6).alias(
                "theil_u"
            ),
        )
    )


# --- word-length histogram --------------------------------------------------------


@query(
    "documents_word_length_histogram",
    oracle=r"""
    WITH words AS (
      SELECT doc_id, len(w) AS wlen
      FROM documents,
           unnest(string_split_regex(
             regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'))
             AS t(w)
      WHERE len(w) > 0
    )
    SELECT CAST(wlen AS INT) AS word_len,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM words GROUP BY wlen ORDER BY word_len
    """,
    tags=("llm", "text", "histogram", "tokenize"),
)
def documents_word_length_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Word-length histogram over the corpus with per-length document
    reach — the orthographic profile feeding tokenizer-budget estimates
    (length × frequency = subword pressure). Whitespace tokenization
    matches the repo's token-count convention (trim, lower, split on
    runs of whitespace); counts are exact integers; the distinct-doc
    count is the heavy op and shuffles (word_len, doc_id) pairs only."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("w"),
    ).where(F.length("w") > 0)
    return (
        words.groupBy(F.length("w").cast("int").alias("word_len"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy("word_len")
    )


# --- embedding norm-band census ---------------------------------------------------


@query(
    "embed_norm_band_census",
    oracle="""
    WITH q AS (
      SELECT label,
             list_sum(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
                    * CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
               AS nsq
      FROM embeddings
    )
    SELECT label,
           CAST(FLOOR(CAST(nsq AS DOUBLE) / 1e10) AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(nsq) AS DOUBLE) AS min_nsq,
           CAST(MAX(nsq) AS DOUBLE) AS max_nsq
    FROM q GROUP BY label, band ORDER BY label, band
    """,
    tags=("llm", "embeddings", "norm", "census"),
)
def embed_norm_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared-L2-norm band census of the embedding table by label — the
    pre-normalization audit before cosine ANN (a label whose norms spread
    across bands needs normalizing; one tight band means dot product ≈
    cosine). Components quantize to integer micro-units so the per-vector
    Σq² is EXACT decimal; banding is one floor on a deterministic cast.
    Per-vector work is a higher-order fold — no explode, no shuffle until
    the 2-key census."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        F.aggregate(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * 1_000_000).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, qv: acc + qv * qv,
        ).alias("nsq"),
    )
    return (
        q.groupBy(
            "label",
            F.floor(F.col("nsq").cast("double") / 1e10)
            .cast("bigint")
            .alias("band"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("nsq").cast("double").alias("min_nsq"),
            F.max("nsq").cast("double").alias("max_nsq"),
        )
        .orderBy("label", "band")
    )


# --- as-of self-join: last view before each purchase --------------------------------


@query(
    "events_last_order_asof_lag",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, ts FROM events WHERE event_type = 'view'
    ), m AS (
      SELECT p.event_id, CAST(p.ts AS DATE) AS day, p.ts AS pts,
             MAX(v.ts) AS vts
      FROM p LEFT JOIN v
        ON v.user_id = p.user_id AND v.ts <= p.ts
      GROUP BY 1, 2, 3
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(vts) AS BIGINT) AS n_matched,
           CAST(COALESCE(SUM(epoch_us(pts) - epoch_us(vts)), 0) AS BIGINT)
             AS total_lag_us,
           ROUND(CAST(COALESCE(SUM(epoch_us(pts) - epoch_us(vts)), 0)
                      AS DOUBLE) / NULLIF(COUNT(vts), 0) / 1e6, 4)
             AS avg_lag_sec
    FROM m GROUP BY day ORDER BY day
    """,
    tags=("join", "asof", "attribution", "self-join"),
)
def events_last_order_asof_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase latency: each purchase as-of-joins BACKWARD to the
    same user's most recent view (operators/asof.py — one shuffle on
    user_id, a window match, no per-row range scan), then a per-day lag
    census. Lags are exact integer microseconds; the one float is the
    rounded average. The LEFT-join semantics keep view-less purchases in
    the census with NULL match — the funnel-attribution primitive."""
    from distributed_graph_database_system_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = e.where(F.col("event_type") == "view").select("user_id", "ts")
    m = asof_join(p, v, on="ts", by=["user_id"], direction="backward")
    lag_us = F.unix_micros("ts") - F.unix_micros("ts_r")
    return (
        m.groupBy(F.to_date("ts").cast("timestamp").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.count("ts_r").cast("bigint").alias("n_matched"),
            F.coalesce(F.sum(lag_us), F.lit(0))
            .cast("bigint")
            .alias("total_lag_us"),
            F.round(
                F.coalesce(F.sum(lag_us), F.lit(0)).cast("double")
                / F.nullif(F.count("ts_r"), F.lit(0))
                / 1e6,
                4,
            ).alias("avg_lag_sec"),
        )
        .orderBy("day")
    )


# --- anti join: parts with no 1998-H2 shipment -------------------------------------


@query(
    "parts_unshipped_1998h2_anti",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_partkey = p.p_partkey
        AND l.l_shipdate >= DATE '1998-07-01'
        AND l.l_shipdate < DATE '1999-01-01'
    )
    GROUP BY p_brand ORDER BY p_brand
    """,
    tags=("join", "anti", "not-exists"),
)
def parts_unshipped_1998h2_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-stock screen: parts with NO shipment in 1998-H2, as a NOT
    EXISTS → left-anti join with the date filter pushed INTO the lineitem
    scan (the anti side shrinks before the shuffle — the filter-first
    discipline that matters at 100 TB, where the unfiltered anti build
    side would be the whole fact table). Census by brand; money sums are
    exact decimals."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-07-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("date"))
    )
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            dsum("p_retailprice").alias("total_price"),
        )
        .orderBy("p_brand")
    )


# --- EXCEPT: high-balance customers inactive since 2000 -----------------------------


@query(
    "customers_highbal_inactive_except",
    oracle="""
    WITH inactive AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2000-01-01'
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS total_balance
    FROM customer JOIN inactive USING (c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("setops", "except", "join"),
)
def customers_highbal_inactive_except(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Churn-risk slice via EXCEPT: high-balance customers minus anyone
    who ordered in 2000+, joined back for a per-segment balance census.
    Both EXCEPT inputs are single-column key projections (the set op
    shuffles keys only, never payloads — the cheap way to difference two
    billion-row sides), and the date filter is pushed into the orders
    scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    high = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    active = o.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    ).select(F.col("o_custkey").alias("c_custkey"))
    inactive = high.exceptAll(active.distinct()).distinct()
    return (
        c.join(inactive, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dsum("c_acctbal", 12, 2).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


# --- decorrelated scalar subquery: suppliers far above nation average ---------------


@query(
    "supplier_nation_balance_share",
    oracle="""
    WITH avgs AS (
      SELECT s_nationkey,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) AS navg,
             CAST(COUNT(*) AS BIGINT) AS n_total
      FROM supplier GROUP BY s_nationkey
    )
    SELECT s.s_nationkey AS nationkey, a.n_total,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE)
             AS above_balance
    FROM supplier s JOIN avgs a ON s.s_nationkey = a.s_nationkey
    WHERE s.s_acctbal > 1.5 * a.navg
    GROUP BY s.s_nationkey, a.n_total ORDER BY nationkey
    """,
    tags=("subquery", "decorrelation", "aggregation"),
)
def supplier_nation_balance_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Suppliers whose balance exceeds 1.5× their nation's average — the
    correlated scalar subquery ``WHERE bal > 1.5 * (SELECT AVG ... same
    nation)`` decorrelated into one aggregate + one equi-join (the
    rewrite Catalyst applies to such subqueries; here it is explicit so
    the join strategy stays visible). The average is the exact-decimal
    sum over count — both engines compute the identical double — and the
    1.5× threshold compare is a single IEEE multiply."""
    s = load_table(spark, sf_dir, "supplier")
    avgs = s.groupBy("s_nationkey").agg(
        (
            F.sum(dec("s_acctbal", 12, 2)).cast("double") / F.count(F.lit(1))
        ).alias("navg"),
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
    )
    return (
        s.join(avgs, "s_nationkey")
        .where(F.col("s_acctbal") > F.lit(1.5) * F.col("navg"))
        .groupBy(F.col("s_nationkey").alias("nationkey"), F.col("n_total"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_above"),
            dsum("s_acctbal", 12, 2).alias("above_balance"),
        )
        .orderBy("nationkey")
    )


# --- ORC partitioned sink roundtrip -------------------------------------------------


@query(
    "sink_orc_partitioned_roundtrip",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders GROUP BY 1, 2 ORDER BY yr, status
    """,
    tags=("sinks", "orc", "partitioned", "roundtrip"),
)
def sink_orc_partitioned_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ORC sink/source roundtrip: orders written year-partitioned as ORC
    (the third columnar format the engine round-trips, after parquet and
    CSV/JSON), read back through the partition-discovering reader, and
    censused per (year, status). The oracle is the identity census on the
    original table, so any loss in the ORC writer/reader — type fidelity,
    partition values, row counts — breaks the hash. Partition pruning on
    ``yr`` works on the read-back table exactly as for parquet."""
    import os

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("yr"),
    )
    path = scratch_dir("sinks", sf_dir, "orc_orders")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    o.write.mode("overwrite").partitionBy("yr").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy(
            F.col("yr").cast("int").alias("yr"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("yr", "status")
    )


# --- Python DataSource: out-degree histogram ----------------------------------------


@query(
    "source_refgraph_outdeg_histogram",
    oracle="""
    WITH e AS (
      SELECT i + 1 AS src, j + 1 AS dst
      FROM (SELECT unnest(range(0, 80)) AS i)
      CROSS JOIN (SELECT unnest(range(0, 80)) AS j)
      WHERE (i * 13 + j * 5) % 9 = 0 AND i <> j
    ), deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY src
    )
    SELECT outdeg,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(MIN(src) AS BIGINT) AS min_vid,
           CAST(MAX(src) AS BIGINT) AS max_vid
    FROM deg GROUP BY outdeg ORDER BY outdeg
    """,
    tags=("sources", "datasource-api", "reference-format", "degree"),
)
def source_refgraph_outdeg_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Out-degree HISTOGRAM through the Spark 4 Python DataSource: an
    80-vertex arithmetic adjacency matrix ((13i+5j) mod 9 = 0, i≠j) is
    written in the reference text format (reference repo
    primaryServer.c:14-80 stores the same adjacency-list layout), read
    back via spark.read.format('reference_graph') in 8 real input
    partitions, and folded twice — per-vertex out-degree, then the
    degree-frequency histogram (the degree-distribution primitive). The
    oracle regenerates the matrix arithmetically, so a partition-boundary
    bug in the source's line splitting breaks parity."""
    import os

    from distributed_graph_database_system_spark.sources.refgraph import (
        ensure_registered,
        write_reference_file,
    )

    n = 80
    edges = [
        (i + 1, j + 1)
        for i in range(n)
        for j in range(n)
        if (i * 13 + j * 5) % 9 == 0 and i != j
    ]
    path = scratch_dir("refgraph", sf_dir, "outdeg_graph.txt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_reference_file(path, n, edges)
    ensure_registered(spark)
    src = (
        spark.read.format("reference_graph")
        .option("numPartitions", "8")
        .load(path)
    )
    deg = src.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    return (
        deg.groupBy("outdeg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vertices"),
            F.min("src").cast("bigint").alias("min_vid"),
            F.max("src").cast("bigint").alias("max_vid"),
        )
        .orderBy("outdeg")
    )


# --- graph radius / center ----------------------------------------------------------


@query(
    "graph_radius_center_g6",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT src, dst FROM (VALUES
      (1,2),(2,1),(1,3),(3,1),(1,4),(4,1),(2,3),(3,2),(2,4),(4,2),
      (3,4),(4,3),(5,6),(6,5),(6,7),(7,6),(7,8),(8,7),(8,9),(9,8),
      (9,5),(5,9),(4,5),(5,4),(8,10),(10,8)) AS t(src, dst)
    ), walk(seed, vid, level) AS (
      SELECT s, s, 0 FROM (SELECT DISTINCT src AS s FROM e)
      UNION
      SELECT w.seed, e.dst, w.level + 1
      FROM walk w JOIN e ON e.src = w.vid WHERE w.level < 20
    ), sp AS (
      SELECT seed, vid, MIN(level) AS d FROM walk GROUP BY seed, vid
    ), ecc AS (
      SELECT seed, MAX(d) AS e FROM sp WHERE d > 0 GROUP BY seed
    ), radius AS (SELECT MIN(e) AS r FROM ecc)
    SELECT CAST(seed AS BIGINT) AS vid,
           CAST(e AS INT) AS eccentricity,
           CAST((SELECT r FROM radius) AS INT) AS radius
    FROM ecc WHERE e = (SELECT r FROM radius) ORDER BY vid
    """,
    tags=("graph", "radius", "center", "multi-source"),
)
def graph_radius_center_g6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph center of G6: the vertices of minimum eccentricity (= the
    radius) — the facility-location primitive, computed from the SAME
    one-traversal all-sources BFS as graph_eccentricity_g6
    (operators/graph.py multi_source_bfs_all: every vertex a seed, round
    count = max eccentricity, state = the answer size). The radius is a
    1-row aggregate broadcast back over the 10-row eccentricity table;
    the recursive-CTE oracle recomputes all shortest paths independently.
    Generalizes the reference's single-source traversals
    (secondaryServer.c:111-179) to the all-pairs distance census."""
    from distributed_graph_database_system_spark.operators.graph import (
        multi_source_bfs_all,
    )
    from distributed_graph_database_system_spark.queries.graph import (
        G6,
        _edges,
    )

    sym = G6 + [(b, a) for a, b in G6]
    e = _edges(spark, sym)
    seeds = sorted({a for a, _ in sym})
    ecc = (
        multi_source_bfs_all(e, seeds)
        .where(F.col("level") > 0)
        .groupBy(F.col("seed").alias("vid"))
        .agg(F.max("level").cast("int").alias("eccentricity"))
    )
    radius = ecc.agg(F.min("eccentricity").alias("radius"))
    return (
        ecc.crossJoin(F.broadcast(radius))
        .where(F.col("eccentricity") == F.col("radius"))
        .select(
            F.col("vid").cast("bigint").alias("vid"),
            "eccentricity",
            F.col("radius").cast("int").alias("radius"),
        )
        .orderBy("vid")
    )
