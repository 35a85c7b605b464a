"""Round-12 pool, batch G: extreme-value screening, normality testing,
portmanteau autocorrelation, serial-correlation diagnostics, and
vocabulary scaling laws. Same determinism discipline as seeds_r12.py;
series-level moments work in SCALED units (thousands/millions) before
any float op — the orders_weekday_anova_f lesson.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("rev")
    )


_DAILY_SQL = """
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY day
"""


# --- Grubbs extreme-value screen ----------------------------------------------


@query(
    "orders_grubbs_daily_extremes",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS DOUBLE) / 1000.0 AS s,
             CAST(SUM(CAST(rev AS DECIMAL(19,2))
                      * CAST(rev AS DECIMAL(19,2))) AS DOUBLE)
               / 1000000.0 AS q,
             CAST(MAX(rev) AS DOUBLE) / 1000.0 AS hi,
             CAST(MIN(rev) AS DOUBLE) / 1000.0 AS lo
      FROM daily
    )
    SELECT n AS n_days,
           ROUND((hi - s / n) / SQRT((q - s * s / n) / (n - 1)), 6)
             AS g_max,
           ROUND((s / n - lo) / SQRT((q - s * s / n) / (n - 1)), 6)
             AS g_min
    FROM m
    """,
    tags=("stats", "grubbs", "outliers", "extreme-value"),
)
def orders_grubbs_daily_extremes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Grubbs statistics for the single most extreme daily-revenue
    observations: G = (max − x̄)/s and its minimum twin — the parametric
    single-outlier screen (MAD and Tukey flag SETS of outliers; Grubbs
    asks whether the ONE worst point is too extreme for a normal
    sample). All moments fold as exact decimals, scaled to
    revenue-thousands before the float assembly; each G is one shared
    IEEE expression."""
    daily = _daily_rev(spark, sf_dir)
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("rev").cast("double") / F.lit(1000.0)).alias("s"),
        (
            F.sum(F.col("rev") * F.col("rev")).cast("double")
            / F.lit(1000000.0)
        ).alias("q"),
        (F.max("rev").cast("double") / F.lit(1000.0)).alias("hi"),
        (F.min("rev").cast("double") / F.lit(1000.0)).alias("lo"),
    )
    n, s, qm = F.col("n"), F.col("s"), F.col("q")
    sd = F.sqrt((qm - s * s / n) / (n - 1))
    return m.select(
        n.alias("n_days"),
        F.round((F.col("hi") - s / n) / sd, 6).alias("g_max"),
        F.round((s / n - F.col("lo")) / sd, 6).alias("g_min"),
    )


# --- Jarque-Bera normality test -------------------------------------------------


@query(
    "customer_acctbal_jarque_bera",
    oracle="""
    WITH t AS (
      SELECT CAST(ROUND(CAST(c_acctbal AS DOUBLE) / 1000.0, 6)
                  AS DECIMAL(18,6)) AS x1,
             CAST(ROUND(POW(CAST(c_acctbal AS DOUBLE) / 1000.0, 2), 6)
                  AS DECIMAL(18,6)) AS x2,
             CAST(ROUND(POW(CAST(c_acctbal AS DOUBLE) / 1000.0, 3), 6)
                  AS DECIMAL(18,6)) AS x3,
             CAST(ROUND(POW(CAST(c_acctbal AS DOUBLE) / 1000.0, 4), 6)
                  AS DECIMAL(18,6)) AS x4
      FROM customer
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(x3) AS DOUBLE) AS s3, CAST(SUM(x4) AS DOUBLE) AS s4
      FROM t
    ), c AS (
      SELECT n, s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3 * (s1 / n) * (s2 / n)
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * (s3 / n)
               + 6 * (s1 / n) * (s1 / n) * (s2 / n)
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM m
    )
    SELECT n AS n_customers,
           ROUND(m3 / POW(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2), 6) AS kurtosis,
           ROUND(n / 6.0 * (POW(m3 / POW(m2, 1.5), 2)
                 + POW(m4 / (m2 * m2) - 3.0, 2) / 4.0), 4) AS jb_stat
    FROM c
    """,
    tags=("stats", "jarque-bera", "normality", "moments"),
)
def customer_acctbal_jarque_bera(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jarque-Bera normality test on customer account balances: skewness
    and excess-kurtosis assembled from the first four raw moments,
    JB = n/6·(S² + (K−3)²/4) — the distribution-shape audit (the
    location/spread families can't see a heavy tail with a centered
    mean). Values scale to balance-thousands, per-row power terms round
    to 6dp decimals (order-free fold), and the central-moment expansion
    is one identical IEEE chain per engine — no decimal power-overflow
    minefield (raw DECIMAL ⁴ would blow past precision 38 differently in
    each engine)."""
    c = load_table(spark, sf_dir, "customer")
    x = F.col("c_acctbal").cast("double") / F.lit(1000.0)

    def p(k: int):
        e = x
        for _ in range(k - 1):
            e = e * x
        return F.round(e, 6).cast("decimal(18,6)")

    t = c.select(
        p(1).alias("x1"), p(2).alias("x2"), p(3).alias("x3"), p(4).alias("x4")
    )
    m = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("x3").cast("double").alias("s3"),
        F.sum("x4").cast("double").alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    skew = m3 / F.pow(m2, 1.5)
    kurt = m4 / (m2 * m2)
    return m.select(
        n.alias("n_customers"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("kurtosis"),
        F.round(
            n / F.lit(6.0)
            * (F.pow(skew, 2) + F.pow(kurt - F.lit(3.0), 2) / F.lit(4.0)),
            4,
        ).alias("jb_stat"),
    )


# --- Ljung-Box portmanteau test ---------------------------------------------------


@query(
    "orders_ljung_box_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    lagged AS (
      SELECT rev,
             LAG(rev, 1) OVER w AS r1, LAG(rev, 2) OVER w AS r2,
             LAG(rev, 3) OVER w AS r3, LAG(rev, 4) OVER w AS r4,
             LAG(rev, 5) OVER w AS r5
      FROM daily WINDOW w AS (ORDER BY day)
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS DOUBLE) / 1000.0 AS s,
             CAST(SUM(CAST(rev AS DECIMAL(19,2))
                      * CAST(rev AS DECIMAL(19,2))) AS DOUBLE)
               / 1000000.0 AS q,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(r1 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS c1,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(r2 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS c2,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(r3 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS c3,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(r4 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS c4,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(r5 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS c5,
             CAST(SUM(rev) FILTER (r1 IS NOT NULL) AS DOUBLE) / 1000.0 AS h1,
             CAST(SUM(r1) AS DOUBLE) / 1000.0 AS t1,
             CAST(SUM(rev) FILTER (r2 IS NOT NULL) AS DOUBLE) / 1000.0 AS h2,
             CAST(SUM(r2) AS DOUBLE) / 1000.0 AS t2,
             CAST(SUM(rev) FILTER (r3 IS NOT NULL) AS DOUBLE) / 1000.0 AS h3,
             CAST(SUM(r3) AS DOUBLE) / 1000.0 AS t3,
             CAST(SUM(rev) FILTER (r4 IS NOT NULL) AS DOUBLE) / 1000.0 AS h4,
             CAST(SUM(r4) AS DOUBLE) / 1000.0 AS t4,
             CAST(SUM(rev) FILTER (r5 IS NOT NULL) AS DOUBLE) / 1000.0 AS h5,
             CAST(SUM(r5) AS DOUBLE) / 1000.0 AS t5
      FROM lagged
    ), acf AS (
      SELECT n,
        (c1 - (s/n)*(h1+t1) + (n-1)*(s/n)*(s/n)) / (q - s*s/n) AS rho1,
        (c2 - (s/n)*(h2+t2) + (n-2)*(s/n)*(s/n)) / (q - s*s/n) AS rho2,
        (c3 - (s/n)*(h3+t3) + (n-3)*(s/n)*(s/n)) / (q - s*s/n) AS rho3,
        (c4 - (s/n)*(h4+t4) + (n-4)*(s/n)*(s/n)) / (q - s*s/n) AS rho4,
        (c5 - (s/n)*(h5+t5) + (n-5)*(s/n)*(s/n)) / (q - s*s/n) AS rho5
      FROM m
    )
    SELECT n AS n_days,
           ROUND(rho1, 6) AS rho1, ROUND(rho2, 6) AS rho2,
           ROUND(rho3, 6) AS rho3, ROUND(rho4, 6) AS rho4,
           ROUND(rho5, 6) AS rho5,
           ROUND(n * (n + 2.0) * (rho1*rho1/(n-1) + rho2*rho2/(n-2)
                 + rho3*rho3/(n-3) + rho4*rho4/(n-4) + rho5*rho5/(n-5)),
                 4) AS q_lb
    FROM acf
    """,
    tags=("stats", "ljung-box", "autocorrelation", "portmanteau"),
)
def orders_ljung_box_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test over ACF lags 1–5 of daily revenue —
    'is there ANY serial correlation', the joint test the single-lag
    probes (events_autocorr_lag1, orders_pacf_lag2_daily) can't give.
    Every cross-moment C_k and the head/tail sums fold as exact decimals
    off ONE window pass (5 LAGs), scaled to thousands before the float
    assembly; mean-correction uses the textbook full-series mean. Q_LB
    then weights ρ²ₖ by n(n+2)/(n−k)."""
    daily = _daily_rev(spark, sf_dir)
    w = W.orderBy("day")
    lag_cols = [F.lag("rev", k).over(w).alias(f"r{k}") for k in range(1, 6)]
    lagged = daily.select("rev", *lag_cols)
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("rev").cast("double") / F.lit(1000.0)).alias("s"),
        (
            F.sum(F.col("rev") * F.col("rev")).cast("double")
            / F.lit(1000000.0)
        ).alias("q"),
    ]
    for k in range(1, 6):
        rk = F.col(f"r{k}")
        aggs += [
            (
                F.sum(F.col("rev") * rk).cast("double") / F.lit(1000000.0)
            ).alias(f"c{k}"),
            (
                F.sum(F.when(rk.isNotNull(), F.col("rev")))
                .cast("double")
                / F.lit(1000.0)
            ).alias(f"h{k}"),
            (F.sum(rk).cast("double") / F.lit(1000.0)).alias(f"t{k}"),
        ]
    m = lagged.agg(*aggs)
    n, s, qm = F.col("n"), F.col("s"), F.col("q")
    den = qm - s * s / n
    rhos = {
        k: (
            F.col(f"c{k}")
            - (s / n) * (F.col(f"h{k}") + F.col(f"t{k}"))
            + (n - k) * (s / n) * (s / n)
        )
        / den
        for k in range(1, 6)
    }
    q_lb = (
        n
        * (n + F.lit(2.0))
        * sum(rhos[k] * rhos[k] / (n - k) for k in range(1, 6))
    )
    return m.select(
        n.alias("n_days"),
        *[F.round(rhos[k], 6).alias(f"rho{k}") for k in range(1, 6)],
        F.round(q_lb, 4).alias("q_lb"),
    )


# --- Durbin-Watson ---------------------------------------------------------------


@query(
    "events_durbin_watson_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM events GROUP BY day
    ), d AS (
      SELECT rev, rev - LAG(rev) OVER (ORDER BY day) AS chg FROM daily
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS DOUBLE) / 1000.0 AS s,
             CAST(SUM(CAST(rev AS DECIMAL(19,2))
                      * CAST(rev AS DECIMAL(19,2))) AS DOUBLE)
               / 1000000.0 AS q,
             CAST(SUM(CAST(chg AS DECIMAL(19,2))
                      * CAST(chg AS DECIMAL(19,2))) AS DOUBLE)
               / 1000000.0 AS dd
      FROM d
    )
    SELECT n AS n_days,
           ROUND(dd / (q - s * s / n), 6) AS dw
    FROM m
    """,
    tags=("stats", "durbin-watson", "serial-correlation"),
)
def events_durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on mean-centered daily revenue:
    DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² — the classic serial-correlation diagnostic
    (DW ≈ 2(1−ρ₁); <2 positive, >2 negative autocorrelation). The
    first-difference squares and the raw moments all fold as exact
    decimals (differences of decimals ARE the centered differences —
    the mean cancels), scaled to thousands before the single division."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(dec("value")).cast("decimal(18,2)").alias("rev")
    )
    d = daily.select(
        "rev",
        (F.col("rev") - F.lag("rev").over(W.orderBy("day"))).alias("chg"),
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("rev").cast("double") / F.lit(1000.0)).alias("s"),
        (
            F.sum(F.col("rev") * F.col("rev")).cast("double")
            / F.lit(1000000.0)
        ).alias("q"),
        (
            F.sum(F.col("chg") * F.col("chg")).cast("double")
            / F.lit(1000000.0)
        ).alias("dd"),
    )
    n, s, qm = F.col("n"), F.col("s"), F.col("q")
    return m.select(
        n.alias("n_days"),
        F.round(F.col("dd") / (qm - s * s / n), 6).alias("dw"),
    )


# --- Heaps' law fit ----------------------------------------------------------------


@query(
    "text_heaps_law_fit",
    oracle="""
    WITH tok AS (
      SELECT source, lang, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ), g AS (
      SELECT source, lang,
             CAST(COUNT(*) AS BIGINT) AS n_tok,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
      FROM tok WHERE w <> '' GROUP BY source, lang
    ), pts AS (
      SELECT CAST(ROUND(LN(n_tok), 6) AS DECIMAL(18,6)) AS x,
             CAST(ROUND(LN(vocab), 6) AS DECIMAL(18,6)) AS y,
             CAST(ROUND(LN(n_tok) * LN(n_tok), 6) AS DECIMAL(18,6)) AS xx,
             CAST(ROUND(LN(n_tok) * LN(vocab), 6) AS DECIMAL(18,6)) AS xy
      FROM g
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(xx) AS DOUBLE) AS sxx, CAST(SUM(xy) AS DOUBLE) AS sxy
      FROM pts
    )
    SELECT k AS n_groups,
           ROUND((sxy - sx * sy / k) / (sxx - sx * sx / k), 6) AS beta,
           ROUND(sy / k - (sxy - sx * sy / k) / (sxx - sx * sx / k)
                 * sx / k, 6) AS ln_k
    FROM m
    """,
    tags=("llm", "text", "heaps-law", "vocabulary-scaling"),
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V = K·nᵝ across (source, language) sub-corpora:
    log-log OLS of vocabulary size against token count — the vocabulary
    scaling exponent that predicts how fast a tokenizer's type inventory
    grows with corpus size (β < 1 always; the scalar complement of the
    hapax and Zipf censuses). Token/vocab counts are exact integers per
    group; the ≤k log-points use the round-6 decimal device; slope and
    intercept are the closed-form normal equations in one shared IEEE
    chain."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", "lang", F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).where(F.col("w") != "")
    g = tok.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok"),
        F.countDistinct("w").cast("bigint").alias("vocab"),
    )
    lx, ly = F.log("n_tok"), F.log("vocab")
    pts = g.select(
        F.round(lx, 6).cast("decimal(18,6)").alias("x"),
        F.round(ly, 6).cast("decimal(18,6)").alias("y"),
        F.round(lx * lx, 6).cast("decimal(18,6)").alias("xx"),
        F.round(lx * ly, 6).cast("decimal(18,6)").alias("xy"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    k = F.col("k")
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / k) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / k
    )
    return m.select(
        k.alias("n_groups"),
        F.round(beta, 6).alias("beta"),
        F.round(F.col("sy") / k - beta * F.col("sx") / k, 6).alias("ln_k"),
    )
