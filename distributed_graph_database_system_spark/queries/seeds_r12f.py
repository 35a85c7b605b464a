"""Round-12 pool, batch F: diversity indices, sign test, distribution
fitting, and variance-homogeneity testing. Same determinism discipline
as seeds_r12.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- unbiased Simpson diversity -----------------------------------------------


@query(
    "supplier_part_simpson_diversity",
    oracle="""
    WITH pc AS (
      SELECT l_suppkey, l_partkey, CAST(COUNT(*) AS BIGINT) AS n_i
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ), s AS (
      SELECT l_suppkey,
             CAST(SUM(n_i) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS richness,
             CAST(SUM(n_i * (n_i - 1)) AS BIGINT) AS coll
      FROM pc GROUP BY l_suppkey
    )
    SELECT s.l_suppkey AS suppkey, n AS n_lineitems, richness,
           ROUND(1.0 - CAST(coll AS DOUBLE)
                       / (CAST(n AS DOUBLE) * (n - 1)), 6) AS simpson_d
    FROM s WHERE n > 1 ORDER BY suppkey
    """,
    tags=("stats", "diversity", "simpson", "exact-integer"),
)
def supplier_part_simpson_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UNBIASED Simpson diversity per supplier over the parts they ship:
    D = 1 − Σnᵢ(nᵢ−1)/(N(N−1)), the probability two random lineitems
    from the supplier are DIFFERENT parts — the concentration inverse of
    supplier_market_hhi (which squares shares, the biased plug-in; the
    (nᵢ−1) form is the finite-sample-exact estimator). Every
    accumulation is int64 off a two-level exact-count aggregation; one
    shuffle keyed (supplier, part), one keyed supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    pc = li.groupBy("l_suppkey", "l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i")
    )
    s = pc.groupBy("l_suppkey").agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("richness"),
        F.sum(F.col("n_i") * (F.col("n_i") - 1)).cast("bigint").alias("coll"),
    )
    n = F.col("n")
    return (
        s.where(n > 1)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            n.alias("n_lineitems"),
            "richness",
            F.round(
                F.lit(1.0)
                - F.col("coll").cast("double") / (n.cast("double") * (n - 1)),
                6,
            ).alias("simpson_d"),
        )
        .orderBy("suppkey")
    )


# --- sign test ------------------------------------------------------------------


@query(
    "orders_sign_test_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY day
    ), chg AS (
      SELECT rev - LAG(rev) OVER (ORDER BY day) AS d FROM daily
    ), s AS (
      SELECT CAST(COUNT(*) FILTER (d > 0) AS BIGINT) AS n_up,
             CAST(COUNT(*) FILTER (d < 0) AS BIGINT) AS n_down,
             CAST(COUNT(*) FILTER (d = 0) AS BIGINT) AS n_tie
      FROM chg WHERE d IS NOT NULL
    )
    SELECT n_up, n_down, n_tie,
           ROUND((n_up - CAST(n_up + n_down AS DOUBLE) / 2.0)
                 / SQRT(CAST(n_up + n_down AS DOUBLE) / 4.0), 6) AS z
    FROM s
    """,
    tags=("stats", "sign-test", "nonparametric", "time-series"),
)
def orders_sign_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SIGN TEST on day-over-day revenue direction: are up-days and
    down-days balanced? The weakest-assumption location test (only signs,
    no magnitudes — Wilcoxon uses ranks, the t-test means) and the
    binomial complement of the runs test (orders_runs_test checks
    ORDERING of signs; this checks their COUNT). Differences are exact
    decimals so the trichotomy is exact; z is the normal approximation
    to Binomial(n, ½) assembled from three integers."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("rev")
    )
    chg = daily.select(
        (F.col("rev") - F.lag("rev").over(W.orderBy("day"))).alias("d")
    ).where(F.col("d").isNotNull())
    s = chg.agg(
        F.count(F.when(F.col("d") > 0, 1)).cast("bigint").alias("n_up"),
        F.count(F.when(F.col("d") < 0, 1)).cast("bigint").alias("n_down"),
        F.count(F.when(F.col("d") == 0, 1)).cast("bigint").alias("n_tie"),
    )
    m = (F.col("n_up") + F.col("n_down")).cast("double")
    return s.select(
        "n_up",
        "n_down",
        "n_tie",
        F.round(
            (F.col("n_up") - m / F.lit(2.0)) / F.sqrt(m / F.lit(4.0)), 6
        ).alias("z"),
    )


# --- lognormal method-of-moments fit ---------------------------------------------


@query(
    "events_value_lognormal_mom",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CAST(ROUND(LN(value), 6) AS DECIMAL(18,6)) AS l1,
             CAST(ROUND(LN(value) * LN(value), 6) AS DECIMAL(18,6)) AS l2
      FROM events WHERE value > 0
    ), m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(l1) AS DOUBLE) AS s1,
             CAST(SUM(l2) AS DOUBLE) AS s2
      FROM t GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(s1 / n, 6) AS mu_log,
           ROUND(SQRT(s2 / n - (s1 / n) * (s1 / n)), 6) AS sigma_log,
           ROUND(EXP(s1 / n), 4) AS median_fit
    FROM m ORDER BY event_type
    """,
    tags=("stats", "lognormal", "distribution-fit", "method-of-moments"),
)
def events_value_lognormal_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit per event type by the log-moment method: μ̂ and σ̂
    of ln(value) plus the implied median e^μ̂ — the canonical model for
    positive heavy-tailed amounts, and the parametric complement of the
    nonparametric tail screens (orders_hill_tail_index estimates the
    tail exponent; this fits the whole body). Per-row ln terms round to
    6dp decimals (order-free fold — the corpus_source_entropy device);
    the two transcendentals per output row follow the LN/EXP rounding
    precedent."""
    e = load_table(spark, sf_dir, "events").where(F.col("value") > 0)
    ln = F.log("value")
    t = e.select(
        "event_type",
        F.round(ln, 6).cast("decimal(18,6)").alias("l1"),
        F.round(ln * ln, 6).cast("decimal(18,6)").alias("l2"),
    )
    m = t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("l1").cast("double").alias("s1"),
        F.sum("l2").cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    return m.select(
        "event_type",
        "n",
        F.round(mu, 6).alias("mu_log"),
        F.round(
            F.sqrt(F.col("s2") / F.col("n") - mu * mu), 6
        ).alias("sigma_log"),
        F.round(F.exp(mu), 4).alias("median_fit"),
    ).orderBy("event_type")


# --- Brown-Forsythe variance homogeneity --------------------------------------------


@query(
    "documents_levene_length_by_lang",
    oracle="""
    WITH med AS (
      SELECT lang,
             PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n_chars) AS md
      FROM documents GROUP BY lang
    ), z AS (
      SELECT d.lang, ABS(d.n_chars - med.md) AS zdev
      FROM documents d JOIN med ON d.lang = med.lang
    ), g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(zdev) AS BIGINT) AS s_g,
             CAST(SUM(zdev * zdev) AS BIGINT) AS q_g
      FROM z GROUP BY lang
    ), terms AS (
      SELECT n_g, s_g,
             CAST(ROUND(CAST(s_g AS DOUBLE) / 1000.0
                        * (CAST(s_g AS DOUBLE) / 1000.0) / n_g, 6)
                  AS DECIMAL(28,6)) AS sg2n,
             CAST(ROUND(CAST(q_g AS DOUBLE) / 1000000.0
                        - CAST(s_g AS DOUBLE) / 1000.0
                          * (CAST(s_g AS DOUBLE) / 1000.0) / n_g, 6)
                  AS DECIMAL(28,6)) AS ssw_g
      FROM g
    ), tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(s_g) AS DOUBLE) / 1000.0 AS s,
             CAST(SUM(sg2n) AS DOUBLE) AS sg2n,
             CAST(SUM(ssw_g) AS DOUBLE) AS ssw
      FROM terms
    )
    SELECT n AS n_docs, k AS k_langs,
           ROUND(((sg2n - s * s / n) / (k - 1)) / (ssw / (n - k)), 6)
             AS bf_stat
    FROM tot
    """,
    tags=("stats", "levene", "brown-forsythe", "variance"),
)
def documents_levene_length_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Brown-Forsythe test: does document-LENGTH VARIABILITY differ
    across languages? One-way ANOVA on |length − group MEDIAN| — the
    robust Levene variant (median centers survive the length tail that
    wrecks mean-centered Levene). Medians are exact order statistics via
    group_quantiles_disc (partition-bounded state — docs-per-language
    grows with the corpus, so the builtin percentile_disc buffer would
    too; broadcast back — 5 rows), deviations and
    both moment sums are int64, and the F assembly reuses the
    scaled-units discipline from orders_weekday_anova_f (thousands here:
    deviations are ~1e3). Tests the SPREAD question the location tests
    (Kruskal-Wallis/ANOVA) can't see."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    d = load_table(spark, sf_dir, "documents")
    med = group_quantiles_disc(d, "n_chars", [0.5], ["lang"]).select(
        "lang", F.col(_qcolname(0.5)).cast("bigint").alias("md")
    )
    z = d.join(F.broadcast(med), "lang").select(
        "lang", F.abs(F.col("n_chars") - F.col("md")).alias("zdev")
    )
    g = z.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("zdev").cast("bigint").alias("s_g"),
        F.sum(F.col("zdev") * F.col("zdev")).cast("bigint").alias("q_g"),
    )
    sd = F.col("s_g").cast("double") / F.lit(1000.0)
    terms = g.select(
        "n_g",
        "s_g",
        F.round(sd * sd / F.col("n_g"), 6)
        .cast("decimal(28,6)")
        .alias("sg2n"),
        F.round(
            F.col("q_g").cast("double") / F.lit(1000000.0)
            - sd * sd / F.col("n_g"),
            6,
        )
        .cast("decimal(28,6)")
        .alias("ssw_g"),
    )
    tot = terms.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.sum("s_g").cast("double") / F.lit(1000.0)).alias("s"),
        F.sum("sg2n").cast("double").alias("sg2n"),
        F.sum("ssw_g").cast("double").alias("ssw"),
    )
    n, k, s = F.col("n"), F.col("k"), F.col("s")
    ssb = F.col("sg2n") - s * s / n
    return tot.select(
        n.alias("n_docs"),
        k.alias("k_langs"),
        F.round((ssb / (k - 1)) / (F.col("ssw") / (n - k)), 6).alias(
            "bf_stat"
        ),
    )
