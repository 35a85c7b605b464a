"""Round-12 pool, batch E: dup-graph structure, revenue concentration
inverse, interarrival burstiness, and lag-2 partial autocorrelation.
Same determinism discipline as seeds_r12.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- near-dup pair-graph degree census ----------------------------------------


@query(
    "documents_dupgraph_degree_census",
    oracle=r"""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_distinct(list_transform(range(1, len(t)-1),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
                  ELSE [array_to_string(t, ' ')] END AS s
      FROM (
        SELECT doc_id,
               CASE WHEN regexp_replace(coalesce(text,''),'^\s+|\s+$','','g')
                      = ''
                    THEN []::VARCHAR[]
                    ELSE string_split_regex(
                           regexp_replace(lower(text),'^\s+|\s+$','','g'),
                           '\s+')
               END AS t
        FROM documents)
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.6
    ), deg AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT id_a AS id FROM pairs UNION ALL SELECT id_b FROM pairs)
      GROUP BY id
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM deg GROUP BY degree ORDER BY degree
    """,
    tags=("llm", "dedup", "graph", "degree-distribution"),
)
def documents_dupgraph_degree_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree distribution of the near-duplicate PAIR GRAPH (exact
    n-gram Jaccard ≥ 0.6, the dedup_clusters input): how many documents
    have k near-duplicates — the histogram that distinguishes isolated
    twins (degree 1, cheap survivor pick) from dense template families
    (high degree ⇒ one connected component swallowing the corpus, the
    pathology that makes naive pair-list dedup quadratic). Pairs come
    from the recall-1.0 prefix-filter join (operators/dedup), never
    all-pairs; the census is two integer aggregations."""
    from distributed_graph_database_system_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold_num=3,
        threshold_den=5,
    )
    deg = (
        pairs.select(F.col("id_a").alias("id"))
        .unionAll(pairs.select(F.col("id_b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("degree")
    )


# --- Pareto 80/20 crossing point ------------------------------------------------


@query(
    "orders_pareto_8020_point",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ), r AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn,
             SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM cust
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(rev) AS t FROM cust
    ), hit AS (
      SELECT MIN(rn) AS k FROM r CROSS JOIN tot
      WHERE CAST(cum AS DOUBLE) >= 0.8 * CAST(t AS DOUBLE)
    )
    SELECT tot.n AS n_customers, CAST(hit.k AS BIGINT) AS k_at_80,
           ROUND(100.0 * hit.k / tot.n, 4) AS top_pct_for_80,
           ROUND(CAST((SELECT MIN(cum) FROM r WHERE rn = hit.k) AS DOUBLE)
                 / CAST(tot.t AS DOUBLE), 6) AS share_at_k
    FROM tot CROSS JOIN hit
    """,
    tags=("stats", "pareto", "concentration", "cumulative"),
)
def orders_pareto_8020_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pareto crossing point: the SMALLEST number of top customers
    whose cumulative revenue reaches 80% — the inverse lookup of the
    Lorenz curve (customer_revenue_lorenz_curve reports shares at fixed
    deciles; this reports the decile at a fixed share), and the scalar
    behind '80/20' claims. The descending cumulative sum stays in exact
    decimal and runs through the distributed two-pass prefix sum
    (operators/prefix.py) — no single-partition window; positivity makes
    the cum strictly increasing, so the crossing index is a COUNT, not a
    rank lookup. orders_abc_pareto's class-banding sibling."""
    from distributed_graph_database_system_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )
    # Distributed descending prefix: order by (−rev, custkey) through the
    # two-pass prefix sum — no single-partition window. Because every
    # revenue is positive the cumulative sum is STRICTLY increasing along
    # the rank order, so the rank column itself is unnecessary:
    # k = |{cum < 0.8·T}| + 1 and the crossing share is min(cum ≥ 0.8·T).
    r = partitioned_prefix_sum(
        cust.select("rev", "o_custkey", (-F.col("rev")).alias("nrev")),
        ["nrev", "o_custkey"],
        "rev",
        "cum",
    ).localCheckpoint()
    tot = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("rev").alias("t")
    )
    rt = r.crossJoin(F.broadcast(tot))
    below = (
        F.col("cum").cast("double")
        < F.lit(0.8) * F.col("t").cast("double")
    )
    share = rt.agg(
        (F.count(F.when(below, 1)) + 1).cast("bigint").alias("kk"),
        F.min(F.when(~below, F.col("cum"))).alias("cum_k"),
        F.min("t").alias("tt"),
        F.min("n").alias("nn"),
    )
    return share.select(
        F.col("nn").alias("n_customers"),
        F.col("kk").alias("k_at_80"),
        F.round(F.lit(100.0) * F.col("kk") / F.col("nn"), 4).alias(
            "top_pct_for_80"
        ),
        F.round(
            F.col("cum_k").cast("double") / F.col("tt").cast("double"), 6
        ).alias("share_at_k"),
    )


# --- interarrival burstiness -------------------------------------------------------


@query(
    "events_interarrival_burstiness",
    oracle="""
    WITH gaps AS (
      -- whole seconds on both sides: DuckDB's epoch() returns fractional
      -- DOUBLE seconds while Spark's unix_timestamp truncates, so both
      -- engines floor microseconds to integer seconds explicitly.
      SELECT user_id,
             (epoch_us(ts) // 1000000)
               - (epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id))
                  // 1000000) AS g
      FROM events
    ), u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(g) AS BIGINT) AS s,
             CAST(SUM(g * g) AS BIGINT) AS q
      FROM gaps WHERE g IS NOT NULL GROUP BY user_id
      HAVING COUNT(*) >= 5
    ), b AS (
      SELECT SQRT((CAST(q AS DOUBLE) / n)
                  - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
               / (CAST(s AS DOUBLE) / n) AS cv
      FROM u
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(CAST(ROUND((cv - 1.0) / (cv + 1.0), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 4) AS mean_burstiness,
           CAST(COUNT(*) FILTER ((cv - 1.0) / (cv + 1.0) > 0) AS BIGINT)
             AS n_bursty
    FROM b
    """,
    tags=("stats", "burstiness", "interarrival", "behavioral"),
)
def events_interarrival_burstiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Goh-Barabási burstiness B = (σ/μ − 1)/(σ/μ + 1) of per-user
    INTERARRIVAL times — B→1 bursty, 0 Poisson, −1 periodic. The
    count-based Fano screen (events_burstiness_fano) measures the same
    phenomenon through windowed counts; interarrival CV is the
    continuous-time estimator and needs only one LAG per user. Gaps are
    exact integer SECONDS (epoch arithmetic), per-user moments fold as
    int64, each user's B is one identical IEEE expression, and the
    population mean uses the round-6 decimal device. Users need ≥5 gaps
    to keep the CV estimate meaningful."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("g"),
    ).where(F.col("g").isNotNull())
    u = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("q"),
    ).where(F.col("n") >= 5)
    mean = F.col("s").cast("double") / F.col("n")
    cv = F.sqrt(F.col("q").cast("double") / F.col("n") - mean * mean) / mean
    b = u.select(cv.alias("cv"))
    bexpr = (F.col("cv") - 1.0) / (F.col("cv") + 1.0)
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.sum(F.round(bexpr, 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("mean_burstiness"),
        F.count(F.when(bexpr > 0, 1)).cast("bigint").alias("n_bursty"),
    )


# --- lag-2 partial autocorrelation ----------------------------------------------------


@query(
    "orders_pacf_lag2_daily",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS di,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY di
    ), lagged AS (
      SELECT rev,
             LAG(rev, 1) OVER (ORDER BY di) AS r1,
             LAG(rev, 2) OVER (ORDER BY di) AS r2
      FROM daily
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(rev) AS DOUBLE) / 1000.0 AS s0,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(rev AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS q0,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(r1 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS c1,
             CAST(SUM(CAST(rev AS DECIMAL(19,2)) * CAST(r2 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS c2,
             CAST(SUM(r1) AS DOUBLE) / 1000.0 AS s1,
             CAST(SUM(r2) AS DOUBLE) / 1000.0 AS s2,
             CAST(SUM(CAST(r1 AS DECIMAL(19,2)) * CAST(r1 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS q1,
             CAST(SUM(CAST(r2 AS DECIMAL(19,2)) * CAST(r2 AS DECIMAL(19,2)))
                  AS DOUBLE) / 1000000.0 AS q2
      FROM lagged WHERE r2 IS NOT NULL
    ), acf AS (
      SELECT n,
             (c1 - s0 * s1 / n)
               / SQRT((q0 - s0 * s0 / n) * (q1 - s1 * s1 / n)) AS rho1,
             (c2 - s0 * s2 / n)
               / SQRT((q0 - s0 * s0 / n) * (q2 - s2 * s2 / n)) AS rho2
      FROM m
    )
    SELECT n AS n_days,
           ROUND(rho1, 6) AS acf1,
           ROUND(rho2, 6) AS acf2,
           ROUND((rho2 - rho1 * rho1) / (1.0 - rho1 * rho1), 6) AS pacf2
    FROM acf
    """,
    tags=("stats", "pacf", "time-series", "autocorrelation"),
)
def orders_pacf_lag2_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-2 PARTIAL autocorrelation of daily revenue via Durbin-Levinson
    — φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²), the direct lag-2 effect after removing
    the lag-1 channel (the statistic that separates AR(1) from AR(2)
    dynamics; events_autocorr_lag1 stops at ρ₁). Both sample
    correlations come from exact decimal cross-moments over one window
    pass, scaled to revenue-thousands BEFORE any float op (the ANOVA
    lesson: rounding a 1e17 double is engine noise), then one shared
    IEEE expression per engine."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01")).alias("di")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("rev"))
    w = W.orderBy("di")
    lagged = daily.select(
        "rev",
        F.lag("rev", 1).over(w).alias("r1"),
        F.lag("rev", 2).over(w).alias("r2"),
    ).where(F.col("r2").isNotNull())
    k1, k2 = F.lit(1000.0), F.lit(1000000.0)
    m = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("rev").cast("double") / k1).alias("s0"),
        (F.sum(F.col("rev") * F.col("rev")).cast("double") / k2).alias("q0"),
        (F.sum(F.col("rev") * F.col("r1")).cast("double") / k2).alias("c1"),
        (F.sum(F.col("rev") * F.col("r2")).cast("double") / k2).alias("c2"),
        (F.sum("r1").cast("double") / k1).alias("s1"),
        (F.sum("r2").cast("double") / k1).alias("s2"),
        (F.sum(F.col("r1") * F.col("r1")).cast("double") / k2).alias("q1"),
        (F.sum(F.col("r2") * F.col("r2")).cast("double") / k2).alias("q2"),
    )
    n = F.col("n")
    rho1 = (F.col("c1") - F.col("s0") * F.col("s1") / n) / F.sqrt(
        (F.col("q0") - F.col("s0") * F.col("s0") / n)
        * (F.col("q1") - F.col("s1") * F.col("s1") / n)
    )
    rho2 = (F.col("c2") - F.col("s0") * F.col("s2") / n) / F.sqrt(
        (F.col("q0") - F.col("s0") * F.col("s0") / n)
        * (F.col("q2") - F.col("s2") * F.col("s2") / n)
    )
    acf = m.select(n, rho1.alias("rho1"), rho2.alias("rho2"))
    return acf.select(
        n.alias("n_days"),
        F.round(F.col("rho1"), 6).alias("acf1"),
        F.round(F.col("rho2"), 6).alias("acf2"),
        F.round(
            (F.col("rho2") - F.col("rho1") * F.col("rho1"))
            / (F.lit(1.0) - F.col("rho1") * F.col("rho1")),
            6,
        ).alias("pacf2"),
    )
