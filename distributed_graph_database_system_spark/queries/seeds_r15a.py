"""R15_POOL head start, batch A: eight first-time registrations banked a
round early so the round-15 rotation inherits parity-proven names the same
way round 14 does. Families: unit-economics bands, weekend/weekday value
ratios, a Hill tail-index estimator, a calendar interaction heatmap,
pairwise source-vocabulary Jaccard, a 2-hop reach golden, new-vs-returning
customer lifecycle, and hourly load dispersion. All parity-verified at
sf0.001/0.01/0.1 at registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec, dsum
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- unit-price bands ----------------------------------------------------------------


@query(
    "lineitem_unit_price_bands",
    oracle="""
    WITH u AS (
      SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(FLOOR(CAST(cents AS DOUBLE) / qty / 50000) AS INT)
             AS unit_price_band_500,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(qty) AS BIGINT) AS total_qty
    FROM u GROUP BY l_returnflag, unit_price_band_500
    ORDER BY l_returnflag, unit_price_band_500
    """,
    tags=("unit-economics", "bands", "census"),
)
def lineitem_unit_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price ($500 bands) census per return flag — the
    unit-economics profile (extended price over quantity). The band
    floor runs on an identical two-op IEEE chain (cents/qty, /50000) in
    both engines over exact integer inputs, so banding cannot shear;
    counts and quantity sums are exact."""
    li = load_table(spark, sf_dir, "lineitem")
    u = li.select(
        "l_returnflag",
        (dec("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    return (
        u.groupBy(
            "l_returnflag",
            F.floor(F.col("cents").cast("double") / F.col("qty") / 50000)
            .cast("int")
            .alias("unit_price_band_500"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("qty").cast("bigint").alias("total_qty"),
        )
        .orderBy("l_returnflag", "unit_price_band_500")
    )


# --- weekend vs weekday value ratio ----------------------------------------------------


@query(
    "events_weekend_value_ratio",
    oracle="""
    WITH x AS (
      SELECT event_type,
             date_part('isodow', ts) >= 6 AS wknd,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ), g AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (wknd) AS BIGINT) AS n_wknd,
             CAST(COUNT(*) FILTER (NOT wknd) AS BIGINT) AS n_wkdy,
             CAST(SUM(v) FILTER (wknd) AS DOUBLE) AS v_wknd,
             CAST(SUM(v) FILTER (NOT wknd) AS DOUBLE) AS v_wkdy
      FROM x GROUP BY event_type
    )
    SELECT event_type, n_wknd, n_wkdy,
           ROUND((v_wknd / n_wknd) / (v_wkdy / n_wkdy), 6)
             AS weekend_value_ratio
    FROM g ORDER BY event_type
    """,
    tags=("scalar", "datetime", "isodow", "ratio"),
)
def events_weekend_value_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend-to-weekday mean-value ratio per event type (1.0 = no
    weekly rhythm) — the seasonality screen on the VALUE dimension where
    the weekend-share query covers volume. Conditional exact-decimal
    sums and counts in one pass; the ratio is a fixed four-op IEEE chain
    on identical inputs."""
    e = load_table(spark, sf_dir, "events")
    wknd = F.weekday("ts") + 1 >= 6
    v = dec("value")
    g = e.groupBy("event_type").agg(
        F.count(F.when(wknd, 1)).cast("bigint").alias("n_wknd"),
        F.count(F.when(~wknd, 1)).cast("bigint").alias("n_wkdy"),
        F.sum(F.when(wknd, v)).cast("double").alias("v_wknd"),
        F.sum(F.when(~wknd, v)).cast("double").alias("v_wkdy"),
    )
    return g.select(
        "event_type",
        "n_wknd",
        "n_wkdy",
        F.round(
            (F.col("v_wknd") / F.col("n_wknd"))
            / (F.col("v_wkdy") / F.col("n_wkdy")),
            6,
        ).alias("weekend_value_ratio"),
    ).orderBy("event_type")


# --- Hill tail-index estimator ------------------------------------------------------------


@query(
    "customer_balance_hill_tail_index",
    oracle="""
    WITH pos AS (
      SELECT CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM customer WHERE c_acctbal > 0
    ), xmin AS (
      SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS xm
      FROM pos
    ), tail AS (
      SELECT CAST(ROUND(LN(CAST(cents AS DOUBLE) / xm), 8)
                  AS DECIMAL(28,8)) AS t
      FROM pos CROSS JOIN xmin WHERE cents > xm
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pos) AS n_positive,
           (SELECT CAST(xm AS BIGINT) FROM xmin) AS xmin_cents,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM tail) AS n_tail,
           ROUND((SELECT COUNT(*) FROM tail)
                 / CAST((SELECT SUM(t) FROM tail) AS DOUBLE), 6)
             AS hill_alpha
    """,
    tags=("stats", "tail-index", "hill", "powerlaw"),
)
def customer_balance_hill_tail_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hill estimator of the balance distribution's tail index over the
    top decile (α = k / Σ ln(x_i/x_min) — the standard heavy-tail
    screen; a uniform-ish fixture yields a LARGE α, which is the point:
    the estimator must report thin tails as thin). The threshold is an
    exact order statistic; each log-ratio term rounds to 8dp and folds
    as DECIMAL."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    c = load_table(spark, sf_dir, "customer")
    pos = c.where(F.col("c_acctbal") > 0).select(
        (dec("c_acctbal", 12, 2) * 100).cast("bigint").alias("cents"),
        F.lit(1).alias("g"),
    )
    # threshold via the partition-bounded order-statistic machinery (a
    # global builtin percentile_disc would buffer every positive balance)
    xmin = (
        group_quantiles_disc(pos, "cents", [0.9], ["g"])
        .drop("g")
        .withColumnRenamed(_qcolname(0.9), "xm")
    )
    pos = pos.drop("g")
    tail = (
        pos.crossJoin(F.broadcast(xmin))
        .where(F.col("cents") > F.col("xm"))
        .select(
            F.round(F.log(F.col("cents").cast("double") / F.col("xm")), 8)
            .cast("decimal(28,8)")
            .alias("t")
        )
    )
    n_pos = pos.agg(F.count(F.lit(1)).cast("bigint").alias("n_positive"))
    t_agg = tail.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum("t").cast("double").alias("tsum"),
    )
    return (
        n_pos.crossJoin(F.broadcast(xmin))
        .crossJoin(F.broadcast(t_agg))
        .select(
            "n_positive",
            F.col("xm").cast("bigint").alias("xmin_cents"),
            "n_tail",
            F.round(F.col("n_tail") / F.col("tsum"), 6).alias("hill_alpha"),
        )
    )


# --- weekday x month interaction heatmap ----------------------------------------------------


@query(
    "orders_dow_month_heatmap",
    oracle="""
    WITH t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders)
    SELECT CAST(date_part('isodow', o_orderdate) AS INT) AS isodow,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT n FROM t), 6) AS share
    FROM orders GROUP BY isodow, mon ORDER BY isodow, mon
    """,
    tags=("scalar", "datetime", "heatmap", "census"),
)
def orders_dow_month_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-weekday × month order-volume heatmap (the 7×12 interaction
    grid a seasonality dashboard draws) — exact counts, one rounded
    share per cell, one scan."""
    o = load_table(spark, sf_dir, "orders")
    t = o.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        o.groupBy(
            (F.weekday("o_orderdate") + 1).cast("int").alias("isodow"),
            F.month("o_orderdate").cast("int").alias("mon"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .crossJoin(F.broadcast(t))
        .select(
            "isodow",
            "mon",
            "n_orders",
            F.round(F.col("n_orders").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
        )
        .orderBy("isodow", "mon")
    )


# --- pairwise source-vocabulary Jaccard -----------------------------------------------------


@query(
    "documents_source_vocab_jaccard",
    oracle=r"""
    WITH v AS (
      SELECT DISTINCT source, w AS word
      FROM documents,
           unnest(string_split_regex(
             regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'))
             AS t(w)
      WHERE len(w) > 0
    ), sz AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS vs FROM v GROUP BY source
    ), inter AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM v a JOIN v b ON a.word = b.word AND a.source < b.source
      GROUP BY src_a, src_b
    )
    SELECT src_a, src_b, n_common,
           ROUND(CAST(n_common AS DOUBLE)
                 / (sa.vs + sb.vs - n_common), 6) AS vocab_jaccard
    FROM inter
    JOIN sz sa ON sa.source = src_a
    JOIN sz sb ON sb.source = src_b
    ORDER BY src_a, src_b
    """,
    tags=("llm", "dedup", "jaccard", "vocabulary"),
)
def documents_source_vocab_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources — the corpus-level
    near-dup screen (two sources sharing 90% of their vocabulary are
    candidates for the document-level MinHash pass). The pair join runs
    over the DISTINCT (source, word) projection, keyed on the word, and
    the union size comes by inclusion-exclusion from the per-source
    vocabulary counts — no document bodies move anywhere."""
    d = load_table(spark, sf_dir, "documents")
    v = (
        d.select(
            "source",
            F.explode(
                F.split(
                    F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
                    " ",
                )
            ).alias("word"),
        )
        .where(F.length("word") > 0)
        .distinct()
    )
    sz = v.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("vs"))
    a = v.select(F.col("source").alias("src_a"), "word")
    b = v.select(F.col("source").alias("src_b"), "word")
    inter = (
        a.join(b, "word")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sz.select(F.col("source").alias("src_a"), F.col("vs").alias("va"))
    sb = sz.select(F.col("source").alias("src_b"), F.col("vs").alias("vb"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("va") + F.col("vb") - F.col("n_common")),
                6,
            ).alias("vocab_jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


# --- 2-hop reach on G8 ---------------------------------------------------------------------


@query(
    "graph_two_hop_reach_g8",
    oracle="""
    WITH base AS (
      SELECT v AS src, v + 1 AS dst
      FROM (SELECT unnest(range(1, 17)) AS v) WHERE v % 4 <> 0
      UNION ALL
      SELECT v, v + 4 FROM (SELECT unnest(range(1, 13)) AS v)
      UNION ALL SELECT 1, 6 UNION ALL SELECT 16, 1
    ), e AS (
      SELECT src, dst FROM base UNION SELECT dst, src FROM base
    ), hop1 AS (SELECT DISTINCT src AS v, dst AS r FROM e),
    hop2 AS (
      SELECT DISTINCT h.v, e.dst AS r
      FROM hop1 h JOIN e ON e.src = h.r WHERE e.dst <> h.v
      UNION SELECT v, r FROM hop1
    )
    SELECT CAST(v AS BIGINT) AS vid,
           CAST((SELECT COUNT(*) FROM hop1 WHERE hop1.v = hop2.v)
                AS BIGINT) AS n_1hop,
           CAST(COUNT(*) AS BIGINT) AS n_2hop
    FROM hop2 GROUP BY v ORDER BY vid
    """,
    tags=("graph", "two-hop", "reach", "neighborhood"),
)
def graph_two_hop_reach_g8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hop and 2-hop neighborhood sizes of every G8 vertex (undirected)
    — the friend-of-friend reach census, the quantity behind expansion
    and spam-neighborhood heuristics. Two distinct-projected joins (the
    2-hop set is union'd with the 1-hop set, self excluded); the oracle
    regenerates the grid-with-chord edges arithmetically and replays the
    same joins. Uses the graph_bfs_g8 fixture (queries/seeds_r13a.py
    G8)."""
    from distributed_graph_database_system_spark.queries.seeds_r13a import (
        _g8_edges,
    )

    base = _g8_edges(spark)
    e = base.select("src", "dst").union(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    hop1 = e.select(F.col("src").alias("v"), F.col("dst").alias("r")).distinct()
    bridge = hop1.select(F.col("v"), F.col("r").alias("mid"))
    two = (
        bridge.join(
            e.select(F.col("src").alias("mid"), F.col("dst").alias("r")),
            "mid",
        )
        .where(F.col("r") != F.col("v"))
        .select("v", "r")
        .union(hop1.select("v", "r"))
        .distinct()
    )
    n1 = hop1.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("n_1hop"))
    n2 = two.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("n_2hop"))
    return (
        n1.join(n2, "v")
        .select(F.col("v").cast("bigint").alias("vid"), "n_1hop", "n_2hop")
        .orderBy("vid")
    )


# --- new vs returning customers per year ------------------------------------------------------


@query(
    "orders_new_vs_returning_customers",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, CAST(year(MIN(o_orderdate)) AS INT) AS first_yr
      FROM orders GROUP BY o_custkey
    ), active AS (
      SELECT DISTINCT o_custkey, CAST(year(o_orderdate) AS INT) AS yr
      FROM orders
    )
    SELECT a.yr,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(COUNT(*) FILTER (f.first_yr = a.yr) AS BIGINT) AS n_new,
           CAST(COUNT(*) FILTER (f.first_yr < a.yr) AS BIGINT)
             AS n_returning,
           ROUND(CAST(COUNT(*) FILTER (f.first_yr = a.yr) AS DOUBLE)
                 / COUNT(*), 6) AS new_share
    FROM active a JOIN firsts f ON a.o_custkey = f.o_custkey
    GROUP BY a.yr ORDER BY a.yr
    """,
    tags=("lifecycle", "cohort", "new-vs-returning"),
)
def orders_new_vs_returning_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """New-vs-returning active customers per year — the growth-accounting
    split every business review opens with. One first-order aggregate,
    one distinct (customer, year) projection, one equi-join; counts
    exact, one rounded share."""
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("int").alias("first_yr")
    )
    active = o.select(
        "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    ).distinct()
    j = active.join(firsts, "o_custkey")
    new = F.count(F.when(F.col("first_yr") == F.col("yr"), 1))
    return (
        j.groupBy("yr")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            new.cast("bigint").alias("n_new"),
            F.count(F.when(F.col("first_yr") < F.col("yr"), 1))
            .cast("bigint")
            .alias("n_returning"),
            F.round(new.cast("double") / F.count(F.lit(1)), 6).alias(
                "new_share"
            ),
        )
        .orderBy("yr")
    )


# --- hourly load dispersion ---------------------------------------------------------------------


@query(
    "events_hourly_load_cv",
    oracle="""
    WITH h AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY hr
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS s,
             CAST(SUM(n * n) AS BIGINT) AS ss,
             CAST(MIN(n) AS BIGINT) AS mn, CAST(MAX(n) AS BIGINT) AS mx
      FROM h
    )
    SELECT k AS n_hours, s AS n_events, mn AS min_hourly, mx AS max_hourly,
           ROUND(SQRT(CAST(k AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                 / s, 6) AS load_cv
    FROM m
    """,
    tags=("stats", "dispersion", "cv", "capacity"),
)
def events_hourly_load_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coefficient of variation of hourly event counts (scaled √(k·Σn² −
    (Σn)²)/Σn — the population-CV form that needs no mean division) —
    the capacity-planning dispersion number: CV ≈ 0 means flat load,
    large CV means bursty provisioning. Hourly counts and both moment
    sums are exact integers; the CV is one sqrt over one fixed chain."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    m = h.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("ss"),
        F.min("n").cast("bigint").alias("mn"),
        F.max("n").cast("bigint").alias("mx"),
    )
    return m.select(
        F.col("k").alias("n_hours"),
        F.col("s").alias("n_events"),
        F.col("mn").alias("min_hourly"),
        F.col("mx").alias("max_hourly"),
        F.round(
            F.sqrt(
                F.col("k").cast("double") * F.col("ss")
                - F.col("s").cast("double") * F.col("s")
            )
            / F.col("s"),
            6,
        ).alias("load_cv"),
    )
