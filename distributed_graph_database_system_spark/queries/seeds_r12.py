"""Round-12 first-time driver-evidence pool (registered in round 11).

The round-11 window rotation grades the 25-name R11_POOL; these
registrations (a) fill that window to 50 strictly-first-time names and
(b) leave the NEXT rotation a fresh never-graded pool. The batch extends
the exact-integer statistics family (rank tests, survival comparison,
robust screens, trend estimators) plus relational/source/graph/embedding
surface listed in registry.py's R12_POOL comment.

Reference parity: the reference (SURVEY §2.1) has none of these; every
query is north-star surface. Determinism discipline (queries/helpers.py):
money and 2dp measures summed as DECIMAL(18,2) → DOUBLE at the end on
both sides; true-float per-term values ROUND(x, 6) → DECIMAL sum (the
corpus_source_entropy device) so addition order can't flip a bit; ranks
kept as exact integers via the 2×-average-rank trick; total-order
tie-breaks; no DATE output columns (cast to TIMESTAMP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- rank correlation: Kendall tau-b ----------------------------------------


@query(
    "events_kendall_tau_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS x,
             CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS y
      FROM events GROUP BY day
    ), p AS (
      SELECT (b.x - a.x) AS dx, (b.y - a.y) AS dy
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) FILTER (dx * dy > 0) AS BIGINT) AS concordant,
           CAST(COUNT(*) FILTER (dx * dy < 0) AS BIGINT) AS discordant,
           ROUND(CAST(COUNT(*) FILTER (dx * dy > 0)
                      - COUNT(*) FILTER (dx * dy < 0) AS DOUBLE)
                 / SQRT(CAST(COUNT(*) - COUNT(*) FILTER (dx = 0) AS DOUBLE)
                        * CAST(COUNT(*) - COUNT(*) FILTER (dy = 0) AS DOUBLE)),
                 6) AS tau_b
    FROM p
    """,
    tags=("stats", "rank-correlation", "kendall"),
)
def events_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between the daily purchase and
    error counts — the Spearman twin's (part_size_price_spearman)
    concordance-counting sibling, with the tau-b tie correction in the
    denominator. The day-pair enumeration happens AFTER the daily
    aggregation, so the pairwise self-join is over ~30 rows regardless
    of event volume: at 100 TB the reduction is the shuffle and the
    O(days²) tail is constant. Concordant/discordant/tie counts are
    exact integers; the only float ops are one sqrt and one division."""
    e = load_table(spark, sf_dir, "events")
    # localCheckpoint: three consumers (both pair sides + n_days), one
    # events scan.
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("bigint")
            .alias("x"),
            F.count(F.when(F.col("event_type") == "error", 1))
            .cast("bigint")
            .alias("y"),
        )
        .localCheckpoint()
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        (F.col("b.x") - F.col("a.x")).alias("dx"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    c = F.count(F.when(F.col("dx") * F.col("dy") > 0, 1))
    d = F.count(F.when(F.col("dx") * F.col("dy") < 0, 1))
    tx = F.count(F.when(F.col("dx") == 0, 1))
    ty = F.count(F.when(F.col("dy") == 0, 1))
    n0 = F.count(F.lit(1))
    return pairs.agg(
        n0.cast("bigint").alias("n_pairs"),
        c.cast("bigint").alias("concordant"),
        d.cast("bigint").alias("discordant"),
        F.round(
            (c - d).cast("double")
            / F.sqrt((n0 - tx).cast("double") * (n0 - ty).cast("double")),
            6,
        ).alias("tau_b"),
    ).crossJoin(F.broadcast(n_days)).select(
        "n_days", "n_pairs", "concordant", "discordant", "tau_b"
    )


# --- two-sample Kolmogorov-Smirnov ------------------------------------------


@query(
    "events_ks_two_sample",
    oracle="""
    WITH g AS (
      SELECT CAST(value AS DECIMAL(18,2)) AS v,
             CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS a,
             CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS b
      FROM events WHERE event_type IN ('purchase', 'view') GROUP BY v
    ), c AS (
      SELECT v,
             SUM(a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
             (SELECT SUM(a) FROM g) AS n1, (SELECT SUM(b) FROM g) AS n2
      FROM g
    ), d AS (
      SELECT v, n1, n2,
             ABS(CAST(ca AS DECIMAL(38,0)) * n2
                 - CAST(cb AS DECIMAL(38,0)) * n1) AS gap
      FROM c
    )
    SELECT CAST(MAX(n1) AS BIGINT) AS n1, CAST(MAX(n2) AS BIGINT) AS n2,
           ROUND(CAST(MAX(gap) AS DOUBLE)
                 / (CAST(MAX(n1) AS DOUBLE) * MAX(n2)), 6) AS d_stat,
           CAST(MIN(CASE WHEN gap = (SELECT MAX(gap) FROM d) THEN v END)
                AS DOUBLE) AS at_value
    FROM d
    """,
    tags=("stats", "ks-test", "distribution"),
)
def events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the purchase and
    view value distributions. The ECDF gap is maximized in EXACT
    arithmetic — |ca·n2 − cb·n1| over cumulative per-distinct-value
    counts, carried as DECIMAL(38,0) so the cross products stay exact
    past the int64 line (counts up to ~1e19 rows per sample) — and the
    single division happens once at the end. Values are pre-aggregated per distinct 2dp amount before
    the cumulative window, so the ordered pass is over the value
    histogram (≤ ~49k cells for any event volume), not the raw rows —
    the same histogram-first shape as events_sliding7_quantiles_hist —
    and both cumulative ECDFs ride one multi-measure distributed prefix
    pass (operators/prefix.py partitioned_prefix_sums), so there is no
    single-task window even at full histogram cardinality."""
    e = load_table(spark, sf_dir, "events")
    g = (
        e.where(F.col("event_type").isin("purchase", "view"))
        .groupBy(dec("value").alias("v"))
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("bigint")
            .alias("a"),
            F.count(F.when(F.col("event_type") == "view", 1))
            .cast("bigint")
            .alias("b"),
        )
    )
    from distributed_graph_database_system_spark.operators.prefix import (
        partitioned_prefix_sums,
    )

    # localCheckpoint: the per-value histogram feeds the totals AND the
    # cumulative pass — one events scan, not three.
    g = g.localCheckpoint()
    tot = g.agg(
        F.sum("a").alias("n1"), F.sum("b").alias("n2")
    )
    # both ECDFs ride ONE distributed prefix pass (multi-measure form) —
    # no single-task window over the value histogram, which for a
    # near-continuous value column is row-sized.
    c = partitioned_prefix_sums(g, ["v"], ["a", "b"], ["ca", "cb"]).crossJoin(
        F.broadcast(tot)
    )
    # DECIMAL(38,0) products on both sides: at warehouse scale the
    # cumulative-count x total cross terms pass 1e18 (counts ~3e9 per
    # sample already overflow BIGINT), and non-ANSI Spark would wrap
    # silently, corrupting the argmax. Decimal keeps the gap exact to
    # 1e38 (~1e19 rows per sample).
    d = c.select(
        "v",
        "n1",
        "n2",
        F.abs(
            F.col("ca").cast("decimal(38,0)") * F.col("n2")
            - F.col("cb").cast("decimal(38,0)") * F.col("n1")
        ).alias("gap"),
    )
    # single-pass argmax: max of (gap, -v) structs = max gap, then MIN v
    # among ties — no second scan of the ECDF pipeline for the witness.
    best = F.max(F.struct(F.col("gap").alias("gap"), (-F.col("v")).alias("nv")))
    return d.agg(
        F.max("n1").cast("bigint").alias("n1"),
        F.max("n2").cast("bigint").alias("n2"),
        F.round(
            F.max("gap").cast("double")
            / (F.max("n1").cast("double") * F.max("n2")),
            6,
        ).alias("d_stat"),
        (-best.getField("nv")).cast("double").alias("at_value"),
    )


# --- Wilcoxon signed-rank (paired) ------------------------------------------


@query(
    "orders_wilcoxon_signed_rank",
    oracle="""
    WITH pair AS (
      SELECT o_custkey,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1995
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS r95,
             SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS r96
      FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
      GROUP BY o_custkey
      HAVING r95 IS NOT NULL AND r96 IS NOT NULL AND r95 <> r96
    ), ranked AS (
      SELECT r95 > r96 AS pos, ABS(r95 - r96) AS absd,
             2 * RANK() OVER (ORDER BY ABS(r95 - r96))
               + COUNT(*) OVER (PARTITION BY ABS(r95 - r96)) - 1 AS avg2
      FROM pair
    ), ties AS (
      SELECT COALESCE(SUM(t * t * t - t), 0) AS tiesum
      FROM (SELECT COUNT(*) AS t FROM ranked GROUP BY absd HAVING COUNT(*) > 1)
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN pos THEN avg2 ELSE 0 END) AS BIGINT) AS w2p
      FROM ranked
    )
    SELECT n AS n_pairs,
           CAST(w2p AS DOUBLE) / 2.0 AS w_plus,
           ROUND((CAST(w2p AS DOUBLE) / 2.0
                  - CAST(n * (n + 1) AS DOUBLE) / 4.0)
                 / SQRT(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24.0
                        - CAST(tiesum AS DOUBLE) / 48.0), 6) AS z
    FROM s CROSS JOIN ties
    """,
    tags=("stats", "wilcoxon", "paired-test", "rank"),
)
def orders_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on paired per-customer revenue, 1995 vs
    1996 (customers active in both years) — the paired twin of the
    Mann-Whitney U (events_mannwhitney_purchase_view). Differences are
    exact DECIMAL, average ranks are kept as the exact INTEGER 2×rank
    (2·min_rank + tie_count − 1), and the normal approximation with the
    tie-corrected variance n(n+1)(2n+1)/24 − Σ(t³−t)/48 is assembled
    from integer aggregates in one identical IEEE sequence per engine.
    The global rank window is over customers-active-both-years (already
    one reduction down); operators/quantile.py ranks are the
    multi-partition path at catalog scale."""
    o = load_table(spark, sf_dir, "orders").where(
        F.year("o_orderdate").isin(1995, 1996)
    )
    pair = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.year("o_orderdate") == 1995, dec("o_totalprice"))
            ).alias("r95"),
            F.sum(
                F.when(F.year("o_orderdate") == 1996, dec("o_totalprice"))
            ).alias("r96"),
        )
        .where(
            F.col("r95").isNotNull()
            & F.col("r96").isNotNull()
            & (F.col("r95") != F.col("r96"))
        )
    )
    from distributed_graph_database_system_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    absd = F.abs(F.col("r95") - F.col("r96"))
    # Ranks via the |diff| HISTOGRAM through the distributed two-pass
    # prefix sum — no row-level global rank window (the Kruskal-Wallis
    # lesson: avg rank of every row at value v is 2·cum(v) − t(v) + 1).
    pg = pair.select(
        (F.col("r95") > F.col("r96")).alias("pos"), absd.alias("absd")
    ).groupBy("absd", "pos").agg(F.count(F.lit(1)).alias("cnt_pg"))
    hist = pg.groupBy("absd").agg(F.sum("cnt_pg").alias("t"))
    av = partitioned_prefix_sum(hist, ["absd"], "t", "cum").select(
        "absd",
        "t",
        (2 * F.col("cum") - F.col("t") + 1).alias("avg2"),
    ).localCheckpoint()  # feeds the tie census AND the main aggregate
    ties = (
        av.where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            ).alias("tiesum")
        )
    )
    s = pg.join(av, "absd").agg(
        F.sum("cnt_pg").cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("pos"), F.col("cnt_pg") * F.col("avg2")).otherwise(0)
        )
        .cast("bigint")
        .alias("w2p"),
    )
    n, w2p, tiesum = F.col("n"), F.col("w2p"), F.col("tiesum")
    w_plus = w2p.cast("double") / F.lit(2.0)
    mu = (n * (n + 1)).cast("double") / F.lit(4.0)
    var = (n * (n + 1) * (2 * n + 1)).cast("double") / F.lit(
        24.0
    ) - tiesum.cast("double") / F.lit(48.0)
    return s.crossJoin(F.broadcast(ties)).select(
        n.alias("n_pairs"),
        w_plus.alias("w_plus"),
        F.round((w_plus - mu) / F.sqrt(var), 6).alias("z"),
    )


# --- log-rank test (survival curve comparison) ------------------------------


@query(
    "events_log_rank_cohorts",
    oracle="""
    WITH u AS (
      SELECT user_id,
             struct_extract(min({'ts': ts, 'eid': event_id,
                                 'et': event_type}), 'et') = 'view' AS g1,
             CASE WHEN MAX(ts) FILTER (event_type = 'purchase') IS NOT NULL
                  THEN 1 ELSE 0 END AS ev,
             date_diff('day', CAST(MIN(ts) AS DATE),
                       CAST(COALESCE(MAX(ts) FILTER (event_type = 'purchase'),
                                     MAX(ts)) AS DATE)) AS t
      FROM events GROUP BY user_id
    ), tt AS (
      SELECT t,
             CAST(COUNT(*) AS BIGINT) AS arr,
             CAST(COUNT(*) FILTER (g1) AS BIGINT) AS arr1,
             CAST(COUNT(*) FILTER (ev = 1) AS BIGINT) AS d,
             CAST(COUNT(*) FILTER (ev = 1 AND g1) AS BIGINT) AS d1
      FROM u GROUP BY t
    ), risk AS (
      SELECT t, d, d1,
             SUM(arr) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n,
             SUM(arr1) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS n1
      FROM tt
    ), terms AS (
      SELECT d1,
             CAST(ROUND(CAST(n1 * d AS DOUBLE) / n, 6)
                  AS DECIMAL(18,6)) AS e1,
             CAST(ROUND(CAST(d * n1 * (n - n1) * (n - d) AS DOUBLE)
                        / (CAST(n AS DOUBLE) * n * (n - 1)), 6)
                  AS DECIMAL(18,6)) AS v
      FROM risk WHERE d > 0 AND n > 1
    )
    SELECT (SELECT CAST(COUNT(*) FILTER (g1) AS BIGINT) FROM u) AS n1_users,
           (SELECT CAST(COUNT(*) FILTER (NOT g1) AS BIGINT) FROM u)
             AS n2_users,
           CAST(SUM(d1) AS BIGINT) AS o1,
           ROUND(CAST(SUM(e1) AS DOUBLE), 4) AS e1,
           CASE WHEN SUM(v) = 0 THEN NULL
                ELSE ROUND(POW(SUM(d1) - CAST(SUM(e1) AS DOUBLE), 2)
                           / CAST(SUM(v) AS DOUBLE), 4) END AS chisq
    FROM terms
    """,
    tags=("stats", "survival", "log-rank"),
)
def events_log_rank_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing time-to-first-purchase-completion curves
    between users whose FIRST event is a view and everyone else — the
    hypothesis-test companion to the Kaplan-Meier curve
    (events_survival_km). Duration = days from first event to last
    purchase (event) or last activity (censored). At-risk counts come
    from a DESCENDING cumulative window over per-day arrivals — no
    inequality join — so the ordered pass is over distinct durations
    (≤ observation span in days), not users. Per-time E₁ and variance
    terms are round-6 decimals (order-free sum, the
    corpus_source_entropy device); O₁ is an exact integer."""
    e = load_table(spark, sf_dir, "events")
    pts = F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
    # Cohort = type of the user's FIRST event under the TOTAL order
    # (ts, event_id): a bare min_by(event_type, ts) would leave the
    # winner among same-ts events engine-dependent (the same reason the
    # trigram/Markov/run-length sequence queries order by (ts, event_id)).
    # Lexicographic struct MIN is the portable composite arg-min — DuckDB's
    # arg_min rejects struct keys, but struct MIN compares fieldwise in
    # both engines.
    first_et = F.min(
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("et"),
        )
    ).getField("et")
    u = e.groupBy("user_id").agg(
        (first_et == "view").alias("g1"),
        F.when(pts.isNotNull(), 1).otherwise(0).alias("ev"),
        F.datediff(
            F.to_date(F.coalesce(pts, F.max("ts"))), F.to_date(F.min("ts"))
        ).alias("t"),
    )
    tt = u.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("arr"),
        F.count(F.when(F.col("g1"), 1)).cast("bigint").alias("arr1"),
        F.count(F.when(F.col("ev") == 1, 1)).cast("bigint").alias("d"),
        F.count(F.when((F.col("ev") == 1) & F.col("g1"), 1))
        .cast("bigint")
        .alias("d1"),
    )
    wdesc = W.orderBy(F.desc("t")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = tt.select(
        "t",
        "d",
        "d1",
        F.sum("arr").over(wdesc).alias("n"),
        F.sum("arr1").over(wdesc).alias("n1"),
    )
    n, n1, d = F.col("n"), F.col("n1"), F.col("d")
    terms = risk.where((d > 0) & (n > 1)).select(
        "d1",
        F.round((n1 * d).cast("double") / n, 6)
        .cast("decimal(18,6)")
        .alias("e1"),
        F.round(
            (d * n1 * (n - n1) * (n - d)).cast("double")
            / (n.cast("double") * n * (n - 1)),
            6,
        )
        .cast("decimal(18,6)")
        .alias("v"),
    )
    cohorts = u.agg(
        F.count(F.when(F.col("g1"), 1)).cast("bigint").alias("n1_users"),
        F.count(F.when(~F.col("g1"), 1)).cast("bigint").alias("n2_users"),
    )
    # At tiny scale factors every at-risk term can degenerate (N1 ∈ {0, N})
    # leaving ΣV = 0 — the statistic is undefined, so NULL on both sides
    # (ANSI Spark would otherwise raise DIVIDE_BY_ZERO; DuckDB would emit
    # inf). Same closure as the runs test's σ=0 guard.
    return terms.agg(
        F.sum("d1").cast("bigint").alias("o1"),
        F.round(F.sum("e1").cast("double"), 4).alias("e1"),
        F.when(F.sum("v") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.pow(F.sum("d1") - F.sum("e1").cast("double"), 2)
                / F.sum("v").cast("double"),
                4,
            )
        )
        .alias("chisq"),
    ).crossJoin(F.broadcast(cohorts)).select(
        "n1_users", "n2_users", "o1", "e1", "chisq"
    )


# --- Kruskal-Wallis H (k-sample rank ANOVA) ---------------------------------


@query(
    "orders_kruskal_wallis_priority",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority AS prio,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             2 * RANK() OVER (ORDER BY CAST(o_totalprice AS DECIMAL(18,2)))
               + COUNT(*) OVER (PARTITION BY CAST(o_totalprice
                                              AS DECIMAL(18,2))) - 1 AS avg2
      FROM orders
    ), grp AS (
      SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_j,
             CAST(SUM(avg2) AS BIGINT) AS r2_j
      FROM ranked GROUP BY prio
    ), ties AS (
      SELECT COALESCE(SUM(t * t * t - t), 0) AS tiesum
      FROM (SELECT COUNT(*) AS t FROM ranked GROUP BY p HAVING COUNT(*) > 1)
    ), tot AS (
      SELECT SUM(n_j) AS big_n,
             SUM(CAST(ROUND(CAST(r2_j AS DOUBLE) * r2_j / (4.0 * n_j), 6)
                      AS DECIMAL(38,6))) AS rterm
      FROM grp
    )
    SELECT CAST(big_n AS BIGINT) AS n_total,
           CAST((SELECT COUNT(*) FROM grp) - 1 AS BIGINT) AS df,
           ROUND((12.0 / (CAST(big_n AS DOUBLE) * (big_n + 1)))
                 * CAST(rterm AS DOUBLE) - 3.0 * (big_n + 1), 6) AS h,
           ROUND(((12.0 / (CAST(big_n AS DOUBLE) * (big_n + 1)))
                  * CAST(rterm AS DOUBLE) - 3.0 * (big_n + 1))
                 / (1.0 - CAST(tiesum AS DOUBLE)
                          / (CAST(big_n AS DOUBLE) * big_n * big_n - big_n)),
                 6) AS h_corrected
    FROM tot CROSS JOIN ties
    """,
    tags=("stats", "kruskal-wallis", "rank", "anova"),
)
def orders_kruskal_wallis_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kruskal-Wallis H: does order price distribution differ across the
    five order priorities? The k-sample generalization of the
    Mann-Whitney U already in the registry. Average ranks are exact
    integers (2×avg-rank trick over the decimal price), per-group rank
    sums fold as int64, the five R²/n terms are round-6 decimals, and
    the tie correction 1 − Σ(t³−t)/(N³−N) comes from exact tie counts.
    Ranks come from the distinct-price HISTOGRAM through the distributed
    two-pass prefix sum (operators/prefix.py) — no row-level global
    window anywhere, so the ordered pass is over distinct values and the
    statistic holds its cost at any row volume."""
    from distributed_graph_database_system_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    o = load_table(spark, sf_dir, "orders")
    p = dec("o_totalprice")
    # Rank via the DISTINCT-PRICE histogram, never a row-level global
    # window: per-(price, priority) counts reduce the data, the
    # cumulative tie-group prefix runs through the distributed two-pass
    # prefix sum (operators/prefix.py), and the average rank of every
    # row at price P is the closed form 2·cum(P) − t(P) + 1 (that is,
    # 2·min_rank + t − 1). Measured: the row-window version grew 15× at
    # 100× data; this histogram form is the same shape as the KS query
    # (ordered pass over distinct values only).
    pg = o.groupBy(p.alias("p"), F.col("o_orderpriority").alias("prio")).agg(
        F.count(F.lit(1)).alias("cnt_pg")
    )
    hist = pg.groupBy("p").agg(F.sum("cnt_pg").alias("t"))
    cum = partitioned_prefix_sum(hist, ["p"], "t", "cum")
    av = cum.select(
        "p",
        "t",
        (2 * F.col("cum") - F.col("t") + 1).alias("avg2"),
    ).localCheckpoint()  # feeds both the group sums and the tie census
    grp = (
        pg.join(av, "p")
        .groupBy("prio")
        .agg(
            F.sum("cnt_pg").cast("bigint").alias("n_j"),
            F.sum(F.col("cnt_pg") * F.col("avg2"))
            .cast("bigint")
            .alias("r2_j"),
        )
    )
    ties = (
        av.where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")),
                F.lit(0),
            ).alias("tiesum")
        )
    )
    tot = grp.agg(
        F.sum("n_j").alias("big_n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.round(
                F.col("r2_j").cast("double")
                * F.col("r2_j")
                / (F.lit(4.0) * F.col("n_j")),
                6,
            ).cast("decimal(38,6)")
        ).alias("rterm"),
    )
    bn = F.col("big_n")
    h = (F.lit(12.0) / (bn.cast("double") * (bn + 1))) * F.col("rterm").cast(
        "double"
    ) - F.lit(3.0) * (bn + 1)
    corr = F.lit(1.0) - F.col("tiesum").cast("double") / (
        bn.cast("double") * bn * bn - bn
    )
    return (
        tot.crossJoin(F.broadcast(ties))
        .select(
            bn.cast("bigint").alias("n_total"),
            (F.col("k") - 1).cast("bigint").alias("df"),
            F.round(h, 6).alias("h"),
            F.round(h / corr, 6).alias("h_corrected"),
        )
    )


# --- Theil-Sen robust trend slope -------------------------------------------


@query(
    "orders_theil_sen_daily",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS di,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY di
    ), slopes AS (
      SELECT CAST(b.rev - a.rev AS DOUBLE) / (b.di - a.di) AS slope
      FROM daily a JOIN daily b ON a.di < b.di
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY slope)
                      AS DOUBLE), 6) AS sen_slope
    FROM slopes
    """,
    tags=("stats", "theil-sen", "robust", "trend"),
)
def orders_theil_sen_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator of the daily-revenue trend: the median of all
    pairwise slopes — the robust alternative to the OLS slope
    (lineitem_ols_normal_eq) with a 29.3% breakdown point. Slopes are
    single IEEE divisions of exact decimal revenue diffs by integer day
    gaps; the median is PERCENTILE_DISC (an order statistic — an actual
    slope from the multiset, no interpolation). The pairwise join runs
    over the DAILY aggregate (~2.4k rows for this fixture's 1995–2001
    span), so pair count is O(days²) and INDEPENDENT of row volume —
    the aggregate-then-enumerate shape that keeps the estimator viable
    at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    # localCheckpoint: the ~2.4k-row daily aggregate feeds BOTH sides of
    # the pair join plus the n_days scalar — without it Catalyst re-scans
    # orders three times (no auto-CSE across self-join branches), which at
    # warehouse scale would triple the expensive part of the query.
    daily = (
        o.groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01")
            ).alias("di")
        )
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
        .localCheckpoint()
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.di") < F.col("b.di")).select(
        (
            (F.col("b.rev") - F.col("a.rev")).cast("double")
            / (F.col("b.di") - F.col("a.di"))
        ).alias("slope")
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return slopes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)"
            ).cast("double"),
            6,
        ).alias("sen_slope"),
    ).crossJoin(F.broadcast(n_days)).select("n_days", "n_pairs", "sen_slope")


# --- Tukey fences on the IQR ------------------------------------------------


@query(
    "events_iqr_tukey_fences",
    oracle="""
    WITH q AS (
      SELECT event_type,
             PERCENTILE_DISC(0.25) WITHIN GROUP
               (ORDER BY CAST(value AS DECIMAL(18,2))) AS q1,
             PERCENTILE_DISC(0.75) WITHIN GROUP
               (ORDER BY CAST(value AS DECIMAL(18,2))) AS q3
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(q.q1) AS DOUBLE) AS q1,
           CAST(MIN(q.q3) AS DOUBLE) AS q3,
           CAST(MIN(q.q1 - 1.5 * (q.q3 - q.q1)) AS DOUBLE) AS lo_fence,
           CAST(MIN(q.q3 + 1.5 * (q.q3 - q.q1)) AS DOUBLE) AS hi_fence,
           CAST(COUNT(*) FILTER (CAST(e.value AS DECIMAL(18,2))
                < q.q1 - 1.5 * (q.q3 - q.q1)) AS BIGINT) AS n_low,
           CAST(COUNT(*) FILTER (CAST(e.value AS DECIMAL(18,2))
                > q.q3 + 1.5 * (q.q3 - q.q1)) AS BIGINT) AS n_high
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    tags=("stats", "iqr", "outliers", "robust", "filter"),
)
def events_iqr_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's fences outlier screen per event type: flag values outside
    [Q1 − 1.5·IQR, Q3 + 1.5·IQR] — the boxplot rule, complementing the
    MAD screen (events_mad_outliers) with the quartile-based variant.
    Quartiles are PERCENTILE_DISC order statistics over the exact
    decimal value (no interpolation, no float), the fence arithmetic is
    pure decimal multiplication (1.5 is DECIMAL(2,1)), and the per-type
    quartile table (5 rows) broadcasts back onto the scan — one shuffle
    for the quartiles, zero for the screen."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", dec("value").alias("v")
    )
    # Quartiles via group_quantiles_disc (the builtin percentile_disc
    # aggregate buffers a whole event_type's values in one task — an
    # SF-growing group); the machinery surfaces DOUBLE, but the selected
    # values are actual 2dp column elements, so casting back to
    # DECIMAL(18,2) is exact and restores the all-decimal fence
    # arithmetic.
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    q = group_quantiles_disc(e, "v", [0.25, 0.75], ["event_type"]).select(
        "event_type",
        F.col(_qcolname(0.25)).cast("decimal(18,2)").alias("q1"),
        F.col(_qcolname(0.75)).cast("decimal(18,2)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - F.lit(1.5).cast("decimal(2,1)") * iqr
    hi = F.col("q3") + F.lit(1.5).cast("decimal(2,1)") * iqr
    qf = q.select("event_type", "q1", "q3", lo.alias("lo"), hi.alias("hi"))
    return (
        e.join(F.broadcast(qf), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("q1").cast("double").alias("q1"),
            F.min("q3").cast("double").alias("q3"),
            F.min("lo").cast("double").alias("lo_fence"),
            F.min("hi").cast("double").alias("hi_fence"),
            F.count(F.when(F.col("v") < F.col("lo"), 1))
            .cast("bigint")
            .alias("n_low"),
            F.count(F.when(F.col("v") > F.col("hi"), 1))
            .cast("bigint")
            .alias("n_high"),
        )
        .orderBy("event_type")
    )


# --- exact interpolated percentiles (PERCENTILE_CONT by hand) ----------------


@query(
    "orders_percentile_cont_exact",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus AS status,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    ), sel AS (
      SELECT status, MAX(n) AS n,
             MIN(CASE WHEN rn = ((n - 1) * 1) // 4 + 1 THEN p END) AS lo1,
             MIN(CASE WHEN rn = ((n - 1) * 1 + 3) // 4 + 1 THEN p END) AS hi1,
             ((MAX(n) - 1) * 1) % 4 AS f1,
             MIN(CASE WHEN rn = ((n - 1) * 2) // 4 + 1 THEN p END) AS lo2,
             MIN(CASE WHEN rn = ((n - 1) * 2 + 3) // 4 + 1 THEN p END) AS hi2,
             ((MAX(n) - 1) * 2) % 4 AS f2,
             MIN(CASE WHEN rn = ((n - 1) * 3) // 4 + 1 THEN p END) AS lo3,
             MIN(CASE WHEN rn = ((n - 1) * 3 + 3) // 4 + 1 THEN p END) AS hi3,
             ((MAX(n) - 1) * 3) % 4 AS f3
      FROM ranked GROUP BY status
    )
    SELECT status, CAST(n AS BIGINT) AS n,
           CAST(lo1 + (hi1 - lo1) * f1 * CAST(0.25 AS DECIMAL(3,2))
                AS DOUBLE) AS p25,
           CAST(lo2 + (hi2 - lo2) * f2 * CAST(0.25 AS DECIMAL(3,2))
                AS DOUBLE) AS p50,
           CAST(lo3 + (hi3 - lo3) * f3 * CAST(0.25 AS DECIMAL(3,2))
                AS DOUBLE) AS p75
    FROM sel ORDER BY status
    """,
    tags=("aggregation", "percentile", "order-statistics", "interpolation"),
)
def orders_percentile_cont_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERCENTILE_CONT semantics computed EXACTLY: the quartile position
    (n−1)·q splits into integer floor/ceil row indices and a fractional
    part that is always a quarter {0, ¼, ½, ¾}, so the linear
    interpolation lo + (hi − lo)·f·0.25 is pure DECIMAL multiplication —
    bit-identical across engines, unlike the builtin percentile()
    whose float interpolation diverged cross-engine in round 6 (see
    queries/helpers.py). The discrete twin is orders_price_percentile_disc;
    this closes the continuous half of the percentile surface. Order
    statistics are picked by ROW_NUMBER equality, not a sort-collect."""
    o = load_table(spark, sf_dir, "orders")
    p = dec("o_totalprice")
    wn = W.partitionBy("o_orderstatus")
    ranked = o.select(
        F.col("o_orderstatus").alias("status"),
        p.alias("p"),
        F.row_number()
        .over(wn.orderBy("o_totalprice"))
        .alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n, rn = F.col("n"), F.col("rn")

    def pick(q: int):
        lo_i = ((n - 1) * q - ((n - 1) * q) % 4) / 4 + 1
        hi_i = ((n - 1) * q + 3 - ((n - 1) * q + 3) % 4) / 4 + 1
        lo = F.min(F.when(rn == lo_i, F.col("p")))
        hi = F.min(F.when(rn == hi_i, F.col("p")))
        f = (F.max(n) - 1) * q % 4
        return (
            lo + (hi - lo) * f * F.lit(0.25).cast("decimal(3,2)")
        ).cast("double")

    return (
        ranked.groupBy("status")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            pick(1).alias("p25"),
            pick(2).alias("p50"),
            pick(3).alias("p75"),
        )
        .orderBy("status")
    )


# --- Markov entropy rate ----------------------------------------------------


@query(
    "events_entropy_rate_markov",
    oracle="""
    WITH t AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             event_type AS cur
      FROM events
    ), cnt AS (
      SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n_ij
      FROM t WHERE prev IS NOT NULL GROUP BY prev, cur
    ), src AS (
      SELECT prev, SUM(n_ij) AS n_i FROM cnt GROUP BY prev
    ), tot AS (SELECT SUM(n_ij) AS ntot FROM cnt)
    SELECT cnt.prev AS state,
           CAST(MAX(src.n_i) AS BIGINT) AS n_out,
           ROUND(CAST(SUM(CAST(ROUND((CAST(cnt.n_ij AS DOUBLE) / src.n_i)
                        * (LN(CAST(src.n_i AS DOUBLE) / cnt.n_ij) / LN(2)), 6)
                    AS DECIMAL(18,6))) AS DOUBLE), 4) AS h_cond_bits,
           ROUND(CAST(MAX(src.n_i) AS DOUBLE) / MAX(tot.ntot), 6) AS weight
    FROM cnt JOIN src ON cnt.prev = src.prev CROSS JOIN tot
    GROUP BY cnt.prev ORDER BY state
    """,
    tags=("stats", "markov", "entropy", "sequence"),
)
def events_entropy_rate_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state conditional entropy of the user event-type Markov chain
    — H(next | cur=s) in bits — plus each state's empirical weight: the
    entropy-rate decomposition of the transition matrix that
    events_markov_transitions only tabulates. Transition counts are
    exact integers off ONE lag window per user; the ≤ k² per-state
    entropy terms are round-6 decimals (order-free sum). Predictability
    census for behavioral streams: a state with low conditional entropy
    pins the next action."""
    e = load_table(spark, sf_dir, "events")
    t = e.select(
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev"),
        F.col("event_type").alias("cur"),
    ).where(F.col("prev").isNotNull())
    cnt = t.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ij")
    )
    src = cnt.groupBy("prev").agg(F.sum("n_ij").alias("n_i"))
    tot = cnt.agg(F.sum("n_ij").alias("ntot"))
    term = F.round(
        (F.col("n_ij").cast("double") / F.col("n_i"))
        * (F.log(F.col("n_i").cast("double") / F.col("n_ij")) / F.log(F.lit(2.0))),
        6,
    ).cast("decimal(18,6)")
    return (
        cnt.join(src, "prev")
        .crossJoin(F.broadcast(tot))
        .groupBy(F.col("prev").alias("state"))
        .agg(
            F.max("n_i").cast("bigint").alias("n_out"),
            F.round(F.sum(term).cast("double"), 4).alias("h_cond_bits"),
            F.round(
                F.max("n_i").cast("double") / F.max("ntot"), 6
            ).alias("weight"),
        )
        .orderBy("state")
    )


# --- peak concurrency (interval sweep) --------------------------------------


@query(
    "events_concurrency_peak",
    oracle="""
    WITH spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(ts) AS s, MAX(ts) AS e
      FROM events GROUP BY user_id, day
    ), pts AS (
      SELECT day, s AS at, 1 AS delta, user_id FROM spans
      UNION ALL
      SELECT day, e AS at, -1 AS delta, user_id FROM spans
    ), run AS (
      SELECT day, at,
             SUM(delta) OVER (PARTITION BY day
                              ORDER BY at, delta DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    ), mx AS (
      SELECT day, MAX(conc) AS peak FROM run GROUP BY day
    )
    SELECT CAST(run.day AS TIMESTAMP) AS day,
           CAST(MAX(mx.peak) AS BIGINT) AS peak,
           MIN(CASE WHEN run.conc = mx.peak THEN run.at END) AS first_peak_ts
    FROM run JOIN mx ON run.day = mx.day
    GROUP BY run.day ORDER BY day
    """,
    tags=("window", "intervals", "sweep-line", "concurrency"),
)
def events_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous active users per day via the classic sweep-line:
    each user-day activity span [min ts, max ts] emits +1/−1 boundary
    points, a running sum ordered by (time, starts-before-ends,
    user_id) traces the concurrency curve, and the per-day max plus its
    first attainment time are the answer. Complementary to
    intervals_merge (which unions overlaps; this COUNTS them). The
    window partitions by day, so parallelism is per-day and the sweep
    state is one integer — the 100 TB shape as long as single-day
    boundary counts fit a task (they do: boundaries = 2× active users
    that day)."""
    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    pts = spans.select(
        "day", F.col("s").alias("at"), F.lit(1).alias("delta"), "user_id"
    ).unionAll(
        spans.select(
            "day", F.col("e").alias("at"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    wrun = (
        W.partitionBy("day")
        .orderBy(F.col("at"), F.desc("delta"), F.col("user_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    run = pts.select(
        "day", "at", F.sum("delta").over(wrun).alias("conc")
    )
    mx = run.groupBy("day").agg(F.max("conc").alias("peak"))
    return (
        run.join(mx, "day")
        .groupBy("day")
        .agg(
            F.max("peak").cast("bigint").alias("peak"),
            F.min(
                F.when(F.col("conc") == F.col("peak"), F.col("at"))
            ).alias("first_peak_ts"),
        )
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "peak",
            "first_peak_ts",
        )
        .orderBy("day")
    )
