"""R14_POOL, batch E: the six registrations that bring the round-14
rotation pool to exactly 50 first-time names — Jensen-Shannon language
drift, open-order aging bands, fixed-point ECDF probes, a common-neighbor
link-prediction golden, Tukey boxplot statistics, and an md5-seeded
Bernoulli sampling audit. All parity-verified at sf0.001/0.01/0.1 at
registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- Jensen-Shannon divergence of per-source language mixes ----------------------------


@query(
    "documents_source_lang_jsd",
    oracle="""
    WITH j AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ), st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns FROM j
              GROUP BY source),
    lt AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS nl FROM j GROUP BY lang),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM j),
    terms AS (
      SELECT source,
             CAST(ROUND(
               0.5 * (CAST(c AS DOUBLE) / ns)
                 * LN((CAST(c AS DOUBLE) / ns)
                      / (0.5 * (CAST(c AS DOUBLE) / ns)
                         + 0.5 * (CAST(nl AS DOUBLE) / n)))
               + 0.5 * (CAST(nl AS DOUBLE) / n)
                 * LN((CAST(nl AS DOUBLE) / n)
                      / (0.5 * (CAST(c AS DOUBLE) / ns)
                         + 0.5 * (CAST(nl AS DOUBLE) / n))), 8)
             AS DECIMAL(28,8)) AS t
      FROM j JOIN st USING (source) JOIN lt USING (lang) CROSS JOIN tot
    )
    SELECT source, ROUND(CAST(SUM(t) AS DOUBLE), 6) AS jsd
    FROM terms GROUP BY source ORDER BY source
    """,
    tags=("stats", "jsd", "divergence", "llm"),
)
def documents_source_lang_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence of each source's language mix against
    the corpus-wide mix — the symmetric, bounded drift score intake
    monitors alarm on (JSD, unlike KL, never blows up on a missing
    language). Every p·ln(p/m) term rounds to 8dp and folds as DECIMAL;
    the caveat that languages ABSENT from a source contribute only the
    corpus half is inherent to the per-cell join formulation and shared
    by both engines. Everything past the first aggregate is
    dimension-sized."""
    d = load_table(spark, sf_dir, "documents")
    j = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    st = j.groupBy("source").agg(F.sum("c").cast("bigint").alias("ns"))
    lt = j.groupBy("lang").agg(F.sum("c").cast("bigint").alias("nl"))
    tot = j.agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("ns")
    q = F.col("nl").cast("double") / F.col("n")
    m = F.lit(0.5) * p + F.lit(0.5) * q
    term = F.round(
        F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m), 8
    ).cast("decimal(28,8)")
    return (
        j.join(st, "source")
        .join(lt, "lang")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("jsd"))
        .orderBy("source")
    )


# --- open-order aging bands --------------------------------------------------------------


@query(
    "orders_open_aging_bands",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS gmax FROM orders)
    SELECT CAST(date_diff('day', o_orderdate, gmax) // 180 AS INT)
             AS age_band_180d,
           CAST(COUNT(*) AS BIGINT) AS n_open,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS open_value
    FROM orders CROSS JOIN mx
    WHERE o_orderstatus = 'O'
    GROUP BY age_band_180d ORDER BY age_band_180d
    """,
    tags=("aging", "bands", "datetime", "census"),
)
def orders_open_aging_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging census of still-open orders in 180-day bands relative to the
    dataset horizon — the receivables-aging report shape. The status
    filter pushes to the scan; age is an exact integer day difference
    against one broadcast scalar; money folds as exact decimal."""
    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("gmax"))
    return (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(mx))
        .groupBy(
            F.floor(F.datediff(F.col("gmax"), F.col("o_orderdate")) / 180)
            .cast("int")
            .alias("age_band_180d")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_open"),
            F.sum(dec("o_totalprice")).cast("double").alias("open_value"),
        )
        .orderBy("age_band_180d")
    )


# --- fixed-point ECDF probes ----------------------------------------------------------------


@query(
    "lineitem_quantity_ecdf_points",
    oracle="""
    WITH pts(p) AS (VALUES (10), (20), (30), (40)),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
    SELECT p AS qty_point,
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE CAST(l_quantity AS BIGINT) <= p) AS BIGINT) AS n_leq,
           ROUND(CAST((SELECT COUNT(*) FROM lineitem
                 WHERE CAST(l_quantity AS BIGINT) <= p) AS DOUBLE)
                 / (SELECT n FROM t), 6) AS ecdf
    FROM pts ORDER BY qty_point
    """,
    tags=("stats", "ecdf", "probes", "census"),
)
def lineitem_quantity_ecdf_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical CDF probed at fixed quantity points (10/20/30/40) — the
    SLA-threshold evaluation shape ("what fraction of lines are ≤ 20
    units?"). One scan computes all four cumulative counts as
    conditional aggregates (no sort, no window — the ECDF at FIXED
    points needs neither); shares are one rounded division each."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    agg = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.count(F.when(q <= p, 1)).cast("bigint").alias(f"c{p}")
            for p in (10, 20, 30, 40)
        ],
    )
    pts = spark.createDataFrame(
        [(10,), (20,), (30,), (40,)], "qty_point INT"
    )
    wide = pts.crossJoin(F.broadcast(agg))
    n_leq = (
        F.when(F.col("qty_point") == 10, F.col("c10"))
        .when(F.col("qty_point") == 20, F.col("c20"))
        .when(F.col("qty_point") == 30, F.col("c30"))
        .otherwise(F.col("c40"))
    )
    return wide.select(
        "qty_point",
        n_leq.cast("bigint").alias("n_leq"),
        F.round(n_leq.cast("double") / F.col("n"), 6).alias("ecdf"),
    ).orderBy("qty_point")


# --- common-neighbor pairs on G6 ----------------------------------------------------------------


@query(
    "graph_common_neighbors_g6",
    oracle="""
    WITH e AS (
      SELECT src, dst FROM (VALUES
      (1,2),(2,1),(1,3),(3,1),(1,4),(4,1),(2,3),(3,2),(2,4),(4,2),
      (3,4),(4,3),(5,6),(6,5),(6,7),(7,6),(7,8),(8,7),(8,9),(9,8),
      (9,5),(5,9),(4,5),(5,4),(8,10),(10,8)) AS t(src, dst)
    ), cn AS (
      SELECT a.src AS u, b.src AS v, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY u, v
    )
    SELECT CAST(u AS BIGINT) AS u, CAST(v AS BIGINT) AS v, n_common
    FROM cn
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = cn.u AND e.dst = cn.v)
    ORDER BY n_common DESC, u, v
    """,
    tags=("graph", "link-prediction", "common-neighbors"),
)
def graph_common_neighbors_g6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor counts for NON-ADJACENT G6 vertex pairs — the
    baseline link-prediction score (the pair with the most shared
    neighbors is the most likely missing edge; here the clique's
    diagonal pairs are all present, so the cycle chords top the list).
    One wedge self-join + one anti-join against the edge set, all over
    the symmetrized fixture; the oracle replays the same joins on
    VALUES."""
    from distributed_graph_database_system_spark.queries.graph import (
        G6,
        _edges,
    )

    sym = G6 + [(b, a) for a, b in G6]
    e = _edges(spark, sym)
    a = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    b = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    cn = (
        a.join(b, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    adj = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    return (
        cn.join(adj, ["u", "v"], "left_anti")
        .select(
            F.col("u").cast("bigint").alias("u"),
            F.col("v").cast("bigint").alias("v"),
            "n_common",
        )
        .orderBy(F.desc("n_common"), "u", "v")
    )


# --- Tukey boxplot statistics ----------------------------------------------------------------------


@query(
    "customer_balance_boxplot_stats",
    oracle="""
    WITH c AS (
      SELECT c_mktsegment AS seg,
             CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM customer
    ), q AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS q1,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med,
             percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS q3
      FROM c GROUP BY seg
    )
    SELECT q.seg, q.n,
           CAST(q1 AS DOUBLE) / 100 AS q1_bal,
           CAST(med AS DOUBLE) / 100 AS median_bal,
           CAST(q3 AS DOUBLE) / 100 AS q3_bal,
           CAST((SELECT COUNT(*) FROM c
                 WHERE c.seg = q.seg
                   AND (c.cents < q1 - 3 * (q3 - q1) / 2
                        OR c.cents > q3 + 3 * (q3 - q1) / 2))
                AS BIGINT) AS n_outliers
    FROM q ORDER BY seg
    """,
    tags=("stats", "boxplot", "tukey", "percentile"),
)
def customer_balance_boxplot_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tukey boxplot statistics per market segment: quartiles plus the
    1.5×IQR-fence outlier count — the five-number summary every
    profiling pass draws. Balances are exact cents; the quartiles come
    from group_quantiles_disc (partition-bounded state — a per-segment
    builtin percentile_disc buffers |customer|/5 balances in one task);
    the fences use 3·IQR/2 in INTEGER arithmetic (no 1.5 float multiply,
    so the fence compare cannot shear at the boundary); the outlier
    count joins the 5-row quartile table back onto the scan."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        (dec("c_acctbal", 12, 2) * 100).cast("bigint").alias("cents"),
    )
    n = c.groupBy("seg").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    q = (
        group_quantiles_disc(c, "cents", [0.25, 0.5, 0.75], ["seg"])
        .withColumnRenamed(_qcolname(0.25), "q1f")
        .withColumnRenamed(_qcolname(0.5), "medf")
        .withColumnRenamed(_qcolname(0.75), "q3f")
        .select(
            "seg",
            F.col("q1f").cast("bigint").alias("q1"),
            F.col("medf").cast("bigint").alias("med"),
            F.col("q3f").cast("bigint").alias("q3"),
        )
        .join(n, "seg")
    )
    iqr32 = 3 * (F.col("q3") - F.col("q1")) / 2
    out = (
        c.join(F.broadcast(q), "seg")
        .where(
            (F.col("cents") < F.col("q1") - iqr32)
            | (F.col("cents") > F.col("q3") + iqr32)
        )
        .groupBy("seg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_outliers"))
    )
    return (
        q.join(out, "seg", "left")
        .select(
            "seg",
            "n",
            (F.col("q1").cast("double") / 100).alias("q1_bal"),
            (F.col("med").cast("double") / 100).alias("median_bal"),
            (F.col("q3").cast("double") / 100).alias("q3_bal"),
            F.coalesce("n_outliers", F.lit(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("seg")
    )


# --- md5-seeded Bernoulli sampling audit -----------------------------------------------------------


@query(
    "sample_md5_bernoulli_audit",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))
                  AS BIGINT) % 100 < 25 AS picked
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (picked) AS BIGINT) AS n_sampled,
           ROUND(CAST(COUNT(*) FILTER (picked) AS DOUBLE) / COUNT(*), 6)
             AS sample_rate
    FROM s GROUP BY source ORDER BY source
    """,
    tags=("llm", "pipeline", "sampling", "bernoulli", "md5"),
)
def sample_md5_bernoulli_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% Bernoulli sample audit per source: membership is
    a pure function of the id (md5 digits 9-16 — a DIFFERENT digest
    window than the 80/10/10 split in queries/pipeline.py, so the sample
    is INDEPENDENT of split membership and can never systematically
    favor train over test), and the audit reports realized rates per
    source. Exact counts, one rounded rate."""
    d = load_table(spark, sf_dir, "documents")
    picked = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10)
        .cast("bigint")
        % 100
        < 25
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(picked, 1)).cast("bigint").alias("n_sampled"),
            F.round(
                F.count(F.when(picked, 1)).cast("double") / F.count(F.lit(1)),
                6,
            ).alias("sample_rate"),
        )
        .orderBy("source")
    )
