"""Round-12 pool, batch C: embedding-space ML, time-series indicators,
distributional audits, and sequence/text censuses.

Embedding queries follow the quantize-to-integer-micro-units discipline
from embed_centroids (queries/pipeline.py): component sums and squared
distances fold as exact int64, so no float addition order can flip a
bit; divisions happen once per output value in one identical IEEE
sequence per engine. Distance comparisons that cross clusters of
different sizes divide the count-scaled integer distance back down as
ONE double division per candidate — equality across engines is exact
because the inputs are identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


def _q_units(spark: SparkSession, sf_dir: str, scale: int) -> DataFrame:
    """Long-form quantized embeddings: (vec_id, label, dim, q) with
    q = floor(component · 10^scale) as int64 — the exact-arithmetic
    representation shared by the k-means / silhouette queries below."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("v").cast("double") * F.lit(float(10**scale)))
        .cast("bigint")
        .alias("q"),
    )


_Q4_SQL = """
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT)
               AS q
      FROM embeddings
"""


# --- two Lloyd rounds of k-means --------------------------------------------


@query(
    "embed_kmeans_two_rounds",
    oracle=f"""
    WITH q6 AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS q
      FROM embeddings
    ), q4 AS ({_Q4_SQL}),
    c0 AS (SELECT vec_id AS cid, dim, q AS cq FROM q6 WHERE vec_id < 4),
    d1 AS (
      SELECT q6.vec_id, c0.cid,
             SUM((q6.q - c0.cq) * (q6.q - c0.cq)) AS dist
      FROM q6 JOIN c0 ON q6.dim = c0.dim
      GROUP BY q6.vec_id, c0.cid
    ), a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d1) WHERE rn = 1
    ), cnt1 AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS cnt FROM a1 GROUP BY cid
    ), c1 AS (
      SELECT a1.cid, q4.dim, CAST(SUM(q4.q) AS BIGINT) AS s
      FROM a1 JOIN q4 ON a1.vec_id = q4.vec_id
      GROUP BY a1.cid, q4.dim
    ), d2 AS (
      SELECT q4.vec_id, c1.cid,
             CAST(SUM((q4.q * cnt1.cnt - c1.s) * (q4.q * cnt1.cnt - c1.s))
                  AS DOUBLE)
               / (cnt1.cnt * cnt1.cnt) / 100000000.0 AS dist
      FROM q4 JOIN c1 ON q4.dim = c1.dim
      JOIN cnt1 ON c1.cid = cnt1.cid
      GROUP BY q4.vec_id, c1.cid, cnt1.cnt
    ), a2 AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM d2) WHERE rn = 1
    )
    SELECT a2.cid AS cluster,
           CAST(MIN(cnt1.cnt) AS BIGINT) AS n_round1,
           CAST(COUNT(*) AS BIGINT) AS n_round2,
           ROUND(CAST(SUM(CAST(ROUND(a2.dist, 6) AS DECIMAL(18,6)))
                      AS DOUBLE), 4) AS inertia_r2
    FROM a2 JOIN cnt1 ON a2.cid = cnt1.cid
    GROUP BY a2.cid ORDER BY cluster
    """,
    tags=("llm", "embedding", "kmeans", "iterative"),
)
def embed_kmeans_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k = 4, centroids seeded from the
    four smallest vec_ids) over the embedding corpus — the iterative-
    refinement pattern behind every IVF coarse quantizer
    (sim_topk_ann_ivf trains its quantizer the same way, on a sample).
    Round-1 distances are exact int64 in micro-units; round-2 centroids
    stay RATIONAL as (component-sum, count) pairs so the distance to a
    mean is the count-scaled integer Σ(q·cnt − s)² divided down ONCE —
    no per-dimension float accumulation anywhere. Assignment argmin
    tie-breaks on cluster id. Each round is one join + one aggregation:
    the 100 TB shape is broadcast-join against k·dims centroid rows,
    shuffle only on vec_id."""
    q6 = _q_units(spark, sf_dir, 6).drop("label")
    q4 = _q_units(spark, sf_dir, 4).drop("label")
    c0 = q6.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), "dim", F.col("q").alias("cq")
    )
    d1 = (
        q6.join(F.broadcast(c0), "dim")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("q") - F.col("cq")) * (F.col("q") - F.col("cq"))
            ).alias("dist")
        )
    )
    a1 = (
        d1.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy("dist", "cid")
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    cnt1 = a1.groupBy("cid").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    c1 = (
        a1.join(q4, "vec_id")
        .groupBy("cid", "dim")
        .agg(F.sum("q").cast("bigint").alias("s"))
    )
    cent = c1.join(cnt1, "cid")
    diff = F.col("q") * F.col("cnt") - F.col("s")
    d2 = (
        q4.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cid", "cnt")
        .agg(
            (
                F.sum(diff * diff).cast("double")
                / (F.col("cnt") * F.col("cnt"))
                / F.lit(100000000.0)
            ).alias("dist")
        )
    )
    a2 = (
        d2.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("vec_id").orderBy("dist", "cid")
            ),
        )
        .where(F.col("rn") == 1)
        .select("vec_id", "cid", "dist")
    )
    return (
        a2.join(cnt1, "cid")
        .groupBy(F.col("cid").alias("cluster"))
        .agg(
            F.min("cnt").cast("bigint").alias("n_round1"),
            F.count(F.lit(1)).cast("bigint").alias("n_round2"),
            F.round(
                F.sum(
                    F.round(F.col("dist"), 6).cast("decimal(18,6)")
                ).cast("double"),
                4,
            ).alias("inertia_r2"),
        )
        .orderBy("cluster")
    )


# --- simplified silhouette ---------------------------------------------------


@query(
    "embed_silhouette_simplified",
    oracle=f"""
    WITH q4 AS ({_Q4_SQL}),
    cnt AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM embeddings GROUP BY label
    ), cent AS (
      SELECT label, dim, CAST(SUM(q) AS BIGINT) AS s
      FROM q4 GROUP BY label, dim
    ), d AS (
      SELECT q4.vec_id, q4.label AS own, cent.label AS cand,
             CAST(SUM((q4.q * cnt.cnt - cent.s) * (q4.q * cnt.cnt - cent.s))
                  AS DOUBLE) / (cnt.cnt * cnt.cnt) / 100000000.0 AS dist
      FROM q4 JOIN cent ON q4.dim = cent.dim
      JOIN cnt ON cent.label = cnt.label
      GROUP BY q4.vec_id, q4.label, cent.label, cnt.cnt
    ), s AS (
      SELECT vec_id, own,
             MIN(CASE WHEN cand = own THEN dist END) AS a,
             MIN(CASE WHEN cand <> own THEN dist END) AS b
      FROM d GROUP BY vec_id, own
    )
    SELECT own AS label, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(ROUND((b - a) / GREATEST(a, b), 6)
                               AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 4) AS mean_silhouette,
           CAST(COUNT(*) FILTER (b < a) AS BIGINT) AS n_negative
    FROM s GROUP BY own ORDER BY label
    """,
    tags=("llm", "embedding", "silhouette", "clustering-quality"),
)
def embed_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based, squared-distance) silhouette of the
    given labels: a(i) = squared distance to the OWN label centroid,
    b(i) = min over other labels, s(i) = (b − a)/max(a, b) — the
    clustering-quality audit for a labeled embedding corpus (medoid
    silhouettes need all-pairs; the centroid form is the O(n·k) scale
    path, Kaufman & Rousseeuw's own recommendation for large n).
    Centroids stay rational (sum, count); the count-scaled integer
    distance device keeps every accumulation exact (see module
    docstring). n_negative counts probable mislabelings."""
    q4 = _q_units(spark, sf_dir, 4)
    cnt = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cent = q4.groupBy("label", "dim").agg(
        F.sum("q").cast("bigint").alias("s")
    )
    cand = cent.join(cnt, "label").select(
        F.col("label").alias("cand"), "dim", "s", "cnt"
    )
    diff = F.col("q") * F.col("cnt") - F.col("s")
    d = (
        q4.select("vec_id", F.col("label").alias("own"), "dim", "q")
        .join(F.broadcast(cand), "dim")
        .groupBy("vec_id", "own", "cand", "cnt")
        .agg(
            (
                F.sum(diff * diff).cast("double")
                / (F.col("cnt") * F.col("cnt"))
                / F.lit(100000000.0)
            ).alias("dist")
        )
    )
    s = d.groupBy("vec_id", "own").agg(
        F.min(F.when(F.col("cand") == F.col("own"), F.col("dist"))).alias(
            "a"
        ),
        F.min(F.when(F.col("cand") != F.col("own"), F.col("dist"))).alias(
            "b"
        ),
    )
    sil = F.round(
        (F.col("b") - F.col("a")) / F.greatest("a", "b"), 6
    ).cast("decimal(18,6)")
    return (
        s.groupBy(F.col("own").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.sum(sil).cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_silhouette"),
            F.count(F.when(F.col("b") < F.col("a"), 1))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("label")
    )


# --- int8 quantization error census -----------------------------------------


@query(
    "embed_quantize_int8_error",
    oracle="""
    WITH comp0 AS (
      SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings
    ), comp AS (
      SELECT vec_id, label, v,
             MAX(ABS(v)) OVER (PARTITION BY vec_id) AS m
      FROM comp0
    ), err AS (
      SELECT vec_id, label, m,
             v - CAST(ROUND(v / m * 127, 0) AS BIGINT) * m / 127.0 AS e
      FROM comp
    )
    SELECT label,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(CAST(ROUND(e * e * 1000000, 6) AS DECIMAL(18,6)))
                      AS DOUBLE) / COUNT(*), 4) AS mse_micro,
           ROUND(MAX(ABS(e)), 8) AS max_abs_err,
           ROUND(CAST(SUM(CAST(ROUND(m, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_scale
    FROM err GROUP BY label ORDER BY label
    """,
    tags=("llm", "embedding", "quantization", "int8"),
)
def embed_quantize_int8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconstruction-error census for symmetric per-vector int8
    quantization (q = round(v/max|v|·127)) — the audit run before
    shipping a quantized ANN index (sim_topk_ann_persisted stores int8
    exactly this way): per-label MSE in micro-units, worst-case
    component error, and mean scale. Per-component errors are identical
    single-expression doubles on both engines; the cross-row folds use
    the round-6 decimal-term device so partitioning can't reorder a
    float sum."""
    e = load_table(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id", "label", F.explode("embedding").alias("vf")
    ).select(
        "vec_id",
        "label",
        F.col("vf").cast("double").alias("v"),
        F.max(F.abs(F.col("vf").cast("double")))
        .over(W.partitionBy("vec_id"))
        .alias("m"),
    )
    err = comp.select(
        "vec_id",
        "label",
        "m",
        (
            F.col("v")
            - F.round(F.col("v") / F.col("m") * 127, 0).cast("bigint")
            * F.col("m")
            / F.lit(127.0)
        ).alias("e"),
    )
    return (
        err.groupBy("label")
        .agg(
            F.countDistinct("vec_id").cast("bigint").alias("n_vecs"),
            F.round(
                F.sum(
                    F.round(
                        F.col("e") * F.col("e") * F.lit(1000000.0), 6
                    ).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("mse_micro"),
            F.round(F.max(F.abs("e")), 8).alias("max_abs_err"),
            F.round(
                F.sum(F.round("m", 6).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_scale"),
        )
        .orderBy("label")
    )


# --- trimmed / winsorized robust means ---------------------------------------


@query(
    "supplier_acctbal_trimmed_stats",
    oracle="""
    WITH ranked AS (
      SELECT CAST(s_acctbal AS DECIMAL(18,2)) AS bal,
             ROW_NUMBER() OVER (ORDER BY s_acctbal, s_suppkey) AS rn,
             COUNT(*) OVER () AS n
      FROM supplier
    ), k AS (SELECT MAX(n) AS n, MAX(n) // 10 AS k FROM ranked),
    caps AS (
      SELECT MIN(CASE WHEN rn = k.k + 1 THEN bal END) AS lo_cap,
             MIN(CASE WHEN rn = k.n - k.k THEN bal END) AS hi_cap
      FROM ranked CROSS JOIN k
    )
    SELECT CAST(MAX(k.n) AS BIGINT) AS n,
           CAST(MAX(k.k) AS BIGINT) AS k_trim,
           CAST(SUM(bal) AS DOUBLE) / MAX(k.n) AS mean_raw,
           CAST(SUM(CASE WHEN rn > k.k AND rn <= k.n - k.k THEN bal END)
                AS DOUBLE) / (MAX(k.n) - 2 * MAX(k.k)) AS mean_trimmed,
           CAST(SUM(CASE WHEN rn <= k.k THEN caps.lo_cap
                         WHEN rn > k.n - k.k THEN caps.hi_cap
                         ELSE bal END) AS DOUBLE) / MAX(k.n)
             AS mean_winsorized
    FROM ranked CROSS JOIN k CROSS JOIN caps
    """,
    tags=("stats", "robust", "trimmed-mean", "winsorize"),
)
def supplier_acctbal_trimmed_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """10% trimmed and winsorized means of supplier account balance next
    to the raw mean — the robust-location summary that survives the
    heavy negative tail. The oracle defines the trim by ROW_NUMBER over
    (balance, suppkey); the Spark side never ranks rows at all — a
    trimmed SUM only depends on the VALUES dropped, never on which
    tied row dropped, so it folds the balance HISTOGRAM through the
    distributed two-pass prefix sum (operators/prefix.py, the Kruskal-
    Wallis rewrite): cum(v) = rows ≤ v gives the caps as threshold
    scans (lo_cap = min v with cum ≥ k+1, hi_cap = min v with
    cum ≥ n−k) and the bottom/top-k mass as per-value clamped overlaps
    greatest(0, least(cnt, k − (cum − cnt))) — no single-task global
    window anywhere (the r11 verdict's remaining scale cliff). All
    three means stay exact decimal sums divided once. Completes the
    robust family: MAD screen (events_mad_outliers), Tukey fences
    (events_iqr_tukey_fences), and bounded-influence location."""
    from distributed_graph_database_system_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    s = load_table(spark, sf_dir, "supplier")
    hist = s.groupBy(dec("s_acctbal").alias("bal")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    # localCheckpoint: the ranked histogram feeds the totals, the caps,
    # and the final aggregate — pin one partition placement for all three.
    cum = partitioned_prefix_sum(hist, ["bal"], "cnt", "cum").localCheckpoint()
    tot = cum.agg(
        F.max("cum").cast("bigint").alias("n"),
        F.sum(F.col("bal") * F.col("cnt")).alias("tsum"),
    ).select(
        "n", "tsum", F.floor(F.col("n") / 10).cast("bigint").alias("k")
    )
    j = cum.crossJoin(F.broadcast(tot))
    caps = j.agg(
        F.min(
            F.when(F.col("cum") >= F.col("k") + 1, F.col("bal"))
        ).alias("lo_cap"),
        F.min(
            F.when(F.col("cum") >= F.col("n") - F.col("k"), F.col("bal"))
        ).alias("hi_cap"),
    )
    zero = F.lit(0).cast("bigint")
    low_take = F.greatest(
        zero, F.least(F.col("cnt"), F.col("k") - (F.col("cum") - F.col("cnt")))
    )
    high_take = F.greatest(
        zero, F.least(F.col("cnt"), F.col("cum") - (F.col("n") - F.col("k")))
    )
    trimmed = (
        F.max("tsum")
        - F.sum(F.col("bal") * low_take)
        - F.sum(F.col("bal") * high_take)
    )
    return j.crossJoin(F.broadcast(caps)).agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("k").cast("bigint").alias("k_trim"),
        (F.max("tsum").cast("double") / F.max("n")).alias("mean_raw"),
        (
            trimmed.cast("double") / (F.max("n") - 2 * F.max("k"))
        ).alias("mean_trimmed"),
        (
            (
                trimmed
                + F.max("k") * F.max("lo_cap")
                + F.max("k") * F.max("hi_cap")
            ).cast("double")
            / F.max("n")
        ).alias("mean_winsorized"),
    )


# --- year-over-year rank volatility (footrule) --------------------------------


@query(
    "nation_rank_footrule_yoy",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation,
             EXTRACT(year FROM o.o_orderdate) AS yr,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE EXTRACT(year FROM o.o_orderdate) IN (1995, 1996)
      GROUP BY nation, yr
    ), r AS (
      SELECT nation,
             MAX(CASE WHEN yr = 1995 THEN rev END) AS rev95,
             MAX(CASE WHEN yr = 1996 THEN rev END) AS rev96
      FROM rev GROUP BY nation
    )
    SELECT nation,
           CAST(RANK() OVER (ORDER BY rev95 DESC, nation) AS INT) AS rank95,
           CAST(RANK() OVER (ORDER BY rev96 DESC, nation) AS INT) AS rank96,
           CAST(ABS(RANK() OVER (ORDER BY rev95 DESC, nation)
                    - RANK() OVER (ORDER BY rev96 DESC, nation))
                AS INT) AS shift
    FROM r ORDER BY nation
    """,
    tags=("window", "rank", "footrule", "volatility"),
)
def nation_rank_footrule_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue-rank shift per nation (1995 vs 1996) —
    Spearman's footrule displacement per item, the leaderboard-churn
    audit. Revenue folds as exact decimals so both years' rankings are
    deterministic; ties break on nation name. The star join leaves the
    SF-growing customer dim to AQE and broadcasts only the 25-row nation; the two
    rankings come from ONE 25-row aggregate, so the window sort is
    constant regardless of fact size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yr = F.year("o_orderdate")
    rev = (
        o.where(yr.isin(1995, 1996))
        .join(c, o.o_custkey == c.c_custkey)  # customer grows with SF: AQE decides
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), yr.alias("yr"))
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
    )
    r = rev.groupBy("nation").agg(
        F.max(F.when(F.col("yr") == 1995, F.col("rev"))).alias("rev95"),
        F.max(F.when(F.col("yr") == 1996, F.col("rev"))).alias("rev96"),
    )
    w95 = W.orderBy(F.desc("rev95"), "nation")
    w96 = W.orderBy(F.desc("rev96"), "nation")
    return r.select(
        "nation",
        F.rank().over(w95).cast("int").alias("rank95"),
        F.rank().over(w96).cast("int").alias("rank96"),
        F.abs(F.rank().over(w95) - F.rank().over(w96))
        .cast("int")
        .alias("shift"),
    ).orderBy("nation")


# --- Lorenz curve -------------------------------------------------------------


@query(
    "customer_revenue_lorenz_curve",
    oracle="""
    WITH cust AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey
    ), dec_t AS (
      SELECT NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile, rev
      FROM cust
    ), g AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
             SUM(rev) AS drev
      FROM dec_t GROUP BY decile
    ), tot AS (SELECT SUM(drev) AS t FROM g)
    SELECT decile, n_customers,
           ROUND(CAST(SUM(drev) OVER (ORDER BY decile
                                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST((SELECT t FROM tot) AS DOUBLE), 6)
             AS cum_revenue_share
    FROM g ORDER BY decile
    """,
    tags=("stats", "lorenz", "inequality", "ntile"),
)
def customer_revenue_lorenz_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Lorenz curve of customer revenue concentration: decile d's
    cumulative share of total revenue — the curve whose area doubles
    into the Gini that supplier_revenue_gini reports as a scalar, and
    whose decomposable sibling is supplier_nation_theil_index. The
    oracle says NTILE(10) over (revenue, custkey); the Spark side
    reproduces NTILE's bucket arithmetic WITHOUT ranking customers:
    standard NTILE gives ranks (b_{d−1}, b_d] to decile d where
    b_d = d·⌊n/10⌋ + min(d, n mod 10), and a tie group of equal revenue
    contributes the same decile sums however its members split — so the
    per-customer-revenue HISTOGRAM through the distributed prefix sum
    (operators/prefix.py) plus a broadcast 10-row decile table and a
    clamped interval overlap min(cum, b_d) − max(cum − cnt, b_{d−1})
    yields the identical ten rows with no single-task global window
    (the r11 verdict's remaining scale cliff). Per-decile revenue and
    the cumulative numerator stay exact decimal, so the ten shares are
    ten identical IEEE divisions."""
    from distributed_graph_database_system_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )
    hist = cust.groupBy("rev").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    cum = partitioned_prefix_sum(hist, ["rev"], "cnt", "cum").localCheckpoint()
    tot = cum.agg(
        F.max("cum").cast("bigint").alias("n"),
        F.sum(F.col("rev") * F.col("cnt")).alias("t"),
    )
    deciles = (
        spark.range(1, 11).select(F.col("id").cast("int").alias("decile"))
    )
    base = F.floor(F.col("n") / 10)
    m = F.col("n") % 10
    b_d = F.col("decile") * base + F.least(F.col("decile").cast("bigint"), m)
    b_prev = (F.col("decile") - 1) * base + F.least(
        (F.col("decile") - 1).cast("bigint"), m
    )
    overlap = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("cum"), b_d)
        - F.greatest(F.col("cum") - F.col("cnt"), b_prev),
    )
    g = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(deciles))
        .where(overlap > 0)
        .groupBy("decile")
        .agg(
            F.sum(overlap).cast("bigint").alias("n_customers"),
            F.sum(F.col("rev") * overlap).alias("drev"),
            F.max("t").alias("t"),
        )
    )
    # the cumulative pass is over exactly 10 decile rows — constant
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, W.currentRow)
    return g.select(
        "decile",
        "n_customers",
        F.round(
            F.sum("drev").over(wc).cast("double") / F.col("t").cast("double"),
            6,
        ).alias("cum_revenue_share"),
    ).orderBy("decile")


# --- cents-digit uniformity (price psychology screen) -------------------------


@query(
    "orders_cents_digit_uniformity",
    oracle="""
    WITH cents AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) % 100
               AS cc
      FROM orders
    ), cell AS (
      SELECT cc, CAST(COUNT(*) AS BIGINT) AS o FROM cents GROUP BY cc
    ), tot AS (
      SELECT SUM(o) AS n, COUNT(*) AS k,
             CAST(SUM(o) AS DOUBLE) / 100.0 AS e
      FROM cell
    )
    SELECT CAST(MAX(tot.n) AS BIGINT) AS n,
           CAST(MAX(tot.k) AS BIGINT) AS k_present,
           CAST(MIN(cell.o) AS BIGINT) AS min_cell,
           CAST(MAX(cell.o) AS BIGINT) AS max_cell,
           ROUND(CAST(SUM(CAST(ROUND((cell.o - tot.e) * (cell.o - tot.e)
                                     / tot.e, 6) AS DECIMAL(18,6)))
                      AS DOUBLE)
                 + (100 - MAX(tot.k)) * ROUND(MAX(tot.e), 6), 4) AS chi2
    FROM cell CROSS JOIN tot
    """,
    tags=("stats", "chi-squared", "uniformity", "data-quality"),
)
def orders_cents_digit_uniformity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-squared uniformity screen on the CENTS digits of order
    prices — the fraud/synthetic-data tell (real pricing clusters on
    .00/.99; uniform cents suggest generated amounts; the leading-digit
    sibling is orders_benford_screen). The cents extraction is exact
    decimal→int arithmetic; χ² terms use the round-6 decimal device,
    and absent cells contribute their expected mass through the
    (100 − k)·e correction so the statistic is the true 100-cell one at
    any scale factor."""
    o = load_table(spark, sf_dir, "orders")
    cents = o.select(
        ((dec("o_totalprice") * 100).cast("bigint") % 100).alias("cc")
    )
    cell = cents.groupBy("cc").agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    tot = cell.agg(
        F.sum("o").alias("n"),
        F.count(F.lit(1)).alias("k"),
        (F.sum("o").cast("double") / F.lit(100.0)).alias("e"),
    )
    dev = F.col("o") - F.col("e")
    return cell.crossJoin(F.broadcast(tot)).agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("k").cast("bigint").alias("k_present"),
        F.min("o").cast("bigint").alias("min_cell"),
        F.max("o").cast("bigint").alias("max_cell"),
        F.round(
            F.sum(
                F.round(dev * dev / F.col("e"), 6).cast("decimal(18,6)")
            ).cast("double")
            + (F.lit(100) - F.max("k")) * F.round(F.max("e"), 6),
            4,
        ).alias("chi2"),
    )


# --- hapax legomena ratio ------------------------------------------------------


@query(
    "text_hapax_ratio_by_source",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ), wc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok WHERE w <> '' GROUP BY source, w
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(COUNT(*) FILTER (c = 1) AS BIGINT) AS hapax,
           ROUND(CAST(COUNT(*) FILTER (c = 1) AS DOUBLE) / COUNT(*), 6)
             AS hapax_ratio
    FROM wc GROUP BY source ORDER BY source
    """,
    tags=("llm", "text", "vocabulary", "hapax"),
)
def text_hapax_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena ratio per corpus source: the fraction of the
    vocabulary occurring exactly once — the Zipf-tail weight that
    text_lexical_diversity's type-token ratio doesn't see (TTR measures
    breadth; hapax measures how much of that breadth is singleton
    noise, the quantity that drives tokenizer OOV rates). One
    explode → two nested exact-count aggregations; the word-count
    reduction keys on (source, word) so the shuffle is the vocabulary,
    not the token stream."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    wc = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        wc.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.count(F.when(F.col("c") == 1, 1)).cast("bigint").alias("hapax"),
            F.round(
                F.count(F.when(F.col("c") == 1, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("hapax_ratio"),
        )
        .orderBy("source")
    )


# --- run-length census ---------------------------------------------------------


@query(
    "events_type_run_length_census",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
      FROM events
    ), runs AS (
      SELECT user_id, event_type, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM seq GROUP BY user_id, event_type, grp
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(len) AS BIGINT) AS max_run,
           ROUND(CAST(SUM(len) AS DOUBLE) / COUNT(*), 6) AS avg_run
    FROM runs GROUP BY event_type ORDER BY event_type
    """,
    tags=("window", "gaps-and-islands", "run-length", "sequence"),
)
def events_type_run_length_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Run-length encoding census of per-user event-type streaks: the
    gaps-and-islands double-ROW_NUMBER difference groups maximal runs
    of the same consecutive type, then one aggregation reports run
    count, longest run, and mean length per type — the repetition
    profile of behavioral streams (a high error max_run is a stuck
    client; the calendar-day sibling is customer_order_streaks). All
    windows partition by user, so the sort parallelizes per user and
    every statistic is an exact integer."""
    e = load_table(spark, sf_dir, "events")
    wa = W.partitionBy("user_id").orderBy("ts", "event_id")
    wt = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(wa) - F.row_number().over(wt)).alias("grp"),
    )
    runs = seq.groupBy("user_id", "event_type", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
            F.max("len").cast("bigint").alias("max_run"),
            F.round(
                F.sum("len").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_run"),
        )
        .orderBy("event_type")
    )


# --- rolling median ------------------------------------------------------------


@query(
    "events_rolling_median7",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM events GROUP BY day
    ), w AS (
      SELECT day, rev,
             list_sort(list(rev) OVER (ORDER BY day
                                       ROWS 6 PRECEDING)) AS arr
      FROM daily
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(rev AS DOUBLE) AS rev,
           CAST(arr[(len(arr) + 1) // 2] AS DOUBLE) AS med7,
           CAST(len(arr) AS INT) AS w_size
    FROM w ORDER BY day
    """,
    tags=("window", "rolling-median", "robust", "time-series"),
)
def events_rolling_median7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling LOWER MEDIAN of daily revenue — the robust rolling
    center that window_running's rolling mean family lacks (one spike
    day moves the mean for a week; the median shrugs). The window
    collects ≤7 exact decimals, sorts, and indexes the lower middle —
    an order statistic, no interpolation, so the result is an actual
    daily value and cross-engine float drift is impossible. Collect-
    sort-index over a bounded frame is the honest distributed rolling
    median; streaming twins would keep a 7-slot state
    (applyInPandasWithState)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(dec("value")).cast("decimal(18,2)").alias("rev")
    )
    w7 = W.orderBy("day").rowsBetween(-6, W.currentRow)
    w = daily.select(
        "day",
        "rev",
        F.sort_array(F.collect_list("rev").over(w7)).alias("arr"),
    )
    mid = F.floor((F.size("arr") + 1) / 2).cast("int")
    return w.select(
        F.col("day").cast("timestamp").alias("day"),
        F.col("rev").cast("double").alias("rev"),
        F.element_at("arr", mid).cast("double").alias("med7"),
        F.size("arr").cast("int").alias("w_size"),
    ).orderBy("day")


# --- Bollinger bands -----------------------------------------------------------


@query(
    "events_bollinger_breakout",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM events GROUP BY day
    ), w AS (
      SELECT day, rev,
             SUM(rev) OVER w7 AS s,
             SUM(CAST(rev AS DECIMAL(19,2))
                 * CAST(rev AS DECIMAL(19,2))) OVER w7 AS ssq,
             COUNT(*) OVER w7 AS wn
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS 6 PRECEDING)
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(rev AS DOUBLE) AS rev,
           ROUND(CAST(s AS DOUBLE) / 7.0, 6) AS mid,
           ROUND(CAST(s AS DOUBLE) / 7.0
                 + 2.0 * SQRT((CAST(ssq AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 7.0)
                              / 6.0), 6) AS upper_band,
           ROUND(CAST(s AS DOUBLE) / 7.0
                 - 2.0 * SQRT((CAST(ssq AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 7.0)
                              / 6.0), 6) AS lower_band,
           CAST(CASE WHEN CAST(rev AS DOUBLE) > CAST(s AS DOUBLE) / 7.0
                          + 2.0 * SQRT((CAST(ssq AS DOUBLE)
                                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                          / 7.0) / 6.0) THEN 1
                     WHEN CAST(rev AS DOUBLE) < CAST(s AS DOUBLE) / 7.0
                          - 2.0 * SQRT((CAST(ssq AS DOUBLE)
                                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                          / 7.0) / 6.0) THEN -1
                     ELSE 0 END AS INT) AS breakout
    FROM w WHERE wn = 7 ORDER BY day
    """,
    tags=("window", "bollinger", "time-series", "anomaly"),
)
def events_bollinger_breakout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (7-day rolling mean ± 2σ) over daily revenue with
    a breakout flag — the fixed-window counterpart of the EWMA anomaly
    bands (events_anomaly_ewma). The window carries exact decimal
    Σx and Σx² (the sum-of-squares decimal stays exact: 2dp × 2dp =
    4dp), so mean and sample variance come out of ONE identical IEEE
    expression per engine; only full windows emit. Daily aggregation
    first means the windowed pass is over days, not events."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(dec("value")).cast("decimal(18,2)").alias("rev")
    )
    w7 = W.orderBy("day").rowsBetween(-6, W.currentRow)
    w = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w7).alias("s"),
        F.sum(F.col("rev") * F.col("rev")).over(w7).alias("ssq"),
        F.count(F.lit(1)).over(w7).alias("wn"),
    ).where(F.col("wn") == 7)
    mid = F.col("s").cast("double") / F.lit(7.0)
    std = F.sqrt(
        (
            F.col("ssq").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double") / F.lit(7.0)
        )
        / F.lit(6.0)
    )
    upper = mid + F.lit(2.0) * std
    lower = mid - F.lit(2.0) * std
    rev_d = F.col("rev").cast("double")
    return w.select(
        F.col("day").cast("timestamp").alias("day"),
        rev_d.alias("rev"),
        F.round(mid, 6).alias("mid"),
        F.round(upper, 6).alias("upper_band"),
        F.round(lower, 6).alias("lower_band"),
        F.when(rev_d > upper, 1)
        .when(rev_d < lower, -1)
        .otherwise(0)
        .cast("int")
        .alias("breakout"),
    ).orderBy("day")


# --- RSI (simple moving average form) ------------------------------------------


@query(
    "events_rsi14_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM events GROUP BY day
    ), d AS (
      SELECT day, rev,
             rev - LAG(rev) OVER (ORDER BY day) AS chg
      FROM daily
    ), gl AS (
      -- CASE, not GREATEST: DuckDB's GREATEST promotes decimal args to
      -- DOUBLE, which would float-drift the windowed sums.
      SELECT day,
             CASE WHEN chg > 0 THEN chg
                  ELSE CAST(0 AS DECIMAL(19,2)) END AS gain,
             CASE WHEN chg < 0 THEN -chg
                  ELSE CAST(0 AS DECIMAL(19,2)) END AS loss,
             ROW_NUMBER() OVER (ORDER BY day) AS rn
      FROM d WHERE chg IS NOT NULL
    ), w AS (
      SELECT day, rn,
             SUM(gain) OVER w14 AS g, SUM(loss) OVER w14 AS l
      FROM gl WINDOW w14 AS (ORDER BY day ROWS 13 PRECEDING)
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(g AS DOUBLE) AS gain14, CAST(l AS DOUBLE) AS loss14,
           CASE WHEN l = 0 THEN 100.0
                ELSE ROUND(100.0 - 100.0 / (1.0 + CAST(g AS DOUBLE)
                                                  / CAST(l AS DOUBLE)), 6)
           END AS rsi14
    FROM w WHERE rn >= 14 ORDER BY day
    """,
    tags=("window", "rsi", "time-series", "indicator"),
)
def events_rsi14_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day RSI (simple-moving-average Cutler form — closed-form over
    a bounded window, unlike Wilder's recursive smoothing which is not
    window-expressible) on daily revenue: momentum = average gain vs
    average loss of day-over-day exact-decimal changes. Gains/losses
    clamp in decimal, the 14-day sums stay decimal, and the RSI is two
    IEEE ops; the loss=0 saturation pins RSI to 100 exactly. Completes
    the indicator family next to EWMA/Brown smoothing and Bollinger."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(dec("value")).cast("decimal(18,2)").alias("rev")
    )
    d = daily.select(
        "day",
        (F.col("rev") - F.lag("rev").over(W.orderBy("day"))).alias("chg"),
    ).where(F.col("chg").isNotNull())
    zero = F.lit(0).cast("decimal(19,2)")
    gl = d.select(
        "day",
        F.when(F.col("chg") > 0, F.col("chg")).otherwise(zero).alias("gain"),
        F.when(F.col("chg") < 0, -F.col("chg")).otherwise(zero).alias("loss"),
        F.row_number().over(W.orderBy("day")).alias("rn"),
    )
    w14 = W.orderBy("day").rowsBetween(-13, W.currentRow)
    w = gl.select(
        "day",
        "rn",
        F.sum("gain").over(w14).alias("g"),
        F.sum("loss").over(w14).alias("l"),
    ).where(F.col("rn") >= 14)
    g_d, l_d = F.col("g").cast("double"), F.col("l").cast("double")
    return w.select(
        F.col("day").cast("timestamp").alias("day"),
        g_d.alias("gain14"),
        l_d.alias("loss14"),
        F.when(F.col("l") == 0, F.lit(100.0))
        .otherwise(
            F.round(
                F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + g_d / l_d), 6
            )
        )
        .alias("rsi14"),
    ).orderBy("day")
