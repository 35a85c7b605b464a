"""Round-12 pool, batch D: concentration/variance analytics, robust
location estimators, centroid geometry, vocabulary entropy, and the
Jaccard threshold sweep. Same determinism discipline as seeds_r12.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- Gini of activity counts (exact integer form) ----------------------------


@query(
    "events_activity_gini",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    ), r AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS i
      FROM u
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cnt) AS BIGINT) AS s0,
             CAST(SUM(i * cnt) AS BIGINT) AS s1
      FROM r
    )
    SELECT n AS n_users, s0 AS n_events,
           ROUND(2.0 * s1 / (CAST(n AS DOUBLE) * s0)
                 - (n + 1.0) / n, 6) AS gini
    FROM s
    """,
    tags=("stats", "gini", "inequality", "exact-integer"),
)
def events_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event-count concentration via the
    exact rank formula G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n over counts sorted
    ascending — every accumulation is int64 (counts × ranks), so the
    coefficient is two IEEE divisions at the end; swapping tied counts
    can't change Σi·xᵢ, making any total order equivalent (ours is
    (cnt, user_id)). The integer twin of the decimal-revenue Gini
    (supplier_revenue_gini) — activity inequality instead of money."""
    from distributed_graph_database_system_spark.operators.prefix import (
        partitioned_prefix_sum,
    )

    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # Σi·xᵢ through the count HISTOGRAM: a tie group of t users at count c
    # whose predecessors total C contributes c·(t·C + t(t+1)/2) — exact
    # int64, computed from a distributed prefix over DISTINCT counts (the
    # Kruskal-Wallis device; no row-level global window, and tied users
    # are interchangeable so the user_id tie-break order is irrelevant by
    # construction rather than by argument).
    hist = u.groupBy("cnt").agg(F.count(F.lit(1)).alias("t"))
    cum = partitioned_prefix_sum(hist, ["cnt"], "t", "cum")
    t, c = F.col("t"), F.col("cnt")
    cbefore = F.col("cum") - t
    # t(t+1)/2 via shiftright: t(t+1) is always even, and the shift keeps
    # the arithmetic in int64 (Spark's `/` would promote to DOUBLE).
    tri = F.shiftright(t * (t + 1), 1)
    s = cum.agg(
        F.sum(t).cast("bigint").alias("n"),
        F.sum(c * t).cast("bigint").alias("s0"),
        F.sum(c * (t * cbefore + tri)).cast("bigint").alias("s1"),
    )
    n, s0, s1 = F.col("n"), F.col("s0"), F.col("s1")
    return s.select(
        n.alias("n_users"),
        s0.alias("n_events"),
        F.round(
            F.lit(2.0) * s1 / (n.cast("double") * s0)
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


# --- one-way ANOVA F ----------------------------------------------------------


@query(
    "orders_weekday_anova_f",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             dayofweek(CAST(o_orderdate AS DATE)) AS dow,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS rev
      FROM orders GROUP BY day, dow
    ), g AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_g,
             SUM(rev) AS s_g,
             SUM(CAST(rev AS DECIMAL(19,2))
                 * CAST(rev AS DECIMAL(19,2))) AS q_g
      FROM daily GROUP BY dow
    ), terms AS (
      -- all variance terms in revenue-MILLIONS (divide sums by 1e6/1e12
      -- before any float op): at raw scale s_g^2 ~ 1e17 and ROUND(x, 6)
      -- on such doubles is implementation-defined noise across engines.
      SELECT n_g, s_g,
             CAST(ROUND((CAST(s_g AS DOUBLE) / 1000000.0)
                        * (CAST(s_g AS DOUBLE) / 1000000.0) / n_g, 6)
                  AS DECIMAL(28,6)) AS sg2n,
             CAST(ROUND(CAST(q_g AS DOUBLE) / 1000000000000.0
                        - (CAST(s_g AS DOUBLE) / 1000000.0)
                          * (CAST(s_g AS DOUBLE) / 1000000.0) / n_g, 6)
                  AS DECIMAL(28,6)) AS ssw_g
      FROM g
    ), tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(s_g) AS DOUBLE) / 1000000.0 AS s,
             CAST(SUM(sg2n) AS DOUBLE) AS sg2n,
             CAST(SUM(ssw_g) AS DOUBLE) AS ssw
      FROM terms
    )
    SELECT n AS n_days, k AS k_groups,
           ROUND(sg2n - s * s / n, 4) AS ssb_m2,
           ROUND(ssw, 4) AS ssw_m2,
           ROUND(((sg2n - s * s / n) / (k - 1)) / (ssw / (n - k)), 6)
             AS f_stat
    FROM tot
    """,
    tags=("stats", "anova", "variance", "calendar"),
)
def orders_weekday_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic: does MEAN daily revenue differ by
    weekday? The parametric counterpart of the rank-based Kruskal-Wallis
    (orders_kruskal_wallis_priority) — same question, variance
    decomposition instead of ranks. Per-group Σx and Σx² fold as exact
    decimals off the daily aggregate; the seven between/within terms use
    the round-6 decimal device, and F is assembled in one identical IEEE
    sequence. DuckDB's dayofweek is 0=Sunday vs Spark's 1=Sunday — the
    Spark side subtracts 1 (the events_chisq_type_dow convention)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("rev"))
    g = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("rev").alias("s_g"),
        F.sum(F.col("rev") * F.col("rev")).alias("q_g"),
    )
    s_gd = F.col("s_g").cast("double") / F.lit(1000000.0)
    terms = g.select(
        "n_g",
        "s_g",
        F.round(s_gd * s_gd / F.col("n_g"), 6)
        .cast("decimal(28,6)")
        .alias("sg2n"),
        F.round(
            F.col("q_g").cast("double") / F.lit(1000000000000.0)
            - s_gd * s_gd / F.col("n_g"),
            6,
        )
        .cast("decimal(28,6)")
        .alias("ssw_g"),
    )
    tot = terms.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (F.sum("s_g").cast("double") / F.lit(1000000.0)).alias("s"),
        F.sum("sg2n").cast("double").alias("sg2n"),
        F.sum("ssw_g").cast("double").alias("ssw"),
    )
    n, k, s = F.col("n"), F.col("k"), F.col("s")
    ssb = F.col("sg2n") - s * s / n
    return tot.select(
        n.alias("n_days"),
        k.alias("k_groups"),
        F.round(ssb, 4).alias("ssb_m2"),
        F.round(F.col("ssw"), 4).alias("ssw_m2"),
        F.round((ssb / (k - 1)) / (F.col("ssw") / (n - k)), 6).alias(
            "f_stat"
        ),
    )


# --- Hodges-Lehmann estimator ---------------------------------------------------


@query(
    "events_hodges_lehmann_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
      FROM events GROUP BY day
    ), walsh AS (
      SELECT (a.rev + b.rev) * CAST(0.5 AS DECIMAL(2,1)) AS w
      FROM daily a JOIN daily b ON a.day <= b.day
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_walsh,
           CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY w) AS DOUBLE)
             AS hl_estimate
    FROM walsh
    """,
    tags=("stats", "hodges-lehmann", "robust", "location"),
)
def events_hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimate of daily revenue: the median of
    all Walsh averages (xᵢ+xⱼ)/2 over day pairs i ≤ j — the estimator
    the Wilcoxon test inverts, ~29% breakdown with near-parametric
    efficiency; Theil-Sen's location sibling (orders_theil_sen_daily is
    its slope). Walsh averages are exact decimals (×0.5 is a decimal
    multiply), the median a PERCENTILE_DISC order statistic, and the
    O(days²) enumeration runs on the daily AGGREGATE, so pair volume is
    independent of event count."""
    e = load_table(spark, sf_dir, "events")
    # localCheckpoint: both Walsh-join sides + the n_days scalar reuse the
    # 30-row daily aggregate instead of re-scanning events three times.
    daily = (
        e.groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(dec("value")).cast("decimal(18,2)").alias("rev"))
        .localCheckpoint()
    )
    a, b = daily.alias("a"), daily.alias("b")
    walsh = a.join(b, F.col("a.day") <= F.col("b.day")).select(
        (
            (F.col("a.rev") + F.col("b.rev"))
            * F.lit(0.5).cast("decimal(2,1)")
        ).alias("w")
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return walsh.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_walsh"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY w)")
        .cast("double")
        .alias("hl_estimate"),
    ).crossJoin(F.broadcast(n_days)).select(
        "n_days", "n_walsh", "hl_estimate"
    )


# --- centroid distance matrix ---------------------------------------------------


@query(
    "embed_centroid_distance_matrix",
    oracle="""
    WITH q4 AS (
      SELECT label, generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT)
               AS q
      FROM embeddings
    ), cent AS (
      SELECT label, dim,
             CAST(FLOOR(1000000.0 * CAST(SUM(q) AS DOUBLE) / COUNT(*) / 10000)
                  AS BIGINT) AS m
      FROM q4 GROUP BY label, dim
    )
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND(CAST(SUM((a.m - b.m) * (a.m - b.m)) AS DOUBLE)
                 / 1000000000000.0, 6) AS dist_sq
    FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label ORDER BY label_a, label_b
    """,
    tags=("llm", "embedding", "centroid", "distance-matrix"),
)
def embed_centroid_distance_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The k×k squared-distance matrix between label centroids — the
    class-separability summary behind confusion-risk triage (close
    centroids ⇒ classes the centroid classifier will confound; the
    per-vector view is embed_silhouette_simplified). Centroid means are
    quantized to integer micro-units with ONE identical floor(·1e6/1e4)
    expression per engine, so the pairwise Σdiff² folds as exact int64
    at any corpus scale; the k² join runs on k·dims centroid rows, not
    vectors."""
    q4 = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .select(
            "label",
            (F.col("pos") + 1).alias("dim"),
            F.floor(F.col("v").cast("double") * 10000)
            .cast("bigint")
            .alias("q"),
        )
    )
    cent = q4.groupBy("label", "dim").agg(
        F.floor(
            F.lit(1000000.0)
            * F.sum("q").cast("double")
            / F.count(F.lit(1))
            / F.lit(10000)
        )
        .cast("bigint")
        .alias("m")
    )
    a, b = cent.alias("a"), cent.alias("b")
    diff = F.col("a.m") - F.col("b.m")
    return (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.round(
                F.sum(diff * diff).cast("double") / F.lit(1e12), 6
            ).alias("dist_sq")
        )
        .orderBy("label_a", "label_b")
    )


# --- Jaccard threshold sweep ------------------------------------------------------


@query(
    "corpus_jaccard_band_sweep",
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
      SELECT ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))), 4) AS j
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
    )
    SELECT CASE WHEN j >= 0.9 THEN '[0.9,1.0]'
                WHEN j >= 0.7 THEN '[0.7,0.9)'
                ELSE '[0.5,0.7)' END AS band,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(j AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*), 6)
             AS mean_jaccard
    FROM pairs GROUP BY band ORDER BY band
    """,
    tags=("llm", "dedup", "jaccard", "threshold-sweep"),
)
def corpus_jaccard_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold sensitivity in ONE pass: exact n-gram-Jaccard
    pairs at t ≥ 0.5 (prefix-filtered, recall 1.0 —
    operators/dedup.ngram_jaccard_pairs) banded into [0.5,0.7) /
    [0.7,0.9) / [0.9,1.0] with per-band counts and mean similarity —
    the evidence for CHOOSING a dedup threshold, instead of re-running
    the pipeline per candidate t (the pair enumeration cost is paid
    once at the loosest threshold; banding is free). Band edges compare
    the 4dp-rounded Jaccard on both sides."""
    from distributed_graph_database_system_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold_num=1,
        threshold_den=2,
    )
    band = (
        F.when(F.col("jaccard") >= 0.9, "[0.9,1.0]")
        .when(F.col("jaccard") >= 0.7, "[0.7,0.9)")
        .otherwise("[0.5,0.7)")
    )
    return (
        pairs.groupBy(band.alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("jaccard").cast("decimal(8,4)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_jaccard"),
        )
        .orderBy("band")
    )


# --- word-initial-letter entropy ---------------------------------------------------


@query(
    "text_word_initial_entropy",
    oracle="""
    WITH tok AS (
      SELECT lang, substr(unnest(string_split(lower(text), ' ')), 1, 1) AS c
      FROM documents
    ), cnt AS (
      SELECT lang, c, CAST(COUNT(*) AS BIGINT) AS n
      FROM tok WHERE c <> '' GROUP BY lang, c
    ), tot AS (
      SELECT lang, SUM(n) AS nt FROM cnt GROUP BY lang
    )
    SELECT cnt.lang AS lang,
           CAST(COUNT(*) AS BIGINT) AS alphabet,
           CAST(MAX(tot.nt) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(CAST(ROUND(-(CAST(cnt.n AS DOUBLE) / tot.nt)
                        * LN(CAST(cnt.n AS DOUBLE) / tot.nt) / LN(2), 6)
                    AS DECIMAL(18,6))) AS DOUBLE), 4) AS entropy_bits
    FROM cnt JOIN tot ON cnt.lang = tot.lang
    GROUP BY cnt.lang ORDER BY cnt.lang
    """,
    tags=("llm", "text", "entropy", "language-signature"),
)
def text_word_initial_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the word-INITIAL-letter distribution per
    language — a one-scan orthographic signature (languages concentrate
    word onsets differently) that complements the n-gram langid features
    (text_langid): low entropy = few productive onsets. Letter counts
    are exact integers off one explode; the ≤|alphabet| entropy terms
    per language use the round-6 decimal device."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .select("lang", F.substring("w", 1, 1).alias("c"))
        .where(F.col("c") != "")
    )
    cnt = tok.groupBy("lang", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cnt.groupBy("lang").agg(F.sum("n").alias("nt"))
    p = F.col("n").cast("double") / F.col("nt")
    term = F.round(-p * F.log(p) / F.log(F.lit(2.0)), 6).cast(
        "decimal(18,6)"
    )
    return (
        cnt.join(tot, "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("alphabet"),
            F.max("nt").cast("bigint").alias("n_tokens"),
            F.round(F.sum(term).cast("double"), 4).alias("entropy_bits"),
        )
        .orderBy("lang")
    )


# --- compound annual growth rate ------------------------------------------------------


@query(
    "orders_revenue_cagr",
    oracle="""
    WITH yearly AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY yr
    ), fl AS (
      SELECT CAST(MIN(yr) AS BIGINT) AS y0, CAST(MAX(yr) AS BIGINT) AS y1
      FROM yearly
    )
    SELECT fl.y0 AS first_year, fl.y1 AS last_year,
           CAST(MIN(CASE WHEN yr = fl.y0 THEN rev END) AS DOUBLE) AS rev_first,
           CAST(MIN(CASE WHEN yr = fl.y1 THEN rev END) AS DOUBLE) AS rev_last,
           ROUND(POW(CAST(MIN(CASE WHEN yr = fl.y1 THEN rev END) AS DOUBLE)
                     / CAST(MIN(CASE WHEN yr = fl.y0 THEN rev END) AS DOUBLE),
                     1.0 / (fl.y1 - fl.y0)) - 1.0, 6) AS cagr
    FROM yearly CROSS JOIN fl
    GROUP BY fl.y0, fl.y1
    """,
    tags=("stats", "cagr", "growth", "calendar"),
)
def orders_revenue_cagr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound annual growth rate of order revenue between the first and
    last full fixture years — the geometric-mean growth summary
    (arithmetic year-over-year deltas overstate volatile series). Yearly
    revenue folds as exact decimals; the single pow(·, 1/(y1−y0)) is one
    transcendental rounded to 6dp on both sides (the LN-family
    precedent). Note the fixture's edge years are partial — CAGR between
    endpoints is the census, not a forecast."""
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(F.year("o_orderdate").alias("yr")).agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )
    fl = yearly.agg(
        F.min("yr").cast("bigint").alias("y0"),
        F.max("yr").cast("bigint").alias("y1"),
    )
    yf = yearly.crossJoin(F.broadcast(fl))
    rev0 = F.min(
        F.when(F.col("yr") == F.col("y0"), F.col("rev"))
    ).cast("double")
    rev1 = F.min(
        F.when(F.col("yr") == F.col("y1"), F.col("rev"))
    ).cast("double")
    return yf.groupBy("y0", "y1").agg(
        rev0.alias("rev_first"),
        rev1.alias("rev_last"),
        F.round(
            F.pow(rev1 / rev0, F.lit(1.0) / (F.col("y1") - F.col("y0")))
            - F.lit(1.0),
            6,
        ).alias("cagr"),
    ).select(
        F.col("y0").alias("first_year"),
        F.col("y1").alias("last_year"),
        "rev_first",
        "rev_last",
        "cagr",
    )
