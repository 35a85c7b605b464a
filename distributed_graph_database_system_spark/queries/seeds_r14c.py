"""R14_POOL, batch C: more first-time candidates for future rotations —
repeat-purchase interval pairs, drawdown and record-break analytics, a 2-D
independence chi², exact-moment skewness/kurtosis, a Zipf activity slope,
type-token-ratio bands, the CSV WRITER quoting roundtrip (the write-side
twin of the r13d reader test), a hopping-median streaming twin, a WCC
golden on an arithmetic island graph, per-source exact dup rates, and a
deep-decoded WAV duration histogram. All parity-verified at
sf0.001/0.01/0.1 at registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import (
    dec,
    dsum,
    scratch_dir,
)
from distributed_graph_database_system_spark.operators.prefix import (
    partitioned_prefix_sum,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- repeat orders within 7 days -----------------------------------------------------


@query(
    "orders_repeat_within7d_census",
    oracle="""
    WITH p AS (
      SELECT a.o_orderpriority AS prio, a.o_custkey AS ck
      FROM orders a JOIN orders b
        ON a.o_custkey = b.o_custkey
       AND b.o_orderdate > a.o_orderdate
       AND b.o_orderdate <= a.o_orderdate + INTERVAL 7 DAY
    )
    SELECT prio,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_customers
    FROM p GROUP BY prio ORDER BY prio
    """,
    tags=("join", "range", "self-join", "repeat-purchase"),
)
def orders_repeat_within7d_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase pairs within 7 days, censused by the FIRST order's
    priority — the reorder-latency primitive. The self range join is
    equi-keyed on the customer (one shuffle; the date band is a residual
    predicate), so pair fan-out is bounded by each customer's own order
    density — the per-key-quadratic contract, never |orders|²."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("da"),
        F.col("o_orderpriority").alias("prio"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck"), F.col("o_orderdate").alias("db")
    )
    pairs = a.join(
        b,
        ["ck"],
    ).where(
        (F.col("db") > F.col("da"))
        & (F.col("db") <= F.date_add(F.col("da"), 7))
    )
    return (
        pairs.groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.count_distinct("ck").cast("bigint").alias("n_customers"),
        )
        .orderBy("prio")
    )


# --- maximum drawdown of daily revenue ------------------------------------------------


@query(
    "orders_daily_rev_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
               AS rev_c
      FROM orders GROUP BY 1
    ), dd AS (
      SELECT day,
             MAX(rev_c) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - rev_c
               AS drawdown_c
      FROM daily
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           CAST(day AS TIMESTAMP) AS trough_day,
           CAST(drawdown_c AS DOUBLE) / 100 AS max_drawdown
    FROM dd ORDER BY drawdown_c DESC, day LIMIT 1
    """,
    tags=("stats", "drawdown", "running-max", "window"),
)
def orders_daily_rev_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the daily-revenue series: running max minus
    current, maximized — the risk metric every monitoring dashboard keeps.
    Revenues are exact integer cents so the running max and the argmax
    (tie → earliest day) are engine-exact; the window rides the bounded
    ~2.4k-row daily aggregate."""
    daily = load_table(spark, sf_dir, "orders").groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg((F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("rev_c"))
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    dd = daily.select(
        "day", (F.max("rev_c").over(w) - F.col("rev_c")).alias("drawdown_c")
    )
    return (
        dd.orderBy(F.desc("drawdown_c"), "day")
        .limit(1)
        .crossJoin(F.broadcast(n_days))
        .select(
            "n_days",
            F.col("day").cast("timestamp").alias("trough_day"),
            (F.col("drawdown_c").cast("double") / 100).alias("max_drawdown"),
        )
    )


# --- record-breaking events per user ---------------------------------------------------


@query(
    "events_user_record_breaks",
    oracle="""
    WITH x AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             MAX(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM events
    ), r AS (
      SELECT user_id,
             CAST(COUNT(*) FILTER (prev_max IS NULL OR cents > prev_max)
                  AS BIGINT) AS n_records
      FROM x GROUP BY user_id
    )
    SELECT n_records,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM r GROUP BY n_records ORDER BY n_records
    """,
    tags=("window", "running-max", "records", "census"),
)
def events_user_record_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-breaking event counts per user (value strictly above the
    user's running max), histogrammed — the personal-best analytic; its
    histogram shape separates i.i.d. streams (≈ harmonic growth) from
    trending ones. The running max partitions on user (key-parallel);
    values compare as exact cents; ties to the previous max do NOT
    count as records (strict inequality, same in both engines)."""
    e = load_table(spark, sf_dir, "events")
    cents = (dec("value") * 100).cast("bigint")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    x = e.select(
        "user_id",
        cents.alias("cents"),
        F.max(cents).over(w).alias("prev_max"),
    )
    r = x.groupBy("user_id").agg(
        F.count(
            F.when(
                F.col("prev_max").isNull()
                | (F.col("cents") > F.col("prev_max")),
                1,
            )
        )
        .cast("bigint")
        .alias("n_records")
    )
    return (
        r.groupBy("n_records")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("n_records")
    )


# --- 2-D discount × tax independence ----------------------------------------------------


@query(
    "lineitem_discount_tax_chi2",
    oracle="""
    WITH obs AS (
      SELECT CAST(CAST(l_discount AS DECIMAL(8,2)) * 100 AS BIGINT) AS d,
             CAST(CAST(l_tax AS DECIMAL(8,2)) * 100 AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM lineitem GROUP BY 1, 2
    ), rt AS (SELECT d, CAST(SUM(o) AS BIGINT) AS rn FROM obs GROUP BY d),
    ct AS (SELECT t, CAST(SUM(o) AS BIGINT) AS cn FROM obs GROUP BY t),
    tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT d) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT t) AS BIGINT) AS c
      FROM obs
    ), terms AS (
      SELECT CAST(ROUND(
               POW(o - CAST(rn AS DOUBLE) * cn / n, 2)
                 / (CAST(rn AS DOUBLE) * cn / n), 8) AS DECIMAL(28,8)) AS x
      FROM obs JOIN rt USING (d) JOIN ct USING (t) CROSS JOIN tot
    )
    SELECT n AS n_rows, r * c AS n_cells, (r - 1) * (c - 1) AS dof,
           ROUND(CAST((SELECT SUM(x) FROM terms) AS DOUBLE), 6) AS chi2
    FROM tot
    """,
    tags=("stats", "chi-squared", "independence", "2d"),
)
def lineitem_discount_tax_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi² independence test between the discount and tax levels — the
    statistic over the same 11×9 grid the contour census
    (lineitem_discount_tax_contour) only tabulates. Cents quantization
    makes the grid keys exact; expected counts are single IEEE chains;
    each (O−E)²/E term rounds to 8dp and folds as DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy(
        (dec("l_discount", 8, 2) * 100).cast("bigint").alias("d"),
        (dec("l_tax", 8, 2) * 100).cast("bigint").alias("t"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    rt = obs.groupBy("d").agg(F.sum("o").cast("bigint").alias("rn"))
    ct = obs.groupBy("t").agg(F.sum("o").cast("bigint").alias("cn"))
    tot = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count_distinct("d").cast("bigint").alias("r"),
        F.count_distinct("t").cast("bigint").alias("c"),
    )
    e = F.col("rn").cast("double") * F.col("cn") / F.col("n")
    term = F.round(F.pow(F.col("o") - e, 2) / e, 8).cast("decimal(28,8)")
    chi2 = (
        obs.join(rt, "d")
        .join(ct, "t")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("x"))
        .agg(F.sum("x").cast("double").alias("chi2_raw"))
    )
    return tot.crossJoin(F.broadcast(chi2)).select(
        F.col("n").alias("n_rows"),
        (F.col("r") * F.col("c")).alias("n_cells"),
        ((F.col("r") - 1) * (F.col("c") - 1)).alias("dof"),
        F.round(F.col("chi2_raw"), 6).alias("chi2"),
    )


# --- exact-moment skewness / kurtosis -----------------------------------------------------


@query(
    "orders_price_skew_kurtosis",
    oracle="""
    WITH q AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM orders
    ), m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x * x) AS DECIMAL(38,0))
               AS s3,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x * x * x)
                  AS DECIMAL(38,0)) AS s4
      FROM q
    ), d AS (
      SELECT CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS a1,
             CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS a2,
             CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS a3,
             CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS a4
      FROM m
    ), c AS (
      SELECT nd,
             a2 - a1 * a1 AS m2,
             a3 - 3 * a1 * a2 + 2 * a1 * a1 * a1 AS m3,
             a4 - 4 * a1 * a3 + 6 * a1 * a1 * a2 - 3 * a1 * a1 * a1 * a1
               AS m4
      FROM d
    )
    SELECT CAST(nd AS BIGINT) AS n_orders,
           ROUND(m3 / (m2 * SQRT(m2)), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM c
    """,
    tags=("stats", "moments", "skewness", "kurtosis"),
)
def orders_price_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of order prices from EXACT raw
    moments: prices quantize to cents and Σx..Σx⁴ fold as DECIMAL(38,0)
    (x⁴ ≤ 6e30 per row, the sum well inside 38 digits at any tested SF),
    so the only floats are one fixed chain of IEEE ops written
    IDENTICALLY in both engines — including sqrt instead of pow(·,1.5),
    since sqrt is correctly rounded where pow is only faithful."""
    o = load_table(spark, sf_dir, "orders")
    d38 = "decimal(38,0)"
    x = (dec("o_totalprice") * 100).cast("bigint")
    q = o.select(x.alias("x"))
    xd = F.col("x").cast(d38)
    m = q.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("s1"),
        F.sum(xd * F.col("x")).cast(d38).alias("s2"),
        F.sum(xd * F.col("x") * F.col("x")).cast(d38).alias("s3"),
        F.sum(xd * F.col("x") * F.col("x") * F.col("x")).cast(d38).alias("s4"),
    )
    nd = F.col("n").cast("double")
    a1 = F.col("s1").cast("double") / nd
    a2 = F.col("s2").cast("double") / nd
    a3 = F.col("s3").cast("double") / nd
    a4 = F.col("s4").cast("double") / nd
    d = m.select(
        nd.alias("nd"),
        a1.alias("a1"),
        a2.alias("a2"),
        a3.alias("a3"),
        a4.alias("a4"),
    )
    m2 = F.col("a2") - F.col("a1") * F.col("a1")
    m3 = (
        F.col("a3")
        - F.lit(3) * F.col("a1") * F.col("a2")
        + F.lit(2) * F.col("a1") * F.col("a1") * F.col("a1")
    )
    m4 = (
        F.col("a4")
        - F.lit(4) * F.col("a1") * F.col("a3")
        + F.lit(6) * F.col("a1") * F.col("a1") * F.col("a2")
        - F.lit(3) * F.col("a1") * F.col("a1") * F.col("a1") * F.col("a1")
    )
    c = d.select(F.col("nd"), m2.alias("m2"), m3.alias("m3"), m4.alias("m4"))
    return c.select(
        F.col("nd").cast("bigint").alias("n_orders"),
        F.round(F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2"))), 6).alias(
            "skewness"
        ),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3, 6).alias(
            "excess_kurtosis"
        ),
    )


# --- Zipf slope of user activity -----------------------------------------------------------


@query(
    "events_user_activity_zipf_slope",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ), r AS (
      SELECT CAST(ROUND(LN(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id)
                              AS DOUBLE)), 8) AS DECIMAL(20,8)) AS x,
             CAST(ROUND(LN(CAST(n AS DOUBLE)), 8) AS DECIMAL(20,8)) AS y
      FROM c
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx
      FROM r
    )
    SELECT k AS n_users,
           ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
             AS zipf_slope
    FROM s
    """,
    tags=("stats", "zipf", "powerlaw", "ols"),
)
def events_user_activity_zipf_slope(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zipf (rank-frequency) slope of user activity: OLS of ln(count) on
    ln(rank) — the power-law screen distinguishing heavy-tailed audiences
    from uniform ones (slope ≈ 0). ln values pre-round to 8dp DECIMALs so
    the OLS sums are exact decimal folds (the corpus_zipf_slope
    discipline). The rank is a two-pass partitioned prefix COUNT over the
    global (n DESC, user_id) order — user_id is an SF-scaled key (the sf
    generator strides it per copy), so a single global row_number window
    here would be one task holding the whole user domain; the prefix-sum
    rank is integer-exact, so it equals ROW_NUMBER bit-for-bit while
    every task holds only one range partition (r13 ADVICE item)."""
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ranked = partitioned_prefix_sum(
        c,
        [F.col("n").desc(), F.col("user_id")],
        F.lit(1).cast("bigint"),
        out_col="rank",
    )
    r = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 8)
        .cast("decimal(20,8)")
        .alias("x"),
        F.round(F.log(F.col("n").cast("double")), 8)
        .cast("decimal(20,8)")
        .alias("y"),
    )
    s = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    return s.select(
        F.col("k").alias("n_users"),
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


# --- type-token-ratio bands --------------------------------------------------------------


@query(
    "documents_ttr_band_census",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, source, w AS word
      FROM documents,
           unnest(string_split_regex(
             regexp_replace(lower(text), '^\s+|\s+$', '', 'g'), '\s+'))
             AS t(w)
      WHERE len(w) > 0
    ), per_doc AS (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types
      FROM w GROUP BY doc_id, source
    )
    SELECT source,
           CAST(FLOOR(CAST(n_types AS DOUBLE) / n_words * 10) AS INT)
             AS ttr_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM per_doc GROUP BY source, ttr_band ORDER BY source, ttr_band
    """,
    tags=("llm", "text", "ttr", "lexical-diversity"),
)
def documents_ttr_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token-ratio band census per source — the lexical-diversity
    quality gate (templated or spammy docs sit in the low-TTR bands).
    Tokenization matches the repo convention; the per-doc distinct is the
    heavy op and keys on (doc, word); the band floor runs on identical
    IEEE division in both engines."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        "source",
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("word"),
    ).where(F.length("word") > 0)
    per_doc = words.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.count_distinct("word").cast("bigint").alias("n_types"),
    )
    return (
        per_doc.groupBy(
            "source",
            F.floor(
                F.col("n_types").cast("double") / F.col("n_words") * 10
            )
            .cast("int")
            .alias("ttr_band"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
        .orderBy("source", "ttr_band")
    )


# --- CSV writer quoting roundtrip -----------------------------------------------------------


@query(
    "sink_csv_quote_roundtrip",
    oracle="""
    WITH x AS (
      SELECT p_partkey,
             split_part(p_name, ' ', 1) || ',' || chr(10) || '"'
               || split_part(p_name, ' ', 2) || '"' AS gnarly
      FROM part
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(p_partkey) AS BIGINT) AS key_sum,
           CAST(SUM(len(gnarly)) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT gnarly) AS BIGINT) AS n_distinct
    FROM x
    """,
    tags=("sinks", "csv", "quoting", "roundtrip"),
)
def sink_csv_quote_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV WRITER quoting torture: strings containing the delimiter, an
    embedded newline, AND literal double quotes are written by Spark's
    csv sink with RFC-4180 escaping (escape = quote = '"' — Spark's
    default backslash escape is NOT RFC and DuckDB/Excel would misread
    it), read back with multiLine, and censused. The oracle computes the
    same census straight from the source table, so one mis-escaped quote
    or a naive line split shears the counts. Write-side twin of the
    r13d reader test (source_csv_quoted_multiline_roundtrip)."""
    import os

    p = load_table(spark, sf_dir, "part")
    gnarly = F.concat(
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
        F.lit(","),
        F.lit("\n"),
        F.lit('"'),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        F.lit('"'),
    )
    df = p.select("p_partkey", gnarly.alias("gnarly"))
    path = scratch_dir("sinks", sf_dir, "csv_quote_parts")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("quote", '"')
        .option("escape", '"')
        .schema("p_partkey BIGINT, gnarly STRING")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("p_partkey").cast("bigint").alias("key_sum"),
        F.sum(F.length("gnarly")).cast("bigint").alias("total_chars"),
        F.count_distinct("gnarly").cast("bigint").alias("n_distinct"),
    )


# --- streaming twin: hopping 24h/12h median ----------------------------------------------


@query(
    "stream_hopping12h_value_median",
    oracle="""
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
                AS DOUBLE) / 100 AS median_value
    FROM (
      SELECT time_bucket(INTERVAL 24 HOUR, ts) AS window_start,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 24 HOUR, ts, INTERVAL 12 HOUR),
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
      FROM events
    ) GROUP BY window_start ORDER BY window_start
    """,
    tags=("streaming", "window", "hopping", "percentile"),
)
def stream_hopping12h_value_median(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hopping 24-hour median value every 12 hours — the windowed
    order-statistic twin (medians are NOT mergeable across panes, which
    is exactly why both engines reconstruct the two epoch-aligned
    bucketings each event belongs to; the streaming deployment would keep
    a per-window histogram/KLL sketch instead). Values are exact cents;
    the per-window median routes through group_quantiles_disc keyed on
    window_start (partition-bounded state — a per-window builtin
    percentile_disc buffers every value of a 24-hour pane in one task,
    which at 100 TB is a day of events in memory)."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    e = load_table(spark, sf_dir, "events")
    day_us = 86_400_000_000
    half_us = 43_200_000_000
    # integer `div` keeps the bucket arithmetic exact (a float divide
    # would be fine at 2024 epochs but is a needless precision bet)
    b0 = F.timestamp_micros(
        F.expr(f"(unix_micros(ts) div {day_us}) * {day_us}")
    )
    b12 = F.timestamp_micros(
        F.expr(
            f"((unix_micros(ts) - {half_us}) div {day_us}) * {day_us}"
            f" + {half_us}"
        )
    )
    # every event belongs to exactly two 24h/12h sliding panes: the
    # epoch-aligned one and the 12h-offset one (same reconstruction as
    # the oracle's two time_bucket branches)
    v = e.select(
        F.explode(F.array(b0, b12)).alias("window_start"),
        (dec("value") * 100).cast("bigint").alias("cents"),
    )
    n = v.groupBy("window_start").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    med = group_quantiles_disc(
        v, "cents", [0.5], ["window_start"]
    ).withColumnRenamed(_qcolname(0.5), "med_c")
    return (
        n.join(med, "window_start")
        .select(
            "window_start",
            "n",
            (F.col("med_c").cast("double") / 100).alias("median_value"),
        )
        .orderBy("window_start")
    )


# --- WCC on an arithmetic island graph -----------------------------------------------------


@query(
    "graph_wcc_arith_islands",
    oracle="""
    WITH RECURSIVE base AS (
      SELECT i + 1 AS src, j + 1 AS dst
      FROM (SELECT unnest(range(0, 60)) AS i)
      CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
      WHERE (i * 5 + j * 11) % 29 = 0 AND i <> j
    ), e AS (
      SELECT src, dst FROM base
      UNION SELECT dst, src FROM base
    ), walk(seed, vid) AS (
      SELECT src, src FROM (SELECT DISTINCT src FROM e)
      UNION
      SELECT w.seed, e.dst FROM walk w JOIN e ON e.src = w.vid
    ), comp AS (
      SELECT seed AS vid, MIN(vid) AS comp
      FROM (SELECT seed, MIN(vid) AS vid FROM walk GROUP BY seed, vid)
      GROUP BY seed
    )
    SELECT CAST(comp AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM comp GROUP BY comp ORDER BY component
    """,
    tags=("graph", "wcc", "components", "arithmetic"),
)
def graph_wcc_arith_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly-connected-component size census of a 60-vertex arithmetic
    graph ((5i+11j) mod 29 = 0, i≠j) through the star-contraction WCC
    operator (operators/graph.py connected_components — O(log n) rounds
    independent of diameter, the 100 TB-safe variant). The recursive-CTE
    oracle recomputes components as min-reachable-vid over the
    symmetrized closure, so a mislabeled vertex or a lost island breaks
    the hash."""
    from distributed_graph_database_system_spark.operators.graph import (
        EDGE_SCHEMA,
        connected_components,
    )

    n = 60
    base = [
        (i + 1, j + 1)
        for i in range(n)
        for j in range(n)
        if (i * 5 + j * 11) % 29 == 0 and i != j
    ]
    sym = sorted(set(base) | {(b, a) for a, b in base})
    e = spark.createDataFrame(sym, EDGE_SCHEMA)
    cc = connected_components(e)
    return (
        cc.groupBy(F.col("comp").cast("bigint").alias("component"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vertices"))
        .orderBy("component")
    )


# --- exact dup rate per source ---------------------------------------------------------------


@query(
    "corpus_dedup_rate_by_source",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate
    FROM documents GROUP BY source ORDER BY source
    """,
    tags=("llm", "dedup", "exact", "census"),
)
def corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate rate per source via content-hash distinct — the
    first number any corpus intake reports (and the cheap pre-screen
    before MinHash: a source that is 40% exact-dup gets hash-dedup'd
    before the expensive near-dup pass). The distinct runs on 32-char
    digests, not document bodies — the shuffle carries hashes only, the
    same id-only discipline as the LSH path."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct(F.md5("text")).cast("bigint").alias("n_unique"),
            F.round(
                F.lit(1.0)
                - F.count_distinct(F.md5("text")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# --- deep-decoded WAV duration histogram ----------------------------------------------------


@query(
    "multimodal_wav_duration_histogram",
    oracle="""
    WITH docs AS (
      SELECT doc_id AS d FROM documents WHERE doc_id % 8 = 0
    ), clips AS (
      SELECT d, 800 + (d % 5) * 400 AS n, 8000 * (1 + d % 2) AS rate
      FROM docs
    ), samp AS (
      SELECT d, ((k * 53 + d * 7) % 257) - 128 AS s
      FROM clips, LATERAL (SELECT unnest(range(0, n)) AS k)
    ), stats AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_samples,
             CAST(MAX(ABS(s)) AS INT) AS audio_peak,
             CAST(SUM(s * s) AS BIGINT) AS audio_sqsum
      FROM samp GROUP BY d
    )
    SELECT CAST(c.d AS BIGINT) AS clip_id,
           st.n_samples,
           CAST(2 * c.n AS DOUBLE) / (2 * c.rate) AS duration_s,
           st.audio_peak, st.audio_sqsum
    FROM clips c JOIN stats st ON c.d = st.d ORDER BY clip_id
    """,
    tags=("llm", "multimodal", "audio", "wav", "mapinpandas"),
)
def multimodal_wav_duration_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deep-decoded WAV metadata census with VARYING sample rates and
    lengths: clips synthesize at 8 or 16 kHz and 800-2400 frames, the
    stdlib RIFF parser recovers duration from the fmt/data chunks and the
    PCM16 decoder recovers exact n_samples / peak / Σs² — so a byte-rate
    or chunk-walk bug shears duration while the oracle reproduces every
    number arithmetically (duration compares as the identical IEEE
    division data_size/byte_rate = 2n/2r both engines perform). Arrow-
    batched mapInPandas on both the synth and decode sides."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from distributed_graph_database_system_spark.operators.multimodal import (
        decode_media,
        make_wav,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 8 == 0
    )
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("content", BinaryType()),
        ]
    )

    def synth(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = 800 + (d % 5) * 400
                rate = 8000 * (1 + d % 2)
                rows.append(
                    {
                        "media_id": d,
                        "kind": "audio",
                        "content": make_wav(
                            n,
                            sample_rate=rate,
                            sample_fn=lambda k, d=d: ((k * 53 + d * 7) % 257)
                            - 128,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    media = docs.select("doc_id").mapInPandas(synth, schema=schema)
    meta = decode_media(media, deep=True)
    return (
        meta.select(
            F.col("media_id").cast("bigint").alias("clip_id"),
            F.col("n_samples").cast("bigint").alias("n_samples"),
            F.col("duration_s"),
            F.col("audio_peak").cast("int").alias("audio_peak"),
            F.col("audio_sqsum").cast("bigint").alias("audio_sqsum"),
        )
        .orderBy("clip_id")
    )
