"""R13_POOL, batch D: streaming-twin and layout breadth for the next
rotation — a distinct-user sliding reach, a tumbling min/max spread, a
quoted-multiline CSV roundtrip (the parser case naive line-splitting
corrupts), a time-INTERVAL range window frame, and the whole-graph SCC
golden on G8. All parity-verified at sf0.001/0.01/0.1 at registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import (
    dec,
    scratch_dir,
    sf_view,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- streaming twins ---------------------------------------------------------------


@query(
    "stream_sliding6h_user_reach",
    oracle="""
    SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS reach,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM (
      SELECT time_bucket(INTERVAL 24 HOUR, ts) AS window_start, user_id
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 24 HOUR, ts, INTERVAL 6 HOUR), user_id
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 24 HOUR, ts, INTERVAL 12 HOUR), user_id
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 24 HOUR, ts, INTERVAL 18 HOUR), user_id
      FROM events
    ) GROUP BY window_start ORDER BY window_start
    """,
    tags=("streaming", "window", "sliding", "distinct-reach"),
)
def stream_sliding6h_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 24-hour audience REACH every 6 hours — the distinct-user
    twin of stream_sliding_sum (counts are additive across the four
    epoch-aligned bucketings; distincts are NOT, which is exactly why
    the oracle reconstructs each bucketing before the per-window
    COUNT(DISTINCT)). Streaming-side this is the windowed
    dropDuplicates-then-count shape; at sketch scale the HLL/KMV rollups
    (agg_hll_sliding7) replace the exact distinct.

    SCALE DEFAULT (BASELINE.md round-14 decision table, sf100 idle,
    same corpus): this exact sliding distinct costs 59.3 s vs
    agg_hll_sliding7 13.3 s (mergeable HLL), events_sliding7_bitmap_exact
    10.4 s (exact via additive bitmaps), events_sliding7_quantiles_hist
    6.8 s (histogram order stats) — 4–9× cheaper. The warehouse default
    for sliding reach is the mergeable family; this query is the
    on-demand exact-semantics path."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "24 hours", "6 hours").alias("w"))
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("reach"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .select(F.col("w.start").alias("window_start"), "reach", "n_events")
        .orderBy("window_start")
    )


@query(
    "stream_tumbling4h_minmax_spread",
    oracle="""
    SELECT time_bucket(INTERVAL 4 HOUR, ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
           CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
           CAST(MAX(CAST(value AS DECIMAL(18,2)))
                - MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS spread
    FROM events GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    tags=("streaming", "window", "tumbling", "minmax"),
)
def stream_tumbling4h_minmax_spread(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tumbling 4-hour min/max value spread per event type — the
    bounded-state streaming aggregate family beyond sums and counts
    (min/max are the canonical mergeable extremes a monitoring stream
    keeps per window). Values compare as exact 2dp decimals, so the
    spread is exact decimal subtraction surfaced as double."""
    e = load_table(spark, sf_dir, "events")
    v = dec("value")
    return (
        e.groupBy(F.window("ts", "4 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(v).cast("double").alias("min_value"),
            F.max(v).cast("double").alias("max_value"),
            (F.max(v) - F.min(v)).cast("double").alias("spread"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "min_value",
            "max_value",
            "spread",
        )
        .orderBy("window_start", "event_type")
    )


# --- sources: quoted-multiline CSV roundtrip -------------------------------------------


@query(
    "source_csv_quoted_multiline_roundtrip",
    oracle="""
    WITH x AS (
      SELECT p_partkey,
             split_part(p_name, ' ', 1) || ',' || chr(10) || '"'
               || split_part(p_name, ' ', 2) || '"' AS gnarly,
             CAST(p_retailprice AS DECIMAL(18,2)) AS price
      FROM part
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(LENGTH(gnarly)) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN gnarly LIKE '%' || chr(10) || '%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_multiline,
           CAST(SUM(price) AS DOUBLE) AS total_price
    FROM x
    """,
    tags=("sources", "csv", "multiline", "quoting", "roundtrip"),
)
def source_csv_quoted_multiline_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CSV quoting TORTURE roundtrip: every row's string value embeds the
    delimiter, a REAL newline, and double quotes; written with Spark's
    CSV writer (which must quote and escape them) and read back with
    multiLine=true (without it, the reader splits records mid-field and
    the census changes). The oracle computes the same census from the
    base table — the roundtrip must be the identity, proving parser and
    writer agree on RFC-4180-style quoting. At scale multiLine CSV
    sacrifices intra-file split parallelism (a file is one record
    stream); the plumbing stays one-file-per-task parallel."""
    import os

    p = load_table(spark, sf_dir, "part")
    gnarly = F.concat(
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
        F.lit(",\n\""),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        F.lit("\""),
    )
    x = p.select(
        "p_partkey",
        gnarly.alias("gnarly"),
        dec("p_retailprice").alias("price"),
    )
    path = scratch_dir("sources", sf_dir, "gnarly_csv")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # escape='"' on BOTH sides = RFC-4180 quote doubling; Spark's default
    # writer escape is backslash, which a doubling-mode reader would
    # misparse (4 stray chars per row in the first version of this query)
    x.write.mode("overwrite").option("header", "true").option(
        "escape", '"'
    ).csv(path)
    back = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .schema("p_partkey BIGINT, gnarly STRING, price DECIMAL(18,2)")
        .csv(path)
    )
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.length("gnarly")).cast("bigint").alias("total_chars"),
        F.sum(F.when(F.col("gnarly").contains("\n"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_multiline"),
        F.sum("price").cast("double").alias("total_price"),
    )


# --- window: time-INTERVAL range frame ---------------------------------------------


@query(
    "orders_range_interval_3day_sum",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (ORDER BY day
                               RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                                         AND CURRENT ROW) AS DOUBLE)
             AS rev_4day_window
    FROM d ORDER BY day
    """,
    tags=("window", "range-frame", "interval", "time-series"),
)
def orders_range_interval_3day_sum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-INTERVAL range frame: each day's trailing 4-calendar-day
    revenue via RANGE BETWEEN INTERVAL 3 DAYS PRECEDING — the frame kind
    ROWS cannot express when the series has GAPS (a missing calendar day
    must shrink the window, not slide it). The DataFrame API's
    rangeBetween only takes longs, so the frame is stated in SQL on both
    sides; the window runs over the DAILY aggregate (horizon-bounded,
    the documented scale contract of every daily series here). Exact
    decimal sums throughout."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )
    v = sf_view(spark, d, "range_interval_daily", sf_dir)
    return spark.sql(f"""
        SELECT CAST(day AS STRING) AS day,
               CAST(rev AS DOUBLE) AS revenue,
               CAST(SUM(rev) OVER (ORDER BY day
                                   RANGE BETWEEN INTERVAL 3 DAYS PRECEDING
                                             AND CURRENT ROW) AS DOUBLE)
                 AS rev_4day_window
        FROM {v} ORDER BY day
    """)


# --- graph: whole-graph SCC golden ---------------------------------------------------


@query(
    "graph_scc_g8",
    oracle=(
        "SELECT CAST(v AS BIGINT) AS vid, CAST(1 AS BIGINT) AS scc "
        "FROM (SELECT unnest(range(1, 17)) AS v)"
    ),
    tags=("graph", "scc", "trim-color", "grid-with-chord"),
)
def graph_scc_g8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC on G8 — the opposite extreme from G2's mostly-acyclic case:
    the 16→1 back edge closes EVERY grid path into one cycle, so
    trim-and-color must trim NOTHING (no vertex is a source or sink) and
    resolve all 16 vertices into a single component keyed by min id 1.
    Exercises the coloring/backward-walk path exclusively, where G2
    exercised the trimming path."""
    from distributed_graph_database_system_spark.operators.graph import (
        strongly_connected_components,
    )
    from distributed_graph_database_system_spark.queries.seeds_r13a import (
        _g8_edges,
    )

    return strongly_connected_components(_g8_edges(spark))
