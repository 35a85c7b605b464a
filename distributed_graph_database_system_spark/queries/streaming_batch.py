"""Batch twins of the streaming operators (SURVEY.md §2.2 streaming rows).

Structured Streaming's windowed aggregates are defined to produce exactly
what the same ``window()``/``session_window()`` expression produces in batch
mode once all data has arrived — so these DuckDB-oracle-backed batch queries
ARE the correctness gate for the streaming semantics, while
tests/test_streaming.py asserts the incremental (readStream) execution
converges to these same results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dsum
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "tumbling"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "stream_sliding_sum",
    oracle="""
    SELECT window_start, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL 2 HOUR, ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 2 HOUR, ts, INTERVAL 1 HOUR) AS window_start, value
      FROM events
    ) GROUP BY window_start
    """,
    tags=("streaming", "window", "sliding"),
)
def stream_sliding_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h windows every 1h. The oracle reconstructs the two
    epoch-aligned bucketings (offsets 0 and 1h) that Spark's sliding window
    assigns each row to."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             -- >= (not >): Spark session windows span [start, last + gap)
             -- with an EXCLUSIVE end, so an event exactly `gap` after the
             -- previous one starts a new session.
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM gaps
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
    tags=("streaming", "window", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window() in batch mode == gap-based sessionization: sessions
    break when consecutive events are > 30 min apart."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


@query(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup"),
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming dropDuplicates: the surviving key set is
    deterministic even though which physical row survives is not."""
    e = load_table(spark, sf_dir, "events")
    return e.select("user_id", "event_type").distinct()


@query(
    "join_view_purchase_window",
    oracle="""
    SELECT p.event_id, COUNT(v.event_id) AS n_views_1h
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
    GROUP BY p.event_id
    """,
    tags=("streaming", "join", "interval"),
)
def join_view_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: views within the hour
    preceding each purchase by the same user. Equi key (user_id) carries the
    join; the time range is a residual predicate — hash join, not a nested
    loop. The true streaming execution (watermarked stream-stream join) is
    exercised in tests/test_streaming.py."""
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), F.col("user_id").alias("p_uid"), F.col("ts").alias("p_ts")
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_uid"), F.col("ts").alias("v_ts"), F.col("event_id").alias("v_id")
    )
    return (
        p.join(
            v,
            (F.col("p_uid") == F.col("v_uid"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") < F.col("p_ts")),
        )
        .groupBy("p_id")
        .agg(F.count("v_id").alias("n_views_1h"))
        .select(F.col("p_id").alias("event_id"), "n_views_1h")
    )
