"""R13_POOL, batch C: more first-time candidates for future window
rotations — string-distance analytics (integer-exact levenshtein),
behavioral set profiles, calendar-truncation and ISO-weekday censuses,
TRY-division null semantics, popcount distributions, QoQ lag growth,
dominant-label extraction, and two more forensic uniformity screens.
All parity-verified at sf0.001/0.01/0.1 at registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import dec, dsum
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- string distance: adjective edit-distance profile ---------------------------


@query(
    "part_adjective_levenshtein_pairs",
    oracle="""
    WITH adj AS (
      SELECT DISTINCT split_part(p_name, ' ', 2) AS noun,
             split_part(p_name, ' ', 1) AS a
      FROM part
    ), pairs AS (
      SELECT x.noun, levenshtein(x.a, y.a) AS d
      FROM adj x JOIN adj y ON x.noun = y.noun AND x.a < y.a
    )
    SELECT noun,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(d) AS INT) AS min_dist,
           CAST(MAX(d) AS INT) AS max_dist,
           ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(*), 4) AS avg_dist
    FROM pairs GROUP BY noun ORDER BY noun
    """,
    tags=("string", "levenshtein", "edit-distance", "blocked-pairs"),
)
def part_adjective_levenshtein_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Edit-distance profile of the adjective vocabulary within each noun
    block — the fuzzy-matching primitive (record linkage blocks on a
    key, then edit-distances only within blocks; the all-pairs join here
    is over the DISTINCT (noun, adjective) table, ~10 rows per block,
    never the fact). Levenshtein returns exact integers, so every stat
    but the one rounded mean is integer arithmetic."""
    p = load_table(spark, sf_dir, "part")
    adj = p.select(
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("a"),
    ).distinct()
    x, y = adj.alias("x"), adj.alias("y")
    pairs = x.join(
        y,
        (F.col("x.noun") == F.col("y.noun")) & (F.col("x.a") < F.col("y.a")),
    ).select(
        F.col("x.noun").alias("noun"),
        F.levenshtein(F.col("x.a"), F.col("y.a")).alias("d"),
    )
    return (
        pairs.groupBy("noun")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.min("d").cast("int").alias("min_dist"),
            F.max("d").cast("int").alias("max_dist"),
            F.round(
                F.sum("d").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_dist"),
        )
        .orderBy("noun")
    )


# --- behavioral set profiles ------------------------------------------------------


@query(
    "events_user_type_profile_census",
    oracle="""
    WITH u AS (
      SELECT user_id,
             array_to_string(array_agg(DISTINCT event_type
                                       ORDER BY event_type), ',') AS profile,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT profile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 4)
             AS events_per_user
    FROM u GROUP BY profile ORDER BY profile
    """,
    tags=("sets", "collect-set", "behavioral-profile", "census"),
)
def events_user_type_profile_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Behavioral profile census: each user's DISTINCT event-type set,
    canonicalized by sorting and joining (collect_set is
    partition-order-dependent; sort_array makes it deterministic — the
    set-valued census discipline), then counted per profile. At most
    2^|types| = 32 profiles however large the log; the heavy step is one
    per-user aggregation."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.array_join(
            F.sort_array(F.collect_set("event_type")), ","
        ).alias("profile"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        u.groupBy("profile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.round(
                F.sum("n_events").cast("double") / F.count(F.lit(1)), 4
            ).alias("events_per_user"),
        )
        .orderBy("profile")
    )


# --- calendar truncation census ----------------------------------------------------


@query(
    "orders_quarter_trunc_census",
    oracle="""
    SELECT CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE) AS VARCHAR)
             AS quarter_start,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT last_day(CAST(o_orderdate AS DATE)))
                AS BIGINT) AS n_month_ends,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders GROUP BY quarter_start ORDER BY quarter_start
    """,
    tags=("scalar", "datetime", "date-trunc", "calendar"),
)
def orders_quarter_trunc_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-truncation census with a month-end cross-check:
    date_trunc('quarter') buckets (identical ISO semantics in both
    engines), and the distinct last_day() count per quarter must read 3
    for every full quarter — a calendar-function sanity expressed as
    data. One scan, one aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("quarter", F.col("o_orderdate"))
            .cast("date")
            .cast("string")
            .alias("quarter_start")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.count_distinct(F.last_day(F.col("o_orderdate")))
            .cast("bigint")
            .alias("n_month_ends"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("quarter_start")
    )


# --- TRY-division null semantics -----------------------------------------------------


@query(
    "lineitem_try_divide_margin",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2))
               / NULLIF(l_quantity - 20.0, 0.0) AS margin
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (margin IS NULL) AS BIGINT) AS n_undefined,
           ROUND(CAST(SUM(CAST(ROUND(margin, 6) AS DECIMAL(28,6)))
                      AS DOUBLE), 2) AS margin_sum
    FROM m GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("scalar", "try-divide", "null-semantics", "error-handling"),
)
def lineitem_try_divide_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY-division semantics: price over (quantity − 20) hits a zero
    divisor on every 20-unit line, and try_divide returns NULL there
    instead of raising under ANSI mode — the error-handling contract a
    pipeline needs when a formula has poles. The oracle states the same
    thing with NULLIF; surviving quotients are rounded to 6dp decimals
    before summing so the per-flag totals are order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.select(
        "l_returnflag",
        F.try_divide(
            dec("l_extendedprice"), F.col("l_quantity") - 20.0
        ).alias("margin"),
    )
    return (
        m.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(F.col("margin").isNull(), 1))
            .cast("bigint")
            .alias("n_undefined"),
            F.round(
                F.sum(
                    F.round("margin", 6).cast("decimal(28,6)")
                ).cast("double"),
                2,
            ).alias("margin_sum"),
        )
        .orderBy("l_returnflag")
    )


# --- popcount census -----------------------------------------------------------------


@query(
    "orders_key_popcount_census",
    oracle="""
    SELECT CAST(bit_count(o_orderkey) AS INT) AS popcount,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY popcount ORDER BY popcount
    """,
    tags=("scalar", "bitwise", "popcount", "census"),
)
def orders_key_popcount_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-count histogram of order keys — the bit-level scalar
    census (bit_count agrees across engines on two's-complement BIGINT);
    the shape a Bloom/bitmap capacity planner samples. ≤ 64 cells
    however large the table."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.bit_count(F.col("o_orderkey")).cast("int").alias("popcount")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_orderkey").cast("bigint").alias("min_key"),
            F.max("o_orderkey").cast("bigint").alias("max_key"),
        )
        .orderBy("popcount")
    )


# --- quarter-over-quarter growth ------------------------------------------------------


@query(
    "orders_qoq_growth_by_priority",
    oracle="""
    WITH q AS (
      SELECT o_orderpriority AS prio,
             CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qs,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY prio, qs
    )
    SELECT prio, CAST(qs AS VARCHAR) AS quarter_start,
           CAST(rev AS DOUBLE) AS revenue,
           ROUND(CAST(rev AS DOUBLE)
                 / CAST(LAG(rev) OVER (PARTITION BY prio ORDER BY qs)
                        AS DOUBLE) - 1.0, 6) AS qoq_growth
    FROM q ORDER BY prio, quarter_start
    """,
    tags=("window", "lag", "growth", "per-key"),
)
def orders_qoq_growth_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quarter-over-quarter revenue growth per priority — the per-key LAG
    window over the QUARTERLY aggregate (≤ ~28 quarters per key at any
    SF: horizon-bounded, partition-parallel). Revenue folds as exact
    decimal; the growth ratio is one double division rounded at 6dp;
    each key's first quarter reads NULL growth identically in both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    q = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("qs"),
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    wq = W.partitionBy("prio").orderBy("qs")
    return q.select(
        "prio",
        F.col("qs").cast("string").alias("quarter_start"),
        F.col("rev").cast("double").alias("revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.lag("rev").over(wq).cast("double")
            - 1.0,
            6,
        ).alias("qoq_growth"),
    ).orderBy("prio", "quarter_start")


# --- dominant label per group ---------------------------------------------------------


@query(
    "documents_dominant_lang_by_source",
    oracle="""
    WITH c AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ), tot AS (
      SELECT source, SUM(n) AS t, COUNT(*) AS n_langs FROM c GROUP BY source
    ), best AS (
      SELECT source,
             MAX(struct_pack(n := n, lang := lang)) AS b
      FROM c GROUP BY source
    )
    SELECT best.source,
           struct_extract(b, 'lang') AS dominant_lang,
           CAST(struct_extract(b, 'n') AS BIGINT) AS n_dominant,
           CAST(tot.n_langs AS BIGINT) AS n_langs,
           ROUND(CAST(struct_extract(b, 'n') AS DOUBLE) / tot.t, 6)
             AS dominance
    FROM best JOIN tot ON best.source = tot.source
    ORDER BY best.source
    """,
    tags=("aggregation", "argmax", "struct-max", "dominant-label"),
)
def documents_dominant_lang_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dominant language per source via lexicographic struct MAX over
    (count, lang) — the portable argmax with a deterministic tie rule
    (highest count, then LAST lang alphabetically, identical fieldwise
    comparison in both engines; DuckDB's arg_max rejects composite
    keys). One cell aggregate, two tiny folds, one rounded dominance
    share."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = c.groupBy("source").agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("n_langs")
    )
    best = c.groupBy("source").agg(
        F.max(
            F.struct(F.col("n").alias("n"), F.col("lang").alias("lang"))
        ).alias("b")
    )
    return (
        best.join(tot, "source")
        .select(
            "source",
            F.col("b.lang").alias("dominant_lang"),
            F.col("b.n").cast("bigint").alias("n_dominant"),
            F.col("n_langs").cast("bigint").alias("n_langs"),
            F.round(
                F.col("b.n").cast("double") / F.col("t"), 6
            ).alias("dominance"),
        )
        .orderBy("source")
    )


# --- forensic screens: minute uniformity + second-digit Benford -----------------------


@query(
    "events_minute_uniformity_chi2",
    oracle="""
    WITH cell AS (
      SELECT CAST(EXTRACT(minute FROM ts) AS INT) AS m,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY m
    ), tot AS (
      SELECT SUM(o) AS n, COUNT(*) AS k,
             CAST(SUM(o) AS DOUBLE) / 60.0 AS e
      FROM cell
    )
    SELECT CAST(MAX(tot.n) AS BIGINT) AS n,
           CAST(MAX(tot.k) AS BIGINT) AS k_present,
           ROUND(CAST(SUM(CAST(ROUND((cell.o - tot.e) * (cell.o - tot.e)
                                     / tot.e, 6) AS DECIMAL(18,6)))
                      AS DOUBLE)
                 + (60 - MAX(tot.k)) * ROUND(MAX(tot.e), 6), 4) AS chi2
    FROM cell CROSS JOIN tot
    """,
    tags=("stats", "chi-squared", "uniformity", "timestamps"),
)
def events_minute_uniformity_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-squared uniformity of the minute-of-hour digit — the
    batch-job/cron tell (organic traffic is minute-uniform; scheduled
    ingestion spikes :00/:30). Same 60-cell machinery as the cents-digit
    screen: exact integer cells, round-6 decimal terms, absent cells
    contribute their expected mass via the (60 − k)·e correction."""
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy(
        F.minute("ts").cast("int").alias("m")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    tot = cell.agg(
        F.sum("o").alias("n"),
        F.count(F.lit(1)).alias("k"),
        (F.sum("o").cast("double") / F.lit(60.0)).alias("e"),
    )
    dev = F.col("o") - F.col("e")
    return cell.crossJoin(F.broadcast(tot)).agg(
        F.max("n").cast("bigint").alias("n"),
        F.max("k").cast("bigint").alias("k_present"),
        F.round(
            F.sum(
                F.round(dev * dev / F.col("e"), 6).cast("decimal(18,6)")
            ).cast("double")
            + (60 - F.max("k")) * F.round(F.max("e"), 6),
            4,
        ).alias("chi2"),
    )


@query(
    "orders_benford_second_digit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT) AS VARCHAR), 2, 1) AS BIGINT) AS d2
      FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 100 >= 10
    ), cell AS (
      SELECT d2, CAST(COUNT(*) AS BIGINT) AS o FROM d GROUP BY d2
    ), tot AS (SELECT SUM(o) AS n FROM cell)
    SELECT CAST(cell.d2 AS INT) AS digit,
           cell.o AS n_orders,
           ROUND(CAST(cell.o AS DOUBLE) / tot.n, 6) AS observed,
           ROUND(LOG10(1.0 + 1.0 / (10 + cell.d2))
                 + LOG10(1.0 + 1.0 / (20 + cell.d2))
                 + LOG10(1.0 + 1.0 / (30 + cell.d2))
                 + LOG10(1.0 + 1.0 / (40 + cell.d2))
                 + LOG10(1.0 + 1.0 / (50 + cell.d2))
                 + LOG10(1.0 + 1.0 / (60 + cell.d2))
                 + LOG10(1.0 + 1.0 / (70 + cell.d2))
                 + LOG10(1.0 + 1.0 / (80 + cell.d2))
                 + LOG10(1.0 + 1.0 / (90 + cell.d2)), 6) AS expected
    FROM cell CROSS JOIN tot ORDER BY digit
    """,
    tags=("stats", "benford", "second-digit", "forensic"),
)
def orders_benford_second_digit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Second-digit Benford screen (Nigrini's preferred forensic test —
    fabricators who know first-digit Benford rarely match the second
    digit's Σ log10(1 + 1/(10k + d)) law). Cents come from the DECIMAL
    cast FIRST (the cents-digit sibling's convention): a raw
    double × 100 truncates in Spark's bigint cast but rounds in
    DuckDB's, and 0.29·100 = 28.999… would shear a digit cell between
    engines — decimal×100 is exact on the 2dp fixture, so the digit is
    identical by construction. Observed shares are one rounded division;
    the expected law is the same 9-term log10 sum rounded at 6dp on
    both sides."""
    o = load_table(spark, sf_dir, "orders")
    cents = (dec("o_totalprice") * 100).cast("bigint")
    d = o.where(dec("o_totalprice") * 100 >= 10).select(
        F.substring(cents.cast("string"), 2, 1).cast("bigint").alias("d2")
    )
    cell = d.groupBy("d2").agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    tot = cell.agg(F.sum("o").alias("n"))
    expected = sum(
        F.log10(1.0 + 1.0 / (10 * k + F.col("d2"))) for k in range(1, 10)
    )
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("d2").cast("int").alias("digit"),
            F.col("o").alias("n_orders"),
            F.round(F.col("o").cast("double") / F.col("n"), 6).alias(
                "observed"
            ),
            F.round(expected, 6).alias("expected"),
        )
        .orderBy("digit")
    )


# --- ISO-weekday share ------------------------------------------------------------


@query(
    "orders_weekend_share_by_priority",
    oracle="""
    SELECT o_orderpriority AS prio,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (date_part('isodow', o_orderdate) >= 6)
                AS BIGINT) AS n_weekend,
           ROUND(CAST(COUNT(*) FILTER (date_part('isodow', o_orderdate) >= 6)
                      AS DOUBLE) / COUNT(*), 6) AS weekend_share
    FROM orders GROUP BY prio ORDER BY prio
    """,
    tags=("scalar", "datetime", "isodow", "weekend"),
)
def orders_weekend_share_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weekend share per priority on the ISO weekday scale — the calendar
    trap query: Spark's dayofweek() is Sunday=1 while DuckDB's dayofweek
    is Sunday=0, so portable code must speak ISO (Mon=1..Sun=7); Spark's
    weekday() (Mon=0) + 1 equals DuckDB's isodow exactly. One scan, one
    aggregate, one rounded share."""
    o = load_table(spark, sf_dir, "orders")
    isodow = F.weekday(F.col("o_orderdate")) + 1
    return (
        o.groupBy(F.col("o_orderpriority").alias("prio"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.count(F.when(isodow >= 6, 1)).cast("bigint").alias("n_weekend"),
            F.round(
                F.count(F.when(isodow >= 6, 1)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("weekend_share"),
        )
        .orderBy("prio")
    )
