"""Round-13 window seeds, batch A: the 21 first-time queries that join the
29-name R12_POOL to form the round-12 DRIVER_WINDOW (registry.py). Each
entry re-evidences a SURVEY §2.2 structural row with a FRESH query so the
rotated-out round-11 anchors can move to the historical ledger: outer /
semi / theta / broadcast joins, grouping sets, set ops, pivot projection,
decorrelated subqueries, window top-k, null-safe predicates, calendar /
string / JSON scalars, parquet source+sink round-trips (pruned projection,
dynamic partition overwrite), the Python DataSource, session-window
streaming twin, BFS/DFS on a new fixture, an Arrow-batched WAV decode, and
a sampling mix plan.

Exactness discipline (queries/helpers.py): money folds as DECIMAL(18,2),
counts as BIGINT, ratios as ONE double division rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import (
    dec,
    dsum,
    scratch_dir,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- joins: outer ------------------------------------------------------------


@query(
    "customers_without_orders_outer",
    oracle="""
    WITH pc AS (
      SELECT c.c_mktsegment AS segment, c.c_custkey,
             COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(*) FILTER (n_orders = 0) AS BIGINT) AS n_inactive,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders
    FROM pc GROUP BY segment ORDER BY segment
    """,
    tags=("join", "outer", "left-join", "null-preserving"),
)
def customers_without_orders_outer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Null-preserving LEFT OUTER join census: customers who never placed
    an order survive the join with n_orders = 0 and are counted per
    market segment — the classic outer-join correctness trap (an inner
    join silently drops them and n_inactive reads 0). The orders side is
    pre-aggregated to one row per customer BEFORE the join, so the outer
    join is key-to-key (never row-multiplying) and the plan is two keyed
    aggregations around one equi join."""
    c = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    pc = c.join(
        per_cust, c.c_custkey == per_cust.o_custkey, "left"
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )
    return (
        pc.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.count(F.when(F.col("n_orders") == 0, 1))
            .cast("bigint")
            .alias("n_inactive"),
            F.sum("n_orders").cast("bigint").alias("total_orders"),
        )
        .orderBy("segment")
    )


# --- joins: semi over a 3-table chain -----------------------------------------


@query(
    "supplier_local_demand_semi",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) FILTER (EXISTS (
             SELECT 1 FROM lineitem l
             JOIN orders o ON l.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
             WHERE l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
           )) AS BIGINT) AS n_local
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY nation ORDER BY nation
    """,
    tags=("join", "semi", "exists", "multi-join"),
)
def supplier_local_demand_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS decorrelated to a LEFT SEMI join over a three-table chain:
    a supplier has "local demand" iff some lineitem it supplied belongs
    to an order placed by a customer of the supplier's OWN nation. The
    demand side reduces to DISTINCT (suppkey, customer-nation) pairs
    before the semi join — id-only shuffle payload — and the nation dim
    rides broadcast; the census is one aggregate over 25 nations."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    demand = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("l_suppkey", "c_nationkey")
        .distinct()
    )
    local = s.join(
        demand,
        (s.s_suppkey == demand.l_suppkey)
        & (s.s_nationkey == demand.c_nationkey),
        "left_semi",
    ).select("s_suppkey", "s_nationkey")
    tot = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers")
    )
    loc = local.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_local")
    )
    return (
        tot.join(loc, "s_nationkey", "left")
        .join(F.broadcast(n), tot.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            F.coalesce("n_local", F.lit(0)).cast("bigint").alias("n_local"),
        )
        .orderBy("nation")
    )


# --- joins: broadcast theta band dim ------------------------------------------


_BANDS = [
    ("micro", 0, 50_000),
    ("small", 50_000, 100_000),
    ("medium", 100_000, 200_000),
    ("large", 200_000, 400_000),
    ("jumbo", 400_000, 100_000_000),
]


@query(
    "orders_price_band_dim_range",
    oracle="""
    SELECT b.band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN (VALUES ('micro', 0, 50000), ('small', 50000, 100000),
                 ('medium', 100000, 200000), ('large', 200000, 400000),
                 ('jumbo', 400000, 100000000)) AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band ORDER BY b.band
    """,
    tags=("join", "theta", "broadcast", "range-band"),
)
def orders_price_band_dim_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (range-band) join against an inline 5-row band dimension:
    each order lands in the band whose [lo, hi) interval contains its
    total price. The dim is broadcast, so the theta join is a
    BroadcastNestedLoopJoin over 5 rows per order — the scale-correct
    plan for banding (never a shuffle); bands are half-open and disjoint
    so the join is exactly row-preserving."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band STRING, lo LONG, hi LONG")
    j = o.join(
        F.broadcast(bands),
        (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
    )
    return (
        j.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("band")
    )


# --- aggregation: grouping sets across a join -----------------------------------


@query(
    "agg_groupingsets_flag_priority",
    oracle="""
    SELECT l.l_returnflag, o.o_orderpriority,
           CAST(GROUPING(l.l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(o.o_orderpriority) AS INT) AS g_prio,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY GROUPING SETS ((l.l_returnflag), (o.o_orderpriority), ())
    """,
    tags=("aggregation", "grouping-sets", "join", "grouping-flags"),
)
def agg_groupingsets_flag_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GROUPING SETS across a JOIN — two one-dimensional marginals plus
    the grand total in ONE Expand pass over the lineitem⋈orders rows
    (three separate aggregates would scan the join three times), with
    grouping() flags disambiguating a real NULL key from a rolled-up
    one. DataFrame-native groupingSets (Spark 4); exact decimal revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.groupingSets(
        [["l_returnflag"], ["o_orderpriority"], []],
        "l_returnflag",
        "o_orderpriority",
    ).agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        dsum("l_extendedprice").alias("revenue"),
    )


# --- set operations: symmetric difference ---------------------------------------


@query(
    "customers_9496_symmetric_diff",
    oracle="""
    WITH a AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1994
    ), b AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(year FROM o_orderdate) = 1996
    ), d AS (
      SELECT 'only_1994' AS side, o_custkey
      FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
      UNION ALL
      SELECT 'only_1996' AS side, o_custkey
      FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
    )
    SELECT side, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MIN(o_custkey) AS BIGINT) AS min_custkey,
           CAST(MAX(o_custkey) AS BIGINT) AS max_custkey
    FROM d GROUP BY side ORDER BY side
    """,
    tags=("set-ops", "except", "symmetric-difference"),
)
def customers_9496_symmetric_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Symmetric difference of the 1994 and 1996 active-customer sets —
    churn in both directions as two tagged EXCEPTs unioned. Each side is
    DISTINCT before the set op, so EXCEPT is set semantics (the bag twin
    is customers_repeat_9495_intersect_all); the census is per side."""
    o = load_table(spark, sf_dir, "orders")

    def active(year: int) -> DataFrame:
        return (
            o.where(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    a, b = active(1994), active(1996)
    d = (
        a.subtract(b).select(F.lit("only_1994").alias("side"), "o_custkey")
    ).unionAll(
        b.subtract(a).select(F.lit("only_1996").alias("side"), "o_custkey")
    )
    return (
        d.groupBy("side")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.min("o_custkey").cast("bigint").alias("min_custkey"),
            F.max("o_custkey").cast("bigint").alias("max_custkey"),
        )
        .orderBy("side")
    )


# --- projection: pivot with shares ----------------------------------------------


@query(
    "orders_status_share_pivot",
    oracle="""
    WITH p AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
             CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
             CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
      FROM orders GROUP BY yr
    )
    SELECT CAST(yr AS INT) AS yr, n_f, n_o, n_p,
           ROUND(CAST(n_f AS DOUBLE) / (n_f + n_o + n_p), 6) AS share_f,
           ROUND(CAST(n_o AS DOUBLE) / (n_f + n_o + n_p), 6) AS share_o
    FROM p ORDER BY yr
    """,
    tags=("projection", "pivot", "conditional-aggregation"),
)
def orders_status_share_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT of order status into columns per order year with per-year
    shares — the wide-report projection shape. The pivot value list is
    EXPLICIT ('F','O','P'), so the plan is a single-pass conditional
    aggregation (no extra distinct-values job) and the output schema is
    stable at any scale; missing cells coalesce to 0."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "yr",
            F.coalesce("F", F.lit(0)).cast("bigint").alias("n_f"),
            F.coalesce("O", F.lit(0)).cast("bigint").alias("n_o"),
            F.coalesce("P", F.lit(0)).cast("bigint").alias("n_p"),
        )
    )
    tot = (F.col("n_f") + F.col("n_o") + F.col("n_p")).cast("double")
    return p.select(
        "yr",
        "n_f",
        "n_o",
        "n_p",
        F.round(F.col("n_f").cast("double") / tot, 6).alias("share_f"),
        F.round(F.col("n_o").cast("double") / tot, 6).alias("share_o"),
    ).orderBy("yr")


# --- subquery decorrelation -----------------------------------------------------


@query(
    "suppliers_above_nation_avg",
    oracle="""
    WITH stats AS (
      SELECT s_nationkey,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal,
             COUNT(*) AS n
      FROM supplier GROUP BY s_nationkey
    )
    SELECT CAST(s.s_nationkey AS INT) AS nationkey,
           CAST(MAX(stats.n) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) FILTER (
             CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE)
               > stats.avg_bal) AS BIGINT) AS n_above,
           ROUND(MAX(stats.avg_bal), 4) AS avg_bal
    FROM supplier s JOIN stats ON s.s_nationkey = stats.s_nationkey
    GROUP BY s.s_nationkey ORDER BY nationkey
    """,
    tags=("subquery", "decorrelation", "aggregation"),
)
def suppliers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated subquery `bal > (SELECT AVG(bal) ... same nation)`
    decorrelated by hand into one grouped aggregate joined back to the
    fact — the rewrite Catalyst performs for scalar correlated
    subqueries, made explicit so the plan is a keyed agg + one equi join
    (never a per-row subquery). The per-nation mean is the exact decimal
    sum divided once; the comparison is double vs double in the same
    IEEE sequence on both engines."""
    s = load_table(spark, sf_dir, "supplier")
    stats = s.groupBy("s_nationkey").agg(
        (F.sum(dec("s_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        ),
        F.count(F.lit(1)).alias("n"),
    )
    j = s.join(F.broadcast(stats), "s_nationkey")
    return (
        j.groupBy(F.col("s_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.max("n").cast("bigint").alias("n_suppliers"),
            F.count(
                F.when(
                    dec("s_acctbal").cast("double") > F.col("avg_bal"), 1
                )
            )
            .cast("bigint")
            .alias("n_above"),
            F.round(F.max("avg_bal"), 4).alias("avg_bal"),
        )
        .orderBy("nationkey")
    )


# --- window top-k per group (WindowGroupLimit) -----------------------------------


@query(
    "topk_parts_per_region_rank",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY region, l.l_partkey
    ), ranked AS (
      SELECT region, l_partkey, rev,
             RANK() OVER (PARTITION BY region
                          ORDER BY rev DESC, l_partkey) AS rk
      FROM rev
    )
    SELECT region, CAST(rk AS INT) AS rk,
           CAST(l_partkey AS BIGINT) AS partkey,
           CAST(rev AS DOUBLE) AS revenue
    FROM ranked WHERE rk <= 3 ORDER BY region, rk, partkey
    """,
    tags=("window", "top-k", "window-group-limit", "multi-join"),
)
def topk_parts_per_region_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per region through a rank()-filter window —
    the shape Spark compiles to WindowGroupLimit (each task keeps only
    its partial top-3 per region BEFORE the shuffle, so the window never
    sees the full per-region row set). Revenue is the exact decimal fold over a star join: the SF-growing
    supplier side is left to AQE, constant nation/region are broadcast; ties break on
    partkey so the cut is total."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)  # supplier grows with SF: AQE decides
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), "l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("rev"))
    )
    wk = W.partitionBy("region").orderBy(F.desc("rev"), "l_partkey")
    return (
        rev.withColumn("rk", F.rank().over(wk))
        .where(F.col("rk") <= 3)
        .select(
            "region",
            F.col("rk").cast("int").alias("rk"),
            F.col("l_partkey").cast("bigint").alias("partkey"),
            F.col("rev").cast("double").alias("revenue"),
        )
        .orderBy("region", "rk", "partkey")
    )


# --- filter: null-safe predicates -------------------------------------------------


@query(
    "events_nullif_distinct_screen",
    oracle="""
    WITH x AS (
      SELECT event_type,
             NULLIF(CAST(FLOOR(value) AS BIGINT) % 7, 0) AS a,
             NULLIF(CAST(FLOOR(value * 10) AS BIGINT) % 11, 0) AS b
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (a IS NOT DISTINCT FROM b) AS BIGINT)
             AS n_nullsafe_eq,
           CAST(COUNT(*) FILTER (a IS NULL AND b IS NULL) AS BIGINT)
             AS n_both_null,
           CAST(COUNT(*) FILTER ((a IS NULL AND b IS NOT NULL)
                                 OR (b IS NULL AND a IS NOT NULL)
                                 OR a > b) AS BIGINT) AS n_screen
    FROM x GROUP BY event_type ORDER BY event_type
    """,
    tags=("filter", "null-safe", "disjunctive", "three-valued-logic"),
)
def events_nullif_distinct_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Three-valued-logic screen: two NULLIF-derived keys compared with
    the null-safe operator (<=> / IS NOT DISTINCT FROM) next to an
    OR-of-ANDs disjunction that mixes IS NULL arms with a plain
    comparison — the predicate family where naive = silently drops
    NULL rows. All derived keys are exact integer arithmetic on FLOOR'd
    doubles, so both engines build identical NULL patterns; one scan,
    one aggregate."""
    e = load_table(spark, sf_dir, "events")
    a = F.nullif(
        F.floor(F.col("value")).cast("bigint") % 7, F.lit(0)
    )
    b = F.nullif(
        F.floor(F.col("value") * 10).cast("bigint") % 11, F.lit(0)
    )
    x = e.select("event_type", a.alias("a"), b.alias("b"))
    screen = (
        (F.col("a").isNull() & F.col("b").isNotNull())
        | (F.col("b").isNull() & F.col("a").isNotNull())
        | (F.col("a") > F.col("b"))
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count(F.when(F.col("a").eqNullSafe(F.col("b")), 1))
            .cast("bigint")
            .alias("n_nullsafe_eq"),
            F.count(F.when(F.col("a").isNull() & F.col("b").isNull(), 1))
            .cast("bigint")
            .alias("n_both_null"),
            F.count(F.when(screen, 1)).cast("bigint").alias("n_screen"),
        )
        .orderBy("event_type")
    )


# --- scalar datetime: ISO week census ----------------------------------------------


@query(
    "orders_iso_week_census",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(week FROM o_orderdate) AS INT) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders GROUP BY yr, iso_week ORDER BY yr, iso_week
    """,
    tags=("scalar", "datetime", "iso-week", "calendar"),
)
def orders_iso_week_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order census by (calendar year, ISO week-of-year) — the calendar
    extraction pair where engines disagree unless both speak ISO 8601
    (Spark's weekofyear and DuckDB's EXTRACT(week) both do; a
    Sunday-based week number would shear every January row). Boundary
    weeks deliberately stay split: 1997-01-01 lands in ISO week 1 of
    calendar year 1997 even though its ISO YEAR is 1997 — the grouping
    key is (year(), weekofyear()) on BOTH sides, so the cells match
    exactly. One scan, one aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("yr", "iso_week")
    )


# --- scalar string: part-name token census -------------------------------------------


@query(
    "part_name_token_census",
    oracle="""
    SELECT split_part(p_name, ' ', 2) AS noun,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT split_part(p_name, ' ', 1)) AS BIGINT)
             AS n_adjectives,
           CAST(MAX(LENGTH(split_part(p_name, ' ', 1))) AS INT)
             AS max_adj_len,
           MIN(UPPER(split_part(p_name, ' ', 1))) AS first_adj_upper,
           ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_price
    FROM part GROUP BY noun ORDER BY noun
    """,
    tags=("scalar", "string", "split", "census"),
)
def part_name_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function census over the two-token part names
    ('large bolt' → adjective 'large', noun 'bolt'): per noun, the
    distinct-adjective vocabulary, the longest adjective, the first
    adjective upper-cased (MIN of UPPER — deterministic, locale-free
    ASCII), and the exact-decimal mean price. split_part / length /
    upper behave identically across engines on this ASCII fixture."""
    p = load_table(spark, sf_dir, "part")
    adj = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    noun = F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
    return (
        p.select(
            noun.alias("noun"),
            adj.alias("adj"),
            dec("p_retailprice").alias("price"),
        )
        .groupBy("noun")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.count_distinct(F.col("adj")).cast("bigint").alias(
                "n_adjectives"
            ),
            F.max(F.length("adj")).cast("int").alias("max_adj_len"),
            F.min(F.upper("adj")).alias("first_adj_upper"),
            F.round(
                F.sum("price").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_price"),
        )
        .orderBy("noun")
    )


# --- scalar JSON: props key extraction ------------------------------------------------


@query(
    "events_props_k_decile_census",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v
      FROM events
    )
    SELECT CAST(k // 10 AS INT) AS k_decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM x GROUP BY k_decile ORDER BY k_decile
    """,
    tags=("scalar", "json", "extraction", "census"),
)
def events_props_k_decile_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JSON path extraction straight into integer arithmetic: the props
    payload's k field is pulled with a JSON-path accessor
    (get_json_object / json_extract_string — both return the unquoted
    scalar), cast to BIGINT and bucketed by decile. Counts and the
    6dp-decimal value sums are exact; NULL-k rows (absent key) would
    group under a NULL decile identically on both engines."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    x = e.select(
        "event_type",
        k.alias("k"),
        F.round("value", 6).cast("decimal(18,6)").alias("v"),
    )
    return (
        x.groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct("event_type").cast("bigint").alias("n_types"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .orderBy("k_decile")
    )


# --- sources: pruned-projection parquet roundtrip -------------------------------------


@query(
    "source_parquet_pruned_projection_roundtrip",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    WHERE o_totalprice > 150000
    GROUP BY priority ORDER BY priority
    """,
    tags=("sources", "parquet", "pushdown", "column-pruning"),
)
def source_parquet_pruned_projection_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Write a WIDE derivative of orders (five extra computed columns) to
    scratch parquet, then answer a 2-column question through it — the
    read must prune to exactly (o_orderpriority, o_totalprice) and push
    the price filter into the scan (ReadSchema + PushedFilters in the
    plan; tests/test_plans.py pins the shape for the layout family).
    The oracle answers the same question from the base table, proving
    the roundtrip neither duplicated nor dropped rows."""
    import os

    o = load_table(spark, sf_dir, "orders")
    path = scratch_dir("sources", sf_dir, "wide_orders")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    wide = o.select(
        "*",
        F.year("o_orderdate").alias("w_year"),
        F.month("o_orderdate").alias("w_month"),
        F.length("o_orderpriority").alias("w_prio_len"),
        (dec("o_totalprice") * 2).alias("w_double_price"),
        F.md5(F.col("o_orderkey").cast("string")).alias("w_key_md5"),
    )
    wide.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.where(F.col("o_totalprice") > 150000)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("priority")
    )


# --- sinks: dynamic partition overwrite -------------------------------------------


@query(
    "sink_overwrite_dynamic_partitions",
    oracle="""
    WITH final AS (
      SELECT o_orderkey, o_totalprice,
             EXTRACT(year FROM o_orderdate) AS yr
      FROM orders WHERE EXTRACT(year FROM o_orderdate) <> 1995
      UNION ALL
      SELECT o_orderkey, o_totalprice,
             EXTRACT(year FROM o_orderdate) AS yr
      FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        AND o_totalprice > 200000
    )
    SELECT CAST(yr AS INT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM final GROUP BY yr ORDER BY yr
    """,
    tags=("sinks", "partitioned", "dynamic-overwrite", "layout"),
)
def sink_overwrite_dynamic_partitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DYNAMIC partition overwrite — the idempotent-backfill write
    pattern: a full year-partitioned write, then a second overwrite
    batch containing ONLY year=1995 rows (filtered to the high-value
    subset). Dynamic mode must replace exactly the partitions present in
    the incoming frame and leave every other year untouched (static mode
    would truncate the whole table first). The read-back census per year
    proves it: 1995 shrinks to the filtered rows, all other years keep
    their original counts."""
    import os

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("yr"),
    )
    path = scratch_dir("sinks", sf_dir, "dynover_orders")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    o.write.mode("overwrite").partitionBy("yr").parquet(path)
    (
        o.where((F.col("yr") == 1995) & (F.col("o_totalprice") > 200000))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("yr")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.groupBy(F.col("yr").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("yr")
    )


# --- python datasource: edge reciprocity ---------------------------------------------


@query(
    "source_refgraph_edge_reciprocity",
    oracle="""
    WITH e AS (
      SELECT i + 1 AS src, j + 1 AS dst
      FROM (SELECT unnest(range(0, 60)) AS i)
      CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
      WHERE (i * 17 + j * 3) % 11 = 0 AND i <> j
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(*) FILTER (EXISTS (
             SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src
           )) AS BIGINT) AS n_reciprocal,
           CAST(COUNT(DISTINCT src) AS BIGINT) AS n_sources,
           ROUND(CAST(COUNT(*) FILTER (EXISTS (
             SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src
           )) AS DOUBLE) / COUNT(*), 6) AS reciprocity
    FROM e
    """,
    tags=("sources", "datasource-api", "reference-format", "reciprocity"),
)
def source_refgraph_edge_reciprocity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Edge reciprocity THROUGH the Spark 4 Python DataSource: the same
    60-vertex arithmetic adjacency matrix as the degree census
    ((17i+3j) mod 11 = 0, i≠j) is written in the reference text format,
    read back through spark.read.format('reference_graph') in 8 real
    input partitions, and self-joined to count edges whose reverse also
    exists — proving the custom source feeds Spark's join machinery,
    not just scans. The oracle regenerates the matrix arithmetically."""
    import os

    from distributed_graph_database_system_spark.sources.refgraph import (
        ensure_registered,
        write_reference_file,
    )

    n = 60
    edges = [
        (i + 1, j + 1)
        for i in range(n)
        for j in range(n)
        if (i * 17 + j * 3) % 11 == 0 and i != j
    ]
    path = scratch_dir("refgraph", sf_dir, "reciprocity_graph.txt")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_reference_file(path, n, edges)
    ensure_registered(spark)
    src = (
        spark.read.format("reference_graph")
        .option("numPartitions", "8")
        .load(path)
    )
    rev = src.select(
        F.col("src").alias("r_src"), F.col("dst").alias("r_dst")
    )
    marked = src.join(
        rev,
        (src.dst == rev.r_src) & (src.src == rev.r_dst),
        "left_semi",
    )
    tot = src.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.count_distinct("src").cast("bigint").alias("n_sources"),
    )
    rec = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reciprocal")
    )
    return tot.crossJoin(F.broadcast(rec)).select(
        "n_edges",
        "n_reciprocal",
        "n_sources",
        F.round(
            F.col("n_reciprocal").cast("double") / F.col("n_edges"), 6
        ).alias("reciprocity"),
    )


# --- streaming twin: per-user session windows ------------------------------------------


@query(
    "stream_session_user_gap30m",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), g AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM s
    ), sess AS (
      SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n_events,
             epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us
      FROM g GROUP BY user_id, sess
    )
    SELECT n_events,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(span_us) AS BIGINT) AS span_us_total
    FROM sess GROUP BY n_events ORDER BY n_events
    """,
    tags=("streaming", "session-window", "per-key", "gaps-and-islands"),
)
def stream_session_user_gap30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of per-user session windows with a 30-minute gap: the
    census of session SIZES (how many sessions have n events, how many
    users produce them, and the total in-session span). Spark's
    session_window end = last event + gap, so the span subtracts the
    gap padding back out; the oracle rebuilds the identical sessions by
    gaps-and-islands (a new island exactly when the inter-event gap
    >= 30 min — session_window's half-open [start, last+gap) semantics).
    Session assignment depends only on per-user timestamp order, so both
    engines build the same islands."""
    e = load_table(spark, sf_dir, "events")
    gap_us = 30 * 60 * 1_000_000
    sess = (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            "n_events",
            (
                F.unix_micros(F.col("w.end"))
                - F.unix_micros(F.col("w.start"))
                - F.lit(gap_us)
            ).alias("span_us"),
        )
    )
    return (
        sess.groupBy("n_events")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.sum("span_us").cast("bigint").alias("span_us_total"),
        )
        .orderBy("n_events")
    )


# --- graph: G8 grid-with-chord fixture ----------------------------------------------

# G8: directed 4x4 grid (vertex id = 4*row + col + 1, edges right and
# down), plus a diagonal chord 1->6 and a back edge 16->1 closing the
# whole lattice into a cycle — deeper and wider than G7 (max BFS level 5,
# two geodesic "fronts" meeting mid-grid) and a four-leaf DFS tail.
G8 = (
    [(v, v + 1) for v in range(1, 17) if v % 4 != 0]
    + [(v, v + 4) for v in range(1, 13)]
    + [(1, 6), (16, 1)]
)


def _g8_edges(spark: SparkSession) -> DataFrame:
    from distributed_graph_database_system_spark.operators.graph import (
        EDGE_SCHEMA,
    )

    return spark.createDataFrame(G8, EDGE_SCHEMA)


@query(
    "graph_bfs_g8",
    oracle=(
        "SELECT CAST(v AS BIGINT) AS vid, CAST(l AS INT) AS level FROM "
        "(VALUES (1,0),(2,1),(5,1),(6,1),(3,2),(7,2),(9,2),(10,2),"
        "(4,3),(8,3),(11,3),(13,3),(14,3),(12,4),(15,4),(16,5)) AS t(v, l)"
    ),
    tags=("graph", "bfs", "grid-with-chord"),
)
def graph_bfs_g8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS level order on the G8 grid-with-chord from vertex 1: the 1→6
    chord pulls 6 up to level 1, so the two wavefronts (top row / left
    column vs the chord's) meet mid-grid and 16 — despite its back edge
    into the already-visited root — sits at level 5. Golden verified
    against the tests' pure-python reference (FIXTURES.md §B
    discipline)."""
    from distributed_graph_database_system_spark.operators.graph import bfs

    return bfs(_g8_edges(spark), start=1)


@query(
    "graph_dfs_g8",
    oracle=(
        "SELECT CAST(v AS BIGINT) AS vid FROM "
        "(VALUES (13),(14),(15),(16)) AS t(v)"
    ),
    tags=("graph", "dfs", "grid-with-chord"),
)
def graph_dfs_g8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFS leaf-set on G8 from vertex 1 (ascending-neighbor canonical
    order): the depth-first plunge 1→2→3→4→8→12→16 makes 16 the first
    zero-spawn leaf (its only edge closes back to the visited root),
    then each retreating branch ends at the bottom row — 15, 14, 13 —
    every other vertex spawns at least one child. Golden verified
    against the tests' pure-python reference."""
    from distributed_graph_database_system_spark.operators.graph import (
        dfs_leaves,
    )

    return dfs_leaves(_g8_edges(spark), start=1)


# --- multimodal: WAV energy census ---------------------------------------------------


@query(
    "multimodal_wav_energy_census",
    oracle="""
    WITH docs AS (
      SELECT doc_id AS d FROM documents WHERE doc_id % 16 = 0
    ), samp AS (
      SELECT d, k, ((k * 37 + d * 11) % 201) - 100 AS s, k // 100 AS w
      FROM docs, LATERAL (
        SELECT unnest(range(0, 160 + (d % 3) * 40)) AS k
      )
    ), win AS (
      SELECT d, w, CAST(COUNT(*) AS BIGINT) AS n_in_w,
             CAST(SUM(s * s) AS BIGINT) AS energy
      FROM samp GROUP BY d, w
    )
    SELECT CAST(d AS BIGINT) AS clip_id,
           CAST(SUM(n_in_w) AS BIGINT) AS n_samples,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(energy) AS BIGINT) AS total_energy,
           CAST(MAX(energy) AS BIGINT) AS peak_energy
    FROM win GROUP BY clip_id ORDER BY clip_id
    """,
    tags=("llm", "multimodal", "audio", "wav", "mapinpandas"),
)
def multimodal_wav_energy_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """END-TO-END audio path: deterministic 16-bit PCM WAVs are
    synthesized per selected document (sample k of clip d is
    ((37k + 11d) mod 201) − 100), DECODED by the stdlib WAV parser
    inside Arrow-batched mapInPandas, segmented into 100-sample energy
    frames (audio_energy_windows — exact integer Σs²), and censused per
    clip with plain JVM aggregates. The oracle never sees a byte of
    RIFF: it regenerates the samples arithmetically and must agree on
    every energy integer — any decode/segmentation bug breaks the hash."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from distributed_graph_database_system_spark.operators.multimodal import (
        audio_energy_windows,
        make_wav,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 16 == 0
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
                n = 160 + (d % 3) * 40
                rows.append(
                    {
                        "media_id": d,
                        "kind": "audio",
                        "content": make_wav(
                            n,
                            sample_fn=lambda k, d=d: ((k * 37 + d * 11) % 201)
                            - 100,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    media = docs.select("doc_id").mapInPandas(synth, schema=schema)
    wins = audio_energy_windows(media, window=100)
    return (
        wins.groupBy(F.col("media_id").cast("bigint").alias("clip_id"))
        .agg(
            F.sum("n_in_w").cast("bigint").alias("n_samples"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum("energy").cast("bigint").alias("total_energy"),
            F.max("energy").cast("bigint").alias("peak_energy"),
        )
        .orderBy("clip_id")
    )


# --- llm pipeline: temperature-scaled mix plan -----------------------------------------


@query(
    "sample_temperature_mix_plan",
    oracle="""
    WITH c AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    ), w AS (
      SELECT source, n_docs,
             CAST(ROUND(POW(n_docs, 0.7), 6) AS DECIMAL(18,6)) AS wt
      FROM c
    ), t AS (SELECT SUM(wt) AS total FROM w)
    SELECT source, n_docs, CAST(wt AS DOUBLE) AS weight,
           ROUND(CAST(wt AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share
    FROM w CROSS JOIN t ORDER BY source
    """,
    tags=("llm", "pipeline", "sampling", "mix-plan", "temperature"),
)
def sample_temperature_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing plan (the multinomial upsampling
    recipe from multilingual-pretraining practice: sample source i with
    probability ∝ n_i^α, α = 0.7, flattening the head and boosting the
    tail). The complement of corpus_mix_plan (queries/pipeline.py),
    which takes GIVEN target weights and solves for downsample rates —
    here the weights themselves are DERIVED from the counts by the
    temperature law. Per-source weights round to 6dp DECIMAL so the
    normalizing sum is order-free, and each share is one double
    division. Two tiny aggregates over the per-source counts; the plan
    feeds the md5-deterministic samplers (sample_class_balanced_docs)
    downstream."""
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w = c.select(
        "source",
        "n_docs",
        F.round(F.pow(F.col("n_docs").cast("double"), F.lit(0.7)), 6)
        .cast("decimal(18,6)")
        .alias("wt"),
    )
    t = w.agg(F.sum("wt").alias("total"))
    return (
        w.crossJoin(F.broadcast(t))
        .select(
            "source",
            "n_docs",
            F.col("wt").cast("double").alias("weight"),
            F.round(
                F.col("wt").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("source")
    )


# --- aggregation: exact mode ------------------------------------------------------


@query(
    "lineitem_quantity_mode_stats",
    oracle="""
    WITH c AS (
      SELECT CAST(l_quantity AS BIGINT) AS q, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY q
    ), m AS (SELECT MAX(n) AS top FROM c)
    SELECT CAST(MIN(CASE WHEN c.n = m.top THEN c.q END) AS BIGINT)
             AS mode_qty,
           CAST(MAX(m.top) AS BIGINT) AS mode_count,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_qty,
           CAST(SUM(c.n) AS BIGINT) AS n_rows
    FROM c CROSS JOIN m
    """,
    tags=("aggregation", "mode", "histogram"),
)
def lineitem_quantity_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL mode of line-item quantity with a deterministic tie
    rule (smallest value among maximal counts — engines' built-in mode()
    leaves ties unspecified, so the rule is explicit on both sides):
    one histogram aggregate (50 cells however large the fact), a scalar
    max, and one pass picking the witness. The scalar sibling of
    agg_mode_exact (queries/relational.py), which computes PER-GROUP
    modes via struct-argmax; the global form needs the two-fold shape
    because there is no group to argmax within. No sort, no window."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("q")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    m = c.agg(F.max("n").alias("top"))
    return c.crossJoin(F.broadcast(m)).agg(
        F.min(F.when(F.col("n") == F.col("top"), F.col("q")))
        .cast("bigint")
        .alias("mode_qty"),
        F.max("top").cast("bigint").alias("mode_count"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_qty"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )
