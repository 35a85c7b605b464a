"""Adapted TPC-H shapes q2/q4/q8/q9/q11/q15/q16/q17/q19/q20/q21/q22 — the
subquery half of the benchmark, re-expressed for this fixture schema (no
partsupp / commitdate / container columns; see TESTDATA.md) and decorrelated
the way a distributed planner wants them. With these, every TPC-H query
q1-q22 has an adapted twin registered.

The reference has none of this surface (SURVEY.md §2.1 — its four ops are
graph add/modify/DFS/BFS, `client.c:26-31`); these queries exist for the
north-star relational engine. Every correlated subquery in the classic
formulations is decorrelated into aggregate→join shapes so Catalyst plans
hash joins instead of per-row rewrites:

- scalar subquery over the whole input (q11, q15, q22) → one-row aggregate
  cross-joined (broadcast — it is 1 row) into the filter;
- correlated scalar aggregate (q2, q17) → groupBy on the correlation key,
  then an equi-join back;
- EXISTS (q4) → left-semi join; NOT IN with non-null keys (q16) →
  left-anti join.

Money math follows the repo-wide oracle-determinism rule (helpers.py):
DECIMAL-exact sums surfaced as DOUBLE, ratios as double divisions of exact
sums, ROUND only at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import davg, dec, dsum
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table

def _revenue() -> F.Column:
    # Built lazily per call: F.lit needs an active SparkContext, so a
    # module-level constant would break import before session start.
    one = F.lit(1).cast("decimal(8,2)")
    return dec("l_extendedprice") * (one - dec("l_discount", 8, 2))


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, MIN(cost) AS min_cost FROM cost GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, s_name, CAST(c.cost AS DOUBLE) AS min_cost
    FROM part
    JOIN cost c ON p_partkey = c.l_partkey
    JOIN best b ON c.l_partkey = b.l_partkey AND c.cost = b.min_cost
    JOIN supplier ON c.l_suppkey = s_suppkey
    WHERE p_type = 'SMALL' AND p_size <= 10
    """,
    tags=("relational", "tpch", "correlated-min"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: cheapest supplier per part. The classic correlated
    ``cost = (SELECT MIN ...)`` subquery decorrelated into agg → agg → two
    equi-joins; the min join key is DECIMAL so the equality is exact (the
    reason the cast to DOUBLE happens only in the output). supplier grows
    linearly with SF (~10^9 rows at the 100 TB north star) so its join
    strategy is left to AQE — broadcast at fixture scale, shuffle at
    cluster scale; part filter pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    )
    supp = load_table(spark, sf_dir, "supplier")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("cost")
    )
    # Rename the grouping key: `best` derives from `cost`, so joining on
    # cost.l_partkey == best.l_partkey would resolve both sides to the SAME
    # attribute (trivially true) and silently degrade the join to a
    # price-only match across different parts.
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min("cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    return (
        p.join(cost, p.p_partkey == cost.l_partkey)
        .join(
            best,
            (cost.l_partkey == F.col("b_partkey"))
            & (cost.cost == F.col("min_cost")),
        )
        .join(supp, cost.l_suppkey == supp.s_suppkey)
        .select(
            "p_partkey", "p_name", "s_name", F.col("cost").cast("double").alias("min_cost")
        )
    )


@query(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1999-07-01' AND o_orderdate < DATE '1999-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o_orderpriority
    """,
    tags=("relational", "tpch", "exists"),
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS with a correlated comparison → left-semi join
    whose condition carries the equi key (hash join) plus the date
    inequality as a residual — never a nested-loop probe."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1999-07-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1999-10-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           ROUND(
             CAST(SUM(CASE WHEN sn.n_name = 'NATION_7'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l_discount AS DECIMAL(8,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE),
             4) AS mkt_share
    FROM customer
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN region     ON cn.n_regionkey = r_regionkey
    JOIN orders     ON o_custkey = c_custkey
    JOIN lineitem   ON l_orderkey = o_orderkey
    JOIN supplier   ON l_suppkey = s_suppkey
    JOIN nation sn  ON s_nationkey = sn.n_nationkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '2000-01-01'
    GROUP BY o_year
    """,
    tags=("relational", "tpch", "market-share"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: national market share = conditional-sum / sum per
    year, over a 7-way join where nation appears twice (customer side and
    supplier side — two broadcast aliases, no self-join shuffle)."""
    cust = load_table(spark, sf_dir, "customer")
    cn = load_table(spark, sf_dir, "nation").alias("cn")
    sn = load_table(spark, sf_dir, "nation").alias("sn")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    vol = _revenue()
    nat_vol = F.when(F.col("sn.n_name") == "NATION_7", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        cust.join(F.broadcast(cn), cust.c_nationkey == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == region.r_regionkey)
        .join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat_vol).cast("double") / F.sum(vol).cast("double"), 4
            ).alias("mkt_share")
        )
    )


@query(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    """,
    tags=("relational", "tpch", "profit"),
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: product-line profit by supplier nation and order
    year. The selective p_name LIKE filter lands on the smallest table and
    prunes the lineitem join early; nation broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_revenue()).cast("double").alias("profit"))
    )


@query(
    "q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM pv
    WHERE value > (SELECT SUM(value) * 0.001 FROM pv)
    """,
    tags=("relational", "tpch", "having-scalar-subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: parts whose inventory value exceeds a fraction of
    the TOTAL value — a scalar subquery over the same aggregate.
    Decorrelated: the one-row global total is cross-joined (broadcast by
    construction) into the per-part filter. The per-part aggregate feeds
    both branches; it is tiny (one row per part), so the double computation
    collapses into a ReusedExchange in practice and is cheap regardless.
    The threshold comparison stays in DECIMAL (value > total*0.001 exact) —
    only the output is cast to DOUBLE."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    pv = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("value"))
    )
    total = pv.agg((F.sum("value") * F.lit(0.001)).alias("threshold"))
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1999-01-01' AND l_shipdate < DATE '1999-07-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    tags=("relational", "tpch", "scalar-max"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: supplier(s) achieving the maximum half-year revenue.
    The view + scalar MAX subquery decorrelates to agg → one-row max →
    broadcast cross-join filter. Equality is on the exact DECIMAL revenue
    (double equality across engines would be a determinism bug)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1999-07-01").cast("date"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_revenue()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q16_supplier_part_types",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29, 33, 37)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("relational", "tpch", "not-in-distinct"),
)
def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: distinct-supplier counts per part class, excluding a
    supplier denylist. NOT IN over non-null keys = left-anti join (broadcast:
    the denylist is a filtered dimension); COUNT(DISTINCT) expands to the
    standard two-phase distinct aggregate."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29, 33, 37))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(l_quantity)) AS threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN avg_qty a ON a.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#5' AND l_quantity < a.threshold
    """,
    tags=("relational", "tpch", "correlated-avg"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 shape: revenue of below-average-quantity line items — the
    canonical correlated scalar AVG subquery, decorrelated to a per-part
    aggregate equi-joined back to the fact (the rewrite every OLAP planner
    performs; here it is explicit). Threshold math follows helpers.davg:
    exact decimal sum → double ÷ count, then one double multiply by 0.2 —
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#5")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity")).alias("threshold")
    ).withColumnRenamed("l_partkey", "a_partkey")
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .join(avg_qty, F.col("a_partkey") == li.l_partkey)
        .where(li.l_quantity < F.col("threshold"))
        .agg(
            F.round(dsum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("relational", "tpch", "disjunctive"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: OR-of-AND predicate blocks spanning both join sides.
    The join key stays a clean equi hash join; the disjunction is a residual
    filter. Catalyst also derives the implied single-side prefilters
    (p_brand IN (...), l_quantity BETWEEN 1 AND 30) and pushes them to the
    scans — visible as PushedFilters in PLANS.md."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    block = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .where(
            block("Brand#1", 5, 1, 11)
            | block("Brand#2", 10, 10, 20)
            | block("Brand#3", 15, 20, 30)
        )
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q20_dominant_suppliers",
    oracle="""
    WITH qty AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      FROM lineitem
      WHERE l_shipdate >= DATE '1999-01-01' AND l_shipdate < DATE '2000-01-01'
      GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey AS t_partkey, SUM(sq) AS tq FROM qty GROUP BY l_partkey
    )
    SELECT s_suppkey, s_name, COUNT(*) AS n_parts
    FROM qty JOIN tot ON l_partkey = t_partkey
    JOIN part ON p_partkey = l_partkey AND p_name LIKE '%gear%'
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE CAST(sq AS DOUBLE) > 0.5 * CAST(tq AS DOUBLE)
    GROUP BY s_suppkey, s_name
    """,
    tags=("relational", "tpch", "nested-agg-share"),
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape, adapted (no partsupp/availqty in the fixture): for
    parts whose name matches a pattern, suppliers who shipped more than half
    of that part's 1999 volume. The classic ``ps_availqty > 0.5 * (SELECT
    SUM(l_quantity) ...)`` correlated scalar is decorrelated into two
    stacked aggregates — per (part, supplier) then per part, the second a
    cheap rollup of the first with NO second scan of lineitem — joined back
    on the part key. The share comparison is a residual on an equi join;
    `part` is filtered at the scan and broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("sq")
    )
    tot = (
        qty.groupBy("l_partkey")
        .agg(F.sum("sq").alias("tq"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        qty.join(tot, qty.l_partkey == F.col("t_partkey"))
        .where(F.col("sq").cast("double") > 0.5 * F.col("tq").cast("double"))
        .join(p, qty.l_partkey == p.p_partkey)
        .join(supp, qty.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_parts"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey LIMIT 10
    """,
    tags=("relational", "tpch", "exists-anti-correlated"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape, adapted (no commit/receipt dates): suppliers who
    were the SOLE late shipper on finished multi-supplier orders, "late" =
    shipped > 60 days after the order date. The doubly-correlated
    EXISTS / NOT EXISTS pair becomes a left-semi then a left-anti join,
    both keyed on the order (hash joins) with the supplier inequality as a
    residual — the decorrelation Catalyst itself applies to such
    subqueries, written explicitly so the plan is stable. Top-10 by wait
    count → TakeOrderedAndProject; s_suppkey tiebreak keeps the limit
    deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .select("l_orderkey", "l_suppkey")
    )
    other_any = li.select(
        F.col("l_orderkey").alias("a_orderkey"),
        F.col("l_suppkey").alias("a_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("b_orderkey"),
        F.col("l_suppkey").alias("b_suppkey"),
    )
    sole_late = (
        late.join(
            other_any,
            (late.l_orderkey == F.col("a_orderkey"))
            & (late.l_suppkey != F.col("a_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (late.l_orderkey == F.col("b_orderkey"))
            & (late.l_suppkey != F.col("b_suppkey")),
            "left_anti",
        )
    )
    return (
        sole_late.join(supp, sole_late.l_suppkey == supp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(10)
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH cutoff AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(c_acctbal) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, cutoff
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey
      )
    GROUP BY c_nationkey
    """,
    tags=("relational", "tpch", "anti-scalar"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: rich customers with no orders — a global scalar
    average (one-row broadcast cross-join) combined with NOT EXISTS
    (left-anti join on the order keys, distinct-projected first so the anti
    join probes a set, not the fact table)."""
    cust = load_table(spark, sf_dir, "customer")
    cutoff = cust.where(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    okeys = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ok")
    ).distinct()
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(okeys, cust.c_custkey == F.col("ok"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
