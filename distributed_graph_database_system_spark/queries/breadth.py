"""Breadth coverage: JSON/map/higher-order scalar families, pandas-UDF
aggregation, csv/json source round-trips, approximate percentiles
(SURVEY.md §2.2 rows the round-1 surface left partial)."""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries import llm_goldens
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table

# getattr, not a direct import: the constant appears in the GENERATED module
# only after scripts/gen_llm_goldens.py has run once with this query
# registered (the generator itself imports this module — the fallback keeps
# that first bootstrap import alive; the parity sweep never sees it).
AGG_HLL_ROLLUP_GOLDEN = getattr(
    llm_goldens, "AGG_HLL_ROLLUP_GOLDEN", "SELECT 1 AS bootstrap WHERE FALSE"
)
AGG_HLL_SLIDING7_GOLDEN = getattr(
    llm_goldens, "AGG_HLL_SLIDING7_GOLDEN", "SELECT 1 AS bootstrap WHERE FALSE"
)
from distributed_graph_database_system_spark.sources.io import (
    read_csv,
    read_json,
    write_csv,
    write_json,
)

# --- JSON family: from_json / to_json / json_tuple -------------------------


@query(
    "json_struct_funcs",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed,
           CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL
                THEN '{}'
                ELSE CAST(to_json({'k': TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)}) AS VARCHAR)
           END AS normalized_json,
           json_extract_string(props, '$.k') AS k_text
    FROM events
    """,
    tags=("scalar", "json"),
)
def json_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json → typed struct → to_json round-trip (both engines normalize
    to the compact {"k":N} form; Spark's to_json omits null fields, so the
    oracle maps null k to '{}' and uses TRY_CAST to mirror Spark's silent
    null on non-numeric values), plus json_tuple extraction."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        parsed["k"].alias("k_parsed"),
        F.to_json(parsed).alias("normalized_json"),
        F.json_tuple("props", "k").alias("k_text"),
    )


@query(
    "variant_semi_structured",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS INTEGER) AS max_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT as the semi-structured fast path: props parses
    ONCE into the binary variant encoding (parse_json), typed fields
    come out with try_variant_get — the open-schema alternative to
    from_json's fixed struct, and the engine feature that makes JSON
    columns first-class at scale (shredded binary representation, no
    per-access string re-parse). The aggregate proves the typed
    extraction end-to-end against DuckDB's JSON path functions on the
    same integers."""
    e = load_table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    k = F.try_variant_get("v", "$.k", "int")
    return (
        v.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )


@query(
    "sql_udf_revenue",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(8,2))
                       - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE)
             AS net_revenue
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("udf", "sql-udf"),
)
def sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL-defined scalar function (CREATE FUNCTION ... RETURN
    expr) — reusable business logic that lives in the CATALOG, not in
    application code, and stays on the FAST path: the body is a pure SQL
    expression, so Catalyst inlines it into the plan (whole-stage
    codegen, no Python boundary, unlike a @udf). The function takes and
    returns DECIMALs so the q1 money discipline holds INSIDE the UDF —
    the first double-typed draft of this query drifted by cents against
    the oracle purely from double→decimal rounding differences, exactly
    the class of bug the discipline exists to prevent."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price("
        "p DECIMAL(18,2), d DECIMAL(8,2)) "
        "RETURNS DECIMAL(28,4) RETURN p * (CAST(1 AS DECIMAL(8,2)) - d)"
    )
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_sql_udf_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(disc_price(CAST(l_extendedprice AS DECIMAL(18,2)),
                                   CAST(l_discount AS DECIMAL(8,2))))
                    AS DOUBLE) AS net_revenue
        FROM _sql_udf_lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


# --- Map family ------------------------------------------------------------


@query(
    "map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(map_keys(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}), ',')
             AS keys_csv,
           map_extract(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}, 'type')[1]
             AS type_val,
           CAST(cardinality(MAP {'type': event_type, 'uid': CAST(user_id AS VARCHAR)}) AS INT)
             AS m_size
    FROM events
    """,
    tags=("scalar", "map"),
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("m_size"),
    )


# --- Higher-order array functions (transform/filter/aggregate/zip_with) ----


@query(
    "higher_order_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(list_sum(list_transform(range(1, l_linenumber + 3), x -> x * x)) AS BIGINT)
             AS sum_sq,
           CAST(len(list_filter(range(1, l_linenumber + 3), x -> x % 2 = 0)) AS INT)
             AS n_even,
           CAST(list_sum(list_transform(range(1, l_linenumber + 3), x -> x * (x + 10))) AS BIGINT)
             AS zip_dot
    FROM lineitem
    """,
    tags=("scalar", "array", "higher-order"),
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform + aggregate + filter + zip_with over integer sequences —
    exact arithmetic, so cross-engine comparable bit-for-bit. (Float
    higher-order use lives in the cosine/similarity operators.)"""
    li = load_table(spark, sf_dir, "lineitem")
    seq = F.sequence(F.lit(1), F.col("l_linenumber") + 2)
    shifted = F.transform(seq, lambda x: x + 10)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.aggregate(
            F.transform(seq, lambda x: (x * x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.size(F.filter(seq, lambda x: x % 2 == 0)).alias("n_even"),
        F.aggregate(
            F.zip_with(seq, shifted, lambda x, y: (x * y).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("zip_dot"),
    )


# --- Grouped-aggregate pandas UDF ------------------------------------------


@query(
    "pandas_udf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 2) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udf", "pandas", "aggregation"),
)
def pandas_udf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (Arrow-batched numpy reduction per group).
    Kept off hot paths in the rest of the engine — this query exists to
    cover the UDAF surface. Rounded to 2dp: numpy pairwise summation vs the
    oracle's sequential sum differ only at ~1e-10 relative error."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(weighted_avg("l_extendedprice", "l_quantity"), 2).alias(
            "weighted_avg_price"
        )
    )


# --- CSV / JSON source round-trips -----------------------------------------

def _io_path(sf_dir: str, name: str) -> str:
    """Per-process, full-path-keyed sink dir (shared convention + exit-time
    cleanup live in helpers.scratch_dir)."""
    from distributed_graph_database_system_spark.queries.helpers import scratch_dir

    return scratch_dir("io", sf_dir, name)


@query(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("source", "csv"),
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → csv sink → csv scan (explicit schema) → aggregate; matching
    the oracle run directly on the parquet proves the csv write/read path is
    lossless for the projected columns."""
    path = _io_path(sf_dir, "orders_csv")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    write_csv(o, path)
    back = read_csv(
        spark, path, "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
    )
    from distributed_graph_database_system_spark.queries.helpers import dsum

    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@query(
    "source_json_roundtrip",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("source", "json"),
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _io_path(sf_dir, "customer_json")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    write_json(c, path)
    back = read_json(
        spark, path, "c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE"
    )
    from distributed_graph_database_system_spark.queries.helpers import dsum

    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), dsum("c_acctbal").alias("total_bal")
    )


# --- Approximate percentiles (the at-scale twin of agg_median) -------------


@query("agg_median_approx", oracle=None, tags=("aggregation", "percentile", "approx"))
def agg_median_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (t-digest-style sketch, bounded memory per group) —
    the 100 TB replacement for exact percentile(). Approximate → rows-only
    here; tests/test_breadth.py asserts ≤ 1-quantile-step error vs exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, 10_000).alias("median_qty_approx"),
        F.percentile_approx("l_quantity", 0.9, 10_000).alias("p90_qty_approx"),
    )


# --- Explode / posexplode --------------------------------------------------


@query(
    "explode_tokens",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), ex AS (
      SELECT doc_id,
             unnest(list_transform(range(1, LEAST(len(t), 5) + 1),
                    i -> {'pos': i, 'tok': t[CAST(i AS INT)]})) AS u
      FROM toks
    )
    SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS tok FROM ex
    """,
    tags=("scalar", "explode"),
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first 5 tokens per document — the row-generating
    lateral-view operator. Fan-out happens distributed on each partition."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.slice(F.split("text", " "), 1, 5)
    return d.select(
        "doc_id", F.posexplode(toks).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")


# --- Skew-safe salted join --------------------------------------------------


@query(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "skew", "salting"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted SHUFFLE JOIN — the join-side skew mitigation (agg_salted_skew
    covers the aggregation side): the fact side gets a deterministic salt
    in [0, 8) per row, the build side is replicated 8× with every salt
    value (explode of a literal range — 8× a bounded dimension, not 8× the
    fact), and the join key becomes (key, salt) — a hot orderkey's rows now
    land on 8 reducers instead of one. Provably identical to the unsalted
    join (the oracle): every fact row still meets exactly one copy of its
    match. AQE's skewedJoin handles post-hoc partition splitting; explicit
    salting is the plan-level guarantee when one KEY (not partition) is
    hot. Salt comes from xxhash64 of the fact's unique id — deterministic,
    no RNG state, replay-safe."""
    from distributed_graph_database_system_spark.queries.helpers import dsum

    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(n_salt)).cast("int"),
    )
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        li.join(orders, (li["l_orderkey"] == orders["o_orderkey"]) & (li["_salt"] == orders["_salt"]))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )


# --- Window distribution functions ------------------------------------------


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT c_nationkey, c_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "distribution"),
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution window family (percent_rank / cume_dist / ntile)
    per nation. The ORDER BY includes the unique key: ntile's assignment
    among tied acctbals is order-dependent, so only a TOTAL order makes the
    result an engine-independent function of the data (same discipline as
    listagg WITHIN GROUP)."""
    from pyspark.sql import Window as W

    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "agg_grouping_flags",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(GROUPING(c_nationkey) AS INTEGER) AS g_nation,
           CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_segment,
           COUNT(*) AS n
    FROM customer GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    """,
    tags=("aggregation", "grouping-sets"),
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() flags — the standard way consumers tell a
    subtotal row's NULL ('all segments') from a data NULL. Flags, not
    grouping_id(): per-column ints are bit-order-independent across
    engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.rollup("c_nationkey", "c_mktsegment").agg(
        F.grouping("c_nationkey").cast("int").alias("g_nation"),
        F.grouping("c_mktsegment").cast("int").alias("g_segment"),
        F.count("*").alias("n"),
    )


# --- Data-quality constraint checks -----------------------------------------


@query(
    "dq_constraint_checks",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders) AS n_orders,
      (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS dup_orderkeys,
      (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o
         ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders
         WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS bad_status_rows,
      (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS nonpositive_price_rows
    """,
    tags=("dq", "constraints", "profiling"),
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality suite (the Deequ/expectations pattern) in
    TWO jobs regardless of constraint count: every single-table check is an
    aggregate expression of ONE orders scan (uniqueness via count vs
    count_distinct, accepted values and range checks via conditional
    sums), and referential integrity is ONE anti-join count. At 100 TB the
    anti-join is the only shuffle, and broadcast-ability follows the dim
    side as usual; checks never become N table scans."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    single_pass = o.agg(
        F.count("*").alias("n_orders"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup_orderkeys"),
        F.sum(
            (~F.col("o_orderstatus").isin("O", "F", "P")).cast("bigint")
        ).alias("bad_status_rows"),
        F.sum((F.col("o_totalprice") <= 0).cast("bigint")).alias(
            "nonpositive_price_rows"
        ),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    return single_pass.crossJoin(orphans).select(
        "n_orders",
        "dup_orderkeys",
        "orphan_lineitems",
        "bad_status_rows",
        "nonpositive_price_rows",
    )


# --- SCD2 changeset apply ----------------------------------------------------


@query(
    "scd2_apply_segment_change",
    oracle="""
    WITH changes AS (
      SELECT c_custkey, 'NEW_' || c_mktsegment AS new_segment,
             TIMESTAMP '1996-01-01 00:00:00' AS eff
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c.c_custkey, c.c_mktsegment AS segment,
           TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
           ch.eff AS valid_to,
           (ch.c_custkey IS NULL) AS is_current
    FROM customer c LEFT JOIN changes ch USING (c_custkey)
    UNION ALL
    SELECT c_custkey, new_segment AS segment, eff AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM changes
    """,
    tags=("scd2", "versioning", "merge"),
)
def scd2_apply_segment_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension apply: a changeset (here derived
    deterministically from the fixture — every 7th customer gets a new
    market segment effective 1996-01-01) closes the current version
    (valid_to = effective date) and appends a new open version. One
    broadcast-able left join + a union — O(dim + changes), no window, no
    full rewrite of unchanged keys' history. The same shape MERGEs into a
    versioned dimension at any scale; snapshot_diff_corpus is the inverse
    operator (derive the changeset from two snapshots)."""
    c = load_table(spark, sf_dir, "customer")
    eff = F.lit("1996-01-01 00:00:00").cast("timestamp")
    changes = c.where(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.concat(F.lit("NEW_"), F.col("c_mktsegment")).alias("new_segment"),
        eff.alias("eff"),
    )
    closed = (
        c.join(changes, "c_custkey", "left")
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.lit("1990-01-01 00:00:00").cast("timestamp").alias("valid_from"),
            F.col("eff").alias("valid_to"),
            F.col("new_segment").isNull().alias("is_current"),
        )
    )
    opened = changes.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.col("eff").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(opened)


# --- Skew-safe salted aggregation ------------------------------------------


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY event_type
    """,
    tags=("aggregation", "skew", "salting"),
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: groupBy(key, salt) partials →
    groupBy(key) final. With 5 distinct event types, a plain groupBy at
    100 TB concentrates each key on one reducer; salting spreads each key
    over 16 partials first, so no reducer sees more than ~1/16 of a hot
    key. Result is provably identical to the plain GROUP BY (the oracle)
    because decimal sums and counts are associative."""
    from distributed_graph_database_system_spark.queries.helpers import dec

    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum(dec("value")).alias("pt"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pt").cast("double").alias("total"),
    )


# --- Approximate distinct (HLL sketch — the 100 TB COUNT(DISTINCT)) --------


@query(
    "agg_approx_distinct",
    oracle=(
        "SELECT s AS o_orderstatus, CAST(a AS BIGINT) AS approx_custs, "
        "CAST(e AS BIGINT) AS exact_custs FROM (VALUES "
        "('F', 1426, 1429), ('O', 1447, 1451), ('P', 1447, 1444)"
        ") AS t(s, a, e)"
    ),
    oracle_sf="0.01",
    tags=("aggregation", "approx", "sketch"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, fixed-size sketch, one pass,
    mergeable across partitions) next to the exact count. Cross-engine
    sketches differ, but HLL register-max is ORDER- and
    PARTITIONING-INDEPENDENT for a fixed input multiset, so the estimate
    is pinnable as a sf0.01 golden (stability across sessions verified);
    tests/test_breadth.py additionally bounds the relative error against
    the exact count at any SF."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"),
        F.count_distinct("o_custkey").alias("exact_custs"),
    )


@query(
    "agg_hll_rollup",
    oracle=AGG_HLL_ROLLUP_GOLDEN,
    oracle_sf="0.01",
    tags=("aggregation", "approx", "sketch", "rollup"),
)
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE sketch rollup — the pattern behind every pre-aggregated
    distinct-count dashboard at 100 TB: build one Datasketches HLL sketch
    of the day's users per (event_type, day) (`hll_sketch_agg`), then
    answer the per-event_type question by UNION-MERGING the daily sketches
    (`hll_union_agg`) instead of rescanning raw events. Merge is
    register-max: associative, commutative, partition-invariant — so the
    estimate is a pure function of the data and seeds, goldenable at
    sf0.01. tests/test_breadth.py asserts merged-vs-direct equality and
    bounds the error vs the exact count; the batch-vs-sketch-store split
    mirrors run_incremental_daily_rollup's ledger design, with sketches as
    the (constant-size) per-day state instead of additive counters."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    return daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )


@query(
    "agg_hll_sliding7",
    oracle=AGG_HLL_SLIDING7_GOLDEN,
    oracle_sf="0.01",
    tags=("aggregation", "approx", "sketch", "sliding-window"),
)
def agg_hll_sliding7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day SLIDING distinct-user counts from the daily sketch store —
    the query additive rollups cannot answer and re-scanning raw data
    should not have to: each day's window estimate is the register-max
    union of that day's and the six prior days' HLL sketches. The range
    self-join runs over |days| sketch rows (constant-size state,
    broadcastable at any corpus size), so the sliding series costs
    O(days × window) tiny merges instead of O(window) raw scans per day.
    Register-max is associative/commutative/idempotent ⇒ the estimate is
    a pure function of the data, goldenable at sf0.01 (generated VALUES
    oracle, same discipline as agg_hll_rollup)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", 12).alias("sk")
    )
    a = daily.select(F.col("day").alias("d"))
    b = daily.select(F.col("day").alias("bd"), "sk")
    win = (
        a.join(
            b,
            (F.col("bd") >= F.date_sub(F.col("d"), 6))
            & (F.col("bd") <= F.col("d")),
        )
        .groupBy("d")
        .agg(
            F.count("*").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "est_users_7d"
            ),
        )
    )
    return win.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_days",
        "est_users_7d",
    ).orderBy("day")


# --- Subqueries (EXISTS / IN / scalar) --------------------------------------


@query(
    "subquery_exists",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    """,
    tags=("subquery", "exists"),
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — planned as left-semi and left-anti
    joins (set-at-a-time, no per-row subquery execution)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 300000).select("o_custkey")
    fstat = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.join(big, c.c_custkey == big.o_custkey, "left_semi")
        .join(fstat, F.col("c_custkey") == fstat.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "subquery_scalar_agg",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 2) AS diff_from_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    tags=("subquery", "scalar"),
)
def subquery_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subquery — one tiny aggregate broadcast into the
    scan's filter/projection rather than recomputed per row."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    view = sf_view(
        spark, load_table(spark, sf_dir, "orders"), "sq_orders", sf_dir
    )
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM {view}), 2)
                 AS diff_from_avg
        FROM {view}
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM {view})
    """)


# --- Null semantics ----------------------------------------------------------


@query(
    "null_semantics",
    oracle="""
    SELECT e.event_id,
           COALESCE(c.c_mktsegment, 'UNKNOWN') AS seg,
           (e.user_id IS NOT DISTINCT FROM c.c_custkey) AS nullsafe_eq,
           NULLIF(e.event_type, 'view') AS not_view,
           CASE WHEN c.c_custkey IS NULL THEN 'no_match' ELSE 'match' END AS match_tag
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("scalar", "null"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE / NULLIF / null-safe equality (<=>) across an outer join —
    the null-handling family over real nullable columns."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    # customer grows with SF — strategy left to AQE (broadcast at fixture
    # scale, shuffle at cluster scale).
    j = e.join(c, e.user_id == c.c_custkey, "left")
    return j.select(
        "event_id",
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("seg"),
        F.col("user_id").eqNullSafe(F.col("c_custkey")).alias("nullsafe_eq"),
        F.nullif("event_type", F.lit("view")).alias("not_view"),
        F.when(F.col("c_custkey").isNull(), "no_match").otherwise("match").alias("match_tag"),
    )


# --- Time-series resample / gap fill ----------------------------------------


@query(
    "resample_daily_gapfill",
    oracle="""
    WITH spine AS (
      SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                    INTERVAL 1 DAY)) AS day
    ), daily AS (
      SELECT date_trunc('day', ts) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1
    )
    SELECT CAST(s.day AS TIMESTAMP) AS day,
           COALESCE(d.n, 0) AS n,
           COALESCE(d.total, 0.0) AS total
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
    tags=("timeseries", "resample", "gapfill"),
)
def resample_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample to a daily grid with gap filling: a generated time spine
    (sequence + explode — distributed, never a driver loop) left-joined to
    the per-day aggregate, missing days zero-filled."""
    from distributed_graph_database_system_spark.queries.helpers import dsum

    e = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n"), dsum("value").alias("total")
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


# --- TPC-H q7-style multi-dimension volume join -----------------------------


@query(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS yr,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE n1.n_name < n2.n_name
    )
    GROUP BY supp_nation, cust_nation, yr
    """,
    tags=("relational", "tpch", "multi-join"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: 6-table join with two roles for nation (supplier's vs
    customer's) and a cross-dimension predicate. Both nation copies are
    broadcast; the fact-side joins stay shuffle joins AQE can reshape."""
    from distributed_graph_database_system_spark.queries.helpers import dec

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("yr"),
            # exact decimal per-row arithmetic (identical in the oracle) —
            # casting the double PRODUCT to decimal rounds differently across
            # engines at half-ulp boundaries
            (dec("l_extendedprice") * (1 - dec("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


# --- Window range frames (rangeBetween) -------------------------------------


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
             AS n_similar_priced
    FROM orders
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): per customer, how many of
    their orders fall within ±10k of each order's price."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10_000, 10_000)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.count("*").over(w).alias("n_similar_priced"),
    )


# --- UNPIVOT / melt ---------------------------------------------------------


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
             CAST(l_quantity AS DOUBLE) AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    )
    """,
    tags=("reshape", "unpivot"),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt): one row per (line item, measure).
    Executes as a Generate/Expand node — the fan-out is per-partition, no
    shuffle at all."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["quantity", "extendedprice", "discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# --- Table profiling (data-quality pass) ------------------------------------


@query(
    "profile_documents",
    oracle="""
    SELECT 'doc_id' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(doc_id) AS n_null,
           COUNT(DISTINCT doc_id) AS n_distinct,
           CAST(MIN(doc_id) AS VARCHAR) AS min_v, CAST(MAX(doc_id) AS VARCHAR) AS max_v
    FROM documents
    UNION ALL
    SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
           MIN(lang), MAX(lang) FROM documents
    UNION ALL
    SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
           MIN(source), MAX(source) FROM documents
    UNION ALL
    SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars), COUNT(DISTINCT n_chars),
           CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR) FROM documents
    """,
    tags=("profiling", "data-quality"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler: rows / nulls / distincts / extremes per column in ONE
    scan (all profiles are aggregates of the same pass; Spark plans a single
    aggregation with 4×N aggregate expressions, not N scans — exactly how a
    100 TB profiling pass must run)."""
    d = load_table(spark, sf_dir, "documents")
    cols = ["doc_id", "lang", "source", "n_chars"]
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__n_rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.min(c).cast("string").alias(f"{c}__min_v"),
            F.max(c).cast("string").alias(f"{c}__max_v"),
        ]
    wide = d.agg(*aggs)
    per_col = [
        wide.select(
            F.lit(c).alias("col"),
            F.col(f"{c}__n_rows").alias("n_rows"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_v").alias("min_v"),
            F.col(f"{c}__max_v").alias("max_v"),
        )
        for c in cols
    ]
    out = per_col[0]
    for p in per_col[1:]:
        out = out.unionByName(p)
    return out


# --- Grouped-map pandas UDF (applyInPandas) ---------------------------------


@query(
    "pandas_grouped_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                   ORDER BY l_quantity, l_orderkey, l_linenumber)
                AS BIGINT) AS rank_in_flag
    FROM lineitem
    """,
    tags=("udf", "pandas", "grouped-map"),
)
def pandas_grouped_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map UDTF-alike): each group arrives as one
    pandas DataFrame, ranked with a deterministic total order and returned
    with a new schema. Integer output → exact cross-engine compare. Each
    group must fit one executor's memory — the documented constraint of the
    grouped-map pattern (unlike window functions, which stream)."""
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_quantity"
    )

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["l_quantity", "l_orderkey", "l_linenumber"])
        pdf["rank_in_flag"] = range(1, len(pdf) + 1)
        return pdf[["l_orderkey", "l_linenumber", "rank_in_flag"]]

    return li.groupBy("l_returnflag").applyInPandas(
        rank_group, schema="l_orderkey BIGINT, l_linenumber INT, rank_in_flag BIGINT"
    )


@query(
    "udtf_sentence_stats",
    oracle="""
    WITH sent AS (
      SELECT doc_id, trim(s) AS s
      FROM documents, UNNEST(string_split(text, '.')) AS t(s)
      WHERE trim(s) <> ''
    )
    SELECT doc_id,
           COUNT(*) AS n_sentences,
           CAST(SUM(length(s)) AS BIGINT) AS sent_chars,
           CAST(MAX(length(s)) AS BIGINT) AS max_sent_chars
    FROM sent GROUP BY doc_id
    """,
    tags=("udtf", "text"),
)
def udtf_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL Python UDTF (Spark 4 ``@udtf``, not the applyInPandas
    UDTF-alike above): one input row yields N output rows through a LATERAL
    join — the table-function shape SQL engines expose as
    ``CROSS APPLY``/``UNNEST``. Sentence segmentation (split on '.', space-
    trimmed, empties dropped) is deliberately primitive so the DuckDB twin
    is exact. Per-row Python is the documented cost of the row-yield UDTF
    protocol — fine off the hot path; Arrow-batched alternatives above
    (applyInPandas / mapInPandas) are the scale path."""
    from pyspark.sql.functions import udtf

    from distributed_graph_database_system_spark.queries.helpers import sf_view

    @udtf(returnType="doc_id BIGINT, sent STRING")
    class SplitSentences:
        def eval(self, doc_id: int, text: str):  # noqa: ANN201 — UDTF protocol
            for seg in (text or "").split("."):
                seg = seg.strip(" ")
                if seg:
                    yield doc_id, seg

    view = sf_view(spark, load_table(spark, sf_dir, "documents"), "udtf_docs", sf_dir)
    spark.udtf.register("split_sentences", SplitSentences)
    return spark.sql(f"""
        SELECT s.doc_id,
               COUNT(*) AS n_sentences,
               CAST(SUM(length(s.sent)) AS BIGINT) AS sent_chars,
               CAST(MAX(length(s.sent)) AS BIGINT) AS max_sent_chars
        FROM {view} d, LATERAL split_sentences(d.doc_id, d.text) s
        GROUP BY s.doc_id
    """)


@query(
    "source_orc_roundtrip",
    oracle="""
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part GROUP BY p_brand
    """,
    tags=("source", "orc"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → ORC sink → ORC scan → aggregate (ORC is Spark's second native
    columnar format; schema rides the file like parquet)."""
    from distributed_graph_database_system_spark.queries.helpers import dsum
    from distributed_graph_database_system_spark.sources.io import read_orc, write_orc

    path = _io_path(sf_dir, "part_orc")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    write_orc(p, path)
    return (
        read_orc(spark, path)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), dsum("p_retailprice").alias("total_price"))
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
    tags=("events", "funnel", "sequence"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users who viewed, then clicked AFTER their
    first view, then purchased AFTER that first qualifying click. Each step
    is one filtered aggregate joined to the previous step's first-event
    time — per-step shuffles on user_id only (the natural key), no window
    over the whole event stream and no driver-side state. The strictly-
    increasing-time condition makes it a sequence match, not a bag-of-
    events count."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_click_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchase_after_click")))
    )


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS INT)
             AS weeks_since,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY f.cohort_week, weeks_since
    """,
    tags=("events", "cohort", "retention"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted distinct
    in each subsequent week — the triangular retention matrix every product
    pipeline derives from an event stream. Two aggregations + one equi-join
    on user_id (the first-seen frame is small: one row per user); at scale
    the distinct count shuffles (cohort, week, user) once — no windows over
    the raw stream."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        e.join(first_seen, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("int")
            .alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "resample_hourly_ohlc",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           arg_min(value, ts) AS open,
           CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS high,
           CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS low,
           arg_max(value, ts) AS close,
           COUNT(*) AS n
    FROM events
    GROUP BY date_trunc('hour', ts)
    """,
    tags=("timeseries", "ohlc", "argmin"),
)
def resample_hourly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bar resample: per hour, the value at the earliest event (open),
    extremes (high/low), and the value at the latest event (close) — the
    argmin/argmax aggregate family (min_by/max_by), which no other query
    covers. One hash aggregate with partial+final combine; no window over
    the stream and no per-group sort. Deterministic because fixture ts
    values are unique within an hour (min_by ties would otherwise be
    engine-dependent)."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    return e.groupBy(hour.alias("hour")).agg(
        F.min_by("value", "ts").alias("open"),
        F.max(F.col("value").cast("decimal(18,2)")).cast("double").alias("high"),
        F.min(F.col("value").cast("decimal(18,2)")).cast("double").alias("low"),
        F.max_by("value", "ts").alias("close"),
        F.count("*").alias("n"),
    )


@query(
    "agg_regression_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS r,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregation", "statistics", "regression"),
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics aggregate family (Pearson corr, sample
    covariance, OLS slope/intercept/count) — single-pass distributed moment
    accumulation with partial+final combine, the same update/merge shape as
    sum/avg so it scales identically. Rounded on both engines: the moments
    are order-dependent in the last ~ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("r"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_s"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


@query(
    "agg_bitwise_bool",
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS all_bits,
           bit_or(user_id) AS any_bits,
           bit_xor(user_id) AS parity_bits,
           bool_and(value > 0) AS every_positive,
           bool_or(value > 50) AS any_large
    FROM events GROUP BY event_type
    """,
    tags=("aggregation", "bitwise", "boolean"),
)
def agg_bitwise_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bitwise (AND/OR/XOR) and boolean (EVERY/ANY) aggregates —
    integer/boolean lattice operations, so commutative, associative, and
    bit-exact across engines and partitionings with no rounding caveats."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("all_bits"),
        F.bit_or("user_id").alias("any_bits"),
        F.bit_xor("user_id").alias("parity_bits"),
        F.bool_and(F.col("value") > 0).alias("every_positive"),
        F.bool_or(F.col("value") > 50).alias("any_large"),
    )


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_mktsegment, ',' ORDER BY c_mktsegment, c_custkey)
             AS segments,
           COUNT(*) AS n
    FROM customer
    WHERE c_custkey <= 200
    GROUP BY c_nationkey
    """,
    tags=("aggregation", "listagg", "ordered"),
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (ANSI LISTAGG ... WITHIN GROUP): values
    concatenated in an EXPLICIT total order, so the result is deterministic
    — the unordered variant (collect_list/string_agg without ORDER BY) is
    partition-order-dependent and deliberately unused anywhere in this
    engine. Per-group state is the concatenated string: bounded here by the
    key filter; at scale prefer array_agg + slicing or a top-k."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    view = sf_view(
        spark,
        load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200),
        "la_customer",
        sf_dir,
    )
    return spark.sql(f"""
        SELECT c_nationkey,
               listagg(c_mktsegment, ',')
                 WITHIN GROUP (ORDER BY c_mktsegment, c_custkey) AS segments,
               COUNT(*) AS n
        FROM {view}
        GROUP BY c_nationkey
    """)


def _fp_oracle_side(table: str, cols: list[str]) -> str:
    from distributed_graph_database_system_spark.operators.checksum import (
        fingerprint_sql,
    )

    return (
        "SELECT \"table\", n_rows, fingerprint, fingerprint AS replica_fingerprint, "
        "TRUE AS consistent FROM (" + fingerprint_sql(table, cols) + ")"
    )


@query(
    "replica_consistency_check",
    oracle=_fp_oracle_side("customer", ["c_custkey", "c_name", "c_nationkey"])
    + " UNION ALL "
    + _fp_oracle_side("supplier", ["s_suppkey", "s_name", "s_nationkey"])
    + " ORDER BY \"table\"",
    tags=("ops", "checksum", "replication"),
)
def replica_consistency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy replica verification (operators/checksum.py): write a
    replica copy of each table, then compare order-independent content
    fingerprints of primary vs replica — the distributed analogue of the
    reference's primary/secondary consistency contract (primaryServer.c
    syncing secondaryServer.c's copy). The fingerprint is a commutative
    exact-decimal sum of 60-bit per-row md5 hashes, so ANY partitioning,
    file order, or replica layout yields the same value; the oracle
    asserts the Spark primary fingerprint matches DuckDB's independent
    computation AND that the written replica round-trips bit-identically
    (replica_fingerprint column)."""
    from distributed_graph_database_system_spark.operators.checksum import (
        table_fingerprint,
    )
    from distributed_graph_database_system_spark.queries.helpers import scratch_dir

    out = []
    for table, cols in (
        ("customer", ["c_custkey", "c_name", "c_nationkey"]),
        ("supplier", ["s_suppkey", "s_name", "s_nationkey"]),
    ):
        primary = load_table(spark, sf_dir, table)
        path = scratch_dir("replica", sf_dir, table)
        primary.write.mode("overwrite").parquet(path)
        replica = spark.read.parquet(path)
        a = table_fingerprint(primary, cols, table)
        b = table_fingerprint(replica, cols, table).select(
            "table", F.col("fingerprint").alias("replica_fingerprint")
        )
        out.append(
            a.join(b, "table").select(
                "table",
                "n_rows",
                "fingerprint",
                "replica_fingerprint",
                (F.col("fingerprint") == F.col("replica_fingerprint")).alias(
                    "consistent"
                ),
            )
        )
    return out[0].unionByName(out[1]).orderBy("table")


@query(
    "events_cumulative_distinct",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ), nu AS (
      SELECT first_day AS day, COUNT(*) AS new_users FROM fs GROUP BY first_day
    ), days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    )
    SELECT CAST(days.day AS VARCHAR) AS day,
           CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(nu.new_users, 0))
                  OVER (ORDER BY days.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_distinct_users
    FROM days LEFT JOIN nu ON days.day = nu.day
    ORDER BY day
    """,
    tags=("events", "distinct", "cumulative"),
)
def events_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cumulative distinct users per day WITHOUT a cumulative
    distinct-count window (which would re-scan every prefix): each user
    collapses to a first-seen day (one groupBy), the per-day news are
    counted (second tiny groupBy), and a running sum over days equals the
    cumulative distinct count — the first-seen decomposition that turns an
    O(days × users) problem into two shuffles plus a window over |days|
    rows. The final window IS a single global sort, but over the per-day
    aggregate (~tens of thousands of rows for decades of days), not the
    event log; the approximate alternative at unbounded day counts is the
    HLL sketch-store path (agg_hll_rollup / agg_hll_sliding7)."""
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    nu = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    days = e.select(F.to_date("ts").alias("day")).distinct()
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    joined = days.join(nu, "day", "left").select(
        "day", F.coalesce("new_users", F.lit(0)).alias("new_users")
    )
    return joined.select(
        F.col("day").cast("string").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cum_distinct_users"),
    ).orderBy("day")


@query(
    "events_audience_overlap",
    oracle="""
    WITH s AS (SELECT DISTINCT event_type, user_id FROM events),
    sz AS (SELECT event_type, COUNT(*) AS n FROM s GROUP BY event_type),
    ix AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_both
      FROM s a JOIN s b ON a.user_id = b.user_id
                       AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT ix.type_a, ix.type_b,
           CAST(ix.n_both AS BIGINT) AS n_both,
           ROUND(CAST(ix.n_both AS DOUBLE)
                 / (sa.n + sb.n - ix.n_both), 4) AS jaccard
    FROM ix JOIN sz sa ON ix.type_a = sa.event_type
            JOIN sz sb ON ix.type_b = sb.event_type
    ORDER BY type_a, type_b
    """,
    tags=("events", "overlap", "jaccard"),
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap: exact Jaccard similarity between the
    user sets of every event-type pair. Dedup first (DISTINCT on
    (type, user) — one shuffle), intersect via a user-keyed self-join of
    the deduped relation (hash join, never a cross product), sizes via a
    broadcast-sized per-type count table. All integers until one rounded
    double division. With thousands of segments instead of 5, the same
    shape holds but the self-join fan-out per hot user grows
    quadratically — the MinHash signature route (dedup_minhash_lsh's
    machinery over segment membership sets) is the sketch answer."""
    e = load_table(spark, sf_dir, "events")
    s = e.select("event_type", "user_id").distinct()
    sz = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = s.select(F.col("event_type").alias("type_a"), "user_id")
    b = s.select(F.col("event_type").alias("type_b"), "user_id")
    ix = (
        a.join(b, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        ix.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.round(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "analyze_column_stats",
    oracle="""
    SELECT 'c_custkey' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(c_custkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS ndv,
           CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
           CAST(MAX(c_custkey) AS VARCHAR) AS max_val
    FROM customer
    UNION ALL
    SELECT 'c_mktsegment', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_mktsegment) AS BIGINT),
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT),
           CAST(MIN(c_mktsegment) AS VARCHAR), CAST(MAX(c_mktsegment) AS VARCHAR)
    FROM customer
    UNION ALL
    SELECT 'c_nationkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(c_nationkey) AS BIGINT),
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT),
           CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR)
    FROM customer
    ORDER BY column_name
    """,
    tags=("ops", "statistics", "analyze"),
)
def analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (the CBO/pruning inputs): per
    column, row count, null count, distinct count, and min/max — computed
    in ONE scan via a single multi-aggregate projection, then unpivoted to
    the long (column_name, stats) form a catalog stores. Exact NDV here
    (hash-distinct); the unbounded-cardinality production variant swaps in
    the HLL sketch path (agg_hll_rollup) — same shape, constant state.
    min/max land as strings so one stats table serves every column type
    (the same trick catalog stat stores use)."""
    c = load_table(spark, sf_dir, "customer")
    agg = c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for col in ("c_custkey", "c_mktsegment", "c_nationkey")
            for x in (
                F.count(col).alias(f"nn_{col}"),
                F.count_distinct(col).alias(f"ndv_{col}"),
                F.min(col).cast("string").alias(f"min_{col}"),
                F.max(col).cast("string").alias(f"max_{col}"),
            )
        ],
    )
    rows = None
    for col in ("c_custkey", "c_mktsegment", "c_nationkey"):
        part = agg.select(
            F.lit(col).alias("column_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            (F.col("n_rows") - F.col(f"nn_{col}")).cast("bigint").alias("n_nulls"),
            F.col(f"ndv_{col}").cast("bigint").alias("ndv"),
            F.col(f"min_{col}").alias("min_val"),
            F.col(f"max_{col}").alias("max_val"),
        )
        rows = part if rows is None else rows.unionAll(part)
    return rows.orderBy("column_name")


@query(
    "events_pattern_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS path
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(regexp_extract_all(path, 'v[cv]*p')) AS BIGINT)
             AS n_matches,
           CAST(length(path) AS BIGINT) AS n_events
    FROM seq
    WHERE len(regexp_extract_all(path, 'v[cv]*p')) > 0
    ORDER BY n_matches DESC, user_id LIMIT 100
    """,
    tags=("events", "pattern", "match-recognize"),
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite sequence pattern matching: each user's event
    history collapses to an initials string in an explicit total order
    (ts, event_id — the listagg determinism discipline), and the funnel
    pattern view→(clicks/views)*→purchase is counted per user with a
    regex over that string. One groupBy + per-row regex — the
    row-pattern-matching shape without a dedicated operator; state per
    user is the event-initial string (bounded by history length; at
    100 TB sessionize first, as stream_session_window does, so the
    pattern runs per session, not per lifetime)."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    view = sf_view(
        spark, load_table(spark, sf_dir, "events"), "pm_events", sf_dir
    )
    return spark.sql(f"""
        SELECT user_id,
               CAST(size(regexp_extract_all(path, 'v[cv]*p', 0)) AS BIGINT)
                 AS n_matches,
               CAST(length(path) AS BIGINT) AS n_events
        FROM (
          SELECT user_id,
                 listagg(substr(event_type, 1, 1), '')
                   WITHIN GROUP (ORDER BY ts, event_id) AS path
          FROM {view} GROUP BY user_id
        )
        WHERE size(regexp_extract_all(path, 'v[cv]*p', 0)) > 0
        ORDER BY n_matches DESC, user_id LIMIT 100
    """)


@query(
    "events_topk_trending",
    oracle="""
    WITH w AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY CAST(ts AS DATE), event_type
    ), r AS (
      SELECT day, event_type, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY day
                                     ORDER BY n DESC, event_type) AS INT) AS rank
      FROM w
    )
    SELECT day, rank, event_type, n FROM r WHERE rank <= 3
    ORDER BY day, rank
    """,
    tags=("events", "trending", "topk", "window"),
)
def events_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window trending leaderboard: top-3 event types per day by
    count, ties broken alphabetically — the batch twin of a streaming
    trending-topics job (tumbling window + per-window rank). The count
    aggregate is partial-combined; the rank window partitions per day, so
    its state is |event_types| per partition regardless of event volume.
    The streaming form runs the same logic per closed tumbling window
    (stream_tumbling_counts feeds it)."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = e.groupBy(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    r = w.withColumn(
        "rank",
        F.row_number()
        .over(W.partitionBy("day").orderBy(F.desc("n"), "event_type"))
        .cast("int"),
    )
    return (
        r.where(F.col("rank") <= 3)
        .select("day", "rank", "event_type", F.col("n").cast("bigint").alias("n"))
        .orderBy("day", "rank")
    )


@query(
    "orders_duplicate_payment_screen",
    oracle="""
    SELECT a.o_custkey AS o_custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           a.o_totalprice AS o_totalprice,
           CAST(date_diff('day', CAST(a.o_orderdate AS DATE),
                          CAST(b.o_orderdate AS DATE)) AS BIGINT) AS days_apart
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_totalprice = b.o_totalprice
     AND a.o_orderkey < b.o_orderkey
     AND CAST(b.o_orderdate AS DATE) BETWEEN CAST(a.o_orderdate AS DATE)
         AND CAST(a.o_orderdate AS DATE) + to_days(30)
    ORDER BY 1, 2, 3
    """,
    tags=("analytics", "dedup", "fraud", "self-join"),
)
def orders_duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: same customer, identical amount, within
    30 days — the accounts-payable / fraud control run as an equi self
    join on (custkey, amount) with the date window as a residual
    predicate. The equi prefix keeps it a hash join (the amount match is
    what makes the key selective); exact double equality on amounts is
    intentional — duplicates are byte-identical re-submissions, and the
    raw parquet doubles pass through both engines untouched."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        "o_custkey",
        F.col("o_orderkey").alias("order_a"),
        "o_totalprice",
        F.to_date("o_orderdate").alias("d_a"),
    )
    b = o.select(
        F.col("o_custkey").alias("ck_b"),
        F.col("o_orderkey").alias("order_b"),
        F.col("o_totalprice").alias("tp_b"),
        F.to_date("o_orderdate").alias("d_b"),
    )
    return (
        a.join(
            b,
            (F.col("o_custkey") == F.col("ck_b"))
            & (F.col("o_totalprice") == F.col("tp_b"))
            & (F.col("order_a") < F.col("order_b"))
            & (F.col("d_b") >= F.col("d_a"))
            & (F.col("d_b") <= F.date_add(F.col("d_a"), 30)),
        )
        .select(
            "o_custkey",
            "order_a",
            "order_b",
            "o_totalprice",
            F.datediff("d_b", "d_a").cast("bigint").alias("days_apart"),
        )
        .orderBy("o_custkey", "order_a", "order_b")
    )


@query(
    "events_user_entropy",
    oracle="""
    WITH h AS (
      SELECT user_id, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY user_id, EXTRACT(hour FROM ts)
    ), tot AS (
      SELECT user_id, SUM(n) AS tn FROM h GROUP BY user_id
    ), terms AS (
      SELECT h.user_id,
             CAST(ROUND(-(CAST(h.n AS DOUBLE) / tot.tn)
                        * ln(CAST(h.n AS DOUBLE) / tot.tn), 10)
                  AS DECIMAL(28,10)) AS e,
             tot.tn
      FROM h JOIN tot ON h.user_id = tot.user_id
    )
    SELECT user_id,
           CAST(MAX(tn) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_active_hours,
           ROUND(CAST(SUM(e) AS DOUBLE), 4) AS hour_entropy
    FROM terms GROUP BY user_id
    ORDER BY hour_entropy, user_id LIMIT 100
    """,
    tags=("events", "entropy", "behavior"),
)
def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral regularity score: Shannon entropy of each user's
    hour-of-day activity distribution — near-zero entropy (all activity in
    one hour) is the bot/cron signature, high entropy is organic humanity.
    Two aggregates (hour histogram, totals) + per-bin entropy terms
    rounded to 10dp and decimal-summed (≤ 24 bins per user, order-free by
    construction). Sorted ascending: the review queue leads with the most
    mechanical accounts."""
    e = load_table(spark, sf_dir, "events")
    h = e.groupBy("user_id", F.hour("ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = h.groupBy("user_id").agg(F.sum("n").alias("tn"))
    p = F.col("n").cast("double") / F.col("tn")
    terms = h.join(tot, "user_id").select(
        "user_id",
        "tn",
        F.round(-p * F.log(p), 10).cast("decimal(28,10)").alias("e"),
    )
    return (
        terms.groupBy("user_id")
        .agg(
            F.max("tn").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_active_hours"),
            F.round(F.sum("e").cast("double"), 4).alias("hour_entropy"),
        )
        .orderBy("hour_entropy", "user_id")
        .limit(100)
    )


@query(
    "events_ab_lift_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(COUNT(*) FILTER (event_type = 'purchase') >= 14 AS INT) AS converted
      FROM events GROUP BY user_id
    ), s AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS c_a,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS c_b
      FROM assign
    )
    SELECT n_a, c_a, n_b, c_b,
           ROUND(CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a, 4) AS lift,
           ROUND((CAST(c_b AS DOUBLE) / n_b - CAST(c_a AS DOUBLE) / n_a)
                 / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z_stat
    FROM s
    """,
    tags=("events", "experiment", "ab-test", "ztest"),
)
def events_ab_lift_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic experiment split (arm =
    user_id mod 2; in production the md5_uniform assignment — same device
    as sample splits): conversion = user ever purchased, pooled-variance
    z for the B−A lift. One per-user aggregate + one 4-counter global
    aggregate; the statistic is a single identical IEEE expression over
    exact integers — the experimentation primitive next to the
    chi-square independence test (events_chisq_type_dow)."""
    e = load_table(spark, sf_dir, "events")
    # conversion = heavy purchaser (>= 14 purchase events — the fixture
    # median): every user purchases at least once, so the binary outcome
    # needs a threshold to be non-degenerate (pooled p=1 would zero the
    # z denominator)
    assign = e.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long")) >= 14
        ).cast("int").alias("converted")
    ).withColumn("arm", F.col("user_id") % 2)
    s = assign.agg(
        F.sum((F.col("arm") == 0).cast("long")).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("c_a"),
        F.sum((F.col("arm") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("c_b"),
    )
    pa = F.col("c_a").cast("double") / F.col("n_a")
    pb = F.col("c_b").cast("double") / F.col("n_b")
    pp = (F.col("c_a") + F.col("c_b")).cast("double") / (F.col("n_a") + F.col("n_b"))
    return s.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("c_a").cast("bigint").alias("c_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("c_b").cast("bigint").alias("c_b"),
        F.round(pb - pa, 4).alias("lift"),
        F.round(
            (pb - pa)
            / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))),
            4,
        ).alias("z_stat"),
    )


@query(
    "agg_mode_exact",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_shipmode_sub AS shipmode, COUNT(*) AS n
      FROM (SELECT l_returnflag, l_suppkey % 7 AS l_shipmode_sub FROM lineitem)
      GROUP BY l_returnflag, l_shipmode_sub
    ), r AS (
      SELECT l_returnflag, shipmode, n,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, shipmode) AS rk
      FROM c
    )
    SELECT l_returnflag,
           CAST(shipmode AS BIGINT) AS mode_value,
           CAST(n AS BIGINT) AS mode_count
    FROM r WHERE rk = 1 ORDER BY l_returnflag
    """,
    tags=("aggregation", "mode", "exact"),
)
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group MODE with a total tie order (highest count, then
    smallest value): two partial-aggregated shuffles — value histogram,
    then a per-group arg-max — never a per-group sort of raw rows. The
    deterministic-tie-break discipline matters: engines' built-in mode()
    functions break ties arbitrarily, which is exactly the
    partition-order dependence this engine bans; making the order total
    makes mode usable in hash-verified pipelines."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(
        "l_returnflag", (F.col("l_suppkey") % 7).alias("shipmode")
    ).groupBy("l_returnflag", "shipmode").agg(F.count(F.lit(1)).alias("n"))
    best = c.groupBy("l_returnflag").agg(
        F.max(F.struct(F.col("n"), (-F.col("shipmode")).alias("neg"))).alias("m")
    )
    return best.select(
        "l_returnflag",
        (-F.col("m.neg")).cast("bigint").alias("mode_value"),
        F.col("m.n").cast("bigint").alias("mode_count"),
    ).orderBy("l_returnflag")


@query(
    "events_burstiness_fano",
    oracle="""
    WITH m AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_hours,
             CAST(SUM(n) AS BIGINT) AS sn,
             CAST(SUM(n * n) AS BIGINT) AS snn
      FROM m GROUP BY event_type
    )
    SELECT event_type, n_hours, sn AS n_events,
           ROUND((CAST(snn AS DOUBLE) / n_hours
                  - (CAST(sn AS DOUBLE) / n_hours) * (CAST(sn AS DOUBLE) / n_hours))
                 / (CAST(sn AS DOUBLE) / n_hours), 4) AS fano
    FROM s ORDER BY event_type
    """,
    tags=("events", "burstiness", "fano", "statistics"),
)
def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per event type: the Fano factor (variance-to-mean ratio
    of hourly counts) — 1 for a Poisson process, ≫1 for bursty traffic
    (incidents, bots, campaigns), <1 for rate-limited flows. Two integer
    aggregates (hourly histogram, then moment sums); variance comes from
    the exact Σn²/Σn moments so the ratio is one deterministic
    expression — the same moment discipline as agg_regression_stats,
    pointed at an operational anomaly signal."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    s = m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("sn"),
        F.sum(F.col("n") * F.col("n")).alias("snn"),
    )
    mean = F.col("sn").cast("double") / F.col("n_hours")
    return s.select(
        "event_type",
        F.col("n_hours").cast("bigint").alias("n_hours"),
        F.col("sn").cast("bigint").alias("n_events"),
        F.round(
            (F.col("snn").cast("double") / F.col("n_hours") - mean * mean) / mean,
            4,
        ).alias("fano"),
    ).orderBy("event_type")


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag AS grp, p_retailprice AS x,
             CAST(l_quantity AS DECIMAL(18,2)) AS wt
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), ordered AS (
      SELECT grp, x, wt,
             SUM(wt) OVER (PARTITION BY grp ORDER BY x, wt
                           ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(wt) OVER (PARTITION BY grp) AS tot
      FROM w
    )
    SELECT grp AS l_returnflag,
           CAST(MIN(x) AS DOUBLE) AS weighted_median,
           CAST(MAX(tot) AS DOUBLE) AS total_weight
    FROM ordered WHERE cum >= tot / 2
    GROUP BY grp ORDER BY grp
    """,
    tags=("aggregation", "weighted-median", "prefix-sum"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median: the smallest part price whose cumulative
    quantity weight reaches half the group's total — the
    inventory-weighted 'typical price' plain median misses. Weights
    accumulate as exact decimals in a total order (price, weight) so the
    crossing point is engine-independent; the cumulative window runs per
    group partition. At unbounded group sizes the same crossing is found
    by the two-pass distributed prefix sum (operators/prefix.py) — the
    formulation that never sorts a group inside one task."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window as W

    w = li.join(p, F.col("l_partkey") == F.col("p_partkey")).select(
        F.col("l_returnflag").alias("grp"),
        F.col("p_retailprice").alias("x"),
        F.col("l_quantity").cast("decimal(18,2)").alias("wt"),
    )
    win = W.partitionBy("grp").orderBy("x", "wt").rowsBetween(
        W.unboundedPreceding, 0
    )
    tot_w = W.partitionBy("grp")
    ordered = w.select(
        "grp",
        "x",
        F.sum("wt").over(win).alias("cum"),
        F.sum("wt").over(tot_w).alias("tot"),
    )
    return (
        ordered.where(F.col("cum") >= F.col("tot") / 2)
        .groupBy(F.col("grp").alias("l_returnflag"))
        .agg(
            F.min("x").cast("double").alias("weighted_median"),
            F.max("tot").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "orders_cohort_ltv_curve",
    oracle="""
    WITH first AS (
      SELECT o_custkey,
             CAST(EXTRACT(year FROM MIN(o_orderdate)) AS INT) AS cohort_year
      FROM orders GROUP BY o_custkey
    ), rev AS (
      SELECT f.cohort_year,
             CAST(EXTRACT(year FROM o.o_orderdate) AS INT) - f.cohort_year
               AS year_index,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS yr_rev
      FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
      GROUP BY f.cohort_year, CAST(EXTRACT(year FROM o.o_orderdate) AS INT) - f.cohort_year
    )
    SELECT cohort_year, year_index,
           CAST(yr_rev AS DOUBLE) AS year_revenue,
           CAST(SUM(yr_rev) OVER (PARTITION BY cohort_year ORDER BY year_index
                                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS cumulative_ltv
    FROM rev ORDER BY cohort_year, year_index
    """,
    tags=("analytics", "cohort", "ltv", "prefix-sum"),
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    year, revenue accumulated per years-since-acquisition — the growth
    dashboard that shows whether newer cohorts monetize faster. Revenue
    stays DECIMAL through both the per-cell aggregation AND the running
    cumulative (exact at every point — the money discipline extended to
    window sums), surfacing as double only in the final projection. The
    cumulative window runs over |cohorts|×|years| aggregate cells, never
    order rows."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.year(F.min("o_orderdate")).cast("int").alias("cohort_year")
    )
    rev = (
        o.join(first, "o_custkey")
        .groupBy(
            "cohort_year",
            (F.year("o_orderdate").cast("int") - F.col("cohort_year")).alias(
                "year_index"
            ),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("yr_rev")
        )
    )
    w = W.partitionBy("cohort_year").orderBy("year_index").rowsBetween(
        W.unboundedPreceding, 0
    )
    return rev.select(
        "cohort_year",
        "year_index",
        F.col("yr_rev").cast("double").alias("year_revenue"),
        F.sum("yr_rev").over(w).cast("double").alias("cumulative_ltv"),
    ).orderBy("cohort_year", "year_index")


@query(
    "events_retention_curve",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ), cohort AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM fs
    ), active AS (
      SELECT DISTINCT e.user_id,
             date_diff('day', fs.first_day, CAST(e.ts AS DATE)) AS day_n
      FROM events e JOIN fs ON e.user_id = fs.user_id
    )
    SELECT CAST(day_n AS BIGINT) AS day_n,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           ROUND(CAST(COUNT(*) AS DOUBLE) / cohort.n_users, 4) AS retention
    FROM active CROSS JOIN cohort
    WHERE day_n <= 14
    GROUP BY day_n, cohort.n_users ORDER BY day_n
    """,
    tags=("events", "retention", "cohort"),
)
def events_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-N retention curve: fraction of all users active exactly N days
    after their own first activity (N ≤ 14) — the product-health curve the
    weekly cohort MATRIX (cohort_weekly_retention) summarizes per cohort;
    this is the pooled per-day view. Two aggregates + one distinct
    (user, offset) projection; the cohort size broadcasts into the final
    division."""
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    cohort = fs.agg(F.count(F.lit(1)).alias("n_users"))
    active = (
        e.join(fs, "user_id")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.col("first_day")).alias("day_n"),
        )
        .distinct()
    )
    return (
        active.where(F.col("day_n") <= 14)
        .groupBy("day_n")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .crossJoin(F.broadcast(cohort))
        .select(
            F.col("day_n").cast("bigint").alias("day_n"),
            F.col("active_users").cast("bigint").alias("active_users"),
            F.round(
                F.col("active_users").cast("double") / F.col("n_users"), 4
            ).alias("retention"),
        )
        .orderBy("day_n")
    )


@query(
    "orders_benford_screen",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), c AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c)
    SELECT c.d AS leading_digit, c.n,
           ROUND(CAST(c.n AS DOUBLE) / tot.t, 4) AS observed,
           ROUND(ln(1.0 + 1.0 / c.d) / ln(10.0), 4) AS benford_expected,
           ROUND(CAST(c.n AS DOUBLE) / tot.t
                 - ln(1.0 + 1.0 / c.d) / ln(10.0), 4) AS deviation
    FROM c CROSS JOIN tot ORDER BY leading_digit
    """,
    tags=("analytics", "benford", "forensic"),
)
def orders_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law forensic screen: the leading-digit distribution of
    order amounts against the log10(1 + 1/d) expectation — fabricated or
    systematically generated amounts betray themselves by flat or spiky
    first digits (here the TPC-H uniform price generator visibly violates
    Benford — the deviation column IS the finding). One digit-extraction
    projection + a 9-row aggregate; expectation and deviation are single
    identical IEEE expressions."""
    o = load_table(spark, sf_dir, "orders")
    d = o.where(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    c = d.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = c.agg(F.sum("n").alias("t"))
    expected = F.log(1.0 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("leading_digit"),
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n").cast("double") / F.col("t"), 4).alias("observed"),
            F.round(expected, 4).alias("benford_expected"),
            F.round(
                F.col("n").cast("double") / F.col("t") - expected, 4
            ).alias("deviation"),
        )
        .orderBy("leading_digit")
    )


@query(
    "events_overlap_kmv",
    oracle="""
    WITH s AS (
      SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL
    ), rk AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM s
    ), sk AS (SELECT event_type, h FROM rk WHERE rn <= 256),
    st AS (
      SELECT event_type,
             CASE WHEN COUNT(*) < 256 THEN 1152921504606846976
                  ELSE MAX(h) END AS theta
      FROM sk GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             LEAST(a.theta, b.theta) AS theta
      FROM st a JOIN st b ON a.event_type < b.event_type
    ), ra AS (
      SELECT p.type_a, p.type_b, p.theta, s.h
      FROM pairs p JOIN sk s ON s.event_type = p.type_a AND s.h < p.theta
    ), rb AS (
      SELECT p.type_a, p.type_b, p.theta, s.h
      FROM pairs p JOIN sk s ON s.event_type = p.type_b AND s.h < p.theta
    ), ix AS (
      SELECT ra.type_a, ra.type_b, ra.theta, COUNT(*) AS n_inter
      FROM ra JOIN rb ON ra.type_a = rb.type_a AND ra.type_b = rb.type_b
                     AND ra.h = rb.h
      GROUP BY ra.type_a, ra.type_b, ra.theta
    ), un AS (
      SELECT type_a, type_b, theta, COUNT(*) AS n_union FROM (
        SELECT type_a, type_b, theta, h FROM ra
        UNION
        SELECT type_a, type_b, theta, h FROM rb
      ) GROUP BY type_a, type_b, theta
    )
    SELECT p.type_a AS type_a, p.type_b AS type_b,
           CAST(COALESCE(ix.n_inter, 0) AS BIGINT) AS n_sample_inter,
           ROUND(CAST(COALESCE(ix.n_inter, 0) AS DOUBLE)
                 * 1152921504606846976.0 / CAST(p.theta AS DOUBLE), 1)
             AS est_inter,
           ROUND(CAST(COALESCE(ix.n_inter, 0) AS DOUBLE)
                 / CAST(COALESCE(un.n_union, 1) AS DOUBLE), 4)
             AS est_jaccard
    FROM pairs p
    LEFT JOIN ix ON ix.type_a = p.type_a AND ix.type_b = p.type_b
    LEFT JOIN un ON un.type_a = p.type_a AND un.type_b = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
    tags=("events", "sketch", "kmv", "overlap"),
)
def events_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch audience overlap: pairwise distinct-user
    INTERSECTION and Jaccard estimates between event types from bottom-k
    hash sketches (operators/sketch.py kmv_sketch) — the set-algebra
    question HLL registers cannot answer (HLL unions cleanly but has no
    intersection). events_audience_overlap is the exact twin this
    estimates: there the distinct self-join touches every (type, user)
    row per pair; here everything after the one sketch build runs on
    ≤ k = 256 rows per type, whatever the user count — the 100 TB shape.
    The md5-60bit hash is engine-portable, so the DuckDB oracle
    reproduces every estimate bit-for-bit (no tolerance, no pinning);
    accuracy against the exact twin is asserted in tests/test_sketch.py
    (relative error ~1/sqrt(k-1))."""
    from distributed_graph_database_system_spark.operators.sketch import (
        kmv_pair_overlap,
        kmv_sketch,
    )

    e = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(e, "user_id", k=256, group_cols=("event_type",))
    out = kmv_pair_overlap(sk, "event_type", k=256)
    return out.select(
        "type_a",
        "type_b",
        "n_sample_inter",
        F.round("est_inter", 1).alias("est_inter"),
        F.round("est_jaccard", 4).alias("est_jaccard"),
    ).orderBy("type_a", "type_b")


@query(
    "events_sliding7_bitmap_exact",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_7d
    FROM days d
    JOIN events e ON CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    ORDER BY day
    """,
    tags=("events", "bitmap", "sliding-window", "distinct"),
)
def events_sliding7_bitmap_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 7-day sliding distinct users via Spark 4 bitmap aggregates —
    the precise twin of agg_hll_sliding7: per (day, 32768-value bucket)
    the user set compresses to one bitmap with bitmap_construct_agg (a
    map-side partial aggregate; ≤ 4 KB state per bucket however many
    events hit it), each daily bitmap then contributes to its 7 covering
    windows by an explode(0..6) date shift, and the per-window union is
    bitmap_or_agg + bitmap_count summed over buckets. Nothing leaves the
    JVM and no (day × user) pair is ever re-shuffled raw: the shuffle
    volume is bitmaps, compressed ~32768:1 against user-id rows for dense
    buckets. The oracle is the plain COUNT(DISTINCT) range join — exact
    equality, not an estimate tolerance."""
    e = load_table(spark, sf_dir, "events")
    day_bm = (
        e.select(
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
            F.expr("bitmap_bit_position(user_id)").alias("pos"),
        )
        .groupBy("day", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    contrib = day_bm.select(
        F.expr("explode(sequence(0, 6))").alias("i"), "day", "bkt", "bm"
    ).select(F.date_add("day", F.col("i")).alias("day"), "bkt", "bm")
    observed = e.select(F.to_date("ts").alias("day")).distinct()
    return (
        contrib.join(observed, "day", "left_semi")
        .groupBy("day", "bkt")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("c"))
        .groupBy("day")
        .agg(F.sum("c").cast("bigint").alias("users_7d"))
        .select(F.col("day").cast("string").alias("day"), "users_7d")
        .orderBy("day")
    )


# Multivariate OLS via distributed normal equations. ONE SQL template
# instantiated for BOTH engines (only the table name differs), so the
# double-precision expression trees are textually identical — the exact
# decimal moments feed the same IEEE operations in the same order.
_OLS_SQL = """
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s11,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s22,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS s12,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS s1y,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS s2y,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS syy
      FROM {table}
    ), c AS (
      SELECT n, s1, s2, sy, s1y, s2y, syy,
        (n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
           + s2*(s1*s12 - s11*s2)) AS det,
        (sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
           + s2*(s1y*s12 - s11*s2y)) AS det0,
        (n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
           + s2*(s1*s2y - s1y*s2)) AS det1,
        (n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
           + sy*(s1*s12 - s11*s2)) AS det2
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(det0/det, 2) AS b0,
           ROUND(det1/det, 4) AS b1,
           ROUND(det2/det, 4) AS b2,
           ROUND(1.0 - (syy - ((det0/det)*sy + (det1/det)*s1y
                               + (det2/det)*s2y))
                     / (syy - sy*sy/n), 6) AS r2
    FROM c
"""


@query(
    "lineitem_ols_normal_eq",
    oracle=_OLS_SQL.format(table="lineitem"),
    tags=("ml", "regression", "normal-equations"),
)
def lineitem_ols_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate OLS fit by DISTRIBUTED NORMAL EQUATIONS — the
    trains-on-100-TB regression shape: l_extendedprice regressed on
    (l_quantity, l_discount) with intercept. One scan accumulates the
    nine exact-decimal moments (n, Σx, Σxxᵀ, Σxy, Σyy) with map-side
    partial aggregation — X'X is 3×3 however many rows — and the closed
    Cramer solve + R² run on that single row. No gradient steps, no
    driver-side data, no iteration: the entire fit is one aggregate plus
    scalar arithmetic, which is why the normal-equation path is THE
    distributed formulation for small-feature-count linear models. The
    Spark and DuckDB sides instantiate the SAME SQL template, so every
    double operation matches bit-for-bit."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    view = sf_view(
        spark, load_table(spark, sf_dir, "lineitem"), "ols_li", sf_dir
    )
    return spark.sql(_OLS_SQL.format(table=view))


@query(
    "events_dod_retention_kmv",
    oracle="""
    WITH s AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS h
      FROM events WHERE user_id IS NOT NULL
    ), rk AS (
      SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
      FROM s
    ), sk AS (SELECT day, h FROM rk WHERE rn <= 256),
    st AS (
      SELECT day,
             CASE WHEN COUNT(*) < 256 THEN 1152921504606846976
                  ELSE MAX(h) END AS theta
      FROM sk GROUP BY day
    ), pairs AS (
      SELECT a.day AS day, b.day AS day_next, LEAST(a.theta, b.theta) AS theta
      FROM st a JOIN st b ON b.day = a.day + 1
    ), ra AS (
      SELECT p.day, p.day_next, p.theta, s.h
      FROM pairs p JOIN sk s ON s.day = p.day AND s.h < p.theta
    ), rb AS (
      SELECT p.day, p.day_next, p.theta, s.h
      FROM pairs p JOIN sk s ON s.day = p.day_next AND s.h < p.theta
    ), ix AS (
      SELECT ra.day, ra.day_next, COUNT(*) AS n_inter
      FROM ra JOIN rb ON ra.day = rb.day AND ra.day_next = rb.day_next
                     AND ra.h = rb.h
      GROUP BY ra.day, ra.day_next
    ), na AS (
      SELECT day, day_next, COUNT(*) AS n_prev FROM ra GROUP BY day, day_next
    )
    SELECT CAST(p.day AS VARCHAR) AS day,
           CAST(p.day_next AS VARCHAR) AS day_next,
           CAST(COALESCE(na.n_prev, 0) AS BIGINT) AS n_sample_prev,
           CAST(COALESCE(ix.n_inter, 0) AS BIGINT) AS n_sample_inter,
           ROUND(CAST(COALESCE(ix.n_inter, 0) AS DOUBLE)
                 / CAST(CASE WHEN COALESCE(na.n_prev, 0) = 0 THEN 1
                             ELSE na.n_prev END AS DOUBLE), 4) AS retention
    FROM pairs p
    LEFT JOIN ix ON ix.day = p.day AND ix.day_next = p.day_next
    LEFT JOIN na ON na.day = p.day AND na.day_next = p.day_next
    ORDER BY day
    """,
    tags=("events", "sketch", "kmv", "retention"),
)
def events_dod_retention_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day audience retention ESTIMATED from per-day KMV
    sketches — the production use-case for the KMV sketch store
    (streaming/events.py run_incremental_kmv_rollup): what fraction of
    day d's users return on day d+1, answered from two ≤ 256-row
    sketches per pair instead of a (day, user)-grain self-join over raw
    events. θ-restriction per pair makes both samples uniform θ-samples
    of their day audiences, so the sample ratio n_inter/n_prev IS the
    retention estimate (θ cancels). The md5-60bit hash is engine-portable
    — the oracle reproduces every estimate bit-for-bit."""
    from distributed_graph_database_system_spark.operators.sketch import (
        KMV_SPACE,
        kmv_sketch,
    )

    e = load_table(spark, sf_dir, "events")
    k = 256
    sk = kmv_sketch(
        e.select(F.to_date("ts").alias("day"), "user_id"),
        "user_id",
        k=k,
        group_cols=("day",),
    ).localCheckpoint()
    st = sk.groupBy("day").agg(
        F.when(F.count("*") < k, F.lit(KMV_SPACE))
        .otherwise(F.max("h"))
        .alias("theta")
    )
    pairs = (
        st.alias("a")
        .join(
            st.alias("b"),
            F.col("b.day") == F.date_add(F.col("a.day"), 1),
        )
        .select(
            F.col("a.day").alias("day"),
            F.col("b.day").alias("day_next"),
            F.least("a.theta", "b.theta").alias("theta"),
        )
    )
    ra = pairs.join(sk, "day").where(F.col("h") < F.col("theta"))
    rb = pairs.join(
        sk.withColumnRenamed("day", "day_next"), "day_next"
    ).where(F.col("h") < F.col("theta"))
    ix = ra.join(rb.select("day", "day_next", "h"), ["day", "day_next", "h"]).groupBy(
        "day", "day_next"
    ).agg(F.count("*").alias("n_inter"))
    na = ra.groupBy("day", "day_next").agg(F.count("*").alias("n_prev"))
    return (
        pairs.join(ix, ["day", "day_next"], "left")
        .join(na, ["day", "day_next"], "left")
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("day_next").cast("string").alias("day_next"),
            F.coalesce("n_prev", F.lit(0)).cast("bigint").alias(
                "n_sample_prev"
            ),
            F.coalesce("n_inter", F.lit(0)).cast("bigint").alias(
                "n_sample_inter"
            ),
            F.round(
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / F.when(
                    F.coalesce("n_prev", F.lit(0)) == 0, F.lit(1)
                )
                .otherwise(F.col("n_prev"))
                .cast("double"),
                4,
            ).alias("retention"),
        )
        .orderBy("day")
    )


# Recursive CTE (Spark 4 WITH RECURSIVE): same shared-template discipline
# as _OLS_SQL — both engines execute the identical recursive SQL.
_RECURSIVE_TREE_SQL = """
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS k, p_partkey AS cur, 0 AS depth
      FROM {table} WHERE p_partkey <= 500
      UNION ALL
      SELECT k, CAST(FLOOR(cur / 2) AS BIGINT) AS cur, depth + 1
      FROM anc WHERE cur > 1
    ), d AS (
      SELECT k, MAX(depth) AS depth_to_root FROM anc GROUP BY k
    )
    SELECT CAST(depth_to_root AS INT) AS depth_to_root,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(k) AS BIGINT) AS first_key,
           CAST(MAX(k) AS BIGINT) AS last_key
    FROM d GROUP BY depth_to_root ORDER BY depth_to_root
"""


@query(
    "recursive_cte_part_tree",
    oracle=_RECURSIVE_TREE_SQL.format(table="part"),
    tags=("sql", "recursive-cte", "hierarchy"),
)
def recursive_cte_part_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native WITH RECURSIVE (new in Spark 4): transitive parent-chain
    walk over the implicit binary tree parent(k) = floor(k/2) on part
    keys — the BOM/org-chart traversal pattern expressed declaratively
    and executed by the engine's own recursion (Catalyst plans each
    iteration as a union step with the same distributed operators as the
    hand-rolled bfs loop in operators/graph.py — this query is the
    SQL-surface witness that the engine covers recursive queries without
    driver-side loops). Depth distribution = floor(log2(k)) bucket sizes,
    pure integers; the oracle runs the identical recursive SQL in
    DuckDB."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    view = sf_view(
        spark, load_table(spark, sf_dir, "part"), "rcte_part", sf_dir
    )
    return spark.sql(_RECURSIVE_TREE_SQL.format(table=view))


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT n_nationkey AS k, NULLIF(n_nationkey % 5, 0) AS cohort
      FROM nation
    ), ns AS (
      SELECT a.cohort, COUNT(*) AS n_pairs_nullsafe
      FROM c a JOIN c b
        ON a.cohort IS NOT DISTINCT FROM b.cohort AND a.k < b.k
      GROUP BY a.cohort
    ), eq AS (
      SELECT a.cohort, COUNT(*) AS n_pairs_eq
      FROM c a JOIN c b ON a.cohort = b.cohort AND a.k < b.k
      GROUP BY a.cohort
    )
    SELECT CAST(ns.cohort AS INT) AS cohort,
           CAST(ns.n_pairs_nullsafe AS BIGINT) AS n_pairs_nullsafe,
           CAST(COALESCE(eq.n_pairs_eq, 0) AS BIGINT) AS n_pairs_eq
    FROM ns LEFT JOIN eq ON ns.cohort IS NOT DISTINCT FROM eq.cohort
    ORDER BY ns.cohort NULLS FIRST
    """,
    tags=("join", "null-safe", "semantics"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (`<=>` / IS NOT DISTINCT FROM) vs plain
    `=`: pair counts per nullable cohort show the standard join silently
    DROPPING the NULL cohort while the null-safe join matches it — the
    semantics every SCD merge / dedup reconciliation on optional keys
    depends on (Spark plans `<=>` as a hash join on a null-wrapped key,
    not a nested loop, so the null bucket costs the same as any other)."""
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("k"),
        F.expr("nullif(n_nationkey % 5, 0)").cast("int").alias("cohort"),
    )
    a = n.select(F.col("k").alias("ka"), F.col("cohort").alias("ca"))
    b = n.select(F.col("k").alias("kb"), F.col("cohort").alias("cb"))
    ns = (
        a.join(b, a["ca"].eqNullSafe(b["cb"]) & (a["ka"] < b["kb"]))
        .groupBy(F.col("ca").alias("cohort"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs_nullsafe"))
    )
    eq = (
        a.join(b, (a["ca"] == b["cb"]) & (a["ka"] < b["kb"]))
        .groupBy(F.col("ca").alias("cohort"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs_eq"))
    )
    return (
        ns.join(eq, ns["cohort"].eqNullSafe(eq["cohort"]), "left")
        .select(
            ns["cohort"].alias("cohort"),
            "n_pairs_nullsafe",
            F.coalesce("n_pairs_eq", F.lit(0)).cast("bigint").alias(
                "n_pairs_eq"
            ),
        )
        .orderBy(F.col("cohort").asc_nulls_first())
    )


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS attributed
      FROM events
    ), conv AS (
      SELECT COALESCE(attributed, 'none') AS attributed_type
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT attributed_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / SUM(COUNT(*)) OVER (), 4) AS share
    FROM conv GROUP BY attributed_type
    ORDER BY attributed_type
    """,
    tags=("events", "attribution", "window"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the
    user's most recent strictly-earlier non-purchase event ('none' when
    the purchase opens the history) — the marketing-analytics primitive,
    expressed as one IGNORE NULLS last_value window over (ts, event_id)
    total order (the LEAD/LAG tie-break discipline). State per user is
    one running value; no self-join, no sessionization needed."""
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(
            W.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        .alias("attributed"),
    )
    conv = seq.where(F.col("event_type") == "purchase").select(
        F.coalesce("attributed", F.lit("none")).alias("attributed_type")
    )
    return (
        conv.groupBy("attributed_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_conversions"))
        .withColumn(
            "share",
            F.round(
                F.col("n_conversions").cast("double")
                / F.sum("n_conversions").over(W.partitionBy()),
                4,
            ),
        )
        .orderBy("attributed_type")
    )


@query(
    "events_sliding7_quantiles_hist",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100) AS BIGINT) AS bucket,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), days AS (SELECT DISTINCT day FROM daily),
    win AS (
      SELECT d.day, h.bucket, SUM(h.cnt) AS cnt
      FROM days d JOIN daily h ON h.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day, h.bucket
    ), tot AS (SELECT day, SUM(cnt) AS n FROM win GROUP BY day),
    cum AS (
      SELECT w.day, w.bucket, t.n,
             SUM(w.cnt) OVER (PARTITION BY w.day ORDER BY w.bucket
                              ROWS UNBOUNDED PRECEDING) AS c
      FROM win w JOIN tot t ON t.day = w.day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           MIN(CASE WHEN c >= CEIL(0.50 * n) THEN bucket END) / 100.0 AS p50,
           MIN(CASE WHEN c >= CEIL(0.95 * n) THEN bucket END) / 100.0 AS p95,
           MIN(CASE WHEN c >= CEIL(0.99 * n) THEN bucket END) / 100.0 AS p99
    FROM cum GROUP BY day ORDER BY day
    """,
    tags=("events", "histogram", "quantile", "sliding-window"),
)
def events_sliding7_quantiles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding p50/p95/p99 from ADDITIVE fixed-width histograms —
    the mergeable-state quantile path completing the sliding-window
    trilogy (distinct = bitmap/HLL/KMV, frequency = CMS, quantiles =
    histogram): per (day, 0.01-wide bucket) counts merge across windows
    by plain addition, so the sliding series costs O(days × buckets) tiny
    sums, never a re-sort of raw values — the HDR-histogram production
    pattern for latency dashboards. Nearest-rank quantiles resolve to
    bucket lower bounds (exact to the 0.01 granularity; closeness to
    percentile() asserted in tests/test_breadth.py). All arithmetic is
    integer counts plus one identical floor/ceil per engine."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("bigint").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    contrib = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
        "bucket",
        "cnt",
    ).select(F.date_add("day", F.col("i")).alias("day"), "bucket", "cnt")
    # observed days come from the daily aggregate (identical day values),
    # not a second scan of the raw fact table
    observed = daily.select("day").distinct()
    win = (
        contrib.join(observed, "day", "left_semi")
        .groupBy("day", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    tot = win.groupBy("day").agg(F.sum("cnt").alias("n"))
    cum = win.join(tot, "day").withColumn(
        "c",
        F.sum("cnt").over(
            W.partitionBy("day").orderBy("bucket").rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )

    def q(p: float):
        return (
            F.min(
                F.when(
                    F.col("c") >= F.ceil(F.lit(p) * F.col("n")),
                    F.col("bucket"),
                )
            )
            / 100.0
        )

    return (
        cum.groupBy("day")
        .agg(q(0.50).alias("p50"), q(0.95).alias("p95"), q(0.99).alias("p99"))
        .select(F.col("day").cast("string").alias("day"), "p50", "p95", "p99")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Round-9 seeds: SQL surfaces not yet driver-covered (LATERAL, UNPIVOT,
# regr_* aggregates, bit aggregates, percentile_disc, try_* error handling,
# max_by). Each is a distinct engine feature a migrating user would reach
# for, with an exact or rounded-decimal cross-engine story.
# --------------------------------------------------------------------------


@query(
    "customer_recent_orders_lateral",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           CAST(CAST(o.o_orderdate AS TIMESTAMP) AS TIMESTAMP) AS o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_orderdate, o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
    ) o
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey % 10 = 0
    ORDER BY c.c_custkey, o.o_orderkey
    """,
    tags=("lateral", "correlated", "topk-per-group"),
)
def customer_recent_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 4 supports the SQL-standard
    form): each BUILDING-segment customer joins its own 2 most recent
    orders — the per-row parameterized-subquery surface, distinct from
    window top-k (orders_latest3_per_customer) because the inner query
    references the outer row directly. Catalyst decorrelates the LATERAL
    into a ranked window under the hood — same scale shape as the window
    formulation, so no per-customer re-execution. Unique (date, orderkey)
    tie-break keeps the pick total-ordered; DATE is cast to TIMESTAMP on
    both sides (the parity canonicalization never compares raw DATE)."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    cust = sf_view(spark, load_table(spark, sf_dir, "customer"), "lat_cust", sf_dir)
    orders = sf_view(spark, load_table(spark, sf_dir, "orders"), "lat_ord", sf_dir)
    return spark.sql(f"""
        SELECT c.c_custkey, o.o_orderkey,
               CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
               CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
        FROM {cust} c,
        LATERAL (
          SELECT o_orderkey, o_orderdate, o_totalprice
          FROM {orders}
          WHERE o_custkey = c.c_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 2
        ) o
        WHERE c.c_mktsegment = 'BUILDING' AND c.c_custkey % 10 = 0
        ORDER BY c.c_custkey, o.o_orderkey
    """)


@query(
    "orders_unpivot_price_components",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
               AS discount_amt,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_tax AS DECIMAL(8,2))) AS DOUBLE) AS tax_amt
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'base_price' AS component,
           ROUND(base_price, 2) AS amount FROM agg
    UNION ALL
    SELECT l_returnflag, 'discount_amt', ROUND(discount_amt, 2) FROM agg
    UNION ALL
    SELECT l_returnflag, 'tax_amt', ROUND(tax_amt, 2) FROM agg
    ORDER BY l_returnflag, component
    """,
    tags=("unpivot", "melt", "relational"),
)
def orders_unpivot_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide per-returnflag money breakdown folds into
    tidy (flag, component, amount) rows via the SQL-standard UNPIVOT
    clause — the inverse of pivot_status_by_priority's surface. Money is
    summed as exact rounded-term decimals BEFORE the unpivot (both
    engines see identical doubles — the q1 exact-decimal-product
    idiom), so the melt itself is pure reshaping
    — zero float risk. At scale UNPIVOT is a map-side generator (one
    output row per cell), no shuffle beyond the feeding aggregate's."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    li = sf_view(spark, load_table(spark, sf_dir, "lineitem"), "unpiv_li", sf_dir)
    return spark.sql(f"""
        WITH agg AS (
          SELECT l_returnflag,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS base_price,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
                   AS discount_amt,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_tax AS DECIMAL(8,2))) AS DOUBLE) AS tax_amt
          FROM {li} GROUP BY l_returnflag
        )
        SELECT l_returnflag, component, ROUND(amount, 2) AS amount
        FROM agg
        UNPIVOT (amount FOR component IN (base_price, discount_amt, tax_amt))
        ORDER BY l_returnflag, component
    """)


@query(
    "lineitem_price_qty_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(REGR_SLOPE(CAST(l_extendedprice AS DOUBLE),
                            CAST(l_quantity AS DOUBLE)), 4) AS slope,
           ROUND(REGR_INTERCEPT(CAST(l_extendedprice AS DOUBLE),
                                CAST(l_quantity AS DOUBLE)), 4) AS intercept,
           ROUND(REGR_R2(CAST(l_extendedprice AS DOUBLE),
                         CAST(l_quantity AS DOUBLE)), 6) AS r2,
           ROUND(CORR(CAST(l_extendedprice AS DOUBLE),
                      CAST(l_quantity AS DOUBLE)), 6) AS price_qty_corr
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("aggregation", "regression", "statistics"),
)
def lineitem_price_qty_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in linear-regression aggregates (REGR_SLOPE / INTERCEPT /
    R2, CORR) of extended price on quantity per return flag — the
    one-pass OLS surface both engines implement as merge-able moment
    sketches (partial+final, constant state per group: the 100 TB shape
    for 'fit a line' without collecting anything). Rounded to 4/6 dp:
    both engines accumulate the same population moments in different
    orders, and the statistics are smooth functions of them — the
    rounding absorbs the last-ulp summation differences (same discipline
    as events_autocorr_lag1)."""
    li = load_table(spark, sf_dir, "lineitem")
    y = F.col("l_extendedprice").cast("double")
    x = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.regr_slope(y, x), 4).alias("slope"),
            F.round(F.regr_intercept(y, x), 4).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.corr(y, x), 6).alias("price_qty_corr"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "orders_key_bitops_by_status",
    oracle="""
    SELECT o_orderstatus,
           CAST(BIT_AND(o_orderkey) AS BIGINT) AS key_and,
           CAST(BIT_OR(o_orderkey) AS BIGINT) AS key_or,
           CAST(BIT_XOR(o_orderkey) AS BIGINT) AS key_xor,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("aggregation", "bitwise"),
)
def orders_key_bitops_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (BIT_AND / BIT_OR / BIT_XOR) over the order
    keys per status — the checksum/bitmask folding surface (XOR-fold is
    the classic replica-diff trick: equal sets XOR to 0). All three are
    commutative + associative on exact BIGINTs, hence bit-identical
    under any partitioning with zero float discipline needed, and
    partial+final aggregation keeps 8 bytes of state per group."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.bit_and("o_orderkey").cast("bigint").alias("key_and"),
            F.bit_or("o_orderkey").cast("bigint").alias("key_or"),
            F.bit_xor("o_orderkey").cast("bigint").alias("key_xor"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "orders_price_percentile_disc",
    oracle="""
    SELECT o_orderpriority,
           CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                AS DOUBLE) AS p25,
           CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                AS DOUBLE) AS p50,
           CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY o_totalprice)
                AS DOUBLE) AS p75,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("aggregation", "percentile", "order-statistics"),
)
def orders_price_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (SQL-standard PERCENTILE_DISC WITHIN GROUP):
    the smallest actual order price whose cumulative distribution reaches
    p — an order statistic, NOT an interpolation, so the result is an
    exact value from the column and the cross-engine float minefield of
    interpolating percentiles (see the r6 percentile() lesson in
    queries/helpers.py) does not exist: no rounding guard at all.

    SCALE NOTE: this registration is the SQL-standard WITHIN GROUP
    syntax-surface exhibit and is allowlisted in
    tests/test_percentile_discipline.py — the builtin buffers each
    o_orderpriority group (SF-growing) in one aggregation state. The
    at-scale path for the same statistic is
    operators/quantile.py group_quantiles_disc (partition-bounded,
    bit-identical; see customer_acctbal_decile_bounds)."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    o = sf_view(spark, load_table(spark, sf_dir, "orders"), "pdisc_ord", sf_dir)
    return spark.sql(f"""
        SELECT o_orderpriority,
               CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                    AS DOUBLE) AS p25,
               CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                    AS DOUBLE) AS p50,
               CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY o_totalprice)
                    AS DOUBLE) AS p75,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM {o} GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)


@query(
    "events_props_try_arithmetic",
    oracle="""
    WITH k AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(kv) AS BIGINT) AS n_k,
           CAST(COUNT(*) FILTER (kv IS NOT NULL AND kv % 5 = 0)
                AS BIGINT) AS n_div_null,
           ROUND(CAST(SUM(CASE WHEN kv IS NOT NULL AND kv % 5 <> 0
                    THEN CAST(ROUND(1.0 / (kv % 5), 10) AS DECIMAL(28,10))
               END) AS DOUBLE), 6) AS sum_inv
    FROM k GROUP BY event_type ORDER BY event_type
    """,
    tags=("scalar", "try", "error-handling", "json"),
)
def events_props_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe TRY_* arithmetic: TRY_CAST parses the JSON payload value
    (NULL, never an error, on absent/malformed keys) and TRY_DIVIDE
    yields NULL on the k % 5 == 0 zero divisors instead of failing the
    job — the error-handling surface a curation pipeline needs when one
    poisoned row must not kill a 100 TB pass. The NULL bookkeeping
    (n_k / n_div_null) is asserted exactly; the surviving reciprocals
    fold as rounded-term decimals (order-free exact sum, one final
    double)."""
    e = load_table(spark, sf_dir, "events")
    kv = F.try_to_number(F.get_json_object("props", "$.k"), F.lit("999999999")).cast("bigint")
    inv = F.try_divide(F.lit(1.0), (kv % 5).cast("double"))
    return (
        e.select("event_type", kv.alias("kv"), inv.alias("inv"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("kv").cast("bigint").alias("n_k"),
            F.count(F.when(F.col("kv").isNotNull() & (F.col("kv") % 5 == 0), 1))
            .cast("bigint")
            .alias("n_div_null"),
            F.round(
                F.sum(
                    F.when(
                        F.col("inv").isNotNull(),
                        F.round(F.col("inv"), 10).cast("decimal(28,10)"),
                    )
                ).cast("double"),
                6,
            ).alias("sum_inv"),
        )
        .orderBy("event_type")
    )


@query(
    "supplier_best_part_maxby",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS rev
      FROM lineitem GROUP BY l_suppkey, l_partkey
    ), ranked AS (
      SELECT l_suppkey, l_partkey, rev,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                ORDER BY rev DESC, l_partkey DESC) AS rn
      FROM rev
    )
    SELECT l_suppkey, l_partkey AS best_partkey,
           ROUND(rev, 2) AS best_rev
    FROM ranked WHERE rn = 1 ORDER BY l_suppkey
    """,
    tags=("aggregation", "argmax", "max_by"),
)
def supplier_best_part_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_BY with a composite total-order key: each supplier's highest-
    revenue part, ties broken by the larger part key (the struct ordering
    (rev, partkey) makes the argmax deterministic — bare MAX_BY on a
    tied metric is engine-arbitrary, the same discipline as
    agg_mode_exact). One partial+final aggregation, no window over the
    fact table; the oracle states the same pick as a ROW_NUMBER spec.
    Revenue is the exact decimal sum cast to double per group (no float
    accumulation order)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    return (
        rev.groupBy("l_suppkey")
        .agg(
            F.max_by(
                F.col("l_partkey"), F.struct(F.col("rev"), F.col("l_partkey"))
            ).alias("best_partkey"),
            F.round(F.max(F.struct(F.col("rev"), F.col("l_partkey"))).getField("rev"), 2).alias(
                "best_rev"
            ),
        )
        .orderBy("l_suppkey")
    )


@query(
    "events_xml_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid,
           CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    tags=("scalar", "xml", "semi-structured", "roundtrip"),
)
def events_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML as a semi-structured column (Spark 4 to_xml/from_xml): each
    event serializes to an XML fragment, the fragments are parsed BACK
    with an explicit schema, and the aggregates run over the re-extracted
    fields — a serialization-identity check, so the oracle is simply the
    same aggregate over the RAW columns (any XML writer/parser asymmetry
    — escaping, whitespace, type coercion — breaks the hash). Both
    directions are JVM-side StaxXML, no Python; value survives the text
    roundtrip via round-to-2dp before the exact decimal sum on BOTH
    sides (XML carries the double's full repr, so the parse is exact —
    the rounding is the usual cross-engine sum discipline, not a
    roundtrip patch)."""
    e = load_table(spark, sf_dir, "events")
    xml = e.select(
        F.to_xml(
            F.struct(
                F.col("event_type"),
                F.col("user_id"),
                F.col("value"),
            )
        ).alias("x")
    )
    back = xml.select(
        F.from_xml(
            F.col("x"), "event_type STRING, user_id BIGINT, value DOUBLE"
        ).alias("r")
    ).select("r.event_type", "r.user_id", "r.value")
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("user_id").cast("bigint").alias("sum_uid"),
            F.sum(F.round("value", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query(
    "events_gap_fill_forward",
    oracle="""
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY CAST(ts AS DATE)
    ), bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM d
    ), cal AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
      FROM bounds
    ), joined AS (
      SELECT cal.day, d.n,
             CAST(SUM(CASE WHEN d.n IS NOT NULL THEN 1 ELSE 0 END)
                  OVER (ORDER BY cal.day) AS BIGINT) AS grp
      FROM cal LEFT JOIN d ON d.day = cal.day
    ), filled AS (
      SELECT day, n, MAX(n) OVER (PARTITION BY grp) AS n_filled,
             n IS NULL AS was_gap
      FROM joined
    )
    SELECT CAST(CAST(day AS TIMESTAMP) AS TIMESTAMP) AS day,
           CAST(n_filled AS BIGINT) AS n_filled,
           was_gap
    FROM filled ORDER BY day
    """,
    tags=("window", "gap-fill", "time-series"),
)
def events_gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling with forward fill (LOCF): the daily purchase
    counts join onto a complete generated calendar (sequence over the
    observed [min, max] span) and missing days carry the LAST OBSERVED
    value via last_value(..., ignoreNulls) — the standard
    time-series-densification op every warehouse needs before rolling
    metrics. Spark side: one sequence+explode (map-side fan-out), one
    left join, one ordered window. The oracle expresses the same fill as
    a grouped running MAX over gap-group ids (DuckDB's last_value lacks
    IGNORE NULLS in the window form — two spellings, one semantic). DATE
    is cast to TIMESTAMP on both sides per the parity canonicalization."""
    e = load_table(spark, sf_dir, "events")
    d = (
        e.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    bounds = d.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    joined = cal.join(d, "day", "left")
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        joined.select(
            F.col("day").cast("timestamp").alias("day"),
            F.last("n", ignorenulls=True).over(w).alias("n_filled"),
            F.col("n").isNull().alias("was_gap"),
        )
        .orderBy("day")
    )


@query(
    "orders_price_ntile_deciles",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority, o_totalprice,
             NTILE(10) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS decile
      FROM orders
    )
    SELECT o_orderpriority, decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM t GROUP BY o_orderpriority, decile
    ORDER BY o_orderpriority, decile
    """,
    tags=("window", "ntile", "quantile-bucketing", "fixture-only"),
)
def orders_price_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXTURE-ONLY (registry tag ``fixture-only``): NTILE decile
    bucketing per priority — the SQL-standard equal-count binning both
    engines implement with the identical floor/remainder rule, made
    deterministic by the (price, orderkey) total order (NTILE over a tied
    prefix is engine-arbitrary otherwise — the same tie-break discipline
    as agg_mode_exact). Decile boundaries (lo/hi) are exact column
    values, no interpolation. The window partition is the 5-value
    priority key, so each window task sorts ~|orders|/5 rows — a
    single-task 20%-of-table sort at scale; the production formulation is
    ``orders_price_decile_buckets_scalable`` (exact PERCENTILE_DISC cut
    table from operators/quantile.py group_quantiles_disc, broadcast
    comparison — no data-sized window), the same twin discipline as
    events_rfm_segments / events_rfm_segments_scalable."""
    from distributed_graph_database_system_spark.queries.helpers import sf_view

    o = sf_view(spark, load_table(spark, sf_dir, "orders"), "ntile_ord", sf_dir)
    return spark.sql(f"""
        WITH t AS (
          SELECT o_orderpriority, o_totalprice,
                 NTILE(10) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey) AS decile
          FROM {o}
        )
        SELECT o_orderpriority, decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
               CAST(MAX(o_totalprice) AS DOUBLE) AS hi
        FROM t GROUP BY o_orderpriority, decile
        ORDER BY o_orderpriority, decile
    """)


@query(
    "orders_price_decile_buckets_scalable",
    oracle="""
    WITH cuts AS (
      SELECT o_orderpriority,
             PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY o_totalprice) AS c1,
             PERCENTILE_DISC(0.2) WITHIN GROUP (ORDER BY o_totalprice) AS c2,
             PERCENTILE_DISC(0.3) WITHIN GROUP (ORDER BY o_totalprice) AS c3,
             PERCENTILE_DISC(0.4) WITHIN GROUP (ORDER BY o_totalprice) AS c4,
             PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS c5,
             PERCENTILE_DISC(0.6) WITHIN GROUP (ORDER BY o_totalprice) AS c6,
             PERCENTILE_DISC(0.7) WITHIN GROUP (ORDER BY o_totalprice) AS c7,
             PERCENTILE_DISC(0.8) WITHIN GROUP (ORDER BY o_totalprice) AS c8,
             PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS c9
      FROM orders GROUP BY o_orderpriority
    ), scored AS (
      SELECT o.o_orderpriority, o.o_totalprice,
             1 + CAST(o_totalprice > c1 AS INT) + CAST(o_totalprice > c2 AS INT)
               + CAST(o_totalprice > c3 AS INT) + CAST(o_totalprice > c4 AS INT)
               + CAST(o_totalprice > c5 AS INT) + CAST(o_totalprice > c6 AS INT)
               + CAST(o_totalprice > c7 AS INT) + CAST(o_totalprice > c8 AS INT)
               + CAST(o_totalprice > c9 AS INT) AS decile
      FROM orders o JOIN cuts USING (o_orderpriority)
    )
    SELECT o_orderpriority, decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM scored GROUP BY o_orderpriority, decile
    ORDER BY o_orderpriority, decile
    """,
    tags=("aggregation", "quantile-bucketing", "scalable"),
)
def orders_price_decile_buckets_scalable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The cluster-scale twin of orders_price_ntile_deciles: VALUE-decile
    bucketing against an exact per-priority PERCENTILE_DISC cut table
    instead of a data-sized NTILE window. Semantics differ deliberately —
    NTILE is ordinal (equal bucket SIZES, ties split across buckets by
    the tie-break column) and inherently sorts each window partition in
    one task; value deciles (decile = 1 + #cuts strictly below the
    price) depend only on the nine cut points, so the assignment pass is
    an embarrassingly parallel comparison against a broadcast 5×9 cut
    table — no data-sized window anywhere. The cuts come from
    group_quantiles_disc (operators/quantile.py): exact ORDER STATISTICS
    (the value at rank ceil(q·n), both engines' PERCENTILE_DISC
    definition — verified rank-by-rank in tests/test_quantile.py) computed
    with the two-pass global-rank machinery whose per-task state is
    bounded by the physical partition size, never the group size. Order
    statistics are exact column values, so the cut comparisons carry ZERO
    cross-engine float risk — no rounding guard at all (the reason disc,
    not interpolated, cuts feed bucketing)."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
    )
    qs = [i / 10 for i in range(1, 10)]
    cuts = group_quantiles_disc(o, "price", qs, ["o_orderpriority"])
    cut_cols = [_qcolname(q) for q in qs]  # one naming source of truth
    decile = F.lit(1)
    for c in cut_cols:
        decile = decile + (F.col("price") > F.col(c)).cast("int")
    return (
        o.join(F.broadcast(cuts), "o_orderpriority")
        .select("o_orderpriority", "price", decile.alias("decile"))
        .groupBy("o_orderpriority", "decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("price").cast("double").alias("lo"),
            F.max("price").cast("double").alias("hi"),
        )
        .orderBy("o_orderpriority", "decile")
    )
