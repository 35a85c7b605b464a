"""Consolidated driver-window queries (round 3).

The driver records CORRECTNESS rows for the FIRST 50 registry entries only,
so each SURVEY §2.2 family must land inside that window. These queries merge
same-family singles into one tagged result (a union with a discriminator
column, or one multi-column pass over the same scan) so all 30 rows fit in
50 entries. The single-purpose originals stay registered AFTER the window —
bench.py and pytest still exercise them — and each merged oracle is composed
from the originals' already-verified oracle SQL wherever possible.

Column-name discipline (driver hash compare): every output column is aliased
identically on both sides, and tag columns make unioned sub-results
disjoint so a value collision across families can't mask a mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.graph import bfs, dfs_leaves
from distributed_graph_database_system_spark.operators.textstats import (
    bpe_ish_token_count,
    lang_id,
    quality_score,
    rolling_fingerprint,
    ws_token_count,
)
from distributed_graph_database_system_spark.queries import (  # noqa: F401  (import for registration + reuse)
    breadth as _breadth,
    graph as _graph,
    llm as _llm,
    relational as _rel,
)
from distributed_graph_database_system_spark.queries.helpers import dec
from distributed_graph_database_system_spark.queries.registry import oracle_of, query
from distributed_graph_database_system_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# Joins: outer flavors / semi+anti
# ---------------------------------------------------------------------------


@query(
    "join_outer",
    oracle=f"""
    WITH lo AS ({oracle_of("join_left_outer")}),
         fo AS ({oracle_of("join_full_outer")})
    SELECT 'left_outer' AS side, c_custkey AS jkey, n_orders AS cnt,
           total_spent AS val
    FROM lo
    UNION ALL
    SELECT 'full_outer' AS side, nationkey AS jkey, n_customers AS cnt,
           CAST(n_suppliers AS DOUBLE) AS val
    FROM fo
    """,
    tags=("join", "outer", "merged"),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer (customer⟕orders rollup) and full-outer (customers vs
    suppliers per nation) in one tagged result; plans are identical to the
    standalone queries (the union is two independent subtrees)."""
    lo = _rel.join_left_outer(spark, sf_dir).select(
        F.lit("left_outer").alias("side"),
        F.col("c_custkey").alias("jkey"),
        F.col("n_orders").alias("cnt"),
        F.col("total_spent").alias("val"),
    )
    fo = _rel.join_full_outer(spark, sf_dir).select(
        F.lit("full_outer").alias("side"),
        F.col("nationkey").alias("jkey"),
        F.col("n_customers").alias("cnt"),
        F.col("n_suppliers").cast("double").alias("val"),
    )
    return lo.unionByName(fo)


@query(
    "join_semi_anti",
    oracle=f"""
    SELECT 'semi' AS which, c_custkey, c_name
    FROM ({oracle_of("join_semi")})
    UNION ALL
    SELECT 'anti' AS which, c_custkey, c_name
    FROM ({oracle_of("join_anti")})
    """,
    tags=("join", "semi", "anti", "merged"),
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    semi = _rel.join_semi(spark, sf_dir).select(
        F.lit("semi").alias("which"), "c_custkey", "c_name"
    )
    anti = _rel.join_anti(spark, sf_dir).select(
        F.lit("anti").alias("which"), "c_custkey", "c_name"
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation: rollup + cube + grouping sets
# ---------------------------------------------------------------------------


@query(
    "agg_grouping_multi",
    oracle=f"""
    SELECT 'rollup' AS tag, r_name AS g1, n_name AS g2, n_customers AS cnt,
           CAST(NULL AS DOUBLE) AS val
    FROM ({oracle_of("agg_rollup")})
    UNION ALL
    SELECT 'cube' AS tag, o_orderstatus AS g1, o_orderpriority AS g2,
           n_orders AS cnt, total AS val
    FROM ({oracle_of("agg_cube")})
    UNION ALL
    SELECT 'grouping_sets' AS tag, l_returnflag AS g1, l_linestatus AS g2,
           CAST(NULL AS BIGINT) AS cnt, sum_qty AS val
    FROM ({oracle_of("agg_grouping_sets")})
    """,
    tags=("aggregation", "rollup", "cube", "grouping-sets", "merged"),
)
def agg_grouping_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP, CUBE and GROUPING SETS in one tagged union — each subtree is
    the standalone query's Expand-based single-shuffle aggregation."""
    ro = _rel.agg_rollup(spark, sf_dir).select(
        F.lit("rollup").alias("tag"),
        F.col("r_name").alias("g1"),
        F.col("n_name").alias("g2"),
        F.col("n_customers").alias("cnt"),
        F.lit(None).cast("double").alias("val"),
    )
    cu = _rel.agg_cube(spark, sf_dir).select(
        F.lit("cube").alias("tag"),
        F.col("o_orderstatus").alias("g1"),
        F.col("o_orderpriority").alias("g2"),
        F.col("n_orders").alias("cnt"),
        F.col("total").alias("val"),
    )
    gs = _rel.agg_grouping_sets(spark, sf_dir).select(
        F.lit("grouping_sets").alias("tag"),
        F.col("l_returnflag").alias("g1"),
        F.col("l_linestatus").alias("g2"),
        F.lit(None).cast("bigint").alias("cnt"),
        F.col("sum_qty").alias("val"),
    )
    return ro.unionByName(cu).unionByName(gs)


# ---------------------------------------------------------------------------
# Window functions: rank family + lag/lead + running frames + value funcs
# ---------------------------------------------------------------------------


@query(
    "window_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROW_NUMBER() OVER wu AS BIGINT) AS rn,
           CAST(RANK() OVER wd AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER wd AS BIGINT) AS drnk,
           lag(o_totalprice)  OVER wu AS prev_price,
           lead(o_totalprice) OVER wu AS next_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           COUNT(*) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS window_n,
           first_value(o_totalprice) OVER wf AS first_price,
           last_value(o_totalprice)  OVER wf AS last_price,
           nth_value(o_totalprice, 2) OVER wf AS second_price
    FROM orders
    WINDOW wu AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wd AS (PARTITION BY o_custkey ORDER BY o_orderdate),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "merged"),
)
def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole window-function family over ONE scan and ONE shuffle: all
    three specs share the o_custkey partition key, so Catalyst plans a
    single exchange + sort feeding every function. rank/dense_rank order by
    date alone (real ties → deterministic rank values); row-number/lag/
    frames order by the unique (date, orderkey) pair."""
    o = load_table(spark, sf_dir, "orders")
    wu = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wd = W.partitionBy("o_custkey").orderBy("o_orderdate")
    wf = wu.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(wu).cast("bigint").alias("rn"),
        F.rank().over(wd).cast("bigint").alias("rnk"),
        F.dense_rank().over(wd).cast("bigint").alias("drnk"),
        F.lag("o_totalprice").over(wu).alias("prev_price"),
        F.lead("o_totalprice").over(wu).alias("next_price"),
        F.sum(dec("o_totalprice"))
        .over(wu.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("double")
        .alias("running_total"),
        F.count("*").over(wu.rowsBetween(-2, W.currentRow)).alias("window_n"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wf).alias("second_price"),
    )


# ---------------------------------------------------------------------------
# Sort/limit + per-group top-k
# ---------------------------------------------------------------------------


@query(
    "sort_topk",
    oracle=f"""
    SELECT 'global' AS which, o_orderkey AS skey, o_totalprice AS sval
    FROM ({oracle_of("sort_limit")})
    UNION ALL
    SELECT 'per_group' AS which, p_partkey AS skey, p_retailprice AS sval
    FROM ({oracle_of("topk_per_group")})
    """,
    tags=("sort", "topk", "merged"),
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — per-partition heaps, k-row
    driver merge) and per-group top-k (row_number ≤ k — partial sort per
    partition) in one tagged result."""
    g = _rel.sort_limit(spark, sf_dir).select(
        F.lit("global").alias("which"),
        F.col("o_orderkey").alias("skey"),
        F.col("o_totalprice").alias("sval"),
    )
    p = _rel.topk_per_group(spark, sf_dir).select(
        F.lit("per_group").alias("which"),
        F.col("p_partkey").alias("skey"),
        F.col("p_retailprice").alias("sval"),
    )
    return g.unionByName(p)


# ---------------------------------------------------------------------------
# Scalar families: string + date/time + math over one scan
# ---------------------------------------------------------------------------


@query(
    "scalar_funcs",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderstatus) AS status_uc,
           lower(o_orderpriority) AS prio_lc,
           substring(o_orderpriority, 1, 3) AS prio_prefix,
           length(o_orderpriority) AS prio_len,
           CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS BIGINT) AS prio_num,
           concat_ws(':', o_orderstatus, o_orderpriority) AS status_prio,
           replace(o_orderpriority, '-', '_') AS prio_snake,
           trim(o_orderstatus) AS status_trim,
           CAST(levenshtein(substring(o_orderpriority, 3, 6), 'URGENT') AS INTEGER)
             AS lev_urgent,
           split_part(o_orderpriority, '-', 2) AS prio_word,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER)
             AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           round(o_totalprice, 1) AS price_r1,
           CAST(floor(o_totalprice) AS DOUBLE) AS price_floor,
           CAST(ceil(o_totalprice) AS DOUBLE) AS price_ceil,
           abs(o_totalprice - 100000) AS dist_100k,
           round(sqrt(o_totalprice), 6) AS price_sqrt,
           round(ln(o_totalprice + 1), 6) AS price_ln,
           CAST(o_orderkey % 10 AS BIGINT) AS key_mod,
           power(CAST(o_orderkey % 5 AS DOUBLE), 2) AS key_pow
    FROM orders
    """,
    tags=("scalar", "string", "datetime", "math", "merged"),
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + date/time + math scalar families as ONE projection over one
    scan of orders — 25 expressions, zero shuffles, fully codegen'd. The
    per-family standalone queries (string_funcs / date_funcs / math_funcs)
    remain registered for targeted debugging."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        # string family
        F.upper("o_orderstatus").alias("status_uc"),
        F.lower("o_orderpriority").alias("prio_lc"),
        F.substring("o_orderpriority", 1, 3).alias("prio_prefix"),
        F.length("o_orderpriority").alias("prio_len"),
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1)
        .cast("bigint")
        .alias("prio_num"),
        F.concat_ws(":", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.regexp_replace("o_orderpriority", r"-", "_").alias("prio_snake"),
        F.trim("o_orderstatus").alias("status_trim"),
        F.levenshtein(F.substring("o_orderpriority", 3, 6), F.lit("URGENT")).alias(
            "lev_urgent"
        ),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(2)).alias("prio_word"),
        # date/time family
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_y2k"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
        # math family
        F.round("o_totalprice", 1).alias("price_r1"),
        F.floor("o_totalprice").cast("double").alias("price_floor"),
        F.ceil("o_totalprice").cast("double").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 100000).alias("dist_100k"),
        F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("o_totalprice") + 1), 6).alias("price_ln"),
        (F.col("o_orderkey") % 10).alias("key_mod"),
        F.pow((F.col("o_orderkey") % 5).cast("double"), 2).alias("key_pow"),
    )


# ---------------------------------------------------------------------------
# Source/sink round-trips: csv + json + orc
# ---------------------------------------------------------------------------


@query(
    "source_roundtrips",
    oracle="""
    SELECT 'csv' AS fmt, o_orderstatus AS gkey, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'json' AS fmt, c_mktsegment AS gkey, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM customer GROUP BY c_mktsegment
    UNION ALL
    SELECT 'orc' AS fmt, p_brand AS gkey, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM part GROUP BY p_brand
    """,
    tags=("source", "sink", "csv", "json", "orc", "merged"),
)
def source_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three non-parquet format round-trips (write → read back →
    aggregate) in one tagged result; matching the oracle run on the
    original parquet proves each write/read path is lossless."""
    csv = _breadth.source_csv_roundtrip(spark, sf_dir).select(
        F.lit("csv").alias("fmt"),
        F.col("o_orderstatus").alias("gkey"),
        "n",
        "total",
    )
    js = _breadth.source_json_roundtrip(spark, sf_dir).select(
        F.lit("json").alias("fmt"),
        F.col("c_mktsegment").alias("gkey"),
        "n",
        F.col("total_bal").alias("total"),
    )
    orc = _breadth.source_orc_roundtrip(spark, sf_dir).select(
        F.lit("orc").alias("fmt"),
        F.col("p_brand").alias("gkey"),
        "n",
        F.col("total_price").alias("total"),
    )
    return csv.unionByName(js).unionByName(orc)


# ---------------------------------------------------------------------------
# Graph traversal goldens, tagged per fixture
# ---------------------------------------------------------------------------

_BFS_GOLDENS: dict[str, list[tuple[int, int]]] = {
    "g1": [(1, 0), (2, 1), (3, 1), (4, 2), (5, 2)],
    "g2": [(1, 0), (2, 1), (3, 1), (4, 2), (5, 3), (6, 4)],
    "g4": [(4, 0), (5, 1), (6, 2)],
    "g5": [(1, 0)],
}

_DFS_GOLDENS: dict[str, list[int]] = {
    "g1": [4, 5],
    "g2": [3, 6],
    "g3": [4],
    "g5": [],  # singleton: start never emitted → contributes no rows
}


def _bfs_cases(spark: SparkSession):
    g = _graph
    return {
        "g1": (g._edges(spark, g.G1), 1),
        "g2": (g._edges(spark, g.G2), 1),
        "g4": (g._edges(spark, g.G4), 4),
        "g5": (g._edges(spark, []), 1),
    }


@query(
    "graph_bfs_goldens",
    oracle=(
        "SELECT g, CAST(v AS BIGINT) AS vid, CAST(l AS INT) AS level FROM (VALUES "
        + ", ".join(
            f"('{g}', {v}, {lvl})"
            for g, golden in _BFS_GOLDENS.items()
            for v, lvl in golden
        )
        + ") AS t(g, v, l)"
    ),
    tags=("graph", "bfs", "merged"),
)
def graph_bfs_goldens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four FIXTURES.md §B BFS goldens (cyclic, diamond+cycle,
    disconnected, singleton) as one fixture-tagged result — the same four
    traversals as the standalone graph_bfs_g* queries."""
    parts = [
        bfs(edges, start=start).select(F.lit(g).alias("g"), "vid", "level")
        for g, (edges, start) in _bfs_cases(spark).items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "graph_dfs_goldens",
    oracle=(
        "SELECT g, CAST(v AS BIGINT) AS vid FROM (VALUES "
        + ", ".join(
            f"('{g}', {v})" for g, golden in _DFS_GOLDENS.items() for v in golden
        )
        + ") AS t(g, v)"
    ),
    tags=("graph", "dfs", "merged"),
)
def graph_dfs_goldens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four DFS leaf-set goldens (incl. the empty singleton case, whose
    absence from the VALUES oracle is the assertion) in one tagged result."""
    g = _graph
    cases = {
        "g1": (g._edges(spark, g.G1), 1),
        "g2": (g._edges(spark, g.G2), 1),
        "g3": (g._edges(spark, g.G3), 1),
        "g5": (g._edges(spark, []), 1),
    }
    parts = [
        dfs_leaves(edges, start=start).select(F.lit(tag).alias("g"), "vid")
        for tag, (edges, start) in cases.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Text analysis: tokens + quality + lang-id + fingerprint in one pass
# ---------------------------------------------------------------------------


@query(
    "text_analysis",
    oracle=f"""
    WITH t1 AS ({oracle_of("text_token_counts")}),
         t2 AS ({oracle_of("text_quality")}),
         t3 AS ({oracle_of("text_langid")}),
         t4 AS ({oracle_of("text_fingerprint")})
    SELECT t1.doc_id, t1.ws_tokens, t1.bpe_tokens, t2.quality, t3.pred_lang, t4.fp
    FROM t1 JOIN t2 USING (doc_id) JOIN t3 USING (doc_id) JOIN t4 USING (doc_id)
    """,
    tags=("llm", "text", "merged"),
)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts + quality score + language-ID + rolling fingerprint as
    ONE projection over one scan of documents — how a 100 TB text-analysis
    pass actually runs (every metric shares the tokenization subtree;
    Catalyst collapses the common subexpressions)."""
    d = _llm._docs_fanned(spark, sf_dir)
    return d.select(
        "doc_id",
        ws_token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("pred_lang"),
        rolling_fingerprint(F.col("text")).alias("fp"),
    )
