"""Round-12 pool, batch B: relational semantics, sources/sinks, sequences.

MERGE/upsert simulation, the NOT IN vs NOT EXISTS NULL trap, inline-
VALUES broadcast dimension decode, parquet schema evolution
(mergeSchema), PERMISSIVE corrupt-record CSV ingestion, multi-measure
pivot, behavioral trigram mining, and class-balanced sampling. Same
determinism discipline as seeds_r12.py (see its module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import (
    dec,
    dsum,
    scratch_dir,
    sf_view,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- MERGE / upsert semantics -----------------------------------------------


@query(
    "orders_merge_upsert_sim",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p
      FROM orders WHERE EXTRACT(year FROM o_orderdate) < 1998
    ), upd AS (
      SELECT o_orderkey AS k,
             CAST(o_totalprice AS DECIMAL(18,2))
               * CAST(1.10 AS DECIMAL(3,2)) AS p
      FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
        AND o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2))
               * CAST(1.00 AS DECIMAL(3,2))
      FROM orders WHERE EXTRACT(year FROM o_orderdate) >= 1998
    ), merged AS (
      SELECT CASE WHEN base.k IS NOT NULL AND upd.k IS NOT NULL
                    THEN 'update'
                  WHEN base.k IS NULL THEN 'insert'
                  ELSE 'unchanged' END AS action,
             base.p AS p_before,
             COALESCE(upd.p, base.p * CAST(1.00 AS DECIMAL(3,2))) AS p_after
      FROM base FULL OUTER JOIN upd ON base.k = upd.k
    )
    SELECT action, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(p_before) AS DOUBLE) AS rev_before,
           CAST(SUM(p_after) AS DOUBLE) AS rev_after
    FROM merged GROUP BY action ORDER BY action
    """,
    tags=("relational", "merge", "upsert", "full-outer"),
)
def orders_merge_upsert_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics expressed as a keyed full-outer join — the
    engine-level plan every table-format MERGE (Delta/Iceberg) lowers
    to: matched keys take the update branch, unmatched source keys
    insert, unmatched target keys pass through. The updates batch is
    derived deterministically from the fixture (1997 keys ≡ 0 mod 10
    get a 10% uplift; 1998+ rows are the insert stream). Price math
    stays in DECIMAL end-to-end — the uplift is ×DECIMAL(3,2), widening
    scale to 4, never rounded — so before/after revenue is exact. At
    100 TB the join shuffles on the primary key both sides; with a
    bucketed base table it would be shuffle-free on the target side."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    one = F.lit(1.00).cast("decimal(3,2)")
    base = o.where(yr < 1998).select(
        F.col("o_orderkey").alias("k"), dec("o_totalprice").alias("p")
    )
    upd = (
        o.where((yr == 1997) & (F.col("o_orderkey") % 10 == 0))
        .select(
            F.col("o_orderkey").alias("k"),
            (dec("o_totalprice") * F.lit(1.10).cast("decimal(3,2)")).alias(
                "p"
            ),
        )
        .unionAll(
            o.where(yr >= 1998).select(
                F.col("o_orderkey").alias("k"),
                (dec("o_totalprice") * one).alias("p"),
            )
        )
    )
    merged = base.alias("b").join(
        upd.alias("u"), F.col("b.k") == F.col("u.k"), "full_outer"
    ).select(
        F.when(
            F.col("b.k").isNotNull() & F.col("u.k").isNotNull(),
            F.lit("update"),
        )
        .when(F.col("b.k").isNull(), F.lit("insert"))
        .otherwise(F.lit("unchanged"))
        .alias("action"),
        F.col("b.p").alias("p_before"),
        F.coalesce(F.col("u.p"), F.col("b.p") * one).alias("p_after"),
    )
    return (
        merged.groupBy("action")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("p_before").cast("double").alias("rev_before"),
            F.sum("p_after").cast("double").alias("rev_after"),
        )
        .orderBy("action")
    )


# --- NOT IN vs NOT EXISTS under NULL ----------------------------------------


@query(
    "orders_not_in_null_trap",
    oracle="""
    WITH probe AS (
      SELECT c_custkey AS ck FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL SELECT CAST(NULL AS BIGINT)
    ),
    a AS (SELECT COUNT(*) AS n FROM orders
          WHERE o_custkey NOT IN (SELECT ck FROM probe)),
    b AS (SELECT COUNT(*) AS n FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.ck = o.o_custkey)),
    c AS (SELECT COUNT(*) AS n FROM orders
          WHERE o_custkey NOT IN (SELECT ck FROM probe WHERE ck IS NOT NULL))
    SELECT CAST(a.n AS BIGINT) AS n_not_in,
           CAST(b.n AS BIGINT) AS n_not_exists,
           CAST(c.n AS BIGINT) AS n_not_in_filtered
    FROM a CROSS JOIN b CROSS JOIN c
    """,
    tags=("relational", "subquery", "null-semantics", "anti-join"),
)
def orders_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN NULL trap, asserted cross-engine: a probe set holding
    one NULL makes `x NOT IN (probe)` three-valued-UNKNOWN for every
    row (n_not_in = 0), while NOT EXISTS — and NOT IN over the
    NULL-filtered probe — return the real anti-join count. Spark plans
    the first as a null-aware anti join (LeftAnti with
    IsNull-disjunct condition, a broadcast when the probe is small)
    and the other two as plain left-anti. The registry's join_anti /
    suppliers_without_returns_anti cover the clean path; this pins the
    semantics boundary a migration off the reference engine must
    preserve."""
    o = sf_view(spark, load_table(spark, sf_dir, "orders"), "nint_o", sf_dir)
    cst = sf_view(
        spark, load_table(spark, sf_dir, "customer"), "nint_c", sf_dir
    )
    return spark.sql(f"""
    WITH probe AS (
      SELECT c_custkey AS ck FROM {cst} WHERE c_mktsegment = 'BUILDING'
      UNION ALL SELECT CAST(NULL AS BIGINT)
    ),
    a AS (SELECT COUNT(*) AS n FROM {o}
          WHERE o_custkey NOT IN (SELECT ck FROM probe)),
    b AS (SELECT COUNT(*) AS n FROM {o} o
          WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.ck = o.o_custkey)),
    c AS (SELECT COUNT(*) AS n FROM {o}
          WHERE o_custkey NOT IN (SELECT ck FROM probe WHERE ck IS NOT NULL))
    SELECT CAST(a.n AS BIGINT) AS n_not_in,
           CAST(b.n AS BIGINT) AS n_not_exists,
           CAST(c.n AS BIGINT) AS n_not_in_filtered
    FROM a CROSS JOIN b CROSS JOIN c
    """)


# --- inline VALUES dimension decode ------------------------------------------


@query(
    "dim_values_broadcast_decode",
    oracle="""
    WITH dim(prio, tier, weight) AS (VALUES
      ('1-URGENT', 'critical', 3), ('2-HIGH', 'expedite', 2),
      ('3-MEDIUM', 'standard', 1), ('4-NOT SPECIFIED', 'standard', 1),
      ('5-LOW', 'deferred', 0))
    SELECT dim.tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * dim.weight)
                AS DOUBLE) AS weighted_rev
    FROM orders JOIN dim ON o_orderpriority = dim.prio
    GROUP BY dim.tier ORDER BY dim.tier
    """,
    tags=("join", "broadcast", "values", "dimension"),
)
def dim_values_broadcast_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-to-tier decode through an INLINE literal dimension — the
    everyday star-join where the dimension is five VALUES rows, not a
    table. The Spark side materializes the dim with createDataFrame and
    broadcast-hints it, so the plan is a map-side BroadcastHashJoin
    with zero shuffle on the fact scan (the decode pattern for enum
    columns at 100 TB). Weighted revenue multiplies exact decimals by
    the integer weight — no float until the final cast."""
    o = load_table(spark, sf_dir, "orders")
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "critical", 3),
            ("2-HIGH", "expedite", 2),
            ("3-MEDIUM", "standard", 1),
            ("4-NOT SPECIFIED", "standard", 1),
            ("5-LOW", "deferred", 0),
        ],
        "prio string, tier string, weight int",
    )
    return (
        o.join(F.broadcast(dim), o.o_orderpriority == dim.prio)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            F.sum(dec("o_totalprice") * F.col("weight"))
            .cast("double")
            .alias("weighted_rev"),
        )
        .orderBy("tier")
    )


# --- parquet schema evolution (mergeSchema) ----------------------------------


@query(
    "source_parquet_schema_evolution",
    oracle="""
    WITH evolved AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             CASE WHEN EXTRACT(year FROM o_orderdate) >= 1997
                  THEN o_orderpriority END AS prio
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(prio) AS BIGINT) AS n_with_priority,
           CAST(SUM(p) AS DOUBLE) AS revenue_all,
           CAST(SUM(CASE WHEN prio IS NOT NULL THEN p END) AS DOUBLE)
             AS revenue_evolved
    FROM evolved
    """,
    tags=("source", "parquet", "schema-evolution", "sink"),
)
def source_parquet_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema evolution through a parquet sink: batch 1 (pre-1997
    orders) is written WITHOUT the priority column, batch 2 (1997+)
    appends WITH it, and the read back uses mergeSchema=true so the
    union schema surfaces batch-1 rows with NULL priority — the
    add-a-column lifecycle every long-lived lake table goes through.
    The census asserts the NULL backfill and that revenue survives the
    round-trip exactly (decimal column through parquet is lossless).
    mergeSchema costs a footer read per file at planning time — the
    100 TB note is to pin the merged schema in the table catalog
    instead of re-inferring per query."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    path = scratch_dir("evolve", sf_dir, "orders_two_batches")
    b1 = o.where(yr < 1997).select(
        "o_orderkey", dec("o_totalprice").alias("p")
    )
    b2 = o.where(yr >= 1997).select(
        "o_orderkey",
        dec("o_totalprice").alias("p"),
        F.col("o_orderpriority").alias("prio"),
    )
    b1.write.mode("overwrite").parquet(path)
    b2.write.mode("append").parquet(path)
    r = spark.read.option("mergeSchema", "true").parquet(path)
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count("prio").cast("bigint").alias("n_with_priority"),
        F.sum("p").cast("double").alias("revenue_all"),
        F.sum(F.when(F.col("prio").isNotNull(), F.col("p")))
        .cast("double")
        .alias("revenue_evolved"),
    )


# --- PERMISSIVE corrupt-record CSV ingestion ---------------------------------


@query(
    "source_csv_corrupt_permissive",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (o_orderkey % 7 <> 0) AS BIGINT) AS n_good,
           CAST(COUNT(*) FILTER (o_orderkey % 7 = 0) AS BIGINT) AS n_corrupt,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (o_orderkey % 7 <> 0) AS DOUBLE) AS revenue_good
    FROM orders
    """,
    tags=("source", "csv", "corrupt-record", "permissive"),
)
def source_csv_corrupt_permissive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERMISSIVE-mode CSV ingestion with a corrupt-record column: rows
    whose orderkey ≡ 0 mod 7 are written as deliberately malformed
    lines (unparseable key), the rest as clean CSV; the read back uses
    an explicit schema + columnNameOfCorruptRecord so bad lines land in
    the quarantine column instead of killing the scan — the
    one-poisoned-row-must-not-fail-the-100TB-pass contract (same
    motivation as events_props_try_arithmetic, at the source boundary).
    The census asserts the good/corrupt split and that the surviving
    revenue is decimal-exact after the text round-trip."""
    o = load_table(spark, sf_dir, "orders")
    path = scratch_dir("corrupt_csv", sf_dir, "orders_mixed")
    good = o.where(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        dec("o_totalprice").cast("string"),
    )
    bad = o.where(F.col("o_orderkey") % 7 == 0).select(
        F.concat(F.lit("X"), F.col("o_orderkey"), F.lit(",oops,zz")).alias(
            "value"
        )
    )
    good.write.mode("overwrite").csv(path)
    bad.write.mode("append").format("text").save(path)
    r = spark.read.schema(
        "o_orderkey LONG, o_custkey LONG, o_totalprice DECIMAL(18,2), "
        "_corrupt STRING"
    ).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt"
    ).csv(path)
    r = r.cache()
    return r.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1))
        .cast("bigint")
        .alias("n_good"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("o_totalprice")))
        .cast("double")
        .alias("revenue_good"),
    )


# --- pivot with two measures --------------------------------------------------


@query(
    "lineitem_pivot_two_measures",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'A') AS DOUBLE) AS a_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'A') AS DOUBLE) AS a_rev,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'N') AS DOUBLE) AS n_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'N') AS DOUBLE) AS n_rev,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'R') AS DOUBLE) AS r_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (l_returnflag = 'R') AS DOUBLE) AS r_rev
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    tags=("aggregation", "pivot", "multi-measure"),
)
def lineitem_pivot_two_measures(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PIVOT carrying TWO measures per pivot value (quantity and
    revenue per return flag) — the multi-aggregate spread sheet shape
    pivot_status_by_priority's single-measure version doesn't cover.
    Spark compiles .pivot(values).agg(m1, m2) into ONE pass of
    conditional aggregates (no per-column rescan); explicit pivot
    values keep the plan static (no distinct-values pre-query), which
    is mandatory at 100 TB. Both measures fold as exact decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("rev"),
        )
    )
    return p.select(
        "l_linestatus",
        F.col("A_qty").alias("a_qty"),
        F.col("A_rev").alias("a_rev"),
        F.col("N_qty").alias("n_qty"),
        F.col("N_rev").alias("n_rev"),
        F.col("R_qty").alias("r_qty"),
        F.col("R_rev").alias("r_rev"),
    ).orderBy("l_linestatus")


# --- behavioral trigram mining -----------------------------------------------


@query(
    "events_trigram_sequences",
    oracle="""
    WITH t AS (
      SELECT user_id,
             LAG(event_type, 2) OVER w AS t1,
             LAG(event_type, 1) OVER w AS t2,
             event_type AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1 || '>' || t2 || '>' || t3 AS trigram,
           CAST(COUNT(*) AS BIGINT) AS support,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM t WHERE t1 IS NOT NULL
    GROUP BY trigram ORDER BY support DESC, trigram LIMIT 20
    """,
    tags=("sequence", "pattern-mining", "window", "behavioral"),
)
def events_trigram_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining, n-gram style: the top-20 consecutive
    event-type TRIGRAMS across user streams with raw support and
    distinct-user support — the length-3 contiguous special case of
    PrefixSpan that needs only two LAG windows and one aggregation (no
    candidate generation). Per-user windows parallelize on user_id;
    support counting is an exact integer aggregate; ties break on the
    trigram string for a total order. The behavioral-sequence
    companion to events_markov_transitions (which stops at bigrams)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id",
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).where(F.col("t1").isNotNull())
    return (
        t.select(
            F.concat_ws(">", "t1", "t2", "t3").alias("trigram"), "user_id"
        )
        .groupBy("trigram")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("support"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy(F.desc("support"), "trigram")
        .limit(20)
    )


# --- class-balanced sampling --------------------------------------------------


@query(
    "sample_class_balanced_docs",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents
    ), k AS (
      SELECT MIN(cnt) AS k FROM (
        SELECT COUNT(*) AS cnt FROM documents GROUP BY lang)
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (rn <= k.k) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) FILTER (rn <= k.k) AS DOUBLE)
             / COUNT(*) FILTER (rn <= k.k) AS avg_chars_kept
    FROM ranked CROSS JOIN k
    GROUP BY lang ORDER BY lang
    """,
    tags=("llm", "sampling", "class-balance", "portable-random"),
)
def sample_class_balanced_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language keeps exactly
    min-class-count documents, selected by the md5-of-id portable
    random order (queries/helpers.py md5_uniform discipline) — the
    rebalancing step before training a language classifier on a skewed
    corpus (en is 3–4× the other languages in this fixture). Selection
    is a pure function of doc_id, so the sample is reproducible across
    engines, partitionings, and runs; the min-count scalar broadcasts.
    Census output keeps both sides auditable (n_total vs n_kept)."""
    d = load_table(spark, sf_dir, "documents")
    ranked = d.select(
        "lang",
        "n_chars",
        F.row_number()
        .over(
            W.partitionBy("lang").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
        )
        .alias("rn"),
    )
    k = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("k"))
    )
    kept = F.col("rn") <= F.col("k")
    return (
        ranked.crossJoin(F.broadcast(k))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
            (
                F.sum(F.when(kept, F.col("n_chars"))).cast("double")
                / F.count(F.when(kept, 1))
            ).alias("avg_chars_kept"),
        )
        .orderBy("lang")
    )
