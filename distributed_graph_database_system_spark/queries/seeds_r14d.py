"""R14_POOL, batch D: the registrations that complete a full 50-name
first-time rotation for round 14 (28 from batches B/C + these). Families:
cut-table decile grids, customer lifecycle spans and RFM segmentation,
anagram/format string audits, quarterly concentration (HHI), cross-table
balance gaps, calendar-edge censuses (leap days, ISO week 53),
co-occurrence pair censuses, per-language length quartiles, a JSON writer
roundtrip, a tumbling error-rate twin, degree assortativity, BMP deep
pixel stats, and a weekday volume index. Same cross-engine float
discipline as the whole registry. All parity-verified at
sf0.001/0.01/0.1 at registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import (
    dec,
    dsum,
    scratch_dir,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- 2-D quantity x price-decile grid -------------------------------------------------


@query(
    "lineitem_qty_price_decile_grid",
    oracle="""
    WITH q AS (
      SELECT CAST((CAST(l_quantity AS BIGINT) - 1) // 10 AS INT) AS qty_band,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem
    ), cuts AS (
      SELECT percentile_disc(0.1) WITHIN GROUP (ORDER BY cents) AS d1,
             percentile_disc(0.2) WITHIN GROUP (ORDER BY cents) AS d2,
             percentile_disc(0.3) WITHIN GROUP (ORDER BY cents) AS d3,
             percentile_disc(0.4) WITHIN GROUP (ORDER BY cents) AS d4,
             percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS d5,
             percentile_disc(0.6) WITHIN GROUP (ORDER BY cents) AS d6,
             percentile_disc(0.7) WITHIN GROUP (ORDER BY cents) AS d7,
             percentile_disc(0.8) WITHIN GROUP (ORDER BY cents) AS d8,
             percentile_disc(0.9) WITHIN GROUP (ORDER BY cents) AS d9
      FROM q
    )
    SELECT qty_band,
           CAST((cents > d1)::INT + (cents > d2)::INT + (cents > d3)::INT
              + (cents > d4)::INT + (cents > d5)::INT + (cents > d6)::INT
              + (cents > d7)::INT + (cents > d8)::INT + (cents > d9)::INT
              AS INT) AS price_decile,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM q CROSS JOIN cuts
    GROUP BY qty_band, price_decile ORDER BY qty_band, price_decile
    """,
    tags=("percentile", "grid", "cut-table", "census"),
)
def lineitem_qty_price_decile_grid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantity-band × price-decile contingency grid: the price decile is
    assigned by COUNTING CUTS BELOW (nine exact order-statistic bounds in
    one broadcast row; decile = Σ[cents > cut_i]) — the cut-table pattern
    that scales to any fact size because assignment is pure comparisons,
    no per-row window or NTILE. The cuts come from
    operators/quantile.py group_quantiles_disc (partition-bounded state;
    the builtin percentile_disc aggregate buffers EVERY price in one
    task — it OOMed this very query at sf10/24g before this rewrite).
    Everything is integer-exact."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        (((F.col("l_quantity").cast("bigint")) - 1) / 10)
        .cast("int")
        .alias("qty_band"),
        (dec("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.lit(1).alias("g"),
    )
    qs = [i / 10 for i in range(1, 10)]
    cuts = group_quantiles_disc(q, "cents", qs, ["g"]).drop("g")
    decile = sum(
        (F.col("cents") > F.col(_qcolname(p))).cast("int") for p in qs
    )
    return (
        q.drop("g")
        .crossJoin(F.broadcast(cuts))
        .groupBy("qty_band", decile.cast("int").alias("price_decile"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("qty_band", "price_decile")
    )


# --- customer order-span histogram -----------------------------------------------------


@query(
    "customer_order_span_histogram",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS span_d,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(span_d // 90 AS INT) AS span_quarters,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders
    FROM s GROUP BY span_quarters ORDER BY span_quarters
    """,
    tags=("lifecycle", "span", "histogram", "datetime"),
)
def customer_order_span_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer lifetime span (first to last order, in 90-day bands) —
    the tenure histogram behind every retention analysis. One per-key
    min/max aggregate, one exact integer day difference, one band floor;
    single-order customers land in band 0 by construction."""
    o = load_table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).alias("span_d"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    return (
        s.groupBy(
            F.floor(F.col("span_d") / 90).cast("int").alias("span_quarters")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("n_orders").cast("bigint").alias("n_orders"),
        )
        .orderBy("span_quarters")
    )


# --- anagram-class census over the part vocabulary ---------------------------------------


@query(
    "part_name_anagram_census",
    oracle="""
    WITH w AS (
      SELECT DISTINCT split_part(p_name, ' ', 1) AS word FROM part
      UNION SELECT DISTINCT split_part(p_name, ' ', 2) FROM part
    ), keyed AS (
      SELECT word, array_to_string(list_sort(string_split(word, '')), '')
               AS sig
      FROM w
    ), cls AS (
      SELECT sig, CAST(COUNT(*) AS BIGINT) AS class_size FROM keyed
      GROUP BY sig
    )
    SELECT class_size,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(class_size) AS BIGINT) AS n_words
    FROM cls GROUP BY class_size ORDER BY class_size
    """,
    tags=("string", "anagram", "canonicalization", "census"),
)
def part_name_anagram_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anagram-class census of the part-name vocabulary: each word keys
    on its SORTED character multiset (the canonical-form trick behind
    fuzzy blocking — identical machinery to phone-number/SKU
    normalization), classes counted by size. Sorting characters is a
    deterministic total order in both engines; the vocabulary is
    dimension-sized after the DISTINCT."""
    p = load_table(spark, sf_dir, "part")
    w = (
        p.select(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("word"))
        .union(
            p.select(
                F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("word")
            )
        )
        .distinct()
    )
    keyed = w.select(
        F.array_join(F.array_sort(F.split(F.col("word"), "")), "").alias("sig")
    )
    cls = keyed.groupBy("sig").agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size")
    )
    return (
        cls.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_words"),
        )
        .orderBy("class_size")
    )


# --- customer-name format audit ------------------------------------------------------------


@query(
    "customer_name_format_audit",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(*) FILTER (regexp_matches(c_name,
             '^Customer#[0-9]{9}$')) AS BIGINT) AS n_format_ok,
           CAST(COUNT(*) FILTER (
             TRY_CAST(substr(c_name, 10) AS BIGINT) = c_custkey
           ) AS BIGINT) AS n_key_consistent,
           ROUND(CAST(COUNT(*) FILTER (regexp_matches(c_name,
             '^Customer#[0-9]{9}$')) AS DOUBLE) / COUNT(*), 6)
             AS format_ok_share
    FROM customer
    """,
    tags=("dq", "regex", "format-audit"),
)
def customer_name_format_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name-format conformance audit: regex-validate the
    ``Customer#{9 digits}`` convention AND cross-check that the embedded
    number equals the key (format can be right while the content lies —
    the two checks catch different corruption modes). One scan; the
    regex is anchored-class-only, so Java and RE2-style engines agree."""
    c = load_table(spark, sf_dir, "customer")
    fmt_ok = F.col("c_name").rlike("^Customer#[0-9]{9}$")
    key_ok = (
        F.try_to_number(F.substring("c_name", 10, 9), F.lit("999999999"))
        == F.col("c_custkey")
    )
    return c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.count(F.when(fmt_ok, 1)).cast("bigint").alias("n_format_ok"),
        F.count(F.when(key_ok, 1)).cast("bigint").alias("n_key_consistent"),
        F.round(
            F.count(F.when(fmt_ok, 1)).cast("double") / F.count(F.lit(1)), 6
        ).alias("format_ok_share"),
    )


# --- quarterly priority concentration (HHI) --------------------------------------------------


@query(
    "orders_priority_hhi_quarterly",
    oracle="""
    WITH c AS (
      SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS qtr,
             o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1, 2
    ), t AS (
      SELECT qtr, CAST(SUM(n) AS BIGINT) AS nt FROM c GROUP BY qtr
    )
    SELECT c.qtr, t.nt AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(
             POW(CAST(n AS DOUBLE) / nt, 2), 8) AS DECIMAL(28,8)))
             AS DOUBLE), 6) AS hhi
    FROM c JOIN t ON c.qtr = t.qtr
    GROUP BY c.qtr, t.nt ORDER BY c.qtr
    """,
    tags=("stats", "hhi", "concentration", "calendar"),
)
def orders_priority_hhi_quarterly(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Herfindahl index of the priority mix per quarter — concentration
    over time (HHI = Σ share², 0.2 for a uniform 5-way mix, 1.0 for a
    monoculture). Counts exact; each squared share rounds to 8dp and
    folds as DECIMAL; dimension-sized after the first aggregate."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy(
        F.date_trunc("quarter", "o_orderdate").alias("qtr"),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.groupBy("qtr").agg(F.sum("n").cast("bigint").alias("nt"))
    term = F.round(
        F.pow(F.col("n").cast("double") / F.col("nt"), 2), 8
    ).cast("decimal(28,8)")
    return (
        c.join(t, "qtr")
        .groupBy("qtr", F.col("nt").alias("n_orders"))
        .agg(F.round(F.sum(term).cast("double"), 6).alias("hhi"))
        .orderBy("qtr")
    )


# --- supplier vs customer balance gap per nation ----------------------------------------------


@query(
    "nation_balance_gap_census",
    oracle="""
    WITH s AS (
      SELECT s_nationkey AS nk,
             SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS st,
             CAST(COUNT(*) AS BIGINT) AS ns
      FROM supplier GROUP BY 1
    ), c AS (
      SELECT c_nationkey AS nk,
             SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS ct,
             CAST(COUNT(*) AS BIGINT) AS nc
      FROM customer GROUP BY 1
    )
    SELECT COALESCE(s.nk, c.nk) AS nationkey,
           COALESCE(ns, 0) AS n_suppliers, COALESCE(nc, 0) AS n_customers,
           CAST(COALESCE(st, 0) AS DOUBLE) AS supplier_balance,
           CAST(COALESCE(ct, 0) AS DOUBLE) AS customer_balance,
           CAST(COALESCE(st, 0) - COALESCE(ct, 0) AS DOUBLE) AS balance_gap
    FROM s FULL OUTER JOIN c ON s.nk = c.nk ORDER BY nationkey
    """,
    tags=("join", "full-outer", "cross-table", "census"),
)
def nation_balance_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-vs-customer balance gap per nation: two independent
    aggregates FULL-OUTER joined so a nation present on only one side
    still reports (with zero on the other) — the reconciliation join
    shape. Money folds as exact decimal; the gap is exact decimal
    subtraction surfaced as double."""
    s = load_table(spark, sf_dir, "supplier").groupBy(
        F.col("s_nationkey").alias("nk")
    ).agg(
        F.sum(dec("s_acctbal", 12, 2)).alias("st"),
        F.count(F.lit(1)).cast("bigint").alias("ns"),
    )
    c = load_table(spark, sf_dir, "customer").groupBy(
        F.col("c_nationkey").alias("nk")
    ).agg(
        F.sum(dec("c_acctbal", 12, 2)).alias("ct"),
        F.count(F.lit(1)).cast("bigint").alias("nc"),
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        s.join(c, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("ns", F.lit(0)).cast("bigint").alias("n_suppliers"),
            F.coalesce("nc", F.lit(0)).cast("bigint").alias("n_customers"),
            F.coalesce("st", zero).cast("double").alias("supplier_balance"),
            F.coalesce("ct", zero).cast("double").alias("customer_balance"),
            (F.coalesce("st", zero) - F.coalesce("ct", zero))
            .cast("double")
            .alias("balance_gap"),
        )
        .orderBy("nationkey")
    )


# --- calendar edges: leap days and ISO week 53 -------------------------------------------------


@query(
    "orders_leap_week53_census",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (month(o_orderdate) = 2
                AND day(o_orderdate) = 29) AS BIGINT) AS n_leap_day,
           CAST(COUNT(*) FILTER (date_part('week', o_orderdate) = 53)
                AS BIGINT) AS n_iso_week53
    FROM orders GROUP BY yr ORDER BY yr
    """,
    tags=("scalar", "datetime", "calendar-edge", "isoweek"),
)
def orders_leap_week53_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-edge census: orders on Feb 29 and in ISO week 53, per
    year — the two places naive date arithmetic shears (1996 and 2000
    are leap years in range; 1998 has an ISO week 53). Spark's
    weekofyear and DuckDB's date_part('week') are both ISO-8601, which
    this query pins as a cross-engine fact."""
    o = load_table(spark, sf_dir, "orders")
    leap = (F.month("o_orderdate") == 2) & (F.dayofmonth("o_orderdate") == 29)
    w53 = F.weekofyear("o_orderdate") == 53
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.count(F.when(leap, 1)).cast("bigint").alias("n_leap_day"),
            F.count(F.when(w53, 1)).cast("bigint").alias("n_iso_week53"),
        )
        .orderBy("yr")
    )


# --- event-type co-occurrence pairs ---------------------------------------------------------


@query(
    "events_type_cooccurrence_users",
    oracle="""
    WITH du AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
      FROM events
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_user_days
    FROM du a JOIN du b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
    GROUP BY type_a, type_b ORDER BY type_a, type_b
    """,
    tags=("cooccurrence", "self-join", "basket", "census"),
)
def events_type_cooccurrence_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Event-type co-occurrence within (user, day) baskets — the pairwise
    lift numerator every recommendation pipeline starts from. The
    self-join runs on the DISTINCT (user, day, type) projection (≤ 5
    types per basket, so fan-out is bounded by the type domain), keyed on
    (user, day) — one shuffle, exact counts."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    a = du.select(
        "user_id", "day", F.col("event_type").alias("type_a")
    )
    b = du.select(
        "user_id", "day", F.col("event_type").alias("type_b")
    )
    return (
        a.join(b, ["user_id", "day"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_user_days"))
        .orderBy("type_a", "type_b")
    )


# --- per-language length quartiles -------------------------------------------------------------


@query(
    "documents_length_quartiles_by_lang",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars)
                AS BIGINT) AS q1_chars,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
                AS BIGINT) AS median_chars,
           CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars)
                AS BIGINT) AS q3_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("percentile", "quartiles", "llm", "text"),
)
def documents_length_quartiles_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language document-length quartiles — the robust spread summary
    next to the Levene test already registered on the same measure
    (quartiles describe what the test only scores). n_chars is already
    integral; the three order statistics route through
    group_quantiles_disc so per-task state stays partition-bounded
    (documents-per-language grows with the corpus)."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    d = load_table(spark, sf_dir, "documents")
    n = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    qs = [0.25, 0.5, 0.75]
    cuts = group_quantiles_disc(d, "n_chars", qs, ["lang"])
    return (
        n.join(F.broadcast(cuts), "lang")
        .select(
            "lang",
            "n_docs",
            F.col(_qcolname(0.25)).cast("bigint").alias("q1_chars"),
            F.col(_qcolname(0.5)).cast("bigint").alias("median_chars"),
            F.col(_qcolname(0.75)).cast("bigint").alias("q3_chars"),
        )
        .orderBy("lang")
    )


# --- first-word census ---------------------------------------------------------------------------


@query(
    "documents_first_word_census",
    oracle="""
    SELECT lang, split_part(text, ' ', 1) AS first_word,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, first_word ORDER BY lang, first_word
    """,
    tags=("string", "census", "llm", "text"),
)
def documents_first_word_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-opening word census per language — the cheap boilerplate
    detector (one opener dominating a source flags templated text; the
    repo's winnowing/boilerplate operators are the deep version). One
    split_part projection, one census aggregate."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias(
                "first_word"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "first_word")
    )


# --- JSON writer roundtrip -----------------------------------------------------------------------


@query(
    "sink_json_struct_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                AS BIGINT)) AS BIGINT) AS cents_sum,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders GROUP BY status ORDER BY status
    """,
    tags=("sinks", "json", "nested", "roundtrip"),
)
def sink_json_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON WRITER roundtrip with NESTED values: each order serializes as
    a struct (key, integer cents) plus a tag array, is written as JSON
    lines, read back with an explicit nested schema, and censused from
    the NESTED fields — so a writer that loses struct nesting, reorders
    fields into ambiguity, or round-trips numbers through floats breaks
    the hash (cents ride as integers end to end; the oracle computes the
    same census from the base table). Write-side twin of
    source_json_nested_roundtrip."""
    import os

    o = load_table(spark, sf_dir, "orders")
    df = o.select(
        F.col("o_orderstatus").alias("status"),
        F.struct(
            F.col("o_orderkey").alias("k"),
            (dec("o_totalprice") * 100).cast("bigint").alias("cents"),
        ).alias("obj"),
        F.array(F.col("o_orderpriority")).alias("tags"),
    )
    path = scratch_dir("sinks", sf_dir, "json_struct_orders")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    df.write.mode("overwrite").json(path)
    back = spark.read.schema(
        "status STRING, obj STRUCT<k: BIGINT, cents: BIGINT>, "
        "tags ARRAY<STRING>"
    ).json(path)
    return (
        back.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("obj.k").cast("bigint").alias("key_sum"),
            F.sum("obj.cents").cast("bigint").alias("cents_sum"),
            F.count_distinct(F.col("tags")[0])
            .cast("bigint")
            .alias("n_priorities"),
        )
        .orderBy("status")
    )


# --- streaming twin: tumbling 15-minute error rate --------------------------------------------------


@query(
    "stream_tumbling15m_error_rate",
    oracle="""
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT)
             AS n_errors,
           ROUND(CAST(COUNT(*) FILTER (event_type = 'error') AS DOUBLE)
                 / COUNT(*), 6) AS error_rate
    FROM events GROUP BY window_start ORDER BY window_start
    """,
    tags=("streaming", "window", "tumbling", "error-rate"),
)
def stream_tumbling15m_error_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tumbling 15-minute error rate — the narrow-window alerting twin
    (2,880 windows over the fixture month; the shape SLO monitors
    stream). Counts exact, the rate one rounded division per window."""
    e = load_table(spark, sf_dir, "events")
    err = F.count(F.when(F.col("event_type") == "error", 1))
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            err.cast("bigint").alias("n_errors"),
            F.round(err.cast("double") / F.count(F.lit(1)), 6).alias(
                "error_rate"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"), "n", "n_errors",
            "error_rate",
        )
        .orderBy("window_start")
    )


# --- degree assortativity on G6 ---------------------------------------------------------------------


@query(
    "graph_degree_assortativity_g6",
    oracle="""
    WITH e AS (
      SELECT src, dst FROM (VALUES
      (1,2),(2,1),(1,3),(3,1),(1,4),(4,1),(2,3),(3,2),(2,4),(4,2),
      (3,4),(4,3),(5,6),(6,5),(6,7),(7,6),(7,8),(8,7),(8,9),(9,8),
      (9,5),(5,9),(4,5),(5,4),(8,10),(10,8)) AS t(src, dst)
    ), deg AS (
      SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src
    ), xy AS (
      SELECT ds.d AS x, dd.d AS y
      FROM e JOIN deg ds ON e.src = ds.v JOIN deg dd ON e.dst = dd.v
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM xy
    )
    SELECT n AS n_directed_edges,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
                 6) AS assortativity
    FROM m
    """,
    tags=("graph", "assortativity", "degree", "pearson"),
)
def graph_degree_assortativity_g6(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of G6 (Pearson correlation of endpoint
    degrees over the symmetrized directed edge list — Newman's r): the
    one-number answer to "do hubs attach to hubs?", negative here
    because the bridge ties the degree-5 clique corner to the cycle.
    Degrees and all five moment sums are exact integers; r is one fixed
    IEEE chain identical in both engines."""
    from distributed_graph_database_system_spark.queries.graph import (
        G6,
        _edges,
    )

    sym = G6 + [(b, a) for a, b in G6]
    e = _edges(spark, sym)
    deg = e.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    xy = (
        e.join(deg.select(F.col("v").alias("src"), F.col("d").alias("x")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("y")), "dst")
        .select("x", "y")
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    return m.select(
        F.col("n").alias("n_directed_edges"),
        F.round(
            (nd * F.col("sxy") - sxd * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - sxd * F.col("sx"))
                * (nd * F.col("syy") - syd * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )


# --- BMP deep pixel stats -----------------------------------------------------------------------------


@query(
    "multimodal_bmp_pixel_stats",
    oracle="""
    WITH docs AS (
      SELECT doc_id AS d FROM documents WHERE doc_id % 12 = 0
    ), dims AS (
      SELECT d, 16 + (d % 3) * 8 AS w, 8 + (d % 2) * 8 AS h FROM docs
    ), px AS (
      SELECT d, (x * 3 + y * 5 + d) % 251 AS v
      FROM dims,
           LATERAL (SELECT unnest(range(0, w)) AS x),
           LATERAL (SELECT unnest(range(0, h)) AS y)
    )
    SELECT CAST(d AS BIGINT) AS image_id,
           CAST(COUNT(*) AS BIGINT) AS n_px,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS INT) AS px_min,
           CAST(MAX(v) AS INT) AS px_max
    FROM px GROUP BY d ORDER BY image_id
    """,
    tags=("llm", "multimodal", "bmp", "mapinpandas"),
)
def multimodal_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep BMP pixel statistics over synthesized 8-bit palette bitmaps
    of VARYING dimensions: the stdlib decoder must honor the 4-byte row
    alignment (padding bytes excluded from stats — widths 16/24/32 mix
    aligned and unaligned strides), bottom-up row order, and the palette
    mapping; the oracle regenerates every pixel arithmetically. Arrow-
    batched mapInPandas for synth and decode."""
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
        make_bmp8,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 12 == 0
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
                w = 16 + (d % 3) * 8
                h = 8 + (d % 2) * 8
                rows.append(
                    {
                        "media_id": d,
                        "kind": "image",
                        "content": make_bmp8(
                            w,
                            h,
                            px_fn=lambda x, y, d=d: (x * 3 + y * 5 + d) % 251,
                        ),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    media = docs.select("doc_id").mapInPandas(synth, schema=schema)
    meta = decode_media(media, deep=True)
    return (
        meta.select(
            F.col("media_id").cast("bigint").alias("image_id"),
            F.col("n_px").cast("bigint").alias("n_px"),
            F.col("px_sum").cast("bigint").alias("px_sum"),
            F.col("px_min").cast("int").alias("px_min"),
            F.col("px_max").cast("int").alias("px_max"),
        )
        .orderBy("image_id")
    )


# --- ship-weekday volume index ----------------------------------------------------------------------


@query(
    "lineitem_shipdow_volume_index",
    oracle="""
    WITH c AS (
      SELECT date_part('isodow', l_shipdate) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c)
    SELECT CAST(dow AS INT) AS isodow, n,
           ROUND(CAST(n AS DOUBLE) / nt, 6) AS share,
           ROUND(CAST(n AS DOUBLE) * 7 / nt, 6) AS volume_index
    FROM c CROSS JOIN t ORDER BY isodow
    """,
    tags=("scalar", "datetime", "seasonality", "index"),
)
def lineitem_shipdow_volume_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shipment-volume index per ISO weekday (share × 7, so 1.0 = flat) —
    the operational-load profile on the ISO scale (same portability trap
    as the weekend-share query: Spark weekday()+1 ≡ DuckDB isodow). One
    scan, two exact folds, two rounded ratios."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy((F.weekday("l_shipdate") + 1).alias("isodow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    t = c.agg(F.sum("n").cast("bigint").alias("nt"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("isodow").cast("int").alias("isodow"),
            "n",
            F.round(F.col("n").cast("double") / F.col("nt"), 6).alias("share"),
            F.round(F.col("n").cast("double") * 7 / F.col("nt"), 6).alias(
                "volume_index"
            ),
        )
        .orderBy("isodow")
    )


# --- RFM segmentation census -------------------------------------------------------------------------


@query(
    "customer_rfm_segment_census",
    oracle="""
    WITH per_c AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency_d,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                  AS BIGINT)) AS BIGINT) AS monetary_c
      FROM orders GROUP BY o_custkey
    ), cuts AS (
      SELECT percentile_disc(0.333333) WITHIN GROUP (ORDER BY recency_d) AS r1,
             percentile_disc(0.666667) WITHIN GROUP (ORDER BY recency_d) AS r2,
             percentile_disc(0.333333) WITHIN GROUP (ORDER BY frequency) AS f1,
             percentile_disc(0.666667) WITHIN GROUP (ORDER BY frequency) AS f2,
             percentile_disc(0.333333) WITHIN GROUP (ORDER BY monetary_c) AS m1,
             percentile_disc(0.666667) WITHIN GROUP (ORDER BY monetary_c) AS m2
      FROM per_c
    )
    SELECT CAST(((recency_d > r1)::INT + (recency_d > r2)::INT) * 100
              + ((frequency > f1)::INT + (frequency > f2)::INT) * 10
              + ((monetary_c > m1)::INT + (monetary_c > m2)::INT) AS INT)
             AS rfm_code,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_c) AS BIGINT) AS total_cents
    FROM per_c CROSS JOIN cuts
    GROUP BY rfm_code ORDER BY rfm_code
    """,
    tags=("pipeline", "rfm", "segmentation", "cut-table"),
)
def customer_rfm_segment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation census — the
    classic customer-scoring pipeline as one cut-table plan: per-customer
    exact aggregates, six tercile bounds in a single broadcast row
    (order statistics on integers, computed per measure by
    group_quantiles_disc so no task ever buffers the whole customer
    table), scores by counting cuts below, and the 3-digit segment code
    censused. No window touches the customer table; the shape survives a
    billion customers."""
    from distributed_graph_database_system_spark.operators.quantile import (
        _qcolname,
        group_quantiles_disc,
    )

    o = load_table(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("gmax"))
    per_c = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("gmax"), F.max("o_orderdate")).alias(
                "recency_d"
            ),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum((dec("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_c"),
        )
        .withColumn("g", F.lit(1))
    )
    qs = [0.333333, 0.666667]
    lo, hi = _qcolname(qs[0]), _qcolname(qs[1])

    def _cuts(col: str, a: str, b: str):
        return (
            group_quantiles_disc(per_c, col, qs, ["g"])
            .drop("g")
            .withColumnRenamed(lo, a)
            .withColumnRenamed(hi, b)
        )

    cuts = (
        _cuts("recency_d", "r1", "r2")
        .crossJoin(_cuts("frequency", "f1", "f2"))
        .crossJoin(_cuts("monetary_c", "m1", "m2"))
    )
    r_score = (F.col("recency_d") > F.col("r1")).cast("int") + (
        F.col("recency_d") > F.col("r2")
    ).cast("int")
    f_score = (F.col("frequency") > F.col("f1")).cast("int") + (
        F.col("frequency") > F.col("f2")
    ).cast("int")
    m_score = (F.col("monetary_c") > F.col("m1")).cast("int") + (
        F.col("monetary_c") > F.col("m2")
    ).cast("int")
    return (
        per_c.crossJoin(F.broadcast(cuts))
        .groupBy(
            (r_score * 100 + f_score * 10 + m_score)
            .cast("int")
            .alias("rfm_code")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("monetary_c").cast("bigint").alias("total_cents"),
        )
        .orderBy("rfm_code")
    )
