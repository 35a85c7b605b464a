"""R13_POOL, batch B: first-time candidates for the round-13 window
rotation — registered and parity-verified this round, graded by the
driver next round (the rotation contract in queries/registry.py).

Families the round-11 judge asked to seed: GROUP BY ALL / ORDER BY ALL
shorthand, geospatial grid binning on the numeric fixtures (coordinates
derived md5-deterministically so both engines bin identical points), and
MATCH_RECOGNIZE-flavored sequence analytics (runs / funnels expressed as
gaps-and-islands — Spark has no MATCH_RECOGNIZE, so the distributed
rewrite IS the operator). Plus contingency/lift/autocorrelation
statistics, keyset pagination, and embedding/text censuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.queries.helpers import (
    dec,
    dsum,
    md5_uniform,
    sf_view,
)
from distributed_graph_database_system_spark.queries.registry import query
from distributed_graph_database_system_spark.sources.catalog import load_table


# --- GROUP BY ALL / ORDER BY ALL -------------------------------------------------


@query(
    "orders_group_by_all_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("aggregation", "group-by-all", "sql-shorthand"),
)
def orders_group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — the analyst shorthand where every non-aggregate
    select item becomes a grouping key (Spark 3.4+ and DuckDB agree on
    the inference rule). Run through spark.sql so the SHORTHAND itself
    is exercised, not a hand-expanded groupBy; the plan is the ordinary
    hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    v = sf_view(spark, o, "gball_orders", sf_dir)
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM {v}
        GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
    """)


@query(
    "nation_region_order_by_all",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_nations_rows
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sort", "order-by-all", "sql-shorthand"),
)
def nation_region_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY ALL — total ordering over every select item, left to
    right (the deterministic-output shorthand both engines define
    identically). Exercised through spark.sql over the broadcast-sized
    nation⋈region join; GROUP BY ALL feeds it so the whole statement is
    shorthand-only."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    vn = sf_view(spark, n, "oball_nation", sf_dir)
    vr = sf_view(spark, r, "oball_region", sf_dir)
    return spark.sql(f"""
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(COUNT(*) AS BIGINT) AS n_nations_rows
        FROM {vn} n JOIN {vr} r ON n.n_regionkey = r.r_regionkey
        GROUP BY ALL
        ORDER BY ALL
    """)


# --- geospatial binning on md5-derived coordinates ---------------------------------


def _md5_frac(col, lo: int):
    """Uniform [0,1) from md5 hex digits [lo, lo+8) — the shared
    md5_uniform device (queries/helpers.py), second-slice capable via
    its offset parameter; kept as a local alias so the geo queries read
    symmetrically with their SQL-side _MD5_FRAC_SQL template."""
    return md5_uniform(col, offset=lo)


_MD5_FRAC_SQL = (
    "CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), {lo}, 8)) AS BIGINT)"
    " / 4294967296.0"
)


@query(
    "events_geo_grid_census",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             {_MD5_FRAC_SQL.format(col="user_id", lo=1)} * 180 - 90 AS lat,
             {_MD5_FRAC_SQL.format(col="user_id", lo=9)} * 360 - 180 AS lon,
             CAST(ROUND(value, 6) AS DECIMAL(18,6)) AS v
      FROM events
    )
    SELECT CAST(FLOOR(lat / 30) AS INT) AS lat_cell,
           CAST(FLOOR(lon / 60) AS INT) AS lon_cell,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM pts GROUP BY lat_cell, lon_cell ORDER BY lat_cell, lon_cell
    """,
    tags=("geospatial", "grid-binning", "md5-deterministic"),
)
def events_geo_grid_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial grid binning on the numeric fixture: each user gets a
    deterministic (lat, lon) from two independent md5 slices of their
    id (byte-identical in both engines), and events are binned into a
    6×6 grid of 30°×60° cells. The binning arithmetic (scale, FLOOR,
    integer cell ids) is the same shape as geohash/S2 bucketing; the
    census is one hash aggregate — the scale-correct spatial histogram
    (no point-in-polygon join)."""
    e = load_table(spark, sf_dir, "events")
    lat = _md5_frac("user_id", 1) * 180 - 90
    lon = _md5_frac("user_id", 9) * 360 - 180
    pts = e.select(
        "user_id",
        lat.alias("lat"),
        lon.alias("lon"),
        F.round("value", 6).cast("decimal(18,6)").alias("v"),
    )
    return (
        pts.groupBy(
            F.floor(F.col("lat") / 30).cast("int").alias("lat_cell"),
            F.floor(F.col("lon") / 60).cast("int").alias("lon_cell"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .orderBy("lat_cell", "lon_cell")
    )


@query(
    "events_nearest_hub_assignment",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             {_MD5_FRAC_SQL.format(col="user_id", lo=1)} * 180 - 90 AS lat,
             {_MD5_FRAC_SQL.format(col="user_id", lo=9)} * 360 - 180 AS lon
      FROM events
    ), d AS (
      SELECT user_id,
             (lat - h.hlat) * (lat - h.hlat)
               + (lon - h.hlon) * (lon - h.hlon) AS d2,
             h.hub
      FROM pts CROSS JOIN (VALUES ('nyc', 40.7, -74.0),
                                  ('lon', 51.5, -0.1),
                                  ('sin', 1.35, 103.8),
                                  ('syd', -33.9, 151.2)) AS h(hub, hlat, hlon)
    ), best AS (
      SELECT user_id, MIN(struct_pack(d2 := d2, hub := hub)) AS b
      FROM d GROUP BY user_id
    )
    SELECT struct_extract(b, 'hub') AS hub,
           CAST(COUNT(*) AS BIGINT) AS n_assignments,
           ROUND(MIN(struct_extract(b, 'd2')), 6) AS min_d2,
           ROUND(MAX(struct_extract(b, 'd2')), 6) AS max_d2
    FROM best GROUP BY hub ORDER BY hub
    """,
    tags=("geospatial", "nearest-neighbor", "broadcast", "argmin"),
)
def events_nearest_hub_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nearest-hub assignment — the broadcast-ANN primitive on spatial
    data: every event row's md5-derived point is compared to a 4-row hub
    dimension (BroadcastNestedLoopJoin ×4, never a shuffle) and the
    argmin rides a lexicographic struct MIN (d2, hub) — pure arithmetic
    distances (squared equirectangular degrees: no trig, so both
    engines' doubles are bit-identical; ties impossible off a zero-measure
    set). Census per hub with min/max pull-in radii."""
    e = load_table(spark, sf_dir, "events")
    hubs = spark.createDataFrame(
        [("nyc", 40.7, -74.0), ("lon", 51.5, -0.1),
         ("sin", 1.35, 103.8), ("syd", -33.9, 151.2)],
        "hub STRING, hlat DOUBLE, hlon DOUBLE",
    )
    pts = e.select(
        "user_id",
        (_md5_frac("user_id", 1) * 180 - 90).alias("lat"),
        (_md5_frac("user_id", 9) * 360 - 180).alias("lon"),
    )
    d2 = (F.col("lat") - F.col("hlat")) * (F.col("lat") - F.col("hlat")) + (
        F.col("lon") - F.col("hlon")
    ) * (F.col("lon") - F.col("hlon"))
    d = pts.crossJoin(F.broadcast(hubs)).select(
        "user_id", d2.alias("d2"), "hub"
    )
    best = d.groupBy("user_id").agg(
        F.min(F.struct(F.col("d2").alias("d2"), F.col("hub").alias("hub")))
        .alias("b")
    )
    return (
        best.select(F.col("b.hub").alias("hub"), F.col("b.d2").alias("d2"))
        .groupBy("hub")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assignments"),
            F.round(F.min("d2"), 6).alias("min_d2"),
            F.round(F.max("d2"), 6).alias("max_d2"),
        )
        .orderBy("hub")
    )


# --- MATCH_RECOGNIZE-flavored sequence analytics --------------------------------------


@query(
    "orders_rising_runs_match3",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY day
    ), s AS (
      SELECT day,
             CASE WHEN rev > LAG(rev) OVER (ORDER BY day) THEN 1 ELSE 0 END
               AS up
      FROM d
    ), isl AS (
      SELECT day, up,
             SUM(CASE WHEN up = 0 THEN 1 ELSE 0 END)
               OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS grp
      FROM s
    ), runs AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS len,
             CAST(MIN(day) AS VARCHAR) AS run_start
      FROM isl WHERE up = 1 GROUP BY grp
    )
    SELECT CAST(COUNT(*) FILTER (len >= 3) AS BIGINT) AS n_runs_ge3,
           CAST(COALESCE(MAX(len), 0) AS BIGINT) AS longest_run,
           MIN(CASE WHEN len = (SELECT MAX(len) FROM runs) THEN run_start
               END) AS longest_run_start
    FROM runs
    """,
    tags=("sequence", "match-recognize", "gaps-and-islands", "runs"),
)
def orders_rising_runs_match3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE PATTERN (UP{3,}) over the daily revenue series —
    Spark has no MATCH_RECOGNIZE, so the distributed rewrite is
    gaps-and-islands: flag rises, island-id by the running count of
    non-rises, measure each island. Counts runs of ≥3 consecutive
    up-days, the longest run, and its start date (earliest among ties).
    The ordered pass is over the daily AGGREGATE (horizon-bounded), the
    measure phase is a hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice")).alias("rev")
    )
    wd = W.orderBy("day")
    s = d.select(
        "day",
        F.when(F.col("rev") > F.lag("rev").over(wd), 1)
        .otherwise(0)
        .alias("up"),
    )
    isl = s.withColumn(
        "grp",
        F.sum(F.when(F.col("up") == 0, 1).otherwise(0)).over(
            wd.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    runs = (
        isl.where(F.col("up") == 1)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("len"),
            F.min("day").cast("string").alias("run_start"),
        )
    )
    top = runs.agg(F.max("len").alias("mx"))
    return runs.crossJoin(F.broadcast(top)).agg(
        F.count(F.when(F.col("len") >= 3, 1)).cast("bigint").alias(
            "n_runs_ge3"
        ),
        F.coalesce(F.max("len"), F.lit(0)).cast("bigint").alias(
            "longest_run"
        ),
        F.min(
            F.when(F.col("len") == F.col("mx"), F.col("run_start"))
        ).alias("longest_run_start"),
    )


@query(
    "events_funnel_72h_window",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
        AND e.ts <= v.t1 + INTERVAL 72 HOUR
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN c ON e.user_id = c.user_id
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
        AND e.ts <= v.t1 + INTERVAL 72 HOUR
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_72h,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_72h,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM v), 0), 6) AS conversion_72h
    """,
    tags=("sequence", "funnel", "attribution-window", "match-recognize"),
)
def events_funnel_72h_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOXED funnel — the attribution-window variant the unbounded
    funnel (funnel_view_click_purchase, queries/breadth.py) cannot
    answer: a click counts only within 72 hours of the user's first
    view, and a purchase only after that qualifying click AND still
    inside the same 72-hour attribution window (the standard
    campaign-measurement contract: credit expires). Same per-stage
    shape — filtered aggregate joined to the prior stage's anchor, all
    shuffles on user_id, no stream-wide window — plus the deadline
    predicate carried from the view anchor."""
    e = load_table(spark, sf_dir, "events")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    deadline = F.col("t1") + F.expr("INTERVAL 72 HOURS")
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .join(v, "user_id")
        .where((F.col("ts") > F.col("t2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    nv = v.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_click_72h"))
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n_purchase_72h"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_click_72h",
            "n_purchase_72h",
            F.round(
                F.col("n_purchase_72h").cast("double")
                / F.nullif(F.col("n_view"), F.lit(0)),
                6,
            ).alias("conversion_72h"),
        )
    )


# --- keyset pagination ------------------------------------------------------------


@query(
    "orders_keyset_pagination_page3",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20 OFFSET 40
    """,
    tags=("pagination", "keyset", "top-k", "sort-limit"),
)
def orders_keyset_pagination_page3(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KEYSET pagination (the scale-correct replacement for OFFSET): the
    cursor after page 2 is the 40th row of the total order
    (o_orderdate, o_orderkey), fetched as a TakeOrderedAndProject
    top-40; page 3 is WHERE (date, key) > cursor ORDER BY ... LIMIT 20 —
    a pushed-down range predicate plus another top-k, never a global
    OFFSET skip-scan. The oracle states the same page as LIMIT/OFFSET,
    so the equivalence of the two formulations IS the check."""
    o = load_table(spark, sf_dir, "orders")
    page_cols = [
        F.col("o_orderkey").cast("bigint").alias("orderkey"),
        F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
        dec("o_totalprice").cast("double").alias("price"),
    ]
    cursor = (
        o.orderBy("o_orderdate", "o_orderkey")
        .limit(40)
        .agg(
            F.max(
                F.struct(
                    F.col("o_orderdate").alias("d"),
                    F.col("o_orderkey").alias("k"),
                )
            ).alias("c")
        )
        .collect()[0]["c"]
    )
    after = (F.col("o_orderdate") > F.lit(cursor["d"])) | (
        (F.col("o_orderdate") == F.lit(cursor["d"]))
        & (F.col("o_orderkey") > F.lit(cursor["k"]))
    )
    return (
        o.where(after)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
        .select(*page_cols)
    )


# --- contingency / association statistics -------------------------------------------


@query(
    "customer_segment_priority_chi2",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cell AS (
      SELECT seg, prio, CAST(COUNT(*) AS BIGINT) AS o FROM j GROUP BY 1, 2
    ), rowt AS (SELECT seg, SUM(o) AS rt FROM cell GROUP BY seg),
    colt AS (SELECT prio, SUM(o) AS ct FROM cell GROUP BY prio),
    tot AS (SELECT SUM(o) AS n FROM cell)
    SELECT CAST(MAX(tot.n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(CAST(SUM(CAST(ROUND(
             POW(cell.o - CAST(rowt.rt * colt.ct AS DOUBLE) / tot.n, 2)
               / (CAST(rowt.rt * colt.ct AS DOUBLE) / tot.n), 8)
           AS DECIMAL(28,8))) AS DOUBLE), 4) AS chi2
    FROM cell
    JOIN rowt ON cell.seg = rowt.seg
    JOIN colt ON cell.prio = colt.prio
    CROSS JOIN tot
    """,
    tags=("stats", "chi-squared", "contingency", "independence"),
)
def customer_segment_priority_chi2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-way contingency chi-squared for independence between customer
    market segment and order priority (5×5 table): observed cells are
    exact counts, each expected value rt·ct/n is ONE double division of
    exact integers, and the (o−e)²/e terms fold via the round-8 decimal
    device so the 25-term sum is order-free. Present cells only — the
    fixture populates all 25, and absent cells would be absent on both
    sides identically."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # no broadcast hint: the customer table grows linearly with SF —
    # AQE broadcasts it while it is actually small and shuffles when not
    # (the same discipline as the Spearman rank joins).
    j = o.join(
        c.select("c_custkey", "c_mktsegment"),
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("prio"),
    )
    cell = j.groupBy("seg", "prio").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rowt = cell.groupBy("seg").agg(F.sum("o").alias("rt"))
    colt = cell.groupBy("prio").agg(F.sum("o").alias("ct"))
    tot = cell.agg(F.sum("o").alias("n"))
    e = (F.col("rt") * F.col("ct")).cast("double") / F.col("n")
    term = F.round(F.pow(F.col("o") - e, 2) / e, 8).cast("decimal(28,8)")
    return (
        cell.join(F.broadcast(rowt), "seg")
        .join(F.broadcast(colt), "prio")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.round(F.sum(term).cast("double"), 4).alias("chi2"),
        )
    )


@query(
    "part_brand_type_lift",
    oracle="""
    WITH cell AS (
      SELECT p_brand AS brand, p_type AS ptype,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ), bt AS (SELECT brand, SUM(o) AS bn FROM cell GROUP BY brand),
    tt AS (SELECT ptype, SUM(o) AS tn FROM cell GROUP BY ptype),
    tot AS (SELECT SUM(o) AS n FROM cell)
    SELECT cell.brand, cell.ptype, cell.o AS n_parts,
           ROUND(CAST(cell.o AS DOUBLE) * tot.n / (bt.bn * tt.tn), 6)
             AS lift
    FROM cell
    JOIN bt ON cell.brand = bt.brand
    JOIN tt ON cell.ptype = tt.ptype
    CROSS JOIN tot
    ORDER BY cell.brand, cell.ptype
    """,
    tags=("stats", "association", "lift", "market-basket"),
)
def part_brand_type_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association LIFT between part brand and part type —
    P(brand ∧ type) / (P(brand)·P(type)) as the integer-exact expression
    o·n / (bn·tn) with ONE double expression rounded at 6dp (lift > 1 =
    the brand over-indexes in that type; the market-basket sibling of
    basket_association_rules, on attributes instead of baskets). Three
    tiny aggregates and two broadcast joins."""
    p = load_table(spark, sf_dir, "part")
    cell = p.groupBy(
        F.col("p_brand").alias("brand"), F.col("p_type").alias("ptype")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    bt = cell.groupBy("brand").agg(F.sum("o").alias("bn"))
    tt = cell.groupBy("ptype").agg(F.sum("o").alias("tn"))
    tot = cell.agg(F.sum("o").alias("n"))
    return (
        cell.join(F.broadcast(bt), "brand")
        .join(F.broadcast(tt), "ptype")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand",
            "ptype",
            F.col("o").alias("n_parts"),
            F.round(
                F.col("o").cast("double")
                * F.col("n")
                / (F.col("bn") * F.col("tn")),
                6,
            ).alias("lift"),
        )
        .orderBy("brand", "ptype")
    )


# --- time series: lag-7 autocorrelation ---------------------------------------------


@query(
    "orders_revenue_autocorr_lag7",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
               AS rev
      FROM orders GROUP BY day
    ), pair AS (
      SELECT a.rev AS x, b.rev AS y
      FROM d a JOIN d b ON b.day = a.day + to_days(7)
    ), m AS (
      SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             SUM(CAST(x AS DECIMAL(38,2))) AS sx,
             SUM(CAST(y AS DECIMAL(38,2))) AS sy,
             SUM(CAST(x * y AS DECIMAL(38,4))) AS sxy,
             SUM(CAST(x * x AS DECIMAL(38,4))) AS sxx,
             SUM(CAST(y * y AS DECIMAL(38,4))) AS syy
      FROM pair
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE)), 6)
             AS acf_lag7
    FROM m
    """,
    tags=("stats", "time-series", "autocorrelation", "weekly"),
)
def orders_revenue_autocorr_lag7(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lag-7 (weekly) autocorrelation of daily revenue — the seasonality
    twin of the lag-1/lag-2 diagnostics (events_durbin_watson_daily,
    orders_pacf_lag2_daily): pairs join each day to day+7 (an equi join
    on the date key, not a window), Pearson moments fold as EXACT
    decimals, and the only float is one final expression rounded at 6dp."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice")).cast("decimal(28,2)").alias("rev")
    )
    b = d.select(
        F.date_sub(F.col("day"), 7).alias("day"), F.col("rev").alias("y")
    )
    pair = d.join(b, "day").select(F.col("rev").alias("x"), "y")
    m = pair.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,2)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,2)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(num / F.sqrt(dx * dy), 6).alias("acf_lag7"),
    )


# --- per-group z-score outlier census --------------------------------------------


@query(
    "supplier_nation_zscore_outliers",
    oracle="""
    WITH st AS (
      SELECT s_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS mean,
             CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))
                      * CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS m2
      FROM supplier GROUP BY s_nationkey
    )
    SELECT CAST(s.s_nationkey AS INT) AS nationkey,
           CAST(MAX(st.n) AS BIGINT) AS n_suppliers,
           CAST(COUNT(*) FILTER (
             POW(CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE)
                 - st.mean, 2) > 4 * (st.m2 - st.mean * st.mean)
           ) AS BIGINT) AS n_outliers
    FROM supplier s JOIN st ON s.s_nationkey = st.s_nationkey
    GROUP BY s.s_nationkey ORDER BY nationkey
    """,
    tags=("stats", "z-score", "outliers", "per-group"),
)
def supplier_nation_zscore_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """|z| > 2 outlier census per nation on supplier balances, with the
    z-threshold rewritten square-free of sigma: (x − μ)² > 4·(E[x²] − μ²)
    — both sides are the same two double divisions of exact decimal
    moments, so the comparison sequence is engine-identical (no sqrt in
    the predicate at all). One grouped-moment pass plus one broadcast
    join back; population variance (biased) by construction."""
    s = load_table(spark, sf_dir, "supplier")
    st = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum(dec("s_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "mean"
        ),
        (
            F.sum(dec("s_acctbal") * dec("s_acctbal")).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    j = s.join(F.broadcast(st), "s_nationkey")
    is_out = F.pow(
        dec("s_acctbal").cast("double") - F.col("mean"), 2
    ) > 4 * (F.col("m2") - F.col("mean") * F.col("mean"))
    return (
        j.groupBy(F.col("s_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.max("n").cast("bigint").alias("n_suppliers"),
            F.count(F.when(is_out, 1)).cast("bigint").alias("n_outliers"),
        )
        .orderBy("nationkey")
    )


# --- Markov transition matrix ------------------------------------------------------


@query(
    "events_type_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ), cell AS (
      SELECT prev, event_type AS nxt, CAST(COUNT(*) AS BIGINT) AS o
      FROM seq WHERE prev IS NOT NULL GROUP BY prev, nxt
    ), rowt AS (SELECT prev, SUM(o) AS rt FROM cell GROUP BY prev)
    SELECT cell.prev, cell.nxt, cell.o AS n_transitions,
           ROUND(CAST(cell.o AS DOUBLE) / rowt.rt, 6) AS p
    FROM cell JOIN rowt ON cell.prev = rowt.prev
    ORDER BY cell.prev, nxt
    """,
    tags=("sequence", "markov", "transition-matrix", "per-key-window"),
)
def events_type_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The raw Markov transition matrix P(next type | prev type) whose
    conditional entropy events_entropy_rate_markov reduces to a scalar:
    per-user lag over the (ts, event_id) total order (a PER-KEY window —
    parallel across users), one count aggregate onto ≤ 25 cells, row
    normalization as one rounded division each. The matrix itself is the
    recommender/anomaly prior a pipeline materializes."""
    e = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(wu).alias("prev")
    ).where(F.col("prev").isNotNull())
    cell = seq.groupBy(
        "prev", F.col("event_type").alias("nxt")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    rowt = cell.groupBy("prev").agg(F.sum("o").alias("rt"))
    return (
        cell.join(F.broadcast(rowt), "prev")
        .select(
            "prev",
            "nxt",
            F.col("o").alias("n_transitions"),
            F.round(F.col("o").cast("double") / F.col("rt"), 6).alias("p"),
        )
        .orderBy("prev", "nxt")
    )


# --- embeddings: per-dimension variance top-k ----------------------------------------


@query(
    "embed_dim_variance_topk",
    oracle="""
    WITH q AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS qv
      FROM embeddings
    ), m AS (
      SELECT dim, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(qv) AS DECIMAL(38,0)) AS s,
             CAST(SUM(qv * qv) AS DECIMAL(38,0)) AS ss
      FROM q GROUP BY dim
    ), v AS (
      SELECT dim, CAST(n * ss - s * s AS DECIMAL(38,0)) AS nvar FROM m
    ), r AS (
      SELECT dim, nvar,
             RANK() OVER (ORDER BY nvar DESC, dim) AS rk
      FROM v
    )
    SELECT CAST(dim AS INT) AS dim, CAST(rk AS INT) AS rk,
           CAST(nvar AS DOUBLE) AS n2_variance
    FROM r WHERE rk <= 5 ORDER BY rk, dim
    """,
    tags=("llm", "embeddings", "variance", "feature-selection"),
)
def embed_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 highest-variance embedding dimensions — the feature-selection
    screen before PCA/quantization (a dimension with near-zero variance
    carries no signal and quantizes to one code). Components quantize to
    integer micro-units so the moments fold as EXACT int64/decimal; the
    ranking key n²·Var = n·Σq² − (Σq)² stays integer-exact (no division
    at all), and the window ranks 64 dimension rows — constant."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(F.posexplode("embedding").alias("pos", "val")).select(
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("qv"),
    )
    m = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("qv").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("qv") * F.col("qv")).cast("decimal(38,0)").alias("ss"),
    )
    v = m.select(
        "dim",
        (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        .cast("decimal(38,0)")
        .alias("nvar"),
    )
    wr = W.orderBy(F.desc("nvar"), "dim")
    return (
        v.withColumn("rk", F.rank().over(wr))
        .where(F.col("rk") <= 5)
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("rk").cast("int").alias("rk"),
            F.col("nvar").cast("double").alias("n2_variance"),
        )
        .orderBy("rk", "dim")
    )


# --- text: shingle diversity -------------------------------------------------------


@query(
    "documents_shingle3_distinct_rate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             string_split(regexp_replace(trim(text), ' +', ' ', 'g'), ' ')
               AS ws
      FROM documents WHERE trim(text) <> ''
    ), sh AS (
      SELECT source,
             ws[k] || ' ' || ws[k+1] || ' ' || ws[k+2] AS shingle
      FROM toks, LATERAL (
        SELECT unnest(range(1, len(ws) - 1)) AS k
      )
      WHERE len(ws) >= 3
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_distinct,
           ROUND(CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*), 6)
             AS distinct_rate
    FROM sh GROUP BY source ORDER BY source
    """,
    tags=("llm", "text", "shingles", "diversity", "dedup-adjacent"),
)
def documents_shingle3_distinct_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source 3-gram shingle diversity — distinct shingles over total
    shingles, the template-spam tell the near-dup pipeline thresholds on
    (a source whose rate collapses is stamping the same text). Shingling
    is whitespace tokenization + a bounded slide (the dedup front end's
    shape); the census is one exact-count aggregate per source with one
    rounded division."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(
        F.regexp_replace(F.trim(F.col("text")), " +", " "), " "
    )
    toks = d.where(F.trim(F.col("text")) != "").select(
        "source", ws.alias("ws")
    ).where(F.size("ws") >= 3)
    sh = toks.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("ws") - 3),
                lambda k: F.concat_ws(
                    " ",
                    F.element_at(F.col("ws"), k + 1),
                    F.element_at(F.col("ws"), k + 2),
                    F.element_at(F.col("ws"), k + 3),
                ),
            )
        ).alias("shingle"),
    )
    return (
        sh.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count_distinct("shingle").cast("bigint").alias("n_distinct"),
            F.round(
                F.count_distinct("shingle").cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("distinct_rate"),
        )
        .orderBy("source")
    )


# --- user lifetime census ----------------------------------------------------------


@query(
    "events_user_lifetime_census",
    oracle="""
    WITH u AS (
      SELECT user_id,
             date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS lifetime_days,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT CAST(lifetime_days // 7 AS INT) AS lifetime_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(MIN(lifetime_days) AS INT) AS min_days,
           CAST(MAX(lifetime_days) AS INT) AS max_days
    FROM u GROUP BY lifetime_weeks ORDER BY lifetime_weeks
    """,
    tags=("analytics", "lifetime", "cohort", "census"),
)
def events_user_lifetime_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """User-lifetime histogram in weekly buckets (first-to-last activity
    span): the retention-shape census a cohort analysis starts from —
    two keyed aggregations (per user, then per bucket), all integers,
    no windows, no ordering beyond the output sort."""
    e = load_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.datediff(F.to_date(F.max("ts")), F.to_date(F.min("ts"))).alias(
            "lifetime_days"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        u.groupBy(
            F.floor(F.col("lifetime_days") / 7)
            .cast("int")
            .alias("lifetime_weeks")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.min("lifetime_days").cast("int").alias("min_days"),
            F.max("lifetime_days").cast("int").alias("max_days"),
        )
        .orderBy("lifetime_weeks")
    )


# --- 2-D discount x tax contour ------------------------------------------------------


@query(
    "lineitem_discount_tax_contour",
    oracle="""
    SELECT CAST(ROUND(l_discount * 100) AS INT) AS disc_pct,
           CAST(ROUND(l_tax * 100) AS INT) AS tax_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY disc_pct, tax_pct ORDER BY disc_pct, tax_pct
    """,
    tags=("aggregation", "2d-histogram", "contour"),
)
def lineitem_discount_tax_contour(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The (discount %, tax %) 2-D contingency contour with revenue mass
    per cell — the pricing-policy heatmap. Percent cells come from
    ROUND(x·100), exact on the 2dp fixture values; the grid is ≤ 11×9
    cells however large the fact table, so the whole result is
    broadcast-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.round(F.col("l_discount") * 100)
            .cast("int")
            .alias("disc_pct"),
            F.round(F.col("l_tax") * 100).cast("int").alias("tax_pct"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum("l_extendedprice").alias("revenue"),
        )
        .orderBy("disc_pct", "tax_pct")
    )
