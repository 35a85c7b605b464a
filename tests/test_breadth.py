"""Breadth tests: sink round-trips for every writer format, approx-percentile
error bound vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.sources.catalog import load_table
from distributed_graph_database_system_spark.sources.io import (
    read_csv,
    read_json,
    read_parquet,
    write_csv,
    write_json,
    write_parquet,
)


def test_sink_roundtrips_all_formats(spark, sf_dir, tmp_path):
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    want = {(r.c_custkey, r.c_name, round(r.c_acctbal, 2)) for r in cust.collect()}
    schema = "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE"

    write_parquet(cust, str(tmp_path / "p"))
    got_p = read_parquet(spark, str(tmp_path / "p"))
    assert {(r.c_custkey, r.c_name, round(r.c_acctbal, 2)) for r in got_p.collect()} == want

    write_csv(cust, str(tmp_path / "c"))
    got_c = read_csv(spark, str(tmp_path / "c"), schema)
    assert {(r.c_custkey, r.c_name, round(r.c_acctbal, 2)) for r in got_c.collect()} == want

    write_json(cust, str(tmp_path / "j"))
    got_j = read_json(spark, str(tmp_path / "j"), schema)
    assert {(r.c_custkey, r.c_name, round(r.c_acctbal, 2)) for r in got_j.collect()} == want


def test_append_mode_accumulates(spark, sf_dir, tmp_path):
    one = load_table(spark, sf_dir, "region")
    write_parquet(one, str(tmp_path / "a"))
    write_parquet(one, str(tmp_path / "a"), mode="append")
    assert read_parquet(spark, str(tmp_path / "a")).count() == 2 * one.count()


def test_percentile_approx_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: (r.m, r.p90)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("m"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90"),
        )
        .collect()
    }
    approx = {
        r.l_returnflag: (r.m, r.p90)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 10_000).alias("m"),
            F.percentile_approx("l_quantity", 0.9, 10_000).alias("p90"),
        )
        .collect()
    }
    for flag, (em, ep) in exact.items():
        am, ap = approx[flag]
        assert abs(am - em) <= 1.0, (flag, am, em)
        assert abs(ap - ep) <= 1.0, (flag, ap, ep)


def test_approx_count_distinct_error_bound(spark, sf_dir):
    from distributed_graph_database_system_spark.queries.breadth import (
        agg_approx_distinct,
    )

    for r in agg_approx_distinct(spark, sf_dir).collect():
        assert abs(r.approx_custs - r.exact_custs) <= max(3, 0.05 * r.exact_custs), r


def test_hll_sketch_rollup_merge_equals_direct(spark):
    """The HLL rollup's load-bearing property: union-merging per-group
    sketches gives EXACTLY the estimate of one sketch over the raw rows
    (register-max merge is lossless), and the estimate lands within the
    lgConfigK=12 error envelope of the true cardinality at a size where
    HLL actually approximates (50k distinct ≫ the exact-mode threshold)."""
    from pyspark.sql import functions as F

    n = 200_000
    df = spark.range(n).select(
        (F.col("id") % 40).alias("g"), (F.xxhash64("id") % 50_000).alias("u")
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u", 12)).alias("est")
    ).first()["est"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("u", 12).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .first()["est"]
    )
    exact = df.select("u").distinct().count()
    assert merged == direct
    assert abs(merged - exact) <= 0.05 * exact, (merged, exact)


def test_partition_pruning_on_partitioned_sink(spark, sf_dir, tmp_path):
    """Write lineitem partitioned by ship year; a year-filtered scan must
    prune partitions (visible in the physical plan) and return exactly the
    batch-filtered rows."""
    import io
    from contextlib import redirect_stdout

    from distributed_graph_database_system_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    path = str(tmp_path / "li_by_year")
    li.write.partitionBy("ship_year").mode("overwrite").parquet(path)

    scan = spark.read.parquet(path).where(F.col("ship_year") == 1995)
    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "1995" in plan
    assert scan.count() == li.where(F.col("ship_year") == 1995).count()


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Write both join sides bucketed by the join key: the sort-merge join
    must consume the bucketing and plan with NO shuffle exchange — the
    co-located-join pattern that removes the dominant cost of repeated
    fact-to-fact joins at 100 TB."""
    import io
    from contextlib import redirect_stdout

    from distributed_graph_database_system_spark.sources.catalog import load_table

    # warehouse.dir is a static conf; managed tables land in ./spark-warehouse
    # (gitignored) and are dropped in the finally block.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
            "overwrite"
        ).saveAsTable("b_orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
            "overwrite"
        ).saveAsTable("b_lineitem")

        j = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        want = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert j.count() == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_read_parquet_resilient_skips_corrupt_files(spark, sf_dir, tmp_path):
    """One corrupt part-file must cost a quarantine entry, not the job:
    the strict read raises, the resilient read returns every row of the
    intact files, and the quarantine log names exactly the bad file."""
    import glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from distributed_graph_database_system_spark.sources.io import (
        read_parquet_resilient,
    )

    path = str(tmp_path / "lake")
    spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(4).write.parquet(path)
    parts = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(parts) == 4
    good_rows = 1000 - spark.read.parquet(parts[1]).count()
    with open(parts[1], "wb") as fh:  # truncate to garbage
        fh.write(b"PAR1garbage")

    strict = spark.read.parquet(path)
    with pytest.raises(Exception):
        strict.count()

    log = str(tmp_path / "quarantine.txt")
    df = read_parquet_resilient(spark, path, quarantine_log=log)
    assert df.count() == good_rows
    logged = open(log).read().strip().splitlines()
    assert len(logged) == 1 and logged[0].endswith(os.path.basename(parts[1]))


def test_full_audit_catches_page_corruption_under_intact_footer(spark, tmp_path):
    """The footer-level audit's documented blind spot, and the full
    level's answer: flip bytes in a part-file's data pages while leaving
    the footer intact — footer audit says ok, full audit flags exactly
    that file."""
    import glob

    from pyspark.sql import functions as F

    from distributed_graph_database_system_spark.sources.io import (
        audit_parquet_files,
    )

    path = str(tmp_path / "lake2")
    spark.range(50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("s")
    ).repartition(2).write.parquet(path)
    parts = sorted(glob.glob(f"{path}/part-*.parquet"))
    with open(parts[0], "r+b") as fh:  # corrupt mid-file, footer untouched
        fh.seek(2000)
        fh.write(b"\x00" * 4000)

    footer = {r.file: r.ok for r in audit_parquet_files(spark, path).collect()}
    assert footer[parts[0]] is True  # the blind spot, as documented
    full = {
        r.file: r.ok
        for r in audit_parquet_files(spark, path, level="full").collect()
    }
    assert full[parts[0]] is False and full[parts[1]] is True


def test_ols_normal_eq_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer-solved normal equations agree with numpy's QR-based
    lstsq on the same fixture rows — algebra check independent of the
    DuckDB oracle (which shares the SQL template by construction)."""
    import numpy as np

    from distributed_graph_database_system_spark.queries.breadth import (
        lineitem_ols_normal_eq,
    )

    row = lineitem_ols_normal_eq(spark, sf_dir).first()
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(li)), li.l_quantity.values, li.l_discount.values]
    )
    y = li.l_extendedprice.values
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert row.n_rows == len(li)
    assert abs(row.b0 - beta[0]) < max(1e-6 * abs(beta[0]), 0.02)
    assert abs(row.b1 - beta[1]) < max(1e-6 * abs(beta[1]), 1e-3)
    assert abs(row.b2 - beta[2]) < max(1e-6 * abs(beta[2]), 1e-2)
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(row.r2 - (1.0 - ss_res / ss_tot)) < 1e-5


def test_sliding_quantile_histogram_tracks_exact_percentiles(spark, sf_dir):
    """The 0.01-bucket histogram quantiles sit within one bucket width of
    Spark's exact percentile() on every window (nearest-rank vs
    interpolated can differ by at most the local gap, which uniform 0.01
    granularity bounds)."""
    from distributed_graph_database_system_spark.queries.breadth import (
        events_sliding7_quantiles_hist,
    )

    got = {
        r.day: (r.p50, r.p95, r.p99)
        for r in events_sliding7_quantiles_hist(spark, sf_dir).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    days = [
        r.day for r in e.select(F.to_date("ts").alias("day")).distinct().collect()
    ]
    import datetime

    for day in sorted(days)[:5]:  # spot-check a handful of windows
        lo = day - datetime.timedelta(days=6)
        vals = (
            e.where(
                (F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") <= F.lit(day))
            )
            .selectExpr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY value) p50",
                "percentile_disc(0.95) WITHIN GROUP (ORDER BY value) p95",
                "percentile_disc(0.99) WITHIN GROUP (ORDER BY value) p99",
            )
            .first()
        )
        g = got[str(day)]
        for i, name in enumerate(("p50", "p95", "p99")):
            # same nearest-rank definition: the histogram answer is the
            # bucket FLOOR of the exact discrete percentile — within one
            # 0.01 bucket below it, never above
            assert vals[name] - 0.0100001 <= g[i] <= vals[name] + 1e-9, (
                day,
                name,
                g[i],
                vals[name],
            )


def test_hll_datasketches_bounds_and_union(spark, sf_dir):
    """Spark 4's native Apache DataSketches HLL (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate): estimates within the lgk=12
    error envelope and the cross-group union consistent with the exact
    global distinct. Pytest-only, NOT a driver query: unlike
    approx_count_distinct (register-max HLL++, partitioning-invariant,
    pinned in agg_approx_distinct), the DataSketches sketch promotes a
    coupon list to dense HLL in a merge-order-dependent way — measured
    here as different estimates under different shuffle layouts — so no
    deterministic golden exists (same class of boundary as
    agg_median_approx)."""
    from pyspark.sql import functions as F

    from distributed_graph_database_system_spark.sources.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey", 12).alias("sk"),
        F.count_distinct("o_custkey").alias("exact"),
    )
    rows = per.select(
        "o_orderstatus", F.hll_sketch_estimate("sk").alias("est"), "exact"
    ).collect()
    assert rows
    for r in rows:
        assert abs(r.est - r.exact) <= max(3, 0.03 * r.exact), tuple(r)
    union_est = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0].e
    exact_all = o.select(F.count_distinct("o_custkey")).collect()[0][0]
    assert abs(union_est - exact_all) <= max(3, 0.03 * exact_all)
