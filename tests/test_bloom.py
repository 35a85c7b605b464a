"""Bloom-filter semi-join reduction (operators/bloom.py): exactness vs the
plain semi join, the superset property of the prefilter, the measured
false-positive rate against the sizing formula, and parameter sizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_graph_database_system_spark.operators.bloom import (
    bloom_build,
    bloom_params,
    bloom_prefilter,
    bloom_semi_join,
    bloom_words_array,
)


def test_bloom_params_sizing():
    m, k = bloom_params(1000, fpp=0.01)
    # Standard formula: ~9.59 bits/key, k ~ 7 at 1% fpp.
    assert 9_000 <= m <= 10_240 and m % 64 == 0
    assert 6 <= k <= 8
    # Degenerate input never yields a zero-size filter.
    assert bloom_params(0) == (64, 1)


def test_prefilter_superset_and_fpp(spark):
    # Dim keys 0..999; fact keys 0..19999 → true member fraction 5%.
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    fact = spark.range(0, 20_000).select(F.col("id").alias("k"))
    cand = bloom_prefilter(fact, "k", dim, "k", fpp=0.01)
    cand_keys = {r["k"] for r in cand.collect()}
    # Every true member survives the prefilter (no false negatives).
    assert set(range(1000)) <= cand_keys
    # False-positive rate over the 19k non-members is near the 1% target
    # (generous ceiling: 3x accounts for double-hashing variance at this n).
    fp = len(cand_keys) - 1000
    assert fp / 19_000 < 0.03


def test_semi_join_exact_vs_plain(spark, sf_dir):
    from distributed_graph_database_system_spark.sources.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    dim = orders.where(F.col("o_totalprice") > 200_000).select("o_orderkey")
    via_bloom = bloom_semi_join(li, "l_orderkey", dim, "o_orderkey", fpp=0.01)
    plain = li.join(
        dim.withColumnRenamed("o_orderkey", "l_orderkey"), ["l_orderkey"], "leftsemi"
    )
    a = sorted(r["l_orderkey"] for r in via_bloom.select("l_orderkey").collect())
    b = sorted(r["l_orderkey"] for r in plain.select("l_orderkey").collect())
    assert a == b


def test_bitmap_word_layout(spark):
    # Key set of one: exactly k bits set across the dense array.
    dim = spark.range(7, 8).select(F.col("id").alias("k"))
    m, k = 1024, 5
    words = bloom_build(dim, "k", m, k)
    dense = bloom_words_array(words, m)
    assert len(dense) == m // 64
    popcount = sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in dense)
    # k hash positions may collide with each other, never exceed k.
    assert 1 <= popcount <= k


def test_prefilter_sits_below_shuffle_semi_join(spark, sf_dir):
    """The scale-path claim, in two parts. (a) bloom_prefilter's membership
    test (bit_get over the broadcast bitmap) runs in the fact-scan stage —
    no exchange anywhere in its plan, so rows are dropped before any
    shuffle. (b) bloom_semi_join pins that ordering against Catalyst:
    PushDownLeftSemiAntiJoin would otherwise rewrite
    semi(cross(fact, bloom), keys) into cross(semi(fact, keys), bloom) —
    shuffling the UNFILTERED fact — so the exact join must sit above the
    checkpoint barrier, not above the raw cross join."""
    from distributed_graph_database_system_spark.operators.bloom import (
        bloom_prefilter,
        bloom_semi_join,
    )
    from distributed_graph_database_system_spark.sources.catalog import load_table

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        dim = orders.where(F.col("o_totalprice") > 200_000).select("o_orderkey")

        pre = bloom_prefilter(li, "l_orderkey", dim.distinct(), "o_orderkey")
        pre_plan = pre._jdf.queryExecution().executedPlan().toString()
        assert "bit_get" in pre_plan
        assert "Exchange" not in pre_plan.replace("BroadcastExchange", ""), (
            "prefilter must not shuffle the fact side"
        )

        out = bloom_semi_join(li, "l_orderkey", dim, "o_orderkey")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        semi_at = plan.find("LeftSemi")
        assert semi_at != -1
        left_subtree = plan[semi_at:]
        assert "LogicalRDD" in left_subtree or "ExistingRDD" in left_subtree, (
            "exact semi join must sit above the checkpoint barrier — "
            "otherwise Catalyst reorders it below the bloom filter"
        )
        assert "bit_get" not in plan, (
            "bloom filter leaked above the barrier: the semi join was "
            "reordered below it again"
        )
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
