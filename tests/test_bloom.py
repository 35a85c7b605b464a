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
