#!/usr/bin/env python
"""End-to-end training-corpus pipeline demo: the full path a pretraining
data shard takes through this engine, with per-stage row counts and wall
times printed as one funnel JSON.

    clean/normalize → language filter → quality filter → exact dedup →
    near dedup (MinHash-LSH) → decontaminate vs holdout →
    weighted sample → pack sequences → bucketed write

Usage: python scripts/demo_pipeline.py [sf_dir]    (default sf0.1)

Every stage is the SAME operator the driver-registered queries use — this
script just chains them, so the funnel doubles as an integration test of
operator composability. Writes only under /tmp.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from distributed_graph_database_system_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    shingles_long,
)
from distributed_graph_database_system_spark.operators.textstats import (  # noqa: E402
    bpe_ish_token_count,
    lang_id,
    quality_score,
)
from distributed_graph_database_system_spark.queries.helpers import (  # noqa: E402
    dsum,
    md5_uniform,
)
from distributed_graph_database_system_spark.queries.pipeline import (  # noqa: E402
    _md5_bucket,
)
from distributed_graph_database_system_spark.session import get_spark  # noqa: E402
from distributed_graph_database_system_spark.sources import layout  # noqa: E402
from distributed_graph_database_system_spark.sources.catalog import load_table  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="pipeline-demo")
    out_root = os.path.join(tempfile.gettempdir(), "spark_graft_demo")
    funnel: list[dict] = []
    t_start = time.perf_counter()

    def stage(name: str, df):
        """Materialize the stage ONCE (localCheckpoint cuts lineage), so
        'sec' measures THIS stage's work and later stages never recompute
        the prefix — without this, each count would re-run every upstream
        stage and the funnel timings would be cumulative lies."""
        t0 = time.perf_counter()
        df = df.localCheckpoint()
        n = df.count()
        funnel.append(
            {"stage": name, "rows": n, "sec": round(time.perf_counter() - t0, 2)}
        )
        return df

    docs = stage("ingest", load_table(spark, sf_dir, "documents"))

    # 1. clean/normalize: collapse whitespace, strip control chars
    cleaned = stage(
        "clean_normalize",
        docs.withColumn(
            "text",
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(F.coalesce("text", F.lit("")), r"[\x00-\x1f]", " "),
                    r"\s{2,}",
                    " ",
                )
            ),
        ),
    )

    # 2-3. language + quality gates (pure codegen'd expressions)
    en = stage("lang_en", cleaned.where(lang_id(F.col("text")) == "en"))
    good = stage("quality_ge_06", en.where(quality_score(F.col("text")) >= 0.6))

    # 4. exact dedup: keep the smallest doc_id per text hash
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    uniq = stage(
        "exact_dedup",
        good.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn"),
    )

    # 5. near dedup: MinHash-LSH pairs → drop the larger id of each pair
    pairs = minhash_lsh_pairs(uniq, threshold=0.7)
    near = stage(
        "near_dedup",
        uniq.join(
            pairs.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
        ),
    )

    # 6. decontaminate: drop train docs sharing ≥80% of shingles with the
    #    test holdout (bucket ≥ 90 — the registered decontaminate_holdout
    #    rule, same _md5_bucket splitter)
    bucket = _md5_bucket()
    sh_rows = shingles_long(near, n=3).withColumnRenamed("_id", "doc_id")
    with_b = sh_rows.join(near.select("doc_id").withColumn("_b", bucket), "doc_id")
    holdout_sh = with_b.where(F.col("_b") >= 90).select("shingle").distinct()
    train_sh = with_b.where(F.col("_b") < 90)
    overlap = (
        train_sh.join(holdout_sh, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    totals = train_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    contaminated = (
        totals.join(overlap, "doc_id", "left")
        .where(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_sh") >= 0.8)
        .select("doc_id")
    )
    clean_train = stage(
        "decontaminated",
        near.withColumn("_b", bucket)
        .where(F.col("_b") < 90)
        .drop("_b")
        .join(contaminated, "doc_id", "left_anti"),
    )

    # 7. weighted sample: A-Res on md5 uniforms, weight = doc length.
    # Exact global top-2000 WITHOUT a corpus-wide single-partition window:
    # phase 1 takes each source's local top-2000 (partitioned window), so
    # the global window in phase 2 ranks at most 2000×n_sources survivors —
    # the standard two-phase top-k that keeps the unpartitioned pass bounded
    # at any corpus size.
    u = md5_uniform("doc_id")
    key = F.log(F.greatest(u, F.lit(1e-300))) / F.greatest(
        F.col("n_chars").cast("double"), F.lit(1.0)
    )
    wk_local = W.partitionBy("source").orderBy(F.desc("_k"), "doc_id")
    wk_global = W.orderBy(F.desc("_k"), "doc_id")
    sampled = stage(
        "weighted_sample",
        clean_train.withColumn("_k", key)
        .withColumn("_lrn", F.row_number().over(wk_local))
        .where(F.col("_lrn") <= 2000)
        .withColumn("_rn", F.row_number().over(wk_global))
        .where(F.col("_rn") <= 2000)
        .drop("_k", "_lrn", "_rn"),
    )

    # 8. pack into 2048-token sequences (per-source concat-and-chunk)
    wp = W.partitionBy("source").orderBy("doc_id")
    toks = bpe_ish_token_count(F.col("text"))
    packed = stage(
        "pack_2048",
        sampled.withColumn("_t", toks)
        .withColumn("_off", F.sum("_t").over(wp) - F.col("_t"))
        .withColumn("bin", F.floor(F.col("_off") / 2048))
        .groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_t").alias("n_tokens"),
            dsum(F.col("n_chars")).alias("n_chars"),
        ),
    )

    # 9. hive-partitioned write by source: downstream per-source reads prune
    #    directories (for co-located joins on a key, layout.write_bucketed
    #    is the tool — not used here since bins are already aggregated)
    out = os.path.join(out_root, "packed")
    t0 = time.perf_counter()
    layout.write_partitioned(packed, out, ["source"])
    funnel.append(
        {"stage": "write_partitioned", "rows": None,
         "sec": round(time.perf_counter() - t0, 2)}
    )

    print(
        json.dumps(
            {
                "pipeline": "corpus-demo",
                "sf_dir": sf_dir,
                "total_sec": round(time.perf_counter() - t_start, 2),
                "funnel": funnel,
                "out": out,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
