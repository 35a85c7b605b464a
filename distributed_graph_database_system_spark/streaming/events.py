"""Structured Streaming surface over the ``events`` fixture.

The fixture parquet is replayed as a *file stream* (N slices dropped into a
source directory, ``maxFilesPerTrigger=1``) so every operator here runs under
a genuine incremental execution with watermarks and state — the same code
path a Kafka source would drive. Each streaming operator has a batch twin
(queries/streaming_batch.py) registered with a DuckDB oracle; the pytest
suite asserts streaming output == batch output once the replay drains.

Scale notes: watermarks bound state (late rows beyond the delay are
dropped); session windows merge incrementally per key; dedup state is
per-key-bounded by the watermark. All aggregates below run in update/append
modes exactly as they would on an unbounded production stream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_graph_database_system_spark.sources.catalog import load_table

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def replay_dir(spark: SparkSession, sf_dir: str, out_dir: str, slices: int = 8) -> str:
    """Materialize events as ``slices`` parquet files written *sequentially in
    time order* (FileStreamSource triggers files oldest-modification-first),
    so replay approximates real arrival order and watermarks never see
    wholesale time travel between micro-batches."""
    import glob
    import shutil

    src = os.path.join(out_dir, "events_stream_src")
    if os.path.isdir(src):
        # a previous replay with MORE slices would otherwise leave stale
        # slice files that replay alongside the new ones (duplicated events)
        import shutil as _shutil

        _shutil.rmtree(src)
    os.makedirs(src, exist_ok=True)
    ev = load_table(spark, sf_dir, "events")
    sliced = ev.withColumn(
        "_slice", F.ntile(slices).over(__import__("pyspark").sql.Window.orderBy("ts"))
    )
    sliced = sliced.persist()
    try:
        for i in range(1, slices + 1):
            tmp = os.path.join(out_dir, f"_slice_{i}")
            (
                sliced.where(F.col("_slice") == i)
                .drop("_slice")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(src, f"slice-{i:03d}.parquet"))
            shutil.rmtree(tmp)
    finally:
        sliced.unpersist()
    return src


def events_stream(spark: SparkSession, src: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


# --- Windowed aggregates (watermark + tumbling / sliding / session) --------


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour counts per event_type; watermark bounds state and
    drops rows later than `watermark` behind the max seen ts. Money sums use
    the same exact-decimal discipline as the batch twin so streaming and
    batch results are bit-identical, not merely close."""
    from distributed_graph_database_system_spark.queries.helpers import dsum

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


def sliding_value_sum(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sliding 2-hour windows every 1 hour: each row lands in 2 windows."""
    from distributed_graph_database_system_spark.queries.helpers import dsum

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def hopping_type_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """HOPPING 2-hour windows every 30 minutes, keyed by event_type: each
    row lands in 4 overlapping windows (the generic hop shape between
    tumbling's slide==width and sliding_value_sum's 2-bucket case). State
    per key is 4 open windows × |event_type|, GC'd by the watermark."""
    from distributed_graph_database_system_spark.queries.helpers import dsum

    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "2 hours", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value"
        )
    )


def session_window_stats(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-merged incrementally by the state
    store) — the streaming twin of the batch ``sessionize`` query."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event ids within the watermark horizon — state is GC'd
    as the watermark advances, so memory is bounded on unbounded streams."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


# --- Drivers ---------------------------------------------------------------


def run_to_memory(df: DataFrame, name: str, mode: str = "append") -> None:
    """Run a streaming DataFrame to the in-memory sink until the file replay
    drains (processAllAvailable), then stop. Test/bench helper."""
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_foreach_batch(df: DataFrame, batch_fn, mode: str = "update") -> None:
    """foreachBatch sink: ``batch_fn(batch_df, batch_id)`` gets each
    micro-batch as a normal DataFrame (arbitrary sinks, merge/upsert,
    multi-write). Runs until the replay drains."""
    q = df.writeStream.foreachBatch(batch_fn).outputMode(mode).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_foreach_batch_available_now(
    df: DataFrame, batch_fn, checkpoint: str, mode: str = "update"
) -> None:
    """The production run-shape of the foreachBatch pipelines:
    Trigger.AvailableNow + a durable checkpoint. Each invocation drains
    everything currently available (in maxFilesPerTrigger-sized
    micro-batches), commits source offsets to the checkpoint, and
    TERMINATES — the scheduled-batch pattern. A later invocation with the
    same checkpoint resumes AFTER the last committed offset with
    CONTINUING batch ids, which is exactly what the ledger epoch guard
    (_guard_ledger_epoch) requires of a restart."""
    q = (
        df.writeStream.foreachBatch(batch_fn)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        # an interrupted wait must not leak a live query against the
        # DURABLE checkpoint — it would keep committing offsets in the
        # background and conflict with the next invocation
        if q.isActive:
            q.stop()


from contextlib import contextmanager


@contextmanager
def _dynamic_overwrite(*sessions: SparkSession):
    """Dynamic partition-overwrite on EVERY given session for the block's
    duration, previous values restored after. foreachBatch hands the
    batch a CLONED SparkSession (streaming isolates per-batch conf — see
    ResolveWriteToStream) and a write's conf comes from the session its
    DataFrame belongs to, so ledger writes (clone) and rollup rebuilds
    (outer session) BOTH need the flag — missing one silently runs
    static and truncates every earlier batch's cells. Shared by all
    three incremental rollups so the dance cannot drift."""
    key = "spark.sql.sources.partitionOverwriteMode"
    uniq = {id(s): s for s in sessions}
    prevs = {k: s.conf.get(key, "static") for k, s in uniq.items()}
    for s in uniq.values():
        s.conf.set(key, "dynamic")
    try:
        yield
    finally:
        for k, s in uniq.items():
            s.conf.set(key, prevs[k])


def _ledger_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _fold_hwm_path(contrib_path: str) -> str:
    # underscore prefix: invisible to Spark's file index, so ledger reads
    # never see it; lives INSIDE the contrib dir so a dir-level rename
    # (compact's swap) carries or retires it with the data it describes
    return contrib_path.rstrip("/") + "/_fold_hwm"


def read_fold_hwm(spark: SparkSession, contrib_path: str) -> int | None:
    """The ledger's fold high-water mark: every ``batch_id`` strictly below
    it has been folded into the ``batch_id=-1`` checkpoint cell. ``None``
    on a never-folded (or pre-hwm legacy) ledger."""
    fs, p, jvm = _ledger_fs(spark, _fold_hwm_path(contrib_path))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        txt = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return int(json.loads(txt)["fold_hwm"])


def _write_fold_hwm(spark: SparkSession, contrib_path: str, hwm: int) -> None:
    fs, p, _ = _ledger_fs(spark, _fold_hwm_path(contrib_path))
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps({"fold_hwm": int(hwm)}), "utf-8"))
    finally:
        out.close()


def _guard_ledger_epoch(
    spark: SparkSession, contrib_path: str, rollup_path: str, batch_id: int
) -> None:
    """Refuse the two silent-corruption scenarios a restarted stream can
    cause (shared by all three incremental rollups):

    1. rollup exists but the contrib ledger is GONE — the mid-swap crash
       window of compact_contrib_ledger (ledger parked at ``__fold_bak``),
       or an operator deleting the ledger by hand. Writing batch cells
       into a fresh near-empty ledger would rebuild under-counted rollups
       for every touched day; fail instead (restore the ``__fold_bak``
       sibling or delete the rollup to start over).
    2. the incoming ``batch_id`` sits BELOW the fold high-water mark —
       a stream restarted with a fresh checkpoint dir restarts ids at 0,
       so its live batches would collide with already-folded cells and be
       treated as committed by the next fold. Replaying the hwm batch
       itself (== hwm) is the normal at-least-once path and stays allowed.
    """
    fs, contrib_p, _ = _ledger_fs(spark, contrib_path)
    if not fs.exists(contrib_p):
        fs_r, rollup_p, _ = _ledger_fs(spark, rollup_path)
        if fs_r.exists(rollup_p):
            raise IOError(
                f"rollup upsert: {rollup_path} exists but its contrib "
                f"ledger {contrib_path} is missing — a compact() crash "
                "window or manual delete; restore the __fold_bak sibling "
                "or remove the rollup before restarting the stream"
            )
        return
    hwm = read_fold_hwm(spark, contrib_path)
    if hwm is not None and int(batch_id) < hwm:
        raise ValueError(
            f"rollup upsert: batch_id={batch_id} is below the ledger's "
            f"fold high-water mark {hwm} — the stream restarted with a "
            "fresh checkpoint dir (ids restarted at 0) against a ledger "
            "whose ids < hwm are already folded as committed; point the "
            "stream at its original checkpoint or start a new ledger"
        )


def run_incremental_daily_rollup(
    spark: SparkSession, stream: DataFrame, rollup_path: str
) -> None:
    """Maintain a day×event_type rollup table incrementally from the raw
    stream — the continuous-aggregate ("hypertable rollup") pattern:

    each micro-batch contributes partial aggregates (count + exact-decimal
    value sum), which are merged with the existing rollup rows for ONLY the
    days the batch touched, and written back with dynamic partition
    overwrite — so per batch the table rewrite is O(days-in-batch), not
    O(table). Counts and decimal sums are additive, so merge = re-aggregate
    of (existing ∪ contribution); no full-table state is held in the
    streaming job at all.

    Delivery: EXACTLY-ONCE effect on top of foreachBatch's at-least-once
    execution, with plain parquet. Two idempotent steps per batch:

    1. the batch's contribution lands in a per-batch ledger partition
       (``<rollup>_contrib/day=D/batch_id=N`` via dynamic partition
       overwrite) — a replayed batch overwrites ITS OWN ledger cells with
       identical content (file-source replay is deterministic), never
       double-appends;
    2. the rollup rows for the touched days are REBUILT from the ledger
       (sum over all batches' contributions for those days) and swapped in
       with dynamic partition overwrite — a pure function of the ledger, so
       re-running it converges.

    A crash between the steps leaves the ledger committed and the rollup
    stale for those days; the retry redoes both and lands in the same
    state. The ledger accumulates one small file per (day, batch) — the
    same small-file growth any log-structured table has; compactable with
    ``sources.layout.compact`` without changing reads.
    """

    contrib_path = rollup_path.rstrip("/") + "_contrib"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        _guard_ledger_epoch(spark, contrib_path, rollup_path, batch_id)
        contrib_rows = (
            # DATE partition column: date-typed directory values round-trip
            # through hive partition inference; timestamps don't reliably.
            batch_df.groupBy(
                F.to_date(F.col("ts")).alias("day"), F.col("event_type")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("dec_value"),
            )
            # ONE aggregation job per batch: the result is tiny (days ×
            # event_types), so collect it and rebuild — referencing the lazy
            # frame from both the day-list and the merge write would run the
            # full batch aggregation twice.
            .collect()
        )
        if not contrib_rows:
            return
        days = sorted({r["day"] for r in contrib_rows})
        contrib = spark.createDataFrame(
            contrib_rows,
            "day DATE, event_type STRING, n BIGINT, dec_value DECIMAL(28,2)",
        )
        with _dynamic_overwrite(spark):
            # step 1: idempotent ledger commit — only this batch's
            # (day, batch_id) cells are replaced
            contrib.withColumn("batch_id", F.lit(int(batch_id))).write.partitionBy(
                "day", "batch_id"
            ).mode("overwrite").parquet(contrib_path)
            # step 2: rebuild the touched days from the ledger alone (never
            # existing-rollup + delta: that merge double-counts on replay).
            # The day filter prunes to the touched day directories.
            merged = (
                spark.read.parquet(contrib_path)
                .where(F.col("day").isin(days))
                .groupBy("day", "event_type")
                .agg(F.sum("n").alias("n"), F.sum("dec_value").alias("dec_value"))
            )
            merged.write.partitionBy("day").mode("overwrite").parquet(rollup_path)

    run_foreach_batch(stream, upsert, mode="append")


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The maintained rollup, surfaced with the engine's money discipline
    (exact decimal store, double at the edge)."""
    r = spark.read.parquet(rollup_path)
    return r.select(
        F.col("day").cast("timestamp").alias("day"),
        "event_type",
        "n",
        F.col("dec_value").cast("double").alias("sum_value"),
    )


def run_incremental_distinct_rollup(
    spark: SparkSession, stream: DataFrame, rollup_path: str
) -> None:
    """Incremental day×event_type DISTINCT-USER rollup — the query additive
    counters cannot maintain (distinct does not add across batches; a
    re-seen user must not count twice). The per-batch state is a mergeable
    HLL SKETCH instead of a number, same ledger design as
    :func:`run_incremental_daily_rollup`:

    1. the batch's (day, event_type) sketches land in a
       ``(day, batch_id)``-keyed ledger partition (idempotent overwrite —
       sketches are deterministic functions of the batch rows);
    2. the touched days' rollup rows are rebuilt by UNION-MERGING all
       ledger sketches for those days (register-max merge: associative,
       commutative, idempotent — merging a replayed batch's identical
       sketch twice changes nothing, which makes the read-side rebuild
       doubly safe).

    Per batch the work is O(days-in-batch × event_types) sketches of
    constant size (lgConfigK=12 ⇒ ~2.5 KB), not O(users); the rollup
    column is the estimate, within ~1.6% stderr at any cardinality."""

    contrib_path = rollup_path.rstrip("/") + "_contrib"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        _guard_ledger_epoch(spark, contrib_path, rollup_path, batch_id)
        contrib = (
            batch_df.groupBy(
                F.to_date(F.col("ts")).alias("day"), F.col("event_type")
            )
            .agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
            # tiny (days × event_types rows of ~2.5 KB sketches):
            # materialize once, reuse for the day-list AND the ledger write
            .localCheckpoint()
        )
        days = [r["day"] for r in contrib.select("day").distinct().collect()]
        if not days:
            return
        # contrib derives from batch_df → the per-batch session CLONE; the
        # merged rebuild derives from spark.read → the outer session. BOTH
        # need dynamic overwrite (see _dynamic_overwrite; the count rollup
        # sidesteps the clone by rebuilding contrib via createDataFrame on
        # the outer session).
        with _dynamic_overwrite(spark, contrib.sparkSession):
            contrib.withColumn("batch_id", F.lit(int(batch_id))).write.partitionBy(
                "day", "batch_id"
            ).mode("overwrite").parquet(contrib_path)
            merged = (
                spark.read.parquet(contrib_path)
                .where(F.col("day").isin(days))
                .groupBy("day", "event_type")
                .agg(
                    F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
                )
            )
            merged.write.partitionBy("day").mode("overwrite").parquet(rollup_path)

    run_foreach_batch(stream, upsert, mode="append")


def read_distinct_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    return spark.read.parquet(rollup_path).select(
        F.col("day").cast("timestamp").alias("day"), "event_type", "est_users"
    )


def run_incremental_cms_rollup(
    spark: SparkSession,
    stream: DataFrame,
    rollup_path: str,
    depth: int = 5,
    width: int = 256,
) -> None:
    """Incremental per-day COUNT-MIN SKETCH rollup of user event
    frequencies — the heavy-hitter twin of the HLL distinct rollup: the
    per-batch state is a day-keyed counter sketch (operators/sketch.py),
    and because CM counters are ADDITIVE, the ledger merge is a plain sum
    — the merged sketch is byte-identical to one built over the raw union
    (unlike HLL's estimate-lossless-but-approximate register-max, CM merge
    is exact by construction; asserted in tests).

    Same exactly-once ledger design as the other two rollups: the batch's
    (day, d, bucket, cnt) rows land in a ``(day, batch_id)``-keyed ledger
    partition via dynamic partition overwrite (a replayed batch overwrites
    its own cells with identical deterministic content), then the touched
    days' rollup sketches are rebuilt as the ledger sum. Per batch the
    state is O(days × depth × width) counters regardless of event volume
    or user skew — a hot user folds into one counter per (day, d)."""
    contrib_path = rollup_path.rstrip("/") + "_contrib"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        _guard_ledger_epoch(spark, contrib_path, rollup_path, batch_id)
        from distributed_graph_database_system_spark.operators.sketch import (
            cm_sketch,
        )

        # THE canonical bucket pipeline (operators/sketch.py) with a per-day
        # group — the persisted ledger must stay byte-compatible with
        # cm_estimate probes, so the hashing scheme is defined exactly once.
        contrib = cm_sketch(
            batch_df.select(F.to_date(F.col("ts")).alias("day"), "user_id"),
            "user_id",
            depth=depth,
            width=width,
            group_cols=("day",),
        ).localCheckpoint()
        days = [r["day"] for r in contrib.select("day").distinct().collect()]
        if not days:
            return
        # same cloned-session gotcha as run_incremental_distinct_rollup:
        # dynamic overwrite must be set on BOTH the batch clone (ledger
        # write) and the outer session (rollup rebuild).
        with _dynamic_overwrite(spark, contrib.sparkSession):
            contrib.withColumn(
                "batch_id", F.lit(int(batch_id))
            ).write.partitionBy("day", "batch_id").mode("overwrite").parquet(
                contrib_path
            )
            ledger = spark.read.option("mergeSchema", "true").parquet(
                contrib_path
            )
            if "w" not in ledger.columns:
                ledger = ledger.withColumn("w", F.lit(None).cast("int"))
            else:
                # stamping legacy NULL-w rows with THIS call's width is only
                # sound if the stamped rows agree with it — a legacy ledger
                # built at width 128 replayed with width=256 would otherwise
                # silently sum incompatible counters cell-for-cell
                ext = ledger.agg(
                    F.min("w").alias("lo"), F.max("w").alias("hi")
                ).first()
                for v in (ext["lo"], ext["hi"]):
                    if v is not None and v != width:
                        raise ValueError(
                            f"cms rollup: ledger stamped w={v} but this "
                            f"rollup runs width={width} — widths must match"
                        )
            merged = (
                ledger.where(F.col("day").isin(days))
                # "w" rides along as a group key (constant per ledger) so the
                # rebuilt rollup stays self-describing for cm_estimate.
                # Pre-stamp contrib files (written before the w stamp
                # existed) surface NULL w; the ledger's width is fixed by
                # this function's own parameter, so coalescing folds the
                # legacy rows into the stamped cell instead of splitting
                # one (day, d, bucket) counter across w=NULL/w=width rows
                # (a split cm_estimate would reject — or, unguarded,
                # silently undercount).
                .withColumn("w", F.coalesce(F.col("w"), F.lit(width).cast("int")))
                .groupBy("day", "d", "bucket", "w")
                .agg(F.sum("cnt").alias("cnt"))
            )
            merged.write.partitionBy("day").mode("overwrite").parquet(
                rollup_path
            )

    run_foreach_batch(stream, upsert, mode="append")


def run_incremental_kmv_rollup(
    spark: SparkSession,
    stream: DataFrame,
    rollup_path: str,
    k: int = 256,
) -> None:
    """Incremental per-day KMV (bottom-k distinct-hash) rollup — the
    SET-ALGEBRA twin of the HLL distinct rollup: HLL registers answer
    "how many distinct users per (day, type)" but cannot intersect; the
    KMV sketch store answers overlap questions (day-over-day retention of
    a type's audience, cross-type intersection on any day) from ≤ k-row
    sketches via operators/sketch.py kmv_pair_overlap.

    Same exactly-once ledger design as the other three rollups: the
    batch's per-(day, event_type) bottom-k hash ARRAY lands in a
    ``(day, batch_id)``-keyed ledger cell (idempotent overwrite — the
    sketch is a deterministic function of the batch rows), and touched
    days rebuild by bottom-k-of-union over their cells. Bottom-k is a
    semilattice (associative, commutative, idempotent — asserted in
    tests/test_sketch.py), so replays and refolds are safe by
    construction. The sketch k rides along as the stamped ``kk`` column
    (the CMS ``w`` self-description pattern); fold via
    ``compact_contrib_ledger(path, {"hs": "kmv_union"})``.

    Per batch the state is O(days × event_types × k) hashes; the rollup
    stores BOTH the day sketch (for set algebra) and the point estimate
    ``est_users`` ((k-1)·2^60/h_k, exact below k)."""
    from distributed_graph_database_system_spark.operators.sketch import (
        KMV_SPACE,
        kmv_sketch,
        kmv_union_expr,
    )

    contrib_path = rollup_path.rstrip("/") + "_contrib"

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        _guard_ledger_epoch(spark, contrib_path, rollup_path, batch_id)
        contrib = (
            kmv_sketch(
                batch_df.select(
                    F.to_date(F.col("ts")).alias("day"), "event_type", "user_id"
                ),
                "user_id",
                k=k,
                group_cols=("day", "event_type"),
            )
            .groupBy("day", "event_type")
            .agg(F.sort_array(F.collect_list("h")).alias("hs"))
            .withColumn("kk", F.lit(int(k)).cast("int"))
            .localCheckpoint()
        )
        days = [r["day"] for r in contrib.select("day").distinct().collect()]
        if not days:
            return
        # validate the EXISTING ledger's k BEFORE writing this batch's
        # cells: a misconfigured upsert must refuse without side effects,
        # or its committed wrong-k cells would brick every later
        # correct-k upsert against the same ledger
        fs, contrib_p, _ = _ledger_fs(spark, contrib_path)
        if fs.exists(contrib_p):
            ks = spark.read.parquet(contrib_path).agg(
                F.min("kk"), F.max("kk")
            ).first()
            if ks[0] != ks[1] or ks[0] != k:
                raise ValueError(
                    f"kmv rollup: ledger stamped kk={ks[0]}..{ks[1]} but "
                    f"this rollup runs k={k} — k is fixed per ledger"
                )
        with _dynamic_overwrite(spark, contrib.sparkSession):
            contrib.withColumn("batch_id", F.lit(int(batch_id))).write.partitionBy(
                "day", "batch_id"
            ).mode("overwrite").parquet(contrib_path)
            merged = (
                spark.read.parquet(contrib_path)
                .where(F.col("day").isin(days))
                .groupBy("day", "event_type", "kk")
                .agg(kmv_union_expr("hs").alias("hs"))
                .withColumn(
                    "est_users",
                    F.when(
                        F.size("hs") < F.col("kk"),
                        F.size("hs").cast("double"),
                    ).otherwise(
                        (F.col("kk") - 1).cast("double")
                        * F.lit(float(KMV_SPACE))
                        / F.element_at("hs", F.col("kk")).cast("double")
                    ),
                )
                .select("day", "event_type", "hs", "kk", "est_users")
            )
            merged.write.partitionBy("day").mode("overwrite").parquet(
                rollup_path
            )

    run_foreach_batch(stream, upsert, mode="append")


def read_kmv_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The per-day sketch table ``(day, event_type, hs, kk, est_users)``;
    ``hs`` rows explode back to (group, h) form for
    operators/sketch.py kmv_pair_overlap / kmv_merge set algebra."""
    return spark.read.parquet(rollup_path).select(
        F.col("day").cast("timestamp").alias("day"),
        "event_type",
        "hs",
        "kk",
        "est_users",
    )


def compact_contrib_ledger(
    spark: SparkSession,
    contrib_path: str,
    value_aggs: dict[str, str],
) -> dict[str, int]:
    """Fold a rollup ``_contrib`` ledger: every cell EXCEPT the latest
    batch's merges into a per-day checkpoint cell (``batch_id = -1``),
    bounding both the ledger's partition count and the rebuild cost —
    without this, a ledger grows one ``(day, batch_id)`` partition per
    batch FOREVER and every rebuild sums an ever-longer list (the
    classic changelog-compaction problem; directory-level compact() in
    sources/layout.py cannot help because it preserves the hive chain,
    and the chain itself is the growth).

    ``value_aggs`` maps each value column to its merge function —
    ``"sum"`` (additive counters: counts, CM cells, decimal sums),
    ``"max"`` (register-max merges), ``"hll_union"`` (HLL sketch
    binaries), ``"kmv_union"`` (bottom-k hash arrays; requires the
    stamped ``kk`` column, which is a group key, as the truncation
    bound). Every other non-``batch_id`` column is a group key. All
    four merge functions are associative+commutative (bottom-k is also
    idempotent), so the folded ledger rebuilds BIT-identical rollups.

    Replay safety: checkpointed foreachBatch redelivers at most the
    LATEST (uncommitted) batch after a crash; committed earlier batches
    never replay. Only batches ``< max(batch_id)`` fold, so a replayed
    latest batch still overwrites its own live ``(day, max)`` cells and
    converges; the checkpoint id -1 sits below every real epoch id, so
    refolding is idempotent (an old checkpoint folds into the new one).
    Do NOT fold a ledger whose stream is mid-batch — run it from
    maintenance, not inside upsert.

    Batch-id epochs: folding assumes ids are monotone from ONE checkpoint
    lineage. The fold records ``max(batch_id)`` as a high-water mark
    (``_fold_hwm`` inside the ledger dir); a stream restarted with a fresh
    checkpoint dir (ids restart at 0) is rejected both here (refuses to
    fold an epoch whose max id sits below the mark) and at upsert time
    (``_guard_ledger_epoch``), instead of silently folding live batches
    as committed.

    Swap order is compact()'s crash-safe one: stage to a tmp sibling,
    originals aside to a recoverable ``__fold_bak``, staged dir in, only
    then drop the backup. A mid-swap crash leaves the ledger absent →
    the rerun fails loudly at spark.read with the backup intact.

    Returns ``{"folded_cells", "partitions_before", "partitions_after"}``.
    """
    from distributed_graph_database_system_spark.operators.sketch import (
        kmv_union_expr as _kmv_union_expr,
    )

    _AGGS = {
        "sum": F.sum,
        "max": F.max,
        "hll_union": F.hll_union_agg,
        # kk is a grouping column (constant per ledger), so referencing it
        # inside the aggregate expression is legal and truncates the folded
        # union back to the sketch bound; the expression is THE shared
        # definition (operators/sketch.py) the rollup rebuild also uses
        "kmv_union": _kmv_union_expr,
    }
    unknown = {a for a in value_aggs.values() if a not in _AGGS}
    if unknown:
        raise ValueError(f"compact_contrib_ledger: unknown agg(s) {unknown}")
    led = spark.read.option("mergeSchema", "true").parquet(contrib_path)
    if "batch_id" not in led.columns:
        raise ValueError(
            f"compact_contrib_ledger: {contrib_path} has no batch_id — "
            "not a contrib ledger"
        )
    parts_before = led.select("day", "batch_id").distinct().count()
    max_bid = led.agg(F.max("batch_id")).first()[0]
    prev_hwm = read_fold_hwm(spark, contrib_path)
    if prev_hwm is not None and max_bid < prev_hwm:
        raise ValueError(
            f"compact_contrib_ledger: live max batch_id {max_bid} is below "
            f"the recorded fold high-water mark {prev_hwm} — the stream "
            "restarted with a fresh checkpoint dir, so these ids belong to "
            "a NEW epoch and folding them would commit live batches; "
            "refusing (see _guard_ledger_epoch)"
        )
    group_cols = [
        c for c in led.columns if c != "batch_id" and c not in value_aggs
    ]
    folded = (
        led.where(F.col("batch_id") < max_bid)
        .groupBy(*group_cols)
        .agg(*[_AGGS[a](c).alias(c) for c, a in value_aggs.items()])
        .withColumn("batch_id", F.lit(-1))
        .select(*led.columns)
    )
    new_ledger = folded.unionByName(
        led.where(F.col("batch_id") == max_bid).select(*led.columns)
    )

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(contrib_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = contrib_path.rstrip("/") + "__fold_tmp"
    bak = contrib_path.rstrip("/") + "__fold_bak"
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    bak_p = jvm.org.apache.hadoop.fs.Path(bak)
    fs.delete(tmp_p, True)
    new_ledger.write.partitionBy("day", "batch_id").mode("overwrite").parquet(
        tmp
    )
    fs.delete(bak_p, True)
    if not fs.rename(hpath, bak_p):
        raise IOError(f"ledger fold: backup rename {contrib_path} failed")
    if not fs.rename(tmp_p, hpath):
        fs.rename(bak_p, hpath)  # roll back; ledger restored
        raise IOError(f"ledger fold: swap-in failed for {contrib_path}")
    fs.delete(bak_p, True)
    # record the fold epoch INSIDE the new dir: every id < max_bid is now
    # committed-and-folded; _guard_ledger_epoch rejects upserts below it
    # (fresh-checkpoint id restarts). A crash before this write loses only
    # the guard, never data — the next fold re-stamps it.
    _write_fold_hwm(spark, contrib_path, int(max_bid))
    after = spark.read.parquet(contrib_path)
    parts_after = after.select("day", "batch_id").distinct().count()
    return {
        "folded_cells": int(parts_before - parts_after),
        "partitions_before": int(parts_before),
        "partitions_after": int(parts_after),
    }


def read_cms_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The per-day sketch table ``(day, d, bucket, cnt, w)``; feed one
    day's rows to operators.sketch.cm_estimate for heavy-hitter queries —
    the stamped ``w`` lets the probe derive the build width.

    Purely pre-stamp rollups (no ``w`` in any file) are tolerated: they
    come back WITHOUT the ``w`` column and cm_estimate then requires its
    explicit ``width=`` argument (the legacy contract). Mixed rollups
    (some days rebuilt post-stamp) surface NULL ``w`` for the legacy days
    via mergeSchema — cm_estimate rejects those with a migration message;
    replaying any batch for that day through run_incremental_cms_rollup
    re-stamps it."""
    df = spark.read.option("mergeSchema", "true").parquet(rollup_path)
    cols = [F.col("day").cast("timestamp").alias("day"), "d", "bucket", "cnt"]
    if "w" in df.columns:
        cols.append("w")
    return df.select(*cols)


def stateful_user_counts(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: a running
    per-user event counter emitted on every update — the
    (flat)MapGroupsWithState equivalent in PySpark."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = "user_id BIGINT, n_events BIGINT"
    state_schema = "n BIGINT"

    def update_fn(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return stream.groupBy("user_id").applyInPandasWithState(
        update_fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_counts_tws(stream: DataFrame) -> DataFrame:
    """The SAME running per-user counter on Spark 4's transformWithState
    API (StatefulProcessor + typed state variables) — the successor to
    applyInPandasWithState above: named state ("n" ValueState) instead
    of a single tuple, explicit init/close lifecycle, and timers/TTL
    available when needed. Requires the RocksDB state store provider
    (the caller sets spark.sql.streaming.stateStore.providerClass) AND
    the protobuf Python package (the state API client speaks protobuf to
    the JVM state server — absent in this container, so the convergence
    test in tests/test_streaming.py importorskips; the operator is
    cluster-ready as written). Emitted rows converge to the same batch
    ground truth as the applyInPandasWithState twin."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    output_schema = "user_id BIGINT, n_events BIGINT"

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CountProcessor(),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="None",
    )
