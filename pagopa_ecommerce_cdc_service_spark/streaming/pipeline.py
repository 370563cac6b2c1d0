"""Structured Streaming pipeline: event-log stream → maintained view table.

Spark translation of the reference's stream lifecycle
(EcommerceTransactionsLogEventsStream.kt:44-177):

- S1 change-stream source  → ``readStream`` (file source here; Kafka at prod
  scale — swap ``format``/options, the rest is unchanged)
- S2-S4 resume/checkpoint  → ``checkpointLocation`` (offsets + state commits)
- F1-F3 intake filters     → the same :func:`prepare_events` expressions
- ST3 per-event lock/dedup → per-key seen-set in the state fold
- ST2/ST4 retries          → micro-batch replay from checkpoint +
  ``spark.task.maxFailures``
- S5 upsert sink           → ``foreachBatch`` keyed merge (Delta/Iceberg
  MERGE INTO in production; local parquet swap here)
- ST7 liveness             → :class:`listeners.LivenessListener`
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CdcConfig, DEFAULT_CONFIG
from ..operators.cdc_fold import prepare_events
from ..schemas import EVENT_ENVELOPE_TYPE
from .state_fold import incremental_view


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    fallback_minutes: int | None = None,
) -> DataFrame:
    """File-source S1 twin. ``fallback_minutes`` is the S3 fallback start
    offset for a FIRST run with no checkpoint: log files modified before the
    window are dropped via the ``_metadata.file_modification_time`` column
    (the file twin's arrival-time analog of the change stream's position),
    mirroring the reference's checkpoint-miss policy of starting
    ``fallbackInMin`` before now (RedisResumePolicyService.kt:43-52).

    CALLER CONTRACT: pass ``fallback_minutes`` only when no checkpoint
    exists (``start_view_maintenance`` enforces this) — the filter is a
    per-row predicate with a fresh ``now()``, so applying it on a restart
    would silently drop events that arrived while the query was down.
    Committed offsets must win once a checkpoint exists, same precedence as
    the reference's Redis token beating the fallback window. (The Kafka
    twin maps the policy onto ``startingTimestamp``, which Kafka itself
    ignores once the checkpoint has offsets, so it needs no such guard.)
    """
    reader = spark.readStream.format(fmt).schema(EVENT_ENVELOPE_TYPE)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(source_dir)
    if fallback_minutes is not None:
        import datetime as _dt

        cutoff = _dt.datetime.now(_dt.timezone.utc) - _dt.timedelta(
            minutes=fallback_minutes
        )
        # epoch comparison: tz-independent (a naive timestamp literal would
        # be re-interpreted in the session timezone, shifting the window)
        cutoff_us = int(cutoff.timestamp() * 1_000_000)
        raw = (
            raw.select("*", F.col("_metadata.file_modification_time").alias("_mod"))
            .filter(F.unix_micros(F.col("_mod")) >= F.lit(cutoff_us))
            .drop("_mod")
        )
    return raw


def _hadoop_fs(spark: SparkSession, path_str: str):
    """(FileSystem, Path) for ``path_str`` resolved through the Hadoop API —
    the ONLY correct way to probe paths here: ``os.path`` is always false
    for non-local URIs (hdfs://, s3a://...), silently taking the wrong
    branch on any real cluster."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def checkpoint_has_offsets(spark: SparkSession, checkpoint_dir: str) -> bool:
    """True iff the checkpoint already has committed source offsets.

    Resolved through the Hadoop FileSystem API so first-run detection works
    for ANY checkpoint URI (file:, hdfs://, s3a://...) — an ``os.path``
    probe is always false for non-local URIs, which would silently re-apply
    the fallback window on every restart and drop events that arrived while
    the query was down (the exact hazard the :func:`read_event_stream`
    contract forbids)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(checkpoint_dir, "offsets")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(path))


def stream_transactions_view(
    raw_stream: DataFrame,
    config: CdcConfig = DEFAULT_CONFIG,
    observe_metrics: bool = True,
) -> DataFrame:
    """Raw envelope stream → per-batch view-update stream (update mode).

    With ``observe_metrics`` (default) the intake and fold row counters ride
    on the query as observed metrics (ST8) — attach a
    :class:`listeners.FoldMetricsListener` to consume them per micro-batch.
    """
    if observe_metrics:
        from .listeners import observe_fold, observe_intake

        raw_stream = observe_intake(raw_stream)
        prepared = observe_fold(prepare_events(raw_stream, config))
    else:
        prepared = prepare_events(raw_stream, config)
    return incremental_view(
        prepared,
        seen_ids_cap=config.seen_ids_cap,
        view_state_ttl_seconds=config.view_state_ttl_seconds,
    )


VIEW_BUCKET_COL = "_bucket"


def view_bucket(key_col: str, n_buckets: int):
    """Stable key → bucket id (Murmur3 ``hash`` is seed-fixed across runs)."""
    return F.pmod(F.hash(key_col), F.lit(n_buckets))


def read_view(spark: SparkSession, view_dir: str) -> DataFrame:
    """Read the maintained view, hiding the internal bucket column.

    Deliberately does NOT run :func:`recover_view`: recovery mutates the
    directory (restores ``.saved-`` generations, drops staging), which is
    only safe under the sink's single-writer assumption — a reader racing a
    LIVE commit could otherwise restore a bucket the writer just saved and
    corrupt the commit. Recovery belongs to the writer, which runs it at
    the top of every merge; until the stream restarts after a crash, a
    reader may observe a touched bucket's pre-crash generation as absent
    (bounded staleness, never corruption)."""
    return spark.read.parquet(view_dir).drop(VIEW_BUCKET_COL)


def _bucket_dir(bucket: int) -> str:
    return f"{VIEW_BUCKET_COL}={bucket}"


def _saved_dir(bucket: int) -> str:
    # leading "." ⇒ invisible to Spark's file listing even though the name
    # contains "=" (shouldFilterOutPathName drops any dot-prefixed name)
    return f".saved-{VIEW_BUCKET_COL}={bucket}"


def recover_view(spark: SparkSession, view_dir: str) -> None:
    """Roll the view forward/back after a crash mid-commit (idempotent).

    The sink commits a bucket in three renames (save old → move staged in →
    drop saved); a kill can land between any two. Recovery restores the
    invariant "every bucket directory holds exactly one complete
    generation": a ``.saved-`` dir with NO live bucket dir means the crash
    hit between save and move-in — the old generation is renamed back
    (no rows lost; the replayed batch re-applies the updates); a ``.saved-``
    dir WITH a live bucket dir means the new generation committed — the
    saved copy is dropped. Stale ``_staging-`` dirs are always dropped
    (never referenced by a committed bucket)."""
    fs, root = _hadoop_fs(spark, view_dir)
    if not fs.exists(root):
        return
    jvm = spark._jvm
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.startswith("_staging-"):
            fs.delete(status.getPath(), True)
        elif name.startswith(f".saved-{VIEW_BUCKET_COL}="):
            live = jvm.org.apache.hadoop.fs.Path(root, name[len(".saved-"):])
            if fs.exists(live):
                fs.delete(status.getPath(), True)
            elif not fs.rename(status.getPath(), live):
                # a silent restore failure would leave the bucket's rows
                # invisible — surface it instead of proceeding to a merge
                # that would treat the bucket as empty
                raise IOError(f"recovery: could not restore {name} -> {live}")


def parquet_upsert_sink(view_dir: str, n_buckets: int = 64, failpoint=None):
    """foreachBatch merge: upsert batch view-updates into a keyed parquet
    table partitioned by ``hash(transactionId) % n_buckets``.

    Only the buckets actually touched by the batch are rewritten: the old
    rows are read with a partition-pruned filter on the bucket column, so
    untouched buckets' files are never listed, read, or replaced. Per-batch
    cost is O(touched buckets), not O(view size). Local stand-in for
    ``MERGE INTO`` on a Delta/Iceberg table (jars not in this image); at
    cluster scale the same layout maps onto the table's clustering and
    MERGE prunes identically.

    CRASH GUARANTEE: the merged generation of each touched bucket is staged
    to a hidden ``_staging-<epoch>`` dir first, then committed per bucket by
    rename: (1) current bucket dir → hidden ``.saved-`` dir, (2) staged
    dir → bucket dir, (3) drop ``.saved-``. Every step preserves a complete
    copy of the pre-batch generation until the new one is in place, so a
    kill at ANY point loses no rows: :func:`recover_view` (run at the top
    of every merge) rolls a half-committed bucket back to its saved
    generation, and the checkpoint replays the batch, whose re-merge is
    idempotent (delete-by-key ∪ upsert). Renames are atomic on file:/HDFS;
    on S3 they are copies — production uses transactional MERGE INTO there
    (reference guarantee: TransactionViewUpsertService.kt:160-189).

    ``failpoint(step, bucket)`` is a test-only seam called between commit
    steps to simulate a crash (raise to abort mid-commit).
    """

    def merge(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        recover_view(spark, view_dir)
        updates = batch_df.withColumn(
            VIEW_BUCKET_COL, view_bucket("transactionId", n_buckets)
        ).cache()
        staging = f"{view_dir}/_staging-{epoch_id}"
        try:
            fs, root = _hadoop_fs(spark, view_dir)
            # metadata-sized collect: at most n_buckets ints
            touched = sorted(
                r[0] for r in updates.select(VIEW_BUCKET_COL).distinct().collect()
            )
            if fs.exists(root) and fs.globStatus(
                spark._jvm.org.apache.hadoop.fs.Path(
                    root, f"{VIEW_BUCKET_COL}=*"
                )
            ):
                old = spark.read.parquet(view_dir).filter(
                    F.col(VIEW_BUCKET_COL).isin(touched)
                )
                merged = old.join(
                    updates.select("transactionId"), "transactionId", "left_anti"
                ).unionByName(updates)
            else:
                merged = updates
            merged.write.mode("overwrite").partitionBy(VIEW_BUCKET_COL).parquet(
                staging
            )
            _commit_staged_buckets(spark, fs, root, staging, touched, failpoint)
        finally:
            updates.unpersist()

    return merge


def _commit_staged_buckets(spark, fs, root, staging, buckets, failpoint=None):
    """Publish staged bucket generations by per-bucket save→move→drop
    renames (the crash-safe commit both the upsert sink and the compactor
    use). A complete copy of each pre-commit generation survives until its
    replacement is in place; :func:`recover_view` + replay handles any
    interruption."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path

    def rename_or_die(src, dst, what):
        # Hadoop rename reports failure by RETURN VALUE; swallowing it
        # would silently drop a bucket generation (e.g. under an unexpected
        # concurrent writer) — fail instead so the caller's replay runs
        if not fs.rename(src, dst):
            raise IOError(f"bucket commit: rename failed ({what}): {src} -> {dst}")

    for bucket in buckets:
        live = jvm_path(root, _bucket_dir(bucket))
        saved = jvm_path(root, _saved_dir(bucket))
        staged = jvm_path(jvm_path(staging), _bucket_dir(bucket))
        if not fs.exists(staged):
            continue  # defensive: no staged output for this bucket
        if fs.exists(live):
            rename_or_die(live, saved, "save old generation")
        if failpoint is not None:
            failpoint("saved", bucket)
        rename_or_die(staged, live, "publish new generation")
        if failpoint is not None:
            failpoint("moved", bucket)
        if fs.exists(saved):
            fs.delete(saved, True)
    fs.delete(jvm_path(staging), True)


def compact_view(
    spark: SparkSession,
    view_dir: str,
    max_files_per_bucket: int = 4,
    failpoint=None,
) -> list[int]:
    """Compact fragmented view buckets back to one file each (small-file
    maintenance — the operational cost of per-batch bucket rewrites at
    100 TB: a long-running stream leaves each hot bucket with one file per
    touching batch, and scan/open cost grows with file count, not data).

    WRITER-SCOPE operation (same single-writer assumption as the sink; run
    it from the maintenance window or the foreachBatch callback, not beside
    a live stream). Only buckets holding more than ``max_files_per_bucket``
    data files are rewritten — listed via one FileSystem pass, no Spark job
    for the untouched ones — and the rewrite publishes through the same
    staged-rename commit as the sink, so a crash mid-compact plus a re-run
    loses nothing (the data is unchanged by construction; compaction is
    idempotent). Returns the bucket ids compacted."""
    recover_view(spark, view_dir)
    fs, root = _hadoop_fs(spark, view_dir)
    if not fs.exists(root):
        return []
    touched = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith(f"{VIEW_BUCKET_COL}="):
            continue
        n_files = sum(
            1
            for f in fs.listStatus(status.getPath())
            if f.getPath().getName().endswith(".parquet")
        )
        if n_files > max_files_per_bucket:
            touched.append(int(name.split("=", 1)[1]))
    if not touched:
        return []
    touched.sort()
    staging = f"{view_dir}/_staging-compact"
    rows = spark.read.parquet(view_dir).filter(
        F.col(VIEW_BUCKET_COL).isin(touched)
    )
    # repartition BY the bucket column: each bucket lands in exactly one
    # task → exactly one output file per bucket directory
    (
        rows.repartition(len(touched), VIEW_BUCKET_COL)
        .write.mode("overwrite")
        .partitionBy(VIEW_BUCKET_COL)
        .parquet(staging)
    )
    _commit_staged_buckets(spark, fs, root, staging, touched, failpoint)
    return touched


def start_view_maintenance(
    spark: SparkSession,
    source_dir: str,
    view_dir: str,
    checkpoint_dir: str,
    config: CdcConfig = DEFAULT_CONFIG,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 64,
):
    """Wire source → fold → sink and start the query (ST1)."""
    # S3 precedence: the fallback window applies ONLY on checkpoint miss —
    # on a restart the committed offsets win and events that arrived while
    # the query was down must still be ingested (the reference's Redis token
    # beats the fallback window, RedisResumePolicyService.kt:43-52)
    first_run = not checkpoint_has_offsets(spark, checkpoint_dir)
    raw = read_event_stream(
        spark,
        source_dir,
        fmt,
        max_files_per_trigger,
        fallback_minutes=config.fallback_minutes if first_run else None,
    )
    updates = stream_transactions_view(raw, config)
    return (
        updates.writeStream.outputMode("update")
        .foreachBatch(parquet_upsert_sink(view_dir, n_buckets))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_kafka_event_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_timestamp_ms: int | None = None,
    fallback_minutes: int | None = None,
):
    """Kafka twin of :func:`read_event_stream` — the production S1 source.

    Maps the reference's resume policy onto Kafka options
    (EcommerceTransactionsLogEventsStream.kt:74-94, RedisResumePolicyService.kt:37-53):

    - S2 resume-at-timestamp → ``startingTimestamp`` (first run only; once a
      checkpoint exists Spark's committed offsets win, which is exactly the
      reference's Redis-token-beats-fallback behavior)
    - S3 fallback window     → ``startingTimestamp = now - fallback``
    - F1/F3/T1 intake        → the same parse + filter chain as the file
      source: envelope JSON in the Kafka ``value``, malformed records
      quarantined, never fatal

    Returns (parsed envelope stream, quarantine stream). Requires the
    spark-sql-kafka connector on the classpath (not in this image — the
    builder is exercised for option wiring only; semantics are covered by
    the file-source twin, which shares every stage after ``load()``).
    """
    import time

    from ..sources.envelope_json import parse_envelope_lines

    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("failOnDataLoss", "false")
    )
    if starting_timestamp_ms is not None:
        reader = reader.option("startingTimestamp", str(starting_timestamp_ms))
    elif fallback_minutes is not None:
        fallback_ms = int(time.time() * 1000) - fallback_minutes * 60_000
        reader = reader.option("startingTimestamp", str(fallback_ms))
    else:
        reader = reader.option("startingOffsets", "latest")
    raw = reader.load()
    lines = raw.selectExpr("CAST(value AS STRING) AS value")
    return parse_envelope_lines(lines)
