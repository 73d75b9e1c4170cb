"""Incremental (streaming) exact dedup — first-seen-wins across batches.

A continuously-ingesting pipeline cannot re-run global dedup per batch;
it needs each arriving micro-batch deduplicated against EVERYTHING seen
so far. Pattern: ``foreachBatch`` + an accumulating content-hash state
table —

  1. within-batch keeper: min doc_id per content hash (deterministic)
  2. cross-batch: broadcast-free left_anti join of the batch's hashes
     against the state table (at scale: an Iceberg table bucketed by
     hash, so the anti-join co-locates; here plain parquet)
  3. append kept docs + their hashes, both partitioned by epoch_id with
     DYNAMIC overwrite — so a crashed epoch re-runs idempotently

Exactly-once detail: a re-run of epoch N must not anti-join against
hashes its own failed attempt already wrote, or every doc of the batch
would vanish — the state read EXCLUDES rows of the current epoch.

The batch twin is operators/dedup.exact_duplicates; the FIRST-seen
keeper rule matches duplicate_clusters' min-id keeper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

STREAM_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
])


def _dedup_batch(batch_df: DataFrame, state: DataFrame | None) -> DataFrame:
    """Keep first-seen contents: within-batch min-doc_id keeper, then
    drop hashes already in `state` (hashes seen by EARLIER epochs)."""
    # sentinel for NULL text: md5(NULL) is NULL, and NULL join keys
    # match nothing — every null-text row (keeper included) would be
    # silently dropped. With the sentinel, null-content docs dedup among
    # themselves and the first one survives like any other content.
    hashed = batch_df.withColumn(
        "content_hash",
        F.md5(F.coalesce(F.col("text"), F.lit("\x00null-text"))))
    keeper = (
        hashed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    kept = hashed.join(keeper, ["content_hash", "doc_id"])
    if state is not None:
        kept = kept.join(state.select("content_hash"), "content_hash",
                         "left_anti")
    return kept


def _claim_identity(sp: SparkSession, marker: str, checkpoint_dir: str) -> str:
    """Return the checkpoint_dir that OWNS the marker file, claiming it
    atomically for ``checkpoint_dir`` if unowned. Uses the Hadoop
    FileSystem API so the create-if-absent is atomic on HDFS/object
    stores (local fs narrows the race to the create call itself)."""
    jvm = sp._jvm
    path = jvm.org.apache.hadoop.fs.Path(marker)
    fs = path.getFileSystem(sp._jsc.hadoopConfiguration())

    def read_owner() -> str:
        stream = fs.open(path)
        try:
            reader = jvm.java.io.BufferedReader(
                jvm.java.io.InputStreamReader(stream, "UTF-8"))
            return reader.readLine() or ""
        finally:
            stream.close()

    if fs.exists(path):
        return read_owner()
    try:
        out = fs.create(path, False)  # overwrite=False: create-if-absent
        try:
            out.write(bytearray(checkpoint_dir.encode("utf-8")))
        finally:
            out.close()
        return checkpoint_dir
    except Exception as create_exc:
        # lost the creation race — defer to whoever won. A NON-race
        # failure (permissions, transient FS error) leaves no marker to
        # read; re-raise the ORIGINAL create error then, not a confusing
        # FileNotFound from the fallback read.
        try:
            return read_owner()
        except Exception as read_exc:
            raise create_exc from read_exc


def incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """readStream(parquet docs) -> first-seen dedup per micro-batch ->
    out_dir/docs (kept rows) + out_dir/state (hash ledger)."""
    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        sp = batch_df.sparkSession
        # stream-identity gate, checked EVERY epoch (not just epoch 0):
        # a checkpoint resumed against the WRONG out_dir at epoch N>0
        # would silently anti-join the batch against a foreign hash
        # ledger and dynamically overwrite that ledger's partitions. The
        # marker FILE binds out_dir to the checkpoint that owns it on
        # first write; any epoch from a different checkpoint aborts.
        # Claimed via Hadoop FileSystem.create(overwrite=False) — atomic
        # on HDFS/object stores (and a microsecond window on local fs),
        # so two brand-new streams racing the same out_dir cannot BOTH
        # claim it: the create loser reads the winner's id and aborts
        # before touching the ledger.
        owner = _claim_identity(sp, f"{out_dir}/_identity", checkpoint_dir)
        if owner != checkpoint_dir:
            raise RuntimeError(
                f"{out_dir} is owned by stream checkpoint {owner!r} but "
                f"this stream runs from {checkpoint_dir!r} — refusing to "
                "mix hash ledgers; reuse the owning checkpoint_dir or "
                "point at a fresh out_dir")
        try:
            state_all = sp.read.parquet(f"{out_dir}/state")
        except AnalysisException:
            # ONLY a missing state dir (first epoch ever) may fall
            # through — any other read failure must abort the epoch, or
            # duplicates of previously-seen content would leak into the
            # output AND poison the ledger
            state_all = None
        if state_all is not None and epoch_id == 0 and not (
                state_all.filter(F.col("epoch_id") > 0).limit(1).isEmpty()):
            # state rows from epoch 0 ITSELF are fine at epoch 0: that is
            # the legitimate at-least-once replay (crash between the sink
            # write and the checkpoint commit), which the dynamic
            # partition overwrite below makes idempotent. Only LATER
            # epochs in state prove a mismatched/fresh checkpoint_dir.
            raise RuntimeError(
                f"{out_dir}/state already has later epochs but this "
                "stream is at epoch 0 — a fresh checkpoint_dir against an "
                "existing out_dir would re-keep seen documents and "
                "overwrite old epoch partitions; reuse the original "
                "checkpoint_dir or point at a fresh out_dir")
        state = (state_all.filter(F.col("epoch_id") < epoch_id)
                 if state_all is not None else None)
        kept = _dedup_batch(batch_df, state).persist()

        prev = sp.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sp.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (kept.withColumn("epoch_id", F.lit(epoch_id))
             .write.mode("overwrite").partitionBy("epoch_id")
             .parquet(f"{out_dir}/docs"))
            (kept.select("content_hash").distinct()
             .withColumn("epoch_id", F.lit(epoch_id))
             .write.mode("overwrite").partitionBy("epoch_id")
             .parquet(f"{out_dir}/state"))
        finally:
            sp.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        kept.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
