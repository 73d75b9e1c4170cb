"""Sequence packing (concat-and-chunk) for LLM training pipelines.

Documents are laid end-to-end in a deterministic total order and the
token stream is cut into fixed-budget packs; a document that straddles
a boundary is split. This is the standard pretraining packing scheme,
and it reduces to one distributed primitive: an exclusive prefix sum
over a total order.

Scale design: a naive ``Window.orderBy(key)`` with no partitionBy puts
the whole table in ONE partition — the classic scale killer. Instead
``global_cumsum`` does the textbook two-phase scan:

  1. ``repartitionByRange(key)`` + ``sortWithinPartitions`` — one
     range-shuffle (the unavoidable cost of a global order);
  2. per-partition exclusive cumsum with ``Window.partitionBy(pid)``
     (parallel, no second shuffle);
  3. per-partition totals -> driver (ONE row per partition, bounded by
     the partition count, never by data size) -> broadcast offsets join.

The result is invariant to how the range partitioner happens to split
the key space, because only the global order and the sums matter.

Reference analogue: fastPASTA's payload-chunking splits a byte stream
into fixed CDP chunks while tracking running offsets
(alice_protocol_reader/src/lib.rs:134-236); here the stream is tokens
and the chunks are training packs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastpasta_spark.functions.cache import tracked_persist
from fastpasta_spark.functions.hashing import spark_tokens


def global_cumsum(df: DataFrame, order_col: str, value_col: str,
                  out_col: str = "cum_before",
                  num_partitions: int | None = None) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over the total order given
    by ``order_col`` (which must be a unique key — ties would make the
    exclusive sum ill-defined). Adds ``out_col`` (BIGINT).

    Driver traffic is one row per shuffle partition (the per-partition
    totals), independent of table size.
    """
    spark = df.sparkSession
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # persist: _pid is read twice (totals + join side). Releasing this
    # cache (functions/cache.release_tracked) before the result is
    # consumed is still CORRECT, not just slower: the returned frame
    # references the same JVM Dataset, whose cached query execution
    # reuses the SAME RangePartitioner instance on recompute — and the
    # partitioner's sample seed derives deterministically from the rdd
    # id, so even a rebuilt plan draws identical bounds. The _pid
    # boundaries the driver-collected totals came from cannot drift.
    r = tracked_persist(
        df.repartitionByRange(n, F.col(order_col))
          .sortWithinPartitions(order_col)
          .withColumn("_pid", F.spark_partition_id()))
    totals = (r.groupBy("_pid")
               .agg(F.sum(F.col(value_col).cast("long")).alias("_t"))
               .collect())
    off, offsets = 0, []
    for row in sorted(totals, key=lambda x: x._pid):
        offsets.append((row._pid, off))
        off += row._t or 0
    odf = spark.createDataFrame(offsets, "_pid int, _offset long")
    w = (Window.partitionBy("_pid").orderBy(order_col)
                .rowsBetween(Window.unboundedPreceding, -1))
    within = F.coalesce(F.sum(F.col(value_col).cast("long")).over(w),
                        F.lit(0).cast("long"))
    out = (r.join(F.broadcast(odf), "_pid")
            .withColumn(out_col, (F.col("_offset") + within))
            .drop("_pid", "_offset"))
    return out


def pack_sequences(docs: DataFrame, budget: int,
                   order_col: str = "doc_id",
                   tokens_col: str = "n_tokens",
                   num_partitions: int | None = None) -> DataFrame:
    """Concat-and-chunk packing: assign every token of every document
    to exactly one fixed-size pack. Input needs (order_col, tokens_col);
    zero-token documents are dropped (they occupy no stream positions).

    Output, one row per (document x pack it overlaps):
      doc_id, pack_id, tok_start, tok_end  (doc-local, end-exclusive),
      n_tokens. Invariants (property-tested): slices of one doc tile
      [0, n_tokens); every pack except the last sums to exactly
      ``budget``.
    """
    if budget <= 0:
        raise ValueError(f"pack budget must be positive, got {budget}")
    d = docs.filter(F.col(tokens_col) > 0)
    c = global_cumsum(d, order_col, tokens_col, "_start",
                      num_partitions=num_partitions)
    b = F.lit(int(budget)).cast("long")
    first = F.floor(F.col("_start") / b)
    last = F.floor((F.col("_start") + F.col(tokens_col) - 1) / b)
    e = c.select(
        F.col(order_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.col("_start"),
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    return e.select(
        order_col,
        "pack_id",
        F.greatest(F.lit(0).cast("long"),
                   F.col("pack_id") * b - F.col("_start")).alias("tok_start"),
        F.least(F.col("n_tokens"),
                (F.col("pack_id") + 1) * b - F.col("_start")).alias("tok_end"),
        "n_tokens",
    )


def pack_documents_table(docs: DataFrame, budget: int = 256,
                         text_col: str = "text") -> DataFrame:
    """Packing over a raw (doc_id, text) table: token counts via the
    shared tokenizer expression, then pack_sequences."""
    with_n = docs.select(
        "doc_id",
        F.expr(f"size({spark_tokens(text_col)})").cast("long").alias("n_tokens"),
    )
    return pack_sequences(with_n, budget)


def assign_shards(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                  seed: int = 0) -> DataFrame:
    """Append a deterministic ``shard`` column: the portable seeded md5
    gate of the id, mod ``n_shards`` — the output-side counterpart of
    lineage's hash-bucket resume units. Shard membership is a pure
    function of (id, seed, n_shards): independent of cluster size,
    partitioning, or row order, so a re-run lands every document in
    the SAME shard (dataloader-stable) and any engine can recompute
    the assignment. Rows with a NULL id get shard NULL (no identity).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from fastpasta_spark.functions.hashing import spark_md5_hash

    h = spark_md5_hash(f"cast({id_col} as string)", seed=seed)
    return df.withColumn(
        "shard", F.expr(f"pmod({h}, {n_shards})").cast("int"))


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          id_col: str = "doc_id", seed: int = 0) -> None:
    """Land the table as ``path/shard=K/`` parquet with DETERMINISTIC
    content: shard by :func:`assign_shards`, one output file per shard
    (repartition on the shard column), rows sorted by id within each
    file. Re-running on any cluster reproduces byte-stable shard
    membership and row order — what a resumable dataloader needs.

    Scale: one hash shuffle into ``n_shards`` partitions + a
    per-partition sort; size n_shards so a shard fits an output split
    (10^12 docs / 10^5 shards = 10^7 docs/shard). NULL-id rows are
    dropped (no deterministic shard identity).
    """
    out = assign_shards(df, n_shards, id_col, seed).filter(
        F.col(id_col).isNotNull())
    (out.repartition(n_shards, F.col("shard"))
     .sortWithinPartitions("shard", id_col)
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def shard_manifest(df: DataFrame, n_shards: int, id_col: str = "doc_id",
                   text_col: str = "text", seed: int = 0) -> DataFrame:
    """Per-shard accounting (shard, docs, tokens) for the assignment
    :func:`assign_shards` would produce — the manifest a training job
    reads to plan epochs. One map-side-combined groupBy of <= n_shards
    keys; NULL-id rows are excluded like the writer drops them."""
    return (
        assign_shards(df, n_shards, id_col, seed)
        .filter(F.col(id_col).isNotNull())
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("docs"),
             F.sum(F.expr(f"coalesce(size({spark_tokens(text_col)}), 0)"))
             .cast("long").alias("tokens"))
    )
