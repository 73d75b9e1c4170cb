"""Incremental streaming dedup: first-seen-wins across micro-batches,
idempotent epoch re-runs, batch-twin equivalence."""

import glob
import os
import shutil

from pyspark.sql import functions as F

from fastpasta_spark.streaming.dedup_stream import _dedup_batch, incremental_dedup


def _add_file(df, tmp_path, in_dir, name):
    """Land one flat parquet FILE in in_dir (the file stream source does
    not recurse into nested write directories)."""
    stage = str(tmp_path / f"stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    os.makedirs(in_dir, exist_ok=True)
    shutil.move(glob.glob(f"{stage}/part-*.parquet")[0],
                f"{in_dir}/{name}.parquet")


def _run(spark, tmp_path, tag):
    out = str(tmp_path / f"out_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    q = incremental_dedup(spark, str(tmp_path / "in"), out, ckpt,
                          max_files_per_trigger=1)
    q.awaitTermination(120)
    return out


def test_first_seen_wins_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    b1 = spark.createDataFrame(
        [(3, "alpha"), (1, "alpha"), (2, "beta")], "doc_id long, text string")
    b2 = spark.createDataFrame(
        [(4, "beta"), (5, "gamma"), (6, "gamma")], "doc_id long, text string")
    # one file per batch; maxFilesPerTrigger=1 -> 2 epochs in file order
    _add_file(b1, tmp_path, in_dir, "f1")
    _add_file(b2, tmp_path, in_dir, "f2")

    out = _run(spark, tmp_path, "a")
    kept = spark.read.parquet(f"{out}/docs")
    by_text = {r["text"]: r["doc_id"] for r in kept.collect()}
    # alpha keeper = min doc_id of its first batch; beta first seen in
    # its earliest epoch; gamma keeper = 5; doc 4 (beta again) dropped
    assert by_text["alpha"] == 1
    assert by_text["gamma"] == 5
    assert kept.count() == 3
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        {by_text["alpha"], by_text["beta"], by_text["gamma"]})


def test_restart_is_noop(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    _add_file(spark.createDataFrame([(1, "x"), (2, "x")],
                                    "doc_id long, text string"),
              tmp_path, in_dir, "f1")
    out = _run(spark, tmp_path, "b")
    n1 = spark.read.parquet(f"{out}/docs").count()
    # restart with the same checkpoint: no new files -> no new epochs,
    # outputs unchanged
    q = incremental_dedup(spark, in_dir, out, str(tmp_path / "ckpt_b"))
    q.awaitTermination(120)
    assert spark.read.parquet(f"{out}/docs").count() == n1 == 1


def test_dedup_batch_excludes_prior_state(spark):
    batch = spark.createDataFrame(
        [(9, "seen"), (10, "new")], "doc_id long, text string")
    state = spark.createDataFrame(
        [("seen",)], "text string").select(F.md5("text").alias("content_hash"))
    kept = _dedup_batch(batch, state)
    assert [r["text"] for r in kept.collect()] == ["new"]


def test_null_text_rows_survive(spark, tmp_path):
    from fastpasta_spark.streaming.dedup_stream import _dedup_batch

    batch = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string")
    kept = {r.doc_id for r in _dedup_batch(batch, None).collect()}
    # null-content docs dedup among themselves; the first survives
    assert kept == {1, 3}


def test_foreign_checkpoint_rejected_every_epoch(spark, tmp_path):
    # out_dir gets bound to its owning checkpoint on first write; a
    # DIFFERENT checkpoint driving the same out_dir must abort even
    # when its epoch numbering looks plausible (advice round-2: the old
    # guard only fired at epoch 0)
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    in_dir = str(tmp_path / "in")
    _add_file(spark.createDataFrame([(1, "x")], "doc_id long, text string"),
              tmp_path, in_dir, "f1")
    out = _run(spark, tmp_path, "c")  # owner checkpoint: ckpt_c
    # new file + FOREIGN checkpoint against the same out_dir
    _add_file(spark.createDataFrame([(2, "y")], "doc_id long, text string"),
              tmp_path, in_dir, "f2")
    q = incremental_dedup(spark, in_dir, out, str(tmp_path / "ckpt_other"))
    with pytest.raises(StreamingQueryException, match="owned by stream"):
        q.awaitTermination(120)


def test_claim_identity_first_writer_wins(spark, tmp_path):
    from fastpasta_spark.streaming.dedup_stream import _claim_identity

    m = str(tmp_path / "out" / "_identity")
    assert _claim_identity(spark, m, "/ck/a") == "/ck/a"   # claims
    assert _claim_identity(spark, m, "/ck/b") == "/ck/a"   # defers to owner
    assert _claim_identity(spark, m, "/ck/a") == "/ck/a"   # idempotent
