"""Lineage + resume: a run killed halfway resumes by anti-joining
completed buckets and produces byte-identical final outputs
(north_rule; FIXTURES.md resume_corpus)."""

import pytest
from pyspark.sql import functions as F

from fastpasta_spark.plans import lineage as L
from fastpasta_spark.plans.check_all import check_all
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

CFG = CorpusConfig(n_docs=300, corrupt_per_mille=200, dup_per_mille=20)


def _viol_rows(df):
    return sorted(
        (
            (r.doc_id, r.span_idx, r.offset, r.check_code, r.severity, r.message)
            for r in df.collect()
        ),
        key=lambda v: (v[0] or "", -2 if v[1] is None else v[1], v[2], v[3], v[5]),
    )


def test_resume_produces_identical_output(spark, tmp_path):
    docs = corpus_df(spark, CFG)
    media = media_df(spark, CFG)
    n_buckets = 16

    # ground truth: single uninterrupted run
    full = check_all(docs, media).violations
    # uniqueness (E100) is corpus-global; a bucketed run computes it per
    # bucket — identical here because doc_id duplicates hash to the same
    # bucket by construction (the resume unit is a doc_id hash bucket)
    expected = _viol_rows(full)

    ckpt = str(tmp_path / "ckpt")

    # simulate a killed run: validate only buckets 0..7, record lineage
    bucketed = L.with_bucket(docs, n_buckets)
    first_half = bucketed.filter(F.col(L.BUCKET_COL) < 8)
    res1 = check_all(first_half.drop(L.BUCKET_COL), media)
    viol1 = res1.violations.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )
    viol1.write.mode("append").partitionBy("bucket").parquet(ckpt + "/violations")
    L.record_lineage(res1.violations, first_half, ckpt, n_buckets)

    done = L.completed_buckets(spark, ckpt)
    assert done.count() == 8

    # resume: only the remaining buckets are processed
    remaining = L.remaining_docs(docs, ckpt, n_buckets)
    got_buckets = {r[L.BUCKET_COL] for r in remaining.select(L.BUCKET_COL).distinct().collect()}
    assert got_buckets == set(range(8, 16))

    out, run_id = L.run_resumable(docs, media, ckpt, n_buckets=n_buckets)
    assert run_id is not None
    got = _viol_rows(out.drop("bucket"))
    # drift/global rows have doc_id NULL and are not bucket-attributable;
    # both sides exclude them here (none are produced by this fixture)
    assert got == expected

    # a third run finds nothing to do and returns the stored union
    out2, run_id2 = L.run_resumable(docs, media, ckpt, n_buckets=n_buckets)
    assert run_id2 is None
    assert _viol_rows(out2.drop("bucket")) == expected


def test_lineage_check_counts_reconcile(spark, tmp_path):
    """Per-bucket check_counts (north_rule "lineage + metrics", mirroring
    the reference's per-error-type stat totals) reconcile exactly with
    the violation table: sum over buckets of each code's count equals
    the global per-code counts, the per-bucket `violations` counter
    equals the sum of its map values, and NULL-doc_id violations (E10)
    are counted in the bucket their doc hashes to."""
    cfg = CorpusConfig(n_docs=300, corrupt_per_mille=400, dup_per_mille=20)
    docs = corpus_df(spark, cfg)
    # the generator never emits a NULL doc_id — inject one so the E10 /
    # NULL-hash-bucket attribution is exercised
    docs = docs.unionByName(spark.createDataFrame(
        [(None, [("content", "x", None, 0)])], docs.schema))
    media = media_df(spark, cfg)
    n_buckets = 16
    ckpt = str(tmp_path / "ckpt")

    res = check_all(docs, media)
    bucketed = L.with_bucket(docs, n_buckets)
    L.record_lineage(res.violations, bucketed, ckpt, n_buckets)

    lin = spark.read.parquet(ckpt + "/lineage").collect()
    assert len(lin) == n_buckets  # every bucket got a row
    # per-row: counter == sum of its map values (empty map -> 0)
    for r in lin:
        assert r.violations == sum(r.check_counts.values())
    # global reconciliation per check code
    got: dict[str, int] = {}
    for r in lin:
        for code, n in r.check_counts.items():
            got[code] = got.get(code, 0) + n
    expected = {
        r.check_code: r.cnt
        for r in res.violations.groupBy("check_code")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected
    # the fixture's corrupt docs include NULL doc_ids -> E10 present and
    # attributed to the constant NULL-hash bucket alongside its docs
    assert "E10" in got
    res.release()


def test_read_lineage_missing_vs_corrupt(spark, tmp_path):
    """Missing checkpoint -> None (fresh run); corrupt table -> raise.
    Silently treating an unreadable lineage table as nothing-done would
    recompute the world on a 10^12-doc run."""
    assert L.read_lineage(spark, str(tmp_path / "never_written")) is None

    bad = tmp_path / "bad_ckpt" / "lineage"
    bad.mkdir(parents=True)
    (bad / "part-00000.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(Exception):
        df = L.read_lineage(spark, str(tmp_path / "bad_ckpt"))
        df.collect()  # schema inference may be lazy; force the read


def test_bucket_is_partition_layout_independent(spark):
    docs = corpus_df(spark, CFG)
    a = sorted(
        (r.doc_id, r[L.BUCKET_COL])
        for r in L.with_bucket(docs.repartition(3), 16).collect()
    )
    b = sorted(
        (r.doc_id, r[L.BUCKET_COL])
        for r in L.with_bucket(docs.repartition(11), 16).collect()
    )
    assert a == b
