"""Lineage + resume: a run killed halfway resumes by anti-joining
completed buckets and produces byte-identical final outputs
(north_rule; FIXTURES.md resume_corpus)."""

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
