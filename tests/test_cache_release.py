"""Operator-internal persist() calls must be releasable.

Round-2 verdict "What's wrong" #3: jaccard_pairs / minhash_near_dup /
segment_dedup / simhash_duplicates / embedding_near_duplicates /
curate / global_cumsum each persisted an intermediate with no release
path, leaking one executor-storage cache entry per call for the
session's lifetime. They now register through
functions/cache.tracked_persist; this test runs EVERY persisting
operator in one session, materializes its output, and asserts
release_tracked() returns the JVM's persistent-RDD map to its
baseline.
"""

from pyspark.sql import functions as F

from fastpasta_spark.functions.cache import release_tracked, tracked_count


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _docs(spark):
    rows = [(f"d{i}",
             f"alpha bravo charlie delta echo foxtrot golf tok{i} "
             f"hotel india juliet kilo lima mike november word{i % 3}")
            for i in range(30)]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_every_persisting_operator_releases(spark):
    from fastpasta_spark.operators import dedup, packing, similarity
    from fastpasta_spark.plans.curate import curate

    release_tracked()  # clean slate (other modules may have tracked)
    base = _n_cached(spark)
    docs = _docs(spark)
    emb = spark.range(0, 40).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(1, 8), j -> cast(pmod(id * j, 7) - 3 "
               "as float))").alias("embedding"))
    counts = spark.range(0, 50).select(
        F.concat(F.lit("d"), "id").alias("doc_id"),
        (F.col("id") % 9 + 1).alias("n_tokens"))

    dedup.minhash_near_duplicates(docs, threshold=0.1).collect()
    dedup.jaccard_pairs(docs, threshold=0.1, max_df=10).collect()
    dedup.segment_dedup(docs, seg_tokens=5).collect()
    dedup.dup_spans(docs, n=3).collect()
    dedup.simhash_duplicates(docs, max_hamming=3).collect()
    similarity.embedding_near_duplicates(
        emb, threshold=0.9, dim=8, n_planes=2, n_tables=2).collect()
    packing.global_cumsum(counts, "doc_id", "n_tokens").collect()
    res = curate(docs, min_quality=0.0, token_budget=100)
    res.kept.collect()
    res.summary.collect()

    assert tracked_count() > 0          # the operators DID register
    assert _n_cached(spark) > base      # and the JVM really cached them
    release_tracked()
    assert tracked_count() == 0
    assert _n_cached(spark) == base     # every entry released


def test_bare_check_all_releases_via_registry(spark):
    """Round-3 verdict #3: a caller that ignores CheckResult.release()
    (e.g. __spark_entry__.entry) must still be able to free check_all's
    two internal persists through the session registry."""
    from fastpasta_spark.plans.check_all import check_all
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

    release_tracked()
    base = _n_cached(spark)
    cfg = CorpusConfig(n_docs=200, corrupt_per_mille=100)
    res = check_all(corpus_df(spark, cfg), media_df(spark, cfg))
    assert res.violations.count() > 0
    assert res.metrics.count() > 0
    assert _n_cached(spark) > base      # internal persists are live
    release_tracked()                   # no res.release() needed
    assert _n_cached(spark) == base

    # and the two release paths coexist: release() then release_tracked()
    res2 = check_all(corpus_df(spark, cfg), media_df(spark, cfg))
    res2.violations.count()
    res2.release()
    release_tracked()                   # double-release is a no-op
    assert _n_cached(spark) == base


def test_release_is_idempotent_and_safe(spark):
    release_tracked()
    release_tracked()
    assert tracked_count() == 0


def test_failfast_and_resumable_release(spark, tmp_path):
    from pyspark.sql import functions as F

    from fastpasta_spark.plans.check_all import run_failfast
    from fastpasta_spark.plans.lineage import run_resumable
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

    release_tracked()
    base = _n_cached(spark)
    cfg = CorpusConfig(n_docs=300, corrupt_per_mille=200)
    docs, media = corpus_df(spark, cfg), media_df(spark, cfg)

    viol, done, total = run_failfast(docs, media, max_errors=5, n_slices=4)
    assert viol.count() >= 5 and done < 4
    release_tracked()  # slice checkpoints freed after consumption
    assert _n_cached(spark) == base

    v, run_id = run_resumable(docs, media, str(tmp_path / "ckpt"))
    assert run_id is not None and v.count() > 0
    # run_resumable releases its own CheckResult; nothing to free
    assert _n_cached(spark) == base


def test_release_deregisters_from_registry(spark):
    """CheckResult.release() must also remove its registry closures —
    a slice loop calling release() per result previously grew _TRACKED
    by 2 dead entries per call for the session's lifetime."""
    from fastpasta_spark.plans.check_all import check_all
    from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

    release_tracked()
    base = _n_cached(spark)
    cfg = CorpusConfig(n_docs=150, corrupt_per_mille=100)
    for _ in range(3):
        res = check_all(corpus_df(spark, cfg), media_df(spark, cfg))
        res.violations.count()
        res.release()
    assert tracked_count() == 0          # no dead closures accumulate
    assert _n_cached(spark) == base
