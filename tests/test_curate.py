"""Curation plan tests: quality gate -> dedup keeper -> token budget."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastpasta_spark.plans.curate import curate

GOOD = ("the quick brown fox jumps over the lazy dog and it is "
        "a fine day for running checks in the data pipeline")
GOOD2 = ("the quick brown fox jumps over the lazy cat and it is "
         "a fine day for running checks in the data pipeline")
OTHER = ("completely different content that still reads like a decent "
         "document with the usual english words in it for scoring")
JUNK = "x" * 9000  # fails length band, alpha fine, no stopwords


def _docs(spark):
    rows = [
        (1, GOOD), (2, GOOD), (3, GOOD),   # exact x3 -> keeper 1
        (4, GOOD2),                        # near-dup of GOOD -> same cluster
        (5, OTHER), (6, OTHER),            # exact x2 -> keeper 5
        (7, JUNK),                         # gated out by quality
        (8, "!!!"),                        # low quality (no tokens, no alpha)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_funnel_counts_and_keepers(spark):
    res = curate(_docs(spark), min_quality=0.5, jaccard_threshold=0.5)
    kept = sorted(r["doc_id"] for r in res.kept.collect())
    assert kept == [1, 5]
    s = res.summary.first()
    assert s["n_input"] == 8
    assert s["n_gated"] == 6      # junk + short gated out
    assert s["n_unique"] == 2     # one keeper per cluster
    assert s["n_kept"] == 2


def test_exact_token_budget_order(spark):
    # kept set == prefix of (quality DESC, doc_id) order with cumsum <= 25
    unique = curate(_docs(spark), min_quality=0.0,
                    jaccard_threshold=0.99).kept.collect()
    unique.sort(key=lambda r: (-r["quality"], r["doc_id"]))
    cum, expect = 0, []
    for r in unique:
        cum += r["n_tokens"]
        if cum > 25:
            break
        expect.append(r["doc_id"])
    res = curate(_docs(spark), min_quality=0.0, jaccard_threshold=0.99,
                 token_budget=25, exact_budget=True)
    assert sorted(r["doc_id"] for r in res.kept.collect()) == sorted(expect)


def test_approx_budget_no_global_sort(spark):
    # scale path: quality-cutoff via approxQuantile, no window
    res = curate(_docs(spark), min_quality=0.0, jaccard_threshold=0.99,
                 token_budget=30, exact_budget=False)
    total_all = curate(_docs(spark), min_quality=0.0,
                       jaccard_threshold=0.99).summary.first()["kept_tokens"]
    got = res.summary.first()["kept_tokens"]
    assert got < total_all  # the budget visibly cut something
    plan = res.kept._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_budget_noop_when_under(spark):
    res = curate(_docs(spark), min_quality=0.5, jaccard_threshold=0.5,
                 token_budget=10_000_000, exact_budget=True)
    assert res.summary.first()["n_kept"] == 2
