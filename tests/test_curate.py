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


# ---------------------------------------------------------------- #
# fitted-signal gate + rank_col token budget (round-7 wiring)        #
# ---------------------------------------------------------------- #

GIBBERISH = ("zzq wvx qqj xxv zzk wwq vvx qqz kkx wwj zzv xxq jjw kkq "
             "vvz wwx qqk jjx zzw vvq")  # OOV-dense: low avg_logprob


def _scored_docs(spark):
    rows = [
        (1, GOOD), (2, GOOD2), (3, OTHER),
        (4, GIBBERISH),
        (5, None),  # unscorable: NULL avg_logprob
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fit_lm(docs):
    from fastpasta_spark.operators.textstats import fit_scoring_model

    return fit_scoring_model(docs, ["lm"], vocab_k=2000)


def test_fitted_gate_drops_low_lm_and_nulls(spark):
    docs = _scored_docs(spark)
    model = _fit_lm(docs)
    scores = {r["doc_id"]: r["avg_logprob"]
              for r in model.apply(docs).collect()}
    assert scores[5] is None
    # threshold between the gibberish doc and the real ones
    good_min = min(scores[i] for i in (1, 2, 3))
    assert scores[4] < good_min
    thresh = (scores[4] + good_min) / 2
    res = curate(docs, min_quality=0.0, jaccard_threshold=0.99,
                 scoring=model, min_scores={"avg_logprob": thresh})
    kept = {r["doc_id"]: r for r in res.kept.collect()}
    assert set(kept) == {1, 2, 3}          # 4 under threshold, 5 NULL
    assert kept[1]["avg_logprob"] == scores[1]  # score column flows out


def test_exact_budget_ranks_by_fitted_signal(spark):
    docs = _scored_docs(spark)
    model = _fit_lm(docs)
    # no budget first: collect (id, n_tokens, avg_logprob) survivors
    base = curate(docs, min_quality=0.0, jaccard_threshold=0.99,
                  scoring=model).kept.collect()
    order = sorted(base, key=lambda r: (
        r["avg_logprob"] is None, -(r["avg_logprob"] or 0), r["doc_id"]))
    budget, cum, expect = 45, 0, []
    for r in order:
        cum += r["n_tokens"]
        if cum > budget:
            break
        expect.append(r["doc_id"])
    res = curate(docs, min_quality=0.0, jaccard_threshold=0.99,
                 scoring=model, token_budget=budget, exact_budget=True,
                 rank_col="avg_logprob")
    assert sorted(r["doc_id"] for r in res.kept.collect()) == sorted(expect)


def test_histogram_budget_generalizes_to_signal_and_drops_nulls(spark):
    docs = _scored_docs(spark)
    model = _fit_lm(docs)
    base = curate(docs, min_quality=0.0, jaccard_threshold=0.99,
                  scoring=model).kept.collect()
    total = sum(r["n_tokens"] for r in base)
    # budget below the top docs' mass so the walk stops before the
    # gibberish doc's bin (the cut INCLUDES the bin that crosses the
    # budget — overshoot is bounded by one bin's mass, not zero)
    res = curate(docs, min_quality=0.0, jaccard_threshold=0.99,
                 scoring=model, token_budget=40, exact_budget=False,
                 rank_col="avg_logprob")
    kept = res.kept.collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert 5 not in kept_ids                    # NULL rank dropped first
    assert 4 not in kept_ids                    # lowest-score bin cut
    assert sum(r["n_tokens"] for r in kept) < total  # budget cut something
    # bin-granularity contract: every dropped score <= every kept score
    # + one bin width
    scores = {r["doc_id"]: r["avg_logprob"] for r in base}
    vals = [v for v in scores.values() if v is not None]
    width = (max(vals) - min(vals)) / 1000.0
    dropped = [scores[i] for i in scores
               if i not in kept_ids and scores[i] is not None]
    if dropped and kept:
        assert max(dropped) <= min(r["avg_logprob"] for r in kept) + width


def test_histogram_budget_fills_from_null_rank_mass(spark):
    """Review scenario: ranked docs alone are under budget while the
    NULL-ranked mass dominates — the scale-mode cut must fill leftover
    budget from the NULL mass (md5 sub-bins) instead of discarding it
    wholesale."""
    ranked = [(1, GOOD), (2, GOOD2)]                     # bm25-ranked docs
    nulls = [(i, OTHER + f" filler{i}") for i in range(10, 40)]  # no term
    docs = spark.createDataFrame(ranked + nulls, "doc_id long, text string")
    from fastpasta_spark.operators.textstats import fit_scoring_model

    model = fit_scoring_model(docs, ["bm25"], terms=["fox"])
    base = curate(docs, min_quality=0.0, jaccard_threshold=0.99,
                  scoring=model).kept.collect()
    ranked_ids = {r["doc_id"] for r in base if r["bm25"] is not None}
    assert ranked_ids == {1, 2}
    ranked_mass = sum(r["n_tokens"] for r in base if r["bm25"] is not None)
    total = sum(r["n_tokens"] for r in base)
    budget = ranked_mass + (total - ranked_mass) // 2  # half the NULL mass
    res = curate(docs, min_quality=0.0, jaccard_threshold=0.99,
                 scoring=model, token_budget=budget, exact_budget=False,
                 rank_col="bm25")
    kept = res.kept.collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert ranked_ids <= kept_ids            # ranked docs always survive
    null_kept = kept_ids - ranked_ids
    assert null_kept, "budget headroom must be filled from NULL-rank docs"
    assert len(null_kept) < len(nulls)       # ...but not ALL of them


def test_gopher_gate_in_funnel(spark):
    """curate(gopher=True) drops rule-failing docs in the same scan and
    keeps gopher_flags on survivors for audit."""
    long_good = " ".join(
        ["the data pipeline will be checked and that is fine to have"] * 6)
    docs = spark.createDataFrame(
        [(1, long_good),
         (2, "\n".join("- bullet point here" for _ in range(30))),
         (3, "short")],
        "doc_id long, text string")
    res = curate(docs, min_quality=0.0, jaccard_threshold=0.99, gopher=True)
    kept = {r["doc_id"]: r for r in res.kept.collect()}
    assert set(kept) == {1}
    assert kept[1]["gopher_flags"] == []
    base = curate(docs, min_quality=0.0, jaccard_threshold=0.99)
    assert {r["doc_id"] for r in base.kept.collect()} == {1, 2, 3}
