"""Deterministic hash-gate sampling + mix-report tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastpasta_spark.functions.hashing import py_md5_hash
from fastpasta_spark.operators.sampling import (
    DENOM,
    mix_report,
    sample_exact,
    sample_stratified,
)


def _ids(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_matches_python_twin(spark):
    got = {r["doc_id"] for r in sample_exact(_ids(spark, 500), rate=0.3,
                                             seed=9).collect()}
    expect = {i for i in range(500)
              if py_md5_hash(str(i), seed=9) % DENOM < 300_000}
    assert got == expect


def test_deterministic_and_partition_independent(spark):
    a = sample_exact(_ids(spark).coalesce(1), rate=0.2, seed=1)
    b = sample_exact(_ids(spark).repartition(16), rate=0.2, seed=1)
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())


def test_nested_same_seed_is_noop_and_rates_nest(spark):
    s50 = sample_exact(_ids(spark), rate=0.5, seed=3)
    again = sample_exact(s50, rate=0.5, seed=3)
    assert again.count() == s50.count()
    s10 = {r["doc_id"] for r in sample_exact(_ids(spark), rate=0.1,
                                             seed=3).collect()}
    s50set = {r["doc_id"] for r in s50.collect()}
    assert s10 <= s50set  # smaller rate = subset at the same seed


def test_empirical_rate(spark):
    n = sample_exact(_ids(spark, 20_000), rate=0.25, seed=5).count()
    assert abs(n / 20_000 - 0.25) < 0.02


def test_stratified_rates(spark):
    df = spark.range(9000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("zz")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    s = sample_stratified(df, "lang", {"en": 0.5, "de": 0.1}, seed=2,
                          default_rate=0.0)
    by = {r["lang"]: r["n"] for r in
          s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert abs(by["en"] / 3000 - 0.5) < 0.05
    assert abs(by["de"] / 3000 - 0.1) < 0.04
    assert "zz" not in by  # default 0 drops unlisted strata


def test_mix_report_shares(spark):
    df = spark.createDataFrame(
        [("en", 10), ("en", 30), ("de", 60)], "lang_pred string, n_tokens long")
    rows = mix_report(df).collect()
    by = {r["lang_pred"]: r for r in rows}
    assert by["en"]["docs"] == 2 and by["en"]["tokens"] == 40
    assert abs(by["en"]["token_share"] - 0.4) < 1e-9
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-6


def test_temperature_rates_flatten_head():
    from fastpasta_spark.operators.sampling import temperature_rates

    shares = {"en": 0.8, "de": 0.15, "fr": 0.05}
    rates = temperature_rates(shares, temperature=0.5)
    # the rarest stratum keeps everything; the head is downsampled
    assert rates["fr"] == 1.0
    assert rates["en"] < rates["de"] < rates["fr"]
    # resulting mix is exactly the temperature target (s^T normalized)
    kept = {k: shares[k] * rates[k] for k in shares}
    tot = sum(kept.values())
    t = sum(s ** 0.5 for s in shares.values())
    for k in shares:
        assert abs(kept[k] / tot - shares[k] ** 0.5 / t) < 1e-12


def test_temperature_rates_identity_and_degenerate():
    import pytest as _pt

    from fastpasta_spark.operators.sampling import temperature_rates

    assert temperature_rates({"a": 0.6, "b": 0.4}, 1.0) == {"a": 1.0, "b": 1.0}
    assert temperature_rates({"a": 0.0}, 0.5) == {"a": 0.0}
    with _pt.raises(ValueError):
        temperature_rates({"a": 1.0}, 0.0)


def test_stratified_quote_in_stratum_value(spark):
    from fastpasta_spark.operators.sampling import sample_stratified

    df = spark.createDataFrame(
        [(i, "o'brien" if i % 2 else "plain") for i in range(100)],
        "doc_id long, src string")
    out = sample_stratified(df, "src", {"o'brien": 1.0}, default_rate=0.0)
    got = {r.src for r in out.collect()}
    assert got == {"o'brien"} and out.count() == 50


def test_mix_report_all_zero_tokens_yields_null_share(spark):
    """ANSI mode: _tt = 0 made token_share a DIVIDE_BY_ZERO crash; an
    all-zero-token corpus must report NULL shares (DuckDB parity)."""
    df = spark.createDataFrame(
        [("en", 0), ("de", 0)], "lang_pred string, n_tokens long")
    rows = mix_report(df).collect()
    assert len(rows) == 2
    assert all(r.token_share is None for r in rows)


def _strata_df(spark, sizes: dict, null_n: int = 0):
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append((i, s))
            i += 1
    for _ in range(null_n):
        rows.append((i, None))
        i += 1
    return spark.createDataFrame(rows, "doc_id long, src string")


def _expected_topk(rows, k, seed=0):
    """Pure-python twin: k smallest (pmod(md5, DENOM), id) per stratum."""
    by = {}
    for i, s in rows:
        by.setdefault(s, []).append((py_md5_hash(str(i), seed=seed) % DENOM, i))
    out = set()
    for s, lst in by.items():
        for _, i in sorted(lst)[:k]:
            out.add(i)
    return out


def test_sample_k_matches_python_twin_and_nests(spark):
    from fastpasta_spark.operators.sampling import sample_k_per_stratum

    df = _strata_df(spark, {"a": 400, "b": 50, "c": 3})
    rows = [(r.doc_id, r.src) for r in df.collect()]
    got100 = {r.doc_id for r in
              sample_k_per_stratum(df, "src", 100).collect()}
    assert got100 == _expected_topk(rows, 100)
    # exact sizes: min(k, n) per stratum
    out = sample_k_per_stratum(df, "src", 10)
    sizes = {r.src: r.n for r in
             out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"a": 10, "b": 10, "c": 3}
    # nesting: the k=10 sample is a prefix-subset of the k=100 sample
    got10 = {r.doc_id for r in out.collect()}
    assert got10 <= got100
    assert got10 == _expected_topk(rows, 10)


def test_sample_k_gate_prefilters_but_stays_exact(spark):
    """oversample=1.02 makes gate deficits likely -> the ungated
    re-run branch must keep the result exact anyway."""
    from fastpasta_spark.operators.sampling import sample_k_per_stratum

    df = _strata_df(spark, {"a": 1000, "b": 500}, null_n=40)
    rows = [(r.doc_id, r.src) for r in df.collect()]
    for os_ in (1.02, 4.0):
        got = {r.doc_id for r in
               sample_k_per_stratum(df, "src", 25, oversample=os_).collect()}
        assert got == _expected_topk(rows, 25), os_
    # NULL stratum is a real stratum: exactly 25 of the 40 null rows
    out = sample_k_per_stratum(df, "src", 25)
    assert out.filter(F.col("src").isNull()).count() == 25


def test_sample_k_survives_zero_survivor_stratum(spark):
    """A big stratum whose gate kills EVERY row (P ~ e^-(oversample*k))
    must still contribute min(k, n) rows: the deficiency check derives
    shortness from the gate table, not from the survivors (a stratum
    with zero survivors has no group to report itself)."""
    from fastpasta_spark.operators.sampling import sample_k_per_stratum

    # find a seed where NO id in the big stratum passes the k=1,
    # oversample=1.0 gate (thresh = ceil(DENOM/n) = 1000 for n=1000)
    n = 1000
    seed = next(
        s for s in range(50)
        if all(py_md5_hash(str(i), seed=s) % DENOM >= DENOM // n
               for i in range(n))
    )
    df = _strata_df(spark, {"big": n, "tiny": 2})
    rows = [(r.doc_id, r.src) for r in df.collect()]
    got = sample_k_per_stratum(df, "src", 1, seed=seed, oversample=1.0)
    sizes = {r.src: r.n for r in
             got.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"big": 1, "tiny": 1}
    assert {r.doc_id for r in got.collect()} == _expected_topk(rows, 1,
                                                               seed=seed)


def test_sample_k_never_samples_null_ids(spark):
    """NULL-id rows have no hash identity: the gated path drops them
    (NULL gate) and the ungated deficiency re-run must NOT resurrect
    them (a NULL hash ranks first in the window order)."""
    from fastpasta_spark.operators.sampling import sample_k_per_stratum

    rows = [(i, "a") for i in range(40)] + [(None, "a"), (None, "b")]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    # oversample=1.0 at k=30 of 42 makes a deficient re-run near-certain
    for os_ in (1.0, 4.0):
        got = sample_k_per_stratum(df, "src", 30, oversample=os_).collect()
        assert all(r.doc_id is not None for r in got), os_
        ids = {r.doc_id for r in got}
        assert ids == _expected_topk([(i, "a") for i in range(40)], 30), os_


def test_sample_k_rejects_bad_k(spark):
    import pytest

    from fastpasta_spark.operators.sampling import sample_k_per_stratum

    with pytest.raises(ValueError, match="positive"):
        sample_k_per_stratum(_strata_df(spark, {"a": 3}), "src", 0)


def test_sample_k_gate_join_is_broadcast(spark):
    """Scale shape: the per-stratum gate table must broadcast (map-side
    filter BEFORE the window) — a sort-merge join here would shuffle
    the full corpus just to attach thresholds, defeating the design."""
    from fastpasta_spark.operators.sampling import sample_k_per_stratum

    df = _strata_df(spark, {"a": 500, "b": 100})
    plan = sample_k_per_stratum(df, "src", 10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sample_k_property_matches_twin(spark):
    """Property: for random strata layouts, k and oversample, the
    distributed sampler equals the pure-python twin exactly (the
    deficiency re-run guarantees exactness even at oversample ~1)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from fastpasta_spark.operators.sampling import sample_k_per_stratum

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(
        sizes=st.dictionaries(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=1, max_value=300), min_size=1),
        null_n=st.integers(min_value=0, max_value=30),
        k=st.integers(min_value=1, max_value=120),
        oversample=st.sampled_from([1.0, 1.5, 4.0]),
        seed=st.integers(min_value=0, max_value=3),
    )
    def check(sizes, null_n, k, oversample, seed):
        df = _strata_df(spark, sizes, null_n=null_n)
        rows = [(r.doc_id, r.src) for r in df.collect()]
        got = {r.doc_id for r in sample_k_per_stratum(
            df, "src", k, oversample=oversample, seed=seed).collect()}
        assert got == _expected_topk(rows, k, seed=seed)

    check()


# ---------------------------------------------------------------- #
# importance_resample: deterministic weighted without-replacement   #
# sampling (Efraimidis-Spirtakis over the portable md5 gate)         #
# ---------------------------------------------------------------- #

import math

import pytest

from fastpasta_spark.operators.sampling import importance_resample


def _ikey(i, w, seed, temperature=1.0):
    u = (py_md5_hash(str(i), seed=seed) % DENOM + 1) / (DENOM + 1)
    return round(math.log(u) * math.exp(-w / temperature), 9)


def _weighted(spark, n=300):
    # deterministic log-weights in [-2, 2]
    rows = [(i, ((i * 7) % 13 - 6) / 3.0) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, w double")


def test_importance_matches_python_twin(spark):
    got = [r["doc_id"] for r in importance_resample(
        _weighted(spark), "w", k=50, seed=4).collect()]
    keys = sorted(((-_ikey(i, ((i * 7) % 13 - 6) / 3.0, seed=4), i)
                   for i in range(300)))
    assert sorted(got) == sorted(i for _, i in keys[:50])


def test_importance_nests_and_partition_independent(spark):
    df = _weighted(spark)
    top10 = {r["doc_id"] for r in
             importance_resample(df, "w", k=10, seed=1).collect()}
    top50 = {r["doc_id"] for r in
             importance_resample(df.repartition(16), "w", k=50,
                                 seed=1).collect()}
    assert top10 <= top50 and len(top50) == 50


def test_importance_converges_to_weighted_mix(spark):
    # group A log-weight ln(9), group B 0 -> A is 9x likelier per draw;
    # at k=200 of 2000 the realized mix must sit far above A's 50% base
    # rate (binomial mean ~0.9, the 0.75 bound is > 6 sigma away)
    rows = [(i, math.log(9.0) if i % 2 == 0 else 0.0, i % 2 == 0)
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double, is_a boolean")
    got = importance_resample(df, "w", k=200, seed=2).collect()
    share_a = sum(r["is_a"] for r in got) / len(got)
    assert share_a > 0.75


def test_importance_null_nan_weight_and_null_id_excluded(spark):
    # NaN would sort GREATER than every real key under desc ordering
    # and win every draw — it must be excluded like NULL
    rows = ([(0, None), (None, 5.0), (90, float("nan"))]
            + [(i, 0.0) for i in range(1, 40)])
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in
           importance_resample(df, "w", k=100, seed=0).collect()}
    assert got == set(range(1, 40))


def test_importance_validation():
    with pytest.raises(ValueError, match="k must be positive"):
        importance_resample(None, "w", k=0)
    with pytest.raises(ValueError, match="temperature"):
        importance_resample(None, "w", k=1, temperature=0.0)


def test_dsir_resample_overrepresents_target(spark):
    from fastpasta_spark.plans.curate import dsir_resample

    en = "the quick brown fox jumps over the lazy dog again and again"
    de = "der schnelle braune fuchs springt wieder uber den faulen hund"
    rows = [(i, en if i % 2 == 0 else de, "en" if i % 2 == 0 else "de")
            for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = dsir_resample(docs, F.col("lang") == "en", k=60, seed=5).collect()
    assert "dsir_logratio" in got[0].asDict()
    share_en = sum(r["lang"] == "en" for r in got) / len(got)
    assert share_en > 0.75  # raw corpus share is 0.5


def test_temperature_rebalance_flattens_mix_and_matches_twin(spark):
    from fastpasta_spark.functions.hashing import py_tokens
    from fastpasta_spark.operators.sampling import (
        temperature_rates,
        temperature_rebalance,
    )

    big = "the quick brown fox jumps over the lazy dog every single day"
    small = "der schnelle fuchs springt"
    rows = ([(i, "en", big) for i in range(900)]
            + [(1000 + i, "de", small) for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    sampled, report = temperature_rebalance(df, "lang", temperature=0.5,
                                            seed=4)
    rep = {r["lang"]: r for r in report.collect()}
    # python twin of the whole composition
    tok = {i: len(py_tokens(t)) for i, _lg, t in rows}
    tokens = {"en": sum(tok[i] for i, lg, _ in rows if lg == "en"),
              "de": sum(tok[i] for i, lg, _ in rows if lg == "de")}
    total = sum(tokens.values())
    shares = {k: v / total for k, v in tokens.items()}  # UNROUNDED
    rates = temperature_rates(shares, 0.5)
    assert rep["en"]["keep_rate"] == round(rates["en"], 6)
    assert rep["de"]["keep_rate"] == 1.0   # the upweighted tail keeps all
    want = {i for i, lg, _ in rows
            if py_md5_hash(str(i), seed=4) % DENOM
            < int(round(rates[lg] * DENOM))}
    got = {r["doc_id"] for r in sampled.collect()}
    assert got == want
    # realized mix moved toward flat: en token share drops vs before
    n_en = sum(1 for i in got if i < 1000)
    n_de = len(got) - n_en
    before = 900 / 1000
    after = n_en / (n_en + n_de)
    assert after < before
