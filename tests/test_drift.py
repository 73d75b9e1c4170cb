"""Drift operators: chi-square and KS against known distributions."""

from fastpasta_spark.operators.drift import (
    chi_square,
    drift_violations,
    kind_profile,
    ks_statistic,
    len_profile,
)
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df


def _profile(spark, rows):
    return spark.createDataFrame(rows, "category string, cnt long")


def test_chi_square_zero_for_identical(spark):
    p = _profile(spark, [("a", 100), ("b", 50)])
    r = chi_square(p, p).collect()[0]
    assert abs(r.chi2) < 1e-9
    assert r.dof == 1


def test_chi_square_scale_invariant_for_proportional(spark):
    # same distribution at 10x the volume: chi2 stays ~0
    a = _profile(spark, [("a", 100), ("b", 50)])
    b = _profile(spark, [("a", 1000), ("b", 500)])
    assert abs(chi_square(a, b).collect()[0].chi2) < 1e-9


def test_chi_square_detects_shift(spark):
    a = _profile(spark, [("a", 100), ("b", 100)])
    b = _profile(spark, [("a", 190), ("b", 10)])
    assert chi_square(a, b).collect()[0].chi2 > 50


def test_ks_bounds(spark):
    a = _profile(spark, [("00", 100), ("01", 100)])
    same = ks_statistic(a, a).collect()[0].ks
    assert abs(same) < 1e-9
    b = _profile(spark, [("00", 200), ("01", 0)])
    shifted = ks_statistic(a, b).collect()[0].ks
    assert abs(shifted - 0.5) < 1e-9  # CDF gap at the first bucket


def test_drift_violations_fire_on_shifted_corpus(spark):
    clean = corpus_df(spark, CorpusConfig(n_docs=300))
    golden = kind_profile(clean)
    # heavily corrupted corpus shifts the kind mix (junk kinds, dropped
    # trailers) — FIXTURES.md 'drifted' fixture
    drifted = corpus_df(spark, CorpusConfig(n_docs=300, corrupt_per_mille=900))
    rows = drift_violations(drifted, golden, chi2_threshold=5.0).collect()
    assert len(rows) == 1 and rows[0].check_code == "E120"
    # and the clean corpus itself does NOT drift vs its own profile
    assert drift_violations(clean, golden, chi2_threshold=5.0).count() == 0


def test_len_profile_buckets(spark):
    docs = corpus_df(spark, CorpusConfig(n_docs=100))
    rows = len_profile(docs).collect()
    assert sum(r.cnt for r in rows) > 0
    assert all(r.category.startswith("len_bucket_") for r in rows)


def test_length_histogram_exact_buckets(spark):
    from fastpasta_spark.operators.drift import length_histogram

    df = spark.createDataFrame(
        [("",), (None,), ("x" * 7,), ("x" * 8,), ("x" * 1024,)], "text string")
    got = {r.category: r.cnt for r in length_histogram(df, "text").collect()}
    # len 0, 0 (null->''), 7 land below edge 8 -> bucket 0; len 8 -> 1;
    # len 1024 clears edges 8..1024 (8 of the 9) -> bucket 8
    assert got == {"len_bucket_0": 3, "len_bucket_1": 1, "len_bucket_8": 1}


def test_iqr_outliers_known_fences(spark):
    from fastpasta_spark.operators.drift import iqr_outliers

    # 0..100 plus two planted outliers
    df = spark.createDataFrame(
        [(float(i),) for i in range(101)] + [(1000.0,), (-500.0,)],
        "x double")
    r = iqr_outliers(df, "x").first()
    # q1=25.5, q3=75.5 over 103 values -> IQR=50, fences [-49.5, 150.5]
    assert r.n_below == 1 and r.n_above == 1 and r.n_rows == 103
    assert r.lo < 0 < r.hi < 1000


def test_iqr_outliers_empty_input_raises(spark):
    import pytest as _pt

    from fastpasta_spark.operators.drift import iqr_outliers

    df = spark.createDataFrame([], "x double")
    with _pt.raises(ValueError, match="no non-NULL values"):
        iqr_outliers(df, "x")


def test_chi_square_empty_side_yields_null_not_crash(spark):
    """ANSI mode: n_a = 0 made sqrt(n_b/n_a) raise DIVIDE_BY_ZERO; an
    empty/all-zero side must degrade to chi2 = NULL (undefined
    statistic), matching DuckDB's x/0 -> NULL for SQL oracles."""
    a = _profile(spark, [])
    b = _profile(spark, [("a", 100), ("b", 50)])
    r = chi_square(a, b).collect()[0]
    assert r.chi2 is None and r.n_a == 0

    r2 = chi_square(b, a).collect()[0]
    assert r2.chi2 is None and r2.n_b == 0


def test_ks_empty_side_yields_null_not_crash(spark):
    a = _profile(spark, [])
    b = _profile(spark, [("a", 100), ("b", 50)])
    assert ks_statistic(a, b).collect()[0].ks is None


def test_psi_zero_for_identical_and_proportional(spark):
    from fastpasta_spark.operators.drift import psi

    p = _profile(spark, [("a", 100), ("b", 50)])
    r = psi(p, p).collect()[0]
    assert abs(r.psi) < 1e-12 and r.categories == 2
    # shares, not counts: 10x the volume is zero drift
    q = _profile(spark, [("a", 1000), ("b", 500)])
    assert abs(psi(p, q).collect()[0].psi) < 1e-12


def test_null_category_matches_itself_across_profiles(spark):
    """NULL is a legal category (span kind is nullable): identical
    profiles containing a NULL category must merge it into ONE row
    (null-safe join key), not two one-sided floor rows — a plain join
    would report major drift (psi ~ 2.3) on identical distributions."""
    from fastpasta_spark.operators.drift import chi_square, psi

    p = _profile(spark, [("a", 900), (None, 100)])
    r = psi(p, p).collect()[0]
    assert abs(r.psi) < 1e-12
    assert r.categories == 2  # NULL counted once, not once per side
    c = chi_square(p, p).collect()[0]
    assert abs(c.chi2) < 1e-9 and c.dof == 1


def test_psi_symmetric_and_positive_on_shift(spark):
    from fastpasta_spark.operators.drift import psi

    a = _profile(spark, [("a", 90), ("b", 10)])
    b = _profile(spark, [("a", 10), ("b", 90)])
    ab = psi(a, b).collect()[0].psi
    ba = psi(b, a).collect()[0].psi
    assert ab > 0.25  # major shift on the standard scale
    assert abs(ab - ba) < 1e-12  # PSI is symmetric


def test_psi_vanished_category_uses_floor(spark):
    from fastpasta_spark.operators.drift import psi

    a = _profile(spark, [("a", 50), ("b", 50)])
    b = _profile(spark, [("a", 100)])
    r = psi(a, b).collect()[0]
    # category 'b' floors to 1e-6 on side b: large but FINITE
    import math

    assert r.psi > 1.0 and math.isfinite(r.psi)
    assert r.categories == 2


def test_psi_empty_sides(spark):
    from fastpasta_spark.operators.drift import psi

    e = _profile(spark, [])
    p = _profile(spark, [("a", 100), ("b", 50)])
    # one empty side: every category floors there -> defined, finite
    import math

    r = psi(p, e).collect()[0]
    assert math.isfinite(r.psi) and r.psi > 1.0 and r.n_b == 0
    # both empty: no categories -> NULL (sum over zero rows)
    r2 = psi(e, e).collect()[0]
    assert r2.psi is None and r2.categories == 0


def test_psi_rejects_nonpositive_floor(spark):
    import pytest as _pt

    from fastpasta_spark.operators.drift import psi

    p = _profile(spark, [("a", 1)])
    with _pt.raises(ValueError, match="floor"):
        psi(p, p, floor=0.0)
