"""FIXTURES.md family contracts: each named fixture produces (at least)
its designated violation code; clean_small produces none."""

import pytest

from fastpasta_spark.plans.check_all import check_all
from fastpasta_spark.sources import fixtures as FX
from fastpasta_spark.sources.synth import CorpusConfig, media_df


@pytest.mark.parametrize("family", sorted(FX.expected_dominant_codes()))
def test_fixture_family_codes(spark, family):
    df = FX.FIXTURES[family](spark, 200)
    media = media_df(spark, CorpusConfig())
    res = check_all(df, media)
    codes = {r.check_code for r in res.violations.collect()}
    expected = FX.expected_dominant_codes()[family]
    if not expected:
        assert codes == set(), codes
    else:
        assert expected <= codes, (family, codes)


def test_drifted_fixture_drifts(spark):
    from fastpasta_spark.operators.drift import drift_violations, kind_profile

    golden = kind_profile(FX.clean_small(spark, 300))
    assert drift_violations(FX.drifted(spark, 300), golden,
                            chi2_threshold=5.0).count() == 1
