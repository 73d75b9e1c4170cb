"""Pinned golden regression — the engine's violation rows and metrics
must match a CHECKED-IN snapshot byte-for-byte.

This closes the gap the shared-oracle tests leave open: the engine and
the pytest oracle share functions/fsm.py, so a semantics change in both
would pass every equivalence test. The golden file pins today's
semantics the way the reference pins exact error positions/codes/counts
per sample file (fastpasta/tests/fastpasta_1_hbf_bad_its_payload.rs:15-50,
regression_tests.sh). An INTENTIONAL semantics change must regenerate
the golden (see tests/golden/README) and say so in the commit message.
"""

import json
import os

import pytest

from fastpasta_spark.plans.check_all import check_all
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "violations_n250_c400_d40.json")
# metrics that are approximate or partitioning-dependent
SKIP_METRICS = {"doc_id_distinct_hll"}


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


def test_violations_match_golden_exactly(spark, golden):
    cfg = CorpusConfig(**{k: v for k, v in golden["config"].items()})
    res = check_all(corpus_df(spark, cfg), media_df(spark, cfg))
    got = [
        [r.doc_id, r.span_idx, r.offset, r.check_code, r.severity, r.message]
        for r in res.violations.collect()
    ]
    got.sort(key=lambda v: (v[0] or "", -2 if v[1] is None else v[1],
                            v[2], v[3], v[5]))
    assert got == golden["violations"]

    m = {r.name: r.value for r in res.metrics.collect()}
    for name, value in golden["metrics"].items():
        if name in SKIP_METRICS:
            continue
        assert m.get(name) == value, name
