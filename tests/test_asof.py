"""As-of join vs a pure-Python oracle on the events table."""

import pytest

from fastpasta_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()


def test_asof_matches_python(spark, events):
    errors = events.filter("event_type = 'error'")
    clicks = events.filter("event_type = 'click'")
    got = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_join(errors, clicks, key="user_id",
                           left_time="ts", right_time="ts",
                           payload_cols=["event_id", "value"]).collect()
    }

    err_rows = sorted(errors.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    clk_rows = sorted(clicks.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    expected = {}
    for e in err_rows:
        best = None
        for c in clk_rows:
            if c.user_id == e.user_id and c.ts <= e.ts:
                if best is None or c.ts > best.ts:
                    best = c
        expected[e.event_id] = (
            (best.event_id, best.value) if best else (None, None)
        )
    assert got == expected
    assert len(got) > 10
    assert any(v != (None, None) for v in got.values())


def test_asof_single_shuffle(spark, events):
    import re

    errors = events.filter("event_type = 'error'")
    clicks = events.filter("event_type = 'click'")
    df = asof_join(errors, clicks, key="user_id", left_time="ts",
                   right_time="ts", payload_cols=["event_id"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\n\(\d+\) Exchange", plan)) == 1
