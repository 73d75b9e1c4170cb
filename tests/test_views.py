"""Human-facing views (W1/W2): bounded-by-default output and plan shape.

The reference streams every word to the terminal (`view/lib.rs:11-24`);
faithful semantics, but at corpus scale an unbounded ORDER BY is a
full-range shuffle for a display artifact. `view_frames` therefore caps
output at VIEW_FRAMES_DEFAULT_LIMIT (explicit ``limit=None`` opts out)
and the limited plan must compile to TakeOrderedAndProject (per-partition
top-K, no Exchange rangepartitioning).
"""

from fastpasta_spark.operators.views import (
    VIEW_FRAMES_DEFAULT_LIMIT,
    view_docs,
    view_frames,
)
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df


def test_view_frames_default_limit_and_order(spark):
    docs = corpus_df(spark, CorpusConfig(n_docs=60))
    rows = view_frames(docs).collect()
    n_spans = sum(r.n_spans for r in view_docs(docs).collect())
    assert 0 < len(rows) == n_spans <= VIEW_FRAMES_DEFAULT_LIMIT
    assert rows == sorted(rows, key=lambda r: (r.doc_id, r.offset))
    # explicit opt-out returns the identical full dump here (corpus small)
    assert view_frames(docs, limit=None).collect() == rows


def test_view_frames_limit_truncates(spark):
    docs = corpus_df(spark, CorpusConfig(n_docs=60))
    full = view_frames(docs, limit=None).collect()
    top = view_frames(docs, limit=7).collect()
    assert top == full[:7]


def test_view_frames_doc_ids_filter(spark):
    docs = corpus_df(spark, CorpusConfig(n_docs=60))
    want = [r.doc_id for r in docs.select("doc_id").limit(3).collect()]
    rows = view_frames(docs, doc_ids=want).collect()
    assert set(r.doc_id for r in rows) == set(want)
    assert len(rows) > 0


def test_view_frames_limited_plan_is_top_k(spark):
    """Limited form: TakeOrderedAndProject, no range-partitioning Exchange;
    unlimited opt-out keeps the global Sort (faithful full dump)."""
    docs = corpus_df(spark, CorpusConfig(n_docs=60))
    limited = view_frames(docs, limit=100)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in limited
    assert "rangepartitioning" not in limited

    unlimited = view_frames(docs, limit=None)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" not in unlimited


def test_driver_view_frames_query_is_unbounded(spark):
    """The driver-gate query must pass limit=None: its DuckDB oracle
    emits 4 rows per document unbounded, so the operator's human-facing
    100k default would truncate the engine side (and fail the row-count
    compare) on any corpus past 25k documents."""
    import __spark_entry__ as entry

    plan = entry._q_view_frames(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    assert "GlobalLimit" not in plan


def test_view_frames_implicit_default_warns_once(spark):
    """Round-5 advice: the silent 100k cap must announce itself — once
    per process on the IMPLICIT default; explicit limit / limit=None
    never warn."""
    import warnings

    from fastpasta_spark.operators import views

    docs = corpus_df(spark, CorpusConfig(n_docs=5))
    views._WARNED_DEFAULT_LIMIT = False
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        view_frames(docs)
        assert any("caps output" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        view_frames(docs)                 # second implicit call: silent
        view_frames(docs, limit=None)     # explicit: silent
        view_frames(docs, limit=10)       # explicit: silent
        assert not w
