"""Declarative constraint rules: predicates, one-pass counts, branches."""

import pytest

from fastpasta_spark.operators.constraints import (
    check_expr, foreign_key, in_range, is_in, matches, not_null, unique,
    violating_rows, violation_counts)


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [(1, "a@x.io", 10.0, "click"),
         (2, None,    -5.0, "click"),
         (3, "bad",   20.0, "view"),
         (4, "c@y.de", 1e9, "JUNK"),
         (4, "d@z.fr", 30.0, "view")],   # id 4 duplicated
        "id long, email string, amount double, etype string")


RULES = [
    not_null("email"),
    in_range("amount", 0.0, 100.0),
    matches("email", r"[^@]+@[^@]+\.[a-z]+"),
    is_in("etype", ["click", "view"]),
    check_expr("amount >= 0 OR email IS NOT NULL", "amount_or_email"),
    unique("id"),
]


def test_violation_counts(spark, tbl):
    got = {r.rule: r.violations for r in violation_counts(tbl, RULES).collect()}
    assert got == {
        "not_null_email": 1,     # id 2
        "range_amount": 2,       # -5 and 1e9
        "regex_email": 1,        # "bad" (NULL attributed to not_null only)
        "enum_etype": 1,         # JUNK
        "amount_or_email": 1,    # id 2: amount<0 AND email null
        "unique_id": 2,          # both id-4 rows count
    }


def test_foreign_key_branch(spark, tbl):
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    got = {r.rule: r.violations for r in
           violation_counts(tbl, [foreign_key("id", dim, "k")]).collect()}
    assert got == {"fk_id": 2}   # two orphan rows with id 4


def test_violating_rows(spark, tbl):
    rows = {(r.id, r.rule) for r in
            violating_rows(tbl, RULES, "id").collect()}
    assert (2, "not_null_email") in rows
    assert (4, "enum_etype") in rows
    assert (3, "regex_email") in rows
    assert not any(rule == "unique_id" for _, rule in rows)


def test_one_pass_for_row_rules(spark, tbl):
    row_rules = [r for r in RULES if r.kind not in ("unique", "foreign_key")]
    plan = (violation_counts(tbl, row_rules)
            ._jdf.queryExecution().executedPlan().toString())
    # exactly ONE exchange: the single-partition merge of the per-
    # partition partial sums (bytes, not data rows) — nothing else
    # shuffles no matter how many row rules ride the pass
    assert plan.count("Exchange") == 1
    assert "Exchange SinglePartition" in plan


def test_duplicate_names_rejected(spark, tbl):
    with pytest.raises(ValueError, match="duplicate"):
        violation_counts(tbl, [not_null("email"), not_null("email")])


def test_from_spec_round_trip(spark, tbl):
    import json

    from fastpasta_spark.operators.constraints import from_spec

    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    spec = json.loads(json.dumps([     # prove it survives JSON transport
        {"kind": "not_null", "col": "email"},
        {"kind": "in_range", "col": "amount", "lo": 0.0, "hi": 100.0},
        {"kind": "is_in", "col": "etype", "values": ["click", "view"]},
        {"kind": "check_expr", "name": "amt_or_email",
         "expr": "amount >= 0 OR email IS NOT NULL"},
        {"kind": "unique", "col": "id"},
        {"kind": "foreign_key", "col": "id", "dim": "d", "dim_col": "k"},
    ]))
    rules = from_spec(spec, dims={"d": dim})
    got = {r.rule: r.violations for r in violation_counts(tbl, rules).collect()}
    assert got == {"not_null_email": 1, "range_amount": 2, "enum_etype": 1,
                   "amt_or_email": 1, "unique_id": 2, "fk_id": 2}


def test_from_spec_errors(spark):
    from fastpasta_spark.operators.constraints import from_spec

    with pytest.raises(ValueError, match="unknown rule kind"):
        from_spec([{"kind": "nope", "col": "x"}])
    with pytest.raises(ValueError, match="foreign_key needs"):
        from_spec([{"kind": "foreign_key", "col": "x", "dim": "d",
                    "dim_col": "k"}])


def test_empty_table_zero_not_null_counts(spark):
    df = spark.createDataFrame([], "id long, email string")
    got = {r.rule: r.violations for r in violation_counts(
        df, [not_null("email"), unique("id")]).collect()}
    assert got == {"not_null_email": 0, "unique_id": 0}


def test_matches_is_full_match(spark):
    df = spark.createDataFrame([("1234",), ("abc1234xyz",), ("12345",)],
                               "code string")
    got = {r.rule: r.violations for r in violation_counts(
        df, [matches("code", "[0-9]{4}")]).collect()}
    assert got == {"regex_code": 2}  # only the exact 4-digit value passes


def test_no_rules_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="no rules"):
        violation_counts(df, [])


def test_violation_counts_match_python_reference_on_random_data(spark):
    """One Spark job over a randomized table vs a plain-Python
    recomputation of every rule — the constraints analogue of the FSM
    random-docs parity test."""
    import random
    import re

    rng = random.Random(20260817)
    vals = lambda: rng.choice(
        [None, rng.randint(-50, 50), 0, 7])
    strs = lambda: rng.choice(
        [None, "", "ok", "o'brien", "x" * 5, "1234", "ab12", " ", "née"])
    rows = [(i, vals(), strs()) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, num long, s string")

    rules = [
        not_null("num"),
        in_range("num", -10, 10),
        matches("s", "[a-z0-9]+"),
        is_in("s", ["ok", "1234", ""]),
        check_expr("num IS NULL OR num <> 7", "never_seven"),
        unique("num"),
    ]
    got = {r.rule: r.violations
           for r in violation_counts(df, rules).collect()}

    exp = {
        "not_null_num": sum(1 for _, n, _ in rows if n is None),
        "range_num": sum(1 for _, n, _ in rows
                         if n is not None and not -10 <= n <= 10),
        "regex_s": sum(1 for _, _, s in rows if s is not None
                       and not re.fullmatch("[a-z0-9]+", s)),
        "enum_s": sum(1 for _, _, s in rows if s is not None
                      and s not in ("ok", "1234", "")),
        "never_seven": sum(1 for _, n, _ in rows if n == 7),
    }
    from collections import Counter

    nums = Counter(n for _, n, _ in rows if n is not None)
    exp["unique_num"] = sum(c for c in nums.values() if c > 1)
    assert got == exp


def test_violating_rows_requires_row_level_rules(spark):
    # set-level-only rule lists previously built F.array() over zero
    # columns (untyped empty array + no-op explode); now they raise
    import pytest

    from fastpasta_spark.operators import constraints as C

    df = spark.createDataFrame([(1,)], "event_id long")
    with pytest.raises(ValueError, match="row-level"):
        C.violating_rows(df, [C.unique("event_id")], "event_id")
