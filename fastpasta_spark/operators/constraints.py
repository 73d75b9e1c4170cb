"""Declarative schema + constraint rules over any DataFrame — the
generic face of the validation engine (north_rule: "schema + constraint
validation engine"). The doc-model batteries (operators/sanity.py,
functions/fsm.py) are hand-fused for the hot path; this module is the
user-facing rule algebra for arbitrary tables, in the style of public
data-quality frameworks (Deequ / Great Expectations), re-expressed as
pure Catalyst expressions.

Rule kinds and their physical shape:
  * row rules (not_null, in_range, matches, is_in, check_expr) compile
    to ONE boolean Column each; `violation_counts` sums ALL of them in a
    single ``df.agg`` — one scan, map-side partial aggregation, no
    shuffle of data rows, whatever the rule count.
  * unique(col) — groupBy(col).count > 1: one shuffle of the key column
    only (map-side combine makes traffic ~distinct keys).
  * foreign_key(col, dim, dim_col) — anti-join against the dimension;
    Spark broadcasts it when small (the usual case for dims), AQE picks
    shuffle-hash otherwise.

Reference parity: the per-rule counters mirror fastPASTA's per-check
error totals (stats/stats_collector/error_stats.rs:96-121); row-level
extraction mirrors its violation report rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str          # unique label, appears in every output row
    kind: str          # not_null | in_range | matches | is_in | check_expr
    #                  # | unique | foreign_key
    col: str
    params: dict = field(default_factory=dict)


def not_null(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"not_null_{col}", "not_null", col)


def in_range(col: str, lo, hi, name: str | None = None) -> Rule:
    return Rule(name or f"range_{col}", "in_range", col,
                {"lo": lo, "hi": hi})


def matches(col: str, pattern: str, name: str | None = None) -> Rule:
    """Java/RE2-portable regex the FULL value must match — the pattern
    is anchored internally as ^(?:pattern)$ (rlike alone would do
    substring search and silently under-count violations)."""
    return Rule(name or f"regex_{col}", "matches", col,
                {"pattern": pattern})


def is_in(col: str, values: list, name: str | None = None) -> Rule:
    return Rule(name or f"enum_{col}", "is_in", col, {"values": list(values)})


def check_expr(expr: str, name: str, col: str = "") -> Rule:
    """Escape hatch: any boolean SQL expression that must hold per row."""
    return Rule(name, "check_expr", col, {"expr": expr})


def unique(col: str, name: str | None = None) -> Rule:
    return Rule(name or f"unique_{col}", "unique", col)


def foreign_key(col: str, dim: DataFrame, dim_col: str,
                name: str | None = None) -> Rule:
    return Rule(name or f"fk_{col}", "foreign_key", col,
                {"dim": dim, "dim_col": dim_col})


def _fail_predicate(r: Rule) -> F.Column:
    """Boolean Column: TRUE when the row VIOLATES the rule. NULL values
    only violate not_null — range/regex/enum follow SQL semantics where
    NULL is not a member/match but is reported via not_null, keeping
    each violation attributed to exactly one rule."""
    v = F.col(r.col) if r.col else None
    if r.kind == "not_null":
        return v.isNull()
    if r.kind == "in_range":
        return v.isNotNull() & ~v.between(r.params["lo"], r.params["hi"])
    if r.kind == "matches":
        return v.isNotNull() & ~v.rlike(f"^(?:{r.params['pattern']})$")
    if r.kind == "is_in":
        return v.isNotNull() & ~v.isin(r.params["values"])
    if r.kind == "check_expr":
        return ~F.coalesce(F.expr(r.params["expr"]), F.lit(True))
    raise ValueError(f"{r.name}: {r.kind} is not a row-level rule")


def _split(rules: list[Rule]):
    row = [r for r in rules if r.kind not in ("unique", "foreign_key")]
    uniq = [r for r in rules if r.kind == "unique"]
    fk = [r for r in rules if r.kind == "foreign_key"]
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    return row, uniq, fk


def violation_counts(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, violations) — one row per rule.

    All row-level rules ride ONE aggregation pass; each unique rule adds
    a key-only shuffle; each foreign_key adds one anti-join + count.
    The per-branch results are unioned as tiny one-row frames.
    """
    row, uniq, fk = _split(rules)
    if not rules:
        raise ValueError("violation_counts: no rules given")
    parts: list[DataFrame] = []
    if row:
        one = df.agg(*[
            # coalesce: sum over an EMPTY table is NULL, but a clean
            # empty input has 0 violations, not unknown
            F.coalesce(F.sum(_fail_predicate(r).cast("long")), F.lit(0))
            .alias(r.name)
            for r in row
        ])
        stacked = ", ".join(f"'{r.name}', `{r.name}`" for r in row)
        parts.append(one.select(F.expr(
            f"stack({len(row)}, {stacked}) as (rule, violations)")))
    for r in uniq:
        dup = (df.filter(F.col(r.col).isNotNull())
               .groupBy(r.col).agg(F.count(F.lit(1)).alias("_n"))
               .filter(F.col("_n") > 1)
               .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("violations")))
        parts.append(dup.select(F.lit(r.name).alias("rule"), "violations"))
    for r in fk:
        dim = r.params["dim"].select(
            F.col(r.params["dim_col"]).alias(r.col)).dropDuplicates()
        orphan = (df.filter(F.col(r.col).isNotNull())
                  .join(dim, r.col, "left_anti")
                  .agg(F.count(F.lit(1)).alias("violations")))
        parts.append(orphan.select(F.lit(r.name).alias("rule"), "violations"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("rule", F.col("violations").cast("long").alias("violations"))


def violating_rows(df: DataFrame, rules: list[Rule], id_col: str,
                   max_rows: int | None = 1000) -> DataFrame:
    """(id, rule) — one row per (row, violated row-level rule), capped.

    Only row-level rules: the row's identity is meaningful for them
    (unique/foreign_key violations are set-level; extract those with
    their own queries). One scan: the per-rule flags are built as an
    array of rule names and exploded — no per-rule re-scan.
    """
    row, _, _ = _split([r for r in rules
                        if r.kind not in ("unique", "foreign_key")])
    if not row:
        # mirror violation_counts' empty-input error: F.array() over zero
        # columns is an untyped empty array and the explode silently
        # yields nothing — an unguarded degenerate case
        raise ValueError("violating_rows: no row-level rules remain "
                         "(unique/foreign_key are set-level)")
    flags = F.array(*[
        F.when(_fail_predicate(r), F.lit(r.name)) for r in row
    ])
    out = (df.select(F.col(id_col).alias("id"), flags.alias("_f"))
           .select("id", F.explode(F.expr(
               "filter(_f, x -> x is not null)")).alias("rule")))
    if max_rows is not None:
        out = out.orderBy("id", "rule").limit(max_rows)
    return out


def from_spec(spec: list[dict], dims: dict[str, DataFrame] | None = None
              ) -> list[Rule]:
    """Build rules from a JSON-shaped spec — the config-driven face of
    the rule algebra (the reference reads custom check expectations from
    a TOML file, custom_checks.rs; here a spec document validates any
    table). Each entry: {"kind": ..., "col": ..., optional "name",
    kind-specific params}. foreign_key entries name their dimension via
    "dim"; the caller supplies loaded DataFrames in `dims`.

        [{"kind": "not_null", "col": "user_id"},
         {"kind": "in_range", "col": "value", "lo": 0, "hi": 400},
         {"kind": "is_in", "col": "etype", "values": ["a", "b"]},
         {"kind": "matches", "col": "email", "pattern": ".+@.+"},
         {"kind": "check_expr", "name": "amt_pos", "expr": "amount > 0"},
         {"kind": "unique", "col": "event_id"},
         {"kind": "foreign_key", "col": "user_id",
          "dim": "customer", "dim_col": "c_custkey"}]
    """
    out: list[Rule] = []
    for i, e in enumerate(spec):
        kind = e.get("kind")
        name = e.get("name")
        col = e.get("col", "")
        if kind == "not_null":
            out.append(not_null(col, name))
        elif kind == "in_range":
            out.append(in_range(col, e["lo"], e["hi"], name))
        elif kind == "matches":
            out.append(matches(col, e["pattern"], name))
        elif kind == "is_in":
            out.append(is_in(col, e["values"], name))
        elif kind == "check_expr":
            out.append(check_expr(e["expr"], name or f"check_{i}", col))
        elif kind == "unique":
            out.append(unique(col, name))
        elif kind == "foreign_key":
            if not dims or e["dim"] not in dims:
                raise ValueError(
                    f"spec[{i}]: foreign_key needs dims[{e['dim']!r}]")
            out.append(foreign_key(col, dims[e["dim"]], e["dim_col"], name))
        else:
            raise ValueError(f"spec[{i}]: unknown rule kind {kind!r}")
    return out
