"""column_profile: generic per-column stats in one aggregation pass."""

import duckdb
import pytest
from pyspark.sql import functions as F

from fastpasta_spark.operators.colprofile import (
    column_profile, duckdb_profile_sql)


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "alpha", 2.5), (2, None, 0.0), (3, "bee", None),
         (4, "alpha", -1.25), (5, "", 4.0)],
        "id bigint, name string, score double",
    )


def test_values_exact(small):
    rows = {r["col_name"]: r for r in
            column_profile(small, exact_distinct=True).collect()}
    assert set(rows) == {"id", "name", "score"}

    rid = rows["id"]
    assert (rid["n_rows"], rid["n_nulls"], rid["n_distinct"]) == (5, 0, 5)
    assert (rid["min_num"], rid["max_num"], rid["avg_num"]) == (1.0, 5.0, 3.0)
    assert rid["null_rate"] == 0.0
    assert rid["dtype"] == "bigint"

    rname = rows["name"]  # strings profile their LENGTH
    assert (rname["n_nulls"], rname["n_distinct"]) == (1, 3)
    assert (rname["min_num"], rname["max_num"]) == (0.0, 5.0)
    assert rname["null_rate"] == 0.2

    rscore = rows["score"]
    assert (rscore["min_num"], rscore["max_num"]) == (-1.25, 4.0)
    assert rscore["avg_num"] == pytest.approx(5.25 / 4, abs=1e-4)


def test_column_subset_and_order(small):
    out = column_profile(small, columns=["score", "id"],
                         exact_distinct=True).collect()
    assert {r["col_name"] for r in out} == {"id", "score"}


def test_empty_df_no_ansi_divide(spark):
    df = spark.createDataFrame([], "id bigint, name string")
    rows = column_profile(df, exact_distinct=True).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_rows"] == 0 and r["null_rate"] == 0.0
        assert r["min_num"] is None and r["avg_num"] is None


def test_hll_close_to_exact(spark):
    df = spark.range(0, 20_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").cast("string").alias("s"))
    rows = {r["col_name"]: r for r in column_profile(df).collect()}
    assert rows["k"]["n_distinct"] == pytest.approx(1000, rel=0.05)
    assert rows["s"]["n_distinct"] == pytest.approx(20_000, rel=0.05)


def test_complex_type_has_no_numeric_face(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])],
                               "id bigint, vec array<double>")
    rows = {r["col_name"]: r for r in
            column_profile(df, exact_distinct=True).collect()}
    v = rows["vec"]
    assert v["n_distinct"] == 1
    assert v["min_num"] is None and v["avg_num"] is None


def test_duckdb_twin_matches(spark, tmp_path):
    """Engine vs DuckDB oracle on the same parquet — exact equality of
    every normalized cell (the driver-gate contract)."""
    df = spark.createDataFrame(
        [(i, None if i % 7 == 0 else "x" * (i % 13)) for i in range(200)],
        "doc_id bigint, text string",
    )
    p = str(tmp_path / "t.parquet")
    df.coalesce(1).write.parquet(p)

    eng = sorted(
        column_profile(spark.read.parquet(p), exact_distinct=True).collect(),
        key=lambda r: r["col_name"])
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM parquet_scan('{p}/*.parquet')")
    sql = duckdb_profile_sql("t", [("doc_id", "bigint"), ("text", "string")])
    ora = sorted(con.execute(sql).fetchall())
    for e, o in zip(eng, ora):
        assert tuple(e) == tuple(o), (tuple(e), tuple(o))


def test_quantiles_exact_known_values(spark):
    from fastpasta_spark.operators.colprofile import numeric_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(101)], "x double")
    got = {r.prob: r.value for r in
           numeric_quantiles(df, ["x"], probs=(0.0, 0.5, 0.95, 1.0),
                             exact=True).collect()}
    assert got == {0.0: 0.0, 0.5: 50.0, 0.95: 95.0, 1.0: 100.0}


def test_quantiles_approx_close_and_one_pass(spark):
    from fastpasta_spark.operators.colprofile import numeric_quantiles

    df = spark.range(0, 10_000).selectExpr("cast(id as double) as x",
                                           "cast(id % 100 as double) as y")
    out = numeric_quantiles(df, ["x", "y"], probs=(0.5, 0.9))
    rows = {(r.col_name, r.prob): r.value for r in out.collect()}
    assert rows[("x", 0.5)] == pytest.approx(5000, rel=0.02)
    assert rows[("y", 0.9)] == pytest.approx(89, abs=2)
    # both columns' sketches live in ONE aggregate — a single scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") <= 1


def test_quantiles_duckdb_twin(spark, tmp_path):
    from fastpasta_spark.operators.colprofile import (
        duckdb_quantiles_sql, numeric_quantiles)

    df = spark.createDataFrame(
        [(i * 1.5 - 3, i % 7) for i in range(500)], "v double, k long")
    p = str(tmp_path / "q.parquet")
    df.coalesce(1).write.parquet(p)
    eng = sorted(numeric_quantiles(spark.read.parquet(p), ["v", "k"],
                                   exact=True).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW q AS SELECT * FROM parquet_scan('{p}/*.parquet')")
    ora = sorted(con.execute(duckdb_quantiles_sql("q", ["v", "k"])).fetchall())
    assert [tuple(r) for r in eng] == ora


def test_hll_does_not_count_null(spark):
    df = spark.createDataFrame([(True,), (False,), (None,), (None,)],
                               "b boolean")
    approx = {r.col_name: r.n_distinct for r in column_profile(df).collect()}
    exact = {r.col_name: r.n_distinct
             for r in column_profile(df, exact_distinct=True).collect()}
    assert approx["b"] == exact["b"] == 2


def test_date_column_profiles_epoch_seconds(spark):
    import datetime

    df = spark.createDataFrame(
        [(datetime.date(1970, 1, 2),), (datetime.date(1970, 1, 3),)],
        "d date")
    r = {x.col_name: x for x in
         column_profile(df, exact_distinct=True).collect()}["d"]
    assert (r.min_num, r.max_num) == (86400.0, 172800.0)
    assert r.n_distinct == 2
