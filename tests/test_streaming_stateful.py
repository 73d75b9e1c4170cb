"""applyInPandasWithState: totals accumulate across micro-batches.

Two input files + maxFilesPerTrigger=1 -> the single availableNow run
executes TWO micro-batches; GroupState must carry totals from the
first into the second (update-mode rows show the running total).
"""

from fastpasta_spark.streaming.stateful import running_violation_totals


def test_running_totals_accumulate(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [("d1", "E70"), ("d2", "E70"), ("d3", "E11")],
        "doc_id string, check_code string",
    )
    b2 = spark.createDataFrame(
        [("d4", "E70"), ("d5", "E100")], "doc_id string, check_code string"
    )
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("doc_id string, check_code string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        running_violation_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.sql("SELECT * FROM totals").collect()
    # at least two micro-batches ran (E70 appears with two totals or a
    # delta smaller than its final total)
    finals = {}
    for r in rows:
        finals[r.check_code] = max(finals.get(r.check_code, 0), r.total)
    assert finals == {"E70": 3, "E11": 1, "E100": 1}
    # cumulative behavior: some update row for E70 has total > batch_delta
    assert any(r.check_code == "E70" and r.total > r.batch_delta for r in rows)
