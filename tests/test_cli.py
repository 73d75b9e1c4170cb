"""CLI surface tests (in-process main(); exit codes are the contract —
the reference exits non-zero on validation errors)."""

import json

import pytest

from fastpasta_spark.cli import main
from fastpasta_spark.sources.synth import CorpusConfig, corpus_df, media_df


@pytest.fixture(scope="module")
def fixture_paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    cfg = CorpusConfig(n_docs=150, corrupt_per_mille=150, dup_per_mille=20)
    corpus_df(spark, cfg).write.parquet(str(base / "docs"))
    media_df(spark, cfg).write.parquet(str(base / "media"))
    corpus_df(spark, CorpusConfig(n_docs=80)).write.parquet(str(base / "clean"))
    return base


def test_check_all_exit_codes_and_stats(fixture_paths, capsys):
    stats = str(fixture_paths / "stats.json")
    rc = main(["check", "all", str(fixture_paths / "docs"),
               "--media", str(fixture_paths / "media"),
               "--output-stats", stats])
    assert rc == 2  # violations found
    out = capsys.readouterr().out
    assert "[E" in out and "total_errors" in out
    with open(stats) as f:
        assert json.load(f)["total_errors"] > 0

    # golden round-trip: same run vs its own stats -> all fields match
    rc = main(["check", "all", str(fixture_paths / "docs"),
               "--media", str(fixture_paths / "media"),
               "--input-stats-file", stats])
    assert rc == 2  # still has violations, but...
    assert "golden stats: all fields match" in capsys.readouterr().out


def test_check_all_clean_exit_zero(fixture_paths):
    rc = main(["check", "all", str(fixture_paths / "clean")])
    assert rc == 0


def test_check_sanity(fixture_paths, capsys):
    rc = main(["check", "sanity", str(fixture_paths / "docs")])
    assert rc == 2
    assert "total errors:" in capsys.readouterr().out


def test_views(fixture_paths, capsys):
    assert main(["view", "docs", str(fixture_paths / "docs"), "-n", "3"]) == 0
    assert "n_spans" in capsys.readouterr().out
    assert main(["view", "frames", str(fixture_paths / "docs"), "-n", "3"]) == 0
    assert "describe" in capsys.readouterr().out


def test_filter_passthrough(fixture_paths, spark, capsys):
    out = str(fixture_paths / "filtered")
    rc = main(["filter", str(fixture_paths / "docs"), "--kind", "media",
               "-o", out])
    assert rc == 0
    kept = spark.read.parquet(out)
    from pyspark.sql import functions as F

    n_with_media = kept.filter(
        F.expr("exists(spans, s -> s.kind = 'media')")).count()
    assert kept.count() == n_with_media > 0


def test_resumable_via_cli(fixture_paths, capsys):
    ckpt = str(fixture_paths / "ckpt")
    rc = main(["check", "all", str(fixture_paths / "docs"),
               "--media", str(fixture_paths / "media"),
               "--checkpoint", ckpt])
    assert rc == 2
    assert "run_id=" in capsys.readouterr().out


def test_lineage_inspect_cli(fixture_paths, capsys):
    ckpt = str(fixture_paths / "ckpt_inspect")
    assert main(["check", "all", str(fixture_paths / "docs"),
                 "--media", str(fixture_paths / "media"),
                 "--checkpoint", ckpt]) == 2
    capsys.readouterr()
    rc = main(["lineage", ckpt, "--buckets"])
    out = capsys.readouterr().out
    assert rc == 0
    # 153 = 150 docs + 3 dup_per_mille duplicate rows
    assert "runs=1" in out and "docs_validated=153" in out
    # per-code breakdown present (corrupt fixture always trips E110)
    assert "E110" in out
    # --buckets prints the per-bucket table
    assert "check_counts" in out

    with pytest.raises(SystemExit, match="no lineage table"):
        main(["lineage", str(fixture_paths / "nonexistent_ckpt")])


def test_lineage_inspect_pre_check_counts_checkpoint(
        spark, tmp_path, capsys):
    """Checkpoints written before the check_counts column existed must
    inspect cleanly (no code breakdown, no error)."""
    ckpt = tmp_path / "old_ckpt"
    spark.createDataFrame(
        [("r1", 0, 10, 2, "DONE"), ("r1", 1, 12, 0, "DONE")],
        "run_id string, bucket int, docs_seen long, violations long, "
        "verdict string",
    ).write.parquet(str(ckpt / "lineage"))
    rc = main(["lineage", str(ckpt)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "buckets_done=2" in out and "violations=2" in out
    assert "E" not in out.split("\n")[0] and "  E" not in out


def test_lineage_inspect_mixed_schema_checkpoint(spark, tmp_path, capsys):
    """A checkpoint started pre-check_counts and RESUMED by new code
    holds mixed-schema part files; mergeSchema must keep both the old
    rows (NULL map -> counted, no breakdown) and the new rows' code
    breakdown instead of letting one sampled footer win."""
    ckpt = tmp_path / "mixed_ckpt"
    path = str(ckpt / "lineage")
    spark.createDataFrame(
        [("old", 0, 10, 2, "DONE")],
        "run_id string, bucket int, docs_seen long, violations long, "
        "verdict string",
    ).write.mode("append").parquet(path)
    spark.createDataFrame(
        [("new", 1, 5, 3, {"E70": 3}, "DONE")],
        "run_id string, bucket int, docs_seen long, violations long, "
        "check_counts map<string,bigint>, verdict string",
    ).write.mode("append").parquet(path)
    rc = main(["lineage", str(ckpt), "--buckets"])
    out = capsys.readouterr().out
    assert rc == 0
    # both files' rows survive the merged read
    assert "buckets_done=2" in out and "docs_validated=15" in out
    assert "violations=5" in out
    # the new file's breakdown is present; the old row contributes none
    assert "E70      3" in out
    # per-bucket table shows both rows
    assert "old" in out and "new" in out


def test_code_filter_flag(fixture_paths, capsys):
    # -w restricts the DISPLAYED errors to the given codes (prefix
    # optional, like the reference's --show-only-errors-with-codes)
    rc = main(["check", "all", str(fixture_paths / "docs"),
               "--media", str(fixture_paths / "media"),
               "-w", "70"])
    assert rc == 2
    out = capsys.readouterr().out
    shown = [ln for ln in out.splitlines() if ": [E" in ln]
    assert shown and all("[E70]" in ln for ln in shown)


def test_stats_toml_roundtrip(fixture_paths, capsys):
    stats = str(fixture_paths / "stats.toml")
    rc = main(["check", "all", str(fixture_paths / "docs"),
               "--media", str(fixture_paths / "media"),
               "--output-stats", stats])
    assert rc == 2
    import tomllib
    with open(stats, "rb") as f:
        assert tomllib.load(f)["total_errors"] > 0
    rc = main(["check", "all", str(fixture_paths / "docs"),
               "--media", str(fixture_paths / "media"),
               "--input-stats-file", stats])
    assert "golden stats: all fields match" in capsys.readouterr().out


def test_curate_cli(spark, tmp_path, capsys):
    rows = [(1, "the quick brown fox jumps over the lazy dog and it is "
                "a fine day for running checks in the data pipeline")] * 3
    docs = spark.createDataFrame(
        [(i + 1, t) for i, (_, t) in enumerate(rows)] + [(9, "!!!")],
        "doc_id long, text string")
    src = str(tmp_path / "flat")
    out = str(tmp_path / "curated")
    docs.write.parquet(src)
    rc = main(["curate", src, "-o", out, "--min-quality", "0.5"])
    assert rc == 0
    assert "kept=1" in capsys.readouterr().out
    kept = spark.read.parquet(out)
    assert kept.count() == 1 and kept.first()["doc_id"] == 1


def test_passed_out_quarantine(fixture_paths, spark, tmp_path):
    out = str(tmp_path / "passed")
    rc = main(["check", "all", str(fixture_paths / "docs"),
               "--media", str(fixture_paths / "media"),
               "--passed-out", out])
    assert rc == 2
    kept = spark.read.parquet(out)
    n_all = spark.read.parquet(str(fixture_paths / "docs")).count()
    assert 0 < kept.count() < n_all
    # a second check over the kept docs is clean (no media table ->
    # referential skipped, matching what PASS asserted)
    rc2 = main(["check", "all", out, "--media", str(fixture_paths / "media")])
    assert rc2 == 0


def test_sanity_w_filter_is_display_only(spark, tmp_path, capsys):
    # docs whose only sanity violations are E71 (empty text)
    docs = spark.createDataFrame(
        [("d1", [("text", "", "", 0)]), ("d2", [("text", "ok", "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    p = str(tmp_path / "docs")
    docs.write.parquet(p)
    # -w for a code that never fires: display empty, but total/exit
    # still reflect the real violations (and lowercase codes match)
    rc = main(["check", "sanity", p, "-w", "e13"])
    out = capsys.readouterr().out
    assert rc == 2
    assert "total errors: 1" in out
    assert ": [E" not in out  # nothing displayed
    rc = main(["check", "sanity", p, "-w", "e71"])
    out = capsys.readouterr().out
    assert rc == 2 and "[E71]" in out  # lowercase -w matches


def test_check_table_spec(spark, tmp_path, capsys):
    import json

    from fastpasta_spark.cli import main

    spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (2, 20.0)], "id long, amount double"
    ).write.mode("overwrite").parquet(str(tmp_path / "t"))
    spark.createDataFrame([(1,), (2,)], "k long").write.mode(
        "overwrite").parquet(str(tmp_path / "d"))
    spec = [
        {"kind": "in_range", "col": "amount", "lo": 0.0, "hi": 100.0},
        {"kind": "unique", "col": "id"},
        {"kind": "foreign_key", "col": "id", "dim": "d", "dim_col": "k"},
    ]
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps(spec))

    rc = main(["check", "table", str(tmp_path / "t"),
               "--spec", str(spec_path), "--dim", f"d={tmp_path / 'd'}"])
    out = capsys.readouterr().out
    assert rc == 2
    assert "range_amount: 1" in out and "unique_id: 2" in out
    assert "fk_id: 0" in out and "total violations: 3" in out


def test_check_table_clean_exit_zero(spark, tmp_path, capsys):
    import json

    from fastpasta_spark.cli import main

    spark.createDataFrame([(1,)], "id long").write.mode(
        "overwrite").parquet(str(tmp_path / "t"))
    spec_path = tmp_path / "spec.json"
    spec_path.write_text(json.dumps([{"kind": "not_null", "col": "id"}]))
    rc = main(["check", "table", str(tmp_path / "t"), "--spec", str(spec_path)])
    assert rc == 0
    assert "total violations: 0" in capsys.readouterr().out


def test_exit_code_matrix(fixture_paths, tmp_path, capsys):
    # full 0/2/3 contract: 0 = clean, 2 = violations, 3 = golden-stats
    # mismatch (and 3 takes precedence over 2, matching the reference's
    # stats-regression gate being the stronger failure)
    clean, docs = str(fixture_paths / "clean"), str(fixture_paths / "docs")
    media = str(fixture_paths / "media")
    g_clean = str(tmp_path / "g_clean.json")
    g_docs = str(tmp_path / "g_docs.json")
    assert main(["check", "all", clean, "--output-stats", g_clean]) == 0
    assert main(["check", "all", docs, "--media", media,
                 "--output-stats", g_docs]) == 2
    # matching golden keeps each path's own code
    assert main(["check", "all", clean, "--input-stats-file", g_clean]) == 0
    assert main(["check", "all", docs, "--media", media,
                 "--input-stats-file", g_docs]) == 2
    # foreign golden -> 3 on both clean and corrupt inputs
    assert main(["check", "all", clean, "--input-stats-file", g_docs]) == 3
    assert main(["check", "all", docs, "--media", media,
                 "--input-stats-file", g_clean]) == 3
    out = capsys.readouterr().out
    assert "E130" in out  # golden mismatch rows are printed


def test_drift_cli(fixture_paths, spark, tmp_path, capsys):
    # same corpus vs itself: stable, exit 0
    rc = main(["drift", str(fixture_paths / "docs"),
               str(fixture_paths / "docs")])
    assert rc == 0
    assert "verdict: stable" in capsys.readouterr().out

    # heavily corrupted vs clean: kind mix shifts -> exit 4
    cfg = CorpusConfig(n_docs=150, corrupt_per_mille=700)
    corpus_df(spark, cfg).write.parquet(str(tmp_path / "hot"))
    rc = main(["drift", str(fixture_paths / "clean"), str(tmp_path / "hot"),
               "--chi2-threshold", "5", "--psi-threshold", "0.01"])
    assert rc == 4
    out = capsys.readouterr().out
    assert "verdict: DRIFT" in out and "psi" in out


def test_sample_cli(spark, tmp_path, capsys):
    import pyspark.sql.functions as F

    spark.range(3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
    ).write.parquet(str(tmp_path / "tbl"))

    rc = main(["sample", str(tmp_path / "tbl"), "-o",
               str(tmp_path / "rate_out"), "--rate", "0.2", "--seed", "7"])
    assert rc == 0
    n = spark.read.parquet(str(tmp_path / "rate_out")).count()
    assert abs(n / 3000 - 0.2) < 0.05

    rc = main(["sample", str(tmp_path / "tbl"), "-o",
               str(tmp_path / "k_out"), "-k", "50", "--stratum", "src"])
    assert rc == 0
    got = spark.read.parquet(str(tmp_path / "k_out"))
    assert got.count() == 150
    assert got.groupBy("src").count().filter("count <> 50").count() == 0

    # flag validation fails fast, before Spark work
    with pytest.raises(SystemExit):
        main(["sample", str(tmp_path / "tbl"), "-o", "x", "-k", "5"])
    with pytest.raises(SystemExit):
        main(["sample", str(tmp_path / "tbl"), "-o", "x", "--rate", "1.5"])
    with pytest.raises(SystemExit, match="positive"):
        main(["sample", str(tmp_path / "tbl"), "-o", "x", "-k", "0",
              "--stratum", "src"])
    # --stratum with --rate must be rejected, never silently ignored
    with pytest.raises(SystemExit, match="stratum requires -k"):
        main(["sample", str(tmp_path / "tbl"), "-o", "x", "--rate", "0.2",
              "--stratum", "src"])


def test_docs_loader_accepts_empty_dir(spark, tmp_path, capsys):
    """A part-file-less output dir (empty upstream stage) is a valid
    empty corpus: check must exit 0, not die in schema inference."""
    empty = tmp_path / "empty"
    empty.mkdir()
    (empty / "_SUCCESS").touch()
    assert main(["check", "all", str(empty)]) == 0
    assert "total_errors" in capsys.readouterr().out


def test_docs_loader_rejects_flat_table(spark, tmp_path):
    """A non-docs-model parquet must fail fast, not silently validate
    as all-NULL spans (forced schemas null out missing columns)."""
    spark.range(5).selectExpr("id AS doc_id", "'x' AS text").write.parquet(
        str(tmp_path / "flat"))
    with pytest.raises(SystemExit, match="not a docs-model"):
        main(["check", "all", str(tmp_path / "flat")])
    with pytest.raises(SystemExit, match="not a docs-model"):
        main(["drift", str(tmp_path / "flat"), str(tmp_path / "flat")])


def test_score_cli_all_signals(spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "hash join hash window merge scan", "en"),
         (2, "the quick brown fox jumps over the lazy dog", "en"),
         (3, "scan filter only", "de"),
         (4, None, None)],
        "doc_id long, text string, lang string")
    src = str(tmp_path / "flat")
    out = str(tmp_path / "scored")
    docs.write.parquet(src)
    rc = main(["score", src, "-o", out,
               "--signals", "quality", "lm", "bm25", "dsir",
               "--terms", "hash", "merge",
               "--target", "lang = 'en'", "--dsir-buckets", "16"])
    assert rc == 0
    assert "quality, lm, bm25, dsir" in capsys.readouterr().out
    got = {r.doc_id: r.asDict() for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert set(got[1]) == {"doc_id", "n_tokens", "quality", "avg_logprob",
                           "bm25", "dsir_logratio"}
    # doc 1 matches both terms; docs 2/3 match none -> NULL bm25
    assert got[1]["bm25"] is not None
    assert got[2]["bm25"] is None and got[3]["bm25"] is None
    # null text: 0 tokens, NULL lm/dsir, quality 0
    assert got[4]["n_tokens"] == 0 and got[4]["avg_logprob"] is None
    assert got[4]["dsir_logratio"] is None and got[4]["quality"] == 0.0
    # oracle spot-check against the operator twins already pytest-pinned
    from fastpasta_spark.operators.textstats import bm25_scores

    direct = {r.doc_id: r.bm25
              for r in bm25_scores(docs, ["hash", "merge"]).collect()}
    assert got[1]["bm25"] == direct[1]


def test_score_cli_flag_validation(spark, tmp_path):
    src = str(tmp_path / "flat2")
    spark.createDataFrame([(1, "x")], "doc_id long, text string") \
        .write.parquet(src)
    with pytest.raises(SystemExit, match="bm25 requires --terms"):
        main(["score", src, "-o", "/tmp/x", "--signals", "bm25"])
    with pytest.raises(SystemExit, match="only applies to --signals bm25"):
        main(["score", src, "-o", "/tmp/x", "--signals", "quality",
              "--terms", "hash"])
    with pytest.raises(SystemExit, match="dsir requires --target"):
        main(["score", src, "-o", "/tmp/x", "--signals", "dsir"])
    with pytest.raises(SystemExit, match="only applies to --signals dsir"):
        main(["score", src, "-o", "/tmp/x", "--signals", "quality",
              "--target", "lang = 'en'"])
    # missing required columns fails fast
    flat = str(tmp_path / "noid")
    spark.createDataFrame([("x",)], "text string").write.parquet(flat)
    with pytest.raises(SystemExit, match="score needs"):
        main(["score", flat, "-o", "/tmp/x", "--signals", "quality"])


def test_score_cli_no_join_semantics(spark, tmp_path, capsys):
    """Signals are appended row-wise in one pass — duplicate and NULL
    doc_ids must neither fan out (equi-join multiplication) nor lose
    their computable signals (NULL != NULL join key)."""
    docs = spark.createDataFrame(
        [(7, "hash join hash", "en"), (7, "scan only", "de"),
         (None, "the quick brown fox jumps over it", "en")],
        "doc_id long, text string, lang string")
    src = str(tmp_path / "dups")
    out = str(tmp_path / "dups_scored")
    docs.write.parquet(src)
    rc = main(["score", src, "-o", out,
               "--signals", "quality", "lm", "bm25", "dsir",
               "--terms", "hash", "--target", "lang = 'en'",
               "--dsir-buckets", "16"])
    assert rc == 0
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # no fan-out
    null_row = [r for r in rows if r.doc_id is None][0]
    assert null_row.quality is not None and null_row.avg_logprob is not None
    assert null_row.dsir_logratio is not None
    sevens = sorted((r for r in rows if r.doc_id == 7),
                    key=lambda r: r.n_tokens)
    assert sevens[0].bm25 is None      # "scan only": no term
    assert sevens[1].bm25 is not None  # "hash join hash"


def test_score_cli_pre_spark_validation(spark, tmp_path):
    src = str(tmp_path / "flat3")
    spark.createDataFrame([(1, "x")], "doc_id long, text string") \
        .write.parquet(src)
    with pytest.raises(SystemExit, match="only applies to --signals dsir"):
        main(["score", src, "-o", "/tmp/x", "--signals", "quality",
              "--dsir-buckets", "64"])
    with pytest.raises(SystemExit, match="only applies to --signals lm"):
        main(["score", src, "-o", "/tmp/x", "--signals", "quality",
              "--vocab-k", "50"])
    # operator-level constraints surface pre-Spark as clean exits
    with pytest.raises(SystemExit, match="must be distinct"):
        main(["score", src, "-o", "/tmp/x", "--signals", "bm25",
              "--terms", "hash", "hash"])
    with pytest.raises(SystemExit, match="SQL-literal"):
        main(["score", src, "-o", "/tmp/x", "--signals", "bm25",
              "--terms", "O'Neill"])
    with pytest.raises(SystemExit, match=r"buckets must be in"):
        main(["score", src, "-o", "/tmp/x", "--signals", "dsir",
              "--target", "lang = 'en'", "--dsir-buckets", "1"])
    with pytest.raises(SystemExit, match="vocab-k"):
        main(["score", src, "-o", "/tmp/x", "--signals", "lm",
              "--vocab-k", "0"])


def test_dedup_cli_modes(spark, tmp_path, capsys):
    shared = "a b c d e f g h i j k l m n o p q r s t"
    docs = spark.createDataFrame(
        [(1, shared), (2, shared),                     # exact pair
         (3, f"{shared} extra tail tokens here"),      # near + span overlap
         (4, "completely different text with nothing shared at all")],
        "doc_id long, text string")
    src = str(tmp_path / "flat")
    docs.write.parquet(src)

    out_e = str(tmp_path / "exact")
    assert main(["dedup", src, "-o", out_e]) == 0
    groups = spark.read.parquet(out_e).collect()
    assert len(groups) == 1 and groups[0].dup_count == 2
    assert sorted(groups[0].doc_ids) == [1, 2]

    out_n = str(tmp_path / "near")
    assert main(["dedup", src, "-o", out_n, "--mode", "near",
                 "--threshold", "0.5"]) == 0
    pairs = {(r.doc_a, r.doc_b)
             for r in spark.read.parquet(out_n).collect()}
    assert (1, 2) in pairs and not any(4 in p for p in pairs)

    out_s = str(tmp_path / "spans")
    assert main(["dedup", src, "-o", out_s, "--mode", "spans",
                 "--span-tokens", "10"]) == 0
    spans = {r.doc_id: (r.span_start, r.span_end)
             for r in spark.read.parquet(out_s).collect()}
    # the shared 20-token prefix is a full span in docs 1-3, nothing in 4
    assert set(spans) == {1, 2, 3} and spans[1] == (0, 19)


def test_dedup_cli_flag_validation(spark, tmp_path):
    src = str(tmp_path / "flat4")
    spark.createDataFrame([(1, "x")], "doc_id long, text string") \
        .write.parquet(src)
    with pytest.raises(SystemExit, match="only applies to --mode near"):
        main(["dedup", src, "-o", "/tmp/x", "--threshold", "0.5"])
    with pytest.raises(SystemExit, match="only applies to --mode spans"):
        main(["dedup", src, "-o", "/tmp/x", "--mode", "near",
              "--span-tokens", "10"])
    with pytest.raises(SystemExit, match="threshold must be in"):
        main(["dedup", src, "-o", "/tmp/x", "--mode", "near",
              "--threshold", "1.5"])
    with pytest.raises(SystemExit, match="span-tokens must be >= 2"):
        main(["dedup", src, "-o", "/tmp/x", "--mode", "spans",
              "--span-tokens", "1"])
    flat = str(tmp_path / "noid2")
    spark.createDataFrame([("x",)], "text string").write.parquet(flat)
    with pytest.raises(SystemExit, match="dedup needs"):
        main(["dedup", flat, "-o", "/tmp/x"])


def test_score_cli_ref_corpus(spark, tmp_path, capsys):
    """--ref fits the models on the reference slice; scoring the input
    with a ref-fitted lm model must differ from self-fitted when the
    distributions differ, and agree when ref == input."""
    ref_docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)],
        "doc_id long, text string")
    in_docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "omega psi")],
        "doc_id long, text string")
    src, refp = str(tmp_path / "in"), str(tmp_path / "ref")
    in_docs.write.parquet(src)
    ref_docs.write.parquet(refp)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    assert main(["score", src, "-o", out1, "--signals", "lm",
                 "--ref", refp]) == 0
    assert main(["score", src, "-o", out2, "--signals", "lm"]) == 0
    r1 = {r.doc_id: r.avg_logprob for r in spark.read.parquet(out1).collect()}
    r2 = {r.doc_id: r.avg_logprob for r in spark.read.parquet(out2).collect()}
    # under the ref model, in-vocab doc 1 scores higher than OOV doc 2
    assert r1[1] > r1[2]
    # and the ref-fitted model differs from the self-fitted one
    assert r1 != r2
    # a ref without text fails fast
    spark.range(3).write.parquet(str(tmp_path / "notext"))
    with pytest.raises(SystemExit, match="--ref needs a text column"):
        main(["score", src, "-o", "/tmp/x", "--signals", "lm",
              "--ref", str(tmp_path / "notext")])


def test_curate_cli_fitted_signals(spark, tmp_path, capsys):
    good = ("the quick brown fox jumps over the lazy dog and it is "
            "a fine day for running checks in the data pipeline")
    gib = ("zzq wvx qqj xxv zzk wwq vvx qqz kkx wwj zzv xxq jjw kkq "
           "vvz wwx qqk jjx zzw vvq zqz wxw qjq vxv kzk qwq xvx zqq "
           "xkk jww vzz qxx wjj qkk zvv xww kqq xjj wzz qvv")
    docs = spark.createDataFrame(
        [(1, good), (2, good.replace("dog", "cat")), (3, gib)],
        "doc_id long, text string")
    src = str(tmp_path / "flat")
    out = str(tmp_path / "curated")
    docs.write.parquet(src)
    # fit lm on the corpus; gate drops the OOV-dense gibberish doc and
    # the kept output carries the fitted score column
    rc = main(["curate", src, "-o", out, "--min-quality", "0.0",
               "--jaccard-threshold", "0.99",
               "--signals", "lm", "--min-score", "avg_logprob=-4.2",
               "--rank-by", "avg_logprob", "--token-budget", "100000"])
    assert rc == 0
    kept = spark.read.parquet(out)
    assert "avg_logprob" in kept.columns
    ids = {r["doc_id"] for r in kept.collect()}
    assert 3 not in ids and ids <= {1, 2}


def test_curate_cli_signal_flag_validation(spark, tmp_path):
    src = str(tmp_path / "flat")
    spark.createDataFrame([(1, "x")], "doc_id long, text string") \
        .write.parquet(src)
    # model flags without --signals fail BEFORE Spark
    with pytest.raises(SystemExit, match="--terms requires --signals"):
        main(["curate", src, "-o", "/dev/null", "--terms", "x"])
    with pytest.raises(SystemExit, match="--min-score wants COL=MIN"):
        main(["curate", src, "-o", "/dev/null", "--min-score", "nope"])
    with pytest.raises(SystemExit, match="MIN must be a number"):
        main(["curate", src, "-o", "/dev/null", "--min-score", "quality=x"])
    with pytest.raises(SystemExit, match="not available"):
        main(["curate", src, "-o", "/dev/null",
              "--min-score", "avg_logprob=-5"])  # lm signal not requested
    with pytest.raises(SystemExit, match="not available"):
        main(["curate", src, "-o", "/dev/null", "--token-budget", "10",
              "--rank-by", "bm25"])
    with pytest.raises(SystemExit, match="requires --token-budget"):
        main(["curate", src, "-o", "/dev/null", "--rank-by", "quality"])


def test_sample_cli_importance_resample(spark, tmp_path, capsys):
    import math

    rows = [(i, math.log(9.0) if i % 2 == 0 else 0.0) for i in range(400)]
    src = str(tmp_path / "weighted")
    out = str(tmp_path / "resampled")
    spark.createDataFrame(rows, "doc_id long, w double").write.parquet(src)
    rc = main(["sample", src, "-o", out, "-k", "60", "--weight-col", "w",
               "--seed", "2"])
    assert rc == 0
    got = spark.read.parquet(out).collect()
    assert len(got) == 60
    share_heavy = sum(r["doc_id"] % 2 == 0 for r in got) / 60
    assert share_heavy > 0.7  # 9x weights dominate the draw


def test_sample_cli_weight_flag_validation(spark, tmp_path):
    src = str(tmp_path / "w2")
    spark.createDataFrame([(1, 0.0)], "doc_id long, w double") \
        .write.parquet(src)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        main(["sample", src, "-o", "/dev/null", "-k", "5",
              "--stratum", "w", "--weight-col", "w"])
    with pytest.raises(SystemExit, match="--weight-col requires -k"):
        main(["sample", src, "-o", "/dev/null", "--rate", "0.5",
              "--weight-col", "w"])
    with pytest.raises(SystemExit, match="temperature"):
        main(["sample", src, "-o", "/dev/null", "-k", "5",
              "--weight-col", "w", "--temperature", "0"])
    with pytest.raises(SystemExit, match="not in"):
        main(["sample", src, "-o", "/dev/null", "-k", "5",
              "--weight-col", "nope"])


def test_lineage_inspect_dedups_racing_done_rows(spark, tmp_path, capsys):
    """Two runs racing the same checkpoint can both append a DONE row
    for a bucket; totals must count each bucket ONCE (the last run_id)
    instead of double-counting docs/violations while buckets_done
    dedups."""
    ckpt = tmp_path / "race_ckpt"
    spark.createDataFrame(
        [("run_a", 0, 10, 2, {"E70": 2}, "DONE"),
         ("run_b", 0, 10, 3, {"E70": 3}, "DONE"),   # same bucket, raced
         ("run_b", 1, 5, 1, {"E10": 1}, "DONE")],
        "run_id string, bucket int, docs_seen long, violations long, "
        "check_counts map<string,bigint>, verdict string",
    ).write.parquet(str(ckpt / "lineage"))
    rc = main(["lineage", str(ckpt)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "duplicate DONE row(s)" in out
    # bucket 0 counted once, via run_b (lexicographically last)
    assert "buckets_done=2" in out and "docs_validated=15" in out
    assert "violations=4" in out
    assert "E70      3" in out and "E10      1" in out


def test_sample_cli_temperature_requires_weight_col(spark, tmp_path):
    src = str(tmp_path / "w3")
    spark.createDataFrame([(1, "a", 0.0)], "doc_id long, lang string, w double") \
        .write.parquet(src)
    with pytest.raises(SystemExit, match="requires --weight-col"):
        main(["sample", src, "-o", "/dev/null", "-k", "5",
              "--stratum", "lang", "--temperature", "2.0"])


def test_shard_cli(spark, tmp_path, capsys):
    src = str(tmp_path / "flat_shard")
    out = str(tmp_path / "sharded")
    spark.createDataFrame([(i, f"doc {i}") for i in range(100)],
                          "doc_id long, text string").write.parquet(src)
    rc = main(["shard", src, "-o", out, "-n", "4", "--seed", "2"])
    assert rc == 0
    assert "100 rows into 4 shards" in capsys.readouterr().out
    from fastpasta_spark.functions.hashing import py_md5_hash

    got = {r.doc_id: r.shard for r in spark.read.parquet(out).collect()}
    assert got == {i: py_md5_hash(str(i), seed=2) % 4 for i in range(100)}
    with pytest.raises(SystemExit, match="-n must be positive"):
        main(["shard", src, "-o", out, "-n", "0"])


def test_rebalance_cli(spark, tmp_path, capsys):
    big = "the quick brown fox jumps over the lazy dog again and again"
    rows = ([(i, "en", big) for i in range(180)]
            + [(500 + i, "de", "der fuchs springt") for i in range(20)])
    src = str(tmp_path / "mix")
    out = str(tmp_path / "rebalanced")
    spark.createDataFrame(rows, "doc_id long, lang string, text string") \
        .write.parquet(src)
    rc = main(["rebalance", src, "-o", out, "--stratum", "lang",
               "--temperature", "0.5", "--seed", "3"])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "keep_rate" in txt and "kept " in txt
    got = spark.read.parquet(out).collect()
    n_en = sum(r.lang == "en" for r in got)
    n_de = len(got) - n_en
    assert n_de == 20                        # tail keeps everything
    assert n_en < 180                        # head downsampled
    with pytest.raises(SystemExit, match="temperature"):
        main(["rebalance", src, "-o", out, "--stratum", "lang",
              "--temperature", "1.5"])
    with pytest.raises(SystemExit, match="not in"):
        main(["rebalance", src, "-o", out, "--stratum", "nope"])


def test_decontam_cli_report_and_excise(spark, tmp_path, capsys):
    eval_q = "what is the capital of france and when was it founded"
    rows = [(1, f"prefix text {eval_q} suffix text"),
            (2, "totally clean document with unrelated ordinary words")]
    src = str(tmp_path / "corpus")
    bsrc = str(tmp_path / "bench")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    spark.createDataFrame([(9, eval_q)], "bench_id long, text string") \
        .write.parquet(bsrc)
    rep = str(tmp_path / "report")
    rc = main(["decontam", src, "--bench", bsrc, "-o", rep,
               "--ngram", "5", "--min-overlap", "2"])
    assert rc == 0
    assert "contaminated (doc, bench) pairs" in capsys.readouterr().out
    assert {r.doc_id for r in spark.read.parquet(rep).collect()} == {1}
    exc = str(tmp_path / "excised")
    rc = main(["decontam", src, "--bench", bsrc, "-o", exc,
               "--mode", "excise", "--ngram", "5"])
    assert rc == 0
    assert "1 had leaked spans" in capsys.readouterr().out
    got = {r.doc_id: r for r in spark.read.parquet(exc).collect()}
    assert "capital" not in got[1].clean_text
    assert got[2].n_cut_spans == 0
    with pytest.raises(SystemExit, match="only applies to --mode report"):
        main(["decontam", src, "--bench", bsrc, "-o", exc,
              "--mode", "excise", "--min-overlap", "3"])
    with pytest.raises(SystemExit, match="--ngram"):
        main(["decontam", src, "--bench", bsrc, "-o", exc, "--ngram", "1"])
    with pytest.raises(SystemExit, match="missing columns"):
        main(["decontam", src, "--bench", src, "-o", exc])


def test_score_and_curate_gopher_signal(spark, tmp_path, capsys):
    good = ("the data pipeline will be checked to make sure that we have "
            "a long enough document with plenty of ordinary words in it "
            "and that none of the gopher rules fire on it at all because "
            "it is just plain english prose written for this test case "
            "with more than fifty words of reasonable average length okay")
    rows = [(1, good), (2, "short doc")]
    src = str(tmp_path / "gsrc")
    out = str(tmp_path / "gscored")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    rc = main(["score", src, "-o", out, "--signals", "gopher"])
    assert rc == 0
    got = {r.doc_id: r.gopher_pass
           for r in spark.read.parquet(out).collect()}
    assert got == {1: 1, 2: 0}              # INT 0/1, min_scores-gateable
    out2 = str(tmp_path / "gcurated")
    rc = main(["curate", src, "-o", out2, "--min-quality", "0.0",
               "--signals", "gopher", "--min-score", "gopher_pass=1"])
    assert rc == 0
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == {1}
