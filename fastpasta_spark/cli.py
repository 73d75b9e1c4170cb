"""Command-line face of the engine — mirrors the reference's CLI shape
(`/root/reference/fastpasta/src/config.rs:42-197`):

    fastpasta <file> check sanity            -> check sanity <parquet>
    fastpasta <file> check all its           -> check all <parquet>
    fastpasta <file> view rdh                -> view docs <parquet>
    fastpasta <file> view its-readout-frames -> view frames <parquet>
    fastpasta <file> --filter-link 3 -o out  -> filter <parquet> --kind X -o out
    --max-tolerate-errors N                  -> --max-errors N
    --output-stats / --input-stats-file      -> same flags (JSON metrics)

Training-pipeline extensions (north_rule, beyond the reference):

    drift <a> <b>        kind-mix chi-square + PSI, text-length KS
                         (exit 4 on drift past the thresholds)
    sample <in> -o out   deterministic hash-gate --rate, exact -k per
                         --stratum, or exact-k importance resampling
                         (--weight-col, weight-proportional draw)
    score <in> -o out    per-doc curation signals (quality, unigram-LM
                         fluency, BM25 keyword relevance, DSIR
                         importance weight) over a flat table
    dedup <in> -o out    exact content groups, MinHash-LSH near-dup
                         pairs (--mode near), or substring-level
                         duplicate spans (--mode spans)
    decontam <in> --bench b -o out  eval-set contamination: report
                         (doc, bench, overlap) pairs, or --mode excise
                         to cut the leaked n-grams and keep the docs
    rebalance <in> -o out  temperature-flatten a training mix: token
                         shares -> share^T keep rates -> hash gate
    shard <in> -o out    deterministic training shards (path/shard=K/,
                         membership a pure function of id+seed+n)
    lineage <ckpt>       inspect a resumable run's checkpoint: buckets
                         done, docs validated, per-check-code totals

    curate additionally fits scoring signals (--signals/--ref), gates
    on them (--min-score COL=MIN, --gopher) and ranks the token budget
    by any fitted column (--rank-by, with --token-budget).

Run via spark-submit --py-files fastpasta_spark.zip -m, or plain python
(local mode):  python -m fastpasta_spark check all /path/docs.parquet
"""

from __future__ import annotations

import argparse
import sys

from fastpasta_spark import schema as S


def _load_docs(spark, path: str):
    # fail fast on schema mismatch (S4 analogue: version-dispatch sanity,
    # reference fastpasta/src/lib.rs:101-159). Check the FILE's footer
    # schema, not the declared one: spark.read.schema(X) silently yields
    # all-NULL columns for a parquet that doesn't have them, so a flat
    # (doc_id, text, ...) table would "validate" as 0 spans everywhere
    from pyspark.errors import AnalysisException

    try:
        actual = set(spark.read.parquet(path).columns)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        # a directory with no part files (empty upstream output) has no
        # footer to check — an empty corpus is valid input (0 docs),
        # and the schema-forced read below yields exactly that
        return spark.read.schema(S.DOCS_SCHEMA).parquet(path)
    missing = {"doc_id", "spans"} - actual
    if missing:
        raise SystemExit(
            f"input is not a docs-model table: {path} lacks "
            f"{sorted(missing)} (found {sorted(actual)})")
    return spark.read.schema(S.DOCS_SCHEMA).parquet(path)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="fastpasta_spark")
    p.add_argument("--cores", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    chk = sub.add_parser("check", help="run validation")
    chk.add_argument("mode", choices=["sanity", "all", "table"])
    chk.add_argument("input")
    chk.add_argument("--media", help="media dimension parquet", default=None)
    chk.add_argument("--spec", default=None,
                     help="JSON constraint spec (check table mode): list of "
                          "rule objects, see operators/constraints.from_spec")
    chk.add_argument("--dim", action="append", default=None,
                     metavar="NAME=PATH",
                     help="named dimension parquet for foreign_key rules "
                          "(repeatable)")
    chk.add_argument("--max-errors", type=int, default=None)
    chk.add_argument("--trigger-period", type=int, default=None,
                     help="expected bc period between internal triggers "
                          "(E45 check; reference --its-trigger-period)")
    chk.add_argument("--custom-checks", default=None, metavar="TOML",
                     help="custom-check TOML using the reference's field "
                          "names (cdps, triggers_pht, chip_count_ob, "
                          "chip_orders_ob + [expect_metrics]); see "
                          "plans/report.CustomChecksConfig.from_toml")
    chk.add_argument("-w", "--show-only-errors-with-codes", nargs="+",
                     default=None, metavar="CODE",
                     help="display only these error codes, e.g. -w E45 702 "
                          "(reference stats/err_printer.rs:27-81)")
    chk.add_argument("--output-stats", default=None)
    chk.add_argument("--input-stats-file", default=None)
    chk.add_argument("--checkpoint", default=None,
                     help="lineage dir: resumable run")
    chk.add_argument("--violations-out", default=None)
    chk.add_argument("--passed-out", default=None,
                     help="write only docs with verdict PASS here "
                          "(quarantine composition: validate -> keep clean)")

    vw = sub.add_parser("view", help="read-only views")
    vw.add_argument("what", choices=["docs", "frames"])
    vw.add_argument("input")
    vw.add_argument("-n", type=int, default=20)

    flt = sub.add_parser("filter", help="filtered passthrough writer")
    flt.add_argument("input")
    flt.add_argument("--kind", required=True, help="keep docs containing this span kind")
    flt.add_argument("-o", "--output", required=True)

    cur = sub.add_parser(
        "curate", help="training-data curation over a flat (doc_id, text) "
                       "table: quality gate -> dedup clusters -> token budget")
    cur.add_argument("input")
    cur.add_argument("-o", "--output", required=True)
    cur.add_argument("--min-quality", type=float, default=0.25)
    cur.add_argument("--langs", nargs="+", default=None, metavar="LANG")
    cur.add_argument("--jaccard-threshold", type=float, default=0.5)
    cur.add_argument("--token-budget", type=int, default=None)
    cur.add_argument("--exact-budget", action="store_true",
                     help="deterministic cumulative-sum budget (single-"
                          "partition window; default is the distributed "
                          "quantile-cutoff scale path)")
    cur.add_argument("--signals", nargs="+", default=None,
                     choices=["quality", "gopher", "lm", "bm25", "dsir"],
                     help="fit these scoring signals once (on --ref if "
                          "given, else the input) and make their columns "
                          "gate-able (--min-score) and rank-able "
                          "(--rank-by)")
    cur.add_argument("--terms", nargs="+", default=None, metavar="TERM",
                     help="bm25 query terms ([a-z0-9]+, <= 32)")
    cur.add_argument("--target", default=None, metavar="SQL",
                     help="SQL predicate defining the dsir target slice")
    cur.add_argument("--vocab-k", type=int, default=None,
                     help="lm model vocabulary size (default 2000)")
    cur.add_argument("--dsir-buckets", type=int, default=None,
                     help="dsir hash buckets (default 512)")
    cur.add_argument("--ref", default=None, metavar="PARQUET",
                     help="fit the signal models on this reference corpus "
                          "instead of the input itself")
    cur.add_argument("--gopher", action="store_true",
                     help="additionally require the Gopher rule battery "
                          "(Rae et al. 2021 document filters) to pass; "
                          "kept rows carry gopher_flags for audit")
    cur.add_argument("--min-score", action="append", default=None,
                     metavar="COL=MIN",
                     help="extra gate: keep docs with score column COL "
                          ">= MIN (NULL fails); repeatable, e.g. "
                          "--min-score avg_logprob=-5.0")
    cur.add_argument("--rank-by", default=None, metavar="COL",
                     help="column the token budget ranks by "
                          "(default quality; any fitted signal column; "
                          "requires --token-budget)")

    dr = sub.add_parser(
        "drift", help="distribution drift between two docs corpora: "
                      "kind-mix chi-square + PSI, text-length KS")
    dr.add_argument("input_a", help="baseline docs parquet")
    dr.add_argument("input_b", help="probe docs parquet")
    dr.add_argument("--chi2-threshold", type=float, default=30.0)
    dr.add_argument("--psi-threshold", type=float, default=0.25,
                    help="standard PSI scale: <0.1 stable, >0.25 major")
    dr.add_argument("--ks-threshold", type=float, default=0.2)

    smp = sub.add_parser(
        "sample", help="deterministic sampling of a flat table: hash-gate "
                       "rate or exact-k per stratum (reproducible on any "
                       "cluster; same seed = same rows forever)")
    smp.add_argument("input")
    smp.add_argument("-o", "--output", required=True)
    smp.add_argument("--id-col", default="doc_id")
    smp.add_argument("--seed", type=int, default=0)
    g = smp.add_mutually_exclusive_group(required=True)
    g.add_argument("--rate", type=float, help="global keep rate (0..1]")
    g.add_argument("-k", type=int,
                   help="exactly min(k, n) rows per --stratum value")
    smp.add_argument("--stratum", default=None,
                     help="stratum column (required with -k unless "
                          "--weight-col)")
    smp.add_argument("--weight-col", default=None, metavar="COL",
                     help="with -k: exact-k importance resampling, draw "
                          "probability proportional to exp(COL / T) — COL "
                          "is a LOG weight (e.g. dsir_logratio from "
                          "`score --signals dsir`)")
    smp.add_argument("--temperature", type=float, default=None,
                     help="importance-resampling temperature T (> 0, "
                          "default 1.0; higher flattens the draw; "
                          "requires --weight-col)")

    dd = sub.add_parser(
        "dedup", help="duplicate detection over a flat (doc_id, text) "
                      "table: exact content groups, MinHash-LSH near-dup "
                      "pairs, or substring-level duplicate spans")
    dd.add_argument("input")
    dd.add_argument("-o", "--output", required=True)
    dd.add_argument("--mode", choices=["exact", "near", "spans"],
                    default="exact")
    dd.add_argument("--threshold", type=float, default=None,
                    help="near mode: estimated-jaccard cutoff "
                         "(default 0.5)")
    dd.add_argument("--span-tokens", type=int, default=None,
                    help="spans mode: duplicated-window length in "
                         "tokens (default 20)")

    dc = sub.add_parser(
        "decontam", help="benchmark decontamination of a flat (doc_id, "
                         "text) corpus vs a (bench_id, text) eval set: "
                         "report contaminated docs, or surgically "
                         "excise the leaked spans and keep the rest")
    dc.add_argument("input")
    dc.add_argument("--bench", required=True, metavar="PARQUET",
                    help="benchmark/eval-set parquet (bench_id, text)")
    dc.add_argument("-o", "--output", required=True)
    dc.add_argument("--mode", choices=["report", "excise"],
                    default="report",
                    help="report = (doc_id, bench_id, overlap) pairs; "
                         "excise = rebuilt corpus with eval n-grams cut")
    dc.add_argument("--ngram", type=int, default=None,
                    help="window length in tokens (default 5 for "
                         "report, 13 for excise)")
    dc.add_argument("--min-overlap", type=int, default=1,
                    help="report mode: distinct shared shingles needed "
                         "to flag a doc (default 1)")
    dc.add_argument("--no-broadcast", action="store_true",
                    help="shuffle-join the eval index instead of "
                         "broadcasting (eval sets past broadcast scale)")

    scr = sub.add_parser(
        "score", help="per-doc curation scoring signals over a flat "
                      "(doc_id, text[, lang]) table; writes doc_id + "
                      "n_tokens + one column per requested signal "
                      "(NULL bm25 = no query term present)")
    scr.add_argument("input")
    scr.add_argument("-o", "--output", required=True)
    scr.add_argument("--signals", nargs="+", required=True,
                     choices=["quality", "gopher", "lm", "bm25", "dsir"],
                     help="quality = heuristic [0,1] gate; gopher = rule "
                          "battery pass as 0/1; lm = mean "
                          "unigram logprob; bm25 = keyword relevance "
                          "(needs --terms); dsir = importance weight vs "
                          "a --target slice")
    scr.add_argument("--terms", nargs="+", default=None, metavar="TERM",
                     help="bm25 query terms ([a-z0-9]+, <= 32)")
    scr.add_argument("--target", default=None, metavar="SQL",
                     help="SQL predicate defining the dsir target "
                          "slice, e.g. \"lang = 'en'\"")
    scr.add_argument("--dsir-buckets", type=int, default=None,
                     help="dsir hash buckets (default 512)")
    scr.add_argument("--vocab-k", type=int, default=None,
                     help="lm model vocabulary size (default 2000)")
    scr.add_argument("--ref", default=None, metavar="PARQUET",
                     help="fit the signal models on this reference "
                          "corpus instead of the input itself (fit "
                          "once on a sample slice, score everything)")

    rb = sub.add_parser(
        "rebalance", help="temperature-flatten a training mix: measure "
                          "per-stratum token shares, derive downsample-"
                          "only keep rates (share^T normalized), apply "
                          "the deterministic hash gate")
    rb.add_argument("input")
    rb.add_argument("-o", "--output", required=True)
    rb.add_argument("--stratum", required=True,
                    help="stratum column (e.g. lang, source)")
    rb.add_argument("--temperature", type=float, default=0.7,
                    help="T in (0, 1]: 1 = identity, smaller = flatter")
    rb.add_argument("--id-col", default="doc_id")
    rb.add_argument("--seed", type=int, default=0)

    shd = sub.add_parser(
        "shard", help="write deterministic training shards: "
                      "path/shard=K/ parquet, membership a pure function "
                      "of (id, seed, n) — cluster-size independent, "
                      "re-run stable, id-sorted within each shard")
    shd.add_argument("input")
    shd.add_argument("-o", "--output", required=True)
    shd.add_argument("-n", "--n-shards", type=int, required=True)
    shd.add_argument("--id-col", default="doc_id")
    shd.add_argument("--seed", type=int, default=0)

    lng = sub.add_parser(
        "lineage", help="inspect a resumable run's checkpoint: buckets "
                        "done, docs validated, per-check-type violation "
                        "totals (the operational 'how far along is my "
                        "killed run' view)")
    lng.add_argument("checkpoint",
                     help="dir previously passed to `check all --checkpoint`")
    lng.add_argument("--buckets", action="store_true",
                     help="also print the per-bucket lineage table "
                          "(bounded: one row per resume bucket)")

    args = p.parse_args(argv)

    # flag-combination validation BEFORE any Spark work (fail fast,
    # never silently ignore a requested check — review finding):
    # custom checks assert on check-all metrics, and count expectations
    # need whole-corpus stats (a bucket-sliced resume would false-fire)
    if args.cmd == "check" and getattr(args, "custom_checks", None):
        if args.mode != "all":
            raise SystemExit("--custom-checks requires `check all` "
                             f"(mode '{args.mode}' computes no metrics "
                             "for expectations to assert on)")
        if args.checkpoint:
            raise SystemExit(
                "--custom-checks cannot be combined with --checkpoint: "
                "count expectations need whole-corpus stats; run a "
                "non-resumable `check all` for custom checks")
    if args.cmd == "sample":
        if args.k is not None:
            if args.k <= 0:
                raise SystemExit(f"-k must be positive, got {args.k}")
            if args.stratum and args.weight_col:
                raise SystemExit("--stratum and --weight-col are mutually "
                                 "exclusive (per-stratum importance "
                                 "resampling is not a CLI flag)")
            if not args.stratum and not args.weight_col:
                raise SystemExit("-k requires --stratum or --weight-col")
        else:
            if args.stratum:
                raise SystemExit(
                    "--stratum requires -k (a global --rate would "
                    "silently ignore it; per-stratum rates are the "
                    "sample_stratified API, not a CLI flag)")
            if args.weight_col:
                raise SystemExit("--weight-col requires -k (importance "
                                 "resampling is an exact-k draw)")
            if not 0 < args.rate <= 1:
                raise SystemExit(f"--rate must be in (0, 1], got {args.rate}")
        if args.temperature is not None:
            if not args.weight_col:
                raise SystemExit("--temperature requires --weight-col "
                                 "(it would otherwise be silently ignored)")
            if not args.temperature > 0:
                raise SystemExit(
                    f"--temperature must be > 0, got {args.temperature}")

    if args.cmd == "shard" and args.n_shards <= 0:
        raise SystemExit(f"-n must be positive, got {args.n_shards}")

    if args.cmd == "rebalance" and not 0 < args.temperature <= 1:
        raise SystemExit(
            f"--temperature must be in (0, 1], got {args.temperature}")

    if args.cmd == "decontam":
        if args.ngram is not None and args.ngram < 2:
            raise SystemExit(f"--ngram must be >= 2, got {args.ngram}")
        if args.mode != "report" and args.min_overlap != 1:
            raise SystemExit("--min-overlap only applies to --mode report "
                             "(excise cuts every matching window)")
        if args.min_overlap < 1:
            raise SystemExit(
                f"--min-overlap must be >= 1, got {args.min_overlap}")

    if args.cmd == "dedup":
        if args.threshold is not None:
            if args.mode != "near":
                raise SystemExit("--threshold only applies to --mode near")
            if not 0 < args.threshold <= 1:
                raise SystemExit(
                    f"--threshold must be in (0, 1], got {args.threshold}")
        if args.span_tokens is not None:
            if args.mode != "spans":
                raise SystemExit("--span-tokens only applies to --mode spans")
            if args.span_tokens < 2:
                raise SystemExit(
                    f"--span-tokens must be >= 2, got {args.span_tokens}")

    if args.cmd in ("score", "curate"):
        # fail fast pre-Spark: a requested flag must never be silently
        # ignored, and a required one must never fail mid-job (these
        # imports load no JVM — Spark starts at get_spark below).
        # score and curate share the signal-model flag family.
        from fastpasta_spark.operators.textstats import (
            validate_bm25_query,
            validate_dsir_buckets,
        )

        sigs = list(dict.fromkeys(args.signals or []))
        if not sigs:  # curate without --signals: model flags are inert
            for flag, name in ((args.terms, "--terms"),
                               (args.target, "--target"),
                               (args.vocab_k, "--vocab-k"),
                               (args.dsir_buckets, "--dsir-buckets"),
                               (args.ref, "--ref")):
                if flag:
                    raise SystemExit(f"{name} requires --signals")
        if sigs and "bm25" in sigs and not args.terms:
            raise SystemExit("--signals bm25 requires --terms")
        if args.terms and "bm25" not in sigs:
            raise SystemExit("--terms only applies to --signals bm25")
        if "dsir" in sigs and not args.target:
            raise SystemExit("--signals dsir requires --target")
        if args.target and "dsir" not in sigs:
            raise SystemExit("--target only applies to --signals dsir")
        if args.dsir_buckets is not None and "dsir" not in sigs:
            raise SystemExit("--dsir-buckets only applies to --signals dsir")
        if args.vocab_k is not None and "lm" not in sigs:
            raise SystemExit("--vocab-k only applies to --signals lm")
        if args.ref and not {"lm", "bm25", "dsir"} & set(sigs):
            raise SystemExit(
                "--ref has no effect: none of the requested signals "
                "fits a model (quality/gopher are stateless)")
        try:
            if args.terms:
                validate_bm25_query(args.terms)
            validate_dsir_buckets(args.dsir_buckets
                                  if args.dsir_buckets is not None else 512)
            if args.vocab_k is not None and args.vocab_k < 1:
                raise ValueError(f"--vocab-k must be >= 1, got {args.vocab_k}")
        except ValueError as e:
            raise SystemExit(str(e)) from None

        if args.cmd == "curate":
            # gate / rank columns must exist in the funnel's frame:
            # quality is always computed; the rest need their signal
            sig_cols = {"quality": "quality", "gopher": "gopher_pass",
                        "lm": "avg_logprob", "bm25": "bm25",
                        "dsir": "dsir_logratio"}
            allowed = {"quality"} | {sig_cols[s] for s in sigs}
            if getattr(args, "gopher", False):
                allowed.add("gopher_pass")  # computed by the --gopher gate
            args.min_scores = {}
            for spec in args.min_score or []:
                col, sep, val = spec.partition("=")
                if not sep:
                    raise SystemExit(
                        f"--min-score wants COL=MIN, got {spec!r}")
                try:
                    args.min_scores[col] = float(val)
                except ValueError:
                    raise SystemExit(
                        f"--min-score {spec!r}: MIN must be a number"
                    ) from None
                if col not in allowed:
                    raise SystemExit(
                        f"--min-score column {col!r} not available; "
                        f"gate-able here: {sorted(allowed)} (request the "
                        "matching --signals)")
            if args.rank_by is not None:
                if args.token_budget is None:
                    raise SystemExit(
                        "--rank-by requires --token-budget (ranking "
                        "only orders the budget cut; without a budget "
                        "it would be silently ignored)")
                if args.rank_by not in allowed:
                    raise SystemExit(
                        f"--rank-by column {args.rank_by!r} not "
                        f"available; rank-able here: {sorted(allowed)} "
                        "(request the matching --signals)")

    from fastpasta_spark.session import get_spark

    spark = get_spark(app_name=f"fastpasta_spark_{args.cmd}", cores=args.cores)

    if args.cmd == "view":
        from fastpasta_spark.operators import views

        docs = _load_docs(spark, args.input)
        df = views.view_docs(docs) if args.what == "docs" else views.view_frames(docs)
        df.show(args.n, truncate=False)
        return 0

    if args.cmd == "decontam":
        from fastpasta_spark.operators.dedup import (
            decontaminate,
            remove_contaminated_spans,
        )
        from fastpasta_spark.functions.cache import release_tracked

        corpus = spark.read.parquet(args.input)
        bench = spark.read.parquet(args.bench)
        for frame, need, what in ((corpus, ("doc_id", "text"), "input"),
                                  (bench, ("bench_id", "text"), "--bench")):
            missing = [c for c in need if c not in frame.columns]
            if missing:
                raise SystemExit(f"{what} is missing columns {missing}")
        if args.mode == "report":
            out = decontaminate(corpus, bench, n=args.ngram or 5,
                                min_overlap=args.min_overlap,
                                broadcast_index=not args.no_broadcast)
        else:
            out = remove_contaminated_spans(
                corpus, bench, n=args.ngram or 13,
                broadcast_index=not args.no_broadcast)
        out.write.mode("overwrite").parquet(args.output)
        release_tracked()
        got = spark.read.parquet(args.output)
        if args.mode == "report":
            print(f"{got.count()} contaminated (doc, bench) pairs")
        else:
            from pyspark.sql import functions as F

            s = got.agg(
                F.count(F.lit(1)).alias("docs"),
                F.coalesce(F.sum((F.col("n_cut_spans") > 0).cast("long")),
                           F.lit(0)).alias("hit"),
                F.coalesce(F.sum(F.col("n_total") - F.col("n_kept")),
                           F.lit(0)).alias("cut"),
            ).first()
            print(f"rebuilt {s['docs']} docs; {s['hit']} had leaked spans; "
                  f"{s['cut']} tokens excised")
        return 0

    if args.cmd == "rebalance":
        from fastpasta_spark.operators.sampling import temperature_rebalance

        tbl = spark.read.parquet(args.input)
        for c in (args.id_col, args.stratum, "text"):
            if c not in tbl.columns:
                raise SystemExit(f"column {c!r} not in {tbl.columns}")
        sampled, report = temperature_rebalance(
            tbl, args.stratum, temperature=args.temperature,
            id_col=args.id_col, seed=args.seed)
        sampled.write.mode("overwrite").parquet(args.output)
        print(f"{'stratum':<12} {'docs':>8} {'tokens':>10} "
              f"{'share':>8} {'keep_rate':>9}")
        for r in sorted(report.collect(),
                        key=lambda r: -(r["tokens"] or 0)):
            # all-NULL-text strata report NULL tokens/share — print 0,
            # never pass None to a numeric format spec
            print(f"{str(r[args.stratum]):<12} {r['docs']:>8} "
                  f"{r['tokens'] or 0:>10} {r['token_share'] or 0.0!s:>8} "
                  f"{r['keep_rate']:>9}")
        print(f"kept {spark.read.parquet(args.output).count()} rows")
        return 0

    if args.cmd == "shard":
        from fastpasta_spark.operators.packing import write_training_shards

        tbl = spark.read.parquet(args.input)
        if args.id_col not in tbl.columns:
            raise SystemExit(f"--id-col {args.id_col!r} not in {tbl.columns}")
        write_training_shards(tbl, args.output, args.n_shards,
                              id_col=args.id_col, seed=args.seed)
        # a zero-row frame's partitionBy write emits only _SUCCESS, and
        # reading that back throws UNABLE_TO_INFER_SCHEMA — check the
        # input side before touching the output
        if tbl.filter(tbl[args.id_col].isNotNull()).limit(1).count() == 0:
            print("wrote 0 rows into 0 shards")
            return 0
        per = (spark.read.parquet(args.output)
               .groupBy("shard").count().orderBy("shard").collect())
        print(f"wrote {sum(r['count'] for r in per)} rows into "
              f"{len(per)} shards (min {min(r['count'] for r in per)}, "
              f"max {max(r['count'] for r in per)} rows)")
        return 0

    if args.cmd == "lineage":
        from fastpasta_spark.plans.lineage import read_lineage

        lin = read_lineage(spark, args.checkpoint)
        if lin is None:
            raise SystemExit(
                f"no lineage table under {args.checkpoint} — run "
                f"`check all <docs> --checkpoint {args.checkpoint}` first")
        # ONE job: the table is bounded (one row per resume bucket per
        # run), so collect it and derive everything driver-side instead
        # of re-scanning the checkpoint per aggregate
        rows = [r for r in lin.collect() if r.verdict == "DONE"]
        runs = {r.run_id for r in rows}
        # totals count ONE DONE row per bucket: two runs racing the same
        # checkpoint dir can both append a DONE row for a bucket, and
        # summing both would double-count docs/violations while
        # buckets_done dedups — internally inconsistent output. Keep
        # the lexicographically-last run_id per bucket (deterministic).
        by_bucket: dict = {}
        for r in rows:
            cur = by_bucket.get(r.bucket)
            if cur is None or r.run_id > cur.run_id:
                by_bucket[r.bucket] = r
        done = list(by_bucket.values())
        if len(rows) > len(done):
            print(f"note: {len(rows) - len(done)} duplicate DONE row(s) "
                  "across runs; totals use one row per bucket")
        print(f"runs={len(runs)} buckets_done={len(done)} "
              f"docs_validated={sum(r.docs_seen for r in done)} "
              f"violations={sum(r.violations for r in done)}")
        codes: dict[str, int] = {}
        for r in done:
            # pre-check_counts rows read as NULL under mergeSchema
            for c, n in (getattr(r, "check_counts", None) or {}).items():
                codes[c] = codes.get(c, 0) + n
        for c, n in sorted(codes.items(), key=lambda kv: (-kv[1], kv[0])):
            print(f"  {c:<8} {n}")
        if args.buckets:
            print(f"{'bucket':>6} {'docs_seen':>9} {'violations':>10} "
                  f"{'run_id':<32} check_counts")
            for r in sorted(rows, key=lambda r: (r.bucket, r.run_id)):
                cc = getattr(r, "check_counts", None) or {}
                cc_s = ",".join(f"{c}:{n}" for c, n in sorted(cc.items()))
                print(f"{r.bucket:>6} {r.docs_seen:>9} {r.violations:>10} "
                      f"{r.run_id:<32} {cc_s}")
        return 0

    if args.cmd == "drift":
        from fastpasta_spark.operators.drift import (
            chi_square,
            kind_profile,
            ks_statistic,
            len_profile,
            psi,
        )

        from fastpasta_spark.functions.cache import (
            release_tracked,
            tracked_persist,
        )

        a = _load_docs(spark, args.input_a)
        b = _load_docs(spark, args.input_b)
        # persist the tiny merged profiles: chi2 and PSI read the same
        # kind profiles, and without the boundary each .first() would
        # rescan both corpora (explode + groupBy over every span twice)
        ka, kb = tracked_persist(kind_profile(a)), tracked_persist(kind_profile(b))
        chi = chi_square(ka, kb).first()
        p_row = psi(ka, kb).first()
        ks = ks_statistic(len_profile(a), len_profile(b)).first().ks
        release_tracked()
        print(f"kind-mix chi2: {chi.chi2} (dof={chi.dof})")
        print(f"kind-mix psi:  {p_row.psi} over {p_row.categories} kinds")
        print(f"text-len ks:   {ks}")
        # NULL statistics (empty side) count as drift: an empty probe or
        # baseline is never "no change"
        drifted = (
            chi.chi2 is None or chi.chi2 > args.chi2_threshold
            or p_row.psi is None or p_row.psi > args.psi_threshold
            or ks is None or ks > args.ks_threshold
        )
        print("verdict: DRIFT" if drifted else "verdict: stable")
        return 4 if drifted else 0

    if args.cmd == "sample":
        from fastpasta_spark.operators.sampling import (
            importance_resample,
            sample_exact,
            sample_k_per_stratum,
        )

        tbl = spark.read.parquet(args.input)
        if args.id_col not in tbl.columns:
            raise SystemExit(f"--id-col {args.id_col!r} not in {tbl.columns}")
        if args.weight_col is not None:
            if args.weight_col not in tbl.columns:
                raise SystemExit(
                    f"--weight-col {args.weight_col!r} not in {tbl.columns}")
            out = importance_resample(
                tbl, args.weight_col, args.k, id_col=args.id_col,
                seed=args.seed,
                temperature=args.temperature
                if args.temperature is not None else 1.0)
        elif args.k is not None:
            if args.stratum not in tbl.columns:
                raise SystemExit(
                    f"--stratum {args.stratum!r} not in {tbl.columns}")
            out = sample_k_per_stratum(tbl, args.stratum, args.k,
                                       id_col=args.id_col, seed=args.seed)
        else:
            out = sample_exact(tbl, id_col=args.id_col, rate=args.rate,
                               seed=args.seed)
        out.write.mode("overwrite").parquet(args.output)
        from fastpasta_spark.functions.cache import release_tracked

        release_tracked()  # drop the exact-k gate cache, if any
        print(f"wrote {spark.read.parquet(args.output).count()} rows")
        return 0

    if args.cmd == "filter":
        # S5 analogue: filtered passthrough writer (write/writer.rs:26-120)
        from pyspark.sql import functions as F

        docs = _load_docs(spark, args.input)
        kept = docs.filter(
            F.expr(f"exists(spans, s -> s.kind = '{args.kind}')"))
        kept.write.mode("overwrite").parquet(args.output)
        print(f"wrote {spark.read.parquet(args.output).count()} docs")
        return 0

    if args.cmd == "dedup":
        from fastpasta_spark.functions.cache import release_tracked
        from fastpasta_spark.operators import dedup as D

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns or "text" not in docs.columns:
            raise SystemExit(f"dedup needs (doc_id, text); got {docs.columns}")
        if args.mode == "exact":
            out = D.exact_duplicates(docs)
        elif args.mode == "near":
            out = D.minhash_near_duplicates(
                docs, threshold=args.threshold or 0.5)
        else:
            out = D.dup_spans(docs, n=args.span_tokens or 20)
        out.write.mode("overwrite").parquet(args.output)
        release_tracked()  # near/spans persist mid-plan boundaries
        print(f"wrote {spark.read.parquet(args.output).count()} "
              f"{args.mode} rows")
        return 0

    if args.cmd == "score":
        from pyspark.sql import functions as F

        from fastpasta_spark.operators import textstats as T

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns or "text" not in docs.columns:
            raise SystemExit(f"score needs (doc_id, text); got {docs.columns}")
        ref = spark.read.parquet(args.ref) if args.ref else docs
        if args.ref and "text" not in ref.columns:
            raise SystemExit(f"--ref needs a text column; got {ref.columns}")
        from fastpasta_spark.functions.hashing import spark_tokens

        # fit the signal models ONCE (on --ref when given, else on the
        # input itself — identical to per-call operator semantics),
        # then apply as pure column expressions: every signal is a
        # column on the SAME rows — one scan, zero joins, so duplicate
        # or NULL doc_ids score row-wise instead of fanning out /
        # dropping through an equi-join
        model = T.fit_scoring_model(
            ref, sigs, terms=args.terms,
            target_filter=F.expr(args.target) if args.target else None,
            vocab_k=args.vocab_k if args.vocab_k is not None else 2000,
            buckets=args.dsir_buckets or 512)
        # null text counts as 0 tokens (raw size() of a NULL array is NULL)
        out = model.apply(docs).select(
            "doc_id",
            F.expr(f"coalesce(size({spark_tokens('text')}), 0)")
            .cast("long").alias("n_tokens"),
            *model.columns)
        out.write.mode("overwrite").parquet(args.output)
        print(f"wrote {spark.read.parquet(args.output).count()} rows "
              f"with signals: {', '.join(sigs)}")
        return 0

    if args.cmd == "curate":
        from fastpasta_spark.plans.curate import curate

        docs = spark.read.parquet(args.input)
        if "doc_id" not in docs.columns or "text" not in docs.columns:
            raise SystemExit(f"curate needs (doc_id, text); got {docs.columns}")
        scoring = None
        if args.signals:
            from pyspark.sql import functions as F

            from fastpasta_spark.operators import textstats as T

            # fit ONCE on the reference slice (or the input), apply in
            # the funnel's own textstats scan — no extra jobs there
            ref = spark.read.parquet(args.ref) if args.ref else docs
            scoring = T.fit_scoring_model(
                ref, list(dict.fromkeys(args.signals)), terms=args.terms,
                target_filter=F.expr(args.target) if args.target else None,
                vocab_k=args.vocab_k if args.vocab_k is not None else 2000,
                buckets=args.dsir_buckets or 512)
        res = curate(docs, min_quality=args.min_quality,
                     langs=tuple(args.langs) if args.langs else None,
                     jaccard_threshold=args.jaccard_threshold,
                     token_budget=args.token_budget,
                     exact_budget=args.exact_budget,
                     scoring=scoring,
                     min_scores=getattr(args, "min_scores", None) or None,
                     rank_col=args.rank_by or "quality",
                     gopher=args.gopher)
        res.kept.write.mode("overwrite").parquet(args.output)
        s = res.summary.first()
        print(f"input={s['n_input']} gated={s['n_gated']} "
              f"unique={s['n_unique']} kept={s['n_kept']} "
              f"kept_tokens={s['kept_tokens']}")
        return 0

    if args.cmd == "check" and args.mode == "table":
        # generic schema+constraint validation of ANY parquet table —
        # the config-driven rule algebra (no docs-model schema assumed)
        import json

        from fastpasta_spark.operators import constraints as C

        if not args.spec:
            raise SystemExit("check table requires --spec spec.json")
        with open(args.spec) as f:
            spec = json.load(f)
        dims = {}
        for d in args.dim or []:
            name, _, pth = d.partition("=")
            if not pth:
                raise SystemExit(f"--dim wants NAME=PATH, got {d!r}")
            dims[name] = spark.read.parquet(pth)
        tbl = spark.read.parquet(args.input)
        total = 0
        for r in C.violation_counts(tbl, C.from_spec(spec, dims)).collect():
            print(f"{r.rule}: {r.violations}")
            total += r.violations
        print(f"total violations: {total}")
        return 2 if total else 0

    # check
    from pyspark.sql import functions as F

    from fastpasta_spark.plans.check_all import check_all
    from fastpasta_spark.plans.report import (
        format_report,
        golden_diff,
        metrics_to_dict,
        read_stats,
        write_stats,
    )

    docs = _load_docs(spark, args.input)
    media = spark.read.parquet(args.media) if args.media else None

    def code_filter(viol):
        """-w display filter; accepts codes with or without the E prefix
        (the reference parses [E\\d+] codes the same way)."""
        if not args.show_only_errors_with_codes:
            return viol
        codes = [c.upper() if c.upper().startswith("E") else f"E{c}"
                 for c in args.show_only_errors_with_codes]
        return viol.filter(F.col("check_code").isin(codes))

    if args.mode == "sanity":
        from fastpasta_spark.operators.sanity import sanity_violations

        violations = sanity_violations(docs).orderBy("doc_id", "offset")
        if args.max_errors is not None:
            violations = violations.limit(args.max_errors)
        # -w filters the DISPLAYED rows only — the total and the exit
        # code come from the unfiltered set (matching check-all mode;
        # otherwise `-w E13` on an E10-only corpus would exit 0).
        # take(50) for display + count() for the total: an unbounded
        # collect() here is a driver OOM at scale (the violation table
        # can be as large as the input)
        for r in code_filter(violations).take(50):
            print(f"{r.doc_id}:{r.offset}: [{r.check_code}] {r.message}")
        n = violations.count()
        print(f"total errors: {n}")
        return 2 if n else 0

    if args.checkpoint:
        from fastpasta_spark.plans.lineage import run_resumable

        viol, run_id = run_resumable(docs, media, args.checkpoint,
                                     trigger_period=args.trigger_period)
        n = viol.count()
        print(f"run_id={run_id} violations={n}")
        return 2 if n else 0

    custom = None
    if args.custom_checks:
        from fastpasta_spark.plans.report import CustomChecksConfig

        custom = CustomChecksConfig.from_toml(args.custom_checks)
    res = check_all(docs, media, max_errors=args.max_errors,
                    trigger_period=args.trigger_period, custom=custom)
    exit_code = 0
    for r in code_filter(res.violations).take(50):
        print(f"{r.doc_id}:{r.offset}: [{r.check_code}] {r.message}")
    metrics = metrics_to_dict(res.metrics)
    print(format_report(metrics))
    if metrics.get("total_errors", 0) > 0:
        exit_code = 2
    elif custom is not None and res.violations.filter(
            F.col("check_code") == S.E9001_CUSTOM_CHECK).count() > 0:
        # E9001 stats-expectation failures sit outside total_errors
        # (they assert on the finished stats) but still fail the run,
        # like the reference's stats_validation errors
        exit_code = 2
    if args.violations_out:
        res.violations.write.mode("overwrite").parquet(args.violations_out)
    if args.passed_out:
        ok = res.passed.filter(F.col("verdict") == "PASS").select("doc_id")
        docs.join(ok, "doc_id", "left_semi").write.mode(
            "overwrite").parquet(args.passed_out)
    if args.output_stats:
        write_stats(res.metrics, args.output_stats)
    if args.input_stats_file:
        diff = golden_diff(res.metrics, read_stats(spark, args.input_stats_file))
        mismatches = diff.collect()
        for r in mismatches:
            print(f"[{r.check_code}] {r.message}")
        if mismatches:
            exit_code = 3
        else:
            print("golden stats: all fields match")
    return exit_code


if __name__ == "__main__":
    sys.exit(main())
