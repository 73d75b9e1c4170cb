"""Hostile-text fuzz for the scoring operators (round-7, verdict item 6).

The FSM fuzz (`fuzz_fsm.py`) covers the validation side; this harness
covers the curation-scoring side: per seed it generates a corpus of
HOSTILE documents — NULL / empty / whitespace-only text, unicode
(CJK, combining marks, 'İ'-style case-fold traps, emoji), quote/
backslash/backtick-dense strings (the `_assert_sql_safe_tokens`
boundary: such characters are SEPARATORS to the tokenizer, so fitted
vocab/terms stay [a-z0-9]+ and SQL-literal embedding stays safe),
digit runs, kilobyte single tokens, pathological repetition, and plain
ASCII soup — then asserts ENGINE == PURE-PYTHON TWIN, exactly, for:

  1. bm25_scores       (randomized terms drawn from the corpus's own
                        token pool + never-present terms, random k1/b)
  2. dsir_weights      (random bucket counts, seed-derived target set)
  3. unigram_logprob   (random vocab_k incl. 1 and > vocabulary size)
  4. gopher_rules      (the full 7-rule battery vs py_gopher_flags)
  5. fit_scoring_model (lm/bm25/dsir/quality FIT ON A REFERENCE SLICE
                        and applied to the full hostile corpus — the
                        fit/apply split twins, incl. NULL-score rows)

Usage:
    python scripts/fuzz_scoring.py [n_docs_per_seed] [seed [seed ...]]

Defaults: 30,000 docs x seeds (7, 99, 2026). Twins replay the exact
literal arithmetic the fit step bakes into the expressions (the
probabilities are computed driver-side in Python and embedded as
literals, so the twin and the engine share them bit-for-bit; ln() is
the only libm call compared, behind a 4-6 dp round).
"""

from __future__ import annotations

import math
import os
import random
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from fastpasta_spark.functions.hashing import py_md5_hash, py_tokens  # noqa: E402

UNICODE_POOL = [
    "İstanbul", "straße", "ﬀ", "ñoño", "日本語のテキスト", "русский",
    "éclair", "🎉🎊", "​zero​width", "ＡＢＣ fullwidth",
]
HOSTILE_POOL = [
    "O'Neill said \"hi\" `tick` \\back\\slash",
    "{braces} [brackets] (parens) <angle>",
    "semi;colon, comma. dot! bang? q:colon",
    "a'||'b -- sql 'injection' attempt; DROP TABLE x;",
    "$(subshell) ${var} %fmt% \t tab \n newline",
    # line-edge whitespace traps (engine/twin ASCII-strip contract):
    "crlf line one...\r\ncrlf line two...\r\n- crlf bullet\r\n",
    "\t- tab-led bullet\n   - space-led bullet\n\t\n",
    "nbsp joined words and　ideographic　spaces",
]
WORDS = ("the quick brown fox jumps over lazy dog data pipeline check "
         "hash window merge span token dup alpha beta gamma delta "
         "epsilon zeta eta theta run42 x0 y1 z9").split()


def gen_doc(rng: random.Random) -> str | None:
    kind = rng.randrange(10)
    if kind == 0:
        return None
    if kind == 1:
        return rng.choice(["", " ", "\t\n ", "...", "!!!"])
    if kind == 2:
        return " ".join(rng.choices(UNICODE_POOL, k=rng.randrange(1, 8)))
    if kind == 3:
        return rng.choice(HOSTILE_POOL)
    if kind == 4:  # kilobyte single token + digits
        return "x" * rng.choice([500, 1000]) + " 1234567890" * 3
    if kind == 5:  # pathological repetition
        w = rng.choice(WORDS)
        return (w + " ") * rng.randrange(1, 200)
    if kind == 6:  # mixed case + unicode + hostile
        parts = rng.choices(WORDS + UNICODE_POOL + HOSTILE_POOL, k=6)
        return " ".join(p.upper() if rng.random() < 0.3 else p
                        for p in parts)
    # plain soup
    return " ".join(rng.choices(WORDS, k=rng.randrange(1, 40)))


# ---------------------------------------------------------------- twins
def py_bm25(ref, apply_docs, terms, k1, b, dp=6):
    """Fit on ref [(id,text)], score apply_docs; returns id->(n, bm25)
    with None for no-match (append-mode NULL semantics)."""
    rtoks = [py_tokens(t) for _, t in ref]
    n = len(ref)
    total = sum(len(v) for v in rtoks)
    if n == 0 or total == 0:
        return {i: (len(py_tokens(t)), None) for i, t in apply_docs}
    avgdl = total / n
    dfs = {t: sum(1 for v in rtoks if t in v) for t in terms}
    out = {}
    for i, text in apply_docs:
        tv = py_tokens(text)
        s = 0.0
        for t in terms:
            tf = float(tv.count(t))
            if tf == 0.0:
                continue
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(tv) / avgdl))
        out[i] = (len(tv), round(s, dp) if s > 0.0 else None)
    return out


def py_dsir(ref, apply_docs, buckets, dp=6):
    """Fit bucket profile on ref [(id,text,is_target)], score
    apply_docs [(id,text)]; id->(n, logratio|None)."""
    raw = [0] * buckets
    tgt = [0] * buckets
    for _, text, is_t in ref:
        for t in py_tokens(text):
            j = py_md5_hash(t) % buckets
            raw[j] += 1
            if is_t:
                tgt[j] += 1
    t_raw, t_tgt = sum(raw), sum(tgt)
    lr = [math.log((tgt[j] + 1.0) / (t_tgt + buckets))
          - math.log((raw[j] + 1.0) / (t_raw + buckets))
          for j in range(buckets)]
    out = {}
    for i, text in apply_docs:
        tv = py_tokens(text)
        if not tv:
            out[i] = (0, None)
        else:
            out[i] = (len(tv),
                      round(sum(lr[py_md5_hash(t) % buckets]
                                for t in tv) / len(tv), dp))
    return out


def py_unigram(ref, apply_docs, vocab_k, dp):
    """Fit Laplace unigram on ref, score apply_docs; id->(n, lp|None).
    Replays the fit's literal arithmetic: p = (cnt+1)/denom computed in
    Python (exactly what the engine bakes into the map literal)."""
    cnt = Counter(t for _, text in ref for t in py_tokens(text))
    total = sum(cnt.values())
    head = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k])
    denom = float(total + len(head) + 1)
    floor = 1.0 / denom
    out = {}
    for i, text in apply_docs:
        tv = py_tokens(text)
        if not tv:
            out[i] = (0, None)
        else:
            s = sum(math.log((head[t] + 1) / denom if t in head else floor)
                    for t in tv)
            out[i] = (len(tv), round(s / len(tv), dp))
    return out


def diff(name: str, got: dict, want: dict) -> int:
    bad = 0
    keys = set(got) | set(want)
    for k in sorted(keys, key=str):
        if got.get(k) != want.get(k):
            if bad < 5:
                print(f"  MISMATCH {name} id={k}: engine={got.get(k)} "
                      f"twin={want.get(k)}")
            bad += 1
    return bad


def run_seed(spark, seed: int, n_docs: int) -> int:
    from pyspark.sql import functions as F

    from fastpasta_spark.operators.textstats import (
        bm25_scores,
        dsir_weights,
        fit_scoring_model,
        unigram_logprob,
    )

    rng = random.Random(seed)
    rows = [(i, gen_doc(rng)) for i in range(n_docs)]
    # seed-derived deterministic target membership (~30%)
    is_t = {i: py_md5_hash(f"t{seed}:{i}") % 10 < 3 for i, _ in rows}
    df = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("is_t", F.expr(
            f"pmod(cast(conv(substr(md5(concat('t{seed}:', "
            f"cast(doc_id as string))), 1, 15), 16, 10) as bigint), 10) < 3"))
    df = df.repartition(16)

    pool = sorted({t for _, x in rows for t in py_tokens(x)})
    rng2 = random.Random(seed + 1)
    terms = sorted(set(rng2.sample(pool, min(6, len(pool))) +
                       ["qqqqnotpresent"]))
    k1 = round(rng2.uniform(0.3, 2.0), 2)
    b = round(rng2.uniform(0.0, 1.0), 2)
    buckets = rng2.choice([2, 7, 64, 512])
    vocab_k = rng2.choice([1, 50, 10_000_000])

    bad = 0

    got = {r.doc_id: (r.n_tokens, r.bm25)
           for r in bm25_scores(df, terms, k1=k1, b=b).collect()}
    want = {i: v for i, v in
            py_bm25(rows, rows, terms, k1, b).items() if v[1] is not None}
    bad += diff(f"bm25(terms={len(terms)},k1={k1},b={b})", got, want)

    got = {r.doc_id: (r.n_tokens, r.dsir_logratio)
           for r in dsir_weights(df, F.col("is_t"), buckets=buckets)
           .collect()}
    ref3 = [(i, x, is_t[i]) for i, x in rows]
    bad += diff(f"dsir(buckets={buckets})", got,
                py_dsir(ref3, rows, buckets))

    got = {r.doc_id: (r.n_tokens, r.avg_logprob)
           for r in unigram_logprob(df, vocab_k=vocab_k).collect()}
    bad += diff(f"unigram(vocab_k={vocab_k})", got,
                py_unigram(rows, rows, vocab_k, dp=4))

    from fastpasta_spark.operators.textstats import (
        gopher_rules,
        py_gopher_flags,
    )

    got = {r.doc_id: list(r.gopher_flags)
           for r in gopher_rules(df).collect()}
    bad += diff("gopher", got, {i: py_gopher_flags(t) for i, t in rows})

    # fit/apply split: fit every signal on a PREFIX slice, apply to all
    ref_rows = rows[: max(1, n_docs // 5)]
    ref_df = df.filter(F.col("doc_id") < len(ref_rows))
    model = fit_scoring_model(ref_df, ["quality", "lm", "bm25", "dsir"],
                              terms=terms, target_filter=F.col("is_t"),
                              vocab_k=2000, buckets=buckets, k1=k1, b=b)
    got_rows = model.apply(df).collect()
    got_lm = {r.doc_id: r.avg_logprob for r in got_rows}
    got_bm = {r.doc_id: r.bm25 for r in got_rows}
    got_ds = {r.doc_id: r.dsir_logratio for r in got_rows}
    want_lm = {i: v[1] for i, v in
               py_unigram(ref_rows, rows, 2000, dp=6).items()}
    want_bm = {i: v[1] for i, v in
               py_bm25(ref_rows, rows, terms, k1, b).items()}
    ref3s = [(i, x, is_t[i]) for i, x in ref_rows]
    want_ds = {i: v[1] for i, v in py_dsir(ref3s, rows, buckets).items()}
    bad += diff("fit/apply lm", got_lm, want_lm)
    bad += diff("fit/apply bm25", got_bm, want_bm)
    bad += diff("fit/apply dsir", got_ds, want_ds)

    n_rows = 5 * n_docs + len(got_rows)
    print(f"seed {seed}: {n_rows} engine rows compared across 7 legs -> "
          f"{'OK' if bad == 0 else f'{bad} MISMATCHES'}")
    return bad


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    seeds = [int(s) for s in sys.argv[2:]] or [7, 99, 2026]

    from fastpasta_spark.session import get_spark

    spark = get_spark(app_name="fuzz_scoring", cores=16)
    total_bad = 0
    for seed in seeds:
        total_bad += run_seed(spark, seed, n_docs)
    print(f"TOTAL: {'PARITY' if total_bad == 0 else f'{total_bad} BAD'} "
          f"({len(seeds)} seeds x {n_docs} docs)")
    return 1 if total_bad else 0


if __name__ == "__main__":
    sys.exit(main())
