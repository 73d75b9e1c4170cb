"""Text-analysis operators vs python oracles on real documents."""

import pytest

from fastpasta_spark.functions.hashing import py_md5_hash, py_tokens
from fastpasta_spark.operators import textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_count(documents):
    got = {r.doc_id: r.n_tokens for r in textstats.token_count(documents).collect()}
    for r in documents.collect():
        assert got[r.doc_id] == len(py_tokens(r.text)), r.doc_id


def test_fingerprint_matches_python(documents):
    got = {r.doc_id: r.fingerprint
           for r in textstats.fingerprint(documents.limit(30)).collect()}
    M = 2147483647
    for r in documents.limit(30).collect():
        acc = 7
        for t in py_tokens(r.text):
            acc = (acc * 1000003 + int(
                __import__("hashlib").md5(t.encode()).hexdigest()[:12], 16)) % M
        assert got[r.doc_id] == acc, r.doc_id


def test_language_id_on_real_language_samples(spark):
    # the testdata's lang column is decorative (same vocab for every
    # label), so use constructed sentences per language instead
    samples = [
        ("en", "the cat sat on the mat and it is a good day for the walk"),
        ("de", "der hund ist ein tier und die katze ist nicht mit der maus"),
        ("fr", "le chien est un animal et la maison est pour les enfants"),
        ("es", "el perro es un animal y la casa es por los gatos una vida"),
        ("unk", "xyzzy qwerty asdf zxcv plugh foobar"),
    ]
    df = spark.createDataFrame(samples, "lang string, text string")
    got = {r.lang: r.lang_pred for r in textstats.language_id(df).collect()}
    assert got == {lang: lang for lang, _ in samples}


def test_language_id_applies_to_corpus(documents):
    rows = textstats.language_id(documents).select("lang_pred").collect()
    # synthetic corpus is English token soup: en or unk, never crashes
    assert {r.lang_pred for r in rows} <= {"en", "unk"}


def test_quality_score_range(documents):
    rows = textstats.quality_score(documents).select("quality").collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert len({r.quality for r in rows}) > 3  # not constant


def test_profile(documents):
    p = textstats.profile(documents).collect()[0]
    assert p.docs == documents.count()
    assert p.null_texts == 0
    assert p.min_len > 0 and p.max_len >= p.min_len


def test_with_textstats_equals_individual_ops(spark, documents):
    from fastpasta_spark.operators.textstats import (
        fingerprint,
        language_id,
        quality_score,
        token_count,
        with_textstats,
    )

    d = documents.limit(80)
    fused = with_textstats(d).select(
        "doc_id", "n_tokens", "quality", "fingerprint", "lang_pred")
    chained = language_id(fingerprint(quality_score(token_count(d)))).select(
        "doc_id", "n_tokens", "quality", "fingerprint", "lang_pred")
    assert sorted(map(tuple, fused.collect())) == \
        sorted(map(tuple, chained.collect()))


def test_repetition_ratio_and_patterns(spark):
    from fastpasta_spark.operators.textstats import pattern_counts, repetition_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),        # 3 bigrams, 1 distinct
            (2, "all words here are unique"),  # 0 repetition
            (3, "hi"),                         # < n tokens -> 0
            (4, "mail a@b.co and http://x.y/z plus 123456789"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r
            for r in pattern_counts(repetition_ratio(docs)).collect()}
    assert abs(rows[1]["rep_ratio"] - (1 - 1 / 3)) < 1e-6
    assert rows[2]["rep_ratio"] == 0.0
    assert rows[3]["rep_ratio"] == 0.0
    assert (rows[4]["n_emails"], rows[4]["n_urls"], rows[4]["n_long_numbers"]) \
        == (1, 1, 1)


def test_top_tokens_counts_and_rank(spark):
    from fastpasta_spark.operators.textstats import top_tokens

    df = spark.createDataFrame(
        [("apple banana apple",), ("banana apple cherry",), (None,)],
        "text string")
    rows = [(r.token, r.cnt, r.rank) for r in top_tokens(df, k=2).collect()]
    assert rows == [("apple", 3, 1), ("banana", 2, 2)]


def test_top_tokens_tie_break_deterministic(spark):
    from fastpasta_spark.operators.textstats import top_tokens

    df = spark.createDataFrame([("b a",), ("a b",)], "text string")
    rows = [(r.token, r.rank) for r in top_tokens(df, k=2).collect()]
    assert rows == [("a", 1), ("b", 2)]  # equal counts -> token asc


def test_unigram_logprob_model(spark):
    import math

    from fastpasta_spark.operators.textstats import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a zz"), (3, None)],
        "doc_id long, text string")
    rows = {r.doc_id: (r.n_tokens, r.avg_logprob)
            for r in unigram_logprob(df, vocab_k=2).collect()}
    # corpus: a x3, b x1, zz x1; head(k=2) = {a:3, b:1}; total=5, V=2
    # denom = 5 + 2 + 1 = 8; p(a)=4/8, p(b)=2/8, OOV floor = 1/8
    lp = lambda p: math.log(p)
    assert rows[1] == (3, round((2 * lp(0.5) + lp(0.25)) / 3, 4))
    assert rows[2] == (2, round((lp(0.5) + lp(0.125)) / 2, 4))
    assert rows[3] == (0, None)


def test_tokenizer_triple_agrees_on_hostile_unicode(spark):
    """spark_tokens == duckdb_tokens == py_tokens on inputs where the
    engines' Unicode case mappings disagree (lower('İ') differs between
    Java/Python and DuckDB) — the split-before-lower portability fix."""
    import duckdb

    from fastpasta_spark.functions.hashing import (
        duckdb_tokens, py_tokens, spark_tokens)

    hostile = ["İstanbul", "STRASSE ß", "K kelvin-sign", "ﬁnance ﬂight",
               "mixed𝔘𝔫𝔦ASCII99", "uPPer MiXeD cAsE 42", "A-B_C.D"]
    df = spark.createDataFrame([(t,) for t in hostile], "text string")
    got = {r.text: list(r.toks) for r in df.selectExpr(
        "text", f"{spark_tokens('text')} as toks").collect()}
    con = duckdb.connect()
    for t in hostile:
        d = con.execute(
            f"SELECT {duckdb_tokens('text')} FROM (SELECT ?::VARCHAR AS text)",
            [t]).fetchone()[0]
        assert got[t] == list(d) == py_tokens(t), t


def test_unigram_vocab_sql_safety_guard():
    # the vocab head is embedded as a SQL map() literal — only safe
    # while tokens stay [a-z0-9]; a tokenizer change that lets a quote
    # or backslash through must fail loudly, not inject
    import pytest

    from fastpasta_spark.operators.textstats import _assert_sql_safe_tokens

    _assert_sql_safe_tokens({"ok1": 3, "alpha": 1})
    for bad in ("it's", 'a"b', "a\\b", "", None, "café"):
        with pytest.raises(ValueError, match="SQL-literal"):
            _assert_sql_safe_tokens({bad: 1})


def test_redact_patterns(spark):
    from fastpasta_spark.operators.textstats import redact_patterns

    rows = [
        (1, "mail alice@example.com and see https://x.co/p?id=12345678 now"),
        (2, "card 1234567890123456 ok"),
        (3, None),
        (4, "clean text stays untouched"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text for r in redact_patterns(df).collect()}
    # email redacted BEFORE the number pass (order matters: the URL is
    # consumed whole incl. its digit run)
    assert got[1] == "mail [EMAIL] and see [URL] now"
    assert got[2] == "card [NUM] ok"
    assert got[3] is None
    assert got[4] == "clean text stays untouched"
    # out_col keeps the original when asked
    both = redact_patterns(df, out_col="clean").collect()
    assert all(r.text == dict(rows)[r.doc_id] for r in both)
