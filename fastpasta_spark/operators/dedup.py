"""Deduplication operators for training-data pipelines.

Beyond the reference's key-dedup (distinct FEE ids,
`/root/reference/fastpasta/src/stats/rdh_stats.rs:93-98`), a 100 TB
corpus needs CONTENT dedup. All hot paths are built-in Column
expressions (whole-stage codegen); hashes are the portable md5-derived
family (functions/hashing.py) so DuckDB oracles reproduce them exactly.

Scale notes per operator are in each docstring — the common theme:
never shuffle document text; shuffle (hash, id) pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark.functions.hashing import spark_md5_hash, spark_tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact content duplicates via content-hash groupBy.

    Scale: only (hash, id) shuffles — map-side partial agg collapses
    per-partition duplicates first; text never leaves the scan stage.
    Returns (content_hash, dup_count, doc_ids sorted).
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.array_sort(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    """DISTINCT word n-gram shingles as an array column (JVM-side)."""
    toks = spark_tokens(text_col)
    expr = (
        f"array_distinct(CASE WHEN size({toks}) < {n} "
        f"THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n}))) END)"
    )
    return df.withColumn(out_col, F.expr(expr))


def minhash_signature(df: DataFrame, k: int = 32, shingle_col: str = "shingles",
                      out_col: str = "minhash") -> DataFrame:
    """k-permutation MinHash signature over the shingle set.

    Each permutation j is min over shingles of the portable seeded hash
    md5('<j>:' || shingle). ONE nested-lambda expression — the seed j
    comes from the outer transform variable, so the (expensive) shingle
    array is referenced once; k separate expressions would make
    ProjectionCollapse inline and recompute the tokenize+shingle chain
    k times (measured ~8x slower). No UDF, no shuffle.
    """
    seeded = ("cast(conv(substr(md5(concat(cast(j as string), ':', s)), 1, 15), "
              "16, 10) as bigint)")
    return df.withColumn(
        out_col,
        F.expr(
            f"transform(sequence(0, {k - 1}), j -> "
            f"array_min(transform({shingle_col}, s -> {seeded})))"
        ),
    )


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id", bands: int = 8,
                        rows_per_band: int = 4,
                        minhash_col: str = "minhash",
                        max_bucket: int = 200) -> DataFrame:
    """Banded-LSH candidate pairs: band the signature, hash each band to a
    bucket, self-join within buckets.

    Scale levers (all applied):
      * buckets larger than max_bucket are dropped BEFORE the self-join —
        a giant bucket means a band of near-universal shingles
        (boilerplate); its pairs are noise and would cost |bucket|^2
      * the similarity estimate is computed IN the join projection so
        only (doc_a, doc_b, est) ever shuffles afterwards
      * cross-band duplicates collapse via groupBy, not dropDuplicates
        over signature arrays
    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b.
    """
    from pyspark.sql import Window as W

    band_exprs = [
        F.md5(F.concat_ws(",", F.lit(b), F.expr(
            f"concat_ws(',', slice({minhash_col}, {b * rows_per_band + 1}, "
            f"{rows_per_band}))"
        ))).alias("bucket")
        for b in range(bands)
    ]
    buckets = (
        df.select(F.col(id_col), F.col(minhash_col),
                  F.explode(F.array(*band_exprs)).alias("bucket"))
        .withColumn("_bsz", F.count(F.lit(1)).over(W.partitionBy("bucket")))
        .filter(F.col("_bsz") <= max_bucket)
        .drop("_bsz")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    est = F.expr(
        f"size(filter(zip_with(a.{minhash_col}, b.{minhash_col}, "
        f"(x, y) -> x = y), v -> v)) / CAST(size(a.{minhash_col}) AS DOUBLE)"
    )
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
                est.alias("est_jaccard"))
        .groupBy("doc_a", "doc_b")
        .agg(F.first("est_jaccard").alias("est_jaccard"))
    )


def minhash_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n: int = 3, k: int = 32,
                            bands: int = 8, threshold: float = 0.5) -> DataFrame:
    """shingle -> minhash -> LSH bands -> candidate pairs >= threshold.

    The signature table is persisted: it is tiny (k longs per doc) but
    referenced ~10x downstream (8 band exprs + both self-join sides);
    without the materialization boundary ProjectionCollapse inlines the
    full tokenize+shingle+k-hash chain into every reference (measured
    >10x slowdown). At cluster scale you would write signatures to a
    bucketed table instead — same boundary, durable.
    """
    sig = minhash_signature(with_shingles(df, text_col, n), k=k).select(
        id_col, "minhash").persist()
    pairs = lsh_candidate_pairs(sig, id_col, bands=bands, rows_per_band=k // bands)
    return pairs.filter(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (the verifier for LSH candidates; also standalone)
# ---------------------------------------------------------------------------


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, threshold: float = 0.5,
                  within_col: str | None = None,
                  max_df: int | None = None) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs sharing >=1 shingle.

    Scale: inverted-index join — explode distinct shingles, self-join on
    the shingle (only ids + one shingle string shuffle), count shared
    shingles per pair, then jaccard = shared / (|A| + |B| - shared).
    At web scale you run this ONLY on LSH candidates; standalone it's
    quadratic in the worst case (all docs sharing a shingle).

    max_df caps a shingle's document frequency: shingles occurring in
    more than max_df docs are dropped from the INDEX (not from |A|/|B|)
    — the standard boilerplate-shingle mitigation; candidate-pair volume
    falls from sum(df^2) to sum(min(df, max_df)^2). With a cap the
    jaccard of pairs sharing mostly-common shingles is underestimated;
    document it as df-capped jaccard (oracle applies the same cap).
    within_col optionally restricts pairs to the same group (e.g. source).
    """
    sh = with_shingles(df, text_col, n).select(
        F.col(id_col), F.col("shingles"),
        *( [F.col(within_col)] if within_col else [] ),
    ).withColumn("n_sh", F.expr("size(shingles)"))
    inv = sh.select(
        F.col(id_col), F.col("n_sh"),
        *( [F.col(within_col)] if within_col else [] ),
        F.explode("shingles").alias("shingle"),
    )
    if max_df is not None:
        from pyspark.sql import Window as W

        inv = (
            inv.withColumn("_df", F.count(F.lit(1)).over(W.partitionBy("shingle")))
            .filter(F.col("_df") <= max_df)
            .drop("_df")
        )
    a, b = inv.alias("a"), inv.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if within_col:
        cond = cond & (F.col(f"a.{within_col}") == F.col(f"b.{within_col}"))
    shared = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        shared.select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, text_col: str = "text", bits: int = 32,
            out_col: str = "simhash") -> DataFrame:
    """SimHash fingerprint: for each bit b, sign of sum over distinct
    tokens of (+1 if bit b of token-hash set else -1).

    Pure Column expressions: one token-hash array, then a per-bit
    aggregate over it — no explode, no shuffle (fingerprinting is
    embarrassingly parallel). Near-dup detection groups by hamming
    bands of the fingerprint.
    """
    toks = f"array_distinct({spark_tokens(text_col)})"
    hashes = f"transform({toks}, t -> {spark_md5_hash('t')})"
    bit_terms = " + ".join(
        f"CAST(IF(aggregate({hashes}, 0L, (acc, h) -> "
        f"acc + IF((h >> {b}) % 2 = 1, 1, -1)) > 0, {1 << b}, 0) AS BIGINT)"
        for b in range(bits)
    )
    # evaluate the token-hash array once per row via a lateral-style select
    return df.withColumn(out_col, F.expr(bit_terms))


def simhash_duplicates(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", bits: int = 32,
                       max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """Near-dups by SimHash: band the fingerprint into `bands` chunks;
    pairs within hamming distance < bands must share >=1 exact band
    (pigeonhole) -> band-bucket join, then exact hamming filter."""
    # persist: the fingerprint expr is referenced by `bands` band exprs +
    # both join sides — same ProjectionCollapse inlining hazard as minhash
    h = simhash(df, text_col, bits).select(id_col, "simhash").persist()
    chunk = bits // bands
    band_cols = [
        F.expr(
            f"concat('{b}:', CAST(pmod(shiftright(simhash, {b * chunk}), "
            f"{1 << chunk}) AS STRING))"
        ).alias("bucket")
        for b in range(bands)
    ]
    buckets = h.select(F.col(id_col), F.col("simhash"),
                       F.explode(F.array(*band_cols)).alias("bucket"))
    a, b2 = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(b2, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
                F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.expr(
        f"size(filter(sequence(0, {bits - 1}), "
        "b -> ((h_a >> b) % 2) <> ((h_b >> b) % 2)))"
    )
    return pairs.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
