"""Distribution-drift checks: chi-square + KS against a golden profile.

north_rule mandate, modeled on the reference's golden-stats diff
(`/root/reference/fastpasta/src/stats/lib.rs:9-31` ``validate_fields!``
compares every stat field to a golden file; `controller.rs:152-179`).
We generalize the exact-equality diff to DISTRIBUTION comparison:

  * categorical columns (span kind mix, media types): chi-square over
    per-category counts,
  * numeric columns (text length): a KS statistic over a fixed-edge
    CDF sketch (histogram), not the exact empirical CDF.

Scale design: both reduce to per-partition histogram partials merged by
SUM — a plain groupBy/agg, i.e. the same mergeable partial+final shape
as the reference's stats funnel (controller.rs:112-248) and the
treeAggregate pattern. Nothing here shuffles more than
O(categories × partitions) rows. The final chi-square/KS arithmetic
happens on the merged (tiny) profile, still as Column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark import schema as S

# fixed histogram edges for text length — shared by profile and probe so
# the CDF sketches are comparable
LEN_EDGES = [0, 8, 16, 32, 64, 128, 256, 512, 1024, 1 << 30]


def kind_profile(docs: DataFrame) -> DataFrame:
    """(category, cnt) — span-kind distribution of a corpus."""
    return (
        docs.select(F.explode("spans").alias("s"))
        .groupBy(F.col("s.kind").alias("category"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def length_histogram(df: DataFrame, col: str = "text") -> DataFrame:
    """(category, cnt) — fixed-edge length histogram of ANY string
    column (the "length histograms" half of per-column stats). One
    groupBy over at most len(LEN_EDGES) buckets: map-side partials make
    the shuffle O(buckets × partitions) bytes regardless of table size."""
    edges = ", ".join(str(e) for e in LEN_EDGES[1:])
    bucket = F.expr(
        f"aggregate(array({edges}), 0, (acc, e) -> "
        "acc + IF(len >= e, 1, 0))"
    )
    return (
        df.select(F.length(F.coalesce(F.col(col), F.lit(""))).alias("len"))
        .select(F.concat(F.lit("len_bucket_"), bucket.cast("string")).alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def len_profile(docs: DataFrame) -> DataFrame:
    """(category, cnt) — text-span length histogram with fixed edges."""
    return length_histogram(
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == S.KIND_TEXT)
        .select(F.col("s.text").alias("text")),
        "text",
    )


def _merged_profiles(profile_a: DataFrame, profile_b: DataFrame) -> DataFrame:
    """Merge two (category, cnt) profiles into (category, cnt_a, cnt_b),
    missing sides as 0. Shared by chi_square / psi / ks_statistic so the
    merge semantics cannot drift between them.

    NULL is a legal category value (span kind is nullable in
    DOCS_SCHEMA), so the full-outer join key must be null-safe: a plain
    join-on-name never matches NULL keys and would split one NULL
    category into two one-sided rows — identical distributions would
    then report drift. The join is tiny (category domains) — broadcast.
    """
    a = profile_a.select(
        F.col("category").alias("_ca"), F.col("cnt").alias("cnt_a"))
    b = profile_b.select(
        F.col("category").alias("_cb"), F.col("cnt").alias("cnt_b"))
    return (
        a.join(F.broadcast(b), F.col("_ca").eqNullSafe(F.col("_cb")),
               "full_outer")
        # coalesce, not fillna-after-using-name: with distinct key names
        # both sides survive the join unambiguously, and a matched NULL
        # category stays NULL (both keys NULL) as it should
        .select(
            F.coalesce("_ca", "_cb").alias("category"),
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
    )


def chi_square(profile_a: DataFrame, profile_b: DataFrame) -> DataFrame:
    """Chi-square statistic between two (category, cnt) profiles.

    Returns one row: (chi2, dof, n_a, n_b). Uses the standard two-sample
    formula with scaled expectations; categories missing on one side
    count as zero.
    """
    joined = _merged_profiles(profile_a, profile_b)
    totals = joined.agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    j = joined.crossJoin(F.broadcast(totals))
    # two-sample chi-square: K1 = sqrt(n_b/n_a), K2 = sqrt(n_a/n_b)
    # try_divide: an empty/all-zero side (n_a or n_b = 0) must yield
    # chi2 = NULL (undefined statistic), not an ANSI DIVIDE_BY_ZERO —
    # matches DuckDB's x/0 -> NULL for any SQL oracle replaying this
    term = F.try_divide(
        (F.col("cnt_a") * F.sqrt(F.try_divide(F.col("n_b"), F.col("n_a")))
         - F.col("cnt_b") * F.sqrt(F.try_divide(F.col("n_a"), F.col("n_b"))))
        ** 2,
        F.col("cnt_a") + F.col("cnt_b"),
    )
    return j.agg(
        F.sum(term).alias("chi2"),
        (F.count(F.lit(1)) - 1).cast("int").alias("dof"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )


def psi(profile_a: DataFrame, profile_b: DataFrame,
        floor: float = 1e-6) -> DataFrame:
    """Population Stability Index between two (category, cnt) profiles.

    PSI = Σ (s_a − s_b) · ln(s_a / s_b) over the union of categories,
    where s_x is the category's share of profile x — the standard
    training-serving / corpus-mix drift score (PSI < 0.1 stable,
    0.1–0.25 moderate shift, > 0.25 major shift). Zero-count categories
    take ``floor`` as their share (the usual convention — keeps every
    term finite and makes a category appearing/vanishing contribute a
    large, bounded term).

    Same scale shape as chi_square: the inputs are already tiny merged
    profiles (O(categories) rows), so the join broadcasts and the
    arithmetic is pure Column expressions. An empty side yields a
    defined (large) PSI — every category floors on that side; two empty
    profiles yield NULL (sum over zero rows).

    The CASE-on-zero share never divides by zero even under ANSI mode:
    cnt > 0 in the divide branch implies total >= cnt > 0.
    """
    if floor <= 0:
        raise ValueError(f"floor must be > 0 (ln of a zero share), got {floor}")
    joined = _merged_profiles(profile_a, profile_b)
    totals = joined.agg(
        F.sum("cnt_a").alias("n_a"), F.sum("cnt_b").alias("n_b")
    )
    j = joined.crossJoin(F.broadcast(totals))
    s_a = F.when(F.col("cnt_a") == 0, F.lit(floor)).otherwise(
        F.col("cnt_a").cast("double") / F.col("n_a"))
    s_b = F.when(F.col("cnt_b") == 0, F.lit(floor)).otherwise(
        F.col("cnt_b").cast("double") / F.col("n_b"))
    return j.agg(
        F.sum((s_a - s_b) * F.log(s_a / s_b)).alias("psi"),
        F.count(F.lit(1)).cast("int").alias("categories"),
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
    )


def ks_statistic(profile_a: DataFrame, profile_b: DataFrame) -> DataFrame:
    """KS statistic over two fixed-edge histogram profiles.

    max |CDF_a - CDF_b| over the shared bucket edges — exactly the KS
    statistic of the sketched distributions. Window over ~10 buckets,
    driver-scale data.
    """
    from pyspark.sql import Window as W

    joined = _merged_profiles(profile_a, profile_b)
    w = W.orderBy("category").rowsBetween(W.unboundedPreceding, 0)
    tot = joined.agg(F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb"))
    cdf = (
        joined.crossJoin(F.broadcast(tot))
        # try_divide: empty profile (total 0) -> NULL CDF -> NULL ks,
        # not an ANSI DIVIDE_BY_ZERO crash
        .withColumn("cdf_a", F.try_divide(F.sum("cnt_a").over(w), F.col("ta")))
        .withColumn("cdf_b", F.try_divide(F.sum("cnt_b").over(w), F.col("tb")))
    )
    return cdf.agg(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))).alias("ks"))


def drift_violations(
    probe: DataFrame, golden_profile: DataFrame, chi2_threshold: float = 30.0
) -> DataFrame:
    """E120 violation rows when the probe's kind-mix drifts off golden."""
    stat = chi_square(kind_profile(probe), golden_profile)
    return stat.filter(F.col("chi2") > chi2_threshold).select(
        F.lit(None).cast("string").alias("doc_id"),
        F.lit(None).cast("int").alias("span_idx"),
        F.lit(-1).alias("offset"),
        F.lit(S.E120_DRIFT).alias("check_code"),
        F.lit(S.SEV_WARNING).alias("severity"),
        F.concat(
            F.lit("kind distribution drift: chi2="),
            F.round("chi2", 3).cast("string"),
            F.lit(" dof="), F.col("dof").cast("string"),
        ).alias("message"),
    )


def iqr_outliers(df: DataFrame, col: str, k: float = 1.5) -> DataFrame:
    """Tukey-fence outlier census over a numeric column: one row
    (lo, hi, n_below, n_above, n_rows) with fences q1 - k*IQR and
    q3 + k*IQR — the derived-threshold cousin of constraints.in_range
    (the range comes from the data's own distribution, the standard
    data-validation outlier gate).

    Scale shape: the fences are two scalars computed first (exact
    interpolated percentile here — at 100 TB swap in percentile_approx,
    same downstream shape) and collected like a codebook; the census is
    then ONE aggregation pass with the fences inlined as literals — no
    join, no second sort.
    """
    qs = df.agg(
        F.expr(f"percentile({col}, array(0.25, 0.75))")).first()[0]
    if qs is None:
        raise ValueError(
            f"iqr_outliers: no non-NULL values in column {col!r}")
    q1, q3 = qs
    lo = q1 - k * (q3 - q1)
    hi = q3 + k * (q3 - q1)
    return df.agg(
        F.lit(float(lo)).alias("lo"),
        F.lit(float(hi)).alias("hi"),
        F.sum((F.col(col) < lo).cast("long")).alias("n_below"),
        F.sum((F.col(col) > hi).cast("long")).alias("n_above"),
        F.count(col).alias("n_rows"),
    )
