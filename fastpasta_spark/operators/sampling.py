"""Deterministic sampling + corpus-mix accounting for training pipelines.

Web-scale pipelines never use rand() sampling: results must be
reproducible across retries, resumes and cluster sizes, and a document
must keep/lose membership CONSISTENTLY when the job re-runs. The
standard primitive is hash-gate sampling — keep a row iff
``hash(id) mod D < rate * D`` — which this module implements with the
portable md5-derived hash (functions/hashing.py) so DuckDB oracles and
any other engine reproduce the exact sample.

Properties worth the name:
  * pure map — no shuffle, no state, embarrassingly parallel
  * composable: a 10% sample of a 50% sample equals a 5% sample when
    seeds differ, and sub-sampling with the SAME seed is a no-op
    (nested samples are nested sets)
  * stratified: per-stratum rates via a small broadcast rate table
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastpasta_spark.functions.hashing import spark_md5_hash

# denominator of the rate grid: rates are exact multiples of 1/DENOM
DENOM = 1_000_000


def hash_gate(id_col: str, rate: float, seed: int = 0) -> str:
    """SQL boolean expr: deterministic keep-gate at `rate` (grid 1e-6)."""
    thresh = int(round(rate * DENOM))
    h = spark_md5_hash(f"cast({id_col} as string)", seed=seed)
    return f"pmod({h}, {DENOM}) < {thresh}"


def sample_exact(df: DataFrame, id_col: str = "doc_id", rate: float = 0.1,
                 seed: int = 0) -> DataFrame:
    """Deterministic hash-gate sample: keeps each row iff its id hashes
    under the rate threshold. Same input + seed -> same sample, on any
    cluster, forever."""
    return df.filter(F.expr(hash_gate(id_col, rate, seed)))


def sample_stratified(df: DataFrame, strata_col: str, rates: dict[str, float],
                      id_col: str = "doc_id", seed: int = 0,
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. up/down-weight sources
    or languages in a training mix). `rates` maps stratum value -> keep
    rate; unlisted strata use default_rate.

    Scale: the rate table is inlined as a CASE expression (it is tiny
    by definition — strata are languages/sources, not documents), so
    the whole operator stays a shuffle-free map."""
    h = spark_md5_hash(f"cast({id_col} as string)", seed=seed)
    # parameterized rate table (Column API, not string-built SQL): a
    # stratum value containing a quote must stay a value, never syntax
    thresh = F.lit(int(round(default_rate * DENOM)))
    for k, v in rates.items():
        thresh = F.when(F.col(strata_col) == F.lit(k),
                        F.lit(int(round(v * DENOM)))).otherwise(thresh)
    return df.filter(F.expr(f"pmod({h}, {DENOM})") < thresh)


def sample_k_per_stratum(df: DataFrame, strata_col: str, k: int,
                         id_col: str = "doc_id", seed: int = 0,
                         oversample: float = 4.0) -> DataFrame:
    """Exactly min(k, stratum size) rows per stratum, chosen
    deterministically: the k smallest ids in the seeded md5-hash order.
    Same input + seed -> same rows, on any cluster, forever; and the
    sample NESTS — k'=10 picks a subset of k=100 (both are prefixes of
    the same hash order), so shrinking a budget never churns membership.

    Scale design: the naive form — row_number() over every stratum —
    range-shuffles the WHOLE corpus to pick k rows per stratum. Instead,
    phase 1 computes per-stratum counts (map-side-combined agg) and
    derives a hash-gate threshold keeping ~oversample*k rows per
    stratum; the gate is a broadcast-joined map-side filter, so the
    window only shuffles the ~oversample*k survivors per stratum. The
    gate keeps exactly a PREFIX of the hash order, so whenever >= min(k,
    n) rows survive, the window's top-k equals the full stratum's top-k
    — exactness is checked per stratum, and deficient strata (possible
    only in the far tail of the binomial at oversample >= 4) re-run
    ungated. Strata are languages/sources — the deficiency check
    collects O(strata) rows, never data.

    Rows with a NULL id are never sampled — they have no deterministic
    hash identity, matching the whole hash-gate family (where the NULL
    gate silently drops them). Excluding them explicitly keeps the
    ungated deficiency re-run consistent with the gated path (a NULL
    hash would otherwise rank FIRST in the window there).

    The gated survivor set (~oversample*k rows per stratum) registers a
    tracked persist (functions/cache) so the deficiency-check job and
    the caller's action share one corpus scan; release with
    release_tracked() after consuming the result.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from pyspark.sql import Window as W

    from fastpasta_spark.functions.cache import tracked_persist

    df = df.filter(F.col(id_col).isNotNull())
    h = F.expr(f"pmod({spark_md5_hash(f'cast({id_col} as string)', seed=seed)}, "
               f"{DENOM})")

    order = [h.asc(), F.col(id_col).asc()]
    rn = F.row_number().over(
        W.partitionBy(strata_col).orderBy(*order))

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    # gate threshold: expected survivors = oversample*k (whole stratum
    # when it is small enough that the gate buys nothing)
    thresh = F.when(
        F.col("_n") <= F.lit(int(oversample * k)), F.lit(DENOM)
    ).otherwise(
        F.least(F.lit(DENOM),
                F.ceil(F.lit(float(DENOM) * oversample * k) / F.col("_n"))
                .cast("int"))
    ).alias("_thresh")
    # distinct name for the gate key: gates derives FROM df, so joining
    # df[col] to gates[col] would lean on dataset-id disambiguation of
    # an ambiguous self-join (Spark warns 'trivially true predicate')
    gates = counts.select(
        F.col(strata_col).alias("_stratum"), "_n", thresh)

    gated = tracked_persist(df.join(
        F.broadcast(gates),
        F.col(strata_col).eqNullSafe(F.col("_stratum")), "inner",
    ).drop("_stratum").filter(h < F.col("_thresh")))

    # exactness check: a stratum whose survivors undershot min(k, n)
    # must re-run ungated (the gate cut into its true top-k). Derive
    # shortness from the gate table LEFT-joined with survivor counts —
    # a stratum whose gate filtered out EVERY row has no group in
    # `gated` and would be invisible to a survivors-only groupBy
    # (P(zero survivors) ~ e^-(oversample*k) per large stratum)
    surv = gated.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_s"))
    short = [
        r[0] for r in gates.join(
            surv, F.col("_stratum").eqNullSafe(F.col(strata_col)), "left")
        .filter(F.coalesce(F.col("_s"), F.lit(0))
                < F.least(F.lit(k), F.col("_n")))
        .select("_stratum").collect()
    ]
    if short:
        vals = [s for s in short if s is not None]
        isin = F.col(strata_col).isin(vals) if vals else F.lit(False)
        if any(s is None for s in short):
            isin = isin | F.col(strata_col).isNull()
        full = df.filter(isin).join(
            F.broadcast(gates),
            F.col(strata_col).eqNullSafe(F.col("_stratum")),
            "inner").drop("_stratum")
        gated = gated.filter(~isin.eqNullSafe(F.lit(True))).unionByName(full)

    return (gated.withColumn("_rn", rn)
            .filter(F.col("_rn") <= k)
            .drop("_rn", "_n", "_thresh"))


def importance_resample(df: DataFrame, weight_col: str, k: int,
                        id_col: str = "doc_id", seed: int = 0,
                        temperature: float = 1.0) -> DataFrame:
    """Deterministic importance resampling: exactly min(k, n) rows drawn
    WITHOUT replacement with probability proportional to
    ``exp(weight_col / temperature)`` — the resampling step of DSIR
    (Xie et al. 2023): feed ``dsir_weights(append=True)`` output here
    and the sample converges on the importance-weighted target mix.
    ``weight_col`` is a LOG weight (dsir_logratio, avg_logprob, any
    log-scale signal); for linear weights pass ln(w). ``temperature``
    flattens (T > 1) or sharpens (T < 1) the draw.

    Method: the Efraimidis–Spirtakis weighted order. Each row gets
    u = (gate + 1) / (DENOM + 1) in (0, 1] from the seeded portable md5
    gate, and key = ln(u) / w with w = exp(weight / T); the k LARGEST
    keys are exactly a weight-proportional without-replacement sample.
    Deterministic given (input, seed); NESTS across budgets (keys are
    fixed per row, so top-10 is a subset of top-100); and reproducible
    in any engine — the key is rounded to 9 dp so cross-engine libm ulp
    differences collapse near-ties into exact ties, which break by id.

    Scale shape: a pure map computes the key, then the top-k plans as
    TakeOrderedAndProject — per-partition k-row heaps merged on the
    driver, never a global sort, and the corpus never shuffles. The
    merge MATERIALIZES k rows on the driver: keep k under ~10^6 full
    rows (or select thin columns first). For a larger draw, partition
    the corpus into hash shards (packing.assign_shards) and draw
    k/n_shards per shard with per-shard seeds — shard assignment is
    weight-independent, so the union stays weight-proportional while
    every merge remains driver-small. Rows
    with a NULL or NaN id/weight are never sampled (no deterministic
    hash identity / no weight; NaN sorts GREATER than every real key
    under Spark's ordering and would otherwise always win the draw),
    consistent with the hash-gate family.
    Keep |weight / temperature| < ~700 or exp() saturates to inf/0 and
    the proportionality (not determinism) degrades.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if not temperature > 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    h = spark_md5_hash(f"cast({id_col} as string)", seed=seed)
    u = f"(CAST(pmod({h}, {DENOM}) + 1 AS DOUBLE) / {DENOM + 1}.0D)"
    key = F.round(
        F.expr(f"ln({u})")
        * F.exp(-F.col(weight_col) / F.lit(float(temperature))), 9)
    w = F.col(weight_col).cast("double")
    return (
        df.filter(F.col(id_col).isNotNull() & w.isNotNull() & ~F.isnan(w))
        .withColumn("_ikey", key)
        .orderBy(F.desc("_ikey"), F.col(id_col).asc())
        .limit(k)
        .drop("_ikey")
    )


def mix_report(df: DataFrame, strata_cols: tuple[str, ...] = ("lang_pred",),
               token_col: str = "n_tokens") -> DataFrame:
    """Training-mix accounting: per-stratum doc counts, token sums and
    corpus shares — the report a data-mixing decision reads. One
    groupBy over small key columns; token shares computed from a
    broadcast single-row total."""
    per = df.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(token_col).alias("tokens"),
    )
    total = per.agg(F.sum("tokens").alias("_tt"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            *strata_cols, "docs", "tokens",
            # try_divide: an all-zero-token corpus makes _tt = 0, and a
            # bare '/' THROWS under ANSI mode; NULL share matches DuckDB
            F.round(F.try_divide(F.col("tokens"), F.col("_tt")), 6)
            .alias("token_share"),
        )
    )


def temperature_rates(shares: dict[str, float], temperature: float = 0.7,
                      ) -> dict[str, float]:
    """Downsample-only keep rates that move a corpus mix toward its
    temperature-flattened target — the standard multilingual/source
    rebalancing rule (sample stratum i with probability proportional to
    share_i^T, T<1 flattening head strata toward the tail).

    Given observed token shares s_i (from mix_report), the target mix is
    q_i = s_i^T / sum_j s_j^T. Keep rates are r_i = (q_i / s_i) scaled
    so max(r) = 1 — the largest upweight becomes "keep everything" and
    every other stratum downsamples relative to it, so no stratum needs
    duplication. Feed the result straight into sample_stratified (rates
    snap to its 1e-6 grid there).

    T = 1 returns all-1.0 (identity); T -> 0 approaches a uniform mix.
    Zero/absent shares get rate 0 (nothing to sample).
    """
    if not 0 < temperature <= 1:
        raise ValueError("temperature must be in (0, 1]")
    pos = {k: s for k, s in shares.items() if s > 0}
    if not pos:
        return {k: 0.0 for k in shares}
    total_t = sum(s ** temperature for s in pos.values())
    ratio = {k: (s ** temperature / total_t) / s for k, s in pos.items()}
    top = max(ratio.values())
    return {k: (ratio[k] / top if k in ratio else 0.0) for k in shares}


def temperature_rebalance(df: DataFrame, strata_col: str,
                          temperature: float = 0.7,
                          id_col: str = "doc_id", text_col: str = "text",
                          seed: int = 0):
    """End-to-end training-mix rebalancing: measure the corpus's
    per-stratum token shares, derive downsample-only keep rates that
    move the mix toward its temperature-flattened target
    (:func:`temperature_rates`), and apply them with the deterministic
    hash gate (:func:`sample_stratified`). Returns
    ``(sampled_df, report_df)`` where the report has one row per
    stratum: docs, tokens, token_share, keep_rate.

    Scale shape: one token-count scan + a <=|strata|-key groupBy for
    the measurement (the collected report is bounded by the number of
    strata — languages/sources, never documents), then a pure map-side
    gate; the corpus is never shuffled. Deterministic end-to-end:
    same (input, temperature, seed) -> same sample on any cluster.
    """
    from fastpasta_spark.operators.textstats import token_count

    counted = token_count(df.select(id_col, strata_col, text_col), text_col)
    report = mix_report(counted, strata_cols=(strata_col,),
                        token_col="n_tokens")
    rows = report.collect()  # bounded: one row per stratum
    # UNROUNDED shares from the raw token sums: mix_report's
    # token_share is display-rounded to 6 dp, which zeroes any stratum
    # under ~0.5 ppm of tokens and would DELETE exactly the tail
    # temperature flattening exists to upweight (review finding)
    total = sum((r["tokens"] or 0) for r in rows)
    shares = {r[strata_col]: ((r["tokens"] or 0) / total if total else 0.0)
              for r in rows if r[strata_col] is not None}
    rates = temperature_rates(shares, temperature)
    sampled = sample_stratified(df, strata_col, rates, id_col=id_col,
                                seed=seed, default_rate=0.0)
    # report assembled DRIVER-SIDE from the rows already collected —
    # deriving it lazily from `report` would re-run the full corpus
    # token scan when the caller collects it (review finding)
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType([
        report.schema[strata_col],
        StructField("docs", LongType()),
        StructField("tokens", LongType()),
        StructField("token_share", DoubleType()),
        StructField("keep_rate", DoubleType()),
    ])
    out_rows = [
        (r[strata_col], r["docs"], r["tokens"], r["token_share"],
         round(float(rates.get(r[strata_col], 0.0)), 6)
         if r[strata_col] is not None else 0.0)
        for r in rows
    ]
    out_report = df.sparkSession.createDataFrame(out_rows, schema)
    return sampled, out_report
