"""Two-phase statistics + broadcast linear normalization.

Reference parity targets:
- global mean/var over valid values (``extract_f0_statistics.py:29-36``;
  **population** variance — ``numpy.var`` — so ``var_pop``, not Spark's
  default ``var_samp``).
- linear stat conversion ``F0.convert``
  (``/root/reference/src/acoustic_feature_extractor/data/f0.py:92-126``):
  ``x' = (tv/iv)·(x − im) + tm`` where (im, iv) are input mean/std-like
  stats and (tm, tv) targets, applied only to valid entries (invalid stay
  untouched/zero).
- grouped summaries (``analyze_ebur128.py:31-56``).

Catalyst plans partial+final HashAggregate automatically (the reference's
driver-side final aggregate, SURVEY.md §3.2); the stats side is tiny and
broadcast into the projection — no second shuffle over the fact table.
"""

from __future__ import annotations

from acoustic_feature_extractor_spark.plans.hints import maybe_broadcast
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def corpus_stats(
    df: DataFrame,
    value_col: str,
    valid_col: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """mean / var_pop / stddev_pop / count over valid rows, optionally grouped."""
    src = df.where(F.col(valid_col)) if valid_col else df
    aggs = [
        F.mean(value_col).alias("mean"),
        F.var_pop(value_col).alias("var"),
        F.stddev_pop(value_col).alias("stddev"),
        F.count(value_col).alias("n"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
    ]
    if group_cols:
        return src.groupBy(*group_cols).agg(*aggs)
    return src.agg(*aggs)


def normalize(
    df: DataFrame,
    value_col: str,
    stats: DataFrame,
    target_mean: float = 0.0,
    target_var: float = 1.0,
    valid_col: str | None = None,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Linear conversion ``x' = (tv/iv)·(x − im) + tm`` (``f0.py:119-123``).

    ``stats`` is the tiny output of :func:`corpus_stats` — broadcast-joined
    (grouped) or cross-broadcast (global, 1 row). ``tv``/``iv`` are
    standard-deviation-like scales: the reference passes ``var`` fields that
    its formula treats as scales; we use stddev_pop for z-score semantics
    and keep the reference's exact formula shape. Invalid rows pass through
    unchanged (``f0.py:117-124`` masks on vuv).
    """
    out_col = out_col or f"{value_col}_norm"
    sel = stats.select(
        *(group_cols or []),
        F.col("mean").alias("_im"),
        F.col("stddev").alias("_iv"),
    )
    if group_cols:
        j = df.join(maybe_broadcast(sel), group_cols, "left")
    else:
        j = df.crossJoin(maybe_broadcast(sel))
    import math

    tv = math.sqrt(target_var)
    # constant-valued group => stddev 0: every value IS the mean, so the
    # normalized value is target_mean (a bare division would abort the job
    # under Spark 4's default ANSI mode)
    converted = F.when(
        F.col("_iv") != 0.0,
        (F.lit(tv) / F.col("_iv")) * (F.col(value_col) - F.col("_im"))
        + F.lit(target_mean),
    ).otherwise(F.lit(float(target_mean)))
    if valid_col:
        converted = F.when(F.col(valid_col), converted).otherwise(F.col(value_col))
    return j.withColumn(out_col, converted).drop("_im", "_iv")


def winsorize(
    df: DataFrame,
    value_col: str,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Clip ``value_col`` to its exact [q_lo, q_hi] percentile bounds.

    The outlier-capping stage of a feature pipeline (the reference trims
    by percentile range before computing statistics,
    ``extract_f0_range.py:307-353``; winsorizing is the keep-the-row
    variant). Exact ``percentile`` (linear interpolation — numpy/DuckDB
    ``quantile_cont`` semantics); at 10^12 rows substitute
    ``percentile_approx`` via ``exact=False``-style callers. The bounds
    table is one row (global) or one per group — broadcast back, fact
    table shuffles zero times in the global case.
    """
    out_col = out_col or f"{value_col}_w"
    aggs = [
        F.expr(f"percentile({value_col}, {float(q_lo)})").alias("_lo"),
        F.expr(f"percentile({value_col}, {float(q_hi)})").alias("_hi"),
    ]
    if group_cols:
        bounds = df.groupBy(*group_cols).agg(*aggs)
        j = df.join(maybe_broadcast(bounds), group_cols, "left")
    else:
        bounds = df.agg(*aggs)
        j = df.crossJoin(maybe_broadcast(bounds))
    clipped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return j.withColumn(out_col, clipped).drop("_lo", "_hi")


def all_same_filter(
    df: DataFrame, value_col: str, key: str = "conv_id"
) -> DataFrame:
    """Drop entities whose value is constant (``sampling_data.all_same``,
    used by ``extract_splited_local.py:28-31``). Anti-join on min==max —
    two-phase agg + broadcast anti, no full shuffle of the fact table."""
    degenerate_keys = (
        df.groupBy(key)
        .agg(F.min(value_col).alias("_mn"), F.max(value_col).alias("_mx"))
        .where(F.col("_mn") == F.col("_mx"))
        .select(key)
    )
    # degenerate-key set is fact-scaled: estimate-gated hint
    return df.join(maybe_broadcast(degenerate_keys), key, "left_anti")


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    threshold: float = 3.5,
    z_col: str = "robust_z",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Median/MAD outlier scoring (Iglewicz-Hoaglin modified z-score):
    ``z = 0.6745 * (x - median) / MAD``, outlier when ``|z| > threshold``
    (3.5 is the published default). Robust where the mean/std z-score is
    not: a handful of corrupt 10^9-length documents cannot drag the
    center or the scale.

    Plan shape: two tiny exact-percentile aggregates (median, then median
    of |x - median|) broadcast back into a projection — the fact table
    shuffles ZERO times. Degenerate groups (MAD = 0, i.e. >= half the
    values sit exactly on the median) get ``z = null``; a row is then
    flagged only if it differs from the median at all.
    """
    gcols = group_cols or []
    med = df.groupBy(*gcols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    d = df.join(maybe_broadcast(med), gcols) if gcols else df.crossJoin(maybe_broadcast(med))
    d = d.withColumn("_ad", F.abs(F.col(value_col) - F.col("_med")))
    mad = d.groupBy(*gcols).agg(F.expr("percentile(_ad, 0.5)").alias("_mad"))
    d = d.join(maybe_broadcast(mad), gcols) if gcols else d.crossJoin(maybe_broadcast(mad))
    z = F.when(
        F.col("_mad") > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col("_med")) / F.col("_mad"),
    )
    d = d.withColumn(z_col, z)
    flag = F.when(F.col("_mad") > 0, F.abs(F.col(z_col)) > F.lit(float(threshold))).otherwise(
        F.col("_ad") > 0
    )
    return d.withColumn(flag_col, flag).drop("_med", "_mad", "_ad")


def population_stability(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index drift monitor between a reference slice
    and a current slice of a feature column (the standard production
    check that a feature's distribution hasn't drifted between training
    and serving — or between two ingest windows of a 100 TB corpus).

    Bin edges are the reference slice's exact ``k/bins`` quantiles
    (Spark ``percentile`` ⇔ DuckDB ``quantile_cont``, the repo's pinned
    pair), so the reference lands ~uniformly and PSI reads in the usual
    calibration (<0.1 stable, >0.25 drifted). Both slices bucket with the
    same open-ended edges: ``bin = 1 + Σ (v > cut_k)``.

    Returns one row per (group, bin): counts, Laplace-smoothed shares
    ``p`` (ref) / ``q`` (cur), and the PSI term ``(p−q)·ln(p/q)`` — sum
    the terms for the scalar PSI; keeping the per-bin table makes the
    drift LOCATABLE (which part of the distribution moved).

    Scale shape: the cut table is ``|groups|`` rows (broadcast); each
    slice then does ONE map-side bucket projection + ONE partial-agg
    groupBy on (group, bin) — two scans, no join of fact tables, mergeable
    across partitions by construction. Empty bins still appear (dense
    ``sequence`` spine per group), so PSI never silently drops a bucket.
    """
    by = by or []
    qs = [k / bins for k in range(1, bins)]
    agg = F.expr(
        f"percentile({value_col}, array({','.join(str(q) for q in qs)}))"
    ).alias("_cuts")
    cuts = ref.groupBy(*by).agg(agg) if by else ref.agg(agg)

    def bucketed(df: DataFrame, side: str) -> DataFrame:
        j = (
            df.join(maybe_broadcast(cuts), by)
            if by
            else df.crossJoin(maybe_broadcast(cuts))
        )
        b = F.lit(1) + F.aggregate(
            F.col("_cuts"),
            F.lit(0),
            lambda acc, c: acc + F.when(F.col(value_col) > c, 1).otherwise(0),
        )
        return (
            j.withColumn("_bin", b)
            .groupBy(*by, "_bin")
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )
    r = bucketed(ref, "ref")
    c = bucketed(cur, "cur")
    # dense bin spine per group: a bucket empty on one side must still
    # contribute its smoothed term
    spine = cuts.select(*by).withColumn(
        "_bin", F.explode(F.sequence(F.lit(1), F.lit(bins)))
    )
    out = (
        spine.join(r, [*by, "_bin"], "left")
        .join(c, [*by, "_bin"], "left")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    tot_r = F.sum("n_ref").over(Window.partitionBy(*by) if by else Window.partitionBy())
    tot_c = F.sum("n_cur").over(Window.partitionBy(*by) if by else Window.partitionBy())
    p = (F.col("n_ref") + F.lit(eps)) / (tot_r + F.lit(eps * bins))
    q = (F.col("n_cur") + F.lit(eps)) / (tot_c + F.lit(eps * bins))
    return out.select(
        *by,
        F.col("_bin").alias("bin"),
        "n_ref",
        "n_cur",
        p.alias("p"),
        q.alias("q"),
        ((p - q) * F.log(p / q)).alias("psi_term"),
    )
