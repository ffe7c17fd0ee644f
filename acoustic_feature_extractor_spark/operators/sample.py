"""Deterministic sampling / limiting (reference A8, O2).

The reference bounds cost by picking ≤ max_num files via a linspace over
the sorted list (``/root/reference/src/extractor/extract_f0_range.py:177-184``)
— a deterministic stratified subsample. Ours: rank entities and keep every
k-th, which preserves the "evenly spaced over the sorted key" property and
is fully distributed (no collect, one small agg for the count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acoustic_feature_extractor_spark.functions.scalars import searchsorted


def stratified_entity_sample(
    df: DataFrame,
    max_entities: int,
    key: str = "conv_id",
    num_chunks: int | None = None,
) -> DataFrame:
    """Keep ≤ max_entities keys, evenly spaced over the sorted key space.

    The global rank is computed WITHOUT a single-partition window (the
    10^10-entity anti-pattern): keys chunk on driver-collected literal
    boundary keys (a deterministic function of the key, stable across
    plan re-execution), rank locally per chunk, and add tiny broadcast
    chunk-count offsets — the same two-phase shape as the distributed
    weighted percentile.
    """
    keys = df.select(key).distinct()
    n = keys.count()
    if n <= max_entities:
        return df
    spark = df.sparkSession
    n_chunks = num_chunks or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # boundary keys: deterministic hash-strided sample, any spacing works
    stride = max(2, n // n_chunks)
    bounds = sorted(
        r[key]
        for r in keys.where(F.pmod(F.xxhash64(F.col(key).cast("string")), F.lit(stride)) == 0)
        .limit(n_chunks - 1)
        .collect()
    )
    # log-depth CASE tree (codegen'd) instead of a linear interpreted HOF
    pid = searchsorted(key, bounds)
    k = keys.withColumn("_pid", pid)
    w_local = Window.partitionBy("_pid").orderBy(key)
    k = k.withColumn("_lrk", F.row_number().over(w_local) - 1)
    counts = k.groupBy("_pid").agg(F.count("*").alias("_n"))
    # counts is n_chunks rows; constant partition key = explicit single
    # partition without the global-window warning. pmod(_pid, 1), NOT
    # _pid * 0 or lit(0): Catalyst simplifies both of those to a foldable
    # literal and then drops the partition spec entirely
    w_off = Window.partitionBy(F.pmod(F.col("_pid"), F.lit(1))).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
    k = k.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
    step = n / float(max_entities)
    rk = (F.col("_lrk") + F.col("_off")).cast("double")
    # linspace pick: floor(i*step) for i in 0..max-1  ⇔ keep ranks where
    # floor(rank/step) advances — identical spacing, no driver loop
    picked = k.where(F.floor(rk / step) != F.floor((rk - 1) / step)).select(key)
    return df.join(F.broadcast(picked), key, "left_semi")


def deterministic_row_sample(df: DataFrame, every_k: int, key_cols: list[str]) -> DataFrame:
    """Keep rows where a stable hash of the key ≡ 0 (mod k) — reproducible,
    partition-independent row sampling for bounded-cost analysis passes."""
    h = F.abs(F.xxhash64(*key_cols))
    return df.where(h % every_k == 0)
