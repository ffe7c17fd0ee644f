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


def stratified_entity_sample(
    df: DataFrame,
    max_entities: int,
    key: str = "conv_id",
) -> DataFrame:
    """Keep ≤ max_entities keys, evenly spaced over the sorted key space."""
    keys = df.select(key).distinct()
    n = keys.count()
    if n <= max_entities:
        return df
    step = n / float(max_entities)
    w = Window.orderBy(key)
    picked = (
        keys.withColumn("_rk", F.row_number().over(w) - 1)
        # linspace pick: floor(i*step) for i in 0..max-1  ⇔ keep ranks where
        # floor(rank/step) advances — identical spacing, no driver loop
        .where(F.floor(F.col("_rk") / step) != F.floor((F.col("_rk") - 1) / step))
        .select(key)
    )
    return df.join(F.broadcast(picked), key, "left_semi")


def deterministic_row_sample(df: DataFrame, every_k: int, key_cols: list[str]) -> DataFrame:
    """Keep rows where a stable hash of the key ≡ 0 (mod k) — reproducible,
    partition-independent row sampling for bounded-cost analysis passes."""
    h = F.abs(F.xxhash64(*key_cols))
    return df.where(h % every_k == 0)
