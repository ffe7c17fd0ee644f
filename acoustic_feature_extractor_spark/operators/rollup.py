"""Time-bucketed (hypertable-style) rollups + re-aggregation cascades.

The reference's statistics sink reduces each file to one summary row
(``extract_f0_statistics.py:28-41``); the charter's scale analog is the
TimescaleDB/Druid continuous-aggregate pattern: reduce an event stream to
per-(entity, time-bucket) summary rows once at fine grain, then answer
every coarser-grain question by RE-aggregating the tiny rollup instead of
rescanning the fact table.

Scale shape: one ``groupBy(bucket, entity)`` — Catalyst plans it
partial/final, so the shuffle carries one row per (entity, bucket) per
task, never raw events. A cascade level re-aggregates the previous level:
at 10^12 events, hour→day→month touches the fact table exactly once.

Only decomposable aggregates may cascade (count/sum/min/max re-aggregate
losslessly; avg is carried as sum+count and finalized per level —
averaging averages would weight buckets, not rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, bucket_seconds: float) -> Column:
    """Bucket start (timestamp) of ``ts``: floor(epoch / w) * w — the
    standard hypertable bucketing transform, a pure projection."""
    c = F.col(ts) if isinstance(ts, str) else ts
    secs = F.lit(float(bucket_seconds))
    e = c.cast("timestamp").cast("double")
    return (F.floor(e / secs) * secs).cast("timestamp")


def rollup(
    df: DataFrame,
    bucket_seconds: float,
    by: str | list[str],
    value_col: str,
    ts: str = "ts",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Per-(entity, bucket) summary: n / sum / min / max / first_ts /
    last_ts, plus ``avg`` finalized from sum & n. All decomposable, so the
    output is itself the input of :func:`rollup_coarser`."""
    by_cols = [by] if isinstance(by, str) else list(by)
    v = F.col(value_col)
    return (
        df.withColumn(bucket_col, time_bucket(ts, bucket_seconds))
        .groupBy(*by_cols, bucket_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("sum_v"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts"),
        )
        .withColumn("avg_v", F.col("sum_v") / F.col("n"))
    )


def rollup_coarser(
    fine: DataFrame,
    bucket_seconds: float,
    by: str | list[str],
    bucket_col: str = "bucket",
    fine_seconds: float | None = None,
) -> DataFrame:
    """Re-aggregate a finer rollup to a coarser grain WITHOUT touching the
    fact table. The coarse width must be a multiple of the fine width so
    every fine bucket falls entirely inside one coarse bucket — pass
    ``fine_seconds`` to have that validated (the rollup rows don't carry
    their own width, so it can't be self-checked)."""
    if fine_seconds is not None:
        ratio = float(bucket_seconds) / float(fine_seconds)
        # float-safe multiplicity test (0.3 % 0.1 != 0 in IEEE doubles)
        if abs(ratio - round(ratio)) > 1e-9 or round(ratio) < 1:
            raise ValueError(
                f"coarse width {bucket_seconds}s is not a multiple of the fine "
                f"width {fine_seconds}s — fine buckets would straddle coarse ones"
            )
    by_cols = [by] if isinstance(by, str) else list(by)
    return (
        fine.withColumn("_cb", time_bucket(bucket_col, bucket_seconds))
        .groupBy(*by_cols, "_cb")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .withColumnRenamed("_cb", bucket_col)
        .withColumn("avg_v", F.col("sum_v") / F.col("n"))
    )
