"""Mergeable distinct-count sketches (HLL) at rest — the cascade answer to
COUNT(DISTINCT) at 100 TB.

The hypertable rollup (`operators/rollup.py`) cascades count/sum/min/max
losslessly, but DISTINCT is not decomposable: a day's distinct users is not
the sum of its hours'. The standard warehouse answer (Druid/BigQuery/
Snowflake alike) is to store a MERGEABLE sketch per fine bucket and union
sketches upward — the fact table is scanned once, every coarser grain (and
any ad-hoc slice union) is answered from kilobyte sketches.

Built on Spark's public Apache DataSketches HLL bindings
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
pyspark.sql.functions, Spark 3.5+): JVM-side, partial/final planned, the
sketch column is a plain ``binary`` you can write to parquet and merge in a
later job without re-reading events.

Scale shape: one ``groupBy(entity, bucket)`` over the fact table (shuffle
carries one ~lgk-sized sketch per group per task thanks to partial
aggregation), then cascades/slices touch only rollup rows. Estimate error
is ~1.04/sqrt(2^lgk): lgk=14 → ~0.8 % relative, 3–12 KB per sketch.

Reference tie-in: the reference's statistics sink reduces a corpus to one
summary row per file (``extract_f0_statistics.py:28-41``); this is the
same reduce-once-query-many pattern for the one aggregate class where the
exact value cannot be carried.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.operators.rollup import time_bucket


def distinct_rollup(
    df: DataFrame,
    bucket_seconds: float,
    by: str | list[str],
    value_col: str,
    ts: str = "ts",
    bucket_col: str = "bucket",
    lgk: int = 14,
) -> DataFrame:
    """Per-(entity, bucket) HLL sketch of ``value_col`` plus the row count:
    (by…, bucket, n, sketch). The sketch column is binary-at-rest — write
    it with the rollup and every coarser distinct question skips the fact
    table forever."""
    by_cols = [by] if isinstance(by, str) else list(by)
    return (
        df.withColumn(bucket_col, time_bucket(ts, bucket_seconds))
        .groupBy(*by_cols, bucket_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.hll_sketch_agg(F.col(value_col), F.lit(int(lgk))).alias("sketch"),
        )
    )


def distinct_coarser(
    fine: DataFrame,
    bucket_seconds: float,
    by: str | list[str],
    bucket_col: str = "bucket",
    fine_seconds: float | None = None,
) -> DataFrame:
    """Merge a finer distinct-rollup to a coarser grain WITHOUT touching
    the fact table: sketches union (set semantics — overlap between fine
    buckets collapses correctly, unlike summing counts), rows sum. Same
    width-multiplicity guard as :func:`rollup.rollup_coarser`."""
    if fine_seconds is not None:
        ratio = float(bucket_seconds) / float(fine_seconds)
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
            F.hll_union_agg(F.col("sketch")).alias("sketch"),
        )
        .withColumnRenamed("_cb", bucket_col)
    )


def with_estimate(
    df: DataFrame, sketch_col: str = "sketch", out_col: str = "distinct_est"
) -> DataFrame:
    """Finalize: append the distinct estimate (long) from the sketch."""
    return df.withColumn(out_col, F.hll_sketch_estimate(F.col(sketch_col)))
