"""Julius label-format text source/sink (reference S4, both directions).

Reference parity targets:
- parse: whitespace ``start end phoneme`` lines
  (``/root/reference/src/acoustic_feature_extractor/data/phoneme.py:50-61``).
- serialize: ``%.4f\\t%.4f\\t%s`` lines, one file per entity, with the
  contiguity VERIFY on both directions
  (``phoneme.py:76-106`` ``save_julius_list`` / ``verify_list`` at
  ``phoneme.py:69-74``: first start == 0, ``start < end``,
  ``pre.end == post.start``).

Spark-first shape: serialization is an ``F.format_string`` projection
(codegen'd), the per-entity-file layout is ``partitionBy(key)`` on the
text writer with rows pre-sorted inside each partition — a distributed
sink, no driver loop. Verification is a validation QUERY (empty result ⇔
contract holds) plus an eager assert wrapper, mirroring the reference's
fail-fast-with-path-context error handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def julius_violations(
    spans: DataFrame,
    key: str = "conv_id",
    start: str = "start_s",
    end: str = "end_s",
    label: str = "label",
) -> DataFrame:
    """Contiguity/validity violations (``phoneme.py:69-74`` as a query):
    rows where start >= end, the entity's first start != 0, or the span
    does not begin where its predecessor ended. Empty ⇔ valid."""
    w = Window.partitionBy(key).orderBy(start)
    prev_end = F.lag(end).over(w)
    reason = (
        F.when(F.col(start) >= F.col(end), F.lit("start_not_before_end"))
        .when(prev_end.isNull() & (F.col(start) != 0.0), F.lit("first_start_not_zero"))
        .when(prev_end.isNotNull() & (F.col(start) != prev_end), F.lit("not_contiguous"))
    )
    return (
        spans.withColumn("violation", reason)
        .where(F.col("violation").isNotNull())
        .select(key, start, end, label, "violation")
    )


def save_julius_labels(
    spans: DataFrame,
    path: str,
    key: str = "conv_id",
    start: str = "start_s",
    end: str = "end_s",
    label: str = "label",
    verify: bool = True,
) -> None:
    """Serialize span tables to Julius text, one directory per entity
    (``save_julius_list``, ``phoneme.py:89-106``): lines
    ``round(start,4)\\tround(end,4)\\tlabel`` in span order.

    ``verify=True`` mirrors the reference's pre-save assert: raises
    ``ValueError`` listing violations before anything is written.
    """
    if verify:
        bad = julius_violations(spans, key, start, end, label).limit(5).collect()
        if bad:
            raise ValueError(f"julius save: invalid span lists, e.g. {bad}")
    line = F.format_string(
        "%.4f\t%.4f\t%s",
        F.round(F.col(start).cast("double"), 4),
        F.round(F.col(end).cast("double"), 4),
        F.col(label),
    )
    (
        spans.repartition(F.col(key))
        .sortWithinPartitions(key, start)
        .select(F.col(key), line.alias("value"))
        .write.partitionBy(key)
        .mode("overwrite")
        .text(path)
    )


def load_julius_labels(
    spark: SparkSession,
    path: str,
    key: str = "conv_id",
    start: str = "start_s",
    end: str = "end_s",
    label: str = "label",
    verify: bool = True,
) -> DataFrame:
    """Parse a Julius text directory back to the span table
    (``load_julius_list``, ``phoneme.py:55-61``); the partition directory
    gives the entity back. ``verify=True`` raises on contract violations
    (fail-fast with context, ``phoneme.py:84-88``)."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), r"\s+")
    out = raw.select(
        F.col(key).cast("string").alias(key),
        F.element_at(parts, 1).try_cast("double").alias(start),
        F.element_at(parts, 2).try_cast("double").alias(end),
        F.element_at(parts, 3).alias(label),
    )
    if verify:
        bad = julius_violations(out, key, start, end, label).limit(5).collect()
        if bad:
            raise ValueError(f"julius load: {path} is not valid, e.g. {bad}")
    return out
