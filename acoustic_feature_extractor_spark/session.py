"""SparkSession construction tuned for this engine.

Local-mode testing uses ``local[N]``; the same settings translate to a
multi-executor cluster (AQE, Arrow, sane shuffle partitioning). The
reference's parallelism story is ``multiprocessing.Pool()`` over all cores
(``/root/reference/src/extractor/extract_f0.py:62-63``); ours is Spark task
parallelism over partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "afe_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` may be an int (→ ``local[n]``), ``"*"``, or None (env
    ``SPARK_GRAFT_CPUS`` or all cores). ``shuffle_partitions`` defaults to
    2× cores — enough tasks for AQE to coalesce, not the 200 default that
    over-parallelizes local runs.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 4)
    n_cores = os.cpu_count() or 4 if cores == "*" else int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n_cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # int64-micros timestamps (not legacy INT96): footer min/max stats
        # exist, so snapshot-log data skipping can prune on time columns
        # (INT96 carries no statistics); also Iceberg's required physical
        # type, keeping written files spec-compatible
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
