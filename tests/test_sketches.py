"""HLL distinct-count rollups: estimate accuracy, lossless-union cascade,
binary-at-rest merge (write sketches, merge in a 'later job')."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.operators.sketches import (
    distinct_coarser,
    distinct_rollup,
    with_estimate,
)

BASE = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def events(spark):
    # 3 entities x 48 hours; user ids overlap across hours so the day
    # distinct is NOT the sum of hour distincts (the case that breaks
    # count-cascades and exactly what sketch union must collapse)
    rows = []
    for g in ("a", "b", "c"):
        for h in range(48):
            for u in range(0, 40, 2 if h % 2 else 1):
                rows.append((g, BASE + dt.timedelta(hours=h, minutes=u % 60), u + (h % 3) * 40))
    return spark.createDataFrame(rows, "g string, ts timestamp, user_id bigint").cache()


def _exact(events, width):
    from acoustic_feature_extractor_spark.operators.rollup import time_bucket

    return (
        events.withColumn("bucket", time_bucket("ts", width))
        .groupBy("g", "bucket")
        .agg(F.count_distinct("user_id").alias("exact"))
    )


def test_hourly_estimates_close(spark, events):
    est = with_estimate(distinct_rollup(events, 3600.0, "g", "user_id"))
    j = est.join(_exact(events, 3600.0), ["g", "bucket"]).collect()
    assert len(j) == 3 * 48
    for r in j:
        assert abs(r["distinct_est"] - r["exact"]) <= max(1, 0.02 * r["exact"])


def test_cascade_equals_direct_sketch(spark, events):
    """Merging hourly sketches to a day gives the SAME estimate as
    sketching the day directly — HLL union is lossless, the property that
    makes sketches-at-rest answer coarser grains without the fact table."""
    fine = distinct_rollup(events, 3600.0, "g", "user_id")
    day_m = with_estimate(distinct_coarser(fine, 86400.0, "g", fine_seconds=3600.0))
    day_d = with_estimate(distinct_rollup(events, 86400.0, "g", "user_id"))
    merged = {(r["g"], r["bucket"]): (r["distinct_est"], r["n"]) for r in day_m.collect()}
    direct = {(r["g"], r["bucket"]): (r["distinct_est"], r["n"]) for r in day_d.collect()}
    assert merged == direct
    # and the day distinct is far below the sum of hour distincts
    hours = fine.count()
    assert hours == 3 * 48 and len(merged) == 3 * 2


def test_sketches_survive_parquet(spark, events, tmp_path):
    """Binary sketches written to parquet merge correctly in a later job."""
    p = str(tmp_path / "rollup")
    distinct_rollup(events, 3600.0, "g", "user_id").write.parquet(p)
    reread = spark.read.parquet(p)
    day = with_estimate(distinct_coarser(reread, 86400.0, "g", fine_seconds=3600.0))
    exact = _exact(events, 86400.0)
    for r in day.join(exact, ["g", "bucket"]).collect():
        assert abs(r["distinct_est"] - r["exact"]) <= max(1, 0.02 * r["exact"])


def test_width_guard(spark, events):
    fine = distinct_rollup(events, 3600.0, "g", "user_id")
    with pytest.raises(ValueError, match="multiple"):
        distinct_coarser(fine, 5000.0, "g", fine_seconds=3600.0)
