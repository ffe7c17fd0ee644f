"""Sessionization / splitting vs closed-form oracles
(``tool/tool_split_wave.py:47-76``, ``sampling_data.py:53-60``,
``extract_silence_expanded_label.py:30-44``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.operators.sessionize import (
    run_boundaries,
    session_bounds,
    sessionize,
    split_at_keypoints,
)


def _gapped(spark):
    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",
            "2024-01-01 00:01:00",
            "2024-01-01 00:20:00",  # 19min gap -> new session at 600s thresh
            "2024-01-01 00:21:00",
            "2024-01-01 01:00:00",  # 39min gap -> new session
        ]
    )
    pdf = pd.DataFrame(
        {"conv_id": "a", "turn_idx": range(5), "ts": ts, "flag": [True, True, False, False, True]}
    )
    return spark.createDataFrame(pdf)


def test_sessionize_closed_form(spark):
    out = (
        sessionize(_gapped(spark), gap_seconds=600.0)
        .orderBy("turn_idx")
        .select("session_id")
        .toPandas()["session_id"]
        .tolist()
    )
    assert out == [0, 0, 1, 1, 2]


def test_session_bounds(spark):
    s = sessionize(_gapped(spark), gap_seconds=600.0)
    b = session_bounds(s).orderBy("session_id").toPandas()
    assert b["n_turns"].tolist() == [2, 2, 1]


def test_keypoint_split(spark):
    df = _gapped(spark).withColumn(
        "t_rel",
        F.col("ts").cast("double") - F.lit(pd.Timestamp("2024-01-01").timestamp()),
    )
    out = (
        split_at_keypoints(df, keypoints=[90.0, 1250.0], segment_col="seg")
        .orderBy("turn_idx")
        .toPandas()["seg"]
        .tolist()
    )
    # ts offsets: 0, 60, 1200, 1260, 3600 vs keypoints [90, 1250]
    assert out == [0, 0, 1, 2, 2]


def test_run_boundaries(spark):
    out = run_boundaries(_gapped(spark), "flag").orderBy("turn_idx").toPandas()
    assert out["run_id"].tolist() == [1, 1, 2, 2, 3]
    assert out["is_change"].tolist() == [True, False, True, False, True]
