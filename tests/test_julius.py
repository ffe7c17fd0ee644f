"""Julius text sink/source round-trip — mirrors the reference's random
round-trip property (``tests/test_phoneme.py:11-33``: save -> load ->
frame equality) plus its verify-raises behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from acoustic_feature_extractor_spark.sources.julius import (
    julius_violations,
    load_julius_labels,
    save_julius_labels,
)

LABELS = ["user", "assistant", "tool", "pause"]


def _spans(seed=7, n_conv=3):
    rng = np.random.RandomState(seed)
    rows = []
    for c in range(n_conv):
        t = 0.0
        for _ in range(rng.randint(4, 10)):
            # reference rounds to 4 decimals (phoneme.py:20-22) — generate
            # on that grid so the round-trip is exact
            dur = round(float(rng.rand() * 3 + 0.01), 4)
            rows.append((f"conv{c}", round(t, 4), round(t + dur, 4), LABELS[rng.randint(4)]))
            t = round(t + dur, 4)
    return pd.DataFrame(rows, columns=["conv_id", "start_s", "end_s", "label"])


def test_roundtrip(spark, tmp_path):
    pdf = _spans()
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "julius")
    save_julius_labels(df, path)
    back = load_julius_labels(spark, path).toPandas()
    a = pdf.sort_values(["conv_id", "start_s"]).reset_index(drop=True)
    b = back.sort_values(["conv_id", "start_s"]).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_save_verify_raises_on_gap(spark, tmp_path):
    pdf = _spans()
    pdf.loc[1, "start_s"] += 0.5  # break contiguity
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="invalid span lists"):
        save_julius_labels(df, str(tmp_path / "bad"))
    bad = julius_violations(df).collect()
    assert any(r["violation"] == "not_contiguous" for r in bad)


def test_violation_reasons(spark):
    pdf = pd.DataFrame(
        [
            ("a", 1.0, 2.0, "user"),       # first start != 0
            ("b", 0.0, 0.0, "user"),       # start == end
            ("c", 0.0, 1.0, "user"),
            ("c", 1.5, 2.0, "tool"),       # gap after first span
        ],
        columns=["conv_id", "start_s", "end_s", "label"],
    )
    got = {
        (r["conv_id"], r["violation"])
        for r in julius_violations(spark.createDataFrame(pdf)).collect()
    }
    assert got == {
        ("a", "first_start_not_zero"),
        ("b", "start_not_before_end"),
        ("c", "not_contiguous"),
    }
