"""Fill operators vs numpy oracles — reference unvoiced-fill parity
(``/root/reference/src/acoustic_feature_extractor/data/f0.py:70-83``):
linear interp between valid neighbors, edge clamp to first/last valid."""

from __future__ import annotations

import numpy as np
import pandas as pd

from acoustic_feature_extractor_spark.operators.fill import (
    backward_fill,
    forward_fill,
    interpolate_fill,
)


def _masked(spark):
    rng = np.random.RandomState(7)
    rows = []
    for key in ["a", "b"]:
        n = 40
        v = rng.rand(n) * 50 + 10
        mask = rng.rand(n) < 0.35
        mask[:3] = [True, True, False]  # leading invalids on 'a'-style edges
        for i in range(n):
            rows.append((key, i, None if mask[i] else float(v[i])))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "v"])
    return spark.createDataFrame(pdf), pdf


def test_interpolate_matches_numpy_interp(spark):
    df, pdf = _masked(spark)
    got = (
        interpolate_fill(df, "v", out_col="f")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    for k, g in pdf.groupby("conv_id"):
        g = g.reset_index(drop=True)
        valid = g["v"].notna().to_numpy()
        idx = np.arange(len(g))
        expected = np.interp(idx, idx[valid], g["v"].to_numpy()[valid])
        np.testing.assert_allclose(
            got[got.conv_id == k]["f"].to_numpy(), expected, rtol=1e-12
        )


def test_forward_backward_fill_match_pandas(spark):
    df, pdf = _masked(spark)
    f = forward_fill(df, "v", out_col="ff")
    f = backward_fill(f, "v", out_col="bf")
    got = f.orderBy("conv_id", "turn_idx").toPandas()
    for k, g in pdf.groupby("conv_id"):
        g = g.reset_index(drop=True)
        gk = got[got.conv_id == k].reset_index(drop=True)
        pd.testing.assert_series_equal(
            gk["ff"], g["v"].ffill(), check_names=False, check_index=False
        )
        pd.testing.assert_series_equal(
            gk["bf"], g["v"].bfill(), check_names=False, check_index=False
        )
