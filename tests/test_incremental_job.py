"""Incremental feature backfill: metadata-diff delta detection, touched-conv
recompute, copy-on-write upsert, pinned normalization stats."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.sources import snapshots as snap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "incremental_features.py")


def _run(args: list[str]) -> dict:
    out = subprocess.run(
        [sys.executable, JOB, *args],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _frame(spark, table):
    return (
        snap.read(spark, table)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )


@pytest.mark.slow
def test_incremental_equals_full_with_pinned_stats(tmp_path, spark, transcripts):
    """Two source waves (new turns on old convs + brand-new convs): the
    incremental features must equal a full recompute under the FIRST
    wave's pinned stats, untouched convs must not be rewritten, and a
    third run with no new data is a no-op."""
    from acoustic_feature_extractor_spark.operators.stats import corpus_stats
    from acoustic_feature_extractor_spark.plans.pipeline import turn_features

    src = str(tmp_path / "src")
    feat = str(tmp_path / "feat")
    t = transcripts  # deterministic generator fixture
    wave1 = t.where((F.col("conv_id") < "conv000020") & (F.col("turn_idx") < 10))
    wave2 = t.exceptAll(wave1)

    snap.commit(wave1, src)
    m1 = _run(["--source", src, "--features", feat])
    assert not m1["noop"] and m1["source_snapshot"] == 1

    stats_row = corpus_stats(
        wave1.withColumn("text_len", F.length("text").cast("double")), "text_len"
    ).first()
    stats = {"mean": float(stats_row["mean"]), "stddev": float(stats_row["stddev"])}

    got1 = _frame(spark, feat)
    exp1 = (
        turn_features(wave1, frozen_stats=stats)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(got1) == len(exp1)
    np.testing.assert_allclose(
        got1["text_len_z"].to_numpy(), exp1["text_len_z"].to_numpy(), rtol=1e-12
    )

    # wave 2 lands; only its convs recompute, stats stay wave-1-pinned
    snap.commit(wave2, src)
    m2 = _run(["--source", src, "--features", feat])
    assert not m2["noop"] and m2["source_snapshot"] == 2
    n_convs = t.select("conv_id").distinct().count()
    assert 0 < m2["touched_convs"] < n_convs  # some convs were untouched
    assert m2["rewritten_dirs"]  # copy-on-write actually merged

    got2 = _frame(spark, feat)
    exp2 = (
        turn_features(t, frozen_stats=stats)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(got2) == len(exp2)
    # rows_written = the merged dir (touched-conv features + survivors of
    # rewritten dirs) — strictly less than a full recompute
    assert 0 < m2["rows_written"] <= len(exp2)
    assert (got2["conv_id"].to_numpy() == exp2["conv_id"].to_numpy()).all()
    assert (got2["text"].to_numpy() == exp2["text"].to_numpy()).all()
    for c in ("text_len_z", "roll_len_mean", "dt_prev_sec"):
        np.testing.assert_allclose(
            got2[c].astype(float).to_numpy(),
            exp2[c].astype(float).to_numpy(),
            rtol=1e-12,
            equal_nan=True,
        )
    assert (
        got2["session_id"].to_numpy() == exp2["session_id"].to_numpy()
    ).all()

    # pinned stats recorded once, reused verbatim
    hist = snap.history(feat)
    assert hist[0].lineage["stats"] == stats
    assert hist[-1].lineage["stats"] == stats

    # no new source data -> no-op, no new snapshot
    before = snap.current_snapshot_id(feat)
    m3 = _run(["--source", src, "--features", feat])
    assert m3["noop"]
    assert snap.current_snapshot_id(feat) == before


def _run_rc(args: list[str]) -> tuple[int, dict]:
    out = subprocess.run(
        [sys.executable, JOB, *args],
        capture_output=True,
        text=True,
        check=False,
        cwd=REPO,
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return out.returncode, json.loads(line)


@pytest.mark.slow
def test_incremental_drift_gate(tmp_path, spark, transcripts):
    """Every increment scores its delta's text_len distribution against
    the histogram pinned at the first run: a same-distribution wave
    reports a small PSI; a drastically shifted wave trips --max-psi (rc 2,
    nothing committed) and still lands in monitor-only mode with the PSI
    recorded in lineage."""
    src = str(tmp_path / "src")
    feat = str(tmp_path / "feat")
    t = transcripts
    wave1 = t.where(F.col("conv_id") < "conv000030")
    wave2 = t.where(
        (F.col("conv_id") >= "conv000030") & (F.col("conv_id") < "conv000040")
    )
    wave3 = t.where(F.col("conv_id") >= "conv000040").withColumn(
        "text", F.concat(F.col("text"), F.lit(" x" * 400))  # massive shift
    )

    snap.commit(wave1, src)
    m1 = _run(["--source", src, "--features", feat])
    assert m1["drift_psi"] is None  # first run PINS the window
    assert snap.history(feat)[0].lineage["text_len_hist"]

    snap.commit(wave2, src)
    rc2, m2 = _run_rc(
        ["--source", src, "--features", feat, "--max-psi", "0.25", "--max-ks", "0.4"]
    )
    assert rc2 == 0 and m2["drift_psi"] is not None
    assert m2["drift_psi"] < 0.25  # same generator, same distribution
    assert m2["drift_ks"] is not None and m2["drift_ks"] < 0.4

    snap.commit(wave3, src)
    before = snap.current_snapshot_id(feat)
    rc3, m3 = _run_rc(["--source", src, "--features", feat, "--max-psi", "0.25"])
    assert rc3 == 2 and m3["failed"] == "drift_gate"
    assert m3["drift_psi"] > 0.25
    assert snap.current_snapshot_id(feat) == before  # gate blocked the commit

    # the KS bar alone (no PSI bar) also catches the shifted wave — the
    # " x"*400 suffix pushes most of the delta's mass to higher bins, a
    # large worst-case CDF gap
    rc3b, m3b = _run_rc(["--source", src, "--features", feat, "--max-ks", "0.4"])
    assert rc3b == 2 and m3b["failed"] == "drift_gate"
    assert m3b["drift_ks"] > 0.4
    assert snap.current_snapshot_id(feat) == before

    rc4, m4 = _run_rc(["--source", src, "--features", feat])  # monitor-only
    assert rc4 == 0 and m4["drift_psi"] > 0.25
    assert snap.history(feat)[-1].lineage["drift_psi"] == round(m4["drift_psi"], 6)
    assert snap.history(feat)[-1].lineage["drift_ks"] == round(m4["drift_ks"], 6)
