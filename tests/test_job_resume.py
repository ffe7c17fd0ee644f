"""Resumable job driver: per-bucket checkpoint + manifest + frozen stats.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The test runs the job for a subset of buckets (simulated crash),
resumes, and asserts the final output equals a clean single-shot run —
including the z-score column, which depends on corpus stats frozen at
first launch.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "run_turn_features.py")


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


@pytest.mark.slow
def test_job_resume_equals_single_shot(tmp_path, spark):
    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")

    r1 = _run(["--generate", "40", "--output", single, "--buckets", "4"])
    assert r1["rows_written"] > 0

    # partial run: run all 4 buckets, then delete the last two buckets'
    # output AND their manifest entries — as if the run died mid-flight.
    r2 = _run(["--generate", "40", "--output", resumed, "--buckets", "4"])
    mdir = os.path.join(resumed, "_manifest")
    with open(os.path.join(mdir, "manifest.json")) as f:
        m = json.load(f)
    killed = [p["partition"] for p in m["partitions"][2:]]
    m["partitions"] = m["partitions"][:2]
    m["finished_unix"] = None
    with open(os.path.join(mdir, "manifest.json"), "w") as f:
        json.dump(m, f)
    for pid in killed:
        shutil.rmtree(os.path.join(resumed, pid))

    r3 = _run(["--generate", "40", "--output", resumed, "--buckets", "4", "--resume"])
    assert r3["skipped"] == 2

    a = (
        spark.read.parquet(os.path.join(single, "bucket=*"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    b = (
        spark.read.parquet(os.path.join(resumed, "bucket=*"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(a) == len(b) == r1["rows_written"]
    # per-turn text equality under stable (conv_id, turn_idx) order
    assert (a["text"].to_numpy() == b["text"].to_numpy()).all()
    # z-scores match: resumed buckets used the frozen stats, not re-derived
    import numpy as np

    np.testing.assert_allclose(
        a["text_len_z"].to_numpy(), b["text_len_z"].to_numpy(), rtol=1e-12
    )

    # manifest carries per-partition lineage for every bucket
    with open(os.path.join(mdir, "manifest.json")) as f:
        final = json.load(f)
    assert {p["partition"] for p in final["partitions"]} == {f"bucket={i}" for i in range(4)}
    assert all(p["rows"] > 0 and p["seconds"] >= 0 for p in final["partitions"])


@pytest.mark.slow
def test_spark_submit_py_files_launch(tmp_path):
    """north_rule launch mode: spark-submit --py-files <pkg.zip> job.py."""
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    pkg_zip = str(tmp_path / "afe.zip")
    subprocess.run(
        ["zip", "-qr", pkg_zip, "acoustic_feature_extractor_spark", "-x", "*__pycache__*"],
        check=True,
        cwd=REPO,
    )
    out = subprocess.run(
        [
            "spark-submit", "--master", "local[4]", "--py-files", pkg_zip,
            JOB, "--generate", "10", "--output", str(tmp_path / "out"), "--buckets", "2",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["rows_written"] > 0 and r["buckets"] == 2
