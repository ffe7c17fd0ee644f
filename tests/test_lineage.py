"""Run manifests: provenance, per-partition metrics, resume filter."""

from __future__ import annotations

import tempfile

from acoustic_feature_extractor_spark.plans.lineage import (
    RunManifest,
    completed_partitions,
    save_arguments,
)


def test_manifest_roundtrip_and_resume():
    with tempfile.TemporaryDirectory() as d:
        m = RunManifest(run_id="r1", args={"gap": 300})
        m.record_partition("conv000000-conv000099", rows=1234, seconds=1.5)
        m.record_partition("conv000100-conv000199", rows=999, seconds=1.1)
        m.finish()
        m.save(d)

        loaded = RunManifest.load(d)
        assert loaded is not None and loaded.run_id == "r1"
        assert len(loaded.partitions) == 2
        assert completed_partitions(d) == {
            "conv000000-conv000099",
            "conv000100-conv000199",
        }


def test_save_arguments():
    with tempfile.TemporaryDirectory() as d:
        p = save_arguments({"input_glob": "/x/*.parquet", "rate": 100}, d)
        import json

        with open(p) as f:
            args = json.load(f)
        assert args["rate"] == "100"
