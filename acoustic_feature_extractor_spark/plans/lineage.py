"""Run manifests: provenance, per-partition metrics, resume.

The reference writes an ``arguments.json`` next to every output batch
(``/root/reference/src/acoustic_feature_extractor/utility/json_utility.py:14-15``,
called by every extractor). Ours generalizes that into a run manifest:
invocation args + per-partition lineage (key range, row count, wall time)
+ completion markers, giving the resume story the north_rule requires —
a rerun skips partitions whose marker exists (Iceberg-snapshot analog for
the parquet backend).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class RunManifest:
    run_id: str
    args: dict
    started_unix: float = field(default_factory=time.time)
    partitions: list[dict] = field(default_factory=list)
    finished_unix: float | None = None

    def record_partition(self, partition_id: str, rows: int, seconds: float, **extra) -> None:
        self.partitions.append(
            {"partition": partition_id, "rows": rows, "seconds": seconds, **extra}
        )

    def finish(self) -> None:
        self.finished_unix = time.time()

    def save(self, out_dir: str) -> str:
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "manifest.json")
        with open(path, "w") as f:
            json.dump(asdict(self), f, indent=2, default=str)
        return path

    @staticmethod
    def load(out_dir: str) -> "RunManifest | None":
        path = os.path.join(out_dir, "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            d = json.load(f)
        m = RunManifest(run_id=d["run_id"], args=d["args"], started_unix=d["started_unix"])
        m.partitions = d.get("partitions", [])
        m.finished_unix = d.get("finished_unix")
        return m


def completed_partitions(out_dir: str) -> set[str]:
    """Partition ids already finished in a previous run (resume filter)."""
    m = RunManifest.load(out_dir)
    if m is None:
        return set()
    return {p["partition"] for p in m.partitions}


def save_arguments(args: dict, out_dir: str) -> str:
    """Direct ``arguments.json`` analog (provenance sink S6)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "arguments.json")
    with open(path, "w") as f:
        json.dump({k: str(v) for k, v in args.items()}, f, indent=2)
    return path
