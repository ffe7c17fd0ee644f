"""Idle-box A/B for flagged bench queries: r3 commit vs HEAD.

The floors methodology (BENCH/BASELINE.md) flags a query when THIS run's
best-of-2 exceeds its all-time floor by >1.5x and >0.3 s. A flag is
settled by this tool's evidence, the same shape that re-baselined
ann_bruteforce / ann_ivf / trailing_window / weighted_percentile in r4:

  - each measurement runs in its OWN JVM (subprocess; one warmup + 3
    timed executions of the query through the noop sink, keep the best),
  - each side (the round-3 commit in a detached worktree, and HEAD) gets
    REPS such JVMs, interleaved A/B/A/B so a host-load wave hits both
    sides equally,
  - verdicts: both sides converge ABOVE the floor -> the floor is
    unreproducible, re-baseline it; sides at DIFFERENT steady states ->
    the gap is a real code change, trace the commit; both sides reach
    the floor -> the flag was cross-day host noise, clear it.

Usage:
    python tools/bench_ab.py dedup_simhash doc_perplexity ...
    python tools/bench_ab.py --r3 afbe946 --reps 2 <queries...>

Prints one JSON line per query with per-side samples; run on an IDLE box
(pgrep -af bench.py; wait out the ~10 min JVM linger) or the numbers are
garbage.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, os, sys, time
repo = sys.argv[1]
name = sys.argv[2]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sys.path.insert(0, repo)
os.chdir(repo)
from acoustic_feature_extractor_spark.session import get_spark
spark = get_spark(app_name=f"ab_{name}", cores=32)
import __spark_entry__ as m
qs = m.queries()
def force(df):
    df.write.format("noop").mode("overwrite").save()
force(qs[name](spark, sf_dir))  # warmup (JVM + codegen + page cache)
runs = []
for _ in range(3):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    force(qs[name](spark, sf_dir))
    runs.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"name": name, "runs": runs, "best": min(runs)}))
"""


def measure(repo: str, name: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, repo, name],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    for ln in reversed(out.stdout.splitlines()):
        if ln.startswith("{"):
            return json.loads(ln)
    raise RuntimeError(f"{name} @ {repo}: no result\n{out.stderr[-2000:]}")


def main(argv: list[str]) -> None:
    r3 = "afbe946"
    reps = 2
    names = []
    it = iter(argv)
    for a in it:
        if a == "--r3":
            r3 = next(it)
        elif a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)
    wt = f"/tmp/spark_graft_ab_{r3}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, r3],
            cwd=REPO,
            check=True,
            capture_output=True,
        )
    results = {}
    for name in names:
        sides = {"r3": [], "head": []}
        for _ in range(reps):  # interleaved so load waves hit both sides
            sides["r3"].append(measure(wt, name))
            sides["head"].append(measure(REPO, name))
        rec = {
            "query": name,
            "r3_runs": [r["runs"] for r in sides["r3"]],
            "head_runs": [r["runs"] for r in sides["head"]],
            "r3_best": min(r["best"] for r in sides["r3"]),
            "head_best": min(r["best"] for r in sides["head"]),
        }
        results[name] = rec
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
