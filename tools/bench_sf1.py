"""sf1 spot-bench: one measured DECADE of data scaling (sf0.1 -> sf1).

Every 100-TB scale claim in BENCH extrapolates from sf0.1; this converts
the design argument into one measured decade. Builds a deterministic
10x sf1 under /tmp (no external data; 10 key-offset replicas of the
driver's sf0.1 parquet — entity count grows 10x, per-entity series keep
their shape, which is the weak-scaling axis every windowed/salted plan
partitions on), then times the flagship pipeline (plain / auto-salted /
forced-salted at 10x conversations) and the slowest suite queries at
BOTH scales in one JVM (local[32], 1 warmup + 2 timed, best kept).

A scalable plan shows runtime ratio <= the 10x data ratio (usually far
less — fixed JVM/planning overhead dominates sf0.1); a ratio above 10x
means super-linear work (a broken plan) and fails the round.

    python tools/bench_sf1.py            # prints one JSON line
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
COPIES = 10

QUERIES = [
    # the five slowest r4 suite entries (BENCH_r04.json)
    "stream_context",
    "ann_ivfpq",
    "hist_incremental",
    "topk_incremental",
    "drift_incremental",
    # window/as-of representatives (the engine's core shapes)
    "trailing_window",
    "rolling_stats",
    "asof_join",
    # r5 streaming surface at scale: stateful drains + the production loop
    "stream_cusum",
    "stream_interval_join",
    "stream_cdc_rollup",
]


def build_sf1(spark) -> None:
    """10 key-offset replicas of the sf0.1 driver tables. Deterministic:
    same input, same offsets, no randomness. The time span is unchanged
    (10x entities over the same month), so time-chunked plans keep their
    chunk count and per-entity windows keep their row counts."""
    from pyspark.sql import functions as F

    os.makedirs(SF1, exist_ok=True)
    specs = {
        "events": {"event_id": 1_000_000_000, "user_id": 1_000_000},
        "documents": {"doc_id": 1_000_000_000},
        "embeddings": {"vec_id": 1_000_000_000},
    }
    for name, offsets in specs.items():
        out = os.path.join(SF1, f"{name}.parquet")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            continue
        base = spark.read.parquet(os.path.join(SF01, f"{name}.parquet"))
        parts = []
        for i in range(COPIES):
            d = base
            for col, off in offsets.items():
                d = d.withColumn(col, F.col(col) + F.lit(i * off))
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
    # the small dim tables some queries join are scale-free: symlink
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        src = os.path.join(SF01, f"{name}.parquet")
        dst = os.path.join(SF1, f"{name}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def time_query(fn, spark, sf_dir: str, n: int = 2) -> float:
    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(fn(spark, sf_dir))  # warmup
    runs = []
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        runs.append(round(time.perf_counter() - t0, 3))
    return min(runs)


def main() -> None:
    from acoustic_feature_extractor_spark.session import get_spark

    spark = get_spark(app_name="bench_sf1", cores=32)
    build_sf1(spark)

    import __spark_entry__ as m
    from acoustic_feature_extractor_spark.datagen import generate_transcripts
    from acoustic_feature_extractor_spark.plans.pipeline import turn_features

    qs = m.queries()
    out: dict = {"copies": COPIES, "queries": {}}

    for name in QUERIES:
        t01 = time_query(qs[name], spark, SF01)
        t1 = time_query(qs[name], spark, SF1)
        out["queries"][name] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"# {name}: {t01} -> {t1} ({out['queries'][name]['ratio']}x)",
              file=sys.stderr, flush=True)

    # flagship at 10x conversations (bench.py uses 50k convs at sf0.1
    # conditions); plain + auto-salted + forced-salted
    def flagship(n_convs: int, salt):
        t = generate_transcripts(spark, n_convs=n_convs).localCheckpoint(
            eager=True
        )
        n = t.count()
        kw = {} if salt is None else {"salt_above": salt}
        df = turn_features(t, **kw)
        df.write.format("noop").mode("overwrite").save()  # warmup
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            turn_features(t, **kw).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        t.unpersist()
        return n, min(runs)

    for tag, salt in (
        ("flagship", None),
        ("flagship_auto", "auto"),
        ("flagship_salted", 0),
    ):
        n01, t01 = flagship(50_000, salt)
        n1, t1 = flagship(500_000, salt)
        out["queries"][tag] = {
            "sf0.1_sec": t01,
            "sf1_sec": t1,
            "ratio": round(t1 / t01, 2),
            "turns": [n01, n1],
            "sf1_turns_per_sec": round(n1 / t1),
        }
        print(f"# {tag}: {t01} -> {t1} ({out['queries'][tag]['ratio']}x)",
              file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
