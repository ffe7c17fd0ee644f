"""Resumable flagship pipeline job — the engine's production entrypoint.

Launch (cluster or sandbox)::

    zip -r afe.zip acoustic_feature_extractor_spark
    spark-submit --master local[32] --py-files afe.zip \
        jobs/run_turn_features.py --input /data/transcripts --output /data/features

or equivalently ``python jobs/run_turn_features.py ...`` in the sandbox.

Execution model (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"):

- the conversation space is split into ``--buckets`` hash buckets
  (``xxhash64(conv_id) % K``); conversations never straddle buckets, so
  every engine op (windows, sessionization, fill, as-of) is exact within
  a bucket — the bucket is the unit of work, checkpointing, and resume.
- each bucket runs as its own Spark write job into
  ``<output>/bucket=<i>/``; on success its row count + wall time is
  appended to ``<output>/_manifest/manifest.json`` (the reference's
  ``arguments.json`` provenance generalized,
  ``/root/reference/src/acoustic_feature_extractor/utility/json_utility.py:14-15``).
  The manifest is saved after EVERY bucket, so a killed run loses at most
  one bucket of work.
- ``--resume`` skips buckets already present in the manifest (the
  Iceberg-snapshot analog for the parquet backend); corpus statistics are
  computed once over the full input and frozen into the manifest so
  resumed buckets normalize against identical stats (no leakage between
  restart and original run).

The final metrics line (one JSON object on stdout) reports per-bucket
lineage and aggregate turns/sec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="transcripts parquet path (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--generate", type=int, default=0, help="generate N synthetic conversations instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--gap-seconds", type=float, default=300.0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument(
        "--snapshots",
        action="store_true",
        help="commit each bucket as an append snapshot into <output>/features "
        "(snapshot-log checkpointing: resume reads the committed-bucket set "
        "from the log, so a crash between data write and manifest save can "
        "never double-write or skip a bucket) instead of bucket=<i>/ dirs",
    )
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from acoustic_feature_extractor_spark.plans.lineage import RunManifest, completed_partitions
    from acoustic_feature_extractor_spark.plans.pipeline import turn_features
    from acoustic_feature_extractor_spark.session import get_spark

    spark = get_spark(app_name="afe_run_turn_features", cores=args.cores)

    if args.generate:
        from acoustic_feature_extractor_spark.datagen import generate_transcripts

        t = generate_transcripts(spark, n_convs=args.generate)
    else:
        if not args.input:
            ap.error("--input or --generate required")
        t = spark.read.parquet(args.input)

    manifest_dir = os.path.join(args.output, "_manifest")
    snap_table = os.path.join(args.output, "features")
    if args.snapshots:
        from acoustic_feature_extractor_spark.sources import snapshots as snaplog

        # the snapshot LOG is the source of truth for completed buckets:
        # an entry exists iff that bucket's data committed atomically
        done = (
            {s.lineage.get("bucket") for s in snaplog.history(snap_table)}
            if args.resume
            else set()
        )
    else:
        done = completed_partitions(manifest_dir) if args.resume else set()
    prev = RunManifest.load(manifest_dir) if args.resume else None
    if prev is not None:
        # a resumed run MUST partition identically: mismatched buckets /
        # gap / input would silently skip or mis-normalize conversations
        for k in ("buckets", "gap_seconds", "input", "generate"):
            old_v, new_v = (prev.args or {}).get(k), vars(args).get(k)
            if old_v is not None and str(old_v) != str(new_v):
                raise SystemExit(
                    f"--resume argument mismatch: manifest has {k}={old_v}, "
                    f"this run has {k}={new_v}; rerun with matching arguments "
                    f"or a fresh --output"
                )

    run_id = f"run-{int(time.time())}"
    manifest = RunManifest(run_id=run_id, args=vars(args))
    stats = None
    if prev is not None:
        # snapshot mode: keep only lineage the log still vouches for (a
        # crash between snapshot commit and manifest save makes the
        # manifest lag the log, never lead it)
        manifest.partitions = [
            p
            for p in prev.partitions
            if not args.snapshots or p.get("partition") in done
        ]
        stats = (prev.args or {}).get("_frozen_stats")

    # Corpus stats computed ONCE over the full input and frozen into the
    # manifest — resumed buckets must normalize against the same numbers.
    if stats is None:
        from acoustic_feature_extractor_spark.operators.stats import corpus_stats

        row = corpus_stats(
            t.withColumn("text_len", F.length("text").cast("double")), "text_len"
        ).first()
        stats = {"mean": row["mean"], "stddev": row["stddev"]}
    manifest.args["_frozen_stats"] = stats

    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(args.buckets))
    t = t.withColumn("_bucket", bucket)

    total_rows, t_all = 0, time.perf_counter()
    for b in range(args.buckets):
        pid = f"bucket={b}"
        if pid in done:
            continue
        t0 = time.perf_counter()
        part = t.where(F.col("_bucket") == b).drop("_bucket")
        feats = turn_features(part, gap_seconds=args.gap_seconds, frozen_stats=stats)
        if args.snapshots:
            snap = snaplog.commit(
                feats,
                snap_table,
                lineage={"bucket": pid, "run_id": run_id},
            )
            rows = snap.rows
        else:
            out_path = os.path.join(args.output, pid)
            # row count via Observation on the write itself — re-reading
            # the fresh output would double the job's I/O at scale
            from pyspark.sql import Observation

            obs = Observation(f"rows_{pid}")
            feats.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                "overwrite"
            ).parquet(out_path)
            rows = int(obs.get["rows"])
        total_rows += rows
        manifest.record_partition(pid, rows=rows, seconds=round(time.perf_counter() - t0, 3))
        manifest.save(manifest_dir)  # checkpoint after every bucket

    manifest.finish()
    manifest.save(manifest_dir)
    wall = time.perf_counter() - t_all
    print(
        json.dumps(
            {
                "run_id": run_id,
                "buckets": args.buckets,
                "skipped": len(done),
                "rows_written": total_rows,
                "seconds": round(wall, 3),
                "rows_per_sec": round(total_rows / wall, 1) if wall > 0 else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
