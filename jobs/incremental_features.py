"""Incremental feature backfill over snapshot tables.

The batch flagship (``run_turn_features.py``) recomputes everything; this
job is the INCREMENTAL twin a 10^12-turn deployment actually runs hourly:

1. The source transcripts live in a snapshot-log table (append-only
   commits, e.g. landed by ``sources/snapshots.snapshot_sink``).
2. The features table's own snapshot lineage records the last SOURCE
   snapshot id it processed. The delta = exactly the data dirs appended
   since — resolved from snapshot metadata, zero scanning.
3. Window features depend on whole conversations, so the job recomputes
   the full history of only the conversations TOUCHED by the delta (a
   semi-join; with conv-bucketed layout this is a pruned read) and
   :func:`~acoustic_feature_extractor_spark.sources.snapshots.merge_upsert`'s
   copy-on-write merge rewrites only the feature dirs those convs live in.
4. Normalization statistics are computed ONCE on the first run and pinned
   in lineage (the reference's separate-statistics-job contract,
   ``extract_f0_statistics.py`` → applied by ``f0.convert``): later
   increments normalize against the same corpus numbers, keeping every
   already-served feature stable (training/serving consistency). Re-fit
   by truncating the features table and rerunning.
5. Every increment SELF-MONITORS drift: the first run also pins a
   fixed-range histogram sketch of the normalized signal (text_len) in
   lineage, and each later increment scores the DELTA's distribution
   against it with ``sketches.psi_from_hists`` — one extra aggregate
   over data the job already reads, no second fact pass. The PSI lands
   in the JSON line and in the commit lineage; ``--max-psi`` turns it
   into a gate (a drifted drop fails the job instead of silently
   poisoning the features table with stale normalization).

Cost per increment ≈ O(touched conversations), not O(corpus): an hourly
drop touching 0.1% of conversations reads and writes 0.1% of the bytes.

Emits one JSON line: rows upserted, touched conversations, processed
source snapshot, drift PSI vs the pinned window, and whether the run
was a no-op.
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
    ap.add_argument("--source", required=True, help="transcripts snapshot table")
    ap.add_argument("--features", required=True, help="features snapshot table")
    ap.add_argument("--gap-seconds", type=float, default=None)
    ap.add_argument("--rolling", type=int, default=5)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument(
        "--max-psi",
        type=float,
        default=None,
        help="fail the run when the delta's PSI vs the pinned training "
        "window exceeds this (0.25 = the classic 'drifted' bar); default "
        "monitor-only",
    )
    ap.add_argument(
        "--max-ks",
        type=float,
        default=None,
        help="fail the run when the delta's Kolmogorov–Smirnov distance "
        "vs the pinned training window exceeds this — the "
        "distribution-free companion bar to --max-psi (PSI explodes on "
        "near-empty bins; KS is the bounded worst-case CDF gap). Both "
        "score from the SAME pinned histogram; default monitor-only",
    )
    args = ap.parse_args(argv)

    from acoustic_feature_extractor_spark.datagen import SESSION_GAP_SECONDS
    from acoustic_feature_extractor_spark.operators.stats import corpus_stats
    from acoustic_feature_extractor_spark.plans.pipeline import turn_features
    from acoustic_feature_extractor_spark.session import get_spark
    from acoustic_feature_extractor_spark.sources import snapshots as snap

    gap = args.gap_seconds if args.gap_seconds is not None else SESSION_GAP_SECONDS
    spark = get_spark(app_name="afe_incremental_features", cores=args.cores)
    t0 = time.perf_counter()

    src_hist = snap.history(args.source)
    if not src_hist:
        raise SystemExit(f"no source snapshots at {args.source}")
    head = src_hist[-1]

    feat_hist = snap.history(args.features)
    last = max(
        (s.lineage.get("source_snapshot", 0) for s in feat_hist), default=0
    )
    if last >= head.snapshot_id:
        print(json.dumps({"noop": True, "source_snapshot": last}))
        return 0

    # delta = dirs the source gained since `last` (snapshot METADATA diff —
    # nothing is scanned to find the increment)
    by_id = {s.snapshot_id: s for s in src_hist}
    if last and last not in by_id:
        raise SystemExit(
            f"source snapshot {last} (the last one processed) has been "
            f"expired from the log (have {sorted(by_id)}) — the delta is "
            "unrecoverable; truncate the features table and rerun full"
        )
    old_dirs = set(by_id[last].dirs) if last else set()
    bad = [
        s.snapshot_id
        for s in src_hist
        if s.snapshot_id > last and s.operation != "append"
    ]
    if last and bad:
        raise SystemExit(
            f"source snapshots {bad} are not appends — incremental delta "
            "is undefined; truncate the features table and rerun full"
        )
    new_dirs = [d for d in head.dirs if d not in old_dirs]
    delta = spark.read.parquet(*[os.path.join(args.source, d) for d in new_dirs])
    touched = delta.select("conv_id").distinct()

    # full history of ONLY the touched conversations (windows need whole
    # convs; everything untouched keeps its existing feature rows)
    full = snap.read(spark, args.source)
    hist = full.join(touched, "conv_id", "left_semi")

    # fixed-range drift-sketch domain for text_len (chars): pinned once,
    # every later increment bins identically (same at-rest contract as
    # sketches.hist_rollup)
    _H_LO, _H_HI, _H_BINS = 0.0, 1024.0, 16

    def _text_len_hist(df) -> list[int]:
        w_bin = (_H_HI - _H_LO) / _H_BINS
        b = F.least(
            F.greatest(
                F.floor((F.length("text").cast("double") - F.lit(_H_LO)) / F.lit(w_bin)),
                F.lit(0),
            ),
            F.lit(_H_BINS - 1),
        )
        got = {
            r["_b"]: r["_c"]
            for r in df.groupBy(b.alias("_b")).agg(F.count(F.lit(1)).alias("_c")).collect()
        }
        return [int(got.get(i, 0)) for i in range(_H_BINS)]

    drift_psi = None
    drift_ks = None
    if feat_hist:
        stats = feat_hist[0].lineage["stats"]
        ref_hist = feat_hist[0].lineage.get("text_len_hist")
        if ref_hist:
            # PSI + KS of the DELTA (the new drop, already in memory) vs
            # the pinned training window — both scored from the SAME two
            # 1-row hist frames (sketches.psi_from_hists / ks_from_hists);
            # bins-sized collects
            from acoustic_feature_extractor_spark.operators.sketches import (
                ks_from_hists,
                psi_from_hists,
            )

            cur_hist = _text_len_hist(delta)
            rdf = spark.createDataFrame([("all", ref_hist)], "g string, hist array<bigint>")
            cdf = spark.createDataFrame([("all", cur_hist)], "g string, hist array<bigint>")
            terms = psi_from_hists(rdf, cdf, by="g", bins=_H_BINS).collect()
            drift_psi = float(sum(r["psi_term"] for r in terms))
            drift_ks = float(
                ks_from_hists(rdf, cdf, by="g", bins=_H_BINS).first()["ks"]
            )
            tripped = None
            if args.max_psi is not None and drift_psi > args.max_psi:
                tripped = {"drift_psi": round(drift_psi, 6), "max_psi": args.max_psi}
            elif args.max_ks is not None and drift_ks > args.max_ks:
                tripped = {"drift_ks": round(drift_ks, 6), "max_ks": args.max_ks}
            if tripped is not None:
                print(
                    json.dumps(
                        {
                            "noop": False,
                            "failed": "drift_gate",
                            "source_snapshot": head.snapshot_id,
                            **tripped,
                        }
                    )
                )
                return 2
    else:
        row = corpus_stats(
            full.withColumn("text_len", F.length("text").cast("double")),
            "text_len",
        ).first()
        stats = {"mean": float(row["mean"]), "stddev": float(row["stddev"])}
        ref_hist = _text_len_hist(full)

    feats = turn_features(
        hist, gap_seconds=gap, rolling=args.rolling, frozen_stats=stats
    )
    lineage = {
        "source_snapshot": head.snapshot_id,
        "stats": stats,
        "text_len_hist": ref_hist,
        "job": "incremental_features",
    }
    if drift_psi is not None:
        lineage["drift_psi"] = round(drift_psi, 6)
    if drift_ks is not None:
        lineage["drift_ks"] = round(drift_ks, 6)
    if not feat_hist:
        out = snap.commit(feats, args.features, lineage=lineage)
        rewritten: list[str] = []
    else:
        out = snap.merge_upsert(
            spark,
            feats,
            args.features,
            key=["conv_id", "turn_idx"],
            lineage=lineage,
        )
        rewritten = out.lineage["rewritten_dirs"]

    n_touched = touched.count()
    print(
        json.dumps(
            {
                "noop": False,
                "source_snapshot": head.snapshot_id,
                "rows_written": out.rows,
                "touched_convs": n_touched,
                "rewritten_dirs": rewritten,
                "drift_psi": None if drift_psi is None else round(drift_psi, 6),
                "drift_ks": None if drift_ks is None else round(drift_ks, 6),
                "wall_s": round(time.perf_counter() - t0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
