"""Streaming ingestion job: the Structured-Streaming twin of
``run_turn_features.py``.

Watches an input directory for transcript parquet files and maintains a
continuously-updated feature table::

    file stream → watermarked exact dedup → stateless turn features
    → as-of enrichment against a slowly-changing dimension → parquet sink

Launch (cluster or sandbox)::

    zip -r afe.zip acoustic_feature_extractor_spark
    spark-submit --master local[32] --py-files afe.zip \
        jobs/stream_turn_features.py --input /data/incoming --output /data/stream_features

Resumability is Structured Streaming's own checkpoint (the streaming
counterpart of the batch jobs' manifest): the sink's
``checkpointLocation`` records which source files are committed, so a
killed run resumes exactly after the last committed micro-batch and a
re-run after new files arrive processes ONLY the new files — no manifest
bookkeeping of our own, no duplicates (exactly-once file-sink semantics).

``--drain`` runs with ``trigger(availableNow=True)``: process everything
currently in the input directory, then stop — the testable batch-like
mode (and the backfill mode on a real cluster: same checkpoint, so a
later continuous run picks up where the drain ended).

Feature scope is deliberately the STATELESS slice of the flagship (text
length, token count, dimension as-of payload): cross-row windows need
ordered history and live in the batch job; the streaming twins of
sessionization/fill (``streaming/sessions.py``) are separate stateful
queries with their own sinks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="directory watched for transcript parquet files")
    ap.add_argument("--output", required=True)
    ap.add_argument("--dimension", help="optional (conv_id, ts, payload...) parquet history for as-of enrichment")
    ap.add_argument("--checkpoint", help="default <output>/_checkpoint")
    ap.add_argument("--watermark", default="10 minutes")
    ap.add_argument("--drain", action="store_true",
                    help="availableNow trigger: drain current files, then exit")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from acoustic_feature_extractor_spark.functions.text import token_count
    from acoustic_feature_extractor_spark.session import get_spark
    from acoustic_feature_extractor_spark.sources.tables import TRANSCRIPT_SCHEMA
    from acoustic_feature_extractor_spark.streaming.enrich import (
        intervalize_dimension,
        streaming_asof_enrich,
        streaming_exact_dedup,
    )

    spark = get_spark(app_name="afe_stream_turn_features", cores=args.cores)
    checkpoint = args.checkpoint or os.path.join(args.output, "_checkpoint")

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)  # bound micro-batch size
        .parquet(args.input)
    )
    deduped = streaming_exact_dedup(stream, watermark=args.watermark)
    feats = deduped.withColumn("text_len", F.length("text")).withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    if args.dimension:
        dim = intervalize_dimension(spark.read.parquet(args.dimension))
        feats = streaming_asof_enrich(feats, dim)

    # the parquet FileSink reports numOutputRows = -1; observed metrics
    # are the supported way to count what actually reached the sink
    feats = feats.observe("afe_sink", F.count(F.lit(1)).alias("rows"))

    writer = (
        feats.writeStream.format("parquet")
        .option("path", os.path.join(args.output, "features"))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if args.drain:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    q.awaitTermination()

    rows = 0
    for p in q.recentProgress:
        om = p.observedMetrics.get("afe_sink")
        if om is not None:
            rows += int(om["rows"])
    print(json.dumps({"sink_rows": rows, "checkpoint": checkpoint}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
