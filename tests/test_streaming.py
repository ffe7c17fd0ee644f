"""Structured Streaming smoke: session windows on a file-backed stream
driven to completion with processAllAvailable (no external broker)."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest

from acoustic_feature_extractor_spark.streaming.sessions import streaming_session_agg


def test_streaming_session_agg(spark, transcripts):
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/in"
        transcripts.limit(2000).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        agg = streaming_session_agg(stream, gap_seconds=300.0)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("sess_out")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM sess_out").collect()
        finally:
            q.stop()
        assert len(rows) > 0
        assert all(r["n_turns"] >= 1 for r in rows)
