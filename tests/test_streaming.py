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


def test_streaming_state_fill_matches_batch(spark, transcripts):
    """applyInPandasWithState forward-fill over TWO sequential file drops
    must equal the batch forward_fill over the full table — GroupState is
    the cross-micro-batch carrier."""
    from acoustic_feature_extractor_spark.operators.fill import forward_fill
    from acoustic_feature_extractor_spark.streaming.sessions import streaming_state_fill
    import pyspark.sql.functions as F

    t = transcripts.limit(1500).select("conv_id", "turn_idx", "ts", "tool").cache()
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/in"
        # two drops: early turns first, later turns second — state must
        # carry the fill across the micro-batch boundary
        t.where(F.col("turn_idx") < 5).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = streaming_state_fill(stream, value_col="tool")
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("fill_out")
            .start()
        )
        try:
            q.processAllAvailable()
            t.where(F.col("turn_idx") >= 5).write.mode("append").parquet(src)
            q.processAllAvailable()
            got = (
                spark.sql("SELECT * FROM fill_out")
                .orderBy("conv_id", "ts")
                .toPandas()
            )
        finally:
            q.stop()
    exp = (
        forward_fill(t, "tool", out_col="filled")
        .orderBy("conv_id", "ts")
        .select("conv_id", "ts", "tool", "filled")
        .toPandas()
    )
    assert len(got) == len(exp)
    assert (
        got["filled"].fillna("∅").to_numpy() == exp["filled"].fillna("∅").to_numpy()
    ).all()


def test_state_fill_multi_chunk_groups(spark, tmp_path):
    """applyInPandasWithState delivers a group as MULTIPLE Arrow chunks
    with no cross-chunk ts ordering; the fill must sort the whole group
    once (a chunk-at-a-time fill could back-fill earlier rows from a
    later-ts chunk that arrived first). Forced here by shrinking the
    Arrow batch size far below the group size."""
    import pandas as pd

    from acoustic_feature_extractor_spark.streaming.sessions import (
        streaming_state_fill,
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        n = 400
        base = pd.Timestamp("2024-01-01")
        # value only at the first row; later rows must fill from it, never
        # from any out-of-order chunk boundary artifact
        pdf = pd.DataFrame(
            {
                "conv_id": ["c"] * n,
                "ts": [base + pd.Timedelta(seconds=i) for i in range(n)],
                "tool": ["t0"] + [None] * (n - 2) + ["t1"],
            }
        )
        # shuffle row order so chunk boundaries don't align with ts order
        pdf = pdf.sample(frac=1.0, random_state=5).reset_index(drop=True)
        src = str(tmp_path / "src")
        spark.createDataFrame(pdf).write.parquet(src)
        stream = spark.readStream.schema(
            "conv_id string, ts timestamp, tool string"
        ).parquet(src)
        out = streaming_state_fill(stream, value_col="tool")
        q = (
            out.writeStream.format("memory")
            .queryName("fill_chunks")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("select * from fill_chunks").toPandas().sort_values("ts")
        assert got["filled"].iloc[:-1].eq("t0").all()
        assert got["filled"].iloc[-1] == "t1"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
