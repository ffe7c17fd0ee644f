"""Structured Streaming surface (beyond-reference; the reference is batch
only — every script is a finite glob → pool → files run,
``/root/reference/src/extractor/extract_f0.py:50-63``).

Provided because a transcript feed is naturally a stream: watermarked
session windows (the streaming twin of the batch gap-sessionization in
``operators/sessionize.py``) and windowed turn-rate aggregates. Tested by
driving a parquet-backed stream to completion with
``processAllAvailable()`` (no external broker in the sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_agg(
    stream: DataFrame,
    gap_seconds: float = 300.0,
    watermark: str = "10 minutes",
    key: str = "conv_id",
    ts: str = "ts",
) -> DataFrame:
    """Per-(key, session_window) turn counts with late-data watermarking.

    ``session_window`` closes a session after ``gap_seconds`` idle — the
    streaming equivalent of the batch cumsum-of-gaps session ids.
    """
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), f"{int(gap_seconds)} seconds"), F.col(key))
        .agg(
            F.count("*").alias("n_turns"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
    )


def streaming_turn_rate(
    stream: DataFrame,
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
    ts: str = "ts",
) -> DataFrame:
    """Sliding-window turn-rate aggregate (ops dashboard shape)."""
    return (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window, slide))
        .agg(F.count("*").alias("n_turns"))
    )
