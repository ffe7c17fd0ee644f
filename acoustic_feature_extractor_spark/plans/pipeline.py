"""The flagship feature pipeline — ``extract_collected_local`` recast.

One declarative plan over transcripts(conv_id, turn_idx, role, text, tool,
ts) producing the per-turn feature vector the north_star describes:

- lag/lead context (prev/next role, tool, text length, Δts)   [W2]
- rolling 5-turn stats over text length                        [W1]
- gap sessionization + position-in-session                     [W6]
- forward-fill of the latest tool state (as-of state fill)     [W4/J5]
- corpus-normalized text-length z-score (two-phase stats)      [A1/P2/J7]

Single shuffle on conv_id serves every window (same partitioning reused
across specs); the stats side is a 1-row broadcast. Payload columns pass
through untouched (per-turn text-equality invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..datagen import SESSION_GAP_SECONDS
from ..operators.fill import forward_fill
from ..operators.sessionize import sessionize
from ..operators.stats import corpus_stats


def turn_features(
    transcripts: DataFrame,
    gap_seconds: float = SESSION_GAP_SECONDS,
    rolling: int = 5,
    frozen_stats: dict | None = None,
) -> DataFrame:
    """The flagship per-turn feature DataFrame (see module docstring)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lo, hi = -(rolling // 2), rolling - 1 - rolling // 2
    w_roll = w.rowsBetween(lo, hi)

    d = transcripts.withColumn("text_len", F.length("text").cast("double"))
    d = (
        d.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("next_role", F.lead("role").over(w))
        .withColumn("prev_text_len", F.lag("text_len").over(w))
        .withColumn(
            "dt_prev_sec",
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w),
        )
        .withColumn("roll_len_mean", F.avg("text_len").over(w_roll))
        .withColumn("roll_len_min", F.min("text_len").over(w_roll))
        .withColumn("roll_len_max", F.max("text_len").over(w_roll))
    )
    d = sessionize(d, gap_seconds=gap_seconds)
    # turn_in_session = row_number over (conv_id, session_id) — but
    # computed ON THE EXISTING (conv_id, turn_idx) sort: a window keyed by
    # (conv_id, session_id) would insert a second local sort per
    # partition. Since session_id is non-decreasing in turn_idx, position
    # within the session = conv-position − conv-position at the session's
    # first row (carried forward by last(ignorenulls) over the same spec).
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    changed = F.coalesce(
        F.lag("session_id").over(w) != F.col("session_id"), F.lit(True)
    )
    d = d.withColumn("_rn", F.row_number().over(w))
    d = d.withColumn(
        "turn_in_session",
        F.col("_rn")
        - F.last(F.when(changed, F.col("_rn")), ignorenulls=True).over(w_run),
    ).drop("_rn")
    d = forward_fill(d, "tool", out_col="last_tool")

    if frozen_stats is not None:
        # stats pinned by the caller (resumable bucketed runs: every bucket
        # must normalize against the SAME corpus numbers, jobs/run_turn_features.py)
        sd = float(frozen_stats["stddev"])
        d = d.withColumn(
            "text_len_z",
            (F.col("text_len") - F.lit(float(frozen_stats["mean"]))) / F.lit(sd)
            if sd != 0.0
            else F.lit(0.0),
        )
        return d
    # stats read the RAW input, not the windowed frame: text_len depends
    # only on text, and aggregating over `d` would re-execute the whole
    # window lineage (a second conv_id exchange) in the stats branch
    st = corpus_stats(
        transcripts.withColumn("text_len", F.length("text").cast("double")),
        "text_len",
    ).select(F.col("mean").alias("_gm"), F.col("stddev").alias("_gs"))
    d = d.crossJoin(F.broadcast(st)).withColumn(
        "text_len_z",
        F.when(
            F.col("_gs") != 0.0,
            (F.col("text_len") - F.col("_gm")) / F.col("_gs"),
        ).otherwise(F.lit(0.0)),
    ).drop("_gm", "_gs")
    return d
