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

    # THREE window passes total, all on one (conv_id, turn_idx) sort:
    # pass 1 = every offset function (+ the conv-position row number),
    # pass 2 = the rolling frame, pass 3 = ONE run-frame WindowExec
    # fusing the session cumsum, the session-start carry, and the tool
    # forward-fill (same spec + frame + projection step → Spark plans a
    # single operator). The composable equivalents (sessionize(),
    # forward_fill(), a (conv_id, session_id) row_number) spell the same
    # semantics in 6 passes; the flagship is the headline path, so it is
    # hand-fused and pinned by the golden + oracle tests.
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    d = transcripts.withColumn("text_len", F.length("text").cast("double"))
    d = d.select(
        "*",
        F.lag("role").over(w).alias("prev_role"),
        F.lead("role").over(w).alias("next_role"),
        F.lag("text_len").over(w).alias("prev_text_len"),
        (
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
        ).alias("dt_prev_sec"),
        F.avg("text_len").over(w_roll).alias("roll_len_mean"),
        F.min("text_len").over(w_roll).alias("roll_len_min"),
        F.max("text_len").over(w_roll).alias("roll_len_max"),
        F.row_number().over(w).alias("_rn"),
    )
    # same gap predicate as operators/sessionize.py (strict >; first row
    # of a conversation has a null gap and opens session 0)
    d = d.withColumn(
        "_new", F.when(F.col("dt_prev_sec") > gap_seconds, 1).otherwise(0)
    )
    d = d.select(
        "*",
        F.sum("_new").over(w_run).cast("int").alias("session_id"),
        # turn_in_session = conv-position − conv-position at the session's
        # first row: a (conv_id, session_id)-keyed row_number would force
        # a second local sort per partition
        F.last(
            F.when(
                (F.col("_new") == 1) | F.col("dt_prev_sec").isNull(), F.col("_rn")
            ),
            ignorenulls=True,
        ).over(w_run).alias("_sess_start"),
        F.last("tool", ignorenulls=True).over(w_run).alias("last_tool"),
    )
    d = (
        d.withColumn("turn_in_session", F.col("_rn") - F.col("_sess_start"))
        .drop("_rn", "_new", "_sess_start")
    )
    # canonical column order (schema contract of entry()/golden snapshot)
    base = [c for c in transcripts.columns] + ["text_len"]
    d = d.select(
        *base,
        "prev_role",
        "next_role",
        "prev_text_len",
        "dt_prev_sec",
        "roll_len_mean",
        "roll_len_min",
        "roll_len_max",
        "session_id",
        "turn_in_session",
        "last_tool",
    )

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
