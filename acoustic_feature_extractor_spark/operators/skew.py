"""Skew engine: key salting with boundary carry rows + two-phase windows.

The reference packs work into duration-balanced buckets to avoid one huge
file starving a worker (``/root/reference/src/extractor/extract_f0_range.py:50-78``).
Our analog: a mega-conversation (10^5+ turns) would put its whole window
partition in one task. We split such keys into fixed-size chunks and keep
window semantics EXACT two ways:

- bounded frames (rolling): carry ``margin`` boundary rows into the
  neighboring chunk (explode), compute the window inside (key, chunk),
  keep only core rows → identical to the unsalted window.
- unbounded-preceding aggregations (cumsum / forward-fill): two-phase —
  chunk-local partials, then a per-chunk offset computed over the tiny
  (key, chunk) table and broadcast back (partial/final aggregation, the
  north_star requirement).

All pure Catalyst. The chunk id is derived from the ORDER column, so no
extra shuffle beyond the (key, chunk) window exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acoustic_feature_extractor_spark.plans.hints import maybe_broadcast

DEFAULT_CHUNK = 8192


def profile_entity_sizes(df: DataFrame, key: str = "conv_id") -> DataFrame:
    """Per-entity row counts — the salting decision input (A9 analog)."""
    return df.groupBy(key).agg(F.count("*").alias("n_rows"))


def _chunk(order: str, chunk_rows: int) -> Column:
    return F.floor(F.col(order) / F.lit(chunk_rows)).cast("long")


def salted_rolling(
    df: DataFrame,
    value_col: str,
    lo: int,
    hi: int,
    agg: str = "avg",
    key: str = "conv_id",
    order: str = "turn_idx",
    out_col: str | None = None,
    chunk_rows: int = DEFAULT_CHUNK,
) -> DataFrame:
    """Rolling aggregate over rowsBetween(lo, hi), salted with carry rows.

    Requires contiguous integer ``order`` per key (the transcripts
    invariant). Each row is exploded into its own chunk plus — within
    ``margin`` of a boundary — the neighbor chunk; window runs inside
    (key, chunk); only core rows survive. Result equals the unsalted
    window exactly (tests assert frame-for-frame equality).
    """
    out_col = out_col or f"{value_col}_{agg}"
    margin = max(abs(lo), abs(hi))
    # a carry row reaches only the ADJACENT chunk, so the chunk must cover
    # the whole frame reach; and a row near BOTH edges (margin close to
    # chunk_rows) must be carried BOTH ways — two independent when()s, not
    # a first-match chain
    assert chunk_rows >= margin, (
        f"chunk_rows={chunk_rows} must be >= window margin={margin}"
    )
    own = _chunk(order, chunk_rows)
    offset_in = F.col(order) % chunk_rows
    prev_extra = F.when((offset_in < margin) & (own > 0), own - 1)
    next_extra = F.when(offset_in >= chunk_rows - margin, own + 1)
    d = df.withColumn(
        "_chunks", F.array_compact(F.array(own, prev_extra, next_extra))
    ).select("*", F.explode("_chunks").alias("_chunk")).drop("_chunks")
    w = (
        Window.partitionBy(key, "_chunk")
        .orderBy(order)
        .rowsBetween(lo, hi)
    )
    agg_col = {
        "avg": F.avg(value_col),
        "sum": F.sum(value_col),
        "min": F.min(value_col),
        "max": F.max(value_col),
        "median": F.expr(f"percentile({value_col}, 0.5)"),
    }[agg].over(w)
    return (
        d.withColumn(out_col, agg_col)
        .where(_chunk(order, chunk_rows) == F.col("_chunk"))
        .drop("_chunk")
    )


def salted_cumsum(
    df: DataFrame,
    value_col: str,
    key: str = "conv_id",
    order: str = "turn_idx",
    out_col: str | None = None,
    chunk_rows: int = DEFAULT_CHUNK,
) -> DataFrame:
    """Exact unbounded-preceding cumsum via two-phase partial/final.

    Phase 1: cumsum inside (key, chunk). Phase 2: per-chunk totals (one row
    per chunk — tiny) get an exclusive prefix-sum over chunks; broadcast
    back and add. This is the reference's partial-then-final aggregation
    shape (``extract_f0_statistics.py:29-35``) applied to a window.
    """
    out_col = out_col or f"{value_col}_cumsum"
    d = df.withColumn("_chunk", _chunk(order, chunk_rows))
    w_local = (
        Window.partitionBy(key, "_chunk").orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_local", F.sum(value_col).over(w_local))
    totals = d.groupBy(key, "_chunk").agg(F.sum(value_col).alias("_chunk_total"))
    w_off = (
        Window.partitionBy(key).orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn("_offset", F.coalesce(F.sum("_chunk_total").over(w_off), F.lit(0.0)))
    # offsets has one row per (key, chunk) — it GROWS with the fact table
    # (10^8 rows at 10^12 turns / chunk 8192): a forced hint past the 8 GB
    # ceiling fails the job outright. Estimate-gated hint instead — static
    # broadcast while provably small, AQE at scale.
    return (
        d.join(maybe_broadcast(offsets.select(key, "_chunk", "_offset")), [key, "_chunk"])
        .withColumn(out_col, F.col("_local") + F.col("_offset"))
        .drop("_chunk", "_local", "_offset")
    )


def salted_forward_fill(
    df: DataFrame,
    value_col: str,
    key: str = "conv_id",
    order: str = "turn_idx",
    out_col: str | None = None,
    chunk_rows: int = DEFAULT_CHUNK,
) -> DataFrame:
    """Exact forward-fill with salting: chunk-local fill + per-chunk last
    non-null carried across chunks (two-phase state hand-off)."""
    out_col = out_col or f"{value_col}_ffill"
    d = df.withColumn("_chunk", _chunk(order, chunk_rows))
    w_local = (
        Window.partitionBy(key, "_chunk").orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_local", F.last(value_col, ignorenulls=True).over(w_local))
    # chunk state = the _local of the chunk's LAST row BY ORDER (its
    # running fill is the chunk's last non-null). max_by, not
    # F.last-in-agg: aggregate last() follows encounter order, which is
    # partition-layout-dependent — nondeterministic across runs.
    lasts = d.groupBy(key, "_chunk").agg(
        F.max_by("_local", F.col(order)).alias("_chunk_last")
    )
    w_carry = Window.partitionBy(key).orderBy("_chunk").rowsBetween(Window.unboundedPreceding, -1)
    carry = lasts.withColumn(
        "_carry", F.last("_chunk_last", ignorenulls=True).over(w_carry)
    )
    # carry is per-(key, chunk) — fact-scaled; estimate-gated hint
    return (
        d.join(maybe_broadcast(carry.select(key, "_chunk", "_carry")), [key, "_chunk"])
        .withColumn(out_col, F.coalesce(F.col("_local"), F.col("_carry")))
        .drop("_chunk", "_local", "_carry")
    )


def hot_entity_keys(df: DataFrame, key: str | list[str], threshold: int) -> DataFrame:
    """Keys whose row count reaches ``threshold`` — the hot side of a
    skewed-join split. Output is one row per hot key (by construction far
    smaller than the fact table: at most n_rows/threshold keys)."""
    key_cols = [key] if isinstance(key, str) else list(key)
    return (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n_rows"))
        .where(F.col("n_rows") >= F.lit(int(threshold)))
        .select(*key_cols)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salts: int = 16,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Skew-resilient equi-join: replicate the RIGHT side ``n_salts``× and
    scatter the LEFT side across the replicas, so one hot key becomes
    ``n_salts`` shuffle partitions instead of one straggler task.

    Exact: every left row carries ONE salt and meets exactly the replica
    set with that salt, so inner/left semantics are untouched (``right``/
    ``full`` would see unmatched right rows once per replica — rejected).
    AQE's skew-join split handles moderate skew after the fact; explicit
    salting is for the 10^7-rows-per-key regime where even one key's
    sorted run must not land in one task (north_star: explicit salting +
    two-phase aggregation).

    With ``hot_keys`` (e.g. :func:`hot_entity_keys` output, bounded by
    construction), only hot-key rows pay the replication — the cold
    majority takes the plain join — and the two halves union. Without it,
    the whole join is salted (right side must be dim-sized).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how}")
    on_cols = [on] if isinstance(on, str) else list(on)

    def _salted(lf: DataFrame, rt: DataFrame) -> DataFrame:
        rep = rt.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(int(n_salts) - 1)))
        )
        lf = lf.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(int(n_salts))).cast("int"),
        )
        return lf.join(rep, [*on_cols, "_salt"], how).drop("_salt")

    if hot_keys is None:
        return _salted(left, right)
    hk = F.broadcast(hot_keys.select(*on_cols))
    out_hot = _salted(left.join(hk, on_cols, "semi"), right.join(hk, on_cols, "semi"))
    out_cold = left.join(hk, on_cols, "anti").join(right, on_cols, how)
    return out_hot.unionByName(out_cold)
