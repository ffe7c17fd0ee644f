"""Missing-value filling: forward-fill, backfill, linear interpolation.

Reference parity target — ``F0.convert``'s unvoiced interpolation
(``/root/reference/src/acoustic_feature_extractor/data/f0.py:70-83``):
unvoiced frames are filled by **linear interpolation between the bracketing
voiced frames**; positions before the first / after the last voiced frame
clamp to the first/last voiced value (numpy.interp semantics).

Pure Catalyst: ``last(..., ignorenulls)`` / ``first(..., ignorenulls)``
windows + column arithmetic. No Python. One shuffle on the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def forward_fill(
    df: DataFrame,
    value_col: str,
    key: str = "conv_id",
    order: str = "turn_idx",
    out_col: str | None = None,
) -> DataFrame:
    """Step-fill: carry the last non-null value forward (as-of state fill)."""
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col or f"{value_col}_ffill", F.last(value_col, ignorenulls=True).over(w))


def backward_fill(
    df: DataFrame,
    value_col: str,
    key: str = "conv_id",
    order: str = "turn_idx",
    out_col: str | None = None,
) -> DataFrame:
    w = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return df.withColumn(out_col or f"{value_col}_bfill", F.first(value_col, ignorenulls=True).over(w))


def interpolate_fill(
    df: DataFrame,
    value_col: str,
    key: str = "conv_id",
    order: str = "turn_idx",
    out_col: str | None = None,
) -> DataFrame:
    """Linear interpolation between bracketing non-nulls, clamped at edges.

    Exactly ``numpy.interp(all_idx, valid_idx, valid_values)`` per entity —
    the reference's unvoiced fill (``f0.py:74-81``). Implemented as four
    windows (prev/next value and index) + one arithmetic expression:

        filled = pv + (nv - pv) * (i - pi) / (ni - pi)

    with edge clamp ``coalesce(interp, pv, nv)``.
    """
    wp = Window.partitionBy(key).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy(key).orderBy(order).rowsBetween(0, Window.unboundedFollowing)
    v = F.col(value_col)
    idx = F.col(order).cast("double")
    idx_if_valid = F.when(v.isNotNull(), idx)
    pv = F.last(v, ignorenulls=True).over(wp)
    pi = F.last(idx_if_valid, ignorenulls=True).over(wp)
    nv = F.first(v, ignorenulls=True).over(wn)
    ni = F.first(idx_if_valid, ignorenulls=True).over(wn)
    interp = pv + (nv - pv) * (idx - pi) / (ni - pi)
    filled = F.when(v.isNotNull(), v).otherwise(F.coalesce(interp, pv, nv))
    return df.withColumn(out_col or f"{value_col}_interp", filled)
