"""Size-gated broadcast hints.

A forced ``F.broadcast`` on a relation that grows with the input is a
scale hazard: past the 8 GB broadcast ceiling the job FAILS outright
instead of falling back to a shuffle join. But dropping every hint costs
real time at small scale, where AQE's runtime re-planning adds a stage
boundary per join. The middle path: gate the hint on **Catalyst's own
optimizer estimate** (``optimizedPlan().stats().sizeInBytes`` — derived
from source file sizes and plan shape, computed on the driver with NO
job). Small estimate → plan the broadcast statically; large or unknown
estimate → no hint, AQE decides at runtime from true shuffle sizes.

The estimate is conservative in the right direction: it scales with the
input files, so a per-document or per-(key, chunk) side table that is
tiny at test scale but fact-scaled at 100 TB loses the hint exactly when
it must.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# hint only well under the default 8 GB hard ceiling and the session's
# 64 MB autoBroadcastJoinThreshold
DEFAULT_BROADCAST_CAP = 64 << 20


def estimated_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimizer size estimate for the plan's output, in bytes
    (driver-side, no job). None when the bridge/estimate is unavailable.

    The estimate is a BigInt whose magnitude MULTIPLIES through join
    stacks — on iterative plans (connected components' hash-min loop) it
    reaches millions of DIGITS, and stringifying it costs minutes of
    driver CPU (BigInteger.toString is super-linear; observed 700+ s
    wedging the py4j thread). Probe ``bitLength()`` first — O(1) — and
    bail out for anything that can't fit a long: such a plan is
    definitionally not broadcastable, the exact digits are irrelevant."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def maybe_broadcast(
    df: DataFrame, max_bytes: int = DEFAULT_BROADCAST_CAP
) -> DataFrame:
    """``F.broadcast(df)`` iff the optimizer's size estimate is at most
    ``max_bytes``; the unmodified plan (AQE decides) otherwise or when no
    estimate exists."""
    est = estimated_size_bytes(df)
    if est is not None and est <= max_bytes:
        return F.broadcast(df)
    return df
