from . import (  # noqa: F401
    asof,
    dedup,
    fill,
    intervals,
    multimodal,
    percentiles,
    sample,
    sessionize,
    similarity,
    skew,
    stats,
    windows,
)
