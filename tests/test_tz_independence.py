"""Operator-level timezone-independence contract.

The driver supplies its own SparkSession whose ``spark.sql.session.timeZone``
this repo does not control (round-3 post-mortem: ``pruned_scan`` broke only
on the driver's box). ``tools/check_oracle.py --tz`` guards the REGISTRY;
this module pins the contract at the OPERATOR level: every time-arithmetic
operator must produce identical results under any session timezone.

The fixture data deliberately spans the US DST spring-forward
(2024-03-10 02:00 America/New_York): wall-clock minutes 02:00–02:59 do not
exist in that zone, so any code path that localizes a TIMESTAMP_NTZ value in
the session timezone (``cast("timestamp")``) shifts those rows by an hour —
and the UTC-offset CHANGE mid-range breaks even difference-based logic
(gaps, trailing windows, as-of distances), not just absolute exports.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.operators.asof import (
    asof_join,
    asof_join_salted_jvm,
)
from acoustic_feature_extractor_spark.operators.rollup import rollup
from acoustic_feature_extractor_spark.operators.sessionize import sessionize
from acoustic_feature_extractor_spark.operators.temporal import (
    temporal_split,
    time_decayed_sum,
    trailing_time_window,
)
from acoustic_feature_extractor_spark.sources.layout import zorder_key

# UTC plus a DST zone (offset changes inside the data range) plus a
# non-hour-aligned fixed offset (+05:45 — catches sub-hour truncation)
TZS = ["UTC", "America/New_York", "Asia/Kathmandu"]

# wall-clock times straddling the NY spring-forward; 02:05/02:50 do not
# exist as NY local times — the poison rows
_TS = [
    "2024-03-10 00:30:00",
    "2024-03-10 01:15:00",
    "2024-03-10 01:59:30",
    "2024-03-10 02:05:00",
    "2024-03-10 02:50:00",
    "2024-03-10 03:10:00",
    "2024-03-10 04:00:00",
    "2024-03-10 07:45:00",
]


def _left(spark):
    # ts built from STRINGS cast to TIMESTAMP_NTZ — a pure conversion.
    # (pandas naive datetimes reach Spark as TIMESTAMP instants localized
    # in the session tz, which is lossy for the nonexistent 02:xx NY wall
    # times — that would test the fixture, not the operator.)
    pdf = pd.DataFrame(
        {
            "conv_id": ["a"] * len(_TS),
            "turn_idx": range(len(_TS)),
            "ts_s": _TS,
            "v": [float(i) for i in range(len(_TS))],
        }
    )
    return (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
    )


def _right(spark):
    rts = ["2024-03-10 01:00:00", "2024-03-10 02:20:00", "2024-03-10 03:30:00"]
    pdf = pd.DataFrame({"conv_id": ["a"] * 3, "ts_s": rts, "price": [1.0, 2.0, 3.0]})
    return (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s")
    )


def _canon(df):
    rows = df.collect()
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in rows)


def _under_tzs(spark, build):
    """Collect ``build()``'s result under each session tz; return the list."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    out = []
    try:
        for tz in TZS:
            spark.conf.set("spark.sql.session.timeZone", tz)
            out.append(_canon(build()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    return out


@pytest.mark.parametrize(
    "name,build_fn",
    [
        (
            "sessionize",
            lambda s: sessionize(_left(s), gap_seconds=3000.0),
        ),
        (
            "asof_backward",
            lambda s: asof_join(_left(s), _right(s), tolerance_seconds=7200.0),
        ),
        (
            "asof_nearest",
            lambda s: asof_join(_left(s), _right(s), direction="nearest"),
        ),
        (
            "asof_salted_jvm",
            lambda s: asof_join_salted_jvm(
                _left(s), _right(s), chunk_seconds=3600.0
            ),
        ),
        (
            "rollup",
            lambda s: rollup(_left(s), 3600.0, "conv_id", "v"),
        ),
        (
            "trailing_time_window",
            lambda s: trailing_time_window(_left(s), "v", [3600.0]),
        ),
        (
            "time_decayed_sum",
            lambda s: time_decayed_sum(_left(s), "v", 1800.0),
        ),
        (
            "seasonal_baseline",
            lambda s: __import__(
                "acoustic_feature_extractor_spark.operators.temporal",
                fromlist=["seasonal_baseline"],
            ).seasonal_baseline(
                _left(s), by="conv_id", ts_col="ts", value_col="v",
                tiebreak_col="turn_idx",
            ),
        ),
        (
            "temporal_split_str",
            lambda s: temporal_split(
                _left(s), "2024-03-10 02:30:00", embargo_seconds=1800.0
            ),
        ),
        (
            "zorder_key",
            lambda s: _left(s).select(
                "turn_idx",
                zorder_key(
                    _left(s),
                    ["ts", "v"],
                    {
                        # epoch-us bounds of the wall-clock range (tz-free)
                        "ts": (1710030600000000.0, 1710056700000000.0),
                        "v": (0.0, 7.0),
                    },
                ).alias("z"),
            ),
        ),
    ],
)
def test_operator_tz_independent(spark, name, build_fn):
    results = _under_tzs(spark, lambda: build_fn(spark))
    for tz, got in zip(TZS[1:], results[1:]):
        assert got == results[0], f"{name}: result drifts under session tz {tz}"


def _transcripts_ntz(spark):
    """Driver-shaped transcripts frame (conv_id, turn_idx, role, text,
    tool, ts) with TIMESTAMP_NTZ ts straddling the NY DST gap — the
    dtype the real testdata parquet carries."""
    n = len(_TS)
    pdf = pd.DataFrame(
        {
            "conv_id": ["c0"] * n,
            "turn_idx": range(n),
            "role": ["user", "assistant"] * (n // 2),
            "text": [f"t{i}" * (i + 1) for i in range(n)],
            "tool": [None, None, "grep", None, None, "sed", None, None],
            "ts_s": _TS,
        }
    )
    return (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.col("ts_s").cast("timestamp_ntz"))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .drop("ts_s")
    )


@pytest.mark.parametrize("salt_above", [None, 2])
def test_turn_features_tz_independent_on_ntz(spark, salt_above):
    """The flagship itself must accept a driver-shaped NTZ table and
    produce identical frames under any session tz (plain AND salted
    paths; salt_above=2 routes the 8-turn conversation salted)."""
    from acoustic_feature_extractor_spark.plans.pipeline import turn_features

    results = _under_tzs(
        spark,
        lambda: turn_features(
            _transcripts_ntz(spark),
            gap_seconds=3000.0,
            salt_above=salt_above,
            chunk_rows=4,
        ),
    )
    for tz, got in zip(TZS[1:], results[1:]):
        assert got == results[0], f"turn_features drifts under session tz {tz}"
    # and the DST-gap rows landed: dt_prev_sec at turn 3 is the true
    # 330-wall-second step (02:05 − 01:59:30), not a localized 1h-shifted one
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        dt = {
            r["turn_idx"]: r["dt_prev_sec"]
            for r in turn_features(
                _transcripts_ntz(spark), gap_seconds=3000.0,
                salt_above=salt_above, chunk_rows=4,
            ).select("turn_idx", "dt_prev_sec").collect()
        }
        assert dt[3] == 330.0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_epoch_sec_fn_dispatch(spark):
    """epoch_sec_fn picks the right conversion per dtype and every path
    agrees on the same instant/wall value under a non-UTC session tz."""
    from acoustic_feature_extractor_spark.functions.scalars import (
        epoch_sec_fn,
        ntz_epoch_sec,
        sec_to_ntz,
    )

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kathmandu")
        wall = "2024-03-10 02:05:00.250000"  # inside the NY DST gap
        want = 1710036300.25  # epoch secs of that wall time taken as UTC
        df = spark.sql(
            f"""SELECT
                  cast('{wall}' as timestamp_ntz)           AS c_ntz,
                  '{wall}'                                  AS c_str,
                  cast('2024-03-10' as date)                AS c_date,
                  cast({want} as double)                    AS c_dbl,
                  cast({int(want)} as bigint)               AS c_big,
                  timestamp_micros({int(want * 1e6)})       AS c_inst"""
        )
        got = df.select(
            *[
                epoch_sec_fn(df, c)(F.col(c)).alias(c)
                for c in ("c_ntz", "c_str", "c_dbl", "c_big", "c_inst")
            ],
            epoch_sec_fn(df, "c_date")(F.col("c_date")).alias("c_date"),
        ).first()
        assert got["c_ntz"] == want
        assert got["c_str"] == want
        assert got["c_dbl"] == want
        assert got["c_big"] == float(int(want))
        # a true instant has a tz-free epoch — direct cast path
        assert got["c_inst"] == want
        assert got["c_date"] == 1710028800.0  # midnight of the wall date
        # sec_to_ntz is the exact inverse of ntz_epoch_sec at micro grain
        rt = df.select(
            sec_to_ntz(ntz_epoch_sec(F.col("c_ntz"))).alias("rt")
        ).first()["rt"]
        assert str(rt) == "2024-03-10 02:05:00.250000"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_sessionize_gap_semantics_across_dst(spark):
    """Pin the VALUE, not just tz-invariance: the 01:59:30 → 02:05 step is
    330 wall-clock seconds — same session whatever the zone; localizing in
    NY would stretch it across the nonexistent hour."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = (
            sessionize(_left(spark), gap_seconds=3000.0)
            .orderBy("turn_idx")
            .select("session_id")
            .toPandas()["session_id"]
            .tolist()
        )
        # gaps (wall secs): 2700, 2670, 330, 2700, 1200, 3000, 13500 —
        # only the final 3.75h jump exceeds the 3000s threshold... and the
        # 03:10→04:00 gap is exactly 3000 (not >), so it stays in-session
        assert out == [0, 0, 0, 0, 0, 0, 0, 1]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_rollup_bucket_is_wall_clock_ntz(spark):
    """time_bucket output is TIMESTAMP_NTZ and its wall value is the
    floor of the input wall time — under ANY session tz."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        r = rollup(_left(spark), 3600.0, "conv_id", "v")
        assert r.schema["bucket"].dataType.simpleString() == "timestamp_ntz"
        buckets = sorted(str(x["bucket"]) for x in r.select("bucket").collect())
        assert buckets == [
            "2024-03-10 00:00:00",
            "2024-03-10 01:00:00",
            "2024-03-10 02:00:00",
            "2024-03-10 03:00:00",
            "2024-03-10 04:00:00",
            "2024-03-10 07:00:00",
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ntz_epoch_us_exact_edge_values(spark):
    """The interval-subtraction formulation of ntz_epoch_us is exact for
    fractional seconds, the epoch itself, pre-1970 values, and far-range
    timestamps — under a non-UTC session tz (incl. a DST-gap wall time)."""
    import datetime as dt

    from acoustic_feature_extractor_spark.functions.scalars import ntz_epoch_us

    rows = [
        "2024-03-10 02:05:00.123456",  # inside the NY spring-forward gap
        "1970-01-01 00:00:00",
        "1969-12-31 23:59:59.5",
        "1969-06-01 12:00:00.25",
        "2286-11-20 17:46:40.000001",
        "1900-01-01 00:00:00.000001",
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        d = spark.createDataFrame([(r,) for r in rows], "s string").select(
            "s", F.col("s").cast("timestamp_ntz").alias("ts")
        )
        got = {
            r["s"]: r["us"]
            for r in d.select("s", ntz_epoch_us(F.col("ts")).alias("us")).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    for s in rows:
        exact = (
            dt.datetime.fromisoformat(s) - dt.datetime(1970, 1, 1)
        ) // dt.timedelta(microseconds=1)
        assert got[s] == exact, (s, got[s], exact)


def test_time_bucket_fast_paths_match_general(spark):
    """The minute/hour/day calendar fast paths in ``time_bucket`` are
    bit-identical to the general floor(epoch/w)*w path — under every TZS
    session tz, on DST-gap wall times, pre-1970 values, and fractional
    seconds — and stay TIMESTAMP_NTZ. (``date_trunc`` and ``hour()`` on
    NTZ coerce through the session tz — measured: a DST-gap wall time
    shifts +1h — which is why the fast path is built from ``cast(date)``
    + interval field extraction instead.)"""
    from acoustic_feature_extractor_spark.functions.scalars import (
        ntz_epoch_sec,
        sec_to_ntz,
    )
    from acoustic_feature_extractor_spark.operators.rollup import time_bucket

    rows = _TS + [
        "1969-12-31 23:59:59.5",
        "1905-06-07 08:09:10.111213",
        "2024-11-03 01:30:00.000001",
        "2024-01-05 13:21:45.999999",
    ]
    d = spark.createDataFrame([(r,) for r in rows], "s string").select(
        F.col("s").cast("timestamp_ntz").alias("ts")
    )

    def build(width):
        gen = sec_to_ntz(
            F.floor(ntz_epoch_sec("ts") / F.lit(width)) * F.lit(width)
        )
        return d.select(
            "ts", time_bucket("ts", width).alias("fast"), gen.alias("gen")
        )

    for width in (60.0, 3600.0, 86400.0):
        df = build(width)
        assert (
            df.schema["fast"].dataType.simpleString() == "timestamp_ntz"
        ), f"width {width}: fast path changed dtype"
        for res in _under_tzs(spark, lambda: build(width)):
            # _canon sorts columns alphabetically: fast, gen, ts
            for fast, gen, ts in res:
                assert fast == gen, (
                    f"width {width}: fast {fast} != general {gen} at {ts}"
                )
