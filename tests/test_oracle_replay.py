"""End-to-end replay of the driver's correctness gate as a pytest.

Deselected by default (pytest.ini addopts) — it runs every registered
query on Spark AND its oracle on DuckDB at sf0.01, ~10+ minutes. Run it
before handing a round to the driver:

    python -m pytest -m oracle_replay -q
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.oracle_replay
def test_every_registered_query_matches_its_oracle(spark):
    from tools.check_oracle import replay

    failures = replay(spark=spark)
    assert failures == [], f"oracle drift: {failures}"


@pytest.mark.oracle_replay
def test_registry_is_timezone_independent(spark):
    """The driver supplies its own Spark session; its timezone is not this
    repo's to control. Replay the ENTIRE registry with a non-UTC session
    tz on BOTH engines and assert zero drift — the contract that killed
    round-3's ``pruned_scan`` (naive-datetime literals shift with session
    tz; epoch arithmetic does not)."""
    from tools.check_oracle import replay

    failures = replay(spark=spark, tz="America/New_York")
    assert failures == [], f"timezone-dependent queries: {failures}"


@pytest.mark.oracle_replay
def test_registry_is_scale_factor_robust(spark):
    """Replay the ENTIRE registry at sf0.001 (10x smaller than the
    driver's gate): tiny groups, empty session tails, single-file
    snapshots — the fixture-size edge cases a query with a hidden
    sf0.01-shaped assumption would trip on. First proven green in r5
    (137/137); pinned so it stays that way."""
    from tools.check_oracle import replay

    failures = replay(spark=spark, sf_dir="/root/testdata/sf0.001")
    assert failures == [], f"sf0.001 drift: {failures}"
