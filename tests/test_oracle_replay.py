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
