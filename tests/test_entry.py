"""Driver-contract smoke: entry() produces rows; queries()/oracle_sql()
registries are consistent; a sample of queries runs at sf0.001."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "conv_id" in df.columns and "text" in df.columns


def test_registry_consistency():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30
    # every query is oracle-checked — no rows-only omissions remain
    assert set(qs) == set(oracles)


@pytest.mark.parametrize(
    "name",
    ["flagship_features", "asof_join", "sessionize", "tpch_q1", "text_profile"],
)
def test_sample_queries_run_sf0001(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() > 0
