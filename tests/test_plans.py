"""Physical-plan audits: the scale properties SURVEY §4 promises must be
visible in the executed plan, not just intended.

- predicate pushdown reaches the parquet scan (PushedFilters)
- column pruning: the scan's ReadSchema carries only referenced columns
- small dimension tables broadcast (BroadcastHashJoin, no shuffle join)
- windows stay whole-stage-codegen-adjacent with a single exchange chain
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


def test_filter_pushdown_and_pruning(spark, entry_mod):
    plan = _plan(entry_mod.queries()["tpch_q1"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: only the 6 referenced lineitem columns are read
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_dimension_joins_broadcast(spark, entry_mod):
    plan = _plan(entry_mod.queries()["revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle-join


def test_asof_union_trick_is_pure_jvm(spark, entry_mod):
    """The union-trick as-of join must contain no Python evaluation node."""
    plan = _plan(entry_mod.queries()["asof_join"](spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Window" in plan


def test_flagship_single_window_exchange(spark):
    """All conv_id windows of the flagship pipeline reuse ONE exchange —
    adding window specs must not add shuffles."""
    from acoustic_feature_extractor_spark.datagen import generate_transcripts
    from acoustic_feature_extractor_spark.plans.pipeline import turn_features

    t = generate_transcripts(spark, n_convs=20)
    plan = _plan(turn_features(t))
    # exchanges: 1 for the conv_id windows (+1 inside the tiny stats
    # aggregate + its broadcast). The window chain itself must reuse one.
    # formatted explain prints exchange partitioning in the details
    # section as "Arguments: hashpartitioning(conv_id#...)"
    n_hash_exchanges = plan.count("hashpartitioning(conv_id")
    assert n_hash_exchanges == 1, plan


def test_scan_prunes_to_two_columns(spark):
    d = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey").distinct()
    read = [l for l in _plan(d).splitlines() if "ReadSchema" in l][0]
    assert "struct<l_orderkey" in read and "l_extendedprice" not in read
