"""Build-time action audit (VERDICT r3 #9): a ``queries()`` builder is a
PLAN constructor — the only Spark jobs a declarative query may cost are
the ones the consumer's action triggers. Any job launched DURING the
builder call is an incidental driver action (a ``count()`` to size a
threshold, an eager ``collect()``): one extra job per invocation, paid
per-query at 100 TB.

The audit tags each builder call with a unique job group and asserts the
status tracker recorded ZERO jobs for it. Iterative/training queries
(connected components, k-means, snapshot-table scaffolding) legitimately
run build-time jobs by design and are not in the audited set.
"""

from __future__ import annotations

import sys
import uuid
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

# every declarative builder in the registry: plan construction only.
PURE_PLAN_QUERIES = [
    "flagship_features",
    "asof_join",
    "asof_salted",
    "asof_nearest",
    "sessionize",
    "session_bounds",
    "session_rollup",
    "stats_normalize",
    "forward_fill",
    "interp_fill",
    "lag_lead_context",
    "rolling_stats",
    "rolling_hop",
    "run_boundaries",
    "trailing_window",
    "time_decay",
    "target_encode",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_simhash",
    "dup_spans",
    "dup_span_stats",
    "dup_cut",
    "decontaminate",
    "hash_split",
    "doc_quality",
    "c4_clean",
    "pii_scrub",
    "tfidf_topk",
    "doc_perplexity",
    "text_profile",
    "winsorize",
    "tpch_q1",
    "revenue_by_nation",
    "grouped_stats",
    "pivot_counts",
    "cube_stats",
    "topk_per_group",
    "keyset_diff",
    "interval_expand",
    "interval_overlap",
    "multi_align",
    "multi_align_max",
    "resample_nearest",
    "resample_linear",
    "rollup_hourly",
    "rollup_cascade",
    "embedding_neardup",
    "ann_bruteforce",
    "salted_join_hot",
    # NOT audited: bloom_semi_join — the bitmap words are BY DESIGN a
    # bounded driver materialization (n_bits/64 longs) folded into the
    # probe predicate; building the plan requires the bitmap to exist.
    "onehot_features",
    # round-4 late additions
    "response_latency",
    "future_label",
    "sketch_cms",
    "negative_sample",
    "pit_staleness",
    "feature_vector",
]


@pytest.mark.parametrize("name", PURE_PLAN_QUERIES)
def test_builder_launches_zero_jobs(spark, name):
    import __spark_entry__ as entry

    builder = entry.queries()[name]
    sc = spark.sparkContext
    builder(spark, SF)  # warm the session table cache (schema-read jobs)
    group = f"audit-{name}-{uuid.uuid4().hex[:8]}"
    sc.setJobGroup(group, "build-time action audit")
    try:
        df = builder(spark, SF)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert list(jobs) == [], (
        f"{name} launched {len(jobs)} Spark job(s) while BUILDING its plan "
        "— an incidental driver action paid on every invocation"
    )
    assert df.columns  # the plan itself resolved
