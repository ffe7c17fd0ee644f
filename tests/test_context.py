"""Transcript-native context operators (operators/context.py +
functions/text.chunk_documents): leak-free context assembly, conversation
fingerprint dedup, transition mining, loop detection, RAG chunking."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.functions.text import chunk_documents
from acoustic_feature_extractor_spark.operators.context import (
    dedup_conversations,
    degenerate_runs,
    sequence_fingerprint,
    trailing_context,
    transition_counts,
)


@pytest.fixture(scope="module")
def turns(spark):
    """Small transcripts frame with an integer token weight."""
    from acoustic_feature_extractor_spark.datagen import generate_transcripts

    t = generate_transcripts(spark, n_convs=30, mega_every=11, mega_turns=120)
    return t.withColumn(
        "n_tokens", (F.length("text") % 17 + 1).cast("long")
    ).cache()


# ---------------------------------------------------------------- context


def _ctx_reference(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    """O(n²) pandas oracle for trailing_context semantics."""
    rows = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx").reset_index(drop=True)
        w = g["n_tokens"].tolist()
        for t in range(len(g)):
            n = tok = 0
            # include prior turn j iff the weight of turns j+1..t — what
            # must share the window with turn j, current turn included —
            # fits in the budget (trailing_context docstring semantics)
            suffix = w[t]
            for j in range(t - 1, -1, -1):
                if suffix > budget:
                    break
                n += 1
                tok += w[j]
                suffix += w[j]
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": g["turn_idx"][t],
                    "ctx_turns": n,
                    "ctx_tokens": tok,
                    "ctx_truncated": n < t,
                }
            )
    return pd.DataFrame(rows)


def test_trailing_context_matches_reference(turns):
    budget = 40
    got = (
        trailing_context(turns, "conv_id", ("turn_idx",), "n_tokens", budget)
        .select("conv_id", "turn_idx", "ctx_turns", "ctx_tokens", "ctx_truncated")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        _ctx_reference(
            turns.select("conv_id", "turn_idx", "n_tokens").toPandas(), budget
        )
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"ctx_turns": "int64", "ctx_tokens": "int64"}),
        want.astype({"ctx_turns": "int64", "ctx_tokens": "int64"}),
        check_dtype=False,
    )


def test_trailing_context_leak_free(turns):
    """First turn of every conversation has an empty context — nothing
    with a later order key can contribute (zero temporal leakage)."""
    r = trailing_context(turns, "conv_id", ("turn_idx",), "n_tokens", 10_000)
    first = r.where(F.col("turn_idx") == 0)
    bad = first.where(
        (F.col("ctx_turns") != 0)
        | (F.col("ctx_tokens") != 0)
        | F.col("ctx_truncated")
    ).count()
    assert bad == 0


def test_trailing_context_big_budget_takes_everything(turns):
    """With an effectively infinite budget the context is ALL prior turns."""
    r = trailing_context(turns, "conv_id", ("turn_idx",), "n_tokens", 10**9)
    bad = r.where(
        (F.col("ctx_turns") != F.col("turn_idx")) | F.col("ctx_truncated")
    ).count()
    assert bad == 0


# ----------------------------------------------------------- fingerprints


def _seq_df(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_fingerprint_order_sensitive(spark):
    a = _seq_df(spark, [("a", 0, "x"), ("a", 1, "y")])
    b = _seq_df(spark, [("b", 0, "y"), ("b", 1, "x")])
    fa = sequence_fingerprint(a).collect()[0]["conv_fp"]
    fb = sequence_fingerprint(b).collect()[0]["conv_fp"]
    assert fa != fb


def test_fingerprint_no_position_aliasing(spark):
    """Separator byte: ("x1", idx 1) must differ from ("x", idx 11)."""
    a = _seq_df(spark, [("a", 1, "x1")])
    b = _seq_df(spark, [("b", 11, "x")])
    fa = sequence_fingerprint(a).collect()[0]["conv_fp"]
    fb = sequence_fingerprint(b).collect()[0]["conv_fp"]
    assert fa != fb


def test_dedup_conversations_finds_exact_dups(spark):
    rows = []
    for conv in ("c0", "c1", "c2"):
        rows += [(conv, i, f"turn{i}") for i in range(6)]  # c0=c1=c2 dups
    rows += [("d0", i, f"turn{i}") for i in range(5)]  # shares 4-turn prefix
    rows += [("e0", i, f"other{i}") for i in range(6)]  # unrelated
    r = dedup_conversations(_seq_df(spark, rows), prefix_len=4).toPandas()
    r = r.set_index("conv_id")
    assert set(r.index) == {"c0", "c1", "c2", "d0", "e0"}
    assert r.loc["c0", "n_same_conv"] == 3
    assert bool(r.loc["c0", "is_canonical"])
    assert not bool(r.loc["c1", "is_canonical"])
    assert not bool(r.loc["c2", "is_canonical"])
    # prefix family: c0/c1/c2/d0 share the first 4 turns
    assert r.loc["d0", "n_same_prefix"] == 4
    assert r.loc["d0", "n_same_conv"] == 1
    assert bool(r.loc["d0", "is_canonical"])
    assert r.loc["e0", "n_same_prefix"] == 1


def test_fingerprint_groupby_equals_any_partitioning(spark, turns):
    """Commutative-sum fingerprint is partitioning-independent: same
    result at 1 partition and at 16."""
    base = turns.select("conv_id", "turn_idx", "text")
    f1 = sequence_fingerprint(base.repartition(1)).toPandas()
    f16 = sequence_fingerprint(base.repartition(16)).toPandas()
    m = f1.merge(f16, on="conv_id", suffixes=("_1", "_16"))
    assert (m["conv_fp_1"] == m["conv_fp_16"]).all()


# ------------------------------------------------------------ transitions


def test_transition_counts(spark):
    rows = [
        ("a", 0, "user"), ("a", 1, "assistant"), ("a", 2, "user"),
        ("b", 0, "user"), ("b", 1, "assistant"), ("b", 2, "assistant"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    r = transition_counts(df).toPandas().set_index(["prev_state", "state"])
    assert r.loc[("user", "assistant"), "n"] == 2
    assert r.loc[("assistant", "user"), "n"] == 1
    assert r.loc[("assistant", "assistant"), "n"] == 1
    assert r.loc[("assistant", "user"), "share"] == 0.5
    # shares are conditional probabilities: sum to 1 per prev_state
    sums = r.groupby("prev_state")["share"].sum()
    assert (abs(sums - 1.0) < 1e-9).all()
    # first turns excluded: total transitions = rows - conversations
    assert r["n"].sum() == len(rows) - 2


# ------------------------------------------------------------------ loops


def test_degenerate_runs(spark):
    rows = (
        [("a", i, "assistant") for i in range(4)]  # run of 4
        + [("a", 4, "user"), ("a", 5, "assistant"), ("a", 6, "assistant")]
        + [("b", 0, "user"), ("b", 1, "assistant"), ("b", 2, "user")]
    )
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    r = degenerate_runs(df, min_run=3).toPandas().set_index("conv_id")
    assert r.loc["a", "max_run"] == 4
    assert r.loc["a", "n_degenerate"] == 1
    assert r.loc["a", "worst_state"] == "assistant"
    assert r.loc["b", "max_run"] == 1
    assert r.loc["b", "n_degenerate"] == 0


# --------------------------------------------------------------- chunking


def test_chunk_documents_reconstructs(spark):
    texts = [
        (0, ""),  # no chunks
        (1, "a" * 50),  # single short chunk
        (2, "".join(chr(97 + i % 26) for i in range(120))),  # exactly size
        (3, "".join(chr(97 + i % 26) for i in range(121))),  # size + 1
        (4, "".join(chr(97 + i % 26) for i in range(500))),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    r = chunk_documents(df, size=120, stride=90)
    pdf = r.toPandas().sort_values(["doc_id", "chunk_idx"])
    by_doc = dict(texts)
    assert 0 not in set(pdf["doc_id"])  # empty doc → no rows
    for doc_id, g in pdf.groupby("doc_id"):
        text = by_doc[doc_id]
        n = len(text)
        expected_chunks = 1 + max(0, -(-(n - 120) // 90)) if n else 0
        assert len(g) == expected_chunks
        # stitch: chunk k covers [90k, 90k+len); strides tile every char
        covered = set()
        for _, row in g.iterrows():
            s = int(row["chunk_start"])
            covered |= set(range(s, s + int(row["chunk_len"])))
        assert covered == set(range(n))
        # last chunk actually reaches the end
        last = g.iloc[-1]
        assert int(last["chunk_start"]) + int(last["chunk_len"]) == n


def test_chunk_documents_map_only(spark):
    """The chunking plan contains no shuffle — it must stay map-only."""
    df = spark.createDataFrame([(1, "x" * 300)], "doc_id long, text string")
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_rejects_bad_stride(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


# ---------------------------------------------------------------------------
# ordered-step funnel
# ---------------------------------------------------------------------------


def test_funnel_greedy_ordered_match(spark):
    from acoustic_feature_extractor_spark.operators.context import funnel_steps

    rows = [
        # c1 completes a->b->c in order
        ("c1", 0, "a"), ("c1", 1, "x"), ("c1", 2, "b"), ("c1", 3, "c"),
        # c2 has b before a: only 'a' then stalls (no later b)
        ("c2", 0, "b"), ("c2", 1, "a"), ("c2", 2, "x"),
        # c3 never starts
        ("c3", 0, "x"),
        # c4: a, then c (skipping b) — stuck after step 1
        ("c4", 0, "a"), ("c4", 1, "c"),
        # c5: duplicate steps; greedy takes earliest a (0), earliest later b (2)
        ("c5", 0, "a"), ("c5", 1, "a"), ("c5", 2, "b"), ("c5", 3, "b"), ("c5", 4, "c"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string")
    out = {
        r["conv_id"]: (r["steps_completed"], r["step_orders"])
        for r in funnel_steps(df, ["a", "b", "c"]).collect()
    }
    assert out["c1"] == (3, [0, 2, 3])
    assert out["c2"] == (1, [1])
    assert "c3" not in out  # no funnel event at all -> no row
    assert out["c4"] == (1, [0])
    assert out["c5"] == (3, [0, 2, 4])


def test_funnel_requires_steps(spark):
    import pytest as _pytest

    from acoustic_feature_extractor_spark.operators.context import funnel_steps

    df = spark.createDataFrame([("c", 0, "a")], "conv_id string, turn_idx int, tool string")
    with _pytest.raises(ValueError):
        funnel_steps(df, [])
