"""Training-data export ops: hash_split / balanced_sample / shard_shuffle.

All three must be deterministic, key-consistent, and partition-layout
invariant — the properties that keep a train/test boundary stable across
re-runs and engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.operators.sample import (
    balanced_sample,
    hash_split,
    shard_shuffle,
)


def _docs(spark, n=400, langs=("en", "de", "fr", "ja")):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(*[F.lit(l) for l in langs]),
            (F.pmod(F.col("id"), F.lit(len(langs))) + 1).cast("int"),
        ).alias("lang"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


# --------------------------------------------------------------------- split

def test_hash_split_group_consistent(spark):
    ev = spark.range(1000).select(
        F.col("id").alias("event_id"), F.pmod(F.col("id"), F.lit(50)).alias("user_id")
    )
    s = hash_split(ev, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    per_user = s.groupBy("user_id").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r.k == 1 for r in per_user)
    assert set(r.split for r in s.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }


def test_hash_split_fractions_roughly_hold(spark):
    ev = spark.range(5000).select(F.col("id").alias("k"))
    s = hash_split(ev, "k", {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r.split: r["count"] for r in s.groupBy("split").count().collect()}
    assert 0.85 < counts["train"] / 5000 < 0.95
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_hash_split_seed_moves_keys_deterministically(spark):
    ev = spark.range(300).select(F.col("id").alias("k"))
    a1 = {r.k: r.split for r in hash_split(ev, "k", {"a": 0.5, "b": 0.5}, seed=1).collect()}
    a1b = {r.k: r.split for r in hash_split(ev, "k", {"a": 0.5, "b": 0.5}, seed=1).collect()}
    a2 = {r.k: r.split for r in hash_split(ev, "k", {"a": 0.5, "b": 0.5}, seed=2).collect()}
    assert a1 == a1b
    assert a1 != a2  # a different seed is a different (still valid) split


# ------------------------------------------------------------------ balance

def test_balanced_sample_caps_each_group(spark):
    d = _docs(spark)
    out = balanced_sample(d, "lang", cap=30, id_col="doc_id")
    counts = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    assert all(c == 30 for c in counts.values())  # every lang has 100 > 30 docs


def test_balanced_sample_small_groups_pass_through(spark):
    d = _docs(spark, n=40)  # 10 docs per lang < cap
    out = balanced_sample(d, "lang", cap=30, id_col="doc_id")
    assert out.count() == 40


def test_balanced_sample_partition_invariant(spark):
    d = _docs(spark)
    a = {r.doc_id for r in balanced_sample(d, "lang", 25, "doc_id").collect()}
    b = {
        r.doc_id
        for r in balanced_sample(d.repartition(17), "lang", 25, "doc_id").collect()
    }
    c = {
        r.doc_id
        for r in balanced_sample(d.coalesce(1), "lang", 25, "doc_id").collect()
    }
    # the two-phase local-top-cap prefilter must not change the selection
    assert a == b == c


# -------------------------------------------------------------------- shard

def test_shard_shuffle_contract(spark):
    d = _docs(spark, n=500)
    out = shard_shuffle(d, "doc_id", n_shards=8)
    assert out.count() == 500
    # shards partition the corpus; positions are 0..n_s-1 dense per shard
    per = out.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi")
    ).collect()
    assert sum(r.n for r in per) == 500
    assert all(r.lo == 0 and r.hi == r.n - 1 for r in per)


def test_shard_shuffle_deterministic_and_partition_invariant(spark):
    d = _docs(spark, n=300)
    a = {(r.doc_id, r.shard, r.pos) for r in shard_shuffle(d, "doc_id", 4).collect()}
    b = {
        (r.doc_id, r.shard, r.pos)
        for r in shard_shuffle(d.repartition(11), "doc_id", 4).collect()
    }
    assert a == b


def test_shard_shuffle_actually_shuffles(spark):
    # the within-shard order must not be the input id order
    d = _docs(spark, n=200)
    out = shard_shuffle(d, "doc_id", n_shards=1)
    ids = [r.doc_id for r in out.orderBy("pos").collect()]
    assert ids != sorted(ids)
    assert sorted(ids) == list(range(200))


def test_mixture_sample_t1_is_identity(spark):
    """T=1 with default target: every rate is exactly 1.0 -> each row
    kept exactly once (floor(1)=1, frac=0)."""
    from acoustic_feature_extractor_spark.operators.sample import mixture_sample

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
    )
    out = mixture_sample(df, "src", "doc_id", temperature=1.0)
    rows = out.groupBy().agg(F.count("*"), F.max("copy"), F.min("copy")).first()
    assert tuple(rows) == (300, 1, 1)


def test_mixture_sample_flattens_and_is_deterministic(spark):
    """T=0.3 on a skewed corpus: the small group upsamples (copies > 1),
    the big group downsamples, totals stay near target, and the exact
    output is reproducible (hash-seeded, no rand())."""
    from acoustic_feature_extractor_spark.operators.sample import (
        mixture_rates,
        mixture_sample,
    )

    big, small = 2000, 50
    df = spark.range(big + small).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < big, "en").otherwise("yo").alias("src"),
    )
    rates = {r["src"]: r["rate"] for r in mixture_rates(df, "src", 0.3).collect()}
    assert rates["yo"] > 1.0 > rates["en"]

    out = mixture_sample(df, "src", "doc_id", temperature=0.3, seed=7)
    per = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    # expectation per group = rate * n; hash sampling is close at n>=50
    import math
    assert math.isclose(per["en"], rates["en"] * big, rel_tol=0.05)
    assert math.isclose(per["yo"], rates["yo"] * small, rel_tol=0.25)
    assert out.agg(F.max("copy")).first()[0] >= 2  # real upsampling
    # determinism: exact same multiset on a re-run
    again = mixture_sample(df, "src", "doc_id", temperature=0.3, seed=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


# ---------------------------------------------------------------------------
# Efraimidis-Spirakis weighted sampling without replacement
# ---------------------------------------------------------------------------


def _py_phash(s: str) -> int:
    h1 = h2 = 0
    for ch in s:
        h1 = (h1 * 31 + ord(ch)) % 2147483647
        h2 = (h2 * 131 + ord(ch)) % 2147483629
    return (h1 << 31) + h2


def _py_pmix(h: int) -> int:
    P = 2305843009213693951
    mask = (1 << 31) - 1
    h1, h2 = h >> 31, h & mask
    r1 = (h1 * 2654435761 + h2) % P
    a, b = r1 >> 31, r1 & mask
    return (a * 2246822519 + b * 2654435761) % P


def _py_es_key(key: str, seed: int, w: float) -> float:
    import math

    P = 2305843009213693951
    u = (_py_pmix(_py_phash(f"{key}:{seed}")) + 1) / P
    return math.log(u) / w


def test_weighted_sample_matches_formula_and_k(spark):
    from acoustic_feature_extractor_spark.operators.sample import weighted_sample

    rows = [(f"g{i % 3}", f"id{i:03d}", float(1 + (i % 7))) for i in range(90)]
    df = spark.createDataFrame(rows, "g string, id string, w double")
    out = weighted_sample(df, k=5, weight_col="w", key_col="id", group_cols=["g"])
    got = {}
    for r in out.collect():
        got.setdefault(r["g"], []).append((r["rank"], r["id"]))
    # exact replication of the portable formula in python
    for g in ("g0", "g1", "g2"):
        keyed = sorted(
            (
                (-_py_es_key(f"id{i:03d}", 0, float(1 + (i % 7))), f"id{i:03d}")
                for i in range(90)
                if f"g{i % 3}" == g
            )
        )[:5]
        expect = [(rk + 1, kid) for rk, (_, kid) in enumerate(keyed)]
        assert sorted(got[g]) == expect
    # repartitioning must not change the sample (mergeable top-k)
    out2 = weighted_sample(
        df.repartition(13), k=5, weight_col="w", key_col="id", group_cols=["g"]
    )
    assert {(r["g"], r["rank"], r["id"]) for r in out2.collect()} == {
        (g, rk, kid) for g, lst in got.items() for rk, kid in lst
    }


def test_weighted_sample_bias_direction(spark):
    # pure-python frequency check of the SAME formula across 400 seeds:
    # weight-10 item must be drawn (k=1 of 20) far more often than weight-1
    heavy_hits = light_hits = 0
    for seed in range(400):
        keys = [(_py_es_key(f"it{j}", seed, 10.0 if j == 0 else 1.0), j) for j in range(20)]
        best = max(keys)[1]
        if best == 0:
            heavy_hits += 1
        elif best == 1:
            light_hits += 1
    # expectation: heavy ~ 10/29 = 0.345, each light ~ 1/29 = 0.034
    assert heavy_hits > 90
    assert light_hits < 35


def test_weighted_sample_rejects_bad_weight(spark):
    import pytest as _pytest

    from acoustic_feature_extractor_spark.operators.sample import weighted_sample

    df = spark.createDataFrame([("a", 0.0)], "id string, w double")
    with _pytest.raises(Exception, match="non-positive weight"):
        weighted_sample(df, k=1, weight_col="w", key_col="id").collect()
    with _pytest.raises(ValueError):
        weighted_sample(df, k=0, weight_col="w", key_col="id")


# ---------------------------------------------------------------------------
# negative_sample
# ---------------------------------------------------------------------------


def test_negative_sample_contract(spark):
    """Each anchor gets exactly k negatives minus self-hits; negatives
    come from the pool; the whole thing is a pure function of
    (ids, k, seed)."""
    from acoustic_feature_extractor_spark.operators.sample import negative_sample

    pool = spark.range(0, 97).withColumnRenamed("id", "doc_id")
    anchors = spark.range(0, 97, 5).withColumnRenamed("id", "doc_id")
    out = negative_sample(anchors, pool, k=4, anchor_col="doc_id",
                          pool_col="doc_id", seed=7).toPandas()
    per = out.groupby("doc_id_anchor").size()
    n_anchors = anchors.count()
    assert set(per.index) <= set(range(0, 97, 5))
    # picks for different ranks are INDEPENDENT hashes mod N, so in
    # principle several of one anchor's picks can self-hit and be
    # dropped; these bounds are deterministic facts of the fixed
    # (pool=97, seed=7, k=4) constants — recompute them if those change
    assert (per <= 4).all() and (per >= 3).all()
    assert out["doc_id_negative"].isin(range(97)).all()
    assert (out["doc_id_anchor"] != out["doc_id_negative"]).all()
    assert len(per) == n_anchors  # deterministic for these constants


def test_negative_sample_partition_invariant_and_deterministic(spark):
    from acoustic_feature_extractor_spark.operators.sample import negative_sample

    pool = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    anchors = spark.range(0, 40).withColumnRenamed("id", "doc_id")

    def run(p, a):
        return (
            negative_sample(a, p, k=3, anchor_col="doc_id", pool_col="doc_id")
            .orderBy("doc_id_anchor", "neg_rank")
            .toPandas()
        )

    import pandas as pd

    base = run(pool, anchors)
    again = run(pool.repartition(13), anchors.repartition(3))
    pd.testing.assert_frame_equal(base.reset_index(drop=True),
                                  again.reset_index(drop=True))


def test_negative_sample_k_guard(spark):
    import pytest as _pytest

    from acoustic_feature_extractor_spark.operators.sample import negative_sample

    pool = spark.range(5).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError, match="k must be"):
        negative_sample(pool, pool, k=0, anchor_col="doc_id", pool_col="doc_id")
