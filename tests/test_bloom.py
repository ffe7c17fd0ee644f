"""Bloom-filter join pruning: the semi-join result must be EXACTLY the
plain semi join under every bitmap geometry (false positives are scrubbed
by the exact join; false negatives are impossible because probe and build
hash the same expressions), while the prefilter provably shrinks the
fact side that reaches the shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acoustic_feature_extractor_spark.plans.bloom import (
    bloom_prefilter,
    bloom_semi_join,
    key_bitmap_words,
)


@pytest.fixture(scope="module")
def fact(spark):
    return spark.range(60_000).selectExpr(
        "id",
        "concat('k', id % 3000) AS key",
        "id % 7 AS part",
        "CAST(id AS DOUBLE) * 0.5 AS v",
    ).cache()


@pytest.fixture(scope="module")
def keys(spark):
    # every 11th key: ~270 of 3000 distinct keys, ~9% fact selectivity
    return spark.range(280).selectExpr("concat('k', id * 11) AS key").cache()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_semi_join_exact_string_key(spark, fact, keys):
    exact = fact.join(keys, "key", "semi")
    got = bloom_semi_join(fact, keys, "key")
    assert _rows(got) == _rows(exact)


def test_prefilter_is_superset_and_prunes(spark, fact, keys):
    n_fact = fact.count()
    n_exact = fact.join(keys, "key", "semi").count()
    n_pre = bloom_prefilter(fact, keys, "key").count()
    # superset of the matches, strict subset of the fact side
    assert n_exact <= n_pre < n_fact
    # default geometry on a few hundred keys: FP rate ~0, prefilter ≈ matches
    assert n_pre <= n_exact * 1.05


def test_tiny_bitmap_forced_false_positives_still_exact(spark, fact, keys):
    exact = _rows(fact.join(keys, "key", "semi"))
    n_exact = len(exact)
    pre = bloom_prefilter(fact, keys, "key", n_bits=256, k=2).count()
    assert pre > n_exact  # the point of the fixture: FPs actually occur
    got = bloom_semi_join(fact, keys, "key", n_bits=256, k=2)
    assert _rows(got) == exact


def test_composite_key_with_dtype_mismatch(spark, fact, keys):
    # key side carries int where fact has bigint: xxhash64 is type-
    # sensitive, the operator must align types before building the bitmap
    keys2 = keys.withColumn("part", F.lit(3).cast("int"))
    exact = fact.join(keys2, ["key", "part"], "semi")
    got = bloom_semi_join(fact, keys2, ["key", "part"])
    assert exact.count() > 0
    assert _rows(got) == _rows(exact)


def test_long_key(spark, fact):
    keys = spark.range(100).selectExpr("id * 531 AS id")
    exact = fact.join(keys, "id", "semi")
    got = bloom_semi_join(fact, keys, "id")
    assert _rows(got) == _rows(exact)


def test_empty_key_set(spark, fact):
    keys = spark.range(0).selectExpr("concat('k', id) AS key")
    assert bloom_semi_join(fact, keys, "key").count() == 0
    assert bloom_prefilter(fact, keys, "key").count() == 0


def test_bitmap_words_bounded(spark, keys):
    words = key_bitmap_words(keys, "key", n_bits=1024, k=3)
    assert len(words) == 16  # n_bits/64, independent of key count
    assert any(w != 0 for w in words)


def test_n_bits_validation(spark, keys):
    with pytest.raises(ValueError, match="multiple of 64"):
        key_bitmap_words(keys, "key", n_bits=100)


def test_k_validation(spark, fact, keys):
    with pytest.raises(ValueError, match="probe hash"):
        bloom_prefilter(fact, keys, "key", k=0)
