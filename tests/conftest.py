from __future__ import annotations

import os

import pytest

from acoustic_feature_extractor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # AFE_TEST_SHUFFLE_PARTITIONS: robustness sweeps run the suite at
    # odd partition counts to flush partition-layout assumptions
    s = get_spark(
        app_name="afe_spark_tests",
        cores=8,
        shuffle_partitions=int(os.environ.get("AFE_TEST_SHUFFLE_PARTITIONS", "8")),
    )
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    from acoustic_feature_extractor_spark.datagen import generate_transcripts

    return generate_transcripts(spark, n_convs=60, mega_every=25, mega_turns=300).cache()


@pytest.fixture(scope="session")
def turn_features_df(spark):
    from acoustic_feature_extractor_spark.datagen import generate_turn_features

    return generate_turn_features(spark, n_convs=40).cache()
