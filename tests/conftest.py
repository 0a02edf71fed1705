"""Shared pytest fixtures: one local SparkSession, one generated corpus."""

from __future__ import annotations

import pytest

from cpdd_spark.fixtures import FixtureParams, generate
from cpdd_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="cpdd_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def smoke_fixture():
    """100-conversation smoke corpus (FIXTURES.md tier `smoke`)."""
    return generate(FixtureParams(num_convs=100, seed=42))


@pytest.fixture(scope="session")
def turns_df(spark, smoke_fixture):
    return spark.createDataFrame(smoke_fixture.transcripts)


@pytest.fixture(scope="session")
def truth_pdf(smoke_fixture):
    return smoke_fixture.truth
