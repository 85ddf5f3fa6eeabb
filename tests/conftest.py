"""Shared SparkSession for the test suite.

One session per pytest run (JVM spin-up is ~10 s); small local
parallelism + few shuffle partitions keep tiny-data tests fast while
still exercising multi-partition shuffles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = (
        SparkSession.builder.master("local[4]")
        .appName("strava_etl_public_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def to_sdf(spark: SparkSession, pdf):
    """createDataFrame with NaN converted to real SQL NULL — pandas has
    no float null, but the engine's semantics are NULL-based."""
    import pandas as pd

    return spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
