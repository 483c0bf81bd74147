from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from supersonic_spark.session import get_spark

    s = get_spark("supersonic_spark_tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from supersonic_spark.session import load_tables

    return load_tables(spark, sf_dir)


def rows(df, *cols):
    """Collect to a sorted list of tuples for golden comparison
    (None-safe sort: NULLs last per column)."""
    if cols:
        df = df.select(*cols)
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )
