from __future__ import annotations

import pytest

from simkit_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("simkit_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny5(spark):
    """The reference's golden 5-point dataset
    (/root/reference/src/data/test.csv; FIXTURES.md F1)."""
    rows = [
        (0, [1.0, 7.0]),
        (1, [1.0, 6.0]),
        (2, [6.0, 2.0]),
        (3, [8.0, 1.0]),
        (4, [10.0, 2.0]),
    ]
    return spark.createDataFrame(rows, "id long, vec array<double>")
