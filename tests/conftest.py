from __future__ import annotations

import pytest

from haplorec_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="haplorec_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.driver.memory": "4g"},
    )
    yield s


def rows(df, *cols):
    """Collect as sorted list of tuples for order-insensitive comparison."""
    if cols:
        df = df.select(*cols)
    return sorted(
        tuple(r) for r in df.collect()
    )
