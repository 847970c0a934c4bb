import pytest

from mongo_polars_reconciliation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()


def rows(df, *cols):
    """Sorted list-of-tuples for order-insensitive comparison."""
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())
