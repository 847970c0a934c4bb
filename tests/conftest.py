import os

import pytest

from mongo_polars_reconciliation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # SPARK_GRAFT_TEST_SHUFFLE lets CI re-run the whole suite under a
    # different partition count — any query whose result moves with the
    # cluster shape fails the oracle comparison
    parts = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "4"))
    s = get_spark("tests", cpus=4, shuffle_partitions=parts)
    yield s
    s.stop()


def rows(df, *cols):
    """Sorted list-of-tuples for order-insensitive comparison."""
    sel = df.select(*cols) if cols else df
    return sorted(tuple(r) for r in sel.collect())
