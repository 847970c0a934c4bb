"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reconciliation cascade at sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongo_polars_reconciliation_spark.harness.oracles import ORACLES  # noqa: E402
from mongo_polars_reconciliation_spark.harness.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full reconciliation cascade
    (zero-effect → exact match → tolerance re-match) money summary."""
    sf_dir = "/root/testdata/sf0.001"
    # Loud-drift tripwire on the driver's own flagship call, not just bench
    # and tests: a testdata schema change fails here with every drifted
    # column named, instead of as an opaque AnalysisException mid-query.
    from mongo_polars_reconciliation_spark.harness.schema_guard import (
        assert_testdata_schema,
    )

    assert_testdata_schema(sf_dir)
    return QUERIES["recon_cascade_summary"](spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in ORACLES.items() if k in QUERIES}
