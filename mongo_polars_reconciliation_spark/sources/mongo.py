"""MongoDB source/sink via the Spark MongoDB connector (SURVEY.md §2.1
S1/S2/S5/S7/S8).

The reference reads ``card_transaction`` through pymongoarrow with a
server-side ``$match → $project`` pipeline (src/data_extractor.py:26-50) and
writes back with ``$merge`` (second_conciliate.py:420-447). On Spark the same
shapes come from the official connector (``spark.read.format("mongodb")``):
its DataSource V2 implementation pushes filters and column pruning into an
aggregation pipeline server-side, so ``.where()`` + ``.select()`` next to the
read ARE the ``$match``/``$project`` — same plan, declared declaratively.

This container has no MongoDB and no connector jar, so everything here is
import-gated: constructing a reader raises a clear error unless the
connector is on the classpath. The rest of the engine never imports this
module — parquet/CSV sources serve the testbed — but a user of the
reference points ``mongo_scan``/``mongo_upsert`` at their URI and keeps the
operator pipeline unchanged.

Connector availability is probed lazily (``_require_connector``): we check
for the provider class rather than importing anything Python-side, because
the connector is a JVM artifact (``org.mongodb.spark:mongo-spark-connector``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mongo_polars_reconciliation_spark.config import SourceFilter
from mongo_polars_reconciliation_spark.sources.scan import apply_source_filter

_PROVIDER = "com.mongodb.spark.sql.connector.MongoTableProvider"


def connector_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(_PROVIDER)  # noqa: SLF001
        return True
    except Exception:
        return False


def _require_connector(spark: SparkSession) -> None:
    if not connector_available(spark):
        raise RuntimeError(
            "MongoDB Spark connector not on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector via spark.jars.packages "
            "or use the parquet/CSV sources for local runs"
        )


def reader_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """Connector reader options, factored out so tests can pin the option
    assembly without a cluster (the connector jar is absent here)."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }


def writer_options(
    uri: str, database: str, collection: str, id_field: str = "_id"
) -> dict[str, str]:
    """Connector writer options for the replace-with-upsert (`$merge`-
    equivalent) write path; factored out for cluster-free tests."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
        "idFieldList": id_field,
        "operationType": "update",
        "upsertDocument": "true",
    }


def mongo_scan(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    flt: SourceFilter | None = None,
    fields: list[str] | None = None,
) -> DataFrame:
    """Filtered, projected collection scan — the reference's
    ``$match → $project`` pipeline (src/data_extractor.py:30-48), expressed
    as where+select so the connector pushes both server-side."""
    _require_connector(spark)
    df = (
        spark.read.format("mongodb")
        .options(**reader_options(uri, database, collection))
        .load()
    )
    if flt is not None:
        df = apply_source_filter(df, flt)
    return df.select(*fields) if fields else df


def mongo_upsert(
    df: DataFrame,
    uri: str,
    database: str,
    collection: str,
    id_field: str = "_id",
) -> None:
    """Idempotent upsert — the reference's per-interval ``$merge(on=_id,
    whenMatched="merge")`` thread pool (second_conciliate.py:409-447). The
    connector's replace-with-upsert write does the same document-level merge,
    and Spark's task parallelism replaces the manual intervals (pre-shape
    with ``repartitionByRange`` on a time column if interval-aligned output
    files matter)."""
    _require_connector(df.sparkSession)
    (
        df.write.format("mongodb")
        .mode("append")
        .options(**writer_options(uri, database, collection, id_field))
        .save()
    )
