"""State-table semantics (SURVEY.md §2.1 S2/S8/S9).

The reference keeps a ``reconciliation_transactions`` state collection:
- seeded with PENDING rows via ``$merge(on=_id, whenMatched="keepExisting")``
  (first_populate_table.py:24-57);
- updated idempotently via time-partitioned ``$merge(on=_id,
  whenMatched="merge")`` batches run on a thread pool
  (second_conciliate.py:409-447);
- read back filtered to REMANENT and ``$lookup``-joined to the transaction
  table (src/data_extractor.py:52-83).

Here the state table is any DataFrame-backed table (parquet in tests; Delta /
Iceberg ``MERGE INTO`` or a connector's upsert mode in production — the manual
thread-pool partitioning disappears because Spark writes are already
task-parallel; use ``repartitionByRange`` on the time column if partition
alignment matters). Merge semantics are expressed as pure DataFrame ops so
they run (and are oracle-checkable) without a transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.functions.windows import keep_first

# JVM classes that mark a transactional table format on the classpath.
# Probed like sources/mongo.py probes the connector: by Class.forName, not
# a Python import, because both are JVM artifacts.
_TRANSACTIONAL_MARKERS = (
    ("delta", "org.apache.spark.sql.delta.catalog.DeltaCatalog"),
    ("iceberg", "org.apache.iceberg.spark.SparkCatalog"),
)


def transactional_format_available(spark: SparkSession) -> str | None:
    """Return ``"delta"`` / ``"iceberg"`` when a transactional format is on
    the classpath, else None."""
    for name, cls in _TRANSACTIONAL_MARKERS:
        try:
            spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
            return name
        except Exception:
            continue
    return None


def merge_into_sql(table: str, source_view: str, on: str) -> str:
    """The ``MERGE INTO`` statement equivalent to ``$merge(on=_id,
    whenMatched='merge', whenNotMatched='insert')`` — factored out so tests
    can pin the statement without Delta/Iceberg on the classpath."""
    return (
        f"MERGE INTO {table} t USING {source_view} s ON t.{on} = s.{on} "
        f"WHEN MATCHED THEN UPDATE SET * "
        f"WHEN NOT MATCHED THEN INSERT *"
    )


def upsert_state_table(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    on: str = "_id",
    allow_full_rewrite: bool = False,
) -> None:
    """Idempotent in-place upsert of a named state table.

    With Delta/Iceberg on the classpath this is a transactional ``MERGE
    INTO`` — files containing matched keys are rewritten, everything else
    untouched, which is the only shape that survives a 100 TB state table.
    Without one (this container), falls back to the DataFrame
    read-merge-rewrite: same visible semantics (``merge_upsert``) but FULL
    rewrite cost — so the fallback must be opted into explicitly with
    ``allow_full_rewrite=True``; a cluster misconfiguration (transactional
    jar missing) then fails loudly instead of silently rewriting 100 TB.
    The fallback eagerly localCheckpoints the merged frame so the rewrite
    doesn't read from the table it is replacing, and swaps via
    rename-aside (tmp → live, old aside, drop old): at no point is the
    only copy of the state gone — a crash mid-swap leaves intact data
    under ``{table}`` / ``{table}__merge_old`` / ``{table}__merge_tmp``."""
    if transactional_format_available(spark):
        view = f"__merge_src_{abs(hash(table)) % 10**8}"
        source.createOrReplaceTempView(view)
        spark.sql(merge_into_sql(table, view, on))
        return
    if not allow_full_rewrite:
        raise ValueError(
            "upsert_state_table: no transactional table format (Delta/"
            "Iceberg) on the classpath; the fallback is a FULL table "
            "rewrite. Pass allow_full_rewrite=True to accept that cost "
            "(test-scale only)."
        )
    tmp, old = f"{table}__merge_tmp", f"{table}__merge_old"
    merged = merge_upsert(spark.table(table), source, on).localCheckpoint(
        eager=True
    )
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    spark.sql(f"DROP TABLE IF EXISTS {old}")
    merged.write.mode("overwrite").format("parquet").saveAsTable(tmp)
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
    spark.sql(f"DROP TABLE {old}")


def merge_keep_existing(target: DataFrame, source: DataFrame, on: str) -> DataFrame:
    """``whenMatched="keepExisting", whenNotMatched="insert"`` — insert-only
    merge (first_populate_table.py:48-55): rows of ``source`` whose key is
    absent from ``target`` are appended; existing target rows win."""
    new_rows = source.join(target.select(on), on=on, how="left_anti")
    return target.unionByName(new_rows, allowMissingColumns=True)


def merge_upsert(target: DataFrame, source: DataFrame, on: str) -> DataFrame:
    """``whenMatched="merge", whenNotMatched="insert"`` upsert
    (second_conciliate.py:431-439). Source wins on key collision. Column-level
    "merge" (field union) degenerates to row replacement here because both
    sides share one schema."""
    kept = target.join(source.select(on), on=on, how="left_anti")
    return kept.unionByName(source, allowMissingColumns=True)


def write_bucketed_state(
    df: DataFrame,
    table: str,
    buckets: int = 64,
    key: str = "_id",
) -> None:
    """Persist the state table bucketed (and sorted) by the lookup key.

    At 100 TB the remanent lookup (S2) and every ``$merge``-style upsert
    (S8/S9) join the state table on ``_id``; storing it hash-bucketed by that
    key means those joins read pre-partitioned data — the stored side needs
    NO shuffle (no Exchange in the plan), only the incoming batch is
    exchanged to the bucket count. ``sortBy`` additionally lets sort-merge
    join skip its sort on the stored side."""
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def remanent_lookup(
    state: DataFrame,
    transactions: DataFrame,
    id_col: str = "_id",
    status_col: str = "conciliation_status",
    remanent_value: str = "REMANENT",
    select_cols: list[str] | None = None,
) -> DataFrame:
    """REMANENT state rows re-joined to the transaction table — the
    ``$match → $lookup → $unwind → $project`` pipeline of
    src/data_extractor.py:56-81. ``$unwind`` with no ``preserveNullAndEmpty``
    drops rows with no lookup hit, so the equivalent is an *inner* equi-join
    (``_id`` is unique on both sides ⇒ no explode needed)."""
    rem = state.where(F.col(status_col) == remanent_value).select(id_col)
    out = transactions.join(rem, on=id_col, how="inner")
    return out.select(select_cols) if select_cols else out


def union_window_and_remanent(
    window_df: DataFrame, remanent_df: DataFrame, id_col: str = "_id"
) -> DataFrame:
    """Window scan ∪ remanent rows, deduped keep-first with window rows
    preferred (src/data_extractor.py:85-93 ``concat + unique(keep="first",
    maintain_order=True)`` — window rows come first in the concat). The
    reference dedups on *all* columns; the intended identity is ``_id``
    (SURVEY.md §2.5 U3), which is what we key on, with an explicit
    source-rank order replacing "maintain_order"."""
    tagged = window_df.withColumn("__src_rank", F.lit(0)).unionByName(
        remanent_df.withColumn("__src_rank", F.lit(1)), allowMissingColumns=True
    )
    return keep_first(tagged, [id_col], ["__src_rank"]).drop("__src_rank")
