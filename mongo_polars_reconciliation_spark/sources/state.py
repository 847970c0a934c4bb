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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.functions.windows import keep_first


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
