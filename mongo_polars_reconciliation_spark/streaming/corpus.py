"""Streaming corpus ingestion: exact dedup as a native streaming aggregation.

The batch face of exact dedup (extensions/dedup.py:exact_dedup_groups) is one
hash-groupBy on a text digest. Documents arriving as a stream (a crawler, a
drop-folder of dumps) need the SAME contract — one row per distinct text with
the deterministic keeper — maintained incrementally across micro-batches.
Because min and count are commutative streaming aggregates, Structured
Streaming's aggregation state store computes exactly the batch answer
whatever the arrival order: the drained result is bit-identical to
``dedup_exact`` and shares its oracle.

Scale posture: aggregation state is one row per distinct text hash (the
deduped corpus size, not the arrival count), partitioned by the hash — the
same key the batch groupBy shuffles on. Complete-mode emission to the memory
sink is the bounded-drain test harness; a production sink would run update
mode into an upsert store (sources/state.py:upsert_state_table).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_documents_stream(
    spark: SparkSession,
    docs: DataFrame,
    name: str = "docs",
    n_files: int = 2,
    id_col: str = "doc_id",
    split_expr=None,
) -> DataFrame:
    """File-source stream over a documents frame, delivered as ``n_files``
    micro-batches (maxFilesPerTrigger=1) — the arriving-dumps shape.
    ``split_expr`` (a Column in 0..n_files-1; default id modulus) decides
    which batch a row rides in — callers exercising cross-batch state
    should split so duplicates of one text land in DIFFERENT batches.
    The feed dir is query-private under /root/repo/.stream_tmp."""
    if split_expr is None:
        split_expr = F.pmod(F.col(id_col), F.lit(n_files))
    feed = f"/root/repo/.stream_tmp/corpus/{name}/feed"
    shutil.rmtree(feed, ignore_errors=True)
    os.makedirs(feed)
    for i in range(n_files):
        docs.where(split_expr == i).write.mode("overwrite").parquet(
            f"{feed}/part{i}"
        )
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{feed}/part*")
    )


def dedup_state(
    stream: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Streaming exact-dedup aggregation: (text_hash, keeper_id, n_copies),
    keeper = MIN id — commutative aggregates, so the drained state equals
    the batch ``exact_dedup_groups`` regardless of micro-batch order."""
    return (
        stream.select(
            F.md5(F.col(text_col).cast("binary")).alias("text_hash"),
            F.col(id_col),
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
