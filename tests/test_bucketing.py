"""Bucketed state-table joins: the stored side of the remanent lookup /
upsert must join with NO shuffle (SURVEY.md §4 — co-located joins via
bucketing). The bucket layout replaces the exchange that a plain parquet
state table would need on every incremental run."""

import shutil

from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.sources.state import (
    remanent_lookup,
    write_bucketed_state,
)


def test_bucketed_state_joins_without_exchange_on_stored_side(spark):
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/recon_state_bucketed", ignore_errors=True)
    state = spark.range(0, 2000).select(
        F.col("id").cast("string").alias("_id"),
        F.when(F.col("id") % 3 == 0, "REMANENT").otherwise("DONE").alias(
            "conciliation_status"
        ),
    )
    write_bucketed_state(state, "recon_state_bucketed", buckets=4)

    tx = spark.range(0, 5000).select(
        F.col("id").cast("string").alias("_id"),
        (F.col("id") * 2).cast("double").alias("amount"),
    )
    stored = spark.table("recon_state_bucketed")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # forbid broadcast so the join must exploit the bucket layout
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = remanent_lookup(stored, tx)
        out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # correctness: only REMANENT ids survive, joined to tx
    assert out.count() == state.where(
        F.col("conciliation_status") == "REMANENT"
    ).count()
    # the stored side reads its buckets directly — exactly ONE exchange in
    # the final plan (the incoming tx side), and the scan advertises buckets
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") == 1, final
    assert "Bucketed: true" in final, final
    assert "SelectedBucketsCount" in final, final
