"""Sink semantics (SURVEY.md §2.1 S6/S8) and engine partition invariants."""

import glob
import shutil

from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.harness.queries import _ab
from mongo_polars_reconciliation_spark.scratch import scratch_path
from mongo_polars_reconciliation_spark.operators.match import match_records
from mongo_polars_reconciliation_spark.operators.residuals import (
    residual_external,
    residual_internal,
)
from mongo_polars_reconciliation_spark.sources.sinks import (
    save_buckets_csv,
    write_time_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"
OUT = scratch_path("test_sinks")


def test_save_buckets_csv_single_file_roundtrip(spark):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg, a, b = _ab(spark, SF_DIR)
    matched, _ = match_records(a, b, cfg)
    buckets = {"a_to_b_mt": matched.select("_id", "amount")}
    paths = save_buckets_csv(buckets, f"{OUT}/csv", iteration=2)
    assert paths["a_to_b_mt"].endswith("a_to_b_mt(2).csv")
    # single-file semantics: exactly one part file
    parts = glob.glob(f"{paths['a_to_b_mt']}/part-*")
    assert len(parts) == 1
    back = spark.read.csv(paths["a_to_b_mt"], header=True)
    assert back.count() == matched.count()


def test_write_time_partitioned_ranges(spark):
    """S8 without the thread pool: files are range-partitioned on the time
    column, so each covers a contiguous interval (the reference's 5 equal
    $merge batches)."""
    shutil.rmtree(f"{OUT}/tp", ignore_errors=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    write_time_partitioned(ev, f"{OUT}/tp", "ts", num_partitions=5)
    back = spark.read.parquet(f"{OUT}/tp")
    assert back.count() == ev.count()
    files = [f for f in glob.glob(f"{OUT}/tp/part-*") if f.endswith(".parquet")]
    assert len(files) >= 2
    # per-file min/max ranges must not overlap
    spans = []
    for f in files:
        r = spark.read.parquet(f).agg(F.min("ts"), F.max("ts")).head()
        if r[0] is not None:
            spans.append((r[0], r[1]))
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_match_and_residual_partition_a(spark):
    """Invariant (SURVEY.md §5 property 1): winners ∪ internal-residual
    partitions A by _id — nothing lost, nothing duplicated."""
    cfg, a, b = _ab(spark, SF_DIR)
    matched, _ = match_records(a, b, cfg)
    resid = residual_internal(a, b, cfg)
    n_a = a.count()
    assert matched.count() + resid.count() == n_a
    assert (
        matched.select("_id").union(resid.select("_id")).distinct().count() == n_a
    )


def test_b_winner_loser_residual_accounting(spark):
    """Invariant 2: every B row is exactly one of {winner, loser, residual}."""
    cfg, a, b = _ab(spark, SF_DIR)
    matched, losers = match_records(a, b, cfg)
    resid = residual_external(b, a, cfg)
    rn = cfg.ext_row_number_col
    n_b = b.count()
    assert matched.count() + losers.count() + resid.count() == n_b
    union = (
        matched.select(rn).union(losers.select(rn)).union(resid.select(rn))
    )
    assert union.distinct().count() == n_b
