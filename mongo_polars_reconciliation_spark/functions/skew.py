"""Skew-aware join helper: explicit key salting.

At 100 TB the reconciliation keys are skew-prone (VOID amounts cluster, a
hot settlement date can dominate a day's file). First line of defense is AQE
skew-join splitting (on by default in session.py) — it needs no code. This
helper is the explicit fallback for the cases AQE can't fix, e.g. a
shuffle-hash join whose ONE hot key overwhelms a task even after splitting:
replicate the small side R times and scatter the big side's hot rows across
R salt buckets, turning one monster partition into R even ones.

Cost model: the small side is duplicated R× (bounded — use only when small
side ≪ big side) and the join output is identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salt_large(df: DataFrame, buckets: int) -> DataFrame:
    """Scatter: each row gets a deterministic pseudo-random salt in
    [0, buckets) — spreads any hot key across ``buckets`` partitions.
    Deterministic per row content via hash of all columns, not rand(), so
    retried tasks produce identical output (speculative execution safe)."""
    return df.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def replicate_small(df: DataFrame, buckets: int) -> DataFrame:
    """Replicate: small side cross-joined with the salt domain so every salt
    bucket of the large side finds its partner rows."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias(SALT)
    return df.select("*", salts)


def salted_two_stage_agg(
    df: DataFrame,
    keys: list[str],
    count_name: str = "n",
    sum_cols: dict[str, str] | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation: partial agg on (keys..., salt), then
    merge on keys — the manual form of map-side combine for the case where a
    single hot key overwhelms even the combined partials (e.g. one event
    type is 90% of a 100 TB table: stage 1 spreads it over ``buckets``
    reducers; stage 2 merges ``buckets`` rows per key).

    Only algebraic, order-insensitive aggregates are offered: counts and
    DECIMAL-routed sums (``sum_cols`` maps input column → output name; each
    is cast to DECIMAL(18,2) so re-association across salt buckets cannot
    change a double's rounding). The result is bit-identical to the unsalted
    ``df.groupBy(keys).agg(...)``."""
    sum_cols = sum_cols or {}
    salted = salt_large(df, buckets)
    partial = salted.groupBy(*keys, SALT).agg(
        F.count(F.lit(1)).alias("__pn"),
        *[
            F.sum(F.col(src).cast("decimal(18,2)")).alias(f"__ps_{out}")
            for src, out in sum_cols.items()
        ],
    )
    return partial.groupBy(*keys).agg(
        F.sum("__pn").alias(count_name),
        *[
            F.sum(f"__ps_{out}").cast("double").alias(out)
            for out in sum_cols.values()
        ],
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """``large ⋈ small`` on equi-keys with salting: result is identical to
    ``large.join(small, on, how)`` but the shuffle distributes each hot key
    over ``buckets`` tasks."""
    l_salted = salt_large(large, buckets)
    s_salted = replicate_small(small, buckets)
    return l_salted.join(s_salted, on=[*on, SALT], how=how).drop(SALT)
