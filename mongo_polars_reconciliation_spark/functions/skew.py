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
