"""Bi-directional residuals: A∖B and B∖A as left-anti joins.

Reference: ``Reconciliator.not_match_records`` (src/reconciliatior.py:76-91)
— SURVEY.md §2.3 J2/J3. Both anti-joins run on the same key pairs as the
match; Polars/Spark anti-join semantics agree (null keys never match, so
null-keyed rows always land in the residual).

Scale: the anti-joins reuse the same shuffle keys as the match join — with
both inputs persisted, AQE plans three joins over one pair of shuffled
inputs; B∖A broadcasts A's key projection when A is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mongo_polars_reconciliation_spark.config import ReconConfig


def residual_internal(a: DataFrame, b: DataFrame, cfg: ReconConfig) -> DataFrame:
    """A rows with no B counterpart on the full key list (a_to_b_nmt)."""
    cond = [a[ka] == b[kb] for ka, kb in zip(cfg.a_columns, cfg.b_columns, strict=True)]
    return a.join(b, cond, "left_anti")


def residual_external(b: DataFrame, a: DataFrame, cfg: ReconConfig) -> DataFrame:
    """B rows with no A counterpart (b_to_a_nmt), mirrored key lists."""
    cond = [b[kb] == a[ka] for ka, kb in zip(cfg.a_columns, cfg.b_columns, strict=True)]
    return b.join(a, cond, "left_anti")
