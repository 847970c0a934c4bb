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


def residuals_from_candidates(
    a: DataFrame, b: DataFrame, candidates: DataFrame, cfg: ReconConfig
) -> tuple[DataFrame, DataFrame]:
    """Both residuals derived from the match's candidate frame instead of
    re-joining A and B on the full key lists: an A row is residual iff it
    produced no candidate (its ``_id`` is absent), a B row iff it was no
    one's candidate (its row number is absent).

    Identical to the anti-joins (a row joins iff a candidate exists; null
    keys never join, so null-keyed rows are absent from candidates and stay
    residual) but reuses the ONE key-shuffle the match already paid —
    downstream shuffles hash on a single id column. At 100 TB this halves
    the cascade's shuffled bytes."""
    rn = cfg.ext_row_number_col
    # no distinct() on the build sides: left_anti dedups in its hash table,
    # a pre-distinct would just add a shuffle stage
    a_res = a.join(candidates.select(cfg.id_col), on=cfg.id_col, how="left_anti")
    b_res = b.join(candidates.select(rn), on=rn, how="left_anti")
    return a_res, b_res
