"""Zero-effect cancellation: internal SALE/VOID pairs removed before matching.

Reference: ``Reconciliator.apply_zero_effect`` (src/reconciliatior.py:162-199)
— SURVEY.md §2.3 J4/J5. Rule-driven self-join of A: rows of kind1
(``field == values[0]``) join rows of kind2 (``field == values[1]``) on
``b1_cols`` vs ``b2_cols`` (e.g. a VOID's ``sale_ticket_code`` + amount
pointing at its SALE's ``ticket_code`` + amount). Both members of each
matched pair are then anti-joined out of A by ``_id`` and ``_id_right``.

Output schema mirrors Polars join naming: the right side's non-key columns
get a ``_right`` suffix; its key columns are consumed by the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.config import ZeroEffectRule


def apply_zero_effect(
    a: DataFrame,
    rules: list[ZeroEffectRule],
    id_col: str = "_id",
    cache=None,
) -> tuple[DataFrame, DataFrame]:
    """Return ``(clean_a, zero_effect_pairs)``.

    ``zero_effect_pairs`` accumulates one row per cancelled (kind1, kind2)
    pair across all rules (z_eff_a bucket); ``clean_a`` is A with both pair
    members removed.
    """
    pairs_acc: DataFrame | None = None
    for rule in rules:
        if rule.source != "a":
            raise NotImplementedError("reference defines zero-effect on A only")
        kind1 = a.where(F.col(rule.field) == rule.values[0])
        kind2 = a.where(F.col(rule.field) == rule.values[1])
        # Polars suffixes colliding right-side columns with "_right" and
        # consumes the right-side key columns (src/reconciliatior.py:190-192)
        kind2_r = kind2.select(
            [F.col(c).alias(f"{c}_right") for c in kind2.columns]
        )
        cond = [
            kind1[l] == kind2_r[f"{r}_right"]
            for l, r in zip(rule.b1_cols, rule.b2_cols, strict=True)
        ]
        pairs = kind1.join(kind2_r, cond, "inner").drop(
            *[kind2_r[f"{r}_right"] for r in rule.b2_cols]
        )
        if cache is not None:
            # read 3× (pairs bucket + the two id anti-joins) — materialize once
            pairs = cache(pairs)
        pairs_acc = (
            pairs
            if pairs_acc is None
            else pairs_acc.unionByName(pairs, allowMissingColumns=True)
        )
        # remove BOTH members of each pair from A (reconciliatior.py:196-198):
        # one anti-join against the union of both id columns — the union is
        # shuffle-free, so this is one join stage where two chained anti-joins
        # would be two
        ids = pairs.select(F.col(id_col).alias("__ze_id")).unionAll(
            pairs.select(F.col(f"{id_col}_right").alias("__ze_id"))
        )
        a = a.join(ids, a[id_col] == ids["__ze_id"], "left_anti")
    if pairs_acc is None:
        pairs_acc = a.limit(0)
    return a, pairs_acc
