"""Tolerance re-match: reduced-key join + |diff| ≤ ε + closest-wins.

Reference: ``Reconciliator.apply_tolerance`` (src/reconciliatior.py:93-151) —
SURVEY.md §2.3 J6/J7, §2.2 P12/P13, §2.4 tolerance arbitration.

For each rule the toleranced field is removed from the key lists; A and B are
inner-joined on the reduced keys; ``{field}_diff = |exd_field − a_field|``;
candidates with every diff ≤ ε survive; each reduced-A-key group keeps its
*closest* candidate (sort by diff, keep first — reconciliatior.py:133-141).
Residuals are recomputed by anti-joining A (on reduced keys) and B (on the
``exd_`` copies of the *full* key list) against the tolerance-matched set.

The reference expresses this as equi-join-then-filter, not a band join — we
keep that plan: the reduced-key equi-join shuffles far less than a range join
and the diff filter is a cheap post-predicate (SURVEY.md §2.3 note).

Determinism: the reference sorts by diff only; ties are broken by incidental
order. Our contract appends ``ext_file_row_number`` to the window order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.config import ReconConfig, ToleranceRule


def apply_tolerance(
    a: DataFrame,
    b: DataFrame,
    cfg: ReconConfig,
    rules: list[ToleranceRule],
    cache=None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Return ``(tolerance_matched, a_residual, b_residual)``.

    ``tolerance_matched`` drops the consumed ``ext_`` field and diff columns
    (reconciliatior.py:150 ``drop(drop_columns)``).
    """
    a_keys = list(cfg.a_columns)
    b_keys = list(cfg.b_columns)
    diff_cols: list[str] = []
    drop_cols: list[str] = []
    diff_exprs = []
    preds = []

    for rule in rules:
        ext_name = cfg.ext_prefix + rule.field
        if ext_name not in cfg.b_columns:
            continue
        idx = b_keys.index(ext_name)
        diff_name = f"{rule.field}_diff"
        a_field = a_keys[idx]
        exd_name = cfg.ext_to_exd(ext_name)
        diff_exprs.append(
            F.abs(F.col(exd_name) - F.col(a_field)).alias(diff_name)
        )
        preds.append(F.col(diff_name) <= F.lit(rule.tolerance))
        diff_cols.append(diff_name)
        drop_cols += [ext_name, diff_name]
        del a_keys[idx], b_keys[idx]

    if not diff_cols:
        raise ValueError("no tolerance rule matched a configured key")

    cond = [a[ka] == b[kb] for ka, kb in zip(a_keys, b_keys, strict=True)]
    joined = (
        a.join(b, cond, "inner")
        .drop(*[b[kb] for kb in b_keys])
        .select("*", *diff_exprs)
    )

    # all_horizontal(diff <= tol) (reconciliatior.py:97-100,137)
    pred = preds[0]
    for p in preds[1:]:
        pred = pred & p
    within = joined.where(pred)

    # closest-wins per reduced A-key group; explicit deterministic tie-break
    w = Window.partitionBy(*a_keys).orderBy(
        *[F.col(d).asc() for d in diff_cols],
        F.col(cfg.ext_row_number_col).asc_nulls_last(),
    )
    best = (
        within.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if cache is not None:
        # read 3× below (matched bucket + both residual anti-joins) —
        # materialize the join/filter/window once
        best = cache(best)

    # recompute residuals against the tolerance-matched set. No distinct() on
    # the build side: left_anti dedups keys in its hash table anyway, so a
    # pre-distinct is one extra shuffle for nothing (build-side sizing is
    # left to AQE)
    a_resid = a.join(best.select(a_keys), on=a_keys, how="left_anti")
    b_exd_full = [cfg.ext_to_exd(kb) for kb in cfg.b_columns]
    b_resid = b.join(best.select(b_exd_full), on=b_exd_full, how="left_anti")

    matched = best.drop(*[c for c in drop_cols if c in best.columns])
    return matched, a_resid, b_resid
