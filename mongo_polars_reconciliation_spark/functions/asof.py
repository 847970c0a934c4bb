"""As-of (nearest-preceding) join — a custom operator Spark's built-ins
lack, expressed as a composition of existing DataFrame ops (SURVEY.md §2.9
custom-operator policy: composition first, Pandas UDF only if semantics
demand it — here they don't).

Physical shape: tag-and-union both sides, ONE shuffle on the key, one
ordered window with an ignore-nulls carry-forward of the right side's
payload, filter back to left rows. This is the scale-correct plan — the
naive range join explodes to O(|L|·|R|) pairs per key before picking the
max, while the union-window form is O(|L|+|R|) rows through one sort. A
backward as-of join by (key, time) is exactly "most recent right row at or
before my time".

Determinism: the window orders by (ts, side-tag, tiebreak); the right-side
tag sorts before the left at equal timestamps, so a right row AT the left
row's timestamp matches, and among equal-ts right rows the greatest
tiebreak wins — mirrored exactly by the oracle's ROW_NUMBER form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the LAST right row with
    ``right.ts <= left.ts`` on the same key (null payload when none).

    ``payload_cols``: right-side columns to carry (renamed as-is — alias
    beforehand to avoid collisions). ``tiebreak_col``: right-side column
    ordering equal-timestamp right rows (greatest wins); required for a
    deterministic result when right timestamps can tie."""
    # the payload travels as ONE struct: last(ignorenulls) then skips left
    # rows (their struct is null) but never a right row — a right row whose
    # payload FIELDS are null still has a non-null struct, so the match is
    # row-atomic (no mixing fields from different right rows) and "last
    # right row" means last ROW, not last non-null value
    rtypes = dict(right.dtypes)
    # keep the tiebreak in its NATURAL orderable type — casting to long would
    # turn e.g. a string id into NULL for every row and silently break the
    # determinism guarantee for equal-ts right rows
    tb_type = rtypes[tiebreak_col] if tiebreak_col else "long"
    l_tag = (
        left.withColumn("__side", F.lit(1))
        .withColumn("__tb", F.lit(None).cast(tb_type))
        .withColumn(
            "__payload",
            F.lit(None).cast(
                "struct<" + ", ".join(f"{c}: {rtypes[c]}" for c in payload_cols) + ">"
            ),
        )
    )
    r_tag = (
        right.select(*(on + [ts_col] + payload_cols))
        .withColumn("__side", F.lit(0))
        .withColumn(
            "__tb",
            F.col(tiebreak_col) if tiebreak_col else F.lit(0).cast("long"),
        )
        .withColumn("__payload", F.struct(*payload_cols))
        .drop(*payload_cols)
    )
    ltypes = dict(left.dtypes)
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(ltypes[c]))
    both = l_tag.unionByName(r_tag.select(l_tag.columns))
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn(
        "__asof", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__side") == 1).drop("__side", "__tb", "__payload")
    for c in payload_cols:
        out = out.withColumn(c, F.col("__asof")[c])
    return out.drop("__asof")
