"""Pure-JVM local relations from driver-side literal rows.

r16 optimization round (guide §1.2, fixed per-job work): the idiomatic
``spark.createDataFrame(rows)`` routes tiny driver-known tables through a
Python RDD — by default one pickled slice per core (32 Python-worker
tasks at local[32] to materialize a 5-row merge table), and even the
single-slice form pays one Python-worker round trip inside every job
that scans it. For tables whose contents the driver already holds as
plain literals (model artifacts, learned merge tables, stopword
dictionaries), shipping the values inside the plan as a literal struct
array costs one JVM-only task and zero Python workers, and downstream
jobs re-scan a plan literal instead of re-running a Python stage.

Values are identical by construction — the same Python floats/ints/
strings cross py4j either way; only the physical source changes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def inline_local_df(spark, structs: list[Column]) -> DataFrame:
    """One-task, pure-JVM local relation from literal structs: inline()
    over a single-partition range. Row order is the array order (single
    row, single task — and exactly one output file if written)."""
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))


def _sql_double_array(values) -> "str | None":
    """SQL literal text for an array<double>, or None if any value is
    non-finite (inf/nan have no plain SQL literal — callers fall back to
    per-element ``F.lit``). ``repr`` emits the shortest decimal that
    round-trips the exact IEEE double, and both Python's and the JVM's
    parsers are correctly rounded, so parse(repr(x)) == x bit-for-bit."""
    parts = []
    for x in values:
        x = float(x)
        if not math.isfinite(x):
            return None
        parts.append(repr(x) + "D")
    return "array(" + ",".join(parts) + ")"


def dbl_array_col(values) -> Column:
    """Literal array<double> column built as ONE ``F.expr`` parse instead
    of one py4j round-trip per element: measured 32×64 doubles cost
    1.39 s to build via ``F.array(*[F.lit(x) …])`` (driver-side py4j per
    literal) vs 7 ms via the SQL string — identical Literal nodes in the
    analyzed plan, bit-equal values (checked elementwise)."""
    s = _sql_double_array(values)
    if s is None:
        return F.array(*[F.lit(float(x)) for x in values])
    return F.expr(s)


def dbl_nested_array_col(lists) -> Column:
    """Literal array<array<double>> column — the :func:`dbl_array_col`
    treatment for a centroid table folded into the plan."""
    inner = [_sql_double_array(c) for c in lists]
    if any(i is None for i in inner):
        return F.array(*[dbl_array_col(c) for c in lists])
    return F.expr("array(" + ",".join(inner) + ")")
