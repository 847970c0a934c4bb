"""Property tests (SURVEY.md §5): randomized inputs, algebraic invariants.

- match ∪ internal-residual partitions A (every A row lands in exactly one
  bucket, by id);
- winner + losers accounts for every joined B candidate;
- re-running the exact pass on the residuals matches nothing (idempotence:
  residuals share no key tuples by construction);
- tolerance matches always satisfy |diff| ≤ ε.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mongo_polars_reconciliation_spark.config import (
    KeyPair,
    ReconConfig,
    ToleranceRule,
)
from mongo_polars_reconciliation_spark.operators.match import match_records
from mongo_polars_reconciliation_spark.operators.residuals import (
    residual_external,
    residual_internal,
)
from mongo_polars_reconciliation_spark.operators.tolerance import apply_tolerance
from mongo_polars_reconciliation_spark.sources.external import prepare_external

CFG = ReconConfig(
    keys=[KeyPair("code", "codigo"), KeyPair("amount", "importe", "double")]
)

# tiny alphabets force key collisions, duplicates and empty sides
_key = st.text(alphabet="ab", min_size=1, max_size=2)
_amt = st.sampled_from([1.0, 2.0, 2.5])
_rows = st.lists(st.tuples(_key, _amt), max_size=20)


def _frames(spark, ra, rb):
    a = spark.createDataFrame(
        [(str(i), k, v) for i, (k, v) in enumerate(ra)],
        "_id string, code string, amount double",
    )
    b_raw = spark.createDataFrame(
        [(i, k, str(v)) for i, (k, v) in enumerate(rb)],
        "k long, codigo string, importe string",
    )
    b = prepare_external(b_raw, CFG, order_by=["k"], scalable_index=False)
    return a, b


@settings(max_examples=6, deadline=None)
@given(ra=_rows, rb=_rows)
def test_match_residual_partition_and_idempotence(spark, ra, rb):
    a, b = _frames(spark, ra, rb)
    matched, losers = match_records(a, b, CFG)
    a_res = residual_internal(a, b, CFG)
    b_res = residual_external(b, a, CFG)

    ids_a = {r["_id"] for r in a.select("_id").collect()}
    ids_m = {r["_id"] for r in matched.select("_id").collect()}
    ids_r = {r["_id"] for r in a_res.select("_id").collect()}
    assert ids_m | ids_r == ids_a
    assert ids_m & ids_r == set()

    # every B candidate row the join consumed is either the winner of its A
    # row or returned as a loser; with the residual, all of B is accounted
    rn = CFG.ext_row_number_col
    won = {r[rn] for r in matched.select(rn).collect()}
    lost = {r[rn] for r in losers.select(rn).collect()}
    free = {r[rn] for r in b_res.select(rn).collect()}
    assert won | lost | free == {r[rn] for r in b.select(rn).collect()}

    # idempotence: the residuals share no key tuples, so a re-run matches 0
    matched2, _ = match_records(a_res, b_res, CFG)
    assert matched2.count() == 0


@settings(max_examples=4, deadline=None)
@given(ra=_rows, rb=_rows)
def test_tolerance_matches_within_epsilon(spark, ra, rb):
    a, b = _frames(spark, ra, rb)
    eps = 0.5
    matched, a_res, b_res = apply_tolerance(
        a, b, CFG, [ToleranceRule("importe", eps)]
    )
    bad = matched.where(
        F.abs(F.col("exd_importe") - F.col("amount")) > eps
    ).count()
    assert bad == 0
