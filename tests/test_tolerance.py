from conftest import rows

from mongo_polars_reconciliation_spark.config import KeyPair, ReconConfig, ToleranceRule
from mongo_polars_reconciliation_spark.operators.tolerance import apply_tolerance
from mongo_polars_reconciliation_spark.sources.external import prepare_external

CFG = ReconConfig(
    keys=[
        KeyPair("transaction_code", "codigo", None),
        KeyPair("approved_transaction_amount", "importe", "double"),
    ]
)


def make_b(spark):
    b_raw = spark.createDataFrame(
        [
            (1, "T1", "10.5"),   # diff 0.5 vs a1 -> closest, wins
            (2, "T1", "10.8"),   # diff 0.8 -> loses to row 1
            (3, "T2", "21.5"),   # diff 1.5 > eps -> no tolerance match
            (4, "T3", "29.5"),   # equidistant tie with row 5: lower row number wins
            (5, "T3", "30.5"),
            (6, "T9", "99.0"),   # no reduced-key partner
        ],
        ["ord", "codigo", "importe"],
    )
    return prepare_external(b_raw, CFG, order_by=["ord"]).drop("ext_ord")


def make_a(spark):
    return spark.createDataFrame(
        [("a1", "T1", 10.0), ("a2", "T2", 20.0), ("a3", "T3", 30.0)],
        ["_id", "transaction_code", "approved_transaction_amount"],
    )


def test_closest_wins_and_residuals(spark):
    a, b = make_a(spark), make_b(spark)
    matched, a_resid, b_resid = apply_tolerance(
        a, b, CFG, [ToleranceRule("importe", 1.0)]
    )
    got = rows(matched, "_id", "ext_file_row_number")
    # a1 takes row 1 (0.5 < 0.8); a3's tie (0.5 vs 0.5) broken by row number
    assert got == [("a1", 1), ("a3", 4)]
    # consumed ext_ field and diff column are dropped from the matched output
    assert "ext_importe" not in matched.columns
    assert "importe_diff" not in matched.columns
    assert "exd_importe" in matched.columns
    assert rows(a_resid, "_id") == [("a2",)]
    # b residual: everything not tolerance-matched on full exd keys
    assert rows(b_resid, "ext_file_row_number") == [(2,), (3,), (5,), (6,)]
