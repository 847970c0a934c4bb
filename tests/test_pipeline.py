from conftest import rows

from mongo_polars_reconciliation_spark.config import (
    KeyPair,
    ReconConfig,
    ToleranceRule,
    ZeroEffectRule,
)
from mongo_polars_reconciliation_spark.plans.pipeline import (
    ExactPass,
    Reconciliation,
    TolerancePass,
)
from mongo_polars_reconciliation_spark.sources.external import prepare_external

CFG = ReconConfig(
    keys=[
        KeyPair("transaction_code", "codigo", None),
        KeyPair("approved_transaction_amount", "importe", "double"),
    ]
)

A_COLS = [
    "_id", "transaction_code", "approved_transaction_amount",
    "transaction_type", "ticket_code", "sale_ticket_code",
]

ZE = ZeroEffectRule(
    field="transaction_type",
    values=("SALE", "VOID"),
    b1_cols=("ticket_code", "approved_transaction_amount"),
    b2_cols=("sale_ticket_code", "approved_transaction_amount"),
)


def build(spark):
    a = spark.createDataFrame(
        [
            ("a1", "T1", 10.0, "SALE", "K1", None),   # exact match
            ("a2", "T2", 20.0, "SALE", "K2", None),   # tolerance match (20.4)
            ("a3", "T3", 30.0, "SALE", "K3", None),   # residual to the end
            ("zs", "T4", 40.0, "SALE", "K4", None),   # zero-effect pair ...
            ("zv", "T5", 40.0, "VOID", "K5", "K4"),   # ... cancels with zs
        ],
        A_COLS,
    )
    b_raw = spark.createDataFrame(
        [
            (1, "T1", "10.0"),
            (2, "T2", "20.4"),
            (3, "T8", "88.0"),  # external residual
        ],
        ["ord", "codigo", "importe"],
    )
    b = prepare_external(b_raw, CFG, order_by=["ord"]).drop("ext_ord")
    return a, b


def test_cascade_exact_then_tolerance(spark):
    a, b = build(spark)
    rc = Reconciliation(CFG, a, b)
    buckets = rc.run(
        [ExactPass(), TolerancePass((ToleranceRule("importe", 1.0),))],
        zero_effect_rules=[ZE],
    )
    assert rows(buckets["z_eff_a"], "_id", "_id_right") == [("zs", "zv")]
    # pass 1 matches a1 exactly; pass 2 re-matches a2 within tolerance
    assert rows(buckets["a_to_b_mt"], "_id") == [("a1",), ("a2",)]
    assert rows(buckets["a_to_b_nmt"], "_id") == [("a3",)]
    assert rows(buckets["b_to_a_nmt"], "ext_file_row_number") == [(3,)]
    summary = rc.summary(amount_col="approved_transaction_amount")
    got = {r["bucket"]: (r["n"], r["amount_sum"]) for r in summary.collect()}
    assert got["a_to_b_mt"] == (2, 30.0)
    assert got["a_to_b_nmt"] == (1, 30.0)
    assert got["z_eff_a"] == (1, 40.0)
    rc.unpersist()
