from conftest import rows

from mongo_polars_reconciliation_spark.config import ZeroEffectRule
from mongo_polars_reconciliation_spark.operators.zero_effect import apply_zero_effect

RULE = ZeroEffectRule(
    field="transaction_type",
    values=("SALE", "VOID"),
    b1_cols=("ticket_code", "amount"),
    b2_cols=("sale_ticket_code", "amount"),
)

SCHEMA = "`_id` string, transaction_type string, ticket_code string, sale_ticket_code string, amount double"


def test_pairs_cancel(spark):
    a = spark.createDataFrame(
        [
            ("s1", "SALE", "TK1", None, 10.0),
            ("v1", "VOID", "TKV", "TK1", 10.0),   # cancels s1
            ("s2", "SALE", "TK2", None, 20.0),
            ("v2", "VOID", "TKW", "TK2", 25.0),   # amount differs -> no cancel
            ("s3", "SALE", "TK3", None, 30.0),    # survives
            ("v3", "VOID", "TKX", "TK9", 30.0),   # SALE outside window -> no cancel
        ],
        SCHEMA,
    )
    clean, pairs = apply_zero_effect(a, [RULE])
    assert rows(pairs, "_id", "_id_right") == [("s1", "v1")]
    assert rows(clean, "_id") == [("s2",), ("s3",), ("v2",), ("v3",)]
    # right-side non-key columns carry the _right suffix (Polars join naming)
    assert "_id_right" in pairs.columns and "ticket_code_right" in pairs.columns
    # right-side key columns are consumed by the join
    assert "sale_ticket_code_right" not in pairs.columns


def test_no_rules_noop(spark):
    a = spark.createDataFrame([("s1", "SALE", "T", None, 1.0)], SCHEMA)
    clean, pairs = apply_zero_effect(a, [])
    assert clean.count() == 1 and pairs.count() == 0
