from mongo_polars_reconciliation_spark.operators.match import match_records
from mongo_polars_reconciliation_spark.operators.residuals import (
    residual_external,
    residual_internal,
)
from mongo_polars_reconciliation_spark.operators.summary import bucket_summary
from mongo_polars_reconciliation_spark.operators.tolerance import apply_tolerance
from mongo_polars_reconciliation_spark.operators.zero_effect import apply_zero_effect

__all__ = [
    "match_records",
    "residual_internal",
    "residual_external",
    "apply_zero_effect",
    "apply_tolerance",
    "bucket_summary",
]
