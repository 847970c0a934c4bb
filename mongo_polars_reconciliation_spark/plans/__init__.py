from mongo_polars_reconciliation_spark.plans.pipeline import (
    ExactPass,
    Reconciliation,
    TolerancePass,
)

__all__ = ["Reconciliation", "ExactPass", "TolerancePass"]
