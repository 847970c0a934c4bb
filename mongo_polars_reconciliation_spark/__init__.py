"""PySpark-native reconciliation & data-pipeline engine.

A from-scratch re-implementation, on the Spark DataFrame API, of the query
and data-processing capabilities of ``maurock00/mongo-polars-reconciliation``
(surveyed in ``SURVEY.md``): config-driven multi-key reconciliation between an
internal transaction table A and an external settlement table B — zero-effect
cancellation, exact multi-key matching with deterministic duplicate
arbitration, bi-directional residuals, tolerance re-matching, multi-pass
cascades, summaries, and state-table persistence — plus large-scale
training-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns).

Design rules (SURVEY.md §4, §7):
- declarative DataFrame plans only; no Python row UDFs in any hot path;
- deterministic window-based arbitration where the reference relied on
  incidental row order;
- every operator is a pure ``DataFrame -> DataFrame`` function so Catalyst
  sees the whole plan (pushdown, AQE, broadcast/sort-merge selection).
"""

from mongo_polars_reconciliation_spark.config import (
    KeyPair,
    ReconConfig,
    ToleranceRule,
    ZeroEffectRule,
)
from mongo_polars_reconciliation_spark.plans.pipeline import Reconciliation

__all__ = [
    "KeyPair",
    "ReconConfig",
    "ToleranceRule",
    "ZeroEffectRule",
    "Reconciliation",
]

__version__ = "0.1.0"
