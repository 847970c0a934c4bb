from mongo_polars_reconciliation_spark.harness.fixtures import (
    ZE_RULE,
    build_external,
    build_external_raw,
    build_internal,
    load_base,
    recon_cfg,
)

__all__ = [
    "ZE_RULE",
    "build_external",
    "build_external_raw",
    "build_internal",
    "load_base",
    "recon_cfg",
]
