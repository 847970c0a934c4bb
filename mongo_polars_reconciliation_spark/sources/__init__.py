from mongo_polars_reconciliation_spark.sources.external import prepare_external
from mongo_polars_reconciliation_spark.sources.scan import (
    apply_source_filter,
    read_csv_all_string,
    scan_internal,
)
from mongo_polars_reconciliation_spark.sources.state import (
    merge_keep_existing,
    merge_upsert,
    remanent_lookup,
)

__all__ = [
    "prepare_external",
    "apply_source_filter",
    "read_csv_all_string",
    "scan_internal",
    "merge_keep_existing",
    "merge_upsert",
    "remanent_lookup",
]
