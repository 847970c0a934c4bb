from mongo_polars_reconciliation_spark.functions.indexing import (
    with_file_row_number,
    with_prefix_sum,
)
from mongo_polars_reconciliation_spark.functions.windows import (
    duplicated_rows,
    keep_first,
    keep_last,
    with_group_count,
)

__all__ = [
    "with_file_row_number",
    "with_prefix_sum",
    "duplicated_rows",
    "keep_first",
    "keep_last",
    "with_group_count",
]
