from haplorec_spark.operators.division import (
    select_where_either_subset_of,
    select_where_subset_of,
)
from haplorec_spark.operators.pivot import grouped_rows_to_columns

__all__ = [
    "select_where_subset_of",
    "select_where_either_subset_of",
    "grouped_rows_to_columns",
]
