"""Relational / dataflow operators (SURVEY.md §2)."""

from bigdatapipelne_spark.operators.aggregate import exact_sum, group_agg
from bigdatapipelne_spark.operators.project import (
    apply_mapping,
    drop_fields,
    flatten_structs,
)
from bigdatapipelne_spark.operators.windows import tumbling_window_agg

__all__ = [
    "apply_mapping",
    "flatten_structs",
    "drop_fields",
    "group_agg",
    "exact_sum",
    "tumbling_window_agg",
]
