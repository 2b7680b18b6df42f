from etl_migrate_api_spark.operators.merge import (
    merge_fold_expr,
    merge_fold_pandas,
    merge_phones_py,
)
from etl_migrate_api_spark.operators.classify import classify_batch, op_counters

__all__ = [
    "merge_fold_expr",
    "merge_fold_pandas",
    "merge_phones_py",
    "classify_batch",
    "op_counters",
]
