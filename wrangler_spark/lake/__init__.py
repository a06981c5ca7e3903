from wrangler_spark.lake.dml import MergeBuilder, MergeConflictError, delete_where, update_where
from wrangler_spark.lake.table import CommitConflictError, LakeTable

__all__ = [
    "LakeTable",
    "CommitConflictError",
    "MergeBuilder",
    "MergeConflictError",
    "delete_where",
    "update_where",
]
