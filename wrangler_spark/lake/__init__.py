from wrangler_spark.lake.constraints import ConstraintViolationError
from wrangler_spark.lake.dml import MergeBuilder, MergeConflictError, delete_where, update_where
from wrangler_spark.lake.table import CommitConflictError, LakeTable
from wrangler_spark.lake.wap import AuditError, StagedCommit

__all__ = [
    "LakeTable",
    "CommitConflictError",
    "ConstraintViolationError",
    "MergeBuilder",
    "MergeConflictError",
    "StagedCommit",
    "AuditError",
    "delete_where",
    "update_where",
]
