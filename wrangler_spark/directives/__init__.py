"""Directive implementations. Importing this package registers everything."""

from wrangler_spark.directives import (  # noqa: F401
    column_ops,
    datetime_ops,
    lookups,
    parsers,
    row_ops,
    transforms,
    writers,
)
