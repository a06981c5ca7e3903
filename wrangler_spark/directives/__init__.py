"""Directive implementations. Importing this package registers everything."""

from wrangler_spark.directives import (  # noqa: F401
    advanced,
    column_ops,
    datetime_ops,
    lookups,
    parsers,
    row_ops,
    transforms,
    writers,
)
