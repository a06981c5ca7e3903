"""Name validators for ingest-time schema hygiene.

Mirrors the reference's validator/ColumnNameValidator.java:40-84 (column
names must be alphanumeric/underscore identifiers, non-reserved, <=255
chars — the reserved list is Hive's reserved keyword set, the reference's
reserved-column-names.txt resource) and utils/ReferenceNames.java:25-55
(dataset reference names restricted to [$.a-zA-Z0-9_-]).

At 100 TB these run driver-side against a schema (a few hundred strings),
never against data — pure Python is the right altitude.
"""

from __future__ import annotations

import re

from wrangler_spark.errors import RecipeError


class ValidatorError(RecipeError):
    """A name failed validation."""


# Hive's reserved keywords (the reference ships these as
# reserved-column-names.txt; identical to the Apache Hive reserved list).
RESERVED_COLUMN_NAMES = frozenset(
    """all alter and array as authorization between bigint binary boolean
    both by case cast char column conf create cross cube current
    current_date current_timestamp cursor database date decimal delete
    describe distinct double drop else end exchange exists extended
    external false fetch float following for from full function grant
    group grouping having if import in inner insert int intersect
    interval into is join lateral left less like local macro map more
    none not null of on or order out outer over partialscan partition
    percent preceding preserve procedure range reads reduce revoke right
    rollup row rows select set smallint table tablesample then timestamp
    to transform trigger true truncate unbounded union uniquejoin update
    user using utc_tmestamp values varchar when where window with commit
    only regexp rlike rollback start cache constraint foreign primary
    references dayofweek extract floor integer precision views""".split()
)

_IDENT_RE = re.compile(r"^[a-zA-Z0-9_]*$")


def validate_column_name(name: str) -> None:
    """ColumnNameValidator.validate (java:68-84): identifier chars only,
    non-reserved, <=255 chars. Raises ValidatorError otherwise."""
    if not _IDENT_RE.match(name):
        raise ValidatorError(f"Column '{name}' contains non-alphanumeric characters")
    if name.lower() in RESERVED_COLUMN_NAMES:
        raise ValidatorError(f"Column '{name}' is a reserved word.")
    if len(name) > 255:
        raise ValidatorError(f"Column '{name}' is greater than 255 characters.")


def validate_column_names(names) -> None:
    """Validate every column of a schema (the directive-level loop the
    reference runs per workspace)."""
    for n in names:
        validate_column_name(n)


_REFNAME_OK = re.compile(r"[$.a-zA-Z0-9_-]+")
_REFNAME_BAD = re.compile(r"[^$.a-zA-Z0-9_-]+")


def validate_reference_name(name: str) -> None:
    """ReferenceNames.validate (java:36-43)."""
    if not _REFNAME_OK.fullmatch(name):
        raise ValueError(
            f"Invalid reference name '{name}'. Supported characters are: "
            "letters, numbers, and '_', '-', '.', or '$'."
        )


def cleanse_reference_name(name: str) -> str:
    """ReferenceNames.cleanseReferenceName (java:46-55): strip disallowed
    chars; all-invalid input falls back to 'sample'."""
    result = _REFNAME_BAD.sub("", name)
    return result if result else "sample"
