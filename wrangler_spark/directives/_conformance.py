"""Conformance-issue flattening for validate-standard.

Mirrors the reference's validation/conformers/JsonConformer.java:52-79:
a nested validation failure is summarized as its LEAF issues — each
carrying the chain of schema locations walked to reach it ('#/a -> #/b
-> #/c') — and the root issue is reported only when it has no
non-trivial causes. Pure driver/executor-side Python over already-raised
validator errors; never in the row hot path for conforming rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ConformanceIssue:
    """One leaf validation failure (JsonConformer's ConformanceIssue)."""

    schema_location: str
    data_location: str
    message: str


@dataclass
class ValidationNode:
    """Normalized validation-error tree node (the shape the everit
    ValidationException exposes; jsonschema errors normalize into it)."""

    schema_location: str
    data_location: str
    message: str
    causes: list = field(default_factory=list)


def convert_validation_error(e: ValidationNode) -> list[ConformanceIssue]:
    """JsonConformer.convertValidationException (java:52-68): causes with
    a non-root data pointer flatten to their leaves (deduplicated,
    order-preserving); a cause-free (or all-trivial-caused) root reports
    itself."""
    nontrivial = [c for c in e.causes if c.data_location != "#"]
    if nontrivial:
        seen: list[ConformanceIssue] = []
        for c in nontrivial:
            for issue in _leaf_issues(None, c):
                if issue not in seen:
                    seen.append(issue)
        return seen
    return [ConformanceIssue(e.schema_location, e.data_location, e.message)]


def _leaf_issues(schema_path: str | None, ve: ValidationNode):
    """JsonConformer.getLeafExceptions (java:70-79)."""
    new_path = (f"{schema_path} -> " if schema_path else "") + ve.schema_location
    if not ve.causes:
        yield ConformanceIssue(new_path, ve.data_location, ve.message)
        return
    for c in ve.causes:
        yield from _leaf_issues(new_path, c)


def _pointer(parts) -> str:
    return "#" + "".join(f"/{p}" for p in parts)


def from_jsonschema_error(err) -> ValidationNode:
    """Normalize a jsonschema ValidationError (draft-agnostic): context
    suberrors (anyOf/oneOf branches) become causes; locations render as
    JSON pointers."""
    return ValidationNode(
        schema_location=_pointer(getattr(err, "absolute_schema_path", []) or []),
        data_location=_pointer(getattr(err, "absolute_path", []) or []),
        message=getattr(err, "message", str(err)),
        causes=[from_jsonschema_error(c) for c in (getattr(err, "context", None) or [])],
    )


def summarize_errors(errors) -> str | None:
    """Flatten every top-level validator error to its leaf issues and
    render one per-row message; None when the document conforms."""
    issues: list[ConformanceIssue] = []
    for e in errors:
        for issue in convert_validation_error(from_jsonschema_error(e)):
            if issue not in issues:
                issues.append(issue)
    if not issues:
        return None
    return "; ".join(
        f"{i.schema_location} ({i.data_location}): {i.message}" for i in issues
    )
