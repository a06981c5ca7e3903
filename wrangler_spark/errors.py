"""Error types for recipe parsing/compilation/execution."""


class RecipeError(Exception):
    """Base class for all recipe-related errors."""


class DirectiveParseError(RecipeError):
    """Raised when recipe text cannot be tokenized/parsed.

    Mirrors the reference's SyntaxError surface
    (wrangler-core parser/RecipeCompiler.java:61-86).
    """

    def __init__(self, message: str, line: int | None = None, source: str | None = None):
        loc = f" (line {line}: {source!r})" if line is not None else ""
        super().__init__(message + loc)
        self.line = line
        self.source = source


class DirectiveNotFoundError(RecipeError):
    """Unknown directive name (reference: GrammarBasedParser registry lookup)."""


class UsageError(RecipeError):
    """Directive invoked with bad/missing arguments (reference: MapArguments)."""


class ExpressionError(RecipeError):
    """JEXL-subset expression cannot be parsed or translated to a Column."""


class SchemaError(RecipeError):
    """Directive is incompatible with the incoming schema (e.g. rename onto an
    existing column — reference utils/ColumnConverter.java:49-66)."""
