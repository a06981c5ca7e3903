from wrangler_spark.expr.jexl import compile_expr

__all__ = ["compile_expr"]
