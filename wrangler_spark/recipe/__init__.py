from wrangler_spark.recipe.parser import DirectiveCall, Tok, parse_recipe

__all__ = ["DirectiveCall", "Tok", "parse_recipe"]
