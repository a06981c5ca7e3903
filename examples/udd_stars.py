"""Example user-defined directive (UDD).

Load it from a recipe with

    #pragma load-directives examples.udd_stars;
    !star-rating :stars

or ship the module via --py-files and import it anywhere before
compiling the recipe. The @directive decorator registers into the same
registry as the system directives (the reference's DIE-pattern UDD
surface, wrangler-api Directive.java:24-54, loaded via
UserDirectiveRegistry.java:88-147)."""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wrangler_spark.recipe.registry import RecipeContext, directive


@directive("star-rating")
def star_rating(call):
    """!star-rating :col — bucket a numeric column into 1-5 stars."""
    col = call.col(0)

    def tr(df: DataFrame, ctx: RecipeContext) -> DataFrame:
        v = F.col(col).cast("double")
        return df.withColumn(
            f"{col}_stars",
            F.least(F.greatest(F.ceil(v / 20.0), F.lit(1)), F.lit(5)).cast("int"),
        )

    return tr
