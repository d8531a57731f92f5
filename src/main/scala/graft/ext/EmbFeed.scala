package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Derived embedding corpus with planted near-duplicates (E1's
  * embedding-cosine dedup needs them; the fixture's random vectors top out
  * around cosine 0.5). Every vec_id % 20 == 0 vector gets a copy scaled by
  * 1.5: cosine(v, 1.5v) = 1 and the scaling preserves every LSH hyperplane
  * projection sign, so the copy lands in the same bucket by construction.
  * Mirrored 1:1 by ExtOracle (1.5 is exactly representable, so the float
  * multiply is bit-identical across engines).
  */
object EmbFeed {

  val DupOffset = 100000L

  def withDups(embeddings: DataFrame): DataFrame = {
    def row(id: Column, vec: Column) =
      struct(id.cast("long").as("vec_id"), vec.as("embedding"))
    embeddings.select(explode(array(
      row(col("vec_id"), col("embedding")),
      when(col("vec_id") % 20 === 0,
        row(col("vec_id") + lit(DupOffset),
          transform(col("embedding"), x => x * lit(1.5f)))))).as("__r"))
      .where(col("__r").isNotNull) // codegen'd row filter, not the HOF filter()
      .select(col("__r.*"))
  }
}
