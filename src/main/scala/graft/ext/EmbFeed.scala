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

  val NearDupOffset = 200000L

  /** [[withDups]] ∪ planted NON-colinear NEAR-duplicates: every
    * vec_id % 10 == 0 vector gets a +NearDupOffset copy with its LAST
    * THREE elements zeroed — pure truncation (no float arithmetic at
    * all, so engine-exact by construction; DuckDB mirror:
    * `embedding[1:61] || [0.0,0.0,0.0]::FLOAT[]`). The copy lands at
    * cosine ≈ √(61/64) ≈ 0.98 of its base but the three dropped
    * elements flip enough hyperplane SIGNS that the single 8-plane
    * bucketing misses ~40% of the pairs (fixture-measured 29/50 at
    * sf0.01), while the 4-table×4-plane multi-table layout finds 49/50
    * — the planted set that makes multi-table recall a graded fact
    * rather than a story (colinear copies co-bucket by construction and
    * can never exercise it). */
  def withNearDups(embeddings: DataFrame): DataFrame =
    withDups(embeddings).unionByName(
      embeddings.where(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(NearDupOffset)).cast("long").as("vec_id"),
          concat(
            slice(col("embedding"), 1, Similarity.Dim - 3),
            array(lit(0.0f), lit(0.0f), lit(0.0f))).as("embedding")))
}
