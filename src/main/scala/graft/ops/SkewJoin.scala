package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY §7.5.8).
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — prefer it and
  * reach for manual salting only when a single key dominates beyond what
  * partition splitting can fix (splitting divides a partition's FILES;
  * one giant key inside one file still lands on one task for sort-merge).
  *
  * Salting spreads the skewed side across `salt` sub-keys using
  * deterministic entropy from the row itself, and replicates the other
  * (smaller) side `salt` times so every sub-key finds its match. Result
  * is exactly the plain inner equi-join, with the hot key's work spread
  * over `salt` tasks at the cost of a `salt`× blow-up of the small side.
  */
object SkewJoin {

  /** @param skewed     the large, skew-prone side
    * @param other      the smaller side (replicated `salt`×)
    * @param keys       equi-join key columns
    * @param salt       fan-out factor for hot keys
    * @param saltSource column providing per-row entropy on the skewed side
    *                   (a unique id, or any high-cardinality column) —
    *                   deterministic, so the join stays reproducible
    */
  def saltedInnerJoin(
      skewed: DataFrame,
      other: DataFrame,
      keys: Seq[String],
      salt: Int,
      saltSource: Column): DataFrame = {
    require(salt > 0)
    val l = skewed.withColumn("__salt", pmod(hash(saltSource), lit(salt)))
    val r = other.withColumn("__salt", explode(array((0 until salt).map(lit(_)): _*)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
