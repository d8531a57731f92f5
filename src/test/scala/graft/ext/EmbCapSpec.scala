package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-bucket caps on the embedding pair LISTINGS (single-table and
  * multi-table) — the minhash skew-guard pattern threaded through
  * [[Dedup.embDupPairsFrom]] / [[Dedup.embMultiPairsFrom]]: a bucket
  * past `maxBucket` members is skipped from the quadratic self-join,
  * REPORTED by the companion audit, and identical vectors inside it
  * still pair via the exact (value-keyed) route.
  */
class EmbCapSpec extends AnyFunSuite with graft.SparkFixture {

  // orthonormal basis vectors: identical ⇒ cosine 1, distinct ⇒ cosine 0
  private def e(i: Int): Array[Float] =
    Array.tabulate(4)(j => if (j == i) 1.0f else 0.0f)

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def singleLayout(rows: Seq[(Long, Long, Array[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map { case (b, id, v) => (b, id, v, 1.0d) }
      .toDF("bucket", "id", "v", "nrm")
  }

  test("single-table listing: a planted hot bucket is skipped, audited, " +
      "and its identical vectors still pair via the exact route") {
    // bucket 0: 5 members (> maxBucket 4) — ids 1,2,3 share a vector,
    // 4 and 5 are distinct directions; bucket 1: 2 members, identical
    val stored = singleLayout(Seq(
      (0L, 1L, e(0)), (0L, 2L, e(0)), (0L, 3L, e(0)),
      (0L, 4L, e(1)), (0L, 5L, e(2)),
      (1L, 10L, e(3)), (1L, 11L, e(3))))
    val got = pairs(Dedup.embDupPairsFrom(stored, 0.9, maxBucket = 4))
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)),
      s"skipped bucket must keep exact-dup pairs only, kept bucket joins: $got")
    val audit = Dedup.embDupBucketAudit(stored, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(audit == Set((0L, 5L, "skipped"), (1L, 2L, "joined")),
      s"audit must report the hot bucket: $audit")
    // inert cap: the same layout under the default cap joins everything
    val uncapped = pairs(Dedup.embDupPairsFrom(stored, 0.9))
    assert(got.subsetOf(uncapped) && uncapped.contains((1L, 2L)))
  }

  test("multi-table listing: a hot tbucket is skipped and audited; " +
      "identical vectors re-pair via the registry exact route; a pair " +
      "sharing another kept tbucket survives unchanged") {
    val s = spark
    import s.implicits._
    // tbucket 0 is hot (5 ids > maxBucket 4): ids 1,2 identical vectors,
    // 3,4,5 distinct. ids 1,2 ALSO share kept tbucket 17 (as identical
    // vectors must share every table's bucket) — the union+distinct must
    // not double-emit. tbucket 33: ids 10,11 identical, kept.
    val trows = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L),
      (1L, 17L), (2L, 17L),
      (10L, 33L), (11L, 33L)).toDF("id", "tbucket")
    val vecs = Seq(
      (1L, e(0)), (2L, e(0)), (3L, e(1)), (4L, e(2)), (5L, e(3)),
      (10L, e(1)), (11L, e(1)))
      .map { case (id, v) => (id, v, 1.0d, id % 64) }
      .toDF("id", "v", "nrm", "vbucket")
    val got = pairs(Dedup.embMultiPairsFrom(trows, vecs, 0.9, maxBucket = 4))
    assert(got == Set((1L, 2L), (10L, 11L)),
      s"hot tbucket skipped, exact+kept routes dedup to one pair each: $got")
    val audit = Dedup.embMultiBucketAudit(trows, maxBucket = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(audit == Set((0L, 5L, "skipped"), (17L, 2L, "joined"),
      (33L, 2L, "joined")), s"audit must report the hot tbucket: $audit")
  }
}
