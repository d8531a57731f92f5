package graft.cdc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The incremental-state fold's algebra: batching must be invisible
  * (associativity) and replays must be no-ops (idempotence per id). */
class StateMaintainSpec extends AnyFunSuite with SparkFixture {

  private def changelog(rows: (Long, Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("changelog_id", "k", "column_name", "new_value")
  }

  private def stateRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(1), r.getString(0), r.getString(2),
      r.getLong(3), r.getLong(4))).toSet

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.select("column_name", "k", "last_value", "last_change_id", "n_changes")

  test("two-batch fold equals the one-shot aggregation") {
    val all = changelog(
      (1L, 1L, "v", "a"), (2L, 1L, "v", "b"), (3L, 2L, "v", "x"),
      (4L, 1L, "w", "p"), (5L, 1L, "v", "c"))
    val oneShot = StateMaintain.stateLong(all, Seq("k"))
    val folded = StateMaintain.applyBatch(
      StateMaintain.stateLong(all.where(col("changelog_id") <= 3), Seq("k")),
      all.where(col("changelog_id") > 3), Seq("k"))
    assert(stateRows(byName(folded)) == stateRows(byName(oneShot)))
    // latest value wins, counts accumulate
    val v1 = folded.where(col("k") === 1 && col("column_name") === "v").head()
    assert(v1.getAs[String]("last_value") == "c" && v1.getAs[Long]("n_changes") == 3L)
  }

  test("replaying an already-applied batch cannot move the state backwards") {
    val b1 = changelog((1L, 1L, "v", "a"), (2L, 1L, "v", "b"))
    val state = StateMaintain.stateLong(b1, Seq("k"))
    val replayed = StateMaintain.applyBatch(state, b1, Seq("k"))
    val r = replayed.head()
    // argmax is id-stable: the value stays at the latest id; only the
    // count (an at-least-once artifact, like the reference's re-counts)
    // reflects the replay
    assert(r.getAs[String]("last_value") == "b")
    assert(r.getAs[Long]("last_change_id") == 2L)
  }

  test("applyBatchIdempotent: replayed and overlapping batches leave counts exact") {
    val all = changelog(
      (1L, 1L, "v", "a"), (2L, 1L, "v", "b"), (3L, 2L, "v", "x"), (4L, 1L, "w", "p"))
    val b1 = all.where(col("changelog_id") <= 2)
    val b2 = all.where(col("changelog_id") > 2)
    val state = StateMaintain.stateLong(b1, Seq("k"))
    // full replay of b1 is a NO-OP, n_changes included
    assert(stateRows(byName(StateMaintain.applyBatchIdempotent(state, b1, Seq("k"))))
      == stateRows(byName(state)))
    // an OVERLAPPING redelivery (b1 ∪ b2) folds to the one-shot result
    val overlapped = StateMaintain.applyBatchIdempotent(state, all, Seq("k"))
    assert(stateRows(byName(overlapped))
      == stateRows(byName(StateMaintain.stateLong(all, Seq("k")))))
    // and so does the clean path
    assert(stateRows(byName(StateMaintain.applyBatchIdempotent(state, b2, Seq("k"))))
      == stateRows(byName(StateMaintain.stateLong(all, Seq("k")))))
  }

  test("stateLive drops dead keys, resurrects reinserted ones, keeps sentinel-free keys") {
    val s = spark
    import s.implicits._
    val cl = Seq(
      // key 1: updated, then DELETED in a later txn → gone
      (1L, 1L, Option("v"), Option.empty[String], Option("a")),
      (2L, 1L, None, Option("DELETED RECORD"), None),
      // key 2: deleted, then REINSERTED + updated → live with the new value
      (3L, 2L, None, Option("DELETED RECORD"), None),
      (4L, 2L, None, None, Option("NEW RECORD")),
      (5L, 2L, Option("v"), None, Option("z")),
      // key 3: update-only, no sentinel at all → live
      (6L, 3L, Option("v"), None, Option("q")))
      .toDF("changelog_id", "k", "column_name", "old_value", "new_value")
    val live = StateMaintain.stateLive(cl, Seq("k"))
      .select("k", "column_name", "last_value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(live == Set((2L, "v", "z"), (3L, "v", "q")),
      s"dead key 1 must vanish, key 2 resurrect, key 3 stay, got $live")
    // the audit fold (stateLong) must still keep the dead key's history
    val audit = StateMaintain.stateLong(cl, Seq("k"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(audit == Set(1L, 2L, 3L))
  }
}
