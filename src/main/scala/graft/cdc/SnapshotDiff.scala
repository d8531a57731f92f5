package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot CDC derivation — the changelog source for tables
  * WITHOUT a change feed.
  *
  * The reference assumes SQL Server CDC is enabled on every source table
  * (usp_cdc_populate_changelog.sql:183-189); in practice half the tables a
  * reporting pipeline ingests only ever arrive as periodic full snapshots.
  * This operator closes that gap: diff two snapshots of the same table into
  * the SAME column-granular EAV rows the changelog pipeline appends —
  * per-column (old_value, new_value) rows for updates and the reference's
  * record-level sentinels for inserts/deletes ('NEW RECORD' / 'DELETED
  * RECORD', :365-386) — so a snapshot-fed table and a CDC-fed table land in
  * one uniform changelog.
  *
  * Shape at scale: one full outer join on the PK (both sides shuffle once,
  * co-partitioned on the key) + one explode of a per-row array bounded by
  * the compared-column count. No window, no driver-side state; AQE handles
  * a skewed key. Comparison happens on the ERASED string values (the
  * changelog's own value plane), with NULL-safe inequality — unlike the
  * reference's UNPIVOT path, a transition to/from NULL is representable
  * here and is emitted (the batch pipeline only gets those under
  * strictNulls; SURVEY §7.5.1).
  */
object SnapshotDiff {

  /** Diff `before` → `after` on `keyCols`, comparing `compareCols`.
    * Output: erased key columns, column_name, old_value, new_value —
    * column_name NULL on the insert/delete sentinel rows, exactly the
    * changelog's value-plane schema. */
  def diff(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty && keyCols.nonEmpty)
    val b = before.select(
      keyCols.map(k => col(k).cast("string").as(k)) ++
        compareCols.map(c => col(c).cast("string").as(s"__b_$c")) :+
        lit(1).as("__in_b"): _*)
    val a = after.select(
      keyCols.map(k => col(k).cast("string").as(k)) ++
        compareCols.map(c => col(c).cast("string").as(s"__a_$c")) :+
        lit(1).as("__in_a"): _*)
    // USING-join on the keys: Spark coalesces the key columns across sides
    val j = b.join(a, keyCols, "full_outer")
    val keys = keyCols.map(col)

    // ONE pass over the join: every output kind (per-column change rows,
    // delete sentinel, insert sentinel) rides the same guarded-struct
    // array, exploded once — a three-branch UNION would recompute the
    // full outer join per branch (this plan read the source 9 times as a
    // union; it reads it 3 times as one explode)
    val inBoth = col("__in_a").isNotNull && col("__in_b").isNotNull
    val changeStructs = compareCols.map(c =>
      when(inBoth && !(col(s"__b_$c") <=> col(s"__a_$c")),
        struct(lit(c).as("column_name"),
          col(s"__b_$c").as("old_value"),
          col(s"__a_$c").as("new_value"))))
    val delStruct = when(col("__in_a").isNull,
      struct(lit(null).cast("string").as("column_name"),
        lit("DELETED RECORD").as("old_value"),
        lit(null).cast("string").as("new_value")))
    val insStruct = when(col("__in_b").isNull,
      struct(lit(null).cast("string").as("column_name"),
        lit(null).cast("string").as("old_value"),
        lit("NEW RECORD").as("new_value")))
    j.select(keys :+ explode(array(changeStructs :+ delStruct :+ insStruct: _*)).as("__d"): _*)
      .where(col("__d").isNotNull)
      .select(keys :+ col("__d.column_name") :+
        col("__d.old_value") :+ col("__d.new_value"): _*)
  }
}
