package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Apply a column-granular EAV diff back onto a base snapshot — the
  * INVERSE of [[SnapshotDiff.diff]], and the "MERGE" consumer of the
  * reference's changelog conventions: per-column update rows overwrite,
  * 'DELETED RECORD' sentinels remove the key, 'NEW RECORD' sentinels add
  * it (usp_cdc_populate_changelog.sql:365-386). Because the reference's
  * insert sentinel carries NO column values (:377-386), an inserted key
  * reconstructs with NULL payloads — the documented information loss of
  * the sentinel convention, pinned by ApplyChangesSpec's round-trip.
  *
  * Shape at scale: one conditional-aggregate pivot of the diff per key
  * (hash agg, map-side partial), one left-anti join for deletes and one
  * left join for updates — all shuffling on the PK the base is already
  * keyed by; no window, no driver-side state. The whole reconstruction is
  * a fixed three-way plan regardless of history length, because the input
  * contract is "at most one row per (key, column)" — for a raw changelog,
  * reduce it first with [[StateMaintain.stateAsOf]] (which this composes
  * with to give snapshot-AS-OF on a CDC-fed table).
  */
object ApplyChanges {

  /** Reconstruct the after-snapshot (erased value plane) from `base` and a
    * diff with at most one row per (key, column). Output: keyCols +
    * valueCols, all strings; surviving keys carry base values overwritten
    * by the diff, inserted keys carry NULLs. */
  def applyDiff(
      base: DataFrame,
      diff: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty)
    val keys = keyCols.map(col)
    // the diff is consumed by THREE sub-trees (pivot, delete keys, insert
    // keys); as a lazy plan each reference would re-derive it — for a
    // snapshot-diff input that is three full outer joins of the source.
    // Changelog-sized diffs are small relative to the base, so eager
    // localCheckpoint materializes once and the ContextCleaner reclaims
    // the blocks when the result is dropped (the repo-wide pattern).
    val d = diff.localCheckpoint(true)

    val eb = base.select(
      keyCols.map(k => col(k).cast("string").as(k)) ++
        valueCols.map(c => col(c).cast("string").as(c)): _*)

    // per-key pivot of the update rows: a changed flag + the new value per
    // column (the flag distinguishes "updated TO NULL" from "not updated")
    val aggs = valueCols.flatMap(c => Seq(
      max(when(col("column_name") === c, 1L).otherwise(0L)).as(s"__f_$c"),
      max(when(col("column_name") === c, col("new_value"))).as(s"__v_$c")))
    val pivot = d.where(col("column_name").isNotNull)
      .groupBy(keys: _*)
      .agg(aggs.head, aggs.tail: _*)

    val deleted = d.where(col("old_value") === "DELETED RECORD").select(keys: _*)
    val inserted = d.where(col("new_value") === "NEW RECORD").select(keys: _*)

    val survivors = eb
      .join(deleted, keyCols, "left_anti")
      .join(pivot, keyCols, "left")
      .select(keys ++ valueCols.map(c =>
        when(col(s"__f_$c") === 1L, col(s"__v_$c")).otherwise(col(c)).as(c)): _*)

    // inserted keys: the sentinel carries no values (reference :377-386) —
    // NULL payloads unless the diff also carries column rows for the key
    val insertedRows = inserted
      .join(pivot, keyCols, "left")
      .select(keys ++ valueCols.map(c =>
        when(col(s"__f_$c") === 1L, col(s"__v_$c"))
          .otherwise(lit(null).cast("string")).as(c)): _*)

    survivors.unionByName(insertedRows)
  }
}
