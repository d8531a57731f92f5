package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental current-state maintenance — the CDC CONSUMER pattern the
  * changelog exists to serve (the reference's changelog feeds exactly this
  * kind of downstream materialization; usp_cdc_query_data.sql is its read
  * API): a (pk, column)-keyed state table folds each new changelog batch
  * in WITHOUT recomputing history.
  *
  * The state row is a partial aggregate — (last_value, last_change_id,
  * n_changes) per (pk, column) — and [[applyBatch]] is the aggregate's
  * MERGE: union the existing state (weighted by its accumulated count)
  * with the batch's column rows and re-aggregate. One shuffle on the state
  * key per batch, sized by |state ∪ batch|, never by history length —
  * at 100 TB the difference between a bounded nightly job and an
  * ever-growing rescan. Argmax-by-changelog_id makes the fold
  * order-insensitive, and the VALUE columns (last_value, last_change_id)
  * are idempotent-per-id — a replayed batch cannot move them backwards.
  * n_changes, however, is an at-least-once COUNT: sum(__w) counts a
  * replayed row again. When exact counts under replay matter, use
  * [[applyBatchIdempotent]], which drops already-applied rows (changelog
  * ids at or below the state's high-water mark) before merging.
  *
  * Default-mode changelogs only (new_value non-null on column rows) — the
  * same contract as [[ChangelogBuilder.stateWide]] and the state oracle.
  */
object StateMaintain {

  /** State bootstrap: aggregate a changelog (or its first batch) into the
    * long-form state table. ≙ the graded `cdc_state` shape. */
  def stateLong(changelog: DataFrame, keyCols: Seq[String]): DataFrame =
    changelog.where(col("column_name").isNotNull)
      .groupBy((keyCols :+ "column_name").map(col): _*)
      .agg(
        max_by(col("new_value"), col("changelog_id")).as("last_value"),
        max(col("changelog_id")).as("last_change_id"),
        count(lit(1)).as("n_changes"))

  /** [[stateLong]] for STRICT-NULLS changelogs, where column rows may
    * carry NULL new_value (a value→NULL transition — SURVEY §7.5.1): the
    * NULL is encoded as an explicit `sentinel` BEFORE the argmax, because
    * the engines genuinely diverge on NULL argmax values (DuckDB's
    * arg_max skips rows whose value is NULL; Spark's max_by returns the
    * NULL) — the sentinel makes "currently NULL" a first-class, portable
    * state value instead of an engine accident. */
  def stateLongStrict(changelog: DataFrame, keyCols: Seq[String],
      sentinel: String = "<NULL>"): DataFrame =
    changelog.where(col("column_name").isNotNull)
      .groupBy((keyCols :+ "column_name").map(col): _*)
      .agg(
        max_by(coalesce(col("new_value"), lit(sentinel)), col("changelog_id"))
          .as("last_value"),
        max(col("changelog_id")).as("last_change_id"),
        count(lit(1)).as("n_changes"))

  /** CURRENT LIVE ROWS materialization — the MERGE consumer semantics:
    * a key whose LATEST record-level sentinel (by changelog_id) is a
    * delete is GONE from the result (its column history stays in the
    * changelog — that is the audit's job, [[stateLong]] keeps it); a
    * later re-insert resurrects the key. Keys with updates and no
    * sentinel at all are live (updates imply existence).
    *
    * Correct ONLY when a key's delete and its earlier updates commit in
    * DIFFERENT transactions (ids within one transaction order by the
    * value tiebreak, not seqval — the repo-wide id convention); the
    * lifecycle fixture separates phases by construction.
    *
    * One extra aggregate over the SENTINEL rows only (tiny) + a key-level
    * join against the state fold — the delete mask never rescans the
    * column-row bulk. */
  def stateLive(changelog: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dead = changelog.where(col("column_name").isNull)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(
        when(col("old_value") === "DELETED RECORD", 1L).otherwise(0L),
        col("changelog_id")).as("__dead"))
    stateLong(changelog, keyCols)
      .join(dead, keyCols, "left")
      .where(coalesce(col("__dead"), lit(0L)) === 0L)
      .drop("__dead")
  }

  /** Point-in-time ("time travel") state: the long-form state table as it
    * stood at `asOf` — reconstruct any historical version of the source
    * from the same changelog, the query the audit-grid EAV layout exists
    * to answer (the reference exposes only the raw time-range scan,
    * usp_cdc_query_data.sql:49-57; the AS-OF reconstruction is its natural
    * consumer). The bound rides the aggregation's input filter, so
    * Catalyst pushes it to the changelog scan (commit_date partition
    * pruning on a populated sink); the aggregate itself is [[stateLong]]
    * unchanged — one shuffle on (pk, column). */
  def stateAsOf(changelog: DataFrame, keyCols: Seq[String],
      asOf: java.sql.Timestamp): DataFrame =
    stateLong(changelog.where(col("commit_time") <= lit(asOf)), keyCols)

  /** Changelog → SCD-type-2 column history: one row per value EPISODE of
    * a (pk, column), bounded by [valid_from_id, valid_to_id) with an open
    * end (and is_current flag) on the latest — the dimension-history
    * consumer next to the current-state fold. The episode window is
    * PARTITIONED per (pk, column) and ordered by the unique changelog_id,
    * so lead() is total, deterministic, and scale-safe. */
  def columnHistory(changelogWithIds: DataFrame, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((keyCols :+ "column_name").map(col): _*)
      .orderBy(col("valid_from_id"))
    changelogWithIds
      .where(col("column_name").isNotNull)
      .select((keyCols :+ "column_name").map(col) ++ Seq(
        col("new_value").as("value"), col("changelog_id").as("valid_from_id")): _*)
      .withColumn("valid_to_id", lead(col("valid_from_id"), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to_id").isNull, lit(1L)).otherwise(lit(0L)))
  }

  /** Fold one new changelog batch into an existing state table. The state
    * side re-enters the aggregation as a single pseudo-row per key
    * carrying its accumulated weight; the result is bit-identical to
    * re-aggregating the full history (associativity of argmax/max/sum). */
  def applyBatch(state: DataFrame, batch: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keyAndCol = (keyCols :+ "column_name").map(col)
    val fromState = state.select(keyAndCol ++ Seq(
      col("last_value").as("new_value"),
      col("last_change_id").as("changelog_id"),
      col("n_changes").as("__w")): _*)
    val fromBatch = batch.where(col("column_name").isNotNull)
      .select(keyAndCol ++ Seq(col("new_value"), col("changelog_id"), lit(1L).as("__w")): _*)
    fromState.unionByName(fromBatch)
      .groupBy(keyAndCol: _*)
      .agg(
        max_by(col("new_value"), col("changelog_id")).as("last_value"),
        max(col("changelog_id")).as("last_change_id"),
        sum(col("__w")).cast("long").as("n_changes"))
  }

  /** [[applyBatch]] with an exactly-once guard: rows whose changelog_id is
    * at or below the key's already-applied high-water mark are dropped
    * BEFORE the merge, so a replayed (or overlapping) batch leaves the
    * state bit-identical — n_changes included. Costs one extra left join
    * of the batch against the state on the same key the merge shuffles on,
    * so the guard rides the merge's partitioning; batch-sized, never
    * history-sized.
    *
    * REQUIRES id-monotone delivery: "id ≤ HWM ⇔ already applied" only
    * holds when batches arrive in changelog_id order (which the populate
    * pipeline's micro-batches do — ids are assigned monotonically at
    * append, §2.5). Under an ARBITRARY split of history into batches, the
    * guard would misread lower-id rows arriving after higher-id ones as
    * replays; use the plain [[applyBatch]] there (it is split-invariant,
    * just not replay-exact in n_changes). */
  def applyBatchIdempotent(state: DataFrame, batch: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keyAndCol = keyCols :+ "column_name"
    val hwm = state.select(
      (keyAndCol.map(col) :+ col("last_change_id").as("__applied_hwm")): _*)
    val fresh = batch.where(col("column_name").isNotNull)
      .join(hwm, keyAndCol, "left")
      .where(col("__applied_hwm").isNull || col("changelog_id") > col("__applied_hwm"))
      .drop("__applied_hwm")
    applyBatch(state, fresh, keyCols)
  }
}
