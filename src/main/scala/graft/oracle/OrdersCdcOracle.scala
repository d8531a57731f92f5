package graft.oracle

import graft.cdc.ChangeFeed

/** Oracle instances for the graded CDC queries: the orders feed (default
  * and compat variants) and the composite-key lineitem twin — all driven by
  * the same [[CdcOracle]] generator over the same [[graft.cdc.FeedSpec]]s
  * the Spark side executes.
  */
object OrdersCdcOracle {

  val default = new CdcOracle(ChangeFeed.ordersSpec, Seq("o_orderkey"), "orders")

  /** ≙ compatMode: seqval-less join fan-out + VARCHAR(128) truncation. */
  val compat = new CdcOracle(ChangeFeed.ordersSpec, Seq("o_orderkey"), "orders",
    joinOnSeqval = false, truncate128 = true)

  /** ≙ strictNulls: NULL-transition updates kept via full-outer pairing. */
  val strict = new CdcOracle(ChangeFeed.ordersSpec, Seq("o_orderkey"), "orders",
    fullOuterPairs = true)

  /** Composite primary key (l_orderkey, l_linenumber). */
  val lineitem = new CdcOracle(ChangeFeed.lineitemSpec,
    Seq("l_orderkey", "l_linenumber"), "lineitem")

  /** 72-column BINARY-mask twin (hex-string mask in the oracle, BinaryType
    * + BinaryMaskBit on the Spark side — same big-endian bit addressing). */
  val wide = new CdcOracle(graft.cdc.WideFeed.spec, Seq("o_orderkey"), "orders_wide")

  val changelogSql: String = default.changelogSql

  /** ≙ Forget.forgetKeys(o_orderkey % 97 == 0) over the populated sink:
    * the whole changelog minus every row of the forgotten subjects —
    * surviving ids UNCHANGED (the filter commutes with id assignment
    * precisely because forget never reassigns). */
  val forgetSql: String =
    s"""SELECT changelog_id, commit_time, table_name, o_orderkey,
       |       column_name, old_value, new_value
       |FROM ($changelogSql) c
       |WHERE CAST(o_orderkey AS BIGINT) % 97 <> 0
       |ORDER BY changelog_id""".stripMargin

  /** Forget × state: the per-key fold commutes with whole-subject removal,
    * so the state over the post-forget sink must equal the whole-history
    * state minus the forgotten subjects' rows — n_changes and
    * last_change_id included (ids never reassigned by maintenance). */
  val stateAfterForgetSql: String =
    s"""SELECT * FROM (
       |${default.stateSql}
       |) s WHERE CAST(o_orderkey AS BIGINT) % 97 <> 0
       |ORDER BY o_orderkey, column_name""".stripMargin
  val feedWindowSql: String = default.feedWindowSql
  val maskGateSql: String = default.maskGateSql
  val unpivotStageSql: String = default.unpivotStageSql
  val pairsSql: String = default.pairsSql
  val sentinelsSql: String = default.sentinelsSql
  val windowAggSql: String = default.windowAggSql
  val queryDataSql: String =
    default.queryDataSql("1995-01-01 00:10:00", "1995-01-01 02:00:00")

  /** The sink-backed QueryData.run drive: the engine receives from=00:10 /
    * to=Jan-2 00:00 but the reference truncates BOTH bounds to midnight
    * (usp_cdc_query_data.sql:52-57) — the oracle encodes the truncated
    * range, so the graded row proves the day-granularity semantics. */
  val queryDataSinkSql: String =
    default.queryDataSql("1995-01-01 00:00:00", "1995-01-02 00:00:00")
  val freshnessSql: String = default.freshnessSql

  /** Composite-key twins of the scan-shaped queries (same LSN window /
    * time range as the orders variants, over the lineitem feed). */
  val lineitemFeedWindowSql: String = lineitem.feedWindowSql
  val lineitemQueryDataSql: String =
    lineitem.queryDataSql("1995-01-01 00:10:00", "1995-01-01 02:00:00")

  /** Two-batch incremental-resume oracles. The split point must fall
    * INSIDE the commit-time range at every SF or batch 2 is empty and the
    * drive degenerates to first-run-only: orderkeys are dense from 1, so
    * sf0.001's ~1500 orders span only ~25 minutes of commit time — 00:12
    * splits (and the +1-min compat gap loses rows) at every SF. Lossless
    * default resume loses nothing: its oracle IS the one-batch changelog. */
  val ResumeMid = "1995-01-01 00:12:00"
  val resumeChangelogSql: String = default.changelogSql

  /** ≙ the populate-racing-forget table: the deletion request completed
    * against everything visible at its run (batch 1, commit_time ≤
    * [[ResumeMid]]); batch-2 rows — including a forgotten key's — arrived
    * after it and survive with ids continuing from the PRE-forget offset
    * (ids never reassigned; forgotten ids leave gaps). NB declared BELOW
    * ResumeMid/changelogSql — file-order val initialization (the r7
    * null-interpolation trap). */
  val duringForgetSql: String =
    s"""SELECT changelog_id, commit_time, table_name, o_orderkey,
       |       column_name, old_value, new_value
       |FROM ($changelogSql) c
       |WHERE CAST(o_orderkey AS BIGINT) % 97 <> 0
       |   OR commit_time > TIMESTAMP '$ResumeMid'
       |ORDER BY changelog_id""".stripMargin
  val resumeCompatChangelogSql: String = compat.resumeChangelogSql(ResumeMid, gapMinutes = 1)

  /** ≙ the DPP graded query: busy days (>= half the busiest day's rows —
    * a DATA-dependent dim, so the Spark side can only prune partitions at
    * RUNTIME from the broadcast) joined back to the changelog for
    * per-day count + max id. */
  lazy val dppSql: String =
    s"""WITH cl AS MATERIALIZED (
       |${retention.changelogSql}
       |), counts AS MATERIALIZED (
       |  SELECT CAST(commit_time AS DATE) AS commit_date,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM cl GROUP BY 1
       |), mx AS (SELECT max(c) AS m FROM counts),
       |dim AS (SELECT commit_date FROM counts CROSS JOIN mx WHERE c >= m // 2)
       |SELECT d.commit_date, CAST(count(*) AS BIGINT) AS n,
       |  CAST(max(c2.changelog_id) AS BIGINT) AS max_id
       |FROM cl c2 JOIN dim d ON CAST(c2.commit_time AS DATE) = d.commit_date
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Point-in-time state reconstruction: the AS-OF bound must fall inside
    * the commit-time range at every SF (same constraint as [[ResumeMid]],
    * and the same instant — ~half the sf0.001 feed precedes it). */
  val StateAsOf = ResumeMid
  val stateAsOfSql: String = default.stateAsOfSql(StateAsOf)

  /** TRANSACTION-CONSISTENT cross-table snapshot ≙ cdc_state_multi_asof:
    * BOTH registered changelogs reconstructed as of the SAME commit-time
    * cut (lsn-monotone, so one instant is one LSN cut across tables) and
    * joined on the shared order key — the multi-table read contract a CDC
    * consumer needs for joinable snapshots. Composes the two
    * [[CdcOracle.changelogRowsSql]] chains as nested-WITH CTEs (the
    * era-union precedent) with per-table id assignment, then the as-of
    * state fold per table, then the join. */
  val stateMultiAsOfSql: String =
    s"""WITH clo AS MATERIALIZED (
       |${default.changelogRowsSql}
       |), cll AS MATERIALIZED (
       |${lineitem.changelogRowsSql}
       |), clo_id AS (
       |  SELECT CAST(row_number() OVER (ORDER BY ${default.idOrderOut}) AS BIGINT)
       |           AS changelog_id, *
       |  FROM clo
       |), cll_id AS (
       |  SELECT CAST(row_number() OVER (ORDER BY ${lineitem.idOrderOut}) AS BIGINT)
       |           AS changelog_id, *
       |  FROM cll
       |), so AS (
       |  SELECT o_orderkey,
       |    max(new_value) FILTER (WHERE column_name = 'o_orderstatus') AS o_status,
       |    max(changelog_id) AS o_last_id
       |  FROM (
       |    SELECT o_orderkey, column_name,
       |      arg_max(new_value, changelog_id) AS new_value,
       |      max(changelog_id) AS changelog_id
       |    FROM clo_id
       |    WHERE column_name IS NOT NULL AND commit_time <= TIMESTAMP '$StateAsOf'
       |    GROUP BY o_orderkey, column_name
       |  ) GROUP BY o_orderkey
       |), sl AS (
       |  SELECT l_orderkey, l_linenumber,
       |    max(new_value) FILTER (WHERE column_name = 'l_linestatus') AS l_status,
       |    max(changelog_id) AS l_last_id
       |  FROM (
       |    SELECT l_orderkey, l_linenumber, column_name,
       |      arg_max(new_value, changelog_id) AS new_value,
       |      max(changelog_id) AS changelog_id
       |    FROM cll_id
       |    WHERE column_name IS NOT NULL AND commit_time <= TIMESTAMP '$StateAsOf'
       |    GROUP BY l_orderkey, l_linenumber, column_name
       |  ) GROUP BY l_orderkey, l_linenumber
       |)
       |SELECT CAST(sl.l_orderkey AS BIGINT) AS l_orderkey,
       |  CAST(sl.l_linenumber AS BIGINT) AS l_linenumber,
       |  sl.l_status, sl.l_last_id, so.o_status, so.o_last_id
       |FROM sl LEFT JOIN so ON so.o_orderkey = sl.l_orderkey
       |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Additive schema drift (ChangeFeed.ordersDriftSpec): o_clerk's mask
    * bit is only set for post-[[graft.cdc.ChangeFeed.DriftLsn]]
    * transactions, so the new column_name appears mid-stream with zero
    * sink DDL — the EAV schema-evolution contract. */
  val drift = new CdcOracle(ChangeFeed.ordersDriftSpec, Seq("o_orderkey"), "orders")
  val driftChangelogSql: String = drift.changelogSql

  /** NON-additive drift (ChangeFeed.ordersPreDropSpec/ordersPostDropSpec):
    * o_orderpriority is DROPPED after DropLsn, so era-2 windows run the
    * five-column re-read schema (usp_cdc_populate_changelog.sql:295 —
    * sys.columns is re-read per run; the column silently vanishes from
    * later windows while history keeps its EAV rows). Ids assign over the
    * era union: era-1 commit times all precede era-2's (commit_time is
    * monotone in lsn and the eras split at DropLsn), so the global
    * row_number IS the per-window HWM-offset id sequence. */
  private def eraUnionChangelogSql(pre: CdcOracle, post: CdcOracle): String =
    s"""WITH era1 AS MATERIALIZED (
       |${pre.changelogRowsSql}
       |), era2 AS MATERIALIZED (
       |${post.changelogRowsSql}
       |), unioned AS (
       |  SELECT * FROM era1 UNION ALL SELECT * FROM era2
       |)
       |SELECT CAST(row_number() OVER (ORDER BY ${pre.idOrderOut}) AS BIGINT) AS changelog_id,
       |       commit_time, 'orders' AS table_name, o_orderkey,
       |       column_name, old_value, new_value
       |FROM unioned
       |ORDER BY changelog_id""".stripMargin

  val dropChangelogSql: String = eraUnionChangelogSql(
    new CdcOracle(ChangeFeed.ordersPreDropSpec, Seq("o_orderkey"), "orders"),
    new CdcOracle(ChangeFeed.ordersPostDropSpec, Seq("o_orderkey"), "orders"))

  /** TYPE-change drift (ChangeFeed.ordersPreTypeSpec/ordersPostTypeSpec):
    * o_totalprice re-reads as BIGINT after TypeChangeLsn, so era-2 windows
    * RE-ERASE it integer-rendered while era-1 rows keep the double
    * rendering — the CONVERT at usp_cdc_populate_changelog.sql:271-277
    * applied to whatever type sys.columns reports TODAY. */
  val typeChangelogSql: String = eraUnionChangelogSql(
    new CdcOracle(ChangeFeed.ordersPreTypeSpec, Seq("o_orderkey"), "orders"),
    new CdcOracle(ChangeFeed.ordersPostTypeSpec, Seq("o_orderkey"), "orders"))

  /** RENAME drift (ChangeFeed.ordersPreDropSpec era 1 /
    * ordersPostRenameSpec era 2): sp_rename preserves column_id, so only
    * the STRING in column_name changes across the boundary — era-1 rows
    * say o_orderpriority, era-2 rows o_priority_class, same mask bit,
    * nothing migrates. */
  val renameChangelogSql: String = eraUnionChangelogSql(
    new CdcOracle(ChangeFeed.ordersPreDropSpec, Seq("o_orderkey"), "orders"),
    new CdcOracle(ChangeFeed.ordersPostRenameSpec, Seq("o_orderkey"), "orders"))

  /** ≙ StateMaintain.stateLive over the key-LIFECYCLE fixture
    * (ChangeFeed.ordersLifecyclePhase1/2): the delete-aware MERGE
    * materialization — a key whose latest sentinel is a delete is gone,
    * a re-insert resurrects it. Phase-2 lsns offset by 1,000,000, so the
    * phases are fully commit-time-separated and the global row_number
    * equals the per-phase HWM id sequence. */
  val lifecycleStateLiveSql: String = {
    val p1 = new CdcOracle(ChangeFeed.ordersLifecyclePhase1, Seq("o_orderkey"), "orders")
    val p2 = new CdcOracle(ChangeFeed.ordersLifecyclePhase2, Seq("o_orderkey"), "orders")
    s"""WITH cl0 AS (
       |${eraUnionChangelogSql(p1, p2)}
       |), sent AS (
       |  SELECT o_orderkey,
       |    arg_max(CASE WHEN old_value = 'DELETED RECORD' THEN 1 ELSE 0 END,
       |            changelog_id) AS dead
       |  FROM cl0 WHERE column_name IS NULL GROUP BY o_orderkey
       |), st AS (
       |  SELECT o_orderkey, column_name,
       |    arg_max(new_value, changelog_id) AS last_value,
       |    max(changelog_id) AS last_change_id,
       |    count(*) AS n_changes
       |  FROM cl0 WHERE column_name IS NOT NULL GROUP BY o_orderkey, column_name
       |)
       |SELECT st.o_orderkey, st.column_name, st.last_value, st.last_change_id,
       |       st.n_changes
       |FROM st LEFT JOIN sent ON sent.o_orderkey = st.o_orderkey
       |WHERE coalesce(sent.dead, 0) = 0
       |ORDER BY st.o_orderkey, st.column_name""".stripMargin
  }

  /** Multi-table catalog drive ≙ one CdcCatalog serving BOTH registered
    * changelogs (the reference's deployment shape: one changelog table
    * per source table, resolved by name pattern — usp_cdc_query_data
    * .sql:33-38): the same day-truncated window queried from each, keys
    * projected to a uniform `key_repr` so the two tables union into one
    * report. */
  val queryMultiSql: String = {
    val o = default.queryDataSql("1995-01-01 00:00:00", "1995-01-02 00:00:00")
    val l = lineitem.queryDataSql("1995-01-01 00:00:00", "1995-01-02 00:00:00")
    s"""SELECT * FROM (
       |  SELECT commit_time, table_name, column_name, old_value, new_value,
       |         o_orderkey AS key_repr
       |  FROM ($o)
       |  UNION ALL
       |  SELECT commit_time, table_name, column_name, old_value, new_value,
       |         l_orderkey || '|' || l_linenumber AS key_repr
       |  FROM ($l)
       |)
       |ORDER BY table_name, commit_time, key_repr, column_name NULLS FIRST,
       |         old_value NULLS FIRST, new_value NULLS FIRST""".stripMargin
  }

  /** ≙ cdc_catalog_freshness: the per-table consumer-lag dashboard row —
    * HWM, row count, max id for EVERY changelog registered in the
    * catalog (twin sinks populated at one shared toDate). Rows at or
    * below the toDate bound form a PREFIX of each table's commit_time-led
    * deterministic sort, so the truncated sinks' ids coincide with the
    * full chains' ids filtered at the bound. */
  val catalogFreshnessSql: String =
    s"""WITH clo AS MATERIALIZED (
       |${default.changelogRowsSql}
       |), cll AS MATERIALIZED (
       |${lineitem.changelogRowsSql}
       |), uo AS (
       |  SELECT commit_time,
       |    CAST(row_number() OVER (ORDER BY ${default.idOrderOut}) AS BIGINT)
       |      AS changelog_id
       |  FROM clo
       |), ul AS (
       |  SELECT commit_time,
       |    CAST(row_number() OVER (ORDER BY ${lineitem.idOrderOut}) AS BIGINT)
       |      AS changelog_id
       |  FROM cll
       |), u AS (
       |  SELECT 'orders' AS table_name, commit_time, changelog_id FROM uo
       |  UNION ALL
       |  SELECT 'lineitem' AS table_name, commit_time, changelog_id FROM ul
       |)
       |SELECT table_name, CAST(epoch(max(commit_time)) AS BIGINT) AS hwm_s,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(max(changelog_id) AS BIGINT) AS max_id
       |FROM u WHERE commit_time <= TIMESTAMP '1995-01-03 00:00:00'
       |GROUP BY table_name ORDER BY table_name""".stripMargin

  /** Retention fixture (×64 LSN spacing crosses day boundaries at every
    * SF) with the partition-level sweep at Jan 3 midnight. */
  val retention = new CdcOracle(ChangeFeed.ordersRetentionSpec, Seq("o_orderkey"), "orders")
  val RetentionCutoff = "1995-01-03"
  val retentionSql: String = retention.retentionSql(RetentionCutoff)

  /** Batch split inside the RETAINED window (commit times = base +
    * key×256 s, so Jan 4 splits the post-cutoff days non-trivially at
    * every SF) for the retention × incremental-state graded row. */
  val RetentionStateMid = "1995-01-04 00:00:00"
  val stateAfterRetentionSql: String = retention.stateAfterRetentionSql(RetentionCutoff)

  /** Snapshot-to-snapshot diff ≙ graft.cdc.SnapshotDiff.diff(orders,
    * ChangeFeed.ordersSnapshotAfter(orders)) — full outer join on the PK,
    * per-column EAV rows on NULL-SAFE inequality of the erased values,
    * record-level sentinels for inserts/deletes (the reference's
    * 'NEW RECORD'/'DELETED RECORD' convention,
    * usp_cdc_populate_changelog.sql:365-386). */
  private val SnapCols = Seq("o_orderstatus", "o_totalprice", "o_orderpriority")

  /** Shared CTE chain ending in `d` = the snapshot-diff EAV rows with the
    * NUMERIC coalesced key (`okey`) — consumed by the diff listing AND the
    * apply-diff reconstruction. */
  private val diffCtes: String = {
    val changed = SnapCols.map { c =>
      s"""SELECT coalesce(kb, ka) AS okey, '$c' AS column_name, b_$c AS old_value, a_$c AS new_value
         |  FROM j WHERE kb IS NOT NULL AND ka IS NOT NULL AND b_$c IS DISTINCT FROM a_$c""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""snapb AS (
       |  SELECT o_orderkey,
       |    CASE WHEN o_orderkey % 10 IN (2, 3) THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
       |    CASE WHEN o_orderkey % 10 IN (2, 3) THEN o_totalprice + 1.0 ELSE o_totalprice END AS o_totalprice,
       |    CASE WHEN o_orderkey % 10 = 4 THEN CAST(NULL AS VARCHAR) ELSE o_orderpriority END AS o_orderpriority
       |  FROM orders WHERE o_orderkey % 10 <> 1
       |  UNION ALL
       |  SELECT -o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
       |  FROM orders WHERE o_orderkey % 10 = 0
       |), j AS (
       |  SELECT b.o_orderkey AS kb, a.o_orderkey AS ka,
       |    CAST(b.o_orderstatus AS VARCHAR) AS b_o_orderstatus,
       |    CAST(a.o_orderstatus AS VARCHAR) AS a_o_orderstatus,
       |    CAST(b.o_totalprice AS VARCHAR) AS b_o_totalprice,
       |    CAST(a.o_totalprice AS VARCHAR) AS a_o_totalprice,
       |    CAST(b.o_orderpriority AS VARCHAR) AS b_o_orderpriority,
       |    CAST(a.o_orderpriority AS VARCHAR) AS a_o_orderpriority
       |  FROM orders b FULL OUTER JOIN snapb a ON b.o_orderkey = a.o_orderkey
       |), d AS (
       |  $changed
       |  UNION ALL
       |  SELECT kb AS okey, CAST(NULL AS VARCHAR), 'DELETED RECORD', CAST(NULL AS VARCHAR)
       |  FROM j WHERE ka IS NULL
       |  UNION ALL
       |  SELECT ka AS okey, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'NEW RECORD'
       |  FROM j WHERE kb IS NULL
       |)""".stripMargin
  }

  val snapshotDiffSql: String =
    s"""WITH $diffCtes
       |SELECT CAST(okey AS VARCHAR) AS o_orderkey, column_name, old_value, new_value
       |FROM d
       |ORDER BY okey, column_name NULLS FIRST""".stripMargin

  /** ≙ graft.cdc.ApplyChanges.applyDiff(orders, diff): the inverse of the
    * diff — updates overwrite, DELETED RECORD removes the key, NEW RECORD
    * adds it with NULL payloads (the insert sentinel carries no values,
    * usp_cdc_populate_changelog.sql:377-386). */
  val applyDiffSql: String = {
    val pivots = SnapCols.map { c =>
      s"""max(CASE WHEN column_name = '$c' THEN 1 ELSE 0 END) AS f_$c,
         |    max(CASE WHEN column_name = '$c' THEN new_value END) AS v_$c""".stripMargin
    }.mkString(",\n    ")
    val baseErased = SnapCols.map(c => s"CAST($c AS VARCHAR) AS $c").mkString(", ")
    val survCols = SnapCols.map(c =>
      s"CASE WHEN p.f_$c = 1 THEN p.v_$c ELSE b.$c END AS $c").mkString(",\n    ")
    val insCols = SnapCols.map(c =>
      s"CASE WHEN p.f_$c = 1 THEN p.v_$c END AS $c").mkString(",\n    ")
    s"""WITH $diffCtes, p AS (
       |  SELECT okey,
       |    $pivots
       |  FROM d WHERE column_name IS NOT NULL
       |  GROUP BY okey
       |), be AS (
       |  SELECT o_orderkey AS okey, $baseErased FROM orders
       |), surv AS (
       |  SELECT b.okey,
       |    $survCols
       |  FROM be b LEFT JOIN p ON p.okey = b.okey
       |  WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.old_value = 'DELETED RECORD' AND d.okey = b.okey)
       |), insr AS (
       |  SELECT i.okey,
       |    $insCols
       |  FROM (SELECT okey FROM d WHERE new_value = 'NEW RECORD') i
       |  LEFT JOIN p ON p.okey = i.okey
       |)
       |SELECT CAST(okey AS VARCHAR) AS o_orderkey, ${SnapCols.mkString(", ")}
       |FROM (SELECT * FROM surv UNION ALL SELECT * FROM insr)
       |ORDER BY okey""".stripMargin
  }
}
