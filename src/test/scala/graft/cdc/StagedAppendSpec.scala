package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Journaled (crash-safe) batch publication: every crash point between
  * "batch staged" and "stage swept" must repair back to a sink that is
  * byte-identical to one populated without any crash. */
class StagedAppendSpec extends AnyFunSuite with SparkFixture {

  private val cfg = CdcTableConfig("orders", Seq("k"))

  // batch 1 = Jan 1–2, batch 2 = Jan 3–5 (three commit_date partitions →
  // three destination files → distinct crash points mid-publish)
  private def feed = feedKV(Seq(
    (1L, 0L, 2, 3L, "1995-01-01 08:00:00", "a", "x"),
    (2L, 0L, 2, 3L, "1995-01-02 08:00:00", "b", "y"),
    (3L, 0L, 2, 3L, "1995-01-03 08:00:00", "c", "z"),
    (4L, 0L, 2, 3L, "1995-01-04 08:00:00", "d", "w"),
    (5L, 0L, 1, 3L, "1995-01-05 08:00:00", "a", "x")))

  private def rows(path: String): Seq[(Long, String, String, String)] =
    SinkLayout.read(spark, path)
      .select("changelog_id", "k", "column_name", "new_value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq

  private def populateBoth(path: String, crashAt: Option[Int]): Unit = {
    PopulateChangelog.run(spark, feed, cfg, path, Some(ts("1995-01-02 12:00:00")))
    crashAt match {
      case None =>
        StagedAppend.run(spark, feed, cfg, path, Some(ts("1995-01-06 00:00:00")))
      case Some(at) =>
        val boom = new RuntimeException("injected")
        val thrown = intercept[RuntimeException] {
          StagedAppend.run(spark, feed, cfg, path, Some(ts("1995-01-06 00:00:00")),
            publishHook = i => if (i == at) throw boom)
        }
        assert(thrown eq boom, s"crash injection at $at must fire")
        // recovery = just run the populate again; it self-repairs first
        StagedAppend.run(spark, feed, cfg, path, Some(ts("1995-01-06 00:00:00")))
    }
  }

  private lazy val goldenRows: Seq[(Long, String, String, String)] = {
    val p = Files.createTempDirectory("graft_sa_gold").resolve("c").toString
    populateBoth(p, None)
    rows(p)
  }

  test("crash after the FIRST published file repairs to the no-crash sink") {
    val p = Files.createTempDirectory("graft_sa1").resolve("c").toString
    populateBoth(p, Some(1))
    assert(rows(p) == goldenRows)
  }

  test("crash after the LAST published file (pre-commit) repairs identically") {
    val p = Files.createTempDirectory("graft_sa3").resolve("c").toString
    populateBoth(p, Some(3))
    assert(rows(p) == goldenRows)
    // and the journal is gone: no stage dirs, no manifest
    val fs = SinkLayout.fs(spark, p)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath.getName).filter(_.startsWith("_stage_batch_"))
    assert(leftovers.isEmpty)
  }

  test("torn partial state is invisible to the HWM after repair, not before") {
    val p = Files.createTempDirectory("graft_sa_hwm").resolve("c").toString
    PopulateChangelog.run(spark, feed, cfg, p, Some(ts("1995-01-02 12:00:00")))
    val hwmBefore = Checkpoint.sinkState(spark, p).get
    val boom = new RuntimeException("injected")
    intercept[RuntimeException] {
      StagedAppend.run(spark, feed, cfg, p, Some(ts("1995-01-06 00:00:00")),
        publishHook = i => if (i == 2) throw boom)
    }
    // torn: two of three files visible — the failure mode being repaired
    assert(Checkpoint.sinkState(spark, p).get != hwmBefore)
    assert(StagedAppend.repair(spark, p) == 1)
    assert(Checkpoint.sinkState(spark, p).get == hwmBefore,
      "repair must restore the exact pre-batch HWM and id offset")
    assert(StagedAppend.repair(spark, p) == 0, "repair is idempotent")
  }

  test("no-crash staged populate equals the direct append path") {
    val direct = Files.createTempDirectory("graft_sa_d").resolve("c").toString
    PopulateChangelog.run(spark, feed, cfg, direct, Some(ts("1995-01-02 12:00:00")))
    PopulateChangelog.run(spark, feed, cfg, direct, Some(ts("1995-01-06 00:00:00")))
    assert(goldenRows == rows(direct))
  }

  test("a compaction in the stage→publish window flips the version and " +
      "the publish follows it into the repacked copy") {
    val p = Files.createTempDirectory("graft_sa_cc").resolve("c").toString
    PopulateChangelog.run(spark, feed, cfg, p, Some(ts("1995-01-02 12:00:00")))
    StagedAppend.run(spark, feed, cfg, p, Some(ts("1995-01-06 00:00:00")),
      prePublishHook = () => { Compact.compactSink(spark, p); () })
    assert(SinkLayout.currentVersion(spark, p).contains(1),
      "compaction must have flipped the pointer before the publish")
    assert(rows(p) == goldenRows,
      "the interleaved result must equal the quiesced two-batch sink")
  }

  test("a compaction RACING a mid-rename publish blocks on the writer " +
      "lock — no file of the batch is stranded in the retiring version") {
    val p = Files.createTempDirectory("graft_sa_race").resolve("c").toString
    PopulateChangelog.run(spark, feed, cfg, p, Some(ts("1995-01-02 12:00:00")))
    val started = new java.util.concurrent.CountDownLatch(1)
    @volatile var compactErr: Option[Throwable] = None
    val compactor = new Thread(() => {
      started.await()
      try Compact.compactSink(spark, p)
      catch { case t: Throwable => compactErr = Some(t) }
    })
    compactor.start()
    // the hook fires INSIDE the publish critical section: wake the
    // compactor after the first rename, give it time to hit the lock,
    // then finish the remaining renames. Without the lock the compactor
    // could repack + flip mid-loop and strand files 2..n in data_v0.
    StagedAppend.run(spark, feed, cfg, p, Some(ts("1995-01-06 00:00:00")),
      publishHook = i => if (i == 1) { started.countDown(); Thread.sleep(500) })
    compactor.join(120000)
    assert(!compactor.isAlive, "compactor must finish once the lock frees")
    assert(compactErr.isEmpty, s"compactor failed: $compactErr")
    assert(SinkLayout.currentVersion(spark, p).contains(1))
    assert(rows(p) == goldenRows,
      "every file of the racing batch must survive into the current version")
  }
}
