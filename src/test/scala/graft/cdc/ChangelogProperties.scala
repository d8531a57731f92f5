package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkFixture

/** Property-based invariants of the changelog transform over ARBITRARY
  * feeds (not just the CDC-shaped fixtures): structural identities that
  * must hold whatever the mask/op/value mix is.
  */
object ChangelogProperties extends Properties("changelog") with SparkFixture {

  // Each property runs real Spark jobs; keep the case count modest.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private val cfg = CdcTableConfig("t", Seq("k"))

  private val genRow: Gen[(Long, Long, Int, Long, String, String, String)] = for {
    lsn <- Gen.choose(1L, 20L)
    seq <- Gen.choose(0L, 2L)
    op <- Gen.choose(1, 4)
    mask <- Gen.choose(0L, 3L)
    day <- Gen.choose(1, 28)
    k <- Gen.oneOf("a", "b", "c", "d")
    v <- Gen.oneOf("x", "y", "zz", null)
  } yield (lsn, seq, op, mask, f"1995-01-$day%02d 00:00:00", k, v)

  private val genFeed: Gen[DataFrame] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genRow)).map(rows => feedKV(rows))

  property("build = updatePairs ∪ sentinels, exactly") =
    Prop.forAll(genFeed) { feed =>
      ChangelogBuilder.build(feed, cfg).count() ==
        ChangelogBuilder.updatePairs(feed, cfg).count() +
          ChangelogBuilder.sentinels(feed, cfg).count()
    }

  property("sentinel rows = one per delete/insert feed row") =
    Prop.forAll(genFeed) { feed =>
      ChangelogBuilder.sentinels(feed, cfg).count() ==
        feed.where("operation IN (1, 2)").count()
    }

  property("unpivoted values are never NULL and name real columns") =
    Prop.forAll(genFeed) { feed =>
      val long = ChangelogBuilder.unpivoted(feed, cfg)
      long.where("value IS NULL").count() == 0 &&
        long.where("column_name NOT IN ('k', 'v')").count() == 0
    }

  property("ids are a contiguous 1..N sequence") =
    Prop.forAll(genFeed) { feed =>
      val ids = ChangelogBuilder.withIds(ChangelogBuilder.build(feed, cfg), cfg)
        .select("changelog_id").collect().map(_.getLong(0)).sorted.toSeq
      ids == (1L to ids.length).toSeq
    }

  property("window and distributed id paths agree row-for-row") =
    Prop.forAll(genFeed) { feed =>
      val built = ChangelogBuilder.build(feed, cfg)
      ChangelogBuilder.withIds(built, cfg).collect().toSet ==
        ChangelogBuilder.withIdsDistributed(built, cfg).collect().toSet
    }

  property("strictNulls output is a superset of default-mode pairs") =
    Prop.forAll(genFeed) { feed =>
      val dflt = ChangelogBuilder.updatePairs(feed, cfg).collect().toSet
      val strict = ChangelogBuilder.updatePairs(feed, cfg.copy(strictNulls = true))
        .collect().toSet
      dflt.subsetOf(strict)
    }

  property("every output key value came from the feed") =
    Prop.forAll(genFeed) { feed =>
      val inKeys = feed.select("k").collect().map(_.getString(0)).toSet
      val outKeys = ChangelogBuilder.build(feed, cfg)
        .select("k").collect().map(_.getString(0)).toSet
      outKeys.subsetOf(inKeys)
    }

  property("applyDiff(diff(before, after)) reconstructs after (inserts NULL-payload)") =
    Prop.forAll(genSnapshot, genSnapshot) { (beforeRows, afterRows) =>
      val s = spark
      import s.implicits._
      val before = beforeRows.toDF("k", "a", "b")
      val after = afterRows.toDF("k", "a", "b")
      val d = SnapshotDiff.diff(before, after, Seq("k"), Seq("a", "b"))
      val rebuilt = ApplyChanges.applyDiff(before, d, Seq("k"), Seq("a", "b"))
        .collect().map(r => (r.getString(0), Option(r.getString(1)), Option(r.getString(2))))
        .toSet
      val beforeKeys = beforeRows.map(_._1).toSet
      val want = afterRows.map { case (k, a, b) =>
        // inserted keys reconstruct with NULL payloads — the NEW RECORD
        // sentinel carries no values (reference :377-386)
        if (beforeKeys.contains(k)) (k.toString, a, b)
        else (k.toString, None, None)
      }.toSet
      rebuilt == want
    }

  private val genSnapshot: Gen[List[(Long, Option[String], Option[String])]] = for {
    n <- Gen.choose(0, 12)
    keys <- Gen.pick(n, 0L until 20L)
    vals <- Gen.listOfN(n, Gen.zip(
      Gen.option(Gen.oneOf("x", "y", "z")), Gen.option(Gen.oneOf("p", "q"))))
  } yield keys.toList.zip(vals).map { case (k, (a, b)) => (k, a, b) }

  property("checkpoint split + reunion loses nothing in lossless mode") =
    Prop.forAll(genFeed, Gen.choose(2, 27)) { (feed, splitDay) =>
      feed.count() == 0L || {
        val mid = Timestamp.valueOf(f"1995-01-$splitDay%02d 12:00:00")
        val hi = Timestamp.valueOf("1995-02-01 00:00:00")
        val w1 = Checkpoint.Window(None, mid, fromExclusive = false)
        val w2 = Checkpoint.Window(Some(mid), hi, fromExclusive = true)
        Checkpoint.applyWindow(feed, w1).count() +
          Checkpoint.applyWindow(feed, w2).count() == feed.count()
      }
    }

  // ---- serving bridge: episode range join ≡ brute-force as-of ----------

  /** Random changelog-shaped column rows: (key 1..3, commit offset).
    * Commit seconds may collide WITHIN and across keys — the
    * empty-interval shadowing edge. Ids are assigned in (commit_time,
    * tiebreak) order, mirroring the changelog CONTRACT: the deterministic
    * global sort is commit_time-led, so changelog_id is monotone in
    * commit_time (timedEpisodes orders episodes by ep_id alone and is
    * only defined for in-contract inputs). */
  private val genEpisodeRows: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 12L)))
  } yield rows

  property("enrichAsOf equals the per-request brute-force as-of lookup") =
    Prop.forAll(genEpisodeRows) { rows0 =>
      val s = spark
      import s.implicits._
      val rows = rows0.zipWithIndex
        .sortBy { case ((_, t), i) => (t, i) }
        .zipWithIndex
        .map { case (((k, t), i), id0) =>
          (id0 + 1L, k, s"v$i", graft.cdc.ServingBridge.BaseEpochS + t)
        }
      // changelog shape timedEpisodes expects (string key, as erased)
      val cl = rows
        .map { case (id, k, v, es) =>
          (id, k.toString, "c", v, new Timestamp(es * 1000L))
        }
        .toDF("changelog_id", "k", "column_name", "new_value", "commit_time")
      val eps = ServingBridge.timedEpisodes(cl, "k", "c")
      val requests = (for {
        k <- 1L to 3L; t <- 0L to 13L
      } yield (k * 100 + t, k, graft.cdc.ServingBridge.BaseEpochS + t)).toList
        .toDF("event_id", "serve_key", "serve_s")
      val served = ServingBridge.enrichAsOf(requests, eps)
        .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toMap
      // brute force: per (key, t), the max-id row with commit ≤ t
      val want = (for {
        k <- 1L to 3L; t <- 0L to 13L
      } yield {
        val cand = rows.filter { case (_, rk, _, es) =>
          rk == k && es <= ServingBridge.BaseEpochS + t
        }
        (k * 100 + t,
          if (cand.isEmpty) None else Some(cand.maxBy(_._1)._3))
      }).toMap
      served == want
    }

  /** Random TWO-column changelog rows: (key 1..3, commit offset, column
    * 0|1, value-is-NULL). NULL-setting updates are generated on purpose —
    * the merged-timeline read must serve them as NULL (episode present,
    * value absent), never as the prior value. */
  private val genMultiRows: Gen[List[(Long, Long, Int, Boolean)]] = for {
    n <- Gen.choose(0, 25)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 12L)
      c <- Gen.oneOf(0, 1)
      nul <- Gen.oneOf(true, false)
    } yield (k, t, c, nul))
  } yield rows

  /** Retention read-invisibility as a LAW: for ANY changelog-derived
    * episode timeline and ANY horizon, every request at-or-after the
    * horizon answers identically from the purged and the full store. */
  property("retainEpisodes is invisible to reads at-or-after the horizon") =
    Prop.forAll(genMultiRows, Gen.choose(0L, 13L)) { (rows0, hOff) =>
      val s = spark
      import s.implicits._
      val rows = rows0.zipWithIndex
        .sortBy { case ((_, t, _, _), i) => (t, i) }
        .zipWithIndex
        .map { case (((k, t, c, nul), i), id0) =>
          (id0 + 1L, k.toString, s"c$c",
            if (nul) null else s"v$i",
            new Timestamp((graft.cdc.ServingBridge.BaseEpochS + t) * 1000L))
        }
      val cl = rows
        .toDF("changelog_id", "k", "column_name", "new_value", "commit_time")
        .localCheckpoint(true)
      val eps = ServingBridge.timedEpisodes(cl, "k", "c0").localCheckpoint(true)
      val h = graft.cdc.ServingBridge.BaseEpochS + hOff
      val hFrame = Seq(h).toDF("__h")
      val retained = ServingBridge.retainEpisodes(eps, hFrame)
      val requests = (for {
        k <- 1L to 3L; t <- hOff to 14L // every in-contract instant
      } yield (k * 100 + t, k, graft.cdc.ServingBridge.BaseEpochS + t)).toList
        .toDF("event_id", "serve_key", "serve_s")
      def served(e: org.apache.spark.sql.DataFrame) =
        ServingBridge.enrichAsOf(requests, e)
          .collect().map(r => r.getLong(0) ->
            ((Option(r.get(3)), Option(r.get(4))))).toMap
      served(retained) == served(eps)
    }

  property("enrichAsOfMany (merged timeline) equals per-feature single reads, " +
      "NULL-setting updates served as NULL") =
    Prop.forAll(genMultiRows) { rows0 =>
      val s = spark
      import s.implicits._
      val rows = rows0.zipWithIndex
        .sortBy { case ((_, t, _, _), i) => (t, i) }
        .zipWithIndex
        .map { case (((k, t, c, nul), i), id0) =>
          (id0 + 1L, k.toString, s"c$c",
            if (nul) null else s"v$i",
            new Timestamp((graft.cdc.ServingBridge.BaseEpochS + t) * 1000L))
        }
      val cl = rows
        .toDF("changelog_id", "k", "column_name", "new_value", "commit_time")
        .localCheckpoint(true)
      val eps0 = ServingBridge.timedEpisodes(cl, "k", "c0")
      val eps1 = ServingBridge.timedEpisodes(cl, "k", "c1")
      val requests = (for {
        k <- 1L to 3L; t <- 0L to 13L
      } yield (k * 100 + t, k, graft.cdc.ServingBridge.BaseEpochS + t)).toList
        .toDF("event_id", "serve_key", "serve_s")
      // (value?, ep_id?) per feature — ep_id presence distinguishes a
      // NULL-valued episode from no episode at all
      val multi = ServingBridge.enrichAsOfMany(requests,
          Seq("f0" -> eps0, "f1" -> eps1))
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(3)), Option(r.get(4))),
            (Option(r.get(5)), Option(r.get(6))))).toMap
      def single(eps: DataFrame) = ServingBridge.enrichAsOf(requests, eps)
        .collect().map(r => r.getLong(0) -> ((Option(r.get(3)), Option(r.get(4))))).toMap
      val s0 = single(eps0)
      val s1 = single(eps1)
      multi.keySet == s0.keySet && multi.keySet == s1.keySet &&
        multi.keys.forall(id => multi(id)._1 == s0(id) && multi(id)._2 == s1(id))
    }
}
