package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkFixture

/** Property-based invariants of the analytics operators over random
  * inputs — each checked against an independent driver-side reference. */
object OpsProperties extends Properties("ops") with SparkFixture {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private val genRanges: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 12)
    raw <- Gen.listOfN(n, for {
      lo <- Gen.choose(0L, 120L)
      w <- Gen.choose(0L, 60L)
    } yield (lo, lo + w))
  } yield raw.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }

  private val genPoints: Gen[List[Long]] = for {
    n <- Gen.choose(0, 25)
    ps <- Gen.listOfN(n, Gen.choose(0L, 180L))
  } yield ps.distinct

  property("pointInRange equals the brute-force cross filter for any bucket width") =
    Prop.forAll(genRanges, genPoints, Gen.choose(1L, 50L)) { (ranges, points, w) =>
      val s = spark
      import s.implicits._
      (ranges.isEmpty || points.isEmpty) || {
        val got = RangeJoin.pointInRange(
            points.map(Tuple1(_)).toDF("p"), "p",
            ranges.toDF("range_id", "lo", "hi"), "lo", "hi", w)
          .select("p", "range_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val want = (for {
          p <- points
          (id, lo, hi) <- ranges if p >= lo && p <= hi
        } yield (p, id)).toSet
        got == want
      }
    }

  private val genEvents: Gen[List[(Long, Long, Long, String)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 3L)
      t <- Gen.choose(0L, 50L)
      y <- Gen.oneOf("a", "b", "c", "x")
    } yield (u, t, y))
  } yield rows.zipWithIndex.map { case ((u, t, y), i) => (i.toLong, u, t, y) }

  property("sequentialFunnel equals the one-pass ordered walk per user") =
    Prop.forAll(genEvents) { rows =>
      val s = spark
      import s.implicits._
      rows.isEmpty || {
        val got = Funnel.sequentialFunnel(
            rows.toDF("event_id", "user_id", "t_s", "event_type"),
            "user_id", "t_s", "event_id",
            Seq("a" -> (col("event_type") === "a"),
              "b" -> (col("event_type") === "b"),
              "c" -> (col("event_type") === "c")))
          .collect()
          .map(r => r.getLong(0) -> ((
            Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            r.getLong(4)))).toMap
        val want = rows.groupBy(_._2).map { case (u, evs) =>
          var r1, r2, r3 = Option.empty[Long]
          evs.sortBy(e => (e._3, e._1)).foreach { case (_, _, t, y) =>
            if (y == "a" && r1.isEmpty) r1 = Some(t)
            else if (y == "b" && r1.isDefined && r2.isEmpty) r2 = Some(t)
            else if (y == "c" && r2.isDefined && r3.isEmpty) r3 = Some(t)
          }
          u -> ((r1, r2, r3, Seq(r1, r2, r3).count(_.isDefined).toLong))
        }
        got == want
      }
    }

  property("intervalOverlap equals the brute-force cross filter, each pair exactly once") =
    Prop.forAll(genRanges, genRanges, Gen.choose(1L, 50L)) { (ls, rs, w) =>
      val s = spark
      import s.implicits._
      (ls.isEmpty || rs.isEmpty) || {
        val got = RangeJoin.intervalOverlap(
            ls.toDF("lid", "llo", "lhi"), "llo", "lhi",
            rs.map { case (i, lo, hi) => (i + 1000L, lo, hi) }.toDF("rid", "rlo", "rhi"),
            "rlo", "rhi", w)
          .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toList
        val want = (for {
          (li, llo, lhi) <- ls
          (ri, rlo, rhi) <- rs if llo <= rhi && rlo <= lhi
        } yield (li, ri + 1000L)).toSet
        got.toSet == want && got.length == got.distinct.length
      }
    }

  private val genGrouped: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.choose(-50L, 50L)
    } yield (g, v))
  } yield rows

  private val genBaskets: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(1L, 8L)
      m <- Gen.choose(1L, 6L)
    } yield (g, m))
  } yield rows

  property("basketRules: confidence/support bounds and brute-force pair counts") =
    Prop.forAll(genBaskets) { rows =>
      val s = spark
      import s.implicits._
      rows.isEmpty || {
        val pm = rows.distinct
        val got = Analytics.basketRules(rows.toDF("g", "m"), "g", "m",
            maxGroupSize = 10, minSupport = 1).collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5), r.getLong(6))))
          .toMap
        val singles = pm.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val want = pm.groupBy(_._1).values.toList
          .flatMap(b => for {
            (_, a) <- b; (_, c) <- b if a < c
          } yield (a, c))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        got.keySet == want.keySet && got.forall { case ((a, b), (sup, supBp, ca, cb, _)) =>
          sup == want((a, b)) && supBp <= 10000L &&
            ca <= 10000L && cb <= 10000L && // confidence is a probability
            sup <= math.min(singles(a), singles(b)) // support bounded by singles
        }
      }
    }

  private val genGroupedVals: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.choose(0L, 9L) // narrow range forces ties
    } yield (g, v))
  } yield rows

  property("percentileRanks: strictly-below share in [0, 10000), tie-stable, monotone") =
    Prop.forAll(genGroupedVals) { rows =>
      val s = spark
      import s.implicits._
      val got = Profile.percentileRanks(rows.toDF("g", "v"), "g", "v").collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("v"), r.getAs[Long]("pct_bp")))
      got.forall { case (g, v, bp) =>
        val grp = rows.filter(_._1 == g).map(_._2)
        bp == grp.count(_ < v).toLong * 10000L / grp.size
      }
    }

  property("exactQuantiles picks the sorted-array element at ceil(p*n)") =
    Prop.forAll(genGrouped) { rows =>
      val s = spark
      import s.implicits._
      val got = Analytics.exactQuantiles(rows.toDF("g", "v"), "g", "v").collect()
        .map(r => r.getAs[String]("g") -> (r.getAs[Long]("n_rows"),
          r.getAs[Long]("p50_v"), r.getAs[Long]("p90_v"))).toMap
      rows.groupBy(_._1).forall { case (g, grp) =>
        val sorted = grp.map(_._2).sorted
        val n = sorted.length
        val (q50, q90) = (sorted((n + 1) / 2 - 1), sorted(((n * 9 + 9) / 10) - 1))
        got(g) == ((n.toLong, q50, q90))
      }
    }
}
