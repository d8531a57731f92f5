package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class GraphSpec extends AnyFunSuite with SparkFixture {

  /** Local single-threaded reference of the same integer recurrence
    * (map arithmetic, no joins) — an independent implementation path. */
  private def localPageRank(
      edges: Seq[(String, String)], rounds: Int, dampBp: Long = Graph.DefaultDampBp): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = (10000L - dampBp) * 100L
    var r = nodes.map(_ -> Graph.InitRankMicro).toMap
    for (_ <- 1 to rounds) {
      val contrib = edges
        .map { case (s, d) => d -> r(s) / deg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(n => n -> (base + dampBp * contrib.getOrElse(n, 0L) / 10000L)).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], rounds: Int): Map[String, Long] = {
    val s = spark
    import s.implicits._
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("pageRank matches the local integer reference on an undirected path graph") {
    val edges = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    for (rounds <- Seq(1, 3)) {
      assert(run(edges, rounds) == localPageRank(edges, rounds), s"rounds=$rounds")
    }
  }

  test("star center out-ranks the leaves; leaves tie exactly") {
    val leaves = (1 to 6).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq("hub" -> l, l -> "hub"))
    val got = run(edges, 3)
    assert(got == localPageRank(edges, 3))
    val leafRanks = leaves.map(got)
    assert(leafRanks.distinct.size == 1, "symmetric leaves must tie bit-exactly")
    assert(got("hub") > leafRanks.head, "the hub must out-rank its leaves")
  }

  /** Local reference of the weighted integer recurrence. */
  private def localWeightedPageRank(
      edges: Seq[(String, String, Long)], rounds: Int,
      dampBp: Long = Graph.DefaultDampBp): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val wsum = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val base = (10000L - dampBp) * 100L
    var r = nodes.map(_ -> Graph.InitRankMicro).toMap
    for (_ <- 1 to rounds) {
      val contrib = edges
        .map { case (s, d, w) => d -> r(s) * w / wsum(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(n => n -> (base + dampBp * contrib.getOrElse(n, 0L) / 10000L)).toMap
    }
    r
  }

  test("weighted pageRank matches the local reference; heavy edges pull rank") {
    val s = spark
    import s.implicits._
    // hub sends 9/10 of its rank to h, 1/10 to l (and back-edges)
    val edges = Seq(("hub", "h", 9L), ("hub", "l", 1L),
      ("h", "hub", 1L), ("l", "hub", 1L))
    val got = Graph.pageRankWeighted(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == localWeightedPageRank(edges, 3))
    assert(got("h") > got("l"), "the heavy edge's target must out-rank the light one")
    // uniform weights reduce to the unweighted operator exactly
    val uni = Seq(("a", "b", 1L), ("b", "a", 1L), ("b", "c", 1L), ("c", "b", 1L))
    val w1 = Graph.pageRankWeighted(uni.toDF("src", "dst", "w"),
        "src", "dst", "w", rounds = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val u1 = run(uni.map(e => (e._1, e._2)), 3)
    assert(w1 == u1, "weight 1 everywhere == unweighted pageRank")
  }

  /** Brute-force local reference: count triangles by triple enumeration. */
  private def localTriangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct
    val eset = canon.toSet
    val nodes = (canon.map(_._1) ++ canon.map(_._2)).distinct.sorted
    val deg = nodes.map(n => n -> canon.count(p => p._1 == n || p._2 == n).toLong).toMap
    val tris = for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      x = nodes(i); y = nodes(j); z = nodes(k)
      if eset((x, y)) && eset((y, z)) && eset((x, z))
    } yield (x, y, z)
    val perNode = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    nodes.map(n => n -> (deg(n), perNode.getOrElse(n, 0L))).toMap
  }

  private def runTriangles(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    Graph.triangleStats(canon.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("triangleStats: K4 — every node in 3 triangles, coefficient exactly 1") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = runTriangles(k4)
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    got.values.foreach { case (deg, tri, cc) =>
      assert(deg == 3L); assert(tri == 3L); assert(cc == 10000L)
    }
  }

  test("triangleStats: triangle-free graphs report zero with cc 0") {
    // path (deg 2 interior) + star (hub deg 3): wedges exist, triangles don't
    val got = runTriangles(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 10L -> 11L, 10L -> 12L, 10L -> 13L))
    got.values.foreach { case (_, tri, cc) => assert(tri == 0L); assert(cc == 0L) }
  }

  test("triangleStats: two triangles sharing an edge — shared nodes count both") {
    val got = runTriangles(Seq(1L -> 2L, 1L -> 3L, 2L -> 3L, 2L -> 4L, 3L -> 4L))
    assert(got(1L) == ((2L, 1L, 10000L)))
    assert(got(2L) == ((3L, 2L, 6666L))) // 2*20000 div (3*2) truncates
    assert(got(3L) == ((3L, 2L, 6666L)))
    assert(got(4L) == ((2L, 1L, 10000L)))
  }

  test("triangleStats matches the brute-force reference on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2)
    val got = runTriangles(edges)
    val want = localTriangles(edges)
    assert(got.keySet == want.keySet)
    for ((n, (deg, tri)) <- want) {
      val (gd, gt, gcc) = got(n)
      assert(gd == deg, s"deg($n)"); assert(gt == tri, s"tri($n)")
      val wantCc = if (deg >= 2) tri * 20000L / (deg * (deg - 1)) else 0L
      assert(gcc == wantCc, s"cc($n)")
    }
  }

  /** Local reference: peel to the true fixpoint, return in-core degrees. */
  private def localKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(p => p._1 != p._2).distinct
    var alive = (canon.map(_._1) ++ canon.map(_._2)).distinct.toSet
    var changed = true
    var deg = Map.empty[Long, Long]
    while (changed) {
      deg = alive.map(n => n -> canon.count(p =>
        (p._1 == n && alive(p._2)) || (p._2 == n && alive(p._1))).toLong).toMap
      val next = alive.filter(n => deg(n) >= k)
      changed = next != alive
      alive = next
    }
    alive.map(n => n -> deg(n)).toMap
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int, rounds: Int = 8): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    // kCore shares triangleStats' input contract: canonical a < b edges
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    Graph.kCore(canon.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("kCore: a clique survives its own k, the attached tail peels away") {
    // K4 plus a path hanging off node 4: the 3-core is exactly the K4 —
    // peeling the tail takes one round per tail hop (depth > 1 matters)
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val edges = k4 ++ Seq(4L -> 5L, 5L -> 6L, 6L -> 7L)
    val got = runKCore(edges, k = 3)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(got == localKCore(edges, 3))
  }

  test("kCore: cascade — removing one node drags the chain under k") {
    // a triangle chain where each peel exposes the next node: fixpoint
    // only after several rounds, matches the local reference exactly
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 4L, 4L -> 5L,
      3L -> 5L, 5L -> 6L, 6L -> 7L, 5L -> 7L)
    for (k <- 1 to 4) {
      assert(runKCore(edges, k) == localKCore(edges, k), s"k=$k")
    }
  }

  test("kCore: extra rounds past the fixpoint change nothing") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(p => p._1 != p._2)
    val at8 = runKCore(edges, k = 4, rounds = 8)
    val at12 = runKCore(edges, k = 4, rounds = 12)
    assert(at8 == at12)
    assert(at8 == localKCore(edges, 4))
  }

  private def applyBatch(
      oldEdges: Seq[(Long, Long)], batch: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val oldDf = oldEdges.toDF("a", "b")
    Graph.triangleApplyBatch(oldDf, Graph.triangleStats(oldDf), batch.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("triangleApplyBatch: a closing edge folds to exactly the from-scratch stats") {
    // history: path 1-2-3 plus edge 3-4; batch closes triangles 1-2-3 and
    // opens nothing else
    val old = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val batch = Seq(1L -> 3L)
    assert(applyBatch(old, batch) == runTriangles(old ++ batch))
  }

  test("triangleApplyBatch: a multi-new-edge triangle is counted exactly once") {
    // batch alone brings 2 of the 3 edges of (1,2,3) and all 3 of (5,6,7):
    // the smallest-new-edge anchor rule must not double/triple count
    val old = Seq(1L -> 2L)
    val batch = Seq(2L -> 3L, 1L -> 3L, 5L -> 6L, 6L -> 7L, 5L -> 7L)
    assert(applyBatch(old, batch) == runTriangles(old ++ batch))
  }

  test("triangleApplyBatch: replayed and duplicate edges are no-ops") {
    val old = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L)
    // batch re-delivers a known edge and a duplicate new edge
    val batch = Seq(1L -> 2L, 3L -> 4L, 3L -> 4L)
    assert(applyBatch(old, batch) == runTriangles(old ++ batch))
  }

  test("triangleApplyBatch matches from-scratch on seeded random splits") {
    val rnd = new scala.util.Random(11)
    val all = Seq.fill(140)((rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
      .filter(p => p._1 != p._2)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    val (old, batch) = all.splitAt(90)
    assert(applyBatch(old.distinct, batch) == runTriangles(all))
  }

  test("coOccurrenceEdges: shared groups connect, hot groups are skipped and audited") {
    val s = spark
    import s.implicits._
    // g1={1,2,3}, g2={2,3}, g3={3,4,5,6,7} (hot at maxGroupSize=4); dup rows
    val pm = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 2L),
      (2L, 2L), (2L, 3L),
      (3L, 3L), (3L, 4L), (3L, 5L), (3L, 6L), (3L, 7L)).toDF("g", "m")
    val edges = Graph.coOccurrenceEdges(pm, "g", "m", maxGroupSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (1L, 3L), (2L, 3L)), "hot group g3 must not explode")
    val audit = Graph.coOccurrenceAudit(pm, "g", "m", maxGroupSize = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(audit == Set((3L, 5L)), "the skipped group is reported with its size")
  }

  test("warm start on the unchanged graph IS the continued iteration; " +
      "new nodes enter at init and re-rank") {
    val s = spark
    import s.implicits._
    val edges = Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b")
    val df = edges.toDF("src", "dst")
    def ranks(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // same graph: warm-starting 2 rounds from round-3 ranks must equal
    // 5 rounds from scratch — the fold is literally the continued
    // iteration, not an approximation of it
    val prior = Graph.pageRank(df, "src", "dst", rounds = 3)
    assert(ranks(Graph.pageRankWarmStart(df, "src", "dst", prior, rounds = 2))
        == ranks(Graph.pageRank(df, "src", "dst", rounds = 5)))
    // grown graph: a node history never saw seeds at init and still ranks
    val grown = (edges ++ Seq("c" -> "d", "d" -> "c")).toDF("src", "dst")
    val folded = ranks(Graph.pageRankWarmStart(grown, "src", "dst", prior, rounds = 2))
    assert(folded.contains("d") && folded("d") > 0L)
    assert(folded.keySet == Set("a", "b", "c", "d"))
  }

  test("rank forget: the subject's nodes vanish, the fold equals a warm start " +
      "over the survivor graph with the purged seed table") {
    val s = spark
    import s.implicits._
    val edges = Seq("a" -> "b", "b" -> "a", "b" -> "x", "x" -> "b", "x" -> "c", "c" -> "x")
    val df = edges.toDF("src", "dst")
    def ranks(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    val prior = Graph.pageRank(df, "src", "dst", rounds = 3).localCheckpoint(true)
    // the deletion request: node x leaves — its edges AND its stored rank
    val surv = edges.filter { case (a, b) => a != "x" && b != "x" }.toDF("src", "dst")
    val purged = prior.where(org.apache.spark.sql.functions.col("node") =!= "x")
    val folded = ranks(Graph.pageRankWarmStart(surv, "src", "dst", purged, rounds = 2))
    assert(!folded.contains("x"), "a forgotten node must receive no rank at all")
    // node c only ever linked through x: no surviving edges, gone too
    assert(folded.keySet == Set("a", "b"))
    // an UNpurged seed table gives the identical fold (forgotten seeds are
    // unreachable once the edges are gone) — the purge is a state-size
    // contract, not a numeric one
    assert(folded == ranks(Graph.pageRankWarmStart(surv, "src", "dst", prior, rounds = 2)))
  }

  test("directed graph: sources decay to the base rank, dangling sinks just absorb") {
    val edges = Seq("src" -> "sink") // sink has no out-edges (dangling)
    val got = run(edges, 2)
    assert(got == localPageRank(edges, 2))
    // src has no in-edges: exactly the base after any round
    assert(got("src") == (10000L - Graph.DefaultDampBp) * 100L)
    assert(got("sink") > got("src"))
  }
}
