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

  test("directed graph: sources decay to the base rank, dangling sinks just absorb") {
    val edges = Seq("src" -> "sink") // sink has no out-edges (dangling)
    val got = run(edges, 2)
    assert(got == localPageRank(edges, 2))
    // src has no in-edges: exactly the base after any round
    assert(got("src") == (10000L - Graph.DefaultDampBp) * 100L)
    assert(got("sink") > got("src"))
  }
}
