package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** BPE training semantics on hand-computed corpora: the classic
  * low/lower/newest/widest example (merge order fully derivable by hand),
  * the greedy left-to-right application order on overlapping pairs, and
  * pre-tokenization of non-word symbols. */
class BpeTrainSpec extends AnyFunSuite with SparkFixture {

  private def mergesOf(texts: Seq[String], rounds: Int) = {
    val s = spark
    import s.implicits._
    BpeTrain.merges(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"), rounds)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
  }

  test("classic corpus: low/lower/newest/widest merge order is exact") {
    // word counts: low x5, lower x2, newest x6, widest x3
    // round 1: (e,s)=9 ties (s,t)=9 -> s1 tiebreak keeps (e,s)
    // round 2: (es,t)=9; round 3: (l,o)=7 ties (o,w)=7 -> (l,o)
    // round 4: (lo,w)=7
    val corpus = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest")
    val got = mergesOf(corpus, rounds = 4)
    assert(got.toSeq == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L)), s"got ${got.toSeq}")
  }

  test("overlapping pairs: greedy left-to-right application, counts include overlaps") {
    // "aaaa": pair (a,a) occurs at 3 adjacent positions; applying the
    // merge greedily left-to-right yields [aa, aa], so round 2 merges
    // (aa,aa) once — the order real BPE applies merges in
    val got = mergesOf(Seq("aaaa"), rounds = 2)
    assert(got.toSeq == Seq((1, "a", "a", 3L), (2, "aa", "aa", 1L)), s"got ${got.toSeq}")
  }

  test("pre-tokenization drops non [a-z0-9]+ words, keeps the rest intact") {
    // "C++" and "don't" are filtered; "abc" x2 still trains
    val got = mergesOf(Seq("abc abc C++ don't"), rounds = 1)
    assert(got.toSeq == Seq((1, "a", "b", 2L)), s"got ${got.toSeq}")
  }
}
