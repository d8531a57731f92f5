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

  test("encode applies trained merges in order; OOV words pass through whole") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merged = BpeTrain.merges(corpus, rounds = 4)
    // after merges es, est, lo, low: "low"->[low], "lower"->[low,e,r]
    // (the low merge applies inside lower too), "newest"->[n,e,w,est],
    // "widest"->[w,i,d,est]
    val enc = BpeTrain.encode(
      Seq((100L, "low lower newest C++"), (101L, "widest")).toDF("doc_id", "text"), merged)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 100: 4 words -> 1 + 3 + 4 + 1(OOV) = 9 subwords
    assert(enc(100L) == ((4L, 9L)), s"got ${enc(100L)}")
    assert(enc(101L) == ((1L, 4L)), s"got ${enc(101L)}")
  }

  test("encode fingerprint is position-exact: reordered docs differ") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "aa bb aa bb")).toDF("doc_id", "text")
    val merged = BpeTrain.merges(corpus, rounds = 1)
    val fps = BpeTrain.encode(
      Seq((1L, "aa bb"), (2L, "bb aa")).toDF("doc_id", "text"), merged)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(fps(1L) != fps(2L), "subword stream fingerprint must be order-sensitive")
  }

  test("pre-tokenization drops non [a-z0-9]+ words, keeps the rest intact") {
    // "C++" and "don't" are filtered; "abc" x2 still trains
    val got = mergesOf(Seq("abc abc C++ don't"), rounds = 1)
    assert(got.toSeq == Seq((1, "a", "b", 2L)), s"got ${got.toSeq}")
  }

  test("vocab coverage counts OOV words per language and fan-out is exact") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "ab ab ab cd", "en"),   // 4 words, all in-vocabulary
      (2L, "C++ ab", "en"),        // 1 OOV + 1 word
      (3L, "don't C++", "fr"))     // all OOV
      .toDF("doc_id", "text", "lang")
    val got = BpeTrain.vocabCoverage(corpus, BpeTrain.merges(corpus, rounds = 1))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // en: 6 words, 1 OOV (C++), merges (a,b) -> "ab" one subword each,
    // cd -> 2 subwords, C++ -> 1: subwords = 4*1 + 2 + 1 = 7
    assert(got("en") == ((6L, 1L, 7L, 10000L * 1 / 6)), s"got ${got("en")}")
    // fr: 2 words, both OOV, 1 subword each, oov_bp exact 10000
    assert(got("fr") == ((2L, 2L, 2L, 10000L)), s"got ${got("fr")}")
  }

  test("decode round-trip is the identity on OOV words, repeated spaces " +
      "and merged subwords alike") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "abab abab cd"), // trains merges; fully in-vocabulary
      (2L, "C++ don't  x"), // OOV lane + a repeated space (empty word)
      (3L, "abab zz9")).toDF("doc_id", "text")
    val out = BpeTrain.decodeRoundTrip(corpus, BpeTrain.merges(corpus, rounds = 2))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    assert(out.size == 3)
    assert(out.values.forall { case (dec, src) => dec == src },
      s"decode(encode(text)) must equal text for every doc, got $out")
  }
}
