package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StateStream

/** The generation-pinned DEFAULT entry points of the three dedup serving
  * layouts (minhash / simhash / embdup): `*PairsServing` takes a
  * GENERATIONED layout root, resolves the current generation ONCE, and a
  * fold flipping a new generation through foldIsolatedGen neither
  * changes what an already-constructed read answers (graced bytes) nor
  * leaks a torn artifact mix into a fresh read. The raw-path
  * `*PairsServingQuiesced` variants are the explicit single-writer
  * opt-in — this spec is what makes the contract structural rather than
  * scaladoc (r14 What's-missing #4).
  */
class GenPinnedReadSpec extends AnyFunSuite with graft.SparkFixture {

  private implicit class DfOps(rows: Seq[(Long, String)]) {
    def toDF2(s: org.apache.spark.sql.SparkSession): DataFrame = {
      import s.implicits._
      rows.toDF("doc_id", "text")
    }
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash default entry under a concurrent fold: the pre-resolved " +
      "read answers the pre-fold generation, a fresh read the post-fold") {
    val s = spark
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val pre = Seq((1L, shared), (2L, shared), (3L, "one two three four five six"))
    val post = Seq((1L, shared), (2L, "nine ten eleven twelve thirteen x"),
      (3L, "one two three four five six"))
    val root = graft.TempDirs.create("graft_pin_mh").resolve("layout").toString
    StateStream.publishState(s, root) { stage =>
      Dedup.writeServingLayout(pre.toDF2(s),
        s"${stage.toUri.getPath}/bands", s"${stage.toUri.getPath}/fps")
    }
    // the long-running reader constructs its read from the DEFAULT entry
    // point HERE — generation 1 resolves at construction
    val pinned = Dedup.minhashPairsServing(s, root, pre.toDF2(s))
    // maintenance folds doc 2's revision through the isolated-generation
    // staged copy + flip
    val old2 = pre.toDF2(s).where(col("doc_id") === 2L)
    val new2 = post.toDF2(s).where(col("doc_id") === 2L)
    StateStream.foldIsolatedGen(s, root) { gen =>
      Dedup.minhashServingFold(s, s"$gen/bands", s"$gen/fps", old2, new2)
    }
    // EXECUTED AFTER THE FLIP: the pinned read answers the consistent
    // pre-fold pairs on graced gen-1 bytes
    assert(pairSet(pinned) == Set((1L, 2L)),
      "the pre-resolved default read must answer the pre-fold pair set")
    // a FRESH default read resolves the folded generation
    assert(pairSet(Dedup.minhashPairsServing(s, root, post.toDF2(s))).isEmpty,
      "a fresh default read must answer the post-fold pair set")
  }

  test("simhash default entry under a concurrent fold: consistent (vrows, " +
      "docs) artifact SET per generation — never a torn mix") {
    val s = spark
    val shared = "alpha beta gamma delta"
    val pre = Seq((1L, shared), (2L, shared), (3L, "one two three four"))
    val root = graft.TempDirs.create("graft_pin_sh").resolve("layout").toString
    StateStream.publishState(s, root) { stage =>
      Dedup.simhashWriteServingLayout(pre.toDF2(s),
        s"${stage.toUri.getPath}/vrows", s"${stage.toUri.getPath}/docs")
    }
    val pinned = Dedup.simhashPairsServing(s, root)
    // the fold DELETES doc 2 — under the liveness coupling a torn read
    // would either expand the live shared value to nothing or pair the
    // stale one spuriously; the pinned generation does neither
    val d2 = pre.toDF2(s).where(col("doc_id") === 2L)
    StateStream.foldIsolatedGen(s, root) { gen =>
      Dedup.simhashServingFold(s, s"$gen/vrows", s"$gen/docs",
        d2, d2.where(lit(false)))
    }
    assert(pairSet(pinned) == Set((1L, 2L)),
      "the pre-resolved default read must answer the pre-fold pair set")
    assert(pairSet(Dedup.simhashPairsServing(s, root)).isEmpty,
      "a fresh default read must answer the post-fold pair set")
  }

  test("embdup default entry under a concurrent fold: the generation dir " +
      "IS the vecs artifact") {
    val s = spark
    import s.implicits._
    def vec(seed: Long): Array[Float] =
      Array.tabulate(Similarity.Dim)(j =>
        ((((seed * 1000003L + j) * 2654435761L >>> 13) & 0xffff).toFloat / 65536.0f))
    // 1 and 2 are exact copies (cosine 1); 3 is unrelated
    val pre = Seq((1L, vec(1)), (2L, vec(1)), (3L, vec(3)))
      .toDF("vec_id", "embedding")
    val root = graft.TempDirs.create("graft_pin_ed").resolve("layout").toString
    StateStream.publishState(s, root) { stage =>
      Dedup.embDupWriteServingLayout(pre, stage.toUri.getPath)
    }
    val pinned = Dedup.embDupPairsServing(s, root)
    // the fold re-embeds doc 2 to an unrelated direction
    val old2 = pre.where(col("vec_id") === 2L)
    val new2 = Seq((2L, vec(7))).toDF("vec_id", "embedding")
    StateStream.foldIsolatedGen(s, root) { gen =>
      Dedup.embDupServingFold(s, gen, old2, new2)
    }
    assert(pairSet(pinned) == Set((1L, 2L)),
      "the pre-resolved default read must answer the pre-fold pair set")
    assert(pairSet(Dedup.embDupPairsServing(s, root)).isEmpty,
      "a fresh default read must answer the post-fold pair set")
  }
}
