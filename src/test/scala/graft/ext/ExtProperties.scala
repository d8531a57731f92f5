package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkFixture
import graft.functions.TopKByScore.topKByScore

/** Property-based invariants of the EXT operators over random inputs. */
object ExtProperties extends Properties("ext") with SparkFixture {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  // scores quantized to force ties; ids unique
  private val genScored: Gen[List[(Double, Long)]] = for {
    n <- Gen.choose(0, 30)
    scores <- Gen.listOfN(n, Gen.choose(0, 5).map(_ * 0.2))
  } yield scores.zipWithIndex.map { case (s, i) => (s, i.toLong) }

  property("topKByScore equals the sort-based reference, ties and all") =
    Prop.forAll(genScored, Gen.choose(1, 8)) { (rows, k) =>
      val s = spark
      import s.implicits._
      val expected = rows.sortBy { case (sc, id) => (-sc, id) }.take(k).map(_._2)
      val got =
        if (rows.isEmpty) Nil
        else rows.toDF("score", "id").repartition(4)
          .agg(topKByScore(col("score"), col("id"), k).as("ids"))
          .head().getAs[scala.collection.Seq[Long]]("ids").toList
      got == expected
    }

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(0, 25)
    texts <- Gen.listOfN(n, Gen.choose(1, 8).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("the", "a", "el", "und", "spark", "data", "zz"))
        .map(_.mkString(" "))))
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("dropExactDuplicates is idempotent and leaves distinct texts") =
    Prop.forAll(genCorpus) { rows =>
      val s = spark
      import s.implicits._
      val df = rows.toDF("doc_id", "text")
      val once = Dedup.dropExactDuplicates(df)
      val texts = once.select("text").collect().map(_.getString(0))
      texts.length == texts.distinct.length &&
        Dedup.dropExactDuplicates(once).count() == once.count()
    }

  property("curation funnel counts never increase stage-over-stage") =
    Prop.forAll(genCorpus) { rows =>
      val s = spark
      import s.implicits._
      val counts = Curate.stages(rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("g"))
        .withColumn("n_chars", length(col("text"))),
        Curate.Thresholds(minTokens = 1, maxTokens = 6))
        .map(_._2.count())
      counts.zip(counts.tail).forall { case (a, b) => b <= a }
    }

  property("frameSample with stride == frameBytes reconstructs the payload") =
    Prop.forAll(Gen.choose(1, 64), Gen.choose(1, 8)) { (len, frame) =>
      val s = spark
      import s.implicits._
      val payload = Array.tabulate(len)(_.toByte)
      val frames = Seq(Tuple1(payload)).toDF("payload")
        .select(MultiModal.frameSample(col("payload"), frame, frame).as("f"))
        .head().getAs[scala.collection.Seq[Array[Byte]]]("f")
      frames.toArray.flatten.toSeq == payload.toSeq
    }
}
