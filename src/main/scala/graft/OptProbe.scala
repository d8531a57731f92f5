package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round decomposition harness: times NAMED sub-stages of the
  * expensive graded queries in isolation (noop sink, same methodology as
  * [[Bench]]) so optimization targets the stage that actually costs, not
  * the one that looks expensive. Not a graded query and never part of the
  * bench surface — a measurement tool like [[PlanAudit]].
  *
  * {{{ sbt "runMain graft.OptProbe <target> [passes]" }}}
  */
object OptProbe {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[optprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def sinkTime(label: String, df: => DataFrame): Unit =
    time(label)(df.write.mode("overwrite").format("noop").save())

  def main(args: Array[String]): Unit = {
    val target = args.headOption.getOrElse("dedup_weights")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (p <- 1 to passes) {
      println(s"[optprobe] === $target pass $p ===")
      TempDirs.sweep()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
      run(spark, sfDir, target)
    }
    spark.stop()
  }

  private def run(s: SparkSession, dir: String, target: String): Unit = {
    val c = graft.ext.DocFeed.withDups(s.read.parquet(s"$dir/documents.parquet"))
    target match {
      case "dedup_weights" =>
        val pairs = time("nearDuplicatePairs") {
          graft.ext.Dedup.nearDuplicatePairs(c)
        }
        val labels = time("connectedComponents") {
          graft.ext.Cluster.connectedComponents(pairs)
        }
        sinkTime("assign+weights (rest of query)", {
          val assigned = graft.ext.Cluster.assignFromLabels(c, labels)
          val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
          assigned.join(sizes, Seq("cluster_id"))
        })
        sinkTime("full duplicateWeights+orderBy",
          graft.ext.Cluster.duplicateWeights(c, graft.ext.Dedup.nearDuplicatePairs(c))
            .orderBy("doc_id"))
      case "near_dup_pairs" =>
        // inside nearDuplicatePairs: shingling, signatures, banding, verify
        val raw = time("rawShingles cache+count") {
          val r = graft.ext.Dedup.rawShingles(c).cache()
          r.count()
          r
        }
        sinkTime("minhashSignatures", graft.ext.Dedup.minhashSignatures(raw))
        sinkTime("bandedCandidates via candidatePairs",
          graft.ext.Dedup.candidatePairs(c))
        sinkTime("nearDuplicatePairs total", graft.ext.Dedup.nearDuplicatePairs(c))
        raw.unpersist()
      case "simhash_race" =>
        // mirrors ext_simhash_serving_probe_race's stages over a locally
        // built hist layout (same shapes; fixture-build cost excluded)
        val hist = s.read.parquet(s"$dir/documents.parquet")
        val histState = time("build hist layout (untimed in bench)") {
          val tmp = java.nio.file.Files.createTempDirectory("optprobe_sh")
          graft.ext.Dedup.simhashWriteServingLayout(hist,
            tmp.resolve("vrows").toString, tmp.resolve("docs").toString)
          tmp
        }
        val base = java.nio.file.Files.createTempDirectory("optprobe_shrace")
        val layout = base.resolve("layout").toString
        time("publish (copy state into gen 1)") {
          graft.streaming.StateStream.publishState(s, layout) { stage =>
            val p = java.nio.file.Paths.get(stage.toUri.getPath)
            TempDirs.copyInto(histState.resolve("vrows"), p.resolve("vrows"))
            TempDirs.copyInto(histState.resolve("docs"), p.resolve("docs"))
          }
        }
        val gen1 = graft.streaming.StateStream.statePath(s, layout)
        val batch = c.where(col("doc_id") >= graft.ext.DocFeed.ExactDupOffset)
        sinkTime("probe gen1 (the pre probe)",
          graft.ext.Dedup.simhashServingProbe(s, s"$gen1/vrows", s"$gen1/docs", batch))
        sinkTime("probe gen1 AGAIN (warm twin)",
          graft.ext.Dedup.simhashServingProbe(s, s"$gen1/vrows", s"$gen1/docs", batch))
      case "simhash_probe_stages" =>
        val hist = s.read.parquet(s"$dir/documents.parquet")
        val tmp = java.nio.file.Files.createTempDirectory("optprobe_shp")
        graft.ext.Dedup.simhashWriteServingLayout(hist,
          tmp.resolve("vrows").toString, tmp.resolve("docs").toString)
        val batch = c.where(col("doc_id") >= graft.ext.DocFeed.ExactDupOffset)
        sinkTime("batch simhash() alone", graft.ext.Dedup.simhash(batch))
        sinkTime("valuePairs stage", graft.ext.Dedup.simhashServingValuePairs(
          s, tmp.resolve("vrows").toString, batch))
        sinkTime("candidates stage", graft.ext.Dedup.simhashServingCandidates(
          s, tmp.resolve("vrows").toString, tmp.resolve("docs").toString, batch))
        sinkTime("full probe", graft.ext.Dedup.simhashServingProbe(
          s, tmp.resolve("vrows").toString, tmp.resolve("docs").toString, batch))
      case "embdup" =>
        val e = s.read.parquet(s"$dir/embeddings.parquet")
        val dupd = graft.ext.EmbFeed.withDups(e)
        val tmp = java.nio.file.Files.createTempDirectory("optprobe_ed")
        val vecs = tmp.resolve("vecs").toString
        time("build embdup layout (untimed in bench)") {
          graft.ext.Dedup.embDupWriteServingLayout(dupd, vecs)
        }
        sinkTime("pairs listing (Quiesced)",
          graft.ext.Dedup.embDupPairsServingQuiesced(s, vecs))
        sinkTime("pairs listing again (warm)",
          graft.ext.Dedup.embDupPairsServingQuiesced(s, vecs))
        sinkTime("pairs listing + orderBy",
          graft.ext.Dedup.embDupPairsServingQuiesced(s, vecs).orderBy("id_a", "id_b"))
        val ids = dupd.where(col("vec_id") % 100 === 50).select(col("vec_id"))
        val oldV = dupd.join(ids, Seq("vec_id"), "left_semi")
          .select(col("vec_id"), col("embedding"))
        time("one fold (revise ~1% ids)") {
          graft.ext.Dedup.embDupServingFold(s, vecs, oldV,
            oldV.select(col("vec_id"), reverse(col("embedding")).as("embedding")))
        }
      case "embmulti" =>
        val e = s.read.parquet(s"$dir/embeddings.parquet")
        val nd = graft.ext.EmbFeed.withNearDups(e)
        val tmp = java.nio.file.Files.createTempDirectory("optprobe_edm")
        val trows = tmp.resolve("trows").toString
        val vecs = tmp.resolve("vecs").toString
        time("build multiband layout (untimed in bench)") {
          graft.ext.Dedup.embMultiWriteServingLayout(nd, trows, vecs)
        }
        sinkTime("multiband pairs listing",
          graft.ext.Dedup.embMultiPairsServingQuiesced(s, trows, vecs))
        sinkTime("multiband pairs listing again",
          graft.ext.Dedup.embMultiPairsServingQuiesced(s, trows, vecs))
      case "dpp_test" =>
        // Can a CHECKPOINTED dim side still trigger runtime partition
        // pruning when given a semantically-no-op "likely selective"
        // predicate? If yes, the probes can stop re-deriving their dim
        // sides from raw batch lineage (re-signing the batch per dim).
        val hist = s.read.parquet(s"$dir/documents.parquet")
        val tmp = java.nio.file.Files.createTempDirectory("optprobe_dpp")
        graft.ext.Dedup.simhashWriteServingLayout(hist,
          tmp.resolve("vrows").toString, tmp.resolve("docs").toString)
        val batch = c.where(col("doc_id") === (graft.ext.DocFeed.NearDupOffset + 11L))
        val (vb0, _) = graft.ext.Dedup.simhashServingRows(batch)
        val vb = vb0.localCheckpoint(true)
        val storedV = s.read.schema(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("bv", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("simhash", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("sband", org.apache.spark.sql.types.LongType))))
          .parquet(tmp.resolve("vrows").toString)
        def partsRead(df: DataFrame, label: String): Unit = {
          df.collect()
          def scans(p: org.apache.spark.sql.execution.SparkPlan)
              : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
            p.flatMap {
              case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
              case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
              case _ => Nil
            }
          val fs = scans(df.queryExecution.executedPlan)
            .filter(_.metadata.get("Location").exists(_.contains("vrows")))
          val dpp = df.queryExecution.executedPlan.toString.contains("dynamicpruning")
          println(s"[optprobe] $label partitions read: " +
            fs.map(_.metrics.get("numPartitions").map(_.value)).mkString(",") +
            s" dynamicpruning-in-plan=$dpp")
        }
        // A: the current idiom — lazy dim with batch-filter lineage
        partsRead(storedV.join(broadcast(vb0.select("sband", "band", "bv").distinct()),
          Seq("sband", "band", "bv")), "A lazy-lineage dim")
        // A': the REAL production stage, same session
        partsRead(graft.ext.Dedup.simhashServingValuePairs(
          s, tmp.resolve("vrows").toString, batch), "A' real valuePairs")
        // B: checkpointed dim, no filter
        partsRead(storedV.join(broadcast(vb.select("sband", "band", "bv").distinct()),
          Seq("sband", "band", "bv")), "B checkpointed dim")
        // C: checkpointed dim + no-op selective predicate
        partsRead(storedV.join(broadcast(vb.select("sband", "band", "bv")
            .where(col("sband") >= 0L).distinct()),
          Seq("sband", "band", "bv")), "C checkpointed dim + sband>=0")
      case other =>
        println(s"[optprobe] unknown target $other")
    }
  }
}
