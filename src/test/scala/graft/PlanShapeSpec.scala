package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale properties PlanAudit reports,
  * locked as assertions so a refactor can't silently reintroduce a
  * scale-killer (extra scans, a lost broadcast, a single-partition window
  * in the distributed path, or the map-side top-k reduction).
  */
class PlanShapeSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  /** File scans of an EXECUTED adaptive plan — descends through
    * materialized query stages and reused exchanges (a plain `collect`
    * over the plan tree does not enter them). */
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scansOf(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        scansOf(r.child)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case _ => Nil
    }

  test("flagship changelog reads the feed source at most twice") {
    val scans = "Scan parquet".r.findAllIn(plan("cdc_changelog")).length
    assert(scans <= 2, s"pairs (1 agg pass) + sentinels (1 filtered scan), got $scans scans")
  }

  test("distributed-id changelog has no Window operator at all") {
    assert(!plan("cdc_changelog_dist").contains("Window"),
      "the scale path must not funnel the batch through a single-partition window")
  }

  test("wide-mask changelog gates through the codegen binary_mask_bit expression") {
    val p = plan("cdc_changelog_wide_mask")
    assert(p.contains("binary_mask_bit"),
      "the >64-column mask must dispatch to the BinaryType codegen path")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"same two-pass shape as the flagship changelog, got $scans scans")
  }

  test("star rollup broadcasts all three dimensions") {
    val b = "BroadcastHashJoin".r.findAllIn(plan("ext_star_agg")).length
    assert(b >= 3, s"expected 3 broadcast joins, got $b")
  }

  test("top-k similarity reduces map-side via partial bounded-heap aggregation") {
    assert(plan("ext_topk_cosine").contains("partial_top_k_by_score"),
      "the exchange must carry O(queries x k), not every scored pair")
  }

  test("update pairing is an aggregation, not a self-join, in default mode") {
    val p = plan("cdc_update_pairs")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "default-mode pairing is a single-pass conditional aggregation")
  }

  test("self as-of join reads its source exactly once") {
    val scans = "Scan parquet".r.findAllIn(plan("ext_asof")).length
    assert(scans == 1, s"probe and mark roles must come from one scan, got $scans")
  }

  test("curation funnel is one scan / one window pass") {
    val p = plan("ext_curation_funnel")
    val scans = "Scan parquet".r.findAllIn(p).length
    val windows = p.linesIterator.count(_.matches(".*\\bWindow\\b.*"))
    assert(scans == 1 && windows == 1,
      s"cumulative-flag funnel: got $scans scans, $windows windows")
  }

  test("bucketed co-located join merges without shuffling the join key") {
    val p = plan("ext_bucketed_join")
    assert(p.contains("SortMergeJoin"), "merge strategy must be in effect")
    assert(!p.contains("hashpartitioning(o_orderkey"),
      "bucket alignment must eliminate the join-key exchange")
  }

  test("interval join carries a real key condition, not a trivially-true one") {
    // both graded inputs derive from one events frame; the aliased-refs
    // construction must keep user_id = user_id as a genuine cross-side
    // equality (optimizer: a join key, not an eliminated tautology)
    val joined = SparkEntry.queries("ext_interval_join")(spark, dir)
    val conds = joined.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.condition
    }.flatten
    assert(conds.nonEmpty, "expected a Join node with a condition")
    val cond = conds.head.toString
    // the key equality survives as user_id#X = user_id#Y with DISTINCT expr ids
    val ids = "user_id#(\\d+)".r.findAllMatchIn(cond).map(_.group(1)).toSet
    assert(ids.size >= 2, s"key condition must reference both sides' user_id, got: $cond")
  }

  test("composite changelog computes the key dedup once, not per sub-tree") {
    // build() consumes the feed from two sub-trees (pairs + sentinels);
    // with materializeDedup the dedup aggregate runs once at checkpoint
    // time, so the executed plan shows NO dedup shuffle at all — both
    // sub-trees read the checkpointed RDD.
    val p = plan("cdc_changelog_composite")
    assert(!p.contains("Scan parquet"),
      "both sub-trees must read the materialized dedup, not re-scan lineitem")
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 2,
      "pairs + sentinels should each read the checkpointed dedup")
  }

  test("sink time-range scan prunes commit_date partitions at the source") {
    // QueryData's day-granularity bounds must surface as PARTITION filters
    // on the commit_date-partitioned sink (the index-range-scan analog at
    // scale), not as post-scan row filters alone
    val plan = SparkEntry.queries("cdc_query_data_sink")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*commit_date".r.findFirstIn(plan).isDefined,
      s"expected commit_date partition pruning in the sink scan")
  }

  test("data-dependent dim join prunes sink partitions DYNAMICALLY") {
    // the busy-day dim has no static commit_date predicate, so pruning
    // can only come from the broadcast side at runtime — the fact scan
    // must carry a dynamicpruningexpression partition filter
    val plan = SparkEntry.queries("cdc_query_dpp")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      "expected runtime partition pruning from the broadcast dim")
  }

  test("IVF serving read prunes cell partitions DYNAMICALLY from the probe side") {
    // the serving-layout index is parquet-partitioned by cell; the probe
    // assignment (broadcast query side) must reach the scan as a runtime
    // partition filter so only nprobe/numCentroids of the index is read
    val plan = SparkEntry.queries("ext_ann_ivf_pruned")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(plan).isDefined,
      "expected a dynamicpruning partition filter on the cell-partitioned index scan")
  }

  test("BM25 serving read prunes postings buckets DYNAMICALLY from the query side") {
    // the serving postings are parquet-partitioned by term bucket; the
    // broadcast query terms must reach the scan as a runtime partition
    // filter so only the query's buckets are read
    val plan = SparkEntry.queries("ext_bm25_pruned")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(plan).isDefined,
      "expected a dynamicpruning partition filter on the bucket-partitioned postings scan")
  }

  test("serving point read prunes episode buckets AT RUNTIME, not just in the plan string") {
    // the persisted episode store is parquet-partitioned by key bucket;
    // the broadcast request slice must reach the scan as a runtime
    // partition filter. The plan STRING contains `dynamicpruning#N` even
    // when the adaptive subquery collapses to DynamicPruningExpression
    // (true) at execution (the r12 right-outer hole) — so this lock
    // EXECUTES the query and asserts the scan's pruning METRICS: the
    // slice's serve keys are all even (event_id % 20 = 0 pins the
    // residue CASE to 2), so at most the 8 even buckets of 16 may be
    // read; a degenerated filter reads all 16.
    val df = SparkEntry.queries("ext_cdc_serving_pruned")(spark, dir)
    df.collect()
    val scans = scansOf(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("episodes")))
    assert(scans.nonEmpty, "expected episode-store scans in the executed plan")
    scans.foreach { f =>
      val read = f.metrics.get("numPartitions").map(_.value)
      assert(read.exists(_ <= 8),
        s"episode scan must runtime-prune to the slice's (even) buckets, " +
          s"read $read of 16")
    }
  }

  test("LSH serving probe prunes band AND fp buckets AT RUNTIME from the batch side") {
    // the dedup index's serving layout is parquet-partitioned by band
    // bucket (bands/) and fp bucket (fps/); the probe's own band /
    // fingerprint rows are the genuine BUILD side of both inner joins
    // (the real-lock shape — contrast the r12 right-outer hole). The
    // graded row checkpoints the candidate stage, so the lock executes
    // the stage DIRECTLY (same code path) with a 1-doc batch and reads
    // the scans' runtime pruning metrics: one doc emits NumBands = 4
    // band rows (≤ 4 of 16 band buckets) and 1 fingerprint row (1 of 16
    // fp buckets); a missing or degenerated runtime filter reads every
    // populated bucket.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = TempDirs.create("graft_mh_lock")
    val bandsPath = base.resolve("bands").toString
    val fpsPath = base.resolve("fps").toString
    graft.ext.Dedup.writeServingLayout(docs, bandsPath, fpsPath)
    // one planted EXACT copy: its base twin guarantees a candidate, so
    // AQE cannot collapse the stage to EmptyRelation (which would erase
    // the scans — and their metrics — from the final plan)
    val batch = graft.ext.DocFeed.withDups(docs)
      .where(org.apache.spark.sql.functions.col("doc_id") ===
        (graft.ext.DocFeed.ExactDupOffset + 10L))
    val cand = graft.ext.Dedup.minhashServingCandidates(
      spark, bandsPath, fpsPath, batch)
    cand.collect()
    def prunedTo(tag: String, bound: Long): Unit = {
      val scans = scansOf(cand.queryExecution.executedPlan)
        .filter(_.metadata.get("Location").exists(_.contains(tag)))
      assert(scans.nonEmpty, s"expected $tag scans in the executed plan")
      scans.foreach { f =>
        val read = f.metrics.get("numPartitions").map(_.value)
        assert(read.exists(_ <= bound),
          s"$tag scan must runtime-prune to the probe's buckets, read $read")
      }
    }
    prunedTo("bands", 4L)
    prunedTo("fps", 1L)
  }

  test("SimHash serving probe prunes value-band AND membership buckets AT RUNTIME") {
    // the value-granularity layout: a 1-doc probe touches ≤ 4 of 16 band
    // buckets of the value table and a handful of membership buckets
    // (its own value + any candidate partner values). The probe doc is a
    // planted NEAR dup, so a hamming-distant-but-close partner value
    // keeps BOTH the cross branch (vrows scan) and the equal/expansion
    // branch (docs scan) alive through AQE
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = TempDirs.create("graft_sh_lock")
    val vrowsPath = base.resolve("vrows").toString
    val docsPath = base.resolve("docs").toString
    graft.ext.Dedup.simhashWriteServingLayout(docs, vrowsPath, docsPath)
    val batch = graft.ext.DocFeed.withDups(docs)
      .where(org.apache.spark.sql.functions.col("doc_id") ===
        (graft.ext.DocFeed.NearDupOffset + 11L))
    def prunedTo(df: org.apache.spark.sql.DataFrame, tag: String, bound: Long): Unit = {
      val scans = scansOf(df.queryExecution.executedPlan)
        .filter(_.metadata.get("Location").exists(_.contains(tag)))
      assert(scans.nonEmpty, s"expected $tag scans in the executed plan")
      scans.foreach { f =>
        val read = f.metrics.get("numPartitions").map(_.value)
        assert(read.exists(_ <= bound),
          s"$tag scan must runtime-prune to the probe's buckets, read $read")
      }
    }
    // the VALUE-PAIR stage (exposed lazily — the full probe materializes
    // it): the value-table scan reads ≤ the probe doc's 4 band buckets
    val vp = graft.ext.Dedup.simhashServingValuePairs(spark, vrowsPath, batch)
    assert(vp.collect().nonEmpty, "the near-dup probe must surface value pairs")
    prunedTo(vp, "vrows", 4L)
    // the full probe's membership read is STATICALLY pruned to the
    // candidate values' buckets; the fan-out is candidate-driven (13 of
    // 16 at this fixture's documented hamming density), so the
    // non-vacuous lock is STRICTLY FEWER than all 16 — a missing filter
    // reads every bucket
    val cand = graft.ext.Dedup.simhashServingCandidates(
      spark, vrowsPath, docsPath, batch)
    assert(cand.collect().nonEmpty, "the near-dup probe must surface candidates")
    prunedTo(cand, "docs", 15L)
  }

  test("embedding near-dup probe prunes vector buckets AT RUNTIME from the batch side") {
    // the per-vector layout is parquet-partitioned by the hyperplane
    // bucket; a 1-vector probe (a planted scaled copy — same direction,
    // same bucket, cosine 1 with its base keeps AQE from collapsing the
    // stage) must read exactly its one bucket
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = TempDirs.create("graft_ed_lock")
    val path = base.resolve("vecs").toString
    graft.ext.Dedup.embDupWriteServingLayout(e, path)
    val batch = graft.ext.EmbFeed.withDups(e)
      .where(org.apache.spark.sql.functions.col("vec_id") ===
        (graft.ext.EmbFeed.DupOffset + 20L))
    val probe = graft.ext.Dedup.embDupServingProbe(spark, path, batch)
    assert(probe.collect().nonEmpty, "the planted copy must pair with its base")
    val scans = scansOf(probe.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("vecs")))
    assert(scans.nonEmpty, "expected layout scans in the executed plan")
    scans.foreach { f =>
      val read = f.metrics.get("numPartitions").map(_.value)
      assert(read.exists(_ <= 1),
        s"the 1-vector probe must read exactly its bucket, read $read")
    }
  }

  test("multi-table near-dup probe prunes (table, bucket) AND registry " +
      "buckets AT RUNTIME") {
    // the band index is parquet-partitioned by tbucket (4 tables × 16
    // buckets); a 1-vector probe emits exactly 4 band rows (one per
    // table), so the candidate stage must read ≤ 4 of the 64 tbucket
    // partitions. The registry read in the full probe is STATICALLY
    // pruned to the candidates' id buckets — few for one probe vector
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = TempDirs.create("graft_edm_lock")
    val trowsPath = base.resolve("trows").toString
    val vecsPath = base.resolve("vecs").toString
    graft.ext.Dedup.embMultiWriteServingLayout(e, trowsPath, vecsPath)
    // a planted zero-tail NEAR dup: close enough to pair (keeps AQE from
    // collapsing the stage) but non-colinear — the multi-table case
    val batch = graft.ext.EmbFeed.withNearDups(e)
      .where(org.apache.spark.sql.functions.col("vec_id") ===
        (graft.ext.EmbFeed.NearDupOffset + 20L))
    def prunedTo(df: org.apache.spark.sql.DataFrame, tag: String, bound: Long): Unit = {
      val scans = scansOf(df.queryExecution.executedPlan)
        .filter(_.metadata.get("Location").exists(_.contains(tag)))
      assert(scans.nonEmpty, s"expected $tag scans in the executed plan")
      scans.foreach { f =>
        val read = f.metrics.get("numPartitions").map(_.value)
        assert(read.exists(_ <= bound),
          s"$tag scan must prune to the probe's buckets, read $read")
      }
    }
    val cand = graft.ext.Dedup.embMultiServingCandidates(spark, trowsPath, batch)
    assert(cand.collect().nonEmpty, "the planted near dup must surface a candidate")
    prunedTo(cand, "trows", 4L)
    // the registry read is CANDIDATE-derived: a 1-vector probe in 4
    // COARSE 4-bit tables fans out to ~4×(n/16) candidate ids, whose
    // id-hash buckets legitimately cover most of the 64 at fixture
    // density (~58 observed) — the non-vacuous lock is STRICTLY FEWER
    // than all 64 (the simhash membership-read precedent): a
    // degenerated partitionIn literal reads every one
    val probe = graft.ext.Dedup.embMultiServingProbe(
      spark, trowsPath, vecsPath, batch)
    assert(probe.collect().nonEmpty, "the planted near dup must pair with its base")
    prunedTo(probe, "vecs", 63L)
  }

  test("compressed-index read prunes code partitions DYNAMICALLY from the probe side") {
    // the IVF-PQ codes are parquet-partitioned by coarse cell; the
    // broadcast ADC table's probe assignment must reach the codes scan
    // as a runtime partition filter
    val plan = SparkEntry.queries("ext_ann_ivfpq_pruned")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*dynamicpruning".r.findFirstIn(plan).isDefined,
      "expected a dynamicpruning partition filter on the code-partitioned scan")
  }

  test("containment join never degenerates into a nested-loop product") {
    val p = plan("ext_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "prefix-probe candidates must join on the shingle key, never all-pairs")
    // the ranking windows are PARTITIONED per doc — no global funnel
    // (an empty partition spec prints as "windowspecdefinition(" with the
    // order expression first; partitioned ones lead with the doc id)
    assert("windowspecdefinition\\(__df".r.findFirstIn(p).isEmpty,
      "rarity ranking must partition by doc id, not run globally")
  }

  test("chunking is map-only: no exchange below the graded sort") {
    // the operator itself (before the presentation orderBy) must not
    // shuffle — chunk extraction is per-row column work
    val p = graft.ext.TextOps.chunkWindows(
      graft.ext.DocFeed.withDups(spark.read.parquet(s"$dir/documents.parquet")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunkWindows must be map-only, got:\n$p")
  }

  test("k-means assignment scans the corpus once per round, not per round squared") {
    // 2 rounds + final assign = 3 corpus passes; the checkpointed
    // centroids keep earlier rounds out of later plans (the InMemory /
    // checkpoint scan replaces the replanted lineage)
    val p = graft.ext.Similarity.kmeansAssign(
      spark.read.parquet(s"$dir/embeddings.parquet"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 1, s"the final assign must reference checkpointed centroids, got $scans scans")
  }

  test("span removal joins on keys only and never windows globally") {
    val p = plan("ext_span_removal")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "coverage must flow dup-start -> bounded explode -> equi-join, never all-pairs")
    assert(!p.contains("windowspecdefinition"),
      "ordered reassembly is a per-doc sort_array, not a window")
  }

  test("histogram sketch windows run over the merged sketch, partitioned by lang") {
    val p = plan("ext_hist_quantile")
    // both cumulative windows must lead with the lang partition key — a
    // global (single-partition) window would print the order expression
    // first inside windowspecdefinition(
    assert("windowspecdefinition\\((bin|__)".r.findFirstIn(p).isEmpty,
      "cumulative counts must partition by lang, not funnel globally")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 1, s"one corpus pass builds the partials, got $scans scans")
  }

  test("domain drift is sparse: no domains x vocab product, joins are equi-joins") {
    val p = plan("ext_domain_drift")
    assert(!p.contains("CartesianProduct"),
      "absent-token terms must come from the broadcast K constant, not a dense cross frame")
    // The only nested-loop joins allowed are the 1-row broadcast scalars:
    // n (replanted under both the main join and the K aggregate) and K.
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnl <= 3, s"only the n and K scalar broadcasts may nest-loop, got $bnl")
  }

  test("ivf recall curve runs ONE clustering/index/assignment for all probe budgets") {
    val df = SparkEntry.queries("ext_ivf_recall_curve")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 14,
      s"per-budget re-clustering would triple the exchange count, got $exchanges")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 4,
      s"truth + train + index + query sides only — re-derived curves re-scan, got $scans")
  }

  test("serving as-of join broadcasts the episode dimension, never shuffles the stream") {
    val p = plan("ext_cdc_serving_join")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the point-in-time lookup must stay a stateless broadcast range join")
    // the broadcast is the GATED fast path (episodes under
    // ServingBridge.BroadcastEpisodeLimit at fixture scale) — the hint
    // must actually reach the planner; ServingBridgeSpec drives the
    // over-limit shuffled fallback
    assert(p.contains("BroadcastHashJoin"),
      "under the episode-count gate the lookup must broadcast")
  }

  test("multi-feature serving read is ONE join: the merged timeline keeps " +
      "F features from costing F request joins") {
    val p = plan("ext_cdc_serving_multi")
    // equi-joins only: the 1-row max(o_orderkey) scalar rides in as a
    // BroadcastNestedLoopJoin (servingRequests) and is not an episode join
    val joins = p.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin"))
    assert(joins == 1,
      s"the request stream must ride ONE gated episode join, got $joins")
    assert(p.contains("BroadcastHashJoin"),
      "under the episode-count gate the merged-timeline lookup must broadcast")
  }

  test("lifecycle maintenance window: the LSN predicate prunes the first " +
      "activity window AT THE SCAN (branch-invariant start_lsn)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feed = graft.cdc.ChangeFeed.fromDocuments(docs)
      .unionByName(graft.cdc.ChangeFeed.fromDocumentsLifecycle(docs))
      .where(col("start_lsn") >= graft.cdc.ChangeFeed.DocsLifecycleLsn)
    val p = feed.queryExecution.executedPlan.toString
    // era-1's lsn IS doc_id, so the window predicate must reach its
    // parquet scan as a plain pushed filter (row-group stats then skip
    // the whole first window); era-2's lsn is doc_id + offset — an
    // expression parquet can't evaluate, harmless since era-2 keeps all
    assert(p.contains("GreaterThanOrEqual(doc_id,"),
      s"window predicate not pushed to the era-1 scan:\n$p")
  }

  test("filtered ANN scores both strategies from ONE scored pass: queries " +
      "broadcast, both heaps in the same aggregate") {
    val p = plan("ext_ann_filtered")
    // the pre and post heaps must ride one partial aggregate: exactly one
    // scored join of corpus x broadcast queries feeds a topkbyscore pair —
    // a second scoring pass would double the corpus work
    val scoredJoins = p.linesIterator
      .count(l => l.contains("BroadcastNestedLoopJoin") && l.contains("query_id"))
    assert(scoredJoins <= 1,
      s"one corpus x queries scoring join only, got $scoredJoins")
    assert(!p.contains("SortMergeJoin"),
      "nothing in the filtered-search plan may shuffle-join the corpus")
  }

  test("feed LSN-window predicate reaches below the dedup aggregate") {
    // the composite feed dedups on the key; the lsn window is a function of
    // the key, so its filter must evaluate on the scan side of the dedup
    // exchange. Plan text prints children below parents: the deepest
    // Filter line must come after the deepest Exchange line.
    val lines = SparkEntry.queries("cdc_feed_window_composite")(spark, dir)
      .queryExecution.executedPlan.toString.linesIterator.toSeq
    val lastExchange = lines.lastIndexWhere(_.contains("Exchange"))
    val lastFilter = lines.lastIndexWhere(_.contains("Filter"))
    assert(lastExchange >= 0 && lastFilter > lastExchange,
      "lsn-window filter must evaluate before the dedup shuffle")
  }
}
