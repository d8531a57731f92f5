package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Semantics of duplicate clustering and the cluster-keyed split/sample:
  * component labeling on hand-built graphs (chains force multiple
  * propagation rounds), planted-dup behavior on the fixture corpus, the
  * no-straddle invariant of the leakage-safe split, and the exact integer
  * quota of the stratified sample. */
class ClusterSpec extends AnyFunSuite with SparkFixture {

  private def pairsDf(ps: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    ps.toDF("id_a", "id_b")
  }

  test("a chain converges to the min id (multiple propagation rounds)") {
    // 1-2-3-4-5 has diameter 4: labels must travel, not just hop once
    val labels = Cluster.connectedComponents(pairsDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("a chain deeper than maxIter escalates to the alternating algorithm") {
    // diameter 79 exceeds the default 20-round label-propagation budget:
    // the escalation must label the whole chain with its min, not fail
    val chain = pairsDf((1L until 80L).map(i => (i, i + 1)): _*)
    val labels = Cluster.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 80 && labels.values.forall(_ == 1L))
  }

  test("incremental batch fold equals from-scratch CC (bridge, extend, fresh, untouched)") {
    // history: {1,2,3} and {5,6} and {10,11}
    val oldPairs = pairsDf((1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L))
    val labels0 = Cluster.connectedComponents(oldPairs)
    // batch: bridges {1..3}+{5,6}, extends {1..} with 4, adds fresh {8,9};
    // {10,11} is untouched by the batch and must keep its label
    val newPairs = pairsDf((3L, 5L), (4L, 6L), (8L, 9L))
    val inc = Cluster.applyPairsBatch(labels0, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = Cluster.connectedComponents(pairsDf(
      (1L, 2L), (2L, 3L), (5L, 6L), (10L, 11L), (3L, 5L), (4L, 6L), (8L, 9L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == scratch)
    assert(inc(6L) == 1L && inc(4L) == 1L && inc(9L) == 8L && inc(11L) == 10L)
  }

  test("forget fold: deletions SPLIT components, steal min labels, and " +
      "leave untouched components label-for-label") {
    val s = spark
    import s.implicits._
    // components: chain {1..5}, triangle {10,11,12}, pair {20,21},
    // singleton {30}
    val pairs = pairsDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
    val allIds = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 21L, 30L)
    val labels = Cluster.connectedComponents(pairs)
      .unionByName(Seq((30L, 30L)).toDF("id", "label")) // singleton state row
    // forget 3 (splits the chain), 10 (steals the triangle's min label),
    // and 30 (a singleton vanishes whole)
    val forgotten = Seq(3L, 10L, 30L).toDF("id")
    val got = Cluster.applyForget(labels, pairs, forgotten)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L,            // left half of the split chain
      4L -> 4L, 5L -> 4L,            // right half re-labels to ITS min
      11L -> 11L, 12L -> 11L,        // triangle survivors under the new min
      20L -> 20L, 21L -> 20L),       // untouched component, label-for-label
      s"got $got")
    // and the fold equals from-scratch CC over the surviving pairs
    val survivors = allIds.filterNot(Seq(3L, 10L, 30L).contains).toSet
    val scratchPairs = pairsDf((1L, 2L), (4L, 5L), (11L, 12L), (20L, 21L))
    val want = Cluster.connectedComponents(scratchPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ++
      survivors.filterNot(Set(1L, 2L, 4L, 5L, 11L, 12L, 20L, 21L)).map(i => i -> i)
    assert(got == want)
  }

  test("disjoint components keep distinct min labels") {
    val labels = Cluster.connectedComponents(pairsDf((10L, 7L), (20L, 21L), (21L, 22L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(7L -> 7L, 10L -> 7L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("planted fixture duplicates cluster with their source document") {
    val c = DocFeed.withDups(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val assigned = Cluster.clusters(c, Dedup.nearDuplicatePairs(c))
    val byId = assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every exact dup (doc_id % 10 == 0, planted at +1000000) must join its
    // source's cluster, and the source (smaller id) is the representative
    val exactDups = byId.keys.filter(id => id >= 1000000L && id < 2000000L)
    assert(exactDups.nonEmpty)
    exactDups.foreach { d =>
      assert(byId(d) == byId(d - 1000000L) && byId(d) <= d - 1000000L,
        s"exact dup $d must share its source's cluster")
    }
    // singletons label themselves
    val inPairs = Dedup.nearDuplicatePairs(c)
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct().collect().map(_.getLong(0)).toSet
    byId.filterNot { case (id, _) => inPairs(id) }.foreach { case (id, cl) =>
      assert(cl == id, s"singleton $id must keep its own id")
    }
  }

  test("soft-dedup weights: copies split one document's worth, total stays bounded") {
    val c = DocFeed.withDups(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val w = Cluster.duplicateWeights(c, Dedup.nearDuplicatePairs(c))
    val rows = w.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size == c.count(), "every document keeps a row — nothing is dropped")
    // an exact dup and its source share a cluster, so both carry
    // 10000 div n_members; a singleton carries the full 10000
    rows.foreach { case (id, (cl, n, bp)) =>
      assert(bp == 10000L / n, s"doc $id: weight_bp must be 10000 div $n")
      if (n == 1L) assert(cl == id && bp == 10000L)
    }
    val dup = rows.keys.find(id => id >= 1000000L && id < 2000000L).get
    assert(rows(dup)._1 == rows(dup - 1000000L)._1 && rows(dup)._2 >= 2L,
      "planted copy shares its source's cluster and diluted weight")
  }

  test("leakage-safe split never places one cluster in two splits") {
    val c = DocFeed.withDups(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val pairs = Dedup.nearDuplicatePairs(c)
    val split = Cluster.leakageSafeSplit(c, pairs)
    val rows = split.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val total = Cluster.clusters(c, pairs)
    assert(rows.values.map(_._1).sum == total.count(), "every doc lands in exactly one split")
    // n_clusters summed across splits == distinct clusters overall — a
    // straddling cluster would be counted twice and break the equality
    assert(rows.values.map(_._2).sum ==
      total.select("cluster_id").distinct().count(),
      "no cluster may straddle two splits")
  }

  test("token budget keeps a contiguous prefix, overflowing by at most one doc") {
    val c = DocFeed.withDups(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val rows = Packing.tokenBudget(c, budgetTokens = 500L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.nonEmpty)
    // per-doc token counts in this fixture are bounded; kept tokens may
    // exceed the budget only by the final doc's own length
    val maxDocTokens = c.select(max(size(split(col("text"), " ")))).head().getInt(0)
    rows.foreach { case (source, (nKept, tokensKept)) =>
      assert(nKept >= 1, s"$source keeps at least the first doc")
      assert(tokensKept < 500L + maxDocTokens,
        s"$source: contiguous fill may overflow by one doc only, got $tokensKept")
    }
  }

  test("temporal split: range cut, inclusive boundaries, embargo buffer") {
    val s = spark
    import s.implicits._
    // lo=0, hi=100 -> cut=80; embargo 10s -> (80, 90]; test > 90
    val df = Seq((1L, 0L), (2L, 80L), (3L, 81L), (4L, 90L), (5L, 91L), (6L, 100L))
      .toDF("id", "t")
    val got = Packing.temporalSplit(df, "t", "id", trainBp = 8000L, embargoS = 10L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    assert(got("train") == ((2L, 3L)), "t <= cut inclusive (ids 1, 2)")
    assert(got("embargo") == ((2L, 7L)), "(cut, cut+embargo] (ids 3, 4)")
    assert(got("test") == ((2L, 11L)), "beyond the buffer (ids 5, 6)")
  }

  test("domain mix: sqrt temperature thins the big host and keeps the small one") {
    val s = spark
    import s.implicits._
    // host big: 9 docs (w = 3), host small: 1 doc (w = 1) -> budget = 5,
    // sum w = 4 -> quotas 3 and 1: proportional sampling would give the
    // small host half a doc; the temperature keeps it whole
    val rows = ((1L to 9L).map(i =>
      (i, s"text body number $i", "{\"url\": \"https://big.example.com/" + i + "\"}")) :+
      ((10L, "text body number ten", "{\"url\": \"https://small.example.com/x\"}")))
      .toDF("doc_id", "text", "meta")
    val got = Packing.domainMix(rows)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("big.example.com") == ((9L, 3L, 3L, 3L, got("big.example.com")._5)),
      s"big host: 9 docs, weight 3, quota 3, kept 3 — got ${got("big.example.com")}")
    assert(got("small.example.com") == ((1L, 1L, 1L, 1L, 10L)),
      s"small host keeps its single doc — got ${got("small.example.com")}")
  }

  test("stratified sample keeps exactly floor(n/10) per stratum") {
    val c = DocFeed.withDups(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val totals = c.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Packing.stratifiedSample(c).collect().foreach { r =>
      val (lang, nTotal, nKept) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nTotal == totals(lang))
      assert(nKept == nTotal / 10, s"$lang: integer keep rule is floor(n * 1/10)")
    }
  }
}
