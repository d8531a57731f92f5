package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-cluster operators: turning PAIRWISE near-dup evidence
  * ([[Dedup.nearDuplicatePairs]]) into per-document cluster assignments —
  * the step an actual 100 TB dedup needs between "these two match" and
  * "keep one representative per group" — plus the cluster-aware
  * train/val/test split that stops near-duplicates from leaking across
  * split boundaries (the classic eval-contamination bug: doc in train,
  * its near-copy in test).
  *
  * Clustering is min-label propagation over the undirected pair graph:
  * every node starts labeled with its own id and repeatedly takes the min
  * of its own and its neighbors' labels until fixpoint. Each round is one
  * hash join + one hash aggregate (both key-partitioned — no driver-side
  * graph state), and `localCheckpoint` truncates the plan between rounds
  * so lineage cannot snowball. Rounds needed = graph diameter: dup
  * clusters are near-cliques (LSH bands fire on every close pair), so in
  * practice this is 2–3 rounds; a pathological long-chain graph would
  * need the O(log n)-round large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond") — maxIter guards
  * against silently mislabeling if such a graph ever shows up.
  */
object Cluster {

  /** Connected components of an undirected edge list: (id, cluster_id)
    * with cluster_id = min node id reachable. Only nodes that appear in
    * at least one edge are returned (callers union singletons back in —
    * see [[clusters]]).
    */
  def connectedComponents(
      pairs: DataFrame,
      idA: String = "id_a",
      idB: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .union(pairs.select(col(idB).cast("long").as("src"), col(idA).cast("long").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min("nl").as("nl"))
      // the changed-count rides the checkpoint job via observe — one Spark
      // job per round, not a second pass over the labels
      val obs = org.apache.spark.sql.Observation()
      val next = labels.withColumnRenamed("label", "prev")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("prev"), coalesce(col("nl"), col("prev"))).as("label"),
          col("prev"))
        .observe(obs, sum(when(col("label") =!= col("prev"), 1L).otherwise(0L)).as("changed"))
        .select("id", "label")
        .localCheckpoint(true)
      labels = next
      done = obs.get("changed").asInstanceOf[Long] == 0
      iter += 1
    }
    require(done, s"connectedComponents did not converge within $maxIter rounds " +
      "(graph diameter too large — switch to the large-star/small-star variant)")
    labels
  }

  /** Cluster assignment for EVERY document: members of a near-dup
    * component get its min doc_id, singletons get their own id. One left
    * join against the (tiny) component labels — the corpus itself is
    * touched once. */
  def clusters(corpus: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(connectedComponents(pairs).withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))

  /** Representative selection — the step after clustering in a real dedup:
    * per near-dup cluster keep the BEST member, not an arbitrary one.
    * "Best" here is most tokens (keep the fullest copy), doc_id as the
    * total-order tiebreak; engine-portable via max(struct(score, -id))
    * semantics expressed as max_by with a composite ordering. One join
    * against the (small) cluster labels + one hash aggregate per cluster.
    * Output: cluster_id, representative doc, member count, kept tokens. */
  def representatives(
      corpus: DataFrame, pairs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val scored = corpus.select(col(idCol).cast("long").as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    scored
      .join(connectedComponents(pairs).withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .groupBy("cluster_id")
      .agg(
        // composite argmax: most tokens, then SMALLEST id — (n_tokens, -id)
        // is a total order, so the winner is deterministic on both engines
        max_by(col("doc_id"), struct(col("n_tokens"), (-col("doc_id")).as("neg")))
          .as("keep_id"),
        max(col("n_tokens")).as("keep_tokens"),
        count(lit(1)).as("n_members"))
  }

  /** Leakage-safe deterministic split: the hash bucket is computed from the
    * CLUSTER id, not the document, so a whole near-dup cluster always lands
    * in one split — near-copies can never straddle train/test. Same 98/1/1
    * geometry and engine-portable hex→int math as [[Packing.hashSplit]].
    * Output is per-split counts: docs and distinct clusters. */
  def leakageSafeSplit(corpus: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val bucket = (conv(substring(md5(col("cluster_id").cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100)
    clusters(corpus, pairs, idCol)
      .withColumn("split",
        when(bucket < 98, lit("train"))
          .when(bucket < 99, lit("val"))
          .otherwise(lit("test")))
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
  }
}
