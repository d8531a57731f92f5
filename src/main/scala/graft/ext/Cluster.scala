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
  * practice this is 2–3 rounds; a pathological long-chain graph that
  * exhausts maxIter ESCALATES automatically to the O(log n)-round
  * large-star/small-star alternating algorithm
  * ([[connectedComponentsAlternating]], Kiveris et al., "Connected
  * Components in MapReduce and Beyond") instead of failing.
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
    // seed = the FIRST propagation round, fused into initialization: from
    // identity labels, round 1 would compute min(id, min N(id)) — which is
    // one aggregate over the bidirected edges, no join needed. Near-clique
    // dup graphs converge at the seed itself and pay only the confirm round.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nl"))
      .select(col("id"), least(col("id"), col("nl")).as("label"))
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
    if (done) labels
    else {
      // diameter exceeded the round budget (a long-chain graph): escalate
      // to the O(log n)-round alternating algorithm instead of failing —
      // SEEDED from the partially-converged labels: contract every edge to
      // its endpoints' current labels (a valid quotient — each node is
      // already connected to its label), solve the much smaller contracted
      // graph, then compose the two label maps. The propagation rounds
      // already paid for are not thrown away.
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"min-label propagation did not converge in $maxIter rounds; " +
          "escalating to large-star/small-star on the label-contracted graph")
      val contracted = edges
        .join(labels.select(col("id").as("src"), col("label").as("csrc")), Seq("src"))
        .join(labels.select(col("id").as("dst"), col("label").as("cdst")), Seq("dst"))
        .select(col("csrc").as("src"), col("cdst").as("dst"))
        .where(col("src") =!= col("dst"))
      val contractedCc = connectedComponentsAlternating(contracted)
      // final(id) = cc(label(id)); a label absent from the contracted graph
      // (its whole partial cluster had only internal edges) keeps itself.
      // Labels are partial MINIMA, so the composed label is still the
      // component-wide min id.
      labels.join(
          contractedCc.select(col("id").as("label"), col("label").as("__root")),
          Seq("label"), "left")
        .select(col("id"), coalesce(col("__root"), col("label")).as("label"))
    }
  }

  /** Connected components via the ALTERNATING algorithm (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond"): interleave
    * large-star (every node's larger neighbors re-point to its minimum)
    * and small-star (every node and its smaller neighbors collapse onto
    * the minimum) until the edge set stabilizes as stars — O(log n)
    * rounds on ANY graph, vs diameter rounds for label propagation. Each
    * round is two hash aggregations + joins, localCheckpoint-truncated.
    * Used as [[connectedComponents]]'s escalation path for long-chain
    * graphs; takes the BIDIRECTED distinct edge list. */
  private[ext] def connectedComponentsAlternating(edges0: DataFrame, maxIter: Int = 50): DataFrame = {
    // edges ride CANONICALLY as (hi, lo) with hi > lo; both steps return
    // that form (their emissions always point bigger → smaller)
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("src"), col("dst")).as("hi"), least(col("src"), col("dst")).as("lo"))
      .where(col("hi") =!= col("lo")).distinct()
    // large-star: for every node u (over the BIDIRECTED view) each
    // strictly-larger neighbor re-points to m(u) = min(N(u) ∪ {u}).
    // An emission is a CHANGE iff it re-points dst away from its original
    // partner (m ≠ src) — counted via observe, so convergence detection
    // rides the round's own checkpoint job instead of a count+exceptAll
    // second pass.
    def largeStar(e: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame = {
      val bi = e.select(col("hi").as("src"), col("lo").as("dst"))
        .union(e.select(col("lo").as("src"), col("hi").as("dst"))) // distinct by construction
      val m = bi.groupBy("src").agg(least(min(col("dst")), col("src")).as("m"))
      canon(bi.join(m, Seq("src"))
        .where(col("dst") > col("src"))
        .observe(obs, coalesce(sum(when(col("m") =!= col("src"), 1L).otherwise(0L)), lit(0L)).as("changed"))
        .select(col("dst").as("src"), col("m").as("dst")))
    }
    // small-star: per node u, its ≤-neighbors and u itself all collapse
    // onto m(u) = min of the smaller neighbors. A row is a CHANGE iff its
    // lo re-points (lo ≠ m); the (hi → m) emission is always an existing
    // edge (m is one of hi's los), so only the lo side is counted.
    def smallStar(e: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame = {
      val m = e.groupBy("hi").agg(min(col("lo")).as("m"))
      val j = e.join(m, Seq("hi"))
        .observe(obs, coalesce(sum(when(col("lo") =!= col("m"), 1L).otherwise(0L)), lit(0L)).as("changed"))
      canon(
        j.select(col("lo").as("src"), col("m").as("dst"))
          .union(j.select(col("hi").as("src"), col("m").as("dst"))))
    }
    var e = canon(edges0).localCheckpoint(true)
    var iter = 0
    var stable = false
    while (!stable && iter < maxIter) {
      val largeObs = org.apache.spark.sql.Observation()
      val smallObs = org.apache.spark.sql.Observation()
      val next = smallStar(largeStar(e, largeObs), smallObs).localCheckpoint(true)
      e = next
      // both steps emission-stable ⇔ the edge set is a fixed star forest
      // (each step then reproduces its input exactly); read AFTER the
      // checkpoint job that both observations rode
      stable = largeObs.get("changed").asInstanceOf[Long] == 0L &&
        smallObs.get("changed").asInstanceOf[Long] == 0L
      iter += 1
    }
    require(stable, s"alternating CC did not stabilize within $maxIter rounds")
    // stars: every non-root points directly at its component min; every
    // OTHER node that appeared in the input (roots, and nodes whose only
    // edges were self-loops, which canon() drops) labels itself
    val members = e.select(col("hi").as("id"), col("lo").as("label"))
    val nodes = edges0.select(col("src").as("id"))
      .union(edges0.select(col("dst").as("id"))).distinct()
    val selves = nodes
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    members.union(selves).distinct()
  }

  /** Cluster assignment for EVERY document: members of a near-dup
    * component get its min doc_id, singletons get their own id. One left
    * join against the (tiny) component labels — the corpus itself is
    * touched once. */
  def clusters(corpus: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame =
    assignFromLabels(corpus, connectedComponents(pairs), idCol)

  /** INCREMENTAL component maintenance: fold a NEW batch of near-dup
    * pairs into existing (id, label) assignments without revisiting any
    * historical pair. Every existing component enters the propagation as
    * a STAR (member → label edges, depth 1 by construction — the label IS
    * the component's min id), so however many batches built the history,
    * the fold's round count depends only on the new batch's graph
    * diameter. This is the continuously-ingesting dedup shape: pair
    * discovery against the persisted signature index
    * ([[Dedup.incrementalNew]] / the minhash ingest) hands its new pairs
    * here, and the label table — not the pair history — is the only state
    * carried between batches. Labels from the fold are exactly the labels
    * a from-scratch CC over (all old pairs ∪ new pairs) would produce:
    * star edges preserve old connectivity node-for-node, and min-label
    * propagation over the union resolves merged components to the global
    * min id. */
  def applyPairsBatch(labels: DataFrame, newPairs: DataFrame,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val starEdges = labels.where(col("id") =!= col("label"))
      .select(col("id").as(idA), col("label").as(idB))
    connectedComponents(starEdges.union(newPairs.select(col(idA), col(idB))), idA, idB)
  }

  /** SUBJECT DELETION from maintained cluster labels — the deletion
    * complement of [[applyPairsBatch]] (additions fold via star edges;
    * deletions can SPLIT a component, which star edges cannot express, so
    * the subject's own components re-solve): components containing no
    * forgotten id pass through label-for-label (their pairs and members
    * are untouched, so a from-scratch recompute would reproduce them
    * verbatim), while the affected components re-run CC over their
    * surviving stored pairs — members left pairless become singletons,
    * and if the subject WAS the min label, survivors relabel to the new
    * minimum. Work is sized by the affected components + one pass over
    * the label table, never the corpus pair set.
    *
    * @param labels    full (id, label) table — singletons as id → id
    * @param pairs     the persisted verified pair store (id_a, id_b)
    * @param forgetIds one column `id` — the subjects to delete
    * @return the surviving (id, label) table */
  def applyForget(labels: DataFrame, pairs: DataFrame, forgetIds: DataFrame): DataFrame = {
    val f = forgetIds.select(col("id"))
    val affectedLabels = labels.join(f, Seq("id"), "left_semi")
      .select("label").distinct().localCheckpoint(true)
    val keep = labels.join(affectedLabels, Seq("label"), "left_anti")
    val affected = labels.join(affectedLabels, Seq("label"), "left_semi")
      .join(f, Seq("id"), "left_anti")
      .select("id")
      .localCheckpoint(true)
    val survivingPairs = pairs
      .join(affected.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(affected.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
    val resolved = connectedComponents(survivingPairs)
    val singles = affected
      .join(resolved.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    keep.select("id", "label")
      .unionByName(resolved.select("id", "label"))
      .unionByName(singles)
  }

  /** [[clusters]] from PRECOMPUTED component labels — so a pipeline that
    * also selects representatives runs the iterative CC once and shares
    * the (tiny, already-checkpointed) label table. */
  def assignFromLabels(corpus: DataFrame, labels: DataFrame, idCol: String = "doc_id"): DataFrame =
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
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
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    representativesFromLabels(corpus, connectedComponents(pairs), textCol, idCol)

  /** [[representatives]] from precomputed labels (shared-CC pipelines). */
  def representativesFromLabels(
      corpus: DataFrame, labels: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val scored = corpus.select(col(idCol).cast("long").as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("n_tokens"))
    scored
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
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

  /** Duplicate-aware SOFT-dedup weights — the alternative to dropping
    * copies: every document stays in the corpus but its training weight is
    * divided by its near-dup cluster size (`weight_bp = 10000 div
    * n_members`), so a text duplicated a million times contributes one
    * document's worth of gradient instead of a million ("soft dedup",
    * e.g. the duplicate-discounting used when dropping data is too
    * destructive). Exact integers only: basis points by truncating
    * division on both engines. Cost over [[clusters]] is one hash
    * aggregate on the (tiny) label table + one broadcast-sized join back
    * — the corpus is still touched once. */
  def duplicateWeights(corpus: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val assigned = clusters(corpus, pairs, idCol)
    val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
    assigned
      .join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("n_members"),
        TextOps.intDiv(lit(10000L), col("n_members")).as("weight_bp"))
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
