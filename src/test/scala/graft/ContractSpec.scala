package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static guards on the driver contract itself — cheap JVM-only checks
  * that catch whole classes of past failures before any engine runs.
  */
class ContractSpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
  }

  test("every in-place serving-fold row has a streamed twin") {
    // the convention the 16 CDC-composition rows established: each fold
    // graded in batch mode is also driven through the real streaming
    // engine (foldAvailableNow), so the micro-batch composition property
    // stays graded for every layout family
    val folds = SparkEntry.queries.keySet.filter(_.endsWith("_serving_fold"))
    assert(folds.nonEmpty, "expected in-place serving fold rows")
    val missing = folds.filterNot(k => SparkEntry.queries.contains(s"${k}_stream"))
    assert(missing.isEmpty, s"serving folds without a _stream twin: ${missing.toSeq.sorted}")
  }

  test("every *_serving_compact row grades against its family's unchanged " +
      "never-compacted oracle") {
    // content identity is the repack's whole contract: a compact row that
    // grew its OWN oracle text would be grading something else
    val compacts = SparkEntry.oracleSql.keySet.filter(_.endsWith("_serving_compact"))
    assert(compacts.size >= 7, s"expected a compact row per layout family, got $compacts")
    compacts.foreach { k =>
      val sql = SparkEntry.oracleSql(k)
      assert(SparkEntry.oracleSql.exists { case (k2, s2) => k2 != k && s2 == sql },
        s"$k must share its oracle verbatim with a non-compact family row")
    }
  }

  test("the probe-race matrix covers every generational serving family") {
    // a reader racing a snapshot-isolated fold is graded (two-phase
    // pre/post row), not just spec-pinned, for each family that
    // publishes generations — dropping one would silently demote its
    // isolation contract back to scaladoc
    val expected = Seq(
      "ext_minhash_serving_probe_race", "ext_simhash_serving_probe_race",
      "ext_embdup_serving_probe_race", "ext_embdup_multiband_probe_race",
      "ext_bm25_serving_probe_race", "ext_ivf_serving_probe_race",
      "ext_cdc_serving_probe_race")
    val missing = expected.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty,
      s"generational families without a graded probe race: $missing")
  }

  test("no oracle SQL carries a Scala null interpolation (the r7 " +
      "file-order val-initialization trap)") {
    // a val referencing a fragment declared LATER in its file interpolates
    // the string "null" — lowercase, standalone; legitimate SQL NULL is
    // written uppercase throughout this codebase
    val bad = SparkEntry.oracleSql.filter { case (_, sql) =>
      "(?<![A-Za-z_])null(?![A-Za-z_])".r.findFirstIn(sql).isDefined
    }
    assert(bad.isEmpty, s"lowercase 'null' leaked into: ${bad.keys.toSeq.sorted}")
  }
}
