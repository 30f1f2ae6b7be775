package graft

import org.scalatest.funsuite.AnyFunSuite

/** The deferred-oracle plumbing (QuerySpec.lazyOracle + the PqOracles
  * fit stashes): a broken stash hand-off would not fail any query — it
  * would silently degrade an oracle-exact entry to the rows-only check
  * and the round's correctness ledger would quietly lose rows. This
  * suite pins the full contract:
  *
  *   - BEFORE any fit-bearing query runs, the deferred entries are
  *     statically counted as oracled ([[SparkEntry.oracledNames]] — the
  *     graft.Counts fix) even though their SQL is not yet derivable;
  *   - AFTER the fit-bearing queries run (the Verify order), every
  *     deferred entry's generator yields SQL, so oracle_sql.json
  *     carries all of them.
  */
class LazyOracleSpec extends AnyFunSuite {
  import TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  /** Every catalog entry whose oracle is deferred to a fit stash. */
  val deferred: Set[String] = Set("pq_codes", "pq_topk", "ivfpq_topk",
    "ann_ivf", "knn_join_pruned", "hybrid_topk_pruned",
    "quality_score_lr", "pca_features", "quantile_binning")

  test("deferred-oracle entries are statically oracled, and after one " +
      "catalog pass every generator yields SQL for oracle_sql.json") {
    assert(deferred.subsetOf(SparkEntry.oracledNames),
      s"static oracled set lost: ${deferred -- SparkEntry.oracledNames}")
    // run each fit-bearing query once (what Verify does before dumping)
    deferred.foreach { name =>
      assert(SparkEntry.queries(name)(spark, sf).count() > 0, name)
    }
    val sql = SparkEntry.oracleSql
    val missing = deferred.filterNot(sql.contains)
    assert(missing.isEmpty,
      s"stash hand-off broken — generators yielded no SQL for: $missing")
    // and the generated SQL inlines literals, not placeholders
    deferred.foreach(n => assert(sql(n).length > 100, n))
  }
}
