package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executes every registered catalog query at sf0.001: none may throw,
  * and all but a known-empty allowlist must return rows. This is the
  * in-suite twin of the driver's rows-only check — a query that breaks
  * or silently empties fails the build, not just the round.
  */
class CatalogSmokeSpec extends AnyFunSuite {
  import TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  /** Queries legitimately empty on this tiny SF. */
  val mayBeEmpty: Set[String] = Set(
    "anti_join" // every customer has orders in the synthetic data
  )

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"catalog query '$name' executes" +
        (if (mayBeEmpty(name)) "" else " and returns rows")) {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracle SQL without queries: $orphans")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
