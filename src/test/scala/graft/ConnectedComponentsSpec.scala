package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

/** Connected components: chains, isolated nodes, determinism. */
class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("chains collapse to one component; isolated nodes keep their own") {
    val nodes = (1L to 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val comps = ConnectedComponents.components(nodes, edges, "id", "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(4L) == 4L) // isolated
    assert(comps(5L) == 5L && comps(6L) == 5L)
    assert(comps(7L) == 7L)
  }

  test("long path converges within iteration budget") {
    val n = 30L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val comps = ConnectedComponents.components(nodes, edges, "id", "a", "b",
      maxIter = 40).as[(Long, Long)].collect().toMap
    assert(comps.values.toSet == Set(1L))
  }

  test("dedup clusters keep exactly one survivor per duplicate group") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about query engines at scale"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val out = graft.engine.Extensions.dedupClusters(docs, "text", "doc_id",
      maxHamming = 0)
    val kept = out.filter($"keep" === 1).select("doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // 2 and 4 fold into 1's cluster
  }
}
