package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{DistinctStore, Tables}

/** The sketch store must estimate within the HLL error bound, merge
  * snapshots to the same answer as building over the union, and
  * round-trip through parquet.
  */
class DistinctStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  val sf = "/root/testdata/sf0.001"

  test("estimates stay within 5% of exact distinct counts per group") {
    val ev = Tables.events(spark, sf)
    val est = DistinctStore.estimates(
        DistinctStore.build(ev, "event_type", "user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: est ${est(k)} vs exact $n")
    }
  }

  test("merging split snapshots equals building over the whole corpus") {
    val ev = Tables.events(spark, sf)
    val a = DistinctStore.build(ev.filter(col("event_id") % 2 === 0),
      "event_type", "user_id")
    val b = DistinctStore.build(ev.filter(col("event_id") % 2 === 1),
      "event_type", "user_id")
    val merged = DistinctStore.estimates(DistinctStore.merge(Seq(a, b)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = DistinctStore.estimates(
        DistinctStore.build(ev, "event_type", "user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole)
  }

  test("save/load round-trips sketches and estimates") {
    val ev = Tables.events(spark, sf)
    val sk = DistinctStore.build(ev, "event_type", "user_id")
    val before = DistinctStore.estimates(sk)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dir = Files.createTempDirectory("graft-hll").toString
    DistinctStore.save(sk, dir)
    val after = DistinctStore.estimates(DistinctStore.load(spark, dir))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
  }
}
