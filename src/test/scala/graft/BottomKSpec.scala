package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BottomK

/** BottomK aggregate: equivalence with the unbounded built-in
  * composition, dedup, null-skipping, partial-merge correctness.
  */
class BottomKSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bottom_k equals slice(sort_array(collect_set)) on any data") {
    val df = (1 to 1000).map(i => (i % 7L, (i * 2654435761L) % 1000))
      .toDF("g", "v").repartition(8) // force partial + merge paths
    val viaAgg = df.groupBy("g")
      .agg(BottomK.bottomK(spark, col("v"), 5).as("bk"))
      .orderBy("g").select("bk").as[Seq[Long]].collect().toSeq
    val viaSet = df.groupBy("g")
      .agg(slice(sort_array(collect_set(col("v"))), 1, 5).as("bk"))
      .orderBy("g").select("bk").as[Seq[Long]].collect().toSeq
    assert(viaAgg == viaSet)
  }

  test("bottom_k skips nulls and bounds output at k") {
    val df = Seq[(Long, Option[Long])]((1L, Some(5L)), (1L, None),
      (1L, Some(3L)), (1L, Some(5L)), (1L, Some(9L))).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(BottomK.bottomK(spark, col("v"), 2).as("bk"))
      .select("bk").as[Seq[Long]].head()
    assert(out == Seq(3L, 5L))
  }
}
