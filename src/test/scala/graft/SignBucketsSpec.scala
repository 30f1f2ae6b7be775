package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{DotF32, SignBuckets}

/** SignBuckets must be a bit-identical, compile-light stand-in for the
  * composed DotF32 + when/bit-OR form it replaced (see its scaladoc).
  */
class SignBucketsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(7L)
  private val planes = Array.fill(3, 5)(Array.fill(8)(rnd.nextGaussian().toFloat))

  /** The composed reference form: one DotF32 per (table, bit). */
  private def composedBucket(v: org.apache.spark.sql.Column, t: Int) =
    planes(t).zipWithIndex.map { case (p, b) =>
      when(DotF32.dotF32(v, typedLit(p)) >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("matches the composed DotF32 form on random and real vectors") {
    val syn = (0L until 200L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("id", "v")
    val both = syn.select(
      SignBuckets.signBuckets(col("v"), planes).as("native"),
      array((0 until 3).map(t => composedBucket(col("v"), t)): _*).as("composed"))
    assert(both.filter(to_json(col("native")) =!= to_json(col("composed")))
      .count() == 0)
  }

  test("null-poisons short vectors and null elements") {
    val df = Seq(
      (1L, Array[java.lang.Float](1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (2L, Array[java.lang.Float](1f, 2f)),                    // too short
      (3L, Array[java.lang.Float](1f, null, 3f, 4f, 5f, 6f, 7f, 8f)))
      .toDF("id", "v")
    val out = df.select(col("id"),
        SignBuckets.signBuckets(col("v"), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L))
    assert(out(2L))
    assert(out(3L))
  }

  test("rejects ragged or empty plane matrices") {
    intercept[IllegalArgumentException] {
      SignBuckets.signBuckets(col("v"),
        Array(Array(Array(1f, 2f), Array(1f))))
    }
    intercept[IllegalArgumentException] {
      SignBuckets.signBuckets(col("v"), Array.empty)
    }
  }
}
