package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Banded range join equals the naive inequality join on a fixture. */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  val l = Seq((1L, 100L, "a"), (1L, 250L, "b"), (2L, 100L, "c"))
    .toDF("k", "lt", "tag")
  val r = Seq((1L, 120L, "x"), (1L, 400L, "y"), (2L, 500L, "z"))
    .toDF("rk", "rt", "rtag")

  test("banded result equals the naive cross-filter result") {
    val banded = RangeJoin.bandedWithin(l, r, "k", "rk", "lt", "rt", 100L)
      .select("tag", "rtag").as[(String, String)].collect().toSet
    val naive = l.crossJoin(r)
      .filter(col("k") === col("rk") && abs(col("lt") - col("rt")) <= 100)
      .select("tag", "rtag").as[(String, String)].collect().toSet
    assert(banded == naive)
    assert(banded == Set(("a", "x")))  // (b,x) is 130s apart > 100
  }

  test("band edges do not duplicate pairs") {
    // rt exactly at a band boundary relative to lt
    val le = Seq((1L, 200L, "p")).toDF("k", "lt", "tag")
    val re = Seq((1L, 100L, "q"), (1L, 300L, "s")).toDF("rk", "rt", "rtag")
    val out = RangeJoin.bandedWithin(le, re, "k", "rk", "lt", "rt", 100L)
      .select("tag", "rtag").as[(String, String)].collect().toSeq
    assert(out.size == out.distinct.size)
    assert(out.toSet == Set(("p", "q"), ("p", "s")))
  }
}
