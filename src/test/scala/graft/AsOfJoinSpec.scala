package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** As-of join semantics on a hand-built fixture + shuffle-shape assert. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
    (2L, 10L, "e3")).toDF("k", "t", "ev")
  val right = Seq((1L, 8L, 100.0), (1L, 15L, 200.0), (3L, 1L, 999.0))
    .toDF("k", "rt", "price")

  test("picks the most recent right row at or before the left time") {
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "rt", Seq("price"))
      .orderBy("t").select("ev", "price")
      .as[(String, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("e0", None),         // t=5: no order yet
      ("e1", Some(100.0)),  // t=10: rt=8 is latest <= 10
      ("e3", None),         // key 2: no right rows
      ("e2", Some(200.0)))) // t=20: rt=15
  }

  test("right row exactly at the left time matches (ties right-first)") {
    val r2 = Seq((1L, 10L, 42.0)).toDF("k", "rt", "price")
    val out = AsOfJoin.asOf(left, r2, "k", "k", "t", "rt", Seq("price"))
      .filter($"ev" === "e1").select("price").as[Double].head()
    assert(out == 42.0)
  }

  test("as-of join costs exactly one hash exchange") {
    val df = AsOfJoin.asOf(left, right, "k", "k", "t", "rt", Seq("price"))
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }).toString
    val ex = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(ex == 1, s"expected 1 exchange:\n$plan")
  }

  test("PitJoin.lookup: interval containment carries, a GAP between " +
      "intervals nulls out (unlike raw as-of), the open interval " +
      "carries forever, pre-history and unknown keys are null") {
    val dim = Seq(
      ("A", 10L, Option(20L), "X"),  // [10, 20) -> X
      ("A", 30L, Option.empty[Long], "Y")) // [30, inf) -> Y
      .toDF("k", "f", "t", "attr")
    val fact = Seq(
      (1L, "A", 5L),   // before history -> null
      (2L, "A", 15L),  // inside [10,20) -> X
      (3L, "A", 25L),  // GAP [20,30) -> null (as-of alone would say X)
      (4L, "A", 35L),  // open interval -> Y
      (5L, "B", 15L))  // unknown key -> null
      .toDF("id", "k", "ts")
    val out = graft.operators.PitJoin.lookup(fact, dim, "k", "k",
        "ts", "f", "t", Seq("attr"))
      .orderBy("id").select("id", "attr")
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq(1L -> None, 2L -> Some("X"), 3L -> None,
      4L -> Some("Y"), 5L -> None))
    // the gap row is exactly what distinguishes PIT from as-of
    val asOfOnly = AsOfJoin.asOf(fact, dim, "k", "k", "ts", "f",
        Seq("attr"))
      .filter($"id" === 3L).select("attr").as[String].head()
    assert(asOfOnly == "X")
  }

  test("slotKey overflow guard: a product past Long.MaxValue raises " +
      "loudly instead of silently wrapping; safe inputs pass through") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    val safe = Seq((800000000L, 999L)).toDF("ep", "off")
      .select(graft.engine.Relational.slotKey(col("ep"), lit(1000L),
        col("off")).as("k"))
      .as[Long].collect()
    assert(safe.toSeq == Seq(800000000L * 1000L + 999L))
    val huge = Seq((4611686018427387904L, 999L)).toDF("ep", "off")
    val ex = intercept[Exception] {
      huge.select(graft.engine.Relational.slotKey(col("ep"), lit(1000L),
        col("off"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("composite time key overflows")),
      s"unexpected failure: $ex")
  }
}
