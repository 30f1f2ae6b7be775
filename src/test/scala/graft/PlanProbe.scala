package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-loop plan inspector (test scope, never shipped): print the
  * executed-plan skeleton of one catalog query so exchange/scan waste
  * is visible without the Spark UI.
  *
  *   sbt "Test/runMain graft.PlanProbe <query> [sfDir]"
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("basket_affinity")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = TestSpark.spark
    if (name == "ALL") {
      // catalog-wide audit: one line per query, worst scan counts last
      val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (n, fn) =>
          try {
            val df = fn(spark, sf)
            df.collect()
            val ex = df.queryExecution.executedPlan match {
              case a: AdaptiveSparkPlanExec => a.executedPlan
              case p                        => p
            }
            val s = ex.toString
            Some((n, s.linesIterator.count(_.contains("Scan parquet")),
              s.linesIterator.count(_.contains("Exchange hashpartitioning")),
              s.linesIterator.count(_.contains("ReusedExchange")),
              s.linesIterator.count(_.contains("CartesianProduct"))))
          } catch { case e: Throwable =>
            println(s"[probe] $n ERROR ${e.getClass.getSimpleName}"); None }
      }
      rows.sortBy(_._2).foreach { case (n, sc, exn, re, cp) =>
        println(f"[probe] $n%-24s scans=$sc exch=$exn reused=$re" +
          (if (cp > 0) s" CARTESIAN=$cp" else ""))
      }
      return
    }
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val s = executed.toString
    println(s"[probe] query=$name")
    println(s"[probe] scans=" +
      s.linesIterator.count(_.contains("Scan parquet")))
    println(s"[probe] exchanges=" +
      s.linesIterator.count(_.contains("Exchange hashpartitioning")))
    println(s"[probe] reused=" +
      s.linesIterator.count(_.contains("ReusedExchange")))
    s.linesIterator
      .filter(l => l.contains("Scan") || l.contains("Exchange") ||
        l.contains("Join") || l.contains("Aggregate") ||
        l.contains("Window") || l.contains("Sort"))
      .foreach(l => println("[probe] " +
        l.take(sys.env.getOrElse("PROBE_WIDTH", "160").toInt)))
  }
}
