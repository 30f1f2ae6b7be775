package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Prints a physical-plan red-flag audit over the whole catalog:
  * cartesian products, sort-merge joins, nested-loop joins, and
  * single-partition windows per query. Known-intended patterns are the
  * broadcast nested loops of the cosine/ANN cross joins.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect()
        val planNode = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p                        => p
        }
        val plan = planNode.toString
        // typed check, not string-matching: a WindowExec whose input is
        // SinglePartition-distributed funnels the whole dataset through
        // one task (the round-1 string detector missed exactly this on
        // ntile_binning — "PartitionBy" never appears in physical plans)
        val globalWindow = planNode.collect {
          case w: WindowExec
              if w.child.outputPartitioning == SinglePartition => w
        }.nonEmpty
        val flags = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "SortMergeJoin" -> plan.contains("SortMergeJoin"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "GlobalWindow(1part)" -> globalWindow)
          .collect { case (f, true) => f }
        println(s"[audit] $name: " +
          (if (flags.isEmpty) "clean" else flags.mkString(", ")))
      } catch { case e: Throwable =>
        println(s"[audit] $name: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
