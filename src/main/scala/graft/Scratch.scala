package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling/repro main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    import graft.engine.Tables._

    def attempt(label: String)(f: => Long): Unit =
      try println(s"[scratch] $label OK rows=" + f)
      catch { case e: Throwable =>
        println(s"[scratch] $label FAILED: ${e.getMessage.take(120)}") }

    val base = lineitem(spark, d)
      .join(orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, d)), col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "l_extendedprice", "l_discount")

    attempt("plain groupBy")(base.groupBy("n_name").count().count())
    attempt("rollup no orderBy")(
      base.rollup("n_name").agg(count(lit(1)).as("n")).count())
    attempt("rollup + gid")(
      base.rollup("n_name").agg(count(lit(1)).as("n"),
        grouping_id().cast("int").as("gid")).count())
    attempt("rollup + gid + orderBy")(
      base.rollup("n_name").agg(count(lit(1)).as("n"),
        grouping_id().cast("int").as("gid")).orderBy("gid", "n_name").count())
    attempt("rollup on cached/localCheckpoint")(
      base.localCheckpoint(false).rollup("n_name")
        .agg(count(lit(1)).as("n"), grouping_id().cast("int").as("gid"))
        .orderBy("gid", "n_name").count())
    attempt("rollup via spark.sql") {
      base.createOrReplaceTempView("rollup_base")
      spark.sql("""SELECT n_name, count(*) AS n,
                   CAST(grouping(n_name) AS INT) AS gid
                   FROM rollup_base GROUP BY ROLLUP (n_name)
                   ORDER BY gid, n_name""").count()
    }
    attempt("rollup via alias-qualified col")(
      base.as("t").rollup(col("t.n_name")).agg(count(lit(1)).as("n"))
        .count())
    spark.stop()
  }
}
