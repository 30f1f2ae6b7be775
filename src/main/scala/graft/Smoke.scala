package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's `entry` contract: prints the flagship
  * query's row count on sf0.001 (driver checks rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()} cols=${df.columns.length}")
    df.show(5)
    spark.stop()
  }
}
