package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }

    import graft.engine.{Extensions, Tables}
    val docs = Tables.documents(spark, d).filter(col("doc_id") < 300)
    val toks = docs.select(col("doc_id"),
      Extensions.tokens(col("text")).as("toks"))
    val shingles = toks.select(col("doc_id"), explode(expr(
      "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), " +
      "i -> array_join(slice(toks, i, 3), ' ')) ELSE array() END"))
      .as("shingle")).distinct()
    time("shingles count")(println(shingles.count()))
    val a = shingles.select(col("doc_id").as("id_a"), col("shingle"))
    val b = shingles.select(col("doc_id").as("id_b"), col("shingle"))
    val inter = a.join(b, "shingle").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    time("inter count")(println(inter.count()))
    time("full pairs")(println(Extensions.ngramJaccardPairs(
      Tables.documents(spark, d).filter(col("doc_id") < 300),
      "text", "doc_id", 3, 0.0).count()))
    time("full pairs again")(println(Extensions.ngramJaccardPairs(
      Tables.documents(spark, d).filter(col("doc_id") < 300),
      "text", "doc_id", 3, 0.0).count()))
    spark.stop()
  }
}
