package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling/repro main (not part of the driver contract). */
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

    import graft.engine.Tables
    import org.apache.spark.ml.feature._

    // minhash_neardup decomposition
    val docs = Tables.documents(spark, d).filter(col("doc_id") < 500)
      .select("doc_id", "text")
    val toks = new RegexTokenizer().setInputCol("text").setOutputCol("__toks")
      .setPattern("\\s+").transform(docs)
    val cvm = time("cv fit")(new CountVectorizer().setInputCol("__toks")
      .setOutputCol("__tf").setBinary(true).setMinDF(1.0).fit(toks))
    val tf = cvm.transform(toks)
    val lshm = time("lsh fit")(new MinHashLSH().setInputCol("__tf")
      .setOutputCol("__h").setNumHashTables(3).setSeed(42L).fit(tf))
    time("approx join")(println(
      lshm.approxSimilarityJoin(tf, tf, 0.5, "dist")
        .filter(col("datasetA.doc_id") < col("datasetB.doc_id")).count()))

    // ann_bucketed decomposition
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("__vec"))
    val brp = time("brp fit")(new BucketedRandomProjectionLSH()
      .setInputCol("__vec").setOutputCol("__h").setBucketLength(2.0)
      .setNumHashTables(3).setSeed(42L).fit(emb))
    val hashed = brp.transform(emb)
    val queries = hashed.filter(col("vec_id") < 5)
    time("ann join")(println(
      brp.approxSimilarityJoin(queries, hashed, Double.MaxValue, "dist").count()))
    spark.stop()
  }
}
