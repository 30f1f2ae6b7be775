package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a FULL sf1-equivalent fixture directory — every table
  * the catalog reads, scaled ×`factor` from a base sf dir — so
  * [[Bench]] can run the WHOLE catalog past sf0.1 (VERDICT r11 #4:
  * ScaleProbe covers ~25 shapes individually; this closes the gap for
  * the other ~180).
  *
  * Mutation doctrine follows [[ScaleProbe]] (same rationale,
  * table-for-table):
  *   - facts replicate with id offsets that keep intra-replica joins
  *     matching (l_orderkey/o_orderkey and l_partkey/p_partkey move in
  *     lockstep) while dim keys (l_suppkey, o_custkey, nationkey)
  *     stay put — per-dim-key fact cardinality grows ×f, the
  *     adversarial direction for join/agg state;
  *   - dims copy once (dims grow far slower than facts in
  *     production; broadcast-sized dims is the posture under test);
  *   - documents permute their tokens per replica and embeddings
  *     permute their elements per replica (deterministic
  *     position-keyed shuffles): threshold searches and dedups see a
  *     corpus whose near-pair count stays LINEAR in f — identical
  *     replicas would manufacture a quadratic pair explosion the real
  *     operator never faces (the fixture would measure the fixture);
  *   - events offset both event_id and user_id per replica: more
  *     users with the same per-user history, so sessionization state
  *     per key stays bounded while total volume grows ×f.
  *
  * Usage: SPARK_GRAFT_SCALE_FACTOR=10 sbt "runMain graft.ScaleAll"
  * then SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 sbt "runMain graft.Bench".
  * Idempotent per table (skips on _SUCCESS).
  */
object ScaleAll {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "/tmp/graft_sf1")
    val f = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val off = 10000000L

    def write(table: String)(mutate: (DataFrame, Int) => DataFrame): Unit = {
      val path = s"$out/$table.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val src = spark.read.parquet(s"$base/$table.parquet")
        (0 until f).map(k => mutate(src, k)).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(path)
        println(s"[scale-all] $table x$f written")
      } else println(s"[scale-all] $table x$f exists, skipped")
    }
    // deterministic position-keyed permutation (ScaleProbe.permuted)
    def permuted(arr: org.apache.spark.sql.Column, k: Int) =
      transform(
        array_sort(transform(arr,
          (x, i) => struct(xxhash64(i, lit(k)).as("h"), x.as("x")))),
        s => s.getField("x"))

    write("lineitem")((df, k) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(k * off))
      .withColumn("l_partkey", col("l_partkey") + lit(k * off)))
    write("orders")((df, k) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(k * off)))
    write("part")((df, k) => df
      .withColumn("p_partkey", col("p_partkey") + lit(k * off)))
    write("documents")((df, k) =>
      if (k == 0) df
      else df
        .withColumn("doc_id", col("doc_id") + lit(k * off))
        .withColumn("text",
          array_join(permuted(split(col("text"), " "), k), " ")))
    write("embeddings")((df, k) =>
      if (k == 0) df
      else df
        .withColumn("vec_id", col("vec_id") + lit(k * off))
        .withColumn("embedding",
          permuted(col("embedding"), k).cast("array<float>")))
    write("events")((df, k) => df
      .withColumn("event_id", col("event_id") + lit(k * off))
      .withColumn("user_id", col("user_id") + lit(k * off)))
    // dims: one copy — broadcast-sized at every factor by design
    Seq("customer", "supplier", "nation", "region")
      .foreach(t => write(t)((df, k) => if (k == 0) df else df.limit(0)))
    spark.stop()
  }
}
