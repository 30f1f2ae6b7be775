package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for the optimization rounds (guide §1:
  * decide with measurements, not plan-reading alone). Times isolated
  * sub-plans of the heavy catalog entries with the noop sink so the
  * numbers are computation, not sink or driver-collect. Local
  * iteration tooling only — the driver never runs this main.
  *
  * Usage: runMain graft.OptProbe <sfDir> <probe>[,<probe>...]
  */
object OptProbe {
  private def time(spark: SparkSession, label: String)(df: => DataFrame): Unit = {
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[optprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    spark.sparkContext.setJobDescription(null)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probes = args(1).split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    if (probes("qlr")) {
      import graft.engine.Extensions
      // piecewise: tokenize+feature stream, docF agg, counts assembly,
      // gopher labels, the full train join — each twice (warm second)
      val b = 512L
      def toks(d: DataFrame) = d.select(col("doc_id"),
        filter(Extensions.tokens(col("text")), x => x =!= lit("")).as("__toks"))
      def featStream(d: DataFrame) = toks(d).select(col("doc_id"),
        explode(concat(col("__toks"), zip_with(
          slice(col("__toks"), lit(1), greatest(lit(0), size(col("__toks")) - 1)),
          slice(col("__toks"), lit(2), greatest(lit(0), size(col("__toks")) - 1)),
          (x, y) => concat(x, lit(" "), y)))).as("__feat"))
        .select(col("doc_id"),
          pmod(Extensions.md5Hash60(col("__feat")), lit(b)).as("__f"))
      def docF(d: DataFrame) = featStream(d)
        .filter(col("doc_id").isNotNull && col("__f").isNotNull)
        .groupBy(col("doc_id"), col("__f"))
        .agg(count(lit(1)).as("__n"))
      (1 to 2).foreach { i =>
        time(spark, s"qlr.featStream r$i")(featStream(docs))
        time(spark, s"qlr.featStream.wide r$i")(featStream(docs.repartition(cpus.toInt)))
        time(spark, s"qlr.docF r$i")(docF(docs))
        time(spark, s"qlr.counts(map assembly) r$i") {
          docF(docs).groupBy("doc_id")
            .agg(map_from_entries(collect_list(
              struct(col("__f").cast("int"), col("__n").cast("double")))).as("__m"))
            .select(col("doc_id"),
              org.apache.spark.ml.functions.array_to_vector(
                transform(sequence(lit(0), lit(511)),
                  k => coalesce(element_at(col("__m"), k), lit(0.0)))).as("__vec"))
        }
        time(spark, s"qlr.gopher r$i")(
          Extensions.gopherRules(docs, "text", "doc_id"))
        time(spark, s"qlr.gopher.wide r$i")(
          Extensions.gopherRules(docs.repartition(cpus.toInt), "text", "doc_id"))
        time(spark, s"qlr.counts(pivot assembly) r$i") {
          docF(docs).groupBy("doc_id")
            .pivot(col("__f"), (0 until 512).map(_.toLong))
            .agg(sum("__n"))
            .select(col("doc_id"),
              org.apache.spark.ml.functions.array_to_vector(
                array((0 until 512).map(k =>
                  coalesce(col(s"$k").cast("double"), lit(0.0))): _*)).as("__vec"))
        }
        time(spark, s"qlr.counts(map assembly, wide post) r$i") {
          docF(docs.repartition(cpus.toInt)).groupBy("doc_id")
            .agg(map_from_entries(collect_list(
              struct(col("__f").cast("int"), col("__n").cast("double")))).as("__m"))
            .repartition(cpus.toInt, col("doc_id"))
            .select(col("doc_id"),
              org.apache.spark.ml.functions.array_to_vector(
                transform(sequence(lit(0), lit(511)),
                  k => coalesce(element_at(col("__m"), k), lit(0.0)))).as("__vec"))
        }
      }
    }

    if (probes("ej")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      def edges(wide: Boolean) = {
        val base = li.select(col("l_orderkey"), col("l_partkey"))
        val src = if (wide) graft.engine.Extensions.widen(base) else base
        src.groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
          .select(explode(flatten(transform(col("__items"), (a, i) =>
            transform(
              slice(col("__items"), i + lit(2), size(col("__items"))),
              b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
          .select(col("__p.part_a"), col("__p.part_b"))
      }
      (1 to 3).foreach { i =>
        time(spark, s"ej.full.narrow r$i")(
          graft.engine.Analytics.edgeJaccard(edges(false), "part_a", "part_b")
            .orderBy(desc("jaccard"), col("part_a"), col("part_b")).limit(100))
        time(spark, s"ej.full.wide r$i")(
          graft.engine.Analytics.edgeJaccard(edges(true), "part_a", "part_b")
            .orderBy(desc("jaccard"), col("part_a"), col("part_b")).limit(100))
        time(spark, s"ej.edges.narrow r$i")(edges(false))
        time(spark, s"ej.edges.wide r$i")(edges(true))
      }
    }

    if (probes("knn")) {
      // the pair-scan tail in isolation: 1-partition input vs widened
      val withNorm = emb.select(col("vec_id"), col("embedding"))
        .withColumn("__n", sqrt(graft.engine.Extensions.dot(col("embedding"), col("embedding"))))
      def tail(q: DataFrame): DataFrame = {
        val queries = q.select(col("vec_id").as("query_id"),
          col("embedding").as("__q"), col("__n").as("__qn"))
        val candidates = withNorm.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("__e"), col("__n").as("__en"))
        queries.crossJoin(candidates)
          .filter(col("neighbor_id") =!= col("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            round(when(col("__en") =!= 0 && col("__qn") =!= 0,
              graft.engine.Extensions.dot(col("__e"), col("__q")) / (col("__en") * col("__qn")))
              .otherwise(0.0), 6).as("cosine_sim"))
          .groupBy("query_id").agg(max("cosine_sim"))
      }
      (1 to 2).foreach { i =>
        time(spark, s"knn.pairscan.narrow r$i")(tail(withNorm))
        time(spark, s"knn.pairscan.wide r$i")(tail(withNorm.repartition(cpus.toInt)))
      }
    }

    spark.stop()
  }
}
