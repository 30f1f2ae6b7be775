package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-level profiler for one or more catalog queries (optimization
  * tooling, guide §1: measure first). Runs each named query with a
  * SparkListener that records every job's wall time and description,
  * so the per-query cost decomposes into "N jobs × where the time
  * went" instead of one opaque number. Local iteration only — the
  * driver never runs this main.
  *
  * Usage: runMain graft.Profile <sfDir> <name>[,<name>...] [repeat]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench so first-query numbers are comparable
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      val micro = spark.range(64L)
        .select(col("id"), (col("id") % 8).as("k"))
      micro.join(broadcast(micro.select(col("k").as("k2")).distinct()),
          col("k") === col("k2"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k")
            .orderBy("id")))
        .groupBy("k").agg(sum("rn")).count()
      val pts = spark.range(32L).select(
        org.apache.spark.ml.functions.array_to_vector(
          array(rand(7L), rand(11L))).as("__vec"))
      new org.apache.spark.ml.clustering.KMeans()
        .setFeaturesCol("__vec").setK(2).setSeed(1L).setMaxIter(1).fit(pts)
      graft.engine.ExtensionQueries.warmHybridIndexes(spark, sfDir)
    }
    @volatile var jobs =
      Vector.empty[(Int, Long, String, Int)] // id, ms, desc, nStages
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc, js.stageIds.size))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, d, ns) =>
          jobs :+= ((je.jobId, je.time - t0, d, ns))
        }
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to repeat).foreach { r =>
        jobs = Vector.empty
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat to drain
        Thread.sleep(300)
        println(f"[profile] $name run$r%d total=$sec%.3f s, " +
          f"jobs=${jobs.size}%d, jobTimeSum=${jobs.map(_._2).sum / 1e3}%.3f s")
        jobs.sortBy(-_._2).take(200).foreach { case (id, ms, d, ns) =>
          println(f"[profile]   job$id%4d ${ms / 1e3}%8.3f s  stages=$ns%2d  ${d.take(100)}%s")
        }
      }
    }
    spark.stop()
  }
}
