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

    if (probes("ej2")) {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      def edges() = li
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
        .select(explode(flatten(transform(col("__items"), (a, i) =>
          transform(
            slice(col("__items"), i + lit(2), size(col("__items"))),
            b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
        .select(col("__p.part_a"), col("__p.part_b"))
      // replicate edgeJaccard's body with variants
      def adjOf(e: DataFrame) = e
        .filter(col("part_a").isNotNull && col("part_b").isNotNull &&
          col("part_a") =!= col("part_b"))
        .select(explode(array(
          struct(col("part_a").as("n"), col("part_b").as("m")),
          struct(col("part_b").as("n"), col("part_a").as("m")))).as("__e"))
        .select(col("__e.n").as("__n"), col("__e.m").as("__m"))
        .groupBy("__n")
        .agg(sort_array(collect_set(col("__m"))).as("__nbrs"))
      def tail(adj: DataFrame, pin: Boolean) = {
        val probe = adj
          .select(col("__n"), col("__nbrs").as("__nba"),
            explode(filter(col("__nbrs"), m => m > col("__n"))).as("__m"))
        val probe2 = if (pin)
          probe.repartition(spark.sparkContext.defaultParallelism,
            col("__m"))
        else probe
        probe2
          .join(adj.select(col("__n").as("__m"), col("__nbrs").as("__nbb"))
            .hint("shuffle_hash"), "__m")
          .select(col("__n").as("part_a"), col("__m").as("part_b"),
            size(array_intersect(col("__nba"), col("__nbb"))).cast("long")
              .as("common_cnt"),
            size(col("__nba")).cast("long").as("deg_a"),
            size(col("__nbb")).cast("long").as("deg_b"))
          .withColumn("jaccard",
            round(col("common_cnt").cast("double") /
              (col("deg_a") + col("deg_b") - col("common_cnt"))
                .cast("double"), 6))
          .orderBy(desc("jaccard"), col("part_a"), col("part_b"))
          .limit(100)
      }
      val P = spark.sparkContext.defaultParallelism
      def edgesPinned() = li
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
        .repartition(P)
        .select(explode(flatten(transform(col("__items"), (a, i) =>
          transform(
            slice(col("__items"), i + lit(2), size(col("__items"))),
            b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
        .select(col("__p.part_a"), col("__p.part_b"))
      def tailAdjPinned(adjIn: DataFrame) = {
        val adj = adjIn.repartition(P)
        tail(adj, pin = false)
      }
      (1 to 3).foreach { i =>
        time(spark, s"ej2.v0.current r$i")(tail(adjOf(edges()), pin = false))
        time(spark, s"ej2.v4.aggpins r$i")(
          tailAdjPinned(adjOf(edgesPinned())))
        time(spark, s"ej2.v5.adjpin r$i")(tailAdjPinned(adjOf(edges())))
        time(spark, s"ej2.v6.edgepin r$i")(
          tail(adjOf(edgesPinned()), pin = false))
        time(spark, s"ej2.v2.pinned r$i")(tail(adjOf(edges()), pin = true))
        locally {
          val adj = adjOf(edges())
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          time(spark, s"ej2.v1.persist r$i")(tail(adj, pin = false))
          adj.unpersist()
        }
        locally {
          val adj = adjOf(edges())
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          time(spark, s"ej2.v3.persist+pin r$i")(tail(adj, pin = true))
          adj.unpersist()
        }
      }
    }

    if (probes("rrf2")) {
      import graft.engine.Extensions
      import spark.implicits._
      val qids = Seq(0L, 1L, 2L)
      val qDocs = docs.filter(col("doc_id").isin(qids: _*))
        .select(col("doc_id").as("query_id"), col("text").as("__qtext"))
      (1 to 3).foreach { i =>
        time(spark, s"rrf2.lex r$i")(
          Extensions.bm25TopK(docs, "text", "doc_id", qDocs,
            "__qtext", "query_id", 21))
        time(spark, s"rrf2.dense r$i")(
          Extensions.cosineTopK(emb, "embedding", "vec_id", qids, 20))
        time(spark, s"rrf2.full r$i")(
          Extensions.rrfFusion(docs, "text", "doc_id", emb, "embedding",
            "vec_id", qids, 20, 10, 60))
      }
    }

    if (probes("qstage")) {
      val qname = sys.env.getOrElse("SPARK_GRAFT_QSTAGE", "rrf_fusion")
      @volatile var stages = Vector.empty[(Int, String, Int, Long, Long)]
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = sc.stageInfo
            stages :+= ((si.stageId, si.name.take(60), si.numTasks,
              si.completionTime.getOrElse(0L) -
                si.submissionTime.getOrElse(0L),
              si.taskMetrics.executorRunTime))
          }
        })
      (1 to 2).foreach { i =>
        stages = Vector.empty
        val t0 = System.nanoTime()
        SparkEntry.queries(qname)(spark, sfDir).count()
        println(f"[optprobe] qstage($qname) r$i total ${(System.nanoTime() - t0) / 1e9}%.3f s")
        Thread.sleep(400)
        stages.foreach { case (id, n, nt, wall, run) =>
          println(f"[optprobe]   stage$id%4d tasks=$nt%3d wall=${wall / 1e3}%7.3f s cpuSum=${run / 1e3}%8.3f s  $n%s")
        }
      }
    }

    if (probes("ejstage")) {
      @volatile var stages = Vector.empty[(Int, String, Int, Long, Long)]
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val si = sc.stageInfo
            stages :+= ((si.stageId, si.name.take(60), si.numTasks,
              si.completionTime.getOrElse(0L) -
                si.submissionTime.getOrElse(0L),
              si.taskMetrics.executorRunTime))
          }
        })
      (1 to 2).foreach { i =>
        stages = Vector.empty
        val t0 = System.nanoTime()
        SparkEntry.queries("edge_jaccard")(spark, sfDir).count()
        println(f"[optprobe] ejstage r$i total ${(System.nanoTime() - t0) / 1e9}%.3f s")
        Thread.sleep(400)
        stages.foreach { case (id, n, nt, wall, run) =>
          println(f"[optprobe]   stage$id%4d tasks=$nt%3d wall=${wall / 1e3}%7.3f s cpuSum=${run / 1e3}%8.3f s  $n%s")
        }
      }
    }

    def phase(label: String)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      body
      println(f"[optprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }

    if (probes("bm25del")) {
      import graft.engine.TextIndex
      import spark.implicits._
      (1 to 3).foreach { i =>
        val dir = java.nio.file.Files.createTempDirectory("probe-bm25")
          .toString
        var idx: TextIndex = null
        var loaded: TextIndex = null
        phase(s"bm25.build r$i") {
          idx = TextIndex.build(docs, "text", "doc_id", nBuckets = 16) }
        phase(s"bm25.save r$i") { idx.save(s"$dir/idx") }
        phase(s"bm25.delete r$i") {
          TextIndex.delete(spark, s"$dir/idx",
            docs.filter(col("doc_id") < 25).select("doc_id"),
            "doc_id", "take-down-1") }
        phase(s"bm25.load r$i") {
          loaded = TextIndex.load(spark, s"$dir/idx") }
        phase(s"bm25.query r$i") {
          loaded.query(Seq(0L -> "fast hash join", 1L -> "spark window agg",
              2L -> "slow scan filter").toDF("query_id", "query_text"),
            "query_text", "query_id", k = 10)
            .orderBy("query_id", "rank").count() }
      }
    }

    if (probes("ivftree")) {
      import graft.engine.IvfIndex
      (1 to 3).foreach { i =>
        val dir = java.nio.file.Files.createTempDirectory("probe-ivft")
          .toString
        var idx: IvfIndex = null
        var loaded: IvfIndex = null
        phase(s"ivftree.build r$i") {
          idx = IvfIndex.build(emb, "embedding", "vec_id", nCells = 64) }
        phase(s"ivftree.save r$i") { idx.save(s"$dir/idx") }
        phase(s"ivftree.load r$i") {
          loaded = IvfIndex.load(spark, s"$dir/idx", "vec_id", "embedding") }
        phase(s"ivftree.query r$i") {
          loaded.queryByIds(Seq(0L, 1L, 2L, 3L, 4L), k = 10, nprobe = 8)
            .orderBy("query_id", "rank").count() }
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
