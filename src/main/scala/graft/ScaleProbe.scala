package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the most expensive catalog shapes (BASELINE.md
  * §scaling): replicates the sf0.1 inputs by factors (disjoint id-offset
  * copies — the ideal-linear fixture: per-group cardinality and graph
  * density stay constant while volume grows), times each shape cold at
  * each factor, and fits the log-log slope. An exponent near 1 means the
  * plan's work actually scales with input size; super-linear flags an
  * accidental quadratic (the thing the O(sf) claims in the scaladocs
  * assert but sf0.1 alone cannot test).
  *
  * Fixture notes, because they decide what an exponent MEANS here:
  *  - lineitem replicas offset BOTH l_orderkey and l_partkey → disjoint
  *    co-occurrence graphs. Density constant, volume ×f: clean probe.
  *  - documents replicas are word-SHUFFLED (seeded) copies: exact-copy
  *    replicas would make every doc collide with its f−1 twins and the
  *    near-dup pair count quadratic IN THE FIXTURE — a shuffled word
  *    order destroys shingle overlap, so cross-replica collisions stay
  *    rare and the probe measures the engine, not the fixture.
  *  - embeddings replicate as-is (identical vectors re-labelled): IVF
  *    cells grow ×f at fixed cell count — the linear regime the
  *    operator's own scaling story (grow nCells with corpus) sits on top
  *    of.
  *
  * Emits one JSON line:
  * {"queries":{name:{"t":{f:sec},"exponent":x}},"factors":[...]}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partitions ∝ data is the production norm (AQE derives it from
    // shuffle stats); pinning 32 across a 10× volume sweep measures the
    // spill knee, not the algorithm — the knob lets the probe separate
    // the two (see BASELINE.md §scaling)
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val off = 10000000L

    def replicated(table: String, f: Int,
        mutate: (DataFrame, Int) => DataFrame): String = {
      val path = s"$work/f$f/$table.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val src = spark.read.parquet(s"$base/$table.parquet")
        (0 until f).map(k => mutate(src, k)).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(path)
      }
      path
    }
    def lineitemAt(f: Int): DataFrame = spark.read.parquet(
      replicated("lineitem", f, (df, k) => df
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * off))
        .withColumn("l_partkey", col("l_partkey") + lit(k * off))))
    def documentsAt(f: Int): DataFrame = spark.read.parquet(
      replicated("documents", f, (df, k) =>
        if (k == 0) df
        else df
          .withColumn("doc_id", col("doc_id") + lit(k * off))
          .withColumn("text",
            array_join(shuffle(split(col("text"), " ")), " "))))
    def embeddingsAt(f: Int): DataFrame = spark.read.parquet(
      replicated("embeddings", f, (df, k) => df
        .withColumn("vec_id", col("vec_id") + lit(k * off))))

    // the catalog's exact edge build (AnalyticsQueries triangle_count /
    // edge_jaccard): in-array ordered pairs per order
    def orderEdges(li: DataFrame, minCo: Long): DataFrame = {
      val pairs = li
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
        .select(explode(flatten(transform(col("__items"), (a, i) =>
          transform(
            slice(col("__items"), i + lit(2), size(col("__items"))),
            b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
        .select(col("__p.part_a"), col("__p.part_b"))
      if (minCo <= 1) pairs
      else pairs.groupBy("part_a", "part_b").agg(count(lit(1)).as("__co"))
        .filter(col("__co") >= minCo)
        .select("part_a", "part_b")
    }

    val shapes: Seq[(String, Int => DataFrame)] = Seq(
      "basket_affinity" -> (f => graft.engine.Analytics.basketAffinity(
        lineitemAt(f), "l_orderkey", "l_partkey")),
      "triangle_count" -> (f => graft.engine.Analytics.triangleCount(
        orderEdges(lineitemAt(f), minCo = 2), "part_a", "part_b",
        outCol = "part_id")),
      "edge_jaccard" -> (f => graft.engine.Analytics.edgeJaccard(
          orderEdges(lineitemAt(f), minCo = 1), "part_a", "part_b")
        .orderBy(desc("jaccard"), col("part_a"), col("part_b")).limit(100)),
      "dedup_clusters" -> (f => graft.engine.Extensions.dedupClusters(
        documentsAt(f), "text", "doc_id", maxHamming = 3)),
      "ann_ivf" -> (f => graft.engine.Extensions.annIvf(
        embeddingsAt(f), "embedding", "vec_id",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)))

    // generate everything first so write time never leaks into a timing,
    // then one JVM warmup pass at the smallest factor
    factors.foreach { f => lineitemAt(f); documentsAt(f); embeddingsAt(f) }
    shapes.foreach { case (_, mk) => mk(factors.head).count() }

    val times = shapes.map { case (name, mk) =>
      name -> factors.map { f =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk(f).count()
        f -> (System.nanoTime() - t0) / 1e9
      }
    }
    def exponent(ts: Seq[(Int, Double)]): Double = {
      val xs = ts.map(t => math.log(t._1.toDouble))
      val ys = ts.map(t => math.log(t._2))
      val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      math.rint(cov / vx * 100) / 100
    }
    val qs = times.map { case (name, ts) =>
      val tj = ts.map { case (f, t) =>
        s""""$f":${math.rint(t * 1000) / 1000}""" }.mkString("{", ",", "}")
      s""""$name":{"t":$tj,"exponent":${exponent(ts)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"queries":$qs,"factors":[${factors.mkString(",")}],"base":"$base"}""")
    spark.stop()
  }
}
