package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-cost sweep for [[graft.engine.Extensions.ivfPqTopK]]
  * (VERDICT r10 #1): grid over nprobe × PQ codebook size × subspaces ×
  * shortlist factor, reporting mean recall@10 against BOTH oracles —
  * the exact L2 scan (the metric the search actually ranks by) and the
  * exact cosine scan (the cross-metric oracle the pinned spec uses,
  * whose ceiling is the L2↔cosine agreement rate on unnormalized
  * vectors) — plus wall seconds per config. The knee of this curve
  * picks the catalog-default operating point; the chosen row is
  * recorded in BASELINE.md alongside knn_join_pruned's 0.754 precedent.
  *
  * Usage: runMain graft.RecallSweep [sfDir] — defaults to sf0.01.
  * Oracles are computed driver-side (the corpus is the sweep fixture,
  * ≤2000 × 64 floats); the swept operator itself runs the real
  * distributed plan.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.engine.Tables.embeddings(spark, sfDir)
    val rows = emb.select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val k = 10
    val qids = (0L until 20L).toSeq

    def sqDist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var j = 0
      while (j < a.length) {
        val d = a(j).toDouble - b(j).toDouble; s += d * d; j += 1 }
      s
    }
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) {
        d += a(j).toDouble * b(j).toDouble
        na += a(j).toDouble * a(j).toDouble
        nb += b(j).toDouble * b(j).toDouble; j += 1 }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = rows.toMap
    val l2Exact = qids.map { q =>
      q -> rows.filter(_._1 != q)
        .map { case (id, v) => (id, sqDist(v, byId(q))) }
        .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSet
    }.toMap
    val cosExact = qids.map { q =>
      q -> rows.filter(_._1 != q)
        .map { case (id, v) => (id, cosine(v, byId(q))) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
    val ceiling = qids.map(q =>
      l2Exact(q).intersect(cosExact(q)).size.toDouble / k).sum / qids.size
    println(f"corpus=${rows.length} dim=${rows.head._2.length} " +
      f"L2-vs-cosine oracle agreement (recall ceiling for the " +
      f"cross-metric law): $ceiling%.3f")
    println()
    println("| nCells | nprobe | m | kCode | refine | recall@10 vs L2 " +
      "| vs cosine | sec |")
    println("|---|---|---|---|---|---|---|---|")

    for (nCells <- Seq(16);
         nprobe <- Seq(4, 6, 8, 12);
         m <- Seq(4, 8);
         kCode <- Seq(16, 64, 256);
         refine <- Seq(4, 8)) {
      val t0 = System.nanoTime()
      val got = graft.engine.Extensions.ivfPqTopK(emb, "embedding",
          "vec_id", qids, k = k, nCells = nCells, nprobe = nprobe,
          m = m, kCode = kCode, refineFactor = refine)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
      val sec = (System.nanoTime() - t0) / 1e9
      def recall(oracle: Map[Long, Set[Long]]): Double =
        qids.map(q => got.getOrElse(q, Set.empty[Long])
          .intersect(oracle(q)).size.toDouble / k).sum / qids.size
      println(f"| $nCells | $nprobe | $m | $kCode | $refine " +
        f"| ${recall(l2Exact)}%.3f | ${recall(cosExact)}%.3f | $sec%.2f |")
    }
    spark.stop()
  }
}
