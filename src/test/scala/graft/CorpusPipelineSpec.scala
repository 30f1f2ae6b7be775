package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Extensions, Tables}

/** End-to-end training-data curation pipeline over the documents table:
  * exact dedup → quality filter → language filter → near-dup candidate
  * pruning — the composed flow the extension operators exist for.
  * Deterministic at every step (asserted by double run).
  */
class CorpusPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  def runPipeline(): (Long, Long, Long, Long) = {
    val docs = Tables.documents(spark, sf)
    val n0 = docs.count()

    // 1. exact dedup (deterministic survivor)
    val deduped = Extensions.dedupExact(docs, Seq("text"), "doc_id")
    val n1 = deduped.count()

    // 2. quality floor
    val stats = Extensions.textStats(deduped, "text", "doc_id")
    val quality = deduped.join(
      stats.filter(col("quality_score") >= 0.5).select("doc_id"), "doc_id")
    val n2 = quality.count()

    // 3. language keep-list via the lang column joined with prediction
    val kept = quality.filter(col("lang").isin("en", "fr", "de", "es"))
    val n3 = kept.count()

    (n0, n1, n2, n3)
  }

  test("curation pipeline filters monotonically and deterministically") {
    val a = runPipeline()
    val b = runPipeline()
    assert(a == b)
    val (n0, n1, n2, n3) = a
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3)
    assert(n3 > 0)
  }

  test("near-dup pruning removes one side of every surviving pair") {
    val docs = Tables.documents(spark, sf)
    val pairs = Extensions.simhashNearDups(docs, "text", "doc_id",
      maxHamming = 3)
    val toDrop = pairs.select(col("id_b").as("doc_id")).distinct()
    val pruned = docs.join(toDrop, Seq("doc_id"), "left_anti")
    val remaining = Extensions.simhashNearDups(pruned, "text", "doc_id",
      maxHamming = 3).count()
    assert(remaining == 0)
  }

  test("raw corpus to searchable index: segment dedup → quality gate → " +
      "indexed retrieval, end to end") {
    val docs = Tables.documents(spark, sf)
    // 1. intra-doc boilerplate removal (token-level on this corpus)
    val clean = Extensions.dedupSegments(docs, "text", "doc_id", " ")
      .select(col("doc_id"), col("dedup_text").as("text"))
    // 2. quality contract before indexing — the suite passes or we stop
    val gate = graft.engine.Quality.check(clean, Seq(
      graft.engine.Quality.Complete("text", 1.0),
      graft.engine.Quality.Unique(Seq("doc_id"), 1.0)))
    assert(gate.collect().forall(_.getBoolean(4)), "quality gate failed")
    // 3. index and retrieve — hits must come from the cleaned corpus
    val idx = graft.engine.TextIndex.build(clean, "text", "doc_id",
      nBuckets = 16)
    val hits = idx.query(
        Seq((1L, "spark window join")).toDF("query_id", "qtext"),
        "qtext", "query_id", k = 5)
      .collect()
    assert(hits.nonEmpty && hits.length <= 5)
    val ids = clean.select("doc_id").as[Long].collect().toSet
    assert(hits.forall(h => ids.contains(h.getLong(1))))
    // ranks contiguous from 1
    assert(hits.map(_.getInt(3)).sorted.toSeq == (1 to hits.length))
  }
}
