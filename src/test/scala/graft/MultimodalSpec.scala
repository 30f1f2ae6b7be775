package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Multimodal, Tables}

/** Multimodal plumbing: schema, deterministic stub decode, partition
  * shaping. The decode itself is a stub (no codec libs in this
  * container) — these tests pin the Spark-side contract.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  lazy val media = Multimodal.fromText(
    Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")

  test("media table carries binary payload + typed metadata") {
    val schema = media.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("content") == "binary")
    assert(schema("n_bytes") == "bigint")
    assert(media.count() == 500)
  }

  test("feature extraction is deterministic and batch-shaped") {
    val ds = media.as[Multimodal.MediaRow]
    val a = Multimodal.extractFeatures(ds, dim = 16).orderBy("media_id")
      .select("features").as[Array[Float]].head()
    val b = Multimodal.extractFeatures(ds, dim = 16).orderBy("media_id")
      .select("features").as[Array[Float]].head()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 16)
    assert(a.sum > 0f)
  }

  test("decode stub folds bytes stably") {
    val f = Multimodal.decodeStub("abcd".getBytes("UTF-8"), dim = 2)
    // 'a'+'c' on lane 0, 'b'+'d' on lane 1, each /255
    assert(math.abs(f(0) - (97 + 99) / 255.0f) < 1e-6)
    assert(math.abs(f(1) - (98 + 100) / 255.0f) < 1e-6)
  }

  test("size-aware repartitioning follows bytes not rows") {
    val out = Multimodal.repartitionBySize(media, totalBytes = 10L << 20,
      targetBytes = 1L << 20)
    assert(out.rdd.getNumPartitions == 10)
  }
}
