package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Extensions
import graft.functions.MinHashSig

/** MinHashSig: signature laws (set semantics, determinism, the
  * match-fraction ≈ Jaccard estimator) and the native near-dup
  * operator built on it (exact rescore vs a naive Jaccard reference).
  */
class MinHashSigSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def sig(text: String, k: Int, seed: Long = 42L): Seq[Long] = {
    val df = Seq(Tuple1(text)).toDF("text")
    df.select(MinHashSig.minhashSig(split(lower(col("text")), " "), k, seed)
        .as("s"))
      .head().getSeq[Long](0)
  }

  test("signature has length k and is deterministic") {
    val a = sig("the quick brown fox", 16)
    val b = sig("the quick brown fox", 16)
    assert(a.length == 16)
    assert(a == b)
    // different seed → different signature
    assert(sig("the quick brown fox", 16, seed = 7L) != a)
  }

  test("signature is a set sketch: token order and duplicates are ignored") {
    assert(sig("a b c d", 32) == sig("d c b a", 32))
    assert(sig("a b c d", 32) == sig("a a b b c c d d", 32))
  }

  test("match fraction estimates Jaccard within statistical tolerance") {
    // |A∩B| = 6, |A∪B| = 10 → J = 0.6; k = 512 → σ ≈ 0.022
    val a = sig("t1 t2 t3 t4 t5 t6 t7 t8", 512)
    val b = sig("t1 t2 t3 t4 t5 t6 x1 x2", 512)
    val match_ = a.zip(b).count { case (x, y) => x == y }.toDouble / 512
    assert(math.abs(match_ - 0.6) < 0.1, s"estimator off: $match_ vs 0.6")
  }

  test("usable from SQL and stays inside whole-stage codegen") {
    MinHashSig.register(spark)
    val df = spark.sql(
      "SELECT minhash_sig(array('a','b'), 4, 42) AS s")
    assert(df.head().getSeq[Long](0).length == 4)
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val proj = docs.select(
      MinHashSig.minhashSig(split(lower(col("text")), " "), 8).as("s"))
    proj.collect()
    val plan = proj.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.toLowerCase.contains("minhashsig"))
    assert(projLine.exists(_.contains("*(")),
      s"minhash_sig projection not codegen'd:\n$plan")
  }

  test("native near-dups: jaccard_dist is exact vs a naive reference") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),   // J(1,2) = 4/6
      (3L, "one two three four five"),
      (4L, "alpha beta gamma delta epsilon") // J(1,4) = 1
    ).toDF("doc_id", "text")
    val pairs = Extensions.minhashNearDups(docs, "text", "doc_id",
        maxJaccardDist = 1.0, numHashTables = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 4L)) == 0.0)
    assert(math.abs(pairs((1L, 2L)) - (1.0 - 4.0 / 6.0)) < 1e-12)
    // doc 3 shares no token with anyone: its minhash values collide with
    // others only by chance (~2^-64) — no pair emitted
    assert(!pairs.keys.exists { case (x, y) => x == 3L || y == 3L })
  }

  test("native near-dups: empty docs never pair (no all-sentinel band " +
      "collisions)") {
    // m empty docs share the identical all-sentinel signature — without
    // the pre-signature filter they form O(m²) candidate pairs
    val docs = ((1L to 20L).map(i => (i, "")) :+ (21L, "alpha beta") :+
      (22L, "alpha beta")).toDF("doc_id", "text")
    val pairs = Extensions.minhashNearDups(docs, "text", "doc_id",
        maxJaccardDist = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((21L, 22L)))
  }

  test("native and MLlib forms agree on near-identical pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five")
    ).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val native = ids(Extensions.minhashNearDups(docs, "text", "doc_id", 0.1))
    val mllib = ids(Extensions.minhashNearDupsMLlib(docs, "text", "doc_id", 0.1))
    assert(native == Set((1L, 2L)))
    assert(mllib == Set((1L, 2L)))
  }
}
