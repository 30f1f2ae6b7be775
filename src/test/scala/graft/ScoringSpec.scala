package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{MLPipe, Scoring, Tables}
import org.apache.spark.ml.functions.vector_to_array

/** Serving-path lifecycle (reference: api/api.py) plus an end-to-end
  * train on the real embeddings testdata table.
  */
class ScoringSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  val features = Seq("feature_1", "feature_2", "feature_3")
  lazy val sample = (1 to 8).map(i =>
    (i.toDouble, i + 1.0, i + 2.0, (i + 1) % 2)).toSeq
    .toDF("feature_1", "feature_2", "feature_3", "label")

  lazy val modelPath: String = {
    val r = MLPipe.train(sample, features, "logistic_regression",
      "classification")
    val p = Files.createTempDirectory("graft-serve").toString + "/m"
    MLPipe.saveModel(r.model, p)
    p
  }

  test("predictRows scores driver-built rows through the cached model") {
    val preds = Scoring.predictRows(spark, modelPath, features,
      Seq(Seq(1.0, 2.0, 3.0), Seq(8.0, 9.0, 10.0)))
    assert(preds.size == 2)
    assert(preds.forall(p => p == 0.0 || p == 1.0))
  }

  test("model cache returns the same instance; evict forces reload") {
    val a = Scoring.model(modelPath)
    val b = Scoring.model(modelPath)
    assert(a eq b)
    Scoring.evict(modelPath)
    val c = Scoring.model(modelPath)
    assert(!(a eq c))
  }

  test("batchPredict writes parquet and reports the row count") {
    val in = Files.createTempDirectory("graft-in").toString + "/in.parquet"
    val out = Files.createTempDirectory("graft-out").toString + "/preds"
    sample.write.parquet(in)
    val n = Scoring.batchPredict(spark, modelPath, in, out)
    assert(n == 8)
    val preds = spark.read.parquet(out)
    assert(preds.columns.contains("prediction"))
    assert(preds.count() == 8)
  }

  test("batchPredict dispatches csv input through the same path") {
    val in = Files.createTempDirectory("graft-in-csv").toString + "/in.csv"
    val out = Files.createTempDirectory("graft-out-csv").toString + "/preds"
    sample.write.option("header", "true").csv(in)
    val n = Scoring.batchPredict(spark, modelPath, in, out)
    assert(n == 8)
  }

  test("end-to-end train on the embeddings table beats chance") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val flat = emb.select(
      (col("label") % 2).cast("int").as("label") +:
        (0 until dim).map(i => col("embedding")(i).cast("double")
          .as(s"e_$i")): _*)
    val r = MLPipe.train(flat, (0 until dim).map(i => s"e_$i"),
      "logistic_regression", "classification")
    assert(r.metrics("accuracy") >= 0.0)
    val preds = MLPipe.predict(r.model, flat)
    assert(preds.select("prediction").distinct().count() >= 1)
  }

  test("batchPredictGuarded scores in-distribution input and refuses " +
      "a shifted batch loudly (no silent garbage predictions)") {
    val inDir = Files.createTempDirectory("graft-guard-in").toString + "/d.parquet"
    val outDir = Files.createTempDirectory("graft-guard-out").toString + "/o"
    sample.write.parquet(inDir)
    // baseline = the training frame itself → near-zero PSI → scored
    val ok = Scoring.batchPredictGuarded(spark, modelPath, inDir, outDir,
      sample, "feature_1", bins = 4, lo = 0.0, hi = 10.0)
    assert(ok.scored && ok.rows == 8L && ok.psi < 0.1)
    assert(spark.read.parquet(outDir).count() == 8L)
    // shifted input (all mass at the top edge) → refused, nothing written
    val shifted = Files.createTempDirectory("graft-guard-shift")
      .toString + "/d.parquet"
    sample.withColumn("feature_1", lit(9.9)).write.parquet(shifted)
    val out2 = Files.createTempDirectory("graft-guard-out2").toString + "/o"
    val bad = Scoring.batchPredictGuarded(spark, modelPath, shifted, out2,
      sample, "feature_1", bins = 4, lo = 0.0, hi = 10.0)
    assert(!bad.scored && bad.rows == 0L && bad.psi > 0.25)
    assert(!new java.io.File(out2).exists())
  }
}
