package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.MLPipe

/** Mirrors the reference's pipeline lifecycle tests on the same 8-row
  * fixture (reference: tests/test_pipeline.py:30-51, :89-184), plus the
  * regression/clustering metric surface the reference config declares
  * but never wired (config/pipeline_config.yaml:109-115).
  */
class MLPipeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // feature_k of row i is i+k-1; label alternates 0/1 (ref :40-49)
  def sample: DataFrame = (1 to 8).map(i =>
    (i.toDouble, i + 1.0, i + 2.0, (i + 1) % 2)).toSeq
    .toDF("feature_1", "feature_2", "feature_3", "label")

  val features = Seq("feature_1", "feature_2", "feature_3")

  test("train random forest classification (ref :107-116)") {
    val r = MLPipe.train(sample, features, "random_forest", "classification")
    assert(r.model != null)
    assert(r.metrics.contains("accuracy"))
    assert(r.metrics("accuracy") >= 0.0 && r.metrics("accuracy") <= 1.0)
  }

  test("train logistic regression (ref :118-126)") {
    val r = MLPipe.train(sample, features, "logistic_regression",
      "classification")
    assert(Seq("areaUnderROC", "areaUnderPR", "f1", "weightedPrecision",
      "weightedRecall").forall(r.metrics.contains))
  }

  test("predict adds a prediction column (ref :128-142)") {
    val r = MLPipe.train(sample, features, "random_forest", "classification")
    val preds = MLPipe.predict(r.model, sample)
    assert(preds.columns.contains("prediction"))
    assert(preds.count() == 8)
  }

  test("save and load round-trips predictions (ref :164-184)") {
    val r = MLPipe.train(sample, features, "logistic_regression",
      "classification")
    val dir = Files.createTempDirectory("graft-model").toString + "/m"
    MLPipe.saveModel(r.model, dir)
    val loaded = MLPipe.loadModel(dir)
    val a = MLPipe.predict(r.model, sample).select("prediction")
      .as[Double].collect().toSeq
    val b = MLPipe.predict(loaded, sample).select("prediction")
      .as[Double].collect().toSeq
    assert(a == b)
  }

  test("regression task produces rmse/mae/r2") {
    val df = sample.withColumnRenamed("label", "intlabel")
      .selectExpr("feature_1", "feature_2", "feature_3",
        "cast(feature_1 * 2 + 1 as double) as label")
    val r = MLPipe.train(df, features, "linear_regression", "regression")
    assert(Seq("rmse", "mae", "r2").forall(r.metrics.contains))
    assert(r.metrics("rmse") >= 0.0)
  }

  test("clustering task produces silhouette") {
    val r = MLPipe.train(sample, features, "kmeans", "clustering")
    assert(r.metrics.contains("silhouette"))
  }

  // wider fixture for the remaining algorithm x task combinations
  // (GMM/BisectingKMeans degenerate on 8 rows)
  lazy val wide = (1 to 40).map(i =>
    (i.toDouble, (i * 7 % 13).toDouble, (i * 3 % 5).toDouble, i % 2)).toSeq
    .toDF("feature_1", "feature_2", "feature_3", "label")

  for ((algo, task) <- Seq(
      "gradient_boosting" -> "classification",
      "naive_bayes" -> "classification",
      "gradient_boosting" -> "regression",
      "random_forest" -> "regression",
      "glm" -> "regression",
      "bisecting_kmeans" -> "clustering",
      "gmm" -> "clustering"))
    test(s"train $algo/$task end to end") {
      val df = if (task == "regression")
        wide.withColumn("label",
          org.apache.spark.sql.functions.col("feature_1") * 2.0 + 1.0)
      else wide
      val r = MLPipe.train(df, features, algo, task)
      assert(r.metrics.nonEmpty)
      assert(MLPipe.predict(r.model, df).count() == 40)
    }

  test("featureImportances: tree importances sum to 1 over the named " +
      "features, linear models give |coefficients|, clustering raises") {
    // make feature_1 decisive: label = feature_1 > 4
    val df = (1 to 80).map(i => (i % 9 + 1.0, (i * 7 % 5).toDouble,
        (i * 3 % 4).toDouble, if (i % 9 + 1.0 > 4) 1 else 0))
      .toDF("feature_1", "feature_2", "feature_3", "label")
    val rf = MLPipe.train(df, features, "random_forest", "classification")
    val imp = MLPipe.featureImportances(rf.model, features).collect()
    assert(imp.map(_.getString(0)).toSet == features.toSet)
    assert(math.abs(imp.map(_.getDouble(1)).sum - 1.0) < 1e-9)
    assert(imp.head.getString(0) == "feature_1") // the decisive one
    val lr = MLPipe.train(df, features, "logistic_regression",
      "classification")
    val limp = MLPipe.featureImportances(lr.model, features).collect()
    assert(limp.forall(_.getDouble(1) >= 0.0))
    val km = MLPipe.train(df, features, "kmeans", "clustering")
    assertThrows[IllegalArgumentException] {
      MLPipe.featureImportances(km.model, features)
    }
  }

  test("unknown algorithm raises (ref get_model dispatch)") {
    intercept[IllegalArgumentException] {
      MLPipe.getModel("nope", "classification")
    }
  }

  test("seeded training is reproducible across runs") {
    val a = MLPipe.train(sample, features, "random_forest", "classification")
    val b = MLPipe.train(sample, features, "random_forest", "classification")
    val pa = MLPipe.predict(a.model, sample).select("prediction")
      .as[Double].collect().toSeq
    val pb = MLPipe.predict(b.model, sample).select("prediction")
      .as[Double].collect().toSeq
    assert(pa == pb)
  }

  test("QuantileDiscretizer bins agree with exact ntile for >95% of rows") {
    val q = SparkEntry.queries("quantile_binning")(spark,
      "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_extendedprice_binned")
    val n = SparkEntry.queries("ntile_binning")(spark,
      "/root/testdata/sf0.001")
    val joined = q.join(n,
      Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"))
    val total = joined.count()
    // ntile is 1-based, discretizer 0-based
    val agree = joined.filter(
      org.apache.spark.sql.functions.col("l_extendedprice_binned") + 1 ===
        org.apache.spark.sql.functions.col("bin")).count()
    assert(agree.toDouble / total > 0.95,
      s"approx/exact bin agreement ${agree.toDouble / total}")
  }

  test("LR hyperparameter tuning runs the reference grid (ref :258-284)") {
    val r = MLPipe.hyperparameterTuning(sample, features,
      "logistic_regression")
    assert(r.metrics.contains("accuracy"))
  }

  // the four stages the reference imports but never uses
  // (feature_engineering.py:9-12) — now real, declared-surface-complete

  test("OneHotEncoder stage: dropLast one-hot of an indexed column") {
    import org.apache.spark.ml.functions.vector_to_array
    val df = Seq(0.0, 1.0, 2.0, 1.0).toDF("idx")
    val out = MLPipe.oneHotStage("idx", "vec").fit(df).transform(df)
      .select(vector_to_array($"vec")).as[Seq[Double]].collect()
    assert(out.forall(_.size == 2)) // 3 categories, last dropped
    assert(out(0) == Seq(1.0, 0.0))
    assert(out(1) == Seq(0.0, 1.0))
    assert(out(2) == Seq(0.0, 0.0)) // last category → all zeros
  }

  test("Bucketizer stage: [a,b) split semantics") {
    val df = Seq(1.0, 2.0, 9.99, 10.0, 999.0).toDF("x")
    val out = MLPipe.bucketizerStage("x", "b",
      Array(Double.NegativeInfinity, 2.0, 10.0, Double.PositiveInfinity))
      .transform(df).select("b").as[Double].collect().toSeq
    assert(out == Seq(0.0, 1.0, 1.0, 2.0, 2.0))
  }

  test("Interaction stage: product space of the inputs") {
    import org.apache.spark.ml.functions.vector_to_array
    val df = Seq((2.0, 3.0), (4.0, 0.5)).toDF("a", "b")
    val out = MLPipe.interactionStage(Seq("a", "b"), "axb").transform(df)
      .select(vector_to_array($"axb")(0)).as[Double].collect().toSeq
    assert(out == Seq(6.0, 2.0))
  }

  test("SQLTransformer stage: __THIS__ substitution") {
    val df = Seq((2.0, 3.0)).toDF("a", "b")
    val out = MLPipe.sqlTransformerStage(
      "SELECT *, a + b AS s FROM __THIS__").transform(df)
    assert(out.columns.toSeq == Seq("a", "b", "s"))
    assert(out.select("s").as[Double].head() == 5.0)
  }
}
