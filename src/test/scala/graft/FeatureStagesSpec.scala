package graft

import org.apache.spark.ml.feature.{Bucketizer, Interaction, OneHotEncoder, SQLTransformer, StringIndexer, VectorAssembler}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{MLPipe, Tables}

/** Closes the reference's declared-but-unimplemented surface
  * (SURVEY.md §2.9 note): Imputer via MLlib, OneHotEncoder, Bucketizer,
  * Interaction, SQLTransformer (all imported-unused in the reference,
  * src/feature_engineering.py:9-12), TrainValidationSplit
  * (config/pipeline_config.yaml:87), ALS (README.md:54-58).
  */
class FeatureStagesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("MLlib Imputer with drop-and-rename mirrors the reference") {
    val df = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(2.0)), (None, Some(3.0)), (Some(4.0), None))
      .toDF("col1", "col2")
    val out = MLPipe.imputeMissing(df, Seq("col1", "col2"), "mean")
    assert(out.columns.sorted.toSeq == Seq("col1", "col2"))
    assert(out.filter(col("col1").isNull || col("col2").isNull).count() == 0)
    assert(out.agg(round(sum("col1"), 6)).head().getDouble(0) == 7.5)
  }

  test("median impute strategy") {
    val df = Seq[Option[Double]](Some(1.0), Some(2.0), Some(9.0), None)
      .toDF("col1")
    val out = MLPipe.imputeMissing(df, Seq("col1"), "median")
    assert(out.filter(col("col1") === 2.0).count() == 2)
  }

  test("OneHotEncoder expands indexed categories") {
    val df = Seq("A", "B", "A", "C").toDF("cat")
    val indexed = new StringIndexer().setInputCol("cat")
      .setOutputCol("cat_idx").fit(df).transform(df)
    val encoded = new OneHotEncoder().setInputCol("cat_idx")
      .setOutputCol("cat_vec").fit(indexed).transform(indexed)
    assert(encoded.columns.contains("cat_vec"))
    assert(encoded.count() == 4)
  }

  test("Bucketizer bins with explicit splits") {
    val df = Seq(-5.0, 0.5, 10.0, 99.0).toDF("v")
    val b = new Bucketizer().setInputCol("v").setOutputCol("bin")
      .setSplits(Array(Double.NegativeInfinity, 0.0, 1.0, 50.0,
        Double.PositiveInfinity))
    val out = b.transform(df).select("bin").as[Double].collect().toSeq
    assert(out == Seq(0.0, 1.0, 2.0, 3.0))
  }

  test("Interaction multiplies feature vectors") {
    val df = Seq((2.0, 3.0)).toDF("a", "b")
    val va = new VectorAssembler().setInputCols(Array("a")).setOutputCol("va")
    val vb = new VectorAssembler().setInputCols(Array("b")).setOutputCol("vb")
    val inter = new Interaction().setInputCols(Array("va", "vb"))
      .setOutputCol("ab")
    val out = inter.transform(vb.transform(va.transform(df)))
    val v = out.select("ab").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v(0) == 6.0)
  }

  test("SQLTransformer applies a statement over __THIS__") {
    val df = Seq((1.0, 2.0)).toDF("a", "b")
    val t = new SQLTransformer().setStatement(
      "SELECT *, a + b AS a_plus_b FROM __THIS__")
    assert(t.transform(df).select("a_plus_b").head().getDouble(0) == 3.0)
  }

  test("TrainValidationSplit tunes the declared LR grid") {
    val sample = (1 to 40).map(i =>
      (i.toDouble, i + 1.0, i + 2.0, (i + 1) % 2)).toSeq
      .toDF("feature_1", "feature_2", "feature_3", "label")
    val r = MLPipe.trainValidationTuning(sample,
      Seq("feature_1", "feature_2", "feature_3"))
    assert(r.metrics.contains("accuracy"))
  }

  test("ALS trains and recommends on events-shaped ratings") {
    val ratings = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id").cast("int").as("user"),
        (abs(hash(col("event_type"))) % 100).cast("int").as("item"),
        col("value").cast("float").as("rating"))
    val model = MLPipe.alsRecommender(ratings, "user", "item", "rating")
    val recs = model.recommendForAllUsers(3)
    assert(recs.count() > 0)
  }
}
