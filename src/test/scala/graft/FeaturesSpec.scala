package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Features

/** Mirrors the reference's per-operator tests 1:1 on the same ad-hoc
  * fixtures (reference: tests/test_pipeline.py:186-255), plus exactness
  * checks the reference's structural asserts don't cover.
  */
class FeaturesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("time features add the four derived columns (ref :186-201)") {
    val df = spark.range(10)
      .withColumn("timestamp", current_timestamp())
    val out = Features.timeFeatures(df.toDF(), "timestamp")
    for (c <- Seq("hour", "day_of_week", "day_of_month", "is_weekend"))
      assert(out.columns.contains(c))
    assert(out.count() == 10)
  }

  test("time features arithmetic semantics are the reference's (fractional)") {
    // epoch 90000 = 1970-01-02 01:00:00 UTC → hour 1.0, day_of_week
    // (90000/86400) % 7 ≈ 1.0416..., day 0 = Thursday epoch origin.
    val df = Seq(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(90000L)))
      .toDF("ts")
    val r = Features.timeFeatures(df, "ts").select("hour", "day_of_week",
      "is_weekend").head()
    assert(r.getDouble(0) == 1.0)
    assert(math.abs(r.getDouble(1) - 90000.0 / 86400 % 7) < 1e-12)
    assert(r.getInt(2) == 0)
  }

  test("ratio features guard division by zero (ref :203-211)") {
    val df = Seq((1.0, 2.0), (3.0, 4.0), (5.0, 0.0)).toDF("col1", "col2")
    val out = Features.ratioFeatures(df, Seq("col1"), Seq("col2"))
    assert(out.columns.contains("col1_to_col2_ratio"))
    val vals = out.orderBy("col1").select("col1_to_col2_ratio")
      .as[Double].collect()
    assert(vals.sameElements(Array(0.5, 0.75, 0.0)))
  }

  test("interaction features multiply pairs (ref :213-221)") {
    val df = Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0))
      .toDF("col1", "col2", "col3")
    val out = Features.interactionFeatures(df, Seq("col1", "col2", "col3"))
    for (c <- Seq("col1_x_col2", "col1_x_col3", "col2_x_col3"))
      assert(out.columns.contains(c))
    val r = out.orderBy("col1").select("col1_x_col2", "col2_x_col3")
      .as[(Double, Double)].collect()
    assert(r.sameElements(Array((2.0, 6.0), (20.0, 30.0))))
  }

  test("mean impute fills all nulls (ref :223-231)") {
    val df = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(2.0)), (None, Some(3.0)), (Some(4.0), None))
      .toDF("col1", "col2")
    val out = Features.meanImpute(df, Seq("col1", "col2"))
    assert(out.filter(col("col1_imputed").isNull).count() == 0)
    assert(out.filter(col("col2_imputed").isNull).count() == 0)
    val imputed = out.filter(col("col1").isNull)
      .select("col1_imputed").as[Double].head()
    assert(imputed == 2.5) // mean of 1.0, 4.0
  }

  test("outlier flags flag the outlier (ref :233-243)") {
    // NB the reference's own fixture (threshold 2.0, n=4) can never flag:
    // with sample stddev the max z-score of 4 rows is (n-1)/sqrt(n) = 1.5
    // — evidence their suite was never green. We assert the semantics
    // with a satisfiable threshold instead.
    val df = Seq(1.0, 2.0, 3.0, 100.0).toDF("value")
    val out = Features.outlierFlags(df, Seq("value"), threshold = 1.4)
    assert(out.filter(col("value_is_outlier") === 1).count() == 1)
    assert(out.filter(col("value") === 100.0)
      .select("value_is_outlier").as[Int].head() == 1)
  }

  test("frequency encoding counts occurrences (ref :245-255)") {
    val df = Seq("A", "B", "A", "C", "A").toDF("category")
    val out = Features.frequencyEncoding(df, Seq("category"))
    assert(out.columns.contains("category_freq"))
    assert(out.filter(col("category") === "A")
      .select("category_freq").as[Long].head() == 3L)
  }

  test("aggregation features join group stats back (ref semantics)") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("g", "v")
    val out = Features.aggregationFeatures(df, Seq("g"), Seq("v"))
    assert(out.count() == 3)
    val r = out.filter(col("g") === "a").select("v_mean", "v_count")
      .as[(Double, Long)].head()
    assert(r == ((2.0, 2L)))
  }

  test("lag features shift within partition") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
      (2L, 4L, 40.0)).toDF("user_id", "event_id", "value")
    val out = Features.lagFeatures(df, Seq("user_id"), "event_id",
      Seq("value"), Seq(1))
    val r = out.orderBy("event_id").select("value_lag_1")
      .as[Option[Double]].collect()
    assert(r.sameElements(Array(None, Some(10.0), Some(20.0), None)))
  }

  test("rolling features average over trailing row frame") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0))
      .toDF("user_id", "event_id", "value")
    val out = Features.rollingFeatures(df, Seq("user_id"), "event_id",
      Seq("value"), Seq(1))
    val r = out.orderBy("event_id")
      .select("value_rolling_mean_1", "value_rolling_sum_1")
      .as[(Double, Double)].collect()
    assert(r.sameElements(Array((10.0, 10.0), (15.0, 30.0), (25.0, 50.0))))
  }

  test("target encoding attaches in-sample group means") {
    val df = Seq(("x", 1.0), ("x", 3.0), ("y", 10.0)).toDF("cat", "t")
    val out = Features.targetEncoding(df, Seq("cat"), "t")
    assert(out.filter(col("cat") === "x")
      .select("cat_target_mean").as[Double].head() == 2.0)
  }

  test("binning features are monotone in the binned value (ref :87-101)") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Features.binningFeatures(df, Seq("v"), numBuckets = 4)
      .orderBy("v").select("v", "v_binned").as[(Double, Double)].collect()
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq) // monotone
    assert(out.map(_._2).distinct.length == 4)
  }

  test("polynomial features expand the vector (ref :103-114)") {
    val df = Seq((2.0, 3.0)).toDF("a", "b")
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("a", "b")).setOutputCol("v")
    val out = Features.polynomialFeatures(va.transform(df), "v", degree = 2)
    val poly = out.select("v_poly").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(poly.toArray.toSeq == Seq(2.0, 4.0, 3.0, 6.0, 9.0))
  }

  test("pca features reduce to k dimensions (ref :116-128)") {
    val df = (1 to 20).map(i => (i.toDouble, i * 2.0, i % 3 * 1.0))
      .toDF("a", "b", "c")
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("a", "b", "c")).setOutputCol("v")
    val out = Features.pcaFeatures(va.transform(df), "v", k = 2)
    val pca = out.select("v_pca").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(pca.size == 2)
  }

  test("wide feature frames (1000+ derived columns) stay analyzable") {
    // the reference claims 10k+ features (README.md:134) built via
    // withColumn loops (quadratic analyzer cost); our single-select form
    // keeps analysis linear — 45 base cols -> 990 interactions
    val base = (1 to 45).map(i => s"c$i")
    val row = base.indices.map(_.toDouble)
    val df = Seq(1).toDF("seed").select(
      base.zipWithIndex.map { case (c, i) => lit(row(i)).as(c) }: _*)
    val t0 = System.nanoTime()
    val wide = Features.interactionFeatures(df, base)
    assert(wide.columns.length == 45 + 45 * 44 / 2) // 1035 columns
    val r = wide.select("c2_x_c3").as[Double].head()
    assert(r == 1.0 * 2.0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 30.0, s"wide-plan analysis took ${secs}s")
  }

  test("feature pipeline chains config-selected steps (ref :252-277)") {
    val df = Seq((1.0, 2.0), (3.0, 0.0)).toDF("num", "den")
    val cfg = Features.FeatureConfig(
      ratio = Some(Features.RatioSpec(Seq("num"), Seq("den"))),
      missing = Some("drop"))
    val out = Features.featurePipeline(df, cfg)
    assert(out.columns.contains("num_to_den_ratio"))
    assert(out.count() == 2)
  }

  test("winsorize clips into exact percentile bounds; interior values " +
      "untouched; row count preserved") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val out = Features.winsorize(df, "v", loP = 0.1, hiP = 0.9)
      .select("v", "v_wins").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // P10 of 1..100 (linear interp) = 10.9; P90 = 90.1
    assert(math.abs(out(1.0) - 10.9) < 1e-9 &&
      math.abs(out(5.0) - 10.9) < 1e-9)
    assert(math.abs(out(100.0) - 90.1) < 1e-9 &&
      math.abs(out(95.0) - 90.1) < 1e-9)
    assert(out(50.0) == 50.0)
    assert(out.size == 100)
  }

  test("robustScale centers the median at zero and spans IQR=1; " +
      "constant column yields null (zero IQR guard)") {
    val df = (1 to 101).map(_.toDouble).toDF("v")
    val out = Features.robustScale(df, "v")
      .select("v", "v_robust").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(51.0) == 0.0)          // median
    assert(out(76.0) == 0.5 && out(26.0) == -0.5) // quartiles, IQR 50
    val const = Seq(7.0, 7.0, 7.0).toDF("v")
    val c = Features.robustScale(const, "v").select("v_robust").collect()
    assert(c.forall(_.isNullAt(0)))
  }

  test("targetEncodingOof: a row never sees its own fold's targets, " +
      "smoothing shrinks toward the global prior, and a single-fold " +
      "category collapses to the prior exactly") {
    // category X: ids 0 (fold 0, v=1.00) and 1 (fold 1, v=3.00)
    // category Y: ids 2 (fold 0, v=5.00) and 3 (fold 1, v=7.00)
    // category Z: id 4 (fold 0, v=9.00) — single-fold category
    val df = Seq(
      (0L, "X", 1.00), (1L, "X", 3.00),
      (2L, "Y", 5.00), (3L, "Y", 7.00),
      (4L, "Z", 9.00)).toDF("id", "cat", "t")
    val m = 2.0
    val out = Features.targetEncodingOof(df, "cat", "t", "id",
        folds = 2, smoothing = m, valueScale = 100)
      .orderBy("id").select("cat_te_oof").as[Double].collect()
    val prior = (100.0 + 300 + 500 + 700 + 900) / 5 // cents
    def te(catSum: Long, foldSum: Long, catCnt: Long, foldCnt: Long) =
      math.rint(((catSum - foldSum).toDouble + m * prior) /
        ((catCnt - foldCnt).toDouble + m) / 100 * 1e6) / 1e6
    // id 0 (X, fold 0): other-fold = id 1's 300 cents only
    assert(out(0) == te(400, 100, 2, 1))
    assert(out(1) == te(400, 300, 2, 1))
    assert(out(2) == te(1200, 500, 2, 1))
    assert(out(3) == te(1200, 700, 2, 1))
    // id 4: category Z is entirely inside fold 0 → (0 + m·prior)/(0+m)
    // = prior exactly, never a 0/0
    assert(out(4) == te(900, 900, 1, 1))
    assert(math.abs(out(4) - prior / 100) < 1e-6)
    // leakage check against the in-sample encoder: the naive mean FOR
    // id 0 includes its own target; the OOF one must not
    val naive = (100.0 + 300) / 2 / 100
    assert(out(0) != naive)
  }
}
