package graft.engine

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, NaiveBayes, RandomForestClassifier}
import org.apache.spark.ml.clustering.{BisectingKMeans, GaussianMixture, KMeans}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, ClusteringEvaluator, MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{Binarizer, Bucketizer, Interaction, MaxAbsScaler, MinMaxScaler, Normalizer, OneHotEncoder, SQLTransformer, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.{GBTRegressor, GeneralizedLinearRegression, LinearRegression, RandomForestRegressor}
import org.apache.spark.ml.feature.Imputer
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder, TrainValidationSplit}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StringType

/** The reference's ML pipeline surface re-expressed on
  * `org.apache.spark.ml` (reference: src/ml_pipeline.py). Same stage
  * semantics and hyperparameters; pure Scala API.
  *
  * Scale note: every estimator here trains via Spark's distributed
  * implementations (tree ensembles, LBFGS, k-means||) — nothing below
  * collects training data to the driver.
  */
object MLPipe {

  /** StringIndexer("keep") per string col → VectorAssembler("skip") →
    * StandardScaler(withStd, !withMean), exactly the reference's
    * build_feature_pipeline (reference: src/ml_pipeline.py:76-113).
    * String/numeric split is runtime schema introspection, like the
    * reference's `dataType.simpleString()` filtering.
    */
  def buildFeaturePipeline(df: DataFrame, featureCols: Seq[String]):
      Seq[PipelineStage] = {
    val stringCols = df.schema.fields
      .filter(f => featureCols.contains(f.name) && f.dataType == StringType)
      .map(_.name)
    val numericCols = featureCols.filterNot(stringCols.contains)
    val indexers = stringCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_indexed")
        .setHandleInvalid("keep"))
    val assembled = numericCols ++ stringCols.map(c => s"${c}_indexed")
    val assembler = new VectorAssembler().setInputCols(assembled.toArray)
      .setOutputCol("features_raw").setHandleInvalid("skip")
    val scaler = new StandardScaler().setInputCol("features_raw")
      .setOutputCol("features").setWithStd(true).setWithMean(false)
    indexers.toSeq :+ assembler :+ scaler
  }

  /** algorithm × task dispatch (reference: src/ml_pipeline.py:115-179),
    * plus the declared-but-unimplemented reference surface (NaiveBayes,
    * GLM, GMM — reference README.md:54-58) as working stages.
    */
  def getModel(algorithm: String, task: String): PipelineStage =
    (algorithm, task) match {
      case ("random_forest", "classification") =>
        new RandomForestClassifier().setLabelCol("label")
          .setFeaturesCol("features").setNumTrees(100).setMaxDepth(10)
          .setSeed(42L)
      case ("logistic_regression", "classification") =>
        new LogisticRegression().setLabelCol("label")
          .setFeaturesCol("features").setMaxIter(100).setRegParam(0.01)
      case ("gradient_boosting", "classification") =>
        new GBTClassifier().setLabelCol("label").setFeaturesCol("features")
          .setMaxIter(100).setMaxDepth(5).setSeed(42L)
      case ("naive_bayes", "classification") =>
        new NaiveBayes().setLabelCol("label").setFeaturesCol("features")
      case ("random_forest", "regression") =>
        new RandomForestRegressor().setLabelCol("label")
          .setFeaturesCol("features").setNumTrees(100).setMaxDepth(10)
          .setSeed(42L)
      case ("linear_regression", "regression") =>
        new LinearRegression().setLabelCol("label").setFeaturesCol("features")
          .setMaxIter(100)
      case ("gradient_boosting", "regression") =>
        new GBTRegressor().setLabelCol("label").setFeaturesCol("features")
          .setMaxIter(100).setSeed(42L)
      case ("glm", "regression") =>
        new GeneralizedLinearRegression().setLabelCol("label")
          .setFeaturesCol("features")
      case ("kmeans", "clustering") =>
        new KMeans().setFeaturesCol("features").setK(5).setSeed(42L)
      case ("bisecting_kmeans", "clustering") =>
        new BisectingKMeans().setFeaturesCol("features").setK(5).setSeed(42L)
      case ("gmm", "clustering") =>
        new GaussianMixture().setFeaturesCol("features").setK(5).setSeed(42L)
      case (a, t) =>
        throw new IllegalArgumentException(s"unknown algorithm/task: $a/$t")
    }

  /** The four feature stages the reference imports but never uses
    * (reference: src/feature_engineering.py:9-12) — provided as working,
    * composable stages so declared-surface coverage is total. Each slots
    * into [[buildFeaturePipeline]]'s output or a Pipeline directly.
    */
  def oneHotStage(inputCol: String, outputCol: String): OneHotEncoder =
    new OneHotEncoder().setInputCols(Array(inputCol))
      .setOutputCols(Array(outputCol)).setDropLast(true)

  def bucketizerStage(inputCol: String, outputCol: String,
      splits: Array[Double]): Bucketizer =
    new Bucketizer().setInputCol(inputCol).setOutputCol(outputCol)
      .setSplits(splits).setHandleInvalid("keep")

  def interactionStage(inputCols: Seq[String], outputCol: String): Interaction =
    new Interaction().setInputCols(inputCols.toArray).setOutputCol(outputCol)

  def sqlTransformerStage(statement: String): SQLTransformer =
    new SQLTransformer().setStatement(statement)

  /** The remaining standard scaler/normalizer stages, completing the
    * MLlib feature-scaling family alongside [[StandardScaler]] (used in
    * buildFeaturePipeline): min-max to [0,1], max-abs (sign-preserving),
    * per-row Lp normalization, and strict-greater-than binarization.
    * Each has an oracle-exact catalog twin in [[MLQueries]].
    */
  def minMaxStage(inputCol: String, outputCol: String): MinMaxScaler =
    new MinMaxScaler().setInputCol(inputCol).setOutputCol(outputCol)
      .setMin(0.0).setMax(1.0)

  def maxAbsStage(inputCol: String, outputCol: String): MaxAbsScaler =
    new MaxAbsScaler().setInputCol(inputCol).setOutputCol(outputCol)

  def normalizerStage(inputCol: String, outputCol: String,
      p: Double = 2.0): Normalizer =
    new Normalizer().setInputCol(inputCol).setOutputCol(outputCol).setP(p)

  def binarizerStage(inputCol: String, outputCol: String,
      threshold: Double): Binarizer =
    new Binarizer().setInputCol(inputCol).setOutputCol(outputCol)
      .setThreshold(threshold)

  case class TrainResult(model: PipelineModel, metrics: Map[String, Double])

  /** randomSplit(0.8/0.2, seed 42) → pipeline fit → evaluate
    * (reference: src/ml_pipeline.py:181-221, minus the MLflow HTTP
    * boundary, which has no place in a library).
    */
  def train(df: DataFrame, featureCols: Seq[String], algorithm: String,
      task: String): TrainResult = {
    val Array(trainDf, testDf) = df.randomSplit(Array(0.8, 0.2), 42L)
    val stages = buildFeaturePipeline(df, featureCols) :+ getModel(algorithm, task)
    val model = new Pipeline().setStages(stages.toArray).fit(trainDf)
    val metrics = task match {
      case "classification" => evaluateClassification(model.transform(testDf))
      case "regression"     => evaluateRegression(model.transform(testDf))
      // clustering is unsupervised — a tiny holdout can land in a single
      // cluster (silhouette requires >= 2), so score the full input
      case "clustering"     => evaluateClustering(model.transform(df))
      case _                => Map.empty[String, Double]
    }
    TrainResult(model, metrics)
  }

  /** Per-feature importance/weight of a trained pipeline's model stage
    * as a DataFrame (feature, importance), descending: tree ensembles
    * expose Gini/variance importances, linear models absolute
    * coefficients. `featureNames` must be the assembler's input order
    * (what [[train]] was given). Throws on model families with no
    * per-feature attribution (KMeans, NaiveBayes, ...) rather than
    * inventing one.
    */
  def featureImportances(model: PipelineModel,
      featureNames: Seq[String]): DataFrame = {
    import org.apache.spark.ml.classification.{GBTClassificationModel, LogisticRegressionModel, RandomForestClassificationModel}
    import org.apache.spark.ml.regression.{GBTRegressionModel, LinearRegressionModel, RandomForestRegressionModel}
    val weights: Array[Double] = model.stages.last match {
      case m: RandomForestClassificationModel => m.featureImportances.toArray
      case m: RandomForestRegressionModel    => m.featureImportances.toArray
      case m: GBTClassificationModel         => m.featureImportances.toArray
      case m: GBTRegressionModel             => m.featureImportances.toArray
      case m: LogisticRegressionModel        =>
        m.coefficients.toArray.map(math.abs)
      case m: LinearRegressionModel          =>
        m.coefficients.toArray.map(math.abs)
      case other => throw new IllegalArgumentException(
        s"no per-feature attribution for ${other.getClass.getSimpleName}")
    }
    require(weights.length == featureNames.length,
      s"model has ${weights.length} features, ${featureNames.length} names " +
        "given — pass the assembler input columns in order")
    val session = org.apache.spark.sql.SparkSession.active
    import session.implicits._
    featureNames.zip(weights).toDF("feature", "importance")
      .orderBy(org.apache.spark.sql.functions.desc("importance"),
        org.apache.spark.sql.functions.col("feature"))
  }

  /** 6 classification metrics (reference: src/ml_pipeline.py:223-242). */
  def evaluateClassification(predictions: DataFrame): Map[String, Double] = {
    val bin = new BinaryClassificationEvaluator().setLabelCol("label")
      .setRawPredictionCol("rawPrediction")
    val multi = new MulticlassClassificationEvaluator().setLabelCol("label")
      .setPredictionCol("prediction")
    Map(
      "areaUnderROC" -> bin.setMetricName("areaUnderROC").evaluate(predictions),
      "areaUnderPR" -> bin.setMetricName("areaUnderPR").evaluate(predictions),
      "accuracy" -> multi.setMetricName("accuracy").evaluate(predictions),
      "f1" -> multi.setMetricName("f1").evaluate(predictions),
      "weightedPrecision" ->
        multi.setMetricName("weightedPrecision").evaluate(predictions),
      "weightedRecall" ->
        multi.setMetricName("weightedRecall").evaluate(predictions))
  }

  /** Regression metrics the reference config declares but never wires
    * (reference: config/pipeline_config.yaml:109-115). */
  def evaluateRegression(predictions: DataFrame): Map[String, Double] = {
    val ev = new RegressionEvaluator().setLabelCol("label")
      .setPredictionCol("prediction")
    Map(
      "rmse" -> ev.setMetricName("rmse").evaluate(predictions),
      "mae" -> ev.setMetricName("mae").evaluate(predictions),
      "r2" -> ev.setMetricName("r2").evaluate(predictions))
  }

  /** Clustering metric, same config-gap closure. */
  def evaluateClustering(predictions: DataFrame): Map[String, Double] =
    Map("silhouette" -> new ClusteringEvaluator().setFeaturesCol("features")
      .evaluate(predictions))

  /** CV grid search with the reference's exact grids
    * (reference: src/ml_pipeline.py:258-284): RF numTrees {50,100,200} ×
    * maxDepth {5,10,15}; LR regParam {0.01,0.1,1.0} ×
    * elasticNetParam {0.0,0.5,1.0}; 3 folds, parallelism 4.
    */
  def hyperparameterTuning(df: DataFrame, featureCols: Seq[String],
      algorithm: String): TrainResult = {
    val stages = buildFeaturePipeline(df, featureCols)
    val (model, grid) = algorithm match {
      case "random_forest" =>
        val rf = new RandomForestClassifier().setLabelCol("label")
          .setFeaturesCol("features").setSeed(42L)
        (rf, new ParamGridBuilder()
          .addGrid(rf.numTrees, Array(50, 100, 200))
          .addGrid(rf.maxDepth, Array(5, 10, 15)).build())
      case "logistic_regression" =>
        val lr = new LogisticRegression().setLabelCol("label")
          .setFeaturesCol("features")
        (lr, new ParamGridBuilder()
          .addGrid(lr.regParam, Array(0.01, 0.1, 1.0))
          .addGrid(lr.elasticNetParam, Array(0.0, 0.5, 1.0)).build())
      case a => throw new IllegalArgumentException(s"no tuning grid for $a")
    }
    val pipeline = new Pipeline().setStages((stages :+ model).toArray)
    val cv = new CrossValidator().setEstimator(pipeline)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol("label").setMetricName("accuracy"))
      .setEstimatorParamMaps(grid).setNumFolds(3).setParallelism(4)
      .setSeed(42L)
    val Array(trainDf, testDf) = df.randomSplit(Array(0.8, 0.2), 42L)
    val cvModel = cv.fit(trainDf)
    val best = cvModel.bestModel.asInstanceOf[PipelineModel]
    TrainResult(best, evaluateClassification(best.transform(testDf)))
  }

  /** MLlib Imputer with the reference's drop-and-rename-back dance
    * (reference: src/feature_engineering.py:140-149): impute into
    * `{c}_imputed`, drop the original, rename back. strategy ∈
    * {mean, median}.
    */
  def imputeMissing(df: DataFrame, cols: Seq[String],
      strategy: String = "mean"): DataFrame = {
    val imputer = new Imputer().setInputCols(cols.toArray)
      .setOutputCols(cols.map(c => s"${c}_imputed").toArray)
      .setStrategy(strategy)
    val imputed = imputer.fit(df).transform(df)
    cols.foldLeft(imputed) { (acc, c) =>
      acc.drop(c).withColumnRenamed(s"${c}_imputed", c)
    }
  }

  /** TrainValidationSplit variant of the LR grid — the tuning mode the
    * reference config declares but never implements
    * (reference: config/pipeline_config.yaml:87).
    */
  def trainValidationTuning(df: DataFrame, featureCols: Seq[String]):
      TrainResult = {
    val stages = buildFeaturePipeline(df, featureCols)
    val lr = new LogisticRegression().setLabelCol("label")
      .setFeaturesCol("features")
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 0.1, 1.0)).build()
    val tvs = new TrainValidationSplit()
      .setEstimator(new Pipeline().setStages((stages :+ lr).toArray))
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol("label").setMetricName("accuracy"))
      .setEstimatorParamMaps(grid).setTrainRatio(0.75).setSeed(42L)
    val Array(trainDf, testDf) = df.randomSplit(Array(0.8, 0.2), 42L)
    val best = tvs.fit(trainDf).bestModel.asInstanceOf[PipelineModel]
    TrainResult(best, evaluateClassification(best.transform(testDf)))
  }

  /** ALS recommender — declared in the reference README, never coded
    * (reference: README.md:54-58). Implicit-feedback shaped.
    */
  def alsRecommender(ratings: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rank: Int = 8, maxIter: Int = 5):
      org.apache.spark.ml.recommendation.ALSModel = {
    new ALS().setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setRank(rank).setMaxIter(maxIter).setSeed(42L)
      .setColdStartStrategy("drop")
      .fit(ratings)
  }

  /** Persist / reload (reference: src/ml_pipeline.py:289-302). */
  def saveModel(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): PipelineModel = PipelineModel.load(path)

  /** Single transform (reference: src/ml_pipeline.py:304-309). The
    * reference reloads the model per request (api/api.py:172) — callers
    * here hold the loaded model, which is the legitimate fix SURVEY.md
    * §3.2 notes.
    */
  def predict(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)

  /** Batch scoring sink (reference: api/api.py:196-223): transform →
    * parquet overwrite → count. The reference recomputes the transform
    * for its final count (no cache despite config declaring it,
    * SURVEY.md §3.3); we cache around the double action — identical
    * results, one pass.
    */
  def batchScore(model: PipelineModel, in: DataFrame, outPath: String): Long = {
    val predictions = model.transform(in).cache()
    try {
      predictions.write.mode("overwrite").parquet(outPath)
      predictions.count()
    } finally predictions.unpersist()
  }
}
