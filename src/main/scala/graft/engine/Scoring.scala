package graft.engine

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Library analogue of the reference's serving surface
  * (reference: api/api.py): single-row predict, batch predict, model
  * registry. The reference reloads the PipelineModel from disk on every
  * request (api/api.py:172, a deliberate naïveté SURVEY.md §3.2 flags);
  * here loaded models are cached by path — same results, amortized
  * load.
  */
object Scoring {

  private val cache = new ConcurrentHashMap[String, PipelineModel]()

  /** Cached load (the legitimate fix over load-per-request). */
  def model(path: String): PipelineModel =
    cache.computeIfAbsent(path, p => PipelineModel.load(p))

  def evict(path: String): Unit = cache.remove(path)

  /** /predict equivalent: JSON-shaped feature vectors → driver-built
    * DataFrame → transform → collected predictions
    * (reference: api/api.py:164-193). Only sensible for small row
    * counts — batch paths go through [[batchPredict]].
    */
  def predictRows(spark: SparkSession, modelPath: String,
      featureNames: Seq[String], rows: Seq[Seq[Double]]): Seq[Double] = {
    val schema = StructType(featureNames.map(n =>
      StructField(n, DoubleType, nullable = false)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*), schema)
    model(modelPath).transform(df)
      .select("prediction").collect().map(_.getDouble(0)).toSeq
  }

  /** /predict/batch equivalent: path-to-path scoring
    * (reference: api/api.py:196-223), cached transform around the
    * write+count double action.
    */
  def batchPredict(spark: SparkSession, modelPath: String, inputPath: String,
      outputPath: String): Long = {
    val in = Tables.loadPath(spark, inputPath)
    MLPipe.batchScore(model(modelPath), in, outputPath)
  }

  /** Outcome of a [[batchPredictGuarded]] run: the headline PSI of the
    * guarded column, whether scoring went ahead, and the rows written
    * (0 when refused).
    */
  final case class GuardedResult(psi: Double, scored: Boolean, rows: Long)

  /** Batch scoring behind an input-drift guard: the scoring input's
    * `guardCol` distribution is PSI-compared against the TRAINING
    * baseline first, and when the headline PSI exceeds `maxPsi`
    * (0.25 = the standard "shifted" threshold) the batch is REFUSED —
    * a model asked to extrapolate onto a distribution it never saw
    * produces confidently wrong scores, and the honest failure mode is
    * a loud refusal, not silent garbage predictions.
    *
    * Cost: one [[Quality.psiReport]] pass over the input (plus the
    * baseline's, typically cached/small) before the scoring pass.
    */
  def batchPredictGuarded(spark: SparkSession, modelPath: String,
      inputPath: String, outputPath: String, baseline: DataFrame,
      guardCol: String, bins: Int, lo: Double, hi: Double,
      maxPsi: Double = 0.25): GuardedResult = {
    require(maxPsi > 0, "maxPsi must be positive")
    val in = Tables.loadPath(spark, inputPath)
    val psi = Quality.psiReport(baseline, in, guardCol, bins, lo, hi)
      .agg(org.apache.spark.sql.functions.sum("psi_contrib"))
      .head().getDouble(0)
    if (psi > maxPsi) GuardedResult(psi, scored = false, rows = 0L)
    else GuardedResult(psi, scored = true,
      rows = MLPipe.batchScore(model(modelPath), in, outputPath))
  }
}
