package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's MLPipelineOrchestrator re-expressed
  * (reference: src/ml_pipeline.py:25-314, lifecycle in SURVEY.md §3.1):
  * config → session → load → feature chain → train → evaluate → persist.
  * Each step is also usable standalone (the library surface); this ties
  * them together for the config-driven CLI-style run.
  */
object Orchestrator {

  /** Session builder with the reference's knobs
    * (reference: src/ml_pipeline.py:40-55): master from config, AQE +
    * partition coalescing on, Kryo, plus the declared-but-never-wired
    * performance block (num_partitions, broadcast_threshold) actually
    * honored.
    */
  def buildSession(cfg: PipelineConfig): SparkSession =
    SparkSession.builder()
      .master(cfg.master)
      .appName(cfg.appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.serializer",
        "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.shuffle.partitions", cfg.numPartitions.toString)
      .config("spark.sql.autoBroadcastJoinThreshold",
        cfg.broadcastThreshold.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  final case class RunResult(
      model: org.apache.spark.ml.PipelineModel,
      metrics: Map[String, Double],
      rowsLoaded: Long)

  /** Run-tracking sink: the reference logs params+metrics to MLflow
    * (reference: src/ml_pipeline.py:198-217); the library-shaped
    * equivalent is one appended JSON line per run. Driver-side file IO —
    * a run record, not a data path.
    */
  def logRun(path: String, cfg: PipelineConfig, rows: Long,
      metrics: Map[String, Double]): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    // NaN/Infinity are not JSON tokens (an evaluator legitimately returns
    // NaN on a degenerate split) — serialize them as null
    def num(v: Double) =
      if (v.isNaN || v.isInfinite) "null" else v.toString
    val ms = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}:${num(v)}" }.mkString("{", ",", "}")
    val line = s"""{"app":${q(cfg.appName)},"algorithm":${q(cfg.algorithm)},""" +
      s""""task":${q(cfg.task)},"input":${q(cfg.inputPath)},""" +
      s""""feature_cols":${cfg.featureCols.map(q).mkString("[", ",", "]")},""" +
      s""""rows_loaded":$rows,"metrics":$ms}""" + "\n"
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(p, line,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Full config-driven run on an already-open session. Honors
    * cache_data / repartition from the config's performance block.
    */
  def run(spark: SparkSession, cfg: PipelineConfig,
      featureCfg: Option[Features.FeatureConfig] = None): RunResult = {
    var df: DataFrame = Tables.loadPath(spark, cfg.inputPath)
    val rows = df.count() // the reference's eager post-load count (:73)
    if (cfg.repartition) df = df.repartition(cfg.numPartitions)
    if (cfg.cacheData) df = df.cache()
    featureCfg.foreach(fc => df = Features.featurePipeline(df, fc))
    val result = MLPipe.train(df, cfg.featureCols, cfg.algorithm, cfg.task)
    if (cfg.outputPath.nonEmpty)
      MLPipe.saveModel(result.model, cfg.outputPath)
    if (cfg.metricsLogPath.nonEmpty)
      logRun(cfg.metricsLogPath, cfg, rows, result.metrics)
    RunResult(result.model, result.metrics, rows)
  }
}
