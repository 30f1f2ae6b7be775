package graft.engine

import scala.io.Source

/** Minimal config model mirroring the keys the reference actually reads
  * from config/pipeline_config.yaml (reference: src/ml_pipeline.py:35-38,
  * config/pipeline_config.yaml:1-140): spark / data / features / model /
  * tuning, plus the performance block it declares and never wires
  * (cache_data, repartition, num_partitions, broadcast_threshold —
  * config/pipeline_config.yaml:129-133) which we DO honor.
  *
  * Parsed with a deliberately tiny YAML-subset reader (2-level maps,
  * scalars, inline `[a, b]` lists) — no external dependency exists in
  * this zero-egress build, and the reference's config uses nothing more.
  */
final case class PipelineConfig(
    master: String = "local[*]",
    appName: String = "graft",
    inputPath: String = "",
    outputPath: String = "",
    format: String = "parquet",
    numericFeatures: Seq[String] = Nil,
    categoricalFeatures: Seq[String] = Nil,
    target: String = "label",
    algorithm: String = "random_forest",
    task: String = "classification",
    numFolds: Int = 3,
    parallelism: Int = 4,
    cacheData: Boolean = false,
    repartition: Boolean = false,
    numPartitions: Int = 200,
    broadcastThreshold: Long = 10485760L,
    metricsLogPath: String = "") {

  def featureCols: Seq[String] = numericFeatures ++ categoricalFeatures
}

object PipelineConfig {

  def fromFile(path: String): PipelineConfig = {
    val src = Source.fromFile(path)
    try fromString(src.mkString) finally src.close()
  }

  def fromString(yaml: String): PipelineConfig = {
    val tree = parse(yaml)
    def str(sec: String, k: String, dflt: String): String =
      tree.getOrElse(sec, Map.empty).getOrElse(k, dflt)
    def list(sec: String, k: String): Seq[String] = {
      val v = str(sec, k, "")
      if (v.isEmpty) Nil
      else v.stripPrefix("[").stripSuffix("]").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
    }
    PipelineConfig(
      master = str("spark", "master", "local[*]"),
      appName = str("spark", "app_name", "graft"),
      inputPath = str("data", "input_path", ""),
      outputPath = str("data", "output_path", ""),
      format = str("data", "format", "parquet"),
      numericFeatures = list("features", "numeric_features"),
      categoricalFeatures = list("features", "categorical_features"),
      target = str("features", "target", "label"),
      algorithm = str("model", "algorithm", "random_forest"),
      task = str("model", "task", "classification"),
      numFolds = str("tuning", "num_folds", "3").toInt,
      parallelism = str("tuning", "parallelism", "4").toInt,
      cacheData = str("performance", "cache_data", "false").toBoolean,
      repartition = str("performance", "repartition", "false").toBoolean,
      numPartitions = str("performance", "num_partitions", "200").toInt,
      broadcastThreshold =
        str("performance", "broadcast_threshold", "10485760").toLong,
      // the reference's MLflow tracking boundary (src/ml_pipeline.py:
      // 198-217) reduced to its library-shaped core: a params+metrics
      // JSON-lines file
      metricsLogPath = str("tracking", "metrics_log", ""))
  }

  /** section → key → raw scalar. Comments and blank lines skipped;
    * quotes stripped; deeper nesting flattened into the nearest section.
    */
  private def parse(yaml: String): Map[String, Map[String, String]] = {
    var section = ""
    val out = collection.mutable.Map.empty[String, collection.mutable.Map[String, String]]
    yaml.linesIterator.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      val line = noComment.trim
      if (line.nonEmpty && line.contains(":")) {
        val indent = noComment.takeWhile(_ == ' ').length
        val Array(k, rest @ _*) = line.split(":", 2)
        val v = rest.mkString(":").trim.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'")
        if (indent == 0 && v.isEmpty) {
          section = k.trim
          out.getOrElseUpdate(section, collection.mutable.Map.empty)
        } else if (section.nonEmpty && v.nonEmpty) {
          out.getOrElseUpdate(section, collection.mutable.Map.empty)
            .update(k.trim, v)
        }
      }
    }
    out.view.mapValues(_.toMap).toMap
  }
}
