package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.PipelineConfig

/** Config loader against a reference-shaped YAML document
  * (reference: config/pipeline_config.yaml + tests/test_pipeline.py:54-83).
  */
class ConfigSpec extends AnyFunSuite {

  val yaml: String =
    """# pipeline config (reference-shaped)
      |spark:
      |  master: "local[2]"
      |  app_name: "TestPipeline"
      |data:
      |  input_path: "/data/input.parquet"
      |  output_path: "/data/output"
      |  format: parquet
      |features:
      |  numeric_features: [feature_1, feature_2, feature_3]
      |  categorical_features: []
      |  target: "label"
      |model:
      |  algorithm: "random_forest"
      |  task: "classification"
      |tuning:
      |  num_folds: 3
      |  parallelism: 4
      |performance:
      |  cache_data: true
      |  repartition: true
      |  num_partitions: 200
      |  broadcast_threshold: 10485760
      |""".stripMargin

  test("parses the reference config keys") {
    val c = PipelineConfig.fromString(yaml)
    assert(c.master == "local[2]")
    assert(c.appName == "TestPipeline")
    assert(c.inputPath == "/data/input.parquet")
    assert(c.numericFeatures == Seq("feature_1", "feature_2", "feature_3"))
    assert(c.categoricalFeatures.isEmpty)
    assert(c.target == "label")
    assert(c.algorithm == "random_forest")
    assert(c.numFolds == 3)
    assert(c.cacheData && c.repartition)
    assert(c.numPartitions == 200)
    assert(c.broadcastThreshold == 10485760L)
    assert(c.featureCols == Seq("feature_1", "feature_2", "feature_3"))
  }

  test("missing sections fall back to defaults") {
    val c = PipelineConfig.fromString("model:\n  algorithm: kmeans\n  task: clustering\n")
    assert(c.algorithm == "kmeans")
    assert(c.task == "clustering")
    assert(c.master == "local[*]")
    assert(c.numFolds == 3)
  }
}
