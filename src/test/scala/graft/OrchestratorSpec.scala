package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Orchestrator, PipelineConfig}

/** End-to-end config-driven run, mirroring the reference's CLI path
  * (SURVEY.md §3.1) on the shared test session.
  */
class OrchestratorSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("config-driven run: load -> train -> evaluate -> persist") {
    val dataPath = Files.createTempDirectory("graft-orch").toString +
      "/train.parquet"
    (1 to 40).map(i => (i.toDouble, i + 1.0, (i + 1) % 2)).toSeq
      .toDF("feature_1", "feature_2", "label")
      .write.parquet(dataPath)
    val modelPath = Files.createTempDirectory("graft-orch-m").toString + "/m"

    val cfg = PipelineConfig.fromString(
      s"""data:
         |  input_path: "$dataPath"
         |  output_path: "$modelPath"
         |features:
         |  numeric_features: [feature_1, feature_2]
         |model:
         |  algorithm: "logistic_regression"
         |  task: "classification"
         |performance:
         |  cache_data: true
         |  repartition: true
         |  num_partitions: 2
         |""".stripMargin)

    val r = Orchestrator.run(spark, cfg)
    assert(r.rowsLoaded == 40)
    assert(r.metrics.contains("accuracy"))
    // persisted model reloads and scores
    val loaded = graft.engine.MLPipe.loadModel(modelPath)
    assert(loaded.transform(spark.read.parquet(dataPath)).count() == 40)
  }

  test("config-driven run with a feature chain (time -> ratio -> impute)") {
    val dataPath = Files.createTempDirectory("graft-orch2").toString +
      "/train.parquet"
    (1 to 40).map(i => (i.toDouble, (i % 7 + 1).toDouble, (i + 1) % 2,
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i * 3600L))))
      .toSeq.toDF("feature_1", "feature_2", "label", "ts")
      .write.parquet(dataPath)
    val cfg = PipelineConfig.fromString(
      s"""data:
         |  input_path: "$dataPath"
         |features:
         |  numeric_features: [feature_1, feature_2, hour,
         |    feature_1_to_feature_2_ratio]
         |model:
         |  algorithm: "logistic_regression"
         |  task: "classification"
         |""".stripMargin)
    val fc = graft.engine.Features.FeatureConfig(
      timeCol = Some("ts"),
      ratio = Some(graft.engine.Features.RatioSpec(
        Seq("feature_1"), Seq("feature_2"))))
    val r = Orchestrator.run(spark, cfg, Some(fc))
    assert(r.rowsLoaded == 40)
    assert(r.metrics.contains("accuracy"))
  }

  test("run appends a params+metrics record to the tracking log") {
    val dataPath = Files.createTempDirectory("graft-orch3").toString +
      "/train.parquet"
    (1 to 40).map(i => (i.toDouble, i + 1.0, (i + 1) % 2)).toSeq
      .toDF("feature_1", "feature_2", "label")
      .write.parquet(dataPath)
    val logPath = Files.createTempDirectory("graft-orch3-log").toString +
      "/runs.jsonl"
    val cfg = PipelineConfig.fromString(
      s"""data:
         |  input_path: "$dataPath"
         |features:
         |  numeric_features: [feature_1, feature_2]
         |model:
         |  algorithm: "logistic_regression"
         |  task: "classification"
         |tracking:
         |  metrics_log: "$logPath"
         |""".stripMargin)
    Orchestrator.run(spark, cfg)
    Orchestrator.run(spark, cfg) // appends, not overwrites
    val lines = Files.readAllLines(java.nio.file.Paths.get(logPath))
    assert(lines.size == 2)
    assert(lines.get(0).contains("\"algorithm\":\"logistic_regression\""))
    assert(lines.get(0).contains("\"rows_loaded\":40"))
    assert(lines.get(0).contains("\"accuracy\":"))
  }

  test("session builder honors the config's wired performance block") {
    val cfg = PipelineConfig(master = "local[2]", appName = "graft-cfg",
      numPartitions = 7, broadcastThreshold = 12345678L)
    // can't build a second context in-process; check the builder output
    // via a same-context getOrCreate and the runtime confs it sets
    val s = Orchestrator.buildSession(cfg)
    assert(s.conf.get("spark.sql.shuffle.partitions") == "7")
    assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold") == "12345678")
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    // restore the shared session's shuffle setting for other suites
    s.conf.set("spark.sql.shuffle.partitions", "2")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
