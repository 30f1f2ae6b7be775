package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Jobs
import graft.serving.ApiServer

/** End-to-end HTTP drive of the serving layer: every endpoint of the
  * reference API surface exercised over a real socket with the JDK
  * HttpClient against an ephemeral port.
  */
class ApiServerSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private val workDir = Files.createTempDirectory("graft_api").toString
  private val dataPath = s"$workDir/train.parquet"
  private val featureCols = Seq("feature_1", "feature_2", "feature_3")

  // deterministic linearly-separable training fixture, written once
  private lazy val server: ApiServer = {
    Jobs.reset()
    val rows = (0 until 200).map { i =>
      val y = if (i % 2 == 0) 0.0 else 1.0
      (i.toDouble / 100.0, y * 2.0 + i % 3, 3.0 - y, y)
    }
    rows.toDF("feature_1", "feature_2", "feature_3", "label")
      .write.mode("overwrite").parquet(dataPath)
    val s = new ApiServer(spark, s"$workDir/models")
    s.start()
    s
  }

  private def url(path: String) =
    s"http://127.0.0.1:${server.boundPort}$path"

  private def get(path: String): (Int, java.util.Map[String, Any]) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(url(path))).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readValue(r.body(),
      classOf[java.util.Map[String, Any]]))
  }

  private def post(path: String,
      body: String): (Int, java.util.Map[String, Any]) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(url(path)))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readValue(r.body(),
      classOf[java.util.Map[String, Any]]))
  }

  private def delete(path: String): (Int, java.util.Map[String, Any]) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(url(path))).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), mapper.readValue(r.body(),
      classOf[java.util.Map[String, Any]]))
  }

  test("root and health report a running service") {
    val (rc, root) = get("/")
    assert(rc == 200 && root.get("status") == "running")
    val (hc, health) = get("/health")
    assert(hc == 200 && health.get("status") == "healthy")
    assert(health.get("pipeline_initialized") == true)
  }

  test("train -> jobs -> predict -> batch -> metrics -> delete round-trip") {
    // POST /train
    val trainBody = mapper.writeValueAsString(new java.util.LinkedHashMap[
      String, Any]() {
        put("data_path", dataPath)
        put("algorithm", "logistic_regression")
        put("task_type", "classification")
        put("feature_cols", java.util.List.of(featureCols: _*))
      })
    val (tc, tr) = post("/train", trainBody)
    assert(tc == 200, s"train failed: $tr")
    val jobId = tr.get("job_id").toString
    val modelPath = tr.get("model_path").toString
    assert(tr.get("status") == "completed" && modelPath.nonEmpty)

    // GET /jobs/{id} + /jobs
    val (jc, job) = get(s"/jobs/$jobId")
    assert(jc == 200 && job.get("status") == "completed")
    assert(job.get("algorithm") == "logistic_regression")
    val (lc, jobs) = get("/jobs")
    assert(lc == 200 && jobs.get("count").asInstanceOf[Int] >= 1)

    // POST /predict — separable points score on the expected side
    val predictBody = mapper.writeValueAsString(new java.util.LinkedHashMap[
      String, Any]() {
        put("model_path", modelPath)
        put("feature_names", java.util.List.of(featureCols: _*))
        put("features", java.util.List.of(
          java.util.List.of(0.10: java.lang.Double, 0.0: java.lang.Double,
            3.0: java.lang.Double),
          java.util.List.of(0.11: java.lang.Double, 3.0: java.lang.Double,
            2.0: java.lang.Double)))
      })
    val (pc, pr) = post("/predict", predictBody)
    assert(pc == 200, s"predict failed: $pr")
    val preds = pr.get("predictions").asInstanceOf[java.util.List[Any]]
    assert(pr.get("count") == 2 && preds.size == 2)
    assert(preds.get(0) == 0.0 && preds.get(1) == 1.0)

    // POST /predict/batch
    val outPath = s"$workDir/preds.parquet"
    val batchBody = mapper.writeValueAsString(new java.util.LinkedHashMap[
      String, Any]() {
        put("model_path", modelPath)
        put("data_path", dataPath)
        put("output_path", outPath)
      })
    val (bc, br) = post("/predict/batch", batchBody)
    assert(bc == 200 && br.get("status") == "completed")
    assert(br.get("record_count").asInstanceOf[Number].longValue == 200L)
    assert(spark.read.parquet(outPath).count() == 200L)

    // GET /metrics + /models
    val (mc, met) = get("/metrics")
    assert(mc == 200)
    assert(met.get("total_training_jobs").asInstanceOf[Number]
      .longValue >= 1L)
    assert(met.get("completed_jobs").asInstanceOf[Number].longValue >= 1L)
    val (moc, models) = get("/models")
    assert(moc == 200 && models.get("count").asInstanceOf[Int] >= 1)

    // DELETE /models/{url-encoded path}, then the guard rejects a rerun
    val enc = java.net.URLEncoder.encode(modelPath, StandardCharsets.UTF_8)
    val (dc, dr) = delete(s"/models/$enc")
    assert(dc == 200 && dr.get("status") == "deleted")
    val (dc2, dr2) = delete(s"/models/$enc")
    assert(dc2 == 500 && dr2.get("detail").toString.contains("refusing"))
  }

  test("unknown job and unknown route return FastAPI-shaped 404s") {
    val (jc, jr) = get("/jobs/train_does_not_exist")
    assert(jc == 404 && jr.get("detail") == "Job not found")
    val (nc, nr) = get("/definitely/not/a/route")
    assert(nc == 404 && nr.get("detail") == "Not found")
  }

  test("failed training surfaces as a 500 with the job recorded") {
    val body = mapper.writeValueAsString(new java.util.LinkedHashMap[
      String, Any]() {
        put("data_path", dataPath)
        put("algorithm", "no_such_algorithm")
        put("task_type", "classification")
        put("feature_cols", java.util.List.of(featureCols: _*))
      })
    val (rc, r) = post("/train", body)
    assert(rc == 500 && r.get("detail").toString.contains("Training failed"))
    val jobId = r.get("job_id").toString
    val (jc, job) = get(s"/jobs/$jobId")
    assert(jc == 200 && job.get("status") == "failed")
  }

  test("/quality runs the contract over a path; /schema describes it") {
    val ordersPath = "/root/testdata/sf0.001/orders.parquet"
    val (qc, q) = post("/quality",
      """{"data_path": "%s",
        |  "required": ["o_orderkey", "o_custkey"],
        |  "unique": ["o_orderkey"],
        |  "ranges": {"o_totalprice": [0, 100000]}}""".stripMargin
        .format(ordersPath))
    assert(qc == 200)
    val rules = q.get("rules").asInstanceOf[java.util.List[_]]
    assert(rules.size() == 4)
    // completeness + uniqueness hold on this table; the tight range fails
    assert(q.get("passed") == java.lang.Boolean.FALSE)
    val names = (0 until rules.size()).map(i =>
      rules.get(i).asInstanceOf[java.util.Map[_, _]].get("rule").toString)
    assert(names.contains("unique(o_orderkey)") &&
      names.contains("in_range(o_totalprice)"))
    // empty contract → 4xx/5xx with detail, not a silent pass
    val (bad, badBody) = post("/quality",
      s"""{"data_path": "$ordersPath"}""")
    assert(bad >= 400 && badBody.get("detail") != null)
    val (sc, sch) = get("/schema?path=" +
      java.net.URLEncoder.encode(ordersPath, "UTF-8"))
    assert(sc == 200)
    val cols = sch.get("columns").asInstanceOf[java.util.List[_]]
    val colNames = (0 until cols.size()).map(i =>
      cols.get(i).asInstanceOf[java.util.Map[_, _]].get("name").toString)
    assert(colNames.contains("o_orderkey") &&
      colNames.contains("o_totalprice"))
  }

  test("/health answers while a slow /train (cross-validation) is in " +
      "flight — requests are served off the dispatch thread") {
    val trainBody =
      s"""{"data_path": "$dataPath",
         |  "algorithm": "random_forest",
         |  "task_type": "classification",
         |  "hyperparameter_tuning": true,
         |  "feature_cols": ["feature_1", "feature_2", "feature_3"]}"""
        .stripMargin
    val slowTrain = client.sendAsync(
      HttpRequest.newBuilder(URI.create(url("/train")))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(trainBody)).build(),
      HttpResponse.BodyHandlers.ofString())
    Thread.sleep(300) // let the train request reach its handler
    assert(!slowTrain.isDone, "fixture too fast to demonstrate blocking")
    val t0 = System.nanoTime()
    val (hc, health) = get("/health") // blocked forever on a null executor
    val healthSecs = (System.nanoTime() - t0) / 1e9
    assert(hc == 200 && health.get("status") == "healthy")
    assert(!slowTrain.isDone,
      s"train finished in <${healthSecs}s — concurrency not demonstrated")
    assert(healthSecs < 5.0, s"/health took ${healthSecs}s during /train")
    val trained = slowTrain.get(120, java.util.concurrent.TimeUnit.SECONDS)
    assert(trained.statusCode() == 200)
  }
}
