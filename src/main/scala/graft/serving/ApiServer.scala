package graft.serving

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.engine.{Jobs, Quality, Scoring, Tables}

/** HTTP serving layer over the library ops surface — endpoint-for-
  * endpoint parity with the reference FastAPI service
  * (reference: api/api.py:40-301) on the JDK's built-in
  * `com.sun.net.httpserver`, JSON via the Jackson that already ships
  * with Spark — zero new dependencies.
  *
  *   - GET  /                      service banner (api/api.py:91-98)
  *   - GET  /health                liveness (api/api.py:101-108)
  *   - POST /train                 train + save + register (api/api.py:111-161)
  *   - POST /predict               row-vector predict (api/api.py:164-193)
  *   - POST /predict/batch         path-to-path scoring (api/api.py:196-223)
  *   - GET  /jobs , /jobs/{id}     registry (api/api.py:226-240)
  *   - GET  /models                completed models + run log (api/api.py:244-267)
  *   - GET  /metrics               job counters (api/api.py:270-279)
  *   - DELETE /models/{path}       guarded real delete (api/api.py:282-293)
  *   - POST /quality               run a data-quality contract on a path
  *   - GET  /schema?path=…         schema of a parquet/csv/json path
  *
  * /quality and /schema have no reference counterpart — they expose the
  * [[graft.engine.Quality]] gate over HTTP so an external scheduler can
  * contract-check a drop before triggering /train on it.
  *
  * The compute behind every endpoint is the already-tested library
  * surface ([[graft.engine.Jobs]], [[graft.engine.Scoring]]) — this
  * class only translates HTTP/JSON. Errors surface as the reference's
  * FastAPI shape: status 4xx/5xx with a JSON `{"detail": …}` body.
  */
final class ApiServer(spark: SparkSession, modelDir: String,
    metricsLogPath: Option[String] = None, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", (ex: HttpExchange) => route(ex))
  // thread-per-request (what the reference gets for free from uvicorn):
  // a long /train must not block /health or any other probe — the
  // dispatch thread only accepts, the pool serves
  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-api-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })
  server.setExecutor(pool)

  /** The actually-bound port (pass port = 0 for an ephemeral one). */
  def boundPort: Int = server.getAddress.getPort

  def start(): Unit = server.start()
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  // ── routing ──────────────────────────────────────────────────────────

  private def route(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    try {
      (method, path) match {
        case ("GET", "/") =>
          reply(ex, 200, jmap(
            "service" -> "Graft ML Pipeline API",
            "version" -> "1.0.0",
            "status" -> "running"))
        case ("GET", "/health") =>
          reply(ex, 200, jmap(
            "status" -> "healthy",
            "pipeline_initialized" -> (spark != null)))
        case ("POST", "/train")         => train(ex)
        case ("POST", "/quality")       => quality(ex)
        case ("GET", "/schema")         => schema(ex)
        case ("POST", "/predict")       => predict(ex)
        case ("POST", "/predict/batch") => predictBatch(ex)
        case ("GET", "/jobs") =>
          reply(ex, 200, jmap(
            "jobs" -> Jobs.listJobs().map(jobJson),
            "count" -> Jobs.listJobs().size))
        case ("GET", p) if p.startsWith("/jobs/") =>
          Jobs.jobStatus(p.stripPrefix("/jobs/")) match {
            case Some(j) => reply(ex, 200, jobJson(j))
            case None    => reply(ex, 404, jmap("detail" -> "Job not found"))
          }
        case ("GET", "/models")  => listModels(ex)
        case ("GET", "/metrics") =>
          reply(ex, 200, jmap(Jobs.metrics().toSeq.map {
            case (k, v) => k -> (v: Any) }: _*))
        case ("DELETE", p) if p.startsWith("/models/") =>
          val target = URLDecoder.decode(p.stripPrefix("/models/"),
            StandardCharsets.UTF_8)
          Jobs.deleteModel(target)
          reply(ex, 200, jmap("status" -> "deleted", "model_path" -> target))
        case _ =>
          reply(ex, 404, jmap("detail" -> "Not found"))
      }
    } catch {
      case e: Exception =>
        reply(ex, 500, jmap("detail" -> s"${e.getMessage}"))
    }
  }

  // ── endpoints ────────────────────────────────────────────────────────

  private def train(ex: HttpExchange): Unit = {
    val req = readJson(ex)
    val dataPath = str(req, "data_path")
    val algorithm = strOr(req, "algorithm", "random_forest")
    val taskType = strOr(req, "task_type", "classification")
    val tune = Option(req.get("hyperparameter_tuning"))
      .exists(_.asInstanceOf[Boolean])
    val featureCols = strList(req, "feature_cols")
    val df = Tables.loadPath(spark, dataPath)
    val jobId = Jobs.submitTrain(df, featureCols, algorithm, taskType,
      modelDir, tune)
    Jobs.jobStatus(jobId).get match {
      case j if j.status == "completed" =>
        reply(ex, 200, jmap(
          "job_id" -> jobId,
          "status" -> "completed",
          "model_path" -> j.modelPath.orNull,
          "message" -> "Model training completed successfully"))
      case j =>
        reply(ex, 500, jmap(
          "detail" -> s"Training failed: ${j.error.getOrElse("unknown")}",
          "job_id" -> jobId))
    }
  }

  private def predict(ex: HttpExchange): Unit = {
    val req = readJson(ex)
    val modelPath = str(req, "model_path")
    val features = doubleMatrix(req, "features")
    // the reference auto-names feature_0..n-1 (api/api.py:176); callers
    // whose models were trained on real column names pass feature_names
    val names = Option(req.get("feature_names"))
      .map(_ => strList(req, "feature_names"))
      .getOrElse(features.head.indices.map(i => s"feature_$i"))
    val preds = Scoring.predictRows(spark, modelPath, names, features)
    reply(ex, 200, jmap("predictions" -> preds, "count" -> preds.size))
  }

  private def quality(ex: HttpExchange): Unit = {
    import scala.jdk.CollectionConverters._
    val req = readJson(ex)
    val df = Tables.loadPath(spark, str(req, "data_path"))
    val required = Option(req.get("required"))
      .map(_ => strList(req, "required")).getOrElse(Seq.empty)
    val unique = Option(req.get("unique"))
      .map(_ => strList(req, "unique")).getOrElse(Seq.empty)
    val ranges: Seq[(String, Double, Double)] =
      Option(req.get("ranges")) match {
        case Some(m: java.util.Map[_, _]) => m.asScala.toSeq.map {
          case (k, v: java.util.List[_]) =>
            (k.toString,
              v.get(0).asInstanceOf[Number].doubleValue(),
              v.get(1).asInstanceOf[Number].doubleValue())
          case (k, _) => throw new IllegalArgumentException(
            s"ranges.$k must be [lo, hi]")
        }
        case _ => Seq.empty
      }
    val rules: Seq[Quality.Rule] =
      required.map(c => Quality.Complete(c, 1.0)) ++
      (if (unique.nonEmpty) Seq(Quality.Unique(unique, 1.0)) else Nil) ++
      ranges.map { case (c, lo, hi) => Quality.InRange(c, lo, hi, 1.0) }
    if (rules.isEmpty)
      throw new IllegalArgumentException(
        "no rules: give required / unique / ranges")
    val report = Quality.check(df, rules).collect()
    reply(ex, 200, jmap(
      "passed" -> report.forall(_.getBoolean(4)),
      "rules" -> report.toSeq.map(r => jmap(
        "rule" -> r.getString(1),
        "metric" -> (if (r.isNullAt(2)) null else r.getDouble(2)),
        "threshold" -> r.getDouble(3),
        "passed" -> r.getBoolean(4)))))
  }

  private def schema(ex: HttpExchange): Unit = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val path = q.split("&").collectFirst {
      case kv if kv.startsWith("path=") =>
        URLDecoder.decode(kv.substring(5), StandardCharsets.UTF_8)
    }.getOrElse(throw new IllegalArgumentException("missing query: path"))
    val df = Tables.loadPath(spark, path)
    reply(ex, 200, jmap(
      "path" -> path,
      "columns" -> df.schema.map(f => jmap(
        "name" -> f.name,
        "type" -> f.dataType.simpleString,
        "nullable" -> f.nullable)).toSeq))
  }

  private def predictBatch(ex: HttpExchange): Unit = {
    val req = readJson(ex)
    val n = Scoring.batchPredict(spark, str(req, "model_path"),
      str(req, "data_path"), str(req, "output_path"))
    reply(ex, 200, jmap(
      "status" -> "completed",
      "output_path" -> str(req, "output_path"),
      "record_count" -> n))
  }

  private def listModels(ex: HttpExchange): Unit = {
    val registry = Jobs.listJobs().filter(_.status == "completed")
      .map(jobJson)
    // run-log entries (the MLflow-runs analogue) appended when configured
    val logged = metricsLogPath.toSeq.flatMap { p =>
      val df = Jobs.listModels(spark, p)
      if (df.isEmpty) Seq.empty
      else df.toJSON.collect().toSeq.map(s =>
        mapper.readValue(s, classOf[java.util.Map[String, Any]]))
    }
    val all: Seq[Any] = registry ++ logged
    reply(ex, 200, jmap("models" -> all, "count" -> all.size))
  }

  // ── JSON helpers (Jackson over java.util structures) ─────────────────

  private def readJson(ex: HttpExchange): java.util.Map[String, Any] = {
    val body = new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8)
    mapper.readValue(body, classOf[java.util.Map[String, Any]])
  }

  private def reply(ex: HttpExchange, status: Int, body: Any): Unit = {
    val bytes = mapper.writeValueAsBytes(body)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def jobJson(j: Jobs.Job): java.util.Map[String, Any] = jmap(
    "job_id" -> j.jobId,
    "status" -> j.status,
    "algorithm" -> j.algorithm,
    "task_type" -> j.taskType,
    "model_path" -> j.modelPath.orNull,
    "metrics" -> jmap(j.metrics.toSeq.sortBy(_._1).map {
      case (k, v) => k -> (v: Any) }: _*),
    "error" -> j.error.orNull)

  private def jmap(kvs: (String, Any)*): java.util.Map[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    kvs.foreach { case (k, v) => m.put(k, jval(v)) }
    m
  }

  private def jval(v: Any): Any = v match {
    case s: Seq[_] =>
      val l = new java.util.ArrayList[Any]()
      s.foreach(x => l.add(jval(x)))
      l
    case other => other
  }

  private def str(m: java.util.Map[String, Any], k: String): String =
    Option(m.get(k)) match {
      case Some(s: String) => s
      case _ => throw new IllegalArgumentException(s"missing field: $k")
    }

  private def strOr(m: java.util.Map[String, Any], k: String,
      default: String): String =
    Option(m.get(k)).map(_.asInstanceOf[String]).getOrElse(default)

  private def strList(m: java.util.Map[String, Any], k: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Option(m.get(k)) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case _ => throw new IllegalArgumentException(s"missing field: $k")
    }
  }

  private def doubleMatrix(m: java.util.Map[String, Any],
      k: String): Seq[Seq[Double]] = {
    import scala.jdk.CollectionConverters._
    Option(m.get(k)) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map {
        case row: java.util.List[_] =>
          row.asScala.toSeq.map(x => x.asInstanceOf[Number].doubleValue())
        case other =>
          throw new IllegalArgumentException(s"$k must be a list of lists")
      }
      case _ => throw new IllegalArgumentException(s"missing field: $k")
    }
  }
}
