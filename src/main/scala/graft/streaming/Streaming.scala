package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-Streaming twins of the batch event-time operators
  * (SURVEY.md §2.8 — absent from the reference, which has no streaming
  * code at all; this is north-star scope). The aggregations are defined
  * ONCE as plain DataFrame transforms and applied to either a batch or
  * a streaming source — the Spark-idiomatic way to keep the two paths
  * semantically identical (and how we test them against each other).
  */
object Streaming {

  /** Schema of the normalized events table (post Tables.events). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Tumbling 1-hour event-time windows per event_type. Works on batch
    * and streaming inputs alike; on a stream, pair with a watermark.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))

  /** 30-minute-gap session windows per user (the streaming-native
    * equivalent of Relational's lag+cumsum sessionize).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** File-source stream over a directory of normalized events parquet,
    * with a 10-minute watermark (reference-shaped default).
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)
      .withWatermark("ts", "10 minutes")

  /** Run a streaming aggregation to a named in-memory sink until all
    * currently-available input is processed (local smoke path).
    */
  def runToMemory(agg: DataFrame, name: String,
      mode: String = "complete"): StreamingQuery = {
    val q = agg.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q
  }
}
