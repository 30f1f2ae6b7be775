package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's suffix-dispatched reader
  * (reference: src/ml_pipeline.py:57-74) minus Delta (no delta jar in this
  * zero-egress env — Parquet carries the same semantics for our tables).
  * All loads are lazy plans; Catalyst pushes filters/projections into the
  * Parquet scan, which is the property we care about at 100 TB.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Suffix-dispatched generic reader (reference: src/ml_pipeline.py:57-71).
    * The reference's DEFAULT branch is Delta; there is no delta jar in
    * this zero-egress env, so a recognizably-Delta path fails loudly
    * instead of silently parquet-reading half a table (a Delta dir's
    * parquet files include stale/removed versions — reading them as raw
    * parquet is wrong, not just unsupported).
    */
  def loadPath(spark: SparkSession, path: String): DataFrame =
    if (isDeltaPath(path))
      throw new UnsupportedOperationException(
        s"Delta table detected at '$path' but no Delta jar is available " +
          "in this environment — export the table to plain parquet and " +
          "pass the .parquet path instead")
    else if (path.endsWith(".parquet")) spark.read.parquet(path)
    else if (path.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (path.endsWith(".json")) spark.read.json(path)
    else if (path.endsWith(".orc")) spark.read.orc(path)
    else spark.read.parquet(path) // non-delta default

  /** A path is Delta if it says so (.delta) or actually carries a
    * transaction log directory. Deliberately NOT a substring match on
    * "_delta_log" — that would false-positive on any unrelated path
    * that merely contains the string (e.g. /backups/my_delta_logs/x.parquet).
    */
  private[engine] def isDeltaPath(path: String): Boolean =
    path.endsWith(".delta") ||
      new java.io.File(path, "_delta_log").isDirectory

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` normalization — schema-adaptive, because the generator
    * has shipped the column two ways across rounds:
    *
    *  - TIMESTAMP(NANOS) parquet, which Spark 4 rejects by default: read
    *    via `spark.sql.legacy.parquet.nanosAsLong` (ts arrives as a
    *    LongType nanosecond count), keep full precision in `ts_ns`, and
    *    floor-divide to a µs TimestampType `ts`.
    *  - TIMESTAMP(MICROS) parquet (isAdjustedToUTC=false → TimestampNTZ
    *    in Spark 4): the wall-clock IS the value; sessions pin
    *    `spark.sql.session.timeZone=UTC`, so casting to TimestampType is
    *    value-preserving and `ts_ns` is the µs epoch ×1000.
    *
    * Either way the normalized contract downstream is identical:
    * `ts_ns` LongType nanos, `ts` TimestampType µs, and
    * `cast(ts as long)` yields floor-to-second epochs matching DuckDB's
    * `epoch_us(ts)//1000000` on the oracle side (DuckDB reads both
    * parquet encodings natively, so the oracle SQL never changes).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // session builders set this up front; the guarded fallback covers
    // externally-built sessions without re-mutating conf on every call
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    val tail = Seq(col("user_id"), col("event_type"), col("value"), col("props"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.select(Seq(
          col("event_id"),
          col("ts").as("ts_ns"),
          timestamp_micros(expr("ts div 1000")).as("ts")) ++ tail: _*)
      case _ => // TimestampType / TimestampNTZType, µs precision
        // the NTZ→timestamp cast interprets the wall-clock in the
        // SESSION time zone — value-preserving only under UTC. The
        // nanosAsLong guard above covers externally-built sessions;
        // this is its time-zone twin (a non-UTC session would silently
        // shift ts/ts_ns here).
        if (s.conf.get("spark.sql.session.timeZone") != "UTC")
          s.conf.set("spark.sql.session.timeZone", "UTC")
        raw.select(Seq(
          col("event_id"),
          (unix_micros(col("ts").cast("timestamp")) * lit(1000L)).as("ts_ns"),
          col("ts").cast("timestamp").as("ts")) ++ tail: _*)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
