package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Suffix-dispatched source coverage (reference: src/ml_pipeline.py:57-71):
  * parquet / csv-with-inferSchema / json round-trips through
  * Tables.loadPath.
  */
class SourcesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")

  def tmp(suffix: String): String =
    Files.createTempDirectory("graft-src").toString + "/data" + suffix

  test("parquet round-trip") {
    val p = tmp(".parquet")
    df.write.parquet(p)
    val back = Tables.loadPath(spark, p)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("csv round-trip with header + schema inference") {
    val p = tmp(".csv")
    df.write.option("header", "true").csv(p)
    val back = Tables.loadPath(spark, p)
    assert(back.schema("id").dataType.typeName == "integer") // inferred
    assert(back.count() == 2)
    assert(back.filter(col("s") === "b").select("v").as[Double].head() == 2.5)
  }

  test("json round-trip") {
    val p = tmp(".json")
    df.write.json(p)
    val back = Tables.loadPath(spark, p)
    assert(back.count() == 2)
    assert(back.columns.sorted.toSeq == Seq("id", "s", "v"))
  }

  test("orc round-trip") {
    val p = tmp(".orc")
    df.write.orc(p)
    val back = Tables.loadPath(spark, p)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("hash split is invariant under repartitioning (unlike randomSplit)") {
    val ids = (1L to 1000L).toDF("doc_id")
    def trainSet(parts: Int): Set[Long] =
      graft.engine.Extensions.hashSplit(ids.repartition(parts), "doc_id")
        .filter(col("is_train") === 1).select("doc_id").as[Long]
        .collect().toSet
    val a = trainSet(2)
    val b = trainSet(13)
    assert(a == b)
    // ~80% of 1000 ± sampling noise
    assert(a.size > 700 && a.size < 900, s"split size ${a.size}")
  }

  test("partitioned parquet write enables partition pruning on read") {
    val dir = Files.createTempDirectory("graft-part").toString + "/li"
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_returnflag", "l_quantity")
      .write.partitionBy("l_returnflag").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val expected = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_returnflag") === "A").count()
    assert(back.count() == expected)
    // the filter must land in PartitionFilters (directory pruning), not
    // as a post-scan data filter — at 100 TB this is the difference
    // between scanning one partition and scanning the table
    back.collect()
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(l_returnflag"),
      s"partition filter not pushed:\n$plan")
  }

  test("hash split keepBuckets=256 keeps every row (hex-compare boundary)") {
    val ids = (1L to 100L).toDF("doc_id")
    val kept = graft.engine.Extensions.hashSplit(ids, "doc_id",
      keepBuckets = 256).filter(col("is_train") === 1).count()
    assert(kept == 100)
    val none = graft.engine.Extensions.hashSplit(ids, "doc_id",
      keepBuckets = 0).filter(col("is_train") === 1).count()
    assert(none == 0)
  }

  test("delta paths fail loudly instead of silently parquet-reading") {
    intercept[UnsupportedOperationException] {
      Tables.loadPath(spark, "/tmp/graft-no-such/table.delta")
    }
    val dir = Files.createTempDirectory("graft-delta")
    Files.createDirectory(dir.resolve("_delta_log"))
    intercept[UnsupportedOperationException] {
      Tables.loadPath(spark, dir.toString)
    }
    // but a path that merely CONTAINS the string is not Delta
    val p = Files.createTempDirectory("graft-my_delta_logs").toString +
      "/data.parquet"
    df.write.parquet(p)
    assert(Tables.loadPath(spark, p).count() == 2)
  }

  // map compare is not parquet-oracle-stable, so maps are test-only
  test("map type: build, lookup, keys") {
    val dfm = Seq((1L, "a", 10.0), (1L, "b", 20.0)).toDF("id", "k", "v")
      .groupBy("id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("k"),
        col("v"))))).as("m"))
    val row = dfm.select(col("m")("b").as("vb"),
      map_keys(col("m")).as("ks")).head()
    assert(row.getDouble(0) == 20.0)
    assert(row.getSeq[String](1) == Seq("a", "b"))
  }

  test("eager count after load (the reference's load_data action)") {
    val d = Tables.customer(spark, "/root/testdata/sf0.001")
    assert(d.count() == 150 && d.columns.length == 5)
  }

  test("Tables.events normalizes BOTH ts encodings (long nanos and µs " +
      "timestamp) to the identical (ts_ns, ts) contract") {
    // the same three instants, written the two ways the generator has
    // shipped them across rounds
    val micros = Seq(0L, 1500000L, 86400000000L)
    def base(k: Int) = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, i.toLong * 10, "click", 1.0, "{}")
    }
    val nanoDir = Files.createTempDirectory("graft-ev-nanos").toString
    base(0).map { case (id, us, u, t, v, p) => (id, us * 1000, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$nanoDir/events.parquet")
    val usDir = Files.createTempDirectory("graft-ev-us").toString
    base(0).toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$usDir/events.parquet")
    def rows(dir: String) = Tables.events(spark, dir)
      .select("event_id", "ts_ns", "ts")
      .as[(Long, Long, java.sql.Timestamp)].collect().toSeq.sortBy(_._1)
    val (fromNanos, fromMicros) = (rows(nanoDir), rows(usDir))
    assert(fromNanos == fromMicros)
    assert(fromNanos.map(_._2) == micros.map(_ * 1000),
      "ts_ns must be the nano-precision epoch either way")
    // the timestamp branch's NTZ→timestamp cast reads the session time
    // zone — events() must pin UTC for an externally-built session in
    // another zone, or ts/ts_ns silently shift (the nanosAsLong guard's
    // time-zone twin)
    val tzKey = "spark.sql.session.timeZone"
    spark.conf.set(tzKey, "America/New_York")
    try {
      val shifted = rows(usDir)
      assert(spark.conf.get(tzKey) == "UTC",
        "events() must restore UTC before casting NTZ")
      assert(shifted == fromMicros, "non-UTC session shifted ts_ns")
    } finally spark.conf.set(tzKey, "UTC")
  }
}
