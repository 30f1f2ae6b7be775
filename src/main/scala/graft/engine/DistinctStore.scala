package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental per-group distinct counting via mergeable HLL sketches
  * (Spark's built-in DataSketches HllSketch aggregates): build a
  * (group, sketch) table per snapshot, persist it, and fold new
  * snapshots in by sketch UNION — prior snapshots are never re-read.
  *
  * This is the scale answer to "distinct users per segment across a
  * year of daily drops": exact `count_distinct` over the union re-reads
  * a year of data every day; this store reads one day and merges
  * kilobyte sketches. Estimate error is the standard HLL bound
  * (~1.6% at the default lgK=12), which the spec pins against exact
  * counts on the testdata.
  *
  * Companion to the exact-path incremental dedup (anti-join + MinHash
  * signature store): that one answers membership, this one answers
  * cardinality.
  */
object DistinctStore {

  /** One snapshot → (groupCol, sketch: binary). */
  def build(df: DataFrame, groupCol: String, valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge any number of snapshot sketch tables (same group/sketch
    * schema) into one — sketch union per group, kilobytes per group
    * regardless of history size.
    */
  def merge(snapshots: Seq[DataFrame]): DataFrame = {
    require(snapshots.nonEmpty, "merge needs at least one snapshot")
    snapshots.reduce(_.unionByName(_))
      .groupBy(snapshots.head.columns.head)
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))
  }

  /** (group, n_distinct) estimates from a sketch table. */
  def estimates(sketches: DataFrame): DataFrame =
    sketches.select(col(sketches.columns.head),
      hll_sketch_estimate(col("sketch")).as("n_distinct"))

  def save(sketches: DataFrame, path: String): Unit =
    sketches.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
