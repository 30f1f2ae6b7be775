package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row (per
  * key) whose time key is <= the left row's — the feature-backfill /
  * point-in-time-correctness join every training pipeline needs and
  * Spark lacks as a built-in.
  *
  * Composed Spark-natively (preference (a) of the custom-operator
  * ladder: no custom SparkPlan needed): union both sides on (key, time),
  * one `last(_, ignoreNulls)` carry-forward window, filter back to left
  * rows. Cost = ONE hash exchange on the key + a partition-local sort —
  * same shuffle shape as any windowed op, no range explosion, no
  * broadcast requirement on either side; survives skew via AQE like any
  * single-key shuffle. Equivalent to DuckDB's native ASOF LEFT JOIN
  * (which the oracle uses).
  *
  * `leftTime`/`rightTime` must be directly comparable; ties resolve
  * "right side first" (a right row AT the left row's time matches).
  * When multiple right rows share (key, time), the one with the
  * greatest `rightTime` tiebreak wins — pass a unique time key (e.g.
  * time*1e6 + id) for full determinism.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      carryCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts after right on time ties
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(col) ++ carryCols.map(c => lit(null).as(c)): _*)
    val r = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__k"), col("__t"), col("__side")) ++
        leftCols.map(c => lit(null).as(c)) ++ carryCols.map(col): _*)
    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(l.unionByName(r)) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carryCols.map(col): _*)
  }
}
