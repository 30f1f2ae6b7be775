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
    // internal column names are namespaced; collisions with caller
    // columns would otherwise surface as confusing ambiguity errors
    // several operators downstream
    val (kc, tc, sc) = ("__graft_asof_k", "__graft_asof_t", "__graft_asof_side")
    val overlap = carryCols.toSet.intersect(leftCols.toSet)
    require(overlap.isEmpty,
      s"carryCols collide with left columns: ${overlap.mkString(", ")}")
    val reserved = Seq(kc, tc, sc)
    require(!(leftCols ++ carryCols).exists(reserved.contains),
      s"reserved internal names in use: ${reserved.mkString(", ")}")
    val l = left
      .withColumn(kc, col(leftKey)).withColumn(tc, col(leftTime))
      .withColumn(sc, lit(1)) // left sorts after right on time ties
      .select(Seq(col(kc), col(tc), col(sc)) ++
        leftCols.map(col) ++ carryCols.map(c => lit(null).as(c)): _*)
    val r = right
      .withColumn(kc, col(rightKey)).withColumn(tc, col(rightTime))
      .withColumn(sc, lit(0))
      .select(Seq(col(kc), col(tc), col(sc)) ++
        leftCols.map(c => lit(null).as(c)) ++ carryCols.map(col): _*)
    val w = Window.partitionBy(kc).orderBy(tc, sc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(l.unionByName(r)) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col(sc) === 1)
      .select(leftCols.map(col) ++ carryCols.map(col): _*)
  }
}
