package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: pairs of rows whose time keys lie within a
  * tolerance, optionally per equi-key. Spark plans a raw inequality
  * join as BroadcastNestedLoop/cartesian — O(n·m) and a non-starter at
  * scale. The banded form maps both sides to tolerance-width time bands
  * and equi-joins on (key, band), with the left side exploded to the
  * three adjacent bands; the exact predicate then filters band-edge
  * false positives. Cost: 3× left duplication + one hash shuffle —
  * the standard interval-join strategy streaming engines use.
  */
object RangeJoin {

  /** |leftTime - rightTime| <= tolerance, with an equi-key. Time columns
    * must be numeric (e.g. epoch seconds).
    */
  def bandedWithin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTime: String, rightTime: String,
      tolerance: Long): DataFrame = {
    val lBase = (col(leftTime).cast("long") / tolerance).cast("long")
    val l = left.withColumn("__band",
      explode(array(lBase - 1, lBase, lBase + 1)))
    val r = right.withColumn("__band",
      (col(rightTime).cast("long") / tolerance).cast("long"))
    l.join(r, l("__band") === r("__band") &&
        l(leftKey) === r(rightKey) &&
        abs(l(leftTime) - r(rightTime)) <= tolerance)
      .drop("__band")
  }
}
