package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time dimension lookup over SCD2-style validity intervals:
  * attach to each fact row the dimension attributes of the row whose
  * `[fromCol, toCol)` interval contains the fact's time key (`toCol`
  * null = the open/current interval) — the feature-store join that
  * guarantees a training example only sees attribute values that were
  * live AT ITS OWN timestamp (no future leakage), and the lookup side
  * of an SCD2 dimension ([[graft.engine.Analytics.scd2]]).
  *
  * Composed from [[AsOfJoin]] (preference (a) of the custom-operator
  * ladder): the as-of pass finds the latest interval opening at or
  * before the fact's time key — ONE hash exchange on the key plus a
  * partition-local sort, no per-key interval explosion, no broadcast
  * requirement — and a validity check then nulls the carried
  * attributes where the time key falls at or past that interval's
  * close (a GAP between intervals means no dimension row was live:
  * exactly SQL's no-matching-interval semantics, which is what lets
  * the catalog entry prove this operator against a plain
  * `LEFT JOIN ... ON from <= ts AND (to IS NULL OR ts < to)`).
  *
  * Determinism: `fromCol` must be unique per key (make it so with the
  * time·scale + id trick, as [[AsOfJoin]]'s tie note prescribes) and
  * intervals must not overlap — the SCD2 invariants.
  */
object PitJoin {

  def lookup(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, tsCol: String, fromCol: String, toCol: String,
      carryCols: Seq[String]): DataFrame = {
    val rowCol = "__graft_pit_row"
    require(!fact.columns.contains(rowCol) &&
      !carryCols.contains(rowCol), s"reserved name in use: $rowCol")
    // the carried payload is ONE always-non-null struct — carrying the
    // raw columns would break on the open interval: its null `toCol`
    // gets skipped by the as-of pass's ignoreNulls carry-forward, which
    // then resurrects the PREVIOUS interval's close and falsely
    // invalidates every fact the open interval should serve (and a
    // genuinely-null attribute value would mis-carry the same way).
    // One struct also means one carry-forward window, not one per column.
    val dim2 = dim.withColumn(rowCol,
      struct(col(toCol).as("__to") +: carryCols.map(col): _*))
    val carried = AsOfJoin.asOf(fact, dim2, factKey, dimKey, tsCol,
      fromCol, Seq(rowCol))
    val to = col(rowCol).getField("__to")
    val valid = col(rowCol).isNotNull && (to.isNull || col(tsCol) < to)
    carryCols.foldLeft(carried) { (acc, c) =>
      acc.withColumn(c, when(valid, col(rowCol).getField(c)))
    }.drop(rowCol)
  }
}
