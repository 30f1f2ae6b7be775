package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Quality
import graft.engine.Quality._

/** Rule-by-rule semantics of the data-quality suite: ratio math, null
  * conventions (non-null denominators, vacuous pass on empty, SQL
  * COUNT DISTINCT), FK orphan counting, threshold edges.
  */
class QualitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def report(rows: Seq[(Int, String, Double, Double, Boolean)]) =
    rows.map(r => r._2 -> r).toMap

  test("completeness, range, set, row-count, uniqueness on a mixed table") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "A"), (2L, 20.0, "A"), (3L, 99.0, "B"),
      (null, 5.0, "C"), (5L, null, null)
    ).toDF("id", "v", "cat")
    val out = Quality.check(df, Seq(
        Complete("id", 0.8),           // 4/5 = 0.8 → pass (>=)
        InRange("v", 0.0, 50.0, 0.8),  // 3 of 4 non-null in range → fail
        InSet("cat", Seq("A", "B"), 0.7), // 3 of 4 non-null allowed → pass
        RowCountBetween(5L, 5L),       // exactly 5 → pass
        Unique(Seq("id"), 1.0)))       // null row excluded: 4 distinct / 5
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    val m = report(out.toSeq)
    assert(m("complete(id)")._3 == 0.8 && m("complete(id)")._5)
    assert(m("in_range(v)")._3 == 0.75 && !m("in_range(v)")._5)
    assert(m("in_set(cat)")._3 == 0.75 && m("in_set(cat)")._5)
    assert(m("row_count")._3 == 5.0 && m("row_count")._5)
    assert(m("unique(id)")._3 == 0.8 && !m("unique(id)")._5)
    // rule_id preserves declaration order
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("foreign key counts orphans over non-null keys only") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (2L, "y"), (7L, "z"), (null, "w")
    ).toDF("fk", "payload")
    val ref = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.check(df, Seq(ForeignKey("fk", ref, "pk", 0.5)))
      .collect().head
    // 2 of 3 non-null keys resolve; null key is not an orphan
    assert(out.getDouble(2) == BigDecimal(2.0 / 3).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getBoolean(4))
  }

  test("all-null column passes range/set vacuously; perfect key passes " +
      "uniqueness at 1.0") {
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, null), (2L, null))
      .toDF("id", "v")
    val out = Quality.check(df, Seq(
        InRange("v", 0.0, 1.0, 1.0),
        InSet("id", Seq("1", "2"), 1.0), // ints coerce to match isin strings
        Unique(Seq("id"), 1.0)))
      .collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getBoolean(4)))
    assert(out(0) == ("in_range(v)", 1.0, true))
    assert(out(2) == ("unique(id)", 1.0, true))
  }

  test("checkByGroup isolates the broken source: per-group ratios, " +
      "vacuous pass on empty groups, unsupported rules rejected") {
    val df = Seq[(String, java.lang.Double, String)](
      // source A: clean
      ("A", 1.0, "x"), ("A", 2.0, "y"),
      // source B: half the values null
      ("B", null, "x"), ("B", 3.0, "y"),
      // source C: no values at all for v (vacuous range pass)
      ("C", null, "x")
    ).toDF("src", "v", "tag")
    val out = Quality.checkByGroup(df, "src", Seq(
        Complete("v", 0.9), InRange("v", 0.0, 10.0, 1.0)))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(4))))
      .toMap
    assert(out(("A", "complete(v)")) == ((Some(1.0), true)))
    assert(out(("B", "complete(v)")) == ((Some(0.5), false)))
    assert(out(("C", "complete(v)")) == ((Some(0.0), false)))
    assert(out(("C", "in_range(v)")) == ((None, true))) // nothing to check
    assert(out.size == 6)
    assertThrows[IllegalArgumentException] {
      Quality.checkByGroup(df, "src", Seq(Unique(Seq("v"), 1.0)))
    }
    assertThrows[IllegalArgumentException] {
      Quality.checkByGroup(df, "src",
        Seq(InRange("v", 0.0, 1.0, 1.0), InRange("v", 0.0, 2.0, 1.0)))
    }
  }

  test("distribution rules: mean/stddev bounds pass and fail on the " +
      "statistic; flatlined column fails stddev; all-null passes " +
      "vacuously with null metric; regex rule counts matches") {
    val df = Seq[(java.lang.Double, java.lang.Double, String)](
      (10.0, 5.0, "A-1"), (20.0, 5.0, "B-2"), (30.0, 5.0, "c3")
    ).toDF("v", "flat", "code")
    val out = Quality.check(df, Seq(
        MeanBetween("v", 15.0, 25.0),      // mean 20 → pass
        MeanBetween("v", 0.0, 5.0),        // → fail
        StddevBetween("flat", 0.1, 100.0), // stuck sensor: stddev 0 → fail
        MatchesRegex("code", "^[A-Z]-\\d$", 0.6))) // 2 of 3 → pass
      .collect()
      .map(r => (r.getString(1), Option(r.get(2)), r.getBoolean(4)))
    assert(out(0) == (("mean(v)", Some(20.0), true)))
    assert(out(1)._3 == false)
    assert(out(2) == (("stddev(flat)", Some(0.0), false)))
    assert(out(3)._1 == "matches_regex(code)" && out(3)._3)
    // all-null column: vacuous pass, metric null
    val nulls = Seq[(java.lang.Double, Long)]((null, 1L), (null, 2L))
      .toDF("v", "id")
    val vac = Quality.check(nulls, Seq(MeanBetween("v", 0.0, 1.0),
        StddevBetween("v", 0.0, 1.0))).collect()
    assert(vac.forall(r => r.isNullAt(2) && r.getBoolean(4)))
  }

  test("schemaDiff: identical schemas diff empty; add/remove/retype " +
      "each classified with from/to types") {
    val base = Seq((1L, "x", 1.5)).toDF("id", "name", "score")
    assert(Quality.schemaDiff(base, base).count() == 0)
    val cur = Seq((1L, 1, 2.0f)).toDF("id", "name", "extra")
      .withColumnRenamed("extra", "added_col")
    // name: string → int (retype); score removed; added_col added
    val diff = Quality.schemaDiff(base, cur).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSet
    assert(diff == Set(
      ("added_col", "added", None, Some("float")),
      ("score", "removed", Some("double"), None),
      ("name", "type_changed", Some("string"), Some("int"))))
  }

  test("psiReport: identical distributions give zero PSI; a shifted " +
      "distribution gives positive contributions; outliers clamp to " +
      "edge bins; empty bins stay finite via smoothing") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val same = Quality.psiReport(base, base, "v", bins = 5,
      lo = 0.0, hi = 100.0).collect()
    assert(same.length == 5)
    assert(same.forall(_.getDouble(3) == 0.0))
    // shift everything up 40: mass leaves low bins, enters high ones
    val shifted = base.select((org.apache.spark.sql.functions.col("v")
      + 40.0).as("v"))
    val drift = Quality.psiReport(base, shifted, "v", bins = 5,
      lo = 0.0, hi = 100.0).collect()
    val psi = drift.map(_.getDouble(3)).sum
    assert(psi > 0.25, s"expected strong drift, psi=$psi")
    // values above hi (101..140 after shift) land in the top bin, and
    // the now-empty base-side low bin still yields a finite contribution
    assert(drift.forall(r => !r.getDouble(3).isNaN &&
      !r.getDouble(3).isInfinite))
    val top = drift.find(_.getInt(0) == 4).get
    assert(top.getLong(2) > top.getLong(1)) // cur_n swelled by clamping
  }

  test("an EMPTY input yields a report, not a crash: row_count fails, " +
      "ratio and distribution rules pass vacuously") {
    val empty = Seq.empty[(java.lang.Long, java.lang.Double, String)]
      .toDF("id", "v", "cat")
    val out = Quality.check(empty, Seq(
        Complete("v", 1.0),
        InRange("v", 0.0, 1.0, 1.0),
        InSet("cat", Seq("A"), 1.0),
        MatchesRegex("cat", "^A$", 1.0),
        RowCountBetween(1L, Long.MaxValue),
        Unique(Seq("id"), 1.0),
        MeanBetween("v", 0.0, 1.0),
        ForeignKey("id", Seq((1L, "x")).toDF("k", "x"), "k", 1.0)))
      .collect()
      .map(r => r.getString(1) -> r.getBoolean(4)).toMap
    assert(out("row_count") == false) // the one real signal of an empty drop
    assert(out.removed("row_count").values.forall(identity),
      s"non-row_count rules must pass vacuously on empty input: $out")
  }

  test("checkByGroup labels survive hostile column names (quotes, " +
      "commas, parens, backslashes)") {
    val df = Seq(("A", 1.0), ("B", 2.0))
      .toDF("src", """w"eird, (col)\name""")
    val out = Quality.checkByGroup(df, "src",
        Seq(Complete("""w"eird, (col)\name""", 1.0)))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(4)))
    assert(out.toSet == Set(
      ("A", """complete(w"eird, (col)\name)""", true),
      ("B", """complete(w"eird, (col)\name)""", true)))
  }

  test("rowDiff: added/removed/changed with null-safe compares, " +
      "unchanged keys not emitted, changed_cols in declared order, " +
      "reserved names rejected") {
    val left = Seq[(Long, Option[String], Option[Double])](
      (1L, Some("a"), Some(1.0)), // unchanged
      (2L, Some("b"), Some(2.0)), // removed
      (3L, Some("c"), Some(3.0)), // changed: both columns
      (4L, None, Some(4.0)),      // changed: null -> value on s only
      (5L, Some("e"), None)       // unchanged (null <=> null)
    ).toDF("k", "s", "v")
    val right = Seq[(Long, Option[String], Option[Double])](
      (1L, Some("a"), Some(1.0)),
      (3L, Some("C"), Some(30.0)),
      (4L, Some("d"), Some(4.0)),
      (5L, Some("e"), None),
      (6L, Some("f"), Some(6.0))  // added
    ).toDF("k", "s", "v")
    val out = Quality.rowDiff(left, right, Seq("k"), Seq("s", "v"))
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(out == Seq(
      (2L, "removed", ""),
      (3L, "changed", "s,v"),
      (4L, "changed", "s"),
      (6L, "added", "")))
    assertThrows[IllegalArgumentException] {
      Quality.rowDiff(left.withColumnRenamed("s", "__l"), right,
        Seq("k"), Seq("v"))
    }
  }
}
