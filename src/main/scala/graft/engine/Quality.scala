package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ-shaped surface a
  * production ingest pipeline runs before publishing a table): each rule
  * computes one metric over the dataset and compares it to a threshold,
  * yielding one report row per rule — (rule_id, rule, target, metric,
  * threshold, passed).
  *
  * Scale shape: every scalar rule (completeness, range conformance,
  * set conformance, row count) is a conditional aggregate folded into
  * ONE global aggregation — a single partial-agg pass over the data, no
  * shuffle beyond the 1-row combine, no matter how many rules. The two
  * rules that genuinely need more are explicit about it: uniqueness
  * adds one count_distinct (one exchange on the value hash), and each
  * foreign-key rule adds one left-anti join against the (broadcast when
  * small) reference side. Rules never scan the table separately — at
  * 100 TB the suite costs one pass plus the declared extras.
  */
object Quality {

  sealed trait Rule {
    /** Stable id used in the report's rule_id column (evaluation order). */
    def describe: String
  }

  /** Fraction of non-null values in `col` must be >= `minRatio`. */
  final case class Complete(col: String, minRatio: Double) extends Rule {
    def describe = s"complete($col)"
  }

  /** Fraction of non-null values of `col` inside [lo, hi] must be >=
    * `minRatio` (nulls are ignored — pair with [[Complete]] to bound
    * them).
    */
  final case class InRange(col: String, lo: Double, hi: Double,
      minRatio: Double = 1.0) extends Rule {
    def describe = s"in_range($col)"
  }

  /** Fraction of non-null values of `col` in `allowed` must be >=
    * `minRatio`.
    */
  final case class InSet(col: String, allowed: Seq[String],
      minRatio: Double = 1.0) extends Rule {
    def describe = s"in_set($col)"
  }

  /** Total row count must lie in [lo, hi] (hi = Long.MaxValue for
    * open-ended).
    */
  final case class RowCountBetween(lo: Long, hi: Long) extends Rule {
    def describe = "row_count"
  }

  /** distinct(cols) / count(*) must be >= `minRatio` (1.0 = the columns
    * form a key). Costs one extra exchange (count_distinct).
    */
  final case class Unique(cols: Seq[String], minRatio: Double = 1.0)
    extends Rule {
    def describe = s"unique(${cols.mkString(",")})"
  }

  /** Fraction of rows whose `col` value exists in `refCol` of `ref`
    * must be >= `minRatio` (referential integrity). Costs one left-anti
    * join; Spark broadcasts the reference side when it is small.
    */
  final case class ForeignKey(col: String, ref: DataFrame, refCol: String,
      minRatio: Double = 1.0) extends Rule {
    def describe = s"foreign_key($col)"
  }

  /** Mean of non-null `col` must lie in [lo, hi] (vacuous pass when the
    * column is all-null). Folds into the single aggregation pass.
    */
  final case class MeanBetween(col: String, lo: Double, hi: Double)
    extends Rule {
    def describe = s"mean($col)"
  }

  /** Sample standard deviation of `col` must lie in [lo, hi] — the
    * "did this feed flatline / explode" check (a stuck sensor passes
    * every range rule; it fails this one). Vacuous pass below 2 values.
    */
  final case class StddevBetween(col: String, lo: Double, hi: Double)
    extends Rule {
    def describe = s"stddev($col)"
  }

  /** Fraction of non-null values of `col` matching the (Java) regex
    * must be >= `minRatio` — format conformance (ids, emails, ISO
    * dates) without enumerating a value set.
    */
  final case class MatchesRegex(col: String, pattern: String,
      minRatio: Double = 1.0) extends Rule {
    def describe = s"matches_regex($col)"
  }

  /** Run the suite; returns the report DataFrame ordered by rule_id.
    * `metric` is rounded to 9 dp (ratio metrics are exact multiples of
    * 1/count, but partial-agg double summation is order-sensitive in the
    * last ulps).
    *
    * The single global aggregation is collected ONCE as a 1-row result
    * (same convention as the broadcast-1-row global stats in
    * [[Features]]) and the |rules|-row report is assembled driver-side
    * from those scalars — the alternative (a union of per-rule selects
    * over the agg) re-scans the table once per rule unless Catalyst
    * happens to reuse the exchange. Data volume touched: one pass +
    * one count_distinct exchange per [[Unique]] + one anti-join per
    * [[ForeignKey]].
    *
    * Null semantics: [[InRange]]/[[InSet]]/[[MatchesRegex]] ratios are
    * over NON-NULL values (pair with [[Complete]] to bound nulls; a
    * column with zero non-null values passes vacuously); [[Unique]]
    * follows SQL COUNT(DISTINCT ...) — rows with a null in any key
    * column are excluded from the distinct count, so null-keyed rows
    * depress the ratio. For [[MeanBetween]]/[[StddevBetween]] the
    * report's `metric` is the statistic itself (null on an all-null /
    * single-value column — vacuous pass) and `threshold` carries `lo`;
    * `hi` lives in the rule.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "quality suite needs at least one rule")
    val spark = df.sparkSession
    import spark.implicits._

    // all single-pass metrics fold into one global aggregation; each
    // rule contributes a (numerator, denominator) pair and the division
    // happens driver-side (ANSI mode would throw on a 0 denominator —
    // which here means "no values to check", a vacuous pass)
    val nonNull = (c: String) => sum(when(col(c).isNotNull, 1L).otherwise(0L))
    val scalarAggs: Seq[Column] =
      count(lit(1)).cast("double").as("__n") +:
        rules.zipWithIndex.flatMap {
          case (Complete(c, _), i) => Seq(nonNull(c).as(s"n$i"))
          case (InRange(c, lo, hi, _), i) => Seq(
            sum(when(col(c).isNotNull &&
              col(c).cast("double").between(lo, hi), 1L).otherwise(0L))
              .as(s"n$i"),
            nonNull(c).as(s"d$i"))
          case (InSet(c, allowed, _), i) => Seq(
            sum(when(col(c).isin(allowed: _*), 1L).otherwise(0L)).as(s"n$i"),
            nonNull(c).as(s"d$i"))
          case (RowCountBetween(_, _), _) => Nil
          case (Unique(cols, _), i) =>
            Seq(countDistinct(cols.head, cols.tail: _*).as(s"n$i"))
          case (ForeignKey(_, _, _, _), _) => Nil
          case (MeanBetween(c, _, _), i) =>
            Seq(avg(col(c).cast("double")).as(s"f$i"))
          case (StddevBetween(c, _, _), i) =>
            Seq(stddev_samp(col(c).cast("double")).as(s"f$i"))
          case (MatchesRegex(c, p, _), i) => Seq(
            sum(when(col(c).rlike(p), 1L).otherwise(0L)).as(s"n$i"),
            nonNull(c).as(s"d$i"))
        }
    val scalarRow = df.agg(scalarAggs.head, scalarAggs.tail: _*)
      .collect().head
    val total = scalarRow.getDouble(scalarRow.fieldIndex("__n"))
    // sum() over ZERO rows is null, not 0 — an empty drop is a primary
    // quality-failure input and must yield a report (row_count fails,
    // ratio rules pass vacuously), not a NullPointerException
    def field(name: String): Double = {
      val idx = scalarRow.fieldIndex(name)
      if (scalarRow.isNullAt(idx)) 0.0 else scalarRow.getLong(idx).toDouble
    }
    def ratio(num: Double, den: Double): Double =
      if (den == 0) 1.0 else num / den

    // FK rules: one anti-join each (reference side broadcast when small)
    val fkMetrics: Map[Int, Double] = rules.zipWithIndex.collect {
      case (ForeignKey(c, ref, rc, _), i) =>
        val keyed = df.filter(col(c).isNotNull).count()
        val orphans = df.filter(col(c).isNotNull)
          .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti")
          .count()
        i -> ratio((keyed - orphans).toDouble, keyed.toDouble)
    }.toMap

    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val report = rules.zipWithIndex.map { case (r, i) =>
      // nullable statistic for the distribution rules (all-null column /
      // <2 values): metric stays null and the rule passes vacuously
      def statOpt: Option[Double] = {
        val idx = scalarRow.fieldIndex(s"f$i")
        if (scalarRow.isNullAt(idx)) None else
          Some(scalarRow.get(idx).asInstanceOf[Number].doubleValue())
      }
      r match {
        case MeanBetween(_, lo, hi) =>
          (i, r.describe, statOpt.map(round9), lo,
            statOpt.forall(s => s >= lo && s <= hi))
        case StddevBetween(_, lo, hi) =>
          (i, r.describe, statOpt.map(round9), lo,
            statOpt.forall(s => s >= lo && s <= hi))
        case _ =>
          val metric = r match {
            case _: ForeignKey         => fkMetrics(i)
            case _: Complete           => ratio(field(s"n$i"), total)
            case _: InRange | _: InSet | _: MatchesRegex =>
              ratio(field(s"n$i"), field(s"d$i"))
            case _: RowCountBetween    => total
            case _: Unique             => ratio(field(s"n$i"), total)
            case _ => throw new MatchError(r) // unreachable
          }
          val (threshold, passed) = r match {
            case Complete(_, t)       => (t, metric >= t)
            case InRange(_, _, _, t)  => (t, metric >= t)
            case InSet(_, _, t)       => (t, metric >= t)
            case MatchesRegex(_, _, t) => (t, metric >= t)
            case RowCountBetween(lo, hi) =>
              (lo.toDouble, metric >= lo && metric <= hi)
            case Unique(_, t)         => (t, metric >= t)
            case ForeignKey(_, _, _, t) => (t, metric >= t)
            case _ => throw new MatchError(r) // unreachable
          }
          (i, r.describe, Some(round9(metric)), threshold, passed)
      }
    }
    report.toDF("rule_id", "rule", "metric", "threshold", "passed")
      .orderBy("rule_id")
  }

  /** Per-group quality report: the ratio rules ([[Complete]],
    * [[InRange]], [[InSet]], [[MatchesRegex]]) evaluated WITHIN each
    * value of `groupCol` — the "which source / partition / day is
    * broken" view that the whole-table [[check]] aggregates away.
    * Returns (groupCol, rule, metric, threshold, passed), one row per
    * (group, rule); metric is null (vacuous pass) where a group has no
    * values to check.
    *
    * Fully plan-side, unlike [[check]]'s driver-side assembly: ONE
    * aggregation pass keyed by the group computes every rule's
    * numerator/denominator, and `stack` unpivots to rule rows — group
    * cardinality never touches the driver, so a million sources cost
    * the same plan as ten.
    */
  def checkByGroup(df: DataFrame, groupCol: String,
      rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "quality suite needs at least one rule")
    val unsupported = rules.filterNot {
      case _: Complete | _: InRange | _: InSet | _: MatchesRegex => true
      case _ => false
    }
    require(unsupported.isEmpty,
      "checkByGroup supports ratio rules only (Complete/InRange/InSet/" +
        s"MatchesRegex); got: ${unsupported.map(_.describe).mkString(", ")}")
    require(rules.map(_.describe).distinct.length == rules.length,
      "duplicate rule labels — checkByGroup keys thresholds by " +
        "rule.describe, one rule per (type, column)")
    val nonNull = (c: String) => sum(when(col(c).isNotNull, 1L).otherwise(0L))
    val aggs: Seq[Column] = rules.zipWithIndex.flatMap {
      case (Complete(c, _), i) => Seq(nonNull(c).as(s"n$i"),
        count(lit(1)).as(s"d$i"))
      case (InRange(c, lo, hi, _), i) => Seq(
        sum(when(col(c).isNotNull &&
          col(c).cast("double").between(lo, hi), 1L).otherwise(0L))
          .as(s"n$i"),
        nonNull(c).as(s"d$i"))
      case (InSet(c, allowed, _), i) => Seq(
        sum(when(col(c).isin(allowed: _*), 1L).otherwise(0L)).as(s"n$i"),
        nonNull(c).as(s"d$i"))
      case (MatchesRegex(c, p, _), i) => Seq(
        sum(when(col(c).rlike(p), 1L).otherwise(0L)).as(s"n$i"),
        nonNull(c).as(s"d$i"))
      case (r, _) => throw new MatchError(r) // unreachable (validated)
    }
    val thresholds = rules.map {
      case Complete(_, t)        => t
      case InRange(_, _, _, t)   => t
      case InSet(_, _, t)        => t
      case MatchesRegex(_, _, t) => t
      case r => throw new MatchError(r) // unreachable (validated)
    }
    val grouped = df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    // unpivot to (rule, num, den) rows with typed Columns — labels are
    // lit()s, never interpolated into SQL text, so a column name with
    // quotes, commas, parens, or backslashes stays a label verbatim;
    // explode-of-struct-array keeps the single-plan shape stack had
    val ruleRows = rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.describe).as("rule"),
        col(s"n$i").as("__n"), col(s"d$i").as("__d"))
    }
    val thrExpr = rules.zipWithIndex
      .foldRight(lit(Double.NaN): Column) { case ((r, i), acc) =>
        when(col("rule") === lit(r.describe), lit(thresholds(i)))
          .otherwise(acc)
      }
    grouped.select(col(groupCol),
        explode(array(ruleRows: _*)).as("__rule_row"))
      .select(col(groupCol), col("__rule_row.rule").as("rule"),
        col("__rule_row.__n").as("__n"), col("__rule_row.__d").as("__d"))
      .withColumn("metric",
        when(col("__d") > 0, round(col("__n") / col("__d"), 9)))
      .withColumn("threshold", thrExpr)
      .withColumn("passed",
        col("metric").isNull || col("metric") >= col("threshold"))
      .drop("__n", "__d")
  }

  /** Schema drift between two snapshots: one row per changed column —
    * `added` (in current only), `removed` (in base only), or
    * `type_changed` — with the from/to type strings. Pure metadata
    * (no data read, no jobs); the contract check an ingest pipeline
    * runs before [[psiReport]] ever looks at values.
    */
  def schemaDiff(base: DataFrame, current: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val a = base.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val b = current.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      (b.keySet -- a.keySet).toSeq.map(c =>
        (c, "added", Option.empty[String], Option(b(c)))) ++
      (a.keySet -- b.keySet).toSeq.map(c =>
        (c, "removed", Option(a(c)), Option.empty[String])) ++
      a.keySet.intersect(b.keySet).toSeq
        .filter(c => a(c) != b(c))
        .map(c => (c, "type_changed", Option(a(c)), Option(b(c))))
    rows.toDF("column", "change", "from_type", "to_type")
      .orderBy("column", "change")
  }

  /** Row-level reconciliation between two snapshots of a keyed table:
    * one row per key whose row was `added` (right only), `removed`
    * (left only), or `changed` (both present, at least one compare
    * column differs null-safely) — with `changed_cols` naming the
    * differing columns in `compareCols` order (empty string for
    * added/removed). Unchanged keys are not emitted. The data-level
    * complement of [[schemaDiff]]: the check a CDC replica, backfill,
    * or migration runs to prove target == source.
    *
    * Scale shape: a diff is an AGGREGATION, not a join — each side is
    * tagged and unioned, then ONE hash exchange on the key collects
    * both sides' compare-structs per key. A full-outer sort-merge join
    * would shuffle both tables AND sort both sides; this form shuffles
    * the same bytes once and never sorts. Keys must be unique per side
    * (the usual snapshot contract; the struct max picks one row per
    * side otherwise), and compare columns must be orderable types.
    */
  def rowDiff(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "rowDiff needs at least one key column")
    require(compareCols.nonEmpty,
      "rowDiff needs at least one compare column")
    val reserved = Seq("__v", "__side", "__l", "__r", "diff_status",
      "changed_cols")
    val bad = left.columns.toSet ++ right.columns.toSet
    reserved.filter(bad.contains).foreach(c =>
      throw new IllegalArgumentException(s"rowDiff reserves column $c"))
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(keyCols.map(col) :+
        struct(compareCols.map(col): _*).as("__v") :+
        lit(tag).as("__side"): _*)
    val merged = side(left, 0).unionByName(side(right, 1))
      .groupBy(keyCols.map(col): _*)
      .agg(max(when(col("__side") === 0, col("__v"))).as("__l"),
        max(when(col("__side") === 1, col("__v"))).as("__r"))
    val changedList = concat_ws(",", compareCols.map(c =>
      when(!(col(s"__l.$c") <=> col(s"__r.$c")), lit(c))): _*)
    merged
      .withColumn("diff_status",
        when(col("__l").isNull, lit("added"))
          .when(col("__r").isNull, lit("removed"))
          .when(col("__l") <=> col("__r"), lit("unchanged"))
          .otherwise(lit("changed")))
      .filter(col("diff_status") =!= "unchanged")
      .withColumn("changed_cols",
        when(col("diff_status") === "changed", changedList)
          .otherwise(lit("")))
      .select(keyCols.map(col) :+ col("diff_status") :+
        col("changed_cols"): _*)
  }

  /** Population-stability-index drift report between a baseline and a
    * current snapshot of a numeric column: equi-width bins over
    * [lo, hi] (outliers clamp into the edge bins), Laplace-smoothed
    * shares p_i = (n_i + 1) / (N + bins) so empty bins contribute
    * finitely, per-bin contribution (p_i − q_i)·ln(p_i/q_i). Sum the
    * `psi_contrib` column for the headline PSI (rule of thumb:
    * <0.1 stable, 0.1–0.25 drifting, >0.25 shifted).
    *
    * Scale shape: one count aggregation per side (bins ≤ a few hundred
    * rows each), joined on the bin spine — data passes once per
    * snapshot, everything after is O(bins). Deterministic: fixed bins,
    * fixed smoothing, no sampling.
    */
  def psiReport(base: DataFrame, current: DataFrame, column: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "hi must exceed lo")
    val spark = base.sparkSession
    val width = (hi - lo) / bins
    def binned(df: DataFrame): DataFrame =
      df.filter(col(column).isNotNull)
        .select(least(greatest(
            floor((col(column).cast("double") - lo) / width), lit(0)),
          lit(bins - 1)).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    val spine = spark.range(bins).select(col("id").cast("int").as("bin"))
    def shares(df: DataFrame, nCol: String): DataFrame = {
      val total = df.agg(sum("n").as("__N"))
      spine.join(df, Seq("bin"), "left")
        .crossJoin(broadcast(total))
        .select(col("bin"),
          coalesce(col("n"), lit(0L)).as(nCol),
          ((coalesce(col("n"), lit(0L)) + lit(1.0)) /
            (coalesce(col("__N"), lit(0L)) + lit(bins.toDouble)))
            .as(s"__p_$nCol"))
    }
    shares(binned(base), "base_n")
      .join(shares(binned(current), "cur_n"), "bin")
      .select(col("bin"), col("base_n"), col("cur_n"),
        round((col("__p_base_n") - col("__p_cur_n")) *
          log(col("__p_base_n") / col("__p_cur_n")), 9).as("psi_contrib"))
  }
}
