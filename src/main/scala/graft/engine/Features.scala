package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's dataflow/feature operators re-expressed as pure
  * `DataFrame => DataFrame` transforms (reference: src/feature_engineering.py).
  *
  * Scale posture (100 TB): every op below is a single declarative plan —
  * wide `select`s instead of iterated `withColumn` (keeps the analyzer
  * linear at 10k+ features), window-function forms instead of
  * driver-collected two-pass stats (no `collect()` anywhere), and
  * agg-back joins whose small aggregate side Catalyst broadcast-joins
  * automatically.
  */
object Features {

  /** Time-derived features with the reference's *arithmetic* semantics
    * (reference: src/feature_engineering.py:25-34). NOTE these are
    * deliberately faithful, including the quirks documented in SURVEY.md
    * §2.7: `hour`/`day_of_week`/`day_of_month` are *fractional* doubles
    * (PySpark `/` is double division) and `is_weekend` therefore flags
    * only exact-midnight rows whose epoch-day ≡ 5,6 (mod 7).
    * Calendar-correct variants are in [[calendarTimeFeatures]].
    */
  def timeFeatures(df: DataFrame, tsCol: String): DataFrame = {
    val epoch = col(tsCol).cast("timestamp").cast("long")
    val dow = epoch / 86400 % 7
    df.select(
      df.columns.toSeq.map(col) ++ Seq(
        epoch.as("epoch_s"),
        (epoch % 86400 / 3600).as("hour"),
        dow.as("day_of_week"),
        (epoch / 86400 % 31 + 1).as("day_of_month"),
        when(dow.isin(5, 6), 1).otherwise(0).as("is_weekend")): _*)
  }

  /** Calendar-correct extras (named distinctly from the faithful ops). */
  def calendarTimeFeatures(df: DataFrame, tsCol: String): DataFrame =
    df.select(
      df.columns.toSeq.map(col) ++ Seq(
        hour(col(tsCol)).as("cal_hour"),
        dayofweek(col(tsCol)).as("cal_day_of_week"),
        dayofmonth(col(tsCol)).as("cal_day_of_month"),
        dayofweek(col(tsCol)).isin(1, 7).cast("int").as("cal_is_weekend")): _*)

  /** Group-wise multi-agg (mean/std/min/max/count per value col) joined back
    * onto the fact rows (reference: src/feature_engineering.py:36-58).
    * The aggregate side has |groups| rows — tiny relative to the fact —
    * so Catalyst broadcast-joins it; no second shuffle of the fact table.
    * `roundTo` rounds the float aggregates for oracle determinism
    * (sum-order across partitions perturbs the last ulps); pass -1 to skip.
    */
  def aggregationFeatures(df: DataFrame, groupCols: Seq[String],
      aggCols: Seq[String], roundTo: Int = -1): DataFrame = {
    def r(c: Column): Column = if (roundTo >= 0) round(c, roundTo) else c
    val aggs = aggCols.flatMap { c =>
      Seq(
        r(avg(c)).as(s"${c}_mean"),
        r(stddev(c)).as(s"${c}_std"), // stddev == stddev_samp, as in PySpark
        min(c).as(s"${c}_min"),
        max(c).as(s"${c}_max"),
        count(c).as(s"${c}_count"))
    }
    val agg = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    df.join(agg, groupCols, "left")
  }

  /** Zero-guarded ratio features, `{n}_to_{d}_ratio`
    * (reference: src/feature_engineering.py:60-74). Per-row IEEE math —
    * bit-identical across engines, no rounding needed.
    */
  def ratioFeatures(df: DataFrame, numCols: Seq[String],
      denCols: Seq[String]): DataFrame = {
    val ratios = for (n <- numCols; d <- denCols if n != d) yield
      when(col(d) =!= 0, col(n) / col(d)).otherwise(0.0)
        .as(s"${n}_to_${d}_ratio")
    df.select(df.columns.toSeq.map(col) ++ ratios: _*)
  }

  /** Pairwise products `{a}_x_{b}`, i<j
    * (reference: src/feature_engineering.py:76-85). */
  def interactionFeatures(df: DataFrame, cols: Seq[String]): DataFrame = {
    val inter = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (col(cols(i)) * col(cols(j))).as(s"${cols(i)}_x_${cols(j)}")
    df.select(df.columns.toSeq.map(col) ++ inter: _*)
  }

  /** Z-score outlier flags `{c}_is_outlier`
    * (reference: src/feature_engineering.py:156-176). The reference
    * collects mean/std to the driver (two-pass). We compute the global
    * stats as a 1-row aggregate (map-side partial aggregation — only
    * partial-agg bytes cross the wire) and broadcast-cross-join it back:
    * unlike the `avg(c) over ()` empty-frame window form, this never
    * funnels the fact table into a single partition, so it survives a
    * 100× scale-up.
    */
  def outlierFlags(df: DataFrame, cols: Seq[String],
      threshold: Double = 3.0): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"__${c}_mean"), stddev(col(c)).as(s"__${c}_std")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val flags = cols.map { c =>
      val mean = col(s"__${c}_mean")
      val std = col(s"__${c}_std")
      when(std =!= 0, (abs(col(c) - mean) / std > threshold).cast("int"))
        .otherwise(0).as(s"${c}_is_outlier")
    }
    df.crossJoin(broadcast(stats)).select(df.columns.toSeq.map(col) ++ flags: _*)
  }

  /** Lag features `{c}_lag_{n}` (reference: src/feature_engineering.py:178-196).
    * `tieBreak` extends the reference's `orderBy(order)` so results are
    * deterministic when the order column has duplicates.
    */
  def lagFeatures(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String], lags: Seq[Int] = Seq(1, 7, 30),
      tieBreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
      .orderBy((orderCol +: tieBreak).map(col): _*)
    val lagged = for (c <- valueCols; n <- lags)
      yield lag(col(c), n).over(w).as(s"${c}_lag_$n")
    df.select(df.columns.toSeq.map(col) ++ lagged: _*)
  }

  /** Rolling mean/sum `{c}_rolling_{mean,sum}_{w}` over ROW frames
    * [-w, 0] (reference: src/feature_engineering.py:198-222 — note the
    * frame is w+1 rows wide, faithful to the reference).
    */
  def rollingFeatures(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCols: Seq[String], windows: Seq[Int] = Seq(7, 30),
      tieBreak: Seq[String] = Nil, roundTo: Int = -1): DataFrame = {
    def r(c: Column): Column = if (roundTo >= 0) round(c, roundTo) else c
    val base = Window.partitionBy(partCols.map(col): _*)
      .orderBy((orderCol +: tieBreak).map(col): _*)
    val rolled = for (c <- valueCols; n <- windows; f <- Seq("mean", "sum"))
      yield {
        val w = base.rowsBetween(-n, 0)
        val e = if (f == "mean") avg(col(c)).over(w) else sum(col(c)).over(w)
        r(e).as(s"${c}_rolling_${f}_$n")
      }
    df.select(df.columns.toSeq.map(col) ++ rolled: _*)
  }

  /** Frequency encoding `{c}_freq` via count-join
    * (reference: src/feature_engineering.py:224-234). The |distinct|-row
    * count table broadcast-joins back onto the fact.
    */
  def frequencyEncoding(df: DataFrame, catCols: Seq[String]): DataFrame =
    catCols.foldLeft(df) { (acc, c) =>
      val freq = df.groupBy(c).agg(count(lit(1)).as(s"${c}_freq"))
      acc.join(freq, Seq(c), "left")
    }

  /** Target encoding `{c}_target_mean` (reference:
    * src/feature_engineering.py:236-249 — naive in-sample mean, leakage
    * faithful to the reference).
    */
  def targetEncoding(df: DataFrame, catCols: Seq[String], target: String,
      roundTo: Int = -1): DataFrame =
    catCols.foldLeft(df) { (acc, c) =>
      val m = avg(col(target))
      val enc = df.groupBy(c).agg(
        (if (roundTo >= 0) round(m, roundTo) else m).as(s"${c}_target_mean"))
      acc.join(enc, Seq(c), "left")
    }

  /** K-fold OUT-OF-FOLD target encoding with additive smoothing — the
    * leakage-safe upgrade of [[targetEncoding]] (whose in-sample mean
    * lets each row see its own target — the classic target-leak that
    * inflates validation scores). Each row's fold is a deterministic
    * hash of `idCol`; its encoding is the target mean over the OTHER
    * folds' rows of its category, shrunk toward the global mean by
    * `smoothing` pseudo-observations:
    *
    *   te = (cat_sum − fold_sum + m·prior) / (cat_cnt − fold_cnt + m)
    *
    * The out-of-fold sums need no per-fold recomputation: aggregate
    * once per (category, fold), re-aggregate to per-category totals,
    * and subtract the row's own fold — total minus own-fold IS the
    * other-folds sum. Degenerate case: a category entirely inside one
    * fold has cnt−fold_cnt = 0; with smoothing > 0 the encoding
    * gracefully collapses to the prior (m·prior / m).
    *
    * Values accumulate as exact integer micro-units (`valueScale`),
    * so sums are order-independent; one double division at the end.
    * Scale shape: one (cat, fold) hash aggregate (map-combinable; K×
    * |categories| rows), per-category totals and the prior re-
    * aggregate THAT table and broadcast back — raw data read once
    * (the marginal branches carry the same up-front shape, so the
    * exchange reuses; cf. tokenPmi's canonical-form note).
    */
  def targetEncodingOof(df: DataFrame, catCol: String, target: String,
      idCol: String, folds: Int = 5, smoothing: Double = 20.0,
      valueScale: Int = 100): DataFrame = {
    require(folds >= 2, "folds must be >= 2")
    require(smoothing > 0, "smoothing must be > 0 (degenerate " +
      "single-fold categories need the prior to fall back to)")
    // fold = id mod K (idCol integral): deterministic, cheap, and —
    // unlike a hash — oracle-expressible; callers with non-integral
    // ids pre-derive an integral key (e.g. via hashSplit's md5 prefix)
    // fold is wrapped in coalesce to make it NON-NULLABLE: the join on
    // (cat, fold) otherwise infers isnotnull(pmod(id, K)) into its copy
    // of this subtree only, the copies stop canonicalizing equal, and
    // the (cat, fold) exchange computes per consumer instead of reusing
    // (the tokenPmi/cramers_v failure mode, constraint-inference
    // flavor). The coalesce arm never fires: id is filtered non-null.
    val withFold = df
      .filter(col(catCol).isNotNull && col(target).isNotNull &&
        col(idCol).isNotNull)
      .select(col(idCol), col(catCol),
        coalesce(pmod(col(idCol), lit(folds.toLong)), lit(0L)).as("fold"),
        round(col(target) * valueScale).cast("long").as("__v"))
    val byFold = withFold.groupBy(col(catCol), col("fold"))
      .agg(sum("__v").as("__fs"), count(lit(1)).as("__fc"))
    val byCat = byFold.groupBy(catCol)
      .agg(sum("__fs").as("__cs"), sum("__fc").as("__cc"))
    val prior = byFold.agg(
      (sum("__fs").cast("double") / sum("__fc")).as("__prior"))
    // byFold/byCat are |categories·folds|-sized — no forced broadcast
    // (ADVICE r9: a high-cardinality category column would force a
    // driver-OOM-sized broadcast); AQE broadcasts them itself when
    // they are actually small. Only the 1-row prior keeps the hint.
    withFold
      .join(byFold, Seq(catCol, "fold"))
      .join(byCat, Seq(catCol))
      .crossJoin(broadcast(prior))
      .select(col(idCol), col(catCol), col("fold"),
        round(
          ((col("__cs") - col("__fs")).cast("double") +
            lit(smoothing) * col("__prior")) /
          ((col("__cc") - col("__fc")).cast("double") + lit(smoothing)) /
          valueScale, 6).as(s"${catCol}_te_oof"))
  }

  /** Mean imputation — result-identical to the reference's
    * Imputer-with-rename dance (reference: src/feature_engineering.py:140-149)
    * as one global aggregate broadcast back (same scale rationale as
    * [[outlierFlags]]).
    */
  def meanImpute(df: DataFrame, cols: Seq[String],
      roundTo: Int = -1): DataFrame = {
    val aggs = cols.map(c => avg(col(c)).as(s"__${c}_mean"))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val imputed = cols.map { c =>
      val m = col(s"__${c}_mean")
      coalesce(col(c), if (roundTo >= 0) round(m, roundTo) else m)
        .as(s"${c}_imputed")
    }
    df.crossJoin(broadcast(stats)).select(df.columns.toSeq.map(col) ++ imputed: _*)
  }

  /** Drop-nulls strategy (reference: src/feature_engineering.py:151-152). */
  def dropMissing(df: DataFrame): DataFrame = df.na.drop()

  /** Winsorization: clip `valueCol` into its [loP, hiP] exact
    * interpolated percentiles, appended as `<col>_wins` — the
    * outlier-taming transform that keeps rows (unlike a filter) and
    * bounds leverage (unlike z-scoring). One percentile aggregation
    * (1-row broadcast back) + a projection; same shape as
    * [[Relational]]'s ntile cutpoints, no single-partition window.
    */
  def winsorize(df: DataFrame, valueCol: String,
      loP: Double = 0.05, hiP: Double = 0.95): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP < hiP, "need 0 <= loP < hiP <= 1")
    val cuts = df.agg(
      percentile(col(valueCol), lit(loP)).as("__lo"),
      percentile(col(valueCol), lit(hiP)).as("__hi"))
    df.crossJoin(broadcast(cuts))
      .withColumn(s"${valueCol}_wins",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Robust scaling (x − median) / IQR, appended as `<col>_robust` —
    * the outlier-insensitive alternative to StandardScaler. EXACT
    * interpolated percentiles (one agg + broadcast back), unlike
    * MLlib's RobustScaler whose approxQuantile makes results
    * sketch-dependent; exactness is what lets the DuckDB twin
    * (quantile_cont) hash-match.
    */
  def robustScale(df: DataFrame, valueCol: String): DataFrame = {
    val cuts = df.agg(
      percentile(col(valueCol), lit(0.5)).as("__med"),
      (percentile(col(valueCol), lit(0.75)) -
        percentile(col(valueCol), lit(0.25))).as("__iqr"))
    df.crossJoin(broadcast(cuts))
      .withColumn(s"${valueCol}_robust",
        when(col("__iqr") =!= 0.0,
          (col(valueCol) - col("__med")) / col("__iqr")))
      .drop("__med", "__iqr")
  }

  /** Quantile binning `{c}_binned` per numeric col, fit+transform loop
    * (reference: src/feature_engineering.py:87-101). Approximate
    * (Greenwald-Khanna) by design — the exact twin is the catalog's
    * ntile_binning.
    */
  def binningFeatures(df: DataFrame, cols: Seq[String],
      numBuckets: Int = 10): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      new org.apache.spark.ml.feature.QuantileDiscretizer()
        .setInputCol(c).setOutputCol(s"${c}_binned")
        .setNumBuckets(numBuckets).setHandleInvalid("keep")
        .fit(acc).transform(acc)
    }

  /** Degree-2 polynomial expansion `{c}_poly` of a vector column
    * (reference: src/feature_engineering.py:103-114). */
  def polynomialFeatures(df: DataFrame, vectorCol: String,
      degree: Int = 2): DataFrame =
    new org.apache.spark.ml.feature.PolynomialExpansion()
      .setInputCol(vectorCol).setOutputCol(s"${vectorCol}_poly")
      .setDegree(degree).transform(df)

  /** PCA `{c}_pca`, k components, fit+transform
    * (reference: src/feature_engineering.py:116-128). */
  def pcaFeatures(df: DataFrame, vectorCol: String, k: Int = 10): DataFrame =
    new org.apache.spark.ml.feature.PCA()
      .setInputCol(vectorCol).setOutputCol(s"${vectorCol}_pca").setK(k)
      .fit(df).transform(df)

  /** Config-keyed chain mirroring create_feature_pipeline
    * (reference: src/feature_engineering.py:252-277): time →
    * aggregations → ratios → missing_values, each step optional.
    */
  def featurePipeline(df: DataFrame, cfg: FeatureConfig): DataFrame = {
    var out = df
    cfg.timeCol.foreach(c => out = timeFeatures(out, c))
    cfg.agg.foreach(a => out = aggregationFeatures(out, a.groupCols, a.aggCols))
    cfg.ratio.foreach(r => out = ratioFeatures(out, r.numCols, r.denCols))
    cfg.missing match {
      case Some("drop")   => out = dropMissing(out)
      case Some("mean")   => out = meanImpute(out, cfg.imputeCols)
      case Some("median") => out = MLPipe.imputeMissing(out, cfg.imputeCols,
        "median")
      case _              => ()
    }
    out
  }

  case class AggSpec(groupCols: Seq[String], aggCols: Seq[String])
  case class RatioSpec(numCols: Seq[String], denCols: Seq[String])
  case class FeatureConfig(
      timeCol: Option[String] = None,
      agg: Option[AggSpec] = None,
      ratio: Option[RatioSpec] = None,
      missing: Option[String] = None,
      imputeCols: Seq[String] = Nil)
}
