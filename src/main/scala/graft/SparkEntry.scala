package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog lives in [[graft.engine.Relational]] (oracle-checked
  * relational operators) and [[graft.engine.Extensions]] (training-data
  * pipeline ops: dedup / similarity / text analysis); each catalog entry
  * carries its Spark plan and DuckDB oracle twin side by side.
  */
object SparkEntry {

  private def allSpecs: Seq[QuerySpec] =
    Relational.catalog ++ TpchQueries.catalog ++ ExtensionQueries.catalog ++
      MLQueries.catalog ++ AnalyticsQueries.catalog

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("freq_encoding")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allSpecs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * Entries whose twin inlines driver-fit literals (the PQ family)
    * resolve through QuerySpec.lazyOracle — present only after the
    * catalog pass has run and stashed the fits. */
  def oracleSql: Map[String, String] =
    allSpecs.flatMap(q =>
      q.oracle.orElse(q.lazyOracle.flatMap(_())).map(q.name -> _)).toMap

  /** Names of every entry that carries an oracle — eager or deferred —
    * WITHOUT invoking any query or generator: the static count
    * graft.Counts reports (a fresh JVM has no fit stashes, so sizing
    * oracleSql there would undercount the deferred twins). */
  def oracledNames: Set[String] =
    allSpecs.filter(q => q.oracle.isDefined || q.lazyOracle.isDefined)
      .map(_.name).toSet
}
