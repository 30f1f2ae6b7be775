package graft

/** Prints the live catalog sizes — the truth source tools/sync_counts.py
  * reads. Static parsing of the QuerySpec constructors proved fragile to
  * reformatting (ADVICE r11: a moved `None)` was silently miscounted as
  * oracled); asking the compiled catalog itself cannot drift. No
  * SparkSession is needed: the catalog Seq and its oracle fields are
  * plain values — the query lambdas are never invoked. Counted via
  * [[SparkEntry.oracledNames]], NOT oracleSql.size: the deferred
  * driver-fit twins (QuerySpec.lazyOracle) resolve to None in a fresh
  * JVM because no query has stashed its fit yet — sizing oracleSql
  * here would undercount them (review finding, r13).
  */
object Counts {
  def main(args: Array[String]): Unit = {
    val total = SparkEntry.queries.size
    val oracled = SparkEntry.oracledNames.size
    println(s"GRAFT_COUNTS total=$total oracled=$oracled " +
      s"no_oracle=${total - oracled}")
  }
}
