package graft

/** Prints the live catalog sizes — the truth source tools/sync_counts.py
  * reads. Static parsing of the QuerySpec constructors proved fragile to
  * reformatting (ADVICE r11: a moved `None)` was silently miscounted as
  * oracled); asking the compiled catalog itself cannot drift. No
  * SparkSession is needed: the catalog Seq and its oracle Options are
  * plain values — the query lambdas are never invoked.
  */
object Counts {
  def main(args: Array[String]): Unit = {
    val total = SparkEntry.queries.size
    val oracled = SparkEntry.oracleSql.size
    println(s"GRAFT_COUNTS total=$total oracled=$oracled " +
      s"no_oracle=${total - oracled}")
  }
}
