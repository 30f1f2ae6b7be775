package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * missing step between near-dup PAIRS and dedup CLUSTERS (transitive
  * closure: a~b, b~c ⇒ {a,b,c} share one survivor).
  *
  * Each round every node adopts the minimum label among itself and its
  * neighbors; convergence in O(diameter) rounds. Each round is two
  * shuffles (join + groupBy) of the edge list — the standard
  * Spark-native CC shape. Lineage is truncated with localCheckpoint
  * every few rounds so long chains don't accumulate a deep plan (the
  * classic iterative-algorithm failure mode at scale).
  *
  * Deterministic: labels are mins over a fixed edge set.
  */
object ConnectedComponents {

  /** @param nodes  one column `idCol` (covers isolated nodes)
    * @param edges  columns `srcCol`, `dstCol` (undirected; self-loops ok)
    * @return (idCol, component) where component = min node id reachable
    */
  def components(nodes: DataFrame, edges: DataFrame, idCol: String,
      srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame = {
    val spark = nodes.sparkSession
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .cache()
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("comp"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.select(col("id"), col("comp"))
        .unionByName(msgs)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true) // truncate lineage each round
      val changed = next.join(labels.withColumnRenamed("comp", "old"), "id")
        .filter(col("comp") =!= col("old")).limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    labels.select(col("id").as(idCol), col("comp").as("component"))
  }
}
