package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round lineage truncation for the iterative graph operators
  * ([[Analytics.bfsDistances]], [[Analytics.kCore]],
  * [[Analytics.pageRank]], [[graft.operators.ConnectedComponents]]).
  *
  * Every round of an iterative op must cut its plan lineage or the
  * analyzer/optimizer cost grows quadratically with rounds. Two ways to
  * cut it:
  *
  *  - `localCheckpoint` (the default): materializes to EXECUTOR-LOCAL
  *    storage — fast, zero configuration, but the blocks die with a
  *    lost executor and there is no lineage left to recompute them; on
  *    a real cluster a single executor loss mid-iteration fails the
  *    job. The right choice for local mode and short interactive runs.
  *  - a RELIABLE checkpoint into `checkpointDir` (HDFS/object-store in
  *    production): survives executor loss — the posture for the 100×
  *    runs where losing one of 1000 executors over a long iteration is
  *    expected, not exceptional.
  *
  * Checkpoint files under a reliable dir are not self-deleting (Spark
  * only cleans them with `spark.cleaner.referenceTracking
  * .cleanCheckpoints`); callers own the directory's lifecycle.
  */
private[graft] object Lineage {

  /** A per-round truncation function: reliable `checkpoint` into
    * `checkpointDir` when given (the dir is registered once, here),
    * `localCheckpoint` otherwise.
    *
    * `eager = true` (the default) materializes at the call — its own
    * Spark job per round. `eager = false` severs the plan identically
    * (the returned Dataset is backed by the checkpoint-marked RDD
    * either way) but defers materialization to the caller's NEXT
    * full-pass action — callers that aggregate/count the frame right
    * after the cut get the truncation for one job instead of two
    * (guide §1.2: per-round driver actions are the iterative
    * operators' dominant fixed cost). Lazy callers must guarantee a
    * full-pass action runs before the frame is consumed twice in one
    * job, or the cut plan evaluates twice inside that job.
    */
  def truncator(spark: SparkSession,
      checkpointDir: Option[String],
      eager: Boolean = true): DataFrame => DataFrame = {
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    df =>
      if (checkpointDir.isDefined) df.checkpoint(eager = eager)
      else df.localCheckpoint(eager = eager)
  }
}
