package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The query surface the plain ([[TextIndex]]) and segmented
  * ([[SegmentedTextIndex]]) layouts share — what hybrid serving
  * composes over ([[HybridIndex.queryByIds]]), so a streamed
  * segment-store serves through the same fused path as a batch-built
  * plain index (r18). Both implementations return the identical
  * (queryIdCol, idCol, bm25, rank) schema with bit-equal scores (the
  * TextIndexSpec layout-equivalence law). */
trait Bm25Queryable {
  def nDocs: Long
  def sumDl: Long
  def idCol: String
  def query(queries: DataFrame, queryTextCol: String,
      queryIdCol: String, k: Int): DataFrame
}

/** Build-once / query-many inverted text index — the persisted form of
  * [[Extensions.bm25TopK]], the way [[IvfIndex]] is the persisted form
  * of [[Extensions.annIvf]].
  *
  * The ad-hoc operator re-derives term frequencies, document lengths,
  * and document frequencies from the raw corpus on every call — fine
  * for one query batch, wasteful for a serving path. This index pays
  * that cost ONCE:
  *
  *   - '''build''': one corpus pass → posting lists
  *     (term, doc, tf, dl, df) with df/dl denormalized onto each
  *     posting (one extra long each buys join-free scoring at query
  *     time);
  *   - '''save''': postings parquet-partitioned by a term-hash bucket
  *     (`pmod(xxhash64(term), nBuckets)`), global stats beside them;
  *   - '''query''': the query vocabulary is tiny (distinct terms of
  *     the query batch), so its bucket ids are materialized as
  *     LITERALS — on the saved layout the scan prunes to the matching
  *     bucket directories at the FILE level, then `term IN (...)`
  *     pushes into the parquet row groups. A 100 TB posting store
  *     queried with 20 terms over 256 buckets touches at most 20
  *     bucket directories, not the whole store.
  *
  * Only query-derived term strings and bucket ids ever reach the
  * driver; postings stay on the executors. BM25 contributions are
  * accumulated in integer micro-units exactly like
  * [[Extensions.bm25TopK]], so the two paths return bit-identical
  * scores (TextIndexSpec pins that equivalence).
  */
final class TextIndex private[engine] (
    val nDocs: Long,
    val sumDl: Long,
    postings: DataFrame,
    val idCol: String,
    val nBuckets: Int,
    deleted: Option[DataFrame] = None,
    // where this instance was loaded from and which delete epochs its
    // deleted/nDocs/sumDl snapshot CONSUMED — what save() needs to
    // decide which target markers the staged layout actually realizes
    // (r18 review finding F1: a delete committed AFTER load is NOT
    // realized by this instance's postings, and claiming it applied
    // would resurrect the take-down)
    srcPath: Option[String] = None,
    consumedDeletes: Set[String] = Set.empty) extends Bm25Queryable {

  /** BM25 top-k per query; `queries` carries (queryIdCol, queryTextCol).
    * Output matches [[Extensions.bm25TopK]]:
    * (queryIdCol, idCol, bm25, rank).
    *
    * When the loaded layout carries committed take-down deletes
    * ([[TextIndex.delete]]), the deleted docs leave the result AND the
    * statistics, exactly: `nDocs`/`sumDl` were already adjusted at
    * load by the per-delete corrections, and the per-term `df` (a
    * build-time denormalized fact on each posting) is corrected at
    * query time by counting the deleted postings among the probed
    * terms — complete because a term's ENTIRE posting list lives in
    * one hash bucket, so the pruned scan sees every posting of every
    * probed term, deleted docs' included. Scores therefore equal a
    * fresh build over the surviving corpus bit for bit (the
    * never-ingested law, TextIndexSpec). Without deletes the plan is
    * unchanged.
    */
  def query(queries: DataFrame, queryTextCol: String, queryIdCol: String,
      k: Int = 10): DataFrame = {
    require(k > 0, "k must be positive")
    val qterms = queries
      .select(col(queryIdCol),
        explode(Extensions.tokens(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    // the query vocabulary is small by construction; its bucket ids
    // must become literals for the saved layout to prune partitions —
    // a join key can't prune files
    val buckets = qterms
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).cast("int")
        .as("__bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    def idfOf(dfCol: org.apache.spark.sql.Column) = log(lit(1.0) +
      (lit(nDocs.toDouble) - dfCol + lit(0.5)) / (dfCol + lit(0.5)))
    val fTf = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) +
        (lit(0.75) * col("dl")) / lit(sumDl.toDouble / nDocs)))
    val pruned = postings
      .filter(col("__bucket").isin(buckets.toSeq.map(Integer.valueOf): _*))
    val scored = deleted match {
      case None =>
        pruned
          .join(broadcast(qterms), "term")
          .withColumn("__contrib",
            round(idfOf(col("df")) * fTf * lit(1000000.0)).cast("long"))
          .groupBy(col(queryIdCol), col(idCol))
          .agg(sum("__contrib").as("__score_int"))
      case Some(del) =>
        // per-term count of DELETED postings among the probed terms —
        // the exact df correction (term → one bucket, so the pruned
        // read is complete per term); df - __df_del is what a fresh
        // build over the survivors would have denormalized.
        // ONE pruned-postings scan (opt r19, guide §1.2/§2): the old
        // shape evaluated `matched` twice (a df-correction aggregate
        // plus a left_anti of the same scan). Deleted ids are globally
        // DISTINCT by construction ([[TextIndex.delete]] dedups and
        // excludes already-committed ids), so a left join with a
        // marker column is exactly the anti-join's row set, the
        // correction is a whole-partition window count over the probed
        // stream — same integers (count of deleted postings per term;
        // a term with none counts 0, the old coalesce(_, 0L)) — and
        // the deleted rows drop AFTER the count, BEFORE the per-query
        // fan-out (counting after the qterms fan-out would multiply
        // the correction by the number of queries sharing the term).
        val delKeyed = del.withColumnRenamed("__del_id", idCol)
        pruned
          .join(broadcast(qterms.select("term").distinct()), "term")
          .join(delKeyed.withColumn("__del", lit(1)), Seq(idCol), "left")
          .withColumn("__df_del", count(col("__del")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("term")))
          .filter(col("__del").isNull)
          .join(broadcast(qterms), "term")
          .withColumn("__contrib",
            round(idfOf(col("df") - col("__df_del")) * fTf *
              lit(1000000.0)).cast("long"))
          .groupBy(col(queryIdCol), col(idCol))
          .agg(sum("__contrib").as("__score_int"))
    }
    Extensions.bm25RankTail(scored, queryIdCol, idCol, k)
  }

  /** Persist: postings partitioned by term-hash bucket + 1-row stats.
    * [[TextIndex.load]] reads it back with the layout intact.
    *
    * An index loaded WITH committed deletes saves the POST-delete
    * corpus: deleted docs' postings are dropped and each surviving
    * posting's denormalized `df` is corrected, so the written layout
    * equals a fresh build over the survivors — save() is the plain
    * layout's physical-removal path (the segmented layout's is
    * [[TextIndex.compactSegments]]).
    *
    * Protocol (VERDICT r17 #1 — the take-down resurrection window):
    * the layout stages as a fresh `plain-<n>` generation and the
    * [[Generations]] pointer flip is the single commit. The pre-r18
    * order cleared the target's delete epochs FIRST and then
    * overwrote postings in place, so a crash between the two — or
    * Spark's cannot-overwrite-read-path rejection of an in-place
    * re-save, which fired only AFTER the clear — left the OLD
    * postings with NO delete markers: a committed, legally-required
    * take-down silently resurrected. Now nothing at the target is
    * mutated before the flip; in-place re-save (`load(p).save(p)`) is
    * a supported operation because the staged generation never
    * collides with the directories the loaded frames read.
    *
    * The generation's `_dels_applied` manifest records which target
    * delete epochs the staged layout REALIZES (from the flip on they
    * stop filtering and stop correcting stats; their dirs retire one
    * grace cycle later, exactly the [[compactSegments]] protocol — a
    * reader that resolved the old generation just before the flip
    * keeps intact epoch files for the queries it has in flight).
    * Which ones those are depends on the target (r18 review finding
    * F1): on an in-place re-save, exactly the epochs THIS instance
    * consumed at load plus the already-applied carry — a delete
    * committed after the load is not in the staged postings and must
    * stay live; on any other target, every marker (they reference a
    * corpus the flip replaces wholesale).
    */
  def save(path: String): Unit = {
    val spark = postings.sparkSession
    import spark.implicits._
    val (fs, _) = TextIndex.hadoopFs(spark, path)
    val oldRoot = TextIndex.plainRoot(path)
    val nextGen =
      oldRoot.map(_.stripPrefix("plain-").toInt + 1).getOrElse(1)
    val newRoot = s"plain-$nextGen"
    // a crashed earlier attempt at this generation is unpublished by
    // construction (the pointer flip below is the only commit) —
    // delete and restage (the compactSegments restage rule)
    val stale = new java.io.File(s"$path/$newRoot")
    if (stale.exists()) TextIndex.deleteRecursively(stale)
    val livePostings = deleted match {
      case None => postings
      case Some(del) =>
        val delKeyed = del.withColumnRenamed("__del_id", idCol)
        val dfCorr = postings.join(delKeyed, Seq(idCol), "left_semi")
          .groupBy("term").agg(count(lit(1)).as("__df_del"))
        postings.join(delKeyed, Seq(idCol), "left_anti")
          .join(dfCorr, Seq("term"), "left")
          .withColumn("df",
            col("df") - coalesce(col("__df_del"), lit(0L)))
          .drop("__df_del")
    }
    // cluster by the partition column before partitionBy (the
    // IvfIndex.save note): unclustered, every task writes a sliver
    // into every bucket dir — tasks × buckets small files; clustered,
    // each bucket lands as a handful of full files. Raise the count
    // past nBuckets when buckets outgrow executor-sized files.
    livePostings.repartition(nBuckets, col("__bucket"))
      .write.mode("errorifexists").partitionBy("__bucket")
      .parquet(s"$path/$newRoot/postings")
    Seq((nDocs, sumDl, nBuckets, idCol)).toDF(
        "n_docs", "sum_dl", "n_buckets", "id_col")
      .write.mode("errorifexists").parquet(s"$path/$newRoot/stats")
    // names the OLD generation had already applied — their grace
    // cycle ends at this flip, retired below. Names retired by an
    // even earlier cycle have no marker left and drop out of the
    // manifest here (ADVICE r17: the carried-forever manifest grew
    // without bound; deleteEntries already skips missing ids dirs,
    // so a retired name needs no exclusion claim).
    val appliedBefore = TextIndex.appliedDeletes(spark, path)
      .filter(n => fs.exists(
        new org.apache.hadoop.fs.Path(s"$path/_deletes/$n")))
    val delRoot = new org.apache.hadoop.fs.Path(s"$path/_deletes")
    val allMarkers =
      if (!fs.exists(delRoot)) Set.empty[String]
      else fs.listStatus(delRoot).map(_.getPath.getName).toSet
    // which target markers does the STAGED layout actually realize?
    // In-place re-save (target == the path this instance was loaded
    // from): exactly the epochs the load consumed into
    // deleted/nDocs/sumDl, plus the already-applied carry — a delete
    // committed AFTER the load is NOT in the staged postings and must
    // STAY LIVE (claiming it applied would silently resurrect the
    // take-down against the stale instance: r18 review finding F1;
    // the staged stats never subtracted it, so keeping it live keeps
    // the arithmetic exact too). Any OTHER target's markers reference
    // a corpus this flip replaces wholesale: all inapplicable.
    // Path-normalized comparison ("dir/" vs "dir" must not flip an
    // in-place save into the claim-all branch)
    val inPlace = srcPath.exists(sp =>
      new org.apache.hadoop.fs.Path(sp).toString ==
        new org.apache.hadoop.fs.Path(path).toString)
    val realized =
      if (inPlace)
        (appliedBefore ++ consumedDeletes).intersect(allMarkers)
      else allMarkers
    if (realized.nonEmpty) {
      val (mfs, mp) = TextIndex.hadoopFs(spark,
        s"$path/$newRoot/_dels_applied")
      val out = mfs.create(mp, true)
      out.write(realized.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      out.close()
    }
    Generations.publish(path, newRoot) // the commit point
    // retire (a) the epochs whose grace cycle just ended — marker
    // first, ids dir second (the r17 retire order) — and (b) the
    // legacy flat layout's dirs once a generation beyond plain-1
    // supersedes them (they got plain-1's lifetime as THEIR grace)
    appliedBefore.toSeq.sorted.foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_deletes/$n"), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/deletes/$n"), true)
    }
    if (oldRoot.isDefined)
      Seq(s"$path/postings", s"$path/stats").foreach { p =>
        fs.delete(new org.apache.hadoop.fs.Path(p), true)
      }
    // reclaim markerless ids dirs (crash between the two retire
    // deletes above) and crashed delete stagings — the same GC
    // compactSegments runs; markerless dirs are invisible to readers
    val (dfs, droot) = TextIndex.hadoopFs(spark, s"$path/deletes")
    if (dfs.exists(droot))
      dfs.listStatus(droot).toSeq
        .filterNot(st => dfs.exists(new org.apache.hadoop.fs.Path(
          s"$path/_deletes/${st.getPath.getName}")))
        .foreach(st => dfs.delete(st.getPath, true))
    Generations.retain(path, keep = 2, _.startsWith("plain-"))
  }
}

/** Segmented (incremental) variant of [[TextIndex]], Lucene-style: each
  * corpus snapshot is appended as an immutable SEGMENT — its postings
  * carry only segment-local facts (tf, dl), never global ones — and
  * query time derives the global document frequencies from the probed
  * postings themselves. That works because a term's ENTIRE posting
  * list lives in one hash bucket (the bucket function is deterministic
  * in the term), so bucket-pruned reading still sees every posting of
  * every probed term, across all segments.
  *
  * Trade vs [[TextIndex]]: no rebuild on append (the point), one extra
  * per-term aggregation at query time (over the already-pruned
  * postings — small). Scores are IDENTICAL to a fresh full build
  * (TextIndexSpec pins it).
  */
final class SegmentedTextIndex private[engine] (
    val nDocs: Long,
    val sumDl: Long,
    postings: DataFrame,
    val idCol: String,
    val nBuckets: Int,
    deleted: Option[DataFrame] = None) extends Bm25Queryable {

  /** BM25 top-k; same output as [[TextIndex.query]]. Take-down
    * deletes are simpler here than on the plain index: the segmented
    * layout derives `df` from the probed postings at query time, so
    * excluding deleted docs' postings BEFORE that aggregation makes
    * the correction automatic — with `nDocs`/`sumDl` already adjusted
    * at load, scores equal a fresh build over the survivors bit for
    * bit (the never-ingested law). */
  def query(queries: DataFrame, queryTextCol: String, queryIdCol: String,
      k: Int = 10): DataFrame = {
    require(k > 0, "k must be positive")
    val qterms = queries
      .select(col(queryIdCol),
        explode(Extensions.tokens(col(queryTextCol))).as("term"))
      .filter(col("term") =!= "")
      .distinct()
    val buckets = qterms
      .select(pmod(xxhash64(col("term")), lit(nBuckets)).cast("int")
        .as("__bucket"))
      .distinct().collect().map(_.getInt(0)).sorted
    val matched0 = postings
      .filter(col("__bucket").isin(buckets.toSeq.map(Integer.valueOf): _*))
      .join(broadcast(qterms.select("term").distinct()), "term")
    val matched = deleted match {
      case None => matched0
      case Some(del) => matched0.join(
        del.withColumnRenamed("__del_id", idCol), Seq(idCol), "left_anti")
    }
    // global df reconstructed from the pruned postings: complete per
    // probed term because term→bucket is a pure function. Computed
    // BEFORE query ids are attached — joining (queryId, term) pairs
    // first would duplicate each posting once per query sharing the
    // term and inflate df
    val dfreq = matched.groupBy("term")
      .agg(count(lit(1)).as("df"))
    val probed = matched.join(broadcast(qterms), "term")
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val fTf = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) +
        (lit(0.75) * col("dl")) / lit(sumDl.toDouble / nDocs)))
    val scored = probed.join(broadcast(dfreq), "term")
      .withColumn("__contrib",
        round(idf * fTf * lit(1000000.0)).cast("long"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum("__contrib").as("__score_int"))
    Extensions.bm25RankTail(scored, queryIdCol, idCol, k)
  }
}

object TextIndex {

  private[engine] def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Directory (relative to the index path) holding the LIVE segment
    * set: the [[Generations]] pointer target once [[compactSegments]]
    * has run, the original `segments` layout before. A `plain-<n>`
    * pointer (the plain layout's generational save, r18) never reaches
    * here — the plain/segmented split happens on the pointer prefix.
    */
  private def segmentsRoot(path: String): String =
    Generations.currentName(path).filter(_.startsWith("segments"))
      .getOrElse("segments")

  /** The live plain-layout generation root name (`plain-<n>`), or None
    * for a legacy flat layout (postings/stats at the index root) and
    * for segmented paths. */
  private[engine] def plainRoot(path: String): Option[String] =
    Generations.currentName(path).filter(_.startsWith("plain-"))

  /** Where the plain layout's `postings`/`stats` dirs live: the
    * published generation once a generational [[TextIndex#save save]]
    * has run, the index root for the legacy flat layout. */
  private[graft] def plainDataDir(path: String): String =
    plainRoot(path).map(r => s"$path/$r").getOrElse(path)

  /** Reclaim `_staging-del-*` orphans a crashed [[delete]] left at the
    * index root (ADVICE r17: a crash between staging the marker
    * content and the rename strands the staging file forever — a
    * retry under a DIFFERENT name never overwrites it). Safe under
    * the single-maintenance-writer contract: no delete() is mid-
    * commit while another maintenance call runs. */
  private def sweepStagingOrphans(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(root))
      fs.listStatus(root).toSeq
        .filter(_.getPath.getName.startsWith("_staging-del-"))
        .foreach(st => fs.delete(st.getPath, false))
  }

  // ── take-down deletes (VERDICT r16 #2) ───────────────────────────────

  /** Commit a take-down DELETE of document ids against a saved index —
    * plain ([[TextIndex.load]]) or segmented ([[loadSegments]]) layout.
    * The missing half of the store's take-down story until r17: the
    * vector side ([[IvfIndex.delete]] / [[SemanticStore.delete]])
    * honored deletions while a deleted doc kept ranking in BM25 and
    * hybrid results and kept inflating df/avgdl.
    *
    * Commit shape (the proven staged-ids-then-marker protocol): the id
    * list stages as `deletes/<name>/` parquet FIRST; the marker
    * `_deletes/<name>` lands LAST and carries the delete's exact
    * statistics correction as content — `<nDocs>|<sumDl>` of the docs
    * actually present and not already deleted — staged outside
    * `_deletes` and renamed in, one atomic metadata op, because a torn
    * content write would otherwise be read as a committed delete with
    * garbage stats (the compact-manifest lesson). Computing the
    * correction costs one postings scan at delete time (deletes are
    * rare; the scan is the price of keeping nDocs/sumDl EXACT, which
    * is what buys the never-ingested score-equality law). A committed
    * name replays as a no-op; re-using a deleted id later is outside
    * the contract (permanent take-down).
    *
    * Effect from the commit on: both query paths exclude the ids and
    * correct df/nDocs/sumDl exactly (scores equal a never-ingested
    * twin bit for bit). Removal is LOGICAL until the next
    * [[compactSegments]] (segmented) or re-[[TextIndex#save save]]
    * (plain), which drop the postings physically and retire the
    * applied epochs after one grace generation.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String, name: String): Unit = {
    require(name.nonEmpty && !name.contains("/"),
      "delete name must be a single path segment")
    val (fs, _) = hadoopFs(spark, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/_deletes/$name")
    if (fs.exists(marker)) return // committed replay: no-op
    sweepStagingOrphans(fs, path)
    val postings = allPostings(spark, path)
    val docCol = savedIdCol(spark, path)
    val fresh = ids.select(col(idCol).as("__del_id")).distinct()
    // exclude ids an EARLIER delete already committed: their postings
    // are already excluded (or physically gone), and counting them
    // again would double-subtract the stats corrections
    val newIds = deletedIdsDf(spark, path) match {
      case None      => fresh
      case Some(old) => fresh.join(old, Seq("__del_id"), "left_anti")
    }
    newIds.write.mode("overwrite").parquet(s"$path/deletes/$name")
    // the correction counts only docs PRESENT in the live postings —
    // deleting an absent id is a no-op in every statistic. (id, dl) is
    // unique per doc (dl is denormalized onto each posting; a doc
    // lives in exactly one segment by the append contract).
    val st = postings
      .join(newIds.withColumnRenamed("__del_id", docCol),
        Seq(docCol), "left_semi")
      .select(col(docCol), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("s"))
      .collect().head
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/_deletes"))
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_staging-del-$name")
    val out = fs.create(tmp, true)
    out.write(s"${st.getLong(0)}|${st.getLong(1)}".getBytes("UTF-8"))
    out.close()
    require(fs.rename(tmp, marker),
      s"could not publish delete marker $name") // the commit point
  }

  /** The live postings union regardless of layout — plain (the
    * published `plain-<n>` generation, or the legacy flat root) or
    * segmented (every live segment's). The pointer is resolved FIRST:
    * after a generational save over a legacy layout, the superseded
    * flat `postings` dir lingers one grace cycle and must not be
    * mistaken for the live corpus. */
  private def allPostings(spark: SparkSession, path: String): DataFrame = {
    val (fs, _) = hadoopFs(spark, path)
    val plain = plainDataDir(path)
    // driver-side partition discovery (opt r19, §6 — the IvfIndex
    // cellsOf rationale): bucket-partitioned dirs past Spark's 32-path
    // default otherwise pay a distributed listing job per open
    Extensions.withDriverListing(spark) {
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$plain/postings")))
        spark.read.parquet(s"$plain/postings")
      else segmentDirs(path).map(d =>
        spark.read.parquet(s"$d/postings")).reduce(_.unionByName(_))
    }
  }

  /** The saved layout's document id column, from its own stats (plain
    * layout: the live generation's `stats`; segmented: any segment's —
    * load validates they agree). */
  private def savedIdCol(spark: SparkSession, path: String): String = {
    val (fs, _) = hadoopFs(spark, path)
    val plain = plainDataDir(path)
    val statsPath =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$plain/stats")))
        s"$plain/stats"
      else s"${segmentDirs(path).head}/stats"
    val st = spark.read.parquet(statsPath).collect().head
    st.getString(st.fieldIndex("id_col"))
  }

  /** Delete-epoch names the CURRENT published root — segment root or
    * plain generation — has already applied PHYSICALLY (its
    * `_dels_applied` manifest): excluded from every logical filter and
    * stats correction, retired one grace generation later. Legacy flat
    * layouts (and pre-compaction segmented ones) have no manifest:
    * empty. */
  private[engine] def appliedDeletes(spark: SparkSession,
      path: String): Set[String] = {
    val root = plainRoot(path).getOrElse(segmentsRoot(path))
    val (fs, p) = hadoopFs(spark, s"$path/$root/_dels_applied")
    if (!fs.exists(p)) Set.empty
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  /** Committed UNAPPLIED delete epochs: (name, nDocs corr, sumDl corr).
    * A marker whose ids dir is missing is skipped (the mid-retire
    * window — ids already physically gone). */
  private def deleteEntries(spark: SparkSession,
      path: String): Seq[(String, Long, Long)] = {
    val (fs, root) = hadoopFs(spark, s"$path/_deletes")
    if (!fs.exists(root)) Seq.empty
    else {
      val applied = appliedDeletes(spark, path)
      fs.listStatus(root).toSeq
        .filterNot(st => applied(st.getPath.getName))
        .filter(st => fs.exists(new org.apache.hadoop.fs.Path(
          s"$path/deletes/${st.getPath.getName}")))
        .map { st =>
          val in = fs.open(st.getPath)
          val parts =
            try new String(in.readAllBytes(), "UTF-8").split('|')
            finally in.close()
          require(parts.length == 2,
            s"corrupt delete marker ${st.getPath}")
          (st.getPath.getName, parts(0).toLong, parts(1).toLong)
        }.sortBy(_._1)
    }
  }

  /** Whether committed take-down deletes exist that no generation has
    * physically realized yet — i.e. whether a maintenance pass has
    * pending physical-removal work ([[HybridIndex.compact]]'s plain-
    * layout trigger). */
  private[engine] def hasUnappliedDeletes(spark: SparkSession,
      path: String): Boolean = deleteEntries(spark, path).nonEmpty

  /** Whether `path` holds the plain layout (a published `plain-<n>`
    * generation or the legacy flat root) as opposed to the segmented
    * one. */
  private[engine] def isPlainLayout(spark: SparkSession,
      path: String): Boolean = {
    val (fs, _) = hadoopFs(spark, path)
    fs.exists(new org.apache.hadoop.fs.Path(
      s"${plainDataDir(path)}/postings"))
  }

  /** All unapplied deleted ids as one `__del_id` frame; None when none
    * exist (the common case — query paths add no plan step). */
  private def deletedIdsDf(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val names = deleteEntries(spark, path).map(_._1)
    if (names.isEmpty) None
    else Some(spark.read
      .parquet(names.map(n => s"$path/deletes/$n"): _*)
      .distinct())
  }

  /** Segment names the current root's compaction folded into its
    * merged segment (`_segs_folded` manifest) — an append replaying
    * one of these names must refuse, not re-index (their rows live
    * inside the compacted segment now). Empty before any compaction.
    * FILE ORDER is fold order (oldest first — compactions append new
    * names at the tail), which is what lets `retainFolded` drop from
    * the head. */
  private def foldedSegmentsOrdered(spark: SparkSession,
      path: String): Seq[String] = {
    val (fs, p) = hadoopFs(spark,
      s"$path/${segmentsRoot(path)}/_segs_folded")
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
    }
  }

  private def foldedSegments(spark: SparkSession,
      path: String): Set[String] =
    foldedSegmentsOrdered(spark, path).toSet

  /** Append one corpus snapshot as a new immutable segment under the
    * live segment root. Documents must be NEW ids (segments never
    * overwrite; dedup upstream — see the incremental dedup ops).
    * `nBuckets` must match across segments (validated on load).
    *
    * Returns false on a replay: a `segmentName` whose segment is
    * already fully written (stats dir present — stats land last, the
    * segment's commit point), or one a compaction has since FOLDED
    * into its merged segment (`_segs_folded` — without this check a
    * checkpoint replay straddling an auto-compaction would re-index
    * the folded batch as a fresh segment and double-count every
    * document, the [[SemanticStore.ingest]] folded-name refusal
    * twin; r18 review finding). A segment dir WITHOUT stats is a
    * crashed half-write — unpublished by construction — and is
    * deleted and restaged.
    *
    * `compactEvery` (VERDICT r17 #2b) bounds the segment count the
    * way [[SemanticStore.ingest]]'s twin knob bounds epochs: once
    * this append brings the live segment count to the threshold,
    * [[compactSegments]] runs before returning. Each query probes one
    * bucket directory PER SEGMENT, so an unbounded per-micro-batch
    * append stream pays a linearly growing open-and-merge tax — the
    * text twin of the measured ~5×-over-40-epochs store curve. 0 =
    * never (the default). `retainFolded` forwards to
    * [[compactSegments]]'s manifest horizon (see its doc for the
    * replay contract); 0 = keep every folded name.
    */
  def appendSegment(docs: DataFrame, textCol: String, idCol: String,
      path: String, segmentName: String, nBuckets: Int = 64,
      compactEvery: Int = 0, retainFolded: Int = 0): Boolean = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val (fs, _) = hadoopFs(spark, path)
    if (foldedSegments(spark, path).contains(segmentName)) return false
    val seg = s"$path/${segmentsRoot(path)}/$segmentName"
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$seg/stats"))) {
      // committed replay: no-op — but verify the refused batch IS a
      // redelivery, not a caller naming bug reusing the name for a
      // different corpus snapshot, which would otherwise drop the
      // documents silently (r18 review finding F3; the pre-r18
      // errorifexists at least threw). One tokenize+agg on this rare
      // path buys the (n_docs, sum_dl) fingerprint — same-data
      // redelivery reproduces it exactly (the stats are a pure
      // function of the batch), different data virtually never does.
      // A FOLDED name can't be checked (its rows merged away) — the
      // immutable-name contract is all that guards that path.
      val st = spark.read.parquet(s"$seg/stats").collect().head
      val fp = docs
        .select(col(idCol),
          explode(Extensions.tokens(col(textCol))).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
        .agg(count(lit(1)).as("n"), coalesce(sum("dl"), lit(0L)).as("s"))
        .collect().head
      require(fp.getLong(0) == st.getLong(st.fieldIndex("n_docs")) &&
        fp.getLong(1) == st.getLong(st.fieldIndex("sum_dl")),
        s"segment name '$segmentName' is already committed with " +
          s"DIFFERENT documents (committed n_docs=" +
          s"${st.getLong(st.fieldIndex("n_docs"))}/sum_dl=" +
          s"${st.getLong(st.fieldIndex("sum_dl"))}, this batch " +
          s"${fp.getLong(0)}/${fp.getLong(1)}) — segment names are " +
          "immutable; use a fresh name for a new snapshot")
      return false
    }
    if (fs.exists(new org.apache.hadoop.fs.Path(seg)))
      fs.delete(new org.apache.hadoop.fs.Path(seg), true) // crashed half-write
    val tf = docs
      .select(col(idCol), explode(Extensions.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    val postings = tf.join(dl, idCol)
      .withColumn("__bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    postings.write.mode("errorifexists").partitionBy("__bucket")
      .parquet(s"$seg/postings")
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("s"))
      .collect().head
    Seq((stats.getLong(0), stats.getLong(1), nBuckets, idCol)).toDF(
        "n_docs", "sum_dl", "n_buckets", "id_col")
      .write.mode("errorifexists").parquet(s"$seg/stats")
    postings.unpersist()
    if (compactEvery > 0 && segmentDirs(path).length >= compactEvery)
      compactSegments(spark, path, retainFolded)
    true
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete()
  }

  private def segmentDirs(path: String): Array[java.io.File] = {
    // directories only: the root also carries the `_dels_applied`
    // manifest file once a delete-applying compaction has run
    val dirs = Option(new java.io.File(s"$path/${segmentsRoot(path)}")
      .listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
    require(dirs.nonEmpty, s"no segments under $path")
    dirs.sorted
  }

  /** Open all segments under `path` as one queryable index; global
    * corpus stats are the sums of the per-segment stats (exact — doc
    * sets are disjoint by the append contract), minus the exact
    * corrections of any committed unapplied deletes.
    */
  def loadSegments(spark: SparkSession, path: String): SegmentedTextIndex = {
    val segDirs = segmentDirs(path)
    val stats = segDirs.map(d =>
      spark.read.parquet(s"$d/stats").collect().head)
    val buckets = stats.map(_.getInt(2)).distinct
    require(buckets.length == 1,
      s"segments disagree on n_buckets: ${buckets.mkString(", ")}")
    val idCols = stats.map(_.getString(3)).distinct
    require(idCols.length == 1,
      s"segments disagree on id column: ${idCols.mkString(", ")}")
    val postings = segDirs.map(d =>
      spark.read.parquet(s"$d/postings")).reduce(_.unionByName(_))
    val dels = deleteEntries(spark, path)
    new SegmentedTextIndex(
      stats.map(_.getLong(0)).sum - dels.map(_._2).sum,
      stats.map(_.getLong(1)).sum - dels.map(_._3).sum,
      postings, idCols.head, buckets.head,
      deletedIdsDf(spark, path))
  }

  /** Merge every live segment into ONE — the maintenance job a
    * per-micro-batch append stream needs, or small segments accumulate
    * forever (a query probes one bucket directory PER SEGMENT).
    * Query results are bit-identical across compaction: postings carry
    * only per-document facts (tf, dl) whose union is layout-free, and
    * the summed global stats are unchanged.
    *
    * Protocol is audit-then-flip on a segment-ROOT generation: the
    * merged segment stages under a fresh `segments-<n>` root, is
    * audited against the live posting count, and the [[Generations]]
    * pointer flip is the commit — readers resolve the pointer and never
    * see a half-compacted set. The sweep keeps TWO roots (the same
    * grace window mergeSink's `retainGenerations = 2` default gives):
    * a reader that resolved the old root just before the flip finishes
    * its query against intact files; the root it read is collected on
    * the NEXT compaction, by which point the flip it straddled is long
    * visible. Single-maintenance-writer contract (appends racing a
    * compaction can land in the superseded root).
    *
    * `retainFolded` (r18 review finding F4) bounds the `_segs_folded`
    * replay-refusal manifest: keep at most that many folded names —
    * always ALL of this merge's own names (a replay straddling THIS
    * compaction is the live hazard) plus the newest tail of the
    * carried names up to the budget. 0 (default) keeps every name
    * forever — fully sound, but a per-micro-batch stream folding for
    * months grows the manifest and every append's read of it without
    * bound. Setting it is a CONTRACT: the caller asserts its
    * checkpoint can only redeliver batches younger than the retained
    * horizon (Structured Streaming redelivers at/after the last
    * committed offset — sinks folding every `compactEvery` batches
    * are safe with any retainFolded ≥ compactEvery; the sinks pass
    * 4× for margin). A replay OLDER than the horizon would re-index
    * its batch as a fresh segment.
    * Returns true when a merge happened (false = already compact).
    */
  def compactSegments(spark: SparkSession, path: String,
      retainFolded: Int = 0): Boolean = {
    val segDirs = segmentDirs(path)
    // committed unapplied deletes are compaction WORK: even a single-
    // segment index compacts to realize them physically (the segmented
    // layout's only physical-removal path)
    val dels = deleteEntries(spark, path)
    if (segDirs.length == 1 && dels.isEmpty) return false
    val idx = loadSegments(spark, path) // validates buckets + id column
    // idx.nDocs/sumDl are already NET of the unapplied deletes (exact
    // per-delete corrections), so they are exactly the stats of the
    // filtered postings staged below
    val rawPostings = segDirs.map(d =>
      spark.read.parquet(s"$d/postings")).reduce(_.unionByName(_))
    val postings = deletedIdsDf(spark, path) match {
      case None      => rawPostings
      case Some(del) => rawPostings.join(
        del.withColumnRenamed("__del_id", idx.idCol),
        Seq(idx.idCol), "left_anti")
    }
    val liveCount = postings.count()
    val oldRoot = segmentsRoot(path)
    // bounded manifest (ADVICE r17): names whose epoch dirs an earlier
    // grace cycle already retired need no exclusion claim
    // (deleteEntries skips missing ids dirs) — carrying them forever
    // grew the manifest and the retire loop without bound
    val (pfs, _) = hadoopFs(spark, path)
    sweepStagingOrphans(pfs, path)
    val appliedBefore = appliedDeletes(spark, path)
      .filter(n => pfs.exists(
        new org.apache.hadoop.fs.Path(s"$path/_deletes/$n")))
    val nextGen = if (oldRoot == "segments") 1
      else oldRoot.stripPrefix("segments-").toInt + 1
    val newRoot = s"segments-$nextGen"
    // a crashed earlier attempt at this generation is unpublished by
    // construction (the pointer flip below is the only commit) —
    // delete and restage; without this, errorifexists wedges EVERY
    // future compaction on the leftover (the IvfIndex.compactEpochs
    // restage rule, r16 heal)
    val stale = new java.io.File(s"$path/$newRoot")
    if (stale.exists()) deleteRecursively(stale)
    val seg = s"$path/$newRoot/compact-${"%06d".format(nextGen)}"
    postings.write.mode("errorifexists").partitionBy("__bucket")
      .parquet(s"$seg/postings")
    import spark.implicits._
    Seq((idx.nDocs, idx.sumDl, idx.nBuckets, idx.idCol)).toDF(
        "n_docs", "sum_dl", "n_buckets", "id_col")
      .write.mode("errorifexists").parquet(s"$seg/stats")
    // audit ON THE WRITTEN FILES before the flip (write corruption
    // would survive a df-side check)
    val written = spark.read.parquet(s"$seg/postings").count()
    require(written == liveCount,
      s"compaction audit failed: wrote $written postings, live $liveCount")
    // record the deletes this generation realized physically (carrying
    // every previously applied name forward, the _folded rule): from
    // the flip on they stop filtering and stop correcting stats, even
    // while their epoch dirs await the grace-cycle retire below
    if (appliedBefore.nonEmpty || dels.nonEmpty) {
      val (mfs, mp) = hadoopFs(spark, s"$path/$newRoot/_dels_applied")
      val out = mfs.create(mp, true)
      out.write((appliedBefore ++ dels.map(_._1)).toSeq.sorted
        .mkString("\n").getBytes("UTF-8"))
      out.close()
    }
    // record every segment name this merge folded (carrying the old
    // root's manifest forward, the SemanticStore `_folded` rule): an
    // appendSegment replaying one of these names — a checkpoint
    // replay straddling the compaction — must refuse rather than
    // re-index the batch as a fresh segment (r18 review finding).
    // File order = fold order (new names at the tail); retainFolded
    // drops from the HEAD, never below this merge's own names.
    locally {
      val own = segDirs.map(_.getName).sorted
      val carried = foldedSegmentsOrdered(spark, path)
        .filterNot(own.contains)
      val kept =
        if (retainFolded <= 0) carried ++ own
        else carried.takeRight(math.max(0, retainFolded - own.length)) ++ own
      val (sfs, sp) = hadoopFs(spark, s"$path/$newRoot/_segs_folded")
      val out = sfs.create(sp, true)
      out.write(kept.mkString("\n").getBytes("UTF-8"))
      out.close()
    }
    Generations.publish(path, newRoot)
    // sweep only segment roots: unfiltered, a recent deletes/ or
    // _deletes/ dir outranks the superseded root by mtime and the old
    // root loses its grace cycle (see Generations.retain)
    Generations.retain(path, keep = 2, _.startsWith("segments"))
    // retire delete epochs the PREVIOUS generation had applied — they
    // served their one grace cycle (a reader that resolved the old
    // root before the flip still filters through them; that root was
    // itself just swept by retain). Marker first, ids dir second (the
    // r17 retire order); names retired by an earlier cycle no-op.
    val (fs, _) = hadoopFs(spark, path)
    appliedBefore.toSeq.sorted.foreach { n =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_deletes/$n"), false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/deletes/$n"), true)
    }
    // reclaim ids dirs whose marker is gone — the crash-between-the-
    // two-retire-deletes orphan (ADVICE r17 on the SemanticStore twin
    // of this sweep: the retire loops iterate marker names only, so
    // once the marker is deleted a crash-orphaned ids dir was never
    // listed again). Markerless dirs are invisible to every reader
    // (reads resolve via markers), so collecting them is pure GC.
    val (dfs, droot) = hadoopFs(spark, s"$path/deletes")
    if (dfs.exists(droot))
      dfs.listStatus(droot).toSeq
        .filterNot(st => dfs.exists(new org.apache.hadoop.fs.Path(
          s"$path/_deletes/${st.getPath.getName}")))
        .foreach(st => dfs.delete(st.getPath, true))
    true
  }

  /** One pass over the corpus: tokenize, per-doc term frequencies,
    * document lengths and frequencies denormalized onto each posting,
    * bucket by term hash. Global stats (corpus size, total length) are
    * the only values collected to the driver.
    */
  def build(docs: DataFrame, textCol: String, idCol: String,
      nBuckets: Int = 64): TextIndex = {
    require(nBuckets > 0, "nBuckets must be positive")
    val clash = docs.columns.toSet
      .intersect(Set("term", "tf", "dl", "df", "__bucket", "__contrib",
        "__score_int"))
    require(clash.isEmpty,
      s"input uses reserved internal column names: ${clash.mkString(", ")}")
    val tf = docs
      .select(col(idCol), explode(Extensions.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(idCol).agg(sum("tf").as("dl"))
    // count(when(tf > 0, 1)) keeps this branch reusing tf's exchange —
    // see Extensions.bm25TopK for why count(lit(1)) forces a re-scan
    val dfreq = tf.groupBy("term")
      .agg(count(when(col("tf") > 0, 1)).as("df"))
    val postings = tf.join(dl, idCol).join(dfreq, "term")
      .withColumn("__bucket",
        pmod(xxhash64(col("term")), lit(nBuckets)).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("s"))
      .collect().head
    new TextIndex(stats.getLong(0), stats.getLong(1), postings, idCol,
      nBuckets)
  }

  /** Open a saved index; queries prune its bucket partitions at the
    * file level. Committed deletes load as the query-path exclusion +
    * the exact stats corrections — names the published generation's
    * `_dels_applied` manifest claims are already physically realized
    * in the loaded postings and are excluded from both
    * ([[deleteEntries]]). Reads the published `plain-<n>` generation
    * when one exists, the legacy flat root otherwise.
    */
  def load(spark: SparkSession, path: String): TextIndex = {
    val base = plainDataDir(path)
    val st = spark.read.parquet(s"$base/stats").collect().head
    val dels = deleteEntries(spark, path)
    new TextIndex(
      st.getLong(st.fieldIndex("n_docs")) - dels.map(_._2).sum,
      st.getLong(st.fieldIndex("sum_dl")) - dels.map(_._3).sum,
      Extensions.withDriverListing(spark)(
        spark.read.parquet(s"$base/postings")),
      st.getString(st.fieldIndex("id_col")),
      st.getInt(st.fieldIndex("n_buckets")),
      deletedIdsDf(spark, path),
      // save() needs to know which target markers this snapshot
      // realizes: exactly these names, at exactly this path — a
      // delete committed after this load stays live through an
      // in-place re-save (r18 review finding F1)
      srcPath = Some(path),
      consumedDeletes = dels.map(_._1).toSet)
  }
}
