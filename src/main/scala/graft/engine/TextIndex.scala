package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    val nBuckets: Int) {

  /** BM25 top-k per query; `queries` carries (queryIdCol, queryTextCol).
    * Output matches [[Extensions.bm25TopK]]:
    * (queryIdCol, idCol, bm25, rank).
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
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val fTf = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) +
        (lit(0.75) * col("dl")) / lit(sumDl.toDouble / nDocs)))
    val scored = postings
      .filter(col("__bucket").isin(buckets.toSeq.map(Integer.valueOf): _*))
      .join(broadcast(qterms), "term")
      .withColumn("__contrib",
        round(idf * fTf * lit(1000000.0)).cast("long"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum("__contrib").as("__score_int"))
    Extensions.bm25RankTail(scored, queryIdCol, idCol, k)
  }

  /** Persist: postings partitioned by term-hash bucket + 1-row stats.
    * [[TextIndex.load]] reads it back with the layout intact.
    */
  def save(path: String): Unit = {
    val spark = postings.sparkSession
    import spark.implicits._
    // cluster by the partition column before partitionBy (the
    // IvfIndex.save note): unclustered, every task writes a sliver
    // into every bucket dir — tasks × buckets small files; clustered,
    // each bucket lands as a handful of full files. Raise the count
    // past nBuckets when buckets outgrow executor-sized files.
    postings.repartition(nBuckets, col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(s"$path/postings")
    Seq((nDocs, sumDl, nBuckets, idCol)).toDF(
        "n_docs", "sum_dl", "n_buckets", "id_col")
      .write.mode("overwrite").parquet(s"$path/stats")
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
    val nBuckets: Int) {

  /** BM25 top-k; same output as [[TextIndex.query]]. */
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
    val matched = postings
      .filter(col("__bucket").isin(buckets.toSeq.map(Integer.valueOf): _*))
      .join(broadcast(qterms.select("term").distinct()), "term")
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

  /** Directory (relative to the index path) holding the LIVE segment
    * set: the [[Generations]] pointer target once [[compactSegments]]
    * has run, the original `segments` layout before.
    */
  private def segmentsRoot(path: String): String =
    Generations.currentName(path).getOrElse("segments")

  /** Append one corpus snapshot as a new immutable segment under the
    * live segment root. Documents must be NEW ids (segments never
    * overwrite; dedup upstream — see the incremental dedup ops).
    * `nBuckets` must match across segments (validated on load).
    */
  def appendSegment(docs: DataFrame, textCol: String, idCol: String,
      path: String, segmentName: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
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
    val seg = s"$path/${segmentsRoot(path)}/$segmentName"
    postings.write.mode("errorifexists").partitionBy("__bucket")
      .parquet(s"$seg/postings")
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("s"))
      .collect().head
    Seq((stats.getLong(0), stats.getLong(1), nBuckets, idCol)).toDF(
        "n_docs", "sum_dl", "n_buckets", "id_col")
      .write.mode("errorifexists").parquet(s"$seg/stats")
    postings.unpersist()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete()
  }

  private def segmentDirs(path: String): Array[java.io.File] = {
    val dirs = new java.io.File(s"$path/${segmentsRoot(path)}").listFiles()
    require(dirs != null && dirs.nonEmpty, s"no segments under $path")
    dirs.sorted
  }

  /** Open all segments under `path` as one queryable index; global
    * corpus stats are the sums of the per-segment stats (exact — doc
    * sets are disjoint by the append contract).
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
    new SegmentedTextIndex(
      stats.map(_.getLong(0)).sum, stats.map(_.getLong(1)).sum,
      postings, idCols.head, buckets.head)
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
    * Returns true when a merge happened (false = already compact).
    */
  def compactSegments(spark: SparkSession, path: String): Boolean = {
    val segDirs = segmentDirs(path)
    if (segDirs.length == 1) return false
    val idx = loadSegments(spark, path) // validates buckets + id column
    val postings = segDirs.map(d =>
      spark.read.parquet(s"$d/postings")).reduce(_.unionByName(_))
    val liveCount = postings.count()
    val oldRoot = segmentsRoot(path)
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
    Generations.publish(path, newRoot)
    Generations.retain(path, keep = 2)
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
    * file level.
    */
  def load(spark: SparkSession, path: String): TextIndex = {
    val st = spark.read.parquet(s"$path/stats").collect().head
    new TextIndex(
      st.getLong(st.fieldIndex("n_docs")),
      st.getLong(st.fieldIndex("sum_dl")),
      spark.read.parquet(s"$path/postings"),
      st.getString(st.fieldIndex("id_col")),
      st.getInt(st.fieldIndex("n_buckets")))
  }
}
