package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval over PERSISTED indexes — the production 100 TB
  * search shape: the BM25 branch queries a [[TextIndex]] (term-hash
  * bucket partitions, query vocabulary becomes literals so the scan
  * file-prunes), the dense branch queries an [[IvfIndex]] (cell
  * partitions, probed cells become literals likewise), and the two
  * ≤ |Q|·kBranch-row rank tables fuse with reciprocal-rank fusion —
  * the same tail as the in-memory [[Extensions.rrfFusion]], shared
  * code, shared laws.
  *
  * Both branches scan only PRUNED partitions of their saved layouts;
  * the fusion layer adds no corpus-sized work at all. Under exhaustive
  * parameters (nprobe = the index's cell count) the dense branch is
  * exact, so the composed result equals the in-memory
  * [[Extensions.rrfFusion]] bit-for-bit — the parity law
  * HybridIndexSpec pins; production runs prune (nprobe < nCells) and
  * inherit the IVF recall trade on the dense branch only (the lexical
  * branch is always exact).
  */
object HybridIndex {

  /** Take-down DELETE mirrored through BOTH persisted branches
    * (VERDICT r16 #2): one call commits the ids as a [[TextIndex]]
    * delete epoch (BM25 exclusion + exact df/nDocs/sumDl corrections)
    * AND an [[IvfIndex]] tombstone (dense-branch exclusion), so a
    * deleted doc stops ranking in lexical, dense, and fused results
    * together. Each side keeps its own commit (staged ids, marker
    * last) and its own physical-removal point ([[TextIndex
    * .compactSegments]] / re-save; [[IvfIndex.compactEpochs]]); a
    * crash between the two sides leaves one side committed — re-run
    * the SAME name to finish (both sides replay committed names as
    * no-ops), the idempotent-retry shape every lifecycle commit here
    * uses.
    */
  def delete(spark: org.apache.spark.sql.SparkSession, textPath: String,
      ivfPath: String, ids: DataFrame, idCol: String,
      name: String): Unit = {
    TextIndex.delete(spark, textPath, ids, idCol, name)
    IvfIndex.delete(spark, ivfPath, ids, idCol, name)
  }

  /** Unified MAINTENANCE mirrored through both persisted branches
    * (VERDICT r17 #2c — [[delete]] mirrored take-downs, but bounding
    * the maintenance debt still took two layout-specific calls): one
    * call folds the text side — [[TextIndex.compactSegments]] on a
    * segmented layout, an in-place generational re-save on a plain
    * one when committed deletes await physical removal — and
    * [[IvfIndex.compactEpochs]] on the vector side. Each side keeps
    * its own commit protocol (generation stage + pointer flip), so a
    * crash between the two leaves one side compacted and the other
    * untouched — re-run to finish, the same idempotent-retry shape as
    * [[delete]]; results are identical throughout (compaction is
    * physical-layout work, never answer work).
    *
    * Returns (textCompacted, vectorCompacted) — false = that side had
    * nothing to do.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, textPath: String,
      ivfPath: String, refit: Boolean = false): (Boolean, Boolean) = {
    val textDid =
      if (!TextIndex.isPlainLayout(spark, textPath))
        TextIndex.compactSegments(spark, textPath)
      else if (TextIndex.hasUnappliedDeletes(spark, textPath)) {
        // the plain layout's physical-removal path: load applies the
        // exact corrections, the generational save realizes them and
        // starts the applied epochs' grace cycle
        TextIndex.load(spark, textPath).save(textPath)
        true
      } else false
    val ivfDid = IvfIndex.compactEpochs(spark, ivfPath, refit)
    (textDid, ivfDid)
  }

  /** RRF-fused top-k for EXTERNAL queries — (id, text, vector) rows
    * that are NOT corpus members: the search-box serving shape, where
    * a fresh document arrives and needs its fused neighbors without
    * ever being ingested (r18; [[queryByIds]] is the corpus-member
    * variant with self-exclusion). No self rule applies — an external
    * query has no corpus row to exclude — so the top hit of a query
    * whose text/vector duplicate a stored doc is that doc at rank 1
    * on both branches.
    *
    * Query ids must be disjoint from the corpus id space:
    * [[IvfIndex.query]] carries the corpus-member self-exclusion
    * (`neighbor_id =!= query_id`) in its shared plan, so a colliding
    * id would silently drop exactly its own doc from the dense
    * branch. Offset external ids (the catalog entry adds 10^6).
    *
    * Both branch scans file-prune the saved layouts exactly as
    * [[queryByIds]]'s do — the query vocabulary and probed cells
    * become literals; the fusion tail is the shared
    * [[Extensions.rrfFuseRanked]]. Output:
    * (query_id, <text index idCol>, lex_rank, vec_rank, rrf_score,
    * rank ≤ k).
    */
  def query(textIndex: Bm25Queryable, ivfIndex: IvfIndex,
      queries: DataFrame, queryIdCol: String, queryTextCol: String,
      queryVecCol: String, kBranch: Int = 20, k: Int = 10,
      nprobe: Int = 4, rrfK: Int = 60): DataFrame = {
    require(kBranch >= 1 && k >= 1 && nprobe >= 1 && rrfK >= 1,
      "need kBranch >= 1, k >= 1, nprobe >= 1, rrfK >= 1")
    val idCol = textIndex.idCol
    val lex = textIndex.query(
        queries.select(col(queryIdCol).as("query_id"),
          col(queryTextCol).as("__qtext")),
        "__qtext", "query_id", kBranch)
      .select(col("query_id"), col(idCol), col("rank").as("lex_rank"))
    val dense = ivfIndex.query(
        queries.select(col(queryIdCol).as("query_id"),
          col(queryVecCol).as("__q")), kBranch, nprobe)
      .select(col("query_id"), col("neighbor_id").as(idCol),
        col("rank").as("vec_rank"))
    Extensions.rrfFuseRanked(lex, dense, idCol, k, rrfK)
  }

  /** RRF-fused top-k for query documents that are corpus members
    * (`queryIds` in the shared doc/vec id space): `queryDocs` supplies
    * the query TEXT (usually the documents table), the IVF index looks
    * up the query VECTORS by the same ids. Self is excluded from both
    * branches. Output matches [[Extensions.rrfFusion]]:
    * (query_id, <text index idCol>, lex_rank, vec_rank, rrf_score,
    * rank ≤ k).
    */
  def queryByIds(textIndex: Bm25Queryable, ivfIndex: IvfIndex,
      queryDocs: DataFrame, queryTextCol: String, queryIds: Seq[Long],
      kBranch: Int = 20, k: Int = 10, nprobe: Int = 4,
      rrfK: Int = 60): DataFrame = {
    require(queryIds.nonEmpty && kBranch >= 1 && k >= 1 && rrfK >= 1,
      "need queryIds nonempty, kBranch >= 1, k >= 1, rrfK >= 1")
    val idCol = textIndex.idCol
    val qDocs = queryDocs.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(queryTextCol).as("__qtext"))
    // kBranch+1 then de-self, exactly as the in-memory form (see
    // Extensions.deSelfRerank for why the cut is equivalent to direct
    // non-self top-kBranch)
    val lex = Extensions.deSelfRerank(
      textIndex.query(qDocs, "__qtext", "query_id", kBranch + 1),
      idCol, kBranch)
    // the IVF query path excludes self already
    val dense = ivfIndex.queryByIds(queryIds, kBranch, nprobe)
      .select(col("query_id"), col("neighbor_id").as(idCol),
        col("rank").as("vec_rank"))
    Extensions.rrfFuseRanked(lex, dense, idCol, k, rrfK)
  }
}
