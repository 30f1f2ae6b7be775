package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemanticStore incremental-ingest scaling probe (VERDICT r14 #1).
  *
  * BASELINE.md §×100 adjudicates the batch semantic-dedup tails by
  * prescribing the persisted-store path — ingest each snapshot against
  * the accumulated store instead of refit-and-rescan per run — as the
  * at-scale posture. This probe MEASURES that path rather than arguing
  * it: at replication factor f (the ScaleProbe fixture — replica k's
  * vectors are element-permuted, so cross-replica cosines scramble
  * toward the uniform-direction adversarial case), the embeddings_perm
  * corpus splits into equal snapshots by replica range (disjoint ids,
  * the ingest contract), and each ingests in sequence. Per step it
  * times
  *
  *   - `t_ingest`: the full [[graft.engine.SemanticStore.ingest]]
  *     call + count of the returned state — frozen-quantizer assign,
  *     per-cell radii, the blocked batch×(stored ∪ batch) pair scan,
  *     staged writes, the IVF epoch append, the commit marker, and the
  *     accumulated-state CC (which runs eagerly inside);
  *   - `t_snapshot`: a SEPARATE
  *     [[graft.engine.SemanticStore.snapshot]].count — CC + keep-best
  *     over the accumulated pair store alone, so (t_ingest −
  *     t_snapshot) ≈ the incremental pair-scan/write cost;
  *
  * and reads back store health: accumulated pair/meta rows, the
  * effective per-cell radii (mean/max), and the surviving cell-pair
  * fraction under the store's own triangle-inequality arithmetic —
  * the frozen-quantizer radius-inflation behavior at the adversarial
  * fixture, measured per step instead of asserted. After the growth
  * sequence: `snapshot()` timed once more, [[SemanticStore.compact]]
  * timed, `snapshot()` on the compacted store, and ONE reserved final
  * batch ingested post-compaction (its t_ingest vs the growth trend is
  * the compaction-payoff check).
  *
  * The claims under test (BASELINE.md §ingest table):
  *   - per-ingest cost tracks BATCH size (compare factors: batches are
  *     10× bigger at f100 than f10 at the same relative store state);
  *   - per-ingest cost is sub-linear in STORE size at the doctrine
  *     nCells = 16·f (the pruned stored-side read is ~surviving-cells
  *     only), with the adversarial radius inflation bounding how much
  *     pruning survives;
  *   - `snapshot()` tracks the accumulated PAIR store, not the corpus;
  *   - compaction is a one-time cost that does not change results
  *     (equality is spec-law; here only the cost is at stake).
  *
  * Emits ONE JSON line. Knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_DIR,
  * SPARK_GRAFT_INGEST_FACTOR (default 10), SPARK_GRAFT_INGEST_BATCHES
  * (default 5 = 4 growth + 1 reserved; must divide the factor),
  * SPARK_GRAFT_INGEST_MINCOS (default 0.35 — the catalog stress
  * threshold; 0.8 is the production operating point),
  * SPARK_GRAFT_INGEST_SECOND (default 0 — drift batches ingested
  * AFTER the first compaction, followed by a SECOND refit compaction:
  * the VERDICT r17 #3 convergence trajectory),
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE.
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val f = sys.env.getOrElse("SPARK_GRAFT_INGEST_FACTOR", "10").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_INGEST_BATCHES", "5").toInt
    val minCos = sys.env.getOrElse("SPARK_GRAFT_INGEST_MINCOS", "0.35").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // fixture shape: "permuted" (the ScaleProbe adversarial fixture —
    // uniform directions, worst case for angular blocking) or
    // "clustered" (r16 — replica k's rows gather around 16 fresh
    // per-replica cluster centers, 16·f total to match the doctrine
    // cell budget; see clustersPerReplica below: the DRIFT case a
    // frozen quantizer loses to and the refit compaction exists for)
    val fixture = sys.env.getOrElse("SPARK_GRAFT_INGEST_FIXTURE",
      "permuted")
    // refit the coarse quantizer at the mid-probe compaction?
    val refit = sys.env.getOrElse("SPARK_GRAFT_INGEST_REFIT", "true")
      .toBoolean
    // the store's BIRTH cell budget (0 = the doctrine 16·f). A small
    // birth budget + a clustered fixture is the VERDICT r16 #1 case:
    // the corpus's cluster structure outgrows the cells the store was
    // born with, and only a budget-GROWING refit can restore pruning.
    val bornCells = sys.env.getOrElse("SPARK_GRAFT_INGEST_BORN_CELLS",
      "0").toInt
    // rowsPerCell for the refit's budget rule (0 = frozen budget, the
    // pre-r17 behavior; default = the library default 128, which at
    // this fixture's 125-row clusters tracks one cell per cluster)
    val rowsPerCell = sys.env.getOrElse(
      "SPARK_GRAFT_INGEST_ROWS_PER_CELL",
      graft.engine.IvfIndex.defaultRowsPerCell.toString).toLong
    require(nBatches >= 3 && f % nBatches == 0,
      s"factor $f must split into nBatches=$nBatches equal replica ranges")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val off = 10000000L

    // the ScaleProbe embeddings_perm fixture, same path and layout so
    // a probe battery shares replica writes across mains; the
    // clustered fixture lands beside it under its own name
    val fixPath =
      if (fixture == "permuted") s"$work/f$f/embeddings_perm.parquet"
      else s"$work/f$f/embeddings_$fixture.parquet"
    if (!new java.io.File(fixPath, "_SUCCESS").exists()) {
      def permuted(arr: org.apache.spark.sql.Column, k: Int) =
        transform(
          array_sort(transform(arr,
            (x, i) => struct(xxhash64(i, lit(k)).as("h"), x.as("x")))),
          s => s.getField("x"))
      val src = spark.read.parquet(s"$base/embeddings.parquet")
      val dim = src.select(size(col("embedding"))).head().getInt(0)
      // 16 clusters per replica keeps the FULL corpus's cluster count
      // (16·f) equal to the doctrine cell budget (nCells = 16·f): a
      // quantizer refit can then isolate one cluster per cell. More
      // clusters than cells would cap what ANY refit can certify —
      // the first probe cut measured exactly that (400 clusters over
      // 160 cells → post-refit survivor fraction still 0.96).
      val clustersPerReplica = 16
      // clustered: row → unit cluster center (fresh per replica) +
      // a 0.35-scaled unit residual of its original embedding. Member
      // cosines within a cluster sit ~0.89 (pairs at the 0.8 operating
      // point), cross-cluster near 0 (prunable once cells track the
      // clusters) — and each GROWTH replica's centers are directions
      // the batch-0 quantizer NEVER saw: the drift case. The RESERVED
      // final batch's replicas reuse the FIRST batch's directions
      // (in-distribution near-dups of stored data — the realistic
      // "refit, then keep ingesting similar data" case): its pruning
      // payoff is what the refit exists to buy, and its cross-replica
      // near-dup pairs are found identically by the refit and
      // non-refit runs (the blocking-independence law, measured).
      val lastBatchStart = f - f / nBatches
      def centers(k: Int): Seq[Seq[Float]] = {
        val kEff = if (k >= lastBatchStart) k - lastBatchStart else k
        (0 until clustersPerReplica).map { j =>
          val r = new scala.util.Random(7919L * (kEff + 1) + j)
          val v = Array.fill(dim)(r.nextGaussian())
          val n = math.sqrt(v.map(x => x * x).sum)
          v.map(x => (x / n).toFloat).toSeq
        }
      }
      def clustered(k: Int)(df: org.apache.spark.sql.DataFrame) = {
        val centLit = typedLit(centers(k))
        val n0 = sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x),
          lit(0.0), (acc, x) => acc + x))
        val n = when(n0 > 0, n0).otherwise(lit(1.0))
        val cidx = pmod(col("vec_id"), lit(clustersPerReplica.toLong))
          .cast("int") + 1
        df.withColumn("embedding",
          zip_with(col("embedding"), element_at(centLit, cidx),
            (x, c) => (x.cast("double") / n * 0.35 + c).cast("float")))
      }
      (0 until f).map { k =>
        val shifted =
          if (k == 0) src
          else src.withColumn("vec_id", col("vec_id") + lit(k * off))
        if (fixture == "permuted") {
          if (k == 0) shifted
          else shifted.withColumn("embedding",
            permuted(col("embedding"), k))
        } else clustered(k)(shifted)
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(fixPath)
    }
    val emb = spark.read.parquet(fixPath)
    val nCells = if (bornCells > 0) bornCells else 16 * f
    val repPerBatch = f / nBatches

    val store = s"$work/semstore_f${f}_c${(minCos * 100).toInt}" +
      s"_${fixture}_${if (refit) "refit" else "norefit"}" +
      (if (bornCells > 0) s"_b$bornCells" else "") +
      (if (rowsPerCell != graft.engine.IvfIndex.defaultRowsPerCell)
        s"_rpc$rowsPerCell" else "")
    val (fs, storePath) = {
      val p = new org.apache.hadoop.fs.Path(store)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    if (fs.exists(storePath)) fs.delete(storePath, true) // fresh run

    def batchAt(b: Int) = {
      val lo = b.toLong * repPerBatch * off
      val hi = (b.toLong + 1) * repPerBatch * off
      emb.filter(col("vec_id") >= lo && col("vec_id") < hi)
    }
    def docsOf(e: org.apache.spark.sql.DataFrame) =
      e.select(col("vec_id"), pmod(col("vec_id"), lit(1000L)).as("q"))

    def time[A](body: => A): (Double, A) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    /** Store health read back from COMMITTED state: pair/meta rows,
      * effective radii stats, and the surviving ordered-cell-pair
      * fraction under the store's own pruning arithmetic (unit-sphere
      * triangle inequality, same slack). */
    def health(): (Long, Long, Double, Double, Double) = {
      val committed = graft.engine.SemanticStore
        .committedEpochs(spark, store)
      val pairRows = spark.read
        .parquet(committed.map(e => s"$store/pairs/$e"): _*).count()
      val metaRows = spark.read
        .parquet(committed.map(e => s"$store/meta/$e"): _*).count()
      val radii = spark.read
        .parquet(committed.map(e => s"$store/radii/$e"): _*)
        .groupBy("__cell").agg(max("__r").as("__r"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      // resolve the LIVE quantizer (after a refit compaction it lives
      // inside the published IVF generation, not at ivf/quantizer)
      val cents = graft.engine.IvfIndex
        .readQuantizer(spark, s"$store/ivf").map(_._2.toSeq)
      val uc = cents.map { v =>
        val d = v.map(_.toDouble).toArray
        val n = math.sqrt(d.map(x => x * x).sum)
        if (n == 0) d else d.map(_ / n)
      }
      val thetaMax = math.acos(math.min(1.0, math.max(-1.0, minCos)))
      val slack = 1e-4
      val ids = radii.keySet.toSeq.sorted
      var surv = 0L
      for (i <- ids; j <- ids) {
        var dot = 0.0
        var x = 0
        while (x < uc(i).length) { dot += uc(i)(x) * uc(j)(x); x += 1 }
        val ang = math.acos(math.min(1.0, math.max(-1.0, dot)))
        if (ang - radii(i) - radii(j) <= thetaMax + slack) surv += 1
      }
      val frac = surv.toDouble / (ids.size.toLong * ids.size)
      (pairRows, metaRows,
        radii.values.sum / math.max(1, radii.size),
        radii.values.foldLeft(0.0)(math.max), frac)
    }

    // second-compaction phase (VERDICT r17 #3 — CONVERGENCE): after
    // the first grown refit, `second` MORE drift batches ingest and a
    // SECOND refit compaction runs. The r17 probe showed one grown
    // refit lifts a born-small store to survivor 0.48 vs the 0.21 of
    // a born-at-doctrine store and ARGUED the next compaction closes
    // the rest; this phase measures that trajectory instead. 0 = the
    // r17 protocol (one compaction, then the reserved batch).
    val second = sys.env.getOrElse("SPARK_GRAFT_INGEST_SECOND", "0").toInt
    // >= 2 growth batches: SemanticStore.compact no-ops on a single
    // committed epoch with no deletes, and a silent no-op here would
    // record a "post-compact" trajectory for a fold that never ran
    // (r18 review finding F2)
    require(second >= 0 && second <= nBatches - 3,
      s"second=$second must leave >= 2 growth and 1 reserved batch")

    val sb = new StringBuilder
    var storedRows = 0L
    def ingestStep(b: Int, buf: StringBuilder, first: Boolean): Unit = {
      val be = batchAt(b)
      val rows = be.count()
      val (tIngest, _) = time {
        graft.engine.SemanticStore.ingest(store, docsOf(be),
          be.select("vec_id", "embedding"), "vec_id", "q", "embedding",
          minCosine = minCos, nCells = nCells,
          epochName = f"snap-$b%03d").count()
      }
      val (tSnap, _) = time {
        graft.engine.SemanticStore.snapshot(spark, store, "vec_id", "q")
          .count()
      }
      val (pairRows, metaRows, meanR, maxR, survFrac) = health()
      if (!first) buf.append(",")
      buf.append(f"""{"i":$b,"batch_rows":$rows,""" +
        f""""stored_rows_before":$storedRows,""" +
        f""""t_ingest":${math.rint(tIngest * 1000) / 1000}%s,""" +
        f""""t_snapshot":${math.rint(tSnap * 1000) / 1000}%s,""" +
        f""""pairs_total":$pairRows,"meta_total":$metaRows,""" +
        f""""mean_radius":${math.rint(meanR * 1000) / 1000}%s,""" +
        f""""max_radius":${math.rint(maxR * 1000) / 1000}%s,""" +
        f""""survivor_frac":${math.rint(survFrac * 10000) / 10000}%s}""")
      storedRows += rows
      System.err.println(f"[ingest-probe] f=$f b=$b rows=$rows " +
        f"t_ingest=$tIngest%.1fs t_snapshot=$tSnap%.1fs pairs=$pairRows " +
        f"survivors=$survFrac%.3f")
    }
    val growth = nBatches - 1 - second
    for (b <- 0 until growth) ingestStep(b, sb, first = b == 0)
    val cellsBefore = graft.engine.IvfIndex
      .readQuantizer(spark, s"$store/ivf").size
    val (tCompact, _) = time {
      graft.engine.SemanticStore.compact(spark, store, refit = refit,
        rowsPerCell = rowsPerCell)
    }
    val cellsAfter = graft.engine.IvfIndex
      .readQuantizer(spark, s"$store/ivf").size
    // post-compaction health: under a refit on the clustered fixture
    // this is where the survivor fraction must FALL — cells re-fit to
    // the accumulated corpus, radii recomputed per new cell
    val (pairsPC, _, meanRPC, maxRPC, survPC) = health()
    val (tSnapCompacted, _) = time {
      graft.engine.SemanticStore.snapshot(spark, store, "vec_id", "q")
        .count()
    }
    // phase 2: more DRIFT batches (fresh cluster directions — only
    // the final reserved batch folds back to batch-0's) against the
    // once-compacted store, then the second refit compaction
    val sb2 = new StringBuilder
    var cells2 = cellsAfter
    var tCompact2 = 0.0
    var pairs2 = 0L
    var meanR2 = 0.0
    var maxR2 = 0.0
    var surv2 = 1.0
    if (second > 0) {
      for (b <- growth until growth + second)
        ingestStep(b, sb2, first = b == growth)
      val (t2, _) = time {
        graft.engine.SemanticStore.compact(spark, store, refit = refit,
          rowsPerCell = rowsPerCell)
      }
      tCompact2 = t2
      cells2 = graft.engine.IvfIndex
        .readQuantizer(spark, s"$store/ivf").size
      val h2 = health()
      pairs2 = h2._1; meanR2 = h2._3; maxR2 = h2._4; surv2 = h2._5
      System.err.println(f"[ingest-probe] compact2=$tCompact2%.1fs " +
        f"cells=$cellsAfter->$cells2 pairs=$pairs2 surv2=$surv2%.4f")
    }
    val bLast = growth + second
    val beLast = batchAt(bLast)
    val lastRows = beLast.count()
    val (tIngestPost, _) = time {
      graft.engine.SemanticStore.ingest(store, docsOf(beLast),
        beLast.select("vec_id", "embedding"), "vec_id", "q", "embedding",
        minCosine = minCos, nCells = nCells,
        epochName = f"snap-$bLast%03d").count()
    }
    val secondJson = if (second == 0) "" else
      s""""second_growth":[${sb2.toString}],""" +
      s""""t_compact2":${math.rint(tCompact2 * 1000) / 1000},""" +
      s""""cells_after_second_compact":$cells2,""" +
      s""""second_compact_health":{"pairs_total":$pairs2,""" +
      s""""mean_radius":${math.rint(meanR2 * 1000) / 1000},""" +
      s""""max_radius":${math.rint(maxR2 * 1000) / 1000},""" +
      s""""survivor_frac":${math.rint(surv2 * 10000) / 10000}},"""
    val (pairsPost, _, _, _, survPost) = health()
    System.err.println(f"[ingest-probe] compact=$tCompact%.1fs " +
      f"snapshot_after=$tSnapCompacted%.1fs post_ingest=$tIngestPost%.1fs " +
      f"surv_post_compact=$survPC%.4f surv_final=$survPost%.4f")
    println(s"""{"factor":$f,"n_cells":$nCells,"min_cosine":$minCos,""" +
      s""""fixture":"$fixture","refit":$refit,""" +
      s""""rows_per_cell":$rowsPerCell,""" +
      s""""cells_before_compact":$cellsBefore,""" +
      s""""cells_after_compact":$cellsAfter,""" +
      s""""batches":$nBatches,"second":$second,""" +
      s""""growth":[${sb.toString}],""" +
      s""""t_compact":${math.rint(tCompact * 1000) / 1000},""" +
      s""""post_compact_health":{"pairs_total":$pairsPC,""" +
      s""""mean_radius":${math.rint(meanRPC * 1000) / 1000},""" +
      s""""max_radius":${math.rint(maxRPC * 1000) / 1000},""" +
      s""""survivor_frac":${math.rint(survPC * 10000) / 10000}},""" +
      s""""t_snapshot_compacted":${math.rint(tSnapCompacted * 1000) / 1000},""" +
      secondJson +
      s""""post_compact_ingest":{"batch_rows":$lastRows,""" +
      s""""stored_rows_before":$storedRows,""" +
      s""""t_ingest":${math.rint(tIngestPost * 1000) / 1000},""" +
      s""""pairs_total":$pairsPost,""" +
      s""""survivor_frac":${math.rint(survPost * 10000) / 10000}},""" +
      s""""base":"$base"}""")
    spark.stop()
  }
}
