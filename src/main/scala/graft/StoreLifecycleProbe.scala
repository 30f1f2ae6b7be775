package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MANY-SNAPSHOT SemanticStore lifecycle probe (VERDICT r15 #2).
  *
  * [[IngestProbe]] measures few large snapshots; compaction's
  * load-bearing claim is about MANY small ones: without it a store
  * that ingests a snapshot per micro-batch accretes one
  * pairs/meta/radii dir + one inner-IVF epoch dir per snapshot, and
  * every later ingest/snapshot pays per-epoch listing and small-file
  * unions forever. This probe ingests S hash-split snapshots in
  * sequence and times each full ingest lifecycle and a separate
  * `snapshot()`, optionally compacting every K snapshots — run it
  * twice (K = 0 vs K = 10) and compare the per-ingest trend against
  * epoch count.
  *
  * Emits ONE JSON line: per-step {i, epochs_live, t_ingest,
  * t_snapshot} plus each compaction's cost where it ran.
  *
  * Knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_DIR,
  * SPARK_GRAFT_INGEST_FACTOR (default 10 — shares IngestProbe's
  * permuted fixture), SPARK_GRAFT_LIFECYCLE_SNAPSHOTS (default 40),
  * SPARK_GRAFT_LIFECYCLE_COMPACT_EVERY (default 0 = never),
  * SPARK_GRAFT_LIFECYCLE_AUTO (default false — true hands the
  * cadence to ingest's compactEvery knob; compaction cost then lands
  * inside t_ingest on the triggering steps),
  * SPARK_GRAFT_INGEST_MINCOS (default 0.8 — the production operating
  * point: few pairs, so the per-epoch METADATA cost under test is not
  * drowned by pair-scan compute), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SHUFFLE, SPARK_GRAFT_LIFECYCLE_RETAIN (default 0 =
  * keep-all — the r18 F4 folded-manifest horizon, forwarded to
  * ingest/compact; per-step `folded_names`/`ivf_folded` counts make
  * the bound OBSERVABLE: keep-all grows with every fold while the
  * horizon caps both manifests — counts are volume-independent,
  * they depend only on (snapshots, compact_every, retain)).
  */
object StoreLifecycleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val f = sys.env.getOrElse("SPARK_GRAFT_INGEST_FACTOR", "10").toInt
    val s = sys.env.getOrElse("SPARK_GRAFT_LIFECYCLE_SNAPSHOTS", "40").toInt
    val every = sys.env
      .getOrElse("SPARK_GRAFT_LIFECYCLE_COMPACT_EVERY", "0").toInt
    // auto mode (VERDICT r16 #4): hand the cadence to the STORE via
    // ingest's compactEvery knob instead of the probe's manual call —
    // t_compact then shows up inside t_ingest on the triggering steps
    // (the price a self-policing micro-batch ingester actually pays),
    // and epochs_live must stay bounded by the knob alone
    val auto = sys.env
      .getOrElse("SPARK_GRAFT_LIFECYCLE_AUTO", "false").toBoolean
    val minCos = sys.env.getOrElse("SPARK_GRAFT_INGEST_MINCOS", "0.8").toDouble
    val retain = sys.env
      .getOrElse("SPARK_GRAFT_LIFECYCLE_RETAIN", "0").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val off = 10000000L

    // share IngestProbe's permuted fixture (same path, same layout)
    val fixPath = s"$work/f$f/embeddings_perm.parquet"
    if (!new java.io.File(fixPath, "_SUCCESS").exists()) {
      def permuted(arr: org.apache.spark.sql.Column, k: Int) =
        transform(
          array_sort(transform(arr,
            (x, i) => struct(xxhash64(i, lit(k)).as("h"), x.as("x")))),
          s => s.getField("x"))
      val src = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until f).map { k =>
        if (k == 0) src
        else src
          .withColumn("vec_id", col("vec_id") + lit(k * off))
          .withColumn("embedding", permuted(col("embedding"), k))
      }.reduce(_ unionAll _)
        .write.mode("overwrite").parquet(fixPath)
    }
    val emb = spark.read.parquet(fixPath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    emb.count()
    val nCells = 16 * f

    val store = s"$work/semstore_life_f${f}_s${s}_e$every" +
      (if (auto) "_auto" else "") +
      (if (retain > 0) s"_r$retain" else "")
    val (fs, storePath) = {
      val p = new org.apache.hadoop.fs.Path(store)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    if (fs.exists(storePath)) fs.delete(storePath, true) // fresh run

    def time[A](body: => A): (Double, A) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val sb = new StringBuilder
    for (b <- 0 until s) {
      val be = emb.filter(pmod(xxhash64(col("vec_id")), lit(s.toLong))
        === b.toLong)
      val docs = be.select(col("vec_id"),
        pmod(col("vec_id"), lit(1000L)).as("q"))
      val (tIngest, _) = time {
        graft.engine.SemanticStore.ingest(store, docs,
          be.select("vec_id", "embedding"), "vec_id", "q", "embedding",
          minCosine = minCos, nCells = nCells,
          epochName = f"snap-$b%04d",
          compactEvery = if (auto) every else 0,
          retainFolded = retain).count()
      }
      val (tSnap, _) = time {
        graft.engine.SemanticStore.snapshot(spark, store, "vec_id", "q")
          .count()
      }
      val epochsLive = graft.engine.SemanticStore
        .committedEpochs(spark, store).size
      val tCompact =
        if (!auto && every > 0 && (b + 1) % every == 0) {
          val (tc, _) = time {
            graft.engine.SemanticStore.compact(spark, store,
              retainFolded = retain)
          }
          tc
        } else -1.0
      // folded-manifest sizes (r18 F4): the store's live compacted
      // marker content + the inner index's _folded — the two
      // replay-refusal lists whose unbounded growth the horizon caps
      val foldedNames = Option(new java.io.File(s"$store/_epochs")
          .listFiles()).getOrElse(Array.empty)
        .filterNot(_.getName.startsWith("."))
        .map(mf => scala.io.Source.fromFile(mf).getLines()
          .count(_.nonEmpty))
        .sum
      val ivfFolded = graft.engine.Generations
        .currentName(s"$store/ivf")
        .map(g => new java.io.File(s"$store/ivf/$g/_folded"))
        .filter(_.exists())
        .map(mf => scala.io.Source.fromFile(mf).getLines()
          .count(_.nonEmpty))
        .getOrElse(0)
      if (b > 0) sb.append(",")
      sb.append(f"""{"i":$b,"epochs_live":$epochsLive,""" +
        f""""folded_names":$foldedNames,"ivf_folded":$ivfFolded,""" +
        f""""t_ingest":${math.rint(tIngest * 1000) / 1000}%s,""" +
        f""""t_snapshot":${math.rint(tSnap * 1000) / 1000}%s""" +
        (if (tCompact >= 0)
          f""","t_compact":${math.rint(tCompact * 1000) / 1000}%s"""
        else "") + "}")
      System.err.println(f"[life-probe] every=$every b=$b " +
        f"epochs=$epochsLive folded=$foldedNames/$ivfFolded " +
        f"t_ingest=$tIngest%.2fs t_snap=$tSnap%.2fs" +
        (if (tCompact >= 0) f" t_compact=$tCompact%.1fs" else ""))
    }
    println(s"""{"factor":$f,"snapshots":$s,"compact_every":$every,""" +
      s""""auto":$auto,"retain_folded":$retain,"n_cells":$nCells,""" +
      s""""min_cosine":$minCos,""" +
      s""""steps":[${sb.toString}],"base":"$base"}""")
    spark.stop()
  }
}
