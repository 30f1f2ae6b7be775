package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the most expensive catalog shapes (BASELINE.md
  * §scaling): replicates the sf0.1 inputs by factors (disjoint id-offset
  * copies — the ideal-linear fixture: per-group cardinality and graph
  * density stay constant while volume grows), times each shape cold at
  * each factor, and fits the log-log slope. An exponent near 1 means the
  * plan's work actually scales with input size; super-linear flags an
  * accidental quadratic (the thing the O(sf) claims in the scaladocs
  * assert but sf0.1 alone cannot test).
  *
  * Fixture notes, because they decide what an exponent MEANS here:
  *  - lineitem replicas offset BOTH l_orderkey and l_partkey → disjoint
  *    co-occurrence graphs. Density constant, volume ×f: clean probe.
  *  - documents replicas are word-PERMUTED copies: exact-copy replicas
  *    would make every doc collide with its f−1 twins and the near-dup
  *    pair count quadratic IN THE FIXTURE. The permutation is
  *    position-keyed (sort by xxhash64(position, replica)) — the SAME
  *    reorder for every doc in a replica, so within-replica
  *    exact-duplicate structure survives intact while cross-replica
  *    shingle/span overlap is destroyed; and it is fully deterministic,
  *    so a regenerated fixture reproduces the recorded exponents
  *    (the earlier `shuffle()` draft was seedless — nondeterministic).
  *  - embeddings replicate as-is (identical vectors re-labelled): IVF
  *    cells grow ×f at fixed cell count — the linear regime the
  *    operator's own scaling story (grow nCells with corpus) sits on top
  *    of. Bounded top-k searches (ann_ivf, pq_topk) tolerate identical
  *    twins; threshold searches do NOT, so cosine_neardup_blocked reads
  *    the `embeddings_perm` variant instead: replica k>0 applies one
  *    element permutation (sort by xxhash64(elem_index, replica)) to
  *    EVERY vector — dot products within a replica are permutation-
  *    invariant (pair structure identical to the base corpus) while
  *    cross-replica cosines are scrambled, so the pair count stays
  *    linear in f and the probe measures the engine, not the fixture.
  *
  * Emits one JSON line:
  * {"queries":{name:{"t":{f:sec},"exponent":x}},"factors":[...]}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val factors = sys.env.getOrElse("SPARK_GRAFT_FACTORS", "1,2,5,10")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // partitions ∝ data is the production norm (AQE derives it from
    // shuffle stats); pinning 32 across a 10× volume sweep measures the
    // spill knee, not the algorithm — the knob lets the probe separate
    // the two (see BASELINE.md §scaling)
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val off = 10000000L

    // `table` names the fixture under $work; `srcTable` the base-dir
    // parquet it derives from (they differ for variant fixtures like
    // embeddings_perm, which derives from embeddings)
    def replicated(table: String, f: Int,
        mutate: (DataFrame, Int) => DataFrame,
        srcTable: String = ""): String = {
      val path = s"$work/f$f/$table.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val srcName = if (srcTable.isEmpty) table else srcTable
        val src = spark.read.parquet(s"$base/$srcName.parquet")
        (0 until f).map(k => mutate(src, k)).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(path)
      }
      path
    }
    def lineitemAt(f: Int): DataFrame = spark.read.parquet(
      replicated("lineitem", f, (df, k) => df
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * off))
        .withColumn("l_partkey", col("l_partkey") + lit(k * off))))
    // deterministic position-keyed permutation: sort elements by
    // xxhash64(index, replica) — same reorder for every row of a replica
    def permuted(arr: org.apache.spark.sql.Column, k: Int) =
      transform(
        array_sort(transform(arr,
          (x, i) => struct(xxhash64(i, lit(k)).as("h"), x.as("x")))),
        s => s.getField("x"))
    def documentsAt(f: Int): DataFrame = spark.read.parquet(
      replicated("documents", f, (df, k) =>
        if (k == 0) df
        else df
          .withColumn("doc_id", col("doc_id") + lit(k * off))
          .withColumn("text",
            array_join(permuted(split(col("text"), " "), k), " "))))
    def embeddingsAt(f: Int): DataFrame = spark.read.parquet(
      replicated("embeddings", f, (df, k) => df
        .withColumn("vec_id", col("vec_id") + lit(k * off))))
    def embeddingsPermAt(f: Int): DataFrame = spark.read.parquet(
      replicated("embeddings_perm", f, (df, k) =>
        if (k == 0) df
        else df
          .withColumn("vec_id", col("vec_id") + lit(k * off))
          .withColumn("embedding", permuted(col("embedding"), k)),
        srcTable = "embeddings"))
    def ordersAt(f: Int): DataFrame = spark.read.parquet(
      replicated("orders", f, (df, k) => df
        .withColumn("o_orderkey", col("o_orderkey") + lit(k * off))))
    // part offsets p_partkey in lockstep with lineitem's l_partkey, so
    // the part⋈lineitem join matches within every replica and the
    // filtered-part row count grows ×f with the facts
    def partAt(f: Int): DataFrame = spark.read.parquet(
      replicated("part", f, (df, k) => df
        .withColumn("p_partkey", col("p_partkey") + lit(k * off))))
    // fixed dimensions, copied once per factor dir: dims grow far
    // slower than facts in production, so the relational probe
    // measures fact-volume scaling against broadcast-sized dims
    // (per-dim-key fact cardinality grows ×f — the adversarial
    // direction for the join/agg state)
    def staticAt(f: Int, table: String): Unit = {
      val path = s"$work/f$f/$table.parquet"
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        spark.read.parquet(s"$base/$table.parquet")
          .write.mode("overwrite").parquet(path)
        ()
      }
    }
    // persisted IVF+PQ lifecycle fixture (VERDICT r10 #6): index built
    // from replica 0 ONLY (frozen coarse quantizer + PQ codebooks),
    // then replicas 1..f-1 appended in waves through
    // appendToSaved/appendPqToSaved — the production grow path. The
    // probe then times the PRUNED QUERY alone over the f×-grown
    // layout (builds happen here, in fixture prep, never in a timed
    // run): candidates per probed cell grow ×f at fixed nCells, so
    // the query exponent should sit at/below 1 with file-pruned
    // m-int code reads — latency stability across appends.
    def ivfIndexAt(f: Int): String = {
      val path = s"$work/ivf_f$f"
      if (!new java.io.File(s"$path/cells/_SUCCESS").exists()) {
        val emb = embeddingsPermAt(f)
        graft.engine.IvfIndex.build(
          emb.filter(col("vec_id") < off), "embedding", "vec_id",
          nCells = 16).save(path)
        graft.engine.IvfIndex.addPqCodes(spark, path, "vec_id",
          "embedding")
        for (k <- 1 until f) {
          val wave = emb.filter(col("vec_id") >= k * off &&
            col("vec_id") < (k + 1) * off)
          graft.engine.IvfIndex.appendToSaved(spark, path, wave,
            "embedding", "vec_id")
          graft.engine.IvfIndex.appendPqToSaved(spark, path, wave,
            "embedding", "vec_id")
        }
      }
      path
    }

    // persisted hybrid layout (r12): TextIndex + IvfIndex built and
    // saved in fixture prep so hybrid_query times ONLY the pruned
    // query path (the ivfIndexAt pattern)
    def hybridIndexAt(f: Int): String = {
      val path = s"$work/hybrid_f$f"
      if (!new java.io.File(s"$path/ivf/cells/_SUCCESS").exists()) {
        graft.engine.TextIndex.build(documentsAt(f), "text", "doc_id",
          nBuckets = 16).save(s"$path/text")
        graft.engine.IvfIndex.build(embeddingsAt(f), "embedding",
          "vec_id", nCells = 8).save(s"$path/ivf")
      }
      path
    }

    // the catalog's exact edge build (AnalyticsQueries triangle_count /
    // edge_jaccard): in-array ordered pairs per order
    def orderEdges(li: DataFrame, minCo: Long): DataFrame = {
      val pairs = li
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
        .select(explode(flatten(transform(col("__items"), (a, i) =>
          transform(
            slice(col("__items"), i + lit(2), size(col("__items"))),
            b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
        .select(col("__p.part_a"), col("__p.part_b"))
      if (minCo <= 1) pairs
      else pairs.groupBy("part_a", "part_b").agg(count(lit(1)).as("__co"))
        .filter(col("__co") >= minCo)
        .select("part_a", "part_b")
    }

    val shapes: Seq[(String, Int => DataFrame)] = Seq(
      "basket_affinity" -> (f => graft.engine.Analytics.basketAffinity(
        lineitemAt(f), "l_orderkey", "l_partkey")),
      "triangle_count" -> (f => graft.engine.Analytics.triangleCount(
        orderEdges(lineitemAt(f), minCo = 2), "part_a", "part_b",
        outCol = "part_id")),
      "edge_jaccard" -> (f => graft.engine.Analytics.edgeJaccard(
          orderEdges(lineitemAt(f), minCo = 1), "part_a", "part_b")
        .orderBy(desc("jaccard"), col("part_a"), col("part_b")).limit(100)),
      "dedup_clusters" -> (f => graft.engine.Extensions.dedupClusters(
        documentsAt(f), "text", "doc_id", maxHamming = 3)),
      "ann_ivf" -> (f => graft.engine.Extensions.annIvf(
        embeddingsAt(f), "embedding", "vec_id",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)),
      "span_dedup" -> (f => graft.engine.Extensions.spanDedup(
        documentsAt(f), "text", "doc_id", n = 20, minDf = 2L)),
      "cosine_neardup_blocked" -> (f =>
        graft.engine.Extensions.cosineNearDupsBlocked(
          embeddingsPermAt(f), "embedding", "vec_id",
          minCosine = 0.35, nCells = 16)),
      "pq_topk" -> (f => graft.engine.Extensions.pqTopK(
        embeddingsAt(f), "embedding", "vec_id",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)),
      // the catalog's exact shape: symmetrized co-purchase edges, seeds
      // = parts ≡ 0 (mod 97) (offset replicas keep seed density ~1/97),
      // 3 rounds of frontier expansion over disjoint replica graphs
      // replicas' pair structure is internal to each replica (vectors
      // permuted per replica) → linear pair growth; quality = id mod
      // 1000 gives a deterministic keep-best discriminator
      "semantic_dedup" -> (f => {
        val emb = embeddingsPermAt(f)
        graft.engine.Extensions.semanticDedup(
          emb.select(col("vec_id"),
            pmod(col("vec_id"), lit(1000L)).as("q")),
          emb.select("vec_id", "embedding"),
          "vec_id", "q", "embedding", minCosine = 0.35, nCells = 16)
      }),
      // the DOCTRINE config for the ×100 point (VERDICT r13 #3):
      // nCells grows with the corpus so cells stay executor-sized and
      // the blocked pair scan stays ~Σ surviving |ci|·|cj| ∝ volume —
      // the fixed-16-cell shape above measures the degenerate regime
      // (100 replicas crammed into 16 cells approaches block-local
      // all-pairs work, exactly what the scaling story says NOT to do)
      "semantic_dedup_scaled" -> (f => {
        val emb = embeddingsPermAt(f)
        graft.engine.Extensions.semanticDedup(
          emb.select(col("vec_id"),
            pmod(col("vec_id"), lit(1000L)).as("q")),
          emb.select("vec_id", "embedding"),
          "vec_id", "q", "embedding", minCosine = 0.35, nCells = 16 * f)
      }),
      // the PRODUCTION-threshold control (×100 battery): the catalog
      // pins minCosine=0.35 (69° prune angle — a stress case where
      // 64-dim cell pruning is inherently weak); real near-dup runs at
      // ≥0.8 (37°), where distant cell pairs prune in bulk — this row
      // is the operating point the 100 TB posture actually claims
      "semantic_dedup_tight" -> (f => {
        val emb = embeddingsPermAt(f)
        graft.engine.Extensions.semanticDedup(
          emb.select(col("vec_id"),
            pmod(col("vec_id"), lit(1000L)).as("q")),
          emb.select("vec_id", "embedding"),
          "vec_id", "q", "embedding", minCosine = 0.8, nCells = 16 * f)
      }),
      // quality_score_lr (×100 battery): the tokenize+bucket count and
      // the integer-dot scoring pass track volume; the LBFGS fit is
      // hash-sample-capped (65536 docs at ANY corpus size, ceiling
      // stride) so the fit cost amortizes toward flat. The ENGINE
      // function directly, not the catalog entry: the entry appends
      // .orderBy(doc_id) over the corpus-sized output (the driver's
      // ordered oracle compare) — a global range-sort the operator
      // under test doesn't have (review finding)
      "quality_score_lr" -> (f => graft.engine.Extensions.qualityScoreLr(
        spark.read.parquet(s"$work/f$f/documents.parquet"),
        "text", "doc_id")),
      "token_pmi" -> (f => graft.engine.Extensions.tokenPmi(
        documentsAt(f), "text", "doc_id",
        window = 2, minCount = 5, topN = 100)),
      // orders volume ×f against a FIXED calendar: probes the claim
      // that corpus-sized work is the daily rollup while the fold's
      // state stays calendar-bounded
      "ewma_smooth" -> (f => graft.engine.Analytics.ewmaSmooth(
        ordersAt(f).join(
          spark.read.parquet(s"$base/customer.parquet"),
          col("o_custkey") === col("c_custkey")),
        "c_nationkey", "o_orderdate", "o_totalprice")),
      // train side ×f, eval side fixed (replica-0 ids < 100): the
      // broadcast-filter probe cost should track the train stream
      "bloom_decontaminate" -> (f => {
        val docs = documentsAt(f)
        graft.engine.Extensions.bloomDecontaminate(
          docs.filter(col("doc_id") >= 100),
          docs.filter(col("doc_id") < 100), "text", "doc_id")
      }),
      // r10 probes (VERDICT r9 #6) — the exact catalog shapes, read
      // from the replicated fixture dir (documents/orders/lineitem land
      // under $work/f$f with their catalog names, so SparkEntry's own
      // query bodies run unmodified against the scaled inputs):
      // BPE is driver-looped k rounds — the probe proves the per-round
      // aggregate stays flat as volume grows (merge table is k rows)
      "bpe_merges" -> (f =>
        graft.SparkEntry.queries("bpe_merges")(spark, s"$work/f$f")),
      "bpe_stats" -> (f =>
        graft.SparkEntry.queries("bpe_stats")(spark, s"$work/f$f")),
      // two-level prefix-sum positions: must track volume linearly
      "length_batching" -> (f =>
        graft.SparkEntry.queries("length_batching")(spark, s"$work/f$f")),
      // per-customer order history grows ×f (orders replicate onto the
      // same custkeys): probes the interval build + union-sort lookup
      // under growing per-key history
      "pit_join" -> (f =>
        graft.SparkEntry.queries("pit_join")(spark, s"$work/f$f")),
      // r10 de-windowed plan (histogram-derived ranks): must stay
      // linear with NO single-partition window at any factor
      "zipf_slope" -> (f =>
        graft.SparkEntry.queries("zipf_slope")(spark, s"$work/f$f")),
      // two-level running sums; sources stay fixed while volume grows
      "stream_admission" -> (f =>
        graft.SparkEntry.queries("stream_admission")(spark, s"$work/f$f")),
      // r10 search additions. knn_join probes the DOCTRINE, not a fixed
      // config: nCells grows with the corpus (cells stay executor-sized)
      // so the pruned pair scan is ~nprobe·|corpus|·cellSize — linear.
      // Permuted replicas keep cross-replica cosines scrambled (the
      // cosine_neardup_blocked fixture argument).
      "knn_join" -> (f => graft.engine.Extensions.knnJoin(
        embeddingsPermAt(f), "embedding", "vec_id",
        k = 5, nCells = 16 * f, nprobe = 4)),
      // fixed cell count, fixed query set: candidate scan ∝ f
      "ivfpq_topk" -> (f => graft.engine.Extensions.ivfPqTopK(
        embeddingsAt(f), "embedding", "vec_id",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)),
      // the documented WORST case: anti-correlated x/y (every row
      // survives) — output-sized work, but the bucketed phase 2 must
      // stay linear with no single-task knee
      "skyline_bucketed_anti" -> (f => {
        val o = ordersAt(f)
        graft.engine.Analytics.skyline2DBucketed(
          o.select(col("o_orderkey"),
            col("o_orderkey").as("x"),
            (-col("o_orderkey")).as("y")),
          "o_orderkey", "x", "y")
      }),
      // r11 probes (VERDICT r10 #4): the relational/TPC-H family past
      // sf0.1 — facts ×f under consistent key offsets, dims fixed.
      // These are the shapes a 100× scale-up hits first: the q8/q9
      // multi-join DAGs (fact⋈fact⋈replicated-part against broadcast
      // dims), q21's EXISTS/NOT-EXISTS collapse (per-order counts over
      // a growing lineitem), per-group top-k and windowed rank with
      // per-key history ×f, and the bucket-pruned merge.
      "tpch_q8" -> (f =>
        graft.SparkEntry.queries("tpch_q8")(spark, s"$work/f$f")),
      "tpch_q9" -> (f =>
        graft.SparkEntry.queries("tpch_q9")(spark, s"$work/f$f")),
      "tpch_q21" -> (f =>
        graft.SparkEntry.queries("tpch_q21")(spark, s"$work/f$f")),
      "group_topk" -> (f =>
        graft.SparkEntry.queries("group_topk")(spark, s"$work/f$f")),
      "window_rank" -> (f =>
        graft.SparkEntry.queries("window_rank")(spark, s"$work/f$f")),
      "merge_upsert" -> (f =>
        graft.SparkEntry.queries("merge_upsert")(spark, s"$work/f$f")),
      // r11 probe (VERDICT r10 #6): pruned-query latency over the
      // persisted IVF+PQ layout grown by f−1 append waves (the index
      // build+appends run in fixture prep, never timed here)
      "ivf_append_query" -> (f => graft.engine.IvfIndex
        .loadPq(spark, ivfIndexAt(f), "vec_id", "embedding")
        .queryByIds(Seq(0L, 1L, 2L, 3L, 4L), k = 10, nprobe = 4)),
      // r11 retrieval-eval additions. roc_auc: the scoring scan grows
      // ×f but the AUC histogram is VALUE-bounded (micro-unit grid),
      // so the prefix-sum tail must stay flat while the scan tracks
      // volume. rrf_fusion: two bounded-heap branch scans ×f, the
      // fusion layer itself fixed-size (|Q|·kBranch rows).
      "roc_auc" -> (f =>
        graft.SparkEntry.queries("roc_auc")(spark, s"$work/f$f")),
      "rrf_fusion" -> (f =>
        graft.SparkEntry.queries("rrf_fusion")(spark, s"$work/f$f")),
      "bfs_distances" -> (f => {
        val li = lineitemAt(f)
        val sym = orderEdges(li, minCo = 1).select(explode(array(
            struct(col("part_a").as("s"), col("part_b").as("t")),
            struct(col("part_b").as("s"), col("part_a").as("t"))))
            .as("__e"))
          .select(col("__e.s").as("s"), col("__e.t").as("t"))
        val seeds = li.select(col("l_partkey"))
          .filter(col("l_partkey") % 97 === 0)
        graft.engine.Analytics.bfsDistances(sym, "s", "t", seeds,
          "l_partkey", maxDepth = 3, outCol = "part")
      }),
      // r12 probes. mmr_rerank: the harvest scan grows ×f, the pair
      // matrix and greedy are parameter-bounded — must track the scan.
      "mmr_rerank" -> (f =>
        graft.SparkEntry.queries("mmr_rerank")(spark, s"$work/f$f")),
      // ece / pr_auc: scoring scan ×f; the calibration table is
      // ≤bins keys and the AP histogram value-bounded — tails flat.
      "ece" -> (f =>
        graft.SparkEntry.queries("ece")(spark, s"$work/f$f")),
      "pr_auc" -> (f =>
        graft.SparkEntry.queries("pr_auc")(spark, s"$work/f$f")),
      // image_similarity: synthesize+decode ×f media partition-locally,
      // then the IVF path — decode dominates, must stay linear.
      "image_similarity" -> (f =>
        graft.SparkEntry.queries("image_similarity")(spark, s"$work/f$f")),
      // the PRUNED persisted hybrid query over a layout built in
      // fixture prep (the ivf_append_query pattern — builds never
      // timed): query-term posting lists and probed cells both grow
      // ×f in content while the probe sets stay fixed, so the pruned
      // scans should track f with a small constant, the fusion tail
      // stays |Q|·kBranch.
      // k_core: bounded peel rounds over the ×f co-purchase graph —
      // per-round degree agg + two semi-joins must track edge volume
      "k_core" -> (f =>
        graft.SparkEntry.queries("k_core")(spark, s"$work/f$f")),
      // cdc_chunking: map-only (projection + generator) — must be
      // embarrassingly linear with zero exchanges at every factor
      "cdc_chunking" -> (f =>
        graft.SparkEntry.queries("cdc_chunking")(spark, s"$work/f$f")),
      "hybrid_query" -> (f => {
        val path = hybridIndexAt(f)
        graft.engine.HybridIndex.queryByIds(
          graft.engine.TextIndex.load(spark, s"$path/text"),
          graft.engine.IvfIndex.load(spark, s"$path/ivf", "vec_id",
            "embedding"),
          documentsAt(f), "text", Seq(0L, 1L, 2L),
          kBranch = 20, k = 10, nprobe = 2)
      }),
      // late-r12 probes. simhash_neardup: banded 16-bit buckets over
      // word-permuted replicas — candidate pairs must stay linear (the
      // minhash LSH argument; permutation kills cross-replica bands).
      "simhash_neardup" -> (f =>
        graft.SparkEntry.queries("simhash_neardup")(spark, s"$work/f$f")),
      // hll_distinct: register table bounded at groups × 2^p at any
      // volume — the scan is the only ×f term.
      "hll_distinct" -> (f =>
        graft.SparkEntry.queries("hll_distinct")(spark, s"$work/f$f")),
      // label_prop: R synchronous rounds over the ×f co-purchase graph
      // (disjoint replicas — labels cannot leak across copies).
      "label_prop" -> (f =>
        graft.SparkEntry.queries("label_prop")(spark, s"$work/f$f")),
      // dsir_resample: one tokenize pass (plan-pinned), B-bounded count
      // tables, TakeOrdered tail — must track the scan.
      "dsir_resample" -> (f =>
        graft.SparkEntry.queries("dsir_resample")(spark, s"$work/f$f")),
      // js_divergence: (segment, token) and token tables vocabulary-
      // bounded; the per-replica word permutation preserves each
      // source's token BAG, so the statistic itself is f-invariant.
      "js_divergence" -> (f =>
        graft.SparkEntry.queries("js_divergence")(spark, s"$work/f$f")),
      // ks_test: cent-grid histogram value-bounded; bucketed prefix
      // sums flat — the orders scan is the only ×f term.
      "ks_test" -> (f =>
        graft.SparkEntry.queries("ks_test")(spark, s"$work/f$f")),
      // psi_split: ONE scan into a 20-key aggregate; everything after
      // is nBins rows.
      "psi_split" -> (f =>
        graft.SparkEntry.queries("psi_split")(spark, s"$work/f$f")),
      // spearman_corr: daily rollup ×f rows in, calendar-bounded rows
      // out; the rank windows see only the bounded daily table.
      "spearman_corr" -> (f =>
        graft.SparkEntry.queries("spearman_corr")(spark, s"$work/f$f")),
      // w1_drift: same value-bounded histogram as ks_test plus the
      // predecessor machinery — scan is the only ×f term.
      "w1_drift" -> (f =>
        graft.SparkEntry.queries("w1_drift")(spark, s"$work/f$f")),
      // chunk_dedup: map-only chunking ×f; the hash exchange moves
      // (hash, doc) rows — cross-replica chunk collisions are killed
      // by the word permutation, so the table stays linear.
      "chunk_dedup" -> (f =>
        graft.SparkEntry.queries("chunk_dedup")(spark, s"$work/f$f")),
      // embedding_qa: dimension-bounded aggregate — pure scan tracking.
      "embedding_qa" -> (f =>
        graft.SparkEntry.queries("embedding_qa")(spark, s"$work/f$f")),
      // leakage_safe_split: pair scorer + CC closure ×f over disjoint
      // replicas (components cannot merge across copies). NOT the
      // catalog entry: its absolute doc_id < 600 filter would pin all
      // scorer/closure work to replica 0 (replica ids sit at k·off) —
      // the per-replica modulo keeps the entry's 600-doc domain in
      // EVERY replica, so the probed work genuinely grows ×f.
      "leakage_safe_split" -> (f => {
        val d = documentsAt(f).filter(col("doc_id") % off < 600)
        graft.engine.Extensions.leakageSafeSplit(d, "doc_id",
          graft.engine.Extensions.ngramJaccardPairs(d, "text", "doc_id",
            n = 3, minJaccard = 0.6))
      }),
      // corpus_report: one (text, lang) group + two corpus-keyed
      // re-aggs — everything after is 1-row; must track the scan.
      "corpus_report" -> (f =>
        graft.SparkEntry.queries("corpus_report")(spark, s"$work/f$f")),
      // dup_by_source: (head-fp, source) group + per-key totals.
      "dup_by_source" -> (f =>
        graft.SparkEntry.queries("dup_by_source")(spark, s"$work/f$f")))

    // optional comma-separated shape filter (sweep a subset without
    // re-timing the whole battery)
    val onlyShapes: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_SHAPES").map(_.split(",").map(_.trim).toSet)
    val selected = shapes.filter { case (n, _) =>
      onlyShapes.forall(_.contains(n)) }

    // generate ONLY the fixtures the selected shapes read (a filtered
    // sweep must not pay minutes of unrelated replica writes), and do
    // it before timing so write time never leaks into a measurement;
    // then one JVM warmup pass at the smallest factor
    val tablesFor: Map[String, Set[String]] = Map(
      "basket_affinity" -> Set("lineitem"),
      "triangle_count" -> Set("lineitem"),
      "edge_jaccard" -> Set("lineitem"),
      "bfs_distances" -> Set("lineitem"),
      "dedup_clusters" -> Set("documents"),
      "span_dedup" -> Set("documents"),
      "token_pmi" -> Set("documents"),
      "bpe_merges" -> Set("documents"),
      "bpe_stats" -> Set("documents"),
      "length_batching" -> Set("documents"),
      "zipf_slope" -> Set("documents"),
      "stream_admission" -> Set("documents"),
      "bloom_decontaminate" -> Set("documents"),
      "ann_ivf" -> Set("embeddings"),
      "pq_topk" -> Set("embeddings"),
      "ivfpq_topk" -> Set("embeddings"),
      "cosine_neardup_blocked" -> Set("embeddings_perm"),
      "semantic_dedup" -> Set("embeddings_perm"),
      "semantic_dedup_scaled" -> Set("embeddings_perm"),
      "semantic_dedup_tight" -> Set("embeddings_perm"),
      "quality_score_lr" -> Set("documents"),
      "knn_join" -> Set("embeddings_perm"),
      "ewma_smooth" -> Set("orders"),
      "skyline_bucketed_anti" -> Set("orders"),
      "pit_join" -> Set("lineitem", "orders"),
      "tpch_q8" -> Set("lineitem", "orders", "part", "dims"),
      "tpch_q9" -> Set("lineitem", "orders", "part", "dims"),
      "tpch_q21" -> Set("lineitem", "orders", "dims"),
      "group_topk" -> Set("orders"),
      "window_rank" -> Set("orders"),
      "merge_upsert" -> Set("orders"),
      "ivf_append_query" -> Set("embeddings_perm", "ivf_index"),
      "mmr_rerank" -> Set("embeddings"),
      "ece" -> Set("embeddings"),
      "pr_auc" -> Set("embeddings"),
      "image_similarity" -> Set("documents"),
      "hybrid_query" -> Set("documents", "embeddings", "hybrid_index"),
      "k_core" -> Set("lineitem"),
      "cdc_chunking" -> Set("documents"),
      "roc_auc" -> Set("embeddings"),
      "rrf_fusion" -> Set("documents", "embeddings"),
      "simhash_neardup" -> Set("documents"),
      "hll_distinct" -> Set("lineitem"),
      "label_prop" -> Set("lineitem"),
      "dsir_resample" -> Set("documents"),
      "js_divergence" -> Set("documents"),
      "ks_test" -> Set("orders"),
      "psi_split" -> Set("orders"),
      "spearman_corr" -> Set("orders", "dims"),
      "w1_drift" -> Set("orders"),
      "chunk_dedup" -> Set("documents"),
      "embedding_qa" -> Set("embeddings"),
      "leakage_safe_split" -> Set("documents"),
      "corpus_report" -> Set("documents"),
      "dup_by_source" -> Set("documents"))
    val needed = selected.flatMap { case (n, _) =>
      tablesFor.getOrElse(n, Set("lineitem", "documents", "embeddings",
        "embeddings_perm", "orders")) }.toSet
    factors.foreach { f =>
      if (needed("lineitem")) lineitemAt(f)
      if (needed("documents")) documentsAt(f)
      if (needed("embeddings")) embeddingsAt(f)
      if (needed("embeddings_perm")) embeddingsPermAt(f)
      if (needed("orders")) ordersAt(f)
      if (needed("part")) partAt(f)
      if (needed("dims"))
        Seq("customer", "supplier", "nation", "region")
          .foreach(staticAt(f, _))
      if (needed("ivf_index")) ivfIndexAt(f)
      if (needed("hybrid_index")) hybridIndexAt(f)
    }
    selected.foreach { case (_, mk) => mk(factors.head).count() }

    val times = selected.map { case (name, mk) =>
      name -> factors.map { f =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk(f).count()
        f -> (System.nanoTime() - t0) / 1e9
      }
    }
    def exponent(ts: Seq[(Int, Double)]): Double = {
      val xs = ts.map(t => math.log(t._1.toDouble))
      val ys = ts.map(t => math.log(t._2))
      val (mx, my) = (xs.sum / xs.size, ys.sum / ys.size)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = xs.map(x => (x - mx) * (x - mx)).sum
      math.rint(cov / vx * 100) / 100
    }
    val qs = times.map { case (name, ts) =>
      val tj = ts.map { case (f, t) =>
        s""""$f":${math.rint(t * 1000) / 1000}""" }.mkString("{", ",", "}")
      s""""$name":{"t":$tj,"exponent":${exponent(ts)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"queries":$qs,"factors":[${factors.mkString(",")}],"base":"$base"}""")
    spark.stop()
  }
}
