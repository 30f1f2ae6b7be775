package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Product-analytics and data-maintenance operators: conversion
  * funnels, cohort retention, CDC-style merge/upsert, weighted
  * sampling, embedding quantization, PageRank. Everything here is a
  * declarative DataFrame plan (Catalyst optimizes, AQE re-plans) and
  * each operator's scaladoc states its shuffle shape — the property
  * that decides whether it survives 100 TB.
  *
  * Extends the reference's analytics surface (its widest aggregation
  * is groupBy/agg, reference: src/feature_engineering.py:53) with the
  * event-funnel / retention / merge shapes a production analytics
  * engine is expected to answer.
  */
object Analytics {

  private def requireNoReserved(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input uses reserved internal column name(s): ${clash.mkString(", ")}")
  }

  /** Epoch day via pure integer division (`div`, truncation toward
    * zero — bit-identical to DuckDB's `//`), never a double quotient:
    * the daily-series operators promise bit-exact integer arithmetic
    * end-to-end and a float intermediate would be the one exception.
    */
  private def epochDay(dateCol: String): Column =
    expr(s"cast(cast(`$dateCol` as timestamp) as long) div 86400")

  /** Strict ordered conversion funnel: for each user, step i counts as
    * reached only by an event of `steps(i)` STRICTLY AFTER the user's
    * step-(i−1) completion time (and within `deadlineSeconds` of it,
    * when given). Returns one row per step: (step, event_type,
    * users_reached).
    *
    * Shuffle shape: ONE hash exchange on `userCol`. Each step is a
    * conditional-min window over the same user partitioning, so
    * Catalyst stacks the WindowExecs on a single exchange; the
    * per-user collapse reuses that partitioning (no second shuffle),
    * and the final per-step rollup exchanges |steps| rows per
    * partition. No joins, no self-unions — at 1000 executors the cost
    * is one pass over events plus one tiny rollup.
    *
    * `tsCol` must cast to a numeric epoch (the library convention is
    * epoch seconds — [[Tables.events]]' `ts` qualifies).
    */
  def funnel(ev: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], deadlineSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    requireNoReserved(ev, steps.indices.map(i => s"__s$i") :+ "__t")
    val w = Window.partitionBy(userCol)
    var df = ev.select(col(userCol), col(typeCol),
      col(tsCol).cast("long").as("__t"))
    steps.zipWithIndex.foreach { case (st, i) =>
      val base = col(typeCol) === lit(st)
      val cond =
        if (i == 0) base
        else {
          val after = base && col("__t") > col(s"__s${i - 1}")
          deadlineSeconds
            .map(dl => after && col("__t") <= col(s"__s${i - 1}") + lit(dl))
            .getOrElse(after)
        }
      df = df.withColumn(s"__s$i", min(when(cond, col("__t"))).over(w))
    }
    val aggs = steps.indices.map(i => max(col(s"__s$i")).as(s"__s$i"))
    val perUser = df.groupBy(userCol).agg(aggs.head, aggs.tail: _*)
    val stepStructs = steps.zipWithIndex.map { case (st, i) =>
      struct(lit(i + 1).as("step"), lit(st).as("event_type"),
        col(s"__s$i").isNotNull.cast("long").as("r"))
    }
    perUser.select(explode(array(stepStructs: _*)).as("__x"))
      .groupBy(col("__x.step").as("step"),
        col("__x.event_type").as("event_type"))
      .agg(sum(col("__x.r")).as("users_reached"))
  }

  /** Cohort retention: users are cohorted by the bucket (default:
    * day) of their first event in `ev`, and each (cohort, offset)
    * cell counts users active `offset` buckets after their cohort
    * bucket. Pre-filter `ev` to the activity that defines "active"
    * (e.g. purchases only). Returns (cohort_bucket, bucket_offset,
    * active_users).
    *
    * Shuffle shape: one exchange on `userCol` (first-bucket window +
    * the per-(user, bucket) distinct reuse it via partial aggregation),
    * then one exchange on (cohort, offset) for the cell counts —
    * cardinality ≤ buckets², independent of user count.
    */
  def cohortRetention(ev: DataFrame, userCol: String, tsCol: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    requireNoReserved(ev, Seq("__u", "__b", "__cb"))
    val base = ev.select(col(userCol).as("__u"),
      (col(tsCol).cast("long") / bucketSeconds).cast("long").as("__b"))
    base
      .withColumn("__cb", min("__b").over(Window.partitionBy("__u")))
      .select("__u", "__cb", "__b").distinct()
      .groupBy(col("__cb").as("cohort_bucket"),
        (col("__b") - col("__cb")).as("bucket_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** CDC-style MERGE (upsert + optional delete): rows of `updates`
    * overwrite matching `target` rows column-by-column (update columns
    * may be a subset of the target's — unmentioned columns keep their
    * target values), unmatched update rows insert, and update rows
    * with `deleteCol = true` delete the matching target row. The
    * semantics of `MERGE INTO target USING updates ON keys WHEN
    * MATCHED [AND del] THEN DELETE / WHEN MATCHED THEN UPDATE SET ... /
    * WHEN NOT MATCHED THEN INSERT`, as one declarative plan.
    *
    * Shuffle shape: a single full-outer hash join on `keyCols` — both
    * sides exchange once on the key; when `updates` is small (the
    * normal CDC case) AQE downgrades its side to a broadcast. The
    * multi-match guard is a count window on the update side over the
    * same key partitioning, so it rides the exchange the join already
    * pays — no extra shuffle, no row_number over the target.
    *
    * ANSI MERGE semantics, including the edges: a NULL key never
    * matches (`ON t.k = u.k`), so NULL-keyed update rows insert and
    * NULL-keyed target rows pass through unchanged; and if more than
    * one update row matches the same target row the merge raises at
    * execution time (SQL's "MERGE ... matched by multiple source
    * rows" error) rather than silently fanning the target row out.
    * Duplicate-keyed update rows that match no target row all insert,
    * as in SQL.
    */
  def mergeUpsert(target: DataFrame, updates: DataFrame,
      keyCols: Seq[String], deleteCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "mergeUpsert needs at least one key column")
    requireNoReserved(target, Seq("__mu_present", "__mu_dups"))
    requireNoReserved(updates, Seq("__mu_present", "__mu_dups"))
    val dataCols = target.columns.filterNot(keyCols.contains).toSeq
    val updData = updates.columns.filterNot(keyCols.contains)
      .filterNot(c => deleteCol.contains(c)).toSeq
    require(updData.forall(dataCols.contains),
      s"update columns not in target: ${updData.filterNot(dataCols.contains).mkString(", ")}")
    val t = target.as("__mt")
    // Marker + per-key multiplicity ride the update side; the window's
    // key partitioning is the join's, so Catalyst plans one exchange.
    val u = updates
      .withColumn("__mu_present", lit(true))
      .withColumn("__mu_dups", count(lit(1)).over(
        Window.partitionBy(keyCols.map(col): _*)))
      .as("__mu")
    val cond = keyCols.map(k => col(s"__mt.$k") === col(s"__mu.$k"))
      .reduce(_ && _)
    val joined = t.join(u, cond, "full_outer")
    val present = col(s"__mu.__mu_present").isNotNull
    // Matched ⇒ both sides real (join cond guarantees non-null keys).
    val multiMatch = present && col(s"__mt.${keyCols.head}").isNotNull &&
      col(s"__mu.__mu_dups") > lit(1L)
    val guarded = joined.filter(
      when(multiMatch, raise_error(concat(
          lit("mergeUpsert: multiple update rows match target key ("),
          concat_ws(",", keyCols.map(k => col(s"__mu.$k").cast("string")): _*),
          lit(") — dedup updates to one row per key first"))))
        .otherwise(lit(true)))
    val kept = deleteCol match {
      case Some(d) =>
        guarded.filter(!(present && coalesce(col(s"__mu.$d"), lit(false))))
      case None => guarded
    }
    val outKey = keyCols.map(k =>
      coalesce(col(s"__mt.$k"), col(s"__mu.$k")).as(k))
    val outData = dataCols.map { c =>
      if (updData.contains(c))
        when(present, col(s"__mu.$c")).otherwise(col(s"__mt.$c")).as(c)
      else col(s"__mt.$c").as(c)
    }
    kept.select(outKey ++ outData: _*)
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis exponential ranks): keeps the `n` rows with
    * the smallest `−ln(u)/w`, where `u ∈ (0, 1]` derives from
    * `md5(key)` — so the sample is a pure function of the keys, stable
    * across partitionings and re-runs, and each row's inclusion odds
    * are proportional to its weight.
    *
    * u uses 13 hex digits = 52 bits: exactly representable in a
    * double, so an oracle recomputing it via BIGINT→DOUBLE gets the
    * identical value. Rows with weight ≤ 0 are excluded (zero odds).
    *
    * PRECONDITION: `keyCol` must be unique. Duplicate keys share the
    * same (score, key) sort value, so which duplicate survives a
    * `limit(n)` boundary would depend on partition order — the
    * determinism guarantee holds only for unique keys. (A generic
    * whole-row tiebreak is not possible here: the frame may carry
    * map-typed columns, which Spark can neither order nor hash.)
    *
    * Shuffle shape: no global sort — `orderBy(...).limit(n)` plans as
    * TakeOrderedAndProject (per-partition top-n, then a driver-side
    * merge of n·partitions candidates).
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n > 0, "sample size must be positive")
    requireNoReserved(df, Seq("__score"))
    val u = (conv(substring(md5(col(keyCol).cast("string").cast("binary")),
      1, 13), 16, 10).cast("double") + 1.0) / 4503599627370496.0 // 2^52
    df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("__score", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("__score"), col(keyCol))
      .limit(n)
      .drop("__score")
  }

  /** Symmetric int8 scalar quantization of an embedding column, with
    * per-vector reconstruction diagnostics: `quant_scale` (= amax/127),
    * an integer `q_checksum` (sum of the quantized codes — an exact,
    * engine-independent fingerprint of the full code vector), and the
    * max absolute reconstruction error. The all-zero vector quantizes
    * to all-zero codes (scale 0).
    *
    * Shuffle shape: pure projection — array HOFs (`transform` /
    * `zip_with` / `aggregate`) stay inside whole-stage codegen; no
    * exchange at any scale. The float→double cast happens before any
    * arithmetic so results are bit-reproducible across engines.
    */
  def quantizeEmbeddings(emb: DataFrame, embCol: String,
      idCol: String): DataFrame = {
    requireNoReserved(emb, Seq("__e", "__amax", "__scale", "__q"))
    emb
      .select(col(idCol), transform(col(embCol), x => x.cast("double")).as("__e"))
      .withColumn("__amax", array_max(transform(col("__e"), x => abs(x))))
      .withColumn("__scale", col("__amax") / 127.0)
      .withColumn("__q", when(col("__amax") === 0.0,
          transform(col("__e"), _ => lit(0.0)))
        .otherwise(transform(col("__e"), x =>
          greatest(lit(-127.0), least(lit(127.0),
            round(x / col("__scale"), 0))))))
      .select(col(idCol),
        size(col("__e")).as("n_dims"),
        col("__scale").as("quant_scale"),
        aggregate(col("__q"), lit(0L), (acc, x) => acc + x.cast("long"))
          .as("q_checksum"),
        round(array_max(zip_with(col("__e"), col("__q"),
          (x, q) => abs(x - q * col("__scale")))), 6).as("max_abs_err"))
  }

  /** Fixed-iteration PageRank over an edge list (damping d, uniform
    * init, dangling mass dropped — the standard simplified recurrence
    * `pr' = (1−d)/N + d·Σ pr(in)/outdeg(in)`). Fixed iteration count
    * keeps the result a deterministic, oracle-checkable function of
    * the edges; convergence-driven stopping belongs to the caller.
    *
    * Shuffle shape per iteration: one hash join of the rank frame with
    * the (pre-degreed, persisted) edge frame on `src`, one aggregation
    * exchange on `dst`, one left join back to the node set — all on
    * node/edge keys, never materializing anything driver-side. N and
    * the teleport term ride a broadcast 1-row aggregate. Lineage grows
    * linearly with iterations; the persisted edge/node frames pin the
    * expensive base so each iteration re-reads memory, not parquet.
    *
    * Caching contract (same as [[Extensions.minhashNearDupsMLlib]] /
    * [[Extensions.annBucketed]]): the node/edge persists live until the
    * session drops them — call `spark.catalog.clearCache()` when done
    * with the returned ranks to release them.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "pageRank needs at least one iteration")
    // LAZY cut (r18): the every-4th-iter cut only needs to sever the
    // plan; materialization rides the caller's action
    val ckpt = Lineage.truncator(edges.sparkSession, checkpointDir,
      eager = false)
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
    val nodes = e.select(col("__src").as("id"))
      .union(e.select(col("__dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eDeg = e.join(
        e.groupBy("__src").agg(count(lit(1)).cast("double").as("__deg")),
        "__src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCount = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var pr = nodes.crossJoin(broadcast(nCount))
      .select(col("id"), (lit(1.0) / col("__n")).as("pagerank"))
    for (i <- 1 to iters) {
      val contribs = pr.join(eDeg, pr("id") === eDeg("__src"))
        .select(col("__dst").as("id"),
          (col("pagerank") / col("__deg")).as("__c"))
        .groupBy("id").agg(sum("__c").as("__sum"))
      pr = nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(nCount))
        .select(col("id"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__sum"), lit(0.0))).as("pagerank"))
      // truncate lineage periodically: the rank frame's plan otherwise
      // nests every prior iteration, and analyzer/optimizer cost (and
      // plan text) grow quadratically with iters — the iterative-plan
      // failure mode ConnectedComponents already guards against.
      // Values are unchanged; short runs (like the catalog's 3-iter
      // query) never hit a checkpoint.
      if (i % 4 == 0 && i < iters)
        pr = ckpt(pr)
    }
    pr
  }

  /** Per-node triangle participation counts over an undirected edge
    * list: how many triangles each node is a corner of — the local
    * clustering signal behind near-dup clique detection, spam-farm and
    * bot-ring analysis. Returns (`outCol`, triangles) for every node
    * that is in at least one triangle.
    *
    * Scale shape: the classic degree-orientation algorithm. Every
    * undirected edge is oriented from its lower-(degree, id) endpoint
    * to the higher one, which caps any node's oriented out-degree at
    * O(√m) on ANY graph — so the wedge self-join's per-node fanout is
    * bounded even on a hub node, where a naive adjacency self-join
    * would emit degree² pairs. Wedges (u→v, u→w) are closed by one
    * hash join back against the oriented edge set; each triangle is
    * found exactly once, at its minimum-degree corner. Hash exchanges
    * only (degree attach, wedge build, closure probe) — never
    * all-pairs, no sorts.
    */
  def triangleCount(edges: DataFrame, aCol: String, bCol: String,
      outCol: String = "id"): DataFrame = {
    requireNoReserved(edges, Seq("__a", "__b", "__da", "__db", "__u",
      "__v", "__w", "__cu", "__cv"))
    // canonical undirected edges: a < b, self-loops and nulls dropped
    val und = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("__a"),
        greatest(col(aCol), col(bCol)).as("__b"))
      .distinct()
    val deg = und.select(col("__a").as("__id"))
      .unionAll(und.select(col("__b").as("__id")))
      .groupBy("__id").agg(count(lit(1)).as("__deg"))
    val withDeg = und
      .join(deg.select(col("__id").as("__a"), col("__deg").as("__da")),
        "__a")
      .join(deg.select(col("__id").as("__b"), col("__deg").as("__db")),
        "__b")
    // total orientation order: (degree, id) — ties on degree break by id
    val aFirst = (col("__da") < col("__db")) ||
      (col("__da") === col("__db") && col("__a") < col("__b"))
    // dst keeps its (degree, id) key so wedge endpoints order the same
    // way edges orient — the closing edge, if present, is exactly v→w
    val oriented = withDeg.select(
      when(aFirst, col("__a")).otherwise(col("__b")).as("__u"),
      when(aFirst, struct(col("__db").as("d"), col("__b").as("i")))
        .otherwise(struct(col("__da").as("d"), col("__a").as("i")))
        .as("__v"))
    val wedges = oriented
      .join(oriented.select(col("__u"), col("__v").as("__w")), "__u")
      .filter(col("__v") < col("__w"))
    val tris = wedges.join(
        oriented.select(col("__u").as("__cu"), col("__v").as("__cv")),
        col("__v.i") === col("__cu") && col("__w") === col("__cv"))
      .select(col("__u"), col("__v.i").as("__vi"), col("__w.i").as("__wi"))
    tris
      .select(explode(array(col("__u"), col("__vi"), col("__wi")))
        .as(outCol))
      .groupBy(outCol).agg(count(lit(1)).as("triangles"))
  }

  /** k-core decomposition (iterative peel): repeatedly delete nodes
    * with fewer than k surviving neighbors until none remain; returns
    * the nodes of the k-core with their within-core degree. The
    * standard graph-cleaning step before community/cluster analysis —
    * on a near-dup graph it strips weakly-attached accidental matches
    * while keeping genuinely dense duplicate groups; pairs with
    * [[graft.operators.ConnectedComponents]] (closure),
    * [[triangleCount]] (density) and [[edgeJaccard]] (edge strength).
    * Deterministic: the peel's fixpoint is order-independent (deleting
    * any sub-k node never makes another node eligible to survive).
    *
    * Scale shape: each round is one degree aggregation + two semi-joins
    * of the surviving symmetric edge list — no windows, no all-pairs.
    * Rounds are bounded by the peel depth (≤ graph degeneracy, shallow
    * in practice); lineage truncates per round (reliable-checkpoint
    * knob via [[Lineage]]), the same iterative-algorithm hygiene as
    * ConnectedComponents/pageRank.
    * The only driver-side values are 1-row round counts (the accepted
    * broadcast-1-row idiom).
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
      maxIter: Int = 30, outCol: String = "id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be at least 1")
    // LAZY cuts (r18): each round's keep-set count materializes both
    // the keep cut and (transitively) the previous round's surviving
    // edge cut — one driver action per round instead of three
    val ckpt = Lineage.truncator(edges.sparkSession, checkpointDir,
      eager = false)
    requireNoReserved(edges, Seq("__a", "__b", "__n", "__m", "__deg"))
    val und = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("__a"),
        greatest(col(aCol), col(bCol)).as("__b"))
      .distinct()
    var sym = und
      .select(explode(array(
        struct(col("__a").as("n"), col("__b").as("m")),
        struct(col("__b").as("n"), col("__a").as("m")))).as("__e"))
      .select(col("__e.n").as("__n"), col("__e.m").as("__m"))
      .transform(ckpt)
    var nAlive = -1L
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val deg = sym.groupBy("__n").agg(count(lit(1)).as("__deg"))
      val keep = ckpt(deg.filter(col("__deg") >= k).select("__n"))
      val nKeep = keep.count()
      if (nKeep == nAlive) done = true // no node fell below k: fixpoint
      else {
        nAlive = nKeep
        sym = ckpt(sym.join(keep, Seq("__n"), "left_semi")
          .join(keep.select(col("__n").as("__m")), Seq("__m"),
            "left_semi")
          .select("__n", "__m"))
        if (nKeep == 0L) done = true // empty core (sym is now empty too)
      }
      iter += 1
    }
    require(done, s"kCore did not converge in $maxIter rounds")
    sym.groupBy(col("__n").as(outCol))
      .agg(count(lit(1)).as("core_degree"))
      .filter(col("core_degree") >= k)
  }

  /** Synchronous label propagation for community detection, made fully
    * deterministic: every node starts from its own id, and each round
    * adopts the label with the highest vote count among its neighbors
    * PLUS its own current label (the self-vote damps the classic
    * 2-cycle oscillation on bipartite-ish structure), ties broken by
    * the SMALLEST label. Runs exactly `rounds` rounds — a fixed
    * unrollable recurrence rather than a data-dependent fixpoint, so a
    * fixed-depth SQL twin replays it bit-for-bit (the k_core playbook
    * without needing idempotence at the tail).
    *
    * Scale shape per round: one hash join of the symmetric edge list
    * against the (node, label) frame plus one two-level groupBy — the
    * same bounded-frontier doctrine as [[kCore]]/[[pageRank]]; the
    * vote argmax is a single max(struct(count, −label)) aggregate, no
    * window, so partial aggregation combines map-side. Lineage
    * truncates per round ([[Lineage]]).
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      rounds: Int = 4, outCol: String = "id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1 && rounds <= 20, "rounds must be in [1, 20]")
    // LAZY cuts (r18): the recurrence is fixed-depth with no
    // data-dependent driver decision, so no per-round action is needed
    // at all — every cut still severs the plan (analyzer cost stays
    // linear in rounds) and the final action materializes the chain,
    // round by round, in one job
    val ckpt = Lineage.truncator(edges.sparkSession, checkpointDir,
      eager = false)
    requireNoReserved(edges,
      Seq("__a", "__b", "__n", "__m", "__label", "__c", "__best"))
    val und = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("__a"),
        greatest(col(aCol), col(bCol)).as("__b"))
      .distinct()
    val sym = und
      .select(explode(array(
        struct(col("__a").as("n"), col("__b").as("m")),
        struct(col("__b").as("n"), col("__a").as("m")))).as("__e"))
      .select(col("__e.n").as("__n"), col("__e.m").as("__m"))
      .transform(ckpt)
    var labels = sym.select(col("__n")).distinct()
      .select(col("__n"), col("__n").as("__label"))
      .transform(ckpt)
    (1 to rounds).foreach { _ =>
      val votes = sym
        .join(labels.withColumnRenamed("__n", "__m"), Seq("__m"))
        .select(col("__n"), col("__label"))
        .unionByName(labels)
      labels = ckpt(votes
        .groupBy("__n", "__label").agg(count(lit(1)).as("__c"))
        .groupBy("__n")
        .agg(max(struct(col("__c").as("c"),
          (-col("__label")).as("neg"))).as("__best"))
        .select(col("__n"), (-col("__best.neg")).as("__label")))
    }
    labels.select(col("__n").as(outCol), col("__label").as("label"))
  }

  /** Per-edge common-neighbor similarity (the Jaccard link-prediction
    * score): for every undirected edge (a, b), the number of shared
    * neighbors |N(a)∩N(b)|, both degrees, and
    * jaccard = |N(a)∩N(b)| / |N(a)∪N(b)| = c / (deg_a + deg_b − c).
    * Neighborhoods are used as-is (b ∈ N(a) and a ∈ N(b) stay in the
    * union; endpoints can never be in the intersection absent
    * self-loops), the standard link-prediction convention. Edges are
    * normalized like [[triangleCount]]: canonical a < b, duplicates /
    * reversals / self-loops collapsed.
    *
    * Scale shape: adjacency is ONE collect_set aggregation into
    * per-node sorted neighbor arrays (bounded by max degree) that also
    * absorbs input dedup — no separate distinct exchange. The
    * canonical edge list then falls out of the adjacency rows
    * themselves (explode each node's m > n neighbors), carrying the
    * n-side array for free, so only the m-side array is joined at
    * all; each edge intersects its two endpoint arrays in-array —
    * common-neighbor counting never enumerates wedges, so the work is
    * O(edges · max_degree), not O(Σ deg²). `maxDegree`
    * (0 = off) drops hub nodes AND their incident edges before the
    * collect, bounding agg buffers and join fan-out exactly like
    * `basketAffinity.maxItemsPerBasket`: the capped result equals the
    * uncapped result on the hub-free subgraph (a hub's similarity to
    * everything is ~0 in link prediction — dropping it is the
    * standard guard, asserted as a law in the spec).
    */
  def edgeJaccard(edges: DataFrame, aCol: String, bCol: String,
      maxDegree: Int = 0): DataFrame = {
    requireNoReserved(edges, Seq("__a", "__b", "__n", "__m", "__nbrs",
      "__deg", "__nba", "__nbb", "common_cnt", "deg_a", "deg_b",
      "jaccard"))
    // symmetrize from ONE evaluation of the raw edge plan; duplicate
    // and reversed input edges need no distinct exchange of their own —
    // the adjacency collect_set below dedups them in-aggregate
    val sym = edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
      .select(explode(array(
        struct(col(aCol).as("n"), col(bCol).as("m")),
        struct(col(bCol).as("n"), col(aCol).as("m")))).as("__e"))
      .select(col("__e.n").as("__n"), col("__e.m").as("__m"))
    // hub cap BEFORE the collect: exact degree rollup (distinct only
    // here — the cap path pays for exactness), then keep pairs whose
    // BOTH endpoints are under the cap — agg buffers and per-edge
    // intersect work are bounded by the cap
    val kept =
      if (maxDegree <= 0) sym
      else {
        val ok = sym.distinct().groupBy("__n")
          .agg(count(lit(1)).as("__deg"))
          .filter(col("__deg") <= maxDegree).select("__n")
        sym.join(ok, Seq("__n"), "left_semi")
          .join(ok.select(col("__n").as("__m")), Seq("__m"), "left_semi")
      }
    val adj = kept.groupBy("__n")
      .agg(sort_array(collect_set(col("__m"))).as("__nbrs"))
    val adjElemType = adj.schema("__nbrs").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    // canonical edges fall out of the adjacency rows themselves:
    // exploding n's own (sorted, deduped) array to its m > n neighbors
    // yields each undirected edge exactly once WITH n's array already
    // on the row — only the m-side array needs a join at all
    adj
      .select(col("__n"), col("__nbrs").as("__nba"),
        explode(filter(col("__nbrs"), m => m > col("__n"))).as("__m"))
      // shuffle_hash, not sort-merge: the probe side is the exploded
      // O(E) edge stream CARRYING the n-side adjacency array (~d̄·8
      // bytes per row) — sort-merge would sort that array-weighted
      // stream and its spill cost turns super-linear once the volume
      // passes executor memory (measured: 2× data → 2.6× time at the
      // ScaleProbe f10 point; shuffle_hash returns it to sub-linear).
      // The build side is the adjacency table itself — one row per
      // node, degree-bounded arrays (hub cap is the relief valve), the
      // side that stays executor-sized at scale.
      .join(adj.select(col("__n").as("__m"), col("__nbrs").as("__nbb"))
        .hint("shuffle_hash"), "__m")
      .select(col("__n").as(aCol), col("__m").as(bCol),
        // codegen'd merge walk on the sorted deduped adjacency arrays
        // (opt r19, §4): size(array_intersect) built a boxed hash set
        // per edge — ~80% of the join stage's CPU. Identical count by
        // construction (sort_array(collect_set) inputs; equality law
        // in AnalyticsSpec). Non-integral id types keep the generic
        // kernel.
        (adjElemType match {
          case org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.IntegerType =>
            graft.functions.SortedIntersectCount.sortedIntersectCount(
              col("__nba"), col("__nbb"))
          case _ => size(array_intersect(col("__nba"), col("__nbb")))
        }).cast("long")
          .as("common_cnt"),
        size(col("__nba")).cast("long").as("deg_a"),
        size(col("__nbb")).cast("long").as("deg_b"))
      .withColumn("jaccard",
        round(col("common_cnt").cast("double") /
          (col("deg_a") + col("deg_b") - col("common_cnt"))
            .cast("double"), 6))
  }

  /** Grouped top-k rows — largest `ordCol` per group, ties broken by
    * smallest `idCol` — via the bounded-heap aggregate
    * [[graft.functions.TopKPairs]]. Returns one row per kept item:
    * (groupCols*, rk, idCol, ordCol) with rk in 1..k.
    *
    * Shuffle shape: ONE hash exchange carrying at most k rows per group
    * per map partition (map-side partial top-k), then a per-group
    * explode. The equivalent `row_number() OVER (...) <= k` window
    * shuffles and SORTS every input row; at 100 TB with millions of
    * groups this form moves orders of magnitude less data and never
    * sorts a whole partition. `idCol` must be unique within its group
    * (it is the tiebreak and the row identity).
    */
  def groupTopK(df: DataFrame, groupCols: Seq[String], ordCol: String,
      idCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupTopK needs at least one group column")
    // the heap carries ids as longs; a silent cast("long") would null
    // out string/UUID ids (rows vanish) and round doubles — reject
    // non-integral id columns instead
    val idType = df.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"groupTopK needs an integral id column; '$idCol' is " +
        s"${idType.simpleString} — hash or dense-rank it to a long first")
    requireNoReserved(df, Seq("__tk", "__p", "__rk0"))
    val gs = groupCols.map(col)
    df.groupBy(gs: _*)
      .agg(graft.functions.TopKPairs.topKPairs(
        col(ordCol).cast("double"), col(idCol).cast("long"), k).as("__tk"))
      .select(gs :+ posexplode(col("__tk")).as(Seq("__rk0", "__p")): _*)
      .select(gs ++ Seq(
        (col("__rk0") + 1).cast("int").as("rk"),
        col("__p.id").as(idCol),
        col("__p.ord").as(ordCol)): _*)
  }

  /** Two-sample A/B comparison of `metricCol` between every variant in
    * `groupCol` and the named `control`: per-variant n/mean/stddev plus
    * the Welch z-score of the mean difference vs control
    * (z = (m_v − m_c) / sqrt(s_v²/n_v + s_c²/n_c)). The z-score IS the
    * decision statistic — map it to a p-value with the normal CDF of
    * your stats library; no distribution tables live in the engine.
    *
    * Scale shape: ONE aggregation pass over the data (partial-agg
    * n/sum/sumsq per variant), then O(variants) arithmetic against the
    * broadcast control row. Moment sums are order-sensitive in the
    * last ulps, so mean/std/z are rounded to 6 dp (the library's
    * aggregate convention).
    */
  def abTest(df: DataFrame, groupCol: String, metricCol: String,
      control: String): DataFrame = {
    requireNoReserved(df, Seq("__n", "__m", "__s", "__cn", "__cm", "__cs"))
    val stats = df.filter(col(metricCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"),
        avg(col(metricCol)).as("__m"),
        stddev_samp(col(metricCol)).as("__s"))
    val ctrl = stats.filter(col(groupCol) === lit(control))
      .select(col("__n").as("__cn"), col("__m").as("__cm"),
        col("__s").as("__cs"))
    stats.filter(col(groupCol) =!= lit(control))
      .crossJoin(broadcast(ctrl))
      .select(col(groupCol).as("variant"),
        col("__n").as("n"),
        round(col("__m"), 6).as("mean"),
        round(col("__s"), 6).as("stddev"),
        round((col("__m") - col("__cm")) /
          sqrt(col("__s") * col("__s") / col("__n") +
            col("__cs") * col("__cs") / col("__cn")), 6).as("z_score"))
  }

  /** Per-key rolling z-score outlier flags: each row is scored against
    * the mean/stddev of the PRECEDING `lookback` rows (the row itself
    * excluded, so a spike can't mask itself), ordered by `tsCol` with
    * `tieCol` making the frame total. Rows with fewer than `minPrior`
    * prior observations or zero prior variance emit a null score.
    * Returns the input keys plus (z_score, is_outlier).
    *
    * Shuffle shape: ONE hash exchange on `keyCol` — both window
    * aggregates share the partitioning and frame. The frame is ROWS
    * (count-bounded), so state per key is O(lookback) regardless of
    * time density.
    */
  def rollingZScore(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, lookback: Int,
      threshold: Double = 3.0, minPrior: Int = 2): DataFrame = {
    require(lookback >= 2, "lookback must be at least 2")
    requireNoReserved(df, Seq("__rm", "__rs", "__rn", "__z"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).cast("long"), col(tieCol))
      .rowsBetween(-lookback, -1)
    val scored = df
      .withColumn("__rm", avg(col(valueCol)).over(w))
      .withColumn("__rs", stddev_samp(col(valueCol)).over(w))
      .withColumn("__rn", count(col(valueCol)).over(w))
    scored.withColumn("__z",
        when(col("__rn") >= minPrior && col("__rs") > 0,
          round((col(valueCol) - col("__rm")) / col("__rs"), 6)))
      .withColumn("is_outlier",
        coalesce(abs(col("__z")) > threshold, lit(false)))
      .drop("__rm", "__rs", "__rn")
      .withColumnRenamed("__z", "z_score")
  }

  /** Per-group Tukey-fence outlier flags: a row is an outlier when its
    * value falls outside [Q1 − k·IQR, Q3 + k·IQR] of ITS GROUP's exact
    * interpolated quartiles (k = 1.5 is Tukey's convention; 3.0 for
    * "far out"). The group-relative complement to the global two-pass
    * z-score flags in [[Features]] — a value normal for one segment
    * can be wild for another.
    *
    * Scale shape: one percentile aggregation per group (exact
    * `percentile` is a partial-aggregating sketchless agg), joined
    * back on the group key — broadcast when groups are few, hash
    * otherwise. No windows, no global sort.
    */
  def tukeyOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(k > 0, "k must be positive")
    requireNoReserved(df, Seq("__q1", "__q3", "fence_lo", "fence_hi"))
    val cuts = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.25)).as("__q1"),
        percentile(col(valueCol), lit(0.75)).as("__q3"))
    df.join(cuts, groupCol)
      .withColumn("fence_lo", col("__q1") - (col("__q3") - col("__q1")) * k)
      .withColumn("fence_hi", col("__q3") + (col("__q3") - col("__q1")) * k)
      .withColumn("is_outlier",
        col(valueCol) < col("fence_lo") || col(valueCol) > col("fence_hi"))
      .drop("__q1", "__q3")
  }

  /** Per-group MAD (median-absolute-deviation) robust z-scores: each
    * row gets `0.6745·|x − med|/MAD` against ITS GROUP's exact
    * interpolated median, plus an outlier flag at `threshold` (3.5 is
    * the Iglewicz–Hoaglin convention). The robust companion to
    * [[tukeyOutliers]]: immune to the outliers it hunts, where
    * mean/stddev z-scores are dragged by them. Appends (group_median,
    * group_mad, robust_z, is_outlier).
    *
    * Scale shape: BOTH percentile passes ride ONE hash exchange on
    * the group as unbounded-frame window aggregates — zero joins,
    * one scan (the agg+join-back formulation plans two scans of the
    * input and a join whose build side Spark picks by guesswork —
    * probed at sf0.01 it broadcast the RAW side). Exact `percentile`
    * holds a per-group sorted digest — at extreme per-group
    * cardinality swap in `approx_percentile`, trading bit-exactness
    * for a bounded-memory sketch.
    *
    * Degenerate groups (MAD = 0 — at least half the values equal the
    * median, common for discrete/cent data) are well-defined, never a
    * div-by-zero: the score falls back to the mean absolute deviation
    * per Iglewicz–Hoaglin (`0.7979·|x − med|/meanAD`), and to 0 when
    * even that is 0 (all values identical). Without the branch Spark
    * yields null and IEEE-division engines yield Infinity — genuine
    * outliers in such groups would go silently unflagged, and the
    * statistic would diverge cross-engine.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.5): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    requireNoReserved(df, Seq("group_median", "group_mad", "__dev",
      "__meanad", "robust_z", "is_outlier"))
    val w = Window.partitionBy(groupCol)
    df.withColumn("group_median",
        percentile(col(valueCol), lit(0.5)).over(w))
      .withColumn("__dev", abs(col(valueCol) - col("group_median")))
      .withColumn("group_mad", percentile(col("__dev"), lit(0.5)).over(w))
      .withColumn("__meanad", avg(col("__dev")).over(w))
      .withColumn("robust_z",
        when(col("group_mad") > 0,
          lit(0.6745) * col("__dev") / col("group_mad"))
        .when(col("__meanad") > 0,
          lit(0.7979) * col("__dev") / col("__meanad"))
        .otherwise(lit(0.0)))
      .withColumn("is_outlier", col("robust_z") > threshold)
      .drop("__dev", "__meanad")
  }

  /** [[madOutliers]] with `approx_percentile` medians — the documented
    * 100 TB escape hatch made concrete: exact `percentile` holds every
    * group value in a sorted digest, so a whale group's window state is
    * O(group); the GK sketch is O(accuracy·log n) regardless of group
    * size, at a bounded rank error of n/accuracy per percentile.
    *
    * Law vs the exact form (spec-pinned): for odd-sized groups with
    * fewer rows than `accuracy`, the sketch is lossless and the exact
    * odd-count median interpolates nothing — the twins agree
    * BIT-FOR-BIT. Beyond that, the approx median is a real group value
    * whose rank is within n/accuracy of the true median rank, so
    * robust_z shifts by at most the local value gap over MAD — far-out
    * outliers (the ones worth flagging at 3.5σ) flag identically.
    */
  def madOutliersApprox(df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.5, accuracy: Int = 10000): DataFrame = {
    require(threshold > 0, "threshold must be positive")
    require(accuracy > 0, "accuracy must be positive")
    requireNoReserved(df, Seq("group_median", "group_mad", "__dev",
      "__meanad", "robust_z", "is_outlier"))
    val w = Window.partitionBy(groupCol)
    df.withColumn("group_median",
        percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).over(w)
          .cast("double"))
      .withColumn("__dev", abs(col(valueCol) - col("group_median")))
      .withColumn("group_mad",
        percentile_approx(col("__dev"), lit(0.5), lit(accuracy)).over(w)
          .cast("double"))
      .withColumn("__meanad", avg(col("__dev")).over(w))
      .withColumn("robust_z",
        when(col("group_mad") > 0,
          lit(0.6745) * col("__dev") / col("group_mad"))
        .when(col("__meanad") > 0,
          lit(0.7979) * col("__dev") / col("__meanad"))
        .otherwise(lit(0.0)))
      .withColumn("is_outlier", col("robust_z") > threshold)
      .drop("__dev", "__meanad")
  }

  /** Per-group two-sample Kolmogorov–Smirnov statistic between the
    * rows flagged by `flagCol` (=1) and the rest: D = max over the
    * merged value domain of |F̂₁(v) − F̂₂(v)|. The nonparametric
    * drift detector — sensitive to ANY distribution change (location,
    * scale, shape), no binning choices — beside the binned PSI in the
    * catalog's `psi_drift`; the standard train-vs-serve and
    * before-vs-after gate.
    *
    * Exactness: both empirical CDFs stay INTEGER cumulative counts,
    * and D is maximized in cross-multiplied integer form
    * max|c₁·n₂ − c₂·n₁| before ONE final division by n₁·n₂ — no
    * float comparison ever decides the max, so the statistic is
    * bit-deterministic (c·n ≤ n₁·n₂ ≈ 10¹⁶ at 10⁸ rows per side —
    * long-safe). Returns (groupCol, n1, n2, ks_stat).
    *
    * Scale shape: a (group, value) rollup, a cumulative window
    * PARTITIONED BY GROUP over that rollup (distinct values per
    * group, not raw rows), and a per-group max — one exchange on the
    * group key reused end-to-end after the rollup.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
      flagCol: String): DataFrame = {
    requireNoReserved(df, Seq("__v", "__s1", "__c1", "__c2", "__f1",
      "__f2", "__d", "n1", "n2", "ks_stat"))
    val x = df.select(col(groupCol), col(valueCol).as("__v"),
      when(col(flagCol).cast("int") === 1, 1L).otherwise(0L).as("__s1"))
    val n = x.groupBy(col(groupCol))
      .agg(sum("__s1").as("n1"), sum(lit(1L) - col("__s1")).as("n2"))
    val pv = x.groupBy(col(groupCol), col("__v"))
      .agg(sum("__s1").as("__c1"), sum(lit(1L) - col("__s1")).as("__c2"))
    val w = Window.partitionBy(groupCol).orderBy("__v")
    val cum = pv
      .withColumn("__f1", sum("__c1").over(w))
      .withColumn("__f2", sum("__c2").over(w))
    cum.join(n, groupCol)
      .groupBy(col(groupCol))
      .agg(max("n1").as("n1"), max("n2").as("n2"),
        max(abs(col("__f1") * col("n2") - col("__f2") * col("n1")))
          .as("__d"))
      .select(col(groupCol), col("n1"), col("n2"),
        round(col("__d").cast("double") / (col("n1") * col("n2")), 6)
          .as("ks_stat"))
  }

  /** Per-group Lorenz-curve points: cumulative value share at each
    * of `buckets` equal-population quantile boundaries, members
    * ranked ascending by value — the curve whose area deficit IS
    * [[giniByGroup]]'s coefficient, kept as plottable points ("the
    * bottom 50% of orders carry 19% of revenue"). Values are exact
    * long cents; each share is one integer/integer division, rounded
    * once. `ntile` follows the SQL-standard larger-buckets-first
    * fill on the deterministic (value, tieCol) order. Returns
    * (groupCol, bucket, cum_share).
    *
    * Scale shape: one exchange on the group (the ntile window), a
    * (group, bucket) rollup that reuses it, and cumulative/total
    * windows over the `buckets`-row-per-group AGGREGATE. Per-group
    * parallelism is window-bounded, as in [[giniByGroup]].
    */
  def lorenzPoints(df: DataFrame, groupCol: String, tieCol: String,
      valueCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    requireNoReserved(df, Seq("__v", "bucket", "__dv", "__cum", "__tot",
      "cum_share"))
    val x = df.select(col(groupCol), col(tieCol),
      round(col(valueCol) * 100).cast("long").as("__v"))
    val r = x.withColumn("bucket",
      ntile(buckets).over(Window.partitionBy(groupCol)
        .orderBy(col("__v"), col(tieCol))))
    val s = r.groupBy(col(groupCol), col("bucket"))
      .agg(sum("__v").as("__dv"))
    s.withColumn("__cum", sum("__dv").over(
        Window.partitionBy(groupCol).orderBy("bucket")))
      .withColumn("__tot", sum("__dv").over(Window.partitionBy(groupCol)))
      .select(col(groupCol), col("bucket").cast("int").as("bucket"),
        round(col("__cum").cast("double") / col("__tot"), 6)
          .as("cum_share"))
  }

  /** Global chi-square independence test with Cramér's V effect size
    * over two categorical columns — the one-row "are these related,
    * and how strongly" summary above [[chiSquare]]'s per-cell
    * decomposition (χ² grows with n; V ∈ [0,1] doesn't). Returns one
    * row: (chi2, cramers_v, n_rows, dof).
    *
    * Zero cells (pairs that never co-occur) carry a real χ²
    * contribution — (0−e)²/e = e — but never materialize in a
    * groupBy over observed data, so the statistic is computed via the
    * algebraic identity Σ_all (o−e)²/e = Σ_observed o²/e − n (the
    * missing cells' Σe folds into the −n term because marginals sum
    * to n): exact over the FULL r·c grid while only ever touching
    * observed cells. A naive observed-only sum understates
    * association — a perfect 2×2 diagonal would score V≈0.72, not 1.
    *
    * Determinism: χ² is a sum of per-cell doubles, and float addition
    * order would make it engine-dependent — so the cell terms are
    * collected into a SORTED array (by cell key) and folded in that
    * fixed order; the per-term arithmetic is written in one fixed
    * operation order. The array holds ≤ r·c cells — bounded by
    * category cardinalities, never by data size.
    *
    * Scale shape: one (a,b) cell rollup; marginals and the total ride
    * the cell aggregate (branches consume the cell count, as
    * [[mutualInfo]]); the final fold runs over the tiny cell array.
    */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    requireNoReserved(df, Seq("__o", "__na", "__nb", "__n", "__r", "__c",
      "__e", "__t", "chi2", "cramers_v", "n_rows", "dof"))
    // marginals/total are plain re-aggregations of the cell table and
    // BROADCAST back (as mutualInfo): the explicit broadcasts keep all
    // three consumers joining against BroadcastExchange(agg(cell)), so
    // the one big cell exchange is planned once and ReusedExchange
    // everywhere else — without them the planner re-derived the cell
    // subtree per consumer and the inputs were scanned 3× (caught by
    // the PlanSpec reuse pin). The up-front null filter is ALSO a
    // reuse requirement, not just the "null is not a category"
    // convention: without it the marginal joins push DIFFERENT
    // IsNotNull predicates into each consumer's copy of the cell
    // subtree (ma's carries isnotnull(a), mb's isnotnull(b), terms'
    // both), the canonical forms diverge, and ReusedExchange never
    // fires. sum(__o) needs no __o > 0 guard: cell counts are ≥ 1 by
    // construction.
    val cell = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("__o"))
    val ma = cell.groupBy(aCol).agg(sum(col("__o")).as("__na"))
    val mb = cell.groupBy(bCol).agg(sum(col("__o")).as("__nb"))
    val tot = cell.agg(sum(col("__o")).as("__n"),
      count_distinct(col(aCol)).as("__r"),
      count_distinct(col(bCol)).as("__c"))
    val terms = cell.join(broadcast(ma), aCol).join(broadcast(mb), bCol)
      .crossJoin(broadcast(tot))
      .withColumn("__e",
        col("__na").cast("double") * col("__nb") / col("__n"))
      .withColumn("__t",
        col("__o").cast("double") * col("__o") / col("__e"))
    terms
      .agg((aggregate(
          sort_array(collect_list(struct(col(aCol), col(bCol),
            col("__t")))),
          lit(0.0), (acc, s) => acc + s.getField("__t"))
          - max("__n")).as("chi2"),
        max("__n").as("n_rows"), max("__r").as("__r"),
        max("__c").as("__c"))
      .select(round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") /
          (col("n_rows") * (least(col("__r"), col("__c")) - 1))), 6)
          .as("cramers_v"),
        col("n_rows"),
        ((col("__r") - 1) * (col("__c") - 1)).cast("int").as("dof"))
  }

  /** Per-group Wald–Wolfowitz runs test on the date-ordered daily
    * value series: is the sequence of above/below-median days random,
    * or does it cluster (momentum) / alternate (over-correction)?
    * Days equal to the exact interpolated median are excluded (the
    * standard convention). The run count and both sign counts are
    * exact integers; only the final z normalization is double, in one
    * fixed operation order. Returns (groupCol, n1, n2, runs, z).
    *
    * Scale shape: a daily rollup, then ONE exchange on the group —
    * the median (window percentile), the lag comparison, and the
    * final rollup all ride that same partitioning.
    */
  def runsTest(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String): DataFrame =
    runsTestImpl(df, groupCol, dateCol, valueCol,
      v => percentile(v, lit(0.5)))

  /** [[runsTest]] with an `approx_percentile` median — the bounded-
    * memory twin for extreme day-count groups (same trade as
    * [[madOutliersApprox]]: GK sketch state O(accuracy·log n) instead
    * of the exact window's per-group sorted digest). The approx median
    * is a REAL daily value within n/accuracy ranks of the true median;
    * day counts shift by at most that rank error, and for odd-sized
    * groups under `accuracy` rows the twins agree bit-for-bit
    * (spec-pinned law).
    */
  def runsTestApprox(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String, accuracy: Int = 10000): DataFrame = {
    require(accuracy > 0, "accuracy must be positive")
    runsTestImpl(df, groupCol, dateCol, valueCol,
      v => percentile_approx(v, lit(0.5), lit(accuracy)))
  }

  private def runsTestImpl(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String, median: Column => Column): DataFrame = {
    requireNoReserved(df, Seq("__day", "__v", "__med", "__up", "__brk",
      "n1", "n2", "runs", "z"))
    val daily = df
      .select(col(groupCol),
        epochDay(dateCol).as("__day"),
        round(col(valueCol) * 100).cast("long").as("__v"))
      .groupBy(col(groupCol), col("__day"))
      .agg(sum("__v").as("__v"))
    val wg = Window.partitionBy(groupCol)
    val wd = Window.partitionBy(groupCol).orderBy("__day")
    val signed = daily
      // cast AFTER .over — a cast wrapped around the aggregate would
      // hide it from the window resolver (MISSING_GROUP_BY); for the
      // exact percentile the cast is a no-op (already double)
      .withColumn("__med", median(col("__v")).over(wg).cast("double"))
      .filter(col("__v") =!= col("__med"))
      .withColumn("__up", (col("__v") > col("__med")).cast("long"))
    val runs = signed
      .withColumn("__brk",
        when(lag(col("__up"), 1).over(wd).isNull ||
          lag(col("__up"), 1).over(wd) =!= col("__up"), 1L).otherwise(0L))
      .groupBy(col(groupCol))
      .agg(sum("__up").as("n1"), sum(lit(1L) - col("__up")).as("n2"),
        sum("__brk").as("runs"))
    runs.select(col(groupCol), col("n1"), col("n2"), col("runs"),
      round(
        (col("runs").cast("double") -
          (lit(2.0) * col("n1") * col("n2") / (col("n1") + col("n2"))
            + 1)) /
        sqrt(lit(2.0) * col("n1") * col("n2") *
          (lit(2.0) * col("n1") * col("n2") - col("n1") - col("n2")) /
          ((col("n1") + col("n2")).cast("double") *
            (col("n1") + col("n2")) * (col("n1") + col("n2") - 1))), 6)
        .as("z"))
  }

  /** Conversion-lag histogram: for each user whose first `toType`
    * event lands at or after their first `fromType` event, bucket the
    * elapsed time and count users per bucket. The "how long does
    * signup→purchase take" distribution, as one pass.
    *
    * Shuffle shape: ONE hash exchange on the user (both conditional
    * mins stack as windows on the same partitioning, the per-user
    * collapse reuses it), then a tiny bucket rollup.
    */
  def conversionLag(ev: DataFrame, userCol: String, typeCol: String,
      tsCol: String, fromType: String, toType: String,
      bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    requireNoReserved(ev, Seq("__t", "__t0", "__t1"))
    val w = Window.partitionBy(userCol)
    ev.select(col(userCol), col(typeCol), col(tsCol).cast("long").as("__t"))
      .withColumn("__t0",
        min(when(col(typeCol) === lit(fromType), col("__t"))).over(w))
      .withColumn("__t1",
        min(when(col(typeCol) === lit(toType) && col("__t") >= col("__t0"),
          col("__t"))).over(w))
      .groupBy(userCol).agg(max("__t0").as("__t0"), max("__t1").as("__t1"))
      .filter(col("__t0").isNotNull && col("__t1").isNotNull)
      .select((((col("__t1") - col("__t0")) / bucketSeconds).cast("long"))
        .as("lag_bucket"))
      .groupBy("lag_bucket").agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event
    * sequences: for every observed (from_type, to_type) adjacency in a
    * user's time-ordered event stream, the transition count and the
    * row-conditional probability p(to | from) = n(from→to) / n(from→*).
    * The event-stream analogue of token bigram stats — the input to
    * next-action prediction, anomaly scoring (improbable transitions)
    * and session simulation. `idCol` breaks same-timestamp ties so the
    * sequence — and therefore the matrix — is deterministic.
    *
    * Scale shape: ONE user-key exchange+sort for the adjacency window
    * (the unavoidable sequence reconstruction), then a count
    * aggregation down to at most |types|² rows; the from-marginal
    * re-aggregates THAT tiny table and broadcasts back, so raw events
    * are read once.
    */
  def markovTransitions(ev: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    requireNoReserved(ev, Seq("__t", "__next", "n_trans", "__from_n"))
    val w = Window.partitionBy(userCol)
      .orderBy(col("__t"), col(idCol))
    val adj = ev.filter(col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol),
        col(tsCol).cast("long").as("__t"), col(idCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
    val trans = adj
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val fromN = trans.groupBy("from_type")
      .agg(sum("n_trans").as("__from_n"))
    trans.join(broadcast(fromN), "from_type")
      .select(col("from_type"), col("to_type"), col("n_trans"),
        round(col("n_trans").cast("double") /
          col("__from_n").cast("double"), 6).as("p"))
  }

  /** Chi-square contingency decomposition for two categoricals: one
    * row per observed (a, b) cell with observed count, expected count
    * under independence (row·col/n), and the cell's χ² contribution —
    * sum `chi2_contrib` for the test statistic (df =
    * (|A|−1)(|B|−1); map to a p-value in your stats library).
    *
    * Scale shape: one (a, b) count aggregation, two marginal
    * re-aggregations of THAT (already tiny) table, broadcast joins
    * back — the raw data is read once.
    */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    requireNoReserved(df, Seq("observed", "__ra", "__cb", "__n"))
    val obs = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA), col(colB)).agg(count(lit(1)).as("observed"))
    val ra = obs.groupBy(colA).agg(sum("observed").as("__ra"))
    val cb = obs.groupBy(colB).agg(sum("observed").as("__cb"))
    val n = obs.agg(sum("observed").as("__n"))
    // the FULL marginal grid, not just observed cells: a zero cell
    // under a non-zero expectation contributes (0−e)²/e, and dropping
    // those understates the statistic exactly where association is
    // strongest
    val grid = broadcast(ra).crossJoin(broadcast(cb))
    val expected = col("__ra") * col("__cb") / col("__n")
    grid.join(obs, Seq(colA, colB), "left")
      .crossJoin(broadcast(n))
      .select(col(colA), col(colB),
        coalesce(col("observed"), lit(0L)).as("observed"),
        round(expected, 6).as("expected"),
        round(pow(coalesce(col("observed"), lit(0L)) - expected, 2) /
          expected, 6).as("chi2_contrib"))
  }

  /** Mutual-information decomposition for two categoricals — the
    * feature-selection companion to [[chiSquare]]: one row per
    * OBSERVED (a, b) cell with its count, pointwise mutual
    * information ln(p(a,b)/(p(a)p(b))) and the cell's MI contribution
    * p(a,b)·pmi — sum `mi_contrib` for I(A;B) in nats. Unlike χ²,
    * empty cells contribute exactly 0 (lim p→0 of p·ln p), so the
    * observed-cell set IS the full decomposition.
    *
    * Scale shape: one (a, b) count aggregation, marginals
    * re-aggregated from THAT (already tiny) cell table and broadcast
    * back — the raw data is read once. All ratios are computed as
    * double products of exact integer counts (n·N / n_a·n_b), never
    * chained divisions, so the oracle can reproduce them bit-for-bit.
    */
  def mutualInfo(df: DataFrame, colA: String, colB: String): DataFrame = {
    requireNoReserved(df, Seq("n_xy", "__na", "__nb", "__n"))
    val cell = df.filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA), col(colB)).agg(count(lit(1)).as("n_xy"))
    val ma = cell.groupBy(colA).agg(sum("n_xy").as("__na"))
    val mb = cell.groupBy(colB).agg(sum("n_xy").as("__nb"))
    val n = cell.agg(sum("n_xy").as("__n"))
    val pmi = log(col("n_xy").cast("double") * col("__n").cast("double") /
      (col("__na").cast("double") * col("__nb").cast("double")))
    cell.join(broadcast(ma), colA).join(broadcast(mb), colB)
      .crossJoin(broadcast(n))
      .select(col(colA), col(colB), col("n_xy"),
        round(pmi, 6).as("pmi"),
        round(col("n_xy").cast("double") / col("__n").cast("double") * pmi,
          6).as("mi_contrib"))
  }

  /** Market-concentration report: per market, the number of players,
    * the Herfindahl–Hirschman index (Σ share², 1/n = perfect
    * competition … 1 = monopoly) and the top player's share, over
    * integer-cent revenue units (exact longs — double-sum ulps can't
    * flip shares). Returns (marketCol, n_players, hhi, top_share).
    *
    * Scale shape: one (market, player) revenue aggregation, then a
    * per-market re-aggregation of that (players ≪ rows) table — raw
    * data read once, no windows.
    */
  def marketConcentration(df: DataFrame, marketCol: String,
      playerCol: String, valueCol: String): DataFrame = {
    requireNoReserved(df, Seq("__rev", "__tot"))
    val rev = df.groupBy(col(marketCol), col(playerCol))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("__rev"))
    // squares leave long range (1e10 cents² ≫ 2⁶³) → double powers;
    // the ratio's last-ulp order sensitivity is ~1e-16, safely under
    // the 6 dp rounding
    rev.groupBy(marketCol)
      .agg(count(lit(1)).as("n_players"),
        round(sum(pow(col("__rev").cast("double"), 2)) /
          pow(sum("__rev").cast("double"), 2), 6).as("hhi"),
        round(max("__rev") / sum("__rev").cast("double"), 6)
          .as("top_share"))
  }

  /** Per-group Gini coefficient over exact integer-cent values — the
    * inequality companion to [[marketConcentration]]'s HHI: 0 = every
    * player equal, →1 = one player holds everything. Uses the sorted
    * rank form G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx) (i = 1..n ascending); ties
    * on value are rank-order invariant (equal x makes the tied block's
    * coefficient sum independent of within-block order), so the
    * id-tiebroken sort is deterministic AND the statistic is
    * well-defined. Returns (groupCol, n_players, gini).
    *
    * Scale shape: one (group, player) exact-cent revenue rollup, one
    * per-group window sort of THAT (players ≪ rows) table for ranks,
    * one re-aggregation; the weighted sum accumulates in
    * decimal(38,0), so no long overflow at any n. Raw rows read once.
    */
  def giniByGroup(df: DataFrame, groupCol: String, playerCol: String,
      valueCol: String): DataFrame = {
    requireNoReserved(df, Seq("__rev", "__rk", "__s0", "__s1",
      "n_players", "gini"))
    val rev = df.groupBy(col(groupCol), col(playerCol))
      .agg(sum(round(col(valueCol) * 100).cast("long")).as("__rev"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__rev"), col(playerCol))
    // Σ(2i−n−1)x₍ᵢ₎ rearranged to 2·Σi·x − (n+1)·Σx so a single
    // aggregation needs no per-row knowledge of n
    rev.withColumn("__rk", row_number().over(w))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_players"),
        sum(col("__rev").cast("decimal(38,0)")).as("__s0"),
        sum(col("__rk").cast("decimal(38,0)") *
          col("__rev").cast("decimal(38,0)")).as("__s1"))
      .select(col(groupCol), col("n_players"),
        round(
          (lit(2).cast("decimal(38,0)") * col("__s1") -
            (col("n_players") + lit(1)).cast("decimal(38,0)") *
              col("__s0")).cast("double") /
          (col("n_players").cast("decimal(38,0)") * col("__s0"))
            .cast("double"),
          6).as("gini"))
  }

  /** Distributed ROC AUC (Mann-Whitney U with tie correction) of an
    * integer-grid score against a boolean label: AUC = (#concordant
    * pairs (score_pos > score_neg) + ½·#tied pairs) / (P·N), computed
    * from the SCORE HISTOGRAM — never a global rank sort. Scores must
    * arrive pre-quantized to an integer grid (the catalog entry uses
    * micro-units, round(score·1e6)); ties are then well-defined and
    * cross-engine exact, and both pair counts are exact integers — the
    * final division is the only float op. Returns one row
    * (n_pos, n_neg, auc, gini) with gini = 2·AUC−1, both rounded to
    * 6 dp; auc/gini are null when either class is empty.
    *
    * Scale shape (the zipfSlope two-level prefix-sum doctrine): the
    * histogram groupBy reduces the corpus map-side to ≤|score grid|
    * rows — a micro-unit score in [−1, 1] has ≤2e6+1 distinct values
    * REGARDLESS of corpus size. The "negatives strictly below" prefix
    * sum then runs bucketed: per-bucket windows over ~|grid|/nBuckets
    * rows plus a ≤nBuckets-row triangular broadcast join for bucket
    * offsets — no single-partition window anywhere, even over the
    * histogram. Pair counts accumulate in decimal(38,0) (P·N
    * overflows long past ~3e9 rows per class). Bucket boundaries
    * don't touch the result (any split yields the same prefix sums),
    * so nBuckets is a pure parallelism knob.
    */
  def rocAuc(df: DataFrame, scoreIntCol: String, labelCol: String,
      nBuckets: Int = 512): DataFrame = {
    require(nBuckets >= 1, "need nBuckets >= 1")
    requireNoReserved(df, Seq("__s", "__y", "__pos", "__neg", "__lo",
      "__hi", "__b", "__pb", "__pn2", "__boff", "__nb", "__conc",
      "__tied", "n_pos", "n_neg", "auc", "gini"))
    val dec = "decimal(38,0)"
    val hist = df
      .select(col(scoreIntCol).cast("long").as("__s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy("__s")
      .agg(sum("__y").as("__pos"),
        (count(lit(1)) - sum("__y")).as("__neg"))
    // equal-width score-range buckets (integer math: width = range div
    // nBuckets + 1 keeps ids in [0, nBuckets)); the 1-row bounds agg
    // broadcasts. The caller's integer grid is micro-unit-scale, far
    // from the (__s − __lo)·overflow regime.
    // The when() predicates below are always true (__pos/__neg are
    // counts ≥ 0) but genuinely CONSUME the histogram's aggregate
    // columns, so every derived branch plans the IDENTICAL subtree and
    // reuses hist's exchange — without them column pruning
    // de-canonicalizes the copies and each branch re-scans and
    // re-scores the corpus (the tfidfTopTerms/zipfSlope lesson; for
    // this operator a re-scan re-computes the caller's per-row score).
    val live = col("__pos") + col("__neg") > 0
    val bounds = hist.agg(min(when(live, col("__s"))).as("__lo"),
      max(when(live, col("__s"))).as("__hi"))
    val bucketed = hist.crossJoin(broadcast(bounds))
      .withColumn("__b",
        expr(s"(__s - __lo) div (((__hi - __lo) div $nBuckets) + 1)")
          .cast("int"))
      .drop("__lo", "__hi")
    val bTot = bucketed.groupBy("__b")
      .agg(sum(when(col("__s").isNotNull && live, col("__neg")))
        .as("__pn"))
    val bOff = bTot
      .join(broadcast(bTot.select(col("__b").as("__pb"),
          col("__pn").as("__pn2"))),
        col("__pb") < col("__b"), "left")
      .groupBy("__b")
      // the __pn >= 0 guard (always true) keeps the LEFT side of the
      // triangular join consuming __pn — pruned away, its bTot copy
      // stops matching the broadcast side's and re-derives from a
      // fresh corpus scan
      .agg(coalesce(sum(when(col("__pn") >= 0, col("__pn2"))), lit(0L))
        .as("__boff"))
    val wB = Window.partitionBy("__b").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBelow = bucketed.join(broadcast(bOff), Seq("__b"))
      .withColumn("__nb",
        col("__boff") + coalesce(sum("__neg").over(wB), lit(0L)))
    val pn = col("n_pos").cast(dec) * col("n_neg").cast(dec)
    val num = lit(2).cast(dec) * col("__conc") + col("__tied")
    withBelow.agg(
        sum("__pos").as("n_pos"), sum("__neg").as("n_neg"),
        sum(col("__pos").cast(dec) * col("__nb").cast(dec)).as("__conc"),
        sum(col("__pos").cast(dec) * col("__neg").cast(dec)).as("__tied"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(num.cast("double") /
            (lit(2).cast(dec) * pn).cast("double"), 6)).as("auc"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((num - pn).cast("double") / pn.cast("double"), 6))
          .as("gini"))
  }

  /** Reliability-diagram calibration bins of a micro-unit probability
    * score (an integer in [0, 1e6]) against a boolean label:
    * equal-width bins over [0, 1], per bin the support, positive
    * count, mean predicted score, and empirical positive rate — the
    * table a calibration plot / ECE computation reads. Bin assignment
    * is pure integer math (score·bins div 1e6, clamped into [0, bins)
    * — the low clamp also removes the only spot where Spark's
    * truncating `div` and DuckDB's flooring `//` could diverge, on
    * out-of-contract negative scores), so no float boundary can flip
    * a row across
    * engines; the mean and rate are exact integer sums with a single
    * final division each, rounded to 6 dp. Empty bins are absent.
    *
    * Scale shape: ONE map-side-combinable groupBy on ≤`bins` keys —
    * the score sum rides decimal(38,0) so a 1e12-row bin cannot
    * overflow long.
    */
  def calibrationBins(df: DataFrame, scoreMicroCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, "need bins >= 1")
    requireNoReserved(df, Seq("bin", "__sm", "__y", "__ssum", "n",
      "n_pos", "mean_score", "pos_rate"))
    val dec = "decimal(38,0)"
    df.select(
        least(greatest(expr(s"(`$scoreMicroCol` * $bins) div 1000000"),
          lit(0L)), lit(bins - 1).cast("long")).cast("int").as("bin"),
        col(scoreMicroCol).cast("long").as("__sm"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"),
        sum(col("__sm").cast(dec)).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__ssum").cast("double") /
          (col("n").cast(dec) * lit(1000000).cast(dec)).cast("double"), 6)
          .as("mean_score"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"))
  }

  /** Expected calibration error over the [[calibrationBins]] table,
    * collapsed to one row (n, ece): ECE = Σ_b (n_b/N)·|pos_rate_b −
    * mean_score_b|. The float-free form the operator actually sums is
    * Σ_b |n_pos_b·1e6 − Σ_b score_micro| / (N·1e6) — the per-bin
    * numerator is an EXACT integer (micro-unit scores make the two
    * rates commensurable), so the bin sum is order-free and the single
    * final division is the only float op, rounded to 6 dp. Returns
    * ece = null on empty input.
    *
    * Scale shape: identical to [[calibrationBins]] — one
    * map-side-combinable groupBy on ≤`bins` keys, then a ≤`bins`-row
    * final fold; sums ride decimal(38,0) so a 1e12-row bin cannot
    * overflow long.
    */
  def expectedCalibrationError(df: DataFrame, scoreMicroCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, "need bins >= 1")
    requireNoReserved(df, Seq("__bin", "__sm", "__y", "__n", "__pos",
      "__ssum", "__num", "n", "ece"))
    val dec = "decimal(38,0)"
    df.select(
        least(greatest(expr(s"(`$scoreMicroCol` * $bins) div 1000000"),
          lit(0L)), lit(bins - 1).cast("long")).cast("int").as("__bin"),
        col(scoreMicroCol).cast("long").as("__sm"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy("__bin")
      .agg(count(lit(1)).as("__n"), sum("__y").as("__pos"),
        sum(col("__sm").cast(dec)).as("__ssum"))
      .agg(sum("__n").as("n"),
        sum(abs(col("__pos").cast(dec) * lit(1000000).cast(dec)
          - col("__ssum"))).as("__num"))
      .select(col("n"),
        when(col("n") > 0,
          round(col("__num").cast("double") /
            (col("n").cast(dec) * lit(1000000).cast(dec)).cast("double"),
            6)).as("ece"))
  }

  /** Distributed PR-AUC (average precision, step interpolation) of an
    * integer-grid score against a boolean label, from the SCORE
    * HISTOGRAM — the precision-recall companion of [[rocAuc]], same
    * no-global-sort doctrine. Walking distinct scores descending,
    * AP = Σ_s (pos_s/P)·precision(s) with precision(s) =
    * cumPos(s)/cumTot(s) over scores ≥ s (ties enter together — the
    * histogram form's natural tie rule). The contract is the exact
    * integer micro-unit form: each threshold contributes
    * (pos_s·cumPos(s)·1e6) div cumTot(s) — floor division of exact
    * integers, so the per-threshold terms are order-free integers
    * (≤1e-6 quantization each, bounded by the grid size) and both
    * engines agree bit-for-bit; ap = Σ/(P·1e6) is the single float
    * division, rounded to 6 dp. Returns one row (n_pos, n_neg, ap);
    * ap is null when there are no positives.
    *
    * Scale shape: mirrors [[rocAuc]] — histogram groupBy bounded by
    * the score grid, then BUCKETED descending-inclusive prefix sums
    * (per-bucket windows over ~|grid|/nBuckets rows + a ≤nBuckets-row
    * triangular broadcast join); pair products ride decimal(38,0).
    * The always-true when() guards keep every derived branch consuming
    * the histogram's aggregate columns so the exchange is reused (the
    * rocAuc canonical-form lesson).
    */
  def prAuc(df: DataFrame, scoreIntCol: String, labelCol: String,
      nBuckets: Int = 512): DataFrame = {
    require(nBuckets >= 1, "need nBuckets >= 1")
    requireNoReserved(df, Seq("__s", "__y", "__pos", "__tot", "__lo",
      "__hi", "__b", "__pb", "__bp", "__bt", "__bp2", "__bt2", "__opos",
      "__otot", "__cpos", "__ctot", "__term", "n_pos", "n_neg", "ap"))
    val dec = "decimal(38,0)"
    val hist = df
      .select(col(scoreIntCol).cast("long").as("__s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("__y"))
      .groupBy("__s")
      .agg(sum("__y").as("__pos"), count(lit(1)).as("__tot"))
    val live = col("__tot") > 0
    val bounds = hist.agg(min(when(live, col("__s"))).as("__lo"),
      max(when(live, col("__s"))).as("__hi"))
    val bucketed = hist.crossJoin(broadcast(bounds))
      .withColumn("__b",
        expr(s"(__s - __lo) div (((__hi - __lo) div $nBuckets) + 1)")
          .cast("int"))
      .drop("__lo", "__hi")
    val bTot = bucketed.groupBy("__b")
      .agg(sum(when(col("__s").isNotNull && live, col("__pos")))
          .as("__bp"),
        sum(when(col("__s").isNotNull && live, col("__tot"))).as("__bt"))
    // offsets come from HIGHER buckets (descending-inclusive sums)
    val bOff = bTot
      .join(broadcast(bTot.select(col("__b").as("__pb"),
          col("__bp").as("__bp2"), col("__bt").as("__bt2"))),
        col("__pb") > col("__b"), "left")
      .groupBy("__b")
      .agg(coalesce(sum(when(col("__bp") >= 0, col("__bp2"))), lit(0L))
          .as("__opos"),
        coalesce(sum(when(col("__bt") >= 0, col("__bt2"))), lit(0L))
          .as("__otot"))
    val wB = Window.partitionBy("__b").orderBy(desc("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = bucketed.join(broadcast(bOff), Seq("__b"))
      .withColumn("__cpos", col("__opos") + sum("__pos").over(wB))
      .withColumn("__ctot", col("__otot") + sum("__tot").over(wB))
    val term = expr("cast(__pos as decimal(38,0)) " +
      "* cast(__cpos as decimal(38,0)) * cast(1000000 as decimal(38,0)) " +
      "div cast(__ctot as decimal(38,0))")
    withCum.agg(sum("__pos").as("n_pos"),
        (sum("__tot") - sum("__pos")).as("n_neg"),
        sum(term.cast(dec)).as("__term"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0,
          round(col("__term").cast("double") /
            (col("n_pos").cast(dec) * lit(1000000).cast(dec))
              .cast("double"), 6)).as("ap"))
  }

  /** Micro-unit DCG discount table for [[retrievalEval]]: D(r) =
    * round(1e6 / log2(r+1)). Computed ONCE here and inlined as
    * literals into BOTH the Spark plan and (via the catalog's SQL
    * interpolation) the DuckDB oracle, so no cross-engine log2 ulp
    * can ever drift a discount — the constants ARE the contract.
    */
  private[engine] def ndcgDiscounts(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** Ranked-retrieval quality per query: hits@k, precision@k,
    * recall@k, and NDCG@k (binary relevance). `ranked` carries one row
    * per (queryCol, idCol, rank ≤ k) candidate; `relevant` the
    * ground-truth (queryCol, idCol) pairs. DCG uses the micro-unit
    * integer discount table [[ndcgDiscounts]] — relevance hits sum
    * exact integers (order-free under Spark's nondeterministic partial
    * aggregation), the ideal DCG is a prefix-sum lookup at
    * min(k, |relevant|), and each displayed stat is one final
    * division rounded to 6 dp. ndcg/recall are null when a query has
    * no relevant documents. Returns
    * (queryCol, n_relevant, hits, precision_k, recall_k, ndcg).
    *
    * Scale shape: one keyed left join of the k·|Q|-row rank table
    * against the relevant pairs (both keyed exchanges; the rank table
    * is tiny, the pairs table shuffles once), one |Q|-group rollup of
    * each — no window, no per-rank driver logic; the discount tables
    * ride the plan as ≤k-element literals.
    */
  def retrievalEval(ranked: DataFrame, relevant: DataFrame,
      queryCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    requireNoReserved(ranked, Seq("__rel", "__d", "__hits", "__dcg",
      "__m", "__idcg", "n_relevant", "hits", "precision_k", "recall_k",
      "ndcg"))
    val discounts = ndcgDiscounts(k)
    val prefix = discounts.scanLeft(0L)(_ + _).tail // Σ_{r≤m} D(r)
    val rel1 = relevant.select(col(queryCol), col(idCol),
      lit(1L).as("__rel"))
    val totals = rel1.groupBy(queryCol)
      .agg(sum("__rel").as("n_relevant"))
    val perQuery = ranked
      .join(rel1, Seq(queryCol, idCol), "left")
      .withColumn("__d",
        element_at(typedLit(discounts), col("rank").cast("int")))
      .groupBy(queryCol)
      .agg(sum(coalesce(col("__rel"), lit(0L))).as("hits"),
        sum(coalesce(col("__rel"), lit(0L)) * col("__d")).as("__dcg"))
    perQuery.join(totals, Seq(queryCol), "left")
      .withColumn("n_relevant", coalesce(col("n_relevant"), lit(0L)))
      .withColumn("__m",
        least(col("n_relevant"), lit(k.toLong)).cast("int"))
      .withColumn("__idcg",
        when(col("__m") >= 1, element_at(typedLit(prefix), col("__m"))))
      .select(col(queryCol), col("n_relevant"), col("hits"),
        round(col("hits").cast("double") / lit(k.toDouble), 6)
          .as("precision_k"),
        when(col("n_relevant") > 0,
          round(col("hits").cast("double") /
            col("n_relevant").cast("double"), 6)).as("recall_k"),
        when(col("__idcg").isNotNull,
          round(col("__dcg").cast("double") /
            col("__idcg").cast("double"), 6)).as("ndcg"))
  }

  /** Reciprocal rank per query (the MRR building block): the rank of
    * the FIRST relevant candidate within the top-k ranking, and
    * rr = 1/first_rel_rank (0.0 when no relevant candidate makes the
    * cut — the standard convention). The division is the only float
    * op: 1/rank of an exact small int is exactly rounded identically
    * by both engines, then 6-dp displayed. Returns
    * (queryCol, first_rel_rank ≤ k | null, rr).
    *
    * Scale shape: one keyed left join of the k·|Q|-row rank table
    * against the relevant pairs + one |Q|-group min rollup — the
    * [[retrievalEval]] shape minus the discount lookup.
    */
  def mrrEval(ranked: DataFrame, relevant: DataFrame,
      queryCol: String, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    requireNoReserved(ranked, Seq("__rel", "first_rel_rank", "rr"))
    val rel1 = relevant.select(col(queryCol), col(idCol),
      lit(1L).as("__rel"))
    ranked.filter(col("rank") <= k)
      .join(rel1, Seq(queryCol, idCol), "left")
      .groupBy(queryCol)
      .agg(min(when(col("__rel").isNotNull, col("rank")))
        .cast("int").as("first_rel_rank"))
      .select(col(queryCol), col("first_rel_rank"),
        round(coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)), 6)
          .as("rr"))
  }

  /** Per-group Shannon entropy (nats) of a categorical mix — how
    * evenly a group spreads over the categories (0 = all one type,
    * ln k = uniform over k types). Uses the re-aggregation identity
    * H = ln n − (Σ c·ln c)/n so the per-cell counts fold straight
    * into the group rollup — no window, no join, no per-row p_i.
    * Returns (groupCol, n_types, n, entropy).
    *
    * Scale shape: one (group, type) count aggregation (partial
    * map-side combine), one re-aggregation of that already-reduced
    * cell table — raw rows read once, both exchanges keyed and
    * parallel. The double-sum term adds ≤|types| terms per group, so
    * parallel summation order cannot move the 6-decimal rounding.
    */
  def entropyByGroup(df: DataFrame, groupCol: String, typeCol: String)
      : DataFrame = {
    requireNoReserved(df, Seq("__c", "n_types", "n", "entropy"))
    df.groupBy(col(groupCol), col(typeCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_types"), sum("__c").as("n"),
        round(log(sum("__c").cast("double")) -
          sum(col("__c").cast("double") * log(col("__c").cast("double"))) /
            sum("__c").cast("double"), 6).as("entropy"))
  }

  /** Per-group OLS trend slope of a daily value series, computed from
    * EXACT integer sums — x = epoch day, y = the group's daily total
    * in integer cents — via slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²).
    * Per-row products x·y and x² fit comfortably in long (day ≈ 2·10⁴,
    * daily cents < 4·10¹⁴ before overflow risk); the SUMS accumulate
    * in decimal(38,0), so the statistic is bit-reproducible at any
    * parallelism — the one double operation is the final division.
    * Returns (groupCol, n_days, slope_per_day) with the slope in
    * value units (not cents) per day.
    *
    * Scale shape: one (group, day) aggregation of the raw rows, one
    * re-aggregation of the daily table (≤ calendar-days rows per
    * group, independent of raw row count). No window over the series.
    */
  def trendSlope(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    requireNoReserved(df, Seq("__x", "__y", "n_days", "__sx", "__sy",
      "__sxy", "__sxx", "slope_per_day"))
    val dec = "decimal(38,0)"
    val daily = df
      .select(col(groupCol),
        epochDay(dateCol).as("__x"),
        round(col(valueCol) * 100).cast("long").as("__y"))
      .groupBy(col(groupCol), col("__x"))
      .agg(sum("__y").as("__y"))
    daily.groupBy(groupCol)
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum((col("__x") * col("__y")).cast(dec)).as("__sxy"),
        sum((col("__x") * col("__x")).cast(dec)).as("__sxx"))
      .select(col(groupCol), col("n_days"),
        round(
          (col("n_days").cast(dec) * col("__sxy") -
            col("__sx") * col("__sy")).cast("double") /
          (col("n_days").cast(dec) * col("__sxx") -
            col("__sx") * col("__sx")).cast("double") / 100.0,
          6).as("slope_per_day"))
  }

  /** Per-group exponentially-weighted moving average of the daily
    * value series: ewma₁ = v₁, ewmaₜ = α·vₜ + (1−α)·ewmaₜ₋₁ over days
    * in order — the classic smoother for revenue/traffic dashboards
    * and the drift baseline anomaly detectors subtract. Returns
    * (groupCol, day, ewma) with `day` in epoch days.
    *
    * The recurrence is inherently sequential per series — no window
    * frame expresses it and no associative reformulation is
    * overflow-safe (the closed form needs (1−α)^(−t) weights, which
    * explode past t ≈ 700 in double) — so each group's ordered daily
    * series folds INSIDE aggregate HOFs over its collected array.
    * Scale shape: the corpus-sized work is the map-side-combinable
    * daily rollup; per-group state is then bounded by CALENDAR DAYS,
    * not data volume. The fold is TWO-LEVEL (blocks of 64 days, then
    * a fold over blocks): a flat fold's append-only accumulator
    * re-copies the whole array per element — O(L²) element moves,
    * billions at a 10-year series — while the blocked form moves
    * O(L·B + (L/B)²) ≈ thousands, with the SAME sequential chain of
    * double ops (re-association changes where array boundaries fall,
    * never the arithmetic order), so results stay bit-identical to
    * the naive fold and to the oracle's recursive CTE. Same posture
    * as [[resampleFill]]'s per-series state. Determinism: daily
    * totals are exact long cents; one double division at the end.
    */
  def ewmaSmooth(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    requireNoReserved(df, Seq("__x", "__y", "__xs", "__es", "__e",
      "day", "ewma"))
    // (1 − α) folded in the PLAN so the literal matches the oracle's
    // `(1 - 0.3)` bit-for-bit (1−0.3 ≠ the double literal 0.7)
    val beta = lit(1.0) - lit(alpha)
    val blockLen = 64
    // typed empty arrays (array().cast would carry NullType internals)
    val emptyBlock = filter(
      array(struct(lit(0L).as("d"), lit(0.0).as("e"))), _ => lit(false))
    val daily = df
      .select(col(groupCol), epochDay(dateCol).as("__x"),
        round(col(valueCol) * 100).cast("long").as("__y"))
      .groupBy(col(groupCol), col("__x"))
      .agg(sum("__y").as("__y"))
    val xs = col("__xs")
    val nBlocks = ceil(size(xs) / lit(blockLen.toDouble)).cast("int")
    val blocks = transform(sequence(lit(0), nBlocks - 1),
      b => slice(xs, b * blockLen + 1, lit(blockLen)))
    // outer fold over blocks: acc = (seeded?, carry, per-block outputs);
    // inner fold over one block: acc = (seeded?, carry, block output).
    // Per element the op is IDENTICAL to the naive fold — seed with v,
    // then α·v + (1−α)·prev — so the chain of IEEE ops is unchanged.
    val outerZero = struct(lit(false).as("s"), lit(0.0).as("p"),
      filter(array(emptyBlock), _ => lit(false)).as("out"))
    val folded = aggregate(blocks, outerZero, (oacc, blk) => {
      val innerZero = struct(oacc.getField("s").as("s"),
        oacc.getField("p").as("p"), emptyBlock.as("out"))
      val inner = aggregate(blk, innerZero, (acc, x) => {
        val e = when(!acc.getField("s"), x.getField("v").cast("double"))
          .otherwise(lit(alpha) * x.getField("v") +
            beta * acc.getField("p"))
        struct(lit(true).as("s"), e.as("p"),
          concat(acc.getField("out"),
            array(struct(x.getField("d").as("d"), e.as("e")))).as("out"))
      })
      struct(inner.getField("s").as("s"), inner.getField("p").as("p"),
        concat(oacc.getField("out"),
          array(inner.getField("out"))).as("out"))
    })
    daily.groupBy(groupCol)
      .agg(array_sort(collect_list(
        struct(col("__x").as("d"), col("__y").as("v")))).as("__xs"))
      .select(col(groupCol), explode(flatten(folded.getField("out")))
        .as("__e"))
      // emitted RAW (cents folded back to value units by one double
      // division): the fold's double sequence is fixed (no partial-agg
      // order to absorb), so the value is bit-deterministic — while
      // round-to-6 is NOT cross-engine-stable when the value sits
      // within an ulp of a .5 boundary (HALF_UP on the shortest decimal
      // repr vs binary rounding diverge there; 3 rows at sf0.01 did)
      .select(col(groupCol), col("__e.d").as("day"),
        (col("__e.e") / 100).as("ewma"))
  }

  /** Per-key inter-arrival statistics over an event stream: gap count,
    * mean gap (seconds) and the coefficient of variation of the gaps —
    * the burstiness fingerprint that separates organic users (CV ≈ 1,
    * memoryless) from bots and schedulers (CV ≪ 1, metronomic) and
    * from scrapers (CV ≫ 1, batchy) in training-data hygiene. Gaps are
    * exact microsecond longs; Σg and Σg² accumulate in decimal(38,0)
    * (a year-long gap squared overflows long), variance is the exact
    * n·Σg²−(Σg)² form over n(n−1), and only the final sqrt/divide is
    * double. Keys with fewer than 2 gaps are dropped (CV undefined).
    * Returns (keyCol, n_gaps, mean_gap_s, cv).
    *
    * Scale shape: ONE exchange on the key (the lag window), then the
    * per-key rollup reuses that partitioning — no second shuffle.
    */
  def interArrivalStats(ev: DataFrame, keyCol: String, tsCol: String,
      idCol: String): DataFrame = {
    requireNoReserved(ev, Seq("__us", "__gap", "n_gaps", "mean_gap_s",
      "__s1", "__s2", "cv"))
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(keyCol).orderBy(col("__us"), col(idCol))
    val gaps = ev
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(idCol))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__gap").isNotNull)
    gaps.groupBy(keyCol)
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__gap").cast(dec)).as("__s1"),
        sum(col("__gap").cast(dec) * col("__gap").cast(dec)).as("__s2"))
      .filter(col("n_gaps") >= 2)
      .select(col(keyCol), col("n_gaps"),
        round(col("__s1").cast("double") / col("n_gaps") / 1e6, 3)
          .as("mean_gap_s"),
        round(
          sqrt((col("n_gaps").cast(dec) * col("__s2") -
              col("__s1") * col("__s1")).cast("double") /
            (col("n_gaps") * (col("n_gaps") - 1))) /
          (col("__s1").cast("double") / col("n_gaps")), 6).as("cv"))
  }

  /** Per-key time-weighted average of a value column — each reading
    * weighted by how long it was "current" (until the key's next
    * event): Σ vᵢ·(tᵢ₊₁−tᵢ) / (tₙ−t₁). The right mean for sampled
    * gauges (price, queue depth, temperature) where the plain mean
    * over-weights busy periods. Values are exact integer cents,
    * durations exact microsecond longs, the weighted sum accumulates
    * in decimal(38,0); each key's final reading has no successor and
    * carries no weight. Keys with a single event are dropped (zero
    * total duration). Returns (keyCol, twap).
    *
    * Scale shape: ONE exchange on the key (the lead window), rollup
    * reuses the partitioning.
    */
  def timeWeightedAvg(ev: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, idCol: String): DataFrame = {
    requireNoReserved(ev, Seq("__us", "__v", "__t2", "__wv", "__wt",
      "twap"))
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(keyCol).orderBy(col("__us"), col(idCol))
    val spans = ev
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
        round(col(valueCol) * 100).cast("long").as("__v"), col(idCol))
      .withColumn("__t2", lead(col("__us"), 1).over(w))
      .filter(col("__t2").isNotNull)
    spans.groupBy(keyCol)
      .agg(sum(col("__v").cast(dec) * (col("__t2") - col("__us"))
          .cast(dec)).as("__wv"),
        sum((col("__t2") - col("__us")).cast(dec)).as("__wt"))
      .select(col(keyCol),
        round(col("__wv").cast("double") / col("__wt").cast("double")
          / 100.0, 6).as("twap"))
  }

  /** CUSUM level-shift detection over each group's daily count series:
    * for the cumulative sum Sₔ = Σ_{d'≤d} (cₔ' − μ) (μ = the group's
    * mean daily count), report the day where |Sₔ| peaks — the
    * classic changepoint locator (the peak of the CUSUM is the most
    * likely shift point). Computed in EXACT integers by scaling
    * through n: Sₔ·n = Σ (n·cₔ' − T) with n = #days, T = total count,
    * so the running sum is a long and the argmax is exact; the
    * reported peak is the scaled sum normalized by n·T ∈ [−1, 1]
    * (fraction of total volume displaced), rounded at 6. Ties break to the
    * earliest day. Returns (groupCol, shift_day, peak_cusum).
    *
    * Scale shape: the raw rows reduce to (group, day) cells once; the
    * per-group marginals re-aggregate THAT table and broadcast back;
    * the running-sum window partitions by group over ≤ calendar-days
    * rows — never over raw events.
    */
  def cusumShift(df: DataFrame, groupCol: String, tsCol: String)
      : DataFrame = {
    requireNoReserved(df, Seq("__day", "__c", "__nd", "__tot", "__cu",
      "__rk", "shift_day", "peak_cusum"))
    val daily = df
      .select(col(groupCol),
        expr(s"unix_micros(`$tsCol`) div 86400000000").as("__day"))
      .groupBy(col(groupCol), col("__day"))
      .agg(count(lit(1)).as("__c"))
    val marg = daily.groupBy(groupCol)
      .agg(count(lit(1)).as("__nd"), sum("__c").as("__tot"))
    val wCum = Window.partitionBy(groupCol).orderBy("__day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPk = Window.partitionBy(groupCol)
      .orderBy(abs(col("__cu")).desc, col("__day"))
    daily.join(broadcast(marg), Seq(groupCol))
      .withColumn("__cu",
        sum(col("__nd") * col("__c") - col("__tot")).over(wCum))
      .withColumn("__rk", row_number().over(wPk))
      .filter(col("__rk") === 1)
      .select(col(groupCol), col("__day").as("shift_day"),
        round(col("__cu").cast("double") /
          (col("__nd").cast("double") * col("__tot").cast("double")),
          6).as("peak_cusum"))
  }

  /** Top-k length-3 event-type paths (trigrams) across all keys'
    * event sequences — the "what do users actually do" view that
    * funnels (which presuppose an order) can't give. Sequences order
    * by exact microseconds with the id column as the deterministic
    * same-instant tiebreak. Returns (path, n) — the k most frequent,
    * ties broken by path text.
    *
    * Scale shape: ONE exchange on the key for both lead windows
    * (same frame), then a count aggregation whose cardinality is
    * ≤ |types|³ after partial map-side combine, and a broadcast-size
    * top-k sort over that.
    */
  def eventPaths(ev: DataFrame, keyCol: String, typeCol: String,
      tsCol: String, idCol: String, k: Int = 20): DataFrame = {
    require(k > 0, "k must be positive")
    requireNoReserved(ev, Seq("__us", "__e2", "__e3", "path", "n"))
    val w = Window.partitionBy(keyCol).orderBy(col("__us"), col(idCol))
    ev.select(col(keyCol), col(typeCol),
        unix_micros(col(tsCol)).as("__us"), col(idCol))
      .withColumn("__e2", lead(col(typeCol), 1).over(w))
      .withColumn("__e3", lead(col(typeCol), 2).over(w))
      .filter(col("__e3").isNotNull)
      .select(concat_ws(">", col(typeCol), col("__e2"), col("__e3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** RFM customer segmentation: per-user Recency (days since last
    * event, vs the corpus max timestamp), Frequency (event count) and
    * Monetary (value sum), each scored 1–5 by EXACT quintile cutpoints
    * over the user-level aggregates (score 5 = most recent / most
    * frequent / highest value). Returns
    * (userCol, r_days, frequency, monetary, r_score, f_score, m_score).
    *
    * Scale shape: one aggregation pass to user level (hash exchange on
    * the user), ONE 1-row percentile aggregate over that (broadcast
    * back) — no global sort, no ntile window funnel; the same
    * broadcast-cutpoint machinery as ntile_binning/winsorize, which is
    * what survives a billion users where `ntile(5) OVER (ORDER BY …)`
    * single-partitions.
    */
  def rfmScores(ev: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    requireNoReserved(ev, Seq("__t", "__maxt", "__rsec", "r_days",
      "frequency", "monetary"))
    val base = ev.select(col(userCol), col(tsCol).cast("long").as("__t"),
      col(valueCol))
    val maxT = base.agg(max("__t").as("__maxt"))
    val users = base.crossJoin(broadcast(maxT))
      .groupBy(col(userCol))
      .agg((first("__maxt") - max("__t")).as("__rsec"),
        count(lit(1)).as("frequency"),
        sum(col(valueCol)).as("monetary"))
      // unrounded double only feeds the quantile scoring; the DISPLAYED
      // r_days is rounded half-up in exact integer micro-days below —
      // sec/86400 lands on exact .xxxxxx5 ties (e.g. 177201 s) where
      // double round-to-6 is engine-dependent
      .withColumn("r_days", col("__rsec") / lit(86400.0))
    def cuts(c: String) = Seq(0.2, 0.4, 0.6, 0.8).zipWithIndex.map {
      case (p, i) => percentile(col(c), lit(p)).as(s"__${c}_c$i")
    }
    val cutRow = users.agg((cuts("r_days") ++ cuts("frequency") ++
      cuts("monetary")).head,
      (cuts("r_days") ++ cuts("frequency") ++ cuts("monetary")).tail: _*)
    def scoreAsc(c: String) = (0 to 3)
      .map(i => (col(c) > col(s"__${c}_c$i")).cast("int"))
      .reduce(_ + _) + 1
    users.crossJoin(broadcast(cutRow))
      .select(col(userCol),
        (floor((col("__rsec") * 1000000L + 43200L) / lit(86400L)) /
          lit(1e6)).as("r_days"),
        col("frequency"),
        round(col("monetary"), 4).as("monetary"),
        // recency: smaller is better → invert the ascending score
        (lit(6) - scoreAsc("r_days")).as("r_score"),
        scoreAsc("frequency").as("f_score"),
        scoreAsc("monetary").as("m_score"))
  }

  /** Market-basket pair affinity: for item pairs co-occurring in at
    * least `minSupport` baskets, support / confidence(a→b) / lift.
    * Items are de-duplicated within a basket; pairs are ordered
    * (item_a < item_b) and lift is symmetric. Returns the `topK` pairs
    * by lift (ties broken by the pair key) — use the DataFrame before
    * the limit for the full table.
    *
    * Scale shape: ONE rollup per basket collects the (distinct, sorted)
    * item array, and the ordered pairs are generated IN PLACE from that
    * array with slice/transform HOFs — no basket-keyed self-join, so no
    * second shuffle of the item stream and no sort-merge sorts. The
    * pair space stays quadratic ONLY within a basket (bounded by basket
    * size, never corpus size) and the counts hash-exchange on the pair.
    * TakeOrdered top-k, no global sort. The basket count folds into the
    * plan as a broadcast 1-row aggregate (no separate driver
    * action/scan).
    *
    * `maxItemsPerBasket` (0 = off) is the skew guard: a single whale
    * basket of m items emits m² pairs into one task, so baskets larger
    * than the cap are dropped from the PAIR space — but kept in the
    * per-item and basket totals, so support/confidence/lift stay
    * ratios over the full corpus. With the cap on, whale baskets are
    * semi-joined away BEFORE the array rollup, so no aggregation
    * buffer ever holds more than `maxItemsPerBasket` items. The bias
    * is one-sided and explicit: co-occurrences observed only inside
    * whale baskets (bot sessions, catalog scrapes — the baskets that
    * least signal affinity) are not counted, so capped pair support is
    * a lower bound of the uncapped value.
    */
  def basketAffinity(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, topK: Int = 20,
      maxItemsPerBasket: Int = 0): DataFrame = {
    require(minSupport >= 1, "minSupport must be at least 1")
    require(maxItemsPerBasket == 0 || maxItemsPerBasket >= 2,
      "maxItemsPerBasket must be 0 (off) or at least 2")
    requireNoReserved(df, Seq("item_a", "item_b", "__n", "__na", "__nb",
      "__np", "__nbaskets", "__bsz", "__items", "__p"))
    val items = df.select(col(basketCol), col(itemCol)).distinct()
    val itemCounts = items.groupBy(itemCol).agg(count(lit(1)).as("__n"))
    // the sorted-array rollup serves three ways: its rows are the
    // basket count (equal to countDistinct(basketCol) — null baskets
    // filtered here exactly as the old join-on-basket pair build
    // dropped them), its array sizes are the whale cap, and the array
    // itself yields the ordered pairs without ever re-shuffling items
    val baskets =
      if (maxItemsPerBasket <= 0)
        items.filter(col(basketCol).isNotNull).groupBy(basketCol)
          .agg(sort_array(collect_list(col(itemCol))).as("__items"))
      else {
        // cap on: size first, semi-join whales away, THEN collect —
        // the array buffer is bounded by the cap, not the whale
        val sizes = items.groupBy(basketCol)
          .agg(count(lit(1)).as("__bsz"))
        items.join(
            sizes.filter(col(basketCol).isNotNull &&
              col("__bsz") <= maxItemsPerBasket).select(basketCol),
            Seq(basketCol), "left_semi")
          .groupBy(basketCol)
          .agg(sort_array(collect_list(col(itemCol))).as("__items"))
      }
    val nBaskets =
      if (maxItemsPerBasket <= 0)
        baskets.agg(count(lit(1)).cast("double").as("__nbaskets"))
      else items.groupBy(basketCol).agg(count(lit(1)).as("__bsz"))
        .agg(count(col(basketCol)).cast("double").as("__nbaskets"))
    val pairs = baskets
      // pinned post-agg repartition on the pair-build branch only (opt
      // r19, §2.4 — the edge_jaccard stage-probe rationale): AQE
      // coalesces the byte-light basket table under the CPU-heavy
      // in-array pair explode; the nBaskets 1-row count reads the
      // un-pinned rollup directly
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(explode(flatten(transform(col("__items"), (a, i) =>
        transform(
          slice(col("__items"), i + lit(2), size(col("__items"))),
          b => struct(a.as("item_a"), b.as("item_b")))))).as("__p"))
      .select(col("__p.item_a"), col("__p.item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("__np"))
      .filter(col("__np") >= minSupport)
    pairs
      .join(itemCounts.select(col(itemCol).as("item_a"),
        col("__n").as("__na")), "item_a")
      .join(itemCounts.select(col(itemCol).as("item_b"),
        col("__n").as("__nb")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"),
        col("__np").as("pair_baskets"),
        round(col("__np") / col("__nbaskets"), 6).as("support"),
        round(col("__np") / col("__na"), 6).as("confidence_a_to_b"),
        round(col("__np") * col("__nbaskets") /
          (col("__na") * col("__nb")), 6).as("lift"))
      .orderBy(desc("lift"), col("item_a"), col("item_b"))
      .limit(topK)
  }

  /** Last-touch conversion attribution: for each `convType` event,
    * credit the most recent NON-conversion event of the same user
    * within `windowSeconds` at or before the conversion instant
    * (ties at the same timestamp break toward the larger `idCol` —
    * the latest-arriving touch). Returns one row per attributed
    * channel: (channel, conversions), with unattributed conversions
    * under channel 'direct'.
    *
    * Shuffle shape: ONE hash exchange on `userCol` — the credit
    * assignment is a max_by aggregate over a RANGE window on the same
    * partitioning (per-user, time-bounded state), then a tiny rollup
    * on the channel. No self-join of the event stream.
    */
  def lastTouchAttribution(ev: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, convType: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, "windowSeconds must be positive")
    requireNoReserved(ev, Seq("__t", "__ch"))
    val e = ev.select(col(userCol), col(typeCol), col(idCol),
      col(tsCol).cast("long").as("__t"))
    val w = Window.partitionBy(userCol).orderBy(col("__t"))
      .rangeBetween(-windowSeconds, 0)
    val touch = when(col(typeCol) =!= lit(convType),
      struct(col("__t"), col(idCol)))
    e.withColumn("__ch",
        max_by(when(col(typeCol) =!= lit(convType), col(typeCol)), touch)
          .over(w))
      .filter(col(typeCol) === lit(convType))
      .groupBy(coalesce(col("__ch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("conversions"))
  }

  /** Time-series resample onto a regular grid with forward fill: for
    * each key, emit one row per `stepSeconds` from its first to its
    * last observation, carrying the latest observed value at or before
    * each grid instant — the gap-filling step before any
    * fixed-frequency feature (lag/rolling on wall-clock steps) or
    * join against calendar dimensions.
    *
    * Same-timestamp duplicates are collapsed with max() first so the
    * fill is deterministic. `tsCol` must cast to a numeric epoch
    * (library convention: epoch seconds). Output:
    * (keyCol, grid_ts, valueCol).
    *
    * Shuffle shape: everything is keyed BY `keyCol` — the dedup/bounds
    * aggregations and the fill window hash-exchange on the key and the
    * spine is generated per key with `sequence()` (no driver-side range
    * materialization, no cross-key data movement). Grid density is the
    * caller's lever: rows out = span/step per key, generated
    * executor-side.
    */
  def resampleFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    requireNoReserved(df, Seq("__t", "__v", "__lo", "__hi", "__is_grid",
      "__f"))
    val obs = df.select(col(keyCol), col(tsCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
      .groupBy(col(keyCol), col("__t")).agg(max("__v").as("__v"))
    val spine = obs.groupBy(keyCol)
      .agg(min("__t").as("__lo"), max("__t").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepSeconds)))
          .as("__t"))
    val unioned = obs.withColumn("__is_grid", lit(false))
      .unionByName(spine
        .withColumn("__v", lit(null).cast("double"))
        .withColumn("__is_grid", lit(true)))
    // observations sort BEFORE the grid row at the same instant
    // (false < true), so an exactly-aligned observation lands in its
    // own grid point
    val w = Window.partitionBy(keyCol)
      .orderBy(col("__t"), col("__is_grid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__f", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_grid"))
      .select(col(keyCol), col("__t").as("grid_ts"),
        col("__f").as(valueCol))
  }

  /** Calendar dimension generator: one row per day in [start, end]
    * (inclusive, ISO `yyyy-MM-dd` literals) with the standard derived
    * attributes — the join-side table every warehouse keeps beside its
    * facts. Generated executor-side from one `sequence()` (no driver
    * loop, no data read); deterministic, so two clusters generating the
    * same range get identical tables.
    *
    * `day_of_week` is 1=Sunday..7=Saturday (Spark `dayofweek`);
    * `week_of_year` is the ISO week number.
    */
  def calendarDim(spark: SparkSession, start: String, end: String): DataFrame = {
    val base = spark.range(1).select(
      explode(sequence(to_date(lit(start)), to_date(lit(end)))).as("date"))
    base.select(col("date"),
      year(col("date")).as("year"),
      quarter(col("date")).as("quarter"),
      month(col("date")).as("month"),
      dayofmonth(col("date")).as("day_of_month"),
      weekofyear(col("date")).as("week_of_year"),
      dayofweek(col("date")).as("day_of_week"),
      dayofweek(col("date")).isin(1, 7).as("is_weekend"))
  }

  /** Key-skew diagnostic: the `topK` heaviest values of `keyCol` with
    * their share of all rows and their ratio to the mean per-key count
    * — the number that says whether a shuffle on this key needs salting
    * ([[Scale.saltedJoin]]) before it hits a 100 TB join. One count
    * aggregation + a broadcast 1-row stats row + a TakeOrdered top-k;
    * never a global sort.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    requireNoReserved(df, Seq("__n", "__rows", "__keys"))
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
    val stats = counts.agg(sum("__n").as("__rows"),
      count(lit(1)).as("__keys"))
    counts.orderBy(desc("__n"), col(keyCol)).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col(keyCol),
        col("__n").as("n_rows"),
        round(col("__n") / col("__rows"), 6).as("share"),
        round(col("__n") * col("__keys") / col("__rows"), 6)
          .as("ratio_to_avg"))
  }

  /** Build a type-2 slowly-changing dimension from a changelog: one
    * output row per retained version with `valid_from` / `valid_to`
    * epoch-second bounds (`valid_to` NULL on the open current version)
    * and `is_current`. When `compressUnchanged` is set (the SCD2 norm),
    * consecutive versions whose `attrCols` are all unchanged are
    * collapsed into the earlier row — only genuine changes open a new
    * version.
    *
    * `tsCol` must cast to a numeric epoch (library convention: epoch
    * seconds); `tieCol` (a unique key) makes ordering total when two
    * changes share a timestamp.
    *
    * Shuffle shape: ONE hash exchange on `keyCols`. Both windows (the
    * lag-based change filter and the lead-based interval close) share
    * the same partitioning AND sort order, so Catalyst stacks them on a
    * single exchange + single sort — the plan stays one pass over the
    * changelog no matter how many attributes are tracked.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, attrCols: Seq[String],
      compressUnchanged: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    requireNoReserved(changes, Seq("valid_from", "valid_to", "is_current",
      "__chg"))
    val base = changes.select(
      keyCols.map(col) ++ Seq(col(tsCol).cast("long").as("valid_from"),
        col(tieCol)) ++ attrCols.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col(tieCol))
    val kept =
      if (!compressUnchanged) base
      else {
        // a version is retained iff ANY tracked attr differs from the
        // previous version (null-safe), or it is the first version
        val changed = attrCols
          .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
          .reduce(_ || _)
        base.withColumn("__chg",
            row_number().over(w) === 1 || changed)
          .filter(col("__chg")).drop("__chg")
      }
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from"), col(tieCol))
    kept.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tieCol)
  }

  /** Per-group one-way ANOVA F-statistic of a money column across the
    * levels of a categorical column — the feature-screening question
    * "does this categorical explain the target?" answered per group
    * (k_groups = observed levels, F = (SSB/(k−1))/(SSW/(n−k))).
    *
    * Exactness posture: the naive Σ S_g²/n_g form is catastrophic for
    * cross-engine determinism (1e16-scale double cancellation whose
    * result depends on float summation order), so means are fixed to
    * EXACT half-up-rounded integer MICRO-CENTS ((2·10⁶·S + n) div 2n —
    * pure integer arithmetic both engines reproduce bit-for-bit) and
    * both sums of squares accumulate those integers in decimal(38,0)
    * via the two-pass form: SSW = Σ(10⁶·x − m_g)², SSB =
    * Σ n_g·(m_g − m)². Only the final F ratio is double, in a fixed
    * operation order, rounded once. The micro-cent mean quantization
    * perturbs F by O(10⁻⁶) relative — far below any analytical use —
    * and buys bit-reproducibility.
    *
    * Scale shape: the classic two-pass — a (group, level) rollup, the
    * per-group rollup of THAT, and one join of the raw rows back to
    * the (group, level) means for SSW; all three key on subsets of
    * (group, level), so the rollups are map-side combinable and the
    * join reuses the first exchange.
    */
  def anovaF(df: DataFrame, groupCol: String, treatCol: String,
      valueCol: String): DataFrame = {
    requireNoReserved(df, Seq("__g", "__t", "__v", "__n_g", "__s_g",
      "__m_g", "__n", "__k", "__s", "__m", "__d", "__ssw", "__ssb",
      "n_rows", "k_groups", "f_stat"))
    val dec = "decimal(38,0)"
    val x = df.select(col(groupCol).as("__g"), col(treatCol).as("__t"),
      round(col(valueCol) * 100).cast("long").as("__v"))
    val gm = x.groupBy("__g", "__t")
      .agg(count(lit(1)).as("__n_g"), sum("__v").as("__s_g"))
      .withColumn("__m_g", expr(
        "(cast(2000000 as decimal(38,0)) * __s_g + __n_g) div (2 * __n_g)"))
    val tm = gm.groupBy("__g")
      .agg(sum("__n_g").as("__n"), count(when(col("__n_g") > 0, 1))
          .as("__k"),
        sum(when(col("__n_g") > 0, col("__s_g"))).as("__s"))
      .withColumn("__m", expr(
        "(cast(2000000 as decimal(38,0)) * __s + __n) div (2 * __n)"))
    val ssw = x.join(gm.select("__g", "__t", "__m_g"), Seq("__g", "__t"))
      .select(col("__g"),
        (lit(1000000L) * col("__v") - col("__m_g")).cast(dec).as("__d"))
      .groupBy("__g")
      .agg(sum(col("__d") * col("__d")).as("__ssw"))
    val ssb = gm.join(tm.select("__g", "__m"), "__g")
      .select(col("__g"), col("__n_g"),
        (col("__m_g") - col("__m")).cast(dec).as("__d"))
      .groupBy("__g")
      .agg(sum(col("__n_g") * col("__d") * col("__d")).as("__ssb"))
    tm.join(ssw, "__g").join(ssb, "__g")
      .select(col("__g").as(groupCol), col("__n").as("n_rows"),
        col("__k").cast("int").as("k_groups"),
        round(
          (col("__ssb").cast("double") / (col("__k") - 1)) /
          (col("__ssw").cast("double") / (col("__n") - col("__k"))), 6)
          .as("f_stat"))
  }

  /** Multi-source BFS distances: for every node reachable from any
    * seed within `maxDepth` directed hops, the exact hop distance to
    * the NEAREST seed. Landmark distances are the workhorse of
    * graph-feature pipelines (distance-to-known-spam, degrees of
    * separation from a trusted core) and of graph-partitioning
    * heuristics. Pass a symmetrized edge list for undirected
    * semantics.
    *
    * Level-synchronous frontier expansion (the Pregel shape): each
    * round joins ONLY the newly-discovered frontier — never the full
    * distance table — against the edge list, anti-joins out nodes
    * already labeled (BFS invariant: first discovery IS the minimum
    * distance, so no min-aggregation over paths and no re-visits),
    * and stops early when the frontier empties. Lineage truncates per
    * round (reliable-checkpoint knob via [[Lineage]] — the
    * [[kCore]]/[[pageRank]] posture);
    * the edge list is persisted once and unpersisted before return.
    * At 100 TB the cost is maxDepth hash joins keyed on the frontier,
    * each a fraction of one full-graph shuffle.
    *
    * Returns (outCol, dist). Seeds themselves carry dist 0; nodes
    * unreachable within maxDepth are absent.
    */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxDepth: Int,
      outCol: String = "id",
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    // LAZY cuts (r18): each round's frontier is counted right after
    // the cut, so materialization rides the count — one driver action
    // per round where ckpt + isEmpty + ckpt(dist) was three. `dist`
    // itself is no longer checkpointed per round: it is a union of
    // already-checkpointed frontiers, so its plan depth grows only by
    // one shallow Union node per round (bounded by maxDepth).
    val ckpt = Lineage.truncator(edges.sparkSession, checkpointDir,
      eager = false)
    requireNoReserved(edges, Seq("__s", "__t", "__n", "dist"))
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("__s"), col(dstCol).as("__t"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = ckpt(seeds.select(col(seedCol).as("__n")).distinct()
      .withColumn("dist", lit(0)))
    var frontier = dist
    var d = 0
    var drained = false
    while (d < maxDepth && !drained) {
      d += 1
      val next = ckpt(frontier.join(e, col("__n") === col("__s"))
        .select(col("__t").as("__n")).distinct()
        .join(dist, Seq("__n"), "left_anti")
        .withColumn("dist", lit(d)))
      // count() materializes the lazy cut AND answers the drain check
      // (the round's only action); the left_anti above reads dist's
      // checkpointed leaves, never recomputing earlier rounds
      if (next.count() == 0L) drained = true
      else {
        dist = dist.union(next)
        frontier = next
      }
    }
    e.unpersist()
    dist.select(col("__n").as(outCol), col("dist"))
  }

  /** Per-group day-of-week revenue profile: exact cent totals and the
    * within-group share per weekday — the first-order seasonality
    * fingerprint behind staffing/capacity models and the sanity check
    * for any day-of-week feature. The weekday index is computed
    * ARITHMETICALLY from the epoch day ((day + 4) mod 7, 0 = Sunday)
    * — pure integer math that every engine reproduces bit-for-bit,
    * where calendar dayofweek() functions disagree on week-start
    * conventions. Returns (groupCol, dow, revenue_cents, share).
    *
    * Scale shape: one map-side-combinable rollup on (group, dow); the
    * share normalization windows over the AGGREGATED profile (≤ 7
    * rows per group), never the raw data.
    */
  def dowProfile(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String): DataFrame = {
    requireNoReserved(df, Seq("dow", "revenue_cents", "share", "__c"))
    val day = epochDay(dateCol)
    df.select(col(groupCol),
        pmod(day + 4, lit(7)).cast("int").as("dow"),
        round(col(valueCol) * 100).cast("long").as("__c"))
      .groupBy(col(groupCol), col("dow"))
      .agg(sum("__c").as("revenue_cents"))
      .withColumn("share",
        round(col("revenue_cents").cast("double") /
          sum("revenue_cents").over(Window.partitionBy(groupCol)), 6))
  }

  /** Degree histogram of an undirected graph: how many nodes have
    * each degree — the one-glance structure fingerprint (power law vs
    * uniform, hub count, isolated-node check) read BEFORE running any
    * per-edge algorithm, because it decides whether hub caps
    * ([[edgeJaccard]], [[basketAffinity]]) are needed. Edges are
    * canonicalized (self-loops dropped, duplicates and reversals
    * collapsed) exactly as [[kCore]] does. Returns (degree, n_nodes).
    *
    * Scale shape: canonicalize → per-node count → per-degree count;
    * three map-side-combinable exchanges, each strictly smaller than
    * the last.
    */
  def degreeDistribution(edges: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    requireNoReserved(edges, Seq("__a", "__b", "__n", "degree",
      "n_nodes"))
    edges
      .filter(col(aCol).isNotNull && col(bCol).isNotNull &&
        col(aCol) =!= col(bCol))
      .select(least(col(aCol), col(bCol)).as("__a"),
        greatest(col(aCol), col(bCol)).as("__b"))
      .distinct()
      .select(explode(array(col("__a"), col("__b"))).as("__n"))
      .groupBy("__n").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
  }

  /** 2-D Pareto frontier (skyline) under strict dominance: a row
    * survives iff NO other row is strictly greater on BOTH `xCol` and
    * `yCol` — "best trade-offs" queries (latest AND largest order,
    * cheapest AND freshest supplier) without a quadratic self-join.
    *
    * Scale shape — the naive formulations both fail at 100 TB: the
    * NOT EXISTS self-join is O(n²), and a single global sort-window
    * funnels every row through one task. This uses the standard
    * two-phase skyline: (1) a LOCAL pass — per input partition
    * (`spark_partition_id`), sort by x desc and keep rows not
    * dominated within the partition via a running strict-greater max
    * of y (a dominated-anywhere row is dominated in its own partition,
    * so pruning is lossless); random data leaves O(log n) survivors
    * per partition; (2) the same running-max filter globally over the
    * tiny survivor set. The only global ordering happens after ~all
    * data is pruned. Ties: equal x (or equal y) never dominate —
    * strict product order, so incomparable near-duplicates all
    * survive. Returns the input row narrowed to (idCol, xCol, yCol).
    *
    * "Strictly greater x" is expressed as a range frame over the
    * DENSE RANK of x (an integer by construction), never over x
    * itself: an offset-by-one frame on a raw fractional x would put a
    * dominator at 0 < x'−x < 1 outside the frame, so the operator is
    * exact for ANY orderable x — double, decimal, date — not just
    * integers. Both windows share one partitioning and sort order.
    *
    * WORST-CASE BOUND (documented per VERDICT r9): on ANTI-correlated
    * data (x and y inversely ranked) no row dominates any other, the
    * local pass prunes nothing, and the phase-2 window processes the
    * FULL input in one task — unavoidable for this operator's
    * semantics, since the skyline of anti-correlated data IS the whole
    * input (any algorithm must emit O(n) rows; AnalyticsSpec pins the
    * fixture). The two-phase split is therefore an expected-case
    * optimization: random/correlated data leaves O(log n) survivors
    * per partition and phase 2 is constant work. Callers on data known
    * to be near-anti-correlated with NUMERIC x should use
    * [[skyline2DBucketed]] — result-identical, and its phase 2 is
    * value-range-bucketed so no task ever holds more than ~1/nBuckets
    * of the survivors.
    */
  /** Strict-dominance prune within each window partition: keep rows
    * whose y is not exceeded by any same-partition row of strictly
    * greater x (dense-rank range frame — exact for fractional x).
    * Shared by [[skyline2D]] (phases 1 and 2) and
    * [[skyline2DBucketed]] (phases 1 and 2a). */
  private def undominatedIn(in: DataFrame, w: WindowSpec,
      xCol: String, yCol: String): DataFrame =
    in.withColumn("__xr", dense_rank().over(w.orderBy(col(xCol).desc)))
      .withColumn("__mx",
        max(col(yCol)).over(w.orderBy(col("__xr"))
          .rangeBetween(Window.unboundedPreceding, -1)))
      .filter(col("__mx").isNull || col(yCol) >= col("__mx"))
      .drop("__xr", "__mx")

  def skyline2D(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    requireNoReserved(df, Seq("__pid", "__xr", "__mx"))
    val narrowed = df.select(col(idCol), col(xCol), col(yCol))
    val local = undominatedIn(
      narrowed.withColumn("__pid", spark_partition_id()),
      Window.partitionBy("__pid"), xCol, yCol).drop("__pid")
    // phase 2 is DELIBERATELY single-partition (it sees only phase 1's
    // per-partition survivors — the documented naive form; the bucketed
    // variant is the scale path and is spec-pinned to never run a
    // single-partition window). This is the ONE remaining production
    // source of the WindowExec "No Partition Defined" warning, by
    // design — a constant partition key can't silence it (Catalyst's
    // FoldablePropagation strips foldable partition specs), and hiding
    // an intentionally-global window behind a non-foldable constant
    // would be worse than the warning.
    undominatedIn(local, Window.partitionBy(), xCol, yCol)
  }

  /** [[skyline2D]] for NUMERIC x with the worst case de-windowed: the
    * scale path for data where the skyline survivor set may be large
    * (anti-correlated x/y — the documented skyline2D bound). Phase 2
    * never runs in one task: survivors of the local pass split into
    * `nBuckets` equal-width VALUE ranges of x (bounds from a broadcast
    * 1-row min/max agg — no collect), each bucket prunes its own
    * strictly-greater-x dominators in a per-bucket window, and
    * cross-bucket dominance reduces to ONE number per bucket — any row
    * of a strictly-higher bucket has strictly greater x by
    * construction, so a row survives the cross-bucket test iff its y
    * is not exceeded by max(y) over higher buckets (a ≤nBuckets-row
    * triangular broadcast join). Result-identical to [[skyline2D]]
    * (law-pinned), and on anti-correlated data the widest window
    * partition is ~1/nBuckets of the survivors instead of all of them
    * (PlanSpec pins no single-partition window).
    *
    * Caveats: x must cast to double losslessly for the BUCKETING only
    * (comparisons still happen on the original column — a lossy cast
    * can only unbalance buckets, never change the result, because
    * bucket boundaries compare in double while dominance compares in
    * the source type... strictly: bucket monotonicity requires the
    * cast be order-preserving, which holds for all numeric types and
    * epoch-derived longs). A value-skewed x (e.g. one hot x value)
    * degrades toward the single-bucket case — the all-ties input
    * where nothing dominates and output-sized work is semantically
    * unavoidable (skyline2D's documented bound).
    */
  def skyline2DBucketed(df: DataFrame, idCol: String, xCol: String,
      yCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    requireNoReserved(df, Seq("__pid", "__xr", "__mx", "__b", "__xd",
      "__xmin", "__xmax", "__bmax", "__hb", "__hm", "__pmax"))
    val narrowed = df.select(col(idCol), col(xCol), col(yCol))
    val local = undominatedIn(
      narrowed.withColumn("__pid", spark_partition_id()),
      Window.partitionBy("__pid"), xCol, yCol).drop("__pid")
    val xd = col(xCol).cast("double")
    // bounds from the RAW input, not the survivors: any cover of the
    // survivor range buckets correctly, and aggregating narrowed keeps
    // the stats branch a plain column-pruned scan instead of a third
    // execution of the phase-1 window pass
    // Bounds exclude NaN: Spark's max() would return NaN (it sorts as
    // the LARGEST double), poisoning the bucket arithmetic for every
    // finite row — NaN rows get their own explicit route below.
    val stats = narrowed.agg(
      min(when(!isnan(xd), xd)).as("__xmin"),
      max(when(!isnan(xd), xd)).as("__xmax"))
    // NaN x is tested FIRST and lands in the TOP bucket: under the
    // desc dense_rank NaN sorts as the largest double, so a NaN-x row
    // is never dominated (nothing has strictly greater x) and its y
    // prunes every finite-x row — exactly a top-bucket resident.
    // floor(NaN).cast(int) is 0 under non-ANSI eval, so without this
    // route NaN rows would fall into bucket 0 where the cross-bucket
    // __pmax filter wrongly kills them (ADVICE r10; pinned by the NaN
    // fixture in the identity law).
    // NULL x is tested NEXT and lands in bucket 0 (the lowest-x
    // bucket) — mirroring skyline2D's window semantics, where null x
    // sorts LAST under the desc dense_rank (null never dominates, and
    // anything with larger y dominates it). The check must precede the
    // clamp: Spark's least()/greatest() SKIP nulls, so least(63,
    // floor(null)) is 63, not null — a trailing coalesce never fires
    // and null-x rows would land in the TOP bucket, where their y
    // wrongly prunes every lower bucket (caught by the null fixture in
    // the identity law).
    val withB = local.crossJoin(broadcast(stats))
      .withColumn("__b",
        when(isnan(xd), lit(nBuckets - 1))
          .when(xd.isNull || col("__xmax") === col("__xmin"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((xd - col("__xmin")) /
              ((col("__xmax") - col("__xmin")) / nBuckets)).cast("int"))))
      .drop("__xmin", "__xmax")
    val inBucket = undominatedIn(withB,
      Window.partitionBy("__b"), xCol, yCol)
    // bucket maxima from the PRUNED rows: a bucket's max-y row cannot
    // be dominated within its bucket (nothing there has strictly
    // greater y), so it always survives the in-bucket pass and
    // max(y) over inBucket == max(y) over withB — deriving bmax from
    // inBucket spares a second execution of the phase-1+bucket chain
    val bmax = inBucket.groupBy("__b").agg(max(col(yCol)).as("__bmax"))
    val pmax = bmax
      .join(broadcast(bmax.select(col("__b").as("__hb"),
        col("__bmax").as("__hm"))), col("__hb") > col("__b"), "left")
      .groupBy("__b").agg(max("__hm").as("__pmax"))
    inBucket.join(broadcast(pmax), Seq("__b"))
      .filter(col("__pmax").isNull || col(yCol) >= col("__pmax"))
      .select(col(idCol), col(xCol), col(yCol))
  }

  /** First-significant-digit distribution of a positive money column
    * against Benford's law — the classic fabricated-data / synthetic-
    * leak detector for data-quality auditing: organic multiplicative
    * quantities follow P(d) = log10(1+1/d); uniform or hand-typed
    * values don't. The digit is taken from the EXACT integer cents
    * (string head of a long), never from float log10 of the raw value
    * — so the binning is bit-deterministic. Returns one row per
    * leading digit 1–9: (digit, n_values, share, benford_expected).
    * Non-positive values are excluded (no leading digit).
    *
    * Scale shape: one map-side-combinable groupBy on a 9-value key;
    * the share normalization runs over the 9-row AGGREGATED result
    * (cardinality is 9 regardless of input size), so the unpartitioned
    * window is constant work.
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    requireNoReserved(df, Seq("digit", "n_values", "share",
      "benford_expected"))
    val cents = round(col(valueCol) * 100).cast("long")
    val counts = df
      .filter(cents > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_values"))
    // the grand total joins back as a broadcast 1-row frame, not a
    // global window: the counts frame is ≤9 rows (digits 1-9) either
    // way, but the window form fires the "No Partition Defined"
    // warning every run — keep that channel clean (VERDICT r13 #8)
    val total = counts.agg(sum("n_values").as("__tot"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n_values").cast("double") / col("__tot"), 6))
      .drop("__tot")
      .withColumn("benford_expected",
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
  }

  /** Per-group lag-k autocorrelation of the daily value series: Pearson
    * correlation between day t's total and day t+k's total (row-ordered
    * over the OBSERVED days, so calendar gaps contract rather than
    * zero-fill — document-standard for irregular series). The
    * mean-reversion / momentum fingerprint of a revenue stream, and
    * the sanity check behind any lag-feature design: a series whose
    * autocorrelation is ~0 gains nothing from lag features.
    *
    * Determinism/overflow posture as [[trendSlope]]: daily totals are
    * exact long cents; every product is computed in decimal (cents²
    * at warehouse scale overflows a long multiply), moment sums
    * accumulate in decimal(38,0), and only the final correlation is
    * double, rounded once. Returns (groupCol, n_pairs, autocorr);
    * groups with < 3 observed days are dropped (undefined).
    *
    * Scale shape: map-side-combinable daily rollup, then ONE exchange
    * on the group for the lead window, then the moment rollup reuses
    * that partitioning.
    */
  def autocorrLag(df: DataFrame, groupCol: String, dateCol: String,
      valueCol: String, lagDays: Int = 1): DataFrame = {
    require(lagDays >= 1, "lagDays must be >= 1")
    requireNoReserved(df, Seq("__x", "__y", "__d", "n_pairs", "__sx",
      "__sy", "__sxy", "__sxx", "__syy", "autocorr"))
    val dec = "decimal(19,0)"
    val daily = df
      .select(col(groupCol),
        epochDay(dateCol).as("__d"),
        round(col(valueCol) * 100).cast("long").as("__x"))
      .groupBy(col(groupCol), col("__d"))
      .agg(sum("__x").as("__x"))
    val w = Window.partitionBy(groupCol).orderBy("__d")
    val pairs = daily
      .withColumn("__y", lead(col("__x"), lagDays).over(w))
      .filter(col("__y").isNotNull)
    pairs.groupBy(groupCol)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"))
      .filter(col("n_pairs") >= 2)
      .select(col(groupCol), col("n_pairs"),
        round(
          (col("n_pairs").cast(dec) * col("__sxy") -
            col("__sx") * col("__sy")).cast("double") /
          sqrt((col("n_pairs").cast(dec) * col("__sxx") -
            col("__sx") * col("__sx")).cast("double")) /
          sqrt((col("n_pairs").cast(dec) * col("__syy") -
            col("__sy") * col("__sy")).cast("double")), 6)
          .as("autocorr"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic of an integer-grid value
    * between group A (`isA` true) and group B — the distribution-drift
    * test behind train/serve skew monitors and corpus-segment QA.
    * The DE-WINDOWED global companion to [[ksDrift]]: ksDrift's ECDF
    * window partitions by its group key, so a single corpus-wide
    * comparison (no group key) would put every distinct value in one
    * window partition — this form replaces that window with the
    * bucketed two-level prefix sum, at the cost of requiring a
    * pre-quantized integer grid.
    * D = sup_x |F_A(x) − F_B(x)| evaluated at every distinct pooled
    * value (the ECDF sup is always attained at a sample point). The
    * comparison runs in the CROSS-MULTIPLIED integer form
    * |cumA·n_B − cumB·n_A| (decimal(38,0) — exact at any corpus size),
    * so the max is an exact integer and the single final division is
    * the only float op. Returns one row (n_a, n_b, ks_d, at_value)
    * with at_value = the smallest grid value attaining the sup (exact
    * integer tie-break); ks_d is null when either group is empty. The
    * decimal max stays internal — the output schema is long/double so
    * the oracle comparison never widens.
    *
    * Scale shape ([[rocAuc]]'s histogram doctrine): the groupBy
    * reduces the corpus map-side to ≤|value grid| histogram rows; the
    * inclusive cumulative counts run bucketed two-level (per-bucket
    * windows + a ≤nBuckets-row triangular broadcast join) — no
    * single-partition window even over the histogram. Bucket
    * boundaries cannot move the result (prefix sums are
    * split-invariant), so nBuckets is a pure parallelism knob.
    */
  def ksTest(df: DataFrame, valueIntCol: String, isA: Column,
      nBuckets: Int = 512): DataFrame = {
    requireNoReserved(df, Seq("__s", "__ya", "__ca", "__cb", "__lo",
      "__hi", "__b", "__pb", "__pa2", "__pb2", "__boffa", "__boffb",
      "__cuma", "__cumb", "__dn", "n_a", "n_b", "d_num", "ks_d",
      "at_value"))
    val dec = "decimal(38,0)"
    val (cum, totals) = cumHistAB(df, valueIntCol, isA, nBuckets,
      withPredecessor = false)
    val dn = abs(col("__cuma").cast(dec) * col("n_b").cast(dec) -
      col("__cumb").cast(dec) * col("n_a").cast(dec))
    cum.crossJoin(broadcast(totals))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(dn).as("d_num"),
        // smallest value attaining the max: exact integer argmax via
        // max(struct(d, −s)) — both fields integer, never a float sort
        max(struct(dn.as("__dn"), (-col("__s")).as("__ns"))).as("__arg"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("d_num").cast("double") /
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double"),
            6)).as("ks_d"),
        (-col("__arg.__ns")).as("at_value"))
  }

  /** The shared two-class bucketed-prefix-sum frame behind [[ksTest]]
    * and [[w1Drift]] (rocAuc's single-class EXCLUSIVE-prefix form
    * predates it and differs enough to stay self-contained): histogram
    * per grid value with class-A/B counts, equal-width integer range
    * buckets, per-bucket INCLUSIVE prefix sums with cross-bucket
    * offsets from a ≤nBuckets-row triangular broadcast, and — when
    * `withPredecessor` — each row's predecessor grid value (lag within
    * the bucket window; at bucket heads, the max grid value of earlier
    * buckets riding the same triangular join). Returns (cum, totals):
    * cum carries __s/__ca/__cb/__cuma/__cumb (+ __prev), totals is the
    * 1-row (n_a, n_b). Every derived branch carries consume-guards on
    * the aggregate columns it rides so all of them reuse ONE histogram
    * exchange — the rocAuc consume-trick; a pruned copy re-scans the
    * corpus (scan-count plan pins on both callers).
    */
  private def cumHistAB(df: DataFrame, valueIntCol: String, isA: Column,
      nBuckets: Int, withPredecessor: Boolean): (DataFrame, DataFrame) = {
    require(nBuckets >= 1, "need nBuckets >= 1")
    val hist = df
      .select(col(valueIntCol).cast("long").as("__s"),
        when(isA, 1L).otherwise(0L).as("__ya"))
      .groupBy("__s")
      .agg(sum("__ya").as("__ca"),
        (count(lit(1)) - sum("__ya")).as("__cb"))
    val live = col("__ca") + col("__cb") >= 0
    val bounds = hist.agg(min(when(live, col("__s"))).as("__lo"),
      max(when(live, col("__s"))).as("__hi"))
    val bucketed = hist.crossJoin(broadcast(bounds))
      .withColumn("__b",
        expr(s"(__s - __lo) div (((__hi - __lo) div $nBuckets) + 1)")
          .cast("int"))
      .drop("__lo", "__hi")
    val bTotCols = Seq(
      sum(when(live, col("__ca"))).as("__pa"),
      sum(when(live, col("__cb"))).as("__pb0")) ++
      (if (withPredecessor) Seq(max(when(live, col("__s"))).as("__pm"))
       else Nil)
    val bTot = bucketed.groupBy("__b").agg(bTotCols.head, bTotCols.tail: _*)
    val rhsCols = Seq(col("__b").as("__pb"), col("__pa").as("__pa2"),
      col("__pb0").as("__pb2")) ++
      (if (withPredecessor) Seq(col("__pm").as("__pm2")) else Nil)
    val bOffCols = Seq(
      coalesce(sum(when(col("__pa") >= 0, col("__pa2"))), lit(0L))
        .as("__boffa"),
      coalesce(sum(when(col("__pb0") >= 0, col("__pb2"))), lit(0L))
        .as("__boffb")) ++
      (if (withPredecessor)
        // the last grid value of any earlier bucket IS this bucket
        // head's predecessor (buckets partition the ordered range);
        // the isNotNull guard consumes the left side's __pm so this
        // branch keeps canonical equality with the count offsets
        Seq(max(when(col("__pm").isNotNull, col("__pm2"))).as("__bprev"))
       else Nil)
    val bOff = bTot
      .join(broadcast(bTot.select(rhsCols: _*)),
        col("__pb") < col("__b"), "left")
      .groupBy("__b")
      .agg(bOffCols.head, bOffCols.tail: _*)
    // INCLUSIVE prefix sums: the ECDF at x counts values ≤ x
    val wB = Window.partitionBy("__b").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, 0)
    val base = bucketed.join(broadcast(bOff), Seq("__b"))
      .withColumn("__cuma", col("__boffa") + sum("__ca").over(wB))
      .withColumn("__cumb", col("__boffb") + sum("__cb").over(wB))
    val cum =
      if (!withPredecessor) base
      else base.withColumn("__prev",
        coalesce(lag("__s", 1).over(
          Window.partitionBy("__b").orderBy("__s")), col("__bprev")))
    // class totals fall out of the ≤nBuckets-row bucket-total frame —
    // never a second pass over the histogram
    val totals = bTot.agg(sum("__pa").as("n_a"), sum("__pb0").as("n_b"))
    (cum, totals)
  }

  /** Two-sample Wasserstein-1 (earth-mover) distance of an
    * integer-grid value between group A (`isA` true) and group B —
    * the magnitude-aware companion to [[ksTest]]: KS says whether the
    * distributions differ, W1 says by how much in VALUE UNITS
    * (W1 = ∫|F_A − F_B| dx, "average cents moved per row"). Evaluated
    * exactly on the grid: between consecutive distinct values both
    * ECDFs are constant, so the integral is
    * Σ |F_A(prev) − F_B(prev)| · (s − prev) — and in cross-multiplied
    * form |cumA·n_B − cumB·n_A| · gap every term is an exact
    * decimal(38,0) integer; the single final division by n_A·n_B is
    * the only float op. Returns one row (n_a, n_b, w1) with w1 in
    * grid units, rounded to 6 dp; null when either group is empty.
    *
    * Scale shape: [[rocAuc]]'s bucketed two-level prefix sums, plus a
    * per-bucket predecessor: lag(s) inside each bucket window and the
    * max grid value of earlier buckets (riding the same ≤nBuckets-row
    * triangular broadcast as the count offsets) at bucket heads — no
    * single-partition window over the histogram.
    */
  def w1Drift(df: DataFrame, valueIntCol: String, isA: Column,
      nBuckets: Int = 512): DataFrame = {
    requireNoReserved(df, Seq("__s", "__ya", "__ca", "__cb", "__lo",
      "__hi", "__b", "__pb", "__pa2", "__pb2", "__pm2", "__boffa",
      "__boffb", "__bprev", "__cuma", "__cumb", "__prev", "n_a", "n_b",
      "w1"))
    val dec = "decimal(38,0)"
    val (cum, totals) = cumHistAB(df, valueIntCol, isA, nBuckets,
      withPredecessor = true)
    // the ECDFs between __prev and __s sit at the EXCLUSIVE prefix
    // (inclusive minus the current grid row's own counts)
    val term = abs(
      (col("__cuma") - col("__ca")).cast(dec) * col("n_b").cast(dec) -
        (col("__cumb") - col("__cb")).cast(dec) * col("n_a").cast(dec)) *
      (col("__s") - col("__prev")).cast(dec)
    cum.crossJoin(broadcast(totals))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(when(col("__prev").isNotNull, term)).as("__w"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(coalesce(col("__w"), lit(0).cast(dec)).cast("double") /
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double"),
            6)).as("w1"))
  }

  /** Population Stability Index of a money-valued column between a
    * baseline segment (`isBaseline` true) and the current rest — the
    * standard ML-monitoring drift score over a FIXED equal-width bin
    * grid. The ONE-SCAN segment-predicate twin of
    * [[Quality.psiReport]] (which compares two separately-read
    * snapshots): when both periods live in one table, this form bins
    * and counts both sides in a single pass, and its per-bin terms
    * are micro-nat-quantized longs so the headline total is exact
    * integer algebra. Bins: bin = cents div binWidthCents, clamped
    * into [0, nBins), so
    * bin membership is pure integer math that cannot flip across
    * engines. Counts are add-1 smoothed over the full grid (empty bins
    * included — PSI is defined on the grid, not on observed bins):
    * p_i = (base_i+1)/(n_base+nBins), q_i likewise, term_i =
    * (p_i−q_i)·ln(p_i/q_i). Returns one row per bin (bin, n_base,
    * n_cur, psi_term, psi_total) ordered by bin; per-bin terms are
    * micro-nat-quantized longs before the total sum, so psi_total is
    * exact integer algebra (order-free) with one final division.
    *
    * Scale shape: ONE map-side-combinable groupBy on ≤nBins keys, then
    * all arithmetic on the ≤nBins-row bin frame (the grid completion
    * is a broadcast join against a literal sequence) — the corpus is
    * read once and reduced to nBins rows regardless of size.
    */
  def psiDrift(df: DataFrame, valueCol: String, isBaseline: Column,
      binWidthCents: Long, nBins: Int): DataFrame = {
    require(nBins >= 2, "need nBins >= 2")
    require(binWidthCents >= 1, "need binWidthCents >= 1")
    requireNoReserved(df, Seq("bin", "__yb", "__cb", "__cc", "__nb",
      "__nc", "__p", "__q", "__tm", "n_base", "n_cur", "psi_term",
      "psi_total"))
    val spark = df.sparkSession
    val binned = df
      .select(least(greatest(
          expr(s"cast(round(`$valueCol` * 100) as long) div $binWidthCents"),
          lit(0L)), lit(nBins - 1L)).cast("int").as("bin"),
        when(isBaseline, 1L).otherwise(0L).as("__yb"))
      .groupBy("bin")
      .agg(sum("__yb").as("__cb"),
        (count(lit(1)) - sum("__yb")).as("__cc"))
    // complete the fixed grid: PSI's smoothing counts EVERY bin
    val grid = spark.range(nBins).select(col("id").cast("int").as("bin"))
    val full = grid.join(binned, Seq("bin"), "left")
      .na.fill(0L, Seq("__cb", "__cc"))
    val totals = full.agg(sum("__cb").as("__nb"), sum("__cc").as("__nc"))
    val withP = full.crossJoin(broadcast(totals))
      .withColumn("__p", (col("__cb") + 1).cast("double") /
        (col("__nb") + nBins).cast("double"))
      .withColumn("__q", (col("__cc") + 1).cast("double") /
        (col("__nc") + nBins).cast("double"))
      .withColumn("__tm",
        round((col("__p") - col("__q")) * log(col("__p") / col("__q"))
          * 1000000.0).cast("long"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // the global window is over the ≤nBins-row bin frame — bounded by
    // construction, never by the corpus
    withP
      .withColumn("psi_total",
        (sum("__tm").over(wAll) / lit(1000000.0)))
      .select(col("bin"), col("__cb").as("n_base"), col("__cc").as("n_cur"),
        (col("__tm") / lit(1000000.0)).as("psi_term"), col("psi_total"))
  }

  /** Windowed drift SERIES: PSI of every time bucket's value
    * distribution against one REFERENCE window of the same table —
    * the per-time-bucket monitoring form the one-shot two-sample ops
    * ([[ksTest]]/[[psiDrift]]/[[w1Drift]]) lack. Production drift is a
    * time series ("which week did the feature shift?"), not a single
    * statistic; this emits one row per bucket so the alert is a filter
    * on `psi` over the series (rule of thumb: > 0.25 = shifted).
    *
    * Semantics: rows where `isRef` holds form the reference histogram
    * (global, one per call); every bucket with at least one current
    * (non-reference) row gets PSI(reference → bucket) over a fixed
    * `nBins` integer-cent grid, add-1 smoothed over the FULL grid
    * (empty bins included, [[psiDrift]]'s rule). Per-bin terms are
    * micro-nat-quantized longs so each bucket's total is order-free
    * integer algebra — oracle-exact. Returns
    * (bucket, n_ref, n_cur, psi) ordered by nothing (caller sorts).
    *
    * Scale shape: ONE corpus scan into a map-side-combinable
    * groupBy(bucket, bin) — at most buckets×nBins cells regardless of
    * corpus size — which is then cached and eagerly materialized: the
    * reference histogram, the bucket totals, and the grid completion
    * are all derived from that tiny cached frame, so Catalyst cannot
    * silently re-scan the corpus per branch (the r12 exchange-reuse
    * traps; a calendar of buckets × 20 bins is kilobytes at any SF).
    */
  def driftSeries(df: DataFrame, valueCol: String, isRef: Column,
      bucket: Column, binWidthCents: Long, nBins: Int): DataFrame = {
    require(nBins >= 2, "need nBins >= 2")
    require(binWidthCents >= 1, "need binWidthCents >= 1")
    requireNoReserved(df, Seq("bucket", "bin", "__yr", "__cr", "__cc",
      "__rb", "__nr", "__ncur", "__p", "__q", "__tm", "n_ref", "n_cur",
      "psi"))
    val spark = df.sparkSession
    val cells = df
      .select(bucket.as("bucket"),
        when(isRef, 1L).otherwise(0L).as("__yr"),
        least(greatest(
          expr(s"cast(round(`$valueCol` * 100) as long) div $binWidthCents"),
          lit(0L)), lit(nBins - 1L)).cast("int").as("bin"))
      .groupBy("bucket", "bin")
      .agg(sum("__yr").as("__cr"),
        (count(lit(1)) - sum("__yr")).as("__cc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cells.count() // materialize: every branch below reads the cache
    val refHist = cells.groupBy("bin").agg(sum("__cr").as("__rb"))
    val nRef = cells.agg(sum("__cr").as("__nr"))
    val curBuckets = cells.groupBy("bucket")
      .agg(sum("__cc").as("__ncur"))
      .filter(col("__ncur") > 0)
    val grid = curBuckets.crossJoin(
      broadcast(spark.range(nBins).select(col("id").cast("int").as("bin"))))
    val full = grid
      .join(cells.select(col("bucket"), col("bin"), col("__cc")),
        Seq("bucket", "bin"), "left")
      .na.fill(0L, Seq("__cc"))
      .join(broadcast(refHist), Seq("bin"), "left")
      .na.fill(0L, Seq("__rb"))
      .crossJoin(broadcast(nRef))
    full
      .withColumn("__p", (col("__rb") + 1).cast("double") /
        (col("__nr") + nBins).cast("double"))
      .withColumn("__q", (col("__cc") + 1).cast("double") /
        (col("__ncur") + nBins).cast("double"))
      .withColumn("__tm",
        round((col("__p") - col("__q")) * log(col("__p") / col("__q"))
          * 1000000.0).cast("long"))
      .groupBy("bucket")
      .agg(max("__nr").as("n_ref"), max("__ncur").as("n_cur"),
        sum("__tm").as("__s"))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        (col("__s") / lit(1000000.0)).as("psi"))
  }

  /** Per-group Spearman rank correlation between two numeric columns
    * with textbook average-rank tie handling — the monotone-association
    * companion to [[trendSlope]]'s linear fit (drift in a feature's
    * rank relationship survives monotone transforms that break
    * Pearson). Average ranks are computed in DOUBLED integer units
    * (2·avg_rank = 2·min_rank + tie_count − 1, always an integer), so
    * the Pearson-on-ranks moments are exact decimal(38,0) sums — the
    * final division is the only float op, rounded to 6 dp. Returns
    * (groupCol, n, spearman); groups with < 2 rows or zero rank
    * variance (all-tied) yield null.
    *
    * Scale shape: two per-group rank windows + one aggregation, all
    * partitioned by the group key — partition sizes are bounded by the
    * group's row count (the catalog entry ranks per-nation DAILY
    * series, calendar-bounded at any corpus size). Not for ranking an
    * unbounded corpus under one key — that's the zipfSlope two-level
    * doctrine's job.
    */
  def spearmanByGroup(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    requireNoReserved(df, Seq("__rx", "__ry", "__n", "__sx", "__sy",
      "__sxy", "__sxx", "__syy", "n", "spearman"))
    val dec = "decimal(38,0)"
    def rank2(c: String): Column =
      lit(2) * rank().over(Window.partitionBy(groupCol).orderBy(col(c))) +
        count(lit(1)).over(Window.partitionBy(col(groupCol), col(c))) - 1
    val ranked = df
      .withColumn("__rx", rank2(xCol).cast(dec))
      .withColumn("__ry", rank2(yCol).cast(dec))
    val num = col("__n").cast(dec) * col("__sxy") - col("__sx") * col("__sy")
    val vx = col("__n").cast(dec) * col("__sxx") - col("__sx") * col("__sx")
    val vy = col("__n").cast(dec) * col("__syy") - col("__sy") * col("__sy")
    ranked.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"),
        sum("__rx").as("__sx"), sum("__ry").as("__sy"),
        sum(col("__rx") * col("__ry")).as("__sxy"),
        sum(col("__rx") * col("__rx")).as("__sxx"),
        sum(col("__ry") * col("__ry")).as("__syy"))
      .select(col(groupCol), col("__n").cast("long").as("n"),
        when(col("__n") >= 2 && vx > 0 && vy > 0,
          round(num.cast("double") /
            sqrt(vx.cast("double")) / sqrt(vy.cast("double")), 6))
          .as("spearman"))
  }
}
