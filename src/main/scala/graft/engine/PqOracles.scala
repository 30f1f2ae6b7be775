package graft.engine

/** Generated DuckDB twins for the product-quantization catalog entries
  * (`pq_codes`, `pq_topk`, `ivfpq_topk`) — the r12 `ann_bucketed`
  * driver-literal playbook extended to DATA-FIT literals.
  *
  * The PQ codebooks are driver-fit, seeded, and bounded
  * ([[Extensions.pqCodebookOf]]: a deterministic hash-ordered sample +
  * pure-Scala kmeans++/Lloyd), and since r13 `ivfPqTopK` assigns cells
  * by a literal float-centroid projection (the [[IvfIndex]] saved-
  * layout rule) rather than an opaque MLlib transform — so after the
  * fit, EVERYTHING the operators compute is deterministic IEEE double
  * arithmetic over known literals, and a DuckDB twin can replay it
  * bit-for-bit:
  *
  *   - every float literal enters the SQL as its shortest-round-trip
  *     double rendering (parses back to the identical double);
  *   - the kernels' per-subspace squared-L2 ([[graft.functions.PqOps]]:
  *     sequential `d += (x-c)²` over elements) is replayed as
  *     `list_dot_product(diff, diff)` over an explicit element-wise
  *     difference list — the same left-to-right accumulation the
  *     `ann_bucketed` twin already proved bit-stable;
  *   - argmins tie to the lowest code/cell (the kernels' strict-`<`
  *     ascending scan) = `row_number() OVER (ORDER BY d, c) = 1`;
  *   - ADC sums subspaces in ascending j = a left-associative
  *     four-term `+` chain; rank ties break to the lower neighbor id
  *     ([[Extensions.topKBy]]).
  *
  * The fits live in a JVM-scoped stash written by the catalog fns at
  * run time (the `hybridIdxCache` precedent): Verify runs the catalog
  * FIRST and dumps `oracle_sql.json` after, so the thunked generators
  * here see exactly the fit that produced the dumped parquet — the
  * compare can never pair an output with a stale twin. When a fit
  * never ran (partial local runs) the generators return None and the
  * entry degrades to the contract's rows-only check.
  */
private[graft] object PqOracles {

  /** Codebook thunk for the shared m=4/k=16 codebook (pq_codes +
    * pq_topk). [[Extensions.pqCodebookOf]] is pure and deterministic
    * given the corpus, so a deferred refit reproduces the operator's
    * codebook exactly; deferring keeps the fit cost out of Bench
    * timings (the thunk only runs when oracle SQL is dumped). */
  @volatile private var cb16Thunk: Option[() => Seq[Seq[Seq[Float]]]] = None
  /** The ivfpq fit captured FROM the operator run itself (float-cast
    * coarse centroids + m=4/k=256 codebook) — the coarse KMeans fit is
    * MLlib-distributed, so replay-from-capture, never refit. */
  @volatile private var ivfpqFit:
      Option[(Seq[Array[Float]], Seq[Seq[Seq[Float]]])] = None

  def stashCb16(thunk: () => Seq[Seq[Seq[Float]]]): Unit =
    cb16Thunk = Some(thunk)

  def stashIvfPq(fit: (Seq[Array[Float]], Seq[Seq[Seq[Float]]])): Unit =
    ivfpqFit = Option(fit)

  /** ann_ivf's fitted coarse centroids (float-cast), captured from the
    * operator run — same replay-not-refit doctrine. */
  @volatile private var annIvfFit: Option[Seq[Array[Float]]] = None

  def stashAnnIvf(cents: Seq[Array[Float]]): Unit =
    annIvfFit = Option(cents)

  /** The cosine_topk oracle's guarded-cosine fragment — replays
    * [[Extensions.cosine]] (zero norms → 0) with list_dot_product
    * mirroring the DotF32 sequential fold. */
  private[engine] def cosSql(a: String, b: String): String =
    s"""CASE WHEN list_dot_product($a, $a) = 0
       |                OR list_dot_product($b, $b) = 0 THEN 0
       |           ELSE list_dot_product($a, $b)
       |                / (sqrt(list_dot_product($a, $a))
       |                 * sqrt(list_dot_product($b, $b))) END""".stripMargin

  /** DuckDB twin of `ann_ivf` ([[Extensions.annIvf]]): literal
    * float-centroid cell assignment (squared-L2 argmin, ties to the
    * lowest cell — [[Extensions.nearestCellExpr]]), cosine probe
    * ranking (−cos asc, cell asc), exact cosine scoring inside probed
    * cells, (cos desc, neighbor asc) rank. */
  def annIvfSql(queryIds: Seq[Long], k: Int,
      nprobe: Int): Option[String] = annIvfFit.map { cents =>
    val dim = cents.head.length
    val ids = queryIds.mkString(", ")
    val centRows = cents.zipWithIndex
      .map { case (w, i) => s"($i, ${listLit(w.toSeq)})" }
      .mkString(",\n    ")
    val cellDl = diffList("e.emb", "", "cent.w", dim)
    s"""WITH cent(cell, w) AS (VALUES
       |    $centRows),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |celld AS (
       |  SELECT e.vec_id, cent.cell,
       |         list_dot_product($cellDl,
       |                          $cellDl) AS d
       |  FROM e, cent),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT celld.*, row_number() OVER (PARTITION BY vec_id
       |             ORDER BY d, cell) AS rn FROM celld)
       |  WHERE rn = 1),
       |qc AS (
       |  SELECT e.vec_id AS query_id, cent.cell,
       |         ${cosSql("e.emb", "cent.w")} AS c
       |  FROM e, cent WHERE e.vec_id IN ($ids)),
       |probe AS (
       |  SELECT query_id, cell FROM (
       |    SELECT qc.*, row_number() OVER (PARTITION BY query_id
       |             ORDER BY c DESC, cell) AS rn FROM qc)
       |  WHERE rn <= $nprobe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id
       |  FROM probe p JOIN asg a ON a.cell = p.cell
       |  WHERE a.vec_id <> p.query_id),
       |s AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         round(${cosSql("en.emb", "eq.emb")}, 6) AS cosine_sim
       |  FROM cand c
       |  JOIN e en ON en.vec_id = c.neighbor_id
       |  JOIN e eq ON eq.vec_id = c.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine_sim,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY cosine_sim DESC, neighbor_id)::INT AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, cosine_sim, rank
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** hybrid_topk_pruned's saved-quantizer centroids, captured from
    * this JVM's cached hybrid index (the twin itself is generated in
    * ExtensionQueries beside the shared RRF template). */
  @volatile private var hybridIvfFit: Option[Seq[Array[Float]]] = None

  def stashHybridIvf(cents: Seq[Array[Float]]): Unit =
    hybridIvfFit = Option(cents)

  def hybridIvfCents: Option[Seq[Array[Float]]] = hybridIvfFit

  /** hybrid_tree_topk's LOADED tree quantizer (the sidecar round-trip
    * of the tree-mode index the hybrid dense branch queries), captured
    * from this JVM's cached tree-mode hybrid pair — the twin itself is
    * generated in ExtensionQueries by routing the shared RRF
    * template's dense branch through [[ivfTreeSql]]'s two-level
    * assignment/probe machinery. */
  @volatile private var hybridTreeQ: Option[Extensions.TreeQuantizer] =
    None

  def stashHybridTree(tq: Extensions.TreeQuantizer): Unit =
    hybridTreeQ = Option(tq)

  def hybridTreeFit: Option[Extensions.TreeQuantizer] = hybridTreeQ

  /** knn_join_pruned's fitted blocking centroids (float-cast),
    * captured from the operator run. */
  @volatile private var knnPrunedFit: Option[Seq[Array[Float]]] = None

  def stashKnnPruned(cents: Seq[Array[Float]]): Unit =
    knnPrunedFit = Option(cents)

  /** DuckDB twin of `knn_join_pruned` ([[Extensions.knnJoin]] at
    * nprobe < nCells): EVERY row is a query — assignment and probe
    * ranking both come from the same per-(row, cell) squared-L2 table
    * (the operator's in-row sort of (d, cell) structs == the (d, cell)
    * row_number), then the guarded-cosine rescore inside probed cells
    * and the (cos desc, neighbor asc) rank. */
  def knnPrunedSql(k: Int, nprobe: Int): Option[String] =
    knnPrunedFit.map { cents =>
      val dim = cents.head.length
      val centRows = cents.zipWithIndex
        .map { case (w, i) => s"($i, ${listLit(w.toSeq)})" }
        .mkString(",\n    ")
      val cellDl = diffList("e.emb", "", "cent.w", dim)
      s"""WITH cent(cell, w) AS (VALUES
         |    $centRows),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |celld AS (
         |  SELECT e.vec_id, cent.cell,
         |         list_dot_product($cellDl,
         |                          $cellDl) AS d,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_dot_product($cellDl,
         |                                     $cellDl), cent.cell) AS rn
         |  FROM e, cent),
         |asg AS (SELECT vec_id, cell FROM celld WHERE rn = 1),
         |probe AS (SELECT vec_id AS query_id, cell FROM celld
         |          WHERE rn <= $nprobe),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probe p JOIN asg a ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id),
         |s AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         round(${cosSql("en.emb", "eq.emb")}, 6) AS cosine_sim
         |  FROM cand c
         |  JOIN e en ON en.vec_id = c.neighbor_id
         |  JOIN e eq ON eq.vec_id = c.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cosine_sim,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cosine_sim DESC, neighbor_id)::INT AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, cosine_sim, rank
         |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
    }

  /** knn_join_tree's fitted TWO-LEVEL quantizer, captured from the
    * operator run ([[Extensions.lastKnnTreeFit]]). */
  @volatile private var knnTreeFit: Option[Extensions.TreeQuantizer] = None

  def stashKnnTree(tq: Extensions.TreeQuantizer): Unit =
    knnTreeFit = Option(tq)

  /** DuckDB twin of `knn_join_tree` ([[Extensions.knnJoin]] past the
    * tree threshold) — the r16 oracle for the SCALE path. The
    * two-level rule ([[graft.functions.TreeCells]]) is a pure literal
    * projection like the flat rule, so the twin replays it exactly:
    *
    *   - assignment: nearest super by squared L2 (ties to the lower
    *     gid — the kernel's strict-< ascending scan), then nearest
    *     leaf WITHIN that group (ties to the lower cell);
    *   - probes: the `superProbe` nearest groups (ties low), then the
    *     `nprobe` nearest leaves among those groups' leaves, ascending
    *     (distance, cell) — [[graft.functions.TreeCells.probeLeaves]]'s
    *     bounded insertion select is exactly this order;
    *   - the guarded-cosine rescore inside probed cells and the
    *     (cos desc, neighbor asc) rank, shared with every knn twin.
    *
    * Distances replay as `list_dot_product(diff, diff)` over the
    * explicit element-wise difference — the kernels' sequential
    * `d += (x-c)²` fold, the ann_bucketed-proven bit-stable form;
    * float centroids enter as shortest-round-trip doubles. */
  def knnTreeSql(k: Int, nprobe: Int): Option[String] =
    knnTreeFit.map { tq =>
      val dim = tq.dim
      val superProbe = tq.superProbeFor(nprobe)
      val supRows = (0 until tq.nGroups).map { g =>
        s"($g, ${listLit(tq.supFlat.slice(g * dim, (g + 1) * dim).toSeq)})"
      }.mkString(",\n    ")
      val leafRows = (0 until tq.nLeaves).map { l =>
        val gid = tq.groupStart.indexWhere(_ > l) - 1
        s"($l, $gid, " +
          s"${listLit(tq.leafFlat.slice(l * dim, (l + 1) * dim).toSeq)})"
      }.mkString(",\n    ")
      val supDl = diffList("e.emb", "", "sup.w", dim)
      val leafDl = diffList("e.emb", "", "lv.w", dim)
      s"""WITH sup(gid, w) AS (VALUES
         |    $supRows),
         |leafv(cell, gid, w) AS (VALUES
         |    $leafRows),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |supd AS (
         |  SELECT e.vec_id, sup.gid,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_dot_product($supDl,
         |                                     $supDl), sup.gid) AS rn
         |  FROM e, sup),
         |asg AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT b.vec_id, lv.cell,
         |           row_number() OVER (PARTITION BY b.vec_id
         |             ORDER BY list_dot_product($leafDl,
         |                                       $leafDl), lv.cell) AS rn
         |    FROM supd b
         |    JOIN leafv lv ON lv.gid = b.gid
         |    JOIN e ON e.vec_id = b.vec_id
         |    WHERE b.rn = 1)
         |  WHERE rn = 1),
         |probe AS (
         |  SELECT query_id, cell FROM (
         |    SELECT pg.vec_id AS query_id, lv.cell,
         |           row_number() OVER (PARTITION BY pg.vec_id
         |             ORDER BY list_dot_product($leafDl,
         |                                       $leafDl), lv.cell) AS rn
         |    FROM supd pg
         |    JOIN leafv lv ON lv.gid = pg.gid
         |    JOIN e ON e.vec_id = pg.vec_id
         |    WHERE pg.rn <= $superProbe)
         |  WHERE rn <= $nprobe),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probe p JOIN asg a ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id),
         |s AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         round(${cosSql("en.emb", "eq.emb")}, 6) AS cosine_sim
         |  FROM cand c
         |  JOIN e en ON en.vec_id = c.neighbor_id
         |  JOIN e eq ON eq.vec_id = c.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cosine_sim,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cosine_sim DESC, neighbor_id)::INT AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, cosine_sim, rank
         |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
    }

  /** The PERSISTED tree-mode index's quantizer (the sidecar
    * round-trip a load reconstructs), captured from the ivf_tree_topk
    * catalog run — build → save → load → query, the 100 TB serving
    * shape (VERDICT r16 #5). */
  @volatile private var ivfTreeFit: Option[Extensions.TreeQuantizer] = None

  def stashIvfTree(tq: Extensions.TreeQuantizer): Unit =
    ivfTreeFit = Option(tq)

  /** DuckDB twin of `ivf_tree_topk` ([[IvfIndex.query]] on a LOADED
    * tree-built index): [[knnTreeSql]]'s two-level assignment and
    * probe machinery, with the two differences the persisted query
    * path carries —
    *
    *   - queries are a fixed id batch (corpus lookups), not all rows;
    *   - the probe set PREPENDS the query's own tree-assigned cell to
    *     the tree-ranked probes, dedups keeping FIRST occurrence, and
    *     takes the first `nprobe` — the ADVICE r15 self-cell-first
    *     rule, `slice(array_distinct(concat(array(self), pr)), 1, n)`
    *     replayed as ord-0-then-rank row_numbers.
    *
    * Same guarded-cosine rescore and (cos desc, neighbor asc) rank as
    * every knn twin; float centroids enter as shortest-round-trip
    * doubles of the SIDECAR floats (the exact values the loaded
    * kernels compare against). */
  def ivfTreeSql(queryIds: Seq[Long], k: Int,
      nprobe: Int): Option[String] =
    ivfTreeFit.map { tq =>
      val dim = tq.dim
      val superProbe = tq.superProbeFor(nprobe)
      val ids = queryIds.mkString(", ")
      val supRows = (0 until tq.nGroups).map { g =>
        s"($g, ${listLit(tq.supFlat.slice(g * dim, (g + 1) * dim).toSeq)})"
      }.mkString(",\n    ")
      val leafRows = (0 until tq.nLeaves).map { l =>
        val gid = tq.groupStart.indexWhere(_ > l) - 1
        s"($l, $gid, " +
          s"${listLit(tq.leafFlat.slice(l * dim, (l + 1) * dim).toSeq)})"
      }.mkString(",\n    ")
      val supDl = diffList("e.emb", "", "sup.w", dim)
      val leafDl = diffList("e.emb", "", "lv.w", dim)
      s"""WITH sup(gid, w) AS (VALUES
         |    $supRows),
         |leafv(cell, gid, w) AS (VALUES
         |    $leafRows),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |supd AS (
         |  SELECT e.vec_id, sup.gid,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY list_dot_product($supDl,
         |                                     $supDl), sup.gid) AS rn
         |  FROM e, sup),
         |asg AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT b.vec_id, lv.cell,
         |           row_number() OVER (PARTITION BY b.vec_id
         |             ORDER BY list_dot_product($leafDl,
         |                                       $leafDl), lv.cell) AS rn
         |    FROM supd b
         |    JOIN leafv lv ON lv.gid = b.gid
         |    JOIN e ON e.vec_id = b.vec_id
         |    WHERE b.rn = 1)
         |  WHERE rn = 1),
         |treeprobe AS (
         |  SELECT query_id, cell, rn AS ord FROM (
         |    SELECT pg.vec_id AS query_id, lv.cell,
         |           row_number() OVER (PARTITION BY pg.vec_id
         |             ORDER BY list_dot_product($leafDl,
         |                                       $leafDl), lv.cell) AS rn
         |    FROM supd pg
         |    JOIN leafv lv ON lv.gid = pg.gid
         |    JOIN e ON e.vec_id = pg.vec_id
         |    WHERE pg.rn <= $superProbe AND pg.vec_id IN ($ids))
         |  WHERE rn <= $nprobe),
         |allp AS (
         |  SELECT vec_id AS query_id, cell, 0 AS ord FROM asg
         |  WHERE vec_id IN ($ids)
         |  UNION ALL SELECT query_id, cell, ord FROM treeprobe),
         |probe AS (
         |  SELECT query_id, cell FROM (
         |    SELECT query_id, cell, ord,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY ord) AS rn FROM (
         |      SELECT query_id, cell, ord,
         |             row_number() OVER (PARTITION BY query_id, cell
         |               ORDER BY ord) AS dup FROM allp)
         |    WHERE dup = 1)
         |  WHERE rn <= $nprobe),
         |cand AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id
         |  FROM probe p JOIN asg a ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id),
         |s AS (
         |  SELECT c.query_id, c.neighbor_id,
         |         round(${cosSql("en.emb", "eq.emb")}, 6) AS cosine_sim
         |  FROM cand c
         |  JOIN e en ON en.vec_id = c.neighbor_id
         |  JOIN e eq ON eq.vec_id = c.query_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cosine_sim,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cosine_sim DESC, neighbor_id)::INT AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, cosine_sim, rank
         |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
    }

  /** quantile_binning's fitted splits (with the ±Infinity end caps
    * MLlib adds), captured from the operator run. */
  @volatile private var quantileSplits: Option[Seq[Double]] = None

  def stashQuantileSplits(splits: Seq[Double]): Unit =
    quantileSplits = Option(splits)

  /** DuckDB twin of `quantile_binning`: Bucketizer's
    * splits(j) <= x < splits(j+1) assignment as a literal CASE chain
    * over the captured splits — pure double comparisons, no
    * arithmetic, so the approx-quantile fit's indeterminacy is
    * irrelevant once the splits are literals. */
  def quantileBinningSql(): Option[String] = quantileSplits.map { sp =>
    // interior splits only: the first/last entries are ±Infinity caps
    val inner = sp.drop(1).dropRight(1)
    val whens = inner.zipWithIndex.map { case (s, j) =>
      s"WHEN l_extendedprice < $s THEN $j"
    }.mkString("\n         ")
    // handleInvalid="keep": Spark routes null/NaN to the EXTRA bucket
    // |splits|-1 — without this arm both would fall through the
    // comparisons to the last regular bucket (review finding; latent
    // on the current non-null column, wrong on any dirty one)
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |       l_extendedprice,
       |       (CASE
       |         WHEN l_extendedprice IS NULL
       |           OR isnan(l_extendedprice) THEN ${inner.length + 1}
       |         $whens
       |         ELSE ${inner.length} END)::DOUBLE
       |         AS l_extendedprice_binned
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin
  }

  /** pca_features' fitted principal components (k column vectors of
    * doubles), captured from the operator run — sign/order are
    * whatever the MLlib eigendecomposition produced; the twin replays
    * THAT, which is what dissolves the sign-indeterminacy objection
    * to a PCA oracle. */
  @volatile private var pcaFit: Option[Seq[Seq[Double]]] = None

  def stashPca(pc: Seq[Seq[Double]]): Unit = pcaFit = Option(pc)

  /** DuckDB twin of `pca_features`: four literal-component dot
    * products (list_dot_product mirroring the sequential fold). */
  def pcaSql(): Option[String] = pcaFit.map { pc =>
    def wLit(w: Seq[Double]): String =
      w.map(_.toString).mkString("[", ", ", "]")
    val cols = pc.zipWithIndex.map { case (w, j) =>
      s"round(list_dot_product(embedding::DOUBLE[],\n" +
        s"         ${wLit(w)}), 6) AS pca_${j + 1}"
    }.mkString(",\n       ")
    s"""SELECT vec_id,
       |       $cols
       |FROM embeddings ORDER BY vec_id""".stripMargin
  }

  /** quality_score_lr's fitted weights (micro-quantized longs +
    * intercept), captured from the operator run — same replay-not-refit
    * doctrine as the ivfpq fit (the LBFGS fit is distributed). */
  @volatile private var qualityLrFit: Option[(Seq[Long], Long)] = None

  def stashQualityLr(fit: (Seq[Long], Long)): Unit =
    qualityLrFit = Option(fit)

  /** DuckDB twin of `quality_score_lr`
    * ([[Extensions.qualityScoreLr]]): replays the dsir feature stream
    * (unigram+bigram md5-60 bucketing — the dsir_weights oracle
    * fragment) and scores each document by the EXACT integer dot
    * product with the inlined micro-quantized weights. */
  def qualityLrSql(buckets: Int): Option[String] = qualityLrFit.map {
    case (w, b) =>
      val wRows = w.zipWithIndex
        .map { case (wm, f) => s"($f, $wm)" }.mkString(",\n    ")
      s"""WITH w(f, wm) AS (VALUES
         |    $wRows),
         |t AS (
         |  SELECT doc_id,
         |         list_filter(string_split(lower(text), ' '),
         |                     x -> x <> '') AS toks
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         unnest(list_concat(toks,
         |           list_transform(range(1, len(toks)),
         |             i -> toks[i] || ' ' || toks[i + 1]))) AS feat
         |  FROM t),
         |docf AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5(feat), 1, 15))::BIGINT
         |           % $buckets AS f,
         |         count(*)::BIGINT AS n
         |  FROM f GROUP BY 1, 2),
         |sc AS (
         |  SELECT doc_id, sum(n)::BIGINT AS n_feats,
         |         sum(n * wm)::BIGINT + $b AS margin
         |  FROM docf JOIN w USING (f) GROUP BY doc_id)
         |SELECT doc_id, n_feats, margin / 1000000.0 AS log_odds,
         |       (CASE WHEN margin > 0 THEN 1 ELSE 0 END)::INT AS predict
         |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Thunk-keyed memo — NOT a lazy val (ADVICE r13): a JVM-lifetime
    * lazy val freezes the FIRST corpus's codebook, so a second
    * Verify/catalog pass in the same JVM against a different sf dir
    * would pair new pq_codes/pq_topk outputs with a stale twin. Keying
    * the cache on the stashed thunk's identity re-evaluates exactly
    * when [[stashCb16]] stored a new fit, and still evaluates the fit
    * at most once per stash (pqCodesSql + pqTopkSql share one refit). */
  @volatile private var cb16Memo:
      Option[(() => Seq[Seq[Seq[Float]]], Seq[Seq[Seq[Float]]])] = None
  private def cb16: Option[Seq[Seq[Seq[Float]]]] = cb16Thunk.map { t =>
    cb16Memo match {
      case Some((tt, v)) if tt eq t => v
      case _ =>
        val v = t()
        cb16Memo = Some((t, v))
        v
    }
  }

  /** Shortest-round-trip double literal of a float's exact double
    * value (Scala Double.toString — parses back bit-identical). */
  private[engine] def dlit(f: Float): String = f.toDouble.toString

  private[engine] def listLit(v: Seq[Float]): String =
    v.map(dlit).mkString("[", ", ", "]")

  /** `name(j, c, w)` VALUES rows for a rectangular codebook. */
  private def cbValues(cb: Seq[Seq[Seq[Float]]]): String =
    (for ((sub, j) <- cb.zipWithIndex; (cw, c) <- sub.zipWithIndex)
      yield s"($j, $c, ${listLit(cw)})").mkString(",\n    ")

  /** Element-wise difference list `[v[off+1]-w[1], ...]` (1-based). */
  private[engine] def diffList(v: String, off: String, w: String,
      sub: Int): String =
    (1 to sub).map(i => s"$v[$off$i] - $w[$i]")
      .mkString("[", ", ", "]")

  /** Per-(row, subspace, codeword) squared L2 — the PqOps encode/ADC
    * inner loop. `cd` covers EVERY corpus row, so the same CTE serves
    * the corpus encode (argmin per row/subspace) and the query-side
    * ADC lookups (rows restricted to the query ids). */
  private def cdCte(sub: Int): String = {
    val dl = diffList("e.emb", s"cb.j*$sub + ", "cb.w", sub)
    s"""cd AS (
       |  SELECT e.vec_id, cb.j, cb.c,
       |         list_dot_product($dl,
       |                          $dl) AS d
       |  FROM e, cb)""".stripMargin
  }

  /** Chosen code + its (minimum) distance per (row, subspace): strict-<
    * ascending scan == first minimum == lowest c among ties. */
  private val codesCte: String =
    """codes AS (
      |  SELECT vec_id, j, c, d FROM (
      |    SELECT cd.*, row_number() OVER (PARTITION BY vec_id, j
      |             ORDER BY d, c) AS rn FROM cd)
      |  WHERE rn = 1)""".stripMargin

  /** Codes pivoted wide: (vec_id, c0..c{m-1}, d0..d{m-1}). */
  private def pivotCte(m: Int): String = {
    val cols = (0 until m).flatMap(j => Seq(
      s"max(CASE WHEN j = $j THEN c END) AS c$j",
      s"max(CASE WHEN j = $j THEN d END) AS d$j")).mkString(",\n         ")
    s"""pc AS (
       |  SELECT vec_id,
       |         $cols
       |  FROM codes GROUP BY vec_id)""".stripMargin
  }

  private def sumChain(prefix: String, m: Int): String =
    (0 until m).map(j => s"$prefix$j").mkString(" + ")

  /** DuckDB twin of `pq_codes` ([[Extensions.pqQuantize]] at m=4/k=16):
    * codes from the per-subspace argmin, recon_mse = ADC of the row's
    * own codes / dim — the distance to the argmin codeword IS the min,
    * so d0..d3 are reused directly. */
  def pqCodesSql(): Option[String] = cb16.map { cb =>
    val m = cb.size
    val sub = cb.head.head.size
    val dim = m * sub
    val codeCols = (0 until m).map(j => s"c$j").mkString(", ")
    s"""WITH cb(j, c, w) AS (VALUES
       |    ${cbValues(cb)}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |${cdCte(sub)},
       |$codesCte,
       |${pivotCte(m)}
       |SELECT vec_id,
       |       concat_ws(',', $codeCols) AS codes,
       |       round((${sumChain("d", m)}) / $dim, 6) AS recon_mse
       |FROM pc ORDER BY vec_id""".stripMargin
  }

  /** Query-side ADC join: for each candidate (query, neighbor) pair,
    * the score is the sum over ascending subspaces of the query's
    * distance to the neighbor's codeword — one qd lookup per
    * subspace. */
  private def adcJoins(m: Int, candTable: String): String =
    (0 until m).map(j =>
      s"  JOIN qd q$j ON q$j.query_id = $candTable.query_id " +
        s"AND q$j.j = $j AND q$j.c = $candTable.c$j").mkString("\n")

  /** DuckDB twin of `pq_topk` ([[Extensions.pqTopK]] at m=4/kCode=16):
    * full-precision queries scored against the encoded corpus by ADC,
    * rank ties to the lower neighbor id. */
  def pqTopKSql(queryIds: Seq[Long], k: Int): Option[String] =
    cb16.map { cb =>
      val m = cb.size
      val sub = cb.head.head.size
      val ids = queryIds.mkString(", ")
      s"""WITH cb(j, c, w) AS (VALUES
         |    ${cbValues(cb)}),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
         |${cdCte(sub)},
         |$codesCte,
         |${pivotCte(m)},
         |qd AS (SELECT vec_id AS query_id, j, c, d FROM cd
         |       WHERE vec_id IN ($ids)),
         |cand AS (
         |  SELECT q.vec_id AS query_id, pc.*
         |  FROM pc, (SELECT vec_id FROM e WHERE vec_id IN ($ids)) q
         |  WHERE pc.vec_id <> q.vec_id),
         |sc AS (
         |  SELECT cand.query_id, cand.vec_id AS neighbor_id,
         |         round(${(0 until m).map(j => s"q$j.d").mkString(" + ")},
         |               6) AS adc_dist
         |  FROM cand
         |${adcJoins(m, "cand")}),
         |r AS (
         |  SELECT query_id, neighbor_id, adc_dist,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY adc_dist, neighbor_id)::INT AS rank
         |  FROM sc)
         |SELECT query_id, neighbor_id, adc_dist, rank
         |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
    }

  /** DuckDB twin of `ivfpq_topk` ([[Extensions.ivfPqTopK]] defaults):
    * float-centroid cell assignment (celld serves BOTH the corpus
    * assignment and the query probe — the operator computes the same
    * distance for both), ADC over the probed cells' codes, bounded
    * shortlist, exact squared-L2 re-rank. */
  def ivfpqSql(queryIds: Seq[Long], k: Int, nprobe: Int,
      refineFactor: Int): Option[String] = ivfpqFit.map { case (cents, cb) =>
    val m = cb.size
    val sub = cb.head.head.size
    val dim = m * sub
    val ids = queryIds.mkString(", ")
    val centRows = cents.zipWithIndex
      .map { case (w, i) => s"($i, ${listLit(w.toSeq)})" }
      .mkString(",\n    ")
    val cellDl = diffList("e.emb", "", "cent.w", dim)
    val refDl = diffList("en.emb", "", "eq_w", dim)
    val adcSum = (0 until m).map(j => s"q$j.d").mkString(" + ")
    s"""WITH cent(cell, w) AS (VALUES
       |    $centRows),
       |cb(j, c, w) AS (VALUES
       |    ${cbValues(cb)}),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |celld AS (
       |  SELECT e.vec_id, cent.cell,
       |         list_dot_product($cellDl,
       |                          $cellDl) AS d
       |  FROM e, cent),
       |asg AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT celld.*, row_number() OVER (PARTITION BY vec_id
       |             ORDER BY d, cell) AS rn FROM celld)
       |  WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS query_id, cell FROM (
       |    SELECT celld.*, row_number() OVER (PARTITION BY vec_id
       |             ORDER BY d, cell) AS rn FROM celld
       |    WHERE vec_id IN ($ids))
       |  WHERE rn <= $nprobe),
       |${cdCte(sub)},
       |$codesCte,
       |${pivotCte(m)},
       |qd AS (SELECT vec_id AS query_id, j, c, d FROM cd
       |       WHERE vec_id IN ($ids)),
       |cand AS (
       |  SELECT p.query_id, pc.*
       |  FROM probe p
       |  JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |  JOIN pc ON pc.vec_id = a.vec_id),
       |sc AS (
       |  SELECT cand.query_id, cand.vec_id AS neighbor_id,
       |         round($adcSum, 6) AS adc_dist
       |  FROM cand
       |${adcJoins(m, "cand")}),
       |sl AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT sc.*, row_number() OVER (PARTITION BY query_id
       |             ORDER BY adc_dist, neighbor_id) AS rn FROM sc)
       |  WHERE rn <= ${k * refineFactor}),
       |ref AS (
       |  SELECT sl.query_id, sl.neighbor_id,
       |         round(list_dot_product($refDl,
       |                                $refDl), 6) AS l2_dist
       |  FROM sl
       |  JOIN e en ON en.vec_id = sl.neighbor_id
       |  JOIN (SELECT vec_id, emb AS eq_w FROM e) eq
       |    ON eq.vec_id = sl.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, l2_dist,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY l2_dist, neighbor_id)::INT AS rank
       |  FROM ref)
       |SELECT query_id, neighbor_id, l2_dist, rank
       |FROM r WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }
}
