package graft.engine

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{PCA, PolynomialExpansion, QuantileDiscretizer, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.functions._

/** ML-operator catalog entries (SURVEY.md §2.9). StringIndexer and
  * StandardScaler have exactly-SQL-expressible math, so they get real
  * oracle twins — the DuckDB SQL independently recomputes what the
  * fitted MLlib transformer must produce. Approx/seeded/sign-
  * indeterminate ops (QuantileDiscretizer, PCA, KMeans) register
  * rows-only and are ScalaTest-covered (SURVEY.md §5).
  */
object MLQueries {

  import Tables._

  val catalog: Seq[QuerySpec] = Seq(

    // ── StringIndexer(handleInvalid=keep, frequencyDesc) — ties broken
    // alphabetically per Spark docs; the oracle recomputes the ordinal as
    // dense_rank(count desc, value asc) - 1 — reference: src/ml_pipeline.py:88-90
    QuerySpec("string_indexer",
      (s, d) => {
        val df = customer(s, d)
        val si = new StringIndexer().setInputCol("c_mktsegment")
          .setOutputCol("seg_idx").setHandleInvalid("keep")
          .setStringOrderType("frequencyDesc")
        si.fit(df).transform(df)
          .select("c_custkey", "c_mktsegment", "seg_idx")
          .orderBy("c_custkey")
      },
      Some("""WITH cnt AS (
             |  SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1),
             |idx AS (
             |  SELECT c_mktsegment,
             |         (dense_rank() OVER (ORDER BY n DESC, c_mktsegment ASC) - 1)
             |           ::DOUBLE AS seg_idx
             |  FROM cnt)
             |SELECT c.c_custkey, c.c_mktsegment, i.seg_idx
             |FROM customer c JOIN idx i USING (c_mktsegment)
             |ORDER BY c_custkey""".stripMargin)),

    // ── StandardScaler(withStd, !withMean): divide by sample stddev of the
    // fit data — reference: src/ml_pipeline.py:105-111
    QuerySpec("standard_scaler",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        val va = new VectorAssembler()
          .setInputCols(Array("l_quantity", "l_extendedprice"))
          .setOutputCol("features_raw")
        val scaler = new StandardScaler().setInputCol("features_raw")
          .setOutputCol("features").setWithStd(true).setWithMean(false)
        val assembled = va.transform(df)
        val scaled = scaler.fit(assembled).transform(assembled)
        scaled.select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            round(vector_to_array(col("features"))(0), 6).as("q_scaled"),
            round(vector_to_array(col("features"))(1), 6).as("p_scaled"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""WITH s AS (
             |  SELECT stddev(l_quantity) AS sq, stddev(l_extendedprice) AS sp
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       round(l_quantity / sq, 6) AS q_scaled,
             |       round(l_extendedprice / sp, 6) AS p_scaled
             |FROM lineitem CROSS JOIN s
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── QuantileDiscretizer(10, handleInvalid=keep): Greenwald-Khanna
    // approx quantiles — not bit-reproducible cross-engine by design →
    // rows-only; monotonicity ScalaTest-checked.
    // reference: src/feature_engineering.py:87-101
    // ── ORACLE-exact since r13: the fitted SPLITS are driver-known
    // literals after the approx-quantile fit, and Bucketizer's
    // assignment is pure double comparison (splits(j) <= x <
    // splits(j+1)) — no arithmetic at all — so the twin replays the
    // binning as a literal CASE chain regardless of how approximate
    // the sketch that CHOSE the splits was ──────────────────────────────
    QuerySpec("quantile_binning",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_extendedprice")
        val qd = new QuantileDiscretizer().setInputCol("l_extendedprice")
          .setOutputCol("l_extendedprice_binned").setNumBuckets(10)
          .setHandleInvalid("keep")
        val model = qd.fit(df)
        PqOracles.stashQuantileSplits(model.getSplits.toSeq)
        model.transform(df)
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      None,
      lazyOracle = Some(() => PqOracles.quantileBinningSql())),

    // ── PolynomialExpansion(degree=2) — reference: src/feature_engineering.py:103-114
    // Spark's expansion order for (x, y) is (x, x², y, x·y, y²) — plain
    // double products, so the oracle recomputes each component exactly.
    // Emitted as scalar columns (the driver comparator can't hash arrays).
    QuerySpec("poly_features",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity", "l_discount")
        val va = new VectorAssembler()
          .setInputCols(Array("l_quantity", "l_discount")).setOutputCol("v")
        val pe = new PolynomialExpansion().setInputCol("v")
          .setOutputCol("v_poly").setDegree(2)
        val arr = vector_to_array(col("v_poly"))
        pe.transform(va.transform(df))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"),
            round(arr(0), 6).as("poly_x"),
            round(arr(1), 6).as("poly_x2"),
            round(arr(2), 6).as("poly_y"),
            round(arr(3), 6).as("poly_xy"),
            round(arr(4), 6).as("poly_y2"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       round(l_quantity, 6) AS poly_x,
             |       round(l_quantity * l_quantity, 6) AS poly_x2,
             |       round(l_discount, 6) AS poly_y,
             |       round(l_quantity * l_discount, 6) AS poly_xy,
             |       round(l_discount * l_discount, 6) AS poly_y2
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── OneHotEncoder(dropLast) over a frequencyDesc StringIndexer —
    // the oracle rebuilds the exact one-hot string from the recomputed
    // ordinal (reference: src/feature_engineering.py:9, unused import
    // made real). Indexer uses handleInvalid=error: every category is
    // seen at fit, so vector size = distinct categories − 1.
    QuerySpec("onehot_encode",
      (s, d) => {
        val df = customer(s, d)
        val si = new StringIndexer().setInputCol("c_mktsegment")
          .setOutputCol("seg_idx").setStringOrderType("frequencyDesc")
        val ohe = MLPipe.oneHotStage("seg_idx", "seg_vec")
        new Pipeline().setStages(Array(si, ohe)).fit(df).transform(df)
          .select(col("c_custkey"), col("c_mktsegment"), col("seg_idx"),
            concat_ws(",", transform(vector_to_array(col("seg_vec")),
              x => x.cast("int").cast("string"))).as("onehot"))
          .orderBy("c_custkey")
      },
      Some("""WITH cnt AS (
             |  SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1),
             |idx AS (
             |  SELECT c_mktsegment,
             |         (dense_rank() OVER (ORDER BY n DESC, c_mktsegment ASC) - 1)
             |           ::DOUBLE AS seg_idx
             |  FROM cnt),
             |tot AS (SELECT count(*)::INT AS ncat FROM cnt)
             |SELECT c.c_custkey, c.c_mktsegment, i.seg_idx,
             |       array_to_string(list_transform(range(0, ncat - 1),
             |         j -> CASE WHEN j = i.seg_idx::INT THEN 1 ELSE 0 END), ',')
             |         AS onehot
             |FROM customer c JOIN idx i USING (c_mktsegment) CROSS JOIN tot
             |ORDER BY c_custkey""".stripMargin)),

    // ── Bucketizer with explicit splits ([a,b) intervals, last closed at
    // +inf) — reference: src/feature_engineering.py:10, unused import
    // made real
    QuerySpec("bucketizer_bins",
      (s, d) => MLPipe.bucketizerStage("l_extendedprice", "price_bucket",
          Array(Double.NegativeInfinity, 5000.0, 20000.0, 50000.0,
            Double.PositiveInfinity))
        .transform(lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_extendedprice"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l_extendedprice,
             |       (CASE WHEN l_extendedprice < 5000 THEN 0
             |             WHEN l_extendedprice < 20000 THEN 1
             |             WHEN l_extendedprice < 50000 THEN 2
             |             ELSE 3 END)::DOUBLE AS price_bucket
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── Interaction (elementwise product space of the inputs; two
    // scalars → their product) — reference: src/feature_engineering.py:11
    QuerySpec("interaction_product",
      (s, d) => MLPipe.interactionStage(Seq("l_quantity", "l_discount"), "qxd")
        .transform(lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity", "l_discount"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"),
          round(vector_to_array(col("qxd"))(0), 6).as("q_x_d"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       round(l_quantity * l_discount, 6) AS q_x_d
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── SQLTransformer (__THIS__ substitution) — reference:
    // src/feature_engineering.py:12
    QuerySpec("sql_transformer_stage",
      (s, d) => MLPipe.sqlTransformerStage(
          """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
            |       l_quantity * l_extendedprice AS qty_price
            |FROM __THIS__""".stripMargin)
        .transform(lineitem(s, d))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l_quantity * l_extendedprice AS qty_price
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── PCA(k=4) over embeddings — sign-indeterminate → rows-only;
    // reconstruction invariants in ScalaTest. Components emitted as
    // scalar columns (driver comparator can't hash array cells).
    // reference: src/feature_engineering.py:116-128
    // ── PCA projection, ORACLE-exact since r13: the fit stays MLlib
    // (distributed covariance + eigendecomposition, sign/order
    // captured as-is), but the PROJECTION is a literal dot product
    // with the fitted components — MLlib's transform is a BLAS gemm
    // the oracle can't replay; the sequential fold is the identical
    // math in a replayable order, and at 100 TB the scoring pass
    // carries no model object (the quality_score_lr doctrine) ───────────
    QuerySpec("pca_features",
      (s, d) => {
        val df = embeddings(s, d)
          .select(col("vec_id"), array_to_vector(col("embedding")).as("v"))
        val model = new PCA().setInputCol("v").setOutputCol("v_pca")
          .setK(4).fit(df)
        val pc: Seq[Seq[Double]] = (0 until 4).map(j =>
          (0 until model.pc.numRows).map(i => model.pc(i, j)))
        PqOracles.stashPca(pc)
        // DotF32 handles (array<float>, array<double>) natively — the
        // same sequential x.toDouble*c accumulation as the HOF fold,
        // without allocating a zip array per row per component
        def proj(j: Int) = round(
          graft.functions.DotF32.dotF32(col("embedding"),
            typedLit(pc(j))), 6)
        embeddings(s, d).select(col("vec_id"),
            proj(0).as("pca_1"), proj(1).as("pca_2"),
            proj(2).as("pca_3"), proj(3).as("pca_4"))
          .orderBy("vec_id")
      },
      None,
      lazyOracle = Some(() => PqOracles.pcaSql())),


    // ── MinMaxScaler to [0,1]: fit is a global min/max agg, transform a
    // broadcast projection — oracle replays it as a CROSS JOIN with the
    // 1-row extremes ─────────────────────────────────────────────────────
    QuerySpec("minmax_scaler",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        val va = new VectorAssembler()
          .setInputCols(Array("l_quantity", "l_extendedprice"))
          .setOutputCol("__raw")
        val st = MLPipe.minMaxStage("__raw", "__scaled")
        val assembled = va.transform(df)
        st.fit(assembled).transform(assembled)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            round(vector_to_array(col("__scaled"))(0), 6).as("q_scaled"),
            round(vector_to_array(col("__scaled"))(1), 6).as("p_scaled"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""WITH s AS (
             |  SELECT min(l_quantity) AS qlo, max(l_quantity) AS qhi,
             |         min(l_extendedprice) AS plo, max(l_extendedprice) AS phi
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       round((l_quantity - qlo) / (qhi - qlo), 6) AS q_scaled,
             |       round((l_extendedprice - plo) / (phi - plo), 6) AS p_scaled
             |FROM lineitem CROSS JOIN s
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── MaxAbsScaler: divide by max |x| per column (no shift) ────────────
    QuerySpec("maxabs_scaler",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        val va = new VectorAssembler()
          .setInputCols(Array("l_quantity", "l_extendedprice"))
          .setOutputCol("__raw")
        val st = MLPipe.maxAbsStage("__raw", "__scaled")
        val assembled = va.transform(df)
        st.fit(assembled).transform(assembled)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            round(vector_to_array(col("__scaled"))(0), 6).as("q_scaled"),
            round(vector_to_array(col("__scaled"))(1), 6).as("p_scaled"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""WITH s AS (
             |  SELECT max(abs(l_quantity)) AS qa, max(abs(l_extendedprice)) AS pa
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       round(l_quantity / qa, 6) AS q_scaled,
             |       round(l_extendedprice / pa, 6) AS p_scaled
             |FROM lineitem CROSS JOIN s
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── Normalizer(p=2): pure per-row projection, no fit, no exchange ────
    QuerySpec("l2_normalizer",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        val va = new VectorAssembler()
          .setInputCols(Array("l_quantity", "l_extendedprice"))
          .setOutputCol("__raw")
        val st = MLPipe.normalizerStage("__raw", "__norm")
        st.transform(va.transform(df))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            round(vector_to_array(col("__norm"))(0), 6).as("q_unit"),
            round(vector_to_array(col("__norm"))(1), 6).as("p_unit"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |  round(l_quantity /
             |    sqrt(l_quantity*l_quantity + l_extendedprice*l_extendedprice), 6) AS q_unit,
             |  round(l_extendedprice /
             |    sqrt(l_quantity*l_quantity + l_extendedprice*l_extendedprice), 6) AS p_unit
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── Binarizer: STRICT > threshold → 1.0 (MLlib edge semantics) ───────
    QuerySpec("binarizer_flag",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity")
        val st = MLPipe.binarizerStage("l_quantity", "q_flag",
          threshold = 25.0)
        st.transform(df)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"), col("q_flag"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       CASE WHEN l_quantity > 25.0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS q_flag
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin))
  )
}
