package graft.engine

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
    QuerySpec("quantile_binning",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_extendedprice")
        val qd = new QuantileDiscretizer().setInputCol("l_extendedprice")
          .setOutputCol("l_extendedprice_binned").setNumBuckets(10)
          .setHandleInvalid("keep")
        qd.fit(df).transform(df)
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      None),

    // ── PolynomialExpansion(degree=2) — reference: src/feature_engineering.py:103-114
    QuerySpec("poly_features",
      (s, d) => {
        val df = lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_suppkey", "l_quantity", "l_discount")
        val va = new VectorAssembler()
          .setInputCols(Array("l_quantity", "l_discount")).setOutputCol("v")
        val pe = new PolynomialExpansion().setInputCol("v")
          .setOutputCol("v_poly").setDegree(2)
        pe.transform(va.transform(df))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"),
            transform(vector_to_array(col("v_poly")), x => round(x, 6))
              .as("poly"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      None),

    // ── PCA(k=4) over embeddings — sign-indeterminate → rows-only;
    // reconstruction invariants in ScalaTest. reference: src/feature_engineering.py:116-128
    QuerySpec("pca_features",
      (s, d) => {
        val df = embeddings(s, d)
          .select(col("vec_id"), array_to_vector(col("embedding")).as("v"))
        val pca = new PCA().setInputCol("v").setOutputCol("v_pca").setK(4)
        pca.fit(df).transform(df)
          .select(col("vec_id"),
            transform(vector_to_array(col("v_pca")), x => round(x, 6))
              .as("pca"))
          .orderBy("vec_id")
      },
      None)
  )
}
