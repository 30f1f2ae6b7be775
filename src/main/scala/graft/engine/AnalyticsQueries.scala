package graft.engine

import org.apache.spark.sql.functions._

/** Catalog entries for the [[Analytics]] operators, with DuckDB oracle
  * twins (same determinism conventions as [[Relational]]: epoch
  * seconds, dtype-aligned casts, round only what cannot flip).
  */
object AnalyticsQueries {

  import Tables._

  private val EpochS = "epoch_us(ts)//1000000"

  private val NdcgK = 10
  private val NdcgQueryIds = Seq(0L, 1L, 2L, 3L, 4L)
  private val KCoreK = 3
  private val LabelPropRounds = 4

  /** Generated DuckDB twin for `k_core`: the peel unrolled — alive0 =
    * nodes with degree ≥ k in the canonical symmetric co-purchase
    * graph, alive_i = nodes with ≥ k neighbors whose BOTH endpoints
    * survive alive_{i-1}. `rounds` must be ≥ the actual fixpoint
    * depth (extra rounds are idempotent — the alive set stops
    * changing, so any surplus depth returns the identical set). The
    * alive CTEs are AS MATERIALIZED: each references its predecessor
    * twice, so DuckDB's default CTE inlining would blow the plan up
    * 2^rounds-fold. */
  /** The co-purchase part graph both k_core and label_prop run on:
    * parts sharing ≥2 orders, canonical und edges, symmetric closure.
    * One Scala source feeds the Spark builder AND the oracle CTE
    * prefix so the two entries cannot drift apart. */
  private val CoPurchaseSymSql: String =
    """li AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |und AS (
      |  SELECT a.l_partkey AS s, b.l_partkey AS t
      |  FROM li a JOIN li b USING (l_orderkey)
      |  WHERE a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS MATERIALIZED (SELECT s AS n, t AS m FROM und
      |        UNION ALL SELECT t, s FROM und)""".stripMargin

  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
      // pinned post-agg repartition (opt r19, §2.4 — the edge_jaccard
      // stage-probe rationale): AQE coalesces the byte-light basket
      // table under the CPU-heavy in-array pair explode
      .repartition(s.sparkContext.defaultParallelism)
      .select(explode(flatten(transform(col("__items"), (a, i) =>
        transform(
          slice(col("__items"), i + lit(2), size(col("__items"))),
          b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
      .select(col("__p.part_a"), col("__p.part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("__co"))
      .filter(col("__co") >= 2)

  private def kCoreOracleSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "alive0" else s"alive${i - 1}"
      s"""alive$i AS MATERIALIZED (
         |  SELECT y.n FROM sym y
         |  JOIN $prev a ON a.n = y.n
         |  JOIN $prev b ON b.n = y.m
         |  GROUP BY y.n HAVING count(*) >= $k)""".stripMargin
    }.mkString(",\n")
    s"""WITH $CoPurchaseSymSql,
       |alive0 AS MATERIALIZED (
       |  SELECT n FROM sym GROUP BY n HAVING count(*) >= $k),
       |$steps
       |SELECT y.n AS part_id, count(*)::BIGINT AS core_degree
       |FROM sym y
       |JOIN alive$rounds a ON a.n = y.n
       |JOIN alive$rounds b ON b.n = y.m
       |GROUP BY 1 HAVING count(*) >= $k ORDER BY part_id""".stripMargin
  }

  /** Generated DuckDB twin for `label_prop`: the synchronous vote
    * recurrence unrolled to exactly `rounds` rounds — lab_i = per-node
    * argmax (count DESC, label ASC) over neighbor labels from
    * lab_{i-1} plus the self-vote. AS MATERIALIZED for the same
    * 2^rounds-inlining reason as k_core. */
  private def labelPropOracleSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = s"lab${i - 1}"
      s"""lab$i AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (
         |        PARTITION BY node ORDER BY c DESC, label ASC) AS rn
         |    FROM (
         |      SELECT node, label, count(*) AS c FROM (
         |        SELECT e.n AS node, l.label FROM sym e
         |        JOIN $prev l ON l.node = e.m
         |        UNION ALL SELECT node, label FROM $prev) v$i
         |      GROUP BY 1, 2) c$i) r$i
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $CoPurchaseSymSql,
       |lab0 AS MATERIALIZED (
       |  SELECT DISTINCT n AS node, n AS label FROM sym),
       |$steps
       |SELECT node AS part_id, label FROM lab$rounds
       |ORDER BY part_id""".stripMargin
  }
  // the SAME Scala-computed micro-unit discount constants feed the
  // Spark literal array AND this SQL — no cross-engine log2 involved
  private def ndcgDiscountValues: String =
    Analytics.ndcgDiscounts(NdcgK).zipWithIndex
      .map { case (d, i) => s"(${i + 1}, ${d}::BIGINT)" }.mkString(", ")
  private def ndcgPrefixValues: String =
    Analytics.ndcgDiscounts(NdcgK).scanLeft(0L)(_ + _).tail.zipWithIndex
      .map { case (d, i) => s"(${i + 1}, ${d}::BIGINT)" }.mkString(", ")

  val catalog: Seq[QuerySpec] = Seq(

    // ── strict ordered funnel with a 3-day per-step deadline: one user
    // exchange, stacked conditional-min windows ──────────────────────────
    QuerySpec("funnel_steps",
      (s, d) => Analytics.funnel(events(s, d), "user_id", "event_type", "ts",
          Seq("signup", "view", "click", "purchase"),
          deadlineSeconds = Some(259200L))
        .orderBy("step"),
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, $EpochS AS t FROM events),
             |w1 AS (SELECT *, min(CASE WHEN event_type='signup' THEN t END)
             |         OVER (PARTITION BY user_id) AS t1 FROM e),
             |w2 AS (SELECT *, min(CASE WHEN event_type='view'
             |           AND t > t1 AND t <= t1 + 259200 THEN t END)
             |         OVER (PARTITION BY user_id) AS t2 FROM w1),
             |w3 AS (SELECT *, min(CASE WHEN event_type='click'
             |           AND t > t2 AND t <= t2 + 259200 THEN t END)
             |         OVER (PARTITION BY user_id) AS t3 FROM w2),
             |w4 AS (SELECT *, min(CASE WHEN event_type='purchase'
             |           AND t > t3 AND t <= t3 + 259200 THEN t END)
             |         OVER (PARTITION BY user_id) AS t4 FROM w3),
             |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2,
             |             max(t3) AS t3, max(t4) AS t4 FROM w4 GROUP BY 1)
             |SELECT 1 AS step, 'signup' AS event_type,
             |       CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS users_reached FROM u
             |UNION ALL SELECT 2, 'view',
             |       CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) FROM u
             |UNION ALL SELECT 3, 'click',
             |       CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) FROM u
             |UNION ALL SELECT 4, 'purchase',
             |       CAST(sum(CASE WHEN t4 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) FROM u
             |ORDER BY step""".stripMargin)),

    // ── daily cohort retention over high-value purchases ────────────────
    QuerySpec("cohort_retention",
      (s, d) => Analytics.cohortRetention(
          events(s, d).filter(col("event_type") === "purchase" &&
            col("value") > 90),
          "user_id", "ts", bucketSeconds = 86400L)
        .orderBy("cohort_bucket", "bucket_offset"),
      Some(s"""WITH e AS (
             |  SELECT user_id, ($EpochS)//86400 AS b FROM events
             |  WHERE event_type = 'purchase' AND value > 90),
             |f AS (SELECT *, min(b) OVER (PARTITION BY user_id) AS cb FROM e),
             |d AS (SELECT DISTINCT user_id, cb, b FROM f)
             |SELECT cb AS cohort_bucket, (b - cb) AS bucket_offset,
             |       count(*)::BIGINT AS active_users
             |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── CDC merge: price-bump updates on every 10th order (deleting
    // key%100=7), inserts keyed +10M — one full-outer join ───────────────
    QuerySpec("merge_upsert",
      (s, d) => {
        val o = orders(s, d)
        val updates = o.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 100.0).as("o_totalprice"),
            lit("U").as("o_orderstatus"),
            (col("o_orderkey") % 100 === 7).as("del"))
          .unionAll(o.filter(col("o_orderkey") % 1000 === 1)
            .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
              col("o_totalprice"), lit("I").as("o_orderstatus"),
              lit(false).as("del")))
        Analytics.mergeUpsert(o, updates, Seq("o_orderkey"),
            deleteCol = Some("del"))
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""WITH upd AS (
             |  SELECT o_orderkey, o_totalprice + 100.0 AS o_totalprice,
             |         'U' AS o_orderstatus, (o_orderkey % 100 = 7) AS del
             |  FROM orders WHERE o_orderkey % 10 = 0
             |  UNION ALL
             |  SELECT o_orderkey + 10000000, o_totalprice, 'I', false
             |  FROM orders WHERE o_orderkey % 1000 = 1),
             |m AS (
             |  SELECT coalesce(t.o_orderkey, u.o_orderkey) AS o_orderkey,
             |         CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
             |              ELSE t.o_totalprice END AS o_totalprice,
             |         CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus
             |              ELSE t.o_orderstatus END AS o_orderstatus,
             |         t.o_custkey, coalesce(u.del, false) AS del
             |  FROM orders t FULL OUTER JOIN upd u USING (o_orderkey))
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM m WHERE NOT del ORDER BY o_orderkey""".stripMargin)),

    // ── deterministic weighted sample (Efraimidis–Spirakis, md5-derived
    // uniforms — 52-bit so the BIGINT→DOUBLE oracle is lossless) ─────────
    QuerySpec("weighted_sample",
      (s, d) => Analytics.weightedSample(
          orders(s, d), "o_orderkey", "o_totalprice", n = 100)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
      Some("""WITH w AS (
             |  SELECT o_orderkey, o_totalprice,
             |         -ln((('0x' || substr(md5(o_orderkey::VARCHAR), 1, 13))::BIGINT + 1)
             |             / 4503599627370496.0) / o_totalprice AS score
             |  FROM orders WHERE o_totalprice > 0)
             |SELECT o_orderkey, o_totalprice FROM (
             |  SELECT * FROM w ORDER BY score, o_orderkey LIMIT 100)
             |ORDER BY o_orderkey""".stripMargin)),

    // ── int8 embedding quantization: projection-only HOFs; integer code
    // checksum is the engine-independent fingerprint ─────────────────────
    QuerySpec("embed_quantize",
      (s, d) => Analytics.quantizeEmbeddings(embeddings(s, d),
          "embedding", "vec_id")
        .orderBy("vec_id"),
      Some("""WITH q AS (
             |  SELECT vec_id, len(embedding)::INT AS n_dims,
             |         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax,
             |         list_transform(embedding, x -> x::DOUBLE) AS e
             |  FROM embeddings),
             |z AS (
             |  SELECT vec_id, n_dims, amax / 127.0 AS scale,
             |         CASE WHEN amax = 0 THEN list_transform(e, x -> 0.0)
             |              ELSE list_transform(e, x -> greatest(-127.0,
             |                least(127.0, round(x / (amax/127.0), 0)))) END AS qv,
             |         e
             |  FROM q)
             |SELECT vec_id, n_dims, scale AS quant_scale,
             |       CAST(list_sum(list_transform(qv, x -> x::BIGINT)) AS BIGINT) AS q_checksum,
             |       round(list_max(list_transform(list_zip(e, qv),
             |         p -> abs(p[1] - p[2] * scale))), 6) AS max_abs_err
             |FROM z ORDER BY vec_id""".stripMargin)),

    // ── 3-iteration PageRank over the bipartite customer↔supplier graph
    // (supplier ids offset into a disjoint space; both directions so no
    // node is dangling) ──────────────────────────────────────────────────
    QuerySpec("pagerank_fixed",
      (s, d) => {
        val pairs = orders(s, d).filter(col("o_orderkey") % 20 === 0)
          .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"),
            (col("l_suppkey") + 1000000L).as("s"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
        Analytics.pageRank(edges, "src", "dst", iters = 3, damping = 0.85)
          .select(col("id").as("node_id"), round(col("pagerank"), 9)
            .as("pagerank"))
          .orderBy("node_id")
      },
      Some("""WITH pairs AS (
             |  SELECT DISTINCT o.o_custkey AS c, l.l_suppkey + 1000000 AS s
             |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |  WHERE o.o_orderkey % 20 = 0),
             |edges AS (SELECT c AS src, s AS dst FROM pairs
             |          UNION ALL SELECT s, c FROM pairs),
             |nodes AS (SELECT DISTINCT src AS id FROM edges),
             |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
             |outdeg AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY 1),
             |pr0 AS (SELECT id, 1.0/(SELECT n FROM nn) AS pr FROM nodes),
             |it1 AS (SELECT n.id, 0.15/(SELECT n FROM nn) + 0.85*coalesce(s.c, 0.0) AS pr
             |        FROM nodes n LEFT JOIN (
             |          SELECT e.dst AS id, sum(p.pr/d.deg) AS c FROM pr0 p
             |          JOIN edges e ON p.id = e.src
             |          JOIN outdeg d ON e.src = d.src GROUP BY 1) s ON n.id = s.id),
             |it2 AS (SELECT n.id, 0.15/(SELECT n FROM nn) + 0.85*coalesce(s.c, 0.0) AS pr
             |        FROM nodes n LEFT JOIN (
             |          SELECT e.dst AS id, sum(p.pr/d.deg) AS c FROM it1 p
             |          JOIN edges e ON p.id = e.src
             |          JOIN outdeg d ON e.src = d.src GROUP BY 1) s ON n.id = s.id),
             |it3 AS (SELECT n.id, 0.15/(SELECT n FROM nn) + 0.85*coalesce(s.c, 0.0) AS pr
             |        FROM nodes n LEFT JOIN (
             |          SELECT e.dst AS id, sum(p.pr/d.deg) AS c FROM it2 p
             |          JOIN edges e ON p.id = e.src
             |          JOIN outdeg d ON e.src = d.src GROUP BY 1) s ON n.id = s.id)
             |SELECT id AS node_id, round(pr, 9) AS pagerank FROM it3
             |ORDER BY node_id""".stripMargin)),

    // ── per-node triangle counts over the part co-purchase graph (part
    // pairs sharing ≥2 orders): degree-oriented wedge join — oriented
    // out-degree capped at O(√m) per node on any graph, each triangle
    // found exactly once at its minimum-degree corner; the oracle is
    // the canonical x<y<z three-edge enumeration ─────────────────────────
    QuerySpec("triangle_count",
      (s, d) => {
        // edge build uses the same in-array pair form as basketAffinity:
        // one rollup per order, ordered pairs generated inside the sorted
        // part array — no orderkey self-join, no second shuffle of the
        // item stream; collect_set dedups in-aggregate, so the scan
        // needs no separate distinct exchange at all
        val edges = lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
          .groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
          // pinned post-agg repartition (opt r19, §2.4): AQE coalesces
          // the byte-light basket table to ~4 partitions, starving the
          // CPU-heavy in-array pair explode downstream (stage probe:
          // 3.4 s CPU on 4 tasks). Rows unchanged; downstream is
          // key-aggregated, order-free.
          .repartition(s.sparkContext.defaultParallelism)
          .select(explode(flatten(transform(col("__items"), (a, i) =>
            transform(
              slice(col("__items"), i + lit(2), size(col("__items"))),
              b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
          .select(col("__p.part_a"), col("__p.part_b"))
          .groupBy("part_a", "part_b").agg(count(lit(1)).as("__co"))
          .filter(col("__co") >= 2)
        Analytics.triangleCount(edges, "part_a", "part_b",
            outCol = "part_id")
          .orderBy("part_id")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (
             |  SELECT a.l_partkey AS a, b.l_partkey AS b
             |  FROM li a JOIN li b USING (l_orderkey)
             |  WHERE a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 2),
             |tri AS (
             |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |  FROM e e1
             |  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
             |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
             |n AS (
             |  SELECT x AS part_id FROM tri
             |  UNION ALL SELECT y FROM tri
             |  UNION ALL SELECT z FROM tri)
             |SELECT part_id, count(*)::BIGINT AS triangles
             |FROM n GROUP BY 1 ORDER BY part_id""".stripMargin)),

    // ── k-core decomposition of the same co-purchase graph: iterative
    // peel (drop nodes with < k surviving neighbors until fixpoint),
    // the graph-cleaning step before community analysis. The oracle
    // UNROLLS the peel (the BPE playbook): alive_i = nodes with ≥ k
    // neighbors inside alive_{i-1}; rounds are unrolled past the
    // fixpoint depth, where extra rounds are idempotent — so the
    // Spark fixpoint loop and the fixed-depth SQL agree exactly ─────────
    // rounds = 16: the unroll depth must COVER the data-dependent peel
    // depth (extra rounds are idempotent; too few silently returns a
    // superset of the true core — a review finding: the previous
    // rounds = 10 sat EXACTLY at the sf0.01 fixpoint depth with zero
    // margin). The sf0.01 gate fixture peels in 10 rounds
    // (AnalyticsSpec pins depth ≤ 12), so 16 keeps real slack against
    // fixture drift.
    QuerySpec("k_core",
      (s, d) => Analytics.kCore(coPurchaseEdges(s, d), "part_a", "part_b",
          k = KCoreK, outCol = "part_id")
        .orderBy("part_id"),
      Some(kCoreOracleSql(KCoreK, rounds = 16))),

    // ── community detection via deterministic synchronous label
    // propagation: exactly R rounds of neighbor-vote argmax (count
    // DESC, min label on ties, self-vote included), on the same
    // co-purchase graph as k_core. A fixed unrollable recurrence —
    // the oracle replays every round bit-for-bit (no fixpoint /
    // idempotence needed, unlike k_core's peel) ─────────────────────────
    QuerySpec("label_prop",
      (s, d) => Analytics.labelPropagation(coPurchaseEdges(s, d),
          "part_a", "part_b", rounds = LabelPropRounds, outCol = "part_id")
        .orderBy("part_id"),
      Some(labelPropOracleSql(LabelPropRounds))),

    // ── grouped top-k via the bounded-heap TopKPairs aggregate: map-side
    // partial top-k (≤k rows per group per partition shuffle) instead of
    // the row_number window's full-table shuffle+sort. Oracle is the
    // window form — same rows, different physics ─────────────────────────
    QuerySpec("group_topk", {
      val k = 3
      (s, d) => Analytics.groupTopK(orders(s, d), Seq("o_custkey"),
          "o_totalprice", "o_orderkey", k)
        .orderBy("o_custkey", "rk")
    }, {
      val k = 3
      Some(s"""SELECT o_custkey, CAST(rk AS INT) AS rk, o_orderkey, o_totalprice
             |FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         row_number() OVER (PARTITION BY o_custkey
             |           ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |  FROM orders)
             |WHERE rk <= $k ORDER BY o_custkey, rk""".stripMargin)
    }),

    // ── SCD2 dimension build from the orders changelog: per-customer
    // order-status history with change compression; lag-filter and
    // lead-close stack on ONE exchange + ONE sort ────────────────────────
    QuerySpec("scd2_history",
      // o_orderdate is TIMESTAMP_NTZ; NTZ→timestamp (UTC session) →long
      // gives the same floored epoch seconds as DuckDB's epoch_us//1e6
      (s, d) => Analytics.scd2(
          orders(s, d).withColumn("__ots",
            col("o_orderdate").cast("timestamp").cast("long")),
          Seq("o_custkey"), "__ots", "o_orderkey", Seq("o_orderstatus"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderstatus"),
          coalesce(col("valid_to"), lit(Long.MaxValue))),
      Some("""WITH b AS (
             |  SELECT o_custkey, epoch_us(o_orderdate)//1000000 AS valid_from,
             |         o_orderkey, o_orderstatus
             |  FROM orders),
             |c AS (
             |  SELECT *,
             |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
             |           ORDER BY valid_from, o_orderkey) AS prev,
             |         row_number() OVER (PARTITION BY o_custkey
             |           ORDER BY valid_from, o_orderkey) AS rn
             |  FROM b),
             |k AS (SELECT * FROM c
             |      WHERE rn = 1 OR prev IS DISTINCT FROM o_orderstatus),
             |f AS (
             |  SELECT o_custkey, valid_from, o_orderstatus,
             |         lead(valid_from) OVER (PARTITION BY o_custkey
             |           ORDER BY valid_from, o_orderkey) AS valid_to
             |  FROM k)
             |SELECT o_custkey, valid_from, o_orderstatus, valid_to,
             |       valid_to IS NULL AS is_current
             |FROM f
             |ORDER BY o_custkey, valid_from, o_orderstatus,
             |         coalesce(valid_to, 9223372036854775807)""".stripMargin)),

    // ── calendar dimension: pure sequence() generation, zero input ──────
    QuerySpec("calendar_dim",
      (s, _) => Analytics.calendarDim(s, "2024-01-01", "2024-12-31")
        .orderBy("date"),
      Some("""SELECT d::DATE AS date,
             |       year(d)::INT AS year, quarter(d)::INT AS quarter,
             |       month(d)::INT AS month, day(d)::INT AS day_of_month,
             |       week(d)::INT AS week_of_year,
             |       (dayofweek(d) + 1)::INT AS day_of_week,
             |       dayofweek(d) IN (0, 6) AS is_weekend
             |FROM generate_series(DATE '2024-01-01', DATE '2024-12-31',
             |                     INTERVAL 1 DAY) t(d)
             |ORDER BY date""".stripMargin)),

    // ── skew diagnostic over the lineitem supplier key ──────────────────
    QuerySpec("skew_report",
      (s, d) => Analytics.skewReport(lineitem(s, d), "l_suppkey", topK = 10)
        .orderBy(desc("n_rows"), col("l_suppkey")),
      Some("""WITH c AS (
             |  SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
             |s AS (SELECT sum(n) AS rows_, count(*) AS keys_ FROM c)
             |SELECT l_suppkey, n AS n_rows,
             |       round(n / rows_, 6) AS share,
             |       round(n * keys_ / rows_, 6) AS ratio_to_avg
             |FROM (SELECT * FROM c ORDER BY n DESC, l_suppkey LIMIT 10)
             |CROSS JOIN s
             |ORDER BY n_rows DESC, l_suppkey""".stripMargin)),

    // ── daily-grid resample + forward fill of each user's purchase
    // value stream: per-key sequence() spine, one fill window — all
    // keyed by user, no cross-key movement ───────────────────────────────
    QuerySpec("resample_ffill",
      (s, d) => Analytics.resampleFill(
          events(s, d).filter(col("event_type") === "purchase")
            .withColumn("__es", col("ts").cast("long")),
          "user_id", "__es", "value", stepSeconds = 86400L)
        .orderBy("user_id", "grid_ts"),
      Some(s"""WITH o AS (
             |  SELECT user_id, $EpochS AS t, max(value) AS v
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |b AS (SELECT user_id, min(t) AS lo, max(t) AS hi
             |      FROM o GROUP BY 1),
             |g AS (SELECT user_id, unnest(generate_series(lo, hi, 86400)) AS t
             |      FROM b),
             |u AS (SELECT user_id, t, v, 0 AS is_grid FROM o
             |      UNION ALL SELECT user_id, t, NULL, 1 FROM g),
             |f AS (SELECT user_id, t, is_grid,
             |        last_value(v IGNORE NULLS) OVER (
             |          PARTITION BY user_id ORDER BY t, is_grid
             |          ROWS UNBOUNDED PRECEDING) AS fv
             |      FROM u)
             |SELECT user_id, t AS grid_ts, fv AS value
             |FROM f WHERE is_grid = 1
             |ORDER BY user_id, grid_ts""".stripMargin)),

    // ── per-group Tukey fences on exact quartiles (group-relative
    // outliers; no windows, cuts joined back) ───────────────────────────
    QuerySpec("group_outliers",
      (s, d) => Analytics.tukeyOutliers(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey", "l_returnflag", "l_extendedprice"),
          "l_returnflag", "l_extendedprice", k = 1.5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_returnflag"),
          round(col("fence_lo"), 6).as("fence_lo"),
          round(col("fence_hi"), 6).as("fence_hi"), col("is_outlier"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""WITH c AS (
             |  SELECT l_returnflag,
             |         quantile_cont(l_extendedprice, 0.25) AS q1,
             |         quantile_cont(l_extendedprice, 0.75) AS q3
             |  FROM lineitem GROUP BY 1)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l.l_returnflag,
             |       round(q1 - (q3 - q1) * 1.5, 6) AS fence_lo,
             |       round(q3 + (q3 - q1) * 1.5, 6) AS fence_hi,
             |       (l_extendedprice < q1 - (q3 - q1) * 1.5 OR
             |        l_extendedprice > q3 + (q3 - q1) * 1.5) AS is_outlier
             |FROM lineitem l JOIN c USING (l_returnflag)
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── signup→purchase conversion-lag histogram (day buckets): two
    // stacked conditional-min windows on one user exchange ──────────────
    QuerySpec("conversion_lag",
      (s, d) => Analytics.conversionLag(events(s, d), "user_id",
          "event_type", "ts", fromType = "signup", toType = "purchase",
          bucketSeconds = 86400L)
        .orderBy("lag_bucket"),
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, $EpochS AS t FROM events),
             |w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN t END)
             |         OVER (PARTITION BY user_id) AS t0 FROM e),
             |w2 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
             |           AND t >= t0 THEN t END)
             |         OVER (PARTITION BY user_id) AS t1 FROM w1),
             |u AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1
             |      FROM w2 GROUP BY 1)
             |SELECT (t1 - t0) // 86400 AS lag_bucket,
             |       count(*)::BIGINT AS n_users
             |FROM u WHERE t0 IS NOT NULL AND t1 IS NOT NULL
             |GROUP BY 1 ORDER BY lag_bucket""".stripMargin)),

    // ── distributed ROC AUC of the cosine-to-query-0 retrieval score
    // against the class-0 label: micro-unit integer score grid →
    // histogram → bucketed two-level prefix sum — no global rank sort
    // (see Analytics.rocAuc). The oracle computes the same pair counts
    // with a direct window over the (tiny at sf0.01) histogram ──────────
    QuerySpec("roc_auc",
      (s, d) => {
        val e = embeddings(s, d)
        val scored = e.select(col("vec_id"), (col("label") === 0).as("__yy"))
          .join(Extensions.cosineVsQuery(e, "embedding", "vec_id", 0L),
            "vec_id")
          .select(
            round(col("cosine_sim") * 1000000.0).cast("long").as("score_int"),
            col("__yy").as("is_pos"))
        Analytics.rocAuc(scored, "score_int", "is_pos")
      },
      Some("""WITH q AS (
             |  SELECT embedding::DOUBLE[] AS qe FROM embeddings
             |  WHERE vec_id = 0),
             |s AS (
             |  SELECT CAST(round(
             |           CASE WHEN list_dot_product(e.embedding::DOUBLE[],
             |                                      e.embedding::DOUBLE[]) = 0
             |                  OR list_dot_product(q.qe, q.qe) = 0 THEN 0
             |           ELSE list_dot_product(e.embedding::DOUBLE[], q.qe)
             |                / (sqrt(list_dot_product(e.embedding::DOUBLE[],
             |                                         e.embedding::DOUBLE[]))
             |                 * sqrt(list_dot_product(q.qe, q.qe)))
             |           END * 1000000.0) AS BIGINT) AS si,
             |         CASE WHEN e.label = 0 THEN 1 ELSE 0 END AS y
             |  FROM embeddings e CROSS JOIN q),
             |h AS (SELECT si, sum(y)::BIGINT AS pos,
             |             (count(*) - sum(y))::BIGINT AS neg
             |      FROM s GROUP BY 1),
             |p AS (SELECT si, pos, neg,
             |        coalesce(sum(neg) OVER (ORDER BY si
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |          0)::BIGINT AS nb
             |      FROM h)
             |SELECT sum(pos)::BIGINT AS n_pos, sum(neg)::BIGINT AS n_neg,
             |       round((2 * sum(pos * nb) + sum(pos * neg))::DOUBLE
             |             / ((2 * sum(pos) * sum(neg))::DOUBLE), 6) AS auc,
             |       round((2 * sum(pos * nb) + sum(pos * neg)
             |              - sum(pos) * sum(neg))::DOUBLE
             |             / ((sum(pos) * sum(neg))::DOUBLE), 6) AS gini
             |FROM p""".stripMargin)),

    // ── reliability-diagram calibration bins of the (cosine+1)/2
    // pseudo-probability vs the class-0 label: integer bin math, exact
    // integer sums, one division per displayed stat (see
    // Analytics.calibrationBins) ────────────────────────────────────────
    QuerySpec("calibration_bins",
      (s, d) => {
        val e = embeddings(s, d)
        val scored = e.select(col("vec_id"), (col("label") === 0).as("__yy"))
          .join(Extensions.cosineVsQuery(e, "embedding", "vec_id", 0L),
            "vec_id")
          .select(
            round((col("cosine_sim") + 1.0) / 2.0 * 1000000.0).cast("long")
              .as("score_micro"),
            col("__yy").as("is_pos"))
        Analytics.calibrationBins(scored, "score_micro", "is_pos",
          bins = 10).orderBy("bin")
      },
      Some("""WITH q AS (
             |  SELECT embedding::DOUBLE[] AS qe FROM embeddings
             |  WHERE vec_id = 0),
             |s AS (
             |  SELECT CAST(round((
             |           CASE WHEN list_dot_product(e.embedding::DOUBLE[],
             |                                      e.embedding::DOUBLE[]) = 0
             |                  OR list_dot_product(q.qe, q.qe) = 0 THEN 0
             |           ELSE list_dot_product(e.embedding::DOUBLE[], q.qe)
             |                / (sqrt(list_dot_product(e.embedding::DOUBLE[],
             |                                         e.embedding::DOUBLE[]))
             |                 * sqrt(list_dot_product(q.qe, q.qe)))
             |           END + 1.0) / 2.0 * 1000000.0) AS BIGINT) AS sm,
             |         CASE WHEN e.label = 0 THEN 1 ELSE 0 END AS y
             |  FROM embeddings e CROSS JOIN q)
             |SELECT least(greatest((sm * 10) // 1000000, 0), 9)::INT AS bin,
             |       count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
             |       round((sum(sm)::BIGINT)::DOUBLE
             |             / ((count(*) * 1000000)::BIGINT)::DOUBLE, 6)
             |         AS mean_score,
             |       round(sum(y)::DOUBLE / count(*)::DOUBLE, 6) AS pos_rate
             |FROM s GROUP BY 1 ORDER BY bin""".stripMargin)),

    // ── expected calibration error: the calibration_bins table
    // collapsed to one number — per-bin |n_pos·1e6 − Σ score_micro| is
    // an EXACT integer (micro-unit scores make the two rates
    // commensurable), so the sum is order-free and the single final
    // division the only float op (see Analytics.expectedCalibrationError) ─
    QuerySpec("ece",
      (s, d) => {
        val e = embeddings(s, d)
        val scored = e.select(col("vec_id"), (col("label") === 0).as("__yy"))
          .join(Extensions.cosineVsQuery(e, "embedding", "vec_id", 0L),
            "vec_id")
          .select(
            round((col("cosine_sim") + 1.0) / 2.0 * 1000000.0).cast("long")
              .as("score_micro"),
            col("__yy").as("is_pos"))
        Analytics.expectedCalibrationError(scored, "score_micro", "is_pos",
          bins = 10)
      },
      Some("""WITH q AS (
             |  SELECT embedding::DOUBLE[] AS qe FROM embeddings
             |  WHERE vec_id = 0),
             |s AS (
             |  SELECT CAST(round((
             |           CASE WHEN list_dot_product(e.embedding::DOUBLE[],
             |                                      e.embedding::DOUBLE[]) = 0
             |                  OR list_dot_product(q.qe, q.qe) = 0 THEN 0
             |           ELSE list_dot_product(e.embedding::DOUBLE[], q.qe)
             |                / (sqrt(list_dot_product(e.embedding::DOUBLE[],
             |                                         e.embedding::DOUBLE[]))
             |                 * sqrt(list_dot_product(q.qe, q.qe)))
             |           END + 1.0) / 2.0 * 1000000.0) AS BIGINT) AS sm,
             |         CASE WHEN e.label = 0 THEN 1 ELSE 0 END AS y
             |  FROM embeddings e CROSS JOIN q),
             |b AS (SELECT least(greatest((sm * 10) // 1000000, 0), 9) AS bin,
             |             count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
             |             sum(sm)::BIGINT AS ssum
             |      FROM s GROUP BY 1)
             |SELECT sum(n)::BIGINT AS n,
             |       round(sum(abs(pos * 1000000 - ssum))::DOUBLE
             |             / ((sum(n) * 1000000)::BIGINT)::DOUBLE, 6) AS ece
             |FROM b""".stripMargin)),

    // ── PR-AUC (average precision) of the same retrieval score from
    // its HISTOGRAM — descending-inclusive bucketed prefix sums, each
    // threshold term an exact floor-divided micro-unit integer so the
    // sum is order-free (see Analytics.prAuc; the rocAuc doctrine) ──────
    QuerySpec("pr_auc",
      (s, d) => {
        val e = embeddings(s, d)
        val scored = e.select(col("vec_id"), (col("label") === 0).as("__yy"))
          .join(Extensions.cosineVsQuery(e, "embedding", "vec_id", 0L),
            "vec_id")
          .select(
            round(col("cosine_sim") * 1000000.0).cast("long").as("score_int"),
            col("__yy").as("is_pos"))
        Analytics.prAuc(scored, "score_int", "is_pos")
      },
      Some("""WITH q AS (
             |  SELECT embedding::DOUBLE[] AS qe FROM embeddings
             |  WHERE vec_id = 0),
             |s AS (
             |  SELECT CAST(round(
             |           CASE WHEN list_dot_product(e.embedding::DOUBLE[],
             |                                      e.embedding::DOUBLE[]) = 0
             |                  OR list_dot_product(q.qe, q.qe) = 0 THEN 0
             |           ELSE list_dot_product(e.embedding::DOUBLE[], q.qe)
             |                / (sqrt(list_dot_product(e.embedding::DOUBLE[],
             |                                         e.embedding::DOUBLE[]))
             |                 * sqrt(list_dot_product(q.qe, q.qe)))
             |           END * 1000000.0) AS BIGINT) AS si,
             |         CASE WHEN e.label = 0 THEN 1 ELSE 0 END AS y
             |  FROM embeddings e CROSS JOIN q),
             |h AS (SELECT si, sum(y)::BIGINT AS pos,
             |             count(*)::BIGINT AS tot
             |      FROM s GROUP BY 1),
             |c AS (SELECT si, pos, tot,
             |        sum(pos) OVER (ORDER BY si DESC ROWS BETWEEN
             |          UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
             |        sum(tot) OVER (ORDER BY si DESC ROWS BETWEEN
             |          UNBOUNDED PRECEDING AND CURRENT ROW) AS ctot
             |      FROM h)
             |SELECT sum(pos)::BIGINT AS n_pos,
             |       (sum(tot) - sum(pos))::BIGINT AS n_neg,
             |       round(sum((pos::HUGEINT * cpos::HUGEINT * 1000000)
             |               // ctot::HUGEINT)::DOUBLE
             |             / ((sum(pos) * 1000000)::HUGEINT)::DOUBLE, 6)
             |         AS ap
             |FROM c""".stripMargin)),

    // ── ranked-retrieval quality: hits/precision/recall/NDCG@10 of the
    // exact cosine ranking against same-label relevance — binary-DCG
    // with the shared micro-unit discount constants (see
    // Analytics.retrievalEval / ndcgDiscounts) ──────────────────────────
    QuerySpec("ndcg_eval",
      (s, d) => {
        val e = embeddings(s, d)
        val q = e.filter(col("vec_id").isin(NdcgQueryIds: _*))
          .select(col("vec_id").as("query_id"), col("label").as("__ql"))
        val relevant = e.select(col("vec_id").as("neighbor_id"),
            col("label"))
          .join(broadcast(q), col("label") === col("__ql"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .select("query_id", "neighbor_id")
        val ranked = Extensions.cosineTopK(e, "embedding", "vec_id",
          NdcgQueryIds, k = NdcgK)
        Analytics.retrievalEval(ranked, relevant, "query_id",
          "neighbor_id", k = NdcgK).orderBy("query_id")
      },
      Some(s"""WITH q AS (
             |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
             |         label AS ql
             |  FROM embeddings
             |  WHERE vec_id IN (${NdcgQueryIds.mkString(", ")})),
             |s AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |         round(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
             |                                          e.embedding::DOUBLE[]) = 0
             |                      OR list_dot_product(q.qe, q.qe) = 0 THEN 0
             |               ELSE list_dot_product(e.embedding::DOUBLE[], q.qe)
             |                    / (sqrt(list_dot_product(e.embedding::DOUBLE[],
             |                                             e.embedding::DOUBLE[]))
             |                     * sqrt(list_dot_product(q.qe, q.qe)))
             |               END, 6) AS cosine_sim
             |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
             |r AS (SELECT query_id, neighbor_id,
             |             row_number() OVER (PARTITION BY query_id
             |               ORDER BY cosine_sim DESC, neighbor_id) AS rank
             |      FROM s),
             |topk AS (SELECT * FROM r WHERE rank <= $NdcgK),
             |rel AS (SELECT q.query_id, e.vec_id AS neighbor_id
             |        FROM embeddings e JOIN q ON e.label = q.ql
             |        WHERE e.vec_id <> q.query_id),
             |tot AS (SELECT query_id, count(*)::BIGINT AS n_relevant
             |        FROM rel GROUP BY 1),
             |d AS (SELECT * FROM (VALUES $ndcgDiscountValues) v(r, d)),
             |p AS (SELECT * FROM (VALUES $ndcgPrefixValues) v(m, pd)),
             |j AS (SELECT t.query_id, t.rank,
             |             CASE WHEN rel.neighbor_id IS NULL THEN 0 ELSE 1 END
             |               AS hit
             |      FROM topk t LEFT JOIN rel
             |        ON t.query_id = rel.query_id
             |       AND t.neighbor_id = rel.neighbor_id),
             |agg AS (SELECT j.query_id, sum(hit)::BIGINT AS hits,
             |               CAST(sum(hit * d.d) AS BIGINT) AS dcg
             |        FROM j JOIN d ON d.r = j.rank GROUP BY 1),
             |f AS (SELECT a.query_id,
             |             coalesce(tot.n_relevant, 0)::BIGINT AS n_relevant,
             |             a.hits, a.dcg,
             |             least(coalesce(tot.n_relevant, 0), $NdcgK)::INT AS m
             |      FROM agg a LEFT JOIN tot USING (query_id))
             |SELECT f.query_id, f.n_relevant, f.hits,
             |       round(f.hits::DOUBLE / $NdcgK.0, 6) AS precision_k,
             |       CASE WHEN f.n_relevant > 0
             |            THEN round(f.hits::DOUBLE / f.n_relevant::DOUBLE, 6)
             |       END AS recall_k,
             |       CASE WHEN f.m >= 1
             |            THEN round(f.dcg::DOUBLE / p.pd::DOUBLE, 6)
             |       END AS ndcg
             |FROM f LEFT JOIN p ON p.m = f.m
             |ORDER BY f.query_id""".stripMargin)),

    // ── reciprocal rank per query (the MRR building block) over the
    // same cosine ranking / same-label relevance fixture as ndcg_eval;
    // 1/first_rel_rank is the only float op, exactly rounded by both
    // engines (see Analytics.mrrEval) ───────────────────────────────────
    QuerySpec("mrr",
      (s, d) => {
        val e = embeddings(s, d)
        val q = e.filter(col("vec_id").isin(NdcgQueryIds: _*))
          .select(col("vec_id").as("query_id"), col("label").as("__ql"))
        val relevant = e.select(col("vec_id").as("neighbor_id"),
            col("label"))
          .join(broadcast(q), col("label") === col("__ql"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .select("query_id", "neighbor_id")
        val ranked = Extensions.cosineTopK(e, "embedding", "vec_id",
          NdcgQueryIds, k = NdcgK)
        Analytics.mrrEval(ranked, relevant, "query_id",
          "neighbor_id", k = NdcgK).orderBy("query_id")
      },
      Some(s"""WITH q AS (
             |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe,
             |         label AS ql
             |  FROM embeddings
             |  WHERE vec_id IN (${NdcgQueryIds.mkString(", ")})),
             |s AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |         round(CASE WHEN list_dot_product(e.embedding::DOUBLE[],
             |                                          e.embedding::DOUBLE[]) = 0
             |                      OR list_dot_product(q.qe, q.qe) = 0 THEN 0
             |               ELSE list_dot_product(e.embedding::DOUBLE[], q.qe)
             |                    / (sqrt(list_dot_product(e.embedding::DOUBLE[],
             |                                             e.embedding::DOUBLE[]))
             |                     * sqrt(list_dot_product(q.qe, q.qe)))
             |               END, 6) AS cosine_sim
             |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
             |r AS (SELECT query_id, neighbor_id,
             |             row_number() OVER (PARTITION BY query_id
             |               ORDER BY cosine_sim DESC, neighbor_id) AS rank
             |      FROM s),
             |topk AS (SELECT * FROM r WHERE rank <= $NdcgK),
             |rel AS (SELECT q.query_id, e.vec_id AS neighbor_id
             |        FROM embeddings e JOIN q ON e.label = q.ql
             |        WHERE e.vec_id <> q.query_id),
             |j AS (SELECT t.query_id,
             |             CASE WHEN rel.neighbor_id IS NULL THEN NULL
             |                  ELSE t.rank END AS hit_rank
             |      FROM topk t LEFT JOIN rel
             |        ON t.query_id = rel.query_id
             |       AND t.neighbor_id = rel.neighbor_id)
             |SELECT query_id, min(hit_rank)::INT AS first_rel_rank,
             |       round(coalesce(1.0 / min(hit_rank), 0.0), 6) AS rr
             |FROM j GROUP BY 1 ORDER BY query_id""".stripMargin)),

    // ── chi-square contingency: order status × priority — counts once,
    // marginals re-aggregated from the tiny cell table ──────────────────
    QuerySpec("chi_square",
      (s, d) => Analytics.chiSquare(orders(s, d), "o_orderstatus",
          "o_orderpriority")
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""WITH obs AS (
             |  SELECT o_orderstatus, o_orderpriority, count(*) AS observed
             |  FROM orders
             |  WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
             |  GROUP BY 1, 2),
             |ra AS (SELECT o_orderstatus, sum(observed) AS r FROM obs GROUP BY 1),
             |cb AS (SELECT o_orderpriority, sum(observed) AS c FROM obs GROUP BY 1),
             |n AS (SELECT sum(observed) AS n FROM obs),
             |grid AS (SELECT * FROM ra CROSS JOIN cb)
             |SELECT grid.o_orderstatus, grid.o_orderpriority,
             |       coalesce(observed, 0) AS observed,
             |       round(r * c / n, 6) AS expected,
             |       round(power(coalesce(observed, 0) - r * c / n, 2)
             |             / (r * c / n), 6) AS chi2_contrib
             |FROM grid
             |LEFT JOIN obs USING (o_orderstatus, o_orderpriority)
             |CROSS JOIN n
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // ── supplier revenue concentration per nation (HHI + top share)
    // over exact integer-cent units ─────────────────────────────────────
    QuerySpec("market_concentration",
      (s, d) => Analytics.marketConcentration(
          lineitem(s, d).join(supplier(s, d),
            col("l_suppkey") === col("s_suppkey")),
          "s_nationkey", "l_suppkey", "l_extendedprice")
        .orderBy("s_nationkey"),
      Some("""WITH rev AS (
             |  SELECT s.s_nationkey, l.l_suppkey,
             |         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS r
             |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  GROUP BY 1, 2)
             |SELECT s_nationkey, count(*) AS n_players,
             |       round(sum(power(r::DOUBLE, 2)) /
             |             power(sum(r)::DOUBLE, 2), 6) AS hhi,
             |       round(max(r) / sum(r)::DOUBLE, 6) AS top_share
             |FROM rev GROUP BY 1 ORDER BY s_nationkey""".stripMargin)),

    // ── per-nation supplier revenue Gini (inequality companion to the
    // HHI query): exact-cent rollup, one per-nation rank window over
    // the (already tiny) supplier table, decimal-exact weighted sum ─────
    QuerySpec("gini_revenue",
      (s, d) => Analytics.giniByGroup(
          lineitem(s, d).join(supplier(s, d),
            col("l_suppkey") === col("s_suppkey")),
          "s_nationkey", "l_suppkey", "l_extendedprice")
        .orderBy("s_nationkey"),
      Some("""WITH rev AS (
             |  SELECT s.s_nationkey, l.l_suppkey,
             |         sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS r
             |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  GROUP BY 1, 2),
             |rk AS (
             |  SELECT s_nationkey, r,
             |         row_number() OVER (PARTITION BY s_nationkey
             |           ORDER BY r, l_suppkey) AS i
             |  FROM rev)
             |SELECT s_nationkey, count(*) AS n_players,
             |       round((2 * sum(i * r) - (count(*) + 1) * sum(r))::DOUBLE
             |             / (count(*) * sum(r))::DOUBLE, 6) AS gini
             |FROM rk GROUP BY 1 ORDER BY s_nationkey""".stripMargin)),

    // ── per-user Shannon entropy of the event-type mix: cells → one
    // re-agg via H = ln n − Σc·ln c / n (no window, no join; ≤5 double
    // terms per group so parallel sum order can't move the rounding) ────
    QuerySpec("entropy_mix",
      (s, d) => Analytics.entropyByGroup(events(s, d), "user_id",
          "event_type")
        .orderBy("user_id"),
      Some("""WITH c AS (
             |  SELECT user_id, event_type, count(*)::BIGINT AS c
             |  FROM events GROUP BY 1, 2)
             |SELECT user_id, count(*) AS n_types, sum(c)::BIGINT AS n,
             |       round(ln(sum(c)::DOUBLE)
             |             - sum(c::DOUBLE * ln(c::DOUBLE)) / sum(c)::DOUBLE,
             |             6) AS entropy
             |FROM c GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ── per-nation OLS slope of daily order revenue: exact integer
    // sums (decimal38 / HUGEINT), double only at the final division ─────
    QuerySpec("trend_slope",
      (s, d) => Analytics.trendSlope(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_nationkey", "o_orderdate", "o_totalprice")
        .orderBy("c_nationkey"),
      Some("""WITH daily AS (
             |  SELECT c.c_nationkey,
             |         CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS x,
             |         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS y
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2)
             |SELECT c_nationkey, count(*) AS n_days,
             |       round((count(*) * sum(x::HUGEINT * y)
             |                - sum(x::HUGEINT) * sum(y::HUGEINT))::DOUBLE
             |             / (count(*) * sum(x::HUGEINT * x)
             |                - sum(x::HUGEINT) * sum(x::HUGEINT))::DOUBLE
             |             / 100, 6) AS slope_per_day
             |FROM daily GROUP BY 1 ORDER BY c_nationkey""".stripMargin)),

    // ── per-nation EWMA of daily revenue: the sequential recurrence
    // folds inside one per-group aggregate HOF (state bounded by
    // calendar days); oracle = the recursive-CTE replay of the same
    // double ops in the same order ──────────────────────────────────────
    QuerySpec("ewma_smooth",
      (s, d) => Analytics.ewmaSmooth(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_nationkey", "o_orderdate", "o_totalprice")
        .orderBy("c_nationkey", "day"),
      Some("""WITH RECURSIVE daily AS (
             |  SELECT c.c_nationkey AS g,
             |         CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS d,
             |         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |r AS (SELECT g, d, v,
             |        row_number() OVER (PARTITION BY g ORDER BY d) AS rn
             |      FROM daily),
             |e(g, d, rn, ew) AS (
             |  SELECT g, d, rn, v::DOUBLE FROM r WHERE rn = 1
             |  UNION ALL
             |  SELECT r.g, r.d, r.rn,
             |         0.3::DOUBLE * r.v + (1 - 0.3::DOUBLE) * e.ew
             |  FROM e JOIN r ON r.g = e.g AND r.rn = e.rn + 1)
             |SELECT g AS c_nationkey, d AS day, ew / 100 AS ewma
             |FROM e ORDER BY c_nationkey, day""".stripMargin)),

    // ── per-user inter-arrival burstiness (mean gap + CV): exact
    // microsecond gaps, decimal/HUGEINT moment sums, the bot-detector ───
    QuerySpec("inter_event_stats",
      (s, d) => Analytics.interArrivalStats(events(s, d), "user_id",
          "ts", "event_id")
        .orderBy("user_id"),
      Some("""WITH g AS (
             |  SELECT user_id,
             |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             |           PARTITION BY user_id
             |           ORDER BY epoch_us(ts), event_id) AS gap
             |  FROM events)
             |SELECT user_id, count(gap)::BIGINT AS n_gaps,
             |       round(sum(gap)::DOUBLE / count(gap) / 1e6, 3)
             |         AS mean_gap_s,
             |       round(sqrt((count(gap) * sum(gap::HUGEINT * gap)
             |                     - sum(gap::HUGEINT) * sum(gap::HUGEINT))::DOUBLE
             |                  / (count(gap) * (count(gap) - 1)))
             |             / (sum(gap)::DOUBLE / count(gap)), 6) AS cv
             |FROM g WHERE gap IS NOT NULL
             |GROUP BY 1 HAVING count(gap) >= 2
             |ORDER BY user_id""".stripMargin)),

    // ── per-user time-weighted average event value: exact cents ×
    // exact microsecond durations, decimal-accumulated ──────────────────
    QuerySpec("twap_value",
      (s, d) => Analytics.timeWeightedAvg(events(s, d), "user_id",
          "ts", "value", "event_id")
        .orderBy("user_id"),
      Some("""WITH s AS (
             |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
             |         epoch_us(ts) AS t,
             |         lead(epoch_us(ts)) OVER (PARTITION BY user_id
             |           ORDER BY epoch_us(ts), event_id) AS t2
             |  FROM events)
             |SELECT user_id,
             |       round(sum(v::HUGEINT * (t2 - t))::DOUBLE
             |             / sum(t2 - t)::DOUBLE / 100, 6) AS twap
             |FROM s WHERE t2 IS NOT NULL GROUP BY 1
             |ORDER BY user_id""".stripMargin)),

    // ── CUSUM changepoint per event type: integer-scaled running sum
    // over the (type, day) cell table, exact argmax, earliest-day tie ───
    QuerySpec("cusum_shift",
      (s, d) => Analytics.cusumShift(events(s, d), "event_type", "ts")
        .orderBy("event_type"),
      Some("""WITH d AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             |         count(*)::BIGINT AS c
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, count(*)::BIGINT AS nd,
             |             sum(c)::BIGINT AS tot FROM d GROUP BY 1),
             |s AS (
             |  SELECT d.event_type, d.day, t.nd, t.tot,
             |         sum(t.nd * d.c - t.tot) OVER (
             |           PARTITION BY d.event_type ORDER BY d.day) AS cu
             |  FROM d JOIN t USING (event_type)),
             |m AS (SELECT event_type, day, cu, nd, tot,
             |        row_number() OVER (PARTITION BY event_type
             |          ORDER BY abs(cu) DESC, day) AS rk FROM s)
             |SELECT event_type, day AS shift_day,
             |       round(cu::DOUBLE / (nd::DOUBLE * tot::DOUBLE), 6)
             |         AS peak_cusum
             |FROM m WHERE rk = 1 ORDER BY event_type""".stripMargin)),

    // ── top-20 event-type trigram paths: two leads on ONE user
    // window, |types|³-bounded count table, broadcast-size top-k ────────
    QuerySpec("session_paths",
      (s, d) => Analytics.eventPaths(events(s, d), "user_id",
          "event_type", "ts", "event_id", k = 20),
      Some("""WITH s AS (
             |  SELECT user_id, event_type AS e1,
             |         lead(event_type, 1) OVER (PARTITION BY user_id
             |           ORDER BY epoch_us(ts), event_id) AS e2,
             |         lead(event_type, 2) OVER (PARTITION BY user_id
             |           ORDER BY epoch_us(ts), event_id) AS e3
             |  FROM events)
             |SELECT e1 || '>' || e2 || '>' || e3 AS path,
             |       count(*)::BIGINT AS n
             |FROM s WHERE e3 IS NOT NULL GROUP BY 1
             |ORDER BY n DESC, path LIMIT 20""".stripMargin)),

    // ── RFM segmentation: user-level aggregates + EXACT quintile
    // cutpoints broadcast back (no ntile-over-everything funnel) ────────
    QuerySpec("rfm_scores",
      (s, d) => Analytics.rfmScores(
          events(s, d).filter(col("event_type") === "purchase")
            .withColumn("__es", col("ts").cast("long")),
          "user_id", "__es", "value")
        .orderBy("user_id"),
      Some(s"""WITH base AS (
             |  SELECT user_id, $EpochS AS t, value FROM events
             |  WHERE event_type = 'purchase'),
             |mt AS (SELECT max(t) AS maxt FROM base),
             |u AS (SELECT user_id, maxt - max(t) AS rsec,
             |             (maxt - max(t)) / 86400.0 AS r_days,
             |             count(*) AS frequency, sum(value) AS monetary
             |      FROM base CROSS JOIN mt GROUP BY user_id, maxt),
             |c AS (SELECT
             |  quantile_cont(r_days, 0.2) AS r0, quantile_cont(r_days, 0.4) AS r1,
             |  quantile_cont(r_days, 0.6) AS r2, quantile_cont(r_days, 0.8) AS r3,
             |  quantile_cont(frequency, 0.2) AS f0, quantile_cont(frequency, 0.4) AS f1,
             |  quantile_cont(frequency, 0.6) AS f2, quantile_cont(frequency, 0.8) AS f3,
             |  quantile_cont(monetary, 0.2) AS m0, quantile_cont(monetary, 0.4) AS m1,
             |  quantile_cont(monetary, 0.6) AS m2, quantile_cont(monetary, 0.8) AS m3
             |  FROM u)
             |SELECT user_id,
             |       (rsec * 1000000 + 43200) // 86400 / 1000000.0 AS r_days,
             |       frequency,
             |       round(monetary, 4) AS monetary,
             |       6 - (1 + (r_days > r0)::INT + (r_days > r1)::INT +
             |            (r_days > r2)::INT + (r_days > r3)::INT) AS r_score,
             |       1 + (frequency > f0)::INT + (frequency > f1)::INT +
             |           (frequency > f2)::INT + (frequency > f3)::INT AS f_score,
             |       1 + (monetary > m0)::INT + (monetary > m1)::INT +
             |           (monetary > m2)::INT + (monetary > m3)::INT AS m_score
             |FROM u CROSS JOIN c ORDER BY user_id""".stripMargin)),

    // ── market-basket pair affinity: within-basket self-join (bounded by
    // basket size), pair-keyed counts, TakeOrdered top-20 by lift ───────
    QuerySpec("basket_affinity",
      (s, d) => Analytics.basketAffinity(lineitem(s, d), "l_orderkey",
          "l_partkey", minSupport = 3L, topK = 20)
        .orderBy(desc("lift"), col("item_a"), col("item_b")),
      Some("""WITH items AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |nb AS (SELECT count(DISTINCT l_orderkey)::DOUBLE AS n FROM items),
             |ic AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
             |p AS (
             |  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             |         count(*) AS np
             |  FROM items a JOIN items b USING (l_orderkey)
             |  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
             |  HAVING count(*) >= 3)
             |SELECT item_a, item_b, np AS pair_baskets,
             |       round(np / (SELECT n FROM nb), 6) AS support,
             |       round(np / ca.cnt, 6) AS confidence_a_to_b,
             |       round(np * (SELECT n FROM nb) / (ca.cnt * cb.cnt), 6) AS lift
             |FROM p
             |JOIN ic ca ON ca.l_partkey = item_a
             |JOIN ic cb ON cb.l_partkey = item_b
             |ORDER BY lift DESC, item_a, item_b LIMIT 20""".stripMargin)),

    // ── A/B mean comparison: order value by status vs control 'F' —
    // one moment-agg pass + broadcast control row ───────────────────────
    QuerySpec("ab_test",
      (s, d) => Analytics.abTest(orders(s, d), "o_orderstatus",
          "o_totalprice", control = "F")
        .orderBy("variant"),
      Some("""WITH s AS (
             |  SELECT o_orderstatus AS g, count(*) AS n,
             |         avg(o_totalprice) AS m, stddev_samp(o_totalprice) AS sd
             |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
             |c AS (SELECT n AS cn, m AS cm, sd AS cs FROM s WHERE g = 'F')
             |SELECT g AS variant, n, round(m, 6) AS mean,
             |       round(sd, 6) AS stddev,
             |       round((m - cm) / sqrt(sd*sd/n + cs*cs/cn), 6) AS z_score
             |FROM s CROSS JOIN c WHERE g <> 'F'
             |ORDER BY variant""".stripMargin)),

    // ── rolling z-score outliers per user (prior-30-rows frame, row
    // itself excluded so spikes can't mask themselves) ──────────────────
    QuerySpec("rolling_zscore",
      (s, d) => Analytics.rollingZScore(
          events(s, d).withColumn("__es", col("ts").cast("long")),
          "user_id", "__es", "event_id", "value",
          lookback = 30, threshold = 2.0)
        .select("user_id", "event_id", "z_score", "is_outlier")
        .orderBy("event_id"),
      Some(s"""WITH e AS (
             |  SELECT user_id, event_id, value, $EpochS AS t FROM events),
             |w AS (
             |  SELECT user_id, event_id, value,
             |         avg(value) OVER win AS rm,
             |         stddev_samp(value) OVER win AS rs,
             |         count(value) OVER win AS rn
             |  FROM e
             |  WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id
             |                 ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
             |SELECT user_id, event_id,
             |       CASE WHEN rn >= 2 AND rs > 0
             |            THEN round((value - rm) / rs, 6) END AS z_score,
             |       coalesce(abs(CASE WHEN rn >= 2 AND rs > 0
             |            THEN round((value - rm) / rs, 6) END) > 2.0,
             |         false) AS is_outlier
             |FROM w ORDER BY event_id""".stripMargin)),

    // ── PSI drift between the price distribution and a +5% shifted
    // snapshot: fixed equi-width bins, Laplace smoothing, per-bin
    // contributions (sum = headline PSI) ─────────────────────────────────
    QuerySpec("psi_drift",
      (s, d) => Quality.psiReport(
          orders(s, d),
          orders(s, d).withColumn("o_totalprice",
            col("o_totalprice") * 1.05),
          "o_totalprice", bins = 10, lo = 0.0, hi = 500000.0)
        .orderBy("bin"),
      Some("""WITH b AS (
             |  SELECT least(greatest(floor(o_totalprice / 50000.0), 0), 9)::INT AS bin,
             |         count(*) AS n
             |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
             |c AS (
             |  SELECT least(greatest(floor(o_totalprice * 1.05 / 50000.0), 0), 9)::INT AS bin,
             |         count(*) AS n
             |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
             |s AS (SELECT unnest(generate_series(0, 9))::INT AS bin),
             |bb AS (SELECT s.bin, coalesce(b.n, 0) AS base_n,
             |         (coalesce(b.n, 0) + 1.0) / ((SELECT sum(n) FROM b) + 10.0) AS p
             |       FROM s LEFT JOIN b USING (bin)),
             |cc AS (SELECT s.bin, coalesce(c.n, 0) AS cur_n,
             |         (coalesce(c.n, 0) + 1.0) / ((SELECT sum(n) FROM c) + 10.0) AS q
             |       FROM s LEFT JOIN c USING (bin))
             |SELECT bb.bin, base_n, cur_n,
             |       round((p - q) * ln(p / q), 9) AS psi_contrib
             |FROM bb JOIN cc ON bb.bin = cc.bin
             |ORDER BY bb.bin""".stripMargin)),

    // ── last-touch attribution: per-user RANGE window (2h lookback),
    // max_by credit assignment, tiny channel rollup ─────────────────────
    QuerySpec("attribution",
      (s, d) => Analytics.lastTouchAttribution(events(s, d), "user_id",
          "event_type", "ts", "event_id", convType = "purchase",
          windowSeconds = 7200L)
        .orderBy("channel"),
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, event_id, $EpochS AS t
             |  FROM events),
             |conv AS (SELECT * FROM e WHERE event_type = 'purchase'),
             |att AS (
             |  SELECT c.event_id,
             |    (SELECT x.event_type FROM e x
             |     WHERE x.user_id = c.user_id AND x.event_type <> 'purchase'
             |       AND x.t <= c.t AND x.t >= c.t - 7200
             |     ORDER BY x.t DESC, x.event_id DESC LIMIT 1) AS ch
             |  FROM conv c)
             |SELECT coalesce(ch, 'direct') AS channel,
             |       count(*)::BIGINT AS conversions
             |FROM att GROUP BY 1 ORDER BY channel""".stripMargin)),

    // ── data-quality constraint suite (Deequ-shaped): all scalar rules
    // fold into ONE aggregation pass; uniqueness adds one exchange, the
    // FK rule one anti-join. Report is one row per rule ────────────────
    QuerySpec("quality_checks",
      (s, d) => Quality.check(orders(s, d), Seq(
        Quality.Complete("o_custkey", 1.0),
        Quality.InRange("o_totalprice", 0.0, 100000.0, minRatio = 0.5),
        Quality.InSet("o_orderstatus", Seq("F", "O", "P"), minRatio = 1.0),
        Quality.RowCountBetween(1L, Long.MaxValue),
        Quality.Unique(Seq("o_orderkey"), 1.0),
        Quality.ForeignKey("o_custkey", customer(s, d), "c_custkey", 1.0))),
      Some("""WITH s AS (
             |  SELECT count(*)::DOUBLE AS n,
             |    sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE AS c0,
             |    sum(CASE WHEN o_totalprice IS NOT NULL
             |        AND o_totalprice BETWEEN 0.0 AND 100000.0
             |        THEN 1 ELSE 0 END)::DOUBLE AS r1n,
             |    sum(CASE WHEN o_totalprice IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE AS r1d,
             |    sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 1 ELSE 0 END)::DOUBLE AS i2n,
             |    sum(CASE WHEN o_orderstatus IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE AS i2d,
             |    count(DISTINCT o_orderkey)::DOUBLE AS u4
             |  FROM orders),
             |fk AS (
             |  SELECT count(*)::DOUBLE AS total,
             |         sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::DOUBLE AS orphans
             |  FROM orders o
             |  LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |    ON o.o_custkey = c.c_custkey
             |  WHERE o.o_custkey IS NOT NULL)
             |SELECT * FROM (
             |  SELECT 0 AS rule_id, 'complete(o_custkey)' AS rule,
             |         round(c0/n, 9) AS metric, 1.0::DOUBLE AS threshold,
             |         c0/n >= 1.0 AS passed FROM s
             |  UNION ALL SELECT 1, 'in_range(o_totalprice)',
             |         round(r1n/r1d, 9), 0.5::DOUBLE, r1n/r1d >= 0.5 FROM s
             |  UNION ALL SELECT 2, 'in_set(o_orderstatus)',
             |         round(i2n/i2d, 9), 1.0::DOUBLE, i2n/i2d >= 1.0 FROM s
             |  UNION ALL SELECT 3, 'row_count', round(n, 9), 1.0::DOUBLE,
             |         n >= 1 FROM s
             |  UNION ALL SELECT 4, 'unique(o_orderkey)', round(u4/n, 9),
             |         1.0::DOUBLE, u4/n >= 1.0 FROM s
             |  UNION ALL SELECT 5, 'foreign_key(o_custkey)',
             |         round((total - orphans)/total, 9), 1.0::DOUBLE,
             |         (total - orphans)/total >= 1.0 FROM fk)
             |ORDER BY rule_id""".stripMargin)),

    // ── first-order Markov transition matrix over per-user event
    // sequences (event_id breaks same-second ties): one user
    // exchange+sort, then a |types|² rollup with the from-marginal
    // broadcast back ────────────────────────────────────────────────────
    QuerySpec("markov_transitions",
      (s, d) => Analytics.markovTransitions(events(s, d), "user_id",
          "event_type", "ts", "event_id")
        .orderBy("from_type", "to_type"),
      Some(s"""WITH e AS (
             |  SELECT user_id, event_type, $EpochS AS t, event_id
             |  FROM events WHERE event_type IS NOT NULL),
             |s AS (
             |  SELECT event_type AS f,
             |         lead(event_type) OVER (PARTITION BY user_id
             |           ORDER BY t, event_id) AS nx
             |  FROM e),
             |tr AS (
             |  SELECT f AS from_type, nx AS to_type, count(*) AS n_trans
             |  FROM s WHERE nx IS NOT NULL GROUP BY 1, 2),
             |m AS (SELECT from_type, sum(n_trans) AS fn FROM tr GROUP BY 1)
             |SELECT tr.from_type, tr.to_type, n_trans::BIGINT AS n_trans,
             |       round(n_trans::DOUBLE / fn::DOUBLE, 6) AS p
             |FROM tr JOIN m USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ── mutual information of market segment × order priority across
    // the customer⋈orders join — chi_square's feature-selection
    // companion; marginals re-aggregate the tiny cell table, raw rows
    // read once ─────────────────────────────────────────────────────────
    QuerySpec("mutual_info",
      (s, d) => Analytics.mutualInfo(
          customer(s, d).join(orders(s, d),
            col("c_custkey") === col("o_custkey")),
          "c_mktsegment", "o_orderpriority")
        .orderBy("c_mktsegment", "o_orderpriority"),
      Some("""WITH j AS (
             |  SELECT c_mktsegment, o_orderpriority
             |  FROM customer JOIN orders ON c_custkey = o_custkey
             |  WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL),
             |cell AS (
             |  SELECT c_mktsegment, o_orderpriority, count(*) AS n_xy
             |  FROM j GROUP BY 1, 2),
             |ma AS (SELECT c_mktsegment, sum(n_xy) AS na FROM cell GROUP BY 1),
             |mb AS (SELECT o_orderpriority, sum(n_xy) AS nb FROM cell GROUP BY 1),
             |tot AS (SELECT sum(n_xy) AS n FROM cell)
             |SELECT cell.c_mktsegment, cell.o_orderpriority,
             |       n_xy::BIGINT AS n_xy,
             |       round(ln((n_xy::DOUBLE * n::DOUBLE)
             |             / (na::DOUBLE * nb::DOUBLE)), 6) AS pmi,
             |       round((n_xy::DOUBLE / n::DOUBLE)
             |             * ln((n_xy::DOUBLE * n::DOUBLE)
             |                  / (na::DOUBLE * nb::DOUBLE)), 6) AS mi_contrib
             |FROM cell
             |JOIN ma USING (c_mktsegment)
             |JOIN mb USING (o_orderpriority)
             |CROSS JOIN tot
             |ORDER BY c_mktsegment, o_orderpriority""".stripMargin)),

    // ── common-neighbor (Jaccard) link-prediction scores over the part
    // co-purchase graph (any shared order): adjacency arrays + in-array
    // intersect — never a wedge enumeration; top 100 by score with a
    // deterministic (jaccard, a, b) tiebreak ────────────────────────────
    QuerySpec("edge_jaccard",
      (s, d) => {
        // same in-array pair form as triangle_count's edge build; no
        // ≥2 filter (the ≥1 graph is non-degenerate at sf0.01 AND
        // sf0.1) and no pair-count rollup — edgeJaccard's canonical
        // distinct absorbs cross-order duplicates
        val edges = lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
          .groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
          // pinned post-agg repartition (opt r19, §2.4 — the measured
          // v6 variant, min-of-3 2.85 → 2.52 s): AQE coalesces the
          // byte-light basket table to ~4 partitions while the in-array
          // pair explode + adjacency partial agg above it are the
          // CPU-heavy stage (probe: 3.4 s CPU on 4 tasks). Rows
          // unchanged; everything downstream aggregates by key.
          .repartition(s.sparkContext.defaultParallelism)
          .select(explode(flatten(transform(col("__items"), (a, i) =>
            transform(
              slice(col("__items"), i + lit(2), size(col("__items"))),
              b => struct(a.as("part_a"), b.as("part_b")))))).as("__p"))
          .select(col("__p.part_a"), col("__p.part_b"))
        Analytics.edgeJaccard(edges, "part_a", "part_b")
          .orderBy(desc("jaccard"), col("part_a"), col("part_b"))
          .limit(100)
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (
             |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM li a JOIN li b USING (l_orderkey)
             |  WHERE a.l_partkey < b.l_partkey),
             |nb AS (SELECT pa AS n, pb AS m FROM e
             |       UNION ALL SELECT pb, pa FROM e),
             |deg AS (SELECT n, count(*) AS d FROM nb GROUP BY 1),
             |cm AS (
             |  SELECT e.pa, e.pb, count(*) AS c
             |  FROM e
             |  JOIN nb x ON x.n = e.pa
             |  JOIN nb y ON y.n = e.pb AND y.m = x.m
             |  GROUP BY 1, 2)
             |SELECT e.pa AS part_a, e.pb AS part_b,
             |       coalesce(c, 0)::BIGINT AS common_cnt,
             |       da.d::BIGINT AS deg_a, db.d::BIGINT AS deg_b,
             |       round(coalesce(c, 0)::DOUBLE
             |             / (da.d + db.d - coalesce(c, 0))::DOUBLE, 6)
             |         AS jaccard
             |FROM e
             |JOIN deg da ON da.n = e.pa
             |JOIN deg db ON db.n = e.pb
             |LEFT JOIN cm ON cm.pa = e.pa AND cm.pb = e.pb
             |ORDER BY jaccard DESC, part_a, part_b
             |LIMIT 100""".stripMargin)),

    // ── 2-D Pareto frontier of orders (latest day AND highest price):
    // two-phase local-then-global skyline, never an O(n²) self-join;
    // oracle uses the same strict-greater running-max window form ──────
    QuerySpec("skyline_orders",
      (s, d) => Analytics.skyline2D(
          orders(s, d).select(col("o_orderkey"),
            (col("o_orderdate").cast("timestamp").cast("long") / 86400L)
              .cast("long").as("order_day"),
            round(col("o_totalprice") * 100).cast("long")
              .as("price_cents")),
          "o_orderkey", "order_day", "price_cents")
        .orderBy("order_day", "o_orderkey"),
      Some("""WITH o AS (
             |  SELECT o_orderkey,
             |         CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS order_day,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
             |  FROM orders),
             |w AS (SELECT *, max(price_cents) OVER (ORDER BY order_day DESC
             |        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
             |      FROM o)
             |SELECT o_orderkey, order_day, price_cents FROM w
             |WHERE mx IS NULL OR price_cents >= mx
             |ORDER BY order_day, o_orderkey""".stripMargin)),

    // ── the same frontier via the de-windowed scale path (value-range
    // buckets + per-bucket windows + cross-bucket max join — no
    // single-partition window even on anti-correlated data);
    // result-identical to skyline_orders, so it shares the oracle ──────
    QuerySpec("skyline_bucketed",
      (s, d) => Analytics.skyline2DBucketed(
          orders(s, d).select(col("o_orderkey"),
            (col("o_orderdate").cast("timestamp").cast("long") / 86400L)
              .cast("long").as("order_day"),
            round(col("o_totalprice") * 100).cast("long")
              .as("price_cents")),
          "o_orderkey", "order_day", "price_cents")
        .orderBy("order_day", "o_orderkey"),
      Some("""WITH o AS (
             |  SELECT o_orderkey,
             |         CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS order_day,
             |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
             |  FROM orders),
             |w AS (SELECT *, max(price_cents) OVER (ORDER BY order_day DESC
             |        RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
             |      FROM o)
             |SELECT o_orderkey, order_day, price_cents FROM w
             |WHERE mx IS NULL OR price_cents >= mx
             |ORDER BY order_day, o_orderkey""".stripMargin)),

    // ── Benford first-digit audit of lineitem prices: digit from the
    // exact integer cents (string head), never float log10 binning ──────
    QuerySpec("benford_digits",
      (s, d) => Analytics.benfordDigits(lineitem(s, d), "l_extendedprice")
        .orderBy("digit"),
      Some("""WITH c AS (
             |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100)
             |           AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM lineitem
             |  WHERE CAST(round(l_extendedprice * 100) AS BIGINT) > 0)
             |SELECT digit, count(*)::BIGINT AS n_values,
             |       round(count(*)::DOUBLE / (SELECT count(*) FROM c), 6)
             |         AS share,
             |       round(log10(1 + 1.0 / digit), 6) AS benford_expected
             |FROM c GROUP BY digit ORDER BY digit""".stripMargin)),

    // ── lag-1 autocorrelation of per-nation daily revenue: decimal
    // moment sums (cents² overflows long at warehouse scale), one
    // double round at the end — trendSlope's determinism posture ────────
    QuerySpec("autocorr_lag",
      (s, d) => Analytics.autocorrLag(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_nationkey", "o_orderdate", "o_totalprice")
        .orderBy("c_nationkey"),
      Some("""WITH daily AS (
             |  SELECT c.c_nationkey,
             |         CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS d,
             |         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |p AS (SELECT c_nationkey, v AS x,
             |             lead(v) OVER (PARTITION BY c_nationkey
             |                           ORDER BY d) AS y
             |      FROM daily)
             |SELECT c_nationkey, count(*)::BIGINT AS n_pairs,
             |       round((count(*) * sum(x::HUGEINT * y)
             |                - sum(x::HUGEINT) * sum(y::HUGEINT))::DOUBLE
             |             / sqrt((count(*) * sum(x::HUGEINT * x)
             |                - sum(x::HUGEINT) * sum(x::HUGEINT))::DOUBLE)
             |             / sqrt((count(*) * sum(y::HUGEINT * y)
             |                - sum(y::HUGEINT) * sum(y::HUGEINT))::DOUBLE),
             |             6) AS autocorr
             |FROM p WHERE y IS NOT NULL
             |GROUP BY 1 HAVING count(*) >= 2
             |ORDER BY c_nationkey""".stripMargin)),

    // ── multi-source BFS over the part co-purchase graph (landmarks =
    // every 97th part): level-synchronous frontier expansion, maxDepth
    // hash joins keyed on the frontier — vs a WITH RECURSIVE oracle ─────
    QuerySpec("bfs_distances",
      (s, d) => {
        val li = lineitem(s, d)
        val canon = li
          .select(col("l_orderkey"), col("l_partkey"))
          .groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
          // pinned post-agg repartition (opt r19, §2.4 — see
          // coPurchaseEdges)
          .repartition(s.sparkContext.defaultParallelism)
          .select(explode(flatten(transform(col("__items"), (a, i) =>
            transform(
              slice(col("__items"), i + lit(2), size(col("__items"))),
              b => struct(a.as("pa"), b.as("pb")))))).as("__p"))
          .select(col("__p.pa"), col("__p.pb"))
        val sym = canon.select(explode(array(
            struct(col("pa").as("s"), col("pb").as("t")),
            struct(col("pb").as("s"), col("pa").as("t")))).as("__e"))
          .select(col("__e.s").as("s"), col("__e.t").as("t"))
        val seeds = li.select(col("l_partkey"))
          .filter(col("l_partkey") % 97 === 0)
        Analytics.bfsDistances(sym, "s", "t", seeds, "l_partkey",
            maxDepth = 3, outCol = "part")
          .select(col("part"), col("dist").cast("int").as("dist"))
          .orderBy("part")
      },
      Some("""WITH RECURSIVE li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
             |      FROM li a JOIN li b USING (l_orderkey)
             |      WHERE a.l_partkey <> b.l_partkey),
             |paths AS (
             |  SELECT DISTINCT l_partkey AS n, 0 AS d FROM li
             |  WHERE l_partkey % 97 = 0
             |  UNION
             |  SELECT e.t AS n, p.d + 1 AS d FROM paths p
             |  JOIN e ON e.s = p.n WHERE p.d < 3)
             |SELECT n AS part, min(d)::INT AS dist FROM paths
             |GROUP BY 1 ORDER BY part""".stripMargin)),

    // ── per-nation day-of-week revenue profile: weekday from pure
    // integer epoch-day arithmetic ((day+4) mod 7), engine-independent ──
    QuerySpec("dow_profile",
      (s, d) => Analytics.dowProfile(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_nationkey", "o_orderdate", "o_totalprice")
        .orderBy("c_nationkey", "dow"),
      Some("""WITH r AS (
             |  SELECT c.c_nationkey,
             |         ((CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 + 4)
             |           % 7)::INT AS dow,
             |         sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2)
             |SELECT c_nationkey, dow, v::BIGINT AS revenue_cents,
             |       round(v::DOUBLE /
             |             CAST(sum(v) OVER (PARTITION BY c_nationkey)
             |                  AS DOUBLE), 6) AS share
             |FROM r ORDER BY c_nationkey, dow""".stripMargin)),

    // ── per-nation Lorenz curve deciles (gini_revenue's plottable
    // companion): exact cent sums, SQL-standard ntile on a unique order ─
    QuerySpec("lorenz_points",
      (s, d) => Analytics.lorenzPoints(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_nationkey", "o_orderkey", "o_totalprice")
        .orderBy("c_nationkey", "bucket"),
      Some("""WITH x AS (
             |  SELECT c.c_nationkey AS g, o.o_orderkey,
             |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |r AS (SELECT g, v, ntile(10) OVER (PARTITION BY g
             |        ORDER BY v, o_orderkey) AS bucket FROM x),
             |s AS (SELECT g, bucket, CAST(sum(v) AS BIGINT) AS dv
             |      FROM r GROUP BY 1, 2),
             |c AS (SELECT g, bucket,
             |        CAST(sum(dv) OVER (PARTITION BY g ORDER BY bucket)
             |             AS BIGINT) AS cum,
             |        CAST(sum(dv) OVER (PARTITION BY g) AS BIGINT) AS tot
             |      FROM s)
             |SELECT g AS c_nationkey, bucket::INT AS bucket,
             |       round(cum::DOUBLE / tot, 6) AS cum_share
             |FROM c ORDER BY c_nationkey, bucket""".stripMargin)),

    // ── one-row chi-square + Cramér's V (mktsegment × orderpriority):
    // cell terms folded in sorted-cell order — float addition order
    // never decides the statistic ───────────────────────────────────────
    QuerySpec("cramers_v",
      (s, d) => Analytics.cramersV(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_mktsegment", "o_orderpriority"),
      Some("""WITH x AS (
             |  SELECT c.c_mktsegment AS a, o.o_orderpriority AS b
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |cell AS (SELECT a, b, count(*)::BIGINT AS o FROM x
             |         GROUP BY 1, 2),
             |ma AS (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM cell
             |       GROUP BY 1),
             |mb AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb FROM cell
             |       GROUP BY 1),
             |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             |               count(DISTINCT a)::BIGINT AS r,
             |               count(DISTINCT b)::BIGINT AS c FROM cell),
             |terms AS (SELECT cell.a, cell.b,
             |            cell.o::DOUBLE * cell.o
             |            / (ma.na::DOUBLE * mb.nb / tot.n) AS t
             |          FROM cell JOIN ma USING (a) JOIN mb USING (b)
             |          CROSS JOIN tot),
             |o AS (SELECT list_aggregate(list(t ORDER BY a, b), 'sum')
             |        - (SELECT n FROM tot) AS chi2 FROM terms)
             |SELECT round(chi2, 6) AS chi2,
             |       round(sqrt(chi2 / (tot.n * (least(tot.r, tot.c) - 1))),
             |             6) AS cramers_v,
             |       tot.n AS n_rows,
             |       ((tot.r - 1) * (tot.c - 1))::INT AS dof
             |FROM o CROSS JOIN tot""".stripMargin)),

    // ── per-nation runs test of daily revenue (random vs momentum vs
    // alternation): integer run counts, one double z at the end ─────────
    QuerySpec("runs_test",
      (s, d) => Analytics.runsTest(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_nationkey", "o_orderdate", "o_totalprice")
        .orderBy("c_nationkey"),
      Some("""WITH d AS (
             |  SELECT c.c_nationkey AS g,
             |         CAST(epoch(o.o_orderdate) AS BIGINT) // 86400 AS day,
             |         CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |              AS BIGINT) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |m AS (SELECT g, quantile_cont(v, 0.5) AS med FROM d
             |      GROUP BY 1),
             |s AS (SELECT d.g, d.day,
             |             CASE WHEN d.v > m.med THEN 1 ELSE 0 END AS up
             |      FROM d JOIN m ON d.g = m.g WHERE d.v <> m.med),
             |r AS (SELECT g, day, up,
             |        CASE WHEN lag(up) OVER (PARTITION BY g ORDER BY day)
             |               IS NULL
             |             OR lag(up) OVER (PARTITION BY g ORDER BY day)
             |               <> up
             |             THEN 1 ELSE 0 END AS brk FROM s),
             |agg AS (SELECT g, CAST(sum(up) AS BIGINT) AS n1,
             |               CAST(sum(1 - up) AS BIGINT) AS n2,
             |               CAST(sum(brk) AS BIGINT) AS runs
             |        FROM r GROUP BY 1)
             |SELECT g AS c_nationkey, n1, n2, runs,
             |       round((runs::DOUBLE - (2.0 * n1 * n2 / (n1 + n2) + 1))
             |             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
             |                    / ((n1 + n2)::DOUBLE * (n1 + n2)
             |                       * (n1 + n2 - 1))), 6) AS z
             |FROM agg ORDER BY c_nationkey""".stripMargin)),

    // ── per-nation two-sample KS drift (urgent vs rest of totalprice):
    // integer cumulative counts, the max in cross-multiplied integer
    // form |c1·n2 − c2·n1| — one final division, bit-deterministic ──────
    QuerySpec("ks_drift",
      (s, d) => Analytics.ksDrift(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey"))
            .withColumn("cents",
              round(col("o_totalprice") * 100).cast("long"))
            .withColumn("urgent",
              (col("o_orderpriority") === "1-URGENT").cast("int")),
          "c_nationkey", "cents", "urgent")
        .orderBy("c_nationkey"),
      Some("""WITH x AS (
             |  SELECT c.c_nationkey AS g,
             |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS v,
             |         CASE WHEN o.o_orderpriority = '1-URGENT'
             |              THEN 1 ELSE 0 END AS s1
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |n AS (SELECT g, CAST(sum(s1) AS BIGINT) AS n1,
             |             CAST(sum(1 - s1) AS BIGINT) AS n2
             |      FROM x GROUP BY 1),
             |pv AS (SELECT g, v, CAST(sum(s1) AS BIGINT) AS c1,
             |              CAST(sum(1 - s1) AS BIGINT) AS c2
             |       FROM x GROUP BY 1, 2),
             |cum AS (SELECT g, v,
             |          CAST(sum(c1) OVER (PARTITION BY g ORDER BY v)
             |               AS BIGINT) AS f1,
             |          CAST(sum(c2) OVER (PARTITION BY g ORDER BY v)
             |               AS BIGINT) AS f2
             |        FROM pv),
             |d AS (SELECT cum.g,
             |             CAST(max(abs(f1 * n.n2 - f2 * n.n1)) AS BIGINT)
             |               AS dmax
             |      FROM cum JOIN n ON cum.g = n.g GROUP BY 1)
             |SELECT n.g AS c_nationkey, n.n1, n.n2,
             |       round(d.dmax::DOUBLE / (n.n1 * n.n2), 6) AS ks_stat
             |FROM n JOIN d ON d.g = n.g
             |ORDER BY c_nationkey""".stripMargin)),

    // ── per-nation MAD robust-scale summary (exact interpolated
    // median + MAD of cents, max robust z): the data is uniform, so
    // flags at any classic threshold are vacuous — the spec exercises
    // them on a heavy-tailed fixture; this pins the arithmetic ──────────
    QuerySpec("mad_robust",
      (s, d) => Analytics.madOutliers(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey"))
            .withColumn("cents",
              round(col("o_totalprice") * 100).cast("long")),
          "c_nationkey", "cents")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_rows"),
          round(max("group_median"), 6).as("med_cents"),
          round(max("group_mad"), 6).as("mad_cents"),
          round(max("robust_z"), 6).as("max_robust_z"))
        .orderBy("c_nationkey"),
      Some("""WITH x AS (
             |  SELECT c.c_nationkey AS g,
             |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |med AS (SELECT g, quantile_cont(v, 0.5) AS med
             |        FROM x GROUP BY 1),
             |dev AS (SELECT x.g, x.v, abs(x.v - med.med) AS dv
             |        FROM x JOIN med ON x.g = med.g),
             |md AS (SELECT g, quantile_cont(dv, 0.5) AS mad,
             |              avg(dv) AS meanad
             |       FROM dev GROUP BY 1)
             |SELECT dev.g AS c_nationkey, count(*)::BIGINT AS n_rows,
             |       round(max(med.med), 6) AS med_cents,
             |       round(max(md.mad), 6) AS mad_cents,
             |       round(max(CASE WHEN md.mad > 0
             |                      THEN 0.6745 * dev.dv / md.mad
             |                      WHEN md.meanad > 0
             |                      THEN 0.7979 * dev.dv / md.meanad
             |                      ELSE 0.0 END), 6)
             |         AS max_robust_z
             |FROM dev JOIN med ON dev.g = med.g JOIN md ON dev.g = md.g
             |GROUP BY 1 ORDER BY c_nationkey""".stripMargin)),

    // ── per-nation one-way ANOVA F of totalprice across order
    // priorities: two-pass sums of squares on exact half-up integer
    // micro-cent means — never the cancellation-prone ΣS²/n form ────────
    QuerySpec("anova_f",
      (s, d) => Analytics.anovaF(
          orders(s, d).join(customer(s, d),
            col("o_custkey") === col("c_custkey")),
          "c_nationkey", "o_orderpriority", "o_totalprice")
        .orderBy("c_nationkey"),
      Some("""WITH x AS (
             |  SELECT c.c_nationkey AS g, o.o_orderpriority AS t,
             |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             |gm AS (SELECT g, t, count(*)::BIGINT AS n_g,
             |              CAST(sum(v) AS BIGINT) AS s_g,
             |              (2000000 * CAST(sum(v) AS HUGEINT) + count(*))
             |                // (2 * count(*)) AS m_g
             |       FROM x GROUP BY 1, 2),
             |tm AS (SELECT g, CAST(sum(n_g) AS BIGINT) AS n,
             |              count(*)::BIGINT AS k,
             |              (2000000 * CAST(sum(s_g) AS HUGEINT) + sum(n_g))
             |                // (2 * sum(n_g)) AS m
             |       FROM gm GROUP BY 1),
             |ssw AS (SELECT x.g,
             |          sum((1000000 * CAST(x.v AS HUGEINT) - gm.m_g)
             |              * (1000000 * CAST(x.v AS HUGEINT) - gm.m_g))
             |            AS ssw
             |        FROM x JOIN gm ON x.g = gm.g AND x.t = gm.t
             |        GROUP BY 1),
             |ssb AS (SELECT gm.g,
             |          sum(gm.n_g * (gm.m_g - tm.m) * (gm.m_g - tm.m))
             |            AS ssb
             |        FROM gm JOIN tm ON gm.g = tm.g GROUP BY 1)
             |SELECT tm.g AS c_nationkey, tm.n AS n_rows,
             |       tm.k::INT AS k_groups,
             |       round((ssb.ssb::DOUBLE / (tm.k - 1))
             |             / (ssw.ssw::DOUBLE / (tm.n - tm.k)), 6) AS f_stat
             |FROM tm JOIN ssw ON ssw.g = tm.g JOIN ssb ON ssb.g = tm.g
             |ORDER BY c_nationkey""".stripMargin)),

    // ── degree histogram of the co-purchase graph: the structure
    // fingerprint read before any per-edge algorithm ─────────────────────
    QuerySpec("degree_dist",
      (s, d) => {
        // same join-free in-array pair build as bfs_distances/
        // triangle_count; degreeDistribution's canonical distinct
        // absorbs cross-order duplicates
        val pairs = lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
          .groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("__items"))
          // pinned post-agg repartition (opt r19, §2.4 — see
          // coPurchaseEdges)
          .repartition(s.sparkContext.defaultParallelism)
          .select(explode(flatten(transform(col("__items"), (a, i) =>
            transform(
              slice(col("__items"), i + lit(2), size(col("__items"))),
              b => struct(a.as("a"), b.as("b")))))).as("__p"))
          .select(col("__p.a"), col("__p.b"))
        Analytics.degreeDistribution(pairs, "a", "b")
          .orderBy("degree")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |e AS (SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
             |      FROM li a JOIN li b USING (l_orderkey)
             |      WHERE a.l_partkey < b.l_partkey),
             |nb AS (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e),
             |deg AS (SELECT n, count(*) AS degree FROM nb GROUP BY 1)
             |SELECT degree::BIGINT AS degree, count(*)::BIGINT AS n_nodes
             |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin)),

    // ── two-sample Kolmogorov–Smirnov test: urgent-priority order
    // values vs the rest, on the integer cent grid. The DE-WINDOWED
    // global form of ks_drift: where ksDrift partitions its ECDF
    // window per group, one corpus-wide comparison has no group key —
    // so the sup runs in cross-multiplied exact integers over rocAuc's
    // bucketed two-level prefix sums (no single-partition window over
    // the histogram). The oracle is the direct windowed-ECDF form ───────
    QuerySpec("ks_test",
      (s, d) => Analytics.ksTest(
        orders(s, d).select(
          round(col("o_totalprice") * 100).cast("long").as("__cents"),
          col("o_orderpriority")),
        "__cents", col("o_orderpriority") === "1-URGENT"),
      Some("""WITH h AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
             |         sum(CASE WHEN o_orderpriority = '1-URGENT'
             |             THEN 1 ELSE 0 END)::BIGINT AS ca,
             |         sum(CASE WHEN o_orderpriority = '1-URGENT'
             |             THEN 0 ELSE 1 END)::BIGINT AS cb
             |  FROM orders GROUP BY 1),
             |c AS (
             |  SELECT s,
             |         sum(ca) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
             |           PRECEDING AND CURRENT ROW) AS cuma,
             |         sum(cb) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
             |           PRECEDING AND CURRENT ROW) AS cumb
             |  FROM h),
             |t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
             |      FROM h),
             |d AS (SELECT s, abs(cuma::HUGEINT * nb - cumb::HUGEINT * na)
             |        AS dn
             |      FROM c CROSS JOIN t)
             |SELECT na AS n_a, nb AS n_b,
             |       round((SELECT max(dn) FROM d)::DOUBLE
             |             / (na::HUGEINT * nb)::DOUBLE, 6) AS ks_d,
             |       (SELECT min(s) FROM d
             |        WHERE dn = (SELECT max(dn) FROM d)) AS at_value
             |FROM t""".stripMargin)),

    // ── Wasserstein-1 (earth-mover) distance between the same two
    // order-value samples as ks_test — the magnitude in cents the KS
    // statistic lacks. Per-gap terms are exact decimal integers over
    // the same bucketed prefix sums, plus the per-bucket predecessor
    // (lag within buckets, earlier-bucket max at bucket heads) ──────────
    QuerySpec("w1_drift",
      (s, d) => Analytics.w1Drift(
        orders(s, d).select(
          round(col("o_totalprice") * 100).cast("long").as("__cents"),
          col("o_orderpriority")),
        "__cents", col("o_orderpriority") === "1-URGENT"),
      Some("""WITH h AS (
             |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS s,
             |         sum(CASE WHEN o_orderpriority = '1-URGENT'
             |             THEN 1 ELSE 0 END)::BIGINT AS ca,
             |         sum(CASE WHEN o_orderpriority = '1-URGENT'
             |             THEN 0 ELSE 1 END)::BIGINT AS cb
             |  FROM orders GROUP BY 1),
             |c AS (
             |  SELECT s, ca, cb,
             |         sum(ca) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
             |           PRECEDING AND CURRENT ROW) AS cuma,
             |         sum(cb) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
             |           PRECEDING AND CURRENT ROW) AS cumb,
             |         lag(s) OVER (ORDER BY s) AS prev
             |  FROM h),
             |t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
             |      FROM h)
             |SELECT max(na) AS n_a, max(nb) AS n_b,
             |       CASE WHEN max(na) > 0 AND max(nb) > 0 THEN
             |         round(coalesce(sum(CASE WHEN prev IS NOT NULL THEN
             |             abs((cuma - ca)::HUGEINT * nb
             |                 - (cumb - cb)::HUGEINT * na) * (s - prev)
             |           END), 0)::DOUBLE
             |           / (max(na)::HUGEINT * max(nb))::DOUBLE, 6)
             |       END AS w1
             |FROM c CROSS JOIN t""".stripMargin)),

    // ── PSI between the pre-1995 baseline segment and the current
    // rest of the SAME table, in ONE scan (psi_drift's two-snapshot
    // psiReport reads its inputs separately; this is the
    // segment-predicate twin), over a fixed 20-bin integer-cent grid
    // (add-1 smoothed over the FULL grid, empty bins included);
    // per-bin terms micro-nat-quantized so the total is order-free
    // integer algebra ────────────────────────────────────────────────────
    QuerySpec("psi_split",
      (s, d) => Analytics.psiDrift(orders(s, d), "o_totalprice",
          expr("cast(cast(o_orderdate as timestamp) as long)")
            < lit(788918400L),
          binWidthCents = 2500000L, nBins = 20)
        .orderBy("bin"),
      Some("""WITH b AS (
             |  SELECT least(greatest(
             |           CAST(round(o_totalprice * 100) AS BIGINT)
             |             // 2500000, 0), 19) AS bin,
             |         CASE WHEN epoch_us(o_orderdate)//1000000 < 788918400
             |           THEN 1 ELSE 0 END AS yb
             |  FROM orders),
             |c AS (SELECT bin, sum(yb)::BIGINT AS cb,
             |             (count(*) - sum(yb))::BIGINT AS cc
             |      FROM b GROUP BY 1),
             |g AS (SELECT unnest(generate_series(0, 19)) AS bin),
             |f AS (SELECT g.bin, coalesce(cb, 0)::BIGINT AS cb,
             |             coalesce(cc, 0)::BIGINT AS cc
             |      FROM g LEFT JOIN c USING (bin)),
             |t AS (SELECT sum(cb)::BIGINT AS nb, sum(cc)::BIGINT AS nc
             |      FROM f),
             |x AS (
             |  SELECT bin, cb, cc,
             |         CAST(round(((cb + 1)::DOUBLE / (nb + 20)
             |                     - (cc + 1)::DOUBLE / (nc + 20))
             |           * ln(((cb + 1)::DOUBLE / (nb + 20))
             |                / ((cc + 1)::DOUBLE / (nc + 20)))
             |           * 1000000.0) AS BIGINT) AS tm
             |  FROM f CROSS JOIN t)
             |SELECT bin::INT AS bin, cb AS n_base, cc AS n_cur,
             |       tm / 1000000.0 AS psi_term,
             |       (SELECT sum(tm) FROM x) / 1000000.0 AS psi_total
             |FROM x ORDER BY bin""".stripMargin)),

    // ── windowed drift SERIES (VERDICT r12 #3): PSI of every post-1995
    // order month against the pre-1995 reference window — the
    // per-time-bucket monitoring form of psi_split, one row per month.
    // Same 20-bin integer-cent grid, add-1 smoothing over the full
    // grid, micro-nat-quantized per-bin terms → order-free integer
    // totals. ONE corpus scan into a cached buckets×bins cell frame ─────
    QuerySpec("drift_series",
      (s, d) => Analytics.driftSeries(orders(s, d), "o_totalprice",
          expr("cast(cast(o_orderdate as timestamp) as long)")
            < lit(788918400L),
          to_date(date_trunc("MONTH", col("o_orderdate").cast("timestamp"))),
          binWidthCents = 2500000L, nBins = 20)
        .orderBy("bucket"),
      Some("""WITH b AS (
             |  SELECT date_trunc('month', o_orderdate)::DATE AS bucket,
             |         CASE WHEN epoch_us(o_orderdate)//1000000 < 788918400
             |           THEN 1 ELSE 0 END AS yr,
             |         least(greatest(
             |           CAST(round(o_totalprice * 100) AS BIGINT)
             |             // 2500000, 0), 19) AS bin
             |  FROM orders),
             |cells AS (SELECT bucket, bin, sum(yr)::BIGINT AS cr,
             |                 (count(*) - sum(yr))::BIGINT AS cc
             |          FROM b GROUP BY 1, 2),
             |rh AS (SELECT bin, sum(cr)::BIGINT AS rb FROM cells GROUP BY 1),
             |nr AS (SELECT sum(cr)::BIGINT AS nrf FROM cells),
             |cbk AS (SELECT bucket, sum(cc)::BIGINT AS ncur FROM cells
             |        GROUP BY 1 HAVING sum(cc) > 0),
             |g AS (SELECT bucket, ncur,
             |             unnest(generate_series(0, 19)) AS bin
             |      FROM cbk),
             |f AS (SELECT g.bucket, g.ncur, g.bin,
             |             coalesce(c.cc, 0)::BIGINT AS cc,
             |             coalesce(rh.rb, 0)::BIGINT AS rb
             |      FROM g LEFT JOIN cells c
             |        ON c.bucket = g.bucket AND c.bin = g.bin
             |      LEFT JOIN rh ON rh.bin = g.bin),
             |x AS (SELECT bucket, ncur, nrf,
             |        CAST(round(((rb + 1)::DOUBLE / (nrf + 20)
             |                    - (cc + 1)::DOUBLE / (ncur + 20))
             |          * ln(((rb + 1)::DOUBLE / (nrf + 20))
             |               / ((cc + 1)::DOUBLE / (ncur + 20)))
             |          * 1000000.0) AS BIGINT) AS tm
             |      FROM f CROSS JOIN nr)
             |SELECT bucket, nrf AS n_ref, ncur AS n_cur,
             |       sum(tm) / 1000000.0 AS psi
             |FROM x GROUP BY bucket, nrf, ncur ORDER BY bucket""".stripMargin)),

    // ── per-nation Spearman rank correlation between daily order
    // count and daily revenue: average-rank ties in DOUBLED integer
    // units, Pearson-on-ranks moments in exact decimal — rank windows
    // partitioned per nation over the calendar-bounded daily table ──────
    QuerySpec("spearman_corr",
      (s, d) => Analytics.spearmanByGroup(
          orders(s, d).join(customer(s, d),
              col("o_custkey") === col("c_custkey"))
            .groupBy(col("c_nationkey"),
              expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
                .as("__d"))
            .agg(count(lit(1)).as("__x"),
              sum(round(col("o_totalprice") * 100).cast("long")).as("__y")),
          "c_nationkey", "__x", "__y")
        .orderBy("c_nationkey"),
      Some("""WITH daily AS (
             |  SELECT c.c_nationkey AS g,
             |         epoch_us(o.o_orderdate)//1000000//86400 AS d,
             |         count(*)::BIGINT AS x,
             |         sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |           ::BIGINT AS y
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |r AS (
             |  SELECT g,
             |         2 * rank() OVER (PARTITION BY g ORDER BY x)
             |           + count(*) OVER (PARTITION BY g, x) - 1 AS rx,
             |         2 * rank() OVER (PARTITION BY g ORDER BY y)
             |           + count(*) OVER (PARTITION BY g, y) - 1 AS ry
             |  FROM daily),
             |m AS (
             |  SELECT g, count(*)::BIGINT AS n,
             |         sum(rx::HUGEINT) AS sx, sum(ry::HUGEINT) AS sy,
             |         sum(rx::HUGEINT * ry) AS sxy,
             |         sum(rx::HUGEINT * rx) AS sxx,
             |         sum(ry::HUGEINT * ry) AS syy
             |  FROM r GROUP BY 1)
             |SELECT g AS c_nationkey, n,
             |       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
             |                 AND n * syy - sy * sy > 0
             |         THEN round((n * sxy - sx * sy)::DOUBLE
             |                / sqrt((n * sxx - sx * sx)::DOUBLE)
             |                / sqrt((n * syy - sy * sy)::DOUBLE), 6)
             |       END AS spearman
             |FROM m ORDER BY c_nationkey""".stripMargin))
  )
}
