package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One catalog entry: the Spark plan and (when SQL-expressible) its DuckDB
  * oracle twin. Keeping both in one place is what keeps column aliases in
  * lock-step — the driver's compare sorts columns by name before hashing.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    // Deferred oracle generator for entries whose DuckDB twin inlines
    // DRIVER-FIT literals (PQ codebooks, coarse centroids): the SQL
    // can only be written after the query has run and stashed its fit
    // (graft.engine.PqOracles), so Verify evaluates this thunk when it
    // dumps oracle_sql.json — after the catalog pass. The thunk
    // returns None when the fit never ran (partial local runs) → the
    // entry degrades to the contract's rows-only check instead of
    // lying. The OUTER Option is the static "this entry HAS an oracle"
    // flag — graft.Counts must see deferred-oracle entries as oracled
    // without running any query (a fresh JVM has no stashes), so
    // presence of the generator, not its result, carries that fact.
    lazyOracle: Option[() => Option[String]] = None)

/** The relational query catalog: every SQL-expressible operator family from
  * SURVEY.md §2 bound to the driver testdata tables. Conventions for oracle
  * determinism (SURVEY.md §5/§7):
  *   - every query ends in ORDER BY over a unique key, mirrored in the SQL;
  *   - float *aggregates* are round()ed identically on both sides (partial
  *     aggregation makes the last ulps order-dependent); per-row IEEE
  *     arithmetic is left raw (bit-identical across engines);
  *   - `events.ts` is ns-precision parquet (Spark truncates to µs, DuckDB
  *     keeps ns), so queries never emit raw `ts` — they emit truncated
  *     epoch seconds, computed as `cast(ts as long)` in Spark and
  *     `epoch_us(ts)//1000000` in DuckDB (both floor to whole seconds);
  *   - windows over events order by `event_id` (unique, time-correlated)
  *     rather than raw `ts`, eliminating µs-vs-ns tie ambiguity.
  */
object Relational {

  import Tables._

  /** DuckDB-side truncated epoch seconds for events.ts (see scaladoc). */
  private val EpochS = "epoch_us(ts)//1000000"

  /** Overflow-guarded composite time key `epoch·slot + off` for the
    * as-of/PIT queries: raises loudly instead of silently wrapping
    * when the product would exceed a long (with ANSI off, Spark wraps
    * long multiplication — garbage orderings, wrong matches, and an
    * oracle that errors while Spark "succeeds"). assert_true returns
    * NULL on success, so the `when` wrapper cannot be pruned away. */
  private[graft] def slotKey(epoch: Column, slot: Column, off: Column): Column = {
    // The bound compares in decimal(38,0), never double: `(MaxValue -
    // off) / slot` is DOUBLE division in Spark, so within a few ulps
    // of the exact bound an epoch whose product exceeds Long.MaxValue
    // could pass the assert and wrap silently — the exact failure
    // class this guard exists to make loud (ADVICE r10). decimal(38,0)
    // holds epoch*slot+off exactly for any long operands (≤39 digits).
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    when(assert_true(
        epoch.cast(dec) * slot.cast(dec) + off.cast(dec) <=
          lit(Long.MaxValue).cast(dec),
        lit("composite time key overflows long: epoch*slot+off " +
          "exceeds Long.MaxValue — the derived slot outgrew the " +
          "epoch range; widen the key to decimal at this scale"))
        .isNull,
      epoch * slot + off)
  }

  val catalog: Seq[QuerySpec] = Seq(

    // ── frequency encoding (flagship) — reference: src/feature_engineering.py:224-234
    QuerySpec("freq_encoding",
      (s, d) => Features.frequencyEncoding(customer(s, d), Seq("c_mktsegment"))
        .select("c_custkey", "c_mktsegment", "c_mktsegment_freq")
        .orderBy("c_custkey"),
      Some("""SELECT c.c_custkey, c.c_mktsegment, f.c_mktsegment_freq
             |FROM customer c
             |JOIN (SELECT c_mktsegment, count(*) AS c_mktsegment_freq
             |      FROM customer GROUP BY 1) f USING (c_mktsegment)
             |ORDER BY c_custkey""".stripMargin)),

    // ── group-wise multi-agg joined back — reference: src/feature_engineering.py:36-58
    QuerySpec("agg_features",
      (s, d) => Features.aggregationFeatures(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey", "l_returnflag", "l_quantity", "l_extendedprice"),
          Seq("l_returnflag"), Seq("l_quantity", "l_extendedprice"), roundTo = 4)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
             |       l.l_returnflag, l.l_quantity, l.l_extendedprice,
             |       a.l_quantity_mean, a.l_quantity_std, a.l_quantity_min,
             |       a.l_quantity_max, a.l_quantity_count,
             |       a.l_extendedprice_mean, a.l_extendedprice_std,
             |       a.l_extendedprice_min, a.l_extendedprice_max,
             |       a.l_extendedprice_count
             |FROM lineitem l
             |LEFT JOIN (
             |  SELECT l_returnflag,
             |         round(avg(l_quantity), 4)    AS l_quantity_mean,
             |         round(stddev(l_quantity), 4) AS l_quantity_std,
             |         min(l_quantity)              AS l_quantity_min,
             |         max(l_quantity)              AS l_quantity_max,
             |         count(l_quantity)            AS l_quantity_count,
             |         round(avg(l_extendedprice), 4)    AS l_extendedprice_mean,
             |         round(stddev(l_extendedprice), 4) AS l_extendedprice_std,
             |         min(l_extendedprice)              AS l_extendedprice_min,
             |         max(l_extendedprice)              AS l_extendedprice_max,
             |         count(l_extendedprice)            AS l_extendedprice_count
             |  FROM lineitem GROUP BY 1) a USING (l_returnflag)
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── arithmetic time features — reference: src/feature_engineering.py:25-34
    // (deliberately fractional hour/day_of_week — SURVEY.md §2.7 semantics note)
    QuerySpec("time_features",
      (s, d) => Features.timeFeatures(events(s, d), "ts")
        .select("event_id", "epoch_s", "hour", "day_of_week", "day_of_month",
          "is_weekend")
        .orderBy("event_id"),
      Some(s"""WITH e AS (SELECT event_id, $EpochS AS epoch_s FROM events)
             |SELECT event_id, epoch_s,
             |       (epoch_s % 86400) / 3600        AS hour,
             |       (epoch_s / 86400) % 7           AS day_of_week,
             |       (epoch_s / 86400) % 31 + 1      AS day_of_month,
             |       CASE WHEN (epoch_s / 86400) % 7 IN (5, 6)
             |            THEN 1 ELSE 0 END          AS is_weekend
             |FROM e ORDER BY event_id""".stripMargin)),

    // ── zero-guarded ratios — reference: src/feature_engineering.py:60-74
    QuerySpec("ratio_features",
      (s, d) => Features.ratioFeatures(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey", "l_extendedprice", "l_discount", "l_quantity", "l_tax"),
          Seq("l_extendedprice", "l_discount"), Seq("l_quantity", "l_tax"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l_extendedprice, l_discount,
             |       l_quantity, l_tax,
             |       CASE WHEN l_quantity <> 0 THEN l_extendedprice / l_quantity
             |            ELSE 0 END AS l_extendedprice_to_l_quantity_ratio,
             |       CASE WHEN l_tax <> 0 THEN l_extendedprice / l_tax
             |            ELSE 0 END AS l_extendedprice_to_l_tax_ratio,
             |       CASE WHEN l_quantity <> 0 THEN l_discount / l_quantity
             |            ELSE 0 END AS l_discount_to_l_quantity_ratio,
             |       CASE WHEN l_tax <> 0 THEN l_discount / l_tax
             |            ELSE 0 END AS l_discount_to_l_tax_ratio
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── pairwise interactions — reference: src/feature_engineering.py:76-85
    QuerySpec("interaction_features",
      (s, d) => Features.interactionFeatures(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l_quantity, l_extendedprice, l_discount,
             |       l_quantity * l_extendedprice  AS l_quantity_x_l_extendedprice,
             |       l_quantity * l_discount       AS l_quantity_x_l_discount,
             |       l_extendedprice * l_discount  AS l_extendedprice_x_l_discount
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── z-score outlier flags (broadcast global-agg form of the
    // reference's two-pass) — reference: src/feature_engineering.py:156-176
    QuerySpec("outlier_flags",
      (s, d) => Features.outlierFlags(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey", "l_quantity", "l_extendedprice"),
          Seq("l_quantity", "l_extendedprice"), threshold = 3.0)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l_quantity, l_extendedprice,
             |       CASE WHEN stddev(l_quantity) OVER () <> 0
             |            THEN (abs(l_quantity - avg(l_quantity) OVER ())
             |                  / stddev(l_quantity) OVER () > 3.0)::INT
             |            ELSE 0 END AS l_quantity_is_outlier,
             |       CASE WHEN stddev(l_extendedprice) OVER () <> 0
             |            THEN (abs(l_extendedprice - avg(l_extendedprice) OVER ())
             |                  / stddev(l_extendedprice) OVER () > 3.0)::INT
             |            ELSE 0 END AS l_extendedprice_is_outlier
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── lag features — reference: src/feature_engineering.py:178-196
    // (windows ordered by event_id: unique + arrival-ordered, so the plan is
    // deterministic on both engines regardless of the ts µs/ns mismatch)
    QuerySpec("lag_features",
      (s, d) => Features.lagFeatures(
          events(s, d).select("event_id", "user_id", "value"),
          Seq("user_id"), "event_id", Seq("value"), Seq(1, 7, 30))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id, value,
             |       lag(value, 1)  OVER w AS value_lag_1,
             |       lag(value, 7)  OVER w AS value_lag_7,
             |       lag(value, 30) OVER w AS value_lag_30
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |ORDER BY event_id""".stripMargin)),

    // ── rolling mean/sum over ROWS [-w, 0] — reference: src/feature_engineering.py:198-222
    // `value` is 2-decimal fixed-point, so the rolling stats are computed in
    // exact integer cents and divided once at the end: both engines then
    // divide the *same* integers, making the doubles bit-identical (a float
    // rolling mean of 2-decimal data lands exactly on rounding boundaries,
    // e.g. sum/8 = 61.16875, where last-ulp summation-order differences flip
    // round()). The general float form lives in Features.rollingFeatures
    // (ScalaTest-covered).
    QuerySpec("rolling_features",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
        def f(n: Int) = w.rowsBetween(-n, 0)
        val vc = round(col("value") * 100).cast("long")
        events(s, d).select(col("event_id"), col("user_id"), col("value"),
            vc.as("vc"))
          .select(col("event_id"), col("user_id"), col("value"),
            (sum("vc").over(f(7)) / (count("vc").over(f(7)) * 100))
              .as("value_rolling_mean_7"),
            (sum("vc").over(f(7)) / 100.0).as("value_rolling_sum_7"),
            (sum("vc").over(f(30)) / (count("vc").over(f(30)) * 100))
              .as("value_rolling_mean_30"),
            (sum("vc").over(f(30)) / 100.0).as("value_rolling_sum_30"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id, user_id, value,
             |         CAST(round(value * 100) AS BIGINT) AS vc FROM events)
             |SELECT event_id, user_id, value,
             |  sum(vc) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
             |    / (count(vc) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) * 100)
             |    AS value_rolling_mean_7,
             |  sum(vc) OVER (w ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) / 100.0
             |    AS value_rolling_sum_7,
             |  sum(vc) OVER (w ROWS BETWEEN 30 PRECEDING AND CURRENT ROW)
             |    / (count(vc) OVER (w ROWS BETWEEN 30 PRECEDING AND CURRENT ROW) * 100)
             |    AS value_rolling_mean_30,
             |  sum(vc) OVER (w ROWS BETWEEN 30 PRECEDING AND CURRENT ROW) / 100.0
             |    AS value_rolling_sum_30
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |ORDER BY event_id""".stripMargin)),

    // ── target encoding (in-sample, leakage-faithful) —
    // reference: src/feature_engineering.py:236-249
    QuerySpec("target_encoding",
      (s, d) => Features.targetEncoding(
          orders(s, d).select("o_orderkey", "o_orderpriority", "o_totalprice"),
          Seq("o_orderpriority"), "o_totalprice", roundTo = 4)
        .select("o_orderkey", "o_orderpriority", "o_orderpriority_target_mean")
        .orderBy("o_orderkey"),
      Some("""SELECT o.o_orderkey, o.o_orderpriority,
             |       t.o_orderpriority_target_mean
             |FROM orders o
             |JOIN (SELECT o_orderpriority,
             |             round(avg(o_totalprice), 4) AS o_orderpriority_target_mean
             |      FROM orders GROUP BY 1) t USING (o_orderpriority)
             |ORDER BY o_orderkey""".stripMargin)),

    // ── mean imputation, window form — reference: src/feature_engineering.py:140-149
    // (testdata has no nulls, so nulls are synthesized deterministically on
    // event_id % 10 to actually exercise the imputation on both engines)
    QuerySpec("mean_impute",
      (s, d) => {
        val e = events(s, d).select(col("event_id"),
          when(col("event_id") % 10 === 0, lit(null)).otherwise(col("value"))
            .as("value_n"))
        Features.meanImpute(e, Seq("value_n"), roundTo = 4).orderBy("event_id")
      },
      Some("""WITH e AS (
             |  SELECT event_id,
             |         CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value_n
             |  FROM events)
             |SELECT event_id, value_n,
             |       coalesce(value_n, round(avg(value_n) OVER (), 4)) AS value_n_imputed
             |FROM e ORDER BY event_id""".stripMargin)),

    // ── multi-table join chain region→nation→customer→orders→lineitem
    // (TPC-H Q5-shaped; dims broadcast) — SURVEY.md §2.3
    QuerySpec("multi_join_revenue",
      (s, d) => {
        val rev = lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
                 .as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
        rev
      },
      Some("""SELECT r_name, n_name,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name
             |ORDER BY r_name, n_name""".stripMargin)),

    // ── global top-k (TakeOrderedAndProject: no full sort at scale) — SURVEY.md §2.6
    QuerySpec("top_k_orders",
      (s, d) => orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ── distinct — SURVEY.md §2.6 extension
    QuerySpec("distinct_pairs",
      (s, d) => lineitem(s, d).select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── anti join (customers with no orders) — SURVEY.md §2.6 extension
    // The right side is date-restricted so the anti-join is NON-vacuous
    // (VERDICT r10): unrestricted, every sf0.01 customer has ≥1 order
    // and both engines return 0 rows — green but proving nothing.
    // "Customers with no order before 1996" (testdata orders span
    // 1995-01..2001-08) yields 326 of 1500 rows at sf0.01 — non-empty
    // and non-full at every sf — and the filter pushes to the scan.
    QuerySpec("anti_join",
      (s, d) => customer(s, d)
        .join(orders(s, d)
            .filter(col("o_orderdate") < to_timestamp(lit("1996-01-01 00:00:00"))),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
             |ORDER BY c_custkey""".stripMargin)),

    // ── semi join (customers with at least one order)
    QuerySpec("semi_join",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ── JSON extraction from events.props — SURVEY.md §2.7 extension
    QuerySpec("json_extract",
      (s, d) => events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(props->>'k' AS BIGINT) AS prop_k
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── event-time tumbling window as batch SQL — SURVEY.md §2.8
    // (bucket emitted as integer epoch seconds: exact on both engines)
    QuerySpec("tumbling_window",
      (s, d) => {
        val epochS = col("ts").cast("long")
        events(s, d)
          .select((epochS - epochS % 3600).as("hour_bucket"),
            col("event_type"), col("value"))
          .groupBy("hour_bucket", "event_type")
          .agg(count(lit(1)).as("n_events"),
               round(sum(col("value")), 4).as("sum_value"))
          .orderBy("hour_bucket", "event_type")
      },
      Some(s"""WITH e AS (
             |  SELECT $EpochS AS epoch_s, event_type, value FROM events)
             |SELECT epoch_s - epoch_s % 3600 AS hour_bucket, event_type,
             |       count(*) AS n_events, round(sum(value), 4) AS sum_value
             |FROM e GROUP BY 1, 2 ORDER BY hour_bucket, event_type""".stripMargin)),

    // ── sessionization: 30-min-gap sessions via lag + running sum — SURVEY.md §2.8
    QuerySpec("sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("epoch_s", "event_id")
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("epoch_s"))
          .withColumn("new_s",
            when(col("epoch_s") - lag("epoch_s", 1).over(w) > 1800, 1)
              .otherwise(0))
          .withColumn("session_id", sum("new_s").over(cum))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
               min("epoch_s").as("session_start"),
               max("epoch_s").as("session_end"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""WITH e AS (
             |  SELECT event_id, user_id, $EpochS AS epoch_s FROM events),
             |g AS (
             |  SELECT *, CASE WHEN epoch_s - lag(epoch_s) OVER
             |    (PARTITION BY user_id ORDER BY epoch_s, event_id) > 1800
             |    THEN 1 ELSE 0 END AS new_s FROM e),
             |sess AS (
             |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
             |    ORDER BY epoch_s, event_id ROWS UNBOUNDED PRECEDING)
             |    AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |       min(epoch_s) AS session_start, max(epoch_s) AS session_end
             |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),

    // ── exact decile binning (the oracle-checkable stand-in for
    // QuantileDiscretizer — value-based bins, like the real thing) —
    // SURVEY.md §2.9. Scale shape: the 9 exact cutpoints come from ONE
    // 1-row `percentile` aggregate that is broadcast back; bin assignment
    // is a per-row comparison chain. No global window — the previous
    // ntile(10) OVER (ORDER BY …) funneled the whole fact table through a
    // single-partition sort, which dies at 100×. Spark `percentile` and
    // DuckDB `quantile_cont` share the p·(n−1) linear interpolation, so
    // the cutpoint doubles are bit-identical (same convention as the
    // `percentiles` query).
    QuerySpec("ntile_binning",
      (s, d) => {
        val df = lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_extendedprice")
        val cutCols = (1 to 9).map(i =>
          percentile(col("l_extendedprice"), lit(i / 10.0)).as(s"__c$i"))
        val cuts = df.agg(cutCols.head, cutCols.tail: _*)
        val bin = (1 to 9).map(i =>
          (col("l_extendedprice") > col(s"__c$i")).cast("int"))
          .reduce(_ + _) + 1
        df.crossJoin(broadcast(cuts))
          .withColumn("bin", bin)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_extendedprice", "bin")
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""WITH c AS (
             |  SELECT quantile_cont(l_extendedprice, 0.1) AS c1,
             |         quantile_cont(l_extendedprice, 0.2) AS c2,
             |         quantile_cont(l_extendedprice, 0.3) AS c3,
             |         quantile_cont(l_extendedprice, 0.4) AS c4,
             |         quantile_cont(l_extendedprice, 0.5) AS c5,
             |         quantile_cont(l_extendedprice, 0.6) AS c6,
             |         quantile_cont(l_extendedprice, 0.7) AS c7,
             |         quantile_cont(l_extendedprice, 0.8) AS c8,
             |         quantile_cont(l_extendedprice, 0.9) AS c9
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l_extendedprice,
             |       (1 + (l_extendedprice > c1)::INT + (l_extendedprice > c2)::INT
             |          + (l_extendedprice > c3)::INT + (l_extendedprice > c4)::INT
             |          + (l_extendedprice > c5)::INT + (l_extendedprice > c6)::INT
             |          + (l_extendedprice > c7)::INT + (l_extendedprice > c8)::INT
             |          + (l_extendedprice > c9)::INT)::INT AS bin
             |FROM lineitem CROSS JOIN c
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── union — SURVEY.md §2.6 extension
    QuerySpec("union_keys",
      (s, d) => customer(s, d).select(lit("cust").as("kind"),
          col("c_custkey").as("key"))
        .unionByName(supplier(s, d).select(lit("supp").as("kind"),
          col("s_suppkey").as("key")))
        .orderBy("kind", "key"),
      Some("""SELECT 'cust' AS kind, c_custkey AS key FROM customer
             |UNION ALL
             |SELECT 'supp' AS kind, s_suppkey AS key FROM supplier
             |ORDER BY kind, key""".stripMargin)),

    // ── distinct counts: exact countDistinct (oracle) — SURVEY.md §2.4
    // extension; the approx HLL++ twin is approx_distinct below (rows-only:
    // HLL sketches aren't cross-engine comparable)
    QuerySpec("distinct_counts",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
             countDistinct("l_suppkey").as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       count(DISTINCT l_partkey) AS n_parts,
             |       count(DISTINCT l_suppkey) AS n_supps,
             |       count(*) AS n_rows
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    QuerySpec("approx_distinct",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey").as("approx_parts"))
        .orderBy("l_returnflag"),
      None),

    // ── rollup with grouping_id (subtotal levels sorted by gid so NULL
    // subtotal keys never hit engine NULLS-ordering differences) —
    // SURVEY.md §2.4 extension
    QuerySpec("rollup_revenue",
      (s, d) => lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("n_name", "l_extendedprice", "l_discount")
        // alias-qualify the grouping column: Expand duplicates grouping
        // attributes, which otherwise trips Spark's ambiguous-self-join
        // check on any joined input (Spark 4.1 quirk)
        .as("t")
        .rollup(col("t.n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
               .as("revenue"),
             count(lit(1)).as("n_items"),
             grouping_id().cast("int").as("gid"))
        .orderBy("gid", "n_name"),
      Some("""SELECT n_name,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |       count(*) AS n_items,
             |       GROUPING(n_name)::INT AS gid
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP (n_name)
             |ORDER BY gid, n_name""".stripMargin)),

    // ── as-of join: each event backfilled with the user's most recent
    // prior order (point-in-time feature join; graft.operators.AsOfJoin,
    // oracle = DuckDB's native ASOF LEFT JOIN). Time keys are made unique
    // as epoch_s*slot + orderkey, where slot = the smallest power of 10
    // strictly above max(o_orderkey) — DERIVED from the data (ADVICE r9:
    // a fixed base silently breaks once orderkeys outgrow it; the 1e6
    // base this query first shipped with already fails at TPC-H sf≳0.15).
    // The slot is a 1-row broadcast scalar (never a driver collect), the
    // string-length form is integer-exact, and the oracle derives the
    // identical value — so "most recent" stays deterministic even with
    // several same-day orders per customer, at any SF whose
    // epoch_s·slot product fits a long (guard below). ────────────────────
    QuerySpec("asof_join",
      (s, d) => {
        val slot = orders(s, d).agg(
          pow(lit(10.0), length(max(col("o_orderkey")).cast("string")))
            .cast("long").as("__slot"))
        val ev = events(s, d).crossJoin(broadcast(slot))
          .select(col("event_id"), col("user_id"),
            slotKey(col("ts").cast("long"), col("__slot"),
              col("__slot") - 1L).as("e_k"))
        val ord = orders(s, d).crossJoin(broadcast(slot))
          .select(col("o_custkey"),
          // o_orderdate is TIMESTAMP_NTZ: cast via TIMESTAMP (session tz
          // is pinned UTC) to get epoch seconds
          slotKey(col("o_orderdate").cast("timestamp").cast("long"),
            col("__slot"), col("o_orderkey")).as("o_k"),
          col("o_orderkey"), col("o_totalprice"))
        graft.operators.AsOfJoin.asOf(ev, ord, "user_id", "o_custkey",
            "e_k", "o_k", Seq("o_orderkey", "o_totalprice"))
          .select("event_id", "user_id", "o_orderkey", "o_totalprice")
          .orderBy("event_id")
      },
      Some(s"""WITH sl AS (
             |  SELECT power(10, length(CAST(max(o_orderkey) AS VARCHAR)))::BIGINT
             |           AS s FROM orders),
             |e AS (
             |  SELECT event_id, user_id,
             |         ($EpochS) * sl.s + (sl.s - 1) AS e_k
             |  FROM events, sl),
             |o AS (
             |  SELECT o_custkey,
             |         epoch_us(o_orderdate)//1000000 * sl.s + o_orderkey AS o_k,
             |         o_orderkey, o_totalprice
             |  FROM orders, sl)
             |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
             |FROM e ASOF LEFT JOIN o
             |  ON e.user_id = o.o_custkey AND e.e_k >= o.o_k
             |ORDER BY e.event_id""".stripMargin)),

    // ── point-in-time interval lookup (graft.operators.PitJoin): each
    // lineitem reads the priority interval LIVE AT ITS SHIP DATE from
    // the per-customer order history — ship dates lag order dates, so
    // the containing interval is routinely a LATER order than the
    // line's own. Oracle = the plain interval-containment LEFT JOIN ────
    QuerySpec("pit_join",
      (s, d) => {
        // slot = smallest power of 10 strictly above max(o_orderkey),
        // derived from the data as a 1-row broadcast scalar (ADVICE r9:
        // the fixed 1e7 base only holds for TPC-H sf ≲ 1.5 — beyond it
        // same-ship-date orders sort past the fact sentinel and are
        // silently missed, and a fixed-base oracle mirrors the miss).
        // The oracle computes the identical integer-exact slot.
        val slot = orders(s, d).agg(
          pow(lit(10.0), length(max(col("o_orderkey")).cast("string")))
            .cast("long").as("__slot"))
        val ord = orders(s, d).crossJoin(broadcast(slot))
          .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderpriority"),
          slotKey(col("o_orderdate").cast("timestamp").cast("long"),
            col("__slot"), col("o_orderkey")).as("__from"))
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("__from"))
        val dim = ord.select(col("o_custkey").as("__dk"),
          col("__from"), lead(col("__from"), 1).over(w).as("__to"),
          col("o_orderpriority").as("ship_time_priority"),
          col("o_orderkey").as("src_order"))
        val fact = lineitem(s, d).crossJoin(broadcast(slot))
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            slotKey(col("l_shipdate").cast("timestamp").cast("long"),
              col("__slot"), col("__slot") - 1L).as("__ts"))
          .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .drop("o_orderkey")
        graft.operators.PitJoin.lookup(fact, dim, "o_custkey", "__dk",
            "__ts", "__from", "__to",
            Seq("ship_time_priority", "src_order"))
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "ship_time_priority", "src_order")
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""WITH sl AS (
             |  SELECT power(10, length(CAST(max(o_orderkey) AS VARCHAR)))::BIGINT
             |           AS s FROM orders),
             |d AS (
             |  SELECT o_custkey AS k,
             |         epoch_us(o_orderdate)//1000000 * sl.s
             |           + o_orderkey AS f,
             |         lead(epoch_us(o_orderdate)//1000000 * sl.s
             |              + o_orderkey) OVER (
             |           PARTITION BY o_custkey
             |           ORDER BY epoch_us(o_orderdate)//1000000 * sl.s
             |              + o_orderkey) AS t,
             |         o_orderpriority AS prio, o_orderkey AS src_order
             |  FROM orders, sl),
             |f AS (
             |  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
             |         l.l_suppkey, o.o_custkey AS k,
             |         epoch_us(l_shipdate)//1000000 * sl.s
             |           + (sl.s - 1) AS ts
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey,
             |       sl)
             |SELECT f.l_orderkey, f.l_linenumber, f.l_partkey,
             |       f.l_suppkey, d.prio AS ship_time_priority,
             |       d.src_order
             |FROM f LEFT JOIN d ON d.k = f.k AND d.f <= f.ts
             |                   AND (d.t IS NULL OR f.ts < d.t)
             |ORDER BY f.l_orderkey, f.l_linenumber, f.l_partkey,
             |         f.l_suppkey""".stripMargin)),

    // ── banded range join: pairs of a user's events within 10 minutes
    // (graft.operators.RangeJoin — tolerance-band equi-join, not a
    // cartesian; oracle = the plain inequality join DuckDB can afford
    // at this scale) ─────────────────────────────────────────────────────
    QuerySpec("range_join",
      (s, d) => {
        val base = events(s, d).select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("e_s"))
        val a = base.select(col("event_id").as("id_a"),
          col("user_id"), col("e_s").as("t_a"))
        val b = base.select(col("event_id").as("id_b"),
          col("user_id").as("user_b"), col("e_s").as("t_b"))
        graft.operators.RangeJoin.bandedWithin(a, b, "user_id", "user_b",
            "t_a", "t_b", tolerance = 600L)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("user_id"),
            (col("t_b") - col("t_a")).as("dt_s"))
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH e AS (
             |  SELECT event_id, user_id, $EpochS AS e_s FROM events)
             |SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
             |       b.e_s - a.e_s AS dt_s
             |FROM e a JOIN e b ON a.user_id = b.user_id
             |                  AND abs(a.e_s - b.e_s) <= 600
             |                  AND a.event_id < b.event_id
             |ORDER BY id_a, id_b""".stripMargin)),

    // ── CUBE over two grouping columns (all four grouping sets) ──────────
    QuerySpec("cube_flags",
      (s, d) => lineitem(s, d)
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .as("t")
        .cube(col("t.l_returnflag"), col("t.l_linestatus"))
        .agg(sum("l_quantity").as("sum_qty"), // integral-valued: exact
             count(lit(1)).as("n_rows"),
             grouping_id().cast("int").as("gid"))
        .orderBy("gid", "l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       count(*) AS n_rows,
             |       (GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus))::INT
             |         AS gid
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    // ── explicit GROUPING SETS (the general form beside rollup/cube):
    // per-flag, per-(flag,status), and grand-total sets in one pass ──────
    QuerySpec("grouping_sets",
      (s, d) => {
        lineitem(s, d).select("l_returnflag", "l_linestatus", "l_quantity")
          .createOrReplaceTempView("v_li_gs")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |       sum(l_quantity) AS sum_qty, count(*) AS n_rows,
                |       CAST(grouping_id() AS INT) AS gid
                |FROM v_li_gs
                |GROUP BY GROUPING SETS ((l_returnflag),
                |                        (l_returnflag, l_linestatus), ())
                |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       count(*) AS n_rows,
             |       (GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus))::INT
             |         AS gid
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag),
             |                        (l_returnflag, l_linestatus), ())
             |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)),

    // ── string function family over part names — SURVEY.md §2.7 extension
    QuerySpec("string_funcs",
      (s, d) => part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          lower(col("p_brand")).as("brand_lower"),
          substring(col("p_name"), 1, 5).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          trim(col("p_name")).as("name_trim"),
          split(col("p_type"), " ").getItem(0).as("type_first"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       upper(p_name) AS name_upper,
             |       lower(p_brand) AS brand_lower,
             |       substring(p_name, 1, 5) AS name_prefix,
             |       length(p_name)::INT AS name_len,
             |       p_brand || '|' || p_type AS brand_type,
             |       trim(p_name) AS name_trim,
             |       string_split(p_type, ' ')[1] AS type_first
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ── pivot: events long → wide per-user per-type value sums ───────────
    QuerySpec("pivot_events",
      (s, d) => {
        val vc = (round(col("value") * 100)).cast("long") // exact cents
        events(s, d).select(col("user_id"), col("event_type"), vc.as("vc"))
          .groupBy("user_id")
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(coalesce(sum("vc"), lit(0L)))
          .withColumnsRenamed(Map(
            "click" -> "click_cents", "error" -> "error_cents",
            "purchase" -> "purchase_cents", "signup" -> "signup_cents",
            "view" -> "view_cents"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  coalesce(sum(CAST(round(value*100) AS BIGINT))
             |    FILTER (WHERE event_type = 'click'), 0)::BIGINT AS click_cents,
             |  coalesce(sum(CAST(round(value*100) AS BIGINT))
             |    FILTER (WHERE event_type = 'error'), 0)::BIGINT AS error_cents,
             |  coalesce(sum(CAST(round(value*100) AS BIGINT))
             |    FILTER (WHERE event_type = 'purchase'), 0)::BIGINT AS purchase_cents,
             |  coalesce(sum(CAST(round(value*100) AS BIGINT))
             |    FILTER (WHERE event_type = 'signup'), 0)::BIGINT AS signup_cents,
             |  coalesce(sum(CAST(round(value*100) AS BIGINT))
             |    FILTER (WHERE event_type = 'view'), 0)::BIGINT AS view_cents
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── unpivot/melt: lineitem wide → long ───────────────────────────────
    QuerySpec("unpivot_lineitem",
      (s, d) => lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey")),
          Array(col("l_quantity"), col("l_discount")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "measure"),
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       measure, val
             |FROM (
             |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |         'l_quantity' AS measure, l_quantity AS val FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |         'l_discount', l_discount FROM lineitem)
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |         measure""".stripMargin)),

    // ── array function family over document tokens — SURVEY.md §2.7
    // (array_distinct order differs across engines → always sorted first;
    // the array column is emitted array_join'd to a canonical string —
    // the driver's pandas comparator can't sort/factorize ndarray cells)
    QuerySpec("array_funcs",
      (s, d) => {
        val toks = split(lower(col("text")), " ")
        documents(s, d).filter(col("doc_id") < 100)
          .select(col("doc_id"),
            size(toks).as("n_tokens"),
            size(array_distinct(toks)).as("n_distinct"),
            array_join(slice(sort_array(array_distinct(toks)), 1, 3), ",")
              .as("first3"),
            array_contains(toks, "the").cast("int").as("has_the"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS toks
             |  FROM documents WHERE doc_id < 100)
             |SELECT doc_id,
             |       len(toks)::INT AS n_tokens,
             |       len(list_distinct(toks))::INT AS n_distinct,
             |       array_to_string(list_sort(list_distinct(toks))[1:3], ',')
             |         AS first3,
             |       list_contains(toks, 'the')::INT AS has_the
             |FROM t ORDER BY doc_id""".stripMargin)),

    // ── sliding event-time windows (1h window, 30min slide → each event
    // in exactly 2 windows), emitted as integer epoch starts ─────────────
    QuerySpec("sliding_window",
      (s, d) => {
        val epochS = col("ts").cast("long")
        events(s, d)
          .select(epochS.as("e_s"), col("event_type"), col("value"))
          .groupBy(window(timestamp_seconds(col("e_s")), "1 hour",
            "30 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
               round(sum(col("value")), 4).as("sum_value"))
          .select(col("window.start").cast("long").as("win_start"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("win_start", "event_type")
      },
      Some(s"""WITH e AS (
             |  SELECT $EpochS AS e_s, event_type, value FROM events),
             |w AS (
             |  SELECT (e_s // 1800) * 1800 - 1800 * g.range AS win_start,
             |         event_type, value
             |  FROM e, range(0, 2) g)
             |SELECT win_start, event_type, count(*) AS n_events,
             |       round(sum(value), 4) AS sum_value
             |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // ── intersect / except set ops — SURVEY.md §2.6 ──────────────────────
    QuerySpec("intersect_except",
      (s, d) => {
        val custKeys = customer(s, d).select(col("c_custkey").as("key"))
        val eventUsers = events(s, d).select(col("user_id").as("key"))
        custKeys.intersect(eventUsers)
          .select(lit("both").as("kind"), col("key"))
          .unionByName(custKeys.except(eventUsers)
            .select(lit("cust_only").as("kind"), col("key")))
          .orderBy("kind", "key")
      },
      Some("""SELECT 'both' AS kind, key FROM (
             |  SELECT c_custkey AS key FROM customer
             |  INTERSECT
             |  SELECT user_id FROM events)
             |UNION ALL
             |SELECT 'cust_only', key FROM (
             |  SELECT c_custkey AS key FROM customer
             |  EXCEPT
             |  SELECT user_id FROM events)
             |ORDER BY kind, key""".stripMargin)),

    // ── null semantics through an outer join: most customers have no
    // events, so the right side is NULL-heavy — exercises null-skipping
    // aggregation, coalesce, and null flags ──────────────────────────────
    QuerySpec("null_semantics",
      (s, d) => {
        val vc = (round(col("value") * 100)).cast("long")
        val ev = events(s, d).select(col("user_id"), vc.as("vc"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_ev"), sum("vc").as("sum_cents"))
        customer(s, d).select("c_custkey")
          .join(ev, col("c_custkey") === col("user_id"), "left")
          .select(col("c_custkey"),
            col("n_ev").isNull.cast("int").as("no_events"),
            coalesce(col("n_ev"), lit(0L)).as("n_ev"),
            coalesce(col("sum_cents"), lit(-1L)).as("sum_cents"))
          .orderBy("c_custkey")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, count(*) AS n_ev,
             |         sum(CAST(round(value*100) AS BIGINT))::BIGINT AS sum_cents
             |  FROM events GROUP BY 1)
             |SELECT c_custkey,
             |       (ev.n_ev IS NULL)::INT AS no_events,
             |       coalesce(ev.n_ev, 0) AS n_ev,
             |       coalesce(ev.sum_cents, -1) AS sum_cents
             |FROM customer LEFT JOIN ev ON c_custkey = ev.user_id
             |ORDER BY c_custkey""".stripMargin)),

    // ── regex function family (simple character-class patterns behave
    // identically under Java regex and DuckDB's RE2) ─────────────────────
    QuerySpec("regex_funcs",
      (s, d) => part(s, d)
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
          col("p_name").rlike("ST").cast("int").as("has_st"),
          regexp_replace(col("p_brand"), "[0-9]", "#").as("brand_masked"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
             |       regexp_matches(p_name, 'ST')::INT AS has_st,
             |       regexp_replace(p_brand, '[0-9]', '#', 'g') AS brand_masked
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ── struct construction (named_struct ↔ struct_pack), emitted as
    // canonical JSON: the driver's pandas comparator can't hash dict
    // cells, and both engines serialize {'u':…,'k':…} identically when
    // nulls are kept (Spark needs ignoreNullFields=false for that)
    QuerySpec("struct_funcs",
      (s, d) => events(s, d)
        .select(col("event_id"),
          to_json(
            struct(col("user_id").as("u"),
              get_json_object(col("props"), "$.k").cast("long").as("k")),
            Map("ignoreNullFields" -> "false")).as("meta"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |       to_json({'u': user_id, 'k': CAST(props->>'k' AS BIGINT)})
             |         ::VARCHAR AS meta
             |FROM events ORDER BY event_id""".stripMargin)),

    // ── exact interpolated percentiles (Spark `percentile` and DuckDB
    // quantile_cont share the p*(n-1) linear-interpolation definition;
    // identical sorted operands → identical doubles) ─────────────────────
    QuerySpec("percentiles",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
             expr("percentile(l_extendedprice, 0.9)").as("p90"),
             expr("percentile(l_quantity, 0.25)").as("q25"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       quantile_cont(l_extendedprice, 0.5) AS p50,
             |       quantile_cont(l_extendedprice, 0.9) AS p90,
             |       quantile_cont(l_quantity, 0.25) AS q25
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ── correlation / covariance / variance (order-sensitive float
    // aggregates → rounded) ──────────────────────────────────────────────
    QuerySpec("corr_stats",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(corr("l_quantity", "l_extendedprice"), 6).as("qp_corr"),
             round(covar_samp("l_quantity", "l_extendedprice"), 4)
               .as("qp_covar"),
             round(var_samp("l_quantity"), 6).as("q_var"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       round(corr(l_quantity, l_extendedprice), 6) AS qp_corr,
             |       round(covar_samp(l_quantity, l_extendedprice), 4) AS qp_covar,
             |       round(var_samp(l_quantity), 6) AS q_var
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ── argmax/argmin aggregates; the ordering value is made unique
    // (price*1e7 + partkey, exact in double) so ties can't diverge ───────
    QuerySpec("argmax_minby",
      (s, d) => lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(max_by(col("l_partkey"),
               col("l_extendedprice") * 10000000 + col("l_partkey"))
               .as("max_price_part"),
             min_by(col("l_partkey"),
               col("l_extendedprice") * 10000000 + col("l_partkey"))
               .as("min_price_part"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       max_by(l_partkey, l_extendedprice * 10000000 + l_partkey)
             |         AS max_price_part,
             |       min_by(l_partkey, l_extendedprice * 10000000 + l_partkey)
             |         AS min_price_part
             |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ── RANGE-frame window: trailing 1-hour per-user sums keyed on the
    // time VALUE (peers included), vs the ROWS frames used elsewhere ─────
    QuerySpec("range_window",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("epoch_s")
          .rangeBetween(-3600, 0)
        events(s, d)
          .select(col("event_id"), col("user_id"),
            col("ts").cast("long").as("epoch_s"),
            (round(col("value") * 100)).cast("long").as("vc"))
          .select(col("event_id"), col("user_id"), col("epoch_s"),
            (sum("vc").over(w) / 100.0).as("trailing_hour_value"),
            count(lit(1)).over(w).cast("long").as("trailing_hour_events"))
          .orderBy("event_id")
      },
      Some(s"""WITH e AS (
             |  SELECT event_id, user_id, $EpochS AS epoch_s,
             |         CAST(round(value * 100) AS BIGINT) AS vc FROM events)
             |SELECT event_id, user_id, epoch_s,
             |       sum(vc) OVER w / 100.0 AS trailing_hour_value,
             |       count(*) OVER w AS trailing_hour_events
             |FROM e
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin)),

    // ── window navigation: first/last/nth/lead/percent_rank over a
    // unique total order per customer ────────────────────────────────────
    QuerySpec("window_navigation",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        val full = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice")
          .select(col("o_custkey"), col("o_orderkey"),
            first("o_orderkey").over(full).as("best_order"),
            last("o_orderkey").over(full).as("worst_order"),
            nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
            lead("o_orderkey", 1).over(w).as("next_order"),
            round(percent_rank().over(w), 6).as("pr"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |       first_value(o_orderkey) OVER wf AS best_order,
             |       last_value(o_orderkey) OVER wf AS worst_order,
             |       nth_value(o_orderkey, 2) OVER wf AS second_order,
             |       lead(o_orderkey, 1) OVER w AS next_order,
             |       round(percent_rank() OVER w, 6) AS pr
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_totalprice DESC, o_orderkey),
             |       wf AS (PARTITION BY o_custkey
             |              ORDER BY o_totalprice DESC, o_orderkey
             |              ROWS BETWEEN UNBOUNDED PRECEDING
             |              AND UNBOUNDED FOLLOWING)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ── date function family (string-formatted outputs to dodge any
    // date-type serialization differences) ───────────────────────────────
    QuerySpec("date_funcs",
      (s, d) => orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).as("days_since"),
          date_format(date_add(col("o_orderdate").cast("date"), 7),
            "yyyy-MM-dd").as("next_week"),
          quarter(col("o_orderdate")).as("q"),
          weekofyear(col("o_orderdate")).as("iso_week"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |       strftime(o_orderdate, '%Y-%m-%d') AS d_str,
             |       date_diff('day', DATE '1995-01-01',
             |                 o_orderdate::DATE)::INT AS days_since,
             |       strftime(o_orderdate::DATE + INTERVAL 7 DAY,
             |                '%Y-%m-%d') AS next_week,
             |       quarter(o_orderdate)::INT AS q,
             |       weekofyear(o_orderdate)::INT AS iso_week
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ── salted skew join under the oracle: result-identity with the
    // plain equi-join IS the operator's contract (graft.engine.Scale) ────
    QuerySpec("salted_join",
      (s, d) => {
        val li = lineitem(s, d).select("l_orderkey", "l_extendedprice",
          "l_discount")
        val o = orders(s, d).select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority"))
        Scale.saltedJoin(li, o, "l_orderkey", saltFactor = 4)
          .groupBy("o_orderpriority")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
                 .as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
             |       count(*) AS n_items
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // ── co-located bucketed join: both sides pre-bucketed on the join
    // key (Scale.ensureBucketed, idempotent per session), so the
    // sort-merge join plans with ZERO exchange under it — the "pay the
    // shuffle once at ingest" layout that makes repeated fact-dim joins
    // shuffle-free at warehouse scale. hint("merge") pins SMJ so the
    // exchange-free plan is what actually runs (a broadcast would hide
    // the layout win at toy scale); PlanSpec asserts the plan shape ─────
    QuerySpec("bucketed_join",
      (s, d) => {
        val o = Scale.ensureBucketed(s,
          orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
          "orders", d, "o_custkey", 8)
        val c = Scale.ensureBucketed(s,
          customer(s, d).select("c_custkey", "c_mktsegment"),
          "customer", d, "c_custkey", 8)
        o.hint("merge").join(c, col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("total_price"))
          .orderBy("c_mktsegment")
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)),

    // ── data profiling: per-column null/distinct/min/max report ──────────
    QuerySpec("table_profile",
      (s, d) => {
        val o = orders(s, d)
        def prof(c: String, minMax: Boolean) = o.agg(
          lit(c).as("col_name"),
          count(lit(1)).as("n_rows"),
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("n_distinct"),
          (if (minMax) round(min(col(c)), 2) else lit(null).cast("double"))
            .as("min_num"),
          (if (minMax) round(max(col(c)), 2) else lit(null).cast("double"))
            .as("max_num"))
        prof("o_totalprice", minMax = true)
          .unionByName(prof("o_orderpriority", minMax = false))
          .unionByName(prof("o_custkey", minMax = true))
          .orderBy("col_name")
      },
      Some("""SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
             |       count(o_custkey) AS n_nonnull,
             |       count(DISTINCT o_custkey) AS n_distinct,
             |       round(min(o_custkey), 2)::DOUBLE AS min_num,
             |       round(max(o_custkey), 2)::DOUBLE AS max_num
             |FROM orders
             |UNION ALL
             |SELECT 'o_orderpriority', count(*), count(o_orderpriority),
             |       count(DISTINCT o_orderpriority), NULL, NULL
             |FROM orders
             |UNION ALL
             |SELECT 'o_totalprice', count(*), count(o_totalprice),
             |       count(DISTINCT o_totalprice),
             |       round(min(o_totalprice), 2), round(max(o_totalprice), 2)
             |FROM orders
             |ORDER BY col_name""".stripMargin)),

    // ── ranking window: top-3 orders per customer — SURVEY.md §2.5 extension
    QuerySpec("window_rank",
      (s, d) => orders(s, d)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", row_number().over(Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn"),
      Some("""SELECT * FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |         row_number() OVER (PARTITION BY o_custkey
             |           ORDER BY o_totalprice DESC, o_orderkey)::INT AS rn
             |  FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // ── winsorization at exact P05/P95 (broadcast cutpoints, no
    // single-partition window — same machinery as ntile_binning) ────────
    QuerySpec("winsorize",
      (s, d) => Features.winsorize(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey", "l_extendedprice"),
          "l_extendedprice", loP = 0.05, hiP = 0.95)
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
      Some("""WITH c AS (
             |  SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
             |         quantile_cont(l_extendedprice, 0.95) AS hi
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       l_extendedprice,
             |       least(greatest(l_extendedprice, lo), hi)
             |         AS l_extendedprice_wins
             |FROM lineitem CROSS JOIN c
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── robust scaling (x − median)/IQR with EXACT percentiles (MLlib's
    // RobustScaler is approxQuantile-dependent; this one oracles) ───────
    QuerySpec("robust_scaler",
      (s, d) => {
        val scaled = Features.robustScale(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_partkey",
            "l_suppkey", "l_extendedprice"),
          "l_extendedprice")
        scaled.select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey"),
            round(col("l_extendedprice_robust"), 6)
              .as("l_extendedprice_robust"))
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      },
      Some("""WITH c AS (
             |  SELECT quantile_cont(l_extendedprice, 0.5) AS med,
             |         quantile_cont(l_extendedprice, 0.75) -
             |           quantile_cont(l_extendedprice, 0.25) AS iqr
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
             |       CASE WHEN iqr <> 0
             |            THEN round((l_extendedprice - med) / iqr, 6) END
             |         AS l_extendedprice_robust
             |FROM lineitem CROSS JOIN c
             |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin)),

    // ── schema drift contract check: pure metadata, zero jobs over the
    // data; oracle is the expected literal diff ─────────────────────────
    QuerySpec("schema_diff",
      (s, d) => Quality.schemaDiff(
        orders(s, d),
        orders(s, d)
          .withColumn("o_totalprice", col("o_totalprice").cast("float"))
          .drop("o_orderpriority")
          .withColumn("o_flag", lit(1))),
      Some("""SELECT * FROM (VALUES
             |  ('o_flag', 'added', NULL, 'int'),
             |  ('o_orderpriority', 'removed', 'string', NULL),
             |  ('o_totalprice', 'type_changed', 'double', 'float'))
             |  t("column", change, from_type, to_type)
             |ORDER BY "column", change""".stripMargin)),

    // ── row-level reconciliation: a synthetic right snapshot with
    // deterministic deletes / inserts / updates; the diff is ONE
    // union+aggregate exchange (no full-outer join), the oracle is the
    // FULL OUTER JOIN form — same rows, different physics ───────────────
    QuerySpec("table_diff",
      (s, d) => {
        val base = orders(s, d).select("o_orderkey", "o_orderstatus",
          "o_totalprice", "o_orderpriority")
        val left = base.filter(col("o_orderkey") % 93 =!= 0)
        val right = base.filter(col("o_orderkey") % 97 =!= 0)
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 83 === 0, lit("X"))
              .otherwise(col("o_orderstatus")))
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 10)
              .otherwise(col("o_totalprice")))
        Quality.rowDiff(left, right, Seq("o_orderkey"),
            Seq("o_orderstatus", "o_totalprice", "o_orderpriority"))
          .orderBy("o_orderkey")
      },
      Some("""WITH l AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice,
             |         o_orderpriority
             |  FROM orders WHERE o_orderkey % 93 <> 0),
             |r AS (
             |  SELECT o_orderkey,
             |         CASE WHEN o_orderkey % 83 = 0 THEN 'X'
             |              ELSE o_orderstatus END AS o_orderstatus,
             |         CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 10
             |              ELSE o_totalprice END AS o_totalprice,
             |         o_orderpriority
             |  FROM orders WHERE o_orderkey % 97 <> 0),
             |j AS (
             |  SELECT coalesce(l.o_orderkey, r.o_orderkey) AS o_orderkey,
             |         l.o_orderkey IS NULL AS lnull,
             |         r.o_orderkey IS NULL AS rnull,
             |         l.o_orderstatus AS ls, r.o_orderstatus AS rs,
             |         l.o_totalprice AS lt, r.o_totalprice AS rt,
             |         l.o_orderpriority AS lp, r.o_orderpriority AS rp
             |  FROM l FULL OUTER JOIN r ON l.o_orderkey = r.o_orderkey)
             |SELECT o_orderkey,
             |       CASE WHEN lnull THEN 'added'
             |            WHEN rnull THEN 'removed'
             |            ELSE 'changed' END AS diff_status,
             |       CASE WHEN lnull OR rnull THEN ''
             |            ELSE concat_ws(',',
             |              CASE WHEN ls IS DISTINCT FROM rs
             |                   THEN 'o_orderstatus' END,
             |              CASE WHEN lt IS DISTINCT FROM rt
             |                   THEN 'o_totalprice' END,
             |              CASE WHEN lp IS DISTINCT FROM rp
             |                   THEN 'o_orderpriority' END) END AS changed_cols
             |FROM j
             |WHERE lnull OR rnull OR ls IS DISTINCT FROM rs
             |   OR lt IS DISTINCT FROM rt OR lp IS DISTINCT FROM rp
             |ORDER BY o_orderkey""".stripMargin)),

    // ── incremental aggregate maintenance: state over ~80% of events +
    // aggregated delta over the rest, merged — proven EQUAL to the full
    // recompute (micro-unit long sums are associative, so merge order
    // cannot drift the totals) ──────────────────────────────────────────
    QuerySpec("incremental_agg",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("event_id"),
          round(col("value") * 1000000).cast("long").as("v"))
        val state = Scale.aggState(
          ev.filter(col("event_id") % 10 < 8).drop("event_id"),
          Seq("user_id"), "v")
        val delta = Scale.aggState(
          ev.filter(col("event_id") % 10 >= 8).drop("event_id"),
          Seq("user_id"), "v")
        Scale.mergeAggState(state, delta, Seq("user_id"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*)::BIGINT AS n_rows,
             |       CAST(sum(CAST(round(value * 1000000) AS BIGINT))
             |            AS BIGINT) AS sum_v,
             |       min(CAST(round(value * 1000000) AS BIGINT)) AS min_v,
             |       max(CAST(round(value * 1000000) AS BIGINT)) AS max_v
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
