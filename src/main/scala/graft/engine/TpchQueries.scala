package graft.engine

import org.apache.spark.sql.functions._

/** Classic TPC-H-shaped analytics over the testdata star schema, plus
  * the SQL entry surface (spark.sql over registered views) and the
  * calendar-correct time features (the clearly-named extras promised in
  * SURVEY.md §2.7).
  *
  * Float-parity notes: quantities are integral-valued doubles (sums
  * exact, so averages divide identical operands); 2-decimal money and
  * discount columns average via the exact integer-cents form (see
  * Relational's rolling_features note); sums of products round to 2.
  */
object TpchQueries {

  import Tables._

  /** Revenue term `price · (1 − discount)` in exact 1e-4 integer units:
    * both factors are 2-decimal, so the product is integral, the sum is
    * order-independent, and the final `/ 10000.0` is the same IEEE
    * division on both engines. NO round() on the float sum — Spark
    * rounds the decimal string and DuckDB the binary double, which flip
    * against each other exactly at .xx5 boundaries.
    */
  private def revenueUnits =
    (round(col("l_extendedprice") * 100)).cast("long") *
      (lit(100L) - (round(col("l_discount") * 100)).cast("long"))

  /** The DuckDB twin of [[revenueUnits]]. */
  private val revenueUnitsSql =
    """CAST(round(l_extendedprice * 100) AS BIGINT)
      | * (100 - CAST(round(l_discount * 100) AS BIGINT))""".stripMargin

  val catalog: Seq[QuerySpec] = Seq(

    // ── TPC-H Q1 shape: pricing summary report ──────────────────────────
    QuerySpec("tpch_q1",
      (s, d) => {
        val cutoff = to_timestamp(lit("1999-01-01 00:00:00"))
        val pc = (round(col("l_extendedprice") * 100)).cast("long")
        val dc = (round(col("l_discount") * 100)).cast("long")
        lineitem(s, d).filter(col("l_shipdate") <= cutoff)
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_tax"), pc.as("pc"), dc.as("dc"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"), // integral-valued: exact
            round(sum("l_extendedprice"), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            (sum("l_quantity") / count(lit(1))).as("avg_qty"),
            (sum("pc") / (count(lit(1)) * 100)).as("avg_price"),
            (sum("dc") / (count(lit(1)) * 100)).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |       sum(l_quantity) AS sum_qty,
             |       round(sum(l_extendedprice), 2) AS sum_base_price,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             |         AS sum_charge,
             |       sum(l_quantity) / count(*) AS avg_qty,
             |       sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |         / (count(*) * 100) AS avg_price,
             |       sum(CAST(round(l_discount * 100) AS BIGINT))
             |         / (count(*) * 100) AS avg_disc,
             |       count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── TPC-H Q3 shape: top-10 revenue orders for one segment ───────────
    QuerySpec("tpch_q3",
      (s, d) => customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(desc("revenue"), asc("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_orderpriority,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
             |GROUP BY o_orderkey, o_orderpriority
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ── TPC-H Q6 shape: forecast revenue change (scalar) ────────────────
    QuerySpec("tpch_q6",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00"))
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"),
          count(lit(1)).as("n_rows"))
        .select(col("revenue"), col("n_rows")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             |       count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // ── TPC-H Q5 shape: local supplier volume — the 6-table star join
    // (customer/orders/lineitem/supplier/nation/region, with the
    // customer-and-supplier-same-nation equi-constraint). Scale shape:
    // the dims broadcast; only orders⋈lineitem shuffles. ───────────────
    QuerySpec("tpch_q5",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(supplier(s, d), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA"
          && col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy("n_name")
        .agg((sum(revenueUnits) / 10000.0).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name")),
      Some("""SELECT n_name,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |             AS BIGINT) / 10000.0 AS revenue
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |              AND c_nationkey = s_nationkey
             |JOIN nation   ON s_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // ── TPC-H Q10 shape: returned-item reporting — top-20 customers by
    // lost revenue on returned lineitems in a quarter-year window ───────
    QuerySpec("tpch_q10",
      (s, d) => customer(s, d)
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .filter(col("l_returnflag") === "R"
          && col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        // this one DID flip a .xx5 round boundary under the float-sum
        // form at sf0.01 — keep the exact revenueUnits form
        .agg((sum(revenueUnits) / 10000.0).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20),
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |             AS BIGINT) / 10000.0 AS revenue
             |FROM customer
             |JOIN orders   ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // ── TPC-H Q4 shape: order-priority checking. The EXISTS correlated
    // subquery is a left-semi join with a non-equi residual — one
    // shuffle on the order key, lineitem never widens the output.
    // (This schema has no commit/receipt dates; l_shipdate > o_orderdate
    // plays the late-lineitem role.) ────────────────────────────────────
    QuerySpec("tpch_q4",
      (s, d) => orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-07-01 00:00:00"))
          && col("o_orderdate") < to_timestamp(lit("1996-10-01 00:00:00")))
        .join(lineitem(s, d),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ── TPC-H Q7 shape: volume shipping between two nations. The nation
    // dim joins TWICE (supplier side and customer side) with a
    // disjunctive cross-nation predicate — both copies broadcast; the
    // only shuffles are the fact-fact joins. ────────────────────────────
    QuerySpec("tpch_q7",
      (s, d) => {
        val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
          col("n_name").as("supp_nation"))
        val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
          col("n_name").as("cust_nation"))
        supplier(s, d)
          .join(lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(customer(s, d), col("c_custkey") === col("o_custkey"))
          .join(n1, col("s_nationkey") === col("n1_key"))
          .join(n2, col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === "NATION_3"
              && col("cust_nation") === "NATION_7")
            || (col("supp_nation") === "NATION_7"
              && col("cust_nation") === "NATION_3"))
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
            && col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg((sum(revenueUnits) / 10000.0).as("revenue"),
            count(lit(1)).as("n_rows"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |       year(l_shipdate)::INT AS l_year,
              |       CAST(sum($revenueUnitsSql) AS BIGINT) / 10000.0 AS revenue,
              |       count(*) AS n_rows
              |FROM supplier
              |JOIN lineitem ON s_suppkey = l_suppkey
              |JOIN orders   ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN nation n1 ON s_nationkey = n1.n_nationkey
              |JOIN nation n2 ON c_nationkey = n2.n_nationkey
              |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
              |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ── TPC-H Q14 shape: promo revenue share — conditional aggregation
    // over a fact⋈dim join, two sums in one pass. Numerator and
    // denominator both accumulate in exact integer units; the single
    // (100.0 · num) / den division is identical IEEE on both engines. ───
    QuerySpec("tpch_q14",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(((lit(100.0) * sum(when(col("p_type") === "PROMO", revenueUnits)
            .otherwise(lit(0L)))) / sum(revenueUnits)).as("promo_revenue"),
          count(lit(1)).as("n_rows")),
      Some(s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
              |         THEN $revenueUnitsSql ELSE 0 END) AS BIGINT)
              |       / CAST(sum($revenueUnitsSql) AS BIGINT) AS promo_revenue,
              |       count(*) AS n_rows
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
              |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)),

    // ── TPC-H Q18 shape: large-volume customers — a HAVING subquery on
    // the fact (partial agg before its one shuffle) drives a key join
    // back to orders/customer, then top-100. The quantity sum is
    // integral-valued, so it is exact on both engines. ──────────────────
    QuerySpec("tpch_q18",
      (s, d) => {
        val big = lineitem(s, d).groupBy("l_orderkey")
          .agg(sum("l_quantity").as("total_qty"))
          .filter(col("total_qty") > 250)
        customer(s, d)
          .join(orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_custkey, c_name, o_orderkey, o_orderdate,
             |       o_totalprice, t.total_qty
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(l_quantity) > 250) t
             |  ON o_orderkey = t.l_orderkey
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ── TPC-H Q19 shape: discounted revenue under an OR-of-ANDs
    // predicate spanning both join sides — the part conjuncts push into
    // the dim scan, the shared l_partkey join key stays an equi-join
    // (no BroadcastNestedLoop), and the residual evaluates post-join. ───
    QuerySpec("tpch_q19",
      (s, d) => lineitem(s, d)
        .join(part(s, d), col("l_partkey") === col("p_partkey"))
        .filter((col("p_brand") === "Brand#4"
            && col("p_size").between(1, 15)
            && col("l_quantity").between(1, 15))
          || (col("p_brand") === "Brand#2"
            && col("p_size").between(10, 30)
            && col("l_quantity").between(5, 25))
          || (col("p_brand") === "Brand#19"
            && col("p_size").between(20, 50)
            && col("l_quantity").between(10, 40)))
        .agg((sum(revenueUnits) / 10000.0).as("revenue"),
          count(lit(1)).as("n_rows")),
      Some(s"""SELECT CAST(sum($revenueUnitsSql) AS BIGINT) / 10000.0 AS revenue,
              |       count(*) AS n_rows
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'Brand#4'
              |       AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
              |   OR (p_brand = 'Brand#2'
              |       AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 5 AND 25)
              |   OR (p_brand = 'Brand#19'
              |       AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 10 AND 40)""".stripMargin)),

    // ── SQL entry surface: the same engine through spark.sql over
    // registered views — monthly order revenue ──────────────────────────
    QuerySpec("sql_interface",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("v_orders")
        s.sql("""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
                 count(*) AS n_orders,
                 round(sum(o_totalprice), 2) AS monthly_revenue
                 FROM v_orders GROUP BY 1, 2 ORDER BY y, m""")
      },
      Some("""SELECT year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
             |       count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS monthly_revenue
             |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin)),

    // ── calendar-correct time features (the clearly-named extras beside
    // the reference-faithful fractional ones) — SURVEY.md §2.7 ───────────
    QuerySpec("cal_time_features",
      (s, d) => Features.calendarTimeFeatures(
          orders(s, d).select("o_orderkey", "o_orderdate"), "o_orderdate")
        .select("o_orderkey", "cal_hour", "cal_day_of_week",
          "cal_day_of_month", "cal_is_weekend")
        .orderBy("o_orderkey"),
      // Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday
      Some("""SELECT o_orderkey,
             |       hour(o_orderdate)::INT AS cal_hour,
             |       (dayofweek(o_orderdate) + 1)::INT AS cal_day_of_week,
             |       dayofmonth(o_orderdate)::INT AS cal_day_of_month,
             |       CASE WHEN dayofweek(o_orderdate) IN (0, 6)
             |            THEN 1 ELSE 0 END AS cal_is_weekend
             |FROM orders ORDER BY o_orderkey""".stripMargin))
  )
}
