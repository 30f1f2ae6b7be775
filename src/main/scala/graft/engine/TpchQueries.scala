package graft.engine

import org.apache.spark.sql.expressions.Window
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
  /** A 2-decimal money column in exact integer cents. */
  private def cents(c: org.apache.spark.sql.Column) =
    (round(c * 100)).cast("long")

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

    // ── TPC-H Q2 shape: min-cost supplier. This schema has no partsupp,
    // so supply cost is derived from observed sales: min sale price per
    // (part, supplier) pair. The correlated min-per-group subquery is a
    // two-level aggregation joined back on (key, min) — both aggs
    // partial-combine before their one shuffle; every dim broadcasts. ────
    QuerySpec("tpch_q2",
      (s, d) => {
        // min-per-part via a window over the aggregated (part, supplier)
        // pairs, NOT a second aggregation joined back: the two-agg form
        // scans lineitem twice (AQE's pruning defeats ReuseExchange);
        // this form scans once, and the window partitions on l_partkey —
        // bounded by suppliers-per-part, never SinglePartition
        val cost = lineitem(s, d)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(cents(col("l_extendedprice"))).as("supply_cost"))
          .withColumn("min_cost", min(col("supply_cost")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")))
          .filter(col("supply_cost") === col("min_cost"))
        part(s, d).filter(col("p_type") === "LARGE")
          .join(cost, col("p_partkey") === col("l_partkey"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
          .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "EUROPE")
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_type"),
            (col("supply_cost") / 100.0).as("supplycost"))
          .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"),
            asc("p_partkey"))
          .limit(100)
      },
      Some("""WITH cost AS (
             |  SELECT l_partkey, l_suppkey,
             |         min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS supply_cost
             |  FROM lineitem GROUP BY 1, 2),
             |mincost AS (
             |  SELECT l_partkey, min(supply_cost) AS min_cost FROM cost GROUP BY 1)
             |SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
             |       c.supply_cost / 100.0 AS supplycost
             |FROM part
             |JOIN cost c     ON p_partkey = c.l_partkey
             |JOIN mincost m  ON c.l_partkey = m.l_partkey AND c.supply_cost = m.min_cost
             |JOIN supplier   ON c.l_suppkey = s_suppkey
             |JOIN nation     ON s_nationkey = n_nationkey
             |JOIN region     ON n_regionkey = r_regionkey
             |WHERE p_type = 'LARGE' AND r_name = 'EUROPE'
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin)),

    // ── TPC-H Q8 shape: national market share — one nation's slice of a
    // region's market for a part type, per year. The nation dim joins
    // twice (customer region gate, supplier share tag); numerator and
    // denominator accumulate in exact integer units and divide once. ────
    QuerySpec("tpch_q8",
      (s, d) => {
        val n1 = nation(s, d).select(col("n_nationkey").as("n1_key"),
          col("n_regionkey").as("n1_region"))
        val n2 = nation(s, d).select(col("n_nationkey").as("n2_key"),
          col("n_name").as("supp_nation"))
        part(s, d).filter(col("p_type") === "ECONOMY")
          .join(lineitem(s, d), col("p_partkey") === col("l_partkey"))
          .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(customer(s, d), col("c_custkey") === col("o_custkey"))
          .join(supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(n1, col("c_nationkey") === col("n1_key"))
          .join(region(s, d), col("n1_region") === col("r_regionkey"))
          .join(n2, col("s_nationkey") === col("n2_key"))
          .filter(col("r_name") === "ASIA"
            && col("o_orderdate") >= to_timestamp(lit("1995-01-01 00:00:00"))
            && col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg((sum(when(col("supp_nation") === "NATION_5", revenueUnits)
              .otherwise(lit(0L))) / sum(revenueUnits)).as("mkt_share"),
            count(lit(1)).as("n_rows"))
          .orderBy("o_year")
      },
      Some(s"""SELECT year(o_orderdate)::INT AS o_year,
              |       CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
              |                THEN $revenueUnitsSql ELSE 0 END) AS BIGINT)
              |         / CAST(sum($revenueUnitsSql) AS BIGINT) AS mkt_share,
              |       count(*) AS n_rows
              |FROM part
              |JOIN lineitem ON p_partkey = l_partkey
              |JOIN orders   ON o_orderkey = l_orderkey
              |JOIN customer ON c_custkey = o_custkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN nation n1 ON c_nationkey = n1.n_nationkey
              |JOIN region    ON n1.n_regionkey = r_regionkey
              |JOIN nation n2 ON s_nationkey = n2.n_nationkey
              |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── TPC-H Q9 shape: product-line profit by supplier nation and year.
    // No partsupp cost here, so cost = p_retailprice · quantity; profit
    // stays in exact 1e-4 integer units until the single final division. ─
    QuerySpec("tpch_q9",
      (s, d) => lineitem(s, d)
        .join(part(s, d).filter(col("p_name").like("red %")),
          col("p_partkey") === col("l_partkey"))
        .join(supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg((sum(revenueUnits - cents(col("p_retailprice")) * 100L
            * col("l_quantity").cast("long")) / 10000.0).as("sum_profit"))
        .orderBy("nation", "o_year"),
      Some(s"""SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
              |       CAST(sum($revenueUnitsSql
              |            - CAST(round(p_retailprice * 100) AS BIGINT) * 100
              |              * CAST(l_quantity AS BIGINT)) AS BIGINT) / 10000.0 AS sum_profit
              |FROM lineitem
              |JOIN part     ON p_partkey = l_partkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN orders   ON o_orderkey = l_orderkey
              |JOIN nation   ON s_nationkey = n_nationkey
              |WHERE p_name LIKE 'red %'
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── TPC-H Q11 shape: important stock — parts whose traded value for
    // one nation's suppliers exceeds a fraction of the total. The global
    // threshold is a 1-row agg broadcast-cross-joined back (never an
    // `over ()` window): two shuffles total, both partial-combined. ─────
    QuerySpec("tpch_q11",
      (s, d) => {
        val pv = lineitem(s, d)
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(nation(s, d).filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("l_partkey").as("p_key"))
          .agg(sum(cents(col("l_extendedprice"))
            * col("l_quantity").cast("long")).as("value_c"))
        val total = pv.agg(sum(col("value_c")).as("total_c"))
        pv.crossJoin(broadcast(total))
          .filter(col("value_c") > col("total_c") * 0.001)
          .select(col("p_key"), (col("value_c") / 100.0).as("part_value"))
          .orderBy(desc("part_value"), asc("p_key"))
      },
      Some("""WITH pv AS (
             |  SELECT l_partkey,
             |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |             * CAST(l_quantity AS BIGINT)) AS value_c
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE n_name = 'NATION_3'
             |  GROUP BY 1)
             |SELECT l_partkey AS p_key, value_c / 100.0 AS part_value
             |FROM pv
             |WHERE value_c > (SELECT sum(value_c) * 0.001 FROM pv)
             |ORDER BY part_value DESC, p_key""".stripMargin)),

    // ── TPC-H Q12 shape: late-shipment priority split. No l_shipmode in
    // this schema — l_returnflag plays the mode; lateness is the
    // ship-after-order-date residual on the one fact-fact join. ─────────
    QuerySpec("tpch_q12",
      (s, d) => orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate")
          && col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
          && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate > o_orderdate
             |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ── TPC-H Q13 shape: customer order-count distribution — LEFT join
    // with a predicate folded into the join condition (zero-order
    // customers survive with count 0), then a second aggregation over
    // the counts. The o_comment NOT LIKE gate maps to a priority gate. ──
    QuerySpec("tpch_q13",
      (s, d) => customer(s, d)
        .join(orders(s, d)
            .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count")),
      Some("""WITH co AS (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
             |  GROUP BY 1)
             |SELECT c_count::BIGINT AS c_count, count(*) AS custdist
             |FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // ── TPC-H Q15 shape: top supplier — the scalar-subquery max is a
    // broadcast 1-row agg joined back on exact integer-unit equality
    // (revenue never becomes a float until output, so `= max` is safe). ──
    QuerySpec("tpch_q15",
      (s, d) => {
        val rev = lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
            && col("l_shipdate") < to_timestamp(lit("1996-07-01 00:00:00")))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(revenueUnits).as("total_units"))
        val top = rev.agg(max(col("total_units")).as("max_units"))
        supplier(s, d)
          .join(rev, col("s_suppkey") === col("supplier_no"))
          .join(broadcast(top), col("total_units") === col("max_units"))
          .select(col("s_suppkey"), col("s_name"),
            (col("total_units") / 10000.0).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some(s"""WITH rev AS (
              |  SELECT l_suppkey AS supplier_no,
              |         CAST(sum($revenueUnitsSql) AS BIGINT) AS total_units
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              |    AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
              |  GROUP BY 1)
              |SELECT s_suppkey, s_name, total_units / 10000.0 AS total_revenue
              |FROM supplier JOIN rev ON s_suppkey = supplier_no
              |WHERE total_units = (SELECT max(total_units) FROM rev)
              |ORDER BY s_suppkey""".stripMargin)),

    // ── TPC-H Q16 shape: supplier breadth per part attribute — NOT IN
    // becomes a broadcast anti-join on the tiny excluded-supplier set
    // (negative balance plays the complaints gate), then countDistinct. ──
    QuerySpec("tpch_q16",
      (s, d) => lineitem(s, d)
        .join(supplier(s, d).filter(col("s_acctbal") < 0)
            .select(col("s_suppkey")),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(part(s, d).filter(col("p_brand") =!= "Brand#1"
            && col("p_type") =!= "PROMO"
            && col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)),
          col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"),
          asc("p_size")),
      Some("""SELECT p_brand, p_type, p_size,
             |       count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
             |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // ── TPC-H Q17 shape: small-quantity-order revenue — the correlated
    // per-part average joins back to the fact; the average divides the
    // same exact operands (integral qty sum / count) on both engines, so
    // the 0.2·avg comparison is bit-identical. ──────────────────────────
    QuerySpec("tpch_q17",
      (s, d) => {
        val pa = lineitem(s, d)
          .groupBy(col("l_partkey").as("pk"))
          .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
        lineitem(s, d)
          .join(part(s, d).filter(col("p_brand") === "Brand#3"
            && col("p_type") === "SMALL"),
            col("p_partkey") === col("l_partkey"))
          .join(pa, col("l_partkey") === col("pk"))
          .filter(col("l_quantity") < col("avg_qty") * 0.2)
          .agg((sum(cents(col("l_extendedprice"))) / 700.0).as("avg_yearly"),
            count(lit(1)).as("n_rows"))
      },
      Some("""WITH pa AS (
             |  SELECT l_partkey AS pk,
             |         sum(l_quantity) / count(*) AS avg_qty
             |  FROM lineitem GROUP BY 1)
             |SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             |         / 700.0 AS avg_yearly,
             |       count(*) AS n_rows
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |JOIN pa   ON l_partkey = pk
             |WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
             |  AND l_quantity < 0.2 * avg_qty""".stripMargin)),

    // ── TPC-H Q20 shape: excess-volume suppliers — nested semi joins:
    // red parts gate the fact (semi), the per-(supplier, part) HAVING
    // gates the supplier set (semi again); nothing ever widens. ─────────
    QuerySpec("tpch_q20",
      (s, d) => {
        val heavy = lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00"))
            && col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .join(part(s, d).filter(col("p_name").like("red %"))
            .select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy("l_suppkey", "l_partkey")
          .agg(sum("l_quantity").as("qty"))
          .filter(col("qty") > 50)
          .select(col("l_suppkey")).distinct()
        supplier(s, d)
          .join(nation(s, d).filter(
            col("n_name").isin("NATION_2", "NATION_3", "NATION_4")),
            col("s_nationkey") === col("n_nationkey"))
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name", "n_name")
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, n_name
             |FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |WHERE n_name IN ('NATION_2', 'NATION_3', 'NATION_4')
             |  AND s_suppkey IN (
             |    SELECT l_suppkey FROM lineitem
             |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
             |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |    GROUP BY l_suppkey, l_partkey
             |    HAVING sum(l_quantity) > 50)
             |ORDER BY s_suppkey""".stripMargin)),

    // ── TPC-H Q21 shape: suppliers who kept orders waiting — EXISTS
    // (another supplier on the order) is a semi join with a non-equi
    // residual, NOT EXISTS (another LATE supplier) an anti join on the
    // same key; both shuffle once on the order key. Lateness = shipped
    // 60+ days after the order date (no receipt/commit dates here). ─────
    QuerySpec("tpch_q21",
      (s, d) => {
        // Single lineitem scan: EXISTS/NOT-EXISTS over same-order pairs
        // collapse to per-order counts — a late (order, supplier) pair
        // qualifies iff the order has another supplier (n_supp > 1) and
        // no OTHER late one (n_late = 1). The pair agg hashes on
        // (orderkey, suppkey); the per-order rollup rides a window over
        // the pair frame (≈ distinct (order, supplier) — roughly 2/3 of
        // lineitem rows, NOT "far smaller"), never a second lineitem
        // pass. r11 f20 A/B (BASELINE.md): the window's per-order sort
        // vs a groupBy+join-back rollup is a wash (3.87 vs 3.53 s on a
        // 4M-row pair frame) — the pair JOIN dominates; the window's
        // sort runs per l_orderkey-shuffled partition, executor-sized
        // when partition count tracks data (AQE), so it holds at scale.
        val pairs = lineitem(s, d)
          .join(orders(s, d).filter(col("o_orderstatus") === "F")
            .select("o_orderkey", "o_orderdate"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("l_orderkey", "l_suppkey")
          .agg(max(when(col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1L)
            .otherwise(0L)).as("late"))
        val w = Window.partitionBy("l_orderkey")
        pairs
          .withColumn("n_supp", count(lit(1)).over(w))
          .withColumn("n_late", sum(col("late")).over(w))
          .filter(col("late") === 1L && col("n_supp") > 1L &&
            col("n_late") === 1L)
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("numwait"))
          .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select("s_suppkey", "s_name", "numwait")
          .orderBy(desc("numwait"), asc("s_suppkey"))
          .limit(100)
      },
      Some("""WITH l1 AS (
             |  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
             |  JOIN orders ON o_orderkey = l_orderkey
             |  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY),
             |others AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
             |SELECT s_suppkey, s_name, count(*) AS numwait
             |FROM l1
             |JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM others o
             |              WHERE o.l_orderkey = l1.l_orderkey
             |                AND o.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM l1 o2
             |                  WHERE o2.l_orderkey = l1.l_orderkey
             |                    AND o2.l_suppkey <> l1.l_suppkey)
             |GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin)),

    // ── TPC-H Q22 shape: global sales opportunity — the positive-balance
    // average is a broadcast 1-row agg compared in integer cross-products
    // (cents · n > total: no division, no float), and "never ordered
    // urgently" is an anti join. Nation key plays the phone country code. ─
    QuerySpec("tpch_q22",
      (s, d) => {
        val nations = Seq(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
        val inScope = customer(s, d).filter(col("c_nationkey").isin(nations: _*))
        val pos = inScope.filter(col("c_acctbal") > 0.0)
          .agg(sum(cents(col("c_acctbal"))).as("pos_s"),
            count(lit(1)).as("pos_n"))
        inScope
          .crossJoin(broadcast(pos))
          .filter(cents(col("c_acctbal")) * col("pos_n") > col("pos_s"))
          .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").cast("long").as("cntry"))
          .agg(count(lit(1)).as("numcust"),
            (sum(cents(col("c_acctbal"))) / 100.0).as("totacctbal"))
          .orderBy("cntry")
      },
      Some("""WITH pos AS (
             |  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s, count(*) AS n
             |  FROM customer WHERE c_acctbal > 0.0 AND c_nationkey IN (1,2,3,4,5,6,7,8,9,10,11,12))
             |SELECT c_nationkey::BIGINT AS cntry, count(*) AS numcust,
             |       sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
             |FROM customer
             |WHERE c_nationkey IN (1,2,3,4,5,6,7,8,9,10,11,12)
             |  AND CAST(round(c_acctbal * 100) AS BIGINT) * (SELECT n FROM pos) > (SELECT s FROM pos)
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

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
