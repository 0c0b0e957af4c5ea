package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Classic TPC-H query shapes (Q3 / Q5 / Q10, trimmed to the synthetic
  * star's columns) — the canonical multi-join + aggregate + top-k
  * patterns every analytics engine is judged on. These stress exactly
  * the optimizer behaviors the engine banks on at 100 TB: dimension
  * broadcast under selective filters, join reorder across a 5-table
  * chain, partial aggregation before the shuffle, and
  * TakeOrderedAndProject for the final top-k.
  *
  * Determinism: revenue sums go through DECIMAL(18,6) (exact at any
  * parallelism) and every LIMIT carries a total tie-break order, so
  * the selected row set is identical in both engines.
  */
object QTpch {
  type Q = (SparkSession, String) => DataFrame

  private def withViews(s: SparkSession, dir: String): Unit = {
    val t = Tables(s, dir)
    t.customer.createOrReplaceTempView("t_customer")
    t.orders.createOrReplaceTempView("t_orders")
    t.lineitem.createOrReplaceTempView("t_lineitem")
    t.supplier.createOrReplaceTempView("t_supplier")
    t.part.createOrReplaceTempView("t_part")
    t.nation.createOrReplaceTempView("t_nation")
    t.region.createOrReplaceTempView("t_region")
  }

  private val revenue =
    "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))"

  val queries: Map[String, Q] = Map(
    // Q3 — shipping-priority: selective dim filter, 3-way join, agg,
    // top-10 by revenue.
    "q_tpch_q3" -> ((s, dir) => {
      withViews(s, dir)
      s.sql(s"""
        SELECT l_orderkey,
               CAST($revenue AS DOUBLE) AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS order_date
        FROM t_customer
        JOIN t_orders   ON c_custkey = o_custkey
        JOIN t_lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP_NTZ '1995-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP_NTZ '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
        LIMIT 10
      """)
    }),

    // Q5 — local-supplier volume: 6-table join closed by the
    // "customer and supplier in the same nation" condition.
    "q_tpch_q5" -> ((s, dir) => {
      withViews(s, dir)
      s.sql(s"""
        SELECT n_name, CAST($revenue AS DOUBLE) AS revenue
        FROM t_customer
        JOIN t_orders   ON c_custkey = o_custkey
        JOIN t_lineitem ON l_orderkey = o_orderkey
        JOIN t_supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN t_nation   ON s_nationkey = n_nationkey
        JOIN t_region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP_NTZ '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
      """)
    }),

    // Q18 — large-volume customers: HAVING over an aggregate inside an
    // IN-subquery. Stresses aggregate-subquery decorrelation (the
    // semi-join must be planned off the grouped lineitem, not a
    // re-scan per order) and the exactness of cross-engine quantity
    // sums (DECIMAL, not double).
    "q_tpch_q18" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd') AS order_date, o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        FROM t_customer
        JOIN t_orders   ON c_custkey = o_custkey
        JOIN t_lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM t_lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
      """)
    }),

    // Q21 — suppliers who kept waiting, re-keyed to this star's
    // columns (no receipt/commit dates: "late" = shipped >60 days
    // after the order date). The optimizer muscle is the pair of
    // correlated subqueries — EXISTS (another supplier in the order)
    // AND NOT EXISTS (another LATE supplier) — where the NOT EXISTS
    // correlates on BOTH l1's orderkey and the outer o_orderdate in a
    // non-equality predicate; both must decorrelate to joins, not
    // per-row re-scans.
    "q_tpch_q21" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT s_name, count(*) AS numwait
        FROM t_supplier
        JOIN t_lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN t_orders ON o_orderkey = l1.l_orderkey
        JOIN t_nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM t_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM t_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          AND n_name IN ('NATION_3', 'NATION_7')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
      """)
    }),

    // Q17 — small-quantity-order revenue: a correlated SCALAR
    // aggregate subquery (per-part average quantity) gating the fact
    // scan. The optimizer must rewrite the per-row subquery into one
    // grouped aggregate joined back on p_partkey — at 100 TB the
    // difference between one extra lineitem scan and one scan per row.
    // Averages computed as decimal-sum / count on both engines
    // (double SUM order is partition-dependent; decimal is exact).
    "q_tpch_q17" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM t_lineitem JOIN t_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1' AND p_size < 15
          AND l_quantity < (
            SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
            FROM t_lineitem l2 WHERE l2.l_partkey = p_partkey)
      """)
    }),

    // Q20 — part-promotion suppliers, re-keyed to this star (no
    // partsupp table): nested IN-subqueries with a correlated scalar
    // aggregate inside a HAVING, correlating on the inner query's own
    // GROUP BY key — the deepest decorrelation shape here.
    "q_tpch_q20" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT s_name FROM t_supplier JOIN t_nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
          SELECT l1.l_suppkey FROM t_lineitem l1
          WHERE l1.l_partkey IN (SELECT p_partkey FROM t_part WHERE p_name LIKE 'red%')
          GROUP BY l1.l_suppkey, l1.l_partkey
          HAVING SUM(CAST(l1.l_quantity AS DECIMAL(18,6))) > (
             SELECT 0.12 * SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
             FROM t_lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
          AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        ORDER BY s_name
      """)
    }),

    // Q10 — returned-item reporting: revenue lost to returns per
    // customer in a quarter, top-20.
    "q_tpch_q10" -> ((s, dir) => {
      withViews(s, dir)
      s.sql(s"""
        SELECT c_custkey, c_name,
               CAST($revenue AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM t_customer
        JOIN t_orders   ON c_custkey = o_custkey
        JOIN t_lineitem ON l_orderkey = o_orderkey
        JOIN t_nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP_NTZ '1995-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
      """)
    })
  )

  private val dRevenue =
    "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, $dRevenue AS revenue,
                 strftime(o_orderdate, '%Y-%m-%d') AS order_date
          FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1995-03-15'
            AND l_shipdate  > TIMESTAMP '1995-03-15'
          GROUP BY l_orderkey, o_orderdate
          ORDER BY revenue DESC, order_date ASC, l_orderkey ASC
          LIMIT 10""",
    "q_tpch_q5" ->
      s"""SELECT n_name, $dRevenue AS revenue
          FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1995-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01'
          GROUP BY n_name
          ORDER BY revenue DESC, n_name ASC""",
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_totalprice,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 300)
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey ASC
         LIMIT 100""",
    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
         FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
         JOIN orders ON o_orderkey = l1.l_orderkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE o_orderstatus = 'F'
           AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
           AND n_name IN ('NATION_3', 'NATION_7')
         GROUP BY s_name
         ORDER BY numwait DESC, s_name ASC
         LIMIT 100""",
    "q_tpch_q17" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand = 'Brand#1' AND p_size < 15
           AND l_quantity < (
             SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
             FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""",
    "q_tpch_q20" ->
      """SELECT s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE s_suppkey IN (
           SELECT l1.l_suppkey FROM lineitem l1
           WHERE l1.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
           GROUP BY l1.l_suppkey, l1.l_partkey
           HAVING SUM(CAST(l1.l_quantity AS DECIMAL(18,6))) > (
              SELECT 0.12 * SUM(CAST(l2.l_quantity AS DECIMAL(18,6)))
              FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey))
           AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
         ORDER BY s_name""",
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, $dRevenue AS revenue, c_acctbal, n_name
          FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation   ON c_nationkey = n_nationkey
          WHERE o_orderdate >= TIMESTAMP '1995-10-01'
            AND o_orderdate <  TIMESTAMP '1996-01-01'
            AND l_returnflag = 'R'
          GROUP BY c_custkey, c_name, c_acctbal, n_name
          ORDER BY revenue DESC, c_custkey ASC
          LIMIT 20"""
  )
}
