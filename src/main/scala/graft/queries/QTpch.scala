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

    // Q2 — minimum-cost supplier, re-keyed to this star (no partsupp:
    // part↔supplier linkage goes through lineitem, "cost" is the
    // supplier's account balance). The muscle is the correlated MIN
    // subquery referencing the outer part inside a multi-join — it
    // must decorrelate to one grouped aggregate joined back, not a
    // per-part rescan.
    "q_tpch_q2" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM t_part
        JOIN t_lineitem ON p_partkey = l_partkey
        JOIN t_supplier ON s_suppkey = l_suppkey
        JOIN t_nation   ON s_nationkey = n_nationkey
        JOIN t_region   ON n_regionkey = r_regionkey
        WHERE p_size < 5 AND p_type = 'STANDARD' AND r_name = 'ASIA'
          AND s_acctbal = (
            SELECT MIN(s2.s_acctbal)
            FROM t_supplier s2
            JOIN t_lineitem l2 ON s2.s_suppkey = l2.l_suppkey
            JOIN t_nation n2   ON s2.s_nationkey = n2.n_nationkey
            JOIN t_region r2   ON n2.n_regionkey = r2.r_regionkey
            WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
      """)
    }),

    // Q4 — order-priority checking ("late" = shipped >45 days after
    // order, standing in for the missing commit/receipt dates): a
    // correlated EXISTS whose predicate references the outer
    // o_orderdate non-equally, over a date-windowed orders scan.
    "q_tpch_q4" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM t_orders
        WHERE o_orderdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM t_lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """)
    }),

    // Q6 — forecast revenue change: pure scan + range predicates + one
    // aggregate. The plan to demand at 100 TB: every filter in
    // PushedFilters, no shuffle at all before the partial aggregate.
    "q_tpch_q6" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM t_lineitem
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
      """)
    }),

    // Q7 — volume shipping between two nations by year: the
    // disjunctive two-nation condition must stay a join filter (not
    // split the plan), year extraction groups the fact side.
    "q_tpch_q7" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
          FROM t_supplier
          JOIN t_lineitem ON s_suppkey = l_suppkey
          JOIN t_orders   ON o_orderkey = l_orderkey
          JOIN t_customer ON c_custkey = o_custkey
          JOIN t_nation n1 ON s_nationkey = n1.n_nationkey
          JOIN t_nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP_NTZ '1995-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
      """)
    }),

    // Q8 — national market share: a ratio of conditional aggregates
    // over an 8-table join. Sums stay decimal (exact) until the final
    // double division.
    "q_tpch_q8" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT o_year,
               CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
                 n2.n_name AS nation
          FROM t_part
          JOIN t_lineitem ON p_partkey = l_partkey
          JOIN t_supplier ON s_suppkey = l_suppkey
          JOIN t_orders   ON l_orderkey = o_orderkey
          JOIN t_customer ON o_custkey = c_custkey
          JOIN t_nation n1 ON c_nationkey = n1.n_nationkey
          JOIN t_region   ON n1.n_regionkey = r_regionkey
          JOIN t_nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP_NTZ '1995-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00')
        GROUP BY o_year
        ORDER BY o_year
      """)
    }),

    // Q9 — product-type profit by nation and year, re-keyed to this
    // star (no ps_supplycost: cost is modeled off the part's retail
    // price). Per-row arithmetic is double (bit-identical both
    // engines), the cross-row sum is decimal.
    "q_tpch_q9" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
        FROM (
          SELECT n_name AS nation,
                 CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      - CAST(0.1 AS DOUBLE) * p_retailprice * l_quantity
                      AS DECIMAL(18,6)) AS amount
          FROM t_part
          JOIN t_lineitem ON p_partkey = l_partkey
          JOIN t_supplier ON s_suppkey = l_suppkey
          JOIN t_orders   ON l_orderkey = o_orderkey
          JOIN t_nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%')
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
      """)
    }),

    // Q11 — important stock, re-keyed (no partsupp: a nation's "value"
    // is its suppliers' shipped revenue). The muscle is the scalar
    // subquery inside HAVING — a global aggregate the optimizer must
    // compute once and broadcast into the group filter.
    "q_tpch_q11" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS value
        FROM t_supplier
        JOIN t_lineitem ON s_suppkey = l_suppkey
        JOIN t_nation   ON s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) > (
          SELECT 0.04 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
          FROM t_lineitem)
        ORDER BY value DESC, n_name
      """)
    }),

    // Q12 — shipping-delay classes (standing in for the missing
    // l_shipmode): CASE-bucketed join key plus conditional counts.
    "q_tpch_q12" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT CASE WHEN datediff(l_shipdate, o_orderdate) <= 30
                    THEN 'FAST' ELSE 'SLOW' END AS ship_class,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS low_line_count
        FROM t_orders JOIN t_lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1997-01-01 00:00:00'
        GROUP BY 1
        ORDER BY ship_class
      """)
    }),

    // Q13 — customer order-count distribution: LEFT OUTER join with an
    // ON-clause residual, then an aggregate OF an aggregate (count
    // histogram). Two shuffles, both on grouping keys.
    "q_tpch_q13" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM t_customer
          LEFT OUTER JOIN t_orders ON c_custkey = o_custkey
                                  AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
      """)
    }),

    // Q14 — promo revenue share in a month: conditional decimal sums,
    // double division only at the end.
    "q_tpch_q14" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                     THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                                     ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
               AS promo_revenue
        FROM t_lineitem JOIN t_part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP_NTZ '1996-09-01 00:00:00'
          AND l_shipdate <  TIMESTAMP_NTZ '1996-10-01 00:00:00'
      """)
    }),

    // Q15 — top supplier: a reused aggregate CTE plus an equality
    // against its own MAX (exact on decimal, so the tie set is
    // engine-independent).
    "q_tpch_q15" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
          FROM t_lineitem
          WHERE l_shipdate >= TIMESTAMP_NTZ '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM t_supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
      """)
    }),

    // Q16 — supplier counts by part attribute, re-keyed (part↔supplier
    // via lineitem): COUNT(DISTINCT) per group with a NOT IN
    // anti-join against a supplier blacklist.
    "q_tpch_q16" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM t_lineitem JOIN t_part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM t_supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      """)
    }),

    // Q19 — disjunctive brand/size/quantity predicates: three OR'd
    // conjunction branches over the same join. The optimizer should
    // still push the part filters and keep one join, not three.
    "q_tpch_q19" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM t_lineitem JOIN t_part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 35 AND l_quantity BETWEEN 20 AND 30)
      """)
    }),

    // Q22 — global sales opportunity, re-keyed (country code = the
    // customer number's last two digits; "no orders" = none since
    // 2000, this star has no order-less customers): an uncorrelated
    // scalar AVG threshold plus NOT EXISTS anti-join on orders.
    "q_tpch_q22" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT cntrycode, count(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM (
          SELECT right(c_name, 2) AS cntrycode, c_acctbal, c_custkey
          FROM t_customer
          WHERE right(c_name, 2) IN ('11', '17', '23', '29', '35', '41', '47')
            AND c_acctbal > (
              SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
              FROM t_customer
              WHERE c_acctbal > 0.0
                AND right(c_name, 2) IN ('11', '17', '23', '29', '35', '41', '47'))
            AND NOT EXISTS (SELECT 1 FROM t_orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP_NTZ '2000-01-01 00:00:00'))
        GROUP BY cntrycode
        ORDER BY cntrycode
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
    "q_tpch_q2" ->
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
         FROM part
         JOIN lineitem ON p_partkey = l_partkey
         JOIN supplier ON s_suppkey = l_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE p_size < 5 AND p_type = 'STANDARD' AND r_name = 'ASIA'
           AND s_acctbal = (
             SELECT MIN(s2.s_acctbal)
             FROM supplier s2
             JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
             JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
             JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
             WHERE l2.l_partkey = p_partkey AND r2.r_name = 'ASIA')
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         LIMIT 100""",
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate <  TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
         FROM (
           SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                  year(l_shipdate) AS l_year,
                  CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume
           FROM supplier
           JOIN lineitem ON s_suppkey = l_suppkey
           JOIN orders   ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             AND l_shipdate >= TIMESTAMP '1995-01-01'
             AND l_shipdate <  TIMESTAMP '1997-01-01') t
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",
    "q_tpch_q8" ->
      """SELECT o_year,
                CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                              ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS mkt_share
         FROM (
           SELECT year(o_orderdate) AS o_year,
                  CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
                  n2.n_name AS nation
           FROM part
           JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation n1 ON c_nationkey = n1.n_nationkey
           JOIN region   ON n1.n_regionkey = r_regionkey
           JOIN nation n2 ON s_nationkey = n2.n_nationkey
           WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
             AND o_orderdate >= TIMESTAMP '1995-01-01'
             AND o_orderdate <  TIMESTAMP '1997-01-01') t
         GROUP BY o_year
         ORDER BY o_year""",
    "q_tpch_q9" ->
      """SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
         FROM (
           SELECT n_name AS nation, year(o_orderdate) AS o_year,
                  CAST(l_extendedprice * (1 - l_discount)
                       - CAST(0.1 AS DOUBLE) * p_retailprice * l_quantity
                       AS DECIMAL(18,6)) AS amount
           FROM part
           JOIN lineitem ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders   ON l_orderkey = o_orderkey
           JOIN nation   ON s_nationkey = n_nationkey
           WHERE p_name LIKE '%red%') t
         GROUP BY nation, o_year
         ORDER BY nation, o_year DESC""",
    "q_tpch_q11" ->
      """SELECT n_name,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS value
         FROM supplier
         JOIN lineitem ON s_suppkey = l_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         GROUP BY n_name
         HAVING CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) > (
           SELECT 0.04 * CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           FROM lineitem)
         ORDER BY value DESC, n_name""",
    "q_tpch_q12" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                     THEN 'FAST' ELSE 'SLOW' END AS ship_class,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
         GROUP BY 1
         ORDER BY ship_class""",
    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
         FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer
           LEFT OUTER JOIN orders ON c_custkey = o_custkey
                                 AND o_orderpriority <> '5-LOW'
           GROUP BY c_custkey) t
         GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "q_tpch_q14" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                                      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-09-01'
           AND l_shipdate <  TIMESTAMP '1996-10-01'""",
    "q_tpch_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
                  SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
         FROM supplier JOIN revenue ON s_suppkey = supplier_no
         WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
         ORDER BY s_suppkey""",
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 35 AND l_quantity BETWEEN 20 AND 30)""",
    "q_tpch_q22" ->
      """SELECT cntrycode, count(*) AS numcust,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM (
           SELECT right(c_name, 2) AS cntrycode, c_acctbal, c_custkey
           FROM customer
           WHERE right(c_name, 2) IN ('11', '17', '23', '29', '35', '41', '47')
             AND c_acctbal > (
               SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               FROM customer
               WHERE c_acctbal > 0.0
                 AND right(c_name, 2) IN ('11', '17', '23', '29', '35', '41', '47'))
             AND NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey
                               AND o_orderdate >= TIMESTAMP '2000-01-01')) t
         GROUP BY cntrycode
         ORDER BY cntrycode""",
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
