package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string surface — the reference mixes the DataFrame API with
  * `registerTempTable` + `spark.sql` (`Processing Data.py:154,188,190`);
  * these queries exercise that path plus the subquery machinery
  * (Catalyst decorrelation) nothing else covers: GROUPING SETS,
  * correlated EXISTS, and a scalar subquery.
  */
object QSql {
  type Q = (SparkSession, String) => DataFrame

  private def withViews(s: SparkSession, dir: String): Unit = {
    val t = Tables(s, dir)
    t.orders.createOrReplaceTempView("v_orders")
    t.lineitem.createOrReplaceTempView("v_lineitem")
    t.customer.createOrReplaceTempView("v_customer")
    t.nation.createOrReplaceTempView("v_nation")
  }

  val queries: Map[String, Q] = Map(
    // E3 — explicit GROUPING SETS (the general form of rollup/cube).
    "q_sql_grouping_sets" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT n_name, c_mktsegment, count(*) AS n_customers
        FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment))
      """)
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE, UNION ALL form): calendar
    // spine for gap-free daily counts — days with zero orders appear
    // with 0 instead of vanishing, the standard reporting shape that a
    // plain GROUP BY o_orderdate cannot produce.
    "q_sql_recursive" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        WITH RECURSIVE days(d) AS (
          SELECT DATE '1995-03-01'
          UNION ALL
          SELECT date_add(d, 1) FROM days WHERE d < DATE '1995-03-31')
        SELECT CAST(d AS STRING) AS day, count(o_orderkey) AS n_orders
        FROM days LEFT JOIN v_orders ON CAST(o_orderdate AS DATE) = d
        GROUP BY d
      """)
    }),

    // Correlated EXISTS — decorrelated by Catalyst into a semi-join.
    "q_correlated_exists" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT o_orderkey, o_orderstatus
        FROM v_orders
        WHERE EXISTS (SELECT 1 FROM v_lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      """)
    }),

    // The SQL-only user's road to the native vector kernels: graft_dot
    // is registered in the session function registry by
    // GraftExtensions, so plain SQL text drives the codegen'd
    // expression — no DataFrame API, no imports.
    "q_sql_vector_topk" -> ((s, dir) => {
      graft.expressions.VectorExpressions.register(s)
      Tables(s, dir).embeddings.createOrReplaceTempView("v_embeddings")
      s.sql("""
        WITH q AS (SELECT embedding AS qe FROM v_embeddings WHERE vec_id = 1)
        SELECT vec_id,
               graft_dot(embedding, qe)
                 / (sqrt(graft_dot(embedding, embedding)) * sqrt(graft_dot(qe, qe))) AS cos_sim
        FROM v_embeddings, q
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
      """)
    }),

    // Scalar subquery — a broadcast one-row aggregate in the plan.
    "q_scalar_subquery" -> ((s, dir) => {
      withViews(s, dir)
      // threshold computed in exact integer cents: Spark's avg(decimal)
      // stays decimal while DuckDB's returns double, so a decimal avg
      // would round differently at boundaries
      s.sql("""
        SELECT o_orderkey, o_totalprice
        FROM v_orders
        WHERE 2 * CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) >
              3 * (SELECT CAST(SUM(CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT)) AS BIGINT)
                          DIV count(*)
                   FROM v_orders)
      """)
    }),

    // SQL PIVOT clause — the declarative form of the reference's
    // in/out full-outer-join pivot (PROC:190-207); one hash aggregate
    // with per-cell conditional sums, no self-join.
    "q_sql_pivot" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT * FROM (
          SELECT n_name, c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
          FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey)
        PIVOT (CAST(SUM(bal) AS DOUBLE)
               FOR c_mktsegment IN ('BUILDING' AS building, 'MACHINERY' AS machinery,
                                    'AUTOMOBILE' AS automobile))
      """)
    }),

    // LATERAL correlated subquery — per-order top line item without a
    // window: Catalyst decorrelates the lateral into a join + agg.
    "q_sql_lateral" -> ((s, dir) => {
      withViews(s, dir)
      s.sql("""
        SELECT o_orderkey, t.max_qty, t.n_items
        FROM v_orders,
        LATERAL (SELECT CAST(max(l_quantity) AS DOUBLE) AS max_qty,
                        count(l_quantity) AS n_items
                 FROM v_lineitem WHERE l_orderkey = o_orderkey) t
        WHERE o_orderkey < 2000
      """)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_sql_vector_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1)
         SELECT vec_id,
                list_sum(list_transform(range(1, len(embedding) + 1),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))
                / (sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
                     i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
                   * sqrt(list_sum(list_transform(range(1, len(qe) + 1),
                       i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))))) AS cos_sim
         FROM embeddings, q
         ORDER BY cos_sim DESC, vec_id ASC LIMIT 10""",
    "q_sql_recursive" ->
      """WITH RECURSIVE days(d) AS (
           SELECT DATE '1995-03-01'
           UNION ALL
           SELECT d + 1 FROM days WHERE d < DATE '1995-03-31')
         SELECT CAST(d AS VARCHAR) AS day, count(o_orderkey) AS n_orders
         FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
         GROUP BY d""",
    "q_sql_grouping_sets" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY GROUPING SETS ((n_name), (c_mktsegment), (n_name, c_mktsegment))""",
    "q_correlated_exists" ->
      """SELECT o_orderkey, o_orderstatus
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""",
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice
         FROM orders
         WHERE 2 * CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT) >
               3 * (SELECT CAST(SUM(CAST(CAST(o_totalprice * 100 AS DECIMAL(20,0)) AS BIGINT)) AS BIGINT)
                            // count(*)
                    FROM orders)""",
    "q_sql_pivot" ->
      """SELECT n_name,
                CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                              THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS building,
                CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'
                              THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS machinery,
                CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE'
                              THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS automobile
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",
    "q_sql_lateral" ->
      """SELECT o_orderkey, t.max_qty, t.n_items
         FROM orders,
         LATERAL (SELECT CAST(max(l_quantity) AS DOUBLE) AS max_qty,
                         count(l_quantity) AS n_items
                  FROM lineitem WHERE l_orderkey = o_orderkey) t
         WHERE o_orderkey < 2000"""
  )
}
