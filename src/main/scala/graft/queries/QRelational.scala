package graft.queries

import graft.Tables
import graft.ops.{Relational, Scalars}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo queries + DuckDB oracles for SURVEY.md §2.B (filters/projections),
  * §2.C (joins), §2.G (sort/limit/set ops).
  *
  * Oracle-parity rules (SURVEY §7.3): aggregated doubles go through exact
  * decimal sums then cast back to double; output columns are aliased
  * identically on both sides; every top-k has a total tie-break order.
  */
object QRelational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // B1 — projection by name; pruning reaches the parquet scan.
    "q_project" -> ((s, dir) => {
      Relational.project(Tables(s, dir).orders, Seq("o_orderkey", "o_custkey", "o_orderstatus"))
    }),

    // B3/A1 — half-open time-range scan (the JDBC pushdown-subquery
    // semantics of `Ingestion Data (MySQL).py:156-169`, on parquet:
    // PushedFilters + row-group pruning).
    "q_incremental_range_scan" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      Relational.rangeScan(li, "l_shipdate", lit("1995-01-01").cast("timestamp_ntz"), lit("1995-04-01").cast("timestamp_ntz"))
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
    }),

    // B4 — LIKE / NOT LIKE / IN / <> pattern predicates
    // (`Processing Data.py:175-180`).
    "q_filter_like_in" -> ((s, dir) => {
      Tables(s, dir).part
        .filter(col("p_type").like("S%") && !col("p_name").like("blue%")
          && col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
          && col("p_type") =!= "STANDARD")
        .select("p_partkey", "p_name", "p_brand", "p_type")
    }),

    // B6/C4 — allowlist semi-join (`Ingestion Data (XML).py:128`),
    // broadcast so the fact side never shuffles.
    "q_semi_join_allowlist" -> ((s, dir) => {
      val t = Tables(s, dir)
      val allow = t.part.filter(col("p_size") < 5).select("p_partkey")
      Relational.semiJoinAllowlist(t.lineitem, allow, "l_partkey", "p_partkey")
        .select("l_orderkey", "l_partkey", "l_quantity")
    }),

    // B8 — count action as a one-row frame.
    "q_count" -> ((s, dir) => {
      Tables(s, dir).lineitem.agg(count(lit(1)).as("n_rows"))
    }),

    // B9/G1/G2 — global top-k (TakeOrderedAndProject: no global sort
    // shuffle; k rows per partition merged on the driver).
    "q_sort_limit" -> ((s, dir) => {
      Relational.topK(Tables(s, dir).orders, 10, col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
    }),

    // A9 — high-watermark / max-partition discovery
    // (`Ingestion Data (MySQL).py:23-31`) as an aggregate, not
    // SHOW PARTITIONS + collect.
    "q_max_partition" -> ((s, dir) => {
      Tables(s, dir).orders.agg(max(Scalars.dsOf(col("o_orderdate"))).as("max_ds"))
    }),

    // C1 — multi-way inner equi-join with residual predicates
    // (`Processing Data.py:173-182`). Dims broadcast; fact unshuffled.
    "q_join_inner_multi" -> ((s, dir) => {
      val t = Tables(s, dir)
      val enriched = Relational.enrichJoin(
        t.orders,
        Seq(
          (t.customer, col("o_custkey") === col("c_custkey")),
          (t.nation, col("c_nationkey") === col("n_nationkey")),
          (t.region, col("n_regionkey") === col("r_regionkey"))))
      enriched
        .filter(col("r_name").isin("ASIA", "EUROPE") && col("o_orderstatus") =!= "F"
          && col("c_mktsegment").like("B%"))
        .select("o_orderkey", "c_custkey", "n_name", "r_name", "o_totalprice")
    }),

    // C2 — the reference's in/out pivot via full-outer join USING
    // (`Processing Data.py:190-207`), returnflag A/R standing in for
    // net.if in/out.
    "q_pivot_full_join" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_partkey"), col("l_returnflag"), Scalars.dec(col("l_quantity")).as("qty"))
      Relational.pivotFullJoin(li, Seq("l_partkey"), "l_returnflag", "A", "R", "qty", "qty_a", "qty_r")
        .select(col("l_partkey"),
          col("qty_a").cast("double").as("qty_a"),
          col("qty_r").cast("double").as("qty_r"),
          (coalesce(col("qty_a"), lit(0)) + coalesce(col("qty_r"), lit(0))).cast("double").as("qty_total"))
    }),

    // C3 — explicit cross join (`crossJoin.enabled` in every reference
    // session, e.g. `Ingestion Data (XML).py:20`).
    "q_cross_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.region.select("r_name").crossJoin(t.nation.select("n_name"))
    }),

    // C5 — left outer join + null-aware aggregate.
    "q_outer_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          sum(Scalars.dec(col("o_totalprice"))).cast("double").as("total_spent"))
    }),

    // C5 — anti join: customers with no orders.
    "q_anti_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Relational.antiJoin(t.customer, t.orders, col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_name")
    }),

    // B7 — seeded Bernoulli sample, the reference's size-estimation
    // sample (`Ingestion Data (MySQL).py:35`). No oracle: RNG streams
    // differ across engines by design (rows-only check).
    "q_sample" -> ((s, dir) => {
      Tables(s, dir).lineitem.sample(withReplacement = false, 0.1, seed = 42)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    }),

    // B7-ext — deterministic content-addressed sample: ~10% of orders
    // chosen by key-hash bucket. Unlike RNG sampling this is stable
    // across engines, runs, AND repartitions — the property incremental
    // pipelines need so re-runs sample the same rows (and the reason
    // it CAN be oracle-checked while q_sample is rows-only).
    "q_sample_hash" -> ((s, dir) => {
      Tables(s, dir).orders
        .filter(
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 10 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    }),

    // B7-ext — deterministic STRATIFIED sample: exactly 5 rows per
    // o_orderpriority stratum, picked by md5 rank (reproducible across
    // runs and engines, unlike rand()-based sampleBy). Rides the
    // native two-phase top-k: per-partition bounded heaps cut to ≤5
    // rows per stratum before the exchange, so the shuffle ships
    // k×strata rows per partition — per-group sampling never sorts or
    // ships a full 100 TB stratum.
    "q_group_sample" -> ((s, dir) => {
      graft.plans.NativeOps.topKPerGroup(
        Tables(s, dir).orders
          .withColumn("h", md5(col("o_orderkey").cast("string")))
          .select(col("o_orderpriority"), col("h"), col("o_orderkey")),
        Seq("o_orderpriority"), Seq(("h", true), ("o_orderkey", true)), 5)
        .select(col("o_orderpriority"), col("o_orderkey"))
    }),

    // C-ext — NOT IN with a nullable subquery column: three-valued
    // logic means ONE null in the list empties the result unless nulls
    // are excluded — the classic silent-wrong-answer trap; stated
    // explicitly with the null-safe anti-join form.
    "q_not_in_null" -> ((s, dir) => {
      val t = Tables(s, dir)
      // o_comment-keyed nullable side: null out one value, then the
      // null-EXCLUDING NOT IN (the form that returns rows)
      val keys = t.orders.filter(col("o_orderkey") < 500).select(
        when(col("o_orderkey") === 7, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("k"))
      t.customer.join(keys.filter(col("k").isNotNull),
          col("c_custkey") === col("k"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // C-ext — null-safe equality join (<=>): null keys MATCH each
    // other instead of silently dropping — the semantics reconciliation
    // jobs need when "unknown" is a legitimate join value.
    "q_null_safe_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val l = t.orders.filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_custkey")).as("k"))
      val r = t.customer.filter(col("c_custkey") < 50)
        .select(when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_custkey")).as("rk"),
          col("c_name"))
      l.join(r, col("k") <=> col("rk"))
        .select(col("o_orderkey"), col("k"), col("c_name"))
    }),

    // G3-ext — union by NAME across different column orders (schema
    // evolution: late files with reordered/renamed-back columns).
    "q_union_by_name" -> ((s, dir) => {
      val t = Tables(s, dir)
      val a = t.orders.filter(col("o_orderkey") < 300)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = t.orders.filter(col("o_orderkey") >= 300 && col("o_orderkey") < 600)
        .select(col("o_orderstatus"), col("o_orderkey")) // reordered
      a.unionByName(b)
    }),

    // G3 — UNION / INTERSECT / EXCEPT, tagged into one result.
    "q_set_ops" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cn = t.customer.select(col("c_nationkey").as("nationkey"))
      val sn = t.supplier.select(col("s_nationkey").as("nationkey"))
      Relational.unionAll(cn, sn).distinct().withColumn("op", lit("union"))
        .unionByName(Relational.intersect(cn, sn).withColumn("op", lit("intersect")))
        .unionByName(Relational.except(cn, sn).withColumn("op", lit("except")))
    }),

    // G3-ext — MULTISET set ops (intersectAll/exceptAll): bag
    // semantics keep duplicate counts — min(count) for intersect,
    // count difference for except — which is what dedup accounting
    // over row multisets actually needs.
    "q_set_ops_all" -> ((s, dir) => {
      val t = Tables(s, dir)
      val cn = t.customer.select(col("c_nationkey").as("nationkey"))
      val sn = t.supplier.select(col("s_nationkey").as("nationkey"))
      cn.intersectAll(sn).withColumn("op", lit("intersect_all"))
        .unionByName(cn.exceptAll(sn).withColumn("op", lit("except_all")))
        .groupBy(col("op"), col("nationkey")).agg(count(lit(1)).as("n"))
    }),

    // C-ext — fuzzy record linkage at edit distance ≤ 1 via FastSS
    // deletion-neighborhood blocking: exact result of the quadratic
    // "all pairs within one edit" join, computed as an ordinary
    // equi-join on deletion-variant keys (|s|+1 keys per record).
    // The oracle IS the naive quadratic form — completeness of the
    // blocking is what's being gate-checked.
    "q_fuzzy_join_d1" -> ((s, dir) => {
      Relational.fuzzyLinkageD1(
        Tables(s, dir).customer.select(col("c_custkey"), col("c_name")),
        "c_name", "c_custkey")
    }),

    // C-ext — BOUNDED fuzzy-join contract (VERDICT r11 item 4): the
    // full q_fuzzy_join_d1 answer is inherently output-quadratic in
    // duplication (~10⁹ rows at sf10 — the naive oracle's 675M-pair
    // Jaro cross is intractable to replay), so the sf10 ledger
    // adjudicates THIS sibling: exact-class masses computed entirely
    // at class level — n_classes, intra-class (dist-0) pair mass
    // Σ cn·(cn−1)/2, and cross-class (dist-1) mass Σ cnₐ·cn_b over
    // distinct-name pairs within one edit, found via the same FastSS
    // deletion-hash blocking as the full join. Work ∝ distinct names,
    // never records² — the DuckDB replay is a class-level join.
    "q_fuzzy_join_d1_mass" -> ((s, dir) => {
      val cls = Tables(s, dir).customer
        .filter(col("c_name").isNotNull)
        .groupBy(col("c_name").as("__s")).agg(count(lit(1)).as("cn"))
        .localCheckpoint() // two consumers: scalar agg + keyed self-join
      val keyed = cls.select(col("__s"), col("cn"),
        explode(graft.expressions.TextSketchExpressions
          .deletionHash64(col("__s"), 512)).as("__key"))
      val d1 = keyed
        .select(col("__key"), col("__s").as("s_a"), col("cn").as("cn_a"))
        .join(keyed.select(col("__key"), col("__s").as("s_b"),
          col("cn").as("cn_b")), Seq("__key"))
        .filter(col("s_a") < col("s_b")) // distinct strings => dist exactly 1
        .filter(graft.expressions.NormalizeExpressions
          .withinEdit1(col("s_a"), col("s_b")))
        .select(col("s_a"), col("s_b"), col("cn_a"), col("cn_b")).distinct()
        .agg(coalesce(sum(col("cn_a") * col("cn_b")), lit(0L)).as("d1m"))
      val d0 = cls.agg(count(lit(1)).as("n_classes"),
        (sum(col("cn") * (col("cn") - 1)) / 2).cast("long").as("n_pairs_d0"))
      // one-row result: materialize, then free the class checkpoint
      val out = d0.crossJoin(d1)
        .select(col("n_classes"), col("n_pairs_d0"),
          col("d1m").cast("long").as("n_pairs_d1"))
        .localCheckpoint()
      cls.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = false))
      out
    })
  )

  val oracles: Map[String, String] = Map(
    "q_project" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders",
    "q_incremental_range_scan" ->
      """SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'""",
    "q_filter_like_in" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
         WHERE p_type LIKE 'S%' AND p_name NOT LIKE 'blue%'
           AND p_brand IN ('Brand#1','Brand#2','Brand#3') AND p_type <> 'STANDARD'""",
    "q_semi_join_allowlist" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 5)""",
    "q_count" ->
      "SELECT count(*) AS n_rows FROM lineitem",
    "q_sort_limit" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_max_partition" ->
      "SELECT max(strftime(o_orderdate, '%Y%m%d')) AS max_ds FROM orders",
    "q_join_inner_multi" ->
      """SELECT o_orderkey, c_custkey, n_name, r_name, o_totalprice
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name IN ('ASIA','EUROPE') AND o_orderstatus <> 'F' AND c_mktsegment LIKE 'B%'""",
    "q_pivot_full_join" ->
      """SELECT COALESCE(a.l_partkey, r.l_partkey) AS l_partkey,
                CAST(a.qty AS DOUBLE) AS qty_a,
                CAST(r.qty AS DOUBLE) AS qty_r,
                CAST(COALESCE(a.qty, 0) + COALESCE(r.qty, 0) AS DOUBLE) AS qty_total
         FROM (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
               FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey) a
         FULL OUTER JOIN
              (SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
               FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey) r
         ON a.l_partkey = r.l_partkey""",
    "q_cross_join" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation",
    "q_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "q_set_ops_all" ->
      """WITH cn AS (SELECT c_nationkey AS nationkey FROM customer),
            sn AS (SELECT s_nationkey AS nationkey FROM supplier),
            both_ops AS (
              SELECT nationkey, 'intersect_all' AS op FROM (SELECT * FROM cn INTERSECT ALL SELECT * FROM sn)
              UNION ALL
              SELECT nationkey, 'except_all' AS op FROM (SELECT * FROM cn EXCEPT ALL SELECT * FROM sn))
         SELECT op, nationkey, count(*) AS n FROM both_ops GROUP BY op, nationkey""",
    "q_sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
         FROM orders
         WHERE CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8) AS BIGINT) % 10 = 0""",
    "q_group_sample" ->
      """SELECT o_orderpriority, o_orderkey FROM
           (SELECT o_orderpriority, o_orderkey,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
            FROM orders)
         WHERE rn <= 5""",
    "q_not_in_null" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN (
           SELECT CASE WHEN o_orderkey = 7 THEN NULL ELSE o_custkey END AS k
           FROM orders
           WHERE o_orderkey < 500
             AND CASE WHEN o_orderkey = 7 THEN NULL ELSE o_custkey END IS NOT NULL)""",
    "q_null_safe_join" ->
      """SELECT o_orderkey, k, c_name
         FROM (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS k
               FROM orders WHERE o_orderkey < 300) l
         JOIN (SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_custkey END AS rk, c_name
               FROM customer WHERE c_custkey < 50) r
           ON l.k IS NOT DISTINCT FROM r.rk""",
    "q_union_by_name" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 300
         UNION ALL
         SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 600""",
    "q_set_ops" ->
      """SELECT nationkey, 'union' AS op FROM
           (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT nationkey, 'intersect' AS op FROM
           (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
         UNION ALL
         SELECT nationkey, 'except' AS op FROM
           (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)""",
    "q_fuzzy_join_d1" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
                a.c_name AS s_a, b.c_name AS s_b,
                levenshtein(a.c_name, b.c_name) AS dist
         FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
         WHERE levenshtein(a.c_name, b.c_name) <= 1""",
    "q_fuzzy_join_d1_mass" ->
      """WITH cls AS (SELECT c_name AS s, count(*) AS cn FROM customer
                      WHERE c_name IS NOT NULL GROUP BY 1),
          d1 AS (SELECT CAST(COALESCE(sum(a.cn * b.cn), 0) AS BIGINT) AS m
                 FROM cls a JOIN cls b
                   ON a.s < b.s AND levenshtein(a.s, b.s) = 1)
         SELECT (SELECT count(*) FROM cls) AS n_classes,
                (SELECT CAST(sum(cn * (cn - 1)) // 2 AS BIGINT) FROM cls) AS n_pairs_d0,
                (SELECT m FROM d1) AS n_pairs_d1"""
  )
}
