package graft.queries

import graft.Tables
import graft.ops.{Aggregates, Scalars}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Demo queries + DuckDB oracles for SURVEY.md §2.E (aggregates) and
  * §2.F (window functions) — all north-star extensions; the reference
  * has zero aggregations (SURVEY §2.E).
  */
object QAggregates {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // E1 — TPC-H Q1-shaped multi-measure hash aggregate. Decimal-exact
    // sums (deterministic at any parallelism) cast back to double.
    "q_agg_pricing_summary" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      Aggregates.summarize(li, Seq("l_returnflag", "l_linestatus"), Seq(
        sum(Scalars.dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(Scalars.dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(Scalars.dec(col("l_extendedprice") * (lit(1) - col("l_discount")), 18, 6))
          .cast("double").as("sum_disc_price"),
        sum(Scalars.dec(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 18, 6))
          .cast("double").as("sum_charge"),
        (sum(Scalars.dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order")))
    }),

    // E2 — exact distinct count (HLL approx variant is bench-only: its
    // result is impl-defined, so no oracle; see q_agg_distinct_approx).
    "q_agg_distinct" -> ((s, dir) => {
      Tables(s, dir).lineitem.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    }),

    // E2 — HLL approximate distinct (the 100 TB path for cardinality:
    // fixed-size sketch, no shuffle of distinct values). Result is
    // impl-defined -> no oracle (rows-only check); the exact twin
    // q_agg_distinct is the correctness anchor.
    "q_agg_distinct_approx" -> ((s, dir) => {
      Tables(s, dir).lineitem.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
    }),

    // E2-ext — KMV (k-minimum-values) distinct sketch, the
    // oracle-checkable cousin of HLL: hash every key to a 52-bit md5
    // prefix, keep the k smallest DISTINCT hashes per group (bounded
    // heap, O(k) state), estimate distinct = (k-1)/h_k where h_k is
    // the k-th minimum normalized to [0,1). Every step is integer-exact
    // except one final IEEE division, so DuckDB reproduces the estimate
    // bit-for-bit — an estimator whose own math is under the oracle.
    "q_distinct_kmv" -> ((s, dir) => {
      val k = 256
      val h = Tables(s, dir).lineitem
        .select(col("l_returnflag"),
          conv(substring(md5(col("l_partkey").cast("string")), 1, 13), 16, 10)
            .cast("bigint").as("hb"))
        .distinct()
      h.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_hashes"),
          Aggregates.topKValues(-col("hb").cast("double"), k).as("tops"))
        .select(col("l_returnflag"), col("n_hashes"),
          when(col("n_hashes") < k, col("n_hashes").cast("double"))
            .otherwise(lit(((k - 1).toLong << 52).toDouble)
              / -element_at(col("tops"), k))
            .as("est_distinct"))
    }),

    // E3 — rollup with grouping-set id so null group keys are
    // distinguishable from genuine nulls on both sides.
    "q_agg_rollup" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(t.nation, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(Scalars.dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
    }),

    // E4 — deterministic dedup: survivor fixed by explicit tie-break,
    // not partition order (contrast dropDuplicates).
    "q_dedup" -> ((s, dir) => {
      // Tie-break must be a TOTAL order: the synthetic lineitem has
      // duplicate (l_orderkey, l_linenumber) pairs, so linenumber alone
      // leaves the survivor partition-order-dependent.
      Aggregates.dedupKeepFirst(Tables(s, dir).lineitem,
        Seq("l_orderkey"),
        Seq(col("l_linenumber").asc, col("l_partkey").asc, col("l_suppkey").asc, col("l_quantity").asc))
        .select("l_orderkey", "l_linenumber", "l_partkey")
    }),

    // F1 — ranking trio over a per-nation account-balance order.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables(s, dir).customer
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          row_number().over(w).cast("bigint").as("rn"),
          rank().over(w).cast("bigint").as("rk"),
          dense_rank().over(w).cast("bigint").as("drk"))
    }),

    // F2 — lag delta per user over event time (counter-delta shape: the
    // Zabbix counters of the reference's domain are cumulative).
    "q_window_lag_delta" -> ((s, dir) => {
      Aggregates.lagDelta(Tables(s, dir).events.select("user_id", "event_id", "ts", "value"),
        "user_id", Seq(col("ts").asc, col("event_id").asc), "value", "delta")
        .select("user_id", "event_id", "value", "delta")
    }),

    // F3 — moving frame aggregate; decimal-exact inside the frame so
    // Spark's recompute-per-frame and DuckDB's segment tree agree.
    "q_window_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc).rowsBetween(-2, 0)
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          sum(Scalars.dec(col("value"))).over(w).cast("double").as("moving_sum"),
          count(lit(1)).over(w).as("n_in_frame"))
    }),

    // F3 — RANGE frame (value-based, vs the row-based frame above):
    // 5-minute trailing sum keyed on epoch seconds; ties in the order
    // value share one frame, so tie order cannot matter.
    "q_window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("epoch_sec")).rangeBetween(-300, 0)
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          expr("ts_ns DIV 1000000000").as("epoch_sec"), col("value"))
        .select(col("user_id"), col("event_id"),
          sum(Scalars.dec(col("value"))).over(w).cast("double").as("trailing_5m"))
    }),

    // F4 — top-k per group via row_number filter.
    "q_topk_per_group" -> ((s, dir) => {
      Aggregates.topKPerGroup(Tables(s, dir).orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("bigint").as("rn"))
    }),

    // F2-ext — lag IGNORE NULLS: carry the last VALID reading across
    // gaps (error rows null out their value) — the gap-filling
    // primitive for sensor/counter streams.
    "q_window_ignore_nulls" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val validValue = when(col("event_type") === "error", lit(null))
        .otherwise(col("value"))
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          lag(validValue, 1, null, ignoreNulls = true).over(w).as("prev_valid_value"))
    }),

    // E-ext — bitwise aggregates: bit_xor is the standard
    // order-insensitive content checksum (and never overflows, unlike
    // sum under ANSI mode); bit_and/bit_or answer "bits common to /
    // present in any row" flag columns.
    "q_agg_bitwise" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          bit_xor(col("l_partkey")).as("xor_partkey"),
          bit_and(col("l_linenumber").cast("bigint")).as("and_linenumber"),
          bit_or(col("l_linenumber").cast("bigint")).as("or_linenumber"))
    }),

    // F3-ext — orderless window (whole-partition frame): attach the
    // group total to every row; ratio-to-total without a join back.
    "q_ratio_to_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
      Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          (Scalars.dec(col("l_quantity")).cast("double") /
            sum(Scalars.dec(col("l_quantity"))).over(w).cast("double")).as("qty_share"))
    }),

    // C2-ext — pivot with MULTIPLE aggregates per pivot value (sum and
    // count): one pass, suffixed output columns.
    "q_pivot_multi_agg" -> ((s, dir) => {
      val p = Tables(s, dir).lineitem
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(Scalars.dec(col("l_quantity"))).cast("double").as("qty"),
          count(lit(1)).as("n"))
      // absent (status, flag) combos: pivot yields null counts, the
      // conditional-agg oracle yields 0 — normalize explicitly
      p.select(col("l_linestatus"),
        col("A_qty").as("a_qty"), coalesce(col("A_n"), lit(0L)).as("a_n"),
        col("N_qty").as("n_qty"), coalesce(col("N_n"), lit(0L)).as("n_n"),
        col("R_qty").as("r_qty"), coalesce(col("R_n"), lit(0L)).as("r_n"))
    }),

    // H2/F4-at-scale — bounded-heap top-k values per group (udaf):
    // O(k) state per group vs the window form's full-group sort;
    // exploded to (group, rank, value) rows for the oracle.
    "q_agg_topk_values" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(Aggregates.topKValues(col("l_extendedprice"), 3).as("topk"))
        .select(col("l_returnflag"), posexplode(col("topk")).as(Seq("pos", "price")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("bigint").as("rank"), col("price"))
    }),

    // F3-ext — forward frame (current row to partition end): the
    // "remaining backlog" shape, the mirror of running totals.
    "q_window_remaining" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          sum(Scalars.dec(col("value"))).over(w).cast("double").as("remaining_value"),
          count(lit(1)).over(w).as("remaining_events"))
    }),

    // E-ext — numeric histogram by explicit bucket arithmetic
    // (floor(x / width) — portable where width_bucket dialects are
    // not): one aggregation, bucket count bounded by the value range.
    "q_histogram" -> ((s, dir) => {
      Tables(s, dir).orders
        .groupBy(floor(col("o_totalprice") / 50000.0).cast("bigint").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"))
    }),

    // F1-ext — relative-rank window functions: percent_rank and
    // cume_dist over a total tie-broken order (value then key) —
    // identical definitions in DuckDB, so the doubles match exactly.
    "q_window_relrank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables(s, dir).orders
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderpriority"), col("o_orderkey"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
    }),

    // E1-ext — statistical aggregates (variance/stddev/correlation)
    // from EXACT decimal power sums, not running-moment aggregates:
    // builtin stddev/corr accumulate doubles in partition order, so
    // their low bits differ run to run and engine to engine. Summing
    // decimals is exact at any parallelism; the closed-form moment
    // arithmetic then runs in doubles with the identical expression
    // tree on both engines — bit-stable. Measure choice matters: every
    // power sum's integer mantissa must stay under 2^53, because
    // DuckDB converts big decimals to double via int128 -> double ->
    // /10^scale (TWO roundings) while Spark rounds once — sums of
    // price^2 crossed 2^53 and diverged by an ulp, so the correlation
    // pairs quantity with discount (bounded magnitudes).
    "q_agg_stats" -> ((s, dir) => {
      val q = Scalars.dec(col("l_quantity"))
      val d = Scalars.dec(col("l_discount"))
      val g = Tables(s, dir).lineitem.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(q).as("s_q"), sum(q * q).as("s_qq"),
        sum(d).as("s_d"), sum(d * d).as("s_dd"),
        sum(q * d).as("s_qd"))
      val nd = col("n").cast("double")
      val sx = col("s_q").cast("double"); val sxx = col("s_qq").cast("double")
      val sy = col("s_d").cast("double"); val syy = col("s_dd").cast("double")
      val sxy = col("s_qd").cast("double")
      g.select(col("l_returnflag"), col("n"),
        ((nd * sxx - sx * sx) / (nd * (nd - lit(1.0)))).as("var_qty"),
        sqrt((nd * sxx - sx * sx) / (nd * (nd - lit(1.0)))).as("stddev_qty"),
        ((nd * sxy - sx * sy) /
          (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))).as("corr_qty_disc"))
    }),

    // E-ext — HIGHER central moments (skewness, excess kurtosis) from
    // exact integer power sums: quantities as exact cents-style
    // bigints, powers ≤ 6.3e14 stay in int64, sums carried in
    // DECIMAL(38,0) so every engine sees the identical exact value
    // before ONE double conversion; the moment formulas are written
    // with the same operation order on both sides, so the doubles
    // match bit-for-bit (the q_agg_stats recipe, one order higher).
    // Both statistics are scale-invariant, so the ×100 never rescales.
    "q_agg_moments" -> ((s, dir) => {
      val x = (Scalars.dec(col("l_quantity")) * 100).cast("bigint")
      val dec38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val g = Tables(s, dir).lineitem.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(dec38(x)).as("s1"), sum(dec38(x * x)).as("s2"),
        sum(dec38(x * x * x)).as("s3"), sum(dec38(x * x * x * x)).as("s4"))
      val nd = col("n").cast("double")
      val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
      val s3 = col("s3").cast("double"); val s4 = col("s4").cast("double")
      val mu = s1 / nd
      val m2 = s2 / nd - mu * mu
      val m3 = s3 / nd - lit(3.0) * mu * (s2 / nd) + lit(2.0) * mu * mu * mu
      val m4 = s4 / nd - lit(4.0) * mu * (s3 / nd) +
        lit(6.0) * mu * mu * (s2 / nd) - lit(3.0) * mu * mu * mu * mu
      g.select(col("l_returnflag"), col("n"),
        (m3 / (m2 * sqrt(m2))).as("skewness"),
        (m4 / (m2 * m2) - lit(3.0)).as("kurtosis_excess"))
    }),

    // E1-ext — incremental aggregate maintenance: history arrives as
    // three batches (by ship year), each contributes only its ALGEBRAIC
    // partial (sum/count/min/max), and the serving rollup is a re-merge
    // of stored states. The oracle is the one-shot aggregate over the
    // whole table — merged-partials == full-recompute is exactly the
    // property that lets a 100 TB daily rollup never rescan history.
    "q_incremental_agg" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"),
          Scalars.dec(col("l_quantity")).as("qty"))
      val partials = Seq(
        li.filter(year(col("l_shipdate")) <= 1994),
        li.filter(year(col("l_shipdate")) === 1995),
        li.filter(year(col("l_shipdate")) >= 1996))
        .map(b => Aggregates.algebraicPartial(b, Seq("l_returnflag", "l_linestatus"), "qty"))
        .reduce(_ unionByName _)
      Aggregates.mergePartials(partials, Seq("l_returnflag", "l_linestatus"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_val").cast("double").as("sum_qty"),
          col("n_val").as("n_qty"),
          col("min_val").cast("double").as("min_qty"),
          col("max_val").cast("double").as("max_qty"),
          (col("sum_val").cast("double") / col("n_val")).as("avg_qty"))
    }),

    // E2-ext — MERGEABLE distinct-count sketches (Apache DataSketches
    // HLL via Spark's hll_sketch_agg): one sketch per (flag, ship
    // year) "batch", unioned down to per-flag estimates — the
    // incremental-distinct analogue of q_incremental_agg (exact
    // distinct does not merge; sketches do). DataSketches hashes with
    // its internal murmur3, which DuckDB cannot replay, so THIS road
    // stays rows-only (merge==direct is asserted in ScaleOpsSpec);
    // the oracle-exact register-level twin is q_hll_registers below.
    "q_hll_mergeable" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_returnflag"), year(col("l_shipdate")).as("yr"), col("l_partkey"))
      li.groupBy(col("l_returnflag"), col("yr"))
        .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
        .groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_parts"),
          count(lit(1)).as("n_batches"))
    }),

    // E2-ext — ORACLE-EXACT mergeable HLL (the KMV determinism trick
    // ported to a register array): md5-derived 60-bit hashes split
    // into 64 buckets × 54-bit suffixes; register = max leading-zero
    // rank per bucket, built per (flag, year) batch then merged by
    // register-wise MAX (associative — merged == direct by
    // construction, which is the mergeability claim, and the oracle
    // recomputes it directly). The harmonic-mean estimate is an
    // integer 2^(56-reg) fixed-point sum cast to double in ONE
    // expression, so even the float step is bit-identical across
    // engines. No small-range linear-counting branch: per-flag
    // cardinality here is far above the 2.5·m correction bound, and
    // the raw-estimate formula is the cross-engine contract.
    "q_hll_registers" -> ((s, dir) => {
      val rho = withBucket(Tables(s, dir).lineitem)
      val perBatch = rho.groupBy(col("l_returnflag"), col("yr"), col("bucket"))
        .agg(max(col("rho")).as("reg"))
      val merged = perBatch.groupBy(col("l_returnflag"), col("bucket"))
        .agg(max(col("reg")).as("reg"))
      merged.groupBy(col("l_returnflag"))
        .agg(sum(expr("shiftleft(cast(1 as bigint), cast(56 - reg as int))")).as("sp"),
          count(lit(1)).as("n_buckets"))
        .select(col("l_returnflag"), col("n_buckets"),
          (lit(0.709) * lit(4096L) * lit(72057594037927936L) /
            (col("sp") + (lit(64L) - col("n_buckets")) * lit(72057594037927936L))
              .cast("double")).as("est_distinct"))
    })
  )

  /** (flag, year, bucket, rho) for the hand-rolled HLL: 15 md5 hex
    * chars = 60 bits; low 6 pick the bucket, rho = leading zeros of
    * the 54-bit remainder + 1 via `55 - length(bin(w))` — string-length
    * integer math that both engines evaluate identically.
    */
  private def withBucket(li: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    li.select(col("l_returnflag"), year(col("l_shipdate")).as("yr"),
        conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
          .cast("bigint").as("hb"))
      .withColumn("bucket", col("hb") % 64)
      .withColumn("w", expr("hb DIV 64"))
      .withColumn("rho",
        when(col("w") === 0, lit(55)).otherwise(lit(55) - length(bin(col("w")))))

  val oracles: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q_agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag""",
    "q_agg_rollup" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, c_mktsegment)""",
    "q_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM
           (SELECT l_orderkey, l_linenumber, l_partkey,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
            FROM lineitem)
         WHERE rn = 1""",
    "q_window_rank" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
                row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)""",
    "q_window_lag_delta" ->
      """SELECT user_id, event_id, value,
                value - lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS delta
         FROM events""",
    "q_window_moving_avg" ->
      """SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_sum,
                count(*) OVER w AS n_in_frame
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
    "q_window_range_frame" ->
      """SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                       (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                        RANGE BETWEEN 300 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_5m
         FROM events""",
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM
           (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders)
         WHERE rn <= 3""",
    "q_window_ignore_nulls" ->
      """SELECT user_id, event_id,
                lag(CASE WHEN event_type = 'error' THEN NULL ELSE value END, 1 IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_valid_value
         FROM events""",
    "q_agg_bitwise" ->
      """SELECT l_returnflag,
                bit_xor(l_partkey) AS xor_partkey,
                bit_and(CAST(l_linenumber AS BIGINT)) AS and_linenumber,
                bit_or(CAST(l_linenumber AS BIGINT)) AS or_linenumber
         FROM lineitem GROUP BY l_returnflag""",
    "q_ratio_to_total" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) /
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_returnflag) AS DOUBLE)
                  AS qty_share
         FROM lineitem""",
    "q_pivot_multi_agg" ->
      """SELECT l_linestatus,
                CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS a_qty,
                count(*) FILTER (WHERE l_returnflag = 'A') AS a_n,
                CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS n_qty,
                count(*) FILTER (WHERE l_returnflag = 'N') AS n_n,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS r_qty,
                count(*) FILTER (WHERE l_returnflag = 'R') AS r_n
         FROM lineitem GROUP BY l_linestatus""",
    "q_hll_registers" ->
      """WITH b AS (SELECT l_returnflag, year(l_shipdate) AS yr,
                  CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS hb
           FROM lineitem),
          r AS (SELECT l_returnflag, yr, hb % 64 AS bucket,
                  CASE WHEN hb // 64 = 0 THEN 55 ELSE 55 - length(bin(hb // 64)) END AS rho
           FROM b),
          pb AS (SELECT l_returnflag, yr, bucket, max(rho) AS reg FROM r GROUP BY 1, 2, 3),
          mg AS (SELECT l_returnflag, bucket, max(reg) AS reg FROM pb GROUP BY 1, 2),
          s AS (SELECT l_returnflag,
                  sum(CAST(1 AS BIGINT) << (56 - reg)) AS sp, count(*) AS nb
           FROM mg GROUP BY 1)
         SELECT l_returnflag, CAST(nb AS BIGINT) AS n_buckets,
                0.709 * 4096 * 72057594037927936 /
                  CAST(sp + (64 - nb) * 72057594037927936 AS DOUBLE) AS est_distinct
         FROM s""",
    "q_distinct_kmv" ->
      """WITH h AS (SELECT DISTINCT l_returnflag,
                           CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 13) AS BIGINT) AS hb
                    FROM lineitem),
          r AS (SELECT l_returnflag, hb,
                       row_number() OVER (PARTITION BY l_returnflag ORDER BY hb ASC) AS rn,
                       count(*) OVER (PARTITION BY l_returnflag) AS n_hashes
                FROM h)
         SELECT l_returnflag, n_hashes,
                CASE WHEN n_hashes < 256 THEN CAST(n_hashes AS DOUBLE)
                     ELSE CAST(255 * 4503599627370496 AS DOUBLE) / hb END AS est_distinct
         FROM r
         WHERE rn = 256 OR (n_hashes < 256 AND rn = 1)""",
    "q_agg_topk_values" ->
      """SELECT l_returnflag, CAST(rn AS BIGINT) AS rank, price
         FROM (SELECT l_returnflag, l_extendedprice AS price,
                      row_number() OVER (PARTITION BY l_returnflag
                                         ORDER BY l_extendedprice DESC) AS rn
               FROM lineitem)
         WHERE rn <= 3""",
    "q_window_remaining" ->
      """SELECT user_id, event_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS remaining_value,
                count(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS remaining_events
         FROM events""",
    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
                count(*) AS n, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
         FROM orders GROUP BY 1""",
    "q_window_relrank" ->
      """SELECT o_orderpriority, o_orderkey,
                percent_rank() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice ASC, o_orderkey ASC) AS pct_rank,
                cume_dist() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice ASC, o_orderkey ASC) AS cume
         FROM orders WHERE o_orderkey < 2000""",
    "q_agg_moments" ->
      """WITH b AS (SELECT l_returnflag,
                          CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
                   FROM lineitem),
          g AS (SELECT l_returnflag, count(*) AS n,
                       SUM(CAST(x AS DECIMAL(38,0))) AS s1,
                       SUM(CAST(x * x AS DECIMAL(38,0))) AS s2,
                       SUM(CAST(x * x * x AS DECIMAL(38,0))) AS s3,
                       SUM(CAST(x * x * x * x AS DECIMAL(38,0))) AS s4
                FROM b GROUP BY 1),
          d AS (SELECT l_returnflag, n,
                       CAST(n AS DOUBLE) AS nd,
                       CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
                       CAST(s3 AS DOUBLE) AS s3, CAST(s4 AS DOUBLE) AS s4
                FROM g),
          m AS (SELECT l_returnflag, n, nd, s1, s2, s3, s4,
                       s1 / nd AS mu FROM d),
          mm AS (SELECT l_returnflag, n, mu,
                        s2 / nd - mu * mu AS m2,
                        s3 / nd - 3.0 * mu * (s2 / nd) + 2.0 * mu * mu * mu AS m3,
                        s4 / nd - 4.0 * mu * (s3 / nd)
                          + 6.0 * mu * mu * (s2 / nd)
                          - 3.0 * mu * mu * mu * mu AS m4
                 FROM m)
          SELECT l_returnflag, n,
                 m3 / (m2 * sqrt(m2)) AS skewness,
                 m4 / (m2 * m2) - 3.0 AS kurtosis_excess
          FROM mm""",
    "q_agg_stats" ->
      """WITH g AS (
           SELECT l_returnflag, count(*) AS n,
                  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s_q,
                  SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS s_qq,
                  SUM(CAST(l_discount AS DECIMAL(18,2))) AS s_d,
                  SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS s_dd,
                  SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS s_qd
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                (CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var_qty,
                sqrt((CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS stddev_qty,
                (CAST(n AS DOUBLE) * CAST(s_qd AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_d AS DOUBLE))
                  / (sqrt(CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE) - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE) * CAST(s_dd AS DOUBLE) - CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE))) AS corr_qty_disc
         FROM g""",
    "q_incremental_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(l_quantity) AS n_qty,
                CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_qty,
                CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus"""
  )
}
