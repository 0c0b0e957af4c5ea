package graft.queries

import graft.Tables
import graft.ops.{Aggregates, Scalars}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Function-surface completion queries (SURVEY §2.D13/E3/F extensions):
  * cube, exact percentiles, ordered listagg, first/last/nth window
  * values, ntile/percent_rank/cume_dist, FILTER-style conditional
  * aggregates, date arithmetic, null-handling functions, array ops.
  */
/** Typed record for the Dataset[T] pipeline demo (must be top-level so
  * the Encoder derives outside the test/query closure).
  */
final case class OrderRec(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double)
final case class CustSpend(o_custkey: Long, n_open: Long, cents: Long)

object QExtras {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Typed Dataset[T] pipeline (SURVEY §1.1: Dataset where type safety
    // helps): case-class Encoder scan -> typed filter/map ->
    // groupByKey + mapGroups with integer-cent arithmetic. The lambdas
    // cost Encoder round-trips vs Catalyst expressions — the demo
    // documents the trade; columnar stays the default.
    "q_typed_agg" -> ((s, dir) => {
      import s.implicits._
      val ds = Tables(s, dir).orders
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .as[OrderRec]
      ds.filter(o => o.o_orderstatus == "O")
        .map(o => CustSpend(o.o_custkey, 1L, math.round(o.o_totalprice * 100)))
        .groupByKey(_.o_custkey)
        .mapGroups { (k, it) =>
          val rows = it.toSeq
          CustSpend(k, rows.size.toLong, rows.map(_.cents).sum)
        }
        .toDF()
        .select(col("o_custkey"), col("n_open"),
          (col("cents").cast("double") / 100.0).as("open_total"))
    }),

    // E3-ext — grouping_id: which grouping-set produced each row, as
    // a bitmask — the disambiguator reports need when NULL is both a
    // data value and a subtotal marker.
    "q_grouping_id" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(t.nation, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), grouping_id().cast("bigint").as("gid"))
    }),

    // D15-ext — array set operations over token arrays; results sorted
    // so element order (engine-specific) cannot matter.
    "q_array_set_ops" -> ((s, dir) => {
      val a = split(lit("the quick brown fox the"), " ")
      val b = split(col("o_orderpriority"), "-")
      Tables(s, dir).orders.filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          concat_ws(",", sort_array(array_intersect(a,
            array(lit("the"), lit("fox"), lit("dog"))))).as("inter"),
          concat_ws(",", sort_array(array_except(b, array(lit("LOW"))))).as("minus"),
          concat_ws(",", sort_array(array_distinct(array_union(b, array(lit("X")))))).as("uni"))
    }),

    // D-ext — date-series generation (sequence + explode): calendar
    // scaffolds for gap-free reporting joins.
    "q_date_series" -> ((s, dir) => {
      Tables(s, dir).orders
        .filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          explode(sequence(
            to_date(col("o_orderdate")),
            date_add(to_date(col("o_orderdate")), 3),
            expr("INTERVAL 1 DAY"))).as("d"))
        .select(col("o_orderkey"), date_format(col("d"), "yyyy-MM-dd").as("d"))
    }),

    // E3 — full cube (rollup's big sibling).
    "q_agg_cube" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(t.nation, col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(Scalars.dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
    }),

    // Exact interpolated percentiles (sort-based, deterministic).
    "q_percentile" -> ((s, dir) => {
      Tables(s, dir).lineitem.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"))
    }),

    // E-ext — the APPROXIMATE quantile road (`approx_percentile`,
    // Greenwald-Khanna sketch: bounded memory per group, mergeable
    // partials — the everyday percentile at 100 TB where exact
    // `percentile`'s buffer-everything OOMs). Sketch estimates differ
    // across engines, so the ORACLE-CHECKED output is the algorithm's
    // own CONTRACT: each estimate's rank must sit within ε·n (+1 tie
    // slack) of the target rank, verified engine-side against the
    // actual data by one rank-count pass (both-sided: count-below vs
    // the upper bound, count-at-or-below vs the lower). The oracle
    // states the contract verdicts as literal trues — any GK
    // regression or mis-merged partial flips a boolean and fails the
    // hash compare. Exact siblings: q_percentile (buffered),
    // q_mad_outliers / q_histogram_quantiles (frequency/bin roads).
    "q_approx_quantile" -> ((s, dir) => {
      val acc = 1000 // GK accuracy: eps = 1/acc
      val cents = Tables(s, dir).lineitem.select(col("l_returnflag"),
        (Scalars.dec(col("l_extendedprice")) * 100).cast("bigint").as("cents"))
      val est = cents.groupBy(col("l_returnflag"))
        .agg(expr(s"approx_percentile(cents, array(0.5d, 0.9d, 0.99d), $acc)")
          .as("est"))
        .select(col("l_returnflag"), col("est")(0).as("e50"),
          col("est")(1).as("e90"), col("est")(2).as("e99"))
      val ranked = cents.join(broadcast(est), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("cents") < col("e50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("cents") <= col("e50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("cents") < col("e90"), 1L).otherwise(0L)).as("lt90"),
          sum(when(col("cents") <= col("e90"), 1L).otherwise(0L)).as("le90"),
          sum(when(col("cents") < col("e99"), 1L).otherwise(0L)).as("lt99"),
          sum(when(col("cents") <= col("e99"), 1L).otherwise(0L)).as("le99"))
      def ok(lt: String, le: String, q: Double) = {
        val n = col("n").cast("double")
        val slack = n / lit(acc.toDouble) + lit(1.0)
        (col(lt).cast("double") <= lit(q) * n + slack) &&
          (col(le).cast("double") >= lit(q) * n - slack)
      }
      ranked.select(col("l_returnflag"), col("n"),
        ok("lt50", "le50", 0.5).as("p50_in_bounds"),
        ok("lt90", "le90", 0.9).as("p90_in_bounds"),
        ok("lt99", "le99", 0.99).as("p99_in_bounds"))
    }),

    // E-ext — exact WEIGHTED median: smallest price whose cumulative
    // quantity reaches half the group's total (lower weighted median —
    // a deterministic pick, no interpolation, no floats until the
    // final cents→currency cast). The cumulative weight uses a RANGE
    // frame over integer cents, so tied prices accumulate as one block
    // and the window is deterministic without a tie-break column.
    "q_weighted_median" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables(s, dir).lineitem.select(col("l_returnflag"),
        (Scalars.dec(col("l_extendedprice")) * 100).cast("bigint").as("cents"),
        col("l_quantity").cast("bigint").as("qty"))
      val wr = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wp = Window.partitionBy(col("l_returnflag"))
      li.withColumn("cum", sum(col("qty")).over(wr))
        .withColumn("tot", sum(col("qty")).over(wp))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("cents")).as("mc"))
        .select(col("l_returnflag"),
          (col("mc").cast("double") / 100.0d).as("w_median_price"))
    }),

    // Winsorization: clamp a measure into its group's [P05, P95] band
    // — the standard outlier treatment before aggregating noisy
    // telemetry or pricing data. One percentile aggregation broadcast
    // back over the fact scan; exact interpolated percentiles keep it
    // engine-identical.
    "q_winsorize" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem
      val bounds = li.groupBy(col("l_returnflag").as("rf"))
        .agg(expr("percentile(l_extendedprice, 0.05)").as("p05"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"))
      li.join(broadcast(bounds), col("l_returnflag") === col("rf"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          least(greatest(col("l_extendedprice"), col("p05")), col("p95"))
            .as("price_winsorized"))
    }),

    // Group-wise z-score standardization — the feature-prep twin of
    // winsorization: moments from exact decimal power sums (the
    // q_agg_stats recipe), broadcast back over the fact scan, per-row
    // double math identical in both engines.
    "q_zscore" -> ((s, dir) => {
      val q = Scalars.dec(col("l_quantity"))
      val g = Tables(s, dir).lineitem.groupBy(col("l_returnflag").as("rf"))
        .agg(count(lit(1)).as("n"), sum(q).as("s_q"), sum(q * q).as("s_qq"))
      val nd = col("n").cast("double")
      val sx = col("s_q").cast("double"); val sxx = col("s_qq").cast("double")
      val bounds = g.select(col("rf"), (sx / nd).as("mean_q"),
        sqrt((nd * sxx - sx * sx) / (nd * (nd - lit(1.0)))).as("sd_q"))
      Tables(s, dir).lineitem.join(broadcast(bounds), col("l_returnflag") === col("rf"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          ((col("l_quantity") - col("mean_q")) / col("sd_q")).as("z_qty"))
    }),

    // Robust (MAD-based) outlier counting per group. Medians are EXACT
    // but computed from value-frequency tables ([[Aggregates
    // .medianTimes2]]) — Spark's exact `percentile` buffers every group
    // value in aggregation memory (an executor OOM once a group holds
    // ~10^8 doubles at 100× scale); the frequency form's state scales
    // with DISTINCT cents, never rows. All math stays integer (prices
    // as cents, doubled medians, cross-multiplied 1.5× threshold:
    // dev > 1.5·mad ⟺ 4·dev2 > 3·mad22), so the DuckDB oracle replays
    // it bit-exactly.
    "q_mad_outliers" -> ((s, dir) => {
      // ONE lineitem scan + ONE row-level shuffle (r13, guide §2.3):
      // the raw rows collapse to a (flag, cents, cnt) value-frequency
      // table once; both medians AND the weighted outlier counts read
      // off it (the former shape re-scanned + re-shuffled lineitem for
      // each of med, mad, and the final agg — 3 corpus passes). The
      // three consumers share the single freq aggregation via Spark's
      // ReuseExchange (identical subtree under each), and its size is
      // DISTINCT cents per flag, never rows. Semantics unchanged:
      // summing cnt ≡ counting rows, and a weighted median over the
      // frequency table is the row-level median by definition.
      val cents = Tables(s, dir).lineitem.select(col("l_returnflag"),
        (Scalars.dec(col("l_extendedprice")) * 100).cast("bigint").as("cents"))
      val freq = cents.groupBy(col("l_returnflag"), col("cents"))
        .agg(count(lit(1)).as("cnt"))
      val med = Aggregates.medianTimes2Freq(freq, Seq("l_returnflag"),
        "cents", "cnt")
      val devFreq = freq.join(broadcast(med), Seq("l_returnflag"))
        .select(col("l_returnflag"),
          abs(col("cents") * 2 - col("med2")).as("dev2"), col("cnt"))
      val mad = Aggregates.medianTimes2Freq(devFreq, Seq("l_returnflag"),
        "dev2", "cnt", alias = "mad22")
      devFreq.join(broadcast(mad), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("cnt")).as("n_rows"),
          sum(when(col("dev2") * 4 > col("mad22") * 3, col("cnt")).otherwise(0L))
            .as("n_outliers"))
    }),

    // K-ANONYMITY audit over quasi-identifiers — the privacy gate a
    // training-data release runs next to PII redaction (q_pii_redact):
    // every (nation, segment) quasi-identifier group smaller than k=5
    // is re-identifiable and must be suppressed or generalized. One
    // hash aggregate; the flag is pure arithmetic, so the audit is
    // oracle-exact. At 100 TB this is a partial-aggregated groupBy on
    // the quasi-id key — no different from any rollup.
    "q_k_anonymity" -> ((s, dir) => {
      Tables(s, dir).customer
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          (col("n") >= 5L).as("meets_k"))
    }),

    // Row-level expectations: contract rules checked on the ingest
    // scan, violating rows ROUTED to a labeled quarantine (which rules
    // broke, not just that something did) instead of silently dropped.
    "q_expectations" -> ((s, dir) => {
      import graft.ops.Expectations.Rule
      graft.ops.Expectations.quarantine(
        Tables(s, dir).lineitem,
        Seq(
          Rule("qty_le_45", col("l_quantity") <= 45),
          Rule("disc_le_5pct", col("l_discount") <= 0.05),
          Rule("tax_lt_8pct", col("l_tax") < 0.08)))
        .select(col("l_orderkey"), col("l_linenumber"), col("violations"))
    }),

    // Ordered string aggregation (deterministic via WITHIN GROUP order).
    "q_listagg" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.nation.join(t.region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"))
    }),

    // F — first/last/nth window values over a full frame.
    "q_window_firstlast" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir).customer
        .select(col("c_custkey"), col("c_nationkey"),
          first(col("c_custkey")).over(w).as("richest"),
          last(col("c_custkey")).over(w).as("poorest"),
          nth_value(col("c_custkey"), 2).over(w).as("runner_up"))
    }),

    // F — distribution ranks: ntile / percent_rank / cume_dist,
    // PER PRIORITY GROUP (a global ORDER BY window is a single-task
    // funnel — Guard flags it; grouped ranks are the scale form).
    "q_window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
    }),

    // C2 inverse — unpivot/melt: wide metric columns back to long
    // (direction, value) rows; round-trips the engine's pivot.
    "q_unpivot" -> ((s, dir) => {
      val wide = Tables(s, dir).lineitem
        .groupBy(col("l_partkey"))
        .agg(sum(when(col("l_returnflag") === "A", Scalars.dec(col("l_quantity"))))
          .cast("double").as("qty_a"),
          sum(when(col("l_returnflag") === "R", Scalars.dec(col("l_quantity"))))
            .cast("double").as("qty_r"))
      wide.unpivot(Array(col("l_partkey")), Array(col("qty_a"), col("qty_r")),
        "flag", "qty")
        .filter(col("qty").isNotNull)
    }),

    // F2 twin — lead (lag is gate-checked separately).
    "q_window_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns").asc, col("event_id").asc)
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"),
          lead(col("event_id"), 1).over(w).as("next_event"),
          // microsecond granularity: DuckDB 1.0 reads TIMESTAMP(NANOS)
          // parquet as microsecond TIMESTAMP, so ns-level gaps can't be
          // compared cross-engine
          (lead(expr("ts_ns DIV 1000"), 1).over(w) - expr("ts_ns DIV 1000")).as("gap_us"))
    }),

    // E — FILTER-style conditional aggregation.
    "q_agg_conditional" -> ((s, dir) => {
      Tables(s, dir).orders.groupBy(col("o_orderpriority"))
        .agg(count_if(col("o_orderstatus") === "F").as("n_f"),
          count_if(col("o_totalprice") > 200000).as("n_big"),
          sum(when(col("o_orderstatus") === "O", Scalars.dec(col("o_totalprice")))
            .otherwise(lit(0))).cast("double").as("open_total"))
    }),

    // D — date arithmetic: diffs and shifts.
    "q_date_arith" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp_ntz")).cast("bigint").as("days_since"),
          date_format(col("o_orderdate") + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("due_date"),
          dayofweek(col("o_orderdate")).cast("bigint").as("dow"),
          quarter(col("o_orderdate")).cast("bigint").as("qtr"))
    }),

    // D — null-handling: nullif / coalesce / greatest / least.
    "q_null_funcs" -> ((s, dir) => {
      Tables(s, dir).orders
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("F")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("F")), lit("CLOSED")).as("status_display"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floored_price"),
          least(col("o_totalprice"), lit(100000.0)).as("capped_price"))
    }),

    // D15 — array ops over tokenized text (joined to strings for a
    // stable cross-engine compare).
    "q_array_ops" -> ((s, dir) => {
      val toks = array_distinct(split(col("text"), " "))
      Tables(s, dir).documents
        .select(col("doc_id"),
          size(toks).cast("bigint").as("n_distinct"),
          array_contains(toks, "the").as("has_the"),
          concat_ws(",", slice(sort_array(toks), 1, 3)).as("first3"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_mad_outliers" ->
      """WITH cents AS (SELECT l_returnflag,
                               CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                        FROM lineitem),
          m AS (SELECT l_returnflag, 2 * median(cents) AS med2
                FROM cents GROUP BY 1),
          d AS (SELECT c.l_returnflag, ABS(2 * c.cents - m.med2) AS dev2
                FROM cents c JOIN m USING (l_returnflag)),
          md AS (SELECT l_returnflag, 2 * median(dev2) AS mad22
                 FROM d GROUP BY 1)
          SELECT d.l_returnflag, count(*) AS n_rows,
                 CAST(SUM(CASE WHEN 4 * d.dev2 > 3 * md.mad22 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          FROM d JOIN md USING (l_returnflag)
          GROUP BY d.l_returnflag""",
    "q_expectations" ->
      """SELECT l_orderkey, l_linenumber,
                concat_ws(',',
                  CASE WHEN NOT (l_quantity <= 45) THEN 'qty_le_45' END,
                  CASE WHEN NOT (l_discount <= 0.05) THEN 'disc_le_5pct' END,
                  CASE WHEN NOT (l_tax < 0.08) THEN 'tax_lt_8pct' END) AS violations
         FROM lineitem
         WHERE NOT (l_quantity <= 45) OR NOT (l_discount <= 0.05) OR NOT (l_tax < 0.08)""",
    "q_grouping_id" ->
      """SELECT n_name, c_mktsegment, count(*) AS n,
                CAST(GROUPING(n_name, c_mktsegment) AS BIGINT) AS gid
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP (n_name, c_mktsegment)""",
    "q_array_set_ops" ->
      """SELECT o_orderkey,
                array_to_string(list_sort(list_intersect(string_split('the quick brown fox the', ' '),
                                                         ['the','fox','dog'])), ',') AS inter,
                array_to_string(list_sort(list_filter(string_split(o_orderpriority, '-'),
                                                      x -> x != 'LOW')), ',') AS minus,
                array_to_string(list_sort(list_distinct(list_concat(string_split(o_orderpriority, '-'),
                                                                    ['X']))), ',') AS uni
         FROM orders WHERE o_orderkey < 500""",
    "q_date_series" ->
      """SELECT o_orderkey, strftime(CAST(ds AS DATE), '%Y-%m-%d') AS d
         FROM (SELECT o_orderkey,
                      unnest(generate_series(CAST(o_orderdate AS DATE),
                                             CAST(o_orderdate AS DATE) + 3,
                                             INTERVAL 1 DAY)) AS ds
               FROM orders WHERE o_orderkey < 100)""",
    "q_typed_agg" ->
      """SELECT o_custkey, count(*) AS n_open,
                CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS open_total
         FROM orders WHERE o_orderstatus = 'O'
         GROUP BY o_custkey""",
    "q_agg_cube" ->
      """SELECT n_name, c_mktsegment, count(*) AS n_customers,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY CUBE (n_name, c_mktsegment)""",
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
                count(*) >= 5 AS meets_k
         FROM customer GROUP BY 1, 2""",
    "q_approx_quantile" ->
      """SELECT l_returnflag, count(*) AS n,
                true AS p50_in_bounds, true AS p90_in_bounds, true AS p99_in_bounds
         FROM lineitem GROUP BY l_returnflag""",
    "q_percentile" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.5) AS median_qty,
                quantile_cont(l_quantity, 0.9) AS p90_qty
         FROM lineitem GROUP BY l_returnflag""",
    "q_weighted_median" ->
      """WITH li AS (SELECT l_returnflag,
                           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
                           CAST(l_quantity AS BIGINT) AS qty
                    FROM lineitem),
          c AS (SELECT l_returnflag, cents,
                       CAST(sum(qty) OVER (PARTITION BY l_returnflag ORDER BY cents
                                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS cum,
                       CAST(sum(qty) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
                FROM li)
         SELECT l_returnflag, CAST(min(cents) AS DOUBLE) / 100.0 AS w_median_price
         FROM c WHERE cum * 2 >= tot GROUP BY l_returnflag""",
    "q_winsorize" ->
      """WITH b AS (SELECT l_returnflag AS rf,
                           quantile_cont(l_extendedprice, 0.05) AS p05,
                           quantile_cont(l_extendedprice, 0.95) AS p95
                    FROM lineitem GROUP BY l_returnflag)
         SELECT l_orderkey, l_linenumber, l_returnflag,
                least(greatest(l_extendedprice, p05), p95) AS price_winsorized
         FROM lineitem JOIN b ON l_returnflag = rf""",
    "q_zscore" ->
      """WITH g AS (SELECT l_returnflag AS rf, count(*) AS n,
                           SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s_q,
                           SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS s_qq
                    FROM lineitem GROUP BY l_returnflag),
          b AS (SELECT rf, CAST(s_q AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
                       sqrt((CAST(n AS DOUBLE) * CAST(s_qq AS DOUBLE)
                             - CAST(s_q AS DOUBLE) * CAST(s_q AS DOUBLE))
                         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd_q
                FROM g)
         SELECT l_orderkey, l_linenumber, l_returnflag,
                (l_quantity - mean_q) / sd_q AS z_qty
         FROM lineitem JOIN b ON l_returnflag = rf""",
    "q_listagg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q_window_firstlast" ->
      """SELECT c_custkey, c_nationkey,
                first_value(c_custkey) OVER w AS richest,
                last_value(c_custkey) OVER w AS poorest,
                nth_value(c_custkey, 2) OVER w AS runner_up
         FROM customer
         WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "q_window_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey ASC)""",
    "q_unpivot" ->
      """SELECT l_partkey, flag, qty FROM (
           SELECT l_partkey,
                  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
                  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
           FROM lineitem GROUP BY l_partkey)
         UNPIVOT (qty FOR flag IN (qty_a, qty_r))""",
    "q_window_lead" ->
      """SELECT user_id, event_id,
                lead(event_id) OVER w AS next_event,
                CAST(lead(tus) OVER w - tus AS BIGINT) AS gap_us
         FROM (SELECT user_id, event_id, ts, epoch_us(ts) AS tus FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""",
    "q_agg_conditional" ->
      """SELECT o_orderpriority,
                count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
                CAST(SUM(CASE WHEN o_orderstatus = 'O'
                              THEN CAST(o_totalprice AS DECIMAL(18,2))
                              ELSE 0 END) AS DOUBLE) AS open_total
         FROM orders GROUP BY o_orderpriority""",
    "q_date_arith" ->
      """SELECT o_orderkey,
                CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
                strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
                CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
                CAST(quarter(o_orderdate) AS BIGINT) AS qtr
         FROM orders""",
    "q_null_funcs" ->
      """SELECT o_orderkey,
                nullif(o_orderstatus, 'F') AS status_or_null,
                coalesce(nullif(o_orderstatus, 'F'), 'CLOSED') AS status_display,
                greatest(o_totalprice, 100000.0) AS floored_price,
                least(o_totalprice, 100000.0) AS capped_price
         FROM orders""",
    "q_array_ops" ->
      """SELECT doc_id,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
                list_contains(list_distinct(string_split(text, ' ')), 'the') AS has_the,
                array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3
         FROM documents"""
  )
}
