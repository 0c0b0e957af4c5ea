package graft.queries

import graft.Tables
import graft.io.Bucketing
import graft.ops.{Scalars, Skew}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique queries whose RESULTS are identical to their naive
  * forms — the oracle states the plain query; the Spark side runs the
  * scale plan (salting, bucketing). This is the point: skew and
  * co-location tactics must be semantically invisible.
  */
object QScale {
  type Q = (SparkSession, String) => DataFrame

  private def manifestPath(dir: String): String =
    s"target/tmp/q_manifest_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"

  /** Run `body` with conf overrides, restoring previous values after.
    * Plans that depend on the overrides must be materialized INSIDE
    * `body` (optimization happens at action time, not declaration).
    */
  private[graft] def withConf[A](s: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(p)) => s.conf.set(k, p)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Untimed setup (see [[QIo.stages]]): the range-laid-out write +
    * sidecar manifest is staged before the query loop so the timed
    * query is the pruned READ the manifest exists to make fast.
    */
  val stages: Map[String, (SparkSession, String) => Unit] = Map(
    "q_manifest_skip" -> ((s, dir) => stageManifest(s, dir)),
    "q_zorder_skip" -> ((s, dir) => stageZorder(s, dir)))

  private def stageManifest(s: SparkSession, dir: String): Unit =
    graft.io.Manifest.writeWithManifest(
      Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity")),
      manifestPath(dir), "l_shipdate")

  private def zorderPath(dir: String): String =
    s"target/tmp/q_zorder_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"

  private def stageZorder(s: SparkSession, dir: String): Unit = {
    val li = Tables(s, dir).lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    graft.io.Manifest.writeWithManifestKeyed(
      Scalars.zorderKey(li, "l_orderkey", "l_partkey"),
      zorderPath(dir), Seq("l_orderkey", "l_partkey"),
      layoutCol = "zkey", numFiles = 16)
  }

  val queries: Map[String, Q] = Map(
    // Salted skew join: lineitem's hottest key pattern (l_partkey) vs
    // the part dim, salted 8 ways; aggregated result == plain join.
    "q_skew_join_salted" -> ((s, dir) => {
      val t = Tables(s, dir)
      Skew.saltedJoin(
        t.lineitem.select(col("l_partkey"), Scalars.dec(col("l_quantity")).as("qty")),
        t.part.select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey", buckets = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).cast("double").as("total_qty"))
    }),

    // Two-stage salted aggregation: partial per (key, salt), merge per
    // key — result identical to the plain groupBy (the oracle).
    "q_skew_agg_twostage" -> ((s, dir) => {
      val t = Tables(s, dir)
      Skew.saltedAgg(
        t.lineitem.select(col("l_returnflag"), Scalars.dec(col("l_quantity")).as("qty")),
        "l_returnflag", buckets = 8,
        partials = Seq(count(lit(1)).as("pn"), sum(col("qty")).as("pq")),
        merges = Seq(sum(col("pn")).as("n_items"),
          sum(col("pq")).cast("double").as("total_qty")))
    }),

    // Bucketed co-located fact-fact join: lineitem and orders bucketed
    // by orderkey into catalog tables, joined shuffle-free, aggregated.
    "q_bucketed_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
      val lt = s"bkt_lineitem_$suffix"; val ot = s"bkt_orders_$suffix"
      Bucketing.writeBucketed(
        t.lineitem.select(col("l_orderkey"), Scalars.dec(col("l_quantity")).as("qty")),
        lt, "l_orderkey", 8)
      Bucketing.writeBucketed(
        t.orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        ot, "l_orderkey", 8)
      Bucketing.bucketedJoin(s, lt, ot, "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).cast("double").as("total_qty"))
    }),

    // Native two-phase top-k per group (graft.plans.TopKPerGroup via
    // injectPlannerStrategy): partial bounded heaps cut each partition
    // to ≤k rows per group BEFORE the exchange, so the shuffle carries
    // k×groups-per-partition rows instead of the whole table — the
    // map-side-combine shape the window form can't plan. Result must
    // be identical to the plain row_number()<=k oracle.
    "q_topk_native" -> ((s, dir) => {
      graft.plans.NativeOps.topKPerGroup(
        Tables(s, dir).orders.select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
    }),

    // Z-order clustering key: min-max-normalize (l_partkey, l_suppkey)
    // to 8 bits each, then Morton-interleave, so a sort/range-partition
    // by zkey co-locates BOTH dimensions in every file — parquet
    // min/max stats then prune filters on either column. The key
    // itself is the checked output (integer-exact math).
    "q_zorder_key" -> ((s, dir) => {
      Scalars.zorderKey(Tables(s, dir).lineitem, "l_partkey", "l_suppkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("zkey"))
    }),

    // Runtime bloom-filter pushdown: the selective dim filter
    // (p_size < 5, ~8% of part) builds a bloom filter that Catalyst
    // injects as a bloom_filter_might_contain probe on lineitem's scan
    // side BEFORE the join shuffle — at 100 TB the ~92% of fact rows
    // that cannot match never cross the wire. Broadcast is disabled
    // inside the conf scope so the shuffle-join + bloom path is the
    // one exercised (a broadcast join would prune by other means), and
    // the plan is materialized eagerly (localCheckpoint) while the
    // confs are still active — the bloom decision happens at
    // optimization time. The groupBy output is ~25 brands, so the
    // checkpointed frame is tiny. PlanShapeSpec asserts the probe
    // appears in the executed plan; the oracle is the plain join.
    "q_runtime_bloom" -> ((s, dir) => withConf(s,
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val t = Tables(s, dir)
      t.lineitem.select(col("l_partkey"), Scalars.dec(col("l_quantity")).as("qty"))
        .join(t.part.filter(col("p_size") < 5)
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).cast("double").as("total_qty"))
        .localCheckpoint(true)
    }),

    // A-ext — manifest-driven FILE skipping: data written range-laid-out
    // by l_shipdate with a per-file [min,max] sidecar; the date-range
    // read consults the manifest and opens only overlapping files
    // (ScaleOpsSpec asserts the skip count). Result must equal the
    // plain filtered aggregate over the whole table.
    // A-ext — Z-ORDER 2-D file skipping: files laid out by the
    // interleaved-bits morton key, so BOTH l_orderkey and l_partkey
    // have tight per-file boxes in the multi-column manifest; a
    // conjunctive box predicate opens only box-overlapping files
    // (single-column range layout can never prune the second column).
    // ScaleOpsSpec asserts the candidate set is a strict subset; the
    // oracle is the plain 2-D filter.
    "q_zorder_skip" -> ((s, dir) => {
      val path = zorderPath(dir)
      // gate on the LAST artifact the stage writes (manifest commit marker)
      if (!new java.io.File(s"$path/manifest/_SUCCESS").exists()) stageZorder(s, dir)
      graft.io.Manifest.readPrunedBox(s, path, Seq(
          ("l_orderkey", lit(1000L), lit(3000L)),
          ("l_partkey", lit(100L), lit(400L))))
        .groupBy(col("l_partkey"))
        .agg(sum(Scalars.dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
    }),

    "q_manifest_skip" -> ((s, dir) => {
      val path = manifestPath(dir)
      if (!new java.io.File(s"$path/manifest/_SUCCESS").exists()) stageManifest(s, dir)
      graft.io.Manifest.readPruned(s, path, "l_shipdate",
        lit("1995-03-01").cast("timestamp_ntz"), lit("1995-06-30").cast("timestamp_ntz"))
        .groupBy(col("l_orderkey"))
        .agg(sum(Scalars.dec(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_items"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_skew_join_salted" ->
      """SELECT p_brand, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q_skew_agg_twostage" ->
      """SELECT l_returnflag, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem GROUP BY l_returnflag""",
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",
    "q_topk_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM
           (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders)
         WHERE rn <= 3""",
    "q_zorder_key" -> {
      val terms = (0 until 8).map { i =>
        s"((ba >> $i) & 1) * ${1L << (2 * i)} + ((bb >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""WITH st AS (SELECT CAST(MIN(l_partkey) AS BIGINT) AS mna, CAST(MAX(l_partkey) AS BIGINT) AS mxa,
                             CAST(MIN(l_suppkey) AS BIGINT) AS mnb, CAST(MAX(l_suppkey) AS BIGINT) AS mxb
                      FROM lineitem),
          bkt AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                         CAST(floor((l_partkey - mna) * 256.0 / (mxa - mna + 1.0)) AS BIGINT) AS ba,
                         CAST(floor((l_suppkey - mnb) * 256.0 / (mxb - mnb + 1.0)) AS BIGINT) AS bb
                  FROM lineitem, st)
          SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                 CAST($terms AS BIGINT) AS zkey
          FROM bkt"""
    },
    "q_runtime_bloom" ->
      """SELECT p_brand, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size < 5
         GROUP BY p_brand""",
    "q_zorder_skip" ->
      """SELECT l_partkey,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS n_items
         FROM lineitem
         WHERE l_orderkey BETWEEN 1000 AND 3000
           AND l_partkey BETWEEN 100 AND 400
         GROUP BY l_partkey""",
    "q_manifest_skip" ->
      """SELECT l_orderkey,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-03-01' AND l_shipdate <= TIMESTAMP '1995-06-30'
         GROUP BY l_orderkey"""
  )
}
