package graft

import graft.expressions.{StringSimilarity, StringSimilarityExpressions}
import graft.ops.Warehouse
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Unit tests for the warehouse-maintenance operators ([[graft.ops.Warehouse]])
  * and the string-similarity kernels on tiny crafted frames.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  test("Jaro-Winkler kernel matches the textbook values (DuckDB parity)") {
    def jw(a: String, b: String): Double =
      StringSimilarity.jaroWinkler(utf8(a), utf8(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333333) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    // boost threshold: common prefix but jaro <= 0.7 gets NO bonus
    assert(math.abs(jw("abcdwxyz", "abcdmnop") - 2.0 / 3.0) < 1e-12)
    assert(jw("aztttttt", "azxxxxxx") == 0.5)
  }

  test("Jaro-Winkler: odd mismatch count uses integer half-transpositions (DuckDB)") {
    import org.apache.spark.unsafe.types.UTF8String
    // matched sequences differ in 5 positions: floor(5/2)=2 half-
    // transpositions, NOT 2.5 — the sf0.1-caught divergence
    val got = graft.expressions.StringSimilarity.jaroWinkler(
      UTF8String.fromString("Customer#000001607"),
      UTF8String.fromString("Customer0#00011607"))
    assert(math.abs(got - 0.9542483660130718) < 1e-15)
  }

  test("char-entropy kernel: uniform, degenerate, and empty inputs") {
    def h(s: String): Double = StringSimilarity.charEntropy(utf8(s))
    assert(h("") == 0.0)
    assert(h("aaaa") == 0.0) // single symbol: zero bits
    assert(math.abs(h("abab") - 1.0) < 1e-12) // two equiprobable symbols
    assert(math.abs(h("abcd") - 2.0) < 1e-12) // four equiprobable symbols
    // non-ASCII falls back to the sorted-map path, same result shape
    assert(math.abs(h("αβαβ") - 1.0) < 1e-12)
  }

  test("kernels run inside whole-stage codegen (no interpreted fallback)") {
    // non-foldable input (literals would constant-fold to a LocalTableScan)
    val df = spark.range(1)
      .select(concat(lit("MARTH"), when(col("id") >= 0, "A")).as("a"),
        concat(lit("MARHT"), when(col("id") >= 0, "A")).as("b"))
      .select(StringSimilarityExpressions.jaroWinkler(col("a"), col("b")).as("jw"),
        StringSimilarityExpressions.charEntropy(col("a")).as("h"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_jaro_winkler"),
      s"kernel broke codegen:\n$plan")
    val row = df.head()
    assert(math.abs(row.getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(row.getDouble(1) > 2.0) // 6 distinct chars over 6
  }

  test("scd2Build collapses runs and stamps [from, to) + version + current") {
    val log = Seq(
      (1L, 1L, "bronze"), (1L, 2L, "bronze"), (1L, 3L, "silver"),
      (1L, 4L, "gold"), (1L, 5L, "gold"),
      (2L, 1L, "silver")).toDF("k", "t", "tier")
    val got = Warehouse.scd2Build(log, col("k"), Seq(col("t")), col("tier"), col("t"))
      .select("k", "tier", "version", "effective_from", "effective_to", "is_current")
      .as[(Long, String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (1L, "bronze", 1, 1L, Some(3L), false),
      (1L, "silver", 2, 3L, Some(4L), false),
      (1L, "gold", 3, 4L, None, true),
      (2L, "silver", 1, 1L, None, true)))
  }

  test("scd2Apply(build(past), future) == build(all), incl. boundary-run collapse") {
    // key 1: future's first value EQUALS the open run -> must extend,
    // not duplicate; key 2: plain new run; key 3: new key, no history.
    val all = Seq(
      (1L, 1L, "bronze"), (1L, 3L, "silver"), (1L, 6L, "silver"), (1L, 8L, "gold"),
      (2L, 2L, "bronze"), (2L, 7L, "silver"),
      (3L, 9L, "bronze")).toDF("k", "t", "tier")
    val past = all.filter(col("t") < 5)
    val future = all.filter(col("t") >= 5)
    val full = Warehouse.scd2Build(all, col("k"), Seq(col("t")), col("tier"), col("t"))
      .select("k", "tier", "version", "effective_from", "effective_to", "is_current")
    val current = Warehouse.scd2Build(past, col("k"), Seq(col("t")), col("tier"), col("t"))
      .select("k", "tier", "version", "effective_from", "effective_to", "is_current")
    val applied = Warehouse.scd2Apply(current, future, "k", "t", "tier")
    val a = applied.as[(Long, String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    val f = full.as[(Long, String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3))
    assert(a.toSeq == f.toSeq)
    // and the boundary silver run was extended, not split
    assert(a.count(r => r._1 == 1L && r._2 == "silver") == 1)
  }

  test("scd2 tie-break: same-time events collapse deterministically; apply invariant holds") {
    // two events in the SAME microsecond with different values: without
    // a tie-break the survivor (hence state + version) is partition-
    // order luck; with (t, seq) the order is total and deterministic.
    val all = Seq(
      (1L, 1L, 10L, "bronze"), (1L, 5L, 20L, "silver"), (1L, 5L, 21L, "gold"),
      (2L, 2L, 30L, "bronze"), (2L, 6L, 40L, "silver"))
      .toDF("k", "t", "seq", "tier")
    val full = Warehouse.scd2Build(all, col("k"),
        Seq(col("t"), col("seq")), col("tier"), col("t"))
      .select("k", "tier", "version", "effective_from", "effective_to", "is_current")
    val f = full.as[(Long, String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    // silver (seq 20) then gold (seq 21) — both at t=5, order fixed by seq
    assert(f.filter(_._1 == 1L).map(r => (r._2, r._3)) ==
      Seq(("bronze", 1), ("silver", 2), ("gold", 3)))
    // the apply road with the same tie-break reproduces build(all)
    val past = all.filter(col("t") < 5)
    val future = all.filter(col("t") >= 5)
    val current = Warehouse.scd2Build(past, col("k"),
        Seq(col("t"), col("seq")), col("tier"), col("t"))
      .select("k", "tier", "version", "effective_from", "effective_to", "is_current")
    val applied = Warehouse.scd2Apply(current, future, "k", "t", "tier",
        tieBreak = Seq("seq"))
      .as[(Long, String, Int, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(applied == f)
  }

  test("snapshotDiff classifies added/removed/changed and drops same") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val next = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val got = Warehouse.snapshotDiff(prev, next, "k", Seq(col("v")))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("applyChangelog: last change wins, D drops, I/U upsert, untouched pass through") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val log = Seq(
      (1L, "U", "a2", 1), (1L, "D", "x", 2),  // update then delete -> dropped
      (2L, "D", "x", 1), (2L, "U", "b2", 2),  // delete then update -> upserted
      (3L, "I", "c2", 1),                     // I on existing key behaves as U
      (5L, "I", "e", 1),                      // new key inserted
      (6L, "I", "f", 1), (6L, "D", "x", 2))   // inserted then deleted -> absent
      .toDF("k", "op", "v", "seq")
    val got = Warehouse.applyChangelog(snap, log, "k", "op", Seq(col("seq")), Seq("v"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, "b2"), (3L, "c2"), (4L, "d"), (5L, "e")))
  }

  test("dictEncode assigns dense codes in sorted-value order via broadcast") {
    val df = Seq("m", "z", "a", "m", "a").toDF("v")
    val got = Warehouse.dictEncode(df, "v", "code")
      .as[(String, Int)].collect().toSeq.sorted
    assert(got.distinct == Seq(("a", 0), ("m", 1), ("z", 2)))
    val plan = Warehouse.dictEncode(df, "v", "code")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dict join not broadcast:\n$plan")
  }

  test("funnelStages: deepest stage wins; order is strict (no same-event credit)") {
    val events = Seq(
      // user 1: full path view -> click -> purchase
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      // user 2: purchase BEFORE view/click chain completes -> stage 2
      (2L, 1L, "purchase"), (2L, 2L, "view"), (2L, 3L, "click"),
      // user 3: click only (no view first) -> stage 0
      (3L, 1L, "click"), (3L, 2L, "click"),
      // user 4: view only -> stage 1
      (4L, 9L, "view")).toDF("u", "t", "typ")
    val got = Warehouse.funnelStages(events, col("u"), col("t"), col("typ"),
        Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3), (2L, 2), (3L, 0), (4L, 1)))
  }

  test("retentionCohorts buckets by first-event week x offset") {
    val events = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-09 10:00:00"),
      (2L, "2024-01-02 10:00:00"),
      (3L, "2024-01-10 10:00:00")).toDF("u", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val got = Warehouse.retentionCohorts(events, col("u"), col("ts"))
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), // users 1,2 active in their cohort week
      ("2024-01-01", 1, 1L), // user 1 returns the next week
      ("2024-01-08", 0, 1L))) // user 3's cohort
  }

  test("funnelTimes exposes per-stage completion times for latency analysis") {
    val events = Seq(
      (1L, 10L, "view"), (1L, 25L, "click"), (1L, 100L, "purchase"),
      (2L, 5L, "view")).toDF("u", "t", "typ")
    val got = Warehouse.funnelTimes(events, col("u"), col("t"), col("typ"),
        Seq("view", "click", "purchase"))
      .select("user", "t0", "t1", "t2")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some(10L), Some(25L), Some(100L)),
      (2L, Some(5L), None, None)))
  }

  test("funnel plan carries ONE exchange for all window passes + the user agg") {
    val events = Seq((1L, 1L, "view")).toDF("u", "t", "typ")
    val plan = Warehouse.funnelStages(events, col("u"), col("t"), col("typ"),
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "BroadcastExchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"funnel should shuffle once on the user key:\n$plan")
  }
}
