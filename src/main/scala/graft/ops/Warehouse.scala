package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators the reference's ETL jobs imply but
  * hand-roll per day: dimension history (the `ds`-stamped append at
  * `Processing Data.py:215` is an SCD-0 overwrite-by-partition; SCD2
  * is the lossless variant), snapshot reconciliation (the re-ingest
  * truncate at `Ingestion Data (MySQL).py:143-146` assumes replacing a
  * partition is safe — a diff proves it), dictionary encoding, and the
  * funnel/retention event-analytics shapes a `ds`-partitioned event
  * store exists to answer.
  *
  * Scale notes per operator are on each method; all shapes shuffle at
  * most once per declared key and keep windows partitioned (repo Guard
  * lint: no empty-PARTITION-BY windows, no cartesians).
  */
object Warehouse {

  /** Slowly-changing-dimension type-2 history from a change-event log:
    * collapse consecutive runs of the same attribute value per key,
    * stamp each run with [effectiveFrom, effectiveTo) and a version
    * number, and flag the open run.
    *
    * Input must carry a total per-key order (`order`); `attr` is the
    * tracked attribute. One shuffle on `key`: both window passes and
    * the run-collapse filter share the same partitioning, so Catalyst
    * plans a single Exchange and reuses the sort.
    *
    * At 100 TB the state per task is one partition's rows (standard
    * window execution); no driver state, no cross-key traffic.
    */
  def scd2Build(df: DataFrame, key: Column, order: Seq[Column], attr: Column,
      effectiveAt: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val changes = df
      .withColumn("__prev", lag(attr, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= attr)
    val w2 = Window.partitionBy(key).orderBy(order: _*)
    changes
      .withColumn("version", row_number().over(w2))
      .withColumn("effective_from", effectiveAt)
      .withColumn("effective_to", lead(effectiveAt, 1).over(w2))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__prev")
  }

  /** Incrementally apply new change events to an existing SCD2 history
    * (the output shape of [[scd2Build]] with a single `time` order
    * column): closed runs are untouched; each key's open run is
    * replayed together with its new events through the same
    * run-collapse, so a leading new value equal to the open run's
    * value extends it instead of opening a duplicate run. Version
    * numbers continue from the open run's version.
    *
    * Precondition: every change's `time` is >= the open run's
    * `effective_from` for that key (append-only log, the reference's
    * ingestion contract). Invariant (oracle-checked by
    * `q_scd2_incremental`): apply(build(past), future) == build(all) —
    * the incremental path costs one shuffle over (open runs + new
    * events), not a rescan of the full history.
    *
    * `tieBreak` columns break (key, time) ordering ties — without one,
    * two same-microsecond events with different values make the run
    * collapse (and so versions/state) nondeterministic. The open run's
    * synthetic anchor row carries null tie-breaks, which Spark's
    * nulls-first ascending default sorts BEFORE any real same-time
    * change, so the anchor always wins its boundary tie and the
    * build/apply invariant is preserved for any log whose new events
    * arrive at `time` >= the open run's start (exact tie at the start
    * included).
    */
  def scd2Apply(current: DataFrame, changes: DataFrame, key: String,
      time: String, attr: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val outCols = Seq(col(key), col(attr), col("version"),
      col("effective_from"), col("effective_to"), col("is_current"))
    val open = current.filter(col("is_current"))
    val closed = current.filter(!col("is_current"))
    val voff = open.select(col(key), (col("version") - 1).as("__voff"))
    val tbTypes = tieBreak.map(c => c -> changes.schema(c).dataType)
    val openEv = open.select(col(key) +: col("effective_from").as(time) +: col(attr) +:
      tbTypes.map { case (c, t) => lit(null).cast(t).as(c) }: _*)
    val ordered = col(time) +: tieBreak.map(col)
    val tail = scd2Build(
        openEv.unionByName(changes.select(
          col(key) +: col(time) +: col(attr) +: tieBreak.map(col): _*)),
        col(key), ordered, col(attr), col(time))
      .join(voff, Seq(key), "left")
      .withColumn("version", (col("version") + coalesce(col("__voff"), lit(0))).cast("int"))
    closed.select(outCols: _*).unionByName(tail.select(outCols: _*))
  }

  /** Apply a CDC changelog to a keyed snapshot — the `MERGE INTO`
    * re-expression (Delta/Debezium change-feed shape). The log carries
    * (key, op ∈ I/U/D, payload, seq); only each key's LAST change by
    * `seq` decides final state: D drops the key (even if the same
    * batch inserted it earlier), I and U both upsert the payload
    * (idempotent MERGE: I on an existing key behaves as U). Keys the
    * log never mentions pass through unchanged.
    *
    * Shape for 100 TB: one window pass reduces the log to its last
    * change per key (one shuffle on `key`, log rows ship once), then a
    * single full-outer join on `key` against the snapshot — no
    * per-change rescans of the base table, which is how a naive
    * replay-each-batch loop dies at scale. `seq` must totally order
    * each key's changes or the surviving change is nondeterministic.
    */
  def applyChangelog(snapshot: DataFrame, log: DataFrame, key: String,
      opCol: String, seq: Seq[Column], payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(seq.map(_.desc): _*)
    val last = log
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(key) +: col(opCol).as("__op") +:
        payload.map(c => col(c).as(s"__new_$c")): _*)
    snapshot.join(last, Seq(key), "full_outer")
      .filter(coalesce(col("__op"), lit("KEEP")) =!= "D")
      .select(col(key) +: payload.map(c =>
        when(col("__op").isNotNull, col(s"__new_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Row-level diff of two snapshots of the same keyed table: `added`
    * (key only in `next`), `removed` (key only in `prev`), `changed`
    * (both sides, tracked columns differ). Unchanged rows are dropped.
    *
    * Tracked columns are compared via an md5 over a self-delimiting
    * canonical string so only (key, 32-byte digest) survives the
    * projection — at 100 TB the full-outer join on `key` ships digests,
    * not payload. One shuffle per side on `key`. Each field encodes as
    * `N` (null) or `V<len>:<value>` — unlike a plain `|`-join (which
    * skips NULLs and is delimiter-injectable, so (NULL,"A")/("A",NULL)
    * or ("a|b","c")/("a","b|c") would collide), no two distinct rows
    * share a canonical string, so a reconciliation can't silently
    * report a changed row as "same".
    */
  def snapshotDiff(prev: DataFrame, next: DataFrame, key: String,
      tracked: Seq[Column]): DataFrame = {
    def digest(df: DataFrame): DataFrame = {
      val canon = tracked.map { t =>
        val s = t.cast("string")
        when(s.isNull, lit("N"))
          .otherwise(concat(lit("V"), length(s).cast("string"), lit(":"), s))
      }
      df.select(col(key), md5(concat(canon: _*)).as("__h"))
    }
    val a = digest(prev).withColumnRenamed("__h", "__h_prev")
    val b = digest(next).withColumnRenamed("__h", "__h_next")
    a.join(b, Seq(key), "full_outer")
      .withColumn("status",
        when(col("__h_prev").isNull, lit("added"))
          .when(col("__h_next").isNull, lit("removed"))
          .when(col("__h_prev") =!= col("__h_next"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .select(col(key), col("status"))
  }

  /** Dictionary-encode a bounded-cardinality column to dense codes
    * (sorted-value order, 0-based). The dictionary is collected to the
    * driver — the documented contract is enum-ish columns (priorities,
    * segments, country codes) whose distinct set is driver-sized, the
    * same contract as the IVF centroid table ([[Similarity]]). The
    * encode join broadcasts the dictionary: zero shuffle on the fact
    * side at any scale. For unbounded keys use the banded window
    * pattern ([[Aggregates]] banded cumsum) instead — a global
    * dense_rank window would be the single-task bottleneck Guard
    * rejects. NULL values are excluded from the dictionary (a null
    * sort key would NPE the driver-side ordering) and survive the
    * left join with a null code — rows are never silently dropped.
    */
  def dictEncode(df: DataFrame, column: String, codeCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val values = df.select(col(column).cast("string"))
      .filter(col(column).isNotNull).distinct()
      .collect().map(_.getString(0)).sorted
    val dict = values.zipWithIndex.toSeq.toDF(column, codeCol)
    df.join(broadcast(dict), Seq(column), "left")
  }

  /** Ordered-funnel stage assignment: for each user the funnel stage
    * reached, where stage i requires an event of type `steps(i)`
    * strictly after the first qualifying event of stage i-1.
    *
    * Single window pass per step over the same (user-partitioned,
    * time-ordered) frame — one shuffle on `user` total, and the final
    * per-user aggregate reuses that partitioning. `(timeKey, tieBreak)`
    * together must totally order each user's events: the running
    * windows sort by them (two same-`timeKey` events would otherwise
    * make the window order — and so the result — nondeterministic),
    * while the "strictly after" comparison stays on `timeKey` values
    * alone.
    */
  def funnelStages(events: DataFrame, user: Column, timeKey: Column,
      typ: Column, steps: Seq[String], tieBreak: Seq[Column] = Nil): DataFrame =
    funnelTimes(events, user, timeKey, typ, steps, tieBreak)
      .select(col("user"), col("stage"))

  /** As [[funnelStages]] but keeps the per-stage completion times
    * (`t0..tN`, null when the stage was not reached) for conversion-
    * latency analysis.
    */
  def funnelTimes(events: DataFrame, user: Column, timeKey: Column,
      typ: Column, steps: Seq[String], tieBreak: Seq[Column] = Nil): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(user).orderBy(timeKey +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // __r(i): per row, the earliest time stage i was completed
    // considering events up to and including this row. Each step's
    // running column lives in its own projection (window expressions
    // cannot nest), but every window shares (user, timeKey) so the
    // plan carries ONE Exchange and reuses the sort.
    val withFirst = events.withColumn("__r0",
      min(when(typ === steps.head, timeKey)).over(w))
    val withReached = steps.tail.zipWithIndex.foldLeft(withFirst) {
      case (df, (step, i)) => df.withColumn(s"__r${i + 1}",
        min(when(typ === step && col(s"__r$i") < timeKey, timeKey)).over(w))
    }
    val stageCols = steps.indices.map(i => min(col(s"__r$i")).as(s"t$i"))
    val perUser = withReached
      .groupBy(user.as("user"))
      .agg(stageCols.head, stageCols.tail: _*)
    // fold ascending so the DEEPEST satisfied stage ends up outermost
    // in the nested when-chain (a stage-1 hit must not shadow stage 3)
    val stage = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t$i").isNotNull, lit(i + 1)).otherwise(acc)
    }
    perUser.withColumn("stage", stage)
  }

  /** K-ext — LAST-TOUCH attribution: each conversion row is credited
    * to the same key's most recent touch at-or-before it, provided the
    * touch is within `window` (same units as the time keys). Built on
    * the as-of backward join, so the cost is one (key)-shuffled sort of
    * |touches|+|conversions| — never the interval nested loop. Touches
    * must be unique per (key, time): pre-collapse ties (e.g. keep the
    * max touch id) or the carried touch is nondeterministic.
    *
    * Output: conversions columns + `touch_id`/`touch_t` (null when no
    * touch in-window — unattributed conversions are kept, the row set
    * is never filtered).
    */
  def lastTouchAttribution(conversions: DataFrame, touches: DataFrame,
      key: String, convTime: String, touchTime: String, touchId: String,
      window: Long): DataFrame =
    AsOf.asofBackward(conversions, touches, key, convTime, touchTime,
        Map(touchId -> "touch_id", touchTime -> "touch_t"))
      .withColumn("touch_id",
        when(col(convTime) - col("touch_t") < window, col("touch_id")))
      .withColumn("touch_t",
        when(col("touch_id").isNotNull, col("touch_t")))

  /** K-ext — POSITION-BASED (U-shaped) multi-touch attribution: every
    * touch in `(conv_t − window, conv_t]` for the conversion's key gets
    * credit — first and last touch 0.4 each, interior touches split the
    * remaining 0.2 evenly; a lone touch gets 1.0 and exactly two split
    * 0.5/0.5 (the standard degenerate cases). Credits per conversion
    * sum to 1 by construction.
    *
    * Shape: one equi-join on `key` with the range predicate as a
    * residual (keyed shuffle, never an interval nested loop — the
    * [[graft.ops.AsOf]] contract), then position/count windows
    * partitioned by the conversion id over the SAME key partitioning.
    * `(touchTime, touchId)` totally orders each window so the
    * first/last labels are deterministic under time ties.
    *
    * Output: (key, conversion id, touch_id, touch_t, weight) — one row
    * per credited touch; conversions with no in-window touch emit no
    * rows (unattributed spend is the caller's left-join).
    */
  def positionBasedAttribution(conversions: DataFrame, touches: DataFrame,
      key: String, convId: String, convTime: String, touchId: String,
      touchTime: String, window: Long): DataFrame = {
    val joined = conversions
      .select(col(key), col(convId), col(convTime))
      .join(touches.select(col(key).as("__tk"), col(touchId).as("touch_id"),
          col(touchTime).as("touch_t")),
        col(key) === col("__tk") &&
          col("touch_t") <= col(convTime) &&
          col("touch_t") > col(convTime) - window)
      .drop("__tk")
    val w = Window.partitionBy(col(key), col(convId))
    val byT = w.orderBy(col("touch_t"), col("touch_id"))
    joined
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__pos", row_number().over(byT))
      .withColumn("weight",
        when(col("__n") === 1, lit(1.0))
          .when(col("__n") === 2, lit(0.5))
          .when(col("__pos") === 1 || col("__pos") === col("__n"), lit(0.4))
          .otherwise(lit(0.2) / (col("__n") - 2).cast("double")))
      .drop("__n", "__pos")
  }

  /** K-ext — PRORATION by the largest-remainder method: allocate each
    * group's integer `amount` (e.g. cents) across its rows proportional
    * to `weight`, exactly — shares sum to the amount per group by
    * construction, with no float in sight. Base share is the integer
    * floor `amount * w div W`; the leftover `amount - sum(base)` cents
    * go one each to the rows with the largest remainders
    * (`amount * w mod W`, ties broken by `tieBreak` for determinism).
    *
    * Scale shape: everything is windows over ONE (group)-shuffled sort
    * — no self-join, no driver state; the group's weight sum, base sum,
    * and remainder rank all share the exchange. `amount` must be
    * constant within a group and `amount * weight` must fit a long.
    */
  def prorate(df: DataFrame, group: Column, amount: Column, weight: Column,
      tieBreak: Column): DataFrame = {
    val grp = Window.partitionBy(group)
    // `div`, not `/`: Column./ is double division in Spark and
    // amount*weight can exceed double's 2^53 integer range.
    val withParts = df
      .withColumn("__num", (amount * weight).cast("bigint"))
      .withColumn("__w", sum(weight).over(grp).cast("bigint"))
      .withColumn("__base", expr("__num div __w"))
      .withColumn("__rem", expr("__num % __w"))
    val byRem = Window.partitionBy(group).orderBy(col("__rem").desc, tieBreak)
    withParts
      .withColumn("__left", (amount - sum(col("__base")).over(grp)).cast("bigint"))
      .withColumn("__rn", row_number().over(byRem))
      .withColumn("share",
        col("__base") + when(col("__rn") <= col("__left"), 1L).otherwise(0L))
      .drop("__num", "__w", "__base", "__rem", "__left", "__rn")
  }

  /** Weekly retention cohorts: users bucketed by the week of their
    * first event; one output row per (cohort week, week offset) with
    * the distinct active users. Two shuffles: the per-user first-event
    * window, then the cohort-cell aggregate — both on declared keys,
    * no global funnel.
    */
  def retentionCohorts(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val w = Window.partitionBy(user)
    val withCohort = events
      .withColumn("__cohort", date_trunc("week", min(ts).over(w)))
      .withColumn("__week", date_trunc("week", ts))
      .withColumn("week_offset",
        (datediff(to_date(col("__week")), to_date(col("__cohort"))) / 7).cast("int"))
    withCohort
      .groupBy(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"))
      .agg(countDistinct(user).as("n_users"))
  }
}
