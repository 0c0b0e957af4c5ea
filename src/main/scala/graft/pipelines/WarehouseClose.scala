package graft.pipelines

import graft.ops.Warehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The daily warehouse close, composed end to end from the
  * individually-verified operators — the batch the reference's
  * day-sliced ingestion loops (`Ingestion Data (MySQL).py:122-127`,
  * `Processing Data.py:118-127`) exist to feed:
  *
  *   1. incremental SCD2 maintenance ([[Warehouse.scd2Apply]] over the
  *      prior history's open runs + today's events — never a rescan of
  *      the closed runs; invariant apply(build(past), today) ==
  *      build(all), oracle-proven by `q_scd2_incremental`)
  *   2. today's funnel conversion ([[Warehouse.funnelStages]], one
  *      (user, time) exchange shared by all stage windows)
  *   3. reconciliation of the per-user activity dimension
  *      ([[Warehouse.snapshotDiff]] of yesterday's vs today's rollup —
  *      only (key, digest) pairs cross the wire)
  *
  * Output: one row per known user — current state + version, today's
  * funnel stage (0 when inactive), and the reconciliation status
  * (`added` / `changed` / `same`). Every stage is deterministic, so
  * the whole close is oracle-checkable.
  *
  * `hist` and `today` must carry (user_id, t, event_type, event_id,
  * vc); each is scanned by two stages — at 100 TB persist the day's
  * slice (the reference's ds-partition landing) rather than recompute.
  */
object WarehouseClose {

  def run(hist: DataFrame, today: DataFrame): DataFrame = {
    // (t, event_id) order everywhere a window orders by time: µs-
    // truncated timestamps CAN tie within a user (two same-µs events
    // with different types), and without the event_id tie-break the run
    // collapse — hence state and version — is nondeterministic and can
    // diverge from the deterministic (t, event_id)-ordered oracle.
    val current = Warehouse.scd2Build(
        hist.select(col("user_id"), col("t"), col("event_type"), col("event_id")),
        col("user_id"), Seq(col("t"), col("event_id")), col("event_type"), col("t"))
      .select(col("user_id"), col("event_type"), col("version"),
        col("effective_from"), col("effective_to"), col("is_current"))
    val state = Warehouse.scd2Apply(current,
        today.select(col("user_id"), col("t"), col("event_type"), col("event_id")),
        "user_id", "t", "event_type", tieBreak = Seq("event_id"))
      .filter(col("is_current"))
      .select(col("user_id"), col("event_type").as("state"),
        col("version").as("state_version"))
    val funnel = Warehouse.funnelStages(today, col("user_id"), col("t"),
        col("event_type"), Seq("view", "click", "purchase"),
        Seq(col("event_id")))
      .select(col("user").as("user_id"), col("stage").as("today_stage"))
    def dim(df: DataFrame) = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("vc")).as("value_c"))
    val diff = Warehouse.snapshotDiff(dim(hist), dim(hist.unionByName(today)),
      "user_id", Seq(col("n_events"), col("value_c")))
    state
      .join(funnel, Seq("user_id"), "left")
      .join(diff, Seq("user_id"), "left")
      .select(col("user_id"), col("state"), col("state_version"),
        coalesce(col("today_stage"), lit(0)).as("today_stage"),
        coalesce(col("status"), lit("same")).as("change_status"))
  }
}
