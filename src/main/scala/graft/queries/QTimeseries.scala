package graft.queries

import graft.Tables
import graft.ops.{Scalars, Timeseries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Demo queries + DuckDB oracles for SURVEY.md §2.I — batch-equivalent
  * forms of the streaming windows so the oracle applies; streaming twins
  * over the same plans live in [[graft.streaming]].
  *
  * Window starts are emitted as formatted strings; Spark's epoch-aligned
  * window origin and DuckDB's time_bucket origin (2000-01-01, itself a
  * 300 s multiple) produce identical 5-minute boundaries.
  */
object QTimeseries {
  type Q = (SparkSession, String) => DataFrame

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  val queries: Map[String, Q] = Map(
    // I1 — tumbling 5-minute counts + exact sums per event_type.
    "q_window_tumbling" -> ((s, dir) => {
      Timeseries.tumbling(Tables(s, dir).events, col("ts"), "5 minutes",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n"), sum(Scalars.dec(col("value"))).cast("double").as("total")))
        .select(date_format(col("window.start"), fmt).as("window_start"), col("event_type"), col("n"), col("total"))
    }),

    // I2 — sliding 10-minute window every 5 minutes.
    "q_window_sliding" -> ((s, dir) => {
      Timeseries.sliding(Tables(s, dir).events, col("ts"), "10 minutes", "5 minutes",
        Seq(col("event_type")),
        Seq(count(lit(1)).as("n")))
        .select(date_format(col("window.start"), fmt).as("window_start"), col("event_type"), col("n"))
    }),

    // I3 — 30-minute-gap session windows per user.
    "q_window_session" -> ((s, dir) => {
      Timeseries.sessionized(Tables(s, dir).events, col("ts"), "30 minutes",
        Seq(col("user_id")),
        Seq(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event")))
        .select(col("user_id"), date_format(col("session_window.start"), fmt).as("session_start"),
          col("n_events"), col("first_event"))
    }),

    // C5 — event-time range join (attribution): each click pairs with
    // the same user's purchases inside the following 15 minutes. The
    // equi-key (user_id) carries the shuffle; the time bound is a join
    // residual — the batch twin of [[graft.streaming.Streams.attributionJoin]],
    // whose watermarks turn the same bound into finite state.
    "q_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      clicks.join(buys,
          col("user_id") === col("b_user") &&
            col("purchase_ts") >= col("click_ts") &&
            col("purchase_ts") < col("click_ts") + expr("INTERVAL 15 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          date_format(col("click_ts"), fmt).as("click_ts"),
          date_format(col("purchase_ts"), fmt).as("purchase_ts"))
    }),

    // Keyless interval join, bin-accelerated: price-band lookup with
    // NO equi column — the naive inequality join is a nested loop;
    // binning turns it into an equi-join on the bin id plus an exact
    // containment filter. The oracle states the naive join.
    "q_interval_bin_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val bands = t.nation.select(col("n_nationkey").as("band_id"),
        (col("n_nationkey") * 2000).cast("double").as("lo"),
        ((col("n_nationkey") + 2) * 2000).cast("double").as("hi"))
      graft.ops.Relational.binnedRangeJoin(
          t.orders.select(col("o_orderkey"), col("o_totalprice")),
          "o_totalprice", bands, "lo", "hi", binWidth = 2000L)
        .select(col("o_orderkey"), col("o_totalprice"), col("band_id"))
    }),

    // I4 — watermark as a batch filter: rows within 1 h of max(ts).
    // Exact nanosecond arithmetic (no double epoch maths).
    "q_watermark_filter" -> ((s, dir) => {
      Timeseries.watermarkFilter(Tables(s, dir).events, col("ts_ns"), 3600L * 1000000000L)
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    // I-ext — per-user hourly gap-fill resample with linear
    // interpolation between neighboring observations (null outside the
    // observed span); duplicate-timestamp observations collapse by min.
    // Microsecond resolution: DuckDB timestamps truncate parquet NANOS
    // to µs, so the oracle-facing time axis is ts_ns div 1000.
    "q_resample_interp" -> ((s, dir) => {
      Timeseries.resampleInterpolate(
        Tables(s, dir).events
          .select(col("user_id"), expr("ts_ns div 1000").as("ts_us"), col("value")),
        "user_id", "ts_us", "value", stepNs = 3600L * 1000000L)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT strftime(time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, count(*) AS n,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM events GROUP BY 1, 2""",
    "q_window_sliding" ->
      """WITH buckets AS (
           SELECT event_type, time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) AS b FROM events
           UNION ALL
           SELECT event_type, time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL 5 MINUTE FROM events)
         SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, count(*) AS n
         FROM buckets GROUP BY 1, 2""",
    "q_window_session" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts,
                  CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL 30 MINUTE OR
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id, event_id, ts,
                  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
           FROM flagged)
         SELECT user_id,
                strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS session_start,
                count(*) AS n_events, min(event_id) AS first_event
         FROM sessions GROUP BY user_id, session_id""",
    "q_range_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
                strftime(CAST(c.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS click_ts,
                strftime(CAST(p.ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS purchase_ts
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 15 MINUTE
         WHERE c.event_type = 'click' AND p.event_type = 'purchase'""",
    "q_interval_bin_join" ->
      """SELECT o_orderkey, o_totalprice, n_nationkey AS band_id
         FROM orders JOIN nation
           ON o_totalprice >= n_nationkey * 2000
          AND o_totalprice < (n_nationkey + 2) * 2000""",
    "q_watermark_filter" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 1 HOUR""",
    "q_resample_interp" ->
      """WITH pts AS (SELECT user_id, epoch_us(ts) AS t, min(CAST(value AS DOUBLE)) AS v
                      FROM events GROUP BY user_id, epoch_us(ts)),
          b AS (SELECT user_id,
                       min(t) // 3600000000 +
                         CASE WHEN min(t) % 3600000000 = 0 THEN 0 ELSE 1 END AS k0,
                       max(t) // 3600000000 AS k1
                FROM pts GROUP BY user_id),
          grid AS (SELECT user_id, unnest(range(k0, k1 + 1)) * 3600000000 AS t
                   FROM b WHERE k0 <= k1),
          u AS (SELECT user_id, t, v, 0 AS is_grid FROM pts
                UNION ALL
                SELECT user_id, t, NULL, 1 FROM grid),
          w AS (SELECT user_id, t, is_grid,
                       last_value(v IGNORE NULLS) OVER
                         (PARTITION BY user_id ORDER BY t, is_grid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
                       last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                         (PARTITION BY user_id ORDER BY t, is_grid
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_t,
                       first_value(v IGNORE NULLS) OVER
                         (PARTITION BY user_id ORDER BY t, is_grid
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
                       first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
                         (PARTITION BY user_id ORDER BY t, is_grid
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_t
                FROM u)
          SELECT user_id, t,
                 CASE WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
                      WHEN next_t = prev_t THEN prev_v
                      ELSE prev_v + (next_v - prev_v)
                             * (CAST(t - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
                 END AS v_interp
          FROM w WHERE is_grid = 1"""
  )
}
