package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window operators — SURVEY.md §2.I. The reference approximates
  * streaming with wall-clock `while` loops over 5-min/1-h/1-day slices
  * (`Ingestion Data (XML).py:70-76`, `Ingestion Data (MySQL).py:122-127`,
  * `Processing Data.py:118-127`); the idiomatic engine form is Spark's
  * `window`/`session_window` functions, which work identically over
  * batch frames and Structured Streaming sources — the streaming twins
  * (readStream + watermark) live in [[graft.streaming]] and reuse these
  * exact plans.
  */
object Timeseries {

  /** I1 — tumbling window aggregate. One shuffle on (window, keys);
    * partial aggregation runs map-side before the exchange.
    */
  def tumbling(df: DataFrame, ts: Column, width: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** I2 — sliding window aggregate: each row lands in width/slide
    * windows; Spark expands rows with a generator before the aggregate.
    */
  def sliding(df: DataFrame, ts: Column, width: String, slide: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(ts, width, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** I3 — session window (gap-merged) per key. Batch semantics: events
    * whose gap is strictly less than `gap` merge into one session.
    */
  def sessionized(df: DataFrame, ts: Column, gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(ts, gap) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** I3-ext — per-EVENT session assignment: unlike [[sessionized]]
    * (which aggregates away the rows), every event keeps a 1-based
    * `session_idx` within its key, where a gap strictly greater than
    * `gap` (same units as `timeKey`) opens a new session. The classic
    * lag-flag + running-sum shape: ONE shuffle on the key, both
    * windows share the (key, timeKey, tieBreak) sort. `(timeKey,
    * tieBreak)` must totally order each key's events (ties would make
    * the running sum nondeterministic).
    */
  def sessionize(df: DataFrame, key: Column, timeKey: Column,
      tieBreak: Column, gap: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(timeKey, tieBreak)
    val prev = lag(timeKey, 1).over(w)
    val opens = when(prev.isNull || timeKey - prev > gap, lit(1)).otherwise(lit(0))
    df.withColumn("session_idx",
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** I-ext — gaps-and-islands INTERVAL MERGE: coalesce each key's
    * overlapping-or-touching `[start, end]` intervals into islands,
    * assigning every row its 1-based `island` index. Unlike
    * [[sessionize]] (points + gap), intervals have individual lengths,
    * so "does this row start a new island" needs the RUNNING MAX of
    * all previous ends — a long interval can bridge rows whose own
    * predecessors ended earlier. One shuffle on the key; the running
    * max and running sum share the (key, start, tieBreak) sort.
    * `(start, tieBreak)` must totally order each key's rows.
    */
  def mergeIntervals(df: DataFrame, key: Column, start: Column, end: Column,
      tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(start, tieBreak)
    val prevMaxEnd = max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMaxEnd.isNull || start > prevMaxEnd, lit(1)).otherwise(lit(0))
    df.withColumn("island",
      sum(opens).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** I4 — batch form of a watermark: keep rows within `lateness` of the
    * frame's max timestamp. The max is a broadcast one-row aggregate —
    * no shuffle of the fact side; at scale this is a scan + a scalar.
    * (Streaming twin: `withWatermark` in [[graft.streaming]].)
    */
  def watermarkFilter(df: DataFrame, tsNs: Column, latenessNs: Long): DataFrame = {
    val maxTs = df.agg(max(tsNs).as("__max_ts"))
    df.crossJoin(broadcast(maxTs))
      .filter(tsNs >= col("__max_ts") - lit(latenessNs))
      .drop("__max_ts")
  }

  /** I-ext — gap-fill RESAMPLING with linear interpolation: project an
    * irregular per-key series onto a fixed `stepNs` grid, each grid
    * point linearly interpolated between its neighboring observations
    * (null outside the observed range — extrapolation is a policy, not
    * a default). The telemetry-prep op the reference's 5-min wall-clock
    * loops approximate by polling.
    *
    * Scale shape: one groupBy for per-(key, t) point collapse (min
    * tie-break — deterministic under duplicate timestamps), one tiny
    * per-key bounds aggregate whose grid EXPLODES from a sequence
    * (rows ≈ span/step per key, no driver loop), and two windows over
    * (key, t) — everything shuffles on the series key once. All grid
    * arithmetic is exact LONG math (`div`; ts_ns exceeds double's 2^53
    * integer range, so floor(x / step) would corrupt the grid).
    */
  def resampleInterpolate(df: DataFrame, keyCol: String, tNsCol: String,
      vCol: String, stepNs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = df.groupBy(col(keyCol), col(tNsCol).as("t"))
      .agg(min(col(vCol).cast("double")).as("v"))
    val step = lit(stepNs)
    val kMin = expr(s"min(t) div ${stepNs}L") +
      when(expr(s"min(t) % ${stepNs}L") === 0, 0).otherwise(1)
    val kMax = expr(s"max(t) div ${stepNs}L")
    val grid = pts.groupBy(col(keyCol)).agg(kMin.as("k0"), kMax.as("k1"))
      .select(col(keyCol),
        explode(when(col("k0") <= col("k1"), sequence(col("k0"), col("k1")))
          .otherwise(array())).as("k"))
      .select(col(keyCol), (col("k") * step).as("t"),
        lit(null).cast("double").as("v"), lit(1).as("is_grid"))
    val u = pts.withColumn("is_grid", lit(0)).unionByName(grid)
    val ord = Window.partitionBy(col(keyCol)).orderBy(col("t"), col("is_grid"))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val after = ord.rowsBetween(1, Window.unboundedFollowing)
    val obsT = when(col("v").isNotNull, col("t"))
    val interp = u
      .withColumn("prev_v", last(col("v"), ignoreNulls = true).over(before))
      .withColumn("prev_t", last(obsT, ignoreNulls = true).over(before))
      .withColumn("next_v", first(col("v"), ignoreNulls = true).over(after))
      .withColumn("next_t", first(obsT, ignoreNulls = true).over(after))
      .filter(col("is_grid") === 1)
    interp.select(col(keyCol), col("t"),
      when(col("prev_v").isNull || col("next_v").isNull, lit(null).cast("double"))
        .when(col("next_t") === col("prev_t"), col("prev_v"))
        .otherwise(col("prev_v") + (col("next_v") - col("prev_v")) *
          ((col("t") - col("prev_t")).cast("double") /
            (col("next_t") - col("prev_t")).cast("double")))
        .as("v_interp"))
  }

  /** Lag-k autocorrelation (ACF) per series — the seasonality / drift
    * diagnostic: r_k = Σ_t (x_t − μ)(x_{t−k} − μ) / Σ_t (x_t − μ)²
    * for k = 1..`maxLag`, with the FULL-series mean and variance
    * (the standard estimator). Lags are ARITHMETIC on the time axis
    * (`ordCol` difference == k), not row adjacency: a missing bucket
    * drops its pairs identically in both engines, instead of silently
    * shifting a row-based `lag` window across the gap.
    *
    * Scale shape: ONE equi-join on the series key with a bounded
    * time-difference predicate replaces maxLag constant-offset window
    * passes; group width is series length — the bounded-series
    * contract of the Theil–Sen/basket-lift family, enforced by the
    * caller via [[Guard.maxGroupWidth]].
    *
    * Exactness: everything aggregates as INTEGER power sums (Σx, Σx²,
    * Σx_t·x_{t−k}, Σ(x_t+x_{t−k}), pair counts — requires an integral
    * `valCol`), which are order-independent with no rounding at all;
    * the mean-centered form is recovered algebraically at the END in
    * one fixed double expression tree (König-Huygens expansion), so
    * both engines emit bit-identical doubles. Centering per row
    * BEFORE summation (the naive form) rounds (x−μ) products per term
    * and hash-diverges in the last ulp.
    */
  def acf(series: DataFrame, keyCol: String, ordCol: String, valCol: String,
      maxLag: Int): DataFrame = {
    val st = series.groupBy(col(keyCol)).agg(
      sum(col(valCol)).as("s"), count(lit(1)).as("cnt"),
      sum(col(valCol) * col(valCol)).as("sxx2"))
    val x = series.select(col(keyCol), col(ordCol).as("t"),
      col(valCol).as("xv"))
    val y = series.select(col(keyCol).as("__k"), col(ordCol).as("tl"),
      col(valCol).as("xl"))
    val pairs = x.join(y,
        x(keyCol) === y("__k") &&
          (col("t") - col("tl")) >= 1 && (col("t") - col("tl")) <= maxLag)
      .groupBy(col(keyCol), (col("t") - col("tl")).as("lag"))
      .agg(sum(col("xv") * col("xl")).as("sxy"),
        sum(col("xv") + col("xl")).as("sp"),
        count(lit(1)).as("np"))
    pairs.join(st, Seq(keyCol))
      .withColumn("mu", col("s").cast("double") / col("cnt").cast("double"))
      .select(col(keyCol), col("lag").cast("bigint").as("lag"),
        ((col("sxy").cast("double") - col("mu") * col("sp").cast("double") +
            col("np").cast("double") * col("mu") * col("mu")) /
          (col("sxx2").cast("double") -
            col("cnt").cast("double") * col("mu") * col("mu"))).as("acf"))
  }
}
