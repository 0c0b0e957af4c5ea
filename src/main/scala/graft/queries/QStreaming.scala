package graft.queries

import graft.Tables
import graft.streaming.{Streams, TypedEvent, UserEvent}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked demo queries for the STREAMING operators (SURVEY §2
  * K19/K26/I5). Each runs the real Structured Streaming twin over a
  * FILE-BACKED feed of the same parquet rows the oracle reads —
  * `stageFeedSlices` + `spark.readStream.parquet` with
  * `maxFilesPerTrigger=1`, one staged slice per micro-batch — and
  * returns the final materialized result, so the streaming semantics
  * themselves sit under the DuckDB compare instead of only under unit
  * tests. EVERY feed here is distributed: rows go executor → parquet
  * → executor and never transit driver memory, and the same reader
  * pointed at a log-landing directory is the production shape. Batch
  * boundaries are deterministic data properties (event-time quantile
  * cuts via [[timeSlices]] for the monotone-state and watermark
  * operators; id-parity splits where arrival order is irrelevant),
  * and each query's oracle either replays the same split or is
  * boundary-independent by the operator's semantics.
  */
object QStreaming {
  type Q = (SparkSession, String) => DataFrame

  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def rmrf(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmrf)
    f.delete(); ()
  }

  /** Run `body` with conf overrides, restoring previous values after. */
  private def withConf[A](s: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(p)) => s.conf.set(k, p)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Run `body` with the RocksDB state store (required by
    * `transformWithState`) and few shuffle partitions — per-partition
    * state-store setup repeats every (batch × stage), which dominates a
    * bounded MemoryStream feed; a real deployment sizes partitions to
    * stream volume instead.
    */
  private def withRocksDb[A](s: SparkSession)(body: => A): A =
    withConf(s,
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.shuffle.partitions" -> "8")(body)

  /** Stage `slices` as consecutive single-file parquet slices under a
    * fresh feed directory — slice i fully written before i+1, file
    * mtimes forced strictly increasing — so a file-stream reader with
    * `maxFilesPerTrigger=1` replays EXACTLY one slice per micro-batch,
    * in slice order. This is the DISTRIBUTED feed road: rows go
    * executor → parquet → executor and never transit driver memory
    * (the `collect()`→MemoryStream seam it replaces capped feeds at
    * driver heap). The `coalesce(1)` is feed-file staging only — the
    * pipeline READING the stream is fully distributed, and a real
    * deployment points the same reader at a log-landing directory.
    */
  /** Land ONE slice file into an existing feed directory (index `i`
    * orders it; mtimes forced so file-stream pickup order == index
    * order even across out-of-band later additions).
    */
  private def appendFeedSlice(base: java.io.File, df: DataFrame, i: Int,
      t0: Long): Unit = {
    val tmp = new java.io.File(base, s"_stage_$i")
    // SMALL ROW GROUPS (2 MB): each slice must stay ONE file (a slice
    // = a micro-batch under maxFilesPerTrigger=1), but a single-row-
    // group file caps the batch SCAN at one task — at sf10 the 28 MB
    // slice serialized the whole per-batch signature kernel onto one
    // core (the measured q_stream_ingest dominator: ~20 s/batch of a
    // ~65 s wall). Row-group-sized splits restore map-side
    // parallelism with no extra shuffle; readers pair this with a
    // small spark.sql.files.maxPartitionBytes.
    df.coalesce(1).write
      .option("parquet.block.size", (2L * 1024 * 1024).toString)
      .parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
    val dst = new java.io.File(base, f"slice-$i%05d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    dst.setLastModified(t0 + i * 60000L)
    rmrf(tmp)
  }

  /** Deterministic per-(feed, sf) directory so staged feeds can be
    * built ONCE in the untimed [[stages]] pass and reused by the timed
    * query body (the quarantine/sink staging contract: the demo's cost
    * is the streaming pipeline, not fixture construction).
    */
  private def feedDir(name: String, dir: String): java.io.File =
    new java.io.File(
      s"target/tmp/feed_${name}_${dir.replaceAll("[^A-Za-z0-9.]", "_")}")

  /** Slice builders keyed by feed name — the single source of truth
    * both the stages pass (force rebuild) and the query-body fallback
    * (build-if-missing, keeps dev runs self-contained) construct from.
    */
  private def buildFeed(s: SparkSession, name: String, dir: String,
      slices: Seq[DataFrame]): Unit = {
    val base = feedDir(name, dir)
    rmrf(base); base.mkdirs()
    val t0 = System.currentTimeMillis() - slices.size * 60000L
    slices.zipWithIndex.foreach { case (df, i) => appendFeedSlice(base, df, i, t0) }
  }

  /** Feed path + schema for a staged feed; builds it first if the
    * stages pass hasn't run (dev fallback).
    */
  private def feed(s: SparkSession, name: String, dir: String)(
      slices: => Seq[DataFrame]): (String, org.apache.spark.sql.types.StructType) = {
    val base = feedDir(name, dir)
    val staged = Option(base.listFiles())
      .exists(_.exists(_.getName.endsWith(".parquet")))
    if (!staged) buildFeed(s, name, dir, slices)
    (base.getAbsolutePath, s.read.parquet(base.getAbsolutePath).schema)
  }

  /** File-stream reader over a [[stageFeedSlices]] directory: one
    * staged slice per micro-batch, oldest first.
    */
  private def fileStream(s: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(dir)

  /** Split `df` (must carry `ts_ns`) into `n` event-time-CONTIGUOUS
    * slices at approximate quantile cuts — ties stay in one slice, so
    * delivery is time-ordered across batches (the monotone-state
    * processors' documented precondition); the exact cut values are
    * irrelevant to every converted query's result.
    */
  private def timeSlices(df: DataFrame, n: Int): Seq[DataFrame] = {
    val fracs = (1 until n).map(i => i.toDouble / n)
    val cuts = df
      .agg(expr(s"approx_percentile(ts_ns, array(${fracs.map(f => f + "d").mkString(",")}))"))
      .head().getSeq[Long](0)
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.filter(col("ts_ns") >= lo && col("ts_ns") < hi)
    }.toSeq
  }

  // ---- slice builders, one per feed (shared by stages + fallback) ----

  private def funnelSlices(s: SparkSession, dir: String): Seq[DataFrame] =
    timeSlices(Tables(s, dir).events
        .filter(col("ts_ns") < 1704153600000000000L), 3)
      .map(_.select(col("event_id"), col("user_id"), col("ts_ns").as("t"),
        col("event_type")))

  private def scd2Slices(s: SparkSession, dir: String): Seq[DataFrame] =
    timeSlices(Tables(s, dir).events, 3)
      .map(_.select(col("event_id"), col("user_id"),
        expr("ts_ns DIV 1000").as("t"), col("event_type")))

  /** click/purchase median-cut halves — shared by the two
    * stream-stream-join demos. */
  private def ssSlices(s: SparkSession, dir: String, t: String): Seq[DataFrame] = {
    val ev = Tables(s, dir).events
    val cut = ev.filter(col("event_type").isin("click", "purchase"))
      .agg(expr("approx_percentile(ts_ns, 0.5)")).head().getLong(0)
    val sd = ev.filter(col("event_type") === t)
    Seq(sd.filter(col("ts_ns") < cut), sd.filter(col("ts_ns") >= cut))
      .map(_.select(col("user_id"), col("event_id"), col("ts")))
  }

  private def enrichSlices(s: SparkSession, dir: String): Seq[DataFrame] = {
    val purch = Tables(s, dir).events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"))
    Seq(purch.filter(col("event_id") % 2 === 0),
      purch.filter(col("event_id") % 2 === 1))
  }

  /** events in 3 time slices — shared by q_stream_window + q_stream_backfill. */
  private def evwinSlices(s: SparkSession, dir: String): Seq[DataFrame] =
    timeSlices(Tables(s, dir).events, 3)
      .map(_.select(col("event_id"), col("event_type"), col("ts"), col("value")))

  private def slidingSlices(s: SparkSession, dir: String): Seq[DataFrame] =
    timeSlices(Tables(s, dir).events, 3)
      .map(_.select(col("event_id"), col("event_type"), col("ts")))

  private def sessionsSlices(s: SparkSession, dir: String): Seq[DataFrame] =
    timeSlices(Tables(s, dir).events, 3)
      .map(_.select(col("event_id"), col("user_id"), col("ts")))

  private def countsSlices(s: SparkSession, dir: String): Seq[DataFrame] = {
    val purch = Tables(s, dir).events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
    Seq(purch.filter(col("event_id") % 2 === 0),
      purch.filter(col("event_id") % 2 === 1))
  }

  private def totalsSlices(s: SparkSession, dir: String): Seq[DataFrame] = {
    val purch = Tables(s, dir).events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), floor(col("value") * 100).as("value"))
    Seq(purch.filter(col("event_id") % 2 === 0),
      purch.filter(col("event_id") % 2 === 1))
  }

  private def dedupSlices(s: SparkSession, dir: String): Seq[DataFrame] = {
    val purch = Tables(s, dir).events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    Seq(purch, purch)
  }

  private def fsinkSlices(s: SparkSession, dir: String): Seq[DataFrame] = {
    val evb = Tables(s, dir).events
      .filter(col("ts_ns") < 1704326400000000000L) // 2024-01-04 UTC
    val cuts = evb.agg(expr("approx_percentile(ts_ns, array(0.33d, 0.66d))"))
      .head().getSeq[Long](0)
    Seq(
      evb.filter(col("ts_ns") < cuts(0)),
      evb.filter(col("ts_ns") >= cuts(0) && col("ts_ns") < cuts(1)),
      evb.filter(col("ts_ns") >= cuts(1)))
      .map(_.select(col("event_id"), col("event_type"), col("ts"), col("value")))
  }

  /** Pre-split halves the restart demo lands into its LIVE feed dir one
    * at a time (the crash/recovery choreography is the timed body; the
    * split + parquet writes are fixture construction). */
  private def restartSrcSlices(s: SparkSession, dir: String): Seq[DataFrame] =
    timeSlices(Tables(s, dir).events
        .filter(col("ts_ns") < 1704326400000000000L), 2)
      .map(_.select(col("event_id"), col("event_type"), col("ts"), col("value")))

  private def restartBase(dir: String): java.io.File = new java.io.File(
    s"target/tmp/q_stream_restart_${dir.replaceAll("[^A-Za-z0-9.]", "_")}")

  private def copyRec(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(f => copyRec(f, new java.io.File(dst, f.getName)))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** One streaming-query lifecycle of the restart demo over the
    * working feed dir (shared by the staged first drain and the timed
    * recovery half).
    */
  private def restartRunOnce(s: SparkSession, base: java.io.File,
      schema: org.apache.spark.sql.types.StructType): Unit =
    withConf(s, "spark.sql.shuffle.partitions" -> "8") {
      val q = Streams.partitionedSink(
          Streams.tumblingAgg(
            fileStream(s, new java.io.File(base, "feed").getAbsolutePath, schema),
            "1 hour", "10 minutes"),
          s"$base/out", s"$base/ckpt",
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
        .start()
      try q.processAllAvailable() finally q.stop()
    }

  /** Stage the restart demo's FIRST streaming lifecycle once per data
    * dir (VERDICT r10 item 7): land slice 0, run query #1 to
    * completion ("crash"), snapshot feed+checkpoint+output. The timed
    * body then only restores the snapshot (attribute-preserving file
    * copies — the checkpoint's file-source log records absolute feed
    * paths, which is why the snapshot restores to the SAME working
    * dir), lands slice 1 and runs the RECOVERY lifecycle — the half
    * the demo is about. Slices are pure functions of the testdata, so
    * the snapshot stays valid across feed restagings.
    */
  private def stageRestartFirstDrain(s: SparkSession, dir: String): Unit = {
    val base = restartBase(dir)
    val marker = new java.io.File(base, "stage/_DONE")
    if (marker.exists()) return
    rmrf(base)
    val liveFeed = new java.io.File(base, "feed")
    liveFeed.mkdirs()
    val (srcDir, schema) = feed(s, "restart_src", dir)(restartSrcSlices(s, dir))
    val src = new java.io.File(srcDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val dst = new java.io.File(liveFeed, "slice-00000.parquet")
    java.nio.file.Files.copy(src(0).toPath, dst.toPath)
    dst.setLastModified(System.currentTimeMillis() - 120000L)
    restartRunOnce(s, base, schema) // first run: slice 0 only, then "crash"
    val stage = new java.io.File(base, "stage")
    for (part <- Seq("feed", "ckpt", "out"))
      copyRec(new java.io.File(base, part), new java.io.File(stage, part))
    marker.createNewFile()
    ()
  }

  private def ingestSlices(s: SparkSession, dir: String): Seq[DataFrame] = {
    val docs = Tables(s, dir).documents.select(col("doc_id"), col("text"))
    Seq(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
  }

  /** Untimed feed staging (see [[graft.SparkEntry.stages]]): Bench and
    * Verify build every feed before the query loop, so the timed query
    * measures the streaming pipeline, not the fixture writes. Shared
    * feeds are rebuilt by each dependent query's entry (idempotent; the
    * `only`-narrowed dev road still stages what it needs).
    */
  val stages: Map[String, (SparkSession, String) => Unit] = Map(
    "q_stream_funnel" -> ((s, d) => buildFeed(s, "funnel", d, funnelSlices(s, d))),
    "q_stream_scd2" -> ((s, d) => buildFeed(s, "scd2", d, scd2Slices(s, d))),
    "q_stream_attribution" -> ((s, d) => {
      buildFeed(s, "ss_click", d, ssSlices(s, d, "click"))
      buildFeed(s, "ss_purch", d, ssSlices(s, d, "purchase")) }),
    "q_stream_outer" -> ((s, d) => {
      buildFeed(s, "ss_click", d, ssSlices(s, d, "click"))
      buildFeed(s, "ss_purch", d, ssSlices(s, d, "purchase")) }),
    "q_stream_enrich" -> ((s, d) => buildFeed(s, "enrich", d, enrichSlices(s, d))),
    "q_stream_window" -> ((s, d) => buildFeed(s, "evwin", d, evwinSlices(s, d))),
    "q_stream_backfill" -> ((s, d) => buildFeed(s, "evwin", d, evwinSlices(s, d))),
    "q_stream_sliding" -> ((s, d) => buildFeed(s, "sliding", d, slidingSlices(s, d))),
    "q_stream_sessions" -> ((s, d) => buildFeed(s, "sessions", d, sessionsSlices(s, d))),
    "q_stream_counts" -> ((s, d) => buildFeed(s, "counts", d, countsSlices(s, d))),
    "q_stream_totals" -> ((s, d) => buildFeed(s, "totals", d, totalsSlices(s, d))),
    "q_stream_dedup" -> ((s, d) => buildFeed(s, "dedup", d, dedupSlices(s, d))),
    "q_stream_file_sink" -> ((s, d) => buildFeed(s, "fsink", d, fsinkSlices(s, d))),
    "q_stream_restart" -> ((s, d) => {
      buildFeed(s, "restart_src", d, restartSrcSlices(s, d))
      stageRestartFirstDrain(s, d) }),
    "q_stream_ingest" -> ((s, d) => buildFeed(s, "ingest", d, ingestSlices(s, d))))

  val queries: Map[String, Q] = Map(
    // K19 — streaming funnel over the SAME day-1 events as q_funnel,
    // delivered in 3 event-time-ordered micro-batches; per-user stage
    // state advances across batches, final stage = last emission (max).
    "q_stream_funnel" -> ((s, dir) => {
      import s.implicits._
      // FILE-BACKED feed: three event-time-contiguous slices (the
      // monotone-stage processor's delivery precondition), no driver
      // collect; staged untimed, rebuilt here only on dev runs
      val (fdir, fschema) = feed(s, "funnel", dir)(funnelSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withRocksDb(s) {
        val q = Streams.funnelStages(
            fileStream(s, fdir, fschema).as[TypedEvent],
            Seq("view", "click", "purchase"))
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
    }),

    // K26 — streaming SCD2 over the full event log in 3 ordered
    // micro-batches; emits each CLOSED run exactly once, so the result
    // is the batch rebuild minus the still-open (is_current) runs.
    "q_stream_scd2" -> ((s, dir) => {
      import s.implicits._
      // FILE-BACKED feed, three time-contiguous slices as q_stream_funnel
      val (fdir, fschema) = feed(s, "scd2", dir)(scd2Slices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withRocksDb(s) {
        val q = Streams.scd2Stream(fileStream(s, fdir, fschema).as[TypedEvent])
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("user_id"), col("attr").as("event_type"),
        col("version"), col("effective_from").as("eff_from_us"),
        col("effective_to").as("eff_to_us"))
    }),

    // I-ext — stream-stream interval join (attribution): clicks and
    // purchases as two watermarked streams, each fed in two
    // time-aligned micro-batches; every purchase pairs with the same
    // user's clicks from the preceding 15 min. Contiguous time slices
    // keep cross-batch matches inside the watermark-bounded join
    // state, so the emitted set equals the batch interval join the
    // oracle runs.
    "q_stream_attribution" -> ((s, dir) => {
      // FILE-BACKED feed (no driver collect): each side is staged as
      // two event-time-contiguous parquet slices and read back with
      // spark.readStream — one slice per micro-batch per side. The
      // result is boundary-independent (an inner interval join emits
      // every in-window pair whatever the batching), so the cut only
      // needs to be deterministic, not any particular value.
      val (cdir, cschema) = feed(s, "ss_click", dir)(ssSlices(s, dir, "click"))
      val (pdir, pschema) = feed(s, "ss_purch", dir)(ssSlices(s, dir, "purchase"))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.attributionJoin(
            fileStream(s, cdir, cschema), fileStream(s, pdir, pschema))
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("user_id"), col("click_id"), col("purchase_id"))
    }),

    // I-ext — stream-stream LEFT OUTER interval join: same two
    // watermarked streams as q_stream_attribution, but clicks with no
    // purchase in their 15-min window are emitted with a NULL
    // purchase_id once the watermark passes their match horizon
    // (click_ts + 15 min) — the state-EXPIRY semantics only an outer
    // streaming join exercises. Matched pairs emit immediately;
    // unmatched clicks younger than the final watermark's horizon stay
    // in state and never emit. The GLOBAL watermark is the MIN of the
    // two per-stream watermarks, so the oracle's cutoff base is
    // least(max click ts, max purchase ts) − lateness, not the
    // all-events max.
    "q_stream_outer" -> ((s, dir) => {
      // FILE-BACKED feed, as q_stream_attribution. The outer join's
      // null emissions depend only on the FINAL watermark (min of the
      // two sides' max event time − lateness), which is feed-slicing-
      // independent; the trailing no-data micro-batch after the last
      // file performs the final state expiry exactly as the
      // MemoryStream road did.
      val (cdir, cschema) = feed(s, "ss_click", dir)(ssSlices(s, dir, "click"))
      val (pdir, pschema) = feed(s, "ss_purch", dir)(ssSlices(s, dir, "purchase"))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.attributionJoin(
            fileStream(s, cdir, cschema), fileStream(s, pdir, pschema),
            joinType = "leftOuter")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("user_id"), col("click_id"), col("purchase_id"))
    }),

    // I-ext — stream-static enrichment: purchases stream from a
    // FILE-BACKED feed (two staged slices by event_id parity, no
    // driver collect), each micro-batch joined against the broadcast
    // nation dim (stateless, no watermark); the emitted set equals
    // the batch join the oracle runs.
    "q_stream_enrich" -> ((s, dir) => {
      val (fdir, fschema) = feed(s, "enrich", dir)(enrichSlices(s, dir))
      val dim = Tables(s, dir).nation
        .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.enrichJoin(fileStream(s, fdir, fschema), dim,
            col("user_id") % 25 === col("nk"))
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("event_id"), col("user_id"), col("n_name"))
    }),

    // I1/I4 under the oracle — watermarked tumbling aggregate in APPEND
    // mode: three event-time-ordered micro-batches; only windows whose
    // end falls at or below the final watermark (max event time minus
    // 10 min) are emitted, exactly the cutoff the oracle applies. The
    // trailing no-data micro-batch performs the final eviction.
    "q_stream_window" -> ((s, dir) => {
      // FILE-BACKED feed, three time-contiguous slices; the trailing
      // no-data micro-batch performs the final eviction
      val (fdir, fschema) = feed(s, "evwin", dir)(evwinSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.tumblingAgg(fileStream(s, fdir, fschema),
            "1 hour", "10 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))
    }),

    // I2 under the oracle — watermarked SLIDING windows in append
    // mode: 1-hour windows hopping every 30 min, so each event lands
    // in exactly two windows; emitted set = windows whose END clears
    // the final watermark, the same cutoff as q_stream_window.
    "q_stream_sliding" -> ((s, dir) => {
      // FILE-BACKED feed, as q_stream_window
      val (fdir, fschema) = feed(s, "sliding", dir)(slidingSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.slidingAgg(fileStream(s, fdir, fschema),
            "1 hour", "30 minutes", "10 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"))
    }),

    // I3 under the oracle — watermarked SESSION windows in append
    // mode: 30-min-gap sessions per user over three ordered
    // micro-batches; a session spanning a batch boundary stays open in
    // state and emits ONCE when the watermark passes its end
    // (last event + gap). Emitted set = lag-gap sessions whose end
    // clears the final watermark, exactly the oracle's cutoff.
    "q_stream_sessions" -> ((s, dir) => {
      // FILE-BACKED feed, as q_stream_window; a session spanning a
      // slice boundary stays open in state and emits once
      val (fdir, fschema) = feed(s, "sessions", dir)(sessionsSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.sessionAgg(fileStream(s, fdir, fschema),
            "30 minutes", "10 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("user_id"),
        date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))
    }),

    // H-ext under the oracle — flatMapGroupsWithState running counts:
    // each micro-batch emits every touched user's count-so-far, so the
    // emitted SET is exactly {(user, per-batch running count)} — the
    // oracle reconstructs it by replaying the deterministic slice
    // boundary (first ceil(n/2) rows by event_id).
    "q_stream_counts" -> ((s, dir) => {
      import s.implicits._
      // FILE-BACKED feed, two batches by event_id parity (arrival
      // order is irrelevant to a running count; the oracle replays the
      // same parity split)
      val (fdir, fschema) = feed(s, "counts", dir)(countsSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.runningCounts(
            fileStream(s, fdir, fschema).as[UserEvent])
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("user_id"), col("n"))
    }),

    // H-ext under the oracle — transformWithState (the Spark-4 named
    // -state API) running value totals: value is fed as floor(value *
    // 100) — an INTEGER-valued double, so the per-batch partial sums
    // are order-independent and bit-exact cross-engine (double adds of
    // integers < 2^53 are exact; raw doubles would make the running
    // sum depend on iterator order). Each batch emits every touched
    // user's total-so-far; the oracle replays the deterministic
    // half-split boundary.
    "q_stream_totals" -> ((s, dir) => {
      import s.implicits._
      // FILE-BACKED feed, parity batches as q_stream_counts
      val (fdir, fschema) = feed(s, "totals", dir)(totalsSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withRocksDb(s) {
        val q = Streams.runningTotals(
            fileStream(s, fdir, fschema).as[UserEvent])
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("user_id"), col("total"))
    }),

    // I5/E4 — dropDuplicatesWithinWatermark under the oracle, FILE-
    // BACKED: the whole purchase set is staged twice, as two slice
    // files — so EVERY row's duplicate arrives in the NEXT micro-batch
    // (the strongest cross-batch form: nothing can be caught by
    // intra-batch dedup). A batch-2 copy either hits live key state
    // (deduped) or sits below the watermark (dropped as late) — both
    // roads erase it, so the emitted set equals plain DISTINCT.
    "q_stream_dedup" -> ((s, dir) => {
      val (fdir, fschema) = feed(s, "dedup", dir)(dedupSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.dedupWithinWatermark(fileStream(s, fdir, fschema))
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      s.table(sink).select(col("event_id"), col("user_id"))
    }),

    // A8/I9 end to end — the streaming FILE SINK road under the
    // oracle: a file-backed feed (three event-time slices) drives the
    // watermarked tumbling aggregate, and every closed window lands
    // through `Streams.partitionedSink` as (ds, win)-partitioned
    // parquet via dynamic overwrite — append-mode emission granularity
    // == partition granularity, so batch replays rewrite the same
    // partitions idempotently. Source AND sink are both distributed
    // files; the query reads the landed table back. Oracle = the
    // q_stream_window cutoff restated over (ds, win).
    "q_stream_file_sink" -> ((s, dir) => {
      val base = new java.io.File(
        s"target/tmp/q_stream_file_sink_${dir.replaceAll("[^A-Za-z0-9.]", "_")}")
      rmrf(base)
      // First 3 days only: the demo's cost is COMMIT CHURN (dynamic
      // overwrite renames one directory per (ds, win) per batch), and
      // a month of hourly windows is ~600 near-empty dirs on a local
      // fs — partition-count discipline, not data volume, bounds this
      // demo exactly as it would a real sink (where a day's windows
      // are FEW and FULL). Oracle applies the same 3-day cut.
      val (fdir, fschema) = feed(s, "fsink", dir)(fsinkSlices(s, dir))
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.partitionedSink(
            Streams.tumblingAgg(fileStream(s, fdir, fschema), "1 hour", "10 minutes"),
            s"$base/out", s"$base/ckpt",
            trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(s"$base/out")
        .select(col("ds"), col("win"), col("event_type"), col("n"), col("total"))
    }),

    // I-ext — BACKFILL drain under Trigger.AvailableNow: the
    // cron-batch-over-a-stream-source operational shape — process the
    // whole staged backlog in rate-limited micro-batches (one file per
    // trigger) and then STOP ON ITS OWN (awaitTermination, no
    // processAllAvailable babysitter). The emitted window set must
    // still equal the continuous run's: AvailableNow keeps running
    // batches until the source is drained AND the advanced watermark's
    // pending evictions have emitted. Same oracle cutoff as
    // q_stream_window.
    "q_stream_backfill" -> ((s, dir) => {
      val (fdir, fschema) = feed(s, "evwin", dir)(evwinSlices(s, dir))
      val sink = s"q_stream_sink_${sinkSeq.incrementAndGet()}"
      withConf(s, "spark.sql.shuffle.partitions" -> "8") {
        val q = Streams.tumblingAgg(fileStream(s, fdir, fschema),
            "1 hour", "10 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination() // self-terminates when the backlog is drained
      }
      s.table(sink).select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total"))
    }),

    // I-ext — CHECKPOINT RECOVERY + exactly-once sink, end to end: the
    // same tumbling-agg→partitioned-sink pipeline as
    // q_stream_file_sink, but run as TWO separate streaming queries
    // against ONE checkpoint — the first drains slice 1 and STOPS (a
    // deploy restart / crash), more data lands while nothing runs,
    // then a new query instance resumes from the checkpoint's offset
    // log and committed watermark and drains the rest. The landed
    // table must equal the single-run result exactly: recovered
    // watermark state means no window double-emits, and the
    // partition-granular dynamic overwrite makes any replayed batch
    // idempotent. Oracle = the batch cutoff restatement (identical to
    // a never-stopped run).
    "q_stream_restart" -> ((s, dir) => {
      // the first lifecycle (drain slice 0, then "crash") is STAGED
      // once per data dir — see [[stageRestartFirstDrain]]; the timed
      // body restores the post-crash snapshot (cheap attribute-
      // preserving file copies), lands the while-down data and runs
      // ONLY the recovery lifecycle: resume from the checkpoint's
      // offset log + committed watermark, drain the rest, land
      // idempotently. The result table is identical to the two-
      // lifecycle form (the snapshot IS that form's mid-point).
      val base = restartBase(dir)
      stageRestartFirstDrain(s, dir)
      val stage = new java.io.File(base, "stage")
      for (part <- Seq("feed", "ckpt", "out")) {
        val w = new java.io.File(base, part)
        rmrf(w)
        copyRec(new java.io.File(stage, part), w)
      }
      val (srcDir, schema) = feed(s, "restart_src", dir)(restartSrcSlices(s, dir))
      val srcSlices = new java.io.File(srcDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val dst = new java.io.File(base, "feed/slice-00001.parquet")
      java.nio.file.Files.copy(srcSlices(1).toPath, dst.toPath)
      dst.setLastModified(System.currentTimeMillis() - 60000L) // landed while down
      restartRunOnce(s, base, schema) // recovery: same checkpoint, new instance
      s.read.parquet(s"$base/out")
        .select(col("ds"), col("win"), col("event_type"), col("n"), col("total"))
    }),

    // I5 — streaming corpus ingest (exact + LSH dedup within batch,
    // persisted-index rejection across batches, idempotent batch=N
    // landing) over documents split in two micro-batches by doc_id
    // parity — duplicates split across the boundary must be caught by
    // the index road, not the intra-batch one.
    "q_stream_ingest" -> ((s, dir) => {
      val base = new java.io.File(
        s"target/tmp/q_stream_ingest_${dir.replaceAll("[^A-Za-z0-9.]", "_")}")
      rmrf(base) // stale index/checkpoint would reject the whole feed
      // FILE-BACKED feed: the corpus is staged as two parquet slices
      // by doc_id parity (the oracle's replayed batch split) and read
      // back with spark.readStream — batchId 0 = even slice, 1 = odd.
      // No document text ever transits the driver; this is the real
      // landing-directory ingest shape, duplicates split across the
      // batch boundary still must be caught by the persisted index
      // road, not the intra-batch one.
      val (fdir, fschema) = feed(s, "ingest", dir)(ingestSlices(s, dir))
      // maxPartitionBytes matches the feed's 2 MB row groups (see
      // appendFeedSlice): the batch scan splits per row group, so the
      // per-batch hash/signature kernels run wide instead of on one
      // core. At contract SFs the slice is a single group — no change.
      withConf(s, "spark.sql.shuffle.partitions" -> "8",
          "spark.sql.files.maxPartitionBytes" -> (2L * 1024 * 1024).toString) {
        val q = Streams.corpusIngest(
            fileStream(s, fdir, fschema),
            s"$base/index", s"$base/out", s"$base/ckpt")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(s"$base/out")
        .select(col("doc_id"), col("batch").cast("int").as("batch"))
    })
  )

  /** DuckDB replay of one ingest micro-batch: exact dedup (min doc_id
    * per content hash), then per-band-bucket representative drops (8
    * single-row bands over 3-word-shingle minhash; any doc that is not
    * its bucket's min id drops), then rejection of anything colliding
    * with the prior accepted set's band frame.
    */
  private def ingestBatchSql(sfx: String, pred: String, idx: String): String = {
    val mh = (0 until 8).map(i => s"min(md5('$i|' || shingle)) AS mh$i").mkString(", ")
    val bands = (0 until 8)
      .map(i => s"SELECT doc_id, $i AS band, md5(mh$i) AS bucket FROM mh_$sfx")
      .mkString(" UNION ALL ")
    s"""ex_$sfx AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM documents WHERE $pred
                 GROUP BY sha256(text)),
        mh_$sfx AS MATERIALIZED (SELECT sh.doc_id, $mh FROM sh JOIN ex_$sfx USING (doc_id)
                 GROUP BY sh.doc_id),
        bd_$sfx AS MATERIALIZED ($bands),
        dr_$sfx AS MATERIALIZED (SELECT DISTINCT b.doc_id
                 FROM bd_$sfx b JOIN (SELECT band, bucket, min(doc_id) AS hub
                                   FROM bd_$sfx GROUP BY band, bucket) h
                   USING (band, bucket)
                 WHERE b.doc_id <> h.hub),
        acc_$sfx AS MATERIALIZED (SELECT doc_id FROM ex_$sfx
                  WHERE doc_id NOT IN (SELECT doc_id FROM dr_$sfx)
                    AND doc_id NOT IN (SELECT DISTINCT b.doc_id FROM bd_$sfx b
                                       JOIN ($idx) x USING (band, bucket)))"""
  }

  val oracles: Map[String, String] = Map(
    "q_stream_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t, event_id FROM events
                    WHERE ts < TIMESTAMP '2024-01-02'),
          s1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN t END)
                             OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS r0 FROM e),
          s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND r0 < t THEN t END)
                             OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS r1 FROM s1),
          s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND r1 < t THEN t END)
                             OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS r2 FROM s2),
          u AS (SELECT user_id, min(r0) AS t0, min(r1) AS t1, min(r2) AS t2
                FROM s3 GROUP BY user_id)
          SELECT CASE WHEN t2 IS NOT NULL THEN 3 WHEN t1 IS NOT NULL THEN 2
                      WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS stage,
                 count(*) AS n_users
          FROM u GROUP BY 1""",
    "q_stream_attribution" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click'),
          p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
                FROM events WHERE event_type = 'purchase')
         SELECT c.user_id, c.click_id, p.purchase_id
         FROM c JOIN p ON c.user_id = p.user_id
          AND p.purchase_ts >= c.click_ts
          AND p.purchase_ts < c.click_ts + INTERVAL 15 MINUTE""",
    "q_stream_outer" ->
      """WITH c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
                    FROM events WHERE event_type = 'click'),
          p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
                FROM events WHERE event_type = 'purchase'),
          m AS (SELECT least(
                  (SELECT max(CAST(ts AS TIMESTAMP)) FROM events
                   WHERE event_type = 'click'),
                  (SELECT max(CAST(ts AS TIMESTAMP)) FROM events
                   WHERE event_type = 'purchase')) AS mx)
         SELECT c.user_id, c.click_id, p.purchase_id
         FROM c JOIN p ON c.user_id = p.user_id
          AND p.purchase_ts >= c.click_ts
          AND p.purchase_ts < c.click_ts + INTERVAL 15 MINUTE
         UNION ALL
         SELECT c.user_id, c.click_id, NULL AS purchase_id
         FROM c, m
         WHERE CAST(c.click_ts AS TIMESTAMP) + INTERVAL 15 MINUTE
                 <= mx - INTERVAL 10 MINUTE
           AND NOT EXISTS (SELECT 1 FROM p
                           WHERE p.user_id = c.user_id
                             AND p.purchase_ts >= c.click_ts
                             AND p.purchase_ts < c.click_ts + INTERVAL 15 MINUTE)""",
    "q_stream_counts" ->
      """WITH b AS (SELECT user_id, CAST(event_id % 2 AS INT) AS batch
                   FROM events WHERE event_type = 'purchase'),
          em AS (SELECT DISTINCT user_id, batch FROM b),
          c AS (SELECT e.user_id, e.batch, count(*) AS n
                FROM em e JOIN b x
                  ON x.user_id = e.user_id AND x.batch <= e.batch
                GROUP BY 1, 2)
         SELECT user_id, n FROM c""",
    "q_stream_totals" ->
      """WITH b AS (SELECT user_id, floor(value * 100) AS cents,
                          CAST(event_id % 2 AS INT) AS batch
                   FROM events WHERE event_type = 'purchase'),
          em AS (SELECT DISTINCT user_id, batch FROM b),
          c AS (SELECT e.user_id, e.batch, CAST(sum(x.cents) AS DOUBLE) AS total
                FROM em e JOIN b x
                  ON x.user_id = e.user_id AND x.batch <= e.batch
                GROUP BY 1, 2)
         SELECT user_id, total FROM c""",
    "q_stream_dedup" ->
      """SELECT event_id, user_id FROM events WHERE event_type = 'purchase'""",
    "q_stream_sessions" ->
      """WITH flagged AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                  CASE WHEN CAST(ts AS TIMESTAMP)
                            - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL 30 MINUTE OR
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id, ts,
                  SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_id
           FROM flagged),
         agg AS (
           SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                  count(*) AS n_events
           FROM sessions GROUP BY user_id, session_id),
         m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events)
         SELECT user_id,
                strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                n_events
         FROM agg, m
         WHERE session_end + INTERVAL 30 MINUTE <= mx - INTERVAL 10 MINUTE""",
    "q_stream_enrich" ->
      """SELECT event_id, user_id, n_name
         FROM events JOIN nation ON user_id % 25 = n_nationkey
         WHERE event_type = 'purchase'""",
    "q_stream_backfill" ->
      """WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
          b AS (SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w,
                       event_type, count(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM events GROUP BY 1, 2)
         SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, n, total
         FROM b, m
         WHERE w + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE""",
    "q_stream_restart" ->
      """WITH e AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04'),
          m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM e),
          b AS (SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w,
                       event_type, count(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM e GROUP BY 1, 2)
         SELECT strftime(w, '%Y%m%d') AS ds, strftime(w, '%H%M') AS win,
                event_type, n, total
         FROM b, m
         WHERE w + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE""",
    "q_stream_file_sink" ->
      """WITH e AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04'),
          m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM e),
          b AS (SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w,
                       event_type, count(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM e GROUP BY 1, 2)
         SELECT strftime(w, '%Y%m%d') AS ds, strftime(w, '%H%M') AS win,
                event_type, n, total
         FROM b, m
         WHERE w + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE""",
    "q_stream_window" ->
      """WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
          b AS (SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS w,
                       event_type, count(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
                FROM events GROUP BY 1, 2)
         SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start,
                event_type, n, total
         FROM b, m
         WHERE w + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE""",
    "q_stream_sliding" ->
      """WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
          e AS (SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS b30,
                       event_type FROM events),
          w2 AS (SELECT b30 AS w, event_type FROM e
                 UNION ALL
                 SELECT b30 - INTERVAL 30 MINUTE AS w, event_type FROM e),
          b AS (SELECT w, event_type, count(*) AS n FROM w2 GROUP BY 1, 2)
         SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, event_type, n
         FROM b, m
         WHERE w + INTERVAL 1 HOUR <= mx - INTERVAL 10 MINUTE""",
    "q_stream_scd2" ->
      """WITH ord AS (SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events),
          chg AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
                  FROM ord),
          runs AS (SELECT * FROM chg WHERE prev IS NULL OR prev <> event_type),
          v AS (SELECT user_id, event_type,
                       CAST(row_number() OVER w AS INT) AS version,
                       tus AS eff_from_us,
                       lead(tus) OVER w AS eff_to_us
                FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
          SELECT * FROM v WHERE eff_to_us IS NOT NULL""",
    "q_stream_ingest" -> {
      val b0 = ingestBatchSql("b0", "doc_id % 2 = 0",
        "SELECT band, bucket FROM bd_b0 WHERE 1 = 0")
      // batch 1 rejects against batch 0's accepted band frame
      val b1 = ingestBatchSql("b1", "doc_id % 2 = 1",
        "SELECT band, bucket FROM bd_b0 WHERE doc_id IN (SELECT doc_id FROM acc_b0)")
      s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          sh AS MATERIALIZED (SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                                         i -> array_to_string(w[i:i+2], ' '))) AS shingle
            FROM words)),
          $b0,
          $b1
          SELECT doc_id, 0 AS batch FROM acc_b0
          UNION ALL
          SELECT doc_id, 1 AS batch FROM acc_b1"""
    }
  )
}
