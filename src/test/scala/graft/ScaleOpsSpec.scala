package graft

import graft.io.Bucketing
import graft.ops.Skew
import graft.streaming.{Streams, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Scale-path operators: salted skew join (result-identical to plain),
  * bucketed co-located join (no Exchange in the plan), custom keyed
  * streaming state.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows under heavy skew") {
    // 10k rows of one hot key + a tail
    val skewed = (Seq.fill(10000)(1) ++ (2 to 50)).toDF("k")
    val small = (1 to 50).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(small, Seq("k"))
    val salted = Skew.saltedJoin(skewed, small, "k", buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().collect().toSet ==
      plain.groupBy("k").count().collect().toSet)
    assert(salted.columns.toSeq == plain.columns.toSeq) // salt never leaks
  }

  test("bucketed join plans without any Exchange (co-located scan)") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"x$i")).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4, rebuild = true)
    Bucketing.writeBucketed(b, "bkt_b", "k", 4, rebuild = true)
    // force the non-broadcast path: co-location only matters for joins
    // too big to broadcast, which is what bucketing exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_a", "bkt_b", "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-located join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not engaged:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("catalog road: truncate+append == dynamic overwrite; SHOW PARTITIONS == directory watermark") {
    import graft.io.{CatalogWriter, PartitionedWriter}
    val table = "cat_ingest"
    CatalogWriter.drop(spark, table)
    // clear any orphan managed location a dead JVM left (as Bucketing does)
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(loc)) fs.delete(loc, true)

    val v1 = Seq((1L, "a", "20240101"), (2L, "b", "20240102"), (3L, "c", "20240102"))
      .toDF("id", "v", "ds")
    // replay of 20240102 with corrected contents — the reference's
    // daily re-ingest case (partition must be REPLACED, not doubled)
    val v2 = Seq((2L, "B", "20240102"), (4L, "d", "20240102")).toDF("id", "v", "ds")

    CatalogWriter.writeTable(v1, table)
    CatalogWriter.truncateThenAppend(v2, table)
    CatalogWriter.refresh(spark, table)

    val dir = tmpDir("cat_vs_dyn")
    PartitionedWriter.writePartitioned(v1, dir, compact = false)
    PartitionedWriter.writePartitioned(v2, dir, compact = false)

    val catRows = spark.table(table).select($"id", $"v", $"ds").collect().toSet
    val dirRows = spark.read.parquet(dir).select($"id", $"v", $"ds").collect().toSet
    assert(catRows == dirRows, s"catalog road diverged: $catRows vs $dirRows")
    assert(catRows.size == 3) // 20240101 intact, 20240102 replaced

    // watermark: SHOW PARTITIONS road == directory-listing road, on
    // the catalog table's own storage
    assert(CatalogWriter.maxPartition(spark, table).contains("20240102"))
    val tableLoc = CatalogWriter.tableLocation(spark, table)
    assert(PartitionedWriter.maxPartition(spark, tableLoc).contains("20240102"))
    CatalogWriter.drop(spark, table)
  }

  test("zorder manifest: 2-D box prunes files on BOTH dims; pruned == full filter") {
    import graft.io.Manifest
    import graft.ops.Scalars
    val path = tmpDir("zorder-skip")
    // a 32x32 grid of (x, y) points: z-order layout gives each of the
    // 16 files a tight box in BOTH dimensions
    val grid = spark.range(0, 1024).selectExpr(
      "id % 32 AS x", "id DIV 32 AS y", "id AS v")
    Manifest.writeWithManifestKeyed(Scalars.zorderKey(grid, "x", "y"),
      path, Seq("x", "y"), layoutCol = "zkey", numFiles = 16)
    val total = new java.io.File(s"$path/data").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val box = Seq(("x", lit(4L), lit(11L)), ("y", lit(4L), lit(11L)))
    val cand = Manifest.candidateFilesBox(spark, path, box)
    assert(cand.nonEmpty && cand.size < total,
      s"2-D box should prune files: ${cand.size} of $total opened")
    val pruned = Manifest.readPrunedBox(spark, path, box)
      .select("x", "y", "v").as[(Long, Long, Long)].collect().toSet
    val full = grid.filter($"x".between(4, 11) && $"y".between(4, 11))
      .select("x", "y", "v").as[(Long, Long, Long)].collect().toSet
    assert(pruned == full)
  }

  test("avro round-trip: full type surface, nulls, by-name column pruning") {
    import graft.io.Avro
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType), StructField("d", DoubleType),
      StructField("f", FloatType), StructField("b", BooleanType),
      StructField("s", StringType), StructField("bin", BinaryType),
      StructField("day", DateType)))
    val rows = Seq(
      Row(1L, 7, 1.5, 2.5f, true, "x", Array[Byte](1, 2), java.sql.Date.valueOf("2024-03-01")),
      Row(2L, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmpDir("avro-rt")
    Avro.write(df, path)
    val back = Avro.read(spark, path, schema).collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(5)),
        Option(r.get(6)).map(_.asInstanceOf[Array[Byte]].toSeq), Option(r.get(7)))).toSet
    assert(back == Set(
      (1L, Some(7), Some(1.5), Some("x"), Some(Seq[Byte](1, 2)),
        Some(java.sql.Date.valueOf("2024-03-01"))),
      (2L, None, None, None, None, None)))
    // by-name resolution: a narrower read schema prunes columns
    val pruned = Avro.read(spark, path,
      StructType(Seq(StructField("s", StringType), StructField("id", LongType))))
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toSet
    assert(pruned == Set((Some("x"), 1L), (None, 2L)))
    // an all-empty frame still round-trips (schema'd empty container)
    val emptyPath = tmpDir("avro-rt-empty")
    Avro.write(df.limit(0), emptyPath)
    assert(Avro.read(spark, emptyPath, schema).count() == 0L)
  }

  test("snapshots: time travel reads history; later writes never touch old generations") {
    import graft.io.Snapshots
    val path = tmpDir("snapshots-tt")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(new java.io.File(path))
    val g0 = Snapshots.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    val g1 = Snapshots.commit(Seq((3L, "c")).toDF("id", "v"), path)
    assert((g0, g1) == (0L, 1L))
    val files0 = Snapshots.filesOf(spark, path, g0)
    val golden0 = Snapshots.readAsOf(spark, path, g0)
      .as[(Long, String)].collect().toSet
    val mtimes0 = files0.map(f => f -> new java.io.File(
      new java.net.URI(f).getPath).lastModified()).toMap
    // a logical OVERWRITE replaces the visible table...
    val g2 = Snapshots.commit(Seq((9L, "z")).toDF("id", "v"), path, overwrite = true)
    assert(Snapshots.read(spark, path).as[(Long, String)].collect().toSet ==
      Set((9L, "z")))
    // ...but generation 0 is bit-identical: same file list, same bytes
    // on disk (mtimes untouched), same rows
    assert(Snapshots.filesOf(spark, path, g0) == files0)
    files0.foreach { f =>
      val jf = new java.io.File(new java.net.URI(f).getPath)
      assert(jf.exists() && jf.lastModified() == mtimes0(f),
        s"old-generation file touched by later write: $f")
    }
    assert(Snapshots.readAsOf(spark, path, g0)
      .as[(Long, String)].collect().toSet == golden0)
    // append history also intact: gen1 = gen0 + the appended row
    assert(Snapshots.readAsOf(spark, path, g1)
      .as[(Long, String)].collect().toSet == golden0 + ((3L, "c")))
    assert(Snapshots.latestGeneration(spark, path).contains(g2))
    // vacuum keeping only the last 2 generations: gen0 dies, its files
    // (unreferenced by gen1? no — gen1 carries them, so they survive);
    // after also vacuuming to last 1, only gen2's overwrite files remain
    assert(Snapshots.vacuum(spark, path, keepLast = 2) == 0L) // gen1 still references gen0 files
    assert(Snapshots.filesOf(spark, path, g1).toSet.nonEmpty)
    val removed = Snapshots.vacuum(spark, path, keepLast = 1)
    assert(removed >= 1L) // gen0/gen1 files now unreferenced and deleted
    assert(Snapshots.read(spark, path).as[(Long, String)].collect().toSet ==
      Set((9L, "z"))) // latest untouched by vacuum
    assert(Snapshots.latestGeneration(spark, path).contains(g2))
    // an empty-frame overwrite commit yields a readable empty generation
    val g3 = Snapshots.commit(Seq.empty[(Long, String)].toDF("id", "v"),
      path, overwrite = true)
    assert(Snapshots.readAsOf(spark, path, g3).count() == 0L)
    assert(Snapshots.read(spark, path).columns.toSeq == Seq("id", "v"))
  }

  test("transformWithState (Spark 4 arbitrary state) keeps running totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[UserEvent]
    val q = Streams.runningTotals(mem.toDS()).writeStream
      .format("memory").queryName("totals_out").outputMode("append").start()
    try {
      mem.addData(UserEvent(1, 10, 1.5), UserEvent(2, 10, 2.5), UserEvent(3, 20, 3.0))
      q.processAllAvailable()
      mem.addData(UserEvent(4, 10, 4.0))
      q.processAllAvailable() // ValueState must carry: user 10 reaches 8.0
      val latest = spark.table("totals_out")
        .groupBy($"user_id").agg(max($"total").as("total"))
        .as[(Long, Double)].collect().toMap
      assert(latest(10L) == 8.0 && latest(20L) == 3.0)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming funnel: stage state advances across batches, ignores late stragglers") {
    import graft.streaming.{FunnelStage, TypedEvent}
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[TypedEvent]
    val q = Streams.funnelStages(mem.toDS(), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_out").outputMode("append").start()
    try {
      // batch 1, deliberately out of order inside the batch
      mem.addData(TypedEvent(2, 1, 20, "click"), TypedEvent(1, 1, 10, "view"),
        TypedEvent(3, 2, 5, "click")) // user 2: click with no prior view
      q.processAllAvailable()
      // batch 2: user 1 completes; a late pre-view click must not re-advance
      mem.addData(TypedEvent(4, 1, 30, "purchase"), TypedEvent(5, 2, 1, "click"))
      q.processAllAvailable()
      val latest = spark.table("funnel_out")
        .groupBy($"user_id").agg(max($"stage").as("stage"))
        .as[(Long, Int)].collect().toMap
      assert(latest == Map(1L -> 3, 2L -> 0), s"got $latest")
      // batch twin agreement: same events through Warehouse.funnelStages
      val batch = Seq((1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
        (2L, 5L, "click"), (2L, 1L, "click")).toDF("u", "t", "typ")
      val b = graft.ops.Warehouse.funnelStages(batch, col("u"), col("t"), col("typ"),
          Seq("view", "click", "purchase"))
        .as[(Long, Int)].collect().toMap
      assert(b == latest, s"stream $latest vs batch $b")
      // state bound: one ValueState row per live key — 2 users seen
      val stateRows = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .last.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 2L, s"funnel state must be one row per user, got $stateRows")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming SCD2: closed runs across batches match the batch builder") {
    import graft.streaming.TypedEvent
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[TypedEvent]
    val q = Streams.scd2Stream(mem.toDS()).writeStream
      .format("memory").queryName("scd2_out").outputMode("append").start()
    try {
      // batch 1 out of order: bronze(1), bronze(2), silver(3)
      mem.addData(TypedEvent(2, 1, 2, "bronze"), TypedEvent(1, 1, 1, "bronze"),
        TypedEvent(3, 1, 3, "silver"))
      q.processAllAvailable()
      // batch 2: silver extends (no-op), then gold closes silver
      mem.addData(TypedEvent(4, 1, 4, "silver"), TypedEvent(5, 1, 5, "gold"))
      q.processAllAvailable()
      val streamed = spark.table("scd2_out")
        .select($"user_id", $"attr", $"version", $"effective_from", $"effective_to")
        .as[(Long, String, Int, Long, Long)].collect().toSeq.sortBy(_._3)
      val batchClosed = graft.ops.Warehouse.scd2Build(
          Seq((1L, 1L, "bronze"), (1L, 2L, "bronze"), (1L, 3L, "silver"),
            (1L, 4L, "silver"), (1L, 5L, "gold")).toDF("k", "t", "v"),
          col("k"), Seq(col("t")), col("v"), col("t"))
        .filter(!col("is_current"))
        .select($"k", $"v", $"version", $"effective_from", $"effective_to")
        .as[(Long, String, Int, Long, Long)].collect().toSeq.sortBy(_._3)
      assert(streamed == batchClosed, s"stream $streamed vs batch $batchClosed")
      assert(streamed.map(_._2) == Seq("bronze", "silver")) // gold still open in state
      // state bound: exactly the OPEN run per live key — 1 user
      val stateRows = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .last.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == 1L, s"SCD2 state must be one open run per user, got $stateRows")
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState keeps running per-user counts across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = Streams.runningCounts(mem.toDS()).writeStream
      .format("memory").queryName("counts_out").outputMode("append").start()
    try {
      mem.addData(UserEvent(1, 10, 1.0), UserEvent(2, 10, 2.0), UserEvent(3, 20, 3.0))
      q.processAllAvailable()
      mem.addData(UserEvent(4, 10, 4.0))
      q.processAllAvailable() // state must carry: user 10 reaches 3
      val latest = spark.table("counts_out")
        .groupBy($"user_id").agg(max($"n").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(latest(10L) == 3L && latest(20L) == 1L)
    } finally q.stop()
  }

  test("SQL DML road: CTAS, INSERT INTO, INSERT OVERWRITE PARTITION") {
    import graft.io.CatalogWriter
    Seq("dml_t", "dml_ctas").foreach { t =>
      CatalogWriter.drop(spark, t)
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(warehouse, t)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    spark.sql("CREATE TABLE dml_t (id INT, v STRING) USING parquet PARTITIONED BY (ds STRING)")
    spark.sql("INSERT INTO dml_t PARTITION (ds='d1') VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO dml_t PARTITION (ds='d2') VALUES (9, 'z')")
    // static partition overwrite replaces d1 wholesale, spares d2
    spark.sql("INSERT OVERWRITE TABLE dml_t PARTITION (ds='d1') VALUES (3, 'c')")
    val got = spark.table("dml_t").as[(Int, String, String)].collect().toSet
    assert(got == Set((3, "c", "d1"), (9, "z", "d2")))
    spark.sql("CREATE TABLE dml_ctas USING parquet AS SELECT id, v FROM dml_t WHERE ds = 'd2'")
    assert(spark.table("dml_ctas").as[(Int, String)].collect().toSeq == Seq((9, "z")))
    Seq("dml_t", "dml_ctas").foreach(CatalogWriter.drop(spark, _))
  }

  test("CBO: ANALYZE stats drive join reordering (small side joins first)") {
    import graft.io.CatalogWriter
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val names = Seq("cbo_big", "cbo_mid", "cbo_small")
    names.foreach { t =>
      CatalogWriter.drop(spark, t)
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    spark.range(0, 100000).selectExpr("id % 100 AS k", "id AS payload")
      .write.saveAsTable("cbo_big")
    spark.range(0, 5000).selectExpr("id % 100 AS k", "id AS m")
      .write.saveAsTable("cbo_mid")
    spark.range(0, 10).selectExpr("id AS k", "id AS s")
      .write.saveAsTable("cbo_small")
    names.foreach(t => spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS"))
    val priors = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      // written worst-first: big x mid, then the tiny filter table
      def query() = spark.sql("""
        SELECT count(*) AS n FROM cbo_big b
        JOIN cbo_mid m ON b.k = m.k
        JOIN cbo_small s ON b.k = s.k""")
      def innermostTables(df: org.apache.spark.sql.DataFrame): Set[String] = {
        val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
        val innermost = joins.filter(j => j.collect { case x: Join => x }.length == 1)
        innermost.flatMap(_.collectLeaves().flatMap(_.toString
          .split("[^a-z_]").filter(_.startsWith("cbo_")))).toSet
      }
      priors.foreach { case (k, _) => spark.conf.set(k, "true") }
      val reordered = innermostTables(query())
      assert(reordered == Set("cbo_big", "cbo_small"),
        s"CBO should join the 10-row table first, got innermost = $reordered")
      assert(query().head().getLong(0) == 100000L / 100 * 10 * 50) // 500k rows
      // same syntax without stats-based reorder keeps the written order
      priors.foreach { case (k, _) => spark.conf.set(k, "false") }
      val syntactic = innermostTables(query())
      assert(syntactic == Set("cbo_big", "cbo_mid"),
        s"without CBO the syntactic order should hold, got $syntactic")
    } finally {
      priors.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      names.foreach(CatalogWriter.drop(spark, _))
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // one hot key carrying ~all rows; broadcast disabled so the join
    // must sort-merge, and the skew threshold lowered so the tiny test
    // data still trips the optimizer — at real scale the defaults do.
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      val hot = spark.range(0, 200000).select((col("id") * 0 + 1).as("k"), col("id").as("v"))
        .union(spark.range(0, 50).select((col("id") + 2).as("k"), col("id").as("v")))
      val dim = spark.range(0, 60).select(col("id").as("k"), col("id").as("w"))
      val joined = hot.join(dim, Seq("k"))
      // AQE finalizes the plan on the EXECUTED QueryExecution — count()
      // would run a different one, so execute this frame itself
      assert(joined.collect().length == 200050)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition:\n${plan.take(4000)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("schema evolution: mergeSchema unions columns across partition generations") {
    // an evolving ingest lands a new column in later ds partitions —
    // the union read must surface it, null for the old generation
    val dir = tmpDir("evolve")
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(s"$dir/ds=20240101")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.mode("overwrite").parquet(s"$dir/ds=20240102")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "v", "score", "ds"))
    val rows = merged.select($"id", $"score").as[(Long, Option[Double])].collect().toMap
    assert(rows(1L).isEmpty && rows(2L).contains(9.5))
  }

  test("z-order layout bounds BOTH dimensions per file; single-key sort does not") {
    import graft.ops.Scalars
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select($"l_partkey", $"l_suppkey")
    val dirZ = tmpDir("zorder"); val dirP = tmpDir("psort")
    Scalars.zorderKey(li, "l_partkey", "l_suppkey")
      .repartitionByRange(16, $"zkey").write.mode("overwrite").parquet(dirZ)
    li.repartitionByRange(16, $"l_partkey").write.mode("overwrite").parquet(dirP)
    // a file can be skipped for a suppkey range iff its [min,max]
    // misses it; sf0.001 has 10 suppliers, so [0,2] is a narrow range
    val hi = 2L
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"l_suppkey").as("mn"), max($"l_suppkey").as("mx"))
        .filter($"mn" <= hi) // range [0, hi]; mx >= 0 always
        .count()
    val (z, p) = (filesTouched(dirZ), filesTouched(dirP))
    assert(p == 16L, s"partkey-only sort should leave suppkey unbounded in every file, got $p")
    assert(z <= 8L, s"z-order should confine a narrow suppkey range to few files, got $z")
  }

  test("manifest read opens only the files whose [min,max] overlaps the range") {
    import graft.io.Manifest
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select($"l_orderkey", $"l_shipdate", $"l_quantity")
    val dir = tmpDir("manifest")
    Manifest.writeWithManifest(li, dir, "l_shipdate", numFiles = 8)
    val total = spark.read.parquet(s"$dir/data").inputFiles.length
    val lo = lit("1995-03-01").cast("timestamp_ntz")
    val hi = lit("1995-06-30").cast("timestamp_ntz")
    val cand = Manifest.candidateFiles(spark, dir, lo, hi)
    // ~4 months of a 7-year domain range-laid across 8 files → 1-2 files
    assert(total == 8, s"expected 8 data files, got $total")
    assert(cand.nonEmpty && cand.length <= 2,
      s"expected the range to survive in <=2 of 8 files, got ${cand.length}")
    // pruned read == unpruned filter, exactly
    val pruned = Manifest.readPruned(spark, dir, "l_shipdate", lo, hi)
    val full = li.filter($"l_shipdate" >= lo && $"l_shipdate" <= hi)
    assert(pruned.count() == full.count())
    assert(pruned.agg(sum($"l_quantity")).head().getDouble(0)
      == full.agg(sum($"l_quantity")).head().getDouble(0))
    // and the files the pruned plan actually reads are the candidates
    assert(pruned.inputFiles.toSet == cand.toSet)
  }

  test("HLL sketches: per-batch sketches unioned == one-shot sketch estimate") {
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select($"l_returnflag", year($"l_shipdate").as("yr"), $"l_partkey")
    val direct = li.groupBy($"l_returnflag")
      .agg(hll_sketch_estimate(hll_sketch_agg($"l_partkey")).as("est"))
      .as[(String, Long)].collect().toMap
    val merged = li.groupBy($"l_returnflag", $"yr")
      .agg(hll_sketch_agg($"l_partkey").as("sk"))
      .groupBy($"l_returnflag")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .as[(String, Long)].collect().toMap
    // the sketch is mergeable by construction: batch-wise union must
    // give the identical estimate (same registers), not merely a close one
    assert(merged == direct, s"merged=$merged direct=$direct")
  }

  test("incremental agg: appending a late batch's partial re-merges to the full recompute") {
    import graft.ops.Aggregates
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
      .select($"l_returnflag", $"l_shipdate", graft.ops.Scalars.dec($"l_quantity").as("qty"))
    val dir = tmpDir("partials")
    // day 1: history arrives in two batches; partials persisted
    val old = li.filter(year($"l_shipdate") <= 1995)
    Aggregates.algebraicPartial(old.filter(year($"l_shipdate") <= 1993), Seq("l_returnflag"), "qty")
      .write.mode("overwrite").parquet(dir)
    Aggregates.algebraicPartial(old.filter(year($"l_shipdate") > 1993), Seq("l_returnflag"), "qty")
      .write.mode("append").parquet(dir)
    // day 2: a late batch appends ITS partial only — no history rescan
    Aggregates.algebraicPartial(li.filter(year($"l_shipdate") > 1995), Seq("l_returnflag"), "qty")
      .write.mode("append").parquet(dir)
    val served = Aggregates.mergePartials(spark.read.parquet(dir), Seq("l_returnflag"))
      .select($"l_returnflag", $"sum_val".cast("string"), $"n_val", $"min_val".cast("string"), $"max_val".cast("string"))
      .collect().toSet
    val full = Aggregates.mergePartials(
      Aggregates.algebraicPartial(li, Seq("l_returnflag"), "qty"), Seq("l_returnflag"))
      .select($"l_returnflag", $"sum_val".cast("string"), $"n_val", $"min_val".cast("string"), $"max_val".cast("string"))
      .collect().toSet
    assert(served == full)
  }

  test("state bound AT VOLUME: 100k-event file feed drains with state ∝ live window") {
    // The toy MemoryStream eviction tests prove the semantics; this one
    // proves the BOUND at volume on the real ingest shape: 10 key- and
    // month-shifted replicas of the sf0.01 events table (100k rows,
    // ~310 days of event time) staged as 10 time-ordered parquet slices
    // and drained through the watermark dedup one file per micro-batch.
    // Each slice jumps the watermark a month forward, so the store must
    // hold ~one slice's keys at its post-batch peak and evict all of
    // the previous slice — state ∝ live window, never ∝ corpus drained.
    val src = Tables(spark, "/root/testdata/sf0.01").events
      .select($"event_id", $"ts")
    val base = new java.io.File(tmpDir("volume_feed"))
    org.apache.commons.io.FileUtils.deleteQuietly(base)
    base.mkdirs()
    (0 until 10).foreach { k =>
      val tmp = new java.io.File(base, s"_stage_$k")
      src.select(($"event_id" + lit(k * 10000000L)).as("event_id"),
          ($"ts" + expr(s"INTERVAL ${k * 31} DAYS")).as("ts"))
        .coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(base, f"slice-$k%05d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1700000000000L + k * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(tmp)
    }
    val feed = spark.readStream
      .schema(spark.read.parquet(base.getAbsolutePath).schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(base.getAbsolutePath)
    val q = Streams.dedupWithinWatermark(feed).writeStream
      .format("memory").queryName("volume_dedup_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // every replica-unique event_id passes the dedup
      assert(spark.table("volume_dedup_out").count() == 100000L)
      val ps = q.recentProgress.filter(_.stateOperators.nonEmpty)
      assert(ps.length >= 10, s"expected >=10 stateful micro-batches, got ${ps.length}")
      val peak = ps.map(_.stateOperators.map(_.numRowsTotal).sum).max
      val removed = ps.map(_.stateOperators.map(_.numRowsRemoved).sum).sum
      // post-batch state is one slice's 10k keys (+ watermark-lag slack),
      // NOT the 100k drained; slices 1-9 must have been evicted en route
      assert(peak <= 25000L, s"state peaked at $peak rows — growing with the corpus")
      assert(removed >= 80000L, s"watermark should evict the drained slices, removed=$removed")
    } finally q.stop()
  }
}
