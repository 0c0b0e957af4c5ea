package graft

import org.apache.spark.sql.functions._

/** Executable documentation for SURVEY §0.1 — the reference's published
  * code contains defects we deliberately do NOT reproduce; these tests
  * pin the reasons.
  */
class ReferenceDefectsSpec extends SparkSpec {
  import spark.implicits._

  test("§0.1/8: the reference's week-year 'YYYY' pattern is rejected by Spark 4") {
    val df = Seq("2024-06-15 10:30:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    // `Processing Data.py:171` uses 'YYYY-MM-dd HH:mm:00' — legal on its
    // Spark 2.x, refused by the 3+/4 datetime formatter
    val err = intercept[Exception] {
      df.select(date_format($"ts", "YYYY-MM-dd HH:mm:00")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("y"), err.getMessage)
    // the engine's corrected pattern works and minute-floors as intended
    val got = df.select(date_format($"ts", "yyyy-MM-dd HH:mm:00")).as[String].head()
    assert(got == "2024-06-15 10:30:00")
  }

  test("§0.1/3 intent: ctime-like timestamps parse under the LEGACY time parser") {
    // `Ingestion Data (XML).py:141` parses 'E MMM d HH:mm:ss z yyyy';
    // Spark 4's default parser refuses the day-name/zone-name fields —
    // the engine confines that dialect behind the LEGACY policy switch
    val prev = spark.conf.get("spark.sql.legacy.timeParserPolicy")
    try {
      spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
      val got = Seq("Sat Jun 15 10:30:00 2024").toDF("s")
        .select(date_format(to_timestamp($"s", "E MMM d HH:mm:ss yyyy"),
          "yyyy-MM-dd HH:mm:ss").as("iso"))
        .as[String].head()
      assert(got == "2024-06-15 10:30:00")
    } finally spark.conf.set("spark.sql.legacy.timeParserPolicy", prev)
  }

  test("§0.1/1 intent: one shared partitioned writer serves every ingest road") {
    // `XML:157` calls a writeTable that file never defines (it lives at
    // `SQL:33-65`/`PROC:33-65`); the intended semantics is ONE shared
    // utility — here CatalogWriter.writeTable — that any road can call
    val table = "defect1_pin"
    try {
      graft.io.CatalogWriter.writeTable(
        Seq((1L, "a", "20240101"), (2L, "b", "20240102")).toDF("id", "v", "ds"), table)
      assert(spark.table(table).count() == 2)
      // append road (second ingest) goes through the same utility
      graft.io.CatalogWriter.writeTable(
        Seq((3L, "c", "20240103")).toDF("id", "v", "ds"), table)
      assert(spark.table(table).count() == 3)
    } finally graft.io.CatalogWriter.drop(spark, table)
  }

  test("§0.1/2 intent: the XML-road schema carries the six REQUESTED columns, not the typos") {
    // `XML:133-139` selects `transaksi`/`trhoughput` though the request
    // (`XML:96-101`) asks for `transactions`/`throughput` — the engine
    // ingests exactly the requested names
    import org.apache.spark.sql.types._
    val dir = tmpDir("defect2_csv")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/slice.csv"),
      "aplikasi,titik,transactions,delay,throughput,waktu\n" +
        "app1,site1,42,1.5,99.5,2024-06-15 10:30:00\n")
    val schema = StructType(Seq(
      StructField("aplikasi", StringType), StructField("titik", StringType),
      StructField("transactions", LongType), StructField("delay", DoubleType),
      StructField("throughput", DoubleType), StructField("waktu", StringType)))
    val got = graft.io.Sources.csvWithSchema(spark, s"$dir/slice.csv", schema)
    assert(got.columns.toSeq ==
      Seq("aplikasi", "titik", "transactions", "delay", "throughput", "waktu"))
    assert(!got.columns.contains("transaksi") && !got.columns.contains("trhoughput"))
    assert(got.select($"transactions", $"throughput").as[(Long, Double)].head() == ((42L, 99.5)))
  }

  test("§0.1/4 intent: the table NAME reaches the writer, not a success boolean") {
    // `XML:47` binds table = "raw_table", then `XML:150/153` shadow it
    // with a boolean flag, so `XML:157` writes to a table named like the
    // flag — here the name given is the name created, and no flag-named
    // table appears
    val table = "defect4_pin"
    try {
      graft.io.CatalogWriter.writeTable(
        Seq((1L, "20240101")).toDF("id", "ds"), table)
      assert(spark.catalog.tableExists(table))
      assert(!spark.catalog.tableExists("true") && !spark.catalog.tableExists("false"))
    } finally graft.io.CatalogWriter.drop(spark, table)
  }

  test("§0.1/5 intent: size-adaptive compaction really derives its fan-out from stats") {
    // `SQL:43` references undefined `pathf`; the except at `SQL:46-48`
    // swallows it so repartition_number silently stays 1 — the engine's
    // road computes the count from Catalyst stats with no fallback path
    val li = Tables(spark, "/root/testdata/sf0.001").lineitem
    val bytes = li.queryExecution.optimizedPlan.stats.sizeInBytes
    // a parquet scan must carry REAL stats (the unknown sentinel is the
    // only input the formula refuses)
    assert(bytes < BigInt(Long.MaxValue) / 2, s"parquet scan reported unknown stats: $bytes")
    val expected = math.min(
      math.max(1, ((bytes + graft.io.PartitionedWriter.targetFileBytes - 1)
        / graft.io.PartitionedWriter.targetFileBytes).toInt),
      graft.io.PartitionedWriter.maxOutputFiles)
    assert(graft.io.PartitionedWriter.sizeAdaptive(li).rdd.getNumPartitions == expected)
  }

  test("§0.1/6 intent: the substring date-part derivations the broken import aimed at") {
    // `PROC:212-215` call `F.substring`/`lit` with only `f` imported;
    // the intended derivation is fixed-position parts of the
    // dd-MM-yyyy HH:mm:ss string
    val parts = graft.ops.Scalars.datePartsOfDmy(lit("15-06-2024 10:30:45")).toMap
    val got = Seq(1).toDF("x").select(
        parts("tahun").as("tahun"), parts("bulan").as("bulan"),
        parts("tanggal").as("tanggal"), parts("jam").as("jam"), parts("menit").as("menit"))
      .as[(String, String, String, String, String)].head()
    assert(got == (("2024", "06", "15", "10", "30")))
  }

  test("§0.1/7 intent: the de-mangled regexes extract description and direction") {
    val df = Seq(
      ("eth0: uplink (WAN Link) extra", "net.if.in[eth0]"),
      ("no parens here", "net.if.out[eth1]"))
      .toDF("name", "key_")
    val got = df.select(
      graft.ops.Scalars.extractParenthesized($"name").as("description"),
      graft.ops.Scalars.extractDirection($"key_").as("direction"))
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("WAN Link", "in"), ("", "out")))
  }
}
