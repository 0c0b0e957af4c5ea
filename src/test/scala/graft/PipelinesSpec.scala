package graft

import graft.io.{PartitionedWriter, Sources}
import graft.pipelines.{Enrich, MySqlIngest, XmlIngest}
import org.apache.spark.sql.functions._

/** End-to-end pipeline tests over FIXTURES.md §2-shaped crafted data. */
class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("XmlIngest: fetch -> allowlist -> conform -> partitioned write") {
    val payload =
      """aplikasi,titik,transactions,delay,throughput,waktu,appId_String
        |appA,jakarta,100.0,1.5,2048.0,2024-01-01 20:30:00,A1
        |appB,bandung,50.0,2.5,1024.0,2024-01-01 20:35:00,B2
        |appC,medan,10.0,9.9,512.0,2024-01-01 20:40:00,ZZ""".stripMargin
    val fetcher = new Sources.Fetcher { def fetch(req: String): String = payload }
    val allow = Seq("A1", "B2").toDF("app_string")
    val out = tmpDir("xml_ingest")
    val n = XmlIngest.run(spark, fetcher, Seq("req1"), allow, "20240101", out)
    assert(n == 2) // ZZ filtered by the allowlist semi-join
    val row = spark.read.parquet(out).filter($"aplikasi" === "appA").head()
    assert(row.getAs[String]("waktu") == "02-01-2024 03:30:00") // +7h crosses midnight
    assert(row.getAs[String]("tahun") == "2024" && row.getAs[String]("jam") == "03")
    assert(row.getAs[String]("ds") == "20240101")
  }

  test("MySqlIngest: hourly slices, decimal cast, ds derivation, idempotent rerun") {
    val fixture = Seq(
      (1L, 1704100000L, BigDecimal("18446744073709551615")), // uint64 max survives
      (2L, 1704103600L, BigDecimal("42")),
      (3L, 1704107200L, BigDecimal("7"))
    ).toDF("itemid", "clock", "value")
    val source = (a: Long, b: Long) => fixture.filter($"clock" >= a && $"clock" < b)
    val out = tmpDir("mysql_ingest")
    val n1 = MySqlIngest.run(spark, source, 1704100000L, 1704110800L, out)
    val n2 = MySqlIngest.run(spark, source, 1704100000L, 1704110800L, out) // rerun: same result
    assert(n1 == 3 && n2 == 3)
    val vals = spark.read.parquet(out).select($"value".cast("string")).as[String].collect().toSet
    assert(vals.contains("18446744073709551615"))
    assert(MySqlIngest.watermark(spark, out).contains("20240101"))
  }

  test("MySqlIngest: watermark drives the next incremental window (no re-read, no dupes)") {
    // day 1 = 2024-01-01 WIB, day 2 = 2024-01-02 WIB (clock+7h governs ds)
    // WIB day 20240101 = UTC clocks [1704042000, 1704128400)
    val fixture = Seq(
      (1L, 1704100000L, BigDecimal(1)),  // 2024-01-01 WIB
      (2L, 1704110000L, BigDecimal(2)),  // 2024-01-01 WIB
      (3L, 1704186000L, BigDecimal(3))   // 2024-01-02 WIB
    ).toDF("itemid", "clock", "value")
    val source = (a: Long, b: Long) => fixture.filter($"clock" >= a && $"clock" < b)
    val out = tmpDir("mysql_resume")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    MySqlIngest.run(spark, source, 1704100000L, 1704114000L, out)
    assert(MySqlIngest.watermark(spark, out).contains("20240101"))
    // resume from the watermark boundary: only the unseen window reads
    MySqlIngest.run(spark, source, 1704114000L, 1704190000L, out)
    val ids = spark.read.parquet(out).select($"itemid").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L)) // complete, no duplicates
    assert(MySqlIngest.watermark(spark, out).contains("20240102"))
  }

  test("Enrich: 4-table join + regex derive + single-pass pivot (PROC semantics)") {
    val remotes = Seq(("10.0.0.1", "tipe", "KancaX", "KanwilY", "SiteA", -6.2, 106.8))
      .toDF("remote_ip", "tipe", "kanca", "kanwil", "remote", "latitude", "longitude")
    val hosts = Seq(("router1", "10.0.0.1")).toDF("host_name", "ip")
    val items = Seq(
      (101L, "eth0: uplink (WAN Link)", "net.if.in[eth0]", "router1"),
      (102L, "eth0: uplink (WAN Link)", "net.if.out[eth0]", "router1"),
      (103L, "cpu load", "system.cpu.load", "router1") // no direction -> dropped
    ).toDF("item_id", "name", "key_", "host")
    val fact = Seq(
      (101L, BigDecimal(1000), 1704100800L, "20240101"),
      (102L, BigDecimal(2000), 1704100800L, "20240101"),
      (103L, BigDecimal(50), 1704100800L, "20240101"),
      (101L, BigDecimal(9999), 1704100800L, "20231231") // wrong day -> pruned
    ).toDF("item", "value", "clock", "ds")

    val out = tmpDir("enrich")
    val n = Enrich.run(remotes, hosts, items, fact, "20240101", out)
    assert(n == 1) // in+out pivot onto one row
    val row = spark.read.parquet(out).head()
    assert(row.getAs[String]("description") == "WAN Link")
    assert(row.getAs[String]("interface") == "eth0")
    assert(row.getAs[Double]("throughput_in") == 1000.0)
    assert(row.getAs[Double]("throughput_out") == 2000.0)
    assert(row.getAs[Double]("throughput_bps") == 3000.0)
    assert(row.getAs[String]("display_key") == "tipe - 10.0.0.1 - SiteA")
    assert(row.getAs[String]("jam") == "16") // 09:20 UTC + 7h = 16:20 WIB
  }

  test("PartitionedWriter: dynamic overwrite replaces only present partitions") {
    val out = tmpDir("writer_dynamic")
    val day1 = Seq((1, "20240101"), (2, "20240101"), (3, "20240102")).toDF("id", "ds")
    PartitionedWriter.writePartitioned(day1, out, compact = false)
    // rewrite day 2 only, with different content
    val day2v2 = Seq((99, "20240102")).toDF("id", "ds")
    PartitionedWriter.writePartitioned(day2v2, out, compact = false)
    val got = spark.read.parquet(out).select("id", "ds").as[(Int, String)].collect().toSet
    assert(got == Set((1, "20240101"), (2, "20240101"), (99, "20240102")))
    assert(PartitionedWriter.maxPartition(spark, out).contains("20240102"))
  }

  test("upsertByKey: replaces matched keys, keeps the rest, appends new, spares other partitions") {
    val out = tmpDir("upsert")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    PartitionedWriter.upsertByKey(
      Seq((1, "a", "d1"), (2, "b", "d1"), (9, "z", "d2")).toDF("id", "v", "ds"),
      out, "id")
    // second batch touches only d1: update key 2, add key 3
    PartitionedWriter.upsertByKey(
      Seq((2, "b2", "d1"), (3, "c", "d1")).toDF("id", "v", "ds"), out, "id")
    val got = spark.read.parquet(out).select($"id", $"v", $"ds")
      .as[(Int, String, String)].collect().toSet
    assert(got == Set((1, "a", "d1"), (2, "b2", "d1"), (3, "c", "d1"), (9, "z", "d2")))
  }

  test("runAudited: observe counters ride the materializing action, stage counts consistent") {
    val docs = Tables(spark, "/root/testdata/sf0.001").documents
    val (out, metrics) = graft.pipelines.CorpusClean.runAudited(docs)
    val emitted = out.count()
    val m = metrics()
    assert(m("emitted") == emitted, s"observed ${m("emitted")} != action count $emitted")
    assert(m("survivors") >= m("near_deduped"), s"dedup cannot add rows: $m")
    assert(m("near_deduped") >= m("emitted"), s"quality gate cannot add rows: $m")
    assert(m("survivors") <= docs.count())
    // the audited run changes nothing about the data itself
    assert(emitted == graft.pipelines.CorpusClean.run(docs).count())
  }

  test("csvQuarantine: malformed rows land whole in _corrupt, clean rows parse") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("csv-quarantine")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/part.csv"),
      "id,qty\n1,10\nnot-a-number,oops,extra\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("qty", IntegerType)))
    // Spark disallows querying ONLY the corrupt column off the raw
    // file (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parse first
    val got = graft.io.Sources.csvQuarantine(spark, dir, schema).cache()
    val clean = got.filter($"_corrupt".isNull).select($"id", $"qty")
      .as[(Int, Int)].collect().toSet
    val bad = got.filter($"_corrupt".isNotNull).select($"_corrupt").as[String].collect()
    assert(clean == Set((1, 10), (3, 30)))
    assert(bad.toSeq == Seq("not-a-number,oops,extra")) // audit trail, job survived
  }

  test("TrainingPrep.runV2: durable stage boundaries match localCheckpoint byte-for-byte") {
    // The reliability-grade 100 TB form (stage outputs persisted to
    // storage, restartable) must be a pure persistence swap — same
    // rows, same values, nothing about the composed result may depend
    // on WHERE the stage boundary lives.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text", $"lang")
    val dir = tmpDir("runv2-durable")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val local = graft.pipelines.TrainingPrep.runV2(docs)
      .collect().map(_.toString).sorted
    val durable = graft.pipelines.TrainingPrep.runV2(docs,
        stageDir = Some(dir))
      .collect().map(_.toString).sorted
    assert(local.length > 0 && local.sameElements(durable))
    // and the durable form really did persist all three stage frames
    (0 to 2).foreach { i =>
      assert(new java.io.File(s"$dir/stage$i/_SUCCESS").exists(), s"stage$i missing")
    }
  }
}
