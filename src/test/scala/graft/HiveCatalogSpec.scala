package graft

import graft.io.{CatalogWriter, PartitionedWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The catalog road against a REAL Hive metastore (reference parity:
  * `enableHiveSupport()`, `Ingestion Data (MySQL).py:81`) — an embedded
  * Derby-backed metastore, the stock Hive dev deployment. Runs in its
  * own forked JVM (build.sbt testGrouping): `catalogImplementation` is
  * a static conf the first session pins, and every other suite needs
  * the in-memory catalog.
  *
  * Everything [[graft.io.CatalogWriter]] does — saveAsTable with
  * partitions, SHOW PARTITIONS watermark, TRUNCATE…PARTITION replay
  * guard, append-by-name — must behave identically to the in-memory
  * catalog runs in `ScaleOpsSpec`; this suite pins exactly that.
  */
class HiveCatalogSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val base = new java.io.File("target/tmp-test/hive").getAbsoluteFile
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(base); base.mkdirs()
    System.setProperty("derby.system.home", s"$base/derby")
    val s = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$base/metastore_db;create=true")
      .enableHiveSupport())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("session runs on the hive catalog (not in-memory)") {
    assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
  }

  test("metastore round: saveAsTable partitions, SHOW PARTITIONS watermark, truncate replay") {
    import spark.implicits._
    val table = "hive_catalog_orders"
    CatalogWriter.drop(spark, table)

    val day1 = Seq((1L, 10.0, "20240101"), (2L, 20.0, "20240101"),
      (3L, 30.0, "20240102")).toDF("id", "amt", "ds")
    CatalogWriter.writeTable(day1, table)

    // watermark via SHOW PARTITIONS against the Derby metastore
    assert(CatalogWriter.maxPartition(spark, table).contains("20240102"))

    // append a later day; watermark advances
    val day3 = Seq((4L, 40.0, "20240103")).toDF("id", "amt", "ds")
    CatalogWriter.writeTable(day3, table)
    assert(CatalogWriter.maxPartition(spark, table).contains("20240103"))

    // idempotent replay: re-ingest day 2 with corrected rows —
    // truncate-then-append replaces ONLY that partition
    val day2Fixed = Seq((3L, 33.0, "20240102"), (5L, 50.0, "20240102"))
      .toDF("id", "amt", "ds")
    CatalogWriter.truncateThenAppend(day2Fixed, table)
    val byDs = spark.table(table).groupBy($"ds")
      .agg(count(lit(1)).as("n"), sum($"amt").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byDs("20240101") == ((2L, 30.0)))
    assert(byDs("20240102") == ((2L, 83.0)))
    assert(byDs("20240103") == ((1L, 40.0)))

    // replay of a brand-new day is a no-op guard + append
    CatalogWriter.truncateThenAppend(
      Seq((6L, 60.0, "20240104")).toDF("id", "amt", "ds"), table)
    assert(CatalogWriter.maxPartition(spark, table).contains("20240104"))

    // catalog watermark == path-road watermark over the same location
    val loc = CatalogWriter.tableLocation(spark, table)
    assert(PartitionedWriter.maxPartition(spark, loc).contains("20240104"))

    CatalogWriter.drop(spark, table)
  }

  test("DROP + REFRESH DDL and metastore persistence across sessions") {
    import spark.implicits._
    val table = "hive_catalog_refresh"
    CatalogWriter.drop(spark, table)
    CatalogWriter.writeTable(
      Seq((1L, 1.0, "20240101")).toDF("id", "amt", "ds"), table)
    CatalogWriter.refresh(spark, table)
    // a NEW session on the same metastore still sees the table — the
    // persistence the in-memory catalog cannot provide
    val s2 = spark.newSession()
    assert(s2.catalog.tableExists(table))
    assert(s2.table(table).count() == 1)
    CatalogWriter.drop(spark, table)
    assert(!spark.catalog.tableExists(table))
  }
}
