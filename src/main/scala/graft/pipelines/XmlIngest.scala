package graft.pipelines

import graft.io.{PartitionedWriter, Sources}
import graft.ops.Scalars
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Re-expression of the reference's XML/HTTP ingestion driver
  * (`Ingestion Data (XML).py:32-167`), as a pure function pipeline:
  *
  *   fetch (injectable) -> CSV parse w/ explicit schema -> allowlist
  *   semi-join -> conform (parse time, +7 h WIB shift, date parts,
  *   ds stamp) -> ds-partitioned parquet write
  *
  * Intended semantics per SURVEY §0.1 (the reference's published code
  * has typo'd column names `transaksi`/`trhoughput` and an overwritten
  * `waktu`): the six requested columns are `aplikasi, titik,
  * transactions, delay, throughput, waktu` plus derived ds/date parts.
  *
  * Scale: the reference fetches serially on the driver; here the fetch
  * is behind [[Sources.Fetcher]], so slices can fan out (one task per
  * slice via a slice table) without touching conform/write.
  */
object XmlIngest {

  val responseSchema: StructType = StructType(Seq(
    StructField("aplikasi", StringType), StructField("titik", StringType),
    StructField("transactions", DoubleType), StructField("delay", DoubleType),
    StructField("throughput", DoubleType), StructField("waktu", StringType),
    StructField("appId_String", StringType)))

  /** Parse + conform one CSV payload (the API's response format). */
  def conform(spark: SparkSession, payload: String, allowlist: DataFrame, ds: String): DataFrame = {
    val raw = Sources.csvPayload(spark, payload, responseSchema)
    val allowed = raw.join(broadcast(allowlist),
      raw("appId_String") === allowlist("app_string"), "left_semi")
    // `waktu` arrives as ISO text here (the reference's ctime-like
    // `E MMM d HH:mm:ss z yyyy` needs the legacy parser on Spark 4 —
    // SURVEY §7.5/1; the parse seam is this one to_timestamp call).
    val stamped = allowed
      .withColumn("waktu_ts", Scalars.shiftToWib(to_timestamp(col("waktu"), "yyyy-MM-dd HH:mm:ss")))
      .withColumn("waktu", date_format(col("waktu_ts"), "dd-MM-yyyy HH:mm:ss"))
      .withColumn("ds", lit(ds))
    Scalars.datePartsOfDmy(col("waktu"))
      .foldLeft(stamped) { case (df, (name, c)) => df.withColumn(name, c) }
      .select("aplikasi", "titik", "transactions", "delay", "throughput",
        "waktu", "waktu_string", "tahun", "bulan", "tanggal", "jam", "menit", "ds")
  }

  /** Full slice loop: fetch each request, conform, union, write once.
    * One write per batch of slices (the reference wrote per 5-min slice:
    * 288 tiny writes/day; batching is the first 100 TB fix).
    */
  def run(spark: SparkSession, fetcher: Sources.Fetcher, requests: Seq[String],
      allowlist: DataFrame, ds: String, outPath: String): Long = {
    val frames = requests.map(r => conform(spark, fetcher.fetch(r), allowlist, ds))
    val all = frames.reduce(_ unionByName _)
    PartitionedWriter.writePartitioned(all, outPath)
    spark.read.parquet(outPath).filter(col("ds") === ds).count()
  }
}
