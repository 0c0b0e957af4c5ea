package graft.io.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 re-expression of the reference's HTTP XML-query
  * ingestion (`Ingestion Data (XML).py:70-127`) — SURVEY §2.A A2's
  * "productionize later as DataSource V2", done.
  *
  * The reference fetches 5-minute slices in a serial driver `while`
  * loop: ingest throughput is one HTTP round-trip at a time, and the
  * driver is the bottleneck at any scale. Here the time range is
  * planned as ONE InputPartition PER SLICE, so the fetch+parse runs on
  * executors, `slices / cores` deep — the same transform pipeline
  * downstream, now horizontally scaled. Options: `start`, `end`
  * (epoch seconds), `step` (slice width, seconds), `fetcher` (name in
  * [[FetcherRegistry]]).
  *
  * Usage: `spark.read.format("graft.io.v2.SliceSource")
  *   .option("start", 0).option("end", 3600).option("step", 600).load()`
  *
  * The default "synthetic" fetcher emits a deterministic md5-derived
  * CSV payload per slice (100 rows: app id, 2-decimal metric,
  * row timestamp), so the source is testable offline AND its results
  * are reproducible in the DuckDB oracle. A production deployment
  * registers a real HTTP fetcher under a new name; nothing else
  * changes.
  */
class SliceSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SliceSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new SliceTable(properties)
  override def supportsExternalMetadata(): Boolean = false
}

object SliceSource {
  val schema: StructType = StructType(Seq(
    StructField("slice_start", LongType, nullable = false),
    StructField("app", StringType, nullable = false),
    StructField("metric", DoubleType, nullable = false),
    StructField("ts", LongType, nullable = false)))

  val rowsPerSlice = 100
}

/** Fetch seam (the A2 `Fetcher` lifted to executor side): payloads are
  * produced by NAME so the fetcher ships to executors as a string, not
  * a closure. The synthetic fetcher's payload for slice `t` is the CSV
  *   app,metric,ts
  *   app{i%5},{(md5int32("t|i") % 10000) / 100.0},{t + i*step/100}
  * for i in [0, rowsPerSlice).
  */
object FetcherRegistry {
  type SliceFetcher = (Long, Long) => String // (sliceStart, step) => CSV payload

  private val synthetic: SliceFetcher = (t, step) => {
    val sb = new StringBuilder("app,metric,ts\n")
    var i = 0
    while (i < SliceSource.rowsPerSlice) {
      val h = graft.expressions.TextSketch.md5Int32(
        java.security.MessageDigest.getInstance("MD5").digest(s"$t|$i".getBytes("UTF-8")))
      val metric = (h % 10000).toDouble / 100.0
      sb.append(s"app${i % 5},$metric,${t + i * step / SliceSource.rowsPerSlice}\n")
      i += 1
    }
    sb.toString
  }

  @volatile private var fetchers: Map[String, SliceFetcher] = Map("synthetic" -> synthetic)

  def register(name: String, f: SliceFetcher): Unit = synchronized { fetchers += name -> f }
  def get(name: String): SliceFetcher =
    fetchers.getOrElse(name, throw new IllegalArgumentException(s"unknown fetcher: $name"))
}

class SliceTable(props: util.Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_slice_source"
  override def schema(): StructType = SliceSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val start = options.getLong("start", 0L)
    val end = options.getLong("end", start)
    val step = options.getLong("step", 300L)
    val fetcher = options.getOrDefault("fetcher", "synthetic")
    new SliceScanBuilder(start, end, step, fetcher)
  }
}

/** Pushes `slice_start` comparisons into slice planning: a time-range
  * predicate narrows [start, end) BEFORE partitions are planned, so
  * pruned slices are never fetched at all — the source-side analogue
  * of partition pruning, and the reason a day-scoped query over a
  * year-wide source costs a day. Pushed filters are consumed (not
  * re-evaluated by Spark), so the slice arithmetic must be EXACT;
  * all other predicates stay residual.
  */
class SliceScanBuilder(start0: Long, end0: Long, step: Long, fetcher: String)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var start = start0
  private var end = end0
  private var pushed: Array[Filter] = Array.empty

  private def alignDown(v: Long): Long = start0 + ((v - start0) / step) * step

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThanOrEqual("slice_start", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("slice_start", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("slice_start", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("slice_start", _: java.lang.Long | _: java.lang.Integer) => true
      case EqualTo("slice_start", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    def lv(v: Any): Long = v match { case l: java.lang.Long => l; case i: java.lang.Integer => i.toLong }
    accepted.foreach {
      case GreaterThanOrEqual(_, v) => start = math.max(start, alignDown(lv(v)) + (if (lv(v) == alignDown(lv(v))) 0 else step))
      case GreaterThan(_, v) => start = math.max(start, alignDown(lv(v)) + step)
      case LessThan(_, v) => end = math.min(end, alignDown(lv(v)) + (if (lv(v) == alignDown(lv(v))) 0 else step))
      case LessThanOrEqual(_, v) => end = math.min(end, alignDown(lv(v)) + step)
      case EqualTo(_, v) =>
        if (lv(v) == alignDown(lv(v))) {
          start = math.max(start, lv(v)); end = math.min(end, lv(v) + step)
        } else end = start // not a slice boundary: no slice matches
      case _ =>
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SliceScan(start, math.max(start, end), step, fetcher)
}

final case class SlicePartition(sliceStart: Long, step: Long, fetcher: String)
  extends InputPartition

class SliceScan(start: Long, end: Long, step: Long, fetcher: String) extends Scan with Batch {
  override def readSchema(): StructType = SliceSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft slice source [$start, $end) step $step fetcher=$fetcher"

  override def planInputPartitions(): Array[InputPartition] =
    (start until end by step).map(t => SlicePartition(t, step, fetcher): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SlicePartition]
      new PartitionReader[InternalRow] {
        // executor-side fetch: this is the line the reference ran on
        // the driver, once per slice, serially
        private val lines = FetcherRegistry.get(p.fetcher)(p.sliceStart, p.step)
          .split("\n").iterator.drop(1).filter(_.nonEmpty)
        private var current: InternalRow = _
        override def next(): Boolean = {
          if (!lines.hasNext) return false
          val parts = lines.next().split(",")
          current = InternalRow(
            p.sliceStart, UTF8String.fromString(parts(0)),
            parts(1).toDouble, parts(2).toLong)
          true
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
}
