package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar function surface — SURVEY.md §2.D. Everything is built from
  * `org.apache.spark.sql.functions` so it stays inside whole-stage
  * codegen; no Scala UDFs in the hot path.
  *
  * The reference's scalar vocabulary (file:line cited per member) is a
  * network-monitoring enrichment kit: regex field extraction, fixed-
  * position date parts of a `dd-MM-yyyy HH:mm:ss` string, epoch maths,
  * and a constant UTC→WIB (+7 h) shift.
  */
object Scalars {

  /** D1 — text inside the first parentheses, e.g. `"eth0: up (WAN Link)"`
    * → `"WAN Link"` (reference `Processing Data.py:152,156`; intended
    * regex per SURVEY §0.1/7).
    */
  val descriptionPattern = "^[^(]*\\(([^)]*)\\).*$"
  def extractParenthesized(c: Column): Column = regexp_extract(c, descriptionPattern, 1)

  /** D1 — direction (`in`/`out`) from a Zabbix item key like
    * `net.if.in[eth0]` (reference `Processing Data.py:153,157`).
    */
  val directionPattern = "^net\\.if\\.([^\\[]+)\\[.*$"
  def extractDirection(c: Column): Column = regexp_extract(c, directionPattern, 1)

  /** D2 — text before the first `:` (reference `Processing Data.py:158`:
    * interface name from `"<iface>: description"`).
    */
  def beforeFirst(c: Column, sep: String): Column = substring_index(c, sep, 1)

  /** D3 — `concat(a, ' - ', b, ' - ', c)` composite display key
    * (reference `Processing Data.py:160`).
    */
  def dashConcat(cols: Column*): Column = concat_ws(" - ", cols: _*)

  /** D4 — fixed-position date parts of a `dd-MM-yyyy HH:mm:ss` string
    * (reference `Ingestion Data (XML).py:143-148`, `Processing
    * Data.py:212-214`). 1-based positions, identical in DuckDB.
    */
  def datePartsOfDmy(c: Column): Seq[(String, Column)] = Seq(
    "waktu_string" -> substring(c, 1, 10),
    "tahun"        -> substring(c, 7, 4),
    "bulan"        -> substring(c, 4, 2),
    "tanggal"      -> substring(c, 1, 2),
    "jam"          -> substring(c, 12, 2),
    "menit"        -> substring(c, 15, 2)
  )

  /** D9 — the UTC→WIB normalization the reference applies everywhere
    * (`Ingestion Data (XML).py:141`, `Processing Data.py:209`,
    * `Ingestion Data (MySQL).py:173`). Always the explicit interval
    * operator, never session-timezone config (SURVEY §7.5/2).
    */
  def shiftToWib(ts: Column): Column = ts + expr("INTERVAL 7 HOURS")

  /** D6 — partition-stamp format `yyyyMMdd` (reference `Ingestion Data
    * (MySQL).py:173` — note the reference's `YYYY` week-year defect,
    * SURVEY §0.1/8; Spark 3+ requires `yyyy`).
    */
  def dsOf(ts: Column): Column = date_format(ts, "yyyyMMdd")

  /** D10 — uint64-safe counter cast (reference `Ingestion Data
    * (MySQL).py:171`): Zabbix counters exceed Long range, hence
    * Decimal(20,0).
    */
  def asCounter(c: Column): Column = c.cast(DecimalType(20, 0))

  /** Oracle-parity helper: exact decimal sum of a double column. Summing
    * doubles is partition-order-dependent; casting to decimal first makes
    * the aggregate exact and therefore deterministic at any parallelism —
    * this is the engine-wide rule for every checked aggregate
    * (SURVEY §7.3).
    */
  def dec(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(DecimalType(precision, scale))

  /** Fixed-point exact summation of float-derived doubles: scale by
    * 2^53 (exact for any |x| ≳ 1e-16 double arithmetic — a power-of-two
    * multiply never rounds) and truncate to long. Unlike a
    * double→decimal cast, this is bit-identical across engines (no
    * round-at-scale boundary), so checked aggregates over embedding
    * elements sum `fxLong` and divide back by [[fxScale]] at the end.
    */
  val fxScale: Double = 9007199254740992.0 // 2^53
  def fxLong(c: Column): Column = (c.cast("double") * fxScale).cast("bigint")

  /** Morton (Z-order) interleave of two non-negative dimensions,
    * `bits` bits each: bit i of `a` lands at position 2i, bit i of `b`
    * at 2i+1. Sorting/range-partitioning a table by this key clusters
    * BOTH dimensions into every file, so parquet min/max row-group
    * stats prune selective filters on either column — the multi-column
    * data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER) as one
    * codegen'd integer expression. Pure long arithmetic: bit-identical
    * in the DuckDB oracle.
    */
  def mortonCode(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("bigint"), i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(b.cast("bigint"), i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _) // static unroll: one codegen'd integer expression

  /** Z-order key over two columns with DOMAIN NORMALIZATION: each
    * dimension is min-max scaled to `bits` bits before interleaving.
    * Raw interleave of imbalanced domains degenerates to a single-key
    * sort (the wider column owns every high bit — measured: 16/16
    * files still matched the narrow-range filter), so real layouts
    * normalize first, exactly as Delta/Iceberg Z-ORDER rank columns.
    * One min/max pass (or table stats) broadcast as a 1-row frame;
    * the bucket math is floor((x−mn)·2^bits/(mx−mn+1)) in doubles that
    * stay integer-exact, matching DuckDB bit for bit.
    */
  def zorderKey(df: org.apache.spark.sql.DataFrame, a: String, b: String,
      bits: Int = 8): org.apache.spark.sql.DataFrame = {
    val stats = df.agg(
      min(col(a)).cast("bigint").as("__mna"), max(col(a)).cast("bigint").as("__mxa"),
      min(col(b)).cast("bigint").as("__mnb"), max(col(b)).cast("bigint").as("__mxb"))
    def bucket(x: Column, mn: Column, mx: Column) =
      floor((x.cast("double") - mn.cast("double")) * (1L << bits).toDouble
        / (mx.cast("double") - mn.cast("double") + 1.0)).cast("bigint")
    df.crossJoin(broadcast(stats))
      .withColumn("zkey", mortonCode(
        bucket(col(a), col("__mna"), col("__mxa")),
        bucket(col(b), col("__mnb"), col("__mxb")), bits))
      .drop("__mna", "__mxa", "__mnb", "__mxb")
  }
}
