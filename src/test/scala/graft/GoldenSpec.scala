package graft

import org.apache.spark.sql.functions._

/** Golden-output fixture (SURVEY §5.4): the flagship entry on the
  * deterministic seed=42 sf0.001 testdata. A full-row snapshot would be
  * brittle noise; instead pin the row count, schema, and an
  * order-insensitive content checksum plus a handful of aggregate
  * invariants — any semantic drift in join/pivot/derivation logic moves
  * at least one of them.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  lazy val entry = SparkEntry.entry(spark).cache()

  test("flagship entry: row count and schema are pinned") {
    assert(entry.count() == 1473)
    assert(entry.columns.toSeq == Seq("o_orderkey", "n_name", "qty_in", "qty_out",
      "qty_total", "waktu", "waktu_string", "tahun", "bulan", "tanggal", "jam", "menit", "ds"))
  }

  test("flagship entry: content checksum is pinned (order-insensitive)") {
    // bit_xor of per-row hashes: commutative, so partition order is irrelevant
    val checksum = entry
      .select(xxhash64(entry.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(checksum == goldenChecksum, s"content checksum drifted: $checksum")
  }

  test("flagship entry: pivot totals reconcile with raw lineitem") {
    val totalQty = entry.agg(sum($"qty_total".cast("decimal(18,2)"))).head().getDecimal(0)
    val rawQty = Tables(spark, "/root/testdata/sf0.001").lineitem
      .join(Tables(spark, "/root/testdata/sf0.001").orders,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(totalQty == rawQty) // the pivot must conserve quantity mass
  }

  // recorded from the first green run (seed=42 data is immutable)
  private val goldenChecksum = GoldenSpec.RecordedChecksum
}

object GoldenSpec {
  // To re-record after an INTENTIONAL semantic change:
  //   tools/run.sh graft.tools.Golden
  val RecordedChecksum: Long = -6274999214187973396L
}
