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
