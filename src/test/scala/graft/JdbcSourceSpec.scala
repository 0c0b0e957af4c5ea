package graft

import java.sql.DriverManager

import graft.io.Sources
import org.apache.spark.sql.functions._

/** Live JDBC round-trip for [[Sources.jdbcPushdown]] against embedded
  * Derby (in-process, in-memory — the same jars Spark ships for its
  * Hive metastore, so no new dependency). Proves the two claims the
  * unit seam couldn't:
  *  - the incremental range predicate travels INSIDE the dbtable
  *    subquery, so the database — not Spark — applies it
  *    (`Ingestion Data (MySQL).py:156-169`);
  *  - `partitionColumn` bounds split the read into parallel
  *    connections, the scale fix the reference's single-connection
  *    read lacks.
  */
class JdbcSourceSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graft_jdbc;create=true"
  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE app_events") catch { case _: java.sql.SQLException => }
      st.execute("CREATE TABLE app_events (id BIGINT NOT NULL, ts BIGINT, v DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO app_events VALUES (?, ?, ?)")
      (0 until 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setLong(2, (i * 10).toLong); ins.setDouble(3, i / 2.0)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("pushed subquery reads only the requested range; partitionColumn splits the scan") {
    seed()
    // the reference's incremental hour-window read: range predicate in
    // the subquery, so Derby evaluates it and 40 rows cross the "wire"
    val sub = "SELECT id, ts, v FROM app_events WHERE ts >= 200 AND ts < 600"
    val df = Sources.jdbcPushdown(spark, url, sub, user = "app", password = "app",
      driver = driver, partitionColumn = Some(("id", 0L, 100L, 4)))
    assert(df.rdd.getNumPartitions == 4, "partitionColumn did not split the read")
    assert(df.count() == 40)
    assert(df.agg(min(col("ts")), max(col("ts"))).collect().head.toSeq == Seq(200L, 590L))
    // the subquery itself is the relation Spark plans over — the DB
    // runs it; Spark never sees the other 60 rows
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation((SELECT id, ts, v FROM app_events"),
      s"subquery not pushed as the JDBC relation:\n$plan")
  }

  test("Spark-side filters on top of the pushed subquery still push to the database") {
    seed()
    val df = Sources.jdbcPushdown(spark, url, "SELECT id, ts, v FROM app_events",
      user = "app", password = "app", driver = driver)
      .filter(col("v") > lit(10.0)).select(col("id"), col("v"))
    val plan = df.queryExecution.executedPlan.toString
    // Derby folds unquoted identifiers to upper case — match either
    assert(plan.contains("PushedFilters:") && plan.toUpperCase.contains("GREATERTHAN(V,10.0)"),
      s"residual filter did not push down over JDBC:\n$plan")
    assert(df.count() == 79) // v = i/2.0 > 10 -> i >= 21
  }

  test("MySQL URLs resolve Spark's MySQL dialect with its typing/quoting rules") {
    // The reference connects through jdbc:mysql (`Ingestion Data
    // (MySQL).py:161-168`); no MySQL server exists in this harness, so
    // pin the DIALECT Spark would apply to that URL — backtick
    // identifier quoting and the unsigned-integer WIDENINGS (an
    // unsigned column read into the same-width signed type silently
    // wraps; the dialect widens instead).
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.types._
    val dialect = JdbcDialects.get("jdbc:mysql://db-host:3306/appdb")
    assert(dialect.getClass.getSimpleName.contains("MySQL"),
      s"unexpected dialect ${dialect.getClass}")
    assert(dialect.quoteIdentifier("aplikasi") == "`aplikasi`")
    def md(signed: Boolean) = new MetadataBuilder().putBoolean("isSigned", signed)
    // TINYINT: signed fits a Byte, unsigned needs a Short
    assert(dialect.getCatalystType(java.sql.Types.TINYINT, "TINYINT", 3, md(true))
      .contains(ByteType))
    assert(dialect.getCatalystType(java.sql.Types.TINYINT, "TINYINT UNSIGNED", 3, md(false))
      .contains(ShortType))
    // MEDIUMINT UNSIGNED still fits Int; unsigned INTEGER widens to Long
    assert(dialect.getCatalystType(java.sql.Types.INTEGER, "MEDIUMINT UNSIGNED", 8, md(false))
      .contains(IntegerType))
    // Derby (this suite's live engine) keeps the generic dialect —
    // the registry discriminates by URL, nothing is globally swapped
    assert(!JdbcDialects.get(url).getClass.getSimpleName.contains("MySQL"))
  }
}
