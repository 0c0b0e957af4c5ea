package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-based access to the harness testdata tables (see TESTDATA.md).
  *
  * The reference reads Hive-catalog tables (`Processing Data.py:173-182`)
  * and JDBC/HTTP sources; the harness equivalent is one parquet file per
  * table under a scale-factor directory. Parquet carries its own schema,
  * so no inference hazard exists here (cf. SURVEY.md §1.2); explicit
  * StructTypes are only needed for schemaless edges (CSV/JDBC), handled
  * in [[graft.io.Sources]].
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 cannot read as
    * a timestamp ([[https://issues.apache.org/jira/browse/SPARK-40819 SPARK-40819]]);
    * sessions set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    * [[graft.GraftSession]]) so it arrives as epoch-nanos LongType. We keep
    * the exact nanos as `ts_ns` (total order identical to the source) and
    * derive a microsecond-truncated `ts` via integer division — never
    * double arithmetic, which cannot represent 1e18-scale nanos exactly.
    */

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame = {
    import org.apache.spark.sql.functions._
    t("events")
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
