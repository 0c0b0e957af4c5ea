package graft.io

import org.apache.spark.sql.SparkSession

/** Tiny JSON sidecar (`_graft_meta.json`, underscore-hidden from
  * parquet discovery) recording the parameters a persisted dedup index
  * was written with — bands/rowsPerBand for MinHash, bits/radius/qq for
  * SimHash, plus an optional `src_fp` source fingerprint. Readers
  * validate it so a drifted staging contract fails LOUDLY instead of
  * silently yielding an incomplete candidate set (buckets that never
  * collide), and stagers re-stage when the source fingerprint moved
  * under a surviving index (stale-staging guard).
  *
  * Flat string→string map, hand-rolled writer/parser — no JSON library
  * in the dependency set, and the values are identifiers and integers
  * (no escapes needed by contract).
  */
object IndexMeta {
  val FileName = "_graft_meta.json"

  def write(spark: SparkSession, indexPath: String, kv: Map[String, String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath, FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(
      kv.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":"$v"""" }
        .mkString("{", ",", "}")
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Empty map if the sidecar is missing (pre-meta index or no index at
    * all) — callers decide whether that is a re-stage or a hard error.
    */
  def read(spark: SparkSession, indexPath: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(indexPath, FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val txt =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"([^"]*)":"([^"]*)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }
}
