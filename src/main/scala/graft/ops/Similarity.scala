package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`) —
  * SURVEY.md §2.J (J2) / north star ANN.
  *
  * Float elements widen to double (exact) before any arithmetic;
  * per-vector folds run in array order, so scores are bit-deterministic
  * at any parallelism. Two search paths:
  *  - brute-force cosine top-k against a broadcast query vector: one
  *    scan, no shuffle except the final TakeOrdered — the correctness
  *    baseline, and fine whenever the query set is small;
  *  - IVF-style partitioning: assign vectors to the nearest of k
  *    centroids, then search only within the probe's cluster(s). At
  *    100 TB the assignment is one scan and subsequent queries touch
  *    1/k of the data; cluster id is also the natural bucketing key
  *    for a co-located self-join.
  */
object Similarity {

  /** Exact dot product of two double-castable array columns — a
    * sequential fold over zip_with (bit-identical to DuckDB list_sum
    * of the element-wise products).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Adds a unit-normalized double copy of `vecCol`. Pair-similarity
    * jobs normalize ONCE per vector so each candidate pair costs a
    * single dot fold instead of dot + two norms — HOF folds run
    * interpreted per element, so at millions of pairs this is the
    * difference between seconds and minutes. The norm lands in its own
    * column first so the transform lambda doesn't re-fold it per
    * element.
    */
  def withNormalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("__norm", norm(col(vecCol)))
      .withColumn(outCol, transform(col(vecCol), x => x.cast("double") / col("__norm")))
      .drop("__norm")

  /** Brute-force cosine top-k of `df.vecCol` against one query vector
    * (as a literal array column, e.g. from a collected row — small,
    * broadcast with the plan). Catalyst plans TakeOrderedAndProject:
    * k rows per partition, merged on the driver.
    */
  def cosineTopK(df: DataFrame, vecCol: String, idCol: String, queryVec: Column, k: Int): DataFrame =
    df.select(col(idCol), cosine(col(vecCol), queryVec).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)

  /** IVF assignment: nearest (squared-L2) of the broadcast `centroids`
    * frame (id + vector). Deterministic tie-break on centroid id. One
    * broadcast join + per-row argmin — no shuffle of the vector side.
    */
  def ivfAssign(df: DataFrame, vecCol: String, idCol: String,
      centroids: DataFrame, cVecCol: String, cIdCol: String): DataFrame = {
    val d2 = aggregate(
      zip_with(col(vecCol), col(cVecCol),
        (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("dist2").asc, col(cIdCol).asc)
    df.join(broadcast(centroids), joinExprs = lit(true), joinType = "cross")
      .withColumn("dist2", d2)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(cIdCol).as("cluster_id"), col("dist2"))
  }

  /** E5 — typed Aggregator: element-wise mean of embedding vectors
    * (cluster centroid). Buffer is (sums, count); merge is element-wise.
    * Exposed via `udaf` for DataFrame use; unit-tested (float summation
    * order across partitions makes it oracle-exempt by design —
    * SURVEY §7.3).
    */
  class CentroidAggregator(dims: Int)
      extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    def zero: (Array[Double], Long) = (Array.fill(dims)(0.0), 0L)
    def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dims && i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
    def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dims) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
    def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq
    def bufferEncoder = Encoders.tuple(Encoders.kryo[Array[Double]], Encoders.scalaLong)
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
