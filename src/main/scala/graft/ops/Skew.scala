package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — the 100 TB complement to AQE's
  * runtime skew-join splitting (which only engages for sort-merge joins
  * past size thresholds; salting works for any join shape and is
  * plannable up front when the hot keys are known or bounded).
  *
  * Mechanics: the skewed (large) side gets a uniform random salt in
  * [0, buckets); the small side is replicated once per salt value; the
  * join key becomes (key, salt). A key holding p% of all rows then
  * spreads over `buckets` tasks instead of one straggler. Join results
  * are identical to the unsalted join — the salt never leaves the
  * operator (and the oracle for the demo query is the PLAIN join).
  */
object Skew {

  /** Inner equi-join of a skewed large side against a small side on
    * `key`, salted into `buckets` sub-keys.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String, buckets: Int): DataFrame = {
    val salted = skewed.withColumn("__salt", (rand(seed = 7) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage aggregation under key skew: aggregate on (key, salt)
    * first — the hot key's rows spread over `buckets` reducers — then
    * merge the per-salt partials by key. Every aggregate used must be
    * decomposable into partial + merge (sums/counts/min/max are; avg
    * must be carried as sum+count). Results are identical to the plain
    * groupBy — the salt never escapes. NOTE Spark's own hash aggregate
    * already does map-side partial aggregation, which absorbs most
    * groupBy skew; explicit salting is for the residue (e.g. partials
    * defeated by high per-partition key cardinality).
    */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
      partials: Seq[org.apache.spark.sql.Column],
      merges: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withColumn("__salt", (rand(seed = 7) * buckets).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
}
