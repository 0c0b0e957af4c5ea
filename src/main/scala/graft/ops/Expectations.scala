package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative row-level data-quality expectations — the ingest-time
  * contract check a production pipeline runs before letting a batch
  * into the lake (reference analogue: the XML road's silent drop of
  * malformed rows, `Ingestion Data (XML).py:101-127`, which loses the
  * evidence; here violations are ROUTED, not dropped).
  *
  * Scale design: every rule is a codegen'd boolean column over one
  * scan — no second pass, no driver-side validation loop. The split
  * is two filters over the same cached/scanned frame; violation
  * labels are built with `concat_ws` over per-rule CASE markers, so
  * the quarantine row carries WHICH contracts it broke. Null
  * three-valued logic is preserved: a NULL predicate neither passes
  * nor labels (same as SQL CASE), so null-hostile rules should
  * spell out `isNotNull`.
  */
object Expectations {

  final case class Rule(name: String, holds: Column)

  /** Marker list: `when(!holds, name)` per rule (null-safe CASE). */
  private def markers(rules: Seq[Rule]): Seq[Column] =
    rules.map(r => when(!r.holds, lit(r.name)))

  /** Rows violating at least one rule, with a `violations` label
    * column naming every broken rule in declaration order.
    */
  def quarantine(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(rules.map(r => !r.holds).reduce(_ || _))
      .withColumn("violations", concat_ws(",", markers(rules): _*))

  /** Rows where every rule holds (NULL predicates fail closed). */
  def clean(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(rules.map(_.holds).reduce(_ && _))

  /** (clean, quarantine) in one call; both sides are lazy filters over
    * the same plan — caching the input is the caller's choice.
    */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) =
    (clean(df, rules), quarantine(df, rules))
}
