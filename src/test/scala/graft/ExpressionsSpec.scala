package graft

import graft.expressions.{GraftExtensions, VectorExpressions}
import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The native FloatVectorDot expression must be bit-identical to the
  * HOF reference fold in both eval modes (interpreted + codegen) and
  * for both element types.
  */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native dot == HOF fold, bit-exact, float arrays") {
    VectorExpressions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = df.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val both = df.select(
      VectorExpressions.dot($"embedding", typedlit(q)).as("native"),
      Similarity.dot($"embedding", typedlit(q)).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() == 0)
    assert(both.filter($"native".isNull).count() == 0)
  }

  test("native dot on double arrays (normalized vectors)") {
    VectorExpressions.register(spark)
    val df = Seq((Seq(0.5, 0.5), Seq(2.0, 4.0))).toDF("a", "b")
    assert(df.select(VectorExpressions.dot($"a", $"b")).as[Double].head() == 3.0)
  }

  test("null array yields null; mismatched lengths use common prefix") {
    VectorExpressions.register(spark)
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]), (Some(Seq(1.0f, 2.0f, 9.0f)), Some(Seq(3.0f, 4.0f))))
      .toDF("a", "b")
    val got = df.select(VectorExpressions.dot($"a", $"b")).as[Option[Double]].collect()
    assert(got.toSeq == Seq(None, Some(11.0)))
  }

  test("graft_dot is callable from SQL after registration") {
    VectorExpressions.register(spark)
    val got = spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(got == 11.0)
  }

  test("RewriteHofDot: declarative HOF dot product optimizes to graft_dot") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = df.select(Similarity.dot($"embedding", $"embedding").as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"),
      s"HOF pattern not rewritten to native expression:\n$optimized")
    // and the rewrite preserves values exactly
    VectorExpressions.register(spark)
    val direct = df.select(VectorExpressions.dot($"embedding", $"embedding").as("d"))
    assert(q.collect().map(_.getDouble(0)).toSeq == direct.collect().map(_.getDouble(0)).toSeq)
  }

  test("BPE encoder: cascading merges, hard word boundaries, count==tokens") {
    import graft.expressions.{Bpe, BpeExpressions}
    import org.apache.spark.unsafe.types.UTF8String
    def enc(s: String) = Bpe.tokens(UTF8String.fromString(s)).array
      .map(_.toString).toSeq
    // cascades: t+h -> th, th+e -> the; i+n -> in, in+g -> ing
    assert(enc("The thing") == Seq("the", "th", "ing"))
    // boundaries are hard: no merge across words; separator runs collapse
    assert(enc("t--h") == Seq("t", "h"))
    assert(enc("") == Seq.empty)
    assert(enc("!!!") == Seq.empty)
    assert(Bpe.tokenCount(UTF8String.fromString("The thing")) == 3L)
    // column API through the session extensions
    import spark.implicits._
    val got = Seq((1L, "standing out")).toDF("id", "text")
      .select(BpeExpressions.bpeTokens($"text").as("t"),
        BpeExpressions.bpeCount($"text").as("n"))
      .as[(Seq[String], Long)].head()
    assert(got._1 == enc("standing out") && got._2 == got._1.size.toLong)
  }

  test("GraftExtensions hook applies its injections without error") {
    // A live withExtensions round-trip needs a fresh SparkContext (the
    // shared test session would be returned by getOrCreate); assert the
    // hook itself registers cleanly against the extensions container.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws if the builder is malformed
  }
}
