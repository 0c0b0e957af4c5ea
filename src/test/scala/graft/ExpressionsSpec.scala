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

  test("graft_map_dot_dec: bitwise == the exact DECIMAL(38,18) sum (the oracle's SUM semantics)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the ORACLE (DuckDB) computes SUM(CAST(prod AS DECIMAL(38,18)))
    // — each IEEE product converted to decimal at scale 18 (shortest
    // decimal rep, HALF_UP), summed EXACTLY. The kernel must reproduce
    // that bitwise; assert against an independent scala-BigDecimal
    // reference folding in a DIFFERENT (sorted-key) order, which also
    // pins order-independence. (The interpreted HOF fold this kernel
    // replaced was subtly WEAKER than the oracle: Spark types each
    // `acc + x` step as DECIMAL(38,17), rounding every partial sum to
    // 17 fractional digits — a ~1e-17 drift the 6-dp output rounding
    // always absorbed. The kernel restores the oracle's exact sum.)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val ka = (0 until rnd.nextInt(30)).map(j => s"t$j")
      val kb = (0 until rnd.nextInt(30)).map(j => s"t${j + rnd.nextInt(8)}")
      def w() = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1e8
        case 1 => rnd.nextDouble() * 1e-8
        case 2 => (rnd.nextInt(1000) + 1).toDouble / 3.0
        case _ => rnd.nextDouble()
      }
      (i.toLong, ka.map(k => k -> w()).toMap, kb.map(k => k -> w()).toMap)
    } :+ ((0L, Map.empty[String, Double], Map("x" -> 1.0)))
    val df = rows.toDF("id", "v_a", "v_b")
    val got = df.select($"id",
        graft.expressions.VectorExpressions.mapDotDec($"v_a", $"v_b").as("k"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (id, va, vb) =>
      val ref = va.toSeq.sortBy(_._1).reverse // deliberately different order
        .foldLeft(java.math.BigDecimal.ZERO) { case (acc, (t, w)) =>
          val prod = w * vb.getOrElse(t, 0.0)
          acc.add(java.math.BigDecimal.valueOf(prod)
            .setScale(18, java.math.RoundingMode.HALF_UP))
        }.doubleValue()
      assert(java.lang.Double.doubleToRawLongBits(got(id)) ==
        java.lang.Double.doubleToRawLongBits(ref),
        s"row $id: kernel ${got(id)} != exact-sum reference $ref")
    }
  }

  test("graft_larr_dot_dec: sorted-long merge bitwise == the string-keyed kernel") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the tf·idf scoring layout: vectors as long-keyed maps with
    // ASCENDING key arrays. Any term→long bijection preserves every
    // product, so under the mapping t<i> → i the merge kernel must be
    // bitwise-identical to graft_map_dot_dec on the string form.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val ka = (0 until rnd.nextInt(30)).map(_.toLong).distinct
      val kb = (0 until rnd.nextInt(30)).map(j => (j + rnd.nextInt(8)).toLong).distinct
      def w() = if (rnd.nextBoolean()) rnd.nextDouble() * 1e8 else rnd.nextDouble() * 1e-8
      (i.toLong,
        ka.sorted.map(k => k -> w()).toSeq,
        kb.sorted.map(k => k -> w()).toSeq)
    } :+ ((0L, Seq.empty[(Long, Double)], Seq(5L -> 1.0)))
    val df = rows.map { case (id, a, b) =>
      (id, a.map(_._1).toArray, a.map(_._2).toArray,
        b.map(_._1).toArray, b.map(_._2).toArray)
    }.toDF("id", "ka", "wa", "kb", "wb")
      .select($"id",
        map_from_arrays($"ka", $"wa").as("v_a"),
        map_from_arrays($"kb", $"wb").as("v_b"),
        map_from_arrays(transform($"ka", k => concat(lit("t"), k)), $"wa").as("s_a"),
        map_from_arrays(transform($"kb", k => concat(lit("t"), k)), $"wb").as("s_b"))
    val got = df.select($"id",
        graft.expressions.VectorExpressions.mapDotDecLong($"v_a", $"v_b").as("k"),
        graft.expressions.VectorExpressions.mapDotDec($"s_a", $"s_b").as("s"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (id, k, s) =>
      assert(java.lang.Double.doubleToRawLongBits(k) ==
        java.lang.Double.doubleToRawLongBits(s),
        s"row $id: long-merge $k != string-hash $s")
    }
    // non-finite product → -Inf sentinel (the mapDotDec contract):
    // REJECTS under Spark's NaN-sorts-first semantics — fails any
    // `cos >= t` threshold and sorts LAST in (cos DESC) top-k, the
    // behavior the old null-propagating fold had (ADVICE r10).
    val sentinel = Seq((Array(1L), Array(Double.MaxValue), Array(1L), Array(Double.MaxValue)))
      .toDF("ka", "wa", "kb", "wb")
      .select(graft.expressions.VectorExpressions.mapDotDecLong(
        map_from_arrays($"ka", $"wa"), map_from_arrays($"kb", $"wb")).as("d"))
      .as[Double].head()
    assert(sentinel == Double.NegativeInfinity)
    assert(!(sentinel >= 0.5) && sentinel < 0.0)
  }

  test("graft_sorted_inter == size(array_intersect) on sorted distinct arrays") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      val a = (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      val b = (0 until rnd.nextInt(40)).map(_ => rnd.nextInt(60).toLong)
        .distinct.sorted.toArray
      (i.toLong, a, b)
    } :+ ((0L, Array.empty[Long], Array(1L, 2L)))
    val got = rows.toDF("id", "a", "b")
      .select($"id",
        graft.expressions.VectorExpressions.sortedIntersectCount($"a", $"b").as("k"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, k, ref) =>
      assert(k == ref, s"row $id: kernel $k != array_intersect $ref")
    }
  }

  test("graft_centroid_argmin == literal array_min composition, bit-exact with ties") {
    VectorExpressions.register(spark)
    val rnd = new scala.util.Random(13)
    val d = 8
    // duplicate coordinates across centroids force dist2 TIES — the
    // (dist2 asc, cid asc) tie-break must match struct min-ordering
    val cents: Seq[(Long, Seq[Float])] = (0L until 17L).map { cid =>
      (cid, Seq.tabulate(d)(i =>
        if (cid % 3 == 0) (i % 4).toFloat else rnd.nextFloat()))
    }
    // pass the centroids UNSORTED — the builder must sort by cid
    val shuffled = rnd.shuffle(cents)
    val vecs = (1L to 300L).map { id =>
      // every third vector sits exactly ON a duplicated centroid
      if (id % 3 == 0) (id, Seq.tabulate(d)(i => (i % 4).toFloat))
      else (id, Seq.fill(d)(rnd.nextFloat()))
    }
    val df = vecs.toDF("id", "vec")
    val both = df.select($"id",
      VectorExpressions.centroidArgmin($"vec", shuffled).as("native"),
      Similarity.assignExprLiteral("vec", cents).as("lit"))
      .select($"id",
        $"native.dist2".as("nd"), $"native.cid".as("nc"),
        $"lit.dist2".as("ld"), $"lit.cid".as("lc"))
      .as[(Long, Double, Long, Double, Long)].collect()
    both.foreach { case (id, nd, nc, ld, lc) =>
      assert(nd == ld && nc == lc,
        s"row $id: native ($nd,$nc) != literal ($ld,$lc)")
    }
    // ties actually occurred (the duplicated-centroid rows)
    assert(both.count(_._3 % 3 == 0) >= 100)
  }

  test("graft_adj_pair_counts == declarative split+zip_with pair multiset") {
    import graft.expressions.TextSketchExpressions
    TextSketchExpressions.register(spark)
    val boundary = "#"
    // real corpus shape: lowercased alnum with '#' boundaries, wrapped
    // per char, PLUS merged multi-char symbols mid-string, boundary at
    // both ends, a lone-boundary row, and an empty row
    val rows = Seq(
      "(t)(h)(e)(#)(c)(a)(t)(#)",
      "(#)(a)(b)(ab)(ab)(b)(a)(#)(#)(x)",
      "(#)",
      "",
      "(ab)(ab)(ab)")
    val df = rows.toDF("w")
    val ss = split(btrim(col("w"), lit("()")), "\\)\\(")
    val old = df.select(explode(zip_with(
        slice(ss, lit(1), greatest(size(ss) - 1, lit(0))),
        slice(ss, lit(2), greatest(size(ss) - 1, lit(0))),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= boundary && col("b") =!= boundary)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("a"), col("b"))
      .as[(String, String, Long)].collect().toSeq
    val kernel = df.select(explode(
        TextSketchExpressions.adjPairCounts(col("w"))).as("e"))
      .groupBy(col("e.p").as("p")).agg(sum(col("e.c")).as("cnt"))
      .select(substring_index(col("p"), " ", 1).as("a"),
        substring_index(col("p"), " ", -1).as("b"), col("cnt"))
      .orderBy(col("a"), col("b"))
      .as[(String, String, Long)].collect().toSeq
    assert(kernel == old, s"kernel=$kernel old=$old")
    // packed-key order == (a, b) order, so argmax tie-breaks agree:
    // multi-char symbol 'ab' must sort AFTER the shorter prefix 'a b'
    val keys = df.select(explode(
        TextSketchExpressions.adjPairCounts(col("w"))).as("e"))
      .select(col("e.p")).distinct().as[String].collect().toSeq
    val byKey = keys.sorted
    val byPair = keys.sortBy { k =>
      val Array(a, b) = k.split(' '); (a, b)
    }
    assert(byKey == byPair)
  }
}
