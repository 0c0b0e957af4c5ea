package graft

import graft.ops.{Aggregates, Relational, Scalars, Text}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY §5.3): algebraic laws the operators must hold
  * regardless of data. Raw ScalaCheck generators sampled deterministically
  * (scalatestplus bridge isn't in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll: N samples from fixed seeds. */
  private def forAll[A](gen: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(30), Seed(42L + i))
        .foreach(body)
    }

  test("query registry: no key collides across modules, every oracle has a query") {
    import graft.queries._
    // mirror of SparkEntry's composition: Map ++ silently keeps the
    // LAST duplicate, so a collision drops a query without any failure
    val modules = Seq(
      "QRelational" -> QRelational.queries.keySet,
      "QAggregates" -> QAggregates.queries.keySet,
      "QScalars" -> QScalars.queries.keySet,
      "QTimeseries" -> QTimeseries.queries.keySet,
      "QIo" -> QIo.queries.keySet,
      "QText" -> QText.queries.keySet,
      "QSimilarity" -> QSimilarity.queries.keySet,
      "QMultimodal" -> QMultimodal.queries.keySet,
      "QAsOf" -> QAsOf.queries.keySet,
      "QExtras" -> QExtras.queries.keySet,
      "QScale" -> QScale.queries.keySet,
      "QSql" -> QSql.queries.keySet,
      "QTpch" -> QTpch.queries.keySet,
      "QAnalytics" -> QAnalytics.queries.keySet,
      "QStreaming" -> QStreaming.queries.keySet)
    val dups = modules.flatMap { case (m, ks) => ks.map(_ -> m) }
      .groupBy(_._1).filter(_._2.length > 1)
    assert(dups.isEmpty, s"duplicate query keys: ${dups.map { case (k, ms) =>
      s"$k in ${ms.map(_._2).mkString("+")}" }.mkString(", ")}")
    assert(modules.map(_._2.size).sum == SparkEntry.queries.size)
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
  }

  private val rowsGen = Gen.nonEmptyListOf(for {
    k <- Gen.choose(1, 5)
    o <- Gen.choose(1, 20)
    v <- Gen.choose(-1000, 1000)
  } yield (k, o, v))

  test("E4: dedupKeepFirst is idempotent and keeps one row per key") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "o", "v")
      val once = Aggregates.dedupKeepFirst(df, Seq("k"), Seq($"o".asc, $"v".asc))
      val twice = Aggregates.dedupKeepFirst(once, Seq("k"), Seq($"o".asc, $"v".asc))
      assert(once.count() == rows.map(_._1).distinct.size)
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("C2: pivot preserves the per-key value sums (round-trip)") {
    forAll(rowsGen) { rows =>
      val df = rows.map { case (k, o, v) => (k, if (o % 2 == 0) "in" else "out", v.toDouble) }
        .toDF("k", "dir", "v")
      val piv = Relational.pivotFullJoin(df, Seq("k"), "dir", "in", "out", "v", "vin", "vout")
      val unpivoted = piv.select($"k",
        (coalesce($"vin", lit(0.0)) + coalesce($"vout", lit(0.0))).as("total"))
        .as[(Int, Double)].collect().toMap
      val direct = df.groupBy($"k").agg(sum($"v")).as[(Int, Double)].collect().toMap
      assert(unpivoted == direct)
    }
  }

  test("D9: WIB shift is inverted by the negative interval") {
    forAll(Gen.choose(0L, 4102444800L)) { epoch =>
      val df = Seq(epoch).toDF("e")
      val back = df.select((Scalars.shiftToWib($"e".cast("timestamp")) -
        expr("INTERVAL 7 HOURS")).cast("long")).as[Long].head()
      assert(back == epoch)
    }
  }

  test("D4 vs D6: substring date parts agree with real date functions") {
    forAll(Gen.choose(0L, 4102444800L)) { epoch =>
      val df = Seq(epoch).toDF("e").select($"e".cast("timestamp").as("ts"))
        .withColumn("waktu", date_format($"ts", "dd-MM-yyyy HH:mm:ss"))
      val row = df.select(
        substring($"waktu", 7, 4), date_format($"ts", "yyyy"),
        substring($"waktu", 4, 2), date_format($"ts", "MM"),
        substring($"waktu", 12, 2), date_format($"ts", "HH")).head()
      assert(row.getString(0) == row.getString(1))
      assert(row.getString(2) == row.getString(3))
      assert(row.getString(4) == row.getString(5))
    }
  }

  test("A6: partitioned write conserves row counts per partition") {
    forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "o", "v")
        .withColumn("ds", concat(lit("2024010"), ($"k" % 3 + 1).cast("string")))
      val out = tmpDir(s"prop_write_${math.abs(rows.hashCode)}")
      graft.io.PartitionedWriter.writePartitioned(df, out, compact = false)
      val back = spark.read.parquet(out).groupBy("ds").count().as[(String, Long)].collect().toMap
      val expected = df.groupBy("ds").count().as[(String, Long)].collect().toMap
      assert(back == expected)
    }
  }

  test("J1 invariant: identical texts always share a fingerprint; dedup total") {
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a b c", "x y", "a b c d"))) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val fps = df.select(Text.fingerprint($"text").as("f"), $"text").distinct().collect()
      assert(fps.map(_.getLong(0)).distinct.length == texts.distinct.length)
    }
  }

  /** Adversarial text: repeated/leading/trailing spaces (empty tokens),
    * unicode (multi-byte UTF-8), punctuation — the cases where a JVM
    * kernel's split/encode could drift from Spark's split()/md5().
    */
  private val textGen: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
    "the", "fox", "naïve", "héllo", "日本語", "a", "", " ", "x.y,z", "émoji🎈", "tab\tchar"))
    .map(_.mkString(" "))

  test("native shingle-hash kernel == declarative pipeline on adversarial text") {
    forAll(textGen, n = 20) { text =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val native = df.select(
        explode(graft.expressions.TextSketchExpressions.shingleHash64($"text", 3)).as("h"))
        .as[Long].collect().sorted.toSeq
      val decl = graft.ops.Dedup.shingles(df, "text", "doc_id", 3)
        .select(conv(substring(md5($"shingle"), 1, 15), 16, 10).cast("long"))
        .as[Long].collect().sorted.toSeq
      assert(native == decl, s"text=<$text>")
    }
  }

  test("chunking with stride == size reassembles exactly the original text") {
    forAll(Gen.chooseNum(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty))), n = 15) { words =>
      val text = words.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val rejoined = Text.chunk(df, "text", "doc_id", chunkSize = 7, stride = 7)
        .orderBy($"chunk_id").select($"chunk").as[String].collect().mkString(" ")
      assert(rejoined == text)
    }
  }

  test("morton code is monotone in each dimension when the other is fixed") {
    forAll(Gen.zip(Gen.chooseNum(0L, 65534L), Gen.chooseNum(0L, 65535L)), n = 15) {
      case (a, b) =>
        val df = Seq((a, b), (a + 1, b)).toDF("x", "y")
        val z = df.select(Scalars.mortonCode($"x", $"y").as("z")).as[Long].collect()
        assert(z(0) < z(1)) // growing a dimension can only grow the key
    }
  }

  // Change-log generator for the SCD2 laws: per-key strictly-ordered
  // times (duplicate (k,t) pairs collapsed to keep the order total).
  private val changeLogGen: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(1L, 30L)
      v <- Gen.oneOf("a", "b", "c")
    } yield (k, t, v)).map(_.groupBy(r => (r._1, r._2)).map(_._2.head).toList)

  test("SCD2 laws: runs partition the timeline; incremental apply == full rebuild") {
    import graft.ops.Warehouse
    forAll(changeLogGen, n = 8) { log =>
      val df = log.toDF("k", "t", "v")
      val full = Warehouse.scd2Build(df, col("k"), Seq(col("t")), col("v"), col("t"))
        .select("k", "v", "version", "effective_from", "effective_to", "is_current")
      val rows = full.as[(Long, String, Int, Long, Option[Long], Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._3))
      rows.groupBy(_._1).foreach { case (k, rs) =>
        // exactly one open run per key, and it is the last version
        assert(rs.count(_._6) == 1 && rs.last._6, s"k=$k open-run: $rs")
        // versions are 1..n and consecutive runs chain [from, to) with no
        // gap and no overlap, and always change the tracked value
        assert(rs.map(_._3) == (1 to rs.length), s"k=$k versions: $rs")
        rs.sliding(2).foreach {
          case Seq(prev, next) =>
            assert(prev._5.contains(next._4), s"k=$k gap/overlap: $prev -> $next")
            assert(prev._2 != next._2, s"k=$k uncollapsed run: $prev -> $next")
          case _ => ()
        }
      }
      // incremental maintenance reproduces the rebuild for any cut
      val cut = 15L
      val current = Warehouse.scd2Build(df.filter($"t" < cut),
          col("k"), Seq(col("t")), col("v"), col("t"))
        .select("k", "v", "version", "effective_from", "effective_to", "is_current")
      val applied = Warehouse.scd2Apply(current, df.filter($"t" >= cut), "k", "t", "v")
        .as[(Long, String, Int, Long, Option[Long], Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._3))
      assert(applied == rows, s"apply != build for log $log")
    }
  }

  test("funnel law: distributed stages == driver-side reference fold") {
    import graft.ops.Warehouse
    val steps = Seq("a", "b", "c")
    val eventsGen = Gen.nonEmptyListOf(for {
      u <- Gen.choose(1L, 4L)
      t <- Gen.choose(1L, 40L)
      typ <- Gen.oneOf("a", "b", "c", "x")
    } yield (u, t, typ)).map(_.groupBy(r => (r._1, r._2)).map(_._2.head).toList)
    forAll(eventsGen, n = 8) { evs =>
      val got = Warehouse.funnelStages(evs.toDF("u", "t", "typ"),
          col("u"), col("t"), col("typ"), steps)
        .as[(Long, Int)].collect().toMap
      val want = evs.groupBy(_._1).map { case (u, rs) =>
        var stage = 0
        var reachedAt = Long.MinValue
        rs.sortBy(_._2).foreach { case (_, t, typ) =>
          if (stage < steps.length && typ == steps(stage) &&
              (stage == 0 || t > reachedAt)) { stage += 1; reachedAt = t }
        }
        u -> stage
      }
      assert(got == want, s"events=$evs")
    }
  }

  test("snapshotDiff laws: self-diff is empty; diff flags exactly the injected edits") {
    import graft.ops.Warehouse
    forAll(rowsGen, n = 8) { rows =>
      val base = rows.zipWithIndex.map { case ((k, o, v), i) => (i.toLong, s"$k-$o-$v") }
      val df = base.toDF("k", "v")
      assert(Warehouse.snapshotDiff(df, df, "k", Seq(col("v"))).count() == 0)
      val edited = base.map { case (k, v) => if (k % 3 == 0) (k, v + "!") else (k, v) }
      val got = Warehouse.snapshotDiff(df, edited.toDF("k", "v"), "k", Seq(col("v")))
        .as[(Long, String)].collect().toMap
      assert(got == base.collect { case (k, _) if k % 3 == 0 => k -> "changed" }.toMap)
    }
  }

  test("K38: prorate conserves the amount; every share is base or base+1") {
    val gen = for {
      amount <- Gen.choose(1L, 100000L)
      ws <- Gen.nonEmptyListOf(Gen.choose(1L, 50L)).map(_.take(20))
    } yield (amount, ws)
    forAll(gen) { case (amount, ws) =>
      val df = ws.zipWithIndex.map { case (w, i) => ("g", amount, w, i.toLong) }
        .toDF("g", "amount", "w", "id")
      val got = graft.ops.Warehouse.prorate(df, $"g", $"amount", $"w", $"id")
        .select($"id", $"w", $"share").as[(Long, Long, Long)].collect()
      assert(got.map(_._3).sum == amount, s"amount=$amount ws=$ws")
      val totalW = ws.sum
      got.foreach { case (_, w, s) =>
        val base = amount * w / totalW
        assert(s == base || s == base + 1, s"share $s outside [$base, ${base + 1}]")
      }
    }
  }

  test("K37: mergeIntervals partitions the rows into strictly separated islands") {
    val gen = Gen.nonEmptyListOf(for {
      st <- Gen.choose(0L, 1000L)
      len <- Gen.choose(0L, 200L)
    } yield (st, st + len)).map(_.take(30))
    forAll(gen) { ivs =>
      val df = ivs.zipWithIndex.map { case ((s0, e0), i) => (1L, s0, e0, i.toLong) }
        .toDF("k", "st", "en", "id")
      val isl = graft.ops.Timeseries.mergeIntervals(df, $"k", $"st", $"en", $"id")
        .groupBy($"island")
        .agg(min($"st").as("s"), max($"en").as("e"), count(lit(1)).as("n"))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(isl.map(_._4).sum == ivs.size.toLong) // every row in exactly one island
      isl.sliding(2).foreach { // islands cannot touch or overlap
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1, s"ivs=$ivs")
        case _ =>
      }
    }
  }

  test("medianTimes2 == doubled middle order statistics on random multisets") {
    val gen = Gen.nonEmptyListOf(Gen.choose(-50L, 50L)).map(_.take(40))
    forAll(gen, n = 15) { vals =>
      val got = Aggregates.medianTimes2(
          vals.map(("k", _)).toDF("k", "v"), Seq("k"), "v")
        .as[(String, Long)].head()._2
      val s = vals.sorted
      val expect = s((s.size - 1) / 2) + s(s.size / 2)
      assert(got == expect, s"vals=$vals")
    }
  }

  test("PPJoin prefix filter is complete: prefixJaccardJoin == naive all-pairs") {
    // random small corpora from a tight vocabulary (forces overlap);
    // the prefix-filtered join must return EXACTLY the naive form's
    // pairs at the same threshold
    val doc = Gen.nonEmptyListOf(Gen.oneOf(
      "a", "b", "c", "d", "e", "f", "g", "h")).map(_.take(12).mkString(" "))
    val corpus = Gen.listOfN(6, doc)
    forAll(corpus, n = 10) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def pairs(d: org.apache.spark.sql.DataFrame) = d
        .select($"id_a", $"id_b", $"jaccard")
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val naive = pairs(graft.ops.Dedup.ngramJaccardPairs(df, "text", "doc_id", 2, 1, 3))
      val viaPrefix = pairs(graft.ops.Dedup.prefixJaccardJoin(df, "text", "doc_id", 2, 1, 3))
      assert(viaPrefix == naive, s"docs=$docs")
    }
  }

  test("incrementalComponents == full CC recompute on random graphs + batches") {
    val edgeGen = for {
      a <- Gen.choose(0L, 15L); b <- Gen.choose(0L, 15L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val gen = for {
      old <- Gen.listOfN(8, edgeGen)
      nw <- Gen.nonEmptyListOf(edgeGen).map(_.take(6))
    } yield (old.distinct, nw.distinct)
    forAll(gen, n = 10) { case (oldE, newE) =>
      if (oldE.nonEmpty && newE.nonEmpty) {
        val oldDf = oldE.toDF("id_a", "id_b")
        val newDf = newE.toDF("id_a", "id_b")
        val inc = graft.ops.Dedup.incrementalComponents(
            graft.ops.Dedup.connectedComponents(oldDf, "id_a", "id_b"),
            newDf, "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        val full = graft.ops.Dedup.connectedComponents(
            oldDf.unionAll(newDf), "id_a", "id_b")
          .as[(Long, Long)].collect().toMap
        assert(inc == full, s"old=$oldE new=$newE")
      }
    }
  }

  test("BPE encode: tokens reassemble the word characters; count == tokens.length") {
    forAll(textGen, n = 20) { text =>
      import org.apache.spark.unsafe.types.UTF8String
      val toks = graft.expressions.Bpe.tokens(UTF8String.fromString(text))
        .array.map(_.toString)
      // merges only ever concatenate adjacent symbols inside a word:
      // the emitted token stream, concatenated, must equal the
      // lowercased alphanumeric character stream of the input
      val alnum = text.toLowerCase.filter(c =>
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9'))
      assert(toks.mkString == alnum, s"text=<$text>")
      assert(graft.expressions.Bpe.tokenCount(UTF8String.fromString(text)) ==
        toks.length.toLong)
    }
  }

  test("native minhash kernel == declarative min(md5(seed|shingle)) on adversarial text") {
    forAll(textGen, n = 20) { text =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val native = graft.ops.Dedup.minhashSignature(df, "text", "doc_id", 4)
        .select($"sig").as[Seq[String]].head()
      val decl = graft.ops.Dedup.shingles(df, "text", "doc_id", 3)
        .groupBy($"doc_id")
        .agg(array((0 until 4).map(sd => min(md5(concat(lit(s"$sd|"), $"shingle")))): _*).as("sig"))
        .select($"sig").as[Seq[String]].head()
      assert(native == decl, s"text=<$text>")
    }
  }

  test("batched BPE: per-pass merges are symbol-disjoint; pass 1 leads with the global argmax") {
    val sf = "/root/testdata/sf0.001"
    val batched = graft.queries.QText.queries("q_bpe_learn_batched")(spark, sf)
      .orderBy($"step").as[(Int, String, String, String, Long)].collect()
    assert(batched.length == 16)
    assert(batched.map(_._1).toSeq == (1 to 16))
    // disjointness within each pass is what makes the one-pass chained
    // replace equal any application order
    // a == b inside ONE merge is fine (left-to-right replace is still
    // deterministic); what must never happen is a symbol shared BETWEEN
    // two merges of the same pass
    batched.grouped(8).foreach { pass =>
      val syms = pass.flatMap(m => Seq(m._2, m._3).distinct)
      assert(syms.distinct.length == syms.length,
        s"cross-merge overlap in ${pass.toSeq}")
    }
    // batching must not change the FIRST learned merge: both learners
    // argmax the same untouched corpus counts
    val single = graft.queries.QText.queries("q_bpe_learn")(spark, sf)
      .orderBy($"step").as[(Int, String, String, String, Long)].head()
    assert((batched.head._2, batched.head._3, batched.head._5) ==
      (single._2, single._3, single._5))
  }

  test("dictionary BPE is an EXACT reformulation: merge table equals the corpus-form learner's") {
    // The dictionary learner folds the corpus to (word, freq) once and
    // iterates over the dictionary; because pairs never cross the '#'
    // boundary, its freq-weighted pair counts equal the corpus-form
    // counts term for term — so the learned merges (and their counts)
    // must agree round for round, not just statistically.
    val sf = "/root/testdata/sf0.001"
    val dict = graft.queries.QText.queries("q_bpe_learn_dict")(spark, sf)
      .orderBy($"step").as[(Int, String, String, String, Long)].collect()
    assert(dict.length == 12)
    // the registered q_bpe_learn runs 3 merges; the exactness claim is
    // round-for-round over the WHOLE table, so replay the corpus-form
    // loop here for the full 12 rounds and compare every row
    val corpus = {
      val boundary = "#"
      var w = graft.Tables(spark, sf).documents.select(
        regexp_replace(regexp_replace(lower($"text"), "[^a-z0-9]+", boundary),
          "(.)", "($1)").as("w")).localCheckpoint()
      val learned = scala.collection.mutable.ArrayBuffer
        .empty[(Int, String, String, String, Long)]
      for (step <- 1 to 12) {
        val ss = split(btrim($"w", lit("()")), "\\)\\(")
        val top = w.select(explode(zip_with(
            slice(ss, lit(1), greatest(size(ss) - 1, lit(0))),
            slice(ss, lit(2), greatest(size(ss) - 1, lit(0))),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
          .select($"p.a".as("a"), $"p.b".as("b"))
          .filter($"a" =!= boundary && $"b" =!= boundary)
          .groupBy($"a", $"b").agg(count(lit(1)).as("cnt"))
          .orderBy($"cnt".desc, $"a", $"b").limit(1).collect().head
        val (a, b, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
        learned += ((step, a, b, a + b, cnt))
        if (step < 12)
          w = w.select(replace($"w",
            lit(s"($a)($b)"), lit(s"($a$b)")).as("w")).localCheckpoint()
      }
      learned.toSeq
    }
    assert(dict.toSeq == corpus)
    // and the registered 3-round query agrees with the replay's prefix
    val corpus3 = graft.queries.QText.queries("q_bpe_learn")(spark, sf)
      .orderBy($"step").as[(Int, String, String, String, Long)].collect()
    assert(corpus.take(3) == corpus3.toSeq)
    // merged symbols accumulate: later rounds may merge earlier outputs,
    // and counts are monotonically non-increasing round over round
    assert(dict.map(_._5).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("JL projection is exactly 2-homogeneous: proj(2a) == 2*proj(a) bitwise") {
    // ±1 signs and a power-of-two scale: every product and partial sum
    // doubles EXACTLY in binary floats, so the projection must too —
    // any deviation means the kernel reordered or widened differently.
    val sf = "/root/testdata/sf0.001"
    val q = graft.queries.QSimilarity.queries("q_random_projection")
    val base = q(spark, sf).as[(Long, Long, Double)].collect()
      .map { case (id, j, y) => (id, j) -> y }.toMap
    val q2 = graft.Tables(spark, sf).embeddings
      .select($"vec_id", transform($"embedding", x => x * lit(2.0f)).as("embedding"))
    // re-run the same projection expression over the doubled vectors
    val proj2 = {
      import graft.expressions.VectorExpressions
      val d = VectorExpressions.dot _
      val ys = (0 until 16).map { j =>
        val signs: Seq[Float] = (0 until 64).map { i =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(s"rp_${i}_${j}".getBytes("UTF-8"))
          if (((md(0) >> 4) & 0xf) < 8) 1.0f else -1.0f
        }
        d(col("embedding"), typedlit(signs))
      }
      q2.select(col("vec_id"), posexplode(array(ys: _*)).as(Seq("j", "y")))
        .select(col("vec_id"), col("j").cast("bigint").as("j"), col("y"))
    }.as[(Long, Long, Double)].collect()
    proj2.foreach { case (id, j, y) =>
      assert(y == 2.0 * base((id, j)), s"vec $id dim $j: $y vs ${base((id, j))}")
    }
  }

  test("q_ks_test banded ECDF == naive sequential ECDF") {
    // the query assembles the running ECDFs from value-range bands +
    // driver-folded offsets (no empty-PARTITION-BY window in the
    // registered plan); this law re-derives D with a naive sequential
    // fold over the sorted counts and demands the identical integers
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.QAnalytics.queries("q_ks_test")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().head
    val cnt = graft.Tables(spark, sf).documents
      .select(($"lang" === "en").cast("bigint").as("g"), $"n_chars".as("v"))
      .groupBy($"v").agg(sum($"g").as("c1"), sum(lit(1) - $"g").as("c2"))
    val rows = cnt.orderBy($"v").as[(Long, Long, Long)].collect()
    val n1 = rows.map(_._2).sum; val n2 = rows.map(_._3).sum
    var r1 = 0L; var r2 = 0L; var dnum = 0L
    rows.foreach { case (_, c1, c2) =>
      r1 += c1; r2 += c2
      dnum = math.max(dnum, math.abs(r1 * n2 - r2 * n1))
    }
    assert((got._1, got._2, got._3) == ((n1, n2, dnum)))
    assert(math.abs(got._4 - dnum.toDouble / (n1 * n2)) < 1e-15)
  }

  test("q_mannwhitney == naive sequential rank fold; U1+U2 == n1*n2") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.QAnalytics.queries("q_mannwhitney")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().head
    val cnt = graft.Tables(spark, sf).documents
      .select(($"lang" === "en").cast("bigint").as("g"), $"n_chars".as("v"))
      .groupBy($"v").agg(sum($"g").as("c1"), sum(lit(1) - $"g").as("c2"))
      .orderBy($"v").as[(Long, Long, Long)].collect()
    val n1 = cnt.map(_._2).sum; val n2 = cnt.map(_._3).sum
    var cb = 0L; var r1x2 = 0L; var r2x2 = 0L
    cnt.foreach { case (_, c1, c2) =>
      r1x2 += c1 * (2 * cb + c1 + c2 + 1)
      r2x2 += c2 * (2 * cb + c1 + c2 + 1)
      cb += c1 + c2
    }
    assert((got._1, got._2, got._3) == ((n1, n2, r1x2)))
    val u1 = (r1x2 - n1 * (n1 + 1)) / 2.0
    val u2 = (r2x2 - n2 * (n2 + 1)) / 2.0
    assert(got._4 == u1 && math.abs(u1 + u2 - n1.toDouble * n2) < 1e-9)
  }

  test("q_cuped preserves the global mean: weighted adj mean == raw mean") {
    val rows = graft.queries.QAnalytics.queries("q_cuped")(
      spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double, Double)].collect()
    val n = rows.map(_._2).sum.toDouble
    val rawMean = rows.map(r => r._2 * r._3).sum / n
    val adjMean = rows.map(r => r._2 * r._4).sum / n
    assert(math.abs(rawMean - adjMean) < 1e-9)
  }

  test("q_textrank: PageRank mass is conserved (sum pr ~ 1)") {
    val rows = graft.queries.QText.queries("q_textrank")(
      spark, "/root/testdata/sf0.001").as[(String, Double)].collect()
    assert(rows.nonEmpty && math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
  }

  test("removeDuplicateSpans conserves words: n_removed == n_words - words(clean)") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.QText.queries("q_span_removal")(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, clean, nw, nr) =>
      assert(nr >= 0 && nr <= nw, s"doc $id: removed $nr of $nw")
      if (clean.nonEmpty) // "" is ambiguous: 0 kept words or 1 empty token
        assert(nw - nr == clean.split(" ", -1).length,
          s"doc $id: $nw - $nr != kept words")
    }
  }
}
