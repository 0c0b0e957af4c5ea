package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines —
  * SURVEY.md §2.J / north star: language-ID heuristics, quality
  * scoring, token counting, document fingerprinting.
  *
  * Everything is built-in-function composition (codegen'd, no UDFs).
  * Cross-engine hashing rule: md5 hex (identical in Spark and DuckDB);
  * 8-hex-char prefixes parsed to bigint (`conv` / `CAST('0x…')`) give
  * portable 32-bit word hashes for fingerprints and sketches.
  */
object Text {

  /** Whitespace tokenization — the H3 generator shape. */
  def tokens(text: Column): Column = split(text, " ")

  /** Portable 32-bit hash of a string: first 8 hex chars of md5.
    * Used by fingerprints/simhash so the DuckDB oracle can reproduce
    * the exact value (`CAST('0x' || substring(md5(s),1,8) AS BIGINT)`).
    */
  def md5Int(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("bigint")

  /** Corpus keyword extraction: top-k terms per document by tf·idf.
    * Term frequency per (doc, term) and document frequency per term are
    * both hash aggregates (partial combine before their shuffles); df is
    * derived FROM the tf frame, so the raw token explosion is scanned
    * once. Ranking uses tf/df — a single IEEE double division of two
    * exact integers, monotone in tf·idf for a fixed corpus, and
    * engine-portable where libm log() is not (oracle-parity rule). The
    * final window partitions by document, so no group outgrows one task.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rn"))
  }

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks. RETIRED from budget-bearing paths — the
    * real merge-table encoder ([[graft.expressions.Bpe]],
    * `graft_bpe_count`) meters those now; this stays as the zero-state
    * regex fallback for quick interactive estimates only.
    */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("bigint")

  /** A tiny function-word list for the language-ID heuristic. */
  val enStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "for")

  /** Fraction of tokens that are English function words — the n-gram
    * language-ID heuristic's scoring half. Exact integer ratio divided
    * in double: deterministic.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(enStopwords: _*)))
    hits.cast("double") / size(toks).cast("double")
  }

  /** Quality-score feature bundle (length / punctuation / stopword
    * ratios). Scores are simple deterministic ratios; the point at
    * 100 TB is that every feature is one codegen'd expression over the
    * text column — a single scan computes them all.
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nChars = length(text).cast("bigint")
    val nWords = size(tokens(text)).cast("bigint")
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "avg_word_len" -> (nChars - (nWords - 1)).cast("double") / nWords.cast("double"),
      "punct_ratio" -> length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") / nChars.cast("double"),
      "stopword_ratio" -> stopwordRatio(text)
    )
  }

  /** Gopher-style quality-rule bundle (Rae et al. 2021 §A1.1 shape):
    * per-document integer features and the boolean rule flags derived
    * from them. Every threshold is an integer cross-multiplication
    * (mean word length in [3,10] becomes `3n <= sumLen <= 10n`), so
    * the rule set is float-free and the whole bundle evaluates in one
    * codegen'd scan — at 100 TB this is a map-only filter pass in
    * front of the dedup/mixing stages.
    */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nWords = size(toks).cast("bigint")
    val sumLen = length(regexp_replace(text, " ", "")).cast("bigint")
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("bigint")
    val nStop = size(filter(toks, t => t.isin(enStopwords: _*))).cast("bigint")
    val okWords = nWords >= 5 && nWords <= 1000
    val okMeanLen = sumLen >= nWords * 3 && sumLen <= nWords * 10
    val okAlpha = nAlpha * 10 >= nWords * 8
    val okStop = nStop >= 2
    Seq(
      "n_words" -> nWords,
      "sum_word_len" -> sumLen,
      "n_alpha_words" -> nAlpha,
      "n_stopwords" -> nStop,
      "ok_word_count" -> okWords,
      "ok_mean_word_len" -> okMeanLen,
      "ok_alpha_ratio" -> okAlpha,
      "ok_stopwords" -> okStop,
      "keep" -> (okWords && okMeanLen && okAlpha && okStop))
  }

  /** Polynomial rolling-hash document fingerprint over word hashes,
    * mod 1e9+7: order-sensitive (unlike a bag-of-words hash) so
    * reordered near-dups get distinct fingerprints, while whitespace
    * normalization maps to the same one. Sequential fold over the token
    * array — deterministic, and bounded: acc < p keeps `acc*31 + h`
    * far inside Long range.
    */
  val fingerprintMod = 1000000007L
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => (acc * 31L + md5Int(w)) % fingerprintMod)

  /** PII redaction: emails, phone-shaped digit groups, then IPv4
    * literals → placeholder tokens, in that fixed order (order matters
    * — the phone pattern must not eat IPv4 octets first). Patterns are
    * deliberately RE2-compatible (no lookaround/backrefs) so the exact
    * same regexes run in the DuckDB oracle; one codegen'd
    * regexp_replace chain, single scan at 100 TB.
    */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val phone = regexp_replace(email,
      "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b", "<PHONE>")
    regexp_replace(phone,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  }

  /** Boilerplate removal: drop HTML/XML tags, collapse the whitespace
    * they leave behind. The crude-but-fast first pass of web-corpus
    * cleaning (a real extractor handles entities and scripts; this is
    * the scan-shaped core).
    */
  def stripHtml(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "<[^>]*>", " "), "\\s+", " "))

  /** Deterministic distributed corpus shuffle: a seeded md5 of the id
    * is the shuffle key, and the global rank under that key order is
    * assigned WITHOUT a single-task global sort — documents are banded
    * by the key's first hex byte (256 lexicographic ranges, uniform
    * under md5), ranked within bands, and offset by the broadcast
    * cumulative band counts. Every stage is distributed; the only
    * driver-sized object is the 256-row offset table. Training
    * pipelines need exactly this: a reproducible global permutation of
    * a 100 TB corpus with no bottleneck stage.
    */
  /** Cumulative offsets of per-band totals, folded on the DRIVER: the
    * band frame is ≤ a few hundred rows by construction, and a Scala
    * fold there keeps the distributed plan free of empty-PARTITION-BY
    * windows — [[Guard]] stays strict with zero exemptions.
    */
  private[graft] def bandOffsets(banded: org.apache.spark.sql.DataFrame,
      bandCol: String, totalOf: Column): org.apache.spark.sql.DataFrame = {
    val spark = banded.sparkSession
    import spark.implicits._
    val counts = banded.groupBy(bandCol).agg(totalOf.as("n"))
      .orderBy(bandCol).collect()
    var acc = 0L
    counts.map { r =>
      val off = acc; acc += r.getLong(1); (r.get(0).toString, off)
    }.toSeq.toDF(bandCol, "band_offset")
  }

  /** Two-phase EXACT heavy hitters over an unbounded key space: all
    * keys whose count times `den` is at least the total row count
    * (i.e. frequency ≥ 1/den). Phase 1 aggregates a d×w count-min
    * sketch (the shuffle carries at most d·w·partitions cells) and
    * collects it to the driver — d·w longs, the same bounded
    * driver-state contract as the IVF centroid table. Phase 2 re-scans
    * the input probing the sketch per ROW through broadcast
    * array-literal lookups (map-only): only rows whose min-estimate
    * clears the threshold shuffle into the exact recount. The sketch
    * never underestimates, so the candidates are a guaranteed superset
    * of the true frequent keys and the final filter makes the result
    * exact — long-tail keys (the overwhelming majority at corpus
    * scale) never cross the wire. Two scans of the input is the
    * inherent trade of every sketch-prefilter algorithm; persist the
    * key frame when the upstream is expensive.
    */
  /** [[exactHeavyHitters]] over a PRE-COUNTED (key, cnt) frame (r13,
    * guide §2.3): callers whose key stream is per-row aggregable
    * map-side (e.g. per-document term frequencies from the native
    * `graft_term_counts` kernel) feed one row per distinct key per
    * upstream row instead of one row per OCCURRENCE — sketch cells sum
    * `cnt`, the probe estimate weights by `cnt`, and the exact recount
    * sums `cnt`, so sketch contents, threshold, candidate set and
    * result are identical to the occurrence-stream form term for term.
    */
  def exactHeavyHittersFreq(freq: org.apache.spark.sql.DataFrame, key: Column,
      cnt: Column, den: Int, d: Int = 4, w: Int = 1024): org.apache.spark.sql.DataFrame = {
    val tok = freq.select(key.cast("string").as("__k"), cnt.cast("bigint").as("__c"))
    val cellRows = tok
      .select(col("__c"), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"),
          (md5Int(concat(lit(s"$r|"), col("__k"))) % w).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("__c")).as("c"))
      .collect()
    val sketch = Array.fill(d, w)(0L)
    cellRows.foreach { row =>
      sketch(row.getInt(0))(row.getLong(1).toInt) = row.getLong(2)
    }
    val total = sketch(0).sum // every occurrence hits sketch row 0 exactly once
    val est = least((0 until d).map { r =>
      element_at(typedLit(sketch(r).toSeq),
        (md5Int(concat(lit(s"$r|"), col("__k"))) % w).cast("int") + 1)
    }: _*)
    tok.filter(est * den >= lit(total))
      .groupBy(col("__k")).agg(sum(col("__c")).as("n"))
      .filter(col("n") * den >= lit(total))
      .withColumnRenamed("__k", "key")
      .select(col("key"), col("n"))
  }

  def exactHeavyHitters(keys: org.apache.spark.sql.DataFrame, key: Column,
      den: Int, d: Int = 4, w: Int = 1024): org.apache.spark.sql.DataFrame = {
    val tok = keys.select(key.cast("string").as("__k"))
    val cellRows = tok
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"),
          (md5Int(concat(lit(s"$r|"), col("__k"))) % w).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val sketch = Array.fill(d, w)(0L)
    cellRows.foreach { row =>
      sketch(row.getInt(0))(row.getLong(1).toInt) = row.getLong(2)
    }
    val total = sketch(0).sum // every row hits sketch row 0 exactly once
    val est = least((0 until d).map { r =>
      element_at(typedLit(sketch(r).toSeq),
        (md5Int(concat(lit(s"$r|"), col("__k"))) % w).cast("int") + 1)
    }: _*)
    tok.filter(est * den >= lit(total))
      .groupBy(col("__k")).agg(count(lit(1)).as("n"))
      .filter(col("n") * den >= lit(total))
      .withColumnRenamed("__k", "key")
  }

  /** Curriculum ordering for training corpora: a global position
    * sorted by ascending difficulty band with a deterministic md5
    * shuffle WITHIN each band — the easy→hard annealing schedule
    * (length or quality warmup) with intra-band mixing. Same
    * no-bottleneck shape as [[corpusShuffle]]: the composite
    * (difficulty, md5-prefix) band keys a partitioned window and the
    * ≤ bands×256 offsets fold on the driver, so there is no
    * single-task global sort at any corpus size. `difficulty` must be
    * a non-negative integer < 1000 (lpad keeps lexicographic band
    * order == numeric order).
    */
  def curriculumOrder(df: org.apache.spark.sql.DataFrame, idCol: String,
      difficulty: Column, seed: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withKey = df
      .withColumn("shuffle_key",
        md5(concat_ws("|", lit(seed), col(idCol).cast("string"))))
      .withColumn("band", concat(
        lpad(difficulty.cast("bigint").cast("string"), 3, "0"),
        substring(col("shuffle_key"), 1, 2)))
    withKey.join(broadcast(bandOffsets(withKey, "band", count(lit(1)))), "band")
      .withColumn("curriculum_rank",
        col("band_offset") + row_number().over(
          Window.partitionBy("band")
            .orderBy(col("shuffle_key"), col(idCol))).cast("bigint"))
      .drop("band", "band_offset")
  }

  def corpusShuffle(df: org.apache.spark.sql.DataFrame, idCol: String,
      seed: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withKey = df.withColumn("shuffle_key",
        md5(concat_ws("|", lit(seed), col(idCol).cast("string"))))
      .withColumn("band", substring(col("shuffle_key"), 1, 2))
    withKey.join(broadcast(bandOffsets(withKey, "band", count(lit(1)))), "band")
      .withColumn("shuffle_rank",
        col("band_offset") + row_number().over(
          Window.partitionBy("band")
            .orderBy(col("shuffle_key"), col(idCol))).cast("bigint"))
      .drop("band", "band_offset")
  }

  /** Global running sum of `valueCol` in `orderCol` order WITHOUT the
    * single-task global window: rows band by the order column's
    * min-max range (256 buckets — floor is monotone, so band order ==
    * global order), prefix-sum within bands, and add the driver-folded
    * band offsets. The distributed work is one stats pass + one
    * partitioned window.
    */
  def orderedCumsum(df: org.apache.spark.sql.DataFrame, orderCol: String,
      valueCol: String, outCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stats = df.agg(min(col(orderCol)).cast("double").as("__mn"),
      max(col(orderCol)).cast("double").as("__mx"))
    val banded = df.crossJoin(broadcast(stats))
      .withColumn("__band", lpad(
        floor((col(orderCol).cast("double") - col("__mn")) * 256.0
          / (col("__mx") - col("__mn") + 1.0)).cast("bigint").cast("string"),
        3, "0")) // zero-padded: lexicographic band order == numeric
      .drop("__mn", "__mx")
    val wIn = Window.partitionBy("__band").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    banded
      .join(broadcast(bandOffsets(banded, "__band", sum(col(valueCol)))), "__band")
      .withColumn(outCol, col("band_offset") + sum(col(valueCol)).over(wIn))
      .drop("__band", "band_offset")
  }

  /** Context-window chunking: split each document into token windows
    * of `chunkSize` starting every `stride` tokens (stride < chunkSize
    * overlaps, the usual shape for embedding/indexing pipelines; the
    * tail window may be shorter). `sequence` + `slice` build all
    * windows inside one codegen'd expression — the only row expansion
    * is the final explode, ~len/stride rows per document.
    */
  def chunk(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val starts = sequence(lit(1), greatest(size(toks), lit(1)), lit(stride))
    df.select(col(idCol),
        posexplode(transform(starts, s => concat_ws(" ", slice(toks, s, lit(chunkSize))))))
      .select(col(idCol), col("pos").cast("bigint").as("chunk_id"), col("col").as("chunk"))
  }

  /** Corpus-frequency document scoring: each document's mean corpus
    * term frequency — low means rare-token-heavy (gibberish, boiler ID
    * strings, foreign scripts), a standard quality signal next to the
    * ratio features. Two aggregations and one equi-join on the token:
    * the vocabulary is corpus-global, so this is the one text op here
    * that genuinely needs a second shuffle; integer counts all the way
    * keep it engine-exact (no libm log).
    */
  def rareTokenScore(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    toks.join(vocab, Seq("tok"))
      .groupBy(col(idCol))
      .agg((sum("tf").cast("double") / count(lit(1))).as("avg_tf"),
        count(lit(1)).as("n_toks"))
  }

  /** Temperature-balanced mixture sampling — allocate a global token
    * budget across strata (sources, languages) proportionally to
    * tokens^T and keep a deterministic md5 fraction of each stratum to
    * hit its allocation. T is fixed at 0.5 (sqrt): the canonical
    * "flatten the mix" temperature AND the only power IEEE guarantees
    * correctly rounded, so the per-stratum rates are bit-identical in
    * the DuckDB oracle (pow() is libm-dependent, sqrt is not). The
    * stratum-weight frame is tiny (#strata rows) and broadcast; the
    * corpus side is one map-only filter. Weight sums go through
    * DECIMAL(38,9) — order-free, and the mantissa stays under 2^53 so
    * the cast back to double is exact in both engines.
    */
  def mixtureSample(df: org.apache.spark.sql.DataFrame, idCol: String,
      strataCol: String, tokenCol: String, tokenBudget: Long): org.apache.spark.sql.DataFrame = {
    val stats = df.groupBy(strataCol)
      .agg(sum(col(tokenCol)).cast("double").as("toks"))
      .withColumn("w", sqrt(col("toks")).cast("decimal(38,9)"))
    val tot = stats.agg(sum(col("w")).as("tw"))
    val rates = stats.crossJoin(broadcast(tot))
      .withColumn("rate", least(lit(1.0),
        lit(tokenBudget.toDouble)
          * (col("w").cast("double") / col("tw").cast("double")) / col("toks")))
      .select(col(strataCol), col("rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(md5Int(col(idCol).cast("string")) % 10000
        < floor(col("rate") * 10000.0).cast("bigint"))
      .drop("rate")
  }

  /** Stratified deterministic sampling: per-stratum keep percentages
    * over the portable md5 bucket of the id. How a training mix is
    * rebalanced (downsample the dominant language, keep the rare ones)
    * — reproducible across runs and engines, no RNG state. Map-only:
    * the filter is one codegen'd expression, no shuffle.
    */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, idCol: String,
      strataCol: String, keepPct: Map[String, Int],
      defaultPct: Int): org.apache.spark.sql.DataFrame = {
    val pct = keepPct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(md5Int(col(idCol).cast("string")) % 100 < pct)
  }

  /** J1-ext — duplicate-PASSAGE signal (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better"): document-level dedup
    * misses boilerplate passages repeated ACROSS distinct documents, so
    * per doc this reports how much of it is span-duplicated — the
    * fraction of its word `n`-gram spans whose hash occurs in at least
    * one OTHER document. Pipelines drop or down-weight high-ratio docs
    * (or escalate to span excision).
    *
    * Scale shape: spans explode to (doc_id, hash) — bounded by corpus
    * word count, the same budget as tokenization — and the corpus is
    * tokenized exactly ONCE: per-(hash, doc) occurrence counts roll up
    * first, a count-window over the hash marks cross-doc duplication,
    * and the per-doc ratio re-aggregates the same frame. All shuffles
    * after the first carry (hash, id, counts) only — never text — and
    * at 100 TB the second pass over the token stream that a
    * build-dup-set-then-rejoin formulation costs is avoided entirely.
    * Documents shorter than `n` words have no spans and drop out (no
    * span can be duplicated).
    */
  def duplicatePassages(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = tokens(col(textCol))
    val spans = when(size(words) >= n,
      transform(sequence(lit(1), size(words) - (n - 1)),
        i => md5(concat_ws(" ", slice(words, i, lit(n))))))
      .otherwise(array())
    // one row per (hash, doc) with its occurrence count — the only
    // pass over the text; everything downstream is count arithmetic
    val perDoc = df.select(col(idCol), explode(spans).as("h"))
      .groupBy(col("h"), col(idCol)).agg(count(lit(1)).as("cnt"))
    // docs-per-hash via an unbounded count window on the hash (no
    // sort, no second scan); a span is duplicated iff n_docs > 1
    val nDocs = count(lit(1)).over(Window.partitionBy(col("h")))
    perDoc.withColumn("n_docs", nDocs)
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_spans"),
        sum(when(col("n_docs") > 1, col("cnt")).otherwise(lit(0)))
          .cast("bigint").as("n_dup_spans"))
      .withColumn("dup_ratio",
        col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** J1-ext — exact duplicated-SPAN EXCISION, the removal step behind
    * [[duplicatePassages]]'s signal (Lee et al. 2022 §3, ExactSubstr:
    * a span repeated anywhere in the corpus is cut everywhere but its
    * canonical first occurrence). Word-level `n`-gram spans stand in
    * for the paper's 50-token suffix-array spans; the canonical keeper
    * of a duplicated hash is its minimum (doc, position) occurrence,
    * encoded as one bigint so the arg-min is a plain MIN aggregate
    * (cross-engine-exact, no struct-ordering semantics involved).
    *
    * Returns `idCol`, `clean_text` (surviving words re-joined),
    * `n_words`, `n_removed`. A word survives unless SOME duplicated,
    * non-keeper span occurrence covers it.
    *
    * Scale shape: the corpus tokenizes ONCE into (doc, start, hash)
    * rows — the tokenization budget, like [[duplicatePassages]] — and
    * the only frame that ever shuffles carries hashes and integer
    * offsets, never text. Cut lists come back to the documents as a
    * per-doc array join (skewless: one row per doc each side), and
    * the rebuild is a map-side higher-order filter over word
    * positions. `posLimit` bounds in-doc positions for the keeper
    * encoding (docs longer than that many words reject fast rather
    * than mis-encode).
    */
  def removeDuplicateSpans(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, n: Int, posLimit: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = tokens(col(textCol))
    // per-position span hashes via ONE native kernel pass (the old
    // per-position slice + concat_ws + md5 expression chain allocated
    // an n-word array copy per position — the measured stage-0 CPU at
    // sf10); 60-bit md5 prefixes shuffle as longs and the oracle
    // replays the same truncation (the q_contamination idiom)
    val occ = df.select(col(idCol), explode(graft.expressions
        .TextSketchExpressions.spanHash60(col(textCol), n)).as("s"))
      .select(col(idCol), col("s.i").as("i"), col("s.h").as("h"))
      // in-plan fail-fast if a doc is too long for the keeper encoding
      // (the [[Guard.maxGroupWidth]] assert-rides-the-plan idiom)
      .filter(assert_true(col("i") <= posLimit,
        lit(s"span position exceeds posLimit=$posLimit")).isNull)
      .withColumn("occ_key", col(idCol).cast("long") * posLimit + col("i"))
    // per-hash stats via ONE window pass on the hash key: total
    // occurrences (dup iff > 1) and the canonical keeper occurrence.
    // (A groupBy + join-back of the duplicated hashes was MEASURED
    // SLOWER at sf10 — 25 s vs 15 s: the un-materialized occurrence
    // frame re-runs the 15-gram tokenize+md5 pass for the join stream,
    // and that second corpus pass costs more than the window's sort.
    // The window keeps the operator strictly single-pass over the
    // corpus, which is also the 100 TB shape.)
    val wh = Window.partitionBy(col("h"))
    val marked = occ
      .withColumn("n_occ", count(lit(1)).over(wh))
      .withColumn("keeper", min(col("occ_key")).over(wh))
      .filter(col("n_occ") > 1 && col("occ_key") =!= col("keeper"))
    val cuts = marked.groupBy(col(idCol))
      .agg(collect_list(col("i")).as("cut_starts"))
    df.join(cuts, Seq(idCol), "left")
      .select(col(idCol), col(textCol), col("cut_starts"))
      .withColumn("__words", words)
      .withColumn("__cuts", coalesce(col("cut_starts"),
        array().cast("array<int>")))
      .withColumn("__keep",
        filter(sequence(lit(1), size(col("__words"))),
          p => !exists(col("__cuts"), s => p >= s && p <= s + (n - 1))))
      .select(col(idCol),
        concat_ws(" ", transform(col("__keep"),
          p => element_at(col("__words"), p))).as("clean_text"),
        size(col("__words")).cast("bigint").as("n_words"),
        (size(col("__words")) - size(col("__keep"))).cast("bigint").as("n_removed"))
  }

  /** J1-ext — per-document n-gram NOVELTY: the fraction of a doc's
    * distinct word n-gram shingles whose corpus-wide FIRST occurrence
    * (minimum doc id — ids are ingestion order) is this document. The
    * curation complement of [[duplicatePassages]]: that scores how much
    * of a doc is duplicated ANYWHERE; novelty scores how much the doc
    * adds over everything BEFORE it — the marginal-value signal a
    * data-mixture pipeline sorts on when deciding what to keep from a
    * new crawl snapshot (near-zero novelty ⇒ the snapshot re-crawled
    * what the corpus already has).
    *
    * Scale shape: one shingle pass ([[graft.ops.Dedup.shingles]] —
    * explode is the only row expansion over the corpus), one shuffle
    * keyed by shingle for the min-id window, one re-aggregation keyed
    * by doc. Every shuffle after the explode carries (shingle, id)
    * only — text never moves twice.
    */
  def ngramNovelty(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Dedup.shingles(df, textCol, idCol, n)
      .withColumn("first_doc",
        min(col(idCol)).over(Window.partitionBy(col("shingle"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col(idCol), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col(idCol), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty"))
  }
}
