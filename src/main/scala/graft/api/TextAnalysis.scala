package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Public text-analysis API: corpus statistics, token counting, quality
  * scoring, fingerprinting, language identification. Whole-corpus
  * single-scan operators built from codegen'd functions only.
  */
object TextAnalysis {

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")


  /** Per-document token statistics. Ratios round at 6dp (4dp can tie
    * exactly for small-integer quotients).
    */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            nCharsCol: String): DataFrame =
    docs.select(col(idCol), col(nCharsCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), col(nCharsCol),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_unique"),
        round(col(nCharsCol).cast("double") / size(col("w")), 6).as("avg_tok_len"))

  /** Corpus-wide top-k word counts. */
  def topWords(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(k)

  /** Top-k PMI-scored bigram collocations over the corpus — the phrase
    * detection pass (Mikolov-style word2vec phrases) a tokenizer-vocab
    * or phrase-mining pipeline runs before training:
    * PMI(a,b) = ln(p(a,b) / (p(a)·p(b)))
    *          = ln c_ab + 2·ln N − ln B − ln c_a − ln c_b,
    * computed as 6dp-rounded ln TERMS combined exactly in decimal space
    * (libm vs JVM `log` differ in the last ulp; rounding each term
    * first makes the sum engine-identical, the H.dsum discipline).
    *
    * Scale shape: two hash aggregations over the token stream (bigram
    * and unigram counts, both map-side partial), the `minCount` filter
    * BEFORE the two vocabulary joins (prunes the long tail — at sane
    * thresholds the joined side is orders smaller than the vocab), a
    * single-row totals frame crossed in as a broadcast (no driver
    * collect), and top-k as TakeOrderedAndProject under a total
    * (pmi, w1, w2) order.
    */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long = 5,
                 k: Int = 100): DataFrame = {
    val D6 = org.apache.spark.sql.types.DecimalType(18, 6)
    def lnd(c: Column): Column = round(log(c.cast("double")), 6).cast(D6)
    val toks = docs.select(split(col(textCol), " ").as("w"))
    val uni = toks.select(explode(col("w")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("w")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 1),
             i -> named_struct('w1', element_at(w, i),
                               'w2', element_at(w, i + 1)))""")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val totals = uni.agg(sum(col("c")).as("n_tokens"))
      .crossJoin(bi.agg(sum(col("c_ab")).as("n_bigrams")))
    bi.filter(col("c_ab") >= minCount)
      .join(uni.select(col("t").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("t").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(totals)) // bounded: 1-row corpus totals
      .select(col("w1"), col("w2"), col("c_ab").cast("long").as("c_ab"),
        (lnd(col("c_ab")) + lit(2).cast(D6) * lnd(col("n_tokens"))
          - lnd(col("n_bigrams")) - lnd(col("c_a")) - lnd(col("c_b")))
          .cast("double").as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Top-`v` vocabulary with cumulative token coverage — the
    * vocab-size-selection diagnostic a tokenizer build runs first
    * ("how many token types cover 95% of the stream?"). `cum_ppm` is
    * exact integer parts-per-million of the total token count, so the
    * output is engine-reproducible with no fp division.
    *
    * Scale shape: one partial-agg count over the token stream, top-v as
    * TakeOrderedAndProject under the total (n DESC, word) order, and
    * the cumulative window runs over the v surviving rows only (a
    * single bounded partition — v is a constant like 50k, not a corpus
    * quantity), with the total crossed in as a broadcast single row.
    * The ppm scaling runs in DECIMAL(38,0): `cum * 1000000` on BIGINT
    * would silently wrap past ~9.2e12 total tokens (non-ANSI Spark),
    * i.e. well inside a 100 TB corpus; DECIMAL keeps it exact to 1e31
    * tokens and matches DuckDB's 128-bit HUGEINT sum bit-for-bit.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, v: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = docs.select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    val tot = wc.agg(sum(col("n")).as("t"))
    val w = Window.orderBy(col("n").desc, col("word"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wc.orderBy(col("n").desc, col("word")).limit(v)
      .withColumn("cum", sum(col("n")).over(w))
      .crossJoin(broadcast(tot)) // bounded: 1-row token total
      .select(col("word"), col("n").cast("long").as("n"),
        expr("CAST(CAST(cum AS DECIMAL(38,0)) * 1000000 div t AS BIGINT)")
          .as("cum_ppm"))
      .orderBy(col("n").desc, col("word"))
  }

  /** Gopher-style within-document repetition metrics (Rae et al. 2021,
    * "Scaling Language Models", Table A1 — the repetition family of
    * quality filters): per document, the duplicate-word share and the
    * token share of the single most frequent word 2-gram / 3-gram.
    * Boilerplate, keyword-stuffed, and degenerate-generation text score
    * high; a filter drops documents above a ppm threshold.
    *
    * All three metrics are EXACT integer ppm (count·10⁶ div n_words) —
    * no fp division, so any engine reproduces them bit-for-bit.
    *
    * Scale shape: the duplicate-word share is a pure per-row map
    * (size(array_distinct)); the n-gram maxima are explode → two hash
    * aggregations ((doc, gram) count, then per-doc max) — both
    * partial-agg friendly, no window, no self-join. Grams travel as
    * xxhash64 keys (8 bytes, same ~2⁻⁶⁴ trade as the dedup postings):
    * only COUNTS survive the aggregation, so a collision could only
    * merge two gram counts of one document.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // split once, serve three consumers (the base metrics and both
    // n-gram branches) — without the persist each branch re-scans the
    // corpus and re-splits the text
    val w = Pins.pin(docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n_words"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val base = w.select(col("doc_id"), col("n_words"),
      size(array_distinct(col("w"))).as("n_distinct"))
    def topGram(n: Int, alias: String) = w
      .filter(col("n_words") >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(w) - ${n - 1}),
              i -> xxhash64(${(0 until n).map(j => s"element_at(w, i + $j)")
                .mkString(", ")}))""")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as(alias))
    base
      .join(topGram(2, "t2"), Seq("doc_id"), "left")
      .join(topGram(3, "t3"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words").cast("long").as("n_words"),
        expr("(n_words - n_distinct) * 1000000L div n_words")
          .as("dup_word_ppm"),
        coalesce(expr("t2 * 2000000L div n_words"), lit(0L)).as("top2_ppm"),
        coalesce(expr("t3 * 3000000L div n_words"), lit(0L)).as("top3_ppm"))
  }

  /** Exact per-group p50/p90/p99 of a numeric column — the length
    * dashboard a curation run reads per source before choosing cut-offs
    * (truncation/packing budgets, outlier trims). Discrete (lower)
    * percentiles at EXACT integer rank indices (idx = (p·n + 99) div
    * 100 — no fp multiply, so every engine picks the identical element;
    * approx_percentile's sketch would be neither exact nor
    * cross-engine stable).
    *
    * Scale shape: the corpus first collapses to an exact per-(group,
    * value) HISTOGRAM — a hash aggregation with map-side combine, fully
    * parallel — and only the histogram rows flow into the per-group
    * cumulative window. The one per-group task is therefore bounded by
    * the VALUE-DOMAIN cardinality (distinct lengths — ~max document
    * length, independent of corpus size), not by group row count: a
    * 10⁹-doc source ranks through at most ~10⁶ histogram rows where the
    * previous row_number window sorted all 10⁹ rows in a single task.
    * (For a genuinely unbounded-cardinality value domain — raw doubles,
    * say — pre-bucket the value or use a range-partitioned two-phase
    * rank selection; for lengths the histogram IS the scale-safe exact
    * form.)
    */
  def lengthPercentiles(docs: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL values are EXCLUDED up front: engines disagree on where
    // nulls sort (Spark first, DuckDB last), so a null row would shift
    // every rank index differently per engine — silent divergence
    // instead of a well-defined percentile
    val hist = docs.select(col(groupCol).as("__g"),
      col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy("__g", "v").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("hi", sum(col("c")).over(
        Window.partitionBy("__g").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("__g")))
    // the value at rank idx (idx = (p·n + 99) div 100, same exact
    // integer rank as a row-level row_number) is the smallest distinct
    // value whose cumulative count reaches idx
    def pick(p: Int, alias: String) =
      min(when(expr(s"hi >= ($p * n + 99) div 100"), col("v"))).as(alias)
    cum.groupBy(col("__g"))
      .agg(max(col("n")).as("n_docs"),
        pick(50, "p50"), pick(90, "p90"), pick(99, "p99"))
      .select(col("__g").as(groupCol), col("n_docs"),
        col("p50"), col("p90"), col("p99"))
      .orderBy(groupCol)
  }

  /** Whitespace + BPE-ish regex token counts. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  pattern: String = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"): DataFrame =
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(pattern), lit(0)))
        .cast("long").as("n_bpe_ish"),
      size(split(col(textCol), " ")).cast("long").as("n_ws"))

  /** Per-doc token counts under a deterministic byte-level BPE
    * ([[Bpe]]) with a fixed merges table. The encode loop runs once per
    * DISTINCT word — V-bounded work, distributed over the vocab frame —
    * and joins back to the exploded corpus on the word key. The join is
    * deliberately UNHINTED: at test scale AQE broadcasts the vocab
    * side; at crawl scale (vocab long tail of urls/hashes can reach
    * 10⁸ rows) it degrades to a co-partitioned hash join instead of a
    * driver OOM — the round-7/8 no-data-dependent-broadcast rule.
    */
  def bpeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = Bpe.ranksOf(merges)
    // tokenize ONCE: the materialized (id, word) frame feeds both the
    // distinct-vocab encode and the join probe — without it each
    // consumer re-runs the corpus split/explode scan (the shingles /
    // shared-segment exchange-reuse discipline)
    val ex = Pins.pin(docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wordToks = ex.select(col("word")).distinct()
      .as[String]
      .map(w => (w, Bpe.countTokens(w, ranks).toLong))
      .toDF("word", "n_toks")
    ex.join(wordToks, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("n_toks").as("n_bpe_tokens"))
  }

  /** Full BPE tokenization to VOCABULARY IDS — the artifact a training
    * pipeline actually writes. The vocabulary is fully determined by
    * the merges table: byte tokens own ids 0-255 (ASCII corpus, so a
    * single-char token's id IS its code point) and each distinct merged
    * string takes 256 + its first-appearance rank. Output one row per
    * (doc, word_idx, tok_idx, token_id), 0-based indexes — totally
    * ordered, so a relational oracle can hash the exact id stream.
    * Same scale shape as [[bpeTokenCounts]]: one corpus tokenize, the
    * encode work rides the DISTINCT vocab, ids join back on the word.
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = Bpe.ranksOf(merges)
    val vocabIds: Map[String, Int] = merges.map { case (a, b) => a + b }
      .distinct.zipWithIndex.map { case (s, i) => s -> (256 + i) }.toMap
    val ex = Pins.pin(docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("word_idx", "word")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wordIds = ex.select(col("word")).distinct()
      .as[String]
      .map { w =>
        val ids = Bpe.encode(w, ranks).map { t =>
          if (t.length == 1) {
            val c = t.charAt(0).toInt
            require(c < 128,
              s"non-ASCII char $c in corpus word — byte-token ids assume ASCII")
            c
          } else vocabIds(t)
        }
        (w, ids)
      }.toDF("word", "ids")
    ex.join(wordIds, "word")
      .select(col("doc_id"), col("word_idx").cast("long").as("word_idx"),
        posexplode(col("ids")))
      .select(col("doc_id"), col("word_idx"),
        col("pos").cast("long").as("tok_idx"),
        col("col").cast("long").as("token_id"))
  }

  /** Stopword ratio of a split-token column — the one definition both
    * the score frame and the fused filter build their keep gate from,
    * so the two can never silently diverge (q_pipeline_e2e's oracle
    * depends on their equivalence).
    */
  private def stopRatio(w: Column, stopwords: Seq[String]): Column = {
    val stopList = array(stopwords.map(lit): _*)
    size(filter(w, x => array_contains(stopList, x))).cast("double") / size(w)
  }

  /** Exact-integer stopword ppm of a split-token column — the ONE
    * definition [[adaptiveQualityThresholds]] and [[qualityScoreLinear]]
    * both gate on (the stopRatio rule: shared so the two can never
    * silently diverge). size(w) ≥ 1 always (split of "" is [""]), so
    * the integer div cannot throw.
    */
  private def stopPpm(w: Column, stopwords: Seq[String]): Column = {
    val stopList = array(stopwords.map(lit): _*)
    val a = size(filter(w, x => array_contains(stopList, x))).cast("long") *
      lit(1000000L)
    val b = size(w).cast("long")
    // exact integer div in pure Column API: a - pmod(a,b) is an exact
    // multiple of b, and dividing exact representables below 2^53 with
    // an integral quotient is IEEE-exact — identical to SQL DIV
    ((a - pmod(a, b)) / b).cast("long")
  }

  private def keepGate(w: Column, stopwords: Seq[String], minTokens: Int,
                       maxTokens: Int, minStopRatio: Double): Column =
    size(w).between(minTokens, maxTokens) &&
      stopRatio(w, stopwords) >= minStopRatio

  /** `stop_counts` packs `(n_tokens << 32) | n_stop` in one BIGINT —
    * these unpack it. The counts equal `size(w)` / `size(filter(w,
    * contains))` of the split-token formulation exactly, so every
    * derived ratio/ppm below is the same arithmetic on the same
    * integers.
    */
  private def packedTokens(p: Column): Column = shiftright(p, 32)
  private def packedStops(p: Column): Column = p.bitwiseAND(lit(0xffffffffL))

  /** Exact-integer stopword ppm from the packed counts — the same
    * `(n_stop·10⁶ − pmod)/n_tokens` arithmetic [[stopPpm]] computed
    * from the split-token column.
    */
  private def stopPpmPacked(p: Column): Column = {
    val a = packedStops(p) * lit(1000000L)
    val b = packedTokens(p)
    ((a - pmod(a, b)) / b).cast("long")
  }

  /** Length / stopword-ratio / alpha-ratio quality gate. */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String,
                   nCharsCol: String,
                   stopwords: Seq[String] = DefaultStopwords,
                   minTokens: Int = 20, maxTokens: Int = 90,
                   minStopRatio: Double = 0.05): DataFrame = {
    // one byte-walk expression for token+stopword counts and one for
    // the alpha count (pre-compiled static cores) instead of
    // split + filter(array_contains) HOF lambdas and a regexp_replace
    // that built a stripped copy of the text just to take its length
    graft.functions.TextFunctions.register(docs.sparkSession)
    val sc = call_function("stop_counts", col(textCol), typedlit(stopwords))
    docs.select(col(idCol), col(textCol), col(nCharsCol), sc.as("_p"))
      .withColumn("stop_r",
        packedStops(col("_p")).cast("double") / packedTokens(col("_p")))
      .withColumn("alpha_r",
        call_function("lower_alpha_count", col(textCol)).cast("double")
          / col(nCharsCol))
      .select(col(idCol),
        packedTokens(col("_p")).as("n_tokens"),
        round(col("stop_r"), 6).as("stopword_ratio"),
        round(col("alpha_r"), 6).as("alpha_ratio"),
        (packedTokens(col("_p")).between(minTokens, maxTokens) &&
          col("stop_r") >= minStopRatio).as("keep"))
  }

  /** [[qualityScore]]'s keep-gate fused into a single filter scan: rows
    * of `docs` that pass, with every original column. Pipelines that
    * only need the survivors should use this instead of joining the
    * score frame back on the id — that join is a corpus-sized SMJ (the
    * kept set is a large fraction of the corpus, never broadcastable),
    * while this is one scan with a codegen'd predicate and no shuffle.
    */
  def qualityFilter(docs: DataFrame, textCol: String,
                    stopwords: Seq[String] = DefaultStopwords,
                    minTokens: Int = 20, maxTokens: Int = 90,
                    minStopRatio: Double = 0.05): DataFrame = {
    // ONE expression evaluation per row (pre-compiled byte walk): the
    // split + filter(array_contains) formulation ran interpreted HOF
    // lambdas per token, and its subexpressions were re-evaluated
    // wherever the optimizer pushed copies of the predicate
    graft.functions.TextFunctions.register(docs.sparkSession)
    docs.filter(call_function("quality_keep", col(textCol),
      typedlit(stopwords), lit(minTokens), lit(maxTokens),
      lit(minStopRatio)))
  }

  /** Per-source ADAPTIVE quality thresholding — fixed global cutoffs
    * ([[qualityFilter]]) misfit heterogeneous corpora: a threshold
    * tuned for web crawl drops half of a code source. This computes
    * each source's own `pct`-th percentile of an integer quality score
    * (stopword ppm = (n_stopwords·10⁶) div n_tokens — EXACT integer
    * arithmetic, no fp rounding anywhere) and reports, per source, the
    * threshold and how many documents clear it (score ≥ threshold, the
    * drop-bottom-decile shape at pct=10).
    *
    * Scale shape is the [[lengthPercentiles]] histogram-rank design:
    * the corpus collapses to per-(source, score) counts in one map-side
    * combined aggregation BEFORE any window, so the per-source window
    * task is bounded by the ppm value domain (≤ 10⁶+1 rows), never
    * corpus rows; the kept count falls straight
    * out of the cumulative histogram (docs clearing the threshold are
    * exactly the rows at or past the rank), so there is no second
    * corpus scan and no join at all.
    */
  def adaptiveQualityThresholds(docs: DataFrame, sourceCol: String,
                                textCol: String,
                                stopwords: Seq[String] = DefaultStopwords,
                                pct: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // stopwords enter through the Column API (array of literals), never
    // spliced into a SQL string — a stopword containing a quote must be
    // data, not parsed syntax
    val stopList = array(stopwords.map(lit): _*)
    // NULL source or text excluded up front (the lengthPercentiles
    // rule): engines disagree on where nulls sort, and a null text has
    // no score — n_docs counts scored documents only
    graft.functions.TextFunctions.register(docs.sparkSession)
    val scored = docs
      .filter(col(sourceCol).isNotNull && col(textCol).isNotNull)
      .select(col(sourceCol).as("__s"),
        call_function("stop_counts", col(textCol), typedlit(stopwords))
          .as("_p"))
      .select(col("__s"), stopPpmPacked(col("_p")).as("ppm"))
    val hist = scored.groupBy("__s", "ppm").agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("hi", sum(col("c")).over(
        Window.partitionBy("__s").orderBy("ppm")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("__s")))
    // n_kept falls straight out of the cumulative histogram — the docs
    // clearing the threshold are exactly the rows at or past the rank —
    // so no second corpus scan and no join is needed at all
    cum.withColumn("rank_ok", expr(s"hi >= ($pct * n + 99) div 100"))
      .groupBy(col("__s"))
      .agg(max(col("n")).as("n_docs"),
        min(when(col("rank_ok"), col("ppm"))).as("thr_ppm"),
        sum(when(col("rank_ok"), col("c"))).as("n_kept"))
      .select(col("__s").as(sourceCol), col("n_docs"), col("thr_ppm"),
        col("n_kept"))
  }

  /** RE2-safe PII patterns (no backtracking constructs, no lookaround):
    * simple enough that Java regex, RE2, and the DuckDB oracle agree
    * byte-for-byte on every match. Dolma/C4-style masking targets.
    *
    * Ipv4Re bounds every octet to 0-255 and anchors the quad with \b
    * (an ASCII word boundary in BOTH RE2 and Java), so out-of-range
    * runs like 256.1.1.1 or 1234.5.6.7 are left fully intact rather
    * than partially mangled; an in-range quad masks whatever its
    * semantic role — a version string like 1.2.3.4 is
    * indistinguishable from an address and takes the standard
    * over-redaction trade. PhoneRe requires 3-3-4 digit grouping with
    * optional +CC/(area) and optional [-. ] separators — covering
    * (555)123-4567, 555.123.4567, and bare 5551234567 — while \b
    * anchors keep longer digit runs and ISO dates unmasked (any
    * 10-digit phone-shaped run does mask: the Dolma-style trade).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  val Ipv4Re = s"\\b$Octet\\.$Octet\\.$Octet\\.$Octet\\b"
  val PhoneRe =
    "(\\+[0-9]{1,2}[-. ]?)?\\(?\\b[0-9]{3}\\)?[-. ]?[0-9]{3}[-. ]?[0-9]{4}\\b"

  /** PII masking (the Dolma/C4 pre-training hygiene pass): replace
    * email / IPv4 / phone-shaped spans with typed mask tokens and
    * report per-doc match counts. Pure regexp_replace /
    * regexp_extract_all — a single codegen'd scan, no UDF, no shuffle.
    * Passes apply email → IPv4 → phone in a fixed order (emails and
    * dotted quads contain digit runs a later phone pass may not see
    * twice), so the output is deterministic on any engine.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        col(textCol).as("t0"),
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"))
      .withColumn("t1", regexp_replace(col("t0"), EmailRe, "<EMAIL>"))
      .withColumn("n_ips",
        size(regexp_extract_all(col("t1"), lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("t2", regexp_replace(col("t1"), Ipv4Re, "<IP>"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("t2"), lit(PhoneRe), lit(0))).cast("long"))
      .select(col(idCol),
        regexp_replace(col("t2"), PhoneRe, "<PHONE>").as("redacted"),
        col("n_emails"), col("n_ips"), col("n_phones"))

  /** Polynomial rolling hash over the document bytes (mod 1e9+7). */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), expr(
      s"""aggregate(transform(split($textCol, ''), c -> CAST(ascii(c) AS BIGINT)),
                    0L, (a, x) -> (a * 31 + x) % 1000000007)""").as("fp"))

  /** Top-k terms per document by tf-idf (ln idf, 6dp): keyword
    * extraction over a corpus in three hash aggregations — tf per
    * (doc, term), df per term, N — then a per-doc ranking window.
    * Ranking uses the ROUNDED score (ties broken by term) so the
    * ordering is identical on every engine and partitioning.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // tf rows ARE the distinct (doc, term) pairs, so counting them per
    // term is the document frequency — no second tokenize scan. The
    // throwaway sum(tf) keeps this branch's upstream aggregate
    // byte-identical to the tf branch (column pruning would otherwise
    // drop the count from it, and exchange reuse only fires on
    // identical subtrees — the corpus would silently tokenize twice);
    // the always-true filter consumes the sum so the pruner can't
    // remove it. Pinned by the one-Generate PlanSpec test. A windowed
    // count-per-term over tf would also avoid the rescan but piles
    // every (doc, stopword-term) row into one task — a skew trap at
    // corpus scale; the aggregate form map-side-combines instead.
    val df = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("_w"))
      .filter(col("_w") >= 1).drop("_w")
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n)) // bounded: 1-row doc count
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tfidf"))
  }

  /** Gopher-style repetition filters (Rae et al. 2021, appendix A1):
    * the fraction of all words taken by the single most frequent word,
    * and the fraction of duplicated word bigrams. Boilerplate, spam,
    * and degenerate generations sit high on both — these are the
    * standard repetition cut-offs in LLM-data pipelines. Pure codegen'd
    * HOFs over one scan: no explode, no shuffle, streams at scan speed.
    * Docs under two words are dropped (no bigram exists). 6dp rounding.
    */
  def repetitionStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    docs.select(col(idCol), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol),
        expr("""round(CAST(array_max(transform(array_distinct(w),
                    d -> size(filter(w, x -> x = d)))) AS DOUBLE)
                  / CAST(size(w) AS DOUBLE), 6)""").as("top_word_frac"),
        expr("""round(1.0D - CAST(size(array_distinct(
                    transform(sequence(1, size(w) - 1),
                      i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))))
                    AS DOUBLE) / CAST(size(w) - 1 AS DOUBLE), 6)""")
          .as("dup_bigram_frac"))

  /** Shared-prefix boilerplate detection: documents opening with the
    * SAME first-k tokens usually share a crawl template (navigation
    * headers, license banners, scraper artifacts) — the corpus-level
    * complement of per-document repetition stats, and the cheap first
    * pass before segment-level dedup ([[graft.api.Dedup]]). Emits one
    * row per affected document: (id, prefix, n_docs sharing it) for
    * prefixes held by ≥ `minDocs` documents.
    *
    * Scale shape: the aggregation keys on xxhash64(prefix) with
    * map-side partials, filtered to the hot set BEFORE re-joining the
    * per-document frame — templates are few, so the join side AQE sees
    * is broadcast-sized even when the corpus is 100 TB. The
    * corpus-sized join probe carries only (id, 8-byte hash) — the
    * round-6 postings trick: the prefix STRING survives only on the
    * hot side (its aggregation exchange is per-distinct-prefix, not
    * per-doc), a ~4-8× cut of the probe exchange at crawl scale. No
    * window over the full corpus. Two distinct prefixes colliding at 64
    * bits would merge (~2⁻⁶⁴ per pair — the near-dup postings trade).
    */
  def prefixBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, minDocs: Long): DataFrame = {
    val pref = docs.select(col(idCol),
        array_join(slice(split(col(textCol), " "), 1, k), " ").as("prefix"))
      .withColumn("ph", xxhash64(col("prefix")))
    val hot = pref.groupBy("ph")
      // one string per distinct hash (identical prefixes mod collision)
      .agg(min(col("prefix")).as("prefix"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    pref.select(col(idCol), col("ph")).join(hot, "ph")
      .select(col(idCol), col("prefix"), col("n_docs"))
  }

  /** Fixed-weight LINEAR quality score — the classifier-filter stage
    * shape of fasttext/logreg quality models, with fully replayable
    * arithmetic: three exact-integer ppm features (stopword ppm of
    * tokens, lowercase-alpha ppm of chars, length ppm against a token
    * cap) combine under integer weights into one BIGINT score;
    * keep = score ≥ cut. No transcendentals, no doubles — the score is
    * bit-identical on any engine and partitioning, so the whole gate
    * carries an oracle. Swap LEARNED weights in (they arrive as plain
    * numbers) without touching the plan — the plumbing is the operator,
    * the default weights are a placeholder model.
    */
  def qualityScoreLinear(docs: DataFrame, idCol: String, textCol: String,
                         nCharsCol: String,
                         stopwords: Seq[String] = DefaultStopwords,
                         wStop: Long = 3, wAlpha: Long = 1, wLen: Long = 2,
                         lenCap: Int = 100,
                         cut: Long = 1100000L): DataFrame = {
    graft.functions.TextFunctions.register(docs.sparkSession)
    docs
      // n_chars = 0 (empty crawl artifacts) must be excluded, not
      // divide-by-zero the whole job under ANSI mode; NULLs likewise
      .filter(col(textCol).isNotNull && col(nCharsCol).isNotNull &&
        col(nCharsCol) > 0)
      .select(col(idCol), col(textCol), col(nCharsCol),
        call_function("stop_counts", col(textCol), typedlit(stopwords))
          .as("_p"))
      // the ONE shared stop-ppm definition (see stopPpmPacked) — the
      // linear gate and the adaptive thresholds can never diverge
      .withColumn("stop_ppm", stopPpmPacked(col("_p")))
      .withColumn("alpha_ppm",
        expr(s"lower_alpha_count($textCol) * 1000000L div $nCharsCol"))
      .withColumn("len_ppm",
        expr(s"least(shiftright(_p, 32), ${lenCap}L) * 1000000L " +
          s"div ${lenCap}L"))
      .select(col(idCol),
        (col("stop_ppm") * lit(wStop) + col("alpha_ppm") * lit(wAlpha) +
          col("len_ppm") * lit(wLen)).as("score"),
        col("stop_ppm"), col("alpha_ppm"), col("len_ppm"))
      .withColumn("keep", col("score") >= lit(cut))
  }

  /** Within-doc duplicate-paragraph fraction (Gopher repetition rule,
    * Rae et al. 2021 table A1: "duplicate paragraph fraction"): the
    * share of a doc's fixed-width segments that repeat an EARLIER
    * segment of the same doc, exact ppm. Complements
    * [[Dedup.dropDuplicateParagraphs]] (corpus-wide removal) with the
    * per-doc diagnostic a repetition gate thresholds on. Pure map-side
    * — segmentation, dedupe, and the ppm all happen inside one row.
    */
  def duplicateSegmentStats(docs: DataFrame, idCol: String,
                            textCol: String,
                            segTokens: Int = 15): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      // the ONE segmentation definition, shared with the corpus-wide
      // paragraph dedup (Dedup.segmentListSql) — the diagnostic and
      // the removal pass can never diverge
      .withColumn("segs", expr(Dedup.segmentListSql(segTokens)))
      .select(col(idCol),
        size(col("segs")).cast("long").as("n_segs"),
        (size(col("segs")) - size(array_distinct(col("segs"))))
          .cast("long").as("n_dup_segs"))
      .withColumn("dup_ppm", expr("n_dup_segs * 1000000L div n_segs"))
  }

  /** Gopher-style rule-based quality flags (Rae et al. 2021 §A1.1):
    * the word-count / mean-word-length / alphabetic-ratio / stopword
    * heuristics production crawl filters apply before any learned
    * gate, one boolean per rule plus the conjunction, so downstream
    * can both filter on `keep` and audit WHICH rule rejected a doc
    * (the per-rule rejection histogram is the standard curation
    * diagnostic). All features are exact integers (ppm) — fully
    * engine-replayable, no float thresholds.
    *
    * Rules: minWords ≤ n_words ≤ maxWords; mean word length within
    * [minMeanWlenPpm, maxMeanWlenPpm] (Gopher: 3–10 chars);
    * ≥ minAlphaPpm of words contain an alphabetic character (Gopher:
    * 80%); ≥ minStopHits DISTINCT stopwords present (Gopher: 2).
    *
    * Scale shape: pure per-row map work — zero shuffle, zero joins;
    * whole-stage codegen end to end.
    */
  def gopherQualityFlags(docs: DataFrame, idCol: String, textCol: String,
                         stopwords: Seq[String] = DefaultStopwords,
                         minWords: Int = 50, maxWords: Int = 100000,
                         minMeanWlenPpm: Long = 3000000L,
                         maxMeanWlenPpm: Long = 10000000L,
                         minAlphaPpm: Long = 800000L,
                         minStopHits: Int = 2): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got ($minWords, $maxWords)")
    val stopList = array(stopwords.map(lit): _*)
    docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      // size(w) >= 1 always (split of "" is [""]) — the ppm divisions
      // cannot hit zero even on empty crawl artifacts
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("mean_wlen_ppm", expr(
        "aggregate(transform(w, x -> cast(length(x) as bigint)), 0L, " +
          "(a, x) -> a + x) * 1000000L div n_words"))
      .withColumn("alpha_w",
        size(filter(col("w"), x => x.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("alpha_ppm", expr("alpha_w * 1000000L div n_words"))
      .withColumn("stop_hits",
        size(filter(stopList, sw => array_contains(col("w"), sw)))
          .cast("long"))
      .withColumn("f_nwords", col("n_words").between(minWords, maxWords))
      .withColumn("f_wlen",
        col("mean_wlen_ppm").between(minMeanWlenPpm, maxMeanWlenPpm))
      .withColumn("f_alpha", col("alpha_ppm") >= minAlphaPpm)
      .withColumn("f_stop", col("stop_hits") >= minStopHits)
      .withColumn("keep",
        col("f_nwords") && col("f_wlen") && col("f_alpha") && col("f_stop"))
      .drop("w", "alpha_w")
  }

  /** Boilerplate-prefix REMOVAL — the cut half of
    * [[prefixBoilerplate]], completing the detect→remove parity the
    * span-removal family set: documents whose first-k tokens form a
    * template shared by ≥ `minDocs` docs lose that prefix (from EVERY
    * member — crawl headers are stripped corpus-wide, unlike dedup
    * where one occurrence is kept as the canonical copy); everything
    * else passes through unchanged. Output (id, text_clean, n_removed)
    * for every input doc.
    *
    * Semantics note vs [[prefixBoilerplate]]: sub-k docs are EXEMPT
    * here — they have no complete k-token prefix, so they neither form
    * nor join a template (their short prefix string would alias a
    * longer doc's truncation) — while the detector hashes whatever
    * prefix exists and can report a template of sub-k docs. A template
    * the detector reports among sub-k docs is deliberately never cut.
    *
    * Scale shape: the hot set collapses map-side on the 8-byte prefix
    * hash and stays broadcast-sized; the corpus-sized probe carries
    * (id, text, hash) — the text must travel (it IS the output), but
    * no token array and no prefix string ride along.
    */
  def trimBoilerplatePrefix(docs: DataFrame, idCol: String, textCol: String,
                            k: Int, minDocs: Long): DataFrame = {
    def w = split(col(textCol), " ")
    val pref = docs.select(col(idCol), col(textCol))
      .withColumn("ph", xxhash64(array_join(slice(w, 1, k), " ")))
      .withColumn("full", size(w) >= k)
    val hot = pref.filter(col("full"))
      .groupBy("ph").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("ph"), lit(true).as("hit"))
    pref.join(hot, Seq("ph"), "left")
      .select(col(idCol),
        when(col("hit").isNotNull && col("full"),
            concat_ws(" ",
              expr(s"slice(split($textCol, ' '), ${k + 1}, " +
                s"size(split($textCol, ' ')) - $k)")))
          .otherwise(col(textCol)).as("text_clean"),
        when(col("hit").isNotNull && col("full"), lit(k.toLong))
          .otherwise(lit(0L)).as("n_removed"))
  }

  /** Per-document Shannon entropy over characters (nats, 6dp) — a core
    * LLM-data quality signal (gibberish and boilerplate sit at the
    * entropy extremes). Single scan, pure HOFs; the distinct-char list
    * is sorted so the fold order (and thus fp summation order) is
    * identical on every engine and partitioning.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), expr(
      s"""round(aggregate(
            transform(array_sort(array_distinct(split($textCol, ''))),
              c -> CAST(size(filter(split($textCol, ''), x -> x = c)) AS DOUBLE)
                     / length($textCol)),
            0.0D, (acc, p) -> acc - p * ln(p)), 6)""").as("entropy"))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    * every char k-gram, slide a window of `w` hashes, keep each window's
    * minimum. Guarantees any shared substring of length ≥ k+w-1 yields a
    * shared fingerprint — the standard local-similarity sketch for
    * plagiarism/near-dup detection. Pure codegen'd HOFs over one scan:
    * no explode, no shuffle, so it streams at scan speed at any corpus
    * size. Returns (id, n_fp distinct fingerprints, fp_min, fp_max).
    */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int = 5, w: Int = 3): DataFrame =
    docs
      .filter(length(col(textCol)) >= k + w - 1)
      // split ONCE into a char array and index it: element_at is O(1),
      // while substring(text, i, ...) re-seeks from the string head on
      // every call (UTF8 chars are variable-width), which makes
      // positional gram loops O(len²) on long docs
      .select(col(idCol), split(col(textCol), "").as("c"))
      // per-gram polynomial hash, seeded at the first char code (matches
      // DuckDB list_reduce, whose accumulator starts at element 1)
      .select(col(idCol), expr(
        s"""transform(sequence(1, size(c) - ${k - 1}),
              i -> aggregate(
                transform(sequence(1, ${k - 1}),
                  j -> CAST(ascii(element_at(c, i + j)) AS BIGINT)),
                CAST(ascii(element_at(c, i)) AS BIGINT),
                (acc, ch) -> (acc * 31 + ch) % 1000003))""").as("hs"))
      .select(col(idCol), expr(
        s"""transform(sequence(1, size(hs) - ${w - 1}),
                      i -> array_min(slice(hs, i, $w)))""").as("fps"))
      .select(col(idCol),
        size(array_distinct(col("fps"))).cast("long").as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"))

  /** Per-language top-k character n-gram profiles (Cavnar–Trenkle '94)
    * — the TRAINING half of the language-id stack: [[langIdNgram]]
    * consumes exactly these profiles. One explode + a hash agg + a
    * ranked window; rank ties break by the gram so every engine and
    * partitioning agrees. Docs shorter than n characters contribute
    * nothing.
    */
  def ngramProfiles(docs: DataFrame, langCol: String, textCol: String,
                    n: Int = 2, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.TextFunctions.register(docs.sparkSession)
    // spreadDense, not full-width spread (round 22): the gram pass is
    // the stage between this exchange and the aggregation, so the
    // spread width SURVIVES as its task count — at suite scale a
    // pinned repartition(32) ran 32 tasks over ~800 KB (pure slot
    // pressure under 241 concurrent queries; AQE cannot coalesce an
    // explicit width), while the size-derived width is a no-op there
    // and still widens replica-scale inputs (~1 task per 512 KB
    // compressed).
    val grams = Par.spreadDense(docs
        .filter(length(col(textCol)) >= n)
        .select(col(langCol).as("lang"), col(textCol).as("t")))
      // one-pass codepoint-offset walk that ALSO pre-counts per row
      // (graft.functions.TextNorm.charNgramCounts): vs exploding one
      // row per gram OCCURRENCE, the aggregation sees one row per
      // distinct gram per doc with its count, and the counting loop is
      // pre-compiled shared bytecode instead of per-query generated
      // code (the chain it originally replaced allocated a
      // per-codepoint string array plus a lambda dispatch per gram —
      // profiled at ~2 us/gram, the whole stage's CPU)
      .select(col("lang"),
        explode(call_function("char_ngram_counts", col("t"), lit(n))).as("g"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("gram"))
    grams.select(col("lang"), col("g.gram").as("gram"), col("g.c").as("c"))
      .groupBy("lang", "gram").agg(sum(col("c")).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("gram"), col("cnt"))
  }

  /** Keyword-profile language id: score = |tokens ∩ profile| per
    * language, argmax with the profile-order tie-break cascade.
    */
  def langId(docs: DataFrame, idCol: String, textCol: String,
             profiles: Seq[(String, Seq[String])]): DataFrame =
    scoreProfiles(docs.select(col(idCol),
      array_distinct(split(col(textCol), " ")).as("w")), idCol, profiles)

  /** Character n-gram language id: score = |text n-grams ∩ profile
    * n-grams| — the classic Cavnar–Trenkle-style signal, robust to
    * unseen words (the keyword variant scores 0 on them). Pure HOF
    * n-gram extraction: one scan, no explode.
    */
  def langIdNgram(docs: DataFrame, idCol: String, textCol: String,
                  profiles: Seq[(String, Seq[String])],
                  n: Int = 2): DataFrame =
    // docs shorter than n chars keep their row (score 0 on every
    // profile -> tie-break cascade), with an explicit empty gram set:
    // unguarded, sequence(1, size-n+1) DESCENDS below size=n (Spark
    // sequences reverse when end < start) and element_at then throws on
    // index 0 under ANSI
    scoreProfiles(docs
      .select(col(idCol), split(col(textCol), "").as("c"))
      .select(col(idCol), array_distinct(expr(
        s"""IF(size(c) >= $n,
               transform(sequence(1, size(c) - ${n - 1}),
                         i -> ${(0 until n).map(j => s"element_at(c, i + $j)")
                                .mkString("concat(", ", ", ")")}),
               CAST(array() AS ARRAY<STRING>))""")).as("w")),
      idCol, profiles)

  /** Argmax over per-language overlap scores with the profile-order
    * tie-break cascade (earlier profile wins ties).
    */
  private def scoreProfiles(d0: DataFrame, idCol: String,
                            profiles: Seq[(String, Seq[String])]): DataFrame = {
    val scored = profiles.foldLeft(d0) { case (d, (lang, words)) =>
      d.withColumn(s"s_$lang",
        size(array_intersect(col("w"), array(words.map(lit): _*))))
    }
    val predicted = profiles.zipWithIndex.foldRight(
      lit(profiles.last._1): Column) { case (((lang, _), i), rest) =>
      val laterScores = profiles.drop(i + 1).map { case (l, _) => col(s"s_$l") }
      laterScores match {
        case Seq() => rest
        case Seq(one) => when(col(s"s_$lang") >= one, lang).otherwise(rest)
        case many => when(col(s"s_$lang") >= greatest(many: _*), lang).otherwise(rest)
      }
    }
    scored.select(col(idCol), predicted.as("predicted"))
  }

  /** BM25 ranked retrieval (Robertson et al., TREC-3; the Lucene
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf variant, which never goes
    * negative): score every document against a fixed term set and keep
    * the top-k — the relevance-scoring half of retrieval-based data
    * selection, where a query distilled from a target domain ranks a
    * raw corpus.
    *
    * Built for the corpus-scale shape, not the textbook one:
    *   - document lengths are a pure projection (`size(split(text))`) —
    *     no tokenize-explode-aggregate pass just to count tokens, and
    *     the same tiny aggregate over it yields N and avgdl;
    *   - the query-term filter sits UNDER the tf aggregate, so the
    *     exploded/aggregated volume is the query terms' posting lists
    *     (Σ df), never the corpus token count;
    *   - df derives from the filtered tf rows (they ARE the distinct
    *     (doc, term) pairs — same exchange-reuse trick as
    *     [[tfidfTopTerms]], with the throwaway `sum(tf)` keeping the
    *     subtrees byte-identical so the corpus is tokenized once);
    *   - df, N, avgdl are broadcast; the only data-sized shuffles are
    *     the tf aggregation and the per-doc score sum, and the final
    *     top-k is a TakeOrderedAndProject, not a global sort.
    *
    * Determinism: the per-(doc, term) score is rounded at 6dp and
    * summed in exact decimal space, so the per-doc total is identical
    * on any partitioning and engine. Returns
    * (rnk, doc_id, score, n_hit = matched query terms).
    */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int = 20,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queryTerms.nonEmpty, "bm25TopDocs needs at least one query term")
    // pre-compute the scalar factors driver-side so an oracle can embed
    // the exact same doubles as literals
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val dl = docs.select(col(idCol).as("doc_id"),
      size(split(col(textCol), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    // the explicit isNotNull mirrors the null filter the dl join pushes
    // into the scored branch's scan — without it the df branch's subtree
    // differs at the scan and the tf exchange is NOT reused (the corpus
    // would tokenize twice; pinned by the one-Generate PlanSpec test)
    val tfq = docs
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tfq.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("_w"))
      .filter(col("_w") >= 1).drop("_w")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val scored = tfq.join(broadcast(df), "term") // bounded: query-term dfs
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats)) // bounded: 1-row corpus stats
      .withColumn("sc", round(idf * (col("tf") * lit(k1p1)) /
        (col("tf") + lit(k1) *
          (lit(oneMinusB) + lit(b) * col("dl") / col("avgdl"))), 6))
      .groupBy("doc_id")
      .agg(round(sum(col("sc").cast(DecimalType(38, 6))), 6)
          .cast("double").as("score"),
        count(lit(1)).as("n_hit"))
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .select(col("rnk"), col("doc_id"), col("score"), col("n_hit"))
  }

  /** Sliding-window token chunking: split each doc into windows of
    * `size` tokens advancing by `size - overlap` — the long-document
    * segmentation step before packing/embedding (RAG and training
    * pipelines both need it). Pure map-side array ops over one scan: no
    * shuffle, no explode-then-regroup; a 100 TB corpus chunks at scan
    * speed. Window starts advance by `step = size - overlap` and STOP
    * once a window reaches the document end (the standard sliding-
    * window convention): every token lands in ≥1 chunk, adjacent full
    * chunks share exactly `overlap` tokens, the final chunk may be
    * short but always carries ≥1 token no earlier chunk covers — a
    * while-start-≤-n rule instead emits a trailing chunk that is a
    * strict SUBSET of its predecessor whenever the tail is ≤ overlap
    * tokens, double-counting content downstream. Returns
    * (id, chunk_idx 0-based, chunk_text, n_tokens).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  size: Int, overlap: Int = 0): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, IF(size(w) <= $size, 0,
                        (size(w) - $size + $step - 1) div $step)),
                      c -> slice(w, c * $step + 1, $size))""")))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        array_join(col("col"), " ").as("chunk_text"),
        org.apache.spark.sql.functions.size(col("col"))
          .cast("long").as("n_tokens"))
  }

  /** Model-free text similarity: top-k docs most cosine-similar to a
    * query doc under `dim`-bucket feature-hashed term frequencies
    * (Weinberger et al. '09) — no embeddings, no fitted vocabulary, so
    * it runs on day-one corpora and never shuffles a model. Everything
    * stays SPARSE: per-doc (bucket, count) rows, the query's ≤ dim
    * rows broadcast, dot products from the bucket join, norms from a
    * per-doc aggregate — all sums of exact integers (and products of
    * their roots), so the ranking is engine- and partition-
    * deterministic with no decimal machinery. The bucket hash is the
    * auditable sha256 family shared with the sketches.
    */
  def hashedTfTopK(docs: DataFrame, idCol: String, textCol: String,
                   queryId: Long, k: Int, dim: Int = 256): DataFrame = {
    // SIZE-derived spread (Par.spreadDense, round 22): full-width
    // Par.spread was measured in r21 and reverted — it fixed the
    // narrow-scan solo shape (10x solo 5.7 -> 2.2 s) but its exchange
    // + full-width first stage cost the concurrent suite measurably.
    // The bytes-proportional width is a NO-OP at suite scale (target
    // <= scan width -> no exchange) and spreads only inputs big
    // enough for the tokenize+hash pass to matter solo.
    val tfh = Par.spreadDense(docs.filter(col(idCol).isNotNull))
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("doc_id"),
        Sketches.cmsBucket(lit(0), col("term"), dim).as("bucket"))
      .agg(count(lit(1)).as("c"))
    val norms = tfh.groupBy("doc_id")
      .agg(sqrt(sum(col("c") * col("c")).cast("double")).as("nrm"))
    val q = tfh.filter(col("doc_id") === queryId)
      .select(col("bucket"), col("c").as("qc"))
    val qn = norms.filter(col("doc_id") === queryId)
      .select(col("nrm").as("qnrm"))
    tfh.filter(col("doc_id") =!= queryId)
      .join(broadcast(q), "bucket") // bounded: <= numBuckets query rows
      .groupBy("doc_id")
      .agg(sum(col("c") * col("qc")).cast("double").as("dot"))
      .join(norms, "doc_id")
      .crossJoin(broadcast(qn)) // bounded: 1-row query norm
      .withColumn("cos", col("dot") / (col("nrm") * col("qnrm")))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("cos"), 4).as("cos"))
  }

  /** CCNet-style LM quality score (Wenzek et al. '20): train an add-k
    * smoothed word-bigram model on the corpus itself over a top-`vocabSize`
    * vocabulary (everything else maps to `<unk>`), then score each doc by
    * its mean negative log-likelihood — the filter that drops gibberish
    * and boilerplate a stopword gate can't see. Returns
    * (doc_id, n_bigrams, avg_nll); docs with fewer than two tokens have
    * no bigrams and are omitted.
    *
    * Scale shape: ONE tokenize pass feeds both the vocabulary and the
    * bigram stream (bigrams come from an index-shifted array zip, not a
    * self-join); the vocabulary is a top-V TakeOrdered broadcast both
    * OOV-mapping joins use; the bigram model is one hash aggregation
    * shuffled on the bigram key and the scoring join reuses that key;
    * the per-`m1` context totals are ≤ V+1 rows, broadcast. Per-bigram
    * NLL rounds at 6dp and sums in decimal, so scores are identical
    * across engines and partitionings. The smoothing denominator uses
    * the FIXED vocabulary size (vocabSize + 1 for `<unk>`), not the
    * observed distinct-term count, so no driver-side count is needed.
    */
  /** The top-V vocabulary of [[perplexityScore]] — ≤ `vocabSize` rows
    * of bounded driver metadata (the k-means driver-literal
    * discipline). Exposed so callers that score the same corpus
    * repeatedly can memoize it: the cut is deterministic
    * (count desc, term asc) and re-collecting it costs a full
    * tokenize + top-V job per call.
    */
  def perplexityVocab(docs: DataFrame, idCol: String, textCol: String,
                      vocabSize: Int): Seq[String] = {
    graft.functions.TextFunctions.register(docs.sparkSession)
    Par.spreadDense(docs.filter(col(idCol).isNotNull)
        .select(col(textCol).as("t")))
      .select(explode(call_function("space_split", col("t"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(vocabSize)
      .select("term")
      .collect().map(_.getString(0)).toSeq
  }

  def perplexityScore(docs: DataFrame, idCol: String, textCol: String,
                      vocabSize: Int = 1000, addK: Double = 0.1,
                      knownVocab: Option[Seq[String]] = None): DataFrame = {
    val kv = addK * (vocabSize + 1) // driver-side double, oracle-embeddable
    graft.functions.TextFunctions.register(docs.sparkSession)
    // spreadDense (round 22): the tokenize + bigram-explode pass is
    // CPU-dense per input byte and rides this exchange's width — the
    // previous full-width spread pinned 32 tasks over the suite-scale
    // table (slot pressure; see ngramProfiles). Size-derived width is
    // a no-op there and still widens replica-scale inputs.
    val base = Par.spreadDense(docs.filter(col(idCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(textCol).as("t")))
    // The top-V vocabulary is ≤ vocabSize rows of bounded driver
    // metadata — collected and bound into the plan as a literal (the
    // k-means driver-literal discipline), so the OOV mapping becomes a
    // per-token hash lookup inside ONE codegen'd expression instead of
    // two corpus-sized broadcast joins. space_split is the byte-walk
    // twin of split(t, " ") (no String decode/regex/re-encode).
    // `knownVocab` (round 22) lets repeat callers skip the collect —
    // the ops layer memoizes [[perplexityVocab]] per (session, dir),
    // the bpeMerges discipline.
    val vocabTerms: Seq[String] = knownVocab.getOrElse(
      perplexityVocab(docs, idCol, textCol, vocabSize))
    // One-pass bigram-ID pairs straight off the text: vocab_bigram_ids
    // tokenizes (split-on-space semantics: empty below two tokens, so
    // explode drops those rows), maps each token to its vocab id (OOV →
    // id V, a literal in-vocab "<unk>" term merges with OOV exactly as
    // the string formulation did), and packs each consecutive pair into
    // one BIGINT (id1 << 32 | id2). The packing is injective, so every
    // count below equals its (m1, m2) string-keyed counterpart — but the
    // aggregation and model join run on one long key instead of a
    // (string, string) pair, and the two OOV broadcast joins are gone.
    val bg = base.select(col("doc_id"),
      explode(call_function("vocab_bigram_ids", col("t"),
        typedlit(vocabTerms))).as("p"))
    // Pre-aggregate to per-doc bigram counts BEFORE the model join (the
    // tf-idf lesson): the model and the scoring side both derive from
    // this one aggregate — its exchange is computed once and reused —
    // and the join input shrinks from the occurrence stream to distinct
    // (doc, bigram) rows. cnt·nll is one fp product of an exact integer
    // with a 6dp-rounded double: its ≤1-ulp error can't cross a decimal
    // rounding boundary, so the weighted decimal sum equals the exact
    // per-occurrence sum on every engine.
    // pbc feeds TWO consumers (model and the scoring join) — pinned so
    // the tokenize → bigram-id explode subtree executes once (a 2×
    // corpus-scan multiplier at 100 TB without it)
    val pbc = Pins.pin(bg
      .groupBy("doc_id", "p").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // model is ≤ (V+1)^2 rows but derives from the CORPUS-sized pbc;
    // without a pin, ctx (= model re-aggregated by the first id) would
    // recompute model FROM pbc — a second full aggregation pass over
    // the big frame. Persisting the small model makes ctx a V-row
    // rollup of it.
    val model = Pins.pin(pbc.groupBy("p").agg(sum(col("cnt")).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // context totals keyed on the first id = the packed key's high word
    val ctx = model.groupBy(shiftright(col("p"), 32).as("m1h"))
      .agg(sum(col("c12")).as("c1"))
    pbc.join(model, Seq("p"))
      .withColumn("m1h", shiftright(col("p"), 32))
      .join(broadcast(ctx), Seq("m1h")) // bounded: <= V+1 context rows
      .withColumn("nll", round(-log((col("c12") + lit(addK)) /
        (col("c1") + lit(kv))), 6))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_bigrams"),
        round(sum((col("cnt") * col("nll")).cast(DecimalType(38, 6)))
          .cast("double") / sum(col("cnt")), 4).as("avg_nll"))
  }
}
