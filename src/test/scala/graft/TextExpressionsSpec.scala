package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The single-pass text primitives (functions/TextExpressions.scala)
  * replace built-in regex/split/HOF chains in dedup/text hot paths —
  * each must be EXACTLY equivalent to the chain it replaced, or the
  * oracle hashes move. Pinned over an adversarial corpus: unicode
  * (incl. astral + case-folding edge cases), runs of spaces, empties,
  * punctuation-only, leading/trailing separators.
  */
class TextExpressionsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val corpus: Seq[String] = Seq(
    "", " ", "   ", "a", "A", "ab", "a b", "a  b", " a b ",
    "Hello, World!  42", "UPPER lower MiXeD 123",
    "!!!???...", "  !!x!!  ", "tabs\tand\nnewlines",
    "unicode: Σίσυφος ΣΊΣΥΦΟΣ straße İstanbul",
    "astral: 𝄞 clef 😀 emoji",
    "mixed1a2b3c", "a!b@c#d$e%f", "ümlaut Öther ß",
    "double  space   triple    runs",
    "ends with punct!", "!starts with punct",
    "42 numbers 007 left 0", "ザ・ワールド 時は止まる"
  ) ++ (0 until 50).map { i =>
    // deterministic pseudo-random ascii+punct+space soup
    val r = new scala.util.Random(i)
    (0 until r.nextInt(80)).map { _ =>
      val k = r.nextInt(9)
      if (k < 3) ('a' + r.nextInt(26)).toChar
      else if (k < 5) ('A' + r.nextInt(26)).toChar
      else if (k < 6) ('0' + r.nextInt(10)).toChar
      else if (k < 8) " !,.:;#@~^".charAt(r.nextInt(10))
      else ' '
    }.mkString
  }

  private def df = corpus.toDF("t")

  test("norm_ascii == trim(regexp_replace(regexp_replace(lower, ...)))") {
    graft.functions.TextFunctions.register(spark)
    val rows = df.select(col("t"),
        call_function("norm_ascii", col("t")).as("fast"),
        trim(regexp_replace(regexp_replace(lower(col("t")),
          "[^a-z0-9 ]", " "), " +", " ")).as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"norm_ascii mismatch on ${r.getString(0).take(60)}")
    }
  }

  test("char_ngrams(t, n) == split-transform-concat chain, n = 2 and 3") {
    graft.functions.TextFunctions.register(spark)
    for (n <- Seq(2, 3)) {
      val ref = expr(
        s"""transform(sequence(1, size(split(t, '')) - ${n - 1}),
              i -> ${(0 until n).map(j => s"element_at(split(t, ''), i + $j)")
                .mkString("concat(", ", ", ")")})""")
      val rows = df.filter(length(col("t")) >= n)
        .select(col("t"),
          call_function("char_ngrams", col("t"), lit(n)).as("fast"),
          ref.as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"char_ngrams($n) mismatch on ${r.getString(0).take(60)}")
      }
    }
  }

  test("space_split == split(t, ' ') (limit -1 semantics)") {
    graft.functions.TextFunctions.register(spark)
    val rows = df.select(col("t"),
        call_function("space_split", col("t")).as("fast"),
        split(col("t"), " ").as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) === r.getSeq[String](2),
        s"space_split mismatch on '${r.getString(0).take(60)}'")
    }
  }

  test("vocab_bigram_ids == word_bigrams + string OOV mapping, packed") {
    graft.functions.TextFunctions.register(spark)
    // vocab drawn from the corpus's own tokens (plus misses and the
    // literal "<unk>" marker, which must merge with the OOV id exactly
    // like the string formulation merged the strings)
    val vocab: Seq[String] = Seq("a", "b", "Hello,", "World!", "lower",
      "42", "numbers", "<unk>", "never-present", "")
    val unk = vocab.length
    val idOf = vocab.zipWithIndex.map { case (t, i) =>
      t -> (if (t == "<unk>") unk else i) }.toMap
    val fast = df.select(col("t"),
        explode(call_function("vocab_bigram_ids", col("t"),
          typedlit(vocab))).as("p"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val ref = df.select(col("t"),
        explode(call_function("word_bigrams", col("t"))).as("p"))
      .select(col("t"), col("p.w1"), col("p.w2"))
      .collect().map { r =>
        val i1 = idOf.getOrElse(r.getString(1), unk).toLong
        val i2 = idOf.getOrElse(r.getString(2), unk).toLong
        (r.getString(0), (i1 << 32) | i2)
      }.toSeq.sorted
    assert(fast === ref)
  }

  test("sig_l1 == the unrolled 16-term shift-mask-abs formulation") {
    graft.functions.TextFunctions.register(spark)
    val r = new scala.util.Random(7)
    val pairs = (0 until 200).map(_ => (r.nextLong(), r.nextLong())) ++
      Seq((0L, 0L), (-1L, 0L), (-1L, -1L), (Long.MaxValue, Long.MinValue))
    val refCol = (0 until 16).map { j =>
      abs(shiftright(col("a"), j * 4).bitwiseAND(lit(15L)) -
        shiftright(col("b"), j * 4).bitwiseAND(lit(15L)))
    }.reduce(_ + _)
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("sig_l1", col("a"), col("b")).as("fast"), refCol.as("ref"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"sig_l1(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("char_ngram_counts == explode(char_ngrams) + count, n = 2 and 3") {
    graft.functions.TextFunctions.register(spark)
    for (n <- Seq(2, 3)) {
      val fast = df.select(col("t"),
          explode(call_function("char_ngram_counts", col("t"), lit(n))).as("g"))
        .select(col("t"), col("g.gram"), col("g.c"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      val ref = df.select(col("t"),
          explode(call_function("char_ngrams", col("t"), lit(n))).as("gram"))
        .groupBy("t", "gram").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq.sorted
      assert(fast === ref, s"char_ngram_counts($n)")
    }
  }

  test("stop_counts / quality_keep / lower_alpha_count == built-in chains") {
    graft.functions.TextFunctions.register(spark)
    val stops = Seq("a", "the", "of", "and", "to", "in", "42", "")
    val stopList = array(stops.map(lit): _*)
    val w = split(col("t"), " ")
    val rows = df.select(col("t"),
        call_function("stop_counts", col("t"), typedlit(stops)).as("p"),
        call_function("quality_keep", col("t"), typedlit(stops),
          lit(2), lit(30), lit(0.10)).as("keepFast"),
        call_function("lower_alpha_count", col("t")).as("alphaFast"),
        size(w).cast("long").as("nTokRef"),
        size(filter(w, x => array_contains(stopList, x))).cast("long")
          .as("nStopRef"),
        (size(w).between(2, 30) &&
          size(filter(w, x => array_contains(stopList, x))).cast("double")
            / size(w) >= 0.10).as("keepRef"),
        length(regexp_replace(col("t"), "[^a-z]", "")).cast("long")
          .as("alphaRef"))
      .collect()
    rows.foreach { r =>
      val p = r.getLong(1)
      assert((p >>> 32) === r.getLong(4), s"n_tokens on '${r.getString(0).take(40)}'")
      assert((p & 0xffffffffL) === r.getLong(5), s"n_stop on '${r.getString(0).take(40)}'")
      assert(r.getBoolean(2) === r.getBoolean(6), s"keep on '${r.getString(0).take(40)}'")
      assert(r.getLong(3) === r.getLong(7), s"alpha on '${r.getString(0).take(40)}'")
    }
  }

  test("word_bigrams == split(' ')+filter+transform(struct) chain") {
    graft.functions.TextFunctions.register(spark)
    val fast = df.select(col("t"),
        explode(call_function("word_bigrams", col("t"))).as("p"))
      .select(col("t"), col("p.w1"), col("p.w2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    val ref = df.select(col("t"), split(col("t"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("t"), explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i+1] AS w2))"))
        .as("p"))
      .select(col("t"), col("p.w1"), col("p.w2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    assert(fast === ref)
  }
}
