package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text primitives for the dedup/text hot paths. Each
  * replaces a chain of regex / split / higher-order-function built-ins
  * whose per-row cost (pattern machinery, per-codepoint string
  * allocation, lambda dispatch) dominated profiled stages, with one
  * byte walk over the UTF-8 payload. Every expression has a pure
  * static-helper core so interpreted eval and generated code share one
  * implementation, and a spec pins each against the built-in chain it
  * replaces (including non-ASCII and degenerate inputs).
  */
object TextNorm {

  /** Exact single-pass equivalent of
    * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", " "), " +", " "))`:
    * Unicode-lowercase (the same UTF8String.toLowerCase the built-in
    * Lower uses), every codepoint outside [a-z0-9 ] contributes a
    * space, space runs collapse, ends trim. Byte-wise handling of
    * multi-byte codepoints is sound because every non-kept byte maps
    * to "space" and adjacent spaces collapse — the regex path's
    * one-space-per-codepoint (two for astral surrogate halves)
    * collapses to the same runs.
    */
  def normalize(input: UTF8String): UTF8String = {
    val s = input.toLowerCase
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    var o = 0
    var pendingSpace = false
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        out(o) = c
        o += 1
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Character n-grams by codepoint: the single-pass equivalent of
    * `transform(sequence(1, size(c)-n+1), i -> concat(element_at(c, i), ...))`
    * over `c = split(s, "")` — one offsets walk, one UTF8String slice
    * per gram, no per-codepoint string array. Returns an empty array
    * for strings shorter than n codepoints.
    */
  def charNgrams(s: UTF8String, n: Int): GenericArrayData = {
    val b = s.getBytes
    // offsets(k) = byte offset of codepoint k; offsets(numChars) = len
    val offsets = new Array[Int](b.length + 1)
    var nChars = 0
    var i = 0
    while (i < b.length) {
      offsets(nChars) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      nChars += 1
    }
    offsets(nChars) = b.length
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - n + 1)
    var k = 0
    while (k < nChars - n + 1) {
      val from = offsets(k)
      val to = offsets(k + n)
      out(k) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, from, to))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** L1 distance between two packed 16×4-bit character-frequency
    * signatures (graft.api.FuzzyJoin's sig scheme) as ONE pre-compiled
    * loop. The unrolled 16-term Column formulation inflated the
    * generated join code by ~80 ops per candidate — code that runs
    * INTERPRETED until the JIT warms, exactly where the PassJoin hot
    * bucket evaluates millions of candidates on a query's first
    * execution. A static method is shared, already-hot bytecode from
    * the first query.
    */
  def sigL1(a: Long, b: Long): Long = {
    var s = 0L
    var j = 0
    while (j < 64) {
      s += Math.abs(((a >>> j) & 15L) - ((b >>> j) & 15L))
      j += 4
    }
    s
  }

  /** Per-row character n-gram counts: the pre-aggregated form of
    * `explode(char_ngrams(s, n))` + a count aggregation — one
    * (gram, count) row per DISTINCT gram per input row instead of one
    * row per OCCURRENCE, computed in one open-addressed byte-slice
    * walk (no per-occurrence UTF8String, no per-occurrence downstream
    * row). Summing the counts downstream equals counting the exploded
    * occurrences exactly. Returns an empty array for strings shorter
    * than n codepoints.
    */
  def charNgramCounts(s: UTF8String, n: Int): GenericArrayData = {
    val b = s.getBytes
    val offsets = new Array[Int](b.length + 1)
    var nChars = 0
    var i = 0
    while (i < b.length) {
      offsets(nChars) = i
      i += UTF8String.numBytesForFirstByte(b(i))
      nChars += 1
    }
    offsets(nChars) = b.length
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val nGrams = nChars - n + 1
    // open addressing over (startOffset, count); key = the gram's byte
    // slice [offsets(k), offsets(k+n)); capacity = next pow2 >= 2x grams
    var cap = 8
    while (cap < nGrams * 2) cap <<= 1
    val mask = cap - 1
    val slot = new Array[Int](cap) // start gram index + 1; 0 = empty
    val cnt = new Array[Long](cap)
    var distinct = 0
    var k = 0
    while (k < nGrams) {
      val from = offsets(k)
      val to = offsets(k + n)
      // FNV-1a over the gram's bytes
      var h = 0x811c9dc5
      var p = from
      while (p < to) { h = (h ^ (b(p) & 0xff)) * 0x01000193; p += 1 }
      var idx = h & mask
      var done = false
      while (!done) {
        val st = slot(idx)
        if (st == 0) {
          slot(idx) = k + 1
          cnt(idx) = 1L
          distinct += 1
          done = true
        } else {
          // compare this gram's bytes with the stored gram's bytes
          val g = st - 1
          val gf = offsets(g)
          val gt = offsets(g + n)
          var eq = (gt - gf) == (to - from)
          var q = 0
          while (eq && q < to - from) {
            if (b(gf + q) != b(from + q)) eq = false
            q += 1
          }
          if (eq) { cnt(idx) += 1L; done = true }
          else idx = (idx + 1) & mask
        }
      }
      k += 1
    }
    val out = new Array[Any](distinct)
    var o = 0
    var idx = 0
    while (idx < cap) {
      if (slot(idx) != 0) {
        val g = slot(idx) - 1
        out(o) = org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(b, offsets(g), offsets(g + n))),
          cnt(idx))
        o += 1
      }
      idx += 1
    }
    new GenericArrayData(out)
  }

  /** Token and stopword-hit counts of `split(s, " ")` in one byte walk,
    * packed `(n_tokens << 32) | n_stop` (both < 2^31 for any real
    * document; n_tokens ≥ 1 — split of "" is [""]). Replaces the
    * split + filter(array_contains) HOF chain whose interpreted lambda
    * ran per token per stopword.
    */
  def stopCounts(s: UTF8String,
                 stops: java.util.HashSet[UTF8String]): Long = {
    val b = s.getBytes
    var nTok = 0L
    var nStop = 0L
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        nTok += 1
        if (stops.contains(UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(b, start, i)))) nStop += 1
        start = i + 1
      }
      i += 1
    }
    (nTok << 32) | nStop
  }

  /** The fused quality keep-gate over the same walk:
    * `n_tokens BETWEEN min AND max AND n_stop / n_tokens >= minRatio`
    * — one expression evaluation per row, so the optimizer has nothing
    * to duplicate. The ratio is the same double division of the same
    * exact integers the Column formulation computed.
    */
  def qualityKeep(s: UTF8String, stops: java.util.HashSet[UTF8String],
                  minTokens: Int, maxTokens: Int,
                  minStopRatio: Double): Boolean = {
    val p = stopCounts(s, stops)
    val nTok = p >>> 32
    val nStop = p & 0xffffffffL
    nTok >= minTokens && nTok <= maxTokens &&
      nStop.toDouble / nTok >= minStopRatio
  }

  /** Count of bytes in 'a'..'z' — equals
    * `length(regexp_replace(s, "[^a-z]", ""))`: every non-[a-z]
    * codepoint is removed by the regex, and no byte of a multi-byte
    * UTF-8 sequence falls in 0x61..0x7a, so surviving characters and
    * surviving bytes are the same set.
    */
  def lowerAlphaCount(s: UTF8String): Long = {
    val b = s.getBytes
    var n = 0L
    var i = 0
    while (i < b.length) {
      if (b(i) >= 'a' && b(i) <= 'z') n += 1
      i += 1
    }
    n
  }

  /** Exact twin of `split(s, " ")` (Java limit=-1 semantics: empty
    * tokens kept everywhere, including leading/trailing; "" yields
    * [""]), as one byte walk emitting UTF8String slices — no
    * UTF8String→String decode, no regex machinery, no re-encode.
    */
  def spaceSplit(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val toks = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        toks += UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, i))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(toks.toArray)
  }

  /** Consecutive bigram VOCABULARY-ID pairs of `split(s, " ")`: each
    * token is looked up in `idx` (token → id; OOV → `unk`), and each
    * consecutive pair packs into one BIGINT `(id1 << 32) | id2`.
    * Returns an empty array below two tokens. Replaces the
    * bigram-struct explode + two broadcast OOV-mapping joins + a
    * (doc, string, string)-keyed aggregation with one walk and a
    * single long key. The packing is injective (ids ≤ vocabSize <
    * 2^31), so downstream counts keyed on the long are exactly the
    * counts keyed on the mapped string pair.
    */
  def bigramIds(s: UTF8String,
                idx: java.util.HashMap[UTF8String, Integer],
                unk: Int): GenericArrayData = {
    val b = s.getBytes
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var i = 0
    var prev = -1 // -1 = no previous token yet
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        val tok = UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, i))
        val id = idx.get(tok)
        val cur = if (id == null) unk else id.intValue()
        if (prev >= 0) out += ((prev.toLong << 32) | cur.toLong)
        prev = cur
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Consecutive word pairs of `split(s, " ")` (single-space regex,
    * Java limit=-1 semantics: empty tokens kept everywhere, including
    * leading/trailing). Returns array<struct<w1,w2>> — empty when the
    * string holds fewer than two tokens. One byte walk, one slice per
    * token, no intermediate token array column.
    */
  def wordBigrams(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val toks = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        toks += UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, start, i))
        start = i + 1
      }
      i += 1
    }
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var k = 0
    while (k < toks.length - 1) {
      out(k) = org.apache.spark.sql.catalyst.InternalRow(toks(k), toks(k + 1))
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `norm_ascii(s)`: see [[TextNorm.normalize]]. */
final case class NormAsciiText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextNorm.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NormAsciiText =
    copy(child = newChild)
  override def prettyName: String = "norm_ascii"
}

/** `char_ngrams(s, n)`: see [[TextNorm.charNgrams]]. `n` is bound at
  * plan time (a literal), not per row.
  */
final case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngrams needs n >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextNorm.charNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.charNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

/** `word_bigrams(s)`: see [[TextNorm.wordBigrams]]. */
final case class WordBigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = false),
    StructField("w2", StringType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextNorm.wordBigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.wordBigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
  override def prettyName: String = "word_bigrams"
}

/** `sig_l1(a, b)`: see [[TextNorm.sigL1]]. */
final case class SigL1Packed(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextNorm.sigL1(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.TextNorm.sigL1($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigL1Packed =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sig_l1"
}

/** `char_ngram_counts(s, n)`: see [[TextNorm.charNgramCounts]]. `n` is
  * bound at plan time (a literal), not per row.
  */
final case class CharNgramCounts(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"char_ngram_counts needs n >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextNorm.charNgramCounts(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.charNgramCounts($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgramCounts =
    copy(child = newChild)
  override def prettyName: String = "char_ngram_counts"
}

/** Shared base for the stopword-set expressions: builds the lookup set
  * once per (deserialized) instance.
  */
sealed trait StopSetExpression { self: Expression =>
  def stopwords: IndexedSeq[UTF8String]
  @transient protected lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.length * 2)
    stopwords.foreach(s.add)
    s
  }
}

/** `stop_counts(s, stops)`: see [[TextNorm.stopCounts]]. */
final case class StopCounts(child: Expression, stopwords: IndexedSeq[UTF8String])
    extends UnaryExpression with StopSetExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  def compute(s: UTF8String): Long = TextNorm.stopCounts(s, stopSet)
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopCounts", this, classOf[StopCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): StopCounts =
    copy(child = newChild)
  override def prettyName: String = "stop_counts"
}

/** `quality_keep(s, stops, min, max, minRatio)`: see
  * [[TextNorm.qualityKeep]].
  */
final case class QualityKeep(child: Expression, stopwords: IndexedSeq[UTF8String],
                             minTokens: Int, maxTokens: Int,
                             minStopRatio: Double)
    extends UnaryExpression with StopSetExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  def compute(s: UTF8String): Boolean =
    TextNorm.qualityKeep(s, stopSet, minTokens, maxTokens, minStopRatio)
  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qualityKeep", this, classOf[QualityKeep].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): QualityKeep =
    copy(child = newChild)
  override def prettyName: String = "quality_keep"
}

/** `lower_alpha_count(s)`: see [[TextNorm.lowerAlphaCount]]. */
final case class LowerAlphaCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextNorm.lowerAlphaCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.lowerAlphaCount($c)")
  override protected def withNewChildInternal(newChild: Expression): LowerAlphaCount =
    copy(child = newChild)
  override def prettyName: String = "lower_alpha_count"
}

/** `space_split(s)`: see [[TextNorm.spaceSplit]]. */
final case class SpaceSplit(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextNorm.spaceSplit(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.spaceSplit($c)")
  override protected def withNewChildInternal(newChild: Expression): SpaceSplit =
    copy(child = newChild)
  override def prettyName: String = "space_split"
}

/** `vocab_bigram_ids(s, vocab)`: see [[TextNorm.bigramIds]]. `vocab` is
  * bound at plan time (an array literal of distinct terms, id =
  * position); OOV tokens map to id = vocab.length. A literal vocabulary
  * term equal to the OOV marker string `<unk>` is mapped to the OOV id
  * — replicating the string formulation exactly, where an in-vocab
  * token `<unk>` and the OOV marker are the same string and merge.
  */
final case class VocabBigramIds(child: Expression, vocab: Array[UTF8String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** token → id; built once per (deserialized) expression instance,
    * read-only afterwards (lazy val is synchronized, so concurrent
    * local-mode tasks see one map).
    */
  @transient private lazy val idx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.length * 2)
    val unkMarker = UTF8String.fromString("<unk>")
    var i = 0
    while (i < vocab.length) {
      m.putIfAbsent(vocab(i),
        if (vocab(i) == unkMarker) Integer.valueOf(vocab.length) else i)
      i += 1
    }
    m
  }

  /** Codegen entry point (referenced via addReferenceObj). */
  def compute(s: UTF8String): GenericArrayData =
    TextNorm.bigramIds(s, idx, vocab.length)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabBigramIds", this,
      classOf[VocabBigramIds].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): VocabBigramIds =
    copy(child = newChild)
  override def prettyName: String = "vocab_bigram_ids"
}

object TextFunctions {
  private def strArrayLit(e: Expression, fn: String): Array[UTF8String] = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        arr: org.apache.spark.sql.catalyst.util.ArrayData,
        ArrayType(StringType, _)) =>
      arr.toArray[UTF8String](StringType)
    case other => throw new IllegalArgumentException(
      s"$fn expects a string-array literal, got $other")
  }
  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
      v.asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal, got $other")
  }
  private def doubleLit(e: Expression, fn: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, DoubleType) =>
      v.asInstanceOf[Double]
    case other => throw new IllegalArgumentException(
      s"$fn expects a double literal, got $other")
  }

  /** Idempotently register the text primitives on the session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("stop_counts",
      exprs => StopCounts(exprs(0), strArrayLit(exprs(1), "stop_counts").toIndexedSeq),
      "scala_udf")
    reg.createOrReplaceTempFunction("quality_keep",
      exprs => QualityKeep(exprs(0), strArrayLit(exprs(1), "quality_keep").toIndexedSeq,
        intLit(exprs(2), "quality_keep"), intLit(exprs(3), "quality_keep"),
        doubleLit(exprs(4), "quality_keep")), "scala_udf")
    reg.createOrReplaceTempFunction("lower_alpha_count",
      exprs => LowerAlphaCount(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("norm_ascii",
      exprs => NormAsciiText(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("char_ngrams",
      exprs => CharNgrams(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
          v.asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"char_ngrams n must be an integer literal, got $other")
      }), "scala_udf")
    reg.createOrReplaceTempFunction("word_bigrams",
      exprs => WordBigrams(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("space_split",
      exprs => SpaceSplit(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("sig_l1",
      exprs => SigL1Packed(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("char_ngram_counts",
      exprs => CharNgramCounts(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType) =>
          v.asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"char_ngram_counts n must be an integer literal, got $other")
      }), "scala_udf")
    reg.createOrReplaceTempFunction("vocab_bigram_ids",
      exprs => VocabBigramIds(exprs(0), exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
            arr: org.apache.spark.sql.catalyst.util.ArrayData,
            ArrayType(StringType, _)) =>
          arr.toArray[UTF8String](StringType)
        case other => throw new IllegalArgumentException(
          s"vocab_bigram_ids vocab must be a string-array literal, got $other")
      }), "scala_udf")
  }
}
