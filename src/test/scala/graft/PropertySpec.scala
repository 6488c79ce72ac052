package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.shelf._

/** ScalaCheck properties for the pure dataflow functions (SURVEY.md §5
  * port strategy: property tests for A2/A6/A9/A12/A15).
  */
object NamingProps extends Properties("Naming") {

  private val seg = Gen.choose(1, 3)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val version = Gen.oneOf(
    Gen.const("latest"),
    for {
      y <- Gen.choose(2020, 2026); m <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
    } yield f"$y%04d-$m%02d-$d%02d")
  private val path = for {
    n <- Gen.choose(1, 3)
    segs <- Gen.listOfN(n, seg)
    v <- version
  } yield (segs :+ v).mkString("/")
  private val pathSet = Gen.choose(1, 6).flatMap(n =>
    Gen.listOfN(n, path).map(_.distinct))

  property("pathToSnake strips separators") = forAll(path) { p =>
    val s = Naming.pathToSnake(p)
    !s.contains("/") && !s.contains("-")
  }

  property("tableAliases: aliases unique, tables covered at most once") =
    forAll(pathSet) { paths =>
      val aliases = Naming.tableAliases(paths)
      val names = aliases.map(_._1)
      val tables = aliases.map(_._2)
      names.distinct.size == names.size && tables.distinct.size == tables.size
    }

  property("simplifyDependencyNames is a bijection onto the input") =
    forAll(pathSet) { paths =>
      val deps = paths.map(p => s"data/tables/$p.parquet")
      try {
        val m = Naming.simplifyDependencyNames(deps)
        m.values.toSet == deps.toSet && m.keys.size == deps.size
      } catch {
        // unresolvable collisions must fail loudly, not mis-map
        case _: IllegalStateException => true
      }
    }
}

object ChecksumProps extends Properties("Checksums") {
  private val entry = for {
    k <- Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    v <- Gen.listOfN(64, Gen.hexChar).map(_.mkString.toLowerCase)
  } yield k -> v

  property("manifest fold is insertion-order invariant") =
    forAll(Gen.nonEmptyListOf(entry)) { entries =>
      val m = entries.toMap
      val shuffled = scala.util.Random.shuffle(m.toSeq).toMap
      Checksums.checksumManifest(m) == Checksums.checksumManifest(shuffled)
    }

  property("manifest fold is sensitive to any entry change") =
    forAll(Gen.nonEmptyListOf(entry)) { entries =>
      val m = entries.toMap
      val k = m.keys.head
      val tampered = m + (k -> ("0" * 64))
      m(k) == "0" * 64 || Checksums.checksumManifest(m) != Checksums.checksumManifest(tampered)
    }
}

object DagProps extends Properties("Dag") {

  /** Random DAG: edges only from higher to lower index → acyclic. */
  private val dagGen: Gen[Dag.Deps] = for {
    n <- Gen.choose(1, 8)
    edges <- Gen.listOfN(n * 2, for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
    } yield (math.max(a, b), math.min(a, b)))
  } yield {
    val nodes = (0 until n).map(i => StepURI.table(s"t$i/latest"))
    val deps = edges.filter(e => e._1 != e._2)
      .groupMap(_._1)(e => nodes(e._2))
    nodes.zipWithIndex.map { case (u, i) =>
      u -> deps.getOrElse(i, Seq.empty).distinct
    }.toMap
  }

  property("topoSort emits every node exactly once, deps first") =
    forAll(dagGen) { dag =>
      val order = Dag.topoSort(dag)
      val idx = order.zipWithIndex.toMap
      order.toSet == dag.keySet &&
        dag.forall { case (s, deps) => deps.forall(d => idx(d) < idx(s)) }
    }

  property("resolveLatest never leaves latest when concrete versions exist") =
    forAll(Gen.choose(1, 5)) { n =>
      val versions = (1 to n).map(i => StepURI.snapshot(f"s/2024-$i%02d-01"))
      val dag: Dag.Deps = versions.map(_ -> Seq.empty[StepURI]).toMap +
        (StepURI.table("t/latest") -> Seq(StepURI.snapshot("s/latest")))
      val r = Dag.resolveLatest(dag)
      r(StepURI.table("t/latest")) == Seq(versions.max)
    }
}

/** Pure (no SparkSession) properties of the fused set expression: the
  * two-pointer merge must agree with Scala Set intersection on every
  * sorted-distinct input.
  */
object SetExpressionProperties extends Properties("SortedIntersectSize") {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.{ArrayType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  private def arr(xs: Seq[String]) = Literal(
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any]),
    ArrayType(StringType))

  private val tokens = Gen.listOf(Gen.oneOf(
    ('a' to 'z').map(_.toString) ++ Seq("aa", "ab", "ba", "zz", "")))

  property("equals Set intersection size on sorted distinct arrays") =
    forAll(tokens, tokens) { (a, b) =>
      val sa = a.distinct.sorted
      val sb = b.distinct.sorted
      val got = graft.functions.SortedIntersectSize(arr(sa), arr(sb))
        .eval(null).asInstanceOf[Long]
      got == (sa.toSet & sb.toSet).size.toLong
    }
}

/** NearestCentroid (interpreted eval) vs a plain-Scala reference argmax
  * — random vectors and centroid sets, including short/ragged vectors
  * and all-zero centroids (NaN cosine is skipped by both paths). The
  * codegen path is pinned separately on real data in ApiSpec.
  */
object NearestCentroidProps extends Properties("NearestCentroid") {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types._

  private val vec = Gen.choose(1, 8).flatMap(d =>
    Gen.listOfN(d, Gen.choose(-10.0, 10.0)))
  private val cents = Gen.choose(1, 6).flatMap(k =>
    Gen.listOfN(k, vec)).map(_.zipWithIndex.map {
      case (cv, i) => (i.toLong, cv)
    })

  private def ref(v: Seq[Double], cs: Seq[(Long, Seq[Double])]): Long = {
    var best = -1L; var bs = -2.0
    cs.foreach { case (id, cv) =>
      val n = math.min(v.length, cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        dot += v(j) * cv(j); na += v(j) * v(j); nb += cv(j) * cv(j); j += 1
      }
      val sc = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sc > bs) { bs = sc; best = id }
    }
    best
  }

  private val centType = ArrayType(StructType(Seq(
    StructField("id", LongType),
    StructField("cv", ArrayType(DoubleType)))))

  property("matches the reference argmax on random inputs") =
    forAll(vec, cents) { (v, cs) =>
      val got = graft.functions.NearestCentroid(
          Literal.create(v, ArrayType(DoubleType)),
          Literal.create(cs.map { case (id, cv) => Row(id, cv) }, centType))
        .eval(null).asInstanceOf[Long]
      got == ref(v, cs)
    }
}

/** The mixing selection is (id * A mod 2^32) < threshold(rate): the
  * threshold function is the shared contract between the Spark
  * predicate and any mirrored SQL, so its monotonicity IS the
  * guarantee that raising a stratum's rate only ever ADDS documents
  * (mixture re-weighting never churns the kept set).
  */
object MixingProps extends org.scalacheck.Properties("Mixing") {
  import org.scalacheck.{Gen, Prop}
  private val rate = Gen.choose(0.0, 1.0)
  property("threshold is monotone, bounded, and exact at the endpoints") =
    Prop.forAll(rate, rate) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val (tl, th) = (graft.api.Mixing.threshold(lo), graft.api.Mixing.threshold(hi))
      tl <= th && 0L <= tl && th <= 4294967296L &&
        graft.api.Mixing.threshold(0.0) == 0L &&
        graft.api.Mixing.threshold(1.0) == 4294967296L
    }

  private val countsGen = for {
    n <- Gen.choose(1, 8)
    ks <- Gen.listOfN(n, Gen.identifier.map(_.take(6))).map(_.distinct)
    vs <- Gen.listOfN(ks.size, Gen.choose(1L, 1000000L))
  } yield ks.zip(vs).toMap
  private val alpha = Gen.choose(0.0, 1.0)

  property("temperatureRates: in (0,1], binding source exactly 1, " +
    "anti-monotone in counts") =
    Prop.forAll(countsGen, alpha) { (counts, a) =>
      val r = graft.api.Mixing.temperatureRates(counts, a)
      val inRange = r.values.forall(v => v > 0.0 && v <= 1.0)
      val bindingAtOne = r.values.max == 1.0
      // a source with fewer docs never keeps a smaller fraction
      val antiMono = counts.toSeq.combinations(2).forall {
        case Seq((s1, n1), (s2, n2)) =>
          if (n1 == n2) true
          else if (n1 < n2) r(s1) >= r(s2) - 1e-12
          else r(s2) >= r(s1) - 1e-12
        case _ => true
      }
      inRange && bindingAtOne && antiMono
    }
}

/** BPE encode checked against an INDEPENDENT reference implementation:
  * the reference walks the merges table in rank order and applies the
  * first applicable rule with an index loop (find-first semantics),
  * where production collects candidates and takes minBy rank with a
  * pattern-match fold — structurally different code paths that must
  * agree on every (word, table), plus the lossless-ness invariant.
  */
object BpeProps extends Properties("Bpe") {
  import org.scalacheck.Prop
  import graft.api.Bpe

  private def refEncode(word: String,
                        merges: Seq[(String, String)]): List[String] = {
    var toks = word.map(_.toString).toVector
    var cont = toks.length >= 2
    while (cont) {
      merges.find { case (a, b) =>
        toks.indices.init.exists(i => toks(i) == a && toks(i + 1) == b)
      } match {
        case None => cont = false
        case Some((a, b)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < toks.length) {
            if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += toks(i); i += 1 }
          }
          toks = out.result()
          cont = toks.length >= 2
      }
    }
    toks.toList
  }

  private val wordGen = Gen.choose(0, 14)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  // a REALISTIC table comes from training (later merges build on
  // earlier merged tokens) — train on a random word set
  private val tableGen = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, wordGen)
    m <- Gen.choose(0, 20)
  } yield Bpe.train(ws.map(_ -> 1L), m, minCount = 1L)
  // plus arbitrary single-char pair tables (need not be reachable by
  // training; encode must still be well-defined and agree)
  private val rawTableGen = Gen.choose(0, 8).flatMap(n =>
    Gen.listOfN(n, Gen.zip(
      Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")))
      .map(_.distinct))

  property("production encode == rank-order reference encode") =
    Prop.forAll(wordGen, tableGen) { (w, merges) =>
      Bpe.encode(w, Bpe.ranksOf(merges)) == refEncode(w, merges)
    }

  property("encode is lossless and agrees on raw pair tables") =
    Prop.forAll(wordGen, rawTableGen) { (w, merges) =>
      val got = Bpe.encode(w, Bpe.ranksOf(merges))
      got.mkString == w && got == refEncode(w, merges)
    }

  property("trained table re-encodes every training word losslessly") =
    Prop.forAll(Gen.listOf(wordGen), Gen.choose(0, 30)) { (ws, m) =>
      val merges = Bpe.train(ws.map(_ -> 1L), m, minCount = 1L)
      val ranks = Bpe.ranksOf(merges)
      ws.forall(w => Bpe.encode(w, ranks).mkString == w)
    }
}

/** WavCodec round-trip: any PCM16 stream wrapped in a buildWav container
  * must parse back to exactly the header fields and window energies that
  * direct arithmetic over the samples gives — the container walk adds
  * nothing and loses nothing.
  */
object WavCodecProps extends Properties("WavCodec") {
  import org.scalacheck.Prop
  import graft.multimodal.Multimodal.{WavCodec, buildWav}

  private val samplesGen = Gen.choose(0, 400).flatMap(n =>
    Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)))
  private val windowGen = Gen.choose(1, 64)
  private val channelsGen = Gen.choose(1, 2)

  property("header + energy windows reproduce direct sample arithmetic") =
    Prop.forAll(samplesGen, windowGen, channelsGen) { (samples, win, ch) =>
      val pcm = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val wav = buildWav(pcm, rate = 8000, channels = ch, bits = 16)
      val frames = samples.length / ch // buildWav truncates to frames
      val (r, c, b, n) = WavCodec.header(wav)
      val headerOk = r == 8000 && c == ch && b == 16 && n == frames.toLong
      // channel 0 of each frame, windows of `win` frames
      val ch0 = (0 until frames).map(f => samples(f * ch))
      val expect = ch0.grouped(win).zipWithIndex.map { case (g, i) =>
        (i, g.map(s => s.toLong * s).sum, g.map(math.abs).maxOption.getOrElse(0), g.size)
      }.toSeq
      val got = WavCodec.energyWindows(wav, win)
      headerOk && got == expect
    }
}


/** The schema walker is TOTAL: whatever document shape a hand-edited
  * YAML parses into, validation returns violation strings — it never
  * throws — and validating a document against each embedded reference
  * schema is deterministic. A validator that crashes on adversarial
  * input would turn a malformed sidecar into an opaque stack trace
  * instead of the schema-keyed errors the shelf surfaces promise.
  */
/** The string data-skipping truncation lemma (api/TxTable.scala
  * truncMin/truncMax): over ARBITRARY byte arrays — including 0xFF
  * runs, which valid UTF-8 never produces, so only a generative test
  * reaches the unbounded-max overflow branch — the truncated min never
  * exceeds its input and the truncated max never undershoots it in
  * unsigned byte order, both fit the cap, and monotonicity of the
  * unsigned order then gives conservativeness of the whole file-prune
  * predicate (strRangeKeep keeps any file whose true range intersects
  * the query's).
  */
object StrStatProps extends Properties("StrStats") {
  import org.scalacheck.Prop.forAll
  import graft.api.TxTable.{truncMin, truncMax, StrStatMaxBytes}

  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 3 * StrStatMaxBytes)
    // bias toward 0xFF so prefixes of all-0xFF (the overflow branch)
    // actually occur
    bs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.const(0xFF.toByte),
      1 -> Gen.choose(Byte.MinValue, Byte.MaxValue)))
  } yield bs.toArray

  private def cmp(a: Array[Byte], b: Array[Byte]): Int =
    java.util.Arrays.compareUnsigned(a, b)

  property("truncMin(x) <= x, length-capped") = forAll(bytesGen) { x =>
    val m = truncMin(x)
    cmp(m, x) <= 0 && m.length <= StrStatMaxBytes
  }

  property("truncMax(x) >= x when finite, length-capped; overflow iff all-0xFF prefix") =
    forAll(bytesGen) { x =>
      truncMax(x) match {
        case Some(h) => cmp(h, x) >= 0 && h.length <= StrStatMaxBytes
        case None =>
          x.length > StrStatMaxBytes &&
            x.take(StrStatMaxBytes).forall(b => (b & 0xFF) == 0xFF)
      }
    }

  property("prefixUpper bounds EVERY continuation of the prefix") =
    forAll(bytesGen, bytesGen) { (p, suffix) =>
      graft.api.TxTable.prefixUpper(p) match {
        case Some(hi) =>
          // any string starting with p — p itself and p ++ anything —
          // must stay <= the bound (the LIKE 'p%' pruning contract;
          // the non-incrementing bug dropped rows past the first file)
          cmp(p, hi) <= 0 && cmp(p ++ suffix, hi) <= 0
        case None => p.forall(b => (b & 0xFF) == 0xFF)
      }
    }

  property("a value inside a file's true range is never pruned") =
    forAll(bytesGen, bytesGen, bytesGen) { (a, b, c) =>
      // order the three: lo <= v <= hi in unsigned byte order
      val sorted = Seq(a, b, c).sortWith(cmp(_, _) < 0)
      val (lo, v, hi) = (sorted(0), sorted(1), sorted(2))
      val keptLo = cmp(truncMin(lo), v) <= 0 // recorded lo can't exceed v
      val keptHi = truncMax(hi).forall(h => cmp(h, v) >= 0) // nor hi undershoot
      keptLo && keptHi
    }
}

object SchemasProps extends Properties("Schemas") {
  import org.scalacheck.Arbitrary

  private val scalarGen: Gen[Any] = Gen.oneOf(
    Gen.alphaNumStr.map(identity[Any]),
    Arbitrary.arbitrary[Int].map(identity[Any]),
    Arbitrary.arbitrary[Long].map(identity[Any]),
    Arbitrary.arbitrary[Double].map(identity[Any]),
    Arbitrary.arbitrary[Boolean].map(identity[Any]),
    Gen.const(null: Any),
    // adversarial strings: schema-significant characters + non-ASCII
    Gen.oneOf("\"", "\\", "{", "}", "[", "]", ":", ",", "\n", " ",
      "snapshot://", "a" * 64, ".csv", "", "l\u00e4\u00dft-\u00f6")
      .map(identity[Any]))

  private def docGen(depth: Int): Gen[Any] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, docGen(depth - 1)).map(identity[Any])),
      3 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(Gen.alphaNumStr, docGen(depth - 1)))
          .map(_.toMap: Any)))

  private val schemas = Seq(Schemas.ShelfV1, Schemas.SnapshotV1,
    Schemas.TableV1, Schemas.TableConfigV1)

  property("validate is total and deterministic on arbitrary documents") =
    forAll(docGen(3)) { doc =>
      schemas.forall { sc =>
        val a = Schemas.validate(doc, sc)
        val b = Schemas.validate(doc, sc)
        a == b // and neither call threw
      }
    }

  property("a valid-by-construction snapshot sidecar yields zero violations") =
    forAll(Gen.zip(
        Gen.listOfN(64, Gen.oneOf(('a' to 'f') ++ ('0' to '9'))).map(_.mkString),
        Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(8)))) {
      case (cs, ns) =>
        val doc = Map[String, Any](
          "version" -> 1, "uri" -> s"snapshot://$ns/$ns",
          "checksum" -> cs, "snapshot_type" -> "file",
          "extension" -> ".csv")
        Schemas.validate(doc, Schemas.SnapshotV1).isEmpty
    }

  property("ecmaToJava is identity outside character classes") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('^', '$', '.',
        '+', '*', '?', '(', ')', '|', '/'))).map(_.mkString)) { p =>
      Schemas.ecmaToJava(p) == p
    }
}

/** Properties of the PassJoin math in api/FuzzyJoin.scala — the
  * segment geometry closed forms and the multi-match-aware probe
  * window (Li, Deng & Feng ICDE'11, Lemma 3) transcribed verbatim and
  * checked against brute-force edit scripts. The Spark plumbing is
  * pinned by LinkageSpec's brute-force equality; THESE pin the
  * formulas, whose off-by-ones are the dangerous part.
  */
object PassJoinProps extends Properties("PassJoin") {
  import org.scalacheck.Prop.forAll

  // THE production closed forms (graft.api.FuzzyJoin), not a
  // transcription — drift in the formulas fails these properties, and
  // LinkageSpec sweeps the SQL fragments equal to the same functions
  private def segLen(l: Int, i: Int, n: Int): Int =
    graft.api.FuzzyJoin.segLenF(l, i, n - 1)
  private def segStart(l: Int, i: Int, n: Int): Int =
    graft.api.FuzzyJoin.segStartF(l, i, n - 1)

  private val kGen = Gen.choose(1, 3)
  private val strGen = for {
    len <- Gen.choose(0, 24)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  property("segments tile [1..l] disjointly for every (l, k)") =
    forAll(Gen.choose(0, 60), kGen) { (l, k) =>
      val n = k + 1
      val spans = (0 until n).map(i => (segStart(l, i, n), segLen(l, i, n)))
      val covered = spans.flatMap { case (p, sl) => p until (p + sl) }
      spans.forall(_._2 >= 0) &&
        covered == (1 to l) // in order, no gap, no overlap
    }

  /** Apply ≤ k random edits to s; the multi-match window must offer at
    * least one (slot, position) where the probe substring equals the
    * segment — the losslessness the blocking depends on.
    */
  private val editedPair = for {
    s <- strGen
    k <- kGen
    nEdits <- Gen.choose(0, k)
    ops <- Gen.listOfN(nEdits, Gen.choose(0, 2))
    seeds <- Gen.listOfN(nEdits, Gen.choose(0, 1 << 20))
  } yield {
    var r = s
    ops.zip(seeds).foreach { case (op, seed) =>
      val pos = if (r.isEmpty) 0 else seed % (r.length + (if (op == 1) 1 else 0))
      op match {
        case 0 if r.nonEmpty => // substitution
          r = r.updated(pos % r.length, ('a' + seed % 3).toChar)
        case 1 => // insertion
          r = r.substring(0, pos) + ('a' + seed % 3).toChar + r.substring(pos)
        case 2 if r.nonEmpty => // deletion
          val d = pos % r.length
          r = r.substring(0, d) + r.substring(d + 1)
        case _ => ()
      }
    }
    (s, r, k)
  }

  /** The pre-verify candidate filter: one edit moves at most two
    * bucket counts by 1, so L1 ≤ 2·ed always; saturation at 15 only
    * shrinks the L1. editedPair's 3-letter alphabet piles ≥ 16 counts
    * into single buckets at len 24, so the saturating path is
    * exercised, not just the small-count one.
    */
  property("char-frequency signature L1 never exceeds 2x the edit count") =
    forAll(editedPair) { case (s, r, k) =>
      graft.api.FuzzyJoin.sigL1F(
        graft.api.FuzzyJoin.charSigF(s),
        graft.api.FuzzyJoin.charSigF(r)) <= 2L * k
    }

  property("multi-match window is lossless under <= k edits") =
    forAll(editedPair) { case (s0, r0, k) =>
      // the probe side always probes the SHORTER-or-equal partner
      val (s, r) = if (s0.length <= r0.length) (s0, r0) else (r0, s0)
      val (l, m, n) = (s.length, r.length, k + 1)
      if (m - l > k) true // > k length delta implies > k edits; never probed
      else {
        val d = m - l
        val hit = (0 until n).exists { i =>
          val sl = segLen(l, i, n)
          val p0 = segStart(l, i, n)
          val seg = s.substring(p0 - 1, p0 - 1 + sl)
          if (sl == 0) true // zero-length slot matches trivially
          else {
            val (wl, wh) = graft.api.FuzzyJoin.windowF(i, d, k)
            val lo = math.max(1, p0 + wl)
            val hi = math.min(m - sl + 1, p0 + wh)
            (lo to hi).exists(p => r.substring(p - 1, p - 1 + sl) == seg)
          }
        }
        hit
      }
    }
}

/** The table-property codec must round-trip ARBITRARY user strings
  * through the hand-rolled JSON commit record: per-entry base64 armor
  * keeps the payload in a JSON-inert alphabet no matter what the user
  * writes (quotes, brackets, ';', ':', newlines, unicode, empties).
  */
object TxPropsCodecProps extends Properties("TxPropsCodec") {
  import org.scalacheck.Arbitrary.arbitrary
  import graft.api.TxTable

  private val anyString = arbitrary[String]
  private val propsGen = Gen.mapOf(Gen.zip(anyString, anyString))

  property("encode/decode round-trips any map") = forAll(propsGen) { m =>
    TxTable.decodeProps(TxTable.encodeProps(m)) == m
  }

  property("encoded payload stays JSON-inert") = forAll(propsGen) { m =>
    TxTable.encodeProps(m).forall(c =>
      c.isLetterOrDigit || "+/=:;".contains(c))
  }
}

/** Column-mapping invariants (round 20): fresh physical names never
  * collide with anything that ever existed, the schema mapping
  * round-trips through its own serialization, and filter translation
  * only ever emits physical names the map knows.
  */
object TxMappingProps extends Properties("TxMapping") {
  import graft.api.TxMapping
  import org.apache.spark.sql.types._

  private val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val namesGen = Gen.listOf(nameGen).map(_.distinct)

  property("freshPhysical avoids current, retired and taken names") =
    forAll(namesGen, namesGen, namesGen, nameGen) { (cur, ret, taken, want) =>
      val schema = StructType(cur.map(StructField(_, LongType)))
      val pick = TxMapping.freshPhysical(want, schema, ret.toSet, 7L,
        taken.toSet)
      !cur.contains(pick) && !ret.contains(pick) && !taken.contains(pick) &&
        (pick == want || cur.contains(want) || ret.contains(want) ||
          taken.contains(want))
    }

  property("mapping survives schemaB64 round-trip (the log's carrier)") =
    forAll(namesGen.suchThat(_.size >= 2)) { names =>
      // rename every field to a rotated name: physical = original
      val fields = names.zip(names.tail :+ names.head).map {
        case (phys, logical) =>
          TxMapping.fieldWithPhysical(StructField(logical, LongType), phys)
      }
      // duplicate LOGICAL names can arise from rotation collisions on
      // case-insensitive-distinct inputs; skip those shapes
      (fields.map(_.name).distinct.size != fields.size) || {
        val schema = StructType(fields)
        val json = DataType.fromJson(schema.json).asInstanceOf[StructType]
        names.indices.forall { i =>
          TxMapping.physicalName(json.fields(i)) == names(i)
        } && (TxMapping.toPhysicalSchema(json).fieldNames.toSeq == names)
      }
    }

  property("filterToPhysical emits only known physical names") =
    forAll(namesGen.suchThat(_.nonEmpty), nameGen) { (logicals, other) =>
      import org.apache.spark.sql.sources._
      val m = logicals.map(l => l -> s"p_$l").toMap
      val f = And(EqualTo(logicals.head, 1),
        Or(GreaterThan(other, 2), IsNotNull(logicals.head)))
      TxMapping.filterToPhysical(f, m).forall { t =>
        def refs(x: Filter): Seq[String] = x match {
          case EqualTo(a, _) => Seq(a)
          case GreaterThan(a, _) => Seq(a)
          case IsNotNull(a) => Seq(a)
          case And(l, r) => refs(l) ++ refs(r)
          case Or(l, r) => refs(l) ++ refs(r)
          case _ => Nil
        }
        refs(t).forall(m.values.toSet.contains)
      }
    }

  property("an OR with an untranslatable side is dropped whole") =
    forAll(nameGen) { known =>
      import org.apache.spark.sql.sources._
      val unknown = known + "_x" // never in the map
      val m = Map(known -> s"p_$known")
      // dropping only one OR side would WIDEN row-group matches into
      // wrongly-skipped groups — the whole disjunction must go
      TxMapping.filterToPhysical(
        Or(EqualTo(known, 1), EqualTo(unknown, 2)), m).isEmpty
    }
}
