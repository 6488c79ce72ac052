package graft.api

/** Deterministic byte-level BPE (GPT-2 style: Sennrich et al. 2016 /
  * Radford et al. 2019 — public algorithm): a fixed, ordered merges
  * table fully determines the tokenization, so token counts are
  * engine- and partitioning-exact and a relational oracle can replay
  * the greedy merge loop from the merges table alone.
  *
  * The corpus here is pure ASCII (guarded in the audio oracle path), so
  * character-level == byte-level; words are the whitespace pre-tokens
  * the rest of the text stack already uses.
  *
  * Scale contract: training and encoding both operate on the DISTINCT
  * word table with counts — V-bounded, never corpus-sized. The trainer
  * runs driver-side over that collapsed table (the k-means
  * driver-literal discipline); encoding cost at query time is
  * |vocab| × word-length, joined back to the corpus broadcast-style.
  */
object Bpe {

  /** pair → rank (lower = applied first). */
  type Ranks = Map[(String, String), Int]

  def ranksOf(merges: Seq[(String, String)]): Ranks =
    merges.zipWithIndex.toMap

  /** Merge every left-to-right non-overlapping occurrence of (a, b) —
    * one BPE round. "a a a" under (a,a) becomes [aa, a], as in the
    * reference implementations.
    */
  private[api] def mergeAll(toks: List[String], a: String,
                            b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer[String]()
    var rest = toks
    while (rest.nonEmpty) {
      rest match {
        case x :: y :: tl if x == a && y == b =>
          buf += (a + b); rest = tl
        case x :: tl =>
          buf += x; rest = tl
      }
    }
    buf.toList
  }

  /** Greedy BPE encode: start from characters; while any adjacent pair
    * is in the table, merge all occurrences of the best-ranked one.
    * Deterministic — rank ties are impossible (pairs are unique).
    */
  def encode(word: String, ranks: Ranks): List[String] = {
    var toks = word.toList.map(_.toString)
    var done = toks.length < 2
    while (!done) {
      val cand = toks.zip(toks.tail).distinct
        .flatMap(p => ranks.get(p).map(r => (r, p)))
      if (cand.isEmpty) done = true
      else {
        val (_, (a, b)) = cand.minBy(_._1)
        toks = mergeAll(toks, a, b)
        if (toks.length < 2) done = true
      }
    }
    toks
  }

  /** Token count without materializing the token list. */
  def countTokens(word: String, ranks: Ranks): Int = encode(word, ranks).length

  /** Learn `numMerges` merge rules from a (word, count) table — the
    * classic BPE trainer, deterministic: best pair = max corpus count,
    * ties broken lexicographically on (a, b). Stops early when no pair
    * occurs at least `minCount` times (default 2 — merging a hapax pair
    * buys nothing). Overlapping occurrences within a word each count,
    * as in the reference trainer.
    */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int,
            minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words: Vector[(List[String], Long)] =
      wordCounts.toVector.map { case (w, c) => (w.toList.map(_.toString), c) }
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var stop = false
    while (i < numMerges && !stop) {
      val counts = collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (toks, c) =>
        toks.zip(toks.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < minCount) stop = true
        else {
          out += ((a, b))
          words = words.map { case (toks, c) => (mergeAll(toks, a, b), c) }
          i += 1
        }
      }
    }
    out.result()
  }
}
