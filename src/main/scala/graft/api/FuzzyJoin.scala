package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-similarity / edit-distance joins without the cartesian product —
  * the record-linkage primitive of data curation (merge near-identical
  * titles, URLs, author strings across crawls). The naive formulation
  * `a JOIN b ON levenshtein(a.k, b.k) <= k` is an O(n²) nested loop that
  * no optimizer can save; at 100 TB it simply never finishes.
  *
  * Two lossless FILTER-VERIFY blockings, chosen by k:
  *
  * k = 1 — deletion-neighborhood signatures (the scheme behind
  * SymSpell-style spell indexes, same shape as the q-gram/prefix filters
  * of Gravano et al., VLDB'01): two strings within edit distance 1 MUST
  * share a member of D(s) = {s} ∪ {s minus one character} — an insert
  * shares the original-vs-deleted form, a delete the reverse, a
  * substitution the both-deleted form at the edit position, equality
  * shares s itself. Neighborhood size is len+1, so this wins at k=1 but
  * grows as len^k beyond it (a 1 kB title would emit ~500k variants at
  * k=2) — rejected there in favor of:
  *
  * k ≥ 2 — PassJoin segment blocking (Li, Deng & Feng, ICDE 2011):
  * partition each indexed string s of length l into k+1 disjoint
  * segments (⌊l/(k+1)⌋ or ⌈l/(k+1)⌉ chars each). By pigeonhole, any r
  * with ed(r, s) ≤ k leaves at least one segment untouched by all k
  * edits, and that segment survives in r as a contiguous substring whose
  * start position shifts by at most k (each edit shifts downstream
  * characters by ≤ 1). So:
  *
  *   1. SEGMENT side: each distinct key emits its k+1 segments keyed by
  *      (length l, segment index i, segment text) — k+1 rows per key;
  *   2. PROBE side: each key r of length m emits, for every candidate
  *      partner length l ∈ [m-k, m] and every segment slot i, the
  *      substrings of r with the slot's length at start positions within
  *      ±k of the slot's position — O(k²·(2k+1)) short rows per key,
  *      independent of corpus size;
  *   3. hash-join probes with segments on (l, i, text), canonicalize
  *      least/greatest, dedup, and verify survivors with one exact
  *      codegen'd `levenshtein(l, r) <= k` — no UDF anywhere.
  *
  * Probing only l ≤ m means each cross-length pair is generated from one
  * side only; equal-length pairs arrive from both directions and are
  * collapsed by the canonical ordering + distinct. Both blockings are
  * LOSSLESS (a strict superset of the true result — verify only trims),
  * so the output equals nested-loop semantics exactly and an oracle can
  * replay it as the naive cross join at test scale.
  *
  * Scale note: candidate volume is the size of genuine signature
  * collisions — shuffle-bound, never quadratic in the corpus — but
  * low-entropy keys sharing a long constant prefix (e.g. "Customer#…")
  * collide the prefix-side segment and degrade toward the pairs that
  * share it; candidates are deduped before the verify so each such pair
  * pays one levenshtein, and partition-level skew is AQE's to split.
  * Zero-length segments (keys shorter than k+1 chars) match trivially,
  * which is exactly the pigeonhole semantics: such keys are candidates
  * against every key within the k length window — a constant-size group.
  */
object FuzzyJoin {

  /** All pairs of distinct values of `keyCol` within edit distance
    * `maxDist` (1 ≤ maxDist ≤ 3). Output: (left_key STRING, right_key
    * STRING) with left_key < right_key, each qualifying unordered pair
    * exactly once.
    */
  def edSelfJoin(df: DataFrame, keyCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"edSelfJoin supports 1 <= maxDist <= 3 (deletion neighborhood at 1, " +
        s"PassJoin segments at 2-3); got $maxDist")
    val keys = df.select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .distinct()
    if (maxDist == 1) deletionNeighborhood(keys)
    else passJoin(keys, maxDist)
  }

  /** The session's shuffle-partition setting: the explicit fan-out
    * width for the generated probe/variant frames. The distinct key
    * frame is tiny, so AQE coalesces it to ONE partition — and without
    * an explicit repartition the entire candidate expansion (which
    * multiplies rows by orders of magnitude downstream of that tiny
    * input) inherits single-task execution: profiled at sf0.1, ONE core
    * ran a 6.3 s expansion while 31 idled. An explicit round-robin
    * repartition (user-specified N — AQE never re-coalesces it) spreads
    * probe rows, and the join's output parallelism follows its
    * streaming side.
    */
  private def fanout(df: DataFrame): Int = Par.shuffleWidth(df)

  /** k = 1: D(s) = {s} ∪ single-character deletions. array_distinct
    * keeps repeated-character strings from emitting the same variant
    * twice (e.g. "aa" deletes to "a" both ways).
    */
  private def deletionNeighborhood(keys: DataFrame): DataFrame = {
    val variants = keys.select(col("k"),
      explode(array_distinct(concat(
        array(col("k")),
        expr("transform(sequence(0, length(k) - 1), i -> concat(substr(k, 1, i), substr(k, i + 2)))"))))
        .as("v"))
      .repartition(fanout(keys))
    val candidates = variants.as("a")
      .join(variants.as("b"), col("a.v") === col("b.v") && col("a.k") < col("b.k"))
      .select(col("a.k").as("left_key"), col("b.k").as("right_key"))
      .distinct()
    candidates.where(levenshtein(col("left_key"), col("right_key")) <= 1)
  }

  /** The segment geometry and probe window as PURE closed forms —
    * the single source both the SQL fragments below and the property
    * tests bind to (PassJoinProps pins tiling + window losslessness on
    * THESE; LinkageSpec's sweep pins the SQL strings equal to these,
    * so an off-by-one edit to either side fails a test).
    */
  private[graft] def segLenF(l: Int, i: Int, k: Int): Int = {
    val n = k + 1
    l / n + (if (i >= n - l % n) 1 else 0)
  }

  private[graft] def segStartF(l: Int, i: Int, k: Int): Int = { // 1-based
    val n = k + 1
    1 + i * (l / n) + math.max(0, i - (n - l % n))
  }

  /** Unclamped multi-match window of start shifts for slot `i` with
    * length delta `d = m − l` (Li et al. ICDE'11, Lemma 3).
    */
  private[graft] def windowF(i: Int, d: Int, k: Int): (Int, Int) =
    (math.max(-i, d - (k - i)), math.min(i, d + (k - i)))

  /** SQL twins of the pure closed forms above, parameterized over the
    * SQL identifiers for partner length / slot index / length delta.
    * LinkageSpec evaluates these through Spark over a (l, i, d) grid
    * and asserts equality with segLenF/segStartF/windowF, so the two
    * representations cannot drift apart silently.
    */
  private[graft] def segLenSql(k: Int)(l: String, i: String): String = {
    val n = k + 1
    s"(($l div $n) + IF($i >= $n - ($l % $n), 1, 0))"
  }

  private[graft] def segStartSql(k: Int)(l: String, i: String): String = {
    val n = k + 1
    s"(1 + $i * ($l div $n) + GREATEST(0, $i - ($n - ($l % $n))))"
  }

  private[graft] def winLoSql(k: Int)(i: String, d: String): String =
    s"GREATEST(-$i, $d - ($k - $i))"

  private[graft] def winHiSql(k: Int)(i: String, d: String): String =
    s"LEAST($i, $d + ($k - $i))"

  /** k ≥ 2: PassJoin. A length-l string splits into n = k+1 segments;
    * with base = l div n and rem = l mod n, segment i (0-based) has
    *   len_i   = base + (1 if i ≥ n − rem else 0)      (long segments last)
    *   start_i = 1 + i·base + max(0, i − (n − rem))    (1-based)
    * — disjoint, covering, deterministic, so both sides derive the same
    * geometry from (l, i) alone and the join key stays (l, i, text).
    */
  private def passJoin(keys: DataFrame, k: Int): DataFrame = {
    def segLen(l: String, i: String) = segLenSql(k)(l, i)
    def segStart(l: String, i: String) = segStartSql(k)(l, i)

    val withLen = keys.withColumn("l", length(col("k")))

    // 1. Segment side: k+1 rows per key. substring(k, p, 0) = "" keeps
    //    zero-length segments (keys shorter than n) as trivial matchers.
    val segs = withLen
      .select(col("k"), col("l"), explode(expr(s"sequence(0, $k)")).as("i"))
      .select(col("k"), col("l"), col("i"),
        expr(s"substring(k, ${segStart("l", "i")}, ${segLen("l", "i")})").as("t"))

    // 2. Probe side: for each partner length pl ∈ [max(0, m−k), m] and
    //    slot i, substrings of r with the slot's length at the
    //    MULTI-MATCH-AWARE positions (Li et al. ICDE'11, Lemma 3): with
    //    Δ = m − pl, a complete scheme only needs start shifts
    //    (p − p_i) ∈ [max(−i, Δ−(k−i)), min(i, Δ+(k−i))] — if segments
    //    before slot i are all touched, ≥ i edits land before it
    //    (bounding the shift by ±i), and symmetrically ≤ k−i edits land
    //    after (anchoring the shift near Δ). This is provably lossless
    //    and cuts probe rows ~2.5x vs the naive ±k window (the
    //    brute-force specs pin the completeness). Clamped to r's
    //    bounds; for a zero-length slot emit the single "" probe; the
    //    descending-sequence footgun (sequence(5,3) = [5,4,3]) is
    //    guarded by the CASE below.
    val probes = withLen
      .select(col("k").as("r"), col("l").as("m"),
        expr(s"explode(sequence(GREATEST(0, l - $k), l))").as("pl"))
      .select(col("r"), col("m"), col("pl"),
        explode(expr(s"sequence(0, $k)")).as("i"))
      .withColumn("d", col("m") - col("pl"))
      .select(col("r"), col("pl"), col("i"),
        expr(s"${segLen("pl", "i")}").as("sl"),
        expr(s"GREATEST(1, ${segStart("pl", "i")} + ${winLoSql(k)("i", "d")})").as("ps"),
        expr(s"LEAST(m - ${segLen("pl", "i")} + 1, ${segStart("pl", "i")} + ${winHiSql(k)("i", "d")})").as("pe"))
      .select(col("r"), col("pl"), col("i"), col("sl"),
        explode(expr("CASE WHEN sl = 0 THEN array(1) " +
          "WHEN pe >= ps THEN sequence(ps, pe) ELSE array() END")).as("p"))
      .select(col("r"), col("pl"), col("i"),
        expr("substring(r, p, sl)").as("t"))
      .repartition(fanout(keys))

    // 3. Hash-join on (length, slot, text); canonicalize, dedup, verify.
    val candidates = probes.as("a")
      .join(segs.as("b"),
        col("a.pl") === col("b.l") && col("a.i") === col("b.i") &&
          col("a.t") === col("b.t") && col("a.r") =!= col("b.k"))
      .select(least(col("a.r"), col("b.k")).as("left_key"),
        greatest(col("a.r"), col("b.k")).as("right_key"))
      .distinct()
    candidates.where(levenshtein(col("left_key"), col("right_key")) <= k)
  }
}
