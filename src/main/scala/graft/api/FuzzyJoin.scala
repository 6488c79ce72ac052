package graft.api

import org.apache.spark.sql.{Column, DataFrame}
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
  * share it. A 10× disjoint-replication probe measured 18× wall growth
  * at k=2 from exactly this shape: replicas share every segment not
  * covering the replica-distinguishing digits, so candidates grow with
  * the SQUARE of the colliding subset while true pairs grow linearly.
  * The repair is a constant-cost EDIT-DISTANCE LOWER BOUND evaluated on
  * the raw join output, BEFORE the distinct exchange and the verify:
  * each key carries a 16-bucket character-frequency signature packed
  * into one BIGINT (4-bit saturating counts, bucket = codepoint mod 16).
  * One edit changes at most two bucket counts by 1 each, so
  * ed(a, b) ≤ k ⟹ L1(counts_a, counts_b) ≤ 2k; saturating a count at
  * 15 only shrinks its contribution to the L1, so the packed filter
  * `L1(sig_a, sig_b) ≤ 2k` remains a NECESSARY condition — provably
  * lossless, 16 codegen'd shift-mask-abs terms per candidate vs a full
  * O(|l|·|r|) levenshtein plus a shuffle row for every survivor.
  * Remaining candidates are deduped before the verify so each pair pays
  * one levenshtein, and partition-level skew is AQE's to split.
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
    val keys = distinctKeys(df, keyCol)
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
    // Banded verify: levenshtein(l, r, threshold) computes only the
    // ±threshold diagonal band with early abandon (returns -1 past it) —
    // O(k·min(|l|,|r|)) instead of the full O(|l|·|r|) DP table, same
    // ed ≤ k decision. The candidates are canonicalized distinct pairs,
    // so equality (distance 0) cannot occur; >= 0 ⟺ ed ≤ 1.
    candidates.where(levenshtein(col("left_key"), col("right_key"), 1) >= 0)
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

  /** Packed character-frequency signature of string column `s`: 16
    * buckets (codepoint mod 16), each a 4-bit count saturating at 15,
    * packed little-endian into one BIGINT. Computed ONCE per distinct
    * key (the keys frame is the small side); candidates compare
    * signatures with [[sigL1]]. The empty string's signature is
    * explicitly 0 (split('', '') yields a one-element array of '' whose
    * ascii is not a character count — the guard keeps the vector true).
    */
  private[graft] def charSigSql(s: String): String =
    s"IF(length($s) = 0, CAST(0 AS BIGINT), " +
      s"aggregate(transform(split($s, ''), c -> pmod(ascii(c), 16)), " +
      s"CAST(0 AS BIGINT), (acc, b) -> acc + " +
      s"IF((shiftright(acc, b * 4) & 15) < 15, " +
      s"shiftleft(CAST(1 AS BIGINT), b * 4), CAST(0 AS BIGINT))))"

  /** L1 distance between two packed signatures — ONE pre-compiled
    * static loop (graft.functions.TextNorm.sigL1) behind a tiny
    * codegen'd expression. The previous unrolled-16-term Column put
    * ~80 ops of per-candidate arithmetic into the GENERATED join code,
    * which executes interpreted until the JIT warms — exactly where
    * the hot PassJoin bucket evaluates millions of candidates on a
    * query's first run (profiled: the verify stage's first-execution
    * CPU was ~5x its steady state). Saturated counts shrink the L1, so
    * `sigL1(a, b) <= 2k` is implied by `ed(a, b) <= k` — a lossless
    * pre-verify filter (property-pinned in PassJoinProps).
    */
  private[graft] def sigL1(a: Column, b: Column): Column = {
    graft.functions.TextFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("sig_l1", a, b)
  }

  /** The pure twin of [[charSigSql]] for the property tests. */
  private[graft] def charSigF(s: String): Long = {
    var sig = 0L
    s.foreach { c =>
      val b = java.lang.Math.floorMod(c.toInt, 16)
      if (((sig >> (b * 4)) & 15L) < 15L) sig += 1L << (b * 4)
    }
    sig
  }

  /** The pure twin of [[sigL1]] for the property tests. */
  private[graft] def sigL1F(a: Long, b: Long): Long =
    (0 until 16).map(j => math.abs(((a >> (j * 4)) & 15L) - ((b >> (j * 4)) & 15L))).sum

  /** k ≥ 2: PassJoin. A length-l string splits into n = k+1 segments;
    * with base = l div n and rem = l mod n, segment i (0-based) has
    *   len_i   = base + (1 if i ≥ n − rem else 0)      (long segments last)
    *   start_i = 1 + i·base + max(0, i − (n − rem))    (1-based)
    * — disjoint, covering, deterministic, so both sides derive the same
    * geometry from (l, i) alone and the join key stays (l, i, text).
    */
  private def passJoin(keys: DataFrame, k: Int): DataFrame =
    passJoinCandidates(keys, k, sigFilter = true, verify = true).distinct()

  /** The candidate-pair frame BEFORE the final distinct — the
    * blowup-attribution seam (ScaleProbe counts it with and without the
    * signature filter). `sigFilter = false` reproduces the pure
    * segment-blocking candidate set for comparison; production always
    * filters.
    *
    * `verify` inlines the exact levenshtein INTO the join condition,
    * explicitly ordered AFTER the signature test. Ordering is the whole
    * point: a `.where(levenshtein ≤ k)` placed above the distinct gets
    * predicate-pushed into the join condition by Catalyst — PREPENDED
    * to the existing conjuncts — so every raw segment collision paid
    * the O(|l|·|r|) verify and the 16-op lower bound saved nothing
    * (measured: identical 36 s with and without the filter at 10×
    * probe scale). With the conjunct order fixed here, the And chain
    * short-circuits left-to-right in codegen: hash-key match → ≠ →
    * 16 shift-mask terms → levenshtein only for the ~6 % survivors,
    * and the distinct exchanges true pairs only (10× probe: 45 s
    * distinct over 44 M raw candidates → sub-second over ~580 k).
    */
  private[graft] def passJoinCandidates(keys: DataFrame, k: Int,
      sigFilter: Boolean, verify: Boolean = false): DataFrame = {
    def segLen(l: String, i: String) = segLenSql(k)(l, i)
    def segStart(l: String, i: String) = segStartSql(k)(l, i)

    val withLen = keys.withColumn("l", length(col("k")))
      .withColumn("sig", expr(charSigSql("k")))

    // 1. Segment side: k+1 rows per key. substring(k, p, 0) = "" keeps
    //    zero-length segments (keys shorter than n) as trivial matchers.
    val segs = withLen
      .select(col("k"), col("l"), col("sig"), explode(expr(s"sequence(0, $k)")).as("i"))
      .select(col("k"), col("l"), col("i"), col("sig"),
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
      .select(col("k").as("r"), col("l").as("m"), col("sig").as("rsig"),
        expr(s"explode(sequence(GREATEST(0, l - $k), l))").as("pl"))
      .select(col("r"), col("m"), col("rsig"), col("pl"),
        explode(expr(s"sequence(0, $k)")).as("i"))
      .withColumn("d", col("m") - col("pl"))
      .select(col("r"), col("rsig"), col("pl"), col("i"),
        expr(s"${segLen("pl", "i")}").as("sl"),
        expr(s"GREATEST(1, ${segStart("pl", "i")} + ${winLoSql(k)("i", "d")})").as("ps"),
        expr(s"LEAST(m - ${segLen("pl", "i")} + 1, ${segStart("pl", "i")} + ${winHiSql(k)("i", "d")})").as("pe"))
      .select(col("r"), col("rsig"), col("pl"), col("i"), col("sl"),
        explode(expr("CASE WHEN sl = 0 THEN array(1) " +
          "WHEN pe >= ps THEN sequence(ps, pe) ELSE array() END")).as("p"))
      .select(col("r"), col("rsig"), col("pl"), col("i"),
        expr("substring(r, p, sl)").as("t"))
      // Distinct BEFORE the join: different window positions over
      // repeated text (digit runs, padding zeros) yield the SAME
      // probe substring, and every duplicate probe row re-pays its
      // whole collision bucket inside the join before the final
      // distinct collapses the pairs. The probe frame is tiny
      // (O(k²) rows per key), so this exchange is ~free; the join's
      // output is unchanged (it was already deduped downstream).
      .distinct()
      .repartition(fanout(keys))

    // 3. Hash-join on (length, slot, text); the signature lower bound
    //    trims candidates INSIDE the join (before the distinct's
    //    exchange pays for them); canonicalize for the dedup + verify.
    val joinCond = col("a.pl") === col("b.l") && col("a.i") === col("b.i") &&
      col("a.t") === col("b.t") && col("a.r") =!= col("b.k")
    val withSig =
      if (sigFilter) joinCond && sigL1(col("a.rsig"), col("b.sig")) <= lit(2L * k)
      else joinCond
    val cond =
      // Banded threshold form: only the ±k diagonal band is computed and
      // the DP abandons a row whose band minimum already exceeds k —
      // O(k·min) per survivor vs the full O(|l|·|r|) table. Returns -1
      // iff the distance exceeds k, so >= 0 is exactly ed ≤ k.
      if (verify) withSig && levenshtein(col("a.r"), col("b.k"), k) >= 0
      else withSig
    probes.as("a")
      .join(segs.as("b"), cond)
      .select(least(col("a.r"), col("b.k")).as("left_key"),
        greatest(col("a.r"), col("b.k")).as("right_key"))
  }

  /** The distinct non-null key frame [[edSelfJoin]] blocks over —
    * exposed so probes/tools can attribute candidate volume on exactly
    * the production input.
    */
  private[graft] def distinctKeys(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .distinct()
}
