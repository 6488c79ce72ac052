package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-similarity / edit-distance joins without the cartesian product —
  * the record-linkage primitive of data curation (merge near-identical
  * titles, URLs, author strings across crawls). The naive formulation
  * `a JOIN b ON levenshtein(a.k, b.k) <= 1` is an O(n²) nested loop that
  * no optimizer can save; at 100 TB it simply never finishes.
  *
  * This implementation is FILTER-VERIFY with a deletion-neighborhood
  * signature (the scheme behind SymSpell-style spell indexes, and the
  * same shape as the q-gram/prefix filters of Gravano et al., VLDB'01):
  * for k = 1, two strings within edit distance 1 MUST share a member of
  * D(s) = {s} ∪ {s with one character deleted} — an insert shares the
  * original-vs-deleted form, a delete the reverse, a substitution the
  * both-deleted form at the edit position, and equality shares s itself.
  * So:
  *
  *   1. explode each distinct key into its ≤ len+1 deletion variants,
  *   2. hash-join variants with themselves on the variant string
  *      (canonicalized left < right so each pair lands once),
  *   3. verify surviving candidate pairs with one exact
  *      `levenshtein(l, r) <= k` — codegen'd, no UDF.
  *
  * The blocking is LOSSLESS (superset of the true result — step 3 never
  * re-adds, only trims over-generation like ab↔ba whose neighborhoods
  * intersect at distance 2), so the output equals the nested-loop
  * semantics exactly; an oracle can replay it as the naive cross join at
  * test scale. Cost is Σ(len+1) variant rows and candidate groups the
  * size of genuine signature collisions — shuffle-bound, never
  * quadratic. k > 1 would need the PassJoin segment scheme (neighborhood
  * size grows as len^k); rejected loudly rather than silently slow.
  */
object FuzzyJoin {

  /** All pairs of distinct values of `keyCol` within edit distance
    * `maxDist` (currently 1). Output: (left_key STRING, right_key
    * STRING) with left_key < right_key, each qualifying unordered pair
    * exactly once.
    */
  def edSelfJoin(df: DataFrame, keyCol: String, maxDist: Int = 1): DataFrame = {
    require(maxDist == 1,
      s"edSelfJoin supports maxDist=1 (deletion-neighborhood signatures); got $maxDist")
    val keys = df.select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .distinct()
    // D(s): the string itself plus every single-character deletion.
    // array_distinct keeps repeated-character strings from emitting the
    // same variant twice (e.g. "aa" deletes to "a" both ways).
    val variants = keys.select(col("k"),
      explode(array_distinct(concat(
        array(col("k")),
        expr("transform(sequence(0, length(k) - 1), i -> concat(substr(k, 1, i), substr(k, i + 2)))"))))
        .as("v"))
    val candidates = variants.as("a")
      .join(variants.as("b"), col("a.v") === col("b.v") && col("a.k") < col("b.k"))
      .select(col("a.k").as("left_key"), col("b.k").as("right_key"))
      .distinct()
    candidates.where(levenshtein(col("left_key"), col("right_key")) <= maxDist)
  }
}
