package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into fixed-token-budget bins — the
  * step that turns a filtered corpus into dense training sequences
  * (padding waste is pure lost FLOPs at pre-training scale).
  *
  * Packing is inherently sequential WITHIN a bin stream, so the
  * distributed contract is per-stratum: each stratum (source, shard,
  * hash bucket — anything the caller keys by) is packed independently
  * in deterministic doc-id order, and strata run in parallel. At 100 TB
  * the stratum column is a shard key with thousands of values, making
  * this a single sort-based `flatMapSortedGroups` pass: Spark's
  * secondary sort streams each group's docs through the fold in order
  * without materializing the group, and no stage ever holds more than a
  * partition of docs.
  */
object Packing {

  /** Padding-waste diagnostics by power-of-two length bucket: if each
    * doc were padded to its bucket's capacity (the fixed-shape batch a
    * naive loader builds), how many pad tokens does each bucket burn?
    * The numbers motivate [[packGreedy]] — packed bins waste
    * budget−fill, padded batches waste cap−len per doc. Pure integer
    * arithmetic over one scan + one tiny aggregate.
    */
  def lengthBuckets(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    docs.filter(col(idCol).isNotNull)
      .select(size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      // bucket cap = smallest power of two >= n_tokens, picked from an
      // integer candidate list — NOT ceil(log2(n)), whose fp log can
      // land a hair above an exact power and bump the bucket on one
      // engine but not the other. Docs beyond 2^20 tokens get NULL.
      .withColumn("cap", expr(
        """array_min(filter(transform(sequence(0, 20),
             p -> shiftleft(CAST(1 AS BIGINT), p)), c -> c >= n_tokens))"""))
      .groupBy("cap")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        (sum(col("cap")) - sum(col("n_tokens"))).as("pad_waste"))
      .orderBy("cap")
  }

  /** Greedy in-order packing: within each stratum, docs (ascending
    * `idCol`) accumulate into the current bin until the next doc would
    * overflow `budget`, which seals the bin and opens the next — the
    * standard streaming next-fit discipline (deterministic, one pass,
    * no cross-doc reordering, so document order within a bin is stable
    * provenance). A doc longer than `budget` gets a bin of its own, and
    * the stratum's first doc always lands in bin 0 — the same fold the
    * q_pack_greedy recursive-CTE oracle replays, for every input
    * including zero-token docs.
    *
    * Returns (stratum, doc_id, n_tokens, bin) — bin ids are dense longs
    * starting at 0 per stratum.
    */
  def packGreedy(docs: DataFrame, idCol: String, stratumCol: String,
                 tokensCol: String, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val in = docs.select(col(stratumCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .as[(String, Long, Long)]
    in.groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id")) { (stratum, it) =>
        var bin = 0L
        var fill = 0L
        var first = true
        it.map { case (_, docId, nTokens) =>
          if (first) { fill = nTokens; first = false }
          else if (fill + nTokens > budget) { bin += 1; fill = nTokens }
          else fill += nTokens
          (stratum, docId, nTokens, bin)
        }
      }
      .toDF("stratum", "doc_id", "n_tokens", "bin")
  }

  /** Bin-level summary of a [[packGreedy]] result: docs per bin, token
    * fill, and the padding waste against `budget` — the metric packing
    * exists to minimize.
    */
  def binStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("stratum", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("fill"))
      .withColumn("waste",
        greatest(lit(budget) - col("fill"), lit(0L)).cast("long"))
}
