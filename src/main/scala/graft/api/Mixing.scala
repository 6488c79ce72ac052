package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic source mixing: per-stratum keep rates, the mixture
  * step of an LLM data pipeline (upsample the curated sources,
  * downsample the crawl). Selection is a Knuth multiplicative hash on
  * the id against a per-stratum integer threshold, so it is
  * reproducible on any engine, cluster size, and partitioning; it
  * pushes down to the scan as a plain predicate (no shuffle, no RNG
  * state); and it composes with incremental rebuilds — a document's
  * fate never depends on the rest of the corpus.
  */
object Mixing {

  private val M = 4294967296L // 2^32
  private val A = 2654435761L // Knuth multiplicative constant

  /** Integer threshold for a keep rate — computed ONCE driver-side so
    * the Spark predicate and any mirrored SQL compare against the same
    * literal (a runtime double->long cast rounds differently across
    * engines).
    */
  def threshold(rate: Double): Long =
    math.floor(rate * M).toLong.max(0L).min(M)

  /** Keep each row of stratum s with probability rates(s) (exact in
    * expectation; the SAME rows are chosen everywhere). Strata missing
    * from `rates` fall back to defaultRate.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val thresh: Column = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(threshold(defaultRate))) { case (acc, (k, r)) =>
        when(col(stratumCol) === k, lit(threshold(r))).otherwise(acc)
      }
    df.filter(pmod(col(idCol) * lit(A), lit(M)) < thresh)
  }
}
