package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream (Cormode & Muthukrishnan '05):
  * `depth` hash rows of `width` counters, point estimate = min over the
  * rows of the bucket the term hashes to. The sketch itself is a tiny
  * (depth × width)-row DataFrame, so at corpus scale it is the thing you
  * persist/broadcast while the token stream is seen exactly once — the
  * heavy-hitter / frequency-probe primitive that HLL (cardinality) and
  * approx-quantile (rank) sketches don't cover.
  *
  * The reference delegates this family to DuckDB's approximate aggregates
  * (/root/reference/src/shelf/tables.py:164-177, `approx_count_distinct`
  * reachable through the SQL step). Here the sketch is first-class and,
  * unlike an opaque binary sketch, AUDITABLE: the row hash is
  * sha256-derived (top 32 bits of sha256("<seed>|<term>")), so any engine
  * — and the DuckDB oracle — reproduces bucket assignment bit-for-bit,
  * the same technique as [[Dedup.simhashPairs]]'s auditable token hash.
  *
  * Scale shape: tokens are aggregated to distinct-term frequencies FIRST
  * (one shuffle of the token stream), and only the distinct terms are
  * replicated `depth`× into the (seed, bucket) aggregation — the blow-up
  * rides on |vocabulary|, not corpus tokens. Merging sketches from two
  * corpora is `union → groupBy(seed, bucket) → sum(n)`.
  */
object Sketches {

  /** Bucket of `term` under hash row `seed`: top 8 hex chars of
    * sha256("<seed>|<term>") (an exact 32-bit value) mod `width`.
    * Never negative, so `%` and `pmod` agree. Shared by the count-min
    * rows and the Bloom bit positions — one auditable hash family.
    */
  private[graft] def cmsBucket(seed: Column, term: Column, width: Int): Column =
    conv(substring(sha2(concat_ws("|", seed.cast("string"), term), 256), 1, 8),
      16, 10).cast("long") % width

  /** Build the (seed, bucket, n) sketch of the whitespace tokens of
    * `textCol`. Output is depth × width rows at most.
    */
  def cmsSketch(docs: DataFrame, textCol: String,
                depth: Int = 4, width: Int = 256): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .select(col("term"), col("tf"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .groupBy(col("seed"),
        cmsBucket(col("seed"), col("term"), width).as("bucket"))
      .agg(sum(col("tf")).as("n"))

  /** Point-estimate the frequency of each probe term against a sketch
    * built with the same (depth, width). Estimates never underestimate;
    * a term whose bucket row is absent (possible only when the bucket
    * held no mass at all) estimates 0 via the left join.
    */
  def cmsEstimate(sketch: DataFrame, terms: Seq[String],
                  depth: Int = 4, width: Int = 256): DataFrame = {
    require(terms.nonEmpty, "cmsEstimate needs at least one probe term")
    val s = sketch.sparkSession
    val probes = s.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(col("term"),
        explode(sequence(lit(0), lit(depth - 1))).as("seed"))
      .withColumn("bucket", cmsBucket(col("seed"), col("term"), width))
    probes.join(broadcast(sketch), Seq("seed", "bucket"), "left") // bounded: depth x width rows
      .groupBy("term")
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
      .orderBy("term")
  }

  /** Bloom filter of the distinct whitespace tokens of `textCol`:
    * `hashes` bit positions per term in a `bits`-wide array, stored as
    * the ≤ `bits`-row set of SET positions (a sparse bitmap any engine
    * can audit; a dense long[] packing is a representation choice, not
    * a semantic one). Membership has NO false negatives by
    * construction; false-positive odds follow the standard
    * (1-e^(-kn/m))^k. Merge of two corpora's filters = union+distinct.
    * The classic pre-join pruning artifact: broadcast the filter and
    * drop probe-side rows whose key can't be present before any
    * shuffle reaches the big side.
    */
  def bloomSketch(docs: DataFrame, textCol: String,
                  bits: Int = 4096, hashes: Int = 3): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term")).distinct()
      .select(col("term"),
        explode(sequence(lit(0), lit(hashes - 1))).as("seed"))
      .select(cmsBucket(col("seed"), col("term"), bits).as("pos"))
      .distinct()

  /** Auditable approximate distinct count via linear counting
    * (Whang et al. '90): hash distinct terms into `bits` buckets, count
    * occupied buckets V, estimate = m·ln(m/(m−V)). Unlike HLL (whose
    * register layout is engine-internal — q_approx_distinct stays
    * rows-only for that reason), every piece here is replayable by any
    * engine: the sha256 bucket family, the integer occupancy count,
    * and one ln rounded at 6dp before the exact integer multiply.
    * Accurate while n ≲ m (choose m ≫ expected cardinality; at m = n
    * the estimator saturates and the occupancy itself is the signal).
    * Returns one row (m, occupied, est).
    */
  def linearCountDistinct(docs: DataFrame, textCol: String,
                          bits: Int = 4096): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("term"))
      .select(cmsBucket(lit(0), col("term"), bits).as("pos"))
      .agg(count_distinct(col("pos")).as("occupied"))
      .select(lit(bits.toLong).as("m"), col("occupied"),
        when(col("occupied") < bits,
          round(lit(bits.toDouble) *
            round(log(lit(bits.toDouble) / (lit(bits) - col("occupied"))), 6), 4))
          .otherwise(lit(null).cast("double")).as("est"))

  /** Membership probe: `maybe` is true iff ALL `hashes` positions of
    * the term are set (a repeated position still needs only itself
    * set — each probe row matches the single stored bit).
    */
  def bloomContains(bloom: DataFrame, terms: Seq[String],
                    bits: Int = 4096, hashes: Int = 3): DataFrame = {
    require(terms.nonEmpty, "bloomContains needs at least one probe term")
    val s = bloom.sparkSession
    val probes = s.createDataFrame(terms.map(Tuple1(_))).toDF("term")
      .select(col("term"),
        explode(sequence(lit(0), lit(hashes - 1))).as("seed"))
      .select(col("term"), cmsBucket(col("seed"), col("term"), bits).as("pos"))
    probes.join(broadcast(bloom.withColumn("hit", lit(1))), Seq("pos"), "left") // bounded: <= bits rows
      .groupBy("term")
      .agg((count(col("hit")) === hashes).as("maybe"))
      .orderBy("term")
  }
}
