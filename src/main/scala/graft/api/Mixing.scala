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

  /** (id * A) mod 2^32 without 64-bit overflow: reduce id mod 2^32,
    * split it into 16-bit halves, and combine the partial products mod
    * 2^32 — every intermediate stays under ~2^49, so the expression is
    * safe under ANSI mode (and in any mirrored SQL) for the full BIGINT
    * id range. A plain `id * A` overflows Long once id ≥ ~3.5e9, which
    * 64-bit snowflake-style ids reach routinely.
    */
  private[graft] def knuthHash(id: Column): Column = {
    val x = pmod(id, lit(M))
    val xh = shiftright(x, 16) // upper 16 bits (x < 2^32, nonnegative)
    val xl = pmod(x, lit(65536L)) // lower 16 bits
    pmod(pmod(xh * lit(A), lit(M)) * lit(65536L) + xl * lit(A), lit(M))
  }

  /** The same split-multiply hash as SQL text, for mirrored oracles. */
  def knuthHashSql(idExpr: String): String =
    s"((((($idExpr % $M) // 65536) * $A) % $M * 65536 + " +
      s"(($idExpr % $M) % 65536) * $A) % $M)"

  /** Temperature-scaled keep rates (the α-mix of LLM data recipes:
    * target share of source s ∝ count_s^α): α = 1 reproduces the
    * natural mixture (every rate 1), α = 0 equalizes sources, and
    * 0 < α < 1 upsamples low-resource sources RELATIVE to the crawl.
    * Rates are scaled so the binding source keeps everything (no
    * needless data loss); computed driver-side from the per-source
    * counts — bounded metadata, #sources values — so the thresholds
    * are embeddable literals, same as [[threshold]].
    */
  def temperatureRates(counts: Map[String, Long],
                       alpha: Double): Map[String, Double] = {
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "temperatureRates needs positive per-source counts")
    require(alpha >= 0.0 && alpha <= 1.0, // also rejects NaN
      s"alpha must be in [0, 1], got $alpha")
    // the normalizing constant z cancels in w/wMax — dividing by it
    // anyway adds per-source rounding that breaks the alpha=1 =>
    // exactly-1.0 invariant (pow(n,1)=n and n/n=1 are IEEE-exact;
    // n/z/n is not). Divide by wMax directly: w/w == 1.0 exactly.
    val perDoc = counts.map { case (s, n) =>
      s -> math.pow(n.toDouble, alpha) / n
    }
    val wMax = perDoc.values.max
    perDoc.map { case (s, w) => s -> (w / wMax).min(1.0) }
  }

  /** Deterministic dataset split (train/val/test and friends): each row
    * lands in the split whose cumulative-weight interval contains its
    * Knuth hash — the same reproducibility contract as
    * [[stratifiedSample]] (engine-, partitioning-, and rerun-stable; a
    * doc's split never depends on the rest of the corpus, so
    * incremental corpus growth never reshuffles existing assignments).
    * Weights must sum to 1 (±1e-9); boundaries are the driver-computed
    * integer thresholds of the cumulative sums, so any mirrored SQL
    * compares the same literals.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "assignSplit needs positive split weights")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    df.withColumn("split",
      splitAssignExpr(knuthHash(col(idCol)), splits))
  }

  /** Polynomial rolling hash of a string column (base 31 mod 2³²) — an
    * engine-replayable group key: a fold of exact small integers in
    * character order, identical in any SQL dialect's list_reduce. The
    * zero seed is equivalent to seeding with the first char code
    * (0·31 + c = c), which is what a seedless fold does — so both
    * conventions agree.
    */
  private[graft] def polyHash(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch), lit(M)))

  /** SQL mirror of [[polyHash]] for oracles. */
  def polyHashSql(strExpr: String): String =
    s"list_reduce(list_transform(string_split($strExpr, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT)), (a, b) -> (a * 31 + b) % $M)"

  /** Deterministic fractional upsampling — materialize a "N epochs of
    * source X" recipe: every doc of a source with rate r repeats
    * floor(r) times, plus once more for the Knuth-hash-selected
    * fraction frac(r) of its ids (rate < 1 therefore downsamples:
    * base 0 + probabilistic keep). Output rows carry `rep` (0-based
    * repeat index) so the expanded corpus keeps a unique (id, rep)
    * key for downstream shuffling/packing. Pure map-side: the repeat
    * count is a per-row expression, the expansion an explode —
    * zero shuffle, deterministic, incremental-safe (a doc's repeats
    * never depend on the rest of the corpus).
    */
  def upsample(df: DataFrame, idCol: String, srcCol: String,
               rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty && rates.values.forall(r => r >= 0 && !r.isNaN),
      "upsample needs nonnegative rates")
    val base = rates.foldLeft(lit(1L)) { case (acc, (s, r)) =>
      when(col(srcCol) === s, lit(math.floor(r).toLong)).otherwise(acc)
    }
    // per-source fractional threshold as an exact integer literal
    // (driver-side, the [[threshold]] rule) so any mirrored SQL
    // compares against the same number
    val thr = rates.foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(srcCol) === s,
        lit(threshold(r - math.floor(r)))).otherwise(acc)
    }
    df.withColumn("__n",
        base + when(knuthHash(col(idCol)) < thr, 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .withColumn("rep", explode(expr("sequence(0L, __n - 1)")))
      .drop("__n")
  }

  /** Leakage-safe dataset split: every row of a GROUP (domain,
    * source, near-dup cluster id) lands in the SAME split, because the
    * interval test hashes the group key, not the row id — the standard
    * guard against train/test contamination through near-duplicates or
    * same-site pages that row-level [[assignSplit]] cannot give.
    * Deterministic and incremental-safe like its sibling: a group's
    * split never depends on the rest of the corpus.
    */
  def groupAwareSplit(df: DataFrame, groupCol: String,
                      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "groupAwareSplit needs positive split weights")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    df.withColumn("split",
      splitAssignExpr(knuthHash(polyHash(col(groupCol))), splits))
  }

  /** Train/test contamination audit: near-duplicate pairs whose
    * members landed in DIFFERENT splits — the leakage row-level
    * splitting invites and [[groupAwareSplit]] exists to prevent.
    * `pairs` is any near-dup pair frame (doc_a, doc_b); `assigned` any
    * (id, split) assignment (e.g. [[assignSplit]] output). Returns one
    * row per unordered split pair with the crossing-pair count — the
    * decision table for "re-split group-aware or dedup before
    * splitting". A pair member MISSING from the assignment surfaces as
    * the reserved split name "unassigned" instead of silently dropping
    * the pair — an audit must never report zero leakage because the
    * caller passed a filtered assignment (inner joins here were the
    * false-negative mode). Scale shape: two id-key joins of the pair
    * set against the assignment (cache `assigned` if scanning it twice
    * matters); the pair side is the near-dup OUTPUT — orders of
    * magnitude smaller than the corpus, AQE broadcasts it — so no
    * corpus-side shuffle.
    */
  def splitLeakage(pairs: DataFrame, assigned: DataFrame, idCol: String,
                   splitCol: String = "split"): DataFrame = {
    val a = assigned.select(col(idCol).as("doc_a"), col(splitCol).as("__sa"))
    val b = assigned.select(col(idCol).as("doc_b"), col(splitCol).as("__sb"))
    pairs.select("doc_a", "doc_b")
      .join(a, Seq("doc_a"), "left").join(b, Seq("doc_b"), "left")
      .select(coalesce(col("__sa"), lit("unassigned")).as("__sa"),
        coalesce(col("__sb"), lit("unassigned")).as("__sb"))
      .filter(col("__sa") =!= col("__sb"))
      .select(least(col("__sa"), col("__sb")).as("split_a"),
        greatest(col("__sa"), col("__sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_leaked"))
  }

  /** Shared interval fold: earlier splits win; the last is the else. */
  private def splitAssignExpr(h: Column,
                              splits: Seq[(String, Double)]): Column = {
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .tail.map(threshold)
    splits.map(_._1).zip(bounds).init
      .foldRight(lit(splits.last._1): Column) { case ((name, b), rest) =>
        when(h < b, lit(name)).otherwise(rest)
      }
  }

  /** The split-boundary thresholds, for mirrored oracle SQL. */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[(String, Long)] = {
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .tail.map(threshold)
    splits.map(_._1).zip(bounds)
  }

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
    df.filter(knuthHash(col(idCol)) < thresh)
  }

  /** Deterministic per-source downsampling to a TOKEN budget — the
    * mixture op actual recipes specify ("200B tokens of crawl, 30B of
    * code, all of wiki") where rate-based sampling can only approximate
    * it. Documents stream per source in Knuth-hash order (an unbiased
    * but fully deterministic shuffle of each source — the same fairness
    * argument as [[stratifiedSample]], id-ties broken by id) and are
    * kept while the running token sum stays ≤ the source's budget; the
    * first over-budget document is the cut. Sources absent from
    * `budgets` keep everything. NULL token counts are treated as 0
    * (the doc is kept and costs nothing) — coalesced UP FRONT, so a
    * null-token doc's membership never depends on where it lands in
    * hash order (a raw windowed sum would emit a NULL running sum until
    * the first non-null doc and silently drop whatever streamed first).
    *
    * Scale shape: TWO-PHASE running sum, parallel within each source.
    * A source's rows are cut into `slices` contiguous spans of the
    * Knuth-hash order by FIXED hash thresholds (slice = h·S div 2³² —
    * deterministic, no sampled range boundaries, stable under
    * recomputation). Phase 1 hash-aggregates per-(source, slice) token
    * totals — bounded driver metadata, |sources|·S rows, the same
    * collect-bounded-metadata pattern as [[temperatureRates]] — and an
    * exclusive prefix over slice order gives each slice its starting
    * offset. Phase 2 windows ONLY within (source, slice), adds the
    * slice offset, and filters: identical running sums, but the sort
    * task is 1/S of a source, never the whole source — the
    * single-task-per-source window this replaces owned ALL of a
    * "200B tokens of crawl" source in one task. Unbudgeted sources
    * bypass the machinery entirely (kept verbatim, zero shuffle).
    * Exact integer arithmetic all the way: every engine keeps the
    * identical document set.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, srcCol: String,
                        tokenCol: String,
                        budgets: Map[String, Long],
                        slices: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(slices >= 1, s"slices must be >= 1, got $slices")
    Seq("__cum", "__h", "__tok", "__slice", "__off").foreach(c =>
      require(!df.columns.contains(c),
        s"tokenBudgetSample uses '$c' internally; rename that input column"))
    if (budgets.isEmpty) return df
    val spark = df.sparkSession
    val keep = df.columns.map(col).toSeq

    // PERSISTED, and eagerly so: phase 1 collects from this frame at
    // construction time (an eager job — callers building the frame
    // speculatively pay that scan), and phase 2 windows over the SAME
    // materialization. Without the persist the two phases would
    // evaluate the input independently, and any non-determinism in it
    // (a re-resolved view, rand()-derived tokens) would give phase-2
    // running sums that no longer match the phase-1 offsets — silently
    // wrong membership instead of a well-defined sample.
    val budgeted = Pins.pin(df
      .filter(col(srcCol).isin(budgets.keys.toSeq: _*))
      .withColumn("__h", knuthHash(col(idCol)))
      .withColumn("__tok", coalesce(col(tokenCol).cast("long"), lit(0L)))
      .withColumn("__slice", expr(s"(__h * $slices) div $M"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // phase 1: per-(source, slice) token totals — |sources|·S rows of
    // driver metadata — then an exclusive prefix over slice order
    val offsets = budgeted
      .groupBy(col(srcCol).cast("string").as("__s"), col("__slice"))
      .agg(sum(col("__tok")).as("t"))
      .collect()
      .groupBy(_.getString(0))
      .toSeq
      .flatMap { case (src, rows) =>
        rows.sortBy(_.getLong(1))
          .scanLeft((src, -1L, 0L, 0L)) { case ((_, _, acc, t0), r) =>
            (src, r.getLong(1), acc + t0, r.getLong(2))
          }
          .tail.map { case (s, sl, off, _) => (s, sl, off) }
      }
    import spark.implicits._
    val offDf = offsets.toDF("__s", "__slice", "__off")
    val budget: Column = budgets.toSeq.sortBy(_._1)
      .foldLeft(lit(Long.MaxValue)) { case (acc, (k, b)) =>
        when(col(srcCol) === k, lit(b)).otherwise(acc)
      }
    // phase 2: running sum within (source, slice) only — a task owns at
    // most ~1/S of a source — plus the driver-computed slice offset
    val w = Window.partitionBy(col(srcCol), col("__slice"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sampled = budgeted
      .join(broadcast(offDf), // bounded: |sources|·S rows
        col(srcCol).cast("string") === col("__s") &&
          budgeted("__slice") === offDf("__slice"), "inner")
      .drop(offDf("__slice")).drop("__s")
      .withColumn("__cum", col("__off") + sum(col("__tok")).over(w))
      .filter(col("__cum") <= budget)
      .select(keep: _*)
    df.filter(!col(srcCol).isin(budgets.keys.toSeq: _*) ||
        col(srcCol).isNull)
      .select(keep: _*)
      .unionAll(sampled)
  }
}
