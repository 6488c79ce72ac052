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

  /** Packed TOKEN-STREAM construction — the final artifact of a
    * training-data pipeline: the corpus's BPE id stream (docs in id
    * order, each doc's ids in word/token order) chunked into
    * fixed-`seqLen` training sequences, exactly the .bin-shard layout a
    * trainer memory-maps. Documents concatenate back-to-back (a
    * sequence may span docs and a doc may span sequences — the standard
    * pretraining packing; `n_docs` per sequence records the boundary
    * count an attention-separator pass would consume). Output is a
    * per-sequence digest rather than the raw stream: token count, doc
    * count, first/last ids, and an ORDER-SENSITIVE integer checksum
    * (Σ (pos+1)·token_id — any reordering or substitution inside a
    * sequence changes it), so an oracle pins the entire stream at
    * |stream|/seqLen rows.
    *
    * Scale shape: the global token offset of each doc is a TWO-PHASE
    * prefix (the [[Mixing.tokenBudgetSample]] discipline) — docs bucket
    * into `slices` contiguous id ranges, phase 1 collects the S
    * per-slice totals (bounded driver metadata) into exclusive slice
    * offsets, phase 2 windows only WITHIN a slice, so no task ever owns
    * the corpus-wide running sum. Per-doc token indexes come from a
    * per-doc window (bounded by doc length). The id stream itself is
    * produced once ([[TextAnalysis.bpeEncode]]'s vocab-side encode) and
    * joined to the offsets on the id key.
    */
  /** Deterministic seeded shuffle order over packed training sequences
    * (or any keyed frame): `shuffle_pos` = the rank of each row under
    * (hash(seed:id), id) — the epoch-reproducible permutation a trainer
    * applies to .bin-shard sequences so adjacent corpus text does not
    * land in adjacent batches. The hash is the engine-replayable base-31
    * polynomial fold composed with the Knuth multiplicative mix
    * ([[Mixing.polyHashSql]] / [[Mixing.knuthHashSql]] mirror both
    * stages), so an oracle replays the FULL permutation, and re-running
    * with the same seed reproduces it bit-for-bit; a new seed is a new
    * epoch order.
    *
    * Scale shape: a global contiguous rank is inherently a total order,
    * so it uses the two-phase prefix discipline ([[packTokenStream]]'s
    * slice trick) on the HASH space: rows bucket into `slices`
    * contiguous hash ranges (the hash is uniform, so slices balance),
    * phase 1 collects S per-slice counts into exclusive offsets
    * (bounded driver metadata), phase 2 ranks only WITHIN a slice — no
    * task ever owns a corpus-wide sort.
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Long,
                   slices: Int = 64,
                   validateUnique: Boolean = false): DataFrame = {
    // CONTRACT: idCol must be unique — it is the tiebreak that makes
    // the rank a total order. With duplicate ids the positions among
    // the duplicates become partition-dependent, silently breaking the
    // epoch-reproducibility promise. `validateUnique = true` enforces
    // it with one extra aggregation over the already-persisted hash
    // frame (count == count_distinct — cheap relative to the two-phase
    // rank itself); it is opt-in because at 100 TB callers feeding ids
    // from a primary key should not pay a corpus-wide distinct per
    // epoch.
    require(slices >= 1, s"slices must be >= 1, got $slices")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // 2^32 = the polyHash modulus — slice width is known a priori, no
    // stats pass over the data
    val w = 4294967296L / slices + 1
    // polyHash alone is order-preserving on short strings (it never
    // wraps 2^32 below ~7 chars) — compose with the Knuth multiplicative
    // mix so nearby ids scatter; both stages have exact SQL mirrors
    val s0 = Pins.pin(df
      .withColumn("__h", graft.api.Mixing.knuthHash(
        graft.api.Mixing.polyHash(
          concat(lit(s"$seed:"), col(idCol).cast("string")))))
      .withColumn("__slice", expr(s"__h div $w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    if (validateUnique) {
      val r = s0.agg(count(lit(1)).as("n"),
        countDistinct(col(idCol)).as("d")).head()
      require(r.getLong(0) == r.getLong(1),
        s"shuffleOrder requires unique $idCol values: " +
          s"${r.getLong(0)} rows but only ${r.getLong(1)} distinct ids")
    }
    val sliceOff = s0.groupBy("__slice").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .scanLeft((-1L, 0L, 0L)) { case ((_, acc, n0), (sl, n)) =>
        (sl, acc + n0, n)
      }
      .tail.map { case (sl, off, _) => (sl, off) }
      .toSeq.toDF("__slice", "__soff")
    val wd = Window.partitionBy("__slice")
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    s0.join(broadcast(sliceOff), "__slice")
      .withColumn("shuffle_pos",
        col("__soff") + coalesce(sum(lit(1L)).over(wd), lit(0L)))
      .drop("__h", "__slice", "__soff")
  }

  def packTokenStream(docs: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)], seqLen: Int,
                      slices: Int = 64): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(slices >= 1, s"slices must be >= 1, got $slices")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    // bpeEncode normalizes the id column name to doc_id — every
    // downstream reference uses THAT, so any caller idCol works
    val enc = graft.api.TextAnalysis.bpeEncode(docs, idCol, textCol, merges)
    val encIdx = Pins.pin(enc
      .withColumn("in_doc", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("word_idx"),
            col("tok_idx")))
        .cast("long") - 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val stats = docs.agg(max(col(idCol).cast("long")),
      min(col(idCol).cast("long")), count(lit(1))).head()
    if (stats.getLong(2) == 0L)
      return spark.range(0).select(col("id").as("seq_id"),
        col("id").as("n_tokens"), col("id").as("n_docs"),
        col("id").as("first_id"), col("id").as("last_id"),
        col("id").as("checksum"))
    // a nonempty corpus whose ids all cast to NULL must fail loudly,
    // not silently produce an empty shard set
    require(!stats.isNullAt(0),
      s"packTokenStream: no $idCol value casts to BIGINT")
    require(stats.getLong(1) >= 0L,
      s"packTokenStream needs nonnegative ids, got min ${stats.getLong(1)}")
    // contiguous id-range slices via fixed width (width from max id —
    // no id·slices product to overflow; nonnegative ids guarantee a
    // positive width and ascending slice order)
    val w = stats.getLong(0) / slices + 1
    val counts = encIdx.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__slice", expr(s"CAST(doc_id AS BIGINT) div $w"))
    // phase 1: per-slice totals -> exclusive slice offsets (S rows)
    val sliceOff = counts.groupBy("__slice").agg(sum(col("n")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
      .scanLeft((-1L, 0L, 0L)) { case ((_, acc, t0), (sl, t)) =>
        (sl, acc + t0, t)
      }
      .tail.map { case (sl, off, _) => (sl, off) }
      .toSeq.toDF("__slice", "__soff")
    // phase 2: exclusive prefix WITHIN a slice only
    val wd = Window.partitionBy("__slice").orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val docOff = counts.join(broadcast(sliceOff), "__slice")
      .withColumn("doc_off",
        col("__soff") + coalesce(sum(col("n")).over(wd), lit(0L)))
      .select(col("doc_id"), col("doc_off"))
    encIdx.join(docOff, "doc_id")
      .withColumn("gpos", col("doc_off") + col("in_doc"))
      .withColumn("seq_id", expr(s"gpos div $seqLen"))
      .withColumn("pos", expr(s"gpos % $seqLen"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("doc_id")).as("n_docs"),
        min_by(col("token_id"), col("pos")).as("first_id"),
        max_by(col("token_id"), col("pos")).as("last_id"),
        sum((col("pos") + lit(1L)) * col("token_id")).as("checksum"))
  }
}
