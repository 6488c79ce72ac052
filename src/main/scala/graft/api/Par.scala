package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Input-width repair for CPU-DENSE per-row transforms (gram/shingle
  * explosion, normalization+hashing, vector math): parquet byte-range
  * splits bottom out at row-group granularity, so a small
  * single-row-group corpus file arrives as 1-2 partitions no matter
  * `spark.sql.files.maxPartitionBytes` — and a transform whose CPU is
  * 100-1000x the scan cost then runs on 1-2 of N cores (profiled at
  * sf≈1: a 17 s single-core bigram profile, a 3.5 s single-task random
  * projection, a 10 s normalize+hash). [[spread]] round-robins such
  * inputs across the session's parallelism ONLY when the input is a
  * narrow raw scan; on an already-wide input — the 100 TB case, where
  * paying a corpus-wide shuffle to "spread" thousands of existing
  * splits would be the real mistake — it is a no-op. Callers must be
  * partitioning-insensitive (every oracle-checked operator here is by
  * construction; the hash compare would catch a violation).
  */
object Par {

  /** The session's effective shuffle width — ONE accessor (FuzzyJoin's
    * fan-out and the hot-shingle salt share the same lookup), reading
    * the resolved SQLConf value so a session that never set the conf
    * sees Spark's real default, not a hand-rolled fallback.
    */
  private[graft] def shuffleWidth(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Scan-shaped = a leaf (file scan / local / cached relation) under
    * only per-row operators. Anything with a shuffle boundary below
    * (join, aggregate, window, sort, repartition) already runs at the
    * session's shuffle width, so spreading it would be a pure extra
    * exchange — and, worse, PROBING it would be: with AQE on,
    * `df.rdd` materializes every upstream query stage eagerly at
    * plan-construction time, and those stages re-run in the real job
    * (no exchange reuse across separate QueryExecutions). Gating the
    * probe on plan SHAPE keeps it a pure metadata walk: on a raw scan
    * `.rdd` builds the RDD from the file listing without running
    * anything, which is the only case we probe.
    */
  private def scanShaped(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case u: Union => u.children.forall(scanShaped)
    // note: Deduplicate/Distinct is NOT traversed — it plans as an
    // aggregate exchange, i.e. exactly the "already wide, and probing
    // would materialize stages" case the gate exists to skip
    case _: Project | _: Filter | _: SubqueryAlias =>
      scanShaped(p.children.head)
    case _ => false
  }

  private[graft] def spread(df: DataFrame): DataFrame = {
    if (!scanShaped(df.queryExecution.optimizedPlan)) return df
    val want = shuffleWidth(df)
    // strict `< want`, not `< want/2`: the scan's partition COUNT
    // overstates effective parallelism for row-group-sparse files —
    // Spark byte-range-splits a 6 MB single-row-group file into 2
    // splits of which only one (the one holding the row-group
    // midpoint) reads anything, so p=2 measured as ONE busy core.
    // For the dense transforms this guards, full width is worth one
    // narrow-input shuffle whenever the scan is at all under it.
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  /** SIZE-DERIVED input spread for CPU-dense transforms that feed a
    * PERSISTED multi-consumer frame (round 22, the gated retry of the
    * two r21 measured-and-reverted sites). Full session width is the
    * wrong target there: the cached layout inherits the spread width,
    * and r21 measured the 241-query concurrent suite +6 s / +30 s
    * executor CPU when the 11 MB shingle cache materialized at 32
    * partitions (every downstream first stage = 32 tasks of slot
    * pressure). But the raw scan width is wrong for the transform
    * itself: a row-group-sparse replica file reads as 1-2 busy cores
    * under a pass whose CPU is 100-1000x the scan cost (sf1 solo:
    * 12.0 s). Width = input bytes / `denseSplitBytes`, clamped to
    * [scan partitions, session width]. The split target is COMPRESSED
    * input bytes (what plan stats carry): 512 KB of snappy parquet is
    * ~2-4 MB of text, a few hundred ms of shingle/hash work per task
    * — so the sf0.1 suite's 0.6 MB table stays a NO-OP (no exchange,
    * suite provably unchanged), the 6.7 MB sf1 replica spreads
    * ~13-way (the solo win), and a real corpus-wide scan is already
    * at/above the session-width clamp — a no-op like [[spread]] (the
    * p >= want early-exit, so the constant never fans out a 100 TB
    * scan). Same plan-shape gate: only raw scans are probed.
    */
  private[graft] def spreadDense(df: DataFrame,
                                 denseSplitBytes: Long = 512L << 10): DataFrame = {
    if (!scanShaped(df.queryExecution.optimizedPlan)) return df
    val want = shuffleWidth(df)
    val p = df.rdd.getNumPartitions
    if (p >= want) return df
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes = (bytes / denseSplitBytes).min(BigInt(want)).toInt
    if (byBytes <= p) df else df.repartition(byBytes)
  }
}
