package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how far did each user
  * progress through `steps` (in order, first match wins), with the
  * whole funnel constrained to `windowMicros` of its first step — the
  * view→cart→purchase staple of product analytics (the reference's
  * users would hand-write this in SQL against the DuckDB layer,
  * /root/reference/src/shelf/tables.py:164-177; here it is one scan +
  * one shuffle at any scale).
  *
  * Scale + determinism shape: events fold PER USER in sorted order via
  * `flatMapSortedGroups` — Spark's sort-based secondary sort streams
  * each user's events through the fold WITHOUT materializing them, so a
  * power user (or bot) with 10⁷–10⁸ events costs sort spill, never task
  * memory (the earlier `sort_array(collect_list(...))` formulation
  * built the whole per-user array in one task). Both the sort key and
  * the fold state are exact BIGINT encodings — event = ts_micros·4 +
  * step_idx, state = (stage, first_step_ts) — so every comparison is
  * integer arithmetic any engine reproduces bit-for-bit (no timestamp,
  * struct, or fp semantics in the hot path). Timestamps must be ≥ the
  * epoch: negative micros would break the `% 4` step extraction and the
  * truncating `div 4` timestamp recovery, so the fold REJECTS them
  * loudly (IllegalArgumentException) instead of reporting stage 0.
  */
object Funnels {

  /** Internal: group key is the user column cast to string (one stable
    * typed encoder for any input key type), cast back to the input
    * column's exact DataType on output so the schema is unchanged.
    * Lossless for integral and string keys — the realistic domain of a
    * user id (fp keys round-trip only when their string form does,
    * which is also the only regime where grouping them makes sense at
    * all). A NULL user id stays a group of its own (String encoders and
    * groupByKey are null-safe), matching GROUP BY semantics.
    */
  private def userKey(userCol: String): Column =
    col(userCol).cast("string").as("uk")

  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame = {
    // step index rides in the low 2 bits of the encoding; 2 bits bound
    // the funnel at 4 steps, and 62 bits of non-negative micros·4 stay
    // clear of the sign bit until year ~148000
    require(steps.nonEmpty && steps.size <= 4,
      s"funnelStages encodes the step index in 2 bits; got ${steps.size} steps")
    require(windowMicros > 0, "windowMicros must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val userType = events.schema(userCol).dataType
    val nSteps = steps.size.toLong
    val idx: Column = steps.zipWithIndex
      .foldLeft(lit(-1L): Column) { case (acc, (st, i)) =>
        when(col(typeCol) === st, lit(i.toLong)).otherwise(acc)
      }
    events.filter(col(typeCol).isin(steps: _*))
      .select(userKey(userCol),
        (unix_micros(col(tsCol)) * 4 + idx).as("enc"))
      // null-ELEMENT skip only (collect_list parity: a null-ts event
      // contributes nothing, but the user's group row still exists)
      .filter(col("enc").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("enc")) { (uk, it) =>
        var stage = 0L
        var t0 = 0L
        it.foreach { case (_, x) =>
          if (x < 0L) throw new IllegalArgumentException(
            s"funnelStages: pre-epoch timestamp for user $uk (enc=$x); " +
              "the BIGINT step encoding requires ts >= 1970-01-01")
          if (stage < nSteps && x % 4L == stage &&
              (stage == 0L || x / 4L - t0 <= windowMicros)) {
            if (stage == 0L) t0 = x / 4L
            stage += 1L
          }
        }
        Iterator((uk, stage))
      }
      .toDF("uk", "stage")
      .select(col("uk").cast(userType).as("user_id"), col("stage"))
  }

  /** Per-stage user counts: how many users stalled at each depth. */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame =
    funnelStages(events, userCol, tsCol, typeCol, steps, windowMicros)
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")

  /** Per-key exponentially-weighted moving average over time order,
    * α = 1/2: s_t = (x_t + s_{t-1}) / 2 — the halving is an exact IEEE
    * exponent decrement, so the only rounding is the addition, which
    * every engine performs identically in the same fold order. The
    * general-α EWMA multiplies by irrational weights whose cross-engine
    * last-ulp drift compounds; α = 1/2 (and any 2^-k) is the
    * determinism-safe smoothing an oracle-checked pipeline can carry.
    * Same scale shape as [[funnelStages]]: one user_id shuffle, a
    * STREAMED per-user sorted fold (secondary sort — no per-user array,
    * so event-count skew cannot OOM a task). Events are ordered by
    * (t, v), matching the lexicographic struct sort the oracle replays.
    * Returns (user_id, n_events, ewma).
    */
  def ewmaHalf(events: DataFrame, userCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val userType = events.schema(userCol).dataType
    events
      .select(userKey(userCol),
        unix_micros(col(tsCol)).as("t"), col(valueCol).cast("double").as("v"))
      // events with a null timestamp or value are EXCLUDED from the
      // fold (documented semantic: the old array formulation would
      // instead propagate null through the whole EWMA, which loses the
      // user's entire smoothed value to one bad row). Null USERS keep
      // their group.
      .filter(col("t").isNotNull && col("v").isNotNull)
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("t"), col("v")) { (uk, it) =>
        var n = 0L
        var s = 0.0
        it.foreach { case (_, _, v) =>
          s = if (n == 0L) v else (v + s) / 2.0
          n += 1L
        }
        Iterator((uk, n, s))
      }
      .toDF("uk", "n_events", "ewma")
      .select(col("uk").cast(userType).as("user_id"), col("n_events"),
        round(col("ewma"), 6).as("ewma"))
  }

  /** Cohort retention matrix: users cohorted by first-active epoch week
    * (integer `unix_micros div week` — calendar-convention-free, so any
    * engine buckets identically), counted per week offset since the
    * cohort week. Two hash aggregations + a user-key join; the
    * (user, week) distinct pass bounds everything downstream by active
    * user-weeks, not raw events.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val weekMicros = 7L * 86400 * 1000000
    val uw = events.select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("__us")) // col(), not string interpolation
      .select(col("user_id"),
        expr(s"__us div ${weekMicros}L").as("week"))
      .distinct()
    val cohorts = uw.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    uw.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users")) // uw is distinct (user, week)
      .orderBy("cohort_week", "week_offset")
  }
}
