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
  * Scale + determinism shape: events fold PER USER over a sorted
  * per-user list (one hash shuffle on user_id; per-user event counts
  * are bounded, the corpus is not), and both the sort key and the fold
  * state are exact BIGINT encodings — event = ts_micros·4 + step_idx,
  * state = stage·2^59 + first_step_ts — so every comparison is integer
  * arithmetic any engine reproduces bit-for-bit (no timestamp, struct,
  * or fp semantics in the hot path). Timestamps must be ≥ the epoch:
  * negative micros break both the `% 4` step extraction and the
  * truncating `div 4` timestamp recovery.
  */
object Funnels {

  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame = {
    // step index rides in the low 2 bits of the encoding; the 2^59
    // state split leaves room for stage values up to 4 WITHOUT the
    // final advance (4+1 would need it) overflowing 2^63 — 4·2^59 +
    // t0 < 2^62 — while 59 bits still hold micros until year ~20000
    require(steps.nonEmpty && steps.size <= 4,
      s"funnelStages encodes the step index in 2 bits; got ${steps.size} steps")
    require(windowMicros > 0, "windowMicros must be positive")
    val idx: Column = steps.zipWithIndex
      .foldLeft(lit(-1L): Column) { case (acc, (st, i)) =>
        when(col(typeCol) === st, lit(i.toLong)).otherwise(acc)
      }
    val S = 1L << 59
    events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user_id"),
        (unix_micros(col(tsCol)) * 4 + idx).as("enc"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("enc"))).as("evs"))
      .select(col("user_id"), expr(
        s"""aggregate(evs, CAST(0 AS BIGINT),
              (s, x) -> IF(s div ${S}L < ${steps.size}L
                           AND x % 4L = s div ${S}L
                           AND (s div ${S}L = 0L
                                OR x div 4L - s % ${S}L <= ${windowMicros}L),
                        (s div ${S}L + 1L) * ${S}L
                          + IF(s div ${S}L = 0L, x div 4L, s % ${S}L),
                        s),
              s -> s div ${S}L)""").as("stage"))
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
    * bounded per-user sorted fold. Returns (user_id, n_events, ewma).
    */
  def ewmaHalf(events: DataFrame, userCol: String, tsCol: String,
               valueCol: String): DataFrame =
    events
      .select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("t"), col(valueCol).cast("double").as("v"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("t"), col("v")))).as("evs"))
      .select(col("user_id"),
        org.apache.spark.sql.functions.size(col("evs")).cast("long")
          .as("n_events"),
        expr("""round(aggregate(slice(evs, 2, size(evs) - 1), evs[0].v,
                   (s, e) -> (e.v + s) / 2.0D), 6)""").as("ewma"))

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
