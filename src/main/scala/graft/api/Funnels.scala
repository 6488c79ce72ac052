package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * the fold state are exact BIGINT encodings — event = ts_micros·8 +
  * step_idx, state = (stage, first_step_ts) — so every comparison is
  * integer arithmetic any engine reproduces bit-for-bit (no timestamp,
  * struct, or fp semantics in the hot path). Timestamps must be ≥ the
  * epoch: negative micros would break the `% 8` step extraction and the
  * truncating `div 8` timestamp recovery, so the fold REJECTS them
  * loudly (IllegalArgumentException) instead of reporting stage 0.
  *
  * Group-key fast path: integral user ids (BYTE/SHORT/INT/BIGINT — the
  * overwhelmingly common id shape) shuffle as raw 8-byte longs; string
  * ids shuffle as strings. Any other key type (fp, binary, struct) is
  * REJECTED up front — a cast-based group key would silently merge
  * distinct keys (e.g. two byte strings with the same UTF-8 replacement
  * rendering), which corrupts the grouping instead of failing it.
  */
object Funnels {

  /** Internal: pick the group-key path for a user column. Returns true
    * for the integral fast path (key shuffles as a raw long), false for
    * the string path. NULL user ids stay a group of their own on both
    * paths (Option / String encoders and groupByKey are null-safe),
    * matching GROUP BY semantics. Every other type fails loudly.
    */
  private def integralKey(fn: String, t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    // DECIMAL(p, 0) with p <= 18 is an exact integer domain inside
    // Long range — the standard JDBC NUMBER id shape — and casts
    // losslessly to the integral fast path
    case d: DecimalType if d.scale == 0 && d.precision <= 18 => true
    case StringType => false
    case other => throw new IllegalArgumentException(
      s"$fn: user column must be STRING, integral (BYTE/SHORT/INT/BIGINT), " +
        s"or DECIMAL(<=18, 0); got $other — a cast-based group key would " +
        "silently merge distinct keys")
  }

  /** The per-user funnel fold, generic over the group-key type so the
    * integral and string paths share one body. `None` encodings (a
    * null timestamp) contribute nothing, but the user's group row still
    * exists — exactly what the oracle's `list(enc)` + reduce replays
    * (a NULL element no-ops every CASE arm), and what the old
    * collect_list formulation produced.
    */
  private def stageFold[K](nSteps: Long, windowMicros: Long)(
      uk: K, it: Iterator[(K, Option[Long])]): Iterator[(K, Long)] = {
    var stage = 0L
    var t0 = 0L
    it.foreach { case (_, xo) =>
      xo.foreach { x =>
        if (x < 0L) throw new IllegalArgumentException(
          s"funnelStages: pre-epoch timestamp for user $uk (enc=$x); " +
            "the BIGINT step encoding requires ts >= 1970-01-01")
        if (stage < nSteps && x % 8L == stage &&
            (stage == 0L || x / 8L - t0 <= windowMicros)) {
          if (stage == 0L) t0 = x / 8L
          stage += 1L
        }
      }
    }
    Iterator((uk, stage))
  }

  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame = {
    // step index rides in the low 3 bits of the encoding; 3 bits bound
    // the funnel at 8 steps, and 61 bits of non-negative micros·8 stay
    // clear of the sign bit until year ~38000
    require(steps.nonEmpty && steps.size <= 8,
      s"funnelStages encodes the step index in 3 bits; got ${steps.size} steps")
    require(windowMicros > 0, "windowMicros must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val userType = events.schema(userCol).dataType
    val intKey = integralKey("funnelStages", userType)
    val nSteps = steps.size.toLong
    val idx: Column = steps.zipWithIndex
      .foldLeft(lit(-1L): Column) { case (acc, (st, i)) =>
        when(col(typeCol) === st, lit(i.toLong)).otherwise(acc)
      }
    val base = events.filter(col(typeCol).isin(steps: _*))
    val enc = (unix_micros(col(tsCol)) * 8 + idx).as("enc")
    val folded =
      if (intKey)
        base.select(col(userCol).cast("long").as("uk"), enc)
          .as[(Option[Long], Option[Long])]
          .groupByKey(_._1)
          .flatMapSortedGroups(col("enc"))(
            stageFold[Option[Long]](nSteps, windowMicros))
          .toDF("uk", "stage")
      else
        base.select(col(userCol).as("uk"), enc)
          .as[(String, Option[Long])]
          .groupByKey(_._1)
          .flatMapSortedGroups(col("enc"))(
            stageFold[String](nSteps, windowMicros))
          .toDF("uk", "stage")
    folded.select(col("uk").cast(userType).as("user_id"), col("stage"))
  }

  /** Per-stage user counts: how many users stalled at each depth. */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowMicros: Long): DataFrame =
    funnelStages(events, userCol, tsCol, typeCol, steps, windowMicros)
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")

  /** The per-user EWMA fold, generic over the group-key type. */
  private def ewmaFold[K](uk: K,
                          it: Iterator[(K, Long, Double)]): Iterator[(K, Long, Double)] = {
    var n = 0L
    var s = 0.0
    it.foreach { case (_, _, v) =>
      s = if (n == 0L) v else (v + s) / 2.0
      n += 1L
    }
    Iterator((uk, n, s))
  }

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
    val intKey = integralKey("ewmaHalf", userType)
    // events with a null timestamp or value are EXCLUDED from the
    // fold (documented semantic: the old array formulation would
    // instead propagate null through the whole EWMA, which loses the
    // user's entire smoothed value to one bad row). Null USERS keep
    // their group.
    val base = events
      .select(col(userCol).as("__u"),
        unix_micros(col(tsCol)).as("t"), col(valueCol).cast("double").as("v"))
      .filter(col("t").isNotNull && col("v").isNotNull)
    val folded =
      if (intKey)
        base.select(col("__u").cast("long").as("uk"), col("t"), col("v"))
          .as[(Option[Long], Long, Double)]
          .groupByKey(_._1)
          .flatMapSortedGroups(col("t"), col("v"))(ewmaFold[Option[Long]])
          .toDF("uk", "n_events", "ewma")
      else
        base.select(col("__u").as("uk"), col("t"), col("v"))
          .as[(String, Long, Double)]
          .groupByKey(_._1)
          .flatMapSortedGroups(col("t"), col("v"))(ewmaFold[String])
          .toDF("uk", "n_events", "ewma")
    folded.select(col("uk").cast(userType).as("user_id"), col("n_events"),
      round(col("ewma"), 6).as("ewma"))
  }

  /** Cohort retention matrix: users cohorted by first-active epoch week
    * (integer `unix_micros div week` — calendar-convention-free, so any
    * engine buckets identically), counted per week offset since the
    * cohort week.
    *
    * ONE event scan and ONE user-key exchange: the per-user distinct
    * weeks fold map-side as a partial `collect_set`, the cohort week is
    * the set's min, and explode recovers the (user, week) rows — the
    * old distinct + per-user min + re-join shape paid a second full
    * scan, two extra exchanges and a join for the same rows (guide
    * §2.4). Per-user state is bounded by distinct ACTIVE weeks
    * (52/user/year), never raw events, so a bot firehose costs
    * map-side dedup, not memory. Null semantics match the join shape
    * exactly: null users drop (the inner join never matched them), a
    * null week (null/invalid ts) re-enters the rows AFTER the set
    * (collect_set skips nulls) so it still counts under its user's
    * cohort — (null, null) for a user with no timestamped events at
    * all, exactly what min-over-join produced.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val weekMicros = 7L * 86400 * 1000000
    val perUser = events.select(col(userCol).as("user_id"),
        unix_micros(col(tsCol)).as("__us")) // col(), not string interpolation
      .select(col("user_id"),
        expr(s"__us div ${weekMicros}L").as("week"))
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(collect_set(col("week")).as("__ws"),
        max(when(col("week").isNull, lit(1)).otherwise(lit(0))).as("__hn"))
    perUser
      .select(array_min(col("__ws")).as("cohort_week"),
        explode(when(col("__hn") === 1,
            concat(col("__ws"), array(lit(null).cast("long"))))
          .otherwise(col("__ws"))).as("week"))
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users")) // __ws is distinct weeks per user
      .orderBy("cohort_week", "week_offset")
  }
}
