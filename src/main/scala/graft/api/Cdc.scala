package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes over an event stream: reconstruct a
  * slowly-changing-dimension (SCD Type 2) history, and flag rolling
  * outliers — the warehouse-side companions to [[TxTable]]'s merge
  * (merge applies CDC to a table; these derive CDC views from the raw
  * event log).
  *
  * Determinism shape: both operators are single-window computations with
  * NO floating-point arithmetic in any decision. SCD2 compares the
  * tracked column for bit-equality only (no arithmetic, so doubles are
  * safe), orders by (ts, tieCol) for a total order, and emits validity
  * bounds as epoch MICROSECONDS (BIGINT) — engine-neutral, unlike raw
  * timestamp comparison semantics. The anomaly detector converts values
  * to integer cents up front and evaluates the z-score test entirely in
  * BIGINT (see [[rollingAnomalies]]), so the flag is bit-identical on
  * any engine and partitioning.
  *
  * Scale shape: one shuffle each (the window partition by key). No
  * collects, no per-group materialized arrays — window frames stream.
  */
object Cdc {

  /** SCD Type-2 reconstruction with change compression: one output row
    * per (key, run of equal `valueCol`), carrying
    * `valid_from_us`/`valid_to_us` (epoch micros; `valid_to_us` NULL on
    * the open/current version) and `is_current`. `tieCol` breaks
    * equal-timestamp ties so the history is total-ordered and
    * reproducible.
    *
    * Output: (key, tieCol, valueCol, valid_from_us BIGINT,
    * valid_to_us BIGINT, is_current BOOLEAN).
    */
  def scd2(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    // Keep only change points: first row per key, or value differs from
    // the previous row. Null-safe inequality so a NULL→value or
    // value→NULL transition is a change, not a silent merge.
    val changes = events
      .withColumn("_prev", lag(col(valueCol), 1).over(w))
      .withColumn("_first", row_number().over(w) === 1)
      .where(col("_first") || !(col(valueCol) <=> col("_prev")))
      .drop("_prev", "_first")
    val wc = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    changes.select(
      col(keyCol), col(tieCol), col(valueCol),
      unix_micros(col(tsCol)).as("valid_from_us"),
      lead(unix_micros(col(tsCol)), 1).over(wc).as("valid_to_us"),
      lead(unix_micros(col(tsCol)), 1).over(wc).isNull.as("is_current"))
  }

  /** Rolling z-score outlier flags, computed bit-exactly in integers.
    *
    * Per key ordered by (ts, tieCol), each event is tested against the
    * trailing window of the previous `lookback` events (the event itself
    * EXCLUDED — an outlier must not mask itself): flag when
    * (v − μ)² > z²·σ²_pop, evaluated without division or sqrt as
    *
    *   (n·c − Σc)² > z² · (n·Σc² − (Σc)²)
    *
    * where c = round(value·100) (integer cents — exact for
    * two-decimal-place monetary values), n the window row count, all in
    * BIGINT. Events with fewer than `minPrior` prior rows are emitted
    * unflagged (insufficient history ≠ anomaly). Magnitude check: with
    * |c| ≤ 10⁶ and lookback ≤ 10³, every term fits BIGINT with ≥ 10³
    * headroom.
    *
    * Output: (key, tieCol, cents BIGINT, n_prior BIGINT,
    * is_outlier BOOLEAN).
    */
  def rollingAnomalies(events: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: String, lookback: Int = 6,
                       minPrior: Int = 4, z: Int = 2): DataFrame = {
    require(lookback >= minPrior && minPrior >= 2,
      s"need lookback >= minPrior >= 2, got lookback=$lookback minPrior=$minPrior")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val withCents = events.withColumn("_c", round(col(valueCol) * 100).cast("long"))
    withCents.select(
      col(keyCol), col(tieCol), col("_c").as("cents"),
      count(col("_c")).over(w).as("n_prior"),
      sum(col("_c")).over(w).as("_s"),
      sum(col("_c") * col("_c")).over(w).as("_sq"))
      .withColumn("is_outlier",
        col("n_prior") >= minPrior &&
          (col("n_prior") * col("cents") - col("_s")) *
            (col("n_prior") * col("cents") - col("_s")) >
          lit(z.toLong * z) * (col("n_prior") * col("_sq") - col("_s") * col("_s")))
      .drop("_s", "_sq")
  }
}
