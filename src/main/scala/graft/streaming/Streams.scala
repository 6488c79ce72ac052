package graft.streaming

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is batch-only (every step
  * materializes parquet — /root/reference/src/shelf/tables.py:62); these
  * are the north-star streaming twins of the batch window queries
  * (SURVEY.md §2B q_stream_rate note): same `window()` plans, run through
  * `readStream` with a watermark, verified by batch-equivalence.
  *
  * Each helper runs the stream to completion (Trigger.AvailableNow over
  * the file source) into a memory sink and returns the final table — so
  * the driver's Verify/Bench harness can treat the result like any batch
  * DataFrame. On a live cluster the same plan runs unbounded with the
  * memory sink swapped for kafka/parquet and the trigger left rolling.
  */
object Streams {

  /** events.parquet schema, with ns-precision ts read as raw longs (the
    * same shim as graft.ops.H.t).
    */
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events table. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Run a streaming DF to completion into a memory sink; return the
    * resulting table as a batch DataFrame.
    */
  def runToMemory(spark: SparkSession, stream: DataFrame,
                  outputMode: String): DataFrame = {
    val name = "s_" + UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Tumbling 10-minute counts + exact-decimal sums with a 1-hour
    * watermark — the streaming twin of q_window_tumble. Complete output
    * mode so the finite replay emits every window (append would hold the
    * final windows open past the watermark).
    */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(graft.ops.H.D)).cast("double"), 4).as("sum_value"))
    runToMemory(spark, agg, "complete")
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("n"), col("sum_value"))
      .orderBy("ws")
  }

  /** Per-user session counts via session_window with a 30-minute gap —
    * the streaming twin of q_session_gap (session count per user).
    */
  def sessionCounts(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    runToMemory(spark, agg, "complete")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
  }

  /** Arbitrary stateful processing demo: running per-user aggregates via
    * flatMapGroupsWithState — the extension point the reference's
    * subprocess steps could never express over unbounded input.
    */
  def statefulUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val events = eventsStream(spark, dir)
      .select(col("user_id").as[Long], col("value").as[Double])
      .as[(Long, Double)]

    def update(user: Long, rows: Iterator[(Long, Double)],
               state: GroupState[(Long, Double)]): Iterator[(Long, Long, Double)] = {
      val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
      var n = n0; var s = s0
      rows.foreach { r => n += 1; s += r._2 }
      state.update((n, s))
      Iterator((user, n, s))
    }

    val out = events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(update)
      .toDF("user_id", "n_events", "sum_value")
    runToMemory(spark, out, "update")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"),
        round(max("sum_value"), 4).as("sum_value"))
      .orderBy("user_id")
  }
}
