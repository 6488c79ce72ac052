package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One registered query: name + Spark plan + optional DuckDB oracle SQL.
  *
  * The oracle SQL must produce byte-identical results (after the driver's
  * sort-columns-by-name + hash compare), so every query obeys the
  * determinism rules of SURVEY.md §2B: total ORDER BY, exact decimal
  * arithmetic behind double aggregates, explicit NULLS FIRST/LAST,
  * BIGINT-normalised integer outputs.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

/** Shared helpers for the query inventory. */
object H {

  /** Load one driver test table (see /root/repo/TESTDATA.md).
    *
    * `events.ts` has shifted physical type across driver testdata
    * generations — nanosecond INT64 in earlier rounds (which Spark's
    * vectorized reader rejects unless read as raw Long), microsecond
    * TIMESTAMP_NTZ in the current one — so the load normalizes whatever
    * arrives instead of assuming a generation: see [[normalizeEventsTs]].
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(readMemo(s, s"$dir/$name.parquet"))
    } else readMemo(s, s"$dir/$name.parquet")

  /** Footer-schema-memoized parquet read — see [[graft.api.SchemaMemo]]. */
  def readMemo(s: SparkSession, path: String): DataFrame =
    graft.api.SchemaMemo.read(s, path)

  /** Normalize `events.ts` to a session-zone TIMESTAMP regardless of the
    * physical type the testdata generation used:
    *
    *  - raw nanos Long (via `nanosAsLong=true` on nano-precision files):
    *    truncate to micros — the same floor DuckDB applies in
    *    `CAST(ts AS TIMESTAMP)`;
    *  - TIMESTAMP_NTZ (micro-precision files): reinterpret the wall-clock
    *    value in the session zone (UTC everywhere in this project), which
    *    is exactly how DuckDB reads the same file;
    *  - already TIMESTAMP: pass through.
    *
    * Every downstream consumer and every oracle therefore sees ONE type
    * (TIMESTAMP, micro precision, UTC) for `ts` across generations.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Exact decimal type used to make double aggregation order-independent:
    * fp addition is not associative, so a plain SUM(double) differs between
    * engines and between partitionings; decimal addition is exact and
    * associative, so the sum is reproducible on any cluster size.
    */
  val D: DecimalType = DecimalType(38, 4)

  /** Deterministic sum of a double column: exact decimal sum, cast back. */
  def dsum(c: Column): Column = round(sum(c.cast(D)).cast("double"), 4)

  /** Deterministic average of a double column. */
  def davg(c: Column): Column =
    round(sum(c.cast(D)).cast("double") / count(c), 4)

  def r4(c: Column): Column = round(c, 4)

  /** Decimal type for factors of exact products. Raw data values are
    * "nice" (≤2 decimal places), so double→decimal(18,6) casts land far
    * from rounding boundaries in every engine. Products of two doubles
    * (e.g. `1 - l_discount`) are single fp ops — deterministic — and are
    * likewise boundary-safe at scale 6.
    */
  val D6: DecimalType = DecimalType(18, 6)
  def dec(c: Column): Column = c.cast(D6)

  /** Deterministic sum of an already-exact decimal expression: exact sum,
    * round in *decimal* space (identical HALF_UP both engines for
    * positives), cast to double last.
    */
  def dsumd(c: Column): Column = round(sum(c), 4).cast("double")

  // ---- Oracle-side (DuckDB) fragments matching the helpers exactly. ----
  def oSum(x: String): String =
    s"ROUND(CAST(SUM(CAST(($x) AS DECIMAL(38,4))) AS DOUBLE), 4)"
  def oAvg(x: String): String =
    s"ROUND(CAST(SUM(CAST(($x) AS DECIMAL(38,4))) AS DOUBLE) / COUNT($x), 4)"
  def oSumProd(a: String, b: String): String =
    s"CAST(ROUND(SUM(CAST(($a) AS DECIMAL(18,6)) * CAST(($b) AS DECIMAL(18,6))), 4) AS DOUBLE)"
}
