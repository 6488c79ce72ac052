package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * columns so range-partitioning on the z-value clusters BOTH
  * dimensions at once — every output file covers a narrow rectangle of
  * (x, y) space, so parquet min/max stats prune files/row-groups for
  * predicates on EITHER column. A single-column sort gives perfect
  * pruning on that column and none on the other; at 100 TB the
  * two-dimensional locality is what makes secondary-predicate scans
  * affordable without a second copy of the data.
  *
  * The reference has no layout optimizer (tables are written as plain
  * single-file parquet, /root/reference/src/shelf/tables.py:142-152);
  * this is the Spark-native extension the same data outgrows into.
  *
  * The z-value is a pure integer bit-interleave — identical on any
  * engine — built driver-side as a shift/mask chain so it stays inside
  * whole-stage codegen (no UDF, no loop).
  */
object Layout {

  /** SQL-identifier quoting for the expr-string fragments below: any
    * column name (dots, spaces, hyphens, embedded backticks) survives
    * interpolation instead of breaking the parse or splicing as code.
    */
  private def qi(name: String): String =
    "`" + name.replace("`", "``") + "`"

  /** Morton code of the low `bits` of two non-negative integer columns:
    * bit b of x lands at position 2b, bit b of y at 2b+1.
    */
  def zValue(xCol: String, yCol: String, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, s"need 0 < bits <= 31, got $bits")
    val mask = (1L << bits) - 1
    // operands cast to BIGINT BEFORE the shifts: on an INT column,
    // shiftleft past bit 31 wraps (shift amounts are mod 32) and bit 31
    // itself lands on the sign — interleaved codes would silently go
    // negative for the upper half of a 16-bit dimension
    val terms = (0 until bits).flatMap { b =>
      Seq(s"shiftleft(shiftright(CAST(${qi(xCol)} AS BIGINT) & ${mask}L, $b) & 1L, ${2 * b})",
        s"shiftleft(shiftright(CAST(${qi(yCol)} AS BIGINT) & ${mask}L, $b) & 1L, ${2 * b + 1})")
    }
    expr(terms.mkString("(", " + ", ")"))
  }

  /** Write `df` range-partitioned and sorted on the z-value of
    * (xCol, yCol) into `nFiles` files. The z column is internal — the
    * written schema is the input schema; the locality lives in the
    * parquet min/max stats of the ORIGINAL columns, which is what scan
    * pruning reads.
    *
    * Both dimensions are min/max-normalized onto the full `bits` range
    * before interleaving: raw-value Morton codes are badly conditioned
    * when one column occupies fewer high bits than the other (its
    * interleaved bits then never reach the partition-boundary prefix
    * and that dimension barely clusters). The min/max pair per column
    * is bounded driver metadata (one tiny agg; a real deployment reads
    * it from catalog stats), and the normalization is exact integer
    * arithmetic, so the layout is deterministic.
    */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String,
                  path: String, nFiles: Int, bits: Int = 16): Unit =
    zorderFrame(df, xCol, yCol, nFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** The transform half of [[zorderWrite]]: `df` range-partitioned into
    * `nFiles` partitions and sorted on the z-value of (xCol, yCol), with
    * the input schema preserved (the z columns are internal). Exposed so
    * transactional writers ([[TxTable.overwriteZordered]]) can stage the
    * laid-out frame through their own commit protocol instead of a
    * plain parquet write. An empty frame passes through unchanged.
    */
  def zorderFrame(df: DataFrame, xCol: String, yCol: String,
                  nFiles: Int, bits: Int = 16): DataFrame = {
    // integral-only precondition, enforced: on fractional or negative
    // DOUBLE values the long cast truncates toward zero, (c - lo) can
    // go negative, and the interleave mask would wrap it to a large
    // positive code — silently scrambling layout quality. Bucket or
    // floor fractional dimensions to integers BEFORE z-ordering.
    for (c <- Seq(xCol, yCol)) {
      import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"zorderFrame needs integral dimension columns; `$c` is $dt " +
          "(bucket or floor it to an integer first)")
    }
    val cols = df.columns.map(col)
    val mm = df.agg(
      min(col(qi(xCol))).cast("long"), max(col(qi(xCol))).cast("long"),
      min(col(qi(yCol))).cast("long"), max(col(qi(yCol))).cast("long")).head()
    if (mm.isNullAt(0)) return df // empty input: nothing to lay out
    val m = (1L << bits) - 1
    // (c-lo)*m overflows Long once the range exceeds ~2^63/m (e.g. a
    // microsecond-timestamp span); fall back to double arithmetic there
    // — layout quality needs ~bits of precision, far under double's 53
    def norm(c: String, lo: Long, hi: Long) = {
      val range = BigInt(hi) - BigInt(lo) // hi - lo itself can overflow Long
      if (range == 0) "CAST(0 AS BIGINT)"
      else if (range <= Long.MaxValue / m)
        s"(((CAST(${qi(c)} AS BIGINT) - ${lo}L) * ${m}L) div ${range}L)"
      else
        s"""CAST(least(${m}L, floor((CAST(${qi(c)} AS DOUBLE) - ${lo}.0D)
             * ${m}.0D / ${range.toDouble}D)) AS BIGINT)"""
    }
    df.withColumn("__zx", expr(norm(xCol, mm.getLong(0), mm.getLong(1))))
      .withColumn("__zy", expr(norm(yCol, mm.getLong(2), mm.getLong(3))))
      .withColumn("__zv", zValue("__zx", "__zy", bits))
      .repartitionByRange(nFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .select(cols.toIndexedSeq: _*)
  }
}
