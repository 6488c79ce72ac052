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
  def zValue(xCol: String, yCol: String, bits: Int = 16): Column =
    zValue(Seq(xCol, yCol), bits)

  /** Morton code of the low `bits` of 2-4 non-negative integer columns:
    * bit b of column i lands at position b·n + i (round-robin
    * interleave). The code must stay a non-negative BIGINT, so
    * n · bits ≤ 62.
    */
  def zValue(cols: Seq[String], bits: Int): Column = {
    val n = cols.size
    require(n >= 2 && n <= 4, s"zValue interleaves 2-4 columns, got $n")
    require(bits > 0 && n * bits <= 62,
      s"need 0 < bits and ${n} * bits <= 62 (a non-negative BIGINT code), " +
        s"got bits=$bits")
    val mask = (1L << bits) - 1
    // operands cast to BIGINT BEFORE the shifts: on an INT column,
    // shiftleft past bit 31 wraps (shift amounts are mod 32) and bit 31
    // itself lands on the sign — interleaved codes would silently go
    // negative for the upper half of a 16-bit dimension
    val terms = (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        s"shiftleft(shiftright(CAST(${qi(c)} AS BIGINT) & ${mask}L, $b) & 1L, ${n * b + i})"
      }
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
                  nFiles: Int, bits: Int = 16): DataFrame =
    zorderFrame(df, Seq(xCol, yCol), nFiles, bits)

  /** N-dimensional [[zorderFrame]] (2-4 columns): real tables cluster
    * on (tenant, time, key) — a third or fourth dimension costs only
    * interleave width (n · bits ≤ 62), not a second copy of the data.
    * `bits = 0` picks the widest per-dimension width that fits
    * (min(16, 62 div n)).
    */
  def zorderFrame(df: DataFrame, zCols: Seq[String],
                  nFiles: Int, bits: Int): DataFrame = {
    val n = zCols.size
    require(n >= 2 && n <= 4, s"zorderFrame interleaves 2-4 columns, got $n")
    val useBits = if (bits == 0) math.min(16, 62 / n) else bits
    // integral-only precondition, enforced: on fractional or negative
    // DOUBLE values the long cast truncates toward zero, (c - lo) can
    // go negative, and the interleave mask would wrap it to a large
    // positive code — silently scrambling layout quality. Bucket or
    // floor fractional dimensions to integers BEFORE z-ordering.
    for (c <- zCols) {
      import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
      val dt = df.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"zorderFrame needs integral dimension columns; `$c` is $dt " +
          "(bucket or floor it to an integer first)")
    }
    val cols = df.columns.map(col)
    val aggs = zCols.flatMap(c =>
      Seq(min(col(qi(c))).cast("long"), max(col(qi(c))).cast("long")))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    if (mm.isNullAt(0)) return df // empty input: nothing to lay out
    val m = (1L << useBits) - 1
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
    val normed = zCols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"__z$i",
        expr(norm(c, mm.getLong(2 * i), mm.getLong(2 * i + 1))))
    }
    normed
      .withColumn("__zv", zValue(zCols.indices.map(i => s"__z$i"), useBits))
      .repartitionByRange(nFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .select(cols.toIndexedSeq: _*)
  }
}
