package graft.api

import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Merge-on-read position deletes applied INSIDE the vectorized
  * columnar read (the Delta deletion-vector plan shape): a DV-bearing
  * snapshot keeps Spark's native batch parquet decode, and deletes
  * apply per ColumnarBatch — batches whose row range holds no deleted
  * position pass through UNTOUCHED (zero copy, the overwhelmingly
  * common case for point deletes), and only batches that actually
  * contain deleted rows compact their survivors into fresh on-heap
  * vectors. The previous design dropped ANY DV-bearing snapshot to the
  * serialized row reader — a 2-5× whole-scan penalty paid by every
  * query until maintenance purged the deletes.
  *
  * The position contract is the same one the row-based walk relies on:
  * the scan reads each file WHOLE, in storage order, with no parquet
  * row-group/page skipping (filters stay residual on the DV branch),
  * so the running row count IS the parquet row index the del files
  * recorded.
  */
private[api] object TxDvColumnar {

  /** Types the compaction copy handles — the flat analytic core. A
    * del-bearing scan whose schema carries anything else (nested,
    * interval, variant) stays on the row-based branch.
    */
  def copyable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Wrap a whole-file batch iterator with this file's sorted deleted
    * positions. `schema` is the batch's column layout (the scan's
    * required data schema, in order).
    */
  def filtered(batches: Iterator[ColumnarBatch], dels: Array[Long],
               schema: StructType): Iterator[ColumnarBatch] =
    if (dels.isEmpty) batches
    else new Iterator[ColumnarBatch] {
      private var pos = 0L // row index of the next batch's first row
      private var di = 0   // next not-yet-passed delete position
      override def hasNext: Boolean = batches.hasNext
      override def next(): ColumnarBatch = {
        val b = batches.next()
        val n = b.numRows()
        val lo = pos
        pos += n
        // skip deletes below this batch (defensive; positions are
        // sorted so di only advances)
        while (di < dels.length && dels(di) < lo) di += 1
        if (di >= dels.length || dels(di) >= pos) b // zero-copy pass
        else {
          // collect surviving row ids of [lo, pos)
          val keep = new Array[Int](n)
          var k = 0
          var r = 0
          while (r < n) {
            val abs = lo + r
            if (di < dels.length && dels(di) == abs) di += 1
            else { keep(k) = r; k += 1 }
            r += 1
          }
          compact(b, schema, keep, k)
        }
      }
    }

  /** Copy `keep(0 until k)` rows of `b` into fresh on-heap vectors —
    * only runs for the rare batch that actually contains deletions.
    */
  private def compact(b: ColumnarBatch, schema: StructType,
                      keep: Array[Int], k: Int): ColumnarBatch = {
    val cols = new Array[ColumnVector](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val src = b.column(i)
      val dst = new OnHeapColumnVector(math.max(k, 1), f.dataType)
      var j = 0
      while (j < k) {
        val r = keep(j)
        if (src.isNullAt(r)) dst.putNull(j)
        else f.dataType match {
          case BooleanType => dst.putBoolean(j, src.getBoolean(r))
          case ByteType => dst.putByte(j, src.getByte(r))
          case ShortType => dst.putShort(j, src.getShort(r))
          case IntegerType | DateType => dst.putInt(j, src.getInt(r))
          case LongType | TimestampType | TimestampNTZType =>
            dst.putLong(j, src.getLong(r))
          case FloatType => dst.putFloat(j, src.getFloat(r))
          case DoubleType => dst.putDouble(j, src.getDouble(r))
          case StringType =>
            dst.putByteArray(j, src.getUTF8String(r).getBytes); ()
          case BinaryType => dst.putByteArray(j, src.getBinary(r)); ()
          case d: DecimalType =>
            dst.putDecimal(j, src.getDecimal(r, d.precision, d.scale),
              d.precision)
          case other => throw new IllegalStateException(
            s"unreachable: $other passed the copyable() gate")
        }
        j += 1
      }
      cols(i) = dst
      i += 1
    }
    new ColumnarBatch(cols, k)
  }
}
