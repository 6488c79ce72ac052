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

  /** Wrap a split's batch iterator with the FILE's sorted deleted
    * positions. `startPos` is the split's first row index and
    * `expectRows` its footer-derived row count — the split reads its
    * row groups whole and in order with nothing skipped, so the
    * running count from `startPos` IS each row's index; the count
    * check at exhaustion makes any drift in that contract loud.
    */
  def filtered(batches: Iterator[ColumnarBatch], dels: Array[Long],
               schema: StructType, startPos: Long, expectRows: Long,
               file: String): Iterator[ColumnarBatch] =
    new Iterator[ColumnarBatch] {
      private var pos = startPos // row index of the next batch's 1st row
      private var di = 0         // next not-yet-passed delete position
      // compaction DESTINATION vectors are allocated once and reset
      // per compacted batch (the reuse contract every Spark columnar
      // reader ships: a batch is valid until the next advance) — a
      // fresh allocation per batch spends more on growth/GC than the
      // copy itself
      private var dsts: Array[OnHeapColumnVector] = _
      private var out: ColumnarBatch = _
      override def hasNext: Boolean = {
        val more = batches.hasNext
        if (!more && pos != startPos + expectRows)
          throw new IllegalStateException(
            s"DV scan position drift on $file: consumed " +
              s"${pos - startPos} rows of a split the footer says has " +
              s"$expectRows — position-delete application would be " +
              "misaligned")
        more
      }
      override def next(): ColumnarBatch = {
        val b = batches.next()
        val n = b.numRows()
        val lo = pos
        pos += n
        // skip deletes below this batch (a split's first batch jumps
        // di forward once; positions are sorted so di only advances)
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
          if (dsts == null) {
            dsts = schema.fields.map(f =>
              new OnHeapColumnVector(math.max(n, 1), f.dataType))
            out = new ColumnarBatch(dsts.map(v => v: ColumnVector).toArray)
          } else {
            // reset + re-reserve: puts do not auto-grow row capacity,
            // and a later batch can be larger than the first
            dsts.foreach { d => d.reset(); d.reserve(n) }
          }
          compact(b, schema, keep, k, dsts)
          out.setNumRows(k)
          out
        }
      }
    }

  /** Copy `keep(0 until k)` rows of `b` into fresh on-heap vectors —
    * only runs for batches that actually contain deletions. The type
    * dispatch resolves ONCE PER COLUMN into a monomorphic copier, not
    * per row — a per-row DataType match in the inner loop showed up as
    * the dominant compaction cost in tools.DvScanBench.
    */
  private def compact(b: ColumnarBatch, schema: StructType,
                      keep: Array[Int], k: Int,
                      dsts: Array[OnHeapColumnVector]): Unit = {
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val src = b.column(i)
      val dst = dsts(i)
      val copy: (Int, Int) => Unit = f.dataType match {
        case BooleanType => (j, r) => dst.putBoolean(j, src.getBoolean(r))
        case ByteType => (j, r) => dst.putByte(j, src.getByte(r))
        case ShortType => (j, r) => dst.putShort(j, src.getShort(r))
        case IntegerType | DateType => (j, r) => dst.putInt(j, src.getInt(r))
        case LongType | TimestampType | TimestampNTZType =>
          (j, r) => dst.putLong(j, src.getLong(r))
        case FloatType => (j, r) => dst.putFloat(j, src.getFloat(r))
        case DoubleType => (j, r) => dst.putDouble(j, src.getDouble(r))
        case StringType => (j, r) => {
          val s = src.getUTF8String(r)
          dst.putByteArray(j, s.getBytes); ()
        }
        case BinaryType => (j, r) => { dst.putByteArray(j, src.getBinary(r)); () }
        case d: DecimalType => (j, r) =>
          dst.putDecimal(j, src.getDecimal(r, d.precision, d.scale),
            d.precision)
        case other => throw new IllegalStateException(
          s"unreachable: $other passed the copyable() gate")
      }
      if (src.hasNull) {
        var j = 0
        while (j < k) {
          val r = keep(j)
          if (src.isNullAt(r)) dst.putNull(j) else copy(j, r)
          j += 1
        }
      } else {
        var j = 0
        while (j < k) { copy(j, keep(j)); j += 1 }
      }
      i += 1
    }
  }
}
