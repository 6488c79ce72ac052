package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate: `minhash_sig(tok, k)` returns
  * the k-permutation signature (array<bigint>) of the group's token set.
  *
  * A TypedImperativeAggregate with a primitive long[] buffer — one
  * aggregation state per group instead of k separate MIN aggregate
  * columns, and the k hashes per row are computed in a tight loop over
  * the token's bytes (seeded xxhash64, same family as Spark's built-in).
  * Map-side partial aggregation and elementwise-min merges mean the
  * shuffle carries one k-long array per (doc, partition) — this is what
  * makes corpus-scale MinHash a single cheap shuffle.
  */
final case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && numPerms > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (string, positive int), got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // Hash the token bytes ONCE, then derive the k permutations with a
      // splitmix64 finalizer over (h0, i) — statistically equivalent to k
      // independent hashes at ~1/k the hashing cost (standard MinHash
      // practice; the mix is a bijective avalanche over 64 bits).
      val h0 = XxHash64Function.hash(v.asInstanceOf[UTF8String], StringType, 42L)
      var i = 0
      while (i < numPerms) {
        var z = h0 + (i.toLong * 0x9E3779B97F4A7C15L)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z < buf(i)) buf(i) = z
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sig"
}

object MinHashAgg {

  /** Extract the permutation-count argument from the SQL call site: any
    * integral literal works (`minhash_sig(tok, 128)` and
    * `minhash_sig(tok, 128L)` alike — a bare asInstanceOf[Int] threw
    * ClassCastException on BIGINT literals); anything non-literal or
    * non-integral fails function resolution with a named error instead
    * of an opaque cast failure at injection time.
    */
  private[graft] def extractK(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"minhash_sig(tok, k): k must be an integral literal, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"minhash_sig(tok, k): k must be a literal, got ${other.sql}")
  }

  /** Register `minhash_sig(tok, k)` on the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashAgg(exprs(0), extractK(exprs(1))),
      "scala_udf")
}
