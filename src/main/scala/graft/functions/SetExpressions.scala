package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `sorted_intersect_size(a, b)`: |a ∩ b| for two SORTED, de-duplicated
  * string arrays, as a single codegen'd two-pointer merge.
  *
  * The built-in `size(array_intersect(a, b))` materializes a hash set
  * AND an output array per row; on the dedup verify path (every LSH
  * candidate pair) that is pure allocation churn — the intersection
  * itself is discarded, only its size survives. The merge does zero
  * allocation and stays inside whole-stage codegen.
  *
  * Caller contract: both arrays ascending-sorted and distinct
  * (Dedup.shingles emits exactly that). Unsorted input silently
  * undercounts — enforce at the source, not per row.
  */
final case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true; case _ => false
    }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<string> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.sortedIntersectSize(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // shared pre-compiled kernel (see VectorKernels' rationale): the
    // merge loop is one JIT-hot static body instead of a fresh inline
    // copy interpreted per query
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetKernels.sortedIntersectSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size"
}

/** Shared pre-compiled kernel (one JIT-hot body for every query; see
  * VectorKernels' rationale in VectorExpressions.scala).
  */
object SetKernels {
  def sortedIntersectSize(x: ArrayData, y: ArrayData): Long = {
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var n = 0L
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}

object SetFunctions {
  /** Idempotently register `sorted_intersect_size` on the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)), "scala_udf")
}
