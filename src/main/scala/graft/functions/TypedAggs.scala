package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s for the `Dataset[T]` API — the custom-aggregate
  * tier below a full Catalyst expression: type-safe at compile time,
  * planned as a regular aggregate (partial + merge), usable as a
  * `TypedColumn` in `KeyValueGroupedDataset.agg`.
  *
  * `ExactSum` mirrors graft.ops.H.dsum for typed pipelines: the buffer
  * is an exact BigDecimal (inputs rounded to 4dp HALF_UP, matching a
  * DECIMAL(38,4) cast), so addition is associative and the result is
  * identical under ANY partitioning/merge order — the property fp sums
  * lack and the reason double totals drift between cluster sizes.
  */
object TypedAggs {

  /** Exact 4dp-decimal sum of the `Double` field selected by `get`. */
  final class ExactSum[I](get: I => Double)
    extends Aggregator[I, JBigDecimal, Double] {
    override def zero: JBigDecimal = JBigDecimal.ZERO
    override def reduce(b: JBigDecimal, a: I): JBigDecimal =
      b.add(new JBigDecimal(get(a), MathContext.UNLIMITED)
        .setScale(4, RoundingMode.HALF_UP))
    override def merge(x: JBigDecimal, y: JBigDecimal): JBigDecimal = x.add(y)
    override def finish(b: JBigDecimal): Double =
      b.setScale(4, RoundingMode.HALF_UP).doubleValue
    override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
