package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, LongType, StructType}

/** Native Catalyst vector expressions with whole-stage codegen.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, ...))`) allocates a
  * zipped array per row and interprets a lambda per element — fine for
  * one query vector, ruinous for pairwise similarity at 100 TB. These
  * fuse the loop into one codegen'd pass over both `ArrayData`s with no
  * allocation. Evaluation order (ascending index, sequential adds) is
  * identical to the HOF left fold, so results are bit-for-bit unchanged
  * and the DuckDB oracles still hash-match.
  *
  * Preference tier (b) of the build brief: custom Expression beats UDF;
  * only used where built-ins genuinely can't express the fused loop.
  */
final case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (sqrt(||a||²) * sqrt(||b||²)), fused into a
  * single pass; formula identical to the previous HOF expression.
  */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim_i8(a, b)`: cosine over int8-quantized vectors
  * (array<tinyint>), the scoring kernel of the quantized ANN scan.
  * Components are integers bounded by 127, so dot and norms are sums
  * of integers ≤ 127²·dim — exact in double on any summation order —
  * and the result is bit-identical to the HOF formulation
  * (`aggregate(zip_with(...))`) it replaces, which interpreted a
  * lambda and allocated a zipped array per corpus row. On the 100×
  * probe the interpreted form made the "cheap" quantized scan 8×
  * slower than the exact codegen'd one; this restores the intended
  * cost ordering.
  */
final case class CosineSimilarityI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true; case _ => false
    }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<tinyint> inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getByte(i).toDouble; val yv = y.getByte(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getByte($i);
         |  double $yv = (double) $b.getByte($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityI8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim_i8"
}

/** `vec_maxabs(v)`: max(|v_i|) over an array<double> — the scale
  * numerator of symmetric int8 quantization, fused into one codegen'd
  * loop (the HOF `aggregate(v, 0.0, (m, x) -> greatest(m, abs(x)))`
  * interprets a lambda per element; on the offline index-build scan —
  * which IS a full-corpus pass at 100 TB — that interpreter overhead
  * dominated the probe). max is order-insensitive, so the value is
  * identical to the HOF fold.
  */
final case class VecMaxAbs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double>, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var m = 0.0
    var i = 0
    while (i < n) { m = math.max(m, math.abs(x.getDouble(i))); i += 1 }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $m = java.lang.Math.max($m, java.lang.Math.abs($a.getDouble($i)));
         |}
         |${ev.value} = $m;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecMaxAbs =
    copy(child = newChild)

  override def prettyName: String = "vec_maxabs"
}

/** `quantize_i8(v, scale)`: array<tinyint> of
  * `floor(v_i / scale + 0.5)` (scale = 0 → all zeros), the symmetric
  * int8 code of [[graft.api.Similarity.quantize]] fused into one
  * codegen'd loop writing a primitive byte[] — no per-row lambda
  * interpretation, no boxed array. The arithmetic is the exact IEEE op
  * sequence of the SQL `CAST(floor(CASE WHEN scale = 0 THEN 0 ELSE
  * x / scale END + 0.5) AS TINYINT)` it replaces (floor'd values are
  * integral in [-127, 127], so the narrowing cast is exact), so codes
  * are byte-identical and the DuckDB oracles still hash-match.
  */
final case class QuantizeI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, double), got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = if (scale == 0.0) 0.0 else x.getDouble(i) / scale
      out(i) = math.floor(q + 0.5).toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $q = ($b == 0.0) ? 0.0 : $a.getDouble($i) / $b;
         |  $out[$i] = (byte) java.lang.Math.floor($q + 0.5);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeI8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "quantize_i8"
}

/** `nearest_centroid(v, cents)`: id of the cosine-nearest centroid in
  * `cents` (an array of (id: bigint, cv: array<double>) structs, sorted
  * ascending by id). Ties keep the FIRST maximum — i.e. the lowest id —
  * via the strict `>`, matching the fold/window assignments it
  * replaced. Returns -1 for an empty centroid array.
  *
  * The HOF formulation (`aggregate(transform(cents, ...))`) evaluates
  * its lambda interpreted, re-entering eval per centroid; this fuses
  * the whole k×dim argmax into one codegen'd nested loop with no
  * allocation — the difference between fine-at-k=16 and
  * fine-at-k=4096 on a 100 TB assignment scan. Struct fields are read
  * POSITIONALLY (id at 0, vector at 1), so both named structs and
  * typedlit tuples work.
  */
final case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(StructType(Array(idF, cvF)), _))
        if idF.dataType == LongType &&
           (cvF.dataType match {
             case ArrayType(DoubleType, _) => true; case _ => false
           }) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<struct<bigint, array<double>>>), " +
        s"got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    var best = -1L
    var bestSc = -2.0
    var bi = 0
    val k = cents.numElements()
    while (bi < k) {
      val c = cents.getStruct(bi, 2)
      val cv = c.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < n) {
        val x = v.getDouble(j); val y = cv.getDouble(j)
        dot += x * y; na += x * x; nb += y * y
        j += 1
      }
      val sc = dot / (math.sqrt(na) * math.sqrt(nb))
      if (sc > bestSc) { bestSc = sc; best = c.getLong(0) }
      bi += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val bi = ctx.freshName("bi")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val sc = ctx.freshName("sc")
      val best = ctx.freshName("best")
      val bestSc = ctx.freshName("bestSc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |long $best = -1L;
         |double $bestSc = -2.0;
         |int $k = $cents.numElements();
         |for (int $bi = 0; $bi < $k; $bi++) {
         |  org.apache.spark.sql.catalyst.InternalRow $c = $cents.getStruct($bi, 2);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $xv = $v.getDouble($j);
         |    double $yv = $cv.getDouble($j);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  double $sc = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  if ($sc > $bestSc) { $bestSc = $sc; $best = $c.getLong(0); }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_centroid"
}

/** `nearest_centroid_l2(v, cents)`: id of the EUCLIDEAN-nearest
  * centroid — the assignment metric of product-quantization codebooks,
  * where the goal is reconstruction error, not angular similarity
  * (cosine assignment ignores subvector magnitude and reconstructs the
  * wrong norm). Same contract as [[NearestCentroid]]: `cents` sorted
  * ascending by id, ties keep the first (lowest-id) minimum via the
  * strict `<`, squared distance summed in index order (sequential adds
  * — the same fold a relational oracle's list_reduce replays
  * bit-identically), -1 for an empty array, codegen'd single fused
  * loop.
  */
final case class NearestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _),
          ArrayType(StructType(Array(idF, cvF)), _))
        if idF.dataType == LongType &&
           (cvF.dataType match {
             case ArrayType(DoubleType, _) => true; case _ => false
           }) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<struct<bigint, array<double>>>), " +
        s"got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    var best = -1L
    var bestD = Double.PositiveInfinity
    var bi = 0
    val k = cents.numElements()
    while (bi < k) {
      val c = cents.getStruct(bi, 2)
      val cv = c.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var d = 0.0
      var j = 0
      while (j < n) {
        val diff = v.getDouble(j) - cv.getDouble(j)
        d += diff * diff
        j += 1
      }
      if (d < bestD) { bestD = d; best = c.getLong(0) }
      bi += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cents) => {
      val bi = ctx.freshName("bi")
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |long $best = -1L;
         |double $bestD = Double.POSITIVE_INFINITY;
         |int $k = $cents.numElements();
         |for (int $bi = 0; $bi < $k; $bi++) {
         |  org.apache.spark.sql.catalyst.InternalRow $c = $cents.getStruct($bi, 2);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  double $d = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $diff = $v.getDouble($j) - $cv.getDouble($j);
         |    $d += $diff * $diff;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c.getLong(0); }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidL2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "nearest_centroid_l2"
}

object VectorFunctions {
  /** Idempotently register `vec_dot` / `cosine_sim` /
    * `nearest_centroid` as SQL functions on the session, usable from
    * `expr(...)` and `spark.sql(...)`.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      exprs => VectorDot(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim_i8",
      exprs => CosineSimilarityI8(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_maxabs",
      exprs => VecMaxAbs(exprs(0)), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_i8",
      exprs => QuantizeI8(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nearest_centroid",
      exprs => NearestCentroid(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("nearest_centroid_l2",
      exprs => NearestCentroidL2(exprs(0), exprs(1)), "scala_udf")
  }
}
