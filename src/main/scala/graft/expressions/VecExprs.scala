package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native fused vector kernels for the similarity operators. The HOF
  * compositions (`aggregate(zip_with(...))`) are interpreted per row —
  * no codegen, one boxed GenericArrayData per intermediate — which makes
  * the pair-cosine join and the k-dot-product centroid assignment the
  * dominant cost of SemDeDup/ANN at corpus scale. Each kernel walks the
  * array(s) ONCE and accumulates in EXACTLY the order the composed form
  * does (left-to-right double adds, per-element float->double cast), so
  * results are bit-identical IEEE and the DuckDB oracles keep matching.
  *
  * NULL semantics mirrored from the HOF forms: a NULL array -> NULL
  * (null-intolerant); a NULL element -> NULL result (the aggregate's
  * accumulator goes NULL and stays NULL); for the pair kernel, arrays of
  * different lengths -> NULL (zip_with pads the shorter side with NULL
  * elements). DELIBERATE divergence on zero norms: under ANSI mode
  * (Spark 4 default) the composed `0.0 / (0.0 * qn)` THROWS
  * DIVIDE_BY_ZERO, which would let one zero/empty vector kill a corpus-
  * scale job; the native kernels use raw IEEE division instead, so a
  * zero norm cosines to NaN (and NaN fails every `>= tau` filter, which
  * is the behavior a dedup/ANN pass wants). DuckDB's double division
  * never errors either, so the oracles agree with the native side.
  */
object VecImpl {
  private def elem(arr: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** dot(v, q): java.lang.Double so NULL can flow back through codegen. */
  def dotConst(q: Array[Double], v: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = v.numElements()
    // zip_with pads to max length: a shorter or longer v yields NULL
    // products, so any length mismatch nulls the sum
    if (n != q.length) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      acc += elem(v, i, isFloat) * q(i)
      i += 1
    }
    acc
  }

  /** cosine(v, q) = dot/(norm(v)*qn): one pass for dot AND norm. */
  def cosineConst(q: Array[Double], qn: Double, v: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = v.numElements()
    if (n != q.length) return null
    var dot = 0.0
    var sq = 0.0
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = elem(v, i, isFloat)
      dot += x * q(i)
      sq += x * x
      i += 1
    }
    dot / (math.sqrt(sq) * qn)
  }

  /** cosine(a, b) = dot/(norm(a)*norm(b)): one pass over both arrays. */
  def cosinePair(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var sqA = 0.0
    var sqB = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dot += x * y
      sqA += x * x
      sqB += y * y
      i += 1
    }
    dot / (math.sqrt(sqA) * math.sqrt(sqB))
  }

  def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vector kernel expects array<float|double>, got $other")
  }
}

/** Σ v_i * q_i against a constant query vector. */
case class DotConst(child: Expression, q: Seq[Double]) extends UnaryExpression {
  private lazy val isFloat = VecImpl.isFloatArray(child.dataType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_const"

  override protected def nullSafeEval(input: Any): Any =
    VecImpl.dotConst(q.toArray, input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("q", q.toArray, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double r = graft.expressions.VecImpl.dotConst($qRef, $c, $isFloat);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): DotConst =
    copy(child = newChild)
}

/** cosine(v, q) against a constant query vector (qn precomputed once —
  * same Scala-side accumulation as the composed cosineTo). */
case class CosineConst(child: Expression, q: Seq[Double], qn: Double) extends UnaryExpression {
  private lazy val isFloat = VecImpl.isFloatArray(child.dataType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_const"

  override protected def nullSafeEval(input: Any): Any =
    VecImpl.cosineConst(q.toArray, qn, input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("q", q.toArray, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double r = graft.expressions.VecImpl.cosineConst($qRef, $qn, $c, $isFloat);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }""")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineConst =
    copy(child = newChild)
}

/** cosine(a, b) between two vector columns. */
case class CosinePair(left: Expression, right: Expression) extends BinaryExpression {
  private lazy val lFloat = VecImpl.isFloatArray(left.dataType)
  private lazy val rFloat = VecImpl.isFloatArray(right.dataType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_pair"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecImpl.cosinePair(a.asInstanceOf[ArrayData], lFloat, b.asInstanceOf[ArrayData], rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.expressions.VecImpl.cosinePair($a, $lFloat, $b, $rFloat);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }""")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosinePair =
    copy(left = newLeft, right = newRight)
}
