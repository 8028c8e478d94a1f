package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ARBITRARY-bounds limiter for the unbounded-numeric generator:
  * `minUnits + BigInteger(digits) mod width`, rendered as canonical
  * decimal text at `scale`. The constructive VARCHAR-math path
  * (`Gen.bigDecimalBetween`) requires the range width to factor as
  * m * 10^k with m < 10^8 so every schoolbook step fits a 64-bit limb in
  * BOTH engines; this expression removes that constraint (any width, and
  * negative minimums) by doing the one modulo in exact BigInteger
  * arithmetic — the (b)-tier custom-Expression escape hatch for bound
  * shapes the built-ins cannot reach. Value-identical to the constructive
  * path wherever both apply (same digit-stream spec, and
  * (A mod m)*10^k + B == V mod (m*10^k) exactly). NULL in -> NULL out;
  * codegen is a single static call per row.
  *
  * Constants travel as decimal STRINGS (case-class fields must be
  * serializable and comparable); the parsed BigIntegers live in a
  * reference object shared by interpreted and generated code.
  */
case class BigUniformMod(child: Expression, widthStr: String, minUnitsStr: String,
                         scale: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "big_uniform_mod"

  @transient private lazy val params =
    new BigNumImpl.Params(widthStr, minUnitsStr, scale)

  override protected def nullSafeEval(input: Any): Any =
    BigNumImpl.modAdd(input.asInstanceOf[UTF8String], params)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("params", params, classOf[BigNumImpl.Params].getName)
    defineCodeGen(ctx, ev, c => s"graft.expressions.BigNumImpl.modAdd($c, $pRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BigUniformMod =
    copy(child = newChild)
}

/** Static helper shared by interpreted and generated code (same
  * non-companion pattern as [[GenImpl]]/[[DigestImpl]]). */
object BigNumImpl {

  final class Params(widthStr: String, minUnitsStr: String, val scale: Int)
    extends Serializable {
    val width = new java.math.BigInteger(widthStr)
    val minUnits = new java.math.BigInteger(minUnitsStr)
    require(width.signum > 0, "BigUniformMod: width must be positive")
    require(scale >= 0 && scale <= 15, "BigUniformMod: scale in [0,15]")
  }

  def modAdd(digits: UTF8String, p: Params): UTF8String = {
    val v = new java.math.BigInteger(digits.toString)
    UTF8String.fromString(format(p.minUnits.add(v.mod(p.width)), p.scale))
  }

  /** Canonical decimal text: sign, leading zeros stripped from the
    * integer part (empty -> "0"), '.' at `scale` digits from the right —
    * the same rendering as Gen.bigFormat. units < 0 is never -0. */
  def format(units: java.math.BigInteger, scale: Int): String = {
    val neg = units.signum < 0
    val s = units.abs.toString
    val padded = if (s.length <= scale) ("0" * (scale - s.length + 1)) + s else s
    val body =
      if (scale == 0) padded
      else padded.substring(0, padded.length - scale) + "." + padded.substring(padded.length - scale)
    if (neg) "-" + body else body
  }
}
