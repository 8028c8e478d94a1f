package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native fused SimHash over the low `bits` bits of the u60 token hash:
  * one pass over the token array computes the whole signature —
  * value-identical to the composed TextOps form (`transform(tokens, u60)`
  * + per-bit `aggregate` vote passes) but with ONE salted digest per
  * token instead of `bits`: Spark's higher-order functions are
  * interpreted (no codegen, no subexpression elimination across lambda
  * bodies), so the composed form re-walks the token-hash array per bit
  * position. At corpus scale the signature pass IS the simhash-dedup
  * cost (the band join moves two longs per doc), so this is the (b)-tier
  * custom-Expression path from the builder brief. Measured 2.25x over
  * the composed form on the sf0.1 documents projection (median of 7
  * interleaved A/B reps).
  *
  * Semantics mirrored exactly from the composed form:
  *  - bit i set iff sum over tokens of ((u60(tok)>>i)&1)*2-1 is > 0;
  *  - empty array -> 0 (aggregate over empty = zero votes, no bit wins);
  *  - a NULL element nullifies every vote accumulator, and the composed
  *    form's `when(votes > 0, _).otherwise(0)` turns that into 0 -> 0;
  *  - NULL array -> NULL here; the TextOps wrapper coalesces to 0 to
  *    match the composed/oracle `CASE ... ELSE 0` null swallow.
  */
case class SimHashBits(child: Expression, prefix: String, bits: Int)
  extends UnaryExpression {
  require(bits >= 1 && bits <= 60, "SimHashBits: u60 supplies at most 60 bits")

  override def dataType: DataType = LongType
  override def prettyName: String = s"simhash$bits"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash(prefix, bits, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("prefix", prefix, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SimHashImpl.simhash($prefixRef, $bits, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** Static helper for generated code (NOT a companion — see GenImpl note
  * on static forwarders). */
object SimHashImpl {
  def simhash(prefix: String, bits: Int, tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val votes = new Array[Long](bits)
    var e = 0
    while (e < n) {
      // composed-form parity: one NULL token poisons every accumulator
      if (tokens.isNullAt(e)) return 0L
      val h = GenImpl.u60(prefix, tokens.getUTF8String(e))
      var i = 0
      while (i < bits) {
        votes(i) += ((h >>> i) & 1L) * 2L - 1L
        i += 1
      }
      e += 1
    }
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }
}
