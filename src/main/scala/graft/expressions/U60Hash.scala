package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets

/** Native codegen form of the Gen.u60 kernel: salted MD5 of the input's
  * UTF-8 bytes, first 60 bits as a non-negative Long — value-identical to
  * the built-in composition `conv(substring(md5(concat(prefix, s)),1,15),
  * 16,10)` but with no hex-string materialization and no base-16 parse
  * (one digest + nibble fold per row). Deterministic, NULL-intolerant
  * (NULL in → NULL out), codegen-friendly via a static helper call — this
  * is the (b)-tier custom-Expression path from the builder brief, used
  * where the operator is hot enough to matter.
  */
case class U60Hash(child: Expression, prefix: String)
  extends UnaryExpression {

  // caller guarantees a StringType child (Gen.u60 casts)
  override def dataType: DataType = LongType
  override def prettyName: String = "u60_hash"

  override protected def nullSafeEval(input: Any): Any =
    GenImpl.u60(prefix, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("prefix", prefix, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expressions.GenImpl.u60($prefixRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): U60Hash =
    copy(child = newChild)
}

/** Static helpers for generated code. NOTE: deliberately NOT companion
  * objects of the expressions — a companion method named `eval` gets no
  * static forwarder (clash with Expression.eval), which makes Janino
  * reject the generated call and silently falls back to interpreted
  * execution. */
object GenImpl {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static entry shared by interpreted and generated code paths. */
  def u60(prefix: String, s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    md.update(prefix.getBytes(StandardCharsets.UTF_8))
    md.update(s.getBytes)
    val d = md.digest()
    // fold the first 15 hex nibbles (60 bits), matching
    // conv(substring(hex,1,15),16,10)
    var v = 0L
    var i = 0
    while (i < 15) {
      val b = d(i / 2) & 0xFF
      val nib = if (i % 2 == 0) b >>> 4 else b & 0xF
      v = (v << 4) | nib.toLong
      i += 1
    }
    v
  }
}
