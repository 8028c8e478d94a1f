package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hex digest of a string column for algorithms Spark has no built-in for
  * — the sha3 family of the reference's `Hash` transformer
  * (`internal/db/postgres/transformers/hash.go:35-80` supports
  * sha3-224/256/384/512). JDK 17 `MessageDigest` ships SHA3, so this is a
  * sibling of [[U60Hash]]: deterministic, NULL in → NULL out, one
  * thread-local digest instance per (thread, algo), codegen via a static
  * helper call.
  */
case class DigestHex(child: Expression, algo: String) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "digest_hex"

  override protected def nullSafeEval(input: Any): Any =
    DigestImpl.hex(algo, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val algoRef = ctx.addReferenceObj("algo", algo, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.expressions.DigestImpl.hex($algoRef, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DigestHex =
    copy(child = newChild)
}

/** Static helper shared by interpreted and generated code (same
  * non-companion pattern as [[GenImpl]] — a companion `eval` would clash
  * with Expression.eval and break the Janino static call). */
object DigestImpl {
  private val digests =
    ThreadLocal.withInitial[java.util.HashMap[String, java.security.MessageDigest]](() =>
      new java.util.HashMap[String, java.security.MessageDigest]())

  private val hexChars = "0123456789abcdef".toCharArray

  def hex(algo: String, s: UTF8String): UTF8String = {
    val map = digests.get()
    var md = map.get(algo)
    if (md == null) {
      md = java.security.MessageDigest.getInstance(algo)
      map.put(algo, md)
    }
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xFF
      out(2 * i) = hexChars(b >>> 4)
      out(2 * i + 1) = hexChars(b & 0xF)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}
