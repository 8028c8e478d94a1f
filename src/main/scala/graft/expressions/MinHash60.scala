package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets

/** Native MinHash signature: one pass over the shingle array computes all
  * `2 * nDigests` minhash streams (digest j carries streams 2j and 2j+1 —
  * hex nibbles 1-15 and 16-30), value-identical to the TextOps
  * shingleDigests/minhashFrom composition but with no intermediate hex
  * string arrays and no per-stream array traversals. Empty input yields
  * an all-NULL signature (matching array_min over an empty transform),
  * so shingle-less docs produce NULL bands and stay un-bucketed.
  */
case class MinHash60(child: Expression, salt: String, nDigests: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash60"

  override protected def nullSafeEval(input: Any): Any =
    MinHash60.eval(salt, nDigests, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHash60.eval($saltRef, $nDigests, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash60 =
    copy(child = newChild)
}

object MinHash60 {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private def slice(d: Array[Byte], startNibble: Int): Long = {
    var v = 0L
    var i = startNibble
    val end = startNibble + 15
    while (i < end) {
      val b = d(i / 2) & 0xFF
      val nib = if (i % 2 == 0) b >>> 4 else b & 0xF
      v = (v << 4) | nib.toLong
      i += 1
    }
    v
  }

  def eval(salt: String, nDigests: Int, arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](2 * nDigests)
    if (n == 0) return new GenericArrayData(out) // all NULL
    val md = digests.get()
    val prefixes = Array.tabulate(nDigests)(j =>
      (salt + "/mh" + j + "|").getBytes(StandardCharsets.UTF_8))
    val mins = Array.fill(2 * nDigests)(Long.MaxValue)
    var contributed = false
    var e = 0
    while (e < n) {
      if (!arr.isNullAt(e)) {
        contributed = true
        val bytes = arr.getUTF8String(e).getBytes
        var j = 0
        while (j < nDigests) {
          md.reset()
          md.update(prefixes(j))
          md.update(bytes)
          val d = md.digest()
          val a = slice(d, 0)
          val b = slice(d, 15)
          if (a < mins(2 * j)) mins(2 * j) = a
          if (b < mins(2 * j + 1)) mins(2 * j + 1) = b
          j += 1
        }
      }
      e += 1
    }
    if (!contributed) return new GenericArrayData(out) // all NULL
    var i = 0
    while (i < out.length) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }
}
