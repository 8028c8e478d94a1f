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
    MinHashImpl.signature(salt, nDigests, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashImpl.signature($saltRef, $nDigests, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHash60 =
    copy(child = newChild)
}

/** MinHash60 over word n-gram shingles built inline from the token array:
  * `tokens -> shingles (concat_ws ' ') -> signature` in one traversal —
  * value-identical to `MinHash60(TextOps.shingles(...))` but without
  * materializing the shingle strings as an array column. */
case class MinHashShingle60(child: Expression, n: Int, salt: String, nDigests: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_shingle60"

  override protected def nullSafeEval(input: Any): Any =
    MinHashImpl.signatureFromTokens(salt, nDigests, n, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val saltRef = ctx.addReferenceObj("salt", salt, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.MinHashImpl.signatureFromTokens($saltRef, $nDigests, $n, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingle60 =
    copy(child = newChild)
}

/** Static helpers for generated code (separate from the expression
  * companions — see GenImpl note on static forwarders). */
object MinHashImpl {
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

  def signature(salt: String, nDigests: Int, arr: ArrayData): ArrayData = {
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

  /** Tokens -> n-gram shingles (space-joined, matching
    * concat_ws(' ', slice(tokens, i+1, n))) -> signature, one pass. */
  def signatureFromTokens(salt: String, nDigests: Int, n: Int, tokens: ArrayData): ArrayData = {
    val nTok = tokens.numElements()
    val out = new Array[Any](2 * nDigests)
    if (nTok < n) return new GenericArrayData(out) // no shingles -> all NULL
    val md = digests.get()
    val prefixes = Array.tabulate(nDigests)(j =>
      (salt + "/mh" + j + "|").getBytes(StandardCharsets.UTF_8))
    val mins = Array.fill(2 * nDigests)(Long.MaxValue)
    val toks = Array.tabulate(nTok)(i =>
      if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString)
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s <= nTok - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(s + k))
        k += 1
      }
      val bytes = sb.toString.getBytes(StandardCharsets.UTF_8)
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
      s += 1
    }
    var i = 0
    while (i < out.length) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }
}
