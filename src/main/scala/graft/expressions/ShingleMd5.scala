package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets

/** Native fused k-token shingle digests: tokens -> array of md5 hex
  * strings of the space-joined k-windows, one pass — value-identical to
  * the composed `transform(sequence(1, n-k+1), j -> md5(concat_ws(' ',
  * slice(toks, j, k))))` but without the interpreted HOF machinery (the
  * transform body is evaluated per element with no codegen and the slice
  * materializes a boxed sub-array per window). The span-dedup pass runs
  * this shingling TWICE over the corpus by design (frequency pass +
  * probe pass; recompute-over-materialize), so the kernel pays off
  * double.
  *
  * Semantics mirrored exactly:
  *  - fewer than k tokens -> EMPTY array (the composed form's
  *    when/otherwise arm; the TextOps wrapper coalesces NULL input to
  *    empty the same way);
  *  - NULL tokens are skipped by the join exactly as concat_ws skips
  *    them (no separator emitted) — unobservable for split()-produced
  *    arrays but pinned for parity;
  *  - digests are lowercase hex of the UTF-8 bytes, like the md5()
  *    builtin.
  */
case class ShingleMd5(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "ShingleMd5: k must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"shingle_md5_$k"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.md5Shingles(k, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleImpl.md5Shingles($k, $c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleMd5 =
    copy(child = newChild)
}

/** Static helpers for generated code (NOT a companion — see GenImpl note
  * on static forwarders). */
object ShingleImpl {
  private val digests = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))
  private val HEX = "0123456789abcdef".toCharArray

  def md5Shingles(k: Int, toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(new Array[Any](0))
    val md = digests.get()
    val strs = Array.tabulate(n)(i =>
      if (toks.isNullAt(i)) null else toks.getUTF8String(i).toString)
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s <= n - k) {
      sb.setLength(0)
      var first = true
      var j = 0
      while (j < k) {
        val t = strs(s + j)
        // concat_ws semantics: NULL elements are skipped, no separator
        if (t != null) {
          if (!first) sb.append(' ')
          sb.append(t)
          first = false
        }
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HEX((d(b) >> 4) & 0xF)
        hex(2 * b + 1) = HEX(d(b) & 0xF)
        b += 1
      }
      out(s) = UTF8String.fromString(new String(hex))
      s += 1
    }
    new GenericArrayData(out)
  }
}
