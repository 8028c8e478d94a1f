package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType

/** SparkSessionExtensions entry point — activates graft's native
  * expressions on any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (the (c)-tier extension wiring from the builder brief; equivalent to
  * `GraftBridge.registerFunctions` for already-running sessions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("u60_hash"),
      new ExpressionInfo(classOf[graft.expressions.U60Hash].getName, "u60_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "u60_hash(input, prefix_literal)")
        val prefix = exprs(1) match {
          case Literal(v, StringType) => v.toString
          case other => throw new IllegalArgumentException(
            s"u60_hash: prefix must be a string literal, got $other")
        }
        graft.expressions.U60Hash(Cast(exprs(0), StringType), prefix)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash60"),
      new ExpressionInfo(classOf[graft.expressions.MinHash60].getName, "minhash60"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3, "minhash60(shingle_array, salt_literal, n_digests)")
        (exprs(1), exprs(2)) match {
          case (Literal(s, StringType), Literal(n, _)) =>
            graft.expressions.MinHash60(exprs(0), s.toString, n.toString.toInt)
          case other => throw new IllegalArgumentException(
            s"minhash60: literal args required, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("big_uniform_mod"),
      new ExpressionInfo(classOf[graft.expressions.BigUniformMod].getName, "big_uniform_mod"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 4, "big_uniform_mod(digits, width_lit, min_units_lit, scale_lit)")
        (exprs(1), exprs(2), exprs(3)) match {
          case (Literal(w, StringType), Literal(m, StringType), Literal(s, _)) =>
            graft.expressions.BigUniformMod(Cast(exprs(0), StringType),
              w.toString, m.toString, s.toString.toInt)
          case other => throw new IllegalArgumentException(
            s"big_uniform_mod: width/min/scale must be literals, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("digest_hex"),
      new ExpressionInfo(classOf[graft.expressions.DigestHex].getName, "digest_hex"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "digest_hex(input, algo_literal)")
        exprs(1) match {
          case Literal(a, StringType) =>
            graft.expressions.DigestHex(Cast(exprs(0), StringType), a.toString)
          case other => throw new IllegalArgumentException(
            s"digest_hex: algo must be a string literal, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[graft.expressions.SimHashBits].getName, "simhash_bits"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3, "simhash_bits(token_array, prefix_literal, bits_literal)")
        (exprs(1), exprs(2)) match {
          case (Literal(p, StringType), Literal(b, _)) =>
            graft.expressions.SimHashBits(exprs(0), p.toString, b.toString.toInt)
          case other => throw new IllegalArgumentException(
            s"simhash_bits: literal args required, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_md5"),
      new ExpressionInfo(classOf[graft.expressions.ShingleMd5].getName, "shingle_md5"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "shingle_md5(token_array, k_literal)")
        exprs(1) match {
          case Literal(k, _) => graft.expressions.ShingleMd5(exprs(0), k.toString.toInt)
          case other => throw new IllegalArgumentException(
            s"shingle_md5: k must be a literal, got $other")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_pair"),
      new ExpressionInfo(classOf[graft.expressions.CosinePair].getName, "cosine_pair"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2, "cosine_pair(vec_a, vec_b)")
        graft.expressions.CosinePair(exprs(0), exprs(1))
      }))
  }
}
