package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._

/** Equivalence witness for the native fused SimHashBits expression: the
  * composed HOF formulation (one aggregate pass per bit) and the one-pass
  * native expression must agree bit-for-bit on real corpus text and on
  * the edge shapes (empty string, single token, NULL text), at both the
  * compact 16-bit width and the 60-bit dedup default. The DuckDB oracle
  * for q_simhash_hamming / q_dedup_simhash renders the composed formula,
  * so this witness is what keeps the native fast path oracle-green. */
class SimHashExprSpec extends SparkSpec {

  for (bits <- Seq(16, 60)) {
    test(s"native simhash$bits == composed simhash$bits on the documents fixture") {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val mismatches = docs
        .select(col("doc_id"),
          TextOps.simhashN(col("text"), bits).as("native"),
          TextOps.simhashComposed(col("text"), bits).as("composed"))
        .filter(!(col("native") <=> col("composed")))
        .count()
      assert(mismatches == 0L)
    }
  }

  test("native simhash edge shapes: empty, single token, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("one"), Some("a b c d e f"), None)
      .toDF("text")
    for (bits <- Seq(16, 60)) {
      val rows = df.select(
          TextOps.simhashN(col("text"), bits).as("native"),
          TextOps.simhashComposed(col("text"), bits).as("composed"))
        .collect()
      rows.foreach { r =>
        assert(!r.isNullAt(0) && !r.isNullAt(1))
        assert(r.getLong(0) == r.getLong(1))
        // signature stays inside `bits` bits
        assert((r.getLong(0) & ~((1L << bits) - 1)) == 0L)
      }
      // NULL text -> 0 on both paths (the composed form's when/otherwise
      // swallows the NULL vote sums; the oracle's CASE ... ELSE 0 agrees)
      assert(rows.last.getLong(0) == 0L && rows.last.getLong(1) == 0L)
    }
  }
}
