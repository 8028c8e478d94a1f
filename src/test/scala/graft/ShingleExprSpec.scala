package graft

import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** Equivalence witness for the native ShingleMd5 kernel vs the composed
  * HOF shingle-digest formulation — the span-dedup oracle renders the
  * composed formula in DuckDB, so this is what keeps the fast path
  * oracle-green. */
class ShingleExprSpec extends SparkSpec {
  import spark.implicits._

  test("native shingle digests == composed on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextOps.tokens(col("text")).as("toks"))
    for (k <- Seq(2, 6)) {
      val bad = docs.select(
          Dedup.spansShingles(col("toks"), k).as("n"),
          Dedup.spansShinglesComposed(col("toks"), k).as("c"))
        .filter(!(col("n") <=> col("c")))
        .count()
      assert(bad == 0L, s"k=$k mismatch")
    }
  }

  test("edge shapes: short docs, exact-k docs, null text") {
    val df = Seq(Some("a b c d e f g"), Some("a b"), Some(""), None).toDF("text")
      .select(TextOps.tokens(col("text")).as("toks"))
    val rows = df.select(
        Dedup.spansShingles(col("toks"), 6).as("n"),
        Dedup.spansShinglesComposed(col("toks"), 6).as("c"))
      .collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1)) // both arms yield arrays
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // 7 tokens, k=6 -> 2 shingles; short/empty/null -> empty
    assert(rows(0).getSeq[String](0).length == 2)
    assert(rows.drop(1).forall(_.getSeq[String](0).isEmpty))
  }
}
