package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Equivalence witnesses for the native fused vector kernels (DotConst /
  * CosineConst / CosinePair) vs their HOF compositions: same
  * left-to-right double accumulation, so equality is exact (===), not
  * approximate — any ulp drift here would also break the DuckDB oracles.
  */
class VecExprSpec extends SparkSpec {
  import spark.implicits._

  private val q = Similarity.testQuery(64)

  test("native dot/cosineTo == composed on the embeddings fixture") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bad = e.select(
        Similarity.dot(col("embedding"), q).as("nd"),
        Similarity.dotComposed(col("embedding"), q).as("cd"),
        Similarity.cosineTo(col("embedding"), q).as("nc"),
        Similarity.cosineToComposed(col("embedding"), q).as("cc"))
      .filter(!(col("nd") <=> col("cd")) || !(col("nc") <=> col("cc")))
      .count()
    assert(bad == 0L)
  }

  test("native pairCosine == composed on fixture pairs") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(60).select(col("vec_id"), col("embedding"))
    val a = e.as("a")
    val b = e.as("b")
    val bad = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.pairCosine(col("a.embedding"), col("b.embedding")).as("n"),
        Similarity.pairCosineComposed(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(!(col("n") <=> col("c")))
      .count()
    assert(bad == 0L)
  }

  test("edge shapes: null array, null element, length mismatch, empty") {
    val rows = Seq(
      (1L, Some(Seq(1.0f, 2.0f, 3.0f))),
      (2L, None),
      (3L, Some(Seq(1.0f))) // shorter than q
    ).toDF("id", "v")
    val q3 = Seq(1.0, 2.0, 3.0)
    val out = rows.select(col("id"),
        Similarity.dot(col("v"), q3).as("nd"),
        Similarity.dotComposed(col("v"), q3).as("cd"),
        Similarity.cosineTo(col("v"), q3).as("nc"),
        Similarity.cosineToComposed(col("v"), q3).as("cc"),
        Similarity.pairCosine(col("v"), col("v")).as("np"),
        Similarity.pairCosineComposed(col("v"), col("v")).as("cp"))
      .orderBy("id").collect()
    out.foreach { r =>
      for ((n, c) <- Seq((1, 2), (3, 4), (5, 6))) {
        assert(r.isNullAt(n) == r.isNullAt(c), s"null mismatch id=${r.getLong(0)} col=$n")
        if (!r.isNullAt(n))
          // NaN == NaN must count as agreement (empty vectors cosine to NaN)
          assert(java.lang.Double.compare(r.getDouble(n), r.getDouble(c)) == 0,
            s"value mismatch id=${r.getLong(0)} col=$n: ${r.getDouble(n)} vs ${r.getDouble(c)}")
      }
    }
    // null-element case: aggregate's accumulator goes null
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT), CAST(3.0 AS FLOAT)) AS v")
    val r2 = withNullElem.select(
        Similarity.dot(col("v"), q3).as("nd"),
        Similarity.dotComposed(col("v"), q3).as("cd")).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
    // zero-norm case: the composed form THROWS under ANSI; the native
    // kernels deliberately yield NaN (one zero vector must not kill a
    // corpus-scale job; NaN fails every >= tau filter). Empty-vs-empty
    // and zero-vs-query both hit it.
    val empty = spark.sql("SELECT CAST(array() AS ARRAY<FLOAT>) AS v")
    val r3 = empty.select(
        Similarity.pairCosine(col("v"), col("v")).as("np")).collect()(0)
    assert(r3.getDouble(0).isNaN)
    val zeros = Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val r4 = zeros.select(Similarity.cosineTo(col("v"), q3).as("nc")).collect()(0)
    assert(r4.getDouble(0).isNaN)
  }
}
