package graft

import org.apache.spark.sql.functions._


/** The scale-rehearsal fixture builder must preserve exactly what the
  * oracle battery relies on: FK integrity across every shifted domain,
  * key uniqueness, fixed dims untouched, payloads verbatim. Proven at
  * sf0.001 × 3 (the same machinery built the round-14 sf1 set). */
class ScaleFixtureSpec extends SparkSpec {

  test("replicate: counts scale, keys stay unique, FKs stay closed, dims fixed") {
    val out = java.nio.file.Files.createTempDirectory("graft_scalefix").toString
    ScaleFixture.replicate(spark, "/root/testdata/sf0.001", out,
      replicas = 3, files = 4)
    def rd(t: String) = spark.read.parquet(s"$out/$t.parquet")
    def src(t: String) = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")

    // fact tables 3×, fixed dims 1×
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      assert(rd(t).count() == 3 * src(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(rd(t).count() == src(t).count(), t)

    // single-column keys remain unique after shifting
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
                       "part" -> "p_partkey", "supplier" -> "s_suppkey",
                       "documents" -> "doc_id", "embeddings" -> "vec_id"))
      assert(rd(t).select(k).distinct().count() == rd(t).count(), s"$t.$k")

    // every FK domain stays closed (shift units agree across tables)
    def orphans(fact: String, fk: String, dim: String, pk: String) =
      rd(fact).join(rd(dim), col(fk) === col(pk), "left_anti").count()
    assert(orphans("orders", "o_custkey", "customer", "c_custkey") == 0)
    assert(orphans("lineitem", "l_orderkey", "orders", "o_orderkey") == 0)
    assert(orphans("lineitem", "l_partkey", "part", "p_partkey") == 0)
    assert(orphans("lineitem", "l_suppkey", "supplier", "s_suppkey") == 0)
    assert(orphans("customer", "c_nationkey", "nation", "n_nationkey") == 0)

    // payloads copy verbatim: each source document text appears exactly
    // 3× (cross-replica exact duplicates are the dedup family's work)
    val perText = rd("documents").groupBy("text").count()
      .agg(min("count"), max("count")).head()
    assert(perText.getLong(0) == 3 && perText.getLong(1) == 3)

    // schema identical to the source (types survive the shift casts)
    for (t <- Seq("customer", "orders", "lineitem", "events",
                  "documents", "embeddings"))
      assert(rd(t).schema == src(t).schema, t)

    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
