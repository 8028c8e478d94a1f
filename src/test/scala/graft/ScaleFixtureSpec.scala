package graft

import org.apache.spark.sql.functions._


/** The scale-rehearsal fixture builder must preserve exactly what the
  * oracle battery relies on: FK integrity across every shifted domain,
  * key uniqueness, fixed dims untouched, payloads verbatim. Proven at
  * sf0.001 × 3 (the same machinery built the round-14 sf1 set). */
class ScaleFixtureSpec extends SparkSpec {

  test("CLI guards: unknown flags fail loudly before any Spark work") {
    // a silently-dropped typo ("--plant=...", "--perturb=true") would
    // build the wrong fixture / emit stats with the recall block missing
    val e1 = intercept[IllegalArgumentException](
      ScaleFixture.main(Array("/nope", "/out", "3", "--perturb=true")))
    assert(e1.getMessage.contains("unknown flag"))
    val e2 = intercept[IllegalArgumentException](
      LshStats.main(Array("/nope", "--plant=/src")))
    assert(e2.getMessage.contains("unknown flag"))
    val e3 = intercept[IllegalArgumentException](
      LshStats.main(Array("/nope", "--planted", "/src")))
    assert(e3.getMessage.contains("unknown flag"))
  }

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

  test("overflow guard: a key column too narrow for the shift fails loudly") {
    // doc_id narrowed to int with a value near Int.MaxValue: unit jumps
    // to 10^10, so even replica 1 wraps a 32-bit key — the fixture must
    // refuse up front instead of silently corrupting uniqueness/FKs
    val src = java.nio.file.Files.createTempDirectory("graft_sf_narrow").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"))
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .write.parquet(s"$src/$t.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("doc_id",
        (col("doc_id") + lit(2000000000L - 100)).cast("int"))
      .write.parquet(s"$src/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft_sf_narrow_out").toString
    val ex = intercept[IllegalArgumentException] {
      ScaleFixture.replicate(spark, src, out, replicas = 3, files = 2)
    }
    assert(ex.getMessage.contains("documents.doc_id"), ex.getMessage)
    assert(ex.getMessage.contains("type ceiling"), ex.getMessage)
    // nothing was written — the check runs before any output
    assert(!new java.io.File(s"$out/documents.parquet").exists())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(src))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("perturbation: deterministic, planted near-dups at two intensities, LSH recalls them") {
    val out = java.nio.file.Files.createTempDirectory("graft_sf_pert").toString
    ScaleFixture.replicate(spark, "/root/testdata/sf0.001", out,
      replicas = 4, files = 4, perturb = true)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = src.count()
    val unit = { var u = 1L
      val m = src.agg(max("doc_id")).head.getLong(0)
      while (u <= m) u *= 10; u }

    // pair every replica doc with its source original
    val paired = docs
      .withColumn("rep", (col("doc_id") / unit).cast("int"))
      .withColumn("src_id", pmod(col("doc_id"), lit(unit)))
      .join(src.select(col("doc_id").as("src_id"), col("text").as("src_text")),
        "src_id")
    // even replicas verbatim; odd replicas actually changed
    assert(paired.filter(col("rep") % 2 === 0 &&
      col("text") =!= col("src_text")).count() == 0)
    val changed = paired.filter(col("rep") % 2 === 1 &&
      col("text") =!= col("src_text")).count()
    assert(changed >= 2 * n * 9 / 10, s"odd replicas must be perturbed: $changed of ${2 * n}")

    // planted token-set Jaccard sits in the near-dup regime, and the
    // light replica (1) is measurably closer than the heavy one (3)
    def meanJac(rep: Int): Double = paired.filter(col("rep") === rep)
      .select(avg(
        size(array_intersect(split(col("text"), " "), split(col("src_text"), " ")))
          .cast("double") /
        size(array_union(split(col("text"), " "), split(col("src_text"), " ")))))
      .head.getDouble(0)
    val (jLight, jHeavy) = (meanJac(1), meanJac(3))
    assert(jLight > jHeavy, s"light $jLight must beat heavy $jHeavy")
    assert(jLight > 0.6 && jLight < 0.995, s"light Jaccard $jLight")
    assert(jHeavy > 0.3 && jHeavy < 0.97, s"heavy Jaccard $jHeavy")

    // MinHash-LSH candidate generation recalls most LIGHT planted pairs:
    // same one-hop representative as the source doc (the heavy replica is
    // the deliberate band-miss regime — no floor asserted there)
    val reps = graft.llm.Dedup.minhashLsh(docs, "doc_id", "text")
    val srcRep = reps.filter(col("doc_id") < unit)
      .select(col("doc_id").as("src_id"), col("near_dup_rep").as("src_rep"))
    val lightRecall = reps
      .withColumn("rep", (col("doc_id") / unit).cast("int"))
      .filter(col("rep") === 1)
      .withColumn("src_id", pmod(col("doc_id"), lit(unit)))
      .join(srcRep, "src_id")
      .select(avg(when(col("near_dup_rep") === col("src_rep"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(lightRecall >= 0.5, s"LSH must recall light planted pairs: $lightRecall")

    // same seed ⇒ identical fixture (content-level: the perturbation is
    // pure hash arithmetic, no rand())
    val out2 = java.nio.file.Files.createTempDirectory("graft_sf_pert2").toString
    ScaleFixture.replicate(spark, "/root/testdata/sf0.001", out2,
      replicas = 4, files = 4, perturb = true)
    val again = spark.read.parquet(s"$out2/documents.parquet")
    assert(docs.join(again, Seq("doc_id"))
      .filter(docs("text") =!= again("text")).count() == 0)
    assert(again.count() == docs.count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out2))
  }
}
