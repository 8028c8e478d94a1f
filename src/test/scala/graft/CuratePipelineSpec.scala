package graft

import org.apache.spark.sql.functions._

import graft.llm.CuratePipeline
import graft.llm.CuratePipeline.{Config, Step}

/** Config-driven curation chain: parsing, step semantics, E2E CLI run. */
class CuratePipelineSpec extends SparkSpec {

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("parse: steps, typed params, env interpolation, defaults") {
    val cfg = CuratePipeline.parse(
      """{ "input": "documents", "report": true,
           "steps": [
             {"op": "normalize"},
             {"op": "length_filter", "min_tokens": 3, "max_tokens": "${MAXTOK}"},
             {"op": "sample_hash", "rate": 2}
           ] }""",
      env = Map("MAXTOK" -> "9999"))
    assert(cfg.id == "doc_id" && cfg.text == "text" && cfg.report)
    assert(cfg.steps.map(_.op) == Seq("normalize", "length_filter", "sample_hash"))
    assert(cfg.steps(1).params == Map("min_tokens" -> "3", "max_tokens" -> "9999"))
    intercept[IllegalArgumentException] {
      CuratePipeline.parse("""{"steps": [{"op": "no_such_op"}]}""") match {
        case c => CuratePipeline.run(c, _ => docs)
      }
    }
  }

  test("steps compose: counts only ever shrink; dedup keeps min-id reps") {
    val cfg = Config("documents", "doc_id", "text", Seq(
      Step("normalize", Map.empty),
      Step("dedup_exact", Map.empty),
      Step("dedup_minhash", Map.empty),
      Step("length_filter", Map("min_tokens" -> "3", "max_tokens" -> "10000")),
      Step("quality_filter", Map("min_milli" -> "100")),
      Step("pii_scrub", Map.empty),
      Step("sample_hash", Map("rate" -> "2"))), report = true)
    val (out, stats) = CuratePipeline.run(cfg, _ => docs)
    val counts = stats.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"step grew the corpus: $stats")
    assert(out.count() == counts.last && counts.last > 0)
    // schema preserved through row-preserving chain
    assert(out.columns.toSet == docs.columns.toSet)
  }

  test("decontaminate drops exactly the holdout-identical docs") {
    val holdout = docs.filter(col("doc_id") % 7 === 0).select("text")
    val cfg = Config("documents", "doc_id", "text",
      Seq(Step("decontaminate", Map("holdout" -> "__holdout"))), report = false)
    val (out, _) = CuratePipeline.run(cfg,
      { case "__holdout" => holdout; case _ => docs })
    val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = docs.alias("d")
      .join(holdout.alias("h"), expr("d.text = h.text"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.intersect(contaminated).isEmpty)
    assert(survivors.size == docs.count() - contaminated.size)
  }

  test("extended steps: near-decontamination, span dedup, quota, terminal chunk") {
    val holdout = docs.filter(col("doc_id") % 11 === 0)
    val cfg = Config("documents", "doc_id", "text", Seq(
      Step("decontaminate_near", Map("holdout" -> "__holdout")),
      Step("dedup_spans", Map("k" -> "6")),
      Step("boilerplate_lines", Map("min_docs" -> "3")),
      Step("stratified_quota", Map("group" -> "source", "quota" -> "20")),
      Step("chunk", Map("chunk_tokens" -> "32", "overlap" -> "8"))), report = true)
    val (out, stats) = CuratePipeline.run(cfg,
      { case "__holdout" => holdout; case _ => docs })
    // near-decontamination at least drops the holdout docs themselves
    val afterNear = stats.find(_._1 == "decontaminate_near").get._2
    assert(afterNear <= docs.count() - holdout.count())
    // quota bounds every source at 20 docs
    val afterQuota = stats.find(_._1 == "stratified_quota").get._2
    val nSources = docs.select("source").distinct().count()
    assert(afterQuota <= 20L * nSources)
    // terminal chunk explodes rows; schema switches to the chunk shape
    assert(out.columns.toSet ==
      Set("doc_id", "chunk_id", "chunk_text", "n_chunk_tokens"))
    assert(out.count() >= afterQuota)
    assert(out.agg(max("n_chunk_tokens")).head().getInt(0) <= 32)
  }

  test("mix and weighted-topk steps: per-source proportions and exact-k") {
    val srcs = docs.select("source").distinct().collect().map(_.getString(0)).sorted
    val cfg = Config("documents", "doc_id", "text", Seq(
      Step("mix_by_group", Map("group" -> "source",
        "proportions" -> s"${srcs.head}=1.0", "default" -> "0.0"))), report = false)
    val (mixed, _) = CuratePipeline.run(cfg, _ => docs)
    // proportion 1.0 keeps all of srcs.head; default 0.0 drops the rest
    assert(mixed.select("source").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(srcs.head))
    assert(mixed.count() == docs.filter(col("source") === srcs.head).count())
    val cfg2 = Config("documents", "doc_id", "text", Seq(
      Step("weighted_topk", Map("group" -> "source", "k" -> "5"))), report = false)
    val (topk, _) = CuratePipeline.run(cfg2, _ => docs)
    topk.groupBy("source").count().collect().foreach { r =>
      assert(r.getLong(1) <= 5L, s"${r.getString(0)} over k")
    }
  }

  test("expect_gate: passing rules flow through, violations abort the chain") {
    val okRules = """{"rules": [{"column": "doc_id", "kind": "unique"}]}"""
    val cfgOk = Config("documents", "doc_id", "text",
      Seq(Step("expect_gate", Map("rules" -> okRules)),
        Step("sample_hash", Map("rate" -> "2"))), report = false)
    val (out, _) = CuratePipeline.run(cfgOk, _ => docs)
    assert(out.count() > 0)
    val badRules = """{"rules": [{"column": "n_chars", "kind": "max", "bound": "10"}]}"""
    val cfgBad = Config("documents", "doc_id", "text",
      Seq(Step("expect_gate", Map("rules" -> badRules))), report = false)
    val e = intercept[IllegalArgumentException] {
      CuratePipeline.run(cfgBad, _ => docs)
    }
    assert(e.getMessage.contains("expect_gate failed"))
  }

  test("multi-pass blocking recovers pairs a single key misses") {
    import graft.ops.RecordLinkage
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_name")
    val perturbed = cust.select(col("c_custkey").as("p_key"),
      translate(col("c_name"), "1", "I").as("p_name"))
    def single(blk: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)) =
      RecordLinkage.fuzzyJoin(cust, "c_custkey", "c_name", blk._1,
        perturbed, "p_key", "p_name", blk._2, maxDist = 3)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val suffix = (RecordLinkage.suffixBlock(col("c_name")),
      RecordLinkage.suffixBlock(col("p_name")))
    // prefix on the LAST 6 chars' first 3 = a different slice
    val mid = (upper(substring(col("c_name"), -6, 3)),
      upper(substring(col("p_name"), -6, 3)))
    val multi = RecordLinkage.fuzzyJoinMulti(cust, "c_custkey", "c_name",
        perturbed, "p_key", "p_name", Seq(suffix, mid), maxDist = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi == single(suffix) ++ single(mid))
    assert(multi.size >= single(suffix).size)
  }

  test("E2E CLI: curate writes parquet + report, token budget bounds sources") {
    val outDir = "/tmp/curate_e2e"
    val cfgJson =
      """{ "input": "documents", "report": true,
           "steps": [
             {"op": "dedup_exact"},
             {"op": "token_budget", "group": "source", "budget": 2000}
           ] }"""
    CuratePipeline.main(spark, cfgJson, "/root/testdata/sf0.001", outDir)
    val curated = spark.read.parquet(s"$outDir/curated.parquet")
    val report = scala.io.Source.fromFile(s"$outDir/curate_report.json").mkString
    assert(report.contains("\"step\":\"input\"") && report.contains("token_budget"))
    // every source's surviving token count respects the budget
    val perSource = curated
      .select(col("source"), graft.llm.TextOps.tokenCount(col("text")).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("tot")).collect()
    perSource.foreach(r => assert(r.getLong(1) <= 2000L,
      s"${r.getString(0)} over budget: ${r.getLong(1)}"))
  }
}
