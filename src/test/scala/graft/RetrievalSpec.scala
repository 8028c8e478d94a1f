package graft

import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** BM25 retrieval: independent BigInt witness of the integer scoring,
  * double-precision ordering sanity, df=0 behavior, boundary margin for
  * the nano-nat idf on the real fixture domain, and the scalable plan
  * shape (WindowGroupLimit, no cartesian products). */
class RetrievalSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  /** Plain-Scala witness: same integer formulation, no Spark/Catalyst
    * involvement — tokenize with String.split, BigInt arithmetic. */
  private def witness(queries: Seq[(Int, Seq[String])], k: Int): Map[(Int, Long), Long] = {
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val n = rows.length.toLong
    val t = rows.map(_._2.length.toLong).sum
    def lnNano(x: Long): Long = math.floor(math.log(x.toDouble) * 1e9 + 0.5).toLong
    val out = scala.collection.mutable.Map[(Int, Long), Long]()
    for ((qid, terms) <- queries; term <- terms.distinct) {
      val hits = rows.flatMap { case (id, ts) =>
        val tf = ts.count(_ == term).toLong
        if (tf > 0) Some((id, tf, ts.length.toLong)) else None
      }
      if (hits.nonEmpty) {
        val df = hits.length.toLong
        val idf = lnNano(2 * n + 2) - lnNano(2 * df + 1)
        for ((id, tf, dl) <- hits) {
          val num = BigInt(22) * tf * t
          val den = BigInt(10) * t * tf + BigInt(3) * t + BigInt(9) * dl * n
          val w = ((BigInt(2) * idf * num + den) / (BigInt(2) * den)).toLong
          out((qid, id)) = out.getOrElse((qid, id), 0L) + w
        }
      }
    }
    out.toMap
  }

  test("bm25 scores equal the independent BigInt witness, top-k rank order holds") {
    val k = 10
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Retrieval.DefaultQueries, k)
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getLong(2), r.getInt(3))))
      .toMap
    val exp = witness(Retrieval.DefaultQueries, k)
    // every returned (query, doc) score matches the witness exactly
    got.foreach { case (key, (score, _)) =>
      assert(exp.get(key).contains(score), s"score mismatch at $key: $score vs ${exp.get(key)}")
    }
    // the returned set per query IS the witness's top-k under the same
    // (score desc, doc asc) order
    Retrieval.DefaultQueries.map(_._1).foreach { qid =>
      val expTop = exp.collect { case ((q, id), s) if q == qid => (id, s) }.toSeq
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)
      val gotTop = got.collect { case ((q, id), (_, r)) if q == qid => (r, id) }.toSeq
        .sortBy(_._1).map(_._2)
      assert(gotTop == expTop, s"top-k for query $qid: $gotTop vs $expTop")
    }
  }

  test("bm25 ranking agrees with the double-precision textbook formula") {
    // the nano quantization must not reorder docs that the plain double
    // BM25 separates by more than the quantization noise
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val n = rows.length.toDouble
    val avgdl = rows.map(_._2.length).sum / n
    def bm25(qid: Int, terms: Seq[String]): Map[Long, Double] = {
      val out = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (term <- terms.distinct) {
        val hits = rows.flatMap { case (id, ts) =>
          val tf = ts.count(_ == term); if (tf > 0) Some((id, tf, ts.length)) else None
        }
        if (hits.nonEmpty) {
          val idf = math.log((n - hits.length + 0.5) / (hits.length + 0.5) + 1)
          for ((id, tf, dl) <- hits)
            out(id) += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }
      }
      out.toMap
    }
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Retrieval.DefaultQueries, 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(3)))
    Retrieval.DefaultQueries.foreach { case (qid, terms) =>
      val ref = bm25(qid, terms)
      val ranked = got.filter(_._1 == qid).sortBy(_._3).map(_._2)
      ranked.sliding(2).foreach {
        case Array(a, b) =>
          // double score of a must be >= b's minus quantization slack (5e-9
          // per term, generous 1e-6 here)
          assert(ref(a) >= ref(b) - 1e-6, s"q$qid: doc $a (${ref(a)}) ranked above $b (${ref(b)})")
        case _ =>
      }
    }
  }

  test("df=0 query terms contribute nothing (q5 carries 'zzz')") {
    val withZzz = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(5 -> Seq("vector", "spark", "zzz")), 10).collect()
    val without = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(5 -> Seq("vector", "spark")), 10).collect()
    assert(withZzz.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      without.map(r => (r.getLong(1), r.getLong(2))).toSeq)
  }

  test("nano-nat idf inputs clear the flooring boundary on the fixture domain") {
    // idf's ln inputs are 2·df+1 and 2·N+2 for every query term, at both
    // verify scales; (1..1000) in CurationSpec already covers sf0.01's
    // range (N=500) — pin sf0.1's domain here (N≈5000, so inputs ≤ 2N+2)
    val d01 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val nBig = d01.count()
    val terms = Retrieval.DefaultQueries.flatMap(_._2).distinct
    // df per term = docs containing the term
    val dfVals = d01.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin(terms: _*)).distinct()
      .groupBy("t").count().select("count").collect().map(_.getLong(0))
    val domain = dfVals.map(2 * _ + 1) ++ Seq(2 * nBig + 2)
    domain.foreach { v =>
      val x = math.log(v.toDouble) * 1e9 + 0.5
      val dist = math.abs(x - math.rint(x))
      assert(dist > 1e-4, s"ln($v)*1e9 too close to a flooring boundary: $x")
    }
  }

  test("plan: WindowGroupLimit top-k, no cartesian products, scan-side term filter") {
    val df = Retrieval.bm25TopK(docs, "doc_id", "text")
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), "top-k should use WindowGroupLimit")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"unexpected join strategy:\n$plan")
  }
}
