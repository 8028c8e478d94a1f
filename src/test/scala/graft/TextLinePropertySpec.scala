package graft

import org.apache.spark.sql.functions._
import graft.llm.{Corpus, TextOps}

import scala.util.Random

/** Randomized model checks for the line-level text operators: the Spark
  * expressions/plans vs naive driver-side Scala models over adversarial
  * corpora (empty lines, repeated lines, single-line docs, line sets
  * straddling the boilerplate threshold). Seeded PRNG — reproducible. */
class TextLinePropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260813L)
  // a tiny line alphabet forces heavy cross-doc and within-doc repetition
  private val lineAlphabet = Vector("alpha", "beta", "gamma", "", "  ", "delta one",
    "shared footer", "nav bar", "x")

  private def randomDoc(): String =
    (0 until rnd.nextInt(7)).map(_ => lineAlphabet(rnd.nextInt(lineAlphabet.size)))
      .mkString("\n")

  test("dedupLines matches the naive first-occurrence model (200 random docs)") {
    val docs = (1 to 200).map(i => (i.toLong, randomDoc()))
    val out = docs.toDF("id", "text")
      .select(col("id"), TextOps.dedupLines(col("text")).as("clean"))
      .as[(Long, String)].collect().toMap
    for ((id, text) <- docs) {
      val expected = text.split("\n", -1).distinct.mkString("\n")
      assert(out(id) == expected, s"doc $id: ${text.replace("\n", "\\n")}")
    }
  }

  test("removeBoilerplateLines matches the naive corpus model (20 random corpora)") {
    for (trial <- 1 to 20) {
      val nDocs = 3 + rnd.nextInt(8)
      val docs = (1 to nDocs).map(i => (i.toLong, randomDoc()))
      val minDocs = 2 + rnd.nextInt(3)
      // model: line -> distinct doc count over non-blank lines
      val docFreq = docs
        .flatMap { case (id, t) => t.split("\n", -1).filter(_.trim.nonEmpty).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
      val common = docFreq.filter(_._2 >= minDocs).keySet
      val expected = docs.map { case (id, t) =>
        id -> t.split("\n", -1).filterNot(common).mkString("\n")
      }.toMap
      val out = Corpus.removeBoilerplateLines(docs.toDF("id", "text"), "id", "text", minDocs)
        .as[(Long, String)].collect().toMap
      assert(out == expected, s"trial $trial minDocs=$minDocs docs=$docs")
    }
  }
}
