package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level aggregation operators for training-data pipelines —
  * the multi-row complements of the per-row [[TextOps]] expressions.
  * Both are single-shuffle plans that survive a 100 TB corpus:
  * vocabulary top-k is a map-side-combinable groupBy + TakeOrdered, and
  * contamination is a broadcast semi-join on exploded shingles (the probe
  * set — a benchmark's n-grams — is small by construction).
  */
object Corpus {

  /** Corpus vocabulary top-k: token -> frequency, k most frequent.
    * Plan shape: explode -> partial HashAggregate (map-side combine below
    * the exchange, so only distinct-token partials shuffle, never raw
    * tokens) -> final agg -> TakeOrderedAndProject. Deterministic
    * tie-break by token. */
  def tokenTopK(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token")
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("token"))
      .limit(k)

  def tokenTopKSql(table: String, textCol: String, k: Int): String =
    s"""SELECT token, n FROM (
          SELECT token, count(*) AS n FROM (
            SELECT unnest(${TextOps.tokensSql(textCol)}) AS token FROM ${table})
          WHERE length(token) > 0 GROUP BY token)
        ORDER BY n DESC, token LIMIT ${k}"""

  /** Word n-gram shingles of a probe text, driver-side — the same
    * shingling as [[TextOps.shingles]] so probe and corpus agree. */
  def probeShingles(probeText: String, n: Int = 3): Seq[String] =
    probeText.split(" ").toSeq.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq

  /** Benchmark-contamination check: ids of documents sharing at least one
    * word n-gram with the probe set (the standard n-gram-overlap
    * decontamination test for training corpora vs eval benchmarks).
    * The corpus side explodes to (id, shingle) and semi-joins the
    * broadcast probe set — no shingle arrays shuffle, no all-pairs. */
  def contaminatedIds(df: DataFrame, idCol: String, textCol: String,
                      probe: Seq[String], shingleN: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val probeDf = probe.toDF("sh")
    df.select(col(idCol), explode_outer(TextOps.shingles(col(textCol), shingleN)).as("sh"))
      .join(broadcast(probeDf), Seq("sh"), "left_semi")
      .select(idCol).distinct()
  }

  def contaminatedIdsSql(table: String, idCol: String, textCol: String,
                         probe: Seq[String], shingleN: Int = 3): String = {
    val list = probe.map(p => s"'${p.replace("'", "''")}'").mkString("[", ",", "]")
    s"""SELECT DISTINCT ${idCol} FROM ${table}
        WHERE list_has_any(${TextOps.shinglesSql(textCol, shingleN)}, ${list})"""
  }

  /** Top-k characteristic terms per document, TF-IDF-style but projected
    * onto integers so it is exactly engine-comparable (a float ln() would
    * differ in the last ulp across libm implementations): rank within each
    * doc by term frequency desc, then CORPUS document-frequency asc (for
    * equal tf the rarer term carries more information — the idf ordering),
    * then term. Plan: one tf aggregation, one df aggregation derived from
    * it (map-side combinable), a broadcast-or-shuffle join back, one
    * window per doc. */
  def topTermsPerDoc(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = df.select(col(idCol).as("doc"), explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df")) // tf rows are unique per (doc, term)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("tf").desc, col("df").asc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc").as(idCol), col("term"), col("tf"), col("df"), col("rank"))
  }

  def topTermsPerDocSql(table: String, idCol: String, textCol: String, k: Int): String =
    s"""SELECT doc AS ${idCol}, term, tf, df, rank FROM (
          SELECT doc, term, tf, df,
                 row_number() OVER (PARTITION BY doc ORDER BY tf DESC, df ASC, term) AS rank
          FROM (
            SELECT doc, term, tf, count(*) OVER (PARTITION BY term) AS df FROM (
              SELECT doc, term, count(*) AS tf FROM (
                SELECT ${idCol} AS doc, unnest(${TextOps.tokensSql(textCol)}) AS term
                FROM ${table})
              WHERE length(term) > 0 GROUP BY doc, term)))
        WHERE rank <= ${k}"""

  /** KMV (k-minimum-values) distinct-count sketch over the u60 hash:
    * estimate = (k-1) · 2^60 / kth-smallest-hash. Unlike HLL the sketch is
    * DETERMINISTIC given the shared hash, so the estimate itself is
    * engine-comparable — and the k-minimum set is mergeable (union then
    * re-take k), the property that makes it a one-pass distributed sketch
    * at corpus scale. Exact count returned below k. Output: (kth, est). */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, "kmvDistinct: k must be >= 2")
    import graft.generators.Gen
    df.select(Gen.u60(col(valueCol), "kmv").as("h"))
      .where(col("h").isNotNull).distinct()
      .orderBy("h").limit(k)
      .agg(max("h").as("kth"), count(lit(1)).as("n"))
      .select(col("kth"),
        when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(Gen.U60Max.toDouble) /
            col("kth").cast("double")).as("est"))
  }

  def kmvDistinctSql(table: String, valueCol: String, k: Int): String = {
    import graft.generators.{Gen, OracleGen}
    val h = OracleGen.u60(valueCol, "kmv")
    s"""SELECT kth, CASE WHEN n < ${k} THEN n::DOUBLE
          ELSE ${(k - 1).toDouble} * ${Gen.U60Max.toDouble} / kth::DOUBLE END AS est
        FROM (
          SELECT max(h) AS kth, count(*) AS n FROM (
            SELECT DISTINCT ${h} AS h FROM ${table} WHERE (${valueCol}) IS NOT NULL
            ORDER BY h LIMIT ${k}))"""
  }
}
