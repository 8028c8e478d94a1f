package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lexical retrieval over the corpus: distributed Okapi BM25 top-k.
  *
  * The training-data use case is eval-set / instruction-seed retrieval —
  * "for each of these probe queries, which corpus documents score
  * highest?" — the lexical complement of the embedding ANN family in
  * [[Similarity]] (used for decontamination triage, seed expansion, and
  * hard-negative mining).
  *
  * Cross-engine exactness (driver hash-compares values bit-for-bit):
  * BM25 is a sum of per-term weights
  *
  *   w(t,d) = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * with k1 = 1.2, b = 0.75, avgdl = T/N (T corpus tokens, N docs) and
  * idf(t) = ln((N − df + ½)/(df + ½) + 1) = ln(2N+2) − ln(2df+1).
  * Everything is computed in INTEGER space: the two logs quantize
  * per-term to nano-nats ([[Curation.lnNano]], the same discipline as
  * the cross-entropy ops), and the rational tf factor is cleared of
  * fractions by multiplying numerator and denominator by 10·T:
  *
  *   num = 22·tf·T            den = 10·T·tf + 3·T + 9·dl·N
  *   w_nano = round(idf_nano · num / den)
  *          = (2·idf_nano·num + den) div (2·den)
  *
  * — one exact integer division per (query-term, doc), evaluated in
  * DECIMAL(38,0) on the Spark side and HUGEINT in DuckDB (products stay
  * under 1e33 even at 1e14 corpus tokens), then summed as BIGINT. Scores
  * are identical integers in both engines, so the rank ordering (score
  * desc, doc asc) can never diverge on a float ulp.
  *
  * Scale shape (the part that must survive 100 TB): pass 1 computes
  * per-doc token length IN THE SCAN (a per-row `size(filter(...))`, no
  * shuffle) and reduces it to the two scalars (N, T) — a bounded 2-value
  * driver collect re-entered as literals. Pass 2 explodes tokens but
  * filters to the LITERAL query-term set before any shuffle, so the only
  * corpus-keyed exchange carries query-term occurrences, not the corpus;
  * df and idf derive from that small (doc,term) relation; the per-query
  * top-k is a `row_number ≤ k` window that Spark executes with
  * WindowGroupLimit (per-partition partial limit before the final
  * per-query sort — never a global sort). No corpus-sized relation is
  * cached, joined wide, or collected.
  *
  * Reference analog: the reference engine has no retrieval operator —
  * this extends the LLM-pipeline brief's similarity-search family to the
  * lexical side.
  */
object Retrieval {

  /** Probe queries used by the registered query/oracle pair: fixed
    * literals so both engines agree on the term set; q5 includes a term
    * absent from the corpus ("zzz") to pin the df=0 path (contributes
    * nothing, in both engines, rather than NaN/NULL poisoning). */
  val DefaultQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join"),
    2 -> Seq("scan", "filter", "table"),
    3 -> Seq("window", "agg"),
    4 -> Seq("stream", "batch", "merge"),
    5 -> Seq("vector", "spark", "zzz"))

  /** BM25 top-k docs per query. Output: (query_id, idCol, score_nano,
    * rank) — score_nano is the exact integer nano-nat score. Queries
    * whose terms never occur are absent from the output (no candidates).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, Seq[String])] = DefaultQueries,
               k: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    // NOT widened (r18 measured negative, same-host A/B: 1.25 s ->
    // 1.79 s) — tokenize-only per-row work, see Corpus.unigramStats
    val base = df.select(col(idCol).as("doc"),
        filter(TextOps.tokens(col(textCol)), t => length(t) > lit(0)).as("ts"))
      .select(col("doc"), size(col("ts")).cast("long").as("dl"), col("ts"))

    // Pass 1: corpus totals — a 2-scalar driver reduction, re-entered as
    // literals (the DSIR pattern) so the scoring pass carries no 1-row join.
    val totals = base.agg(count(lit(1)).as("n"),
      coalesce(sum("dl"), lit(0L)).as("t")).head()
    val nDocs = totals.getLong(0)
    val tTok = totals.getLong(1)

    val terms = queries.flatMap(_._2).distinct
    val qt = queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("query_id", "term")

    // Pass 2: tokens filtered to the literal term set BEFORE the shuffle —
    // the (doc, term) aggregate is over query-term occurrences only.
    val tf = base.select(col("doc"), col("dl"), explode(col("ts")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))

    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .select(col("term"),
        (Curation.lnNano(lit(2L * nDocs + 2L)) -
          Curation.lnNano(col("df") * 2 + 1)).as("idf_nano"))

    val d38 = DecimalType(38, 0)
    def dec(c: org.apache.spark.sql.Column) = c.cast(d38)

    val perTerm = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(qt), "term")
      .withColumn("num", dec(lit(tTok)) * dec(col("tf")) * lit(22))
      .withColumn("den",
        dec(lit(tTok)) * dec(col("tf")) * lit(10) +
          dec(lit(tTok)) * lit(3) +
          dec(col("dl")) * dec(lit(nDocs)) * lit(9))
      .withColumn("snum", dec(col("idf_nano")) * col("num") * lit(2) + col("den"))
      .withColumn("sden", col("den") * lit(2))
      // exact round-half-up of idf·num/den: all operands positive, so the
      // BIGINT-returning integral divide floors
      .withColumn("w_nano", expr("snum div sden"))

    val scores = perTerm.groupBy("query_id", "doc")
      .agg(sum("w_nano").as("score_nano"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_nano").desc, col("doc").asc)
    scores.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc").as(idCol), col("score_nano"), col("rank"))
  }

  /** DuckDB rendering of the identical integer formulation (HUGEINT where
    * Spark uses DECIMAL(38,0); `//` floors on positives like `div`). */
  def bm25TopKSql(table: String, idCol: String, textCol: String,
                  queries: Seq[(Int, Seq[String])] = DefaultQueries,
                  k: Int = 10): String = {
    val terms = queries.flatMap(_._2).distinct
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val values = queries
      .flatMap { case (q, ts) => ts.distinct.map(t => s"($q, '$t')") }
      .mkString(", ")
    s"""WITH bl AS (
          SELECT ${idCol} AS doc, len(ts)::BIGINT AS dl, ts FROM (
            SELECT ${idCol},
                   list_filter(${TextOps.tokensSql(textCol)}, t -> length(t) > 0) AS ts
            FROM ${table})
        ), tot AS (
          SELECT count(*)::BIGINT AS n, coalesce(sum(dl), 0)::BIGINT AS t FROM bl
        ), tf AS (
          SELECT doc, term, count(*)::BIGINT AS tf, max(dl) AS dl FROM (
            SELECT doc, dl, unnest(ts) AS term FROM bl)
          WHERE term IN (${inList}) GROUP BY doc, term
        ), dfreq AS (
          SELECT term,
                 (${Curation.lnNanoSql("2*(SELECT n FROM tot)+2")}
                  - ${Curation.lnNanoSql("2*count(*)+1")}) AS idf_nano
          FROM tf GROUP BY term
        ), qt(query_id, term) AS (VALUES ${values}
        ), wt AS (
          SELECT doc, term,
                 (22::HUGEINT * t * tf) AS num,
                 (10::HUGEINT * t * tf + 3::HUGEINT * t + 9::HUGEINT * dl * n) AS den
          FROM tf, tot
        ), per AS (
          SELECT qt.query_id, wt.doc,
                 ((2::HUGEINT * dfreq.idf_nano::HUGEINT * wt.num + wt.den)
                    // (2::HUGEINT * wt.den))::BIGINT AS w_nano
          FROM wt JOIN dfreq USING (term) JOIN qt USING (term)
        ), scores AS (
          SELECT query_id, doc, sum(w_nano)::BIGINT AS score_nano
          FROM per GROUP BY query_id, doc
        )
        SELECT query_id, doc AS ${idCol}, score_nano, rank FROM (
          SELECT query_id, doc, score_nano,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score_nano DESC, doc ASC) AS rank
          FROM scores)
        WHERE rank <= ${k}"""
  }
}
