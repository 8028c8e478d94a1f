package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / fuzzy entity matching: the classic block -> candidate
  * -> verify pipeline. Candidate generation is a bucketed equi-join on a
  * BLOCKING key (never an all-pairs product — the same discipline as the
  * LSH dedup family: candidates are bounded by block sizes, and the
  * verify predicate prunes inside the join); verification is exact
  * Levenshtein distance (both engines implement the same DP, so the
  * integer distances — and therefore the match set — are
  * engine-identical).
  *
  * Blocking-key design is the recall/cost lever: prefix blocks are the
  * standard cheap choice, suffix blocks suit id-like names whose shared
  * prefixes would collapse everything into one block; multi-pass
  * blocking = union of fuzzyJoin calls with different keys.
  */
object RecordLinkage {

  /** Uppercased first `n` chars — the standard cheap block. */
  def prefixBlock(c: Column, n: Int = 3): Column = upper(substring(c, 1, n))
  def prefixBlockSql(c: String, n: Int = 3): String =
    s"upper(substr(${c}, 1, ${n}))"

  /** Uppercased last `n` chars — for corpora with long shared prefixes
    * (serial-numbered names) where a prefix block degenerates. */
  def suffixBlock(c: Column, n: Int = 3): Column =
    upper(substring(c, -n, n))
  def suffixBlockSql(c: String, n: Int = 3): String =
    s"upper(substr(${c}, -${n}, ${n}))"

  /** Fuzzy join: pairs (id_a, id_b, dist) where both sides share the
    * blocking key and levenshtein(textA, textB) <= maxDist.
    * @param blockA / blockB blocking-key expressions over each side's
    *        text column (same key family on both sides for recall). */
  def fuzzyJoin(a: DataFrame, aId: String, aText: String, blockA: Column,
                b: DataFrame, bId: String, bText: String, blockB: Column,
                maxDist: Int): DataFrame = {
    require(maxDist >= 0, "fuzzyJoin: maxDist must be >= 0")
    val left = a.select(col(aId).as("id_a"), col(aText).as("text_a"),
      blockA.as("__blk"))
    val right = b.select(col(bId).as("id_b"), col(bText).as("text_b"),
      blockB.as("__blk"))
    left.join(right, "__blk")
      .withColumn("dist", levenshtein(col("text_a"), col("text_b")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** Multi-pass blocking: union the candidate pairs of several blocking
    * keys and keep each matched pair once (min distance is identical
    * across passes — the distance doesn't depend on the block). Recovers
    * pairs any single key misses at the cost of one pass per key. */
  def fuzzyJoinMulti(a: DataFrame, aId: String, aText: String,
                     b: DataFrame, bId: String, bText: String,
                     blocks: Seq[(Column, Column)], maxDist: Int): DataFrame = {
    require(blocks.nonEmpty, "fuzzyJoinMulti: need at least one blocking key")
    blocks.map { case (ba, bb) =>
      fuzzyJoin(a, aId, aText, ba, b, bId, bText, bb, maxDist)
    }.reduce(_ unionByName _)
      .groupBy("id_a", "id_b").agg(min("dist").as("dist"))
  }

  def fuzzyJoinSql(aSql: String, aId: String, aText: String, blockASql: String,
                   bSql: String, bId: String, bText: String, blockBSql: String,
                   maxDist: Int): String =
    s"""SELECT id_a, id_b, dist FROM (
          SELECT a.${aId} AS id_a, b.${bId} AS id_b,
                 levenshtein(a.${aText}, b.${bText})::INT AS dist
          FROM (${aSql}) a JOIN (${bSql}) b
            ON (${blockASql}) = (${blockBSql}))
        WHERE dist <= ${maxDist}"""
}
