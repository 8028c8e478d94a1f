package graft

import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hyperplane-bucket census (VERDICT r17 #4) — the cosine family's
  * pre-flight forecast. Pins the same contract the LSH/simhash censuses
  * carry: the census must predict the bucket join's candidate volume
  * EXACTLY (it is the number the all-pairs-vs-best-match decision reads),
  * and the one-scan multi-plan trick (smaller plans as bit-masks of the
  * max plan's bucket) must agree with independently-computed buckets. */
class EmbedCensusSpec extends SparkSpec {
  import spark.implicits._

  private def vecs: DataFrame =
    (1L to 120L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 3.7 + d * 1.3).toFloat))
    }.toDF("vec_id", "embedding")

  test("census forecasts the unthresholded bucket join exactly, per plan") {
    val census = Similarity.embedBucketCensus(vecs, "vec_id", "embedding",
        planCounts = Seq(2, 4, 6), dim = 8)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (p <- Seq(2, 4, 6)) {
      // threshold low enough to keep EVERY within-bucket pair (cosine
      // >= -1 always; no zero-norm vectors in this fixture)
      val joinPairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        threshold = -10.0, nPlanes = p, dim = 8).count()
      assert(census(p)._2 == joinPairs,
        s"plan $p: census candidate_pairs ${census(p)._2} != bucket join $joinPairs")
    }
    // more planes => finer buckets => never more candidates
    assert(census(2)._2 >= census(4)._2 && census(4)._2 >= census(6)._2)
  }

  test("bit-mask arms equal independently-computed buckets (prefix-closed planes)") {
    for (p <- Seq(2, 4, 6)) {
      val direct = Similarity.withLshBuckets(vecs, "vec_id", "embedding", nPlanes = p, dim = 8)
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), coalesce(max(col("n")), lit(0L))).head()
      val census = Similarity.embedBucketCensus(vecs, "vec_id", "embedding",
          planCounts = Seq(p, 6), dim = 8)
        .filter(col("n_planes") === p).head()
      assert(census.getLong(1) == direct.getLong(0), s"plan $p bucket count")
      assert(census.getLong(3) == direct.getLong(1), s"plan $p max bucket")
    }
  }

  test("statistics exact on a hand-built bucket layout") {
    // 1 plane, 2 dims: bucket = sign of dot with plane 0. Place 3
    // vectors on the positive side, 2 on the negative side.
    val plane = Similarity.hyperplanes(1, 2).head // entries are ±1
    def side(s: Double, i: Int) = (i.toLong,
      Array((plane(0) * s).toFloat, (plane(1) * s * (1.0 + i * 0.01)).toFloat))
    val df = (Seq(side(1.0, 1), side(2.0, 2), side(3.0, 3)) ++
      Seq(side(-1.0, 4), side(-2.0, 5))).toDF("vec_id", "embedding")
    val r = Similarity.embedBucketCensus(df, "vec_id", "embedding",
      planCounts = Seq(1), dim = 2).head()
    assert(r.getLong(1) == 2L, "two buckets")
    assert(r.getLong(2) == 3L + 1L, "C(3,2) + C(2,2) candidate pairs")
    assert(r.getLong(3) == 3L, "max bucket")
    assert(r.getLong(4) == 5L, "all five vectors matched")
  }

  test("matched-vector count excludes singleton buckets") {
    // 2 planes, 2 dims: four quadrant buckets; put two vectors in one
    // bucket and one alone in another
    val df = Seq(
      (1L, Array(1f, 1f)), (2L, Array(2f, 2.1f)),   // same quadrant
      (3L, Array(-5f, 4f))                          // alone
    ).toDF("vec_id", "embedding")
    val r = Similarity.embedBucketCensus(df, "vec_id", "embedding",
      planCounts = Seq(2), dim = 2).head()
    assert(r.getLong(2) == 1L, "one candidate pair")
    assert(r.getLong(4) == 2L, "only the co-bucketed pair counts as matched")
  }
}
