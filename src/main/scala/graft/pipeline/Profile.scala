package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Sketches

/** Per-column data profiling — the dump-side "what is in this table"
  * report (null fractions, distinct-count sketches, value ranges) a
  * masking engineer reads before writing transforms. One row per
  * profiled column: (col, n_nonnull, n_null, min_v, max_v, hll_regsum,
  * hll_est_milli).
  *
  * Values profile through their STRING casts so one relation carries
  * every column (min/max are therefore lexicographic on the string
  * form); float columns should be pre-quantized by the caller — their
  * string renderings are engine-specific. Distinct counts are the
  * 64-register HLL sketch ([[Sketches.hllDistinct]]), so per-shard
  * profiles merge register-wise without a rescan. Two column-pruned
  * passes (counts + registers) over the narrow (col, value) stream.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.col").as("col"), col("p.v").as("v"))
    val counts = pairs.groupBy("col").agg(
      count(col("v")).as("n_nonnull"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      min("v").as("min_v"), max("v").as("max_v"))
    val hll = Sketches.hllDistinct(pairs.filter(col("v").isNotNull), "col", "v")
    // LEFT join: an all-null column has no sketch row (nothing survived
    // the isNotNull filter) but must still appear in the report — its
    // sketch is the EMPTY sketch (64 zero registers: regsum = 64·2^55,
    // small-range estimate 0)
    counts.join(hll, counts("col") === hll("grp"), "left")
      .select(counts("col"), col("n_nonnull"), col("n_null"),
        col("min_v"), col("max_v"),
        coalesce(col("hll_regsum"), lit(64L << 55)).as("hll_regsum"),
        coalesce(col("hll_est_milli"), lit(0L)).as("hll_est_milli"))
  }

  def profileSql(table: String, cols: Seq[String]): String = {
    val pairSelects = cols.map(c =>
      s"SELECT '${c}' AS col, ${c}::VARCHAR AS v FROM ${table}")
      .mkString(" UNION ALL ")
    val hll = Sketches.hllDistinctSql(
      s"(SELECT col, v FROM (${pairSelects}) WHERE v IS NOT NULL)", "col", "v")
    s"""WITH counts AS (
          SELECT col, count(v)::BIGINT AS n_nonnull,
                 sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
                 min(v) AS min_v, max(v) AS max_v
          FROM (${pairSelects}) GROUP BY col
        ), hll AS (${hll})
        SELECT counts.col, n_nonnull, n_null, min_v, max_v,
               coalesce(hll.hll_regsum, ${64L << 55})::BIGINT AS hll_regsum,
               coalesce(hll.hll_est_milli, 0)::BIGINT AS hll_est_milli
        FROM counts LEFT JOIN hll ON counts.col = hll.grp"""
  }
}
