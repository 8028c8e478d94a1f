package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.generators.{Gen, OracleGen}

/** Privacy ENFORCEMENT — the action side of the audit trio
  * (`Validator.kAnonymity` / `lDiversity` / `tCloseness` report; these
  * ops repair and release):
  *
  *  - [[kAnonymize]]: global-recoding generalization — walk a per-column
  *    ladder of progressively coarser renderings until every equivalence
  *    class reaches size k, then suppress the stragglers. The level
  *    search reads ONE unioned aggregate (L tiny rows to the driver — a
  *    bounded reduction, not a data collect), the rewrite is a single
  *    projection plus one window over the generalized keys.
  *  - [[dpNoisyCounts]]: Laplace-noised group counts in the engine's
  *    hash-engine style — noise is drawn DETERMINISTICALLY from the
  *    salted u60 stream via the inverse CDF, so releases are reproducible
  *    across runs/partitionings and oracle-checkable; swap the hash for
  *    `RandomEngine` draws when true sampling is required. All float work
  *    is the lnNano integer pattern (ln of integers, nano-quantized), so
  *    noise values are exact integers in both engines.
  *
  * Reference analog: the reference masks values but ships no re-grouping
  * guarantees; these close the audit->enforce loop on the masked output.
  */
object Anonymize {

  /** One quasi-identifier's generalization ladder: `levels(0)` is the
    * finest (identity) rendering; every level must share one data type. */
  case class QiLadder(out: String, levels: Seq[Column])

  /** Global recoding to k-anonymity: pick the minimal ladder level l
    * (uniform across QIs) where every equivalence class has >= k rows; if
    * even the coarsest level leaves small classes, mark those rows
    * suppressed. Returns (idCol, generalized QIs..., gen_level,
    * suppressed).
    */
  def kAnonymize(df: DataFrame, idCol: String, ladders: Seq[QiLadder],
                 k: Long): DataFrame = {
    require(ladders.nonEmpty, "kAnonymize: need at least one QI ladder")
    val depth = ladders.head.levels.size
    require(ladders.forall(_.levels.size == depth),
      "kAnonymize: all ladders must have the same depth")
    // one unioned aggregate: min class size per level (L rows to driver)
    val stats = (0 until depth).map { l =>
      df.groupBy(ladders.map(q => q.levels(l).as(q.out)): _*)
        .agg(count(lit(1)).as("n"))
        .agg(min("n").as("min_size")).select(lit(l).as("lvl"), col("min_size"))
    }.reduce(_ unionByName _).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val chosen = (0 until depth).find(l => stats(l) >= k).getOrElse(depth - 1)
    val qiNames = ladders.map(_.out)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qiNames.map(col): _*)
    df.select((col(idCol) +: ladders.map(q => q.levels(chosen).as(q.out))): _*)
      .withColumn("class_size", count(lit(1)).over(w))
      .select((col(idCol) +: qiNames.map(col)) ++ Seq(
        lit(chosen).as("gen_level"),
        (col("class_size") < k).as("suppressed")): _*)
  }

  /** DuckDB rendering of [[kAnonymize]] — the same level search as a
    * unioned CTE and the same rewrite, with the chosen level as a scalar
    * subquery driving a CASE over the ladder expressions. */
  def kAnonymizeSql(table: String, idCol: String,
                    ladders: Seq[(String, Seq[String])], k: Long): String = {
    val depth = ladders.head._2.size
    val lvlStats = (0 until depth).map { l =>
      val exprs = ladders.map { case (out, lv) => s"${lv(l)} AS ${out}" }.mkString(", ")
      val names = ladders.map(_._1).mkString(", ")
      s"""SELECT ${l} AS lvl, min(n) AS min_size FROM (
            SELECT ${exprs}, count(*) AS n FROM ${table} GROUP BY ${names})"""
    }.mkString(" UNION ALL ")
    val genExprs = ladders.map { case (out, lv) =>
      val cases = lv.zipWithIndex.map { case (e, l) => s"WHEN ${l} THEN ${e}" }
      s"CASE (SELECT lvl FROM chosen) ${cases.mkString(" ")} END AS ${out}"
    }.mkString(", ")
    val names = ladders.map(_._1).mkString(", ")
    s"""WITH lvl_stats AS (${lvlStats}),
          chosen AS (
            SELECT coalesce(min(lvl), ${depth - 1}) AS lvl
            FROM lvl_stats WHERE min_size >= ${k}),
          gen AS (SELECT ${idCol}, ${genExprs} FROM ${table}),
          sized AS (
            SELECT *, count(*) OVER (PARTITION BY ${names}) AS class_size FROM gen)
        SELECT ${idCol}, ${names}, (SELECT lvl FROM chosen)::INT AS gen_level,
          class_size < ${k} AS suppressed
        FROM sized"""
  }

  /** ln(2^53) in nano-nats — the constant side of the Laplace inverse
    * CDF below. */
  val Ln2p53Nano: Long = math.floor(math.log(math.pow(2.0, 53)) * 1e9 + 0.5).toLong

  /** Laplace-noised per-group counts at epsilon = epsNum/epsDen, noise
    * drawn from the salted u60 stream: u ~ uniform over 2^53 buckets,
    * noise = -(1/eps)*sign(u-1/2)*ln(1-2|u-1/2|) evaluated as integer
    * nano-nats — ln runs on the INTEGER K = 2^53-2|d| (clamped >= 1) and
    * the epsilon scale is a nonnegative integer multiply-divide, so both
    * engines produce identical integers (magnitude first, sign applied
    * last: truncating and flooring division agree on nonnegatives).
    * Output: (grp, true_count, noise_nano, noisy_nano = 1e9*count+noise).
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String,
                    epsNum: Long = 1L, epsDen: Long = 1L,
                    tweak: String = "dp"): DataFrame = {
    require(epsNum > 0 && epsDen > 0, "dpNoisyCounts: eps must be positive")
    val counts = df.groupBy(col(groupCol).as("grp")).agg(count(lit(1)).as("true_count"))
    val h = Gen.u60(col("grp"), tweak) % lit(1L << 53)
    val d = h - lit(1L << 52)
    val kInt = greatest(lit(1L << 53) - lit(2L) * abs(d), lit(1L))
    val lnK = floor(log(kInt.cast("double")) * lit(1e9) + lit(0.5)).cast("long")
    val mag = expr(s"((${Ln2p53Nano} - __lnk) * ${epsDen}) div ${epsNum}")
    counts.withColumn("__lnk", lnK)
      .withColumn("noise_nano",
        when(d >= 0, lit(1L)).otherwise(lit(-1L)) * mag)
      .select(col("grp"), col("true_count"), col("noise_nano"),
        (col("true_count") * lit(1000000000L) + col("noise_nano")).as("noisy_nano"))
  }

  def dpNoisyCountsSql(table: String, groupCol: String,
                       epsNum: Long = 1L, epsDen: Long = 1L,
                       tweak: String = "dp"): String = {
    val h = s"((${OracleGen.u60("grp", tweak)}) % ${1L << 53})"
    s"""WITH counts AS (
          SELECT ${groupCol} AS grp, count(*)::BIGINT AS true_count
          FROM ${table} GROUP BY 1
        ), noise AS (
          SELECT grp, true_count,
            (CASE WHEN ${h} - ${1L << 52} >= 0 THEN 1 ELSE -1 END)::BIGINT AS sgn,
            greatest(${1L << 53} - 2 * abs(${h} - ${1L << 52}), 1)::BIGINT AS k_int
          FROM counts
        ), mag AS (
          SELECT grp, true_count, sgn,
            ((${Ln2p53Nano} - floor(ln(k_int::DOUBLE) * 1e9 + 0.5)::BIGINT)
              * ${epsDen}) // ${epsNum} AS m
          FROM noise
        )
        SELECT grp, true_count, (sgn * m)::BIGINT AS noise_nano,
          (true_count * 1000000000 + sgn * m)::BIGINT AS noisy_nano
        FROM mag"""
  }
}
