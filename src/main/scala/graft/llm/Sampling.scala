package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.generators.{Gen, OracleGen}

/** Deterministic sampling for training-data pipelines. Hash-based (never
  * rand()): the sample is stable across runs, partitionings, and engines —
  * the property that makes dataset versions reproducible and lets a 100 TB
  * corpus be re-sampled incrementally (new rows join the sample iff their
  * key hashes in; old decisions never flip). */
object Sampling {

  /** Keep ~1/`rate` of rows, decided by the key's u60 hash. */
  def hashSample(df: DataFrame, keyCol: String, rate: Int,
                 tweak: String = "sample"): DataFrame = {
    require(rate >= 2, "hashSample: rate must be >= 2")
    df.filter(Gen.u60(col(keyCol), tweak) % rate === 0)
  }
  def hashSampleSql(keyCol: String, rate: Int, tweak: String = "sample"): String =
    s"(${OracleGen.u60(keyCol, tweak)}) % ${rate} = 0"

  /** Stratified quota sample: at most `quota` rows per stratum, chosen by
    * hash rank (deterministic, engine-portable — no sampleBy randomness). */
  def stratifiedQuota(df: DataFrame, stratumCol: String, keyCol: String,
                      quota: Int, tweak: String = "strat"): DataFrame = {
    require(quota >= 1, "stratifiedQuota: quota must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(Gen.u60(col(keyCol), tweak), col(keyCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
      .drop("__rank")
  }
  def stratifiedQuotaSql(table: String, stratumCol: String, keyCol: String,
                         quota: Int, selectCols: String, tweak: String = "strat"): String =
    s"""SELECT ${selectCols} FROM (
          SELECT *, row_number() OVER (PARTITION BY ${stratumCol}
            ORDER BY ${OracleGen.u60(keyCol, tweak)}, ${keyCol}) AS rnk
          FROM ${table})
        WHERE rnk <= ${quota}"""

  /** Weighted deterministic sampling: keep a row with probability equal to
    * its weight expression (clamped to [0,1]) — quality-proportional
    * data mixing without rand(). Decision = u60(key)/2^60 < weight, so it
    * is stable across runs/partitionings and re-weighting only flips the
    * rows whose weight crossed their fixed hash draw (incremental-safe).
    * u60→double rounds identically on both engines (IEEE nearest). */
  def weighted(df: DataFrame, keyCol: String, weight: Column,
               tweak: String = "wsample"): DataFrame = {
    val draw = Gen.u60(col(keyCol), tweak).cast("double") / lit(Gen.U60Max.toDouble)
    df.filter(draw < least(greatest(weight, lit(0.0)), lit(1.0)))
  }
  def weightedSql(keyCol: String, weightSql: String, tweak: String = "wsample"): String =
    s"((${OracleGen.u60(keyCol, tweak)})::DOUBLE / ${Gen.U60Max.toDouble} < " +
      s"least(greatest(${weightSql}, 0.0), 1.0))"
}
