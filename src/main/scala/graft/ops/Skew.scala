package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location tooling for 100 TB plans.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * helpers cover the two cases it doesn't: aggregation skew (one hot key
  * melting a single reducer) and pre-planned co-located joins (bucketed
  * tables joined with zero shuffle).
  */
object Skew {

  /** Two-phase salted aggregation: `groupBy(key)` where one key holds a
    * large share of rows. Phase 1 aggregates on (key, salt) — spreading
    * the hot key over `saltBuckets` reducers — phase 2 combines the
    * partials. Works for any algebraic aggregate expressed as
    * (partialAgg, combine) column pairs on a value column. */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 1, "saltedCount: need >1 salt buckets")
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as("n"))
  }

  def saltedSum(df: DataFrame, key: String, valueCol: String, saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 1, "saltedSum: need >1 salt buckets")
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"sum_$valueCol"))
  }

  /** Salted skew join for a broadcast-too-big dimension with hot keys:
    * replicate each right-side row `saltBuckets` times, salt the left side
    * randomly, join on (key, salt). Spreads each hot key across
    * saltBuckets tasks at the cost of replicating the right side. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 1, "saltedJoin: need >1 salt buckets")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Write both sides bucketed on the join key so subsequent joins are
    * zero-shuffle (co-located scan joins). Requires a table catalog
    * (saveAsTable); at cluster scale this is the bucketing strategy for
    * repeatedly-joined fact/dim tables. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
