package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up fixture builder: replicates a driver testdata
  * directory N× with KEY-SHIFTING, preserving referential integrity so
  * the whole oracle battery runs unchanged at the synthesized scale
  * (round-14 rehearsal: sf0.1 × 10 ≈ sf1).
  *
  * Replica i shifts every key in a FOREIGN-KEY DOMAIN by i × unit(domain),
  * where unit is the next power of 10 above the domain's source maximum —
  * customer/orders agree on the custkey shift, orders/lineitem on
  * orderkey, part/lineitem on partkey, supplier/lineitem on suppkey, so
  * every join in the battery finds its rows in every replica.
  * Fixed-cardinality dimensions (region, nation) are NOT replicated:
  * scaling fact tables against fixed dims is how the real schema grows.
  * Non-key payloads copy verbatim — each document's text gains N exact
  * copies (cross-replica duplicates are REAL work for the dedup family)
  * and each user's event stream replicates under a shifted user_id
  * (N× sessions, not N×-longer sessions).
  *
  * Spark-shaped: one scan per table; explode(replica array) multiplies
  * rows map-side with no shuffle; output lands as multi-file parquet so
  * downstream scans parallelize like a real lake layout (the driver
  * fixtures' single-row-group files serialize narrow plans — see
  * COVERAGE "layout, not plan").
  */
object ScaleFixture {
  private def pow10Above(n: Long): Long = {
    var u = 1L
    while (u <= n) u *= 10
    u
  }

  /** (table, key column → shift domain). Everything else copies as-is. */
  private val ShiftedKeys: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "custkey"),
    "supplier" -> Seq("s_suppkey" -> "suppkey"),
    "part" -> Seq("p_partkey" -> "partkey"),
    "orders" -> Seq("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
    "lineitem" -> Seq("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
      "l_suppkey" -> "suppkey"),
    "events" -> Seq("event_id" -> "eventid", "user_id" -> "userid"),
    "documents" -> Seq("doc_id" -> "docid"),
    "embeddings" -> Seq("vec_id" -> "vecid"))

  private val FixedDims = Seq("region", "nation")

  def replicate(spark: SparkSession, src: String, out: String,
                replicas: Int, files: Int = 32): Unit = {
    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def maxOf(t: String, c: String): Long =
      rd(t).agg(max(col(c).cast("long"))).head.getLong(0)
    val unit = Map(
      "custkey" -> pow10Above(maxOf("customer", "c_custkey")),
      "orderkey" -> pow10Above(maxOf("orders", "o_orderkey")),
      "partkey" -> pow10Above(maxOf("part", "p_partkey")),
      "suppkey" -> pow10Above(maxOf("supplier", "s_suppkey")),
      "eventid" -> pow10Above(maxOf("events", "event_id")),
      "userid" -> pow10Above(maxOf("events", "user_id")),
      "docid" -> pow10Above(maxOf("documents", "doc_id")),
      "vecid" -> pow10Above(maxOf("embeddings", "vec_id")))
    FixedDims.foreach { t =>
      rd(t).write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    ShiftedKeys.foreach { case (t, keys) =>
      val df = rd(t)
      val rep = df.withColumn("__replica",
        explode(lit((0 until replicas).toArray)))
      val shifted = keys.foldLeft(rep) { case (d, (c, dom)) =>
        d.withColumn(c, (col(c) + col("__replica").cast("long") *
          lit(unit(dom))).cast(df.schema(c).dataType))
      }.drop("__replica")
      shifted.repartition(files).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"[scale-fixture] $t ×$replicas -> $out/$t.parquet " +
        s"(keys: ${keys.map { case (c, d) => s"$c+i*${unit(d)}" }.mkString(", ")})")
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.ScaleFixture <srcSfDir> <outDir> [replicas=10]")
    val replicas = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicate(spark, args(0), args(1), replicas)
    spark.stop()
  }
}
