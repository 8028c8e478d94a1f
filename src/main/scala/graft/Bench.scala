package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — times headline queries at SPARK_GRAFT_SF_DIR with a
  * `noop` write (forces full evaluation of every column: no driver
  * collect, no disk, no count()-style column pruning that would skip the
  * transform expressions being measured). */
object Bench {

  /** Headline set: one per operator family (expressions, joins, subset,
    * dedup, similarity, text stats). */
  val headline: Seq[String] = Seq(
    "q_agg_pricing", "q_faker", "q_masking_styles", "q_noise_float",
    "q_apply_refs_join", "q_subset_acyclic", "q_dedup_exact",
    "q_dedup_minhash", "q_text_stats", "q_knn_brute")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT the scan/codegen/noop-write paths once so the
    // first timed query measures the query, not JVM cold start
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
