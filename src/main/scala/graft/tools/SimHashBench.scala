package graft.tools

import graft.llm.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved microbench: native fused SimHash16 vs the composed
  * HOF formulation, signature projection only (no join), A/B pairs to
  * cancel host-load drift. `runMain graft.tools.SimHashBench [dir] [reps]` */
object SimHashBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(32).select("doc_id", "text").cache()
    docs.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(sum(c % 97)).collect() // mod keeps the 60-bit sum in range
      (System.nanoTime() - t0) / 1e9
    }
    // warm both
    time(TextOps.simhash60(col("text"))); time(TextOps.simhashComposed(col("text"), 60))
    val (nat, comp) = (1 to reps).map { _ =>
      (time(TextOps.simhash60(col("text"))), time(TextOps.simhashComposed(col("text"), 60)))
    }.unzip
    println(f"native  : ${nat.sorted.apply(reps / 2)}%.3f s median  ${nat.map(t => f"$t%.3f").mkString(" ")}")
    println(f"composed: ${comp.sorted.apply(reps / 2)}%.3f s median  ${comp.map(t => f"$t%.3f").mkString(" ")}")
    spark.stop()
  }
}
