package graft.tools

import graft.llm.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B: native ShingleMd5 vs composed HOF shingle digests,
  * projection only. `runMain graft.tools.ShingleBench [dir] [reps] [k]` */
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val k = if (args.length > 2) args(2).toInt else 6
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(32).select(TextOps.tokens(col("text")).as("toks")).cache()
    docs.count()
    def time(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(sum(length(element_at(c, 1)))).collect()
      (System.nanoTime() - t0) / 1e9
    }
    time(Dedup.spansShingles(col("toks"), k)); time(Dedup.spansShinglesComposed(col("toks"), k))
    val (nat, comp) = (1 to reps).map { _ =>
      (time(Dedup.spansShingles(col("toks"), k)),
        time(Dedup.spansShinglesComposed(col("toks"), k)))
    }.unzip
    println(f"native  : ${nat.sorted.apply(reps / 2)}%.3f s median  ${nat.map(t => f"$t%.3f").mkString(" ")}")
    println(f"composed: ${comp.sorted.apply(reps / 2)}%.3f s median  ${comp.map(t => f"$t%.3f").mkString(" ")}")
    spark.stop()
  }
}
