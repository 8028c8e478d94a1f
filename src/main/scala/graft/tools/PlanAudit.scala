package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Executed-plan audit sweep: for each registered query (default: the
  * bench headline set), EXECUTE it at a small sf so AQE finalizes, then
  * report per-table scan counts, shuffle-exchange counts, and reused
  * exchanges. Flags the smells that matter at 100 TB: the same parquet
  * scanned 3+ times, or several identical-looking exchanges with zero
  * reuse (the duplicated-subtree pattern the bigram-xent fix removed).
  *
  *   sbt "runMain graft.tools.PlanAudit [sfDir] [q1,q2,...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq else graft.Bench.headline
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.Checkpoints.quietUnpersistWarnings()
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        try {
          val df = fn(spark, sfDir)
          df.collect() // finalize the adaptive plan
          // AdaptiveSparkPlan.toString prints Final AND Initial plans —
          // audit only the final one
          val plan = df.queryExecution.executedPlan.toString
            .split("== Initial Plan ==")(0)
          val scans = "Location: InMemoryFileIndex(?:\\(\\d+ paths?\\))?\\[[^\\]]*/(\\w+)\\.parquet".r
            .findAllMatchIn(plan).map(_.group(1)).toSeq
          val byTable = scans.groupBy(identity).view.mapValues(_.size).toMap
          val nEx = "\\bExchange hashpartitioning".r.findAllIn(plan).size
          val nReuse = "ReusedExchange".r.findAllIn(plan).size
          val flag = byTable.collect { case (t, c) if c >= 3 => s"$t×$c" }.mkString(" ")
          println(f"[audit] $n%-28s exch=$nEx%2d reuse=$nReuse%2d scans=" +
            byTable.map { case (t, c) => s"$t:$c" }.toSeq.sorted.mkString(",") +
            (if (flag.nonEmpty) s"  ** MULTI-SCAN $flag" else ""))
        } catch {
          case e: Throwable => println(s"[audit] $n FAILED: ${e.getMessage.take(120)}")
        }
        graft.plans.Checkpoints.releaseAll()
      }
    }
    spark.stop()
  }
}
