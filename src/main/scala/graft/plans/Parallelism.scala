package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project}

/** Scan-width hygiene for compute-heavy per-row operators (signature
  * hashing, decode, shingling). */
object Parallelism {

  /** Redistribute a NARROW source across the session's parallelism before
    * expensive per-row compute. At real scale this is a no-op — a 100 TB
    * parquet scan is thousands of splits, already at least as wide as the
    * cluster — so the shuffle is only ever paid by pathological inputs
    * (one giant row group, a non-splittable gzip, a tiny fixture file)
    * where serializing a 16-pass signature aggregate behind a one-task
    * scan costs far more than re-distributing the rows once.
    *
    * Only scan-shaped plans (leaf + projections/filters) are inspected:
    * reading the partition count of a general plan via `df.rdd` would,
    * under AQE, execute its upstream shuffle stages just to throw the
    * result away (round-4 advice). For a scan there are no shuffle stages,
    * so the partition count is just the file-split calculation. Anything
    * wider passes through untouched — a shuffled input is already
    * cluster-wide by construction. */
  def widen(df: DataFrame): DataFrame = {
    def scanShaped(p: LogicalPlan): Boolean = p match {
      case _: LeafNode   => true
      case p: Project    => scanShaped(p.child)
      case f: Filter     => scanShaped(f.child)
      case _             => false
    }
    if (!scanShaped(df.queryExecution.optimizedPlan)) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
