package graft.plans

import org.apache.spark.sql.DataFrame

/** Scan-width hygiene for compute-heavy per-row operators (signature
  * hashing, decode, shingling). */
object Parallelism {

  /** Redistribute a NARROW source across the session's parallelism before
    * expensive per-row compute. At real scale this is a no-op — a 100 TB
    * parquet scan is thousands of splits, already at least as wide as the
    * cluster — so the shuffle is only ever paid by pathological inputs
    * (one giant row group, a non-splittable gzip, a tiny fixture file)
    * where serializing a 16-pass signature aggregate behind a one-task
    * scan costs far more than re-distributing the rows once. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
