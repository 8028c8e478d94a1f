package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** COPY-based ingestion from a live PostgreSQL — the reference's dump
  * path IS `COPY <table> TO STDOUT` over the wire
  * (`internal/db/postgres/dumpers/table.go:64-106`, pgcopy front-end);
  * here the same stream arrives through the stock `psql` client (no
  * JDBC driver required), lands as COPY text, and distributes through
  * [[CopyText.read]] — so a table leaves the source database through
  * exactly one COPY stream, like pg_dump itself.
  *
  * Scale note: one COPY stream per table is the protocol's shape; the
  * parallelism lever at scale is per-table concurrency (the reference's
  * worker pool; `Lifecycle.dump`'s Future pool here) plus the
  * stride-partitioned JDBC scan in `pipeline/Pipeline` when a driver is
  * available. This source is the client-tool analog for
  * COPY-compatible endpoints.
  */
object PgSource {

  /** Low-level: run psql with `args`, execute one `COPY ... TO STDOUT`,
    * spool the stream to `spoolFile`, and read it back distributed as a
    * string-typed DataFrame with `columns`. */
  def copyIn(spark: SparkSession, psqlArgs: Seq[String], copySql: String,
             columns: Seq[String], spoolFile: String): DataFrame = {
    require(columns.nonEmpty, "PgSource.copyIn: need column names")
    val cmd = Seq("/usr/bin/psql", "-X", "-v", "ON_ERROR_STOP=1") ++
      psqlArgs ++ Seq("-A", "-t", "-c", copySql)
    val p = new ProcessBuilder(cmd: _*).start()
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(spoolFile))
    try p.getInputStream.transferTo(out) finally out.close()
    val rc = p.waitFor()
    if (rc != 0) {
      val err = new String(p.getErrorStream.readAllBytes(), "UTF-8")
      throw new IllegalStateException(s"PgSource: psql rc=$rc: $err")
    }
    CopyText.read(spark, spoolFile, columns)
  }

  /** Column names of a live table, in ordinal order. */
  def columnsOf(psqlArgs: Seq[String], table: String,
                namespace: String = "public"): Seq[String] = {
    val sql = "SELECT column_name FROM information_schema.columns " +
      s"WHERE table_schema = '$namespace' AND table_name = '$table' " +
      "ORDER BY ordinal_position"
    val cmd = Seq("/usr/bin/psql", "-X", "-v", "ON_ERROR_STOP=1") ++
      psqlArgs ++ Seq("-A", "-t", "-c", sql)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"PgSource.columnsOf: $out")
    val cols = out.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    require(cols.nonEmpty, s"PgSource: table $namespace.$table has no columns")
    cols
  }

  /** Ingest a whole table: discover columns, COPY it out, distribute.
    * Optional `conds` push a WHERE into the COPY's inner SELECT — the
    * reference's subset-scoped dump (rows are filtered on the SERVER, so
    * a 1% subset moves 1% of the bytes). The spool file must outlive the
    * returned (lazy) DataFrame; it is registered for JVM-exit cleanup. */
  def table(spark: SparkSession, psqlArgs: Seq[String], tableName: String,
            namespace: String = "public", conds: Seq[String] = Nil): DataFrame = {
    val cols = columnsOf(psqlArgs, tableName, namespace)
    val spoolPath = java.nio.file.Files
      .createTempFile(s"graft_pgsrc_$tableName", ".dat")
    spoolPath.toFile.deleteOnExit()
    val source =
      if (conds.isEmpty) s"${namespace}.${tableName} (${cols.mkString(", ")})"
      else s"(SELECT ${cols.mkString(", ")} FROM ${namespace}.${tableName} " +
        s"WHERE ${conds.map(c => s"($c)").mkString(" AND ")})"
    copyIn(spark, psqlArgs, s"COPY $source TO STDOUT", cols, spoolPath.toString)
  }
}
