package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}

import java.sql.{Connection, DriverManager, SQLException}
import java.util.Properties

/** Restore sinks — the JDBC half of the dump/restore lifecycle.
  *
  *  - [[bulk]] is the COPY-mode restore (`restorers/table.go:54-160`):
  *    Spark's batched JDBC writer, one connection per partition, batch
  *    size tunable (the reference's 1 MiB stream buffer becomes the JDBC
  *    `batchsize`).
  *  - [[insertRows]] is the INSERT-mode restore
  *    (`restorers/table_insert_format.go:166-194`): row-wise prepared
  *    INSERTs with the reference's per-error exclusion semantics
  *    (`domains/config.go:115-130`) — SQLSTATEs listed in
  *    `ignoreSqlStates` (e.g. 23505 unique violation ≈ ON CONFLICT DO
  *    NOTHING) are skipped instead of failing the task.
  *
  * Snapshot consistency on restore is the target DB's concern (SURVEY
  * §7.4); at cluster scale partitions write concurrently exactly like the
  * reference's restore worker pool (`restore.go:847-888`).
  */
object RestoreSink {

  def bulk(df: DataFrame, url: String, table: String,
           batchSize: Int = 10000, mode: SaveMode = SaveMode.Append,
           props: Properties = new Properties()): Unit =
    df.write.mode(mode)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  def insertRows(df: DataFrame, url: String, table: String,
                 ignoreSqlStates: Set[String] = Set.empty,
                 batchSize: Int = 500): Unit = {
    val cols = df.columns
    val sql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          var inBatch = 0
          def states(e: SQLException): Set[String] = {
            // batch failures chain the real error (e.g. Derby wraps 23505
            // under a generic batch SQLSTATE) — collect the whole chain
            var out = Set.empty[String]
            var cur: SQLException = e
            while (cur != null) {
              Option(cur.getSQLState).foreach(out += _)
              cur = cur.getNextException
            }
            out
          }
          def flush(): Unit = if (inBatch > 0) {
            try { st.executeBatch(); conn.commit() }
            catch {
              case e: SQLException if states(e).exists(ignoreSqlStates) =>
                conn.rollback() // whole batch excluded, mirroring error-exclusion lists
            }
            inBatch = 0
          }
          rows.foreach { r =>
            var i = 0
            while (i < cols.length) {
              st.setObject(i + 1, if (r.isNullAt(i)) null else r.get(i))
              i += 1
            }
            st.addBatch()
            inBatch += 1
            if (inBatch >= batchSize) flush()
          }
          flush()
          st.close()
        } finally conn.close()
      }
    }
  }
}
