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
  *    (`restorers/table_insert_format.go:166-194`): batched prepared
  *    INSERTs carrying the reference's literal clauses when asked —
  *    `ON CONFLICT DO NOTHING` (duplicates skip server-side, single
  *    statement) and `OVERRIDING SYSTEM VALUE` (explicit values into
  *    identity columns) — plus the per-error exclusion semantics
  *    (`domains/config.go:115-130`): SQLSTATEs listed in
  *    `ignoreSqlStates` are skipped via row-wise replay instead of
  *    failing the task (the portable fallback for targets without
  *    ON CONFLICT, and for error classes beyond unique violations).
  *
  * Snapshot consistency on restore is the target DB's concern (SURVEY
  * §7.4); at cluster scale partitions write concurrently exactly like the
  * reference's restore worker pool (`restore.go:847-888`).
  */
/** Restore integrity controls — the Spark port of the reference's
  * transaction setup/teardown (`restorers/base.go:41-57,68-105,134-148`):
  * `SET session_replication_role = 'replica'` suppresses FK checks and
  * user triggers for the session, `ALTER TABLE … DISABLE TRIGGER ALL`
  * hard-disables triggers, both optionally wrapped in `SET ROLE
  * <superuser>` / `RESET ROLE`. **PostgreSQL-only statements** — against
  * other targets leave the flags off (the FK-topological restore order
  * remains the integrity strategy, as before).
  *
  * `extraSetup`/`extraReset` let callers append target-specific
  * statements (and give tests a dialect-neutral execution path). */
case class IntegrityOptions(
    sessionReplicationRoleReplica: Boolean = false,
    disableTriggers: Boolean = false,
    superUser: Option[String] = None,
    extraSetup: Seq[String] = Nil,
    extraReset: Seq[String] = Nil,
    // native pg_restore --use-set-session-authorization: impersonate via
    // SET SESSION AUTHORIZATION instead of SET ROLE (the SQL-standard
    // form; only a role's LOGIN identity can be assumed, but the grant
    // model differs — some sites allow one and not the other)
    useSetSessionAuthorization: Boolean = false) {

  private def asSuper(stmts: Seq[String]): Seq[String] =
    if (stmts.isEmpty) Nil
    else superUser.fold(stmts) { su =>
      if (useSetSessionAuthorization)
        (s"SET SESSION AUTHORIZATION $su" +: stmts) :+ "RESET SESSION AUTHORIZATION"
      else (s"SET ROLE $su" +: stmts) :+ "RESET ROLE"
    }

  /** Statements to run on a connection before restoring `table`
    * (`setupTx`, base.go:134-141). */
  def setupStatements(table: String): Seq[String] =
    asSuper(
      (if (sessionReplicationRoleReplica) Seq("SET session_replication_role = 'replica'") else Nil) ++
      (if (disableTriggers) Seq(s"ALTER TABLE $table DISABLE TRIGGER ALL") else Nil)
    ) ++ extraSetup

  /** Statements to run after the restore (`resetTx`, base.go:144-148) —
    * triggers first, then the session role, mirroring the reference. */
  def resetStatements(table: String): Seq[String] =
    asSuper(
      (if (disableTriggers) Seq(s"ALTER TABLE $table ENABLE TRIGGER ALL") else Nil) ++
      (if (sessionReplicationRoleReplica) Seq("RESET session_replication_role") else Nil)
    ) ++ extraReset

  def isNoop: Boolean =
    !sessionReplicationRoleReplica && !disableTriggers &&
      extraSetup.isEmpty && extraReset.isEmpty
}

object RestoreSink {

  private def execAll(conn: Connection, stmts: Seq[String]): Unit =
    if (stmts.nonEmpty) {
      val st = conn.createStatement()
      try stmts.foreach(st.execute) finally st.close()
    }

  /** COPY-mode restore. `ALTER TABLE … DISABLE TRIGGER ALL` is a CATALOG
    * change, so for the batched Spark JDBC writer (whose per-partition
    * connections expose no init hook) trigger disabling runs on a control
    * connection around the whole write; `session_replication_role` is
    * per-session and therefore only effective in [[insertRows]], which
    * owns its connections. */
  def bulk(df: DataFrame, url: String, table: String,
           batchSize: Int = 10000, mode: SaveMode = SaveMode.Append,
           props: Properties = new Properties(),
           integrity: IntegrityOptions = IntegrityOptions()): Unit = {
    val ctl: Option[Connection] =
      if (integrity.isNoop) None else Some(DriverManager.getConnection(url))
    try {
      ctl.foreach(execAll(_, integrity.setupStatements(table)))
      df.write.mode(mode)
        .option("batchsize", batchSize)
        .jdbc(url, table, props)
    } finally ctl.foreach { c =>
      try execAll(c, integrity.resetStatements(table))
      finally c.close()
    }
  }

  /** The INSERT statement the reference's insert restorer generates
    * (`table_insert_format.go:170-188`), with JDBC `?` placeholders:
    * `ON CONFLICT DO NOTHING` makes duplicate-key rows skip SERVER-SIDE
    * in the single statement (no error raised, so no client-side
    * exclusion/replay is involved), and `OVERRIDING SYSTEM VALUE` lets
    * an explicit value land in a `GENERATED ALWAYS AS IDENTITY` column.
    * Both are PostgreSQL grammar — leave them off for other targets and
    * use `ignoreSqlStates` there. */
  def insertStatement(table: String, cols: Seq[String],
                      onConflictDoNothing: Boolean = false,
                      overridingSystemValue: Boolean = false): String = {
    val overriding = if (overridingSystemValue) "OVERRIDING SYSTEM VALUE " else ""
    val onConflict = if (onConflictDoNothing) " ON CONFLICT DO NOTHING" else ""
    s"INSERT INTO $table (${cols.mkString(", ")}) ${overriding}VALUES " +
      s"(${cols.map(_ => "?").mkString(", ")})$onConflict"
  }

  /** PostgreSQL's JDBC driver exposes the server's structured
    * ConstraintName (`PSQLException.getServerErrorMessage.getConstraint`)
    * — the exact field the reference's `isErrorAllowed` compares
    * (`table_insert_format.go:236`). The driver isn't on this build's
    * classpath, so reach it reflectively when the exception is one. */
  private def structuredConstraint(t: Throwable): Option[String] =
    if (t.getClass.getName == "org.postgresql.util.PSQLException") {
      try for {
        sem <- Option(t.getClass.getMethod("getServerErrorMessage").invoke(t))
        c <- Option(sem.getClass.getMethod("getConstraint").invoke(sem))
        s = c.toString if s.nonEmpty
      } yield s
      catch { case _: ReflectiveOperationException => None }
    } else None

  /** Word-boundary fallback for drivers without a structured constraint
    * field (Derby, MySQL name the violated constraint in the message):
    * the name must stand alone as an identifier — a raw substring scan
    * would let a short name like `pk` match unrelated errors and
    * silently skip rows whose failures should propagate. */
  private[graft] def mentionsConstraint(msg: String, name: String): Boolean =
    java.util.regex.Pattern
      .compile("(?<![A-Za-z0-9_$])" + java.util.regex.Pattern.quote(name) +
        "(?![A-Za-z0-9_$])")
      .matcher(msg).find()

  /** `ignoreConstraints` is the constraint-NAME half of the reference's
    * `insert_error_exclusions` (`domains/config.go:115-130`: rules list
    * `error_codes` AND `constraints`; `isErrorAllowed` compares the
    * server error's ConstraintName). On PostgreSQL the match uses the
    * driver's structured field; elsewhere it scans the exception chain's
    * messages for the name as a whole identifier. */
  def insertRows(df: DataFrame, url: String, table: String,
                 ignoreSqlStates: Set[String] = Set.empty,
                 batchSize: Int = 500,
                 integrity: IntegrityOptions = IntegrityOptions(),
                 onConflictDoNothing: Boolean = false,
                 overridingSystemValue: Boolean = false,
                 ignoreConstraints: Set[String] = Set.empty): Unit = {
    val cols = df.columns
    val sql = insertStatement(table, cols.toSeq, onConflictDoNothing,
      overridingSystemValue)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url)
        try {
          // per-connection setup (setupTx): runs in autocommit, before
          // the restore transaction starts
          execAll(conn, integrity.setupStatements(table))
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
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
          def ignorable(e: SQLException): Boolean = {
            if (states(e).exists(ignoreSqlStates)) return true
            if (ignoreConstraints.isEmpty) return false
            var cur: SQLException = e
            while (cur != null) {
              structuredConstraint(cur) match {
                case Some(c) =>
                  // structured field wins outright: if the server names a
                  // constraint and it isn't excluded, do NOT fall back to
                  // message text for this exception
                  if (ignoreConstraints(c)) return true
                case None =>
                  val msg = Option(cur.getMessage).getOrElse("")
                  if (ignoreConstraints.exists(mentionsConstraint(msg, _)))
                    return true
              }
              cur = cur.getNextException
            }
            false
          }
          def bind(vals: Array[AnyRef]): Unit = {
            var i = 0
            while (i < vals.length) { st.setObject(i + 1, vals(i)); i += 1 }
          }
          // Buffer the current batch's values so an ignorable batch
          // failure can be replayed row-by-row, skipping ONLY offending
          // rows — the reference inserts row-wise and skips per row
          // (`table_insert_format.go:139-145`); a whole-batch rollback
          // would silently drop up to batchSize-1 valid rows.
          val buffer = new scala.collection.mutable.ArrayBuffer[Array[AnyRef]](batchSize)
          def flush(): Unit = if (buffer.nonEmpty) {
            try { st.executeBatch(); conn.commit() }
            catch {
              case e: SQLException if ignorable(e) =>
                conn.rollback()
                st.clearBatch()
                buffer.foreach { vals =>
                  bind(vals)
                  try { st.executeUpdate(); conn.commit() }
                  catch {
                    case e2: SQLException if ignorable(e2) =>
                      conn.rollback() // skip just this row
                  }
                }
            }
            buffer.clear()
          }
          rows.foreach { r =>
            val vals = Array.tabulate[AnyRef](cols.length)(i =>
              if (r.isNullAt(i)) null else r.get(i).asInstanceOf[AnyRef])
            bind(vals)
            st.addBatch()
            buffer += vals
            if (buffer.size >= batchSize) flush()
          }
          flush()
          st.close()
          // per-connection reset (resetTx) on the success path; on
          // failure the connection dies with the task, taking its
          // session state with it (same as the reference's aborted tx)
          conn.setAutoCommit(true)
          execAll(conn, integrity.resetStatements(table))
        } finally {
          // roll back any in-flight transaction before close: a
          // propagating failure must not leak an open transaction (Derby
          // refuses to close, and the orphaned locks block later DDL)
          try if (!conn.getAutoCommit) conn.rollback() catch { case _: Throwable => () }
          conn.close()
        }
      }
    }
  }

  /** Sequence restore — the `setval` analog (`restorers/sequence.go:41`):
    * after a data restore, re-seed the table's id generator to
    * max(column)+1 so future inserts don't collide. The DDL differs per
    * target; `restartStmt` builds it from the computed restart value
    * (Derby identity: `ALTER TABLE t ALTER COLUMN c RESTART WITH n`;
    * PostgreSQL: `SELECT setval('seq', n-1)`). Returns the restart value. */
  def reseedSequence(df: DataFrame, column: String, url: String,
                     restartStmt: Long => String): Long = {
    val maxRow = df.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col(column))).collect().head
    val restart = (if (maxRow.isNullAt(0)) 0L
      else maxRow.get(0).asInstanceOf[Number].longValue) + 1L
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(restartStmt(restart))
      st.close()
    } finally conn.close()
    restart
  }

  /** Derby identity-column restart DDL (test dialect). */
  def derbyRestart(table: String, column: String)(restart: Long): String =
    s"ALTER TABLE $table ALTER COLUMN $column RESTART WITH $restart"

  /** PostgreSQL sequence restart (production dialect; `setval` with
    * is_called=true semantics like the reference's sequence restorer). */
  def pgRestart(sequence: String)(restart: Long): String =
    s"SELECT setval('$sequence', ${math.max(restart - 1, 1)})"
}
