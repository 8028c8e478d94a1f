package graft.sources

import graft.pipeline.PgToc

/** `pg_restore` re-implemented over the stock `psql` client: replay a
  * PostgreSQL directory archive (pg_dump -Fd, the reference's output, or
  * [[graft.pipeline.PgToc.dumpArchive]]/`dumpArchiveMerged` output) into
  * a live database WITHOUT the native pg_restore binary — the Spark-side
  * twin of the reference's restore command
  * (`internal/db/postgres/cmd/restore.go`; per-table COPY streaming
  * `restorers/table.go:54-160`, integrity controls `restorers/base.go`,
  * blob restore `restorers/blobs.go:52`).
  *
  * Entries replay in TOC order (pg_dump writes pre-data -> data ->
  * post-data; parents-first inside data — the same order the native
  * single-session pg_restore uses). TABLE DATA payloads stream straight
  * from the archive file into `COPY ... FROM STDIN` — no Spark pass, no
  * re-encode; gzipped payloads decompress inline on the stream. Within
  * the data section, tables load through a worker pool in dependency
  * WAVES (the reference's task queue, `restore.go:755-831`): a table
  * starts only after every data entry it depends on has finished, and
  * independent tables load concurrently.
  *
  * Scale note: one COPY stream per table is the protocol's shape (same
  * as the dump side); `jobs` is the per-table concurrency lever, exactly
  * like `pg_restore -j`.
  */
object PgRestore {

  /** One user-defined restore script (reference `pgrestore/script.go:31`):
    * exactly one of `query` (SQL text), `queryFile` (path to SQL), or
    * `command` (argv exec'd on the restore host). Scripts attach to a
    * section (`pre-data` / `data` / `post-data`) and fire `before` or
    * `after` that section restores — the reference's
    * `RunScripts(section, when)` hook points (`cmd/restore.go:180-222`,
    * called at `:381,:446,:556,:578` and the post-data pair). */
  case class Script(name: String, when: String,
                    query: Option[String] = None,
                    queryFile: Option[String] = None,
                    command: Seq[String] = Nil)

  val ScriptSections: Seq[String] = Seq("pre-data", "data", "post-data")

  /** Parse the reference's `restore.scripts` config block (also accepted
    * at the top level as `scripts`):
    * ```json
    * {"restore": {"scripts": {"pre-data": [
    *    {"name": "mark", "when": "before", "query": "CREATE TABLE ..."},
    *    {"name": "seed", "when": "after", "query_file": "/path/x.sql"},
    *    {"name": "notify", "when": "after", "command": ["touch", "/tmp/f"]}
    * ]}}}
    * ``` */
  def scriptsFromJson(json: String): Map[String, Seq[Script]] = {
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    val root = org.json4s.jackson.JsonMethods.parse(json)
    val block = (root \ "restore" \ "scripts") match {
      case JNothing => root \ "scripts"
      case b => b
    }
    block match {
      case JObject(fields) => fields.map { case (section, v) =>
        require(ScriptSections.contains(section),
          s"""pg-restore scripts: unknown "section" value: $section""")
        val ss = v match {
          case JArray(items) => items.map { s =>
            val sc = Script(
              name = (s \ "name").extractOpt[String].getOrElse("unnamed"),
              when = (s \ "when").extractOpt[String].getOrElse("before"),
              query = (s \ "query").extractOpt[String].filter(_.nonEmpty),
              queryFile = (s \ "query_file").extractOpt[String].filter(_.nonEmpty),
              command = (s \ "command").extractOpt[Seq[String]].getOrElse(Nil))
            require(Seq("before", "after").contains(sc.when),
              s"pg-restore scripts: when must be before|after, got ${sc.when}")
            require(sc.query.nonEmpty || sc.queryFile.nonEmpty || sc.command.nonEmpty,
              s"pg-restore scripts: ${sc.name}: nothing to execute")
            sc
          }
          case other => throw new IllegalArgumentException(
            s"pg-restore scripts: section $section must be an array, got $other")
        }
        section -> ss
      }.toMap
      case JNothing => Map.empty
      case other => throw new IllegalArgumentException(
        s"pg-restore scripts: expected an object of sections, got $other")
    }
  }

  /** Execute every script registered for (`section`, `when`), in config
    * order, failing loudly on the first error (the reference aborts the
    * restore when a script fails). Returns one human line per script. */
  private def runScripts(psqlArgs: Seq[String],
                         scripts: Map[String, Seq[Script]],
                         section: String, when: String): Seq[String] =
    scripts.getOrElse(section, Nil).filter(_.when == when).map { s =>
      val (rc, out) = s match {
        case Script(_, _, Some(q), _, _) => exec(psqlArgs, q)
        case Script(_, _, _, Some(f), _) =>
          exec(psqlArgs, java.nio.file.Files.readString(java.nio.file.Paths.get(f)))
        case Script(_, _, _, _, cmd) =>
          val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
          p.getOutputStream.close()
          val o = new String(p.getInputStream.readAllBytes(), "UTF-8")
          (p.waitFor(), o)
      }
      require(rc == 0,
        s"""pg-restore: cannot apply script "${s.name}" $when $section section: $out""")
      s"script ${s.name} ($when $section)"
    }

  /** Idle-activity watchdog — the Pipe operator's discipline
    * (`ops/Pipe.scala:135-155`): arms only when `watchdogSec > 0`; kills
    * the child after that many seconds with NO bytes moving in either
    * direction, but ONLY while `feeding` is still true. Byte-silence is
    * evidence of a hang only where bytes are SUPPOSED to move — the COPY
    * feed; once the payload is fully written the server-side commit tail
    * is legitimately silent, so the feeder drops the flag and the
    * watchdog stands down (silent statements are covered by the
    * server-side `lock_timeout` guard instead — see [[exec]]). Returns
    * the tripped flag. */
  private def armWatchdog(p: Process,
                          lastActivity: java.util.concurrent.atomic.AtomicLong,
                          watchdogSec: Int,
                          feeding: java.util.concurrent.atomic.AtomicBoolean)
      : java.util.concurrent.atomic.AtomicBoolean = {
    val tripped = new java.util.concurrent.atomic.AtomicBoolean(false)
    if (watchdogSec > 0) {
      val timeoutNanos = watchdogSec.toLong * 1000000000L
      val t = new Thread(() => {
        var watching = true
        while (watching && p.isAlive && feeding.get()) {
          val idle = System.nanoTime() - lastActivity.get()
          if (idle >= timeoutNanos) {
            // re-check the flag at the kill decision: a feed that
            // completed during the final sleep must not be killed
            if (feeding.get()) { tripped.set(true); p.destroyForcibly() }
            watching = false
          } else watching = !p.waitFor(
            math.max(50L, (timeoutNanos - idle) / 1000000L),
            java.util.concurrent.TimeUnit.MILLISECONDS)
        }
      }, "graft-pgrestore-watchdog")
      t.setDaemon(true); t.start()
    }
    tripped
  }

  /** Drain `in` to a string, stamping the activity clock per read. */
  private def drainStamping(in: java.io.InputStream,
                            lastActivity: java.util.concurrent.atomic.AtomicLong)
      : String = {
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      if (n > 0) { bos.write(buf, 0, n); lastActivity.set(System.nanoTime()) }
      n = in.read(buf)
    }
    bos.toString("UTF-8")
  }

  private def watchdogSuffix(tripped: java.util.concurrent.atomic.AtomicBoolean,
                             watchdogSec: Int): String =
    if (tripped.get()) s" [watchdog: psql idle > ${watchdogSec}s — killed]" else ""

  /** One SQL batch in its own psql session; returns (rc, combined out).
    *
    * `watchdogSec > 0` guards SERVER-SIDE via `SET lock_timeout` rather
    * than a byte-idle kill: DDL (post-data CREATE INDEX, ADD CONSTRAINT)
    * is legitimately silent for minutes while working, so client-side
    * byte-silence is not evidence of a hang here. `lock_timeout` cancels
    * exactly the hang-on-a-lock case the watchdog exists for, the server
    * reports it ("canceling statement due to lock timeout"), and a
    * healthy long build is never touched.
    *
    * Residual hang class, deliberately NOT guarded: failures the server
    * cannot time out and the client cannot distinguish from work — a
    * network partition mid-statement, or a commit blocked on an
    * unreachable synchronous standby. Guarding those client-side would
    * reintroduce the false-kill of healthy silent DDL this rework
    * removed; operators who need cover there should set server-side
    * `statement_timeout` / TCP keepalives on the conninfo (native
    * pg_restore hangs identically). */
  private def exec(psqlArgs: Seq[String], sql: String,
                   watchdogSec: Int = 0): (Int, String) = {
    val guard =
      if (watchdogSec > 0) Seq("-c", s"SET lock_timeout = '${watchdogSec}s'")
      else Nil
    val cmd = Seq("/usr/bin/psql", "-X", "-q", "-v", "ON_ERROR_STOP=1") ++
      psqlArgs ++ guard ++ Seq("-c", sql)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  /** Run a psql session with `pre` statements (each its own -c) followed
    * by a COPY FROM STDIN fed from `file` (decompressed inline by
    * suffix — .gz/.lz4/.zst). The payload's own `\.` terminator ends
    * the COPY. */
  private def copyFrom(psqlArgs: Seq[String], pre: Seq[String],
                       copySql: String, file: java.io.File,
                       watchdogSec: Int = 0): (Int, String) = {
    // the same lock_timeout guard as exec(): a COPY blocked on a lock it
    // can never get (ACCESS EXCLUSIVE held elsewhere) errors out
    // server-side at the deadline even when the whole payload already
    // fits in the OS pipe buffer (small tables feed to EOF instantly, so
    // the byte-idle watchdog below has already stood down)
    val guard =
      if (watchdogSec > 0) Seq(s"SET lock_timeout = '${watchdogSec}s'")
      else Nil
    val cmd = Seq("/usr/bin/psql", "-X", "-q", "-v", "ON_ERROR_STOP=1") ++
      psqlArgs ++ (guard ++ pre).flatMap(s => Seq("-c", s)) ++ Seq("-c", copySql)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val lastActivity = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    // byte-idle kill is armed ONLY while the feed is mid-stream — that is
    // the one window where silence means a stalled pipe; the post-EOF
    // server-side commit tail is legitimately silent (ADVICE r14)
    val feeding = new java.util.concurrent.atomic.AtomicBoolean(true)
    val tripped = armWatchdog(p, lastActivity, watchdogSec, feeding)
    val feeder = new Thread(() => {
      val in: java.io.InputStream = Compress.input(
        Compress.algoOfFile(file.getName),
        new java.io.BufferedInputStream(new java.io.FileInputStream(file)))
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) {
            p.getOutputStream.write(buf, 0, n)
            lastActivity.set(System.nanoTime())
          }
          n = in.read(buf)
        }
      }
      catch { case _: java.io.IOException => () } // psql exited early
      finally { feeding.set(false)
                try p.getOutputStream.close() catch { case _: Throwable => () }
                in.close() }
    })
    feeder.setDaemon(true); feeder.start()
    val out = drainStamping(p.getInputStream, lastActivity)
    val rc = p.waitFor()
    feeder.join(10000)
    (rc, out + watchdogSuffix(tripped, watchdogSec))
  }

  /** Large-object data: for each `blobs.toc` line, (re)create the oid
    * and stream its payload through chunked `lo_put` calls in a psql -f
    * script — hex literals stay under the per-argument OS limit and a
    * multi-GB blob never lives in one statement. */
  private def restoreBlobs(dir: String, psqlArgs: Seq[String],
                           createOids: Boolean): Seq[String] = {
    val toc = new java.io.File(dir, "blobs.toc")
    if (!toc.exists()) return Nil
    java.nio.file.Files.readAllLines(toc.toPath).toArray(Array[String]())
      .toSeq.map(_.trim).filter(_.nonEmpty).map { line =>
        val Array(oidS, name) = line.split("\\s+", 2)
        val oid = oidS.toLong
        val f = Compress.probeFile(dir, name.trim).getOrElse(
          throw new IllegalArgumentException(
            s"pg-restore: blob payload ${name.trim}(.gz/.lz4/.zst) missing"))
        val in: java.io.InputStream = Compress.input(
          Compress.algoOfFile(f.getName), new java.io.FileInputStream(f))
        val script = java.nio.file.Files.createTempFile("graft_lo", ".sql")
        val w = java.nio.file.Files.newBufferedWriter(script)
        try {
          if (createOids) w.write(s"SELECT pg_catalog.lo_create($oid);\n")
          val buf = new Array[Byte](256 * 1024)
          var off = 0L
          var n = in.read(buf)
          while (n > 0) {
            val hex = new java.lang.StringBuilder(n * 2)
            var i = 0
            while (i < n) {
              hex.append("0123456789abcdef".charAt((buf(i) >> 4) & 0xF))
              hex.append("0123456789abcdef".charAt(buf(i) & 0xF))
              i += 1
            }
            w.write(s"SELECT pg_catalog.lo_put($oid, $off, '\\x$hex');\n")
            off += n
            n = in.read(buf)
          }
        } finally { w.close(); in.close() }
        val cmd = Seq("/usr/bin/psql", "-X", "-q", "-v", "ON_ERROR_STOP=1") ++
          psqlArgs ++ Seq("-o", "/dev/null", "-f", script.toString)
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        p.getOutputStream.close()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        val rc = p.waitFor()
        java.nio.file.Files.delete(script)
        require(rc == 0, s"pg-restore: blob $oid failed: $out")
        s"blob $oid"
      }
  }

  /** `pg_restore -l` analog: one restore-list line per TOC entry in the
    * archive's own format (`dumpId; tableOid oid DESC [namespace] tag
    * owner`). Edit the output — delete or `;`-comment lines, reorder —
    * and feed it back through [[parseRestoreList]] + `restore(useList)`
    * for selective restore, exactly the native workflow. */
  def listLines(dir: String): Seq[String] = {
    val toc = PgToc.readFile(s"$dir/toc.dat")
    Seq(";",
      s"; Archive ${toc.header.dbName.fold("")(d => s"of database $d ")}" +
        s"(format directory, version ${toc.header.versionMajor}." +
        s"${toc.header.versionMinor})",
      "; Selected TOC Entries:",
      ";") ++
      toc.entries.map { e =>
        val ns = e.namespace.filter(_.nonEmpty).fold("")(_ + " ")
        s"${e.dumpId}; ${e.tableOid} ${e.oid} ${e.desc.getOrElse("")} " +
          s"$ns${e.tag.getOrElse("")} ${e.owner.getOrElse("")}"
      }
  }

  /** Parse a pg_restore-format list file: each active line starts with a
    * dumpId followed by `;` (reference `cmd/restore.go:909-949` uses the
    * same `^\s*(\d+)\s*;` shape); comment lines (leading `;`) and any
    * other junk are skipped — commenting a line out IS the disable
    * gesture, as with the native tool. Returns ids in file order. */
  def parseRestoreList(text: String): Seq[Int] = {
    val pat = "^\\s*(\\d+)\\s*;".r
    text.linesIterator
      .flatMap(l => pat.findFirstMatchIn(l).map(_.group(1).toInt)).toSeq
  }

  /** Replay the archive at `dir` into the database `psqlArgs` points at.
    * Returns one human line per restored entry. `dataOnly` skips schema
    * (pre/post-data) statements — the native `-a`; `disableTriggers`
    * wraps each COPY in `session_replication_role = replica` (the
    * reference's integrity control; superuser required).
    *
    * `useList` is the `pg_restore -L` filter ([[parseRestoreList]]
    * output): only the listed entries replay (the reference reorders
    * the TOC to the list, `cmd/restore.go:329-343`). Duplicate dump ids
    * in the list are deduped (first occurrence wins), and a listed id
    * missing from the archive fails loudly (same message shape). List
    * order is honored WITHIN each restore section — execution still
    * phases pre-data → data waves → SEQUENCE SET/blobs → post-data, so
    * a list that interleaves sections replays section-phased, not
    * literally as listed (restoring an index before its table's data
    * is never correct; the phasing preserves that invariant the same
    * way the native tool's parallel mode does). Within the data
    * section, listed tables keep list order subject to dependency
    * waves. `withDeps` additionally pulls each listed entry's
    * transitive dependency closure back in, in TOC order — the
    * [[graft.pipeline.Manifest.filtered]] discipline (iterative visited
    * set, cycle-safe) for users who list only the tables they want and
    * expect the DDL those tables need to come along; the native tool
    * makes the user list everything, so the default matches it.
    *
    * Native failure/selection flags (reference passthrough surface,
    * `cmd/restore/restore.go:146-217`; here there is no binary to
    * delegate to, so each is EXECUTED, not forwarded):
    *  - `exitOnError` (`-e`): abort on the first failed statement/COPY.
    *    The API default stays fail-fast (library callers want loud
    *    breakage); the CLI default matches the native tool — CONTINUE,
    *    warn per failure, and close with `errors ignored on restore: N`
    *    (`restorers/table.go:90-102`: a failed table rolls back ITS
    *    transaction and the wave moves on). Exit-code-worthy archive
    *    corruption (missing payload file) still always throws.
    *  - `clean` (`-c`): replay each selected entry's dropStmt in reverse
    *    TOC order before recreating. A failed drop (object absent, no
    *    `--if-exists` here) follows the exitOnError rule, like native.
    *  - `create` (`-C`): execute the archive's DATABASE entry against
    *    the maintenance database derived from `psqlArgs` (dbname
    *    swapped to `postgres`), then restore into the target as given.
    *  - `tables`/`indexes` (`-t`/`-i`): restore only the named
    *    relations/indexes (DDL + data for tables; nothing else — like
    *    native, no schemas/blobs come along). `strictNames` makes each
    *    name that matches nothing an error instead of an empty
    *    selection. */
  def restore(dir: String, psqlArgs: Seq[String],
              dataOnly: Boolean = false,
              disableTriggers: Boolean = false,
              jobs: Int = 4,
              useList: Option[Seq[Int]] = None,
              withDeps: Boolean = false,
              scripts: Map[String, Seq[Script]] = Map.empty,
              restoreInOrder: Boolean = false,
              exitOnError: Boolean = true,
              clean: Boolean = false,
              create: Boolean = false,
              tables: Seq[String] = Nil,
              indexes: Seq[String] = Nil,
              strictNames: Boolean = false,
              ifExists: Boolean = false,
              section: Option[String] = None,
              noDataForFailedTables: Boolean = false,
              noOwner: Boolean = false,
              noPrivileges: Boolean = false,
              schemaOnly: Boolean = false,
              noBlobs: Boolean = false,
              noComments: Boolean = false,
              schemas: Seq[String] = Nil,
              excludeSchemas: Seq[String] = Nil,
              functions: Seq[String] = Nil,
              triggers: Seq[String] = Nil,
              noPublications: Boolean = false,
              noSubscriptions: Boolean = false,
              noSecurityLabels: Boolean = false,
              enableRowSecurity: Boolean = false,
              singleTransaction: Boolean = false,
              noTablespaces: Boolean = false,
              noTableAccessMethod: Boolean = false,
              verbose: Boolean = false,
              watchdogSec: Int = 0): Seq[String] = {
    section.foreach(s => require(ScriptSections.contains(s),
      s"pg-restore: --section must be pre-data|data|post-data, got $s"))
    require(!(schemaOnly && dataOnly),
      "pg-restore: --schema-only and --data-only are mutually exclusive")
    require(!(create && singleTransaction),
      "pg-restore: --create cannot run inside --single-transaction")
    if (singleTransaction) {
      // native -1: everything in ONE session, ONE transaction — implies
      // exit-on-error (any failure rolls the whole restore back). Render
      // the script form and replay it through a single psql -1 session.
      // Options that cannot survive the script detour fail loudly or
      // warn instead of being silently dropped: user script hooks have
      // no script-form equivalent (reject); --no-data-for-failed-tables
      // is moot in one transaction (a failed CREATE rolls back the
      // whole restore before any data loads — warn).
      require(scripts.isEmpty,
        "pg-restore: --scripts hooks cannot run under --single-transaction " +
          "(the restore replays as one SQL script); drop -1 or the scripts")
      if (noDataForFailedTables)
        System.err.println("[pg-restore] warning: --no-data-for-failed-tables " +
          "has no effect with --single-transaction (any failure rolls back " +
          "the entire restore)")
      val tmp = java.nio.file.Files.createTempFile("graft_restore_1tx", ".sql")
      try {
        val os = java.nio.file.Files.newOutputStream(tmp)
        val n = try {
          // session-level integrity controls ride at the top of the
          // script (SET outside the transaction = session scope), same
          // effect as the per-COPY `pre` statements on the direct path
          val sets =
            (if (disableTriggers) Seq("SET session_replication_role = replica;\n") else Nil) ++
              (if (enableRowSecurity) Seq("SET row_security = on;\n") else Nil)
          sets.foreach(s => os.write(s.getBytes("UTF-8")))
          toScript(dir, os, dataOnly, schemaOnly, section, clean,
            ifExists, create = false, noOwner, noPrivileges,
            singleTransaction = true, useList, withDeps, tables, indexes,
            functions, triggers, schemas, excludeSchemas, strictNames,
            noBlobs, noComments, noPublications, noSubscriptions,
            noSecurityLabels, noTablespaces, noTableAccessMethod)
        } finally os.close()
        val cmd = Seq("/usr/bin/psql", "-X", "-q", "-v", "ON_ERROR_STOP=1") ++
          psqlArgs ++ Seq("-o", "/dev/null", "-f", tmp.toString)
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        p.getOutputStream.close()
        val outText = new String(p.getInputStream.readAllBytes(), "UTF-8")
        require(p.waitFor() == 0,
          s"pg-restore: single-transaction replay failed (rolled back): " +
            outText.takeRight(400))
        return Seq(s"single transaction: $n entries applied")
      } finally java.nio.file.Files.deleteIfExists(tmp)
    }
    // --section=X restores ONE section; dataOnly is the legacy -a alias
    // for the data section; -s = the pre-data + post-data pair (all DDL,
    // no data — native pg_restore's own mapping)
    val runPre = section.forall(_ == "pre-data") && !dataOnly
    val runData = section.forall(_ == "data") && !schemaOnly
    val runPost = section.forall(_ == "post-data") && !dataOnly
    val fullToc = PgToc.readFile(s"$dir/toc.dat")
    val selected = selectEntries(fullToc, useList, withDeps, tables, indexes,
      functions, triggers, schemas, excludeSchemas, strictNames, noBlobs,
      noComments, noPublications, noSubscriptions, noSecurityLabels,
      noPrivileges, create)
    val pre =
      (if (disableTriggers) Seq("SET session_replication_role = replica") else Nil) ++
        // native --enable-row-security: COPY into RLS tables goes through
        // the policies of the connecting role instead of failing
        (if (enableRowSecurity) Seq("SET row_security = on") else Nil)
    val done = Seq.newBuilder[String]

    // continue-mode error accounting (native default): each failure
    // warns and counts; the run closes with the native tool's summary
    val ignored = new java.util.concurrent.atomic.AtomicInteger(0)
    def failOrWarn(msg: String): Unit =
      if (exitOnError) throw new IllegalArgumentException(msg)
      else {
        ignored.incrementAndGet()
        System.err.println(s"[pg-restore] warning: $msg (continuing)")
      }

    // -C: stand the target database up first, from the archive's own
    // DATABASE entry, via the maintenance database (native reconnect
    // dance; `cmd/restore.go:391+` delegates this section the same way)
    if (create) {
      val dbEntry = fullToc.entries.find(_.desc.contains("DATABASE")).getOrElse(
        throw new IllegalArgumentException(
          "pg-restore: --create needs a DATABASE entry in the archive"))
      val sql = dbEntry.defn.filter(_.trim.nonEmpty).getOrElse(
        throw new IllegalArgumentException(
          "pg-restore: DATABASE entry carries no CREATE DATABASE statement"))
      val (rc, out) = exec(maintenanceArgs(psqlArgs), sql)
      require(rc == 0, s"pg-restore: CREATE DATABASE failed: $out")
      done += s"DATABASE ${dbEntry.tag.getOrElse("?")}"
    }

    // -c: drop selected objects in reverse TOC order before recreating.
    // A drop that fails (object absent) follows the exitOnError rule —
    // native counts those as ignored errors by default too — unless
    // --if-exists rewrote it to tolerate absence (the native pairing).
    if (clean && runPre && !dataOnly)
      selected.entries.reverse
        // session-level entries (DATABASE, ENCODING, ...) are skipped in
        // replay, so their drops are skipped too — native -c never drops
        // the target database unless -C re-creates it via maintenance
        .filterNot(_.desc.exists(d => replaySkip(d, create = false)))
        .foreach { e =>
        e.dropStmt.map(_.trim).filter(_.nonEmpty).foreach { raw =>
          val sql = if (ifExists) injectIfExists(raw) else raw
          val (rc, out) = exec(psqlArgs, sql, watchdogSec)
          if (rc != 0) failOrWarn(
            s"pg-restore: DROP for ${e.desc.getOrElse("?")} ${e.tag.getOrElse("?")} failed: ${out.trim}")
        }
      }

    // --no-data-for-failed-tables: a TABLE whose CREATE failed (already
    // exists, usually) must not have the archive's data appended on top
    // of whatever it holds — the native flag's whole point. Keyed by
    // (namespace, tag): native tracks the failed ENTRY, so a failed
    // a.t must not suppress the data load of an unrelated b.t
    val failedTables = java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
    def tableKey(e: PgToc.Entry): Option[(String, String)] =
      e.tag.map(t => (e.namespace.filter(_.nonEmpty).getOrElse(""), t))

    // ownership lives in the TOC's OWNER FIELD (verified against real
    // pg_dump 15 toc.dat): native pg_restore SYNTHESIZES the
    // `ALTER <type> <name> OWNER TO <role>` statement from it at restore
    // time, and -O suppresses exactly that synthesis (the restore then
    // runs as the connecting user — the flag's point when the dump's
    // roles don't exist on the target)
    val ownable = Map("TABLE" -> "TABLE", "SEQUENCE" -> "SEQUENCE",
      "VIEW" -> "VIEW", "MATERIALIZED VIEW" -> "MATERIALIZED VIEW",
      "FOREIGN TABLE" -> "FOREIGN TABLE", "SCHEMA" -> "SCHEMA")
    def applyOwner(e: PgToc.Entry): Unit =
      if (!noOwner) for {
        d <- e.desc; kind <- ownable.get(d)
        o <- e.owner.filter(_.nonEmpty); t <- e.tag.filter(_.nonEmpty)
      } {
        val qi = graft.sources.PgSource.quoteIdent _
        val qn = e.namespace.filter(_.nonEmpty) match {
          case Some(ns) if d != "SCHEMA" => s"${qi(ns)}.${qi(t)}"
          case _ => qi(t)
        }
        val (rc, out) = exec(psqlArgs, s"ALTER $kind $qn OWNER TO ${qi(o)};")
        if (rc != 0) failOrWarn(
          s"pg-restore: ALTER OWNER for $d $t failed: ${out.trim}")
      }

    def execDefn(e: PgToc.Entry): Unit = {
      // -X: ACL entries (GRANT/REVOKE/DEFAULT ACL) are skipped whole
      if (noPrivileges && e.desc.exists(d => d == "ACL" || d == "DEFAULT ACL"))
        return
      e.defn.filter(_.trim.nonEmpty).foreach { raw =>
        // archives that carry explicit ALTER OWNER lines in defn (our
        // merged shapes never do; belt for foreign producers) follow -O
        val body =
          if (!noOwner) raw
          else raw.linesIterator
            .filterNot(_.matches("""ALTER .* OWNER TO .*;\s*"""))
            .mkString("\n")
        if (body.trim.isEmpty) return
        if (verbose) System.err.println(
          s"[pg-restore] creating ${e.desc.getOrElse("?")} " +
            s"${e.namespace.filter(_.nonEmpty).fold("")(_ + ".")}${e.tag.getOrElse("?")}")
        // tablespace/AM live in TOC FIELDS: native synthesizes the SET
        // before the object's DDL ( pg_backup_archiver _selectTablespace /
        // _printTableAccessMethod); --no-tablespaces / the AM twin
        // suppress exactly that synthesis. Each statement runs in its own
        // psql session here, so the SET rides the same -c batch. An empty
        // tablespace string means "database default" — already this
        // session's state, so only non-empty values need a SET.
        val sets = tsSets(e, noTablespaces, noTableAccessMethod)
        val sql = (sets :+ body).mkString("\n")
        val (rc, out) = exec(psqlArgs, sql, watchdogSec)
        if (rc != 0) {
          if (e.desc.contains("TABLE")) tableKey(e).foreach(failedTables.add)
          failOrWarn(
            s"pg-restore: ${e.desc.getOrElse("?")} ${e.tag.getOrElse("?")} failed: $out")
        }
        else {
          done += s"${e.desc.getOrElse("?")} ${e.tag.getOrElse("?")}"
          applyOwner(e)
        }
      }
    }

    // returns true iff the table's data actually loaded — the caller
    // logs `TABLE DATA <tag>` only for successes (native prints the
    // entry header before failing too, but our returned log doubles as
    // the success record the CLI prints; a failed load must not read
    // as restored)
    def loadTable(e: PgToc.Entry): Boolean = {
      if (noDataForFailedTables && tableKey(e).exists(failedTables.contains)) {
        System.err.println(s"[pg-restore] table ${e.tag.get} could not be " +
          "created, will not restore its data (--no-data-for-failed-tables)")
        return false
      }
      // structural archive corruption always throws — a missing payload
      // is not a per-table data error the server reported
      val base = e.fileName.filter(_.nonEmpty).getOrElse(
        throw new IllegalArgumentException(
          s"pg-restore: TABLE DATA ${e.tag.getOrElse("?")} has no data file"))
      val f = Compress.probeFile(dir, base).getOrElse(
        throw new IllegalArgumentException(
          s"pg-restore: missing payload $base(.gz/.lz4/.zst)"))
      val copySql = e.copyStmt.map(_.trim.stripSuffix(";")).getOrElse(
        throw new IllegalArgumentException(
          s"pg-restore: TABLE DATA ${e.tag.getOrElse("?")} has no COPY statement"))
      if (verbose) System.err.println(
        s"[pg-restore] processing data for table " +
          s"${e.namespace.filter(_.nonEmpty).fold("")(_ + ".")}${e.tag.getOrElse("?")}")
      val (rc, out) = copyFrom(psqlArgs, pre, copySql, f, watchdogSec)
      // a failed COPY rolled back ITS table's transaction server-side;
      // without -e the wave moves on (restorers/table.go:90-102)
      if (rc != 0) {
        failOrWarn(s"pg-restore: COPY ${e.tag.getOrElse("?")} failed: ${out.trim}")
        false
      } else true
    }

    // dependency WAVES inside the data section: a data entry whose deps
    // include another data entry waits for it; independents run together
    val dataEntries = selected.entries.filter(_.desc.contains("TABLE DATA"))
    val dataIds = dataEntries.map(_.dumpId).toSet
    def waves(remaining: Seq[PgToc.Entry], doneIds: Set[Int],
              acc: Seq[Seq[PgToc.Entry]]): Seq[Seq[PgToc.Entry]] =
      if (remaining.isEmpty) acc
      else {
        val (ready, blocked) = remaining.partition(
          _.dependencies.filter(dataIds).forall(doneIds))
        require(ready.nonEmpty,
          "pg-restore: dependency cycle among TABLE DATA entries")
        waves(blocked, doneIds ++ ready.map(_.dumpId), acc :+ ready)
      }

    // 1. schema + pre-data statements, TOC order (unless data-only or
    // --section scoped it out) — user scripts bracket the sections that
    // RUN (reference cmd/restore.go:381,446)
    if (runPre) {
      done ++= runScripts(psqlArgs, scripts, "pre-data", "before")
      selected.entries.filter(e => e.section == PgToc.SectionPreData ||
          e.section == PgToc.SectionNone).foreach { e =>
        val d = e.desc.getOrElse("")
        if (!replaySkip(d, create)) execDefn(e)
      }
      done ++= runScripts(psqlArgs, scripts, "pre-data", "after")
    }
    // 2. data: tables in dependency waves through a worker pool — or,
    // under the native --restore-in-order flag, strictly sequentially in
    // TOC/list order (deterministic replay; what the reference's flag
    // disables parallel reordering for)
    if (runData) {
      done ++= runScripts(psqlArgs, scripts, "data", "before")
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      if (restoreInOrder)
        dataEntries.foreach { e =>
          if (loadTable(e)) done += s"TABLE DATA ${e.tag.getOrElse("?")}"
        }
      else {
        val ec = ExecutionContext.fromExecutorService(
          java.util.concurrent.Executors.newFixedThreadPool(math.max(1, jobs)))
        try waves(dataEntries, Set.empty, Nil).foreach { wave =>
          // in continue mode a failed COPY returns false — only tables
          // that actually loaded are reported as restored
          val oks = wave.map(e => Future(loadTable(e))(ec))
            .map(Await.result(_, Duration.Inf))
          wave.zip(oks).foreach { case (e, ok) =>
            if (ok) done += s"TABLE DATA ${e.tag.getOrElse("?")}" }
        } finally ec.shutdown()
      }
      // remaining data-section statements (SEQUENCE SET) + blobs
      selected.entries.filter(e => e.section == PgToc.SectionData &&
        e.desc.contains("SEQUENCE SET")).foreach(execDefn)
      if (selected.entries.exists(_.desc.contains("BLOBS")))
        done ++= restoreBlobs(dir, psqlArgs, createOids = dataOnly)
      done ++= runScripts(psqlArgs, scripts, "data", "after")
    }
    // 3. post-data (constraints, indexes, FKs) + ACLs
    if (runPost) {
      done ++= runScripts(psqlArgs, scripts, "post-data", "before")
      selected.entries.filter(_.section == PgToc.SectionPostData).foreach(execDefn)
      done ++= runScripts(psqlArgs, scripts, "post-data", "after")
    }
    // native closing summary (pg_restore prints "errors ignored on
    // restore: N" when it continued past failures)
    if (ignored.get() > 0) done += s"errors ignored on restore: ${ignored.get()}"
    done.result()
  }

  /** Session-level descs: skipped in replay, never dropped by -c. */
  private val SessionDescs = Set("DATABASE", "ENCODING", "STDSTRINGS", "SEARCHPATH")

  /** Replay-time gate shared by the direct and script paths. DATABASE
    * PROPERTIES (ALTER DATABASE <source> SET ...) is selected like native
    * (`_tocEntryRequired` keeps it in the TOC) but REPLAYED only under
    * --create — native gates it on `ropt->createDB`
    * (pg_backup_archiver.c), because without -C the statement would
    * mutate a same-named database that already exists on the target
    * cluster, or abort a valid restore under -e when it doesn't. */
  private def replaySkip(desc: String, create: Boolean): Boolean =
    SessionDescs(desc) || (desc == "DATABASE PROPERTIES" && !create)

  /** Synthesized tablespace / access-method SETs for one entry — native
    * pg_restore derives these from the TOC FIELDS at restore time
    * (pg_backup_archiver.c `_selectTablespace` /
    * `_printTableAccessMethod`); `--no-tablespaces` /
    * `--no-table-access-method` suppress exactly that synthesis. A NULL
    * field means "emit no SET"; an empty tablespace means the database
    * default — already every fresh session's state, so the direct path
    * (one psql session per statement) skips it. */
  private def tsSets(e: PgToc.Entry, noTablespaces: Boolean,
                     noTableAccessMethod: Boolean): Seq[String] =
    (if (noTablespaces) None
     else e.tablespace.filter(_.nonEmpty).map(ts =>
       s"SET default_tablespace = ${PgSource.quoteIdent(ts)};")).toSeq ++
      (if (noTableAccessMethod) None
       else e.tableam.filter(_.nonEmpty).map(am =>
         s"SET default_table_access_method = ${PgSource.quoteIdent(am)};")).toSeq

  /** The shared selection pipeline behind [[restore]] and [[toScript]]:
    * -L list filter (+ --with-deps closure), -t/-i/-P/-T named selection,
    * -n/-N namespace filters, and the --no-* entry drops, with
    * --strict-names making unmatched names an error. */
  private def selectEntries(fullToc: PgToc.Toc,
                            useList: Option[Seq[Int]], withDeps: Boolean,
                            tables: Seq[String], indexes: Seq[String],
                            functions: Seq[String], triggers: Seq[String],
                            schemas: Seq[String], excludeSchemas: Seq[String],
                            strictNames: Boolean, noBlobs: Boolean,
                            noComments: Boolean, noPublications: Boolean,
                            noSubscriptions: Boolean,
                            noSecurityLabels: Boolean,
                            noPrivileges: Boolean = false,
                            create: Boolean = false): PgToc.Toc = {
    val toc = useList match {
      case None => fullToc
      case Some(rawIds) =>
        // duplicate ids in a hand-edited list must not restore twice;
        // first occurrence keeps its position
        val ids = rawIds.distinct
        val byId = fullToc.entries.map(e => e.dumpId -> e).toMap
        ids.foreach(id => require(byId.contains(id),
          s"pg-restore: entry from provided list with dump id $id is not found"))
        val entries =
          if (!withDeps) ids.map(byId)
          else {
            val needed = scala.collection.mutable.Set[Int]()
            val queue = scala.collection.mutable.Queue[Int](ids: _*)
            while (queue.nonEmpty) {
              val id = queue.dequeue()
              if (needed.add(id))
                byId.get(id).foreach(_.dependencies.foreach(queue.enqueue))
            }
            // closure restores in TOC order (pg_dump's own restore-safe
            // order); pure-list mode keeps the list's order instead
            fullToc.entries.filter(e => needed(e.dumpId))
          }
        fullToc.copy(entries = entries)
    }
    // Selection semantics verified ENTRY-BY-ENTRY against real
    // pg_restore 15 `-l` output (PgInteropSpec differential matrix);
    // mirrors pg_backup_archiver.c `_tocEntryRequired`:
    //  - -t/-i/-P/-T ("selTypes" mode): only the four entry classes are
    //    eligible at all; anything else (SCHEMA, DEFAULT, SEQUENCE OWNED
    //    BY, BLOBS, ACL-without-parent, ...) drops. Native -P/-T match
    //    the EXACT tag ("f1(integer)", "t1 tg1"); as a documented
    //    extension the bare function/trigger name is accepted too.
    //  - -n drops entries with NO namespace — including the SCHEMA
    //    entries themselves (native quirk: `pg_restore -n s1` does not
    //    create s1; the operator pre-creates it) — while -N keeps them.
    //  - ACL / COMMENT / SECURITY LABEL entries INHERIT: under any
    //    selectivity option they ride iff their single dependency is a
    //    selected entry (a table's comment/GRANT follows it under -t).
    //    Comments/ACLs ON DATABASE react to --create only.
    val relationDescs = Set("TABLE", "TABLE DATA", "VIEW",
      "MATERIALIZED VIEW", "SEQUENCE", "SEQUENCE SET", "FOREIGN TABLE")
    val fnDescs = Set("FUNCTION", "AGGREGATE", "PROCEDURE")
    val selTypes = tables.nonEmpty || indexes.nonEmpty ||
      functions.nonEmpty || triggers.nonEmpty
    def fnMatch(tag: String, want: String): Boolean =
      tag == want || (!want.contains("(") && tag.takeWhile(_ != '(') == want)
    def trgMatch(tag: String, want: String): Boolean =
      tag == want || tag.endsWith(" " + want)
    if (strictNames) {
      tables.foreach(t => require(
        toc.entries.exists(e => e.tag.contains(t) && e.desc.exists(relationDescs)),
        s"""pg-restore: table "$t" not found in archive (--strict-names)"""))
      indexes.foreach(i => require(
        toc.entries.exists(e => e.tag.contains(i) && e.desc.contains("INDEX")),
        s"""pg-restore: index "$i" not found in archive (--strict-names)"""))
      functions.foreach(f => require(
        toc.entries.exists(e => e.desc.exists(fnDescs) && e.tag.exists(fnMatch(_, f))),
        s"""pg-restore: function "$f" not found in archive (--strict-names)"""))
      triggers.foreach(t => require(
        toc.entries.exists(e => e.desc.contains("TRIGGER") &&
          e.tag.exists(trgMatch(_, t))),
        s"""pg-restore: trigger "$t" not found in archive (--strict-names)"""))
      schemas.foreach(n => require(toc.entries.exists(_.namespace.contains(n)),
        s"""pg-restore: schema "$n" not found in archive (--strict-names)"""))
    }
    val byId = toc.entries.map(e => e.dumpId -> e).toMap
    val memo = scala.collection.mutable.Map[Int, Boolean]()
    def required(id: Int): Boolean = memo.get(id) match {
      case Some(v) => v
      case None =>
        val v = byId.get(id).exists { e =>
          val desc = e.desc.getOrElse("")
          val ns = e.namespace.filter(_.nonEmpty)
          if (SessionDescs(desc) || desc == "DATABASE PROPERTIES")
            true // replay skips these; the -l listing hides/gates them
          else if (noBlobs && (desc.startsWith("BLOB") || desc == "LARGE OBJECT"))
            false
          else if (noComments && desc == "COMMENT") false
          else if (noPublications && desc.startsWith("PUBLICATION")) false
          else if (noSubscriptions && desc == "SUBSCRIPTION") false
          else if (noSecurityLabels && desc == "SECURITY LABEL") false
          else if (noPrivileges && (desc == "ACL" || desc == "DEFAULT ACL")) false
          else if (desc == "ACL" || desc == "COMMENT" || desc == "SECURITY LABEL") {
            if (e.tag.exists(_.startsWith("DATABASE "))) create
            else if (schemas.nonEmpty || excludeSchemas.nonEmpty || selTypes)
              e.dependencies.size == 1 && required(e.dependencies.head)
            else true
          } else {
            (schemas.isEmpty || ns.exists(schemas.contains)) &&
              !ns.exists(excludeSchemas.contains) &&
              (!selTypes ||
                (if (relationDescs(desc))
                   tables.nonEmpty && e.tag.exists(tables.contains)
                 else if (desc == "INDEX")
                   indexes.nonEmpty && e.tag.exists(indexes.contains)
                 else if (fnDescs(desc))
                   functions.nonEmpty &&
                     e.tag.exists(tg => functions.exists(fnMatch(tg, _)))
                 else if (desc == "TRIGGER")
                   triggers.nonEmpty &&
                     e.tag.exists(tg => triggers.exists(trgMatch(tg, _)))
                 else false))
          }
        }
        memo(id) = v
        v
    }
    toc.copy(entries = toc.entries.filter(e => required(e.dumpId)))
  }

  /** Native `pg_restore -l <flags>`: the dumpIds the archive would list
    * (equivalently, restore) under the given selection — PrintTOCSummary
    * + `_tocEntryRequired` faithfully: the sliding-section rule
    * (SECTION_NONE entries like ACLs/COMMENTs inherit the current
    * position's section in file order), the never-listed
    * ENCODING/STDSTRINGS/SEARCHPATH specials, and the DATABASE entry's
    * createDB-only rule (listed first, before any section gate).
    * Verified against the real pg_restore 15 binary over a 24-combo
    * flag matrix in PgInteropSpec. */
  def listSelectedIds(dir: String,
                      dataOnly: Boolean = false, schemaOnly: Boolean = false,
                      section: Option[String] = None, create: Boolean = false,
                      useList: Option[Seq[Int]] = None, withDeps: Boolean = false,
                      tables: Seq[String] = Nil, indexes: Seq[String] = Nil,
                      functions: Seq[String] = Nil, triggers: Seq[String] = Nil,
                      schemas: Seq[String] = Nil,
                      excludeSchemas: Seq[String] = Nil,
                      strictNames: Boolean = false, noBlobs: Boolean = false,
                      noComments: Boolean = false, noPrivileges: Boolean = false,
                      noPublications: Boolean = false,
                      noSubscriptions: Boolean = false,
                      noSecurityLabels: Boolean = false): Seq[Int] = {
    val fullToc = PgToc.readFile(s"$dir/toc.dat")
    val selected = selectEntries(fullToc, useList, withDeps, tables, indexes,
      functions, triggers, schemas, excludeSchemas, strictNames, noBlobs,
      noComments, noPublications, noSubscriptions, noSecurityLabels,
      noPrivileges, create).entries.map(_.dumpId).toSet
    val runPre = section.forall(_ == "pre-data") && !dataOnly
    val runData = section.forall(_ == "data") && !schemaOnly
    val runPost = section.forall(_ == "post-data") && !dataOnly
    val hidden = Set("ENCODING", "STDSTRINGS", "SEARCHPATH")
    var cur = PgToc.SectionPreData
    fullToc.entries.flatMap { e =>
      val sec = if (e.section == PgToc.SectionNone) cur
                else { cur = e.section; cur }
      val desc = e.desc.getOrElse("")
      if (hidden(desc)) None
      else if (desc == "DATABASE" || desc == "DATABASE PROPERTIES")
        (if (create) Some(e.dumpId) else None)
      else {
        val sectionOk =
          if (sec == PgToc.SectionData) runData
          else if (sec == PgToc.SectionPostData) runPost
          else runPre
        if (sectionOk && selected(e.dumpId)) Some(e.dumpId) else None
      }
    }
  }

  /** Structured use-list (`--list-format=json|yaml`, reference
    * `cmd/restore.go:953-995` parseStructuredList): a metadata document
    * whose `entries[].dumpId` fields form the restore list in order —
    * the engine's own manifest.json is exactly this shape, so a dump's
    * manifest doubles as its restore list. dumpId 0 or missing is a
    * broken file (the reference's error, same message shape). */
  def parseStructuredRestoreList(text: String, format: String): Seq[Int] = {
    val mapper = format match {
      case "json" => new com.fasterxml.jackson.databind.ObjectMapper()
      case "yaml" => new com.fasterxml.jackson.databind.ObjectMapper(
        new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
      case other => throw new IllegalArgumentException(
        s"pg-restore: --list-format must be text|json|yaml, got $other")
    }
    val root = mapper.readTree(text)
    // the reference's metadata document wraps the list in `entries`; the
    // engine's own manifest.json IS the bare entry array — accept both
    val entries = if (root.isArray) root else root.get("entries")
    require(entries != null && entries.isArray,
      "pg-restore: structured list file has no entries array")
    import scala.jdk.CollectionConverters._
    entries.elements().asScala.zipWithIndex.map { case (e, idx) =>
      val id = Option(e.get("dumpId")).map(_.asInt(0)).getOrElse(0)
      require(id != 0,
        s"broken list file dumpId: must not be 0: entry number $idx")
      id
    }.toSeq
  }

  /** Native `pg_restore -f` (script output): render the archive as ONE
    * plain-SQL stream — DDL in TOC order, each TABLE DATA as a
    * `COPY ... FROM stdin;` block with its decompressed payload inlined
    * (payloads already end with the `\.` terminator), SEQUENCE SET, then
    * post-data — honoring the same selection flags as [[restore]].
    * `singleTransaction` wraps the body in BEGIN/COMMIT (incompatible
    * with `create` — CREATE DATABASE cannot run in a transaction, the
    * native restriction). Large objects are not representable in plain
    * SQL here; their entries are skipped with a warning.
    * Returns the number of entries rendered. */
  def toScript(dir: String, out: java.io.OutputStream,
               dataOnly: Boolean = false, schemaOnly: Boolean = false,
               section: Option[String] = None,
               clean: Boolean = false, ifExists: Boolean = false,
               create: Boolean = false,
               noOwner: Boolean = false, noPrivileges: Boolean = false,
               singleTransaction: Boolean = false,
               useList: Option[Seq[Int]] = None, withDeps: Boolean = false,
               tables: Seq[String] = Nil, indexes: Seq[String] = Nil,
               functions: Seq[String] = Nil, triggers: Seq[String] = Nil,
               schemas: Seq[String] = Nil, excludeSchemas: Seq[String] = Nil,
               strictNames: Boolean = false, noBlobs: Boolean = false,
               noComments: Boolean = false, noPublications: Boolean = false,
               noSubscriptions: Boolean = false,
               noSecurityLabels: Boolean = false,
               noTablespaces: Boolean = false,
               noTableAccessMethod: Boolean = false): Int = {
    section.foreach(s => require(ScriptSections.contains(s),
      s"pg-restore: --section must be pre-data|data|post-data, got $s"))
    require(!(schemaOnly && dataOnly),
      "pg-restore: --schema-only and --data-only are mutually exclusive")
    require(!(create && singleTransaction),
      "pg-restore: --create cannot run inside --single-transaction " +
        "(CREATE DATABASE is not transactional)")
    val runPre = section.forall(_ == "pre-data") && !dataOnly
    val runData = section.forall(_ == "data") && !schemaOnly
    val runPost = section.forall(_ == "post-data") && !dataOnly
    val fullToc = PgToc.readFile(s"$dir/toc.dat")
    val selected = selectEntries(fullToc, useList, withDeps, tables, indexes,
      functions, triggers, schemas, excludeSchemas, strictNames, noBlobs,
      noComments, noPublications, noSubscriptions, noSecurityLabels,
      noPrivileges, create)
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(out, "UTF-8"))
    var rendered = 0
    def stmt(sql: String): Unit = {
      val s = sql.trim
      if (s.nonEmpty) {
        w.write(if (s.endsWith(";")) s else s + ";"); w.write("\n")
        rendered += 1
      }
    }
    w.write(s"-- graft pg-restore script (archive: $dir)\n")
    if (create) {
      val dbEntry = fullToc.entries.find(_.desc.contains("DATABASE")).getOrElse(
        throw new IllegalArgumentException(
          "pg-restore: --create needs a DATABASE entry in the archive"))
      dbEntry.defn.filter(_.trim.nonEmpty).foreach(stmt)
      // the native script reconnects into the new database
      dbEntry.tag.foreach(t =>
        w.write(s"\\connect ${PgSource.quoteIdent(t)}\n"))
    }
    if (singleTransaction) w.write("BEGIN;\n")
    val ownable = Map("TABLE" -> "TABLE", "SEQUENCE" -> "SEQUENCE",
      "VIEW" -> "VIEW", "MATERIALIZED VIEW" -> "MATERIALIZED VIEW",
      "FOREIGN TABLE" -> "FOREIGN TABLE", "SCHEMA" -> "SCHEMA")
    // script form tracks the session's current tablespace/AM like native
    // (one long session; a SET is emitted only on CHANGE — including the
    // initial `SET default_tablespace = '';` real pg_dump scripts open
    // tables with). SET lines don't count as rendered entries.
    var currTs: String = null
    var currAm: String = null
    def emitTsSets(e: PgToc.Entry): Unit = {
      if (!noTablespaces) e.tablespace.foreach { want =>
        if (want != currTs) {
          w.write(if (want.isEmpty) "SET default_tablespace = '';\n"
                  else s"SET default_tablespace = ${PgSource.quoteIdent(want)};\n")
          currTs = want
        }
      }
      if (!noTableAccessMethod) e.tableam.filter(_.nonEmpty).foreach { want =>
        if (want != currAm) {
          w.write(s"SET default_table_access_method = ${PgSource.quoteIdent(want)};\n")
          currAm = want
        }
      }
    }
    def emitDefn(e: PgToc.Entry): Unit = {
      if (noPrivileges && e.desc.exists(d => d == "ACL" || d == "DEFAULT ACL"))
        return
      emitTsSets(e)
      e.defn.filter(_.trim.nonEmpty).foreach { raw =>
        val sql =
          if (!noOwner) raw
          else raw.linesIterator
            .filterNot(_.matches("""ALTER .* OWNER TO .*;\s*"""))
            .mkString("\n")
        stmt(sql)
        if (!noOwner) for {
          d <- e.desc; kind <- ownable.get(d)
          o <- e.owner.filter(_.nonEmpty); t <- e.tag.filter(_.nonEmpty)
        } {
          val qi = PgSource.quoteIdent _
          val qn = e.namespace.filter(_.nonEmpty) match {
            case Some(ns) if d != "SCHEMA" => s"${qi(ns)}.${qi(t)}"
            case _ => qi(t)
          }
          stmt(s"ALTER $kind $qn OWNER TO ${qi(o)}")
        }
      }
    }
    if (clean && runPre && !dataOnly)
      selected.entries.reverse
        .filterNot(_.desc.exists(d => replaySkip(d, create = false))).foreach {
        e => e.dropStmt.map(_.trim).filter(_.nonEmpty)
          .foreach(raw => stmt(if (ifExists) injectIfExists(raw) else raw))
      }
    if (runPre)
      selected.entries.filter(e => e.section == PgToc.SectionPreData ||
          e.section == PgToc.SectionNone)
        .filterNot(_.desc.exists(d => replaySkip(d, create))).foreach(emitDefn)
    if (runData) {
      selected.entries.filter(_.desc.contains("TABLE DATA")).foreach { e =>
        for {
          copySql <- e.copyStmt.map(_.trim.stripSuffix(";"))
          base <- e.fileName.filter(_.nonEmpty)
          f <- Compress.probeFile(dir, base)
        } {
          w.write(copySql); w.write(";\n"); w.flush()
          val in = Compress.input(Compress.algoOfFile(f.getName),
            new java.io.BufferedInputStream(new java.io.FileInputStream(f)))
          try in.transferTo(out) finally in.close()
          rendered += 1
        }
      }
      selected.entries.filter(e => e.section == PgToc.SectionData &&
        e.desc.contains("SEQUENCE SET")).foreach(emitDefn)
      if (selected.entries.exists(_.desc.contains("BLOBS")) && !noBlobs)
        System.err.println("[pg-restore] warning: large objects are not " +
          "representable in script output — use the direct restore path")
    }
    if (runPost)
      selected.entries.filter(_.section == PgToc.SectionPostData).foreach(emitDefn)
    if (singleTransaction) w.write("COMMIT;\n")
    w.flush()
    rendered
  }

  /** `--if-exists` rewrite: native pg_restore injects IF EXISTS into the
    * stored drop command textually (pg_backup_archiver.c RestoreArchive's
    * DROP rewriting) — `DROP <type words> <name>` gains IF EXISTS after
    * the type words, and `ALTER TABLE ... DROP CONSTRAINT name` after
    * DROP CONSTRAINT. Statements that already carry it pass through. */
  private[graft] def injectIfExists(drop: String): String =
    if (drop.contains("IF EXISTS")) drop
    else if (drop.contains(" DROP CONSTRAINT "))
      drop.replaceFirst(" DROP CONSTRAINT ", " DROP CONSTRAINT IF EXISTS ")
    else
      // type words = everything between DROP and the identifier; the
      // identifier starts at the last space-delimited token (possibly
      // schema-qualified/quoted, never containing an unquoted space)
      "^DROP ((?:[A-Z]+ )+)".r.replaceFirstIn(drop, "DROP $1IF EXISTS ")

  /** Derive maintenance-database args from target args for `--create`:
    * the dbname (conninfo `dbname=` keyword, a `postgres://` URI's path
    * component, or a bare database name after `-d`) swaps to
    * `postgres`, keeping host/port/user intact. Anything else fails
    * loudly rather than connect wrong. */
  private[graft] def maintenanceArgs(psqlArgs: Seq[String]): Seq[String] = {
    // URI conninfo: rewrite ONLY the path component to /postgres —
    // wholesale replacement would silently drop host/port and run
    // CREATE DATABASE against the wrong server
    def swapUriDb(uri: String): String = {
      val schemeEnd = uri.indexOf("://") + 3
      val qIdx = uri.indexOf('?', schemeEnd)
      val end = if (qIdx >= 0) qIdx else uri.length
      val slash = uri.indexOf('/', schemeEnd)
      val head = if (slash >= 0 && slash < end) uri.substring(0, slash)
                 else uri.substring(0, end)
      head + "/postgres" + (if (qIdx >= 0) uri.substring(qIdx) else "")
    }
    def isUri(v: String): Boolean =
      v.startsWith("postgres://") || v.startsWith("postgresql://")
    // a bare database name: no conninfo '=' pairs, no URI scheme, no
    // path separators — the only shape safe to replace wholesale
    def isBareDbName(v: String): Boolean =
      !v.contains("=") && !isUri(v) && !v.contains("/") && !v.contains(":")
    var swapped = false
    val out = psqlArgs.zipWithIndex.map { case (a, i) =>
      if (a.contains("dbname=")) {
        swapped = true; a.replaceAll("dbname=\\S+", "dbname=postgres")
      } else if (i > 0 && psqlArgs(i - 1) == "-d" && isUri(a)) {
        swapped = true; swapUriDb(a)
      } else if (i > 0 && psqlArgs(i - 1) == "-d" && isBareDbName(a)) {
        swapped = true; "postgres"
      } else a
    }
    require(swapped,
      "pg-restore: --create needs a dbname in the connection args to swap " +
        "for the maintenance connection")
    out
  }
}
