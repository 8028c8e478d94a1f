package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime
import java.sql.DriverManager

/** Failure-path proof for the dump/restore lifecycle: the heartbeat
  * machinery can SEE a failed dump (stale in-progress file), so these
  * tests make dumps actually fail — a real SIGKILL of a dump subprocess
  * (no catch block runs, no finish(false)) — and prove the recovery
  * paths: status=failed surfaces, `--prune-failed` collects the corpse,
  * and a restore that died mid-flight re-runs to convergence with no
  * duplicate rows (the reference's abort-and-retry story,
  * `restorers/table_insert_format.go:139-145` + `dumpstatus/status.go`). */
class FaultInjectionSpec extends SparkSpec {
  import spark.implicits._

  test("SIGKILLed dump subprocess -> stale heartbeat -> failed -> prune-failed collects it") {
    val root = Files.createTempDirectory("graft_killroot").toString
    val out = s"$root/killed_dump"
    val cfgFile = Paths.get(root, "cfg.json")
    Files.writeString(cfgFile,
      """{"tables":[
        |  {"table":"customer","transforms":[
        |    {"column":"c_name","name":"Masking","params":{"type":"name"}}]},
        |  {"table":"orders","transforms":[
        |    {"column":"o_orderpriority","name":"Replace","params":{"value":"X"}}]},
        |  {"table":"lineitem","transforms":[
        |    {"column":"l_comment","name":"SetNull","params":{}}]}
        |]}""".stripMargin)
    // a second JVM running the REAL dump command: SIGKILL means no
    // shutdown hooks, no finish(false) — the process just stops, the
    // way an OOM-killed or machine-lost 100 TB dump stops
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    import scala.jdk.CollectionConverters._
    val inArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val opens = inArgs.zipWithIndex.flatMap {
      case (a, i) if a == "--add-opens" => Seq(a, inArgs(i + 1))
      case (a, _) if a.startsWith("--add-opens=") => Seq(a)
      case _ => Nil
    }
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"),
      "graft.Lifecycle", "dump", cfgFile.toString,
      "/root/testdata/sf0.01", out)
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    val jvm = pb.start()
    // drain output so the subprocess can't block on a full pipe
    val drain = new Thread(() => {
      try jvm.getInputStream.transferTo(java.io.OutputStream.nullOutputStream())
      catch { case _: java.io.IOException => () }
    })
    drain.setDaemon(true); drain.start()
    val hb = Paths.get(out, Lifecycle.HeartBeatFileName)
    try {
      val deadline = System.currentTimeMillis() + 180000
      while (!Files.exists(hb) && jvm.isAlive &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(Files.exists(hb),
        s"dump never started a heartbeat (alive=${jvm.isAlive})")
      assert(jvm.isAlive,
        "dump finished before the kill — use a bigger fixture")
      jvm.destroyForcibly() // SIGKILL, mid-flight
      jvm.waitFor()
      assert(Files.readString(hb).trim == "in-progress",
        "a killed dump must leave the last in-progress stamp, not done")
      // no manifest ever landed
      assert(!Files.exists(Paths.get(out, "manifest.json")))
      // freshly killed it still reads in-progress (the refresh window
      // hasn't elapsed); once the file is older than 2x the refresh
      // interval the status flips to failed. Simulate the elapsed time
      // by backdating the stamp past the window.
      assert(Lifecycle.dumpStatus(out) == "in progress")
      Files.setLastModifiedTime(hb,
        FileTime.fromMillis(System.currentTimeMillis() - 60000))
      assert(Lifecycle.dumpStatus(out) == "failed")
      assert(Lifecycle.listDumps(root).exists(l =>
        l.startsWith("killed_dump ") && l.endsWith("status=failed")),
        Lifecycle.listDumps(root).mkString("; "))
      // dry-run reports, does not delete
      val dry = Lifecycle.deleteDumps(root, pruneFailed = true, dryRun = true)
      assert(dry.exists(_.startsWith("would delete killed_dump")), dry)
      assert(Files.exists(Paths.get(out)))
      // prune-failed collects the corpse
      val del = Lifecycle.deleteDumps(root, pruneFailed = true)
      assert(del.exists(_.startsWith("deleted killed_dump")), del)
      assert(!Files.exists(Paths.get(out)))
    } finally {
      if (jvm.isAlive) { jvm.destroyForcibly(); jvm.waitFor() }
    }
  }

  test("partially-applied INSERT restore re-runs to convergence: no duplicates, no lost rows") {
    // dump a masked customer table
    val outDir = Files.createTempDirectory("graft_partial").toString
    Lifecycle.dump(spark,
      """{"tables":[{"table":"customer","transforms":[
        |  {"column":"c_name","name":"Masking","params":{"type":"name"}}]}]}""".stripMargin,
      "/root/testdata/sf0.001", outDir)
    val dumped = spark.read.parquet(s"$outDir/customer")
    val total = dumped.count()
    assert(total > 20, s"fixture too small to split ($total rows)")

    // the crash precondition: a restore that died mid-flight left a
    // COMMITTED PREFIX in the target (insert mode commits per batch /
    // per row, so a kill strands whatever already committed)
    val url = "jdbc:derby:memory:graft_partial;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR(64), " +
        "c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR(16), " +
        "CONSTRAINT CUST_RT_PK PRIMARY KEY (c_custkey))")
      st.close()
    } finally conn.close()
    val prefix = dumped.orderBy("c_custkey").limit((total / 2).toInt)
    graft.pipeline.RestoreSink.insertRows(prefix, url, "customer")
    val mid = spark.read.jdbc(url, "customer", new java.util.Properties()).count()
    assert(mid == total / 2, s"prefix not applied: $mid")

    // the operator's recovery move: re-run the SAME restore command with
    // the duplicate-key exclusion — already-applied rows skip (Derby
    // raises 23505; on PostgreSQL the same config emits ON CONFLICT DO
    // NOTHING so duplicates never error at all), missing rows land
    val excl = graft.pipeline.ConfigLoader.exclusionsFromJson(
      """{"insert_error_exclusions":{"global":{"error_codes":["23505"]}}}""")
    Lifecycle.restore(spark, s"$outDir/manifest.json", url,
      insertMode = true, exclusions = Some(excl))

    // convergence: exactly the dump's rows, nothing duplicated, nothing
    // lost, values fingerprint-identical
    val back = spark.read.jdbc(url, "customer", new java.util.Properties())
    assert(back.count() == total, s"row count diverged: ${back.count()} vs $total")
    assert(back.select("c_custkey").distinct().count() == total, "duplicate keys")
    val cols = dumped.columns.sorted.toSeq
    def fp(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal = {
      import org.apache.spark.sql.functions._
      // decimal sum: a long sum of xxhash64 values overflows ANSI mode
      df.select(xxhash64(cols.map(c => col(c).cast("string")): _*)
          .cast("decimal(38,0)").as("h"))
        .agg(sum("h")).head().getDecimal(0)
    }
    assert(fp(back) == fp(dumped), "content fingerprint diverged after re-run")

    // a SECOND re-run is also a no-op (idempotence, not one-shot luck)
    Lifecycle.restore(spark, s"$outDir/manifest.json", url,
      insertMode = true, exclusions = Some(excl))
    assert(back.count() == total)
  }
}
