package graft

import org.apache.spark.sql.functions._
import graft.ops.{Pipe, PipeOptions}

/** External-process pipe operator: round-trips, a genuinely transforming
  * command, NULL framing, json codec, and failure propagation. */
class PipeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(("1", "alpha"), ("2", "beta"), ("3", null))
    .toDF("id", "val")

  test("csv codec round-trips through cat, including NULLs") {
    val out = Pipe.through(df, Seq("/bin/cat"), "csv")
      .orderBy("id").as[(String, Option[String])].collect()
    assert(out.toSeq == Seq(("1", Some("alpha")), ("2", Some("beta")), ("3", None)))
  }

  test("json codec round-trips through cat") {
    val out = Pipe.through(df, Seq("/bin/cat"), "json")
      .orderBy("id").as[(String, Option[String])].collect()
    assert(out.toSeq == Seq(("1", Some("alpha")), ("2", Some("beta")), ("3", None)))
  }

  test("a transforming command actually transforms (tr a-z A-Z)") {
    val out = Pipe.through(df.filter(col("val").isNotNull),
      Seq("/usr/bin/tr", "a-z", "A-Z"), "csv")
      .orderBy("id").select("val").as[String].collect()
    assert(out.toSeq == Seq("ALPHA", "BETA"))
  }

  test("awk can rewrite a single column (reference Cmd column contract)") {
    val out = Pipe.through(df.filter(col("val").isNotNull),
      Seq("/usr/bin/awk", "-F\t", "{OFS=\"\t\"; $2=\"masked-\"$2; print}"), "csv")
      .orderBy("id").as[(String, String)].collect()
    assert(out.toSeq == Seq(("1", "masked-alpha"), ("2", "masked-beta")))
  }

  test("non-zero exit propagates as failure") {
    intercept[Exception] {
      Pipe.through(df, Seq("/bin/false"), "csv").collect()
    }
  }

  test("unknown codec rejected at plan time") {
    intercept[IllegalArgumentException](Pipe.through(df, Seq("/bin/cat"), "xml"))
  }

  test("skip_on_null=any bypasses the process for null rows, in order") {
    val out = Pipe.through(df, Seq("/usr/bin/tr", "a-z", "A-Z"), "csv",
      PipeOptions(skipOnNull = Some("any")))
      .orderBy("id").as[(String, Option[String])].collect()
    // row 3 has a null val => passed through untouched; others uppercased
    assert(out.toSeq == Seq(("1", Some("ALPHA")), ("2", Some("BETA")), ("3", None)))
  }

  test("timeout kills a hung process and reports the exit") {
    val e = intercept[Exception] {
      Pipe.through(df, Seq("/bin/sh", "-c", "sleep 30"), "csv",
        PipeOptions(timeoutSec = 2)).collect()
    }
    assert(e.getMessage.contains("timeout=2s") || e.getCause != null)
  }

  test("expected exit code accepted, mismatch rejected") {
    val ok = Pipe.through(df.limit(1), Seq("/bin/sh", "-c", "cat; exit 3"), "csv",
      PipeOptions(expectedExitCode = 3)).collect()
    assert(ok.length == 1)
    intercept[Exception] {
      Pipe.through(df.limit(1), Seq("/bin/sh", "-c", "cat; exit 3"), "csv").collect()
    }
  }

  test("bad skipOnNull mode rejected") {
    intercept[IllegalArgumentException](PipeOptions(skipOnNull = Some("some")))
  }
}
