package graft

import org.apache.spark.sql.functions._
import graft.ops.Pipe

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
}
