package graft

import graft.sources.CopyText

import java.nio.file.Files

/** COPY text codec: escape-table parity with pgcopy (named escapes, octal,
  * hex), null handling, and a distributed write/read round-trip including
  * gzip. */
class CopyTextSpec extends SparkSpec {
  import spark.implicits._

  test("field escape/unescape round-trips control characters") {
    val nasty = "a\tb\nc\rd\\e\ff\bg" + 0x0B.toChar + "h"
    assert(CopyText.decodeField(CopyText.encodeField(nasty)) == nasty)
    assert(CopyText.encodeField("a\tb") == "a\\tb")
    assert(CopyText.encodeField(null) == "\\N")
  }

  test("decoder accepts octal and hex escapes from the reference encoder") {
    assert(CopyText.decodeField("\\101\\102") == "AB")   // octal
    assert(CopyText.decodeField("\\x41\\x42") == "AB")   // hex
    assert(CopyText.decodeField("\\x4a") == "J")
    assert(CopyText.decodeField("\\7") == 0x7.toChar.toString) // short octal
  }

  test("write/read round-trip with tabs, newlines, nulls, gzip") {
    val df = Seq(
      (1L, Some("plain"), Some("with\ttab")),
      (2L, None, Some("with\nnewline")),
      (3L, Some("back\\slash"), None))
      .toDF("id", "a", "b")
      .selectExpr("cast(id as string) id", "a", "b")
    val dir = Files.createTempDirectory("copytext").toString
    CopyText.write(df, s"$dir/t", compression = Some("gzip"))
    val back = CopyText.read(spark, s"$dir/t", Seq("id", "a", "b"))
      .as[(String, Option[String], Option[String])].collect().sortBy(_._1)
    assert(back.toSeq == Seq(
      ("1", Some("plain"), Some("with\ttab")),
      ("2", None, Some("with\nnewline")),
      ("3", Some("back\\slash"), None)))
  }
}
