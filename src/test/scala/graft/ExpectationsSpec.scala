package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Expectations
import graft.pipeline.Expectations.Rule

/** Declarative data-quality rules: verdicts, fractions, config parsing. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  test("verdicts and milli fractions on a known frame") {
    val df = Seq(
      (1L, Some("a@x.com"), 5.0), (2L, Some("b@y.org"), -2.0),
      (3L, None, 50.0), (4L, Some("plain"), 5.0)).toDF("id", "s", "v")
    val out = Expectations.check(df, Seq(
      Rule("s", "not_null", Map("threshold_milli" -> "700")),   // 3/4 = 750 pass
      Rule("id", "unique", Map.empty),                          // pass
      Rule("v", "min", Map("bound" -> "0.0")),                  // -2 violates
      Rule("v", "max", Map("bound" -> "100.0")),                // pass
      Rule("s", "regex_frac",
        Map("pattern" -> "@", "threshold_milli" -> "600")),     // 2/3 = 666 pass
      Rule("s", "accepted", Map("values" -> "a@x.com,b@y.org")) // 'plain' violates
    )).orderBy("rule_id").collect()
      .map(r => (r.getInt(0), r.getBoolean(3), r.getLong(4)))
    assert(out(0) == ((0, true, 750L)))
    assert(out(1) == ((1, true, 1000L)))
    assert(out(2) == ((2, false, 750L)))  // 3 of 4 non-null values clean
    assert(out(3) == ((3, true, 1000L)))
    assert(out(4) == ((4, true, 666L)))
    assert(out(5) == ((5, false, 666L)))  // 2 of 3 accepted
  }

  test("empty input: every rule passes vacuously at observed 1000") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val out = Expectations.check(empty, Seq(
      Rule("s", "not_null", Map.empty), Rule("id", "unique", Map.empty),
      Rule("id", "min", Map("bound" -> "0")))).collect()
    assert(out.forall(r => r.getBoolean(3) && r.getLong(4) == 1000L))
  }

  test("parse: env interpolation and typed params") {
    val rules = Expectations.parse(
      """{"rules": [
           {"column": "c", "kind": "not_null", "threshold_milli": 900},
           {"column": "v", "kind": "min", "bound": "${LO}"}]}""",
      env = Map("LO" -> "-5.5"))
    assert(rules == Seq(
      Rule("c", "not_null", Map("threshold_milli" -> "900")),
      Rule("v", "min", Map("bound" -> "-5.5"))))
    intercept[IllegalArgumentException] {
      Expectations.parse("""{"rules": "nope"}""")
    }
  }
}
