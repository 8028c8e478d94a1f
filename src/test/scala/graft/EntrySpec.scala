package graft

/** The driver's smoke contract: entry() returns rows, every registered
  * query has a runnable plan, and oracle SQL exists for each key it
  * claims. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("c_name"))
  }

  test("every query builds a plan at sf0.001 and oracle keys are a subset") {
    val qs = SparkEntry.queries
    assert(qs.size >= 80)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
    }
    val orphan = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(orphan.isEmpty, s"oracle SQL without query: $orphan")
  }

  test("oracle SQL strings are single-line friendly (no raw control chars)") {
    SparkEntry.oracleSql.values.foreach { sql =>
      assert(!sql.exists(c => c == '\n' || c == '\r' || c == '\t'), sql.take(80))
    }
  }
}
