package graft

import org.apache.spark.sql.functions._

import graft.ops.RecordLinkage

/** Blocked fuzzy join: recall against a perturbed twin, bounded blocks,
  * no cartesian anywhere. */
class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  test("fuzzyJoin recovers perturbed twins within blocking recall, no cartesian") {
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select("c_custkey", "c_name")
    val perturbed = cust.select(col("c_custkey").as("p_key"),
      translate(col("c_name"), "1", "I").as("p_name"))
    val df = RecordLinkage.fuzzyJoin(
      cust, "c_custkey", "c_name", RecordLinkage.suffixBlock(col("c_name")),
      perturbed, "p_key", "p_name", RecordLinkage.suffixBlock(col("p_name")),
      maxDist = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    val matches = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val names = cust.as[(Long, String)].collect().toMap
    // every name with NO '1' in its last-3 block and <= 3 ones total must
    // self-match at dist = number of substituted ones
    names.foreach { case (k, n) =>
      val ones = n.count(_ == '1')
      if (!n.takeRight(3).contains('1') && ones <= 3) {
        assert(matches.contains((k, k, ones)), s"$k '$n' twin missed")
      }
    }
    // verify distances against an independent in-JVM Levenshtein
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val pNames = names.map { case (k, n) => k -> n.replace('1', 'I') }
    matches.take(200).foreach { case (ia, ib, dist) =>
      assert(lev(names(ia), pNames(ib)) == dist, s"dist mismatch for ($ia,$ib)")
    }
  }
}
