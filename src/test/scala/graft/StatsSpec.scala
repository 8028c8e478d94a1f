package graft

import org.apache.spark.sql.functions._

import graft.ops.Stats

/** Comparison statistics: exact integer moments, reference-value parity,
  * partition invariance. */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("welchT matches a driver-side reference computation") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 2.5), ("b", 3.5), ("b", 4.5)).toDF("g", "v")
    val row = Stats.welchT(df, "g", "v", "a", "b").head()
    def c(x: Double) = math.floor(x * 100 + 0.5)
    val xs = Seq(1.0, 2.0, 3.0, 4.0).map(c)
    val ys = Seq(2.5, 3.5, 4.5).map(c)
    def stats(v: Seq[Double]) = {
      val n = v.size; val m = v.sum / n
      (n, m, v.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = stats(xs); val (nb, mb, vb) = stats(ys)
    val t = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(row.getLong(4) == math.floor(t * 1e9 + 0.5).toLong)
    assert(row.getLong(0) == 4L && row.getLong(1) == 3L)
  }

  test("pearson: r=+1e9 nano on a perfect line, partition-invariant on real data") {
    val line = (1 to 50).map(i => ("g", i.toDouble, 2.0 * i + 3.0)).toDF("g", "x", "y")
    val r = Stats.pearsonByGroup(line, "g", "x", "y").head().getLong(2)
    assert(r == 1000000000L, s"perfect line r_nano = $r")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = Stats.pearsonByGroup(li.repartition(1), "l_returnflag",
      "l_extendedprice", "l_quantity").orderBy("grp").collect().toSeq
    val b = Stats.pearsonByGroup(li.repartition(7), "l_returnflag",
      "l_extendedprice", "l_quantity").orderBy("grp").collect().toSeq
    assert(a == b)
    a.foreach(r => assert(math.abs(r.getLong(2)) <= 1000000000L))
  }

  test("histogram: counts partition the rows; negative values floor correctly") {
    val df = Seq(("g", -1.2), ("g", -0.4), ("g", 0.0), ("g", 0.7), ("g", 1.3))
      .toDF("g", "v")
    val out = Stats.histogram(df, "g", "v", width = 1.0)
      .orderBy("bucket").collect().map(r => r.getLong(1) -> r.getLong(2)).toSeq
    // centi floor-division: -120 -> bucket -2, -40 -> -1, 0 and 70 -> 0, 130 -> 1
    assert(out == Seq(-2L -> 1L, -1L -> 1L, 0L -> 2L, 1L -> 1L))
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val h = Stats.histogram(orders, "o_orderpriority", "o_totalprice", 50000.0)
    assert(h.agg(sum("n")).head().getLong(0) == orders.count())
  }
}
