package graft

import org.apache.spark.sql.functions._
import graft.generators.Gen

/** Limiter math properties — mirrors the reference's engine unit tests
  * (`internal/generators/transformers` per-limiter Go tests): bounds, determinism
  * across reruns AND across partition counts, misconfiguration rejection.
  * Property-style cases use a seeded generator loop (no external
  * scalatestplus bridge needed in the offline build). */
class GenSpec extends SparkSpec {
  import spark.implicits._

  private def inputs(n: Int = 500) = (1 to n).map(_.toLong).toDF("x")

  test("u60 is non-negative, below 2^60, deterministic across reruns") {
    val vals = inputs().select(Gen.u60(col("x"), "t").as("h")).as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < Gen.U60Max))
    val again = inputs().select(Gen.u60(col("x"), "t").as("h")).as[Long].collect()
    assert(vals.sameElements(again))
  }

  test("u60 is partition-count invariant") {
    val df1 = inputs().repartition(1).select(col("x"), Gen.u60(col("x"), "t").as("h"))
    val df8 = inputs().repartition(8).select(col("x"), Gen.u60(col("x"), "t").as("h"))
    assert(df1.orderBy("x").as[(Long, Long)].collect()
      .sameElements(df8.orderBy("x").as[(Long, Long)].collect()))
  }

  test("native U60Hash expression is value-identical to the built-in composition") {
    val strs = (1 to 300).map(i => s"value-$i-${"x" * (i % 17)}").toDF("x")
    val pairs = strs.select(Gen.u60(col("x"), "eq").as("native"),
      Gen.u60Composed(col("x"), "eq").as("composed")).as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a == b })
    // NULL propagates identically
    val n = Seq[Option[String]](None).toDF("x")
      .select(Gen.u60(col("x"), "eq").as("v")).as[Option[Long]].head()
    assert(n.isEmpty)
  }

  test("salt is injectable everywhere (no fixed-salt re-derivation)") {
    val df = inputs(50)
    def vals(c: org.apache.spark.sql.Column) = df.select(c.as("v")).as[String].collect().toSeq
    assert(df.select(Gen.u60(col("x"), "t", "saltA")).as[Long].collect().toSeq !=
      df.select(Gen.u60(col("x"), "t", "saltB")).as[Long].collect().toSeq)
    assert(vals(Gen.hexString(col("x"), "t", lit(8), "saltA")) !=
      vals(Gen.hexString(col("x"), "t", lit(8), "saltB")))
    assert(vals(Gen.uuidFrom(col("x"), "t", "saltA")) != vals(Gen.uuidFrom(col("x"), "t", "saltB")))
    assert(vals(Gen.macFrom(col("x"), "t", Seq("02"), "saltA")) !=
      vals(Gen.macFrom(col("x"), "t", Seq("02"), "saltB")))
    assert(vals(Gen.ipv6InCidr(col("x"), "t", "2001:db8::/32", "saltA")) !=
      vals(Gen.ipv6InCidr(col("x"), "t", "2001:db8::/32", "saltB")))
  }

  test("u60 streams with different tweaks are independent") {
    val pairs = inputs().select(Gen.u60(col("x"), "a"), Gen.u60(col("x"), "b"))
      .as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a != b })
  }

  test("longBetween stays inclusive-in-range for random bounds") {
    val rnd = new scala.util.Random(1234)
    (1 to 20).foreach { _ =>
      val min = rnd.between(-1000000L, 1000000L)
      val max = min + rnd.between(0L, 5000000L)
      val vals = inputs(100).select(Gen.longBetween(Gen.u60(col("x"), "lb"), min, max).as("v"))
        .as[Long].collect()
      assert(vals.forall(v => v >= min && v <= max), s"out of [$min,$max]")
    }
  }

  test("longBetween covers the full range on a small domain") {
    val vals = inputs(2000).select(Gen.longBetween(Gen.u60(col("x"), "cov"), 0, 9).as("v"))
      .as[Long].collect()
    assert(vals.toSet == (0L to 9L).toSet)
  }

  test("longBetween rejects min > max at plan-build time") {
    intercept[IllegalArgumentException](Gen.longBetween(lit(1L), 10L, 0L))
  }

  test("doubleBetween bounds and resolution") {
    val vals = inputs().select(Gen.doubleBetween(Gen.u60(col("x"), "db"), -5.0, 5.0, 2).as("v"))
      .as[Double].collect()
    assert(vals.forall(v => v >= -5.0 && v <= 5.0))
    assert(vals.forall(v => (math.round(v * 100) / 100.0 - v).abs < 1e-9))
  }

  test("noiseRatio symmetric range") {
    val vals = inputs().select(Gen.noiseRatio(Gen.u60(col("x"), "nr"), 0.3).as("v"))
      .as[Double].collect()
    assert(vals.forall(v => v >= -0.3 && v <= 0.3))
    intercept[IllegalArgumentException](Gen.noiseRatio(lit(1L), -0.1))
  }

  test("stringBetween length bounds and charset membership") {
    val vals = inputs().select(Gen.stringBetween(col("x"), "sb", "abc", 2, 6).as("v"))
      .as[String].collect()
    assert(vals.forall(v => v.length >= 2 && v.length <= 6))
    assert(vals.forall(_.forall("abc".contains(_))))
  }

  test("ipv4InCidr stays inside subnet, avoids network/broadcast") {
    val vals = inputs(2000).select(Gen.ipv4InCidr(Gen.u60(col("x"), "ip"), "192.168.0.0/24").as("v"))
      .as[String].collect()
    assert(vals.forall(_.startsWith("192.168.0.")))
    val hosts = vals.map(_.split("\\.")(3).toInt)
    assert(hosts.forall(h => h >= 1 && h <= 254))
  }

  test("ipv6InCidr keeps the network prefix, hex groups, no empty groups") {
    val vals = inputs(200).select(Gen.ipv6InCidr(col("x"), "ip6", "2001:db8:abcd::/48").as("v"))
      .as[String].collect()
    assert(vals.forall(_.startsWith("2001:db8:abcd:")))
    assert(vals.forall(_.split(":").length == 8))
    assert(vals.forall(_.split(":").forall(g => g.nonEmpty && g.matches("[0-9a-f]{1,4}"))))
    intercept[IllegalArgumentException](Gen.ipv6InCidr(col("x"), "t", "2001:db8::/47"))
  }

  test("macFrom keeps vendor prefix, hex body") {
    val vals = inputs().select(Gen.macFrom(col("x"), "mac", Seq("02", "ab")).as("v"))
      .as[String].collect()
    assert(vals.forall(_.matches("02:ab:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}:[0-9a-f]{2}")))
  }

  test("uuidFrom shape is v4-like") {
    val vals = inputs(100).select(Gen.uuidFrom(col("x"), "u").as("v")).as[String].collect()
    assert(vals.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}")))
  }

  test("longBetween is roughly uniform across buckets") {
    val n = 5000
    val buckets = 10
    val counts = inputs(n).select((Gen.longBetween(Gen.u60(col("x"), "unif"), 0, buckets - 1)).as("v"))
      .groupBy("v").count().as[(Long, Long)].collect().toMap
    val expected = n.toDouble / buckets
    assert(counts.size == buckets)
    counts.foreach { case (b, c) =>
      assert(math.abs(c - expected) < expected * 0.25, s"bucket $b count $c vs expected $expected")
    }
  }

  test("u60_hash and minhash60 are callable from SQL after registration") {
    org.apache.spark.sql.GraftBridge.registerFunctions(spark)
    inputs(10).createOrReplaceTempView("u60_in")
    val viaSql = spark.sql(
      s"SELECT u60_hash(x, '${Gen.Salt}/t|') AS h FROM u60_in ORDER BY x").as[Long].collect()
    val viaApi = inputs(10).select(Gen.u60(col("x"), "t").as("h")).orderBy("x").as[Long].collect()
    assert(viaSql.sameElements(viaApi))
    val mh = spark.sql(
      s"SELECT minhash60(array('a b c','b c d'), '${Gen.Salt}', 2) AS m").collect().head
    assert(mh.getSeq[Long](0).size == 4)
    val sha3 = spark.sql("SELECT digest_hex('abc', 'SHA3-256') AS d").collect().head.getString(0)
    assert(sha3 == "3a985da74fe225b2045c172d6bd390bd855f086e3e9d525b46bfe24511431532")
    val je = spark.sql(
      """SELECT json_edit('{"k":1}', 'set:a.b=2;delete:k') AS j""").collect().head.getString(0)
    assert(je == """{"a":{"b":2}}""")
    // arbitrary-bounds numeric: 123456 mod 1000 = 456; -50 + 456 = 406 at scale 2
    val bn = spark.sql(
      "SELECT big_uniform_mod('123456', '1000', '-50', 2) AS v").collect().head.getString(0)
    assert(bn == "4.06")
    // round-8 kernels: simhash_bits / shingle_md5 / cosine_pair
    val sh = spark.sql(
      s"SELECT simhash_bits(split('a b c', ' '), '${Gen.Salt}/sim|', 60) AS s").collect().head
    val shApi = spark.sql("SELECT 'a b c' AS t")
      .select(graft.llm.TextOps.simhash60(col("t"))).collect().head
    assert(sh.getLong(0) == shApi.getLong(0))
    val sm = spark.sql(
      "SELECT shingle_md5(split('a b c d', ' '), 2) AS s").collect().head.getSeq[String](0)
    assert(sm.size == 3 && sm.head == "0cc9cd4dd26c5137b675a0d819cb9ab0") // md5('a b')
    val cp = spark.sql(
      "SELECT cosine_pair(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect().head
    assert(math.abs(cp.getDouble(0) - 1.0) < 1e-12)
  }

  test("decimalBetween bounds at scale") {
    val vals = inputs().select(Gen.decimalBetween(Gen.u60(col("x"), "dec"),
      BigDecimal("-10.5"), BigDecimal("10.5"), 4).cast("string").as("v")).as[String].collect()
    assert(vals.forall { v =>
      val d = BigDecimal(v); d >= BigDecimal("-10.5") && d <= BigDecimal("10.5")
    })
  }
}
