package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.generators.{Gen, OracleGen}
import graft.transformers._
import graft.pipeline._
import graft.subset._
import graft.llm._
import graft.ops.Pipe

/** Driver contract — one registered query (+ DuckDB oracle SQL where
  * expressible) per implemented operator from SURVEY.md §2 and the
  * LLM-pipeline brief. Column names are aliased identically on both sides
  * (the driver sorts columns by name before hashing values); every query
  * carries a deterministic ORDER BY so row order can never be the source
  * of a mismatch.
  */
object SparkEntry {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Fixed merge table for q_bpe_tokencount — rule order matters (later
    * rules consume earlier merges' outputs: th+e, an+d). */
  val bpeFixedMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "t" -> "h", "th" -> "e", "o" -> "n",
    "a" -> "n", "an" -> "d", "in" -> "g")

  /** CMS probe set: frequent corpus tokens plus one guaranteed-absent
    * probe (exercises the zero-estimate path). */
  val cmsProbeTokens: Seq[String] =
    Seq("join", "hash", "scan", "vector", "zz_absent_probe")

  /** Funnel step sequence over the events table (strict-after order). */
  val funnelStepTypes: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Expectation rules for q_expectations (rule 4 deliberately fails). */
  val expectationRules: Seq[graft.pipeline.Expectations.Rule] = {
    import graft.pipeline.Expectations.Rule
    Seq(
      Rule("c_name", "not_null", Map("threshold_milli" -> "1000")),
      Rule("c_custkey", "unique", Map.empty),
      Rule("c_acctbal", "min", Map("bound" -> "-1000.0")),
      Rule("c_acctbal", "max", Map("bound" -> "10000.0")),
      Rule("c_acctbal", "min", Map("bound" -> "0.0")), // fails: negatives exist
      Rule("c_name", "regex_frac",
        Map("pattern" -> "^Customer#", "threshold_milli" -> "1000")),
      Rule("c_mktsegment", "accepted",
        Map("values" -> "AUTOMOBILE,BUILDING,FURNITURE,HOUSEHOLD,MACHINERY")))
  }

  private case class Q(fn: (SparkSession, String) => DataFrame, sql: Option[String])

  /** Mechanical scalar-transformer query: SELECT id, t(input) AS out FROM
    * table ORDER BY id — both renderings from the same transformer. */
  private def scalar(table: String, id: String, input: Column, inputSql: String,
                     t: ScalarTransformer, out: String = "masked",
                     castOut: Option[String] = None): Q = Q(
    (s, dir) => {
      val v = t.applied(input)
      val vc = castOut.fold(v)(v.cast)
      rd(s, dir, table).select(col(id), vc.as(out)).orderBy(id)
    },
    Some {
      val v = t.appliedSql(inputSql).get
      val ddbType = castOut.map { case "string" => "VARCHAR"; case c => c.toUpperCase }
      val vc = ddbType.fold(v)(c => s"(${v})::${c}")
      s"SELECT ${id}, ${vc} AS ${out} FROM ${table} ORDER BY ${id}"
    })

  private val CK = col("c_custkey")

  /** Synthetic "next snapshot" of the documents table, shared by the CDC
    * queries (q_snapshot_diff, q_incremental_minhash): drop %17 ids,
    * append ' v2' to %13 texts, add synthetic %23 ids — identical
    * derivation in both engines. */
  private def snapshotB(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 23 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(lit("new "), col("source")).as("text")))

  private val SnapshotBSql: String =
    """(SELECT doc_id,
          CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % 17 <> 0
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id, 'new ' || source AS text
        FROM documents WHERE doc_id % 23 = 0)"""

  // 50-digit bounds for the unbounded-numeric queries: min = first 50
  // digits of pi (units at scale 4), inclusive width exactly 73 * 10^48
  // units (the m*10^k shape Gen.bigGeom requires). Values span ~[3.1e45,
  // 1.05e46] — far beyond DecimalType(38).
  private val BigPi50 = BigInt("31415926535897932384626433832795028841971693993751")
  private val BigMin = BigDecimal(BigPi50, 4)
  private val BigMax = BigDecimal(BigPi50 + BigInt(73) * BigInt(10).pow(48) - 1, 4)
  // clamp bounds inside the noised envelope so both sides of the clamp bite
  private val BigNoiseLo = BigDecimal(BigInt(33) * BigInt(10).pow(48), 4)  // 3.3e45
  private val BigNoiseHi = BigDecimal(BigInt(104) * BigInt(10).pow(48), 4) // 1.04e46
  // arbitrary-bounds query: negative min (first 50 digits of e), max = pi
  // digits, scale 3 — the width is odd, so it has NO m*10^k factorization
  private val BigAnyMin = BigDecimal(
    BigInt("-27182818284590452353602874713526624977572470936999"), 3)
  private val BigAnyMax = BigDecimal(BigPi50, 3)

  /** Independent witness for q_random_numeric_any's pinned oracle: the
    * digit-stream + mod spec recomputed with plain MessageDigest + BigInt
    * (no Catalyst involvement). */
  private def bigAnyWitness(key: String): String = {
    val scale = 3
    val minU = BigAnyMin.underlying.unscaledValue()
    val width = BigInt(BigAnyMax.underlying.unscaledValue())
      .-(BigInt(minU)).+(1)
    val md = java.security.MessageDigest.getInstance("MD5")
    def u60(t: String): Long = {
      val hex = md.digest((Gen.Salt + "/" + t + "|" + key).getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val n = width.toString.length + 15
    val digits = (0 until (n + 14) / 15)
      .map(j => f"${u60("numany" + "n" + j) % 1000000000000000L}%015d").mkString.take(n)
    val units = BigInt(minU) + BigInt(digits) % width
    val neg = units < 0
    val s = units.abs.toString
    val padded = if (s.length <= scale) ("0" * (scale - s.length + 1)) + s else s
    val body = padded.dropRight(scale) + "." + padded.takeRight(scale)
    if (neg) "-" + body else body
  }

  private def defs: Map[String, Q] = Map(

    // ----- §2.5 aggregation sanity + flagship (TPC-H q1 shape) -----
    // NOT widened: a round-robin exchange would push all ~6M rows through
    // the single scan task before the 32-way partial agg could start —
    // measured no faster than letting that task do the (map-side-combining)
    // partial agg itself. The 32-file staged pass (0.5s vs 1.4s) shows the
    // gap is purely the fixture's single-file scan, which a real
    // multi-split input parallelizes naturally.
    "q_agg_pricing" -> Q(
      (s, dir) => rd(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
              sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
              sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base,
              count(*) AS n_rows
              FROM lineitem GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // ----- §2.6 generator transformers (hash engine, oracle-checked) -----
    "q_random_int" -> scalar("customer", "c_custkey", CK, "c_custkey", RandomInt(0, 999999)),
    "q_random_float" -> scalar("customer", "c_custkey", CK, "c_custkey", RandomFloat(0, 1000, 4)),
    "q_random_numeric" -> scalar("customer", "c_custkey", CK, "c_custkey",
      RandomNumeric(BigDecimal(0), BigDecimal(100000), 4), castOut = Some("string")),
    // ----- unbounded numeric (>38 digits, TEXT-backed VARCHAR math) -----
    // 50-digit bounds: uniform over [BigMin, BigMax] on the 1e-4 grid —
    // well past DecimalType(38); the oracle recomputes the limb arithmetic
    // in DuckDB (layered subqueries, BIGINT limbs), no pinned values.
    // Queries use the STAGED renderings (each limb level is a named
    // column): the fused single-expression form overruns the 64KB JVM
    // codegen method limit and silently drops to interpreted execution.
    "q_random_numeric_big" -> Q(
      (s, dir) => Gen.bigDecimalBetweenStaged(rd(s, dir, "customer"), CK, "numbig",
          BigMin, BigMax, 4, "masked")
        .select(CK, col("masked")).orderBy("c_custkey"),
      Some(OracleGen.bigDecimalBetweenSelect("customer", "c_custkey", "c_custkey",
        BigMin, BigMax, 4, "numbig", "masked"))),
    // size-mode limiter (±"9"x45 at scale 3 — ref GetMinAndMaxNumericValueBySetting)
    "q_random_numeric_bigsize" -> Q(
      (s, dir) => Gen.bigDecimalSignedStaged(rd(s, dir, "customer"), CK, "numbigsz",
          45, 3, "masked")
        .select(CK, col("masked")).orderBy("c_custkey"),
      Some(OracleGen.bigDecimalSignedSelect("customer", "c_custkey", "c_custkey",
        45, 3, "numbigsz", "masked"))),
    // ARBITRARY bounds: negative 50-digit min, odd width (not m*10^k —
    // the constructive path rejects these), via the native BigUniformMod
    // expression. DuckDB has no bignum, so the oracle is a PINNED witness
    // table: values recomputed at registry-build time with plain JDK
    // MessageDigest + BigInteger — independent of the digit-stream
    // Catalyst plumbing and of the expression under test (the sha3
    // pattern). Keys 1..100 exist at every sf.
    "q_random_numeric_any" -> Q(
      (s, dir) => rd(s, dir, "customer")
        .filter(col("c_custkey").between(1, 100))
        .select(CK, RandomNumericAny(BigAnyMin, BigAnyMax, 3).applied(CK).as("masked"))
        .orderBy("c_custkey"),
      Some {
        val rows = (1 to 100).map(k => s"($k, '${bigAnyWitness(k.toString)}')")
        "SELECT CAST(k AS BIGINT) AS c_custkey, v AS masked FROM (VALUES " +
          rows.mkString(", ") + ") AS t(k, v) ORDER BY c_custkey"
      }),
    // multiplicative noise + clamp over a 50-digit value generated in the
    // same query (both engines chain the identical construction)
    "q_noise_numeric_big" -> Q(
      (s, dir) => Gen.bigNoiseStaged(
          Gen.bigDecimalBetweenStaged(rd(s, dir, "customer"), CK, "numbig",
            BigMin, BigMax, 4, "__g"),
          col("__g"), "noisenb", 0.07, 4, "masked", maxIntDigits = 55,
          minV = Some(BigNoiseLo), maxV = Some(BigNoiseHi))
        .select(CK, col("masked")).orderBy("c_custkey"),
      Some {
        val (genLevels, genFmt) = OracleGen.bigBetweenLevels("c_custkey", BigMin, BigMax, 4, "numbig")
        val (nzLevels, nzFin) = OracleGen.bigNoiseLevels("__gval", 0.07, 4, 55,
          Some(BigNoiseLo), Some(BigNoiseHi), "noisenb")
        OracleGen.layeredSelect("customer", "c_custkey",
          genLevels ++ Vector(Seq("__gval" -> genFmt)) ++ nzLevels, nzFin, "masked")
      }),
    "q_random_bool" -> scalar("customer", "c_custkey", CK, "c_custkey", RandomBool()),
    "q_random_unix_ts" -> scalar("customer", "c_custkey", CK, "c_custkey",
      RandomUnixTimestamp(0, 1893456000, "ms")),
    "q_random_string" -> scalar("customer", "c_custkey", CK, "c_custkey", RandomString(4, 12)),
    "q_random_uuid" -> scalar("customer", "c_custkey", CK, "c_custkey", RandomUuid()),
    "q_random_choice" -> scalar("customer", "c_custkey", CK, "c_custkey",
      RandomChoice(Seq("alpha", "beta", "gamma", "delta"))),
    "q_random_ip" -> scalar("customer", "c_custkey", CK, "c_custkey", RandomIp("10.42.0.0/16")),
    "q_random_ipv6" -> scalar("customer", "c_custkey", CK, "c_custkey",
      RandomIpV6("2001:db8:abcd::/48")),
    "q_random_mac" -> scalar("customer", "c_custkey", CK, "c_custkey", RandomMac(Seq("02", "42"))),
    "q_random_email" -> scalar("customer", "c_custkey", col("c_name"), "c_name",
      RandomEmail(keepOriginalDomain = false)),

    // RandomDate: epoch-seconds projection (tz-neutral compare), truncated
    "q_random_date" -> Q(
      (s, dir) => {
        val t = RandomDate(0, 1893456000, Some("month"))
        rd(s, dir, "customer").select(CK, t.epochColumn(CK).as("masked")).orderBy("c_custkey")
      },
      Some {
        val t = RandomDate(0, 1893456000, Some("month"))
        s"SELECT c_custkey, ${t.oracle("c_custkey").get} AS masked FROM customer ORDER BY c_custkey"
      }),

    // ----- noise family (input canonicalized to decimal for stable hashing) -----
    "q_noise_int" -> scalar("customer", "c_custkey", CK, "c_custkey",
      NoiseInt(0.2, Some(0L), Some(2000000L))),
    "q_noise_float" -> scalar("customer", "c_custkey",
      col("c_acctbal").cast("decimal(12,2)"), "(c_acctbal)::DECIMAL(12,2)",
      NoiseFloat(0.1, 2, Some(-1000.0), Some(20000.0))),
    "q_noise_numeric" -> scalar("customer", "c_custkey",
      col("c_acctbal").cast("decimal(12,2)"), "(c_acctbal)::DECIMAL(12,2)",
      NoiseNumeric(0.1, 2), castOut = Some("string")),
    "q_noise_date" -> Q(
      (s, dir) => {
        val t = NoiseDate(30, Some("day"))
        rd(s, dir, "orders")
          .select(col("o_orderkey"),
            t.applied(col("o_orderdate").cast("timestamp").cast("long")).as("masked"))
          .orderBy("o_orderkey")
      },
      Some {
        val t = NoiseDate(30, Some("day"))
        s"SELECT o_orderkey, ${t.appliedSql("epoch(o_orderdate)::BIGINT").get} AS masked " +
          "FROM orders ORDER BY o_orderkey"
      }),

    // ----- redaction / remap family -----
    "q_hash_sha256" -> scalar("customer", "c_custkey", col("c_name"), "c_name", HashText("sha256")),
    "q_hash_md5_trunc" -> scalar("customer", "c_custkey", col("c_name"), "c_name",
      HashText("md5", maxLength = 16)),
    // DuckDB 1.0 has no sha3, so the oracle is a PINNED digest table:
    // the Spark side runs the native DigestHex expression distributed over
    // corpus keys (deterministic 'cust#<key>' inputs, keys 1..100 exist at
    // every sf), and the oracle VALUES are computed at registry-build time
    // by JDK MessageDigest — same JVM, same env salt, independent of the
    // Catalyst codegen/null/hex plumbing under test. NIST vectors in
    // TransformerSpec stay as the algorithm-level witness.
    // Key 1's input is forced NULL so the expression's null path (NULL in
    // -> NULL out, keep_null=false notwithstanding: concat propagates the
    // NULL before the digest) is oracle-checked, not just unit-checked
    // (round-6 advice #7).
    "q_hash_sha3_256" -> Q(
      (s, dir) => rd(s, dir, "customer")
        .filter(col("c_custkey").between(1, 100))
        .select(CK, HashText("sha3-256")
          .applied(when(col("c_custkey") === 1, lit(null).cast("string"))
            .otherwise(concat(lit("cust#"), col("c_custkey").cast("string")))).as("masked"))
        .orderBy("c_custkey"),
      Some {
        val md = java.security.MessageDigest.getInstance("SHA3-256")
        val rows = (1 to 100).map { k =>
          if (k == 1) s"($k, CAST(NULL AS VARCHAR))"
          else {
            val hex = md.digest((graft.generators.Gen.Salt + s"cust#$k").getBytes("UTF-8"))
              .map(b => f"${b & 0xff}%02x").mkString
            s"($k, '$hex')"
          }
        }
        "SELECT CAST(k AS BIGINT) AS c_custkey, h AS masked FROM (VALUES " +
          rows.mkString(", ") + ") AS t(k, h) ORDER BY c_custkey"
      }),
    "q_masking_styles" -> Q(
      (s, dir) => {
        val styles = Seq("default", "name", "addr", "email", "mobile", "tel",
          "id", "credit_card", "url", "postcode")
        rd(s, dir, "customer").select(
          CK +: styles.map(st => Masking(st).applied(col("c_name")).as(s"m_$st")): _*)
          .orderBy("c_custkey")
      },
      Some {
        val styles = Seq("default", "name", "addr", "email", "mobile", "tel",
          "id", "credit_card", "url", "postcode")
        val cols = styles.map(st => s"${Masking(st).appliedSql("c_name").get} AS m_$st")
        s"SELECT c_custkey, ${cols.mkString(", ")} FROM customer ORDER BY c_custkey"
      }),
    "q_regexp_replace" -> scalar("customer", "c_custkey", col("c_name"), "c_name",
      RegexpReplaceT("Customer#0*", "user-")),
    "q_replace" -> scalar("customer", "c_custkey", col("c_mktsegment"), "c_mktsegment",
      Replace("REDACTED")),
    "q_set_null" -> scalar("customer", "c_custkey", col("c_mktsegment"), "c_mktsegment", SetNull()),
    // Dict incl. the \N NULL sentinel: MACHINERY is nulled on input (then
    // matched by the \N key), FURNITURE maps TO NULL, the rest default
    "q_dict" -> scalar("customer", "c_custkey",
      expr("nullif(c_mktsegment, 'MACHINERY')"), "nullif(c_mktsegment, 'MACHINERY')",
      Dict(Map("AUTOMOBILE" -> "CARS", "BUILDING" -> "CONSTRUCTION",
          "FURNITURE" -> "\\N", "\\N" -> "WAS_NULL"),
        default = Some("OTHER"))),
    "q_template" -> Q(
      (s, dir) => rd(s, dir, "customer")
        .select(CK, expr("concat(c_mktsegment, '-', cast(c_nationkey as string))").as("derived"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, (c_mktsegment || '-' || c_nationkey::VARCHAR) AS derived " +
        "FROM customer ORDER BY c_custkey")),
    // TemplateRecord: whole-record template — several columns rewritten by
    // expressions over the row (ref `template_record.go:28-100`)
    "q_template_record" -> Q(
      (s, dir) => Planner.plan(rd(s, dir, "customer"), TableConfig("customer",
        transforms = Seq(
          ColumnTransform("c_name", TemplateExpr("concat('User-', cast(c_custkey as string))")),
          // + 0.0 canonicalizes IEEE signed zero: DuckDB's round yields
          // -0.0 for balances in (-0.5, 0) where Spark yields +0.0, and
          // the driver's gate hashes BYTES (-0.0 != +0.0 bytewise)
          ColumnTransform("c_acctbal", TemplateExpr("round(c_acctbal, 0) + 0.0"))))).orderBy("c_custkey"),
      Some("SELECT c_custkey, ('User-' || c_custkey::VARCHAR) AS c_name, c_nationkey, " +
        "(round(c_acctbal, 0) + 0.0) AS c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey")),

    // ----- faker family: all 22 scalars in one query -----
    "q_faker" -> Q(
      (s, dir) => {
        val cols = Faker.all.toSeq.sortBy(_._1).map { case (n, t) =>
          t.applied(CK).as("f_" + n.toLowerCase)
        }
        // 22 generator expressions per row: widen a narrow scan first so a
        // single-file input doesn't serialize the whole faker pass
        graft.plans.Parallelism.widen(rd(s, dir, "customer"))
          .select(CK +: cols: _*).orderBy("c_custkey")
      },
      Some {
        val cols = Faker.all.toSeq.sortBy(_._1).map { case (n, t) =>
          s"${t.appliedSql("c_custkey").get} AS f_${n.toLowerCase}"
        }
        s"SELECT c_custkey, ${cols.mkString(", ")} FROM customer ORDER BY c_custkey"
      }),

    // ----- multi-column transformers -----
    "q_person" -> Q(
      (s, dir) => rd(s, dir, "customer")
        .select(CK +: MultiCol.person(CK).map { case (n, c) => c.as(n) }: _*)
        .orderBy("c_custkey"),
      Some {
        val cols = MultiCol.personSql("c_custkey").map { case (n, sql) => s"${sql} AS ${n}" }
        s"SELECT c_custkey, ${cols.mkString(", ")} FROM customer ORDER BY c_custkey"
      }),
    "q_company" -> Q(
      (s, dir) => rd(s, dir, "supplier")
        .select(col("s_suppkey") +: MultiCol.company(col("s_suppkey")).map { case (n, c) => c.as(n) }: _*)
        .orderBy("s_suppkey"),
      Some {
        val cols = MultiCol.companySql("s_suppkey").map { case (n, sql) => s"${sql} AS ${n}" }
        s"SELECT s_suppkey, ${cols.mkString(", ")} FROM supplier ORDER BY s_suppkey"
      }),
    "q_real_address" -> Q(
      (s, dir) => rd(s, dir, "customer")
        .select(CK +: MultiCol.address(CK).map { case (n, c) => c.as(n) }: _*)
        .orderBy("c_custkey"),
      Some {
        val cols = MultiCol.addressSql("c_custkey").map { case (n, sql) => s"${sql} AS ${n}" }
        s"SELECT c_custkey, ${cols.mkString(", ")} FROM customer ORDER BY c_custkey"
      }),
    // per-column templates over one attribute draw (random_person.go's
    // columns param): full_name composes three attributes; badge mixes an
    // attribute with a real row column — both over the SAME person draw
    "q_person_template" -> Q(
      (s, dir) => {
        val tpls = Seq(
          "full_name" -> "concat(title, ' ', first_name, ' ', last_name)",
          "badge" -> "concat(upper(first_name), '-', cast(c_custkey as string))")
        rd(s, dir, "customer")
          .select(CK +: MultiCol.templated(MultiCol.person(CK), tpls)
            .map { case (n, c) => c.as(n) }: _*)
          .orderBy("c_custkey")
      },
      Some {
        val tpls = Seq(
          "full_name" -> "concat(title, ' ', first_name, ' ', last_name)",
          "badge" -> "concat(upper(first_name), '-', cast(c_custkey as string))")
        val cols = MultiCol.templatedSql(MultiCol.personSql("c_custkey"), tpls)
          .map { case (n, sql) => s"${sql} AS ${n}" }
        s"SELECT c_custkey, ${cols.mkString(", ")} FROM customer ORDER BY c_custkey"
      }),
    // RealAddress's required single-line template, through the Registry
    // factory (the config path a reference user would hit)
    "q_address_template" -> Q(
      (s, dir) => {
        val t = graft.pipeline.Registry.build("RealAddress",
          Map("template" -> "concat(address1, ', ', city, ', ', state, ' ', postal_code)"))
        rd(s, dir, "customer")
          .select(CK, t.applied(CK).as("addr_line"))
          .orderBy("c_custkey")
      },
      Some {
        val t = graft.pipeline.Registry.build("RealAddress",
          Map("template" -> "concat(address1, ', ', city, ', ', state, ' ', postal_code)"))
        s"SELECT c_custkey, ${t.appliedSql("c_custkey").get} AS addr_line " +
          "FROM customer ORDER BY c_custkey"
      }),

    // t1 minimum end-to-end slice (SURVEY §7.3 step 4): config -> plan ->
    // masked customer with when-gating, all through the Planner
    "q_t1_slice" -> Q(
      (s, dir) => Planner.plan(rd(s, dir, "customer"), TableConfig("customer",
        when = Some("c_custkey >= 0"),
        transforms = Seq(
          ColumnTransform("c_name", Masking("name")),
          ColumnTransform("c_nationkey", RandomInt(0, 24)),
          ColumnTransform("c_mktsegment", SetNull())))).orderBy("c_custkey"),
      Some {
        val nk = RandomInt(0, 24).appliedSql("c_nationkey").get
        val nm = Masking("name").appliedSql("c_name").get
        "SELECT c_custkey, " +
          s"CASE WHEN c_custkey >= 0 THEN ${nm} ELSE c_name END AS c_name, " +
          s"CASE WHEN c_custkey >= 0 THEN (${nk})::INTEGER ELSE c_nationkey END AS c_nationkey, " +
          "c_acctbal, " +
          "CASE WHEN c_custkey >= 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment " +
          "FROM customer ORDER BY c_custkey"
      }),

    // ----- §2.3 when-gating (keep-untransformed), dynamic params -----
    "q_when_table" -> Q(
      (s, dir) => Planner.plan(rd(s, dir, "customer"), TableConfig("customer",
        when = Some("c_custkey % 3 = 0"),
        transforms = Seq(
          ColumnTransform("c_nationkey", RandomInt(0, 99)),
          ColumnTransform("c_name", Masking("name"))))).orderBy("c_custkey"),
      Some {
        val nk = RandomInt(0, 99).appliedSql("c_nationkey").get
        val nm = Masking("name").appliedSql("c_name").get
        "SELECT c_custkey, " +
          s"CASE WHEN c_custkey % 3 = 0 THEN ${nm} ELSE c_name END AS c_name, " +
          s"CASE WHEN c_custkey % 3 = 0 THEN (${nk})::INTEGER ELSE c_nationkey END AS c_nationkey, " +
          "c_acctbal, c_mktsegment FROM customer ORDER BY c_custkey"
      }),
    "q_when_transformer" -> Q(
      (s, dir) => Planner.plan(rd(s, dir, "customer"), TableConfig("customer",
        transforms = Seq(
          ColumnTransform("c_mktsegment", Replace("MASKED"), when = Some("c_acctbal < 0"))))).orderBy("c_custkey"),
      Some("SELECT c_custkey, c_name, c_nationkey, c_acctbal, " +
        "CASE WHEN c_acctbal < 0 THEN 'MASKED' ELSE c_mktsegment END AS c_mktsegment " +
        "FROM customer ORDER BY c_custkey")),
    "q_dynamic_params" -> scalar("customer", "c_custkey", CK, "c_custkey",
      RandomIntDyn(col("c_nationkey") * 1000L, col("c_nationkey") * 1000L + 999L,
        "(c_nationkey::BIGINT * 1000)", "(c_nationkey::BIGINT * 1000 + 999)")),

    // ----- apply_for_references: FK-consistent masking survives the join -----
    "q_apply_refs_join" -> Q(
      (s, dir) => {
        val t = RandomInt(0, 9999999, tweak = "refmask")
        val c = rd(s, dir, "customer").select(t.applied(CK).as("ck"))
        val o = rd(s, dir, "orders").select(t.applied(col("o_custkey")).as("ck"))
        c.join(o, "ck").agg(count(lit(1)).as("n_joined"))
      },
      Some {
        val t = RandomInt(0, 9999999, tweak = "refmask")
        s"SELECT count(*) AS n_joined FROM " +
          s"(SELECT ${t.appliedSql("c_custkey").get} AS ck FROM customer) c JOIN " +
          s"(SELECT ${t.appliedSql("o_custkey").get} AS ck FROM orders) o USING (ck)"
      }),

    // ----- §2.4 subset engine -----
    "q_subset_acyclic" -> Q(
      (s, dir) => {
        val dfs = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
          .map(t => t -> rd(s, dir, t)).toMap
        val pks = Catalog.tables.map(t => t.name -> t.primaryKey).toMap
        val edges = Catalog.fkRefs.filterNot(_.childTable == "events")
        val surviving = SubsetPlanner.plan(dfs, pks, edges,
          Map("customer" -> Seq("c_acctbal > 0")))
        surviving("lineitem").select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
              WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_custkey IN
                (SELECT c_custkey FROM customer WHERE c_acctbal > 0))
              AND l_partkey IN (SELECT p_partkey FROM part)
              AND l_suppkey IN (SELECT s_suppkey FROM supplier)
              ORDER BY l_orderkey, l_linenumber""")),
    "q_subset_nullable" -> Q(
      (s, dir) => {
        val ordersNull = rd(s, dir, "orders").withColumn("o_custkey",
          when(col("o_orderkey") % 97 === 0, lit(null)).otherwise(col("o_custkey")))
        val dfs = Map("customer" -> rd(s, dir, "customer"), "orders" -> ordersNull)
        val edges = Seq(FkRef("orders", Seq("o_custkey"), "customer", Seq("c_custkey"),
          nullable = true))
        val surviving = SubsetPlanner.plan(dfs,
          Map("customer" -> Seq("c_custkey"), "orders" -> Seq("o_orderkey")),
          edges, Map("customer" -> Seq("c_acctbal > 0")))
        surviving("orders").select("o_orderkey").orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey FROM orders
              WHERE (o_orderkey % 97 = 0) OR o_custkey IN
                (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
              ORDER BY o_orderkey""")),
    "q_subset_cyclic" -> Q(
      (s, dir) => {
        val dfs = Map("nation" -> rd(s, dir, "nation"), "region" -> rd(s, dir, "region"))
        val edges = Seq(
          FkRef("nation", Seq("n_regionkey"), "region", Seq("r_regionkey")),
          FkRef("region", Seq("r_regionkey"), "nation", Seq("n_regionkey"), virtual = true))
        val surviving = SubsetPlanner.plan(dfs,
          Map("nation" -> Seq("n_nationkey"), "region" -> Seq("r_regionkey")),
          edges, Map("nation" -> Seq("n_nationkey < 10")))
        surviving("nation").select("n_nationkey").orderBy("n_nationkey")
      },
      // closed form of the fix-point for this config
      Some("""SELECT n_nationkey FROM nation
              WHERE n_nationkey < 10 AND n_regionkey IN
                (SELECT r_regionkey FROM region WHERE r_regionkey IN
                  (SELECT n_regionkey FROM nation WHERE n_nationkey < 10))
              ORDER BY n_nationkey""")),
    // Self-referencing FK (employee-manager shape, derived from customer:
    // parent(id) = id/2, root 1): a row survives iff its own cond holds
    // AND its whole ancestor chain survives. The Spark side runs the
    // cyclic fix-point on the self-edge; the oracle is DuckDB's EXACT
    // recursive CTE — the strongest witness the fix-point semantics match
    // the reference's WITH RECURSIVE codegen (graph.go:675-805).
    "q_subset_selffk" -> Q(
      (s, dir) => {
        // custkey is 0-based: 0 is the root (a 0/2=0 self-loop would be
        // kept by the fix-point but underivable by the CTE — the
        // least-vs-greatest fixed-point edge on cyclic rows)
        val t = rd(s, dir, "customer").select(
          col("c_custkey").as("id"),
          when(col("c_custkey") === 0, lit(null))
            .otherwise((col("c_custkey") / 2).cast("long")).as("parent_id"))
        val edges = Seq(FkRef("t", Seq("parent_id"), "t", Seq("id"), nullable = true))
        val surviving = SubsetPlanner.plan(Map("t" -> t), Map("t" -> Seq("id")),
          edges, Map("t" -> Seq("id % 10 <> 3")))
        surviving("t").select("id").orderBy("id")
      },
      Some("""WITH RECURSIVE t AS (
                SELECT c_custkey AS id,
                       CASE WHEN c_custkey = 0 THEN NULL ELSE c_custkey // 2 END AS parent_id
                FROM customer
              ), surv AS (
                SELECT id, parent_id FROM t WHERE id % 10 <> 3 AND parent_id IS NULL
                UNION ALL
                SELECT c.id, c.parent_id FROM t c JOIN surv p ON c.parent_id = p.id
                WHERE c.id % 10 <> 3
              )
              SELECT id FROM surv ORDER BY id""")),
    "q_subset_polymorphic" -> Q(
      (s, dir) => {
        val dfs = Map("customer" -> rd(s, dir, "customer"), "events" -> rd(s, dir, "events"))
        val edges = Seq(FkRef("events", Seq("user_id"), "customer", Seq("c_custkey"),
          polymorphicCond = Some("event_type = 'click'"), virtual = true))
        val surviving = SubsetPlanner.plan(dfs,
          Map("customer" -> Seq("c_custkey"), "events" -> Seq("event_id")),
          edges, Map("customer" -> Seq("c_acctbal > 0")))
        surviving("events").select("event_id").orderBy("event_id")
      },
      Some("""SELECT event_id FROM events
              WHERE NOT (event_type = 'click') OR user_id IN
                (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
              ORDER BY event_id""")),

    // ----- validation diff (validate --data analog) -----
    "q_validate_diff" -> Q(
      (s, dir) => {
        val orig = rd(s, dir, "customer")
        val masked = Planner.plan(orig, TableConfig("customer", transforms = Seq(
          ColumnTransform("c_nationkey", RandomInt(0, 99)),
          ColumnTransform("c_name", Masking("default")))))
        Validator.diff(orig, masked, Seq("c_custkey"))
      },
      Some {
        val nk = RandomInt(0, 99).appliedSql("c_nationkey").get
        val nm = Masking("default").appliedSql("c_name").get
        s"""SELECT
            sum(CASE WHEN ${nm} IS DISTINCT FROM c_name THEN 1 ELSE 0 END)::BIGINT AS c_name_changed,
            count(*) AS c_name_total,
            sum(CASE WHEN (${nk})::INTEGER IS DISTINCT FROM c_nationkey THEN 1 ELSE 0 END)::BIGINT AS c_nationkey_changed,
            count(*) AS c_nationkey_total,
            0::BIGINT AS c_acctbal_changed, count(*) AS c_acctbal_total,
            0::BIGINT AS c_mktsegment_changed, count(*) AS c_mktsegment_total
            FROM customer"""
      }),

    // Per-row diff documents (validate --data shape): original +
    // transformed + changed per column
    "q_validate_rows" -> Q(
      (s, dir) => {
        val orig = rd(s, dir, "customer")
        val masked = Planner.plan(orig, TableConfig("customer", transforms = Seq(
          ColumnTransform("c_name", Masking("name")))))
        Validator.diffRows(orig, masked, Seq("c_custkey"))
          .select("c_custkey", "c_name_original", "c_name_transformed", "c_name_changed",
            "c_mktsegment_changed")
          .orderBy("c_custkey")
      },
      Some {
        val nm = Masking("name").appliedSql("c_name").get
        s"""SELECT c_custkey, c_name AS c_name_original, ${nm} AS c_name_transformed,
            (${nm} IS DISTINCT FROM c_name) AS c_name_changed,
            false AS c_mktsegment_changed
            FROM customer ORDER BY c_custkey"""
      }),

    // Privacy audit of a masked release: k-anonymity + l-diversity over
    // the generalized quasi-identifiers
    "q_k_anonymity" -> Q(
      (s, dir) => {
        val masked = Planner.plan(rd(s, dir, "customer"), TableConfig("customer",
          transforms = Seq(
            ColumnTransform("c_acctbal", TemplateExpr("cast(round(c_acctbal, -3) as double)")),
            ColumnTransform("c_name", SetNull()))))
        val ka = Validator.kAnonymity(masked, Seq("c_nationkey", "c_acctbal"), 5)
        val ld = Validator.lDiversity(masked, Seq("c_nationkey"), "c_mktsegment", 3)
        ka.crossJoin(ld) // two 1-row audits combined into the report row
      },
      Some("""WITH m AS (
                SELECT c_nationkey, round(c_acctbal, -3)::DOUBLE AS c_acctbal, c_mktsegment
                FROM customer
              ), ka AS (
                SELECT min(class_size) AS min_class_size,
                       sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)::BIGINT AS classes_below_k
                FROM (SELECT count(*) AS class_size FROM m GROUP BY c_nationkey, c_acctbal)
              ), ld AS (
                SELECT min(n_sensitive) AS min_diversity,
                       sum(CASE WHEN n_sensitive < 3 THEN 1 ELSE 0 END)::BIGINT AS classes_below_l
                FROM (SELECT count(DISTINCT c_mktsegment) AS n_sensitive
                      FROM m GROUP BY c_nationkey)
              )
              SELECT * FROM ka, ld""")),
    // t-closeness audit completing the privacy trio: same masked release,
    // QI = (nation, rounded balance), sensitive = market segment, t = 2/5.
    // TV distance in EXACT integer arithmetic on both sides (closed form
    // folds values absent from a class into N·n_g; see Validator.tCloseness)
    "q_t_closeness" -> Q(
      (s, dir) => {
        val masked = Planner.plan(rd(s, dir, "customer"), TableConfig("customer",
          transforms = Seq(
            ColumnTransform("c_acctbal", TemplateExpr("cast(round(c_acctbal, -3) as double)")),
            ColumnTransform("c_name", SetNull()))))
        Validator.tCloseness(masked, Seq("c_nationkey", "c_acctbal"),
          "c_mktsegment", tNum = 2, tDen = 5)
      },
      Some("""WITH m AS (
                SELECT c_nationkey, round(c_acctbal, -3)::DOUBLE AS c_acctbal, c_mktsegment
                FROM customer
              ), cls AS (
                SELECT c_nationkey, c_acctbal, c_mktsegment, count(*)::BIGINT AS c_v
                FROM m GROUP BY 1, 2, 3
              ), ng AS (
                SELECT c_nationkey, c_acctbal, sum(c_v)::BIGINT AS n_g
                FROM cls GROUP BY 1, 2
              ), gl AS (
                SELECT c_mktsegment, count(*)::BIGINT AS big_c FROM m GROUP BY 1
              ), tot AS (SELECT count(*)::BIGINT AS n_total FROM m),
              per AS (
                SELECT cls.c_nationkey, cls.c_acctbal,
                       any_value(ng.n_g) AS n_g,
                       any_value(tot.n_total) AS n_total,
                       (sum(abs(c_v * tot.n_total - gl.big_c * ng.n_g) - gl.big_c * ng.n_g)
                          + any_value(ng.n_g) * any_value(tot.n_total))::BIGINT AS num
                FROM cls
                JOIN ng ON cls.c_nationkey = ng.c_nationkey AND cls.c_acctbal = ng.c_acctbal
                JOIN gl ON cls.c_mktsegment IS NOT DISTINCT FROM gl.c_mktsegment
                CROSS JOIN tot
                GROUP BY 1, 2
              )
              SELECT (max((num * 1000000000) // (2 * n_g * n_total)))::BIGINT AS max_tv_nano,
                     sum(CASE WHEN num * 5 > 2 * 2 * n_g * n_total THEN 1 ELSE 0 END)::BIGINT AS classes_above_t,
                     count(*)::BIGINT AS n_classes
              FROM per""")),

    // Privacy ENFORCEMENT (audit -> action): global-recoding k-anonymity
    // via generalization ladders + suppression of residual small classes
    "q_k_anonymize" -> Q(
      (s, dir) => Anonymize.kAnonymize(rd(s, dir, "customer"), "c_custkey",
        Seq(
          Anonymize.QiLadder("nat", Seq(col("c_nationkey").cast("long"),
            expr("c_nationkey div 5").cast("long"), lit(0L))),
          // + 0.0 canonicalizes IEEE signed zero on the emitted double
          // ladder: DuckDB round(-251.3, -3) = -0.0, Spark = +0.0, and the
          // driver's gate hashes bytes (-0.0 + 0.0 = +0.0 in both engines)
          Anonymize.QiLadder("bal", Seq(round(col("c_acctbal"), -2) + lit(0.0d),
            round(col("c_acctbal"), -3) + lit(0.0d), lit(0.0d)))),
        k = 5).orderBy("c_custkey"),
      Some(Anonymize.kAnonymizeSql("customer", "c_custkey",
        Seq(
          "nat" -> Seq("c_nationkey::BIGINT", "(c_nationkey // 5)::BIGINT", "0::BIGINT"),
          "bal" -> Seq("(round(c_acctbal, -2)::DOUBLE + 0.0)", "(round(c_acctbal, -3)::DOUBLE + 0.0)",
            "0.0::DOUBLE")),
        k = 5) + " ORDER BY c_custkey")),

    // Privacy RELEASE: Laplace-noised group counts, noise drawn
    // deterministically from the salted u60 stream (hash-engine style —
    // reproducible and oracle-checkable; integer lnNano arithmetic)
    "q_dp_counts" -> Q(
      (s, dir) => Anonymize.dpNoisyCounts(rd(s, dir, "customer"),
        "c_mktsegment", epsNum = 1L, epsDen = 2L).orderBy("grp"),
      Some(Anonymize.dpNoisyCountsSql("customer", "c_mktsegment",
        epsNum = 1L, epsDen = 2L) + " ORDER BY grp")),

    // Data-quality expectations: declarative rules, one aggregate pass,
    // auditable per-rule report (deequ-style surface). Rule 4 is
    // deliberately failing (negative balances exist).
    "q_expectations" -> Q(
      (s, dir) => graft.pipeline.Expectations.check(rd(s, dir, "customer"),
        expectationRules).orderBy("rule_id"),
      Some(graft.pipeline.Expectations.checkSql("customer", expectationRules) +
        " ORDER BY rule_id")),

    // Per-column profiling report (null counts, string-form ranges,
    // mergeable HLL distinct sketches) — the dump-side table survey
    "q_profile" -> Q(
      (s, dir) => graft.pipeline.Profile.profile(rd(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
        .orderBy("col"),
      Some(graft.pipeline.Profile.profileSql("customer",
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")) +
        " ORDER BY col")),

    // Sketch algebra: distinct-key overlap via inclusion-exclusion over
    // register sketches (union = register-wise max, never a join)
    "q_sketch_overlap" -> Q(
      (s, dir) => Sketches.hllOverlap(
        rd(s, dir, "orders"), "o_custkey", rd(s, dir, "customer"), "c_custkey"),
      Some(Sketches.hllOverlapSql(
        "SELECT o_custkey AS v FROM orders",
        "SELECT c_custkey AS v FROM customer"))),

    // Record linkage: block -> candidate -> Levenshtein verify against a
    // deterministically perturbed twin table (suffix blocking — these
    // serial names share a long prefix, so a prefix block degenerates)
    "q_fuzzy_link" -> Q(
      (s, dir) => {
        val cust = rd(s, dir, "customer")
        val perturbed = cust.select(col("c_custkey").as("p_key"),
          translate(col("c_name"), "1", "I").as("p_name"))
        graft.ops.RecordLinkage.fuzzyJoin(
          cust, "c_custkey", "c_name",
          graft.ops.RecordLinkage.suffixBlock(col("c_name")),
          perturbed, "p_key", "p_name",
          graft.ops.RecordLinkage.suffixBlock(col("p_name")),
          maxDist = 3).orderBy("id_a", "id_b")
      },
      Some(graft.ops.RecordLinkage.fuzzyJoinSql(
        "SELECT c_custkey, c_name FROM customer", "c_custkey", "c_name",
        graft.ops.RecordLinkage.suffixBlockSql("a.c_name"),
        "SELECT c_custkey AS p_key, replace(c_name, '1', 'I') AS p_name FROM customer",
        "p_key", "p_name",
        graft.ops.RecordLinkage.suffixBlockSql("b.p_name"),
        maxDist = 3) + " ORDER BY id_a, id_b")),

    // Bounded-output linkage contract (r17): each left record's single
    // best match (argmin distance, smallest-id ties) — one row per
    // matched record where the pair contract's output is multiplicity²
    // (the reason q_fuzzy_link sat out the sf10 rehearsal)
    "q_fuzzy_link_best" -> Q(
      (s, dir) => {
        val cust = rd(s, dir, "customer")
        val perturbed = cust.select(col("c_custkey").as("p_key"),
          translate(col("c_name"), "1", "I").as("p_name"))
        graft.ops.RecordLinkage.fuzzyLinkBest(
          cust, "c_custkey", "c_name",
          graft.ops.RecordLinkage.suffixBlock(col("c_name")),
          perturbed, "p_key", "p_name",
          graft.ops.RecordLinkage.suffixBlock(col("p_name")),
          maxDist = 3).orderBy("id_a")
      },
      Some(graft.ops.RecordLinkage.fuzzyLinkBestSql(
        "SELECT c_custkey, c_name FROM customer", "c_custkey", "c_name",
        graft.ops.RecordLinkage.suffixBlockSql("a.c_name"),
        "SELECT c_custkey AS p_key, replace(c_name, '1', 'I') AS p_name FROM customer",
        "p_key", "p_name",
        graft.ops.RecordLinkage.suffixBlockSql("b.p_name"),
        maxDist = 3) + " ORDER BY id_a")),

    // Multi-pass blocking: union of suffix and mid-slice blocking keys,
    // per-pair min-distance dedup. Each pass carries the degenerate-block
    // cap — the round-14 sf1 rehearsal measured the UNCAPPED form at
    // 1363 s and 916M output pairs (vs ≤31 s for every other query):
    // the coarse mid-slice key collapses into 1000+-member mega-blocks
    // whose pairwise work grows quadratically with skew. Capping per
    // pass is standard linkage hygiene and the only posture that
    // survives 100 TB: work is bounded at cap² per block regardless of
    // corpus skew. Cap 500 keeps every legitimate suffix block at the
    // rehearsal scales (15 members at sf0.1, 150 at synthesized sf1)
    // while dropping the mid-slice mega-blocks; the uncapped API
    // remains for clean-keyed data.
    "q_fuzzy_link_multi" -> Q(
      (s, dir) => {
        val cust = rd(s, dir, "customer")
        val perturbed = cust.select(col("c_custkey").as("p_key"),
          translate(col("c_name"), "1", "I").as("p_name"))
        graft.ops.RecordLinkage.fuzzyJoinMulti(
          cust, "c_custkey", "c_name", perturbed, "p_key", "p_name",
          Seq(
            (graft.ops.RecordLinkage.suffixBlock(col("c_name")),
              graft.ops.RecordLinkage.suffixBlock(col("p_name"))),
            (upper(substring(col("c_name"), -6, 3)),
              upper(substring(col("p_name"), -6, 3)))),
          maxDist = 3, maxBlockSize = Some(500)).orderBy("id_a", "id_b")
      },
      Some {
        val a = "SELECT c_custkey, c_name FROM customer"
        val b = "SELECT c_custkey AS p_key, replace(c_name, '1', 'I') AS p_name FROM customer"
        val pass1 = graft.ops.RecordLinkage.fuzzyJoinCappedSql(a, "c_custkey", "c_name",
          graft.ops.RecordLinkage.suffixBlockSql("c_name"),
          b, "p_key", "p_name",
          graft.ops.RecordLinkage.suffixBlockSql("p_name"), 3, 500)
        val pass2 = graft.ops.RecordLinkage.fuzzyJoinCappedSql(a, "c_custkey", "c_name",
          "upper(substr(c_name, -6, 3))", b, "p_key", "p_name",
          "upper(substr(p_name, -6, 3))", 3, 500)
        s"""SELECT id_a, id_b, min(dist)::INT AS dist FROM (
              (${pass1}) UNION ALL (${pass2}))
            GROUP BY id_a, id_b ORDER BY id_a, id_b"""
      }),

    // Degenerate-block guard: placeholder values ('UNKNOWN' standing in
    // for dirty names) collapse into one mega-block whose pairs are all
    // junk matches (dist 0 on the placeholder itself). maxBlockSize
    // drops any block over the cap on either side BEFORE the join —
    // at sf0.01 this is 65,631 candidate pairs uncapped vs 1,131 capped.
    // Oracle replicates the cap with QUALIFY window counts per side.
    "q_fuzzy_link_capped" -> Q(
      (s, dir) => {
        val cust = rd(s, dir, "customer")
        val dirtyA = cust.select(col("c_custkey").as("a_key"),
          when(col("c_custkey") % 7 === 0, lit("UNKNOWN"))
            .otherwise(col("c_name")).as("a_name"))
        val dirtyB = cust.select(col("c_custkey").as("p_key"),
          when(col("c_custkey") % 5 === 0, lit("UNKNOWN"))
            .otherwise(translate(col("c_name"), "1", "I")).as("p_name"))
        graft.ops.RecordLinkage.fuzzyJoin(
          dirtyA, "a_key", "a_name",
          graft.ops.RecordLinkage.suffixBlock(col("a_name")),
          dirtyB, "p_key", "p_name",
          graft.ops.RecordLinkage.suffixBlock(col("p_name")),
          maxDist = 3, maxBlockSize = Some(100)).orderBy("id_a", "id_b")
      },
      Some(graft.ops.RecordLinkage.fuzzyJoinCappedSql(
        "SELECT c_custkey AS a_key, CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN' " +
          "ELSE c_name END AS a_name FROM customer",
        "a_key", "a_name",
        graft.ops.RecordLinkage.suffixBlockSql("a_name"),
        "SELECT c_custkey AS p_key, CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' " +
          "ELSE replace(c_name, '1', 'I') END AS p_name FROM customer",
        "p_key", "p_name",
        graft.ops.RecordLinkage.suffixBlockSql("p_name"),
        maxDist = 3, maxBlockSize = 100) + " ORDER BY id_a, id_b")),

    // Entity resolution on top of linkage: three record variants per
    // customer (original, '1'->'I' twin, '2'->'Z' twin; ids namespaced
    // 3k/3k+1/3k+2), pairs from two suffix-blocked fuzzy joins that each
    // link a twin ONLY to the original — so the two twins land in one
    // entity purely by TRANSITIVITY. Label-propagation fix-point vs
    // DuckDB's exact recursive reachability over the same edges.
    "q_entity_clusters" -> Q(
      (s, dir) => {
        val cust = rd(s, dir, "customer").filter(col("c_custkey") <= 500)
        def twin(from: String, to: String) = cust.select(
          col("c_custkey").as("p_key"),
          translate(col("c_name"), from, to).as("p_name"))
        // widenInputs=false: 500-row sides with 1-3-row suffix blocks —
        // the DP stage is microseconds and the r18 bench measured the
        // redistribution exchanges costing this query ~2x (0.89 -> 1.82 s)
        def pass(t: org.apache.spark.sql.DataFrame, ns: Int) =
          graft.ops.RecordLinkage.fuzzyJoin(
            cust, "c_custkey", "c_name",
            graft.ops.RecordLinkage.suffixBlock(col("c_name")),
            t, "p_key", "p_name",
            graft.ops.RecordLinkage.suffixBlock(col("p_name")),
            maxDist = 2, widenInputs = false)
            .select((col("id_a") * 3).as("id_a"), (col("id_b") * 3 + ns).as("id_b"))
        val pairs = pass(twin("1", "I"), 1).unionByName(pass(twin("2", "Z"), 2))
          .distinct()
        // one scan for all three record namespaces (a 3-way union would
        // read the table three times)
        val records = cust.select(explode(array((0 to 2).map(ns =>
          col("c_custkey") * 3 + ns): _*)).as("rec_id"))
        graft.ops.RecordLinkage.entityClusters(records, "rec_id", pairs)
          .orderBy("rec_id")
      },
      Some {
        val a = "SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 500"
        def bSql(from: Char, to: Char) =
          s"SELECT c_custkey AS p_key, replace(c_name, '$from', '$to') AS p_name " +
            "FROM customer WHERE c_custkey <= 500"
        def passSql(b: String, ns: Int) =
          s"SELECT id_a * 3 AS id_a, id_b * 3 + $ns AS id_b FROM (" +
            graft.ops.RecordLinkage.fuzzyJoinSql(a, "c_custkey", "c_name",
              graft.ops.RecordLinkage.suffixBlockSql("a.c_name"),
              b, "p_key", "p_name",
              graft.ops.RecordLinkage.suffixBlockSql("b.p_name"), 2) + ")"
        graft.ops.RecordLinkage.entityClustersSql(
          (0 to 2).map(ns => s"SELECT c_custkey * 3 + $ns AS id " +
            "FROM customer WHERE c_custkey <= 500").mkString(" UNION ALL "),
          "rec_id",
          s"""SELECT DISTINCT id_a, id_b FROM (
                (${passSql(bSql('1', 'I'), 1)}) UNION ALL (${passSql(bSql('2', 'Z'), 2)}))""") +
          " ORDER BY rec_id"
      }),

    // Cross-engine-exact comparison stats: centi-quantized measures,
    // exact integer moments, one fixed float tree, nano output
    "q_welch_t" -> Q(
      (s, dir) => graft.ops.Stats.welchT(rd(s, dir, "events"), "event_type",
        "value", "purchase", "click"),
      Some(graft.ops.Stats.welchTSql("events", "event_type", "value",
        "purchase", "click"))),
    "q_pearson" -> Q(
      (s, dir) => graft.ops.Stats.pearsonByGroup(rd(s, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", "l_quantity").orderBy("grp"),
      Some(graft.ops.Stats.pearsonByGroupSql("lineitem", "l_returnflag",
        "l_extendedprice", "l_quantity") + " ORDER BY grp")),
    "q_histogram" -> Q(
      (s, dir) => graft.ops.Stats.histogram(rd(s, dir, "orders"),
        "o_orderpriority", "o_totalprice", width = 50000.0)
        .orderBy("grp", "bucket"),
      Some(graft.ops.Stats.histogramSql("orders", "o_orderpriority",
        "o_totalprice", width = 50000.0) + " ORDER BY grp, bucket")),

    // ----- scans / projections / limits -----
    "q_query_scan" -> Q(
      (s, dir) => {
        rd(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("SELECT c_custkey, c_acctbal FROM customer_v WHERE c_acctbal > 5000 ORDER BY c_custkey")
      },
      Some("SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000 ORDER BY c_custkey")),
    "q_column_prune" -> Q(
      (s, dir) => Planner.plan(rd(s, dir, "customer"), TableConfig("customer",
        dropColumns = Seq("c_name", "c_acctbal", "c_nationkey"))).orderBy("c_custkey"),
      Some("SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey")),
    "q_row_limit" -> Q(
      (s, dir) => rd(s, dir, "customer").orderBy("c_custkey")
        .limit(100).select("c_custkey", "c_mktsegment"),
      Some("SELECT c_custkey, c_mktsegment FROM customer ORDER BY c_custkey LIMIT 100")),
    "q_seq_max" -> Q(
      (s, dir) => rd(s, dir, "orders").agg(max("o_orderkey").as("seq_last")),
      Some("SELECT max(o_orderkey) AS seq_last FROM orders")),
    // window function over event time (engine breadth; ts is a
    // TIMESTAMP_NTZ — ordering is type-native on both sides)
    "q_events_window" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        rd(s, dir, "events").select(col("user_id"), col("event_id"),
          row_number().over(w).as("rn")).orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
              row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events ORDER BY user_id, event_id""")),

    // ----- as-of / range joins (engine additions: operators Spark lacks,
    // single-shuffle window formulation / bucketed equi-join — see
    // ops/AsOfJoin.scala, ops/RangeJoin.scala) -----
    // Times run in MICROseconds on both sides: the parquet `ts` is
    // timestamp[us] (TIMESTAMP_NTZ in Spark); under the UTC session,
    // `unix_micros(cast(ts as timestamp))` here ≡ `epoch_us(ts)` there.
    "q_asof_join" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events").withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        graft.ops.AsOfJoin.backward(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", leftCols = Seq("event_id", "value"),
          rightCols = Seq("event_id", "value"), tieBreak = "event_id")
          .orderBy("user_id", "ts", "event_id")
      },
      Some(graft.ops.AsOfJoin.backwardSql(
        "(SELECT user_id, epoch_us(ts) AS ts, event_id, value FROM events WHERE event_type = 'purchase')",
        "(SELECT user_id, epoch_us(ts) AS ts, event_id, value FROM events WHERE event_type = 'view')",
        "user_id", "ts", leftCols = Seq("event_id", "value"),
        rightCols = Seq("event_id", "value"), tieBreak = "event_id") +
        " ORDER BY user_id, ts, event_id")),
    // As-of FORWARD: earliest view at-or-after each purchase
    "q_asof_forward" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events").withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        graft.ops.AsOfJoin.forward(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", leftCols = Seq("event_id", "value"),
          rightCols = Seq("event_id", "value"), tieBreak = "event_id")
          .orderBy("user_id", "ts", "event_id")
      },
      Some(graft.ops.AsOfJoin.forwardSql(
        "(SELECT user_id, epoch_us(ts) AS ts, event_id, value FROM events WHERE event_type = 'purchase')",
        "(SELECT user_id, epoch_us(ts) AS ts, event_id, value FROM events WHERE event_type = 'view')",
        "user_id", "ts", leftCols = Seq("event_id", "value"),
        rightCols = Seq("event_id", "value"), tieBreak = "event_id") +
        " ORDER BY user_id, ts, event_id")),
    // As-of NEAREST with tolerance: closer of the two directions, ties
    // resolving backward; out-of-tolerance matches null out
    "q_asof_nearest" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events").withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        graft.ops.AsOfJoin.nearest(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", leftCols = Seq("event_id", "value"),
          rightCols = Seq("event_id", "value"), tieBreak = "event_id",
          tolerance = Some(6L * 3600 * 1000000L))
          .orderBy("user_id", "ts", "event_id")
      },
      Some(graft.ops.AsOfJoin.nearestSql(
        "(SELECT user_id, epoch_us(ts) AS ts, event_id, value FROM events WHERE event_type = 'purchase')",
        "(SELECT user_id, epoch_us(ts) AS ts, event_id, value FROM events WHERE event_type = 'view')",
        "user_id", "ts", leftCols = Seq("event_id", "value"),
        rightCols = Seq("event_id", "value"), tieBreak = "event_id",
        tolerance = Some(6L * 3600 * 1000000L)) +
        " ORDER BY user_id, ts, event_id")),
    // NULL-bearing carried column: the matched right row's NULL must
    // survive (atomic struct carry), not be back-filled from an older row
    "q_asof_nulls" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events").withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        val right = ev.filter(col("event_type") === "view")
          .withColumn("value",
            when(col("event_id") % 3 === 0, lit(null)).otherwise(col("value")))
        graft.ops.AsOfJoin.backward(
          ev.filter(col("event_type") === "purchase"), right,
          "user_id", "ts", leftCols = Seq("event_id"),
          rightCols = Seq("event_id", "value"), tieBreak = "event_id")
          .orderBy("user_id", "ts", "event_id")
      },
      Some(graft.ops.AsOfJoin.backwardSql(
        "(SELECT user_id, epoch_us(ts) AS ts, event_id FROM events WHERE event_type = 'purchase')",
        "(SELECT user_id, epoch_us(ts) AS ts, event_id, " +
          "CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS value " +
          "FROM events WHERE event_type = 'view')",
        "user_id", "ts", leftCols = Seq("event_id"),
        rightCols = Seq("event_id", "value"), tieBreak = "event_id") +
        " ORDER BY user_id, ts, event_id")),
    "q_asof_tolerance" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events").withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        graft.ops.AsOfJoin.backward(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "view"),
          "user_id", "ts", leftCols = Seq("event_id"), rightCols = Seq("event_id"),
          tieBreak = "event_id", tolerance = Some(6L * 3600 * 1000000L))
          .orderBy("user_id", "ts", "event_id")
      },
      Some(graft.ops.AsOfJoin.backwardSql(
        "(SELECT user_id, epoch_us(ts) AS ts, event_id FROM events WHERE event_type = 'purchase')",
        "(SELECT user_id, epoch_us(ts) AS ts, event_id FROM events WHERE event_type = 'view')",
        "user_id", "ts", leftCols = Seq("event_id"), rightCols = Seq("event_id"),
        tieBreak = "event_id", tolerance = Some(6L * 3600 * 1000000L)) +
        " ORDER BY user_id, ts, event_id")),
    // Interval-overlap join (interval x interval): view windows x click
    // windows per user; bucketed equi-join, pair-unique via the
    // first-common-bucket filter (no pair-dedup shuffle)
    "q_interval_overlap" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events").withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        val halfDay = 12L * 3600 * 1000000L
        val day = 24L * 3600 * 1000000L
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts").as("v_start"),
            (col("ts") + lit(halfDay)).as("v_end"), col("event_id").as("view_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_start"),
            (col("ts") + lit(day)).as("c_end"), col("event_id").as("click_id"))
        graft.ops.RangeJoin.intervalOverlap(views, clicks, "user_id",
          "v_start", "v_end", "c_start", "c_end",
          leftCols = Seq("view_id"), rightCols = Seq("click_id"), bucketWidth = day)
          .orderBy("user_id", "v_start", "view_id", "click_id")
      },
      Some {
        val views = s"(SELECT user_id, epoch_us(ts) AS v_start, " +
          s"epoch_us(ts) + ${12L * 3600 * 1000000L} AS v_end, " +
          "event_id AS view_id FROM events WHERE event_type = 'view')"
        val clicks = s"(SELECT user_id, epoch_us(ts) AS c_start, " +
          s"epoch_us(ts) + ${24L * 3600 * 1000000L} AS c_end, " +
          "event_id AS click_id FROM events WHERE event_type = 'click')"
        graft.ops.RangeJoin.intervalOverlapSql(views, clicks, "user_id",
          "v_start", "v_end", "c_start", "c_end",
          leftCols = Seq("view_id"), rightCols = Seq("click_id")) +
          " ORDER BY user_id, v_start, view_id, click_id"
      }),

    "q_range_join" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events").withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        val day = 24L * 3600 * 1000000L
        val points = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"))
        val intervals = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("t_start"),
            (col("ts") + lit(day)).as("t_end"), col("event_id").as("click_id"))
        graft.ops.RangeJoin.pointInInterval(points, intervals, "user_id", "ts",
          "t_start", "t_end", pointCols = Seq("event_id"),
          intervalCols = Seq("click_id"), bucketWidth = day)
          .orderBy("user_id", "ts", "event_id", "click_id")
      },
      Some(graft.ops.RangeJoin.pointInIntervalSql(
        "(SELECT user_id, epoch_us(ts) AS ts, event_id FROM events WHERE event_type = 'view')",
        ("(SELECT user_id, epoch_us(ts) AS t_start, epoch_us(ts) + 86400000000 AS t_end, " +
          "event_id AS click_id FROM events WHERE event_type = 'click')"),
        "user_id", "ts", "t_start", "t_end", Seq("event_id"), Seq("click_id")) +
        " ORDER BY user_id, ts, event_id, click_id")),

    // Salted two-phase aggregation (hot-key skew tooling): result equals
    // the plain groupBy count regardless of the salt spread
    "q_skew_salted_agg" -> Q(
      (s, dir) => graft.ops.Skew.saltedCount(rd(s, dir, "lineitem"), "l_returnflag")
        .withColumnRenamed("l_returnflag", "key").orderBy("key"),
      Some("SELECT l_returnflag AS key, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY key")),

    // Salted skew JOIN: hot keys spread across saltBuckets tasks; the
    // OUTPUT is salt-independent (every left row meets its replicated
    // right row exactly once), so the plain inner join is the oracle
    "q_skew_salted_join" -> Q(
      (s, dir) => graft.ops.Skew.saltedJoin(
          rd(s, dir, "orders").select(col("o_custkey").as("k"), col("o_orderkey")),
          rd(s, dir, "customer").select(col("c_custkey").as("k"), col("c_mktsegment")),
          "k", saltBuckets = 8)
        .orderBy("o_orderkey"),
      Some("SELECT o_custkey AS k, o_orderkey, c_mktsegment " +
        "FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey")),

    // COPY text-format codec round-trip: write pgcopy-style lines, read
    // them back (escapes, \N nulls), values survive exactly
    "q_copy_roundtrip" -> Q(
      (s, dir) => {
        val path = s"/tmp/graft_copy_rt_${new java.io.File(dir).getName}"
        val src = rd(s, dir, "customer")
          .select(CK.cast("string").as("ck"), col("c_name").as("nm"), col("c_mktsegment").as("seg"))
        graft.sources.CopyText.write(src, path)
        graft.sources.CopyText.read(s, path, Seq("ck", "nm", "seg"))
          .select(col("ck").cast("long").as("ck"), col("nm"), col("seg")).orderBy("ck")
      },
      Some("SELECT c_custkey AS ck, c_name AS nm, c_mktsegment AS seg " +
        "FROM customer ORDER BY ck")),

    // Whole pg_restore-archive round-trip INSIDE the correctness gate:
    // dumpArchive renders toc.dat + COPY-text payload, PgArchive parses
    // the binary TOC back and loads the payload — values survive both
    // codecs exactly (string-safe columns; float renderings are
    // engine-specific by repo discipline)
    "q_pg_archive_roundtrip" -> Q(
      (s, dir) => {
        val out = s"/tmp/graft_pg_arch_rt_${new java.io.File(dir).getName}"
        val src = rd(s, dir, "customer")
          .select(CK, col("c_name"), col("c_nationkey"), col("c_mktsegment"))
        graft.pipeline.PgToc.dumpArchive(Seq("customer" -> src), out, "rt")
        val loaded = graft.sources.PgArchive.load(s, out)
        require(loaded.map(_._1) == Seq("customer"), "archive tag mismatch")
        loaded.head._2
          .select(col("c_custkey").cast("long").as("c_custkey"), col("c_name"),
            col("c_nationkey").cast("int").as("c_nationkey"), col("c_mktsegment"))
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name, c_nationkey, c_mktsegment " +
        "FROM customer ORDER BY c_custkey")),

    // Archive round-trip at data scale: the BIG table through the full
    // pg_dump shape (gzip member, binary TOC, COPY text codec) — the
    // interop-throughput headliner the bench tracks round over round.
    // 600k rows at sf0.1; quantity cast to int (integral in TPC-H) keeps
    // the oracle float-format-free per repo discipline.
    "q_pg_archive_lineitem" -> Q(
      (s, dir) => {
        val out = s"/tmp/graft_pg_arch_li_${new java.io.File(dir).getName}"
        val src = rd(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
            col("l_quantity").cast("int").as("l_quantity"),
            col("l_returnflag"), col("l_linestatus"))
        graft.pipeline.PgToc.dumpArchive(Seq("lineitem" -> src), out, "rt",
          compress = "gzip")
        val loaded = graft.sources.PgArchive.load(s, out)
        require(loaded.map(_._1) == Seq("lineitem"), "archive tag mismatch")
        loaded.head._2
          .select(col("l_orderkey").cast("long").as("l_orderkey"),
            col("l_partkey").cast("long").as("l_partkey"),
            col("l_linenumber").cast("int").as("l_linenumber"),
            col("l_quantity").cast("int").as("l_quantity"),
            col("l_returnflag"), col("l_linestatus"))
          // total order over every output column: the fixture is
          // TPC-H-ISH — (orderkey, linenumber) is NOT unique in it, so a
          // partial sort leaves tie order engine-dependent
          .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
            "l_returnflag", "l_linestatus")
      },
      Some("SELECT l_orderkey, l_partkey, l_linenumber, " +
        "CAST(l_quantity AS INT) AS l_quantity, l_returnflag, l_linestatus " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey, " +
        "l_quantity, l_returnflag, l_linestatus")),

    // Sessionization: idle-gap session ids per user (lag + running-sum
    // windows; epoch seconds derived from the TIMESTAMP_NTZ ts)
    "q_sessionize" -> Q(
      (s, dir) => graft.ops.Sessionize.sessions(rd(s, dir, "events"),
          "user_id", expr("unix_micros(cast(ts as timestamp)) div 1000000"),
          "event_id", gapSec = 3600)
        .select("user_id", "event_id", "session_id")
        .orderBy("user_id", "event_id"),
      // epoch_ns // 1e9 floors like Spark's `div` on the micros long;
      // epoch(ts)::BIGINT would ROUND fractional seconds and flip
      // sessions whose gap straddles the boundary
      Some(graft.ops.Sessionize.sessionsSql("events", "user_id",
        "(epoch_ns(ts) // 1000000000)", "event_id", 3600,
        "user_id, event_id, session_id") + " ORDER BY user_id, event_id")),

    // ----- Cmd pipe operator (external process round-trip) -----
    "q_pipe_csv" -> Q(
      (s, dir) => {
        val in = rd(s, dir, "customer")
          .select(CK.cast("string").as("ck"), col("c_mktsegment").as("seg"))
        Pipe.through(in, Seq("/bin/cat"), "csv")
          .select(col("ck").cast("long").as("ck"), col("seg")).orderBy("ck")
      },
      Some("SELECT c_custkey AS ck, c_mktsegment AS seg FROM customer ORDER BY ck")),
    "q_pipe_json" -> Q(
      (s, dir) => {
        val in = rd(s, dir, "supplier")
          .select(col("s_suppkey").cast("string").as("sk"), col("s_name").as("nm"))
        Pipe.through(in, Seq("/bin/cat"), "json")
          .select(col("sk").cast("long").as("sk"), col("nm")).orderBy("sk")
      },
      Some("SELECT s_suppkey AS sk, s_name AS nm FROM supplier ORDER BY sk")),
    // affected_columns scoping: only `seg` is sent to (and replaced by)
    // the process — `ck` never crosses the process boundary
    // (ref `cmd.go:50-140` affected/not_affected column merge)
    "q_pipe_affected" -> Q(
      (s, dir) => {
        val in = rd(s, dir, "customer")
          .select(CK.cast("string").as("ck"), col("c_mktsegment").as("seg"))
        Pipe.through(in, Seq("/usr/bin/tr", "[:upper:]", "[:lower:]"), "csv",
            graft.ops.PipeOptions(affectedColumns = Seq("seg")))
          .select(col("ck").cast("long").as("ck"), col("seg")).orderBy("ck")
      },
      Some("SELECT c_custkey AS ck, lower(c_mktsegment) AS seg FROM customer ORDER BY ck")),
    // Framing-escape round-trip: values carrying literal tabs, newlines,
    // CRs and backslashes cross the process boundary escaped (COPY text
    // tables, `pgcopy/encoder.go:24`) and decode back verbatim — the
    // one-line-per-row protocol survives control characters in data
    "q_pipe_csv_escapes" -> Q(
      (s, dir) => {
        val in = rd(s, dir, "customer")
          .select(CK.cast("string").as("ck"),
            concat(col("c_name"), lit("\t"), col("c_mktsegment"), lit("\n"),
              lit("\\tail\r")).as("tricky"))
        Pipe.through(in, Seq("/bin/cat"), "csv")
          .select(col("ck").cast("long").as("ck"), col("tricky")).orderBy("ck")
      },
      Some("SELECT c_custkey AS ck, c_name || chr(9) || c_mktsegment || chr(10) " +
        "|| '\\tail' || chr(13) AS tricky FROM customer ORDER BY ck")),
    // Same hazard through the json codec (RFC 8259 control-char escapes,
    // ref frames via `encoding/json`, `json_api.go:35`)
    "q_pipe_json_escapes" -> Q(
      (s, dir) => {
        val in = rd(s, dir, "supplier")
          .select(col("s_suppkey").cast("string").as("sk"),
            concat(lit("\"q\"\t"), col("s_name"), lit("\nx\u0001")).as("tricky"))
        Pipe.through(in, Seq("/bin/cat"), "json")
          .select(col("sk").cast("long").as("sk"), col("tricky")).orderBy("sk")
      },
      Some("SELECT s_suppkey AS sk, '\"q\"' || chr(9) || s_name || chr(10) " +
        "|| 'x' || chr(1) AS tricky FROM supplier ORDER BY sk")),
    // Reference Cmd wire protocol (`json_api.go`, `values.go:17-44`) at
    // its DEFAULT driver profile (indexes + bytes, `definition.go:27-32`):
    // keys are tuple column indexes, values are {"d":<base64>,"n":<bool>}
    // raw-value objects — a custom transformer script written for the
    // reference runs against this codec unchanged. NULLs (nullif) cross
    // the boundary as n:true and come back as real NULLs.
    "q_pipe_jsonrecord" -> Q(
      (s, dir) => {
        val in = rd(s, dir, "customer")
          .select(CK.cast("string").as("ck"),
            nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
        Pipe.through(in, Seq("/bin/cat"), "jsonrecord",
            graft.ops.PipeOptions(jsonAttributes = "indexes", jsonData = "bytes"))
          .select(col("ck").cast("long").as("ck"), col("seg")).orderBy("ck")
      },
      Some("SELECT c_custkey AS ck, nullif(c_mktsegment, 'BUILDING') AS seg " +
        "FROM customer ORDER BY ck")),
    // Reference text driver (`text_api.go`): one affected column as raw
    // lines, \N for NULL; unaffected columns never cross the boundary
    "q_pipe_text" -> Q(
      (s, dir) => {
        val in = rd(s, dir, "customer")
          .select(CK.cast("string").as("ck"), col("c_mktsegment").as("seg"))
        Pipe.through(in, Seq("/usr/bin/tr", "[:upper:]", "[:lower:]"), "text",
            graft.ops.PipeOptions(affectedColumns = Seq("seg")))
          .select(col("ck").cast("long").as("ck"), col("seg")).orderBy("ck")
      },
      Some("SELECT c_custkey AS ck, lower(c_mktsegment) AS seg FROM customer ORDER BY ck")),

    // ----- Json transformer -----
    "q_json_get" -> Q(
      (s, dir) => rd(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k_val"))
        .orderBy("event_id"),
      Some("SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events ORDER BY event_id")),
    // Nested gjson-path set/delete with CANONICAL (key-sorted, compact)
    // rendering — full-string oracle compare (props is {"k": <int>}, so
    // the expected canonical doc is constructible in DuckDB from $.k).
    "q_json_set" -> Q(
      (s, dir) => {
        import graft.expressions.JsonEditOp
        // doc1: nested set creates intermediate object + array; k untouched
        val doc1 = JsonNested(Seq(
          JsonEditOp("set", "meta.src", "\"masked\""),
          JsonEditOp("set", "meta.arr.1", "7"),
          JsonEditOp("delete", "not_there"))).applied(col("props"))
        // doc2: delete an existing key, then set a nested path
        val doc2 = JsonNested(Seq(
          JsonEditOp("delete", "k"),
          JsonEditOp("set", "a.b", "\"x\""))).applied(col("props"))
        rd(s, dir, "events")
          .select(col("event_id"), doc1.as("doc1"), doc2.as("doc2"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
              ('{"k":' || CAST(json_extract(props, '$.k') AS VARCHAR) ||
               ',"meta":{"arr":[null,7],"src":"masked"}}') AS doc1,
              '{"a":{"b":"x"}}' AS doc2
              FROM events ORDER BY event_id""")),
    // value_template analog (`json.go:64,80`): set values are Spark SQL
    // expressions over the row (raw-JSON semantics, SetRawBytesOptions) —
    // "u" is built from another column, "k2" from the original doc itself
    // (the GetValue-style access), and a skip_not_exist set at an absent
    // path is a per-row no-op
    "q_json_set_dynamic" -> Q(
      (s, dir) => {
        import graft.expressions.JsonEditOp
        val t = JsonNested(Seq(
          JsonEditOp("set", "u", "concat('\"u-', cast(user_id as string), '\"')",
            dynamic = true),
          JsonEditOp("set", "k2",
            "cast(cast(get_json_object(props, '$.k') as bigint) * 2 as string)",
            dynamic = true),
          JsonEditOp("set", "absent.path", "\"never\"", skipNotExist = true)))
        rd(s, dir, "events")
          .select(col("event_id"), t.applied(col("props")).as("doc"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
              ('{"k":' || json_extract_string(props, '$.k') ||
               ',"k2":' || CAST(json_extract_string(props, '$.k')::BIGINT * 2 AS VARCHAR) ||
               ',"u":"u-' || CAST(user_id AS VARCHAR) || '"}') AS doc
              FROM events ORDER BY event_id""")),

    // ----- LLM ops: dedup -----
    "q_dedup_exact" -> Q(
      (s, dir) => Dedup.exact(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("content_hash"),
      Some("""SELECT sha256(text) AS content_hash, min(doc_id) AS rep_id,
              count(*) AS n_dups
              FROM documents GROUP BY sha256(text) ORDER BY content_hash""")),
    // ExactSubstr-style duplicated-span removal (one copy survives at the
    // globally-first occurrence) — Lee et al. 2022 shape
    "q_dedup_spans" -> Q(
      (s, dir) => Dedup.dedupSpansAcross(rd(s, dir, "documents"), "doc_id", "text", k = 6)
        .orderBy("doc_id"),
      Some(Dedup.dedupSpansAcrossSql("documents", "doc_id", "text", 6))),
    "q_dedup_exact_rep" -> Q(
      (s, dir) => Dedup.exactWithRep(rd(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "rep_id", "is_rep").orderBy("doc_id"),
      Some("""SELECT doc_id, min(doc_id) OVER (PARTITION BY sha256(text)) AS rep_id,
              doc_id = min(doc_id) OVER (PARTITION BY sha256(text)) AS is_rep
              FROM documents ORDER BY doc_id""")),
    "q_sample_hash" -> Q(
      (s, dir) => Sampling.hashSample(rd(s, dir, "documents"), "doc_id", 10)
        .select("doc_id", "lang").orderBy("doc_id"),
      Some(s"SELECT doc_id, lang FROM documents WHERE ${Sampling.hashSampleSql("doc_id", 10)} " +
        "ORDER BY doc_id")),
    // Efraimidis–Spirakis exact-k weighted sample without replacement
    // (inclusion ∝ n_chars; deterministic ES keys from the hash stream)
    "q_sample_weighted_topk" -> Q(
      (s, dir) => Sampling.weightedTopK(rd(s, dir, "documents"), "source",
          "doc_id", col("n_chars"), k = 8)
        .select("doc_id", "source").orderBy("doc_id"),
      Some(Sampling.weightedTopKSql("documents", "source", "doc_id",
        "n_chars", 8, "doc_id, source") + " ORDER BY doc_id")),
    "q_sample_stratified" -> Q(
      (s, dir) => Sampling.stratifiedQuota(rd(s, dir, "documents"), "lang", "doc_id", 5)
        .select("doc_id", "lang").orderBy("doc_id"),
      Some(Sampling.stratifiedQuotaSql("documents", "lang", "doc_id", 5,
        "doc_id, lang") + " ORDER BY doc_id")),
    // Deterministic source mixing: per-source keep probabilities, each
    // row's fixed hash draw against its group's proportion
    "q_mix_by_source" -> Q(
      (s, dir) => Sampling.mixByGroup(rd(s, dir, "documents"), "doc_id", "source",
          Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.1), default = 0.05)
        .select("doc_id", "source").orderBy("doc_id"),
      Some(s"SELECT doc_id, source FROM documents WHERE " +
        Sampling.mixByGroupSql("doc_id", "source",
          Map("src0" -> 0.8, "src1" -> 0.5, "src2" -> 0.1), default = 0.05) +
        " ORDER BY doc_id")),

    // Token-budget cap per source: hash-ordered cumulative sum, keep until
    // the budget row (exact integer cumsums; overshoot < one doc)
    "q_token_budget" -> Q(
      (s, dir) => Sampling.tokenBudgetPerGroup(rd(s, dir, "documents"), "doc_id",
          "source", "n_chars", budget = 3000L)
        .select("doc_id", "source", "n_chars").orderBy("doc_id"),
      Some(Sampling.tokenBudgetPerGroupSql("documents", "doc_id", "source",
        "n_chars", budget = 3000L, selectCols = "doc_id, source, n_chars") +
        " ORDER BY doc_id")),

    // Epoch-repeat mixing: per-language token TARGETS — en upsampled to
    // ~3 epochs, de thinned below 1, unlisted languages on the default.
    // n_copies is exact integer arithmetic on both engines.
    "q_epoch_repeat" -> Q(
      (s, dir) => Sampling.epochRepeat(rd(s, dir, "documents"), "doc_id",
          "lang", "n_chars", targets = Map("en" -> 200000L, "de" -> 10000L),
          default = 30000L)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("n_copies").cast("long").as("n_copies"))
        .orderBy("doc_id"),
      Some(Sampling.epochRepeatSql("documents", "doc_id", "lang", "n_chars",
        targets = Map("en" -> 200000L, "de" -> 10000L), default = 30000L,
        selectCols = "doc_id, lang, n_chars, n_copies::BIGINT AS n_copies") +
        " ORDER BY doc_id")),

    // Quality-weighted deterministic sampling: keep-probability equals the
    // doc's quality score (the data-mixing primitive; no rand())
    "q_sample_weighted" -> Q(
      (s, dir) => Sampling.weighted(rd(s, dir, "documents"), "doc_id",
          TextOps.qualityScore(col("text")))
        .select("doc_id", "lang").orderBy("doc_id"),
      Some(s"SELECT doc_id, lang FROM documents WHERE " +
        s"${Sampling.weightedSql("doc_id", TextOps.qualityScoreSql("text"))} ORDER BY doc_id")),

    // Fixed-token chunking with overlap (the packing complement)
    "q_chunk_docs" -> Q(
      (s, dir) => Sampling.chunkDocuments(rd(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 64, overlap = 16).orderBy("doc_id", "chunk_id"),
      Some(Sampling.chunkDocumentsSql("documents", "doc_id", "text", 64, 16) +
        " ORDER BY doc_id, chunk_id")),

    // Sequence packing. Since round 6 the fold is partition-invariant
    // (hash-bucket routing), so the greedy per-bucket fold has a DuckDB
    // rendering after all: a recursive CTE stepping each bucket's
    // row_number sequence reproduces the budget rollover exactly —
    // flipping this row from rows-only to fully oracle-checked
    // (round-6 advice #4).
    "q_pack_sequences" -> Q(
      (s, dir) => Sampling.packSequences(
        rd(s, dir, "documents").select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", budget = 2048).orderBy("doc_id"),
      Some {
        val bucket = s"((${OracleGen.u60("doc_id", "pack")}) % 32)"
        val n = s"${TextOps.tokenCountSql("text")}::BIGINT"
        "WITH RECURSIVE docs AS (" +
          "SELECT doc_id, n, bucket, " +
          "row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn " +
          s"FROM (SELECT doc_id, $n AS n, $bucket AS bucket FROM documents)), " +
          "fold AS (" +
          "SELECT bucket, rn, doc_id, n, 0::BIGINT AS pack, n AS used FROM docs WHERE rn = 1 " +
          "UNION ALL " +
          "SELECT d.bucket, d.rn, d.doc_id, d.n, " +
          "CASE WHEN f.used + d.n > 2048 THEN f.pack + 1 ELSE f.pack END, " +
          "CASE WHEN f.used + d.n > 2048 THEN d.n ELSE f.used + d.n END " +
          "FROM fold f JOIN docs d ON d.bucket = f.bucket AND d.rn = f.rn + 1) " +
          "SELECT (bucket * 4294967296 + pack)::BIGINT AS pack_id, doc_id, " +
          "n AS n_tokens FROM fold ORDER BY doc_id"
      }),

    "q_text_normalize" -> Q(
      (s, dir) => rd(s, dir, "documents")
        .select(col("doc_id"), TextOps.normalize(col("text")).as("norm"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, ${TextOps.normalizeSql("text")} AS norm FROM documents ORDER BY doc_id")),
    "q_dedup_quality_rep" -> Q(
      (s, dir) => Dedup.exactQualityRep(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some {
        val norm = TextOps.normalizeSql("text")
        s"""SELECT doc_id, sha256(${norm}) AS norm_hash,
            row_number() OVER (PARTITION BY sha256(${norm})
              ORDER BY length(text) DESC, doc_id) = 1 AS keep
            FROM documents ORDER BY doc_id"""
      }),
    "q_dedup_minhash" -> Q(
      (s, dir) => Dedup.minhashLsh(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some {
        val sh = TextOps.shinglesSql("text", 3)
        val bands = (0 until 4).map(b => TextOps.bandHashSql(sh, b * 2, 2))
        s"""WITH b AS (
              SELECT doc_id, unnest([${bands.mkString(", ")}]) AS band FROM documents
            ), nb AS (
              SELECT doc_id, band FROM b WHERE band IS NOT NULL
            ), reps AS (
              SELECT band, min(doc_id) AS band_rep FROM nb GROUP BY band
            ), agg AS (
              SELECT nb.doc_id, min(band_rep) AS rep0
              FROM nb JOIN reps USING (band) GROUP BY nb.doc_id
            )
            SELECT d.doc_id, coalesce(agg.rep0, d.doc_id) AS near_dup_rep
            FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
            ORDER BY d.doc_id"""
      }),
    // Transitive LSH clustering (label propagation to convergence) vs
    // DuckDB's exact recursive reachability over the same band graph
    "q_dedup_cluster" -> Q(
      (s, dir) => Dedup.minhashLshClusters(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some {
        val sh = TextOps.shinglesSql("text", 3)
        val bands = (0 until 4).map(b => TextOps.bandHashSql(sh, b * 2, 2))
        s"""WITH RECURSIVE bnd AS (
              SELECT doc_id, band FROM (
                SELECT doc_id, unnest([${bands.mkString(", ")}]) AS band FROM documents)
              WHERE band IS NOT NULL
            ), reach AS (
              SELECT doc_id AS id, doc_id AS r FROM (SELECT DISTINCT doc_id FROM bnd)
              UNION
              SELECT b2.doc_id AS id, reach.r
              FROM reach
              JOIN bnd b1 ON reach.id = b1.doc_id
              JOIN bnd b2 ON b1.band = b2.band
            ), lab AS (
              SELECT id, min(r) AS cluster_rep FROM reach GROUP BY id
            )
            SELECT d.doc_id, coalesce(lab.cluster_rep, d.doc_id) AS cluster_rep
            FROM documents d LEFT JOIN lab ON d.doc_id = lab.id
            ORDER BY d.doc_id"""
      }),
    "q_dedup_simhash" -> Q(
      (s, dir) => Dedup.simhashBuckets(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("simhash"),
      Some {
        val sh = TextOps.simhash60Sql("text")
        s"""SELECT (${sh})::BIGINT AS simhash, min(doc_id) AS rep_id, count(*) AS bucket_size
            FROM documents GROUP BY 1 ORDER BY simhash"""
      }),
    // Hamming-k simhash pairs: 4x15-bit pigeonhole banding + exact popcount
    "q_simhash_hamming" -> Q(
      (s, dir) => Dedup.simhashHammingPairs(rd(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b"),
      Some {
        val sh = TextOps.simhash60Sql("text")
        s"""WITH s AS (
              SELECT doc_id AS id, (${sh})::BIGINT AS sh FROM documents
            ), banded AS (
              SELECT id, sh, b.band_no, (sh >> (b.band_no * 15)) & 32767 AS band_val
              FROM s CROSS JOIN (SELECT unnest([0,1,2,3]) AS band_no) b
            ), pairs AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
              FROM banded a JOIN banded b
                ON a.band_no = b.band_no AND a.band_val = b.band_val AND a.id < b.id
            )
            SELECT id_a, id_b, bit_count(xor(sh_a, sh_b))::INT AS hamming
            FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 3
            ORDER BY id_a, id_b"""
      }),
    // Band-plan census (r17): the r16 band-width law as one query —
    // all five routable band plans censused in a single signature pass
    // (candidate volume, bucket count, straggler bound per plan)
    "q_simhash_band_census" -> Q(
      (s, dir) => Dedup.simhashBandPlanCensus(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("plan"),
      Some(Dedup.simhashBandPlanCensusSql("documents", "doc_id", "text") +
        " ORDER BY plan")),
    // Bounded-output simhash contract (r17): per-doc closest neighbor
    // by hamming (lower wins, smallest-partner ties) — O(N) output
    // where the pair contract measured sf10 output exponent 1.72
    "q_simhash_best_match" -> Q(
      (s, dir) => Dedup.simhashBestMatch(rd(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("id"),
      Some(Dedup.simhashBestMatchSql("documents", "doc_id", "text", 3) +
        " ORDER BY id")),
    // Wide 120-bit variant: two independent simhash streams, 8x15-bit
    // pigeonhole banding covers hamming <= 7 and lifts the 60-bit band
    // saturation ceiling (COVERAGE r15 note)
    "q_simhash_hamming_wide" -> Q(
      (s, dir) => Dedup.simhashHammingPairsWide(rd(s, dir, "documents"), "doc_id",
        "text", 7)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b"),
      Some(Dedup.simhashHammingPairsWideSql("documents", "doc_id", "text", 7))),
    "q_dedup_jaccard" -> Q(
      (s, dir) => Dedup.jaccardPairs(rd(s, dir, "documents"), "doc_id", "text",
        threshold = 0.0).orderBy("id_a", "id_b"),
      Some {
        val sh = TextOps.shinglesSql("text", 3)
        val bands = (0 until 4).map(b => TextOps.bandHashSql(sh, b * 2, 2))
        // integer-count ratio => exact double parity
        s"""WITH base AS (
              SELECT doc_id AS id, list_distinct(${sh}) AS sh,
                     [${bands.mkString(", ")}] AS bands FROM documents
            ), e AS (
              SELECT id, sh, band FROM (
                SELECT id, sh, unnest(bands) AS band FROM base)
              WHERE band IS NOT NULL
            ), pairs AS (
              SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
              FROM e a JOIN e b ON a.band = b.band AND a.id < b.id
            )
            SELECT id_a, id_b,
              CASE WHEN len(list_distinct(list_concat(sh_a, sh_b))) > 0
                   THEN len(list_intersect(sh_a, sh_b))::DOUBLE
                        / len(list_distinct(list_concat(sh_a, sh_b)))::DOUBLE
                   ELSE 0.0 END AS jaccard
            FROM pairs ORDER BY id_a, id_b"""
      }),
    // Asymmetric containment over the same LSH candidates: catches
    // sub-document duplication (quoted short doc inside a long one) that
    // Jaccard dilutes; integer-count ratios => exact double parity
    "q_dedup_containment" -> Q(
      (s, dir) => Dedup.containmentPairs(rd(s, dir, "documents"), "doc_id", "text",
        threshold = 0.5).orderBy("id_a", "id_b"),
      Some(Dedup.containmentPairsSql("documents", "doc_id", "text", threshold = 0.5) +
        " ORDER BY id_a, id_b")),
    // Bounded-output contracts (r17): the sf10 rehearsal measured the
    // all-pairs generators at OUTPUT exponent 1.9-2.0 (quadratic in
    // duplicate multiplicity) — these are the O(N)-output alternatives a
    // 100 TB pipeline actually lands. Best match: per-doc argmax over
    // the LSH candidates via map-side-partial min(struct(...)).
    "q_dedup_best_match" -> Q(
      (s, dir) => Dedup.bestMatchPairs(rd(s, dir, "documents"), "doc_id", "text",
        threshold = 0.0).orderBy("id"),
      Some(Dedup.bestMatchPairsSql("documents", "doc_id", "text", threshold = 0.0) +
        " ORDER BY id")),
    // Candidate-volume census: forecast the band join's pair volume,
    // skew bound, and matched-doc count BEFORE generating any pair —
    // the pre-flight read that picks between the all-pairs and
    // best-match contracts. All-integer single row => exact parity.
    "q_lsh_candidate_census" -> Q(
      (s, dir) => Dedup.lshCandidateCensus(rd(s, dir, "documents"), "doc_id", "text"),
      Some(Dedup.lshCandidateCensusSql("documents", "doc_id", "text"))),

    // ----- LLM ops: cross-corpus decontamination + similarity estimate +
    // deterministic corpus shuffle -----
    // holdout = every 5th doc: exact decontamination removes exactly the
    // holdout members (fixtures have no exact dups); the NEAR variant also
    // removes train docs sharing any LSH band with a holdout doc
    "q_decontaminate_exact" -> Q(
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        Dedup.crossCorpusExact(docs, docs.filter(col("doc_id") % 5 === 0), "text")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""SELECT doc_id FROM documents
              WHERE sha256(text) NOT IN
                (SELECT sha256(text) FROM documents WHERE doc_id % 5 = 0)
              ORDER BY doc_id""")),
    "q_decontaminate_near" -> Q(
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        Dedup.crossCorpusNear(docs, docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text").select("doc_id").orderBy("doc_id")
      },
      Some {
        val sh = TextOps.shinglesSql("text", 3)
        val bands = (0 until 4).map(b => TextOps.bandHashSql(sh, b * 2, 2))
        s"""WITH tb AS (
              SELECT doc_id, band FROM (
                SELECT doc_id, unnest([${bands.mkString(", ")}]) AS band FROM documents)
              WHERE band IS NOT NULL
            ), hb AS (
              SELECT DISTINCT band FROM (
                SELECT unnest([${bands.mkString(", ")}]) AS band FROM documents
                WHERE doc_id % 5 = 0)
              WHERE band IS NOT NULL
            ), bad AS (
              SELECT DISTINCT doc_id FROM tb JOIN hb USING (band)
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM bad)
            ORDER BY doc_id"""
      }),
    // Bloom-prefiltered decontamination: same exact-anti-join contract as
    // q_decontaminate_exact (bloom false positives are removed by the
    // verify join, false negatives don't exist), so the oracle is the
    // plain NOT IN — what differs is the plan: the corpus probes a
    // broadcast bloom instead of shuffling its digests. Holdout here is
    // every 7th doc to keep the query independent of the %5 exact row.
    "q_decontaminate_bloom" -> Q(
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        Curation.decontaminateBloom(docs, docs.filter(col("doc_id") % 7 === 0), "text")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""SELECT doc_id FROM documents
              WHERE sha256(text) NOT IN
                (SELECT sha256(text) FROM documents WHERE doc_id % 7 = 0)
              ORDER BY doc_id""")),

    // ----- LLM ops: curation scores (integer nano-nat log parity) -----
    "q_unigram_xent" -> Q(
      (s, dir) => Curation.unigramCrossEntropy(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(Curation.unigramCrossEntropySql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),
    // distributed BPE tokenizer induction: 12 merge rounds over the
    // word-frequency table; oracle = the identical induction unrolled as
    // 12 CTE rounds (argmax + replace per round) in DuckDB
    "q_bpe_merges" -> Q(
      (s, dir) => Bpe.train(rd(s, dir, "documents"), "text", nMerges = 12)
        .orderBy("step"),
      Some(Bpe.trainSql("documents", "text", nMerges = 12) + " ORDER BY step")),
    // tokenize under a FIXED production-style merge table (compounding
    // rules included: th+e, an+d chain through earlier merges)
    "q_bpe_tokencount" -> Q(
      (s, dir) => Bpe.tokenCount(rd(s, dir, "documents"), "doc_id", "text",
        SparkEntry.bpeFixedMerges).orderBy("doc_id"),
      Some(Bpe.tokenCountSql("documents", "doc_id", "text",
        SparkEntry.bpeFixedMerges) + " ORDER BY doc_id")),
    "q_bigram_xent" -> Q(
      (s, dir) => Curation.bigramCrossEntropy(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(Curation.bigramCrossEntropySql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),
    "q_dsir_weights" -> Q(
      (s, dir) => Curation.dsirWeights(rd(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en").orderBy("doc_id"),
      Some(Curation.dsirWeightsSql("documents", "doc_id", "text", "lang = 'en'") +
        " ORDER BY doc_id")),
    "q_split_leakfree" -> Q(
      (s, dir) => Curation.leakFreeSplit(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(Curation.leakFreeSplitSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),
    "q_mix_temperature" -> Q(
      (s, dir) => Curation.temperatureMixWeights(rd(s, dir, "documents"), "lang", "text",
        budgetTokens = 1000000L).orderBy("lang"),
      Some(Curation.temperatureMixWeightsSql("documents", "lang", "text", 1000000L) +
        " ORDER BY lang")),

    // per-cluster cohesion: nano-quantized own-centroid cosines summed
    // exactly (the float-kernel analog of the nano-nat log discipline)
    "q_cluster_quality" -> Q(
      (s, dir) => Similarity.clusterQuality(rd(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("cluster"),
      Some(Similarity.clusterQualitySql(k = 0, dim = 64) + " ORDER BY cluster")),
    "q_source_report" -> Q(
      (s, dir) => Corpus.sourceQualityReport(rd(s, dir, "documents"), "source", "text", "lang")
        .orderBy("source"),
      Some(Corpus.sourceQualityReportSql("documents", "source", "text", "lang") +
        " ORDER BY source")),
    // per-source exact length deciles: integer rank math, no interpolation
    "q_length_deciles" -> Q(
      (s, dir) => Corpus.groupQuantiles(rd(s, dir, "documents"), "source", "n_chars")
        .orderBy("source", "pct"),
      Some(Corpus.groupQuantilesSql("documents", "source", "n_chars") +
        " ORDER BY source, pct")),

    "q_mad_outliers" -> Q(
      (s, dir) => Corpus.madOutliers(rd(s, dir, "documents"), "doc_id", "lang", "n_chars")
        .orderBy("doc_id"),
      Some(Corpus.madOutliersSql("documents", "doc_id", "lang", "n_chars") +
        " ORDER BY doc_id")),

    // pairwise source-overlap: per-source MinHash signature agreement;
    // integer-count / 32 => exact double parity with DuckDB
    "q_source_overlap" -> Q(
      (s, dir) => Corpus.sourceOverlapMinhash(rd(s, dir, "documents"), "source", "text")
        .orderBy("src_a", "src_b"),
      Some(Corpus.sourceOverlapMinhashSql("documents", "source", "text") +
        " ORDER BY src_a, src_b")),

    // fraction of equal minhash streams = the classic unbiased Jaccard
    // estimator; integer-count / 8 => exact double parity with DuckDB
    "q_minhash_simest" -> Q(
      (s, dir) => Dedup.minhashSimilarityPairs(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("id_a", "id_b"),
      Some {
        val sh = TextOps.shinglesSql("text", 3)
        val bands = (0 until 4).map(b => TextOps.bandHashSql(sh, b * 2, 2))
        val streams = (0 until 8).map(i => s"(${TextOps.minhashSql(sh, i)}) AS m$i")
        val eq = (0 until 8).map(i => s"CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END")
        s"""WITH nb AS (
              SELECT doc_id, band FROM (
                SELECT doc_id, unnest([${bands.mkString(", ")}]) AS band FROM documents)
              WHERE band IS NOT NULL
            ), pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM nb a JOIN nb b ON a.band = b.band AND a.doc_id < b.doc_id
            ), s AS (
              SELECT doc_id, ${streams.mkString(", ")} FROM documents
            )
            SELECT id_a, id_b, ((${eq.mkString(" + ")})::DOUBLE / 8) AS sim_est
            FROM pairs
            JOIN s sa ON pairs.id_a = sa.doc_id
            JOIN s sb ON pairs.id_b = sb.doc_id
            ORDER BY id_a, id_b"""
      }),
    "q_shuffle_det" -> Q(
      (s, dir) => Sampling.shuffleDeterministic(rd(s, dir, "documents"), "doc_id")
        .select("doc_id", "shuffle_key"),
      Some(s"""SELECT doc_id, ${Sampling.shuffleDeterministicSql("doc_id")}
               FROM documents ORDER BY shuffle_key, doc_id""")),

    "q_random_engine" -> Q( // rows-only by nature: non-deterministic PRNG
      (s, dir) => rd(s, dir, "customer").select(CK,
        graft.generators.RandomEngine.longBetween(0, 999999).as("masked"),
        graft.generators.RandomEngine.choice(Seq("alpha", "beta")).as("picked"))
        .orderBy("c_custkey"),
      None),
    // Driver-visible invariants of the PRNG engine (round-9 verdict #7):
    // the value stream is rows-only by nature, but its CONTRACT is
    // oracle-checkable — row count preserved, limiter bounds respected,
    // choice values drawn from the dictionary, outputs never null, the
    // decimal grid honored. Each invariant collapses to a constant the
    // DuckDB oracle states outright; any engine violation (a limiter off
    // by one, a null leak, a choice outside the dictionary) flips a
    // column and hash-mismatches.
    "q_random_engine_bounds" -> Q(
      (s, dir) => {
        val eng = graft.generators.RandomEngine
        rd(s, dir, "customer").select(
          eng.longBetween(0, 999999).as("masked"),
          eng.choice(Seq("alpha", "beta")).as("picked"),
          eng.doubleBetween(1.5, 9.5, 2).as("dbl"))
          .agg(
            count(lit(1)).as("n"),
            (min(col("masked")) >= 0 && max(col("masked")) <= 999999)
              .as("long_in_bounds"),
            sum(when(col("picked").isin("alpha", "beta"), 0L).otherwise(1L))
              .as("bad_choice"),
            sum(when(col("masked").isNull || col("picked").isNull ||
              col("dbl").isNull, 1L).otherwise(0L)).as("nulls_out"),
            (min(col("dbl")) >= 1.5 && max(col("dbl")) <= 9.5)
              .as("dbl_in_bounds"),
            sum(when(abs(col("dbl") * 100 - round(col("dbl") * 100)) > 1e-9,
              1L).otherwise(0L)).as("off_grid"))
      },
      Some("""SELECT count(*)::BIGINT AS n, true AS long_in_bounds,
              0::BIGINT AS bad_choice, 0::BIGINT AS nulls_out,
              true AS dbl_in_bounds, 0::BIGINT AS off_grid FROM customer""")),

    // Exact per-label embedding centroids (nano-quantized components ->
    // exact integer sums -> one bit-identical division)
    "q_embed_centroids" -> Q(
      (s, dir) => Similarity.groupCentroids(rd(s, dir, "embeddings"),
        "label", "embedding").orderBy("grp", "dim"),
      Some(Similarity.groupCentroidsSql("embeddings", "label", "embedding") +
        " ORDER BY grp, dim")),

    // Between-centroid separation matrix (pairs over the tiny
    // labels x dims centroid relation, never the vectors)
    "q_centroid_dists" -> Q(
      (s, dir) => Similarity.centroidDistances(rd(s, dir, "embeddings"),
        "label", "embedding").orderBy("la", "lb"),
      Some(Similarity.centroidDistancesSql("embeddings", "label", "embedding") +
        " ORDER BY la, lb")),

    // ----- LLM ops: similarity search -----
    // Raw cosines differ from DuckDB in the last float ulp, so the oracle
    // compares only ulp-robust projections: top-k membership, bucket
    // signs, threshold sets (raw-value checks live in LlmOpsSpec).
    // Symmetric int8 embedding quantization: integer-exact output, so the
    // full quantized codes oracle-compare (not just membership)
    "q_quantize_int8" -> Q(
      (s, dir) => Similarity.quantizeInt8(rd(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy("vec_id"),
      Some(Similarity.quantizeInt8Sql("embeddings", "vec_id", "embedding") +
        " ORDER BY vec_id")),

    "q_knn_brute" -> Q(
      (s, dir) => Similarity.bruteForceTopK(rd(s, dir, "embeddings"), "vec_id", "embedding",
        Similarity.testQuery(64), 20).select("vec_id").orderBy("vec_id"),
      Some {
        val cos = Similarity.cosineToSql("embedding", Similarity.testQuery(64))
        s"""SELECT vec_id FROM (
              SELECT vec_id, ${cos} AS c FROM embeddings
              ORDER BY c DESC, vec_id LIMIT 20)
            ORDER BY vec_id"""
      }),
    "q_ann_lsh_buckets" -> Q(
      (s, dir) => Similarity.withLshBuckets(rd(s, dir, "embeddings"), "vec_id", "embedding",
        nPlanes = 8, dim = 64)
        .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
        .orderBy("bucket"),
      Some {
        val bucket = Similarity.lshBucketSql("embedding", Similarity.hyperplanes(8, 64))
        s"""SELECT bucket, count(*) AS n_vecs FROM
              (SELECT ${bucket} AS bucket FROM embeddings)
            GROUP BY bucket ORDER BY bucket"""
      }),
    // Multi-probe ANN: query bucket + hamming-1 flips of the
    // smallest-margin planes
    "q_ann_multiprobe" -> Q(
      (s, dir) => Similarity.annTopKMultiProbe(rd(s, dir, "embeddings"), "vec_id",
        "embedding", Similarity.testQuery(64), 20, nPlanes = 8, probes = 3)
        .select("vec_id").orderBy("vec_id"),
      Some {
        val buckets = Similarity.multiProbeBuckets(Similarity.testQuery(64), 8, 3)
        val bucket = Similarity.lshBucketSql("embedding", Similarity.hyperplanes(8, 64))
        val cos = Similarity.cosineToSql("embedding", Similarity.testQuery(64))
        s"""SELECT vec_id FROM (
              SELECT vec_id, c FROM (
                SELECT vec_id, ${bucket} AS bucket, ${cos} AS c FROM embeddings)
              WHERE bucket IN (${buckets.mkString(",")})
              ORDER BY c DESC, vec_id LIMIT 20)
            ORDER BY vec_id"""
      }),

    // IVF coarse quantizer end-to-end: hash-rank seed (TakeOrderedAndProject,
    // no global sort/count) -> assign -> 2-probe -> exact top-k; membership
    // projection like q_knn_brute
    "q_ivf_topk" -> Q(
      (s, dir) => {
        val df = rd(s, dir, "embeddings")
        val cents = Similarity.ivfCentroids(df, "vec_id", "embedding", 8)
        Similarity.ivfTopK(df, "vec_id", "embedding", Similarity.testQuery(64), 20,
          cents, nProbe = 2).select("vec_id").orderBy("vec_id")
      },
      Some(Similarity.ivfMembershipSql(Similarity.testQuery(64), 20, 8, 2, 64))),
    // ANN evaluation: recall@k of the IVF path vs brute ground truth —
    // integer intersection counts, so the metric itself oracle-compares
    "q_ann_recall" -> Q(
      (s, dir) => Similarity.annRecallAtK(rd(s, dir, "embeddings"), "vec_id", "embedding",
        Similarity.probeQueries(3, 64), k = 20, nCent = 8, nProbe = 2)
        .orderBy("query_id"),
      Some(Similarity.annRecallAtKSql(Similarity.probeQueries(3, 64), 20, 8, 2, 64) +
        " ORDER BY query_id")),

    "q_embed_neardup" -> Q(
      (s, dir) => Similarity.cosineNearDupPairs(rd(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.8, nPlanes = 8, dim = 64).select("id_a", "id_b").orderBy("id_a", "id_b"),
      Some {
        val bucket = Similarity.lshBucketSql("embedding", Similarity.hyperplanes(8, 64))
        val cos = Similarity.pairCosineSql("a.embedding", "b.embedding", 64)
        s"""WITH bk AS (SELECT vec_id, embedding, ${bucket} AS bucket FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE ${cos} >= 0.8
            ORDER BY id_a, id_b"""
      }),
    // Bounded-output cosine contract (r17): per-vector best tau-near
    // neighbor instead of the C(g,2) pair stream (sf10 output exponent
    // 2.04); cosine doubles compare exactly because the fused
    // CosinePair kernel mirrors DuckDB's list accumulation order
    "q_embed_neardup_best" -> Q(
      (s, dir) => Similarity.cosineBestMatch(rd(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.8, nPlanes = 8, dim = 64).orderBy("id"),
      Some(Similarity.cosineBestMatchSql("embeddings", "vec_id", "embedding",
        threshold = 0.8, nPlanes = 8, dim = 64) + " ORDER BY id")),
    // Non-vacuous sf0.01 rows for the embed near-dup family (VERDICT r17
    // #3): the 0.8-threshold queries pass on 0 rows at the driver's
    // correctness scale (the synthetic embeddings' within-bucket cosines
    // top out at ~0.456 there), so pair and argmax semantics were only
    // certified vacuously. 0.345 sits in the fixture's populated range —
    // 7 pairs at sf0.01, nearest cosines 3.9e-3 away on BOTH sides of
    // the threshold, so no cross-engine ulp flip — and the original
    // names/thresholds stay registered for the driver contract.
    "q_embed_neardup_lo" -> Q(
      (s, dir) => Similarity.cosineNearDupPairs(rd(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.345, nPlanes = 8, dim = 64).select("id_a", "id_b").orderBy("id_a", "id_b"),
      Some {
        val bucket = Similarity.lshBucketSql("embedding", Similarity.hyperplanes(8, 64))
        val cos = Similarity.pairCosineSql("a.embedding", "b.embedding", 64)
        s"""WITH bk AS (SELECT vec_id, embedding, ${bucket} AS bucket FROM embeddings)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE ${cos} >= 0.345
            ORDER BY id_a, id_b"""
      }),
    "q_embed_neardup_best_lo" -> Q(
      (s, dir) => Similarity.cosineBestMatch(rd(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.345, nPlanes = 8, dim = 64).orderBy("id"),
      Some(Similarity.cosineBestMatchSql("embeddings", "vec_id", "embedding",
        threshold = 0.345, nPlanes = 8, dim = 64) + " ORDER BY id")),
    // Hyperplane-bucket census (VERDICT r17 #4): the pre-flight forecast
    // for the cosine near-dup family — one scan censuses the 4/6/8/10/12
    // plane plans (prefix-closed hyperplane seed => smaller plans are
    // bit-masks of the max plan's bucket). All-integer => exact parity;
    // EmbedCensusSpec cross-pins plan 8's candidate_pairs against the
    // unthresholded pair join the way the LSH census pins the band join.
    "q_embed_bucket_census" -> Q(
      (s, dir) => Similarity.embedBucketCensus(rd(s, dir, "embeddings"), "vec_id",
        "embedding", planCounts = Seq(4, 6, 8, 10, 12), dim = 64).orderBy("n_planes"),
      Some(Similarity.embedBucketCensusSql("embeddings", "vec_id", "embedding",
        Seq(4, 6, 8, 10, 12), dim = 64) + " ORDER BY n_planes")),
    // SemDeDup (Abbas et al. 2023): IVF-cluster-scoped pairwise cosine,
    // min-id survivor per near pair — pair join bounded by cluster size
    // tau=0.45 sits in the fixture's near-pair range (the synthetic
    // embeddings top out at cosine ~0.51; nearest pair is 5e-4 from the
    // threshold, so no cross-engine ulp flip) — production corpora with
    // real duplicates would run the operator default of 0.8
    // k=0 -> adaptive max(8, N/64) on BOTH engines: 8 clusters at the
    // sf0.01 correctness gate, 78 at the sf0.1 bench — cluster size (and
    // so the pair join) stays bounded at any scale
    "q_semdedup" -> Q(
      (s, dir) => Similarity.semDedup(rd(s, dir, "embeddings"), "vec_id", "embedding",
        k = 0, tau = 0.45).orderBy("vec_id"),
      Some(Similarity.semDedupSql(k = 0, tau = 0.45, dim = 64))),
    // Two-level SemDeDup: hierarchical coarse quantizer — sqrt(k) coarse
    // cells, per-cell fine seeds as broadcast DATA, HOF argmax. Same keep
    // rule; assignment cost N*2*sqrt(k) instead of flat N*k (the r15
    // forward-looking fix for k growing with the corpus)
    "q_semdedup_2l" -> Q(
      (s, dir) => Similarity.semDedupTwoLevel(rd(s, dir, "embeddings"), "vec_id",
        "embedding", k = 0, tau = 0.45).orderBy("vec_id"),
      Some(Similarity.semDedupTwoLevelSql(k = 0, tau = 0.45, dim = 64))),
    // Prototype selection for data pruning (Sorscher et al. 2022): top-16
    // most-prototypical vectors per adaptive IVF cluster
    "q_prototypes" -> Q(
      (s, dir) => Similarity.prototypesPerCluster(rd(s, dir, "embeddings"),
        "vec_id", "embedding", m = 16, k = 0).orderBy("vec_id"),
      Some(Similarity.prototypesSql(m = 16, k = 0, dim = 64))),

    // ----- LLM ops: text analysis -----
    "q_text_stats" -> Q(
      (s, dir) => graft.plans.Parallelism.widen(rd(s, dir, "documents")).select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        TextOps.stopwordCount(col("text")).as("n_stop"),
        TextOps.meanTokenLen(col("text")).as("mean_tok_len"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.langId(col("text")).as("lang_guess"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.bpeishCount(col("text")).as("n_bpeish")).orderBy("doc_id"),
      Some {
        s"""SELECT doc_id,
            ${TextOps.tokenCountSql("text")} AS n_tokens,
            length(text)::INT AS n_chars,
            ${TextOps.stopwordCountSql("text")} AS n_stop,
            ${TextOps.meanTokenLenSql("text")} AS mean_tok_len,
            ${TextOps.qualityScoreSql("text")} AS quality,
            ${TextOps.langIdSql("text")} AS lang_guess,
            ${TextOps.fingerprintSql("text")} AS fp,
            ${TextOps.bpeishCountSql("text")} AS n_bpeish
            FROM documents ORDER BY doc_id"""
      }),

    // PII scrubbing: synthetic PII is appended from doc_id (the corpus has
    // none), then scrubbed — the oracle applies the same construction, so
    // the compare exercises every pattern on every row
    // PII audit: per-pattern match counts on the raw text (the "how much
    // PII" report read before scrubbing)
    "q_pii_audit" -> Q(
      (s, dir) => {
        val augmented = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" ip 10.0.0."), (col("doc_id") % 200).cast("string"),
          lit(" call +1 555 010 1234"))
        val counts = TextOps.piiCounts(augmented).zip(TextOps.PiiCountNames)
          .map { case (c, n) => c.as(n) }
        rd(s, dir, "documents")
          .select((col("doc_id") +: counts): _*).orderBy("doc_id")
      },
      Some {
        val augmented = "(text || ' contact user' || doc_id::VARCHAR || '@example.com' || " +
          "' ip 10.0.0.' || (doc_id % 200)::VARCHAR || ' call +1 555 010 1234')"
        val counts = TextOps.piiCountsSql(augmented).zip(TextOps.PiiCountNames)
          .map { case (c, n) => s"${c} AS ${n}" }.mkString(", ")
        s"SELECT doc_id, ${counts} FROM documents ORDER BY doc_id"
      }),

    "q_pii_scrub" -> Q(
      (s, dir) => {
        val augmented = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
          lit(" ip 10.0.0."), (col("doc_id") % 200).cast("string"),
          lit(" call +1 555 010 1234"))
        rd(s, dir, "documents")
          .select(col("doc_id"), TextOps.piiScrub(augmented).as("scrubbed"))
          .orderBy("doc_id")
      },
      Some {
        val augmented = "(text || ' contact user' || doc_id::VARCHAR || '@example.com' || " +
          "' ip 10.0.0.' || (doc_id % 200)::VARCHAR || ' call +1 555 010 1234')"
        s"SELECT doc_id, ${TextOps.piiScrubSql(augmented)} AS scrubbed " +
          "FROM documents ORDER BY doc_id"
      }),

    // Model-based quality scoring (the CCNet/fastText-style classifier
    // stage): a zero-shuffle hashed linear scorer, and a naive-Bayes
    // log-odds classifier trained on heuristic seed labels and applied
    // in the same plan (top-V broadcastable vocabulary).
    "q_quality_hashlin" -> Q(
      (s, dir) => QualityClassifier.hashedLinearScore(
        rd(s, dir, "documents"), "doc_id", "text").orderBy("doc_id"),
      Some(QualityClassifier.hashedLinearScoreSql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),
    "q_quality_nb" -> Q(
      (s, dir) => QualityClassifier.nbQuality(
        rd(s, dir, "documents"), "doc_id", "text", topV = 4096).orderBy("doc_id"),
      Some(QualityClassifier.nbQualitySql("documents", "doc_id", "text", topV = 4096) +
        " ORDER BY doc_id")),
    // PR-curve points: cumulative tp/fp at threshold "score >= bucket",
    // exact integers (precision/recall stay caller-side fractions).
    "q_classifier_pr_curve" -> Q(
      (s, dir) => QualityClassifier.classifierPrCurve(
        QualityClassifier.nbQuality(rd(s, dir, "documents"), "doc_id", "text",
          topV = 4096),
        "seed_label", "score_nanonats").orderBy("bucket"),
      Some(QualityClassifier.classifierPrCurveSql(
        QualityClassifier.nbQualitySql("documents", "doc_id", "text", topV = 4096),
        "seed_label", "score_nanonats") + " ORDER BY bucket")),
    // Calibration-curve inputs: per score-bucket exact (n, n_pos) —
    // the integers a reliability diagram is drawn from.
    "q_classifier_calibration" -> Q(
      (s, dir) => QualityClassifier.classifierCalibration(
        QualityClassifier.nbQuality(rd(s, dir, "documents"), "doc_id", "text",
          topV = 4096),
        "seed_label", "score_nanonats").orderBy("bucket"),
      Some(QualityClassifier.classifierCalibrationSql(
        QualityClassifier.nbQualitySql("documents", "doc_id", "text", topV = 4096),
        "seed_label", "score_nanonats") + " ORDER BY bucket")),
    // Exact classifier evaluation: confusion counts at threshold 0 and
    // the AUC as an exact integer fraction (doubled Mann–Whitney U with
    // average ranks for ties) over the NB scorer's own output — no
    // float ever forms, so the metric is engine- and partition-exact.
    "q_classifier_eval" -> Q(
      (s, dir) => QualityClassifier.classifierEval(
        QualityClassifier.nbQuality(rd(s, dir, "documents"), "doc_id", "text",
          topV = 4096),
        "seed_label", "score_nanonats"),
      Some(QualityClassifier.classifierEvalSql(
        QualityClassifier.nbQualitySql("documents", "doc_id", "text", topV = 4096),
        "seed_label", "score_nanonats"))),

    // Gopher-style quality filter flags (Rae et al. 2021 heuristics)
    "q_quality_gopher" -> Q(
      (s, dir) => rd(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.alphaFrac(col("text")).as("alpha_frac"),
        TextOps.repetitionFrac(col("text")).as("rep_frac"),
        TextOps.gopherKeep(col("text")).as("keep")).orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              ${TextOps.tokenCountSql("text")} AS n_tokens,
              ${TextOps.alphaFracSql("text")} AS alpha_frac,
              ${TextOps.repetitionFracSql("text")} AS rep_frac,
              ${TextOps.gopherKeepSql("text")} AS keep
              FROM documents ORDER BY doc_id""")),

    // Corpus vocabulary top-k: map-side-combinable groupBy + TakeOrdered
    "q_token_topk" -> Q(
      (s, dir) => Corpus.tokenTopK(rd(s, dir, "documents"), "text", 50)
        .orderBy(desc("n"), col("token")),
      Some(Corpus.tokenTopKSql("documents", "text", 50))),

    // BM25 top-k retrieval: exact integer nano-nat scores (lnNano idf +
    // fraction-cleared tf factor via 128-bit integral division), so the
    // ranking is ulp-proof across engines
    "q_bm25_topk" -> Q(
      (s, dir) => Retrieval.bm25TopK(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("query_id", "rank"),
      Some(Retrieval.bm25TopKSql("documents", "doc_id", "text") +
        " ORDER BY query_id, rank")),

    // Corpus snapshot diff: snapshot B is derived from the fixture
    // IDENTICALLY in both engines (drop %17 ids, append ' v2' to %13
    // texts, add synthetic %23 ids) so added/removed/changed all occur
    "q_snapshot_diff" -> Q(
      (s, dir) => {
        val docs = rd(s, dir, "documents").select("doc_id", "text", "source")
        Corpus.snapshotDiff(docs.select("doc_id", "text"), snapshotB(docs),
          "doc_id", "text").orderBy("doc_id")
      },
      Some(Corpus.snapshotDiffSql("documents", SnapshotBSql, "doc_id", "text") +
        " ORDER BY doc_id")),

    // Incremental index maintenance over the same snapshot pair: reuse
    // stored signatures for unchanged docs, recompute only the delta —
    // the oracle is a FULL REBUILD of the new snapshot's index, so the
    // row-equality check IS the lossless-ness proof
    "q_incremental_minhash" -> Q(
      (s, dir) => {
        val docs = rd(s, dir, "documents").select("doc_id", "text", "source")
        Dedup.incrementalMinhashIndex(docs.select("doc_id", "text"), snapshotB(docs),
          "doc_id", "text").orderBy("doc_id")
      },
      Some(Dedup.fullMinhashIndexSql(SnapshotBSql, "doc_id", "text") +
        " ORDER BY doc_id")),

    // PMI collocations: integer nano-nat PMI over a fused unigram∪bigram
    // gram stream — one corpus pass, Zipf-small checkpointed freq table
    "q_pmi_collocations" -> Q(
      (s, dir) => Corpus.pmiCollocations(rd(s, dir, "documents"), "text"),
      Some(Corpus.pmiCollocationsSql("documents", "text"))),

    // Per-source vocabulary heavy hitters (WindowGroupLimit top-k per group)
    "q_heavy_hitters" -> Q(
      (s, dir) => Corpus.heavyHittersPerGroup(rd(s, dir, "documents"), "source", "text", 10)
        .orderBy("source", "rank"),
      Some(Corpus.heavyHittersPerGroupSql("documents", "source", "text", 10) +
        " ORDER BY source, rank")),

    // Per-doc characteristic terms (integer tf/df projection of TF-IDF)
    "q_tfidf_topterms" -> Q(
      (s, dir) => Corpus.topTermsPerDoc(rd(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id", "rank"),
      Some(Corpus.topTermsPerDocSql("documents", "doc_id", "text", 3) +
        " ORDER BY doc_id, rank")),

    // CCNet-style boilerplate-line removal: the fixture docs are
    // single-line, so the query builds a line-structured doc from fixture
    // columns IDENTICALLY in both engines — a per-source header and a
    // global footer (boilerplate by construction, shared across >= minDocs
    // docs) around two body lines cut from the doc's own text
    "q_boilerplate_lines" -> Q(
      (s, dir) => {
        val synthetic = rd(s, dir, "documents").select(col("doc_id"),
          concat_ws("\n", concat(lit("source: "), col("source")),
            substring(col("text"), 1, 40), substring(col("text"), 41, 40),
            lit("subscribe to our newsletter")).as("text"))
        Corpus.removeBoilerplateLines(synthetic, "doc_id", "text", minDocs = 10)
          .orderBy("doc_id")
      },
      Some(Corpus.removeBoilerplateLinesSql(
        """SELECT doc_id, 'source: ' || source || chr(10) ||
           substr(text, 1, 40) || chr(10) || substr(text, 41, 40) || chr(10) ||
           'subscribe to our newsletter' AS text FROM documents""",
        "doc_id", minDocs = 10) + " ORDER BY doc_id")),

    // Within-doc repeated-line removal (keep first occurrence, preserve
    // order): synthetic doc repeats two of its own lines
    "q_dedup_lines_within" -> Q(
      (s, dir) => {
        val synthetic = concat_ws("\n", substring(col("text"), 1, 30),
          lit("repeated nav block"), substring(col("text"), 31, 30),
          lit("repeated nav block"), substring(col("text"), 1, 30))
        rd(s, dir, "documents")
          .select(col("doc_id"), TextOps.dedupLines(synthetic).as("clean_text"))
          .orderBy("doc_id")
      },
      Some {
        val synthetic = "substr(text, 1, 30) || chr(10) || 'repeated nav block' || " +
          "chr(10) || substr(text, 31, 30) || chr(10) || 'repeated nav block' || " +
          "chr(10) || substr(text, 1, 30)"
        s"SELECT doc_id, ${TextOps.dedupLinesSql(synthetic)} AS clean_text " +
          "FROM documents ORDER BY doc_id"
      }),

    // Per-doc bigram novelty vs the corpus (exact integer projection)
    "q_bigram_novelty" -> Q(
      (s, dir) => Corpus.bigramNovelty(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(Corpus.bigramNoveltySql("documents", "doc_id", "text") +
        " ORDER BY doc_id")),

    // Rank-based per-language length outliers: integer rank cutoffs, no
    // float percentile — exact in both engines
    "q_length_outliers" -> Q(
      (s, dir) => Corpus.lengthOutliers(rd(s, dir, "documents"), "doc_id", "lang",
        "n_chars", loPct = 5, hiPct = 95).orderBy("doc_id"),
      Some(Corpus.lengthOutliersSql("documents", "doc_id", "lang", "n_chars",
        loPct = 5, hiPct = 95) + " ORDER BY doc_id")),

    // Per-doc unigram corpus-frequency stats (integer projection of a
    // unigram-LM fluency score — exact, so fully oracle-comparable)
    "q_unigram_stats" -> Q(
      (s, dir) => Corpus.unigramStats(rd(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id"),
      Some(Corpus.unigramStatsSql("documents", "doc_id", "text") + " ORDER BY doc_id")),

    // KMV distinct sketch: deterministic under the shared hash, so the
    // ESTIMATE itself is oracle-comparable (as is the register-HLL below,
    // built on the same salted u60 stream)
    "q_sketch_kmv" -> Q(
      (s, dir) => Corpus.kmvDistinct(rd(s, dir, "lineitem"), "l_partkey", 256),
      Some(Corpus.kmvDistinctSql("lineitem", "l_partkey", 256))),

    // HLL-style 64-register sketch: per-source distinct-token estimates
    // plus the __union__ row merged register-wise (the mergeability that
    // matters at 100 TB: shard sketches combine by element-wise max, no
    // rescan). Deterministic hash -> the estimate oracle-compares.
    "q_sketch_hll" -> Q(
      (s, dir) => Sketches.hllDistinct(
        rd(s, dir, "documents")
          .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok")),
        "source", "tok").orderBy("grp"),
      Some(Sketches.hllDistinctSql(
        "(SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)",
        "source", "tok") + " ORDER BY grp")),

    // Count-min sketch: 4x256 counter grid over the token stream, point
    // estimates for a fixed probe set vs exact counts (est >= exact by
    // construction; the absent probe exercises the zero path)
    "q_sketch_cms" -> Q(
      (s, dir) => Sketches.cmsEstimate(
        rd(s, dir, "documents")
          .select(explode(TextOps.tokens(col("text"))).as("tok")),
        "tok", cmsProbeTokens).orderBy("probe"),
      Some(Sketches.cmsEstimateSql(
        "(SELECT unnest(string_split(text, ' ')) AS tok FROM documents)",
        "tok", cmsProbeTokens) + " ORDER BY probe")),

    // Bottom-k-by-hash sample quantiles: deterministic uniform sample
    // (mergeable like KMV — bottom-k of shard bottom-k's), exact rank
    // rule over the sample; WindowGroupLimit keeps the shuffle k-bounded
    "q_sketch_quantile" -> Q(
      (s, dir) => Sketches.sampleQuantiles(rd(s, dir, "documents"),
        "source", "doc_id", "n_chars", k = 64).orderBy("grp", "pct"),
      Some(Sketches.sampleQuantilesSql("documents", "source", "doc_id",
        "n_chars", k = 64) + " ORDER BY grp, pct")),

    // Config-driven curation chain (normalize -> exact-dedup rep ->
    // length filter -> hash sample), the declarative composition surface
    // of llm/CuratePipeline — oracle renders the same chain in SQL
    "q_curate_pipeline" -> Q(
      (s, dir) => {
        import graft.llm.CuratePipeline.{Config, Step}
        val cfg = Config("documents", "doc_id", "text", Seq(
          Step("normalize", Map.empty),
          Step("dedup_exact", Map.empty),
          Step("length_filter", Map("min_tokens" -> "3", "max_tokens" -> "10000")),
          Step("sample_hash", Map("rate" -> "2"))), report = false)
        graft.llm.CuratePipeline.run(cfg, t => rd(s, dir, t))._1
          .select("doc_id", "text").orderBy("doc_id")
      },
      Some {
        val norm = TextOps.normalizeSql("text")
        s"""WITH n AS (
              SELECT doc_id, ${norm} AS text FROM documents
            ), d AS (
              SELECT doc_id, text FROM (
                SELECT doc_id, text, row_number() OVER (
                  PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM n)
              WHERE rn = 1
            ), l AS (
              SELECT doc_id, text FROM d
              WHERE ${TextOps.tokenCountSql("text")} BETWEEN 3 AND 10000
            )
            SELECT doc_id, text FROM l
            WHERE ${Sampling.hashSampleSql("doc_id", 2)}
            ORDER BY doc_id"""
      }),

    // Morton (Z-order) interleaved layout key — the multi-dimensional
    // file-skipping sort key (see ops/ZOrder.writeZOrdered); pure integer
    // shift/mask ladder, identical in both engines
    // ORDER BY must be TOTAL (include z): lineitem's (orderkey,
    // linenumber) is not unique in the fixtures, and the sf1 rehearsal's
    // multi-file layout exposed the tie-order divergence the single-file
    // driver fixtures masked (both engines' stable sorts happened to
    // agree on one file's read order)
    "q_zorder_key" -> Q(
      (s, dir) => rd(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          graft.ops.ZOrder.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
        .orderBy("l_orderkey", "l_linenumber", "z"),
      Some(s"""SELECT l_orderkey, l_linenumber,
          ${graft.ops.ZOrder.zValueSql("l_partkey", "l_suppkey")} AS z
          FROM lineitem ORDER BY l_orderkey, l_linenumber, z""")),

    // Ordered-funnel match over the event stream (strict-after step
    // semantics; one shuffle on the user key, per-user HOF fold)
    "q_funnel_steps" -> Q(
      (s, dir) => graft.ops.Funnel.steps(rd(s, dir, "events"), "user_id",
        expr("unix_micros(cast(ts as timestamp))"), "event_type",
        funnelStepTypes).orderBy("user_id"),
      Some(graft.ops.Funnel.stepsSql("events", "user_id", "epoch_us(e.ts)",
        "event_type", funnelStepTypes) + " ORDER BY user_id")),

    // Same funnel with the per-user event cap that bounds group state at
    // scale (WindowGroupLimit prefilter: first 50 events per user by
    // (ts, type) — bites here, users carry 49-86 events at sf0.01)
    "q_funnel_steps_capped" -> Q(
      (s, dir) => graft.ops.Funnel.steps(rd(s, dir, "events"), "user_id",
        expr("unix_micros(cast(ts as timestamp))"), "event_type",
        funnelStepTypes, maxEventsPerUser = 50).orderBy("user_id"),
      Some(graft.ops.Funnel.stepsSql(
        graft.ops.Funnel.cappedEventsSql("events", "user_id",
          "epoch_us(ts)", "event_type", 50),
        "user_id", "epoch_us(e.ts)", "event_type", funnelStepTypes) +
        " ORDER BY user_id")),

    // Composition: sessionize -> funnel per SESSION (operators chain —
    // the funnel key is the (user, session) pair)
    "q_funnel_sessions" -> Q(
      (s, dir) => {
        val ev = rd(s, dir, "events")
          .withColumn("tsu", expr("unix_micros(cast(ts as timestamp))"))
        val sess = graft.ops.Sessionize.sessions(ev, "user_id",
            expr("tsu div 1000000"), "event_id", gapSec = 3600)
          .withColumn("usess", col("user_id") * lit(100000L) + col("session_id"))
        graft.ops.Funnel.steps(sess, "usess", col("tsu"), "event_type",
          funnelStepTypes).orderBy(col("user_id"))
      },
      Some(graft.ops.Funnel.stepsSql(
        "(" + graft.ops.Sessionize.sessionsSql("events", "user_id",
          "(epoch_ns(ts) // 1000000000)", "event_id", 3600,
          "user_id * 100000 + session_id AS usess, epoch_us(ts) AS tsu, event_type") + ")",
        "usess", "e.tsu", "event_type", funnelStepTypes) + " ORDER BY user_id")),

    // Per-step matched times of the funnel fold (raw conversion relation)
    "q_funnel_times" -> Q(
      (s, dir) => graft.ops.Funnel.stepTimes(rd(s, dir, "events"), "user_id",
        expr("unix_micros(cast(ts as timestamp))"), "event_type",
        funnelStepTypes).orderBy("user_id", "step"),
      Some(graft.ops.Funnel.stepTimesSql("events", "user_id", "epoch_us(e.ts)",
        "event_type", funnelStepTypes) + " ORDER BY user_id, step")),

    // Conversion-latency quantiles per step (stepTimes -> lag -> exact
    // group-quantile rank rule)
    "q_funnel_latency" -> Q(
      (s, dir) => graft.ops.Funnel.conversionLatency(rd(s, dir, "events"),
        "user_id", expr("unix_micros(cast(ts as timestamp))"), "event_type",
        funnelStepTypes).orderBy("step", "pct"),
      Some(graft.ops.Funnel.conversionLatencySql("events", "user_id",
        "epoch_us(e.ts)", "event_type", funnelStepTypes) +
        " ORDER BY step, pct")),

    // Funnel conversion summary: users reaching each step (one aggregate
    // over the step-times relation)
    "q_funnel_conversion" -> Q(
      (s, dir) => graft.ops.Funnel.stepTimes(rd(s, dir, "events"), "user_id",
          expr("unix_micros(cast(ts as timestamp))"), "event_type", funnelStepTypes)
        .groupBy("step").agg(count(lit(1)).as("n_users")).orderBy("step"),
      Some("SELECT step::BIGINT AS step, count(*)::BIGINT AS n_users FROM (" +
        graft.ops.Funnel.stepTimesSql("events", "user_id", "epoch_us(e.ts)",
          "event_type", funnelStepTypes) + ") GROUP BY step ORDER BY step")),

    // NATIVE session-window aggregate (Spark's built-in session_window —
    // the engine-preferred form of the custom Sessionize op; merge rule:
    // events strictly inside the gap extend the session, so a gap-equal
    // arrival starts a NEW session — mirrored by >= in the oracle)
    "q_session_window" -> Q(
      (s, dir) => rd(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts").cast("timestamp"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          expr("unix_micros(w.start)").as("sess_start"),
          expr("unix_micros(w.end)").as("sess_end"), col("n"))
        .orderBy("user_id", "sess_start"),
      Some("""WITH e AS (
            SELECT user_id, epoch_us(ts) AS t FROM events
          ), f AS (
            SELECT user_id, t,
              CASE WHEN lag(t) OVER w IS NULL
                     OR t - lag(t) OVER w >= 3600000000 THEN 1 ELSE 0 END AS ns
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
          ), s AS (
            SELECT user_id, t, sum(ns) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
          SELECT user_id, min(t) AS sess_start,
                 max(t) + 3600000000 AS sess_end, count(*)::BIGINT AS n
          FROM s GROUP BY user_id, sid ORDER BY user_id, sess_start""")),

    // Event-rate anomaly detection: hourly counts per type -> robust MAD
    // outlier flags (composition of the windowed-count and MAD ops)
    "q_event_anomaly" -> Q(
      (s, dir) => {
        val counts = rd(s, dir, "events")
          .select(col("event_type"),
            expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("hour"))
          .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
        Corpus.madOutliers(counts, "hour", "event_type", "n", k = 3)
          .orderBy("event_type", "hour")
      },
      Some(Corpus.madOutliersSql(
        """(SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
             count(*)::BIGINT AS n FROM events GROUP BY 1, 2)""",
        "hour", "event_type", "n", k = 3) + " ORDER BY event_type, hour")),

    // Markov event-transition matrix (lag window -> pair counts ->
    // integer nano probabilities)
    "q_event_transitions" -> Q(
      (s, dir) => graft.ops.Funnel.eventTransitions(rd(s, dir, "events"),
        "user_id", expr("unix_micros(cast(ts as timestamp))"), "event_id",
        "event_type").orderBy("prev_type", "next_type"),
      Some(graft.ops.Funnel.eventTransitionsSql("events", "user_id",
        "epoch_us(ts)", "event_id", "event_type") +
        " ORDER BY prev_type, next_type")),

    // Weekly cohort retention (integer week arithmetic, two aggregates)
    "q_cohort_retention" -> Q(
      (s, dir) => graft.ops.Funnel.cohortRetention(rd(s, dir, "events"), "user_id",
        expr("unix_micros(cast(ts as timestamp))"))
        .orderBy("cohort_week", "week_offset"),
      Some(graft.ops.Funnel.cohortRetentionSql("events", "user_id", "epoch_us(ts)") +
        " ORDER BY cohort_week, week_offset")),

    // Benchmark-contamination: docs sharing a word trigram with the probe
    // set (broadcast semi-join on exploded shingles)
    "q_contamination" -> Q(
      (s, dir) => Corpus.contaminatedIds(rd(s, dir, "documents"), "doc_id", "text",
        Corpus.probeShingles("key agg row scan slow fast")).orderBy("doc_id"),
      Some(Corpus.contaminatedIdsSql("documents", "doc_id", "text",
        Corpus.probeShingles("key agg row scan slow fast")) + " ORDER BY doc_id")),

    "q_contamination_frac" -> Q(
      (s, dir) => Corpus.contaminationFraction(rd(s, dir, "documents"), "doc_id", "text",
        Corpus.probeShingles("key agg row scan slow fast")).orderBy("doc_id"),
      Some(Corpus.contaminationFractionSql("documents", "doc_id", "text",
        Corpus.probeShingles("key agg row scan slow fast")) + " ORDER BY doc_id")),

    // Corpus drift: Jensen-Shannon divergence between two sources'
    // unigram distributions, exact integer nano rendering
    "q_corpus_drift" -> Q(
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        Corpus.jsDivergence(
          docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 =!= 0), "text")
      },
      Some(Corpus.jsDivergenceSql(
        "SELECT text FROM documents WHERE doc_id % 2 = 0",
        "SELECT text FROM documents WHERE doc_id % 2 <> 0", "text"))),

    "q_rolling_fp" -> Q(
      (s, dir) => rd(s, dir, "documents")
        .select(col("doc_id"), TextOps.rollingFingerprint(col("text")).as("roll_fp"))
        .orderBy("doc_id"),
      Some(s"SELECT doc_id, ${TextOps.rollingFingerprintSql("text")} AS roll_fp " +
        "FROM documents ORDER BY doc_id")),

    // ----- LLM ops: multimodal plumbing (decode STUBbed, shape real) -----
    "q_multimodal_features" -> Q(
      (s, dir) => Multimodal.extractFeatures(
        Multimodal.asMedia(rd(s, dir, "documents"), "doc_id", "text")).toDF()
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image'
                   WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
              octet_length(encode(text))::INT AS n_bytes,
              ((octet_length(encode(text))::BIGINT * 7) % 1024 + 1)::INT AS width,
              ((octet_length(encode(text))::BIGINT * 5) % 768 + 1)::INT AS height,
              printf('%016x', octet_length(encode(text))::BIGINT) AS checksum
              FROM documents ORDER BY media_id""")),
    // Opt-in external video decode: payloads stream base64-encoded through
    // a user-supplied decoder process (ffmpeg/ffprobe wrapper; here a
    // python stand-in that reports decoded byte count as width, proving
    // the payload crosses the boundary intact) — the Cmd-pipe-as-codec
    // path that closes the no-JDK-video-codec gap
    "q_video_external" -> Q(
      (s, dir) => {
        val script =
          """import sys, base64
            |for l in sys.stdin:
            |    b = base64.b64decode(l.strip())
            |    print(len(b), 240, 12, 0.5)
            |    sys.stdout.flush()
            |""".stripMargin
        Multimodal.decodeVideoExternal(
            Multimodal.asMedia(rd(s, dir, "documents"), "doc_id", "text"),
            Seq("python3", "-c", script)).toDF()
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, octet_length(encode(text))::INT AS width,
              240 AS height, 12::BIGINT AS n_frames, 0.5 AS duration_sec
              FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id"""))
  )

  /** Flagship: the t1 end-to-end slice — config -> plan -> masked customer
    * (sf0.001); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    Planner.plan(df, TableConfig("customer",
      when = Some("c_custkey >= 0"),
      transforms = Seq(
        ColumnTransform("c_name", Masking("name")),
        ColumnTransform("c_nationkey", RandomInt(0, 24)),
        ColumnTransform("c_acctbal", NoiseFloat(0.1, 2)),
        ColumnTransform("c_mktsegment", Dict(
          Map("AUTOMOBILE" -> "CARS"), default = Some("OTHER"))))))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.view.mapValues(_.fn).toMap

  /** DuckDB-equivalent SQL for each oracle-expressible query. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, q) if q.sql.isDefined => k -> q.sql.get.linesIterator.map(_.trim).mkString(" ") }
}
