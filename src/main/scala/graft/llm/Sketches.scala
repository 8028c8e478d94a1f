package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.generators.{Gen, OracleGen}

/** Mergeable distributed sketches — the aggregation primitives a 100 TB
  * pipeline leans on when exact distinct/frequency state would not fit:
  * both sketches here reduce to a FIXED-size state (64 registers / a
  * 4x256 counter grid) under a map-side-combinable `groupBy`, so the
  * exchange carries O(sketch) rows per partition regardless of input
  * volume, and sketches for different partitions/sources/days merge by
  * pure element-wise max (HLL) or sum (CMS) — the property that lets a
  * 1000-executor cluster aggregate per-shard sketches instead of
  * re-scanning raw data.
  *
  * Everything is DETERMINISTIC: the hash is the engine's salted u60
  * stream (`generators/Gen.scala`), never Spark's `hash()` or a PRNG, so
  * estimates are reproducible across partitionings AND renderable in
  * DuckDB for the oracle (same md5-based stream on both sides; see
  * `OracleGen`). Estimation arithmetic stays in INTEGERS until one final
  * double division, so there is no float-summation-order hazard.
  *
  * Reference analog: the reference keeps no sketch state (its
  * validate/metadata stage counts exactly); these are engine additions
  * for corpus-statistics work at scales where exact counting is a
  * shuffle-size hazard.
  */
object Sketches {

  // ---------------------------------------------------------------------
  // HyperLogLog-style register sketch (m = 64 registers, u60 stream)
  // ---------------------------------------------------------------------

  /** Register count. 64 keeps the sketch tiny and the rank arithmetic
    * fully inside the 60-bit hash: reg = h % 64, w = h / 64 (54 bits). */
  val HllM = 64

  /** Rank of the 54-bit suffix w: leading zeros + 1, i.e. 55 -
    * bit_length(w); w = 0 -> 55. Integer-only via the binary-string
    * length (both engines render minimal-width binary). */
  private def hllRank(w: Column): Column =
    when(w === 0L, lit(55)).otherwise(lit(55) - length(bin(w)))

  private def hllRankSql(w: String): String =
    s"(CASE WHEN ${w} = 0 THEN 55 ELSE 55 - length(bin(${w}))::INT END)"

  /** alpha_m * m^2 * 2^55 — the numerator of the raw HLL estimate over
    * the integer register sum (each register j contributes the integer
    * 2^(55 - M_j), empty registers M_j = 0). Rendered as ONE double
    * literal injected into both the Spark plan and the oracle SQL, so the
    * final division is the only float op and is bit-identical. */
  val HllNumerator: Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / HllM)
    alpha * HllM * HllM * math.pow(2.0, 55)
  }

  /** Small-range threshold: below 2.5m the raw estimator is biased and
    * linear counting over the empty-register count takes over (the
    * standard HLL correction). */
  val HllSmallRange: Double = 2.5 * HllM

  /** ln(m) in integer nano-nats — the constant side of the linear-count
    * formula m * ln(m / V), rendered identically in both engines. */
  val LnMNano: Long = math.floor(math.log(HllM.toDouble) * 1e9 + 0.5).toLong

  /** Per-group distinct-count sketch over `valueCol`, plus a `__union__`
    * row demonstrating the merge property (element-wise register max
    * across groups — NOT a rescan). Output: (group, hll_regsum BIGINT,
    * n_empty BIGINT, hll_est_milli BIGINT = floor(est*1000 + 0.5)).
    *
    * Float parity: the raw branch is ONE double division of an injected
    * literal by the integer register sum; the linear-counting branch is
    * integer nano-nat differences (the repo's lnNano pattern) divided by
    * exact powers of ten — every float op is an identical, correctly-
    * rounded chain in both engines, so the milli-quantized estimate
    * hash-compares.
    *
    * Plan shape: one exchange keyed (group, reg) with partial max below
    * it (<= groups x 64 rows per partition after combine), then a
    * groups-sized final aggregate. The union row reuses the per-group
    * registers — merging sketches never touches the raw data again.
    */
  def hllDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  tweak: String = "hll"): DataFrame = {
    val h = Gen.u60(col(valueCol), tweak)
    // w = h div 64 via an exact shift — `h / 64` would be a DOUBLE
    // division, and a 54-bit quotient can round across a bit-length
    // boundary, silently disagreeing with the oracle's integer `//`
    val perReg = df
      .select(col(groupCol).as("grp"), (h % HllM).as("reg"),
        shiftright(h, 6).as("w"))
      .groupBy("grp", "reg")
      .agg(max(hllRank(col("w"))).as("rank"))
    // union registers = max over groups, same 64-row relation
    val unionReg = perReg.groupBy("reg").agg(max("rank").as("rank"))
      .withColumn("grp", lit("__union__"))
    val allReg = perReg.unionByName(unionReg.select("grp", "reg", "rank"))
    // integer register sum; absent registers contribute 2^55 each
    val summed = allReg.groupBy("grp")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 55 - rank)")).as("present_sum"),
        count(lit(1)).as("n_present"))
      .select(col("grp"),
        (col("present_sum") + (lit(HllM.toLong) - col("n_present")) * lit(1L << 55))
          .as("hll_regsum"),
        (lit(HllM.toLong) - col("n_present")).as("n_empty"))
    val rawEst = lit(HllNumerator) / col("hll_regsum").cast("double")
    val lnVNano = floor(log(col("n_empty").cast("double")) * lit(1e9) + lit(0.5))
      .cast("long")
    val linEst = (lit(HllM.toLong) * (lit(LnMNano) - lnVNano)).cast("double") / lit(1e9)
    val est = when(col("n_empty") === 0L || rawEst > HllSmallRange, rawEst)
      .otherwise(linEst)
    summed.withColumn("hll_est_milli",
      floor(est * lit(1000.0) + lit(0.5)).cast("long"))
  }

  /** DuckDB rendering — same registers, same integer sum, same float
    * chain on both branches. */
  def hllDistinctSql(table: String, groupCol: String, valueSql: String,
                     tweak: String = "hll"): String = {
    val h = OracleGen.u60("v", tweak)
    s"""WITH vals AS (
          SELECT ${groupCol} AS grp, ${valueSql} AS v FROM ${table}
        ), hashed AS (
          SELECT grp, (${h}) % ${HllM} AS reg, (${h}) // ${HllM} AS w FROM vals
        ), per_reg AS (
          SELECT grp, reg, max(${hllRankSql("w")}) AS rank
          FROM hashed GROUP BY grp, reg
        ), union_reg AS (
          SELECT '__union__' AS grp, reg, max(rank) AS rank FROM per_reg GROUP BY reg
        ), all_reg AS (
          SELECT * FROM per_reg UNION ALL SELECT * FROM union_reg
        ), summed AS (
          SELECT grp,
            (sum((1::BIGINT << (55 - rank))::BIGINT)
             + (${HllM} - count(*)) * (1::BIGINT << 55))::BIGINT AS hll_regsum,
            (${HllM} - count(*))::BIGINT AS n_empty
          FROM all_reg GROUP BY grp
        ), est AS (
          SELECT grp, hll_regsum, n_empty,
            CASE WHEN n_empty = 0
                   OR ${HllNumerator} / hll_regsum::DOUBLE > ${HllSmallRange}
              THEN ${HllNumerator} / hll_regsum::DOUBLE
              ELSE (${HllM} * (${LnMNano} - floor(ln(n_empty::DOUBLE) * 1e9 + 0.5)::BIGINT))::DOUBLE / 1e9
            END AS e
          FROM summed
        )
        SELECT grp, hll_regsum, n_empty,
          floor(e * 1000.0 + 0.5)::BIGINT AS hll_est_milli
        FROM est"""
  }

  /** Sketch algebra: distinct-key overlap of two relations by
    * inclusion–exclusion over the register sketches — |A∩B| est =
    * est(A) + est(B) − est(A∪B), with the union estimated from the
    * register-wise max (never a rescan or a join). One row:
    * (est_a_milli, est_b_milli, est_union_milli, est_overlap_milli);
    * overlap is an integer difference of the milli estimates, so the
    * algebra adds no float risk. Small negatives are sketch noise. */
  def hllOverlap(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                 tweak: String = "hll"): DataFrame = {
    val tagged = a.select(lit("a").as("grp"), col(aCol).cast("string").as("v"))
      .unionByName(b.select(lit("b").as("grp"), col(bCol).cast("string").as("v")))
    val ests = hllDistinct(tagged, "grp", "v", tweak)
    def pick(g: String) = sum(when(col("grp") === g, col("hll_est_milli"))
      .otherwise(lit(0L)))
    ests.agg(pick("a").as("est_a_milli"), pick("b").as("est_b_milli"),
        pick("__union__").as("est_union_milli"))
      .withColumn("est_overlap_milli",
        col("est_a_milli") + col("est_b_milli") - col("est_union_milli"))
  }

  /** @param aSql / bSql: subqueries each yielding one column aliased `v` */
  def hllOverlapSql(aSql: String, bSql: String, tweak: String = "hll"): String = {
    val tagged = s"(SELECT 'a' AS grp, v::VARCHAR AS v FROM (${aSql})" +
      s" UNION ALL SELECT 'b' AS grp, v::VARCHAR AS v FROM (${bSql}))"
    def pick(g: String) =
      s"sum(CASE WHEN grp = '${g}' THEN hll_est_milli ELSE 0 END)::BIGINT"
    s"""WITH ests AS (${hllDistinctSql(tagged, "grp", "v", tweak)})
        SELECT ${pick("a")} AS est_a_milli, ${pick("b")} AS est_b_milli,
               ${pick("__union__")} AS est_union_milli,
               (${pick("a")} + ${pick("b")} - ${pick("__union__")})::BIGINT
                 AS est_overlap_milli
        FROM ests"""
  }

  // ---------------------------------------------------------------------
  // Bottom-k sample quantiles (deterministic uniform sample, mergeable)
  // ---------------------------------------------------------------------

  /** Quantile estimates from a DETERMINISTIC uniform sample: the k rows
    * with the smallest u60(id) per group are a uniform random sample of
    * the group under the hash's uniformity — and a MERGEABLE one (the
    * bottom-k of a union is the bottom-k of the parts' bottom-k's, so
    * shard samples combine without a rescan — same family as the KMV
    * sketch, carrying sampled VALUES instead of hash ranks). Quantiles
    * over the sample use the engine's exact lower-quantile rank rule.
    *
    * Scale shape: the rank filter is a WindowGroupLimit — Spark pushes
    * the row_number <= k bound below the exchange as per-partition
    * top-k heaps, so the shuffle carries at most k rows per (partition,
    * group), never the full table. The second window runs on the
    * k-bounded sample. Output: (grp, pct, est_value, sample_n).
    */
  /** The k rows with the smallest u60(id) per group: a deterministic
    * uniform sample, mergeable by re-sampling the union of shard
    * samples. Output (groupCol, idCol, v) — the sample rows themselves. */
  def bottomKSample(df: DataFrame, groupCol: String, idCol: String,
                    valueCol: String, k: Int, tweak: String = "sq"): DataFrame = {
    val wSamp = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__h"), col(idCol))
    df.select(col(groupCol), col(idCol), col(valueCol).as("v"),
        Gen.u60(col(idCol), tweak).as("__h"))
      .withColumn("__rk", row_number().over(wSamp))
      .filter(col("__rk") <= k)
      .select(col(groupCol), col(idCol), col("v"))
  }

  def sampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
                      valueCol: String, k: Int,
                      pcts: Seq[Int] = Seq(25, 50, 75, 90),
                      tweak: String = "sq"): DataFrame = {
    require(k > 0 && pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "sampleQuantiles: k > 0, percentiles in [1,100]")
    val sample = bottomKSample(df, groupCol, idCol, valueCol, k, tweak)
    val wVal = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("v"), col(idCol))
    // __-reserved internals: a group/id column literally named "n" or
    // "vrk" must not be captured by the window rank/count
    sample
      .withColumn("__vrk", row_number().over(wVal))
      .withColumn("__wn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
      .select(col(groupCol).as("grp"), col("v"), col("__vrk"), col("__wn"),
        explode(array(pcts.map(lit): _*)).as("pct"))
      .filter(col("__vrk") === expr("(__wn * pct + 99) div 100"))
      .select(col("grp"), col("pct"), col("v").as("est_value"),
        col("__wn").as("sample_n"))
  }

  def sampleQuantilesSql(table: String, groupCol: String, idCol: String,
                         valueSql: String, k: Int,
                         pcts: Seq[Int] = Seq(25, 50, 75, 90),
                         tweak: String = "sq"): String = {
    val h = OracleGen.u60(idCol, tweak)
    s"""WITH src AS (
          SELECT ${groupCol} AS grp, ${idCol} AS id, ${valueSql} AS v,
                 ${h} AS h FROM ${table}
        ), samp AS (
          SELECT grp, id, v,
                 row_number() OVER (PARTITION BY grp ORDER BY h, id) AS rk
          FROM src
        ), kept AS (
          SELECT grp, id, v FROM samp WHERE rk <= ${k}
        ), ranked AS (
          SELECT grp, v,
                 row_number() OVER (PARTITION BY grp ORDER BY v, id) AS vrk,
                 count(*) OVER (PARTITION BY grp) AS n
          FROM kept
        )
        SELECT grp, pct, v AS est_value, n::BIGINT AS sample_n FROM (
          SELECT grp, v, vrk, n, unnest([${pcts.mkString(", ")}]) AS pct
          FROM ranked)
        WHERE vrk = (n * pct + 99) // 100"""
  }

  // ---------------------------------------------------------------------
  // Count-min sketch (depth x width counter grid, u60 streams)
  // ---------------------------------------------------------------------

  val CmsDepth = 4
  val CmsWidth = 256

  /** Build the CMS counter grid over `valueCol`: one row per (depth row,
    * bucket) with the collision-summed count. The exchange is keyed on a
    * bounded 4x256 space with partial sums below it — per-partition
    * combine emits <= 1024 rows no matter the input size, the defining
    * CMS property. */
  def cmsBuild(df: DataFrame, valueCol: String, tweak: String = "cms"): DataFrame = {
    // ONE pass: each row explodes to its 4 (depth, bucket) cells in-line —
    // a 4-way union would scan the source once per depth row
    val cells = array((0 until CmsDepth).map { j =>
      struct(lit(j).as("depth"),
        (Gen.u60(col(valueCol), s"$tweak$j") % CmsWidth).as("bucket"))
    }: _*)
    df.select(explode(cells).as("cell"))
      .select(col("cell.depth").as("depth"), col("cell.bucket").as("bucket"))
      .groupBy("depth", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates for `probes` against the sketch, next to
    * the exact counts: (probe, cms_est, exact_cnt). cms_est >= exact_cnt
    * always (collisions only inflate), which the spec asserts. The probe
    * side is a literal values relation — broadcast, never a shuffle. */
  def cmsEstimate(df: DataFrame, valueCol: String, probes: Seq[String],
                  tweak: String = "cms"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = cmsBuild(df, valueCol, tweak)
    val probeRows = probes.toDF("probe")
      .select(col("probe"), explode(array((0 until CmsDepth).map(lit): _*)).as("depth"))
      .withColumn("bucket",
        (0 until CmsDepth).foldLeft(lit(-1L)) { (acc, j) =>
          when(col("depth") === j, Gen.u60(col("probe"), s"$tweak$j") % CmsWidth)
            .otherwise(acc)
        })
    val est = probeRows.join(broadcast(sketch), Seq("depth", "bucket"), "left")
      .groupBy("probe").agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
    val exact = df.filter(col(valueCol).isin(probes: _*))
      .groupBy(col(valueCol).as("probe")).agg(count(lit(1)).as("exact_cnt"))
    est.join(exact, Seq("probe"), "left")
      .select(col("probe"), col("cms_est"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
  }

  def cmsEstimateSql(table: String, valueSql: String, probes: Seq[String],
                     tweak: String = "cms"): String = {
    val probeVals = probes.map(p => s"('${p.replace("'", "''")}')").mkString(", ")
    val sketchRows = (0 until CmsDepth).map { j =>
      s"SELECT ${j} AS depth, (${OracleGen.u60("v", tweak + j)}) % ${CmsWidth} AS bucket FROM vals"
    }.mkString(" UNION ALL ")
    val probeBuckets = (0 until CmsDepth).map { j =>
      s"SELECT probe, ${j} AS depth, (${OracleGen.u60("probe", tweak + j)}) % ${CmsWidth} AS bucket FROM probes"
    }.mkString(" UNION ALL ")
    s"""WITH vals AS (
          SELECT ${valueSql} AS v FROM ${table}
        ), sketch AS (
          SELECT depth, bucket, count(*)::BIGINT AS cnt
          FROM (${sketchRows}) GROUP BY depth, bucket
        ), probes AS (
          SELECT * FROM (VALUES ${probeVals}) AS t(probe)
        ), pb AS (
          ${probeBuckets}
        ), est AS (
          SELECT probe, min(coalesce(cnt, 0))::BIGINT AS cms_est
          FROM pb LEFT JOIN sketch USING (depth, bucket) GROUP BY probe
        ), exact AS (
          SELECT v AS probe, count(*)::BIGINT AS exact_cnt FROM vals
          WHERE v IN (SELECT probe FROM probes) GROUP BY v
        )
        SELECT est.probe, est.cms_est,
          coalesce(exact.exact_cnt, 0)::BIGINT AS exact_cnt
        FROM est LEFT JOIN exact USING (probe)"""
  }
}
