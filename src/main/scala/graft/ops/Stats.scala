package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-exact statistical comparisons. Floating-point sums are
  * ORDER-DEPENDENT, so a naive avg()/stddev() would hash-differ between
  * engines and across partitionings — every op here first quantizes the
  * measure to integer centi-units (floor(x*100 + 0.5), an identical
  * float chain in both engines), reduces with EXACT integer sums, and
  * only then runs one fixed arithmetic tree over the BIGINT-cast-exact
  * moments, nano-quantizing the result. Deterministic anywhere, oracle-
  * checkable, and the reductions are plain map-side-combinable sums —
  * the cheapest possible 100 TB shape.
  *
  * Square-sum moments accumulate in DECIMAL(38,0) — exact to 1e38, so
  * there is no BIGINT ceiling (the round-14 sf1 rehearsal overflowed the
  * old long sum((x*100)^2) at just 2M rows of 1e5-unit prices: 1.8e19 >
  * Long.Max; ANSI Spark threw, DuckDB's HUGEINT->BIGINT cast would too).
  * Linear sums stay BIGINT where they are part of the output contract.
  */
object Stats {

  /** floor(x*100 + 0.5) — centi-unit quantization, both engines. */
  private def centi(x: Column): Column =
    floor(x.cast("double") * lit(100.0) + lit(0.5)).cast("long")
  private def centiSql(x: String): String =
    s"floor((${x})::DOUBLE * 100.0 + 0.5)::BIGINT"

  /** Welch's t between two populations selected by `groupCol` values
    * `ga` / `gb`: t = (meanA - meanB) / sqrt(varA/nA + varB/nB) over the
    * centi-quantized measure, emitted nano-quantized with the exact
    * integer moments alongside. One map-side-combinable aggregate over
    * the filtered scan; the two 1-row sides combine on the driver-free
    * 1x1 join. */
  def welchT(df: DataFrame, groupCol: String, valueCol: String,
             ga: String, gb: String): DataFrame = {
    val q = centi(col(valueCol))
    // ONE conditional aggregate — both populations' moments in a single
    // scan (splitting the per-group aggregate into two filtered sides
    // re-computed the scan per side; round-7 PlanAudit finding)
    def side(cond: Column, e: Column) = sum(when(cond, e).otherwise(lit(0L)))
    // square sums ride exact DECIMAL(38,0): (18,0)x(18,0) products sum
    // without the long ceiling; linear sums stay BIGINT (output columns)
    def sideDec(cond: Column, e: Column) = sum(when(cond, e).otherwise(lit(0)))
    val isA = col("g") === ga
    val isB = col("g") === gb
    val m = df.filter(col(groupCol).isin(ga, gb))
      .select(col(groupCol).as("g"), q.as("v"),
        q.cast("decimal(18,0)").as("vd"))
      .agg(
        side(isA, lit(1L)).as("n_a"), side(isA, col("v")).as("s_a"),
        sideDec(isA, col("vd") * col("vd")).as("q_a"),
        side(isB, lit(1L)).as("n_b"), side(isB, col("v")).as("s_b"),
        sideDec(isB, col("vd") * col("vd")).as("q_b"))
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    def varOf(q2: Column, s: Column, n: Column) =
      (q2.cast("double") - s.cast("double") * s.cast("double") / n.cast("double")) /
        (n.cast("double") - lit(1.0))
    val t = (mean(col("s_a"), col("n_a")) - mean(col("s_b"), col("n_b"))) /
      sqrt(varOf(col("q_a"), col("s_a"), col("n_a")) / col("n_a").cast("double") +
        varOf(col("q_b"), col("s_b"), col("n_b")) / col("n_b").cast("double"))
    m.select(col("n_a"), col("n_b"), col("s_a"), col("s_b"),
      floor(t * lit(1e9) + lit(0.5)).cast("long").as("t_nano"))
  }

  def welchTSql(table: String, groupCol: String, valueSql: String,
                ga: String, gb: String): String = {
    val v = centiSql(valueSql)
    def esc(s: String) = s.replace("'", "''")
    def sideSql(g: String, e: String) =
      s"sum(CASE WHEN ${groupCol} = '${esc(g)}' THEN ${e} ELSE 0 END)::BIGINT"
    def sideDecSql(g: String, e: String) =
      s"sum(CASE WHEN ${groupCol} = '${esc(g)}' THEN ${e} ELSE 0 END)"
    val vd = s"($v)::DECIMAL(18,0)"
    s"""WITH m AS (
          SELECT ${sideSql(ga, "1")} AS n_a, ${sideSql(ga, v)} AS s_a,
                 ${sideDecSql(ga, s"($vd) * ($vd)")} AS q_a,
                 ${sideSql(gb, "1")} AS n_b, ${sideSql(gb, v)} AS s_b,
                 ${sideDecSql(gb, s"($vd) * ($vd)")} AS q_b
          FROM ${table} WHERE ${groupCol} IN ('${esc(ga)}', '${esc(gb)}')
        )
        SELECT n_a, n_b, s_a, s_b,
          floor(((s_a::DOUBLE / n_a::DOUBLE) - (s_b::DOUBLE / n_b::DOUBLE)) /
            sqrt(((q_a::DOUBLE - s_a::DOUBLE * s_a::DOUBLE / n_a::DOUBLE) / (n_a::DOUBLE - 1.0)) / n_a::DOUBLE +
                 ((q_b::DOUBLE - s_b::DOUBLE * s_b::DOUBLE / n_b::DOUBLE) / (n_b::DOUBLE - 1.0)) / n_b::DOUBLE)
            * 1e9 + 0.5)::BIGINT AS t_nano
        FROM m"""
  }

  /** Per-group Pearson correlation between two measures, nano-quantized
    * from exact integer centi-moments: one aggregate, no window. */
  def pearsonByGroup(df: DataFrame, groupCol: String,
                     xCol: String, yCol: String): DataFrame = {
    // exact DECIMAL moments: centi-units fit 18 digits, products 36,
    // the 38-digit sums never hit the BIGINT ceiling the sf1 rehearsal
    // exposed (2M rows x (1e7 centi)^2 = 1.8e19 > Long.Max)
    val x = centi(col(xCol)).cast("decimal(18,0)")
    val y = centi(col(yCol)).cast("decimal(18,0)")
    val m = df.select(col(groupCol).as("grp"), x.as("x"), y.as("y"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    def d(c: String) = col(c).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val den = sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
      sqrt(d("n") * d("syy") - d("sy") * d("sy"))
    m.select(col("grp"), col("n"),
      floor(num / den * lit(1e9) + lit(0.5)).cast("long").as("r_nano"))
  }

  def pearsonByGroupSql(table: String, groupCol: String,
                        xSql: String, ySql: String): String = {
    val x = centiSql(xSql)
    val y = centiSql(ySql)
    s"""WITH m AS (
          SELECT ${groupCol} AS grp, count(*)::BIGINT AS n,
                 sum((${x})::DECIMAL(18,0)) AS sx,
                 sum((${y})::DECIMAL(18,0)) AS sy,
                 sum(((${x})::DECIMAL(18,0)) * ((${y})::DECIMAL(18,0))) AS sxy,
                 sum(((${x})::DECIMAL(18,0)) * ((${x})::DECIMAL(18,0))) AS sxx,
                 sum(((${y})::DECIMAL(18,0)) * ((${y})::DECIMAL(18,0))) AS syy
          FROM ${table} GROUP BY 1)
        SELECT grp, n,
          floor((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
            (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
             sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
            * 1e9 + 0.5)::BIGINT AS r_nano
        FROM m"""
  }

  /** Fixed-width histogram per group: integer centi-bucketing, one
    * map-side-combinable aggregate. Bucket i covers
    * [i*width, (i+1)*width) in the measure's units. */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
                width: Double): DataFrame = {
    require(width > 0, "histogram: width must be positive")
    val wCenti = math.round(width * 100)
    // FLOOR division via pmod (Spark's `div` truncates toward zero, which
    // would disagree with DuckDB's flooring `//` on negative measures)
    val c = floor(col("__v") * lit(100.0) + lit(0.5)).cast("long")
    val bucket = ((c - pmod(c, lit(wCenti))) / lit(wCenti.toDouble)).cast("long")
    df.select(col(groupCol).as("grp"), col(valueCol).cast("double").as("__v"))
      .select(col("grp"), bucket.as("bucket"))
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n"))
  }

  def histogramSql(table: String, groupCol: String, valueSql: String,
                   width: Double): String = {
    val wCenti = math.round(width * 100)
    s"""SELECT ${groupCol} AS grp,
          (floor((${valueSql})::DOUBLE * 100.0 + 0.5)::BIGINT // ${wCenti})::BIGINT AS bucket,
          count(*)::BIGINT AS n
        FROM ${table} GROUP BY 1, 2"""
  }
}
