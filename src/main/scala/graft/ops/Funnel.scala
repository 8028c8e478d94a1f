package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, ts, type) stream: ordered-step
  * funnel matching and weekly cohort retention. Engine additions — the
  * reference has no event model, but any pipeline curating interaction
  * logs into training data needs both.
  *
  * Scale shape: the funnel is ONE shuffle on the user key (collect the
  * user's own events, fold them with a codegen'd HOF — group state never
  * leaves the row); retention is two map-side-combinable aggregates on
  * (user) then (cohort, offset) — integer week arithmetic throughout, no
  * timezone/date functions, so plans carry longs only.
  */
object Funnel {

  /** Bound per-user group state: keep each user's FIRST `cap` events
    * (ordered by (ts, type) — deterministic under timestamp ties). The
    * row_number <= cap filter compiles to a WindowGroupLimit, so the
    * shuffle carries at most cap rows per (partition, user) — without
    * this, `collect_list` state is O(events-per-user) and one bot key
    * with 10^8 events lands on a single task at 100 TB. */
  private def capEvents(df: DataFrame, userCol: String, tsCol: Column,
                        typeCol: String, cap: Int): DataFrame =
    if (cap <= 0) df
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(userCol).orderBy(tsCol, col(typeCol))
      df.withColumn("__evrk", row_number().over(w))
        .filter(col("__evrk") <= cap).drop("__evrk")
    }

  /** Greedy ordered-funnel match: for each user, the number of `steps`
    * completed in order, each step STRICTLY after the previous one's
    * matched time (ties never advance, making the result independent of
    * the sort order of same-timestamp events). Greedy first-match is
    * optimal here: matching a step at its earliest admissible time can
    * only widen later steps' windows.
    *
    * @param tsCol integral event-time column (epoch micros)
    * @param maxEventsPerUser optional cap: > 0 evaluates the funnel over
    *        each user's first that-many events (by (ts, type)), bounding
    *        per-key state against bot/runaway users — see [[capEvents]]
    * @return (user, steps_done, completed) one row per user
    */
  def steps(df: DataFrame, userCol: String, tsCol: Column, typeCol: String,
            stepTypes: Seq[String], maxEventsPerUser: Int = 0): DataFrame = {
    require(stepTypes.nonEmpty, "funnel: need at least one step")
    val capped = capEvents(df, userCol, tsCol, typeCol, maxEventsPerUser)
    val n = stepTypes.size
    val stepArr = array(stepTypes.map(lit): _*)
    val evs = sort_array(collect_list(struct(tsCol.as("ts"), col(typeCol).as("ty"))))
    // fold state: (done, last matched ts); advance on the next wanted type
    val folded = aggregate(
      evs,
      struct(lit(0).as("done"), lit(Long.MinValue).as("last")),
      (acc, e) =>
        when(acc("done") < n &&
            e("ty") === element_at(stepArr, acc("done") + 1) &&
            e("ts") > acc("last"),
          struct((acc("done") + 1).as("done"), e("ts").as("last")))
        .otherwise(acc))
    capped.groupBy(col(userCol).as("user_id"))
      .agg(folded.as("st"))
      .select(col("user_id"), col("st.done").as("steps_done"),
        (col("st.done") === n).as("completed"))
  }

  /** DuckDB rendering of a `maxEventsPerUser`-capped event source —
    * compose with [[stepsSql]]/[[stepTimesSql]] as the `table` arg. */
  def cappedEventsSql(table: String, userCol: String, tsSql: String,
                      typeCol: String, cap: Int): String =
    s"""(SELECT * FROM ${table}
         QUALIFY row_number() OVER (
           PARTITION BY ${userCol} ORDER BY ${tsSql}, ${typeCol}) <= ${cap})"""

  /** DuckDB rendering: the greedy fold's closed form — step k's matched
    * time is the min event time of type k strictly after step k-1's. */
  def stepsSql(table: String, userCol: String, tsSql: String, typeCol: String,
               stepTypes: Seq[String]): String = {
    val n = stepTypes.size
    val ctes = stepCtes(table, userCol, tsSql, typeCol, stepTypes)
    val doneExpr = (0 until n).map(i =>
      s"CASE WHEN s${i}.t IS NOT NULL THEN 1 ELSE 0 END").mkString(" + ")
    val joins = (0 until n).map(i =>
      s"LEFT JOIN s${i} USING (user_id)").mkString(" ")
    s"""WITH ${ctes.mkString(", ")},
          u AS (SELECT DISTINCT ${userCol} AS user_id FROM ${table})
        SELECT user_id, (${doneExpr})::INT AS steps_done,
          (${doneExpr}) = ${n} AS completed
        FROM u ${joins}"""
  }

  /** Per-step matched times of the greedy fold: one row per (user,
    * completed step) with the event time that advanced it — the raw
    * relation behind conversion-latency analytics. Same single-shuffle
    * fold as [[steps]], with the state carrying the matched-time array. */
  def stepTimes(df: DataFrame, userCol: String, tsCol: Column, typeCol: String,
                stepTypes: Seq[String], maxEventsPerUser: Int = 0): DataFrame = {
    require(stepTypes.nonEmpty, "funnel: need at least one step")
    val capped = capEvents(df, userCol, tsCol, typeCol, maxEventsPerUser)
    val n = stepTypes.size
    val stepArr = array(stepTypes.map(lit): _*)
    val evs = sort_array(collect_list(struct(tsCol.as("ts"), col(typeCol).as("ty"))))
    val folded = aggregate(
      evs,
      struct(lit(0).as("done"), lit(Long.MinValue).as("last"),
        array().cast("array<bigint>").as("times")),
      (acc, e) =>
        when(acc("done") < n &&
            e("ty") === element_at(stepArr, acc("done") + 1) &&
            e("ts") > acc("last"),
          struct((acc("done") + 1).as("done"), e("ts").as("last"),
            concat(acc("times"), array(e("ts"))).as("times")))
        .otherwise(acc))
    capped.groupBy(col(userCol).as("user_id"))
      .agg(folded.as("st"))
      .select(col("user_id"), posexplode(col("st.times")))
      .select(col("user_id"), (col("pos") + 1).as("step"), col("col").as("t"))
  }

  /** DuckDB rendering: union of the chained min-after-previous CTEs. */
  def stepTimesSql(table: String, userCol: String, tsSql: String, typeCol: String,
                   stepTypes: Seq[String]): String = {
    val ctes = stepCtes(table, userCol, tsSql, typeCol, stepTypes)
    val union = stepTypes.indices.map(i =>
      s"SELECT user_id, ${i + 1} AS step, t FROM s${i}").mkString(" UNION ALL ")
    s"WITH ${ctes.mkString(", ")} SELECT user_id, step::BIGINT AS step, t FROM (${union})"
  }

  private def stepCtes(table: String, userCol: String, tsSql: String,
                       typeCol: String, stepTypes: Seq[String]): Seq[String] =
    stepTypes.zipWithIndex.map { case (st, i) =>
      val esc = st.replace("'", "''")
      if (i == 0)
        s"""s0 AS (
              SELECT e.${userCol} AS user_id, min(${tsSql}) AS t
              FROM ${table} e WHERE e.${typeCol} = '${esc}' GROUP BY 1)"""
      else
        s"""s${i} AS (
              SELECT e.${userCol} AS user_id, min(${tsSql}) AS t
              FROM ${table} e JOIN s${i - 1} p ON e.${userCol} = p.user_id
              WHERE e.${typeCol} = '${esc}' AND ${tsSql} > p.t
              GROUP BY e.${userCol})"""
    }

  /** Conversion-latency quantiles: per funnel step >= 2, the exact
    * lower-quantile latencies (t_step - t_{step-1}) across converting
    * users. Composition: [[stepTimes]] -> lag window on the per-user
    * step relation (n rows per user, tiny) -> the engine's exact
    * group-quantile rank rule. */
  def conversionLatency(df: DataFrame, userCol: String, tsCol: Column,
                        typeCol: String, stepTypes: Seq[String],
                        pcts: Seq[Int] = Seq(50, 90)): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("step")
    val durs = stepTimes(df, userCol, tsCol, typeCol, stepTypes)
      .withColumn("prev_t", lag("t", 1).over(w))
      .filter(col("step") >= 2)
      .select(col("step"), (col("t") - col("prev_t")).as("latency"))
    graft.llm.Corpus.groupQuantiles(durs, "step", "latency", pcts)
  }

  def conversionLatencySql(table: String, userCol: String, tsSql: String,
                           typeCol: String, stepTypes: Seq[String],
                           pcts: Seq[Int] = Seq(50, 90)): String = {
    val st = stepTimesSql(table, userCol, tsSql, typeCol, stepTypes)
    val durs = s"""(SELECT step, latency FROM (
          SELECT step, t - lag(t) OVER (PARTITION BY user_id ORDER BY step) AS latency
          FROM (${st})) WHERE step >= 2 AND latency IS NOT NULL)"""
    graft.llm.Corpus.groupQuantilesSql(durs, "step", "latency", pcts)
  }

  /** Event-path transition matrix: counts and probabilities of each
    * consecutive (prev_type -> type) pair per user stream — the Markov
    * view behind "what do users do next". One window pass on the user
    * key (lag over (ts, orderCol) — the deterministic tie order), one
    * map-side-combinable pair count; probabilities are integer nano
    * (count·1e9 div row-total) so the matrix hash-compares. */
  def eventTransitions(df: DataFrame, userCol: String, tsCol: Column,
                       orderCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(tsCol, col(orderCol))
    val pairs = df
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val wt = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
    pairs
      .withColumn("row_total", sum("n").over(wt))
      .withColumn("p_nano", expr("(n * 1000000000) div row_total"))
      .select("prev_type", "next_type", "n", "p_nano")
  }

  def eventTransitionsSql(table: String, userCol: String, tsSql: String,
                          orderCol: String, typeCol: String): String =
    s"""WITH pairs AS (
          SELECT prev_type, ${typeCol} AS next_type, count(*)::BIGINT AS n
          FROM (
            SELECT ${typeCol},
                   lag(${typeCol}) OVER (PARTITION BY ${userCol}
                     ORDER BY ${tsSql}, ${orderCol}) AS prev_type
            FROM ${table})
          WHERE prev_type IS NOT NULL
          GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
               ((n * 1000000000) // sum(n) OVER (PARTITION BY prev_type))::BIGINT AS p_nano
        FROM pairs"""

  /** Weekly cohort retention: cohort = integer week (epoch-micros div one
    * week) of the user's first event; a user is retained at offset k if
    * active during cohort week + k. Output (cohort_week, week_offset,
    * n_users), offsets with zero users absent.
    */
  def cohortRetention(df: DataFrame, userCol: String, tsCol: Column): DataFrame = {
    val weekMicros = 7L * 86400L * 1000000L
    // exact-multiple division: the numerator is a multiple of weekMicros,
    // so the one double division yields the integer week exactly (same
    // value as DuckDB's integer `//` on the positive epoch).
    // Materialized: both the cohort derivation and the offset join read
    // this relation — without it the raw event scan runs twice (and at
    // 100 TB the distinct (user, week) relation is users x weeks, orders
    // smaller than the event log it summarizes).
    val active = graft.plans.Checkpoints.materialize(
      df.select(col(userCol).as("user_id"),
          ((tsCol - tsCol % weekMicros) / weekMicros).cast("long").as("week"))
        .distinct())
    val cohorts = active.groupBy("user_id").agg(min("week").as("cohort_week"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  def cohortRetentionSql(table: String, userCol: String, tsSql: String): String = {
    val weekMicros = 7L * 86400L * 1000000L
    s"""WITH active AS (
          SELECT DISTINCT ${userCol} AS user_id, (${tsSql}) // ${weekMicros} AS week
          FROM ${table}
        ), cohorts AS (
          SELECT user_id, min(week) AS cohort_week FROM active GROUP BY 1
        )
        SELECT c.cohort_week, (a.week - c.cohort_week)::BIGINT AS week_offset,
          count(DISTINCT a.user_id)::BIGINT AS n_users
        FROM active a JOIN cohorts c USING (user_id)
        GROUP BY 1, 2"""
  }
}
