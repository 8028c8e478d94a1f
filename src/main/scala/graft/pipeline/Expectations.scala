package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Data-quality expectations — declarative validation rules evaluated as
  * ONE aggregate pass over the table (the deequ/Great-Expectations
  * surface, engine-native): each rule compiles to a conditional-count
  * expression, every rule shares the single scan/aggregate, and the
  * output is an auditable per-rule report row (passed, observed fraction
  * in exact integer milli — counts and integer division only, so the
  * report hash-compares across engines).
  *
  * Rule kinds:
  *  - `not_null`      — fraction of non-null values >= threshold
  *  - `unique`        — no value occurs twice (distinct count == count)
  *  - `min` / `max`   — numeric bound holds for every non-null value
  *  - `regex_frac`    — fraction of non-null values matching >= threshold
  *  - `accepted`      — every non-null value in the accepted list
  *
  * JSON config: {"rules": [{"column": "c_name", "kind": "not_null",
  * "threshold_milli": 1000}, {"column": "c_acctbal", "kind": "min",
  * "bound": "-1000.0"}, ...]} — loadable with the same env interpolation
  * as the masking config.
  */
object Expectations {

  case class Rule(column: String, kind: String, params: Map[String, String])

  def parse(json: String, env: Map[String, String] = sys.env): Seq[Rule] = {
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(ConfigLoader.interpolate(json, env))
    (root \ "rules") match {
      case JArray(rs) => rs.map { r =>
        val colName = (r \ "column").extractOpt[String].getOrElse(
          throw new IllegalArgumentException("expectations: rule missing 'column'"))
        val kind = (r \ "kind").extractOpt[String].getOrElse(
          throw new IllegalArgumentException("expectations: rule missing 'kind'"))
        val params = r match {
          case JObject(fields) => fields.collect {
            case (k, JString(v)) if k != "column" && k != "kind" => k -> v
            case (k, JInt(v)) if k != "column" && k != "kind" => k -> v.toString
            case (k, JDouble(v)) if k != "column" && k != "kind" => k -> v.toString
          }.toMap
          case _ => Map.empty[String, String]
        }
        Rule(colName, kind, params)
      }
      case _ => throw new IllegalArgumentException("expectations: missing 'rules'")
    }
  }

  /** Evaluate all rules in one aggregate pass. Output one row per rule:
    * (rule_id, col_name, kind, passed, observed_milli) where observed is
    * the rule's measured fraction (milli) or 1000/0 for bound rules. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: need at least one rule")
    val n = count(lit(1))
    // one aggregate row: per rule, the counts its verdict needs
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      val c = col(r.column)
      def p(k: String) = r.params.getOrElse(k, throw new IllegalArgumentException(
        s"expectations: ${r.kind} on ${r.column} missing '$k'"))
      r.kind match {
        case "not_null" =>
          Seq(count(c).as(s"m$i"), n.as(s"d$i"))
        case "unique" =>
          Seq(countDistinct(c).as(s"m$i"), count(c).as(s"d$i"))
        case "min" =>
          Seq(coalesce(sum(when(c < lit(p("bound").toDouble), 1L).otherwise(0L)), lit(0L)).as(s"m$i"),
            count(c).as(s"d$i"))
        case "max" =>
          Seq(coalesce(sum(when(c > lit(p("bound").toDouble), 1L).otherwise(0L)), lit(0L)).as(s"m$i"),
            count(c).as(s"d$i"))
        case "regex_frac" =>
          Seq(coalesce(sum(when(c.rlike(p("pattern")), 1L).otherwise(0L)), lit(0L)).as(s"m$i"),
            count(c).as(s"d$i"))
        case "accepted" =>
          val vals = p("values").split(",").map(_.trim).toSeq
          Seq(coalesce(sum(when(!c.isin(vals: _*), 1L).otherwise(0L)), lit(0L)).as(s"m$i"),
            count(c).as(s"d$i"))
        case other =>
          throw new IllegalArgumentException(s"expectations: unknown kind '$other'")
      }
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row into per-rule report rows
    val reports = rules.zipWithIndex.map { case (r, i) =>
      val m = col(s"m$i"); val d = col(s"d$i")
      val observedMilli = r.kind match {
        case "not_null" | "regex_frac" =>
          when(d === 0, lit(1000L)).otherwise(expr(s"(m$i * 1000) div d$i"))
        case "unique" =>
          when(d === 0, lit(1000L)).otherwise(expr(s"(m$i * 1000) div d$i"))
        case _ => // bound/accepted: violation count -> fraction CLEAN
          when(d === 0, lit(1000L)).otherwise(expr(s"((d$i - m$i) * 1000) div d$i"))
      }
      val passed = r.kind match {
        case "not_null" | "regex_frac" =>
          observedMilli >= r.params.getOrElse("threshold_milli", "1000").toLong
        case "unique" => m === d
        case _ => m === 0
      }
      struct(lit(i).as("rule_id"), lit(r.column).as("col_name"),
        lit(r.kind).as("kind"), passed.as("passed"),
        observedMilli.cast("long").as("observed_milli"))
    }
    one.select(explode(array(reports: _*)).as("r")).select("r.*")
  }

  /** DuckDB rendering of [[check]] — one aggregate subquery, one report
    * row per rule via UNION ALL. */
  def checkSql(table: String, rules: Seq[Rule]): String = {
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      val c = r.column
      def p(k: String) = r.params(k)
      r.kind match {
        case "not_null" =>
          Seq(s"count(${c})::BIGINT AS m$i", s"count(*)::BIGINT AS d$i")
        case "unique" =>
          Seq(s"count(DISTINCT ${c})::BIGINT AS m$i", s"count(${c})::BIGINT AS d$i")
        case "min" =>
          Seq(s"coalesce(sum(CASE WHEN ${c} < ${p("bound")} THEN 1 ELSE 0 END), 0)::BIGINT AS m$i",
            s"count(${c})::BIGINT AS d$i")
        case "max" =>
          Seq(s"coalesce(sum(CASE WHEN ${c} > ${p("bound")} THEN 1 ELSE 0 END), 0)::BIGINT AS m$i",
            s"count(${c})::BIGINT AS d$i")
        case "regex_frac" =>
          Seq(s"coalesce(sum(CASE WHEN regexp_matches(${c}, '${p("pattern").replace("'", "''")}') " +
            s"THEN 1 ELSE 0 END), 0)::BIGINT AS m$i", s"count(${c})::BIGINT AS d$i")
        case "accepted" =>
          val vals = p("values").split(",").map(v => s"'${v.trim.replace("'", "''")}'")
          Seq(s"coalesce(sum(CASE WHEN ${c} NOT IN (${vals.mkString(", ")}) THEN 1 ELSE 0 END), 0)::BIGINT AS m$i",
            s"count(${c})::BIGINT AS d$i")
        case other =>
          throw new IllegalArgumentException(s"expectations: unknown kind '$other'")
      }
    }
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val observed = r.kind match {
        case "not_null" | "regex_frac" | "unique" =>
          s"CASE WHEN d$i = 0 THEN 1000 ELSE (m$i * 1000) // d$i END"
        case _ =>
          s"CASE WHEN d$i = 0 THEN 1000 ELSE ((d$i - m$i) * 1000) // d$i END"
      }
      val passed = r.kind match {
        case "not_null" | "regex_frac" =>
          s"(${observed}) >= ${r.params.getOrElse("threshold_milli", "1000")}"
        case "unique" => s"m$i = d$i"
        case _ => s"m$i = 0"
      }
      s"""SELECT ${i} AS rule_id, '${r.column}' AS col_name, '${r.kind}' AS kind,
            ${passed} AS passed, (${observed})::BIGINT AS observed_milli
          FROM agg"""
    }
    s"WITH agg AS (SELECT ${aggs.mkString(", ")} FROM ${table}) " +
      rows.mkString(" UNION ALL ")
  }
}
