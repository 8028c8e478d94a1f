package graft.pipeline

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config-file surface — the YAML config of the reference
  * (`internal/domains/config.go`) as JSON (json4s ships with Spark).
  *
  * ```json
  * { "salt_env": "GRAFT_GLOBAL_SALT",
  *   "tables": [
  *     { "table": "customer",
  *       "when": "c_custkey % 2 = 0",
  *       "subset_conds": ["c_acctbal > 0"],
  *       "dump_slices": 8,
  *
  *       "drop_columns": ["c_comment"],
  *       "type_overrides": {"c_acctbal": "decimal(12,2)"},
  *       "apply_for_inherited": true,
  *       "transforms": [
  *         {"column": "c_name", "name": "Masking", "params": {"type": "name"},
  *          "when": "c_nationkey > 5"}
  *       ] } ] }
  * ```
  * Transformer names/params resolve through [[Registry]] — the same
  * name->definition surface as `transformers/utils/registry.go:23-48`.
  */
object ConfigLoader {

  /** `${VAR}` env interpolation — the reference interpolates environment
    * variables into configs (`tests/integration/greenmask/
    * env_interpolation_test.go`). Unknown variables fail fast (a silently
    * empty substitution would mask typos in salts/paths). `$${` escapes a
    * literal `${`. */
  def interpolate(text: String, env: Map[String, String] = sys.env): String = {
    val re = """\$\$\{|\$\{([A-Za-z_][A-Za-z0-9_]*)\}""".r
    re.replaceAllIn(text, m =>
      if (m.matched == "$${") java.util.regex.Matcher.quoteReplacement("${")
      else env.get(m.group(1)) match {
        case Some(v) => java.util.regex.Matcher.quoteReplacement(v)
        case None => throw new IllegalArgumentException(
          s"config: undefined environment variable $${${m.group(1)}}")
      })
  }

  def fromJson(json: String, env: Map[String, String] = sys.env): Seq[TableConfig] = {
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(interpolate(json, env))
    (root \ "tables") match {
      case JArray(tables) => tables.map(parseTable)
      case JNothing => throw new IllegalArgumentException("config: missing 'tables' array")
      case other => throw new IllegalArgumentException(s"config: 'tables' must be an array, got $other")
    }
  }

  private def parseTable(t: JValue): TableConfig = {
    implicit val fmt: Formats = DefaultFormats
    val name = (t \ "table").extractOpt[String].getOrElse(
      throw new IllegalArgumentException("config: table entry missing 'table'"))
    val transforms = (t \ "transforms") match {
      case JArray(ts) => ts.map { tr =>
        val col = (tr \ "column").extractOpt[String].getOrElse(
          throw new IllegalArgumentException(s"config[$name]: transform missing 'column'"))
        val tname = (tr \ "name").extractOpt[String].getOrElse(
          throw new IllegalArgumentException(s"config[$name]: transform missing 'name'"))
        val params = (tr \ "params").extractOpt[Map[String, String]].getOrElse(Map.empty)
        ColumnTransform(col, Registry.build(tname, params), (tr \ "when").extractOpt[String])
      }
      case _ => Nil
    }
    TableConfig(
      table = name,
      when = (t \ "when").extractOpt[String],
      transforms = transforms,
      subsetConds = (t \ "subset_conds").extractOpt[Seq[String]].getOrElse(Nil),
      query = (t \ "query").extractOpt[String],
      dropColumns = (t \ "drop_columns").extractOpt[Seq[String]].getOrElse(Nil),
      limit = (t \ "limit").extractOpt[Int],
      typeOverrides = (t \ "type_overrides").extractOpt[Map[String, String]].getOrElse(Map.empty),
      applyForInherited = (t \ "apply_for_inherited").extractOpt[Boolean].getOrElse(false),
      dumpSlices = (t \ "dump_slices").extractOpt[Int].getOrElse(1))
  }

  /** One exclusion rule: SQLSTATE error codes and/or CONSTRAINT names
    * whose violations the INSERT-mode restore skips instead of failing
    * (reference `domains/config.go:115-130`,
    * `table_insert_format.go:isErrorAllowed`). */
  case class ExclusionRule(errorCodes: Set[String], constraints: Set[String]) {
    def ++(o: ExclusionRule): ExclusionRule =
      ExclusionRule(errorCodes ++ o.errorCodes, constraints ++ o.constraints)
    def isEmpty: Boolean = errorCodes.isEmpty && constraints.isEmpty
  }
  object ExclusionRule { val empty: ExclusionRule = ExclusionRule(Set.empty, Set.empty) }

  /** One per-table exclusion entry: the reference's
    * `TablesDataRestorationErrorExclusions` (`domains/config.go:115-120`)
    * carries `name`, optional `schema`, and the rule. */
  case class TableRule(name: String, schema: Option[String],
                       rule: ExclusionRule)

  /** The reference's `insert_error_exclusions` block: a GLOBAL rule plus
    * per-TABLE rules. A table's effective rule SHADOWS — `isErrorAllowed`
    * (`table_insert_format.go:226-247`) consults the per-table rule
    * EXCLUSIVELY when one matched at construction, and falls back to
    * global only when none did. (A union would be more permissive: a
    * table with its own rule would silently skip errors the reference
    * propagates as failures.) The reference matches entries on
    * (schema, name) against the TOC entry's namespace/tag
    * (`table_insert_format.go:60-72`); manifest-driven restores here are
    * schema-less, so a rule that names a schema only matches when the
    * caller supplies the same one, while a schema-less rule matches by
    * name alone. */
  case class ErrorExclusions(global: ExclusionRule,
                             tables: Seq[TableRule]) {
    def forTable(table: String, schema: Option[String] = None): ExclusionRule =
      tables.find(t => t.name == table &&
          (t.schema.isEmpty || t.schema == schema))
        .map(_.rule).getOrElse(global)
  }

  /** Parse the `insert_error_exclusions` block of a config document:
    * ```json
    * { "insert_error_exclusions": {
    *     "global": {"error_codes": ["23505"], "constraints": ["users_pk"]},
    *     "tables": [{"name": "orders", "error_codes": ["23503"],
    *                 "constraints": ["orders_fk"]}] } }
    * ```
    * Absent block -> empty exclusions (every insert error propagates,
    * the reference's default). */
  def exclusionsFromJson(json: String,
                         env: Map[String, String] = sys.env): ErrorExclusions = {
    implicit val fmt: Formats = DefaultFormats
    val root = JsonMethods.parse(interpolate(json, env))
    def rule(v: JValue): ExclusionRule = ExclusionRule(
      (v \ "error_codes").extractOpt[Seq[String]].getOrElse(Nil).toSet,
      (v \ "constraints").extractOpt[Seq[String]].getOrElse(Nil).toSet)
    val block = root \ "insert_error_exclusions"
    val tables = (block \ "tables") match {
      case JArray(ts) => ts.map { t =>
        val name = (t \ "name").extractOpt[String].getOrElse(
          throw new IllegalArgumentException(
            "config: insert_error_exclusions table entry missing 'name'"))
        TableRule(name, (t \ "schema").extractOpt[String].filter(_.nonEmpty),
          rule(t))
      }
      case _ => Seq.empty[TableRule]
    }
    ErrorExclusions(rule(block \ "global"), tables)
  }
}
