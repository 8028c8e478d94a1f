package graft.transformers

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Json transformer — ordered set/delete ops on a JSON document column
  * (ref `transformers/json.go:40-140`; gjson paths re-scoped to top-level
  * keys + dotted paths via get_json_object, SURVEY §7.4 dialect note).
  *
  * Implementation: the document is parsed once to `map<string,string>`,
  * ops edit the map, `to_json` re-serializes. This is exact for flat
  * string/number documents (the common masking case — e.g. events.props);
  * nested structures round-trip through their JSON text form as values.
  */
sealed trait JsonOp
case class JsonSet(key: String, value: Column) extends JsonOp
case class JsonSetExpr(key: String, sql: String) extends JsonOp
case class JsonDelete(key: String) extends JsonOp

case class JsonTransform(ops: Seq[JsonOp]) extends ScalarTransformer {
  def column(in: Column) = {
    val parsed = from_json(in, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
    val edited = ops.foldLeft(parsed) {
      case (m, JsonSet(k, v)) =>
        map_concat(map_filter(m, (key, _) => key =!= k), map(lit(k), v.cast("string")))
      case (m, JsonSetExpr(k, sql)) =>
        map_concat(map_filter(m, (key, _) => key =!= k), map(lit(k), expr(sql).cast("string")))
      case (m, JsonDelete(k)) => map_filter(m, (key, _) => key =!= k)
    }
    to_json(edited)
  }
  // Key-order of re-serialized maps is engine-specific => rows-only check.
  def oracle(in: String) = None
}

/** Nested Json transformer — ordered set/delete at gjson-style dotted
  * paths (`a.b.2.c`; ref `json.go:40-140` full path dialect, unlike the
  * flat-map [[JsonTransform]]). `sortKeys = true` emits the canonical
  * (key-sorted, compact) rendering so results are engine-comparable.
  *
  * Ops with `dynamic = true` carry a Spark SQL expression (the
  * `value_template` analog, `json.go:64,80`) evaluated against the row;
  * its string result is inserted as raw JSON. */
case class JsonNested(ops: Seq[graft.expressions.JsonEditOp], sortKeys: Boolean = true)
  extends ScalarTransformer {
  import org.apache.spark.sql.GraftBridge.{column => toCol, expression => toExpr}
  def column(in: Column) =
    if (ops.exists(_.dynamic))
      toCol(graft.expressions.JsonEditDynExpr(
        toExpr(in.cast("string")), ops,
        ops.filter(_.dynamic).map(o => toExpr(expr(o.value).cast("string"))), sortKeys))
    else
      toCol(graft.expressions.JsonEditExpr(toExpr(in.cast("string")), ops, sortKeys))
  // callers compose their own per-query oracle (canonical rendering makes
  // full-string compare possible; see q_json_set)
  def oracle(in: String) = None
}

/** jsonGet template-func analog: extract by dotted path (Spark builtin). */
object JsonFuncs {
  def jsonGet(doc: Column, path: String): Column = get_json_object(doc, "$." + path)
  def jsonGetSql(doc: String, path: String): String = s"json_extract_string(${doc}, '$$.${path}')"
  def jsonExists(doc: Column, path: String): Column = get_json_object(doc, "$." + path).isNotNull
  def jsonValidate(doc: Column): Column = from_json(doc,
    org.apache.spark.sql.types.MapType(org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType)).isNotNull
}
