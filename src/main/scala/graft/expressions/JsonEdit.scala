package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One ordered JSON edit op (ref `transformers/json.go:40-140`): `set` or
  * `delete` at a gjson-style dotted path (`a.b.2.c` — numeric segments
  * index arrays). `value` is JSON text for `set` (so numbers, strings,
  * bools, nested objects all work), ignored for `delete`. */
case class JsonEditOp(kind: String, path: String, value: String = "null") {
  require(kind == "set" || kind == "delete", s"JsonEditOp: kind must be set|delete, got $kind")
  require(path.nonEmpty, "JsonEditOp: empty path")
}

object JsonEditOp {
  /** Parse the compact op spec used by configs and the SQL function:
    * `;`-separated `set:<path>=<jsonValue>` / `delete:<path>`. */
  def parseSpec(spec: String): Seq[JsonEditOp] =
    spec.split(";").toSeq.filter(_.nonEmpty).map { op =>
      op.split(":", 2) match {
        case Array("set", rest) => rest.split("=", 2) match {
          case Array(path, v) => JsonEditOp("set", path, v)
          case _ => throw new IllegalArgumentException(s"Json op needs path=value: $op")
        }
        case Array("delete", path) => JsonEditOp("delete", path)
        case _ => throw new IllegalArgumentException(s"Json op must be set:|delete:, got $op")
      }
    }
}

/** Ordered set/delete edits on a JSON document column at nested gjson-ish
  * paths — the full-nesting upgrade of the flat map-based JsonTransform.
  * `sortKeys` renders objects with lexicographically sorted keys, giving a
  * canonical serialization that both engines can agree on (the round-2
  * key-order caveat). Deterministic; NULL doc → NULL out; invalid JSON
  * fails the task like the reference errors out. Implemented over json4s
  * (already a Spark dependency), codegen via a static helper. */
case class JsonEditExpr(child: Expression, ops: Seq[JsonEditOp], sortKeys: Boolean)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "json_edit"

  override protected def nullSafeEval(input: Any): Any =
    JsonEditImpl.edit(ops, sortKeys, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val opsRef = ctx.addReferenceObj("ops", ops, "scala.collection.immutable.Seq")
    defineCodeGen(ctx, ev, c => s"graft.expressions.JsonEditImpl.edit($opsRef, $sortKeys, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): JsonEditExpr =
    copy(child = newChild)
}

object JsonEditImpl {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def edit(ops: Seq[JsonEditOp], sortKeys: Boolean, doc: UTF8String): UTF8String = {
    var v: JValue = JsonMethods.parse(doc.toString)
    ops.foreach { op =>
      val segs = op.path.split("\\.").toList
      v = op.kind match {
        case "set" => setPath(v, segs, JsonMethods.parse(op.value))
        case "delete" => deletePath(v, segs)
      }
    }
    val out = if (sortKeys) sortRec(v) else v
    UTF8String.fromString(JsonMethods.compact(JsonMethods.render(out)))
  }

  /** gjson set semantics: intermediate containers are created on demand
    * (object for name segments, array for numeric ones); array sets pad
    * with nulls up to the index. */
  private def setPath(v: JValue, segs: List[String], value: JValue): JValue = segs match {
    case Nil => value
    case seg :: rest =>
      val idx = seg.toIntOption
      v match {
        case JArray(items) if idx.isDefined =>
          val i = idx.get
          val padded = if (i >= items.length) items ++ List.fill(i - items.length + 1)(JNull)
            else items
          JArray(padded.updated(i, setPath(padded(i), rest, value)))
        case JObject(fields) =>
          val existing = fields.collectFirst { case (k, x) if k == seg => x }.getOrElse(JNothing)
          val newChild = setPath(existing, rest, value)
          if (fields.exists(_._1 == seg))
            JObject(fields.map { case (k, x) => if (k == seg) (k, newChild) else (k, x) })
          else JObject(fields :+ (seg -> newChild))
        case _ =>
          // scalar / null / missing at an intermediate hop: replace with a
          // fresh container of the right shape and continue
          val fresh: JValue = if (idx.isDefined) JArray(Nil) else JObject(Nil)
          setPath(fresh, segs, value)
      }
  }

  /** Delete is a no-op when the path doesn't resolve (gjson/sjson). */
  private def deletePath(v: JValue, segs: List[String]): JValue = segs match {
    case Nil => v
    case seg :: Nil =>
      v match {
        case JObject(fields) => JObject(fields.filterNot(_._1 == seg))
        case JArray(items) => seg.toIntOption.filter(i => i >= 0 && i < items.length)
          .map(i => JArray(items.patch(i, Nil, 1))).getOrElse(v)
        case other => other
      }
    case seg :: rest =>
      v match {
        case JObject(fields) =>
          JObject(fields.map { case (k, x) => if (k == seg) (k, deletePath(x, rest)) else (k, x) })
        case JArray(items) => seg.toIntOption.filter(i => i >= 0 && i < items.length)
          .map(i => JArray(items.updated(i, deletePath(items(i), rest)))).getOrElse(v)
        case other => other
      }
  }

  private def sortRec(v: JValue): JValue = v match {
    case JObject(fields) => JObject(fields.map { case (k, x) => (k, sortRec(x)) }.sortBy(_._1))
    case JArray(items) => JArray(items.map(sortRec))
    case other => other
  }
}
