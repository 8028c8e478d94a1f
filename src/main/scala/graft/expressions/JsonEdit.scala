package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One ordered JSON edit op (ref `transformers/json.go:40-140`): `set` or
  * `delete` at a gjson-style dotted path (`a.b.2.c` — numeric segments
  * index arrays). `value` is JSON text for `set` (so numbers, strings,
  * bools, nested objects all work), ignored for `delete`.
  *
  * `dynamic = true` is the Spark re-scope of the reference's
  * `value_template` (`json.go:64,80,102-115`, inserted via
  * `sjson.SetRawBytesOptions` — i.e. the per-row output IS raw JSON
  * text): `value` holds a Spark SQL expression over the row whose string
  * result is parsed as JSON and inserted. The original doc and the
  * current value at any path are reachable the idiomatic way —
  * `get_json_object(<col>, '$.path')` inside the expression — mirroring
  * the template context's `GetValue`/`GetOriginalValue`.
  *
  * `skipNotExist` / `errorNotExist` port the reference's same-named op
  * flags (`json.go:84-86,99-106`): a `set` is skipped when the path does
  * not resolve in the incoming doc, or fails the task. */
case class JsonEditOp(kind: String, path: String, value: String = "null",
                      dynamic: Boolean = false, skipNotExist: Boolean = false,
                      errorNotExist: Boolean = false) {
  require(kind == "set" || kind == "delete", s"JsonEditOp: kind must be set|delete, got $kind")
  require(path.nonEmpty, "JsonEditOp: empty path")
  require(!dynamic || kind == "set", "JsonEditOp: dynamic value only valid for set")
}

object JsonEditOp {
  /** Parse the compact op spec used by configs and the SQL function:
    * `;`-separated `set:<path>=<jsonValue>` / `setexpr:<path>=<sqlExpr>`
    * (the value_template analog) / `delete:<path>`. */
  def parseSpec(spec: String): Seq[JsonEditOp] =
    spec.split(";").toSeq.filter(_.nonEmpty).map { op =>
      op.split(":", 2) match {
        case Array("set", rest) => rest.split("=", 2) match {
          case Array(path, v) => JsonEditOp("set", path, v)
          case _ => throw new IllegalArgumentException(s"Json op needs path=value: $op")
        }
        case Array("setexpr", rest) => rest.split("=", 2) match {
          case Array(path, v) => JsonEditOp("set", path, v, dynamic = true)
          case _ => throw new IllegalArgumentException(s"Json op needs path=expr: $op")
        }
        case Array("delete", path) => JsonEditOp("delete", path)
        case _ => throw new IllegalArgumentException(s"Json op must be set:|setexpr:|delete:, got $op")
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

/** Variable-arity variant for dynamic (`value_template`-style) set ops:
  * children are the doc plus one string-typed value expression per
  * `dynamic` op, evaluated against the same row and parsed as raw JSON
  * before insertion (ref `json.go:102-115`, `sjson.SetRawBytesOptions`).
  * NULL doc → NULL out; a NULL value expression inserts JSON null. */
case class JsonEditDynExpr(doc: Expression, ops: Seq[JsonEditOp],
                           valueExprs: Seq[Expression], sortKeys: Boolean)
  extends Expression {
  require(valueExprs.length == ops.count(_.dynamic),
    "JsonEditDynExpr: one value expression per dynamic op")

  override def children: Seq[Expression] = doc +: valueExprs
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "json_edit_dyn"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val d = doc.eval(input)
    if (d == null) null
    else {
      val vals = new Array[UTF8String](valueExprs.length)
      var i = 0
      while (i < valueExprs.length) {
        vals(i) = valueExprs(i).eval(input).asInstanceOf[UTF8String]; i += 1
      }
      JsonEditImpl.editDyn(ops, sortKeys, d.asInstanceOf[UTF8String], vals)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val opsRef = ctx.addReferenceObj("ops", ops, "scala.collection.immutable.Seq")
    val docGen = doc.genCode(ctx)
    val valGens = valueExprs.map(_.genCode(ctx))
    val arr = ctx.freshName("dynVals")
    val u8 = "org.apache.spark.unsafe.types.UTF8String"
    val assigns = valGens.zipWithIndex.map { case (g, i) =>
      s"""${g.code}
         |$arr[$i] = ${g.isNull} ? null : ${g.value};""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        ${docGen.code}
        boolean ${ev.isNull} = ${docGen.isNull};
        $u8 ${ev.value} = null;
        if (!${ev.isNull}) {
          $u8[] $arr = new $u8[${valueExprs.length}];
          $assigns
          ${ev.value} = graft.expressions.JsonEditImpl.editDyn($opsRef, $sortKeys, ${docGen.value}, $arr);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): JsonEditDynExpr =
    copy(doc = newChildren.head, valueExprs = newChildren.tail)
}

object JsonEditImpl {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def edit(ops: Seq[JsonEditOp], sortKeys: Boolean, doc: UTF8String): UTF8String =
    editDyn(ops, sortKeys, doc, Array.empty)

  /** `dynVals(i)` is the evaluated string for the i-th `dynamic` op (in op
    * order); parsed as raw JSON per the reference's SetRawBytes contract,
    * NULL evaluates to JSON null. */
  def editDyn(ops: Seq[JsonEditOp], sortKeys: Boolean, doc: UTF8String,
              dynVals: Array[UTF8String]): UTF8String = {
    var v: JValue = JsonMethods.parse(doc.toString)
    var dynIdx = 0
    ops.foreach { op =>
      val segs = op.path.split("\\.").toList
      v = op.kind match {
        case "set" =>
          val value: JValue =
            if (op.dynamic) {
              val raw = dynVals(dynIdx); dynIdx += 1
              if (raw == null) JNull else JsonMethods.parse(raw.toString)
            } else JsonMethods.parse(op.value)
          if ((op.skipNotExist || op.errorNotExist) && !existsPath(v, segs)) {
            if (op.errorNotExist)
              throw new IllegalArgumentException(
                s"Json: value by path '${op.path}' does not exist")
            v // skip_not_exist: leave doc unchanged (json.go:99-101)
          } else setPath(v, segs, value)
        case "delete" => deletePath(v, segs)
      }
    }
    val out = if (sortKeys) sortRec(v) else v
    UTF8String.fromString(JsonMethods.compact(JsonMethods.render(out)))
  }

  /** gjson `Exists()` analog over the parsed doc. */
  private def existsPath(v: JValue, segs: List[String]): Boolean = segs match {
    case Nil => v != JNothing
    case seg :: rest =>
      v match {
        case JArray(items) => seg.toIntOption match {
          case Some(i) if i >= 0 && i < items.length => existsPath(items(i), rest)
          case _ => false
        }
        case JObject(fields) => fields.collectFirst { case (k, x) if k == seg => x }
          .exists(existsPath(_, rest))
        case _ => false
      }
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
