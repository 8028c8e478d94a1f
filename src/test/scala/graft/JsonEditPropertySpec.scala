package graft

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.{JsonEditImpl, JsonEditOp}

/** Property fuzz for the nested JSON editor — the most structural custom
  * expression in the engine (gjson-style paths, container creation,
  * canonical render). The DuckDB oracle exercises the happy paths; this
  * suite drives RANDOM documents and paths through an INDEPENDENT
  * navigator written here (plain json4s walks), so a bug in setPath /
  * deletePath can't hide behind its own code. JsonEditImpl.edit is a
  * plain JVM function, so the fuzz runs without Spark jobs.
  */
class JsonEditPropertySpec extends AnyFunSuite {

  private val Rounds = 400

  private def samples[A](g: Gen[A], n: Int): Seq[(Int, A)] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xBEEFL + i)).map(i -> _))

  // ------------------------------------------------------------ doc gen

  private val scalarGen: Gen[JValue] = Gen.oneOf(
    Gen.choose(-1000, 1000).map(i => JInt(BigInt(i))),
    Gen.alphaNumStr.map(s => JString(s.take(8))),
    Gen.oneOf(JBool(true), JBool(false), JNull))

  private def jsonGen(depth: Int): Gen[JValue] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      3 -> scalarGen,
      2 -> (for {
        n <- Gen.choose(0, 3)
        keys <- Gen.listOfN(n, Gen.identifier.map(_.take(4))).map(_.distinct)
        vals <- Gen.listOfN(keys.size, jsonGen(depth - 1))
      } yield JObject(keys.zip(vals))),
      2 -> Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, jsonGen(depth - 1)).map(JArray(_))))

  private val docGen: Gen[JValue] = jsonGen(3)

  /** All root-to-leaf paths (object keys / array indices as segments). */
  private def leafPaths(v: JValue, prefix: List[String] = Nil): Seq[(List[String], JValue)] =
    v match {
      case JObject(fields) if fields.nonEmpty =>
        fields.flatMap { case (k, x) => leafPaths(x, prefix :+ k) }
      case JArray(items) if items.nonEmpty =>
        items.zipWithIndex.flatMap { case (x, i) => leafPaths(x, prefix :+ i.toString) }
      case leaf => Seq(prefix -> leaf)
    }

  /** Independent navigator mirroring the documented path semantics. */
  private def nav(v: JValue, segs: List[String]): Option[JValue] = segs match {
    case Nil => Some(v)
    case seg :: rest => v match {
      case JArray(items) => seg.toIntOption match {
        case Some(i) if i >= 0 && i < items.length => nav(items(i), rest)
        case _ => None
      }
      case JObject(fields) =>
        fields.collectFirst { case (k, x) if k == seg => x }.flatMap(nav(_, rest))
      case _ => None
    }
  }

  private def edit(doc: JValue, ops: Seq[JsonEditOp], sortKeys: Boolean = false): JValue =
    JsonMethods.parse(JsonEditImpl.edit(ops, sortKeys,
      UTF8String.fromString(JsonMethods.compact(JsonMethods.render(doc)))).toString)

  private def render(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))

  // --------------------------------------------------------- properties

  test("set at an existing leaf: new value lands, every OTHER leaf untouched") {
    val g = for {
      doc <- docGen.suchThat(d => leafPaths(d).exists(_._1.nonEmpty))
      paths = leafPaths(doc).filter(_._1.nonEmpty)
      pick <- Gen.choose(0, paths.size - 1)
      v <- scalarGen
    } yield (doc, paths(pick)._1, v)
    samples(g, Rounds).foreach { case (i, (doc, path, v)) =>
      val out = edit(doc, Seq(JsonEditOp("set", path.mkString("."), render(v))))
      assert(nav(out, path).contains(v), s"seed=$i: set value not readable at path")
      val before = leafPaths(doc).filterNot(_._1 == path).toMap
      val after = leafPaths(out).filterNot(_._1 == path).toMap
      assert(after == before, s"seed=$i: a sibling leaf changed (path=$path)")
    }
  }

  test("set with skip_not_exist on a missing path is a byte-level no-op") {
    samples(docGen, Rounds).foreach { case (i, doc) =>
      val out = edit(doc, Seq(JsonEditOp("set", "zz_missing.q", "42",
        skipNotExist = true)))
      assert(out == doc, s"seed=$i: skip_not_exist altered the doc")
    }
  }

  test("set creates intermediate containers typed by the NEXT segment") {
    val g = for {
      name <- Gen.identifier.map(_.take(4))
      idx <- Gen.choose(0, 3)
      v <- scalarGen
    } yield (name, idx, v)
    samples(g, Rounds / 2).foreach { case (i, (name, idx, v)) =>
      // fresh object hop then fresh array hop with null padding
      val out = edit(JObject(Nil),
        Seq(JsonEditOp("set", s"$name.$idx", render(v))))
      assert(nav(out, List(name, idx.toString)).contains(v), s"seed=$i")
      // indices below the set one padded with null
      (0 until idx).foreach(j =>
        assert(nav(out, List(name, j.toString)).contains(JNull),
          s"seed=$i: index $j not null-padded"))
    }
  }

  test("delete of an object-field leaf removes exactly that field") {
    val g = for {
      doc <- docGen
      objLeaves = leafPaths(doc).filter { case (p, _) =>
        p.nonEmpty && nav(doc, p.init).exists(_.isInstanceOf[JObject])
      }
      if objLeaves.nonEmpty
      pick <- Gen.choose(0, objLeaves.size - 1)
    } yield (doc, objLeaves(pick)._1)
    samples(g, Rounds).foreach { case (i, (doc, path)) =>
      val out = edit(doc, Seq(JsonEditOp("delete", path.mkString("."))))
      assert(nav(out, path).isEmpty, s"seed=$i: leaf still present after delete")
      val before = leafPaths(doc).filterNot(_._1.startsWith(path)).toMap
      // deleting an object's ONLY field turns the (now empty) parent into
      // a leaf of the walk — account for exactly that one new entry
      val parentEmptied = nav(doc, path.init)
        .collect { case JObject(fs) => fs.size == 1 }.getOrElse(false)
      val expected =
        if (parentEmptied) before + (path.init -> (JObject(Nil): JValue)) else before
      val after = leafPaths(out).toMap
      assert(after == expected, s"seed=$i: delete disturbed other leaves")
    }
  }

  test("delete of a missing path is a no-op; output always reparses; sortKeys is canonical") {
    samples(docGen, Rounds).foreach { case (i, doc) =>
      assert(edit(doc, Seq(JsonEditOp("delete", "zz_missing.0.q"))) == doc,
        s"seed=$i: phantom delete changed the doc")
      // canonical render is a fix-point: sorting twice equals sorting once
      val once = JsonEditImpl.edit(Seq(JsonEditOp("delete", "zz_missing")),
        sortKeys = true, UTF8String.fromString(render(doc))).toString
      val twice = JsonEditImpl.edit(Seq(JsonEditOp("delete", "zz_missing")),
        sortKeys = true, UTF8String.fromString(once)).toString
      assert(twice == once, s"seed=$i: canonical form not a fix-point")
    }
  }

  test("op order matters and composes: set then delete at the same path restores absence") {
    val g = for {
      doc <- docGen.suchThat(_.isInstanceOf[JObject])
      name <- Gen.identifier.map(_.take(4))
      if nav(doc, List(name)).isEmpty
      v <- scalarGen
    } yield (doc, name, v)
    samples(g, Rounds / 2).foreach { case (i, (doc, name, v)) =>
      val out = edit(doc, Seq(
        JsonEditOp("set", name, render(v)),
        JsonEditOp("delete", name)))
      assert(out == doc, s"seed=$i: set+delete of a fresh key must round-trip")
    }
  }
}
