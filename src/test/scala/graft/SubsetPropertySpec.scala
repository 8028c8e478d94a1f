package graft

import org.apache.spark.sql.functions._
import graft.pipeline.FkRef
import graft.subset.SubsetPlanner

import scala.util.Random

/** Property test: on random FK graphs (cycles allowed) with random conds,
  * the DataFrame subset planner must equal a brute-force in-memory
  * fix-point (the defining semantics: a row survives iff its conds pass
  * and every non-null FK points at a surviving parent row). */
class SubsetPropertySpec extends SparkSpec {
  import spark.implicits._

  private case class Tbl(name: String, rows: Seq[(Int, Option[Int])], ref: Option[String],
                         nullableRef: Boolean = true)

  /** Brute-force reference implementation over plain collections.
    * Nullable edge: a NULL FK survives vacuously. Non-nullable edge: a
    * NULL FK (or a dangling one) kills the row. */
  private def bruteForce(tables: Seq[Tbl], killed: Map[String, Set[Int]]): Map[String, Set[Int]] = {
    var surviving: Map[String, Set[Int]] = tables.map(t =>
      t.name -> t.rows.map(_._1).filterNot(killed.getOrElse(t.name, Set.empty)).toSet).toMap
    var changed = true
    while (changed) {
      changed = false
      for (t <- tables; parent <- t.ref) {
        val keep = t.rows.collect {
          case (id, fk) if surviving(t.name)(id) &&
            (if (t.nullableRef) fk.forall(surviving(parent))
             else fk.exists(surviving(parent))) => id
        }.toSet
        if (keep != surviving(t.name)) { surviving += t.name -> keep; changed = true }
      }
    }
    surviving
  }

  test("planner matches brute-force fix-point on 12 random graphs") {
    runTrials(seed = 20260812L, trials = 12, mixedNullability = false)
  }

  test("planner matches brute-force fix-point with mixed FK nullability") {
    // non-nullable edges: NULL/dangling FKs kill rows instead of escaping
    runTrials(seed = 31415926L, trials = 12, mixedNullability = true)
  }

  test("self-FK path doubling resolves a 4096-deep chain (one-hop loop could not)") {
    // linear chain id -> id-1, root id=0 fails the cond: every row's
    // ancestor chain hits the failure, so NOTHING survives. Depth 4096
    // needs 4096 one-hop iterations (>> maxIter=50) but only ~13 doubling
    // rounds — this passing at default maxIter proves the O(log depth)
    // path is taken and correct.
    val n = 4096
    val rows = (0 until n).map(id => (id, if (id == 0) None else Some(id - 1)))
    val dfs = Map("t" -> rows.toDF("id", "fk"))
    val edges = Seq(FkRef("t", Seq("fk"), "t", Seq("id"), nullable = true))
    val out = SubsetPlanner.plan(dfs, Map("t" -> Seq("id")), edges,
      Map("t" -> Seq("id <> 0")))
    assert(out("t").count() == 0)

    // and the complement: kill a mid-chain row, everything above survives
    val out2 = SubsetPlanner.plan(dfs, Map("t" -> Seq("id")), edges,
      Map("t" -> Seq(s"id <> ${n / 2}")))
    assert(out2("t").select("id").as[Int].collect().toSet == (0 until n / 2).toSet)
  }

  private def runTrials(seed: Long, trials: Int, mixedNullability: Boolean): Unit = {
    val rnd = new Random(seed)
    for (trial <- 1 to trials) {
      val nTables = 2 + rnd.nextInt(3)
      val names = (0 until nTables).map(i => s"t$i")
      val tables = names.zipWithIndex.map { case (n, i) =>
        // each table may reference a random other table (cycles allowed)
        val ref = if (rnd.nextBoolean()) Some(names(rnd.nextInt(nTables))) else None
        val rows = (0 until 8 + rnd.nextInt(8)).map { id =>
          val fk = if (ref.isDefined && rnd.nextDouble() > 0.15) Some(rnd.nextInt(14)) else None
          (id, fk)
        }
        Tbl(n, rows, ref.filter(_ != n || rnd.nextBoolean()), // self-refs sometimes
          nullableRef = if (mixedNullability) rnd.nextBoolean() else true)
      }
      val killed = tables.map(t =>
        t.name -> t.rows.map(_._1).filter(_ => rnd.nextDouble() < 0.25).toSet).toMap

      val expected = bruteForce(tables, killed)

      val dfs = tables.map(t => t.name -> t.rows.toDF("id", "fk")).toMap
      val edges = tables.flatMap(t => t.ref.map(p =>
        FkRef(t.name, Seq("fk"), p, Seq("id"), nullable = t.nullableRef)))
      val conds = killed.collect { case (t, ks) if ks.nonEmpty =>
        t -> Seq(s"id NOT IN (${ks.mkString(",")})")
      }
      val planned = SubsetPlanner.plan(dfs,
        tables.map(t => t.name -> Seq("id")).toMap, edges, conds)
      val actual = planned.map { case (t, df) => t -> df.select("id").as[Int].collect().toSet }

      // affected-set pruning: tables outside every cond path legitimately
      // keep dangling rows; restrict the comparison to affected tables
      val affected = {
        var set = conds.keySet
        var grew = true
        while (grew) {
          grew = false
          edges.foreach(e => if (set(e.parentTable) && !set(e.childTable)) {
            set += e.childTable; grew = true
          })
        }
        set
      }
      for (t <- names if affected(t)) {
        assert(actual(t) == expected(t),
          s"trial $trial table $t: planner=${actual(t).toSeq.sorted} " +
            s"brute=${expected(t).toSeq.sorted} killed=$killed " +
            s"edges=${edges.map(e => s"${e.childTable}->${e.parentTable}")}")
      }
    }
  }
}
