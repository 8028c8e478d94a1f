package graft.subset

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.FkRef

import scala.collection.mutable

/** Subset/reachability planner — the Spark rebuild of
  * `internal/db/postgres/subset/` (~2,000 LoC of generated SQL in the
  * reference). Semantics: given per-table `subset_conds`, a row survives
  * iff its own conds pass AND every FK it holds points at a surviving
  * parent row (NULL FKs survive vacuously when the ref is nullable —
  * `graph.go:556-571`).
  *
  * Where the reference synthesizes PostgreSQL join SQL / recursive CTEs
  * (`graph.go:495-618`, `675-805`), we build DataFrame plans: acyclic
  * components become left-semi / null-escape joins that Catalyst+AQE turn
  * into broadcast or shuffled hash joins as sizes dictate; cyclic SCCs run
  * a semi-naïve fix-point on PK projections with localCheckpoint per
  * iteration (no recursive CTE in Catalyst; SURVEY §7.4 scale note: iterate
  * on keys only, join back at the end).
  */
object SubsetGraph {

  /** Tarjan SCC over the FK graph. Vertices = table names; a directed edge
    * child -> parent per FK (reachability follows FK direction, matching
    * `graph.go:251-297`). Returns components in REVERSE topological order
    * of the condensed DAG (every component appears after the components it
    * points to — i.e. parents first). */
  def sccs(tables: Seq[String], edges: Seq[FkRef]): Seq[Seq[String]] = {
    val adj = edges.groupBy(_.childTable).view.mapValues(_.map(_.parentTable)).toMap
    val index = mutable.Map[String, Int]()
    val low = mutable.Map[String, Int]()
    val onStack = mutable.Set[String]()
    val stack = mutable.Stack[String]()
    var counter = 0
    val out = mutable.ArrayBuffer[Seq[String]]()

    def strongConnect(v: String): Unit = {
      index(v) = counter; low(v) = counter; counter += 1
      stack.push(v); onStack += v
      for (w <- adj.getOrElse(v, Nil) if tables.contains(w)) {
        if (!index.contains(w)) { strongConnect(w); low(v) = math.min(low(v), low(w)) }
        else if (onStack(w)) low(v) = math.min(low(v), index(w))
      }
      if (low(v) == index(v)) {
        val comp = mutable.ArrayBuffer[String]()
        var w = ""
        while ({ w = stack.pop(); onStack -= w; comp += w; w != v }) ()
        out += comp.toSeq
      }
    }
    tables.foreach(t => if (!index.contains(t)) strongConnect(t))
    // Tarjan emits components in reverse topological order of the
    // condensation (a component is emitted only after everything it can
    // reach) — exactly the parents-first processing order we need.
    out.toSeq
  }

  /** Topological order of tables for restore (children after parents) —
    * `graph.go:622-653`. Cyclic groups stay grouped. */
  def restoreOrder(tables: Seq[String], edges: Seq[FkRef]): Seq[Seq[String]] =
    sccs(tables, edges)

  /** Detect whether a component of size>=1 contains a cycle (self-FK or
    * multi-table loop) — `component.go:95-153`. */
  def hasCycle(component: Seq[String], edges: Seq[FkRef]): Boolean =
    component.size > 1 ||
      edges.exists(e => e.childTable == component.head && e.parentTable == component.head)
}

object SubsetPlanner {
  import SubsetGraph._

  /** Compute surviving-row DataFrames for every table.
    *
    * @param dfs         table name -> full DataFrame
    * @param pks         table name -> PK columns
    * @param edges       FK references (incl. virtual / polymorphic)
    * @param conds       table name -> subset cond SQL fragments (ANDed)
    * @param maxIter     fix-point safety bound for cyclic SCCs
    */
  def plan(dfs: Map[String, DataFrame], pks: Map[String, Seq[String]],
           edges: Seq[FkRef], conds: Map[String, Seq[String]],
           maxIter: Int = 50): Map[String, DataFrame] = {
    val tables = dfs.keys.toSeq
    val allEdges = edges.filter(e => dfs.contains(e.childTable) && dfs.contains(e.parentTable))
    // Affected-set pruning (mirrors the reference, which only generates
    // subset queries along paths that reach a cond — unconditioned parents
    // keep all rows, so semi-joining against them is a no-op): a table is
    // affected iff it has conds or any FK parent is affected.
    val affected = {
      val set = mutable.Set[String]()
      conds.collect { case (t, cs) if cs.nonEmpty && dfs.contains(t) => set += t }
      var grew = true
      while (grew) {
        grew = false
        allEdges.foreach { e =>
          if (set(e.parentTable) && !set(e.childTable)) { set += e.childTable; grew = true }
        }
      }
      set.toSet
    }
    val relevantEdges = allEdges.filter(e => affected(e.parentTable))
    val surviving = mutable.Map[String, DataFrame]()

    def baseFiltered(t: String): DataFrame =
      conds.getOrElse(t, Nil).foldLeft(dfs(t))((d, c) => d.filter(expr(c)))

    /** Filter `child` rows to those whose FK points into the surviving
      * parent keys (semi-join), with NULL-escape for nullable FKs and the
      * polymorphic guard ANDed in (`graph.go:581-615`). Parent key columns
      * are re-aliased to fresh names so self-referencing FKs (same table on
      * both sides) never hit Spark's ambiguous-self-join detection.
      * When the referenced columns ARE the parent's primary key they are
      * unique by catalog metadata — the distinct() (an extra shuffle+agg
      * per edge) is skipped; left_semi joins tolerate build-side dups
      * anyway, so distinct only matters for the left_outer escape path. */
    def applyEdge(child: DataFrame, e: FkRef, parentSurviving: DataFrame): DataFrame = {
      val fresh = e.parentCols.map(c => s"__graft_p_$c")
      val isPk = pks.get(e.parentTable).contains(e.parentCols)
      val rawKeys = parentSurviving.select(e.parentCols.map(col): _*)
      val parentKeys = (if (isPk) rawKeys else rawKeys.distinct()).toDF(fresh: _*)
      val joinCond = e.childCols.zip(fresh)
        .map { case (c, p) => child(c) === parentKeys(p) }.reduce(_ && _)
      if (e.nullable || e.polymorphicCond.isDefined) {
        // keep rows where FK is NULL, or the polymorphic guard doesn't
        // match, or the parent survives: left_outer + escape filter
        val marked = parentKeys.withColumn("__hit__", lit(1))
        val joined = child.join(
          marked, e.childCols.zip(fresh).map { case (c, p) => child(c) === marked(p) }.reduce(_ && _),
          "left_outer")
        val nullEscape = e.childCols.map(c => child(c).isNull).reduce(_ || _)
        val polyEscape = e.polymorphicCond.map(c => !expr(c)).getOrElse(lit(false))
        joined.filter(col("__hit__").isNotNull || nullEscape || polyEscape)
          .select(child.columns.map(child(_)).toIndexedSeq: _*)
      } else {
        child.join(parentKeys, joinCond, "left_semi")
      }
    }

    // Process components parents-first (Tarjan order is already reverse
    // topological = parents before children).
    for (comp <- sccs(tables, relevantEdges)) {
      if (!hasCycle(comp, relevantEdges)) {
        val t = comp.head
        val outgoing = relevantEdges.filter(_.childTable == t)
        val filtered = outgoing.foldLeft(baseFiltered(t)) { (d, e) =>
          applyEdge(d, e, surviving(e.parentTable))
        }
        surviving(t) = filtered
      } else {
        // Cyclic SCC: semi-naïve fix-point on PK projections
        // (recursive-CTE semantics of graph.go:675-805).
        val inComp = comp.toSet
        val external = relevantEdges.filter(e => inComp(e.childTable) && !inComp(e.parentTable))
        val internal = relevantEdges.filter(e => inComp(e.childTable) && inComp(e.parentTable))
        // Pure self-FK component (employee→manager): path-doubling beats
        // the one-hop-per-iteration loop — O(log depth) shuffle rounds
        // instead of O(depth), the difference between 10 and 1000 rounds
        // on a deep hierarchy at scale.
        val selfFk = (comp, internal) match {
          case (Seq(t), Seq(e)) if e.childCols.size == 1 && e.parentCols.size == 1 &&
            pks.get(t).contains(e.parentCols) && e.polymorphicCond.isEmpty =>
            Some((t, e))
          case _ => None
        }
        /** Rows of `child` that FAIL edge `e` against `parentSurviving` —
          * the exact complement of [[applyEdge]] (same parent-key
          * projection, same null/polymorphic escapes, negated). */
        def edgeVictims(child: DataFrame, e: FkRef, parentSurviving: DataFrame): DataFrame = {
          val fresh = e.parentCols.map(c => s"__graft_p_$c")
          val isPk = pks.get(e.parentTable).contains(e.parentCols)
          val rawKeys = parentSurviving.select(e.parentCols.map(col): _*)
          val parentKeys = (if (isPk) rawKeys else rawKeys.distinct()).toDF(fresh: _*)
          val joinCond = e.childCols.zip(fresh)
            .map { case (c, p) => child(c) === parentKeys(p) }.reduce(_ && _)
          if (e.nullable || e.polymorphicCond.isDefined) {
            val marked = parentKeys.withColumn("__hit__", lit(1))
            val joined = child.join(marked,
              e.childCols.zip(fresh).map { case (c, p) => child(c) === marked(p) }.reduce(_ && _),
              "left_outer")
            val nullEscape = e.childCols.map(c => child(c).isNull).reduce(_ || _)
            val polyEscape = e.polymorphicCond.map(c => !expr(c)).getOrElse(lit(false))
            joined.filter(col("__hit__").isNull && !nullEscape && !polyEscape)
              .select(child.columns.map(child(_)).toIndexedSeq: _*)
          } else {
            child.join(parentKeys, joinCond, "left_anti")
          }
        }

        /** Parent keys of edge `e` that lost their LAST supporting row in
          * the previous round: the deletion frontier children must check.
          * When the referenced cols are the parent's PK, every removed
          * row's key is dead by uniqueness; otherwise keys still present
          * in the surviving parent are filtered out via one parent SCAN
          * against the (tiny, broadcastable) candidate set — never a
          * full-table shuffle. */
        def deadKeys(e: FkRef, removedParent: DataFrame, parentNow: DataFrame): DataFrame = {
          val cand = removedParent.select(e.parentCols.map(col): _*).distinct()
          if (pks.get(e.parentTable).contains(e.parentCols)) cand
          else {
            val supported = parentNow.select(e.parentCols.map(col): _*)
              .join(cand, e.parentCols, "left_semi").distinct()
            cand.join(supported, e.parentCols, "left_anti")
          }
        }

        /** Split `d` by the dead-key frontier of edge `e`: (kept, victims).
          * NULL FKs never equi-match (the null escape, implicitly); a
          * polymorphic guard rides the join condition so non-matching
          * rows are untouchable, mirroring [[applyEdge]]'s escape. */
        def splitByDeadKeys(d: DataFrame, e: FkRef, dead: DataFrame): (DataFrame, DataFrame) = {
          val fresh = e.parentCols.map(c => s"__graft_p_$c")
          val keyed = dead.toDF(fresh: _*)
          val keyCond = e.childCols.zip(fresh)
            .map { case (c, p) => d(c) === keyed(p) }.reduce(_ && _)
          val full = e.polymorphicCond.map(c => keyCond && expr(c)).getOrElse(keyCond)
          (d.join(keyed, full, "left_anti"), d.join(keyed, full, "left_semi"))
        }

        // DELTA-ITERATION (r16): the r13-r15 Jacobi loop refiltered EVERY
        // table against EVERY parent's FULL key set each round — O(rounds
        // × table size) shuffle-join work even when a round deletes three
        // rows (the 25-round soak exponent 0.32-0.34 lived here). Survival
        // w.r.t. an edge can only flip when a matching parent KEY loses
        // its last supporting row, so each round now (1) projects the
        // previous round's REMOVED rows to per-edge dead-key frontiers
        // (delta-sized, AQE broadcasts them), (2) anti-joins each child
        // against its frontiers — one scan of the checkpointed table with
        // broadcast-sized exchanges, no full-table shuffle — and (3)
        // captures the semi-join complement as the next frontier. Round 1
        // is the one full Jacobi pass (it seeds the frontier); the fixed
        // point is the same greatest fixed point by monotonicity (sets
        // only shrink; a key's death is detected the round after its last
        // support dies). Tables whose frontiers are empty are untouched —
        // quiescent tables cost nothing, matching the semi-naive
        // discipline entityClusters uses.
        // TOMBSTONE MODE (r17 experiment, VERDICT r16 #4): instead of
        // localCheckpoint-REWRITING every shrinking table each round
        // (write volume = table size × shrinking rounds — the remaining
        // super-linear term at cluster scale), accumulate per-table
        // dead-PK tombstone sets (checkpointed, delta+cumulative sized)
        // and evaluate each table as ONE lazy anti-join
        // base ⟕̸ tombstone — lineage depth stays constant because both
        // sides are checkpoint leaves, and the only per-round writes are
        // the (tiny) frontier and the grown tombstone. The fixed point
        // is unchanged: deletions are monotone, and a view built from
        // base minus all accumulated deletions equals the rewritten
        // table by induction. Requires a declared PK on every component
        // table (the subtraction key); falls back to rewrite mode
        // otherwise. Toggle: SPARK_GRAFT_SUBSET_TOMBSTONE=0 forces
        // rewrite mode (the A/B lever FixpointSoak measures).
        val tombstoneMode =
          !sys.env.get("SPARK_GRAFT_SUBSET_TOMBSTONE").contains("0") &&
            comp.forall(t => pks.get(t).exists(_.nonEmpty))
        def runFixPoint(): Unit = {
          import graft.plans.Checkpoints.unpersistCheckpoint
          // round 1 below is a full Jacobi pass, so a zero budget must
          // refuse up front — the pre-delta loop's contract
          if (maxIter < 1) throw new IllegalStateException(
            s"subset: cyclic fix-point did not converge after $maxIter iterations " +
              s"for component ${comp.mkString(",")} — raise maxIter")
          // seed: own conds + external edges (already-final parents)
          var current: Map[String, DataFrame] = comp.map { t =>
            val seeded = external.filter(_.childTable == t)
              .foldLeft(baseFiltered(t))((d, e) => applyEdge(d, e, surviving(e.parentTable)))
            t -> seeded.localCheckpoint(true)
          }.toMap
          val byChild = internal.groupBy(_.childTable)
          // round 1 — full Jacobi refilter; per-edge victims seed the frontier
          var removed: Map[String, DataFrame] = Map.empty
          var removedCount: Map[String, Long] = Map.empty.withDefaultValue(0L)
          locally {
            val stepped = comp.flatMap { t =>
              byChild.get(t).map { es =>
                val survivors = es.foldLeft(current(t))((dd, e) =>
                  applyEdge(dd, e, current(e.parentTable)))
                val victims = es.map(e => edgeVictims(current(t), e, current(e.parentTable)))
                  .reduce(_ unionByName _)
                t -> (survivors.localCheckpoint(true), victims.localCheckpoint(true))
              }
            }.toMap
            removed = stepped.map { case (t, (_, v)) => t -> v }
            removedCount = removed.map { case (t, v) => t -> v.count() }
              .withDefaultValue(0L)
            stepped.foreach { case (t, (d, _)) =>
              unpersistCheckpoint(current(t))
              current = current.updated(t, d)
            }
          }
          // tombstone mode: `current` stays the round-1 base forever;
          // deletions accumulate in per-table dead-PK sets and every
          // consumer reads the table through this one lazy anti-join
          // (two checkpoint leaves — constant lineage depth)
          var tomb: Map[String, DataFrame] = Map.empty
          def view(t: String): DataFrame =
            tomb.get(t).fold(current(t))(k =>
              current(t).join(k, pks(t), "left_anti"))
          var iter = 1
          var active = removedCount.values.exists(_ > 0)
          while (active && iter < maxIter) {
            val deads = internal.flatMap { e =>
              if (removedCount(e.parentTable) == 0L) None
              else Some(e -> deadKeys(e, removed(e.parentTable), view(e.parentTable)))
            }
            val stepped = deads.groupBy(_._1.childTable).map { case (t, es) =>
              var d = view(t)
              val victims = es.map { case (e, dead) =>
                val (kept, vict) = splitByDeadKeys(d, e, dead)
                d = kept
                vict
              }
              t -> (d, victims.reduce(_ unionByName _))
            }
            // materialize the new frontier FIRST (it reads the old
            // checkpoints), then the shrunken tables / grown tombstones,
            // then release the superseded round's blocks (VERDICT r3
            // "What's wrong #2")
            val newRemoved = stepped.map { case (t, (_, v)) => t -> v.localCheckpoint(true) }
            val newCounts = newRemoved.map { case (t, v) => t -> v.count() }
            if (tombstoneMode) {
              // victims came from view(t), so their PKs are disjoint from
              // the existing tombstone — the union never needs a distinct
              val grown = newRemoved.collect { case (t, v) if newCounts(t) > 0L =>
                val add = v.select(pks(t).map(col): _*)
                t -> tomb.get(t).fold(add)(_ unionByName add).localCheckpoint(true)
              }
              removed.values.foreach(unpersistCheckpoint)
              grown.keys.foreach(t => tomb.get(t).foreach(unpersistCheckpoint))
              newRemoved.foreach { case (t, v) =>
                if (newCounts(t) == 0L) unpersistCheckpoint(v)
              }
              tomb = tomb ++ grown
            } else {
              val changed = stepped.collect { case (t, (d, _)) if newCounts(t) > 0L =>
                t -> d.localCheckpoint(true)
              }
              removed.values.foreach(unpersistCheckpoint)
              changed.keys.foreach(t => unpersistCheckpoint(current(t)))
              newRemoved.foreach { case (t, v) =>
                if (newCounts(t) == 0L) unpersistCheckpoint(v)
              }
              current = current ++ changed
            }
            removed = newRemoved.filter { case (t, _) => newCounts(t) > 0L }
            removedCount = removed.map { case (t, v) => t -> newCounts(t) }
              .withDefaultValue(0L)
            active = newCounts.values.exists(_ > 0L)
            iter += 1
          }
          // The reference's recursive CTE is exact; returning an
          // unconverged result silently would keep child rows whose parents
          // were excluded (FK-violating restore). Fail loudly instead.
          if (active) throw new IllegalStateException(
            s"subset: cyclic fix-point did not converge after $maxIter iterations " +
              s"for component ${comp.mkString(",")} — raise maxIter")
          removed.values.foreach(unpersistCheckpoint)
          graft.plans.FixpointStats.record("cyclicSubset", iter)
          comp.foreach(t => surviving(t) = view(t))
        }

        selfFk match {
          case Some((t, e)) =>
            val seeded = external.filter(_.childTable == t)
              .foldLeft(baseFiltered(t))((d, x) => applyEdge(d, x, surviving(x.parentTable)))
            surviving(t) = selfFkClosure(dfs(t), seeded, e)
          case None => runFixPoint()
        }
      }
    }
    surviving.toMap
  }

  /** Path-doubling survival closure for a single self-referencing FK
    * (`fk` → own `pk`). A row survives iff every row on its ancestor chain
    * is in `seeded` (its own conds + external edges) and the chain
    * terminates legally (NULL fk when the edge is nullable) or closes into
    * an all-surviving cycle — the same greatest fixed point the generic
    * loop computes, reached in O(log depth) rounds instead of O(depth).
    *
    * State per row: `(__id, __anc, __bad)` where `__anc` is the 2^k-th
    * ancestor after k rounds and `__bad` accumulates "some ancestor within
    * the covered window fails". Each round doubles the window with ONE
    * equi-join of the state against itself; the cap ceil(log2(n))+1
    * guarantees the window spans any chain or cycle, so an all-good cycle
    * (never "live"-exhausted) still terminates with complete coverage. */
  private def selfFkClosure(base: DataFrame, seeded: DataFrame, e: FkRef): DataFrame = {
    import graft.plans.Checkpoints
    val pk = e.parentCols.head
    val fk = e.childCols.head
    val ancType = base.schema(fk).dataType
    // every base row stays in the state — excluded rows carry __bad=true so
    // descendants chaining through them see the failure
    val okMark = seeded.select(col(pk).as("__p"), lit(1).as("__ok"))
    val bad0 = col("__ok").isNull ||
      (if (e.nullable) lit(false) else col("__anc").isNull)
    var state = base.select(col(pk).as("__id"), col(fk).as("__anc"))
      .join(okMark, col("__id") === col("__p"), "left_outer")
      .select(col("__id"), col("__anc"), bad0.as("__bad"))
      .localCheckpoint(true)
    val n = state.count()
    val cap = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n)).toInt + 1
    var iter = 0
    def live() = state.filter(col("__anc").isNotNull && !col("__bad")).limit(1).count() > 0
    while (iter < cap && live()) {
      val anc = state.select(col("__id").as("__aid"), col("__anc").as("__anc2"),
        col("__bad").as("__abad"))
      val next = state.join(anc, col("__anc") === col("__aid"), "left_outer")
        .select(col("__id"),
          when(col("__anc").isNull || col("__aid").isNull, lit(null).cast(ancType))
            .otherwise(col("__anc2")).as("__anc"),
          (col("__bad") ||
            when(col("__anc").isNull, lit(false))
              // non-NULL fk with no matching pk row: dangling ref, dead end
              .when(col("__aid").isNull, lit(true))
              .otherwise(col("__abad"))).as("__bad"))
        .localCheckpoint(true)
      Checkpoints.unpersistCheckpoint(state)
      state = next
      iter += 1
    }
    graft.plans.FixpointStats.record("selfFkClosure", iter)
    val good = state.filter(!col("__bad")).select(col("__id").as("__gid"))
    base.join(good, col(pk) === col("__gid"), "left_semi")
  }
}
