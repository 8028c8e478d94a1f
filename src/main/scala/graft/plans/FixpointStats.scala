package graft.plans

/** Last-run iteration counts of the fix-point operators, keyed by op name.
  * Written by the operators themselves (one `put` per run — no hot-path
  * cost) and read by ScaleSoakSpec, which pins the scale contract with
  * evidence instead of plan-shape argument: growing the corpus 10x must
  * NOT grow iteration counts (label propagation converges in diameter
  * hops and path doubling in log2(depth) rounds — both functions of graph
  * SHAPE, not row count). */
object FixpointStats {
  private val counts = new java.util.concurrent.ConcurrentHashMap[String, Int]()
  def record(op: String, iters: Int): Unit = counts.put(op, iters)
  def last(op: String): Option[Int] = Option(counts.get(op))
}
