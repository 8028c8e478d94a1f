package graft.generators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The `random` engine — the non-deterministic counterpart of [[Gen]]'s
  * hash engine (reference engine selection `transformers/default_params.go:
  * 11-50`, PRNG seeding `transformers/utils.go:30-38`).
  *
  * Semantics mirror the reference: same limiters, but the uniform stream
  * comes from a PRNG instead of the input hash, so outputs are NOT
  * FK-consistent and NOT reproducible across runs (unless a seed is
  * pinned). Spark caveat (SURVEY §7.4): `rand(seed)` is deterministic PER
  * PARTITION SPLIT — reproducible for a fixed partitioning only. The
  * expressions stay `Nondeterministic`, so Catalyst will not collapse or
  * re-order them through joins (`SURVEY §4` deterministic-function caveat).
  */
object RandomEngine {

  /** Uniform Long in [0, 2^60) from the session PRNG. */
  def u60(seed: Option[Long] = None): Column = {
    val r = seed.fold(rand())(rand(_))
    floor(r * lit(Gen.U60Max.toDouble)).cast("long")
  }

  def longBetween(min: Long, max: Long, seed: Option[Long] = None): Column = {
    require(min <= max, s"longBetween: min ($min) must be <= max ($max)")
    lit(min) + (u60(seed) % lit(max - min + 1L))
  }

  def doubleBetween(min: Double, max: Double, decimals: Int, seed: Option[Long] = None): Column = {
    require(min <= max && decimals >= 0 && decimals <= 15, "doubleBetween: bad limits")
    val scale = math.pow(10, decimals).toLong
    val steps = math.round((max - min) * scale)
    lit(min) + (u60(seed) % lit(steps + 1L)).cast("double") / lit(scale).cast("double")
  }

  def bool(seed: Option[Long] = None): Column = u60(seed) % 2 === 0

  def pick(n: Int, seed: Option[Long] = None): Column = {
    require(n > 0, "pick: n must be positive")
    (u60(seed) % lit(n.toLong)).cast("int") + lit(1)
  }

  def choice(values: Seq[String], seed: Option[Long] = None): Column =
    element_at(array(values.map(lit): _*), pick(values.size, seed))

  def timestampBetween(minEpoch: Long, maxEpoch: Long, seed: Option[Long] = None): Column =
    timestamp_seconds(longBetween(minEpoch, maxEpoch, seed))
}
