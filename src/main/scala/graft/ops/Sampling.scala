package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic training-data splits and samples.
  *
  * Assignment derives from the md5 of the id's TEXT form — no RNG, no seed,
  * no partition-order dependence — so the same row lands in the same split
  * on every engine, every rerun, and every reshard (and an ANSI SQL oracle
  * reproduces the carve bit-for-bit). The standard pattern for carving
  * train/val/test out of a 100 TB corpus: a pure codegen'd projection, zero
  * shuffle, stable under incremental appends.
  */
object Sampling {

  /** Uniform bucket in [0, buckets): the first 8 md5 hex digits as an
    * integer, mod `buckets`. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Split label from integer weights over a `buckets`-wide hash space,
    * e.g. `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. Buckets beyond
    * the weighted range (when weights sum below `buckets`) label null —
    * that slice IS the holdout. */
  def splitLabel(id: Column, weights: Seq[(String, Int)],
                 buckets: Int = 100): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights")
    require(weights.map(_._2).sum <= buckets, "weights exceed the bucket space")
    val b = hashBucket(id, buckets)
    var acc = 0
    var c: Column = when(lit(false), lit(null: String))
    weights.foreach { case (name, w) =>
      acc += w
      c = c.when(b < lit(acc.toLong), lit(name))
    }
    c
  }

  /** Deterministic percent sample: keep rows whose bucket falls below
    * `percent` of the space. Append-stable — new rows don't reshuffle old
    * membership the way `df.sample` reseeding does. */
  def samplePredicate(id: Column, percent: Int, buckets: Int = 100): Column =
    hashBucket(id, buckets) < lit(percent.toLong)

  /** Stratified sample: a different keep-rate per stratum value (e.g.
    * downsample English to 10% while keeping all low-resource languages).
    * Same md5-bucket mechanics — a pure projection predicate, no
    * sampleBy/RNG, membership stable under appends and reshards.
    */
  def stratifiedPredicate(id: Column, stratum: Column,
                          rates: Seq[(String, Int)], defaultRate: Int,
                          buckets: Int = 100): Column = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= buckets),
      "rates must lie in [0, buckets]")
    val b = hashBucket(id, buckets)
    val rate = rates.foldLeft(when(lit(false), lit(0))) {
      case (c, (v, r)) => c.when(stratum === lit(v), lit(r))
    }.otherwise(lit(defaultRate))
    b < rate.cast("long")
  }
}
