package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `Array[Float]`/`Array[Double]` columns.
  * Pure Catalyst (`zip_with`/`aggregate`) — vector math stays inside codegen
  * with zero shuffles, which is the only viable form at 100 TB of vectors.
  */
object VectorFns {

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(d(a), x => x * x), lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine against a constant query vector (literal array — broadcast-free). */
  def cosineToQuery(a: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    cosine(a, q)
  }

  /** Random-hyperplane (sign) LSH signature: `nBits` deterministic
    * pseudo-random hyperplanes derived from a seed; bit i = sign(dot(v, h_i)).
    * Buckets collide for nearby directions — the classic SRP-LSH scheme for
    * cosine similarity. Returns a compact Long bucket id.
    */
  def srpSignature(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column = {
    val rng = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian()))
    srpSignaturePlanes(vec, planes)
  }

  /** Signature from explicit hyperplanes (shared with the oracle SQL
    * generator so both engines hash identically). */
  def srpSignaturePlanes(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(vec, array(p.map(lit): _*))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Hamming distance between two SRP signatures (Long bucket ids). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
