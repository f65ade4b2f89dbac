package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceTopK]]: exact cosine top-k against a query vector — one
  *   codegen'd scan + a k-row TakeOrdered. The correctness baseline, and at
  *   100 TB still viable per-query because it is embarrassingly parallel and
  *   reads only the (id, vector) columns.
  * - [[lshTopK]]: SRP-LSH bucketed variant — candidates restricted to
  *   signatures within a Hamming radius of the query's signature, then exact
  *   cosine on the survivors. The scan prunes to P(bucket) of the data;
  *   radius trades recall for cost.
  * - [[ivfTopK]]: IVF-style two-stage — a sampled centroid table (train once,
  *   broadcast), probe the nProbe nearest centroids, exact cosine within
  *   those partitions only.
  */
object SimilaritySearch {

  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    emb.select(col(idCol),
        VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, dim: Int,
              nBits: Int = 16, radius: Int = 2, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.Column
    val qSig: Column = {
      // signature of the literal query vector, evaluated by Catalyst constant folding
      val qv = array(query.map(lit): _*)
      VectorFns.srpSignature(qv, dim, nBits, seed)
    }
    emb.select(col(idCol), col(vecCol),
        VectorFns.srpSignature(col(vecCol), dim, nBits, seed).as("sig"))
      .where(VectorFns.hamming64(col("sig"), qSig) <= radius)
      .select(col(idCol), VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF: assign every vector to its nearest of `nCentroids` sampled
    * centroids (broadcast join), search only the `nProbe` centroid cells
    * closest to the query. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int,
              nCentroids: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    // deterministic "training": take the nCentroids lowest-id vectors as seeds
    // (cheap stand-in for k-means; interface is what matters — swap freely)
    val cents = emb.select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cvec"))
      .orderBy(col("cid")).limit(nCentroids)
    val withCell = emb.join(broadcast(cents))
      .withColumn("dist", -VectorFns.cosine(col(vecCol), col("cvec")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("dist"), col("cid"))))
      .where(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("cid"))
    // centroid cells nearest to the query
    val probeCells = cents
      .withColumn("qd", -VectorFns.cosineToQuery(col("cvec"), query))
      .orderBy(col("qd"), col("cid")).limit(nProbe)
      .select(col("cid"))
    withCell.join(broadcast(probeCells), Seq("cid"), "left_semi")
      .select(col(idCol), VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
