package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Similarity search over an embedding column, structured as
  * **index build** (one codegen'd projection adding a bucket column —
  * persist it once, e.g. through `PipeStorage`) plus **probe** (partition /
  * bucket-pruned scan). Nothing here joins, windows, or shuffles the vector
  * table: at 100 TB the index column is written once at ingest and every
  * query reads only its buckets.
  *
  * - [[bruteForceTopK]]: exact cosine top-k — one scan + k-row TakeOrdered.
  *   The correctness baseline and the recall oracle for the ANN variants.
  * - [[withSrpSignature]] / [[lshTopK]]: sign-random-projection LSH
  *   (Charikar '02 cosine sketches). Build stamps a 64-bit signature per
  *   vector in a single projection; probe keeps signatures within a Hamming
  *   radius of the query's signature, then ranks the survivors by exact
  *   cosine.
  * - [[sampleCentroids]] / [[withIvfCell]] / [[ivfTopK]]: IVF. Centroids are
  *   a deterministic bounded sample collected to the driver (nCentroids
  *   vectors — a few KB) and embedded as literals; cell assignment is an
  *   argmax over a literal score array — **no join, no window, no shuffle**.
  *   Probe searches only the nProbe cells nearest the query.
  *
  * Every pipeline is reproducible in ANSI SQL: the hyperplanes/centroids are
  * deterministic and the `*OracleSql` generators emit DuckDB SQL from the
  * SAME coefficients, so the driver's oracle verifies signatures, bucketing,
  * pruning, and final ranking exactly (reference ground truth is the
  * brute-force scan, meerschaum has no ANN surface).
  */
object SimilaritySearch {

  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame =
    emb.select(col(idCol),
        VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)

  // ── SRP-LSH ────────────────────────────────────────────────────────────

  /** Deterministic random hyperplanes shared by the Spark expression and the
    * oracle SQL generator. */
  def srpPlanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Index build: stamp the SRP signature as a column in one codegen'd
    * projection. Persist the result (bucket/sort by `sigCol`) so probes read
    * buckets instead of re-hashing the corpus. */
  def withSrpSignature(emb: DataFrame, vecCol: String,
                       planes: Seq[Seq[Double]], sigCol: String = "sig"): DataFrame =
    emb.withColumn(sigCol, VectorFns.srpSignaturePlanes(col(vecCol), planes))

  /** Driver-side signature of a query vector (same arithmetic orientation as
    * the engine: left-to-right dot fold, `>= 0` sign). */
  def srpSignatureOf(query: Seq[Double], planes: Seq[Seq[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = p.zip(query).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
      if (proj >= 0) 1L << i else 0L
    }.sum

  /** Probe a signature-indexed table: Hamming-radius candidate filter, exact
    * cosine ranking of the survivors. */
  def lshTopK(indexed: DataFrame, idCol: String, vecCol: String, sigCol: String,
              query: Seq[Double], planes: Seq[Seq[Double]],
              k: Int, radius: Int): DataFrame = {
    val qSig = srpSignatureOf(query, planes)
    indexed
      .where(VectorFns.hamming64(col(sigCol), lit(qSig)) <= radius)
      .select(col(idCol), VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB oracle reproducing the ENTIRE LSH pipeline (signatures from the
    * same hyperplane literals, Hamming pruning, exact cosine ranking). */
  def lshOracleSql(table: String, idCol: String, vecCol: String,
                   planes: Seq[Seq[Double]], queryId: Long,
                   k: Int, radius: Int): String = {
    val sigExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(ev, ${p.mkString("[", ",", "]")}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       sig AS (SELECT $idCol, ev, $sigExpr AS sig FROM e),
       q AS (SELECT ev AS qv, sig AS qsig FROM sig WHERE $idCol = $queryId)
       SELECT $idCol,
         list_dot_product(ev, qv) /
         (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS cosine
       FROM sig, q
       WHERE bit_count(xor(sig, qsig)) <= $radius
       ORDER BY cosine DESC, $idCol LIMIT $k"""
  }

  // ── IVF ────────────────────────────────────────────────────────────────

  /** Deterministic centroid sample: the vectors with the `n` lowest ids.
    * Bounded driver collect (n is small); swap for k-means centroids freely —
    * everything downstream only sees `Seq[Seq[Double]]`. */
  def sampleCentroids(emb: DataFrame, idCol: String, vecCol: String, n: Int): Seq[Seq[Double]] =
    emb.where(col(idCol) < n).orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0)).toSeq

  /** Per-centroid score: dot(v, c) / |c| — argmax equals argmax of cosine
    * (|v| is constant across centroids), with |c| computed in-plan from the
    * literal so the oracle's arithmetic is bit-identical. */
  private def centroidScores(vec: Column, centroids: Seq[Seq[Double]]): Seq[Column] =
    centroids.map { c =>
      val cl = array(c.map(lit): _*)
      VectorFns.dot(vec, cl) / sqrt(VectorFns.dot(cl, cl))
    }

  /** Index build: nearest-centroid cell id in ONE projection — an argmax over
    * a literal score array. No join, no window, no shuffle; ties break to the
    * lowest cell id (array_position returns the first match). */
  def withIvfCell(emb: DataFrame, vecCol: String,
                  centroids: Seq[Seq[Double]], cellCol: String = "cell"): DataFrame = {
    val scores = array(centroidScores(col(vecCol), centroids): _*)
    // lambda-bind so the score array is evaluated once, not once per reference
    val cell = element_at(transform(array(scores), s =>
      array_position(s, array_max(s)) - 1), 1)
    emb.withColumn(cellCol, cell.cast("int"))
  }

  /** Distributed spherical k-means (Lloyd's) for production IVF centroids:
    * assignment is the same argmax-over-literal-centroids projection as the
    * index build (no join, no window), and the update step is ONE
    * posexplode + hash aggregate per iteration — per-dimension means with
    * map-side partial aggregation, collecting only k×dim cell means
    * (bounded driver state). Empty clusters keep their previous centroid.
    * Deterministic given the deterministic init ([[sampleCentroids]]), so
    * runs are reproducible; the sampled init alone is the oracle-checkable
    * configuration. */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      k: Int, iterations: Int = 5): Seq[Seq[Double]] = {
    var cents = sampleCentroids(emb, idCol, vecCol, k)
    val dim = cents.head.length
    for (_ <- 1 to iterations) {
      val assigned = withIvfCell(emb, vecCol, cents, "__graft_cell")
      val means = assigned
        .select(col("__graft_cell"), posexplode(col(vecCol).cast("array<double>")))
        .groupBy(col("__graft_cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          val v = new Array[Double](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          cell -> v.toSeq
        }
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** Driver-side probe-cell selection: the nProbe centroids nearest to the
    * query (same score formula as the build side). */
  def ivfProbeCells(centroids: Seq[Seq[Double]], query: Seq[Double], nProbe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      val dot   = c.zip(query).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
      val cnorm = math.sqrt(c.zip(c).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b })
      (dot / cnorm, i)
    }.sortBy { case (s, i) => (-s, i) }.take(nProbe).map(_._2)

  /** Probe a cell-indexed table: scan only the probed cells, exact cosine
    * ranking within them. */
  def ivfTopK(indexed: DataFrame, idCol: String, vecCol: String, cellCol: String,
              query: Seq[Double], centroids: Seq[Seq[Double]],
              k: Int, nProbe: Int): DataFrame = {
    val probe = ivfProbeCells(centroids, query, nProbe)
    indexed
      .where(col(cellCol).isin(probe: _*))
      .select(col(idCol), VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB oracle reproducing the ENTIRE IVF pipeline. Centroids are
    * re-derived by the same deterministic rule ($idCol < nCentroids) so the
    * oracle is data-independent of the Spark run. */
  def ivfOracleSql(table: String, idCol: String, vecCol: String,
                   nCentroids: Int, nProbe: Int, queryId: Long, k: Int): String =
    s"""WITH cents AS (
         SELECT $idCol AS cid, CAST($vecCol AS DOUBLE[]) AS cvec
         FROM $table WHERE $idCol < $nCentroids),
       e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       a AS (
         SELECT e.$idCol, e.ev, c.cid,
           list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) AS score
         FROM e, cents c
         QUALIFY row_number() OVER (PARTITION BY e.$idCol ORDER BY score DESC, c.cid) = 1),
       q AS (SELECT ev AS qv FROM e WHERE $idCol = $queryId),
       probe AS (
         SELECT cid FROM cents, q
         ORDER BY list_dot_product(cvec, qv) / sqrt(list_dot_product(cvec, cvec)) DESC, cid
         LIMIT $nProbe)
       SELECT a.$idCol,
         list_dot_product(a.ev, q.qv) /
         (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
       FROM a, q WHERE a.cid IN (SELECT cid FROM probe)
       ORDER BY cosine DESC, a.$idCol LIMIT $k"""
}
