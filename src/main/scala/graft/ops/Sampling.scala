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

  /** Cluster-balanced diversity sample: the `perCell` deterministic
    * representatives of every k-means cell — the cluster-coverage sampler
    * for curation (take a few documents from EVERY semantic region instead
    * of `percent` dominated by the head clusters; the SemDeDup/DSIR-style
    * complement to uniform sampling). Cell assignment is the shuffle-free
    * argmax projection of [[SimilaritySearch.withIvfCell]]; ranking inside
    * a cell orders by md5(id) — the same engine-portable, append-stable
    * coin as [[hashBucket]] — via one window partitioned by cell (per-cell
    * state is bounded by cell width, which the centroid count controls).
    */
  def clusterSample(emb: org.apache.spark.sql.DataFrame, idCol: String,
                    vecCol: String, centroids: Seq[Seq[Double]],
                    perCell: Int): org.apache.spark.sql.DataFrame = {
    require(perCell > 0, "perCell must be positive")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("cell"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    SimilaritySearch.withIvfCell(emb, vecCol, centroids, "cell")
      .select(col("cell"), col(idCol))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= perCell)
      .select(col("cell"), col(idCol))
  }

  /** DuckDB oracle reproducing [[clusterSample]]: centroids by the
    * deterministic `$idCol < n` rule, the same argmax assignment, the same
    * md5 within-cell order. */
  def clusterSampleOracleSql(table: String, idCol: String, vecCol: String,
                             nCentroids: Int, perCell: Int): String =
    s"""WITH e0 AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS cid, ev AS cvec FROM e0 WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, cid AS cell FROM (
           SELECT e0.$idCol, c.cid,
             row_number() OVER (PARTITION BY e0.$idCol
               ORDER BY list_dot_product(e0.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.cid) AS rn
           FROM e0, cents c) WHERE rn = 1)
       SELECT CAST(cell AS INT) AS cell, $idCol FROM (
         SELECT $idCol, cell,
           row_number() OVER (PARTITION BY cell
             ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS rn
         FROM asg) WHERE rn <= $perCell
       ORDER BY cell, $idCol"""

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

  /** Token-budget mixture sampling: carve a training mixture with an
    * explicit per-domain TOKEN budget (the Pile/DoReMi-style mixture
    * weights, stated as budgets so the arithmetic stays integer). Within
    * each domain, documents rank by the md5-of-id coin (engine-portable,
    * append-stable — the same order every engine and rerun derives) and
    * survive while their running token total fits the domain's budget.
    *
    * One window shuffle partitioned by domain; cumulative sums are LONGs
    * (exact). Domains absent from `budgets` drop (inner join against the
    * broadcast budget table). At 100 TB a domain is typically still a small
    * fraction of the corpus; if one domain dominates a single partition's
    * memory, pre-range-partition on (domain, md5 prefix) and prefix-sum the
    * per-range totals — same algorithm, two passes.
    */
  def mixtureSample(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    domainCol: String, tokensCol: Column,
                    budgets: Map[String, Long]): org.apache.spark.sql.DataFrame = {
    require(budgets.nonEmpty && budgets.values.forall(_ >= 0L),
      "budgets must be non-empty and non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    val b = budgets.toSeq.sortBy(_._1).toDF(domainCol, "token_budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("n_tokens", tokensCol.cast("long"))
      .join(broadcast(b), Seq(domainCol))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= col("token_budget"))
      .select(col(idCol), col(domainCol), col("n_tokens"), col("cum_tokens"))
  }
}
