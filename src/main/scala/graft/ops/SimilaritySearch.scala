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

  /** Left-to-right double accumulation of dot(a, b) — the SAME order as the
    * codegen'd [[graft.expressions.DotProduct]] loop and DuckDB's
    * list_dot_product, so driver-side precomputed norms are bit-identical
    * to what an in-plan `dot(lit, lit)` would constant-fold to. */
  private def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Per-centroid score: dot(v, c) / |c| — argmax equals argmax of cosine
    * (|v| is constant across centroids). Each centroid is ONE `typedLit`
    * Literal node (not a 64-node CreateArray tree) and |c| is precomputed
    * driver-side with the same accumulation order, so the expression tree
    * stays small — large literal trees were measured to blow up Catalyst
    * optimization + codegen time ~30× on repeated actions. */
  private def centroidScores(vec: Column, centroids: Seq[Seq[Double]]): Seq[Column] =
    centroids.map { c =>
      VectorFns.dot(vec, typedLit(c.toArray)) / lit(math.sqrt(dotSeq(c, c)))
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

  /** Embedding-space drift between two corpus snapshots — semantic PSI,
    * the embedding analog of [[Maintenance.psiBins]]: both snapshots assign
    * to the SAME k cells (the baseline's centroids — one argmax projection,
    * no shuffle, no re-clustering) and the per-cell population shares
    * compare through the standard add-one-smoothed PSI term in exact
    * micro-nats. Catches topical / domain-mix shift between crawls that
    * scalar monitors (length, quality score) cannot see. Σ term_micro ≳
    * 0.2e6 is the usual "investigate" threshold.
    *
    * Scale: one scan per snapshot into a k-row aggregate (map-side
    * combined); centroids ride as bounded k×dim driver literals — the same
    * state class as every IVF probe. Bin arithmetic delegates to
    * [[Maintenance.psiBinsFromCounts]] with [0, k) unit-width bins, which
    * is the identity on integer cell ids, so the stored-baseline deployment
    * (persist the k-row cell counts as a pipe) works unchanged. */
  def semanticDrift(base: DataFrame, cur: DataFrame, vecCol: String,
                    centroids: Seq[Seq[Double]]): DataFrame = {
    val k = centroids.size
    require(k > 0, "need at least one centroid")
    val baseCounts = withIvfCell(base, vecCol, centroids, "__cell")
      .groupBy(col("__cell").cast("int").as("bin")).agg(count(lit(1)).as("cnt"))
    Maintenance.psiBinsFromCounts(baseCounts,
      withIvfCell(cur, vecCol, centroids, "__cell"), col("__cell"),
      0.0, k.toDouble, k)
  }

  /** DuckDB oracle replaying [[semanticDrift]]: centroids re-derived from
    * the BASE snapshot by the deterministic `$idCol < centroidMax` rule
    * ([[sampleCentroids]]), the same argmax cell assignment as the
    * semantic-dedup oracle, and the PSI tail of
    * [[Maintenance.psiBinsOracleSql]]. `bins` must equal the number of
    * centroids the rule yields. */
  def semanticDriftOracleSql(tableA: String, tableB: String, idCol: String,
                             vecCol: String, centroidMax: Int,
                             bins: Int): String = {
    def asg(src: String, out: String) =
      s"""$out AS (SELECT id, cid FROM (
           SELECT e.id, c.cid, row_number() OVER (PARTITION BY e.id
             ORDER BY list_dot_product(e.ev, c.cvec)
               / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.cid) AS rn
           FROM $src e, cents c) WHERE rn = 1)"""
    s"""WITH ea AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS ev FROM $tableA),
       eb AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS ev FROM $tableB),
       cents AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, ev AS cvec
                 FROM ea WHERE id < $centroidMax),
       ${asg("ea", "asga")},
       ${asg("eb", "asgb")},
       ga AS (SELECT CAST(cid AS INT) AS bin, count(*) AS ca FROM asga GROUP BY 1),
       gb AS (SELECT CAST(cid AS INT) AS bin, count(*) AS cb FROM asgb GROUP BY 1),
       grid AS (SELECT CAST(g.i AS INT) AS bin,
           CAST(coalesce(ga.ca, 0) AS BIGINT) AS ca,
           CAST(coalesce(gb.cb, 0) AS BIGINT) AS cb
         FROM (SELECT unnest(generate_series(0, ${bins - 1})) AS i) g
         LEFT JOIN ga ON ga.bin = g.i LEFT JOIN gb ON gb.bin = g.i),
       t AS (SELECT bin, ca, cb,
           (ca + 1.0) / CAST(sum(ca) OVER () + $bins AS DOUBLE) AS pa,
           (cb + 1.0) / CAST(sum(cb) OVER () + $bins AS DOUBLE) AS pb
         FROM grid)
       SELECT bin, ca, cb,
         CAST(round((pa - pb) * ln(pa / pb) * 1000000.0) AS BIGINT) AS term_micro
       FROM t ORDER BY bin"""
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

  /** Lloyd k-means with EXACT rational centroids — the oracle-replayable
    * trainer [[kmeansCentroids]] cannot be (its float `avg` is partition-
    * order-dependent): every centroid coordinate is carried as the exact
    * rational (Σ round(v·1e6), n) — per-dim micro-quantized coordinate
    * sums are order-independent LONGS, and the only double is the final
    * (sum/n)/1e6 division, identical in both engines. Assignment is the
    * same cosine argmax as [[withIvfCell]] (ties → lowest cell; dot
    * products accumulate left-to-right on both sides, so the argmax is
    * bit-exact cross-engine). Empty cells carry their previous rational
    * unchanged (the deterministic degenerate-case rule; init vectors are
    * rationals with n = 1).
    *
    * Scale: each iteration is ONE argmax projection + ONE k-row hash
    * aggregate carrying dim sum-columns (map-side combined — vectors never
    * shuffle, no posexplode row blow-up), collecting k×(dim+1) longs.
    * `iterations` corpus passes total, each reduction-shaped — the plan a
    * 1000-executor cluster absorbs by adding partitions.
    *
    * Returns (cell, dim) → (sumMicro, n): centroid coordinate =
    * (sumMicro.toDouble / n) / 1e6. */
  def kmeansTrainExact(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, iterations: Int): Seq[(Seq[(Long, Long)])] = {
    require(k > 0 && iterations >= 1, "need k > 0 and at least one iteration")
    val init = sampleCentroids(emb, idCol, vecCol, k)
    val dim = init.head.length
    var state: Seq[Seq[(Long, Long)]] =
      init.map(_.map(v => (math.round(v * 1e6), 1L)))
    def cents: Seq[Seq[Double]] =
      state.map(_.map { case (s, n) => (s.toDouble / n) / 1e6 })
    val ev = col(vecCol).cast("array<double>")
    for (_ <- 1 to iterations) {
      val sums = (0 until dim).map(i =>
        sum(round(element_at(col("__v"), i + 1) * lit(1e6)).cast("long")).as(s"s$i"))
      val rows = withIvfCell(emb.select(ev.as("__v")), "__v", cents, "__cell")
        .groupBy(col("__cell"))
        .agg(count(lit(1)).as("n"), sums: _*)
        .collect()
      val byCell = rows.map(r => r.getInt(0) -> r).toMap
      state = state.zipWithIndex.map { case (prev, c) =>
        byCell.get(c) match {
          case Some(r) =>
            val n = r.getLong(1)
            (0 until dim).map(i => (r.getLong(2 + i), n))
          case None => prev
        }
      }
    }
    state
  }

  /** Centroid doubles from [[kmeansTrainExact]] state — the exact division
    * both engines perform. */
  def kmeansCents(state: Seq[Seq[(Long, Long)]]): Seq[Seq[Double]] =
    state.map(_.map { case (s, n) => (s.toDouble / n) / 1e6 })

  /** [[kmeansTrainExact]] state as a DataFrame of exact longs
    * (cell, dim_idx, c_sum_micro, n_div) — the persistable/oracle-checkable
    * model artifact. */
  def kmeansModelDf(spark: org.apache.spark.sql.SparkSession,
                    state: Seq[Seq[(Long, Long)]]): DataFrame = {
    import org.apache.spark.sql.types._
    val rows = state.zipWithIndex.flatMap { case (dims, c) =>
      dims.zipWithIndex.map { case ((s, n), i) =>
        org.apache.spark.sql.Row(c.toLong, i.toLong, s, n) }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(StructField("cell", LongType), StructField("dim_idx", LongType),
        StructField("c_sum_micro", LongType), StructField("n_div", LongType))))
  }

  /** The k-means training chain as DuckDB CTEs ending in `km$iterations`
    * (cell, dim, s, n) — init = the k lowest-id vectors as (round(v·1e6), 1)
    * rationals, per-iteration argmax assignment (score DESC, cell ASC) and
    * exact micro-sum update with empty cells carrying forward. */
  private[graft] def kmeansChainCtes(table: String, idCol: String,
                                     vecCol: String, k: Int,
                                     iterations: Int): String = {
    val init =
      s"""e AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       km0 AS (
         SELECT cell, CAST(u.d.i - 1 AS BIGINT) AS dim,
           CAST(round(u.d.v * 1000000.0) AS BIGINT) AS s, CAST(1 AS BIGINT) AS n
         FROM (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, ev
               FROM e WHERE id < $k) c,
           unnest(list_transform(generate_series(1, len(c.ev)),
             i -> {'i': i, 'v': c.ev[i]})) AS u(d))"""
    val steps = (1 to iterations).map { t =>
      s"""cl$t AS (
           SELECT cell, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cvec
           FROM km${t - 1} GROUP BY cell),
         asg$t AS (
           SELECT id, ev, cell FROM (
             SELECT e.id, e.ev, c.cell,
               row_number() OVER (PARTITION BY e.id
                 ORDER BY list_dot_product(e.ev, c.cvec)
                   / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.cell) AS rn
             FROM e, cl$t c) WHERE rn = 1),
         agg$t AS (
           SELECT cell, CAST(u.d.i - 1 AS BIGINT) AS dim,
             CAST(sum(round(u.d.v * 1000000.0)) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS n
           FROM asg$t a, unnest(list_transform(generate_series(1, len(a.ev)),
             i -> {'i': i, 'v': a.ev[i]})) AS u(d)
           GROUP BY 1, 2),
         km$t AS (
           SELECT cell, dim, s, n FROM agg$t
           UNION ALL
           SELECT p.cell, p.dim, p.s, p.n FROM km${t - 1} p
           WHERE p.cell NOT IN (SELECT DISTINCT cell FROM agg$t))"""
    }.mkString(",\n       ")
    s"$init,\n       $steps"
  }

  /** Oracle for the exact k-means TRAIN query. */
  def kmeansTrainOracleSql(table: String, idCol: String, vecCol: String,
                           k: Int, iterations: Int): String =
    s"""WITH ${kmeansChainCtes(table, idCol, vecCol, k, iterations)}
       SELECT cell, dim AS dim_idx, s AS c_sum_micro, n AS n_div
       FROM km$iterations ORDER BY cell, dim"""

  /** Oracle for the IVF top-k probe over TRAINED (k-means) centroids —
    * [[ivfOracleSql]] with the sampled `cents` replaced by the training
    * chain's final centroids. */
  def ivfKmeansOracleSql(table: String, idCol: String, vecCol: String,
                         k: Int, iterations: Int, nProbe: Int, queryId: Long,
                         topK: Int): String =
    s"""WITH ${kmeansChainCtes(table, idCol, vecCol, k, iterations)},
       cents AS (
         SELECT cell AS cid, list((CAST(s AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cvec
         FROM km$iterations GROUP BY cell),
       a AS (
         SELECT e.id, e.ev, c.cid,
           list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) AS score
         FROM e, cents c
         QUALIFY row_number() OVER (PARTITION BY e.id ORDER BY score DESC, c.cid) = 1),
       q AS (SELECT ev AS qv FROM e WHERE id = $queryId),
       probe AS (
         SELECT cid FROM cents, q
         ORDER BY list_dot_product(cvec, qv) / sqrt(list_dot_product(cvec, cvec)) DESC, cid
         LIMIT $nProbe)
       SELECT a.id AS $idCol,
         list_dot_product(a.ev, q.qv) /
         (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
       FROM a, q WHERE a.cid IN (SELECT cid FROM probe)
       ORDER BY cosine DESC, a.id LIMIT $topK"""

  // ── ITQ binary hashing (Gong & Lazebnik, CVPR 2011) ────────────────────

  /** ITQ model, collapsed to deployment form: ONE affine hyperplane set —
    * bit_k(v) = [⟨v, W_k⟩ − o_k ≥ 0] where W = (PCA components)·R and
    * o_k = ⟨mean, W_k⟩. Training is the paper's alternation on the bounded
    * lowest-id sample: project to the top-nBits PCA dims (centered),
    * then iterate binarize → orthogonal Procrustes (the polar factor —
    * the OPQ machinery), all driver-side deterministic. Data-adaptive
    * binary codes: same storage as SRP-LSH, measurably better recall —
    * the A/B is [[hammingRecallReport]]'s job. */
  def itqModel(emb: DataFrame, idCol: String, vecCol: String, nBits: Int,
               nSample: Int = 256,
               iters: Int = 10): (Seq[Seq[Double]], Seq[Double]) = {
    require(nBits >= 2 && nBits <= 48, "nBits in [2, 48]")
    val (comps, _, mean) = pcaComponents(emb, idCol, vecCol, nSample, nBits)
    val sample = sampleCentroids(emb, idCol, vecCol, nSample)
    val v = sample.map(x => Array.tabulate(nBits)(j =>
      dotSeq(comps(j), x) - dotSeq(comps(j), mean))).toArray
    var r: Mat = matIdentity(nBits)
    for (_ <- 1 to iters) {
      val b = v.map { row =>
        Array.tabulate(nBits) { k =>
          var s = 0.0; var j = 0
          while (j < nBits) { s += row(j) * r(j)(k); j += 1 }
          if (s >= 0) 1.0 else -1.0
        }
      }
      val m: Mat = Array.ofDim[Double](nBits, nBits)
      var i = 0
      while (i < v.length) {
        var a = 0
        while (a < nBits) {
          val va = v(i)(a)
          if (va != 0.0) {
            var c = 0
            while (c < nBits) { m(a)(c) += va * b(i)(c); c += 1 }
          }
          a += 1
        }
        i += 1
      }
      r = polarOrthogonal(m)
    }
    val dim = comps.head.length
    val w = (0 until nBits).map(k =>
      (0 until dim).map(i => (0 until nBits).map(j => r(j)(k) * comps(j)(i)).sum))
    val offsets = w.map(wk => dotSeq(mean, wk))
    (w.map(_.toSeq), offsets.toSeq)
  }

  /** Stamp the affine binary code — one codegen'd projection, same
    * Literal-node discipline as every signature here. sign(0) = 1. */
  def withAffineSignature(emb: DataFrame, vecCol: String,
                          w: Seq[Seq[Double]], offsets: Seq[Double],
                          sigCol: String = "sig"): DataFrame = {
    val ev = col(vecCol).cast("array<double>")
    val bits = w.zip(offsets).zipWithIndex.map { case ((wk, o), k) =>
      when(VectorFns.dot(ev, typedLit(wk.toArray)) - lit(o) >= 0,
        lit(1L << k)).otherwise(lit(0L))
    }
    emb.withColumn(sigCol, bits.reduceLeft(_ + _))
  }

  /** Recall@k of Hamming-`cand` candidate lists against exact cosine
    * top-k, per query — the binary-code ship gate ([[annRecallReport]]'s
    * shape for signature indexes). `indexed` must already carry `sigCol`;
    * query codes come from the SAME in-plan expression (the query rows are
    * corpus rows). Windows partition BY QUERY over the bounded query fan. */
  def hammingRecallReport(indexed: DataFrame, idCol: String, vecCol: String,
                          sigCol: String, qids: Seq[Long], k: Int, cand: Int,
                          method: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qids.nonEmpty && k >= 1 && cand >= k, "need qids and cand >= k")
    val queries = indexed.where(col(idCol).isin(qids: _*))
      .select(col(idCol).cast("long").as("qid"),
        col(vecCol).cast("array<double>").as("qv"), col(sigCol).as("qsig"))
    val joined = indexed.select(col(idCol), col(vecCol), col(sigCol))
      .crossJoin(broadcast(queries))
    val wEx = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    val exact = joined.select(col("qid"), col(idCol),
        VectorFns.cosine(col(vecCol).cast("array<double>"), col("qv"))
          .as("cosine"))
      .withColumn("rk", row_number().over(wEx)).where(col("rk") <= k)
      .select(col("qid"), col(idCol))
    val wHd = Window.partitionBy(col("qid"))
      .orderBy(col("hd").asc, col(idCol).asc)
    val candf = joined.select(col("qid"), col(idCol),
        VectorFns.hamming64(col(sigCol), col("qsig")).as("hd"))
      .withColumn("rk", row_number().over(wHd)).where(col("rk") <= cand)
      .select(col("qid"), col(idCol))
    exact.join(candf, Seq("qid", idCol), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
      .join(queries.select(col("qid")), Seq("qid"), "right")
      .select(lit(method).as("method"), col("qid"),
        coalesce(col("hits"), lit(0L)).as("hits"), lit(k.toLong).as("k"),
        expr(s"coalesce(hits, 0) * 1000000L div ${k}L").as("recall_micro"))
  }

  /** DuckDB oracle replaying the ITQ-vs-SRP [[hammingRecallReport]] A/B
    * with the trained W/offsets injected as literals and the SRP planes
    * from the shared deterministic generator. */
  def itqVsSrpRecallOracleSql(table: String, idCol: String, vecCol: String,
                              w: Seq[Seq[Double]], offsets: Seq[Double],
                              planes: Seq[Seq[Double]], qids: Seq[Long],
                              k: Int, cand: Int): String = {
    def dl(v: Seq[Double]): String =
      v.map(java.lang.Double.toString).mkString("[", ",", "]")
    val itqSig = w.zip(offsets).zipWithIndex.map { case ((wk, o), b) =>
      s"(CASE WHEN list_dot_product(ev, ${dl(wk)}) - " +
        s"${java.lang.Double.toString(o)} >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    val srpSig = planes.zipWithIndex.map { case (p, b) =>
      s"(CASE WHEN list_dot_product(ev, ${dl(p)}) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    val qlist = qids.mkString("(", ", ", ")")
    def arm(name: String, sigExpr: String) =
      s"""s_$name AS MATERIALIZED (
           SELECT $idCol AS id, ev, $sigExpr AS sig FROM e),
         q_$name AS (SELECT id AS qid, ev AS qv, sig AS qsig
                     FROM s_$name WHERE id IN $qlist),
         ex_$name AS (SELECT qid, id FROM (
             SELECT q.qid, s.id,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 list_dot_product(s.ev, q.qv) /
                 (sqrt(list_dot_product(s.ev, s.ev)) *
                  sqrt(list_dot_product(q.qv, q.qv))) DESC, s.id) AS rk
             FROM s_$name s, q_$name q) z WHERE rk <= $k),
         cd_$name AS (SELECT qid, id FROM (
             SELECT q.qid, s.id,
               row_number() OVER (PARTITION BY q.qid ORDER BY
                 bit_count(xor(s.sig, q.qsig)) ASC, s.id) AS rk
             FROM s_$name s, q_$name q) z WHERE rk <= $cand),
         h_$name AS (
           SELECT '$name' AS method, g.qid,
             CAST(coalesce(hh.hits, 0) AS BIGINT) AS hits
           FROM (SELECT qid FROM q_$name) g
           LEFT JOIN (SELECT ex.qid, count(*) AS hits
                      FROM ex_$name ex JOIN cd_$name cd USING (qid, id)
                      GROUP BY 1) hh USING (qid))"""
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       ${arm("itq", itqSig)},
       ${arm("srp", srpSig)}
       SELECT method, qid, hits, CAST($k AS BIGINT) AS k,
         hits * 1000000 // $k AS recall_micro
       FROM (SELECT * FROM h_itq UNION ALL SELECT * FROM h_srp) u
       ORDER BY method, qid"""
  }

  // ── PCA whitening (Pearson 1901; the embedding-preprocessing step in
  //    front of SQ/PQ — FAISS's PCAMatrix) ─────────────────────────────────

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — fixed sweep
    * order and count, pure sequential double arithmetic ⇒ deterministic
    * across runs (the OPQ Newton-iteration discipline). Returns
    * (eigenvalues, eigenvector COLUMNS). Driver-side only — dim×dim
    * doubles, never data-sized. */
  private[graft] def jacobiEig(a0: Array[Array[Double]],
                               sweeps: Int): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 1 to sweeps; i <- 0 until n; j <- (i + 1) until n) {
      val aij = a(i)(j)
      if (math.abs(aij) > 1e-18) {
        val theta = 0.5 * math.atan2(2.0 * aij, a(i)(i) - a(j)(j))
        val c = math.cos(theta); val s = math.sin(theta)
        for (k <- 0 until n) {
          val aik = a(i)(k); val ajk = a(j)(k)
          a(i)(k) = c * aik + s * ajk
          a(j)(k) = -s * aik + c * ajk
        }
        for (k <- 0 until n) {
          val aki = a(k)(i); val akj = a(k)(j)
          a(k)(i) = c * aki + s * akj
          a(k)(j) = -s * aki + c * akj
        }
        for (k <- 0 until n) {
          val vki = v(k)(i); val vkj = v(k)(j)
          v(k)(i) = c * vki + s * vkj
          v(k)(j) = -s * vki + c * vkj
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** PCA components trained driver-side on the bounded lowest-id sample
    * (the [[opqRotation]] training bound — nSample·dim doubles collected
    * once): sample mean, sample covariance, Jacobi eigendecomposition,
    * top-`p` components by (eigenvalue desc, index asc) with the
    * largest-|coefficient| coordinate made positive (deterministic sign).
    * Returns (components p×dim, eigenvalues p, sample mean dim).
    * Applying the transform to the corpus is [[withRotation]] with the
    * component matrix — ONE shuffle-free projection. */
  def pcaComponents(emb: DataFrame, idCol: String, vecCol: String,
                    nSample: Int, p: Int,
                    sweeps: Int = 12): (Seq[Seq[Double]], Seq[Double], Seq[Double]) = {
    val sample = sampleCentroids(emb, idCol, vecCol, nSample)
    val n = sample.size
    require(n >= 2 && p >= 1, "need >= 2 sample vectors and p >= 1")
    val dim = sample.head.length
    val mean = (0 until dim).map(i => sample.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      sample.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / (n - 1)
    }
    val (eigs, vecs) = jacobiEig(cov, sweeps)
    val order = eigs.indices.sortBy(i => (-eigs(i), i)).take(p)
    val comps = order.map { c =>
      val col0 = (0 until dim).map(k => vecs(k)(c))
      val m = col0.indices.maxBy(k => (math.abs(col0(k)), -k))
      if (col0(m) < 0) col0.map(-_) else col0
    }
    (comps.map(_.toSeq), order.map(eigs), mean)
  }

  /** Corpus-scale variance-explained report for trained PCA components:
    * per component, Σ (round((⟨v, comp⟩ − ⟨mean, comp⟩)·1e3))² over the
    * FULL corpus — centered projections milli-quantized per row
    * (order-independent longs), squares summed in DECIMAL(38,0) (the
    * 100 TB overflow discipline). ONE scan, |p| sum columns, |p|-row
    * output — the ship gate before committing a serving dimension. */
  def pcaVarianceReport(emb: DataFrame, vecCol: String,
                        comps: Seq[Seq[Double]], eigs: Seq[Double],
                        mean: Seq[Double]): DataFrame = {
    val ev = col(vecCol).cast("array<double>")
    val aggs = comps.zipWithIndex.map { case (c, i) =>
      val mc = dotSeq(mean, c)
      val pr = round((VectorFns.dot(ev, typedLit(c.toArray)) - lit(mc)) *
        lit(1e3)).cast("long")
      sum((pr * pr).cast("decimal(38,0)")).as(s"__ss$i")
    }
    val row = emb.agg(aggs.head, aggs.tail: _*)
    val out = comps.indices.map { i =>
      struct(lit(i).cast("long").as("component"),
        lit(math.round(eigs(i) * 1e6)).as("eigval_micro"),
        col(s"__ss$i").cast("long").as("proj_ss_milli2"))
    }
    row.select(explode(array(out: _*)).as("r")).select(col("r.*"))
  }

  /** DuckDB oracle replaying [[pcaVarianceReport]] with the trained
    * components/mean INJECTED as literals (the OPQ-rotation oracle move —
    * the artifact is a deterministic function of the corpus). */
  def pcaVarianceOracleSql(table: String, vecCol: String,
                           comps: Seq[Seq[Double]], eigs: Seq[Double],
                           mean: Seq[Double]): String = {
    def dlist(v: Seq[Double]): String =
      v.map(java.lang.Double.toString).mkString("CAST([", ", ", "] AS DOUBLE[])")
    val arms = comps.zipWithIndex.map { case (c, i) =>
      val mc = java.lang.Double.toString(dotSeq(mean, c))
      s"""SELECT CAST($i AS BIGINT) AS component,
           CAST(${math.round(eigs(i) * 1e6)} AS BIGINT) AS eigval_micro,
           CAST(sum(CAST(pr AS HUGEINT) * pr) AS BIGINT) AS proj_ss_milli2
         FROM (SELECT CAST(round((list_dot_product(CAST($vecCol AS DOUBLE[]),
             ${dlist(c)}) - $mc) * 1000.0) AS BIGINT) AS pr
           FROM $table) t$i"""
    }.mkString("\n       UNION ALL\n       ")
    s"""SELECT component, eigval_micro, proj_ss_milli2 FROM (
       $arms) z ORDER BY component"""
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

  /** BATCHED IVF probe — the production shape: N query vectors resolve
    * their nProbe cells IN-PLAN (argsort over the typedLit centroid scores,
    * one projection — no per-query driver work, so the query side scales to
    * millions of rows), the cell-exploded queries equi-join the indexed
    * corpus on the cell id, and per-query top-k is one window rank keyed on
    * the query id. Shuffles: the cell join + one qid-keyed window — never a
    * cross product, and the corpus side moves only rows in probed cells.
    * Tie-breaks mirror [[ivfProbeCells]] (score desc, cell asc) and the
    * single-query probes (cosine desc, id asc), so the DuckDB oracle
    * replays ranking exactly.
    */
  /** In-plan per-query probe-cell selection shared by the batched probes:
    * (qid, __qv, cell) with one row per (query, probed cell). struct(-score,
    * cell) under array_sort's lexicographic ascending order reproduces the
    * [[ivfProbeCells]] tiebreak (score desc, cell asc) with zero per-query
    * driver work. */
  private def batchProbeCells(queries: DataFrame, qidCol: String, qvecCol: String,
                              centroids: Seq[Seq[Double]],
                              nProbe: Int, cellCol: String,
                              keep: Seq[String] = Nil): DataFrame = {
    require(nProbe >= 1 && nProbe <= centroids.length)
    val qv = col(qvecCol).cast("array<double>")
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-(VectorFns.dot(qv, typedLit(c.toArray)) /
        lit(math.sqrt(dotSeq(c, c))))).as("ns"), lit(i).as("cell"))
    }: _*)
    queries.select(col(qidCol) +: keep.map(col) :+ qv.as("__qv") :+
      explode(transform(slice(array_sort(scored), 1, nProbe),
        s => s.getField("cell"))).as(cellCol): _*)
  }

  def ivfBatchTopK(indexed: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, cellCol: String,
                   qidCol: String, qvecCol: String,
                   centroids: Seq[Seq[Double]],
                   k: Int, nProbe: Int): DataFrame = {
    val probed = batchProbeCells(queries, qidCol, qvecCol, centroids, nProbe, cellCol)
    probed.join(indexed.select(col(idCol), col(vecCol), col(cellCol)), Seq(cellCol))
      .select(col(qidCol), col(idCol),
        VectorFns.cosine(col(vecCol), col("__qv")).as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("cosine").desc, col(idCol))))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL 2019 — the
    * CCMatrix/LASER alignment step): source-side vectors pair with the
    * target-side vector maximizing
    * margin(x,y) = cos(x,y) / ((avgNNk(x) + avgNNk(y)) / 2), the ratio
    * that separates true translations from merely-dense hub regions.
    * Both directions' k-NN run through the batched IVF probe (per-query
    * cells resolve IN-PLAN, the cell equi-join prunes each side), so the
    * same approximation FAISS-based production miners make. Non-positive
    * cosines drop before the averages — margin is only meaningful among
    * positive similarities, and it keeps every integer division
    * non-negative (micro-quantized cosines, exact LONG sums, one
    * integer-div margin — engine-portable, no float averages).
    *
    * Scale: two [[ivfBatchTopK]] passes (each one cell-pruned join + one
    * qid-keyed bounded window) + two ≤|side|-row average aggregates + one
    * max-struct argmax per source vector. No all-pairs anywhere. */
  def bitextMarginMine(emb: DataFrame, idCol: String, vecCol: String,
                       sideCol: String, centroids: Seq[Seq[Double]],
                       k: Int, nProbe: Int, thresholdMicro: Long): DataFrame = {
    require(k >= 1 && thresholdMicro >= 0, "bad mining parameters")
    val src = emb.where(col(sideCol) === 0)
    val tgt = emb.where(col(sideCol) === 1)
    def knn(corpus: DataFrame, queries: DataFrame) =
      ivfBatchTopK(withIvfCell(corpus, vecCol, centroids), queries
          .select(col(idCol).as("qid"), col(vecCol).as("qvec")),
          idCol, vecCol, "cell", "qid", "qvec", centroids, k, nProbe)
        .where(col("cosine") > 0)
    val fwd = knn(tgt, src)
      .select(col("qid").as("x_id"), col(idCol).as("y_id"),
        round(col("cosine") * lit(1e6)).cast("long").as("cos_micro"))
    val bwd = knn(src, tgt)
      .select(col("qid").as("y_id"),
        round(col("cosine") * lit(1e6)).cast("long").as("cos_micro"))
    val aF = fwd.groupBy(col("x_id"))
      .agg(expr("sum(cos_micro) div count(1)").as("avg_f_micro"))
    val aB = bwd.groupBy(col("y_id"))
      .agg(expr("sum(cos_micro) div count(1)").as("avg_b_micro"))
    fwd.join(aF, Seq("x_id")).join(aB, Seq("y_id"))
      .where(col("avg_f_micro") + col("avg_b_micro") > 0)
      .withColumn("margin_micro",
        expr("cos_micro * 2000000L div (avg_f_micro + avg_b_micro)"))
      .groupBy(col("x_id"))
      .agg(max(struct(col("margin_micro"), col("y_id"), col("cos_micro"))).as("b"))
      .select(col("x_id"), col("b.y_id").as("y_id"),
        col("b.cos_micro").as("cos_micro"),
        col("b.margin_micro").as("margin_micro"))
      .where(col("margin_micro") >= thresholdMicro)
  }

  /** DuckDB oracle replaying [[bitextMarginMine]] — the
    * [[ivfBatchOracleSql]] chain in both directions, the same micro
    * quantization, integer averages, and the argmax tie-break of the
    * max-struct (margin, then larger y_id). */
  def bitextMarginOracleSql(table: String, idCol: String, vecCol: String,
                            sideExpr: String, nCentroids: Int,
                            k: Int, nProbe: Int,
                            thresholdMicro: Long): String =
    s"""WITH e AS (SELECT $idCol, CAST(($sideExpr) AS INTEGER) AS side,
           CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS ccid, ev AS cvec FROM e WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, side, ccid AS cell FROM (
           SELECT e.$idCol, e.side, c.ccid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       qc AS (
         SELECT qid, qside, qv, ccid AS cell FROM (
           SELECT q.$idCol AS qid, q.side AS qside, q.ev AS qv, c.ccid,
             row_number() OVER (PARTITION BY q.$idCol
               ORDER BY list_dot_product(q.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e q, cents c) WHERE rn <= $nProbe),
       cand AS (
         SELECT qc.qid, qc.qside, e.$idCol AS nid,
           list_dot_product(e.ev, qc.qv) /
             (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(qc.qv, qc.qv))) AS cosine
         FROM qc JOIN asg a ON a.cell = qc.cell AND a.side <> qc.qside
                 JOIN e ON e.$idCol = a.$idCol),
       ranked AS (
         SELECT qid, qside, nid, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rank
         FROM cand),
       kept AS (
         SELECT qid, qside, nid,
           CAST(round(cosine * 1000000.0) AS BIGINT) AS cos_micro
         FROM ranked WHERE rank <= $k AND cosine > 0),
       fwd AS (SELECT qid AS x_id, nid AS y_id, cos_micro FROM kept WHERE qside = 0),
       bwd AS (SELECT qid AS y_id, cos_micro FROM kept WHERE qside = 1),
       af AS (SELECT x_id, CAST(sum(cos_micro) AS BIGINT) // count(*) AS avg_f
              FROM fwd GROUP BY 1),
       ab AS (SELECT y_id, CAST(sum(cos_micro) AS BIGINT) // count(*) AS avg_b
              FROM bwd GROUP BY 1),
       m AS (SELECT f.x_id, f.y_id, f.cos_micro,
               f.cos_micro * 2000000 // (af.avg_f + ab.avg_b) AS margin_micro
             FROM fwd f JOIN af USING (x_id) JOIN ab USING (y_id)
             WHERE af.avg_f + ab.avg_b > 0),
       best AS (SELECT x_id, y_id, cos_micro, margin_micro,
               row_number() OVER (PARTITION BY x_id
                 ORDER BY margin_micro DESC, y_id DESC, cos_micro DESC) AS rn
             FROM m)
       SELECT x_id, y_id, cos_micro, margin_micro
       FROM best WHERE rn = 1 AND margin_micro >= $thresholdMicro
       ORDER BY x_id"""

  /** ANN recall\@k QA report — the tuning gate before committing an
    * (nCentroids, nProbe) configuration to a 100 TB index: for each query
    * in a SAMPLE, the fraction of the exact top-k the cell-pruned probe
    * actually returned. Exact side = per-query full ranking (the sample
    * bounds the quadratic: |sample|·|corpus| scored rows — the standard
    * recall harness shape, run on ~1% of queries); ANN side =
    * [[ivfBatchTopK]]. Both rank by (cosine desc, id), so the
    * intersection is well-defined; recall is an integer micro-division.
    * Read the report before trusting any stored-probe answer — a recall
    * cliff means nProbe (or the centroid count) is wrong for this
    * embedding distribution. */
  def annRecallReport(emb: DataFrame, idCol: String, vecCol: String,
                      queries: DataFrame, qidCol: String, qvecCol: String,
                      centroids: Seq[Seq[Double]],
                      k: Int, nProbe: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(col("cosine").desc, col(idCol))
    val exact = queries.select(col(qidCol), col(qvecCol))
      .crossJoin(emb.select(col(idCol), col(vecCol)))
      .select(col(qidCol), col(idCol),
        VectorFns.cosine(col(vecCol), col(qvecCol).cast("array<double>"))
          .as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol))
    val ann = ivfBatchTopK(withIvfCell(emb, vecCol, centroids),
        queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec")),
        idCol, vecCol, "cell", "qid", "qvec", centroids, k, nProbe)
      .select(col("qid").as(qidCol), col(idCol))
    exact.join(ann, Seq(qidCol, idCol), "left_semi")
      .groupBy(col(qidCol)).agg(count(lit(1)).as("hits"))
      .join(exact.groupBy(col(qidCol)).agg(count(lit(1)).as("k_exact")),
        Seq(qidCol), "right")
      .select(col(qidCol), coalesce(col("hits"), lit(0L)).as("hits"),
        col("k_exact"),
        expr("coalesce(hits, 0) * 1000000L div k_exact").as("recall_micro"))
  }

  /** IVF cell-SCATTER report — the clustering-QA gate for a centroid set
    * before it becomes a stored index: per cell, the population, the mean
    * cosine distance of members to their centroid (tightness), and the
    * distance to the nearest OTHER centroid (separation). Fat loose cells
    * next to close centroids are where probe recall dies; this is the
    * table that says whether to retrain or add centroids.
    *
    * Exactness: per-row distances quantize to micro BEFORE the per-cell
    * LONG sums (order-independent); assignment argmax ties break to the
    * lowest cell id on both engines; centroid separations are driver-side
    * constants computed with the same array-order IEEE arithmetic the
    * oracle's `list_dot_product` runs.
    *
    * Scale: ONE projection per row (k native codegen'd cosines + an
    * argmax — no join, no window) into a ≤ k-row aggregate; separations
    * are a k² driver loop on literals. */
  def cellScatterReport(emb: DataFrame, idCol: String, vecCol: String,
                        centroids: Seq[Seq[Double]]): DataFrame = {
    val k = centroids.size
    require(k >= 2, "need at least two centroids")
    def cosSeq(a: Seq[Double], b: Seq[Double]): Double =
      dotSeq(a, b) / (math.sqrt(dotSeq(a, a)) * math.sqrt(dotSeq(b, b)))
    val seps: Seq[Long] = centroids.indices.map { i =>
      centroids.indices.filter(_ != i).map { j =>
        math.floor((1.0 - cosSeq(centroids(i), centroids(j))) * 1e6).toLong
      }.min
    }
    val coss = array(centroids.map(c =>
      VectorFns.cosine(col(vecCol), typedLit(c.toArray))): _*)
    emb.select(
        element_at(transform(array(coss), s =>
          array_position(s, array_max(s)) - 1), 1).cast("int").as("cell"),
        floor((lit(1.0d) - array_max(coss)) * lit(1e6)).cast("long")
          .as("d_micro"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("d_micro")).as("sd"))
      .select(col("cell"), col("n"),
        expr("sd div n").as("mean_dist_micro"),
        element_at(typedLit(seps.toArray), col("cell") + lit(1))
          .as("min_sep_micro"))
  }

  /** DuckDB oracle replaying [[cellScatterReport]] with centroids
    * re-derived by the deterministic `id < nCentroids` rule. */
  def cellScatterOracleSql(table: String, idCol: String, vecCol: String,
                           nCentroids: Int): String =
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS cid, ev AS cv FROM e
                 WHERE $idCol < $nCentroids),
       sc AS (SELECT e.$idCol, c.cid,
                list_dot_product(e.ev, c.cv) /
                  (sqrt(list_dot_product(e.ev, e.ev)) *
                   sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM e, cents c),
       asg AS (SELECT $idCol, CAST(cid AS INTEGER) AS cell,
                 CAST(floor((1.0 - cos) * 1000000.0) AS BIGINT) AS d_micro
               FROM (SELECT $idCol, cid, cos,
                       row_number() OVER (PARTITION BY $idCol
                         ORDER BY cos DESC, cid) AS rn
                     FROM sc) WHERE rn = 1),
       r AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d_micro) AS BIGINT) AS sd
             FROM asg GROUP BY 1),
       sep AS (SELECT a.cid AS cell,
                 min(CAST(floor((1.0 - list_dot_product(a.cv, b.cv) /
                   (sqrt(list_dot_product(a.cv, a.cv)) *
                    sqrt(list_dot_product(b.cv, b.cv)))) * 1000000.0)
                   AS BIGINT)) AS min_sep_micro
               FROM cents a JOIN cents b ON a.cid <> b.cid GROUP BY 1)
       SELECT r.cell, r.n, r.sd // r.n AS mean_dist_micro, sep.min_sep_micro
       FROM r JOIN sep ON sep.cell = r.cell
       ORDER BY r.cell"""

  /** Per-batch ADDITIVE cell statistics for the STORED centroid-drift
    * monitor: each vector assigns to its nearest stored centroid (same
    * argmax + micro-distance quantization as [[cellScatterReport]]) and
    * collapses to ≤ k rows (epoch, cell, n, sd) that blind-append into a
    * pipe under an integer epoch axis. n and sd are sums, so any number
    * of syncs per epoch fold to the epoch's exact stats. */
  def cellStatsBatch(emb: DataFrame, vecCol: String,
                     centroids: Seq[Seq[Double]], epoch: Long): DataFrame =
    cellAssignRows(emb, null, vecCol, centroids, epoch)
      .groupBy(col("epoch"), col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("d_micro")).as("sd"))
      .select(col("epoch"), col("cell"), col("n"), col("sd"))

  /** Per-VECTOR assignment rows (epoch, [id,] cell, d_micro) — the
    * streaming-ingest form of [[cellStatsBatch]]: rows are a
    * deterministic function of the vector, so at-least-once redelivery
    * dedups with a plain distinct (per-batch AGGREGATES would
    * double-count across redelivered micro-batches);
    * [[cellStatsFromAssigns]] folds the deduped rows into the same
    * additive stats the batch path stores. Pass `idCol = null` to omit
    * the id column (the batch path aggregates immediately and needs no
    * dedup key). */
  def cellAssignRows(emb: DataFrame, idCol: String, vecCol: String,
                     centroids: Seq[Seq[Double]], epoch: Long): DataFrame = {
    val coss = array(centroids.map(c =>
      VectorFns.cosine(col(vecCol), typedLit(c.toArray))): _*)
    val idCols = Option(idCol).map(col).toSeq
    emb.select(idCols ++ Seq(
        element_at(transform(array(coss), s =>
          array_position(s, array_max(s)) - 1), 1).cast("int").as("cell"),
        floor((lit(1.0d) - array_max(coss)) * lit(1e6)).cast("long")
          .as("d_micro")): _*)
      .select((lit(epoch).as("epoch") +: (idCols ++
        Seq(col("cell"), col("d_micro")))): _*)
  }

  /** Fold deduped per-vector assignment rows into the (epoch, cell, n,
    * sd) stats [[centroidDriftFromStats]] reads. */
  def cellStatsFromAssigns(rows: DataFrame): DataFrame =
    rows.groupBy(col("epoch"), col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("d_micro")).as("sd"))

  /** Retrain trigger from STORED cell stats ([[cellStatsBatch]] rows read
    * back from the pipe): per cell, occupancy-share PSI term between the
    * baseline and current epochs (the [[semanticDrift]] signal — did the
    * population move BETWEEN cells?) plus tightness CREEP (did the mean
    * member–centroid distance grow WITHIN the cell — the
    * [[cellScatterReport]] signal over time). Either firing flags the
    * cell for retrain: share drift says the centroid set no longer spans
    * the data, creep says a cell is absorbing vectors it doesn't fit.
    *
    * Scale: input is the stored ≤ k·|epochs| stat rows — the corpora
    * themselves were collapsed at sync time and are never re-read; the
    * unpartitioned share window runs over the k-row grid (audit-exempt
    * via the index_sync skip, same bound class as q_semantic_drift). */
  def centroidDriftFromStats(stats: DataFrame, k: Int,
                             baseEpoch: Long, curEpoch: Long,
                             psiThreshMicro: Long = 10000L,
                             creepThreshMicro: Long = 50000L): DataFrame = {
    require(k > 0, "need at least one cell")
    val folded = stats.groupBy(col("epoch"), col("cell"))
      .agg(sum(col("n")).as("n"), sum(col("sd")).as("sd"))
    def epochSide(e: Long, n: String, sd: String) =
      folded.where(col("epoch") === e)
        .select(col("cell"), col("n").as(n), col("sd").as(sd))
    val grid = stats.sparkSession.range(k)
      .select(col("id").cast("int").as("cell"))
      .join(epochSide(baseEpoch, "nb", "sdb"), Seq("cell"), "left")
      .join(epochSide(curEpoch, "nc", "sdc"), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("nb"), lit(0L)).as("n_base"),
        coalesce(col("nc"), lit(0L)).as("n_cur"),
        col("sdb"), col("sdc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val pa = (col("n_base") + lit(1.0d)) /
      (sum(col("n_base")).over(w) + lit(k.toLong)).cast("double")
    val pb = (col("n_cur") + lit(1.0d)) /
      (sum(col("n_cur")).over(w) + lit(k.toLong)).cast("double")
    grid.select(col("cell"), col("n_base"), col("n_cur"),
        round((pa - pb) * log(pa / pb) * lit(1e6)).cast("long").as("term_micro"),
        when(col("n_base") > 0, expr("sdb div n_base")).as("mean_base_micro"),
        when(col("n_cur") > 0, expr("sdc div n_cur")).as("mean_cur_micro"))
      .withColumn("creep_micro", col("mean_cur_micro") - col("mean_base_micro"))
      .withColumn("retrain",
        col("term_micro") > lit(psiThreshMicro) ||
        coalesce(col("creep_micro"), lit(0L)) > lit(creepThreshMicro))
      .orderBy(col("cell"))
  }

  /** DuckDB oracle replaying the stored drift monitor end-to-end:
    * centroids re-derived by the deterministic `id < k` rule, the same
    * argmax assignment + micro quantization as [[cellScatterOracleSql]],
    * epochs split by predicate, PSI tail + creep identical. Fold ≡
    * rebuild (stat sums are additive), so the oracle replays from the
    * raw vectors. */
  def centroidDriftOracleSql(table: String, idCol: String, vecCol: String,
                             k: Int, baseWhere: String, curWhere: String,
                             psiThreshMicro: Long = 10000L,
                             creepThreshMicro: Long = 50000L): String =
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS cid, ev AS cv FROM e WHERE $idCol < $k),
       sc AS (SELECT e.$idCol, c.cid,
                list_dot_product(e.ev, c.cv) /
                  (sqrt(list_dot_product(e.ev, e.ev)) *
                   sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM e, cents c),
       asg AS (SELECT $idCol, CAST(cid AS INTEGER) AS cell,
                 CAST(floor((1.0 - cos) * 1000000.0) AS BIGINT) AS d_micro
               FROM (SELECT $idCol, cid, cos,
                       row_number() OVER (PARTITION BY $idCol
                         ORDER BY cos DESC, cid) AS rn
                     FROM sc) WHERE rn = 1),
       b AS (SELECT cell, CAST(count(*) AS BIGINT) AS nb,
               CAST(sum(d_micro) AS BIGINT) AS sdb
             FROM asg WHERE $baseWhere GROUP BY 1),
       c AS (SELECT cell, CAST(count(*) AS BIGINT) AS nc,
               CAST(sum(d_micro) AS BIGINT) AS sdc
             FROM asg WHERE $curWhere GROUP BY 1),
       grid AS (SELECT CAST(g.i AS INT) AS cell,
           CAST(coalesce(b.nb, 0) AS BIGINT) AS n_base,
           CAST(coalesce(c.nc, 0) AS BIGINT) AS n_cur,
           b.sdb, c.sdc
         FROM (SELECT unnest(generate_series(0, ${k - 1})) AS i) g
         LEFT JOIN b ON b.cell = g.i LEFT JOIN c ON c.cell = g.i),
       t AS (SELECT *,
           (n_base + 1.0) / CAST(sum(n_base) OVER () + $k AS DOUBLE) AS pa,
           (n_cur + 1.0) / CAST(sum(n_cur) OVER () + $k AS DOUBLE) AS pb
         FROM grid),
       r AS (SELECT cell, n_base, n_cur,
           CAST(round((pa - pb) * ln(pa / pb) * 1000000.0) AS BIGINT) AS term_micro,
           CASE WHEN n_base > 0 THEN sdb // n_base END AS mean_base_micro,
           CASE WHEN n_cur > 0 THEN sdc // n_cur END AS mean_cur_micro
         FROM t)
       SELECT cell, n_base, n_cur, term_micro, mean_base_micro, mean_cur_micro,
         mean_cur_micro - mean_base_micro AS creep_micro,
         (term_micro > $psiThreshMicro OR
          coalesce(mean_cur_micro - mean_base_micro, 0) > $creepThreshMicro) AS retrain
       FROM r ORDER BY cell"""

  /** Dimension-TRUNCATION recall — the Matryoshka QA gate (Kusupati et
    * al. 2022): for each candidate prefix length d, how much of the
    * full-dimension exact top-k survives when ranking by cosine over only
    * the first d components. This is the table that picks the serving
    * dimension before a fleet-wide re-index: storage/compute scale
    * linearly in d, recall does not. One summary row per d:
    * query-weighted mean recall (Σhits·10⁶ / Σk) and the worst single
    * query's recall.
    *
    * Scale: the exact side is bounded by the query SAMPLE
    * (|sample|·|corpus| scored rows — the [[annRecallReport]] harness);
    * each truncated ranking is the same crossJoin with a narrower native
    * cosine; per-query windows partition by the query id. Truncation is
    * array slicing BEFORE the double cast on the Spark side and list
    * slicing after it in the oracle — identical element values either
    * way. */
  def truncationRecall(emb: DataFrame, idCol: String, vecCol: String,
                       queries: DataFrame, qidCol: String, qvecCol: String,
                       dims: Seq[Int], k: Int): DataFrame = {
    require(k >= 1 && dims.nonEmpty && dims.forall(_ >= 1),
      "bad truncation parameters")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(col("cosine").desc, col(idCol))
    def topK(qv: Column, ev: Column) =
      queries.select(col(qidCol), qv.as("__qv"))
        .crossJoin(emb.select(col(idCol), ev.as("__ev")))
        .select(col(qidCol), col(idCol),
          VectorFns.cosine(col("__ev"), col("__qv")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col(qidCol), col(idCol))
    val full = topK(col(qvecCol), col(vecCol)).localCheckpoint(true)
    val kExact = full.groupBy(col(qidCol)).agg(count(lit(1)).as("k_exact"))
    dims.map { dd =>
      val tr = topK(slice(col(qvecCol), 1, dd), slice(col(vecCol), 1, dd))
      full.join(tr, Seq(qidCol, idCol), "left_semi")
        .groupBy(col(qidCol)).agg(count(lit(1)).as("hits"))
        .join(kExact, Seq(qidCol), "right")
        .select(coalesce(col("hits"), lit(0L)).as("hits"), col("k_exact"))
        .agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("sh"),
          sum(col("k_exact")).as("sk"),
          min(expr("hits * 1000000L div k_exact")).as("min_recall_micro"))
        .select(lit(dd).as("dim"), col("n_queries"),
          expr("sh * 1000000L div sk").as("recall_micro"),
          col("min_recall_micro"))
    }.reduce(_.unionByName(_))
  }

  /** DuckDB oracle replaying [[truncationRecall]] with queries selected
    * by `queryFilter` over the same table. */
  def truncationRecallOracleSql(table: String, idCol: String, vecCol: String,
                                queryFilter: String, dims: Seq[Int],
                                k: Int): String = {
    def cosRank(qv: String, ev: String) =
      s"""row_number() OVER (PARTITION BY q.qid
           ORDER BY list_dot_product($ev, $qv) /
             (sqrt(list_dot_product($ev, $ev)) * sqrt(list_dot_product($qv, $qv))) DESC,
             e.$idCol)"""
    val perDim = dims.map { dd =>
      s"""SELECT $dd AS dim, n_queries, recall_micro, min_recall_micro FROM (
           WITH tr AS (
             SELECT qid, $idCol FROM (
               SELECT q.qid, e.$idCol, ${cosRank(s"q.qv[1:$dd]", s"e.ev[1:$dd]")} AS rank
               FROM qs q CROSS JOIN e) WHERE rank <= $k),
           h AS (SELECT f.qid, count(*) AS hits
                 FROM full_tk f JOIN tr ON tr.qid = f.qid AND tr.$idCol = f.$idCol
                 GROUP BY 1),
           pq AS (SELECT ke.qid, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
                    ke.k_exact
                  FROM ke LEFT JOIN h USING (qid))
           SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(sum(hits) AS BIGINT) * 1000000 // CAST(sum(k_exact) AS BIGINT)
               AS recall_micro,
             CAST(min(hits * 1000000 // k_exact) AS BIGINT) AS min_recall_micro
           FROM pq)"""
    }.mkString("\n         UNION ALL ")
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       qs AS (SELECT $idCol AS qid, ev AS qv FROM e WHERE $queryFilter),
       full_tk AS (
         SELECT qid, $idCol FROM (
           SELECT q.qid, e.$idCol, ${cosRank("q.qv", "e.ev")} AS rank
           FROM qs q CROSS JOIN e) WHERE rank <= $k),
       ke AS (SELECT qid, CAST(count(*) AS BIGINT) AS k_exact
              FROM full_tk GROUP BY 1)
       $perDim ORDER BY dim"""
  }

  /** DuckDB oracle replaying [[annRecallReport]]. */
  def annRecallOracleSql(table: String, idCol: String, vecCol: String,
                         nCentroids: Int, queryFilter: String,
                         k: Int, nProbe: Int): String =
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS ccid, ev AS cvec FROM e WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, ccid AS cell FROM (
           SELECT e.$idCol, c.ccid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       qs AS (SELECT $idCol AS qid, ev AS qv FROM e WHERE $queryFilter),
       exact AS (
         SELECT qid, $idCol FROM (
           SELECT q.qid, e.$idCol,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(e.ev, q.qv) /
                 (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))) DESC,
                 e.$idCol) AS rank
           FROM qs q CROSS JOIN e) WHERE rank <= $k),
       qcell AS (
         SELECT qid, qv, ccid AS cell FROM (
           SELECT q.qid, q.qv, c.ccid,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(q.qv, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM qs q, cents c) WHERE rn <= $nProbe),
       ann AS (
         SELECT qid, $idCol FROM (
           SELECT qc.qid, e.$idCol,
             row_number() OVER (PARTITION BY qc.qid
               ORDER BY list_dot_product(e.ev, qc.qv) /
                 (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(qc.qv, qc.qv))) DESC,
                 e.$idCol) AS rank
           FROM qcell qc JOIN asg a ON a.cell = qc.cell
                         JOIN e ON e.$idCol = a.$idCol) WHERE rank <= $k),
       hits AS (
         SELECT exact.qid, count(*) AS hits
         FROM exact JOIN ann ON ann.qid = exact.qid AND ann.$idCol = exact.$idCol
         GROUP BY 1),
       ke AS (SELECT qid, CAST(count(*) AS BIGINT) AS k_exact FROM exact GROUP BY 1)
       SELECT ke.qid, CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
         ke.k_exact,
         CAST(coalesce(hits.hits, 0) AS BIGINT) * 1000000 // ke.k_exact AS recall_micro
       FROM ke LEFT JOIN hits USING (qid)
       ORDER BY qid"""

  /** Hard-negative mining for contrastive/embedding-model training (the
    * DPR/E5/GTE fine-tuning data step, Karpukhin et al. 2020 §4.2): for
    * every query vector, the k nearest corpus vectors carrying a DIFFERENT
    * label — semantically close yet wrong, exactly the negatives that make
    * the training signal hard. Same distributed shape as [[ivfBatchTopK]]:
    * per-query probe cells resolve IN-PLAN, the cell equi-join prunes the
    * corpus, the label-mismatch predicate filters BEFORE the qid-keyed
    * ranking window (self-pairs drop for free — a row shares its own
    * label). Zero driver work per query; scales to millions of queries.
    */
  def hardNegatives(indexed: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, cellCol: String, labelCol: String,
                    qidCol: String, qvecCol: String, qlabelCol: String,
                    centroids: Seq[Seq[Double]],
                    k: Int, nProbe: Int): DataFrame = {
    val probed = batchProbeCells(queries, qidCol, qvecCol, centroids, nProbe,
      cellCol, keep = Seq(qlabelCol))
    probed.join(
        indexed.select(col(idCol), col(vecCol), col(cellCol), col(labelCol)),
        Seq(cellCol))
      .where(col(labelCol) =!= col(qlabelCol))
      .select(col(qidCol), col(idCol), col(labelCol),
        VectorFns.cosine(col(vecCol), col("__qv")).as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("cosine").desc, col(idCol))))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col(labelCol), col("cosine"), col("rank"))
  }

  /** DuckDB oracle replaying [[hardNegatives]] — [[ivfBatchOracleSql]]'s
    * chain plus the label-mismatch predicate before the ranking. */
  def hardNegativesOracleSql(table: String, idCol: String, vecCol: String,
                             labelCol: String, nCentroids: Int,
                             queryFilter: String, k: Int, nProbe: Int): String =
    s"""WITH e AS (SELECT $idCol, $labelCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS ccid, ev AS cvec FROM e WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, ccid AS cell FROM (
           SELECT e.$idCol, c.ccid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       qs AS (SELECT $idCol AS qid, $labelCol AS qlabel, ev AS qv FROM e WHERE $queryFilter),
       qcell AS (
         SELECT qid, qlabel, qv, ccid AS cell FROM (
           SELECT q.qid, q.qlabel, q.qv, c.ccid,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(q.qv, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM qs q, cents c) WHERE rn <= $nProbe),
       cand AS (
         SELECT qc.qid, e.$idCol, e.$labelCol,
           list_dot_product(e.ev, qc.qv) /
             (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(qc.qv, qc.qv))) AS cosine
         FROM qcell qc JOIN asg a ON a.cell = qc.cell
                       JOIN e ON e.$idCol = a.$idCol
         WHERE e.$labelCol <> qc.qlabel),
       ranked AS (
         SELECT qid, $idCol, $labelCol, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, $idCol) AS rank
         FROM cand)
       SELECT qid, $idCol, $labelCol, cosine, CAST(rank AS INT) AS rank
       FROM ranked WHERE rank <= $k ORDER BY qid, rank"""

  /** BATCHED IVF+PQ probe — FAISS's production composition for N query
    * vectors at once, fully distributed: probe cells AND the per-query ADC
    * term tables resolve IN-PLAN (the m×ks table is an expression over the
    * typedLit codebooks — no driver work per query), the cell equi-join
    * prunes the corpus, candidates rank by the m-lookup ADC score reading
    * ONLY (id, cell, m-byte codes) — float vectors never cross the first
    * join — and the `rerank` survivors per query join back to the vector
    * table for the exact-cosine top-k. Shuffles: cell join + two qid-keyed
    * windows + one id equi-join; nothing quadratic, no driver collects.
    * ADC terms accumulate in the same left-to-right order as
    * [[pqAdcTable]]/the oracle chain, so ranking is bit-portable.
    */
  def ivfPqBatchTopK(indexed: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, cellCol: String, codeCol: String,
                     qidCol: String, qvecCol: String,
                     centroids: Seq[Seq[Double]], codebooks: Seq[Seq[Seq[Double]]],
                     k: Int, nProbe: Int, rerank: Int): DataFrame = {
    val probed = batchProbeCells(queries, qidCol, qvecCol, centroids, nProbe, cellCol)
    // per-query ADC table as an m×ks array column: term(j, c) = |c|² − 2·q_j·c
    // (|c|² precomputed driver-side, same accumulation order — bit-identical).
    // ONE expression node: the composed array(array(lit − 2·dot(...))) tree
    // made Janino compilation dominate the query (see PqAdcTable scaladoc)
    val adcCol = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(graft.expressions.PqAdcTable(
        GraftColumnBridge.expression(col("__qv")),
        codebooks.map(_.map(_.toArray).toArray).toArray,
        codebooks.map(cb => cb.map(c => dotSeq(c, c)).toArray).toArray))
    }
    val cand = probed.withColumn("__adc", adcCol)
      .join(indexed.select(col(idCol), col(cellCol), col(codeCol)), Seq(cellCol))
    val adist = codebooks.indices.map { j =>
      element_at(element_at(col("__adc"), j + 1),
        element_at(col(codeCol), j + 1).cast("int") + 1)
    }.reduceLeft(_ + _)
    // rank on NARROW rows — (qid, id, adist), ~24 bytes — and re-join the
    // query vectors after the rerank cut: carrying the dim-double __qv
    // through the candidate window multiplied the shuffle ~20× (measured
    // 5.1 s → 2.6 s at sf0.1) for data the window never reads
    val shortlist = cand
      .select(col(qidCol), col(idCol), adist.as("adist"))
      .withColumn("arank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("adist").asc, col(idCol))))
      .where(col("arank") <= rerank)
    shortlist
      .join(indexed.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol),
        col(qvecCol).cast("array<double>").as("__qv"))), Seq(qidCol))
      .select(col(qidCol), col(idCol),
        VectorFns.cosine(col(vecCol), col("__qv")).as("cosine"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("cosine").desc, col(idCol))))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("cosine"), col("rank"))
  }

  /** DuckDB oracle replaying [[ivfPqBatchTopK]] end-to-end for every query
    * selected by `queryFilter`: centroids/codebooks by their deterministic
    * `$idCol < n` rules, per-query probe cells and ADC terms, candidate
    * rank by the same left-to-right ADC chain, exact-cosine rerank with
    * identical tiebreaks. */
  def ivfPqBatchOracleSql(table: String, idCol: String, vecCol: String,
                          dim: Int, m: Int, ks: Int, nCentroids: Int,
                          queryFilter: String,
                          k: Int, nProbe: Int, rerank: Int): String = {
    val d = dim / m
    val chain = (1 until m).foldLeft("s0") { (acc, j) => s"($acc + s$j)" }
    val pivots = (0 until m)
      .map(j => s"max(CASE WHEN j = $j THEN t END) AS s$j").mkString(", ")
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS ccid, ev AS cvec FROM e WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, ccid AS cell FROM (
           SELECT e.$idCol, c.ccid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       sub AS (SELECT $idCol, j, ev[(j*$d+1):(j*$d+$d)] AS sv FROM e, js),
       cb AS (SELECT j, $idCol AS cid, sv AS cv FROM sub WHERE $idCol < $ks),
       enc AS (
         SELECT $idCol, j, cid FROM (
           SELECT s.$idCol, s.j, c.cid,
             row_number() OVER (PARTITION BY s.$idCol, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)) WHERE rn = 1),
       qs AS (SELECT $idCol AS qid, ev AS qv FROM e WHERE $queryFilter),
       qcell AS (
         SELECT qid, ccid AS cell FROM (
           SELECT q.qid, c.ccid,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(q.qv, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM qs q, cents c) WHERE rn <= $nProbe),
       pair AS (
         SELECT qc.qid, a.$idCol FROM qcell qc JOIN asg a ON a.cell = qc.cell),
       qsub AS (SELECT qid, j, qv[(j*$d+1):(j*$d+$d)] AS qsv FROM qs, js),
       term AS (
         SELECT p.qid, enc.$idCol, enc.j,
           list_dot_product(c.cv, c.cv) - 2*list_dot_product(q.qsv, c.cv) AS t
         FROM pair p
           JOIN enc ON enc.$idCol = p.$idCol
           JOIN cb c ON enc.j = c.j AND enc.cid = c.cid
           JOIN qsub q ON q.qid = p.qid AND q.j = enc.j),
       adc AS (SELECT qid, $idCol, $chain AS adist FROM (
         SELECT qid, $idCol, $pivots FROM term GROUP BY qid, $idCol)),
       cand AS (
         SELECT qid, $idCol FROM (
           SELECT qid, $idCol,
             row_number() OVER (PARTITION BY qid ORDER BY adist ASC, $idCol) AS arank
           FROM adc) WHERE arank <= $rerank),
       ranked AS (
         SELECT c.qid, c.$idCol,
           list_dot_product(e.ev, q.qv) /
             (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
         FROM cand c JOIN e ON e.$idCol = c.$idCol JOIN qs q ON q.qid = c.qid),
       fin AS (
         SELECT qid, $idCol, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, $idCol) AS rank
         FROM ranked)
       SELECT qid, $idCol, cosine, CAST(rank AS INT) AS rank
       FROM fin WHERE rank <= $k ORDER BY qid, rank"""
  }

  /** DuckDB oracle replaying [[ivfBatchTopK]] end-to-end: centroids by the
    * deterministic `$idCol < nCentroids` rule, per-query probe cells via a
    * windowed rank over the same score formula, cell assignment as in the
    * other IVF oracles, final per-query rank with identical tiebreaks. */
  def ivfBatchOracleSql(table: String, idCol: String, vecCol: String,
                        nCentroids: Int, queryFilter: String,
                        k: Int, nProbe: Int): String =
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS ccid, ev AS cvec FROM e WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, ccid AS cell FROM (
           SELECT e.$idCol, c.ccid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       qs AS (SELECT $idCol AS qid, ev AS qv FROM e WHERE $queryFilter),
       qcell AS (
         SELECT qid, qv, ccid AS cell FROM (
           SELECT q.qid, q.qv, c.ccid,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_dot_product(q.qv, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM qs q, cents c) WHERE rn <= $nProbe),
       cand AS (
         SELECT qc.qid, e.$idCol,
           list_dot_product(e.ev, qc.qv) /
             (sqrt(list_dot_product(e.ev, e.ev)) * sqrt(list_dot_product(qc.qv, qc.qv))) AS cosine
         FROM qcell qc JOIN asg a ON a.cell = qc.cell
                       JOIN e ON e.$idCol = a.$idCol),
       ranked AS (
         SELECT qid, $idCol, cosine,
           row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, $idCol) AS rank
         FROM cand)
       SELECT qid, $idCol, cosine, CAST(rank AS INT) AS rank
       FROM ranked WHERE rank <= $k ORDER BY qid, rank"""

  // ── Scalar quantization (SQ8) ──────────────────────────────────────────

  /** Corpus-wide symmetric quantization scale: the maximum |component| over
    * the whole embedding column. ONE max aggregate (map-side combined,
    * exact — max never loses precision), scalar driver state. */
  def maxAbsScale(emb: DataFrame, vecCol: String): Double =
    emb.agg(max(array_max(transform(col(vecCol).cast("array<double>"),
      x => abs(x))))).head().getDouble(0)

  /** Index build: int8 codes in one projection — the standard memory/IO
    * lever for billion-vector search (FAISS's SQ8: 4× smaller than float32,
    * stored here as a real `array<tinyint>`). `floor(x·127/scale + 0.5)`
    * (round-half-up) is IEEE-exact and engine-portable; with
    * `scale = max|x|` the code range is [-127, 127], so no clamp is needed.
    * Persist the coded column once; probes scan codes and only touch float
    * vectors for the rerank survivors. */
  def withInt8(emb: DataFrame, vecCol: String, scale: Double,
               codeCol: String = "qvec"): DataFrame = {
    require(scale > 0, "positive quantization scale")
    emb.withColumn(codeCol, transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(127.0) / lit(scale) + lit(0.5)).cast("tinyint")))
  }

  /** Driver-side quantization of the query vector with the same rule. */
  def int8Of(query: Seq[Double], scale: Double): Seq[Long] =
    query.map(x => math.floor(x * 127.0 / scale + 0.5).toLong)

  /** Candidate phase of the SQ8 probe: symmetric int8 scoring — an exact
    * int64 dot product of codes (pure integer arithmetic, so the candidate
    * ranking is bit-portable across engines) — TakeOrdered to the top
    * `rerank`. Reads ONLY (id, codes): column pruning keeps the float
    * vector out of this scan entirely. */
  def sqCandidates(indexed: DataFrame, idCol: String, codeCol: String,
                   qCodes: Seq[Long], rerank: Int): DataFrame = {
    val qArr = typedLit(qCodes.toArray)
    val score = aggregate(
      zip_with(col(codeCol).cast("array<long>"), qArr, (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    indexed.select(col(idCol), score.as("qscore"))
      .orderBy(col("qscore").desc, col(idCol))
      .limit(rerank)
  }

  /** Probe a code-indexed table in TWO bounded jobs: the narrow candidate
    * scan above (float vectors never read), then an exact-cosine rerank of
    * the `rerank` collected ids — a driver-bounded list whose `isin`
    * predicate pushes into the parquet scan, so the float column is read
    * only for row groups holding survivors. */
  def sqTopK(indexed: DataFrame, idCol: String, vecCol: String, codeCol: String,
             query: Seq[Double], scale: Double, k: Int, rerank: Int): DataFrame = {
    val ids = sqCandidates(indexed, idCol, codeCol, int8Of(query, scale), rerank)
      .select(col(idCol)).collect().map(_.get(0)).toSeq
    indexed.where(col(idCol).isInCollection(ids))
      .select(col(idCol), VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB oracle reproducing the ENTIRE SQ8 pipeline — scale aggregate,
    * quantization, integer candidate scoring (int codes are ≤ 127·127·dim,
    * exactly representable in doubles, so `list_dot_product` is exact),
    * exact-cosine rerank. */
  def sqOracleSql(table: String, idCol: String, vecCol: String,
                  queryId: Long, k: Int, rerank: Int): String =
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       s AS (SELECT max(list_max(list_transform(ev, x -> abs(x)))) AS scale FROM e),
       qz AS (SELECT $idCol, ev,
         list_transform(ev, x -> floor(x * 127.0 / scale + 0.5)) AS qv
         FROM e, s),
       q AS (SELECT qv AS qq, ev AS qev FROM qz WHERE $idCol = $queryId),
       cand AS (SELECT $idCol, ev, list_dot_product(qz.qv, q.qq) AS qscore
         FROM qz, q ORDER BY qscore DESC, $idCol LIMIT $rerank)
       SELECT $idCol,
         list_dot_product(ev, qev) /
         (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qev, qev))) AS cosine
       FROM cand, q ORDER BY cosine DESC, $idCol LIMIT $k"""

  /** Per-vector SQ8 reconstruction quality — the QA gate before shipping a
    * quantized index (FAISS's recons-error check): the cosine between each
    * vector and its dequantized int8 code, in exact micro-units. A
    * scan-local projection, zero shuffles at any corpus size; feed it to
    * an aggregate (min / percentile) to decide whether SQ8's error budget
    * holds for a given embedding distribution before swapping the probe
    * path over. `scale/127` resolves driver-side to ONE double so the
    * oracle replays the identical dequantization literal. */
  def sqReconstructionError(indexed: DataFrame, idCol: String, vecCol: String,
                            codeCol: String, scale: Double): DataFrame = {
    require(scale > 0, "positive quantization scale")
    val s127 = scale / 127.0
    val deq = transform(col(codeCol).cast("array<double>"), c => c * lit(s127))
    indexed.select(col(idCol),
      round(VectorFns.cosine(col(vecCol), deq) * lit(1e6))
        .cast("long").as("recon_micro"))
  }

  /** DuckDB oracle replaying [[maxAbsScale]] → [[withInt8]] →
    * [[sqReconstructionError]] end-to-end (codes in [−127, 127] are exact
    * in doubles, so skipping the tinyint round-trip changes nothing). */
  def sqReconstructionErrorOracleSql(table: String, idCol: String,
                                     vecCol: String): String =
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       s AS (SELECT max(list_max(list_transform(ev, x -> abs(x)))) AS scale FROM e),
       qz AS (SELECT $idCol, ev,
           list_transform(list_transform(ev, x -> floor(x * 127.0 / scale + 0.5)),
             c -> c * (scale / 127.0)) AS dq
         FROM e, s)
       SELECT $idCol,
         CAST(round(list_dot_product(ev, dq) /
           (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(dq, dq)))
           * 1000000.0) AS BIGINT) AS recon_micro
       FROM qz ORDER BY $idCol"""

  // ── Product quantization (PQ, Jégou et al. 2011) ──────────────────────

  /** Deterministic PQ codebooks: subspace `j`'s codebook is the j-th
    * subvector of each of the `ks` lowest-id vectors (the bounded-sample
    * rule of [[sampleCentroids]] applied per subspace — swap per-subspace
    * k-means in freely; everything downstream only sees the nested seq).
    * `codebooks(j)(c)` is centroid `c` of subspace `j`. */
  def pqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                  m: Int, ks: Int): Seq[Seq[Seq[Double]]] = {
    // codes are stored as tinyint: ks above 128 would wrap negative and
    // pqCandidates' element_at lookups would silently read wrong ADC terms
    require(ks >= 1 && ks <= 128,
      s"ks must be in [1, 128] for tinyint PQ codes, got $ks")
    val base = sampleCentroids(emb, idCol, vecCol, ks)
    val dim  = base.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val d = dim / m
    Seq.tabulate(m)(j => base.map(_.slice(j * d, (j + 1) * d)))
  }

  /** Index build: the m-byte PQ code in ONE projection (array<tinyint> —
    * dim·4 bytes of float32 become m bytes, the compression that lets a
    * 100 TB vector corpus keep its codes in executor memory). Per subspace,
    * the nearest centroid by L2 via the monotone form
    * `|c|² − 2·x·c` (|x|² is constant across centroids); ties break to the
    * lowest centroid id. No join, no window, no shuffle. */
  def withPqCodes(emb: DataFrame, vecCol: String,
                  codebooks: Seq[Seq[Seq[Double]]],
                  codeCol: String = "pq"): DataFrame = {
    require(codebooks.forall(_.length <= 128),
      "tinyint PQ codes hold at most 128 centroids per subspace")
    val d  = codebooks.head.head.length
    val ev = col(vecCol).cast("array<double>")
    val codes = codebooks.zipWithIndex.map { case (cb, j) =>
      val sub = slice(ev, j * d + 1, d)
      // |c|² precomputed driver-side (same accumulation order as the codegen
      // loop ⇒ bit-identical to constant-folding dot(lit, lit)); centroids as
      // single typedLit nodes keep the projection tree small (see
      // centroidScores).
      val scores = array(cb.map { c =>
        lit(dotSeq(c, c)) - lit(2.0) * VectorFns.dot(sub, typedLit(c.toArray))
      }: _*)
      element_at(transform(array(scores), s =>
        array_position(s, array_min(s)) - 1), 1).cast("tinyint")
    }
    emb.withColumn(codeCol, array(codes: _*))
  }

  /** Driver-side ADC term table: `adcTable(j)(c) = |c|² − 2·q_j·c` — the
    * asymmetric-distance contribution of code `c` in subspace `j` (same
    * monotone-L2 form as the build side; adding the constant |q_j|² per
    * subspace would not change any ranking). m·ks doubles. */
  def pqAdcTable(query: Seq[Double], codebooks: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] = {
    val d = codebooks.head.head.length
    codebooks.zipWithIndex.map { case (cb, j) =>
      val qs = query.slice(j * d, (j + 1) * d)
      cb.map { c =>
        val cc = c.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        val qc = qs.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
        cc - 2.0 * qc
      }
    }
  }

  /** Candidate phase of the PQ probe: asymmetric distance computation — m
    * literal table lookups summed in a fixed left-to-right chain
    * (engine-portable IEEE arithmetic), TakeOrdered to the `rerank`
    * nearest codes. Reads ONLY (id, m-byte codes). */
  def pqCandidates(indexed: DataFrame, idCol: String, codeCol: String,
                   adcTable: Seq[Seq[Double]], rerank: Int): DataFrame = {
    val adist = adcTable.zipWithIndex.map { case (t, j) =>
      element_at(typedLit(t.toArray),
        element_at(col(codeCol), j + 1).cast("int") + 1)
    }.reduceLeft(_ + _)
    indexed.select(col(idCol), adist.as("adist"))
      .orderBy(col("adist").asc, col(idCol))
      .limit(rerank)
  }

  /** Probe a PQ-coded table in TWO bounded jobs: the narrow ADC candidate
    * scan (float vectors never read), then an exact-cosine rerank of the
    * collected survivor ids with the `isin` predicate pushed into the
    * parquet scan. */
  def pqTopK(indexed: DataFrame, idCol: String, vecCol: String, codeCol: String,
             query: Seq[Double], codebooks: Seq[Seq[Seq[Double]]],
             k: Int, rerank: Int): DataFrame = {
    val ids = pqCandidates(indexed, idCol, codeCol,
        pqAdcTable(query, codebooks), rerank)
      .select(col(idCol)).collect().map(_.get(0)).toSeq
    indexed.where(col(idCol).isInCollection(ids))
      .select(col(idCol), VectorFns.cosineToQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF+PQ probe — the production composition (FAISS's IVFPQ): the scan is
    * pruned to the `nProbe` cells nearest the query (partition pruning when
    * the cell column is the stored chunk axis), candidates inside them are
    * ranked by the m-byte ADC score, and only the `rerank` survivors touch
    * float vectors. Index build = [[withIvfCell]] ∘ [[withPqCodes]], two
    * stacked shuffle-free projections persisted once. */
  def ivfPqTopK(indexed: DataFrame, idCol: String, vecCol: String,
                cellCol: String, codeCol: String,
                query: Seq[Double], centroids: Seq[Seq[Double]],
                codebooks: Seq[Seq[Seq[Double]]],
                k: Int, nProbe: Int, rerank: Int): DataFrame = {
    val probe = ivfProbeCells(centroids, query, nProbe)
    pqTopK(indexed.where(col(cellCol).isin(probe: _*)),
      idCol, vecCol, codeCol, query, codebooks, k, rerank)
  }

  /** DuckDB oracle reproducing the ENTIRE IVF+PQ pipeline — coarse centroids
    * and PQ codebooks both re-derived from the data by their deterministic
    * `$idCol < n` rules, cell assignment + probe selection as in
    * [[ivfOracleSql]], encode/ADC/rerank as in [[pqOracleSql]] restricted to
    * the probed cells. */
  def ivfPqOracleSql(table: String, idCol: String, vecCol: String,
                     dim: Int, m: Int, ks: Int, nCentroids: Int, nProbe: Int,
                     queryId: Long, k: Int, rerank: Int): String = {
    val d = dim / m
    val chain = (1 until m).foldLeft("s0") { (acc, j) => s"($acc + s$j)" }
    val pivots = (0 until m)
      .map(j => s"max(CASE WHEN j = $j THEN t END) AS s$j").mkString(", ")
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS ccid, ev AS cvec FROM e WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, ccid FROM (
           SELECT e.$idCol, c.ccid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       qv0 AS (SELECT ev AS qv FROM e WHERE $idCol = $queryId),
       probe AS (
         SELECT ccid FROM cents, qv0
         ORDER BY list_dot_product(cvec, qv) / sqrt(list_dot_product(cvec, cvec)) DESC, ccid
         LIMIT $nProbe),
       keep AS (SELECT $idCol FROM asg WHERE ccid IN (SELECT ccid FROM probe)),
       js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       sub AS (SELECT $idCol, j, ev[(j*$d+1):(j*$d+$d)] AS sv FROM e, js),
       cb AS (SELECT j, $idCol AS cid, sv AS cv FROM sub WHERE $idCol < $ks),
       enc AS (
         SELECT $idCol, j, cid FROM (
           SELECT s.$idCol, s.j, c.cid,
             row_number() OVER (PARTITION BY s.$idCol, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)
           WHERE s.$idCol IN (SELECT $idCol FROM keep)) WHERE rn = 1),
       q AS (SELECT j, sv AS qsv FROM sub WHERE $idCol = $queryId),
       term AS (
         SELECT enc.$idCol, enc.j,
           list_dot_product(c.cv, c.cv) - 2*list_dot_product(q.qsv, c.cv) AS t
         FROM enc JOIN cb c ON enc.j = c.j AND enc.cid = c.cid
                  JOIN q ON q.j = enc.j),
       adc AS (SELECT $idCol, $chain AS adist FROM (
         SELECT $idCol, $pivots FROM term GROUP BY $idCol)),
       cand AS (SELECT a.$idCol, e.ev FROM adc a JOIN e USING ($idCol)
         ORDER BY a.adist ASC, a.$idCol LIMIT $rerank),
       qe AS (SELECT ev AS qv FROM e WHERE $idCol = $queryId)
       SELECT $idCol,
         list_dot_product(ev, qv) /
         (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS cosine
       FROM cand, qe ORDER BY cosine DESC, $idCol LIMIT $k"""
  }

  /** DuckDB oracle reproducing the ENTIRE PQ pipeline — codebooks re-derived
    * from the data by the same `$idCol < ks` subvector rule (data-independent
    * of the Spark run), encode via the same monotone-L2 argmin, ADC terms
    * re-derived per subspace, summed in the same left-to-right chain, exact
    * cosine rerank. */
  def pqOracleSql(table: String, idCol: String, vecCol: String,
                  dim: Int, m: Int, ks: Int,
                  queryId: Long, k: Int, rerank: Int): String = {
    val d = dim / m
    val chain = (1 until m).foldLeft("s0") { (acc, j) => s"($acc + s$j)" }
    val pivots = (0 until m)
      .map(j => s"max(CASE WHEN j = $j THEN t END) AS s$j").mkString(", ")
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       sub AS (SELECT $idCol, j, ev[(j*$d+1):(j*$d+$d)] AS sv FROM e, js),
       cb AS (SELECT j, $idCol AS cid, sv AS cv FROM sub WHERE $idCol < $ks),
       enc AS (
         SELECT $idCol, j, cid FROM (
           SELECT s.$idCol, s.j, c.cid,
             row_number() OVER (PARTITION BY s.$idCol, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)) WHERE rn = 1),
       q AS (SELECT j, sv AS qsv FROM sub WHERE $idCol = $queryId),
       term AS (
         SELECT enc.$idCol, enc.j,
           list_dot_product(c.cv, c.cv) - 2*list_dot_product(q.qsv, c.cv) AS t
         FROM enc JOIN cb c ON enc.j = c.j AND enc.cid = c.cid
                  JOIN q ON q.j = enc.j),
       adc AS (SELECT $idCol, $chain AS adist FROM (
         SELECT $idCol, $pivots FROM term GROUP BY $idCol)),
       cand AS (SELECT a.$idCol, e.ev FROM adc a JOIN e USING ($idCol)
         ORDER BY a.adist ASC, a.$idCol LIMIT $rerank),
       qe AS (SELECT ev AS qv FROM e WHERE $idCol = $queryId)
       SELECT $idCol,
         list_dot_product(ev, qv) /
         (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS cosine
       FROM cand, qe ORDER BY cosine DESC, $idCol LIMIT $k"""
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

  // ── Optimized Product Quantization (OPQ — Ge et al., CVPR 2013) ───────
  //
  // PQ quantizes each subspace independently, so its reconstruction error
  // is dominated by whatever variance/correlation structure straddles the
  // subspace cuts. OPQ learns ONE d×d orthonormal rotation R and runs PQ
  // in the rotated space (encode R·x); cosine/L2 are rotation-invariant,
  // so ranking and reconstruction error are measured in the rotated space
  // directly and R⁻¹ is never applied in the hot path. Training is the
  // paper's non-parametric alternation (Alg. 1): fix R → codebooks +
  // assignments on the rotated sample (the SAME deterministic first-ks
  // rule as [[pqCodebooks]]); fix assignments → orthogonal Procrustes
  // R* = polar(X̂ᵀX), solved by Newton's polar iteration (the same unique
  // orthogonal factor an SVD U·Vᵀ would give, for nonsingular input).
  //
  // Scale shape: training is DRIVER-side on the bounded lowest-id sample
  // (nSample·dim doubles — the same collect bound as [[sampleCentroids]]);
  // applying R is ONE shuffle-free projection (dim codegen'd literal dot
  // products) stacked under [[withIvfCell]]/[[withPqCodes]] exactly like
  // the un-rotated family, so the 100 TB build cost is unchanged:
  // scan → project → write. R is a model artifact persisted with the
  // codebooks (64×64 doubles — 32 KB); the trained matrix is a
  // deterministic function of the corpus (fixed sample, fixed iteration
  // budget, sequential arithmetic), so the oracle replays the pipeline
  // with the SAME matrix as literals — the SRP-plane / PQ-codebook
  // literal-injection pattern every other ANN oracle here uses.

  private type Mat = Array[Array[Double]]

  private def matIdentity(n: Int): Mat =
    Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

  /** Gauss–Jordan inverse with partial pivoting — deterministic, throws
    * loudly on a (practically impossible for a Procrustes target of real
    * data) singular input rather than returning garbage. */
  private def matInv(a0: Mat): Mat = {
    val n = a0.length
    val a = a0.map(_.clone())
    val inv = matIdentity(n)
    var col = 0
    while (col < n) {
      var piv = col; var best = math.abs(a(col)(col)); var r = col + 1
      while (r < n) {
        val v = math.abs(a(r)(col)); if (v > best) { best = v; piv = r }; r += 1
      }
      if (!(best > 1e-300))
        throw new IllegalStateException(
          "singular matrix in OPQ Procrustes step — widen nSample")
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val u = inv(piv); inv(piv) = inv(col); inv(col) = u
      }
      val p = a(col)(col)
      var j = 0
      while (j < n) { a(col)(j) /= p; inv(col)(j) /= p; j += 1 }
      r = 0
      while (r < n) {
        if (r != col) {
          val f = a(r)(col)
          if (f != 0.0) {
            var k = 0
            while (k < n) {
              a(r)(k) -= f * a(col)(k); inv(r)(k) -= f * inv(col)(k); k += 1
            }
          }
        }
        r += 1
      }
      col += 1
    }
    inv
  }

  /** Orthogonal polar factor of a nonsingular square matrix via Newton's
    * iteration Q ← (Q + Q⁻ᵀ)/2 — converges quadratically to the same
    * U·Vᵀ an SVD would give, which is exactly the orthogonal Procrustes
    * maximizer of tr(RᵀM). */
  private def polarOrthogonal(m0: Mat): Mat = {
    val n = m0.length
    var q = m0.map(_.clone())
    var it = 0
    var converged = false
    while (it < 100 && !converged) {
      val invT = matInv(q)
      val next = Array.tabulate(n, n)((i, j) => 0.5 * (q(i)(j) + invT(j)(i)))
      var diff = 0.0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          val dv = math.abs(next(i)(j) - q(i)(j)); if (dv > diff) diff = dv
          j += 1
        }
        i += 1
      }
      q = next; it += 1
      if (diff < 1e-14) converged = true
    }
    q
  }

  /** Train the OPQ rotation on the `nSample` lowest-id vectors (the same
    * driver-side sample bound that fits [[pqCodebooks]]). Deterministic:
    * fixed sample, fixed `iters`, sequential arithmetic — the returned
    * matrix is a pure function of the corpus. */
  def opqRotation(emb: DataFrame, idCol: String, vecCol: String,
                  m: Int, ks: Int, nSample: Int = 256,
                  iters: Int = 10): Seq[Seq[Double]] = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    val sample = sampleCentroids(emb, idCol, vecCol, nSample)
      .map(_.toArray).toArray
    require(sample.nonEmpty, "empty OPQ training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    require(ks <= sample.length,
      s"sample (${sample.length}) must cover the $ks codebook rows")
    val d = dim / m
    var rot: Mat = matIdentity(dim)
    def rotate(x: Array[Double]): Array[Double] = {
      val y = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        var s = 0.0; var j = 0
        while (j < dim) { s += rot(i)(j) * x(j); j += 1 }
        y(i) = s; i += 1
      }
      y
    }
    for (_ <- 1 to iters) {
      val y = sample.map(rotate)
      // codebooks: first-ks rotated rows, per-subspace slices (withPqCodes'
      // deterministic rule); encode by the same monotone-L2 argmin with
      // ties to the lowest centroid id
      val recon = y.map { yv =>
        val out = new Array[Double](dim)
        var j = 0
        while (j < m) {
          var bestC = 0; var bestS = Double.PositiveInfinity
          var c = 0
          while (c < ks) {
            var cc = 0.0; var yc = 0.0; var i = 0
            while (i < d) {
              val cv = y(c)(j * d + i)
              cc += cv * cv; yc += yv(j * d + i) * cv; i += 1
            }
            val s = cc - 2.0 * yc
            if (s < bestS) { bestS = s; bestC = c }
            c += 1
          }
          System.arraycopy(y(bestC), j * d, out, j * d, d)
          j += 1
        }
        out
      }
      // Procrustes target M = Σᵢ x̂ᵢ·xᵢᵀ (X̂ᵀX with rows as observations);
      // the orthogonal maximizer of tr(RᵀM) is M's polar factor
      val tgt: Mat = Array.ofDim[Double](dim, dim)
      var i = 0
      while (i < sample.length) {
        val xh = recon(i); val x = sample(i)
        var r = 0
        while (r < dim) {
          val xr = xh(r)
          if (xr != 0.0) {
            var c = 0
            while (c < dim) { tgt(r)(c) += xr * x(c); c += 1 }
          }
          r += 1
        }
        i += 1
      }
      rot = polarOrthogonal(tgt)
    }
    val out = rot.map(_.toSeq).toSeq
    require(out.forall(_.forall(v => !v.isNaN && !v.isInfinite)),
      "OPQ rotation contains non-finite entries")
    out
  }

  /** Apply the rotation as ONE shuffle-free projection:
    * `out[i] = dot(Rᵢ, vec)` — dim codegen'd literal dot products, the
    * same Literal-node discipline as [[centroidScores]]. */
  def withRotation(emb: DataFrame, vecCol: String,
                   rotation: Seq[Seq[Double]],
                   outCol: String = "rvec"): DataFrame = {
    val ev = col(vecCol).cast("array<double>")
    emb.withColumn(outCol,
      array(rotation.map(ri => VectorFns.dot(ev, typedLit(ri.toArray))): _*))
  }

  /** Driver-side rotation of one vector — the same left-to-right
    * accumulation as the codegen'd projection and DuckDB's
    * list_dot_product, so codebooks/queries rotated here are
    * bit-identical to rows rotated in-plan or in the oracle. */
  def rotateQuery(query: Seq[Double], rotation: Seq[Seq[Double]]): Seq[Double] =
    rotation.map(ri => dotSeq(ri, query))

  /** OPQ codebooks: [[pqCodebooks]]' first-ks rule applied to the ROTATED
    * sample (rotated driver-side — bit-identical to reading rotated rows
    * back, see [[rotateQuery]]). */
  def opqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
                   rotation: Seq[Seq[Double]],
                   m: Int, ks: Int): Seq[Seq[Seq[Double]]] = {
    require(ks >= 1 && ks <= 128,
      s"ks must be in [1, 128] for tinyint PQ codes, got $ks")
    val base = sampleCentroids(emb, idCol, vecCol, ks)
      .map(v => rotateQuery(v, rotation))
    val dim = base.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val d = dim / m
    Seq.tabulate(m)(j => base.map(_.slice(j * d, (j + 1) * d)))
  }

  /** Per-row PQ reconstruction error in exact micro-units:
    * `err = 10⁶ − round(cos(vec, x̂)·10⁶)` where x̂ concatenates the coded
    * centroids — the [[sqReconstructionError]] shape for the PQ family.
    * Scan-local, zero shuffles. */
  def pqReconErrMicro(vec: Column, codeCol: Column,
                      codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val recon = concat(codebooks.zipWithIndex.map { case (cb, j) =>
      element_at(typedLit(cb.map(_.toArray).toArray),
        element_at(codeCol, j + 1).cast("int") + 1)
    }: _*)
    lit(1000000L) - round(VectorFns.cosine(vec, recon) * lit(1e6)).cast("long")
  }

  /** The OPQ ship gate — A/B reconstruction-error report at EQUAL (m, ks):
    * ONE scan stamps both the plain-PQ and the OPQ code per row and
    * aggregates each method's mean reconstruction error (micro) plus the
    * per-row win count. Internal sums widen to DECIMAL(38,0) (the
    * 9.2e12-row Long discipline); outputs are bounded BIGINTs. */
  def pqVsOpqRecon(emb: DataFrame, idCol: String, vecCol: String,
                   m: Int, ks: Int, rotation: Seq[Seq[Double]]): DataFrame = {
    val cbs  = pqCodebooks(emb, idCol, vecCol, m, ks)
    val rcbs = opqCodebooks(emb, idCol, vecCol, rotation, m, ks)
    val coded = withPqCodes(
      withPqCodes(withRotation(emb, vecCol, rotation, "__rv"),
        vecCol, cbs, "__pq"),
      "__rv", rcbs, "__opq")
    coded.select(
        pqReconErrMicro(col(vecCol).cast("array<double>"), col("__pq"), cbs)
          .as("pq_err"),
        pqReconErrMicro(col("__rv"), col("__opq"), rcbs).as("opq_err"))
      .agg(
        count(lit(1)).as("n_vectors"),
        expr("CAST(sum(CAST(pq_err AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("pq_mean_err_micro"),
        expr("CAST(sum(CAST(opq_err AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("opq_mean_err_micro"),
        sum(when(col("opq_err") < col("pq_err"), 1L).otherwise(0L))
          .as("opq_win_rows"))
  }

  /** DuckDB nested-list literal for the rotation matrix. Double.toString
    * is shortest-unique-round-trip; every element is forced into
    * E-notation because DuckDB types a PLAIN decimal literal as DECIMAL
    * and unifies all list elements to one (precision, scale) — measured to
    * round ~17% of a 64×64 matrix's entries by one ulp — whereas an
    * exponent literal parses as DOUBLE directly (bit-exact). */
  def rotationSqlLit(rotation: Seq[Seq[Double]]): String = {
    def d(v: Double): String = {
      val s = v.toString
      if (s.contains('E') || s.contains('e')) s else s + "E0"
    }
    rotation.map(_.map(d).mkString("[", ", ", "]")).mkString("[", ", ", "]")
  }

  /** DuckDB oracle replaying [[pqVsOpqRecon]] end-to-end with the trained
    * rotation injected as a literal: rotate, re-derive BOTH codebook sets
    * by the `$idCol < ks` rule, encode, reconstruct (order-preserving
    * flatten), and aggregate the same two means + win count. */
  def opqReconOracleSql(table: String, idCol: String, vecCol: String,
                        dim: Int, m: Int, ks: Int,
                        rotation: Seq[Seq[Double]]): String = {
    val d = dim / m
    val rl = rotationSqlLit(rotation)
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       r AS (SELECT $idCol, ev,
               list_transform(CAST($rl AS DOUBLE[][]),
                 rr -> list_dot_product(ev, rr)) AS rv
             FROM e),
       js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       sub AS (SELECT $idCol, j, ev[(j*$d+1):(j*$d+$d)] AS sv,
                      rv[(j*$d+1):(j*$d+$d)] AS rsv FROM r, js),
       cb  AS (SELECT j, $idCol AS cid, sv  AS cv FROM sub WHERE $idCol < $ks),
       rcb AS (SELECT j, $idCol AS cid, rsv AS cv FROM sub WHERE $idCol < $ks),
       enc AS (SELECT $idCol, j, cid FROM (
           SELECT s.$idCol, s.j, c.cid,
             row_number() OVER (PARTITION BY s.$idCol, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)) WHERE rn = 1),
       renc AS (SELECT $idCol, j, cid FROM (
           SELECT s.$idCol, s.j, c.cid,
             row_number() OVER (PARTITION BY s.$idCol, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.rsv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN rcb c USING (j)) WHERE rn = 1),
       rec AS (SELECT enc.$idCol, flatten(list(c.cv ORDER BY enc.j)) AS xr
               FROM enc JOIN cb c ON c.j = enc.j AND c.cid = enc.cid
               GROUP BY enc.$idCol),
       rrec AS (SELECT renc.$idCol, flatten(list(c.cv ORDER BY renc.j)) AS xr
                FROM renc JOIN rcb c ON c.j = renc.j AND c.cid = renc.cid
                GROUP BY renc.$idCol),
       per AS (SELECT r.$idCol,
                 1000000 - CAST(round(list_dot_product(r.ev, rec.xr) /
                   (sqrt(list_dot_product(r.ev, r.ev)) *
                    sqrt(list_dot_product(rec.xr, rec.xr)))
                   * 1000000.0) AS BIGINT) AS pq_err,
                 1000000 - CAST(round(list_dot_product(r.rv, rrec.xr) /
                   (sqrt(list_dot_product(r.rv, r.rv)) *
                    sqrt(list_dot_product(rrec.xr, rrec.xr)))
                   * 1000000.0) AS BIGINT) AS opq_err
               FROM r JOIN rec USING ($idCol) JOIN rrec USING ($idCol))
       SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(sum(CAST(pq_err AS HUGEINT)) // count(*) AS BIGINT) AS pq_mean_err_micro,
         CAST(sum(CAST(opq_err AS HUGEINT)) // count(*) AS BIGINT) AS opq_mean_err_micro,
         CAST(sum(CASE WHEN opq_err < pq_err THEN 1 ELSE 0 END) AS BIGINT) AS opq_win_rows
       FROM per"""
  }

  /** DuckDB oracle reproducing the ENTIRE stored-OPQ pipeline — the
    * [[ivfPqOracleSql]] replay lifted into the rotated space: rotate with
    * the persisted R (literal), re-derive coarse centroids and codebooks
    * from the ROTATED data by the same `$idCol < n` rules, then cell
    * assign / probe / encode / ADC / rerank exactly as IVF+PQ. */
  def opqIvfPqOracleSql(table: String, idCol: String, vecCol: String,
                        dim: Int, m: Int, ks: Int, nCentroids: Int,
                        nProbe: Int, queryId: Long, k: Int, rerank: Int,
                        rotation: Seq[Seq[Double]]): String = {
    val d = dim / m
    val rl = rotationSqlLit(rotation)
    val chain = (1 until m).foldLeft("s0") { (acc, j) => s"($acc + s$j)" }
    val pivots = (0 until m)
      .map(j => s"max(CASE WHEN j = $j THEN t END) AS s$j").mkString(", ")
    s"""WITH e0 AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev0 FROM $table),
       e AS (SELECT $idCol,
               list_transform(CAST($rl AS DOUBLE[][]),
                 rr -> list_dot_product(ev0, rr)) AS ev
             FROM e0),
       cents AS (SELECT $idCol AS ccid, ev AS cvec FROM e WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, ccid FROM (
           SELECT e.$idCol, c.ccid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.ccid) AS rn
           FROM e, cents c) WHERE rn = 1),
       qv0 AS (SELECT ev AS qv FROM e WHERE $idCol = $queryId),
       probe AS (
         SELECT ccid FROM cents, qv0
         ORDER BY list_dot_product(cvec, qv) / sqrt(list_dot_product(cvec, cvec)) DESC, ccid
         LIMIT $nProbe),
       keep AS (SELECT $idCol FROM asg WHERE ccid IN (SELECT ccid FROM probe)),
       js AS (SELECT unnest(generate_series(0, ${m - 1})) AS j),
       sub AS (SELECT $idCol, j, ev[(j*$d+1):(j*$d+$d)] AS sv FROM e, js),
       cb AS (SELECT j, $idCol AS cid, sv AS cv FROM sub WHERE $idCol < $ks),
       enc AS (
         SELECT $idCol, j, cid FROM (
           SELECT s.$idCol, s.j, c.cid,
             row_number() OVER (PARTITION BY s.$idCol, s.j
               ORDER BY list_dot_product(c.cv, c.cv) - 2*list_dot_product(s.sv, c.cv) ASC, c.cid) AS rn
           FROM sub s JOIN cb c USING (j)
           WHERE s.$idCol IN (SELECT $idCol FROM keep)) WHERE rn = 1),
       q AS (SELECT j, sv AS qsv FROM sub WHERE $idCol = $queryId),
       term AS (
         SELECT enc.$idCol, enc.j,
           list_dot_product(c.cv, c.cv) - 2*list_dot_product(q.qsv, c.cv) AS t
         FROM enc JOIN cb c ON enc.j = c.j AND enc.cid = c.cid
                  JOIN q ON q.j = enc.j),
       adc AS (SELECT $idCol, $chain AS adist FROM (
         SELECT $idCol, $pivots FROM term GROUP BY $idCol)),
       cand AS (SELECT a.$idCol, e.ev FROM adc a JOIN e USING ($idCol)
         ORDER BY a.adist ASC, a.$idCol LIMIT $rerank),
       qe AS (SELECT ev AS qv FROM e WHERE $idCol = $queryId)
       SELECT $idCol,
         list_dot_product(ev, qv) /
         (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))) AS cosine
       FROM cand, qe ORDER BY cosine DESC, $idCol LIMIT $k"""
  }

  // ── simplified silhouette (Rousseeuw 1987; Hruschka et al. 2004) ──────

  /** SIMPLIFIED silhouette per cell — the per-POINT clustering-quality
    * gate next to [[cellScatterReport]]'s per-centroid view: for each
    * vector, a = cosine distance to its own (nearest) centroid, b =
    * distance to the runner-up centroid, s = (b − a)/max(a, b) ∈ [0, 1e6]
    * micro. Cell-scatter can look healthy (tight mean, separated
    * centroids) while a boundary SUBPOPULATION sits at s ≈ 0 — this
    * catches it, and a low-silhouette cell is the "split this cell /
    * retrain k" trigger. Simplified = centroid distances stand in for
    * the O(n²) pairwise form (the Hruschka et al. reduction — the only
    * form that scales).
    *
    * Determinism: distances quantize to floor micro BEFORE the ratio;
    * s = (b − a)·10⁶ div max(a, b) is pure integer math (b ≥ a by
    * argmax), with s = 0 when max(a, b) = 0 (duplicate centroids).
    *
    * Scale shape: one codegen'd k-cosine projection per vector (the
    * [[withIvfCell]] kernel), top-2 via one value-sort of the k-array,
    * then ONE k-row hash aggregate. Vectors never shuffle. */
  def silhouetteReport(emb: DataFrame, vecCol: String,
                       centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.size >= 2, "need at least two centroids")
    // stage the k-cosine array behind one alias so the argmax and the two
    // top-2 reads share a single evaluation of the kernel
    val staged = emb.select(col(vecCol).as("__v"))
      .select(array(centroids.map(c =>
        VectorFns.cosine(col("__v"), typedLit(c.toArray))): _*).as("__c"))
    val ab = staged.select(
      element_at(transform(array(col("__c")), s =>
        array_position(s, array_max(s)) - 1), 1).cast("int").as("cell"),
      floor((lit(1.0d) - element_at(sort_array(col("__c"), asc = false), 1))
        * lit(1e6)).cast("long").as("a"),
      floor((lit(1.0d) - element_at(sort_array(col("__c"), asc = false), 2))
        * lit(1e6)).cast("long").as("b"))
    ab.select(col("cell"),
        when(greatest(col("a"), col("b")) === 0L, lit(0L))
          .otherwise(expr("(b - a) * 1000000L div greatest(a, b)")).as("s"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"))
      .select(col("cell"), col("n"),
        expr("ss div n").as("mean_silhouette_micro"))
  }

  /** DuckDB oracle replaying [[silhouetteReport]] with centroids
    * re-derived by the deterministic `id < nCentroids` rule. */
  def silhouetteOracleSql(table: String, idCol: String, vecCol: String,
                          nCentroids: Int): String =
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS cid, ev AS cv FROM e
                 WHERE $idCol < $nCentroids),
       sc AS (SELECT e.$idCol, c.cid,
                list_dot_product(e.ev, c.cv) /
                  (sqrt(list_dot_product(e.ev, e.ev)) *
                   sqrt(list_dot_product(c.cv, c.cv))) AS cos
              FROM e, cents c),
       rk AS (SELECT $idCol, cid, cos,
                row_number() OVER (PARTITION BY $idCol
                  ORDER BY cos DESC, cid) AS rn
              FROM sc),
       ab AS (SELECT r1.$idCol, CAST(r1.cid AS INTEGER) AS cell,
                CAST(floor((1.0 - r1.cos) * 1000000.0) AS BIGINT) AS a,
                CAST(floor((1.0 - r2.cos) * 1000000.0) AS BIGINT) AS b
              FROM rk r1 JOIN rk r2 ON r1.$idCol = r2.$idCol
              WHERE r1.rn = 1 AND r2.rn = 2),
       sil AS (SELECT cell,
                CASE WHEN greatest(a, b) = 0 THEN 0
                     ELSE (b - a) * 1000000 // greatest(a, b) END AS s
              FROM ab)
       SELECT cell, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(s) AS BIGINT) // count(*) AS mean_silhouette_micro
       FROM sil GROUP BY cell ORDER BY cell"""

  // ── embedding anisotropy report (Ethayarajh, EMNLP 2019) ───────────────

  /** Embedding-space ANISOTROPY report — the geometry health check before
    * any cosine-based op is trusted: contextual/encoder embeddings often
    * occupy a narrow cone (random-pair cosine ≫ 0), which silently
    * compresses every cosine threshold in the dedup/ANN families. Pairs
    * are the DETERMINISTIC disjoint matching (id i ↔ id i + ⌊N/2⌋ —
    * every vector in at most one pair, no sampling RNG, replayable);
    * output is the cosine histogram over [−1, 1] with per-bin counts and
    * means. A healthy isotropic space centers near 0; mass near 1 means
    * cone collapse.
    *
    * Determinism: per-pair cosines floor-quantize to micro BEFORE the
    * bin/mean aggregation (quantize-per-pair, integer sums after).
    * Scale: one self equi-join on the shifted id + one |bins|-row
    * aggregate; vectors cross the join once. */
  def anisotropyReport(emb: DataFrame, idCol: String, vecCol: String,
                       bins: Int = 20): DataFrame = {
    require(bins >= 2 && bins <= 1000, "bins in [2, 1000]")
    val half = emb.agg(expr("count(1) div 2").as("half"))
    val a = emb.select(col(idCol).as("aid"), col(vecCol).as("av"))
      .crossJoin(broadcast(half))
      .where(col("aid") < col("half"))
      .withColumn("bid", col("aid") + col("half"))
    val pairs = a.join(
      emb.select(col(idCol).as("bid"), col(vecCol).as("bv")), Seq("bid"))
    val cosMicro = floor(VectorFns.cosine(col("av"), col("bv")) * lit(1e6))
      .cast("long")
    pairs.select(cosMicro.as("c"))
      .select(least(greatest(
          expr(s"CAST((c + 1000000) * $bins div 2000000 AS INT)"), lit(0)),
          lit(bins - 1)).as("bin"),
        col("c"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"),
        // both engines TRUNCATE integer division toward zero (Spark
        // `div` ≡ DuckDB `//` on integers — verified on negatives), so
        // the plain quotient is parity-safe even for negative bin sums
        expr("CAST(sum(c) div count(1) AS BIGINT)").as("mean_cos_micro"))
  }

  /** DuckDB oracle replaying [[anisotropyReport]]. */
  def anisotropyOracleSql(table: String, idCol: String, vecCol: String,
                          bins: Int = 20): String =
    s"""WITH h AS (SELECT CAST(count(*) // 2 AS BIGINT) AS half FROM $table),
       a AS (SELECT $idCol AS aid, CAST($vecCol AS DOUBLE[]) AS av
             FROM $table, h WHERE $idCol < h.half),
       bt AS (SELECT $idCol AS bid, CAST($vecCol AS DOUBLE[]) AS ev
              FROM $table),
       p AS (SELECT a.aid, a.av, bt.ev AS bv
             FROM a, h, bt WHERE bt.bid = a.aid + h.half),
       c AS (SELECT CAST(floor(list_dot_product(av, bv) /
               (sqrt(list_dot_product(av, av)) *
                sqrt(list_dot_product(bv, bv))) * 1000000.0) AS BIGINT) AS c
             FROM p)
       SELECT CAST(least(greatest((c + 1000000) * $bins // 2000000, 0),
           ${bins - 1}) AS INTEGER) AS bin,
         CAST(count(*) AS BIGINT) AS cnt,
         CAST(CAST(sum(c) AS HUGEINT) // count(*) AS BIGINT)
           AS mean_cos_micro
       FROM c GROUP BY 1 ORDER BY bin"""

  // ── per-group centroid similarity (domain-mix planning) ────────────────

  /** Pairwise cosine similarity between per-group embedding CENTROIDS —
    * the semantic sibling of q_source_js's token-level divergence matrix:
    * which domains/labels occupy nearby regions of embedding space (merge
    * candidates for mixture planning; a near-1 off-diagonal pair is two
    * sources of the same content under different names).
    *
    * Determinism: cos(mean_a, mean_b) = cos(sum_a, sum_b) — the 1/n
    * scalars cancel — so the centroid division never happens: per-(group,
    * dim) SUMS of micro-quantized elements are exact longs, the cross-
    * group dot/norm products widen to DECIMAL(38,0), and the final
    * cosine is the ONE float stage (floored micro).
    *
    * Scale shape: posexplode to (group, dim) then ONE hash aggregate —
    * |groups|·dim rows out of the corpus; the pair join is grid×grid on
    * dim (broadcast, corpus-independent). */
  def groupCentroidSimilarity(emb: DataFrame, groupCol: String,
                              vecCol: String): DataFrame = {
    val sums = emb
      .select(col(groupCol).as("g"), posexplode(col(vecCol)).as(Seq("pos", "e")))
      .groupBy(col("g"), col("pos"))
      .agg(sum(round(col("e").cast("double") * lit(1e6)).cast("long"))
        .cast("decimal(38,0)").as("s"))
      .localCheckpoint(true)
    val a = sums.select(col("g").as("g1"), col("pos"), col("s").as("s1"))
    val b = sums.select(col("g").as("g2"), col("pos"), col("s").as("s2"))
    val prods = a.join(b, Seq("pos"))
      .where(col("g1") < col("g2"))
      .groupBy(col("g1"), col("g2"))
      .agg(sum(col("s1") * col("s2")).as("dot"))
    val norms = sums.groupBy(col("g"))
      .agg(sum(col("s") * col("s")).as("nrm"))
      .localCheckpoint(true)
    prods
      .join(broadcast(norms.select(col("g").as("g1"), col("nrm").as("n1"))),
        "g1")
      .join(broadcast(norms.select(col("g").as("g2"), col("nrm").as("n2"))),
        "g2")
      .select(col("g1"), col("g2"),
        floor(col("dot").cast("double") /
          sqrt(col("n1").cast("double") * col("n2").cast("double")) *
          lit(1e6)).cast("long").as("cosine_micro"))
  }

  /** DuckDB oracle replaying [[groupCentroidSimilarity]]. */
  def groupCentroidSimilarityOracleSql(table: String, groupCol: String,
                                       vecCol: String): String =
    s"""WITH el AS (SELECT $groupCol AS g,
           generate_subscripts($vecCol, 1) AS pos,
           CAST(round(CAST(unnest($vecCol) AS DOUBLE) * 1000000.0) AS BIGINT)
             AS em
         FROM $table),
       sums AS (SELECT g, pos, CAST(sum(em) AS HUGEINT) AS s
                FROM el GROUP BY 1, 2),
       prods AS (SELECT a.g AS g1, b.g AS g2, sum(a.s * b.s) AS dot
                 FROM sums a JOIN sums b ON a.pos = b.pos AND a.g < b.g
                 GROUP BY 1, 2),
       norms AS (SELECT g, sum(s * s) AS nrm FROM sums GROUP BY 1)
       SELECT p.g1, p.g2,
         CAST(floor(CAST(p.dot AS DOUBLE) /
           sqrt(CAST(n1.nrm AS DOUBLE) * CAST(n2.nrm AS DOUBLE)) *
           1000000.0) AS BIGINT) AS cosine_micro
       FROM prods p JOIN norms n1 ON n1.g = p.g1
                    JOIN norms n2 ON n2.g = p.g2
       ORDER BY p.g1, p.g2"""
}
