package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Driver-side mirror of [[hashBucket]] for string values — lets a probe
    * compute WHICH buckets a handful of keys land in (partition pruning)
    * without a Spark job. Bit-identical to the Column form. */
  def hashBucketValue(v: String, buckets: Int = 100): Long = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = digest.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

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

  /** Output shard plan — the webdataset/LLM-export step: assign every row
    * a shard id such that shards hold ≈ `targetPerShard` of `sizeCol`
    * (tokens, bytes) in a deterministic, engine-portable order. Rows lay
    * out md5-of-id-ordered inside `buckets` independent hash buckets
    * (buckets-way parallel — the same layout as sequence packing, so no
    * global sort, no single-partition window); a row's shard is the
    * target-sized window its cumulative START offset falls in, namespaced
    * by bucket. Returns the per-shard manifest (shard_id, n_docs,
    * sum_size) — join the assignment back by recomputing it, or write with
    * `partitionBy(shard_id)`.
    */
  def shardPlan(docs: org.apache.spark.sql.DataFrame, idCol: String,
                sizeCol: Column, targetPerShard: Long,
                buckets: Int = 8): DataFrame =
    shardAssign(docs, idCol, sizeCol, targetPerShard, buckets)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__sz")).as("sum_size"))

  /** The shard-assignment pipeline shared by [[shardPlan]] and
    * [[shardManifest]] — every input row plus its `shard_id`. */
  private def shardAssign(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          sizeCol: Column, targetPerShard: Long,
                          buckets: Int): DataFrame = {
    require(targetPerShard > 0, "targetPerShard must be positive")
    require(buckets > 0, "buckets must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs.withColumn("__b", hashBucket(col(idCol), buckets))
      .withColumn("__sz", sizeCol.cast("long"))
      .withColumn("__cum", sum(col("__sz")).over(w))
      .withColumn("shard_id",
        col("__b") * lit(1000000L) +
          expr(s"(__cum - __sz) div $targetPerShard"))
  }

  /** Checksummed export manifest — [[shardPlan]] plus a per-shard CONTENT
    * signature: the sum of a caller-supplied 60-bit row hash, widened to
    * decimal(38,0) so the sum is exact and ANSI-overflow-proof (the
    * [[graft.ops.Maintenance.verify]] signature discipline). Publish the
    * manifest next to the export and any consumer can verify shard
    * integrity without re-reading the corpus; order-independent, so a
    * re-export that lays rows out differently still verifies. */
  def shardManifest(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    sizeCol: Column, contentHash: Column,
                    targetPerShard: Long, buckets: Int = 8): DataFrame =
    shardAssign(docs, idCol, sizeCol, targetPerShard, buckets)
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__sz")).as("sum_size"),
        // STRING digits, not decimal: the exact value survives both
        // engines' dataframe bridges (pandas floats big decimals)
        sum(contentHash.cast("decimal(38,0)")).cast("string").as("content_sig"))

  /** Per-group quota cap — crawl balancing: keep at most `n` rows per group
    * (domain, source, shard), ranked by `order` (which MUST be a total
    * order — include an id tiebreak). The Common-Crawl curation guard
    * against head-domain dominance: no single domain contributes more than
    * its quota, and the quota goes to the best-ranked documents.
    *
    * Group cardinality is typically tiny next to row count (thousands of
    * domains, billions of rows), so a single window partitioned by group
    * would funnel whole domains through single tasks. Two stages instead:
    * a window over (group, salt) — `salts`-way parallel, each partition
    * ≈ 1/salts of the group — keeps only local top-n survivors, then the
    * global window ranks the ≤ n·salts survivors per group. Stage-2 state
    * is bounded by configuration (n·salts rows per group), never by data.
    * The salt derives from md5 of `saltOn` (deterministic, reshard-stable);
    * both stages rank by the same total order, so the composition equals
    * the single-window semantics exactly (top-n distributes over salted
    * top-n union).
    */
  def capPerGroup(df: org.apache.spark.sql.DataFrame, groupCol: String,
                  order: Seq[Column], n: Int, saltOn: Column,
                  salts: Int = 64): DataFrame = {
    require(n > 0, "n must be positive")
    require(salts > 0, "salts must be positive")
    val saltC = "__graft_salt"; val rnC = "__graft_rn"
    require(!df.columns.contains(saltC) && !df.columns.contains(rnC),
      s"input already has a reserved column ($saltC/$rnC)")
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col(saltC)).orderBy(order: _*)
    val global = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(order: _*)
    df.withColumn(saltC, hashBucket(saltOn, salts))
      .withColumn(rnC, row_number().over(local))
      .where(col(rnC) <= n)
      .drop(saltC, rnC)
      .withColumn("rnk", row_number().over(global).cast("long"))
      .where(col("rnk") <= n)
  }

  /** Leakage-safe train/val/test split: near-duplicate documents NEVER
    * straddle a split boundary. Membership hashes the near-dup CLUSTER
    * label (min reachable id through the pair graph,
    * [[ApproxDedup.nearDupClusters]]) instead of the document id, so a
    * test document's near-twin cannot sit in train — the standard guard
    * against split leakage inflating eval scores (cf. Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better", §6).
    *
    * Singletons (no near-dup pair) label as their own id — for them this
    * degrades to the plain [[splitLabel]] carve. The cluster table is the
    * paired sliver of the corpus; the join against it shuffles only ids and
    * labels (AQE broadcasts it when it fits). Same md5-bucket mechanics as
    * [[splitLabel]]: engine-portable, append-stable, oracle-replayable.
    */
  def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame,
                       pairs: org.apache.spark.sql.DataFrame, idCol: String,
                       weights: Seq[(String, Int)]): DataFrame =
    leakageSafeSplitFromClusters(docs, ApproxDedup.nearDupClusters(pairs),
      idCol, weights)

  /** [[leakageSafeSplit]] over a PRECOMPUTED cluster-label table
    * (doc_id, cluster_id) — shares one propagation with the dedup stage in
    * composed pipelines. */
  def leakageSafeSplitFromClusters(docs: org.apache.spark.sql.DataFrame,
                                   clusters0: org.apache.spark.sql.DataFrame,
                                   idCol: String,
                                   weights: Seq[(String, Int)]): DataFrame = {
    val clusters = clusters0.select(col("doc_id").as(idCol), col("cluster_id"))
    docs.join(clusters, Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("split", splitLabel(col("group_id"), weights))
      .drop("cluster_id")
  }

  /** Weighted sampling WITHOUT replacement, ∝ a per-row weight (quality
    * score, token count, dedup-cluster mass): keep the k rows ranked by
    * `round(ln(w)·1e6) + gumbel_micro(id)` — Gumbel-top-k over log-weights,
    * which draws exactly the Efraimidis–Spirakis ("Weighted random sampling
    * with a reservoir", IPL 2006) distribution: P(row i first) = w_i / Σw.
    * The Gumbel noise is the repo's deterministic md5 coin
    * ([[Dsir.gumbelMicro]]), so the sample is reproducible across engines,
    * reruns, and reshards, and the ranking key is an INTEGER (micro-nats) —
    * ties break by id, no float-comparison parity risk anywhere.
    *
    * Scale: a pure scan projection + TakeOrdered(k) — zero shuffles; rows
    * with non-positive weight are excluded (ln undefined), matching "weight
    * 0 = never sampled". The weight stays a DOUBLE end-to-end: fractional
    * quality scores in (0,1) are first-class (ln is finite and negative),
    * with no truncate-vs-round cast divergence between engines.
    */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: Column,
                     k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    docs.where(weightCol > lit(0))
      .select(col(idCol), weightCol.cast("double").as("weight"))
      .withColumn("score_micro",
        round(log(col("weight")) * lit(1e6)).cast("long") +
          Dsir.gumbelMicro(col(idCol)))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB oracle replaying [[weightedSample]] — same ln quantization and
    * the same md5-derived Gumbel coin as the DSIR resample oracle. */
  def weightedSampleOracleSql(table: String, idCol: String,
                              weightExpr: String, k: Int): String =
    s"""WITH t AS (
         SELECT $idCol, CAST($weightExpr AS DOUBLE) AS weight FROM $table
         WHERE $weightExpr > 0),
       s AS (
         SELECT $idCol, weight,
           CAST(round(ln(weight) * 1000000.0) AS BIGINT) +
           CAST(round(-ln(-ln(
             (CAST(('0x' || substring(md5(CAST($idCol AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0)) * 1000000.0) AS BIGINT) AS score_micro
         FROM t)
       SELECT $idCol, weight, score_micro FROM s
       ORDER BY score_micro DESC, $idCol LIMIT $k"""

  /** PER-GROUP weighted sampling without replacement — k rows per domain
    * ∝ weight (the balanced-subset builder: "500 docs per source, biased
    * toward quality"): the same integer Gumbel-top-k key as
    * [[weightedSample]], ranked inside each group by one keyed window.
    * Groups with fewer than k positive-weight rows return what they have.
    *
    * Scale: ONE group-keyed window shuffle; the key is integer micro-nats
    * with an id tiebreak, so reruns and reshards agree exactly. A group
    * hot enough to skew its reducer can pre-thin through [[capPerGroup]]'s
    * salted two-stage composition — same semantics.
    */
  def weightedSamplePerGroup(docs: DataFrame, idCol: String,
                             groupCol: String, weightCol: Column,
                             k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("score_micro").desc, col(idCol))
    docs.where(weightCol > lit(0))
      .select(col(idCol), col(groupCol), weightCol.cast("double").as("weight"))
      .withColumn("score_micro",
        round(log(col("weight")) * lit(1e6)).cast("long") +
          Dsir.gumbelMicro(col(idCol)))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .drop("rnk")
  }

  /** DuckDB oracle replaying [[weightedSamplePerGroup]]. */
  def weightedSamplePerGroupOracleSql(table: String, idCol: String,
                                      groupCol: String, weightExpr: String,
                                      k: Int): String =
    s"""WITH t AS (
         SELECT $idCol, $groupCol, CAST($weightExpr AS DOUBLE) AS weight
         FROM $table WHERE $weightExpr > 0),
       s AS (
         SELECT $idCol, $groupCol, weight,
           CAST(round(ln(weight) * 1000000.0) AS BIGINT) +
           CAST(round(-ln(-ln(
             (CAST(('0x' || substring(md5(CAST($idCol AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
               / 4294967296.0)) * 1000000.0) AS BIGINT) AS score_micro
         FROM t),
       r AS (
         SELECT $idCol, $groupCol, weight, score_micro,
           row_number() OVER (PARTITION BY $groupCol
             ORDER BY score_micro DESC, $idCol) AS rnk
         FROM s)
       SELECT $idCol, $groupCol, weight, score_micro FROM r
       WHERE rnk <= $k ORDER BY $idCol"""

  /** Epoch MATERIALIZATION — the upsampling step downstream of
    * [[tokenBudgetPlan]]: emit each document `floor(rate)` times plus one
    * fractional epoch drawn by the deterministic md5 coin (u < frac(rate)),
    * where rate = domain target tokens / actual tokens. A domain with
    * rate 2.4 repeats every doc twice and a deterministic 40% of docs a
    * third time — the "epochs over source" a mixture data card publishes,
    * turned into actual training rows (DoReMi/Pile §2: small domains
    * repeat, the dominant domain subsamples). Expected token yield per
    * domain = its budgeted target, exactly.
    *
    * Scale: one broadcast of the |domains|-row rate table, then a pure
    * projection + explode — rows out ∝ epochs, zero shuffles beyond the
    * plan's own aggregate. The coin is per-DOCUMENT, so an incremental
    * append re-derives the same epochs for existing docs (append-stable).
    * `sequence(0, n−1)` is guarded: Spark's `sequence(0, -1)` is a
    * DESCENDING [0, -1], not empty.
    */
  def materializeEpochs(docs: DataFrame, idCol: String, domainCol: String,
                        tokensCol: Column, weights: Seq[(String, Double)],
                        budget: Long): DataFrame = {
    val rates = tokenBudgetPlan(docs, domainCol, tokensCol, weights, budget)
      .select(col(domainCol), col("sample_rate"))
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(0.5d)) / lit(4294967296.0d)
    val nFull = floor(col("sample_rate")).cast("long")
    val frac = col("sample_rate") - nFull.cast("double")
    val nCopies = (nFull + when(u < frac, lit(1L)).otherwise(lit(0L))).as("__n")
    docs.join(broadcast(rates), Seq(domainCol))
      .select(col(idCol), col(domainCol), nCopies)
      .select(col(idCol), col(domainCol),
        explode(when(col("__n") < 1, array().cast("array<long>"))
          .otherwise(sequence(lit(0L), col("__n") - 1))).as("epoch"))
  }

  /** DuckDB oracle replaying [[materializeEpochs]] — same rate arithmetic
    * shapes (bigint floor cast back to double), same md5 coin. Weight
    * doubles serialize from the SAME values the Spark plan uses, so they
    * parse back bit-identical. */
  def materializeEpochsOracleSql(table: String, idCol: String,
                                 domainCol: String, tokensExpr: String,
                                 weights: Seq[(String, Double)],
                                 budget: Long): String = {
    val values = weights.sortBy(_._1)
      .map { case (d, w) => s"('$d', CAST($w AS DOUBLE))" }.mkString(", ")
    s"""WITH t AS (
         SELECT $idCol, $domainCol, CAST($tokensExpr AS BIGINT) AS n_tokens
         FROM $table),
       w($domainCol, weight) AS (VALUES $values),
       agg AS (SELECT $domainCol, CAST(sum(n_tokens) AS BIGINT) AS actual
               FROM t GROUP BY 1),
       r AS (SELECT agg.$domainCol,
               CAST(CAST(floor(CAST($budget AS DOUBLE) * weight) AS BIGINT) AS DOUBLE)
                 / CAST(actual AS DOUBLE) AS rate
             FROM agg JOIN w USING ($domainCol)),
       d AS (SELECT t.$idCol, t.$domainCol,
               CAST(floor(rate) AS BIGINT) AS n_full,
               rate - CAST(CAST(floor(rate) AS BIGINT) AS DOUBLE) AS frac,
               (CAST(('0x' || substring(md5(CAST(t.$idCol AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                 / 4294967296.0 AS u
             FROM t JOIN r USING ($domainCol)),
       n AS (SELECT $idCol, $domainCol,
               n_full + CASE WHEN u < frac THEN 1 ELSE 0 END AS n_copies
             FROM d)
       SELECT $idCol, $domainCol, CAST(e AS BIGINT) AS epoch FROM (
         SELECT $idCol, $domainCol, unnest(generate_series(0, n_copies - 1)) AS e
         FROM n WHERE n_copies >= 1) x
       ORDER BY $idCol, epoch"""
  }

  /** Token-budget mixture PLAN — the accounting step upstream of
    * [[mixtureSample]]/[[stratifiedPredicate]]: given target mixture
    * weights per domain (Pile/DoReMi-style) and a total token budget,
    * report per domain the actual token supply, the budgeted demand, the
    * implied sampling rate, and the epoch count (rate above 1 means the
    * domain repeats — the "epochs over source" number data cards publish).
    * One map-side-combined aggregate over the corpus plus a broadcast of
    * the weight table; output is |domains| rows, driver-safe at any scale.
    */
  def tokenBudgetPlan(docs: org.apache.spark.sql.DataFrame, domainCol: String,
                      tokensCol: Column, weights: Seq[(String, Double)],
                      budget: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0),
      "weights must be non-empty and non-negative")
    require(budget >= 0L, "budget must be non-negative")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF(domainCol, "weight")
    docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensCol.cast("long")).as("actual_tokens"))
      .join(broadcast(w), Seq(domainCol))
      .withColumn("target_tokens",
        floor(lit(budget.toDouble) * col("weight")).cast("long"))
      .withColumn("sample_rate",
        col("target_tokens").cast("double") / col("actual_tokens").cast("double"))
      .withColumn("epochs", ceil(col("sample_rate")).cast("long"))
      .select(col(domainCol), col("n_docs"), col("actual_tokens"),
        col("target_tokens"), col("sample_rate"), col("epochs"))
  }

  /** UniMax language-balanced budget allocation (Chung et al., ICLR 2023
    * "UniMax: Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining"): split a total token `budget` across
    * languages as uniformly as possible, capping each language at
    * `epochCap` epochs over its supply. UniMax's sequential pass (visit
    * languages by ascending supply; give each `min(epochCap·supply,
    * remaining/languages-left)`) is EXACTLY water-filling — once one
    * language is left uncapped, every later (larger) one receives the same
    * equal share — so the whole allocation resolves in closed form with
    * window functions: the capped set is the longest ascending-supply
    * prefix where `cap·(languages left) ≤ budget remaining`, and everyone
    * after it splits the remainder evenly. No driver loop, no recursion,
    * and the same windows replay in ANSI SQL.
    *
    * All arithmetic is LONG with integer division (the equal share floors;
    * the ≤ |languages|-token residue is deliberately left unspent —
    * deterministic beats exhaustive here). Output: one row per language —
    * (lang, supply_tokens, capped, alloc_tokens, epochs_micro).
    *
    * Scale: ONE map-side-combined aggregate over the corpus into a
    * |languages|-row table; every window below runs on those rows.
    */
  def unimaxAllocation(docs: DataFrame, langCol: String, tokensCol: Column,
                       budget: Long, epochCap: Int): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    require(epochCap > 0, "epochCap must be positive")
    import org.apache.spark.sql.expressions.Window
    val supply = docs.groupBy(col(langCol))
      .agg(sum(tokensCol.cast("long")).as("supply"))
      .withColumn("cap", col("supply") * lit(epochCap.toLong))
    val byAsc = Window.orderBy(col("supply"), col(langCol))
    val all = Window.partitionBy()
    // ranked: rn, cumulative capped mass INCLUDING this row, |languages|
    val ranked = supply
      .withColumn("rn", row_number().over(byAsc))
      .withColumn("cum", sum(col("cap")).over(
        byAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(all))
      // row k fits under its cap iff cap_k·(n−k+1) ≤ B − cum_{k−1}
      .withColumn("fits",
        col("cap") * (col("n") - col("rn") + lit(1L)) <=
          lit(budget) - (col("cum") - col("cap")))
    // the capped set is the longest prefix of fitting rows: one unfit row
    // un-caps everything after it (water level reached)
    val kRow = min(when(!col("fits"), col("rn"))).over(all)
    val labeled = ranked
      .withColumn("capped", col("rn") < coalesce(kRow, col("n") + lit(1L)))
      .withColumn("cap_mass",
        max(when(col("capped"), col("cum")).otherwise(lit(0L))).over(all))
      .withColumn("n_uncapped",
        sum(when(!col("capped"), lit(1L)).otherwise(lit(0L))).over(all))
    labeled
      .withColumn("alloc_tokens", when(col("capped"), col("cap"))
        .otherwise(expr(s"(${budget}L - cap_mass) div n_uncapped")))
      .withColumn("epochs_micro", expr("alloc_tokens * 1000000L div supply"))
      .select(col(langCol), col("supply").as("supply_tokens"), col("capped"),
        col("alloc_tokens"), col("epochs_micro"))
  }

  /** Temperature-scaled language mixture (Arivazhagan et al. 2019 §4.2;
    * the mT5/XLM-R sampling rule): language l receives budget share
    * ∝ supply_l^alpha, with alpha ∈ (0, 1] flattening the head (alpha = 1
    * is proportional, alpha → 0 is uniform). The UniMax alternative
    * ([[unimaxAllocation]]) caps epochs instead; production pipelines
    * publish both tables and pick one.
    *
    * Parity: `supply^alpha` is computed as a double, normalized by the MAX
    * weight (a |languages|-row window), and quantized to integer
    * micro-units BEFORE the share sum — the sum is an order-independent
    * LONG and every downstream division is integer, so the oracle replays
    * bit-for-bit (the zipfFit ln-micro precedent: one double transcendental
    * per GROUP, then exact arithmetic).
    *
    * Scale: ONE map-side-combined aggregate over the corpus; all windows
    * run on |languages| rows. Output: (lang, supply_tokens, weight_micro,
    * target_tokens, epochs_micro).
    */
  def temperatureMixture(docs: DataFrame, langCol: String, tokensCol: Column,
                         budget: Long, alpha: Double): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    docs.groupBy(col(langCol))
      .agg(sum(tokensCol.cast("long")).as("supply"))
      .withColumn("w", pow(col("supply").cast("double"), lit(alpha)))
      .withColumn("weight_micro",
        round(col("w") / max(col("w")).over(all) * lit(1e6)).cast("long"))
      .withColumn("target_tokens",
        expr(s"${budget}L * weight_micro div sum(weight_micro) over ()"))
      .withColumn("epochs_micro", expr("target_tokens * 1000000L div supply"))
      .select(col(langCol), col("supply").as("supply_tokens"),
        col("weight_micro"), col("target_tokens"), col("epochs_micro"))
  }

  /** DuckDB oracle replaying [[temperatureMixture]]. */
  def temperatureMixtureOracleSql(table: String, langCol: String,
                                  tokensExpr: String, budget: Long,
                                  alpha: Double): String =
    s"""WITH s AS (SELECT $langCol, CAST(sum($tokensExpr) AS BIGINT) AS supply
             FROM $table GROUP BY 1),
       w AS (SELECT $langCol, supply, pow(CAST(supply AS DOUBLE), $alpha) AS w
             FROM s),
       m AS (SELECT $langCol, supply,
               CAST(round(w / max(w) OVER () * 1000000.0) AS BIGINT)
                 AS weight_micro
             FROM w),
       t AS (SELECT *, $budget * weight_micro // sum(weight_micro) OVER ()
               AS target_tokens FROM m)
       SELECT $langCol, supply AS supply_tokens, weight_micro,
         CAST(target_tokens AS BIGINT) AS target_tokens,
         CAST(target_tokens * 1000000 // supply AS BIGINT) AS epochs_micro
       FROM t ORDER BY $langCol"""

  /** Curriculum / domain-interleaved training order: rank documents within
    * each domain (by a quality/difficulty score descending, id tiebreak),
    * and emit the lexicographic training key `(round, domain_idx)` — round
    * r of the curriculum takes each domain's r-th best document, so domains
    * interleave 1:1 and quality decays smoothly over the run (the standard
    * curriculum/annealing layout; cf. DoReMi-style staged mixtures).
    * `global_pos` = (round−1)·|domains| + domain_idx is exact while every
    * domain still has documents and leaves deterministic GAPS after short
    * domains exhaust — readers order by the key, so gaps are harmless (and
    * a gapless global row_number would be a single-partition sort at
    * 100 TB, which is exactly what this avoids).
    *
    * Scale: ONE domain-keyed window shuffle for the rank; the domain index
    * is a |domains|-row window broadcast back. No global sort anywhere.
    */
  def curriculumInterleave(docs: DataFrame, idCol: String, domainCol: String,
                           scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // rank over the PROJECTED score column: scoreCol may reference inputs
    // (e.g. the text) that the narrowed frame below no longer carries
    val perDomain = Window.partitionBy(col(domainCol))
      .orderBy(col("score").desc, col(idCol))
    val domIdx = docs.select(col(domainCol)).distinct()
      .withColumn("domain_idx", row_number().over(
        Window.orderBy(col(domainCol))).cast("long"))
      .withColumn("n_doms",
        count(lit(1)).over(Window.partitionBy()).cast("long"))
    docs.select(col(idCol), col(domainCol), scoreCol.as("score"))
      .withColumn("round", row_number().over(perDomain).cast("long"))
      .join(broadcast(domIdx), Seq(domainCol))
      .withColumn("global_pos",
        (col("round") - lit(1L)) * col("n_doms") + col("domain_idx"))
      .select(col(idCol), col(domainCol), col("round"), col("domain_idx"),
        col("global_pos"))
  }

  /** DuckDB oracle replaying [[curriculumInterleave]]. */
  def curriculumInterleaveOracleSql(table: String, idCol: String,
                                    domainCol: String,
                                    scoreExpr: String): String =
    s"""WITH d AS (SELECT $idCol, $domainCol, $scoreExpr AS score FROM $table),
       di AS (SELECT $domainCol,
                CAST(row_number() OVER (ORDER BY $domainCol) AS BIGINT)
                  AS domain_idx,
                count(*) OVER () AS n_doms
              FROM (SELECT DISTINCT $domainCol FROM d) x),
       r AS (SELECT $idCol, $domainCol,
               CAST(row_number() OVER (PARTITION BY $domainCol
                 ORDER BY score DESC, $idCol) AS BIGINT) AS round
             FROM d)
       SELECT r.$idCol, r.$domainCol, r.round, di.domain_idx,
         (r.round - 1) * di.n_doms + di.domain_idx AS global_pos
       FROM r JOIN di USING ($domainCol)
       ORDER BY r.$idCol"""

  /** DuckDB oracle replaying [[unimaxAllocation]] — identical windows,
    * identical integer division. */
  def unimaxAllocationOracleSql(table: String, langCol: String,
                                tokensExpr: String, budget: Long,
                                epochCap: Int): String =
    s"""WITH s AS (SELECT $langCol, CAST(sum($tokensExpr) AS BIGINT) AS supply
             FROM $table GROUP BY 1),
       r AS (SELECT $langCol, supply, supply * $epochCap AS cap,
               row_number() OVER (ORDER BY supply, $langCol) AS rn,
               sum(supply * $epochCap) OVER (ORDER BY supply, $langCol
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               count(*) OVER () AS n
             FROM s),
       f AS (SELECT *, cap * (n - rn + 1) <= $budget - (cum - cap) AS fits
             FROM r),
       k AS (SELECT *,
               rn < coalesce(min(CASE WHEN NOT fits THEN rn END) OVER (), n + 1)
                 AS capped
             FROM f),
       m AS (SELECT *,
               max(CASE WHEN capped THEN cum ELSE 0 END) OVER () AS cap_mass,
               sum(CASE WHEN NOT capped THEN 1 ELSE 0 END) OVER () AS n_uncapped
             FROM k)
       SELECT $langCol, supply AS supply_tokens, capped,
         CAST(CASE WHEN capped THEN cap
              ELSE ($budget - cap_mass) // n_uncapped END AS BIGINT)
           AS alloc_tokens,
         CAST(CASE WHEN capped THEN cap
              ELSE ($budget - cap_mass) // n_uncapped END AS BIGINT)
           * 1000000 // supply AS epochs_micro
       FROM m ORDER BY $langCol"""

  /** Length-bucketed BATCH PLAN — the data-loader materialization after
    * [[graft.ops.Corpus.paddingWaste]] picks the boundaries: rows bucket to
    * the smallest boundary ≥ length (overflow truncates to the top
    * boundary, the paddingWaste discipline), and batches of `batchSize`
    * form inside each (bucket, shard) in descending-length order. Per
    * batch: rows, the batch's max length (its dynamic padding width), the
    * exact token sum, and the padding waste n·max − sum.
    *
    * Scale: the md5 shard bins make the plan SHARDS-way parallel — each
    * data-loader worker batches its own shard, so no bucket ever needs a
    * global total order (a per-bucket row_number would funnel 100 TB
    * through one task per bucket). One keyed window per (bucket, shard);
    * the plan is append-stable in the id hash, not arrival order. */
  def lengthBatchPlan(docs: DataFrame, idCol: String, lenCol: Column,
                      boundaries: Seq[Int], batchSize: Int,
                      shards: Int): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.forall(_ >= 1), "boundaries must be ascending positives")
    require(batchSize >= 1 && shards >= 1, "batchSize and shards must be positive")
    val top = boundaries.last
    val bucket = boundaries.init.reverse
      .foldLeft(lit(top): Column) { (acc, b) => when(lenCol <= b, b).otherwise(acc) }
    val len = least(lenCol.cast("long"), lit(top.toLong))
    docs.select(col(idCol), bucket.cast("int").as("bucket"),
        hashBucket(col(idCol), shards).cast("int").as("shard"), len.as("len"))
      .withColumn("batch_id", expr(s"CAST((row_number() OVER (PARTITION BY bucket, shard ORDER BY len DESC, $idCol) - 1) div $batchSize AS INT)"))
      .groupBy(col("bucket"), col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("n_rows"), max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .select(col("bucket"), col("shard"), col("batch_id"), col("n_rows"),
        col("max_len"), col("sum_len"),
        (col("n_rows") * col("max_len") - col("sum_len")).as("pad_waste"),
        expr("(n_rows * max_len - sum_len) * 1000000L div (n_rows * max_len)")
          .as("waste_micro"))
  }

  /** DuckDB oracle replaying [[lengthBatchPlan]]. */
  def lengthBatchPlanOracleSql(table: String, idCol: String, lenExpr: String,
                               boundaries: Seq[Int], batchSize: Int,
                               shards: Int): String = {
    val top = boundaries.last
    val bucketCase = boundaries.init.map(b => s"WHEN l <= $b THEN $b")
      .mkString("CASE ", " ", s" ELSE $top END")
    s"""WITH src AS (SELECT $idCol AS id, CAST($lenExpr AS BIGINT) AS l FROM $table),
       b AS (SELECT id, CAST($bucketCase AS INTEGER) AS bucket,
               CAST(CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
                 % $shards AS INTEGER) AS shard,
               least(l, $top) AS len
             FROM src),
       r AS (SELECT bucket, shard, len,
               CAST((row_number() OVER (PARTITION BY bucket, shard
                 ORDER BY len DESC, id) - 1) // $batchSize AS INTEGER) AS batch_id
             FROM b),
       g AS (SELECT bucket, shard, batch_id, CAST(count(*) AS BIGINT) AS n_rows,
               max(len) AS max_len, CAST(sum(len) AS BIGINT) AS sum_len
             FROM r GROUP BY bucket, shard, batch_id)
       SELECT bucket, shard, batch_id, n_rows, max_len, sum_len,
         n_rows * max_len - sum_len AS pad_waste,
         (n_rows * max_len - sum_len) * 1000000 // (n_rows * max_len) AS waste_micro
       FROM g ORDER BY bucket, shard, batch_id"""
  }

  /** DoReMi-style excess-loss domain reweighting — the multiplicative-
    * weights UPDATE step (Xie et al. 2023 §3.2): each domain's mixture
    * weight moves up by how much its proxy loss EXCEEDS the reference
    * model's, wᵢ′ ∝ priorᵢ·exp(η·max(lossᵢ−refᵢ, 0)), renormalized to
    * Σ = 10⁶. The static-mixture planners ([[tokenBudgetPlan]],
    * [[temperatureMixture]], [[unimaxAllocation]]) consume the result;
    * this is the feedback edge that turns them into a DoReMi loop.
    *
    * Exactness: losses/priors arrive as integer micro-units; the one
    * transcendental per domain evaluates exp on a double derived from
    * exact longs (identical IEEE input on both engines — the ln
    * discipline of the LM family), floors back to micro, and the
    * renormalization is integer division over an exact long total
    * (DECIMAL(38,0)-widened).
    *
    * Scale: the input is already per-DOMAIN (bounded — domains number
    * tens to thousands); one 1-row total broadcast back. The corpus-side
    * work (computing per-domain losses) happens upstream in whatever
    * scorer feeds this. */
  def domainExcessReweight(df: DataFrame, domainCol: String,
                           priorMicroCol: String, lossMicroCol: String,
                           refMicroCol: String, etaMicro: Long): DataFrame = {
    require(etaMicro >= 0L, "etaMicro must be non-negative")
    val raw = df.select(col(domainCol), col(priorMicroCol),
        greatest(col(lossMicroCol) - col(refMicroCol), lit(0L))
          .as("excess_micro"))
      .select(col(domainCol), col(priorMicroCol), col("excess_micro"),
        floor(col(priorMicroCol).cast("double") *
          exp((lit(etaMicro) * col("excess_micro")).cast("double") /
            lit(1e12))).cast("long").as("w_raw"))
    val tot = raw.agg(sum(col("w_raw")).as("tot"))
    raw.crossJoin(broadcast(tot))
      .select(col(domainCol), col(priorMicroCol), col("excess_micro"),
        expr("CAST(w_raw AS DECIMAL(38,0)) * 1000000 div tot").cast("long")
          .as("weight_micro"))
  }

  /** DuckDB oracle replaying [[domainExcessReweight]] over a per-domain
    * subquery providing (domain, prior_micro, loss_micro, ref_micro). */
  def domainExcessReweightOracleSql(table: String, domainCol: String,
                                    priorMicroCol: String,
                                    lossMicroCol: String,
                                    refMicroCol: String,
                                    etaMicro: Long): String =
    s"""WITH src AS (SELECT $domainCol, $priorMicroCol,
           greatest($lossMicroCol - $refMicroCol, 0) AS excess_micro
         FROM $table),
       raw AS (SELECT $domainCol, $priorMicroCol, excess_micro,
           CAST(floor(CAST($priorMicroCol AS DOUBLE) *
             exp(CAST($etaMicro * excess_micro AS DOUBLE) / 1e12))
             AS BIGINT) AS w_raw
         FROM src),
       t AS (SELECT CAST(sum(w_raw) AS BIGINT) AS tot FROM raw)
       SELECT $domainCol, $priorMicroCol, excess_micro,
         CAST(CAST(w_raw AS HUGEINT) * 1000000 // tot AS BIGINT)
           AS weight_micro
       FROM raw, t ORDER BY $domainCol"""

  // ── k-center greedy selection (Gonzalez 1985; Sener & Savarese, ICLR
  //    2018 "Active Learning for CNNs: A Core-Set Approach") ─────────────

  /** Greedy k-center selection over an embedding corpus — the core-set
    * baseline for diversity-first data selection: start from the lowest
    * id, then repeatedly pick the vector FARTHEST from the selected set
    * (2-approximation of the k-center cover). Every distance is an exact
    * IEEE composition of left-to-right dot products (bit-equal in the
    * oracle), ties break to the lowest id, so the greedy trajectory is
    * deterministic cross-engine. The recorded distance of pick i is the
    * covering radius before that pick — the curve a selection budget is
    * read off of.
    *
    * Scale: k−1 scans, each ONE projection computing min-distance to ≤ k
    * literal centers + a TakeOrdered(1) — no joins, no windows, no
    * shuffles beyond the argmax reduce; driver state is k vectors. */
  def kCenterSelect(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val spark = emb.sparkSession
    val ev = col(vecCol).cast("array<double>")
    def d2(center: Seq[Double]): Column = {
      val c = graft.functions.VectorFns
      val cl = typedLit(center.toArray)
      c.dot(ev, ev) - lit(2.0) * c.dot(ev, cl) +
        lit(center.zip(center).foldLeft(0.0) { case (a, (x, y)) => a + x * y })
    }
    def vecOf(id: Long): Seq[Double] =
      emb.where(col(idCol) === id).select(ev).head().getSeq[Double](0)
    val firstId = emb.agg(min(col(idCol))).head().getLong(0)
    val picks = scala.collection.mutable.ArrayBuffer[(Long, Long)](
      (firstId, 0L))
    var centers = Seq(vecOf(firstId))
    var i = 1
    while (i < k) {
      val md =
        if (centers.size == 1) d2(centers.head)
        else least(centers.map(d2): _*)
      val row = emb.select(col(idCol).cast("long").as("id"), md.as("md"))
        .orderBy(col("md").desc, col("id").asc).limit(1).head()
      val (id, dist) = (row.getLong(0), row.getDouble(1))
      picks += ((id, math.round(dist * 1e6)))
      centers = centers :+ vecOf(id)
      i += 1
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(picks.toList.zipWithIndex.map {
        case ((id, dm), o) =>
          org.apache.spark.sql.Row((o + 1).toLong, id, dm) }, 1),
      StructType(Seq(StructField("pick_order", LongType),
        StructField("vec_id", LongType),
        StructField("min_dist_micro", LongType))))
  }

  /** DuckDB oracle replaying [[kCenterSelect]] — one pair of CTEs per
    * pick (running-min distance update, then the argmax), the same exact
    * double arithmetic. */
  def kCenterOracleSql(table: String, idCol: String, vecCol: String,
                       k: Int): String = {
    def d2(evExpr: String, pvExpr: String) =
      s"""list_dot_product($evExpr, $evExpr)
          - 2.0 * list_dot_product($evExpr, $pvExpr)
          + list_dot_product($pvExpr, $pvExpr)"""
    val steps = (2 to k).map { i =>
      val prevM =
        if (i == 2) s"SELECT e.id, e.ev, ${d2("e.ev", "p1.ev")} AS md FROM e, p1"
        else s"SELECT m${i - 1}.id, m${i - 1}.ev, least(m${i - 1}.md, ${d2(s"m${i - 1}.ev", s"p${i - 1}.ev")}) AS md FROM m${i - 1}, p${i - 1}"
      s"""m$i AS MATERIALIZED ($prevM),
         s$i AS (SELECT id, md FROM m$i ORDER BY md DESC, id LIMIT 1),
         p$i AS (SELECT e.id, e.ev FROM e JOIN s$i ON s$i.id = e.id)"""
    }.mkString(",\n       ")
    val out = (2 to k).map(i =>
      s"SELECT $i AS pick_order, id, CAST(round(md * 1000000.0) AS BIGINT) AS min_dist_micro FROM s$i")
      .mkString("\n       UNION ALL ")
    s"""WITH e AS (SELECT CAST($idCol AS BIGINT) AS id,
           CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       p1 AS (SELECT id, ev FROM e WHERE id = (SELECT min(id) FROM e)),
       $steps
       SELECT CAST(pick_order AS BIGINT) AS pick_order, id AS vec_id,
         min_dist_micro
       FROM (
       SELECT 1 AS pick_order, id, CAST(0 AS BIGINT) AS min_dist_micro FROM p1
       UNION ALL $out) z
       ORDER BY pick_order"""
  }

  // ── UCB1 source-exploration scores (Auer et al., ML 2002) ──────────────

  /** UCB1 scores per source — the exploration-aware ranking for "which
    * domain should the next crawl/annotation budget go to": a source's
    * priority is its mean observed quality PLUS the √(2·ln N / n) bonus
    * that decays as the source accumulates observations, so an
    * under-sampled domain with mediocre mean outranks a well-measured
    * equal one (the bandit view of the [[sourceCap]]/mixture planners —
    * exploit quality, but pay for certainty).
    *
    * Determinism: mean is exact integer division of exact sums; the
    * bonus is the ONE float stage (√/ln over two exact longs, micro-
    * rounded); ucb = mean + bonus in longs.
    *
    * Scale: ONE map-side-combined aggregate to the |sources| grid; N
    * broadcast. */
  def ucbSourceScores(df: DataFrame, groupCol: String,
                      scoreMicroCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("src"),
        col(scoreMicroCol).cast("long").as("s"))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"))
      .localCheckpoint(true)
    val tot = g.agg(sum(col("n")).as("nn"))
    g.crossJoin(broadcast(tot))
      .select(col("src"), col("n"),
        expr("ss div n").as("mean_micro"),
        round(sqrt(lit(2.0) * log(col("nn").cast("double")) /
          col("n").cast("double")) * lit(1e6)).cast("long")
          .as("bonus_micro"))
      .withColumn("ucb_micro", col("mean_micro") + col("bonus_micro"))
  }

  /** DuckDB oracle replaying [[ucbSourceScores]]; `rowsSql` yields
    * (src, s). */
  def ucbSourceScoresOracleSql(rowsSql: String): String =
    s"""WITH r AS ($rowsSql),
       g AS (SELECT src, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(s) AS BIGINT) AS ss
             FROM r GROUP BY 1),
       nn AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM g)
       SELECT g.src, g.n, g.ss // g.n AS mean_micro,
         CAST(round(sqrt(2.0 * ln(CAST(nn.nn AS DOUBLE)) /
           CAST(g.n AS DOUBLE)) * 1000000.0) AS BIGINT) AS bonus_micro,
         g.ss // g.n +
           CAST(round(sqrt(2.0 * ln(CAST(nn.nn AS DOUBLE)) /
             CAST(g.n AS DOUBLE)) * 1000000.0) AS BIGINT) AS ucb_micro
       FROM g, nn ORDER BY g.src"""

  // ── per-epoch seeded training-order shuffle ──────────────────────────

  /** The trainer-facing global shuffle: each epoch reads the corpus in a
    * DIFFERENT pseudo-random order, materialized WITHOUT a global sort —
    * a row's shard is its seeded hash bucket and its position the rank
    * WITHIN that shard (one partitioned window per epoch; readers consume
    * shard files independently, the standard distributed-trainer layout).
    * The order is a pure function of (seed, id): no RNG state, stable
    * under reshards and reruns, replayable by the oracle bit-for-bit —
    * and epoch orders are decorrelated because the seed participates in
    * the hash, which is exactly why trainers reseed per epoch (Ott et
    * al. 2019-style epoch seeding) instead of reusing one permutation. */
  def epochShuffle(df: DataFrame, idCol: String,
                   seeds: Seq[Long], shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(seeds.nonEmpty && shards >= 1)
    val byEpoch = seeds.zipWithIndex.map { case (seed, e) =>
      df.select(lit(e.toLong).as("epoch"), col(idCol),
        graft.functions.TextFns.md5Long60(
          concat_ws("_", lit(seed), col(idCol))).as("__k"))
    }.reduce(_.unionByName(_))
    byEpoch
      .withColumn("shard", pmod(col("__k"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          .orderBy(col("__k"), col(idCol))))
      .select(col("epoch"), col("shard"), col("pos").cast("long").as("pos"),
        col(idCol))
  }

  /** DuckDB oracle replaying [[epochShuffle]]. */
  def epochShuffleOracleSql(table: String, idCol: String,
                            seeds: Seq[Long], shards: Int): String = {
    val epochs = seeds.zipWithIndex
      .map { case (seed, e) => s"($e, $seed)" }.mkString(", ")
    s"""WITH ep(epoch, seed) AS (VALUES $epochs),
       k AS (SELECT ep.epoch, d.$idCol,
               CAST(('0x' || substring(md5(CAST(ep.seed AS VARCHAR) || '_' ||
                 CAST(d.$idCol AS VARCHAR)), 1, 15)) AS BIGINT) AS k
             FROM $table d, ep)
       SELECT CAST(epoch AS BIGINT) AS epoch,
         k % $shards AS shard,
         CAST(row_number() OVER (PARTITION BY epoch, k % $shards
           ORDER BY k, $idCol) AS BIGINT) AS pos,
         $idCol
       FROM k ORDER BY epoch, shard, pos"""
  }
}
