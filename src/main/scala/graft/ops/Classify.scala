package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes at corpus scale (McCallum & Nigam 1998, the
  * event model behind fastText-style shallow doc classifiers and the
  * CCNet quality-scoring shape) — classifier TRAINING as pure counting:
  * the model is (per-label doc counts, per-(label, token) occurrence
  * counts), which are ADDITIVE, so the trained model inherits the
  * engine's whole stored-pipe discipline for free: per-batch counts
  * blind-append into hash-bucketed pipes and one groupBy-sum fold ≡ a
  * full-corpus retrain (the lm_index_sync pattern — this is the
  * classifier sibling of the KenLM family).
  *
  * Scoring is add-one-smoothed log-likelihood, micro-quantized per
  * (label, token) TYPE before any sum (order-independent longs — the
  * unigramLogProb discipline): score(d, ℓ) = prior_micro(ℓ) +
  * Σ_t c(d,t)·lp_micro(ℓ,t), missing (ℓ,t) falling back to the label's
  * smoothing floor. The prediction is the argmax label, ties to the
  * lexicographically smallest — deterministic cross-engine.
  *
  * Scale: training = one scan into (label, token) counts (map-side
  * combined). Scoring = doc-token counts fanned |labels| ways (labels
  * are a bounded dimension), one broadcast-sized model join, one
  * (doc, label) aggregate, one doc-partitioned argmax window. Text never
  * shuffles; the window partitions by doc id, never globally. */
object Classify {

  /** Per-batch model counts: (label, n_docs) and (bucket, label, token,
    * cnt) — both additive (blind-append + fold ≡ rebuild). `buckets`
    * hash-partitions the token table for stored-pipe pruning. */
  def nbCounts(docs: DataFrame, labelCol: String, textCol: String,
               buckets: Int): (DataFrame, DataFrame) = {
    val cls = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val toks = docs.select(col(labelCol).as("label"),
        explode(graft.functions.TextFns.tokens(lower(trim(col(textCol))))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .select(Sampling.hashBucket(col("token"), buckets).as("bucket"),
        col("label"), col("token"), col("cnt"))
    (cls, toks)
  }

  /** Fold of blind-appended class-count batches. */
  def nbFoldClasses(stored: DataFrame): DataFrame =
    stored.groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs"))

  /** Fold of blind-appended token-count batches. */
  def nbFoldTokens(stored: DataFrame): DataFrame =
    stored.groupBy(col("bucket"), col("label"), col("token"))
      .agg(sum(col("cnt")).as("cnt"))

  /** The smoothed model table: (label, token, cnt, lp_micro) with
    * lp_micro = round(ln((cnt+1)/(tot_label+V))·1e6). `vocabSize` is the
    * distinct-token count across labels (one bounded driver long). */
  def nbModel(tokenCounts: DataFrame, vocabSize: Long): DataFrame = {
    // eager-snap the type-level count table (|labels|·|vocab| rows): the
    // totals aggregate and the smoothing join both read it — without the
    // snap each consumer replays the corpus-scan lineage
    val tc = tokenCounts.localCheckpoint(true)
    val tot = tc.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
    tc.join(broadcast(tot), Seq("label"))
      .select(col("label"), col("token"), col("cnt"),
        round(log((col("cnt").cast("double") + lit(1.0)) /
          (col("tot") + lit(vocabSize)).cast("double")) * lit(1e6))
          .cast("long").as("lp_micro"))
  }

  /** The full per-(doc, label) score table behind [[nbClassify]]:
    * (id, actual, label, score_micro) — |labels| rows per doc. Exposed so
    * probability-consuming audits ([[confidentLearning]]) read EVERY
    * class's score, not just the argmax. */
  def nbScores(docs: DataFrame, idCol: String, labelCol: String,
               textCol: String, classCounts: DataFrame,
               tokenCounts: DataFrame, vocabSize: Long): DataFrame = {
    // eager-snap the model-count table once — totals, floor, and the
    // smoothed model all read it (type-level rows, bounded)
    val tcs = tokenCounts.localCheckpoint(true)
    val tot = tcs.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
    val labels = classCounts.crossJoin(
        classCounts.agg(sum(col("n_docs")).as("n_all")))
      .join(tot, Seq("label"))
      .select(col("label"),
        round(log(col("n_docs").cast("double") / col("n_all").cast("double"))
          * lit(1e6)).cast("long").as("prior_micro"),
        round(log(lit(1.0) / (col("tot") + lit(vocabSize)).cast("double"))
          * lit(1e6)).cast("long").as("floor_micro"))
    val model = nbModel(tcs, vocabSize)
      .select(col("label"), col("token"), col("lp_micro"))
    val docToks = docs.select(col(idCol), col(labelCol).as("actual"),
        explode(graft.functions.TextFns.tokens(lower(trim(col(textCol))))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col(idCol), col("actual"), col("token"))
      .agg(count(lit(1)).as("c"))
    docToks
      .join(broadcast(labels), lit(true))
      .join(broadcast(model), Seq("label", "token"), "left")
      .groupBy(col(idCol), col("actual"), col("label"))
      .agg((max(col("prior_micro")) +
        sum(col("c") * coalesce(col("lp_micro"), col("floor_micro"))))
        .as("score_micro"))
  }

  /** Per-document classification against a trained model: (id, actual
    * label, predicted label, score_micro of the prediction). */
  def nbClassify(docs: DataFrame, idCol: String, labelCol: String,
                 textCol: String, classCounts: DataFrame,
                 tokenCounts: DataFrame, vocabSize: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = nbScores(docs, idCol, labelCol, textCol, classCounts,
      tokenCounts, vocabSize)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col(idCol), col("actual"), col("label").as("predicted"),
        col("score_micro"))
  }

  // ── confident-learning label-noise audit (Northcutt et al., JAIR 2021) ──

  /** The confident joint C[given ỹ, confident y*] over a score table from
    * [[nbScores]] — the label-noise estimator: per-class self-confidence
    * thresholds t_j = mean p̂(j | x over docs GIVEN label j), then each doc
    * counts into cell (ỹ, argmax over classes whose p̂ clears t_j); docs
    * clearing no threshold abstain. Off-diagonal mass = estimated label
    * noise; the worklist for relabeling is the off-diagonal cells.
    *
    * Probabilities from log scores with NO order-dependent float sum: the
    * softmax terms quantize per (doc, label) TYPE — e = round(1e6·
    * exp((s − s_max)/1e6)) (exact-int inputs, one float op each) — and
    * everything after is integer: p = e·1e6 div Σe, thresholds are floor
    * means, the argmax ties to the smallest label.
    *
    * Scale shape: |labels|-bounded fanout per doc, one doc-keyed max +
    * one doc-keyed sum + a broadcast threshold join + one doc-partitioned
    * argmax window; output is the |labels|² joint. */
  def confidentLearning(scores: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sm = scores.groupBy(col(idCol))
      .agg(max(col("score_micro")).as("smax"))
    val em = scores.join(sm, Seq(idCol))
      .select(col(idCol), col("actual"), col("label"),
        round(lit(1e6) * exp((col("score_micro") - col("smax"))
          .cast("double") / lit(1e6))).cast("long").as("e"))
    val es = em.groupBy(col(idCol)).agg(sum(col("e")).as("et"))
    val pm = em.join(es, Seq(idCol))
      .select(col(idCol), col("actual"), col("label"),
        expr("e * 1000000L div et").as("p"))
      .localCheckpoint(true)
    val th = pm.where(col("actual") === col("label"))
      .groupBy(col("label"))
      .agg(expr("sum(p) div count(1)").as("t"))
    val cand = pm.join(broadcast(th), Seq("label"))
      .where(col("p") >= col("t"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("p").desc, col("label").asc)
    val star = cand.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("actual").as("given_label"), col("label").as("star_label"))
    val cj = star.groupBy(col("given_label"), col("star_label"))
      .agg(count(lit(1)).as("cnt"))
    val tot = cj.agg(sum(col("cnt")).as("n"))
    cj.crossJoin(broadcast(tot))
      .select(col("given_label"), col("star_label"), col("cnt"),
        expr("cnt * 1000000L div n").as("frac_micro"))
  }

  // ── batch-synchronous perceptron (Rosenblatt 1958) ─────────────────────

  /** Hashed-feature doc representation for linear models: per (doc,
    * bucket) token counts over `buckets` md5-hash buckets plus one bias
    * feature (bucket −1, x = 1) per doc — the fastText hashing trick, so
    * the weight vector is a bounded `buckets`+1-row table regardless of
    * vocabulary size. */
  def hashedDocFeatures(docs: DataFrame, idCol: String, labelCol: String,
                         textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 65536, "buckets in [2, 65536]")
    val toks = docs.select(col(idCol).as("doc"),
        col(labelCol).cast("int").as("y"),
        explode(graft.functions.TextFns.tokens(lower(trim(col(textCol)))))
          .as("token"))
      .where(length(col("token")) > 0)
    val feat = toks.select(col("doc"), col("y"),
        pmod(graft.functions.TextFns.md5Long60(col("token")),
          lit(buckets.toLong)).as("f"))
      .groupBy(col("doc"), col("y"), col("f"))
      .agg(count(lit(1)).as("x"))
    val bias = docs.select(col(idCol).as("doc"),
      col(labelCol).cast("int").as("y"), lit(-1L).as("f"), lit(1L).as("x"))
    feat.unionByName(bias)
  }

  /** RIDGE LINEAR PROBE fit (Hoerl & Kennard 1970; the "linear probe"
    * everywhere in data-quality classifier distillation) — the
    * closed-form trained linear classifier next to the NB counter: the
    * normal equations (XᵀX + λI)w = Xᵀy are solved EXACTLY once, so
    * unlike any gradient/perceptron iteration there is nothing to
    * oscillate, no learning rate, and the fit is a pure function of two
    * EXACT INTEGER corpus aggregates: the Gram matrix XᵀX (per-doc
    * feature self-join, fanout ≤ dims² per doc — dims is the hash-bucket
    * count, a config constant) and Xᵀy. Both collect as bounded driver
    * state (≤ (dims+1)² longs — the k-means envelope); the dense solve is
    * a dims³ driver flop. Weights ship as micro longs, so APPLICATION is
    * exact integer math and the oracle replays it from the inlined
    * artifact (the ItqModel/OPQ shipped-model pattern).
    *
    * Returns the sorted (f, w_micro) model. */
  def ridgeProbeFit(features: DataFrame, lambda: Double): Seq[(Long, Long)] = {
    require(lambda >= 0, "lambda must be non-negative")
    val feat = features.localCheckpoint(true)
    val fs = feat.select(col("f")).distinct()
      .collect().map(_.getLong(0)).sorted
    val idx = fs.zipWithIndex.toMap
    val n = fs.length
    val gRows = feat
      .join(feat.select(col("doc"), col("f").as("f2"), col("x").as("x2")),
        Seq("doc"))
      .groupBy(col("f"), col("f2"))
      .agg(sum(col("x") * col("x2")).as("g"))
      .collect()
    val bRows = feat.groupBy(col("f"))
      .agg(sum(col("x") * col("y")).as("b"))
      .collect()
    val a = Array.ofDim[Double](n, n + 1)
    gRows.foreach { r =>
      a(idx(r.getLong(0)))(idx(r.getLong(1))) = r.getLong(2).toDouble
    }
    (0 until n).foreach(i => a(i)(i) += lambda)
    bRows.foreach(r => a(idx(r.getLong(0)))(n) = r.getLong(1).toDouble)
    // Gaussian elimination with partial pivoting — deterministic given
    // the exact integer inputs
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(p); a(p) = t
      require(math.abs(a(c)(c)) > 1e-12, "singular Gram matrix")
      for (r <- 0 until n if r != c) {
        val m = a(r)(c) / a(c)(c)
        for (k <- c to n) a(r)(k) -= m * a(c)(k)
      }
    }
    fs.zipWithIndex.map { case (f, i) =>
      (f, math.round(a(i)(n) / a(i)(i) * 1e6))
    }.toSeq
  }

  /** Confusion counts of a shipped linear-probe model over a feature
    * table: one row (tp, fp, fn, tn, accuracy_micro). Scores are exact
    * longs (micro weights × integer counts); score 0 predicts −1. */
  def ridgeProbeEval(features: DataFrame,
                     weights: Seq[(Long, Long)]): DataFrame = {
    val s = features.sparkSession
    val wdf = s.createDataFrame(weights).toDF("f", "w")
    features.join(broadcast(wdf), Seq("f"))
      .groupBy(col("doc"), col("y"))
      .agg(sum(col("x") * col("w")).as("s"))
      .select(col("y"), when(col("s") > 0, 1).otherwise(-1).as("p"))
      .agg(
        sum(when(col("y") === 1 && col("p") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === -1 && col("p") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 1 && col("p") === -1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("y") === -1 && col("p") === -1, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        expr("(tp + tn) * 1000000L div (tp + fp + fn + tn)")
          .as("accuracy_micro"))
  }

  /** Shared SQL CTEs → `feat(doc, y, f, x)`, the twin of
    * [[hashedDocFeatures]]. */
  private def hashedDocFeatCtes(table: String, idCol: String,
                                 labelExpr: String, textCol: String,
                                 buckets: Int): String =
    s"""tk AS (SELECT doc, CAST(__y AS INTEGER) AS y, token
         FROM (SELECT $idCol AS doc, $labelExpr AS __y,
                 unnest(string_split_regex(trim(lower($textCol)), '\\s+'))
                   AS token
               FROM $table) t
         WHERE length(token) > 0),
       hfeat AS (SELECT doc, y,
           CAST('0x' || substring(md5(token), 1, 15) AS BIGINT) % $buckets
             AS f,
           CAST(count(*) AS BIGINT) AS x
         FROM tk GROUP BY 1, 2, 3),
       feat AS (SELECT doc, y, f, x FROM hfeat
              UNION ALL
              SELECT $idCol, CAST($labelExpr AS INTEGER),
                CAST(-1 AS BIGINT), CAST(1 AS BIGINT)
              FROM $table)"""

  /** DuckDB oracle replaying [[ridgeProbeEval]] with the SHIPPED weight
    * artifact inlined as literals (the ItqModel/OPQ stored-model
    * pattern): the oracle exercises the distributed APPLICATION path —
    * hashing, feature counts, the model join, exact integer scores,
    * the confusion rollup — end to end; the driver-side dims³ solve is
    * pinned by the normal-equation residual spec instead. */
  def ridgeProbeEvalOracleSql(table: String, idCol: String,
                              labelExpr: String, textCol: String,
                              buckets: Int,
                              weights: Seq[(Long, Long)]): String = {
    val values = weights.map { case (f, w) =>
      s"(CAST($f AS BIGINT), CAST($w AS BIGINT))" }.mkString(", ")
    s"""WITH ${hashedDocFeatCtes(table, idCol, labelExpr, textCol, buckets)},
       w (f, w) AS (VALUES $values),
       fs AS (SELECT feat.doc, feat.y,
           CAST(sum(feat.x * w.w) AS BIGINT) AS s
         FROM feat JOIN w ON w.f = feat.f
         GROUP BY 1, 2),
       pr AS (SELECT y, CASE WHEN s > 0 THEN 1 ELSE -1 END AS p FROM fs),
       cm AS (SELECT
           CAST(sum(CASE WHEN y = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN y = -1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN y = 1 AND p = -1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN y = -1 AND p = -1 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         FROM pr)
       SELECT tp, fp, fn, tn,
         (tp + tn) * 1000000 // (tp + fp + fn + tn) AS accuracy_micro
       FROM cm"""
  }

  // ── DuckDB oracle ───────────────────────────────────────────────────────

  /** The shared training CTEs: `cls` (label, n_docs), `tc` (label, token,
    * cnt), `tot`, `vs` (vocab size). */
  private def chain(table: String, labelCol: String, textCol: String): String =
    s"""cls AS (SELECT $labelCol AS label, CAST(count(*) AS BIGINT) AS n_docs
         FROM $table GROUP BY 1),
       tk AS (SELECT doc_id, $labelCol AS label, token FROM (
           SELECT doc_id, $labelCol,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
           FROM $table) t
         WHERE length(token) > 0),
       tc AS (SELECT label, token, CAST(count(*) AS BIGINT) AS cnt
              FROM tk GROUP BY 1, 2),
       tot AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tot FROM tc GROUP BY 1),
       vs AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM tc)"""

  /** Oracle replaying [[nbModel]] over a self-trained corpus. */
  def nbModelOracleSql(table: String, labelCol: String, textCol: String): String =
    s"""WITH ${chain(table, labelCol, textCol)}
       SELECT tc.label, tc.token, tc.cnt,
         CAST(round(ln((CAST(tc.cnt AS DOUBLE) + 1.0) /
           CAST(tot.tot + vs.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp_micro
       FROM tc JOIN tot USING (label), vs
       ORDER BY tc.label, tc.token"""

  /** Oracle replaying [[nbClassify]] (self-trained). */
  def nbClassifyOracleSql(table: String, idCol: String, labelCol: String,
                          textCol: String): String =
    nbClassifyCrossOracleSql(table, table, idCol, labelCol, textCol)

  /** Shared CTEs through the full per-(doc, label) score table `sc` —
    * the SQL twin of [[nbScores]]. */
  private def scoreChain(trainTable: String, scoreTable: String,
                         idCol: String, labelCol: String,
                         textCol: String): String =
    s"""${chain(trainTable, labelCol, textCol)},
       tk2 AS (SELECT $idCol AS doc_id, $labelCol AS label, token FROM (
           SELECT $idCol, $labelCol,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
           FROM $scoreTable) t
         WHERE length(token) > 0),
       model AS (SELECT tc.label, tc.token,
           CAST(round(ln((CAST(tc.cnt AS DOUBLE) + 1.0) /
             CAST(tot.tot + vs.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp
         FROM tc JOIN tot USING (label), vs),
       lbl AS (SELECT cls.label,
           CAST(round(ln(CAST(cls.n_docs AS DOUBLE) /
             CAST((SELECT sum(n_docs) FROM cls) AS DOUBLE)) * 1000000.0)
             AS BIGINT) AS prior,
           CAST(round(ln(1.0 / CAST(tot.tot + vs.v AS DOUBLE)) * 1000000.0)
             AS BIGINT) AS floor_lp
         FROM cls JOIN tot USING (label), vs),
       dt AS (SELECT doc_id, label AS actual, token,
                CAST(count(*) AS BIGINT) AS c
              FROM tk2 GROUP BY 1, 2, 3),
       sc AS (SELECT dt.doc_id, dt.actual, l.label,
           max(l.prior) + CAST(sum(dt.c * coalesce(m.lp, l.floor_lp)) AS BIGINT)
             AS score_micro
         FROM dt CROSS JOIN lbl l
         LEFT JOIN model m ON m.label = l.label AND m.token = dt.token
         GROUP BY 1, 2, 3)"""

  /** Oracle replaying [[nbClassify]] with the model trained on
    * `trainTable` and scoring `scoreTable` (the stored/streaming shape). */
  def nbClassifyCrossOracleSql(trainTable: String, scoreTable: String,
                               idCol: String, labelCol: String,
                               textCol: String): String =
    s"""WITH ${scoreChain(trainTable, scoreTable, idCol, labelCol, textCol)}
       SELECT doc_id, actual, label AS predicted, score_micro FROM (
         SELECT *, row_number() OVER (PARTITION BY doc_id
           ORDER BY score_micro DESC, label) AS rn FROM sc)
       WHERE rn = 1 ORDER BY doc_id"""

  /** Oracle replaying [[confidentLearning]] over a self-trained
    * [[nbScores]] table. */
  def confidentLearningOracleSql(table: String, idCol: String,
                                 labelCol: String, textCol: String): String =
    s"""WITH ${scoreChain(table, table, idCol, labelCol, textCol)},
       sm AS (SELECT doc_id, max(score_micro) AS smax FROM sc GROUP BY 1),
       em AS (SELECT sc.doc_id, sc.actual, sc.label,
           CAST(round(1000000.0 * exp(CAST(sc.score_micro - sm.smax AS DOUBLE)
             / 1000000.0)) AS BIGINT) AS e
         FROM sc JOIN sm USING (doc_id)),
       es AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS et FROM em GROUP BY 1),
       pm AS (SELECT em.doc_id, em.actual, em.label,
                em.e * 1000000 // es.et AS p
              FROM em JOIN es USING (doc_id)),
       th AS (SELECT label, CAST(sum(p) AS HUGEINT) // count(*) AS t
              FROM pm WHERE actual = label GROUP BY 1),
       cand AS (SELECT pm.* FROM pm JOIN th ON th.label = pm.label
                WHERE pm.p >= th.t),
       star AS (SELECT actual AS given_label, label AS star_label FROM (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY p DESC, label) AS rn FROM cand)
         WHERE rn = 1),
       cj AS (SELECT given_label, star_label, CAST(count(*) AS BIGINT) AS cnt
              FROM star GROUP BY 1, 2),
       tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cj)
       SELECT cj.given_label, cj.star_label, cj.cnt,
         cj.cnt * 1000000 // tt.n AS frac_micro
       FROM cj, tt ORDER BY cj.given_label, cj.star_label"""
}
