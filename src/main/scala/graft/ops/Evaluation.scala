package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Signal / classifier evaluation reports — the model-eval harness side of
  * a curation pipeline: before a quality signal gates a 100 TB corpus, it
  * gets scored against labels (AUC), its probability calibration is
  * checked (reliability bins), and per-document language consistency is
  * audited (code-switching filter). All three are exact integer reports:
  * micro-unit division at the very end, no float accumulation — so a SQL
  * oracle replays every row bit-for-bit regardless of evaluation order.
  */
object Evaluation {

  /** Boundary guard for the |distinct value| window family (AUC / FPR
    * threshold / Spearman / KS): their single allowlisted rank window is
    * bounded ONLY because the signal is discrete (micro-quantized
    * integers throughout this engine). A CONTINUOUS double signal would
    * make |distinct| ≈ N and collapse that window to one partition at
    * scale — or, where the operator casts to long, silently truncate the
    * signal to garbage. Fail LOUDLY at the boundary instead: schema-only
    * check, no extra job. `allowString = false` for CASTING callers
    * (spearmanRho, ksValueCounts/ksDriftFromCounts): a string signal is
    * discrete, but `cast("long")` turns it into all-NULL ranks — exactly
    * the silent divergence this guard exists to stop. Callers that group
    * on the raw value (signalAuc, fprThreshold) keep strings legal. */
  private[ops] def requireDiscrete(df: DataFrame, valueCol: Column,
                                   op: String,
                                   allowString: Boolean = true): Unit = {
    import org.apache.spark.sql.types._
    val t = df.select(valueCol).schema.head.dataType
    val ok = t match {
      case ByteType | ShortType | IntegerType | LongType
         | BooleanType | DateType => true
      case StringType => allowString
      case d: DecimalType => d.scale == 0
      case _ => false
    }
    val why =
      if (t == StringType)
        "this operator casts the signal to LONG, so a string value " +
        "becomes all-NULL ranks. Pre-encode the string domain to integers."
      else
        "the rank window is bounded by the signal's |distinct| domain, " +
        "which a continuous signal collapses to one partition at scale. " +
        "Micro-quantize first (e.g. floor(x * 1e6) cast to LONG)."
    require(ok, s"$op: signal column has type $t — " + why)
  }

  /** Exact ROC AUC of an integer-valued score against a binary label, with
    * the standard average-rank tie treatment (equivalent to the
    * Mann-Whitney U statistic): AUC = (Σ_pos rank − P(P+1)/2) / (P·N).
    * Ranks are kept DOUBLED (rank2 = 2·cntBelow + cntTied + 1) so tie
    * midpoints stay integral; one division to micro-units at the end.
    *
    * Scale: one map-side-combined groupBy collapses the corpus to
    * |distinct score| rows; the rank window runs over that score-domain
    * table (bounded by the signal's quantization, e.g. ≤ 1e6+1 rows for a
    * micro-unit score — configuration, not data). Intended for labeled
    * EVALUATION sets (≲ 1e9 rows): doubled rank sums are accumulated as
    * DECIMAL(38,0) and the ×1e6 micro-scaling happens in decimal too, so
    * neither the rank sum nor the scaled numerator can wrap a Long even
    * when p·n exceeds ~4.6e12 (the old Long envelope); a corpus-sized AUC
    * would quantize the score first anyway.
    * Output: ONE row (p, n, auc_micro); auc_micro is null when either
    * class is absent. */
  def signalAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    requireDiscrete(df, col(scoreCol), "signalAuc")
    val g = df.groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("rank2", lit(2) * col("cumb") + col("cnt") + lit(1))
    // operand-first widening: cast pos BEFORE the product so the multiply
    // itself runs in decimal — a post-product cast would let pos·rank2
    // silently wrap Long first (rank2 ~ 2n, so p·2n > 9.2e18 is reachable
    // past ~2e9 eval rows)
    ranked.agg(
        sum(col("pos").cast("decimal(38,0)") * col("rank2")).as("sr2"),
        sum(col("pos")).as("p"),
        sum(col("cnt") - col("pos")).as("n"))
      .select(col("p"), col("n"),
        when(col("p") > 0 && col("n") > 0,
          expr("(sr2 - CAST(p AS DECIMAL(38,0)) * (p + 1)) * 1000000" +
            " div (CAST(2 AS DECIMAL(38,0)) * p * n)"))
          .otherwise(lit(null).cast("long")).as("auc_micro"))
  }

  /** DuckDB oracle replaying [[signalAuc]] — identical doubled-rank
    * arithmetic over the grouped score domain. `labelExpr`/`scoreExpr` are
    * SQL expressions over `table`'s columns. */
  def signalAucOracleSql(table: String, labelExpr: String,
                         scoreExpr: String): String =
    s"""WITH src AS (SELECT CAST($labelExpr AS BIGINT) AS lbl,
           $scoreExpr AS score FROM $table),
       g AS (SELECT score, count(*) AS cnt, sum(lbl) AS pos
             FROM src GROUP BY score),
       w AS (SELECT score, cnt, pos,
               coalesce(sum(cnt) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             FROM g),
       t AS (SELECT sum(CAST(pos AS HUGEINT) * (2 * cumb + cnt + 1)) AS sr2,
               CAST(sum(pos) AS BIGINT) AS p,
               CAST(sum(cnt - pos) AS BIGINT) AS n
             FROM w)
       SELECT p, n,
         CASE WHEN p > 0 AND n > 0
           THEN CAST((sr2 - CAST(p AS HUGEINT) * (p + 1)) * 1000000
             // (CAST(2 AS HUGEINT) * p * n) AS BIGINT)
           ELSE NULL END AS auc_micro
       FROM t"""

  /** Per-GROUP exact AUC — [[signalAuc]] keyed by a dimension: a quality
    * signal that ranks well on the pooled corpus can be pure noise inside
    * one source (Simpson's flip); this is the per-source health row the
    * pooled number hides. Same doubled-rank Mann–Whitney arithmetic, the
    * rank window PARTITIONS by the group over each group's |distinct
    * score| rows; DECIMAL(38,0) everywhere the pooled form widens.
    * Output one row per group; auc_micro null where a class is absent. */
  def signalAucByGroup(df: DataFrame, groupCol: String, labelCol: String,
                       scoreCol: String): DataFrame = {
    requireDiscrete(df, col(scoreCol), "signalAucByGroup")
    val g = df.groupBy(col(groupCol).as("grp"), col(scoreCol).as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
    val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("rank2", lit(2) * col("cumb") + col("cnt") + lit(1))
    ranked.groupBy(col("grp"))
      .agg(sum(col("pos").cast("decimal(38,0)") * col("rank2")).as("sr2"),
        sum(col("pos")).as("p"),
        sum(col("cnt") - col("pos")).as("n"))
      .select(col("grp").as(groupCol), col("p"), col("n"),
        when(col("p") > 0 && col("n") > 0,
          expr("(sr2 - CAST(p AS DECIMAL(38,0)) * (p + 1)) * 1000000" +
            " div (CAST(2 AS DECIMAL(38,0)) * p * n)").cast("long"))
          .otherwise(lit(null).cast("long")).as("auc_micro"))
  }

  /** DuckDB oracle replaying [[signalAucByGroup]]. */
  def signalAucByGroupOracleSql(table: String, groupExpr: String,
                                labelExpr: String,
                                scoreExpr: String): String =
    s"""WITH src AS (SELECT $groupExpr AS grp, CAST($labelExpr AS BIGINT) AS lbl,
           $scoreExpr AS score FROM $table),
       g AS (SELECT grp, score, count(*) AS cnt, sum(lbl) AS pos
             FROM src GROUP BY grp, score),
       w AS (SELECT grp, score, cnt, pos,
               coalesce(sum(cnt) OVER (PARTITION BY grp ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             FROM g),
       t AS (SELECT grp,
               sum(CAST(pos AS HUGEINT) * (2 * cumb + cnt + 1)) AS sr2,
               CAST(sum(pos) AS BIGINT) AS p,
               CAST(sum(cnt - pos) AS BIGINT) AS n
             FROM w GROUP BY grp)
       SELECT grp, p, n,
         CASE WHEN p > 0 AND n > 0
           THEN CAST((sr2 - CAST(p AS HUGEINT) * (p + 1)) * 1000000
             // (CAST(2 AS HUGEINT) * p * n) AS BIGINT)
           ELSE NULL END AS auc_micro
       FROM t ORDER BY grp"""

  /** Reliability-diagram bins: bucket a micro-unit score ([0, 1e6]) into
    * `nBins` equal-width bins and report, per bin, the count, mean
    * predicted score, and observed positive rate — the calibration check
    * before a classifier's scores are read as probabilities (and its
    * threshold chosen from the sweep).
    *
    * Scale: ONE map-side-combined aggregate to ≤ nBins rows; every output
    * column integral (micro-unit division per bin at the end). */
  def calibrationBins(df: DataFrame, labelCol: String, scoreMicroCol: String,
                      nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    // integer bin arithmetic (micro-score · nBins div 1e6) — no float
    // division anywhere, so engine parity is structural
    val bin = least(expr(s"$scoreMicroCol * $nBins div 1000000L"),
      lit((nBins - 1).toLong)).cast("int")
    df.select(bin.as("bin"), col(scoreMicroCol).as("s"),
        col(labelCol).cast("long").as("lbl"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"), sum(col("s")).as("ssum"),
        sum(col("lbl")).as("pos"))
      .select(col("bin"), col("cnt"),
        expr("ssum div cnt").as("mean_score_micro"),
        expr("pos * 1000000L div cnt").as("pos_rate_micro"))
  }

  /** DuckDB oracle replaying [[calibrationBins]]. */
  def calibrationBinsOracleSql(table: String, labelExpr: String,
                               scoreMicroExpr: String, nBins: Int): String =
    s"""WITH src AS (SELECT CAST($labelExpr AS BIGINT) AS lbl,
           CAST($scoreMicroExpr AS BIGINT) AS s FROM $table),
       b AS (SELECT CAST(least(s * $nBins // 1000000, ${nBins - 1}) AS INTEGER) AS bin,
               s, lbl FROM src)
       SELECT bin, count(*) AS cnt,
         CAST(sum(s) AS BIGINT) // count(*) AS mean_score_micro,
         CAST(sum(lbl) AS BIGINT) * 1000000 // count(*) AS pos_rate_micro
       FROM b GROUP BY bin ORDER BY bin"""

  /** Expected Calibration Error (Guo et al. 2017) — the one-number
    * rollup of [[calibrationBins]]: ECE = Σ_b (n_b/N)·|pos_rate_b −
    * mean_score_b|, computed from the bins' integral micro columns with
    * the weighted sum widened to DECIMAL(38,0) (Σ cnt·micro passes a
    * Long at corpus scale). One ≤ nBins-row aggregate on top. */
  def ece(df: DataFrame, labelCol: String, scoreMicroCol: String,
          nBins: Int): DataFrame =
    calibrationBins(df, labelCol, scoreMicroCol, nBins)
      .agg(sum(col("cnt")).as("n"),
        sum(expr("CAST(cnt AS DECIMAL(38,0))" +
          " * abs(pos_rate_micro - mean_score_micro)")).as("w"))
      .select(col("n"), expr("CAST(w div n AS BIGINT)").as("ece_micro"))

  /** DuckDB oracle replaying [[ece]]. */
  def eceOracleSql(table: String, labelExpr: String, scoreMicroExpr: String,
                   nBins: Int): String =
    s"""WITH bins AS (
         ${calibrationBinsOracleSql(table, labelExpr, scoreMicroExpr, nBins)})
       SELECT CAST(sum(cnt) AS BIGINT) AS n,
         CAST(sum(CAST(cnt AS HUGEINT) * abs(pos_rate_micro - mean_score_micro))
           // CAST(sum(cnt) AS HUGEINT) AS BIGINT) AS ece_micro
       FROM bins"""

  /** Isotonic (PAV) calibration over the reliability bins (Zadrozny &
    * Elkan, KDD 2002; Barlow et al. 1972) — the non-parametric fix after
    * [[calibrationBins]] DIAGNOSES miscalibration and next to
    * q_temperature_fit's parametric one: the monotone-nondecreasing map
    * score-bin → calibrated rate minimizing squared error, via the
    * minimax identity f(i) = max_{j≤i} min_{k≥i} rate(j..k) (the closed
    * form of pool-adjacent-violators — no sequential pooling loop, so it
    * distributes). Interval rates quantize to floor micro-units BEFORE
    * the minimax — identical on both engines, within 1 micro of the
    * rational optimum.
    *
    * Scale shape: ONE corpus aggregate to ≤ nBins rows, then every
    * downstream table is interval-sized (≤ nBins³ rows, broadcast
    * joins) — corpus size never appears again. Output per bin: counts,
    * raw rate, isotonic rate. */
  def isotonicCalibration(df: DataFrame, labelCol: String,
                          scoreMicroCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 64, "nBins in [1, 64]")
    val bin = least(expr(s"$scoreMicroCol * $nBins div 1000000L"),
      lit((nBins - 1).toLong)).cast("int")
    val bins = df.select(bin.as("bin"), col(labelCol).cast("long").as("lbl"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
      .localCheckpoint(true)
    // interval table (j, k, rate_micro): Σ over member bins, floor micro
    val ivals = bins.select(col("bin").as("j"))
      .crossJoin(broadcast(bins.select(col("bin").as("k"))))
      .where(col("j") <= col("k"))
      .join(broadcast(bins.select(col("bin").as("m"), col("cnt"), col("pos"))),
        col("m") >= col("j") && col("m") <= col("k"))
      .groupBy(col("j"), col("k"))
      .agg(expr("sum(pos) * 1000000L div sum(cnt)").as("rate"))
    // f(i) = max_{j≤i} min_{k≥i} rate(j, k)
    val inner = bins.select(col("bin").as("i"))
      .join(broadcast(ivals), col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("rate")).as("mn"))
    val fit = inner.groupBy(col("i")).agg(max(col("mn")).as("iso_rate_micro"))
    bins.join(broadcast(fit), col("bin") === col("i"))
      .select(col("bin"), col("cnt"), col("pos"),
        expr("pos * 1000000L div cnt").as("raw_rate_micro"),
        col("iso_rate_micro"))
  }

  /** DuckDB oracle replaying [[isotonicCalibration]]. */
  def isotonicCalibrationOracleSql(table: String, labelExpr: String,
                                   scoreMicroExpr: String,
                                   nBins: Int): String =
    s"""WITH src AS (SELECT CAST($labelExpr AS BIGINT) AS lbl,
           CAST($scoreMicroExpr AS BIGINT) AS s FROM $table),
       bins AS (SELECT CAST(least(s * $nBins // 1000000, ${nBins - 1})
                  AS INTEGER) AS bin,
                CAST(count(*) AS BIGINT) AS cnt, CAST(sum(lbl) AS BIGINT) AS pos
              FROM src GROUP BY 1),
       ivals AS (SELECT j.bin AS j, k.bin AS k,
                   sum(m.pos) * 1000000 // sum(m.cnt) AS rate
                 FROM bins j, bins k, bins m
                 WHERE j.bin <= k.bin AND m.bin >= j.bin AND m.bin <= k.bin
                 GROUP BY 1, 2),
       inn AS (SELECT i.bin AS i, v.j, min(v.rate) AS mn
               FROM bins i JOIN ivals v ON v.j <= i.bin AND v.k >= i.bin
               GROUP BY 1, 2),
       fit AS (SELECT i, CAST(max(mn) AS BIGINT) AS iso_rate_micro
               FROM inn GROUP BY 1)
       SELECT b.bin, b.cnt, b.pos,
         b.pos * 1000000 // b.cnt AS raw_rate_micro, f.iso_rate_micro
       FROM bins b JOIN fit f ON f.i = b.bin ORDER BY b.bin"""

  /** Precision / recall / F1 at each candidate threshold — the
    * operating-point sweep that picks a quality gate's cutoff after
    * [[signalAuc]] says the signal ranks and [[calibrationBins]] says the
    * scores mean something. Predicted positive = score ≥ threshold.
    *
    * Scale: ONE CASE-ladder aggregate pass over the corpus produces every
    * threshold's (tp, fp, fn) — |thresholds| longs per reducer, no
    * per-candidate re-scan (the quality-sweep discipline); the row
    * explode happens on the single aggregated row. All ratios are exact
    * integer micro-units; null when undefined (no predicted positives). */
  def prCurve(df: DataFrame, labelCol: String, scoreCol: String,
              thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold")
    val lbl = col(labelCol).cast("long")
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      val pred = col(scoreCol) >= t
      Seq(
        sum(when(pred && lbl === 1L, 1L).otherwise(0L)).as(s"tp_$i"),
        sum(when(pred && lbl === 0L, 1L).otherwise(0L)).as(s"fp_$i"),
        sum(when(!pred && lbl === 1L, 1L).otherwise(0L)).as(s"fn_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"tp_$i").as("tp"),
        col(s"fp_$i").as("fp"), col(s"fn_$i").as("fn"))
    }: _*)
    one.select(explode(rows).as("r")).select(col("r.*"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000L div (tp + fp)")).as("precision_micro"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 1000000L div (tp + fn)")).as("recall_micro"),
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          expr("2 * tp * 1000000L div (2 * tp + fp + fn)")).as("f1_micro"))
  }

  /** DuckDB oracle replaying [[prCurve]] — one aggregate pass, the same
    * CASE ladder, per-threshold rows via UNION ALL over the single
    * aggregated row. */
  def prCurveOracleSql(table: String, labelExpr: String, scoreExpr: String,
                       thresholds: Seq[Long]): String = {
    val sums = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        s"CAST(sum(CASE WHEN score >= $t AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp_$i",
        s"CAST(sum(CASE WHEN score >= $t AND lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp_$i",
        s"CAST(sum(CASE WHEN NOT (score >= $t) AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn_$i")
    }.mkString(",\n           ")
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      s"SELECT CAST($t AS BIGINT) AS threshold, tp_$i AS tp, fp_$i AS fp, fn_$i AS fn FROM one"
    }.mkString("\n         UNION ALL ")
    s"""WITH src AS (SELECT CAST($labelExpr AS BIGINT) AS lbl,
           $scoreExpr AS score FROM $table),
       one AS (SELECT $sums FROM src),
       r AS ($rows)
       SELECT threshold, tp, fp, fn,
         CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) END AS precision_micro,
         CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) END AS recall_micro,
         CASE WHEN 2 * tp + fp + fn > 0 THEN 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_micro
       FROM r ORDER BY threshold"""
  }

  /** Embedding-corpus QA report — the sanity gate before any ANN/near-dup
    * run over a vector column: dimension consistency, null / zero-norm
    * vectors (cosine against a zero vector is undefined and IVF assigns
    * them arbitrarily), and the squared-norm range. One row per observed
    * dimensionality (a healthy corpus has exactly one).
    *
    * norm² is computed in double over the float-widened elements in array
    * order — identical sequential arithmetic on any engine — and reported
    * as floor-micro-units (floor on BOTH sides: CAST in some engines
    * rounds, floor never does). Scale: one scan, one map-side-combined
    * aggregate to |dims| rows; vectors never shuffle. */
  def embeddingQa(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val norm2 = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
    emb.select(
        when(col(vecCol).isNull, lit(-1)).otherwise(size(col(vecCol)))
          .as("dim"),
        when(col(vecCol).isNull, lit(null).cast("long"))
          .otherwise(floor(norm2 * lit(1000000.0)).cast("long"))
          .as("n2"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("n2") === 0L, 1L).otherwise(0L)).as("n_zero_norm"),
        min(col("n2")).as("min_norm2_micro"),
        max(col("n2")).as("max_norm2_micro"))
  }

  /** DuckDB oracle replaying [[embeddingQa]]. */
  def embeddingQaOracleSql(table: String, idCol: String,
                           vecCol: String): String =
    s"""WITH src AS (
         SELECT CASE WHEN $vecCol IS NULL THEN -1 ELSE len($vecCol) END AS dim,
           CASE WHEN $vecCol IS NULL THEN NULL
             ELSE CAST(floor(list_sum(list_transform($vecCol,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * 1000000.0) AS BIGINT)
           END AS n2
         FROM $table),
       g AS (SELECT dim, count(*) AS n_vecs,
               CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
               min(n2) AS min_norm2_micro, max(n2) AS max_norm2_micro
             FROM src GROUP BY dim)
       SELECT CAST(dim AS INTEGER) AS dim, n_vecs, n_zero_norm,
         min_norm2_micro, max_norm2_micro
       FROM g ORDER BY dim"""

  /** Token frequency SPECTRUM (count-of-counts): for each corpus frequency
    * f, how many distinct token types occur exactly f times — the input to
    * Good-Turing smoothing, the hapax/dis-legomena counts behind vocabulary
    * sizing, and the quick visual check that the corpus follows Zipf
    * (complementing the fitted slope in the Zipf report).
    *
    * Scale: two map-side-combined hash aggregates (corpus → |vocab| rows →
    * |distinct frequencies| rows, which is O(√tokens) under Zipf). */
  def freqSpectrum(docs: DataFrame, textCol: String): DataFrame = {
    import graft.functions.TextFns
    docs.select(explode(TextFns.tokens(lower(col(textCol)))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .groupBy(col("freq")).agg(count(lit(1)).as("n_types"))
  }

  /** DuckDB oracle replaying [[freqSpectrum]]. */
  def freqSpectrumOracleSql(table: String, textCol: String): String =
    s"""WITH tok AS (
         SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
         FROM $table),
       v AS (SELECT token, count(*) AS freq FROM tok
             WHERE length(token) > 0 GROUP BY token)
       SELECT freq, count(*) AS n_types FROM v GROUP BY freq ORDER BY freq"""

  /** Good–Turing smoothed frequency estimates (Good 1953; the Gale &
    * Sampson 1995 simple form) — the probability-mass view on top of
    * [[freqSpectrum]]'s raw counts-of-counts: r* = (r+1)·N_{r+1}/N_r
    * reassigns mass from each frequency class to the one below, the
    * correction every n-gram LM family here ultimately rests on (and the
    * direct estimate of UNSEEN mass, p₀ = N₁/N — "how much probability
    * do tokens we never saw deserve"). r* is an exact integer
    * micro-rational; classes with no successor (the spectrum's ragged
    * top) carry NULL, the standard simple-GT cutover point.
    *
    * Scale: the corpus collapses through (token, freq) →
    * (freq, N_freq) — the grid is ≤ |distinct frequency| rows; the
    * successor lookup is a self-join on r+1 over that bounded grid; p₀
    * rides every row from a broadcast 1-row total. */
  def goodTuring(docs: DataFrame, textCol: String): DataFrame = {
    val spec = freqSpectrum(docs, textCol).localCheckpoint(true)
    val tot = spec.agg(
      sum(col("freq").cast("decimal(38,0)") * col("n_types")).as("n_tokens"))
    val nxt = spec.select((col("freq") - 1).as("freq"),
      col("n_types").as("next_n_types"))
    spec.join(nxt, Seq("freq"), "left")
      .crossJoin(broadcast(tot))
      .select(col("freq").as("r"), col("n_types").as("n_r"),
        col("next_n_types").as("n_r1"),
        expr("CAST(CAST(freq + 1 AS DECIMAL(38,0)) * next_n_types * 1000000" +
          " div n_types AS BIGINT)").as("r_star_micro"),
        when(col("freq") === 1L,
          expr("CAST(CAST(n_types AS DECIMAL(38,0)) * 1000000 div n_tokens" +
            " AS BIGINT)")).as("p0_micro"))
  }

  /** DuckDB oracle replaying [[goodTuring]]. */
  def goodTuringOracleSql(table: String, textCol: String): String =
    s"""WITH spec AS (${freqSpectrumOracleSql(table, textCol)}),
       tot AS (SELECT CAST(sum(CAST(freq AS HUGEINT) * n_types) AS HUGEINT)
                 AS n_tokens FROM spec)
       SELECT s.freq AS r, CAST(s.n_types AS BIGINT) AS n_r,
         CAST(nx.n_types AS BIGINT) AS n_r1,
         CAST(CAST(s.freq + 1 AS HUGEINT) * nx.n_types * 1000000
           // s.n_types AS BIGINT) AS r_star_micro,
         CASE WHEN s.freq = 1 THEN
           CAST(CAST(s.n_types AS HUGEINT) * 1000000 // tot.n_tokens
             AS BIGINT) END AS p0_micro
       FROM spec s LEFT JOIN spec nx ON nx.freq = s.freq + 1, tot
       ORDER BY r"""

  /** Pairwise Pearson CORRELATION between integer quality signals — the
    * redundancy check before stacking signals into a composite gate (two
    * signals at r ≈ 1 are one signal counted twice). All moment sums
    * (Σx, Σy, Σxy, Σx², Σy², n) accumulate as exact longs in ONE
    * map-side-combined aggregate pass; the final r computes in double
    * from those exact integers (identical IEEE arithmetic on any engine)
    * and reports as floor-micro-units. Signals must be integral and
    * small enough that n·x·y stays in a long — quality signals are.
    * Output: one row per unordered signal pair. */
  def signalCorrelation(df: DataFrame, signals: Seq[String]): DataFrame = {
    require(signals.size >= 2, "need at least two signals")
    val aggs = (count(lit(1)).as("n") +: signals.flatMap { s =>
      Seq(sum(col(s)).as(s"s_$s"), sum(col(s) * col(s)).as(s"q_$s"))
    }) ++ signals.combinations(2).toSeq.map { case Seq(a, b) =>
      sum(col(a) * col(b)).as(s"x_${a}_$b")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = signals.combinations(2).toSeq.map { case Seq(a, b) =>
      val num = col("n") * col(s"x_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      val da = col("n") * col(s"q_$a") - col(s"s_$a") * col(s"s_$a")
      val db = col("n") * col(s"q_$b") - col(s"s_$b") * col(s"s_$b")
      struct(lit(a).as("sig_a"), lit(b).as("sig_b"),
        when(da > 0 && db > 0,
          floor(num.cast("double") / sqrt(da.cast("double") * db.cast("double"))
            * 1000000.0).cast("long"))
          .otherwise(lit(null).cast("long")).as("r_micro"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** DuckDB oracle replaying [[signalCorrelation]]. `signals` maps output
    * signal name → SQL expression. */
  def signalCorrelationOracleSql(table: String,
                                 signals: Seq[(String, String)]): String = {
    val src = signals.map { case (n, e) => s"CAST($e AS BIGINT) AS $n" }
      .mkString(", ")
    val sums = (s"CAST(count(*) AS BIGINT) AS n" +:
      signals.flatMap { case (s, _) =>
        Seq(s"CAST(sum($s) AS BIGINT) AS s_$s",
          s"CAST(sum($s * $s) AS BIGINT) AS q_$s")
      }) ++ signals.map(_._1).combinations(2).toSeq.map { case Seq(a, b) =>
        s"CAST(sum($a * $b) AS BIGINT) AS x_${a}_$b"
      }
    val rows = signals.map(_._1).combinations(2).toSeq.map { case Seq(a, b) =>
      s"""SELECT '$a' AS sig_a, '$b' AS sig_b,
         CASE WHEN n * q_$a - s_$a * s_$a > 0 AND n * q_$b - s_$b * s_$b > 0
           THEN CAST(floor(CAST(n * x_${a}_$b - s_$a * s_$b AS DOUBLE) /
             sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE) *
                  CAST(n * q_$b - s_$b * s_$b AS DOUBLE)) * 1000000.0) AS BIGINT)
         END AS r_micro FROM one"""
    }.mkString("\n         UNION ALL ")
    s"""WITH src AS (SELECT $src FROM $table),
       one AS (SELECT ${sums.mkString(", ")} FROM src)
       $rows ORDER BY sig_a, sig_b"""
  }

  /** Source-concentration GINI coefficient — the inequality measure of a
    * corpus's source mix (0 = perfectly balanced crawl, → 1 = one domain
    * dominates): Gini = Σᵢ (2i − n − 1)·xᵢ / (n·Σx) over sources sorted
    * by ascending share. The one-number health check next to the full
    * [[graft.ops.Corpus.dataCard]]. Exact: corpus collapses to |sources|
    * counts, the rank window runs over that bounded table, and the single
    * division reports floor-micro-units. The rank-weighted sum and its
    * ×1e6 micro-scaling run in DECIMAL(38,0) so n_groups·n_rows beyond
    * the Long envelope (~9.2e12, reachable at corpus scale) can't wrap. */
  def sourceGini(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("c"), col(groupCol))
    val ranked = counts.withColumn("i", row_number().over(w).cast("long"))
    // operand-first widening: cast the rank BEFORE multiplying so 2·i·c is
    // computed in decimal — a post-product cast would let a ~1e6 rank times
    // a ~5e12-row dominant source wrap Long (>9.2e18) before widening
    ranked.agg(
        sum(col("c")).as("tot"), count(lit(1)).as("ng"),
        sum(col("i").cast("decimal(38,0)") * lit(2) * col("c"))
          .as("wsum"))
      .select(col("ng").as("n_groups"), col("tot").as("n_rows"),
        expr("(wsum - (CAST(ng AS DECIMAL(38,0)) + 1) * tot) * 1000000" +
          " div (CAST(ng AS DECIMAL(38,0)) * tot)")
          .as("gini_micro"))
  }

  /** DuckDB oracle replaying [[sourceGini]]. */
  def sourceGiniOracleSql(table: String, groupCol: String): String =
    s"""WITH g AS (SELECT $groupCol AS grp, count(*) AS c FROM $table GROUP BY 1),
       r AS (SELECT c, CAST(row_number() OVER (ORDER BY c, grp) AS BIGINT) AS i
             FROM g),
       t AS (SELECT CAST(sum(c) AS BIGINT) AS tot,
               CAST(count(*) AS BIGINT) AS ng,
               sum(CAST(i AS HUGEINT) * 2 * c) AS wsum
             FROM r)
       SELECT ng AS n_groups, tot AS n_rows,
         CAST((wsum - (CAST(ng AS HUGEINT) + 1) * tot) * 1000000
           // (CAST(ng AS HUGEINT) * tot) AS BIGINT) AS gini_micro
       FROM t"""

  /** Vocabulary COVERAGE curve: for each candidate vocabulary size V, the
    * fraction of corpus token occurrences covered by the top-V most
    * frequent types — the plot that picks a tokenizer/vocab size before a
    * 100 TB tokenization run (the complement of [[freqSpectrum]]'s tail
    * view). Candidates larger than the vocabulary saturate at full
    * coverage.
    *
    * Scale: coverage at rank V is the sum of the top-V frequencies — a
    * function of the frequency MULTISET only (ties by token change which
    * token holds rank V, never the sum) — so no per-token rank window
    * exists at all. One map-side-combined token count collapses the
    * corpus to |vocab| rows, a second tiny aggregate collapses those to
    * the |distinct freq| HISTOGRAM (sublinear in vocab: distinct counts
    * of N occurrences number O(√N)), exclusive cum-counts/cum-sums run in
    * windows PARTITIONED by the ⌊log2 freq⌋ class (≤ 64 partitions,
    * order-consistent because the class is monotone in freq) with a
    * ≤ 64-row offsets window on top — a web-scale vocab never funnels
    * through one task. covered(V) = S(f) + (V − C(f))·f where f is the
    * class at rank V, C/S the exclusive cums; candidates range-join the
    * histogram. Exact: micro-scaling in DECIMAL(38,0) so total×1e6
    * can't wrap a Long at 100 TB token counts. */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1), "sizes must be positive")
    import graft.functions.TextFns
    val counts = docs
      .select(explode(TextFns.tokens(lower(col(textCol)))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val hist = counts.groupBy(col("freq")).agg(count(lit(1)).as("cnt"))
      // ⌊log2 freq⌋ via the binary-digit count — bit-exact on both
      // engines (float log2 of exact powers of two misrounds in IEEE)
      .withColumn("fb", (length(bin(col("freq"))) - 1).cast("int"))
    val wLoc = Window.partitionBy(col("fb")).orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val loc = hist
      .withColumn("lc", coalesce(sum(col("cnt")).over(wLoc), lit(0L)))
      .withColumn("ls", coalesce(sum(col("cnt") * col("freq")).over(wLoc), lit(0L)))
    val wOff = Window.orderBy(col("fb").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = hist.groupBy(col("fb"))
      .agg(sum(col("cnt")).as("tc"), sum(col("cnt") * col("freq")).as("ts"))
      // ≤ 64 rows by construction (fb ∈ [0, 63]) — bounded, not corpus-sized
      .withColumn("oc", coalesce(sum(col("tc")).over(wOff), lit(0L)))
      .withColumn("os", coalesce(sum(col("ts")).over(wOff), lit(0L)))
      .select(col("fb"), col("oc"), col("os"))
    val ranked = loc.join(offs, Seq("fb"))
      .select(col("freq"), col("cnt"),
        (col("oc") + col("lc")).as("cex"),  // #tokens strictly more frequent
        (col("os") + col("ls")).as("sex"))  // their occurrence sum
    val tot = hist.agg(sum(col("cnt") * col("freq")).as("total"))
    tot.select(col("total"), explode(typedlit(sizes.map(_.toLong))).as("v"))
      .join(ranked,
        col("cex") < col("v") && col("v") <= col("cex") + col("cnt"), "left")
      .select(col("v"),
        coalesce(col("sex") + (col("v") - col("cex")) * col("freq"),
          col("total")).as("covered_tokens"),
        col("total").as("total_tokens"),
        expr("CAST(coalesce(sex + (v - cex) * freq, total) AS DECIMAL(38,0))" +
          " * 1000000 div total").as("coverage_micro"))
  }

  /** DuckDB oracle replaying [[vocabCoverage]]. */
  def vocabCoverageOracleSql(table: String, textCol: String,
                             sizes: Seq[Int]): String =
    s"""WITH tok AS (
         SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
         FROM $table),
       vv AS (SELECT token, count(*) AS freq FROM tok
              WHERE length(token) > 0 GROUP BY token),
       r AS (SELECT row_number() OVER (ORDER BY freq DESC, token) AS rank,
               sum(freq) OVER (ORDER BY freq DESC, token
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             FROM vv),
       t AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM vv),
       c AS (SELECT unnest([${sizes.mkString(", ")}]) AS v)
       SELECT CAST(c.v AS BIGINT) AS v,
         CAST(coalesce(r.cum, t.total) AS BIGINT) AS covered_tokens,
         t.total AS total_tokens,
         CAST(coalesce(r.cum, t.total) AS BIGINT) * 1000000 // t.total
           AS coverage_micro
       FROM c CROSS JOIN t LEFT JOIN r ON r.rank = c.v
       ORDER BY v"""

  /** Filter-ablation matrix — before committing a curation config, which
    * quality gates actually bite and which are redundant: for every pair
    * of named kill predicates, the docs killed by each, by both, and the
    * integer-micro Jaccard overlap of their kill sets (diagonal rows are
    * the per-filter kill counts). A filter whose kill set is ⊂ another's
    * (overlap ≈ its own count) adds latency, not quality.
    *
    * Scale: the [[prCurve]] discipline — ONE CASE-ladder aggregate pass
    * produces every pairwise intersection (k·(k+1)/2 longs per reducer,
    * configuration not data); the pair rows explode from the single
    * aggregated row. No per-filter re-scan, no doc-level fanout. */
  def filterAblation(df: DataFrame,
                     filters: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(filters.nonEmpty, "at least one filter")
    val n = filters.size
    val flags = df.select(filters.zipWithIndex.map {
      case ((_, c), i) => c.cast("long").as(s"f_$i") }: _*)
    val idx = for { i <- 0 until n; j <- i until n } yield (i, j)
    val aggs = idx.map { case (i, j) =>
      sum(col(s"f_$i") * col(s"f_$j")).as(s"b_${i}_$j") } :+
      count(lit(1)).as("n_docs")
    val one = flags.agg(aggs.head, aggs.tail: _*)
    val rows = array(idx.map { case (i, j) =>
      struct(lit(filters(i)._1).as("filter_a"), lit(filters(j)._1).as("filter_b"),
        col(s"b_${i}_$i").as("killed_a"), col(s"b_${j}_$j").as("killed_b"),
        col(s"b_${i}_$j").as("killed_both"), col("n_docs"))
    }: _*)
    one.select(explode(rows).as("r")).select(col("r.*"))
      .withColumn("overlap_micro",
        when(col("killed_a") + col("killed_b") - col("killed_both") > 0,
          expr("killed_both * 1000000L div (killed_a + killed_b - killed_both)")))
  }

  /** DuckDB oracle replaying [[filterAblation]]: `filters` as (name,
    * predicate SQL) — the SQL must mirror the Spark predicate exactly. */
  def filterAblationOracleSql(table: String,
                              filters: Seq[(String, String)]): String = {
    val n = filters.size
    val idx = for { i <- 0 until n; j <- i until n } yield (i, j)
    val flagCols = filters.zipWithIndex.map { case ((_, e), i) =>
      s"CASE WHEN $e THEN 1 ELSE 0 END AS f_$i" }.mkString(",\n           ")
    val sums = (idx.map { case (i, j) =>
      s"CAST(sum(f_$i * f_$j) AS BIGINT) AS b_${i}_$j" } :+
      "count(*) AS n_docs").mkString(",\n           ")
    val rows = idx.map { case (i, j) =>
      s"SELECT '${filters(i)._1}' AS filter_a, '${filters(j)._1}' AS filter_b, " +
        s"b_${i}_$i AS killed_a, b_${j}_$j AS killed_b, " +
        s"b_${i}_$j AS killed_both, n_docs FROM one"
    }.mkString("\n         UNION ALL ")
    s"""WITH src AS (SELECT $flagCols FROM $table),
       one AS (SELECT $sums FROM src),
       r AS ($rows)
       SELECT filter_a, filter_b, killed_a, killed_b, killed_both, n_docs,
         CASE WHEN killed_a + killed_b - killed_both > 0
           THEN killed_both * 1000000 // (killed_a + killed_b - killed_both)
         END AS overlap_micro
       FROM r ORDER BY filter_a, filter_b"""
  }

  /** Inter-annotator agreement — pairwise Cohen's κ (Cohen 1960) over a
    * (item, rater, label) table, the QA gate for human preference /
    * labeling campaigns before the labels train a reward model: raw
    * percent-agreement overstates consensus when the label marginals are
    * skewed; κ subtracts the agreement two raters would reach by chance
    * from their own marginals. One row per unordered rater pair that
    * co-annotated ≥ 1 item: n_items, n_agree, observed/expected agreement
    * and κ, all in floor-micro-units.
    *
    * Exactness: κ is a RATIONAL in the contingency counts —
    * po = agree/n, pe = Σₖ cAₖ·cBₖ/n², so
    * κ = (agree·n − Σₖ cAₖ·cBₖ) / (n² − Σₖ cAₖ·cBₖ) — and every
    * numerator/denominator accumulates as an exact long (widened to
    * DECIMAL(38,0) at the ×1e6 step), so no float enters at all.
    *
    * Input must be unique per (item, rater) — dedupe upstream (the
    * max-struct kernel). Scale: the item self-join fans out as
    * raters-per-item², the contingency aggregate collapses that to
    * |rater pairs|·|labels|² rows, and every later join runs on that
    * bounded table. Raters-per-item is a campaign constant (2–5), so the
    * fanout is linear in items. */
  def annotatorAgreement(df: DataFrame, itemCol: String, raterCol: String,
                         labelCol: String): DataFrame = {
    val r = df.select(col(itemCol).as("item"), col(raterCol).as("rater"),
      col(labelCol).as("lbl"))
    val ct = r.as("a").join(r.as("b"),
        col("a.item") === col("b.item") && col("a.rater") < col("b.rater"))
      .select(col("a.rater").as("ra"), col("b.rater").as("rb"),
        col("a.lbl").as("la"), col("b.lbl").as("lb"))
      .groupBy(col("ra"), col("rb"), col("la"), col("lb"))
      .agg(count(lit(1)).as("c"))
    val totals = ct.groupBy(col("ra"), col("rb"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("la") === col("lb"), col("c")).otherwise(lit(0L)))
          .as("agree"))
    val chance = ct.groupBy(col("ra"), col("rb"), col("la"))
      .agg(sum(col("c")).as("ca"))
      .join(ct.groupBy(col("ra"), col("rb"), col("lb")).agg(sum(col("c")).as("cb")),
        Seq("ra", "rb")) // all-pairs of the two marginals, then prune k==k
      .where(col("la") === col("lb"))
      .groupBy(col("ra"), col("rb"))
      .agg(sum(col("ca") * col("cb")).as("e"))
    totals.join(chance, Seq("ra", "rb"), "left")
      .select(col("ra"), col("rb"), col("n").as("n_items"),
        col("agree").as("n_agree"),
        expr("CAST(agree AS DECIMAL(38,0)) * 1000000 div n").cast("long")
          .as("po_micro"),
        expr("CAST(coalesce(e, 0) AS DECIMAL(38,0)) * 1000000 div (n * n)")
          .cast("long").as("pe_micro"),
        expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n - coalesce(e, 0) > 0 THEN" +
          " CAST((CAST(agree AS DECIMAL(38,0)) * n - coalesce(e, 0))" +
          " * 1000000 div (CAST(n AS DECIMAL(38,0)) * n - coalesce(e, 0))" +
          " AS BIGINT) END").as("kappa_micro"))
  }

  /** Operating point from a TARGET false-positive rate — the inverse of
    * [[prCurve]]'s sweep: given labeled scores and a budget α, return the
    * loosest threshold t (predicted positive = score ≥ t) whose FPR stays
    * ≤ α, plus the achieved FPR/TPR there. This is how a quality gate /
    * safety filter is actually tuned: the budget comes first, the
    * threshold falls out. Null threshold when no score in the domain
    * meets the budget.
    *
    * Scale: the corpus collapses to the |distinct score| domain
    * ([[signalAuc]]'s discipline — bounded by the signal's quantization),
    * the descending cumulative window runs on that domain table, and the
    * pick is one min-struct aggregate. DECIMAL(38,0) at every ×1e6. */
  def fprThreshold(df: DataFrame, labelCol: String, scoreCol: String,
                   alphaMicro: Long): DataFrame = {
    require(alphaMicro >= 0L && alphaMicro <= 1000000L,
      "alphaMicro must be in [0, 1e6]")
    requireDiscrete(df, col(scoreCol), "fprThreshold")
    val g = df.groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("cnt"), sum(col(labelCol).cast("long")).as("pos"))
    val w = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // both cumulatives in ONE select so they plan as a single WindowExec
    val cums = g.select(col("score"),
      sum(col("pos")).over(w).as("cpos"),
      sum(col("cnt") - col("pos")).over(w).as("cneg"))
    val tot = g.agg(sum(col("pos")).as("p"),
      sum(col("cnt") - col("pos")).as("n"))
    val cand = cums.crossJoin(broadcast(tot))
      .where(col("n") > 0 &&
        expr(s"CAST(cneg AS DECIMAL(38,0)) * 1000000" +
          s" <= ${alphaMicro}L * CAST(n AS DECIMAL(38,0))"))
    cand.agg(min(struct(col("score"), col("cneg"), col("cpos"))).as("b"))
      .crossJoin(broadcast(tot))
      .select(col("p"), col("n"), lit(alphaMicro).as("alpha_micro"),
        col("b.score").as("threshold"),
        expr("CAST(CAST(b.cneg AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)")
          .as("fpr_micro"),
        when(col("p") > 0,
          expr("CAST(CAST(b.cpos AS DECIMAL(38,0)) * 1000000 div p" +
            " AS BIGINT)")).as("tpr_micro"))
  }

  /** DuckDB oracle replaying [[fprThreshold]]. */
  def fprThresholdOracleSql(table: String, labelExpr: String,
                            scoreExpr: String, alphaMicro: Long): String =
    s"""WITH src AS (SELECT CAST($labelExpr AS BIGINT) AS lbl,
           $scoreExpr AS score FROM $table),
       g AS (SELECT score, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(lbl) AS BIGINT) AS pos
             FROM src GROUP BY score),
       c AS (SELECT score,
               CAST(sum(pos) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cpos,
               CAST(sum(cnt - pos) OVER (ORDER BY score DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cneg
             FROM g),
       t AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
               CAST(sum(cnt - pos) AS BIGINT) AS n FROM g),
       pick AS (SELECT score, cneg, cpos FROM c, t
                WHERE n > 0 AND CAST(cneg AS HUGEINT) * 1000000
                  <= $alphaMicro * CAST(n AS HUGEINT)
                ORDER BY score LIMIT 1)
       SELECT t.p, t.n, CAST($alphaMicro AS BIGINT) AS alpha_micro,
         pick.score AS threshold,
         CAST(CAST(pick.cneg AS HUGEINT) * 1000000 // t.n AS BIGINT)
           AS fpr_micro,
         CASE WHEN t.p > 0 THEN
           CAST(CAST(pick.cpos AS HUGEINT) * 1000000 // t.p AS BIGINT)
         END AS tpr_micro
       FROM t LEFT JOIN pick ON TRUE"""

  /** BRIER score of a micro-unit probability score against a binary
    * label — the single-number calibration companion to
    * [[calibrationBins]]: mean squared error of the probability, exact
    * integer arithmetic (per-row squared diff ≤ 10¹², summed in
    * DECIMAL(38,0), one integer division). ONE map-side-combined
    * aggregate. */
  def brierScore(df: DataFrame, labelCol: String,
                 scoreMicroCol: String): DataFrame =
    df.select(
        (col(scoreMicroCol) - col(labelCol).cast("long") * lit(1000000L))
          .as("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("d").cast("decimal(38,0)") * col("d")).as("sq"))
      .select(col("n"),
        expr("CAST(sq div (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)")
          .as("brier_micro"))

  /** DuckDB oracle replaying [[brierScore]]. */
  def brierScoreOracleSql(table: String, labelExpr: String,
                          scoreMicroExpr: String): String =
    s"""WITH src AS (SELECT CAST($scoreMicroExpr AS BIGINT)
           - CAST($labelExpr AS BIGINT) * 1000000 AS d FROM $table),
       t AS (SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(d AS HUGEINT) * d) AS sq FROM src)
       SELECT n,
         CAST(sq // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS brier_micro
       FROM t"""

  /** FLEISS' κ (Fleiss 1971) — the multi-rater generalization of
    * [[annotatorAgreement]]: one number for a whole labeling campaign
    * where each item is rated by exactly `raters` annotators (items with
    * a different rating count are excluded, as the statistic requires).
    * Like Cohen's κ, the value is a pure RATIONAL in integer counts:
    * with S = Σᵢ Σₖ n²ᵢₖ, A = S − N·n, B = N·n·(n−1), C = Σₖ M²ₖ,
    * E = (N·n)², κ = (A·E − C·B) / (B·(E − C)) — every product runs in
    * DECIMAL(38,0) (E alone overflows a Long at ~10⁹·n items), no float
    * anywhere.
    *
    * Scale: one (item, label) aggregate, one per-item rollup, one
    * |labels|-row marginal — the corpus collapses before any math. */
  def fleissKappa(df: DataFrame, itemCol: String, raterCol: String,
                  labelCol: String, raters: Int): DataFrame = {
    require(raters >= 2, "need at least two raters per item")
    val counts = df.select(col(itemCol).as("item"), col(labelCol).as("lbl"))
      .groupBy(col("item"), col("lbl")).agg(count(lit(1)).as("nik"))
    val perItem = counts.groupBy(col("item"))
      .agg(sum(col("nik")).as("ni"),
        sum(col("nik") * col("nik")).as("si"))
      .where(col("ni") === raters)
    val kept = perItem.select(col("item"))
    val tot = perItem.agg(count(lit(1)).as("nitems"), sum(col("si")).as("s"))
    val marg = counts.join(kept, Seq("item"), "left_semi")
      .groupBy(col("lbl")).agg(sum(col("nik")).as("mk"))
      .agg(sum(col("mk").cast("decimal(38,0)") * col("mk")).as("c"))
    tot.crossJoin(marg)
      .select(col("nitems"), lit(raters).cast("long").as("n_raters"),
        expr(s"CAST(s AS DECIMAL(38,0)) - nitems * ${raters}L").as("a"),
        expr(s"CAST(nitems AS DECIMAL(38,0)) * ${raters}L * ${raters - 1}L")
          .as("b"),
        col("c"),
        expr(s"CAST(nitems AS DECIMAL(38,0)) * nitems" +
          s" * ${raters.toLong * raters}L").as("e"))
      .select(col("nitems").as("n_items"), col("n_raters"),
        expr("CAST(a * 1000000 div b AS BIGINT)").as("p_bar_micro"),
        expr("CAST(c * 1000000 div e AS BIGINT)").as("p_e_micro"),
        expr("CASE WHEN e > c THEN" +
          " CAST((a * e - c * b) * 1000000 div (b * (e - c)) AS BIGINT)" +
          " END").as("kappa_micro"))
  }

  /** DuckDB oracle replaying [[fleissKappa]]. */
  def fleissKappaOracleSql(table: String, itemExpr: String, raterExpr: String,
                           labelExpr: String, raters: Int): String =
    s"""WITH r AS (SELECT $itemExpr AS item, $raterExpr AS rater,
           $labelExpr AS lbl FROM $table),
       ct AS (SELECT item, lbl, CAST(count(*) AS BIGINT) AS nik
              FROM r GROUP BY 1, 2),
       pi AS (SELECT item, CAST(sum(nik) AS BIGINT) AS ni,
                CAST(sum(nik * nik) AS BIGINT) AS si
              FROM ct GROUP BY 1),
       keep AS (SELECT item, si FROM pi WHERE ni = $raters),
       tot AS (SELECT CAST(count(*) AS BIGINT) AS nitems,
                 CAST(sum(si) AS BIGINT) AS s FROM keep),
       mg AS (SELECT CAST(sum(CAST(mk AS HUGEINT) * mk) AS HUGEINT) AS c
              FROM (SELECT ct.lbl, CAST(sum(ct.nik) AS BIGINT) AS mk
                    FROM ct JOIN keep USING (item) GROUP BY 1) m),
       x AS (SELECT nitems,
               CAST(s AS HUGEINT) - nitems * $raters AS a,
               CAST(nitems AS HUGEINT) * $raters * ${raters - 1} AS b,
               c,
               CAST(nitems AS HUGEINT) * nitems
                 * ${raters.toLong * raters} AS e
             FROM tot, mg)
       SELECT nitems AS n_items, CAST($raters AS BIGINT) AS n_raters,
         CAST(a * 1000000 // b AS BIGINT) AS p_bar_micro,
         CAST(c * 1000000 // e AS BIGINT) AS p_e_micro,
         CASE WHEN e > c THEN
           CAST((a * e - c * b) * 1000000 // (b * (e - c)) AS BIGINT)
         END AS kappa_micro
       FROM x"""

  /** DuckDB oracle replaying [[annotatorAgreement]]. */
  def annotatorAgreementOracleSql(table: String, itemExpr: String,
                                  raterExpr: String,
                                  labelExpr: String): String =
    s"""WITH r AS (SELECT $itemExpr AS item, $raterExpr AS rater,
           $labelExpr AS lbl FROM $table),
       j AS (SELECT a.rater AS ra, b.rater AS rb, a.lbl AS la, b.lbl AS lb
             FROM r a JOIN r b ON a.item = b.item AND a.rater < b.rater),
       ct AS (SELECT ra, rb, la, lb, CAST(count(*) AS BIGINT) AS c
              FROM j GROUP BY 1, 2, 3, 4),
       t AS (SELECT ra, rb, CAST(sum(c) AS BIGINT) AS n,
               CAST(sum(CASE WHEN la = lb THEN c ELSE 0 END) AS BIGINT)
                 AS agree
             FROM ct GROUP BY 1, 2),
       ma AS (SELECT ra, rb, la, CAST(sum(c) AS BIGINT) AS ca
              FROM ct GROUP BY 1, 2, 3),
       mb AS (SELECT ra, rb, lb, CAST(sum(c) AS BIGINT) AS cb
              FROM ct GROUP BY 1, 2, 3),
       e AS (SELECT ma.ra, ma.rb, CAST(sum(ca * cb) AS BIGINT) AS e
             FROM ma JOIN mb ON ma.ra = mb.ra AND ma.rb = mb.rb
                            AND ma.la = mb.lb
             GROUP BY 1, 2)
       SELECT t.ra, t.rb, t.n AS n_items, t.agree AS n_agree,
         CAST(CAST(agree AS HUGEINT) * 1000000 // n AS BIGINT) AS po_micro,
         CAST(CAST(coalesce(e, 0) AS HUGEINT) * 1000000 // (n * n)
           AS BIGINT) AS pe_micro,
         CASE WHEN CAST(n AS HUGEINT) * n - coalesce(e, 0) > 0 THEN
           CAST((CAST(agree AS HUGEINT) * n - coalesce(e, 0)) * 1000000
             // (CAST(n AS HUGEINT) * n - coalesce(e, 0)) AS BIGINT)
         END AS kappa_micro
       FROM t LEFT JOIN e ON e.ra = t.ra AND e.rb = t.rb
       ORDER BY t.ra, t.rb"""

  /** Sentence-level BLEU-4 per (candidate, reference) pair (Papineni et
    * al. 2002), with Lin & Och 2004 add-one smoothing on the n ≥ 2
    * precisions — the generation-eval staple run over paired columns
    * (candidate = model output, reference = gold): clipped n-gram matches
    * `Σ_g min(cnt_cand, cnt_ref)` for n = 1..4, brevity penalty
    * `min(1, e^(1−r/c))`, geometric mean of the precisions. All counts
    * exact longs; the single float stage is the final BP·geomean,
    * micro-rounded with the same IEEE ln/exp/round the PSI ops replay.
    * BLEU = 0 when the candidate has no unigram match (the unsmoothed
    * p₁ = 0 case) or no tokens.
    *
    * Scale: grams shuffle keyed (id, n, gram) — rows ∝ 4·tokens per side,
    * the same envelope as every shingle op; one inner-join against the
    * reference side (equal keys, no fanout) and two |pairs|-row
    * aggregates. No windows, no driver state.
    */
  /** Fused multi-order gram counts — ONE scan + ONE (id, n, g) aggregate
    * per side via a posexploded array-of-gram-arrays; each order's gram
    * array keeps its LITERAL n so whole-stage codegen survives. The one
    * shared implementation behind [[bleuPairs]]/[[rougeN]]/[[chrfPairs]],
    * their OptimizationEquivalenceSpec pins, and the plan dumps (r15
    * ADVICE: the pin must exercise the shipped build, not a hand copy).
    * `ns` must be distinct: the per-n union this replaced emitted two
    * identical (id,n,g,cnt) row GROUPS for a duplicated order, while the
    * fused aggregate would emit one row with doubled counts (r15 ADVICE —
    * fail loudly instead of silently changing the clipped-match join). */
  private[graft] def fusedGramCounts(df: DataFrame, idCol: String,
      prep: org.apache.spark.sql.Column, ns: Seq[Int],
      gramsOf: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column,
      cnt: String): DataFrame = {
    require(ns.nonEmpty && ns.distinct.size == ns.size,
      s"gram orders must be non-empty and distinct, got $ns")
    val nArr = typedLit(ns.map(_.toLong))
    val all = array(ns.map(n => gramsOf(col("__t"), n)): _*)
    graft.Tables.spread(df)
      .select(col(idCol).as("id"), prep.as("__t"))
      .select(col("id"), posexplode(all).as(Seq("__n0", "__gs")))
      .select(col("id"),
        element_at(nArr, col("__n0") + lit(1)).cast("int").as("n"),
        explode(col("__gs")).as("g"))
      .groupBy(col("id"), col("n"), col("g"))
      .agg(count(lit(1)).as(cnt))
  }

  def bleuPairs(cands: DataFrame, refs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    import graft.functions.TextFns
    // fused n=1..4 gram counts: one scan + one shuffle per side (was 4
    // per-n branches each — see chrfPairs for the move); identical rows.
    def grams(df: DataFrame, cnt: String) =
      fusedGramCounts(df, idCol, trim(col(textCol)), 1 to 4,
        TextFns.wordShingles, cnt)
    def len(df: DataFrame, name: String) = df.select(col(idCol).as("id"),
      size(TextFns.tokens(trim(col(textCol)))).cast("long").as(name))
    val joined = grams(cands, "cc")
      .join(grams(refs, "rc"), Seq("id", "n", "g"), "left")
      .groupBy(col("id"), col("n"))
      .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("m"),
        sum(col("cc")).as("t"))
    def at(i: Int, c: String) =
      coalesce(sum(when(col("n") === i, col(c))), lit(0L)).as(s"$c$i")
    val pern = joined.groupBy(col("id"))
      .agg(at(1, "m"), at(1, "t"), at(2, "m"), at(2, "t"),
        at(3, "m"), at(3, "t"), at(4, "m"), at(4, "t"))
    def p(i: Int) =
      if (i == 1) col("m1").cast("double") / col("t1")
      else (col(s"m$i") + lit(1L)).cast("double") / (col(s"t$i") + lit(1L))
    val bp = least(lit(1.0d),
      exp(lit(1.0d) - col("ref_len").cast("double") / col("cand_len")))
    len(cands, "cand_len")
      .join(len(refs, "ref_len"), Seq("id"))
      .join(pern, Seq("id"), "left")
      .select((Seq(col("id").as(idCol), col("cand_len"), col("ref_len")) ++
        (1 to 4).flatMap(i => Seq(
          coalesce(col(s"m$i"), lit(0L)).as(s"m$i"),
          coalesce(col(s"t$i"), lit(0L)).as(s"t$i")))): _*)
      .withColumn("bleu_micro",
        when(col("m1") === 0 || col("t1") === 0 || col("cand_len") === 0, 0L)
          .otherwise(round(bp * exp((log(p(1)) + log(p(2)) + log(p(3)) +
            log(p(4))) / lit(4.0d)) * lit(1e6)).cast("long")))
  }

  /** DuckDB oracle replaying [[bleuPairs]]: `candSql`/`refSql` are table
    * expressions yielding (id, text); gram/len/precision/BP arithmetic
    * mirrors the Spark plan operation-for-operation. */
  def bleuPairsOracleSql(candSql: String, refSql: String,
                         idCol: String = "doc_id"): String = {
    def gramCte(src: String, name: String, cnt: String) =
      s"""${name}_t AS (SELECT id, string_split_regex(trim(text), '\\s+') AS t
             FROM $src),
         $name AS (SELECT id, n, g, CAST(count(*) AS BIGINT) AS $cnt FROM (
             SELECT id, ns.n AS n,
               unnest(list_transform(generate_series(1, len(t) - ns.n + 1),
                 i -> array_to_string(t[i:i+ns.n-1], ' '))) AS g
             FROM ${name}_t, (SELECT unnest([1, 2, 3, 4]) AS n) ns)
           GROUP BY 1, 2, 3)"""
    s"""WITH cand AS ($candSql), ref AS ($refSql),
       ${gramCte("cand", "cg", "cc")},
       ${gramCte("ref", "rg", "rc")},
       j AS (SELECT cg.id, cg.n,
               CAST(sum(least(cg.cc, coalesce(rg.rc, 0))) AS BIGINT) AS m,
               CAST(sum(cg.cc) AS BIGINT) AS t
             FROM cg LEFT JOIN rg ON rg.id = cg.id AND rg.n = cg.n AND rg.g = cg.g
             GROUP BY 1, 2),
       pern AS (SELECT id,
           CAST(coalesce(sum(CASE WHEN n = 1 THEN m END), 0) AS BIGINT) AS m1,
           CAST(coalesce(sum(CASE WHEN n = 1 THEN t END), 0) AS BIGINT) AS t1,
           CAST(coalesce(sum(CASE WHEN n = 2 THEN m END), 0) AS BIGINT) AS m2,
           CAST(coalesce(sum(CASE WHEN n = 2 THEN t END), 0) AS BIGINT) AS t2,
           CAST(coalesce(sum(CASE WHEN n = 3 THEN m END), 0) AS BIGINT) AS m3,
           CAST(coalesce(sum(CASE WHEN n = 3 THEN t END), 0) AS BIGINT) AS t3,
           CAST(coalesce(sum(CASE WHEN n = 4 THEN m END), 0) AS BIGINT) AS m4,
           CAST(coalesce(sum(CASE WHEN n = 4 THEN t END), 0) AS BIGINT) AS t4
         FROM j GROUP BY 1),
       lens AS (SELECT c.id,
           CAST(len(string_split_regex(trim(c.text), '\\s+')) AS BIGINT) AS cand_len,
           CAST(len(string_split_regex(trim(r.text), '\\s+')) AS BIGINT) AS ref_len
         FROM cand c JOIN ref r ON r.id = c.id),
       f AS (SELECT lens.id, cand_len, ref_len,
           coalesce(m1, 0) AS m1, coalesce(t1, 0) AS t1,
           coalesce(m2, 0) AS m2, coalesce(t2, 0) AS t2,
           coalesce(m3, 0) AS m3, coalesce(t3, 0) AS t3,
           coalesce(m4, 0) AS m4, coalesce(t4, 0) AS t4
         FROM lens LEFT JOIN pern ON pern.id = lens.id)
       SELECT id AS $idCol, cand_len, ref_len, m1, t1, m2, t2, m3, t3, m4, t4,
         CASE WHEN m1 = 0 OR t1 = 0 OR cand_len = 0 THEN 0
           ELSE CAST(round(least(1.0, exp(1.0 - CAST(ref_len AS DOUBLE) / cand_len)) *
             exp((ln(CAST(m1 AS DOUBLE) / t1) +
                  ln(CAST(m2 + 1 AS DOUBLE) / (t2 + 1)) +
                  ln(CAST(m3 + 1 AS DOUBLE) / (t3 + 1)) +
                  ln(CAST(m4 + 1 AS DOUBLE) / (t4 + 1))) / 4.0) * 1000000.0)
             AS BIGINT) END AS bleu_micro
       FROM f ORDER BY id"""
  }

  /** ROUGE-N per (candidate, reference) pair (Lin 2004) — the
    * summarization-eval staple: clipped n-gram matches scored as recall
    * (ROUGE's defining direction), precision, and F1, one row per (pair,
    * n). PURE integer rationals end to end — p = m·1e6 div ct,
    * r = m·1e6 div rt, f1 = 2pr div (p+r) — no float stage anywhere, so
    * the oracle replay is bit-exact by construction.
    *
    * Scale: the same (id, n, gram) envelope as [[bleuPairs]]; one
    * equi-join, two bounded aggregates, no windows. */
  def rougeN(cands: DataFrame, refs: DataFrame, idCol: String,
             textCol: String, ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    import graft.functions.TextFns
    // fused per-n gram counts: one scan + one shuffle per side (was one
    // scan+groupBy branch per n — see chrfPairs for the move); the helper
    // rejects duplicate orders (they would double-count vs the old union).
    def grams(df: DataFrame, cnt: String) =
      fusedGramCounts(df, idCol, trim(col(textCol)), ns,
        TextFns.wordShingles, cnt)
    // each gram table feeds TWO consumers (the clipped-match join and its
    // side's totals): materialize once and cut lineage, so neither branch
    // re-explodes the corpus and the suite's GC shadow can't land on a
    // twice-built 10M-row sort (observed: 1.7 s isolated vs 25 s late in
    // a full bench pass before this checkpoint)
    val cg = grams(cands, "cc").localCheckpoint(true)
    val rg = grams(refs, "rc").localCheckpoint(true)
    val m = cg.join(rg, Seq("id", "n", "g"), "inner")
      .groupBy(col("id"), col("n"))
      .agg(sum(least(col("cc"), col("rc"))).as("m"))
    val ct = cg.groupBy(col("id"), col("n")).agg(sum(col("cc")).as("cand_total"))
    val rt = rg.groupBy(col("id"), col("n")).agg(sum(col("rc")).as("ref_total"))
    ct.join(rt, Seq("id", "n"), "inner")
      .join(m, Seq("id", "n"), "left")
      .select(col("id").as(idCol), col("n"),
        coalesce(col("m"), lit(0L)).as("m"),
        col("cand_total"), col("ref_total"))
      .withColumn("p_micro", expr("m * 1000000L div cand_total"))
      .withColumn("r_micro", expr("m * 1000000L div ref_total"))
      .withColumn("f1_micro",
        when(col("p_micro") + col("r_micro") === 0, 0L)
          .otherwise(expr("2L * p_micro * r_micro div (p_micro + r_micro)")))
  }

  /** DuckDB oracle replaying [[rougeN]]. */
  def rougeNOracleSql(candSql: String, refSql: String, ns: Seq[Int],
                      idCol: String = "doc_id"): String = {
    def gramCte(src: String, name: String, cnt: String) =
      s"""${name}_t AS (SELECT id, string_split_regex(trim(text), '\\s+') AS t
             FROM $src),
         $name AS (SELECT id, n, g, CAST(count(*) AS BIGINT) AS $cnt FROM (
             SELECT id, ns.n AS n,
               unnest(list_transform(generate_series(1, len(t) - ns.n + 1),
                 i -> array_to_string(t[i:i+ns.n-1], ' '))) AS g
             FROM ${name}_t, (SELECT unnest([${ns.mkString(", ")}]) AS n) ns)
           GROUP BY 1, 2, 3)"""
    s"""WITH cand AS ($candSql), ref AS ($refSql),
       ${gramCte("cand", "cg", "cc")},
       ${gramCte("ref", "rg", "rc")},
       mm AS (SELECT cg.id, cg.n, CAST(sum(least(cg.cc, rg.rc)) AS BIGINT) AS m
              FROM cg JOIN rg ON rg.id = cg.id AND rg.n = cg.n AND rg.g = cg.g
              GROUP BY 1, 2),
       ctt AS (SELECT id, n, CAST(sum(cc) AS BIGINT) AS cand_total
               FROM cg GROUP BY 1, 2),
       rtt AS (SELECT id, n, CAST(sum(rc) AS BIGINT) AS ref_total
               FROM rg GROUP BY 1, 2),
       f AS (SELECT ctt.id, CAST(ctt.n AS INT) AS n, coalesce(mm.m, 0) AS m,
               cand_total, ref_total,
               coalesce(mm.m, 0) * 1000000 // cand_total AS p_micro,
               coalesce(mm.m, 0) * 1000000 // ref_total AS r_micro
             FROM ctt JOIN rtt ON rtt.id = ctt.id AND rtt.n = ctt.n
             LEFT JOIN mm ON mm.id = ctt.id AND mm.n = ctt.n)
       SELECT id AS $idCol, n, m, cand_total, ref_total, p_micro, r_micro,
         CASE WHEN p_micro + r_micro = 0 THEN 0
           ELSE 2 * p_micro * r_micro // (p_micro + r_micro) END AS f1_micro
       FROM f ORDER BY id, n"""
  }

  // ── ROUGE-L (Lin 2004 §3.2) ─────────────────────────────────────────────

  /** Sentence-level ROUGE-L per (candidate, reference) pair — the
    * LCS-based metric next to [[rougeN]]'s n-gram form: order-sensitive
    * without demanding consecutiveness (the property that makes it the
    * self-instruct dedup gate). LCS runs as ONE generated static call per
    * pair ([[graft.expressions.LcsKernel]] — Spark HOFs cannot express
    * the O(m·n) recurrence without interpreted per-cell dispatch); both
    * token lists slice to `maxTokens`, so the DP cost is a configured
    * budget, not data-dependent. P = LCS/m, R = LCS/n and
    * F1 = 2·LCS/(m+n) are EXACT integer rationals — zero float stages,
    * bit-replayable by the oracle's anti-diagonal recursive-CTE DP.
    *
    * Scale: one equi-join of the two sides on the pair key, one codegen'd
    * projection per pair; no shuffle beyond the join, no windows. */
  def rougeL(cands: DataFrame, refs: DataFrame, idCol: String,
             textCol: String, maxTokens: Int = 32): DataFrame = {
    import graft.functions.TextFns
    require(maxTokens >= 1 && maxTokens <= 256, "maxTokens in [1, 256]")
    val ct = cands.select(col(idCol).as("id"),
      slice(TextFns.tokens(col(textCol)), 1, maxTokens).as("__ta"))
    val rt = refs.select(col(idCol).as("id"),
      slice(TextFns.tokens(col(textCol)), 1, maxTokens).as("__tb"))
    ct.join(rt, Seq("id"))
      .select(col("id").as(idCol),
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.LcsLength(
            org.apache.spark.sql.GraftColumnBridge.expression(col("__ta")),
            org.apache.spark.sql.GraftColumnBridge.expression(col("__tb"))))
          .as("lcs"),
        size(col("__ta")).cast("long").as("cand_len"),
        size(col("__tb")).cast("long").as("ref_len"))
      .withColumn("p_micro", expr("lcs * 1000000L div cand_len"))
      .withColumn("r_micro", expr("lcs * 1000000L div ref_len"))
      .withColumn("f1_micro",
        expr("2L * lcs * 1000000L div (cand_len + ref_len)"))
  }

  /** The anti-diagonal LCS recursion as reusable CTEs: expects a CTE
    * `ldims(k1, k2, ta, tb)` (VARCHAR[] token lists, already truncated)
    * and yields `lcsv(k1, k2, lcs, m, n)`. One row per pair per diagonal,
    * state = the previous two diagonals as BIGINT lists — cell (i, j) on
    * diagonal d = i+j depends only on diagonals d−1, d−2, so each
    * diagonal is one elementwise list_transform (no sequential row DP). */
  private[ops] def lcsRecursiveCtes: String =
    s"""ld2 AS (SELECT k1, k2, ta, tb, len(ta) AS m, len(tb) AS n FROM ldims),
       dp AS (
         SELECT k1, k2, ta, tb, m, n, 0 AS d,
                CAST([] AS BIGINT[]) AS prev,
                [CAST(0 AS BIGINT)] AS cur
         FROM ld2
         UNION ALL
         SELECT k1, k2, ta, tb, m, n, d + 1,
           cur AS prev,
           list_transform(range(greatest(0, d + 1 - n), least(m, d + 1) + 1),
             i ->
             CASE WHEN i = 0 OR d + 1 - i = 0 THEN CAST(0 AS BIGINT)
                  WHEN list_extract(ta, i) = list_extract(tb, d + 1 - i)
                    THEN list_extract(prev, i - greatest(0, d - 1 - n)) + 1
                  ELSE greatest(
                    list_extract(cur, i - greatest(0, d - n)),
                    list_extract(cur, i + 1 - greatest(0, d - n)))
             END) AS cur
         FROM dp WHERE d + 1 <= m + n),
       lcsv AS (SELECT k1, k2, list_extract(cur, 1) AS lcs,
                  CAST(m AS BIGINT) AS m, CAST(n AS BIGINT) AS n
                FROM dp WHERE d = m + n)"""

  /** DuckDB oracle replaying [[rougeL]]; cand/ref SQL must yield
    * (id, text). */
  def rougeLOracleSql(candSql: String, refSql: String, maxTokens: Int,
                      idCol: String = "doc_id"): String =
    s"""WITH RECURSIVE cand AS ($candSql), ref AS ($refSql),
       ldims AS (SELECT c.id AS k1, CAST(0 AS BIGINT) AS k2,
           (string_split_regex(trim(c.text), '\\s+'))[1:$maxTokens] AS ta,
           (string_split_regex(trim(r.text), '\\s+'))[1:$maxTokens] AS tb
         FROM cand c JOIN ref r ON r.id = c.id),
       $lcsRecursiveCtes
       SELECT k1 AS $idCol, lcs, m AS cand_len, n AS ref_len,
         lcs * 1000000 // m AS p_micro,
         lcs * 1000000 // n AS r_micro,
         2 * lcs * 1000000 // (m + n) AS f1_micro
       FROM lcsv ORDER BY k1"""

  private val ChrfMaxN = 6

  /** chrF-β per (candidate, reference) pair (Popović 2015) — the
    * tokenizer-free generation metric that survives morphology and
    * whitespace noise where BLEU's word n-grams shatter: character
    * n-grams (n = 1..6) over the case-folded, whitespace-stripped texts,
    * clipped matches in both directions, macro-averaged precision and
    * recall over the EFFECTIVE orders (both sides have grams), and
    * F_β = (1+β²)PR / (β²P + R) with the standard recall-weighted β = 2.
    * Counts exact longs; one float stage at the end (micro-rounded,
    * identical operation order in the oracle).
    *
    * Scale: same envelope as [[bleuPairs]] with char grams — rows ∝
    * 6·chars per side keyed (id, n, gram), one equi-join, no windows. */
  def chrfPairs(cands: DataFrame, refs: DataFrame, idCol: String,
                textCol: String, beta: Double = 2.0): DataFrame = {
    import graft.functions.TextFns
    def stripped(c: org.apache.spark.sql.Column) =
      regexp_replace(trim(c), "\\s+", "")
    // ONE scan + ONE shuffle for all 6 orders (was: 6 per-n scan+groupBy
    // branches unioned per side — 12 corpus scans / 12 exchanges for the
    // pair; guide §2.3-2.4 "project before the exchange / do fewer
    // shuffles"). The stripped text materializes once behind a projection
    // boundary (6 references keep CollapseProject from re-inlining the
    // regex); each order's gram array keeps its LITERAL n (codegen), the
    // arrays concat into one (n, g) stream, and a single (id, n, g)
    // aggregate produces exactly the rows the per-n union produced.
    def grams(df: DataFrame, cnt: String) =
      fusedGramCounts(df, idCol, stripped(col(textCol)), 1 to ChrfMaxN,
        TextFns.charNgrams, cnt)
    // same two-consumer materialization as rougeN: build each side's char
    // gram counts once, cut lineage
    val cg = grams(cands, "cc").localCheckpoint(true)
    val rg = grams(refs, "rc").localCheckpoint(true)
    val m = cg.join(rg, Seq("id", "n", "g"), "inner")
      .groupBy(col("id"), col("n"))
      .agg(sum(least(col("cc"), col("rc"))).as("m"))
    val ct = cg.groupBy(col("id"), col("n")).agg(sum(col("cc")).as("ct"))
    val rt = rg.groupBy(col("id"), col("n")).agg(sum(col("rc")).as("rt"))
    val joined = ct.join(rt, Seq("id", "n"), "full")
      .join(m, Seq("id", "n"), "left")
      .select(col("id"), col("n"),
        coalesce(col("m"), lit(0L)).as("m"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("rt"), lit(0L)).as("rt"))
    def at(i: Int, c: String) =
      coalesce(sum(when(col("n") === i, col(c))), lit(0L)).as(s"$c$i")
    val aggCols = (1 to ChrfMaxN).flatMap(i =>
      Seq(at(i, "m"), at(i, "ct"), at(i, "rt")))
    val pern = joined.groupBy(col("id")).agg(aggCols.head, aggCols.tail: _*)
    def effOrd(i: Int) = col(s"ct$i") > 0 && col(s"rt$i") > 0
    val eff = (1 to ChrfMaxN).map(i => when(effOrd(i), 1L).otherwise(0L))
      .reduce(_ + _)
    def avg(tot: String) = (1 to ChrfMaxN).map(i =>
        when(effOrd(i), col(s"m$i").cast("double") / col(s"$tot$i"))
          .otherwise(lit(0.0d)))
      .reduce(_ + _) / col("eff_orders").cast("double")
    val b2 = beta * beta
    pern.withColumn("eff_orders", eff)
      .withColumn("chrf_micro", {
        val p = avg("ct")
        val r = avg("rt")
        when(col("eff_orders") === 0, 0L)
          .otherwise(when(p + r === 0.0d, 0L)
            .otherwise(round(lit(1.0d + b2) * p * r / (lit(b2) * p + r) *
              lit(1e6)).cast("long")))
      })
      .select((Seq(col("id").as(idCol)) ++
        (1 to ChrfMaxN).flatMap(i => Seq(col(s"m$i"), col(s"ct$i"), col(s"rt$i"))) ++
        Seq(col("eff_orders"), col("chrf_micro"))): _*)
  }

  /** DuckDB oracle replaying [[chrfPairs]]: identical gram extraction
    * (lowercase, whitespace stripped), identical effective-order
    * macro-average and F_β arithmetic, term order preserved. */
  def chrfPairsOracleSql(candSql: String, refSql: String,
                         idCol: String = "doc_id",
                         beta: Double = 2.0): String = {
    val ns = 1 to ChrfMaxN
    def gramCte(src: String, name: String, cnt: String) =
      s"""${name}_t AS (SELECT id,
             regexp_replace(lower(trim(text)), '\\s+', '', 'g') AS t FROM $src),
         $name AS (SELECT id, n, g, CAST(count(*) AS BIGINT) AS $cnt FROM (
             SELECT id, ns.n AS n,
               unnest(list_transform(generate_series(1, length(t) - ns.n + 1),
                 i -> substring(t, CAST(i AS INT), ns.n))) AS g
             FROM ${name}_t, (SELECT unnest([${ns.mkString(", ")}]) AS n) ns)
           GROUP BY 1, 2, 3)"""
    val pernCols = ns.map(i =>
      s"""CAST(coalesce(sum(CASE WHEN n = $i THEN m END), 0) AS BIGINT) AS m$i,
         CAST(coalesce(sum(CASE WHEN n = $i THEN ct END), 0) AS BIGINT) AS ct$i,
         CAST(coalesce(sum(CASE WHEN n = $i THEN rt END), 0) AS BIGINT) AS rt$i""")
      .mkString(",\n           ")
    val effSql = ns.map(i =>
      s"CASE WHEN ct$i > 0 AND rt$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    def avgSql(tot: String) = ns.map(i =>
      s"CASE WHEN ct$i > 0 AND rt$i > 0 THEN CAST(m$i AS DOUBLE) / $tot$i ELSE 0.0 END")
      .mkString("(", " + ", ")")
    val b2 = beta * beta
    s"""WITH cand AS ($candSql), ref AS ($refSql),
       ${gramCte("cand", "cg", "cc")},
       ${gramCte("ref", "rg", "rc")},
       mm AS (SELECT cg.id, cg.n, CAST(sum(least(cg.cc, rg.rc)) AS BIGINT) AS m
              FROM cg JOIN rg ON rg.id = cg.id AND rg.n = cg.n AND rg.g = cg.g
              GROUP BY 1, 2),
       ctt AS (SELECT id, n, CAST(sum(cc) AS BIGINT) AS ct FROM cg GROUP BY 1, 2),
       rtt AS (SELECT id, n, CAST(sum(rc) AS BIGINT) AS rt FROM rg GROUP BY 1, 2),
       j AS (SELECT coalesce(ctt.id, rtt.id) AS id, coalesce(ctt.n, rtt.n) AS n,
               coalesce(mm.m, 0) AS m, coalesce(ctt.ct, 0) AS ct,
               coalesce(rtt.rt, 0) AS rt
             FROM ctt FULL JOIN rtt ON rtt.id = ctt.id AND rtt.n = ctt.n
             LEFT JOIN mm ON mm.id = coalesce(ctt.id, rtt.id)
                         AND mm.n = coalesce(ctt.n, rtt.n)),
       pern AS (SELECT id,
           $pernCols
         FROM j GROUP BY 1),
       f AS (SELECT *, CAST($effSql AS BIGINT) AS eff_orders FROM pern)
       SELECT id AS $idCol,
         ${ns.map(i => s"m$i, ct$i, rt$i").mkString(", ")},
         eff_orders,
         CASE WHEN eff_orders = 0 THEN 0
           WHEN ${avgSql("ct")} / CAST(eff_orders AS DOUBLE) +
                ${avgSql("rt")} / CAST(eff_orders AS DOUBLE) = 0.0 THEN 0
           ELSE CAST(round(${1.0 + b2} * (${avgSql("ct")} / CAST(eff_orders AS DOUBLE)) *
             (${avgSql("rt")} / CAST(eff_orders AS DOUBLE)) /
             ($b2 * (${avgSql("ct")} / CAST(eff_orders AS DOUBLE)) +
              (${avgSql("rt")} / CAST(eff_orders AS DOUBLE))) * 1000000.0) AS BIGINT)
         END AS chrf_micro
       FROM f ORDER BY id"""
  }

  // ── pass@k (Chen et al. 2021, "Evaluating LLMs Trained on Code") ───────

  /** Unbiased pass@k per problem group: with n samples of which c pass,
    * pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i=0..k−1} (n−c−i)/(n−i) —
    * the HumanEval estimator (App. A numerically-stable product form),
    * statically unrolled per k with factors clamped at 0 (n−c < k ⇒ the
    * product hits an exact 0 ⇒ pass@k = 1) and ascending-i FP order, so
    * both engines multiply identically. Groups with n < k report NULL
    * (the estimator is undefined there). ONE map-side-combined aggregate;
    * micro-rounded doubles of exact longs. */
  def passAtK(samples: DataFrame, groupCol: String, passCol: String,
              ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    val base = samples.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(passCol).cast("long")).as("c"))
    val cols = ks.map { k =>
      val prod = (0 until k).map { i =>
        greatest(col("n") - col("c") - lit(i.toLong), lit(0L)).cast("double") /
          (col("n") - lit(i.toLong)).cast("double")
      }.reduceLeft(_ * _)
      when(col("n") >= k,
        round((lit(1.0) - prod) * lit(1e6)).cast("long"))
        .as(s"pass_at_${k}_micro")
    }
    base.select(col(groupCol) +: col("n") +: col("c") +: cols: _*)
  }

  /** DuckDB oracle replaying [[passAtK]]; `samplesSql` must yield
    * (grp, p) with p ∈ {0, 1}. */
  def passAtKOracleSql(samplesSql: String, ks: Seq[Int]): String = {
    val cols = ks.map { k =>
      val prod = (0 until k).map(i =>
        s"(CAST(greatest(n - c - $i, 0) AS DOUBLE) / CAST(n - $i AS DOUBLE))")
        .mkString(" * ")
      s"""CASE WHEN n >= $k
           THEN CAST(round((1.0 - $prod) * 1000000.0) AS BIGINT)
         END AS pass_at_${k}_micro"""
    }.mkString(",\n         ")
    s"""WITH s AS ($samplesSql),
       g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p) AS BIGINT) AS c
             FROM s GROUP BY 1)
       SELECT grp, n, c,
         $cols
       FROM g ORDER BY grp"""
  }

  // ── NDCG (Järvelin & Kekäläinen 2002) ──────────────────────────────────

  /** NDCG@k of a ranking against graded relevance: DCG = Σ (2^rel−1)·g_i
    * with the position gains g_i = 1/log2(i+1) precomputed driver-side and
    * shared with the oracle as one array literal (no in-plan log2);
    * IDCG re-ranks the judged pool ideally ((rel desc, id) — deterministic)
    * and the two ≤k-row lists roll up in one pass. `ranked` must carry
    * (idCol, rankCol ∈ 1..k); `judged` carries (idCol, relCol ∈ 0..relMax).
    * Output: one row (k, dcg_micro, idcg_micro, ndcg_micro). */
  def ndcgAtK(ranked: DataFrame, judged: DataFrame, idCol: String,
              rankCol: String, relCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be positive")
    val gains = (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val gLit = typedLit(gains.toArray)
    def gained(df: DataFrame) = df.select(
      ((expr(s"shiftleft(1L, CAST($relCol AS INT))") - lit(1L)).cast("double") *
        element_at(gLit, col("__pos").cast("int"))).as("g"))
    val dcg = gained(ranked.where(col(rankCol) <= k)
        .join(judged, Seq(idCol))
        .withColumn("__pos", col(rankCol)))
      .agg(round(sum(col("g")) * lit(1e6)).cast("long").as("dcg_micro"))
    val wIdeal = Window.orderBy(col(relCol).desc, col(idCol).asc)
    val ideal = gained(judged
        .orderBy(col(relCol).desc, col(idCol).asc).limit(k)
        .withColumn("__pos", row_number().over(wIdeal)))
      .agg(round(sum(col("g")) * lit(1e6)).cast("long").as("idcg_micro"))
    dcg.crossJoin(ideal).select(lit(k.toLong).as("k"),
      col("dcg_micro"), col("idcg_micro"),
      round(col("dcg_micro").cast("double") / col("idcg_micro")
        .cast("double") * lit(1e6)).cast("long").as("ndcg_micro"))
  }

  /** DuckDB oracle tail for [[ndcgAtK]]: `rankedSql` yields (id, rank),
    * `judgedSql` yields (id, rel). */
  def ndcgOracleSql(rankedSql: String, judgedSql: String, k: Int): String = {
    val gains = (1 to k).map(i =>
      java.lang.Double.toString(1.0 / (math.log(i + 1.0) / math.log(2.0))))
      .mkString("[", ",", "]")
    s"""WITH rk AS ($rankedSql), jd AS ($judgedSql),
       gl AS (SELECT CAST($gains AS DOUBLE[]) AS g),
       d AS (SELECT CAST(round(sum(((1 << rel) - 1) *
               gl.g[CAST(rank AS INT)]) * 1000000.0) AS BIGINT) AS dcg_micro
             FROM rk JOIN jd USING (id), gl WHERE rank <= $k),
       i AS (SELECT CAST(round(sum(((1 << rel) - 1) *
               gl.g[CAST(pos AS INT)]) * 1000000.0) AS BIGINT) AS idcg_micro
             FROM (SELECT rel, row_number() OVER (ORDER BY rel DESC, id) AS pos
                   FROM jd) z, gl
             WHERE pos <= $k)
       SELECT CAST($k AS BIGINT) AS k, d.dcg_micro, i.idcg_micro,
         CAST(round(CAST(d.dcg_micro AS DOUBLE) / CAST(i.idcg_micro AS DOUBLE)
           * 1000000.0) AS BIGINT) AS ndcg_micro
       FROM d, i"""
  }

  // ── binned mutual information (plug-in estimator) ──────────────────────

  /** Plug-in mutual information between two BINNED per-row signals — the
    * redundancy check beyond [[q_signal_correlation]]'s linear view: per
    * cell, count + pointwise MI in micro-nats (ln of exact count ratios,
    * rounded per CELL) + the count-weighted contribution; Σ contrib / n =
    * MI. ONE hash aggregate to ≤ |bins|² cells; every downstream row is
    * grid-sized. Products n·c stay in longs here; widen to DECIMAL(38,0)
    * before 10¹²-row corpora. */
  def signalMi(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // eager-snap the grid: four consumers (marginals ×2, total, join) would
    // otherwise each replay the corpus aggregate
    val cells = df.groupBy(col(xCol).as("x_bin"), col(yCol).as("y_bin"))
      .agg(count(lit(1)).as("c_xy"))
      .localCheckpoint(true)
    val cx = cells.groupBy(col("x_bin")).agg(sum(col("c_xy")).as("c_x"))
    val cy = cells.groupBy(col("y_bin")).agg(sum(col("c_xy")).as("c_y"))
    val n = cells.agg(sum(col("c_xy")).as("n"))
    cells.join(broadcast(cx), Seq("x_bin")).join(broadcast(cy), Seq("y_bin"))
      .crossJoin(broadcast(n))
      .select(col("x_bin"), col("y_bin"), col("c_xy"),
        round(log((col("n") * col("c_xy")).cast("double") /
          (col("c_x") * col("c_y")).cast("double")) * lit(1e6))
          .cast("long").as("pmi_micro"))
      .withColumn("contrib_micro", col("pmi_micro") * col("c_xy"))
  }

  /** DuckDB oracle replaying [[signalMi]]; `rowsSql` yields (x, y). */
  def signalMiOracleSql(rowsSql: String): String =
    s"""WITH r AS ($rowsSql),
       cells AS (SELECT x AS x_bin, y AS y_bin, CAST(count(*) AS BIGINT) AS c_xy
                 FROM r GROUP BY 1, 2),
       cx AS (SELECT x_bin, CAST(sum(c_xy) AS BIGINT) AS c_x FROM cells GROUP BY 1),
       cy AS (SELECT y_bin, CAST(sum(c_xy) AS BIGINT) AS c_y FROM cells GROUP BY 1),
       n AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n FROM cells)
       SELECT c.x_bin, c.y_bin, c.c_xy,
         CAST(round(ln(CAST(n.n * c.c_xy AS DOUBLE) /
           CAST(cx.c_x * cy.c_y AS DOUBLE)) * 1000000.0) AS BIGINT) AS pmi_micro,
         CAST(round(ln(CAST(n.n * c.c_xy AS DOUBLE) /
           CAST(cx.c_x * cy.c_y AS DOUBLE)) * 1000000.0) AS BIGINT) * c.c_xy
           AS contrib_micro
       FROM cells c JOIN cx USING (x_bin) JOIN cy USING (y_bin), n
       ORDER BY c.x_bin, c.y_bin"""

  // ── binned Kendall τ-b (Kendall 1945; Agresti 2010 §2.4.3) ─────────────

  /** Kendall τ-b between two BINNED per-row signals — the RANK-agreement
    * sibling of [[signalMi]] (association beyond linear r, direction
    * beyond MI): from the same ≤|bins|² contingency grid, concordant /
    * discordant / tied pair counts are exact integer cell-product sums,
    * and τ-b = (C − D)/√((n₀−n₁)(n₀−n₂)) handles the ties binning
    * creates (plain τ-a would deflate toward 0 as bins coarsen).
    *
    * Scale shape: ONE hash aggregate collapses the corpus to the grid;
    * the grid×grid cross join is bins⁴ BROADCAST rows (≤ tens of
    * thousands), independent of corpus size. Cell products widen to
    * DECIMAL(38,0) inside the sums (two cells of a 10¹²-row corpus can
    * pass 9.2·10¹⁸ alone); τ itself is the ONE float stage, floored in
    * micro-units. Output: one row (n, concordant, discordant,
    * tied_x_pairs, tied_y_pairs, tau_b_micro). */
  def kendallTauBinned(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // unordered cross-cell pairs counted once via lexicographic (x, y) order
    val a = cells.select(col("x").as("x1"), col("y").as("y1"),
      col("c").cast("decimal(38,0)").as("c1"))
    val b = cells.select(col("x").as("x2"), col("y").as("y2"),
      col("c").cast("decimal(38,0)").as("c2"))
    val cross = a.crossJoin(broadcast(b))
      .where(col("x1") < col("x2") ||
        (col("x1") === col("x2") && col("y1") < col("y2")))
    val cd = cross.agg(
      sum(when(col("x1") < col("x2") && col("y1") < col("y2"),
        col("c1") * col("c2")).otherwise(lit(0).cast("decimal(38,0)")))
        .as("concordant"),
      sum(when(col("x1") < col("x2") && col("y1") > col("y2"),
        col("c1") * col("c2")).otherwise(lit(0).cast("decimal(38,0)")))
        .as("discordant"))
    // tie-pair totals: Σ over marginal groups of (m choose 2); the
    // within-cell pairs (tied in BOTH) are counted inside n1 AND n2, as
    // τ-b's denominator requires
    val n = cells.agg(sum(col("c")).cast("decimal(38,0)").as("n"))
    val tx = cells.groupBy(col("x"))
      .agg(sum(col("c")).cast("decimal(38,0)").as("m"))
      .agg(sum(col("m") * (col("m") - 1) / 2).cast("decimal(38,0)")
        .as("tied_x_pairs"))
    val ty = cells.groupBy(col("y"))
      .agg(sum(col("c")).cast("decimal(38,0)").as("m"))
      .agg(sum(col("m") * (col("m") - 1) / 2).cast("decimal(38,0)")
        .as("tied_y_pairs"))
    cd.crossJoin(broadcast(n)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("n").cast("long").as("n"),
        col("concordant").cast("long").as("concordant"),
        col("discordant").cast("long").as("discordant"),
        col("tied_x_pairs").cast("long").as("tied_x_pairs"),
        col("tied_y_pairs").cast("long").as("tied_y_pairs"),
        floor((col("concordant") - col("discordant")).cast("double") /
          sqrt((col("n") * (col("n") - 1) / 2 - col("tied_x_pairs"))
            .cast("double") *
            (col("n") * (col("n") - 1) / 2 - col("tied_y_pairs"))
              .cast("double")) * lit(1e6))
          .cast("long").as("tau_b_micro"))
  }

  /** DuckDB oracle replaying [[kendallTauBinned]]; `rowsSql` yields
    * (x, y). */
  def kendallTauBinnedOracleSql(rowsSql: String): String =
    s"""WITH r AS ($rowsSql),
       cells AS (SELECT x, y, CAST(count(*) AS HUGEINT) AS c
                 FROM r GROUP BY 1, 2),
       cd AS (SELECT
           sum(CASE WHEN a.x < b.x AND a.y < b.y THEN a.c * b.c
                    ELSE 0 END) AS concordant,
           sum(CASE WHEN a.x < b.x AND a.y > b.y THEN a.c * b.c
                    ELSE 0 END) AS discordant
         FROM cells a, cells b
         WHERE a.x < b.x OR (a.x = b.x AND a.y < b.y)),
       nn AS (SELECT sum(c) AS n FROM cells),
       tx AS (SELECT sum(m * (m - 1) // 2) AS tied_x_pairs FROM
                (SELECT sum(c) AS m FROM cells GROUP BY x)),
       ty AS (SELECT sum(m * (m - 1) // 2) AS tied_y_pairs FROM
                (SELECT sum(c) AS m FROM cells GROUP BY y))
       SELECT CAST(nn.n AS BIGINT) AS n,
         CAST(cd.concordant AS BIGINT) AS concordant,
         CAST(cd.discordant AS BIGINT) AS discordant,
         CAST(tx.tied_x_pairs AS BIGINT) AS tied_x_pairs,
         CAST(ty.tied_y_pairs AS BIGINT) AS tied_y_pairs,
         CAST(floor(CAST(cd.concordant - cd.discordant AS DOUBLE) /
           sqrt(CAST(nn.n * (nn.n - 1) // 2 - tx.tied_x_pairs AS DOUBLE) *
                CAST(nn.n * (nn.n - 1) // 2 - ty.tied_y_pairs AS DOUBLE))
           * 1000000.0) AS BIGINT) AS tau_b_micro
       FROM cd, nn, tx, ty"""

  // ── retrieval metrics: MRR / success@k (Voorhees, TREC-8 1999) ─────────

  /** Per-query MRR and success@k over a ranked retrieval result — the
    * first-relevant-position view next to [[ndcgAtK]]'s graded-gain one
    * (RAG lookups care about "did anything relevant make the context
    * window", not the full gain profile). `ranked` = (qid, id, rank),
    * `rel` = (qid, id) relevant pairs; per query: first relevant rank
    * (0 = none), reciprocal rank in EXACT integer micro (10⁶ div rank —
    * no float anywhere), and a hit flag per configured k.
    *
    * Scale: one semi-join + one qid-keyed min — both sides pruned to the
    * rank lists (k·|queries| rows), corpus never touched. */
  def retrievalMetrics(ranked: DataFrame, rel: DataFrame,
                       ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "need at least one k")
    val hits = ranked.join(rel, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid")).agg(min(col("rank")).cast("long").as("frk"))
    val base = ranked.select(col("qid")).distinct()
      .join(hits, Seq("qid"), "left")
    val flagCols = ks.map(k =>
      when(col("frk").isNotNull && col("frk") <= k, 1L).otherwise(0L)
        .as(s"hit_at_$k"))
    base.select(Seq(col("qid"),
      coalesce(col("frk"), lit(0L)).as("first_rel_rank"),
      when(col("frk").isNull, 0L).otherwise(expr("1000000L div frk"))
        .as("rr_micro")) ++ flagCols: _*)
  }

  /** DuckDB oracle replaying [[retrievalMetrics]]; `rankedSql` yields
    * (qid, id, rank), `relSql` yields (qid, id). */
  def retrievalMetricsOracleSql(rankedSql: String, relSql: String,
                                ks: Seq[Int]): String = {
    val flags = ks.map(k =>
      s"CAST(CASE WHEN h.frk IS NOT NULL AND h.frk <= $k THEN 1 ELSE 0 END" +
        s" AS BIGINT) AS hit_at_$k")
      .mkString(",\n         ")
    s"""WITH ranked AS ($rankedSql), rel AS ($relSql),
       hits AS (SELECT r.qid, CAST(min(r.rank) AS BIGINT) AS frk
                FROM ranked r JOIN rel ON rel.qid = r.qid AND rel.id = r.id
                GROUP BY 1),
       qids AS (SELECT DISTINCT qid FROM ranked)
       SELECT q.qid, coalesce(h.frk, 0) AS first_rel_rank,
         CASE WHEN h.frk IS NULL THEN 0 ELSE 1000000 // h.frk END AS rr_micro,
         $flags
       FROM qids q LEFT JOIN hits h ON h.qid = q.qid
       ORDER BY q.qid"""
  }

  // ── Mann–Kendall trend test (Mann 1945; Kendall 1975) ──────────────────

  /** Mann–Kendall monotonic-trend test over a BOUNDED ordered series
    * (daily ingest counts, weekly quality means) — the significance test
    * behind "is this monitor drifting or wiggling": S = Σ_{i<j}
    * sgn(v_j − v_i), tie-corrected Var(S), and the continuity-corrected
    * z in micro-units. Distribution-free (no normality assumption — the
    * right default for count series with bursts).
    *
    * Scale: the series is a bounded calendar grid (the daily-bursts
    * bound), so the i<j cross join is |days|² broadcast rows; S and the
    * tie terms are exact integers; z is the ONE float stage. */
  def mannKendall(series: DataFrame, orderCol: String,
                  valueCol: String): DataFrame = {
    val g = series.select(col(orderCol).as("t"),
        col(valueCol).cast("long").as("v"))
      .localCheckpoint(true)
    val pairs = g.select(col("t").as("t1"), col("v").as("v1"))
      .crossJoin(broadcast(g.select(col("t").as("t2"), col("v").as("v2"))))
      .where(col("t1") < col("t2"))
    val sAgg = pairs.agg(
      sum(signum(col("v2") - col("v1")).cast("long")).as("s_stat"))
    val n = g.agg(count(lit(1)).as("n"))
    val ties = g.groupBy(col("v")).agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(expr("m * (m - 1) * (2 * m + 5)")), lit(0L))
        .as("tie_term"))
    sAgg.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .select(col("n"), col("s_stat"),
        expr("(n * (n - 1) * (2 * n + 5) - tie_term) div 18").as("var_s"),
        when(col("s_stat") === 0L, lit(0L))
          .otherwise(round(
            (col("s_stat").cast("double") -
              signum(col("s_stat").cast("double"))) /
            sqrt(((col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
              col("tie_term")).cast("double")) / lit(18.0)) * lit(1e6))
            .cast("long")).as("z_micro"))
  }

  /** DuckDB oracle replaying [[mannKendall]]; `seriesSql` yields
    * (t, v). */
  def mannKendallOracleSql(seriesSql: String): String =
    s"""WITH g AS ($seriesSql),
       pairs AS (SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
                                      WHEN b.v < a.v THEN -1
                                      ELSE 0 END) AS BIGINT) AS s_stat
                 FROM g a JOIN g b ON a.t < b.t),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM g),
       ties AS (SELECT CAST(coalesce(sum(m * (m - 1) * (2 * m + 5)), 0)
                  AS BIGINT) AS tie_term
                FROM (SELECT CAST(count(*) AS BIGINT) AS m
                      FROM g GROUP BY v))
       SELECT nn.n, p.s_stat,
         (nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term) // 18 AS var_s,
         CASE WHEN p.s_stat = 0 THEN 0
              ELSE CAST(round(
                (CAST(p.s_stat AS DOUBLE) - sign(CAST(p.s_stat AS DOUBLE))) /
                sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
                  AS DOUBLE) / 18.0) * 1000000.0) AS BIGINT) END AS z_micro
       FROM pairs p, nn, ties"""

  // ── Spearman ρ (Spearman 1904) ─────────────────────────────────────────

  /** Spearman rank correlation with average-rank ties — completing the
    * association trio (Pearson `q_signal_correlation` / Kendall
    * `q_kendall_tau` / Spearman): Pearson on the rank transforms, robust
    * to monotone rescaling of either signal. Ranks use the AVERAGE-rank
    * tie convention computed WITHOUT a per-row window: each signal
    * collapses to its distinct-value domain (the signalAuc bound), one
    * bounded cumulative window derives avg_rank(v) = cum_before +
    * (cnt+1)/2 per VALUE, and rows join their rank back by value. Rank
    * sums are exact integer HALF-UNITS (2·rank is integral); the ρ
    * moments accumulate as DECIMAL(38,0); the final ρ is the ONE float
    * stage, floor-micro.
    *
    * Scale: two value-domain aggregates + two broadcast rank joins + one
    * moment aggregate; windows touch only the bounded value grids. */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireDiscrete(df, col(xCol), "spearmanRho(x)", allowString = false)
    requireDiscrete(df, col(yCol), "spearmanRho(y)", allowString = false)
    val rows = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y")).localCheckpoint(true)
    def rankTable(c: String) = {
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rows.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        // 2·avg_rank = 2·cum_before + cnt + 1  (exact integer half-units)
        .withColumn("r2",
          (sum(col("cnt")).over(w) - col("cnt")) * 2 + col("cnt") + 1)
        .select(col("v").as(c), col("r2").as(s"r2_$c"))
    }
    val ranked = rows
      .join(broadcast(rankTable("x")), Seq("x"))
      .join(broadcast(rankTable("y")), Seq("y"))
      .select(col("r2_x").cast("decimal(38,0)").as("a"),
        col("r2_y").cast("decimal(38,0)").as("b"))
    ranked.agg(count(lit(1)).as("n"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("a") * col("a")).as("qa"),
        sum(col("b") * col("b")).as("qb"),
        sum(col("a") * col("b")).as("ab"))
      .select(col("n"),
        floor((col("n") * col("ab") - col("sa") * col("sb")).cast("double") /
          sqrt((col("n") * col("qa") - col("sa") * col("sa")).cast("double") *
            (col("n") * col("qb") - col("sb") * col("sb")).cast("double")) *
          lit(1e6)).cast("long").as("rho_micro"))
  }

  /** DuckDB oracle replaying [[spearmanRho]]; `rowsSql` yields (x, y). */
  def spearmanRhoOracleSql(rowsSql: String): String =
    s"""WITH r AS (SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
           FROM ($rowsSql)),
       rx AS (SELECT v AS x,
                (CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) - cnt) * 2
                  + cnt + 1 AS r2x
              FROM (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt
                    FROM r GROUP BY 1)),
       ry AS (SELECT v AS y,
                (CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) - cnt) * 2
                  + cnt + 1 AS r2y
              FROM (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt
                    FROM r GROUP BY 1)),
       j AS (SELECT CAST(r2x AS HUGEINT) AS a, CAST(r2y AS HUGEINT) AS b
             FROM r JOIN rx USING (x) JOIN ry USING (y)),
       m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(a) AS sa,
               sum(b) AS sb, sum(a * a) AS qa, sum(b * b) AS qb,
               sum(a * b) AS ab
             FROM j)
       SELECT CAST(n AS BIGINT) AS n,
         CAST(floor(CAST(n * ab - sa * sb AS DOUBLE) /
           sqrt(CAST(n * qa - sa * sa AS DOUBLE) *
                CAST(n * qb - sb * sb AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS rho_micro
       FROM m"""

  // ── Sen's slope (Theil 1950; Sen 1968) ─────────────────────────────────

  /** Theil–Sen slope of a BOUNDED ordered series — the magnitude
    * companion to [[mannKendall]]'s direction verdict: the median of all
    * pairwise slopes (v_j − v_i)/(t_j − t_i), robust to the burst
    * outliers that wreck a least-squares fit on ingest counts. Output:
    * one row (n_points, n_pairs, sen_slope_micro).
    *
    * Determinism: each pairwise slope quantizes to floor micro via ONE
    * double division (inputs are small exact integers — |v|·10⁶ and the
    * day gap both sit far below 2⁵³, so the division is the only rounding
    * point and floors identically on both engines; integer `div` would
    * NOT work here — BOTH engines truncate toward zero (verified for
    * Spark and the bundled DuckDB 1.0.0, same behavior
    * anisotropyReport documents), which rounds the negative slopes
    * toward zero instead of −∞ and breaks the floor contract the median
    * averaging step assumes). The median of the ≤ n²/2 slope list uses
    * one allowlisted bounded window; even counts average the two middles
    * in the same floored-double form. */
  def senSlope(series: DataFrame, orderCol: String,
               valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = series.select(col(orderCol).cast("long").as("t"),
        col(valueCol).cast("long").as("v"))
      .localCheckpoint(true)
    val slopes = g.select(col("t").as("t1"), col("v").as("v1"))
      .crossJoin(broadcast(g.select(col("t").as("t2"), col("v").as("v2"))))
      .where(col("t1") < col("t2"))
      .select(floor((col("v2") - col("v1")).cast("double") * lit(1e6) /
        (col("t2") - col("t1")).cast("double")).cast("long").as("s"))
    val n = g.agg(count(lit(1)).as("n_points"))
    val ranked = slopes
      .withColumn("rn", row_number().over(Window.orderBy(col("s"))))
      .localCheckpoint(true)
    val np = ranked.agg(max(col("rn")).cast("long").as("n_pairs"))
    val med = ranked.crossJoin(broadcast(np))
      .where(col("rn") === expr("(n_pairs + 1) div 2") ||
        col("rn") === expr("(n_pairs + 2) div 2"))
      .agg(floor(sum(col("s")).cast("double") /
        count(lit(1)).cast("double")).cast("long").as("sen_slope_micro"))
    n.crossJoin(broadcast(np)).crossJoin(broadcast(med))
      .select(col("n_points"), col("n_pairs"), col("sen_slope_micro"))
  }

  /** DuckDB oracle replaying [[senSlope]]; `seriesSql` yields (t, v). */
  def senSlopeOracleSql(seriesSql: String): String =
    s"""WITH g AS (SELECT CAST(t AS BIGINT) AS t, CAST(v AS BIGINT) AS v
           FROM ($seriesSql)),
       slopes AS (SELECT CAST(floor(CAST(b.v - a.v AS DOUBLE) * 1000000.0 /
             CAST(b.t - a.t AS DOUBLE)) AS BIGINT) AS s
           FROM g a JOIN g b ON a.t < b.t),
       ranked AS (SELECT s, row_number() OVER (ORDER BY s) AS rn
                  FROM slopes),
       np AS (SELECT CAST(max(rn) AS BIGINT) AS n_pairs FROM ranked),
       med AS (SELECT CAST(floor(CAST(sum(s) AS DOUBLE) / count(*))
                 AS BIGINT) AS sen_slope_micro
               FROM ranked, np
               WHERE rn = (n_pairs + 1) // 2 OR rn = (n_pairs + 2) // 2),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n_points FROM g)
       SELECT nn.n_points, np.n_pairs, med.sen_slope_micro
       FROM nn, np, med"""

  // ── χ² independence test (Pearson 1900) ────────────────────────────────

  /** Pearson χ² contingency table between two bounded categorical
    * signals (source × gate-pass, lang × flag …) — the significance
    * companion to [[signalMi]]'s effect-size view: per cell the observed
    * count, expected count (row·col/N, floor micro), and the χ²
    * contribution (o − e)²/e in micro-units; Σ term_micro/10⁶ against a
    * χ² table with (R−1)(C−1) dof answers "is the gate behaving
    * differently per source beyond sampling noise".
    *
    * Scale: ONE hash aggregate to the ≤ R·C grid; marginals broadcast.
    * (o·N − row·col)² overflows any fixed decimal at corpus scale, so the
    * term is the ONE float stage — computed from exact integer inputs in
    * the same operation order on both engines. */
  def chiSquare(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rx = cells.groupBy(col("x")).agg(sum(col("o")).as("rt"))
    val cy = cells.groupBy(col("y")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    // the FULL R×C grid — an absent cell (o = 0, e > 0) still contributes
    // e to χ²; emitting only observed cells would understate dependence
    // exactly where it is strongest
    rx.crossJoin(broadcast(cy))
      .join(cells, Seq("x", "y"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(n))
      .select(col("x"), col("y"), col("o"),
        expr("CAST(CAST(rt AS DECIMAL(38,0)) * ct * 1000000 div n AS BIGINT)")
          .as("e_micro"),
        round(
          (col("o").cast("double") -
            col("rt").cast("double") * col("ct").cast("double") /
              col("n").cast("double")) *
          (col("o").cast("double") -
            col("rt").cast("double") * col("ct").cast("double") /
              col("n").cast("double")) /
          (col("rt").cast("double") * col("ct").cast("double") /
            col("n").cast("double")) * lit(1e6))
          .cast("long").as("term_micro"))
  }

  /** DuckDB oracle replaying [[chiSquare]]; `rowsSql` yields (x, y). */
  def chiSquareOracleSql(rowsSql: String): String =
    s"""WITH r AS ($rowsSql),
       cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS o
                 FROM r GROUP BY 1, 2),
       rx AS (SELECT x, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
       cy AS (SELECT y, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
       nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       c AS (SELECT rx.x, cy.y, coalesce(cells.o, 0) AS o
             FROM rx CROSS JOIN cy
             LEFT JOIN cells ON cells.x = rx.x AND cells.y = cy.y)
       SELECT c.x, c.y, c.o,
         CAST(CAST(rx.rt AS HUGEINT) * cy.ct * 1000000 // nn.n AS BIGINT)
           AS e_micro,
         CAST(round(
           (CAST(c.o AS DOUBLE) -
             CAST(rx.rt AS DOUBLE) * CAST(cy.ct AS DOUBLE)
               / CAST(nn.n AS DOUBLE)) *
           (CAST(c.o AS DOUBLE) -
             CAST(rx.rt AS DOUBLE) * CAST(cy.ct AS DOUBLE)
               / CAST(nn.n AS DOUBLE)) /
           (CAST(rx.rt AS DOUBLE) * CAST(cy.ct AS DOUBLE)
             / CAST(nn.n AS DOUBLE)) * 1000000.0) AS BIGINT) AS term_micro
       FROM c JOIN rx USING (x) JOIN cy USING (y), nn
       ORDER BY c.x, c.y"""

  // ── split-conformal gating (Vovk et al.; Angelopoulos & Bates 2021) ────

  /** Split-conformal quality gate: the calibration split's nonconformity
    * scores pin the threshold τ at the ⌈(n_cal+1)(1−α)⌉-th smallest score
    * — gating NEW data at s ≤ τ then guarantees ≥ 1−α coverage under
    * exchangeability, the distribution-free version of the quality-sweep
    * threshold pick. Output: one row (n_cal, k_rank, tau, n_eval, covered,
    * coverage_micro) with the empirical eval-split coverage alongside τ.
    *
    * Scale: τ is a TakeOrdered(k) head (no global window) after one
    * bounded driver long (n_cal); coverage is one aggregate over the eval
    * split. */
  def conformalGate(cal: DataFrame, eval: DataFrame, scoreCol: String,
                    alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0 && alphaMicro < 1000000L, "alpha in (0, 1e6)")
    val nCal = cal.count()
    // integer ceil of (n+1)(1−α), capped at n (α smaller than 1/(n+1)
    // would demand a rank beyond the sample — the standard cap)
    val k = math.min(nCal,
      ((nCal + 1) * (1000000L - alphaMicro) + 999999L) / 1000000L)
    val tau = cal.select(col(scoreCol).as("s"))
      .orderBy(col("s").asc).limit(k.toInt)
      .agg(max(col("s"))).head().getLong(0)
    eval.agg(count(lit(1)).as("n_eval"),
        sum(when(col(scoreCol) <= tau, 1L).otherwise(0L)).as("covered"))
      .select(lit(nCal).as("n_cal"), lit(k).as("k_rank"),
        lit(tau).as("tau"), col("n_eval"), col("covered"),
        expr("covered * 1000000L div n_eval").as("coverage_micro"))
  }

  /** DuckDB oracle replaying [[conformalGate]]; the cal/eval SQL must
    * yield a column `s`. */
  def conformalGateOracleSql(calSql: String, evalSql: String,
                             alphaMicro: Long): String =
    s"""WITH cal AS ($calSql), ev AS ($evalSql),
       nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
       kk AS (SELECT n_cal,
                least(n_cal, ((n_cal + 1) * ${1000000L - alphaMicro}
                  + 999999) // 1000000) AS k
              FROM nc),
       tau AS (SELECT max(s) AS tau FROM
           (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cal) q, kk
         WHERE q.rn <= kk.k),
       cov AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
                CAST(sum(CASE WHEN ev.s <= tau.tau THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
              FROM ev, tau)
       SELECT kk.n_cal, kk.k AS k_rank, tau.tau, cov.n_eval, cov.covered,
         cov.covered * 1000000 // cov.n_eval AS coverage_micro
       FROM kk, tau, cov"""

  // ── deterministic Poisson bootstrap (Efron 1979; Poisson form per
  //    Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
  //    Streams" — the bootstrap that needs no resample pass) ─────────────

  /** Per-replicate Poisson(1) weight thresholds: c_k = e⁻¹·Σ_{j≤k} 1/j!.
    * Driver-computed once; both engines consume the identical double
    * literals, so the inverse-CDF ladder is bit-identical. */
  private[graft] val PoissonCdf: Seq[Double] = {
    val e1 = math.exp(-1.0)
    (0 to 7).scanLeft(0.0) { (acc, k) =>
      acc + e1 / (1 to k).foldLeft(1.0)(_ * _)
    }.tail
  }

  /** Percentile-bootstrap CI for per-group mean of a micro-unit metric —
    * ships uncertainty with every data-card stat. Replicate b weights each
    * row by Poisson(1) drawn from the deterministic md5 coin (u from
    * md5("b:" ++ id), inverse-CDF ladder over [[PoissonCdf]], capped at 8),
    * so the resample is reproducible across engines, reruns, and reshards.
    * CI bounds are the nearest-rank ⌈0.05B⌉-th and ⌈0.95B⌉-th order
    * statistics of the B replicate means (ties in the sort break on the
    * replicate id — total order).
    *
    * Scale: ONE scan fans each row ×B (explode of a B-literal array) into
    * a map-side-combined (group, b) aggregate of |groups|·B rows; the
    * percentile window partitions by group over B rows. Weighted sums stay
    * exact longs (w ≤ 8, metric micro-bounded); widen to DECIMAL(38,0)
    * before 10¹²-row corpora. Two corpus scans total: the replicate fan
    * and the point-estimate aggregate. */
  def bootstrapCi(rows: DataFrame, groupCol: String, idCol: String,
                  metricMicroCol: String, b: Int): DataFrame = {
    require(b >= 4, "need at least 4 replicates")
    import org.apache.spark.sql.expressions.Window
    def w(rep: Int): Column = {
      val u = (conv(substring(md5(concat(lit(s"$rep:"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
        .cast("double") + lit(0.5)) / lit(4294967296.0)
      // bind u ONCE per (row, replicate): inlined into all 8 CASE arms it
      // appeared 8·B times in the replicate-fan projection — at B=32 the
      // generated method blew Janino's 64 KB limit and the WHOLE stage
      // fell back to interpreted mode (bench log: "Failed to compile the
      // generated Java code"), paying 8 md5 evaluations per (row, rep)
      // on top. Same values, one evaluation (guide §4).
      graft.functions.TextFns.bindOnce(u) { uu =>
        PoissonCdf.zipWithIndex.foldRight(lit(8): Column) { case ((c, k), e) =>
          when(uu < lit(c), lit(k)).otherwise(e)
        }
      }
    }
    val reps = rows.select(col(groupCol).as("grp"),
        col(metricMicroCol).as("q"),
        explode(array((0 until b).map(r =>
          struct(lit(r).as("b"), w(r).as("w"))): _*)).as("r"))
      .select(col("grp"), col("q"), col("r.b").as("b"), col("r.w").as("w"))
      .groupBy(col("grp"), col("b"))
      .agg(sum(col("w").cast("long") * col("q")).as("wq"),
        sum(col("w").cast("long")).as("wsum"))
      .where(col("wsum") > 0) // an all-zero-weight replicate carries no mean
      .select(col("grp"), col("b"),
        round(col("wq").cast("double") / col("wsum").cast("double"))
          .cast("long").as("m"))
    val win = Window.partitionBy(col("grp")).orderBy(col("m").asc, col("b").asc)
    val ranked = reps.withColumn("rk", row_number().over(win))
      .withColumn("nb", count(lit(1)).over(Window.partitionBy(col("grp"))))
    val kLo = ceil(col("nb") * lit(0.05)).cast("int")
    val kHi = ceil(col("nb") * lit(0.95)).cast("int")
    val ci = ranked
      .select(col("grp"), col("m"), col("rk"), kLo.as("klo"), kHi.as("khi"))
      .groupBy(col("grp"))
      .agg(max(when(col("rk") === col("klo"), col("m"))).as("ci_lo_micro"),
        max(when(col("rk") === col("khi"), col("m"))).as("ci_hi_micro"))
    val point = rows.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        round(sum(col(metricMicroCol)).cast("double") / count(lit(1)))
          .cast("long").as("mean_micro"))
    point.join(ci, Seq("grp"))
      .select(col("grp"), col("n"), col("mean_micro"),
        col("ci_lo_micro"), col("ci_hi_micro"))
  }

  /** DuckDB oracle replaying [[bootstrapCi]]; `rowsSql` must yield
    * (grp, id, q). */
  def bootstrapCiOracleSql(rowsSql: String, b: Int): String = {
    val ladder = PoissonCdf.zipWithIndex.reverse.foldLeft("8") {
      case (e, (c, k)) =>
        s"CASE WHEN u < ${java.lang.Double.toString(c)} THEN $k ELSE $e END"
    }
    s"""WITH r0 AS ($rowsSql),
       fan AS (SELECT grp, q, b,
           (CAST(('0x' || substring(md5(CAST(b AS VARCHAR) || ':' ||
             CAST(id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0 AS u
         FROM r0, unnest(generate_series(0, ${b - 1})) AS g(b)),
       wts AS (SELECT grp, b, CAST($ladder AS BIGINT) AS w, q FROM fan),
       reps AS (SELECT grp, b,
           CAST(round(CAST(sum(w * q) AS DOUBLE) / CAST(sum(w) AS DOUBLE))
             AS BIGINT) AS m
         FROM wts GROUP BY 1, 2 HAVING sum(w) > 0),
       rk AS (SELECT grp, b, m,
           row_number() OVER (PARTITION BY grp ORDER BY m, b) AS rk,
           count(*) OVER (PARTITION BY grp) AS nb
         FROM reps),
       ci AS (SELECT grp,
           max(CASE WHEN rk = CAST(ceil(nb * 0.05) AS INT) THEN m END)
             AS ci_lo_micro,
           max(CASE WHEN rk = CAST(ceil(nb * 0.95) AS INT) THEN m END)
             AS ci_hi_micro
         FROM rk GROUP BY 1),
       pt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
           CAST(round(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT)
             AS mean_micro
         FROM r0 GROUP BY 1)
       SELECT pt.grp, pt.n, pt.mean_micro, ci.ci_lo_micro, ci.ci_hi_micro
       FROM pt JOIN ci USING (grp) ORDER BY pt.grp"""
  }

  // ── Krippendorff's α (Krippendorff 1970; nominal data) ────────────────

  /** Krippendorff's α for nominal labels with MISSING ratings — the
    * agreement statistic that handles exactly what Cohen's κ (pairwise)
    * and Fleiss' κ (complete panels) cannot: any item rated by any ≥2
    * subset of raters. α = 1 − D_o/D_e over the coincidence matrix;
    * the per-item 1/(m_i−1) weights become INTEGERS by scaling with
    * L = lcm(1..maxRaters−1), so both numerator and denominator are exact
    * longs and the only double is the final ratio (fixed op order,
    * micro-rounded).
    *
    * Scale: one hash aggregate to (item, label) counts, one to per-item
    * moments, two 1-row rollups — no windows, no self-joins; label and
    * rater cardinalities are campaign constants. */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String, labelCol: String,
                        maxRaters: Int): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 13, "2..13 raters supported")
    val L = (1 until maxRaters).foldLeft(1L)((a, b) =>
      a * b / BigInt(a).gcd(BigInt(b)).toLong)
    // eager-snap the (item, label) grid: three consumers (per-item moments,
    // the pairable semi-join, label totals) must not replay the corpus scan
    val mic = ratings.groupBy(col(itemCol).as("item"), col(labelCol).as("lbl"))
      .agg(count(lit(1)).as("m_ic"))
      .localCheckpoint(true)
    val perItem = mic.groupBy(col("item"))
      .agg(sum(col("m_ic")).as("m_i"), sum(col("m_ic") * col("m_ic")).as("sq"))
      .where(col("m_i") >= 2) // unpairable single-rating items drop (the def.)
    val numRow = perItem.agg(
      sum(col("m_i")).as("n"),
      // L div (m_i−1) is exact by construction ((m_i−1) | L); `div` keeps
      // the arithmetic integral (Spark's `/` on longs returns double)
      sum((col("m_i") * col("m_i") - col("sq")) *
        expr(s"${L}L div (m_i - 1)")).as("num_scaled"))
    val pairable = mic.join(perItem.select(col("item")), Seq("item"), "left_semi")
    val denRow = pairable.groupBy(col("lbl")).agg(sum(col("m_ic")).as("n_c"))
      .agg(sum(col("n_c") * col("n_c")).as("sq_c"))
    numRow.crossJoin(denRow)
      .select(col("n"), col("num_scaled"),
        (col("n") * col("n") - col("sq_c")).as("den"),
        round((lit(1.0) -
          ((col("n") - lit(1L)) * col("num_scaled")).cast("double") /
            (lit(L) * (col("n") * col("n") - col("sq_c"))).cast("double"))
          * lit(1e6)).cast("long").as("alpha_micro"))
  }

  /** DuckDB oracle replaying [[krippendorffAlpha]]; `ratingsSql` must
    * yield (item, lbl). */
  def krippendorffOracleSql(ratingsSql: String, maxRaters: Int): String = {
    val L = (1 until maxRaters).foldLeft(1L)((a, b) =>
      a * b / BigInt(a).gcd(BigInt(b)).toLong)
    s"""WITH r AS ($ratingsSql),
       mic AS (SELECT item, lbl, CAST(count(*) AS BIGINT) AS m_ic
               FROM r GROUP BY 1, 2),
       pi AS (SELECT item, CAST(sum(m_ic) AS BIGINT) AS m_i,
                CAST(sum(m_ic * m_ic) AS BIGINT) AS sq
              FROM mic GROUP BY 1 HAVING sum(m_ic) >= 2),
       nr AS (SELECT CAST(sum(m_i) AS BIGINT) AS n,
                CAST(sum((m_i * m_i - sq) * ($L // (m_i - 1))) AS BIGINT)
                  AS num_scaled
              FROM pi),
       nc AS (SELECT lbl, CAST(sum(m_ic) AS BIGINT) AS n_c
              FROM mic JOIN pi USING (item) GROUP BY 1),
       dr AS (SELECT CAST(sum(n_c * n_c) AS BIGINT) AS sq_c FROM nc)
       SELECT n, num_scaled, n * n - sq_c AS den,
         CAST(round((1.0 - CAST((n - 1) * num_scaled AS DOUBLE) /
           CAST($L * (n * n - sq_c) AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS alpha_micro
       FROM nr, dr"""
  }

  // ── rank-biased overlap (Webber et al. 2010) ──────────────────────────

  /** Truncated RBO@d between two rankings — "how similar are these two
    * top-k lists, weighting the head" (the ranking-comparison metric a
    * retrieval A/B reads; p ≈ 0.9 puts ~86% of the weight in the top 10).
    * RBO@d = Σ_{i≤d} (1−p)·p^{i−1}·|A_{1..i} ∩ B_{1..i}|/i. The per-depth
    * weights are driver-computed double LITERALS shared verbatim with the
    * oracle (cross-libm pow never runs in-plan), overlaps are exact
    * conditional counts over the FULL OUTER join of two ≤d-row rank
    * lists, and the weighted sum unrolls ascending — identical FP order
    * both sides. */
  def rbo(rankA: DataFrame, rankB: DataFrame, idCol: String, rankCol: String,
          depth: Int, p: Double): DataFrame = {
    require(depth >= 1 && p > 0 && p < 1, "need depth >= 1 and p in (0,1)")
    val j = rankA.select(col(idCol), col(rankCol).as("__ra"))
      .join(rankB.select(col(idCol), col(rankCol).as("__rb")),
        Seq(idCol), "full")
    val xs = (1 to depth).map(i =>
      sum(when(col("__ra") <= i && col("__rb") <= i, 1L).otherwise(0L))
        .as(s"__x$i"))
    val row = j.agg(xs.head, xs.tail: _*)
    val terms = (1 to depth).map { i =>
      lit(rboWeight(p, i)) * col(s"__x$i").cast("double")
    }.reduceLeft(_ + _)
    row.select(lit(depth).as("depth"),
      lit(math.round(p * 1e6)).as("p_micro"),
      col(s"__x$depth").as("overlap_at_depth"),
      round(terms * lit(1e6)).cast("long").as("rbo_micro"))
  }

  /** (1−p)·p^{i−1}/i — computed ONCE driver-side; both engines consume the
    * identical double literal. */
  private def rboWeight(p: Double, i: Int): Double =
    (1 - p) * math.pow(p, i - 1) / i

  /** DuckDB oracle replaying [[rbo]]; rank CTE sqls must yield
    * (doc_id, rank). */
  def rboOracleSql(rankASql: String, rankBSql: String, depth: Int,
                   p: Double): String = {
    val xs = (1 to depth).map(i =>
      s"CAST(sum(CASE WHEN ra <= $i AND rb <= $i THEN 1 ELSE 0 END) AS BIGINT) AS x$i")
      .mkString(",\n           ")
    val terms = (1 to depth).map(i =>
      s"${java.lang.Double.toString(rboWeight(p, i))} * CAST(x$i AS DOUBLE)")
      .mkString(" + ")
    s"""WITH ra0 AS ($rankASql), rb0 AS ($rankBSql),
       j AS (SELECT coalesce(ra0.doc_id, rb0.doc_id) AS doc_id,
               ra0.rank AS ra, rb0.rank AS rb
             FROM ra0 FULL JOIN rb0 ON rb0.doc_id = ra0.doc_id),
       agg AS (SELECT
           $xs
         FROM j)
       SELECT $depth AS depth, CAST(${math.round(p * 1e6)} AS BIGINT) AS p_micro,
         x$depth AS overlap_at_depth,
         CAST(round(($terms) * 1000000.0) AS BIGINT) AS rbo_micro
       FROM agg"""
  }

  // ── temperature scaling (Guo et al. 2017 §4.2) ─────────────────────────

  /** Fit the temperature-scaling calibrator by NLL grid search — THE
    * standard post-hoc calibration next to the ECE report: scores become
    * logits z = ln((s+1)/(1e6+1−s)) (add-one clamp keeps the 0/1e6
    * endpoints finite), and for each grid temperature the binary NLL term
    * is micro-quantized PER ROW before the sum (order-independent longs).
    * Argmin over the grid, ties to the smallest temperature (array_min
    * over (nll, t) structs). One scan, |grid| sum-aggregates, one output
    * row: (t_micro, nll_t1_micro, nll_best_micro). */
  def temperatureFit(scored: DataFrame, labelCol: String, scoreMicroCol: String,
                     gridMicro: Seq[Long]): DataFrame = {
    require(gridMicro.nonEmpty && gridMicro.forall(_ > 0), "positive temps")
    require(gridMicro.contains(1000000L), "grid must include T=1 for the baseline")
    val y = col(labelCol).cast("int")
    val s = col(scoreMicroCol).cast("double")
    val z = log((s + lit(1.0)) / (lit(1000001.0) - s))
    def nllTerm(tMicro: Long): Column = {
      val zt = z / lit(tMicro.toDouble / 1e6)
      round((when(y === 1, log(lit(1.0) + exp(-zt)))
        .otherwise(-zt + log(lit(1.0) + exp(-zt)))) * lit(1e6)).cast("long")
    }
    val aggs = gridMicro.zipWithIndex.map { case (t, i) =>
      sum(nllTerm(t)).as(s"__n$i") }
    val row = scored.agg(aggs.head, aggs.tail: _*)
    val cands = gridMicro.zipWithIndex.map { case (t, i) =>
      struct(col(s"__n$i").as("nll"), lit(t).as("t")) }
    val best = array_min(array(cands: _*))
    val t1 = gridMicro.indexOf(1000000L)
    row.select(best.getField("t").as("t_micro"),
      col(s"__n$t1").as("nll_t1_micro"),
      best.getField("nll").as("nll_best_micro"))
  }

  /** DuckDB oracle replaying [[temperatureFit]]; `scoredSql` must yield
    * (y, s) with y ∈ {0,1} and s the micro score. */
  def temperatureFitOracleSql(scoredSql: String, gridMicro: Seq[Long]): String = {
    val terms = gridMicro.zipWithIndex.map { case (t, i) =>
      val tD = s"${t.toDouble / 1e6}"
      s"""CAST(sum(CAST(round((CASE WHEN y = 1
             THEN ln(1.0 + exp(-(z / $tD)))
             ELSE -(z / $tD) + ln(1.0 + exp(-(z / $tD))) END) * 1000000.0)
           AS BIGINT)) AS BIGINT) AS n$i"""
    }.mkString(",\n         ")
    val pick = gridMicro.zipWithIndex.map { case (t, i) =>
      s"{'nll': n$i, 't': CAST($t AS BIGINT)}" }.mkString("[", ", ", "]")
    val t1 = gridMicro.indexOf(1000000L)
    s"""WITH s AS ($scoredSql),
       zt AS (SELECT y,
           ln((CAST(s AS DOUBLE) + 1.0) / (1000001.0 - CAST(s AS DOUBLE))) AS z
         FROM s),
       a AS (SELECT
         $terms
         FROM zt),
       b AS (SELECT *, list_min($pick) AS best FROM a)
       SELECT best.t AS t_micro, n$t1 AS nll_t1_micro, best.nll AS nll_best_micro
       FROM b"""
  }
}
