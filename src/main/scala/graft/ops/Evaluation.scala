package graft.ops

import org.apache.spark.sql.DataFrame
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
    * EVALUATION sets (≲ 1e9 rows): doubled rank sums stay inside a Long
    * there; a corpus-sized AUC would quantize the score first anyway.
    * Output: ONE row (p, n, auc_micro); auc_micro is null when either
    * class is absent. */
  def signalAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("cumb", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("rank2", lit(2) * col("cumb") + col("cnt") + lit(1))
    ranked.agg(
        sum(col("pos") * col("rank2")).as("sr2"),
        sum(col("pos")).as("p"),
        sum(col("cnt") - col("pos")).as("n"))
      .select(col("p"), col("n"),
        when(col("p") > 0 && col("n") > 0,
          expr("(sr2 - p * (p + 1)) * 1000000L div (2 * p * n)"))
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
       t AS (SELECT CAST(sum(pos * (2 * cumb + cnt + 1)) AS BIGINT) AS sr2,
               CAST(sum(pos) AS BIGINT) AS p,
               CAST(sum(cnt - pos) AS BIGINT) AS n
             FROM w)
       SELECT p, n,
         CASE WHEN p > 0 AND n > 0
           THEN (sr2 - p * (p + 1)) * 1000000 // (2 * p * n)
           ELSE NULL END AS auc_micro
       FROM t"""

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
}
