package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reward-model post-processing for preference / RLHF data preparation:
  * per-group reward normalization (rewards from different prompts live on
  * incomparable scales — advantage-style whitening is the standard fix
  * before pair construction or filtering) and best-of-n selection (keep
  * the top-scored completion per prompt — rejection sampling / BoN
  * distillation, Stiennon et al. 2020).
  *
  * Rewards must be integral (quantize upstream — the micro/milli-unit
  * discipline): all group moments then accumulate as exact longs and the
  * one z-score division runs in deterministic IEEE double, floor-micro —
  * so a SQL oracle replays every row regardless of aggregation order.
  *
  * Reference connection: none in Meerschaum — beyond-reference
  * LLM-pipeline surface (SURVEY §2.12).
  */
object Rlhf {

  /** Per-row z-score of an integral reward within its group:
    * z = (n·x − S) / √(n·Q − S²) — algebraically (x−μ)/σ_pop with every
    * intermediate an exact long (μ, σ never materialize as floats).
    * Groups with n < 2 or zero variance report null (no whitening basis).
    *
    * Scale: ONE map-side-combined aggregate to |groups| rows, joined back
    * on the group key. Groups are per-PROMPT in RLHF data, so the moments
    * relation is corpus-proportional — no broadcast hint: AQE broadcasts
    * when the group domain happens to be small and falls back to a
    * shuffle-hash join when it isn't (a forced broadcast of millions of
    * prompt groups would OOM the driver). */
  def rewardZScore(df: DataFrame, groupCol: String, idCol: String,
                   rewardCol: String): DataFrame = {
    val moments = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(rewardCol)).as("s"),
        sum(col(rewardCol) * col(rewardCol)).as("q"))
    df.select(col(groupCol), col(idCol), col(rewardCol))
      .join(moments, Seq(groupCol))
      .select(col(groupCol), col(idCol), col(rewardCol),
        expr(s"CASE WHEN n >= 2 AND n * q - s * s > 0" +
          s" THEN CAST(FLOOR(CAST(n * $rewardCol - s AS DOUBLE)" +
          s" / SQRT(CAST(n * q - s * s AS DOUBLE)) * 1000000.0D) AS BIGINT)" +
          s" END").as("z_micro"))
  }

  /** DuckDB oracle replaying [[rewardZScore]]. `rewardExpr` must render
    * the same integral reward the Spark side received. */
  def rewardZScoreOracleSql(table: String, groupCol: String, idCol: String,
                            rewardExpr: String, rewardName: String): String =
    s"""WITH src AS (SELECT $groupCol AS grp, $idCol AS id,
           CAST($rewardExpr AS BIGINT) AS r FROM $table),
       m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r) AS BIGINT) AS s, CAST(sum(r * r) AS BIGINT) AS q
             FROM src GROUP BY grp)
       SELECT src.grp AS $groupCol, src.id AS $idCol, src.r AS $rewardName,
         CASE WHEN m.n >= 2 AND m.n * m.q - m.s * m.s > 0
           THEN CAST(FLOOR(CAST(m.n * src.r - m.s AS DOUBLE)
             / SQRT(CAST(m.n * m.q - m.s * m.s AS DOUBLE)) * 1000000.0) AS BIGINT)
         END AS z_micro
       FROM src JOIN m ON m.grp = src.grp
       ORDER BY $idCol"""

  /** Best-of-n per group: the single highest-reward row, ties broken by
    * the larger id — ONE max-struct hash aggregate (the skew-proof dedup
    * kernel: no window sort, no per-group funnel). */
  def bestOfN(df: DataFrame, groupCol: String, idCol: String,
              rewardCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(max(struct(col(rewardCol), col(idCol))).as("b"))
      .select(col(groupCol), col(s"b.$idCol").as(idCol),
        col(s"b.$rewardCol").as(rewardCol))

  /** Reward-model calibration report — the reliability diagram of the
    * group-whitened reward against a preference/outcome label (is a higher
    * normalized reward actually more likely to be the preferred
    * completion?). Composition: the [[rewardZScore]] exact-long whitening,
    * a corpus min–max rescale of z into [0, 1e6] micro-units (integer
    * division — bounded, oracle-exact; rows with no whitening basis drop),
    * then [[Evaluation.calibrationBins]]. Read it like any reliability
    * diagram: pos_rate_micro should rise monotonically with
    * mean_score_micro if the reward model's ordering means anything.
    *
    * Scale: two map-side-combined aggregates (group moments, corpus
    * min–max — the latter broadcast as 1 row) and one ≤ nBins-row
    * aggregate; the corpus shuffles once on the group key. */
  def rewardCalibration(df: DataFrame, groupCol: String, rewardCol: String,
                        labelCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    val moments = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(rewardCol)).as("s"),
        sum(col(rewardCol) * col(rewardCol)).as("q"))
    val z = df.select(col(groupCol), col(labelCol), col(rewardCol))
      .join(moments, Seq(groupCol))
      .select(col(labelCol),
        expr(s"CASE WHEN n >= 2 AND n * q - s * s > 0" +
          s" THEN CAST(FLOOR(CAST(n * $rewardCol - s AS DOUBLE)" +
          s" / SQRT(CAST(n * q - s * s AS DOUBLE)) * 1000000.0D) AS BIGINT)" +
          s" END").as("z_micro"))
      .where(col("z_micro").isNotNull)
    val ext = z.agg(min(col("z_micro")).as("zmin"), max(col("z_micro")).as("zmax"))
    val scored = z.crossJoin(broadcast(ext))
      .where(col("zmax") > col("zmin"))
      .select(col(labelCol),
        expr("(z_micro - zmin) * 1000000L div (zmax - zmin)").as("score_micro"))
    Evaluation.calibrationBins(scored, labelCol, "score_micro", nBins)
  }

  /** DuckDB oracle replaying [[rewardCalibration]] — same exact-long
    * moments, the same floor-micro z, integer min–max rescale, and the
    * calibration-bin arithmetic of
    * [[Evaluation.calibrationBinsOracleSql]]. */
  def rewardCalibrationOracleSql(table: String, groupCol: String,
                                 rewardExpr: String, labelExpr: String,
                                 nBins: Int): String =
    s"""WITH src AS (SELECT $groupCol AS grp, CAST($rewardExpr AS BIGINT) AS r,
           CAST($labelExpr AS BIGINT) AS lbl FROM $table),
       m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(r) AS BIGINT) AS s, CAST(sum(r * r) AS BIGINT) AS q
             FROM src GROUP BY grp),
       z AS (SELECT src.lbl,
               CASE WHEN m.n >= 2 AND m.n * m.q - m.s * m.s > 0
                 THEN CAST(FLOOR(CAST(m.n * src.r - m.s AS DOUBLE)
                   / SQRT(CAST(m.n * m.q - m.s * m.s AS DOUBLE)) * 1000000.0) AS BIGINT)
               END AS zm
             FROM src JOIN m ON m.grp = src.grp),
       zz AS (SELECT lbl, zm FROM z WHERE zm IS NOT NULL),
       ext AS (SELECT min(zm) AS zmin, max(zm) AS zmax FROM zz),
       sc AS (SELECT lbl, (zm - zmin) * 1000000 // (zmax - zmin) AS s
              FROM zz, ext WHERE zmax > zmin),
       b AS (SELECT CAST(least(s * $nBins // 1000000, ${nBins - 1}) AS INTEGER) AS bin,
               s, lbl FROM sc)
       SELECT bin, count(*) AS cnt,
         CAST(sum(s) AS BIGINT) // count(*) AS mean_score_micro,
         CAST(sum(lbl) AS BIGINT) * 1000000 // count(*) AS pos_rate_micro
       FROM b GROUP BY bin ORDER BY bin"""

  /** DuckDB oracle replaying [[bestOfN]]. */
  def bestOfNOracleSql(table: String, groupCol: String, idCol: String,
                       rewardExpr: String, rewardName: String): String =
    s"""WITH src AS (SELECT $groupCol AS grp, $idCol AS id,
           CAST($rewardExpr AS BIGINT) AS r FROM $table),
       best AS (SELECT grp, max(r) AS r FROM src GROUP BY grp),
       pick AS (SELECT src.grp, max(src.id) AS id, best.r
                FROM src JOIN best ON best.grp = src.grp AND best.r = src.r
                GROUP BY src.grp, best.r)
       SELECT grp AS $groupCol, id AS $idCol, r AS $rewardName
       FROM pick ORDER BY $groupCol"""
}
