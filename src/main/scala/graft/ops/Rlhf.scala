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
