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

  /** DPO/RLHF preference-PAIR construction (Rafailov et al. 2023's data
    * shape): per prompt group, chosen = highest-reward completion (ties →
    * larger id), rejected = lowest (ties → smaller id), kept only when
    * the reward margin clears `minMargin` — the standard quality gate
    * that drops ambiguous pairs before DPO training. Composes downstream
    * of [[rewardZScore]]/[[lengthDebiasedReward]] (pass the whitened
    * reward) exactly like [[bestOfN]].
    *
    * Scale: ONE max-struct + min-struct hash aggregate (map-side
    * combined, skew-proof — no window, no per-group funnel); output is
    * |groups| rows. */
  def preferencePairs(df: DataFrame, groupCol: String, idCol: String,
                      rewardCol: String, minMargin: Long = 1L): DataFrame = {
    require(minMargin >= 0L, "minMargin must be non-negative")
    df.groupBy(col(groupCol))
      .agg(max(struct(col(rewardCol), col(idCol))).as("c"),
        min(struct(col(rewardCol), col(idCol))).as("r"),
        count(lit(1)).as("n"))
      .where(col("n") >= 2 &&
        col(s"c.$rewardCol") - col(s"r.$rewardCol") >= minMargin)
      .select(col(groupCol),
        col(s"c.$idCol").as("chosen_id"),
        col(s"r.$idCol").as("rejected_id"),
        col(s"c.$rewardCol").as("chosen_reward"),
        col(s"r.$rewardCol").as("rejected_reward"),
        (col(s"c.$rewardCol") - col(s"r.$rewardCol")).as("margin"))
  }

  /** DuckDB oracle replaying [[preferencePairs]]. */
  def preferencePairsOracleSql(table: String, groupExpr: String,
                               idCol: String, rewardExpr: String,
                               minMargin: Long): String =
    s"""WITH src AS (SELECT $groupExpr AS grp, $idCol AS id,
           CAST($rewardExpr AS BIGINT) AS r FROM $table),
       agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
               max(r) AS rc, min(r) AS rr FROM src GROUP BY 1),
       cho AS (SELECT src.grp, max(src.id) AS cid
               FROM src JOIN agg ON agg.grp = src.grp AND src.r = agg.rc
               GROUP BY 1),
       rej AS (SELECT src.grp, min(src.id) AS rid
               FROM src JOIN agg ON agg.grp = src.grp AND src.r = agg.rr
               GROUP BY 1)
       SELECT agg.grp, cho.cid AS chosen_id, rej.rid AS rejected_id,
         agg.rc AS chosen_reward, agg.rr AS rejected_reward,
         agg.rc - agg.rr AS margin
       FROM agg JOIN cho ON cho.grp = agg.grp JOIN rej ON rej.grp = agg.grp
       WHERE agg.n >= 2 AND agg.rc - agg.rr >= $minMargin
       ORDER BY agg.grp"""

  /** LENGTH-BIAS audit of a reward signal — reward models notoriously
    * reward verbosity (Singhal et al. 2023, "A Long Way to Go"), and a
    * biased reward silently turns RLHF into length optimization. Two
    * reads in one result: the corpus Pearson corr(length, reward) in
    * floor-micro-units (repeated on every row), and an nBins profile of
    * mean reward across the length range (fixed integer min–max binning,
    * the [[Evaluation.calibrationBins]] grid) — the profile catches
    * non-linear bias a single r misses.
    *
    * Exactness: all six moments accumulate as exact longs in ONE
    * map-side-combined pass ([[Evaluation.signalCorrelation]]'s
    * discipline — length·reward must stay in a Long, which centi/micro
    * rewards and character/token lengths do); r computes in IEEE double
    * from those integers; per-bin means widen to DECIMAL(38,0) before
    * the ×1e6 micro-scaling so corpus-scale sums cannot wrap.
    *
    * Scale: one 1-row moments aggregate (broadcast back), one ≤ nBins-row
    * aggregate — two corpus scans, zero shuffles wider than nBins rows. */
  def lengthBiasAudit(df: DataFrame, rewardCol: String, lenCol: String,
                      nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    val m = df.agg(count(lit(1)).as("n"),
      sum(col(lenCol)).as("sx"), sum(col(rewardCol)).as("sy"),
      sum(col(lenCol) * col(lenCol)).as("qx"),
      sum(col(rewardCol) * col(rewardCol)).as("qy"),
      sum(col(lenCol) * col(rewardCol)).as("xy"),
      min(col(lenCol)).as("lmin"), max(col(lenCol)).as("lmax"))
    val dx = col("n") * col("qx") - col("sx") * col("sx")
    val dy = col("n") * col("qy") - col("sy") * col("sy")
    val stats = m.select(col("lmin"), col("lmax"),
      when(dx > 0 && dy > 0,
        floor((col("n") * col("xy") - col("sx") * col("sy")).cast("double") /
          sqrt(dx.cast("double") * dy.cast("double")) * lit(1e6))
          .cast("long"))
        .otherwise(lit(null).cast("long")).as("corr_micro"))
    df.select(col(rewardCol), col(lenCol))
      .crossJoin(broadcast(stats))
      .where(col("lmax") > col("lmin"))
      .select(col(rewardCol), col("corr_micro"),
        expr(s"CAST(least(($lenCol - lmin) * 1000000L div (lmax - lmin)" +
          s" * ${nBins}L div 1000000, ${nBins - 1}) AS INT)").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"),
        max(col("corr_micro")).as("corr_micro"),
        sum(col(rewardCol)).as("sr"))
      .select(col("bin"), col("cnt"),
        expr("CAST(sr AS DECIMAL(38,0)) * 1000000 div cnt").cast("long")
          .as("mean_reward_micro"),
        col("corr_micro"))
      .orderBy(col("bin"))
  }

  /** Bradley–Terry strength fit over pairwise battle outcomes — the
    * Chatbot-Arena / RLHF-evaluation aggregation step: given (winner,
    * loser) rows, estimate per-item strengths πᵢ with P(i beats j) =
    * πᵢ/(πᵢ+πⱼ), via `iters` steps of Hunter (2004)'s MM update
    * πᵢ′ = wᵢ / Σⱼ nᵢⱼ/(πᵢ+πⱼ), renormalized to mean 10⁶ each step.
    *
    * Determinism (the [[graft.ops.Graph.pageRankMicro]] discipline):
    * strengths live as integer micro-units; each per-opponent term
    * quantizes via integer division BEFORE the per-item LONG sum, so
    * every iteration is order-independent at any parallelism and the
    * oracle unrolls the same steps in SQL. The one float op per item per
    * iteration — the renormalization — divides two exact longs in IEEE
    * double. Items that never win pull toward strength 0 (no pseudo-win
    * smoothing — callers wanting it can append synthetic battles).
    * Battle counts must keep nᵢⱼ·10¹² and wᵢ·10¹² in a Long (nᵢⱼ,
    * wᵢ ≤ ~9·10⁶ per pair/item — aggregate upstream if a single pair
    * exceeds that).
    *
    * Scale per iteration: one join of the strengths table to the
    * aggregated symmetric pair-count list + one hash aggregate keyed on
    * the item — PageRank's shape; strength tables localCheckpoint each
    * pass so plan depth stays constant. `iters` is a fixed budget, not a
    * convergence loop. */
  def bradleyTerryMicro(battles: DataFrame, winnerCol: String,
                        loserCol: String, iters: Int): DataFrame =
    bradleyTerryFromCounts(
      battles.select(
          least(col(winnerCol), col(loserCol)).as("i"),
          greatest(col(winnerCol), col(loserCol)).as("j"))
        .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n")),
      battles.groupBy(col(winnerCol).as("item"))
        .agg(count(lit(1)).as("wins")),
      iters)

  /** The MM fit over PRE-AGGREGATED battle counts — the stored-pipe form:
    * unordered pair counts `pc(i, j, n)` and per-item `wins(item, wins)`
    * are both ADDITIVE over battle batches, so folded pipes refit to the
    * exact same strengths as a full-history rebuild. Items appearing only
    * as losers need no wins row (read 0). */
  def bradleyTerryFromCounts(pc: DataFrame, wins: DataFrame,
                             iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val ed = pc.select(col("i").as("a"), col("j").as("b"), col("n"))
      .union(pc.select(col("j").as("a"), col("i").as("b"), col("n")))
      .localCheckpoint(true)
    val items = ed.select(col("a").as("item")).distinct()
    val w0 = items.join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
      .localCheckpoint(true)
    val nn = w0.agg(count(lit(1)).cast("double").as("n"))
    var p = w0.select(col("item"), lit(1000000L).as("p")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val d = ed
        .join(p.select(col("item").as("a"), col("p").as("pa")), Seq("a"))
        .join(p.select(col("item").as("b"), col("p").as("pb")), Seq("b"))
        .select(col("a").as("item"),
          expr("n * 1000000000000L div greatest(pa + pb, 1)").as("t"))
        .groupBy(col("item")).agg(sum(col("t")).as("d"))
      val raw = w0.join(d, Seq("item"))
        .select(col("item"),
          expr("wins * 1000000000000L div greatest(d, 1)").as("raw"))
      val s = raw.agg(sum(col("raw")).cast("double").as("s"))
      p = raw.crossJoin(broadcast(s)).crossJoin(broadcast(nn))
        .select(col("item"),
          round(col("raw").cast("double") * col("n") * lit(1e6) / col("s"))
            .cast("long").as("p"))
        .localCheckpoint(true)
    }
    p.select(col("item"), col("p").as("strength_micro"))
  }

  /** Per-batch ADDITIVE battle counts for the STORED Bradley–Terry
    * leaderboard — the Chatbot-Arena production shape: count once per
    * batch, blind-append into hash-bucketed pipes, fold (sum) + refit at
    * read. Returns (pair counts, win counts), each with a `bucket` chunk
    * axis so the leaderboard lives as ordinary pipes. */
  def btBattleCounts(battles: DataFrame, winnerCol: String,
                     loserCol: String, buckets: Int): (DataFrame, DataFrame) = {
    require(buckets >= 1, "need at least one bucket")
    import graft.functions.TextFns
    def bucketOf(key: org.apache.spark.sql.Column) =
      pmod(TextFns.md5Long60(key), lit(buckets.toLong)).as("bucket")
    val pc = battles.select(
        least(col(winnerCol), col(loserCol)).as("i"),
        greatest(col(winnerCol), col(loserCol)).as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
      .select(bucketOf(concat_ws(" ", col("i"), col("j"))),
        col("i"), col("j"), col("n"))
    val w = battles.groupBy(col(winnerCol).as("item"))
      .agg(count(lit(1)).as("wins"))
      .select(bucketOf(col("item").cast("string")), col("item"), col("wins"))
    (pc, w)
  }

  /** Fold stored per-batch battle counts back into fit inputs. */
  def btFoldPairs(df: DataFrame): DataFrame =
    df.groupBy(col("i"), col("j")).agg(sum(col("n")).as("n"))
  def btFoldWins(df: DataFrame): DataFrame =
    df.groupBy(col("item")).agg(sum(col("wins")).as("wins"))

  /** DuckDB oracle replaying [[bradleyTerryMicro]] — the same `iters` MM
    * steps unrolled as CTEs with identical integer quantization. */
  def bradleyTerryOracleSql(table: String, winnerExpr: String,
                            loserExpr: String, iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""d$k AS (SELECT e.a AS item,
             CAST(sum(e.n * 1000000000000 // greatest(pa.p + pb.p, 1))
               AS BIGINT) AS d
           FROM ed e JOIN p${k - 1} pa ON pa.item = e.a
                     JOIN p${k - 1} pb ON pb.item = e.b
           GROUP BY 1),
         r$k AS (SELECT w0.item,
             CAST(w0.wins * 1000000000000 // greatest(d$k.d, 1) AS BIGINT)
               AS raw
           FROM w0 JOIN d$k USING (item)),
         s$k AS (SELECT CAST(sum(raw) AS BIGINT) AS s FROM r$k),
         p$k AS (SELECT item,
             CAST(round(CAST(raw AS DOUBLE) * nn.n * 1000000.0
               / CAST(s$k.s AS DOUBLE)) AS BIGINT) AS p
           FROM r$k, s$k, nn)"""
    }.mkString(",\n       ")
    s"""WITH src AS (SELECT $winnerExpr AS w, $loserExpr AS l FROM $table),
       pc AS (SELECT least(w, l) AS i, greatest(w, l) AS j,
                CAST(count(*) AS BIGINT) AS n
              FROM src GROUP BY 1, 2),
       ed AS (SELECT i AS a, j AS b, n FROM pc
              UNION ALL SELECT j, i, n FROM pc),
       it AS (SELECT DISTINCT a AS item FROM ed),
       wn AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS wins
              FROM src GROUP BY 1),
       w0 AS (SELECT it.item, coalesce(wn.wins, 0) AS wins
              FROM it LEFT JOIN wn USING (item)),
       nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM it),
       p0 AS (SELECT item, CAST(1000000 AS BIGINT) AS p FROM w0),
       $iterCtes
       SELECT item, p AS strength_micro FROM p$iters ORDER BY item"""
  }

  /** Length-DEBIASED reward — the fix that pairs with
    * [[lengthBiasAudit]]: subtract the mean reward of each row's length
    * bin, so preference pairs and best-of-n selections stop favoring
    * verbosity (per-bin centering is the non-parametric version of the
    * linear length penalty in Singhal et al. 2023). Output keeps the raw
    * reward, the bin, and debiased_micro = reward·10⁶ − bin mean (exact
    * longs end to end).
    *
    * Scale: one 1-row min–max aggregate (broadcast), one ≤ nBins-row
    * mean aggregate (broadcast), then a pure projection over the corpus
    * — per-row work never shuffles. */
  def lengthDebiasedReward(df: DataFrame, idCol: String, rewardCol: String,
                           lenCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be positive")
    val ext = df.agg(min(col(lenCol)).as("lmin"), max(col(lenCol)).as("lmax"))
    val binned = df.select(col(idCol), col(rewardCol), col(lenCol))
      .crossJoin(broadcast(ext))
      .where(col("lmax") > col("lmin"))
      .select(col(idCol), col(rewardCol),
        expr(s"CAST(least(($lenCol - lmin) * 1000000L div (lmax - lmin)" +
          s" * ${nBins}L div 1000000, ${nBins - 1}) AS INT)").as("bin"))
    val means = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("cnt"), sum(col(rewardCol)).as("sr"))
      .select(col("bin"),
        expr("CAST(sr AS DECIMAL(38,0)) * 1000000 div cnt").cast("long")
          .as("bin_mean_micro"))
    binned.join(broadcast(means), Seq("bin"))
      .select(col(idCol), col(rewardCol), col("bin"),
        (col(rewardCol) * lit(1000000L) - col("bin_mean_micro"))
          .as("debiased_micro"))
  }

  /** DuckDB oracle replaying [[lengthDebiasedReward]]. */
  def lengthDebiasedRewardOracleSql(table: String, idCol: String,
                                    rewardExpr: String, rewardName: String,
                                    lenExpr: String, nBins: Int): String =
    s"""WITH src AS (SELECT $idCol AS id, CAST($rewardExpr AS BIGINT) AS r,
           CAST($lenExpr AS BIGINT) AS x FROM $table),
       ext AS (SELECT min(x) AS lmin, max(x) AS lmax FROM src),
       b AS (SELECT id, r,
               CAST(least((x - lmin) * 1000000 // (lmax - lmin) * $nBins
                 // 1000000, ${nBins - 1}) AS INTEGER) AS bin
             FROM src, ext WHERE lmax > lmin),
       m AS (SELECT bin,
               CAST(CAST(sum(r) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
                 AS bin_mean_micro
             FROM b GROUP BY bin)
       SELECT b.id AS $idCol, b.r AS $rewardName, b.bin,
         b.r * 1000000 - m.bin_mean_micro AS debiased_micro
       FROM b JOIN m USING (bin) ORDER BY $idCol"""

  /** DuckDB oracle replaying [[lengthBiasAudit]]. */
  def lengthBiasAuditOracleSql(table: String, rewardExpr: String,
                               lenExpr: String, nBins: Int): String =
    s"""WITH src AS (SELECT CAST($rewardExpr AS BIGINT) AS r,
           CAST($lenExpr AS BIGINT) AS x FROM $table),
       m AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(r) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS qx,
               CAST(sum(r * r) AS BIGINT) AS qy,
               CAST(sum(x * r) AS BIGINT) AS xy,
               min(x) AS lmin, max(x) AS lmax
             FROM src),
       st AS (SELECT lmin, lmax,
               CASE WHEN n * qx - sx * sx > 0 AND n * qy - sy * sy > 0
                 THEN CAST(floor(CAST(n * xy - sx * sy AS DOUBLE) /
                   sqrt(CAST(n * qx - sx * sx AS DOUBLE) *
                        CAST(n * qy - sy * sy AS DOUBLE)) * 1000000.0)
                   AS BIGINT)
               END AS corr_micro
             FROM m),
       b AS (SELECT r, corr_micro,
               CAST(least((x - lmin) * 1000000 // (lmax - lmin) * $nBins
                 // 1000000, ${nBins - 1}) AS INTEGER) AS bin
             FROM src, st WHERE lmax > lmin)
       SELECT bin, count(*) AS cnt,
         CAST(CAST(sum(r) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
           AS mean_reward_micro,
         max(corr_micro) AS corr_micro
       FROM b GROUP BY bin ORDER BY bin"""

  // ── batched Elo leaderboard (Elo 1978; the online arena aggregation) ───

  /** EPOCH-BATCHED Elo ratings — the sequential-update leaderboard next
    * to [[bradleyTerryMicro]]'s order-free MM fit: BT estimates one static
    * strength from all battles jointly; Elo tracks a TRAJECTORY, and
    * arenas report it because it absorbs drift (model swaps mid-stream).
    * A strictly per-match sequential chain cannot distribute, so this is
    * the standard production compromise: within an epoch every match
    * scores against START-of-epoch ratings, per-player deltas sum
    * exactly, and epochs apply sequentially (`numEpochs` is a bounded
    * calendar axis — weeks — not a data-proportional loop).
    *
    * Determinism: ratings are exact micro longs; each match's delta
    * d = round(K·(1 − 1/(1 + 10^((r_l − r_w)/400·10⁶)))) quantizes per
    * MATCH before the per-player sum (order-independent longs), winner
    * +d / loser −d (zero-sum). One float stage per match per epoch.
    *
    * Scale per epoch: one broadcast join of the |items|-row rating table
    * to the epoch's matches + one keyed delta sum — matches never
    * re-read across epochs (the match table snaps once). */
  def eloBatchedMicro(matches: DataFrame, epochCol: String,
                      winnerCol: String, loserCol: String, numEpochs: Int,
                      kMicro: Long = 32000000L,
                      initMicro: Long = 1500000000L): DataFrame =
    eloFromCounts(eloBattleCounts(matches, epochCol, winnerCol, loserCol),
      numEpochs, kMicro, initMicro)

  /** Per-batch ADDITIVE Elo inputs: (ep, w, l, n) — within an epoch every
    * identical pairing shares one delta (ratings are fixed at epoch
    * start), so n matches contribute exactly n·d and the collapsed count
    * table loses NOTHING: Elo-from-counts ≡ Elo-over-matches. Counts are
    * additive ⇒ blind-append + fold ≡ rebuild (the bt_index_sync
    * discipline), giving the leaderboard its stored-pipe variant for
    * free. */
  def eloBattleCounts(matches: DataFrame, epochCol: String,
                      winnerCol: String, loserCol: String): DataFrame =
    matches.select(col(epochCol).cast("int").as("ep"),
        col(winnerCol).as("w"), col(loserCol).as("l"))
      .groupBy(col("ep"), col("w"), col("l"))
      .agg(count(lit(1)).as("n"))

  /** Fold of blind-appended [[eloBattleCounts]] batches. */
  def eloFoldCounts(stored: DataFrame): DataFrame =
    stored.groupBy(col("ep"), col("w"), col("l"))
      .agg(sum(col("n")).as("n"))

  /** The epoch ladder over an (ep, w, l, n) count table — the shared
    * kernel behind [[eloBatchedMicro]] and the stored-pipe probe. */
  def eloFromCounts(counts: DataFrame, numEpochs: Int,
                    kMicro: Long = 32000000L,
                    initMicro: Long = 1500000000L): DataFrame = {
    require(numEpochs >= 1 && numEpochs <= 64, "numEpochs in [1, 64]")
    val m = counts.select(col("ep").cast("int").as("ep"), col("w"),
        col("l"), col("n").cast("long").as("n"))
      .localCheckpoint(true)
    val items = m.select(col("w").as("item"))
      .union(m.select(col("l").as("item"))).distinct()
    var r = items.select(col("item"), lit(initMicro).as("r"))
      .localCheckpoint(true)
    for (e <- 0 until numEpochs) {
      val scored = m.where(col("ep") === e)
        .join(broadcast(r.select(col("item").as("w"), col("r").as("rw"))),
          "w")
        .join(broadcast(r.select(col("item").as("l"), col("r").as("rl"))),
          "l")
        .select(col("w"), col("l"),
          (round(lit(kMicro.toDouble) * (lit(1.0) - lit(1.0) /
            (lit(1.0) + pow(lit(10.0),
              (col("rl") - col("rw")).cast("double") / lit(400e6)))))
            .cast("long") * col("n")).as("d"))
      val deltas = scored.select(col("w").as("item"), col("d"))
        .union(scored.select(col("l").as("item"), (-col("d")).as("d")))
        .groupBy(col("item")).agg(sum(col("d")).as("dd"))
      r = r.join(deltas, Seq("item"), "left")
        .select(col("item"),
          (col("r") + coalesce(col("dd"), lit(0L))).as("r"))
        .localCheckpoint(true)
    }
    val wins = m.groupBy(col("w").as("item")).agg(sum(col("n")).as("wins"))
    val losses = m.groupBy(col("l").as("item"))
      .agg(sum(col("n")).as("losses"))
    r.join(wins, Seq("item"), "left")
      .join(losses, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"),
        coalesce(col("losses"), lit(0L)).as("losses"),
        col("r").as("rating_micro"))
  }

  /** DuckDB oracle replaying [[eloBatchedMicro]]; `matchesSql` yields
    * (ep, w, l). */
  def eloBatchedOracleSql(matchesSql: String, numEpochs: Int,
                          kMicro: Long = 32000000L,
                          initMicro: Long = 1500000000L): String = {
    val epochCtes = (0 until numEpochs).map { e =>
      s"""sc$e AS (SELECT m.w, m.l,
             CAST(round($kMicro.0 * (1.0 - 1.0 /
               (1.0 + pow(10.0, CAST(rl.r - rw.r AS DOUBLE) / 400000000.0))))
               AS BIGINT) AS d
           FROM m JOIN r$e rw ON rw.item = m.w
                  JOIN r$e rl ON rl.item = m.l
           WHERE m.ep = $e),
         dl$e AS (SELECT item, CAST(sum(d) AS BIGINT) AS dd FROM (
             SELECT w AS item, d FROM sc$e
             UNION ALL SELECT l, -d FROM sc$e)
           GROUP BY 1),
         r${e + 1} AS (SELECT r.item, r.r + coalesce(d.dd, 0) AS r
           FROM r$e r LEFT JOIN dl$e d USING (item))"""
    }.mkString(",\n       ")
    s"""WITH m AS (SELECT CAST(ep AS INTEGER) AS ep, w, l
           FROM ($matchesSql)),
       it AS (SELECT DISTINCT w AS item FROM m
              UNION SELECT DISTINCT l FROM m),
       r0 AS (SELECT item, CAST($initMicro AS BIGINT) AS r FROM it),
       $epochCtes,
       wn AS (SELECT w AS item, CAST(count(*) AS BIGINT) AS wins
              FROM m GROUP BY 1),
       ls AS (SELECT l AS item, CAST(count(*) AS BIGINT) AS losses
              FROM m GROUP BY 1)
       SELECT r.item, coalesce(wn.wins, 0) AS wins,
         coalesce(ls.losses, 0) AS losses, r.r AS rating_micro
       FROM r$numEpochs r LEFT JOIN wn USING (item)
                          LEFT JOIN ls USING (item)
       ORDER BY r.item"""
  }
}
