package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Relational operators the reference expresses only implicitly — the
  * per-id as-of fetch (`join_fetch`, reference
  * `meerschaum/connectors/sql/_fetch.py:449-521`) is a special case of a
  * general as-of join, and chunk iteration over a time axis
  * (`core/Pipe/_data.py:639-932`) is the degenerate fixed-width form of
  * gap-based sessionization. Both generalized here as first-class ops.
  *
  * Scale design: both run as ONE hash shuffle on the join/session keys.
  * The as-of join is the union+window formulation — Spark would otherwise
  * plan `t.ts >= q.ts` as a broadcast-nested-loop or a sort-merge with an
  * inequality tail (per-key cross product); interleaving both sides in one
  * time-sorted window keeps cost at O(n log n) per key partition with
  * nothing wider than a row ever materialized per match.
  */
object Relational {

  /** A genuinely NULL struct literal. `struct(lit(null), ...)` would be a
    * NON-null struct whose fields are null — `last(ignoreNulls)` would then
    * treat a left row's placeholder as a real match and never skip it. */
  private def nullOf(schema: StructType, cols: Seq[String]): Column =
    lit(null).cast(StructType(cols.map(c => schema(c).copy(nullable = true))))

  /** As-of join: for every left row, attach `rightPayload` from the most
    * recent right row with the same `keys` and `right.timeCol <= left
    * .timeCol` (or strictly `<` when `inclusive=false`); null payload when
    * no right row precedes. Ties inside the right side at the same
    * timestamp resolve by `rightOrder` ascending (last wins) — pass a
    * unique column for a deterministic result.
    *
    * Both inputs are tagged and unioned, then a single
    * `last(payload, ignoreNulls)` window ordered by (time, side, order)
    * carries the latest right payload forward onto each left row:
    * one shuffle on `keys`, no join node at all.
    */
  /** Axis value in exact integer micros (timestamps) or as-is (integral
    * epoch axes) — ordering and tolerance arithmetic must not round. Other
    * types (double, string, date) have no exact integer form: casting them
    * would silently truncate or null, so they are only legal on the raw
    * path (backward, no tolerance) and None is returned here. */
  private def axisUs(df: DataFrame, c: String): Option[Column] = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case TimestampType | TimestampNTZType =>
        Some(graft.dsl.RoundTime.epochMicros(col(c)))
      case ByteType | ShortType | IntegerType | LongType =>
        Some(col(c).cast("long"))
      case _ => None
    }
  }

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], rightOrder: Seq[String] = Nil,
               inclusive: Boolean = true,
               direction: String = "backward",
               toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols  = left.columns.toSeq
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    // `forward` (nearest right row AT/AFTER the left row) is the backward
    // join on the NEGATED axis: micros negate exactly, the window machinery
    // is untouched. `toleranceUs` nulls the payload when the matched right
    // row is further than the bound (pandas merge_asof semantics). Both
    // features need an exact integer axis (timestamp or integral); any
    // other orderable axis type stays on the raw backward path.
    val sign = if (direction == "backward") 1L else -1L
    val needsUs = direction == "forward" || toleranceUs.isDefined
    val (lAxis, rAxis) = (axisUs(left, leftTime), axisUs(right, rightTime)) match {
      case (Some(la), Some(ra)) => (la * sign, ra * sign)
      case _ if needsUs => throw new IllegalArgumentException(
        s"forward/tolerance as-of joins need a timestamp or integral time " +
        s"axis; got ${left.schema(leftTime).dataType} / ${right.schema(rightTime).dataType}")
      case _ => (col(leftTime), col(rightTime)) // raw orderable axis
    }
    // side ordering encodes the bound: inclusive puts right rows BEFORE the
    // left row at the same timestamp (visible), strict puts them after
    val rightSide = if (inclusive) 0 else 2
    val ordCols   = if (rightOrder.nonEmpty) rightOrder else rightPayload
    val l = left.select(
      keys.map(col) ++ Seq(
        lAxis.as("__t"), lit(1).as("__side"),
        nullOf(right.schema, ordCols).as("__ord"),
        lit(null).cast("long").as("__rt"),
        nullOf(right.schema, rightPayload).as("__pay"),
        struct(leftCols.map(col): _*).as("__row")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        rAxis.as("__t"), lit(rightSide).as("__side"),
        struct(ordCols.map(col): _*).as("__ord"),
        (if (needsUs) rAxis else lit(null)).cast("long").as("__rt"),
        struct(rightPayload.map(col): _*).as("__pay"),
        nullOf(left.schema, leftCols).as("__row")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = r.unionByName(l)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .withColumn("__mt", last(col("__rt"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    // signed distance left − matched-right is ≥ 0 by construction in both
    // directions; beyond the tolerance the match nulls out, the row stays
    val inTol = toleranceUs match {
      case None    => lit(true)
      case Some(t) => col("__mt").isNotNull && (col("__t") - col("__mt")) <= t
    }
    matched.select(leftCols.map(c => col("__row").getField(c).as(c)) ++
      rightPayload.map(c =>
        when(inTol, col("__match").getField(c)).as(c)): _*)
  }

  /** Ordered event funnel: how many entities completed step k of a strictly
    * ordered step sequence — step k counts only if it happened STRICTLY
    * after the entity's step k−1 completion (first qualifying occurrence
    * each). The classic product-analytics funnel, composed relationally so
    * the SQL oracle states the same fixpoint: t₁ = min ts of step 1,
    * tₖ = min ts of step k with ts > tₖ₋₁.
    *
    * One key-partitioned aggregate per step, each over the PRE-FILTERED
    * step slice (the type predicate pushes to the scan); joins are keyed on
    * the entity id, and each step's frame shrinks monotonically. Output is
    * |steps| rows.
    */
  def funnel(events: DataFrame, idCol: String, typeCol: String,
             timeCol: String, steps: Seq[String],
             maxGapUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct == steps, "funnel steps must be distinct")
    require(maxGapUs.forall(_ > 0), "maxGapUs must be positive")
    var reached = events.where(col(typeCol) === lit(steps.head))
      .groupBy(col(idCol)).agg(min(col(timeCol)).as("__t"))
    val width = steps.length.toString.length
    def label(i: Int) = s"%0${width}d_%s".format(i + 1, steps(i))
    var out = reached.select(lit(label(0)).as("step"), col(idCol))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      // the WINDOWED variant ("conversion within T of the previous step")
      // bounds each step's search window on exact epoch micros — integer
      // comparisons, so the fixpoint is engine-portable
      val gapOk = maxGapUs.map(g =>
          graft.dsl.RoundTime.epochMicros(col(timeCol)) <=
            graft.dsl.RoundTime.epochMicros(col("__t")) + lit(g))
        .getOrElse(lit(true))
      reached = events.where(col(typeCol) === lit(st))
        .join(reached, Seq(idCol))
        .where(col(timeCol) > col("__t") && gapOk)
        .groupBy(col(idCol)).agg(min(col(timeCol)).as("__t"))
      out = out.unionByName(reached.select(lit(label(i)).as("step"), col(idCol)))
    }
    out.groupBy(col("step")).agg(count(lit(1)).as("n_users"))
  }

  /** Daily burst detection — the ingest-monitoring anomaly flag: days
    * whose event count exceeds mean + σ·std of the TRAILING `window` full
    * days (the day itself excluded, so a burst cannot suppress its own
    * baseline). Mean/std derive from integer window sums (Σcnt, Σcnt² —
    * exact under any evaluation order), then three identical IEEE float
    * shapes both engines replay; days without a full window are skipped.
    *
    * Scale: ONE grouped day-count aggregate (map-side combined) feeds a
    * window over the |days|-row series — the window is single-partition
    * but runs on days, never on events.
    */
  def dailyBursts(events: DataFrame, timeCol: String,
                  sigma: Double = 3.0, window: Int = 7): DataFrame = {
    require(window >= 2, "window must be at least 2 days")
    // day as a truncated TIMESTAMP, not DATE: date values round-trip
    // differently through the two engines' dataframe bridges
    val daily = events.groupBy(date_trunc("day", col(timeCol))
        .cast("timestamp_ntz").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("day")).rowsBetween(-window, -1)
    val mean = col("s").cast("double") / col("n").cast("double")
    val variance = greatest(
      col("ss").cast("double") / col("n").cast("double") - mean * mean,
      lit(0.0d))
    daily
      .withColumn("n", count(col("cnt")).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
      .where(col("n") === window)
      .select(col("day"), col("cnt"),
        mean.as("mean"), sqrt(variance).as("std"))
      .withColumn("burst",
        col("cnt") > col("mean") + lit(sigma) * col("std"))
      .orderBy(col("day"))
  }

  /** DuckDB oracle replaying [[dailyBursts]]. */
  def dailyBurstsOracleSql(table: String, timeCol: String,
                           sigma: Double = 3.0, window: Int = 7): String = {
    val mean = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
    s"""WITH d AS (SELECT date_trunc('day', $timeCol) AS day, count(*) AS cnt
                   FROM $table GROUP BY 1),
       w AS (SELECT day, cnt,
               count(cnt) OVER win AS n,
               CAST(sum(cnt) OVER win AS BIGINT) AS s,
               CAST(sum(cnt * cnt) OVER win AS BIGINT) AS ss
             FROM d
             WINDOW win AS (ORDER BY day ROWS BETWEEN $window PRECEDING AND 1 PRECEDING)),
       t AS (SELECT day, cnt, $mean AS mean,
               sqrt(greatest(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE) -
                 ($mean) * ($mean), 0.0)) AS std
             FROM w WHERE n = $window)
       SELECT day, cnt, mean, std, cnt > mean + $sigma * std AS burst
       FROM t ORDER BY day"""
  }

  /** MARKOV stationary distribution of the event-type transition chain —
    * the long-run behavioral mix ("where do user journeys spend their
    * time"): consecutive events per entity define the transition counts,
    * and `iters` power-iteration steps π′(s) = Σᵤ π(u)·n(u,s)/W(u) give
    * the stationary vector. Dangling states (no outgoing transitions)
    * redistribute their mass uniformly (the PageRank fix at damping 1);
    * each step renormalizes to Σ = |states|·10⁶ so rounding drift cannot
    * accumulate.
    *
    * Determinism (the [[graft.ops.Graph.pageRankMicro]] discipline):
    * per-edge contributions quantize to micro BEFORE the state sums;
    * transition extraction orders by (time, tie) inside each entity, so
    * simultaneous events are deterministic; the oracle unrolls the same
    * steps. Scale per iteration: one join of the |states|-row vector to
    * the aggregated transition matrix + one state-keyed aggregate; the
    * transition window partitions by ENTITY — never a global sort. */
  def markovStationaryMicro(events: DataFrame, entityCol: String,
                            typeCol: String, timeCol: String,
                            tieCol: String, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 20, "iters must be in [1, 20]")
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(timeCol), col(tieCol))
    val tr = events.select(col(entityCol), col(typeCol), col(timeCol),
        col(tieCol))
      .withColumn("__nxt", lead(col(typeCol), 1).over(w))
      .where(col("__nxt").isNotNull)
      .groupBy(col(typeCol).as("from"), col("__nxt").as("to"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val wt = tr.groupBy(col("from")).agg(sum(col("n")).as("wt"))
      .localCheckpoint(true)
    val states = tr.select(col("from").as("state"))
      .union(tr.select(col("to").as("state"))).distinct()
      .localCheckpoint(true)
    val n = states.agg(count(lit(1)).cast("double").as("n"))
    var pi = states.crossJoin(broadcast(n))
      .select(col("state"), round(lit(1e6) / col("n")).cast("long").as("pi"))
      .localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val contribs = tr
        .join(pi.select(col("state").as("from"), col("pi")), "from")
        .join(wt, "from")
        .select(col("to").as("state"),
          round(col("pi").cast("double") * col("n").cast("double") /
            col("wt").cast("double")).cast("long").as("c"))
        .groupBy(col("state")).agg(sum(col("c")).as("in_micro"))
      val dang = pi
        .join(wt.select(col("from").as("state")), Seq("state"), "left_anti")
        .agg(coalesce(sum(col("pi")), lit(0L)).cast("double").as("dmass"))
      val raw = states.join(contribs, Seq("state"), "left")
        .crossJoin(broadcast(dang)).crossJoin(broadcast(n))
        .select(col("state"),
          (coalesce(col("in_micro"), lit(0L)) +
            round(col("dmass") / col("n")).cast("long")).as("raw"))
      val tot = raw.agg(sum(col("raw")).cast("double").as("tot"))
      pi = raw.crossJoin(broadcast(tot)).crossJoin(broadcast(n))
        .select(col("state"),
          round(col("raw").cast("double") * col("n") * lit(1e6) /
            col("tot")).cast("long").as("pi"))
        .localCheckpoint(true)
    }
    pi.select(col("state"), col("pi").as("pi_micro"))
  }

  /** DuckDB oracle replaying [[markovStationaryMicro]] — transition
    * extraction via the same (time, tie)-ordered lead and the identical
    * `iters` unrolled quantized steps. */
  def markovStationaryOracleSql(table: String, entityCol: String,
                                typeCol: String, timeCol: String,
                                tieCol: String, iters: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (SELECT tr.t AS state,
             CAST(sum(CAST(round(CAST(p.pi AS DOUBLE) * tr.n / wt.wt)
               AS BIGINT)) AS BIGINT) AS in_micro
           FROM tr JOIN p${i - 1} p ON p.state = tr.f
                   JOIN wt ON wt.f = tr.f
           GROUP BY tr.t),
         g$i AS (SELECT CAST(coalesce(sum(pi), 0) AS DOUBLE) AS dmass
                 FROM p${i - 1} WHERE state NOT IN (SELECT f FROM wt)),
         w$i AS (SELECT st.state,
                   coalesce(c$i.in_micro, 0)
                     + CAST(round(g$i.dmass / nn.n) AS BIGINT) AS raw
                 FROM st LEFT JOIN c$i ON c$i.state = st.state, g$i, nn),
         t$i AS (SELECT CAST(sum(raw) AS DOUBLE) AS tot FROM w$i),
         p$i AS (SELECT state,
                   CAST(round(CAST(raw AS DOUBLE) * nn.n * 1000000.0
                     / t$i.tot) AS BIGINT) AS pi
                 FROM w$i, t$i, nn)"""
    }.mkString(",\n       ")
    s"""WITH seq AS (SELECT $typeCol AS ty,
           lead($typeCol) OVER (PARTITION BY $entityCol
             ORDER BY $timeCol, $tieCol) AS nxt
         FROM $table),
       tr AS (SELECT ty AS f, nxt AS t, CAST(count(*) AS BIGINT) AS n
              FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
       wt AS (SELECT f, CAST(sum(n) AS BIGINT) AS wt FROM tr GROUP BY 1),
       st AS (SELECT f AS state FROM tr UNION SELECT t FROM tr),
       nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM st),
       p0 AS (SELECT state, CAST(round(1000000.0 / nn.n) AS BIGINT) AS pi
              FROM st, nn),
       $iterCtes
       SELECT state, pi AS pi_micro FROM p$iters ORDER BY state"""
  }

  /** CHANGE-POINT detection per group — the best-split mean-shift
    * statistic (the CUSUM-family two-sample form): for every candidate
    * split day t, the scaled gap between the mean daily volume before
    * and after, |S_t·(n−t) − (S_n−S_t)·t| / (t·(n−t)); the argmax day is
    * where the regime changed (a deploy, an ingestion break, a bot wave).
    * [[dailyBursts]] finds spikes against a local baseline; this finds
    * the LEVEL SHIFT a spike detector normalizes away.
    *
    * Exactness: prefix sums over the day grid are exact longs, the gap
    * is a pure integer rational (DECIMAL(38,0) products), and max-day
    * ties break to the earliest day. Scale: one grouped day-count
    * aggregate; windows PARTITION by the group over |days| rows each —
    * never over events. Output one row per group: (group, n_days,
    * split_day, diff_micro = mean gap in events/day micro-units). */
  def changepointSplit(events: DataFrame, groupCol: String,
                       timeCol: String): DataFrame = {
    val daily = events.groupBy(col(groupCol).as("grp"),
        date_trunc("day", col(timeCol)).cast("timestamp_ntz").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val wRank = Window.partitionBy(col("grp")).orderBy(col("day"))
    val wSum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = daily
      .withColumn("t", row_number().over(wRank).cast("long"))
      .withColumn("st", sum(col("cnt")).over(wSum))
    val tot = daily.groupBy(col("grp"))
      .agg(sum(col("cnt")).as("sn"), count(lit(1)).as("nd"))
    val diffs = pre.join(tot, Seq("grp"))
      .where(col("t") < col("nd"))
      .select(col("grp"), col("day"), col("nd"),
        // greatest(…, 1) never changes a kept row (the filter above pins
        // t < nd) — it only keeps ANSI division alive if the engine
        // evaluates the projection speculatively
        expr("CAST(abs(CAST(st AS DECIMAL(38,0)) * (nd - t)" +
          " - (CAST(sn AS DECIMAL(38,0)) - st) * t) * 1000000" +
          " div greatest(CAST(t AS DECIMAL(38,0)) * (nd - t), 1) AS BIGINT)")
          .as("diff_micro"))
    val best = diffs.groupBy(col("grp"))
      .agg(max(col("diff_micro")).as("diff_micro"))
    diffs.join(best, Seq("grp", "diff_micro"))
      .groupBy(col("grp"), col("diff_micro"))
      .agg(max(col("nd")).as("n_days"), min(col("day")).as("split_day"))
      .select(col("grp").as(groupCol), col("n_days"), col("split_day"),
        col("diff_micro"))
  }

  /** DuckDB oracle replaying [[changepointSplit]]. */
  def changepointSplitOracleSql(table: String, groupCol: String,
                                timeCol: String): String =
    s"""WITH d AS (SELECT $groupCol AS grp, date_trunc('day', $timeCol) AS day,
           CAST(count(*) AS BIGINT) AS cnt
         FROM $table GROUP BY 1, 2),
       p AS (SELECT grp, day,
               CAST(row_number() OVER win AS BIGINT) AS t,
               CAST(sum(cnt) OVER win2 AS BIGINT) AS st
             FROM d
             WINDOW win AS (PARTITION BY grp ORDER BY day),
                    win2 AS (PARTITION BY grp ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       tt AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS sn,
                CAST(count(*) AS BIGINT) AS nd
              FROM d GROUP BY 1),
       df AS (SELECT p.grp, p.day, tt.nd,
                CAST(abs(CAST(st AS HUGEINT) * (nd - t)
                  - (CAST(sn AS HUGEINT) - st) * t) * 1000000
                  // greatest(CAST(t AS HUGEINT) * (nd - t), 1) AS BIGINT)
                  AS diff_micro
              FROM p JOIN tt USING (grp) WHERE p.t < tt.nd),
       b AS (SELECT grp, max(diff_micro) AS diff_micro FROM df GROUP BY 1)
       SELECT df.grp AS $groupCol, max(df.nd) AS n_days,
         min(df.day) AS split_day, b.diff_micro
       FROM df JOIN b ON b.grp = df.grp AND b.diff_micro = df.diff_micro
       GROUP BY df.grp, b.diff_micro ORDER BY $groupCol"""

  /** Funnel step LATENCIES — how long converting entities take between
    * consecutive steps (the "median time to purchase" product metric):
    * the same first-qualifying-occurrence fixpoint as [[funnel]], but
    * keeping each entity's per-step completion time and reporting, per
    * transition, the converter count and the exact interpolated p50/p90
    * gap in seconds. Same shrinking-frame composition; one extra id-keyed
    * join per transition pairs step k with step k−1.
    */
  def funnelLatency(events: DataFrame, idCol: String, typeCol: String,
                    timeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "latency needs at least two steps")
    require(steps.distinct == steps, "funnel steps must be distinct")
    var reached = events.where(col(typeCol) === lit(steps.head))
      .groupBy(col(idCol)).agg(min(col(timeCol)).as("__t"))
    val width = steps.length.toString.length
    def label(i: Int) =
      s"%0${width}d_%s_to_%s".format(i + 1, steps(i - 1), steps(i))
    var out: DataFrame = null
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prev = reached.withColumnRenamed("__t", "__tp")
      reached = events.where(col(typeCol) === lit(st))
        .join(prev.select(col(idCol), col("__tp").as("__t")), Seq(idCol))
        .where(col(timeCol) > col("__t"))
        .groupBy(col(idCol)).agg(min(col(timeCol)).as("__t"))
      val gaps = reached.join(prev, Seq(idCol))
        .select(col(idCol),
          ((graft.dsl.RoundTime.epochMicros(col("__t")) -
            graft.dsl.RoundTime.epochMicros(col("__tp"))).cast("double") /
            lit(1000000.0d)).as("gap_s"))
      val stat = gaps.agg(count(lit(1)).as("n_converted"),
          percentile(col("gap_s"), lit(0.5)).as("p50_s"),
          percentile(col("gap_s"), lit(0.9)).as("p90_s"))
        .select(lit(label(i)).as("transition"), col("n_converted"),
          col("p50_s"), col("p90_s"))
      out = if (out == null) stat else out.unionByName(stat)
    }
    out
  }

  /** DuckDB oracle replaying [[funnelLatency]]. */
  def funnelLatencyOracleSql(table: String, idCol: String, typeCol: String,
                             timeCol: String, steps: Seq[String]): String = {
    val width = steps.length.toString.length
    val ctes = steps.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s1 AS (SELECT $idCol, min($timeCol) AS t FROM $table
                   WHERE $typeCol = '$st' GROUP BY 1)"""
      else
        s"""s${i + 1} AS (
             SELECT e.$idCol, min(e.$timeCol) AS t
             FROM $table e JOIN s$i USING ($idCol)
             WHERE e.$typeCol = '$st' AND e.$timeCol > s$i.t GROUP BY 1)"""
    }.mkString(",\n         ")
    val rows = (1 until steps.length).map { i =>
      val lbl = s"%0${width}d_%s_to_%s".format(i + 1, steps(i - 1), steps(i))
      s"""SELECT '$lbl' AS transition,
            count(*) AS n_converted,
            quantile_cont(CAST(epoch_us(b.t) - epoch_us(a.t) AS DOUBLE) / 1000000.0, 0.5) AS p50_s,
            quantile_cont(CAST(epoch_us(b.t) - epoch_us(a.t) AS DOUBLE) / 1000000.0, 0.9) AS p90_s
          FROM s${i + 1} b JOIN s$i a USING ($idCol)"""
    }.mkString("\n         UNION ALL ")
    s"""WITH $ctes
       SELECT * FROM (
         $rows) m
       ORDER BY transition"""
  }

  /** Event-sequence n-gram mining — the behavioral-pattern counterpart of
    * text n-grams: the most frequent length-`n` runs of consecutive event
    * TYPES per entity ("view > view > purchase"), ordered by time with a
    * unique tiebreak so the sequences are deterministic. The standard
    * flow-mining primitive behind "what do users do right before X".
    *
    * One entity-keyed window (lag chain — no self-joins, no per-entity
    * collect) + one map-side-combined count + TakeOrdered(k).
    */
  def eventNgrams(events: DataFrame, idCol: String, typeCol: String,
                  timeCol: String, tieCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2, "n must be at least 2")
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(idCol)).orderBy(col(timeCol), col(tieCol))
    val parts = ((n - 1) to 1 by -1).map(j => lag(col(typeCol), j).over(w)) :+
      col(typeCol)
    events.select(col(idCol), col(typeCol), col(timeCol), col(tieCol))
      .withColumn("__first", parts.head)
      .withColumn("pattern", concat_ws(" > ", parts: _*))
      .where(col("__first").isNotNull) // runs shorter than n drop
      .groupBy(col("pattern"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pattern"))
      .limit(k)
  }

  /** DuckDB oracle replaying [[eventNgrams]]. */
  def eventNgramsOracleSql(table: String, idCol: String, typeCol: String,
                           timeCol: String, tieCol: String,
                           n: Int, k: Int): String = {
    val lags = ((n - 1) to 1 by -1).map(j =>
      s"lag($typeCol, $j) OVER (PARTITION BY $idCol ORDER BY $timeCol, $tieCol) AS g$j")
      .mkString(", ")
    s"""WITH l AS (SELECT $idCol, $typeCol, $lags FROM $table),
       p AS (SELECT concat_ws(' > ', ${(((n - 1) to 1 by -1).map(j => s"g$j") :+ typeCol).mkString(", ")}) AS pattern
             FROM l WHERE g${n - 1} IS NOT NULL)
       SELECT pattern, count(*) AS n_occurrences FROM p
       GROUP BY 1 ORDER BY n_occurrences DESC, pattern LIMIT $k"""
  }

  /** Per-key trailing-window rolling aggregates: for every row, the count
    * and sum of `valueCol` over the half-open-at-the-left, inclusive window
    * `[t − window, t]` of the SAME key — per-user activity rates, rolling
    * exposure, API-limit windows. One window shuffle keyed on `keys` with a
    * RANGE frame over exact epoch micros.
    *
    * The summed value is quantized to integer micro-units FIRST: long sums
    * are exact under ANY evaluation tree, so the result is independent of
    * whether the engine slides, recomputes, or segment-trees the frame —
    * and an ANSI SQL oracle replays it exactly (a raw double sum would
    * differ in ulps between frame strategies).
    */
  def rollingWindow(df: DataFrame, keys: Seq[String], timeCol: String,
                    valueCol: String, windowUs: Long): DataFrame = {
    require(keys.nonEmpty, "rolling window needs at least one key")
    require(windowUs >= 0, "window must be non-negative")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__us"))
      .rangeBetween(-windowUs, 0)
    df.withColumn("__us", graft.dsl.RoundTime.epochMicros(col(timeCol)))
      .withColumn("__vm", round(col(valueCol) * lit(1e6)).cast("long"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_micro_window", sum(col("__vm")).over(w))
      .drop("__us", "__vm")
  }

  /** Per-key LOCF resample onto a regular time grid — the classic
    * time-series downsample/gap-fill: for every key, a grid of `step`-spaced
    * instants from the key's first observation (truncated to `truncUnit`)
    * through its last, each carrying the payload of the latest observation
    * at or before it (last observation carried forward); grid points before
    * the first observation carry null. Composed from [[asofJoin]], so the
    * whole operator is the grid explode (∝ keys × grid points, never rows²)
    * plus as-of's single keyed shuffle.
    */
  def resampleLocf(df: DataFrame, keys: Seq[String], timeCol: String,
                   payload: Seq[String], step: String,
                   truncUnit: String = "day"): DataFrame = {
    require(keys.nonEmpty, "resample needs at least one key")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(date_trunc(truncUnit, min(col(timeCol))).as("__t0"),
        max(col(timeCol)).as("__t1"))
    val grid = bounds.select(keys.map(col) :+
      explode(sequence(col("__t0"), col("__t1"), expr(step))).as("grid_ts"): _*)
    asofJoin(grid, df, keys, "grid_ts", timeCol, payload)
  }

  /** Point-in-interval range join, bucketized: match every `points` row
    * whose `ptCol` falls inside a `intervals` row's `[loCol, hiCol]`
    * (inclusive ends; pass `openEnd=true` for half-open).
    *
    * Spark plans a raw `lo <= x AND x <= hi` join as broadcast-nested-loop
    * (or a per-key quadratic sort-merge tail) — quadratic at scale. Here
    * both sides map onto a grid of `bucketWidthUs`-wide buckets: intervals
    * explode into the buckets they span, points land in exactly one, and
    * the join becomes a hash equi-join on the bucket id + an exact residual
    * filter. Each qualifying (interval, point) pair meets in EXACTLY one
    * bucket (the point's own), so no dedup pass is needed. Choose the
    * bucket width near the typical interval length: explode factor stays
    * O(1) and the shuffle is narrow.
    */
  def pointInIntervalJoin(intervals: DataFrame, points: DataFrame,
                          loCol: String, hiCol: String, ptCol: String,
                          bucketWidthUs: Long,
                          openEnd: Boolean = false): DataFrame = {
    val us = graft.dsl.RoundTime.epochMicros _
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(us(col(loCol)) / bucketWidthUs).cast("long"),
        floor(us(col(hiCol)) / bucketWidthUs).cast("long"))))
    val p = points.withColumn("__bucket",
      floor(us(col(ptCol)) / bucketWidthUs).cast("long"))
    val hiBound = if (openEnd) us(col(ptCol)) < us(col(hiCol))
                  else          us(col(ptCol)) <= us(col(hiCol))
    i.join(p, Seq("__bucket"))
      .where(us(col(loCol)) <= us(col(ptCol)) && hiBound)
      .drop("__bucket")
  }

  /** Stamp a gap-based session index per key: a new session starts when the
    * previous event for the key is more than `gapSeconds` older (or there is
    * none). `tiebreak` orders simultaneous events deterministically.
    * Adds `session_idx` (1-based per key). One shuffle on `keyCol`.
    */
  def sessionize(df: DataFrame, keyCol: String, timeCol: String,
                 gapSeconds: Long, tiebreak: Seq[String]): DataFrame = {
    val order = col(timeCol).asc +: tiebreak.map(col(_).asc)
    val w     = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev  = lag(col(timeCol), 1).over(w)
    // exact integer micros (not a double cast): gap comparison at a
    // boundary must not depend on floating-point rounding
    val us    = graft.dsl.RoundTime.epochMicros _
    val isNew = when(prev.isNull ||
      us(col(timeCol)) - us(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Collapse sessionized rows to one row per session: bounds, event count,
    * and an aggregate over `valueCol`. Map-side combine applies — the
    * shuffle after sessionize is on the same key, so AQE coalesces it.
    */
  def sessionBounds(df: DataFrame, keyCol: String, timeCol: String,
                    gapSeconds: Long, tiebreak: Seq[String]): DataFrame =
    sessionize(df, keyCol, timeCol, gapSeconds, tiebreak)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(min(col(timeCol)).as("session_start"),
           max(col(timeCol)).as("session_end"),
           count(lit(1)).as("n_events"))

  /** Interval × interval OVERLAP join (closed intervals: a and b overlap
    * iff loA ≤ hiB AND loB ≤ hiA) — the time-alignment workhorse behind
    * "which maintenance windows intersected which incident windows" /
    * session-vs-campaign overlap questions. Spark plans the raw range
    * predicate as a nested-loop join; here BOTH sides explode onto a
    * `bucketWidthUs` grid, the join is a hash equi-join on the bucket id,
    * and each overlapping pair is emitted EXACTLY once — the residual
    * keeps only the bucket containing the overlap's START
    * (max(loA, loB)), which both sides of a true overlap always span, so
    * no distinct pass is needed. Explode factor = interval length /
    * bucket width (configuration); the shuffle carries grid-keyed rows.
    * Left/right columns must be disjoint (alias before calling). */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
                          loA: String, hiA: String,
                          loB: String, hiB: String,
                          bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    val us = graft.dsl.RoundTime.epochMicros _
    def gridded(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(sequence(
          floor(us(col(lo)) / bucketWidthUs).cast("long"),
          floor(us(col(hi)) / bucketWidthUs).cast("long"))))
    val overlapStartBucket =
      floor(greatest(us(col(loA)), us(col(loB))) / bucketWidthUs).cast("long")
    gridded(a, loA, hiA).join(gridded(b, loB, hiB), Seq("__bucket"))
      .where(us(col(loA)) <= us(col(hiB)) && us(col(loB)) <= us(col(hiA)) &&
        col("__bucket") === overlapStartBucket)
      .drop("__bucket")
  }

  /** Double-fire detection — telemetry events whose predecessor with the
    * SAME key arrived within `toleranceUs` (client retries, duplicate
    * webhooks, at-least-once collectors firing twice). One keyed window
    * with a deterministic (ts, id) order; the emitted `gap_us` is exact
    * integer micros, so the dedup decision replays on any engine. The
    * SECOND of each close pair is flagged (drop it, keep the first). */
  def doubleFires(df: DataFrame, keyCols: Seq[String], tsCol: String,
                  idCol: String, toleranceUs: Long): DataFrame = {
    require(keyCols.nonEmpty && toleranceUs >= 0, "bad double-fire parameters")
    val us = graft.dsl.RoundTime.epochMicros _
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(us(col(tsCol)).asc, col(idCol).asc)
    val gap = us(col(tsCol)) - lag(us(col(tsCol)), 1).over(w)
    df.withColumn("gap_us", gap)
      .where(col("gap_us").isNotNull && col("gap_us") <= toleranceUs)
      .select((col(idCol) +: keyCols.map(col)) :+ col("gap_us"): _*)
  }

  /** First- and last-touch ATTRIBUTION: for every conversion event, the
    * earliest and latest qualifying touch event by the same entity within
    * `windowUs` BEFORE (or at) the conversion — the standard marketing /
    * funnel-credit model, and the provenance question ("which crawl
    * snapshot fed this training doc") in pipeline form.
    *
    * Scale: ONE entity-keyed equi-join (conversions × touches per entity,
    * bounded by per-entity history like the funnel family) feeding one
    * hash aggregate: first = min(struct(ts, id, type)), last = max —
    * deterministic under ties, no window, map-side combined. Conversions
    * with no in-window touch keep nulls (left join). */
  def touchAttribution(events: DataFrame, entityCol: String, tsCol: String,
                       typeCol: String, idCol: String,
                       touchTypes: Seq[String], convType: String,
                       windowUs: Long): DataFrame = {
    require(touchTypes.nonEmpty && windowUs > 0, "bad attribution parameters")
    val us = graft.dsl.RoundTime.epochMicros _
    val conv = events.where(col(typeCol) === convType)
      .select(col(entityCol), col(idCol).as("conv_id"),
        us(col(tsCol)).as("conv_us"))
    val touch = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(entityCol).as("__touch_entity"), col(idCol).as("touch_id"),
        us(col(tsCol)).as("touch_us"), col(typeCol).as("touch_type"))
    // the window bound lives IN the join condition: a LEFT join with a
    // post-join filter would drop conversions whose touches all fall
    // outside the window instead of keeping them with nulls
    val joined = conv.join(touch,
      col(entityCol) === col("__touch_entity") &&
        col("touch_us") <= col("conv_us") &&
        col("touch_us") >= col("conv_us") - windowUs, "left")
    joined.groupBy(col(entityCol), col("conv_id"), col("conv_us"))
      .agg(
        min(when(col("touch_us").isNotNull,
          struct(col("touch_us"), col("touch_id"), col("touch_type"))))
          .as("ft"),
        max(when(col("touch_us").isNotNull,
          struct(col("touch_us"), col("touch_id"), col("touch_type"))))
          .as("lt"))
      .select(col(entityCol), col("conv_id"), col("conv_us"),
        col("ft.touch_id").as("first_touch_id"),
        col("ft.touch_type").as("first_touch_type"),
        col("lt.touch_id").as("last_touch_id"),
        col("lt.touch_type").as("last_touch_type"))
  }

  // ── association rules (Agrawal & Srikant, VLDB 1994) ───────────────────

  /** Pairwise association rules over (basket, item) facts — "users who
    * fire A also fire B": support, confidence and lift for every ordered
    * item pair, the classic market-basket view of the event log next to
    * [[q_event_trigrams]]' sequential one. All three measures are exact
    * integer micro-rationals in the basket counts (lift's n·supp product
    * widens to DECIMAL(38,0)).
    *
    * Scale: baskets collapse to DISTINCT (basket, item) in one
    * aggregate; the per-basket self-join fans at ≤ |items|² per basket
    * (items are a bounded dimension — event types, sources); outputs are
    * |items|²-sized. */
  def associationRules(facts: DataFrame, basketCol: String,
                       itemCol: String): DataFrame = {
    val bi = facts.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct().localCheckpoint(true)
    val n = bi.select(col("b")).distinct().agg(count(lit(1)).as("n"))
    val supp = bi.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val pairs = bi.join(bi.select(col("b"), col("i").as("j")), Seq("b"))
      .where(col("i") =!= col("j"))
      .groupBy(col("i").as("antecedent"), col("j").as("consequent"))
      .agg(count(lit(1)).as("support_ab"))
    pairs
      .join(broadcast(supp.select(col("i").as("antecedent"),
        col("s").as("sa"))), "antecedent")
      .join(broadcast(supp.select(col("i").as("consequent"),
        col("s").as("sc"))), "consequent")
      .crossJoin(broadcast(n))
      .select(col("antecedent"), col("consequent"), col("support_ab"),
        expr("support_ab * 1000000L div sa").as("confidence_micro"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * support_ab * 1000000" +
          " div (CAST(sa AS DECIMAL(38,0)) * sc) AS BIGINT)")
          .as("lift_micro"))
  }

  /** DuckDB oracle replaying [[associationRules]]; `factsSql` yields
    * (b, i). */
  def associationRulesOracleSql(factsSql: String): String =
    s"""WITH bi AS (SELECT DISTINCT b, i FROM ($factsSql)),
       nn AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM bi),
       supp AS (SELECT i, CAST(count(*) AS BIGINT) AS s FROM bi GROUP BY 1),
       pairs AS (SELECT a.i AS antecedent, c.i AS consequent,
           CAST(count(*) AS BIGINT) AS support_ab
         FROM bi a JOIN bi c ON c.b = a.b AND a.i <> c.i
         GROUP BY 1, 2)
       SELECT p.antecedent, p.consequent, p.support_ab,
         p.support_ab * 1000000 // sa.s AS confidence_micro,
         CAST(CAST(nn.n AS HUGEINT) * p.support_ab * 1000000
           // (CAST(sa.s AS HUGEINT) * sc.s) AS BIGINT) AS lift_micro
       FROM pairs p JOIN supp sa ON sa.i = p.antecedent
                    JOIN supp sc ON sc.i = p.consequent, nn
       ORDER BY p.antecedent, p.consequent"""

  // ── Kaplan–Meier survival (Kaplan & Meier, JASA 1958) ──────────────────

  /** Kaplan–Meier user-lifetime survival curve with right-censoring — the
    * churn view next to [[q_cohort_retention]]'s grid: duration = days
    * between a user's first and last activity; users still active in the
    * trailing `censorTailDays` of the corpus are CENSORED (their true
    * lifetime is unobserved — dropping them would bias survival down,
    * counting them as churn would bias it up; KM is the estimator that
    * uses them correctly until their observed duration). Per duration d:
    * at-risk r_d (observed duration ≥ d), churned e_d, and
    * Ŝ(d) = Π_{d'≤d} (1 − e_{d'}/r_{d'}).
    *
    * Determinism: per-duration hazard factors quantize to micro FIRST
    * (f = 10⁶ − e·10⁶ div r); the product runs in log space with
    * per-TERM micro quantization (round(10⁶·ln(f/10⁶)) — the
    * char-entropy discipline), one running-sum window over the bounded
    * duration grid (≤ corpus calendar span, allowlisted), exp at the
    * end. An f = 0 step (everyone churns) pins survival to exactly 0
    * from that duration on via a parallel running min — ln(0) never
    * evaluates.
    *
    * Scale: corpus collapses to per-user (first, last) in ONE aggregate,
    * then to the ≤|days| duration grid; everything after is grid-sized. */
  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  censorTailDays: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // integer day index via datediff — epochMicros/86400e6 would round-trip
    // through a double (micros exceed 2^53) and lose exactness
    val day = datediff(date_trunc("day", col(tsCol)).cast("date"),
      to_date(lit("1970-01-01"))).cast("long")
    val spans = events.select(col(userCol).as("u"), day.as("d"))
      .groupBy(col("u"))
      .agg(min(col("d")).as("fd"), max(col("d")).as("ld"))
      .localCheckpoint(true)
    val maxDay = spans.agg(max(col("ld")).as("mx"))
    val users = spans.crossJoin(broadcast(maxDay))
      .select((col("ld") - col("fd")).as("dur"),
        (col("ld") <= col("mx") - lit(censorTailDays.toLong)).as("churn"))
    val grid = users.groupBy(col("dur"))
      .agg(count(lit(1)).as("all_cnt"),
        sum(when(col("churn"), 1L).otherwise(0L)).as("churned"))
      .localCheckpoint(true)
    val tot = grid.agg(sum(col("all_cnt")).as("n"))
    val w = Window.orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(tot))
      .withColumn("at_risk",
        col("n") - (sum(col("all_cnt")).over(w) - col("all_cnt")))
      .withColumn("f",
        lit(1000000L) - expr("churned * 1000000L div at_risk"))
      .withColumn("term",
        when(col("f") === 0L, lit(0L))
          .otherwise(round(log(col("f").cast("double") / lit(1e6)) *
            lit(1e6)).cast("long")))
      .withColumn("cum_term", sum(col("term")).over(w))
      .withColumn("min_f", min(col("f")).over(w))
      .select(col("dur").as("duration_days"), col("at_risk"),
        col("churned"), (col("all_cnt") - col("churned")).as("censored"),
        when(col("min_f") === 0L, lit(0L))
          .otherwise(round(exp(col("cum_term").cast("double") / lit(1e6)) *
            lit(1e6)).cast("long")).as("surv_micro"))
  }

  /** DuckDB oracle replaying [[kaplanMeier]]. */
  def kaplanMeierOracleSql(table: String, userExpr: String, tsExpr: String,
                           censorTailDays: Int = 3): String =
    s"""WITH spans AS (
         SELECT $userExpr AS u,
           CAST(min(date_diff('day', DATE '1970-01-01',
             CAST(date_trunc('day', $tsExpr) AS DATE))) AS BIGINT) AS fd,
           CAST(max(date_diff('day', DATE '1970-01-01',
             CAST(date_trunc('day', $tsExpr) AS DATE))) AS BIGINT) AS ld
         FROM $table GROUP BY 1),
       mx AS (SELECT max(ld) AS mx FROM spans),
       users AS (SELECT ld - fd AS dur,
           ld <= mx.mx - $censorTailDays AS churn
         FROM spans, mx),
       grid AS (SELECT dur, CAST(count(*) AS BIGINT) AS all_cnt,
           CAST(sum(CASE WHEN churn THEN 1 ELSE 0 END) AS BIGINT) AS churned
         FROM users GROUP BY 1),
       tot AS (SELECT CAST(sum(all_cnt) AS BIGINT) AS n FROM grid),
       km AS (SELECT dur, all_cnt, churned,
           tot.n - (CAST(sum(all_cnt) OVER (ORDER BY dur) AS BIGINT)
             - all_cnt) AS at_risk
         FROM grid, tot),
       kf AS (SELECT *,
           1000000 - churned * 1000000 // at_risk AS f
         FROM km),
       kt AS (SELECT *,
           CASE WHEN f = 0 THEN 0
                ELSE CAST(round(ln(CAST(f AS DOUBLE) / 1000000.0)
                  * 1000000.0) AS BIGINT) END AS term
         FROM kf),
       kc AS (SELECT *,
           CAST(sum(term) OVER (ORDER BY dur) AS BIGINT) AS cum_term,
           min(f) OVER (ORDER BY dur) AS min_f
         FROM kt)
       SELECT dur AS duration_days, at_risk, churned,
         all_cnt - churned AS censored,
         CASE WHEN min_f = 0 THEN 0
              ELSE CAST(round(exp(CAST(cum_term AS DOUBLE) / 1000000.0)
                * 1000000.0) AS BIGINT) END AS surv_micro
       FROM kc ORDER BY duration_days"""
}
