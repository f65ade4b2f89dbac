package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalog.PipeSpec
import graft.storage.PipeStorage
import graft.sync.{SyncEngine, SyncResult}

/** Maintenance operators: verify/backfill, copy, compact, vacuum
  * (reference: meerschaum/core/Pipe/_verify.py:18-470, _copy.py:1-108,
  * _compress.py:13-107, _maintenance.py:1-161).
  */
final case class VerifyResult(chunksChecked: Long, chunksMismatched: Long,
                              resync: SyncResult)

object Maintenance {

  /** Verify a pipe against its source and backfill the differences.
    *
    * The reference loops over chunk bounds and runs one rowcount query + one
    * re-sync per chunk (core/Pipe/_verify.py:146-330) — N round trips. At
    * scale the loop is the bottleneck, so we re-express it as set algebra:
    * ONE windowed rowcount aggregation per side (source, target), a join to
    * locate mismatched chunks, and a single re-sync bounded to exactly those
    * chunks. Same semantics (rowcount-compare first, then sync the diff),
    * O(1) Spark jobs instead of O(chunks).
    *
    * The chunk grid is epoch-aligned tumbling windows of `spec.chunkMinutes`
    * (`window(dt, w)` aligns to the 1970 epoch, matching the reference's
    * aligned `get_chunk_bounds`, core/Pipe/_data.py:728-883).
    */
  def verify(engine: SyncEngine, spec: PipeSpec, source: DataFrame,
             windowMinutes: Option[Long] = None,
             checkContent: Boolean = true,
             boundDays: Option[Long] = None,
             deleteMissing: Boolean = false): VerifyResult = {
    val dt = spec.columns.datetime.getOrElse(
      throw new IllegalArgumentException("verify requires a datetime axis"))
    // `boundDays` caps how far back verify re-checks (reference
    // `verify.bound_days`, default 366 — core/Pipe/_verify.py:546-599,
    // config/_default.py:239). The bound must apply to BOTH sides'
    // summaries — bounding only the source would read every archived
    // window as "missing" and flag the whole history. Epoch axes convert
    // the cutoff through the axis unit; on the target the predicate rides
    // the chunk-label pruning of the scan.
    val boundPred: Option[Column] = boundDays.map { days =>
      val cutoff = engine.now().minusDays(days)
      val v: Any = spec.epochUnit match {
        case Some(unit) => graft.dsl.EpochAxis.toUnits(cutoff, unit)
        case None       => cutoff
      }
      col(dt) >= lit(v)
    }
    // the COMPARE window is its own knob (reference `verify.chunk_minutes`,
    // config/_default.py:240), independent of the storage chunk width: a
    // finer window bounds the re-sync to the actual damage without forcing
    // finer storage partitions
    val w     = s"${windowMinutes.getOrElse(spec.chunkMinutes)} minutes"
    val store = engine.storage(spec)

    if (!store.exists) {
      val r = engine.sync(spec, source)
      return VerifyResult(0, 0, r)
    }

    // `checkContent` (the DEFAULT, matching the reference's distrust of
    // rowcounts alone — core/Pipe/_verify.py:146-330) compares an
    // order-independent per-window content signature on top of the count:
    // a SUM of the 64-bit canonical row hashes, widened to decimal so ANSI
    // mode cannot overflow. A window whose values were corrupted without
    // changing its count no longer verifies clean. Sum (not XOR) is
    // commutative AND multiplicity-sensitive — XOR cancels rows that
    // differ in identical pairs (h^h = 0), passing exactly the damage this
    // check exists to catch.
    // hash the COMMON columns, cast to the unified schema on both sides —
    // a promoted stored type (int batch + float batch → numeric) must not
    // read as corruption
    val tgtSchema = store.read.schema
    val unified = SchemaEvolution.unifiedSchema(tgtSchema, source.schema, spec.mixedNumerics)
    val commonFields = unified.fields.filter(f =>
      source.columns.contains(f.name) && tgtSchema.fieldNames.contains(f.name)).toSeq
    val common = commonFields.map(_.name)

    def summarize(df0: DataFrame) = {
      val df = boundPred.fold(df0)(df0.where)
      val canon = df.select(
        commonFields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
      val rows = canon.select(
        window(col(dt).cast("timestamp"), w).getField("start").as("__chunk"),
        Diff.rowHash64(common).as("__h"))
      if (checkContent)
        rows.groupBy(col("__chunk"))
          .agg(count(lit(1)).as("__cnt"),
               sum(col("__h").cast("decimal(38,0)")).as("__sig"))
      else
        rows.groupBy(col("__chunk"))
          .agg(count(lit(1)).as("__cnt"),
               lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)").as("__sig"))
    }

    val src = summarize(source)
      .withColumnRenamed("__cnt", "__src_cnt").withColumnRenamed("__sig", "__src_sig")
    val tgt = summarize(store.read)
      .withColumnRenamed("__cnt", "__tgt_cnt").withColumnRenamed("__sig", "__tgt_sig")
    // the window start collects as TimestampNTZ: a `Timestamp →
    // toLocalDateTime` round-trip would render in the JVM's DEFAULT zone
    // while the `badWin` cast below renders in the SESSION zone — on a
    // non-UTC JVM the repair predicate would match nothing
    val joined = src.join(tgt, Seq("__chunk"), "full_outer")
      .select(col("__chunk").cast("timestamp_ntz").as("__chunk"),
        coalesce(col("__src_cnt"), lit(0L)).as("s"),
        coalesce(col("__tgt_cnt"), lit(0L)).as("t"),
        coalesce(col("__src_sig"), lit(java.math.BigDecimal.ZERO)).as("ss"),
        coalesce(col("__tgt_sig"), lit(java.math.BigDecimal.ZERO)).as("ts"))
    // ONE action: the summary is one row per compare window (bounded by the
    // verify bound, never by data volume), so collecting it once replaces
    // the count job + the filtered-collect job + the cache between them
    val windows = joined.collect()
    val total   = windows.length.toLong
    val bad = windows.filter { r =>
      r.getLong(1) != r.getLong(2) ||
        r.getDecimal(3).compareTo(r.getDecimal(4)) != 0
    }
    if (bad.isEmpty) return VerifyResult(total, 0, SyncResult(0, 0))
    // repair by WINDOW REPLACEMENT, not by diff: verify has already proven
    // these windows wrong and the source is authoritative inside them, so
    // clear + blind re-append is the same result as the diff re-sync minus
    // its backtrack read, row hashing, and anti-join — the repair cost is
    // one pruned source scan + a chunk-bounded clear + the rewrite of the
    // touched chunks. (The reference re-syncs chunks through the diff path;
    // with rowcount-only checking that also sweeps up undetected in-window
    // drift, but with the content signature proving cleanliness the diff
    // can only be a no-op.)
    //
    // SAFETY: a window where the source has NO rows but the target does is
    // indistinguishable from "the upstream archived this history" — a
    // partial source slice must never destroy the target, so target-only
    // windows are reported as mismatched but only cleared under an explicit
    // `deleteMissing = true` (the old diff re-sync was additive-only there
    // and silently left the mismatch in place forever).
    val replaceable = bad.filter(r => r.getLong(1) > 0 ||
      (deleteMissing && r.getLong(2) > 0))
      .map(_.getAs[java.time.LocalDateTime](0))
    if (replaceable.isEmpty) return VerifyResult(total, bad.length, SyncResult(0, 0))
    val badSet  = replaceable.toSet
    val badWin  = window(col(dt).cast("timestamp"), w).getField("start")
      .cast("timestamp_ntz").isInCollection(badSet)
    // bound the clear's affected-chunk discovery scan to the damaged span:
    // summarize casts the axis to a timestamp (long axes read as seconds),
    // so toEpochSecond inverts the cast back into axis units exactly
    val wMin  = windowMinutes.getOrElse(spec.chunkMinutes)
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_.isBefore(_))
    val minLdt = replaceable.min
    val maxLdt = replaceable.max.plusMinutes(wMin)
    val (lo, hi): (Any, Any) = spec.epochUnit match {
      case Some(_) => (minLdt.toEpochSecond(java.time.ZoneOffset.UTC),
                       maxLdt.toEpochSecond(java.time.ZoneOffset.UTC))
      case None    => (minLdt, maxLdt)
    }
    store.clear(badWin, Some(lo), Some(hi))
    val r = engine.sync(spec, source.where(badWin), checkExisting = false)
    VerifyResult(total, bad.length, r)
  }

  /** Re-partition a pipe's storage under its CURRENT chunk spec — the
    * reference's `Pipe.repartition` (core/Pipe/_maintenance.py:161, backed
    * by connectors/sql/_partition.py): after `chunkMinutes` (or the epoch
    * unit) is edited, the on-disk chunk labels still follow the old width,
    * and every bounded read's label-range predicate would silently miss
    * data. One clustered read→write under the new labels (atomic tmp+swap
    * via overwrite) restores the invariant. O(table) by necessity — the
    * same full rewrite the reference's partition migration performs.
    */
  def repartition(engine: SyncEngine, spec: PipeSpec): Long = {
    val store = engine.storage(spec)
    if (!store.exists) return 0L
    store.overwrite(store.read)
    store.rowCount
  }

  /** Copy a pipe's data (and by extension its spec) to another pipe —
    * reference `copy_to` (core/Pipe/_copy.py:1-108): chunked data copy into
    * the destination. Spark form: one scan → one partitioned write; an
    * existing destination receives an idempotent sync instead.
    */
  def copyTo(engine: SyncEngine, from: PipeSpec, to: PipeSpec): SyncResult = {
    val src = engine.storage(from).read
    engine.sync(to, src)
  }

  /** Column profile — the ANALYZE/statistics surface (reference exposes
    * table size and distinct counts, §2.4; this is the per-column form a
    * data engineer actually asks for): non-null count, exact distinct
    * count, and min/max per column, in long format. ONE aggregate job —
    * every statistic computes in the same pass with map-side partial
    * aggregation; the exact distincts expand the input k-ways (Spark's
    * multi-count-distinct plan), which is the right trade below ~1 TB —
    * at 100 TB swap `approx_count_distinct` into the same shape.
    * Numeric min/max surface as DOUBLE and others as canonical strings, so
    * an engine-independent oracle compares exactly (no float-to-text
    * formatting dependence). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    // exact-name attribute references (UnresolvedAttribute.quoted), and the
    // long-format pivot built as array-of-structs + inline — NO parsed SQL
    // anywhere, so column names with spaces/dots/hyphens/quotes neither
    // break parsing nor alias-collide with the generated stat names
    def ref(c: String): Column = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(c))
    val numeric = df.schema.fields.map(f =>
      f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toMap
    cols.foreach(c => require(numeric.contains(c), s"no such column: $c"))
    val rows = cols.map { c =>
      val base = Seq(lit(c).as("col_name"),
        count(ref(c)).as("n_nonnull"),
        count_distinct(ref(c)).as("n_distinct"))
      val tail =
        if (numeric(c))
          Seq(min(ref(c)).cast("double").as("min_num"),
              max(ref(c)).cast("double").as("max_num"),
              lit(null).cast("string").as("min_str"),
              lit(null).cast("string").as("max_str"))
        else
          Seq(lit(null).cast("double").as("min_num"),
              lit(null).cast("double").as("max_num"),
              min(ref(c)).cast("string").as("min_str"),
              max(ref(c)).cast("string").as("max_str"))
      struct(base ++ tail: _*)
    }
    df.agg(array(rows: _*).as("__rows")).select(inline(col("__rows")))
  }

  /** Equi-width histogram of a numeric column — the distribution half of
    * the ANALYZE surface. Two jobs: one min/max aggregate for the bounds,
    * then ONE hash aggregate over the bin index (map-side combined; 100 TB
    * shuffles `bins` rows). The bin arithmetic is a fixed IEEE expression
    * shared with the oracle generator, so counts replay exactly; the top
    * edge clamps into the last bin. */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val v = col(c).cast("double")
    val b = df.agg(min(v), max(v)).head()
    if (b.isNullAt(0)) // empty input / all-null column: empty histogram,
      return df.where(lit(false)) // matching the oracle's empty result
        .select(lit(0).as("bin"), lit(0.0).as("bin_lo"), lit(0L).as("cnt"))
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val width = (hi - lo) / bins
    val bin = (if (width == 0.0) lit(0)
               else least(floor((v - lit(lo)) / lit(width)), lit(bins - 1L)))
      .cast("int")
    df.where(v.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin"), (lit(lo) + col("bin") * lit(width)).as("bin_lo"), col("cnt"))
  }

  /** Percentile winsorization — the outlier-clamp every feature/quality
    * column gets before it feeds thresholds or models: values clamp to
    * the exact [pLo, pHi] percentiles (linear-interpolation definition,
    * the same `percentile` ⇄ `quantile_cont` parity the percentile
    * queries prove), with a `clipped` flag for audit counts. One bounds
    * aggregate (2-row broadcast) + a scan projection.
    */
  def winsorize(df: DataFrame, idCol: String, valueCol: Column,
                pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val v = valueCol.cast("double")
    val bounds = df.agg(
      percentile(v, lit(pLo)).as("__lo"),
      percentile(v, lit(pHi)).as("__hi"))
    df.select(col(idCol), v.as("v"))
      .crossJoin(broadcast(bounds))
      .select(col(idCol), col("v"),
        least(greatest(col("v"), col("__lo")), col("__hi")).as("v_winsor"),
        (col("v") < col("__lo") || col("v") > col("__hi")).as("clipped"))
  }

  /** DuckDB oracle replaying [[winsorize]]. */
  def winsorizeOracleSql(table: String, idCol: String, valueExpr: String,
                         pLo: Double, pHi: Double): String =
    s"""WITH b AS (
         SELECT quantile_cont(CAST($valueExpr AS DOUBLE), $pLo) AS lo,
                quantile_cont(CAST($valueExpr AS DOUBLE), $pHi) AS hi
         FROM $table)
       SELECT $idCol, CAST($valueExpr AS DOUBLE) AS v,
         least(greatest(CAST($valueExpr AS DOUBLE), b.lo), b.hi) AS v_winsor,
         (CAST($valueExpr AS DOUBLE) < b.lo OR CAST($valueExpr AS DOUBLE) > b.hi) AS clipped
       FROM $table, b ORDER BY $idCol"""

  /** Population Stability Index bins between two snapshots of a numeric
    * column — the standard production drift monitor ("did this week's
    * crawl shift the length/quality distribution?"): equi-width bins over
    * a FIXED [lo, hi) range (fixed so that two snapshots, or fifty weekly
    * ones, bin identically; out-of-range values clamp into the edge bins),
    * add-one-smoothed shares, and the per-bin PSI term
    * `(p_a − p_b)·ln(p_a/p_b)` in exact micro-nats. Σ term_micro ≳ 0.2e6
    * is the classic "investigate" threshold.
    *
    * Scale: each snapshot pays one scan into a `bins`-row hash aggregate
    * (map-side combined); the totals ride as an OVER () window over the
    * bins-row grid — single-partition but `bins` rows, never data.
    */
  def psiBins(a: DataFrame, b: DataFrame, valueCol: Column,
              lo: Double, hi: Double, bins: Int): DataFrame =
    psiBinsFromCounts(psiBinCounts(a, valueCol, lo, hi, bins),
      b, valueCol, lo, hi, bins)

  /** The per-snapshot (bin, cnt) table — the PERSISTABLE half of the PSI
    * monitor: store one per snapshot (a |bins|-row pipe) and every later
    * snapshot compares against the STORED baseline without re-reading the
    * baseline corpus. Clamp/width arithmetic identical to [[psiBins]]. */
  def psiBinCounts(df: DataFrame, valueCol: Column,
                   lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(hi > lo, "hi must exceed lo")
    val width = (hi - lo) / bins
    df.select(
        least(greatest(floor((valueCol.cast("double") - lit(lo)) / lit(width)),
          lit(0.0)), lit((bins - 1).toDouble)).cast("int").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
  }

  /** [[psiBins]] with the baseline side pre-binned (from
    * [[psiBinCounts]], possibly read back from a stored pipe). */
  def psiBinsFromCounts(baselineCounts: DataFrame, b: DataFrame,
                        valueCol: Column, lo: Double, hi: Double,
                        bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val spark = b.sparkSession
    val grid = spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(baselineCounts.select(col("bin"), col("cnt").as("ca")),
        Seq("bin"), "left")
      .join(psiBinCounts(b, valueCol, lo, hi, bins)
        .select(col("bin"), col("cnt").as("cb")), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val pa = (col("ca") + lit(1.0d)) / (sum(col("ca")).over(w) + lit(bins.toLong)).cast("double")
    val pb = (col("cb") + lit(1.0d)) / (sum(col("cb")).over(w) + lit(bins.toLong)).cast("double")
    grid.select(col("bin"), col("ca"), col("cb"),
        round((pa - pb) * log(pa / pb) * lit(1e6)).cast("long").as("term_micro"))
      .orderBy(col("bin"))
  }

  /** DuckDB oracle replaying [[psiBins]] — same clamp, same smoothing
    * shapes, same OVER () totals; `lo`/`width` interpolate from the SAME
    * doubles the Spark plan uses. */
  def psiBinsOracleSql(tableA: String, tableB: String, valueExpr: String,
                       lo: Double, hi: Double, bins: Int): String = {
    val width = (hi - lo) / bins
    def binned(t: String, cnt: String) =
      s"""SELECT CAST(least(greatest(floor((CAST($valueExpr AS DOUBLE) - $lo) / $width),
            0.0), ${(bins - 1).toDouble}) AS INT) AS bin, count(*) AS $cnt
          FROM $t GROUP BY 1"""
    s"""WITH ga AS (${binned(tableA, "ca")}),
       gb AS (${binned(tableB, "cb")}),
       grid AS (
         SELECT CAST(g.i AS INT) AS bin,
           CAST(coalesce(ga.ca, 0) AS BIGINT) AS ca,
           CAST(coalesce(gb.cb, 0) AS BIGINT) AS cb
         FROM (SELECT unnest(generate_series(0, ${bins - 1})) AS i) g
         LEFT JOIN ga ON ga.bin = g.i LEFT JOIN gb ON gb.bin = g.i),
       t AS (
         SELECT bin, ca, cb,
           (ca + 1.0) / CAST(sum(ca) OVER () + $bins AS DOUBLE) AS pa,
           (cb + 1.0) / CAST(sum(cb) OVER () + $bins AS DOUBLE) AS pb
         FROM grid)
       SELECT bin, ca, cb,
         CAST(round((pa - pb) * ln(pa / pb) * 1000000.0) AS BIGINT) AS term_micro
       FROM t ORDER BY bin"""
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic between two corpus
    * snapshots — the distribution-free drift monitor next to [[psiBins]]:
    * PSI needs a binning choice and washes out tail shifts narrower than
    * a bin; KS = max_v |F̂_a(v) − F̂_b(v)| is binning-free and exact over
    * the signal's ACTUAL value domain. One row out: (n_a, n_b, at_value,
    * ks_micro) — at_value locates the shift for the drill-down.
    *
    * Scale shape: both snapshots collapse to per-DISTINCT-VALUE counts
    * (a type-level table — the signalAuc bound: a monitored scalar's
    * domain is ≤ thousands of values, corpus-independent), full-outer
    * merge, ONE running-sum window over that bounded grid (allowlisted),
    * then a TakeOrdered(1) head. ECDFs are exact integer micro-units
    * (cum·10⁶ div n); no float anywhere. */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: Column): DataFrame =
    ksDriftFromCounts(ksValueCounts(a, valueCol), b, valueCol)

  /** Per-distinct-value counts — the KS baseline artifact: additive
    * (blind-append + one sum-fold ≡ recount), so a baseline snapshot can
    * persist as a pipe and later snapshots compare against the STORE
    * without re-reading the baseline corpus (the psi_drift_stored
    * shape). */
  def ksValueCounts(a: DataFrame, valueCol: Column): DataFrame = {
    Evaluation.requireDiscrete(a, valueCol, "ksValueCounts", allowString = false)
    a.select(valueCol.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("ca"))
  }

  /** [[ksDrift]] against a STORED baseline count table (v, ca). */
  def ksDriftFromCounts(baselineCounts: DataFrame, b: DataFrame,
                        valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Evaluation.requireDiscrete(b, valueCol, "ksDriftFromCounts", allowString = false)
    val ca = baselineCounts.select(col("v"), col("ca"))
    val cb = b.select(valueCol.cast("long").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cb"))
    val grid = ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .localCheckpoint(true)
    val tot = grid.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .select(col("v"), sum(col("ca")).over(w).as("cuma"),
        sum(col("cb")).over(w).as("cumb"))
      .crossJoin(broadcast(tot))
      .select(col("v").as("at_value"), col("na").as("n_a"),
        col("nb").as("n_b"),
        abs(expr("cuma * 1000000L div na") -
          expr("cumb * 1000000L div nb")).as("ks_micro"))
      .orderBy(col("ks_micro").desc, col("at_value").asc)
      .limit(1)
      .select(col("n_a"), col("n_b"), col("at_value"), col("ks_micro"))
  }

  /** DuckDB oracle replaying [[ksDrift]]. */
  def ksDriftOracleSql(tableA: String, tableB: String,
                       valueExpr: String): String =
    s"""WITH ca AS (SELECT CAST($valueExpr AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS ca FROM $tableA GROUP BY 1),
       cb AS (SELECT CAST($valueExpr AS BIGINT) AS v,
           CAST(count(*) AS BIGINT) AS cb FROM $tableB GROUP BY 1),
       grid AS (SELECT coalesce(ca.v, cb.v) AS v,
           coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
         FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
       tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                 CAST(sum(cb) AS BIGINT) AS nb FROM grid),
       cum AS (SELECT v,
           CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
           CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
         FROM grid)
       SELECT tot.na AS n_a, tot.nb AS n_b, cum.v AS at_value,
         abs(cum.cuma * 1000000 // tot.na -
             cum.cumb * 1000000 // tot.nb) AS ks_micro
       FROM cum, tot
       ORDER BY ks_micro DESC, at_value ASC LIMIT 1"""

  /** EWMA coefficient tables for [[ewmaChart]] — a pure function of
    * (α, maxLag), shared verbatim by the Spark projection and the
    * oracle's VALUES table so the per-term quantization cannot drift:
    * (lag j → c_j = round(10⁹·α(1−α)ʲ), cz_j = round(10⁹·(1−α)ʲ),
    * f_j = round(10⁶·√(α/(2−α)·(1−(1−α)²ʲ)))). */
  def ewmaCoefficients(alpha: Double,
                       maxLag: Int): Seq[(Int, Long, Long, Long)] =
    (0 to maxLag).map { j =>
      val d = math.pow(1.0 - alpha, j.toDouble)
      (j, math.round(1e9 * alpha * d), math.round(1e9 * d),
        math.round(1e6 * math.sqrt(alpha / (2.0 - alpha) *
          (1.0 - math.pow(1.0 - alpha, 2.0 * j)))))
    }

  /** EWMA control chart (Roberts 1959) over a BOUNDED daily series — the
    * small-persistent-shift monitor next to the spike detector
    * (q_daily_bursts reacts to one bad day; the EWMA accumulates a 1σ
    * drift the ±3σ rule never trips on): z_k = α·v_k + (1−α)·z_{k−1}
    * unrolled to an exact integer weighted sum over nano-quantized
    * coefficients (per-TERM quantization — order-independent longs, the
    * char-entropy discipline), with the k-dependent control-limit factor
    * precomputed in the same table. σ is the sample std of the series —
    * ONE float stage; everything k-varying is integer arithmetic.
    *
    * Scale: the series is a calendar-bounded grid (≤ maxLag rows —
    * enforced by a distributed raise_error guard on the rank column: a
    * longer series would otherwise silently diverge between engines,
    * Spark's element_at returning NULL z while the oracle's coefficient
    * join drops the term); the i ≤ k unroll is a grid² broadcast join;
    * one allowlisted rank window indexes the grid. */
  def ewmaChart(series: DataFrame, orderCol: String, valueCol: String,
                alpha: Double = 0.3, l: Int = 3, baselineK: Int = 10,
                maxLag: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(alpha > 0 && alpha < 1, "alpha in (0, 1)")
    val coefs = ewmaCoefficients(alpha, maxLag)
    val cArr = typedLit(coefs.map(_._2).toArray)
    val czArr = typedLit(coefs.map(_._3).toArray)
    val fArr = typedLit(coefs.map(_._4).toArray)
    val g = series.select(col(orderCol).cast("long").as("t"),
        col(valueCol).cast("long").as("v"))
      .withColumn("k", row_number().over(Window.orderBy(col("t"))))
      // enforce the coefficient-table bound IN the plan (no extra job):
      // rank beyond maxLag means element_at would read past the table
      .withColumn("k", when(col("k") > lit(maxLag),
          raise_error(concat(lit(s"ewmaChart: series longer than maxLag=$maxLag rows (row "),
            col("k").cast("string"), lit(")"))))
        .otherwise(col("k")))
      .localCheckpoint(true)
    // Phase-I limits: mu and sigma from the first `baselineK` IN-CONTROL
    // points — estimating them from the monitored series itself would let
    // a large sustained shift inflate sigma and swallow its own alarm
    val n = g.where(col("k") <= baselineK)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("sq"))
    // z_k (nano) = Σ_{i≤k} c_{k−i}·v_i + cz_k·v_1  (z_0 = first obs)
    val first = g.where(col("k") === 1).select(col("v").as("v1"))
    val zs = g.select(col("k").as("kk"))
      .join(broadcast(g.select(col("k").as("i"), col("v").as("vi"))),
        col("i") <= col("kk"))
      .select(col("kk"),
        (element_at(cArr, col("kk") - col("i") + 1) * col("vi")).as("term"))
      .groupBy(col("kk")).agg(sum(col("term")).as("zsum"))
    g.join(zs, col("k") === col("kk"))
      .crossJoin(broadcast(first))
      .crossJoin(broadcast(n))
      .withColumn("__cz", element_at(czArr, col("k") + 1))
      .withColumn("__f", element_at(fArr, col("k") + 1))
      .withColumn("z_micro", expr("(zsum + __cz * v1) div 1000"))
      .withColumn("mean_micro", expr("sv * 1000000L div n"))
      .withColumn("sigma_micro",
        round(sqrt((col("n") * col("sq") - col("sv") * col("sv"))
          .cast("double") /
          (col("n") * (col("n") - 1)).cast("double")) * lit(1e6))
          .cast("long"))
      .withColumn("half",
        expr(s"$l * sigma_micro * __f div 1000000L"))
      .select(col("t"), col("v"), col("z_micro").as("ewma_micro"),
        (col("mean_micro") + col("half")).as("ucl_micro"),
        (col("mean_micro") - col("half")).as("lcl_micro"),
        (col("z_micro") > col("mean_micro") + col("half") ||
          col("z_micro") < col("mean_micro") - col("half")).as("flag"))
  }

  /** DuckDB oracle replaying [[ewmaChart]]; `seriesSql` yields (t, v).
    * The coefficient table inlines the SAME [[ewmaCoefficients]] values
    * the Spark projection carries. */
  def ewmaChartOracleSql(seriesSql: String, alpha: Double = 0.3,
                         l: Int = 3, baselineK: Int = 10,
                         maxLag: Int = 128): String = {
    val values = ewmaCoefficients(alpha, maxLag).map { case (j, c, cz, f) =>
      s"($j, CAST($c AS BIGINT), CAST($cz AS BIGINT), CAST($f AS BIGINT))"
    }.mkString(", ")
    s"""WITH g0 AS ($seriesSql),
       g AS (SELECT CAST(t AS BIGINT) AS t, CAST(v AS BIGINT) AS v,
               CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS k
             FROM g0),
       co (j, c, cz, f) AS (VALUES $values),
       nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(v) AS BIGINT) AS sv,
                CAST(sum(v * v) AS BIGINT) AS sq
              FROM g WHERE k <= $baselineK),
       v1 AS (SELECT v AS v1 FROM g WHERE k = 1),
       zs AS (SELECT gk.k, CAST(sum(co.c * gi.v) AS BIGINT) AS zsum
              FROM g gk JOIN g gi ON gi.k <= gk.k
                        JOIN co ON co.j = gk.k - gi.k
              GROUP BY 1),
       base AS (SELECT g.t, g.v, g.k, zs.zsum, ck.cz, ck.f, v1.v1,
                  nn.n, nn.sv, nn.sq,
                  (zs.zsum + ck.cz * v1.v1) // 1000 AS z_micro,
                  sv * 1000000 // n AS mean_micro,
                  CAST(round(sqrt(CAST(nn.n * nn.sq - nn.sv * nn.sv
                      AS DOUBLE) / (nn.n * (nn.n - 1))) * 1000000.0)
                    AS BIGINT) AS sigma_micro
                FROM g JOIN zs ON zs.k = g.k
                       JOIN co ck ON ck.j = g.k, v1, nn)
       SELECT t, v, CAST(z_micro AS BIGINT) AS ewma_micro,
         CAST(mean_micro + $l * sigma_micro * f // 1000000 AS BIGINT)
           AS ucl_micro,
         CAST(mean_micro - $l * sigma_micro * f // 1000000 AS BIGINT)
           AS lcl_micro,
         (z_micro > mean_micro + $l * sigma_micro * f // 1000000 OR
          z_micro < mean_micro - $l * sigma_micro * f // 1000000) AS flag
       FROM base ORDER BY t"""
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two non-negative
    * integer keys — the multi-dimensional clustering key behind
    * data-layout optimization: sorting/range-partitioning a table by
    * z(a, b) co-locates rows close in BOTH dimensions, so min/max row-group
    * stats prune scans filtered on EITHER column (the Delta/Iceberg
    * OPTIMIZE ZORDER layout, reduced to one exact expression). Pure
    * codegen'd bit arithmetic — unrolled shifts, no UDF; write-path usage
    * is `df.repartitionByRange($"z").sortWithinPartitions($"z")`.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val am = pmod(a.cast("long"), lit(1L << bits))
    val bm = pmod(b.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB oracle expression for [[zValue]] over SQL sub-expressions `a`
    * and `b` (non-negative) — the identical unrolled interleave. */
  def zValueOracleExpr(a: String, b: String, bits: Int = 16): String = {
    val m = 1L << bits
    (0 until bits).map { i =>
      s"((((($a) % $m) >> $i) & 1) << ${2 * i}) + ((((($b) % $m) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
  }

  /** DuckDB oracle replaying [[histogram]] with the bounds re-derived in
    * SQL and the identical bin arithmetic. */
  def histogramOracleSql(table: String, c: String, bins: Int): String =
    s"""WITH b AS (SELECT min(CAST($c AS DOUBLE)) AS lo, max(CAST($c AS DOUBLE)) AS hi FROM $table),
       h AS (
         SELECT CAST(CASE WHEN hi = lo THEN 0
             ELSE least(floor((CAST($c AS DOUBLE) - lo) / ((hi - lo) / $bins)), $bins - 1) END AS INT) AS bin,
           count(*) AS cnt
         FROM $table, b WHERE $c IS NOT NULL GROUP BY 1)
       SELECT bin, CAST(lo + bin * ((hi - lo) / $bins) AS DOUBLE) AS bin_lo, cnt
       FROM h, b ORDER BY bin"""

  /** DuckDB oracle replaying [[profile]] as one UNION ALL branch per column. */
  def profileOracleSql(table: String, cols: Seq[(String, Boolean)]): String =
    cols.map { case (c, isNum) =>
      val (mn, mx, mns, mxs) =
        if (isNum) (s"CAST(min($c) AS DOUBLE)", s"CAST(max($c) AS DOUBLE)",
                    "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
              s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
      s"""SELECT '$c' AS col_name, CAST(count($c) AS BIGINT) AS n_nonnull,
         CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         $mn AS min_num, $mx AS max_num, $mns AS min_str, $mxs AS max_str
         FROM $table"""
    }.mkString(" UNION ALL ") + " ORDER BY col_name"

  /** Data-quality assertion report (the expectations-suite shape): each
    * rule is a named VIOLATION predicate evaluated on the scan; the report
    * is one row per rule — violation count and exact micro-unit rate.
    * Pass `uniqueKey` to add a `duplicate_key:<cols>` rule counting rows
    * in excess of the distinct key count (the primary-key check, which a
    * scan predicate cannot express).
    *
    * Scale: ONE aggregate pass for every scan rule (|rules| longs per
    * reducer); the optional uniqueness rule adds the count-distinct
    * expand. The per-rule rows explode from the single aggregated row.
    * The release gate before a corpus ships: every count integral, rates
    * one division at the end. */
  def dqChecks(df: DataFrame, rules: Seq[(String, Column)],
               uniqueKey: Option[Seq[String]] = None): DataFrame = {
    require(rules.nonEmpty || uniqueKey.nonEmpty, "at least one rule")
    val aggs = (count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).as(s"__v$i")
      }) ++ uniqueKey.map(ks =>
        (count(lit(1)) - countDistinct(col(ks.head), ks.tail.map(col): _*))
          .as("__vdup")).toSeq
    val one = df.agg(aggs.head, aggs.tail: _*)
    val ruleRows = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v$i").as("n_violations"))
    } ++ uniqueKey.map(ks =>
      struct(lit(s"duplicate_key:${ks.mkString(",")}").as("rule"),
        col("__vdup").as("n_violations"))).toSeq
    one.select(col("__n"), explode(array(ruleRows: _*)).as("r"))
      .select(col("r.rule").as("rule"),
        col("r.n_violations").as("n_violations"),
        col("__n").as("n_rows"),
        when(col("__n") > 0,
          expr("r.n_violations * 1000000L div __n"))
          .otherwise(lit(null).cast("long")).as("violation_micro"))
  }

  /** Per-GROUP exact percentile report — the ANALYZE distribution surface
    * keyed by a dimension (the global [[histogram]] bins one column; this
    * answers "what does value p50/p90 look like per event type / per
    * source"). Spark's exact `percentile` aggregate uses the same linear
    * interpolation as ANSI `quantile_cont`/`percentile_cont`, so the
    * report replays bit-for-bit. ONE grouped aggregate; output |groups|
    * rows. At 100 TB swap in `approx_percentile` per the documented
    * profile() convention. */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: String,
                       ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "ps in [0,1]")
    val aggs = Seq(
      count(col(valueCol)).as("n"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v")) ++
      ps.map(p => percentile(col(valueCol), lit(p))
        .as(s"p${(p * 100).round}"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB oracle replaying [[groupPercentiles]]. */
  def groupPercentilesOracleSql(table: String, groupCol: String,
                                valueCol: String, ps: Seq[Double]): String = {
    val qs = ps.map(p =>
      s"quantile_cont($valueCol, $p) AS p${(p * 100).round}").mkString(", ")
    s"""SELECT $groupCol, CAST(count($valueCol) AS BIGINT) AS n,
       min($valueCol) AS min_v, max($valueCol) AS max_v, $qs
       FROM $table GROUP BY $groupCol ORDER BY $groupCol"""
  }

  /** Robust per-group OUTLIER worklist — median/MAD (Hampel): flag rows
    * with |x − median| > k·MAD of their group. The mean/σ z-score breaks
    * down exactly when outliers are present (they inflate σ); the median
    * absolute deviation resists up to 50% contamination, making this the
    * ANALYZE-grade gate for reward spikes, latency anomalies, and sensor
    * glitches. MAD = 0 (a majority-constant group) flags ANY deviation —
    * strict `>` keeps the constant rows themselves clean.
    *
    * Exactness: Spark's exact `percentile` ≡ ANSI `quantile_cont`
    * ([[groupPercentiles]]'s parity), deviations are |long − double| with
    * identical IEEE results, and the worklist caps under the
    * (deviation DESC, group, id) total order. Scale: two grouped exact
    * percentiles + one join back (AQE broadcasts the |groups|-row medians
    * when small); at 100 TB swap `approx_percentile` per the documented
    * profile() convention. */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, kMicro: Long, cap: Int): DataFrame = {
    require(kMicro >= 0L && cap >= 1, "bad MAD parameters")
    val kD = kMicro.toDouble / 1e6
    val med = df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.5)).as("med"))
    val dev = df.select(col(groupCol), col(idCol), col(valueCol))
      .join(med, Seq(groupCol))
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(col("dev"), lit(0.5)).as("mad"))
    dev.join(mad, Seq(groupCol))
      .where(col("dev") > lit(kD) * col("mad"))
      .select(col(groupCol), col(idCol), col(valueCol), col("med"),
        col("mad"), col("dev"))
      .orderBy(col("dev").desc, col(groupCol), col(idCol))
      .limit(cap)
  }

  /** DuckDB oracle replaying [[madOutliers]]. */
  def madOutliersOracleSql(table: String, groupCol: String, idCol: String,
                           valueExpr: String, valueName: String,
                           kMicro: Long, cap: Int): String = {
    val kD = kMicro.toDouble / 1e6
    s"""WITH src AS (SELECT $groupCol AS grp, $idCol AS id,
           CAST($valueExpr AS BIGINT) AS v FROM $table),
       m AS (SELECT grp, quantile_cont(v, 0.5) AS med FROM src GROUP BY 1),
       d AS (SELECT src.grp, src.id, src.v, m.med, abs(src.v - m.med) AS dev
             FROM src JOIN m USING (grp)),
       md AS (SELECT grp, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
       SELECT d.grp AS $groupCol, d.id AS $idCol, d.v AS $valueName,
         d.med, md.mad, d.dev
       FROM d JOIN md USING (grp)
       WHERE d.dev > $kD * md.mad
       ORDER BY d.dev DESC, d.grp, d.id LIMIT $cap"""
  }

  /** Derived-index STALENESS report — the ops check for every stored
    * index (band/cell/postings pipes): which corpus ids are MISSING from
    * the index (a sync that never ran), and which index ids are ORPHANED
    * (their source rows were cleared/dropped after indexing). Two
    * anti-joins on the id; both sides reduce to distinct ids before the
    * join, so the report costs id-column scans regardless of index width.
    * The empty report is the precondition for trusting any stored-probe
    * answer. */
  def indexStaleness(corpusIds: DataFrame, indexIds: DataFrame,
                     idCol: String): DataFrame = {
    val c = corpusIds.select(col(idCol)).distinct()
    val i = indexIds.select(col(idCol)).distinct()
    c.join(i, Seq(idCol), "left_anti")
      .select(col(idCol), lit("missing").as("status"))
      .unionByName(i.join(c, Seq(idCol), "left_anti")
        .select(col(idCol), lit("orphaned").as("status")))
  }

  /** DuckDB oracle replaying [[dqChecks]] — the same single-pass sums,
    * per-rule rows via UNION ALL. Each rule is (name, SQL predicate). */
  def dqChecksOracleSql(table: String, rules: Seq[(String, String)],
                        uniqueKey: Option[Seq[String]] = None): String = {
    val sums = (s"CAST(count(*) AS BIGINT) AS __n" +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        s"CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS __v$i"
      }) ++ uniqueKey.map(ks =>
        s"CAST(count(*) - count(DISTINCT (${ks.mkString(", ")})) AS BIGINT) AS __vdup").toSeq
    val rows = rules.zipWithIndex.map { case ((name, _), i) =>
      s"SELECT '${name.replace("'", "''")}' AS rule, __v$i AS n_violations, __n AS n_rows FROM one"
    } ++ uniqueKey.map(ks =>
      s"SELECT 'duplicate_key:${ks.mkString(",")}' AS rule, __vdup AS n_violations, __n AS n_rows FROM one").toSeq
    s"""WITH one AS (SELECT ${sums.mkString(",\n         ")} FROM $table),
       r AS (${rows.mkString("\n         UNION ALL ")})
       SELECT rule, n_violations, n_rows,
         CASE WHEN n_rows > 0 THEN n_violations * 1000000 // n_rows END AS violation_micro
       FROM r ORDER BY rule"""
  }
}
