package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality / frequency SKETCHES — the bounded-state summaries a 100 TB
  * monitoring plane runs on: HyperLogLog distinct estimation (Flajolet et
  * al. 2007), KMV / bottom-k distinct estimation (Bar-Yossef et al. 2002),
  * count-min frequency sketching (Cormode & Muthukrishnan 2005), and the
  * exact heavy-hitter baseline they calibrate against. The motivating
  * questions: "how many distinct shingles will the MinHash index hold?"
  * (sizes the band store before a corpus-wide dedup), "how hot is this
  * token?" (without a |vocab| table per monitoring tick).
  *
  * Every sketch is DETERMINISTIC — all randomness comes from the shared
  * truncated-md5 hash ([[graft.functions.TextFns.md5Long60]]'s discipline) —
  * so a DuckDB oracle replays each register/counter bit-for-bit. And every
  * sketch is MERGEABLE (HLL registers fold by max, KMV by union∘bottom-k,
  * CMS counters by sum), so each doubles as a STORED derived pipe: batches
  * blind-append their own sketch rows and the fold over the store equals a
  * full-corpus rebuild without re-reading text. That additivity is the 100
  * TB story: the corpus is touched once per batch, the stored state is
  * O(m), O(k), or O(d·w) rows — configuration, not data.
  *
  * All operators take a prepared one-column relation `vals(v: string)` —
  * see [[tokenValues]] / [[shingleValues]] — so the same sketch runs over
  * tokens, shingles, URLs, or ids without re-plumbing.
  *
  * Reference connection: Meerschaum's monitoring surface stops at exact
  * rowcounts (`meerschaum/core/Pipe/_data.py` get_rowcount); these are the
  * sublinear-state equivalents its scale never needed.
  */
object Sketches {

  /** Rank cap: leading-zero ranks clamp to [1, 40] so the fold-side
    * 2^(40−rank) terms stay exact longs (Σ ≤ m·2^40 « 2^63). Clamping is
    * part of the sketch definition — both engines apply it identically —
    * and rank 40 needs 39 leading zero bits in a 60-bit hash: unreachable
    * below ~2^39 distinct values, i.e. never binding at these estimands. */
  private val RankCap = 40
  private val Two60 = "1152921504606846976.0" // 2^60 as an exact double literal

  private def hexDigits(p: Int): Int = {
    require(p % 4 == 0 && p >= 4 && p <= 16, "p must be a multiple of 4 in [4,16]")
    p / 4
  }

  // ── value preparers (Spark side + the DuckDB CTE replaying each) ──────

  /** Lowercased whitespace tokens — the unit shared with the vocab / Zipf /
    * frequency-spectrum pipelines. */
  def tokenValues(docs: DataFrame, textCol: String): DataFrame = {
    import graft.functions.TextFns
    docs.select(explode(TextFns.tokens(lower(col(textCol)))).as("v"))
      .where(length(col("v")) > 0)
  }

  /** DuckDB CTE chain defining `vals(v)` as [[tokenValues]]. */
  def tokenValuesSql(table: String, textCol: String): String =
    s"""tok AS (
         SELECT unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS v
         FROM $table),
       vals AS (SELECT v FROM tok WHERE length(v) > 0)"""

  /** Word n-gram shingles (trimmed, case-preserving) — the MinHash unit,
    * so an HLL/KMV estimate over these sizes the band index a dedup run
    * is about to build. */
  def shingleValues(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    import graft.functions.TextFns
    docs.select(explode(TextFns.wordShingles(trim(col(textCol)), n)).as("v"))
  }

  /** DuckDB CTE chain defining `vals(v)` as [[shingleValues]] — the same
    * generate_series slice-join the MinHash oracles use. */
  def shingleValuesSql(table: String, textCol: String, n: Int): String =
    s"""tok AS (SELECT string_split_regex(trim($textCol), '\\s+') AS t FROM $table),
       vals AS (SELECT unnest(CASE WHEN len(t) < $n THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(t) - ${n - 1}),
                         i -> array_to_string(t[i:i+${n - 1}], ' ')) END) AS v
                FROM tok)"""

  // ── HyperLogLog ───────────────────────────────────────────────────────

  /** HLL register rows for one batch: (register, rank), ≤ m = 2^p rows.
    * register = first p bits of md5(v); rank = leading-zeros+1 of the NEXT
    * 60 bits, capped at [[RankCap]]. Duplicates need no distinct pass:
    * rank is a pure function of the value and registers keep the max, so
    * ONE map-side-combined aggregate collapses the input directly. */
  def hllRegisters(vals: DataFrame, p: Int,
                   extraKeys: Seq[String] = Seq.empty): DataFrame = {
    val hx = hexDigits(p)
    val reg = conv(substring(md5(col("v")), 1, hx), 16, 10).cast("int")
    // 15 hex chars = 60 bits of rank material, disjoint from the register bits
    val w = conv(substring(md5(col("v")), hx + 1, 15), 16, 10).cast("long")
    // extraKeys: optional leading group columns — one call builds the
    // register tables of MANY sketches (per pipe, per batch, per test case)
    // in the same map-side-combined pass
    vals.select(extraKeys.map(col) ++ Seq(reg.as("register"), w.as("w")): _*)
      // the rank ladder is the SAME generated CASE text the oracle runs
      .select(extraKeys.map(col) ++
        Seq(col("register"), expr(rankCaseSql).cast("int").as("rank")): _*)
      .groupBy((extraKeys :+ "register").map(col): _*)
      .agg(max(col("rank")).as("rank"))
  }

  /** [[hllRegisters]] over word n-gram shingles as ONE generated scan
    * pass — the incremental-index build path, where each batch pays a
    * full shingle explode + md5 per shingle just to feed 2^p registers.
    * The native kernel ([[graft.expressions.HllRegRanks]]) md5s each
    * shingle once from raw digest bytes (no hex string, no decimal
    * `conv`), keeps the per-DOCUMENT max rank per register in a byte
    * table, and emits ≤ min(shingles, 2^p) packed rows per doc — so the
    * explode and the register shuffle shrink together. Bit-identical to
    * `hllRegisters(shingleValues(docs, textCol, n), p)` (parity
    * unit-asserted) and replayed by the same oracle. */
  def hllShingleRegisters(docs: DataFrame, textCol: String, n: Int,
                          p: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val _ = hexDigits(p) // validate p
    val packed = GraftColumnBridge.column(graft.expressions.HllRegRanks(
      GraftColumnBridge.expression(
        graft.functions.TextFns.tokens(col(textCol))),
      n, p, RankCap))
    docs.select(explode(packed).as("pk"))
      .select(shiftright(col("pk"), 6).cast("int").as("register"),
        col("pk").bitwiseAND(lit(63L)).cast("int").as("rank"))
      .groupBy(col("register")).agg(max(col("rank")).as("rank"))
  }

  /** Fold stored per-batch register rows back to one register table —
    * max is idempotent and commutative, so fold ≡ rebuild. */
  def hllFold(registers: DataFrame,
              extraKeys: Seq[String] = Seq.empty): DataFrame =
    registers.groupBy((extraKeys :+ "register").map(col): _*)
      .agg(max(col("rank")).as("rank"))

  /** One-row HLL estimate from a register table: m, zero-register count V,
    * the EXACT integer harmonic-sum numerator S40 = Σ_j 2^(40−M_j)
    * (empty registers contribute 2^40), the raw estimate
    * E = α_m·m²·2^40/S40 (floor-micro; pure arithmetic over exact longs —
    * bit-portable), the linear-counting estimate m·ln(m/V) (round-micro;
    * the one transcendental, quantized like every micro-nat in this repo),
    * and the standard corrected choice (linear when E ≤ 2.5m and V > 0). */
  def hllEstimate(registers: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val base = registers.agg(
      count(lit(1)).as("filled"),
      sum(expr(s"shiftleft(1L, $RankCap - rank)")).as("sfill"))
    base.select(
        lit(m).cast("long").as("m"),
        (lit(m.toLong) - col("filled")).as("v_zero"),
        (coalesce(col("sfill"), lit(0L))
          + (lit(m.toLong) - col("filled")) * (1L << RankCap)).as("s40"))
      .withColumn("raw_est_micro", expr(
        s"CAST(FLOOR((0.7213D / (1.0D + 1.079D / $m.0D)) * $m.0D * $m.0D" +
          s" * ${1L << RankCap}.0D / CAST(s40 AS DOUBLE) * 1000000.0D) AS BIGINT)"))
      .withColumn("lin_est_micro", expr(
        s"CASE WHEN v_zero > 0 THEN CAST(ROUND($m.0D * LN($m.0D / CAST(v_zero AS DOUBLE))" +
          s" * 1000000.0D) AS BIGINT) END"))
      .withColumn("est_micro", expr(
        s"CASE WHEN v_zero > 0 AND raw_est_micro <= ${(2.5 * m * 1e6).toLong}L" +
          s" THEN lin_est_micro ELSE raw_est_micro END"))
  }

  /** HLL end-to-end over a prepared values relation: registers → estimate. */
  def hllDistinct(vals: DataFrame, p: Int): DataFrame =
    hllEstimate(hllRegisters(vals, p), p)

  /** [[tokenValues]] keyed by a group column — `vals(grp, v)` for the
    * per-group sketches (distinct vocabulary per source/language/day). */
  def tokenValuesByGroup(docs: DataFrame, groupCol: String,
                         textCol: String): DataFrame = {
    import graft.functions.TextFns
    docs.select(col(groupCol).as("grp"),
        explode(TextFns.tokens(lower(col(textCol)))).as("v"))
      .where(length(col("v")) > 0)
  }

  /** DuckDB CTE chain defining `vals(grp, v)` as [[tokenValuesByGroup]]. */
  def tokenValuesByGroupSql(table: String, groupExpr: String,
                            textCol: String): String =
    s"""tok AS (
         SELECT $groupExpr AS grp,
           unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS v
         FROM $table),
       vals AS (SELECT grp, v FROM tok WHERE length(v) > 0)"""

  /** Per-GROUP HLL estimates from a grouped register table
    * ([[hllRegisters]] with `extraKeys = Seq(groupCol)`) — one sketch per
    * group in one pass, the "distinct users/vocab per source" production
    * staple. Same estimator arithmetic as [[hllEstimate]] per group;
    * output is |groups| rows, state |groups|·2^p register rows (stored
    * shape: the grouped registers fold by max exactly like the global
    * ones — [[hllFold]] with the same extraKeys). */
  def hllEstimateByGroup(registers: DataFrame, p: Int,
                         groupCol: String = "grp"): DataFrame = {
    val m = 1 << p
    registers.groupBy(col(groupCol))
      .agg(count(lit(1)).as("filled"),
        sum(expr(s"shiftleft(1L, $RankCap - rank)")).as("sfill"))
      .select(col(groupCol),
        lit(m).cast("long").as("m"),
        (lit(m.toLong) - col("filled")).as("v_zero"),
        (coalesce(col("sfill"), lit(0L))
          + (lit(m.toLong) - col("filled")) * (1L << RankCap)).as("s40"))
      .withColumn("raw_est_micro", expr(
        s"CAST(FLOOR((0.7213D / (1.0D + 1.079D / $m.0D)) * $m.0D * $m.0D" +
          s" * ${1L << RankCap}.0D / CAST(s40 AS DOUBLE) * 1000000.0D) AS BIGINT)"))
      .withColumn("lin_est_micro", expr(
        s"CASE WHEN v_zero > 0 THEN CAST(ROUND($m.0D * LN($m.0D / CAST(v_zero AS DOUBLE))" +
          s" * 1000000.0D) AS BIGINT) END"))
      .withColumn("est_micro", expr(
        s"CASE WHEN v_zero > 0 AND raw_est_micro <= ${(2.5 * m * 1e6).toLong}L" +
          s" THEN lin_est_micro ELSE raw_est_micro END"))
  }

  /** DuckDB oracle replaying the grouped build →
    * [[hllEstimateByGroup]]. `valsSql` defines `vals(grp, v)`
    * ([[tokenValuesByGroupSql]]). */
  def hllByGroupOracleSql(valsSql: String, p: Int): String = {
    val hx = hexDigits(p)
    val m  = 1 << p
    s"""WITH $valsSql,
       h AS (SELECT grp,
               CAST(('0x' || substring(md5(v), 1, $hx)) AS BIGINT) AS register,
               CAST(('0x' || substring(md5(v), ${hx + 1}, 15)) AS BIGINT) AS w
             FROM vals),
       regs AS (SELECT grp, register, max($rankCaseSql) AS rank
                FROM h GROUP BY grp, register),
       base AS (SELECT grp, CAST(count(*) AS BIGINT) AS filled,
                  CAST(sum(CAST(1 AS BIGINT) << ($RankCap - rank)) AS BIGINT) AS sfill
                FROM regs GROUP BY grp),
       est AS (SELECT grp, CAST($m AS BIGINT) AS m,
                 $m - filled AS v_zero,
                 coalesce(sfill, 0) + ($m - filled) * ${1L << RankCap} AS s40
               FROM base),
       r AS (SELECT grp, m, v_zero, s40,
               CAST(FLOOR((0.7213 / (1.0 + 1.079 / $m.0)) * $m.0 * $m.0
                 * ${1L << RankCap}.0 / CAST(s40 AS DOUBLE) * 1000000.0) AS BIGINT)
                 AS raw_est_micro,
               CASE WHEN v_zero > 0
                 THEN CAST(ROUND($m.0 * LN($m.0 / CAST(v_zero AS DOUBLE))
                   * 1000000.0) AS BIGINT) END AS lin_est_micro
             FROM est)
       SELECT grp, m, v_zero, s40, raw_est_micro, lin_est_micro,
         CASE WHEN v_zero > 0 AND raw_est_micro <= ${(2.5 * m * 1e6).toLong}
           THEN lin_est_micro ELSE raw_est_micro END AS est_micro
       FROM r ORDER BY grp"""
  }

  private def rankCaseSql: String =
    (1 until RankCap).map(k => s"WHEN w >= ${1L << (60 - k)} THEN $k")
      .mkString("CASE ", " ", s" ELSE $RankCap END")

  /** DuckDB oracle replaying [[hllDistinct]] — identical register/rank
    * extraction from the same md5 hex digits, identical ladder, identical
    * floor/round micro arithmetic. `valsSql` is a CTE chain defining
    * `vals(v)` ([[tokenValuesSql]] / [[shingleValuesSql]]). */
  def hllDistinctOracleSql(valsSql: String, p: Int): String = {
    val hx = hexDigits(p)
    val m  = 1 << p
    s"""WITH $valsSql,
       h AS (SELECT CAST(('0x' || substring(md5(v), 1, $hx)) AS BIGINT) AS register,
               CAST(('0x' || substring(md5(v), ${hx + 1}, 15)) AS BIGINT) AS w
             FROM vals),
       regs AS (SELECT register, max($rankCaseSql) AS rank FROM h GROUP BY register),
       base AS (SELECT CAST(count(*) AS BIGINT) AS filled,
                  CAST(sum(CAST(1 AS BIGINT) << ($RankCap - rank)) AS BIGINT) AS sfill
                FROM regs),
       est AS (SELECT CAST($m AS BIGINT) AS m,
                 $m - filled AS v_zero,
                 coalesce(sfill, 0) + ($m - filled) * ${1L << RankCap} AS s40
               FROM base),
       r AS (SELECT m, v_zero, s40,
               CAST(FLOOR((0.7213 / (1.0 + 1.079 / $m.0)) * $m.0 * $m.0
                 * ${1L << RankCap}.0 / CAST(s40 AS DOUBLE) * 1000000.0) AS BIGINT)
                 AS raw_est_micro,
               CASE WHEN v_zero > 0
                 THEN CAST(ROUND($m.0 * LN($m.0 / CAST(v_zero AS DOUBLE))
                   * 1000000.0) AS BIGINT) END AS lin_est_micro
             FROM est)
       SELECT m, v_zero, s40, raw_est_micro, lin_est_micro,
         CASE WHEN v_zero > 0 AND raw_est_micro <= ${(2.5 * m * 1e6).toLong}
           THEN lin_est_micro ELSE raw_est_micro END AS est_micro
       FROM r"""
  }

  // ── KMV / bottom-k ────────────────────────────────────────────────────

  /** KMV sketch for one batch: the k smallest DISTINCT 60-bit value
    * hashes. Scale: one |distinct|-sized map-side-combined distinct, then
    * TakeOrdered — no global sort ever materializes. */
  def kmvSketch(vals: DataFrame, k: Int): DataFrame = {
    import graft.functions.TextFns
    require(k >= 2, "k must be at least 2")
    vals.select(TextFns.md5Long60(col("v")).as("hash"))
      .distinct()
      .orderBy(col("hash")).limit(k)
  }

  /** Fold stored per-batch KMV rows: union → distinct → bottom-k. The
    * bottom-k of a union equals the bottom-k of the full corpus whenever
    * each batch contributed ITS bottom-k — fold ≡ rebuild. */
  def kmvFold(sketch: DataFrame, k: Int): DataFrame =
    sketch.select(col("hash")).distinct().orderBy(col("hash")).limit(k)

  /** One-row KMV estimate: with n = |sketch| hashes and h_k the largest,
    * the distinct-count estimate is (k−1)·2^60/h_k when the sketch is full
    * (n = k), and exactly n when the input had fewer than k distinct
    * values. Deterministic double arithmetic over exact longs, floor-micro. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n_hashes"), max(col("hash")).as("kth_hash"))
      .select(lit(k).cast("long").as("k"), col("n_hashes"), col("kth_hash"),
        expr(s"CASE WHEN n_hashes < $k THEN n_hashes * 1000000L" +
          s" ELSE CAST(FLOOR(${k - 1}.0D * $Two60 / CAST(kth_hash AS DOUBLE)" +
          s" * 1000000.0D) AS BIGINT) END").as("est_micro"))

  /** DuckDB oracle replaying [[kmvEstimate]]∘[[kmvSketch]]. */
  def kmvDistinctOracleSql(valsSql: String, k: Int): String =
    s"""WITH $valsSql,
       h AS (SELECT DISTINCT CAST(('0x' || substring(md5(v), 1, 15)) AS BIGINT) AS hash
             FROM vals),
       sk AS (SELECT hash FROM h ORDER BY hash LIMIT $k),
       a AS (SELECT CAST(count(*) AS BIGINT) AS n_hashes, max(hash) AS kth_hash FROM sk)
       SELECT CAST($k AS BIGINT) AS k, n_hashes, kth_hash,
         CASE WHEN n_hashes < $k THEN n_hashes * 1000000
           ELSE CAST(FLOOR(${k - 1}.0 * $Two60 / CAST(kth_hash AS DOUBLE)
             * 1000000.0) AS BIGINT) END AS est_micro
       FROM a"""

  // ── count-min sketch ──────────────────────────────────────────────────

  /** Count-min counter rows for one batch: (row, counter, cnt) over d
    * hash rows × w counters. Hash row i uses md5("i:" ++ v) — the
    * seeded-md5 family every banded pipeline here draws from. Scale: the
    * value explode fans out ×d, then ONE map-side-combined aggregate
    * collapses to ≤ d·w rows (configuration, not data). */
  def cmsCounters(vals: DataFrame, d: Int, w: Int,
                  extraKeys: Seq[String] = Seq.empty): DataFrame = {
    require(d >= 1 && w >= 2, "need d >= 1 hash rows and w >= 2 counters")
    val cells = (0 until d).map { i =>
      struct(lit(i).as("row"),
        (conv(substring(md5(concat(lit(s"$i:"), col("v"))), 1, 15), 16, 10)
          .cast("long") % w).as("counter"))
    }
    vals.select(extraKeys.map(col) :+ explode(array(cells: _*)).as("c"): _*)
      .groupBy(extraKeys.map(col) ++
        Seq(col("c.row").as("row"), col("c.counter").as("counter")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold stored per-batch counters: counts are additive — fold ≡ rebuild. */
  def cmsFold(counters: DataFrame,
              extraKeys: Seq[String] = Seq.empty): DataFrame =
    counters.groupBy((extraKeys ++ Seq("row", "counter")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query a counter table for literal probe terms: the count-min
    * estimate is min over the d rows (each an upward-biased counter), with
    * the exact count from `vals` joined alongside so the report shows the
    * sketch's overestimate directly. Probe terms ride as one array
    * literal; untouched counters read as 0 (a term the sketch never saw
    * can still collide upward — that is the bias being measured). */
  def cmsPointReport(counters: DataFrame, vals: DataFrame,
                     terms: Seq[String], d: Int, w: Int): DataFrame = {
    require(terms.nonEmpty, "at least one probe term")
    val spark = counters.sparkSession
    val probe = spark.range(1).select(explode(typedlit(terms)).as("term"))
    val cells = (0 until d).map { i =>
      struct(lit(i).as("row"),
        (conv(substring(md5(concat(lit(s"$i:"), col("term"))), 1, 15), 16, 10)
          .cast("long") % w).as("counter"))
    }
    val probeCells = probe.select(col("term"), explode(array(cells: _*)).as("c"))
      .select(col("term"), col("c.row").as("row"), col("c.counter").as("counter"))
    // both sides are bounded: |terms|·d probe rows against ≤ d·w counter
    // rows — broadcast the counter table (right side of the left join)
    val est = probeCells.join(broadcast(counters), Seq("row", "counter"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    val exact = vals.groupBy(col("v")).agg(count(lit(1)).as("exact"))
    est.join(exact.withColumnRenamed("v", "term"), Seq("term"), "left")
      .select(col("term"), col("est"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("est") - coalesce(col("exact"), lit(0L))).as("overestimate"))
  }

  /** DuckDB oracle replaying [[cmsPointReport]] over [[cmsCounters]]. */
  def cmsPointReportOracleSql(valsSql: String, terms: Seq[String],
                              d: Int, w: Int): String = {
    val termList = terms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val rowIdx = (0 until d).map(i => s"SELECT $i AS row").mkString(" UNION ALL ")
    s"""WITH $valsSql,
       rows_ AS ($rowIdx),
       cells AS (SELECT rows_.row AS row,
                   CAST(('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || vals.v), 1, 15)) AS BIGINT) % $w AS counter
                 FROM vals CROSS JOIN rows_),
       counters AS (SELECT row, counter, CAST(count(*) AS BIGINT) AS cnt
                    FROM cells GROUP BY row, counter),
       probe AS (SELECT unnest([$termList]) AS term),
       pc AS (SELECT probe.term, rows_.row AS row,
                CAST(('0x' || substring(md5(CAST(rows_.row AS VARCHAR) || ':' || probe.term), 1, 15)) AS BIGINT) % $w AS counter
              FROM probe CROSS JOIN rows_),
       est AS (SELECT pc.term, min(coalesce(counters.cnt, 0)) AS est
               FROM pc LEFT JOIN counters
                 ON counters.row = pc.row AND counters.counter = pc.counter
               GROUP BY pc.term),
       exact AS (SELECT v AS term, CAST(count(*) AS BIGINT) AS exact
                 FROM vals GROUP BY v)
       SELECT est.term, est.est, coalesce(exact.exact, 0) AS exact,
         est.est - coalesce(exact.exact, 0) AS overestimate
       FROM est LEFT JOIN exact ON exact.term = est.term
       ORDER BY est.term"""
  }

  // ── exact heavy hitters ───────────────────────────────────────────────

  /** Exact φ-heavy hitters: values with frequency ≥ total/k — the ground
    * truth a count-min deployment is calibrated against (and a corpus-mix
    * red flag on its own: a token above 1/k of a 100 TB corpus is
    * boilerplate). Scale: ONE map-side-combined count; the 1-row total
    * broadcasts into the threshold filter. Integer threshold test
    * (cnt·k ≥ total) — no division, no float. */
  def heavyHitters(vals: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val counts = vals.groupBy(col("v")).agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum(col("freq")).as("total"))
    counts.crossJoin(broadcast(total))
      .where(col("freq") * k >= col("total"))
      .select(col("v"), col("freq"), col("total").as("total_values"),
        expr("freq * 1000000L div total").as("freq_ppm"))
  }

  /** DuckDB oracle replaying [[heavyHitters]]. */
  def heavyHittersOracleSql(valsSql: String, k: Int): String =
    s"""WITH $valsSql,
       c AS (SELECT v, CAST(count(*) AS BIGINT) AS freq FROM vals GROUP BY v),
       t AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c)
       SELECT c.v, c.freq, t.total AS total_values,
         c.freq * 1000000 // t.total AS freq_ppm
       FROM c CROSS JOIN t
       WHERE c.freq * $k >= t.total
       ORDER BY c.v"""

  // ── base-2 log-histogram quantile sketch ──────────────────────────────
  //
  // The DDSketch idea (Masson et al., VLDB 2019) with EXACT integer bucket
  // boundaries: a non-negative long lands in (octave, sub) where octave =
  // ⌊log₂ v⌋ + 1 (the BIT LENGTH — pure integer arithmetic, no float
  // boundary ambiguity between engines) and sub splits each octave into 16
  // equal integer slices. Relative error of any quantile estimate is
  // ≤ 1/16 of the value; the histogram is ≤ 63·16+1 rows no matter how
  // many values went in, and counts are ADDITIVE — per-batch histograms
  // fold by (octave, sub) sum, fold ≡ rebuild, so the sketch lives as
  // ordinary stored pipes like the HLL/KMV/CMS families above.

  /** Octave (bit length) bucket of a non-negative long — shared by every
    * DD-sketch entry point. */
  private def octaveSql(v: String): String =
    s"CASE WHEN $v = 0 THEN 0 ELSE length(bin($v)) END"

  /** Sub-bucket (16 slices per octave). For octave ≥ 5 the naive
    * `v·16 div 2^(octave−1)` wraps a Long at v ≥ 2^59, so we shift DOWN
    * instead: `v div 2^(octave−5) − 16` is the identical value
    * (16/2^(octave−1) = 1/2^(octave−5)) and overflow-free over the FULL
    * non-negative long domain — so both engines agree at every boundary
    * with no domain caveat. */
  private def subSql(v: String): String =
    s"CASE WHEN $v = 0 THEN 0" +
      s" WHEN length(bin($v)) <= 4 THEN $v * 16" +
      s" div shiftleft(CAST(1 AS BIGINT), length(bin($v)) - 1) - 16" +
      s" ELSE $v div shiftleft(CAST(1 AS BIGINT)," +
      s" length(bin($v)) - 5) - 16 END"

  /** DuckDB spelling of [[subSql]] (`//` and `<<`). */
  private def subSqlDuck(v: String): String =
    s"CASE WHEN $v = 0 THEN 0" +
      s" WHEN length(bin($v)) <= 4 THEN $v * 16" +
      s" // (CAST(1 AS BIGINT) << (length(bin($v)) - 1)) - 16" +
      s" ELSE $v // (CAST(1 AS BIGINT) << (length(bin($v)) - 5)) - 16 END"

  /** Per-(octave, sub) counts of a non-negative long column. ONE
    * map-side-combined aggregate; the bucket math is integer-only
    * (bit length via `length(bin(v))`, powers of two via shiftleft), so
    * both engines agree at every boundary. */
  def ddSketchHistogram(df: DataFrame, valueCol: String): DataFrame =
    df.select(
        expr(octaveSql(valueCol)).as("octave"),
        expr(subSql(valueCol)).as("sub"))
      .groupBy(col("octave"), col("sub"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold stored per-batch histograms — additive, fold ≡ rebuild. */
  def ddSketchFold(hist: DataFrame): DataFrame =
    hist.groupBy(col("octave"), col("sub")).agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates off a histogram: for each requested quantile
    * (micro-units) the estimate is the LOWER BOUND of the bucket holding
    * rank ⌈q·n⌉ — integer reconstruction lo = 2^(octave−1)·(16+sub)/16,
    * so the reported value is exact arithmetic with ≤ 1/16 relative
    * error. The cumulative window runs over the ≤ 63·16+1-row histogram,
    * never over data. */
  def ddQuantiles(hist: DataFrame, qsMicro: Seq[Long]): DataFrame = {
    require(qsMicro.nonEmpty && qsMicro.forall(q => q >= 0L && q <= 1000000L),
      "quantiles must be micro-units in [0, 1e6]")
    // the histogram is consumed twice (cumulative walk + totals); it is
    // ≤ 1009 rows but its LINEAGE may be a full corpus scan — materialize
    // once so the caller pays that scan exactly once
    val h = hist.localCheckpoint(true)
    val w = Window.orderBy(col("octave"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("lo", expr("CASE WHEN octave = 0 THEN 0 ELSE" +
        " shiftleft(CAST(1 AS BIGINT), octave - 1) + sub *" +
        " shiftleft(CAST(1 AS BIGINT), octave - 1) div 16 END"))
    val n1 = h.agg(sum(col("cnt")).as("n"))
    val qs = hist.sparkSession.createDataFrame(
      hist.sparkSession.sparkContext.parallelize(
        qsMicro.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_micro",
          org.apache.spark.sql.types.LongType))))
    qs.crossJoin(broadcast(n1))
      .select(col("q_micro"), col("n"),
        // widen the q·n product to DECIMAL(38,0) — Long wraps past ~9.2e12
        // rows (`div` returns BIGINT, so rank stays a Long ≤ n)
        expr("least(n, greatest(1, (CAST(q_micro AS DECIMAL(38,0)) * n" +
          " + 999999) div 1000000))").as("rank"))
      .join(cum, col("cum") >= col("rank"))
      .groupBy(col("q_micro"), col("n"), col("rank"))
      .agg(min(col("lo")).as("estimate"))
  }

  /** Per-GROUP histogram — the per-domain production shape (latency /
    * length quantiles keyed by source, event type, language…). Same
    * integer bucket math; one aggregate keyed (group, octave, sub), so
    * each group's histogram stays ≤ 63·16+1 rows. */
  def ddSketchHistogramByGroup(df: DataFrame, groupCol: String,
                               valueCol: String): DataFrame =
    df.select(col(groupCol).as("grp"),
        expr(octaveSql(valueCol)).as("octave"),
        expr(subSql(valueCol)).as("sub"))
      .groupBy(col("grp"), col("octave"), col("sub"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold stored per-batch grouped histograms — additive per group. */
  def ddSketchFoldByGroup(hist: DataFrame): DataFrame =
    hist.groupBy(col("grp"), col("octave"), col("sub"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-group quantile estimates off a grouped histogram: the cumulative
    * window PARTITIONS by the group (≤ 63·16+1 rows per partition — a
    * bounded window, never corpus-wide), and the rank probe joins on the
    * group key. */
  def ddQuantilesByGroup(hist: DataFrame, qsMicro: Seq[Long]): DataFrame = {
    require(qsMicro.nonEmpty && qsMicro.forall(q => q >= 0L && q <= 1000000L),
      "quantiles must be micro-units in [0, 1e6]")
    // consumed twice (per-group cum + per-group totals) — pay the
    // upstream scan once ([[ddQuantiles]]'s rationale)
    val h = hist.localCheckpoint(true)
    val w = Window.partitionBy(col("grp")).orderBy(col("octave"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("lo", expr("CASE WHEN octave = 0 THEN 0 ELSE" +
        " shiftleft(CAST(1 AS BIGINT), octave - 1) + sub *" +
        " shiftleft(CAST(1 AS BIGINT), octave - 1) div 16 END"))
    val n1 = h.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val qs = hist.sparkSession.createDataFrame(
      hist.sparkSession.sparkContext.parallelize(
        qsMicro.map(org.apache.spark.sql.Row(_)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("q_micro",
          org.apache.spark.sql.types.LongType))))
    n1.crossJoin(broadcast(qs))
      .select(col("grp"), col("q_micro"), col("n"),
        // widen the q·n product to DECIMAL(38,0) — Long wraps past ~9.2e12
        // rows (`div` returns BIGINT, so rank stays a Long ≤ n)
        expr("least(n, greatest(1, (CAST(q_micro AS DECIMAL(38,0)) * n" +
          " + 999999) div 1000000))").as("rank"))
      .join(cum, Seq("grp"))
      .where(col("cum") >= col("rank"))
      .groupBy(col("grp"), col("q_micro"), col("n"), col("rank"))
      .agg(min(col("lo")).as("estimate"))
  }

  /** DuckDB oracle replaying the grouped build → [[ddQuantilesByGroup]]
    * over a (grp, v) subquery. */
  def ddQuantilesByGroupOracleSql(valsSql: String,
                                  qsMicro: Seq[Long]): String = {
    val qrows = qsMicro.map(q => s"($q)").mkString(", ")
    s"""WITH vals AS ($valsSql),
       b AS (SELECT grp,
               CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS octave,
               ${subSqlDuck("v")} AS sub
             FROM vals),
       h AS (SELECT grp, octave, sub, CAST(count(*) AS BIGINT) AS cnt
             FROM b GROUP BY 1, 2, 3),
       c AS (SELECT grp, octave, sub, cnt,
               CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY octave, sub
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum,
               CASE WHEN octave = 0 THEN 0
                 ELSE (CAST(1 AS BIGINT) << (octave - 1)) + sub *
                   (CAST(1 AS BIGINT) << (octave - 1)) // 16 END AS lo
             FROM h),
       n1 AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n FROM h GROUP BY 1),
       q AS (SELECT grp, CAST(q_micro AS BIGINT) AS q_micro, n,
               CAST(least(n, greatest(1, (CAST(q_micro AS HUGEINT) * n
                 + 999999) // 1000000)) AS BIGINT) AS rank
             FROM (VALUES $qrows) AS t(q_micro) CROSS JOIN n1)
       SELECT q.grp, q.q_micro, q.n, q.rank, min(c.lo) AS estimate
       FROM q JOIN c ON c.grp = q.grp AND c.cum >= q.rank
       GROUP BY q.grp, q.q_micro, q.n, q.rank
       ORDER BY q.grp, q.q_micro"""
  }

  /** QUANTILE NORMALIZATION across groups via the log-histogram sketch —
    * batch-effect correction for scores that live on per-source scales
    * (one reward model per vendor, one quality classifier per crawl):
    * each row maps to its GROUP percentile and then to the CORPUS value
    * at that percentile, so thresholds and rankings compare across
    * sources. The classic exact form sorts every group; this one never
    * sorts data — rows join a ≤ |groups|·1009-row bucket→percentile
    * table and the corpus inverse walks the ≤ 1009-row global histogram,
    * at the sketch's ≤ 1/16 relative error.
    *
    * Exactness: percentile = inclusive bucket cum ÷ group size and the
    * corpus inverse = the [[ddQuantiles]] rank walk — all integer
    * arithmetic, both engines identical. Rows in the same (group,
    * bucket) normalize identically by construction. */
  def quantileNormalize(df: DataFrame, groupCol: String, idCol: String,
                        valueCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(valueCol).as("v"),
      expr(octaveSql(valueCol)).as("octave"),
      expr(subSql(valueCol)).as("sub"))
    val gh = rows.groupBy(col("grp"), col("octave"), col("sub"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // consumed thrice; ≤ |groups|·1009 rows
    val wg = Window.partitionBy(col("grp")).orderBy(col("octave"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ng = gh.groupBy(col("grp")).agg(sum(col("cnt")).as("n_g"))
    val bucketPct = gh.withColumn("cum", sum(col("cnt")).over(wg))
      .join(ng, Seq("grp"))
      .select(col("grp"), col("octave"), col("sub"),
        // DECIMAL(38,0) product — cum·1e6 wraps a Long past ~9.2e12 rows
        expr("CAST(cum AS DECIMAL(38,0)) * 1000000 div n_g")
          .as("pct_micro"))
    val ch = gh.groupBy(col("octave"), col("sub"))
      .agg(sum(col("cnt")).as("cnt"))
    val wc = Window.orderBy(col("octave"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ccum = ch.withColumn("ccum", sum(col("cnt")).over(wc))
      .withColumn("lo", expr("CASE WHEN octave = 0 THEN 0 ELSE" +
        " shiftleft(CAST(1 AS BIGINT), octave - 1) + sub *" +
        " shiftleft(CAST(1 AS BIGINT), octave - 1) div 16 END"))
      .localCheckpoint(true) // ≤ 1009 rows
    val nc = ccum.agg(max(col("ccum")).as("n_c"))
    val mapping = bucketPct.crossJoin(broadcast(nc))
      .select(col("grp"), col("octave"), col("sub"), col("pct_micro"),
        expr("least(n_c, greatest(1, (CAST(pct_micro AS DECIMAL(38,0))" +
          " * n_c + 999999) div 1000000))").as("rank"))
      .join(broadcast(ccum.select(col("ccum"), col("lo"))),
        col("ccum") >= col("rank"))
      .groupBy(col("grp"), col("octave"), col("sub"), col("pct_micro"))
      .agg(min(col("lo")).as("norm_v"))
    rows.join(mapping, Seq("grp", "octave", "sub"))
      .select(col("id").as(idCol), col("grp").as(groupCol),
        col("v").as(valueCol), col("pct_micro"), col("norm_v"))
  }

  /** DuckDB oracle replaying [[quantileNormalize]] over a (grp, id, v)
    * subquery. */
  def quantileNormalizeOracleSql(valsSql: String, groupCol: String,
                                 idCol: String, valueCol: String): String =
    s"""WITH src AS ($valsSql),
       rows_ AS (SELECT grp, id, v,
           CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS octave,
           ${subSqlDuck("v")} AS sub
         FROM src),
       gh AS (SELECT grp, octave, sub, CAST(count(*) AS BIGINT) AS cnt
              FROM rows_ GROUP BY 1, 2, 3),
       ng AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS n_g
              FROM gh GROUP BY 1),
       bp AS (SELECT gh.grp, gh.octave, gh.sub,
                CAST(CAST(sum(cnt) OVER (PARTITION BY gh.grp
                  ORDER BY gh.octave, gh.sub
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) * 1000000 // ng.n_g AS BIGINT) AS pct_micro
              FROM gh JOIN ng ON ng.grp = gh.grp),
       ch AS (SELECT octave, sub, CAST(sum(cnt) AS BIGINT) AS cnt
              FROM gh GROUP BY 1, 2),
       cc AS (SELECT octave, sub,
                CAST(sum(cnt) OVER (ORDER BY octave, sub
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS ccum,
                CASE WHEN octave = 0 THEN 0
                  ELSE (CAST(1 AS BIGINT) << (octave - 1)) + sub *
                    (CAST(1 AS BIGINT) << (octave - 1)) // 16 END AS lo
              FROM ch),
       nc AS (SELECT max(ccum) AS n_c FROM cc),
       mp AS (SELECT bp.grp, bp.octave, bp.sub, bp.pct_micro,
                min(cc.lo) AS norm_v
              FROM bp CROSS JOIN nc
              JOIN cc ON cc.ccum >= least(nc.n_c, greatest(1,
                (CAST(bp.pct_micro AS HUGEINT) * nc.n_c + 999999)
                  // 1000000))
              GROUP BY 1, 2, 3, 4)
       SELECT r.id AS $idCol, r.grp AS $groupCol, r.v AS $valueCol,
         mp.pct_micro, mp.norm_v
       FROM rows_ r JOIN mp ON mp.grp = r.grp AND mp.octave = r.octave
                            AND mp.sub = r.sub
       ORDER BY $idCol"""

  /** DuckDB oracle replaying [[ddSketchHistogram]] → [[ddQuantiles]] over
    * a value subquery. */
  def ddQuantilesOracleSql(valsSql: String, qsMicro: Seq[Long]): String = {
    val qrows = qsMicro.map(q => s"($q)").mkString(", ")
    s"""WITH vals AS ($valsSql),
       b AS (SELECT CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS octave,
               ${subSqlDuck("v")} AS sub
             FROM vals),
       h AS (SELECT octave, sub, CAST(count(*) AS BIGINT) AS cnt
             FROM b GROUP BY 1, 2),
       c AS (SELECT octave, sub, cnt,
               CAST(sum(cnt) OVER (ORDER BY octave, sub
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum,
               CASE WHEN octave = 0 THEN 0
                 ELSE (CAST(1 AS BIGINT) << (octave - 1)) + sub *
                   (CAST(1 AS BIGINT) << (octave - 1)) // 16 END AS lo
             FROM h),
       n1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM h),
       q AS (SELECT CAST(q_micro AS BIGINT) AS q_micro, n,
               CAST(least(n, greatest(1, (CAST(q_micro AS HUGEINT) * n
                 + 999999) // 1000000)) AS BIGINT) AS rank
             FROM (VALUES $qrows) AS t(q_micro) CROSS JOIN n1)
       SELECT q.q_micro, q.n, q.rank, min(c.lo) AS estimate
       FROM q JOIN c ON c.cum >= q.rank
       GROUP BY q.q_micro, q.n, q.rank
       ORDER BY q.q_micro"""
  }

  // ── KMV set operations (theta-sketch style; Beyer et al. 2007,
  //    Dasgupta et al. 2016 / Apache DataSketches) ────────────────────────

  /** Pairwise cross-source distinct-overlap estimates from bottom-k (KMV)
    * signatures — the sketch SET-OPERATION move: each source keeps its k
    * smallest 60-bit element hashes (word `shingleSize`-shingles, so the
    * element space is corpus-sized, not the tiny vocab); for a pair, the
    * k smallest of the UNION of the two sketches are a uniform sample of
    * the union's distinct elements, so the fraction of them present in
    * BOTH sketches estimates Jaccard, and × the union's KMV
    * distinct-estimate gives the intersection size ("how many unique
    * shingles do these two crawls share" without ever joining text).
    *
    * Scale: one scan collapses to |sources|·k longs (per-source window,
    * partitioned); every pair stage runs on that broadcast-sized sketch
    * table — |sources|²·k rows worst case, corpus-independent. All
    * arithmetic is exact longs + the two fixed-order double estimates. */
  def kmvOverlap(docs: DataFrame, groupCol: String, textCol: String,
                 shingleSize: Int, k: Int): DataFrame = {
    import graft.functions.TextFns
    require(k >= 2, "k must be at least 2")
    val bk = docs.select(col(groupCol).as("src"),
        explode(TextFns.wordShingles(lower(trim(col(textCol))), shingleSize)).as("v"))
      .where(length(col("v")) > 0)
      .select(col("src"), TextFns.md5Long60(col("v")).as("hash"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("hash"))))
      .where(col("rk") <= k)
      .localCheckpoint(true) // |sources|·k rows; read by every pair stage
    val pairs = bk.select(col("src").as("s1")).distinct()
      .crossJoin(bk.select(col("src").as("s2")).distinct())
      .where(col("s1") < col("s2"))
    val u = pairs.join(bk.select(col("src").as("s1"), col("hash")), Seq("s1"))
        .select(col("s1"), col("s2"), col("hash"),
          lit(1).as("ia"), lit(0).as("ib"))
      .unionByName(
        pairs.join(bk.select(col("src").as("s2"), col("hash")), Seq("s2"))
          .select(col("s1"), col("s2"), col("hash"),
            lit(0).as("ia"), lit(1).as("ib")))
      .groupBy(col("s1"), col("s2"), col("hash"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val ranked = u.withColumn("rk", row_number().over(
        Window.partitionBy(col("s1"), col("s2")).orderBy(col("hash"))))
      .where(col("rk") <= k)
    val out = ranked.groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_union"), max(col("hash")).as("kth_hash"),
        sum((col("ia") * col("ib")).cast("long")).as("c_both"))
      .select(col("s1"), col("s2"), col("n_union"), col("c_both"),
        expr(s"CASE WHEN n_union < $k THEN n_union * 1000000L" +
          s" ELSE CAST(FLOOR(${k - 1}.0D * $Two60 / CAST(kth_hash AS DOUBLE)" +
          s" * 1000000.0D) AS BIGINT) END").as("est_union_micro"))
      .withColumn("jaccard_micro",
        expr("c_both * 1000000L div n_union"))
      .withColumn("est_intersection_micro",
        floor(col("c_both").cast("double") / col("n_union").cast("double") *
          col("est_union_micro").cast("double")).cast("long"))
      .localCheckpoint(true) // |sources|²/2 rows — materialize BEFORE freeing bk
    graft.ops.ApproxDedup.freeCheckpoint(bk)
    out
  }

  /** DuckDB oracle replaying [[kmvOverlap]]. */
  def kmvOverlapOracleSql(table: String, groupCol: String, textCol: String,
                          shingleSize: Int, k: Int): String =
    s"""WITH sv AS (
         SELECT $groupCol AS src,
           array_to_string(t[j:j+${shingleSize - 1}], ' ') AS v
         FROM (SELECT $groupCol,
                 string_split_regex(trim(lower($textCol)), '\\s+') AS t
               FROM $table) w,
           unnest(CASE WHEN len(t) < $shingleSize THEN CAST([] AS BIGINT[])
             ELSE generate_series(1, len(t) - ${shingleSize - 1}) END) AS u(j)),
       h AS (SELECT DISTINCT src,
               CAST(('0x' || substring(md5(v), 1, 15)) AS BIGINT) AS hash
             FROM sv WHERE length(v) > 0),
       bk AS (SELECT src, hash FROM (
           SELECT src, hash,
             row_number() OVER (PARTITION BY src ORDER BY hash) AS rk
           FROM h) WHERE rk <= $k),
       pr AS (SELECT a.src AS s1, b.src AS s2
              FROM (SELECT DISTINCT src FROM bk) a,
                   (SELECT DISTINCT src FROM bk) b
              WHERE a.src < b.src),
       uu AS (SELECT s1, s2, hash, max(ia) AS ia, max(ib) AS ib FROM (
           SELECT pr.s1, pr.s2, bk.hash, 1 AS ia, 0 AS ib
           FROM pr JOIN bk ON bk.src = pr.s1
           UNION ALL
           SELECT pr.s1, pr.s2, bk.hash, 0 AS ia, 1 AS ib
           FROM pr JOIN bk ON bk.src = pr.s2) g
         GROUP BY 1, 2, 3),
       rk AS (SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY s1, s2 ORDER BY hash) AS rk
           FROM uu) WHERE rk <= $k),
       ag AS (SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_union,
                max(hash) AS kth_hash,
                CAST(sum(ia * ib) AS BIGINT) AS c_both
              FROM rk GROUP BY 1, 2),
       es AS (SELECT s1, s2, n_union, c_both,
                CASE WHEN n_union < $k THEN n_union * 1000000
                  ELSE CAST(FLOOR(${k - 1}.0 * $Two60 / CAST(kth_hash AS DOUBLE)
                    * 1000000.0) AS BIGINT) END AS est_union_micro
              FROM ag)
       SELECT s1, s2, n_union, c_both, est_union_micro,
         c_both * 1000000 // n_union AS jaccard_micro,
         CAST(FLOOR(CAST(c_both AS DOUBLE) / CAST(n_union AS DOUBLE)
           * CAST(est_union_micro AS DOUBLE)) AS BIGINT) AS est_intersection_micro
       FROM es ORDER BY s1, s2"""
}
