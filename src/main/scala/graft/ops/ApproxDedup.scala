package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Document deduplication family for training-data pipelines.
  *
  * Exact dedup is a hash groupBy. Near-dup follows the standard
  * shingle → MinHash → banded-LSH → bucket-join → exact-Jaccard-verify
  * pipeline (Broder '97 resemblance sketches; the MapReduce formulation used
  * by every large web-corpus dedup). The LSH band join is the scale path:
  * candidate pairs come from equi-joins on (band, bandHash) — a hash shuffle
  * proportional to collisions, never the O(n²) cross join. The final exact
  * Jaccard filter removes LSH false positives.
  */
object ApproxDedup {

  // Mersenne prime 2^31-1: shingle hashes are reduced mod P before the
  // affine step, so a*h+b stays under 2^62 — no Long overflow under Spark's
  // default ANSI arithmetic. 31-bit minhash space is ample for sketching.
  private val P = 2147483647L // 2^31 - 1

  /** Fixed edge-count cap for the driver-side union-find branch of
    * [[nearDupClustersStar]]: an ABSOLUTE constant (≤ ~1.6 MB of collected
    * longs), deliberately not a fraction of the input, so at any corpus
    * scale only genuinely tiny frontiers run on the driver. */
  private[graft] val DriverUnionFindMaxEdges = 100000L

  // the evaluate-once lambda binding lives in ONE place (TextFns) — the
  // trick is Catalyst-version-sensitive and must not drift between copies
  private def bindOnce(e: Column)(body: Column => Column): Column =
    TextFns.bindOnce(e)(body)

  /** k-permutation MinHash signature over word shingles.
    * h_i(s) = (a_i * (xxhash64(s) mod P) + b_i) mod P; signature_i = min
    * over shingles. Runs as ONE generated kernel pass over the token array
    * ([[graft.expressions.MinHashSignature]]) — the composed
    * transform/array_min form paid interpreted lambda dispatch per
    * (shingle × hash fn). Signatures are bit-identical to that form (same
    * shingle strings, xxhash64 seed, coefficient draws, MaxValue-on-empty
    * convention — a null text also keeps its all-MaxValue signature). */
  /** The seeded affine coefficient draw — shared between the Spark kernel
    * and the DuckDB oracle generators so both sides compute identical
    * signatures. Draw ORDER (a then b per component) is part of the
    * contract; do not reorder. */
  private[graft] def minhashCoefs(k: Int, seed: Long = 7L): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val coefs = Seq.fill(k)((math.abs(rng.nextLong()) % (P - 1) + 1, math.abs(rng.nextLong()) % P))
    (coefs.map(_._1).toArray, coefs.map(_._2).toArray)
  }

  def minhashSignature(text: Column, shingleSize: Int, k: Int, seed: Long = 7L,
                       md5Base: Boolean = false): Column = {
    val (as, bs) = minhashCoefs(k, seed)
    val sig = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.MinHashSignature(
        org.apache.spark.sql.GraftColumnBridge.expression(TextFns.tokens(text)),
        shingleSize, as, bs, md5Base))
    coalesce(sig, typedlit(Seq.fill(k)(Long.MaxValue)))
  }

  /** Candidate near-dup pairs via banded LSH over the MinHash signature:
    * signature of length k split into `bands` bands; docs colliding on any
    * full band become candidates. Returns (id1, id2) with id1 < id2. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleSize: Int = 3, k: Int = 20, bands: Int = 5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    // materialize signatures once: both band-join sides read the cached
    // (id, sig) table instead of re-evaluating the k-hash expression tree
    // per side (the in-plan form of "persist the signature index")
    val sig = docs.select(col(idCol), minhashSignature(col(textCol), shingleSize, k).as("sig"))
      .cache()
    // band hashes reference `sig` once via lambda binding (not 12 inlined
    // copies of the whole signature expression)
    val banded = sig.select(col(idCol), posexplode(
      bindOnce(col("sig")) { sg =>
        transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(sg, b * lit(rows) + lit(1), lit(rows)), b))
      }))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")
    val l = banded.select(col(idCol).as("id1"), col("band"), col("bandHash"))
    val r = banded.select(col(idCol).as("id2"), col("band"), col("bandHash"))
    l.join(r, Seq("band", "bandHash"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Full near-dup pipeline: LSH candidates verified by exact shingle
    * Jaccard ≥ threshold. With r = k/bands = 2 rows per band (the oracle
    * configuration), the miss probability for a threshold pair is
    * negligible, so the output equals the exact all-pairs computation. */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double, shingleSize: Int = 3,
                      k: Int = 20, bands: Int = 5): DataFrame = {
    val cands = minhashCandidates(docs, idCol, textCol, shingleSize, k, bands)
    val sh = docs.select(col(idCol),
      array_distinct(TextFns.wordShingles(col(textCol), shingleSize)).as("sh"))
    verifyExact(cands, sh, idCol, threshold)
  }

  /** Rows of the PERSISTABLE banded-LSH inverted index: one row per
    * (document, band) carrying the band hash plus a bounded integer BUCKET
    * label (`band * buckets + pmod(bandHash, buckets)`) fit for use as a
    * partition axis. Store once through [[graft.storage.PipeStorage]] with
    * one chunk per bucket; probing the near-dups of one document then reads
    * at most `bands` bucket directories instead of re-hashing the corpus —
    * the same index-build/probe split as the ANN path. One shuffle-free
    * projection + explode; nothing wider than (id, 2 ints, 1 long) leaves
    * the scan. */
  def minhashBandIndex(docs: DataFrame, idCol: String, textCol: String,
                       shingleSize: Int = 3, k: Int = 20, bands: Int = 5,
                       buckets: Int = 64, keep: Seq[Column] = Nil): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    docs.select(col(idCol) +: keep :+ posexplode(
        bindOnce(minhashSignature(col(textCol), shingleSize, k)) { sg =>
          transform(sequence(lit(0), lit(bands - 1)),
            b => hash(slice(sg, b * lit(rows) + lit(1), lit(rows)), b))
        }): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")
      .withColumn("bucket",
        col("band").cast("long") * lit(buckets.toLong) +
          pmod(col("bandHash").cast("long"), lit(buckets.toLong)))
  }

  /** LSH parameter-tuning report (the banding-theory tradeoff, Leskovec et
    * al. MMDS ch.3, made MEASURABLE on this corpus): for every (bands,
    * rows) factorization of the k-component MinHash signature, the actual
    * candidate workload the configuration would generate here — Σ n·(n−1)/2
    * over the (band, slice) buckets, i.e. pair comparisons WITH band
    * multiplicity, the work a dedup run pays — next to the theoretical
    * match probability 1−(1−t^r)^b at the target threshold. The operator a
    * data engineer runs on a corpus SAMPLE before committing a 100 TB
    * dedup pass to one (b, r) point.
    *
    * One cached signature pass; each configuration then costs one shuffle
    * of (band, r-slice) keys into a counts aggregate whose output is
    * buckets-bounded. Buckets key on the slice VALUES (not a murmur of
    * them), so DuckDB replays the counts exactly. Output: one row per
    * factorization. */
  def minhashTuning(docs: DataFrame, idCol: String, textCol: String,
                    threshold: Double, shingleSize: Int = 3, k: Int = 24,
                    seed: Long = 7L): DataFrame = {
    val sig = docs.select(col(idCol),
      minhashSignature(col(textCol), shingleSize, k, seed, md5Base = true).as("sig"))
      .cache()
    val reports = (1 to k).filter(k % _ == 0).map { b =>
      val r = k / b
      val banded = sig.select(posexplode(bindOnce(col("sig")) { sg =>
          transform(sequence(lit(0), lit(b - 1)),
            bb => slice(sg, bb * lit(r) + lit(1), lit(r)))
        }).as(Seq("band", "key")))
      banded.groupBy(col("band"), col("key")).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(expr("n * (n - 1) / 2")), lit(0L)).cast("long")
          .as("candidate_checks"))
        .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("candidate_checks"),
          round((lit(1.0) - pow(lit(1.0) - pow(lit(threshold), lit(r.toDouble)),
            lit(b.toDouble))) * lit(1e6)).cast("long").as("p_match_micro"))
    }
    // |divisors(k)| rows total — materialize eagerly so the signature cache
    // releases here instead of leaking into the session
    val out = reports.reduce(_ unionByName _).localCheckpoint(true)
    sig.unpersist()
    out
  }

  /** DuckDB oracle replaying [[minhashTuning]]: the shared signature CTEs,
    * then per-factorization bucket counts UNION'd — buckets compare as
    * slice-list equality on both sides. */
  def minhashTuningOracleSql(table: String, idCol: String, textCol: String,
                             threshold: Double, shingleSize: Int = 3,
                             k: Int = 24, seed: Long = 7L): String = {
    val cfgs = (1 to k).filter(k % _ == 0).map { b =>
      val r = k / b
      s"""SELECT $b AS bands, $r AS rows_per_band,
            coalesce((SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) FROM (
              SELECT count(*) AS n FROM (
                SELECT s.id, u.bb, s.sig[u.bb*$r+1 : u.bb*$r+$r] AS key
                FROM sig s CROSS JOIN
                  (SELECT unnest(generate_series(0, ${b - 1})) AS bb) u) g
              GROUP BY bb, key) c), 0) AS candidate_checks,
            CAST(round((1 - power(1 - power($threshold, $r), $b)) * 1000000)
              AS BIGINT) AS p_match_micro"""
    }
    s"""WITH ${sigCtes(table, idCol, textCol, shingleSize, k, seed)}
       SELECT * FROM (${cfgs.mkString(" UNION ALL ")}) ORDER BY bands"""
  }

  /** Exact hashed-shingle Jaccard over GIVEN candidate pairs — the public
    * verify half for probes against a stored [[minhashBandIndex]]. */
  def verifyPairs(cands: DataFrame, docs: DataFrame, idCol: String,
                  textCol: String, shingleSize: Int,
                  threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol),
      array_distinct(TextFns.wordShingles(col(textCol), shingleSize)).as("sh"))
    verifyExact(cands, sh, idCol, threshold)
  }

  /** The 100 TB configuration: r = k/bands ≥ 4 rows per band cuts the random
    * candidate rate by orders of magnitude, and surviving candidates are
    * prefiltered by the signature-estimated Jaccard (fraction of equal
    * MinHash components, an unbiased estimator of J) BEFORE any shingle set
    * is shuffled — only pairs within `estSlack` of the threshold pay the
    * exact verify. Trades a small miss probability near the threshold for a
    * candidate set proportional to true near-dups instead of all pairs; use
    * [[minhashNearDups]] when exact-oracle output is required. */
  def minhashNearDupsFast(docs: DataFrame, idCol: String, textCol: String,
                          threshold: Double, shingleSize: Int = 3,
                          k: Int = 24, bands: Int = 6,
                          estSlack: Double = 0.25,
                          maxBucket: Int = 0,
                          md5Base: Boolean = false): DataFrame = {
    val (sig, estKept0) = minhashFastCandidates(docs, idCol, textCol, threshold,
      shingleSize, k, bands, estSlack, maxBucket, md5Base)
    // the surviving pair list is tiny (∝ true near-dups); materialize it
    // eagerly so the signature cache can release HERE instead of leaking
    // into a long-lived session. The checkpoint blocks themselves are
    // ContextCleaner-managed (freed on driver GC once unreferenced).
    val estKept = estKept0.localCheckpoint(true)
    sig.unpersist()
    val sh = docs.select(col(idCol),
      array_distinct(TextFns.wordShingles(col(textCol), shingleSize)).as("sh"))
    verifyExact(estKept, sh, idCol, threshold)
  }

  /** The candidate stage of [[minhashNearDupsFast]], LAZY — returned
    * separately so plan-shape tests can audit the hot-bucket cap's
    * broadcast anti-join before the eager checkpoint truncates lineage.
    * Returns (cached signature table, estimate-filtered pair candidates);
    * the caller owns unpersisting the signature table. */
  private[graft] def minhashFastCandidates(
      docs: DataFrame, idCol: String, textCol: String, threshold: Double,
      shingleSize: Int, k: Int, bands: Int, estSlack: Double,
      maxBucket: Int, md5Base: Boolean): (DataFrame, DataFrame) = {
    require(k % bands == 0, "bands must divide k")
    // cached like minhashCandidates: banding, the hot-bucket count, and
    // BOTH estimate-join sides read this table — uncached, each reference
    // would re-run the k-hash kernel over the full corpus
    val sig = docs.select(col(idCol),
      minhashSignature(col(textCol), shingleSize, k, md5Base = md5Base).as("sig"))
      .cache()
    val rows = k / bands
    val banded0 = sig.select(col(idCol), posexplode(
        bindOnce(col("sig")) { sg =>
          transform(sequence(lit(0), lit(bands - 1)),
            b => hash(slice(sg, b * lit(rows) + lit(1), lit(rows)), b))
        }))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandHash")
    // Hot-bucket cap — the skew guard a web corpus needs: a boilerplate
    // band (empty pages, license headers) can put millions of documents in
    // ONE bucket, and the self-join on that bucket is quadratic no matter
    // how AQE splits it. Buckets larger than `maxBucket` are dropped whole
    // via a broadcast anti-join against the hot-bucket list (map-side
    // combined count, so the list is tiny by construction — no sort, no
    // extra wide shuffle). A dropped bucket's members remain candidates
    // through their other, discriminative bands; only pairs whose EVERY
    // matching band is degenerate are lost. 0 disables (the oracle
    // configuration).
    val banded =
      if (maxBucket <= 0) banded0
      else {
        val hot = banded0.groupBy(col("band"), col("bandHash"))
          .agg(count(lit(1)).as("__n"))
          .where(col("__n") > maxBucket)
          .select(col("band"), col("bandHash"))
        banded0.join(broadcast(hot), Seq("band", "bandHash"), "left_anti")
      }
    val l = banded.select(col(idCol).as("id1"), col("band"), col("bandHash"))
    val r = banded.select(col(idCol).as("id2"), col("band"), col("bandHash"))
    val cands = l.join(r, Seq("band", "bandHash"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    // estimate from the k-component signatures (k longs per side — tiny
    // compared to shingle sets), drop hopeless candidates pre-shuffle
    val estKept = cands
      .join(sig.select(col(idCol).as("id1"), col("sig").as("sig1")), Seq("id1"))
      .join(sig.select(col(idCol).as("id2"), col("sig").as("sig2")), Seq("id2"))
      .withColumn("est",
        aggregate(zip_with(col("sig1"), col("sig2"),
          (a, b) => when(a === b, 1).otherwise(0)), lit(0),
          (acc, v) => acc + v).cast("double") / lit(k))
      .where(col("est") >= lit(threshold - estSlack))
      .select("id1", "id2")
    (sig, estKept)
  }

  /** CTE chain replaying [[minhashNearDupsFast]] (md5Base = true) in DuckDB,
    * ending in `p(id1, id2, jaccard)` — the verified near-dup pairs. The
    * whole pipeline is deterministic given the seed: identical signatures
    * (shared [[minhashCoefs]] draw + the md5-60bit base hash), band
    * CANDIDACY compared as slice equality (Spark buckets by `hash(slice)`;
    * equal slices always collide, and a murmur collision adding a spurious
    * candidate is removed by the exact verify both sides share), the same
    * hot-bucket cap and signature-estimate prefilter. */
  /** The shared signature CTE prefix (tok → sh → hs → sig) — the DuckDB
    * form of [[minhashSignature]] with md5Base = true; reused by every
    * minhash-family oracle so the signature definition cannot drift
    * between them. */
  private def sigCtes(table: String, idCol: String, textCol: String,
                      shingleSize: Int, k: Int, seed: Long): String = {
    val (as, bs) = minhashCoefs(k, seed)
    val comps = (0 until k).map { c =>
      s"coalesce(list_min(list_transform(hs, h -> (h * ${as(c)} + ${bs(c)}) % $P)), ${Long.MaxValue})"
    }.mkString(",\n             ")
    s"""tok AS (SELECT $idCol AS id, string_split_regex(trim($textCol), '\\s+') AS t FROM $table),
         sh AS (SELECT id, CASE WHEN len(t) < $shingleSize THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(t)-${shingleSize - 1}),
                         i -> array_to_string(t[i:i+${shingleSize - 1}], ' ')) END AS sh0
                FROM tok),
         hs AS (SELECT id, list_transform(sh0,
                  s -> CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) % $P) AS hs
                FROM sh),
         sig AS (SELECT id,
           [$comps] AS sig
           FROM hs)"""
  }

  private def minhashFastCtes(table: String, idCol: String, textCol: String,
                              threshold: Double, shingleSize: Int, k: Int,
                              bands: Int, estSlack: Double, maxBucket: Int,
                              seed: Long): String = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val capCte =
      if (maxBucket <= 0) "kb AS (SELECT * FROM band)"
      else s"""hot AS (SELECT b, bsl FROM band GROUP BY b, bsl HAVING count(*) > $maxBucket),
         kb AS (SELECT band.* FROM band WHERE NOT EXISTS
                 (SELECT 1 FROM hot WHERE hot.b = band.b AND hot.bsl = band.bsl))"""
    s"""${sigCtes(table, idCol, textCol, shingleSize, k, seed)},
         band AS (SELECT id, u.b, sig[u.b*$r+1 : u.b*$r+$r] AS bsl
                  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, ${bands - 1})) AS b) u),
         $capCte,
         cand AS (SELECT DISTINCT x.id AS id1, y.id AS id2
                  FROM kb x JOIN kb y ON x.b = y.b AND x.bsl = y.bsl AND x.id < y.id),
         est AS (SELECT c.id1, c.id2 FROM cand c
                 JOIN sig s1 ON s1.id = c.id1 JOIN sig s2 ON s2.id = c.id2
                 WHERE CAST(list_sum(list_transform(generate_series(1, $k),
                         i -> CASE WHEN s1.sig[i] = s2.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE) / $k
                       >= ${threshold - estSlack}),
         shd AS (SELECT id, list_distinct(sh0) AS sh FROM sh),
         p AS (SELECT e.id1, e.id2,
                 CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                 CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jaccard
               FROM est e JOIN shd a ON a.id = e.id1 JOIN shd b ON b.id = e.id2)"""
  }

  /** DuckDB oracle replaying [[minhashNearDupsFast]] end-to-end. */
  def minhashNearDupsFastOracleSql(table: String, idCol: String, textCol: String,
                                   threshold: Double, shingleSize: Int = 3,
                                   k: Int = 24, bands: Int = 6,
                                   estSlack: Double = 0.25, maxBucket: Int = 0,
                                   seed: Long = 7L): String =
    s"""WITH ${minhashFastCtes(table, idCol, textCol, threshold, shingleSize,
                               k, bands, estSlack, maxBucket, seed)}
       SELECT id1, id2, jaccard FROM p WHERE jaccard >= $threshold
       ORDER BY id1, id2"""

  /** EDIT-DISTANCE verification of candidate near-dup pairs — the
    * character-level second opinion after the shingle-Jaccard verify:
    * Jaccard on word shingles is blind to small in-word edits (OCR noise,
    * diacritics, truncation), Levenshtein is exactly what they change.
    * sim = (maxlen − lev)/maxlen in exact integer micro-units.
    *
    * Scale: the candidate PAIR LIST drives everything — two id equi-joins
    * pull the texts (the near-dup verify discipline: candidates are a
    * sliver of the corpus), and the O(len²) Levenshtein kernel runs only
    * on those joined rows, codegen'd on both engines. */
  def editDistanceVerify(docs: DataFrame, idCol: String, textCol: String,
                         pairs: DataFrame): DataFrame = {
    val t = docs.select(col(idCol), col(textCol))
    pairs.select(col("id1"), col("id2"))
      .join(t.select(col(idCol).as("id1"), col(textCol).as("__t1")),
        Seq("id1"))
      .join(t.select(col(idCol).as("id2"), col(textCol).as("__t2")),
        Seq("id2"))
      .select(col("id1"), col("id2"),
        levenshtein(col("__t1"), col("__t2")).cast("long").as("lev"),
        greatest(length(col("__t1")), length(col("__t2"))).cast("long")
          .as("maxlen"))
      .select(col("id1"), col("id2"), col("lev"),
        expr("CASE WHEN maxlen > 0 THEN (maxlen - lev) * 1000000L" +
          " div maxlen ELSE 1000000L END").as("sim_micro"))
  }

  /** DuckDB oracle replaying [[editDistanceVerify]] over the fast-path
    * candidate pairs. */
  def editDistanceVerifyOracleSql(table: String, idCol: String,
                                  textCol: String, threshold: Double,
                                  shingleSize: Int = 3, k: Int = 24,
                                  bands: Int = 6, estSlack: Double = 0.25,
                                  maxBucket: Int = 0,
                                  seed: Long = 7L): String =
    s"""WITH ${minhashFastCtes(table, idCol, textCol, threshold, shingleSize,
                               k, bands, estSlack, maxBucket, seed)},
       vpair AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
       j AS (SELECT c.id1, c.id2,
               CAST(levenshtein(a.$textCol, b.$textCol) AS BIGINT) AS lev,
               CAST(greatest(length(a.$textCol), length(b.$textCol))
                 AS BIGINT) AS maxlen
             FROM vpair c JOIN $table a ON a.$idCol = c.id1
                          JOIN $table b ON b.$idCol = c.id2)
       SELECT id1, id2, lev,
         CASE WHEN maxlen > 0 THEN (maxlen - lev) * 1000000 // maxlen
           ELSE 1000000 END AS sim_micro
       FROM j ORDER BY id1, id2"""

  /** Near-dup SOURCE matrix — dedup diagnostics: how near-dup pairs
    * distribute within and across sources ("is crawl B mostly a re-crawl
    * of A?"). Pairs carry only ids, so the matrix is two id equi-joins to
    * the |docs|-row (id, source) projection + one grouped count over
    * unordered source pairs — output ≤ |sources|² rows regardless of
    * corpus size. */
  def nearDupSourceMatrix(docs: DataFrame, pairs: DataFrame,
                          idCol: String, groupCol: String): DataFrame = {
    val s1 = docs.select(col(idCol).as("id1"), col(groupCol).as("src1"))
    val s2 = docs.select(col(idCol).as("id2"), col(groupCol).as("src2"))
    pairs.join(s1, Seq("id1")).join(s2, Seq("id2"))
      .select(least(col("src1"), col("src2")).as("src_a"),
        greatest(col("src1"), col("src2")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** DuckDB oracle: [[nearDupSourceMatrix]] over the replayed
    * [[minhashNearDupsFast]] pair graph. */
  def nearDupSourceMatrixOracleSql(table: String, idCol: String, textCol: String,
                                   groupCol: String, threshold: Double,
                                   shingleSize: Int = 3, k: Int = 24,
                                   bands: Int = 6, estSlack: Double = 0.25,
                                   maxBucket: Int = 0, seed: Long = 7L): String =
    s"""WITH ${minhashFastCtes(table, idCol, textCol, threshold, shingleSize,
                               k, bands, estSlack, maxBucket, seed)},
       pr AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
       s AS (SELECT $idCol AS id, $groupCol AS src FROM $table),
       m AS (SELECT least(a.src, b.src) AS src_a, greatest(a.src, b.src) AS src_b
             FROM pr JOIN s a ON a.id = pr.id1 JOIN s b ON b.id = pr.id2)
       SELECT src_a, src_b, count(*) AS n_pairs
       FROM m GROUP BY 1, 2 ORDER BY 1, 2"""

  /** DuckDB oracle for [[nearDupClusters]] over the FAST-path pair graph:
    * transitive closure (recursive CTE) of the replayed
    * [[minhashNearDupsFast]] pairs, min reachable id as the cluster label. */
  def nearDupClustersFastOracleSql(table: String, idCol: String, textCol: String,
                                   threshold: Double, shingleSize: Int = 3,
                                   k: Int = 24, bands: Int = 6,
                                   estSlack: Double = 0.25, maxBucket: Int = 0,
                                   seed: Long = 7L): String =
    s"""WITH RECURSIVE ${minhashFastCtes(table, idCol, textCol, threshold,
                                         shingleSize, k, bands, estSlack,
                                         maxBucket, seed)},
         pr AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
         e AS (SELECT id1 AS a, id2 AS b FROM pr
               UNION ALL SELECT id2, id1 FROM pr),
         reach(node, rr) AS (
           SELECT a, a FROM e
           UNION
           SELECT reach.node, e.b FROM reach JOIN e ON reach.rr = e.a)
       SELECT node AS doc_id, min(rr) AS cluster_id FROM reach
       GROUP BY node ORDER BY doc_id"""

  /** DuckDB oracle for [[Sampling.leakageSafeSplit]] over the FAST-path
    * pair graph: the [[nearDupClustersFastOracleSql]] closure, cluster
    * label (own id for singletons) md5-bucketed into the weighted split —
    * the same bucket formula as the `q_train_split` oracle, keyed on the
    * GROUP id instead of the document id. */
  def leakageSafeSplitOracleSql(table: String, idCol: String, textCol: String,
                                threshold: Double, shingleSize: Int = 3,
                                k: Int = 24, bands: Int = 6,
                                estSlack: Double = 0.25, maxBucket: Int = 0,
                                weights: Seq[(String, Int)] =
                                  Seq("train" -> 80, "val" -> 10, "test" -> 10),
                                seed: Long = 7L): String = {
    val cases = weights.scanLeft(("", 0)) { case ((_, acc), (nm, w)) =>
      (nm, acc + w) }.tail
      .map { case (nm, hi) => s"WHEN bk < $hi THEN '$nm'" }.mkString(" ")
    s"""WITH RECURSIVE ${minhashFastCtes(table, idCol, textCol, threshold,
                                         shingleSize, k, bands, estSlack,
                                         maxBucket, seed)},
         pr AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
         e AS (SELECT id1 AS a, id2 AS b FROM pr
               UNION ALL SELECT id2, id1 FROM pr),
         reach(node, rr) AS (
           SELECT a, a FROM e
           UNION
           SELECT reach.node, e.b FROM reach JOIN e ON reach.rr = e.a),
         cl AS (SELECT node AS $idCol, min(rr) AS cluster_id FROM reach GROUP BY node),
         g AS (SELECT d.$idCol, coalesce(cl.cluster_id, d.$idCol) AS group_id
               FROM $table d LEFT JOIN cl USING ($idCol)),
         b AS (SELECT $idCol, group_id,
                 CAST(('0x' || substring(md5(CAST(group_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bk
               FROM g)
       SELECT $idCol, group_id, CASE $cases END AS split
       FROM b ORDER BY $idCol"""
  }

  /** Near-dup dedup with QUALITY-AWARE survivor selection: one document per
    * near-dup cluster — the member with the highest `scoreCol` (ties break
    * to the lowest id), singletons surviving as themselves. The curation
    * counterpart of [[nearDupClusters]]' min-id representative: "of these
    * five near-copies, keep the best one", the policy Lee et al. 2022-style
    * pipelines apply after clustering.
    *
    * Selection is the skew-proof max-struct HASH AGGREGATE (same kernel as
    * the dedup-ranking path — map-side combined, no window, so a pathological
    * mega-cluster costs its reducer one struct, not a sort): lexicographic
    * max of (score, −id) ≡ rank-1 of (score DESC, id ASC).
    */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame, idCol: String,
                         scoreCol: String): DataFrame =
    keepBestFromClusters(docs, nearDupClusters(pairs), idCol, scoreCol)

  /** [[keepBestPerCluster]] over a PRECOMPUTED cluster-label table
    * (doc_id, cluster_id) — composed pipelines run the iterative label
    * propagation ONCE and share it between the dedup and the split. */
  def keepBestFromClusters(docs: DataFrame, clusters0: DataFrame,
                           idCol: String, scoreCol: String): DataFrame = {
    val clusters = clusters0.select(col("doc_id").as(idCol), col("cluster_id"))
    docs.select(col(idCol), col(scoreCol))
      .join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .groupBy(col("cluster_id"))
      .agg(max(struct(col(scoreCol).as("s"), (-col(idCol)).as("nid"))).as("b"))
      .select(col("cluster_id"), (-col("b.nid")).as(idCol),
        col("b.s").as(scoreCol))
  }

  /** DuckDB oracle for [[keepBestPerCluster]] over the FAST-path pair graph:
    * the [[nearDupClustersFastOracleSql]] closure, then rank-1 per cluster
    * under (score DESC, id ASC) — provably the same selection as the
    * max-struct aggregate. `scoreSql` is the score expression over a row of
    * `table` (referenced as `d`). */
  def keepBestOracleSql(table: String, idCol: String, textCol: String,
                        scoreSql: String, scoreName: String, threshold: Double,
                        shingleSize: Int = 3, k: Int = 24, bands: Int = 6,
                        estSlack: Double = 0.25, maxBucket: Int = 0,
                        seed: Long = 7L): String =
    s"""WITH RECURSIVE ${minhashFastCtes(table, idCol, textCol, threshold,
                                         shingleSize, k, bands, estSlack,
                                         maxBucket, seed)},
         pr AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
         e AS (SELECT id1 AS a, id2 AS b FROM pr
               UNION ALL SELECT id2, id1 FROM pr),
         reach(node, rr) AS (
           SELECT a, a FROM e
           UNION
           SELECT reach.node, e.b FROM reach JOIN e ON reach.rr = e.a),
         cl AS (SELECT node AS $idCol, min(rr) AS cluster_id FROM reach GROUP BY node),
         g AS (SELECT d.$idCol, coalesce(cl.cluster_id, d.$idCol) AS cluster_id,
                      ($scoreSql) AS $scoreName
               FROM $table d LEFT JOIN cl USING ($idCol)),
         r AS (SELECT cluster_id, $idCol, $scoreName,
                 row_number() OVER (PARTITION BY cluster_id
                   ORDER BY $scoreName DESC, $idCol) AS rn
               FROM g)
       SELECT cluster_id, $idCol, $scoreName FROM r WHERE rn = 1
       ORDER BY cluster_id"""

  /** Dedup-rate curve — "how aggressive would threshold t be?": verified
    * near-dup PAIR counts at every candidate threshold, from ONE fast-path
    * pass run at the lowest candidate (higher thresholds are subsets, so
    * one banded+verified pair list answers the whole sweep — a CASE-ladder
    * aggregate, not |thresholds| dedup runs). Read next to
    * [[minhashTuning]] when calibrating a production dedup pass. */
  def dedupRateCurve(docs: DataFrame, idCol: String, textCol: String,
                     thresholds: Seq[Double], shingleSize: Int = 3,
                     k: Int = 24, bands: Int = 6, estSlack: Double = 0.25,
                     maxBucket: Int = 0): DataFrame = {
    require(thresholds.nonEmpty, "need at least one candidate threshold")
    val spark = docs.sparkSession
    import spark.implicits._
    val tMin = thresholds.min
    val pairs = minhashNearDupsFast(docs, idCol, textCol, tMin, shingleSize,
      k, bands, estSlack, maxBucket, md5Base = true)
    val aggs = thresholds.zipWithIndex.map { case (t, i) =>
      sum(when(col("jaccard") >= t, 1L).otherwise(0L)).as(s"__p$i") }
    val row = pairs.agg(aggs.head, aggs.tail: _*).head()
    thresholds.zipWithIndex.map { case (t, i) => (t, row.getLong(i)) }
      .toDF("threshold", "n_pairs")
  }

  /** DuckDB oracle replaying [[dedupRateCurve]] over the fast-path pair
    * list at the lowest threshold. */
  def dedupRateCurveOracleSql(table: String, idCol: String, textCol: String,
                              thresholds: Seq[Double], shingleSize: Int = 3,
                              k: Int = 24, bands: Int = 6,
                              estSlack: Double = 0.25, maxBucket: Int = 0,
                              seed: Long = 7L): String = {
    val tMin = thresholds.min
    val rows = thresholds.map(t => s"SELECT $t AS threshold").mkString(" UNION ALL ")
    s"""WITH ${minhashFastCtes(table, idCol, textCol, tMin, shingleSize, k,
                               bands, estSlack, maxBucket, seed)},
       pr AS (SELECT jaccard FROM p WHERE jaccard >= $tMin),
       th AS ($rows)
       SELECT th.threshold,
         CAST(coalesce(sum(CASE WHEN pr.jaccard >= th.threshold THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_pairs
       FROM th LEFT JOIN pr ON true
       GROUP BY th.threshold ORDER BY th.threshold"""
  }

  /** SOFT dedup: instead of dropping near-duplicates, weight every document
    * by 1/|its near-dup cluster| (integer micro-units) — the re-weighting
    * policy that keeps all text visible to training while the cluster's
    * TOTAL influence equals one document's. Singletons weigh 1.0. Same
    * cluster machinery as [[nearDupClusters]]; the extra cost is one
    * |clusters|-row aggregate and an id-keyed join against the paired
    * sliver of the corpus.
    */
  def softDedupWeights(docs: DataFrame, pairs: DataFrame,
                       idCol: String): DataFrame = {
    val cl = nearDupClusters(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    val sizes = cl.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    docs.select(col(idCol))
      .join(cl, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .join(sizes, Seq("cluster_id"), "left")
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
      .withColumn("weight_micro",
        round(lit(1e6) / col("cluster_size")).cast("long"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("weight_micro"))
  }

  /** DuckDB oracle for [[softDedupWeights]] over the FAST-path pair graph. */
  def softDedupWeightsOracleSql(table: String, idCol: String, textCol: String,
                                threshold: Double, shingleSize: Int = 3,
                                k: Int = 24, bands: Int = 6,
                                estSlack: Double = 0.25, maxBucket: Int = 0,
                                seed: Long = 7L): String =
    s"""WITH RECURSIVE ${minhashFastCtes(table, idCol, textCol, threshold,
                                         shingleSize, k, bands, estSlack,
                                         maxBucket, seed)},
         pr AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
         e AS (SELECT id1 AS a, id2 AS b FROM pr
               UNION ALL SELECT id2, id1 FROM pr),
         reach(node, rr) AS (
           SELECT a, a FROM e
           UNION
           SELECT reach.node, e.b FROM reach JOIN e ON reach.rr = e.a),
         cl AS (SELECT node AS $idCol, min(rr) AS cluster_id FROM reach GROUP BY node),
         sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1),
         g AS (SELECT d.$idCol, coalesce(cl.cluster_id, d.$idCol) AS cluster_id,
                      coalesce(sz.cluster_size, 1) AS cluster_size
               FROM $table d LEFT JOIN cl USING ($idCol)
                             LEFT JOIN sz ON cl.cluster_id = sz.cluster_id)
       SELECT $idCol, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
         CAST(round(1000000.0 / cluster_size) AS BIGINT) AS weight_micro
       FROM g ORDER BY $idCol"""

  /** DuckDB oracle for [[Graph.pageRankMicro]] over the FAST-path pair
    * graph: the same `iters` steps unrolled as sequential CTEs — identical
    * init, identical per-edge rounding, identical base term. */
  def pageRankFastOracleSql(table: String, idCol: String, textCol: String,
                            threshold: Double, iters: Int,
                            damping: Double = 0.85, shingleSize: Int = 3,
                            k: Int = 24, bands: Int = 6,
                            estSlack: Double = 0.25, maxBucket: Int = 0,
                            seed: Long = 7L): String = {
    // literals are spelled as the same arithmetic the Scala side evaluates
    // ((1.0 - 0.85) is NOT the double literal 0.15)
    val d = damping.toString
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
           SELECT e.dst AS node,
             CAST(round((1.0 - $d) * 1000000.0 / nn.n) AS BIGINT)
               + CAST(sum(CAST(round($d * r.r / dg.deg) AS BIGINT)) AS BIGINT) AS r
           FROM ed e JOIN r${i - 1} r ON e.src = r.node
                     JOIN dg ON e.src = dg.src
                     CROSS JOIN nn
           GROUP BY e.dst, nn.n)"""
    }.mkString(",\n         ")
    s"""WITH ${minhashFastCtes(table, idCol, textCol, threshold, shingleSize,
                               k, bands, estSlack, maxBucket, seed)},
         prr AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
         ed AS (SELECT id1 AS src, id2 AS dst FROM prr
                UNION SELECT id2, id1 FROM prr),
         dg AS (SELECT src, count(*) AS deg FROM ed GROUP BY 1),
         nn AS (SELECT CAST(count(DISTINCT src) AS DOUBLE) AS n FROM ed),
         r0 AS (SELECT s.src AS node, CAST(round(1000000.0 / nn.n) AS BIGINT) AS r
                FROM (SELECT DISTINCT src FROM ed) s CROSS JOIN nn),
         $iterCtes
       SELECT node, r AS rank_micro FROM r$iters ORDER BY node"""
  }

  /** DuckDB oracle replaying [[Graph.triangleStats]] over the
    * [[minhashNearDupsFast]] pair graph. The triangle SET is
    * orientation-invariant, so the oracle enumerates by the simple
    * id-canonical order (a < b < c) — Spark's degree-ordered orientation
    * must produce the identical per-node counts. */
  def triangleStatsFastOracleSql(table: String, idCol: String,
                                 textCol: String, threshold: Double,
                                 shingleSize: Int = 3, k: Int = 24,
                                 bands: Int = 6, estSlack: Double = 0.25,
                                 maxBucket: Int = 0,
                                 seed: Long = 7L): String =
    s"""WITH ${minhashFastCtes(table, idCol, textCol, threshold, shingleSize,
                               k, bands, estSlack, maxBucket, seed)},
       prr AS (SELECT id1, id2 FROM p WHERE jaccard >= $threshold),
       ed AS (SELECT least(id1, id2) AS a, greatest(id1, id2) AS b
              FROM prr WHERE id1 <> id2 GROUP BY 1, 2),
       tr AS (SELECT e1.a, e1.b, e2.b AS c
              FROM ed e1 JOIN ed e2 ON e1.b = e2.a
                         JOIN ed e3 ON e3.a = e1.a AND e3.b = e2.b),
       tn AS (SELECT a AS node FROM tr UNION ALL SELECT b FROM tr
              UNION ALL SELECT c FROM tr),
       tc AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
              FROM tn GROUP BY 1),
       dg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
                (SELECT a AS node FROM ed UNION ALL SELECT b FROM ed)
              GROUP BY 1)
       SELECT dg.node, dg.degree,
         COALESCE(tc.triangles, 0) AS triangles,
         CASE WHEN dg.degree < 2 THEN 0
              ELSE CAST(round(2000000.0 * COALESCE(tc.triangles, 0) /
                (dg.degree * (dg.degree - 1))) AS BIGINT)
         END AS lcc_micro
       FROM dg LEFT JOIN tc USING (node) ORDER BY dg.node"""

  /** Self-instruct pool dedup by ROUGE-L (Wang et al., ACL 2023 §3.2 —
    * the Alpaca gate): an instruction drops when its ROUGE-L F1 against
    * ANY lower-id pool member reaches `thresholdMicro` (the engine's
    * standard drop-on-lower-id-pair policy, same as the dedup sweep).
    *
    * DELIBERATE divergence from the paper: Wang et al. compare each
    * candidate only against the KEPT pool, so a chain a~b~c keeps c when
    * b was dropped; this operator compares against ALL lower-id members
    * (b's drop does not resurrect c), which can over-drop near-duplicate
    * chains. The kept-pool semantics is inherently sequential (each
    * verdict depends on every earlier verdict — a driver-side loop at
    * corpus scale); the lower-id policy is one distributed max and, on
    * near-dup CHAINS, closer to the connected-component resolution the
    * rest of the dedup family uses. Oracle parity is unaffected (both
    * engines implement the same policy).
    *
    * The O(m·n) LCS kernel runs ONLY on banded candidate pairs — MinHash
    * gives recall at corpus scale, the character-order-aware F1 gives the
    * precision word-shingle Jaccard lacks on short imperative texts
    * (shared phrasing, different order). Token lists slice to
    * `maxTokens`, so per-pair cost is a configured budget.
    *
    * Scale: tokens join the pair list (pair-bounded, not corpus-bounded),
    * one generated DP call per pair, one id2-keyed max, one left join
    * back to the pool. */
  def instructionDedupRougeL(docs: DataFrame, idCol: String, textCol: String,
                             pairs: DataFrame, thresholdMicro: Long,
                             maxTokens: Int = 32): DataFrame = {
    import graft.functions.TextFns
    val toks = docs.select(col(idCol).as("__id"),
      slice(TextFns.tokens(col(textCol)), 1, maxTokens).as("__t"))
    val scored = pairs.select(col("id1"), col("id2"))
      .join(toks.select(col("__id").as("id1"), col("__t").as("__ta")), "id1")
      .join(toks.select(col("__id").as("id2"), col("__t").as("__tb")), "id2")
      .select(col("id1"), col("id2"),
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.LcsLength(
            org.apache.spark.sql.GraftColumnBridge.expression(col("__ta")),
            org.apache.spark.sql.GraftColumnBridge.expression(col("__tb"))))
          .as("lcs"),
        size(col("__ta")).cast("long").as("m"),
        size(col("__tb")).cast("long").as("n"))
      .select(col("id1"), col("id2"),
        expr("2L * lcs * 1000000L div (m + n)").as("f1_micro"))
    val worst = scored.groupBy(col("id2").as(idCol))
      .agg(max(col("f1_micro")).as("mx"))
    docs.select(col(idCol))
      .join(worst, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("mx"), lit(0L)).as("max_f1_lower_micro"),
        (coalesce(col("mx"), lit(0L)) < thresholdMicro).as("kept"))
  }

  /** DuckDB oracle replaying [[instructionDedupRougeL]] over the
    * [[minhashNearDupsFast]] candidate pairs. */
  def instructionDedupOracleSql(table: String, idCol: String,
                                textCol: String, jaccardThreshold: Double,
                                rougeThresholdMicro: Long, maxTokens: Int,
                                shingleSize: Int = 3, k: Int = 24,
                                bands: Int = 6, estSlack: Double = 0.25,
                                maxBucket: Int = 0, seed: Long = 7L): String =
    s"""WITH RECURSIVE ${minhashFastCtes(table, idCol, textCol,
          jaccardThreshold, shingleSize, k, bands, estSlack, maxBucket, seed)},
       prr AS (SELECT id1, id2 FROM p WHERE jaccard >= $jaccardThreshold),
       ldims AS (SELECT pr.id1 AS k1, pr.id2 AS k2,
           (string_split_regex(trim(a.$textCol), '\\s+'))[1:$maxTokens] AS ta,
           (string_split_regex(trim(b.$textCol), '\\s+'))[1:$maxTokens] AS tb
         FROM prr pr JOIN $table a ON a.$idCol = pr.id1
                     JOIN $table b ON b.$idCol = pr.id2),
       ${Evaluation.lcsRecursiveCtes},
       mx AS (SELECT k2 AS id, max(2 * lcs * 1000000 // (m + n)) AS mx
              FROM lcsv GROUP BY 1)
       SELECT d.$idCol, coalesce(mx.mx, 0) AS max_f1_lower_micro,
         coalesce(mx.mx, 0) < $rougeThresholdMicro AS kept
       FROM $table d LEFT JOIN mx ON mx.id = d.$idCol
       ORDER BY d.$idCol"""

  /** Exact-Jaccard verification of candidate pairs. Shingles are compared as
    * 64-bit hashes, not strings: identical Jaccard (collisions are
    * birthday-bounded below ~1e-9 at web scale) at a fraction of the shuffle
    * bytes. */
  private def verifyExact(cands: DataFrame, sh: DataFrame, idCol: String,
                          threshold: Double): DataFrame = {
    // only documents that appear in a candidate pair need their shingle
    // sets — semi-join before hashing/caching, so the cached footprint is
    // O(candidates), not O(corpus) (at 100 TB candidates are a sliver).
    // The pair set itself is read three times (two id sides + the final
    // join) — cache it so the band join runs once. Both caches are
    // MEMORY_AND_DISK and bounded by the candidate set; their lifecycle is
    // LRU eviction (the result stays lazy, so there is no unpersist point).
    val c = cands.cache()
    val ids = c.select(col("id1").as(idCol))
      .union(c.select(col("id2").as(idCol))).distinct()
    val hashed = sh.join(ids, Seq(idCol), "left_semi")
      .select(col(idCol),
        array_distinct(transform(col("sh"), s => xxhash64(s))).as("hs"))
      .cache() // read twice (id1/id2 sides); hash the shingle sets once
    c
      .join(hashed.select(col(idCol).as("id1"), col("hs").as("hs1")), Seq("id1"))
      .join(hashed.select(col(idCol).as("id2"), col("hs").as("hs2")), Seq("id2"))
      .withColumn("jaccard",
        size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
        size(array_union(col("hs1"), col("hs2"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** SimHash (Charikar '02): bit j of the signature carries the sign of the
    * sum over tokens of (±1 by bit j of the token's hash). Near-dups = small
    * Hamming distance. Computed as a pure PROJECTION — one native generated
    * pass per row ([[simhashRow]]), no explode, no shuffle: a signature is
    * a per-document property, so the relational explode + 63-conditional-
    * sum aggregate form (the first implementation) paid a corpus-wide
    * shuffle for grouping that the row kernel gets for free. One signature
    * per input ROW — ids are assumed unique (the pipe contract); the
    * parity spec pins the projection to the relational form bit-for-bit.
    *
    * Token bits come from md5 (not xxhash64) so ANSI SQL engines reproduce
    * the signature exactly: bit j = nibble (j div 4) of the hex digest,
    * masked by 1 << (j mod 4). 63 bits, keeping the signature a positive
    * signed 64-bit integer on both sides. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int = 63): DataFrame =
    docs.select(col(idCol), simhashRow(col(textCol), bits).as("simhash"))

  /** DuckDB oracle reproducing [[simhash]] bit-for-bit from md5 digests. */
  def simhashOracleSql(table: String, idCol: String, textCol: String,
                       bits: Int = 63): String =
    s"""WITH ${simhashSigCtes(table, idCol, textCol, bits)}
       SELECT $idCol, simhash FROM sig ORDER BY $idCol"""

  /** The [[simhash]] signature as a CTE chain ending in
    * `sig(idCol, simhash)` — shared by the signature and near-dup oracles
    * so the bit formula lives in exactly one place. */
  private def simhashSigCtes(table: String, idCol: String, textCol: String,
                             bits: Int): String = {
    val bitSums = (0 until bits).map { j =>
      s"""SUM(CASE WHEN (instr('0123456789abcdef', substring(h, ${j / 4 + 1}, 1)) - 1) & ${1 << (j % 4)} != 0 THEN 1 ELSE -1 END) AS b$j"""
    }.mkString(", ")
    val sigExpr = (0 until bits).map { j =>
      s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ")
    s"""tok AS (
         SELECT $idCol, unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS t
         FROM $table),
       h AS (SELECT $idCol, md5(t) AS h FROM tok),
       b AS (SELECT $idCol, $bitSums FROM h GROUP BY $idCol),
       sig AS (SELECT $idCol, $sigExpr AS simhash FROM b)"""
  }

  /** SimHash near-dup pairs: documents whose 63-bit [[simhash]] signatures
    * differ in at most `maxHamming` bits — the web-crawl near-dup detector
    * of Manku, Jain & Das Sarma (WWW '07). Candidates come from an
    * equi-join on FOUR signature bands (16+16+16+15 bits): by pigeonhole,
    * any pair within Hamming distance 3 agrees exactly on at least one
    * band, so the banded join is EXACT for maxHamming ≤ 3 — zero misses,
    * never all-pairs. The verify is one codegen'd `bit_count(xor)` per
    * candidate.
    *
    * Scale: the corpus-sized work is [[simhash]]'s scan-side signature
    * projection (a zero-shuffle native kernel per row) plus the band
    * shuffle of 4 narrow rows per document for the equi-join. A
    * template-heavy corpus can make a band bucket hot, but those
    * collisions already agree on ≥15 signature bits — overwhelmingly true
    * near-dups — and the MinHash path's hot-bucket cap pattern applies
    * unchanged if a pathological corpus needs it. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "maxHamming in [0, 3]: 4 bands over 63 bits guarantee exactness only there")
    val sig = simhash(docs, idCol, textCol)
    val banded = sig.select(col(idCol), col("simhash"),
      posexplode(simhashBandCols(col("simhash"))).as(Seq("band", "bv")))
    val l = banded.select(col(idCol).as("id1"), col("simhash").as("h1"),
      col("band"), col("bv"))
    val r = banded.select(col(idCol).as("id2"), col("simhash").as("h2"),
      col("band"), col("bv"))
    l.join(r, Seq("band", "bv"))
      .where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Per-ROW simhash signature — the [[simhash]] formula as ONE native
    * generated expression ([[graft.expressions.SimHashRow]]): a single
    * primitive-array pass per row inside whole-stage codegen, ZERO
    * shuffle, which makes it legal inside a streaming projection and the
    * right shape for stamping signatures at ingest. (The first cut
    * composed 63 higher-order `aggregate` folds — Spark evaluates HOF
    * lambdas interpreted, the same trap the MinHash kernel hit; the
    * native kernel is the fix, bit-identical by the parity spec.) */
  def simhashRow(text: Column, bits: Int = 63): Column = {
    require(bits >= 1 && bits <= 63, "bits must be in [1, 63]")
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.SimHashRow(
        org.apache.spark.sql.GraftColumnBridge.expression(text), bits))
  }

  /** Stored-index band rows from a PRE-COMPUTED signature column — the
    * streaming/ingest-side counterpart of [[simhashBands]] (which fits the
    * signature itself). */
  def simhashBandsFromSig(df: DataFrame, idCol: String, sigCol: String,
                          buckets: Int): DataFrame =
    df.select(col(idCol), col(sigCol).as("simhash"),
        posexplode(simhashBandCols(col(sigCol))).as(Seq("band", "bv")))
      .withColumn("bucket",
        col("band").cast("long") * lit(buckets.toLong) +
          pmod(col("bv"), lit(buckets.toLong)))

  /** DuckDB oracle for a CROSS-SET simhash near-dup probe (arriving set ×
    * history): `leftPred` / `rightPred` are SQL predicates over aliases
    * `a` (arriving) and `h` (history) selecting the two sides from the
    * shared signature table. */
  def simhashCrossOracleSql(table: String, idCol: String, textCol: String,
                            leftPred: String, rightPred: String,
                            maxHamming: Int): String =
    s"""WITH ${simhashSigCtes(table, idCol, textCol, 63)}
       SELECT a.$idCol AS sid, h.$idCol AS hist_id,
         CAST(bit_count(xor(a.simhash, h.simhash)) AS INTEGER) AS hamming
       FROM sig a JOIN sig h
         ON bit_count(xor(a.simhash, h.simhash)) <= $maxHamming
       WHERE ($leftPred) AND ($rightPred)
       ORDER BY sid, hist_id"""

  /** The 16/16/16/15-bit band values of a 63-bit simhash signature —
    * shared by the pair join and the stored index so the pigeonhole split
    * lives in one place. */
  private def simhashBandCols(sig: Column): Column = array(
    sig.bitwiseAND(lit(0xFFFFL)),
    shiftright(sig, 16).bitwiseAND(lit(0xFFFFL)),
    shiftright(sig, 32).bitwiseAND(lit(0xFFFFL)),
    shiftright(sig, 48).bitwiseAND(lit(0x7FFFL)))

  /** SimHash STORED-index rows: (id, simhash, band, bv, bucket) — four
    * narrow rows per document, bucket = band·buckets + (bv mod buckets) so
    * a bucket-clustered pipe has 4·buckets partition directories and a
    * probe reads at most 4 of them. The signature rides along, so probes
    * verify Hamming distance from the INDEX alone — text is never
    * re-read. Folding bv into buckets only enlarges a probe's candidate
    * set (the exact (band, bv) filter runs after the partition-pruned
    * read), so the maxHamming ≤ 3 exactness guarantee survives storage. */
  def simhashBands(docs: DataFrame, idCol: String, textCol: String,
                   buckets: Int = 64): DataFrame = {
    require(buckets >= 1, "buckets must be positive")
    simhash(docs, idCol, textCol)
      .select(col(idCol), col("simhash"),
        posexplode(simhashBandCols(col("simhash"))).as(Seq("band", "bv")))
      .withColumn("bucket",
        col("band").cast("long") * lit(buckets.toLong) +
          pmod(col("bv"), lit(buckets.toLong)))
  }

  /** DuckDB oracle for a stored-simhash-index PROBE of one query document:
    * because the banded probe is pigeonhole-exact at Hamming ≤ 3, the
    * oracle is the DIRECT formula — every other document whose signature
    * sits within `maxHamming` bits of the query's. */
  def simhashProbeOracleSql(table: String, idCol: String, textCol: String,
                            qid: Long, maxHamming: Int): String =
    s"""WITH ${simhashSigCtes(table, idCol, textCol, 63)}
       SELECT least(a.$idCol, $qid) AS id1, greatest(a.$idCol, $qid) AS id2,
         CAST(bit_count(xor(a.simhash, q.simhash)) AS INTEGER) AS hamming
       FROM sig a, (SELECT simhash FROM sig WHERE $idCol = $qid) q
       WHERE a.$idCol <> $qid
         AND bit_count(xor(a.simhash, q.simhash)) <= $maxHamming
       ORDER BY id1, id2"""

  /** DuckDB oracle replaying [[simhashNearDups]] — the shared signature
    * CTEs, the same 16/16/16/15 band split, `bit_count(xor)` verify. */
  def simhashNearDupsOracleSql(table: String, idCol: String, textCol: String,
                               maxHamming: Int): String =
    s"""WITH ${simhashSigCtes(table, idCol, textCol, 63)},
       band AS (
         SELECT $idCol, simhash, bb,
           CASE WHEN bb = 3 THEN (simhash >> 48) & 32767
                ELSE (simhash >> (16 * bb)) & 65535 END AS bv
         FROM sig, (SELECT unnest(generate_series(0, 3)) AS bb)),
       cand AS (
         SELECT DISTINCT l.$idCol AS id1, r.$idCol AS id2,
           l.simhash AS h1, r.simhash AS h2
         FROM band l JOIN band r ON l.bb = r.bb AND l.bv = r.bv
         WHERE l.$idCol < r.$idCol)
       SELECT id1, id2, CAST(bit_count(xor(h1, h2)) AS INTEGER) AS hamming
       FROM cand
       WHERE bit_count(xor(h1, h2)) <= $maxHamming
       ORDER BY id1, id2"""

  /** Asymmetric shingle-CONTAINMENT pairs — near-superset detection
    * (Broder '97's containment c(A,B) = |S(A)∩S(B)| / |S(A)|): ordered
    * document pairs where at least `thresholdMicro` millionths of A's
    * word n-gram shingles also occur in B. Catches what symmetric Jaccard
    * misses: quoted articles, aggregator pages, and boilerplate-expanded
    * copies where the smaller document is swallowed whole but the pair's
    * union is large.
    *
    * Containment is computed over the INFORMATIVE shingle space: shingles
    * occurring in more than `maxDocsPerShingle` documents (corpus
    * boilerplate) drop right after the one shingle-keyed aggregate. That
    * bounds the per-shingle pair fanout at maxDocsPerShingle²
    * (configuration, not data — the winnowing-pairs discipline) and keeps
    * ubiquitous phrases from inflating every pair's overlap; scores are
    * containment within the informative space, a documented semantic, not
    * an approximation of the raw ratio. Shingles travel as 60-bit md5
    * keys; the score is an exact integer micro-unit division, so the SQL
    * oracle replays it bit-for-bit. Output one row PER DIRECTION (id1
    * contained in id2).
    *
    * Shape: ONE corpus-sized aggregate (shingle → id list), then a double
    * explode emits every ordered pair INCLUDING the (id, id) diagonal —
    * the diagonal's count is exactly the doc's informative-shingle size,
    * so pair overlaps and sizes fall out of the SAME groupBy, read once
    * through a window partitioned by id1. No persist, no self-join, no
    * second pass over the corpus — the three-read cache sensitivity of
    * the join formulation is structurally gone.
    *
    * Hot-key memory bound: the id list is accumulated by
    * [[graft.expressions.CappedLongList]], which STOPS at
    * `maxDocsPerShingle + 1` elements inside the aggregation buffer
    * itself (map-side partials included). A corpus-ubiquitous shingle
    * ("terms of service…" in 10⁸ documents) therefore never materializes
    * its full id list anywhere — it costs `cap + 1` longs per buffer and
    * is dropped by the `size <= cap` filter, whose semantics are
    * unchanged because any list that WOULD have exceeded the cap arrives
    * truncated to the sentinel length `cap + 1`. Aggregate state is
    * configuration-bounded, not data-bounded. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, thresholdMicro: Long,
                       maxDocsPerShingle: Int): DataFrame = {
    require(n >= 1 && thresholdMicro >= 0 && maxDocsPerShingle >= 2,
      "bad containment parameters")
    // any integral id works — CappedLongList's buffer is Array[Long], so
    // narrower types widen losslessly; only non-integral ids are rejected
    val idType = docs.schema(idCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
        .contains(idType),
      s"containmentPairs needs an integral id column, got $idType")
    val docsWide =
      if (idType == org.apache.spark.sql.types.LongType) docs
      else docs.withColumn(idCol, col(idCol).cast("long"))
    // spread the shingle+md5 kernel (guide §2.5 single-split input; the
    // chrf-gram move) — downstream is two aggregates + one window, so the
    // wider map side doesn't fan into many small stages
    val sh = graft.Tables.spread(docsWide).select(col(idCol),
        explode(array_distinct(
          TextFns.wordShingles(lower(col(textCol)), n))).as("s"))
      .select(col(idCol), TextFns.md5Long60(col("s")).as("h"))
    val cappedIds = GraftColumnBridge.column(
      graft.expressions.CappedLongList(
        GraftColumnBridge.expression(col(idCol)),
        maxDocsPerShingle).toAggregateExpression())
    val lists = sh.groupBy(col("h"))
      .agg(cappedIds.as("ids"))
      .where(size(col("ids")) <= maxDocsPerShingle)
    val pairs = lists
      .select(explode(col("ids")).as("id1"), col("ids"))
      .select(col("id1"), explode(col("ids")).as("id2"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("inter"))
    val w = Window.partitionBy(col("id1"))
    pairs
      .withColumn("sz",
        max(when(col("id1") === col("id2"), col("inter"))).over(w))
      .where(col("id1") =!= col("id2"))
      .withColumn("containment_micro", expr("inter * 1000000L div sz"))
      .where(col("containment_micro") >= thresholdMicro)
      .select(col("id1"), col("id2"), col("containment_micro"))
  }

  /** DuckDB oracle replaying [[containmentPairs]] — identical shingle
    * hashing, boilerplate prune, and integer micro-unit division. */
  def containmentPairsOracleSql(table: String, idCol: String, textCol: String,
                                n: Int, thresholdMicro: Long,
                                maxDocsPerShingle: Int): String =
    s"""WITH tok AS (
         SELECT $idCol AS id, string_split_regex(trim(lower($textCol)), '\\s+') AS t
         FROM $table),
       u AS (
         SELECT DISTINCT id,
           CAST(('0x' || substring(md5(array_to_string(t[j:j+${n - 1}], ' ')), 1, 15)) AS BIGINT) AS h
         FROM tok, unnest(generate_series(1, len(t) - ${n - 1})) AS s(j)
         WHERE len(t) >= $n),
       rare AS (SELECT h FROM u GROUP BY h HAVING count(*) <= $maxDocsPerShingle),
       p AS (SELECT id, h FROM u JOIN rare USING (h)),
       sz AS (SELECT id, count(*) AS sz FROM p GROUP BY id),
       i AS (
         SELECT a.id AS id1, b.id AS id2, count(*) AS inter
         FROM p a JOIN p b ON a.h = b.h AND a.id <> b.id
         GROUP BY 1, 2)
       SELECT id1, id2,
         CAST(inter AS BIGINT) * 1000000 // CAST(sz AS BIGINT) AS containment_micro
       FROM i JOIN sz ON sz.id = i.id1
       WHERE CAST(inter AS BIGINT) * 1000000 // CAST(sz AS BIGINT) >= $thresholdMicro
       ORDER BY id1, id2"""

  /** Embedding-cosine near-dup pairs: SRP signatures (shared hyperplanes
    * with [[SimilaritySearch]]) banded into `bands` buckets; candidates
    * collide on any band value and survivors are verified by exact cosine ≥
    * threshold. Candidates come from equi-joins on (band, bucket) — the same
    * never-cross-join shape as the MinHash pipeline, applied to the
    * embedding space. */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        planes: Seq[Seq[Double]], bands: Int,
                        threshold: Double): DataFrame = {
    val nBits = planes.size
    require(nBits % bands == 0, "bands must divide the signature width")
    val r = nBits / bands
    // r = 64 would make the mask (1L << 64) - 1 = 0 (Scala shifts mod 64):
    // every row lands in ONE bucket and the candidate join goes quadratic
    require(r <= 63, s"band width $r exceeds the 63-bit bucket mask")
    val mask = (1L << r) - 1
    val sig = emb.select(col(idCol),
      graft.functions.VectorFns.srpSignaturePlanes(col(vecCol), planes).as("sig"))
    val banded = sig.select(col(idCol), posexplode(
        array((0 until bands).map(b =>
          shiftright(col("sig"), b * r).bitwiseAND(lit(mask))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
    val l = banded.select(col(idCol).as("id1"), col("band"), col("bv"))
    val rr = banded.select(col(idCol).as("id2"), col("band"), col("bv"))
    val cands = l.join(rr, Seq("band", "bv"))
      .where(col("id1") < col("id2")).select("id1", "id2").distinct()
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("ev"))
    cands
      .join(e.select(col(idCol).as("id1"), col("ev").as("ev1")), Seq("id1"))
      .join(e.select(col(idCol).as("id2"), col("ev").as("ev2")), Seq("id2"))
      .withColumn("cosine",
        graft.functions.VectorFns.cosine(col("ev1"), col("ev2")))
      .where(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
  }

  /** SRP-LSH parameter tuning — the embedding-space analog of
    * [[minhashTuning]]: for every (bands, rows) factorization of the
    * nBits SRP signature, the MEASURED candidate workload on this corpus
    * (Σ n·(n−1)/2 over the band buckets) next to the theoretical collision
    * probability at the target cosine (per-bit agreement
    * p = 1 − arccos(cos)/π, so P(match) = 1 − (1 − p^r)^b). The sample run
    * before committing an embedding near-dup / ANN-bucketing configuration.
    * One cached signature pass; each configuration costs one shuffle of
    * (band, bucket) longs. The probability is computed ONCE driver-side
    * and embedded as a literal in both engines — no acos/pow parity risk. */
  def srpTuning(emb: DataFrame, idCol: String, vecCol: String,
                planes: Seq[Seq[Double]], targetCosine: Double): DataFrame = {
    val nBits = planes.size
    val sig = emb.select(col(idCol),
      graft.functions.VectorFns.srpSignaturePlanes(col(vecCol), planes).as("sig"))
      .cache()
    val reports = (1 to nBits).filter(nBits % _ == 0)
      .filter(b => nBits / b <= 63).map { b =>
        val r = nBits / b
        val mask = (1L << r) - 1
        val banded = sig.select(posexplode(array((0 until b).map(bb =>
          shiftright(col("sig"), bb * r).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "bv")))
        banded.groupBy(col("band"), col("bv")).agg(count(lit(1)).as("n"))
          .agg(coalesce(sum(expr("n * (n - 1) / 2")), lit(0L)).cast("long")
            .as("candidate_checks"))
          .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
            col("candidate_checks"),
            lit(srpMatchMicro(targetCosine, r, b)).as("p_match_micro"))
      }
    val out = reports.reduce(_ unionByName _).localCheckpoint(true)
    sig.unpersist()
    out
  }

  /** Driver-side P(band match) at the target cosine, in micro-units — the
    * ONE computation both engines embed as a literal. */
  private def srpMatchMicro(targetCosine: Double, r: Int, b: Int): Long = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, targetCosine))) / math.Pi
    math.round((1.0 - math.pow(1.0 - math.pow(p, r), b)) * 1e6)
  }

  /** DuckDB oracle replaying [[srpTuning]]: the shared SRP signature from
    * the same hyperplanes, per-factorization bucket counts UNION'd, the
    * match probability as the identical precomputed literal. */
  def srpTuningOracleSql(table: String, idCol: String, vecCol: String,
                         planes: Seq[Seq[Double]],
                         targetCosine: Double): String = {
    val nBits = planes.size
    val sigExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(ev, ${p.mkString("[", ",", "]")}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val cfgs = (1 to nBits).filter(nBits % _ == 0)
      .filter(b => nBits / b <= 63).map { b =>
        val r = nBits / b
        val mask = (1L << r) - 1
        s"""SELECT $b AS bands, $r AS rows_per_band,
              coalesce((SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) FROM (
                SELECT count(*) AS n FROM (
                  SELECT s.id, u.bb, (s.sig >> (u.bb * $r)) & $mask AS bv
                  FROM sig s CROSS JOIN
                    (SELECT unnest(generate_series(0, ${b - 1})) AS bb) u) g
                GROUP BY bb, bv) c), 0) AS candidate_checks,
              CAST(${srpMatchMicro(targetCosine, r, b)} AS BIGINT) AS p_match_micro"""
      }
    s"""WITH e AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       sig AS (SELECT id, $sigExpr AS sig FROM e)
       SELECT * FROM (${cfgs.mkString(" UNION ALL ")}) ORDER BY bands"""
  }

  /** DuckDB oracle reproducing [[embeddingNearDups]] end-to-end from the
    * same hyperplanes. */
  def embeddingNearDupsOracleSql(table: String, idCol: String, vecCol: String,
                                 planes: Seq[Seq[Double]], bands: Int,
                                 threshold: Double): String = {
    val nBits = planes.size
    val r = nBits / bands
    val mask = (1L << r) - 1
    val sigExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(ev, ${p.mkString("[", ",", "]")}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val bandSelects = (0 until bands).map { b =>
      s"SELECT $idCol, $b AS band, (sig >> ${b * r}) & $mask AS bv FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       sig AS (SELECT $idCol, $sigExpr AS sig FROM e),
       bands AS ($bandSelects),
       cand AS (
         SELECT DISTINCT a.$idCol AS id1, b.$idCol AS id2
         FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
           AND a.$idCol < b.$idCol)
       SELECT c.id1, c.id2,
         list_dot_product(e1.ev, e2.ev) /
         (sqrt(list_dot_product(e1.ev, e1.ev)) * sqrt(list_dot_product(e2.ev, e2.ev))) AS cosine
       FROM cand c JOIN e e1 ON c.id1 = e1.$idCol JOIN e e2 ON c.id2 = e2.$idCol
       WHERE cosine >= $threshold ORDER BY c.id1, c.id2"""
  }

  /** Cross-document duplicated n-gram statistics — the Gopher/RefinedWeb
    * "fraction of tokens inside duplicated n-grams" quality signal (Rae et
    * al. 2021 §A1.1; Penedo et al. 2023 §3.2): an n-gram is DUPLICATED when
    * it occurs more than once across the whole corpus; a token position is
    * covered when any duplicated n-gram spans it. Emits per document the
    * token count, covered-token count, and covered fraction.
    *
    * Pipeline: positions → md5 n-gram hashes (oracle-replayable; swap a
    * rolling hash at will) → ONE global count per hash (map-side combined —
    * the only table-wide shuffle, key = 1 hash) → semi-join back to the
    * gram starts → explode each duplicated gram into its n positions →
    * per-doc distinct-position count. Only duplicated grams explode, so the
    * fan-out is ∝ duplication, not corpus size.
    */
  def dupNgramStats(docs: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    val toks = docs.select(col(idCol),
      posexplode(graft.functions.TextFns.tokens(lower(col(textCol))))
        .as(Seq("pos", "tok")))
    val grams = docs.select(col(idCol),
        posexplode(graft.functions.TextFns.wordShingles(lower(col(textCol)), n))
          .as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"), md5(col("gram")).as("h"))
    val dupHashes = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1).select(col("h"))
    val covered = grams.join(dupHashes, "h")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("pos"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("pos")).as("covered_tokens"))
    val totals = toks.groupBy(col(idCol)).agg(count(lit(1)).as("n_tokens"))
    totals.join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        (coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("dup_fraction"))
  }

  /** Cross-set embedding near-dups — SEMANTIC decontamination, the
    * embedding-space complement of [[Corpus.decontaminate]]'s n-gram
    * overlap (paraphrased benchmark leakage that shares no 8-gram still
    * lands next to the benchmark item in embedding space). Corpus rows
    * whose cosine against any benchmark vector reaches the threshold are
    * flagged with the offending benchmark id.
    *
    * Shape: SRP band equi-join between the two sets — never a cross join —
    * and the benchmark side (small by definition: eval sets) broadcasts in
    * both the candidate join and the exact-cosine verify, so the corpus
    * never shuffles. */
  def embeddingCrossNearDups(corpus: DataFrame, corpusId: String,
                             bench: DataFrame, benchId: String,
                             vecCol: String, planes: Seq[Seq[Double]],
                             bands: Int, threshold: Double): DataFrame = {
    val nBits = planes.size
    require(nBits % bands == 0, "bands must divide the signature width")
    val r = nBits / bands
    // r = 64 would make the mask (1L << 64) - 1 = 0 (Scala shifts mod 64):
    // every row lands in ONE bucket and the candidate join goes quadratic
    require(r <= 63, s"band width $r exceeds the 63-bit bucket mask")
    val mask = (1L << r) - 1
    def banded(df: DataFrame, id: String, as: String) =
      df.select(col(id).as(as),
          graft.functions.VectorFns.srpSignaturePlanes(col(vecCol), planes).as("sig"))
        .select(col(as), posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * r).bitwiseAND(lit(mask))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
    val cands = banded(corpus, corpusId, "corpus_id")
      .join(broadcast(banded(bench, benchId, "bench_id")), Seq("band", "bv"))
      .select("corpus_id", "bench_id").distinct()
    val ce = corpus.select(col(corpusId).as("corpus_id"),
      col(vecCol).cast("array<double>").as("__cv"))
    val be = bench.select(col(benchId).as("bench_id"),
      col(vecCol).cast("array<double>").as("__bv"))
    // candidates broadcast too (bounded by bench size × collision rate), so
    // the corpus vector table is never on the shuffled side of any join —
    // without the hint a large candidate set flips this to a sort-merge
    // join and the whole corpus shuffles by id
    ce.join(broadcast(cands), "corpus_id").join(broadcast(be), "bench_id")
      .withColumn("cosine",
        graft.functions.VectorFns.cosine(col("__cv"), col("__bv")))
      .where(col("cosine") >= threshold)
      .select(col("corpus_id"), col("bench_id"), col("cosine"))
  }

  /** DuckDB oracle reproducing [[embeddingCrossNearDups]] end-to-end from
    * the same hyperplanes; `corpusPred`/`benchPred` carve the two sets out
    * of one table. */
  def embeddingCrossNearDupsOracleSql(table: String, idCol: String,
                                      vecCol: String, planes: Seq[Seq[Double]],
                                      bands: Int, threshold: Double,
                                      corpusPred: String,
                                      benchPred: String): String = {
    val nBits = planes.size
    val r = nBits / bands
    val mask = (1L << r) - 1
    val sigExpr = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(ev, ${p.mkString("[", ",", "]")}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    val bandSelects = (0 until bands).map { b =>
      s"SELECT $idCol, $b AS band, (sig >> ${b * r}) & $mask AS bv FROM sig"
    }.mkString(" UNION ALL ")
    s"""WITH e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       sig AS (SELECT $idCol, $sigExpr AS sig FROM e),
       bands AS ($bandSelects),
       cb AS (SELECT * FROM bands WHERE $corpusPred),
       bb AS (SELECT * FROM bands WHERE $benchPred),
       cand AS (
         SELECT DISTINCT c.$idCol AS corpus_id, b.$idCol AS bench_id
         FROM cb c JOIN bb b ON c.band = b.band AND c.bv = b.bv)
       SELECT cand.corpus_id, cand.bench_id,
         list_dot_product(e1.ev, e2.ev) /
         (sqrt(list_dot_product(e1.ev, e1.ev)) * sqrt(list_dot_product(e2.ev, e2.ev))) AS cosine
       FROM cand JOIN e e1 ON cand.corpus_id = e1.$idCol
                 JOIN e e2 ON cand.bench_id = e2.$idCol
       WHERE cosine >= $threshold ORDER BY corpus_id, bench_id"""
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * in embedding space with the pair search PRUNED to k-means cells —
    * vectors are compared only against others in the SAME cluster, so the
    * candidate volume is Σ|cell|² instead of N² (the paper dedups
    * multi-billion-vector corpora exactly this way, growing the cell count
    * with the corpus to bound cell width). Cell assignment is the
    * shuffle-free argmax projection of [[SimilaritySearch.withIvfCell]];
    * the only shuffles key on the cell id (pair join) and vector id (label
    * propagation). Mutually-similar vectors (cosine ≥ threshold,
    * transitively within a cell) collapse to their lowest id via
    * [[nearDupClusters]]; each vector reports its representative and an
    * int 0/1 survival flag (reference has no embedding surface; ground
    * truth is the exact intra-cell pair graph's transitive closure).
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val reps = nearDupClusters(
      semanticDedupPairs(emb, idCol, vecCol, centroids, threshold))
    emb.select(col(idCol))
      .join(reps.select(col("doc_id").as(idCol), col("cluster_id")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("rep_id"),
        (coalesce(col("cluster_id"), col(idCol)) === col(idCol))
          .cast("int").as("keep"))
  }

  /** INCREMENTAL SemDeDup: the new survivors of an arriving batch against a
    * STORED survivor set — the embedding-space member of the incremental
    * dedup family (Bloom for exact, the band index for MinHash). History is
    * never re-clustered: a batch row is a duplicate when ANY stored
    * survivor in its cell is within the cosine threshold (one cell-keyed
    * join against the survivor slice, which the caller reads
    * partition-pruned to the batch's cells); rows that pass then dedup
    * AMONG THEMSELVES with the standard intra-cell pair → min-label
    * closure, and the cluster minima are the batch's new survivors — the
    * rows to blind-append to the survivor pipe.
    *
    * `batch` and `survivors` both carry (cell, idCol, vecCol); cells must
    * come from the SAME centroids (the survivor pipe stores its cell as
    * the partition axis, so this is automatic). */
  def semanticNewSurvivors(batch: DataFrame, survivors: DataFrame,
                           idCol: String, vecCol: String,
                           threshold: Double): DataFrame = {
    val bc = batch.select(col("cell"), col(idCol),
      col(vecCol).cast("array<double>").as("__bv"))
    val hc = survivors.select(col("cell"),
      col(vecCol).cast("array<double>").as("__hv"))
    val dupVsHist = bc.join(hc, "cell")
      .where(graft.functions.VectorFns.cosine(col("__bv"), col("__hv")) >= threshold)
      .select(col(idCol)).distinct()
    val passed = bc.join(dupVsHist, Seq(idCol), "left_anti")
    val l = passed.select(col("cell"), col(idCol).as("id1"), col("__bv").as("v1"))
    val r = passed.select(col("cell"), col(idCol).as("id2"), col("__bv").as("v2"))
    val pairs = l.join(r, "cell")
      .where(col("id1") < col("id2"))
      .where(graft.functions.VectorFns.cosine(col("v1"), col("v2")) >= threshold)
      .select(col("id1"), col("id2"))
    val cl = nearDupClusters(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    passed.join(cl, Seq(idCol), "left")
      .where(coalesce(col("cluster_id"), col(idCol)) === col(idCol))
      .select(col(idCol), col("cell"))
  }

  /** DuckDB oracle replaying the INCREMENTAL SemDeDup pipeline
    * ([[semanticDedup]] over the base slice, then [[semanticNewSurvivors]]
    * for the batch slice): shared centroid rule from the BASE slice, the
    * base closure, the batch-vs-history check, and the batch-internal
    * closure — the exact two-phase semantics. */
  def semanticDedupSyncOracleSql(table: String, idCol: String, vecCol: String,
                                 centroidMax: Int, basePred: String,
                                 batchPred: String, threshold: Double): String = {
    def cos(a: String, b: String) =
      s"""list_dot_product($a, $b) /
          (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"""
    s"""WITH RECURSIVE
       e AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS cid, ev AS cvec FROM e
                 WHERE ($basePred) AND $idCol < $centroidMax),
       asg AS (
         SELECT $idCol, ev, cid AS cell FROM (
           SELECT e.$idCol, e.ev, c.cid,
             row_number() OVER (PARTITION BY e.$idCol
               ORDER BY list_dot_product(e.ev, c.cvec)
                 / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.cid) AS rn
           FROM e, cents c) WHERE rn = 1),
       pa AS (
         SELECT x.$idCol AS id1, y.$idCol AS id2
         FROM asg x JOIN asg y ON x.cell = y.cell AND x.$idCol < y.$idCol
         WHERE (${basePred.replace(idCol, s"x.$idCol")})
           AND (${basePred.replace(idCol, s"y.$idCol")})
           AND ${cos("x.ev", "y.ev")} >= $threshold),
       eda AS (SELECT id1 AS a, id2 AS b FROM pa UNION SELECT id2, id1 FROM pa),
       reacha(node, r) AS (
         SELECT a, a FROM eda
         UNION
         SELECT reacha.node, eda.b FROM reacha JOIN eda ON reacha.r = eda.a),
       laba AS (SELECT node, min(r) AS rep FROM reacha GROUP BY node),
       surva AS (
         SELECT e.$idCol FROM e LEFT JOIN laba ON laba.node = e.$idCol
         WHERE ($basePred) AND coalesce(laba.rep, e.$idCol) = e.$idCol),
       bchk AS (
         SELECT b.$idCol FROM asg b
         WHERE (${batchPred.replace(idCol, s"b.$idCol")})
           AND NOT EXISTS (
             SELECT 1 FROM surva s JOIN asg sa ON sa.$idCol = s.$idCol
             WHERE sa.cell = b.cell AND ${cos("sa.ev", "b.ev")} >= $threshold)),
       pasg AS (SELECT a.* FROM asg a JOIN bchk USING ($idCol)),
       pb AS (
         SELECT x.$idCol AS id1, y.$idCol AS id2
         FROM pasg x JOIN pasg y ON x.cell = y.cell AND x.$idCol < y.$idCol
         WHERE ${cos("x.ev", "y.ev")} >= $threshold),
       edb AS (SELECT id1 AS a, id2 AS b FROM pb UNION SELECT id2, id1 FROM pb),
       reachb(node, r) AS (
         SELECT a, a FROM edb
         UNION
         SELECT reachb.node, edb.b FROM reachb JOIN edb ON reachb.r = edb.a),
       labb AS (SELECT node, min(r) AS rep FROM reachb GROUP BY node),
       keepb AS (
         SELECT bc.$idCol FROM bchk bc LEFT JOIN labb ON labb.node = bc.$idCol
         WHERE coalesce(labb.rep, bc.$idCol) = bc.$idCol)
       SELECT $idCol,
         CAST(CASE WHEN ($basePred) THEN 1 ELSE 0 END AS INT) AS from_base
       FROM (SELECT $idCol FROM surva UNION ALL SELECT $idCol FROM keepb) u
       ORDER BY $idCol"""
  }

  /** The pair stage of [[semanticDedup]]: intra-cell candidate pairs above
    * the cosine threshold. The only shuffle keys on the cell id (equi-join);
    * candidate volume is Σ|cell|², never N². */
  def semanticDedupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         centroids: Seq[Seq[Double]],
                         threshold: Double): DataFrame = {
    val cells = SimilaritySearch.withIvfCell(emb, vecCol, centroids, "__cell")
      .select(col("__cell"), col(idCol), col(vecCol).cast("array<double>").as("__ev"))
    val a = cells.select(col("__cell"), col(idCol).as("id1"), col("__ev").as("ev1"))
    val b = cells.select(col("__cell"), col(idCol).as("id2"), col("__ev").as("ev2"))
    a.join(b, "__cell")
      .where(col("id1") < col("id2"))
      .where(graft.functions.VectorFns.cosine(col("ev1"), col("ev2")) >= threshold)
      .select(col("id1"), col("id2"))
  }

  /** DuckDB oracle reproducing [[semanticDedup]] end-to-end: centroids
    * re-derived by the deterministic `$idCol < n` rule, the same
    * argmax cell assignment, exact intra-cell cosine pairs, and the pair
    * graph's transitive closure via a recursive CTE. */
  def semanticDedupOracleSql(table: String, idCol: String, vecCol: String,
                             nCentroids: Int, threshold: Double): String =
    s"""WITH RECURSIVE
       e0 AS (SELECT $idCol, CAST($vecCol AS DOUBLE[]) AS ev FROM $table),
       cents AS (SELECT $idCol AS cid, ev AS cvec FROM e0 WHERE $idCol < $nCentroids),
       asg AS (
         SELECT $idCol, ev, cid FROM (
           SELECT e0.$idCol, e0.ev, c.cid,
             row_number() OVER (PARTITION BY e0.$idCol
               ORDER BY list_dot_product(e0.ev, c.cvec) / sqrt(list_dot_product(c.cvec, c.cvec)) DESC, c.cid) AS rn
           FROM e0, cents c) WHERE rn = 1),
       p AS (
         SELECT a.$idCol AS id1, b.$idCol AS id2
         FROM asg a JOIN asg b ON a.cid = b.cid AND a.$idCol < b.$idCol
         WHERE list_dot_product(a.ev, b.ev) /
           (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev))) >= $threshold),
       ed AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
       reach(node, r) AS (
         SELECT a, a FROM ed
         UNION
         SELECT reach.node, ed.b FROM reach JOIN ed ON reach.r = ed.a),
       lab AS (SELECT node, min(r) AS rep FROM reach GROUP BY node)
       SELECT e0.$idCol, coalesce(lab.rep, e0.$idCol) AS rep_id,
         CAST(CASE WHEN coalesce(lab.rep, e0.$idCol) = e0.$idCol THEN 1 ELSE 0 END AS INT) AS keep
       FROM e0 LEFT JOIN lab ON lab.node = e0.$idCol
       ORDER BY e0.$idCol"""

  /** Character-level duplicated-span statistics — the signal behind EXACT
    * SUBSTRING dedup (Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better": verbatim substrings of ≥ `n` characters
    * repeated anywhere in the corpus). A char n-gram occurring more than
    * once corpus-wide marks its positions; per document, the fraction of
    * characters inside such spans (overlap-safe distinct positions).
    *
    * Same relational shape as [[dupNgramStats]] at character granularity:
    * the ONE table-wide shuffle carries a 60-bit truncated-md5 key per
    * gram (oracle-replayable); only DUPLICATED grams fan out into
    * positions, so the expensive explode is ∝ duplication, not corpus
    * size. (The paper's suffix array finds maximal spans; the n-gram form
    * is the standard sharded approximation — every duplicated span of
    * length ≥ n is fully covered by its duplicated n-grams.) */
  def dupCharSpanStats(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 20): DataFrame = {
    require(n >= 2, "span length must be >= 2")
    val grams = docs.select(col(idCol),
        posexplode(TextFns.charNgrams(col(textCol), n)).as(Seq("pos", "g")))
      .select(col(idCol), col("pos"),
        TextFns.md5Long60(col("g")).as("h"))
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select(col("h"))
    val covered = grams.join(dup, "h")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("p")).as("covered_chars"))
    docs.select(col(idCol), length(col(textCol)).cast("long").as("n_chars"))
      .join(covered, Seq(idCol), "left")
      .select(col(idCol), col("n_chars"),
        coalesce(col("covered_chars"), lit(0L)).as("covered_chars"))
      .withColumn("dup_fraction",
        col("covered_chars").cast("double") / col("n_chars").cast("double"))
  }

  /** DuckDB oracle replaying [[dupCharSpanStats]]. */
  def dupCharSpanStatsOracleSql(table: String, idCol: String, textCol: String,
                                n: Int = 20): String =
    s"""WITH g AS (
         SELECT $idCol, u.i - 1 AS pos,
           CAST(('0x' || substring(md5(substring(lower($textCol), u.i, $n)), 1, 15)) AS BIGINT) AS h
         FROM $table, unnest(generate_series(1, greatest(length($textCol) - ${n - 1}, 0))) AS u(i)),
       dup AS (SELECT h FROM (SELECT h, count(*) AS c FROM g GROUP BY 1) WHERE c > 1),
       cov AS (
         SELECT $idCol, CAST(count(DISTINCT p) AS BIGINT) AS covered_chars
         FROM (SELECT g.$idCol, u2.p FROM g JOIN dup USING (h),
               unnest(generate_series(g.pos, g.pos + ${n - 1})) AS u2(p))
         GROUP BY 1)
       SELECT d.$idCol, CAST(length(d.$textCol) AS BIGINT) AS n_chars,
         coalesce(c.covered_chars, 0) AS covered_chars,
         coalesce(c.covered_chars, 0)::DOUBLE / length(d.$textCol)::DOUBLE AS dup_fraction
       FROM $table d LEFT JOIN cov c USING ($idCol) ORDER BY d.$idCol"""

  /** Exact-substring duplicate REMOVAL (the dedup Lee et al. 2021 §4.1
    * actually apply, not just the [[dupCharSpanStats]] signal): every
    * character covered by a corpus-duplicated n-gram occurrence is CUT
    * from the document, except in the gram's first occurrence
    * (lowest doc id, then lowest position — the keeper). Overlapping and
    * adjacent cut spans merge, and the cleaned text is the ordered
    * concatenation of the surviving segments. Case-sensitive raw-text
    * grams (true exact-substring semantics; the stats op's lowercased
    * grams answer a different, fuzzier question).
    *
    * Scale, stage by stage: the gram hash explode is the one corpus-sized
    * pass (60-bit keys — 8-byte rows into the duplicate-count aggregate,
    * map-side combined); the keeper window runs only over occurrences of
    * DUPLICATED grams (∝ duplication, not corpus); interval merging is a
    * per-doc window over cut spans; and reconstruction joins |spans| rows
    * back to their documents — a doc with no duplicated spans never
    * enters any window and passes through the final left join untouched.
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 20): DataFrame = {
    require(n >= 2, "span length must be >= 2")
    val txt = col(textCol)
    val grams = docs.select(col(idCol),
        posexplode(when(length(txt) < n, array().cast("array<string>"))
          .otherwise(transform(
            sequence(lit(1), length(txt) - lit(n - 1)),
            i => txt.substr(i, lit(n))))).as(Seq("i0", "g")))
      .select(col(idCol), (col("i0") + lit(1)).cast("long").as("pos"),
        TextFns.md5Long60(col("g")).as("h"))
    val dupH = grams.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select(col("h"))
    val nonKeeper = grams.join(dupH, "h")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col(idCol), col("pos"))))
      .where(col("rn") > 1)
      .select(col(idCol), col("pos").as("start"),
        (col("pos") + lit(n - 1).cast("long")).as("end"))
    // gaps-and-islands merge of overlapping/touching cut spans (1-based
    // inclusive intervals): a span starts a new island iff it begins past
    // every previous span's reach
    val w = Window.partitionBy(col(idCol)).orderBy(col("start"), col("end"))
    val islands = nonKeeper
      .withColumn("reach", max(col("end")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("reach").isNull || col("start") > col("reach") + 1, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("ni")).over(w))
    val merged = islands.groupBy(col(idCol), col("island"))
      .agg(min(col("start")).as("start"), max(col("end")).as("end"))
    val withPrev = merged.withColumn("pe",
      lag(col("end"), 1, 0L).over(Window.partitionBy(col(idCol)).orderBy(col("start"))))
    // collect_list state ≤ merged islands per doc ≤ the doc's own span
    // count — a per-doc interval regroup whose buffer caps at the single
    // largest document, never the corpus
    val perDoc = withPrev.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("start"), col("pe")))).as("ivs"),
        max(col("end")).as("last_e"),
        sum(col("end") - col("start") + lit(1L)).as("removed"))
    docs.join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        when(col("last_e").isNull, txt).otherwise(concat(
          array_join(transform(col("ivs"), iv =>
            txt.substr((iv.getField("pe") + lit(1L)).cast("int"),
              (iv.getField("start") - iv.getField("pe") - lit(1L)).cast("int"))), ""),
          txt.substr((col("last_e") + lit(1L)).cast("int"), length(txt))))
          .as("clean_text"),
        length(txt).cast("long").as("n_chars"),
        coalesce(col("removed"), lit(0L)).as("removed_chars"))
  }

  /** DuckDB oracle replaying [[removeDupSpans]] — same keeper rule, same
    * island merge, reconstruction via lag + ordered string_agg. */
  def removeDupSpansOracleSql(table: String, idCol: String, textCol: String,
                              n: Int = 20): String =
    s"""WITH g AS (
         SELECT $idCol, CAST(u.i AS BIGINT) AS pos,
           CAST(('0x' || substring(md5(substring($textCol, CAST(u.i AS INT), $n)), 1, 15)) AS BIGINT) AS h
         FROM $table, unnest(generate_series(1, greatest(length($textCol) - ${n - 1}, 0))) AS u(i)),
       dup AS (SELECT h FROM (SELECT h, count(*) AS c FROM g GROUP BY 1) t WHERE c > 1),
       nk AS (SELECT $idCol, pos AS s, pos + ${n - 1} AS e FROM (
           SELECT g.$idCol, g.pos,
             row_number() OVER (PARTITION BY g.h ORDER BY g.$idCol, g.pos) AS rn
           FROM g JOIN dup USING (h)) o
         WHERE rn > 1),
       isl AS (SELECT $idCol, s, e,
           CASE WHEN max(e) OVER (PARTITION BY $idCol ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR s > max(e) OVER (PARTITION BY $idCol ORDER BY s, e
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
                THEN 1 ELSE 0 END AS ni
         FROM nk),
       isl2 AS (SELECT $idCol, s, e,
           sum(ni) OVER (PARTITION BY $idCol ORDER BY s, e
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         FROM isl),
       m AS (SELECT $idCol, island, min(s) AS s, max(e) AS e
             FROM isl2 GROUP BY 1, 2),
       wp AS (SELECT $idCol, s, e,
                lag(e, 1, 0) OVER (PARTITION BY $idCol ORDER BY s) AS pe
              FROM m),
       pieces AS (SELECT w.$idCol, w.s,
           substring(d.$textCol, CAST(w.pe + 1 AS INT), CAST(w.s - w.pe - 1 AS INT)) AS piece
         FROM wp w JOIN $table d USING ($idCol)),
       heads AS (SELECT $idCol, string_agg(piece, '' ORDER BY s) AS headtext
                 FROM pieces GROUP BY 1),
       tails AS (SELECT $idCol, max(e) AS last_e,
                   CAST(sum(e - s + 1) AS BIGINT) AS removed
                 FROM m GROUP BY 1)
       SELECT d.$idCol,
         CASE WHEN t.$idCol IS NULL THEN d.$textCol
              ELSE coalesce(h.headtext, '') ||
                   substring(d.$textCol, CAST(t.last_e + 1 AS INT)) END AS clean_text,
         CAST(length(d.$textCol) AS BIGINT) AS n_chars,
         coalesce(t.removed, 0) AS removed_chars
       FROM $table d LEFT JOIN heads h USING ($idCol) LEFT JOIN tails t USING ($idCol)
       ORDER BY d.$idCol"""

  /** Dedup-rate sweep over similarity thresholds — the threshold-tuning
    * curve a curation run reads BEFORE committing to a cutoff: for each
    * candidate threshold, how many documents would the keep-first policy
    * remove (a doc drops iff it pairs with ANY lower-id doc at ≥ t, i.e.
    * the distinct larger endpoints of the surviving pairs — exact for
    * THAT policy, and an upper bound on the greedy-against-KEPT-docs
    * variant, which re-keeps a doc whose only lower-id matches were
    * themselves dropped; no clustering needed). ONE pass over the
    * pair table computes every threshold's count (|thresholds|
    * conditional count-distincts); the row explode happens on the single
    * aggregated row. Pair mining cost stays upstream.
    */
  def dedupThresholdSweep(pairs: DataFrame, id1: String, id2: String,
                          simCol: String, thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold")
    val aggs = thresholds.zipWithIndex.map { case (t, i) =>
      countDistinct(when(col(simCol) >= t,
        greatest(col(id1), col(id2)))).as(s"__r$i")
    }
    val row = pairs.agg(aggs.head, aggs.tail: _*)
    thresholds.zipWithIndex.map { case (t, i) =>
      row.select(lit(math.round(t * 1e6)).as("threshold_micro"),
        col(s"__r$i").as("docs_removed"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB oracle replaying [[dedupThresholdSweep]] over `pairsSql`
    * (a table expression yielding (id1, id2, sim)). */
  def dedupThresholdSweepOracleSql(pairsSql: String, simCol: String,
                                   thresholds: Seq[Double]): String = {
    val arms = thresholds.map { t =>
      s"""SELECT CAST(${math.round(t * 1e6)} AS BIGINT) AS threshold_micro,
           CAST(count(DISTINCT CASE WHEN $simCol >= $t
             THEN greatest(id1, id2) END) AS BIGINT) AS docs_removed
         FROM p"""
    }
    s"""WITH p AS ($pairsSql)
       ${arms.mkString("", "\nUNION ALL\n", "\nORDER BY threshold_micro")}"""
  }

  /** Near-duplicate CLUSTERS from a pair list: connected components by
    * iterative min-label propagation (the hash-min variant of
    * large-star/small-star, Kiveris et al. 2014) — every document's label
    * converges to the smallest doc id reachable through the near-dup graph,
    * and dedup keeps one representative per label.
    *
    * Each iteration is one groupBy over the undirected edge list (min
    * neighbor label) + one join to update labels; iterations bound by the
    * graph diameter, which for near-dup graphs is tiny (clusters are
    * near-cliques — the classic observation behind single-linkage LSH
    * dedup). Driver state is one convergence counter per pass, never data.
    */
  /** In-memory union-find with min-id roots over collected 2-column
    * integral edge rows — the bounded driver branch shared by
    * [[nearDupClusters]] and [[nearDupClustersStar]]. Labels ≡ min
    * reachable id: the smaller root absorbs on every union, so each
    * tree's root stays its component's minimum; path compression in find
    * keeps chains amortized-flat. Returns EVERY distinct endpoint with
    * its component minimum (roots map to themselves). Callers gate the
    * collect on a counted edge cardinality. */
  private def driverComponentMins(rows: Array[org.apache.spark.sql.Row],
                                  isLong: Boolean): Seq[(Long, Long)] = {
    def lv(r: org.apache.spark.sql.Row, i: Int): Long =
      if (isLong) r.getLong(i) else r.getInt(i).toLong
    val parent = new java.util.HashMap[Long, Long](rows.length * 2)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    rows.foreach { row =>
      val a = lv(row, 0); val b = lv(row, 1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    parent.keySet().forEach { x => out += ((x, find(x))); () }
    out.toSeq
  }

  /** `driverGateEdges` exists for the equivalence spec (force the
    * distributed branch with 0); production callers use the default —
    * see [[nearDupClustersStar]] for the gate's scale argument. */
  def nearDupClusters(pairs: DataFrame, id1: String = "id1",
                      id2: String = "id2", maxIters: Int = 20,
                      driverGateEdges: Long = DriverUnionFindMaxEdges): DataFrame = {
    // Eager localCheckpoints truncate lineage each pass — without them every
    // iteration's plan embeds all previous iterations' plans and Catalyst
    // re-analysis grows quadratically (the classic iterative-DataFrame trap;
    // the checkpointed label table is two longs per node, so executor-local
    // storage is the cheap side of the trade at any scale).
    val edges = pairs.select(col(id1).as("a"), col(id2).as("b"))
      .union(pairs.select(col(id2).as("a"), col(id1).as("b")))
      .distinct().localCheckpoint(true)
    // SIZE-GATED DRIVER UNION-FIND (r16; the nearDupClustersStar gate
    // applied to the hash-min variant): the propagation loop costs
    // 3-4 tiny jobs per round × diameter; a counted directed-edge set at
    // or under the same absolute constant collapses it into one collect +
    // union-find whose labels are provably min-reachable — exactly this
    // loop's fixed point. The label table's node set is the edge
    // endpoints, so the driver mapping IS the output (self-loop-only
    // nodes appear as their own roots). Larger inputs and non-integral
    // id types take the loop below untouched.
    locally {
      val integralIds = edges.schema.fields.forall(f =>
        f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
      val edgeCount = edges.count()
      if (edgeCount > 0L && edgeCount <= driverGateEdges && integralIds &&
          edges.schema.fields.map(_.dataType).distinct.length == 1) {
        val rows = edges.collect()
        freeCheckpoint(edges)
        val isLong = rows.headOption.exists(_.get(0).isInstanceOf[Long])
        val spark = pairs.sparkSession
        import spark.implicits._
        var mapping = driverComponentMins(rows, isLong)
          .toDF("doc_id", "cluster_id")
        if (!isLong) mapping = mapping.select(
          col("doc_id").cast("int").as("doc_id"),
          col("cluster_id").cast("int").as("cluster_id"))
        return mapping
      }
      if (edgeCount == 0L)
        // empty graph: the loop below would converge to an empty label
        // table on its first pass — return the same empty frame directly
        // (the zero-row checkpoint stays readable for the projection)
        return edges.select(col("a").as("doc_id"), col("a").as("cluster_id"))
    }
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var converged = false
    var i = 0
    try {
      while (!converged && i < maxIters) {
        // smallest label among self and neighbors
        val neighborMin = edges.join(labels.withColumnRenamed("node", "b"), "b")
          .groupBy(col("a").as("node"))
          .agg(min(col("label")).as("nlabel"))
        // carry the old label through the SAME materialization so the
        // convergence test is a count over checkpointed data, not another join
        val next = labels.withColumnRenamed("label", "old")
          .join(neighborMin, Seq("node"), "left")
          .select(col("node"), col("old"),
            least(col("old"), coalesce(col("nlabel"), col("old"))).as("label"))
          .localCheckpoint(true)
        converged = next.where(col("label") =!= col("old")).isEmpty
        // `next` is materialized, so the previous pass's checkpoint blocks
        // are dead weight — release them NOW instead of letting them pile
        // up in executor storage across a long-lived session (the returned
        // final table is the one checkpoint the caller keeps)
        freeCheckpoint(labels)
        labels = next.select(col("node"), col("label"))
        i += 1
      }
    } finally { freeCheckpoint(edges); () }
    // a silent cap would return NON-minimal representatives for components
    // deeper than maxIters hops (labels advance one hop per pass) — wrong
    // dedup survivors with no signal. Near-dup components are near-cliques
    // (tiny diameter), so hitting this means the input is pathological or
    // maxIters was lowered; the caller can raise it.
    if (!converged) throw new IllegalStateException(
      s"label propagation did not converge within $maxIters iterations — " +
      "raise maxIters (component diameter exceeds it)")
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Near-duplicate clusters by the alternating large-star/small-star
    * connected-components algorithm (Kiveris et al. 2014, "Connected
    * Components in MapReduce and Beyond") — the adversarial-graph
    * counterpart of [[nearDupClusters]]. Hash-min propagation needs one
    * pass per hop of component diameter, which is fine for near-dup
    * graphs (near-cliques) but O(n) passes on a chain; the star
    * operations contract components to stars in O(log n) rounds
    * REGARDLESS of diameter, so this is the variant to reach for when the
    * pair graph can be a long path (transitive near-dup chains, e.g.
    * overlapping crawl snapshots where doc k only matches doc k±1).
    *
    * Each round is two grouped min-aggregates + two joins over the edge
    * list; edges stay canonical (big, small) so every intermediate is a
    * plain shuffled hash-aggregate — no windows, no driver state beyond
    * one convergence counter. Same output contract as
    * [[nearDupClusters]]: (doc_id, cluster_id = min reachable id).
    */
  /** `driverGateEdges` exists for the equivalence spec (force the
    * distributed branch with 0); production callers use the default. */
  def nearDupClustersStar(pairs: DataFrame, id1: String = "id1",
                          id2: String = "id2", maxRounds: Int = 32,
                          driverGateEdges: Long = DriverUnionFindMaxEdges): DataFrame = {
    // canonical undirected edge list, self-loops dropped
    var edges = pairs.select(
        greatest(col(id1), col(id2)).as("big"),
        least(col(id1), col(id2)).as("small"))
      .where(col("big") =!= col("small"))
      .distinct().localCheckpoint(true)
    // every node up front (from the RAW pairs, so self-loop-only nodes
    // keep their singleton cluster) — the loop contracts edges away
    val nodes = pairs.select(col(id1).as("node"))
      .union(pairs.select(col(id2).as("node")))
      .distinct().localCheckpoint(true)
    // carried cardinality of the live (distinct) edge set: convergence
    // below is count-gated, and the previous round's ss.count IS this
    // round's edges.count — one tiny job per round instead of two
    // exceptAll jobs (r15 job-ladder trim; equivalence argument at the
    // convergence site)
    var edgeCount = edges.count()
    // SIZE-GATED DRIVER UNION-FIND (r15 verdict item 3, approved shape):
    // the contraction loop costs ~6 tiny Spark jobs per round — pure
    // job-ladder overhead when the distinct edge set is small (incremental
    // CC frontiers are root-level and batch-bounded by construction). A
    // COUNTED edge set at or under the fixed constant collapses the whole
    // loop into one collect (≤ 2·MaxEdges longs, the same bounded-driver
    // pattern as broadcast thresholds) + an in-memory union-find whose
    // component labels are provably the min reachable id — identical to
    // the star fixed point (pinned on randomized graphs in
    // StarDriverEquivalenceSpec). The gate is an absolute edge COUNT,
    // never a fraction of the input, so a 100 TB pair graph takes the
    // distributed branch below untouched; non-integral id types also stay
    // distributed (the driver path would have to change their type).
    val integralIds = edges.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
      f.dataType == org.apache.spark.sql.types.IntegerType)
    if (edgeCount > 0L && edgeCount <= driverGateEdges && integralIds &&
        edges.schema.fields.map(_.dataType).distinct.length == 1) {
      val rows = edges.collect()
      freeCheckpoint(edges)
      val isLong = rows.headOption.exists(_.get(0).isInstanceOf[Long])
      val labels = driverComponentMins(rows, isLong)
        .filter { case (x, r) => r != x } // roots resolve via the left join
      val spark = pairs.sparkSession
      import spark.implicits._
      var mapping = labels.toDF("node", "root")
      if (!isLong) mapping = mapping.select(
        col("node").cast("int").as("node"), col("root").cast("int").as("root"))
      return nodes.join(mapping, Seq("node"), "left")
        .select(col("node").as("doc_id"),
          coalesce(col("root"), col("node")).as("cluster_id"))
    }
    var converged = edgeCount == 0L
    var i = 0
    // every live checkpoint, so ANY failure path (including mid-round, where
    // `ls` is live) releases all blocks — the r11 version freed only `nodes`
    // on exception and leaked `edges` + a mid-round `ls`
    val live = scala.collection.mutable.LinkedHashSet[DataFrame](edges, nodes)
    def ckpt(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint(true); live += c; c
    }
    def free(df: DataFrame): Unit = { freeCheckpoint(df); live -= df; () }
    try {
      while (!converged && i < maxRounds) {
        // large-star(u): every neighbor v > u re-attaches to
        // m(u) = min(Γ(u) ∪ {u}). Processing each undirected edge from its
        // smaller endpoint, the directed view of u's neighborhood is the
        // union of both orientations.
        val dir = edges.select(col("big").as("u"), col("small").as("v"))
          .union(edges.select(col("small").as("u"), col("big").as("v")))
        val mU = dir.groupBy("u").agg(min(col("v")).as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        val ls = ckpt(dir.join(mU, "u").where(col("v") > col("u"))
          .select(col("v").as("big"), col("m").as("small"))
          .where(col("big") =!= col("small"))
          .distinct())
        // small-star(u): u and its strictly-smaller neighbors all attach
        // to the minimum of that set. ls is already (big, small) with
        // big > small, so the smaller-neighbor view is ls itself keyed big.
        val mS = ls.groupBy(col("big").as("u")).agg(min(col("small")).as("m"))
        val ss = ckpt(ls.join(mS, ls("big") === mS("u"))
          .where(col("small") =!= col("m"))
          .select(col("small").as("big"), col("m").as("small"))
          .union(mS.select(col("u").as("big"), col("m").as("small")))
          .distinct())
        free(ls)
        // converged once the FULL round is the identity on the edge set.
        // Comparing ss to ls would be wrong: any one-parent forest is a
        // fixed point of small-star alone (ss == ls at non-star states),
        // while round-start == round-end only holds at star forests —
        // both ops map stars to themselves and the paper's potential
        // argument rules out any other composite fixed point.
        // Both sides are DISTINCT sets, so equality ⟺ equal cardinality
        // ∧ one-sided containment: a count of the (checkpointed) round
        // output gates the single exceptAll, replacing the former
        // two-exceptAll check — non-converged rounds usually exit on the
        // count alone (r15: this loop's cost is job count, not bytes).
        val ssCount = ss.count()
        converged = ssCount == edgeCount && ss.exceptAll(edges).isEmpty
        edgeCount = ssCount
        free(edges)
        edges = ss
        i += 1
      }
      if (!converged && i >= maxRounds)
        // O(log n) convergence means hitting this cap signals a broken input
        // (maxRounds=32 covers any component a real cluster could hold)
        throw new IllegalStateException(
          s"star contraction did not converge within $maxRounds rounds")
      // the fixed point must be a star forest — roots never appear as
      // children and every child has exactly one root; anything else would
      // silently emit wrong labels below, so verify rather than assume
      // one emptiness probe for both star-forest violations (roots that
      // appear as children; children with two parents) instead of two
      val nonStar = !edges.select(col("small")).intersect(edges.select(col("big")))
        .select(lit(1L).as("__bad"))
        .unionByName(edges.groupBy(col("big")).agg(count(lit(1)).as("c"))
          .where(col("c") > 1).select(lit(1L).as("__bad")))
        .isEmpty
      if (nonStar)
        throw new IllegalStateException(
          "star contraction reached a non-star fixed point")
      nodes
        .join(edges.select(col("big").as("node"), col("small").as("root")),
          Seq("node"), "left")
        .select(col("node").as("doc_id"),
          coalesce(col("root"), col("node")).as("cluster_id"))
    } catch {
      case t: Throwable => live.foreach(freeCheckpoint); throw t
    }
  }

  /** Fold of the incremental CC label pipe: cluster labels only DECREASE
    * (cluster_id = min reachable id, and merging clusters takes the min of
    * the mins), so the per-node minimum over all blind-appended
    * (node, root) rows IS the current label — one hash aggregate, no
    * pointer chasing at read. */
  def ccFold(labelRows: DataFrame): DataFrame =
    labelRows.groupBy(col("node")).agg(min(col("root")).as("cluster_id"))
      .select(col("node").as("doc_id"), col("cluster_id"))

  /** One INCREMENTAL connected-components step over stored label pipes —
    * near-dup cluster labels maintained as a derived pipe instead of
    * recomputed from the full pair graph every run (the missing sibling
    * of the band/cell/model/sketch index-sync family).
    *
    * State is TWO narrow pipes holding the SAME (node, root) rows under
    * two bucketings (the secondary-index move): by `node % buckets` for
    * current-label lookups, and by `root % buckets` for member scans when
    * a cluster merges away. A batch step reads only the touched nodes'
    * buckets and the merged-away roots' buckets — batch-proportional,
    * never the corpus:
    *
    *   1. current roots of the batch's nodes = min-fold of the touched
    *      node-buckets (absent ⇒ fresh node, its own root);
    *   2. lift each new pair to its endpoints' CURRENT roots → the
    *      frontier graph (batch-sized, roots and fresh ids only) and
    *      star-contract it ([[nearDupClustersStar]], O(log n) rounds);
    *   3. merged-away roots' MEMBERS relabel to the new root (read from
    *      the root-bucketed pipe; a root that merged away never recurs as
    *      a current root, so its stale member rows are never consulted
    *      again), and every touched node gets its new label row.
    *
    * Returned rows carry both bucket columns; the caller appends the
    * node-bucket projection to the label pipe and the root-bucket
    * projection to the member pipe. Because labels are monotone
    * decreasing, blind-append + [[ccFold]] ≡ full rebuild
    * ([[nearDupClusters]] over the union of all batches' pairs) — pinned
    * by FoldPropertySpec over randomized batch splits.
    *
    * Driver state: the two bucket-id collects (≤ `buckets` longs each);
    * the root mapping and member relabels stay distributed. */
  def ccIncrementRows(newPairs: DataFrame, id1: String, id2: String,
                      buckets: Int,
                      history: Option[(Seq[Long] => DataFrame,
                                       Seq[Long] => DataFrame)]): DataFrame = {
    val touched = newPairs.select(col(id1).as("node"))
      .union(newPairs.select(col(id2).as("node")))
      .distinct().localCheckpoint(true)
    val cur = (history match {
      case None => touched.select(col("node"), col("node").as("root"))
        .where(lit(false))
      case Some((readNodeBuckets, _)) =>
        val tb = touched.select(pmod(col("node"), lit(buckets.toLong)).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq
        readNodeBuckets(tb)
          .join(touched, Seq("node"), "left_semi")
          .groupBy(col("node")).agg(min(col("root")).as("root"))
    }).localCheckpoint(true)
    val e = newPairs
      .join(cur.select(col("node").as(id1), col("root").as("__r1")), Seq(id1), "left")
      .join(cur.select(col("node").as(id2), col("root").as("__r2")), Seq(id2), "left")
      .select(coalesce(col("__r1"), col(id1)).as("fa"),
              coalesce(col("__r2"), col(id2)).as("fb"))
      .where(col("fa") =!= col("fb"))
    // star-contract the ROOT frontier only (batch-sized, never the corpus)
    val starOut = nearDupClustersStar(e, "fa", "fb")
    val mapping = starOut.localCheckpoint(true)
    // the star output's plan still pins the contraction's final
    // nodes/edges checkpoint blocks — release them now that `mapping` is
    // snapped (the r11-ADVICE leak class: blocks nothing can reach)
    freeCheckpoint(starOut)
    val merged = mapping.where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("root"), col("cluster_id").as("new_root"))
      .localCheckpoint(true)
    val memberRows = history match {
      case Some((_, readRootBuckets)) if !merged.isEmpty =>
        val ab = merged.select(pmod(col("root"), lit(buckets.toLong)).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq
        readRootBuckets(ab)
          .join(merged, Seq("root"))
          .select(col("node"), col("new_root").as("root"))
      case _ => cur.where(lit(false)).select(col("node"), col("root"))
    }
    val storedTouched = cur
      .join(merged, Seq("root"), "left")
      .select(col("node"), coalesce(col("new_root"), col("root")).as("root"))
    val freshTouched = touched.join(cur, Seq("node"), "left_anti")
      .join(mapping.select(col("doc_id").as("node"), col("cluster_id")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("cluster_id"), col("node")).as("root"))
    val out = memberRows.unionByName(storedTouched).unionByName(freshTouched)
      .distinct()
      .select(pmod(col("node"), lit(buckets.toLong)).as("node_bucket"),
              pmod(col("root"), lit(buckets.toLong)).as("root_bucket"),
              col("node"), col("root"))
      .localCheckpoint(true)
    freeCheckpoint(touched); freeCheckpoint(cur)
    freeCheckpoint(mapping); freeCheckpoint(merged)
    out
  }

  /** Release the storage blocks of a localCheckpointed frame that has been
    * superseded. `df.rdd.unpersist` would NOT work — `.rdd` wraps the
    * internal checkpoint RDD in a fresh deserializing RDD — so walk the
    * analyzed plan to the LogicalRDD node that owns the blocks. The frame
    * becomes unevaluable afterwards (checkpoints have no lineage to
    * recompute from); callers only free frames nothing references. */
  private[graft] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false); ()
      case _ => ()
    }

  /** Exact duplicate groups by canonical fingerprint; keeps the lowest id as
    * the survivor (deterministic). */
  def exactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextFns.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Brute-force n-gram Jaccard over a bounded candidate set (same-source,
    * id-window) — the exact-arithmetic reference for the LSH pipeline and a
    * usable operator when candidates are pre-bucketed.
    *
    * The id-window constraint is part of the JOIN KEY, not a post-join
    * filter: ids band into blocks of `window`, the left side replicates to
    * its own and the next block, and the equi-join on (bucket, block) meets
    * exactly the pairs the window can admit. Intermediate size is bounded
    * by window² per block instead of |bucket|² — the standard banded
    * range-join shape. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        bucketCol: String, window: Long, n: Int,
                        threshold: Double): DataFrame = {
    // shingles compare as 64-bit hashes (identical Jaccard, birthday-bounded
    // collisions, a fraction of the shuffle and compare bytes — same trick
    // as the MinHash verify stage)
    val sh = docs.select(col(bucketCol).as("bucket"), col(idCol),
      array_distinct(transform(TextFns.wordShingles(col(textCol), n),
        s => xxhash64(s))).as("sh"))
    val blockOf = floor(col(idCol) / lit(window)).cast("long")
    // id1 < id2 <= id1+window ⇒ block(id2) ∈ {block(id1), block(id1)+1}
    val a = sh
      .withColumn("block", explode(array(blockOf, blockOf + 1)))
      .select(col("bucket"), col("block"), col(idCol).as("id1"), col("sh").as("sh1"))
    val b = sh
      .withColumn("block", blockOf)
      .select(col("bucket"), col("block"), col(idCol).as("id2"), col("sh").as("sh2"))
    a.join(b, Seq("bucket", "block"))
      .where(col("id1") < col("id2") && col("id2") - col("id1") <= window)
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }
}
