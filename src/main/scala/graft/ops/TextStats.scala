package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document text statistics beyond the Gopher/C4 gate set: classic
  * readability scoring (Flesch 1948 — still a standard curation signal for
  * kid-safe / simple-English subsets), lexical-diversity profiling
  * (type-token ratio and hapax share — boilerplate and generated text sit
  * at the extremes), and n-gram NOVELTY against a reference corpus (the
  * per-document complement of the eval-side contamination report: how much
  * of a candidate batch is actually new text?).
  *
  * All counts are exact integers; ratios divide to micro-units at the very
  * end (truncating div on positive operands — identical in Spark and
  * DuckDB), so the oracles replay bit-for-bit.
  *
  * Reference connection: Meerschaum has no text plane; these extend the
  * beyond-reference LLM-pipeline surface (SURVEY §2.12).
  */
object TextStats {

  /** Flesch reading-ease per document, from three codegen'd regex counts on
    * the scan (zero shuffle at any corpus size):
    * words = whitespace tokens, sentences = runs of [.!?] (floored at 1 so
    * punctuation-free text is one sentence), syllables = vowel-group runs
    * [aeiouy]+ of the lowercased text (groups never span whitespace, so
    * one whole-text count equals the per-word sum).
    * score_micro = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    * words), computed as exact integer products with truncating division —
    * both divisors are ≥ 1 by construction. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFns
    docs.select(col(idCol),
        TextFns.tokenCount(col(textCol)).cast("long").as("words"),
        greatest(lit(1L),
          regexp_count(col(textCol), lit("[.!?]+")).cast("long")).as("sentences"),
        regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
          .as("syllables"))
      .where(col("words") > 0)
      .withColumn("flesch_micro",
        expr("206835000L - (1015000L * words div sentences)" +
          " - (84600000L * syllables div words)"))
  }

  /** DuckDB oracle replaying [[readability]]. */
  def readabilityOracleSql(table: String, idCol: String,
                           textCol: String): String =
    s"""WITH src AS (
         SELECT $idCol AS id,
           CAST(len(string_split_regex(trim($textCol), '\\s+')) AS BIGINT) AS words,
           greatest(CAST(1 AS BIGINT),
             CAST(len(regexp_extract_all($textCol, '[.!?]+')) AS BIGINT)) AS sentences,
           CAST(len(regexp_extract_all(lower($textCol), '[aeiouy]+')) AS BIGINT)
             AS syllables
         FROM $table)
       SELECT id AS $idCol, words, sentences, syllables,
         206835000 - (1015000 * words // sentences)
           - (84600000 * syllables // words) AS flesch_micro
       FROM src WHERE words > 0 ORDER BY id"""

  /** Lexical-diversity profile per document: token count, distinct types,
    * hapax legomena (types occurring once IN THE DOCUMENT), type-token
    * ratio, and hapax share — near-zero TTR flags repetition loops, near-1
    * hapax flags word-salad generation. Tokens are the lowercased
    * whitespace unit shared with the vocab pipelines.
    *
    * Scale: explode → ONE (id, token) map-side-combined aggregate → ONE
    * id-keyed aggregate; both shuffles carry counts, never text. */
  def lexicalDiversity(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    import graft.functions.TextFns
    docs.select(col(idCol).as("id"),
        explode(TextFns.tokens(lower(col(textCol)))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(sum(col("cnt")).as("tokens"),
        count(lit(1)).as("types"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("hapax"))
      .select(col("id"), col("tokens"), col("types"), col("hapax"),
        expr("types * 1000000L div tokens").as("ttr_micro"),
        expr("hapax * 1000000L div types").as("hapax_micro"))
  }

  /** DuckDB oracle replaying [[lexicalDiversity]]. */
  def lexicalDiversityOracleSql(table: String, idCol: String,
                                textCol: String): String =
    s"""WITH tok AS (
         SELECT $idCol AS id,
           unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS token
         FROM $table),
       tc AS (SELECT id, token, CAST(count(*) AS BIGINT) AS cnt FROM tok
              WHERE length(token) > 0 GROUP BY id, token),
       d AS (SELECT id, CAST(sum(cnt) AS BIGINT) AS tokens,
               CAST(count(*) AS BIGINT) AS types,
               CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
             FROM tc GROUP BY id)
       SELECT id, tokens, types, hapax,
         types * 1000000 // tokens AS ttr_micro,
         hapax * 1000000 // types AS hapax_micro
       FROM d ORDER BY id"""

  /** Per-document n-gram NOVELTY vs a reference corpus: the fraction of a
    * candidate document's DISTINCT word shingles absent from the
    * reference — the acquisition-side mirror of the contamination report
    * ("is this crawl batch new text, or re-crawled boilerplate?").
    *
    * Scale: both sides reduce to 60-bit shingle hashes; the reference
    * collapses to its distinct grams BEFORE the one gram-keyed left join
    * (reference text never re-shuffles per candidate), and per-doc counts
    * aggregate after. Output ∝ candidate docs; docs too short to shingle
    * produce no rows (an empty shingle array explodes to nothing), so
    * they are OMITTED from the report rather than emitted as (0, null). */
  def ngramNovelty(candidates: DataFrame, reference: DataFrame, idCol: String,
                   textCol: String, n: Int): DataFrame =
    ngramNoveltyAgainstIndex(candidates, idCol, textCol, n,
      ngramHashes(reference, idCol, textCol, n).select(col("h")))

  /** Per-doc DISTINCT word-shingle 60-bit hashes — the shared gram kernel
    * of the novelty family: (id, h) rows, one per distinct gram per doc. */
  def ngramHashes(df: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame = {
    import graft.functions.TextFns
    df.select(col(idCol).as("id"),
        explode(array_distinct(TextFns.wordShingles(trim(col(textCol)), n)))
          .as("g"))
      .select(col("id"), TextFns.md5Long60(col("g")).as("h"))
  }

  /** Per-batch rows for the STORED reference-gram index: the batch's
    * distinct gram hashes, hash-bucketed for pipe clustering. Blind-append
    * per sync; grams shared across batches appear once per batch, so the
    * probe folds the store with a distinct — fold ≡ rebuild because
    * distinct(∪ batch-distinct grams) = distinct(corpus grams). */
  def gramIndexBatch(reference: DataFrame, idCol: String, textCol: String,
                     n: Int, buckets: Int = 8): DataFrame =
    ngramHashes(reference, idCol, textCol, n).select(col("h")).distinct()
      .select(pmod(col("h"), lit(buckets.toLong)).as("bucket"), col("h"))

  /** [[ngramNovelty]] scored against a STORED gram index instead of the
    * reference corpus — the probe side of the stored shape: the reference
    * text is never re-read, the candidate batch joins |distinct grams|
    * narrow rows. `storedGrams` is the gram pipe's `h` column (per-batch
    * duplicates folded here). */
  def ngramNoveltyAgainstIndex(candidates: DataFrame, idCol: String,
                               textCol: String, n: Int,
                               storedGrams: DataFrame): DataFrame = {
    val refGrams = storedGrams.select(col("h")).distinct()
      .withColumn("seen", lit(1))
    ngramHashes(candidates, idCol, textCol, n)
      .join(refGrams, Seq("h"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("id").as(idCol), col("n_grams"), col("n_novel"),
        expr("n_novel * 1000000L div n_grams").as("novelty_micro"))
  }

  /** Distinct-n diversity per group (Li et al. 2016 — the generation-set
    * diversity report): for each n, the group's distinct n-gram count over
    * its total n-gram count. Near-duplicate generations (mode collapse,
    * templated spam sources) crater distinct-2 long before any per-doc
    * signal moves. One grams pass per n into a (group, gram) aggregate,
    * then a |groups|-row rollup — integer micro ratio at the end. */
  def distinctN(docs: DataFrame, groupCol: String, textCol: String,
                ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    import graft.functions.TextFns
    require(ns.nonEmpty, "need at least one n")
    ns.map { n =>
      docs.select(col(groupCol).as("grp"),
          explode(TextFns.wordShingles(trim(col(textCol)), n)).as("g"))
        .groupBy(col("grp"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("grp"))
        .agg(sum(col("cnt")).as("total_grams"),
          count(lit(1)).as("distinct_grams"))
        .select(col("grp"), lit(n).as("n"), col("total_grams"),
          col("distinct_grams"),
          expr("distinct_grams * 1000000L div total_grams").as("distinct_micro"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB oracle replaying [[distinctN]]. */
  def distinctNOracleSql(table: String, groupExpr: String, textCol: String,
                         ns: Seq[Int]): String = {
    def one(n: Int) =
      s"""SELECT grp, $n AS n,
           CAST(sum(cnt) AS BIGINT) AS total_grams,
           CAST(count(*) AS BIGINT) AS distinct_grams,
           CAST(count(*) AS BIGINT) * 1000000
             // CAST(sum(cnt) AS BIGINT) AS distinct_micro
         FROM (
           SELECT grp, g, count(*) AS cnt FROM (
             SELECT $groupExpr AS grp,
               unnest(CASE WHEN len(t) < $n THEN CAST([] AS VARCHAR[])
                 ELSE list_transform(generate_series(1, len(t) - ${n - 1}),
                        i -> array_to_string(t[i:i+${n - 1}], ' ')) END) AS g
             FROM (SELECT *, string_split_regex(trim($textCol), '\\s+') AS t
                   FROM $table))
           GROUP BY 1, 2)
         GROUP BY grp"""
    ns.map(one).mkString("", "\nUNION ALL\n", "\nORDER BY grp, n")
  }

  /** Jensen–Shannon divergence between the unigram distributions of
    * every source pair (Lin 1991) — the domain-mix planning matrix:
    * JS(a,b) = ½Σ p·ln(2p/(p+q)) + ½Σ q·ln(2q/(p+q)), symmetric, finite
    * even on disjoint vocabularies (bounded by ln 2), the standard
    * "how different are these two crawls" number next to
    * [[graft.ops.Corpus]]'s shingle-Jaccard source overlap. Per-token
    * terms micro-quantize BEFORE the pair sums (order-independent longs);
    * the only doubles are count ratios of exact longs.
    *
    * Scale: the corpus collapses ONCE to (source, token, cnt); the pair
    * expansion fans each count row out |sources|−1 ways (sources are a
    * bounded dimension — tens, not data) and joins the counts back
    * token-keyed; output is |sources|²/2 rows. Text never shuffles. */
  def sourceJsMatrix(docs: DataFrame, sourceCol: String,
                     textCol: String): DataFrame = {
    import graft.functions.TextFns
    val counts = docs.select(col(sourceCol).as("src"),
        explode(TextFns.tokens(lower(trim(col(textCol))))).as("v"))
      .where(length(col("v")) > 0)
      .groupBy(col("src"), col("v")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.groupBy(col("src")).agg(sum(col("cnt")).as("n"))
    val pairs = counts
      .join(totals.select(col("src"), col("n").as("na")), Seq("src"))
      .crossJoin(broadcast(totals.select(col("src").as("sb"), col("n").as("nb"))))
      .where(col("sb") =!= col("src"))
    val joined = pairs.join(
        counts.select(col("src").as("sb"), col("v"), col("cnt").as("cb")),
        Seq("sb", "v"), "left")
      .select(col("src").as("sa"), col("sb"), col("na"), col("nb"),
        col("cnt").as("ca"), coalesce(col("cb"), lit(0L)).as("cb"))
    val p = col("ca").cast("double") / col("na")
    val q = col("cb").cast("double") / col("nb")
    // the matrix is |sources|²/2 rows — checkpoint it eagerly so `counts`
    // can unpersist HERE instead of leaking cache in long-lived sessions
    // (heapsLaw's localCheckpoint+unpersist pattern)
    val out = joined
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"),
        round(lit(0.5d) * p * log(lit(2.0d) * p / (p + q)) * lit(1e6))
          .cast("long").as("tm"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("tm")).as("js_micro"))
      .localCheckpoint(true)
    counts.unpersist(false)
    out
  }

  /** DuckDB oracle replaying [[sourceJsMatrix]]. */
  def sourceJsMatrixOracleSql(table: String, sourceCol: String,
                              textCol: String): String =
    s"""WITH toks AS (
         SELECT $sourceCol AS src,
           unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS v
         FROM $table),
       counts AS (SELECT src, v, CAST(count(*) AS BIGINT) AS cnt
                  FROM toks WHERE length(v) > 0 GROUP BY 1, 2),
       totals AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS n
                  FROM counts GROUP BY 1),
       pairs AS (SELECT c.src AS sa, t2.src AS sb, c.v, c.cnt AS ca,
                   t1.n AS na, t2.n AS nb
                 FROM counts c
                 JOIN totals t1 ON t1.src = c.src
                 JOIN totals t2 ON t2.src <> c.src),
       j AS (SELECT p.sa, p.sb, p.na, p.nb, p.ca, coalesce(c2.cnt, 0) AS cb
             FROM pairs p LEFT JOIN counts c2 ON c2.src = p.sb AND c2.v = p.v),
       terms AS (SELECT least(sa, sb) AS src_a, greatest(sa, sb) AS src_b,
                   CAST(round(0.5 * (CAST(ca AS DOUBLE) / na)
                     * ln(2.0 * (CAST(ca AS DOUBLE) / na)
                          / ((CAST(ca AS DOUBLE) / na) + (CAST(cb AS DOUBLE) / nb)))
                     * 1000000.0) AS BIGINT) AS tm
                 FROM j)
       SELECT src_a, src_b, CAST(sum(tm) AS BIGINT) AS js_micro
       FROM terms GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Vocabulary-growth checkpoints + Heaps'-law fit (Heaps 1978;
    * types ≈ K·tokens^β) — the tokenizer-budget planner: how fast does
    * this corpus mint new types as it grows? Checkpoints are doc-id
    * prefixes at the given fractions of the max id; each checkpoint
    * reports exact (tokens_seen, types) via the token table's
    * min-first-doc — the corpus is scanned ONCE into (token, min_id,
    * per-doc counts), checkpoints are |fracs| conditional sums over that
    * table, never re-scans. The log-log least-squares fit runs over the
    * |fracs|-row checkpoint table (one 1-row aggregate crossed back — no
    * window), β and ln K micro-rounded.
    */
  def heapsLaw(docs: DataFrame, idCol: String, textCol: String,
               fracsMicro: Seq[Long] = Seq(62500L, 125000L, 250000L,
                 500000L, 1000000L)): DataFrame = {
    import graft.functions.TextFns
    require(fracsMicro.nonEmpty && fracsMicro.forall(f => f > 0 && f <= 1000000L),
      "fractions must be in (0, 1e6] micro")
    val toks = docs.select(col(idCol).cast("long").as("id"),
        explode(TextFns.tokens(lower(trim(col(textCol))))).as("v"))
      .where(length(col("v")) > 0)
    val maxId = toks.agg(max(col("id")).as("max_id"))
    // ONE corpus pass into the (token, id, cnt) table; the checkpoint
    // sums re-read this (far narrower) table, never the corpus —
    // persisted so |fracs| conditional aggregates don't replay the explode
    val perId = toks.groupBy(col("v"), col("id")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cps = fracsMicro.map { f =>
      perId.crossJoin(broadcast(maxId))
        .select(expr(s"max_id * $f div 1000000").as("cp_id"),
          col("v"), col("id"), col("cnt"))
        .where(col("id") <= col("cp_id"))
        .groupBy(col("cp_id"))
        .agg(sum(col("cnt")).as("tokens_seen"),
          countDistinct(col("v")).as("types"))
        .select(lit(f).as("frac_micro"), col("cp_id"), col("tokens_seen"),
          col("types"))
    }.reduce(_ unionByName _)
      .localCheckpoint(true) // |fracs| rows; fit + final both read it
    perId.unpersist(false)
    // least squares on micro-quantized (x = ln tokens, y = ln types): the
    // log points round to exact longs BEFORE the sums, so the fit inputs
    // are order-independent integers and the only doubles are divisions
    // of exact longs — bit-replayable whatever partition order summed them
    val fit = cps.select(
        round(log(col("tokens_seen").cast("double")) * lit(1e6)).cast("long").as("x"),
        round(log(col("types").cast("double")) * lit(1e6)).cast("long").as("y"))
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(
        round((col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")) * lit(1e6))
          .cast("long").as("beta_micro"),
        round((col("sy") - (col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx")) * col("sx")) /
          col("k")).cast("long").as("ln_k_micro"))
    cps.crossJoin(broadcast(fit)).orderBy(col("frac_micro"))
  }

  /** DuckDB oracle replaying [[heapsLaw]] — same one-pass token table,
    * same conditional checkpoint sums, same closed-form fit. */
  def heapsLawOracleSql(table: String, idCol: String, textCol: String,
                        fracsMicro: Seq[Long]): String = {
    val fracRows = fracsMicro.mkString("[", ", ", "]")
    s"""WITH toks AS (
         SELECT CAST($idCol AS BIGINT) AS id, v FROM (
           SELECT $idCol,
             unnest(string_split_regex(trim(lower($textCol)), '\\s+')) AS v
           FROM $table) WHERE length(v) > 0),
       mx AS (SELECT max(id) AS max_id FROM toks),
       per_id AS (SELECT v, id, CAST(count(*) AS BIGINT) AS cnt
                  FROM toks GROUP BY 1, 2),
       fr AS (SELECT unnest(CAST($fracRows AS BIGINT[])) AS frac_micro),
       cps AS (SELECT fr.frac_micro,
                 mx.max_id * fr.frac_micro // 1000000 AS cp_id,
                 CAST(sum(p.cnt) AS BIGINT) AS tokens_seen,
                 CAST(count(DISTINCT p.v) AS BIGINT) AS types
               FROM fr, mx, per_id p
               WHERE p.id <= mx.max_id * fr.frac_micro // 1000000
               GROUP BY 1, 2),
       pts AS (SELECT
                 CAST(round(ln(CAST(tokens_seen AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
                 CAST(round(ln(CAST(types AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
               FROM cps),
       fit AS (SELECT CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * y) AS BIGINT) AS sxy,
                 CAST(sum(x * x) AS BIGINT) AS sxx FROM pts)
       SELECT cps.frac_micro, cps.cp_id, cps.tokens_seen, cps.types,
         CAST(round((k * sxy - sx * sy) / (k * sxx - sx * sx) * 1000000.0)
           AS BIGINT) AS beta_micro,
         CAST(round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx) / k)
           AS BIGINT) AS ln_k_micro
       FROM cps, fit ORDER BY cps.frac_micro"""
  }

  /** DuckDB oracle replaying [[ngramNovelty]]. `candWhere`/`refWhere` are
    * predicates over `table` splitting candidates from reference. */
  def ngramNoveltyOracleSql(table: String, idCol: String, textCol: String,
                            n: Int, candWhere: String,
                            refWhere: String): String = {
    def gramCte(name: String, where: String) =
      s"""${name}_t AS (SELECT $idCol AS id, string_split_regex(trim($textCol), '\\s+') AS t
              FROM $table WHERE $where),
         ${name}_g AS (SELECT id, unnest(list_distinct(
                CASE WHEN len(t) < $n THEN CAST([] AS VARCHAR[])
                  ELSE list_transform(generate_series(1, len(t) - ${n - 1}),
                         i -> array_to_string(t[i:i+${n - 1}], ' ')) END)) AS g
              FROM ${name}_t),
         ${name}_h AS (SELECT id, CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS h
              FROM ${name}_g)"""
    s"""WITH ${gramCte("cand", candWhere)},
       ${gramCte("ref", refWhere)},
       refd AS (SELECT DISTINCT h FROM ref_h),
       j AS (SELECT cand_h.id, cand_h.h,
               CASE WHEN refd.h IS NULL THEN 1 ELSE 0 END AS novel
             FROM cand_h LEFT JOIN refd ON refd.h = cand_h.h)
       SELECT id AS $idCol, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(novel) AS BIGINT) AS n_novel,
         CAST(sum(novel) AS BIGINT) * 1000000 // count(*) AS novelty_micro
       FROM j GROUP BY id ORDER BY id"""
  }
}
