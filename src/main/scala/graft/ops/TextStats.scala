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
