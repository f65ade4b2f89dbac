package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Corpus-level operators for training-data pipelines: vocabulary building,
  * benchmark decontamination, and winnowing fingerprints (Schleimer,
  * Wilkerson, Aiken, "Winnowing: Local Algorithms for Document
  * Fingerprinting", SIGMOD 2003).
  *
  * Scale design: everything reduces to explode → hash-aggregate (map-side
  * combined) or a broadcast join against the small benchmark side. Nothing
  * here ever shuffles document text except the tokens/shingles actually
  * being counted.
  */
object Corpus {

  /** Token frequency table: the vocabulary-building pre-pass. One explode +
    * one hash aggregate with map-side combine; top-k via TakeOrdered (no
    * global sort materialization).
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(lower(col(textCol)))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))

  def vocabTopK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    vocab(docs, textCol).orderBy(col("freq").desc, col("token")).limit(k)

  /** Benchmark decontamination: find corpus documents whose shingle sets
    * contain a large fraction of some benchmark document's shingles
    * (containment = |corpus ∩ bench| / |bench|, the standard direction for
    * "the eval set leaked into the training set").
    *
    * Returns (corpus id, bench id, containment) for pairs at or above
    * `threshold`. The benchmark side is exploded and BROADCAST (eval sets
    * are small by definition); the corpus side streams through one explode
    * + equi-join + count aggregate — per-shingle rows, never per-pair
    * shingle sets, cross the shuffle.
    */
  def decontaminate(corpus: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    shingleSize: Int, threshold: Double): DataFrame = {
    def shingles(df: DataFrame, as: String) = df.select(
        col(idCol).as(as),
        explode(array_distinct(
          TextFns.wordShingles(col(textCol), shingleSize))).as("sh"))
    val b = shingles(bench, "bench_id")
    val bSizes = b.groupBy(col("bench_id")).agg(count(lit(1)).as("n_bench"))
    val hits = shingles(corpus, "corpus_id")
      .join(broadcast(b), "sh")
      .where(col("corpus_id") =!= col("bench_id"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_common"))
    hits.join(broadcast(bSizes), "bench_id")
      .withColumn("containment",
        col("n_common").cast("double") / col("n_bench").cast("double"))
      .where(col("containment") >= threshold)
      .select(col("corpus_id"), col("bench_id"), col("containment"))
  }

  /** Repetition statistics — the Gopher/C4 repetition filters (Rae et al.
    * 2021 §A1.1; Raffel et al. 2020): fraction of the document consumed by
    * its most frequent word bigram, and the distinct-sentence ratio.
    * Documents dominated by one repeated phrase or copy-pasted lines are
    * the classic low-quality tail these cut.
    *
    * Computed RELATIONALLY (explode → count → max), not with per-row
    * quadratic array lambdas: two map-side-combined aggregates scale to any
    * document length, and Spark's HOF lambdas evaluate interpreted anyway.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val grams = docs.select(col(idCol),
        explode(TextFns.wordShingles(col(textCol), 2)).as("gram"))
      .groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(max(col("c")).as("top_bigram_count"),
           sum(col("c")).as("n_bigrams"))
    val sentences = split(col(textCol), "\\. ") // literal ". " split
    docs.select(col(idCol),
        (size(array_distinct(sentences)).cast("double") /
         size(sentences).cast("double")).as("uniq_sentence_ratio"))
      .join(grams, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"),
        coalesce(col("top_bigram_count").cast("double") /
                 col("n_bigrams").cast("double"), lit(0.0)).as("top_bigram_fraction"),
        col("uniq_sentence_ratio"))
  }

  /** 32-bit k-gram hash used by winnowing — md5-derived so an ANSI SQL
    * oracle reproduces it bit-for-bit (a production rolling Karp-Rabin hash
    * drops in here without changing the selection algorithm).
    */
  private def gramHash(gram: Column): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long")

  /** Winnowing fingerprints: hash every char k-gram, slide a window of
    * `w` consecutive hashes, keep each window's minimum, emit the distinct
    * selected hashes. Guarantees (SIGMOD 2003 §3): any match of length
    * ≥ w+k−1 shares a fingerprint; density ≈ 2/(w+1).
    *
    * Pure per-document projection (explode at the end) — zero shuffle; at
    * 100 TB this runs on the scan like the other text functions. Selection
    * runs as ONE generated kernel pass
    * ([[graft.expressions.WinnowFingerprints]], monotonic-deque window
    * minimum); the composed HOF form below is kept as the independent
    * cross-check its equivalence spec runs against.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    val fps = org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.WinnowFingerprints(
        org.apache.spark.sql.GraftColumnBridge.expression(lower(col(textCol))),
        k, w))
    docs.select(col(idCol), explode(fps).as("fp"))
  }

  /** Composed Catalyst form of the same selection (interpreted HOF lambdas
    * — k·n md5 calls plus n·w slice/min work per document). Retained for
    * the kernel-equivalence spec; prefer [[winnowFingerprints]]. */
  private[graft] def winnowFingerprintsComposed(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val hashes = transform(
      TextFns.charNgrams(col(textCol), k),
      g => gramHash(g))
    val selected = element_at(
      transform(array(hashes), hs =>
        when(size(hs) < w, array_distinct(hs)).otherwise(
          array_distinct(transform(
            sequence(lit(1), size(hs) - lit(w - 1)),
            i => array_min(slice(hs, i, lit(w))))))), 1)
    docs.select(col(idCol), explode(selected).as("fp"))
  }
}
