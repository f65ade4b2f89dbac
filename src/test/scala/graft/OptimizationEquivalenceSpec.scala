package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.ops.{Corpus, Evaluation}

/** Round-15 optimization round: the fused operator internals must be
  * row-identical to the shapes they replaced (the driver re-oracles every
  * declared query, but these pins catch a drift at unit speed and document
  * WHAT equivalence each restructure claims).
  *
  *  - pair-metric gram builds (bleu/rouge/chrf) fused from one
  *    scan+groupBy per n into ONE scan + ONE aggregate per side;
  *  - Moore–Lewis fused self-trained scorer (one tokenize pass, dual
  *    conditional model counts, checkpointed model tables) vs the generic
  *    two-trigramModelCounts + crossEntropySelect composition.
  */
class OptimizationEquivalenceSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def docs: DataFrame = {
    val rows = Seq(
      (0L, "en", "the quick brown fox jumps over the lazy dog the quick brown"),
      (1L, "en", "pack my box with five dozen liquor jugs"),
      (2L, "de", "der schnelle braune fuchs springt"),
      (3L, "en", "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "zh", "one token"),
      (5L, "en", ""),
      (6L, "de", "a b a b a b a b c d e f g h i j"))
    spark.createDataFrame(rows).toDF("doc_id", "lang", "text")
  }

  private def sortedRows(df: DataFrame): Seq[Row] = {
    val cols = df.columns.sorted.map(col).toSeq
    df.select(cols: _*).collect().toSeq.sortBy(_.toString)
  }

  test("fused bleuPairs gram build == per-n reference composition") {
    val cands = docs.where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text"))
    val refs = docs.where(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1L).as("doc_id"), col("text"))
    val fused = Evaluation.bleuPairs(cands, refs, "doc_id", "text")
    // reference: the pre-r15 per-n union shape, inlined
    def gramsRef(df: DataFrame, cnt: String) = (1 to 4).map { n =>
      df.select(col("doc_id").as("id"),
          explode(TextFns.wordShingles(trim(col("text")), n)).as("g"))
        .groupBy(col("id"), col("g"))
        .agg(count(lit(1)).as(cnt))
        .select(col("id"), lit(n).as("n"), col("g"), col(cnt))
    }.reduce(_ unionByName _)
    // the SHIPPED fused build (r15 ADVICE: no hand copy — bleuPairs,
    // rougeN, chrfPairs and the plan dumps all route through this helper)
    val fusedCg = Evaluation.fusedGramCounts(cands, "doc_id",
      trim(col("text")), 1 to 4, TextFns.wordShingles, "cc")
    assert(sortedRows(fusedCg) == sortedRows(gramsRef(cands, "cc")))
    // and the end-to-end metric row set is non-empty and deterministic
    assert(fused.count() > 0)
  }

  test("fused chrf gram rows == per-n reference; chrfPairs end-to-end stable") {
    val cands = docs.where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text"))
    def stripped(c: org.apache.spark.sql.Column) =
      regexp_replace(trim(c), "\\s+", "")
    def gramsRef = (1 to 6).map { n =>
      cands.select(col("doc_id").as("id"),
          explode(TextFns.charNgrams(stripped(col("text")), n)).as("g"))
        .groupBy(col("id"), col("g"))
        .agg(count(lit(1)).as("cc"))
        .select(col("id"), lit(n).as("n"), col("g"), col("cc"))
    }.reduce(_ unionByName _)
    val fused = Evaluation.fusedGramCounts(cands, "doc_id",
      stripped(col("text")), 1 to 6, TextFns.charNgrams, "cc")
    assert(sortedRows(fused) == sortedRows(gramsRef))
  }

  test("fusedGramCounts rejects duplicate orders (union-vs-agg semantics)") {
    // a duplicated n would make the fused (id,n,g) aggregate double-count
    // where the old per-n union emitted two identical row groups
    val cands = docs.select(col("doc_id"), col("text"))
    assertThrows[IllegalArgumentException] {
      Evaluation.fusedGramCounts(cands, "doc_id", trim(col("text")),
        Seq(1, 2, 1), TextFns.wordShingles, "cc")
    }
  }

  test("crossEntropySelectSelf == generic two-model composition") {
    val generic = {
      val (iu, ib, it) = Corpus.trigramModelCounts(
        docs.where(col("lang") === "en"), "doc_id", "text", buckets = 1)
      val (ou, ob, ot) = Corpus.trigramModelCounts(docs, "doc_id", "text", buckets = 1)
      Corpus.crossEntropySelect(docs, "doc_id", "text",
        Corpus.lmFoldUni(iu), Corpus.lmFoldBi(ib), Corpus.lmFoldTri(it),
        Corpus.lmFoldUni(ou), Corpus.lmFoldBi(ob), Corpus.lmFoldTri(ot))
    }
    val fused = Corpus.crossEntropySelectSelf(docs, "doc_id", "text",
      col("lang") === "en")
    assert(sortedRows(fused) == sortedRows(generic))
  }

  test("tokenizer_ab shared-vocab fertility == per-trainer corpus-pass composition") {
    // r16: one word-frequency fit + vocab-side constant-group fertility vs
    // the pre-r16 composition (per-trainer vocab pass; corpus explode +
    // segLen join; WordPiece fertility via an 8-round merge REPLAY)
    val words = Corpus.vocab(docs, "text").localCheckpoint(true)
    // BPE
    val (_, bpeV) = Corpus.bpeTrainStateFromWords(words, nMerges = 8)
    val bpeNew = Corpus.fertilityFromTrainedState(bpeV, "bpe", "__fam")
    val bpeOld = Corpus.fertilityReport(
      docs.withColumn("__fam", lit("bpe")), "text", "__fam", nMerges = 8)
    assert(sortedRows(bpeNew) == sortedRows(bpeOld))
    // WordPiece: final trainer state ≡ replaying the merge list
    val (wpMergesDf, wpV) = Corpus.wordPieceTrainStateFromWords(words, nMerges = 8)
    val wpMerges = wpMergesDf.orderBy(col("step")).select(col("pair"))
      .collect().map(_.getString(0)).toSeq
    val wpNew = Corpus.fertilityFromTrainedState(wpV, "wordpiece", "__fam")
    val wpOld = Corpus.fertilityFromMerges(
      docs.withColumn("__fam", lit("wordpiece")), "text", "__fam", wpMerges)
    assert(sortedRows(wpNew) == sortedRows(wpOld))
    // SP-unigram: vocab-side fertility vs the corpus-pass report (same
    // scores map on both sides — equivalence is the fit, not the model)
    val scores = Map("t" -> -1000000L, "h" -> -1200000L, "e" -> -900000L,
      "th" -> -1500000L, "he" -> -1600000L, "qu" -> -1800000L,
      "a" -> -1100000L, "b" -> -1300000L)
    val spNew = graft.ops.SpUnigram.fertilityFromWords(words, "sp_unigram",
      "__fam", scores, pieceMaxLen = 2, maxTokenLen = 16)
    val spOld = graft.ops.SpUnigram.fertilityReport(
      docs.withColumn("__fam", lit("sp_unigram")), "text", "__fam",
      scores, pieceMaxLen = 2, maxTokenLen = 16)
    assert(sortedRows(spNew) == sortedRows(spOld))
    graft.ops.ApproxDedup.freeCheckpoint(words)
  }

  test("lmTokens without the empty-doc filter yields identical count tables") {
    // r16: lmTokens dropped lmToks' where(size(toks) > 0) so the tokenize
    // projection stays above the spread exchange (the filter's predicate
    // evaluates the tokenizer, and filter-through-exchange pushdown dragged
    // the whole tokenization onto the single scan task). Empty/null arrays
    // explode to ZERO unigram/pair/triple rows, so all three count tables
    // are row-identical.
    val withEmpty = docs.unionByName(
      spark.createDataFrame(Seq((7L, "en", "   "), (8L, "en", "")))
        .toDF("doc_id", "lang", "text"))
    val (u1, b1, t1) = Corpus.trigramModelCountsFromToks(
      Corpus.lmTokens(withEmpty, "doc_id", "text"), buckets = 4)
    // the pre-r16 shape: filtered token rows
    val filtered = Corpus.lmTokens(withEmpty, "doc_id", "text")
      .where(size(col("toks")) > 0)
    val (u2, b2, t2) = Corpus.trigramModelCountsFromToks(filtered, buckets = 4)
    assert(sortedRows(u1) == sortedRows(u2))
    assert(sortedRows(b1) == sortedRows(b2))
    assert(sortedRows(t1) == sortedRows(t2))
  }

  test("Tables.spread is identity on frames already at session parallelism") {
    val wide = spark.range(0, 100, 1,
      spark.sparkContext.defaultParallelism).toDF("id")
    assert(Tables.spread(wide).rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // and preserves the row set when it does repartition
    val narrow = spark.range(0, 100, 1, 1).toDF("id")
    assert(Tables.spread(narrow).select(sum(col("id"))).head().getLong(0) == 4950L)
  }
}
