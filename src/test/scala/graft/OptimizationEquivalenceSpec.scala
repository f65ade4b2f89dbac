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
    val fusedCg = {
      val all = array((1 to 4).map(n =>
        TextFns.wordShingles(col("__t"), n)): _*)
      Tables.spread(cands)
        .select(col("doc_id").as("id"), trim(col("text")).as("__t"))
        .select(col("id"), posexplode(all).as(Seq("__n0", "__gs")))
        .select(col("id"), (col("__n0") + lit(1)).as("n"),
          explode(col("__gs")).as("g"))
        .groupBy(col("id"), col("n"), col("g"))
        .agg(count(lit(1)).as("cc"))
    }
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
    val fused = {
      val all = array((1 to 6).map(n =>
        TextFns.charNgrams(col("__t"), n)): _*)
      Tables.spread(cands)
        .select(col("doc_id").as("id"), stripped(col("text")).as("__t"))
        .select(col("id"), posexplode(all).as(Seq("__n0", "__gs")))
        .select(col("id"), (col("__n0") + lit(1)).as("n"),
          explode(col("__gs")).as("g"))
        .groupBy(col("id"), col("n"), col("g"))
        .agg(count(lit(1)).as("cc"))
    }
    assert(sortedRows(fused) == sortedRows(gramsRef))
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
