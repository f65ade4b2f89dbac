package graft

import org.apache.spark.sql.functions._
import graft.ops.SpUnigram

/** Properties of the SentencePiece-unigram kernel (ops/SpUnigram):
  * reassembly, Viterbi optimality, tie-breaks, OOV fallback, model
  * invariants. The DuckDB hash parity lives in the q_sp_* oracles. */
class SpUnigramSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def wordsDf(rows: Seq[(String, Long)]) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (t, f) =>
        org.apache.spark.sql.Row(t, f) }.toList, 1),
      StructType(Seq(StructField("token", StringType),
        StructField("freq", LongType))))
  }

  private def segment(word: String, scores: Map[String, Long]): Seq[String] =
    SpUnigram.withSegmentation(wordsDf(Seq(word -> 1L)), scores, 4)
      .select(col("pieces")).head().getSeq[String](0).toSeq

  test("segmentation reassembles every corpus word exactly") {
    val docs = Tables.documents(spark, sf)
    val model = SpUnigram.trainModel(docs, "text",
      seedSize = 48, pieceMaxLen = 4, emIters = 2, vocabSize = 24,
      maxTokenLen = 16)
    val scores = model.map { case (p, _, lp) => p -> lp }.toMap
    val words = graft.ops.Corpus.vocab(docs, "text")
      .where(length(col("token")) <= 16)
    val bad = SpUnigram.withSegmentation(words, scores, 4)
      .where(concat_ws("", col("pieces")) =!= col("token"))
      .count()
    assert(bad == 0L, s"$bad corpus words did not reassemble from their pieces")
  }

  test("viterbi picks the higher-probability segmentation") {
    // "abab": pieces {ab: high, a/b: low} => [ab, ab] beats 4 chars
    val scores = Map("a" -> -5000000L, "b" -> -5000000L, "ab" -> -1000000L)
    assert(segment("abab", scores) == Seq("ab", "ab"))
    // flip: make the chars cheap enough that 4 singles win (2 ab = -8M,
    // 4 chars = -4M)
    val scores2 = Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -4000000L)
    assert(segment("abab", scores2) == Seq("a", "b", "a", "b"))
  }

  test("exact score ties prefer the longer piece") {
    // [ab] scores -2M; [a, b] also -2M total: the tie goes to ab
    val scores = Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -2000000L)
    assert(segment("ab", scores) == Seq("ab"))
  }

  test("characters unseen at train time segment as UNK-floor singles") {
    val scores = Map("a" -> -1000000L, "b" -> -1000000L, "ab" -> -500000L)
    // 'z' is not in the model: it must stand alone at the UNK floor and
    // not block segmentation of the known remainder
    assert(segment("zab", scores) == Seq("z", "ab"))
    assert(segment("z", scores) == Seq("z"))
  }

  test("model invariants: chars covered, multi-piece cap, probs normalized") {
    val docs = Tables.documents(spark, sf)
    val model = SpUnigram.trainModel(docs, "text",
      seedSize = 48, pieceMaxLen = 4, emIters = 2, vocabSize = 10,
      maxTokenLen = 16)
    val pieces = model.map(_._1)
    val corpusChars = Tables.documents(spark, sf)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .where(length(col("t")) > 0 && length(col("t")) <= 16)
      .select(explode(split(col("t"), "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(corpusChars.subsetOf(pieces.filter(_.length == 1).toSet),
      "every corpus character must stay in the model")
    assert(pieces.count(_.length > 1) <= 10, "multi-piece cap exceeded")
    // logp consistency: round(ln(cnt/total)*1e6) per row
    val total = model.map(_._2).sum.toDouble
    model.foreach { case (p, c, lp) =>
      assert(lp == math.round(math.log(c.toDouble / total) * 1e6),
        s"logp mismatch for piece $p")
    }
  }
}
