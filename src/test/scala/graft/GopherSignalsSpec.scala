package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Corpus

/** The native [[graft.expressions.GopherSignals]] kernel must be
  * value-identical to the composed HOF column form it replaced — the DuckDB
  * oracle replays the composed semantics, so ANY divergence (trim flavor,
  * split boundary empties, overlap rules) is an oracle break. */
class GopherSignalsSpec extends SparkSpec {
  import spark.implicits._

  /** The original composed form, kept verbatim as the reference. */
  private def composedSignals(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame = {
    val txt   = trim(col(textCol))
    val toks  = split(txt, "\\s+")
    val lines = split(col(textCol), "\n")
    val nWords = size(toks).cast("long")
    val meanLen = aggregate(transform(toks, w => length(w)), lit(0),
        (a: Column, x: Column) => a + x).cast("double") / nWords.cast("double")
    val symbolNum = lit(3) * (length(txt) - length(translate(txt, "#", ""))) +
      (length(txt) - length(regexp_replace(txt, "\\.\\.\\.", "")))
    val symbolRatio = symbolNum.cast("double") / (lit(3) * nWords).cast("double")
    val bulletRatio = size(filter(lines, l =>
        trim(l).startsWith("-") || trim(l).startsWith("*")))
      .cast("double") / size(lines).cast("double")
    val ellipsisRatio = size(filter(lines, l => trim(l).endsWith("...")))
      .cast("double") / size(lines).cast("double")
    val alphaRatio = size(filter(toks, w => w.rlike("[A-Za-z]")))
      .cast("double") / nWords.cast("double")
    val nStop = size(array_intersect(
        array_distinct(transform(toks, w => lower(w))),
        array(Corpus.gopherStopwords.map(lit): _*))).cast("long")
    docs.select(col(idCol),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
      ellipsisRatio.as("ellipsis_ratio"), alphaRatio.as("alpha_ratio"),
      nStop.as("n_stopwords"))
  }

  private def assertIdentical(docs: DataFrame): Unit = {
    val native = Corpus.gopherQualityFilter(docs, "doc_id", "text",
        minWords = 20, maxWords = 100000, minStopwords = 0)
      .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "bullet_ratio", "ellipsis_ratio", "alpha_ratio", "n_stopwords")
      .orderBy("doc_id").collect()
    val composed = composedSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(native.length == composed.length)
    native.zip(composed).foreach { case (n, c) =>
      assert(n == c, s"native $n != composed $c") }
  }

  test("native kernel equals the composed HOF form on the real corpus") {
    assertIdentical(Tables.documents(spark, "/root/testdata/sf0.001"))
  }

  test("native kernel equals the composed form on boundary shapes") {
    val edge = Seq(
      1L  -> "",
      2L  -> "   ",
      3L  -> "\n\n\n",
      4L  -> "\tword\t",
      5L  -> "- bullet line\n* another\n  - spaced bullet",
      6L  -> "trailing dots...\nexactly...\n....",
      7L  -> ".....",            // 5 dots: ONE non-overlapping match
      8L  -> "### #hash# inline",
      9L  -> "the a of and to in is it that for",
      10L -> "The THE tHe the",  // distinct-lowercased stopword = 1
      11L -> "line ends\n",      // trailing empty line kept
      12L -> "ünïcödé wörds é́", // multi-byte + combining mark
      13L -> "a  b   c",         // runs of spaces
      14L -> " x",
      15L -> "no-alpha 123 456 .?!").toDF("doc_id", "text")
    assertIdentical(edge)
  }

  test("null text propagates null signals (both forms)") {
    val docs = Seq((1L, Option("ok words here")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Corpus.gopherQualityFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(1).isNullAt(out(1).fieldIndex("n_words")))
  }
}
