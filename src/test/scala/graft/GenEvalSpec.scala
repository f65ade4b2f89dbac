package graft

import org.apache.spark.sql.functions._

import graft.ops.{Evaluation, Rlhf, TextStats}

/** Generation-eval metrics + DPO pair construction + corpus-growth stats:
  * hand-computed fixtures for the formulas, invariants for the rest. */
class GenEvalSpec extends SparkSpec {
  import spark.implicits._

  test("BLEU: identical pair scores 1e6; short candidate pays exp(1 - r/c)") {
    val cands = Seq((1L, "the cat sat"), (2L, "the cat")).toDF("doc_id", "text")
    val refs = Seq((1L, "the cat sat"), (2L, "the cat sat on mat"))
      .toDF("doc_id", "text")
    val out = Evaluation.bleuPairs(cands, refs, "doc_id", "text")
      .select("doc_id", "bleu_micro").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1000000L)
    // pair 2: all (smoothed) precisions are 1, BP = e^(1 - 5/2)
    assert(out(2L) == math.round(math.exp(-1.5) * 1e6))
  }

  test("BLEU: zero unigram overlap scores 0") {
    val out = Evaluation.bleuPairs(
        Seq((1L, "aa bb")).toDF("doc_id", "text"),
        Seq((1L, "cc dd")).toDF("doc_id", "text"), "doc_id", "text")
      .select("bleu_micro").as[Long].head()
    assert(out == 0L)
  }

  test("chrF: identical pair scores 1e6 and ranks above a partial match") {
    val cands = Seq((1L, "abcdef"), (2L, "abcxyz")).toDF("doc_id", "text")
    val refs = Seq((1L, "abcdef"), (2L, "abcdef")).toDF("doc_id", "text")
    val out = Evaluation.chrfPairs(cands, refs, "doc_id", "text")
      .select("doc_id", "chrf_micro").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1000000L)
    assert(out(2L) > 0L && out(2L) < out(1L))
  }

  test("ROUGE-N: exact integer P/R/F1 on a hand-computed pair") {
    val out = Evaluation.rougeN(
        Seq((1L, "a b c")).toDF("doc_id", "text"),
        Seq((1L, "a b d")).toDF("doc_id", "text"), "doc_id", "text")
      .select("n", "m", "p_micro", "r_micro", "f1_micro")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1, 2L, 666666L, 666666L, 666666L)))
    assert(out(1) == ((2, 1L, 500000L, 500000L, 500000L)))
  }

  test("preference pairs: margin gate, tie-breaks, singleton groups drop") {
    val df = Seq(
      ("g1", 1L, 10L), ("g1", 2L, 90L), ("g1", 3L, 90L), // tie on max -> id 3
      ("g2", 4L, 50L), ("g2", 5L, 60L),                  // margin 10 < 30 gate
      ("g3", 6L, 40L)                                    // singleton
    ).toDF("grp", "id", "r")
    val out = Rlhf.preferencePairs(df, "grp", "id", "r", minMargin = 30L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("g1", 3L, 1L, 90L, 10L, 80L)))
  }

  test("distinct-n: all-identical docs crater distinct-2") {
    val docs = Seq((1L, "a b a b"), (2L, "a b a b"), (3L, "c d e f"))
      .toDF("doc_id", "text")
      .withColumn("src", when(col("doc_id") < 3, "dup").otherwise("var"))
    val out = TextStats.distinctN(docs, "src", "text")
      .select("grp", "n", "distinct_micro").as[(String, Int, Long)]
      .collect().map { case (g, n, m) => (g, n) -> m }.toMap
    // dup source: 8 unigram tokens, 2 distinct -> 250000
    assert(out(("dup", 1)) == 250000L)
    // var source: all grams distinct
    assert(out(("var", 1)) == 1000000L && out(("var", 2)) == 1000000L)
  }

  test("ECE: perfectly calibrated bins score 0; constant-score miss scores the gap") {
    // every row scores 500000 and half are positive -> one bin with
    // mean 500000 and pos rate 500000 -> ECE 0
    val calib = (1L to 10L).map(i => ((i % 2).toInt, 500000L))
      .toDF("lbl", "score_micro")
    val z = Evaluation.ece(calib, "lbl", "score_micro", nBins = 5)
      .select("ece_micro").as[Long].head()
    assert(z == 0L)
    // same scores, all positive -> |1e6 - 5e5| = 5e5
    val off = (1L to 10L).map(_ => (1, 500000L)).toDF("lbl", "score_micro")
    val e = Evaluation.ece(off, "lbl", "score_micro", nBins = 5)
      .select("ece_micro").as[Long].head()
    assert(e == 500000L)
  }

  test("JS matrix: identical sources diverge 0, disjoint vocabularies ln 2") {
    val docs = Seq(
      (1L, "s1", "a b c"), (2L, "s2", "a b c"), (3L, "s3", "x y z"))
      .toDF("doc_id", "src", "text")
    val out = TextStats.sourceJsMatrix(docs, "src", "text")
      .as[(String, String, Long)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(out(("s1", "s2")) == 0L)
    val ln2 = math.round(math.log(2.0) * 1e6 / 2.0) * 2 // two half-terms per token
    assert(math.abs(out(("s1", "s3")) - 693147L) <= 3L,
      s"got ${out(("s1", "s3"))}, ln2 ref $ln2")
  }

  test("FIM transform preserves every token and keeps cut points ordered") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val out = graft.ops.Corpus.fimTransform(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .as[(Long, Long, Long, Long, String, String)].collect()
    out.foreach { case (_, n, i, j, fim, text) =>
      assert(1L <= i && i <= j && j <= n)
      val orig = text.trim.split("\\s+").toSeq.sorted
      val re = fim.split("\\s+").filterNot(
        Set("<PRE>", "<SUF>", "<MID>").contains).toSeq.sorted
      assert(re == orig)
    }
  }

  test("span corruption: sentinels align and input+target rebuild the doc") {
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val (nTok, nMasked, nSpans, input, target) =
      graft.ops.Corpus.spanCorruption(docs, "doc_id", "text", pct = 40)
        .select("n_tokens", "n_masked", "n_spans", "input", "target")
        .as[(Long, Long, Long, String, String)].head()
    assert(nTok == 16L && nMasked > 0L && nSpans > 0L)
    // input holds exactly n_spans sentinels in order; target opens with <X0>
    val sentinels = "<X\\d+>".r.findAllIn(input).toSeq
    assert(sentinels == (0L until nSpans).map(k => s"<X$k>"))
    // splicing each target span back over its sentinel rebuilds the doc
    val tgtSpans = target.split("(?=<X\\d+>)").filter(_.nonEmpty)
      .map { s => val p = s.trim.split(" ", 2); p(0) -> (if (p.length > 1) p(1) else "") }
      .toMap
    val rebuilt = input.split(" ").toSeq.flatMap { t =>
      if (t.matches("<X\\d+>")) tgtSpans(t).split(" ").filter(_.nonEmpty).toSeq
      else Seq(t)
    }.mkString(" ")
    assert(rebuilt == "a b c d e f g h i j k l m n o p", rebuilt)
  }

  test("Luhn report: checksum separates valid cards from near-miss digit runs") {
    val docs = Seq(
      ("s1", "pay with 4111111111111111 now"),          // valid Visa test number
      ("s1", "ref 4111111111111112 is not a card"),     // checksum off by one
      ("s2", "card 4111-1111-1111-1111 with dashes"),   // separators stripped
      ("s2", "no digits here at all")
    ).toDF("source", "text")
    val out = graft.ops.Cleaning.luhnReport(docs, "source", "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    assert(out("s1") == ((2L, 2L, 1L, 1L))) // 2 candidates, 1 valid
    assert(out("s2") == ((2L, 1L, 1L, 1L)))
  }

  test("Heaps checkpoints are monotone; saturated vocab fits beta ~ 0") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = TextStats.heapsLaw(docs, "doc_id", "text")
      .select("frac_micro", "tokens_seen", "types", "beta_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length == 5)
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 })
    // the synthetic corpus mints its whole ~40-word vocab in the first
    // few docs — types are flat across checkpoints, so the slope is ~0
    val beta = out.head._4
    assert(beta >= 0L && beta < 100000L, s"beta=$beta")
    assert(out.map(_._4).distinct.length == 1) // fit repeated on every row
  }

  test("Heaps fit recovers sublinear growth on a sqrt-vocab corpus") {
    // doc i mints a new type only at perfect squares -> types ~ 3 + sqrt(n)
    val docs = (1 to 100).map { i =>
      val sq = math.sqrt(i).toInt
      val mint = if (sq * sq == i) s" n$i" else ""
      (i.toLong, s"c0 c1 c2$mint")
    }.toDF("doc_id", "text")
    val beta = TextStats.heapsLaw(docs, "doc_id", "text")
      .select("beta_micro").as[Long].head()
    assert(beta > 100000L && beta < 900000L, s"beta=$beta")
  }
}
