package graft

import org.apache.spark.sql.functions._

import graft.ops.{Evaluation, Privacy, Rlhf}

/** Round-14 operators: privacy audits (k-anonymity / l-diversity),
  * reward length-bias audit, inter-annotator agreement (Cohen's κ). */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    // (zip, age_band, cohort) — class (z1, a1) has 3 rows, (z1, a2) 1 row,
    // (z2, a1) 2 rows
    ("z1", "a1", 0L), ("z1", "a1", 1L), ("z1", "a1", 2L),
    ("z1", "a2", 0L),
    ("z2", "a1", 1L), ("z2", "a1", 1L)
  ).toDF("zip", "age", "cohort")

  test("kAnonymityViolations lists exactly the under-k classes, smallest first") {
    val v = Privacy.kAnonymityViolations(people, Seq("zip", "age"), k = 3L,
        cap = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(v == Seq(("z1", "a2", 1L), ("z2", "a1", 2L)))
  }

  test("kAnonymityViolations cap keeps the most identifying classes") {
    val v = Privacy.kAnonymityViolations(people, Seq("zip", "age"), k = 4L,
        cap = 1)
      .as[(String, String, Long)].collect().toSeq
    assert(v == Seq(("z1", "a2", 1L))) // size-1 outranks sizes 2 and 3
  }

  test("kAnonymitySummary totals and at-risk fraction") {
    val s = Privacy.kAnonymitySummary(people, Seq("zip", "age"), k = 3L)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // 6 rows, 3 classes, 2 violating holding 3 rows, min size 1, 3/6 micro
    assert(s == ((6L, 3L, 2L, 3L, 1L, 500000L)))
  }

  test("lDiversityViolations flags low-diversity classes regardless of size") {
    val v = Privacy.lDiversityViolations(people, Seq("zip", "age"), "cohort",
        l = 2L, cap = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    // (z1, a2): 1 row 1 cohort; (z2, a1): 2 rows but a single cohort value
    assert(v == Seq(("z1", "a2", 1L, 1L), ("z2", "a1", 2L, 1L)))
  }
}

class LengthBiasSpec extends SparkSpec {
  import spark.implicits._

  test("perfectly length-correlated reward reports corr_micro 1e6") {
    // reward = len/2 exactly; all moment products stay within 2^53 and
    // the sqrt argument is a perfect square, so r computes to exactly 1.0
    val df = (1L to 20L).map(i => (i, i * 2L)).toDF("reward", "len")
    val out = Rlhf.lengthBiasAudit(df, "reward", "len", nBins = 4)
      .select("bin", "cnt", "mean_reward_micro", "corr_micro")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out.map(_._4).distinct == Seq(1000000L))
    assert(out.map(_._1) == Seq(0, 1, 2, 3))
    assert(out.map(_._2).sum == 20L)
    // per-bin mean reward strictly rises with the length bin
    assert(out.map(_._3) == out.map(_._3).sorted)
  }

  test("anti-correlated reward reports corr_micro -1e6") {
    val df = (1L to 10L).map(i => (-i * 3L, i * 7L)).toDF("reward", "len")
    val corr = Rlhf.lengthBiasAudit(df, "reward", "len", nBins = 2)
      .select("corr_micro").as[Long].collect().toSeq.distinct
    assert(corr == Seq(-1000000L))
  }

  test("constant length yields empty profile (no binning range)") {
    val df = Seq((5L, 100L), (9L, 100L)).toDF("reward", "len")
    assert(Rlhf.lengthBiasAudit(df, "reward", "len", nBins = 4).count() == 0L)
  }

  test("constant reward has null corr but a flat profile") {
    val df = (1L to 8L).map(i => (42L, i * 50L)).toDF("reward", "len")
    val out = Rlhf.lengthBiasAudit(df, "reward", "len", nBins = 2)
      .select("mean_reward_micro", "corr_micro")
      .as[(Long, Option[Long])].collect().toSeq
    assert(out.nonEmpty && out.forall(_ == ((42000000L, None))))
  }
}

class AnnotatorAgreementSpec extends SparkSpec {
  import spark.implicits._

  test("perfect agreement gives kappa_micro 1e6") {
    val rated = Seq(
      (1L, "a", 0L), (1L, "b", 0L),
      (2L, "a", 1L), (2L, "b", 1L),
      (3L, "a", 0L), (3L, "b", 0L)
    ).toDF("item", "rater", "lbl")
    val out = Evaluation.annotatorAgreement(rated, "item", "rater", "lbl")
      .select("ra", "rb", "n_items", "n_agree", "po_micro", "kappa_micro")
      .as[(String, String, Long, Long, Long, Long)].head()
    assert(out == (("a", "b", 3L, 3L, 1000000L, 1000000L)))
  }

  test("hand-computed 2x2 contingency matches the closed form") {
    // a/b over 10 items: contingency [[4,1],[2,3]] (rows=a's label)
    val labels = Seq((0L, 0L), (0L, 0L), (0L, 0L), (0L, 0L), (0L, 1L),
      (1L, 0L), (1L, 0L), (1L, 1L), (1L, 1L), (1L, 1L))
    val rated = labels.zipWithIndex.flatMap { case ((la, lb), i) =>
      Seq((i.toLong, "a", la), (i.toLong, "b", lb)) }
      .toDF("item", "rater", "lbl")
    val out = Evaluation.annotatorAgreement(rated, "item", "rater", "lbl")
      .select("n_items", "n_agree", "po_micro", "pe_micro", "kappa_micro")
      .as[(Long, Long, Long, Long, Long)].head()
    // po = 7/10; pe = (5*6 + 5*4)/100 = 1/2; kappa = (7*10-50)/(100-50) = 2/5
    assert(out == ((10L, 7L, 700000L, 500000L, 400000L)))
  }

  test("agreement no better than chance gives kappa_micro <= 0") {
    // b always answers 0 regardless of a: po equals b's marginal hit rate
    val rated = (0L until 8L).flatMap(i =>
      Seq((i, "a", i % 2), (i, "b", 0L))).toDF("item", "rater", "lbl")
    val k = Evaluation.annotatorAgreement(rated, "item", "rater", "lbl")
      .select("kappa_micro").as[Long].head()
    assert(k == 0L) // independent marginals: po == pe exactly
  }

  test("three raters produce all three pairs") {
    val rated = (0L until 6L).flatMap(i => Seq(
      (i, "a", i % 3), (i, "b", (i + 1) % 3), (i, "c", i % 3)))
      .toDF("item", "rater", "lbl")
    val pairs = Evaluation.annotatorAgreement(rated, "item", "rater", "lbl")
      .select("ra", "rb").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}

class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  test("undefeated item absorbs all strength; winless item goes to zero") {
    val b = Seq(("A", "B"), ("A", "B"), ("A", "B")).toDF("w", "l")
    val out = graft.ops.Rlhf.bradleyTerryMicro(b, "w", "l", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(out == Map("A" -> 2000000L, "B" -> 0L))
  }

  test("symmetric record gives equal strengths at the mean") {
    val b = Seq(("A", "B"), ("B", "A"), ("A", "B"), ("B", "A")).toDF("w", "l")
    val out = graft.ops.Rlhf.bradleyTerryMicro(b, "w", "l", iters = 4)
      .as[(String, Long)].collect().toMap
    assert(out == Map("A" -> 1000000L, "B" -> 1000000L))
  }

  test("transitive dominance orders strengths") {
    val b = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("B", "C"), ("A", "C"))
      .toDF("w", "l")
    val out = graft.ops.Rlhf.bradleyTerryMicro(b, "w", "l", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(out("A") > out("B") && out("B") > out("C"))
    // renormalization keeps total mass at N * 1e6 up to per-item rounding
    assert(math.abs(out.values.sum - 3000000L) <= 3L)
  }

  test("disconnected components are each renormalized on the shared mean") {
    val b = Seq(("A", "B"), ("C", "D"), ("C", "D")).toDF("w", "l")
    val out = graft.ops.Rlhf.bradleyTerryMicro(b, "w", "l", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(out.keySet == Set("A", "B", "C", "D"))
    assert(out("A") > out("B") && out("C") > out("D"))
  }
}

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("hub token connected to everything outranks the periphery") {
    // star graph: "hub" co-occurs with every spoke; spokes only with hub
    val docs = (1L to 6L).map(i => (i, s"hub spoke$i")).toDF("doc_id", "text")
    val out = graft.ops.Corpus.textRankKeywords(docs, "doc_id", "text",
        vocabK = 10, iters = 3, k = 10)
      .as[(String, Long)].collect()
    assert(out.head._1 == "hub")
    assert(out.head._2 > out.last._2)
  }

  test("vocab prune drops edges touching out-of-vocab tokens") {
    // rare3 appears once; with vocabK=3 only {a b c} survive (freq then
    // token tiebreak), so the graph is the a-b-c path
    val docs = Seq((1L, "a b c a b"), (2L, "a b rare3 c"))
      .toDF("doc_id", "text")
    val ranked = graft.ops.Corpus.textRankKeywords(docs, "doc_id", "text",
        vocabK = 3, iters = 2, k = 10)
      .as[(String, Long)].collect().map(_._1).toSet
    assert(ranked == Set("a", "b", "c"))
  }

  test("top-k limit and rank-desc token-asc order") {
    val docs = Seq((1L, "x y z x y z w x")).toDF("doc_id", "text")
    val out = graft.ops.Corpus.textRankKeywords(docs, "doc_id", "text",
        vocabK = 4, iters = 2, k = 2)
      .as[(String, Long)].collect()
    assert(out.length == 2)
    assert(out(0)._2 >= out(1)._2)
  }
}

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed tiny corpus matches the KN formula exactly") {
    val docs = Seq(1L -> "a b c", 2L -> "a b c", 3L -> "a b d")
      .toDF("doc_id", "text")
    val out = graft.ops.Corpus.knTrigramLogProb(docs, "doc_id", "text",
        discount = 0.75)
      .select("doc_id", "logprob_micro").as[(Long, Long)].collect().toMap
    // counts: cf a3 b3 c2 d1 (T=9, V=4); bigram types (a,b)3 (b,c)2 (b,d)1
    // (nb=3); trigrams (a,b,c)2 (a,b,d)1; c_uv(a,b)=3, N3=2; N1+(.b c)=1,
    // N1+(.b .)=2, N2(b)=2; P1 = n1l_w/nb = 1/3 for b, c, d
    val lw0 = math.round(math.log(4.0 / 13.0) * 1e6) // first token "a"
    val lw2 = math.round(math.log(
      (3.0 - 0.75 + 0.75 * 1.0 * (1.0 / 3.0)) / 3.0) * 1e6) // (a,b) real KN
    def p2c = (1.0 - 0.75 + 0.75 * 2.0 * (1.0 / 3.0)) / 2.0 // cont. order 2
    val lw3c = math.round(math.log(
      (2.0 - 0.75 + 0.75 * 2.0 * p2c) / 3.0) * 1e6) // (a,b,c)
    val lw3d = math.round(math.log(
      (1.0 - 0.75 + 0.75 * 2.0 * p2c) / 3.0) * 1e6) // (a,b,d)
    assert(out(1L) == lw0 + lw2 + lw3c)
    assert(out(3L) == lw0 + lw2 + lw3d)
  }

  test("1-token doc degrades exactly to the unigram score") {
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "alpha")
      .toDF("doc_id", "text")
    val kn = graft.ops.Corpus.knTrigramLogProb(docs, "doc_id", "text")
      .where($"doc_id" === 2L).select("n_tokens", "logprob_micro")
      .as[(Long, Long)].head()
    val uni = graft.ops.Corpus.unigramLogProb(docs, "doc_id", "text")
      .where($"doc_id" === 2L).select("n_tokens", "logprob_micro")
      .as[(Long, Long)].head()
    assert(kn == uni, s"KN $kn vs unigram $uni")
  }

  test("word order: scrambled doc scores higher xent than the corpus phrase") {
    val phrase = "the quick brown fox jumps over the lazy dog"
    val docs = ((1L to 10L).map(i => i -> phrase) :+
      (20L -> "dog the over quick lazy fox brown jumps the"))
      .toDF("doc_id", "text")
    val out = graft.ops.Corpus.knTrigramLogProb(docs, "doc_id", "text")
      .select("doc_id", "xent").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(20L),
      s"ordered ${out(1L)} should beat scrambled ${out(20L)}")
  }
}

class DomainReweightSpec extends SparkSpec {
  import spark.implicits._

  test("domains above the reference gain weight; at-or-below lose it") {
    val dom = Seq(
      ("hot", 250000L, 2000000L, 1000000L),  // excess 1e6
      ("ref", 250000L, 1000000L, 1000000L),  // excess 0
      ("cold", 500000L, 400000L, 1000000L)   // clamped to 0
    ).toDF("domain", "prior_micro", "loss_micro", "ref_micro")
    val out = graft.ops.Sampling.domainExcessReweight(dom, "domain",
        "prior_micro", "loss_micro", "ref_micro", etaMicro = 1000000L)
      .select("domain", "weight_micro").as[(String, Long)].collect().toMap
    // hot multiplier exp(1e6*1e6/1e12)=e; others 1.0
    assert(out("hot") > 250000L)
    assert(out("cold") < 500000L && out("ref") < 250000L)
    assert(math.abs(out.values.sum - 1000000L) <= 3L)
    // zero-excess domains keep their relative ratio (both x1.0)
    assert(math.abs(out("cold") - 2L * out("ref")) <= 2L)
  }

  test("eta 0 reproduces the prior mixture") {
    val dom = Seq(("a", 300000L, 9999999L, 0L), ("b", 700000L, 5L, 0L))
      .toDF("domain", "prior_micro", "loss_micro", "ref_micro")
    val out = graft.ops.Sampling.domainExcessReweight(dom, "domain",
        "prior_micro", "loss_micro", "ref_micro", etaMicro = 0L)
      .select("domain", "weight_micro").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 300000L, "b" -> 700000L))
  }
}

class KnStoredModelSpec extends SparkSpec {
  import spark.implicits._

  test("fully in-model text scores bit-identical to the self-model") {
    val docs = Seq(1L -> "a b c d", 2L -> "a b c", 3L -> "a b d c")
      .toDF("doc_id", "text")
    val self = graft.ops.Corpus.knTrigramLogProb(docs, "doc_id", "text")
      .select("doc_id", "logprob_micro").as[(Long, Long)].collect().toMap
    // model == score corpus: every branch takes the seen arm
    val (uni, bi, tri) = graft.ops.Corpus.trigramModelCounts(
      docs, "doc_id", "text", buckets = 4)
    val stored = graft.ops.Corpus.knScoreWithModel(docs, "doc_id", "text",
        graft.ops.Corpus.lmFoldUni(uni), graft.ops.Corpus.lmFoldBi(bi),
        graft.ops.Corpus.lmFoldTri(tri))
      .select("doc_id", "logprob_micro").as[(Long, Long)].collect().toMap
    assert(stored == self)
  }

  test("OOV token lands on the add-one floor, not a crash or a drop") {
    val model = Seq(1L -> "a b c a b c").toDF("doc_id", "text")
    val (uni, bi, tri) = graft.ops.Corpus.trigramModelCounts(
      model, "doc_id", "text", buckets = 2)
    val out = graft.ops.Corpus.knScoreWithModel(
        Seq(10L -> "zzz").toDF("doc_id", "text"), "doc_id", "text",
        graft.ops.Corpus.lmFoldUni(uni), graft.ops.Corpus.lmFoldBi(bi),
        graft.ops.Corpus.lmFoldTri(tri))
      .select("n_tokens", "logprob_micro").as[(Long, Long)].head()
    // model: T=6 tokens, V=3 types -> floor ln(1/9)
    assert(out == ((1L, math.round(math.log(1.0 / 9.0) * 1e6))))
  }

  test("unseen trigram with seen context keeps the continuation mass") {
    // model has trigrams (a,b,c) x2; scoring "a b d": (a,b) context seen,
    // type (a,b,d) unseen -> numerator D*N3(ab)*P2c(d|b); d IS a model
    // token (appears as bigram right in "c d") so P1(d) = n1l/nb
    val model = Seq(1L -> "a b c d", 2L -> "a b c").toDF("doc_id", "text")
    val (uni, bi, tri) = graft.ops.Corpus.trigramModelCounts(
      model, "doc_id", "text", buckets = 2)
    val out = graft.ops.Corpus.knScoreWithModel(
        Seq(10L -> "a b d").toDF("doc_id", "text"), "doc_id", "text",
        graft.ops.Corpus.lmFoldUni(uni), graft.ops.Corpus.lmFoldBi(bi),
        graft.ops.Corpus.lmFoldTri(tri))
      .select("logprob_micro").as[Long].head()
    // counts: cf a2 b2 c2 d1 (T=7 V=4); bigrams (a,b)2 (b,c)2 (c,d)1, nb=3
    // cv: a c_v=2 n2r=1; unic: b1 c1 d1; trigrams (a,b,c)2 -> cuv(a,b)=2 N3=1
    // mid (b,c)=1; midv b: n1l_v=1 n2_v=1
    val lw0 = math.log(3.0 / 11.0) // first "a": (2+1)/(7+4)
    val lw2 = math.log((2.0 - 0.75 + 0.75 * 1.0 * (1.0 / 3.0)) / 2.0) // (a,b)
    val p2cD = (math.max(0.0 - 0.75, 0.0) + 0.75 * 1.0 * (1.0 / 3.0)) / 1.0
    val lw3 = math.log((0.0 + 0.75 * 1.0 * p2cD) / 2.0) // (a,b,d) unseen type
    val expected = math.round(lw0 * 1e6) + math.round(lw2 * 1e6) +
      math.round(lw3 * 1e6)
    assert(out == expected, s"got $out expected $expected")
  }
}

class FleissKappaSpec extends SparkSpec {
  import spark.implicits._

  test("perfect agreement gives kappa_micro 1e6") {
    val rated = (0L until 4L).flatMap(i => Seq(
      (i, "a", i % 2), (i, "b", i % 2))).toDF("item", "rater", "lbl")
    val out = graft.ops.Evaluation.fleissKappa(rated, "item", "rater", "lbl",
        raters = 2)
      .select("n_items", "kappa_micro").as[(Long, Long)].head()
    assert(out == ((4L, 1000000L)))
  }

  test("Fleiss 1971 worked shape: hand-computed rational") {
    // 3 items, 3 raters, 2 labels; n_ik rows: item0 (3,0) item1 (2,1)
    // item2 (1,2) -> S = 9 + 5 + 5 = 19; A = 19-9=10; B = 3*3*2=18
    // M = (6, 3) -> C = 45; E = 81
    // kappa = (10*81 - 45*18) / (18*(81-45)) = 0/648 = 0
    val rated = Seq(
      (0L, "a", 0L), (0L, "b", 0L), (0L, "c", 0L),
      (1L, "a", 0L), (1L, "b", 0L), (1L, "c", 1L),
      (2L, "a", 0L), (2L, "b", 1L), (2L, "c", 1L)
    ).toDF("item", "rater", "lbl")
    val out = graft.ops.Evaluation.fleissKappa(rated, "item", "rater", "lbl",
        raters = 3)
      .select("n_items", "p_bar_micro", "p_e_micro", "kappa_micro")
      .as[(Long, Long, Long, Long)].head()
    // P_bar = 10/18 = 0.5555.., P_e = 45/81 = 0.5555.., kappa = 0
    assert(out == ((3L, 555555L, 555555L, 0L)))
  }

  test("below-chance agreement yields a NEGATIVE kappa (division parity)") {
    // 2 raters always disagree on a 2-label task with even marginals:
    // P_bar = 0, P_e = 1/2, kappa = -1
    val rated = (0L until 6L).flatMap(i => Seq(
      (i, "a", i % 2), (i, "b", (i + 1) % 2))).toDF("item", "rater", "lbl")
    val out = graft.ops.Evaluation.fleissKappa(rated, "item", "rater", "lbl",
        raters = 2)
      .select("p_bar_micro", "p_e_micro", "kappa_micro")
      .as[(Long, Long, Long)].head()
    assert(out == ((0L, 500000L, -1000000L)))
  }

  test("items with the wrong rating count are excluded") {
    val rated = (Seq((0L, "a", 0L), (0L, "b", 0L), (1L, "a", 1L)) ++
      Seq((2L, "a", 0L), (2L, "b", 0L), (2L, "c", 1L)))
      .toDF("item", "rater", "lbl")
    val n = graft.ops.Evaluation.fleissKappa(rated, "item", "rater", "lbl",
        raters = 2)
      .select("n_items").as[Long].head()
    assert(n == 1L) // only item 0 has exactly 2 ratings
  }
}

class DdSketchSpec extends SparkSpec {
  import spark.implicits._

  test("estimates carry at most 1/16 relative error on a known spread") {
    val vals = (1L to 10000L).toDF("v")
    val hist = graft.ops.Sketches.ddSketchHistogram(vals, "v")
    val out = graft.ops.Sketches.ddQuantiles(hist,
        Seq(500000L, 900000L, 990000L))
      .select("q_micro", "estimate").as[(Long, Long)].collect().toMap
    def check(q: Long, exact: Double): Unit = {
      val est = out(q).toDouble
      assert(math.abs(est - exact) / exact <= 1.0 / 16.0 + 1e-9,
        s"q=$q est=$est exact=$exact")
    }
    check(500000L, 5000.0); check(900000L, 9000.0); check(990000L, 9900.0)
  }

  test("histogram stays bounded and zeros land in the zero bucket") {
    val vals = (Seq.fill(5)(0L) ++ (1L to 100000L by 7L)).toDF("v")
    val hist = graft.ops.Sketches.ddSketchHistogram(vals, "v").collect()
    assert(hist.length <= 63 * 16 + 1)
    val zero = hist.find(r => r.getInt(0) == 0)
    assert(zero.exists(_.getLong(2) == 5L))
  }

  test("fold of per-batch histograms equals the full-corpus rebuild") {
    val a = (1L to 3000L).toDF("v")
    val b = (2000L to 9000L).toDF("v")
    val whole = (1L to 3000L).union(2000L to 9000L).toDF("v")
    val folded = graft.ops.Sketches.ddSketchFold(
        graft.ops.Sketches.ddSketchHistogram(a, "v")
          .union(graft.ops.Sketches.ddSketchHistogram(b, "v")))
      .orderBy("octave", "sub").collect().toSeq
    val rebuilt = graft.ops.Sketches.ddSketchHistogram(whole, "v")
      .orderBy("octave", "sub").collect().toSeq
    assert(folded == rebuilt)
  }

  test("q=0 and q=1e6 clamp to the extreme buckets") {
    val vals = Seq(7L, 900L, 31L).toDF("v")
    val hist = graft.ops.Sketches.ddSketchHistogram(vals, "v")
    val out = graft.ops.Sketches.ddQuantiles(hist, Seq(0L, 1000000L))
      .select("q_micro", "rank", "estimate")
      .as[(Long, Long, Long)].collect()
      .map { case (q, r, e) => q -> ((r, e)) }.toMap
    assert(out(0L)._1 == 1L)      // rank clamps up to 1
    assert(out(1000000L)._1 == 3L)
    assert(out(0L)._2 <= 7L && out(1000000L)._2 <= 900L)
  }
}

class DdGroupedAndDebiasSpec extends SparkSpec {
  import spark.implicits._

  test("grouped quantiles are independent per group") {
    val vals = ((1L to 1000L).map(v => ("small", v)) ++
      (1L to 1000L).map(v => ("big", v * 1000L))).toDF("g", "v")
    val hist = graft.ops.Sketches.ddSketchHistogramByGroup(vals, "g", "v")
    val out = graft.ops.Sketches.ddQuantilesByGroup(hist, Seq(500000L))
      .select("grp", "estimate").as[(String, Long)].collect().toMap
    assert(math.abs(out("small") - 500.0) / 500.0 <= 1.0 / 16.0 + 1e-9)
    assert(math.abs(out("big") - 500000.0) / 500000.0 <= 1.0 / 16.0 + 1e-9)
  }

  test("grouped fold equals rebuild per group") {
    val a = Seq(("x", 5L), ("x", 9L), ("y", 100L)).toDF("g", "v")
    val b = Seq(("x", 5L), ("y", 7L)).toDF("g", "v")
    val folded = graft.ops.Sketches.ddSketchFoldByGroup(
        graft.ops.Sketches.ddSketchHistogramByGroup(a, "g", "v")
          .union(graft.ops.Sketches.ddSketchHistogramByGroup(b, "g", "v")))
      .orderBy("grp", "octave", "sub").collect().toSeq
    val rebuilt = graft.ops.Sketches.ddSketchHistogramByGroup(
        a.union(b), "g", "v")
      .orderBy("grp", "octave", "sub").collect().toSeq
    assert(folded == rebuilt)
  }

  test("debiased reward centers every length bin at ~zero mean") {
    val df = (1L to 64L).map(i => (i, i % 7L, i * 30L))
      .toDF("doc_id", "reward", "len")
    val out = graft.ops.Rlhf.lengthDebiasedReward(df, "doc_id", "reward",
        "len", nBins = 4)
      .select("bin", "debiased_micro").as[(Int, Long)].collect().toSeq
    val byBin = out.groupBy(_._1).view.mapValues(_.map(_._2))
    byBin.foreach { case (bin, vs) =>
      // floor-micro bin means leave at most cnt micro of residue
      assert(math.abs(vs.sum) < vs.length + 1,
        s"bin $bin residue ${vs.sum}")
    }
  }

  test("debiasing is a pure shift within each bin (ordering preserved)") {
    val df = Seq((1L, 10L, 100L), (2L, 30L, 110L), (3L, 20L, 105L))
      .toDF("doc_id", "reward", "len") // all land in bin 0 window
    val out = graft.ops.Rlhf.lengthDebiasedReward(df, "doc_id", "reward",
        "len", nBins = 1)
      .select("doc_id", "debiased_micro").as[(Long, Long)].collect().toMap
    assert(out(2L) > out(3L) && out(3L) > out(1L))
    assert(out(2L) - out(1L) == 20000000L)
  }
}

class OperatingPointSpec extends SparkSpec {
  import spark.implicits._

  private def scored = Seq(
    // (lbl, score): negatives at scores 1,1,2,3; positives at 2,3,4,4
    (0L, 1L), (0L, 1L), (0L, 2L), (0L, 3L),
    (1L, 2L), (1L, 3L), (1L, 4L), (1L, 4L)
  ).toDF("lbl", "score")

  test("threshold is the loosest cut meeting the FPR budget") {
    // t=4: fpr 0/4;  t=3: 1/4;  t=2: 2/4;  budget 25% -> pick t=3
    val out = graft.ops.Evaluation.fprThreshold(scored, "lbl", "score",
        alphaMicro = 250000L)
      .select("threshold", "fpr_micro", "tpr_micro")
      .as[(Long, Long, Long)].head()
    assert(out == ((3L, 250000L, 750000L)))
  }

  test("zero budget forces the clean threshold") {
    val out = graft.ops.Evaluation.fprThreshold(scored, "lbl", "score",
        alphaMicro = 0L)
      .select("threshold", "fpr_micro", "tpr_micro")
      .as[(Long, Long, Long)].head()
    assert(out == ((4L, 0L, 500000L)))
  }

  test("impossible budget returns null threshold") {
    // every score value contains a negative -> no cut has FPR 0
    val df = Seq((0L, 5L), (1L, 5L)).toDF("lbl", "score")
    val out = graft.ops.Evaluation.fprThreshold(df, "lbl", "score",
        alphaMicro = 0L)
      .select("threshold").as[Option[Long]].head()
    assert(out.isEmpty)
  }

  test("brier score: perfect, worst, and half-sure predictions") {
    val perfect = Seq((1L, 1000000L), (0L, 0L)).toDF("lbl", "s")
    val worst = Seq((1L, 0L), (0L, 1000000L)).toDF("lbl", "s")
    val half = Seq((1L, 500000L), (0L, 500000L)).toDF("lbl", "s")
    def b(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Evaluation.brierScore(df, "lbl", "s")
        .select("brier_micro").as[Long].head()
    assert(b(perfect) == 0L)
    assert(b(worst) == 1000000L)
    assert(b(half) == 250000L)
  }
}

class TruncationRecallSpec extends SparkSpec {
  import spark.implicits._

  test("full-width truncation is a self-comparison with recall 1") {
    val emb = (1L to 30L).map(i =>
      (i, Array(i.toFloat, (i % 7).toFloat, (i % 3).toFloat, 1f)))
      .toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = graft.ops.SimilaritySearch.truncationRecall(emb, "vec_id",
        "embedding", q, "qid", "qvec", dims = Seq(4), k = 5)
      .select("dim", "n_queries", "recall_micro", "min_recall_micro")
      .as[(Int, Long, Long, Long)].head()
    assert(out == ((4, 3L, 1000000L, 1000000L)))
  }

  test("an adversarial tail dimension degrades truncated recall") {
    // first dim identical everywhere; the last dims carry all signal ->
    // ranking by dim-1 prefix is noise, full ranking is exact
    val emb = (1L to 40L).map(i =>
      (i, Array(1f, i.toFloat, (i * i % 97).toFloat)))
      .toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" === 1L)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = graft.ops.SimilaritySearch.truncationRecall(emb, "vec_id",
        "embedding", q, "qid", "qvec", dims = Seq(1, 3), k = 5)
      .select("dim", "recall_micro").as[(Int, Long)].collect().toMap
    assert(out(3) == 1000000L)
    assert(out(1) < 1000000L) // dim-1 cosine is constant 1.0 -> id-order ties
  }

  test("monotone signal concentration: more dims never hurt on this corpus") {
    val emb = (1L to 50L).map { i =>
      (i, Array.tabulate(8)(j => ((i * (j + 3)) % 11).toFloat + 1f))
    }.toDF("vec_id", "embedding")
    val q = emb.where($"vec_id" % 25 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = graft.ops.SimilaritySearch.truncationRecall(emb, "vec_id",
        "embedding", q, "qid", "qvec", dims = Seq(2, 8), k = 8)
      .select("dim", "recall_micro").as[(Int, Long)].collect().toMap
    assert(out(8) == 1000000L)
    assert(out(2) <= out(8))
  }
}

class BurstinessSpec extends SparkSpec {
  import spark.implicits._

  test("clumping token outranks the uniformly scattered one") {
    // "filler" once per doc (Poisson-ish, VMR ~ <1e6 here since constant);
    // "burst" all 8 occurrences inside one doc
    val docs = ((1L to 7L).map(i => (i, "filler")) :+
      (8L, "filler burst burst burst burst burst burst burst burst"))
      .toDF("doc_id", "text")
    val out = graft.ops.Corpus.tokenBurstiness(docs, "doc_id", "text",
        vocabK = 10, k = 10)
      .select("token", "df", "tf_total", "vmr_micro")
      .as[(String, Long, Long, Long)].collect()
    val m = out.map(r => r._1 -> r).toMap
    assert(out.head._1 == "burst")
    // burst: n=8 docs, df=1, s=8, q=64 -> (8*64-64)/(8*8) = 7
    assert(m("burst") == (("burst", 1L, 8L, 7000000L)))
    // filler: s=8, q=8 -> (64-64)/64 = 0 (constant count = no dispersion)
    assert(m("filler") == (("filler", 8L, 8L, 0L)))
  }

  test("poisson-like scatter sits near 1e6") {
    // token appears 0 or 2 times alternately: n=10, s=10, q=20
    // VMR = (10*20 - 100)/(10*10) = 1.0
    val docs = (1L to 10L).map(i =>
      (i, if (i % 2 == 0) "tok tok pad" else "pad")).toDF("doc_id", "text")
    val vmr = graft.ops.Corpus.tokenBurstiness(docs, "doc_id", "text",
        vocabK = 5, k = 5)
      .where($"token" === "tok").select("vmr_micro").as[Long].head()
    assert(vmr == 1000000L)
  }
}

class StoredFoldParitySpec extends SparkSpec {
  import spark.implicits._

  test("BT: folded per-batch counts refit bit-identical to full history") {
    val battles = (1L to 60L).map { i =>
      val a = s"m${i % 5}"; val b = s"m${(i * 3 + 1) % 5}"
      if (a == b) (s"m${i % 5}", s"m${(i + 1) % 5}", i)
      else if (i % 3 == 0) (a, b, i) else (b, a, i)
    }.toDF("w", "l", "bid").where($"w" =!= $"l")
    val full = graft.ops.Rlhf.bradleyTerryMicro(battles, "w", "l", iters = 4)
      .as[(String, Long)].collect().toMap
    val parts = Seq(0L, 1L, 2L).map(r => battles.where($"bid" % 3 === r))
    val counted = parts.map(p =>
      graft.ops.Rlhf.btBattleCounts(p, "w", "l", buckets = 4))
    val folded = graft.ops.Rlhf.bradleyTerryFromCounts(
        graft.ops.Rlhf.btFoldPairs(counted.map(_._1).reduce(_ union _)),
        graft.ops.Rlhf.btFoldWins(counted.map(_._2).reduce(_ union _)),
        iters = 4)
      .as[(String, Long)].collect().toMap
    assert(folded == full)
  }

  test("DD: randomized batch splits always fold to the rebuild") {
    val rng = new scala.util.Random(20260815L)
    val vals = Seq.fill(800)(math.abs(rng.nextLong()) % 1000000L)
    (1 to 5).foreach { trial =>
      val marks = vals.map(_ => rng.nextInt(4))
      val batches = (0 until 4).map(b =>
        vals.zip(marks).collect { case (v, m) if m == b => v })
      val folded = graft.ops.Sketches.ddSketchFold(
          batches.filter(_.nonEmpty)
            .map(b => graft.ops.Sketches.ddSketchHistogram(b.toDF("v"), "v"))
            .reduce(_ union _))
        .orderBy("octave", "sub").as[(Int, Long, Long)].collect().toSeq
      val rebuilt = graft.ops.Sketches.ddSketchHistogram(vals.toDF("v"), "v")
        .orderBy("octave", "sub").as[(Int, Long, Long)].collect().toSeq
      assert(folded == rebuilt, s"trial $trial diverged")
    }
  }
}

class MadOutliersSpec extends SparkSpec {
  import spark.implicits._

  test("single spike flagged; median/MAD ignore it") {
    // group g: values 10x100 plus one 900 -> med=100, MAD=0? devs: ten 0s
    // and one 800 -> MAD = 0 -> strict > flags only the spike
    val df = ((1L to 10L).map(i => ("g", i, 100L)) :+ (("g", 11L, 900L)))
      .toDF("grp", "id", "v")
    val out = graft.ops.Maintenance.madOutliers(df, "grp", "id", "v",
        kMicro = 3000000L, cap = 10)
      .select("id", "v").as[(Long, Long)].collect().toSeq
    assert(out == Seq((11L, 900L)))
  }

  test("z-score-breaking contamination: MAD still isolates the far tail") {
    // 3 huge outliers would drag a mean/sigma gate; median stays at the body
    val body = (1L to 20L).map(i => ("g", i, 50L + (i % 5)))
    val tail = Seq(("g", 101L, 5000L), ("g", 102L, 6000L), ("g", 103L, 7000L))
    val out = graft.ops.Maintenance.madOutliers(
        (body ++ tail).toDF("grp", "id", "v"), "grp", "id", "v",
        kMicro = 3000000L, cap = 10)
      .select("id").as[Long].collect().toSet
    assert(out == Set(101L, 102L, 103L))
  }

  test("groups are independent and the cap orders by deviation") {
    val df = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1000L),
      ("b", 5L, 10L), ("b", 6L, 10L), ("b", 7L, 10L), ("b", 8L, 99999L))
      .toDF("grp", "id", "v")
    val out = graft.ops.Maintenance.madOutliers(df, "grp", "id", "v",
        kMicro = 2000000L, cap = 1)
      .select("grp", "id").as[(String, Long)].collect().toSeq
    assert(out == Seq(("b", 8L))) // largest deviation wins the cap
  }
}

class TClosenessSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed TV: skewed classes flagged, balanced class clean") {
    // corpus: 12 rows, global 0/1 split 6/6; class A all 0 and class C
    // all 1 -> TV = 1/2 each; class B 2/2 mirrors the corpus -> TV = 0
    val df = (Seq.fill(4)(("A", 0L)) ++ Seq(("B", 0L), ("B", 0L),
      ("B", 1L), ("B", 1L)) ++ Seq.fill(4)(("C", 1L))).zipWithIndex
      .map { case ((z, s), i) => (z, s, i) }.toDF("zip", "sens", "i")
    val out = graft.ops.Privacy.tClosenessViolations(df, Seq("zip"), "sens",
        tMicro = 100000L, cap = 10)
      .select("zip", "class_size", "tv_micro")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("A", 4L, 500000L), ("C", 4L, 500000L)))
  }

  test("absent-value mass counts: single-value class vs 3-way corpus") {
    // global: 0/1/2 each 3 of 9 rows; class A (3 rows) all value 0:
    // TV = (|3*9-3*3| + absent (3+3)*3) / (2*3*9) = (18+18)/54 = 2/3;
    // class B (6 rows, 1/2 split 3/3, no 0s):
    // TV = (absent 3*6 + |3*9-3*6|*2) / (2*6*9) = 36/108 = 1/3
    val rows = (0L until 3L).map(i => ("A", 0L, i)) ++
      (3L until 9L).map(i => ("B", i % 2 + 1L, i))
    val out = graft.ops.Privacy.tClosenessViolations(
        rows.toDF("zip", "sens", "i"), Seq("zip"), "sens",
        tMicro = 0L, cap = 10)
      .select("zip", "tv_micro").as[(String, Long)].collect().toMap
    assert(out == Map("A" -> 666666L, "B" -> 333333L))
  }

  test("the l-diversity blind spot: diverse but 90 percent one value") {
    // class has all 3 distinct values (passes l=3) but is 10/1/1 skewed
    val corpus = (0L until 36L).map(i => ("bg", i % 3, i)) ++
      ((0L until 10L).map(i => ("leak", 0L, 100 + i)) ++
        Seq(("leak", 1L, 111L), ("leak", 2L, 112L)))
    val df = corpus.toDF("zip", "sens", "i")
    val ldiv = graft.ops.Privacy.lDiversityViolations(df, Seq("zip"), "sens",
      l = 3L, cap = 10)
    assert(ldiv.count() == 0L) // l-diversity sees nothing
    val tc = graft.ops.Privacy.tClosenessViolations(df, Seq("zip"), "sens",
        tMicro = 200000L, cap = 10)
      .select("zip").as[String].collect().toSeq
    assert(tc == Seq("leak")) // t-closeness catches the skew
  }
}

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private def at(day: Int, i: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 0${i % 9}:00:00")

  test("clean level shift is found at the shift day") {
    // type g: 2 events/day for days 1-5, 10/day for days 6-10 ->
    // best split after day 5: |10*5 - 50*5| / (5*5) = wait, exact below
    val rows = (1 to 5).flatMap(dd => (0 until 2).map(i => ("g", at(dd, i)))) ++
      (6 to 10).flatMap(dd => (0 until 10).map(i => ("g", at(dd, i))))
    val out = graft.ops.Relational.changepointSplit(
        rows.toDF("event_type", "ts"), "event_type", "ts")
      .select("n_days", "split_day", "diff_micro")
      .as[(Long, java.sql.Timestamp, Long)].head()
    // at t=5: S_t=10, Sn=60, gap = |10*5 - 50*5|/(5*5) = 200/25 = 8.0
    assert(out._1 == 10L)
    assert(out._2.toString.startsWith("2024-01-05"))
    assert(out._3 == 8000000L)
  }

  test("constant series has zero gap everywhere") {
    val rows = (1 to 6).flatMap(dd => (0 until 3).map(i => ("g", at(dd, i))))
    val out = graft.ops.Relational.changepointSplit(
        rows.toDF("event_type", "ts"), "event_type", "ts")
      .select("diff_micro").as[Long].head()
    assert(out == 0L)
  }

  test("groups split independently") {
    val rows = (1 to 4).flatMap(dd => Seq(("a", at(dd, 0)))) ++
      (5 to 8).flatMap(dd => (0 until 5).map(i => ("a", at(dd, i)))) ++
      (1 to 8).map(dd => ("b", at(dd, 0)))
    val out = graft.ops.Relational.changepointSplit(
        rows.toDF("event_type", "ts"), "event_type", "ts")
      .select("event_type", "split_day", "diff_micro")
      .as[(String, java.sql.Timestamp, Long)].collect()
      .map(r => r._1 -> ((r._2.toString.take(10), r._3))).toMap
    assert(out("a") == (("2024-01-04", 4000000L))) // 1/day -> 5/day
    assert(out("b")._2 == 0L)
  }
}

class CellScatterSpec extends SparkSpec {
  import spark.implicits._

  test("tight vs loose cluster: tightness and separation read correctly") {
    // two orthogonal-ish centroids (ids 0, 1); members of 0 hug it,
    // members of 1 wobble
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
      (10L, Array(10f, 0.1f, 0f, 0f)), (11L, Array(8f, 0.2f, 0f, 0f)),
      (20L, Array(0.5f, 1f, 0f, 0f)), (21L, Array(1f, 2f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = graft.ops.SimilaritySearch.sampleCentroids(
      emb, "vec_id", "embedding", 2)
    val out = graft.ops.SimilaritySearch.cellScatterReport(
        emb, "vec_id", "embedding", cents)
      .orderBy($"cell")
      .select("cell", "n", "mean_dist_micro", "min_sep_micro")
      .as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(0, 1))
    assert(out.map(_._2).toSeq == Seq(3L, 3L)) // centroid rows assign home
    // orthogonal centroids: separation = 1.0 on both sides
    assert(out.forall(_._4 == 1000000L))
    // cell 0's members hug the axis; cell 1's wobble more
    assert(out(0)._3 < out(1)._3)
  }

  test("a row exactly on a centroid contributes zero distance") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (5L, Array(2f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = graft.ops.SimilaritySearch.sampleCentroids(
      emb, "vec_id", "embedding", 2)
    val cell0 = graft.ops.SimilaritySearch.cellScatterReport(
        emb, "vec_id", "embedding", cents)
      .where($"cell" === 0).select("n", "mean_dist_micro")
      .as[(Long, Long)].head()
    assert(cell0 == ((2L, 0L))) // id 0 and the colinear id 5
  }
}

class WeightedTextRankSpec extends SparkSpec {
  import spark.implicits._

  test("heavy collocation outranks the same graph's light edges") {
    // hub-x repeated 9 times; hub-y once: weighted rank(x) > rank(y);
    // the unweighted form sees identical edges
    val docs = ((1L to 9L).map(i => (i, "hub x")) :+ (10L, "hub y"))
      .toDF("doc_id", "text")
    val wtd = graft.ops.Corpus.textRankKeywordsWeighted(docs, "doc_id",
        "text", vocabK = 5, iters = 3, k = 5)
      .as[(String, Long)].collect().toMap
    assert(wtd("x") > wtd("y"))
    val unw = graft.ops.Corpus.textRankKeywords(docs, "doc_id",
        "text", vocabK = 5, iters = 3, k = 5)
      .as[(String, Long)].collect().toMap
    assert(unw("x") == unw("y"))
  }

  test("uniform weights reproduce the unweighted ranking order") {
    val docs = Seq((1L, "a b c d e a b c")).toDF("doc_id", "text")
    val wtd = graft.ops.Corpus.textRankKeywordsWeighted(docs, "doc_id",
        "text", vocabK = 5, iters = 2, k = 5)
      .as[(String, Long)].collect().map(_._1).toSeq
    val unw = graft.ops.Corpus.textRankKeywords(docs, "doc_id",
        "text", vocabK = 5, iters = 2, k = 5)
      .as[(String, Long)].collect().map(_._1).toSeq
    // a-b and b-c edges carry weight 2, others 1 -> order may differ from
    // unweighted, but both must rank the same vertex set
    assert(wtd.toSet == unw.toSet)
  }
}

class MarkovStationarySpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00")

  test("absorbing-ish state accumulates stationary mass") {
    // one user: A -> B -> A -> B -> B -> B -> B (B dominates transitions)
    val seq = Seq("A", "B", "A", "B", "B", "B", "B")
    val rows = seq.zipWithIndex.map { case (t, i) => (1L, t, ts(i), i.toLong) }
    val out = graft.ops.Relational.markovStationaryMicro(
        rows.toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id", iters = 6)
      .as[(String, Long)].collect().toMap
    assert(out("B") > out("A"))
    assert(math.abs(out.values.sum - 2000000L) <= 2L)
  }

  test("symmetric two-state chain converges to the uniform vector") {
    // strict alternation A,B,A,B...: doubly stochastic -> uniform
    val rows = (0 until 10).map(i =>
      (1L, if (i % 2 == 0) "A" else "B", ts(i), i.toLong))
    val out = graft.ops.Relational.markovStationaryMicro(
        rows.toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id", iters = 5)
      .as[(String, Long)].collect().toMap
    assert(out == Map("A" -> 1000000L, "B" -> 1000000L))
  }

  test("dangling state redistributes instead of leaking mass") {
    // C receives but never emits (each user's trace ends at C)
    val rows = Seq((1L, "A", ts(0), 0L), (1L, "C", ts(1), 1L),
      (2L, "A", ts(0), 2L), (2L, "C", ts(1), 3L))
    val out = graft.ops.Relational.markovStationaryMicro(
        rows.toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id", iters = 4)
      .as[(String, Long)].collect().toMap
    assert(out.keySet == Set("A", "C"))
    assert(math.abs(out.values.sum - 2000000L) <= 2L) // no mass lost
    assert(out("C") > out("A")) // everything flows into C; C leaks back half
  }

  test("entities are independent: transitions never cross users") {
    // user 1 only emits A->A; user 2 only B->B; no A<->B edge exists
    val rows = (0 until 4).map(i => (1L, "A", ts(i), i.toLong)) ++
      (0 until 4).map(i => (2L, "B", ts(i), (10 + i).toLong))
    val out = graft.ops.Relational.markovStationaryMicro(
        rows.toDF("user_id", "event_type", "ts", "event_id"),
        "user_id", "event_type", "ts", "event_id", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(out == Map("A" -> 1000000L, "B" -> 1000000L))
  }
}

class EditDistanceVerifySpec extends SparkSpec {
  import spark.implicits._

  test("identical, near, and disjoint pairs score 1e6 / high / low") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "the quick brewn fox"), (4L, "zzzz")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id1", "id2")
    val out = graft.ops.ApproxDedup.editDistanceVerify(
        docs, "doc_id", "text", pairs)
      .select("id2", "lev", "sim_micro").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((0L, 1000000L)))
    assert(out(3L)._1 == 1L && out(3L)._2 > 900000L)
    assert(out(4L)._2 < 200000L)
  }

  test("empty-text pair defines similarity 1 (both empty)") {
    val docs = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val out = graft.ops.ApproxDedup.editDistanceVerify(
        docs, "doc_id", "text", Seq((1L, 2L)).toDF("id1", "id2"))
      .select("sim_micro").as[Long].head()
    assert(out == 1000000L)
  }
}

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("the type every heavy hub hits is the top authority") {
    // users 1-4 all hit "hot" many times; "cold" is hit once by user 5
    val edges = (1L to 4L).flatMap(u => Seq((u, "hot", 5L))) ++
      Seq((5L, "cold", 1L), (5L, "hot", 1L))
    val out = graft.ops.Graph.hitsAuthoritiesMicro(
        edges.toDF("u", "t", "w"), "u", "t", "w", iters = 3)
      .as[(String, Long)].collect().toMap
    assert(out("hot") > out("cold"))
    assert(math.abs(out.values.sum - 2000000L) <= 2L) // L1 = |types|*1e6
  }

  test("symmetric bipartite graph is uniform") {
    val edges = for (u <- 1L to 3L; t <- Seq("x", "y")) yield (u, t, 2L)
    val out = graft.ops.Graph.hitsAuthoritiesMicro(
        edges.toDF("u", "t", "w"), "u", "t", "w", iters = 4)
      .as[(String, Long)].collect().toMap
    assert(out == Map("x" -> 1000000L, "y" -> 1000000L))
  }

  test("parallel edges pre-aggregate: duplicates equal summed weight") {
    val dup = Seq((1L, "a", 1L), (1L, "a", 2L), (2L, "b", 3L))
      .toDF("u", "t", "w")
    val agg = Seq((1L, "a", 3L), (2L, "b", 3L)).toDF("u", "t", "w")
    val r1 = graft.ops.Graph.hitsAuthoritiesMicro(dup, "u", "t", "w", 2)
      .as[(String, Long)].collect().toMap
    val r2 = graft.ops.Graph.hitsAuthoritiesMicro(agg, "u", "t", "w", 2)
      .as[(String, Long)].collect().toMap
    assert(r1 == r2)
  }
}

class RandomizedBtFoldSpec extends SparkSpec {
  import spark.implicits._

  test("BT fold == full-history refit under randomized batch splits") {
    val rng = new scala.util.Random(20260815L)
    val battles = (1L to 80L).map { i =>
      val a = rng.nextInt(6); var b = rng.nextInt(6)
      if (b == a) b = (a + 1) % 6
      (s"m$a", s"m$b", i)
    }
    (1 to 3).foreach { trial =>
      val marks = battles.map(_ => rng.nextInt(4))
      val df = battles.toDF("w", "l", "bid")
      val full = graft.ops.Rlhf.bradleyTerryMicro(df, "w", "l", iters = 4)
        .as[(String, Long)].collect().toMap
      val counted = (0 until 4).flatMap { m =>
        val part = battles.zip(marks).collect { case (b, mm) if mm == m => b }
        if (part.isEmpty) None
        else Some(graft.ops.Rlhf.btBattleCounts(
          part.toDF("w", "l", "bid"), "w", "l", buckets = 4))
      }
      val folded = graft.ops.Rlhf.bradleyTerryFromCounts(
          graft.ops.Rlhf.btFoldPairs(counted.map(_._1).reduce(_ union _)),
          graft.ops.Rlhf.btFoldWins(counted.map(_._2).reduce(_ union _)),
          iters = 4)
        .as[(String, Long)].collect().toMap
      assert(folded == full, s"trial $trial diverged")
    }
  }
}

class QuantileNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("scaled source maps onto the corpus value range") {
    // source A in [1, 100]; source B = A * 1000: after normalization B's
    // rows land on corpus-range values, comparable to A's
    val rows = (1L to 100L).map(i => ("A", i, i)) ++
      (1L to 100L).map(i => ("B", 100 + i, i * 1000L))
    val out = graft.ops.Sketches.quantileNormalize(
        rows.toDF("grp", "id", "v"), "grp", "id", "v")
      .select("grp", "id", "pct_micro", "norm_v")
      .as[(String, Long, Long, Long)].collect()
    val a = out.filter(_._1 == "A"); val b = out.filter(_._1 == "B")
    // equal group sizes: the same within-group rank gets the same
    // percentile, hence the SAME corpus value for A's i and B's i*1000
    val aByPct = a.map(r => r._3 -> r._4).toMap
    assert(b.forall(r => aByPct.get(r._3).forall(_ == r._4)))
    // normalized values live in the pooled corpus bucket range
    assert(b.map(_._4).max <= 100000L && b.map(_._4).min >= 1L)
  }

  test("identical distributions are (bucket-level) fixed points") {
    // one source only: normalization maps each bucket to a corpus value
    // inside itself (lower bound), so norm_v <= v < next bucket
    val rows = (1L to 200L).map(i => ("only", i, i * 7L))
    val out = graft.ops.Sketches.quantileNormalize(
        rows.toDF("grp", "id", "v"), "grp", "id", "v")
      .select("v", "norm_v").as[(Long, Long)].collect()
    out.foreach { case (v, nv) =>
      assert(nv <= v && v.toDouble / nv.toDouble <= 1.0 + 1.0 / 16 + 1e-9,
        s"v=$v norm=$nv")
    }
  }

  test("rows sharing a (group, bucket) normalize identically") {
    val rows = Seq(("g", 1L, 33L), ("g", 2L, 33L), ("g", 3L, 900L))
    val out = graft.ops.Sketches.quantileNormalize(
        rows.toDF("grp", "id", "v"), "grp", "id", "v")
      .select("id", "norm_v").as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
  }
}

class AucByGroupSpec extends SparkSpec {
  import spark.implicits._

  test("per-group AUC separates a good group from an inverted one") {
    // group g1: score ranks positives perfectly (AUC 1); g2 inverted (0)
    val df = Seq(
      ("g1", 0L, 1L), ("g1", 0L, 2L), ("g1", 1L, 3L), ("g1", 1L, 4L),
      ("g2", 1L, 1L), ("g2", 1L, 2L), ("g2", 0L, 3L), ("g2", 0L, 4L))
      .toDF("grp", "lbl", "score")
    val out = graft.ops.Evaluation.signalAucByGroup(df, "grp", "lbl", "score")
      .select("grp", "auc_micro").as[(String, Long)].collect().toMap
    assert(out == Map("g1" -> 1000000L, "g2" -> 0L))
  }

  test("matches the pooled signalAuc when there is one group") {
    val df = (1L to 30L).map(i => ("only", (i % 3 == 0).compare(false).toLong,
      (i * 7) % 11)).toDF("grp", "lbl", "score")
    val pooled = graft.ops.Evaluation.signalAuc(df, "lbl", "score")
      .select("auc_micro").as[Long].head()
    val grouped = graft.ops.Evaluation.signalAucByGroup(df, "grp", "lbl",
        "score")
      .select("auc_micro").as[Long].head()
    assert(grouped == pooled)
  }

  test("single-class group reports null") {
    val df = Seq(("g", 1L, 5L), ("g", 1L, 6L)).toDF("grp", "lbl", "score")
    val out = graft.ops.Evaluation.signalAucByGroup(df, "grp", "lbl", "score")
      .select("auc_micro").as[Option[Long]].head()
    assert(out.isEmpty)
  }
}
