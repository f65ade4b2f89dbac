package graft

import org.apache.spark.sql.functions._
import graft.ops.{Classify, Corpus, Evaluation, Sketches, SimilaritySearch}

/** Edge-case properties of the round-12 trainer/estimator family —
  * exact k-means, WordPiece, Naive Bayes, pass@k, temperature fit, KMV
  * overlap. DuckDB hash parity lives in their oracles; these pin the
  * behaviors the oracles cannot see (empty-cell carry, tie rules,
  * out-of-range ks, degenerate labels). */
class TrainerOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("exact k-means: empty cells carry their previous rational unchanged") {
    // two far clusters + k=3 with an init centroid that captures nothing
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(-1.0f, 0.0f)), (3L, Array(-0.9f, -0.1f)),
      (4L, Array(0.95f, 0.05f))).toDF("vec_id", "embedding")
    val st = SimilaritySearch.kmeansTrainExact(rows, "vec_id", "embedding",
      k = 3, iterations = 2)
    assert(st.size == 3)
    // every coordinate is a valid rational with positive denominator
    st.foreach(_.foreach { case (_, n) => assert(n >= 1L) })
    // determinism: retrain gives the identical state
    val st2 = SimilaritySearch.kmeansTrainExact(rows, "vec_id", "embedding",
      k = 3, iterations = 2)
    assert(st == st2)
  }

  test("exact k-means moves centroids toward cluster means") {
    val emb = Tables.embeddings(spark, sf)
    val st = SimilaritySearch.kmeansTrainExact(emb, "vec_id", "embedding",
      k = 4, iterations = 2)
    val cents = SimilaritySearch.kmeansCents(st)
    // trained centroids differ from the raw init sample
    val init = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 4)
    assert(cents != init, "two Lloyd iterations should move the centroids")
    // and every cell is non-degenerate on this corpus
    assert(st.forall(_.head._2 >= 1L))
  }

  test("wordpiece argmax differs from BPE's on a likelihood-gain corpus") {
    // "a b" is the most FREQUENT pair, but "x y" has far rarer symbols so
    // its likelihood gain is higher: freq/(fa*fb) = 3/(3*3) vs 10/(13*13)
    val docs = (1 to 10).map(i => (i.toLong, "ab ab2"))
      .union(Seq((11L, "xy"), (12L, "xy"), (13L, "xy")))
      .toDF("doc_id", "text")
    val wp = Corpus.wordPieceTrain(docs, "text", nMerges = 1)
      .select("pair").as[String].collect()
    val bpe = Corpus.bpeTrain(docs, "text", nMerges = 1)
      .select("pair").as[String].collect()
    assert(wp.head == "x y", s"wordpiece picked ${wp.head}")
    assert(bpe.head == "a b", s"bpe picked ${bpe.head}")
  }

  test("naive bayes separates trivially separable labels") {
    val docs = (1 to 20).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha", "foo foo bar")
      else (i.toLong, "beta", "baz qux qux")
    }.toDF("doc_id", "source", "text")
    val (cls, toks) = Classify.nbCounts(docs, "source", "text", 4)
    val v = toks.select(col("token")).distinct().count()
    val out = Classify.nbClassify(docs, "doc_id", "source", "text", cls, toks, v)
    assert(out.where(col("actual") =!= col("predicted")).count() == 0)
  }

  test("pass@k: c=n gives 1e6, c=0 gives 0, n<k gives null") {
    val df = Seq(
      ("all", 1), ("all", 1), ("all", 1), ("all", 1), ("all", 1),
      ("none", 0), ("none", 0), ("none", 0), ("none", 0), ("none", 0),
      ("tiny", 1), ("tiny", 0)).toDF("grp", "p")
    val out = Evaluation.passAtK(df, "grp", "p", Seq(1, 5))
      .collect().map(r => r.getString(0) ->
        (r.get(3), r.get(4))).toMap
    assert(out("all") == ((1000000L, 1000000L)))
    assert(out("none") == ((0L, 0L)))
    assert(out("tiny")._1 == 500000L) // 1 - (1/2)
    assert(out("tiny")._2 == null)    // n=2 < k=5: undefined
  }

  test("temperature fit lowers or matches the T=1 NLL and prefers small T on ties") {
    val docs = Tables.documents(spark, sf)
    val scored = docs.select((col("lang") === "en").cast("int").as("y"),
      (graft.functions.TextFns.qualityScore(col("text")) * 1000000)
        .cast("long").as("s"))
    val grid = (1 to 16).map(_ * 250000L)
    val row = Evaluation.temperatureFit(scored, "y", "s", grid).head()
    assert(row.getLong(2) <= row.getLong(1),
      "best NLL must be <= the T=1 baseline")
    assert(grid.contains(row.getLong(0)))
  }

  test("pca: components orthonormal, eigenvalues descending, variance follows") {
    val emb = Tables.embeddings(spark, sf)
    val (comps, eigs, _) = SimilaritySearch.pcaComponents(emb,
      "vec_id", "embedding", nSample = 128, p = 4)
    // eigenvalues sorted descending
    assert(eigs == eigs.sortBy(-_))
    // orthonormal within 1e-9
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    for (i <- comps.indices; j <- comps.indices) {
      val d = dot(comps(i), comps(j))
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"<c$i, c$j> = $d")
    }
    // corpus variance-explained follows the component order on real data
    val rep = SimilaritySearch.pcaVarianceReport(emb, "embedding",
        comps, eigs, SimilaritySearch.pcaComponents(emb,
          "vec_id", "embedding", nSample = 128, p = 4)._3)
      .orderBy(col("component")).collect().map(_.getLong(2))
    assert(rep.head >= rep.last,
      "first component should explain at least as much corpus variance as the last")
  }

  test("krippendorff: perfect agreement gives alpha = 1e6, known case matches") {
    val perfect = Seq(
      (1L, 0L), (1L, 0L), (2L, 1L), (2L, 1L), (3L, 0L), (3L, 0L))
      .toDF("item", "lbl")
    val a = Evaluation.krippendorffAlpha(perfect, "item", "lbl", maxRaters = 3)
      .head().getLong(3)
    assert(a == 1000000L)
    // hand-computed nominal case (2 coders, 12 items, 2 disagreements):
    // n=24, Num=4, n_c=(3,9,5,7) ⇒ De-den=576−164=412,
    // α = 1 − 23·4/412 = 320/412 = 0.776699…
    val known = Seq(
      (1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"), (3L, "b"), (3L, "b"),
      (4L, "b"), (4L, "b"), (5L, "b"), (5L, "b"), (6L, "c"), (6L, "c"),
      (7L, "c"), (7L, "c"), (8L, "c"), (8L, "b"), (9L, "d"), (9L, "d"),
      (10L, "d"), (10L, "d"), (11L, "d"), (11L, "d"), (12L, "a"), (12L, "d"))
      .toDF("item", "lbl")
    val a2 = Evaluation.krippendorffAlpha(known, "item", "lbl", maxRaters = 2)
      .head().getLong(3)
    assert(a2 == 776699L, s"alpha_micro = $a2")
  }

  test("rbo: identical rankings give 1 - p^d, disjoint give 0") {
    val a = (1 to 10).map(i => (i.toLong, i)).toDF("doc_id", "rank")
    val b = (1 to 10).map(i => (i.toLong + 100L, i)).toDF("doc_id", "rank")
    val same = Evaluation.rbo(a, a, "doc_id", "rank", depth = 10, p = 0.9)
      .head().getLong(3)
    val want = math.round((1.0 - math.pow(0.9, 10)) * 1e6)
    assert(math.abs(same - want) <= 1, s"rbo(same) = $same, want ~$want")
    val disj = Evaluation.rbo(a, b, "doc_id", "rank", depth = 10, p = 0.9)
      .head().getLong(3)
    assert(disj == 0L)
  }

  test("k-center: first pick is min id, radii non-increasing, picks distinct") {
    val emb = Tables.embeddings(spark, sf)
    val out = graft.ops.Sampling.kCenterSelect(emb, "vec_id", "embedding", 6)
      .orderBy(col("pick_order")).collect()
    assert(out.head.getLong(1) ==
      emb.agg(min(col("vec_id"))).head().getLong(0))
    val radii = out.drop(1).map(_.getLong(2))
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b },
      s"covering radii must be non-increasing: ${radii.toSeq}")
    assert(out.map(_.getLong(1)).distinct.length == 6)
  }

  test("conformal gate: tau rank honors alpha and eval coverage is near 1-alpha") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    def scored(df: org.apache.spark.sql.DataFrame) = df.select(
      (lit(1000000L) - (graft.functions.TextFns.qualityScore(col("text"))
        * 1000000).cast("long")).as("s"))
    val row = Evaluation.conformalGate(
      scored(docs.where(col("doc_id") % 2 === 0)),
      scored(docs.where(col("doc_id") % 2 === 1)),
      "s", alphaMicro = 100000L).head()
    val (nCal, k) = (row.getLong(0), row.getLong(1))
    assert(k == math.min(nCal, ((nCal + 1) * 900000L + 999999L) / 1000000L))
    val cov = row.getLong(5)
    // even/odd splits of one corpus are exchangeable: coverage within a
    // loose band of 1-alpha (quality is coarsely quantized, so overshoot
    // toward 1.0 is expected; undershoot below ~0.85 would be a bug)
    assert(cov >= 850000L && cov <= 1000000L, s"coverage_micro = $cov")
  }

  test("min-k% prob: a repeated (memorized) doc scores above a rare-token doc") {
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, "the common words appear here again and again")) ++
      Seq((100L, "zqx vnm wkj rareword onlyonce"))
    val out = Corpus.minKProb(docs.toDF("doc_id", "text"), "doc_id", "text",
        fracMicro = 200000L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(0L) > out(100L),
      s"memorized ${out(0L)} should beat rare ${out(100L)}")
  }

  test("itq beats srp on aggregate recall at equal bits (the ship gate)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val (w, o) = SimilaritySearch.itqModel(emb, "vec_id", "embedding", nBits = 16)
    val planes = SimilaritySearch.srpPlanes(dim = 64, nBits = 16)
    def arm(df: org.apache.spark.sql.DataFrame, m: String) =
      SimilaritySearch.hammingRecallReport(df, "vec_id", "embedding", "sig",
          Seq(0L, 1L, 2L, 3L), k = 10, cand = 50, m)
        .agg(sum(col("hits"))).head().getLong(0)
    val itq = arm(SimilaritySearch.withAffineSignature(emb, "embedding", w, o), "itq")
    val srp = arm(SimilaritySearch.withSrpSignature(emb, "embedding", planes), "srp")
    assert(itq > srp, s"itq hits $itq should beat srp hits $srp")
  }

  test("ndcg: the ideal ranking scores exactly 1e6") {
    val judged = Seq((1L, 3L), (2L, 2L), (3L, 1L), (4L, 0L), (5L, 3L))
      .toDF("id", "rel")
    // ideal order: rel desc, id asc -> 1, 5, 2, 3, 4
    val ranked = Seq((1L, 1), (5L, 2), (2L, 3), (3L, 4), (4L, 5))
      .toDF("id", "rank")
    val row = Evaluation.ndcgAtK(ranked, judged, "id", "rank", "rel", k = 5).head()
    assert(row.getLong(3) == 1000000L, s"ideal ndcg = ${row.getLong(3)}")
    // a reversed ranking scores strictly less
    val rev = Seq((4L, 1), (3L, 2), (2L, 3), (5L, 4), (1L, 5)).toDF("id", "rank")
    val worse = Evaluation.ndcgAtK(rev, judged, "id", "rank", "rel", k = 5)
      .head().getLong(3)
    assert(worse < 1000000L)
  }

  test("signal MI: independent signals near zero, identical signals positive") {
    val rng = new scala.util.Random(7L)
    val ind = (1 to 4000).map(_ => (rng.nextInt(3).toLong, rng.nextInt(3).toLong))
      .toDF("x", "y")
    def mi(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = Evaluation.signalMi(df, "x", "y")
        .agg(sum(col("contrib_micro")), sum(col("c_xy"))).head()
      rows.getLong(0).toDouble / rows.getLong(1)
    }
    assert(math.abs(mi(ind)) < 20000, "independent signals: MI ~ 0")
    val same = (1 to 300).map(i => ((i % 3).toLong, (i % 3).toLong)).toDF("x", "y")
    assert(mi(same) > 1000000, "identical 3-way signals: MI = ln 3 ~ 1.0986e6")
  }

  test("kmv overlap: identical sources estimate full jaccard, disjoint zero") {
    val docs = Seq(
      (1L, "s1", "w1 w2 w3 w4 w5 w6"), (2L, "s2", "w1 w2 w3 w4 w5 w6"),
      (3L, "s3", "z1 z2 z3 z4 z5 z6")).toDF("doc_id", "source", "text")
    val out = Sketches.kmvOverlap(docs, "source", "text",
        shingleSize = 3, k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out(("s1", "s2")).getLong(5) == 1000000L) // identical: jaccard 1
    assert(out(("s1", "s3")).getLong(5) == 0L)       // disjoint: jaccard 0
  }
}
