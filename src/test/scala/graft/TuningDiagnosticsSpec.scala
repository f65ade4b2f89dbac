package graft

import org.apache.spark.sql.functions._

import graft.ops.{ApproxDedup, Corpus, SimilaritySearch}

/** Unit coverage for the round-7 corpus-diagnostics operators: the LSH
  * tuning report, the Zipf rank-curve fit, and embedding-space drift. */
class TuningDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("minhashTuning: one row per factorization, duplicate docs drive candidate work") {
    // 5 identical docs + 5 distinct ones: every configuration must charge
    // at least the C(5,2) duplicate pairs in EVERY band (signatures equal)
    val docs = ((0 until 5).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta")) ++
      (5 until 10).map(i => (i.toLong, s"unique$i words nothing shared here at all $i")))
      .toDF("doc_id", "text")
    val out = ApproxDedup.minhashTuning(docs, "doc_id", "text",
      threshold = 0.5, shingleSize = 3, k = 24).collect()
    val divisors = (1 to 24).filter(24 % _ == 0)
    assert(out.length == divisors.length)
    out.foreach { r =>
      val (b, rows, checks) = (r.getInt(0), r.getInt(1), r.getLong(2))
      assert(b * rows == 24)
      assert(checks >= b.toLong * 10, s"b=$b: $checks < ${b * 10} duplicate checks")
    }
    // theoretical match probability at t=0.5: exact closed form
    val r1 = out.find(_.getInt(0) == 24).get
    val expect = math.round((1.0 - math.pow(1.0 - 0.5, 24.0)) * 1e6)
    assert(r1.getLong(3) == expect)
  }

  test("zipfFit recovers slope ~ -1 on an exact 1/rank frequency curve") {
    // freq(rank) = round(1200 / rank) for 30 types: ln-ln slope ≈ −1
    val words = (1 to 30).flatMap { r =>
      Seq.fill(math.round(1200.0 / r).toInt)(f"w$r%02d")
    }
    val docs = words.grouped(50).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq.toDF("doc_id", "text")
    val row = Corpus.zipfFit(docs, "text", topV = 30).head()
    assert(row.getLong(0) == 30)
    val slope = row.getLong(1)
    assert(slope > -1050000L && slope < -950000L, s"slope_micro = $slope")
    assert(row.getLong(3) > 990000L, s"r2_micro = ${row.getLong(3)}")
  }

  test("vocabPostings halves fold to exactly the full-corpus vocabulary") {
    val docs = (0 until 40).map(i =>
      (i.toLong, s"alpha beta w$i gamma ${if (i % 2 == 0) "even" else "odd"}"))
      .toDF("doc_id", "text")
    val whole = Corpus.vocab(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val folded = Corpus.vocabFold(
        Corpus.vocabPostings(docs.where($"doc_id" % 2 === 0), "text", 8)
          .unionByName(Corpus.vocabPostings(docs.where($"doc_id" % 2 === 1), "text", 8)))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(folded == whole)
    // every count of a token lands in ONE bucket — probe reads one dir
    val b = Corpus.vocabPostings(docs, "text", 8)
      .groupBy($"token").agg(countDistinct($"bucket").as("nb"))
      .agg(max($"nb")).head().getLong(0)
    assert(b == 1L)
  }

  test("perceptual aHash near-dups: identical payloads pair at hamming 0, unrelated ones drop") {
    import graft.multimodal.Media
    // genuinely different bodies (seeded random content, not one-digit
    // variants): with REAL decoded luma grids, perceptually-similar
    // content legitimately lands at small hamming — aHash is a locality
    // hash, not a cryptographic one — so the test isolates exact-dup vs
    // statistically-unrelated
    val chars = ('a' to 'z') ++ ('0' to '9') ++ Seq(' ')
    val docs = ((0 until 30).map { i =>
        val rng = new scala.util.Random(i * 2654435761L + 12345L)
        (i.toLong, Seq.fill(180 + i)(chars(rng.nextInt(chars.length))).mkString)
      } ++
      Seq((100L, "duplicated payload body"), (101L, "duplicated payload body"),
          (102L, "duplicated payload body")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val media = Media.fromDocuments(spark, docs)
    val pairs = Media.perceptualNearDups(media, maxHamming = 3)
      .orderBy("id1", "id2").collect()
    // the three exact-duplicate pairs MUST be present at hamming 0
    val dupPairs = pairs.filter(r => r.getLong(0) >= 100L)
    assert(dupPairs.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((100L, 101L), (100L, 102L), (101L, 102L)))
    assert(dupPairs.forall(_.getInt(2) == 0))
    // unrelated bodies stay far: no pair among the 30 distinct docs at 0
    assert(!pairs.exists(r => r.getLong(1) < 100L && r.getInt(2) == 0))
    intercept[IllegalArgumentException] {
      Media.perceptualNearDups(media, maxHamming = 9)
    }
  }

  test("semanticNewSurvivors: history dups drop, intra-batch clusters keep one") {
    import graft.ops.{ApproxDedup, SimilaritySearch}
    // axis-aligned vectors: cos(e_i, e_j) = 0 for i != j, 1 for twins
    def v(axis: Int, dim: Int = 4) =
      (0 until dim).map(j => if (j == axis) 1.0f else 0.0f)
    val cents = Seq(Seq(1.0, 0, 0, 0), Seq(0, 1.0, 0, 0), Seq(0, 0, 1.0, 0))
    def cells(df: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.withIvfCell(df, "embedding", cents)
        .select(col("vec_id"), col("embedding"), col("cell").cast("long").as("cell"))
    val hist  = cells(Seq((1L, v(0))).toDF("vec_id", "embedding"))
    val batch = cells(Seq(
      (10L, v(0)),  // duplicate of history survivor -> dropped
      (11L, v(1)),  // new direction, twin of 12 -> min id survives
      (12L, v(1)),
      (13L, v(2))   // new singleton -> survives
    ).toDF("vec_id", "embedding"))
    val out = ApproxDedup.semanticNewSurvivors(batch, hist,
        "vec_id", "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(11L, 13L))
  }

  test("semanticDrift: identical snapshots are exactly zero; a shifted one is not") {
    val dim = 8
    def vec(seed: Int) = (0 until dim).map(j => math.sin(seed * 31 + j * 7).toFloat)
    val base = (0L until 64L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    val cents = SimilaritySearch.sampleCentroids(base, "vec_id", "embedding", 8)
    val same = SimilaritySearch.semanticDrift(base, base, "embedding", cents).collect()
    assert(same.length == 8)
    assert(same.forall(_.getLong(3) == 0L), "identical snapshots must have zero PSI terms")
    // shift: all mass into the vectors nearest one centroid
    val shifted = (0L until 64L).map(i => (i, vec(3))).toDF("vec_id", "embedding")
    val drift = SimilaritySearch.semanticDrift(base, shifted, "embedding", cents).collect()
    assert(drift.map(_.getLong(3)).sum > 200000L, "concentrated snapshot must flag drift")
  }
}
