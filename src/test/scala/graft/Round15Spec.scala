package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classify, Evaluation, Graph, Maintenance, SimilaritySearch}

/** Round-15 operators: triangle/LCC graph QA, binned Kendall τ-b,
  * isotonic (PAV) calibration, exact two-sample KS drift, per-group
  * centroid similarity, simplified silhouette, confident-learning
  * label-noise audit. */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  test("triangleStats counts a known graph and is orientation-invariant") {
    // K4 on {1,2,3,4} plus pendant 5–1: K4 has 4 triangles, every K4
    // node sits in 3 of them; node 1 has degree 4
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L)).toDF("id1", "id2")
    val out = Graph.triangleStats(edges)
      .orderBy("node").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 4L, 3L), (2L, 3L, 3L), (3L, 3L, 3L), (4L, 3L, 3L),
        (5L, 1L, 0L)))
    // node 2: deg 3, 3 triangles → lcc = 2·3/(3·2) = 1.0
    assert(out.find(_._1 == 2L).get._4 == 1000000L)
    // node 1: deg 4, 3 triangles → 2·3/(4·3) = 0.5
    assert(out.find(_._1 == 1L).get._4 == 500000L)
    // flipped/duplicated pair directions change nothing
    val flipped = edges.select(col("id2").as("id1"), col("id1").as("id2"))
      .union(edges)
    val out2 = Graph.triangleStats(flipped)
      .orderBy("node").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out2 == out)
  }

  test("incremental deltas over random batch splits fold to the full rebuild") {
    val rng = new scala.util.Random(3)
    // random graph on 12 nodes, ~40 distinct edges
    val edges = Seq.fill(60) {
      val a = rng.nextInt(12).toLong; var b = rng.nextInt(12).toLong
      while (b == a) b = rng.nextInt(12).toLong
      (math.min(a, b), math.max(a, b))
    }.distinct
    val full = edges.toDF("id1", "id2")
    val want = Graph.triangleStats(full)
      .orderBy("node").as[(Long, Long, Long, Long)].collect().toSeq
    for (nBatches <- Seq(2, 3)) {
      var stored = spark.range(0).select(col("id").as("a"), col("id").as("b"))
      var stats = Seq.empty[org.apache.spark.sql.DataFrame]
      val shuffled = rng.shuffle(edges)
      val batches = shuffled.grouped(
        math.ceil(shuffled.size.toDouble / nBatches).toInt).toSeq
      batches.foreach { b =>
        val (newE, st) = Graph.triangleBatchDelta(stored,
          b.toDF("id1", "id2"))
        stored = stored.union(newE.select(col("a"), col("b")))
          .localCheckpoint(true)
        stats = stats :+ st.localCheckpoint(true)
      }
      val folded = Graph.triangleFoldStats(stats.reduce(_ unionByName _))
        .orderBy("node").as[(Long, Long, Long, Long)].collect().toSeq
      assert(folded == want, s"nBatches=$nBatches")
    }
  }

  test("triangleStats: triangle-free graph yields all zeros") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id1", "id2")
    val out = Graph.triangleStats(path)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.forall(r => r._3 == 0L && r._4 == 0L))
  }
}

class KendallTauSpec extends SparkSpec {
  import spark.implicits._

  test("perfect agreement gives τ-b ≈ 1, reversal gives ≈ −1") {
    val up = (1L to 40L).map(i => (i % 5, i % 5)).toDF("xb", "yb")
    val t1 = Evaluation.kendallTauBinned(up, "xb", "yb")
      .select("tau_b_micro").as[Long].head()
    assert(t1 >= 999999L && t1 <= 1000000L)
    val down = (1L to 40L).map(i => (i % 5, 4 - i % 5)).toDF("xb", "yb")
    val t2 = Evaluation.kendallTauBinned(down, "xb", "yb")
      .select("tau_b_micro").as[Long].head()
    assert(t2 <= -999999L)
  }

  test("matches the brute-force pair count on a small sample") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(60)((rng.nextInt(4).toLong, rng.nextInt(3).toLong))
    val out = Evaluation.kendallTauBinned(rows.toDF("xb", "yb"), "xb", "yb")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
    for (i <- rows.indices; j <- rows.indices if i < j) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      if (x1 == x2) tx += 1
      if (y1 == y2) ty += 1
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) c += 1 else d += 1
      }
    }
    val n = rows.size.toLong
    assert(out._1 == n && out._2 == c && out._3 == d &&
      out._4 == tx && out._5 == ty)
    val n0 = n * (n - 1) / 2
    val expect = math.floor((c - d).toDouble /
      math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble) * 1e6).toLong
    assert(out._6 == expect)
  }
}

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  test("fit is monotone nondecreasing and matches sequential PAV") {
    val rng = new scala.util.Random(11)
    // scores deliberately anti-calibrated in the middle bins
    val rows = Seq.tabulate(400) { i =>
      val s = rng.nextInt(1000000).toLong
      val p = if (s < 300000) 0.7 else if (s < 600000) 0.2 else 0.8
      (if (rng.nextDouble() < p) 1 else 0, s)
    }
    val out = Evaluation.isotonicCalibration(rows.toDF("lbl", "score_micro"),
        "lbl", "score_micro", nBins = 8)
      .orderBy("bin").as[(Int, Long, Long, Long, Long)].collect().toSeq
    val iso = out.map(_._5)
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b })
    // sequential pool-adjacent-violators over the same bins, exact
    // rational pooling (cross-multiplied comparisons)
    case class Pool(pos: Long, cnt: Long, bins: Int)
    val pools = collection.mutable.ArrayBuffer[Pool]()
    for ((_, cnt, pos, _, _) <- out) {
      pools += Pool(pos, cnt, 1)
      while (pools.size > 1 &&
        pools(pools.size - 2).pos * pools.last.cnt >=
          pools.last.pos * pools(pools.size - 2).cnt) {
        val b = pools.remove(pools.size - 1)
        val a = pools.remove(pools.size - 1)
        pools += Pool(a.pos + b.pos, a.cnt + b.cnt, a.bins + b.bins)
      }
    }
    val seqRates = pools.toSeq.flatMap(p =>
      Seq.fill(p.bins)(p.pos * 1000000L / p.cnt))
    // minimax-with-floored-interval-rates can differ from the exact
    // rational PAV by quantization only — allow 1 micro per bin
    out.map(_._5).zip(seqRates).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 1L, s"got $got want $want")
    }
  }
}

class KsDriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical snapshots → 0; disjoint supports → 1e6") {
    val a = (1L to 100L).toDF("v")
    val same = Maintenance.ksDrift(a, a, col("v"))
      .select("ks_micro").as[Long].head()
    assert(same == 0L)
    val b = (101L to 200L).toDF("v")
    val far = Maintenance.ksDrift(a, b, col("v"))
      .as[(Long, Long, Long, Long)].head()
    assert(far == ((100L, 100L, 100L, 1000000L)))
  }

  test("matches the classic statistic on a small two-sample case") {
    val a = Seq(1L, 2L, 2L, 3L, 9L).toDF("v")
    val b = Seq(2L, 4L, 4L, 9L).toDF("v")
    // F_a: 1→1/5, 2→3/5, 3→4/5, 4→4/5, 9→1
    // F_b: 1→0, 2→1/4, 3→1/4, 4→3/4, 9→1
    // diffs (micro, floored): 200000, 350000, 550000, 50000, 0 → max at v=3
    val out = Maintenance.ksDrift(a, b, col("v"))
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((5L, 4L, 3L, 550000L)))
  }
}

class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  test("chi-square: independent margins give near-zero terms, a planted association does not") {
    // perfectly dependent 2×2: x == y
    val dep = (1 to 80).map(i => (i % 2, i % 2)).toDF("xb", "yb")
    val depSum = Evaluation.chiSquare(dep, "xb", "yb")
      .agg(sum("term_micro")).as[Long].head()
    assert(depSum == 80_000_000L) // χ² = n for a perfect 2×2 association
    // independent: x alternates within each y block
    val ind = (0 until 80).map(i => (i % 2, (i / 2) % 2)).toDF("xb", "yb")
    val indSum = Evaluation.chiSquare(ind, "xb", "yb")
      .agg(sum("term_micro")).as[Long].head()
    assert(indSum == 0L)
  }

  test("mann-kendall: strictly increasing series maxes S; constant series is all ties") {
    val up = (1L to 10L).map(i => (i, i * 100)).toDF("t", "v")
    val o1 = Evaluation.mannKendall(up, "t", "v")
      .as[(Long, Long, Long, Long)].head()
    assert(o1._2 == 45L && o1._4 > 0) // S = n(n−1)/2, positive z
    val flat = (1L to 10L).map(i => (i, 7L)).toDF("t", "v")
    val o2 = Evaluation.mannKendall(flat, "t", "v")
      .as[(Long, Long, Long, Long)].head()
    assert(o2._2 == 0L && o2._3 == 0L && o2._4 == 0L)
  }

  test("sen slope recovers a clean linear trend exactly") {
    val up = (0L until 12L).map(i => (i, 50L + 7L * i)).toDF("t", "v")
    val o = Evaluation.senSlope(up, "t", "v")
      .as[(Long, Long, Long)].head()
    assert(o == ((12L, 66L, 7000000L)))
  }

  test("association rules: a planted implication gets confidence 1 and lift > 1") {
    // every basket with A also has B; B appears alone too
    val facts = (0L until 30L).flatMap { b =>
      if (b < 10) Seq((b, "A"), (b, "B"))
      else if (b < 20) Seq((b, "B"))
      else Seq((b, "C"))
    }.toDF("b", "i")
    val out = graft.ops.Relational.associationRules(facts, "b", "i")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab._3 == 10L && ab._4 == 1000000L) // support 10, confidence 1.0
    assert(ab._5 == 1500000L) // lift = 30·10/(10·20) = 1.5
  }

  test("good-turing: the oracle identity r* N_r = (r+1) N_{r+1} holds") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d e"), (3L, "f g a"))
      .toDF("doc_id", "text")
    val out = Evaluation.goodTuring(docs, "text")
      .orderBy("r")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    // vocab freqs: a=5, b=3, c=1, d=1, e=1, f=1, g=1 → N1=5, N3=1, N5=1
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 5L), (3L, 1L), (5L, 1L)))
    // r=1 has no N2 → NULL r*; p0 = N1/N = 5/13
    assert(out.head._4.isEmpty && out.head._5.contains(5000000L / 13L))
  }
}

class EwmaChartSpec extends SparkSpec {
  import spark.implicits._

  test("tracks the recursive EWMA and flags the sustained shift") {
    val vs = Seq.fill(10)(100L) ++ Seq.fill(6)(300L) // persistent 3× shift
    val series = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("t", "v")
    val out = Maintenance.ewmaChart(series, "t", "v", alpha = 0.3, l = 3)
      .orderBy("t").as[(Long, Long, Long, Long, Long, Boolean)]
      .collect().toSeq
    // reference recursion in doubles (z0 = first obs)
    var z = vs.head.toDouble
    vs.zip(out).foreach { case (v, row) =>
      z = 0.3 * v + 0.7 * z
      assert(math.abs(row._3 - math.round(z * 1e6)) <= vs.size + 1,
        s"t=${row._1}: ${row._3} vs ${math.round(z * 1e6)}")
    }
    // the shift must eventually trip the EWMA limit
    assert(out.takeRight(3).exists(_._6), s"no flag fired: $out")
    // and the stable prefix must not
    assert(out.take(10).forall(!_._6))
  }
}

class KaplanMeierSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed curve: censoring holds subjects at risk, not churned") {
    def t(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // max day = 10, tail 3 → censored iff last day > 7
    val ev = Seq(
      ("s1", t(1)), ("s1", t(2)),             // dur 1, churned
      ("s2", t(8)), ("s2", t(9)),             // dur 1, censored
      ("s3", t(1)), ("s3", t(3)),             // dur 2, churned
      ("s4", t(7)), ("s4", t(10))             // dur 3, censored
    ).toDF("subj", "ts")
    val out = graft.ops.Relational.kaplanMeier(ev, "subj", "ts",
        censorTailDays = 3)
      .orderBy("duration_days")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((1L, 4L, 1L, 1L), (2L, 2L, 1L, 0L), (3L, 1L, 0L, 1L)))
    // S(1) = 3/4, S(2) = 3/8, S(3) unchanged (no churn at 3)
    val surv = out.map(_._5)
    assert(math.abs(surv(0) - 750000L) <= 2L)
    assert(math.abs(surv(1) - 375000L) <= 2L)
    assert(surv(2) == surv(1))
  }
}

class CentroidSimSpec extends SparkSpec {
  import spark.implicits._

  test("identical groups → 1e6 (within a floor micro); orthogonal → 0") {
    val rows = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)),
      (1, Array(1.0f, 0.0f)),
      (2, Array(0.0f, 2.0f))
    ).toDF("label", "embedding")
    val out = SimilaritySearch.groupCentroidSimilarity(rows, "label",
        "embedding")
      .orderBy("g1", "g2").as[(Int, Int, Long)].collect().toSeq
    assert(out.size == 3)
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m((0, 1)) >= 999999L)
    assert(m((0, 2)) == 0L && m((1, 2)) == 0L)
  }
}

class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  test("tight well-separated cells score high; boundary points ≈ 0") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.99f, 0.01f)), (3L, Array(0.02f, 0.98f)),
      (4L, Array(0.7f, 0.7f)) // equidistant from both centroids
    ).toDF("vec_id", "embedding")
    val cents = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val out = SimilaritySearch.silhouetteReport(emb, "embedding", cents)
      .orderBy("cell").as[(Int, Long, Long)].collect().toSeq
    assert(out.map(_._2).sum == 5L)
    // the diagonal point lands in cell 0 (tie → lowest) with s = 0,
    // dragging cell 0's mean below cell 1's near-1 score
    val c0 = out.find(_._1 == 0).get._3
    val c1 = out.find(_._1 == 1).get._3
    assert(c1 > 900000L)
    assert(c0 < c1)
  }
}

class EloSpec extends SparkSpec {
  import spark.implicits._

  test("two-player trajectory matches the hand-computed updates; zero-sum") {
    val matches = Seq((0, "a", "b"), (1, "b", "a"))
      .toDF("ep", "w", "l")
    val out = graft.ops.Rlhf.eloBatchedMicro(matches, "ep", "w", "l",
        numEpochs = 2)
      .orderBy("item").as[(String, Long, Long, Long)].collect().toSeq
    // epoch 0: equal ratings → E = 1/2 → d = K/2 = 16e6
    val ra1 = 1500000000L + 16000000L
    val rb1 = 1500000000L - 16000000L
    // epoch 1: b (lower-rated) beats a
    val d2 = math.round(32e6 * (1.0 - 1.0 /
      (1.0 + math.pow(10.0, (ra1 - rb1).toDouble / 400e6))))
    val expect = Seq(("a", 1L, 1L, ra1 - d2), ("b", 1L, 1L, rb1 + d2))
    assert(out == expect)
    assert(out.map(_._4).sum == 2L * 1500000000L) // zero-sum invariant
  }

  test("stored count fold over random splits == match-level replay") {
    val rng = new scala.util.Random(13)
    val players = Seq("a", "b", "c", "d")
    val battles = Seq.tabulate(120) { i =>
      val w = players(rng.nextInt(4))
      var l = players(rng.nextInt(4))
      while (l == w) l = players(rng.nextInt(4))
      (i.toLong, rng.nextInt(4), w, l)
    }
    val df = battles.toDF("bid", "ep", "w", "l")
    val direct = graft.ops.Rlhf.eloBatchedMicro(df, "ep", "w", "l",
        numEpochs = 4)
      .orderBy("item").as[(String, Long, Long, Long)].collect().toSeq
    // three blind-append batches by random bid split, folded
    val batches = (0 until 3).map(k =>
      graft.ops.Rlhf.eloBattleCounts(df.where(pmod(col("bid"), lit(3)) === k),
        "ep", "w", "l"))
    val folded = graft.ops.Rlhf.eloFromCounts(
        graft.ops.Rlhf.eloFoldCounts(batches.reduce(_ unionByName _)),
        numEpochs = 4)
      .orderBy("item").as[(String, Long, Long, Long)].collect().toSeq
    assert(folded == direct)
  }

  test("an undefeated player ends strictly above an all-losing one") {
    val matches = (0 until 10).map(i => (i % 3, "champ", "chump"))
      .toDF("ep", "w", "l")
    val out = graft.ops.Rlhf.eloBatchedMicro(matches, "ep", "w", "l",
        numEpochs = 3)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out("champ") > 1500000000L && out("chump") < 1500000000L)
    // diminishing gains: the favourite earns less per win as the gap grows
    assert(out("champ") < 1500000000L + 10L * 16000000L)
  }
}

class RougeLSpec extends SparkSpec {
  import spark.implicits._

  test("lcs kernel matches brute force on random token pairs") {
    val rng = new scala.util.Random(5)
    def lcsBrute(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.ofDim[Int](a.size + 1, b.size + 1)
      for (i <- 1 to a.size; j <- 1 to b.size)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
                   else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.size)(b.size).toLong
    }
    val vocab = Seq("a", "b", "c", "d")
    val cases = Seq.tabulate(30) { i =>
      (i.toLong,
        Seq.fill(rng.nextInt(12) + 1)(vocab(rng.nextInt(4))),
        Seq.fill(rng.nextInt(12) + 1)(vocab(rng.nextInt(4))))
    }
    val df = cases.toDF("id", "ta", "tb")
    val got = df.select(col("id"),
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.expressions.LcsLength(
            org.apache.spark.sql.GraftColumnBridge.expression(col("ta")),
            org.apache.spark.sql.GraftColumnBridge.expression(col("tb"))))
          .as("lcs"))
      .as[(Long, Long)].collect().toMap
    cases.foreach { case (id, a, b) =>
      assert(got(id) == lcsBrute(a, b), s"id=$id a=$a b=$b")
    }
  }

  test("rougeL: identical texts score F1 = 1e6, disjoint score 0") {
    val cands = Seq((1L, "the quick brown fox"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val refs = Seq((1L, "the quick brown fox"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val out = graft.ops.Evaluation.rougeL(cands, refs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "lcs", "f1_micro").as[(Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq((1L, 4L, 1000000L), (2L, 0L, 0L)))
  }

  test("instruction dedup drops the higher-id near-copy, keeps originals") {
    import graft.ops.ApproxDedup
    val base = "please summarize the following article in three sentences " +
      "focusing on the key findings and overall conclusions of the study"
    val docs = Seq(
      (10L, base),
      (20L, base + " thanks"), // near-copy of 10 → must drop
      (30L, "translate the sentence into french preserving formal tone " +
        "and idiomatic phrasing wherever that is possible today")
    ).toDF("doc_id", "text")
    val pairs = ApproxDedup.minhashNearDupsFast(docs, "doc_id", "text",
      threshold = 0.35, shingleSize = 3, k = 24, bands = 6,
      estSlack = 0.25, maxBucket = 0, md5Base = true)
    val out = ApproxDedup.instructionDedupRougeL(docs, "doc_id", "text",
        pairs, thresholdMicro = 700000L, maxTokens = 32)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out.map(r => (r._1, r._3)) ==
      Seq((10L, true), (20L, false), (30L, true)))
    assert(out(1)._2 >= 700000L)
  }
}

class RidgeProbeSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Classify

  private def toyDocs = (0L until 40L).map { i =>
    val long = i % 2 == 0
    val base = if (long) "alpha beta gamma delta epsilon zeta eta theta"
               else "alpha beta"
    (i, if (long) 1 else -1, base)
  }.toDF("doc_id", "y", "text")

  test("closed-form fit satisfies the normal equations (residual pinned)") {
    val feats = Classify.hashedDocFeatures(toyDocs, "doc_id", "y", "text",
      buckets = 16).localCheckpoint(true)
    val w = Classify.ridgeProbeFit(feats, lambda = 1.0)
    val wm = w.toMap
    // rebuild G and b locally and check (G + I)·(w/1e6) ≈ b per feature
    val rows = feats.as[(Long, Int, Long, Long)].collect() // doc, y, f, x
    val byDoc = rows.groupBy(_._1)
    val fs = w.map(_._1)
    val g = collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    val b = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    byDoc.values.foreach { rs =>
      for ((_, y, f1, x1) <- rs) {
        b(f1) += x1 * y
        for ((_, _, f2, x2) <- rs) g((f1, f2)) += x1 * x2
      }
    }
    fs.foreach { f1 =>
      val lhs = fs.map(f2 => g((f1, f2)) * (wm(f2).toDouble / 1e6)).sum +
        1.0 * (wm(f1).toDouble / 1e6)
      assert(math.abs(lhs - b(f1)) < 0.01 * math.max(1.0, math.abs(b(f1))),
        s"normal-equation residual at f=$f1: $lhs vs ${b(f1)}")
    }
  }

  test("the shipped model separates the toy task exactly; fit is deterministic") {
    val feats = Classify.hashedDocFeatures(toyDocs, "doc_id", "y", "text",
      buckets = 16).localCheckpoint(true)
    val w1 = Classify.ridgeProbeFit(feats, lambda = 1.0)
    val w2 = Classify.ridgeProbeFit(feats, lambda = 1.0)
    assert(w1 == w2)
    val out = Classify.ridgeProbeEval(feats, w1)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((20L, 0L, 0L, 20L, 1000000L)), s"confusion $out")
  }
}

class ConfidentLearningSpec extends SparkSpec {
  import spark.implicits._

  test("cleanly separable labels produce a diagonal confident joint") {
    val docs = (0L until 30L).map { i =>
      val lbl = if (i % 2 == 0) "a" else "b"
      val txt = if (lbl == "a") "apple apple orchard fruit"
                else "binary binary compiler code"
      (i, lbl, txt)
    }.toDF("doc_id", "source", "text")
    val (cls, toks) = Classify.nbCounts(docs, "source", "text", 4)
    val v = toks.select(col("token")).distinct().count()
    val scores = Classify.nbScores(docs, "doc_id", "source", "text",
      cls, toks, v)
    val cj = Classify.confidentLearning(scores, "doc_id")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(cj.forall(r => r._1 == r._2), s"off-diagonal noise in $cj")
    assert(cj.map(_._3).sum == 30L)
    assert(cj.map(_._4).sum >= 999999L) // fracs sum to ~1e6
  }

  test("a mislabeled block shows up off-diagonal") {
    val docs = (0L until 40L).map { i =>
      val truthA = i % 2 == 0
      val txt = if (truthA) "apple apple orchard fruit grove"
                else "binary binary compiler code linker"
      // 4 docs whose TEXT is a-like carry label b — label noise
      val lbl = if (truthA && i < 8) "b" else if (truthA) "a" else "b"
      (i, lbl, txt)
    }.toDF("doc_id", "source", "text")
    val (cls, toks) = Classify.nbCounts(docs, "source", "text", 4)
    val v = toks.select(col("token")).distinct().count()
    val scores = Classify.nbScores(docs, "doc_id", "source", "text",
      cls, toks, v)
    val cj = Classify.confidentLearning(scores, "doc_id")
      .as[(String, String, Long, Long)].collect().toSeq
    val offDiag = cj.filter(r => r._1 != r._2).map(_._3).sum
    assert(offDiag >= 4L, s"expected the planted noise flagged, got $cj")
  }
}
