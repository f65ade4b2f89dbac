package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Sketches

/** Sketch family: HLL / KMV distinct estimation, count-min frequency
  * bounds, exact heavy hitters — accuracy envelopes, the no-underestimate
  * property, and fold ≡ rebuild for every stored form. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticVals(n: Int): DataFrame =
    spark.range(n).select(concat(lit("val_"), col("id")).as("v"))

  test("HLL estimate lands within the p=8 error envelope on 5000 distincts") {
    val est = Sketches.hllDistinct(syntheticVals(5000), p = 8)
      .select(col("est_micro")).as[Long].head()
    // σ ≈ 1.04/√256 ≈ 6.5%; 4σ envelope
    assert(math.abs(est / 1e6 - 5000.0) < 5000.0 * 0.26, s"est=$est")
  }

  test("HLL register fold over batch halves equals the full-corpus registers") {
    val full  = syntheticVals(4000)
    val h0    = full.where(expr("CAST(substring(v, 5, 10) AS BIGINT) % 2 = 0"))
    val h1    = full.where(expr("CAST(substring(v, 5, 10) AS BIGINT) % 2 = 1"))
    val whole = Sketches.hllRegisters(full, p = 8)
      .as[(Int, Int)].collect().toSet
    val folded = Sketches.hllFold(
        Sketches.hllRegisters(h0, p = 8).union(Sketches.hllRegisters(h1, p = 8)))
      .as[(Int, Int)].collect().toSet
    assert(folded == whole)
  }

  test("hllShingleRegisters (native kernel) ≡ hllRegisters ∘ shingleValues, bit-for-bit") {
    // varied shapes: normal docs, repeated shingles, <n tokens, empty,
    // extra whitespace — every edge the composed relational form defines
    val docs = (
      (1 to 150).map(i => s"tok${i % 17} tok${i % 31} tok${i % 7} tok$i common end") ++
      Seq("", "one two", "  padded   spacing   a b c  ", "x x x x x x")
    ).toDF("text")
    for (p <- Seq(4, 8, 12)) {
      val composed = Sketches.hllRegisters(
          Sketches.shingleValues(docs, "text", 3), p)
        .as[(Int, Int)].collect().toSet
      val native = Sketches.hllShingleRegisters(docs, "text", 3, p)
        .as[(Int, Int)].collect().toSet
      assert(native == composed, s"parity broke at p=$p")
    }
    // n=1 degenerate: shingles ARE the tokens (incl. the empty-string token)
    val c1 = Sketches.hllRegisters(Sketches.shingleValues(docs, "text", 1), 8)
      .as[(Int, Int)].collect().toSet
    val n1 = Sketches.hllShingleRegisters(docs, "text", 1, 8)
      .as[(Int, Int)].collect().toSet
    assert(n1 == c1)
  }

  test("HLL small-range correction: tiny distinct set takes the linear-counting branch") {
    val r = Sketches.hllDistinct(syntheticVals(31), p = 8)
      .select(col("v_zero"), col("lin_est_micro"), col("est_micro"))
      .as[(Long, Long, Long)].head()
    val (vZero, lin, est) = r
    assert(vZero > 0 && est == lin, s"expected linear-counting branch, got $r")
    assert(math.abs(est / 1e6 - 31.0) < 6.0, s"linear estimate off: $est")
  }

  test("KMV full-sketch estimate lands within its envelope; short input is exact") {
    val est = Sketches.kmvEstimate(
        Sketches.kmvSketch(syntheticVals(5000), k = 256), k = 256)
      .select(col("est_micro")).as[Long].head()
    assert(math.abs(est / 1e6 - 5000.0) < 5000.0 * 0.26, s"est=$est")
    val exact = Sketches.kmvEstimate(
        Sketches.kmvSketch(syntheticVals(17), k = 256), k = 256)
      .select(col("n_hashes"), col("est_micro")).as[(Long, Long)].head()
    assert(exact == ((17L, 17000000L)))
  }

  test("KMV fold over batch bottom-k rows equals the full-corpus sketch") {
    val full = syntheticVals(3000)
    val h0   = full.where(expr("CAST(substring(v, 5, 10) AS BIGINT) % 2 = 0"))
    val h1   = full.where(expr("CAST(substring(v, 5, 10) AS BIGINT) % 2 = 1"))
    val whole = Sketches.kmvSketch(full, k = 64).as[Long].collect().toSet
    val folded = Sketches.kmvFold(
        Sketches.kmvSketch(h0, k = 64).union(Sketches.kmvSketch(h1, k = 64)),
        k = 64).as[Long].collect().toSet
    assert(folded == whole)
  }

  test("count-min never underestimates, and the absent term's estimate is its collision mass") {
    val vals = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(3)("gamma") ++ (1 to 200).map(i => s"noise_$i")
    val df = vals.toDF("v")
    val rep = Sketches.cmsPointReport(
        Sketches.cmsCounters(df, d = 4, w = 64), df,
        Seq("alpha", "beta", "gamma", "never_seen"), d = 4, w = 64)
      .select(col("term"), col("est"), col("exact"), col("overestimate"))
      .as[(String, Long, Long, Long)].collect()
    assert(rep.length == 4)
    rep.foreach { case (t, est, exact, over) =>
      assert(over >= 0L && est == exact + over, s"underestimate at $t")
    }
    val byTerm = rep.map(r => r._1 -> r).toMap
    assert(byTerm("alpha")._3 == 40L && byTerm("beta")._3 == 25L)
    assert(byTerm("never_seen")._3 == 0L)
  }

  test("count-min counter fold over batch halves equals the full-corpus counters") {
    val full = syntheticVals(2000).union(syntheticVals(500)) // duplicates matter
    val h0   = full.where(expr("CAST(substring(v, 5, 10) AS BIGINT) % 2 = 0"))
    val h1   = full.where(expr("CAST(substring(v, 5, 10) AS BIGINT) % 2 = 1"))
    val whole = Sketches.cmsCounters(full, d = 3, w = 32)
      .as[(Int, Long, Long)].collect().toSet
    val folded = Sketches.cmsFold(
        Sketches.cmsCounters(h0, d = 3, w = 32)
          .union(Sketches.cmsCounters(h1, d = 3, w = 32)))
      .as[(Int, Long, Long)].collect().toSet
    assert(folded == whole)
  }

  test("heavy hitters: the frequency == total/k boundary is inclusive") {
    // four values, one occurrence each: freq·4 == total for every value
    val df = Seq("a", "b", "c", "d").toDF("v")
    val hh = Sketches.heavyHitters(df, k = 4)
      .select(col("v")).as[String].collect().toSet
    assert(hh == Set("a", "b", "c", "d"))
    val none = Sketches.heavyHitters(df, k = 3).count()
    assert(none == 0L)
  }

  test("heavy hitters report exact ppm shares") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("warm")).toDF("v")
    val r = Sketches.heavyHitters(df, k = 2)
      .select(col("v"), col("freq"), col("total_values"), col("freq_ppm"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(r == Seq(("hot", 6L, 8L, 750000L)))
  }

  // ── randomized fold laws (r8 verdict carry): 1000 random batch splits,
  // each an independent case, all evaluated in a HANDFUL of Spark jobs by
  // threading case_id through the kernels' extraKeys grouping — the fixed
  // half/half splits above cannot catch a fold bug that only bites on
  // overlapping batches, empty batches, or skewed assignment.

  test("HLL max-fold over 1000 random (overlapping) splits == full rebuild, and re-fold is idempotent") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val rows = (0 until 1000).flatMap { c =>
      val nVals = 5 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(5)
      (0 until nVals).flatMap { _ =>
        val v = s"val_${rnd.nextInt(500)}"
        // a value may land in SEVERAL batches (overlap) — legal for the
        // max-fold because rank is a pure function of the value
        val bs = (0 until k).filter(_ => rnd.nextBoolean())
        (if (bs.isEmpty) Seq(rnd.nextInt(k)) else bs).map(b => (c, b, v))
      }
    }
    val df = rows.toDF("case_id", "batch", "v")
    val perBatch = Sketches.hllRegisters(df, p = 8,
      extraKeys = Seq("case_id", "batch")).drop("batch")
    val folded = Sketches.hllFold(perBatch, extraKeys = Seq("case_id"))
    val whole = Sketches.hllRegisters(
      df.select("case_id", "v").distinct(), p = 8, extraKeys = Seq("case_id"))
    val fSet = folded.as[(Int, Int, Int)].collect().toSet
    assert(fSet == whole.as[(Int, Int, Int)].collect().toSet)
    // idempotency: folding the folded table together with itself (in any
    // duplication) changes nothing
    val refolded = Sketches.hllFold(folded.union(folded),
      extraKeys = Seq("case_id"))
    assert(refolded.as[(Int, Int, Int)].collect().toSet == fSet)
  }

  test("CMS add-fold over 1000 random disjoint splits == full rebuild") {
    val rnd = new scala.util.Random(0xBEEF)
    val rows = (0 until 1000).flatMap { c =>
      val nVals = 5 + rnd.nextInt(60)
      val k = 1 + rnd.nextInt(5)
      // duplicates matter for an additive fold: draw from a SMALL domain
      (0 until nVals).map(_ => (c, rnd.nextInt(k), s"val_${rnd.nextInt(20)}"))
    }
    val df = rows.toDF("case_id", "batch", "v")
    val perBatch = Sketches.cmsCounters(df, d = 3, w = 16,
      extraKeys = Seq("case_id", "batch")).drop("batch")
    val folded = Sketches.cmsFold(perBatch, extraKeys = Seq("case_id"))
    val whole = Sketches.cmsCounters(df, d = 3, w = 16,
      extraKeys = Seq("case_id"))
    assert(folded.as[(Int, Int, Long, Long)].collect().toSet ==
      whole.as[(Int, Int, Long, Long)].collect().toSet)
  }
}
