package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalacheck.Prop.forAll

import graft.ops.{Corpus, Sketches}

/** Randomized-split fold ≡ rebuild properties for the stored-pipe fold
  * families whose parity specs previously rested on one fixed split each:
  * the trigram/KN model-count fold, the grouped DD-sketch fold, and the
  * data-card fold. Each property generates an arbitrary assignment of rows
  * to 2–4 sync batches (empty batches allowed — a batch that happens to
  * carry no rows simply never syncs) and asserts the blind-append fold
  * over the per-batch pipes is bit-identical to a full-corpus rebuild.
  * The generated-split coverage is what certifies the folds against the
  * real production hazard: batch boundaries at 100 TB are arbitrary (a
  * backfill can split ANY way), so additivity must hold for every split,
  * not the doc_id-parity split the fixed specs used.
  */
class FoldPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Run a ScalaCheck property under ScalaTest (no scalatestplus bridge in
    * the offline cache): fail with the counterexample on falsify. */
  private def check(prop: Prop): Unit = {
    // 4 worker threads: each trial is one tiny Spark job, and concurrent
    // driver-side job submission is the supported way to overlap their
    // fixed planning/scheduling overhead (the wall-clock here is ~all
    // per-job overhead, not compute)
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(50).withWorkers(4), prop)
    assert(res.passed, res.status.toString)
  }

  /** Assignment of each of `n` rows to one of 2–4 batches. */
  private def splitGen(n: Int): Gen[List[Int]] =
    Gen.chooseNum(2, 4).flatMap(k => Gen.listOfN(n, Gen.chooseNum(0, k - 1)))

  private def batches[T](rows: Seq[T], marks: List[Int]): Seq[Seq[T]] =
    rows.zip(marks).groupBy(_._2).values.map(_.map(_._1)).filter(_.nonEmpty).toSeq

  // ---- trigram / Kneser–Ney model-count fold ------------------------------

  private val lmDocs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(11L)
    val vocab = Array("a", "b", "c", "d", "e")
    (1L to 10L).map(i =>
      (i, Seq.fill(3 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length))).mkString(" ")))
  }

  /** One frame carrying all three model tables so each trial is ONE job. */
  private def lmCanon(uni: DataFrame, bi: DataFrame, tri: DataFrame): Set[(String, Long)] =
    uni.select(col("token").as("k"), col("cf").as("c"))
      .unionByName(bi.select(concat_ws(" ", lit("B"), col("v"), col("w")).as("k"),
        col("c_vw").as("c")))
      .unionByName(tri.select(concat_ws(" ", lit("T"), col("u"), col("v"), col("w")).as("k"),
        col("c_uvw").as("c")))
      .as[(String, Long)].collect().toSet

  test("LM/KN model fold == full rebuild over 50 generated batch splits") {
    val (fu, fb, ft) = Corpus.trigramModelCounts(lmDocs.toDF("doc_id", "text"),
      "doc_id", "text", buckets = 2)
    val full = lmCanon(Corpus.lmFoldUni(fu), Corpus.lmFoldBi(fb), Corpus.lmFoldTri(ft))
    check(forAll(splitGen(lmDocs.size)) { marks =>
      val parts = batches(lmDocs, marks).map(p =>
        Corpus.trigramModelCounts(p.toDF("doc_id", "text"), "doc_id", "text", buckets = 2))
      val folded = lmCanon(
        Corpus.lmFoldUni(parts.map(_._1).reduce(_ unionByName _)),
        Corpus.lmFoldBi(parts.map(_._2).reduce(_ unionByName _)),
        Corpus.lmFoldTri(parts.map(_._3).reduce(_ unionByName _)))
      folded == full
    })
  }

  // ---- grouped DD-sketch fold ---------------------------------------------

  private val ddRows: Seq[(String, Long)] = {
    val rng = new scala.util.Random(13L)
    (1 to 40).map { _ =>
      val g = Seq("x", "y", "z")(rng.nextInt(3))
      // spread magnitudes across octaves, including the v=0 and v=1 edges
      (g, rng.nextInt(5) match {
        case 0 => 0L
        case 1 => 1L + rng.nextInt(15).toLong
        case 2 => 16L + rng.nextInt(1000).toLong
        case 3 => 1000000L + rng.nextInt(1000000).toLong
        case _ => Long.MaxValue / 32 + rng.nextInt(1000).toLong
      })
    }
  }

  test("grouped DD-sketch fold == full rebuild over 50 generated batch splits") {
    val full = Sketches.ddSketchHistogramByGroup(ddRows.toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Long)].collect().toSet
    check(forAll(splitGen(ddRows.size)) { marks =>
      val folded = Sketches.ddSketchFoldByGroup(
          batches(ddRows, marks)
            .map(p => Sketches.ddSketchHistogramByGroup(p.toDF("g", "v"), "g", "v"))
            .reduce(_ unionByName _))
        .as[(String, Long, Long, Long)].collect().toSet
      folded == full
    })
  }

  // ---- round-11 folds: AC pattern stats, cell stats, gram index ----------

  private val acDocs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(19L)
    val words = Array("scan", "merge", "order", "plain", "xyz")
    (1L to 12L).map(i =>
      (i, Seq.fill(2 + rng.nextInt(5))(words(rng.nextInt(words.length))).mkString(" ")))
  }
  private val acPats = Seq("scan", "can", "an", "merge", "erg", "zzz")

  test("AC pattern-stats fold == full rebuild over 50 generated batch splits") {
    import graft.ops.Corpus
    val full = Corpus.acPatternStats(acDocs.toDF("doc_id", "text"),
        "doc_id", "text", acPats)
      .as[(String, Long, Long)].collect().toSet
    check(forAll(splitGen(acDocs.size)) { marks =>
      val folded = Corpus.acPatternStatsFold(
          batches(acDocs, marks).map(p => Corpus.acPatternStatsBatch(
            p.toDF("doc_id", "text"), "doc_id", "text", acPats, buckets = 4))
            .reduce(_ unionByName _)
            .select("pattern", "n_docs", "n_hits"))
        .as[(String, Long, Long)].collect().toSet
      folded == full
    })
  }

  private val cellVecs: Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(23L)
    (0L to 19L).map(i => (i, Array.fill(4)(rng.nextDouble() - 0.3)))
  }
  private val cellCents: Seq[Seq[Double]] =
    cellVecs.take(4).map(_._2.toSeq)

  test("cell-stats fold == full rebuild over 50 generated batch splits") {
    import graft.ops.SimilaritySearch
    def stats(rows: Seq[(Long, Array[Double])]) =
      SimilaritySearch.cellStatsBatch(rows.toDF("vec_id", "embedding"),
        "embedding", cellCents, epoch = 0L)
    val full = stats(cellVecs).as[(Long, Int, Long, Long)].collect().toSet
    check(forAll(splitGen(cellVecs.size)) { marks =>
      // blind-appended per-batch stats fold by sum within the epoch
      val folded = batches(cellVecs, marks).map(stats)
        .reduce(_ unionByName _)
        .groupBy(col("epoch"), col("cell"))
        .agg(sum(col("n")).as("n"), sum(col("sd")).as("sd"))
        .as[(Long, Int, Long, Long)].collect().toSet
      folded == full
    })
  }

  private val gramDocs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(29L)
    val words = Array("a", "b", "c", "d")
    (1L to 12L).map(i =>
      (i, Seq.fill(3 + rng.nextInt(5))(words(rng.nextInt(words.length))).mkString(" ")))
  }

  test("gram-index fold (distinct of unioned batch-distincts) == rebuild over 50 splits") {
    import graft.ops.TextStats
    def idx(rows: Seq[(Long, String)]) = TextStats.gramIndexBatch(
      rows.toDF("doc_id", "text"), "doc_id", "text", n = 2, buckets = 4)
    val full = idx(gramDocs).select("h").distinct()
      .as[Long].collect().toSet
    check(forAll(splitGen(gramDocs.size)) { marks =>
      val folded = batches(gramDocs, marks).map(idx)
        .reduce(_ unionByName _)
        .select("h").distinct().as[Long].collect().toSet
      folded == full
    })
  }

  // ---- data-card fold -----------------------------------------------------

  private val cardDocs: Seq[(Long, String, String, String)] = {
    val rng = new scala.util.Random(17L)
    val texts = Array(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "sphinx of black quartz judge my vow",
      "short text")
    (1L to 16L).map { i =>
      // duplicated texts across rows so the unique-doc count genuinely
      // depends on cross-batch fingerprint dedup, not per-batch counts
      (i, s"s${rng.nextInt(3)}", if (rng.nextBoolean()) "en" else "de",
        texts(rng.nextInt(texts.length)))
    }
  }

  // ---- round-12 fold: incremental connected components --------------------

  test("incremental CC fold == full-graph rebuild over 50 generated batch splits") {
    import graft.ops.ApproxDedup
    val rng = new scala.util.Random(23L)
    // random sparse graph over 12 nodes: chains, merges, repeated edges
    val allPairs: Seq[(Long, Long)] = (1 to 14).map { _ =>
      (1L + rng.nextInt(12), 1L + rng.nextInt(12))
    }.filter(p => p._1 != p._2).distinct
    val full = ApproxDedup.nearDupClusters(allPairs.toDF("id1", "id2"))
      .as[(Long, Long)].collect().toSet
    check(forAll(splitGen(allPairs.size)) { marks =>
      var labels = Seq.empty[(Long, Long, Long)].toDF("bucket", "node", "root")
      var members = Seq.empty[(Long, Long, Long)].toDF("bucket", "root", "node")
      var first = true
      batches(allPairs, marks).foreach { b =>
        val lSnap = labels; val mSnap = members
        val rows = ApproxDedup.ccIncrementRows(b.toDF("id1", "id2"),
          "id1", "id2", buckets = 4,
          history = if (first) None else Some((
            bs => lSnap.where(col("bucket").isin(bs: _*)),
            bs => mSnap.where(col("bucket").isin(bs: _*)))))
        val nl = labels.unionByName(rows.select(
          col("node_bucket").as("bucket"), col("node"), col("root")))
          .localCheckpoint(true)
        val nm = members.unionByName(rows.select(
          col("root_bucket").as("bucket"), col("root"), col("node")))
          .localCheckpoint(true)
        ApproxDedup.freeCheckpoint(labels); ApproxDedup.freeCheckpoint(members)
        ApproxDedup.freeCheckpoint(rows)
        labels = nl; members = nm; first = false
      }
      val folded = ApproxDedup.ccFold(labels.select(col("node"), col("root")))
        .as[(Long, Long)].collect().toSet
      ApproxDedup.freeCheckpoint(labels); ApproxDedup.freeCheckpoint(members)
      folded == full
    })
  }

  test("data-card fold == full rebuild over 50 generated batch splits") {
    val cols = Seq("source", "n_docs", "total_tokens", "min_tokens", "max_tokens",
      "sum_quality_micro", "n_english", "n_unique_docs")
    val docs = cardDocs.toDF("doc_id", "source", "lang", "text")
    val full = Corpus.dataCard(docs, "source", "lang", "text")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    check(forAll(splitGen(cardDocs.size)) { marks =>
      val parts = batches(cardDocs, marks).zipWithIndex.map { case (p, b) =>
        val d = p.toDF("doc_id", "source", "lang", "text")
        (Corpus.dataCardBatch(d, "source", "lang", "text", b.toLong),
          Corpus.dataCardFps(d, "source", "text", buckets = 4))
      }
      val folded = Corpus.dataCardFold(
          parts.map(_._1).reduce(_ unionByName _),
          parts.map(_._2).reduce(_ unionByName _), "source")
        .select(cols.map(col): _*).collect().map(_.toSeq).toSet
      folded == full
    })
  }
}
