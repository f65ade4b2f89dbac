package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.ops.{ApproxDedup, Corpus, Rlhf, SimilaritySearch}
import graft.sync.SyncEngine

/** Round-13 operators: interpolated trigram LM, reward-model calibration
  * report, stored IVF+PQ index sync, containmentPairs integral-id widening. */
class TrigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("word order: scrambled doc scores higher xent than the corpus phrase") {
    // corpus dominated by one ordered phrase; doc 20 carries the SAME token
    // multiset scrambled — unigram terms identical, so any xent gap is pure
    // n-gram order signal
    val phrase = "the quick brown fox jumps over the lazy dog"
    val docs = ((1L to 10L).map(i => i -> phrase) :+
      (20L -> "dog the over quick lazy fox brown jumps the")).toDF("doc_id", "text")
    val out = Corpus.trigramLogProb(docs, "doc_id", "text")
      .select("doc_id", "xent").as[(Long, Double)].collect().toMap
    assert(out(1L) < out(20L),
      s"ordered ${out(1L)} should beat scrambled ${out(20L)}")
  }

  test("1-token doc degrades exactly to the unigram score") {
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "alpha").toDF("doc_id", "text")
    val tri = Corpus.trigramLogProb(docs, "doc_id", "text")
      .where($"doc_id" === 2L).select("n_tokens", "logprob_micro")
      .as[(Long, Long)].head()
    val uni = Corpus.unigramLogProb(docs, "doc_id", "text")
      .where($"doc_id" === 2L).select("n_tokens", "logprob_micro")
      .as[(Long, Long)].head()
    assert(tri == uni, s"trigram $tri vs unigram $uni")
  }

  test("2-token doc has no trigram term and all docs emit one finite row") {
    val docs = Seq(1L -> "a b c d", 2L -> "a b", 3L -> "c").toDF("doc_id", "text")
    val out = Corpus.trigramLogProb(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "logprob_micro", "xent")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(r => r._1 -> r._2).toSeq == Seq(1L -> 4L, 2L -> 2L, 3L -> 1L))
    assert(out.forall(r => r._3 < 0L && !r._4.isNaN && r._4 > 0.0))
  }

  test("lambda weights outside the simplex are rejected") {
    val docs = Seq(1L -> "a b").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Corpus.trigramLogProb(docs, "doc_id", "text", lambda3 = 0.8, lambda2 = 0.3)
    }
  }
}

class RewardCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("two clean groups land in the extreme bins with exact pos rates") {
    // per group: rewards {0, 10} → z = ∓1 exactly; min–max puts them at
    // micro 0 and 1e6 → bins 0 and nBins−1. Labels follow the reward.
    val df = Seq(
      ("g1", 1L, 0L, 0), ("g1", 2L, 10L, 1),
      ("g2", 3L, 0L, 0), ("g2", 4L, 10L, 1),
      // degenerate groups must DROP: singleton (no n≥2), zero variance
      ("g3", 5L, 7L, 1),
      ("g4", 6L, 5L, 0), ("g4", 7L, 5L, 1)
    ).toDF("grp", "id", "r", "lbl")
    val out = Rlhf.rewardCalibration(df, "grp", "r", "lbl", nBins = 4)
      .select("bin", "cnt", "mean_score_micro", "pos_rate_micro")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0, 2L, 0L, 0L), (3, 2L, 1000000L, 1000000L)))
  }

  test("bin count is bounded and counts cover exactly the whitenable rows") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").select(
      col("event_type"),
      round(col("value") * 100).cast("long").as("r"),
      (col("value") > lit(50.0d)).cast("int").as("lbl"))
    val out = Rlhf.rewardCalibration(ev, "event_type", "r", "lbl", nBins = 8)
      .select("bin", "cnt").as[(Int, Long)].collect()
    assert(out.nonEmpty && out.length <= 8)
    assert(out.forall(b => b._1 >= 0 && b._1 < 8))
    // every event_type group at sf0.001 has n ≥ 2 and nonzero variance, so
    // no rows drop and the bins partition the corpus
    assert(out.map(_._2).sum == ev.count())
  }
}

class IvfPqIndexSyncSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("incrementally-synced IVF+PQ probe == in-process ivfPqTopK, pruned") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val cbs = SimilaritySearch.pqCodebooks(emb, "vec_id", "embedding", m = 4, ks = 16)
    def index(df: DataFrame) =
      SimilaritySearch.withPqCodes(
          SimilaritySearch.withIvfCell(df, "embedding", cents), "embedding", cbs)
        .select(col("vec_id"), col("embedding"), col("pq"),
          col("cell").cast("long").as("cell"))
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("ann", "ivfpq_spec"),
      columns = ColumnRoles(Map("datetime" -> "cell", "id" -> "vec_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    eng.sync(spec, index(emb.where(col("vec_id") % 2 === 0)), checkExisting = false)
    eng.sync(spec, index(emb.where(col("vec_id") % 2 === 1)), checkExisting = false)
    val probe = SimilaritySearch.ivfProbeCells(cents, q, nProbe = 8)
    val stored = eng.storage(spec).readIn(probe.map(_.toLong))
    // pruning is real: the probe slice holds fewer rows than the corpus
    assert(stored.count() < emb.count())
    val viaStore = SimilaritySearch.pqTopK(stored, "vec_id", "embedding", "pq",
        q, cbs, k = 10, rerank = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val inProc = SimilaritySearch.ivfPqTopK(index(emb), "vec_id", "embedding",
        "cell", "pq", q, cents, cbs, k = 10, nProbe = 8, rerank = 50)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(viaStore == inProc && viaStore.size == 10)
  }
}

class FilterAblationSpec extends SparkSpec {
  import spark.implicits._

  test("pairwise kill matrix is exact on a constructed corpus") {
    // doc1 killed by A only; doc2 by B only; doc3 by both; doc4 by neither
    val df = Seq((1L, true, false), (2L, false, true),
      (3L, true, true), (4L, false, false)).toDF("id", "a", "b")
    val out = graft.ops.Evaluation.filterAblation(df,
        Seq("A" -> col("a"), "B" -> col("b")))
      .select("filter_a", "filter_b", "killed_a", "killed_b", "killed_both",
        "n_docs", "overlap_micro")
      .as[(String, String, Long, Long, Long, Long, Option[Long])]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(
      ("A", "A", 2L, 2L, 2L, 4L, Some(1000000L)),
      ("A", "B", 2L, 2L, 1L, 4L, Some(333333L)),
      ("B", "B", 2L, 2L, 2L, 4L, Some(1000000L))))
  }

  test("a filter that kills nothing reports null overlap (undefined Jaccard)") {
    val df = Seq((1L, true, false)).toDF("id", "a", "b")
    val out = graft.ops.Evaluation.filterAblation(df,
        Seq("A" -> col("a"), "B" -> col("b")))
      .where(col("filter_a") === "B" && col("filter_b") === "B")
      .select("overlap_micro").as[Option[Long]].head()
    assert(out.isEmpty)
  }
}

class LmIndexSyncSpec extends SparkSpec {

  test("stored-model score (two-batch additive fold) == self-model trigramLogProb") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val self = Corpus.trigramLogProb(docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val halves = Seq(docs.where(col("doc_id") % 2 === 0),
      docs.where(col("doc_id") % 2 === 1))
    val counts = halves.map(h =>
      Corpus.trigramModelCounts(h, "doc_id", "text", buckets = 8))
    val stored = Corpus.trigramScoreWithModel(docs, "doc_id", "text",
        Corpus.lmFoldUni(counts(0)._1.union(counts(1)._1)),
        Corpus.lmFoldBi(counts(0)._2.union(counts(1)._2)),
        Corpus.lmFoldTri(counts(0)._3.union(counts(1)._3)))
      .collect().map(_.toSeq).toSet
    assert(stored == self && self.size == 500)
  }
}

class TrigramModelScoreSpec extends SparkSpec {
  import spark.implicits._

  test("OOV docs score at the smoothed floor, never probability 1") {
    val model = Seq(1L -> "alpha beta gamma alpha beta").toDF("doc_id", "text")
    val (u, b, t) = Corpus.trigramModelCounts(model, "doc_id", "text", buckets = 4)
    val score = Seq(10L -> "alpha beta gamma", 11L -> "zzz unknown words")
      .toDF("doc_id", "text")
    val out = Corpus.trigramScoreWithModel(score, "doc_id", "text",
        Corpus.lmFoldUni(u), Corpus.lmFoldBi(b), Corpus.lmFoldTri(t))
      .select("doc_id", "xent").as[(Long, Double)].collect().toMap
    // both docs emit; the fully-OOV doc pays the add-one floor at every
    // position and must score strictly worse than the in-model doc
    assert(out.keySet == Set(10L, 11L))
    assert(out(11L) > out(10L), s"oov ${out(11L)} vs in-model ${out(10L)}")
  }
}

class MooreLewisSpec extends SparkSpec {
  import spark.implicits._

  test("in-domain candidates rank below out-of-domain ones (lower H_in − H_out)") {
    val inDomain = (1L to 8L).map(i =>
      (i, "spark catalyst optimizes the physical plan for the query engine", "tech"))
    val general = (11L to 18L).map(i =>
      (i, "the cat sat on the mat and watched the quiet garden grow", "misc"))
    val docs = (inDomain ++ general).toDF("doc_id", "text", "lang")
    val C = graft.ops.Corpus
    val (iu, ib, it) = C.trigramModelCounts(
      docs.where($"lang" === "tech"), "doc_id", "text", buckets = 1)
    val (ou, ob, ot) = C.trigramModelCounts(docs, "doc_id", "text", buckets = 1)
    val out = C.crossEntropySelect(docs, "doc_id", "text",
        C.lmFoldUni(iu), C.lmFoldBi(ib), C.lmFoldTri(it),
        C.lmFoldUni(ou), C.lmFoldBi(ob), C.lmFoldTri(ot))
      .select("doc_id", "ce_delta").as[(Long, Double)].collect().toMap
    // the in-domain doc scores STRICTLY lower delta than any general doc
    // that survived the in-domain vocabulary gate
    val inScores  = (1L to 8L).flatMap(out.get)
    val outScores = (11L to 18L).flatMap(out.get)
    assert(inScores.nonEmpty)
    assert(outScores.isEmpty || inScores.max < outScores.min,
      s"in=$inScores out=$outScores")
  }
}

class BitextMarginSpec extends SparkSpec {
  import spark.implicits._

  test("mined pairs respect sides, are unique per source, and clear the threshold") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .withColumn("side", (col("label") % 2 === 1).cast("int"))
    val cents = graft.ops.SimilaritySearch.sampleCentroids(
      emb, "vec_id", "embedding", 16)
    val out = graft.ops.SimilaritySearch.bitextMarginMine(
        emb, "vec_id", "embedding", "side", cents,
        k = 4, nProbe = 8, thresholdMicro = 1000000L)
      .select("x_id", "y_id", "margin_micro")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length, "one pair per source")
    assert(out.forall(_._3 >= 1000000L))
    val sideOf = emb.select($"vec_id", $"side").as[(Long, Int)].collect().toMap
    assert(out.forall(p => sideOf(p._1) == 0 && sideOf(p._2) == 1))
  }
}

class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  test("probing every cell recovers exact recall 1.0; fewer probes never exceed it") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = graft.ops.SimilaritySearch.sampleCentroids(
      emb, "vec_id", "embedding", 16)
    val queries = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    def recall(nProbe: Int): Map[Long, Long] =
      graft.ops.SimilaritySearch.annRecallReport(emb, "vec_id", "embedding",
          queries, "qid", "qvec", cents, k = 10, nProbe = nProbe)
        .select("qid", "recall_micro").as[(Long, Long)].collect().toMap
    val full = recall(16)
    assert(full.nonEmpty && full.values.forall(_ == 1000000L),
      s"full probe must be exact: $full")
    val partial = recall(2)
    assert(partial.forall { case (q, r) => r <= full(q) })
  }
}

class ContainmentIdWideningSpec extends SparkSpec {
  import spark.implicits._

  test("integer ids widen to long and match the long-id result") {
    val rows = Seq(
      1 -> "shared prefix tokens one two three alpha",
      2 -> "shared prefix tokens one two three beta",
      3 -> "completely unrelated content words here now")
    val intDocs = rows.toDF("id", "text")
    val longDocs = rows.map { case (i, t) => (i.toLong, t) }.toDF("id", "text")
    def run(df: DataFrame) = ApproxDedup.containmentPairs(df, "id", "text",
        n = 3, thresholdMicro = 500000L, maxDocsPerShingle = 8)
      .select("id1", "id2", "containment_micro")
      .as[(Long, Long, Long)].collect().toSet
    val viaInt = run(intDocs)
    assert(viaInt == run(longDocs) && viaInt.nonEmpty)
  }

  test("non-integral id column is still rejected") {
    val docs = Seq(("a", "x y z")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      ApproxDedup.containmentPairs(docs, "id", "text", 3, 0L, 4)
    }
  }
}
