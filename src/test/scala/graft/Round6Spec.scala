package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ByteType

import graft.ops.{Corpus, SimilaritySearch}

/** Round-6 operators: SQ8 scalar-quantized ANN and rare-token statistics. */
class SqAnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq.tabulate(30) { i =>
    (i.toLong, Array(math.sin(i * 1.7), math.cos(i * 0.9),
      (i % 7) / 7.0 - 0.5, (i % 11) / 11.0 - 0.5).map(_.toFloat))
  }.toDF("vec_id", "embedding")

  test("withInt8 stores real tinyint codes in [-127, 127]; max component hits ±127") {
    val scale = SimilaritySearch.maxAbsScale(vecs, "embedding")
    val coded = SimilaritySearch.withInt8(vecs, "embedding", scale)
    val elem = coded.schema("qvec").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(elem == ByteType, "codes must be a real array<tinyint>, not widened ints")
    val bounds = coded.select(
      max(array_max($"qvec".cast("array<int>"))),
      min(array_min($"qvec".cast("array<int>")))).head()
    assert(bounds.getInt(0) <= 127 && bounds.getInt(1) >= -127)
    // the component defining the scale quantizes to exactly ±127
    assert(math.abs(bounds.getInt(0)) == 127 || math.abs(bounds.getInt(1)) == 127)
  }

  test("sqTopK with rerank >= n reproduces the brute-force ranking exactly") {
    val q = vecs.where($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val scale = SimilaritySearch.maxAbsScale(vecs, "embedding")
    val coded = SimilaritySearch.withInt8(vecs, "embedding", scale)
    val sq = SimilaritySearch.sqTopK(coded, "vec_id", "embedding", "qvec",
        q, scale, k = 5, rerank = 30)
      .select($"vec_id", round($"cosine", 9)).as[(Long, Double)].collect()
    val bf = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select($"vec_id", round($"cosine", 9)).as[(Long, Double)].collect()
    assert(sq.toSeq == bf.toSeq)
  }

  test("candidate scans read only (id, codes) from parquet — floats pruned") {
    val scale = SimilaritySearch.maxAbsScale(vecs, "embedding")
    val cbs = SimilaritySearch.pqCodebooks(vecs, "vec_id", "embedding", m = 4, ks = 8)
    val dir = tmpDir()
    SimilaritySearch.withPqCodes(
        SimilaritySearch.withInt8(vecs, "embedding", scale), "embedding", cbs)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val sqPlan = SimilaritySearch.sqCandidates(stored, "vec_id", "qvec",
      Seq.fill(8)(1L), rerank = 5).queryExecution.executedPlan.toString
    val pqPlan = SimilaritySearch.pqCandidates(stored, "vec_id", "pq",
      SimilaritySearch.pqAdcTable(Seq.fill(8)(0.5), cbs), rerank = 5)
      .queryExecution.executedPlan.toString
    for (plan <- Seq(sqPlan, pqPlan)) {
      val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("embedding"),
        s"candidate scan must not read the float column:\n$readSchema")
    }
  }

  test("SQ8 index build is a pure projection: no join, no exchange") {
    val scale = SimilaritySearch.maxAbsScale(vecs, "embedding")
    val plan = SimilaritySearch.withInt8(vecs, "embedding", scale)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("driver-side query quantization matches the engine rule") {
    val scale = SimilaritySearch.maxAbsScale(vecs, "embedding")
    val q = vecs.where($"vec_id" === 3)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val engine = SimilaritySearch.withInt8(vecs, "embedding", scale)
      .where($"vec_id" === 3)
      .select($"qvec".cast("array<long>")).head().getSeq[Long](0)
    assert(SimilaritySearch.int8Of(q, scale) == engine)
  }
}

class PqAnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq.tabulate(40) { i =>
    (i.toLong, Array.tabulate(8)(j =>
      (math.sin(i * 1.3 + j) + (i % 5) * 0.1).toFloat))
  }.toDF("vec_id", "embedding")

  test("withPqCodes emits m tinyint codes in [0, ks)") {
    val cbs = SimilaritySearch.pqCodebooks(vecs, "vec_id", "embedding", m = 4, ks = 8)
    assert(cbs.length == 4 && cbs.head.length == 8 && cbs.head.head.length == 2)
    val coded = SimilaritySearch.withPqCodes(vecs, "embedding", cbs)
    val elem = coded.schema("pq").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(elem == ByteType)
    val r = coded.select(
      min(array_min($"pq".cast("array<int>"))),
      max(array_max($"pq".cast("array<int>"))),
      max(size($"pq"))).head()
    assert(r.getInt(0) >= 0 && r.getInt(1) < 8 && r.getInt(2) == 4)
  }

  test("a codebook vector encodes to itself (zero quantization error)") {
    // vec_id < ks are the codebook sources: subspace j's centroid list has
    // their own subvector at index = vec_id, so each must argmin to itself
    val cbs = SimilaritySearch.pqCodebooks(vecs, "vec_id", "embedding", m = 4, ks = 8)
    val codes = SimilaritySearch.withPqCodes(vecs, "embedding", cbs)
      .where($"vec_id" < 8).orderBy($"vec_id")
      .select($"pq".cast("array<int>")).as[Seq[Int]].collect()
    codes.zipWithIndex.foreach { case (c, i) =>
      assert(c == Seq.fill(4)(i), s"vector $i must encode to its own centroid")
    }
  }

  test("PQ index build is a pure projection: no join, no exchange") {
    val cbs = SimilaritySearch.pqCodebooks(vecs, "vec_id", "embedding", m = 4, ks = 8)
    val plan = SimilaritySearch.withPqCodes(vecs, "embedding", cbs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("pqTopK with rerank >= n reproduces the brute-force ranking exactly") {
    val q = vecs.where($"vec_id" === 0)
      .select($"embedding".cast("array<double>")).head().getSeq[Double](0)
    val cbs = SimilaritySearch.pqCodebooks(vecs, "vec_id", "embedding", m = 4, ks = 8)
    val coded = SimilaritySearch.withPqCodes(vecs, "embedding", cbs)
    val pq = SimilaritySearch.pqTopK(coded, "vec_id", "embedding", "pq",
        q, cbs, k = 5, rerank = 40)
      .select($"vec_id", round($"cosine", 9)).as[(Long, Double)].collect()
    val bf = SimilaritySearch.bruteForceTopK(vecs, "vec_id", "embedding", q, 5)
      .select($"vec_id", round($"cosine", 9)).as[(Long, Double)].collect()
    assert(pq.toSeq == bf.toSeq)
  }
}

class RareTokenSpec extends SparkSpec {
  import spark.implicits._

  test("rareTokenStats counts hapax occurrences, types, and the rare fraction") {
    val docs = Seq(
      (1L, "apple banana Apple zzz"), // lowercased: apple x2 here
      (2L, "banana qqq qqq"),
      (3L, "")).toDF("doc_id", "text")
    // corpus freqs: apple 2, banana 2, zzz 1 (hapax), qqq 2
    val r = Corpus.rareTokenStats(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq(
      (1L, 4L, 1L, 1L, 0.25), // zzz is the only rare occurrence
      (2L, 3L, 0L, 0L, 0.0))) // empty doc 3 has no token rows
  }

  test("rareMaxCount widens the rare set") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // freqs: a 2, b 2, c 1 — with rareMaxCount=2 everything is rare
    val r = Corpus.rareTokenStats(docs, "doc_id", "text", rareMaxCount = 2L)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(r.toSeq == Seq((1L, 3L, 3L, 2L, 1.0), (2L, 2L, 2L, 2L, 1.0)))
  }
}
