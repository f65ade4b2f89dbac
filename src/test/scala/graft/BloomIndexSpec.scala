package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomIndex

class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private val m = 1L << 12
  private val k = 4

  test("notInCorpus equals the exact anti-join, any (m, k)") {
    val corpus = Seq("a", "b", "c", "d").toDF("v")
    val batch = Seq("a", "x", "c", "y", "z").toDF("v")
    for (mm <- Seq(64L, 1L << 10); kk <- Seq(1, 4, 8)) {
      val dense = BloomIndex.assemble(BloomIndex.bloomWords(corpus, "v", mm, kk), mm)
      val out = BloomIndex.notInCorpus(batch, corpus, "v", dense, mm, kk)
        .as[String].collect().sorted.toSeq
      assert(out == Seq("x", "y", "z"), s"m=$mm k=$kk")
    }
  }

  test("null-valued rows route through the 'new' path, not silently dropped") {
    // nulls in the CORPUS too: they must be skipped by the build (not crash
    // assemble with a null word row) and never match anything
    val corpus = Seq(Some("a"), Some("b"), None).toDF("v")
    val batch = Seq(Some("a"), None, Some("q"), None).toDF("v")
    val dense = BloomIndex.assemble(BloomIndex.bloomWords(corpus, "v", m, k), m)
    val out = BloomIndex.notInCorpus(batch, corpus, "v", dense, m, k)
      .collect().map(r => Option(r.getString(0))).toSeq
    // reference filter_unseen (pandas merge anti-join) keeps null keys as unseen
    assert(out.count(_.isEmpty) == 2, s"null rows lost: $out")
    assert(out.flatten.sorted.toSeq == Seq("q"))
  }

  test("duplicate-heavy batch over the broadcast threshold falls back to shuffle semi-join, exact") {
    // every batch row is a probe hit (all values exist in the corpus or are
    // forced FPs), and the threshold is set below the candidate count so the
    // verify MUST take the shuffle path
    val corpus = (0 until 500).map(i => s"doc-$i").toDF("v")
    val batch = ((0 until 400).map(i => s"doc-$i") ++ (0 until 50).map(i => s"new-$i")).toDF("v")
    val dense = BloomIndex.assemble(BloomIndex.bloomWords(corpus, "v", m, k), m)
    val out = BloomIndex.notInCorpus(batch, corpus, "v", dense, m, k,
        broadcastMaxCandidates = 10L)
      .as[String].collect().sorted.toSeq
    val exact = (0 until 50).map(i => s"new-$i").sorted
    assert(out == exact)
  }

  test("merge of per-half filters equals the filter of the union") {
    val docs = (0 until 200).map(i => s"doc-$i").toDF("v")
    val whole = BloomIndex.bloomWords(docs, "v", m, k)
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    val merged = BloomIndex.mergeWords(
        BloomIndex.bloomWords(docs.where(length(col("v")) % 2 === 0), "v", m, k),
        BloomIndex.bloomWords(docs.where(length(col("v")) % 2 =!= 0), "v", m, k))
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(merged == whole)
  }

  test("oversized m fails fast instead of truncating the word index") {
    val docs = Seq("a").toDF("v")
    intercept[IllegalArgumentException] {
      BloomIndex.bloomWords(docs, "v", (Int.MaxValue.toLong + 1) * 64, 2)
    }
    intercept[IllegalArgumentException] {
      BloomIndex.assemble(Seq((0, 1L)).toDF("word", "bits"), (Int.MaxValue.toLong + 1) * 64)
    }
  }

  test("reserved temp column name is rejected, not silently overwritten") {
    val corpus = Seq("a").toDF("v")
    val dense = BloomIndex.assemble(BloomIndex.bloomWords(corpus, "v", m, k), m)
    val bad = Seq(("a", true)).toDF("v", "__graft_bloom_hit")
    intercept[IllegalArgumentException] {
      BloomIndex.notInCorpus(bad, corpus, "v", dense, m, k)
    }
  }
}
