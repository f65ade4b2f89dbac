package graft

import org.apache.spark.sql.functions._

class DocChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkDocs: windows, overlap, short tail, single-chunk doc") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y")                  // shorter than one chunk
    ).toDF("doc_id", "text")
    val out = graft.ops.Corpus.chunkDocs(docs, "doc_id", "text",
        chunkTokens = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    // starts 0,3,6,9 → ceil(10/3)=4 chunks; last is the 1-token tail
    assert(d1.map(_.getString(2)).toSeq ==
      Seq("a b c d", "d e f g", "g h i j", "j"))
    assert(d1.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L, 1L))
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(_.getString(2)).toSeq == Seq("x y"))
    assert(d2.head.getLong(3) == 2L)
  }

  test("chunkDocs plans zero exchanges (pure scan projection)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = graft.ops.Corpus.chunkDocs(docs, "doc_id", "text", 64, 48)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
