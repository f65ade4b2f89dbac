package graft

import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("hashedLinearScore: deterministic, keep ≡ (score > 0), features counted") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"), // identical text → identical score
      (3L, "completely different words here entirely"),
      (4L, "one")                  // single token → unigram only, no bigrams
    ).toDF("doc_id", "text")
    val out = graft.ops.Corpus.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 7L) // 4 unigrams + 3 bigrams
    assert(byId(4L).getLong(1) == 1L) // 1 unigram, 0 bigrams
    assert(byId(1L).getLong(2) == byId(2L).getLong(2), "same text, same score")
    out.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(2) > 0L), "keep must mirror score sign")
      val expected = r.getLong(2).toDouble / (r.getLong(1).toDouble * 1000.0)
      assert(r.getDouble(3) == expected)
    }
  }

  test("hashedLinearScore plans a broadcast model join (corpus never shuffles for the model)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = graft.ops.Corpus.hashedLinearScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"model join not broadcast:\n$plan")
  }
}
