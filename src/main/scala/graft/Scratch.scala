package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main — not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    import graft.ops.SimilaritySearch
    import graft.functions.VectorFns
    val emb = Tables.embeddings(spark, d)
    t("warm emb")(emb.count())
    t("warm emb 2")(emb.count())
    val cents = SimilaritySearch.sampleCentroids(emb, "vec_id", "embedding", 16)
    val cbs = SimilaritySearch.pqCodebooks(emb, "vec_id", "embedding", m = 4, ks = 16)
    val indexed = SimilaritySearch.withPqCodes(
      SimilaritySearch.withIvfCell(emb, "embedding", cents), "embedding", cbs)
    t("indexed count")(indexed.count())
    t("indexed count 2")(indexed.count())
    val queries = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = SimilaritySearch.ivfPqBatchTopK(indexed, queries,
      "vec_id", "embedding", "cell", "pq", "qid", "qvec",
      cents, cbs, k = 5, nProbe = 8, rerank = 50)
      .orderBy(col("qid"), col("rank"))
    t("execute 1")(out.count())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    t("execute no-wscg")(out.count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    t("execute 2")(out.count())
    println(out.queryExecution.executedPlan.toString.take(8000))
  }
}
