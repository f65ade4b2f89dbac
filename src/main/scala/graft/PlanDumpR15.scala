package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

import graft.ops.SimilaritySearch

/** Dump `explain("formatted")` for the round-15 optimization targets into
  * `plans/r15/<query>_<tag>.txt` — the before/after plan evidence the
  * optimization round commits next to OPTIMIZATION_r15.md. Run:
  * `sbt "runMain graft.PlanDumpR15 <sfDir> <tag>"` (tag = before|after;
  * the `before` files come from a checkout of the round-start commit
  * with the mirror-image of this file dropped in).
  *
  * Queries whose public frame ends in an eager checkpoint dump their
  * LAZY stage instead (the PlanAudit precedent), so the fused shapes are
  * visible rather than a LogicalRDD leaf.
  */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val tag = if (args.length > 1) args(1) else "after"
    val outDir = Paths.get("plans/r15")
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(outDir.resolve(s"${name}_$tag.txt"), plan.getBytes("UTF-8"))
      println(s"[plandump] $name -> plans/r15/${name}_$tag.txt")
    }
    // pair metrics: the full public frame shows the gram builds inline
    dump("q_chrf_pairs", SparkEntry.queries("q_chrf_pairs")(spark, sfDir))
    dump("q_bleu_pairs", SparkEntry.queries("q_bleu_pairs")(spark, sfDir))
    dump("q_rouge_n", SparkEntry.queries("q_rouge_n")(spark, sfDir))
    // stored-model scorers: full frame (model lineage visible pre-r15,
    // checkpointed model leaves post-r15)
    dump("q_kn_stored", SparkEntry.queries("q_kn_stored")(spark, sfDir))
    dump("q_nb_train", SparkEntry.queries("q_nb_train")(spark, sfDir))
    // repetition matrix: lazy stage (public frame is checkpoint-hidden)
    locally {
      val (out, tok, allG) = graft.ops.Corpus.repetitionMatrixLazy(
        Tables.documents(spark, sfDir), "doc_id", "text",
        Seq(2, 3, 4), Seq(5, 6, 7, 8, 9, 10))
      try dump("q_repetition_matrix", out)
      finally { tok.unpersist(); allG.unpersist(); () }
    }
    // moore-lewis: lazy stage of the fused self-trained scorer
    locally {
      val (out, toks, ckpts) = graft.ops.Corpus.crossEntropySelectSelfLazy(
        Tables.documents(spark, sfDir), "doc_id", "text",
        col("lang") === "en", 0.5, 0.3)
      try dump("q_moore_lewis_select", out)
      finally {
        toks.unpersist()
        ckpts.foreach(graft.ops.ApproxDedup.freeCheckpoint)
      }
    }
    // chrf gram stage (checkpoint-hidden in the public frame): the SHIPPED
    // fused one-scan/one-aggregate build — the same
    // Evaluation.fusedGramCounts the operators and the equivalence pin use
    // (r15 ADVICE: no third hand copy)
    locally {
      import graft.functions.TextFns
      val cands = Tables.documents(spark, sfDir)
        .where(col("doc_id") % 2 === 1).select(col("doc_id"), col("text"))
      dump("q_chrf_pairs_gramstage", graft.ops.Evaluation.fusedGramCounts(
        cands, "doc_id", regexp_replace(trim(col("text")), "\\s+", ""),
        1 to 6, TextFns.charNgrams, "cc"))
    }
    // opq build: the encode projection (the part the spread touched) —
    // reconstructed with the same parameters as q_opq_index_sync
    locally {
      val emb = Tables.embeddings(spark, sfDir)
      val rot = SimilaritySearch.opqRotation(emb, "vec_id", "embedding",
        m = 8, ks = 128, nSample = 256, iters = 10)
      val rcents = SimilaritySearch
        .sampleCentroids(emb, "vec_id", "embedding", 16)
        .map(v => SimilaritySearch.rotateQuery(v, rot))
      val rcbs = SimilaritySearch.opqCodebooks(emb, "vec_id", "embedding",
        rot, m = 8, ks = 128)
      val enc = SimilaritySearch.withPqCodes(
          SimilaritySearch.withIvfCell(
            SimilaritySearch.withRotation(Tables.spread(
              emb.where(col("vec_id") % 2 === 0)), "embedding", rot, "rvec"),
            "rvec", rcents), "rvec", rcbs)
        .select(col("vec_id"), col("rvec"), col("pq"),
          col("cell").cast("long").as("cell"))
      dump("q_opq_index_sync_encode", enc)
    }
    spark.stop()
  }
}
