package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Dump `explain("formatted")` for the round-16 optimization targets into
  * `plans/r16/<query>_<tag>.txt` — the before/after plan evidence committed
  * next to OPTIMIZATION_r16.md. Run:
  * `sbt "runMain graft.PlanDumpR16 <sfDir> <tag>"` (tag = before|after; the
  * `before` files come from a checkout of the round-start commit with this
  * file dropped in — the PlanDumpR15 protocol).
  *
  * Queries whose public frame ends in an eager checkpoint dump their LAZY
  * stage instead, and the iterative/driver-side stages (star contraction,
  * union-find) dump the stage plans that exist as single frames.
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val tag = if (args.length > 1) args(1) else "after"
    val outDir = Paths.get("plans/r16")
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
      println(s"[plandump] $name -> plans/r16/${name}_$tag.txt")
    }
    // moore-lewis: lazy stage of the scorer (r16 = ONE dual-model ladder;
    // before = two trigramScoreFromToks passes joined on the id)
    locally {
      val lazyOut = graft.ops.Corpus.crossEntropySelectSelfLazy(
        Tables.documents(spark, sfDir), "doc_id", "text",
        col("lang") === "en", 0.5, 0.3)
      // r15's lazy returns (out, toks); r16's returns (out, toks, ckpts) —
      // productIterator keeps this file runnable at BOTH commits
      val it = lazyOut.productIterator.toSeq
      val out = it.head.asInstanceOf[org.apache.spark.sql.DataFrame]
      val toks = it(1).asInstanceOf[org.apache.spark.sql.DataFrame]
      try dump("q_moore_lewis_select", out)
      finally {
        toks.unpersist()
        if (it.length > 2)
          it(2).asInstanceOf[Seq[org.apache.spark.sql.DataFrame]]
            .foreach(graft.ops.ApproxDedup.freeCheckpoint)
      }
    }
    // star-contraction CC: the public frame of the cluster query — r16's
    // driver union-find branch plans one broadcast-joinable local mapping
    // (vs the distributed loop's final-round join); the tiny sf0.001 pair
    // graph takes the driver branch exactly like the bench's frontiers
    dump("q_neardup_clusters_star",
      SparkEntry.queries("q_neardup_clusters_star")(spark, sfDir))
    dump("q_neardup_clusters",
      SparkEntry.queries("q_neardup_clusters")(spark, sfDir))
    // kn stored scorer: full frame (r15 = checkpointed model leaves;
    // r16 = lazy fold subtrees deduped by exchange reuse)
    dump("q_kn_stored", SparkEntry.queries("q_kn_stored")(spark, sfDir))
    // stored-LM count build stage: the three count tables off lmTokens
    // (r16 = tokenize ABOVE the spread exchange, no empty-doc filter
    // below it; before = single-task tokenize under the filter)
    locally {
      val toks = graft.ops.Corpus.lmTokens(
        Tables.documents(spark, sfDir), "doc_id", "text")
      val (u, _, _) = graft.ops.Corpus.trigramModelCountsFromToks(toks, 16)
      dump("q_lm_index_sync_unistage", u)
    }
    // tokenizer_ab fertility stage: r16 = freq-weighted sums over the
    // trainer's final |vocab|-row state; before = corpus explode + segLen
    // join per family
    locally {
      val words = graft.ops.Corpus.vocab(
        Tables.documents(spark, sfDir), "text").localCheckpoint(true)
      val (_, bpeV) = graft.ops.Corpus.bpeTrainStateFromWords(words, 8)
      // fertilityFromTrainedState checkpoints eagerly; dump its lazy body
      val lazyFert = bpeV.select(col("freq"),
          size(split(col("sym"), " ")).cast("long").as("n_sub"),
          length(col("token")).cast("long").as("n_ch"))
        .groupBy(lit("bpe").as("__fam"))
        .agg(sum(col("freq")).as("n_words"),
          sum(col("freq") * col("n_sub")).as("n_subwords"),
          sum(col("freq") * col("n_ch")).as("n_chars"))
      dump("q_tokenizer_ab_fertstage", lazyFert)
      graft.ops.ApproxDedup.freeCheckpoint(bpeV)
      graft.ops.ApproxDedup.freeCheckpoint(words)
    }
    spark.stop()
  }
}
