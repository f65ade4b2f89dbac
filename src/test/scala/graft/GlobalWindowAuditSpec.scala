package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan gate: NO unpartitioned window may sneak onto a corpus-sized path.
  *
  * A `Window` with an empty partition spec funnels its whole input through
  * ONE task — fine over a bounded-by-construction table (a ≤64-row log2
  * class grid, a TakeOrdered'd head, a |bins| histogram), fatal over
  * anything corpus-proportional (the r7 `vocabCoverage` finding: a
  * rank/cumsum window over the full |vocab|). This spec walks every
  * analytic query's physical plan and fails when a query carries MORE
  * unpartitioned windows than its allowlisted bound; queries not listed
  * must have none. Adding a new global window anywhere forces a conscious
  * allowlist entry documenting why its input is bounded.
  */
class GlobalWindowAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // entries that drive engine/storage machinery on construction (syncs,
  // servers, streams, stored-index builds) — store reads, not window
  // pipelines; skipped to keep the audit a plan walk, not an e2e run
  private val skip = Seq(
    "_e2e", "streaming", "index_sync", "_stored", "stored_", "data_card_sync",
    "semantic_dedup_sync", "q_fleet_sync", "q_pipe_dag", "q_schedule_fires",
    "q_copy_pipe", "q_verify_", "q_compact_roundtrip", "q_repartition_op",
    "q_clear_range", "q_jdbc", "q_api_", "q_valkey", "q_registry_search",
    "q_deduplicate_pipe", "q_get_data", "q_get_docs", "q_sync_",
    "q_backtrack_window", "q_join_fetch", "q_autoincrement", "q_autotime",
    "q_infer_special", "q_ingest_lines", "q_union_chunks", "q_rowcount",
    "q_dt_bounds", "q_zorder_values", "q_bpe_stored_apply")

  /** name → max allowed unpartitioned WindowExecs, each justified by a
    * bounded-by-construction input (documented at the op). These are the
    * r7-judge-audited set; anything new must be added HERE with a bound. */
  private val allowed: Map[String, Int] = Map(
    "q_curriculum_interleave" -> 2, // |languages| mixture rows
    "q_daily_bursts"          -> 2, // |days| calendar grid
    "q_hybrid_rrf"            -> 2, // two k-row rank lists (k = config)
    "q_rbo"                   -> 2, // the same two k-row rank lists
    "q_ndcg"                  -> 2, // k-row BM25 rank + k-row ideal rank
    "q_skipgram_pairs"        -> 2, // noise-table cumsum over the ≤negVocab TakeOrdered head
    "q_itq_recall"            -> 0, // windows partition by qid (bounded fan)
    "q_psi_drift"             -> 1, // |bins| histogram grid
    "q_semantic_drift"        -> 1, // k-row k-means cell grid
    "q_signal_auc"            -> 1, // |distinct score| domain (eval-set bound, Evaluation.scala)
    "q_source_gini"           -> 1, // |sources| domain rows
    "q_temperature_mixture"   -> 2, // |languages| mixture rows
    "q_unimax_alloc"          -> 5, // |languages| water-filling ladder
    "q_vocab_coverage"        -> 1, // ≤64-row ⌊log2 freq⌋ class offsets
    "q_zipf_fit"              -> 1, // topV ≤ 200 TakeOrdered head
    "q_dd_quantiles"          -> 1, // ≤63·16+1-row sketch histogram (Sketches.scala)
    "q_ks_drift"              -> 1, // |distinct value| domain (signalAuc's bound)
    "q_kaplan_meier"          -> 2, // |days| duration grid (calendar bound)
    "q_sen_slope"             -> 1, // ≤|days|²/2 slope list (calendar bound)
    "q_ewma_chart"            -> 1, // |days| calendar grid rank index
    "q_spearman_rho"          -> 2, // two |distinct value| rank domains (signalAuc's bound)
    "q_fpr_threshold"         -> 1, // |distinct score| domain (signalAuc's bound)
    "q_quantile_normalize"    -> 1) // corpus-cum over the ≤1009-row sketch histogram

  private def unpartitionedWindows(p: SparkPlan): Seq[WindowExec] = {
    val tree = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    tree.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
  }

  test("no analytic query carries an unlisted unpartitioned window") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => skip.exists(n.contains))
    val offenders = names.flatMap { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      val ws = unpartitionedWindows(df.queryExecution.executedPlan)
      val cap = allowed.getOrElse(n, 0)
      if (ws.size > cap)
        Some(s"$n: ${ws.size} unpartitioned window(s) (allowed $cap)")
      else None
    }
    assert(offenders.isEmpty,
      "unpartitioned windows on analytic paths:\n" + offenders.mkString("\n"))
  }

  // The |distinct value| allowlist entries above hold ONLY because the
  // engine's signals are discrete (micro-quantized integers). A continuous
  // double signal would make |distinct| ≈ N and collapse those windows to
  // one partition at scale — the boundary guard must reject it LOUDLY.
  test("continuous double signals are rejected at the window-family boundary") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 100).select(col("id"),
      (col("id") % 2).cast("int").as("label"),
      (col("id").cast("double") / 7.0).as("score"))
    def rejects(body: => Any): Unit = {
      val e = intercept[IllegalArgumentException](body)
      assert(e.getMessage.contains("Micro-quantize"), e.getMessage)
    }
    rejects(graft.ops.Evaluation.signalAuc(df, "label", "score"))
    rejects(graft.ops.Evaluation.signalAucByGroup(df, "label", "label", "score"))
    rejects(graft.ops.Evaluation.fprThreshold(df, "label", "score", 100000L))
    rejects(graft.ops.Evaluation.spearmanRho(df, "id", "score"))
    rejects(graft.ops.Maintenance.ksValueCounts(df, col("score")))
    // the quantized form passes the boundary
    val q = df.withColumn("score", floor(col("score") * 1e6).cast("long"))
    assert(graft.ops.Evaluation.signalAuc(q, "label", "score").count() == 1L)
  }
}
