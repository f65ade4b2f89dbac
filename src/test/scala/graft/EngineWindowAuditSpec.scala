package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.GraftTestBus
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.util.QueryExecutionListener

/** The [[GlobalWindowAuditSpec]] gate extended to the families it skips
  * (r8 verdict carry): e2e syncs, streaming foreachBatch bodies, stored
  * index builds — entries whose plans only exist at RUN time. A
  * QueryExecutionListener captures every execution the entry triggers
  * (client side, server side, and each microbatch's inner actions — the
  * PipeServer shares the session, so its jobs land here too), and the
  * same rule applies: no unpartitioned `WindowExec` anywhere unless the
  * query is allowlisted with a documented bound.
  */
class EngineWindowAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // the EXACT complement of GlobalWindowAuditSpec's audit set
  private val engineFamilies = Seq(
    "_e2e", "streaming", "index_sync", "_stored", "stored_", "data_card_sync",
    "semantic_dedup_sync", "q_fleet_sync", "q_pipe_dag", "q_schedule_fires",
    "q_copy_pipe", "q_verify_", "q_compact_roundtrip", "q_repartition_op",
    "q_clear_range", "q_jdbc", "q_api_", "q_valkey", "q_registry_search",
    "q_deduplicate_pipe", "q_get_data", "q_get_docs", "q_sync_",
    "q_backtrack_window", "q_join_fetch", "q_autoincrement", "q_autotime",
    "q_infer_special", "q_ingest_lines", "q_union_chunks", "q_rowcount",
    "q_dt_bounds", "q_zorder_values", "q_bpe_stored_apply")

  /** name → max allowed unpartitioned WindowExecs ACROSS every execution
    * the entry triggers, each justified by a bounded-by-construction
    * input. Anything new must be added here with its bound. */
  private val allowed: Map[String, Int] = Map(
    // the quantile probe's cumulative window runs on the ≤ 63·16+1-row
    // sketch histogram (Sketches.scala ddQuantiles) — never on data
    "q_dd_index_sync"      -> 1,
    "q_streaming_dd_probe" -> 1,
    // the KS cumulative window runs on the bounded distinct-value grid
    // (the q_ks_drift/signalAuc bound) — never on data
    "q_ks_drift_stored"    -> 1)

  private def unpartitionedWindows(p: SparkPlan): Seq[WindowExec] = {
    val tree = p match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other                    => other
    }
    tree.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
  }

  test("engine-driven queries trigger no unlisted unpartitioned window in ANY execution") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[SparkPlan]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        captured.add(qe.executedPlan); ()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => engineFamilies.exists(n.contains))
    assert(names.size > 50, s"family filter broke: only ${names.size} entries")
    spark.listenerManager.register(listener)
    val offenders =
      try names.flatMap { n =>
        captured.clear()
        SparkEntry.queries(n)(spark, sf).count()
        GraftTestBus.waitUntilListenerBusEmpty(spark.sparkContext)
        val ws = captured.asScala.toSeq.flatMap(unpartitionedWindows)
        // per-query isolation, mirroring Bench: e2e entries cache/checkpoint
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        val cap = allowed.getOrElse(n, 0)
        if (ws.size > cap)
          Some(s"$n: ${ws.size} unpartitioned window(s) across its executions (allowed $cap)")
        else None
      } finally spark.listenerManager.unregister(listener)
    assert(offenders.isEmpty,
      "unpartitioned windows on engine-driven paths:\n" + offenders.mkString("\n"))
  }
}
