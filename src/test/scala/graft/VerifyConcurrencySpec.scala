package graft

import org.apache.spark.sql.functions._

/** SPARK_GRAFT_VERIFY_THREADS contention (r13 verdict item 7): the
  * concurrent Verify harness claims per-query isolation — each query on
  * its own `spark.newSession()` (private SQLConf + temp-view namespace),
  * storage sweeps only at batch barriers. This spec pins it executionally:
  * the same 12-query subset runs TWICE through [[Verify.runAll]] at k=6
  * and the parquet outputs must be row-identical. A session-scoped
  * mutation leaking across threads (shuffle-partition overrides, temp
  * views, timezone) would make some query's output depend on which
  * neighbors shared its batch — exactly what identical re-runs catch,
  * because the two runs batch the same names but interleave differently.
  */
class VerifyConcurrencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // a mixed subset: plain scans/aggs, session-mutating queries
  // (withStatePartitions / temp views), window ops, text ops
  private val names = Seq(
    "q_get_data", "q_topk", "q_distinct_count", "q_params_dsl",
    "q_round_time", "q_doc_stats", "q_char_entropy", "q_langid",
    "q_url_domains", "q_dedup_exact_docs", "q_histogram",
    "q_quality_percentile")

  test("12-query subset at k=6 twice → identical parquet outputs") {
    val selected = SparkEntry.queries.view
      .filterKeys(names.toSet).toMap
    assert(selected.size == names.size,
      s"missing queries: ${names.toSet -- selected.keySet}")
    val root = java.nio.file.Files.createTempDirectory("graft_vconc").toString
    val (ok1, fail1) = Verify.runAll(spark, sf, s"$root/a", selected, k = 6)
    val (ok2, fail2) = Verify.runAll(spark, sf, s"$root/b", selected, k = 6)
    assert(ok1 == names.size && fail1 == 0, s"run A: $ok1 ok, $fail1 failed")
    assert(ok2 == names.size && fail2 == 0, s"run B: $ok2 ok, $fail2 failed")
    names.foreach { n =>
      val a = spark.read.parquet(s"$root/a/$n")
      val b = spark.read.parquet(s"$root/b/$n")
      assert(a.schema == b.schema, s"$n: schema drifted between runs")
      val cols = a.columns.sorted.map(col).toSeq
      val rowsA = a.select(cols: _*).collect().map(_.toString).sorted.toSeq
      val rowsB = b.select(cols: _*).collect().map(_.toString).sorted.toSeq
      assert(rowsA == rowsB, s"$n: rows drifted between concurrent runs")
    }
  }
}
