package graft

import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.CappedLongList
import graft.ops.ApproxDedup

/** The hot-key memory bound of [[CappedLongList]] — the aggregation buffer
  * itself must never hold more than cap+1 elements, no matter how many
  * rows a skewed key feeds it (the round-8 `containmentPairs` rewrite
  * materialized the FULL list before its size filter: an executor-OOM
  * hazard on corpus-boilerplate shingles at 100 TB). */
class CappedAggSpec extends SparkSpec {
  import spark.implicits._

  test("buffer stops at cap+1 under 10k single-key updates (map-side bound)") {
    val agg = CappedLongList(BoundReference(0, LongType, nullable = false), cap = 20)
    val buf = agg.createAggregationBuffer()
    (1L to 10000L).foreach(v => agg.update(buf, InternalRow(v)))
    assert(buf.length == 21) // cap+1 sentinel, not 10000
    // merge of two full buffers stays at the sentinel length too
    val other = agg.createAggregationBuffer()
    (1L to 10000L).foreach(v => agg.update(other, InternalRow(v)))
    assert(agg.merge(buf, other).length == 21)
    // partially-full merge caps at exactly cap+1, never beyond
    val a = agg.createAggregationBuffer()
    (1L to 19L).foreach(v => agg.update(a, InternalRow(v)))
    assert(agg.merge(a, other).length == 21)
    // serialize/deserialize round-trips the truncated state (spill path)
    assert(agg.deserialize(agg.serialize(buf)) == buf)
  }

  test("DataFrame aggregation: skewed key emits exactly cap+1 ids, others in full") {
    val rows = (1L to 500L).map(i => ("hot", i)) ++ (1L to 3L).map(i => ("cold", i))
    val cappedIds = GraftColumnBridge.column(
      CappedLongList(GraftColumnBridge.expression(col("id")), cap = 5)
        .toAggregateExpression())
    val got = rows.toDF("k", "id").groupBy("k").agg(cappedIds.as("ids"))
      .select(col("k"), size(col("ids")).as("n"))
      .as[(String, Int)].collect().toMap
    assert(got("hot") == 6)  // truncated to the cap+1 sentinel
    assert(got("cold") == 3) // under-cap groups are untouched
  }

  test("containmentPairs: a shingle present in EVERY doc neither OOMs nor pairs") {
    // 60 docs share one ubiquitous trigram; otherwise pairwise-disjoint.
    // With cap=4 the hot shingle must drop (as boilerplate) and, because
    // the accumulation is capped, must never have materialized 60 ids.
    val docs = (1L to 60L).map(i =>
      i -> s"terms of service uq${i}a uq${i}b uq${i}c uq${i}d uq${i}e").toDF("id", "text")
    val got = ApproxDedup.containmentPairs(docs, "id", "text",
      n = 3, thresholdMicro = 1L, maxDocsPerShingle = 4).collect()
    assert(got.isEmpty)
  }

  test("containmentPairs: capped aggregation ≡ count-prune-then-join semantics") {
    // Mixed corpus: excerpts fully contained in parents PLUS a boilerplate
    // trigram in every doc. The capped one-pass form must equal the
    // reference two-pass formulation (count-filter shingles, then join).
    val base = (1L to 12L).map(i =>
      i -> s"shared boiler plate alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
    val excerpts = (1L to 12L).filter(_ % 3 == 0).map(i =>
      (i + 100L) -> s"alpha$i beta$i gamma$i delta$i epsilon$i")
    val docs = (base ++ excerpts).toDF("id", "text")

    val got = ApproxDedup.containmentPairs(docs, "id", "text",
        n = 3, thresholdMicro = 500000L, maxDocsPerShingle = 4)
      .as[(Long, Long, Long)].collect().toSet

    // reference formulation: explicit count prune BEFORE any list building
    val sh = docs.select(col("id"),
        explode(array_distinct(
          graft.functions.TextFns.wordShingles(lower(col("text")), 3))).as("s"))
      .select(col("id"), graft.functions.TextFns.md5Long60(col("s")).as("h"))
    val rare = sh.groupBy("h").agg(count(lit(1)).as("c")).where(col("c") <= 4)
      .select("h")
    val p = sh.join(rare, "h")
    val sz = p.groupBy(col("id").as("id1")).agg(count(lit(1)).as("sz"))
    val inter = p.as("a").join(p.as("b"),
        col("a.h") === col("b.h") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    val want = inter.join(sz, "id1")
      .withColumn("cm", expr("inter * 1000000L div sz"))
      .where(col("cm") >= 500000L)
      .select(col("id1"), col("id2"), col("cm"))
      .as[(Long, Long, Long)].collect().toSet

    assert(got == want && got.nonEmpty)
  }
}
