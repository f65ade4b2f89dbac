package graft

import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.functions.TextFns
import graft.ops.{ApproxDedup, Corpus}
import graft.sync.SyncEngine

/** Round-5 operators: URL curation, corpus line dedup, sequence packing,
  * tf·idf terms, and incremental index maintenance. */
class UrlFnsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(url: String): String =
    Seq(url).toDF("u").select(TextFns.normalizeUrl($"u")).head().getString(0)

  test("normalizeUrl strips fragment, default ports, trailing slash; lowercases authority only") {
    assert(norm("HTTP://WWW.Example.COM:80/Path/To/X/#frag") ==
      "http://www.example.com/Path/To/X")
    assert(norm("https://Blog.Example.com:443/a?Q=Mixed") ==
      "https://blog.example.com/a?Q=Mixed")
    // non-default port survives; https:80 is NOT a default pairing
    assert(norm("http://h.example.com:8080/x") == "http://h.example.com:8080/x")
    assert(norm("https://h.example.com:80/x") == "https://h.example.com:80/x")
    // bare authority; root path collapses to the authority
    assert(norm("http://Example.com/") == "http://example.com")
    // no scheme: nothing to lowercase, fragment/slash rules still apply
    assert(norm("Example.com/Path/#f") == "Example.com/Path")
  }

  test("registrableDomain: eTLD+1 with second-level suffixes") {
    val r = Seq("www.news.example.com", "a.b.site.co.uk", "localhost", "x.io")
      .toDF("h").select(TextFns.registrableDomain($"h")).as[String].collect()
    assert(r.toSeq == Seq("example.com", "site.co.uk", "localhost", "x.io"))
  }
}

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dedupLines keeps first occurrence, exempts short lines, empties fully-duplicated docs") {
    val docs = Seq(
      (1L, "unique alpha line one\nshared boilerplate sentence\nok"),
      (2L, "unique beta line two\nshared boilerplate sentence\nok"),
      (3L, "shared boilerplate sentence")
    ).toDF("doc_id", "text")
    val r = Corpus.dedupLines(docs, "doc_id", "text", minLineLength = 10)
      .orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect()
    // doc 1 is first: keeps everything
    assert(r(0) == ((1L, "unique alpha line one\nshared boilerplate sentence\nok", 3L, 0L)))
    // doc 2 loses the shared line, keeps the short "ok"
    assert(r(1) == ((2L, "unique beta line two\nok", 2L, 1L)))
    // doc 3 was ONLY the shared line -> emptied, still present
    assert(r(2) == ((3L, "", 0L, 1L)))
  }

  test("packChunks lays out cumulative offsets and chunk spans per bucket") {
    // one bucket => one global layout ordered by id; budget 10
    val docs = Seq(
      (1L, "a b c d"),           // 4 tokens, offset 0,  chunk 0
      (2L, "e f g h i j k l"),   // 8 tokens, offset 4,  chunks 0-1 (spans)
      (3L, "m n"),               // 2 tokens, offset 12, chunk 1
      (4L, "o p q r s t u v w x")// 10 tokens, offset 14, chunks 1-2
    ).toDF("doc_id", "text")
    val r = Corpus.packChunks(docs, "doc_id", "text", tokenBudget = 10, buckets = 1)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"start_offset", $"chunk_id", $"n_chunks")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq(
      (1L, 4L, 0L, 0L, 1L),
      (2L, 8L, 4L, 0L, 2L),
      (3L, 2L, 12L, 1L, 1L),
      (4L, 10L, 14L, 1L, 2L)))
  }

  test("packChunks buckets are independent and append-stable") {
    val docs = (1L to 40L).map(i => (i, "w " * (i % 7 + 1).toInt)).toDF("doc_id", "text")
    val before = Corpus.packChunks(docs, "doc_id", "text", 16, buckets = 4)
      .select("doc_id", "bucket", "start_offset").as[(Long, Long, Long)].collect().toSet
    // appending docs only extends each bucket's tail: existing offsets keep
    // their values when the new ids sort after the old ones within buckets
    val more = (1L to 80L).map(i => (i, "w " * (i % 7 + 1).toInt)).toDF("doc_id", "text")
    val after = Corpus.packChunks(more, "doc_id", "text", 16, buckets = 4)
      .where($"doc_id" <= 40).select("doc_id", "bucket", "start_offset")
      .as[(Long, Long, Long)].collect().toSet
    // ids 41-80 shuffle into the same buckets AFTER the low ids, so the
    // low-id layout is unchanged
    assert(before == after)
  }

  test("tfidfTopTerms ranks rare terms above common ones, ties by token") {
    val docs = Seq(
      (1L, "zebra common common"),
      (2L, "common common apple"),
      (3L, "common banana banana")
    ).toDF("doc_id", "text")
    val r = Corpus.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"rank")
      .select($"doc_id", $"rank", $"token").as[(Long, Long, String)].collect()
    // df: common=3, zebra=1, apple=1, banana=1
    // doc1: zebra 1/1=1.0 > common 2/3; doc3: banana 2/1=2.0 > common
    assert(r.toSeq == Seq(
      (1L, 1L, "zebra"), (1L, 2L, "common"),
      (2L, 1L, "apple"), (2L, 2L, "common"),
      (3L, 1L, "banana"), (3L, 2L, "common")))
  }

  test("keepOnePerKey matches the window rank under a total order, with no Window node") {
    import graft.ops.Dedup
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id", $"ts", $"event_id", $"value")
    // (ts, event_id) is a total order per user, so both forms agree exactly
    val viaWindow = Dedup.keepLatest(ev, Seq("user_id"), Seq("ts", "event_id"))
      .collect().map(_.toSeq).toSet
    val viaAgg = Dedup.keepOnePerKey(ev, Seq("user_id"), Seq("ts", "event_id"))
    assert(viaAgg.collect().map(_.toSeq).toSet == viaWindow)
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected hash-agg plan, got:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("dupNgramStats covers duplicated spans, interval-unions overlaps") {
    val docs = Seq(
      (1L, "a b c d e x y z"),   // "a b c" also in doc 2 -> 3 covered
      (2L, "a b c d q r s t"),   // "a b c" + "b c d" overlap -> 4 covered
      (3L, "u v w p q m n o")    // nothing duplicated
    ).toDF("doc_id", "text")
    val r = graft.ops.ApproxDedup.dupNgramStats(docs, "doc_id", "text", n = 3)
      .orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"covered_tokens")
      .as[(Long, Long, Long)].collect()
    // doc1: grams abc,bcd,cde,dex,exy,xyz; duplicated across corpus: abc,bcd
    //   -> covered positions 0..3 = 4
    // doc2: abc,bcd duplicated -> positions 0..3 = 4
    assert(r.toSeq == Seq((1L, 8L, 4L), (2L, 8L, 4L), (3L, 8L, 0L)))
  }

  test("nearDupClusters: min-label propagation finds components across chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("id1", "id2")
    val r = graft.ops.ApproxDedup.nearDupClusters(pairs)
      .orderBy($"doc_id").as[(Long, Long)].collect()
    // {1,2,3,9} chain -> label 1; {5,6} -> label 5
    assert(r.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (9L, 1L)))
  }

  test("plan shapes: no cross products anywhere; packChunks shuffles once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pack = Corpus.packChunks(docs, "doc_id", "text", 2048, buckets = 8)
    val packPlan = pack.queryExecution.executedPlan.toString
    assert(packPlan.sliding("Exchange".length).count(_ == "Exchange") == 1,
      s"expected exactly one shuffle in:\n$packPlan")
    for ((name, df) <- Seq(
        "dedupLines" -> Corpus.dedupLines(docs, "doc_id", "text"),
        "tfidf"      -> Corpus.tfidfTopTerms(docs, "doc_id", "text", 3),
        "dupNgram"   -> graft.ops.ApproxDedup.dupNgramStats(docs, "doc_id", "text", 5))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name plans a cross product:\n$p")
    }
  }

  test("blind-synced band index equals a full-rebuild index") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def index(df: org.apache.spark.sql.DataFrame) = ApproxDedup.minhashBandIndex(
      df, "doc_id", "text", shingleSize = 3, k = 24, bands = 12, buckets = 4)
    val eng = new SyncEngine(spark, tmpDir())
    val spec = PipeSpec(PipeKeys("ann", "mh_inc"),
      columns = ColumnRoles(Map("datetime" -> "bucket", "id" -> "doc_id")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    eng.sync(spec, index(docs.where($"doc_id" % 2 === 0)), checkExisting = false)
    eng.sync(spec, index(docs.where($"doc_id" % 2 === 1)), checkExisting = false)
    val stored = eng.getData(spec)
      .select("doc_id", "band", "bandHash", "bucket")
      .collect().map(_.toSeq).toSet
    val full = index(docs).select("doc_id", "band", "bandHash", "bucket")
      .collect().map(_.toSeq).toSet
    assert(stored == full)
  }
}
