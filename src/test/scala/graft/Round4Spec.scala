package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFns}
import graft.ops.{Corpus, Relational, Sampling}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = LocalDateTime.parse(s)

  // trades/quotes classic: one key with interleaved times, ties, and a
  // key that has trades before any quote
  private lazy val trades = Seq(
    (1L, "a", t("2024-01-01T00:00:30"), 10.0),
    (2L, "a", t("2024-01-01T00:02:00"), 20.0),
    (3L, "a", t("2024-01-01T00:03:00"), 30.0), // exactly at quote 13
    (4L, "b", t("2024-01-01T00:00:10"), 40.0)  // before any b quote
  ).toDF("trade_id", "sym", "ts", "px")

  private lazy val quotes = Seq(
    (11L, "a", t("2024-01-01T00:00:00"), 1.0),
    (12L, "a", t("2024-01-01T00:01:00"), 2.0),
    (120L, "a", t("2024-01-01T00:01:00"), 2.5), // tie: higher id wins
    (13L, "a", t("2024-01-01T00:03:00"), 3.0),
    (14L, "b", t("2024-01-01T00:05:00"), 4.0)
  ).toDF("quote_id", "sym", "ts", "bid")

  test("asofJoin: latest preceding quote per trade, ties by rightOrder, null when none") {
    val r = Relational.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
        rightPayload = Seq("quote_id", "bid"), rightOrder = Seq("quote_id"))
      .orderBy("trade_id")
      .select("trade_id", "quote_id", "bid")
      .collect()
    assert(r(0).getLong(1) == 11L && r(0).getDouble(2) == 1.0)
    assert(r(1).getLong(1) == 120L && r(1).getDouble(2) == 2.5) // tie-break
    assert(r(2).getLong(1) == 13L)                              // inclusive <=
    assert(r(3).isNullAt(1) && r(3).isNullAt(2))                // no match
  }

  test("asofJoin strict: a quote at exactly the trade time is NOT visible") {
    val r = Relational.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
        rightPayload = Seq("quote_id"), rightOrder = Seq("quote_id"),
        inclusive = false)
      .orderBy("trade_id").select("trade_id", "quote_id").collect()
    assert(r(2).getLong(1) == 120L) // falls back to the 00:01 tie winner
  }

  test("asofJoin plans as window over one exchange — no join node, no cross product") {
    val plan = Relational.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
      rightPayload = Seq("quote_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join in:\n$plan")
    assert(plan.contains("Window"))
  }

  test("sessionBounds matches Spark's built-in session_window aggregation") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val ours = Relational.sessionBounds(ev, "user_id", "ts",
        gapSeconds = 14400, tiebreak = Seq("event_id"))
      .select($"user_id", $"session_start", $"n_events")
      .orderBy($"user_id", $"session_start")
      .collect()
    // built-in session_window: gap-merged windows per key; end = last+gap,
    // so compare (key, start, count) which both definitions share
    val builtin = ev.groupBy(col("user_id"), session_window(col("ts"), "4 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window.start".as("session_start"), $"n_events")
      .orderBy($"user_id", $"session_start")
      .collect()
    assert(ours.length == builtin.length)
    ours.zip(builtin).foreach { case (a, b) => assert(a == b) }
  }

  test("pointInIntervalJoin equals the naive inequality join, without the nested loop") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val sessions = Relational.sessionBounds(
        ev.where(col("user_id") === 3), "user_id", "ts", 14400, Seq("event_id"))
      .drop("user_id")
    val pts = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("ts").as("pt"))
    val bucketed = Relational.pointInIntervalJoin(sessions, pts,
      "session_start", "session_end", "pt", bucketWidthUs = 3600L * 1000000)
    val naive = sessions.join(pts,
      col("pt") >= col("session_start") && col("pt") <= col("session_end"))
    val a = bucketed.select("session_idx", "event_id").orderBy("session_idx", "event_id").collect()
    val b = naive.select("session_idx", "event_id").orderBy("session_idx", "event_id").collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop survived:\n$plan")
    // openEnd excludes points exactly at the interval end
    val open = Relational.pointInIntervalJoin(sessions, pts,
      "session_start", "session_end", "pt", 3600L * 1000000, openEnd = true)
    assert(open.count() <= a.length)
  }

  test("sessionize gap boundary: exactly `gap` apart stays in one session") {
    val df = Seq(
      (1L, t("2024-01-01T00:00:00")),
      (2L, t("2024-01-01T04:00:00")),  // == gap → same session
      (3L, t("2024-01-01T08:00:01"))   // > gap → new session
    ).toDF("id", "ts").withColumn("k", lit("u"))
    val r = Relational.sessionize(df, "k", "ts", 14400, Seq("id"))
      .select($"id", $"session_idx").orderBy($"id").as[(Long, Long)].collect()
    assert(r.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }
}

class ClusteredWriteSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import graft.sync.SyncEngine

  test("syncTime bookmark prunes to the extreme chunk and orders epoch labels numerically") {
    import spark.implicits._
    val eng = new SyncEngine(spark, tmpDir())
    // epoch-minute axis, one chunk per minute: labels ... "9", "10" — a
    // lexicographic max would pick chunk "9" and report 599, not 659
    val spec = PipeSpec(PipeKeys("probe", "epochbm"),
      columns = ColumnRoles(Map("datetime" -> "ts", "primary" -> "id")),
      epochUnit = Some("second"), chunkMinutes = 1)
    val rows = (540L to 659L).map(t => (t, t)).toDF("id", "ts")
    eng.sync(spec, rows)
    assert(eng.storage(spec).syncTimeEpoch(newest = true).contains(659L))
    assert(eng.storage(spec).syncTimeEpoch(newest = false).contains(540L))
    // timestamp axis: bookmark equals the true max across many daily chunks
    val tspec = PipeSpec(PipeKeys("probe", "tsbm"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")),
      chunkMinutes = 1440)
    val tdf = (0L until 40L).map(i => (i, s"2024-01-${1 + i % 20}".padTo(10, ' ').trim))
      .toDF("id", "d")
      .select(col("id"), concat(col("d"), lit(" 12:00:00")).cast("timestamp_ntz").as("dt"))
    eng.sync(tspec, tdf)
    assert(eng.storage(tspec).syncTime(newest = true)
      .contains(java.time.LocalDateTime.parse("2024-01-20T12:00:00")))
  }

  test("verify boundDays: damage outside the bound is ignored, inside is repaired") {
    import spark.implicits._
    val eng = new SyncEngine(spark, tmpDir(),
      clock = () => java.time.LocalDateTime.parse("2024-01-20T00:00:00"))
    val spec = PipeSpec(PipeKeys("probe", "vbound"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")))
    val src = (0L until 200L).map(i => (i, s"2024-01-${1 + (i % 20).toInt}T06:00:00", 1.0))
      .toDF("id", "dt", "v")
      .select(col("id"), col("dt").cast("timestamp_ntz").as("dt"), col("v"))
    eng.sync(spec, src)
    // corrupt one old day (Jan 2, outside the 10-day bound) and one recent
    // day (Jan 15, inside) without changing counts
    val store = eng.storage(spec)
    def corrupt(day: Int) = store.upsert(
      src.where(col("dt") === lit(java.time.LocalDateTime.parse(f"2024-01-$day%02dT06:00:00")))
        .withColumn("v", lit(99.0)), Seq("id"))
    corrupt(2); corrupt(15)
    val r = graft.ops.Maintenance.verify(eng, spec, src,
      windowMinutes = Some(1440), boundDays = Some(10))
    assert(r.chunksMismatched == 1) // only the in-bound day
    val out = eng.getData(spec).where(col("v") === 99.0)
      .select(col("dt")).distinct().collect().map(_.getAs[java.time.LocalDateTime](0))
    // Jan 15 repaired, Jan 2 damage deliberately out of scope
    assert(out.toSeq == Seq(java.time.LocalDateTime.parse("2024-01-02T06:00:00")))
  }

  test("repartition rewrites storage under an edited chunk width; bounded reads stay correct") {
    import spark.implicits._
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    def spec(mins: Long) = PipeSpec(PipeKeys("probe", "repart"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")),
      chunkMinutes = mins)
    val df = (0L until 240L).map(i => (i, s"2024-01-${1 + (i % 10).toInt}T0${(i % 5).toInt}:00:00"))
      .toDF("id", "dt")
      .select(col("id"), col("dt").cast("timestamp_ntz").as("dt"))
    eng.sync(spec(1440), df) // daily chunks
    val base = new java.io.File(s"$root/${spec(1440).targetName}/data")
    assert(base.listFiles().count(_.getName.startsWith("__graft_chunk=")) == 10)
    // the spec's chunk width is EDITED to monthly: labels on disk are now
    // wrong for the new width until repartition rewrites them
    val monthly = spec(43200)
    assert(graft.ops.Maintenance.repartition(eng, monthly) == 240L)
    assert(base.listFiles().filter(_.getName.startsWith("__graft_chunk="))
      .map(_.getName).toSeq == Seq("__graft_chunk=2024-01"))
    val bounded = eng.getData(monthly,
      begin = Some(java.time.LocalDateTime.parse("2024-01-03T00:00:00")),
      end   = Some(java.time.LocalDateTime.parse("2024-01-05T00:00:00")))
    assert(bounded.count() == 48) // 2 of 10 days, 24 rows/day
  }

  test("keyless-pipe upsert/clear rewrite only the segments they touch") {
    import spark.implicits._
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    // no datetime role → manifest-of-segments layout
    val spec = PipeSpec(PipeKeys("probe", "segprune"),
      columns = ColumnRoles(Map("id" -> "id")))
    val store = eng.storage(spec)
    store.create(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))          // seg_0
    store.append(Seq((3L, "c"), (4L, "d")).toDF("id", "v"))          // seg_1
    store.append(Seq((5L, "e"), (6L, "f")).toDF("id", "v"))          // seg_2
    def segFiles(seg: String): Set[String] = {
      val d = new java.io.File(s"$root/${spec.targetName}/$seg")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet
    }
    val s0 = segFiles("seg_0"); val s2 = segFiles("seg_2")
    assert(s0.nonEmpty && s2.nonEmpty)
    // patch touches only id=3 (seg_1): seg_0 and seg_2 must carry over
    store.upsert(Seq((3L, "C"), (9L, "i")).toDF("id", "v"), Seq("id"))
    assert(segFiles("seg_0") == s0 && segFiles("seg_2") == s2)
    val after = eng.getData(spec).orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(after == Seq((1L, "a"), (2L, "b"), (3L, "C"), (4L, "d"),
                        (5L, "e"), (6L, "f"), (9L, "i")))
    // clear rows living only in seg_0: seg_2 files still untouched
    store.clear(col("id") <= 2L)
    assert(segFiles("seg_2") == s2)
    assert(eng.getData(spec).count() == 5)
    // clearing everything leaves a readable (0-row) snapshot
    store.clear(lit(true))
    assert(eng.getData(spec).count() == 0)
  }

  test("wide-span create clusters: one file per chunk, not tasks x chunks") {
    import spark.implicits._
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("probe", "clustered"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")),
      chunkMinutes = 1440) // daily chunks
    // 30 days x 40 rows, scattered across 4 parent partitions so an
    // unclustered write would shard every chunk dir 4 ways
    val df = (0L until 1200L).map(i => (i, i % 30)).toDF("id", "day")
      .repartition(4, col("id"))
      .select(col("id"),
        (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("timestamp_ntz")
          + expr("make_interval(0, 0, 0, cast(day as int), 0, 0, 0)")).as("dt"))
    eng.sync(spec, df) // span 30 chunks >= 4 -> clustered create
    val base = new java.io.File(s"$root/${spec.targetName}/data")
    val chunkDirs = base.listFiles().filter(_.getName.startsWith("__graft_chunk="))
    assert(chunkDirs.length == 30)
    chunkDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName} has $files files — write did not cluster")
    }
    assert(eng.getData(spec).count() == 1200)
  }
}

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("vocabTopK counts and orders tokens") {
    val docs = Seq("b a a", "a b", "c").toDF("text")
    val r = Corpus.vocabTopK(docs, "text", 2).as[(String, Long)].collect()
    assert(r.toSeq == Seq(("a", 3L), ("b", 2L)))
  }

  test("decontaminate flags corpus docs containing a benchmark's shingles") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // contains bench 10 fully
      (2L, "unrelated words entirely different here"),
      (10L, "alpha beta gamma delta")                 // the bench doc itself
    ).toDF("doc_id", "text")
    val bench = corpus.where($"doc_id" === 10L)
    val r = Corpus.decontaminate(corpus, bench, "doc_id", "text",
      shingleSize = 3, threshold = 0.5).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 10L &&
           r(0).getDouble(2) == 1.0)
  }

  test("winnowing guarantee: a shared run of length >= w+k-1 shares a fingerprint") {
    val shared = "zqxwvutsrqp" // 11 chars = w+k-1 with k=8, w=4
    val docs = Seq(
      (1L, s"prefix one $shared suffix aa"),
      (2L, s"completely other ${shared} tail bb")).toDF("doc_id", "text")
    val fps = Corpus.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
    val common = fps.where($"doc_id" === 1L).select("fp")
      .intersect(fps.where($"doc_id" === 2L).select("fp"))
    assert(common.count() >= 1)
  }

  test("native winnow kernel is bit-identical to the composed HOF form on real docs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Corpus.winnowFingerprints(docs, "doc_id", "text", 8, 4)
      .orderBy("doc_id", "fp").collect()
    val b = Corpus.winnowFingerprintsComposed(docs, "doc_id", "text", 8, 4)
      .orderBy("doc_id", "fp").collect()
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("winnowFingerprints is a pure projection — no exchange in the plan") {
    val docs = Seq((1L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val plan = Corpus.winnowFingerprints(docs, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("stratifiedPredicate: rate-0 stratum drops all, rate-100 keeps all, deterministic") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    val kept = df.where(Sampling.stratifiedPredicate($"id", $"lang",
      Seq("en" -> 0), defaultRate = 100))
    assert(kept.where($"lang" === "en").count() == 0)
    assert(kept.where($"lang" === "fr").count() == 500)
    val partial = df.where(Sampling.stratifiedPredicate($"id", $"lang",
      Seq("en" -> 30), defaultRate = 100))
    val c1 = partial.count(); val c2 = partial.count()
    assert(c1 == c2 && c1 > 500 && c1 < 1000)
  }

  test("special-column inference detects datetime/date/bool/numeric shapes") {
    import graft.types.MrsmType._
    val df = Seq(
      ("2024-01-02T03:04:05", "2024-01-02", "true", "12.5", "1along2"),
      ("2024-06-07 08:09:10.123456", "1999-12-31", "False", "-3e2", "x"))
      .toDF("dt", "d", "b", "n", "s")
    val got = graft.ops.SpecialCols.infer(df)
    assert(got("dt") == MDatetime(tz = false))
    assert(got("d") == MDate)
    assert(got("b") == MBool)
    assert(got("n") == MNumeric())
    assert(!got.contains("s"))
  }

  test("repetitionStats flags phrase-repetition and duplicated sentences") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),      // "buy now"/"now buy" dominate
      (2L, "all words are entirely distinct here"),
      (3L, "same thing. same thing. other thing.")) // duplicate sentence
      .toDF("doc_id", "text")
    val r = Corpus.repetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 4L && r(0).getDouble(2) == 4.0 / 7.0)
    assert(r(1).getLong(1) == 1L)             // no repeated bigram
    assert(r(2).getDouble(3) == 2.0 / 3.0)    // 2 distinct of 3 sentences
    assert(r(1).getDouble(3) == 1.0)
  }

  test("GPKG blobs round-trip: header parsed, SRID read, WKB payload intact") {
    import graft.types.GeoWkb
    val wkb  = GeoWkb.wktToWkb("POINT (3.5 -7.25)")
    val gpkg = GeoWkb.wkbToGpkg(wkb, srid = 3857)
    assert(GeoWkb.isGpkg(gpkg) && !GeoWkb.isGpkg(wkb))
    assert(GeoWkb.gpkgSrid(gpkg).contains(3857))
    assert(GeoWkb.gpkgToWkb(gpkg).toSeq == wkb.toSeq)
    assert(GeoWkb.gpkgToWkb(wkb) eq wkb) // pass-through
    assert(GeoWkb.wkbToWkt(GeoWkb.gpkgToWkb(gpkg)) == "POINT (3.5 -7.25)")
    // envelope variant: XY envelope (code 1) skips 32 extra bytes
    val withEnv = {
      val bb = java.nio.ByteBuffer.allocate(8 + 32 + wkb.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('G'.toByte).put('P'.toByte).put(0.toByte).put((0x01 | 0x02).toByte)
      bb.putInt(4326)
      (0 until 4).foreach(_ => bb.putDouble(0.0))
      bb.put(wkb); bb.array()
    }
    assert(GeoWkb.gpkgToWkb(withEnv).toSeq == wkb.toSeq)
  }

  test("redactPii scrubs emails and phones, leaves short numbers") {
    val r = Seq("mail a.b+c@ex-1.org or +49 30 1234567 or room 42")
      .toDF("t").select(TextFns.redactPii($"t")).head.getString(0)
    assert(r == "mail <EMAIL> or <PHONE> or room 42")
  }
}

class FleetSyncSpec extends SparkSpec {
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import graft.sources.{FnSource, Source, StressSource}
  import graft.sync.SyncEngine

  test("blind sync (check_existing=false) appends without reading the diff") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val eng = new SyncEngine(spark, tmpDir())
    val spec = PipeSpec(PipeKeys("blind", "events"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")))
    def b(rows: (Long, String)*) = rows.toSeq.toDF("id", "dt")
      .withColumn("dt", col("dt").cast("timestamp_ntz"))
    assert(eng.sync(spec, b((1L, "2024-01-01T00:00:00"), (2L, "2024-01-02T00:00:00")),
      checkExisting = false).inserted == 2)
    // redelivery is NOT deduplicated — the documented blind-mode contract
    val r = eng.sync(spec, b((2L, "2024-01-02T00:00:00"), (3L, "2024-01-03T00:00:00")),
      checkExisting = false)
    assert(r.inserted == 2)
    assert(eng.getData(spec).count() == 4)
    // the same redelivery through the normal diff path inserts nothing new
    assert(eng.sync(spec, b((3L, "2024-01-03T00:00:00"))).total == 0)
  }

  test("fleet syncs persist inferred dtypes for every pipe (no lost catalog writes)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val cat  = new graft.catalog.PipeCatalog()
    val path = s"${tmpDir()}/catalog"
    val eng  = new SyncEngine(spark, tmpDir(), catalog = Some(cat),
      catalogPath = Some(path))
    def spec(n: Int) = PipeSpec(PipeKeys("fleetcat", s"p$n"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")))
    def src(n: Int) = new FnSource((s, _, _, _) => {
      import s.implicits._
      (1L to 50L).map(i => (i, s"2024-01-0${1 + (i % 5)}T00:00:00",
          f"00000000-0000-0000-0000-${n}%04d${i}%08d"))
        .toDF("id", "dt", "u")
        .withColumn("dt", col("dt").cast("timestamp_ntz"))
    })
    val jobs: Seq[(PipeSpec, Source)] = (1 to 4).map(n => (spec(n), src(n): Source))
    val res = eng.fetchSyncMany(jobs, workers = 4)
    assert(res.values.forall(_.isRight))
    // every pipe's uuid detection must survive the concurrent register+save
    val back = graft.catalog.PipeCatalogStore.load(spark, path)
    (1 to 4).foreach { n =>
      val dts = back.get(spec(n).keys).map(_.dtypes).getOrElse(Map.empty)
      assert(dts.get("u").contains(graft.types.MrsmType.MUuid), s"pipe p$n lost its dtypes")
    }
  }

  test("fetchSyncMany syncs a fleet concurrently and captures per-pipe failures") {
    val engine = new SyncEngine(spark, tmpDir())
    def spec(n: Int) = PipeSpec(PipeKeys("fleet", s"p$n"),
      columns = ColumnRoles(Map("datetime" -> "datetime", "id" -> "id")))
    val good: Seq[(PipeSpec, Source)] = (1 to 3).map { n =>
      (spec(n), new StressSource(rows = 100, numIds = 2, seed = n): Source) }
    val bad: (PipeSpec, Source) = (spec(9),
      new FnSource((_, _, _, _) => throw new RuntimeException("boom")))
    val res = engine.fetchSyncMany(good :+ bad, workers = 4)
    assert(res.size == 4)
    assert(res("fleet:p9").isLeft &&
      res("fleet:p9").left.toOption.get.getMessage == "boom")
    (1 to 3).foreach { n =>
      assert(res(s"fleet:p$n").toOption.get.total == 100)
      assert(engine.getData(spec(n)).count() == 100)
    }
  }
}

class StreamingSessionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.streaming.Trigger
  import graft.streaming.StreamingSync

  test("streaming session windows merge gap-adjacent events per key") {
    import spark.implicits._
    val dir = s"${tmpDir()}/src"
    Seq(
      (1L, "2024-01-01T00:00:00", "a"),
      (2L, "2024-01-01T01:00:00", "a"),  // within the 4h gap → same session
      (3L, "2024-01-01T10:00:00", "a"),  // past the gap → new session
      (4L, "2024-01-01T00:30:00", "b"))
      .toDF("id", "dt", "kind")
      .withColumn("dt", col("dt").cast("timestamp_ntz"))
      .coalesce(1).write.parquet(dir)
    val schema = StreamingSync.parquetSchema(spark, dir)
    val stream = StreamingSync.parquetStream(spark, dir, schema)
    val agg = StreamingSync.sessionCounts(stream, "dt", "kind", "4 hours")
    val q = agg.writeStream.format("memory").queryName("g4_sessions")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir()).start()
    q.awaitTermination(120000)
    val rows = spark.table("g4_sessions")
      .orderBy("kind", "session_start").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "a" && rows(0).getLong(3) == 2L)
    assert(rows(1).getString(0) == "a" && rows(1).getLong(3) == 1L)
    assert(rows(2).getString(0) == "b" && rows(2).getLong(3) == 1L)
  }
}

class PlanAuditSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("scan+project+filter: predicates and projection reach the parquet scan") {
    val plan = SparkEntry.queries("q_scan_project_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), s"no pushdown in:\n$plan")
    assert(plan.contains("l_shipdate") && plan.contains("l_quantity"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // only the filtered/projected columns are read, never the full table
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"over-wide scan: $readSchema")
  }

  test("q5: dimension joins broadcast (no shuffle of region/nation sides)") {
    val plan = SparkEntry.queries("q5_local_supplier_volume")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("events time-range predicates push into the parquet scan (native ts)") {
    import org.apache.spark.sql.functions.{col, lit}
    // with ts stored as native timestamp[us] the loader is a pass-through,
    // so range predicates reach the scan as PushedFilters (under the old
    // int64-nanos data they sat above a computed column and could not)
    val df = Tables.events(spark, sf).where(
      col("ts") >= lit(java.time.LocalDateTime.parse("2024-01-05T00:00:00")))
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("ts"), s"ts predicate not pushed: $pushed\n$plan")
  }

  test("events scan prunes columns for a two-column projection") {
    val df = Tables.events(spark, sf).select(org.apache.spark.sql.functions.col("event_id"))
    val readSchema = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props"), s"props read for id projection: $readSchema")
  }

  test("minhash fast path: hot-bucket cap is a BROADCAST anti-join") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    // audit the LAZY candidate stage — minhashNearDupsFast itself eagerly
    // checkpoints the pair list, which truncates the auditable lineage
    val (sig, cands) = graft.ops.ApproxDedup.minhashFastCandidates(
      docs, "doc_id", "text", threshold = 0.5, shingleSize = 3,
      k = 24, bands = 6, estSlack = 0.25, maxBucket = 200, md5Base = false)
    try {
      val plan = cands.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
        s"hot-bucket cap must plan as a broadcast anti-join:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"BNLJ in the candidate plan:\n$plan")
    } finally { sig.unpersist(); () }
  }

  test("asofJoin plans exactly ONE exchange (no range cross product)") {
    import spark.implicits._
    val quotes = Seq.tabulate(200)(i =>
      (i % 5L, java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:00:00"), i * 1.0))
      .toDF("id", "qt", "px")
    val trades = Seq.tabulate(50)(i =>
      (i % 5L, java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:30:00")))
      .toDF("id", "tt")
    val joined = graft.ops.Relational.asofJoin(trades, quotes, Seq("id"),
      "tt", "qt", Seq("px"))
    val plan = joined.queryExecution.executedPlan.toString
    val nExchanges = plan.linesIterator.count(_.contains("Exchange "))
    assert(nExchanges == 1, s"asofJoin must shuffle ONCE (union+window), got $nExchanges:\n$plan")
    assert(!plan.contains("Join"), s"asofJoin must not plan a join node:\n$plan")
  }

  test("pointInIntervalJoin plans NO BroadcastNestedLoopJoin") {
    import spark.implicits._
    val intervals = Seq.tabulate(20)(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 12}%02d:00:00"),
        java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 12 + 2}%02d:00:00")))
      .toDF("iid", "lo", "hi")
    val points = Seq.tabulate(40)(i =>
      (100L + i, java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 14}%02d:15:00")))
      .toDF("pid", "pt")
    val joined = graft.ops.Relational.pointInIntervalJoin(intervals, points,
      "lo", "hi", "pt", bucketWidthUs = 3600L * 1000000L)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested-loop/cartesian plan:\n$plan")
  }

  test("repetition matrix: ONE corpus scan, branches read the persisted tables") {
    // audit the LAZY pipeline — the public entry checkpoints the small
    // result and releases the persisted intermediates, which hides the
    // auditable shape behind a LogicalRDD
    val (out, tok, allG) = graft.ops.Corpus.repetitionMatrixLazy(
      Tables.documents(spark, sf), "doc_id", "text",
      Seq(2, 3, 4), Seq(5, 6, 7, 8, 9, 10))
    val df = out
    // count on the OPTIMIZED plan: InMemoryRelation is a leaf there (its
    // cached child plan is a field, not a child), so uncached parquet
    // re-reads are exactly the remaining LogicalRelation leaves
    val opt = df.queryExecution.optimizedPlan
    val parquetScans = opt.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l }
    val cached = opt.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m }
    // the 9 gram branches + lens/totals must all feed off the persisted
    // token/gram tables, never re-reading documents
    assert(parquetScans.isEmpty,
      s"${parquetScans.size} uncached parquet scans (branch re-reads):\n$opt")
    assert(cached.nonEmpty, s"persisted token/gram tables not reused in:\n$opt")
    tok.unpersist(); allG.unpersist(); ()
  }

  test("decontaminate: bench side broadcasts; shingles join as longs") {
    val df = SparkEntry.queries("q_decontaminate")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"degenerate join:\n$plan")
    // the shingle key crossing ANY join is the 60-bit hash column, a LONG
    val joins = df.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val shTypes = joins.flatMap(_.children.flatMap(_.output))
      .filter(_.name == "sh").map(_.dataType).distinct
    assert(shTypes == Seq(org.apache.spark.sql.types.LongType),
      s"shingle join key is $shTypes, not hashed longs")
  }

  test("IVF+PQ rerank plan: no join, bounded TakeOrdered, small literal tree") {
    val df = SparkEntry.queries("q_embedding_ann_ivfpq")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered in:\n$plan")
    assert(!plan.contains("Join"), s"probe must not plan a join:\n$plan")
    // centroids/codebooks ride as single typedLit nodes: the plan string of
    // a 16-centroid 4x16-codebook probe stays compact, not a thousand-node
    // literal dump (the r5 30x codegen regression)
    assert(plan.length < 200000, s"plan blew up to ${plan.length} chars")
  }

  test("valkey reads rank-slice into at most `parallelism` disjoint windows") {
    import graft.storage.ValkeyStore.rankSlices
    for (n <- Seq(0L, 1L, 9999L, 10000L, 10001L, 250000L); p <- Seq(1, 4, 32)) {
      val s = rankSlices(n, batch = 10000L, parallelism = p)
      assert(s.nonEmpty && s.length <= p, s"n=$n p=$p -> ${s.length} slices")
      // disjoint LIMIT windows covering [0, n): offsets ascend by `per`,
      // total span >= n
      val per = s.head._2
      assert(s.zipWithIndex.forall { case ((off, c), i) => off == i * per && c == per })
      assert(s.length.toLong * per >= n, s"windows cover ${s.length * per} < $n")
      if (n > 10000L && p > 1)
        assert(s.length > 1, s"large read not parallel: n=$n p=$p")
    }
  }
}

class ApiSourceSpec extends SparkSpec {
  import java.time.LocalDateTime
  import org.apache.spark.sql.types._
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import graft.sources.{ApiSink, ApiSource, NdjsonServer}

  private def us(s: String): Long = {
    val i = LocalDateTime.parse(s).toInstant(java.time.ZoneOffset.UTC)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("ts", StringType),
    StructField("v", DoubleType)))

  private def rows: Seq[(Long, String)] = (0 until 48).map { i =>
    val t = LocalDateTime.parse("2024-02-01T00:00:00").plusHours(i)
    (us(t.toString), s"""{"id":$i,"ts":"$t","v":${i * 1.5}}""")
  }

  test("ApiSource: chunked fetch applies server-side bounds and local params") {
    val h = NdjsonServer.serve(rows)
    try {
      val src  = new ApiSource(h.url, schema, chunkMinutes = 720) // 12h chunks
      val spec = PipeSpec(PipeKeys("api", "t"),
        columns = ColumnRoles(Map("datetime" -> "ts")))
      val got = src.fetch(spark, spec,
          begin = Some(LocalDateTime.parse("2024-02-01T06:00:00")),
          end   = Some(LocalDateTime.parse("2024-02-02T00:00:00")),
          params = Map("id" -> graft.dsl.ParamsFilter.Not(7L)))
        .orderBy("id").collect()
      // hours 6..23 minus id 7 → 17 rows, half-open end excludes hour 24
      assert(got.length == 17)
      assert(got.head.getLong(0) == 6L && got.last.getLong(0) == 23L)
      assert(!got.exists(_.getLong(0) == 7L))
    } finally h.stop()
  }

  test("ApiSource: unbounded fetch reads everything in one window") {
    val h = NdjsonServer.serve(rows)
    try {
      val src  = new ApiSource(h.url, schema)
      val spec = PipeSpec(PipeKeys("api", "t"),
        columns = ColumnRoles(Map("datetime" -> "ts")))
      assert(src.fetch(spark, spec).count() == 48)
    } finally h.stop()
  }

  test("ApiSource: begin == end is a legal empty fetch") {
    val h = NdjsonServer.serve(rows)
    try {
      val src  = new ApiSource(h.url, schema, chunkMinutes = 720)
      val spec = PipeSpec(PipeKeys("api", "t"),
        columns = ColumnRoles(Map("datetime" -> "ts")))
      val b = LocalDateTime.parse("2024-02-01T06:00:00")
      assert(src.fetch(spark, spec, begin = Some(b), end = Some(b)).count() == 0)
    } finally h.stop()
  }

  test("ApiSink: partitions post ND-JSON batches from the executors") {
    val h = NdjsonServer.serve(Nil)
    try {
      import spark.implicits._
      ApiSink.push((0 until 100).toDF("n"), h.url, batchRows = 17)
      assert(h.received.size() == 100)
    } finally h.stop()
  }
}

class RemoteRowCountSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}

  test("remote rowcount pushes bounds+params into one COUNT(*) round trip") {
    val url = "jdbc:derby:memory:graftrc;create=true"
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-${1 + (i - 1) % 28} 00:00:00"), i % 3))
      .toDF("ID", "TS", "KIND")
      .coalesce(1).write.mode("overwrite").jdbc(url, "RC_EVENTS", new java.util.Properties)
    val spec = PipeSpec(PipeKeys("jdbc", "rc"),
      columns = ColumnRoles(Map("datetime" -> "TS")))
    val src = new graft.sources.SqlDefinitionSource(url, "SELECT * FROM RC_EVENTS")
    val n = src.remoteRowCount(spark, spec,
      begin = Some(java.time.LocalDateTime.parse("2024-01-01T00:00:00")),
      end   = Some(java.time.LocalDateTime.parse("2024-01-11T00:00:00")),
      params = Map("KIND" -> 0))
    val expected = spark.read.jdbc(url, "RC_EVENTS", new java.util.Properties)
      .where(col("TS") < lit(java.sql.Timestamp.valueOf("2024-01-11 00:00:00")) &&
             col("KIND") === 0).count()
    assert(n == expected && n > 0)
  }
}

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions resolve to the native expressions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                graft_token_count(' a b  c ') AS n,
                graft_langid('the cat and the dog of it') AS lang,
                graft_redact_pii('x y@z.io z') AS red,
                graft_split_label(7, 80, 10, 10) AS split""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 11.0)
    assert(r.getInt(2) == 3)
    assert(r.getString(3) == "en")
    assert(r.getString(4) == "x <EMAIL> z")
    assert(Set("train", "val", "test").contains(r.getString(5)))
  }

  test("graft_winnow from SQL equals the Corpus operator") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "The Quick Brown Fox Jumps Over The Dog")).toDF("id", "t")
    df.createOrReplaceTempView("g4_winnow_t")
    val sql = spark.sql("SELECT explode(graft_winnow(t, 8, 4)) AS fp FROM g4_winnow_t")
      .orderBy("fp").as[Long].collect().toSeq
    val api = graft.ops.Corpus.winnowFingerprints(df, "id", "t", 8, 4)
      .orderBy("fp").select("fp").as[Long].collect().toSeq
    assert(sql.nonEmpty && sql == api)
  }

  test("graft_minhash from SQL equals the Scala API signature") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over it").toDF("text")
    df.createOrReplaceTempView("g4_minhash_t")
    val sql = spark.sql(
      "SELECT graft_minhash(text, 3, 8) AS sig FROM g4_minhash_t")
      .head.getSeq[Long](0)
    val api = df.select(
        graft.ops.ApproxDedup.minhashSignature(col("text"), 3, 8).as("sig"))
      .head.getSeq[Long](0)
    assert(sql == api)
  }

  test("graft_round_time requires a literal unit") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_round_time(ts, ts) FROM (SELECT current_timestamp() AS ts)")
        .collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
