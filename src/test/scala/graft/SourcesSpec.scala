package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.dsl.ParamsFilter
import graft.sources.{FnSource, Ingest, SqlDefinitionSource, StressSource}
import graft.sync.SyncEngine

/** Sources SPI: JDBC definition fetch (Derby embedded as the remote),
  * plugin-style fetch, the stress generator, and ingest literal parsing —
  * mirroring the reference's fetch tests (tests/pipes.py:18-55 remote-SQL
  * pipes, tests/plugins/stress.py). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def jdbcUrl(name: String) = s"jdbc:derby:memory:$name;create=true"

  // Remote tables use UPPERCASE names so bare identifiers in pushed-down SQL
  // resolve (Derby normalizes unquoted identifiers to upper case, while the
  // Spark JDBC writer quotes exactly).
  private def seedRemote(url: String): Unit = {
    val rows = Seq(
      ("2024-01-01 00:00:00", 1L, "click", 1.0),
      ("2024-01-02 00:00:00", 2L, "view", 2.0),
      ("2024-01-03 00:00:00", 3L, "click", 3.0),
      ("2024-01-04 00:00:00", 1L, "error", 4.0),
      ("2024-01-05 00:00:00", 2L, "click", 5.0))
    rows.toDF("TSS", "ID", "ETYPE", "VAL")
      .withColumn("TS", to_timestamp(col("TSS"))).drop("TSS")
      .select("TS", "ID", "ETYPE", "VAL")
      .write.mode("overwrite")
      // Spark's Derby dialect maps StringType to CLOB, which Derby cannot
      // compare against literals — pin a comparable VARCHAR
      .option("createTableColumnTypes", "ETYPE VARCHAR(32)")
      .jdbc(url, "EVENTS", new java.util.Properties)
  }

  private val remoteSpec = PipeSpec(PipeKeys("jdbc", "remote"),
    columns = ColumnRoles(Map("datetime" -> "TS", "id" -> "ID")))

  test("SqlDefinitionSource pushes bounds and params into the remote query") {
    val url = jdbcUrl("pushdown")
    seedRemote(url)
    val src = new SqlDefinitionSource(url, "SELECT * FROM EVENTS")
    val got = src.fetch(spark, remoteSpec,
      begin = Some(LocalDateTime.parse("2024-01-02T00:00:00")),
      end   = Some(LocalDateTime.parse("2024-01-05T00:00:00")),
      params = Map("ETYPE" -> Seq("click", "view")))
    val ids = got.select("ID").as[Long].collect().sorted
    assert(ids.toSeq == Seq(2L, 3L)) // day-2 view + day-3 click; error and day-5 excluded
  }

  test("SqlDefinitionSource partitioned read returns the same rows") {
    val url = jdbcUrl("partread")
    seedRemote(url)
    val src = new SqlDefinitionSource(url, "SELECT * FROM EVENTS", numPartitions = 3)
    val got = src.fetch(spark, remoteSpec,
      begin = Some(LocalDateTime.parse("2024-01-01T00:00:00")),
      end   = Some(LocalDateTime.parse("2024-01-06T00:00:00")))
    assert(got.rdd.getNumPartitions == 3)
    assert(got.count() == 5)
  }

  test("fetchSync: JDBC source → sync e2e, incremental second pass") {
    val url = jdbcUrl("syncsrc")
    seedRemote(url)
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("jdbc", "sync_e2e"),
      columns = ColumnRoles(Map("datetime" -> "TS", "id" -> "ID")),
      backtrackMinutes = 60)
    val src = new SqlDefinitionSource(url, "SELECT * FROM EVENTS")
    val r1 = eng.fetchSync(spec, src)
    assert(r1.inserted == 5)
    // second pass: begin = syncTime - backtrack → only the backtrack window
    // re-fetched, diff makes it a no-op
    val r2 = eng.fetchSync(spec, src)
    assert(r2.inserted == 0 && r2.updated == 0)
    assert(eng.storage(spec).rowCount == 5)
  }

  test("joinFetchSync: per-id VALUES join pushed to the remote; new ids included") {
    val url = jdbcUrl("joinfetch")
    seedRemote(url)
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("jdbc", "jf"),
      columns = ColumnRoles(Map("datetime" -> "TS", "id" -> "ID")))
    // pipe starts with the day-1/day-2 rows for ids 1 and 2
    val src = new SqlDefinitionSource(url, "SELECT * FROM EVENTS")
    eng.sync(spec, src.fetch(spark, spec,
      end = Some(LocalDateTime.parse("2024-01-03T00:00:00"))))
    assert(eng.storage(spec).rowCount == 2)
    // join fetch pulls: id 3 (new), id 1 day-4, id 2 day-5
    val r = eng.joinFetchSync(spec, src)
    assert(r.inserted == 3 && r.updated == 0)
    assert(eng.storage(spec).rowCount == 5)
    // idempotent: nothing newer remains
    assert(eng.joinFetchSync(spec, src).total == 0)
  }

  test("joinFetchSync generic source path filters with a broadcast join") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("plugin", "jf_generic"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    def mk(rows: Seq[(String, Long, Double)]) =
      rows.toDF("dts", "id", "v")
        .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
        .select("dt", "id", "v")
    val all = Seq(
      ("2024-01-01 00:00:00", 1L, 1.0), ("2024-01-02 00:00:00", 1L, 2.0),
      ("2024-01-01 00:00:00", 2L, 3.0), ("2024-01-03 00:00:00", 3L, 4.0))
    val src = new FnSource((_, _, _, _) => mk(all))
    eng.sync(spec, mk(all.take(1) ++ all.slice(2, 3))) // id1 day1, id2 day1
    val r = eng.joinFetchSync(spec, src)
    assert(r.inserted == 2) // id1 day2 (newer) + id3 (new); id2 day1 not newer
    assert(eng.storage(spec).rowCount == 4)
  }

  test("PipeSource: child pipe syncs incrementally from a parent pipe") {
    import graft.sources.PipeSource
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    def mk(rows: Seq[(String, Long, Double)]) =
      rows.toDF("dts", "id", "v")
        .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
        .select("dt", "id", "v")
    val parent = PipeSpec(PipeKeys("dag", "raw"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    val child = PipeSpec(PipeKeys("dag", "doubled"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")),
      backtrackMinutes = 60)
    eng.sync(parent, mk(Seq(
      ("2024-01-01 00:00:00", 1L, 1.0), ("2024-01-02 00:00:00", 2L, 2.0))))
    val src = new PipeSource(eng, parent,
      transform = _.withColumn("v", col("v") * 2))
    assert(eng.fetchSync(child, src).inserted == 2)
    // new parent data flows through on the next incremental pass
    eng.sync(parent, mk(Seq(("2024-01-03 00:00:00", 3L, 3.0))))
    val r2 = eng.fetchSync(child, src)
    assert(r2.inserted == 1 && r2.updated == 0)
    import spark.implicits._
    val got = eng.getData(child).orderBy("id").select("v").as[Double].collect()
    assert(got.toSeq == Seq(2.0, 4.0, 6.0))
  }

  test("getChunks: epoch-aligned bounded frames cover the range") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("chunks", "t"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")),
      chunkMinutes = 1440)
    import spark.implicits._
    val rows = (0 until 96).map(h =>
      (java.time.LocalDateTime.parse("2024-01-01T00:00:00").plusHours(h), h.toLong, 1.0))
    eng.sync(spec, rows.toDF("dt", "id", "v"))
    val chunks = eng.getChunks(spec,
      java.time.Instant.parse("2024-01-01T00:00:00Z"),
      java.time.Instant.parse("2024-01-05T00:00:00Z"))
    assert(chunks.size == 4) // four aligned days
    assert(chunks.map(_._2.count()).sum == 96)
    assert(chunks.forall(_._2.count() == 24))
  }

  test("params DSL renders ANSI SQL (negation, IN, nulls)") {
    assert(ParamsFilter.toSql(Map("a" -> 1L)) == "a = 1")
    assert(ParamsFilter.toSql(Map("a" -> Seq("x", "_y"))) ==
      "a IN ('x') AND a NOT IN ('y')")
    assert(ParamsFilter.toSql(Map("a" -> ParamsFilter.Not(null))) == "a IS NOT NULL")
    assert(ParamsFilter.toSql(Map("a" -> Seq(1L, 2L, null))) ==
      "(a IN (1, 2) OR a IS NULL)")
    assert(ParamsFilter.toSql(Map("s" -> "o'brien")) == "s = 'o''brien'")
    intercept[IllegalArgumentException] {
      ParamsFilter.toSql(Map("j" -> Map("k" -> 1)))
    }
  }

  test("StressSource: deterministic bounded generator, distributed") {
    val spec = PipeSpec(PipeKeys("plugin", "stress"),
      columns = ColumnRoles(Map("datetime" -> "datetime", "id" -> "id", "value" -> "val")))
    val src = new StressSource(rows = 100, numIds = 3)
    val b = Some(LocalDateTime.parse("2024-01-01T00:00:00"))
    val df = src.fetch(spark, spec, b, Some(LocalDateTime.parse("2024-01-01T00:30:00")))
    assert(df.count() == 30) // bounded by end, not row limit
    assert(df.columns.toSeq == Seq("datetime", "id", "val"))
    val ids = df.select("id").as[Long].collect()
    assert(ids.forall(i => i >= 1 && i <= 3))
    // same seed → same data
    assert(df.exceptAll(src.fetch(spark, spec, b,
      Some(LocalDateTime.parse("2024-01-01T00:30:00")))).isEmpty)
  }

  test("FnSource: plugin-style fetch flows through sync") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("plugin", "fn"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    val src = new FnSource((s, _, _, _) => {
      import s.implicits._
      Seq(("2024-01-01 00:00:00", 1L, 1.0)).toDF("dts", "id", "v")
        .withColumn("dt", to_timestamp_ntz($"dts")).drop("dts")
    })
    assert(eng.fetchSync(spec, src).inserted == 1)
    assert(eng.fetchSync(spec, src).total == 0) // idempotent
  }

  test("Ingest.fromSimpleLines: typed columns from k:v lines and JSON lines") {
    val df = Ingest.fromSimpleLines(spark,
      "a:1,b:x,c:1.5\na:2,b:y,c:2\n{\"a\": 3, \"b\": \"z\", \"c\": 9.9}")
    assert(df.schema("a").dataType == LongType)
    assert(df.schema("b").dataType == StringType)
    assert(df.schema("c").dataType == DoubleType) // long+double unify to double
    assert(df.count() == 3)
    assert(df.where(col("b") === "z").select("a").as[Long].head() == 3L)
  }

  test("Ingest.fromLiteral: dt + parsed value columns") {
    val spec = PipeSpec(PipeKeys("inline", "lit"),
      columns = ColumnRoles(Map("datetime" -> "dt", "value" -> "val")))
    val df = Ingest.fromLiteral(spark, spec, "42")
    assert(df.columns.toSeq == Seq("dt", "val"))
    assert(df.schema("val").dataType == LongType)
    assert(df.select("val").as[Long].head() == 42L)
  }

  test("Ingest.parseDatetimes: naive, aware, date, and non-datetime strings") {
    val df = Seq(
      ("2024-01-01 10:00:00", "2024-01-01T10:00:00Z", "2024-01-01", "hello"),
      ("2024-02-02 20:30:00", "2024-02-02T20:30:00+02:00", "2024-02-02", "2024")
    ).toDF("naive", "aware", "d", "s")
    val out = Ingest.parseDatetimes(df)
    assert(out.schema("naive").dataType == TimestampNTZType)
    assert(out.schema("aware").dataType == TimestampNTZType)
    assert(out.schema("d").dataType == DateType)
    assert(out.schema("s").dataType == StringType)
    // aware +02:00 converts to UTC before dropping the zone
    val utc = out.where(col("s") === "2024").select("aware")
      .as[java.time.LocalDateTime].head()
    assert(utc == LocalDateTime.parse("2024-02-02T18:30:00"))
  }

  test("getDocs: rows as JSON documents") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("docs", "t"),
      columns = ColumnRoles(Map("primary" -> "pk")))
    eng.sync(spec, Seq((1L, "a"), (2L, "b")).toDF("pk", "payload"))
    val docs = eng.getDocs(spec).collect().sorted
    assert(docs.toSeq == Seq("""{"pk":1,"payload":"a"}""", """{"pk":2,"payload":"b"}"""))
  }
}

/** Short-name source resolution (reference plugin registry,
  * plugins/__init__.py:539-1013). */
class SourceRegistrySpec extends SparkSpec {
  import graft.sources.{Source, SourceProvider, SourceRegistry}

  test("ServiceLoader discovers the built-in stress source by name") {
    val src = SourceRegistry.forName("stress", Map("ids" -> "3", "rows" -> "5"))
    val spec = graft.catalog.PipeSpec(
      graft.catalog.PipeKeys("reg", "stress"),
      columns = graft.catalog.ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    val b = Some(java.time.LocalDateTime.parse("2024-01-01T00:00:00"): Any)
    val df = src.fetch(spark, spec, begin = b)
    assert(df.count() == 5)
    assert(df.columns.toSet == Set("dt", "id", "val"))
    // deterministic given the same begin: a second fetch is identical
    assert(df.collect().toSeq == src.fetch(spark, spec, begin = b).collect().toSeq)
  }

  test("stress source syncs end-to-end and re-sync of the window is a no-op") {
    val eng = new graft.sync.SyncEngine(spark, tmpDir())
    val spec = graft.catalog.PipeSpec(
      graft.catalog.PipeKeys("reg", "stress_e2e"),
      columns = graft.catalog.ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    val src = SourceRegistry.forName("stress", Map("ids" -> "4", "rows" -> "10"))
    val b = Some(java.time.LocalDateTime.parse("2024-01-01T00:00:00"): Any)
    val r1 = eng.fetchSync(spec, src, begin = b)
    assert(r1.inserted == 10 && r1.updated == 0)
    val r2 = eng.fetchSync(spec, src, begin = b)
    assert(r2.inserted == 0 && r2.updated == 0)
  }

  test("programmatic registration resolves and shadows; unknown names fail loudly") {
    object P extends SourceProvider {
      def name = "custom_test"
      def create(config: Map[String, String]): Source =
        new graft.sources.FnSource((s, _, _, _) => {
          import s.implicits._
          Seq((1L, config.getOrElse("tag", "?"))).toDF("id", "tag")
        })
    }
    SourceRegistry.register(P)
    val df = SourceRegistry.forName("CUSTOM_TEST", Map("tag" -> "hi"))
      .fetch(spark, graft.catalog.PipeSpec(graft.catalog.PipeKeys("reg", "c")))
    assert(df.collect().map(_.getString(1)).toSeq == Seq("hi"))
    assert(SourceRegistry.names.contains("custom_test"))
    val err = intercept[IllegalArgumentException] {
      SourceRegistry.forName("nope_missing")
    }
    assert(err.getMessage.contains("stress"), "error must list available names")
  }
}
