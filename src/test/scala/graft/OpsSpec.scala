package graft

import org.apache.spark.sql.functions._

import graft.dsl.{ChunkGrid, ParamsFilter}
import graft.ops.{Dedup, Diff}
import graft.types.{Dtypes, MrsmType}
import graft.catalog.{PipeCatalog, PipeKeys, PipeSpec}

class ParamsFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("red"), """{"k":"v"}"""),
    (2L, Some("blue"), """{"k":"w"}"""),
    (3L, None, """{"k":"v"}"""),
    (4L, Some("red"), null)).toDF("id", "color", "meta")

  private def ids(params: Map[String, Any]): Seq[Long] =
    df.where(ParamsFilter.toPredicate(params)).select("id").as[Long].collect().sorted.toSeq

  test("scalar equality")        { assert(ids(Map("id" -> 1L)) == Seq(1L)) }
  test("IN list")                { assert(ids(Map("id" -> Seq(1L, 2L))) == Seq(1L, 2L)) }
  test("string negation")        { assert(ids(Map("color" -> "_red")) == Seq(2L)) }
  test("typed negation")         { assert(ids(Map("id" -> ParamsFilter.Not(1L))) == Seq(2L, 3L, 4L)) }
  test("NOT IN list")            { assert(ids(Map("color" -> Seq("_red", "_blue"))) == Seq.empty) }
  test("IS NULL via None")       { assert(ids(Map("color" -> ParamsFilter.Null)) == Seq(3L)) }
  test("IS NOT NULL via _None")  { assert(ids(Map("color" -> "_None")) == Seq(1L, 2L, 4L)) }
  test("null element in IN adds OR IS NULL") {
    assert(ids(Map("color" -> Seq("red", null))) == Seq(1L, 3L, 4L))
  }
  test("mixed include and exclude") {
    assert(ids(Map("id" -> Seq(1L, 2L, 3L), "color" -> Seq("_blue"))) == Seq(1L))
  }
  test("JSON field equality") {
    assert(ids(Map("meta" -> Map("k" -> "v"))) == Seq(1L, 3L))
  }
}

class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("filterUnseen: identical rows vanish, changed rows survive") {
    val old = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val nw  = Seq((1L, "a"), (2L, "B"), (3L, "c")).toDF("id", "v")
    val delta = Diff.filterUnseen(old, nw).select("id").as[Long].collect().sorted
    assert(delta.toSeq == Seq(2L, 3L))
  }

  test("filterUnseen distinguishes null from empty string") {
    val old = Seq((1L, Some(""))).toDF("id", "v")
    val nw  = Seq((1L, Option.empty[String]), (1L, Some(""))).toDF("id", "v")
    val delta = Diff.filterUnseen(old, nw)
    assert(delta.count() == 1)
    assert(delta.where(col("v").isNull).count() == 1)
  }

  test("NA canonicalization: 'none'/'nan' strings equal real null") {
    val old = Seq((1L, Option.empty[String])).toDF("id", "v")
    val nw  = Seq((1L, Some("none")), (1L, Some("nan"))).toDF("id", "v")
    assert(Diff.filterUnseen(old, nw).count() == 0)
  }

  test("unseen/update split on keys") {
    val backtrack = Seq((1L, "x", 1.0)).toDF("id", "tag", "v")
    val incoming  = Seq((1L, "x", 2.0), (2L, "y", 3.0)).toDF("id", "tag", "v")
    val (unseen, update) = Diff.filterExisting(incoming, backtrack, Seq("id", "tag"))
    assert(unseen.select("id").as[Long].collect().toSeq == Seq(2L))
    assert(update.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("keepLatest keeps one row per key, newest first") {
    val df = Seq(
      (1L, "a", "2024-01-01 00:00:00", 1.0),
      (1L, "a", "2024-01-02 00:00:00", 2.0),
      (2L, "b", "2024-01-01 00:00:00", 3.0)).toDF("id", "tag", "dts", "v")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    val out = Dedup.keepLatest(df, Seq("id", "tag"), Seq("dt"))
    assert(out.count() == 2)
    assert(out.where(col("id") === 1L).select("v").as[Double].head() == 2.0)
  }
}

class ChunkGridSpec extends SparkSpec {
  import java.time.{Duration, Instant}

  test("aligned grid is stable regardless of query begin") {
    val day = Duration.ofDays(1)
    val g1 = ChunkGrid.bounds(Instant.parse("2024-01-01T07:00:00Z"),
      Instant.parse("2024-01-03T00:00:00Z"), day)
    // first chunk clipped at begin but boundary stays on the aligned grid
    assert(g1.head._1 == Instant.parse("2024-01-01T07:00:00Z"))
    assert(g1.head._2 == Instant.parse("2024-01-02T00:00:00Z"))
    assert(g1.last._2 == Instant.parse("2024-01-03T00:00:00Z"))
    assert(g1.size == 2)
  }

  test("unaligned grid starts at begin") {
    val g = ChunkGrid.bounds(Instant.parse("2024-01-01T07:00:00Z"),
      Instant.parse("2024-01-02T07:00:00Z"), java.time.Duration.ofDays(1), align = false)
    assert(g == Seq((Instant.parse("2024-01-01T07:00:00Z"), Instant.parse("2024-01-02T07:00:00Z"))))
  }
}

class DtypesSpec extends SparkSpec {
  import MrsmType._

  test("alias parsing") {
    assert(Dtypes.parse("int") == MInt64)
    assert(Dtypes.parse("numeric(20,5)") == MNumeric(20, 5))
    assert(Dtypes.parse("datetime64[us, UTC]") == MDatetime(tz = true))
    assert(Dtypes.parse("datetime64[us]") == MDatetime(tz = false))
    assert(Dtypes.parse("json") == MJson)
  }

  test("fuzzy equality collapses width and precision") {
    assert(Dtypes.areEqual(MInt32, MInt64))
    assert(Dtypes.areEqual(MNumeric(38, 10), MNumeric(20, 5)))
    assert(!Dtypes.areEqual(MInt64, MStr))
  }

  test("promotion rules") {
    assert(Dtypes.promote(MInt32, MInt64) == MInt64)
    assert(Dtypes.promote(MInt64, MFloat) == MNumeric())
    assert(Dtypes.promote(MInt64, MFloat, mixedNumerics = false) == MFloat)
    assert(Dtypes.promote(MInt64, MStr) == MStr)
  }
}

class CatalogSpec extends SparkSpec {
  test("register, search with negation and tags") {
    val cat = new PipeCatalog()
    cat.register(PipeSpec(PipeKeys("sql_a", "temp"), tags = Seq("prod")))
    cat.register(PipeSpec(PipeKeys("sql_a", "hum"), tags = Seq("dev")))
    cat.register(PipeSpec(PipeKeys("sql_b", "temp"), tags = Seq("prod", "gold")))
    assert(cat.search(connectors = Seq("sql_a")).size == 2)
    assert(cat.search(connectors = Seq("_sql_a")).size == 1)
    assert(cat.search(metrics = Seq("temp"), tags = Seq("gold")).size == 1)
    assert(cat.search(tags = Seq("prod", "_gold")).map(_.keys.metric) == Seq("temp"))
    assert(cat.search(tags = Seq("prod")).size == 2)
    cat.delete(PipeKeys("sql_a", "hum"))
    assert(cat.all.size == 2)
  }
}

class CatalogStoreSpec extends SparkSpec {
  import graft.catalog.{ColumnRoles, PipeCatalog, PipeCatalogStore, PipeKeys, PipeSpec}
  import graft.types.MrsmType

  test("catalog round-trips through the JSON snapshot") {
    val cat = new PipeCatalog()
    cat.register(PipeSpec(
      PipeKeys("sql_main", "temperature", Some("office")),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "sensor")),
      dtypes = Map("val" -> MrsmType.MNumeric(20, 5), "meta" -> MrsmType.MJson),
      upsert = true, backtrackMinutes = 60, chunkMinutes = 1440,
      epochUnit = None, tags = Seq("prod", "hvac")))
    cat.register(PipeSpec(
      PipeKeys("plugin_x", "counts"),
      columns = ColumnRoles(Map("datetime" -> "ts")),
      epochUnit = Some("second")))
    val path = tmpDir() + "/registry"
    PipeCatalogStore.save(spark, path, cat)
    val loaded = PipeCatalogStore.load(spark, path)
    assert(loaded.all.toSet == cat.all.toSet)
    assert(loaded.search(tags = Seq("hvac")).map(_.keys.metric) == Seq("temperature"))
  }

  test("dtype format/parse round-trip") {
    import graft.types.{Dtypes, MrsmType => M}
    val ts = Seq(M.MBool, M.MInt8, M.MInt64, M.MFloat, M.MStr, M.MDate, M.MBytes,
      M.MUuid, M.MJson, M.MGeometry, M.MNumeric(38, 20), M.MDatetime(true), M.MDatetime(false))
    ts.foreach(t => assert(Dtypes.parse(Dtypes.format(t)) == t, t))
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.{Dedup, Skew}

  // 10k rows, 90% on one hot key
  private lazy val skewed = spark.range(0, 10000).select(
    when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
    col("id").as("seq"),
    (col("id") % 97).cast("double").as("v"))

  test("saltedJoin equals the plain join on skewed keys") {
    val dim = Seq((1L, "hot"), (20L, "a"), (30L, "b")).toDF("k", "name")
    val plain  = skewed.join(dim, Seq("k")).select("k", "seq", "name")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salt = 8)
      .select("k", "seq", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedKeepLatest equals window keep-latest on a skewed key") {
    val expected = Dedup.keepLatest(skewed, Seq("k"), Seq("v", "seq"))
    val got      = Skew.saltedKeepLatest(skewed, Seq("k"), Seq("v", "seq"), salt = 8)
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}

class TimeFnsSpec extends SparkSpec {
  import spark.implicits._
  import graft.dsl.{CoerceTz, RoundTime}

  private lazy val ts = Seq(
    "2024-03-10 10:00:00", "2024-03-10 10:20:00", "2024-03-10 10:40:00",
    "2024-03-10 10:30:00").toDF("s")
    .select(to_timestamp_ntz(col("s")).as("t"))

  test("round_time: floor, ceil (boundary stays), closest (ties up)") {
    val r = ts.select(
      RoundTime.floor(col("t"), "hour").cast("timestamp_ntz").as("f"),
      RoundTime.ceil(col("t"), "hour").cast("timestamp_ntz").as("c"),
      RoundTime.closest(col("t"), "hour").cast("timestamp_ntz").as("n"))
      .collect().map(x => (x.get(0).toString, x.get(1).toString, x.get(2).toString))
    assert(r(0) == ("2024-03-10T10:00", "2024-03-10T10:00", "2024-03-10T10:00")) // boundary
    assert(r(1) == ("2024-03-10T10:00", "2024-03-10T11:00", "2024-03-10T10:00")) // :20 → down
    assert(r(2) == ("2024-03-10T10:00", "2024-03-10T11:00", "2024-03-10T11:00")) // :40 → up
    assert(r(3)._3 == "2024-03-10T11:00")                                        // :30 tie → up
  }

  test("coerce_timezone: assumeZone converts to UTC instant; convertNaive shifts walls") {
    val df = Seq("2024-06-01 12:00:00").toDF("s")
      .select(to_timestamp_ntz(col("s")).as("t"))
    // noon New York in June = 16:00 UTC (EDT, UTC-4)
    val instant = df.select(CoerceTz.assumeZone(col("t"), "America/New_York")
      .cast("timestamp_ntz")).head().get(0).toString
    assert(instant == "2024-06-01T16:00")
    val wall = df.select(CoerceTz.convertNaive(col("t"), "UTC", "Asia/Tokyo"))
      .head().get(0).toString
    assert(wall == "2024-06-01T21:00")
    val strip = df.select(CoerceTz.stripToUtcNaive(col("t").cast("timestamp")))
      .head().get(0).toString
    assert(strip == "2024-06-01T12:00")
  }
}

class StrategySpec extends SparkSpec {
  import spark.implicits._
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import graft.sync.{SyncEngine, SyncResult, SyncStrategy}

  test("SyncStrategy overrides the engine sync; can delegate to syncDefault") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    var hookRan = 0
    val strategy = new SyncStrategy {
      def sync(e: SyncEngine, spec: PipeSpec, batch: org.apache.spark.sql.DataFrame): SyncResult = {
        hookRan += 1
        // custom preprocessing, then the standard pipeline
        e.syncDefault(spec, batch.withColumn("tagged", lit(true)))
      }
    }
    val spec = PipeSpec(PipeKeys("test", "strat"),
      columns = ColumnRoles(Map("primary" -> "pk")), strategy = Some(strategy))
    val r = eng.sync(spec, Seq((1L, "a")).toDF("pk", "v"))
    assert(hookRan == 1 && r.inserted == 1)
    assert(eng.getData(spec).columns.contains("tagged"))
  }

  test("sync hooks: preSync rewrites, postSync observes, chunkHook wraps fetches") {
    import graft.sources.FnSource
    import graft.sync.SyncHooks
    val root = tmpDir()
    var post = Seq.empty[Long]
    val hooks = SyncHooks(
      preSync  = (_, df) => df.withColumn("stamped", lit(true)),
      postSync = (_, r) => post = post :+ r.total,
      chunkHook = df => df.where(col("v") =!= "drop"))
    val eng = new SyncEngine(spark, root, hooks)
    val spec = PipeSpec(PipeKeys("test", "hooks"),
      columns = ColumnRoles(Map("primary" -> "pk")))
    val src = new FnSource((s, _, _, _) => {
      import s.implicits._
      Seq((1L, "keep"), (2L, "drop")).toDF("pk", "v")
    })
    val r = eng.fetchSync(spec, src)
    assert(r.inserted == 1)            // chunkHook dropped the 'drop' row
    assert(post == Seq(1L))            // postSync observed the result
    assert(eng.getData(spec).columns.contains("stamped")) // preSync applied
  }

  test("autoincrement: batches without the pk column get sequential ids") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "autoinc"),
      columns = ColumnRoles(Map("primary" -> "pk")), autoincrement = true)
    eng.sync(spec, Seq("a", "b", "c").toDF("v"))
    eng.sync(spec, Seq("d", "e").toDF("v"))
    val got = eng.getData(spec).orderBy("pk")
      .select("pk", "v").as[(Long, String)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(got.map(_._2).sorted.toSeq == Seq("a", "b", "c", "d", "e"))
  }
}
