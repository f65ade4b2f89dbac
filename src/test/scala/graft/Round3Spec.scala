package graft

import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeCatalog, PipeCatalogStore, PipeKeys, PipeSpec}
import graft.dsl.{Precision, RoundTime}
import graft.ops.Maintenance
import graft.sync.{SyncEngine, SyncResult, SyncStrategy}

/** Round-3 behaviors: sync retry, dtype persistence, enforced reads,
  * dt-moving upserts, distributed autoincrement, precision stamping,
  * content-aware verify, stored-index probes. */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  private def mkSpec(name: String): PipeSpec =
    PipeSpec(PipeKeys("test", name),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))

  private def batch(rows: Seq[(String, Long, Double)]): DataFrame =
    rows.toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
      .select("dt", "id", "val")

  // ── sync-level retry ────────────────────────────────────────────────────

  test("transient sync failure succeeds on retry, errors surfaced") {
    val root = tmpDir()
    val eng = new SyncEngine(spark, root, retries = 3, retryBaseSleepMs = 1)
    var calls = 0
    val flaky = new SyncStrategy {
      def sync(e: SyncEngine, spec: PipeSpec, b: DataFrame): SyncResult = {
        calls += 1
        if (calls < 3) throw new RuntimeException(s"transient #$calls")
        e.syncDefault(spec, b)
      }
    }
    val spec = mkSpec("retry").copy(strategy = Some(flaky))
    val r = eng.sync(spec, batch(Seq(("2024-01-01 00:00:00", 1L, 1.0))))
    assert(r.inserted == 1)
    assert(r.attempts == 3)
    assert(r.attemptErrors == Seq(
      "attempt 1: RuntimeException: transient #1",
      "attempt 2: RuntimeException: transient #2"))
    assert(eng.storage(spec).rowCount == 1)
  }

  test("retries exhausted: the final failure propagates") {
    val root = tmpDir()
    val eng = new SyncEngine(spark, root, retries = 2, retryBaseSleepMs = 1)
    val dead = new SyncStrategy {
      def sync(e: SyncEngine, spec: PipeSpec, b: DataFrame): SyncResult =
        throw new RuntimeException("permanent")
    }
    val spec = mkSpec("retry_dead").copy(strategy = Some(dead))
    val e = intercept[RuntimeException] {
      eng.sync(spec, batch(Seq(("2024-01-01 00:00:00", 1L, 1.0))))
    }
    assert(e.getMessage == "permanent")
  }

  // ── dtype persistence back into the catalog ─────────────────────────────

  test("evolved dtypes persist into the catalog and reload from disk") {
    val root = tmpDir(); val catPath = s"${tmpDir()}/catalog"
    val cat = new PipeCatalog()
    val eng = new SyncEngine(spark, root, catalog = Some(cat),
      catalogPath = Some(catPath), retryBaseSleepMs = 1)
    val spec = mkSpec("dtpersist")
    // first sync: inferred dtypes registered
    val ints = Seq(("2024-01-01 00:00:00", 1L, 10L)).toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    eng.sync(spec, ints)
    assert(cat.get(spec.keys).exists(
      _.dtypes.get("val").contains(graft.types.MrsmType.MInt64)))
    // drifting batch: float val promotes to numeric, new column appears
    val floats = Seq(("2024-01-02 00:00:00", 2L, 1.5)).toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
      .withColumn("extra", lit("x"))
    eng.sync(spec, floats)
    val reloaded = PipeCatalogStore.load(spark, catPath).get(spec.keys)
    assert(reloaded.exists(_.dtypes.get("val").exists(
      _.isInstanceOf[graft.types.MrsmType.MNumeric])))
    assert(reloaded.exists(_.dtypes.get("extra").contains(graft.types.MrsmType.MStr)))
  }

  test("declared richer dtype survives persistence when physical type matches") {
    val root = tmpDir()
    val cat = new PipeCatalog()
    val eng = new SyncEngine(spark, root, catalog = Some(cat))
    val spec = PipeSpec(PipeKeys("test", "uuidkeep"),
      columns = ColumnRoles(Map("primary" -> "pk")),
      dtypes = Map("u" -> graft.types.MrsmType.MUuid))
    cat.register(spec)
    eng.sync(spec, Seq((1L, "0f8fad5b-d9cb-469f-a165-70867728950e")).toDF("pk", "u"))
    // uuid rides as string physically; the declared uuid must not degrade to str
    assert(cat.get(spec.keys).exists(
      _.dtypes.get("u").contains(graft.types.MrsmType.MUuid)))
  }

  // ── dtype enforcement on read ───────────────────────────────────────────

  test("getData enforces declared dtypes on the result") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "readenforce"),
      columns = ColumnRoles(Map("primary" -> "pk")),
      dtypes = Map("a" -> graft.types.MrsmType.MNumeric(10, 2),
                   "b" -> graft.types.MrsmType.MInt32))
    // raw storage write: no write-side cast happened
    eng.storage(spec).create(Seq((1L, 1.555, 7L)).toDF("pk", "a", "b"))
    val got = eng.getData(spec)
    assert(got.schema("a").dataType == org.apache.spark.sql.types.DecimalType(10, 2))
    assert(got.schema("b").dataType == org.apache.spark.sql.types.IntegerType)
    // enforce=false leaves the stored types alone
    val loose = eng.getData(spec.copy(enforce = false))
    assert(loose.schema("a").dataType == org.apache.spark.sql.types.DoubleType)
  }

  // ── dt-moving update in upsert ──────────────────────────────────────────

  test("upsert moving a key's dt across a chunk boundary does not duplicate") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "dtmove"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")),
      upsert = true, chunkMinutes = 1440)
    eng.sync(spec, batch(Seq(
      ("2024-01-01 10:00:00", 1L, 1.0),
      ("2024-01-02 10:00:00", 2L, 2.0))))
    // id=1 moves from the Jan-1 chunk to Jan-5 — a different partition dir.
    // The tag window (batch dt envelope) can't see the Jan-1 row, so the row
    // counts as an insert; what matters is that the stray-chunk scan removes
    // the old row instead of leaving a duplicate behind.
    val r = eng.sync(spec, batch(Seq(("2024-01-05 10:00:00", 1L, 9.0))))
    assert(r.total == 1)
    assert(eng.storage(spec).rowCount == 2)
    val got = eng.getData(spec, params = Map("id" -> 1L))
      .select("dt", "val").as[(LocalDateTime, Double)].collect()
    assert(got.toSeq == Seq((LocalDateTime.parse("2024-01-05T10:00:00"), 9.0)))
  }

  test("diff-mode dt move inside the diff envelope does not duplicate") {
    // minute chunks: the 10:00:50 row moves 20s to 10:01:10 — a different
    // chunk directory but inside the ±1-minute diff envelope, so it tags as
    // an update and the BOUNDED stray scan removes the old chunk's row.
    // (A move beyond the envelope is a NEW event in diff mode by design —
    // the reference's same semantics; key-identity pipes use upsert mode.)
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "dtmove_diff"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")),
      chunkMinutes = 1)
    eng.sync(spec, batch(Seq(("2024-01-01 10:00:50", 1L, 1.0))))
    val r = eng.sync(spec, batch(Seq(("2024-01-01 10:01:10", 1L, 2.0))))
    assert(r.updated == 1)
    assert(eng.storage(spec).rowCount == 1)
    val got = eng.getData(spec).select("dt", "val")
      .as[(LocalDateTime, Double)].head()
    assert(got == ((LocalDateTime.parse("2024-01-01T10:01:10"), 2.0)))
  }

  test("upsert where the stray chunk loses ALL rows removes its directory") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "dtmove_all"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")),
      upsert = true, chunkMinutes = 1440)
    eng.sync(spec, batch(Seq(("2024-01-01 10:00:00", 1L, 1.0))))
    eng.sync(spec, batch(Seq(("2024-01-05 10:00:00", 1L, 9.0))))
    assert(eng.storage(spec).rowCount == 1)
    val base = new java.io.File(s"$root/${spec.targetName}/data")
    val parts = base.listFiles().map(_.getName).filter(_.startsWith("__graft_chunk="))
    assert(parts.toSeq == Seq("__graft_chunk=2024-01-05"))
  }

  // ── distributed autoincrement ───────────────────────────────────────────

  test("autoincrement: dense ids on a multi-partition batch, continues from max") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "autoinc"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "rid")),
      autoincrement = true)
    val b1 = (1 to 100).map(i => (s"2024-01-01 00:${"%02d".format(i % 60)}:00", i.toLong, i * 1.0))
    eng.sync(spec, batch(b1).drop("id").repartition(7))
    val ids1 = eng.getData(spec).select("rid").as[Long].collect().sorted
    assert(ids1.toSeq == (1L to 100L))
    // second batch continues from the stored max
    val b2 = (1 to 50).map(i => (s"2024-01-02 00:${"%02d".format(i % 60)}:00", i.toLong, i * 1.0))
    eng.sync(spec, batch(b2).drop("id").repartition(5))
    val ids2 = eng.getData(spec).select("rid").as[Long].collect().sorted
    assert(ids2.toSeq == (1L to 150L))
  }

  // ── precision stamping ──────────────────────────────────────────────────

  test("autotime with 5-minute round-down precision stamps aligned timestamps") {
    val root = tmpDir()
    val eng = new SyncEngine(spark, root,
      clock = () => LocalDateTime.parse("2024-03-07T10:13:27"))
    val spec = PipeSpec(PipeKeys("test", "prec"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "pk")),
      autotime = true, precision = Some(Precision("minute", 5, "down")))
    eng.sync(spec, Seq((1L, "a"), (2L, "b")).toDF("pk", "v"))
    val stamps = eng.getData(spec).select("dt").as[LocalDateTime].collect().distinct
    assert(stamps.toSeq == Seq(LocalDateTime.parse("2024-03-07T10:10:00")))
  }

  test("autotime precision on an epoch axis rounds in axis units") {
    val root = tmpDir()
    val eng = new SyncEngine(spark, root,
      clock = () => LocalDateTime.parse("2024-03-07T10:13:27"))
    val spec = PipeSpec(PipeKeys("test", "prec_epoch"),
      columns = ColumnRoles(Map("datetime" -> "ts", "primary" -> "pk")),
      autotime = true, epochUnit = Some("second"),
      precision = Some(Precision("second", 300, "down")))
    eng.sync(spec, Seq((1L, "a")).toDF("pk", "v"))
    val want = (LocalDateTime.parse("2024-03-07T10:13:27")
      .toEpochSecond(java.time.ZoneOffset.UTC) / 300) * 300
    assert(eng.getData(spec).select("ts").as[Long].head() == want)
  }

  test("interval rounding column functions: floor/ceil/closest") {
    val df = Seq("2024-03-07 10:13:27", "2024-03-07 10:15:00", "2024-03-07 10:17:31")
      .toDF("s").select(to_timestamp_ntz(col("s")).as("t"))
    val got = df.select(
      RoundTime.floorInterval(col("t"), "minute", 5).cast("timestamp_ntz").as("f"),
      RoundTime.ceilInterval(col("t"), "minute", 5).cast("timestamp_ntz").as("c"),
      RoundTime.closestInterval(col("t"), "minute", 5).cast("timestamp_ntz").as("n"))
      .as[(LocalDateTime, LocalDateTime, LocalDateTime)].collect()
    def t(s: String) = LocalDateTime.parse(s)
    assert(got(0) == ((t("2024-03-07T10:10:00"), t("2024-03-07T10:15:00"), t("2024-03-07T10:15:00"))))
    assert(got(1) == ((t("2024-03-07T10:15:00"), t("2024-03-07T10:15:00"), t("2024-03-07T10:15:00"))))
    // 10:17:31 is 149s from 10:20 and 151s from 10:15 — closest rounds up
    assert(got(2) == ((t("2024-03-07T10:15:00"), t("2024-03-07T10:20:00"), t("2024-03-07T10:20:00"))))
  }

  test("precision persists through the catalog store") {
    val path = s"${tmpDir()}/cat"
    val cat = new PipeCatalog()
    cat.register(PipeSpec(PipeKeys("test", "precstore"),
      precision = Some(Precision("minute", 5, "closest"))))
    PipeCatalogStore.save(spark, path, cat)
    val back = PipeCatalogStore.load(spark, path).get(PipeKeys("test", "precstore"))
    assert(back.exists(_.precision.contains(Precision("minute", 5, "closest"))))
  }

  // ── content-aware verify ────────────────────────────────────────────────

  test("verify catches count-neutral corruption; rowcount-only does not") {
    def freshlyCorrupted(): (SyncEngine, PipeSpec, DataFrame) = {
      val root = tmpDir(); val eng = new SyncEngine(spark, root, retryBaseSleepMs = 1)
      val spec = PipeSpec(PipeKeys("test", "vcontent"),
        columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")),
        chunkMinutes = 1440)
      val src = batch(Seq(
        ("2024-01-01 10:00:00", 1L, 1.0),
        ("2024-01-02 10:00:00", 2L, 2.0),
        ("2024-01-03 10:00:00", 3L, 3.0)))
      eng.sync(spec, src)
      // corrupt day 2's value through raw storage: counts unchanged
      eng.storage(spec).upsert(
        batch(Seq(("2024-01-02 10:00:00", 2L, 666.0))), Seq("id"))
      (eng, spec, src)
    }
    val (e1, s1, src1) = freshlyCorrupted()
    val blind = Maintenance.verify(e1, s1, src1, checkContent = false)
    assert(blind.chunksMismatched == 0) // silent pass — the round-2 defect
    val (e2, s2, src2) = freshlyCorrupted()
    val r2 = Maintenance.verify(e2, s2, src2) // checkContent default true
    assert(r2.chunksMismatched == 1)
    // repair is window REPLACEMENT (clear + blind re-append), so the fixed
    // row reports as an insert of the replaced window, not an update
    assert(r2.resync.inserted == 1 && r2.resync.updated == 0)
    val vals = e2.getData(s2).orderBy("id").select("val").as[Double].collect()
    assert(vals.toSeq == Seq(1.0, 2.0, 3.0))
  }

  // ── special-column inference ────────────────────────────────────────────

  test("uuid/json shapes in string columns are inferred and persisted") {
    val root = tmpDir()
    val cat = new PipeCatalog()
    val eng = new SyncEngine(spark, root, catalog = Some(cat))
    val spec = PipeSpec(PipeKeys("test", "inferspecial"),
      columns = ColumnRoles(Map("primary" -> "pk")))
    val df = Seq(
      (1L, "0f8fad5b-d9cb-469f-a165-70867728950e", """{"a": 1}""", "plain"),
      (2L, "7C9E6679-7425-40DE-944B-E07FC1F90AE7", """[1, 2, 3]""", "123"))
      .toDF("pk", "u", "j", "s")
    eng.sync(spec, df)
    val dts = cat.get(spec.keys).map(_.dtypes).getOrElse(Map.empty)
    assert(dts.get("u").contains(graft.types.MrsmType.MUuid))
    assert(dts.get("j").contains(graft.types.MrsmType.MJson))
    assert(dts.get("s").contains(graft.types.MrsmType.MStr)) // mixed → plain
    // physical schema unchanged: both ride as string
    assert(eng.getData(spec).schema("u").dataType ==
      org.apache.spark.sql.types.StringType)
  }

  test("inference skips declared columns and non-uniform shapes") {
    val df = Seq(
      ("0f8fad5b-d9cb-469f-a165-70867728950e", """{"a":1}""", "{broken"),
      ("not-a-uuid", """{"b":2}""", """{"ok":1}"""))
      .toDF("mixed_u", "j", "half_json")
    val got = graft.ops.SpecialCols.infer(df, declared = Set("j"))
    assert(got == Map.empty) // mixed_u not uniform, j declared, half_json invalid
    val all = graft.ops.SpecialCols.infer(df)
    assert(all == Map("j" -> graft.types.MrsmType.MJson))
  }

  // ── pipe-DAG parameter inheritance + children ───────────────────────────

  test("references inherit roles/dtypes/tags; own values win; later ref wins") {
    val cat = new PipeCatalog()
    val base = PipeSpec(PipeKeys("dag", "base"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "station")),
      dtypes = Map("temp" -> graft.types.MrsmType.MFloat),
      tags = Seq("weather"), epochUnit = Some("second"))
    val base2 = PipeSpec(PipeKeys("dag", "base2"),
      columns = ColumnRoles(Map("id" -> "sensor")),
      dtypes = Map("temp" -> graft.types.MrsmType.MNumeric(10, 2)))
    val child = PipeSpec(PipeKeys("dag", "child"),
      columns = ColumnRoles(Map("datetime" -> "observed_at")),
      tags = Seq("derived"),
      references = Seq(base.keys, base2.keys))
    Seq(base, base2, child).foreach(cat.register)
    val r = cat.resolve(child.keys).get
    assert(r.columns.datetime.contains("observed_at"))       // own wins
    assert(r.columns.roles.get("id").contains("sensor"))     // later ref wins
    assert(r.dtypes.get("temp").contains(graft.types.MrsmType.MNumeric(10, 2)))
    assert(r.tags.toSet == Set("weather", "derived"))
    assert(r.epochUnit.contains("second"))                   // inherited option
    // free-form extras merge entry-wise, child wins
    val withExtras = cat.register(child.copy(
      extras = Map("fetch.definition" -> "SELECT 2")))
    cat.register(base.copy(extras = Map(
      "fetch.definition" -> "SELECT 1", "owner" -> "weather-team")))
    val r2 = cat.resolve(withExtras.keys).get
    assert(r2.extras == Map(
      "fetch.definition" -> "SELECT 2", "owner" -> "weather-team"))
  }

  test("reference cycles fall back to the raw spec; children are unioned") {
    val cat = new PipeCatalog()
    val a = PipeSpec(PipeKeys("dag", "a"),
      tags = Seq("ta"), references = Seq(PipeKeys("dag", "b")),
      children = Seq(PipeKeys("dag", "c")))
    val b = PipeSpec(PipeKeys("dag", "b"),
      tags = Seq("tb"), references = Seq(PipeKeys("dag", "a")))
    val c = PipeSpec(PipeKeys("dag", "c"))
    val d = PipeSpec(PipeKeys("dag", "d"), parents = Seq(a.keys))
    Seq(a, b, c, d).foreach(cat.register)
    // a -> b -> a cycle: b contributes its raw tags, the loop arm is dropped
    assert(cat.resolve(a.keys).get.tags.toSet == Set("tb", "ta"))
    assert(cat.childrenOf(a.keys).map(_.keys.metric).sorted == Seq("c", "d"))
  }

  test("sync by keys resolves inherited parameters from the catalog") {
    val root = tmpDir()
    val cat = new PipeCatalog()
    val eng = new SyncEngine(spark, root, catalog = Some(cat))
    // the base defines the layout; the child only declares its reference
    val base = PipeSpec(PipeKeys("dag", "layout"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    val child = PipeSpec(PipeKeys("dag", "leaf"),
      references = Seq(base.keys))
    Seq(base, child).foreach(cat.register)
    val r = eng.sync(child.keys, batch(Seq(
      ("2024-01-01 00:00:00", 1L, 1.0),
      ("2024-01-01 00:00:00", 1L, 2.0)))) // same key: inherited roles dedupe
    assert(r.inserted == 1)
    assert(eng.storage(cat.resolve(child.keys).get).rowCount == 1)
  }

  test("dtype persistence neither flattens inheritance nor downgrades it") {
    val root = tmpDir()
    val cat = new PipeCatalog()
    val eng = new SyncEngine(spark, root, catalog = Some(cat))
    val base = PipeSpec(PipeKeys("dag", "uuidbase"),
      columns = ColumnRoles(Map("primary" -> "pk")),
      dtypes = Map("u" -> graft.types.MrsmType.MUuid),
      tags = Seq("base-tag"))
    val child = PipeSpec(PipeKeys("dag", "uuidchild"), references = Seq(base.keys))
    Seq(base, child).foreach(cat.register)
    eng.sync(child.keys,
      Seq((1L, "0f8fad5b-d9cb-469f-a165-70867728950e")).toDF("pk", "u"))
    val raw = cat.get(child.keys).get
    // the registered child keeps its reference edge and does NOT absorb the
    // base's tags/columns; the inherited uuid dtype is preserved, not
    // downgraded to str by the physical-string schema
    assert(raw.references == Seq(base.keys))
    assert(raw.tags.isEmpty && raw.columns.roles.isEmpty)
    assert(raw.dtypes.get("u").contains(graft.types.MrsmType.MUuid))
    assert(cat.resolve(child.keys).get.tags == Seq("base-tag")) // still follows base
  }

  test("autoincrement minting is retry-idempotent (mark commits after the write)") {
    val root = tmpDir()
    val eng = new SyncEngine(spark, root, retries = 3, retryBaseSleepMs = 1)
    val spec = PipeSpec(PipeKeys("test", "autoinc_retry"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "rid")),
      autoincrement = true)
    val b = batch(Seq(
      ("2024-01-01 00:00:00", 1L, 1.0),
      ("2024-01-01 01:00:00", 2L, 2.0))).drop("id")
    eng.sync(spec, b)
    val store = eng.storage(spec)
    assert(store.readMaxId.contains(2L))
    // simulate the partial-failure shape: the data landed but the attempt
    // died BEFORE the mark commit (the mark is written last now) — roll
    // the mark back and replay the same batch, as the retry loop would
    store.writeMaxId(0L)
    eng.sync(spec, b)
    val rows = eng.getData(spec).select("rid").collect().map(_.getLong(0)).sorted
    // the replay re-read the old mark, re-minted the SAME ids, and the
    // diff deduped the already-persisted rows: no duplicates, no id gaps
    assert(rows.toSeq == Seq(1L, 2L), s"got ${rows.toSeq}")
    assert(store.readMaxId.contains(2L)) // replay re-committed the mark
    // a later batch continues from the committed mark
    eng.sync(spec, batch(Seq(("2024-01-02 00:00:00", 3L, 3.0))).drop("id"))
    val all = eng.getData(spec).select("rid").collect().map(_.getLong(0)).sorted
    assert(all.toSeq == Seq(1L, 2L, 3L), s"got ${all.toSeq}")
    // and minting syncs now use the full retry budget (failures before the
    // write retry like any other sync)
    var attempts = 0
    val alwaysFail = new SyncStrategy {
      def sync(e: SyncEngine, s: PipeSpec, b: DataFrame): SyncResult = {
        attempts += 1; throw new RuntimeException("boom")
      }
    }
    intercept[RuntimeException] {
      eng.sync(spec.copy(keys = PipeKeys("test", "autoinc_retry2"),
          strategy = Some(alwaysFail)),
        batch(Seq(("2024-01-01 00:00:00", 1L, 1.0))).drop("id"))
    }
    assert(attempts == 3)
  }

  test("references and children persist through the catalog store") {
    val path = s"${tmpDir()}/cat"
    val cat = new PipeCatalog()
    cat.register(PipeSpec(PipeKeys("dag", "persisted"),
      references = Seq(PipeKeys("dag", "base")),
      children = Seq(PipeKeys("dag", "kid", Some("loc"))),
      extras = Map("fetch.definition" -> "SELECT 1", "note" -> "x")))
    PipeCatalogStore.save(spark, path, cat)
    val back = PipeCatalogStore.load(spark, path).get(PipeKeys("dag", "persisted")).get
    assert(back.references == Seq(PipeKeys("dag", "base")))
    assert(back.children == Seq(PipeKeys("dag", "kid", Some("loc"))))
    assert(back.extras == Map("fetch.definition" -> "SELECT 1", "note" -> "x"))
  }

  // ── deduplicate: narrow pre-pass correctness across chunks ──────────────

  test("deduplicate picks one survivor when a key's duplicates span chunks") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "dedupspan"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")),
      chunkMinutes = 1440)
    val store = eng.storage(spec)
    // raw appends bypass the sync diff: id=1 duplicated across Jan-1 and
    // Jan-3 chunks (different dt), id=2 clean, id=3 duplicated within Jan-2
    store.create(batch(Seq(
      ("2024-01-01 10:00:00", 1L, 1.0),
      ("2024-01-02 10:00:00", 2L, 2.0),
      ("2024-01-02 11:00:00", 3L, 3.0))))
    store.append(batch(Seq(
      ("2024-01-03 10:00:00", 1L, 9.0),
      ("2024-01-02 11:00:00", 3L, 8.0))))
    // dedupe on id alone, newest dt wins → id=1 keeps the Jan-3 row;
    // id=3's duplicates share a dt, so `val` is the explicit tiebreak
    // (without one, rank order among dt-ties is file-encounter order —
    // the same non-promise the reference's ROW_NUMBER dedup makes)
    val removed = store.deduplicate(Seq("id"), Seq("dt", "val"))
    assert(removed == 2)
    val got = eng.getData(spec).orderBy("id")
      .select("id", "val").as[(Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 9.0), (2L, 2.0), (3L, 8.0)))
    // the untouched would-be-clean chunk layout survives: Jan-1 dir is gone
    // (its only row lost), Jan-2 and Jan-3 remain
    val base = new java.io.File(s"$root/${spec.targetName}/data")
    val parts = base.listFiles().map(_.getName)
      .filter(_.startsWith("__graft_chunk=")).sorted
    assert(parts.toSeq == Seq("__graft_chunk=2024-01-02", "__graft_chunk=2024-01-03"))
  }

  test("content-aware verify repairs an epoch-axis pipe") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root, retryBaseSleepMs = 1)
    val spec = PipeSpec(PipeKeys("test", "vepoch"),
      columns = ColumnRoles(Map("datetime" -> "ts", "primary" -> "id")),
      epochUnit = Some("second"), chunkMinutes = 1440)
    val src = Seq((86400L, 1L, 1.0), (172800L, 2L, 2.0), (259200L, 3L, 3.0))
      .toDF("ts", "id", "val")
    eng.sync(spec, src)
    eng.storage(spec).upsert(
      Seq((172800L, 2L, 666.0)).toDF("ts", "id", "val"), Seq("id"))
    val r = Maintenance.verify(eng, spec, src, windowMinutes = Some(1440))
    assert(r.chunksMismatched == 1)
    val vals = eng.getData(spec).orderBy("id").select("val").as[Double].collect()
    assert(vals.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("datetime bounds translate onto an epoch-integer axis") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "epoch_begin"),
      columns = ColumnRoles(Map("datetime" -> "ts", "id" -> "id")),
      epochUnit = Some("millisecond"), chunkMinutes = 1440)
    def epoch(day: Int): Long = java.time.LocalDateTime.of(2026, 5, day, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    eng.sync(spec, Seq(28, 29, 30, 31).map(d => (epoch(d), d.toLong)).toDF("ts", "id"))
    // get_data with a DATETIME begin filters by the translated epoch
    val got = eng.getData(spec,
        begin = Some(java.time.LocalDateTime.of(2026, 5, 30, 0, 0)))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(30L, 31L))
    // clear with a datetime end removes the earlier rows
    eng.clear(spec, end = Some(java.time.LocalDateTime.of(2026, 5, 30, 0, 0)))
    val rest = eng.getData(spec).select("id").as[Long].collect().sorted
    assert(rest.toSeq == Seq(30L, 31L))
    assert(eng.rowCount(spec,
      begin = Some(java.time.LocalDateTime.of(2026, 5, 31, 0, 0))) == 1L)
  }

  test("upsert pipe with no value columns stays idempotent") {
    // reference tests/test_sync.py:814-843 — every column is a key
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "upsert_no_vals"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")),
      upsert = true)
    val rows = Seq(("2023-01-01 00:00:00", 1L), ("2023-01-02 00:00:00", 2L),
      ("2023-01-03 00:00:00", 3L))
      .toDF("dts", "id").withColumn("dt", to_timestamp_ntz(col("dts")))
      .select("dt", "id")
    eng.sync(spec, rows)
    eng.sync(spec, rows.where(col("id") === 3L))
    assert(eng.storage(spec).rowCount == 3)
  }

  test("params-filtered sync time for multiplexed pipes") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "synctime_params"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    eng.sync(spec, batch(Seq(
      ("2024-01-01 00:00:00", 1L, 1.0),
      ("2024-06-01 00:00:00", 2L, 2.0))))
    val a = eng.syncTime(spec, Map("id" -> 1L))
    val b = eng.syncTime(spec, Map("id" -> 2L))
    assert(a.contains(LocalDateTime.parse("2024-01-01T00:00:00")))
    assert(b.contains(LocalDateTime.parse("2024-06-01T00:00:00")))
    assert(a.get.isBefore(b.get))
    assert(eng.syncTime(spec, Map("id" -> 99L)).isEmpty)
  }

  // ── deterministic sampling ──────────────────────────────────────────────

  test("hash split is deterministic, partition-independent, and ~weighted") {
    val ids = (1L to 2000L).toDF("id")
    def dist(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("s", graft.ops.Sampling.splitLabel(col("id"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = dist(ids)
    val b = dist(ids.repartition(13))
    assert(a == b) // resharding never moves a row's split
    assert(a("train") > 1400 && a("train") < 1800) // ~80% of 2000
    assert(a("val") + a("test") + a("train") == 2000)
    // holdout slice: weights below the space leave nulls
    val hold = ids.withColumn("s", graft.ops.Sampling.splitLabel(col("id"),
      Seq("train" -> 50), buckets = 100)).where(col("s").isNull).count()
    assert(hold > 800 && hold < 1200)
    // percent sample is a subset of itself at higher percent
    val p10 = ids.where(graft.ops.Sampling.samplePredicate(col("id"), 10))
      .as[Long].collect().toSet
    val p20 = ids.where(graft.ops.Sampling.samplePredicate(col("id"), 20))
      .as[Long].collect().toSet
    assert(p10.subsetOf(p20)) // append/threshold-stable membership
  }

  test("kernel minhash signatures match the composed column form exactly") {
    import org.apache.spark.sql.functions.{aggregate => _, transform => transform_, _}
    val P = 2147483647L
    def composed(text: org.apache.spark.sql.Column, shingleSize: Int, k: Int,
                 seed: Long): org.apache.spark.sql.Column = {
      val rng = new scala.util.Random(seed)
      val coefs = Seq.fill(k)(
        (math.abs(rng.nextLong()) % (P - 1) + 1, math.abs(rng.nextLong()) % P))
      val hashes = transform_(
        graft.functions.TextFns.wordShingles(text, shingleSize),
        s => pmod(xxhash64(s), lit(P)))
      array(coefs.map { case (a, b) =>
        coalesce(
          array_min(transform_(hashes, h => pmod(h * lit(a) + lit(b), lit(P)))),
          lit(Long.MaxValue))
      }: _*)
    }
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs and more",
      "one two", // shorter than the shingle size -> all-MaxValue
      "",
      "single").toDF("text")
    for (n <- Seq(1, 3)) {
      val rows = docs.select(
        graft.ops.ApproxDedup.minhashSignature(col("text"), n, 24).as("fast"),
        composed(col("text"), n, 24, seed = 7L).as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"shingleSize=$n")
      }
    }
  }

  // ── stored minhash band-index probe ─────────────────────────────────────

  test("band-index probe candidates equal the in-plan LSH candidates for a doc") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words that share nothing with the others at all"),
      (4L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val inPlan = graft.ops.ApproxDedup
      .minhashCandidates(docs, "doc_id", "text", 3, 24, 12)
      .where(col("id1") === 1L || col("id2") === 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = graft.ops.ApproxDedup
      .minhashBandIndex(docs, "doc_id", "text", 3, 24, 12, buckets = 8)
    val qKeys = index.where(col("doc_id") === 1L)
      .select("band", "bandHash").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val probed = index.where(col("doc_id") =!= 1L)
      .collect()
      .filter(r => qKeys.contains((r.getInt(1), r.getInt(2))))
      .map(r => (math.min(1L, r.getLong(0)), math.max(1L, r.getLong(0)))).toSet
    assert(probed == inPlan)
    assert(probed.contains((1L, 2L)) && probed.contains((1L, 4L)))
    assert(!probed.exists(p => p._1 == 3L || p._2 == 3L))
  }

  // ── native vector expressions ───────────────────────────────────────────

  test("codegen vector expressions match the higher-order-function forms") {
    import org.apache.spark.sql.functions.{aggregate => agg_, transform => transform_, _}
    val rng = new scala.util.Random(11)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rng.nextGaussian()), Seq.fill(16)(rng.nextGaussian())))
      .toDF("id", "a", "b")
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      agg_(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def hofNorm(x: org.apache.spark.sql.Column) =
      sqrt(agg_(transform_(x, v => v * v), lit(0.0), (acc, v) => acc + v))
    val planes = Seq.fill(24)(Seq.fill(16)(rng.nextGaussian()))
    val hofSig = planes.zipWithIndex.map { case (p, i) =>
      when(hofDot(col("a"), array(p.map(lit): _*)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val rows = vecs.select(
      graft.functions.VectorFns.dot(col("a"), col("b")).as("d1"),
      hofDot(col("a"), col("b")).as("d2"),
      graft.functions.VectorFns.cosine(col("a"), col("b")).as("c1"),
      (hofDot(col("a"), col("b")) / (hofNorm(col("a")) * hofNorm(col("b")))).as("c2"),
      graft.functions.VectorFns.srpSignaturePlanes(col("a"), planes).as("s1"),
      hofSig.as("s2")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot exact") // bit-exact, not approx
      assert(r.getDouble(2) == r.getDouble(3), "cosine exact")
      assert(r.getLong(4) == r.getLong(5), "srp signature exact")
    }
    // null element and length-mismatch semantics follow the zip_with rules
    val edge = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
      .select(graft.functions.VectorFns.dot(col("a"), col("b")).as("d"),
        graft.functions.VectorFns.cosine(col("a"), slice(col("b"), 1, 1)).as("c"))
      .head()
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  // ── stored-index ANN probe ──────────────────────────────────────────────

  test("stored IVF cell probe is a partition-pruned read") {
    val root = tmpDir(); val eng = new SyncEngine(spark, root)
    val spec = PipeSpec(PipeKeys("test", "ivfstore"),
      columns = ColumnRoles(Map("datetime" -> "cell", "primary" -> "vid")),
      epochUnit = Some("minute"), chunkMinutes = 1)
    val vecs = (0 until 40).map(i => (i.toLong, Seq.fill(8)(((i * 7 + 3) % 11).toDouble)))
      .toDF("vid", "embedding")
    val cents = graft.ops.SimilaritySearch.sampleCentroids(vecs, "vid", "embedding", 4)
    val indexed = graft.ops.SimilaritySearch.withIvfCell(vecs, "embedding", cents)
    val store = eng.storage(spec)
    store.create(indexed)
    val probed = store.readIn(Seq(1L, 3L))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("__graft_chunk"), plan)
    // one scan, only rows of the probed cells
    assert(probed.select("cell").distinct().as[Int].collect().toSet.subsetOf(Set(1, 3)))
    assert(probed.count() ==
      indexed.where(col("cell").isin(1, 3)).count())
  }
}
