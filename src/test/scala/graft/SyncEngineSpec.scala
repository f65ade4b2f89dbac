package graft

import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.sync.SyncEngine

/** Sync behavior ported from the reference's test_sync.py /
  * test_filter_existing.py scenarios (FIXTURES.md §1, §3).
  *
  * Abstract over the [[graft.storage.InstanceStore]] backend: the SAME
  * scenarios run against the parquet store and the in-memory store, so the
  * instance-connector seam is proven by the suite, not asserted. */
abstract class SyncEngineSuite extends SparkSpec {
  protected def mkEngine(root: String): SyncEngine
  /** Physical-layout assertions (chunk dirs, file mtimes, partition-filter
    * plans) only apply to the parquet backend; behavior assertions run on
    * every backend. */
  protected def fileBacked: Boolean = true

  import spark.implicits._

  private def mkSpec(root: String, name: String, upsert: Boolean = false): PipeSpec =
    PipeSpec(
      keys = PipeKeys("test", name),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")),
      upsert = upsert)

  private def batch(rows: Seq[(String, Long, Double)]): DataFrame =
    rows.toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
      .select("dt", "id", "val")

  private val b1 = Seq(
    ("2024-01-01 00:00:00", 1L, 1.0),
    ("2024-01-01 00:01:00", 1L, 2.0),
    ("2024-01-01 00:00:00", 2L, 3.0))

  test("idempotent re-sync: second identical batch is a no-op") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "idem")
    val r1 = eng.sync(spec, batch(b1))
    assert(r1.inserted == 3 && r1.updated == 0)
    val r2 = eng.sync(spec, batch(b1))
    assert(r2.inserted == 0 && r2.updated == 0)
    assert(eng.storage(spec).rowCount == 3)
  }

  test("changed value for existing key -> update, not insert") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "upd")
    eng.sync(spec, batch(b1))
    val r = eng.sync(spec, batch(Seq(("2024-01-01 00:00:00", 1L, 99.0))))
    assert(r.inserted == 0 && r.updated == 1)
    val got = eng.getData(spec, params = Map("id" -> 1L))
    val vals = got.select("val").as[Double].collect().sorted
    assert(vals.toSeq == Seq(2.0, 99.0))
    assert(eng.storage(spec).rowCount == 3)
  }

  test("new keys -> insert only") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "ins")
    eng.sync(spec, batch(b1))
    val r = eng.sync(spec, batch(Seq(("2024-01-02 00:00:00", 9L, 5.0))))
    assert(r.inserted == 1 && r.updated == 0)
    assert(eng.storage(spec).rowCount == 4)
  }

  test("intra-batch duplicate keys collapse before apply") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "dupb")
    val r = eng.sync(spec, batch(Seq(
      ("2024-01-01 00:00:00", 1L, 1.0),
      ("2024-01-01 00:00:00", 1L, 2.0))))
    assert(r.total == 1)
    assert(eng.storage(spec).rowCount == 1)
  }

  test("upsert mode: overlapping batch applies without diff, stays idempotent") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "ups", upsert = true)
    eng.sync(spec, batch(b1))
    val r = eng.sync(spec, batch(Seq(
      ("2024-01-01 00:00:00", 1L, 42.0),    // existing key -> update
      ("2024-01-03 00:00:00", 3L, 7.0))))   // new key -> insert
    assert(r.inserted == 1 && r.updated == 1)
    assert(eng.storage(spec).rowCount == 4)
    val v = eng.getData(spec, params = Map("id" -> 1L),
        begin = Some(LocalDateTime.parse("2024-01-01T00:00:00")),
        end   = Some(LocalDateTime.parse("2024-01-01T00:00:30")))
      .select("val").as[Double].collect()
    assert(v.toSeq == Seq(42.0))
  }

  test("schema evolution: new column arrives, old rows padded with null") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "evo")
    eng.sync(spec, batch(b1))
    val withNew = batch(Seq(("2024-01-05 00:00:00", 5L, 1.5)))
      .withColumn("extra", lit("x"))
    val r = eng.sync(spec, withNew)
    assert(r.inserted == 1)
    val all = eng.getData(spec)
    assert(all.columns.contains("extra"))
    assert(all.where(col("extra").isNull).count() == 3)
  }

  test("mixed int/float value promotes to numeric (mixed_numerics)") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "mix")
    val ints = Seq(("2024-01-01 00:00:00", 1L, 10L)).toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    eng.sync(spec, ints)
    val floats = Seq(("2024-01-02 00:00:00", 2L, 1.5)).toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    eng.sync(spec, floats)
    val schema = eng.getData(spec).schema("val").dataType
    assert(schema.isInstanceOf[org.apache.spark.sql.types.DecimalType])
    assert(eng.storage(spec).rowCount == 2)
  }

  test("null index values with null_indices: null-safe key join") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "nulls").copy(nullIndices = true)
    val withNull = Seq(
      ("2024-01-01 00:00:00", Some(1L), 1.0),
      ("2024-01-01 00:00:00", None, 2.0)).toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    eng.sync(spec, withNull)
    // re-sync with changed value for the null-keyed row: must be an update
    val again = Seq(("2024-01-01 00:00:00", Option.empty[Long], 9.0))
      .toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    val r = eng.sync(spec, again)
    assert(r.inserted == 0 && r.updated == 1)
    assert(eng.storage(spec).rowCount == 2)
  }

  test("primary-key pipe joins on pk alone") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = PipeSpec(PipeKeys("test", "pk"),
      columns = ColumnRoles(Map("primary" -> "pk")))
    val d1 = Seq((1L, "a"), (2L, "b")).toDF("pk", "payload")
    eng.sync(spec, d1)
    val r = eng.sync(spec, Seq((2L, "B"), (3L, "c")).toDF("pk", "payload"))
    assert(r.inserted == 1 && r.updated == 1)
    val got = eng.getData(spec).orderBy("pk").as[(Long, String)].collect()
    assert(got.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("getData: bounds, params, select, omit, order, limit") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "read")
    eng.sync(spec, batch(b1))
    val got = eng.getData(spec,
      select = Seq("dt", "id"),
      begin = Some(LocalDateTime.parse("2024-01-01T00:00:00")),
      end   = Some(LocalDateTime.parse("2024-01-01T00:00:30")),
      params = Map("id" -> Seq(1L, 2L)),
      limit = Some(10))
    assert(got.columns.toSeq == Seq("dt", "id"))
    assert(got.count() == 2)
  }

  test("clear removes a half-open range; drop removes the target") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "clr")
    eng.sync(spec, batch(b1))
    val store = eng.storage(spec)
    store.clear(col("dt") >= lit(LocalDateTime.parse("2024-01-01T00:00:30")))
    assert(store.rowCount == 2)
    store.drop()
    assert(!store.exists)
  }

  test("schema evolution: ADDED column leaves existing data files untouched") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "evo_nofiles")
    eng.sync(spec, batch(b1))
    val store = eng.storage(spec)
    def files(): Set[(String, Long)] = {
      val base = new java.io.File(s"$root/${spec.targetName}/data")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(base).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.lastModified())).toSet
    }
    val before = if (fileBacked) files() else Set.empty[(String, Long)]
    val withNew = batch(Seq(("2024-01-05 00:00:00", 5L, 1.5)))
      .withColumn("extra", lit("x"))
    eng.sync(spec, withNew)
    // every pre-existing file survives byte-identical (same path + mtime)
    if (fileBacked)
      assert(before.subsetOf(files()), "add-column sync rewrote existing files")
    assert(eng.getData(spec).where(col("extra").isNull).count() == 3)
  }

  test("chunk granularity follows spec.chunkMinutes: daily chunks, one-day rewrite") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "daily").copy(chunkMinutes = 1440)
    eng.sync(spec, batch(Seq(
      ("2024-01-01 10:00:00", 1L, 1.0),
      ("2024-01-02 10:00:00", 2L, 2.0),
      ("2024-01-03 10:00:00", 3L, 3.0))))
    val base = new java.io.File(s"$root/${spec.targetName}/data")
    def mtimes(): Map[String, Long] = base.listFiles()
      .filter(_.getName.startsWith("__graft_chunk="))
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    if (fileBacked) {
      val parts = base.listFiles().map(_.getName).filter(_.startsWith("__graft_chunk=")).sorted
      assert(parts.toSeq == Seq("__graft_chunk=2024-01-01",
        "__graft_chunk=2024-01-02", "__graft_chunk=2024-01-03"))
    }
    val before = if (fileBacked) mtimes() else Map.empty[String, Long]
    if (fileBacked) Thread.sleep(1100) // mtime granularity
    val r = eng.sync(spec, batch(Seq(("2024-01-02 10:00:00", 2L, 99.0))))
    assert(r.updated == 1)
    if (fileBacked) {
      val after = mtimes()
      val untouched = before.filter { case (p, t) => after.get(p).contains(t) }
      // day-1 and day-3 files byte-identical; only day-2 rewrote
      assert(untouched.keys.exists(_.contains("2024-01-01")))
      assert(untouched.keys.exists(_.contains("2024-01-03")))
      assert(!after.keys.filter(_.contains("2024-01-02")).exists(before.contains))
    }
  }

  test("epoch-second axis: idempotent sync, update, bookmark in axis units") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = PipeSpec(PipeKeys("test", "epoch"),
      columns = ColumnRoles(Map("datetime" -> "ts", "id" -> "id")),
      epochUnit = Some("second"), chunkMinutes = 1440)
    val b = Seq((1700000000L, 1L, 1.0), (1700000060L, 2L, 2.0)).toDF("ts", "id", "val")
    val r1 = eng.sync(spec, b)
    assert(r1.inserted == 2 && r1.updated == 0)
    val r2 = eng.sync(spec, b)
    assert(r2.inserted == 0 && r2.updated == 0)
    val r3 = eng.sync(spec, Seq((1700000060L, 2L, 9.0)).toDF("ts", "id", "val"))
    assert(r3.inserted == 0 && r3.updated == 1)
    assert(eng.storage(spec).rowCount == 2)
    assert(eng.storage(spec).syncTimeEpoch().contains(1700000060L))
    assert(eng.nextFetchBeginEpoch(spec).contains(1700000060L - 1440 * 60))
    val got = eng.getData(spec, beginEpoch = Some(1700000030L))
      .select("val").as[Double].collect()
    assert(got.toSeq == Seq(9.0))
  }

  test("deduplicate: removes stored duplicates, rewrites only losing chunks") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "dedup_store").copy(chunkMinutes = 1440)
    eng.sync(spec, batch(Seq(
      ("2024-01-01 10:00:00", 1L, 1.0),
      ("2024-01-02 10:00:00", 2L, 2.0),
      ("2024-01-03 10:00:00", 3L, 3.0))))
    val store = eng.storage(spec)
    // simulate an out-of-band duplicate landing in day 2
    store.append(batch(Seq(("2024-01-02 10:00:00", 2L, 99.0))))
    assert(store.rowCount == 4)
    val base = new java.io.File(s"$root/${spec.targetName}/data")
    def mtimes(): Map[String, Long] = base.listFiles()
      .filter(_.getName.startsWith("__graft_chunk="))
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet")))
      .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    val before = if (fileBacked) mtimes() else Map.empty[String, Long]
    if (fileBacked) Thread.sleep(1100)
    val removed = eng.deduplicate(spec, extraOrder = Seq("val"))
    assert(removed == 1)
    assert(store.rowCount == 3)
    // keep-latest by (dt, val desc): the 99.0 copy survives
    val v = eng.getData(spec, params = Map("id" -> 2L)).select("val").as[Double].collect()
    assert(v.toSeq == Seq(99.0))
    if (fileBacked) {
      val after = mtimes()
      val untouched = before.filter { case (p, t) => after.get(p).contains(t) }
      assert(untouched.keys.exists(_.contains("2024-01-01")))
      assert(untouched.keys.exists(_.contains("2024-01-03")))
      assert(!after.keys.filter(_.contains("2024-01-02")).exists(before.contains))
    }
    // idempotent: second pass removes nothing
    assert(eng.deduplicate(spec, extraOrder = Seq("val")) == 0)
  }

  test("bounded reads prune partition directories via the chunk label") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "prune").copy(chunkMinutes = 1440)
    eng.sync(spec, batch(Seq(
      ("2024-01-01 10:00:00", 1L, 1.0),
      ("2024-01-02 10:00:00", 2L, 2.0),
      ("2024-01-03 10:00:00", 3L, 3.0))))
    val got = eng.getData(spec,
      begin = Some(LocalDateTime.parse("2024-01-02T00:00:00")),
      end   = Some(LocalDateTime.parse("2024-01-03T00:00:00")))
    if (fileBacked) {
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan)
      assert(plan.contains("__graft_chunk"), plan)
    }
    assert(got.select("id").as[Long].collect().toSeq == Seq(2L))
    // epoch axis: numeric label comparison (lexicographic would be wrong)
    val especRoot = tmpDir(); val eeng = mkEngine(especRoot)
    val espec = PipeSpec(PipeKeys("test", "eprune"),
      columns = ColumnRoles(Map("datetime" -> "ts", "id" -> "id")),
      epochUnit = Some("second"), chunkMinutes = 1)
    // chunk per minute: labels 28333333 (9 digits) vs earlier 5-digit-safe?
    eeng.sync(espec, Seq((1699999000L, 1L), (1700000000L, 2L), (1700001200L, 3L))
      .toDF("ts", "id"))
    val egot = eeng.getData(espec,
      beginEpoch = Some(1700000000L), endEpoch = Some(1700001000L))
    assert(egot.select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("snapshot append is O(batch): existing segments untouched, atomic manifest flip") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = PipeSpec(PipeKeys("test", "snapappend"),
      columns = ColumnRoles(Map("primary" -> "pk")))
    val store = eng.storage(spec)
    store.create(Seq((1L, "a"), (2L, "b")).toDF("pk", "v"))
    def segFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      new java.io.File(s"$root/${spec.targetName}").listFiles()
        .filter(_.getName.startsWith("seg_")).flatMap(walk)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = if (fileBacked) segFiles() else Map.empty[String, Long]
    if (fileBacked) Thread.sleep(1100)
    store.append(Seq((3L, "c")).toDF("pk", "v"))
    if (fileBacked) {
      val after = segFiles()
      // original segment files survive byte-identical; only a new segment lands
      assert(before.forall { case (p, t) => after.get(p).contains(t) })
      assert(after.size > before.size)
    }
    assert(store.read.count() == 3)
    // upsert and vacuum still work on the manifest layout
    store.upsert(Seq((2L, "B")).toDF("pk", "v"), Seq("pk"))
    assert(store.read.where(col("pk") === 2L).select("v").as[String].head() == "B")
    store.vacuum()
    assert(store.read.count() == 3)
  }

  test("static pipe: schema frozen, extra incoming columns dropped") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "static").copy(static = true)
    eng.sync(spec, batch(b1))
    val r = eng.sync(spec, batch(Seq(("2024-01-09 00:00:00", 9L, 9.0)))
      .withColumn("surprise", lit("x")))
    assert(r.inserted == 1)
    assert(!eng.getData(spec).columns.contains("surprise"))
    assert(eng.storage(spec).rowCount == 4)
  }

  test("enforce=false: declared dtypes are not applied to batches") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = PipeSpec(PipeKeys("test", "noenforce"),
      columns = ColumnRoles(Map("primary" -> "pk")),
      dtypes = Map("a" -> graft.types.MrsmType.MNumeric(10, 2)),
      enforce = false)
    eng.sync(spec, Seq((1L, 1.555)).toDF("pk", "a"))
    assert(eng.getData(spec).schema("a").dataType ==
      org.apache.spark.sql.types.DoubleType)
  }

  test("sync time bookmark and backtrack begin") {
    val root = tmpDir(); val eng = mkEngine(root)
    val spec = mkSpec(root, "bt")
    eng.sync(spec, batch(b1))
    assert(eng.storage(spec).syncTime().contains(LocalDateTime.parse("2024-01-01T00:01:00")))
    assert(eng.nextFetchBegin(spec).contains(
      LocalDateTime.parse("2024-01-01T00:01:00").minusMinutes(1440)))
  }
}

/** The production parquet backend. */
class SyncEngineSpec extends SyncEngineSuite {
  protected def mkEngine(root: String) = new SyncEngine(spark, root)
}

/** The in-memory second backend — same behavior suite, different
  * InstanceStore implementation (reference: ValkeyConnector implements the
  * same instance interface as SQLConnector). */
class MemoryStoreSyncEngineSpec extends SyncEngineSuite {
  override protected def fileBacked = false
  protected def mkEngine(root: String) =
    new SyncEngine(spark, root, storeFactory = graft.storage.MemoryStore.factory)
}
