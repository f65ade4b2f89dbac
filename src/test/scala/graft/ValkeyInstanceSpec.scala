package graft

import graft.kv.{MiniValkey, Resp, RespConn}
import graft.sync.SyncEngine

/** One embedded RESP server shared by the Valkey-backend suites (daemon
  * threads; dies with the test JVM) — the role the reference's `mrsm
  * stack` valkey service plays for its connector tests. */
object TestMiniValkey {
  lazy val server = new MiniValkey()
}

/** The Valkey instance backend — the SAME behavior suite as the parquet,
  * in-memory, and HTTP backends, with every store call crossing a real
  * TCP RESP connection (reference: `connectors/valkey/_pipes.py` passes
  * the same `tests/pipes.py` suite as SQLConnector). */
class ValkeyStoreSyncEngineSpec extends SyncEngineSuite {
  override protected def fileBacked = false
  protected def mkEngine(root: String) =
    new SyncEngine(spark, root,
      storeFactory = graft.storage.ValkeyStore.factory(
        TestMiniValkey.server.host, TestMiniValkey.server.port))
}

/** RESP protocol + KV-seam specifics the shared suite doesn't reach. */
class ValkeyInstanceSpec extends SparkSpec {
  import java.time.LocalDateTime
  import org.apache.spark.sql.functions._
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import spark.implicits._

  private def srv = TestMiniValkey.server
  private def conn() = new RespConn(srv.host, srv.port)

  private def mkStore(name: String, roles: Map[String, String] = Map(
      "datetime" -> "dt", "id" -> "id")) =
    new graft.storage.ValkeyStore(spark, srv.host, srv.port, "vspec",
      PipeSpec(PipeKeys("valkey", name), columns = ColumnRoles(roles)))

  private def df3 = Seq(
      ("2024-01-01 00:00:00", 1L, 1.5),
      ("2024-01-02 00:00:00", 2L, 2.5),
      ("2024-01-03 00:00:00", 3L, 3.5))
    .toDF("dts", "id", "val")
    .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    .select("dt", "id", "val")

  // ── wire protocol ──────────────────────────────────────────────────────

  test("RESP round-trip: binary-safe bulk strings (CRLF + unicode payloads)") {
    val c = conn()
    try {
      val nasty = "line1\r\nline2\té中文 \"quoted\" \\back"
      assert(c.command("SET", "rt:k", nasty) == Resp.Simple("OK"))
      assert(c.bulk("GET", "rt:k").contains(nasty))
      assert(c.bulk("GET", "rt:missing").isEmpty)
      assert(c.num("DEL", "rt:k") == 1L)
    } finally c.close()
  }

  test("RESP pipeline preserves order and amortizes round trips") {
    val c = conn()
    try {
      val replies = c.pipeline((1 to 50).map(i =>
        Seq("ZADD", "pl:z", i.toString, s"m$i")))
      assert(replies.forall(_ == Resp.Num(1)))
      assert(c.num("ZCARD", "pl:z") == 50L)
      // exclusive lower bound + LIMIT slice
      assert(c.arr("ZRANGEBYSCORE", "pl:z", "(10", "20",
        "LIMIT", "2", "3") == Seq("m13", "m14", "m15"))
      c.command("DEL", "pl:z"); ()
    } finally c.close()
  }

  test("SET NX PX: second writer blocked until expiry — the lease primitive") {
    val c = conn()
    try {
      assert(c.command("SET", "nx:k", "a", "NX", "PX", "80") == Resp.Simple("OK"))
      assert(c.command("SET", "nx:k", "b", "NX", "PX", "80") == Resp.Bulk(None))
      Thread.sleep(120)
      assert(c.command("SET", "nx:k", "b", "NX", "PX", "80") == Resp.Simple("OK"))
      c.command("DEL", "nx:k"); ()
    } finally c.close()
  }

  test("server error replies surface as exceptions (WRONGTYPE)") {
    val c = conn()
    try {
      c.command("SET", "wt:k", "str")
      val e = intercept[java.io.IOException](c.num("ZCARD", "wt:k"))
      assert(e.getMessage.contains("WRONGTYPE"))
      c.command("DEL", "wt:k"); ()
    } finally c.close()
  }

  // ── store semantics over the wire ──────────────────────────────────────

  test("typed round-trip: NTZ microseconds, longs, doubles survive the KV codec") {
    val st = mkStore("codec")
    val df = Seq(("2024-03-01 12:34:56.123456", 7L, 2.25))
      .toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
      .select("dt", "id", "val")
    st.create(df, cluster = true)
    val back = st.read.select("dt", "id", "val")
      .as[(LocalDateTime, Long, Double)].head()
    assert(back == (LocalDateTime.parse("2024-03-01T12:34:56.123456"), 7L, 2.25))
    st.drop()
  }

  test("score-bounded readRange honors endInclusive exactly (µs scores)") {
    val st = mkStore("range")
    st.create(df3, cluster = true)
    val b = Some(LocalDateTime.parse("2024-01-01T00:00:00"))
    val e = Some(LocalDateTime.parse("2024-01-02T00:00:00"))
    assert(st.readRange(b, e, endInclusive = false).count() == 1)
    assert(st.readRange(b, e, endInclusive = true).count() == 2)
    // syncTime comes straight off the max score — exact to the microsecond
    assert(st.syncTime().contains(LocalDateTime.parse("2024-01-03T00:00:00")))
    assert(st.syncTime(newest = false).contains(LocalDateTime.parse("2024-01-01T00:00:00")))
    st.drop()
  }

  test("identical full rows collapse (reference zset document semantics)") {
    val st = mkStore("collapse")
    st.create(df3, cluster = true)
    st.append(df3.limit(1)) // byte-identical doc → same member
    assert(st.rowCount == 3)
    st.drop()
  }

  test("KV lease heartbeat renews past the PX TTL (PEXPIRE while held)") {
    import graft.storage.PipeStorage
    val saved = (PipeStorage.leaseStaleMs, PipeStorage.leaseAcquireTimeoutMs)
    PipeStorage.leaseStaleMs = 400L
    PipeStorage.leaseAcquireTimeoutMs = 200L
    try {
      val st = mkStore("renew")
      @volatile var intruded = false
      st.withWriteLease {
        Thread.sleep(900) // 2× the TTL: only the heartbeat keeps the key alive
        val t = new Thread(() =>
          try st.withWriteLease { intruded = true }
          catch { case _: IllegalStateException => () })
        t.start(); t.join(5000)
      }
      assert(!intruded, "a renewed lease must not be acquirable by a second writer")
      // after release a writer acquires immediately
      st.withWriteLease { intruded = true }
      assert(intruded)
    } finally {
      PipeStorage.leaseStaleMs = saved._1
      PipeStorage.leaseAcquireTimeoutMs = saved._2
    }
  }

  test("lease contention: second writer thread blocks, then proceeds") {
    val st1 = mkStore("lease")
    val st2 = mkStore("lease")
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t = new Thread(() => st2.withWriteLease { order.add("second"); () })
    st1.withWriteLease {
      t.start()
      Thread.sleep(150) // second writer must still be waiting
      order.add("first")
    }
    t.join(10000)
    assert(order.toArray.toSeq == Seq("first", "second"))
  }

  test("concurrent fleet sync over the KV backend: leases serialize, all shards land") {
    import graft.sync.SyncEngine
    val eng = new SyncEngine(spark, "vfleet",
      storeFactory = graft.storage.ValkeyStore.factory(srv.host, srv.port))
    val shards = 3
    val jobs = (0 until shards).map { i =>
      val spec = PipeSpec(PipeKeys("vfleet", s"shard$i"),
        columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
      val src = new graft.sources.FnSource((sp, _, _, _) => {
        import sp.implicits._
        Seq.tabulate(40)(j => (s"2024-01-0${j % 9 + 1} 00:0${j % 6}:00", (i * 100 + j).toLong, j * 1.5))
          .toDF("dts", "id", "val")
          .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
      })
      (spec, src: graft.sources.Source)
    }
    val res = eng.fetchSyncMany(jobs, workers = shards)
    val failed = res.collect { case (k, Left(e)) => s"$k: ${e.getMessage}" }
    assert(failed.isEmpty, failed.mkString("; "))
    jobs.foreach { case (spec, _) =>
      assert(eng.storage(spec).rowCount == 40)
      eng.storage(spec).drop()
    }
  }

  test("valkey fetch source resolves by short name and score-prunes") {
    val st = mkStore("fetchsrc")
    st.create(df3, cluster = true)
    val spec = PipeSpec(PipeKeys("valkey", "fetchsrc"),
      columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")))
    val src = graft.sources.SourceRegistry.forName("valkey", Map(
      "host" -> srv.host, "port" -> srv.port.toString, "root" -> "vspec"))
    val got = src.fetch(spark, spec,
      begin = Some(LocalDateTime.parse("2024-01-02T00:00:00")), end = None,
      params = Map.empty)
    assert(got.count() == 2)
    st.drop()
  }
}
