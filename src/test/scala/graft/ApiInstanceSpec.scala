package graft

import graft.sync.SyncEngine

/** One live [[graft.server.PipeServer]] shared by the HTTP-backend suites
  * (daemon threads; dies with the test JVM). */
object TestPipeServer {
  lazy val server = new graft.server.PipeServer(TestSpark.spark,
    java.nio.file.Files.createTempDirectory("graft-api-server").toString)
}

/** The HTTP instance backend — the SAME behavior suite as the parquet and
  * in-memory backends, but every store call crosses a process-boundary
  * seam (HTTP + ND-JSON + DDL schema transfer). Reference: the api
  * connector implements the instance interface over FastAPI routes
  * (connectors/api/_pipes.py:368-489). */
class ApiStoreSyncEngineSpec extends SyncEngineSuite {
  override protected def fileBacked = false
  protected def mkEngine(root: String) =
    new SyncEngine(spark, root,
      storeFactory = graft.storage.ApiStore.factory(TestPipeServer.server.url))
}

/** HTTP-seam specifics the shared suite doesn't reach: the typed wire
  * codec, the advisory lease, and server-side error mapping. */
class ApiInstanceSpec extends SparkSpec {
  import java.time.LocalDateTime
  import org.apache.spark.sql.functions._
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import spark.implicits._

  private def mkStore(name: String, roles: Map[String, String] = Map(
      "datetime" -> "dt", "id" -> "id")) =
    new graft.storage.ApiStore(spark, TestPipeServer.server.url, tmpDir(),
      PipeSpec(PipeKeys("api", name), columns = ColumnRoles(roles)))

  private def df3 = Seq(
      ("2024-01-01 00:00:00", 1L, 1.5),
      ("2024-01-02 00:00:00", 2L, 2.5),
      ("2024-01-03 00:00:00", 3L, 3.5))
    .toDF("dts", "id", "val")
    .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    .select("dt", "id", "val")

  test("spec round-trips the wire as the catalog's SpecRow JSON") {
    val spec = PipeSpec(PipeKeys("a", "b", Some("loc")),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "pk")),
      dtypes = Map("v" -> graft.types.Dtypes.parse("float")),
      upsert = true, nullIndices = true, backtrackMinutes = 7,
      epochUnit = Some("second"), tags = Seq("t1", "t2"),
      extras = Map("skew_salt" -> "8"))
    val json = graft.server.PipeServer.specToJson(spark, spec)
    assert(graft.server.PipeServer.specFromJson(spark, json) == spec)
  }

  test("readRange honors endInclusive and the typed ts codec over HTTP") {
    val st = mkStore("range")
    st.create(df3)
    val b = Some(LocalDateTime.parse("2024-01-01T00:00:00"))
    val e = Some(LocalDateTime.parse("2024-01-02T00:00:00"))
    assert(st.readRange(b, e).count() == 1)
    assert(st.readRange(b, e, endInclusive = true).count() == 2)
    // sub-millisecond precision survives the ND-JSON round trip
    val fine = Seq(("2024-01-05 00:00:00.000001", 9L, 9.0))
      .toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
      .select("dt", "id", "val")
    st.append(fine)
    val got = st.readIn(Seq(LocalDateTime.parse("2024-01-05T00:00:00.000001")))
    assert(got.count() == 1 && got.select("id").as[Long].head() == 9L)
  }

  test("sync bookkeeping over HTTP: sync_time, epoch, maxid, dedup count") {
    val st = mkStore("book")
    st.create(df3.unionAll(df3)) // duplicated rows
    assert(st.syncTime(newest = true).contains(LocalDateTime.parse("2024-01-03T00:00:00")))
    assert(st.syncTime(newest = false).contains(LocalDateTime.parse("2024-01-01T00:00:00")))
    // epoch bookmark is an epoch-axis contract (both file/memory backends
    // reject it on an NTZ axis the same way)
    val epochStore = new graft.storage.ApiStore(spark, TestPipeServer.server.url,
      tmpDir(), PipeSpec(PipeKeys("api", "book_epoch"),
        columns = ColumnRoles(Map("datetime" -> "ts", "id" -> "id")),
        epochUnit = Some("second")))
    epochStore.create(Seq((100L, 1L), (200L, 2L)).toDF("ts", "id"))
    assert(epochStore.syncTimeEpoch(newest = true).contains(200L))
    assert(epochStore.syncTimeEpoch(newest = false).contains(100L))
    assert(st.readMaxId.isEmpty)
    st.writeMaxId(41L)
    assert(st.readMaxId.contains(41L))
    assert(st.deduplicate(Seq("dt", "id"), Seq("dt")) == 3L)
    assert(st.rowCount == 3L)
  }

  test("server errors surface as the engine's contract exception types") {
    val st = mkStore("errs", roles = Map("id" -> "id")) // no datetime axis
    st.create(df3.select("id", "val"))
    intercept[IllegalArgumentException] {
      st.readRange(Some(LocalDateTime.parse("2024-01-01T00:00:00")), None)
    }
    // an UNREGISTERED pipe: the server answers 500 with the contract
    // exception class for the client to map
    val resp = java.net.http.HttpClient.newHttpClient().send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(
        s"${TestPipeServer.server.url}/pipes/count?root=unseen&target=nope"))
        .GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 500 &&
      resp.body().startsWith("java.lang.IllegalArgumentException"))
  }

  test("HTTP writer lease serializes two client threads") {
    val st1 = mkStore("lease")
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t1 = new Thread(() => st1.withWriteLease {
      events.add("a-in"); Thread.sleep(300); events.add("a-out")
    })
    t1.start(); Thread.sleep(60) // let A acquire first
    val t2 = new Thread(() => st1.withWriteLease {
      events.add("b-in"); events.add("b-out")
    })
    t2.start(); t1.join(10000); t2.join(10000)
    assert(events.toArray.toSeq == Seq("a-in", "a-out", "b-in", "b-out"),
      s"lease did not serialize: ${events.toArray.toSeq}")
  }
}
