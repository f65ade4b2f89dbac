package graft

import graft.sync.SyncEngine

/** The JDBC (embedded Derby) instance backend — the SAME behavior suite as
  * the parquet, in-memory, HTTP, and Valkey backends, with every store
  * call crossing a real JDBC connection and upserts running as staged
  * MERGE statements (reference: SQLConnector is the PRIMARY instance
  * backend and passes the same `tests/pipes.py` suite). */
class JdbcStoreSyncEngineSpec extends SyncEngineSuite {
  override protected def fileBacked = false
  protected def mkEngine(root: String): SyncEngine = {
    // one in-memory Derby database per test root
    val db = "g" + java.lang.Integer.toHexString(root.hashCode)
    new SyncEngine(spark, root,
      storeFactory = graft.storage.JdbcStore.factory(
        s"jdbc:derby:memory:$db;create=true"))
  }
}

/** JDBC-seam specifics the shared suite doesn't reach. */
class JdbcInstanceSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
  import spark.implicits._

  private def mkStore(name: String) =
    new graft.storage.JdbcStore(spark,
      s"jdbc:derby:memory:jspec;create=true",
      PipeSpec(PipeKeys("jdbc", name),
        columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id"))))

  private def df3 = Seq(
      ("2024-01-01 00:00:00", 1L, 1.5),
      ("2024-01-02 00:00:00", 2L, 2.5),
      ("2024-01-03 00:00:00", 3L, 3.5))
    .toDF("dts", "id", "val")
    .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
    .select("dt", "id", "val")

  test("NTZ timestamps round-trip through Derby TIMESTAMP via the stored DDL") {
    val st = mkStore("ntz")
    st.create(df3, cluster = true)
    val back = st.read
    assert(back.schema("dt").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = back.select($"dt".cast("string")).as[String].collect().sorted
    assert(got.head == "2024-01-01 00:00:00" && got.last == "2024-01-03 00:00:00")
    st.drop()
  }

  test("readRange pushes bounds into the remote query text") {
    val st = mkStore("rng")
    st.create(df3, cluster = true)
    val mid = st.readRange(
      Some(java.time.LocalDateTime.parse("2024-01-02T00:00:00")),
      Some(java.time.LocalDateTime.parse("2024-01-03T00:00:00")))
    assert(mid.select($"id").as[Long].collect().toSeq == Seq(2L))
    val inclusive = st.readRange(
      Some(java.time.LocalDateTime.parse("2024-01-02T00:00:00")),
      Some(java.time.LocalDateTime.parse("2024-01-03T00:00:00")),
      endInclusive = true)
    assert(inclusive.count() == 2L)
    st.drop()
  }

  test("upsert MERGEs: update in place, insert the new key") {
    val st = mkStore("mrg")
    st.create(df3, cluster = true)
    val patch = Seq(("2024-01-02 00:00:00", 2L, 99.0), ("2024-01-04 00:00:00", 4L, 4.5))
      .toDF("dts", "id", "val")
      .withColumn("dt", to_timestamp_ntz(col("dts"))).drop("dts")
      .select("dt", "id", "val")
    st.upsert(patch, keys = Seq("dt", "id"))
    assert(st.rowCount == 4L)
    val v2 = st.read.where($"id" === 2L).select($"val").as[Double].head()
    assert(v2 == 99.0)
    st.drop()
  }

  test("maxId survives in the meta table; drop clears it") {
    val st = mkStore("hwm")
    assert(st.readMaxId.isEmpty)
    st.writeMaxId(41L); st.writeMaxId(42L)
    assert(st.readMaxId.contains(42L))
    st.create(df3, cluster = true)
    st.drop()
    assert(st.readMaxId.isEmpty && !st.exists)
  }

  test("distinct raw target names never share a table (sanitize collisions)") {
    // 'a.b', 'a_b', 'A B' (raw `target` overrides) all sanitize to 'A_B' —
    // the md5 tag keeps them apart; a clean uppercase name stays suffix-free.
    def name(t: String) = graft.storage.JdbcStore.tableName(
      PipeSpec(PipeKeys("jdbc", "m"),
        columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")),
        target = Some(t)))
    val raws = Seq("a.b", "a_b", "A B", "A_B")
    val names = raws.map(name)
    assert(names.distinct.size == raws.size)
    assert(name("A_B") == "A_B") // clean name untouched
    assert(names.forall(_.matches("[A-Z0-9_]+")))
    // and the stores really are isolated end-to-end
    def mkT(t: String) = new graft.storage.JdbcStore(spark,
      s"jdbc:derby:memory:jspec;create=true",
      PipeSpec(PipeKeys("jdbc", "m"),
        columns = ColumnRoles(Map("datetime" -> "dt", "id" -> "id")),
        target = Some(t)))
    val s1 = mkT("col.lide"); val s2 = mkT("col_lide")
    s1.create(df3, cluster = true)
    assert(!s2.exists)
    s1.drop()
  }

  test("structured clear pushes ONE bounded remote DELETE, no table scan") {
    val st = mkStore("clr")
    st.create(df3.withColumn("tag", concat(lit("t"), $"id")), cluster = true)
    graft.storage.JdbcStore.statementLog.clear()
    graft.storage.JdbcStore.logStatements = true
    try {
      st.clearStructured(
        Some(java.time.LocalDateTime.parse("2024-01-02T00:00:00")),
        Some(java.time.LocalDateTime.parse("2024-01-04T00:00:00")),
        params = Map("tag" -> "t2"))
    } finally graft.storage.JdbcStore.logStatements = false
    val stmts = graft.storage.JdbcStore.statementLog.toArray.map(_.toString)
    val deletes = stmts.filter(_.startsWith("DELETE FROM"))
    assert(deletes.length == 1, stmts.mkString("; "))
    assert(deletes.head.contains(">=") && deletes.head.contains("<") &&
      deletes.head.contains("TIMESTAMP('2024-01-02"))
    // CLOB string param must be compared through a VARCHAR cast
    assert(deletes.head.contains("CAST(\"tag\" AS VARCHAR(32672)) = 't2'"))
    // the clear itself must not read the table back through Spark
    assert(!stmts.exists(_.startsWith(s"SELECT * FROM")), stmts.mkString("; "))
    // only (dt in [01-02, 01-04)) AND tag='t2' deleted -> row id=2 gone
    assert(st.read.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    st.drop()
  }

  test("deduplicate scopes remote work to duplicated keys only") {
    val st = mkStore("ddp")
    st.create(df3, cluster = true)
    st.append(df3.where($"id" === 2L)) // duplicate one key
    graft.storage.JdbcStore.statementLog.clear()
    graft.storage.JdbcStore.logStatements = true
    val removed =
      try st.deduplicate(keys = Seq("dt", "id"), orderBy = Seq("dt", "id"))
      finally graft.storage.JdbcStore.logStatements = false
    assert(removed == 1L)
    assert(st.rowCount == 3L)
    assert(st.read.select($"id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val stmts = graft.storage.JdbcStore.statementLog.toArray.map(_.toString)
    assert(stmts.exists(_.contains("HAVING COUNT(*) > 1")), stmts.mkString("; "))
    assert(stmts.exists(_.startsWith("DELETE FROM")))
    // the probe and the affected-row read are keyed; never SELECT * unbounded
    assert(!stmts.exists(s => s.startsWith("SELECT * FROM") && !s.contains("WHERE")),
      stmts.mkString("; "))
    // no duplicates -> zero statements beyond the probe, nothing removed
    assert(st.deduplicate(Seq("dt", "id"), Seq("dt", "id")) == 0L)
    st.drop()
  }

  test("syncTime is a MAX/MIN pushdown, not a table scan through Spark") {
    val st = mkStore("st")
    st.create(df3, cluster = true)
    assert(st.syncTime(newest = true)
      .contains(java.time.LocalDateTime.parse("2024-01-03T00:00:00")))
    assert(st.syncTime(newest = false)
      .contains(java.time.LocalDateTime.parse("2024-01-01T00:00:00")))
    st.drop()
  }
}
