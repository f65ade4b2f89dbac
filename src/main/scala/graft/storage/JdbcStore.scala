package graft.storage

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampNTZType}

import graft.catalog.PipeSpec

/** JDBC-backed [[InstanceStore]] — the engine's fifth backend and the one
  * that mirrors the reference's PRIMARY instance connector (SQLConnector:
  * `meerschaum/connectors/sql/_pipes.py` — pipes as database tables, sync
  * via staged patch + MERGE, sync times as MAX/MIN pushdown queries).
  * Tested against embedded Derby (the only database in this environment);
  * the SQL kept deliberately ANSI-ish so a dialect layer can slot in.
  *
  * Mapping of the contract:
  *   - table per pipe (sanitized uppercase of `spec.targetName`); Spark's
  *     JDBC writer creates it with QUOTED, case-preserved column names.
  *   - TimestampNTZ columns round-trip via session-zone TIMESTAMP (the
  *     JVM zone is pinned UTC by every entrypoint): the original Spark
  *     DDL is persisted in `GRAFT_META` and `read` casts back, so the
  *     engine sees exactly the schema it wrote.
  *   - `upsert` is the reference's staged-merge shape: patch → temp table
  *     via the Spark JDBC writer, ONE `MERGE INTO` statement (null-safe
  *     ON when the pipe opts into `nullIndices`), temp table dropped.
  *   - `readRange`/`readIn` push their predicates into the remote query
  *     text (the same pushdown discipline as
  *     [[graft.sources.SqlDefinitionSource]], which also documents the
  *     partitioned-read option for large remote tables).
  *   - `clearStructured` renders bounds + params DSL into ONE bounded
  *     remote `DELETE` (reference connectors/sql/_pipes.py:3158-3246);
  *     `deduplicate` scopes remote work to the DUPLICATED key tuples
  *     (GROUP BY...HAVING probe → batched DELETE + survivor re-insert,
  *     reference :3888-4105). Only the arbitrary-Catalyst-`Column` `clear`
  *     (server-issued SQL exprs) and rejected/oversized shapes fall back
  *     to materialize-filter-overwrite — translating arbitrary Catalyst
  *     trees to dialect SQL is a seam deliberately not crossed.
  *   - flavor syntax lives in [[SqlDialect]] (quoting, literals,
  *     comparable-casts, upsert template); this class holds NO inline
  *     flavor conditionals. Derby is the live dialect.
  *   - `withWriteLease` is a JVM monitor keyed on (url, table): embedded
  *     Derby is single-process by construction. A server-mode database
  *     would swap in SELECT FOR UPDATE on the meta row.
  *
  * String columns default to CLOB under Derby (comparable only through
  * Spark-side ops, which is where all our comparisons happen); pass
  * `varcharCols` for string columns that must be SQL-comparable or
  * indexed, mirroring the reference's explicit dtypes.
  */
final class JdbcStore(spark: SparkSession, url: String, val spec: PipeSpec,
                      varcharCols: Map[String, Int] = Map.empty,
                      dialect: SqlDialect = DerbyDialect)
    extends InstanceStore {

  private val table = JdbcStore.tableName(spec)
  private def dtCol: Option[String] = spec.columns.datetime

  private def q(id: String): String = dialect.quote(id)

  /** Column-reference renderer for remote comparison predicates: string
    * columns route through the dialect's comparable-cast (Derby default
    * strings are CLOB — not SQL-comparable bare). Snapshots the stored
    * schema ONCE; call per operation, not per column. */
  private def cmpFn(): String => String = {
    val stringCols = storedSchema
      .map(_.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.StringType => f.name
      }.toSet)
      .getOrElse(Set.empty[String])
    name => dialect.comparable(q(name), stringCols(name) && !varcharCols.contains(name))
  }

  private def withConn[A](body: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try body(c) finally c.close()
  }

  private def tableExists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name, Array("TABLE"))
    try rs.next() finally rs.close()
  }

  private def ensureMeta(c: Connection): Unit =
    if (!tableExists(c, "GRAFT_META")) {
      val st = c.createStatement()
      try st.executeUpdate(
        "CREATE TABLE GRAFT_META (PIPE VARCHAR(256) PRIMARY KEY, " +
          "MAX_ID BIGINT, SCHEMA_DDL VARCHAR(32000))")
      finally st.close()
    }

  private def metaGet[A](col: String)(read: java.sql.ResultSet => A): Option[A] =
    withConn { c =>
      ensureMeta(c)
      val ps = c.prepareStatement(s"SELECT $col FROM GRAFT_META WHERE PIPE = ?")
      try {
        ps.setString(1, table)
        val rs = ps.executeQuery()
        try {
          if (!rs.next()) None
          else {
            val v = read(rs)
            if (rs.wasNull()) None else Some(v)
          }
        } finally rs.close()
      } finally ps.close()
    }

  /** UPDATE-then-INSERT on the meta row; `v` is a Long or a String (the
    * two column types GRAFT_META carries). */
  private def metaUpsert(col: String, v: Any): Unit =
    withConn { c =>
      ensureMeta(c)
      def bind(ps: java.sql.PreparedStatement, i: Int): Unit = v match {
        case l: Long   => ps.setLong(i, l)
        case s: String => ps.setString(i, s)
        case other => throw new IllegalArgumentException(s"meta value: $other")
      }
      val up = c.prepareStatement(s"UPDATE GRAFT_META SET $col = ? WHERE PIPE = ?")
      try {
        bind(up, 1); up.setString(2, table)
        if (up.executeUpdate() == 0) {
          val ins = c.prepareStatement(
            s"INSERT INTO GRAFT_META (PIPE, $col) VALUES (?, ?)")
          try { ins.setString(1, table); bind(ins, 2); ins.executeUpdate(); () }
          finally ins.close()
        }
      } finally up.close()
    }

  private def exec(sql: String): Unit = withConn { c =>
    JdbcStore.record(sql)
    val st = c.createStatement()
    try { st.executeUpdate(sql); () } finally st.close()
  }

  /** exec returning the affected-row count. */
  private def execCount(sql: String): Long = withConn { c =>
    JdbcStore.record(sql)
    val st = c.createStatement()
    try st.executeUpdate(sql).toLong finally st.close()
  }

  // ── stored-schema bookkeeping (NTZ round-trip) ───────────────────────
  private def storedSchema: Option[StructType] =
    metaGet("SCHEMA_DDL")(_.getString(1)).map(StructType.fromDDL)

  private def rememberSchema(s: StructType): Unit =
    metaUpsert("SCHEMA_DDL", s.toDDL)

  /** NTZ → session-zone timestamp for the JDBC writer (identity under the
    * pinned UTC zone); `read` reverses it from the stored DDL. */
  private def toJdbc(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (f.dataType == TimestampNTZType) col(f.name).cast("timestamp").as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private def writerOptions: Map[String, String] = {
    val types = varcharCols.map { case (c, n) => s"$c VARCHAR($n)" }.mkString(", ")
    val base = Map("batchsize" -> "10000")
    if (types.nonEmpty) base + ("createTableColumnTypes" -> types) else base
  }

  private def write(df: DataFrame, target: String, mode: String): Unit =
    toJdbc(df).coalesce(4) // bounded writer concurrency for embedded DBs
      .write.mode(mode).options(writerOptions)
      .jdbc(url, target, new java.util.Properties)

  // ── reads ────────────────────────────────────────────────────────────
  override def exists: Boolean = withConn(tableExists(_, table))

  private def readQuery(sql: String): DataFrame = {
    JdbcStore.record(sql)
    val raw = spark.read
      .option("fetchsize", "10000")
      .jdbc(url, s"($sql) g", new java.util.Properties)
    storedSchema match {
      case Some(s) =>
        val ntz = s.fields.filter(_.dataType == TimestampNTZType).map(_.name).toSet
        val cols = raw.schema.fields.map { f =>
          if (ntz(f.name)) col(f.name).cast("timestamp_ntz").as(f.name)
          else col(f.name)
        }
        raw.select(cols.toIndexedSeq: _*)
      case None => raw
    }
  }

  override def read: DataFrame = {
    require(exists, s"pipe ${spec.targetName} does not exist")
    readQuery(s"SELECT * FROM $table")
  }

  override def schemaDdl: Option[String] =
    storedSchema.map(_.toDDL).orElse(if (exists) Some(read.schema.toDDL) else None)

  /** Render a bound value as a flavor literal. */
  private def lit(v: Any): String = dialect.literal(v)

  override def readRange(begin: Option[Any], end: Option[Any],
                         endInclusive: Boolean): DataFrame = {
    val dt = dtCol.getOrElse {
      require(begin.isEmpty && end.isEmpty,
        s"pipe ${spec.targetName} has no datetime axis; bounded reads are undefined")
      return read
    }
    require(exists, s"pipe ${spec.targetName} does not exist")
    val preds =
      begin.map(b => s"${q(dt)} >= ${lit(b)}").toSeq ++
      end.map(e => s"${q(dt)} ${if (endInclusive) "<=" else "<"} ${lit(e)}")
    val where = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
    readQuery(s"SELECT * FROM $table$where")
  }

  override def readIn(values: Seq[Any]): DataFrame = {
    val dt = dtCol.getOrElse(
      throw new IllegalArgumentException("readIn requires a datetime axis"))
    if (values.isEmpty) return read.where(org.apache.spark.sql.functions.lit(false))
    readQuery(s"SELECT * FROM $table WHERE ${q(dt)} IN (${values.map(lit).mkString(", ")})")
  }

  override def rowCount: Long =
    if (!exists) 0L
    else withConn { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
        try { rs.next(); rs.getLong(1) } finally rs.close()
      } finally st.close()
    }

  // ── writes ───────────────────────────────────────────────────────────
  override def create(df: DataFrame, cluster: Boolean): Unit = withWriteLease {
    rememberSchema(df.schema)
    write(df, table, "overwrite")
  }

  override def overwrite(df: DataFrame): Unit = withWriteLease {
    // materialize BEFORE the drop when the plan reads this very table
    val snap = df.localCheckpoint(true)
    rememberSchema(snap.schema)
    write(snap, table, "overwrite")
  }

  override def append(df: DataFrame): Unit = withWriteLease {
    if (!exists) { create(df, cluster = true); return }
    val stored = storedSchema.map(_.fieldNames.toSeq).getOrElse(read.columns.toSeq)
    if (df.columns.toSeq == stored) write(df, table, "append")
    else {
      // schema drift: align through a Spark-side union (the parquet
      // backend's mergeSchema equivalent for the proof backend)
      val merged = read.unionByName(df, allowMissingColumns = true)
      overwrite(merged)
    }
  }

  override def upsert(patch: DataFrame, keys: Seq[String],
                      knownChunks: Option[Seq[String]],
                      strayScan: StrayScan): Unit = withWriteLease {
    require(keys.nonEmpty, "upsert requires key columns")
    if (!exists) { create(patch, cluster = true); return }
    // Session-unique staging name: a fixed `_PATCH` suffix is reachable
    // from a pipe literally named `<target>_PATCH` (ADVICE r6) — the
    // random tag keeps the scratch table out of any pipe's namespace,
    // and a crash-orphaned staging table can never shadow a later one.
    val staging = table + "_STG_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(12).toUpperCase
    write(patch, staging, "overwrite")
    try
      dialect.upsertSql(table, staging, keys, patch.columns.toSeq,
        nullSafeKeys = spec.nullIndices).foreach(exec)
    finally exec(s"DROP TABLE $staging")
  }

  // ── deletion / maintenance ───────────────────────────────────────────
  override def clear(predicate: Column, boundLo: Option[Any],
                     boundHi: Option[Any]): Unit = withWriteLease {
    if (!exists) return
    // Arbitrary-Catalyst-predicate path (PipeServer's `sql` exprs land
    // here): translating a Catalyst tree to dialect SQL is a seam we
    // deliberately do not cross — bounded correctness over silent
    // mistranslation. O(table) rewrite; the STRUCTURED path below covers
    // every engine-issued clear with a remote DELETE.
    // SQL DELETE three-valued logic: NULL-evaluating rows are KEPT
    overwrite(read.where(!(predicate <=> org.apache.spark.sql.functions.lit(true))))
  }

  /** Engine-issued range delete: bounds + params DSL render into ONE
    * bounded remote `DELETE` (reference connectors/sql/_pipes.py:3158-3246
    * `clear_pipe` — delete query with datetime bounds and build_where
    * params), replacing the O(table) materialize-filter-overwrite. Falls
    * back to the Spark-side path only for params the SQL renderer rejects
    * (JSON-map values). */
  override def clearStructured(boundLo: Option[Any], boundHi: Option[Any],
                               params: Map[String, Any]): Unit = withWriteLease {
    if (!exists) return
    val dt = spec.columns.datetime.getOrElse(
      throw new IllegalArgumentException("clear requires a datetime axis"))
    val cmp = cmpFn()
    val rendered =
      try Some(graft.dsl.ParamsFilter.toSql(params, ident = cmp, lit = dialect.literal))
      catch { case _: IllegalArgumentException => None }
    rendered match {
      case Some(paramsSql) =>
        val preds =
          boundLo.map(b => s"${q(dt)} >= ${lit(b)}").toSeq ++
          boundHi.map(e => s"${q(dt)} < ${lit(e)}") ++
          (if (paramsSql.nonEmpty) Seq(paramsSql) else Seq.empty)
        val where = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
        exec(s"DELETE FROM $table$where")
      case None => super.clearStructured(boundLo, boundHi, params)
    }
  }

  /** Keyed dedup scoped to DUPLICATED keys only (reference
    * connectors/sql/_pipes.py:3888-4105 issues windowed delete SQL): a
    * remote GROUP BY...HAVING finds the duplicated key tuples (output ∝
    * duplicates, not table size), survivors for those keys are computed
    * Spark-side (one bounded read), then ONE batched remote DELETE of the
    * affected tuples + a re-insert of the survivors. The full-table
    * rewrite survives only as the fallback for key shapes the remote
    * aggregate cannot express (Derby: CLOB group-by) or duplicate counts
    * past [[JdbcStore.maxRemoteDedupKeys]]. */
  override def deduplicate(keys: Seq[String], orderBy: Seq[String]): Long =
    withWriteLease {
      require(keys.nonEmpty, "deduplicate requires key columns")
      if (!exists) return 0L
      val order = if (orderBy.nonEmpty) orderBy else keys
      try remoteDeduplicate(keys, order)
      catch { case e: Exception if rootSql(e).isDefined =>
        // e.g. CLOB key columns: Derby cannot GROUP BY / compare them
        fullRewriteDeduplicate(keys, order)
      }
    }

  private def rootSql(e: Throwable): Option[java.sql.SQLException] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .collectFirst { case s: java.sql.SQLException => s }

  private def fullRewriteDeduplicate(keys: Seq[String], order: Seq[String]): Long = {
    val before = rowCount
    overwrite(graft.ops.Dedup.keepOnePerKey(read, keys, order))
    before - rowCount
  }

  private def remoteDeduplicate(keys: Seq[String], order: Seq[String]): Long = {
    val cmp = cmpFn()
    val keyList = keys.map(cmp).mkString(", ")
    // cap+1 bounds the collect; hitting it falls back to the full rewrite
    val dupKeys = readQuery(
      s"SELECT $keyList FROM $table GROUP BY $keyList HAVING COUNT(*) > 1 " +
        s"FETCH FIRST ${JdbcStore.maxRemoteDedupKeys + 1} ROWS ONLY")
      .collect()
    if (dupKeys.isEmpty) return 0L
    if (dupKeys.length > JdbcStore.maxRemoteDedupKeys)
      return fullRewriteDeduplicate(keys, order)
    // one key tuple -> (c1 = v1 AND c2 IS NULL AND ...)
    def tuplePred(row: org.apache.spark.sql.Row): String =
      keys.zipWithIndex.map { case (k, i) =>
        if (row.isNullAt(i)) s"${cmp(k)} IS NULL"
        else s"${cmp(k)} = ${lit(row.get(i))}"
      }.mkString("(", " AND ", ")")
    val batches = dupKeys.grouped(JdbcStore.dedupDeleteBatch).toSeq
      .map(_.map(tuplePred).mkString(" OR "))
    // survivors computed and pinned BEFORE any delete runs
    val affected = batches.map(b => readQuery(s"SELECT * FROM $table WHERE $b"))
      .reduce(_.unionAll(_))
    val survivors = graft.ops.Dedup.keepOnePerKey(affected, keys, order)
      .localCheckpoint(true)
    try {
      val removed = batches.map(b => execCount(s"DELETE FROM $table WHERE $b")).sum
      write(survivors, table, "append")
      removed - survivors.count()
    } finally graft.ops.ApproxDedup.freeCheckpoint(survivors)
  }

  override def drop(): Unit = withWriteLease {
    if (exists) exec(s"DROP TABLE $table")
    withConn { c =>
      ensureMeta(c)
      val ps = c.prepareStatement("DELETE FROM GRAFT_META WHERE PIPE = ?")
      try { ps.setString(1, table); ps.executeUpdate(); () } finally ps.close()
    }
  }

  // ── sync bookkeeping ─────────────────────────────────────────────────
  override def syncTime(newest: Boolean): Option[java.time.LocalDateTime] = {
    if (!exists) return None
    val dt = dtCol.getOrElse(return None)
    withConn { c =>
      val st = c.createStatement()
      try {
        val fn = if (newest) "MAX" else "MIN"
        val rs = st.executeQuery(s"SELECT $fn(${q(dt)}) FROM $table")
        try {
          if (!rs.next()) None
          else Option(rs.getTimestamp(1)).map(_.toLocalDateTime)
        } finally rs.close()
      } finally st.close()
    }
  }

  override def syncTimeEpoch(newest: Boolean): Option[Long] = {
    if (!exists) return None
    val dt = dtCol.getOrElse(return None)
    withConn { c =>
      val st = c.createStatement()
      try {
        val fn = if (newest) "MAX" else "MIN"
        val rs = st.executeQuery(s"SELECT $fn(${q(dt)}) FROM $table")
        try {
          if (!rs.next()) None
          else {
            val v = rs.getLong(1)
            if (rs.wasNull()) None else Some(v)
          }
        } finally rs.close()
      } finally st.close()
    }
  }

  override def readMaxId: Option[Long] = metaGet("MAX_ID")(_.getLong(1))
  override def writeMaxId(v: Long): Unit = metaUpsert("MAX_ID", v)

  override def withWriteLease[A](body: => A): A =
    JdbcStore.monitor(url, table).synchronized(body)
}

object JdbcStore {
  private val monitors =
    scala.collection.concurrent.TrieMap.empty[(String, String), Object]
  private def monitor(url: String, table: String): Object =
    monitors.getOrElseUpdate((url, table), new Object)

  /** Above this many duplicated key tuples, [[JdbcStore.deduplicate]]
    * abandons the batched remote DELETE (whose statement text grows with
    * the tuple count) for the full-table rewrite. */
  val maxRemoteDedupKeys = 10000
  /** Key tuples per DELETE statement in the remote dedup. */
  val dedupDeleteBatch = 200

  /** Diagnostic statement log (tests assert pushdown shapes — e.g. that a
    * bounded clear issues one remote DELETE and never a full-table
    * SELECT). Off by default; bounded when on. */
  @volatile var logStatements = false
  val statementLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private[storage] def record(sql: String): Unit =
    if (logStatements) {
      statementLog.add(sql)
      while (statementLog.size > 500) statementLog.poll()
    }

  /** Sanitized SQL table name for a pipe (Derby folds unquoted names to
    * uppercase; keep them uppercase so metadata lookups agree). Distinct
    * raw target names that sanitize identically (`a.b` vs `a_b` vs `A B`)
    * would collide onto one table and cross-contaminate pipes, so a short
    * md5 of the RAW name disambiguates — stable across sessions, and the
    * trailing `_H` tag keeps the suffix out of the plain `[A-Z0-9_]*`
    * space a sanitized name alone can produce. */
  def tableName(spec: PipeSpec): String = {
    val sanitized = spec.targetName.toUpperCase.replaceAll("[^A-Z0-9_]", "_")
    val raw = spec.targetName
    if (sanitized == raw) sanitized
    else {
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes("UTF-8"))
      val tag = digest.take(4).map(b => f"$b%02X").mkString
      s"${sanitized}_${tag}H"
    }
  }

  /** Store factory for [[graft.sync.SyncEngine]]; `root` is unused (the
    * database location lives in the URL). */
  def factory(url: String, varcharCols: Map[String, Int] = Map.empty,
              dialect: SqlDialect = DerbyDialect)
      : (SparkSession, String, PipeSpec) => InstanceStore =
    (s, _, spec) => new JdbcStore(s, url, spec, varcharCols, dialect)
}
