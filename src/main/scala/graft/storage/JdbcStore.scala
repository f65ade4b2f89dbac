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
  *   - `clear`/`deduplicate` materialize-filter-overwrite: the engine
  *     hands a Spark `Column` predicate, and translating arbitrary
  *     Catalyst trees to dialect SQL is a seam deliberately not crossed
  *     here — bounded correctness over silent mistranslation. Rewrite
  *     volume is O(table), acceptable for the proof backend; the parquet
  *     backend remains the chunk-pruned production path.
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
                      varcharCols: Map[String, Int] = Map.empty)
    extends InstanceStore {

  private val table = JdbcStore.tableName(spec)
  private def dtCol: Option[String] = spec.columns.datetime

  private def q(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

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
    val st = c.createStatement()
    try { st.executeUpdate(sql); () } finally st.close()
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

  /** Render a bound value as a Derby literal. */
  private def lit(v: Any): String = v match {
    case t: java.time.LocalDateTime =>
      val ts = java.sql.Timestamp.valueOf(t)
      s"TIMESTAMP('${ts.toString}')"
    case t: java.sql.Timestamp => s"TIMESTAMP('${t.toString}')"
    case n: Number => n.toString
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => throw new IllegalArgumentException(
      s"unsupported bound literal: $other (${other.getClass})")
  }

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
    try {
      val cols = patch.columns.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val on = keys.map { k =>
        if (spec.nullIndices)
          s"(t.${q(k)} = p.${q(k)} OR (t.${q(k)} IS NULL AND p.${q(k)} IS NULL))"
        else s"t.${q(k)} = p.${q(k)}"
      }.mkString(" AND ")
      val updateClause =
        if (nonKeys.isEmpty) ""
        else " WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"${q(c)} = p.${q(c)}").mkString(", ")
      val insertClause =
        s" WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
          s"VALUES (${cols.map(c => s"p.${q(c)}").mkString(", ")})"
      exec(s"MERGE INTO $table t USING $staging p ON $on$updateClause$insertClause")
    } finally exec(s"DROP TABLE $staging")
  }

  // ── deletion / maintenance ───────────────────────────────────────────
  override def clear(predicate: Column, boundLo: Option[Any],
                     boundHi: Option[Any]): Unit = withWriteLease {
    if (!exists) return
    // SQL DELETE three-valued logic: NULL-evaluating rows are KEPT
    overwrite(read.where(!(predicate <=> org.apache.spark.sql.functions.lit(true))))
  }

  override def deduplicate(keys: Seq[String], orderBy: Seq[String]): Long =
    withWriteLease {
      require(keys.nonEmpty, "deduplicate requires key columns")
      if (!exists) return 0L
      val order = if (orderBy.nonEmpty) orderBy else keys
      val before = rowCount
      overwrite(graft.ops.Dedup.keepOnePerKey(read, keys, order))
      before - rowCount
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
  def factory(url: String, varcharCols: Map[String, Int] = Map.empty)
      : (SparkSession, String, PipeSpec) => InstanceStore =
    (s, _, spec) => new JdbcStore(s, url, spec, varcharCols)
}
