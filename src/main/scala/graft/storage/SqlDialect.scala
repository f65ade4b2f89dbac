package graft.storage

/** SQL dialect seam for [[JdbcStore]] — identifier quoting, value literals,
  * comparison casts, and the per-flavor upsert template. Mirrors the
  * STRUCTURE of the reference's flavor tables (meerschaum/utils/sql.py:
  * 74-236 `UPDATE_QUERIES` — Postgres `ON CONFLICT`, MySQL `ON DUPLICATE
  * KEY`, MSSQL/Oracle `MERGE`, SQLite delete+insert — and
  * utils/dtypes/sql.py:23-144 cast maps): adding a flavor is a template
  * object here, not a rewrite of the store. [[DerbyDialect]] is the LIVE,
  * integration-tested entry (the only database in this environment); the
  * other objects are rendered-SQL templates exercised by unit tests only
  * and marked as such.
  *
  * All statement renderers receive ALREADY-QUOTED identifiers where noted,
  * so a dialect only decides syntax, never escaping-by-hand.
  */
trait SqlDialect {
  def flavor: String

  /** ANSI double-quote by default; MySQL overrides with backticks. */
  def quote(id: String): String = "\"" + id.replace("\"", "\"\"") + "\""

  /** Render a bound/predicate value as a SQL literal. */
  def literal(v: Any): String = v match {
    case t: java.time.LocalDateTime => timestampLiteral(java.sql.Timestamp.valueOf(t))
    case t: java.sql.Timestamp      => timestampLiteral(t)
    case d: java.sql.Date           => s"DATE('${d.toString}')"
    case d: java.time.LocalDate     => s"DATE('${d.toString}')"
    case n: java.math.BigDecimal    => n.toPlainString
    case n: Number                  => n.toString
    case b: Boolean                 => if (b) "TRUE" else "FALSE"
    case s: String                  => "'" + s.replace("'", "''") + "'"
    case other => throw new IllegalArgumentException(
      s"unsupported SQL literal: $other (${other.getClass})")
  }

  /** Flavor timestamp literal; ANSI default, Derby overrides. */
  protected def timestampLiteral(t: java.sql.Timestamp): String =
    s"TIMESTAMP '${t.toString}'"

  /** A column reference usable inside comparison predicates. Dialects whose
    * default string storage is NOT SQL-comparable (Derby CLOB) cast here;
    * everyone else returns the quoted identifier unchanged. */
  def comparable(quotedId: String, isStringCol: Boolean): String = quotedId

  /** Null-safe equality between two already-quoted column references. */
  def nullSafeEq(a: String, b: String): String =
    s"($a = $b OR ($a IS NULL AND $b IS NULL))"

  /** Statements implementing "apply `staging` onto `table` keyed by `keys`"
    * — the reference's UPDATE_QUERIES row. `table`/`staging` arrive
    * already SQL-safe (sanitized `[A-Z0-9_]+` names, emitted bare);
    * `keys`/`cols` arrive RAW (renderers quote as needed). */
  def upsertSql(table: String, staging: String, keys: Seq[String],
                cols: Seq[String], nullSafeKeys: Boolean): Seq[String]

  protected def onClause(keys: Seq[String], nullSafeKeys: Boolean,
                         left: String, right: String): String =
    keys.map { k =>
      val a = s"$left.${quote(k)}"; val b = s"$right.${quote(k)}"
      if (nullSafeKeys) nullSafeEq(a, b) else s"$a = $b"
    }.mkString(" AND ")

  /** ANSI MERGE body shared by Derby / MSSQL / Oracle. */
  protected def mergeSql(table: String, staging: String, keys: Seq[String],
                         cols: Seq[String], nullSafeKeys: Boolean): Seq[String] = {
    val nonKeys = cols.filterNot(keys.contains)
    val update =
      if (nonKeys.isEmpty) ""
      else " WHEN MATCHED THEN UPDATE SET " +
        nonKeys.map(c => s"${quote(c)} = p.${quote(c)}").mkString(", ")
    val insert =
      s" WHEN NOT MATCHED THEN INSERT (${cols.map(quote).mkString(", ")}) " +
        s"VALUES (${cols.map(c => s"p.${quote(c)}").mkString(", ")})"
    Seq(s"MERGE INTO $table t USING $staging p ON " +
      onClause(keys, nullSafeKeys, "t", "p") + update + insert)
  }
}

/** LIVE dialect: embedded Derby (integration-tested by the JDBC instance
  * suite). Derby folds unquoted identifiers to uppercase, stores default
  * strings as CLOB (non-comparable — hence the VARCHAR cast), rejects the
  * ANSI `TIMESTAMP '...'` literal in favor of `TIMESTAMP('...')`, and has
  * no BOOLEAN literal pre-10.7 TRUE/FALSE issues we need to dodge. */
object DerbyDialect extends SqlDialect {
  val flavor = "derby"
  override protected def timestampLiteral(t: java.sql.Timestamp): String =
    s"TIMESTAMP('${t.toString}')"
  override def comparable(quotedId: String, isStringCol: Boolean): String =
    if (isStringCol) s"CAST($quotedId AS VARCHAR(32672))" else quotedId
  def upsertSql(table: String, staging: String, keys: Seq[String],
                cols: Seq[String], nullSafeKeys: Boolean): Seq[String] =
    mergeSql(table, staging, keys, cols, nullSafeKeys)
}

/** TEMPLATE dialect (rendered-SQL unit tests only): PostgreSQL.
  * Upsert via `INSERT ... ON CONFLICT (keys) DO UPDATE` — requires the
  * unique index on the keys the reference also requires
  * (utils/sql.py UPDATE_QUERIES['postgresql']). */
object PostgresDialect extends SqlDialect {
  val flavor = "postgresql"
  override def nullSafeEq(a: String, b: String): String =
    s"$a IS NOT DISTINCT FROM $b"
  def upsertSql(table: String, staging: String, keys: Seq[String],
                cols: Seq[String], nullSafeKeys: Boolean): Seq[String] = {
    val nonKeys = cols.filterNot(keys.contains)
    val doClause =
      if (nonKeys.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " +
        nonKeys.map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
    Seq(s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) " +
      s"SELECT ${cols.map(quote).mkString(", ")} FROM $staging " +
      s"ON CONFLICT (${keys.map(quote).mkString(", ")}) $doClause")
  }
}

/** TEMPLATE dialect (rendered-SQL unit tests only): MySQL/MariaDB.
  * Backtick quoting; upsert via `ON DUPLICATE KEY UPDATE`
  * (UPDATE_QUERIES['mysql']). */
object MySqlDialect extends SqlDialect {
  val flavor = "mysql"
  override def quote(id: String): String = "`" + id.replace("`", "``") + "`"
  override def nullSafeEq(a: String, b: String): String = s"$a <=> $b"
  def upsertSql(table: String, staging: String, keys: Seq[String],
                cols: Seq[String], nullSafeKeys: Boolean): Seq[String] = {
    val nonKeys = cols.filterNot(keys.contains)
    val update =
      if (nonKeys.isEmpty) keys.headOption.map(k =>
        s"${quote(k)} = ${quote(k)}").getOrElse("")
      else nonKeys.map(c => s"${quote(c)} = VALUES(${quote(c)})").mkString(", ")
    Seq(s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) " +
      s"SELECT ${cols.map(quote).mkString(", ")} FROM $staging " +
      s"ON DUPLICATE KEY UPDATE $update")
  }
}

/** TEMPLATE dialect (rendered-SQL unit tests only): SQL Server — ANSI
  * MERGE with bracket-friendly quoting left as double quotes
  * (QUOTED_IDENTIFIER ON), per UPDATE_QUERIES['mssql']. */
object MsSqlDialect extends SqlDialect {
  val flavor = "mssql"
  def upsertSql(table: String, staging: String, keys: Seq[String],
                cols: Seq[String], nullSafeKeys: Boolean): Seq[String] =
    mergeSql(table, staging, keys, cols, nullSafeKeys).map(_ + ";")
}

/** TEMPLATE dialect (rendered-SQL unit tests only): Oracle — ANSI MERGE
  * (UPDATE_QUERIES['oracle']). */
object OracleDialect extends SqlDialect {
  val flavor = "oracle"
  def upsertSql(table: String, staging: String, keys: Seq[String],
                cols: Seq[String], nullSafeKeys: Boolean): Seq[String] =
    mergeSql(table, staging, keys, cols, nullSafeKeys)
}

/** TEMPLATE dialect (rendered-SQL unit tests only): SQLite — the
  * reference's delete-then-insert shape (UPDATE_QUERIES['sqlite']),
  * rendered as two statements. */
object SqliteDialect extends SqlDialect {
  val flavor = "sqlite"
  def upsertSql(table: String, staging: String, keys: Seq[String],
                cols: Seq[String], nullSafeKeys: Boolean): Seq[String] = {
    val on = keys.map { k =>
      val a = s"p.${quote(k)}"; val b = s"$table.${quote(k)}"
      if (nullSafeKeys) nullSafeEq(a, b) else s"$a = $b"
    }.mkString(" AND ")
    Seq(
      s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $staging p WHERE $on)",
      s"INSERT INTO $table (${cols.map(quote).mkString(", ")}) " +
        s"SELECT ${cols.map(quote).mkString(", ")} FROM $staging")
  }
}
