package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.storage._

/** The dialect seam in isolation: every flavor template renders the upsert
  * shape the reference keys by flavor (utils/sql.py UPDATE_QUERIES), and a
  * custom mock dialect slots in without touching the store. Derby is the
  * only integration-tested flavor (see JdbcInstanceSpec); these are
  * rendered-SQL round-trips. */
class SqlDialectSpec extends AnyFunSuite {
  private val keys = Seq("dt", "id")
  private val cols = Seq("dt", "id", "val")

  test("Derby renders ANSI MERGE with CLOB-safe comparisons elsewhere") {
    val Seq(sql) = DerbyDialect.upsertSql("T", "S", keys, cols, nullSafeKeys = false)
    assert(sql.startsWith("MERGE INTO T t USING S p ON "))
    assert(sql.contains("""t."dt" = p."dt" AND t."id" = p."id""""))
    assert(sql.contains("""WHEN MATCHED THEN UPDATE SET "val" = p."val""""))
    assert(sql.contains("""WHEN NOT MATCHED THEN INSERT ("dt", "id", "val")"""))
    assert(DerbyDialect.comparable("\"s\"", isStringCol = true) ==
      "CAST(\"s\" AS VARCHAR(32672))")
    assert(DerbyDialect.comparable("\"n\"", isStringCol = false) == "\"n\"")
    assert(DerbyDialect.literal(java.time.LocalDateTime.parse("2024-01-02T03:04:05")) ==
      "TIMESTAMP('2024-01-02 03:04:05.0')")
  }

  test("null-safe keys expand per flavor") {
    val Seq(derby) = DerbyDialect.upsertSql("T", "S", Seq("k"), cols :+ "k", nullSafeKeys = true)
    assert(derby.contains("""(t."k" = p."k" OR (t."k" IS NULL AND p."k" IS NULL))"""))
    assert(PostgresDialect.nullSafeEq("a", "b") == "a IS NOT DISTINCT FROM b")
    assert(MySqlDialect.nullSafeEq("a", "b") == "a <=> b")
  }

  test("Postgres renders INSERT ... ON CONFLICT DO UPDATE") {
    val Seq(sql) = PostgresDialect.upsertSql("T", "S", keys, cols, nullSafeKeys = false)
    assert(sql.startsWith("INSERT INTO T"))
    assert(sql.contains("""ON CONFLICT ("dt", "id") DO UPDATE SET "val" = EXCLUDED."val""""))
  }

  test("MySQL renders backticks and ON DUPLICATE KEY UPDATE") {
    val Seq(sql) = MySqlDialect.upsertSql("T", "S", keys, cols, nullSafeKeys = false)
    assert(sql.contains("INSERT INTO T (`dt`, `id`, `val`)"))
    assert(sql.contains("ON DUPLICATE KEY UPDATE `val` = VALUES(`val`)"))
  }

  test("SQLite renders the reference's delete-then-insert pair") {
    val stmts = SqliteDialect.upsertSql("T", "S", keys, cols, nullSafeKeys = false)
    assert(stmts.length == 2)
    assert(stmts.head.startsWith("DELETE FROM T WHERE EXISTS (SELECT 1 FROM S p WHERE "))
    assert(stmts.head.contains("""p."dt" = T."dt""""))
    assert(stmts(1) == """INSERT INTO T ("dt", "id", "val") SELECT "dt", "id", "val" FROM S""")
  }

  test("MSSQL/Oracle share the ANSI MERGE body") {
    val Seq(ms) = MsSqlDialect.upsertSql("T", "S", keys, cols, nullSafeKeys = false)
    val Seq(ora) = OracleDialect.upsertSql("T", "S", keys, cols, nullSafeKeys = false)
    assert(ms.stripSuffix(";") == ora)
    assert(ms.endsWith(";"))
  }

  test("a mock dialect slots in: custom quoting flows through every renderer") {
    object Mock extends SqlDialect {
      val flavor = "mock"
      override def quote(id: String): String = s"[$id]"
      def upsertSql(table: String, staging: String, keys: Seq[String],
                    cols: Seq[String], nullSafeKeys: Boolean): Seq[String] =
        mergeSql(table, staging, keys, cols, nullSafeKeys)
    }
    val Seq(sql) = Mock.upsertSql("T", "S", Seq("id"), Seq("id", "v"), nullSafeKeys = false)
    assert(sql == "MERGE INTO T t USING S p ON t.[id] = p.[id]" +
      " WHEN MATCHED THEN UPDATE SET [v] = p.[v]" +
      " WHEN NOT MATCHED THEN INSERT ([id], [v]) VALUES (p.[id], p.[v])")
    assert(Mock.literal("o'x") == "'o''x'")
    assert(Mock.literal(java.time.LocalDateTime.parse("2024-01-02T03:04:05")) ==
      "TIMESTAMP '2024-01-02 03:04:05.0'")
  }
}
