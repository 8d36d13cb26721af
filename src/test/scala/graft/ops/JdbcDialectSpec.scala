package graft.ops

import org.apache.spark.sql.execution.datasources.jdbc.JDBCOptions
import org.apache.spark.sql.jdbc.JdbcDialects
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables

/** S2 dialect pinning for the reference's `input_db_type` enum
  * (`['sql-server','postgres']`, Diagnostic_group_pipeline.py:138). The
  * live round-trip is Derby-gated (JdbcSpec); these pin the part that
  * DIFFERS per production dialect — URL construction, dialect routing,
  * identifier quoting, and the pushed-down top-n SQL shape — without a
  * live server, so a Spark upgrade that changes what we ship to SQL
  * Server/Postgres fails here, not in production.
  */
class JdbcDialectSpec extends AnyFunSuite {

  private val mssqlUrl =
    Tables.jdbcUrl("sql-server", "dbhost", "registry", Some(1433))
  private val pgUrl = Tables.jdbcUrl("postgres", "dbhost", "registry")

  test("jdbcUrl: canonical URL per input_db_type; loud on unknown") {
    assert(mssqlUrl == "jdbc:sqlserver://dbhost:1433;databaseName=registry")
    assert(pgUrl == "jdbc:postgresql://dbhost/registry")
    assert(Tables.jdbcUrl("postgres", "h", "d", Some(5433)) ==
      "jdbc:postgresql://h:5433/d")
    intercept[IllegalArgumentException] {
      Tables.jdbcUrl("oracle", "h", "d")
    }
  }

  test("dialect routing: each URL resolves its Spark dialect") {
    assert(JdbcDialects.get(mssqlUrl).getClass.getSimpleName
      .contains("MsSqlServer"), JdbcDialects.get(mssqlUrl).toString)
    assert(JdbcDialects.get(pgUrl).getClass.getSimpleName
      .contains("Postgres"), JdbcDialects.get(pgUrl).toString)
  }

  test("identifier quoting: both dialects double-quote (never backticks)") {
    // what reaches the wire for a column named like a keyword/mixed case
    assert(JdbcDialects.get(mssqlUrl).quoteIdentifier("msg_date") ==
      "\"msg_date\"")
    assert(JdbcDialects.get(pgUrl).quoteIdentifier("msg_date") ==
      "\"msg_date\"")
  }

  test("top-n pushdown shape: SQL Server emits TOP (n), Postgres LIMIT n") {
    def topN(url: String): String = {
      val dialect = JdbcDialects.get(url)
      val opts = new JDBCOptions(Map(
        "url" -> url, "dbtable" -> "messages",
        // dialect-only test: any loadable driver satisfies JDBCOptions
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
      dialect.getJdbcSQLQueryBuilder(opts)
        .withColumns(Array("\"msgid\"", "\"message\""))
        .withLimit(3)
        .build()
        .trim
    }
    val mssql = topN(mssqlUrl)
    // SQL Server has no LIMIT clause: a limit that stayed LIMIT-shaped
    // would throw server-side and Spark would fall back to a full scan
    assert(mssql.startsWith("SELECT TOP (3) \"msgid\",\"message\""), mssql)
    assert(!mssql.toUpperCase.contains("LIMIT"), mssql)
    assert(JdbcDialects.get(mssqlUrl).supportsLimit)

    val pg = topN(pgUrl)
    assert(pg.startsWith("SELECT \"msgid\",\"message\""), pg)
    assert(pg.toUpperCase.contains("LIMIT 3"), pg)
    assert(JdbcDialects.get(pgUrl).supportsLimit)
  }
}
