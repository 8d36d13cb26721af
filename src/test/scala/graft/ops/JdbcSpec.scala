package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S2/K1 — real JDBC round-trip against embedded Derby (in-memory, ships
  * with the Spark distribution): bulk append, projected + filtered read
  * with predicate pushdown into the database.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("K1 jdbcAppend + S2 pushdown read round-trip") {
    val df = Seq(
      (1L, "20220101", "first msg"), (2L, "20220615", "second msg"),
      (3L, "20230301", "third msg"))
      .toDF("msgid", "msg_date", "message")
    // Derby maps StringType to CLOB (not filterable) — pin VARCHAR
    val colTypes = Map("createTableColumnTypes" ->
      "msg_date VARCHAR(8), message VARCHAR(200)")
    Sinks.jdbcAppend(df, url, "messages", props, options = colTypes)
    // append again: accumulates (reference insert_data is append-only)
    Sinks.jdbcAppend(df.filter($"msgid" === 1L), url, "messages", props,
      options = colTypes)

    val back = graft.core.Tables.jdbc(spark, url, "messages", props)
    assert(back.count() == 4)

    // the reference's get_messages shape: projection + date-range filter
    // (Diagnostic_group_pipeline.py:76-78) — both push into the DB query
    val windowed = back
      .filter($"msg_date" >= "20220101" && $"msg_date" <= "20221231")
      .select("msgid", "message")
    assert(windowed.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 1L, 2L))
    val plan = windowed.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("msg_date"),
      s"filter should push into JDBC scan:\n$plan")
  }

  test("exactly-once streaming sink: foreachBatch + batch ledger survives replay") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val colTypes = Map("createTableColumnTypes" -> "word VARCHAR(40)")
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("k", "word").writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        Sinks.idempotentBatchAppend(df, id, url, "sink_ledger", "sink_out",
          props, options = colTypes); ()
      }
      .start()
    try {
      input.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      input.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()

    val out = graft.core.Tables.jdbc(spark, url, "sink_out", props)
    assert(out.count() == 3)

    // crash-replay: the engine re-delivers batch 1 — the ledger skips it
    val replay = Seq((3L, "c")).toDF("k", "word")
    val wrote = Sinks.idempotentBatchAppend(replay, 1L, url,
      "sink_ledger", "sink_out", props, options = colTypes)
    assert(!wrote)
    assert(graft.core.Tables.jdbc(spark, url, "sink_out", props).count() == 3)
    // a genuinely new batch still writes
    val wrote2 = Sinks.idempotentBatchAppend(replay, 99L, url,
      "sink_ledger", "sink_out", props, options = colTypes)
    assert(wrote2)
    assert(graft.core.Tables.jdbc(spark, url, "sink_out", props).count() == 4)
  }

  test("staging-table publish: a crash between staging and publish loses " +
    "nothing; the replay ends exactly-once") {
    val colTypes = Map("createTableColumnTypes" -> "word VARCHAR(40)")
    def count(table: String): Long =
      graft.core.Tables.jdbc(spark, url, table, props).count()

    val batch = Seq((1L, "x"), (2L, "y")).toDF("k", "word")
    // crash INSIDE the window the naive ledger-then-append recipe gets
    // wrong: after the partition-parallel staging write, before publish
    val boom = intercept[RuntimeException] {
      Sinks.idempotentBatchAppend(batch, 7L, url, "eo_ledger", "eo_out",
        props, options = colTypes,
        beforePublish = () => throw new RuntimeException("crash before publish"))
    }
    assert(boom.getMessage == "crash before publish")
    // nothing published, nothing in the ledger: the batch is NOT marked done
    assert(!spark.read.jdbc(url, "eo_ledger", props).collect().map(_.getLong(0))
      .contains(7L))
    // data table may not even exist yet; staging residue is allowed

    // the engine replays the same (batchId, data): publish succeeds once
    val wrote = Sinks.idempotentBatchAppend(batch, 7L, url, "eo_ledger",
      "eo_out", props, options = colTypes)
    assert(wrote)
    assert(count("eo_out") == 2)

    // a second replay after the successful publish is a no-op
    val wroteAgain = Sinks.idempotentBatchAppend(batch, 7L, url, "eo_ledger",
      "eo_out", props, options = colTypes)
    assert(!wroteAgain)
    assert(count("eo_out") == 2)

    // staging table is cleaned up after a successful publish
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val left = conn.getMetaData.getTables(null, null, "EO_OUT_STG_7", null)
      assert(!left.next(), "staging table should be dropped after publish")
    } finally conn.close()
  }

  // ---- dialect assertions for the registry's two target engines --------
  // (db_type enum ['sql-server','postgres']; no live DB exists in the
  // sandbox, but the DDL Spark's writer will generate is inspectable
  // through JdbcDialects, so the per-engine surface is pinned here.)

  private val sinkSchema = new org.apache.spark.sql.types.StructType()
    .add("msgid", "long").add("message", "string")
    .add("seen_at", "timestamp").add("ok", "boolean").add("blob", "binary")

  test("Postgres dialect: CREATE TABLE types + quoted identifiers our sinks rely on") {
    import org.apache.spark.sql.graft.{Shims => SqlShims}
    val pgUrl = "jdbc:postgresql://host:5432/registry"
    val ddl = SqlShims.jdbcSchemaString(pgUrl, sinkSchema)
    // case-preserving double quotes — matches quotedCols' hand-written SQL
    assert(ddl.contains("\"msgid\" BIGINT"), ddl)
    assert(ddl.contains("\"message\" TEXT"), ddl)
    assert(ddl.contains("\"seen_at\" TIMESTAMP"), ddl)
    assert(ddl.contains("\"ok\" BOOLEAN"), ddl)
    assert(ddl.contains("\"blob\" BYTEA"), ddl)
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(pgUrl)
    assert(dialect.quoteIdentifier("msg_date") == "\"msg_date\"")
  }

  test("SQL Server dialect: CREATE TABLE types + quoted identifiers our sinks rely on") {
    import org.apache.spark.sql.graft.{Shims => SqlShims}
    val msUrl = "jdbc:sqlserver://host;databaseName=registry"
    val ddl = SqlShims.jdbcSchemaString(msUrl, sinkSchema)
    assert(ddl.contains("\"msgid\" BIGINT"), ddl)
    assert(ddl.contains("\"message\" NVARCHAR(MAX)"), ddl)
    assert(ddl.contains("\"seen_at\" DATETIME"), ddl)
    assert(ddl.contains("\"ok\" BIT"), ddl)
    assert(ddl.contains("\"blob\" VARBINARY(MAX)"), ddl)
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(msUrl)
    // double-quoted identifiers are valid under SQL Server's default
    // QUOTED_IDENTIFIER ON — the assumption quotedCols' publish SQL makes
    assert(dialect.quoteIdentifier("msg_date") == "\"msg_date\"")
  }

  test("createTableColumnTypes overrides flow through per dialect (the VARCHAR pin)") {
    import org.apache.spark.sql.graft.{Shims => SqlShims}
    val ddl = SqlShims.jdbcSchemaString("jdbc:postgresql://h/d",
      new org.apache.spark.sql.types.StructType().add("word", "string"),
      Some("word VARCHAR(40)"))
    assert(ddl.contains("\"word\" VARCHAR(40)"), ddl)
  }

  test("quotedCols: the publish statement quotes exactly like Spark's JDBC writer") {
    val cols = Sinks.quotedCols(new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("MixedCase", "string").add("msg_date", "string"))
    assert(cols == "\"k\", \"MixedCase\", \"msg_date\"")
  }
}
