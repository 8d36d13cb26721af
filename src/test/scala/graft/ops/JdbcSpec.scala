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
}
