package graft.sources

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** Fake transport for the DSv2 connector: deterministic rows per day,
  * and a JVM-wide record of fetched windows so tests can assert how many
  * fetches the PLANNER scheduled (local mode: executors share the JVM).
  */
class RecordingTransport extends ApiTransport {
  override def fetch(url: String, dateFrom: String, dateTo: String,
                     token: String): Seq[Row] = {
    RecordingTransport.calls.add(s"$dateFrom..$dateTo")
    val day = dateFrom.substring(8, 10).toInt
    Seq(Row(day.toLong * 10, dateFrom, s"msg-$day-a", token),
      Row(day.toLong * 10 + 1, dateFrom, s"msg-$day-b", token))
  }
}

object RecordingTransport {
  val calls = new ConcurrentLinkedQueue[String]()
}

class ApiSourceV2Spec extends SparkSpec {

  private val schemaDdl = "msgid BIGINT, msg_date STRING, message STRING, tok STRING"

  private def reader = spark.read.format("graft-api")
    .option("schema", schemaDdl)
    .option("url", "https://example.test/messages")
    .option("token", "tkn")
    .option("transport", classOf[RecordingTransport].getName)
    .option("dateFrom", "2024-01-01")
    .option("dateTo", "2024-01-03")

  test("spark.read.format(graft-api): one partition per day, fetch on executors") {
    RecordingTransport.calls.clear()
    val df = reader.load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("msgid", "msg_date", "message", "tok"))
    val rows = df.orderBy("msgid").collect()
    assert(rows.length == 6) // 3 days x 2 rows
    assert(rows.head.getLong(0) == 10L && rows.head.getString(2) == "msg-1-a")
    assert(rows.forall(_.getString(3) == "tkn")) // token reached the transport
    assert(df.rdd.getNumPartitions == 3)
    assert(RecordingTransport.calls.asScala().toSet ==
      Set("2024-01-01..2024-01-01", "2024-01-02..2024-01-02",
        "2024-01-03..2024-01-03"))
  }

  test("date-range filter pushdown narrows the planned fetch windows") {
    RecordingTransport.calls.clear()
    val df = reader.load().filter(col("msg_date") >= "2024-01-02")
    assert(df.count() == 4) // days 2 and 3 only
    // the planner never scheduled the day-1 fetch
    assert(RecordingTransport.calls.asScala().toSet ==
      Set("2024-01-02..2024-01-02", "2024-01-03..2024-01-03"))
    // equality pins a single window
    RecordingTransport.calls.clear()
    assert(reader.load().filter(col("msg_date") === "2024-01-02").count() == 2)
    assert(RecordingTransport.calls.asScala().toSet ==
      Set("2024-01-02..2024-01-02"))
    // residual safety: pushdown narrows windows but Spark still filters
    RecordingTransport.calls.clear()
    val strict = reader.load()
      .filter(col("msg_date") >= "2024-01-02" && col("message") === "msg-2-a")
    assert(strict.count() == 1)
  }

  test("column pruning reaches the scan's readSchema") {
    val df = reader.load().select("msgid")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }
    assert(scan.isDefined, "expected a BatchScanExec for the DSv2 source")
    assert(scan.get.readSchema().fieldNames.toSeq == Seq("msgid"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(10L, 11L, 20L, 21L, 30L, 31L))
  }

  test("an inverted or empty window plans zero partitions") {
    RecordingTransport.calls.clear()
    val df = reader.option("dateTo", "2023-12-31").load()
    assert(df.count() == 0)
    assert(RecordingTransport.calls.isEmpty)
  }

  implicit private class QAsScala(q: ConcurrentLinkedQueue[String]) {
    def asScala(): Seq[String] = {
      val it = q.iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
