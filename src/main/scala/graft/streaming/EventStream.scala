package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming surface (SURVEY.md §2.9 — extension surface; the
  * reference is batch-only, the `events` fixture enables the demo).
  *
  * The same tumbling-window aggregation is exposed two ways:
  *  - [[windowedAggBatch]]: the batch plan (used by the oracle-checked
  *    `ev_window` query);
  *  - [[runWindowedStream]]: a real `readStream → window agg → memory
  *    sink` run, driven synchronously with processAllAvailable() so the
  *    verify harness can assert stream ≡ batch on the same files.
  *
  * At scale the source becomes Kafka/file-notification, the trigger is
  * continuous micro-batch, and `withWatermark` bounds state; the plan
  * itself (window + partial agg + state store) is unchanged.
  */
object EventStream {

  private val dec = DecimalType(28, 8)

  private def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec)).cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))

  def windowedAggBatch(spark: SparkSession, sfDir: String): DataFrame =
    windowedAgg(graft.core.Tables.events(spark, sfDir))

  /** Run the streaming version over the same parquet file(s) and return the
    * complete-mode result table. Watermark is declared (bounding state in a
    * live deployment) even though complete mode retains all windows.
    */
  def runWindowedStream(spark: SparkSession, sfDir: String,
                        queryName: String = "graft_events_stream"): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // file-stream sources need a directory; glob-filter to the events file
    val stream = graft.core.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
    val agg = windowedAgg(stream.withWatermark("ts", "2 hours"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
