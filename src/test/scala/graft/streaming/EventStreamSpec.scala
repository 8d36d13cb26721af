package graft.streaming

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  test("session_window sessionization equals the lag/cumsum formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.events(spark, graft.SparkSpec.Sf0001)
    val viaOp = graft.SparkEntry.queries("ev_sessionize")(spark, graft.SparkSpec.Sf0001)
      .collect().map(_.toSeq).toSeq
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    val viaLag = events
      .withColumn("prev", lag(us, 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || us - col("prev") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(us).as("session_start_us"), count(lit(1)).as("n_events"),
        (max(us) - min(us)).as("duration_us"),
        graft.queries.OracleCompat.dsum(col("value")).as("sum_value"))
      .select("user_id", "session_start_us", "n_events", "duration_us", "sum_value")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq
    assert(viaOp == viaLag)
    assert(viaOp.nonEmpty)
  }

  test("streaming windowed agg equals the batch plan on the same files") {
    val sf = graft.SparkSpec.Sf0001
    val batch = EventStream.windowedAggBatch(spark, sf)
      .orderBy("hour_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val stream = EventStream.runWindowedStream(spark, sf, "graft_test_stream")
      .orderBy("hour_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
    assert(batch.nonEmpty)
  }
}
