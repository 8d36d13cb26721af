package graft.streaming

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

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
