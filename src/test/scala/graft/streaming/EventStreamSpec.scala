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

  test("streaming IVF ingest serves identically to batch-maintained " +
      "layout (bootstrap + append), which serves as one assignment pass") {
    val sf = graft.SparkSpec.Sf0001
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = graft.ops.Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
    def probe(path: String) =
      graft.ops.Similarity.ivfProbeLayout(spark, path, q, k = 10, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // streamed: bootstrap on 3/4, stream the held-out quarter
    val streamed = java.nio.file.Files
      .createTempDirectory("graft_stream_ivf_spec").toString + "/emb"
    EventStream.runIvfIngestStream(spark, sf, streamed,
      kClusters = 4, iters = 2)
    // batch-maintained twin: same bootstrap, same quarter via
    // ivfAppendLayout directly
    val batch = java.nio.file.Files
      .createTempDirectory("graft_batch_ivf_spec").toString + "/emb"
    graft.ops.Similarity.ivfWriteLayout(
      emb.filter(emb("vec_id") % 4 =!= 1), "vec_id", "embedding", batch,
      kClusters = 4, iters = 2)
    graft.ops.Similarity.ivfAppendLayout(
      emb.filter(emb("vec_id") % 4 === 1), "vec_id", "embedding", batch,
      batchId = 1L)
    assert(probe(streamed) == probe(batch),
      "streamed layout must serve exactly like its batch-maintained twin")
  }

  test("streaming foreachBatch + idempotent append is exactly-once across a " +
      "crash between staging and publish, and across restarts") {
    val sf = graft.SparkSpec.Sf0001
    val url = "jdbc:derby:memory:graftstream;create=true"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_eos").toString
    val expected = spark.read.parquet(s"$sf/events.parquet").count()

    def tableCount(name: String): Long =
      try spark.read.jdbc(url, name, new java.util.Properties).count()
      catch { case _: Exception => -1L }

    // run 1: inject a crash AFTER staging, BEFORE the atomic publish —
    // the worst window (work done, nothing recorded)
    val boom = intercept[Throwable] {
      EventStream.runExactlyOnceJdbc(spark, sf, url, ckpt,
        dataTable = "ev_out", ledgerTable = "ev_ledger",
        beforePublish = _ => throw new RuntimeException("injected crash"))
    }
    assert(Option(boom.getMessage).exists(_.contains("injected"))
      || Option(boom.getCause).exists(c =>
        Option(c.getMessage).exists(_.contains("injected"))),
      s"unexpected failure: $boom")
    assert(tableCount("ev_out") <= 0, "crash before publish must leave no visible rows")

    // run 2: same checkpoint, fault removed — streaming replays batch 0
    // with the SAME id, the append completes it exactly once
    EventStream.runExactlyOnceJdbc(spark, sf, url, ckpt,
      dataTable = "ev_out", ledgerTable = "ev_ledger")
    assert(tableCount("ev_out") == expected)
    assert(tableCount("ev_ledger") == 1, "one ledger row per published batch")

    // run 3: same checkpoint again, no new source data — a restart must
    // publish nothing new (no duplicate batches, no re-publish)
    EventStream.runExactlyOnceJdbc(spark, sf, url, ckpt,
      dataTable = "ev_out", ledgerTable = "ev_ledger")
    assert(tableCount("ev_out") == expected)
    assert(tableCount("ev_ledger") == 1)
  }
}
