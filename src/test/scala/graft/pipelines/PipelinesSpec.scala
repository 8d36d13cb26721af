package graft.pipelines

import graft.SparkSpec
import graft.core.{BatchLedger, Tables}
import org.apache.spark.sql.functions._

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("DxGroup.run: end-to-end schema, row preservation, batch stamping") {
    val docs = Tables.documents(spark, graft.SparkSpec.Sf0001)
    val out = DxGroup.run(spark, docs, batchId = 42L)
    assert(out.columns.toSeq == Seq("batchid", "msgid", "predicted_label_id",
      "model_score", "model_id", "predicted_label"))
    val rows = out.agg(count(lit(1)), countDistinct($"msgid"),
      min($"batchid"), max($"batchid")).collect()(0)
    assert(rows.getLong(0) == docs.count())  // label join preserves rows
    assert(rows.getLong(1) == rows.getLong(0))
    assert(rows.getLong(2) == 42L && rows.getLong(3) == 42L)
    val labelRange = out.agg(min($"predicted_label_id"), max($"predicted_label_id")).collect()(0)
    assert(labelRange.getLong(0) >= 0 && labelRange.getLong(1) <= 15)
  }

  test("pretrain_pipeline reliable barriers: checkpoint-to-dir path " +
      "produces the exact same rows as the localCheckpoint default") {
    import graft.ops.Curation
    def run() = graft.SparkEntry.queries("pretrain_pipeline")(
      spark, graft.SparkSpec.Sf0001).collect().map(_.toSeq).toSeq
    val local = run()
    spark.conf.set(Curation.ReliableBarriersKey, "true")
    try {
      val reliable = run()
      assert(reliable == local,
        "reliable-checkpoint barriers must not change the result")
      // the reliable path actually wrote through the checkpoint dir
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "reliable barriers must have set a checkpoint dir")
    } finally spark.conf.unset(Curation.ReliableBarriersKey)
  }

  test("stageBarrier size-adaptive mode: a sub-threshold barrier stays " +
      "local (no reliable-checkpoint write); under a forced-low " +
      "threshold the SAME barrier auto-promotes to a reliable " +
      "checkpoint with identical rows and releases its local blocks") {
    import graft.ops.Curation
    val sc = spark.sparkContext
    val df = Tables.documents(spark, graft.SparkSpec.Sf0001)
      .select($"doc_id", $"source")
    def ckFiles(): Int = sc.getCheckpointDir.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(sc.hadoopConfiguration)
      if (fs.exists(p)) fs.listStatus(p).length else 0
    }.getOrElse(0)
    // default threshold (64 GiB): the sf0.001 barrier is tiny -> local
    val filesBefore = ckFiles()
    val local = Curation.stageBarrier(df)
    val localRows = local.collect().map(_.toSeq).sortBy(_.head.toString)
    assert(ckFiles() == filesBefore,
      "a sub-threshold barrier must not write a reliable checkpoint")
    // forced-low threshold: the measured localCheckpoint bytes exceed 1,
    // so the barrier promotes — checkpoint dir gains a unit, rows are
    // bit-identical, and the redundant local copy is unpersisted
    spark.conf.set(Curation.BarrierReliableBytesKey, "1")
    try {
      val idsBefore = sc.getPersistentRDDs.keySet
      val promoted = Curation.stageBarrier(df)
      assert(ckFiles() > filesBefore,
        "an over-threshold barrier must write through the checkpoint dir")
      assert(promoted.collect().map(_.toSeq).sortBy(_.head.toString)
          .toSeq == localRows.toSeq,
        "promotion must not change the barrier's rows")
      val leaked = sc.getPersistentRDDs.keySet.diff(idsBefore)
      assert(leaked.isEmpty,
        s"promotion must release the interim local blocks, leaked: $leaked")
    } finally spark.conf.unset(Curation.BarrierReliableBytesKey)
  }

  test("DxGroup stage composition matches staged execution (no hidden state)") {
    val docs = Seq((1L, "GROSS DESCRIPTION: Short Specimen MICROSCOPIC: cells"))
      .toDF("doc_id", "text")
    val cleaned = DxGroup.clean(docs, 5L)
    assert(cleaned.columns.toSeq == Seq("batch_id", "msgid", "msg"))
    val preped = DxGroup.prep(cleaned)
    val r = preped.collect()(0)
    // cleanMsg lowercases, so the uppercase clinical headers don't match:
    // whole text falls through as 'entire report'
    assert(r.getAs[String]("part_of_report") == "entire report")
  }

  test("Prostate.run: 19-column fan-in, one row per doc, constants applied") {
    val docs = Tables.documents(spark, graft.SparkSpec.Sf0001).limit(50)
    val out = Prostate.run(spark, docs,
      questions = graft.ops.Inference.fixtureQuestions)
    assert(out.columns.length == 19)
    assert(out.count() == 50)
    val r = out.select("site_code", "behaviour_code", "laterality").distinct().collect()
    assert(r.toSeq.map(x => (x.getString(0), x.getString(1), x.getString(2))) ==
      Seq(("C61.9", "3", "00")))
  }

  test("BatchLedger allocates sequential ids and records history") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    val ledger = new BatchLedger(spark, s"$dir/ledger")
    val id1 = ledger.newBatch("p", "20220101", "20230101", "c1")
    val id2 = ledger.newBatch("p", "20220101", "20230101", "c2")
    assert(id1 == 1L && id2 == 2L)
    assert(ledger.history.count() == 2)
    assert(BatchLedger.stamp(Seq(1).toDF("x"), id2).select("batch_id")
      .as[Long].first() == 2L)
  }

  test("BatchLedger compacts past maxFragments: bounded files, ids and history intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger_c").toString
    val path = s"$dir/ledger"
    val ledger = new BatchLedger(spark, path, maxFragments = 4)
    val ids = (1 to 12).map(i => ledger.newBatch("p", "20220101", "20230101", s"c$i"))
    assert(ids == (1L to 12L)) // allocation survives every compaction
    assert(ledger.history.count() == 12)
    assert(ledger.history.select("comment").as[String].collect().toSet ==
      (1 to 12).map(i => s"c$i").toSet)
    // the directory never grows without bound: after the last allocation
    // at most maxFragments+1 part-files remain (one compacted + appends)
    val parts = new java.io.File(path).listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(parts <= 5, s"ledger fragment count unbounded: $parts files")
    // and no stray compaction temp directory is left behind
    assert(!new java.io.File(s"${path}__compact_tmp").exists())
  }

  test("BatchLedger recovers a compaction swap that crashed mid-rename") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ledger_r").toString
    val path = s"$dir/ledger"
    val ledger = new BatchLedger(spark, path)
    (1 to 3).foreach(i => ledger.newBatch("p", "20220101", "20230101", s"c$i"))
    // crash between delete(ledger) and rename(tmp, ledger): only the tmp
    // copy exists — exactly what a mid-swap driver death leaves behind
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(s"${path}__compact_tmp")
    assert(fs.rename(p, tmp))
    assert(!new java.io.File(path).exists())
    // next allocation must recover the ledger and CONTINUE the sequence —
    // a silent restart at 1 would alias new batches onto replayed ids
    val id4 = ledger.newBatch("p", "20220101", "20230101", "c4")
    assert(id4 == 4L, s"expected recovery to id 4, got $id4")
    assert(ledger.history.count() == 4)
    assert(!new java.io.File(s"${path}__compact_tmp").exists())
    // crash BEFORE the delete: tmp copy beside an intact ledger is stale
    // and gets dropped, allocation unaffected
    fs.mkdirs(tmp)
    val id5 = ledger.newBatch("p", "20220101", "20230101", "c5")
    assert(id5 == 5L)
    assert(!new java.io.File(s"${path}__compact_tmp").exists())
  }
}
