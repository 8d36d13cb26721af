package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** K2/O6 — batch/lineage bookkeeping (SURVEY.md §2.2, §2.8).
  *
  * Every reference run inserts a `batch` row (pipeline name, date window,
  * comment = full params string) into Postgres and reads back the
  * DB-generated serial `batch_id`, then stamps that id onto every derived
  * row (reference: conn.insert_row(table_name="batch", ...),
  * diagnostic_group_pipeline_with_api.py:104-132).
  *
  * In a lake-only deployment there is no serial column, so the ledger is a
  * small parquet table owned by the driver: allocate `max(batch_id)+1`,
  * append the new row. Single-driver ⇒ race-free; on a shared lake this
  * would sit behind a transactional table format, same API. Observable
  * semantics match `INSERT ... RETURNING batch_id` (SURVEY.md §7.3).
  */
final class BatchLedger(spark: SparkSession, ledgerPath: String,
                        maxFragments: Int = 16) {

  private def existing: Option[DataFrame] =
    try {
      val df = spark.read.parquet(ledgerPath)
      if (df.columns.contains("batch_id")) Some(df) else None
    } catch {
      // only "no ledger yet" is a normal first run; real failures
      // (permissions, corrupt files, OOM) must propagate
      case _: org.apache.spark.sql.AnalysisException => None
    }

  private def hadoopPath = new org.apache.hadoop.fs.Path(ledgerPath)
  private def fs = hadoopPath.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def fragmentCount: Int =
    try fs.listStatus(hadoopPath)
      .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    catch { case _: java.io.FileNotFoundException => 0 }

  private def tmpPath = new org.apache.hadoop.fs.Path(
    ledgerPath.stripSuffix("/") + "__compact_tmp")

  /** Crash recovery for the compaction swap: a driver that died between
    * `delete(ledger)` and `rename(tmp, ledger)` leaves ONLY the tmp copy
    * — without this step the next allocation would see "no ledger" and
    * silently restart at batch_id 1, making idempotent sinks treat new
    * batches as replays (data loss). Tmp present + ledger missing ⇒ the
    * tmp copy IS the ledger: rename it back. Tmp present + ledger intact
    * ⇒ the crash happened before the delete; the tmp copy is stale —
    * drop it.
    */
  private def recoverCompaction(): Unit = {
    val t = tmpPath
    if (fs.exists(t)) {
      if (!fs.exists(hadoopPath)) {
        if (!fs.rename(t, hadoopPath))
          throw new java.io.IOException(
            s"ledger compaction recovery rename failed: $t -> $ledgerPath")
      } else {
        fs.delete(t, true)
      }
    }
  }

  /** Rewrite the append-only ledger directory into ONE file once it
    * accretes more than `maxFragments` part-files: every allocation reads
    * max(batch_id) over the whole directory, so an unbounded fragment
    * count slowly turns an O(1) footer-stats read into an O(runs) file
    * listing + open storm. Compaction keeps the allocation read bounded
    * regardless of how many batches have ever run. Single-driver ledger
    * (class contract), so the rewrite cannot race an allocator; the
    * temp-write → delete → rename sequence leaves a `__compact_tmp` copy
    * that [[recoverCompaction]] (run before every allocation and read)
    * renames back if the driver dies mid-swap.
    */
  private def compactIfNeeded(): Unit = if (fragmentCount > maxFragments) {
    val tmp = tmpPath
    existing.foreach { df =>
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.delete(hadoopPath, true)
      if (!fs.rename(tmp, hadoopPath))
        throw new java.io.IOException(
          s"ledger compaction rename failed: $tmp -> $ledgerPath")
    }
  }

  /** Allocate the next batch id and durably record the run row. */
  def newBatch(pipelineName: String, dateFrom: String, dateTo: String,
               comment: String): Long = {
    recoverCompaction()
    compactIfNeeded()
    val nextId: Long = existing
      .flatMap(df => Option(df.agg(max("batch_id")).first().get(0)))
      .map(_.asInstanceOf[Long] + 1L).getOrElse(1L)
    import spark.implicits._
    Seq((nextId, pipelineName, dateFrom, dateTo, comment))
      .toDF("batch_id", "pipeline_name", "date_from", "date_to", "comment")
      .write.mode(SaveMode.Append).parquet(ledgerPath)
    nextId
  }

  def history: DataFrame = {
    recoverCompaction()
    existing.getOrElse(spark.emptyDataFrame)
  }
}

object BatchLedger {
  /** O6 — stamp a batch id onto every row of a stage output
    * (reference: data["batch_id"] = batch_id,
    * diagnostic_group_pipeline_with_api.py:132).
    */
  def stamp(df: DataFrame, batchId: Long): DataFrame =
    df.withColumn("batch_id", lit(batchId))
}
