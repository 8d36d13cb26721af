package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink operators (SURVEY.md §2.2, K1-K4).
  *
  * The reference's sinks: JDBC bulk append (K1,
  * `conn.insert_data(df, table)`,
  * diagnostic_group_pipeline_with_api.py:142,227,305), single-row insert
  * with generated key (K2 — graft.core.BatchLedger), CSV file (K3,
  * `df.to_csv(path)`, mvp_pipe.py:33), and a REST upload of the final CSV
  * (K4, `save_data(api_url, output_path, api_token)`,
  * diagnostic_group_pipeline_with_api.py:316).
  */
object Sinks {

  /** K3 — CSV sink. `singleFile=true` mirrors the reference's one-file
    * `to_csv` surface (fine for final small outputs); leave false for
    * datasets — every partition writes in parallel.
    */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false,
          encoding: String = "UTF-8"): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("encoding", encoding).csv(path)
  }

  /** Parquet stage checkpoint — the lake-native replacement for the
    * reference's per-stage Postgres round-trips (optional: stages normally
    * compose lazily; checkpoint only to cut lineage or share outputs).
    */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partitionCols`. The 100 TB reader's best friend — any filter on the
    * partition columns prunes whole directories before a single row-group
    * is opened (dynamic partition pruning handles join-driven filters).
    */
  def parquetPartitioned(df: DataFrame, path: String,
                         partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table: rows are hash-bucketed on `bucketCols` at
    * write time, so joins/aggregations on those keys skip the shuffle
    * entirely (both sides read pre-partitioned). Requires saveAsTable —
    * bucket metadata lives in the catalog.
    */
  def bucketedTable(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** K1 — JDBC bulk append. Partition-parallel inserts; `batchsize` tunes
    * rows per round-trip. Untestable against the parquet fixtures (no live
    * DB) — the documented production seam.
    */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: java.util.Properties = new java.util.Properties,
                 batchsize: Int = 10000,
                 options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(SaveMode.Append)
      .option("batchsize", batchsize.toString)
    options.foreach { case (k, v) => w.option(k, v) }
    w.jdbc(url, table, props)
  }

  /** K4 — REST API sink. Transport is pluggable so the operator shape
    * (serialize partition → batched POST) is testable without a network;
    * at scale this runs per partition (`foreachPartition`), never through
    * the driver.
    */
  type Transport = (String, Seq[String]) => Unit // (url, payload lines) => ()

  def apiSink(df: DataFrame, apiUrl: String, batchSize: Int = 500)
             (transport: Transport): Unit = {
    df.toJSON.foreachPartition { (it: Iterator[String]) =>
      it.grouped(batchSize).foreach(batch => transport(apiUrl, batch.toSeq))
    }
  }
}
