package graft.ops

import org.apache.hadoop.fs.Path
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
                    bucketCols: Seq[String]): Unit = {
    val s = df.sparkSession
    // true overwrite across SESSIONS, not just within one: the default
    // in-memory catalog forgets the table on JVM exit but its managed
    // location survives on disk, and saveAsTable then refuses to create
    // over the orphaned directory (LOCATION_ALREADY_EXISTS) — drop the
    // catalog entry AND remove a stale location first
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new Path(s.conf.get("spark.sql.warehouse.dir"))
    val loc = new Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** JSON-lines sink (one object per line, partition-parallel) — the
    * export format downstream tokenizer/training jobs consume.
    */
  def jsonLines(df: DataFrame, path: String,
                options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    options.foreach { case (k, v) => w.option(k, v) }
    w.json(path)
  }

  /** ORC sink — columnar alternative to parquet where the surrounding
    * ecosystem (Hive/Trino) prefers it.
    */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

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

  /** Exactly-once streaming JDBC sink (the `foreachBatch` pattern),
    * STAGING-TABLE edition.
    *
    * Structured Streaming's foreachBatch gives at-least-once delivery:
    * after a crash the same (batchId, data) can be replayed. Idempotence
    * is the sink's job. The naive recipe (ledger row, then data append)
    * has a fatal window — a crash between the two drops the batch while
    * marking it done. This implementation closes it:
    *
    *  1. PROBE   — one driver-side point query on the ledger; a replayed
    *               batchId returns false immediately (stale staging from
    *               a crash-after-publish is dropped best-effort).
    *  2. STAGE   — the batch writes partition-parallel into a per-batch
    *               staging table `<data>_stg_<id>` with Overwrite
    *               semantics, so a half-written table from a previous
    *               crashed attempt is simply replaced on retry.
    *  3. PUBLISH — INSERT..SELECT from staging into the data table AND
    *               the ledger row commit in ONE driver-side transaction:
    *               the batch becomes visible exactly when it is recorded,
    *               atomically. A crash anywhere before the commit leaves
    *               no ledger row and no published rows — the replay
    *               restages and publishes; a crash after the commit leaves
    *               both — the replay skips.
    *  4. CLEAN   — drop the staging table (outside the transaction;
    *               best-effort, a leftover is inert and reaped on replay).
    *
    * Wire it as:
    *
    *   stream.writeStream.foreachBatch { (df, id) =>
    *     Sinks.idempotentBatchAppend(df, id, url, "events_out", "events")
    *   }
    *
    * Dialect assumptions: table existence is probed case-insensitively
    * (exact/UPPER/lower forms, covering H2/Derby's upper-folding and
    * Postgres' lower-folding), and first-batch table creation uses
    * `CREATE TABLE .. AS SELECT .. WITH NO DATA` — standard SQL:2008,
    * supported by Postgres/H2; on engines without it (SQL Server's
    * `SELECT .. INTO`), pre-create the data table once.
    *
    * @param beforePublish fault-injection seam (tests crash here — after
    *                      staging, before the atomic publish — to prove
    *                      the replay still ends exactly-once)
    * @return true if the batch was published, false if it was a replay
    */
  /** The identifier list the publish statements share with Spark's JDBC
    * writer: double-quoted, case-preserved — valid SQL on both registry
    * target engines (Postgres always; SQL Server under its default
    * `QUOTED_IDENTIFIER ON`). Exposed for the dialect specs.
    */
  private[graft] def quotedCols(
      schema: org.apache.spark.sql.types.StructType): String =
    schema.fieldNames.map("\"" + _ + "\"").mkString(", ")

  def idempotentBatchAppend(df: org.apache.spark.sql.DataFrame, batchId: Long,
                            url: String, ledgerTable: String, dataTable: String,
                            props: java.util.Properties = new java.util.Properties,
                            options: Map[String, String] = Map.empty,
                            beforePublish: () => Unit = () => ()): Boolean = {
    val staging = s"${dataTable}_stg_$batchId"

    // Case-insensitive existence probe: engines fold unquoted identifiers
    // differently (H2/Derby → UPPER, Postgres → lower), and a probe that
    // always misses would re-attempt CTAS on batch 2 and never reap
    // staging residue. Try the exact, upper, and lower forms.
    // getTables treats the name as a LIKE pattern (_/% are wildcards) and
    // staging names always contain underscores, so escape metacharacters
    // with the driver's escape string or "events_out" would match a
    // pre-existing "eventsXout" and skip first-batch CTAS.
    def tableExists(conn: java.sql.Connection, name: String): Boolean = {
      val esc = conn.getMetaData.getSearchStringEscape
      def quote(n: String): String =
        if (esc == null || esc.isEmpty) n
        else n.flatMap(c =>
          if (c == '_' || c == '%' || esc.contains(c)) s"$esc$c" else c.toString)
      Seq(name, name.toUpperCase, name.toLowerCase).distinct.exists(n =>
        conn.getMetaData.getTables(null, null, quote(n), null).next())
    }
    def dropIfExists(conn: java.sql.Connection, name: String): Unit =
      if (tableExists(conn, name))
        conn.createStatement().executeUpdate(s"DROP TABLE $name")

    // 1. PROBE
    val probe = java.sql.DriverManager.getConnection(url, props)
    val replay = try {
      if (!tableExists(probe, ledgerTable)) {
        probe.createStatement().executeUpdate(
          s"CREATE TABLE $ledgerTable (batch_id BIGINT PRIMARY KEY)")
      }
      val seen = probe.prepareStatement(
        s"SELECT 1 FROM $ledgerTable WHERE batch_id = ?")
      seen.setLong(1, batchId)
      val isReplay = seen.executeQuery().next()
      if (isReplay) dropIfExists(probe, staging) // reap crash-after-publish residue
      isReplay
    } finally probe.close()
    if (replay) return false

    // 2. STAGE (partition-parallel; Overwrite replaces any half-written
    // staging table from a previous crashed attempt)
    val w = df.write.mode(SaveMode.Overwrite)
    options.foreach { case (k, v) => w.option(k, v) }
    w.jdbc(url, staging, props)

    beforePublish()

    // 3. PUBLISH (one transaction: data copy + ledger row). Column names
    // are double-quoted to match the identifiers Spark's JDBC writer
    // creates (quoted, case-preserved).
    val cols = quotedCols(df.schema)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      if (!tableExists(conn, dataTable)) {
        conn.createStatement().executeUpdate(
          s"CREATE TABLE $dataTable AS SELECT * FROM $staging WITH NO DATA")
      }
      conn.createStatement().executeUpdate(
        s"INSERT INTO $dataTable ($cols) SELECT $cols FROM $staging")
      val ins = conn.prepareStatement(
        s"INSERT INTO $ledgerTable (batch_id) VALUES (?)")
      ins.setLong(1, batchId)
      ins.executeUpdate()
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()

    // 4. CLEAN (best-effort)
    val clean = java.sql.DriverManager.getConnection(url, props)
    try dropIfExists(clean, staging)
    catch { case _: java.sql.SQLException => () } // inert leftover, reaped on replay
    finally clean.close()
    true
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
