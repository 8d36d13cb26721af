package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table readers (see /root/repo/TESTDATA.md, FIXTURES.md §A).
  *
  * All reads are plain `spark.read.parquet` so Catalyst keeps full pushdown
  * freedom (column pruning + predicate pushdown reach the parquet scan).
  * The reference system materialized every inter-stage table in Postgres
  * (reference: diagnostic_group_pipeline_with_api.py:142,219) — here a table
  * is just a lazily-planned scan and stages compose as DataFrame lineage.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    fanout(spark, spark.read.parquet(s"$sfDir/$name.parquet"),
      s"$sfDir/$name.parquet")

  /** Scan-parallelism floor for LOW-SPLIT inputs (optimization guide
    * §2.2/§6): parquet parallelism is bounded by file splits (and,
    * within a file, by row groups — a single-row-group file is ONE
    * task no matter what `maxPartitionBytes` says). When the planned
    * split count is below the cluster's core count, every
    * scan-adjacent stage — shingling, regex chains, hashing, Expand,
    * the partial aggregate feeding the first exchange — runs on a
    * fraction of the machine. One round-robin exchange of the
    * (pruned, filtered) scan output buys full-width map stages.
    *
    * The exchange is NOT free: every non-CPU-bound query just pays a
    * local sort (`sortBeforeRepartition`, guide §2.5) plus a full
    * write/read of the table for nothing. The r16 A/B over all 315
    * queries (bench_results/r16_baseline.json vs r16_fanout.json)
    * measured default-ON as a 1.20x geomean pessimization (179/314
    * regressed >10%) with ~48 large wins confined to CPU-heavy
    * scan-adjacent work (shingling/regex/vector math). So the rewrite
    * is OPT-IN per query:
    *
    *   - `graft.scan.fanout=auto` (default): fires only when the
    *     calling query requested it (FanoutHint.requested — set by
    *     SparkEntry for the measured winner queries).
    *   - `=true` forces it for every read (A/B benchmarking aid);
    *   - `=false` is the kill switch (beats any request).
    *
    * Scale-adaptive by construction, not a local-mode constant: the
    * trigger replicates Spark's own split sizing —
    * `maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    * bytes/defaultParallelism))` (FilePartition.maxSplitBytes) — so a
    * real corpus (thousands of splits at 100 TB) takes the zero-cost
    * branch and the exchange never happens, and a mid-size table Spark
    * already splits core-count-wide is left alone (the r16 ADVICE
    * finding: the old `bytes/maxPartitionBytes` estimate ignored the
    * bytes-per-core widening and would have exchanged a 512 MB table
    * Spark had already split 32 ways). Filters and column pruning
    * still reach the parquet scan — Catalyst pushes both through a
    * Repartition — and the round-robin assignment is deterministic
    * (sort-before-repartition, fixed input split order), so table
    * CONTENTS are identical (row order changes; every declared query
    * is order-insensitive or totally ordered, which the oracle pins).
    * The floor `graft.scan.fanout.minBytes` (default 256 KiB) keeps
    * broadcast-dim lookups and sub-fixture-scale inputs exchange-free.
    */
  private def fanout(spark: SparkSession, df: DataFrame,
                     path: String): DataFrame = {
    val on = spark.conf.get("graft.scan.fanout", "auto") match {
      case "false" => false
      case "true"  => true
      case _       => FanoutHint.requested
    }
    if (!on) return df
    val minBytes =
      spark.conf.get("graft.scan.fanout.minBytes", "262144").toLong
    // graft.scan.fanout.parts > 0 caps the fan-out width below the core
    // count — the exchange-read fan and the per-stage task count both
    // scale with it, so narrower can win when per-row work is modest
    val partsCap = spark.conf.get("graft.scan.fanout.parts", "0").toInt
    val target =
      if (partsCap > 0) math.min(partsCap, spark.sparkContext.defaultParallelism)
      else spark.sparkContext.defaultParallelism
    val bytes =
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      } catch { case _: Exception => return df }
    if (bytes < minBytes) return df
    // Spark's effective split size (FilePartition.maxSplitBytes): small
    // inputs are split FINER than maxPartitionBytes (down to openCost)
    // so they already approach core-count splits; estimate with the
    // same formula or the trigger fires on tables that are not narrow.
    val conf = spark.sessionState.conf
    val bytesPerCore = bytes / math.max(1, spark.sparkContext.defaultParallelism)
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(conf.filesOpenCostInBytes, bytesPerCore))
    val splits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    if (splits >= target) df else df.repartition(target)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The events fixture's `ts` physical type has varied across driver
    * data generations: parquet TIMESTAMP(NANOS) (readable only as a
    * nanosecond long under `spark.sql.legacy.parquet.nanosAsLong=true`,
    * set by Verify/Bench sessions) and timezone-naive TIMESTAMP(MICROS)
    * (which Spark reads as TIMESTAMP_NTZ — a type `unix_micros`,
    * watermarks and streaming event time all reject). Normalize both to
    * the session-zone TIMESTAMP. Every session pins
    * `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast preserves the
    * stored microsecond values exactly — the same instants DuckDB sees
    * reading the naive column.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))

  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case Some(f) if f.dataType == org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** CSV source with the reference's quirks: header, latin-1 encoding and
    * empty-string-as-null (reference: dx_group.py:93, mvp_pipe.py:44 —
    * `pd.read_csv(..., encoding='latin-1', na_values="")`). Schema is
    * caller-supplied so the scan never pays an inference pass at scale.
    */
  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "ISO-8859-1")
      .option("nullValue", "")
      .schema(schema)
      .csv(path)

  /** JSON-lines source (one JSON object per line — the interchange format
    * of scraped/crawled corpora). Schema is caller-supplied: schema
    * inference reads the whole dataset once before the real scan, which
    * is a full extra pass at 100 TB.
    */
  def jsonLines(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType,
                options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.schema(schema)
    options.foreach { case (k, v) => r.option(k, v) }
    r.json(path)
  }

  /** ORC source — the other columnar lake format (same pushdown/pruning
    * properties as parquet: predicates and projections reach the scan).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JDBC source with projection + date-range predicate pushed down
    * (reference: Diagnostic_group_pipeline.py:76-78 `get_messages(...)` built
    * a SELECT/WHERE string by hand; Catalyst pushes the same projection and
    * filter through the JDBC scan for free). Not exercised by the parquet
    * fixtures — kept as the documented scale path for DB-backed deployments.
    */
  def jdbc(spark: SparkSession, url: String, dbtable: String,
           props: java.util.Properties = new java.util.Properties): DataFrame =
    spark.read.jdbc(url, dbtable, props)

  /** Connection URL for the reference's `input_db_type` enum
    * (Diagnostic_group_pipeline.py:138 `['sql-server','postgres']` with
    * separate server/name/port params): the two supported production
    * dialects map to their canonical JDBC URL prefixes, which is also
    * what routes Spark's dialect selection (`JdbcDialects.get`) — SQL
    * Server gets TOP-n pushdown and `"x"` identifier quoting, Postgres
    * gets LIMIT/OFFSET; JdbcDialectSpec pins both shapes. Loud failure
    * on an unknown type (the reference validated via Param enum).
    */
  def jdbcUrl(dbType: String, server: String, database: String,
              port: Option[Int] = None): String = {
    val p = port.map(":" + _).getOrElse("")
    dbType match {
      case "sql-server" => s"jdbc:sqlserver://$server$p;databaseName=$database"
      case "postgres"   => s"jdbc:postgresql://$server$p/$database"
      case other => throw new IllegalArgumentException(
        s"unknown input_db_type '$other' (expected 'sql-server' or 'postgres')")
    }
  }
}
