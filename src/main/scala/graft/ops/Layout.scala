package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Data-layout operators — the write-side half of 100 TB performance.
  * Scans can only prune what the layout exposes: directory partitions
  * ([[Sinks.parquetPartitioned]]), bucket files ([[Sinks.bucketedTable]]),
  * and row-group min/max ranges (here). This module owns the two layout
  * chores every lake pipeline runs on a schedule: small-file compaction
  * and range-sorted rewrites.
  */
object Layout {

  /** Total on-disk bytes of a path (driver-side file listing — metadata
    * only, no data read).
    */
  def sizeOnDisk(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(bytes / targetFileBytes) files. Every streaming / per-batch
    * append pipeline accretes kilobyte files whose per-file open cost
    * eventually dwarfs the read itself; compaction is the scheduled fix.
    * Sizing comes from the actual on-disk listing (not table stats, which
    * may be stale or absent), and the rewrite is one round-robin shuffle.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetFileBytes: Long = 128L << 20): Unit = {
    require(inPath != outPath, "compaction cannot overwrite its own input")
    val bytes = sizeOnDisk(spark, inPath)
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
  }

  /** Range-sorted rewrite: range-partition on `sortCols` then sort within
    * each partition, so every output file covers a DISJOINT key range and
    * each row group's parquet min/max statistics actually prune (a
    * hash-partitioned write leaves every file spanning the whole key
    * domain — min/max stats then prune nothing). The scheduled rewrite
    * behind "order by time/id at rest" — what keeps point and range
    * queries from scanning the whole table.
    */
  def sortedParquet(df: DataFrame, path: String, numFiles: Int,
                    sortCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Morton (Z-order) value of two numeric columns: each input is
    * min/max-normalized to a `bits`-bit integer rank, and the two bit
    * strings are interleaved (x in the odd positions). Built entirely
    * from shift/mask built-ins — codegen'd, no UDF.
    *
    * min/max come from one eager aggregate over `df` (metadata-cheap
    * relative to the rewrite that follows; at 100 TB the same numbers
    * come from table stats).
    */
  def zValue(df: DataFrame, xCol: String, yCol: String, bits: Int = 16)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 31, "bits must be in 1..31")
    val r = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    val maxRank = (1L << bits) - 1
    def rank(c: String, lo: Double, hi: Double) = {
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(floor((col(c).cast("double") - lit(lo)) / lit(span)
        * lit(maxRank + 1)), lit(0L)), lit(maxRank)).cast("long")
    }
    val (xr, yr) = (rank(xCol, r.getDouble(0), r.getDouble(1)),
      rank(yCol, r.getDouble(2), r.getDouble(3)))
    (0 until bits).map { b =>
      shiftleft(shiftright(xr, b) % 2, 2 * b + 1) +
        shiftleft(shiftright(yr, b) % 2, 2 * b)
    }.reduce(_ + _)
  }

  /** Z-ORDERED rewrite: cluster rows along the Morton curve of TWO
    * columns, so every output file covers a small rectangle of the
    * (x, y) domain and parquet min/max statistics prune on EITHER
    * filter column. A plain sort on x leaves every file spanning the
    * whole y domain (y-filters prune nothing); the space-filling curve
    * is the standard lake fix for two-dimensional access patterns
    * (time × tenant, date × region). Same shuffle shape as
    * [[sortedParquet]] — one range exchange on the z-value.
    */
  def zOrderedParquet(df: DataFrame, path: String, numFiles: Int,
                      xCol: String, yCol: String, bits: Int = 16): Unit = {
    import org.apache.spark.sql.functions.col
    val z = zValue(df, xCol, yCol, bits)
    df.withColumn("__graft_z", z)
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
