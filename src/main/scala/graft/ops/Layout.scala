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
}
