package graft.core

import org.apache.spark.sql.SparkSession

/** One-stop SparkSession factory for library users: registers the graft
  * extensions (SQL `dot_product`, the as-of join planner strategy) and
  * pins the configs the fixture tables and oracle parity depend on —
  * UTC session time zone (epoch arithmetic matches DuckDB) and
  * nanos-as-long parquet reads (the events table carries
  * TIMESTAMP(NANOS), which Spark has no native type for; see
  * [[Tables.normalizeTs]]).
  *
  * `shufflePartitions` should track the executor core count at the
  * deployment scale (the 200 default over-partitions local runs and
  * under-partitions large clusters).
  */
object GraftSession {

  def create(master: String = "local[*]",
             shufflePartitions: Int = Runtime.getRuntime.availableProcessors,
             appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
}
