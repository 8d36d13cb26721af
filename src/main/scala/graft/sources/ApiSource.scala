package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** S5 — REST API source (SURVEY.md §2.1; reference:
  * `get_messages(api_url, date_from, date_to, api_token)` →
  * `pd.DataFrame.from_records(data)`,
  * diagnostic_group_pipeline_with_api.py:102-103).
  *
  * Transport is pluggable (tests inject a fake; production plugs an HTTP
  * client). Two shapes:
  *  - [[fetch]]: one driver-side call for a single date window — the
  *    reference's exact behavior;
  *  - [[fetchPartitioned]]: the scale path — the date range splits into
  *    per-day windows fetched IN PARALLEL on executors via a range RDD,
  *    so ingest bandwidth scales with the cluster, not the driver.
  *
  * The full connector form of the scale path is [[ApiDataSource]]
  * (`spark.read.format("graft-api")`): same per-day executor-side fetch,
  * plus DataSourceV2 filter-pushdown window planning and column pruning.
  */
object ApiSource {

  /** (url, dateFrom, dateTo, token) => rows */
  type Transport = (String, String, String, String) => Seq[Row]

  def fetch(spark: SparkSession, schema: StructType, apiUrl: String,
            dateFrom: String, dateTo: String, token: String)
           (transport: Transport): DataFrame = {
    val rows = transport(apiUrl, dateFrom, dateTo, token)
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema)
  }

  def fetchPartitioned(spark: SparkSession, schema: StructType, apiUrl: String,
                       windows: Seq[(String, String)], token: String,
                       parallelism: Int = 32)
                      (transport: Transport): DataFrame = {
    val rdd = spark.sparkContext
      .parallelize(windows, math.min(parallelism, windows.size))
      .flatMap { case (from, to) => transport(apiUrl, from, to, token) }
    spark.createDataFrame(rdd, schema)
  }
}
