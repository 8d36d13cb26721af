package graft.core

/** O4 — typed, validated run parameters (SURVEY.md §2.8; reference: Airflow
  * `Param(type=..., enum=..., default=...)` blocks,
  * diagnostic_group_pipeline_with_api.py:328-349, dx_group.py:273-285).
  *
  * The Airflow param surface becomes a plain case class with the same
  * defaults; enum params become sealed traits so invalid values fail at
  * compile time instead of DAG-trigger time.
  */
object Config {

  /** Validated long conf read: a malformed value fails LOUDLY with the
    * key name, instead of a bare NumberFormatException from somewhere
    * inside an operator (the ADVICE r15/r16 `toLong` scale-risk).
    */
  def confLong(spark: org.apache.spark.sql.SparkSession,
               key: String, default: Long): Long =
    spark.conf.getOption(key).map { v =>
      try v.trim.toLong
      catch {
        case e: NumberFormatException => throw new IllegalArgumentException(
          s"conf $key must be a whole number, got '$v'", e)
      }
    }.getOrElse(default)

  sealed trait DbType { def name: String }
  case object Postgres extends DbType { val name = "postgres" }
  case object SqlServer extends DbType { val name = "sql-server" }

  final case class DbConfig(
      dbType: DbType = Postgres,
      server: String = "localhost",
      database: String = "registry",
      username: String = "airflow",
      port: Int = 5432)

  /** Mirrors the DX-group pipeline's param block (api url/token, date
    * window, model coordinates, output tables). Dates carried as yyyyMMdd
    * strings at the surface, as in the reference.
    */
  final case class PipelineConfig(
      pipelineName: String = "DX_Group_classification",
      dateFrom: String = "20220101",
      dateTo: String = "20230101",
      modelName: String = "pathologyBERT",
      modelVersion: String = "1",
      tokenizerPath: String = "tokenizer",
      maxLength: Int = 512,
      numLabels: Int = 16,
      batchSize: Int = 64,
      cleanedTable: String = "cleaned_data",
      prepedTable: String = "preped_data",
      predictionTable: String = "prediction_table",
      outputPath: String = "/tmp/graft_out",
      db: DbConfig = DbConfig())
}
