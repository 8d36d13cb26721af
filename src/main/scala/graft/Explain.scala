package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted physical plan + two timed runs for the
  * given query names (all queries if none given). Usage:
  *   sbt "runMain graft.Explain [sfDir] [name ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // same A/B toggle Bench exposes: "auto" (default) lets the
      // per-query FanoutHints list decide; "true"/"false" force it
      .config("graft.scan.fanout",
        sys.env.getOrElse("SPARK_GRAFT_SCAN_FANOUT", "auto"))
      .config(graft.core.CachedPlanAqe.ModeKey,
        sys.env.getOrElse("SPARK_GRAFT_CACHED_PLAN_AQE", "auto"))
      .config(graft.core.CachedPlanAqe.SparkKey,
        (sys.env.get("SPARK_GRAFT_CACHED_PLAN_AQE").contains("true")).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n================ $name ================")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[$name] run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $n rows")
      }
    }
    spark.stop()
  }
}
