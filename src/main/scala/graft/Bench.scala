package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: run every query once at the smallest scale factor so the
    // measured pass times steady-state execution, not first-run codegen
    // compilation and JIT (cold-vs-warm was up to 10x on the sketch ops)
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, warmDir).count(); () } catch { case _: Throwable => () }
      finally graft.core.Caches.releaseAll()
    }
    // drop warmup-scale cached relations + let the heap settle, so the
    // timed pass doesn't inherit GC pressure from warmup
    spark.catalog.clearCache()
    System.gc()
    // three timed passes. Per query we report the BEST pass (steady-state
    // plan quality, immune to a GC pause / external load spike landing on
    // one pass); for the headline we report the MEDIAN of the per-pass
    // totals, so round-over-round deltas aren't dominated by ambient
    // machine noise (pass-to-pass totals swung 14% in round 3).
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.core.Caches.releaseAll() // outside the timed span: harness cost
      name -> (if (ok) dt else -1.0)
    }
    val passes = Seq(pass(), pass(), pass())
    val results = SparkEntry.queries.keys.map { k =>
      val ok = passes.map(_.getOrElse(k, -1.0)).filter(_ >= 0)
      k -> (if (ok.isEmpty) -1.0 else ok.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a query that failed every pass is REPORTED (failed list + count),
    // never summed — a -1 sentinel inside the headline total would
    // silently deflate it
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val bestTotal = results.values.filter(_ >= 0).sum
    // per-pass sums restricted to queries that succeeded in EVERY pass, so
    // all per-pass totals (and their median) compare the same query set
    val inAll = SparkEntry.queries.keys
      .filter(k => passes.forall(_.getOrElse(k, -1.0) >= 0)).toSet
    def passTotal(p: Map[String, Double]) =
      p.collect { case (k, v) if inAll(k) => v }.sum
    val totals = passes.map(passTotal)
    val median = totals.sorted.apply(totals.size / 2)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val passTotalsJson = totals.zipWithIndex
      .map { case (t, i) => s""""pass${i + 1}_total":$t""" }.mkString(",")
    println(s"""{"metric":"median_pass_total","value":$median,"unit":"sec","queries":$qs,"runs":3,""" +
      s""""best_total":$bestTotal,$passTotalsJson,""" +
      s""""failed":$failedJson,"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
