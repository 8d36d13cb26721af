package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, struct, sum, xxhash64}
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

/** Benchmark main. Harness-survival + honest-measurement design (the two
  * round-9 lessons):
  *
  *   - STREAMING OUTPUT: after every query completion the COMPLETE
  *     record-so-far is printed as one JSON line (same shape as the final
  *     line, `"partial":true`). A run killed at the stage budget still
  *     leaves its last line as a usable, self-consistent record — the
  *     round-9 bench was killed at 3600 s and recorded nothing.
  *   - WATCHDOG: each (query, pass) runs under a 60 s future; on timeout
  *     the job group is cancelled, the query records -1 and its remaining
  *     passes are skipped, so one runaway query costs ≤60 s, not the stage.
  *   - CHECKSUM ACTION, not count(): Catalyst prunes every unreferenced
  *     column under count(), so a pure scan-projection query measured ~0
  *     no matter how expensive its expressions were (ta_gopher_rep: 0.1 s
  *     in bench vs 231 s in verify at r9). `sum(xxhash64(struct(*)))`
  *     forces every output column to be computed, stays inside codegen,
  *     and adds only a cheap hash per row. Queries whose output types
  *     can't hash fall back to count() (rare; noted per query).
  */
object Bench {
  // generous vs the worst steady-state query at sf0.1 (~23 s pre-codegen)
  // so no legitimate query is clipped into the failed list, tight vs the
  // 3600 s stage budget (304 queries x 2 passes can afford ~5 s mean;
  // a single runaway forfeits <=120 s, not the stage)
  private val QueryTimeout = 120.seconds

  /** Force full evaluation of every output column. Map-typed columns hash
    * only under the legacy flag (set below); anything else unhashable
    * falls back to count() so the query is still timed, just weaker. */
  private def touchAll(df: DataFrame): Unit = {
    try df.agg(sum(xxhash64(struct(df.columns.map(col): _*)))).collect()
    catch { case _: org.apache.spark.sql.AnalysisException => df.count() }
    ()
  }

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
      // checksum action hashes whole rows; several queries emit map columns
      .config("spark.sql.legacy.allowHashOnMapType", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val names = SparkEntry.queries.keys.toSeq
    val timedOut = collection.mutable.Set.empty[String]

    // warmup: run every query once at the smallest scale factor so the
    // measured pass times steady-state execution, not first-run codegen
    // compilation and JIT (cold-vs-warm was up to 10x on the sketch ops)
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      sc.setJobGroup(s"warm:$name", name, interruptOnCancel = true)
      try Await.result(Future { touchAll(fn(spark, warmDir)) }, QueryTimeout)
      catch {
        case _: concurrent.TimeoutException => sc.cancelJobGroup(s"warm:$name")
        case _: Throwable => ()
      }
      finally { sc.clearJobGroup(); graft.core.Caches.releaseAll() }
    }
    // drop warmup-scale cached relations + let the heap settle, so the
    // timed pass doesn't inherit GC pressure from warmup
    spark.catalog.clearCache()
    System.gc()

    // two timed passes (was three: trimmed to fit the 3600 s stage budget
    // at 304+ queries). Per query we report the BEST pass (steady-state
    // plan quality, immune to a GC pause landing on one pass); headline is
    // the MEDIAN of per-pass totals over queries that succeeded in every
    // pass, so round-over-round deltas compare a consistent set.
    val nPasses = 2
    // the driver kills the whole stage at 3600 s; pass 2 is a precision
    // refinement (best-of-2), never worth risking the record for. If
    // JVM-start → end-of-pass-1 (so sbt/compile/warmup all count, as they
    // do against the driver's clock) already spent more than budgetCutoff
    // of the stage, the single-pass record stands.
    def elapsedS: Double =
      (System.currentTimeMillis() -
        java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime) / 1e3
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "3600").toDouble
    val budgetCutoff = 0.40
    // passTimes(pass)(name) = seconds, -1 on failure/timeout
    val passTimes = Array.fill(nPasses)(collection.mutable.LinkedHashMap.empty[String, Double])
    def emit(partial: Boolean): Unit = {
      val done = names.filter(n => passTimes.exists(_.contains(n)))
      val best = done.map { n =>
        val ok = passTimes.flatMap(_.get(n)).filter(_ >= 0)
        n -> (if (ok.isEmpty) -1.0 else ok.min)
      }
      val qs = best.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
        .mkString("{", ",", "}")
      val failed = best.collect { case (k, v) if v < 0 => k }.sorted
      val bestTotal = best.collect { case (_, v) if v >= 0 => v }.sum
      // per-pass sums restricted to queries that succeeded in EVERY pass
      // that has started, so all per-pass totals compare the same set
      val started = passTimes.filter(_.nonEmpty)
      val inAll = done.filter(n => started.forall(_.get(n).exists(_ >= 0))).toSet
      val totals = started.map(p => p.collect { case (k, v) if inAll(k) => v }.sum)
      val median =
        if (totals.isEmpty) 0.0 else totals.sorted.apply(totals.length / 2)
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val passTotalsJson = totals.zipWithIndex
        .map { case (t, i) => f""""pass${i + 1}_total":$t%.4f""" }.mkString(",")
      println(
        f"""{"metric":"median_pass_total","value":$median%.4f,"unit":"sec","queries":$qs,"runs":$nPasses,""" +
        f""""best_total":$bestTotal%.4f,$passTotalsJson,""" +
        s""""failed":$failedJson,"n_failed":${failed.size},"n_done":${done.size},""" +
        s""""partial":$partial,"sf":"$sfDir"}""")
    }

    for (p <- 0 until nPasses
         if p == 0 || elapsedS < budgetS * budgetCutoff) {
      SparkEntry.queries.foreach { case (name, fn) =>
        if (timedOut(name)) passTimes(p)(name) = -1.0
        else {
          sc.setJobGroup(name, name, interruptOnCancel = true)
          val t0 = System.nanoTime()
          val dt =
            try { Await.result(Future { touchAll(fn(spark, sfDir)) }, QueryTimeout)
                  (System.nanoTime() - t0) / 1e9 }
            catch {
              case _: concurrent.TimeoutException =>
                sc.cancelJobGroup(name); timedOut += name; -1.0
              case _: Throwable => -1.0
            }
          sc.clearJobGroup()
          graft.core.Caches.releaseAll() // outside the timed span: harness cost
          passTimes(p)(name) = dt
          emit(partial = true)
        }
      }
    }
    emit(partial = false)
    spark.stop()
  }
}
