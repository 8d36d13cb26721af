package graft.core

import org.apache.spark.SparkContext
import java.util.concurrent.{Callable, ExecutionException, Executors, TimeUnit, TimeoutException}

/** Per-query watchdog shared by the Verify and Bench harness mains.
  *
  * The round-10 lesson: Spark job-group membership is a LOCAL PROPERTY,
  * and local properties propagate to child threads as an
  * InheritableThreadLocal snapshot taken at THREAD CREATION. Setting the
  * group on the main thread and running the action inside a
  * `Future { ... }` on a pooled global-ExecutionContext worker therefore
  * tags nothing: the pooled worker inherited whatever the main thread's
  * properties were when the POOL spawned it, so `cancelJobGroup` after a
  * timeout cancelled nothing, the runaway query kept eating the stage
  * budget, and each leaked blocked Future permanently pinned one of the
  * ~CPUs pool threads until later waits starved and falsely timed out.
  *
  * Fix, both halves:
  *   - the job group is set INSIDE the worker (the thread that triggers
  *     the Spark actions), so submitted jobs really carry the group and
  *     `cancelJobGroup(interruptOnCancel = true)` really kills them;
  *   - every query gets a FRESH single-use daemon thread, so a leaked
  *     (timed-out, still-unwinding) worker can never starve a shared
  *     pool or block JVM exit.
  */
object Watchdog {

  /** Group ids are UNIQUE per invocation: the timeout path poisons the
    * group with `cancelJobGroupAndFutureJobs`, which has no un-cancel —
    * a reused bare name (Bench runs each query once per warmup and once
    * per timed pass, all under the query's name) would silently reject
    * every later pass's jobs for that query.
    */
  private val groupSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Run `body` on a fresh daemon thread under a fresh job group with a
    * hard timeout. Returns None on success, Some(reason) on timeout or
    * failure. On timeout the group is cancelled (interrupting its
    * running tasks AND rejecting any job the unwinding worker submits
    * afterwards) and the worker thread is interrupted and abandoned.
    */
  def run(sc: SparkContext, name: String, timeoutS: Long)
         (body: => Unit): Option[String] = {
    val group = s"$name#${groupSeq.incrementAndGet()}"
    val ex = Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, s"graft-wd-$name")
      t.setDaemon(true)
      t
    }
    val fut = ex.submit(new Callable[Unit] {
      def call(): Unit = {
        sc.setJobGroup(group, name, interruptOnCancel = true)
        try body finally sc.clearJobGroup()
      }
    })
    // cancelJobGroupAndFutureJobs, not cancelJobGroup: the plain cancel
    // only kills jobs ACTIVE at call time, and a worker that swallows
    // the interrupt (Spark wraps InterruptedException inside
    // SparkException on several action paths) can submit a NEW job
    // after the cancel, which then runs under later queries' clocks —
    // the round-10 failure mode in miniature. The AndFutureJobs variant
    // also rejects anything submitted under this group after the call;
    // the group id is single-use, so the poisoning can never leak into
    // a later run of the same query.
    try { fut.get(timeoutS, TimeUnit.SECONDS); None }
    catch {
      case _: TimeoutException =>
        sc.cancelJobGroupAndFutureJobs(group)
        fut.cancel(true)
        Some(s"TIMEOUT after ${timeoutS}s")
      case e: ExecutionException =>
        val c = Option(e.getCause).getOrElse(e)
        Some(s"${c.getClass.getSimpleName}: ${Option(c.getMessage).getOrElse("").take(200)}")
      case e: Throwable =>
        // e.g. the WAITER thread interrupted: make sure the query's jobs
        // don't outlive the wait either way
        fut.cancel(true)
        sc.cancelJobGroupAndFutureJobs(group)
        Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
    } finally ex.shutdown()
  }
}
