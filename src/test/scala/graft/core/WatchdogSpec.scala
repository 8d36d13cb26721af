package graft.core

import graft.SparkSpec

/** The Verify/Bench watchdog is harness-critical: rounds 9 and 10 lost
  * their official evidence to watchdog bugs (a kill that cancelled
  * nothing, then leaked pool threads). These specs pin the contract.
  */
class WatchdogSpec extends SparkSpec {

  test("success path returns None and the body's result is visible") {
    @volatile var ran = false
    val r = Watchdog.run(spark.sparkContext, "wd-ok", timeoutS = 60) {
      ran = spark.range(1000).count() == 1000L
    }
    assert(r.isEmpty && ran)
  }

  test("failure path returns the cause, not a wrapped executor exception") {
    val r = Watchdog.run(spark.sparkContext, "wd-fail", timeoutS = 60) {
      throw new IllegalStateException("boom-" + "xyz")
    }
    assert(r.exists(m => m.contains("IllegalStateException") &&
      m.contains("boom-xyz")), r.toString)
  }

  test("timeout cancels the RUNNING Spark job (group set on the acting thread)") {
    val sc = spark.sparkContext
    // a job that would run ~forever without cancellation: each task
    // sleeps far longer than the watchdog timeout
    val t0 = System.nanoTime()
    val r = Watchdog.run(sc, "wd-slow", timeoutS = 2) {
      sc.parallelize(1 to 8, 8).map { i =>
        Thread.sleep(120000); i
      }.count()
      ()
    }
    val waitedS = (System.nanoTime() - t0) / 1e9
    assert(r.exists(_.startsWith("TIMEOUT")), r.toString)
    // the watchdog returned at its deadline, not after the 120 s sleeps
    assert(waitedS < 30, f"watchdog blocked $waitedS%.1f s")
    // and the group's jobs die: within a grace period no active job
    // remains (cancelJobGroup(interruptOnCancel) interrupts the sleeps;
    // round 10's bug left the job running under later queries' clocks)
    val tracker = sc.statusTracker
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var active = tracker.getActiveJobIds()
    while (active.nonEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200)
      active = tracker.getActiveJobIds()
    }
    assert(active.isEmpty, s"jobs still running after cancel: ${active.mkString(",")}")
  }

  test("a worker that swallows the interrupt cannot submit new jobs after the cancel") {
    val sc = spark.sparkContext
    // round-10 failure mode in miniature: the body catches EVERYTHING
    // (Spark wraps the task interrupt inside SparkException on several
    // action paths) and then submits a fresh job. With plain
    // cancelJobGroup that job would run to completion under later
    // queries' clocks; cancelJobGroupAndFutureJobs must reject it.
    @volatile var secondJobRan = false
    val r = Watchdog.run(sc, "wd-swallow", timeoutS = 2) {
      try sc.parallelize(1 to 8, 8).map { i => Thread.sleep(120000); i }.count()
      catch { case _: Throwable => () } // swallow the interrupt
      // without the interrupt flag the sleep-free job would finish in ms
      sc.parallelize(1 to 4, 4).count()
      secondJobRan = true
    }
    assert(r.exists(_.startsWith("TIMEOUT")), r.toString)
    Thread.sleep(3000) // grace: let the unwinding worker try its submit
    assert(!secondJobRan,
      "a job submitted after the cancel ran under a poisoned group")
  }

  test("the poisoned group never leaks into a later run under the same name") {
    val sc = spark.sparkContext
    // Bench reuses each query's NAME across warmup + 2 timed passes;
    // cancelJobGroupAndFutureJobs has no un-cancel, so the group id
    // must be single-use or pass 2 of a once-timed-out query would be
    // rejected forever.
    val r1 = Watchdog.run(sc, "wd-reuse", timeoutS = 1) { Thread.sleep(60000) }
    assert(r1.exists(_.startsWith("TIMEOUT")), r1.toString)
    val r2 = Watchdog.run(sc, "wd-reuse", timeoutS = 60) {
      assert(spark.range(10).count() == 10L)
    }
    assert(r2.isEmpty, r2.toString)
  }

  test("a timed-out worker does not starve later runs (fresh thread per query)") {
    val sc = spark.sparkContext
    // round-10 failure mode: leaked blocked futures pinned the shared
    // pool until later Await calls falsely timed out. With a fresh
    // daemon thread per run, many timeouts in a row must not affect a
    // subsequent healthy run.
    (1 to 4).foreach { i =>
      Watchdog.run(sc, s"wd-leak-$i", timeoutS = 1) { Thread.sleep(60000) }
    }
    val r = Watchdog.run(sc, "wd-after", timeoutS = 60) {
      assert(spark.range(10).count() == 10L)
    }
    assert(r.isEmpty, r.toString)
  }
}
