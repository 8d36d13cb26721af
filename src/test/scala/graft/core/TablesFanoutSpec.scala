package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins the scan fan-out contract (Tables.fanout): OPT-IN per query
  * (default mode "auto" fires only under FanoutHint.withFanout — the
  * r16 A/B proved default-on is a net suite pessimization), fires only
  * below the cores-worth-of-splits threshold and above the byte floor,
  * is plan-visible as one round-robin exchange, and never changes
  * table CONTENTS (row order may change; the rewrite is a
  * pure-parallelism rewrite for order-insensitive consumers).
  *
  * Uses `newSession()` so the lowered byte floor can't leak into suites
  * running in parallel against the shared session's conf.
  */
class TablesFanoutSpec extends SparkSpec {

  test("default mode (auto) with no request leaves the scan untouched") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout.minBytes", "1")
    assert(Tables.documents(s, SparkSpec.Sf0001).rdd.getNumPartitions == 1,
      "un-requested scan must stay a bare single-split read (r16: the " +
        "blanket exchange regressed 179/314 queries)")
  }

  test("below the byte floor the scan is untouched even when requested") {
    val s = spark.newSession()
    // sf0.001 documents is ~64 KiB < the 256 KiB default floor
    val df = FanoutHint.withFanout(Tables.documents(s, SparkSpec.Sf0001))
    assert(df.rdd.getNumPartitions == 1,
      "sub-floor scan must stay a bare single-split read")
  }

  test("requested + above the floor with fewer splits than cores, the " +
      "scan fans out to defaultParallelism and contents are identical") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout.minBytes", "1")
    val fanned = FanoutHint.withFanout(Tables.documents(s, SparkSpec.Sf0001))
    assert(fanned.rdd.getNumPartitions ==
      s.sparkContext.defaultParallelism,
      "low-split scan must widen to the core count")
    val s2 = spark.newSession()
    s2.conf.set("graft.scan.fanout", "false")
    val plain = Tables.documents(s2, SparkSpec.Sf0001)
    val a = fanned.orderBy(col("doc_id")).collect().toSeq
    val b = plain.orderBy(col("doc_id")).collect().toSeq
    assert(a == b, "fan-out must not change table contents")
  }

  test("fan-out assignment is deterministic across runs (retry safety)") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout.minBytes", "1")
    def perPartition(): Seq[(Int, Seq[Long])] =
      FanoutHint.withFanout(Tables.documents(s, SparkSpec.Sf0001))
        .select(col("doc_id")).rdd
        .mapPartitionsWithIndex { case (i, it) =>
          Iterator((i, it.map(_.getLong(0)).toSeq.sorted))
        }.collect().toSeq.sortBy(_._1)
    assert(perPartition() == perPartition(),
      "round-robin fan-out must give the same row->partition map")
  }

  test("graft.scan.fanout=false is a kill switch that beats a request") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout", "false")
    s.conf.set("graft.scan.fanout.minBytes", "1")
    val df = FanoutHint.withFanout(Tables.documents(s, SparkSpec.Sf0001))
    assert(df.rdd.getNumPartitions == 1)
  }

  test("graft.scan.fanout=true forces the rewrite without a request (A/B aid)") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout", "true")
    s.conf.set("graft.scan.fanout.minBytes", "1")
    assert(Tables.documents(s, SparkSpec.Sf0001).rdd.getNumPartitions ==
      s.sparkContext.defaultParallelism)
  }

  test("mid-size inputs Spark already splits wide are left alone " +
      "(ADVICE r16: estimate must replicate FilePartition.maxSplitBytes)") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout.minBytes", "1")
    // With openCostInBytes lowered, Spark splits even the tiny fixture
    // core-count wide (maxSplitBytes = max(openCost, bytes/cores));
    // the estimator must see that and skip the exchange.
    s.conf.set("spark.sql.files.openCostInBytes", "1")
    val df = FanoutHint.withFanout(Tables.documents(s, SparkSpec.Sf0001))
    assert(df.rdd.getNumPartitions >= s.sparkContext.defaultParallelism)
    assert(!df.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"),
      "already-wide scan must not pay a round-robin exchange")
  }
}
