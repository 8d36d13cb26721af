package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins the scan fan-out contract (Tables.fanout): fires only below the
  * cores-worth-of-splits threshold and above the byte floor, is plan-
  * visible as one round-robin exchange, and NEVER changes results (the
  * whole point is that it is a pure-parallelism rewrite).
  *
  * Uses `newSession()` so the lowered byte floor can't leak into suites
  * running in parallel against the shared session's conf.
  */
class TablesFanoutSpec extends SparkSpec {

  test("below the byte floor the scan is untouched (no exchange)") {
    val s = spark.newSession()
    // sf0.001 documents is ~64 KiB < the 256 KiB default floor
    val df = Tables.documents(s, SparkSpec.Sf0001)
    assert(df.rdd.getNumPartitions == 1,
      "sub-floor scan must stay a bare single-split read")
  }

  test("above the floor with fewer splits than cores, the scan fans out " +
      "to defaultParallelism and results are bit-identical") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout.minBytes", "1")
    val fanned = Tables.documents(s, SparkSpec.Sf0001)
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

  test("fan-out assignment is deterministic across builds (retry safety)") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout.minBytes", "1")
    def perPartition(): Seq[(Int, Seq[Long])] =
      Tables.documents(s, SparkSpec.Sf0001)
        .select(col("doc_id")).rdd
        .mapPartitionsWithIndex { case (i, it) =>
          Iterator((i, it.map(_.getLong(0)).toSeq.sorted))
        }.collect().toSeq.sortBy(_._1)
    assert(perPartition() == perPartition(),
      "round-robin fan-out must give the same row->partition map")
  }

  test("graft.scan.fanout=false disables the rewrite entirely") {
    val s = spark.newSession()
    s.conf.set("graft.scan.fanout", "false")
    s.conf.set("graft.scan.fanout.minBytes", "1")
    assert(Tables.documents(s, SparkSpec.Sf0001).rdd.getNumPartitions == 1)
  }
}
