package graft

/** Contract checks over the whole query registry (driver-facing surface). */
class QueriesSpec extends SparkSpec {

  test("every query has oracle SQL — including the approximate ops") {
    // even approximate aggregates carry an oracle: ev_sketch emits exact
    // counts plus bounded-error booleans the oracle asserts true
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registry query executes on sf0.001") {
    val emptyOk = Set("dedup_jaccard", "dedup_embedding", "dedup_minhash",
      "q5_anti_join", "dedup_exact")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, SparkSpec.Sf0001).count()
        if (n == 0 && !emptyOk(name)) Some(s"$name: 0 rows") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(100)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("query docs exist for SURVEY traceability") {
    assert(SparkEntry.registry.forall(_.doc.nonEmpty))
  }
}
