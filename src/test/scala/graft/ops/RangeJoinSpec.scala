package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join equals the naive non-equi join, without BNLJ") {
    val rnd = new scala.util.Random(11)
    val intervals = (0 until 300).map { i =>
      val lo = rnd.nextInt(100000).toLong
      (i.toLong, lo, lo + rnd.nextInt(500).toLong)
    }.toDF("l_id", "lo", "hi")
    val points = (0 until 400).map(i =>
      (i.toLong + 1000, rnd.nextInt(100000).toLong)).toDF("r_id", "pt")

    val bucketed = RangeJoin.pointInInterval(intervals, "lo", "hi",
      points, "pt", bucketWidth = 512)
    val naive = intervals.join(points,
      col("pt") >= col("lo") && col("pt") <= col("hi"))

    val a = bucketed.select("l_id", "r_id").as[(Long, Long)]
      .collect().sortBy(identity).toSeq
    val b = naive.select("l_id", "r_id").as[(Long, Long)]
      .collect().sortBy(identity).toSeq
    assert(a == b)
    assert(a.nonEmpty)

    // the whole point: an equi-join plan, not a nested loop
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // and the naive plan IS the nested loop we are avoiding
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin")
      || naivePlan.contains("CartesianProduct"))
  }

  test("bucket width narrower than the interval span still meets each pair once") {
    val intervals = Seq((1L, 100L, 900L)).toDF("l_id", "lo", "hi")
    val points = Seq((10L, 100L), (11L, 512L), (12L, 900L), (13L, 901L))
      .toDF("r_id", "pt")
    val out = RangeJoin.pointInInterval(intervals, "lo", "hi",
        points, "pt", bucketWidth = 128)
      .select("r_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(10L, 11L, 12L)) // inclusive bounds, no duplicates
  }
}
