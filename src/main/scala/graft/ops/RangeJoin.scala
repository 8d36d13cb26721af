package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi-key, made shuffle-friendly.
  *
  * A join whose ONLY predicate is a range (`r.point BETWEEN l.lo AND
  * l.hi`) has no equi-condition for Catalyst to hash on, so Spark plans
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, a non-starter at
  * scale. The classic fix is to MANUFACTURE the equi-key: quantize time
  * into fixed-width buckets, explode each left interval to the buckets it
  * overlaps, tag each right point with its bucket, equi-join on the
  * bucket, and re-check the exact range. Each qualifying pair meets in
  * exactly one bucket (the point's own), so no dedup is needed; the join
  * becomes an ordinary shuffle hash/sort-merge join whose per-bucket work
  * tracks the data's actual temporal locality.
  *
  * Sizing: `bucketWidth` ≥ the max interval span keeps left replication
  * ≤ 2 buckets per row. Hot buckets (load spikes) are ordinary join skew
  * — shrink the width or layer [[Skew.saltedJoin]] on the bucket key.
  */
object RangeJoin {

  /** Join right POINTS (`pointCol`, integral e.g. epoch-µs) into left
    * INTERVALS [`loCol`, `hiCol`] via `bucketWidth`-wide bucketing. All
    * three columns must be integral; other column names must not collide
    * across the two sides (as with any join).
    */
  def pointInInterval(left: DataFrame, loCol: String, hiCol: String,
                      right: DataFrame, pointCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket",
      explode(sequence(expr(s"`$loCol` div ${bucketWidth}L"),
        expr(s"`$hiCol` div ${bucketWidth}L"))))
    val rb = right.withColumn("__bucket",
      expr(s"`$pointCol` div ${bucketWidth}L"))
    lb.join(rb, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
