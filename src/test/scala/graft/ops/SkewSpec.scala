package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on a hot-key workload") {
    // one pathologically hot key (90% of rows) + a long tail
    val big = (1 to 2000).map(i => (i.toLong, if (i % 10 != 0) 1L else (i % 7).toLong))
      .toDF("row_id", "k")
    val small = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k")).select("row_id", "k", "v")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", $"row_id", saltBuckets = 8)
      .select("row_id", "k", "v").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("salt is deterministic and bounded") {
    val df = (1 to 100).map(_.toLong).toDF("id")
      .select(Skew.saltOf($"id", 8).as("s"))
    val r = df.agg(min($"s"), max($"s")).collect()(0)
    assert(r.getInt(0) >= 0 && r.getInt(1) <= 7)
    val again = (1 to 100).map(_.toLong).toDF("id")
      .select(Skew.saltOf($"id", 8).as("s"))
    assert(df.collect().map(_.getInt(0)).toSeq ==
      again.collect().map(_.getInt(0)).toSeq)
  }
}
