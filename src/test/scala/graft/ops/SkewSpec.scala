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

  test("skewReport: exact shares and ceil-div salt factors; top-k " +
      "orders by (count desc, key)") {
    // 70/20/10 over 10 partitions: avg load = 10 → salts 7, 2, 1
    val rows = Seq.fill(70)("h") ++ Seq.fill(20)("m") ++ Seq.fill(10)("t")
    val got = Skew.skewReport(rows.toDF("k"), "k", topK = 2,
        partitions = 10)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("share"), r.getAs[Long]("salt_factor")))
    assert(got.toSeq == Seq(("h", 70L, 0.7, 7L), ("m", 20L, 0.2, 2L)),
      s"got ${got.toSeq}")
    // non-dividing total: 7 rows over 3 partitions → avg = ceil(7/3) = 3,
    // hot key of 5 → ceil(5/3) = 2
    val got2 = Skew.skewReport(
        (Seq.fill(5)("a") ++ Seq.fill(2)("b")).toDF("k"), "k",
        topK = 10, partitions = 3)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("salt_factor")))
    assert(got2.toSeq == Seq(("a", 2L), ("b", 1L)), s"got ${got2.toSeq}")
  }
}
