package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("accuracy expression and typed Aggregator agree") {
    val df = Seq(("a", "a"), ("b", "a"), ("c", "c"), ("d", "d"))
      .toDF("pred", "truth")
    val r = df.agg(
      Metrics.accuracyCol($"pred", $"truth").as("e"),
      Metrics.accuracyUdaf($"pred", $"truth").as("u")).collect()(0)
    assert(r.getDouble(0) == 0.75)
    assert(r.getDouble(1) == 0.75)
  }

  test("aggregator handles nulls and empty input") {
    val df = Seq((null.asInstanceOf[String], "a"), ("a", "a")).toDF("pred", "truth")
    assert(df.agg(Metrics.accuracyUdaf($"pred", $"truth")).as[Double].first() == 0.5)
    val empty = spark.emptyDataset[(String, String)].toDF("pred", "truth")
    assert(empty.agg(Metrics.accuracyUdaf($"pred", $"truth")).as[Double].first() == 0.0)
  }
}
