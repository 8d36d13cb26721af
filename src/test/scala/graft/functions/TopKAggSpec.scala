package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topK equals the window formulation across many partitions") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 5000).map(i => (i % 37L, (i * 13 % 101).toDouble, i.toLong))
      .toDF("g", "key", "id")
      .repartition(16) // force partial-agg + merge + serde paths
    val viaAgg = df.groupBy($"g")
      .agg(TopKAgg.topK($"key", $"id", 3).as("top"))
      .select($"g", posexplode($"top").as(Seq("pos", "t")))
      .select($"g", $"t.id", $"t.sort_key", ($"pos" + 1).as("rn"))
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy($"g").orderBy($"key".desc, $"id")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"g", $"id", $"key", $"rn".cast("int"))
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow)
  }

  test("ties break deterministically on id; nulls skipped; k > group size ok") {
    val df = Seq(
      (1L, Some(5.0), 10L), (1L, Some(5.0), 9L), (1L, Some(5.0), 11L),
      (1L, None, 1L), (2L, Some(1.0), 7L))
      .toDF("g", "key", "id")
    val out = df.groupBy($"g").agg(TopKAgg.topK($"key", $"id", 2).as("top"))
      .select($"g", $"top.id".as("ids")).orderBy($"g")
      .as[(Long, Seq[Long])].collect().toSeq
    assert(out == Seq((1L, Seq(9L, 10L)), (2L, Seq(7L))))
  }
}
