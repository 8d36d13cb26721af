package graft
object DebugRB {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tiny = (0 until 64).map(i => (i.toLong, Array.fill[Byte](100)(1))).toDF("id","payload")
    println("input partitions: " + tiny.rdd.getNumPartitions)
    val sized = tiny.select(spark_partition_id().as("s"), length($"payload").as("l"))
      .groupBy("s").agg(sum("l")).collect().toSeq
    println("totals: " + sized)
    val out = graft.ops.Layout.repartitionByBytes(tiny, "payload", 64L<<20, minPartitions=4)
    println("out partitions: " + out.rdd.getNumPartitions)
    out.select(spark_partition_id().as("p"), length($"payload").as("l"))
      .groupBy("p").agg(sum("l"), count(lit(1))).orderBy("p").show()
    spark.stop()
  }
}
