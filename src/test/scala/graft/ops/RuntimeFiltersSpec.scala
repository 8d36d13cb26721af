package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimeFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("bloomReducedJoin equals the plain inner join (no false negatives; " +
      "false positives cleared by the exact join)") {
    val fact = (1 to 500).map(i => (i.toLong, i.toLong % 50, s"f$i"))
      .toDF("fid", "fk", "payload")
    val dim = Seq(3L, 7L, 11L, 42L).map(k => (k, s"d$k")).toDF("dk", "dname")
    val got = RuntimeFilters.bloomReducedJoin(fact, dim, "fk", "dk",
        expectedItems = 100)
      .select("fid", "fk", "dk", "dname")
      .orderBy("fid").collect().toSeq
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fid", "fk", "dk", "dname")
      .orderBy("fid").collect().toSeq
    assert(got == want)
    assert(want.nonEmpty, "fixture must exercise matches")
  }

  test("bloomReducedJoin with null fact keys drops them, same as the " +
      "plain join") {
    val fact = Seq((1L, java.lang.Long.valueOf(3L)),
      (2L, null.asInstanceOf[java.lang.Long]), (3L, java.lang.Long.valueOf(9L)))
      .toDF("fid", "fk")
    val dim = Seq((3L, "x")).toDF("dk", "dname")
    val got = RuntimeFilters.bloomReducedJoin(fact, dim, "fk", "dk",
      expectedItems = 10).select("fid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("bloomReducedJoin over an empty dim side is the empty join") {
    val fact = Seq((1L, 3L)).toDF("fid", "fk")
    val dim = Seq((3L, "x")).toDF("dk", "dname").filter(lit(false))
    assert(RuntimeFilters.bloomReducedJoin(fact, dim, "fk", "dk",
      expectedItems = 10).count() == 0L)
  }
}
