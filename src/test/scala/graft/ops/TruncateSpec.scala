package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TruncateSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, part: String, budget: Int): (String, Int) = {
    val r = Seq((text, part)).toDF("t", "p")
      .select(Truncate.truncateStruct($"t", $"p", budget).as("s"))
      .select($"s.filtered_message", $"s.offset").collect()(0)
    (r.getString(0), r.getInt(1))
  }

  private def words(a: Int, b: Int): String = (a to b).map(i => s"w$i").mkString(" ")

  test("at exactly budget tokens: untouched (boundary pin)") {
    assert(run(words(1, 5), "entire report", 5) == ((words(1, 5), 0)))
  }

  test("budget+1 tokens, entire report: keeps LAST budget tokens") {
    assert(run(words(1, 6), "entire report", 5) == ((words(2, 6), 1)))
  }

  test("budget+1 tokens, section buckets: keep FIRST budget tokens") {
    assert(run(words(1, 6), "gross_or_micro", 5) == ((words(1, 5), 1)))
    assert(run(words(1, 6), "diag_or_add", 5) == ((words(1, 5), 1)))
  }

  test("empty and whitespace-only text survive") {
    assert(run("", "entire report", 5) == (("", 0)))
    assert(run("   ", "entire report", 5) == (("", 0)))
  }

  test("tokenCount: 0 for blank, whitespace-run tolerant") {
    val df = Seq("", "  ", "a  b\t c").toDF("t")
      .select(Truncate.tokenCount($"t").as("n"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 3))
  }
}
