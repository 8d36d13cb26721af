package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the pandas↔Spark semantic-drift risks from SURVEY.md §7.3:
  * NaN vs null, dropna, cast failure modes.
  */
class NullDriftSpec extends SparkSpec {
  import spark.implicits._

  test("P7 — na.drop('any') drops rows with null in ANY column (pandas dropna)") {
    val df = Seq(
      (Some(1L), Some("a")), (None, Some("b")), (Some(3L), None))
      .toDF("id", "v")
    assert(df.na.drop("any").count() == 1)
    assert(df.na.drop("all").count() == 3)
  }

  test("NaN semantics: na.drop treats NaN as missing (pandas parity), IS NULL does not") {
    val df = Seq(1.0, Double.NaN).toDF("x")
    // DataFrameNaFunctions.drop counts NaN as NA for float/double columns
    // — same as pandas dropna
    assert(df.na.drop("any").count() == 1)
    // but NaN is NOT a SQL NULL: predicates see a value
    assert(df.filter($"x".isNull).count() == 0)
    assert(df.filter(!isnan($"x")).count() == 1)
    // and NaN equals NaN in grouping/distinct (unlike raw Java ==)
    assert(Seq(Double.NaN, Double.NaN).toDF("x").distinct().count() == 1)
  }

  test("P9 — cast failure modes: string→long null-on-failure via guard") {
    val df = Seq("12", "x", "").toDF("s")
      .select(when($"s".rlike("^-?[0-9]+$"), $"s".cast("long")).as("n"))
    assert(df.collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      == Seq(Some(12L), None, None))
  }

  test("J1 — null join keys never match (pandas merge drops them too)") {
    val l = Seq((Some(1L), "a"), (None, "b")).toDF("k", "lv")
    val r = Seq((Some(1L), "x"), (None, "y")).toDF("k", "rv")
    assert(l.join(r, l("k") === r("k")).count() == 1)
  }
}
