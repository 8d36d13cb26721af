package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic samples from a Gen (no scalatestplus bridge offline). */
  private def samples[A](g: Gen[A], n: Int = 40): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def clean1(s: String): String =
    Seq(s).toDF("t").select(TextOps.cleanMsg($"t")).as[String].first()

  test("cleanMsg lowercases, strips control chars, collapses whitespace") {
    assert(clean1("AB\t  C\r\nD") == "a b c d")
    assert(clean1("  Already clean  ") == "already clean")
    assert(clean1("") == "")
  }

  test("cleanMsg is idempotent (property)") {
    val texts = Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.const(""),
      Gen.const("  "), Gen.const("\n"))).map(_.mkString)
    val cases = samples(texts)
    val df = cases.toDF("t").select(TextOps.cleanMsg($"t").as("once"))
      .withColumn("twice", TextOps.cleanMsg($"once"))
    assert(df.filter($"once" =!= $"twice").count() == 0)
  }

  test("basicReg strips non-word punctuation, keeps basic marks") {
    val got = Seq("a@b#c, d:e!").toDF("t")
      .select(TextOps.basicReg($"t")).as[String].first()
    assert(got == "a b c, d:e ")
  }

  test("formatDate reformats to yyyyMMdd (reference format_date)") {
    val got = Seq("2023-10-01").toDF("d")
      .select(TextOps.formatDate($"d", "yyyy-MM-dd")).as[String].first()
    assert(got == "20231001")
  }

  test("splitIndex: LABEL_7 -> 7; no separator -> null (pandas drift pin)") {
    val df = Seq("LABEL_7", "NOUNDERSCORE").toDF("l")
      .select(TextOps.splitIndex($"l", 1).as("x"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("7"), None))
  }

  test("fingerprint equals md5 of normalized text and ignores formatting") {
    val df = Seq("Hello  World", "hello world").toDF("t")
      .select(TextOps.fingerprint($"t").as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0).length == 32)
  }
}
