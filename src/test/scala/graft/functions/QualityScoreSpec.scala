package graft.functions

import graft.SparkSpec
import graft.ops.{Curation, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[QualityScoreExpr]]'s exactness contract: RAW-BIT equal doubles vs
  * the Column formulation (`TextAnalysis.qualityScoreColumnForm`, the
  * shape every DuckDB oracle replays) — on the fixture corpus, on the
  * REDACTED fixture corpus (the curation_pipeline input the fusion
  * exists for), and on adversarial strings exercising every seam:
  * empties, whitespace conventions, overlapping stopword markers,
  * unicode punctuation, supplementary code points.
  */
class QualityScoreSpec extends SparkSpec {
  import spark.implicits._

  private def assertBitEqual(df: DataFrame, textCol: String): Unit = {
    val rows = df
      .select(
        TextAnalysis.qualityScore(col(textCol)).as("fused"),
        TextAnalysis.qualityScoreColumnForm(col(textCol)).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"row $k null mismatch")
      if (!r.isNullAt(0)) {
        val (f, g) = (r.getDouble(0), r.getDouble(1))
        assert(java.lang.Double.doubleToRawLongBits(f) ==
          java.lang.Double.doubleToRawLongBits(g),
          s"row $k: fused $f != column-form $g")
      }
    }
  }

  test("bit-equal on the raw fixture corpus") {
    assertBitEqual(
      graft.core.Tables.documents(spark, SparkSpec.Sf0001), "text")
  }

  test("bit-equal on the REDACTED fixture corpus (staged computed-column " +
      "input, materialized so both sides score identical strings)") {
    // materialize redaction first: comparing fused-vs-column on a live
    // redact(text) alias would time the plan, not test it — write it out
    val red = graft.core.Tables.documents(spark, SparkSpec.Sf0001)
      .select(Curation.redact(col("text")).as("t"))
    val dir = java.nio.file.Files.createTempDirectory("qsred").toString
    red.write.mode("overwrite").parquet(dir)
    assertBitEqual(spark.read.parquet(dir), "t")
  }

  test("bit-equal on adversarial strings: every guard and seam") {
    val rows = Seq(
      "", " ", "\t\n", "   \t  ",
      "a", " a ", " the ", " the the a the ",
      " the a the a the a ", // overlapping marker starts
      "the a", "x the a y", " a a a ", // " a a " overlaps itself
      "no stopwords here!!!", "!!!", "...", "###",
      "word " * 200, // saturates the length term
      "¿Dónde está? — em-dash, «guillemets», §¶•",
      "tabs\tand\u000bvertical\ffeeds\rcarriage\nnewline",
      "\u00a0nbsp is NOT Java \\s\u00a0",
      "emoji \ud83d\ude00 pair and astral \ud835\udc9c math", // code points
      "1234567890 alnum only", "ALLCAPS THE A", // case-sensitive markers
      " the\u00a0a ") // nbsp breaks the marker match
    assertBitEqual(rows.toDF("t"), "t")
  }

  test("null text scores null (nullSafeEval), and the fused filter keeps " +
      "the same rows as the column form on the fixtures") {
    val withNull = Seq[Option[String]](Some("some text"), None).toDF("t")
    assertBitEqual(withNull, "t")
    val docs = graft.core.Tables.documents(spark, SparkSpec.Sf0001)
      .select(Curation.redact(col("text")).as("t"))
    val nF = docs.filter(TextAnalysis.qualityScore(col("t")) >= 0.5).count()
    val nC = docs.filter(
      TextAnalysis.qualityScoreColumnForm(col("t")) >= 0.5).count()
    assert(nF == nC, s"fused gate keeps $nF rows, column form $nC")
  }
}
