package graft.functions

import graft.SparkSpec
import graft.ops.WebFilters
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[GopherSignals]] expression must be BIT-EQUAL to the
  * WebFilters Column formulation on every field — the fused form is a
  * performance rewrite, never a semantic fork.
  */
class GopherSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def colForm(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"),
      WebFilters.nWords(col("text")).as("n_words"),
      WebFilters.meanWordLen(col("text")).as("mean_word_len"),
      WebFilters.symbolWordRatio(col("text")).as("symbol_ratio"),
      WebFilters.alphaWordFrac(col("text")).as("alpha_frac"),
      WebFilters.stopWordHits(col("text")).as("stop_hits"),
      WebFilters.ellipsisLineFrac(col("text")).as("ellipsis_frac"),
      WebFilters.bulletLineFrac(col("text")).as("bullet_frac"),
      WebFilters.dupLineFrac(col("text")).as("dup_line_frac"),
      WebFilters.dupLineCharFrac(col("text")).as("dup_char_frac"),
      WebFilters.gopherKeep(col("text")).as("keep"),
      WebFilters.gopherKeepNoStop(col("text")).as("keep_no_stop"))

  private def fused(df: DataFrame): DataFrame =
    df.withColumn("__g", GopherSignals.all(col("text")))
      .select(col("doc_id"),
        col("__g.n_words").as("n_words"),
        col("__g.mean_word_len").as("mean_word_len"),
        col("__g.symbol_ratio").as("symbol_ratio"),
        col("__g.alpha_frac").as("alpha_frac"),
        col("__g.stop_hits").as("stop_hits"),
        col("__g.ellipsis_frac").as("ellipsis_frac"),
        col("__g.bullet_frac").as("bullet_frac"),
        col("__g.dup_line_frac").as("dup_line_frac"),
        col("__g.dup_char_frac").as("dup_char_frac"),
        col("__g.keep").as("keep"),
        col("__g.keep_no_stop").as("keep_no_stop"))

  private def assertEqual(df: DataFrame): Unit = {
    val a = fused(df)
    val b = colForm(df)
    // names + types only: nullability legitimately differs (struct-field
    // extraction is nullable; a sum of literals is not) and the driver's
    // parquet/pandas compare can't see it either
    assert(a.schema.map(f => (f.name, f.dataType)) ==
      b.schema.map(f => (f.name, f.dataType)),
      s"schema drift:\n${a.schema}\nvs\n${b.schema}")
    val diff = a.exceptAll(b).union(b.exceptAll(a))
    assert(diff.isEmpty, diff.collect().take(5).mkString("\n"))
  }

  test("fused == Column formulation on hand-built edge cases") {
    val thresholdDoc = // 50+ words, mean len in range, stop words, dup lines
      (("the be to of and that have with " * 2) +
        (1 to 40).map(i => s"word$i").mkString(" ") + "\n" +
        "alpha beta gamma delta epsilon.\n" +
        "alpha beta gamma delta epsilon.\n" +
        "- bullet line here\n* star bullet\n• unicode bullet\n" +
        "trailing ellipsis line...\n")
    val docs = Seq(
      (1L, ""),
      (2L, "   "),
      (3L, "\n\r\n\r"),
      (4L, "one"),
      (5L, "### #!# ... ..... ......."),
      (6L, "the the the the be to of and that have with"),
      (7L, "héllo wörld • bullet 日本語 テスト"),
      (8L, "a\r\nb\rc\nd\r\n\r\na"),
      (9L, thresholdDoc),
      (10L, "12345 67890 !!! ??? %%%"),
      (11L, " leading and trailing spaces \n  - spaced bullet  \n x ..."),
      (12L, "line one...\nline two\nline one...\nline two\nline three")
    ).toDF("doc_id", "text")
    assertEqual(docs)
  }

  test("fused == Column formulation on the documents fixture (chunked)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    assertEqual(docs)
  }

  test("property: fused == Column formulation on adversarial random text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // alphabet chosen to hit every branch: whitespace variants (incl.
    // CR/LF/CRLF and tabs), the symbol rules ('#', '.'), bullet starts,
    // stop words, non-ASCII and beyond-BMP code points
    val token = Gen.oneOf(
      Gen.oneOf(WebFilters.RequiredStopWords),
      Gen.oneOf("-x", "*y", "•z", "...", "#", "a#b", "w...", "12", "é", "𝄞a"),
      Gen.chooseNum(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString)))
    val sep = Gen.oneOf(" ", "  ", "\n", "\r\n", "\r", "\t", " \n ")
    val textGen = Gen.chooseNum(0, 30).flatMap { n =>
      for {
        ts <- Gen.listOfN(n, token)
        ss <- Gen.listOfN(n, sep)
      } yield ts.zip(ss).map { case (t, s) => t + s }.mkString
    }
    val texts = (0 until 120)
      .flatMap(i => textGen(Gen.Parameters.default, Seed(i.toLong)))
    assertEqual(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text"))
  }

  test("fused expression is codegen'd and shuffle-free as a projection") {
    // parquet-backed input: a local Seq relation constant-folds into a
    // LocalTableScan and hides the projection plan
    val df = fused(spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // "*(n)" prefixes whole-stage-codegen'd operators in this rendering
    assert(plan.contains("*(1) Project"), plan)
    // the struct is STAGED: the expression text appears exactly once —
    // eleven field reads must not re-evaluate the fused pass
    assert("gopher_signals".r.findAllIn(plan).size == 1, plan)
  }
}
