package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class WebFiltersSpec extends SparkSpec {
  import spark.implicits._

  private def eval(text: String, c: String => Column): Any =
    Seq(text).toDF("t").select(c("t").as("v")).head().get(0)

  private val goodDoc =
    (Seq("the", "be", "to", "of") ++ Seq.fill(60)("document")).mkString(" ")

  test("word-level Gopher signals: counts, mean length, symbols, alpha, " +
      "stop words") {
    assert(eval("one two  three", t => WebFilters.nWords(col(t))) == 3L)
    assert(eval("", t => WebFilters.nWords(col(t))) == 0L)
    assert(eval("ab abcd", t => WebFilters.meanWordLen(col(t))) == 3.0)
    // 2 hashes + 1 '...' (5 dots = one non-overlapping triple) over 2 words
    assert(eval("a# b#.....", t => WebFilters.symbolWordRatio(col(t))) == 1.5)
    assert(eval("a1 22 3c 44", t => WebFilters.alphaWordFrac(col(t))) == 0.5)
    // distinct presence, not occurrences: the×3 + of = 2 hits
    assert(eval("the the the of", t => WebFilters.stopWordHits(col(t))) == 2L)
  }

  test("line-level Gopher signals: bullets, ellipses, duplicate lines and " +
      "duplicate chars; blank lines never count") {
    val t = "- item one\nplain line\n\n  \nplain line\nends..."
    assert(eval(t, x => WebFilters.bulletLineFrac(col(x))) == 0.25)
    assert(eval(t, x => WebFilters.ellipsisLineFrac(col(x))) == 0.25)
    // 4 non-blank lines, 3 distinct
    assert(eval(t, x => WebFilters.dupLineFrac(col(x))) == 0.25)
    // duplicate chars: one repeat of "plain line" (10 chars) over the 37
    // total line chars (10 + 10 + 10 + 7)
    assert(eval(t, x => WebFilters.dupLineCharFrac(col(x)))
      .asInstanceOf[Double] == 10.0 / 37.0)
    assert(eval("", x => WebFilters.dupLineFrac(col(x))) == 0.0)
  }

  test("gopherKeep passes a healthy doc and each rule flips it " +
      "independently") {
    def keep(t: String): Boolean =
      eval(t, x => WebFilters.gopherKeep(col(x))).asInstanceOf[Boolean]
    assert(keep(goodDoc))
    assert(!keep("the be short doc")) // < 50 words
    assert(!keep((Seq("the", "be") ++ Seq.fill(60)("eleventyletters!!"))
      .mkString(" "))) // mean word length > 10
    assert(!keep((Seq("the", "be") ++ Seq.fill(30)("x #")).mkString(" "))) // symbols
    assert(!keep((Seq("the", "be") ++ Seq.fill(60)("123")).mkString(" "))) // alpha
    assert(!keep((Seq("the") ++ Seq.fill(60)("word")).mkString(" "))) // 1 stop word
    assert(!keep(Seq.fill(60)(goodDoc.take(40)).mkString("\n"))) // dup lines
  }

  test("CRLF (and lone-CR) documents behave identically to LF — line " +
      "rules must not see a hidden trailing \\r") {
    val lf = Seq(
      "This line has five words.",
      "This line has five words.",
      "ends with an ellipsis...",
      "- bullet line here now.").mkString("\n")
    val crlf = lf.replace("\n", "\r\n")
    val cr = lf.replace("\n", "\r")
    for (variant <- Seq(crlf, cr)) {
      for ((name, sig) <- Seq[(String, String => Column)](
          ("ellipsis", t => WebFilters.ellipsisLineFrac(col(t))),
          ("bullet", t => WebFilters.bulletLineFrac(col(t))),
          ("dupLine", t => WebFilters.dupLineFrac(col(t))),
          ("dupChar", t => WebFilters.dupLineCharFrac(col(t)))))
        assert(eval(variant, sig) == eval(lf, sig),
          s"$name drifted on ${if (variant == crlf) "CRLF" else "CR"} input")
      // C4 cleaning: the CRLF doc must keep the same lines (output is
      // \n-normalized — a cleaner owns its output encoding)
      assert(eval(variant, t => WebFilters.c4CleanLines(col(t))) ==
        eval(lf, t => WebFilters.c4CleanLines(col(t))))
    }
    // the sanity direction: these lines DO trip the rules (non-zero),
    // so the equalities above compare real signals, not four zeros
    assert(eval(lf, t => WebFilters.ellipsisLineFrac(col(t))) == 0.25)
    assert(eval(lf, t => WebFilters.dupLineFrac(col(t))) == 0.25)
  }

  test("c4CleanLines keeps terminal-punctuated lines of >= minWords, in " +
      "order; c4Keep applies the doc rules on the CLEANED text") {
    val t = Seq(
      "This line has five words.",        // kept
      "Short line.",                      // < 5 words
      "this line has no terminal punct",  // no punct
      "Another proper line right here!",  // kept
      "A quoted ending of five \"").mkString("\n") // kept: " terminal
    val cleaned = eval(t, x => WebFilters.c4CleanLines(col(x)))
      .asInstanceOf[String]
    assert(cleaned == "This line has five words.\n" +
      "Another proper line right here!\nA quoted ending of five \"")
    def kept(c: String, min: Int = 3): Boolean =
      eval(c, x => WebFilters.c4Keep(col(x), min)).asInstanceOf[Boolean]
    assert(kept(cleaned))
    assert(!kept(cleaned, min = 4)) // below the line minimum
    assert(!kept(cleaned + "\nwith Lorem Ipsum inside. And more lines."))
    assert(!kept(cleaned + "\ncode { brace }"))
  }
}
