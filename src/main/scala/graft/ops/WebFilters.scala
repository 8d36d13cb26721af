package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The named web-corpus filter suites every large pretraining run
  * applies before anything else touches the data: the Gopher /
  * MassiveText quality rules (Rae et al. 2021, appendix A1.1) and
  * C4-style line cleaning (Raffel et al. 2020 §2.2). (North-star
  * extension surface; reference analogue: the keep/drop text-hygiene
  * shape of /root/reference/diagnostic_group_pipeline.py's clean_msg
  * step.) Everything here is a pure scan-stage Column expression —
  * word and line statistics stay INSIDE their row (split + higher-order
  * array functions, no explode), so at 100 TB the whole rule suite is
  * one codegen'd projection over the corpus scan: no shuffle, no
  * per-row UDF, nothing grows with corpus size.
  *
  * Cross-engine determinism: every signal is an integer count or an
  * int/int division — both engines produce the identical IEEE double,
  * so the DuckDB hash gate applies to the signals themselves, not a
  * rounded proxy.
  */
object WebFilters {

  private def words(c: Column): Column =
    filter(split(trim(c), "\\s+"), w => w =!= "")

  /** Non-blank, trimmed lines. The split handles \n, \r\n AND lone \r
    * line endings: real web crawls are full of CRLF documents, and
    * Spark's `trim` strips only spaces — splitting on \n alone would
    * leave a trailing \r on every line, silently failing the
    * terminal-punctuation and ellipsis rules (and making 'foo\r' ≠
    * 'foo' in the duplicate-line counts) for ALL CRLF content.
    */
  def lines(c: Column): Column =
    filter(transform(split(c, "\r\n|[\r\n]"), l => trim(l)), l => l =!= "")

  // ---- Gopher / MassiveText word-level signals ---------------------------

  def nWords(text: Column): Column = size(words(text)).cast("long")

  /** Mean word length (0 for empty docs). */
  def meanWordLen(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        size(ws))
  }

  /** Symbol-to-word ratio: '#' and '...' occurrences per word — the
    * Gopher rule that catches markup soup and truncated scrapes.
    */
  def symbolWordRatio(text: Column): Column = {
    val hashes = (length(text) - length(regexp_replace(text, "#", "")))
    val dots = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)
    when(nWords(text) === 0, lit(0.0))
      .otherwise((hashes + dots).cast("double") / nWords(text))
  }

  /** Fraction of words containing at least one alphabetic character
    * (Gopher requires ≥ 0.8 — pure-number/symbol streams fail).
    */
  def alphaWordFrac(text: Column): Column = {
    val ws = words(text)
    when(size(ws) === 0, lit(0.0)).otherwise(
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / size(ws))
  }

  /** The eight MassiveText "required stop words"; a document must
    * contain at least two DISTINCT ones. Counts distinct presence, not
    * occurrences — one "the" repeated is one hit.
    */
  val RequiredStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def stopWordHits(text: Column): Column = {
    val ws = words(text)
    RequiredStopWords
      .map(s => when(array_contains(ws, s), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  // ---- Gopher line-level (repetition) signals ----------------------------

  /** Fraction of lines ending in an ellipsis ('...'). */
  def ellipsisLineFrac(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0)).otherwise(
      size(filter(ls, l => l.endsWith("..."))).cast("double") / size(ls))
  }

  /** Fraction of lines starting with a bullet ('-' or '*' or '•'). */
  def bulletLineFrac(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0)).otherwise(
      size(filter(ls, l => l.rlike("^[-*•]"))).cast("double") / size(ls))
  }

  /** Duplicate-line fraction: 1 − distinct(lines)/lines. */
  def dupLineFrac(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(ls)).cast("double") / size(ls))
  }

  /** Fraction of line characters inside REPEAT occurrences of a line
    * (a line appearing k times contributes (k−1)·len duplicate chars):
    * Σlen(lines) − Σlen(distinct lines), over Σlen(lines).
    */
  def dupLineCharFrac(text: Column): Column =
    dupSegCharFrac(lines(text))

  private def dupSegCharFrac(segs: Column): Column = {
    def sumLen(a: Column): Column =
      aggregate(a, lit(0L), (acc, l) => acc + length(l))
    val total = sumLen(segs)
    when(total === 0, lit(0.0)).otherwise(
      (total - sumLen(array_distinct(segs))).cast("double") / total)
  }

  /** Non-blank, trimmed PARAGRAPHS: segments separated by one-or-more
    * blank lines (lines holding only horizontal whitespace count as
    * blank, and all three line-ending conventions delimit).
    */
  def paragraphs(c: Column): Column =
    filter(
      transform(split(c, "(\\r\\n|[\\r\\n])([ \\t]*(\\r\\n|[\\r\\n]))+"),
        p => trim(p)),
      p => p =!= "")

  /** Duplicate-paragraph fraction (Gopher A1.1 rule #2, threshold 0.30):
    * 1 − distinct(paragraphs)/paragraphs.
    */
  def dupParagraphFrac(text: Column): Column = {
    val ps = paragraphs(text)
    when(size(ps) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(ps)).cast("double") / size(ps))
  }

  /** Duplicate-paragraph CHAR fraction (Gopher A1.1, threshold 0.20):
    * a paragraph appearing k times contributes (k−1)·len duplicate
    * characters.
    */
  def dupParagraphCharFrac(text: Column): Column =
    dupSegCharFrac(paragraphs(text))

  /** The Gopher keep decision at the paper's published thresholds:
    * 50 ≤ words ≤ 100k, mean word length in [3, 10], symbol-to-word
    * < 0.1, < 90% bullet lines, < 30% ellipsis lines, ≥ 80% alphabetic
    * words, ≥ 2 required stop words, duplicate-line fraction < 0.30,
    * duplicate-line-char fraction < 0.20. (The n-gram repetition rules
    * live in [[TextAnalysis.topBigramFrac]]/[[TextAnalysis.dupWordFrac]]
    * and compose by AND when wanted.)
    */
  def gopherKeep(text: Column): Column =
    gopherKeepNoStop(text) && stopWordHits(text) >= 2L

  /** [[gopherKeep]] minus the required-stop-word rule — for corpora
    * whose vocabulary legitimately lacks English function words
    * (code, tables, non-English text routed by langid) where the
    * other eight rules still apply.
    */
  def gopherKeepNoStop(text: Column): Column =
    nWords(text).between(50L, 100000L) &&
      meanWordLen(text).between(3.0, 10.0) &&
      symbolWordRatio(text) < 0.1 &&
      bulletLineFrac(text) < 0.9 &&
      ellipsisLineFrac(text) < 0.3 &&
      alphaWordFrac(text) > 0.8 &&
      dupLineFrac(text) < 0.3 &&
      dupLineCharFrac(text) < 0.2

  // ---- C4-style line cleaning --------------------------------------------

  /** C4 §2.2 line cleaning: retain only lines that end in a terminal
    * punctuation mark (. ! ? ") and contain at least `minWords` words;
    * surviving lines re-join with '\n' in their original order. The
    * document-level C4 rules (≥ `minLines` surviving lines, no lorem
    * ipsum, no '{') are [[c4Keep]] over the CLEANED text — the paper's
    * order, since cleaning can drop a doc below the line minimum.
    */
  def c4CleanLines(text: Column, minWords: Int = 5): Column =
    array_join(
      filter(lines(text), l =>
        l.rlike("[.!?\"]$") &&
          size(filter(split(l, "\\s+"), w => w =!= "")) >= minWords),
      "\n")

  def c4Keep(cleanedText: Column, minLines: Int = 3): Column =
    size(lines(cleanedText)) >= minLines &&
      !lower(cleanedText).contains("lorem ipsum") &&
      !cleanedText.contains("{")
}
