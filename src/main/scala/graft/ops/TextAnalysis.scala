package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extensions, BASELINE.json): language ID, quality scoring,
  * token counting, fingerprinting.
  *
  * Everything is pure `Column` expression chains — codegen'd, zero UDFs,
  * zero shuffles; these run inside the scan's project stage at any scale.
  * All arithmetic is integer-count based (lengths, replace-diffs) so the
  * DuckDB oracle reproduces results bit-exactly.
  */
object TextAnalysis {

  /** Occurrences of a literal marker in a string: (len - len(remove)) / |m|.
    * Integer counts, double division — deterministic across engines.
    */
  def occurrences(c: Column, marker: String): Column =
    (length(c) - length(expr_replace(c, marker))) / lit(marker.length)

  private def expr_replace(c: Column, search: String): Column =
    call_function("replace", c, lit(search), lit(""))

  /** Language-ID by marker-word frequency (n-gram heuristic): score each
    * candidate language by its marker occurrences, argmax with a fixed
    * tie-break order. Markers are configurable; defaults target the
    * fixture vocabulary so the operator exercises real signal there.
    */
  val defaultMarkers: Seq[(String, String)] = Seq(
    "en" -> " the ", "es" -> " data ", "fr" -> " join ",
    "de" -> " merge ", "zh" -> " spark ")

  def langScores(text: Column, markers: Seq[(String, String)] = defaultMarkers): Seq[Column] =
    markers.map { case (lang, m) => occurrences(text, m).as(s"score_$lang") }

  /** Argmax over the score columns, ties resolved by marker order. */
  def predictLang(text: Column, markers: Seq[(String, String)] = defaultMarkers): Column = {
    val scores = markers.map { case (lang, m) => lang -> occurrences(text, m) }
    scores.init.foldRight(lit(scores.last._1)) { case ((lang, s), rest) =>
      val others = scores.filter(_._1 != lang).map(_._2)
      when(others.foldLeft(lit(true))((acc, o) => acc && s >= o), lang).otherwise(rest)
    }
  }

  /** Whitespace token count (0 for blank text). */
  def tokenCountWs(text: Column): Column =
    when(trim(text) === "", lit(0)).otherwise(size(split(trim(text), "\\s+"))).cast("long")

  /** BPE-ish token count: runs of letters, runs of digits, and individual
    * punctuation marks each count as one token — the standard cheap
    * approximation of subword tokenizer cost for data budgeting.
    */
  def tokenCountRegex(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Punctuation ratio over total characters (0 for empty). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[A-Za-z0-9\\s]", "")) / length(text))

  /** Stopword ratio: marker-word hits per whitespace token. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = Seq(" the ", " a ")): Column = {
    val hits = stopwords.map(occurrences(text, _)).reduce(_ + _)
    when(tokenCountWs(text) === 0, lit(0.0)).otherwise(hits / tokenCountWs(text))
  }

  /** Composite document-quality score in [0,1]: length saturation,
    * low punctuation, healthy stopword density — the shape used to filter
    * web-scraped corpora before training.
    */
  def qualityScore(text: Column): Column =
    least(length(text) / lit(500.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - punctRatio(text)) * lit(0.3) +
      least(stopwordRatio(text) * lit(4.0), lit(1.0)) * lit(0.3)

  /** Duplicate-word fraction (Gopher-style repetition signal):
    * 1 − distinct(words)/words. A high value marks keyword-stuffed or
    * looping machine text; web-corpus filters drop past ~0.3-0.6.
    * Runs as a pure expression over the scan — no explode, no shuffle.
    */
  def dupWordFrac(text: Column): Column = {
    val w = split(trim(text), "\\s+")
    when(trim(text) === "", lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(w)).cast("double") / size(w))
  }

  /** Most-frequent-adjacent-bigram fraction (the second Gopher repetition
    * rule): occurrences of the commonest word pair × 2 / word count.
    * Counting stays INSIDE one row (no explode — an explode + per-doc
    * groupBy would shuffle every bigram of the corpus at 100 TB to
    * compute a per-row statistic): the bigram array is sorted and the
    * max multiplicity read off as the longest run of equal neighbors —
    * O(n log n) per row, so a heavy-tailed 300k-word outlier document
    * costs milliseconds instead of the 10¹⁰ comparisons a per-element
    * self-count would (one such row would stall its whole stage).
    */
  def topBigramFrac(text: Column): Column = {
    val w = split(trim(text), "\\s+")
    // zip the words with their own 1-shifted slice: every array argument
    // is evaluated ONCE per row. The transform/element_at(w, i) form
    // would re-run the split per ELEMENT (higher-order lambdas get no
    // subexpression elimination) — O(n²) in characters per row. The last
    // zip slot pairs with null (concat → null) and is filtered out.
    val bigrams = filter(
      zip_with(w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    // longest equal run over the sorted array == max bigram count; the ""
    // seed can never equal a real bigram (bigrams contain a space around
    // non-empty words), so the first element always starts a run of 1
    val maxCnt = aggregate(
      array_sort(bigrams),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("mx")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("mx"), run).as("mx"))
      },
      acc => acc.getField("mx"))
    when(tokenCountWs(text) < 2, lit(0.0))
      .otherwise(maxCnt.cast("double") * 2 / size(w))
  }

  /** Tokenizer-vocabulary construction with corpus coverage — the "how
    * big must the vocab be" curve every tokenizer-training run starts
    * from: whitespace-token frequencies, ranked, with the cumulative
    * fraction of all token OCCURRENCES a top-`topK` vocabulary covers.
    *
    * Plan shape at scale: one map-side-combined word-count aggregation
    * (the only corpus-sized shuffle), then `orderBy(freq).limit(topK)` —
    * Spark plans TakeOrderedAndProject, never a global sort — and the
    * running-coverage window runs over the `topK`-row survivor set only
    * (a single tiny partition by construction, not a global window over
    * the vocabulary). Ties broken by term so ranks are total.
    *
    * Output: (rank, term, freq, coverage), `topK` rows.
    */
  def vocabCoverage(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val total = counts.agg(sum("freq").as("__total"))
    val top = counts.orderBy(col("freq").desc, col("term").asc).limit(topK)
    val w = Window.orderBy(col("freq").desc, col("term").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("term").asc)).cast("long"))
      .withColumn("coverage",
        sum("freq").over(w).cast("double") / col("__total"))
      .select("rank", "term", "freq", "coverage")
      .orderBy("rank")
  }
}
