package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("occurrences counts non-overlapping literal matches") {
    val n = Seq("x the y the z").toDF("t")
      .select(TextAnalysis.occurrences($"t", " the ").as("n")).as[Double].first()
    assert(n == 2.0)
  }

  test("repetition signals: hand-computed values and degenerate inputs") {
    val got = Seq(
      "a b a b a b",   // all dup words; "a b" bigram 3 of 5
      "v w x y z",     // no repetition
      "loop loop loop loop", // one word repeated
      "solo",          // single word: no bigram
      "  ",            // blank
      "")
      .toDF("t")
      .select(TextAnalysis.dupWordFrac($"t").as("d"),
        TextAnalysis.topBigramFrac($"t").as("b"))
      .as[(Double, Double)].collect().toSeq
    assert(got(0) == ((1.0 - 2.0 / 6, 3.0 * 2 / 6)))
    assert(got(1) == ((0.0, 1.0 * 2 / 5))) // every bigram unique: 2/n
    assert(got(2) == ((1.0 - 1.0 / 4, 3.0 * 2 / 4)))
    assert(got(3) == ((0.0, 0.0)))
    assert(got(4) == ((0.0, 0.0)))
    assert(got(5) == ((0.0, 0.0)))
  }

  test("topBigramFrac is sub-quadratic: a 60k-word outlier doc completes " +
    "in bounded time with the exact answer") {
    // heavy-tailed corpora contain such rows; the old per-element
    // self-count was O(n²) — ~3.6e9 comparisons here, minutes in one task
    val n = 30000
    val text = Seq.fill(n)("a b").mkString(" ") // 60k words
    val t0 = System.nanoTime()
    val got = Seq(text).toDF("t")
      .select(TextAnalysis.topBigramFrac($"t").as("b")).as[Double].first()
    val secs = (System.nanoTime() - t0) / 1e9
    // "a b" occurs n times over 2n words -> frac = n*2/(2n) = 1.0
    assert(got == 1.0)
    assert(secs < 60.0, f"topBigramFrac took $secs%.1f s on a 60k-word doc")
  }

  test("topNgramCharFrac / dupNgramCharFrac: hand-computed coverage, " +
      "tie-breaks, and degenerate inputs") {
    def top(t: String, n: Int): Double =
      Seq(t).toDF("t").select(TextAnalysis.topNgramCharFrac($"t", n).as("v"))
        .as[Double].first()
    def dup(t: String, n: Int): Double =
      Seq(t).toDF("t").select(TextAnalysis.dupNgramCharFrac($"t", n).as("v"))
        .as[Double].first()
    // "a b a b a b": trigrams = [a b a, b a b, a b a, b a b] -> counts
    // tie at 2; both len 5 -> lexicographically smaller "a b a" wins;
    // normalized chars = 11
    assert(top("a b a b a b", 3) == 2.0 * 5 / 11)
    // every trigram duplicated: overlap-counted coverage 20/11 caps at 1
    assert(dup("a b a b a b", 3) == 1.0)
    // uncapped case: "p q r s t" repeats at positions 1 and 6 -> 2 x 9
    // chars over 29 normalized chars
    assert(dup("p q r s t p q r s t u v w x y", 5) == 18.0 / 29)
    // no duplicates -> dup 0; top gram occurs once
    assert(dup("v w x y z", 2) == 0.0)
    assert(top("v w x y z", 2) == 1.0 * 3 / 9)
    // count ties break to the LONGER gram: "xx yy" (5 chars) beats
    // "a b" (3 chars) when both occur twice
    assert(top("a b c xx yy d a b e xx yy", 2) == 2.0 * 5 / 25)
    // fewer words than n, blank, empty -> all zero
    assert(top("one two", 3) == 0.0 && dup("one two", 3) == 0.0)
    assert(top("  ", 2) == 0.0 && dup("", 2) == 0.0)
    // words shorter than n leave NO n-gram: never NaN
    assert(!top("solo", 4).isNaN)
  }

  test("gopherRepetitionKeep: clean text passes, an n-gram loop fails") {
    def keep(t: String): Boolean =
      Seq(t).toDF("t").select(TextAnalysis.gopherRepetitionKeep($"t").as("v"))
        .as[Boolean].first()
    // 60 distinct words: every n-gram unique
    assert(keep((1 to 60).map(i => s"w$i").mkString(" ")))
    // a looping 5-gram (machine-generated boilerplate shape)
    assert(!keep(Seq.fill(12)("the same five word loop").mkString(" ")))
  }

  test("token counts: ws vs BPE-ish regex") {
    val r = Seq("Hello, world! x2").toDF("t").select(
      TextAnalysis.tokenCountWs($"t").as("ws"),
      TextAnalysis.tokenCountRegex($"t").as("re")).collect()(0)
    assert(r.getLong(0) == 3)
    // Hello , world ! x 2  -> 6
    assert(r.getLong(1) == 6)
  }

  test("quality score is in [0,1] on the fixture and punct-sensitive") {
    val docs = graft.core.Tables.documents(spark, graft.SparkSpec.Sf0001)
    val bounds = docs.select(TextAnalysis.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).collect()(0)
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
    val clean = Seq("the quick brown fox ran over the lazy dog again").toDF("t")
      .select(TextAnalysis.qualityScore($"t")).as[Double].first()
    val noisy = Seq("@#$%^&*!!! ??? ~~~///").toDF("t")
      .select(TextAnalysis.qualityScore($"t")).as[Double].first()
    assert(clean > noisy)
  }

  test("predictLang argmax with deterministic tie-break order") {
    val df = Seq(" the data the ", " data data data ", " nothing ").toDF("t")
      .select(TextAnalysis.predictLang($"t").as("l"))
    // row1: en=2 es=... ' data '=1 -> en; row2: es wins; row3: all 0 -> en (first)
    assert(df.as[String].collect().toSeq == Seq("en", "es", "en"))
  }

  test("vocabCoverage: ranks by freq desc then term, coverage reaches 1 when k >= vocab") {
    val docs = Seq("b a a", "c b a", "").toDF("text")
    val got = TextAnalysis.vocabCoverage(docs, "text", topK = 10).collect()
    // freqs: a=3, b=2, c=1 -> total 6
    assert(got.map(_.getString(1)).toSeq == Seq("a", "b", "c"))
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L))
    val cov = got.map(_.getDouble(3))
    assert(math.abs(cov(0) - 3.0 / 6) < 1e-12)
    assert(math.abs(cov(1) - 5.0 / 6) < 1e-12)
    assert(math.abs(cov(2) - 1.0) < 1e-12)
    assert(cov.sliding(2).forall(p => p(0) <= p(1)), "coverage monotone")
    // topK cuts the list but not the denominator
    val top1 = TextAnalysis.vocabCoverage(docs, "text", topK = 1).collect()
    assert(top1.length == 1 && math.abs(top1(0).getDouble(3) - 0.5) < 1e-12)
  }

  test("vocabCoverage: freq ties break by term ascending") {
    val docs = Seq("z y x").toDF("text")
    val got = TextAnalysis.vocabCoverage(docs, "text", topK = 3).collect()
    assert(got.map(_.getString(1)).toSeq == Seq("x", "y", "z"))
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("textRankWindows: the bridging window wins; symmetric pair ties " +
      "to the smaller index; a single window is its own summary") {
    val docs = Seq(
      // windowWords=2 → windows [a b][c a][d c]: the middle window
      // overlaps both neighbors (a, then c) while 1 and 3 share
      // nothing — centrality must pick window 2
      (1L, "a b c a d c"),
      // two windows sharing one word — symmetric ranks, tie → widx 1
      (2L, "p q r p"),
      // one window, no edges: teleport-only rank, trivially the winner
      (3L, "x y")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.textRankWindows(docs, "doc_id", "text",
        windowWords = 2, damping = 0.85, iters = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(4)))).toMap
    assert(r(1L) == ((2L, 3L, "c a")), s"bridge window must win: $r")
    assert(r(2L) == ((1L, 2L, "p q")), s"symmetric tie → first: $r")
    assert(r(3L) == ((1L, 1L, "x y")), s"singleton: $r")
  }

  test("textRankWindows: scores are within-engine deterministic and a " +
      "higher-degree window outranks a leaf") {
    val docs = Seq((7L, "a b c a d a f g")).toDF("doc_id", "text")
    // windows of 2: [a b][c a][d a][f g] — windows 1..3 all share 'a',
    // window 4 is isolated (teleport-only)
    val out = TextAnalysis.textRankWindows(docs, "doc_id", "text",
      windowWords = 2, damping = 0.85, iters = 2).collect()
    assert(out.length == 1 && out(0).getLong(2) == 4L)
    val again = TextAnalysis.textRankWindows(docs, "doc_id", "text",
      windowWords = 2, damping = 0.85, iters = 2).collect()
    assert(out(0).getDouble(3) == again(0).getDouble(3),
      "repeated runs must produce identical scores")
  }

  test("winnow: the MOSS guarantee — two documents sharing a span of " +
      ">= w+k-1 chars share at least one selected fingerprint; " +
      "density is bounded; selection replays a driver-side argmin") {
    val k = 4
    val w = 3
    val shared = "the quick brown fox jumps over it" // >> w+k-1 = 6
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"zzz $shared qqq"),
      (3L, "completely unrelated content here")).toDF("doc_id", "text")
    val got = TextAnalysis.winnow(docs, "doc_id", "text", k = k, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "shared span must yield a shared fingerprint")
    // density: winnowing selects at most one print per window start
    val doc1len = s"AAAA $shared BBBB".length
    assert(byDoc(1L).size <= doc1len - k + 1 - w + 1)
    // driver replay on doc 3: same cleaning (lowercase), same argmin
    val msg = "completely unrelated content here"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hs = (1 to (msg.length - k + 1)).map(i =>
      (md5hex(msg.substring(i - 1, i - 1 + k)), i.toLong))
    val expect = (1 to (msg.length - k + 1 - w + 1)).map(i =>
      hs.slice(i - 1, i - 1 + w).min).distinct.toSet
    val got3 = got.filter(_._1 == 3L).map(x => (x._3, x._2)).toSet
    assert(got3 == expect, s"replay mismatch:\n$got3\nvs\n$expect")
  }

  test("vocabOverlap: hand-computed Jaccard; duplicate tokens count once; " +
      "disjoint pairs absent; pairs are unordered (a < b)") {
    import spark.implicits._
    val docs = Seq(
      ("s1", "a b c a"),      // vocab {a,b,c}
      ("s2", "b c d"),        // vocab {b,c,d}
      ("s3", "x y"),          // disjoint
      ("s2", "d d"))          // no new tokens
      .toDF("source", "text")
    val got = TextAnalysis.vocabOverlap(docs, "source", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // only (s1,s2) share tokens: |{b,c}|=2, union=4 -> 0.5
    assert(got.toSeq === Seq(("s1", "s2", 3L, 3L, 2L, 0.5)), s"${got.toSeq}")
  }

  test("sStem: the three Harman rules and every guard") {
    import spark.implicits._
    val words = Seq("babies", "ties", "movies", // ies -> y
      "does", "trees", "canvases", // oes/ees guards; ses strips one s
      "cats", "is", // plain s strip
      "bus", "class", "dog") // us/ss guards; no suffix
      .toDF("w")
    val r = words.select(col("w"),
        TextAnalysis.sStem(col("w")).as("s"))
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    assert(r("babies") == "baby" && r("ties") == "ty" &&
      r("movies") == "movy") // the S-stemmer's documented quirk
    assert(r("does") == "does" && r("trees") == "trees")
    assert(r("canvases") == "canvase")
    assert(r("cats") == "cat" && r("is") == "i")
    assert(r("bus") == "bus" && r("class") == "class" && r("dog") == "dog")
  }

  test("readability: hand-computed counts and the exact Flesch value") {
    import spark.implicits._
    val docs = Seq(("s1", "The cat sat. It ran!")).toDF("source", "text")
    val r = TextAnalysis.readability(docs, "text", "source").collect().head
    assert(r.getLong(1) == 1L) // n_docs
    assert(r.getLong(2) == 5L, "words: the cat sat it ran")
    assert(r.getLong(3) == 2L, "sentence terminators: . and !")
    assert(r.getLong(4) == 5L, "vowel groups: e a a i a")
    assert(r.getDouble(5) == 2.5)
    assert(math.abs(r.getDouble(6) -
      (206.835 - 1.015 * 2.5 - 84.6 * 1.0)) < 1e-12)
  }

  test("readability: a terminator-free doc floors at one sentence; an " +
      "all-consonant token still counts a syllable via the word clamp") {
    import spark.implicits._
    val docs = Seq(("s1", "xyz pqrst")).toDF("source", "text")
    val r = TextAnalysis.readability(docs, "text", "source").collect().head
    assert(r.getLong(3) == 1L, "floored sentence count")
    assert(r.getLong(4) == 2L, "clamped syllables = word count")
  }
}
