package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // the Sennrich-paper-style fixture: low x3, lower x2, newest x1
  private def corpus = Seq(
    (1L, "low low low"),
    (2L, "lower lower newest")).toDF("doc_id", "text")

  test("learnMerges reproduces the hand-computed merge sequence") {
    val got = BpeTrain.learnMerges(corpus, "text", 4)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toSeq
    // pairs: (l,o)=5 ties (o,w)=5 -> lexicographic left wins; then
    // (lo,w)=5; then (low,e)=2 ties (e,r)=2 -> 'e' < 'low'; then (low,er)=2
    assert(got == Seq(
      (1L, "l", "o", 5L),
      (2L, "lo", "w", 5L),
      (3L, "e", "r", 2L),
      (4L, "low", "er", 2L)))
  }

  test("learnMerges stops early when the vocabulary runs out of pairs") {
    val tiny = Seq((1L, "a b c")).toDF("doc_id", "text")
    // single-char words have no adjacent pairs at all
    assert(BpeTrain.learnMerges(tiny, "text", 5).isEmpty)
    // one two-char word yields exactly one merge, then exhaustion
    val one = Seq((1L, "ab")).toDF("doc_id", "text")
    val m = BpeTrain.learnMerges(one, "text", 5).collect()
    assert(m.length == 1 && m(0).getString(1) == "a" && m(0).getString(2) == "b")
  }

  test("1,000+ merges: driver-local learning, Spark jobs don't scale with merge budget") {
    // a synthetic vocabulary rich enough to sustain >1000 merges: 3000
    // distinct 12-char words (deterministic digits of a hash-free LCG)
    val rnd = new scala.util.Random(42)
    val words = (0 until 3000).map(_ =>
      (0 until 12).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).distinct
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val got = BpeTrain.learnMerges(docs, "text", 1000)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect()
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    assert(got.length == 1000)
    assert(got.map(_._1).toSeq == (1L to 1000L)) // contiguous steps
    assert(got.forall(_._4 > 0))
    // the r6 formulation ran >= 1 job per merge (1000+); the corpus
    // pass plus the final toDF collect is a small constant
    assert(jobs <= 10, s"expected O(1) Spark jobs, saw $jobs")
    // pure function of the corpus: a re-run reproduces the sequence
    val again = BpeTrain.learnMerges(docs, "text", 1000)
      .orderBy("step").as[(Long, String, String, Long)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("maxVocab cap: enforced top-M by frequency, merges unchanged above head") {
    // the cap keeps only the M most frequent words (freq desc, word asc):
    // at maxVocab=1 only "low" (x3) survives, so the learned merges come
    // from "low" alone — (l,o)=3 then (lo,w)=3, and nothing after
    val capped = BpeTrain.learnMerges(corpus, "text", 4, maxVocab = 1)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(capped == Seq((1L, "l", "o", 3L), (2L, "lo", "w", 3L)))
    // a cap wider than the vocabulary changes nothing vs the default
    val wide = BpeTrain.learnMerges(corpus, "text", 4, maxVocab = 100)
      .orderBy("step").as[(Long, String, String, Long)].collect().toSeq
    val default = BpeTrain.learnMerges(corpus, "text", 4)
      .orderBy("step").as[(Long, String, String, Long)].collect().toSeq
    assert(wide == default)
    // the collect itself is bounded by code, not corpus shape
    assert(BpeTrain.collectWordFreq(corpus, "text", maxVocab = 2).length == 2)
  }

  test("encode applies merges in training order; unseen words stay chars") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"))
    val docs = Seq((7L, "low lower lowest zap")).toDF("doc_id", "text")
    val got = BpeTrain.encode(docs, "doc_id", "text", merges)
      .orderBy("word_pos")
      .select(array_join(col("pieces"), "|"))
      .as[String].collect().toSeq
    assert(got == Seq("low", "lower", "low|e|s|t", "zap".split("").mkString("|")))
  }

  test("encode: dictionary path (large merge tables) equals the chain path") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"))
    val docs = Seq((1L, "low lower lowest"), (2L, "newest low")).toDF("doc_id", "text")
    val chain = BpeTrain.encode(docs, "doc_id", "text", merges)
    val dict = BpeTrain.encode(docs, "doc_id", "text", merges, chainLimit = 2)
    assert(dict.exceptAll(chain).isEmpty && chain.exceptAll(dict).isEmpty)
  }

  test("encode plan is shuffle-free (scan-stage projection)") {
    val docs = Seq((1L, "low")).toDF("doc_id", "text")
    val plan = BpeTrain.encode(docs, "doc_id", "text", Seq(("l", "o")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("vocab: piece inventory with frequency-weighted counts") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"))
    val got = BpeTrain.vocab(corpus, "text", merges)
      .as[(String, Long)].collect().toMap
    // low x3 stays whole; lower x2 fully merges; newest stays chars
    assert(got == Map("low" -> 3L, "lower" -> 2L, "n" -> 1L, "e" -> 2L,
      "w" -> 1L, "s" -> 1L, "t" -> 1L))
  }

  test("property: train->encode roundtrip never loses characters") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val textGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val texts = (0 until 40)
      .flatMap(i => textGen(Gen.Parameters.default, Seed(i.toLong)))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = BpeTrain.learnMerges(docs, "text", 6)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // concatenating a word's pieces must reproduce the word exactly,
    // and no piece may be empty — merges reorganize, never destroy
    val words = docs.select(col("doc_id"), posexplode(
        filter(split(trim(col("text")), "\\s+"), w => w =!= ""))
        .as(Seq("word_pos", "__w")))
      .withColumn("word_pos", col("word_pos").cast("long"))
    val bad = BpeTrain.encode(docs, "doc_id", "text", merges)
      .join(words, Seq("doc_id", "word_pos"))
      .filter(concat_ws("", col("pieces")) =!= col("__w") ||
        exists(col("pieces"), p => p === ""))
    assert(bad.isEmpty, bad.collect().take(3).mkString("\n"))
  }
}
