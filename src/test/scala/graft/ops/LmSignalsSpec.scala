package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmSignalsSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the rug"),
    (3L, "the dog sat on the mat")).toDF("doc_id", "text")

  test("bigramLmScore: seen bigrams beat the smoothing floor; empty doc scores 0") {
    val docs = Seq(
      (10L, "the cat sat"),     // both bigrams seen >= minCount
      (11L, "zz qq"),           // unseen bigram, unseen prefix -> floor
      (12L, ""),                // no bigrams
      (13L, "onlyword")         // one word, no bigrams
    ).toDF("doc_id", "text")
    val got = LmSignals.bigramLmScore(docs, "doc_id", "text", ref, "text")
      .orderBy("doc_id").collect()
    // vocab of ref: the,cat,sat,on,mat,rug,dog = 7 distinct words
    val v = 7.0
    // "the cat": c2=2 (docs 1,2), c1(the)=6; "cat sat": c2=2, c1(cat)=2
    val expect10 = ((2 + 1) / (6 + v) + (2 + 1) / (2 + v)) / 2
    assert(math.abs(got(0).getDouble(2) - expect10) < 1e-12)
    assert(got(0).getLong(1) == 2)
    // floor: (0+1)/(0+7)
    assert(math.abs(got(1).getDouble(2) - 1.0 / v) < 1e-12)
    assert(got(2).getLong(1) == 0 && got(2).getDouble(2) == 0.0)
    assert(got(3).getLong(1) == 0 && got(3).getDouble(2) == 0.0)
  }

  test("bigramLmScore: minCount cap drops rare bigrams to the smoothed path") {
    // "dog sat" appears once in ref -> capped out at minCount=2, so a doc
    // made of it scores (0+1)/(c1(dog)+V), not (1+1)/(...)
    val docs = Seq((20L, "dog sat")).toDF("doc_id", "text")
    val got = LmSignals.bigramLmScore(docs, "doc_id", "text", ref, "text",
      minCount = 2L).collect()(0)
    assert(math.abs(got.getDouble(2) - 1.0 / (1 + 7)) < 1e-12)
    val gotUncapped = LmSignals.bigramLmScore(docs, "doc_id", "text", ref,
      "text", minCount = 1L).collect()(0)
    assert(math.abs(gotUncapped.getDouble(2) - 2.0 / (1 + 7)) < 1e-12)
  }

  test("bigramLmScore ranks fluent in-distribution text above shuffled text") {
    val docs = Seq(
      (30L, "the cat sat on the mat"),
      (31L, "mat the on sat cat the")).toDF("doc_id", "text")
    val scores = LmSignals.bigramLmScore(docs, "doc_id", "text", ref, "text")
      .orderBy("doc_id").collect().map(_.getDouble(2))
    assert(scores(0) > scores(1))
  }

  test("dsirContrast: target-heavy vocabulary scores positive, background negative") {
    // target docs use apple/banana; background uses xray/young; a doc of
    // target words must out-score a doc of background words
    val docs = Seq(
      (1L, "apple banana apple banana", true),
      (2L, "apple banana banana apple", true),
      (3L, "xray young xray young", false),
      (4L, "young xray young xray", false)).toDF("doc_id", "text", "is_t")
    val got = LmSignals.dsirContrast(docs, "doc_id", "text", col("is_t"))
      .orderBy("doc_id").collect()
    assert(got(0).getDouble(2) > 0 && got(1).getDouble(2) > 0)
    assert(got(2).getDouble(2) < 0 && got(3).getDouble(2) < 0)
    assert(got.forall(_.getLong(1) == 4))
  }

  test("dsirContrast: empty docs score 0 and are not dropped") {
    val docs = Seq((1L, "a b", true), (2L, "", false)).toDF("doc_id", "text", "t")
    val got = LmSignals.dsirContrast(docs, "doc_id", "text", col("t"))
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    assert(got(1).getLong(1) == 0 && got(1).getDouble(2) == 0.0)
  }

  test("ccnetBuckets: terciles split ~evenly, head holds the highest " +
      "scores, thresholds are sample-size-bounded and deterministic") {
    // 30 docs with clearly separable fluency: 10 fluent (reference
    // phrasing), 10 mixed, 10 gibberish
    val docs = ((0 until 10).map(i => (i.toLong, "the quick brown fox jumps")) ++
      (10 until 20).map(i => (i.toLong, "the quick zzz qqq vvv")) ++
      (20 until 30).map(i => (i.toLong, "zz qq vv xx yy")))
      .toDF("doc_id", "text")
    val ref = Seq.fill(5)("the quick brown fox jumps").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = LmSignals.ccnetBuckets(docs, "doc_id", "text", ref, "text",
        minCount = 1L, sampleK = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    val byBucket = got.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket("head") == (0L until 10L).toSet)
    assert(byBucket("middle") == (10L until 20L).toSet)
    assert(byBucket("tail") == (20L until 30L).toSet)
    // determinism: a second run lands identically
    val again = LmSignals.ccnetBuckets(docs, "doc_id", "text", ref, "text",
        minCount = 1L, sampleK = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // a SMALL sample still yields valid thresholds (every doc bucketed)
    val sampled = LmSignals.ccnetBuckets(docs, "doc_id", "text", ref, "text",
        minCount = 1L, sampleK = 9)
      .collect().map(_.getString(3)).toSet
    assert(sampled.subsetOf(Set("head", "middle", "tail")))
    // empty corpus: empty result, schema intact
    assert(LmSignals.ccnetBuckets(docs.filter($"doc_id" < 0), "doc_id",
      "text", ref, "text", 1L, 30).isEmpty)
  }

  test("scoring joins broadcast (model side never shuffles the corpus twice)") {
    val docs = Seq((1L, "the cat sat", "en")).toDF("doc_id", "text", "lang")
    val plan = LmSignals.bigramLmScore(docs, "doc_id", "text", docs, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("kneserNeyBigrams: hand-computed KN probabilities on a tiny " +
      "corpus (continuation counts, not raw frequency)") {
    // bigrams: "a b"x2, "b a"x2, "a c"x1
    // c1(a)=3, c1(b)=2; N1+(a ·)=2, N1+(b ·)=1
    // N1+(· b)=1, N1+(· a)=1, N1+(· c)=1; N1+(· ·)=3
    val docs = Seq(Tuple1("a b a b a c")).toDF("text")
    val got = LmSignals.kneserNeyBigrams(docs, "text", discount = 0.75,
        topK = 10)
      .collect().map(r => r.getAs[String]("bigram") ->
        ((r.getAs[Long]("pair_count"), r.getAs[Long]("prefix_count"),
          r.getAs[Double]("lambda"), r.getAs[Double]("p_cont"),
          r.getAs[Double]("p_kn")))).toMap
    assert(got.keySet == Set("a b", "b a", "a c"))
    def pkn(c2: Double, c1: Double, n1f: Double, n1p: Double): Double =
      (c2 - 0.75) / c1 + (0.75 * n1f / c1) * (n1p / 3.0)
    assert(got("a b") == ((2L, 3L, 0.75 * 2.0 / 3.0, 1.0 / 3.0,
      pkn(2, 3, 2, 1))), s"${got("a b")}")
    assert(got("b a") == ((2L, 2L, 0.75 * 1.0 / 2.0, 1.0 / 3.0,
      pkn(2, 2, 1, 1))), s"${got("b a")}")
    assert(got("a c") == ((1L, 3L, 0.75 * 2.0 / 3.0, 1.0 / 3.0,
      pkn(1, 3, 2, 1))), s"${got("a c")}")
    // the KN property: P is a proper conditional — discounted direct
    // mass + backoff mass ≤ 1 per prefix (sums over SEEN followers)
    val seenA = got("a b")._5 + got("a c")._5
    assert(seenA > 0 && seenA <= 1.0, s"mass over seen followers: $seenA")
  }
}
