package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical language-model quality signals for corpus curation — the
  * CCNet / DSIR family of filters: score every document against a trained
  * reference distribution, keep the fluent / on-target tail.
  * (North-star extension surface; reference analogue: the per-row
  * text-scoring shape of
  * /root/reference/diagnostic_group_pipeline_with_api.py:131.)
  *
  * Cross-engine determinism: no `ln`/`exp` anywhere (libm last-ulp drift
  * would break the DuckDB hash gate). The fluency score is the MEAN
  * IN-CONTEXT BIGRAM PROBABILITY — a monotone stand-in for (inverse)
  * perplexity built from integer counts and IEEE-exact double division —
  * and the DSIR signal is a linear probability contrast rather than a
  * log-likelihood ratio. Every per-token addend is cast to a wide decimal
  * before summing, so aggregation order can never change the result.
  *
  * Plan shape at 100 TB: the models are TINY relative to the corpus — a
  * min-count-capped bigram table and a 65536-row bucket histogram — so
  * both scoring joins are explicit broadcasts; the corpus itself is
  * touched by one explode + one per-doc re-aggregation (a shuffle keyed
  * by doc id, the unavoidable cost of a per-document statistic over
  * exploded tokens). Model TRAINING reads the reference subset only —
  * train on a hash-sample of the corpus (the [[Curation.hashBucket]]
  * seam) and the training aggregations never see the full data.
  */
object LmSignals {

  private def words(text: Column): Column = split(trim(text), "\\s+")

  /** Per-row (prefix, bigram) pairs as an array of structs: the word
    * array zipped against its own 1-shifted slice, so the text is split
    * ONCE per row (the [[TextAnalysis.topBigramFrac]] idiom — a
    * `transform`/`element_at` form would re-split per element). Blank
    * text yields `[""]` whose lone slot pairs with the null pad and is
    * filtered out — zero bigrams, matching the SQL `generate_series(1,
    * len-1)` restatement exactly.
    */
  private def bigramPairs(text: Column): Column = {
    val w = words(text)
    filter(
      zip_with(w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
        (a, b) => struct(a.as("prefix"), concat(a, lit(" "), b).as("big"))),
      x => x.getField("big").isNotNull)
  }

  /** Add-one-smoothed bigram LM fluency score (CCNet-shaped quality
    * filter): train bigram and unigram counts on `ref` (the clean
    * reference subset — in-language Wikipedia in CCNet; here any
    * filtered/sampled relation), then score each document by the mean
    * probability its bigrams receive under the model,
    *
    *   p(b | a) = (C2(a b) + 1) / (C1(a) + V)
    *
    * with `C2` kept only above `minCount` (the df-cap idiom: the model
    * stays bounded no matter how large the reference is — rare bigrams
    * contribute through the smoothing floor alone) and `V` = reference
    * vocabulary size. Unseen prefixes get the pure smoothing floor
    * `1 / V`. Fluent in-distribution text scores high; gibberish and
    * out-of-language text sink to the floor.
    *
    * Output: (id, n_bigrams, lm_score), one row per input document;
    * documents with no bigrams score 0 by convention.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    ref: DataFrame, refTextCol: String,
                    minCount: Long = 2L): DataFrame = {
    val uni = ref
      .select(explode(words(col(refTextCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
    // vocab size as a 1-row relation (kept in-plan, not collected)
    val vocab = uni.agg(count(lit(1)).as("__v"))
    val bi = ref
      .select(explode(bigramPairs(col(refTextCol))).as("__p"))
      .select(col("__p.big").as("__big"))
      .groupBy("__big").agg(count(lit(1)).as("__c2"))
      .filter(col("__c2") >= minCount)

    val docBigrams = docs
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("__p"))
      .select(col(idCol), col("__p.prefix").as("__prefix"),
        col("__p.big").as("__big"))

    // guard the V = 0 degenerate case (EMPTY reference): Spark's
    // non-ANSI divide-by-zero yields NULL, which would surface as
    // lm_score = NULL (not the documented 0) and silently fail every
    // downstream `>= tau` filter — an empty model scores everything 0
    val pRaw = (coalesce(col("__c2"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("__c1"), lit(0L)) + col("__v")).cast("double")
    val p = when(col("__v") > 0, pRaw).otherwise(lit(0.0))
    val joined = docBigrams
      .join(broadcast(bi.withColumnRenamed("__big", "__mbig")),
        col("__big") === col("__mbig"), "left")
      .join(broadcast(uni.withColumnRenamed("__w", "__mw")),
        col("__prefix") === col("__mw"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bigrams"),
        (sum(p.cast(DecimalType(38, 14))).cast("double") / count(lit(1)))
          .as("lm_score"))
    docs.select(col(idCol))
      .join(joined, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): split
    * the corpus into HEAD / MIDDLE / TAIL terciles by LM quality score —
    * the partition CCNet publishes and most pretraining recipes consume
    * (train on head+middle, hold tail for ablations). Scores come from
    * [[bigramLmScore]] (higher = more fluent, so head = high score).
    *
    * The tercile THRESHOLDS are computed on a BOUNDED deterministic
    * sample, the way CCNet itself fits its percentiles on a sample per
    * language: the `sampleK` documents with the smallest md5(id) — an
    * `orderBy(md5).limit(k)` = TakeOrderedAndProject, so exactly k rows
    * ever reach the driver no matter the corpus size — are collected,
    * and the scores at ranks ⌈k/3⌉ and ⌈2k/3⌉ (descending) become the
    * head/middle cut values, embedded as literals in ONE narrow
    * assignment projection over the scored corpus. Nothing global-sorts;
    * the k-th VALUE is tie-insensitive, so the thresholds are a pure
    * function of the corpus. Documents scoring exactly a threshold land
    * in the better bucket (≥ comparisons).
    *
    * Output: (id, n_bigrams, lm_score, bucket ∈ {head, middle, tail}).
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   ref: DataFrame, refTextCol: String,
                   minCount: Long = 2L, sampleK: Int = 999): DataFrame = {
    require(sampleK >= 3, "need at least 3 sampled docs for terciles")
    // cached: feeds the threshold sample AND the assignment pass — the
    // model build + scoring joins run once, not twice
    val scored = graft.core.Caches.track(
      bigramLmScore(docs, idCol, textCol, ref, refTextCol, minCount))
    val sample = scored
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(sampleK)
      .select(col("lm_score"))
      .collect().map(_.getDouble(0))
      .sorted(Ordering[Double].reverse)
    val m = sample.length
    if (m == 0)
      // empty corpus: empty result, schema intact
      return scored.select(col(idCol), col("n_bigrams"), col("lm_score"),
        lit("tail").as("bucket")).filter(lit(false))
    val tHi = sample((m + 2) / 3 - 1)      // score at rank ⌈m/3⌉ desc
    val tLo = sample((2 * m + 2) / 3 - 1)  // score at rank ⌈2m/3⌉ desc
    scored.select(col(idCol), col("n_bigrams"), col("lm_score"),
      when(col("lm_score") >= tHi, lit("head"))
        .when(col("lm_score") >= tLo, lit("middle"))
        .otherwise(lit("tail")).as("bucket"))
  }

  /** DSIR-shaped importance signal (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): represent every word by
    * a HASHED feature bucket ([[Curation.hashBucket]], 65536 buckets —
    * fixed model size regardless of vocabulary), estimate the bucket
    * distribution of a TARGET subset and of the RAW corpus, and score
    * each document by the mean per-word probability contrast
    *
    *   score(d) = (1/|d|) · Σ_w  (p_target[b(w)] − p_raw[b(w)])
    *
    * — a linear discriminant toward the target distribution (the paper
    * uses the log-ratio; the difference form ranks near-identically and
    * is bit-portable, see the object doc). Positive ⇒ the document looks
    * more like the target than the background; selection = top fraction
    * by score.
    *
    * Output: (id, n_words, dsir_score) for every input document; empty
    * documents score 0.
    */
  def dsirContrast(docs: DataFrame, idCol: String, textCol: String,
                   targetFilter: Column): DataFrame = {
    val tok = docs
      .select(col(idCol), targetFilter.as("__is_t"),
        explode(words(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .withColumn("__b", Curation.hashBucket(col("__w")))
    // one pass builds both histograms: conditional counts per bucket
    val hist = tok.groupBy("__b").agg(
      sum(when(col("__is_t"), 1L).otherwise(0L)).as("__ct"),
      count(lit(1)).as("__cr"))
    val totals = hist.agg(
      coalesce(sum("__ct"), lit(0L)).as("__tt"),
      coalesce(sum("__cr"), lit(0L)).as("__tr"))
    // a zero total (targetFilter matched nothing / empty corpus) must
    // contribute 0, not a NULL divide-by-zero that nulls every score
    val contrast = hist.crossJoin(totals).select(
      col("__b").as("__mb"),
      (when(col("__tt") > 0, col("__ct").cast("double") / col("__tt"))
        .otherwise(lit(0.0)) -
        when(col("__tr") > 0, col("__cr").cast("double") / col("__tr"))
          .otherwise(lit(0.0))).as("__diff"))
    val scored = tok
      .join(broadcast(contrast), col("__b") === col("__mb"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_words"),
        (sum(col("__diff").cast(DecimalType(38, 14))).cast("double") /
          count(lit(1))).as("dsir_score"))
    docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("dsir_score"), lit(0.0)).as("dsir_score"))
  }

  /** Corpus-level collocation mining: the top-k adjacent word pairs by
    * pointwise mutual information, in the LOG-FREE ratio form
    *
    *   pmi_ratio(x y) = C2(x y)·N / (C1(x)·C1(y)),  N = corpus bigram total
    *
    * — proportional to `p(x y) / (p(x)·p(y))` with a corpus-constant
    * factor, i.e. monotone in classic log PMI, so the top-k ranking is
    * identical while the score stays pure IEEE multiplication/division
    * (see the object doc on libm). `minCount` is the standard low-frequency
    * guard: a pair seen twice in a 10¹²-token corpus gets an enormous
    * ratio by chance; collocation mining always thresholds raw count
    * first (Church & Hanks 1990).
    *
    * Plan shape at 100 TB: bigram and unigram counts are both map-side-
    * combined aggregates over one explode each; the `minCount` filter
    * shrinks the bigram relation BEFORE its two unigram joins, and the
    * final top-k is `orderBy().limit(k)` = TakeOrderedAndProject (never
    * a global sort). Counts multiply as doubles (`C2·N` at corpus scale
    * overflows int64 — 10¹²·10¹² — so both factors cast first).
    */
  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999 §2.7) — the smoother inside KenLM, i.e. the
    * LM the REAL CCNet pipeline scores with (where [[bigramLmScore]]
    * is the add-one teaching version). Absolute discount D off every
    * seen bigram, with the freed mass backing off to the CONTINUATION
    * distribution — how many distinct contexts a word FOLLOWS, not how
    * often it occurs (the "San Francisco" correction: "Francisco" is
    * frequent but follows only "San", so its unigram backoff weight is
    * tiny):
    *
    *   P_KN(w2|w1) = (c(w1 w2) − D)/c(w1·)
    *               + [D · N1+(w1 ·)/c(w1·)] · [N1+(· w2)/N1+(· ·)]
    *
    * Everything derives from ONE pair histogram: c(w1·) = Σ_w2 counts,
    * N1+(w1 ·) = distinct followers, N1+(· w2) = distinct predecessors,
    * N1+(· ·) = distinct bigram types. No logs — each probability is a
    * fixed-shape chain of IEEE ops over exact integer counts (the
    * object-doc libm rule), so the oracle restates it symbol-for-symbol.
    *
    * Plan: one corpus explode → cached vocab²-bounded pair histogram;
    * the three aggregates are map-side-combined regroupings of that
    * histogram, never the corpus; top-k is TakeOrderedAndProject and
    * the stat joins run against the k-row broadcast side.
    *
    * @return the `topK` bigrams by (count desc, bigram): (bigram,
    *         pair_count, prefix_count, lambda = the backoff weight of
    *         w1, p_cont = the continuation probability of w2, p_kn).
    */
  def kneserNeyBigrams(ref: DataFrame, textCol: String,
                       discount: Double = 0.75, topK: Int = 30): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1): $discount")
    val pairs = graft.core.Caches.track(
      ref.select(explode(bigramPairs(col(textCol))).as("__p"))
        .select(col("__p.prefix").as("__w1"), col("__p.big").as("big"))
        .withColumn("__w2",
          expr("substring(big, length(__w1) + 2, length(big))"))
        .groupBy("big", "__w1", "__w2")
        .agg(count(lit(1)).as("pair_count")))
    val byPrefix = pairs.groupBy(col("__w1")).agg(
      sum(col("pair_count")).as("__c1"),
      count(lit(1)).as("__n1f"))
    val byFollower = pairs.groupBy(col("__w2")).agg(
      count(lit(1)).as("__n1p"))
    val types = pairs.agg(count(lit(1)).as("__n1a"))
    val top = pairs
      .orderBy(col("pair_count").desc, col("big").asc)
      .limit(topK)
    val d = lit(discount)
    top
      .join(byPrefix, Seq("__w1"))
      .join(byFollower, Seq("__w2"))
      .crossJoin(broadcast(types))
      .withColumn("lambda",
        d * col("__n1f").cast("double") / col("__c1").cast("double"))
      .withColumn("p_cont",
        col("__n1p").cast("double") / col("__n1a").cast("double"))
      .select(col("big").as("bigram"), col("pair_count"),
        col("__c1").as("prefix_count"), col("lambda"), col("p_cont"),
        ((col("pair_count").cast("double") - d) /
          col("__c1").cast("double") +
          col("lambda") * col("p_cont")).as("p_kn"))
      .orderBy(col("pair_count").desc, col("bigram").asc)
  }

  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Long, topK: Int): DataFrame = {
    val pairs = docs
      .select(explode(bigramPairs(col(textCol))).as("__p"))
      .select(col("__p.prefix").as("__w1"), col("__p.big").as("big"))
      // second word = the bigram minus "prefix + space" (prefix can be
      // empty for leading whitespace; substring handles both)
      .withColumn("__w2",
        expr("substring(big, length(__w1) + 2, length(big))"))
    // ONE corpus pass builds the (vocab²-bounded, min-count-free) pair
    // histogram; cached so the grand total and the capped set both read
    // it instead of re-exploding the corpus
    val biAll = graft.core.Caches.track(
      pairs.groupBy("big", "__w1", "__w2")
        .agg(count(lit(1)).as("pair_count")))
    val bi = biAll.filter(col("pair_count") >= minCount)
    val uni = docs
      .select(explode(words(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c1"))
    val total = biAll.agg(sum("pair_count").as("__nbi"))
    bi.join(uni.select(col("__w").as("__m1"), col("__c1").as("__ca")),
        col("__w1") === col("__m1"))
      .join(uni.select(col("__w").as("__m2"), col("__c1").as("__cb")),
        col("__w2") === col("__m2"))
      .crossJoin(broadcast(total))
      .select(col("big").as("bigram"), col("pair_count"),
        col("__ca").as("w1_count"), col("__cb").as("w2_count"),
        ((col("pair_count").cast("double") * col("__nbi").cast("double")) /
          (col("__ca").cast("double") * col("__cb").cast("double")))
          .as("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("bigram").asc)
      .limit(topK)
  }
}
