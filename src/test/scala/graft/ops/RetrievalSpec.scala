package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "apple cherry cherry date"),
    (10L, "banana banana banana"), // tf-heavy, shorter than avg matters
    (4L, "")).toDF("doc_id", "text")

  test("invertedIndex: sorted postings, set semantics, df-cap drops stopwords") {
    val idx = Retrieval.invertedIndex(corpus, "doc_id", "text", maxDf = 2L)
      .orderBy("term").collect()
    // banana (df 3) and apple/cherry? apple in docs 1,3 (df 2), banana in
    // 1,2,10 (df 3 -> dropped), cherry in 2,3 (df 2), date in 3 (df 1)
    assert(idx.map(_.getString(0)).toSeq == Seq("apple", "cherry", "date"))
    val apple = idx.find(_.getString(0) == "apple").get
    assert(apple.getLong(1) == 2L && apple.getString(2) == "1,3")
    // doc 3 has cherry TWICE but posts once (distinct pair semantics)
    assert(idx.find(_.getString(0) == "cherry").get.getString(2) == "2,3")
  }

  test("invertedIndex: ids sort numerically, not lexically") {
    val docs = Seq((2L, "zebra"), (10L, "zebra"))
      .toDF("doc_id", "text")
    val got = Retrieval.invertedIndex(docs, "doc_id", "text", 10L).collect()
    assert(got(0).getString(2) == "2,10") // "10,2" would be the lexical bug
  }

  test("bm25: rare term outranks common term; tf saturates; topK holds") {
    val hit = Retrieval.bm25(corpus, "doc_id", "text",
      Seq("date", "banana"), topK = 10).collect()
    // 'date' (df 1) has far higher idf than 'banana' (df 3): doc 3 wins
    assert(hit.head.getLong(0) == 3L)
    assert(hit.head.getLong(1) == 1L)
    // scores strictly ordered desc, ties impossible in this fixture
    val scores = hit.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    // every returned doc matched at least one query term
    assert(hit.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 3L, 10L)))
    val top1 = Retrieval.bm25(corpus, "doc_id", "text",
      Seq("date", "banana"), topK = 1).collect()
    assert(top1.length == 1 && top1.head.getLong(0) == 3L)
  }

  test("bm25: k1 saturation — tf 3 in a short doc beats tf 1 but not 3x") {
    val got = Retrieval.bm25(corpus, "doc_id", "text", Seq("banana"), 10)
      .collect()
    val byDoc = got.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byDoc(10L) > byDoc(2L)) // tf 3 > tf 1 (both short docs)
    assert(byDoc(10L) < 3 * byDoc(2L)) // saturation, not linear in tf
  }

  test("bm25 plan: df dimension broadcasts and top-k avoids a global sort") {
    val plan = Retrieval.bm25(corpus, "doc_id", "text", Seq("banana"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("bm25FromIndex is bit-identical to the corpus-scan bm25") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_idx_spec").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", path)
    val served = Retrieval.bm25FromIndex(spark, path, "doc_id",
      Seq("date", "banana"), topK = 10)
    val scanned = Retrieval.bm25(corpus, "doc_id", "text",
      Seq("date", "banana"), topK = 10)
    assert(served.collect().toSeq == scanned.collect().toSeq)
  }

  test("appendToIndex: incremental build serves identically to a full " +
      "build, and batch retries (the crash story) are idempotent") {
    val half1 = corpus.filter($"doc_id" <= 2)
    val half2 = corpus.filter($"doc_id" > 2)
    val inc = java.nio.file.Files
      .createTempDirectory("graft_bm25_inc_spec").toString
    Retrieval.writeIndex(half1, "doc_id", "text", inc)
    Retrieval.appendToIndex(half2, "doc_id", "text", inc, batchId = 1L)
    val full = java.nio.file.Files
      .createTempDirectory("graft_bm25_full_spec").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", full)
    val b = Retrieval.bm25FromIndex(spark, full, "doc_id",
      Seq("date", "banana"), 10).collect().toSeq
    def served = Retrieval.bm25FromIndex(spark, inc, "doc_id",
      Seq("date", "banana"), 10).collect().toSeq
    assert(served == b, "incrementally-maintained index must serve identically")
    // crash-retry: simulate a failure after postings committed but
    // before stats (delete the batch's stats subdir), then retry the
    // SAME batch id — the overwrite-by-subdir layout heals it with no
    // duplicate postings and no double-counted stats
    val fs = new org.apache.hadoop.fs.Path(inc)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(inc + "/stats/batch=1"), true)
    Retrieval.appendToIndex(half2, "doc_id", "text", inc, batchId = 1L)
    assert(served == b, "a retried batch must heal the crash, not duplicate")
    // full double-retry (both subdirs already committed) is also a no-op
    Retrieval.appendToIndex(half2, "doc_id", "text", inc, batchId = 1L)
    assert(served == b)
  }

  test("an uncommitted batch (crash before the commit marker) is invisible " +
      "to readers until its retry") {
    val half1 = corpus.filter($"doc_id" <= 2)
    val half2 = corpus.filter($"doc_id" > 2)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_marker_spec").toString
    Retrieval.writeIndex(half1, "doc_id", "text", path)
    val before = Retrieval.bm25FromIndex(spark, path, "doc_id",
      Seq("banana"), 10).collect().toSeq
    Retrieval.appendToIndex(half2, "doc_id", "text", path, batchId = 1L)
    // simulate a crash BETWEEN the postings/stats writes and the marker:
    // postings + stats exist but the batch was never marked committed
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/commits/batch_1"), false)
    val crashed = Retrieval.bm25FromIndex(spark, path, "doc_id",
      Seq("banana"), 10).collect().toSeq
    assert(crashed == before,
      "an unmarked batch must not leak postings or stats into serving")
    // the retry re-marks it and the batch becomes fully visible
    Retrieval.appendToIndex(half2, "doc_id", "text", path, batchId = 1L)
    val full = java.nio.file.Files
      .createTempDirectory("graft_bm25_marker_full").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", full)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", Seq("banana"), 10)
      .collect().toSeq ==
      Retrieval.bm25FromIndex(spark, full, "doc_id", Seq("banana"), 10)
        .collect().toSeq)
  }

  test("deleteFromIndex serves identically to a rebuild without the " +
      "deleted docs; nonexistent and repeated deletes are harmless") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_del_spec").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", path)
    Retrieval.deleteFromIndex(Seq(3L, 99L).toDF("doc_id"), "doc_id", path,
      batchId = 1L)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_bm25_del_rebuild").toString
    Retrieval.writeIndex(corpus.filter($"doc_id" =!= 3), "doc_id", "text",
      rebuilt)
    def terms = Seq("date", "banana", "cherry")
    def served = Retrieval.bm25FromIndex(spark, path, "doc_id", terms, 10)
      .collect().toSeq
    val want = Retrieval.bm25FromIndex(spark, rebuilt, "doc_id", terms, 10)
      .collect().toSeq
    assert(served == want,
      "tombstoned serve must equal a rebuild without the deleted docs " +
        "(df, avgdl and N all shift)")
    assert(!served.exists(_.getLong(0) == 3L))
    // re-deleting an already-deleted id in a NEW batch must not subtract
    // its length twice from the corpus stats
    Retrieval.deleteFromIndex(Seq(3L).toDF("doc_id"), "doc_id", path,
      batchId = 2L)
    assert(served == want, "double delete must dedupe in the stats")
    // phrase serving honors tombstones too
    assert(Retrieval.phraseFromIndex(spark, path, "doc_id",
      Seq("cherry", "cherry")).collect().isEmpty) // doc 3 was the only match
  }

  test("as-of time travel replays the true prefix of index history " +
      "through appends, deletes and compaction") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_asof_spec").toString
    val half1 = corpus.filter($"doc_id" <= 2)
    val half2 = corpus.filter($"doc_id" > 2)
    Retrieval.writeIndex(half1, "doc_id", "text", path)       // batch 0
    Retrieval.appendToIndex(half2, "doc_id", "text", path, 1L) // batch 1
    Retrieval.deleteFromIndex(Seq(3L).toDF("doc_id"), "doc_id", path, 2L)
    Retrieval.compactIndex(spark, path, "doc_id", newBatchId = 3L)
    def terms = Seq("date", "banana", "cherry")
    def fresh(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
      val p = java.nio.file.Files
        .createTempDirectory("graft_bm25_asof_ref").toString
      Retrieval.writeIndex(df, "doc_id", "text", p)
      Retrieval.bm25FromIndex(spark, p, "doc_id", terms, 10).collect().toSeq
    }
    def asOf(b: Long) = Retrieval.bm25FromIndex(spark, path, "doc_id",
      terms, 10, asOf = b).collect().toSeq
    assert(asOf(0L) == fresh(half1), "as-of batch 0 = the initial build")
    assert(asOf(1L) == fresh(corpus), "as-of batch 1 = after the append")
    assert(asOf(2L) == fresh(corpus.filter($"doc_id" =!= 3)),
      "as-of batch 2 = after the delete")
    assert(asOf(3L) == asOf(Long.MaxValue),
      "as-of the compaction = the current serve")
  }

  test("deleting a ZERO-WORD doc still decrements N/avgdl (marker-row " +
      "tombstones), before and after compaction") {
    // doc 4 has empty text: it is counted in n_docs but owns no postings
    // rows — only its null-term marker row lets a delete find its (id,
    // dl) pair. Without the marker, N stays one too high forever and
    // every idf/avgdl drifts from the rebuild.
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_zeroword").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", path)
    Retrieval.deleteFromIndex(Seq(4L).toDF("doc_id"), "doc_id", path, 1L)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_bm25_zeroword_rebuild").toString
    Retrieval.writeIndex(corpus.filter($"doc_id" =!= 4), "doc_id", "text",
      rebuilt)
    def terms = Seq("date", "banana")
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", terms, 10)
      .collect().toSeq ==
      Retrieval.bm25FromIndex(spark, rebuilt, "doc_id", terms, 10)
        .collect().toSeq,
      "deleting a zero-word doc must shift N and avgdl exactly like a " +
        "rebuild without it")
    // marker rows survive compaction: compact FIRST, then delete the
    // zero-word doc out of the compacted batch
    val path2 = java.nio.file.Files
      .createTempDirectory("graft_bm25_zeroword2").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", path2)
    Retrieval.compactIndex(spark, path2, "doc_id", newBatchId = 1L)
    Retrieval.vacuumIndex(spark, path2)
    Retrieval.deleteFromIndex(Seq(4L).toDF("doc_id"), "doc_id", path2, 2L)
    assert(Retrieval.bm25FromIndex(spark, path2, "doc_id", terms, 10)
      .collect().toSeq ==
      Retrieval.bm25FromIndex(spark, rebuilt, "doc_id", terms, 10)
        .collect().toSeq,
      "compaction must preserve marker rows, or post-compaction deletes " +
        "of zero-word docs silently stop adjusting the stats")
  }

  test("deleteFromIndex crash/retry: unmarked tombstones are invisible; " +
      "the retry heals; a committed retry is a no-op") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_del_crash").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", path)
    val before = Retrieval.bm25FromIndex(spark, path, "doc_id",
      Seq("banana"), 10).collect().toSeq
    Retrieval.deleteFromIndex(Seq(2L).toDF("doc_id"), "doc_id", path, 1L)
    val after = Retrieval.bm25FromIndex(spark, path, "doc_id",
      Seq("banana"), 10).collect().toSeq
    assert(after != before)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash simulation: tombstones written but the marker never made it
    fs.delete(new org.apache.hadoop.fs.Path(path + "/commits/del_1"), false)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", Seq("banana"), 10)
      .collect().toSeq == before,
      "unmarked tombstones must not be served")
    // retry of the same batch id heals
    Retrieval.deleteFromIndex(Seq(2L).toDF("doc_id"), "doc_id", path, 1L)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", Seq("banana"), 10)
      .collect().toSeq == after)
    // a retry AFTER commit must be a no-op — recomputing the delta would
    // see doc 2 already filtered and overwrite a correct batch with an
    // empty one
    Retrieval.deleteFromIndex(Seq(2L).toDF("doc_id"), "doc_id", path, 1L)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", Seq("banana"), 10)
      .collect().toSeq == after)
  }

  test("compactIndex + vacuumIndex: one batch replaces appends and " +
      "tombstones, serving unchanged; crash before the marker keeps the " +
      "old state; vacuum sweeps only superseded units") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_compact_spec").toString
    Retrieval.writeIndex(corpus.filter($"doc_id" <= 2), "doc_id", "text", path)
    Retrieval.appendToIndex(corpus.filter($"doc_id" > 2), "doc_id", "text",
      path, batchId = 1L)
    Retrieval.deleteFromIndex(Seq(2L).toDF("doc_id"), "doc_id", path, 2L)
    def terms = Seq("date", "banana", "cherry")
    val want = Retrieval.bm25FromIndex(spark, path, "doc_id", terms, 10)
      .collect().toSeq
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash: compacted postings+stats written, supersede marker never
    // renamed into place — readers stay on the old batch set
    Retrieval.compactIndex(spark, path, "doc_id", newBatchId = 3L)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/commits/compact_3"),
      false)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", terms, 10)
      .collect().toSeq == want, "uncommitted compaction must be invisible")
    // retry commits; serving flips to the single compacted batch,
    // bit-identically
    Retrieval.compactIndex(spark, path, "doc_id", newBatchId = 3L)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", terms, 10)
      .collect().toSeq == want)
    // committed retry is a no-op
    Retrieval.compactIndex(spark, path, "doc_id", newBatchId = 3L)
    // vacuum removes exactly the superseded units (batches 0, 1, del 2)
    assert(Retrieval.vacuumIndex(spark, path) == 3)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "/postings/batch=0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "/tombstones/batch=2")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path + "/postings/batch=3")))
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", terms, 10)
      .collect().toSeq == want, "post-vacuum serve must be unchanged")
    assert(Retrieval.vacuumIndex(spark, path) == 0, "vacuum is idempotent")
    // the compacted index keeps accepting appends and later compactions
    Retrieval.appendToIndex(
      Seq((7L, "banana date")).toDF("doc_id", "text"), "doc_id", "text",
      path, batchId = 4L)
    Retrieval.compactIndex(spark, path, "doc_id", newBatchId = 5L)
    Retrieval.vacuumIndex(spark, path)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_bm25_compact_rebuild").toString
    Retrieval.writeIndex(
      corpus.filter($"doc_id" =!= 2)
        .union(Seq((7L, "banana date")).toDF("doc_id", "text")),
      "doc_id", "text", rebuilt)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id", terms, 10)
      .collect().toSeq ==
      Retrieval.bm25FromIndex(spark, rebuilt, "doc_id", terms, 10)
        .collect().toSeq,
      "chained compactions must keep serving the rebuild-equivalent result")
  }

  test("empty-corpus index serves empty results instead of failing " +
      "schema inference") {
    val empty = corpus.filter($"doc_id" < 0)
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_empty_spec").toString
    Retrieval.writeIndex(empty, "doc_id", "text", path)
    assert(Retrieval.bm25FromIndex(spark, path, "doc_id",
      Seq("banana"), 10).isEmpty)
    assert(Retrieval.phraseFromIndex(spark, path, "doc_id",
      Seq("big", "data")).isEmpty)
  }

  test("phraseFromIndex plans ONE exchange after the postings scan, " +
      "independent of phrase length") {
    val docs = Seq(
      (1L, "a b c d e a b c d e"),
      (2L, "e d c b a")).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_phrase_plan_spec").toString
    Retrieval.writeIndex(docs, "doc_id", "text", path)
    for (phrase <- Seq(Seq("a", "b"), Seq("a", "b", "c", "d", "e"))) {
      val df = Retrieval.phraseFromIndex(spark, path, "doc_id", phrase)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).length
      assert(exchanges == 1, s"phrase $phrase planned $exchanges exchanges:\n$plan")
      assert(df.collect().nonEmpty)
    }
  }

  test("bm25FromIndex pushes the term filter into the postings scan") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_bm25_push_spec").toString
    Retrieval.writeIndex(corpus, "doc_id", "text", path)
    val plan = Retrieval.bm25FromIndex(spark, path, "doc_id",
      Seq("date", "banana"), 5).queryExecution.executedPlan.toString
    assert(plan.contains("In(term, [banana,date])"), plan)
  }

  test("phraseSearch: adjacency + order; counts overlapping occurrences") {
    val docs = Seq(
      (1L, "big data big data big"),  // "big data" twice, "data big" twice
      (2L, "data big"),               // reversed order only
      (3L, "big red data"),           // not adjacent
      (4L, "")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("big", "data")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L))
    val rev = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("data", "big")).as[(Long, Long)].collect().toMap
    assert(rev == Map(1L -> 2L, 2L -> 1L))
    // 3-word phrase, and a phrase longer than any doc matches nothing
    val tri = Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq("big", "data", "big")).as[(Long, Long)].collect().toMap
    assert(tri == Map(1L -> 2L))
    assert(Retrieval.phraseSearch(docs, "doc_id", "text",
      Seq.fill(9)("big")).isEmpty)
  }

  test("phraseFromIndex equals the corpus-scan phraseSearch, incl. " +
      "repeated-word phrases and single words") {
    val docs = Seq(
      (1L, "big data big data big"),
      (2L, "data big"),
      (3L, "big red data"),
      (4L, "solo")).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_phrase_idx_spec").toString
    Retrieval.writeIndex(docs, "doc_id", "text", path)
    for (phrase <- Seq(Seq("big", "data"), Seq("data", "big"),
        Seq("big", "data", "big"), Seq("solo"), Seq("missing", "words"))) {
      val scan = Retrieval.phraseSearch(docs, "doc_id", "text", phrase)
        .collect().toSet
      val idx = Retrieval.phraseFromIndex(spark, path, "doc_id", phrase)
        .collect().toSet
      assert(idx == scan, s"phrase $phrase: index $idx vs scan $scan")
    }
  }

  test("phraseSearch plan is shuffle-free") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = Retrieval.phraseSearch(docs, "doc_id", "text", Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pmiCollocations: collocated pair tops independent pairs; minCount guards") {
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, if (i % 2 == 0) "strong coffee please" else "strong tea please"))
      .toDF("doc_id", "text")
    val got = LmSignals.pmiCollocations(docs, "text", minCount = 2L, topK = 10)
      .collect()
    // 'coffee please' / 'tea please' bind tighter than 'strong coffee':
    // p(coffee)=p(tea)=10/60 vs p(strong)=20/60, same pair counts
    val top = got.head.getString(0)
    assert(top == "coffee please" || top == "tea please")
    // every surviving pair respects the count floor
    assert(got.forall(_.getLong(1) >= 2L))
    // minCount above any pair count -> empty
    assert(LmSignals.pmiCollocations(docs, "text", 21L, 10).isEmpty)
  }

  test("proximityFromIndex: min gap over occurrence pairs, both terms " +
      "required, adjacent beats distant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gap gap gap alpha"),  // min |posA-posB| = 1
      (2L, "beta x x x x x x alpha beta"),   // gaps 7 and 1 -> 1
      (3L, "alpha x x x beta"),              // gap 4
      (4L, "alpha only here"),               // missing beta: excluded
      (5L, "beta only here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_proxspec").toString + "/idx"
    Retrieval.writeIndex(docs, "doc_id", "text", dir)
    val got = Retrieval.proximityFromIndex(spark, dir, "doc_id",
        "alpha", "beta", k = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == ((2L, 1L, 1L, 0.5)))
    assert(got(2L) == ((1L, 2L, 1L, 0.5)))
    assert(got(3L) == ((1L, 1L, 4L, 0.2)))
  }

  test("ndcgMrrAtK: hand-computed nDCG and MRR on a tiny corpus") {
    // docs: 1 has both terms, 2 has one, 3 has none (padding so BM25
    // df/idf stay positive), 4 has one term twice
    val docs = Seq(
      (1L, "alpha beta alpha filler filler"),
      (2L, "alpha filler filler filler filler"),
      (3L, "filler filler filler filler filler"),
      (4L, "beta beta filler filler filler")).toDF("doc_id", "text")
    val r = Retrieval.ndcgMrrAtK(docs, "doc_id", "text",
      Seq("alpha", "beta"), k = 3, retrieveK = 4).head()
    val w = (1 to 3).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    // rels: d1=2, d2=1, d3=0, d4=1; BM25 must rank d1 first (both
    // terms), and only matching docs are retrieved, so the ranked
    // top-3 is {d1, d2, d4} in some order with d1 first.
    val dcgMax = 2.0 * w(0) + 1.0 * w(1) + 1.0 * w(2)
    assert(r.getAs[Double]("dcg") == dcgMax,
      s"d1 first, then the two rel-1 docs: $r")
    // ideal: rels sorted desc = 2,1,1 -> same value
    assert(r.getAs[Double]("idcg") == dcgMax)
    assert(r.getAs[Double]("ndcg") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0, "first ranked doc is relevant")
    assert(r.getAs[Long]("k") == 3L)
    // empty-relevance corpus: ndcg undefined (null), mrr 0
    val none = Retrieval.ndcgMrrAtK(
      Seq((9L, "filler filler")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("alpha"), k = 2, retrieveK = 2).head()
    assert(none.getAs[Double]("mrr") == 0.0)
    assert(none.getAs[Double]("dcg") == 0.0)
  }

  test("rm3Expand: feedback docs contribute expansion terms that " +
      "recall a doc with NO original query term") {
    // docs 1-3: query term co-occurring with 'lake'; doc 4 has only
    // 'lake'; doc 5 is noise. Feedback on 'spark' mines 'lake', whose
    // half-weight contribution recalls doc 4 (score_orig = 0).
    // 10 docs so 'lake' (df 4) passes the 2*df <= N stopword gate
    val docs = (Seq(
      (1L, "spark lake engine"),
      (2L, "spark lake shuffle"),
      (3L, "spark lake plan"),
      (4L, "lake storage format"),
      (5L, "noise words only")) ++
      (6L to 10L).map(i => (i, s"filler$i pad$i junk$i")))
      .toDF("doc_id", "text")
    val got = Retrieval.rm3Expand(docs, "doc_id", "text", Seq("spark"),
      fbDocs = 3, fbTerms = 1, topK = 5)
    val rows = got.collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getAs[Double]("score_orig"), r.getAs[Double]("score_exp"),
        r.getAs[Double]("score"))).toMap
    assert(byId.contains(4L), s"expansion must recall doc 4: ${rows.toSeq}")
    assert(byId(4L)._1 == 0.0 && byId(4L)._2 > 0.0)
    // docs with both terms outrank the expansion-only doc
    assert(rows.head.getLong(0) != 4L)
    assert(byId(1L)._3 == byId(1L)._1 + 0.5 * byId(1L)._2)
    // noise doc matches nothing and is absent
    assert(!byId.contains(5L))
  }
}
