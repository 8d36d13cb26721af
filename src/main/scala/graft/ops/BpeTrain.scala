package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — learn the top-N byte-pair merges
  * from a corpus, the way every LLM tokenizer is built (Sennrich et al.
  * 2016; the HF `tokenizers` trainer). (North-star extension surface;
  * the reference has no tokenizer layer — its truncation op at
  * /root/reference/diagnostic_group_pipeline_with_api.py:220-224 CONSUMES
  * a trained vocab, this produces one.)
  *
  * The algorithm the scale argument rests on: BPE training never needs
  * the corpus — it needs the WORD-FREQUENCY TABLE. The corpus is read
  * exactly once (one explode + one map-side-combined groupBy); everything
  * after runs on the vocab-bounded word table (10⁵–10⁸ rows at any
  * corpus size, vs 10¹² documents). Each of the N iterations is:
  *
  *   1. adjacent-symbol-pair counts weighted by word frequency — a
  *      map-side-combined aggregate over the word table;
  *   2. argmax pair — `orderBy().limit(1)` = TakeOrderedAndProject, a
  *      1-row collect (the same bounded-collect seam as the k-means
  *      centroid fetch, Similarity.scala);
  *   3. merge — a narrow per-row `replace` over the word table with the
  *      winning pair as a literal. No shuffle.
  *
  * Words are represented as their symbol sequence joined by single
  * spaces and wrapped in boundary spaces (`"cat"` → `" c a t "`), so a
  * merge is `replace(" l r " → " lr ")` — a plain codegen'd string op
  * available, with identical leftmost-non-overlapping semantics, in
  * every engine (verified Spark ↔ DuckDB). The replace is applied twice
  * because consecutive pattern occurrences share their boundary space
  * and a single pass skips every second one; two passes merge the same
  * pair set greedy BPE would except on runs of 5+ repeats of one
  * symbol, where the merge COUNT matches but positions may differ —
  * documented approximation, deterministic and engine-portable.
  *
  * Ties on pair count break lexicographically (left, then right), so
  * the learned merge sequence is a pure function of the corpus.
  *
  * Output: one row per learned merge, in order —
  * (step, merge_left, merge_right, pair_count). Stops early if the
  * vocabulary runs out of pairs.
  */
object BpeTrain {

  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")).as("__word"))
      .groupBy("__word").agg(count(lit(1)).as("__freq"))
      .select(
        concat(lit(" "), concat_ws(" ", split(col("__word"), "")), lit(" "))
          .as("__sym"),
        col("__freq"))
    var cur = graft.core.Caches.track(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val syms = split(trim(col("__sym")), " ")
      val best = cur
        .select(col("__freq"), explode(
          filter(zip_with(syms, slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
            (a, b) => struct(a.as("l"), b.as("r"))),
            p => p.getField("r").isNotNull)).as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum("__freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step.toLong, l, r, cnt))
        cur = cur.select(
          applyMerge(col("__sym"), l, r).as("__sym"), col("__freq"))
        // cut the lineage every few merges: without this, iteration i's
        // 1-row collect replays all i-1 replace projections from the one
        // cached base (O(nMerges²) recompute) and the expression tree
        // nests 2·nMerges replace calls — at a realistic merge budget
        // (10⁴-10⁵) that is quadratic planning and a codegen stack bomb.
        // Eager localCheckpoint (not Caches.track: generations would PIN,
        // accumulating nMerges/16 copies until the harness release)
        // materializes the vocab-bounded table; superseded generations
        // are unreferenced and the ContextCleaner reclaims them.
        if (step % RetrackEvery == 0) cur = cur.localCheckpoint()
        step += 1
      }
    }
    merges.toSeq
      .toDF("step", "merge_left", "merge_right", "pair_count")
  }

  /** How many merge projections may stack before the word table is
    * re-materialized (learn loop) or the encode dictionary is
    * checkpointed (dict path) — bounds both lineage depth and the
    * nested-replace expression depth.
    */
  private val RetrackEvery = 16

  private def symInit(word: Column): Column =
    concat(lit(" "), concat_ws(" ", split(word, "")), lit(" "))

  private def applyMerge(sym: Column, l: String, r: String): Column = {
    val pat = lit(" " + l + " " + r + " ")
    val rep = lit(" " + l + r + " ")
    replace(replace(sym, pat, rep), pat, rep)
  }

  /** The learned vocabulary: every symbol left in the word table after
    * applying a merge sequence, with corpus-frequency-weighted counts —
    * the piece inventory a tokenizer ships (chars that never merged +
    * every merged piece). Runs on the vocab-bounded word-frequency
    * table: one corpus scan, then merges applied exactly as in
    * [[encode]] (chain below `chainLimit`, checkpointed batches above).
    */
  def vocab(docs: DataFrame, textCol: String,
            merges: Seq[(String, String)],
            chainLimit: Int = 64): DataFrame = {
    val words = docs
      .select(explode(
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= "")).as("__word"))
      .groupBy("__word").agg(count(lit(1)).as("__freq"))
    val dict =
      if (merges.size <= chainLimit)
        words.withColumn("__sym", merges.foldLeft(symInit(col("__word"))) {
          case (s, (l, r)) => applyMerge(s, l, r)
        })
      else merges.grouped(RetrackEvery).foldLeft(
        words.withColumn("__sym", symInit(col("__word")))) { (d, batch) =>
        d.withColumn("__sym", batch.foldLeft(col("__sym")) {
          case (s, (l, r)) => applyMerge(s, l, r)
        }).localCheckpoint()
      }
    dict
      .select(explode(split(trim(col("__sym")), " ")).as("piece"),
        col("__freq"))
      .groupBy("piece").agg(sum("__freq").as("n"))
  }

  /** Re-tokenize text with a learned merge table, applying the merges in
    * training order to each word's symbol string and emitting the
    * resulting pieces.
    *
    * Two plans behind one result: a merge table up to `chainLimit` is
    * applied as a literal replace chain — one narrow codegen'd
    * projection, no shuffle, no UDF. A REAL tokenizer's merge table
    * (10⁴-10⁵ entries) would nest 2·|merges| replace calls in a single
    * expression (quadratic analysis, codegen stack overflow), so larger
    * tables go through the word DICTIONARY: distinct words (vocab-
    * bounded at any corpus size) get the chain applied in
    * `RetrackEvery`-sized batches with an eager localCheckpoint between
    * batches (bounded expression depth, bounded lineage), and the
    * pieces map joins back onto the exploded corpus — the standard
    * build-once-apply-everywhere tokenizer shape.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)],
             chainLimit: Int = 64): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= ""))
        .as(Seq("word_pos", "__word")))
      .select(col(idCol), col("word_pos").cast("long").as("word_pos"),
        col("__word"))
    if (merges.size <= chainLimit) {
      val merged = merges.foldLeft(symInit(col("__word"))) {
        case (s, (l, r)) => applyMerge(s, l, r)
      }
      toks.select(col(idCol), col("word_pos"),
        split(trim(merged), " ").as("pieces"))
    } else {
      var dict = toks.select(col("__word")).distinct()
        .withColumn("__sym", symInit(col("__word")))
      merges.grouped(RetrackEvery).foreach { batch =>
        dict = dict.withColumn("__sym", batch.foldLeft(col("__sym")) {
          case (s, (l, r)) => applyMerge(s, l, r)
        }).localCheckpoint() // eager: cut lineage + expression depth
      }
      toks.join(dict, "__word")
        .select(col(idCol), col("word_pos"),
          split(trim(col("__sym")), " ").as("pieces"))
    }
  }
}
