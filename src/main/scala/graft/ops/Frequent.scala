package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Heavy hitters (frequent items) at corpus scale — the vocabulary
  * question every tokenizer/mixture design starts from ("which tokens
  * dominate the corpus?") answered WITHOUT a full-vocabulary shuffle.
  *
  * Two-phase sketch-then-recount, the production shape:
  *
  *   1. Each partition runs a Misra–Gries summary (Misra & Gries 1982)
  *      with `k` counters — O(k) memory regardless of partition size,
  *      one pass, no shuffle. A partition's summary undercounts any
  *      item by at most n_p/(k+1).
  *   2. The per-partition summaries union (≤ k·P tiny rows) and their
  *      distinct items form the CANDIDATE set. Summed undercounts are
  *      at most N/(k+1) total, so every item with true frequency
  *      > N/(k+1) survives in at least one summary — with
  *      `threshold ≥ 1/(k+1)` (enforced) the candidate set provably
  *      contains ALL true heavy hitters.
  *   3. An exact recount pass filtered to the broadcast candidate set
  *      (a semi-join the scan can push down) restores exact counts;
  *      the final `count > threshold·N` filter is exact.
  *
  * The output is therefore EXACT — the sketch only bounds how much of
  * the corpus the second pass re-aggregates (≤ k·P distinct keys
  * instead of the full vocabulary), which is what makes the operator
  * viable when the vocabulary itself is data-sized (URLs, n-grams,
  * user ids) and a plain groupBy would shuffle billions of keys to
  * find the top dozen.
  */
object Frequent {

  /** Exact items with frequency > threshold·N in `items(itemCol)`,
    * found via per-partition Misra–Gries candidate generation + exact
    * recount. Returns (item, cnt, share) ordered by (cnt desc, item).
    * NULL items are ignored (they are absences, not values).
    */
  def heavyHitters(items: DataFrame, itemCol: String,
                   threshold: Double, k: Int = 1024): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"0 < threshold <= 1: $threshold")
    require(k + 1 >= 1.0 / threshold,
      s"no-false-negative guarantee needs k+1 >= 1/threshold (k=$k, threshold=$threshold)")
    val spark = items.sparkSession
    import spark.implicits._
    val toks = items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
    // phase 1: O(k)-memory per-partition summaries, no shuffle
    val partials = toks.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        m.get(x) match {
          case Some(c) => m.update(x, c + 1)
          case None if m.size < k => m.update(x, 1L)
          case None => // decrement-all step: O(k), amortized O(1)/item
            val dead = List.newBuilder[String]
            m.foreach { case (t, c) =>
              if (c == 1L) dead += t else m.update(t, c - 1) }
            dead.result().foreach(m.remove)
        }
      }
      m.iterator
    }.toDF("item", "__sketch_cnt")
    // phase 2: candidates are a tiny relation (≤ k·numPartitions rows)
    val candidates = partials.select(col("item")).distinct()
    val n = toks.agg(count(lit(1)).as("__n"))
    toks.join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(n))
      .filter(col("cnt") > lit(threshold) * col("__n"))
      .select(col("item"), col("cnt"),
        (col("cnt").cast("double") / col("__n")).as("share"))
      .orderBy(col("cnt").desc, col("item"))
  }

  /** The whitespace token relation the text queries share (mirrors
    * TextAnalysis.tokenCountWs' trim + `\s+` split).
    */
  def wsTokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")

  /** COUNT-MIN SKETCH counter table (Cormode & Muthukrishnan 2005) —
    * the mergeable fixed-size frequency summary that answers point
    * queries over a data-sized key space: `depth` hash rows × `width`
    * buckets of exact integer counters, estimate(x) = min over rows of
    * the bucket x hashes into — an OVERESTIMATE, never an
    * underestimate, with error ≤ e·N/width at confidence 1−e^−depth.
    * The turnstile complement to [[heavyHitters]]: Misra–Gries answers
    * "which items are frequent", CMS answers "how frequent is THIS
    * item" for any item, and sketches of disjoint corpus slices ADD
    * cell-wise (the incremental-aggregate seam — per-batch partials,
    * union + re-sum to merge).
    *
    * Hashes are md5 slices keyed by the row index (the repo-wide
    * deterministic-uniform discipline): row j's bucket for item x is
    * the first 8 hex digits of md5("j:x") mod width — engine-portable,
    * so an oracle rebuilds the identical counter table. Plan: the
    * items relation explodes ×depth (map-side combinable into ≤
    * depth×width cells — the ONLY corpus-sized work), one exchange of
    * sketch-sized partials. At 100 TB the sketch is depth×width longs
    * regardless of corpus size; nothing driver-sided but the contract.
    *
    * @return (j, bucket, cnt) — the depth×width counter table (cells
    *         with zero count are absent).
    */
  def countMinSketch(items: DataFrame, itemCol: String,
                     depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    items.select(col(itemCol).cast("string").as("item"))
      .filter(col("item").isNotNull)
      .select(explode(array((0 until depth).map(j => lit(j.toLong)): _*))
        .as("j"), col("item"))
      .withColumn("bucket", cmsBucket(col("j"), col("item"), width))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Row-j CMS bucket of `item`: first 8 md5 hex digits of "j:item",
    * as a non-negative long mod `width` (the value is < 2^32, so plain
    * `%` is already non-negative).
    */
  def cmsBucket(j: Column, item: Column, width: Int): Column =
    conv(substring(md5(concat_ws(":", j, item)), 1, 8), 16, 10)
      .cast("long") % width

  /** CMS point estimates for the keys of `queries(keyCol)` against a
    * [[countMinSketch]] counter table: estimate = min over hash rows of
    * the addressed cell (absent cell = 0 — cannot happen for a key the
    * sketch actually counted). The sketch table is sketch-sized, so the
    * lookup broadcasts it and the probe side never shuffles.
    *
    * @return `queries` plus an `n_cms` column.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 512): DataFrame = {
    val probes = queries
      .select(col(keyCol), explode(array(
        (0 until depth).map(j => lit(j.toLong)): _*)).as("j"))
      .withColumn("bucket",
        cmsBucket(col("j"), col(keyCol).cast("string"), width))
    probes.join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_cms"))
      .join(queries, Seq(keyCol))
  }

  /** Per-group exact heavy hitters: items with frequency >
    * threshold·N_group WITHIN each group (heavy tokens per language,
    * hot URLs per domain, whales per segment). Same two-phase
    * sketch-then-recount as [[heavyHitters]], with one Misra–Gries
    * summary (k counters) PER GROUP per partition — memory
    * O(k · groups-per-partition), fine when the group domain is
    * bounded (languages, sources); for data-sized group domains
    * pre-repartition by group so each partition sees few groups.
    *
    * The no-false-negative argument is per group: a group's summaries
    * jointly undercount any of its items by ≤ N_group/(k+1), so every
    * item with in-group frequency > N_group/(k+1) survives as a
    * candidate, and `threshold ≥ 1/(k+1)` (enforced) makes the exact
    * recount complete. The recount is one (group, item) aggregate
    * semi-joined to the broadcast candidates; per-group totals are a
    * groups-sized relation joined back broadcast.
    */
  def heavyHittersByKey(items: DataFrame, keyCol: String, itemCol: String,
                        threshold: Double, k: Int = 1024): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"0 < threshold <= 1: $threshold")
    require(k + 1 >= 1.0 / threshold,
      s"no-false-negative guarantee needs k+1 >= 1/threshold (k=$k, threshold=$threshold)")
    val spark = items.sparkSession
    import spark.implicits._
    val toks = items
      .select(col(keyCol).cast("string").as("grp"),
        col(itemCol).cast("string").as("item"))
      .filter(col("grp").isNotNull && col("item").isNotNull)
    val partials = toks.as[(String, String)].mapPartitions { it =>
      val perGrp = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.HashMap[String, Long]]
      it.foreach { case (g, x) =>
        val m = perGrp.getOrElseUpdate(g,
          scala.collection.mutable.HashMap.empty[String, Long])
        m.get(x) match {
          case Some(c) => m.update(x, c + 1)
          case None if m.size < k => m.update(x, 1L)
          case None =>
            val dead = List.newBuilder[String]
            m.foreach { case (t, c) =>
              if (c == 1L) dead += t else m.update(t, c - 1) }
            dead.result().foreach(m.remove)
        }
      }
      perGrp.iterator.flatMap { case (g, m) => m.keysIterator.map(g -> _) }
    }.toDF("grp", "item")
    val candidates = partials.distinct()
    val perGrpN = toks.groupBy(col("grp")).agg(count(lit(1)).as("__n"))
    toks.join(broadcast(candidates), Seq("grp", "item"), "left_semi")
      .groupBy(col("grp"), col("item")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(perGrpN), Seq("grp"))
      .filter(col("cnt") > lit(threshold) * col("__n"))
      .select(col("grp"), col("item"), col("cnt"),
        (col("cnt").cast("double") / col("__n")).as("share"))
      .orderBy(col("grp"), col("cnt").desc, col("item"))
  }
}
