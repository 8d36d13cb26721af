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
}
