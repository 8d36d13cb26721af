package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse text retrieval over the document corpus: a distributed inverted
  * index and BM25 ranked search — the retrieval half of a training-data
  * pipeline (dataset search, decontamination lookups, quality-by-query
  * probes). (North-star extension surface; reference analogue: the
  * keyword-filter scan shape of
  * /root/reference/diagnostic_group_pipeline_with_api.py:131.)
  *
  * Cross-engine determinism (the DuckDB hash gate): BM25's idf is the
  * LOG-FREE Robertson form `(N - df + 0.5) / (df + 0.5)` — the classic
  * `ln` wrapper is monotone in it, so rankings for any single term agree
  * and multi-term scores remain a valid relevance surrogate, while the
  * score stays a pure IEEE-arithmetic expression (libm `ln` differs in
  * the last ulp across engines and would break the bit-exact gate).
  * Per-term addends are cast to a wide decimal before the per-document
  * sum, so aggregation order can never change the score. The summed
  * score is then re-quantized to 6 decimals: the addends are magnitude
  * ~10¹ doubles whose ulp (~4e-15) is finer than the 1e-14 decimal
  * quantum, so engines that round the shortest decimal string (JVM
  * BigDecimal.valueOf) vs the exact binary value can disagree in the
  * 14th place — 10⁻⁶ is 10⁹× coarser than any such discrepancy. The
  * quantization is spelled `floor(sum·10⁶ + ½)` rather than a decimal
  * downscale-cast because rescale rounding is NOT portable (Spark
  * rounds HALF_UP, DuckDB truncates); every step is exact decimal
  * arithmetic and the final ≤2⁵³ integer divides by 10⁶ identically in
  * any IEEE engine.
  *
  * Plan shape at 100 TB:
  *  - the INDEX build never materializes an unbounded posting group: df
  *    is counted first (map-side combinable), the stopword band
  *    (`df > maxDf`) is dropped, and only then are postings collected —
  *    the `collect_list` group size is bounded by `maxDf` by
  *    construction. Stopword postings (the scale killer: "the" occurs in
  *    every English document, a single-key list of 10¹⁰ ids) never
  *    exist.
  *  - BM25 prunes to the query's terms IMMEDIATELY after the token
  *    explode (a handful of terms survive the scan stage), the per-term
  *    df dimension is a ≤|query| row broadcast, and the final top-k is
  *    `orderBy().limit(k)` = TakeOrderedAndProject — per-partition heaps
  *    and a k-row driver merge, never a global sort.
  */
object Retrieval {

  private def words(text: Column): Column =
    filter(split(trim(text), "\\s+"), w => w =!= "")

  /** Distributed inverted index with a stopword df-cap: one row per
    * surviving term carrying its document frequency and the full
    * posting list (doc ids sorted by their native type's ordering —
    * numeric for numeric ids — then comma-joined into a string so the
    * row is hashable by any engine).
    *
    * Shuffle structure, chosen for skew: the distinct hashes on
    * (doc, term) — every partition of a stopword's pairs lands
    * somewhere different, so no hot partition exists while the stopword
    * is still alive. (The tempting alternative — pre-partition by term
    * so the later aggregates reuse one exchange — funnels all 10¹⁰
    * (the, doc) pairs through one task; one balanced shuffle plus two
    * cheap keyed ones beats one skewed shuffle.) The df count is
    * map-side combined (the term exchange carries partial counts, not
    * pairs), and the postings exchange carries ONLY pairs whose term
    * survived the df-cap — bounded groups by construction. The pairs
    * relation feeds both aggregates and is cached (Caches.track, the
    * dedupLines precedent) rather than recomputed from two corpus scans.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDf: Long): DataFrame = {
    // the id keeps its NATIVE type end to end (a cast("long") here would
    // silently null out string ids and collapse every posting list):
    // sorting happens on the native type, stringification only at emit
    val pairs = graft.core.Caches.track(docs
      .select(col(idCol).as("__doc"),
        explode(words(col(textCol))).as("term"))
      .distinct()) // posting-list semantics: a doc appears once per term
    val df = pairs.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    pairs.join(df, "term")
      .groupBy("term", "df")
      .agg(array_join(
        transform(array_sort(collect_list(col("__doc"))),
          x => x.cast("string")), ",").as("postings"))
      .select("term", "df", "postings")
  }

  /** Materialize the BM25 index AT REST (the ivfWriteLayout pattern for
    * text): a postings table (term, doc, tf, dl) range-partitioned and
    * sorted by term — so a term-equality query prunes to a handful of
    * files via parquet min/max — plus per-batch corpus-stats rows
    * holding EXACT integers (sum of doc lengths, doc count), summed at
    * serve time so avgdl is the same single double division the
    * corpus-scan path computes. Build cost: the one explode + one
    * (doc, term) aggregate any index build pays; serving then never
    * touches the corpus. Layout is batch-structured ([[writeBatch]]) so
    * [[appendToIndex]] maintenance is idempotent and crash-safe.
    */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String,
                 path: String): Unit = {
    // a fresh build owns the whole directory: clear any previous batches
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/postings"), true)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/stats"), true)
    writeBatch(docs, idCol, textCol, path, batchId = 0L)
  }

  /** One maintenance unit: this batch's postings and its 1-row stats
    * delta, each written with OVERWRITE semantics into a `batch=<id>`
    * subdirectory. This is what makes the index's maintenance story
    * crash-safe without any swap/recovery machinery: a retry of the same
    * batch id rewrites exactly its own two subdirectories (idempotent —
    * no duplicate postings, no double-counted stats), a crash between
    * the two writes is healed by that same retry, readers only ever see
    * whole committed subdirectories, and nothing ever deletes a
    * previously committed batch. Serve-side totals are a sum over the
    * per-batch stats rows (exact integers), so avgdl/N are identical to
    * a from-scratch build's.
    *
    * The postings layout (shared by full build and append — drift would
    * break the serve-identical guarantee) ranges by (term, doc), not
    * term alone: a stopword's postings would otherwise land in ONE range
    * partition (range split points cannot divide a single key value);
    * the secondary key spreads a hot term across partitions while files
    * stay term-sorted, so min/max pruning still skips everything outside
    * the query terms.
    */
  private def writeBatch(docs: DataFrame, idCol: String, textCol: String,
                         path: String, batchId: Long): Unit = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = docs.sparkSession
    // cached: the batch feeds the stats delta AND the postings write —
    // one tokenization pass, and the two can never disagree even over a
    // non-deterministic source
    val base = graft.core.Caches.track(
      docs.select(col(idCol), words(col(textCol)).as("__ws")))
    base
      .select(col(idCol), size(col("__ws")).as("dl"),
        posexplode(col("__ws")).as(Seq("__pos", "term")))
      .groupBy(col("term"), col(idCol), col("dl"))
      // POSITIONAL postings: tf for BM25, the sorted position list for
      // phrase queries — one index serves both. Position lists are
      // bounded by doc length per (term, doc), not corpus size.
      .agg(count(lit(1)).as("tf"),
        array_sort(collect_list(col("__pos").cast("integer")))
          .as("positions"))
      .repartitionByRange(col("term"), col(idCol))
      .sortWithinPartitions("term", idCol)
      .write.mode("overwrite").parquet(s"$path/postings/batch=$batchId")
    val d = base.agg(coalesce(sum(size(col("__ws"))), lit(0L)).as("sum_dl"),
      count(lit(1)).as("n_docs")).head()
    spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(d.getLong(0), d.getLong(1))),
        StructType(Seq(StructField("sum_dl", LongType, nullable = false),
          StructField("n_docs", LongType, nullable = false))))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/stats/batch=$batchId")
  }

  /** Served corpus totals: the sum over all committed per-batch stats
    * rows — exact integer arithmetic, so avgdl is the same single
    * double division a from-scratch build computes.
    */
  private def readStats(spark: org.apache.spark.sql.SparkSession,
                        path: String): DataFrame =
    spark.read.parquet(path + "/stats")
      .agg(sum("sum_dl").as("sum_dl"), sum("n_docs").as("n_docs"))

  /** Exact phrase search SERVED FROM the at-rest index: the same answer
    * as [[phraseSearch]] (spec-pinned) without touching the corpus. The
    * postings scan reads only the phrase's terms (pushed-down filter →
    * file/row-group pruning on the term-ranged layout); each term's
    * (doc, positions) rows then join co-partitioned on the doc id —
    * after the first exchange every subsequent join reuses the
    * partitioning — and a document matches where term j's position list
    * contains `p + j` for every start `p` of term 0. Work scales with
    * the PHRASE TERMS' postings, not the corpus: the classic inverted-
    * index phrase plan.
    */
  def phraseFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      idCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val posts = spark.read.parquet(path + "/postings")
      .filter(col("term").isin(phrase.distinct: _*)) // pushed to the scan
      .select(col(idCol), col("term"), col("positions"))
    def termPositions(j: Int): DataFrame = posts
      .filter(col("term") === phrase(j))
      .select(col(idCol), col("positions").as(s"__p$j"))
    val joined = (1 until phrase.length)
      .foldLeft(termPositions(0))((acc, j) => acc.join(termPositions(j), idCol))
    val matches = filter(col("__p0"), p =>
      (1 until phrase.length).map(j =>
        array_contains(col(s"__p$j"), p + lit(j))).foldLeft(lit(true))(_ && _))
    joined
      .select(col(idCol), size(matches).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** Exact phrase search: documents containing the words of `phrase`
    * ADJACENT and IN ORDER, with the match count per document. Runs as a
    * single scan-stage expression; no shuffle, no self-join. (The
    * positional-join formulation — tokens self-joined on (doc, pos+1) —
    * shuffles the whole token stream per phrase word; adjacency within
    * a row never needs an exchange.)
    *
    * Expression shape matters here: an `element_at(ws, i+j)` lookup
    * inside a lambda would get the staged word array INLINED back by
    * CollapseProject and re-split the text once per candidate position —
    * O(words²·chars) per row (measured 3s+ at sf0.1). Instead each
    * phrase word contributes one boolean `transform` over the array and
    * the k arrays are AND-combined through shifted `zip_with` slices
    * (the bigramPairs idiom) — every array argument evaluates O(k)
    * times per ROW, per-element work is O(1), total O(k·words).
    * Compose with [[bm25]]/[[invertedIndex]] for the candidate-then-
    * verify retrieval stack.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val ws = words(col(textCol))
    def eq(j: Int): Column = transform(ws, w => w === lit(phrase(j)))
    // acc(i) = words i..i+j all match phrase(0..j); the shifted slice
    // pads with null, and null lands false-side via the <=> filter
    val acc = (1 until phrase.length).foldLeft(eq(0)) { (a, j) =>
      zip_with(a,
        slice(eq(j), lit(j + 1), greatest(size(ws) - j, lit(0))),
        (x, y) => x && y)
    }
    docs
      .select(col(idCol),
        size(filter(acc, x => x <=> lit(true))).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** Incremental index maintenance: append a batch of NEW documents to
    * an existing at-rest index without rebuilding it. Correct by
    * construction because the postings table is keyed (term, doc) and
    * per-term df is derived at SERVE time from the postings themselves —
    * new docs only ever ADD rows, so appending their postings files and
    * refreshing the (1-row) corpus stats is the whole maintenance story;
    * no index-wide df bookkeeping exists to go stale. The caller owns
    * the only invariant: batch doc ids must be disjoint from the indexed
    * ones (re-ingesting a doc would double-count its tf).
    *
    * Crash safety by construction (see [[writeBatch]]): every batch
    * writes its postings AND its stats delta into its own `batch=<id>`
    * subdirectories with overwrite semantics — a crash anywhere is
    * healed by retrying the SAME batch id (idempotent: the retry
    * rewrites exactly its own subdirectories, never duplicating
    * postings or double-counting stats), which is precisely the
    * [[graft.core.BatchLedger]] idempotent-batch integration. Batch ids
    * must be fresh per logical batch (a ledger allocation) and doc ids
    * disjoint from already-indexed ones.
    */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
                    path: String, batchId: Long): Unit = {
    require(batchId > 0, "batch 0 is the full build; appends use fresh ids")
    writeBatch(docs, idCol, textCol, path, batchId)
  }

  /** BM25 served from the written index: the postings scan carries a
    * pushed-down `term IN (...)` filter (file-level min/max pruning on
    * the range-partitioned layout, then row-group pruning), so a query
    * reads its terms' postings and the 1-row stats — never the corpus.
    * Bit-identical to [[bm25]] on the same corpus (shared scoring
    * expression; spec-pinned).
    */
  def bm25FromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    idCol: String, queryTerms: Seq[String],
                    topK: Int): DataFrame = {
    val stats = readStats(spark, path)
      .select((col("sum_dl").cast("double") / col("n_docs")).as("__avgdl"),
        col("n_docs").as("__n"))
    val tf = spark.read.parquet(path + "/postings")
      .filter(col("term").isin(queryTerms: _*)) // pushed to the scan
      .select(col(idCol), col("dl").as("__dl"), col("term").as("__t"),
        col("tf").as("__tf"))
    score(tf, idCol, stats, topK)
  }

  /** The shared BM25 scoring tail: per-term df (broadcast), the
    * Robertson idf × saturated-tf product, decimal-exact per-doc sum,
    * floor-quantization, TakeOrderedAndProject. Both the corpus-scan
    * and the at-rest path end here, so their results are bit-identical
    * by construction.
    */
  private def score(tf: DataFrame, idCol: String, stats: DataFrame,
                    topK: Int): DataFrame = {
    val dfq = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val idf = (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
      (col("__df").cast("double") + lit(0.5))
    val tfc = (col("__tf").cast("double") * lit(2.2)) /
      (col("__tf").cast("double") +
        lit(1.2) * (lit(1.0) - lit(0.75) +
          lit(0.75) * col("__dl").cast("double") / col("__avgdl")))
    // See the class doc on the floor(sum·10⁶ + ½) quantization: decimal
    // downscale rounding is not engine-portable (Spark half-up, DuckDB
    // truncates), so the re-quantization is spelled in exact arithmetic.
    tf.join(broadcast(dfq), "__t").crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        (floor(sum((idf * tfc).cast(DecimalType(38, 14))) * lit(1000000) +
          lit(0.5).cast(DecimalType(38, 14))).cast("double") /
          lit(1000000.0)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
      .select(col(idCol), col("n_terms"), col("score"))
  }

  /** BM25 ranked retrieval for a literal query: top-k documents by
    *
    *   score(d) = Σ_{t ∈ q ∩ d}  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with the log-free Robertson idf (object doc). `k1 = 1.2`,
    * `b = 0.75` (the standard constants). Output: (id, n_terms, score)
    * for the k best documents, score-desc / id-asc.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], topK: Int): DataFrame = {
    val base = docs.select(col(idCol), words(col(textCol)).as("__ws"))
    // corpus stats as a 1-row relation (kept in-plan): exact integer sum
    // so avgdl is ONE double division, bit-identical in any engine
    val stats = base.agg(
      (sum(size(col("__ws"))).cast("double") / count(lit(1))).as("__avgdl"),
      count(lit(1)).as("__n"))
    // tf is tiny (<= |matching docs|·|query| rows) and feeds BOTH the df
    // dimension and the scoring join — cached so the df aggregate does
    // not recompute it from a second full corpus scan
    val tf = graft.core.Caches.track(base
      .select(col(idCol), size(col("__ws")).as("__dl"),
        explode(col("__ws")).as("__t"))
      .filter(col("__t").isin(queryTerms: _*)) // prune in the scan stage
      .groupBy(col(idCol), col("__dl"), col("__t"))
      .agg(count(lit(1)).as("__tf")))
    score(tf, idCol, stats, topK)
  }
}
