package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev tool: scale-up probe for the dedup path — replicates the documents
  * table `mult`× (shifted ids, salted text so replicas aren't exact dups)
  * and times minhash/jaccard, verifying the quadratic guards hold when
  * the corpus grows 10×. Usage:
  *   sbt "runMain graft.ScaleProbe [mult] [r8]"
  * The optional `r8` arg skips the legacy sections and runs only the
  * round-8 probes (IVFADC, batch probe, funnel, survivor policy).
  */
object ScaleProbe {

  /** Round-12: the 1×/10×/100× growth table for the three heaviest
    * bench families — dedup connected components, the sim_sparse
    * df-capped postings join, and the mm_pipeline decode→hash→CC
    * chain. Unlike the earlier (time-only) probes this also records
    * SHUFFLE READ/WRITE BYTES per probe (task-metrics sum via a
    * SparkListener), so the growth claim is about data MOVED, not just
    * wall time — at 10× the sub-linear timings are still partly
    * fixed-overhead amortization; bytes expose the real data term.
    * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.ScaleProbe r12"
    */
  /** Shuffle-byte metering shared by the r12 probes: task-metrics sums
    * via a SparkListener, settled (events post asynchronously) on both
    * sides of each timed probe.
    */
  private final class ShuffleMeter(spark: SparkSession) {
    import java.util.concurrent.atomic.AtomicLong
    private val read = new AtomicLong
    private val write = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    private def settle(): Unit = {
      var prev = -1L
      var cur = read.get + write.get
      while (cur != prev) { Thread.sleep(300); prev = cur; cur = read.get + write.get }
    }
    def probe(tag: String)(f: => Long): Unit = {
      settle()
      val (r0, w0) = (read.get, write.get)
      val t0 = System.nanoTime()
      val rows = f
      val dt = (System.nanoTime() - t0) / 1e9
      settle()
      println(f"$tag: $dt%.2f s, shuffle read ${(read.get - r0) / 1e6}%.1f MB" +
        f" / write ${(write.get - w0) / 1e6}%.1f MB ($rows rows)")
    }
  }

  private def r12Probe(spark: SparkSession): Unit = {
    import graft.ops.{Multimodal, Similarity}
    val meter = new ShuffleMeter(spark)
    def probe(tag: String)(f: => Long): Unit = meter.probe(tag)(f)
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val n = base.count()
    for (mult <- Seq(1, 10, 100)) {
      val docs =
        if (mult == 1) base
        else (0 until mult).map { i =>
          base.select((col("doc_id") + lit(i.toLong * n)).as("doc_id"),
            // salt replica text so cross-replica pairs aren't all dups
            concat(col("text"), lit(s" replica_marker_$i")).as("text"))
        }.reduce(_ unionByName _)
      val cached = docs.repartition(32).cache()
      println(s"== mult=$mult: ${cached.count()} docs ==")
      probe(s"dedup_cluster CC ${mult}x") {
        val pairs = Dedup.minhashCandidates(cached, "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        Dedup.connectedComponents(pairs, "id_a", "id_b").count()
      }
      graft.core.Caches.releaseAll()
      probe(s"sim_sparse postings ${mult}x (maxDf=50 absolute)") {
        Similarity.sparseCosinePairs(cached, "doc_id",
          Similarity.wordNgrams(col("text"), 2), maxDf = 50).count()
      }
      graft.core.Caches.releaseAll()
      if (mult == 10)
        // constant-selectivity reading, 10x ONLY: the ABSOLUTE df cap
        // is the production guard (at 100x it stop-lists every gram —
        // 0 candidates, pure scan cost), so scale the cap with the
        // corpus once to measure the postings JOIN at constant rarity.
        // Measured 3.7 GB shuffle at 10x — candidate pairs grow ~df²
        // per gram, so a scaled cap is QUADRATIC BY CONSTRUCTION (the
        // 100x scaled run projects to ~370 GB and is deliberately not
        // run; refusing that join is exactly the absolute cap's job).
        probe(s"sim_sparse postings ${mult}x (maxDf=${50 * mult} scaled)") {
          Similarity.sparseCosinePairs(cached, "doc_id",
            Similarity.wordNgrams(col("text"), 2), maxDf = 50 * mult).count()
        }
      graft.core.Caches.releaseAll()
      probe(s"mm_pipeline ${mult}x") {
        // the mm_pipeline query body (R13Queries) on the replicated
        // ids — capped pair mode (maxChunkDf = 256), same as the
        // query: the exact-mode pigeonhole measured 2.4 GB shuffle at
        // 10x and was on track for ~240 GB at 100x (killed before it
        // filled the disk); the cap bounds oversized chunk groups to
        // O(group) id-chain pairs (over-merge-only approximation: fine
        // for this clustering consumer, see the query doc)
        val imgs = Multimodal.perceptualHash(
          Multimodal.imageLumaStats(
            Multimodal.gradientFixture(cached.select("doc_id"), "doc_id"),
            "payload"),
          "payload")
        val gated = graft.core.Caches.track(
          imgs.filter(col("sum_luma") >= 18144000L)
            .select(col("doc_id"), col("phash").as("simhash")))
        val pairs = Dedup.simhashPairs(gated, "doc_id", maxHamming = 3,
          bits = 64, maxChunkDf = 256)
        val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
        val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
        gated.select(col("doc_id"))
          .join(cc.select(col("id").as("doc_id"),
            col("label").as("cluster")), Seq("doc_id"), "left")
          .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_survivor", col("doc_id") === col("cluster"))
          .count()
      }
      graft.core.Caches.releaseAll()
      cached.unpersist(blocking = true)
    }
  }

  /** Round-12b: the trained-quantizer family at 1×/10×/100× — the
    * paths the two-phase SqDist assignment sped up. K-means training
    * and corpus assignment are the LINEAR stages (k·dims centroid
    * literals ride into a narrow map; the Lloyd update is one
    * map-side-combined aggregate), probed to 100×. SemDeDup's pair
    * stage is blocked-quadratic BY CONSTRUCTION on a dup-dense corpus
    * (every replica is a near-dup of its source, so the true near-dup
    * pair count itself grows ~mult² — same honesty note as the
    * scaled-df sim_sparse reading), so it is probed at 10× only, with
    * sub-blocking as the designed hot-block parallelism fix.
    * Run: sbt "runMain graft.ScaleProbe r12b"
    */
  private def r12bProbe(spark: SparkSession): Unit = {
    import graft.ops.Similarity
    val meter = new ShuffleMeter(spark)
    val embBase = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val en = embBase.count()
    for (mult <- Seq(1, 10, 100)) {
      val emb =
        if (mult == 1) embBase
        else (0 until mult).map { i =>
          embBase.select((col("vec_id") + lit(i * en)).as("vec_id"),
            // deterministic per-replica perturbation of the first
            // component so replicas aren't bit-identical vectors
            transform(col("embedding"), (x, p) =>
              when(p === 0, x + lit(i * 1e-3f)).otherwise(x))
              .as("embedding"))
        }.reduce(_ unionByName _)
      val cached = emb.repartition(32).cache()
      println(s"== mult=$mult: ${cached.count()} vectors ==")
      var cents: Seq[Seq[Double]] = Nil
      meter.probe(s"kmeans train k=16 iters=2 ${mult}x") {
        cents = Similarity.kmeansCentroids(cached, "vec_id", "embedding",
          k = 16, iters = 2)
        cents.size.toLong
      }
      // cache teardown OUTSIDE the timed window — unpersist of the
      // training projection scales with the data and would bias the
      // very growth reading this probe exists to produce
      graft.core.Caches.releaseAll()
      meter.probe(s"kmeans assign ${mult}x") {
        cached.select(col("vec_id"),
          Similarity.nearestCluster(col("embedding"), cents).as("c"))
          .groupBy("c").count().count()
      }
      graft.core.Caches.releaseAll()
      if (mult <= 10)
        meter.probe(s"semantic dedup ${mult}x (subBlocks=8)") {
          Similarity.semanticDedup(cached, "vec_id", "embedding",
            kClusters = 16, iters = 2, threshold = 0.95,
            subBlocks = 8).count()
        }
      graft.core.Caches.releaseAll()
      cached.unpersist(blocking = true)
    }
  }

  /** Round-13: semanticDedup's pair stage at 1×/10×/100× on a
    * NON-dup-dense corpus — the probe r12b deliberately skipped.
    *
    * r12b's replicas perturbed only component 0 by i·1e-3, so every
    * replica stayed a near-dup of its source and TRUE pair volume grew
    * ~mult² by construction (probed 10× only for that reason). Here
    * each replica adds a deterministic per-(replica, component)
    * pseudo-noise offset of ~±0.5 across ALL 64 components: noise norm
    * ≈ 0.5·‖x‖, so cos(x, x+e) ≈ 1/√(1+0.25) ≈ 0.89 < the 0.95
    * threshold — replicas of one source are NOT near-dups of each other
    * or of the source, and true pair volume stays corpus-linear.
    *
    * The second scale knob is the one production SemDeDup turns:
    * kClusters grows WITH the corpus (constant expected cluster size
    * ~125 here), so intra-block candidate volume is corpus-linear too —
    * a fixed k at 100× would make blocks 100× larger and the blocked
    * join quadratic no matter how it is sub-blocked (sub-blocking
    * redistributes a block's work across B² tasks; it never shrinks
    * it). The pair stage (embeddingNearDups, subBlocks = 8) is metered
    * separately from train/assign so the growth table row is about the
    * 1-Bucket-Theta join itself.
    * Run: sbt "runMain graft.ScaleProbe r13"
    */
  private def r13Probe(spark: SparkSession): Unit = {
    import graft.ops.Similarity
    val meter = new ShuffleMeter(spark)
    val embBase = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    val en = embBase.count()
    for (mult <- Seq(1, 10, 100)) {
      val emb =
        if (mult == 1) embBase
        else (0 until mult).map { i =>
          // deterministic md5-derived noise vector per replica, in
          // [-0.5, 0.5) per component — hash-independent across
          // replicas (a first cut used Weyl-style (i·c + p·d) mod 997,
          // and replica pairs with small (i−j)·c mod 997 got
          // near-IDENTICAL noise: 585k manufactured near-dup pairs at
          // 100×; lesson recorded, use a real hash for probe noise)
          val noiseVec = (0 until 64).map { p =>
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(s"r13:$i:$p".getBytes("UTF-8"))
            val u = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
            (u.toDouble / (1 << 24) - 0.5).toFloat
          }
          embBase.select((col("vec_id") + lit(i * en)).as("vec_id"),
            zip_with(col("embedding"), typedlit(noiseVec),
              (x, e) => x + e).as("embedding"))
        }.reduce(_ unionByName _)
      val cached = emb.repartition(32).cache()
      val k = 16 * mult
      println(s"== mult=$mult: ${cached.count()} vectors, kClusters=$k ==")
      var cents: Seq[Seq[Double]] = Nil
      meter.probe(s"kmeans train k=$k iters=2 ${mult}x") {
        cents = Similarity.kmeansCentroids(cached, "vec_id", "embedding",
          k = k, iters = 2)
        cents.size.toLong
      }
      graft.core.Caches.releaseAll()
      val assigned = cached.select(col("vec_id"), col("embedding"),
        Similarity.nearestCluster(col("embedding"), cents).as("c"))
        .repartition(32).cache()
      meter.probe(s"assign ${mult}x") { assigned.count() }
      meter.probe(s"pair stage ${mult}x (subBlocks=8, thr=0.95)") {
        Dedup.embeddingNearDups(assigned, "vec_id", "embedding", "c",
          threshold = 0.95, subBlocks = 8).count()
      }
      graft.core.Caches.releaseAll()
      // second reading with broadcast disabled: at 1×/10× the adaptive
      // plan broadcasts one side (0 shuffle — correct at that size, but
      // no growth signal); at 100 TB nothing broadcasts, so the
      // shuffle-growth row for the sub-block join needs the shuffle
      // plan at every scale
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try meter.probe(s"pair stage ${mult}x (subBlocks=8, no broadcast)") {
        Dedup.embeddingNearDups(assigned, "vec_id", "embedding", "c",
          threshold = 0.95, subBlocks = 8).count()
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      graft.core.Caches.releaseAll()
      assigned.unpersist(blocking = true)
      cached.unpersist(blocking = true)
    }
  }

  /** Round-14: the pretrain_pipeline FLAGSHIP end-to-end at 1×/10×/100×
    * with per-stage shuffle metering and per-barrier materialization
    * sizes — the one probed-family COMPOSITION without its own growth
    * table (r13 verdict task 1). Each stage of the exact query body
    * (queries/R7Queries.scala `pretrain_pipeline`) is timed through its
    * eager stageBarrier, so the table is stage × scale × (wall, shuffle
    * read/write, rows out, barrier bytes).
    *
    * Corpus model: replica 0 is the base; replica i ≥ 1 replaces ~1/2 of
    * word positions (xxhash64-chosen per (replica, position)) with a
    * word drawn from the SAME document (xxhash64-chosen position), so
    *  - word distribution (hence the quality gate's signals) is roughly
    *    preserved — the gate keeps a comparable fraction per replica;
    *  - within-replica structure (planted dup clusters, shared spans,
    *    contamination overlaps) is preserved EXACTLY in shape: the same
    *    positions mutate identically across all docs of a replica, so
    *    near-dup pairs stay near-dups inside their replica — every
    *    replica is a fresh crawl slice with the base's dup density;
    *  - cross-replica near-dups are destroyed (5-gram survival in both
    *    of two replicas ≈ (1/4)^5 ≈ 1e-3 Jaccard; base↔replica ≈
    *    (1/2)^5 ≈ 3%, far below the LSH S-curve) — pair volume stays
    *    corpus-linear instead of the salted-replica mult² trap (r12/r13
    *    lesson).
    * doc_id shifts by i·n with n ≡ 0 (mod 10), so the held-out bench
    * slice stays exactly 10% of every replica.
    * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.ScaleProbe r14"
    */
  private def r14Probe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.DataFrame
    import graft.ops.{Curation, LmSignals, TextAnalysis}
    val meter = new ShuffleMeter(spark)
    def storedBytes: Long = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "source", "lang", "text")
    val n = base.count()
    require(n % 10 == 0, s"bench-slice fraction must survive the id shift ($n)")
    for (mult <- Seq(1, 10, 100)) {
      val docs =
        if (mult == 1) base
        else (0 until mult).map { i =>
          if (i == 0) base
          else {
            val ws = split(trim(col("text")), "\\s+")
            val mutated = array_join(
              transform(ws, (w, p) => {
                val pick = pmod(xxhash64(lit(s"r14pick:$i"), p), lit(2))
                val src = pmod(xxhash64(lit(s"r14src:$i"), p), size(ws))
                  .cast("int") + 1
                when(pick === 0, element_at(ws, src)).otherwise(w)
              }), " ")
            base.select((col("doc_id") + lit(i.toLong * n)).as("doc_id"),
              col("source"), col("lang"), mutated.as("text"))
          }
        }.reduce(_ unionByName _)
      val cached = docs.repartition(32).cache()
      println(s"== r14 pretrain mult=$mult: ${cached.count()} docs ==")
      var bar0 = storedBytes
      def stage(tag: String)(f: => Long): Unit = {
        meter.probe(s"$tag ${mult}x")(f)
        val b = storedBytes
        if (b != bar0)
          println(f"   barrier +${(b - bar0) / 1e6}%.1f MB (stored total ${b / 1e6}%.1f MB)")
        bar0 = b
      }
      // ---- the exact pretrain_pipeline body (R7Queries), staged ----
      var cleaned: DataFrame = null
      stage("s1 quality gate + substring dedup -> barrier") {
        val gated = cached.filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
        val spans = Dedup.dedupSpans(gated, "doc_id", "text", k = 8, minDocs = 2)
        cleaned = gated.select(col("doc_id"), col("source"), col("lang"))
          .join(spans.select(col("doc_id"), col("clean_text").as("t")),
            Seq("doc_id"))
          .transform(Curation.stageBarrier)
        cleaned.count()
      }
      var train: DataFrame = null
      stage("s2 minhash near-dup removal + holdout -> barrier") {
        val pairs = Dedup.minhashCandidates(cleaned, "doc_id", "t",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        train = cleaned
          .join(pairs.select(col("id_b").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .filter(col("doc_id") % 10 =!= 0)
          .transform(Curation.stageBarrier)
        train.count()
      }
      var decon: DataFrame = null
      stage("s3 benchmark decontamination (maxBenchDf=8, AS SHIPPED) " +
          "-> barrier") {
        // r15: the flagship now ships the maxBenchDf=8 stop-list (the
        // shape this probe's r14 run measured ~flat), so the composed
        // stage IS the guarded join — the r14 quadratic (14.3 GB
        // shuffle / 380 s / kept-collapse at 100x) was the unguarded
        // corpus-growing bench this row used to define.
        val bench = cached.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text").as("t"))
        val contaminated = Dedup.contamination(train, bench, "doc_id", "t",
          Dedup.Shingler.words(3), minCommon = 3, maxBenchDf = 8)
        decon = train.join(
            contaminated.select(col("id").as("doc_id")), Seq("doc_id"),
            "left_anti")
          .transform(Curation.stageBarrier)
        decon.count()
      }
      // reference readings, metered without the barrier so the row is
      // the join itself: the bounded-bench production contract, and the
      // UNGUARDED corpus-growing bench (the r14 measured quadratic —
      // kept only at 1x/10x as the regression witness; 100x of this
      // shape was 380 s / 14.3 GB and is deliberately not re-run)
      meter.probe(s"s3a contamination, bounded bench (base slice only) ${mult}x") {
        val benchB = cached
          .filter(col("doc_id") % 10 === 0 && col("doc_id") < n)
          .select(col("doc_id"), col("text").as("t"))
        Dedup.contamination(train, benchB, "doc_id", "t",
          Dedup.Shingler.words(3), minCommon = 3).count()
      }
      if (mult <= 10)
        meter.probe(s"s3u contamination UNGUARDED (r14 quadratic) ${mult}x") {
          val bench = cached.filter(col("doc_id") % 10 === 0)
            .select(col("doc_id"), col("text").as("t"))
          Dedup.contamination(train, bench, "doc_id", "t",
            Dedup.Shingler.words(3), minCommon = 3).count()
        }
      var kept: DataFrame = null
      stage("s4 DSIR importance filter -> barrier") {
        val dsir = LmSignals.dsirContrast(decon, "doc_id", "t",
          col("lang") === "en")
        kept = decon.join(
            dsir.filter(col("dsir_score") >= 0).select("doc_id"),
            Seq("doc_id"))
          .transform(Curation.stageBarrier)
        kept.count()
      }
      stage("s5-9 mixture + curriculum + shards + packing") {
        val mixed = Curation.temperatureMixture(kept, "source", "doc_id",
          alpha = 0.5, targetFrac = 0.5)
        val q = TextAnalysis.qualityScore(col("t"))
        val bucket = when(q >= 0.75, 0).when(q >= 0.5, 1)
          .when(q >= 0.25, 2).otherwise(3)
        val ordKey = concat(col("bucket").cast("string"), lit(":"),
          md5(concat(lit("r7:"), col("doc_id").cast("string"))))
        val sharded = Curation.seededShards(
          mixed.withColumn("bucket", bucket), "doc_id", nShards = 8,
          seed = "r7")
        Curation.packSequences(sharded.withColumn("__ord", ordKey),
            "shard", "__ord", "t", budget = 128)
          .groupBy(col("shard"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("seq_tokens"),
            min("doc_id").as("first_doc"))
          .count()
      }
      graft.core.Caches.releaseAll()
      cached.unpersist(blocking = true)
      // free the mult's barrier blocks before the next scale
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
  }

  /** Round-14b: streaming index-maintenance growth (r13 verdict task 5)
    * — per-APPEND cost for every at-rest index family as the ACCUMULATED
    * index grows 1×/10×/100× while the appended batch stays FIXED. The
    * foreachBatch maintainers (streaming/EventStream) call exactly these
    * append functions per micro-batch, so the function's cost IS the
    * per-micro-batch maintenance cost; driving a real file stream would
    * add trigger noise, not signal.
    *
    * Each family: full build at 1× → meter a fixed append → grow the
    * index to ~10× with one chunk append → meter the SAME fixed append →
    * grow to ~100× → meter again. The classic at-rest failure is
    * O(index) per batch; the meter therefore records INPUT bytes read
    * (the O(index) signature — task-metrics input bytes expose an
    * append that rescans the index) alongside wall and shuffle.
    *
    * Graph blocks follow the production contract (r13 lesson): replica
    * labels are SHIFTED so block COUNT grows with the corpus and block
    * size stays constant — a fixed label set at 100× grows every block
    * 100× and the blocked kNN join is quadratic no matter how the read
    * is pruned.
    * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.ScaleProbe r14b"
    */
  private def r14bProbe(spark: SparkSession): Unit = {
    import java.util.concurrent.atomic.AtomicLong
    import graft.ops.{Retrieval, Similarity}
    val read = new AtomicLong; val write = new AtomicLong
    val input = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            input.addAndGet(m.inputMetrics.bytesRead)
            ()
          }
        }
      })
    def settle(): Unit = {
      var prev = -1L
      var cur = read.get + write.get + input.get
      while (cur != prev) { Thread.sleep(300); prev = cur; cur = read.get + write.get + input.get }
    }
    def probe(tag: String)(f: => Unit): Unit = {
      settle()
      val (r0, w0, i0) = (read.get, write.get, input.get)
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      settle()
      println(f"$tag: $dt%.2f s, shuffle r ${(read.get - r0) / 1e6}%.1f" +
        f" / w ${(write.get - w0) / 1e6}%.1f MB, input read " +
        f"${(input.get - i0) / 1e6}%.1f MB")
    }
    val docsBase = spark.read
      .parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val nd = docsBase.count()
    val embBase = spark.read
      .parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding", "label")
    val ne = embBase.count()
    // replica r of either table: ids shifted by r·n; labels shifted by
    // r·10 (graph blocks: constant size, growing count). Replica 0 = base.
    def docsRep(r: Int) = docsBase.select(
      (col("doc_id") + lit(r.toLong * nd)).as("doc_id"), col("text"))
    def embRep(r: Int) = embBase.select(
      (col("vec_id") + lit(r.toLong * ne)).as("vec_id"), col("embedding"),
      (col("label") + lit(r * 10)).as("label"))
    // the metered gann batch must LAND IN EXISTING blocks (fresh ids,
    // base labels) — a label-shifted batch would link to nothing and
    // the append's candidate join would be trivially empty. 1/10 of a
    // replica, so the metered appends' own accumulation into the base
    // blocks stays negligible next to the block content they probe.
    def embRepBaseLabels(r: Int) = embBase
      .filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(r.toLong * ne)).as("vec_id"),
        col("embedding"), col("label"))
    def docsRange(from: Int, until: Int) =
      (from until until).map(docsRep).reduce(_ unionByName _)
    def embRange(from: Int, until: Int) =
      (from until until).map(embRep).reduce(_ unionByName _)
    // the FIXED metered batch: replicas 1000/1001/1002 (never in the
    // index growth range, so ids stay fresh at every milestone)
    def scratch(name: String) =
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + s"/graft_r14b_$name"
    def clear(path: String): Unit =
      graft.core.IndexCommits.fs(spark, path)
        .delete(new org.apache.hadoop.fs.Path(path), true)

    // ---- band index (minhash banding at rest) ----
    locally {
      val path = scratch("band"); clear(path)
      Dedup.writeBandIndex(docsRange(0, 1), "doc_id", "text", path)
      probe("band append B=const at index 1x")(
        Dedup.appendToBandIndex(docsRep(1000), "doc_id", "text", path, 1L))
      Dedup.appendToBandIndex(docsRange(1, 10), "doc_id", "text", path, 2L)
      probe("band append B=const at index 10x")(
        Dedup.appendToBandIndex(docsRep(1001), "doc_id", "text", path, 3L))
      Dedup.appendToBandIndex(docsRange(10, 100), "doc_id", "text", path, 4L)
      probe("band append B=const at index 100x")(
        Dedup.appendToBandIndex(docsRep(1002), "doc_id", "text", path, 5L))
    }
    // ---- BM25 index ----
    locally {
      val path = scratch("bm25"); clear(path)
      Retrieval.writeIndex(docsRange(0, 1), "doc_id", "text", path)
      probe("bm25 append B=const at index 1x")(
        Retrieval.appendToIndex(docsRep(1000), "doc_id", "text", path, 1L))
      Retrieval.appendToIndex(docsRange(1, 10), "doc_id", "text", path, 2L)
      probe("bm25 append B=const at index 10x")(
        Retrieval.appendToIndex(docsRep(1001), "doc_id", "text", path, 3L))
      Retrieval.appendToIndex(docsRange(10, 100), "doc_id", "text", path, 4L)
      probe("bm25 append B=const at index 100x")(
        Retrieval.appendToIndex(docsRep(1002), "doc_id", "text", path, 5L))
    }
    // ---- IVF layout ----
    locally {
      val path = scratch("ivf"); clear(path)
      Similarity.ivfWriteLayout(embRange(0, 1), "vec_id", "embedding",
        path, kClusters = 16, iters = 2)
      probe("ivf append B=const at index 1x")(
        Similarity.ivfAppendLayout(embRep(1000), "vec_id", "embedding",
          path, 1L))
      Similarity.ivfAppendLayout(embRange(1, 10), "vec_id", "embedding",
        path, 2L)
      probe("ivf append B=const at index 10x")(
        Similarity.ivfAppendLayout(embRep(1001), "vec_id", "embedding",
          path, 3L))
      Similarity.ivfAppendLayout(embRange(10, 100), "vec_id", "embedding",
        path, 4L)
      probe("ivf append B=const at index 100x")(
        Similarity.ivfAppendLayout(embRep(1002), "vec_id", "embedding",
          path, 5L))
    }
    // ---- IVFADC layout ----
    locally {
      val path = scratch("ivfadc"); clear(path)
      Similarity.ivfAdcWriteLayout(embRange(0, 1), "vec_id", "embedding",
        path, kCoarse = 4, coarseIters = 1, m = 4, k = 8, iters = 1,
        dims = 64)
      probe("ivfadc append B=const at index 1x")(
        Similarity.ivfAdcAppendLayout(embRep(1000), "vec_id", "embedding",
          path, 1L))
      Similarity.ivfAdcAppendLayout(embRange(1, 10), "vec_id", "embedding",
        path, 2L)
      probe("ivfadc append B=const at index 10x")(
        Similarity.ivfAdcAppendLayout(embRep(1001), "vec_id", "embedding",
          path, 3L))
      Similarity.ivfAdcAppendLayout(embRange(10, 100), "vec_id",
        "embedding", path, 4L)
      probe("ivfadc append B=const at index 100x")(
        Similarity.ivfAdcAppendLayout(embRep(1002), "vec_id", "embedding",
          path, 5L))
    }
    // ---- graph-ANN layout (the O(index)-read suspect) ----
    locally {
      val path = scratch("gann"); clear(path)
      Similarity.graphAnnWriteLayout(embRange(0, 1), "vec_id", "embedding",
        "label", path, kNbrs = 5)
      probe("gann append B=const at index 1x")(
        Similarity.graphAnnAppendLayout(embRepBaseLabels(1000), "vec_id",
          "embedding", "label", path, kNbrs = 5, batchId = 1L))
      Similarity.graphAnnAppendLayout(embRange(1, 10), "vec_id",
        "embedding", "label", path, kNbrs = 5, batchId = 2L)
      probe("gann append B=const at index 10x")(
        Similarity.graphAnnAppendLayout(embRepBaseLabels(1001), "vec_id",
          "embedding", "label", path, kNbrs = 5, batchId = 3L))
      Similarity.graphAnnAppendLayout(embRange(10, 100), "vec_id",
        "embedding", "label", path, kNbrs = 5, batchId = 4L)
      probe("gann append B=const at index 100x")(
        Similarity.graphAnnAppendLayout(embRepBaseLabels(1002), "vec_id",
          "embedding", "label", path, kNbrs = 5, batchId = 5L))
      // the multi-batch layout's residual per-append cost is per-FILE
      // metadata (listing + footers across every live batch dir) — the
      // cost compaction exists to reset; meter once more post-compaction
      Similarity.graphAnnCompactLayout(spark, path, "vec_id",
        newBatchId = 6L)
      Similarity.graphAnnVacuumLayout(spark, path)
      probe("gann append B=const at index 100x, post-compaction")(
        Similarity.graphAnnAppendLayout(embRepBaseLabels(1003), "vec_id",
          "embedding", "label", path, kNbrs = 5, batchId = 7L))
    }
  }

  /** Round-15: the graph family's 1×/10×/100× growth table (the last
    * heavy family without one — r8 stopped at 10×). Edge corpus = the
    * production pair source (MinHash banding over sf0.1 documents, the
    * exact graph_* query configuration), scaled by DISJOINT replicas
    * (node-id offsets): corpus growth multiplies near-dup FAMILIES, not
    * family size (the r12 replica discipline), so the expected shape of
    * every operator is linear-in-edges with constant per-copy skew.
    * Each scale also runs a HUB overlay — one synthetic node attached
    * to ~1% of all nodes, degree GROWING with the graph — the skew case
    * the orientation/partial-agg bounds exist for:
    *  - triangles: hub edges orient INTO the hub (it has max degree),
    *    so the hub contributes ~zero wedges — wall/shuffle vs the
    *    no-hub run is the measured price of the orientation bound;
    *  - kcore: the hub survives peeling but spokes with in-core degree
    *    < k drop in round 1; ROUNDS (printed via onRounds) is the
    *    growth term to watch — disjoint copies peel in the base
    *    graph's round count by construction;
    *  - lpa/modularity/pagerank: fixed round counts (4/4/3) by
    *    contract; per-round cost is one edge-list join + node-keyed
    *    partial-aggregated exchange, where the hub's (node,label)
    *    group is bounded map-side by partial aggregation.
    * Run: SPARK_DRIVER_MEM=24g sbt "runMain graft.ScaleProbe r15"
    */
  /** r15c: the ER family's 1×/10×/100× growth table (the last heavy
    * family left at 10×-era evidence after the graph probe), plus the
    * hot-block witness motivating `maxBlockDf`. Registry GROWTH (ids
    * 1..N with the production name format and the production dirty
    * perturbations), not replica salting: a bigger registry fills the
    * digit space denser, so per-key document frequency grows toward
    * its ~10-per-digit-position ceiling intrinsically — the honest
    * production growth shape. The hot overlay puts a placeholder name
    * ("UNKNOWN ENTITY") on a FIXED 1% of BOTH sides — the real-world
    * dirty-data shape whose candidate block is quadratic in corpus
    * size by construction; the capped run shows the guard removing it.
    */
  private def r15cErProbe(spark: SparkSession): Unit = {
    import graft.ops.EntityResolution
    val meter = new ShuffleMeter(spark)
    val baseN = 15000L // sf0.1 customer count
    for (mult <- Seq(1, 10, 100)) {
      val n = baseN * mult
      val base = spark.range(1L, n + 1L)
        .select(col("id").as("c_custkey"),
          format_string("Customer#%09d", col("id")).as("c_name"))
      def dirtyName = when(col("c_custkey") % 30 === 1,
          expr("substr(c_name, 1, length(c_name) - 1)"))
        .when(col("c_custkey") % 3 === 0,
          concat(expr("substr(c_name, 1, 5)"), lit("X"),
            expr("substr(c_name, 7)")))
        .when(col("c_custkey") % 3 === 1,
          concat(expr("substr(c_name, 1, 5)"), expr("substr(c_name, 7)")))
        .otherwise(col("c_name"))
      def hot(c: Column) = when(col("c_custkey") % 100 === 7,
        lit("UNKNOWN ENTITY")).otherwise(c)
      val clean = base.select(col("c_custkey").as("clean_id"),
        col("c_name").as("name")).repartition(32).localCheckpoint(true)
      val dirty = base.select((col("c_custkey") + 1000000000L)
          .as("dirty_id"), dirtyName.as("name"))
        .repartition(32).localCheckpoint(true)
      val cleanHot = base.select(col("c_custkey").as("clean_id"),
        hot(col("c_name")).as("name")).repartition(32).localCheckpoint(true)
      val dirtyHot = base.select((col("c_custkey") + 1000000000L)
          .as("dirty_id"), hot(dirtyName).as("name"))
        .repartition(32).localCheckpoint(true)
      println(s"== r15c ER probe mult=$mult: $n records/side ==")
      meter.probe(s"er candidates ${mult}x") {
        EntityResolution.candidates(dirty, "dirty_id", clean, "clean_id",
          "name").count()
      }
      meter.probe(s"er bestMatch ${mult}x") {
        EntityResolution.bestMatch(dirty, "dirty_id", clean, "clean_id",
          "name").count()
      }
      meter.probe(s"er bestMatch capped(8) ${mult}x") {
        EntityResolution.bestMatch(dirty, "dirty_id", clean, "clean_id",
          "name", maxDist = 1, maxBlockDf = Some(8L)).count()
      }
      meter.probe(s"er clusters ${mult}x") {
        EntityResolution.clusters(dirty, "dirty_id", clean, "clean_id",
          "name").count()
      }
      graft.core.Caches.releaseAll()
      if (mult <= 10) {
        // the UNGUARDED hot-block witness: 1%·N placeholder rows per
        // side → (N/100)² candidate pairs from one key family; at 100×
        // that is 2.25e10 pairs — deliberately not run (the r14 s3u
        // convention: witness at the scales that prove the trend)
        meter.probe(s"er candidates hot-1% UNGUARDED ${mult}x") {
          EntityResolution.candidates(dirtyHot, "dirty_id", cleanHot,
            "clean_id", "name").count()
        }
        graft.core.Caches.releaseAll()
      }
      meter.probe(s"er bestMatch hot-1% capped(8) ${mult}x") {
        EntityResolution.bestMatch(dirtyHot, "dirty_id", cleanHot,
          "clean_id", "name", maxDist = 1, maxBlockDf = Some(8L)).count()
      }
      graft.core.Caches.releaseAll()
    }
  }

  private def r15GraphProbe(spark: SparkSession): Unit = {
    import graft.ops.Graphs
    val meter = new ShuffleMeter(spark)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    // the production pair source, materialized ONCE: the probe meters
    // the graph operators, not banding (banding growth has its own r12
    // table)
    val pairsBase = Dedup.minhashCandidates(docs, "doc_id", "text",
        Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
      .select(col("id_a"), col("id_b")).repartition(32).cache()
    val eBase = pairsBase.count()
    val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    println(s"== r15 graph probe: base edges=$eBase, id offset=$off ==")
    // both corpora below get an EAGER LINEAGE CUT (localCheckpoint)
    // before the operators run: the probe's first pass cached the
    // 100-branch union instead, and every operator's wall then grew
    // with PLAN size at flat shuffle bytes (triangles 1.6 -> 60.8 s at
    // 0.1 -> 1.3 MB) — cache substitution happens at physical
    // planning, so analysis/optimization re-walks the full union
    // lineage at every exchange of every op. That reading IS a real
    // lesson (assemble a corpus from many branches, cut lineage before
    // iterating on it — the stageBarrier discipline), but it meters
    // the harness, not the operators.
    for (mult <- Seq(1, 10, 100)) {
      val pairs = (
        if (mult == 1) pairsBase
        else (0 until mult).map { i =>
          pairsBase.select((col("id_a") + lit(i * off)).as("id_a"),
            (col("id_b") + lit(i * off)).as("id_b"))
        }.reduce(_ unionByName _)
      ).repartition(32).localCheckpoint(true)
      val e = pairs.count()
      // hub overlay: one node (id -1, outside every copy's range) wired
      // to ~1% of ALL nodes — hub degree grows 10x per decade
      val spokes = pairs.select(col("id_a").as("id"))
        .union(pairs.select(col("id_b").as("id"))).distinct()
        .filter(abs(hash(col("id"))) % 100 === 0)
      val withHub = pairs.unionByName(
        spokes.select(lit(-1L).as("id_a"), col("id").as("id_b")))
        .repartition(32).localCheckpoint(true)
      val eh = withHub.count()
      println(s"== mult=$mult: $e edges, hub overlay ${eh - e} spokes ==")
      meter.probe(s"triangles ${mult}x") {
        Graphs.triangles(pairs, "id_a", "id_b").count()
      }
      graft.core.Caches.releaseAll()
      meter.probe(s"triangles+hub ${mult}x (hub deg ${eh - e})") {
        Graphs.triangles(withHub, "id_a", "id_b").count()
      }
      graft.core.Caches.releaseAll()
      var rounds = -1
      meter.probe(s"kcore k=2 ${mult}x") {
        Graphs.kCore(pairs, "id_a", "id_b", k = 2, maxRounds = 16,
          onRounds = r => { rounds = r }).count()
      }
      println(s"  kcore rounds at ${mult}x: $rounds")
      graft.core.Caches.releaseAll()
      meter.probe(s"kcore+hub k=2 ${mult}x") {
        Graphs.kCore(withHub, "id_a", "id_b", k = 2, maxRounds = 16,
          onRounds = r => { rounds = r }).count()
      }
      println(s"  kcore+hub rounds at ${mult}x: $rounds")
      graft.core.Caches.releaseAll()
      meter.probe(s"lpa iters=4 ${mult}x") {
        Graphs.labelPropagation(pairs, "id_a", "id_b", iters = 4).count()
      }
      graft.core.Caches.releaseAll()
      meter.probe(s"modularity iters=4 ${mult}x") {
        Graphs.modularity(pairs, "id_a", "id_b", iters = 4).count()
      }
      graft.core.Caches.releaseAll()
      meter.probe(s"modularity+hub iters=4 ${mult}x") {
        Graphs.modularity(withHub, "id_a", "id_b", iters = 4).count()
      }
      graft.core.Caches.releaseAll()
      meter.probe(s"pagerank iters=3 ${mult}x") {
        Graphs.pageRank(pairs, "id_a", "id_b", damping = 0.85,
          iters = 3).count()
      }
      graft.core.Caches.releaseAll()
    }
    pairsBase.unpersist()

    // ---- synthetic heavy-tailed graph: the DATA-dominated table ----
    // The production pair source at sf0.1 is only ~255 edges, so the
    // replica table above mostly meters fixed per-exchange overhead.
    // This section scales edge volume to where the data term dominates
    // (100k / 1M / 10M edges, constant avg degree 10) with an INTRINSIC
    // heavy tail: endpoints are floor(V * u^1.5) of hash-uniform u, so
    // the densest node's degree grows ~E^(1/3) (≈1,000 at 10M edges) —
    // the skew case the orientation/partial-agg bounds exist for,
    // without any overlay. Deterministic (xxhash64 of salted range
    // ids), generated in one codegen'd projection — no union lineage.
    def synthGraph(eTarget: Long, salt: String): org.apache.spark.sql.DataFrame = {
      val v = eTarget / 10
      def endpoint(tag: String) = {
        val u = (abs(xxhash64(lit(s"$salt:$tag"), col("id")))
          % lit(1000000007L)).cast("double") / lit(1.0e9)
        floor(lit(v.toDouble) * pow(u, lit(1.5))).cast("long")
      }
      spark.range(0L, eTarget, 1L, 32)
        .select(endpoint("a").as("id_a"), endpoint("b").as("id_b"))
        .filter(col("id_a") =!= col("id_b"))
    }
    for ((e, tag) <- Seq((100000L, "1x"), (1000000L, "10x"),
        (10000000L, "100x"))) {
      val g = synthGraph(e, "r15synth").localCheckpoint(true)
      val rows = g.count()
      val degTop = g.select(col("id_a").as("id"))
        .union(g.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("d"))
        .agg(max(col("d"))).head().getLong(0)
      println(s"== synth $tag: $rows edges, max degree $degTop ==")
      meter.probe(s"synth triangles $tag") {
        Graphs.triangles(g, "id_a", "id_b").count()
      }
      graft.core.Caches.releaseAll()
      var rounds = -1
      meter.probe(s"synth kcore k=2 $tag") {
        Graphs.kCore(g, "id_a", "id_b", k = 2, maxRounds = 32,
          onRounds = r => { rounds = r }).count()
      }
      println(s"  synth kcore rounds $tag: $rounds")
      graft.core.Caches.releaseAll()
      meter.probe(s"synth lpa iters=4 $tag") {
        Graphs.labelPropagation(g, "id_a", "id_b", iters = 4).count()
      }
      graft.core.Caches.releaseAll()
      meter.probe(s"synth modularity iters=4 $tag") {
        Graphs.modularity(g, "id_a", "id_b", iters = 4).count()
      }
      graft.core.Caches.releaseAll()
      meter.probe(s"synth pagerank iters=3 $tag") {
        Graphs.pageRank(g, "id_a", "id_b", damping = 0.85,
          iters = 3).count()
      }
      graft.core.Caches.releaseAll()
    }
    ()
  }

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(10)
    val onlyR9 = args.contains("r9")  // round-9 probes only
    val onlyR8c = args.contains("r8c") // session-3 probes only
    val onlyR8 = (args.contains("r8") || onlyR8c) && !onlyR9
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("r12")) { r12Probe(spark); spark.stop(); return }
    if (args.contains("r12b")) { r12bProbe(spark); spark.stop(); return }
    if (args.contains("r13")) { r13Probe(spark); spark.stop(); return }
    if (args.contains("r14")) { r14Probe(spark); spark.stop(); return }
    if (args.contains("r14b")) { r14bProbe(spark); spark.stop(); return }
    if (args.contains("r15")) { r15GraphProbe(spark); spark.stop(); return }
    if (args.contains("r15c")) { r15cErProbe(spark); spark.stop(); return }
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val docs = (0 until mult).map { i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"),
        // salt replica text so cross-replica pairs aren't all near-dups
        concat(col("text"), lit(s" replica_marker_$i")).as("text"))
    }.reduce(_ unionByName _).repartition(32).cache()
    println(s"docs: ${docs.count()}")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    if (!onlyR8 && !args.contains("r9f")) {
      time("warm minhash")(Dedup.minhashCandidates(
        base.limit(500).cache(), "doc_id", "text").count())
      time(s"minhash x$mult")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
      time(s"jaccard x$mult")(Dedup.jaccardPairs(docs, "doc_id", "text").count())
      time(s"simhash x$mult")(Dedup.simhash16(docs, "doc_id", "text").count())
    }

    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val en = embBase.count()
    val emb = (0 until mult).map { i =>
      embBase.select((col("vec_id") + lit(i * en)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _).repartition(32).cache()
    println(s"vectors: ${emb.count()}")

    if (args.contains("r9f")) {
      // r9 session-6 probes. Expected shapes:
      // madOutliers = two quantilesByKey rounds + one keyed agg → ~6
      //   linear scans, flat per-row tail; modularity = the LPA round
      //   shape + two node-keyed label joins; assortativity = one degree
      //   count + two joins + a 6-cell aggregate (~linear); stickiness /
      //   interarrival follow the (user, day)-dedup / window-lag shapes;
      //   knnClassify = ONE corpus scan for a fixed anchor set (linear);
      //   rangeSearch = one scan-stage cosine + filter (linear).
      val evBase0 = graft.core.Tables.events(spark, "/root/testdata/sf0.1")
        .select("event_id", "user_id", "ts", "event_type", "value")
      val evn = evBase0.count()
      val ev = (0 until mult).map { i =>
        evBase0.select((col("event_id") + lit(i * evn)).as("event_id"),
          (col("user_id") + lit(i * 1000000L)).as("user_id"),
          col("ts"), col("event_type"), col("value"))
      }.reduce(_ unionByName _).repartition(32).cache()
      println(s"events: ${ev.count()}")
      time(s"mad outliers 1x ($evn events)")(graft.ops.Profile
        .madOutliers(evBase0, "event_type", "value").count())
      time(s"mad outliers ${mult}x")(graft.ops.Profile
        .madOutliers(ev, "event_type", "value").count())
      time(s"stickiness 1x")(graft.ops.EventOps
        .stickiness(evBase0, "user_id", "ts").count())
      time(s"stickiness ${mult}x")(graft.ops.EventOps
        .stickiness(ev, "user_id", "ts").count())
      time(s"interarrival q 1x")(graft.ops.Profile.quantilesByKey(
        graft.ops.EventOps.interarrivalGaps(evBase0, "user_id", "ts",
          "event_type", "event_id"),
        "event_type", "gap_us", Seq(0.5, 0.9, 0.99)).count())
      time(s"interarrival q ${mult}x")(graft.ops.Profile.quantilesByKey(
        graft.ops.EventOps.interarrivalGaps(ev, "user_id", "ts",
          "event_type", "event_id"),
        "event_type", "gap_us", Seq(0.5, 0.9, 0.99)).count())
      def modProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit =
        time(s"modularity $tag")(graft.ops.Graphs.modularity(
          Dedup.minhashCandidates(df, "doc_id", "text"),
          "id_a", "id_b").count())
      modProbe(base, s"1x ($n docs)")
      modProbe(docs, s"${mult}x")
      def asProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit =
        time(s"assortativity $tag")(graft.ops.Graphs.assortativity(
          Dedup.minhashCandidates(df, "doc_id", "text"),
          "id_a", "id_b").count())
      asProbe(base, s"1x ($n docs)")
      asProbe(docs, s"${mult}x")
      val q0 = graft.ops.Similarity.vectorOf(embBase, "vec_id",
        "embedding", 0L)
      time(s"range search 1x ($en vecs)")(graft.ops.Similarity
        .rangeSearch(embBase, "vec_id", "embedding", q0, 0.2).count())
      time(s"range search ${mult}x")(graft.ops.Similarity
        .rangeSearch(emb, "vec_id", "embedding", q0, 0.2).count())
      time(s"knn classify 1x ($en vecs)")(graft.ops.Similarity
        .knnClassify(embBase, "vec_id", "embedding", "label",
          (0L to 490L by 10).toSeq, k = 5).count())
      time(s"knn classify ${mult}x")(graft.ops.Similarity
        .knnClassify(emb, "vec_id", "embedding", "label",
          (0L to 490L by 10).toSeq, k = 5).count())
      // sim_sparse: candidates come from df-capped postings — at 10×
      // docs every gram's df grows ~10×, so the cap bites HARDER and
      // candidate volume cannot scale quadratically (expect sublinear
      // pair counts; the salt grams keep within-replica pairs alive)
      def sparseProbe(df: org.apache.spark.sql.DataFrame,
                      tag: String): Unit =
        time(s"sparse cosine $tag")(graft.ops.Similarity
          .sparseCosinePairs(df, "doc_id",
            graft.ops.Similarity.wordNgrams(col("text"), 2), maxDf = 50)
          .count())
      sparseProbe(base, s"1x ($n docs)")
      sparseProbe(docs, s"${mult}x")
      time(s"bootstrap ci 1x ($n docs)")(graft.ops.Profile
        .bootstrapMeanCI(base.select(col("doc_id"),
          org.apache.spark.sql.functions.length(col("text"))
            .cast("long").as("n_chars")), "doc_id", "n_chars").count())
      time(s"bootstrap ci ${mult}x")(graft.ops.Profile
        .bootstrapMeanCI(docs.select(col("doc_id"),
          org.apache.spark.sql.functions.length(col("text"))
            .cast("long").as("n_chars")), "doc_id", "n_chars").count())
      spark.stop()
      return
    }

    if (args.contains("r9b")) {
      // r9 session-2 probes. Expected shapes:
      // LPA / k-core / BFS = per-round node-keyed joins against the
      // cached edge list (~linear in edges per round; k-core rounds
      // data-dependent but early-exited);
      // textrank = per-doc windows² pair stage (linear in docs at
      // fixed doc length) + 2 bounded pagerank rounds;
      // knn-graph build = per-block |block|² dots — HELD FLAT by
      // growing the block COUNT with the corpus (fixed occupancy, the
      // learned-cell discipline); serve = hops × beam × degree
      // candidate scorings + one entry per block (grows only with
      // block count).
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        Dedup.minhashCandidates(df, "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
      def rel(): Unit = graft.core.Caches.releaseAll()
      time(s"lpa 1x ($n docs)")(
        graft.ops.Graphs.labelPropagation(pairsOf(base), "id_a", "id_b").count())
      rel()
      time(s"lpa ${mult}x")(
        graft.ops.Graphs.labelPropagation(pairsOf(docs), "id_a", "id_b").count())
      rel()
      time(s"kcore 1x")(
        graft.ops.Graphs.kCore(pairsOf(base), "id_a", "id_b", k = 2).count())
      rel()
      time(s"kcore ${mult}x")(
        graft.ops.Graphs.kCore(pairsOf(docs), "id_a", "id_b", k = 2).count())
      rel()
      time(s"bfs 1x")(
        graft.ops.Graphs.bfsLandmarks(pairsOf(base), "id_a", "id_b").count())
      rel()
      time(s"bfs ${mult}x")(
        graft.ops.Graphs.bfsLandmarks(pairsOf(docs), "id_a", "id_b").count())
      rel()
      time(s"textrank 1x ($n docs)")(
        graft.ops.TextAnalysis.textRankWindows(base, "doc_id", "text").count())
      rel()
      time(s"textrank ${mult}x")(
        graft.ops.TextAnalysis.textRankWindows(docs, "doc_id", "text").count())
      rel()
      // fixed-occupancy scale-up: replicas land in FRESH blocks, so
      // block size stays ~|label block| while block count grows 10x
      val embSpread = (0 until mult).map { i =>
        embBase.select((col("vec_id") + lit(i * en)).as("vec_id"),
          col("embedding"), (col("label") + lit(i * 10)).as("label"))
      }.reduce(_ unionByName _).repartition(32).cache()
      println(s"spread vectors: ${embSpread.count()} in ${mult * 10} blocks")
      val qv = graft.ops.Similarity.vectorOf(embBase, "vec_id", "embedding", 0L)
      time(s"knn-graph build 1x ($en vecs, 10 blocks)")(
        graft.ops.Similarity.knnGraph(embBase, "vec_id", "embedding",
          "label", 5).count())
      rel()
      time(s"knn-graph build ${mult}x (${mult * 10} blocks, fixed occupancy)")(
        graft.ops.Similarity.knnGraph(embSpread, "vec_id", "embedding",
          "label", 5).count())
      rel()
      time("graphann serve 1x")(
        graft.ops.Similarity.graphAnnTopK(embBase, "vec_id", "embedding",
          "label", qv, k = 10, kNbrs = 5, beam = 24, hops = 4).count())
      rel()
      time(s"graphann serve ${mult}x")(
        graft.ops.Similarity.graphAnnTopK(embSpread, "vec_id", "embedding",
          "label", qv, k = 10, kNbrs = 5, beam = 24, hops = 4).count())
      rel()
      spark.stop()
      return
    }
    if (args.contains("r9c")) {
      // r9 session-3 probes. Expected shapes:
      // walks = length × (frontier join against cached pre-partitioned
      // edges + partial-aggregated argmin) — linear in nodes;
      // pca moment pass = one explode×2145 map-side-combined aggregate
      // — linear in vectors (the eigensolve is driver-flat);
      // winnow = one doc-partitioned sliding window — linear in chars;
      // incremental CC = fold(star(prev), new batch pairs) — tracks
      // the BATCH, vs the full rebuild tracking the corpus;
      // bloom join = dim-scan + filtered fact exchange vs the plain
      // join's full fact exchange.
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        Dedup.minhashCandidates(df, "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
      def rel(): Unit = graft.core.Caches.releaseAll()
      time(s"walks 1x ($n docs)")(
        graft.ops.Graphs.deterministicWalks(pairsOf(base), "id_a", "id_b",
          4).count())
      rel()
      time(s"walks ${mult}x")(
        graft.ops.Graphs.deterministicWalks(pairsOf(docs), "id_a", "id_b",
          4).count())
      rel()
      time(s"biased walks ${mult}x")(
        graft.ops.Graphs.biasedWalks(pairsOf(docs), "id_a", "id_b",
          3).count())
      rel()
      time(s"pca moments+solve 1x ($en vecs)")(
        graft.ops.Similarity.pcaTopComponent(embBase, "embedding",
          64).count())
      rel()
      time(s"pca moments+solve ${mult}x")(
        graft.ops.Similarity.pcaTopComponent(emb, "embedding", 64).count())
      rel()
      time(s"winnow 1x")(
        graft.ops.TextAnalysis.winnow(base, "doc_id", "text").count())
      rel()
      time(s"winnow ${mult}x")(
        graft.ops.TextAnalysis.winnow(docs, "doc_id", "text").count())
      rel()
      // incremental CC: history = the multiplied corpus minus one
      // replica; new batch = that replica's pairs
      val hist = docs.filter(col("doc_id") < (mult - 1).toLong * n)
      val prev = Dedup.connectedComponents(
        pairsOf(hist), "id_a", "id_b").cache()
      println(s"history assignment: ${prev.count()} nodes")
      val newPairs = pairsOf(docs)
        .filter(col("id_a") >= (mult - 1).toLong * n ||
          col("id_b") >= (mult - 1).toLong * n).cache()
      println(s"new-batch pairs: ${newPairs.count()}")
      time(s"incremental CC fold (1 batch onto ${mult - 1}x history)")(
        Dedup.incrementalComponents(prev, newPairs, "id_a", "id_b").count())
      rel()
      time(s"full CC rebuild (${mult}x)")(
        Dedup.connectedComponents(pairsOf(docs), "id_a", "id_b").count())
      rel()
      // bloom-reduced vs plain join on a replicated fact side
      val liBase = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ln = liBase.count()
      val li = (0 until mult).map(_ => liBase).reduce(_ unionByName _)
        .repartition(32).cache()
      println(s"fact rows: ${li.count()} (${ln} x $mult)")
      val dim = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        .filter(col("o_orderstatus") === "P").select("o_orderkey").cache()
      println(s"dim keys: ${dim.count()}")
      // model the dim-too-big-to-broadcast regime the operator exists
      // for: force the shuffle join so "plain" pays the full fact
      // exchange and the bloom probe's reduction is what's measured
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time(s"plain shuffle join ${mult}x fact")(
        li.join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey")).count().count())
      time(s"bloom-reduced join ${mult}x fact")(
        graft.ops.RuntimeFilters.bloomReducedJoin(li, dim,
            "l_orderkey", "o_orderkey", expectedItems = 200000L)
          .groupBy(col("l_orderkey")).count().count())
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.stop()
      return
    }
    if (onlyR9) {
      // r9 probes. Expected shapes:
      // band-index ingest = shingle/hash ONLY the appended batch (~flat
      // as history grows: cost ∝ batch); serve = (id, band, h) rows +
      // one (band, h) window + the banding-capped pair join (~linear in
      // served rows, never corpus text);
      // phash near-dup = a per-row integer hash (scan-linear) + the
      // 64-bit pigeonhole equi-join (fan-out = real near-dup density);
      // unigram train = ONE corpus pass to the word table (~linear) +
      // driver-local EM on the vocab-bounded table (flat);
      // opq train = one variance aggregate + 2 PQ trainings + 2
      // distortion aggregates — pass-linear, zero per-row training.
      val idxDir = java.nio.file.Files.createTempDirectory("graft_probe_bidx")
        .toString + "/idx"
      time(s"band-index build 1x ($n docs)") {
        Dedup.writeBandIndex(base, "doc_id", "text", idxDir); 0L
      }
      time(s"band-index ${mult}x history build + 1-batch append") {
        // history is the big multiplied corpus; the append is ONE replica
        Dedup.writeBandIndex(docs, "doc_id", "text", idxDir)
        val t0 = System.nanoTime()
        Dedup.appendToBandIndex(
          base.select((col("doc_id") + lit(mult.toLong * n)).as("doc_id"),
            concat(col("text"), lit(" replica_marker_x")).as("text")),
          "doc_id", "text", idxDir, batchId = 1L)
        println(f"  (append alone: ${(System.nanoTime() - t0) / 1e9}%.2f s)")
        0L
      }
      time(s"band-index serve ${mult}x+1 batches")(
        Dedup.bandIndexCandidates(spark, idxDir, "doc_id").count())
      time(s"minhash rebuild ${mult}x (serve comparison)")(
        Dedup.minhashCandidates(docs, "doc_id", "text").count())
      time(s"phash neardup 1x ($n docs)") {
        val sig = graft.ops.Multimodal.perceptualHash(
            graft.ops.Multimodal.gradientFixture(
              base.select("doc_id"), "doc_id"), "payload")
          .select(col("doc_id"), col("phash").as("simhash"))
        Dedup.simhashPairs(sig, "doc_id", maxHamming = 3, bits = 64).count()
      }
      time(s"phash neardup ${mult}x") {
        val sig = graft.ops.Multimodal.perceptualHash(
            graft.ops.Multimodal.gradientFixture(
              docs.select("doc_id"), "doc_id"), "payload")
          .select(col("doc_id"), col("phash").as("simhash"))
        Dedup.simhashPairs(sig, "doc_id", maxHamming = 3, bits = 64).count()
      }
      time(s"phash neardup ${mult}x capped (maxChunkDf=256)") {
        val sig = graft.ops.Multimodal.perceptualHash(
            graft.ops.Multimodal.gradientFixture(
              docs.select("doc_id"), "doc_id"), "payload")
          .select(col("doc_id"), col("phash").as("simhash"))
        Dedup.simhashPairs(sig, "doc_id", maxHamming = 3, bits = 64,
          maxChunkDf = 256).count()
      }
      time(s"unigram train 1x ($n docs)") {
        graft.ops.UnigramLm.train(base, "text"); 0L
      }
      time(s"unigram train ${mult}x") {
        graft.ops.UnigramLm.train(docs, "text"); 0L
      }
      time(s"opq train 1x (${en} vecs)") {
        graft.ops.Similarity.opqTrainedPermutation(
          embBase, "vec_id", "embedding", 4, 8, 1, 64); 0L
      }
      time(s"opq train ${mult}x") {
        graft.ops.Similarity.opqTrainedPermutation(
          emb, "vec_id", "embedding", 4, 8, 1, 64); 0L
      }
      spark.stop()
      return
    }
    val q = graft.ops.Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
    if (!onlyR8) {
      time(s"emb near-dup x$mult")(Dedup.embeddingNearDups(
        emb, "vec_id", "embedding", "label", 0.4).count())
      // hot-block fix: same op with B=4 sub-blocking (16 cells per block
      // instead of 1 — the fixture's 10 clusters stop capping parallelism)
      time(s"emb near-dup x$mult B=4")(Dedup.embeddingNearDups(
        emb, "vec_id", "embedding", "label", 0.4, subBlocks = 4).count())
      time(s"brute topk x$mult")(
        graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).count())
      time(s"ivf topk x$mult")(graft.ops.Similarity.ivfTopK(
        emb, "vec_id", "embedding", "label", q, 10, 3).count())
    }

    // round-2 operators at scale: as-of join + connected components
    val evBase = graft.core.Tables.events(spark, "/root/testdata/sf0.1")
    val evn = evBase.count()
    val ev = (0 until mult).map { i =>
      evBase.select((col("event_id") + lit(i * evn)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * 1000)).as("user_id"),
        col("event_type"), col("value"))
    }.reduce(_ unionByName _).repartition(32).cache()
    println(s"events: ${ev.count()}")
    if (!onlyR8) {
    time(s"asof join x$mult") {
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("v_us"))
      graft.plans.AsOfJoin.asof(p, v, Seq("user_id"), Seq("v_user"),
        "p_us", "v_us").count()
    }
    time(s"cc over minhash pairs x$mult") {
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      Dedup.connectedComponents(pairs, "id_a", "id_b").count()
    }
    // adversarial long-chain graph: pointer jumping vs small/large-star.
    // An n-node path is the worst-case diameter for label propagation;
    // probing 1x AND 10x the chain shows the round count growing with
    // log(diameter), not diameter — the property that survives 100 TB.
    def chainProbe(n: Long): Unit = {
      val chain = spark.range(0L, n)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val t0 = System.nanoTime()
      val (pj, pjRounds) = Dedup.connectedComponentsWithRounds(
        chain, "id_a", "id_b", maxIter = 60)
      val pjN = pj.filter(col("label") === 0L).count()
      val t1 = System.nanoTime()
      val (st, stRounds) = Dedup.connectedComponentsStarWithRounds(
        chain, "id_a", "id_b", maxIter = 60)
      val stN = st.filter(col("label") === 0L).count()
      val t2 = System.nanoTime()
      println(f"chain-$n%d pointer-jump: ${(t1 - t0) / 1e9}%.2f s, " +
        f"$pjRounds rounds ($pjN labeled 0)")
      println(f"chain-$n%d star:         ${(t2 - t1) / 1e9}%.2f s, " +
        f"$stRounds rounds ($stN labeled 0)")
    }
    chainProbe(100000L)
    chainProbe(1000000L)

    // round-2 session operators: curation + quantized ANN at scale
    time(s"redact x$mult")(docs.select(col("doc_id"),
      graft.ops.Curation.redact(col("text")).as("t")).count())
    time(s"pack x$mult")(graft.ops.Curation.packSequences(
      docs.withColumn("source", col("doc_id") % 512), "source", "doc_id",
      "text", 2048).groupBy("source", "seq_id").count().count())
    time(s"sample x$mult")(graft.ops.Curation.stratifiedSample(
      docs, "doc_id", "doc_id", Map.empty, 0.25).count())
    time(s"quant topk x$mult")(graft.ops.Similarity.quantTopK(
      emb, "vec_id", "embedding", 0L, 10, rescore = 50).count())
    time(s"embed x$mult")(graft.ops.Inference.embed(
      docs.select(col("doc_id"), col("text")), "text").count())
    // round-3 operators: codegen'd subword tokenization + real image codec
    time(s"wordpiece x$mult")(docs
      .select(graft.ops.Truncate.subwordCount(col("text")).as("n"))
      .agg(sum("n")).count())
    time("mm codec 5k imgs") {
      val fx = graft.ops.Multimodal.imageFixture(
        spark.range(5000).select(col("id").as("doc_id")), "doc_id")
      graft.ops.Multimodal.extractMeta(fx, "payload")
        .filter(col("meta.format") === "png").count()
    }

    // round-6: byte-budget repartition on a skewed-payload fixture — 1%
    // of rows carry a 500× payload (the multimodal hot-row shape). The
    // probe verifies the EXACT bound survives skew at two scales: max
    // partition bytes <= target + max single row (a row is indivisible).
    def byteProbe(rows: Long, tag: String): Unit = {
      val skewed = spark.range(0L, rows).select(col("id"),
        when(col("id") % 100 === 0,
          // hot row: ~100 KB; cold row: ~200 B
          concat_ws("", array_repeat(lit("x" * 1000), 100)))
          .otherwise(concat_ws("", array_repeat(lit("y" * 100), 2)))
          .as("payload")).localCheckpoint(true)
      val target = 8L * 1024 * 1024
      val t0 = System.nanoTime()
      val out = graft.ops.Layout.repartitionByBytes(skewed, "payload", target)
      val perPart = out.select(length(col("payload")).cast("long").as("b"))
        .withColumn("p", expr("spark_partition_id()"))
        .groupBy("p").agg(sum("b").as("bytes"))
        .select("bytes").collect().map(_.getLong(0))
      val secs = (System.nanoTime() - t0) / 1e9
      val maxRow = 100L * 1000
      println(f"byte-budget $tag: $secs%.2f s, ${perPart.length} parts, " +
        f"max ${perPart.max / 1e6}%.1f MB vs bound ${(target + maxRow) / 1e6}%.1f MB, " +
        f"spread max/avg ${perPart.max.toDouble / (perPart.sum / perPart.length)}%.2f")
      assert(perPart.max <= target + maxRow, "byte bound violated")
    }
    byteProbe(100000L, "100k skewed")
    byteProbe(1000000L, "1M skewed (10x)")

    // round-6: trained k-means pass-linearity — same k/iters at 1x and
    // 10x the vectors; Lloyd's cost is (iters+1) scans + k·dims
    // aggregates, so wall-time should grow ~linearly with the data and
    // the round STRUCTURE (pass count) not at all.
    def kmeansProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit =
      time(s"kmeans k=8 iters=3 $tag")(graft.ops.Similarity.kmeansAssign(
        df, "vec_id", "embedding", k = 8, iters = 3).count())
    kmeansProbe(embBase, s"1x ($en vecs)")
    kmeansProbe(emb, s"${mult}x")

    // round-6 batch 3: retrieval + tokenizer training at 1x and 10x.
    // invindex/bm25/pmi are scan+keyed-agg shapes (expect ~linear);
    // BPE's merge loop runs on the word table, whose size BARELY moves
    // when the corpus replicates (same vocabulary, higher counts) — the
    // probe shows training wall-time nearly FLAT at 10x the corpus,
    // which is the whole point of the word-frequency formulation.
    def retrievalProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      time(s"invindex $tag")(graft.ops.Retrieval.invertedIndex(
        df, "doc_id", "text", maxDf = Long.MaxValue).count())
      time(s"bm25 $tag")(graft.ops.Retrieval.bm25(
        df, "doc_id", "text", Seq("dup", "spark", "vector"), 15).count())
      time(s"pmi $tag")(graft.ops.LmSignals.pmiCollocations(
        df, "text", minCount = 5L, topK = 20).count())
      time(s"bpe 8 merges $tag")(graft.ops.BpeTrain.learnMerges(
        df, "text", nMerges = 8).count())
      time(s"stratum-k $tag")(graft.ops.Curation.exactKPerStratum(
        df.withColumn("src", col("doc_id") % 32), "src", "doc_id", 3).count())
    }
    retrievalProbe(base, s"1x ($n docs)")
    retrievalProbe(docs, s"${mult}x")
    // round-7: cross-doc substring dedup at 1x and 10x — the k-gram
    // explode is k× corpus rows (fixed-width hashes, not text) and the
    // coverage join sees only DUPLICATED grams, so expect ~linear
    // wall-time. The salted replicas share every interior 8-gram, so the
    // duplicated-gram dictionary grows with the duplication rate — the
    // probe exercises exactly the dictionary-size dependence.
    time(s"substring dedup 1x ($n docs)")(
      Dedup.dedupSpans(base, "doc_id", "text", k = 8).count())
    time(s"substring dedup ${mult}x")(
      Dedup.dedupSpans(docs, "doc_id", "text", k = 8).count())
    // round-7: BPE at a REAL merge budget — merge learning is driver-local
    // on the collected vocab-bounded word table, so 125x the r6 query's
    // merge budget must not multiply Spark job count (r6 ran one job per
    // merge) and corpus replication must barely move wall-time.
    def jobCount = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val j0 = jobCount
    time("bpe 1000 merges 1x")(graft.ops.BpeTrain.learnMerges(
      base, "text", nMerges = 1000).count())
    println(s"bpe 1000 merges 1x: ${jobCount - j0} Spark jobs")
    val j1 = jobCount
    time(s"bpe 1000 merges ${mult}x")(graft.ops.BpeTrain.learnMerges(
      docs, "text", nMerges = 1000).count())
    println(s"bpe 1000 merges ${mult}x: ${jobCount - j1} Spark jobs")
    // hard negatives: one scan for the whole anchor batch, bounded
    // per-anchor aggregate — expect ~linear in vectors, flat in anchors
    time(s"hardneg 1x ($en vecs, 4 anchors)")(graft.ops.Similarity
      .hardNegatives(embBase, "vec_id", "embedding", "label",
        Seq(0L, 1L, 2L, 3L), 10).count())
    time(s"hardneg ${mult}x")(graft.ops.Similarity
      .hardNegatives(emb, "vec_id", "embedding", "label",
        Seq(0L, 1L, 2L, 3L), 10).count())

    // round-7: text-index lifecycle at 1x and 10x. Expected shapes:
    // build ~linear in corpus; DELETE ~flat-plus-one-capture-scan (the
    // tombstone unit is ∝ its deleted docs; the capture scan is columnar
    // over the postings' id+dl); SERVE-with-tombstones pays an anti-join
    // ∝ deleted docs after term pruning (should stay near the clean
    // serve time); COMPACT ~linear in the index (the one rewrite).
    def lifecycleProbe(df: org.apache.spark.sql.DataFrame, tag: String,
                       total: Long): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_probe_lc").toString + "/idx"
      time(s"index build $tag")(
        { graft.ops.Retrieval.writeIndex(df, "doc_id", "text", dir); total })
      def serve = graft.ops.Retrieval.bm25FromIndex(spark, dir, "doc_id",
        Seq("dup", "spark", "vector"), 15).count()
      time(s"serve clean $tag")(serve)
      time(s"delete 2pct $tag")(
        { graft.ops.Retrieval.deleteFromIndex(
            df.filter(col("doc_id") % 50 === 0).select("doc_id"),
            "doc_id", dir, batchId = 1L); total / 50 })
      time(s"serve tombstoned $tag")(serve)
      time(s"compact $tag")(
        { graft.ops.Retrieval.compactIndex(spark, dir, "doc_id", 2L); total })
      time(s"serve compacted $tag")(serve)
    }
    lifecycleProbe(base, s"1x ($n docs)", n)
    lifecycleProbe(docs, s"${mult}x", n * mult)

    // round-7 batch 5: SemDeDup and exact top-frac selection at 1x/10x.
    // semanticDedup = Lloyd (pass-linear) + cluster-blocked pairs
    // (quadratic IN CLUSTER SIZE — the replicated corpus grows every
    // cluster 10x, so the pair stage is the probe's stress case and
    // subBlocks the mitigation); selectTopFrac = one histogram aggregate
    // + pushed filter + a window over ONLY the threshold bucket —
    // expect ~linear with a small constant.
    time(s"semantic dedup 1x ($en vecs)")(graft.ops.Similarity
      .semanticDedup(embBase, "vec_id", "embedding", 16, 2, 0.4).count())
    time(s"semantic dedup ${mult}x")(graft.ops.Similarity
      .semanticDedup(emb, "vec_id", "embedding", 16, 2, 0.4,
        subBlocks = 4).count())
    time(s"select top-frac 1x ($n docs)")(graft.ops.Curation
      .selectTopFrac(base, "doc_id",
        graft.ops.TextAnalysis.qualityScore(col("text")), 0.2).count())
    time(s"select top-frac ${mult}x")(graft.ops.Curation
      .selectTopFrac(docs, "doc_id",
        graft.ops.TextAnalysis.qualityScore(col("text")), 0.2).count())
    } // end !onlyR8

    // round-8: the four heavies VERDICT r7 asked to probe. Expected
    // shapes: IVFADC scan path = two trainings (pass-linear) + a
    // code-only ADC projection (~linear) + a bounded rescore (flat);
    // layout batch probe = one build (linear) + ONE pruned scan per
    // anchor batch (sublinear in the table when nprobe/k prunes);
    // funnel = one user-keyed exchange + in-row fold (~linear, flat in
    // stage count); survivor policy = MinHash pairs + CC rounds +
    // cluster-keyed argmax (the CC loop is the measured log-diameter
    // driver; the argmax adds one keyed aggregate).
    if (!onlyR8c) {
    time(s"ivfadc scan 1x ($en vecs)")(graft.ops.Similarity.ivfAdcTopK(
      embBase, "vec_id", "embedding", q, nprobe = 2, kCoarse = 4,
      coarseIters = 1, m = 4, k = 8, iters = 1, dims = 64,
      rescore = 50, topK = 10).count())
    time(s"ivfadc scan ${mult}x")(graft.ops.Similarity.ivfAdcTopK(
      emb, "vec_id", "embedding", q, nprobe = 2, kCoarse = 4,
      coarseIters = 1, m = 4, k = 8, iters = 1, dims = 64,
      rescore = 50, topK = 10).count())
    def probeBatchProbe(df: org.apache.spark.sql.DataFrame,
                        tag: String): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_probe_pb").toString + "/emb"
      time(s"ivf layout build $tag")(
        { graft.ops.Similarity.ivfWriteLayout(df, "vec_id", "embedding",
            dir, kClusters = 4, iters = 2); 4L })
      time(s"ivf probe batch $tag")(graft.ops.Similarity
        .ivfProbeLayoutBatch(spark, dir, Seq(0L, 1L, 2L, 3L),
          k = 10, nprobe = 2).count())
    }
    probeBatchProbe(embBase, s"1x ($en vecs)")
    probeBatchProbe(emb, s"${mult}x")
    val stages = Seq("signup", "view", "click", "view", "purchase")
    time(s"funnel n=5 1x ($evn events)")(graft.ops.Funnel.funnel(
      evBase, "user_id", "ts", "event_type", stages).count())
    time(s"funnel n=5 ${mult}x")(graft.ops.Funnel.funnel(
      ev, "user_id", "ts", "event_type", stages).count())
    def survivorProbe(df: org.apache.spark.sql.DataFrame,
                      tag: String): Unit =
      time(s"dedup survivor $tag") {
        val pairs = Dedup.minhashCandidates(df, "doc_id", "text")
        val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
        Dedup.survivorsByScore(cc, df, "doc_id",
          graft.ops.TextAnalysis.qualityScore(col("text"))).count()
      }
    survivorProbe(base, s"1x ($n docs)")
    survivorProbe(docs, s"${mult}x")

    // r8b: entity resolution — deletion-neighborhood blocking growth.
    // Replica names are salted (suffix per replica) so cross-replica
    // records aren't all mutual matches: the probe measures the
    // blocking/verify machinery's growth, not an artificial all-dup
    // hot block (the same discipline as the doc replicas above).
    val custBase = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
    val cn = custBase.count()
    val cust = (0 until mult).map { i =>
      // salt at the FRONT: the dirty derivation's truncation class
      // strips the LAST character, so a suffix salt would be deleted
      // and all replicas of a customer would collapse onto one
      // truncated name — exactly the cross-replica hot block the salt
      // exists to prevent
      custBase.select((col("c_custkey") + lit(i * cn)).as("c_custkey"),
        concat(lit(s"r${i}_"), col("c_name")).as("c_name"))
    }.reduce(_ unionByName _).repartition(32).cache()
    def erProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val clean = df.select(col("c_custkey").as("clean_id"),
        col("c_name").as("name"))
      val dirty = df.select((col("c_custkey") + lit(10000000L)).as("dirty_id"),
        when(col("c_custkey") % 30 === 1,
          expr("substr(c_name, 1, length(c_name) - 1)"))
          .when(col("c_custkey") % 3 === 0,
            concat(expr("substr(c_name, 1, 5)"), lit("X"),
              expr("substr(c_name, 7)")))
          .when(col("c_custkey") % 3 === 1,
            concat(expr("substr(c_name, 1, 5)"), expr("substr(c_name, 7)")))
          .otherwise(col("c_name")).as("name"))
      time(s"er pairs+cc $tag")(graft.ops.EntityResolution.clusters(
        dirty, "dirty_id", clean, "clean_id", "name").count())
    }
    erProbe(custBase, s"1x ($cn customers)")
    erProbe(cust, s"${mult}x")
    def prProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit =
      time(s"pagerank $tag")(graft.ops.Graphs.pageRank(
        Dedup.minhashCandidates(df, "doc_id", "text"),
        "id_a", "id_b", damping = 0.85, iters = 3).count())
    prProbe(base, s"1x ($n docs)")
    prProbe(docs, s"${mult}x")
    } // end !onlyR8c

    // r8c: session-3 operators at 1x/10x. Expected shapes:
    // triangles = the minhash pair stage (~linear, banding-capped) +
    // degree-oriented wedge join whose fan-out is bounded by the
    // oriented out-degree (O(sqrt(m)) worst case — replicas multiply
    // FAMILIES, not family size, so wedge work should stay ~linear);
    // heavy hitters = one sketch scan (no shuffle) + a recount keyed
    // only by the <=k·P candidates (~linear scan, flat shuffle);
    // exact quantiles = two scans + one 256-row exchange + a
    // TakeOrdered over one bin (~linear scans, flat tail);
    // randproj = projection scan (~linear) + bounded rescore (flat);
    // daily anomalies = one keyed daily aggregate (~linear) + stats
    // over the tiny (types x days) relation (flat).
    def triProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit =
      time(s"triangles $tag")(graft.ops.Graphs.triangles(
        Dedup.minhashCandidates(df, "doc_id", "text"), "id_a", "id_b")
        .count())
    triProbe(base, s"1x ($n docs)")
    triProbe(docs, s"${mult}x")
    time(s"heavyhitters 1x ($n docs)")(graft.ops.Frequent.heavyHitters(
      graft.ops.Frequent.wsTokens(base, "text"), "token", 0.002, 1024)
      .count())
    time(s"heavyhitters ${mult}x")(graft.ops.Frequent.heavyHitters(
      graft.ops.Frequent.wsTokens(docs, "text"), "token", 0.002, 1024)
      .count())
    time(s"quantiles 1x ($evn events)")(graft.ops.Profile.quantilesExact(
      evBase, "value", Seq(0.5, 0.9, 0.99)).count())
    time(s"quantiles ${mult}x")(graft.ops.Profile.quantilesExact(
      ev, "value", Seq(0.5, 0.9, 0.99)).count())
    time(s"randproj topk 1x ($en vecs)")(graft.ops.Similarity.randProjTopK(
      embBase, "vec_id", "embedding", queryId = 0L, k = 10).count())
    time(s"randproj topk ${mult}x")(graft.ops.Similarity.randProjTopK(
      emb, "vec_id", "embedding", queryId = 0L, k = 10).count())
    time(s"daily anomalies 1x ($evn events)")(graft.ops.EventOps
      .dailyAnomalies(evBase, "event_type", "ts").count())
    time(s"daily anomalies ${mult}x")(graft.ops.EventOps
      .dailyAnomalies(ev, "event_type", "ts").count())
    // r8c batch 2: correlation matrix = one scan + 1-row exchange
    // (~linear scans, flat tail); PPR = the pagerank iteration shape;
    // containment = the jaccard overlap core with a different tail;
    // rolling active users = one (user, day) dedup + bounded coverage
    // expansion (cost tracks user-days × Σwindows, not raw events —
    // the replicas multiply users, so expect ~linear).
    // fixture pruned to the correlated columns: the operator's scan
    // prunes anyway; an all-columns cache would time the fixture, not
    // the op
    val liBase = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val ln = liBase.count()
    val li = (0 until mult).map(_ => liBase).reduce(_ unionByName _)
      .repartition(32).cache()
    time(s"corr matrix 1x ($ln rows)")(graft.ops.Profile.correlations(
      liBase, Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .count())
    time(s"corr matrix ${mult}x")(graft.ops.Profile.correlations(
      li, Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .count())
    def pprProbe(df: org.apache.spark.sql.DataFrame, tag: String): Unit =
      time(s"ppr $tag") {
        val pairs = Dedup.minhashCandidates(df, "doc_id", "text")
        val seed = pairs.agg(min(least(col("id_a"), col("id_b"))))
          .head().getLong(0)
        graft.ops.Graphs.personalizedPageRank(pairs, "id_a", "id_b", seed)
          .count()
      }
    pprProbe(base, s"1x ($n docs)")
    pprProbe(docs, s"${mult}x")
    time(s"containment 1x ($n docs)")(graft.ops.Dedup.containmentPairs(
      base, "doc_id", "text").count())
    time(s"containment ${mult}x")(graft.ops.Dedup.containmentPairs(
      docs, "doc_id", "text").count())
    time(s"active users 1x ($evn events)")(graft.ops.EventOps
      .rollingActiveUsers(evBase, "user_id", "ts", Seq(1, 7, 28)).count())
    time(s"active users ${mult}x")(graft.ops.EventOps
      .rollingActiveUsers(ev, "user_id", "ts", Seq(1, 7, 28)).count())
    spark.stop()
  }
}
