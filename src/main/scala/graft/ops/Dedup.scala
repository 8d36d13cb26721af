package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deduplication operators for large-scale corpus curation (north-star
  * extensions): exact, MinHash-LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup.
  *
  * Scale design notes:
  *  - Exact dedup is one hash-shuffle on a 32-byte fingerprint, never on
  *    the full text.
  *  - MinHash signatures are computed per-row with array expressions
  *    (shingle → md5 → array_min): NO explode, NO shuffle until the final
  *    tiny candidate-pair join on band keys. At 100 TB the only shuffled
  *    payload is (doc_id, band, 32-byte min-hash).
  *  - Jaccard verification self-joins the (doc, shingle) relation but caps
  *    shingle document-frequency first — the classic guard against
  *    quadratic blowup on boilerplate shingles.
  *  - All hashing is md5 (identical hex in Spark/DuckDB/Python), so every
  *    operator is oracle-checkable bit-for-bit.
  */
object Dedup {

  /** Distinct character k-shingles of a string, as an array column —
    * computed per row inside codegen (no explode).
    */
  def charShingles(c: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (k - 1), lit(1))),
      i => c.substr(i, lit(k))))

  /** MinHash signature i: min over shingles of md5(i + "|" + shingle).
    * With one hash per band this doubles as the LSH band key.
    */
  def minhash(shingles: Column, i: Int): Column =
    array_min(transform(shingles, s => md5(concat(lit(s"$i|"), s))))

  /** Per-row MinHash signature columns mh0..mh{n-1}. */
  def minhashSignature(textCol: Column, shingleK: Int, numHashes: Int): Seq[Column] = {
    val sh = charShingles(textCol, shingleK)
    (0 until numHashes).map(i => minhash(sh, i).as(s"mh$i"))
  }

  /** Exact-duplicate groups by a key expression (typically
    * TextOps.fingerprint or a normalized prefix): returns one row per
    * duplicated key with the surviving (minimum) id and the group size.
    */
  def exactDupGroups(df: DataFrame, idCol: Column, key: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("group_size"))
      .filter(col("group_size") > 1)

  /** Exact dedup: keep the minimum-id row per key (deterministic, unlike
    * dropDuplicates' arbitrary winner). One shuffle on the key.
    */
  def exactDedup(df: DataFrame, idCol: Column, key: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(idCol)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash-LSH candidate pairs: docs agreeing on ≥1 of `numHashes` band
    * keys, with the number of agreeing bands (an estimate of Jaccard ≈
    * bands_matched / numHashes). Signature computation is per-row; only
    * (id, band, hash) tuples shuffle.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingleK: Int = 12, numHashes: Int = 6): DataFrame = {
    val sig = df.select(col(idCol) +: minhashSignature(col(textCol), shingleK, numHashes): _*)
    val bands = sig.select(col(idCol), explode(array(
      (0 until numHashes).map(i => struct(lit(i).as("band"), col(s"mh$i").as("h"))): _*)).as("bh"))
      .select(col(idCol), col("bh.band"), col("bh.h"))
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.h") === col("b.h")
        && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("bands_matched"))
  }

  /** Exact n-gram Jaccard near-dup pairs. `maxShingleDf` drops shingles
    * appearing in more than that many docs (boilerplate guard — bounds the
    * self-join at O(sum over shingles of df²) with df ≤ cap).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleK: Int = 12, threshold: Double = 0.5,
                   maxShingleDf: Int = 64): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(charShingles(col(textCol), shingleK)).as("sh"))
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("df_sh"))
      .filter(col("df_sh") <= maxShingleDf).select("sh")
    val filtered = sh.join(rare, "sh")
    val common = filtered.as("a")
      .join(filtered.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(counts.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(counts.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  /** 16-bit SimHash from word-level md5 nibbles: bit b of the signature is
    * the sign of Σ_words (2·bit_b(md5(word)) − 1). Computed with one
    * explode + one aggregation; each bit's source is hex digit b/4,
    * shifted by b%4 — all portable integer arithmetic.
    */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .withColumn("h4", substring(md5(col("w")), 1, 4))
    val bitSums = (0 until 16).map { b =>
      val nib = conv(substring(col("h4"), b / 4 + 1, 1), 16, 10).cast("long")
      sum(shiftright(nib, b % 4) % 2 * 2 - 1).as(s"s$b")
    }
    val agg = words.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 16).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), hash.as("simhash"))
  }

  /** Near-dup candidates by SimHash: identical 16-bit signature, or — the
    * scale path — Hamming distance ≤ `maxHamming` via bit_count(xor).
    */
  def simhashPairs(sig: DataFrame, idCol: String, maxHamming: Int = 2): DataFrame = {
    val a = sig.as("a"); val b = sig.as("b")
    a.join(b, col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"), col("hamming"))
  }

  // Precision 30 (not 38): decimal(38,14)+decimal(38,14) hits Spark's
  // 38-digit cap and silently drops to scale 13, rounding the accumulator
  // every step. At (30,14) the add result is (31,14) — exact — and the
  // cast back to (30,14) loses nothing.
  private val Dec = DecimalType(30, 14)

  /** Exact (order-independent) dot product of two float-array columns:
    * cast to double per element, accumulate in decimal — bit-identical in
    * Spark and DuckDB, stays row-local (no explode/shuffle).
    */
  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Dec)),
      lit(0).cast(Dec), (acc, x) => (acc + x).cast(Dec)).cast("double")

  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  /** Embedding-cosine near-duplicate pairs, blocked by a partition column
    * (here: the IVF-style `label` cluster — at 100 TB the blocker is the
    * coarse quantizer, so only intra-cluster pairs are scored).
    */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        blockCol: String, threshold: Double): DataFrame = {
    val withNorm = emb.select(col(idCol).as("id"), col(blockCol).as("blk"),
      col(vecCol).as("v"), normExact(col(vecCol)).as("nrm"))
    val a = withNorm.as("a"); val b = withNorm.as("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dotExact(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
