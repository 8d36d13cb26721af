package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (100 TB checklist item: "skewed keys →
  * salting or AQE skew-join").
  *
  * First line of defense is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on in Bench) — it bisects
  * oversized shuffle partitions at runtime. [[saltedJoin]] is the manual
  * fallback for the cases AQE can't fix: a broadcast-ineligible dimension
  * joined on a pathologically hot key (one key ≫ one partition even after
  * splitting). The big side spreads each hot key across `saltBuckets`
  * shuffle partitions via a deterministic per-row salt; the small side is
  * replicated `saltBuckets`× (explode of a static sequence — cheap when
  * small ≪ big, which is the only regime where salting beats AQE).
  */
object Skew {

  /** Deterministic per-row salt in [0, saltBuckets): hash of a unique row
    * key (NOT rand() — retries/speculative tasks must salt identically).
    */
  def saltOf(rowKey: Column, saltBuckets: Int): Column =
    pmod(hash(rowKey), lit(saltBuckets))

  /** Inner equi-join `big ⋈ small ON big(key) = small(key)` with the big
    * side salted by `bigRowKey`. Result columns = big.* ++ small.*
    * (minus the duplicated join key on the small side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigRowKey: Column, saltBuckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltOf(bigRowKey, saltBuckets))
    val explodedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Join-key SKEW DIAGNOSIS — the report you run BEFORE choosing
    * between the plain join, AQE, and [[saltedJoin]]: the `topK`
    * heaviest keys with their share of the table and the salt factor
    * that would level each one to the average shuffle-partition load.
    *
    * `salt_factor` = ceil(n_key / ceil(N/partitions)): how many shuffle
    * partitions the key's rows need to occupy average-partition load —
    * 1 means the key fits a partition (AQE/no action), ≥ 2 is the
    * `saltBuckets` floor to hand [[saltedJoin]]. Integer arithmetic
    * throughout (exact, engine-portable); `share` is the one double.
    *
    * Plan: ONE map-side-combined count aggregate over the key column +
    * a TakeOrdered top-k — the diagnosis never costs more than the
    * aggregation the join would run anyway, and nothing key-space-sized
    * reaches the driver.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10,
                 partitions: Int = 32): DataFrame = {
    require(topK >= 1 && partitions >= 1, "positive topK and partitions")
    val counts = graft.core.Caches.track(
      df.groupBy(col(keyCol).as("key"))
        .agg(count(lit(1)).as("n_rows")))
    val total = counts.agg(sum(col("n_rows")).as("__n"))
    counts
      .orderBy(col("n_rows").desc, col("key").asc)
      .limit(topK)
      .crossJoin(broadcast(total))
      // ceil(a/b) in exact integer form — (a + b − 1) div b — twice:
      // average partition load, then partitions-per-key at that load
      .withColumn("__avg",
        expr(s"(__n + ${partitions - 1}) div $partitions"))
      .select(col("key"), col("n_rows"),
        (col("n_rows").cast("double") / col("__n")).as("share"),
        expr("(n_rows + __avg - 1) div __avg").as("salt_factor"))
      .orderBy(col("n_rows").desc, col("key").asc)
  }
}
