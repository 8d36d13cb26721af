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
}
