package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge for lake-native dimension maintenance —
  * SCD type-2 (versioned history) without a table format: pure DataFrame
  * ops over an immutable snapshot, the pattern that backs registry-style
  * reference data in the reference pipelines (the JDBC "registry"
  * dimensions of /root/reference/prostate_dag.py joined into every run)
  * when the dimension must carry history instead of being overwritten.
  *
  * Contract: the dimension carries `valid_from` / `valid_to` (null
  * `valid_to` = the open version); a change batch carries the key plus
  * the tracked attributes, all effective at one `effectiveTs`. The merge
  * emits the complete new dimension state:
  *
  *  - closed history rows pass through untouched;
  *  - an open row whose key is absent from the batch stays open;
  *  - an open row whose key arrives with IDENTICAL tracked attributes
  *    stays open (no-op change — no version churn);
  *  - an open row whose key arrives with different attributes is CLOSED
  *    (`valid_to = effectiveTs`) and a new open version is born;
  *  - a batch key with no open row inserts a brand-new open version.
  *
  * Plan shape at scale: ONE full-outer equi-join between the open slice
  * and the change batch (Spark plans full outer as a co-partitioned
  * sort-merge — broadcast is not supported for this join type, and the
  * hint would be ignored). The three output branches (kept / closed /
  * born) all project the SAME join, so the two hash exchanges are
  * planned once and reused (`ReusedExchange` — CdcSpec pins this: the
  * dimension is shuffled once, not three times), and the closed history
  * unions in with no shuffle at all. Attribute comparison is null-safe
  * (`<=>`), so null attribute values neither crash nor always-differ.
  */
object Cdc {

  /** @param dim     SCD2 dimension: key cols + tracked cols +
    *                `valid_from`/`valid_to`
    * @param changes change batch: key cols + tracked cols
    * @param keys    business-key column names
    * @param effectiveTs SQL-typed effective timestamp/date column
    *                (e.g. `lit(java.sql.Date.valueOf("2024-06-01"))`)
    */
  def scd2Merge(dim: DataFrame, changes: DataFrame, keys: Seq[String],
                effectiveTs: org.apache.spark.sql.Column): DataFrame = {
    val tracked = dim.columns.filterNot(c =>
      keys.contains(c) || c == "valid_from" || c == "valid_to").toSeq
    require(changes.columns.toSet == (keys ++ tracked).toSet,
      s"change batch must carry exactly key + tracked columns: ${keys ++ tracked}")

    val closedHist = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)
    val ch = changes.select(
      keys.map(k => col(k).as(s"__ck_$k")) ++
        tracked.map(t => col(t).as(s"__cv_$t")): _*)

    val joinCond = keys.map(k => col(k) === col(s"__ck_$k")).reduce(_ && _)
    val j = open.join(ch, joinCond, "full_outer")

    val hasOpen = keys.map(k => col(k).isNotNull).reduce(_ && _)
    val hasChange = keys.map(k => col(s"__ck_$k").isNotNull).reduce(_ && _)
    val identical = tracked.map(t => col(t) <=> col(s"__cv_$t"))
      .reduceOption(_ && _).getOrElse(lit(true))

    val dimCols = dim.columns.toSeq

    // survivors of the open slice: untouched keys and identical no-ops
    val keptOpen = j.filter(hasOpen && (!hasChange || identical))
      .select(dimCols.map(col): _*)
    // closed versions: open rows superseded by a differing change
    val closedNow = j.filter(hasOpen && hasChange && !identical)
      .select(dimCols.map {
        case "valid_to" => effectiveTs.as("valid_to")
        case c => col(c)
      }: _*)
    // new open versions: differing changes and brand-new keys
    val bornNow = j.filter(hasChange && (!hasOpen || !identical))
      .select(dimCols.map {
        case "valid_from" => effectiveTs.as("valid_from")
        case "valid_to" => lit(null).cast(dim.schema("valid_to").dataType).as("valid_to")
        case c if keys.contains(c) => col(s"__ck_$c").as(c)
        case c => col(s"__cv_$c").as(c)
      }: _*)

    closedHist.unionByName(keptOpen).unionByName(closedNow).unionByName(bornNow)
  }
}
