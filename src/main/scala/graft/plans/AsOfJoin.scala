package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** As-of (temporal) join: for every left row, the single latest right row
  * with the same key whose time is `<=` the left row's time — the lookup
  * every point-in-time feature join needs (trades→quotes, order→latest
  * event, feature-store reads) and one Spark's built-in operators cannot
  * express without a blow-up.
  *
  * Why a custom operator (SURVEY.md §4.3 option c): the naive relational
  * encodings are non-starters at scale —
  *  - `l JOIN r ON key AND r.t <= l.t` + max-per-group materializes every
  *    (left × earlier-right) pair before the aggregate prunes it: O(n·m)
  *    per key, quadratic on hot keys;
  *  - the union + last(ignoreNulls) window trick is linear but forces the
  *    two inputs through one union'd sort and re-widens both schemas.
  * This node instead plans exactly like a sort-merge join: both sides
  * hash-clustered on the key ([[ClusteredDistribution]] — Catalyst's
  * EnsureRequirements inserts co-partitioning shuffles), sorted within
  * partitions by (key, time), then a single O(n+m) forward-only merge per
  * partition. No pair blow-up, no cross-input sort, and at 100 TB the
  * shuffle is the same one a plain equi-join would pay.
  *
  * Semantics notes:
  *  - backward as-of with inclusive bound (`r.time <= l.time`), matching
  *    DuckDB's `ASOF LEFT JOIN ... ON r.t <= l.t` (the oracle);
  *  - left outer: unmatched left rows emit nulls for the right side;
  *  - ties on (key, time) resolve to the last row in sort order — feed a
  *    deduplicated right side when (key, time) is not unique;
  *  - null keys match null keys (feed non-null keys for SQL-standard
  *    behavior).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        forceBroadcast: Boolean = false)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: [[AsOfJoinPlan]] → physical plan, with the same
  * stats-driven choice Catalyst's JoinSelection makes for equi-joins:
  * a right side whose estimated size fits under
  * `spark.sql.autoBroadcastJoinThreshold` plans as
  * [[BroadcastAsOfJoinExec]] (broadcast exchange + per-partition binary
  * search, ZERO shuffles on the fact side); anything larger plans as the
  * co-partitioned merge [[AsOfJoinExec]]. Registered via
  * [[graft.functions.GraftExtensions]] (`injectPlannerStrategy`) or
  * injected on demand by [[AsOfJoin.asof]] through
  * `spark.experimental.extraStrategies`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, force) =>
      val threshold =
        org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
      val exec =
        if (force || (threshold > 0 && r.stats.sizeInBytes <= threshold))
          BroadcastAsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r))
        else AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r))
      exec :: Nil
    case _ => Nil
  }
}

private[plans] object AsOfTimes {
  /** Bound evaluator: as-of time column → epoch-comparable long. */
  def getter(e: Expression, out: Seq[Attribute]): InternalRow => Long = {
    val bound = BindReferences.bindReference(e, out)
    e.dataType match {
      case LongType | TimestampType | TimestampNTZType =>
        row => bound.eval(row).asInstanceOf[Long]
      case IntegerType | DateType =>
        row => bound.eval(row).asInstanceOf[Int].toLong
      case other => throw new IllegalArgumentException(
        s"as-of time column must be integral/timestamp/date, got $other")
    }
  }
}

/** Physical as-of join: co-partitioned, co-sorted, one forward merge pass
  * per partition (see [[AsOfJoinPlan]] for the plan-shape argument).
  */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the same distribution pair SortMergeJoinExec declares: Catalyst's
  // EnsureRequirements co-partitions both children on the join keys
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // sorted by (key..., time) within partitions -> merge needs no buffering
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  private def timeGetter(e: Expression, out: Seq[Attribute]): InternalRow => Long =
    AsOfTimes.getter(e, out)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ltExpr = leftTime
    val rtExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val lTime = timeGetter(ltExpr, lOut)
      val rTime = timeGetter(rtExpr, rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      // bind against a null-tolerant right schema: unmatched left rows
      // flow the all-null row through this projection
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // the latest right row (and its key) whose time was <= some seen
      // left time; both copied out of the iterator's reused buffers
      var lastRight: InternalRow = null
      var lastRightKey: UnsafeRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        if (lastRight != null && keyOrd.compare(lastRightKey, lKey) != 0) {
          lastRight = null
        }
        val lt = lTime(lRow)
        var scanning = true
        while (scanning && rBuf.hasNext) {
          val rKey = rKeyProj(rBuf.head)
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0) {
            rBuf.next() // right side behind every remaining left key: skip
          } else if (c == 0 && rTime(rBuf.head) <= lt) {
            lastRight = rBuf.next().copy()
            if (lastRightKey == null || keyOrd.compare(lastRightKey, lKey) != 0) {
              lastRightKey = lKey.copy()
            }
          } else {
            scanning = false // right side ahead: stop until left catches up
          }
        }
        resultProj(joined(lRow, if (lastRight == null) nullRight else lastRight))
      }
    }
  }
}

/** Physical broadcast as-of join: the right (dimension) side arrives via
  * a BroadcastExchange (IdentityBroadcastMode — plain row array), each
  * task builds a per-key time-sorted index once, and every left row
  * binary-searches its key — a narrow map over the fact side with ZERO
  * exchanges on it (the as-of analogue of BroadcastHashJoinExec). Chosen
  * automatically by [[AsOfJoinStrategy]] when the right side's estimated
  * size fits under `spark.sql.autoBroadcastJoinThreshold`.
  */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, IdentityBroadcastMode, UnspecifiedDistribution}

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ltExpr = leftTime
    val rtExpr = rightTime
    val outAttrs = output
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIter =>
      // index build is once per task over the (small) broadcast side
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val rTime = AsOfTimes.getter(rtExpr, rOut)
      val grouped = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
      broadcastRows.value.foreach { row =>
        val k = rKeyProj(row).copy()
        var buf = grouped.get(k)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]()
          grouped.put(k, buf)
        }
        buf += ((rTime(row), row))
      }
      val index = new java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])]()
      grouped.forEach { (k, buf) =>
        val sorted = buf.sortBy(_._1)
        index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      }
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTime = AsOfTimes.getter(ltExpr, lOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val resultProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      lIter.map { lRow =>
        val entry = index.get(lKeyProj(lRow))
        val rRow = if (entry == null) nullRight else {
          val (times, rows) = entry
          val lt = lTime(lRow)
          // rightmost index with times(i) <= lt
          var lo = 0; var hi = times.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (times(mid) <= lt) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          if (ans >= 0) rows(ans) else nullRight
        }
        resultProj(joined(lRow, rRow))
      }
    }, preservesPartitioning = true)
  }
}

/** Public DataFrame-level entry point for the as-of join operator. */
object AsOfJoin {
  import org.apache.spark.sql.graft.Shims

  private def planned(left: DataFrame, right: DataFrame,
                      leftOn: Seq[String], rightOn: Seq[String],
                      leftTimeCol: String, rightTimeCol: String,
                      force: Boolean): DataFrame = {
    require(leftOn.nonEmpty && leftOn.size == rightOn.size,
      "as-of join needs matching non-empty key lists")
    val spark = left.sparkSession
    // idempotently make the planner aware of the node without requiring
    // the session to be built with GraftExtensions
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def res(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"column `$name` not found on $side side (have: ${plan.output.map(_.name).mkString(", ")})"))
    Shims.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      leftOn.map(res(lPlan, _, "left")), rightOn.map(res(rPlan, _, "right")),
      res(lPlan, leftTimeCol, "left"), res(rPlan, rightTimeCol, "right"),
      forceBroadcast = force))
  }

  /** `asof(l, r, Seq("k"), Seq("rk"), "t", "rt")`: latest `r` row per `l`
    * row with `rk == k` and `rt <= t`. Left-outer; right columns nullable.
    * [[AsOfJoinStrategy]] picks the physical shape from the right side's
    * estimated size (broadcast under `autoBroadcastJoinThreshold`,
    * co-partitioned merge otherwise) — like Catalyst's own JoinSelection.
    */
  def asof(left: DataFrame, right: DataFrame,
           leftOn: Seq[String], rightOn: Seq[String],
           leftTimeCol: String, rightTimeCol: String): DataFrame =
    planned(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol,
      force = false)

  /** [[asof]] with a MAX-STALENESS tolerance (pandas merge_asof
    * `tolerance=` / kdb `wj` semantics): a left row whose latest match
    * lags more than `tolerance` time units behind it comes back
    * UNMATCHED (right columns NULL) instead of carrying stale state
    * into the feature row. Because the as-of match is already the
    * LATEST right row ≤ t, "latest within tolerance" is exactly
    * "latest, nulled when stale" — one projection over the exact
    * as-of result, never a second join. Time columns must share the
    * unit of `tolerance` (the operators here use epoch micros).
    */
  def asofTolerance(left: DataFrame, right: DataFrame,
                    leftOn: Seq[String], rightOn: Seq[String],
                    leftTimeCol: String, rightTimeCol: String,
                    tolerance: Long): DataFrame = {
    require(tolerance >= 0, "tolerance in the time columns' unit")
    // the freshness projection below resolves columns by bare name over
    // the joined result, so a name present on BOTH inputs would be
    // ambiguous (AnalysisException at runtime). Fail fast with a clear
    // contract instead: callers rename (`withColumnRenamed`) before the
    // join, exactly as pandas merge_asof requires suffix-disambiguation.
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"asofTolerance requires disjoint column names; shared: ${shared.mkString(", ")}")
    import org.apache.spark.sql.functions.{col, lit, when}
    val joined = asof(left, right, leftOn, rightOn, leftTimeCol,
      rightTimeCol)
    val fresh = col(rightTimeCol).isNotNull &&
      col(leftTimeCol) - col(rightTimeCol) <= tolerance
    joined.select(left.columns.map(col) ++
      right.columns.map(c => when(fresh, col(c)).otherwise(lit(null))
        .as(c)): _*)
  }

  /** Broadcast as-of join — same semantics as [[asof]], but FORCES the
    * [[BroadcastAsOfJoinExec]] shape regardless of stats (the as-of
    * analogue of the `broadcast()` hint): for the DIMENSION case when the
    * right side is known-small (a feature-store snapshot, a rates table)
    * but its estimate is missing or inflated, shuffling the fact side
    * just to co-partition is wasted I/O. Routes through the same planner
    * strategy as [[asof]] — the right side arrives via a real
    * BroadcastExchange, so Spark's BYTE-based broadcast guards
    * (`spark.sql.maxBroadcastTableSize`, driver memory accounting) and
    * broadcast reuse apply; there is no separate row-count heuristic to
    * drift from them.
    */
  def asofBroadcast(left: DataFrame, right: DataFrame,
                    leftOn: Seq[String], rightOn: Seq[String],
                    leftTimeCol: String, rightTimeCol: String): DataFrame =
    planned(left, right, leftOn, rightOn, leftTimeCol, rightTimeCol,
      force = true)

}
