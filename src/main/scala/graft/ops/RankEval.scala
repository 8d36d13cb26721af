package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Threshold-free ranking metrics for a learned scorer — ROC curve,
  * ROC-AUC (Mann–Whitney U with exact tie correction), and average
  * precision — over EXACT integer scores (the perceptron family's
  * exact-arithmetic discipline, [[Perceptron]]).
  *
  * Reference anchor: the reference's only evaluation operator is a
  * point-estimate accuracy check (`mvp_pipe.py:65-68`, SURVEY.md A1);
  * a quality-filter scorer feeding a 100 TB curation pipeline needs the
  * threshold-free family, because the selection threshold is a
  * downstream budget decision, not a property of the model.
  *
  * Scale shape: ONE distinct-score aggregate (map-side combinable) is
  * the only corpus-sized pass. Every cumulative that follows runs on
  * the distinct-score relation with the two-level prefix discipline
  * (bin totals collected — ≤ `bins` rows — then windows PARTITIONED BY
  * bin), so no global single-partition sort ever sees a data-sized
  * relation; the curve/metric finishing steps are bounded by score
  * cardinality, which for an integer-margin linear model is the unit
  * an eval harness already materializes.
  *
  * Cross-engine exactness: scores and labels are integers, so tie
  * groups, cumulative counts, and the doubled U statistic
  * `2U = Σ np·(2·cumBefore + n + 1) − NP·(NP+1)` are all integer
  * arithmetic; AUC/TPR/FPR/precision each spend exactly ONE int→double
  * division, and average precision is an explicit descending-threshold
  * fold-left (`aggregate` over the sorted term array ≡ DuckDB
  * `list_reduce`), the established ordered-double idiom.
  */
object RankEval {

  private val Dec = DecimalType(38, 0)

  /** Distinct-score relation with INCLUSIVE ascending prefix sums
    * (`__cn` of row counts, `__cp` of positive counts) computed with
    * the two-level discipline: integer range-binning, one collected
    * ≤`bins`-row bin-total pass giving exclusive bin offsets, then
    * windows partitioned by bin. Columns: __m, __n, __np, __cn, __cp.
    */
  private def prefixed(scored: DataFrame, scoreCol: String,
                       labelCol: String, bins: Int): DataFrame = {
    val g = graft.core.Caches.track(
      scored.select(col(scoreCol).cast("long").as("__m"),
          when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L)
            .as("__p"))
        .groupBy(col("__m"))
        .agg(count(lit(1)).as("__n"), sum(col("__p")).as("__np")))
    val st = g.agg(min(col("__m")), max(col("__m"))).head()
    val (lo, hi) = (st.getLong(0), st.getLong(1))
    // BigInt span: lo/hi may straddle zero; never overflows the width
    val binW = ((BigInt(hi) - BigInt(lo) + bins) / bins).max(1).toLong
    val binned = g.withColumn("__b",
      ((col("__m") - lit(lo)) / lit(binW)).cast("long"))
    val totals = binned.groupBy(col("__b"))
      .agg(sum(col("__n")).as("tn"), sum(col("__np")).as("tp"))
      .orderBy(col("__b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val offsets = totals.scanLeft((0L, 0L, 0L)) {
      case ((_, an, ap), (b, tn, tp)) => (b, an + tn, ap + tp)
    }.sliding(2).collect { case Array((_, an, ap), (b, _, _)) =>
      (b, an, ap)
    }.toSeq
    val spark = scored.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("__b")).orderBy(col("__m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .join(broadcast(offsets.toDF("__b", "__on", "__op")), Seq("__b"))
      .withColumn("__cn", sum(col("__n")).over(w) + col("__on"))
      .withColumn("__cp", sum(col("__np")).over(w) + col("__op"))
      .select(col("__m"), col("__n"), col("__np"), col("__cn"),
        col("__cp"))
  }

  /** ROC curve at every distinct score threshold, descending: keeping
    * rows with `score >= threshold` yields (tp, fp); tpr/fpr/precision
    * are the single-division doubles. The first row is the strictest
    * threshold; (tpr, fpr) walk monotonically to (1, 1).
    */
  def rocCurve(scored: DataFrame, scoreCol: String, labelCol: String,
               bins: Int = 256): DataFrame = {
    val pre = graft.core.Caches.track(
      prefixed(scored, scoreCol, labelCol, bins))
    val tot = pre.agg(max(col("__cp")), max(col("__cn"))).head()
    val (np, n) = (tot.getLong(0), tot.getLong(1))
    val nn = n - np
    require(np > 0 && nn > 0, "need both classes for a ROC curve")
    val tp = lit(np) - col("__cp") + col("__np")
    val fp = lit(nn) - (col("__cn") - col("__cp")) + (col("__n") -
      col("__np"))
    pre.select(col("__m").as("threshold"), tp.as("tp"), fp.as("fp"))
      .withColumn("tpr", col("tp").cast("double") / np.toDouble)
      .withColumn("fpr", col("fp").cast("double") / nn.toDouble)
      .withColumn("prec",
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
      .orderBy(col("threshold").desc)
  }

  /** One-row summary: n_pos, n_neg, the exact doubled U statistic
    * `auc_num2 = 2·U`, `auc = U / (n_pos·n_neg)`, `gini = 2·auc − 1`,
    * and step-interpolated average precision
    * `AP = (1/NP)·Σ_desc np·tp/(tp+fp)` (ΔTP at a threshold IS that
    * tie group's positive count, so no lag is needed).
    */
  def rocAucPr(scored: DataFrame, scoreCol: String, labelCol: String,
               bins: Int = 256): DataFrame = {
    val pre = graft.core.Caches.track(
      prefixed(scored, scoreCol, labelCol, bins))
    val tot = pre.agg(max(col("__cp")), max(col("__cn"))).head()
    val (np, n) = (tot.getLong(0), tot.getLong(1))
    val nn = n - np
    require(np > 0 && nn > 0, "need both classes for AUC")
    // 2·(sum of average ranks of positives): per tie group
    // np·(2·cumBefore + n + 1); decimal accumulator for headroom.
    val rank2 = (col("__np").cast(Dec) *
      (lit(2L) * (col("__cn") - col("__n")) + col("__n") + lit(1L))
        .cast(Dec))
    val tp = lit(np) - col("__cp") + col("__np")
    val fp = lit(nn) - (col("__cn") - col("__cp")) + (col("__n") -
      col("__np"))
    // AP term per threshold: one exact-int division each; folded in
    // DESCENDING threshold order (sort key −m) with init 0.0.
    val term = (col("__np") * tp).cast("double") /
      (tp + fp).cast("double")
    pre
      .select((-col("__m")).as("__k"), col("__np"), col("__cn"),
        col("__n"), rank2.as("__rank2"), term.as("__t"))
      .agg(sum(col("__rank2")).as("__r2"),
        aggregate(
          transform(array_sort(collect_list(struct(col("__k"),
            col("__t")))), x => x.getField("__t")),
          lit(0.0), (acc, x) => acc + x).as("__apsum"))
      .select(
        lit(np).as("n_pos"), lit(nn).as("n_neg"),
        (col("__r2") - lit(np).cast(Dec) * lit(np + 1).cast(Dec))
          .cast("long").as("auc_num2"),
        col("__apsum"))
      .withColumn("auc", col("auc_num2").cast("double") /
        lit(2.0 * np.toDouble * nn.toDouble))
      .withColumn("gini", lit(2.0) * col("auc") - lit(1.0))
      .withColumn("avg_precision", col("__apsum") / np.toDouble)
      .drop("__apsum")
  }

  /** Cohen's kappa between two label columns — the inter-annotator /
    * model-vs-model agreement statistic label-quality audits report
    * (raw agreement is inflated by chance when the label marginals are
    * skewed; kappa corrects by the marginal-product expectation).
    *
    * Exactness: kappa = (po − pe)/(1 − pe) rearranges to the all-
    * integer form (N·A − B)/(N² − B) with A = Σ diagonal counts and
    * B = Σ_i row_i·col_i — staged in DECIMAL(38,0) (exact past 1e9
    * rows, where N² overflows a long) and finished with ONE double
    * division; po and pe are each one more.
    *
    * Scale shape: one scan → a (labelA × labelB) aggregate whose
    * map-side combine collapses every partition to ≤ |labels|² cells;
    * marginals, diagonal, and B all run on that bounded relation.
    * Degenerate marginals (pe = 1, so kappa is 0/0) report 0.0.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val Dec = DecimalType(38, 0)
    val cells = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__n"))
    val tot = cells.agg(
      coalesce(sum(col("__n")), lit(0L)).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__n"))
        .otherwise(0L)), lit(0L)).as("n_agree"))
    val rowsM = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__rn"))
    val colsM = cells.groupBy(col("__b")).agg(sum(col("__n")).as("__cn"))
    val bSum = rowsM.join(colsM, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__rn").cast(Dec) * col("__cn").cast(Dec)),
        lit(0).cast(Dec)).as("__bb"))
    val nn = col("n").cast(Dec) * col("n").cast(Dec)
    tot.crossJoin(broadcast(bSum))
      .select(col("n"), col("n_agree"),
        (col("n_agree").cast("double") / col("n").cast("double")).as("po"),
        (col("__bb").cast("double") / nn.cast("double")).as("pe"),
        when(nn - col("__bb") > 0,
          (col("n").cast(Dec) * col("n_agree").cast(Dec) - col("__bb"))
            .cast("double") / (nn - col("__bb")).cast("double"))
          .otherwise(lit(0.0)).as("kappa"))
  }
}
