package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed batch perceptron (Rosenblatt 1958; the batch/averaged
  * variant of Collins 2002) over INTEGER features — a trainable
  * quality/langid-style classifier whose training is exactly
  * reproducible in any engine, because every quantity is an integer:
  * labels are ±1, features are counts, the margin y·(w·x) is integer
  * arithmetic, and each epoch's update Δw_j = Σ_misclassified y·x_j is
  * an integer sum (order-independent — no floating-point, no seed, no
  * learning-rate schedule to drift cross-engine).
  *
  * Scale shape — the parameter-server-free batch trainer: the model (a
  * handful of longs) rides into the executors as LITERALS in the margin
  * expression, each epoch is ONE narrow aggregate over the corpus
  * (map-side combine collapses every partition to k+2 longs before the
  * single exchange), and the driver applies the k-length update. Cost
  * per epoch = one scan + one 1-row shuffle, independent of model
  * quality; epochs compose driver-side like the k-means/CC loops.
  */
object Perceptron {

  /** One training row per epoch: (epoch, n, n_misclassified, then the
    * UPDATED weights named w_bias, w_<feature>...). n_misclassified is
    * measured under the incoming weights (epoch e's error count is the
    * training error of the model after e−1 updates — epoch 1 reports
    * the all-zero model's error, where margin 0 counts as wrong).
    */
  def train(df: DataFrame, featureCols: Seq[String], labelCol: String,
            epochs: Int): DataFrame = {
    require(featureCols.nonEmpty && epochs >= 1)
    val staged = graft.core.Caches.track(
      df.select((col(labelCol).cast("long").as("__y") +:
        featureCols.map(c => col(c).cast("long").as(s"__x_$c"))): _*))
    var w = Array.fill[Long](featureCols.size + 1)(0L) // bias first
    val out = Seq.newBuilder[Row]
    for (e <- 1 to epochs) {
      val margin: Column = col("__y") *
        featureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
          case (acc, (c, i)) => acc + lit(w(i + 1)) * col(s"__x_$c")
        }
      val mis = margin <= 0
      val aggs =
        count(lit(1)).as("n") +:
          coalesce(sum(when(mis, lit(1L)).otherwise(0L)), lit(0L)).as("m") +:
          coalesce(sum(when(mis, col("__y")).otherwise(0L)), lit(0L)).as("db") +:
          featureCols.map(c =>
            coalesce(sum(when(mis, col("__y") * col(s"__x_$c")).otherwise(0L)),
              lit(0L)).as(s"d_$c"))
      val r = staged.agg(aggs.head, aggs.tail: _*).head()
      w = w.indices.map(i => w(i) + r.getLong(2 + i)).toArray
      out += Row.fromSeq(
        Seq(e.toLong, r.getLong(0), r.getLong(1)) ++ w.toSeq)
    }
    val schema = StructType(
      Seq(StructField("epoch", LongType), StructField("n", LongType),
        StructField("n_misclassified", LongType),
        StructField("w_bias", LongType)) ++
        featureCols.map(c => StructField(s"w_$c", LongType)))
    df.sparkSession
      .createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .SeqHasAsJava(out.result()).asJava), schema)
      .orderBy("epoch")
  }

  /** Score every row with a trained weight vector (bias first, then one
    * weight per feature — [[train]]'s output order) and report the
    * confusion matrix + accuracy: one scan, weights as literals, a
    * single 1-row aggregate (four conditional integer sums), the
    * accuracy ratio a division of exact longs. Raw score 0 predicts −1
    * — so a y = +1 row at score 0 is an error in BOTH train's margin
    * ≤ 0 count and this matrix, while a y = −1 row at score 0 counts
    * as a train error (margin 0) but lands in tn here: the perceptron
    * update deliberately pushes on boundary rows of either class, the
    * confusion matrix only cares about the predicted label.
    */
  def evaluate(df: DataFrame, featureCols: Seq[String], labelCol: String,
               weights: Seq[Long]): DataFrame = {
    require(weights.size == featureCols.size + 1,
      "bias + one weight per feature")
    val score = featureCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (c, i)) => acc + lit(weights(i + 1)) * col(c).cast("long")
    }
    val pred = when(score > 0, 1L).otherwise(-1L)
    val y = col(labelCol).cast("long")
    def cell(cond: Column) =
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L))
    df.agg(
        count(lit(1)).as("n"),
        cell(y === 1L && pred === 1L).as("tp"),
        cell(y === -1L && pred === 1L).as("fp"),
        cell(y === 1L && pred === -1L).as("fn"),
        cell(y === -1L && pred === -1L).as("tn"))
      .select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
        ((col("tp") + col("tn")).cast("double") / col("n")).as("accuracy"))
  }

  /** K-fold cross-validation of the integer perceptron — the variance
    * check a single train/test split can't give: rows partition by an
    * integer fold column (caller-supplied, e.g. `doc_id % k` — a pure
    * function of the data, so folds are stable across retries and
    * engines), each fold's model trains on the other k−1 folds and
    * evaluates on its own, and `cv_accuracy` is the POOLED micro
    * accuracy Σ(tp+tn)/Σn — one division of exact integers (a mean of
    * per-fold ratios would be an ordered double sum for no benefit).
    *
    * Cost shape: k·epochs map-side-combined aggregate passes over the
    * ONE cached staged relation (each epoch is [[train]]'s single
    * 1-row aggregate); per-fold state is k+2 longs on the driver;
    * output is k rows. Nothing shuffles beyond the aggregates.
    */
  def crossValidate(df: DataFrame, featureCols: Seq[String],
                    labelCol: String, foldCol: String, k: Int = 3,
                    epochs: Int = 3): DataFrame = {
    require(k >= 2, "need at least two folds")
    val staged = graft.core.Caches.track(df)
    val per = (0 until k).map { f =>
      val trained = train(staged.filter(col(foldCol) =!= f), featureCols,
        labelCol, epochs).collect().maxBy(_.getLong(0))
      val weights = (3 until 4 + featureCols.size).map(trained.getLong)
      val e = evaluate(staged.filter(col(foldCol) === f), featureCols,
        labelCol, weights).head()
      (f.toLong, e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3),
        e.getLong(4), e.getDouble(5))
    }
    val totN = per.map(_._2).sum
    val totCorrect = per.map(r => r._3 + r._6).sum
    val cv = totCorrect.toDouble / totN.toDouble
    val spark = df.sparkSession
    import spark.implicits._
    per.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7, cv))
      .toDF("fold", "n", "tp", "fp", "fn", "tn", "accuracy",
        "cv_accuracy")
      .orderBy("fold")
  }

  /** CALIBRATION report — the reliability diagram's table: rows
    * bucketed into margin quintiles (boundaries from one exact
    * percentile aggregate, broadcast back, assigned by comparison —
    * the RFM no-global-sort pattern), each bucket reporting its size,
    * positive fraction, and mean margin. A well-calibrated scorer's
    * positive fraction rises monotonically with the margin bucket;
    * a flat curve means the margin carries no signal — the check a
    * learned quality filter runs before its scores become sampling
    * weights. Margins are integers (the perceptron family's exact-
    * arithmetic discipline), so boundaries, bucket assignment, counts,
    * and the decimal-staged mean are all engine-identical.
    */
  /** (y, score) relation: the exact integer margin b + w·x per row —
    * the single-sourced scoring expression behind [[calibration]] and
    * [[RankEval]]'s threshold-free metrics.
    */
  def margins(df: DataFrame, featureCols: Seq[String], labelCol: String,
              weights: Seq[Long]): DataFrame = {
    require(weights.size == featureCols.size + 1,
      "bias + one weight per feature")
    val score = featureCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (c, i)) => acc + lit(weights(i + 1)) * col(c).cast("long")
    }
    df.select(col(labelCol).cast("long").as("y"), score.as("score"))
  }

  def calibration(df: DataFrame, featureCols: Seq[String], labelCol: String,
                  weights: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(weights.size == featureCols.size + 1,
      "bias + one weight per feature")
    val score = featureCols.zipWithIndex.foldLeft(lit(weights.head): Column) {
      case (acc, (c, i)) => acc + lit(weights(i + 1)) * col(c).cast("long")
    }
    val scored = graft.core.Caches.track(
      df.select(col(labelCol).cast("long").as("__y"), score.as("__m")))
    val th = scored.agg(
      percentile(col("__m"), typedlit(Seq(0.2, 0.4, 0.6, 0.8))).as("__t"))
    val bucket = (1 to 4).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col("__m").cast("double") > element_at(col("__t"), i), 1L)
        .otherwise(0L)
    }
    scored.crossJoin(broadcast(th))
      .select(bucket.as("bucket"), col("__y"), col("__m"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("__y") === 1L, 1L).otherwise(0L)), lit(0L))
          .as("n_pos"),
        (sum(col("__m").cast(DecimalType(38, 0))).cast("double") /
          count(lit(1))).as("mean_margin"))
      .withColumn("frac_pos", col("n_pos").cast("double") / col("n"))
      .select(col("bucket"), col("n"), col("n_pos"), col("frac_pos"),
        col("mean_margin"))
      .orderBy(col("bucket"))
  }
}
