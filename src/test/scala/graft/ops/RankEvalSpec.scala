package graft.ops

import graft.SparkSpec

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  // scores 3,2,2,1 with labels +,+,-,- : pos pairs beat neg pairs
  // (3>2):1 + (3>1):1 + (2 vs 2):0.5 + (2>1):1 => U = 3.5, AUC = 0.875
  private def tiny = Seq(
    (1L, 3L), (1L, 2L), (-1L, 2L), (-1L, 1L)).toDF("y", "score")

  test("rocAucPr: hand-computed AUC with a cross-class tie (U = 3.5 " +
      "over 4 pairs) and step-interpolated average precision") {
    val r = RankEval.rocAucPr(tiny, "score", "y").head()
    assert(r.getAs[Long]("n_pos") == 2L)
    assert(r.getAs[Long]("n_neg") == 2L)
    // 2U = 7
    assert(r.getAs[Long]("auc_num2") == 7L)
    assert(r.getAs[Double]("auc") == 0.875)
    assert(r.getAs[Double]("gini") == 0.75)
    // thresholds desc: m=3 tp=1 fp=0 P=1 dTP=1; m=2 tp=2 fp=1 P=2/3
    // dTP=1; m=1 dTP=0. AP = (1 + 2/3)/2
    assert(math.abs(r.getAs[Double]("avg_precision") - (1.0 + 2.0 / 3.0) / 2.0)
      < 1e-15)
  }

  test("rocCurve: exact (tp, fp) per distinct threshold, descending, " +
      "ending at (1, 1)") {
    val rows = RankEval.rocCurve(tiny, "score", "y")
      .collect().map(r => (r.getAs[Long]("threshold"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Double]("tpr"), r.getAs[Double]("fpr")))
    assert(rows.toSeq == Seq(
      (3L, 1L, 0L, 0.5, 0.0),
      (2L, 2L, 1L, 1.0, 0.5),
      (1L, 2L, 2L, 1.0, 1.0)))
  }

  test("rocAucPr: perfect separation gives AUC = 1, AP = 1; inverted " +
      "scores give AUC = 0; negative scores bin correctly") {
    val perfect = Seq((1L, 10L), (1L, 9L), (-1L, -5L), (-1L, -80L))
      .toDF("y", "score")
    val p = RankEval.rocAucPr(perfect, "score", "y").head()
    assert(p.getAs[Double]("auc") == 1.0)
    assert(p.getAs[Double]("avg_precision") == 1.0)
    val inverted = Seq((-1L, 10L), (-1L, 9L), (1L, -5L), (1L, -80L))
      .toDF("y", "score")
    assert(RankEval.rocAucPr(inverted, "score", "y").head()
      .getAs[Double]("auc") == 0.0)
  }

  test("rocAucPr: all-tied scores give AUC = 0.5 exactly (tie " +
      "correction), AP = base rate") {
    val tied = Seq((1L, 5L), (1L, 5L), (-1L, 5L), (-1L, 5L), (-1L, 5L))
      .toDF("y", "score")
    val r = RankEval.rocAucPr(tied, "score", "y").head()
    assert(r.getAs[Double]("auc") == 0.5)
    assert(r.getAs[Double]("avg_precision") == 0.4)
  }

  test("two-level prefix matches a plain global window on a wider " +
      "spread (many bins, negatives, ties)") {
    val rows = (1 to 400).map { i =>
      val s = ((i * 37) % 83) - 41L // collisions + negatives
      (if ((i * 13) % 3 == 0) 1L else -1L, s)
    }
    val df = rows.toDF("y", "score")
    val got = RankEval.rocCurve(df, "score", "y", bins = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // oracle: brute-force per threshold
    val np = rows.count(_._1 == 1L)
    val exp = rows.map(_._2).distinct.sorted.reverse.map { t =>
      (t, rows.count(r => r._1 == 1L && r._2 >= t).toLong,
        rows.count(r => r._1 != 1L && r._2 >= t).toLong)
    }
    assert(got.toSeq == exp)
    val auc = RankEval.rocAucPr(df, "score", "y", bins = 7).head()
    // brute-force U with half ties
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 != 1L).map(_._2)
    val u2 = pos.map(p => neg.map(n =>
      if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
    assert(auc.getAs[Long]("auc_num2") == u2)
    assert(auc.getAs[Double]("auc") ==
      u2.toDouble / (2.0 * pos.size.toDouble * neg.size.toDouble))
  }

  test("cohenKappa: hand-computed 2-label table; perfect and degenerate cases") {
    import spark.implicits._
    // confusion: (y,y)=20 (y,n)=5 (n,y)=10 (n,n)=15, N=50
    // po=35/50; rows y=25,n=25; cols y=30,n=20; B=25*30+25*20=1250
    // kappa = (50*35-1250)/(2500-1250) = 500/1250 = 0.4
    val pairs = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val r = RankEval.cohenKappa(pairs.toDF("a", "b"), "a", "b")
      .collect().head
    assert(r.getLong(0) === 50L && r.getLong(1) === 35L)
    assert(r.getDouble(2) === 0.7 && r.getDouble(3) === 0.5)
    assert(r.getDouble(4) === 0.4, s"kappa=${r.getDouble(4)}")
    // perfect agreement: kappa 1
    val perfect = RankEval.cohenKappa(
      Seq(("x", "x"), ("z", "z")).toDF("a", "b"), "a", "b").collect().head
    assert(perfect.getDouble(4) === 1.0)
    // degenerate single-label marginals: pe=1 -> reported 0
    val degen = RankEval.cohenKappa(
      Seq(("x", "x"), ("x", "x")).toDF("a", "b"), "a", "b").collect().head
    assert(degen.getDouble(4) === 0.0)
    // null labels drop from N
    val withNull = RankEval.cohenKappa(
      (pairs ++ Seq((null, "y"), ("y", null))).toDF("a", "b"), "a", "b")
      .collect().head
    assert(withNull.getLong(0) === 50L)
  }
}
