package graft.ops

import graft.SparkSpec

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  test("crossValidate: separable data scores 1.0 on every held-out " +
      "fold; pooled cv_accuracy is the exact micro average") {
    val rows = (1 to 30).map { i =>
      val fold = i % 3L
      if (i % 2 == 0) (1L, 10L + i, 1L, fold) else (-1L, 1L, 10L + i, fold)
    }
    val df = rows.toDF("y", "x1", "x2", "fold")
    val out = Perceptron.crossValidate(df, Seq("x1", "x2"), "y", "fold",
      k = 3, epochs = 6).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).sum == 30L)
    out.foreach { r =>
      assert(r.getAs[Double]("accuracy") == 1.0, s"fold ${r.getLong(0)}: $r")
      assert(r.getAs[Double]("cv_accuracy") == 1.0)
      // matrix is consistent: tp+fp+fn+tn == n
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) ==
        r.getLong(1))
    }
  }

  test("separable data: training error reaches 0 and the final weights " +
      "classify every row") {
    // y = +1 iff x1 > x2, with a wide margin — batch perceptron separates
    // this in few epochs
    val rows = (1 to 20).map { i =>
      if (i % 2 == 0) (1L, 10L + i, 1L) else (-1L, 1L, 10L + i)
    }
    val df = rows.toDF("y", "x1", "x2")
    val out = Perceptron.train(df, Seq("x1", "x2"), "y", epochs = 6)
      .collect()
    assert(out.length == 6)
    // epoch 1 starts from the zero model: everything misclassified
    assert(out.head.getLong(2) == 20L)
    val last = out.last
    assert(last.getLong(2) == 0L, s"should separate: ${out.toList}")
    // once error hits 0 the weights stop moving (no misclassified rows)
    val zeroEpochs = out.filter(_.getLong(2) == 0L)
    assert(zeroEpochs.map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
      .distinct.length == 1)
    // and the frozen weights really classify every row
    val (wb, w1, w2) = (last.getLong(3), last.getLong(4), last.getLong(5))
    assert(rows.forall { case (y, x1, x2) => y * (wb + w1 * x1 + w2 * x2) > 0 })
  }

  test("evaluate: trained weights on separable data give a clean " +
      "confusion matrix") {
    val rows = (1 to 20).map { i =>
      if (i % 2 == 0) (1L, 10L + i, 1L) else (-1L, 1L, 10L + i)
    }
    val df = rows.toDF("y", "x1", "x2")
    val last = Perceptron.train(df, Seq("x1", "x2"), "y", epochs = 6)
      .collect().last
    val r = Perceptron.evaluate(df, Seq("x1", "x2"), "y",
      (3 to 5).map(last.getLong)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) == ((20L, 10L, 0L, 0L, 10L, 1.0)))
  }

  test("update is the exact integer sum over misclassified rows") {
    val df = Seq((1L, 3L), (-1L, 5L)).toDF("y", "x")
    val out = Perceptron.train(df, Seq("x"), "y", epochs = 1).head()
    // zero model misclassifies both (margin 0): db = 1-1 = 0,
    // dx = 1*3 + (-1)*5 = -2
    assert(out.getLong(2) == 2L)
    assert(out.getLong(3) == 0L)
    assert(out.getLong(4) == -2L)
  }

  test("calibration: a perfectly separating margin gives monotone " +
      "frac_pos 0 -> 1 across buckets; counts and means exact") {
    // margin = x (weights b=0, w=1); y = sign-correlated perfectly
    val rows = (1 to 50).map(i => (if (i > 25) 1L else -1L, i.toLong))
    val df = rows.toDF("y", "x")
    val g = Perceptron.calibration(df, Seq("x"), "y", Seq(0L, 1L))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(g.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(g.values.map(_._1).sum == 50L, "buckets partition the rows")
    val fracs = (1L to 5L).map(b => g(b)._3)
    assert(fracs == fracs.sorted, s"monotone frac_pos: $fracs")
    assert(g(1L)._3 == 0.0 && g(5L)._3 == 1.0)
    // bucket 1 = margins 1..10 -> mean 5.5
    assert(g(1L)._4 == 5.5, s"exact mean margin: ${g(1L)._4}")
  }
}
