package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    // (key, time, tag)
    ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"),
    ("b", 15L, "l3"),
    ("c", 100L, "l4") // key with no right rows at all
  ).toDF("k", "t", "ltag")

  private def rightDf = Seq(
    ("a", 5L, "r1"), ("a", 18L, "r2"), ("a", 30L, "r3"),
    ("b", 20L, "r4"), // only AFTER b's left row
    ("d", 1L, "r5")   // key absent on the left
  ).toDF("rk", "rt", "rtag")

  test("backward as-of: latest right row with rt <= t, left outer") {
    val out = AsOfJoin.asof(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "ltag", "rt", "rtag")
      .orderBy("k", "t")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        Option(r.getString(4)).getOrElse("-")))
    assert(out.toSeq == Seq(
      ("a", 5L, "l0", 5L, "r1"),    // exact boundary: rt == t matches
      ("a", 10L, "l1", 5L, "r1"),
      ("a", 20L, "l2", 18L, "r2"),  // r3@30 is in the future -> skipped
      ("b", 15L, "l3", -1L, "-"),   // all right rows later -> nulls
      ("c", 100L, "l4", -1L, "-"))) // no right rows for key
  }

  test("timestamp time columns and multi-column keys work") {
    val l = Seq((1L, "x", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "L"))
      .toDF("k1", "k2", "ts", "tag")
    val r = Seq(
      (1L, "x", java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "early"),
      (1L, "y", java.sql.Timestamp.valueOf("2024-01-01 09:30:00"), "wrong-key"),
      (1L, "x", java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), "late"))
      .toDF("rk1", "rk2", "rts", "rtag")
    val out = AsOfJoin.asof(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "ts", "rts")
      .select("tag", "rtag").as[(String, String)].collect().toSeq
    assert(out == Seq(("L", "early")))
  }

  /** Run `f` with autoBroadcastJoinThreshold set to `v`, restoring the
    * CAPTURED prior value (not a hardcoded one — see the AQE test note).
    */
  private def withThreshold[T](v: String)(f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, v)
    try f finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("strategy auto-broadcasts a small right side; parity with the merge path") {
    // default threshold (10MB): the tiny dimension plans as broadcast
    val auto = AsOfJoin.asof(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "ltag", "rt", "rtag")
    val plan = auto.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"expected broadcast pick:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"fact side must not shuffle:\n$plan")
    val got = auto.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val viaMerge = withThreshold("-1") {
      AsOfJoin.asof(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
        .select("k", "t", "ltag", "rt", "rtag")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    }
    assert(got == viaMerge)
  }

  test("merge is correct across many keys and partitions") {
    withThreshold("-1") {
    // 100 keys x 20 left rows, right rows at every 3rd tick: the as-of
    // match is floor-to-multiple-of-3 -- verifiable in closed form
    val l = spark.range(2000).select(
      (col("id") % 100).as("k"), (expr("id DIV 100") * 5 + 7).as("t"))
    val r = spark.range(2100).select(
      (col("id") % 100).as("rk"), (expr("id DIV 100") * 3).as("rt"))
    val out = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "rt")
    val bad = out.filter(col("rt") =!= least(lit(60L), col("t") - col("t") % 3) ||
      col("rt").isNull).count()
    assert(bad == 0)
    assert(out.count() == 2000)
    }
  }

  test("plan: co-partitioned sort-merge, no cartesian/nested-loop operator") {
    withThreshold("-1") {
      val out = AsOfJoin.asof(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      val physical = out.queryExecution.executedPlan.toString
      assert(physical.contains("AsOfJoin"))
      assert(!physical.contains("CartesianProduct"))
      assert(!physical.contains("BroadcastNestedLoopJoin"))
      // exactly one exchange per side (co-partitioning on the key)
      val nEx = "Exchange hashpartitioning".r.findAllIn(physical).length
      assert(nEx == 2, s"expected 2 shuffles, got $nEx in:\n$physical")
    }
  }

  test("empty right side: all left rows survive with nulls") {
    val out = AsOfJoin.asof(leftDf, rightDf.filter(col("rk") === "zzz"),
      Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() == 5)
    assert(out.filter(col("rtag").isNotNull).count() == 0)
  }

  test("empty left side: empty result") {
    val out = AsOfJoin.asof(leftDf.filter(col("k") === "zzz"), rightDf,
      Seq("k"), Seq("rk"), "t", "rt")
    assert(out.count() == 0)
  }

  test("asofBroadcast: same results as the sort-merge operator, no shuffle") {
    val sm = AsOfJoin.asof(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "ltag", "rt", "rtag")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val bcOut = AsOfJoin.asofBroadcast(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      .select("k", "t", "ltag", "rt", "rtag")
    val bc = bcOut.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(bc == sm)
    // dimension shape: the fact side is a narrow map (no shuffle); the
    // dimension side arrives via a REAL BroadcastExchange, so Spark's
    // byte-based broadcast guards and broadcast reuse apply
    val plan = bcOut.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), s"expected broadcast exec:\n$plan")
    assert(plan.contains("BroadcastExchange"), s"expected broadcast exchange:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no shuffle exchange:\n$plan")
  }

  test("strategy picks broadcast vs merge from stats; asofBroadcast forces it") {
    withThreshold("-1") {
      // stats say don't broadcast -> merge shape
      val auto = AsOfJoin.asof(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      assert(!auto.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
      // the explicit variant overrides stats, like a broadcast() hint
      val forced = AsOfJoin.asofBroadcast(leftDf, rightDf, Seq("k"), Seq("rk"), "t", "rt")
      assert(forced.queryExecution.executedPlan.toString.contains("BroadcastAsOfJoin"))
      // and both paths agree row-for-row
      assert(auto.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
        forced.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    }
  }

  test("asofBroadcast: larger randomized parity with the merge operator") {
    val l = spark.range(500).select(
      (col("id") % 7).as("k"), (expr("id DIV 7") * 11 + 3).as("t"))
    val r = spark.range(300).select(
      (col("id") % 7).as("rk"), (expr("id DIV 7") * 17).as("rt"))
    val a = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = AsOfJoin.asofBroadcast(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("results are identical with AQE enabled (co-partitioning survives coalescing)") {
    // If AQE coalesced the two child shuffles differently, rows for one
    // key would land in different partitions on each side and silently
    // vanish from the merge — pin that Spark keeps them aligned.
    val l = spark.range(5000).select(
      (col("id") % 97).as("k"), (expr("id DIV 97") * 5 + 7).as("t"))
    val r = spark.range(5100).select(
      (col("id") % 97).as("rk"), (expr("id DIV 97") * 3).as("rt"))
    def run(): Seq[Seq[Any]] =
      AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "t", "rt")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val off = run()
    // restore the session DEFAULTS afterwards (unset), not a hardcoded
    // value — leaving adaptive.enabled=false leaked into later suites
    // and changed every subsequent plan's shape
    val prevAdaptive = spark.conf.getOption("spark.sql.adaptive.enabled")
    val prevCoalesce =
      spark.conf.getOption("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    try {
      val on = run()
      assert(on == off)
      assert(on.size == 5000)
    } finally {
      def restore(key: String, prev: Option[String]): Unit = prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      restore("spark.sql.adaptive.enabled", prevAdaptive)
      restore("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
    }
  }

  test("randomized parity with an independent union+window reference (100 seeds)") {
    // Reference formulation: tag both sides, union, per-key sort by
    // (time, side), carry the last right row forward with
    // last(_, ignoreNulls) — a completely different plan computing the
    // same semantics. Random duplicates-free (key, time) grids.
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(2024)
    (1 to 100).foreach { trial =>
      val nl = 1 + rnd.nextInt(30)
      val nr = rnd.nextInt(30)
      val lRows = Seq.tabulate(nl)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong * 2 + 1, i.toLong))
        .distinct
      val rRows = Seq.tabulate(nr)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong * 2, 1000L + i))
        .groupBy(t => (t._1, t._2)).values.map(_.head).toSeq // unique (k,t)
      val l = lRows.toDF("k", "t", "lid")
      val r = rRows.toDF("rk", "rt", "rid")

      val got = AsOfJoin.asof(l, r, Seq("k"), Seq("rk"), "t", "rt")
        .select("lid", "rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
        .sortBy(identity).toSeq

      val tagged = l.select(col("k"), col("t"), col("lid"),
          lit(null).cast("long").as("rid"), lit(1).as("side"))
        .unionByName(r.select(col("rk").as("k"), col("rt").as("t"),
          lit(null).cast("long").as("lid"), col("rid"), lit(0).as("side")))
      val w = Window.partitionBy("k").orderBy(col("t"), col("side"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val want = tagged
        .withColumn("carried", last(col("rid"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("lid"), coalesce(col("carried"), lit(-1L)).as("rid"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
        .sortBy(identity).toSeq

      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("resolves by column name and rejects missing columns") {
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(leftDf, rightDf, Seq("nope"), Seq("rk"), "t", "rt")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("asofTolerance: stale matches come back unmatched (all right " +
      "columns NULL), fresh ones untouched, never-matched rows " +
      "unchanged") {
    import spark.implicits._
    val l = Seq(("a", 100L, "p1"), ("a", 500L, "p2"), ("c", 9L, "p3"))
      .toDF("k", "t", "ltag")
    val r = Seq(("a", 90L, "r1"), ("a", 200L, "r2"))
      .toDF("rk", "rt", "rtag")
    val out = graft.plans.AsOfJoin.asofTolerance(l, r,
        Seq("k"), Seq("rk"), "t", "rt", tolerance = 50L)
      .collect().map(x => x.getString(2) ->
        ((if (x.isNullAt(4)) -1L else x.getLong(4),
          Option(x.getString(5)).getOrElse("-")))).toMap
    assert(out("p1") === ((90L, "r1")), "gap 10 <= 50: fresh")
    // p2's latest match is r2 at 200 - gap 300 > 50: nulled, and the
    // even-staler r1 must NOT resurface
    assert(out("p2") === ((-1L, "-")))
    assert(out("p3") === ((-1L, "-")), "no right rows for key c")
  }
}
