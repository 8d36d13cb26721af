package graft.core

import graft.SparkSpec
import graft.ops.EntityResolution
import org.apache.spark.sql.functions._

/** Pins the size-bounded broadcast guard (Broadcasts.bounded): a
  * derived stop-list is hint-broadcast only while provably small;
  * above the row bound the consuming join degrades to a shuffled
  * join (never a driver-OOM-sized broadcast) with IDENTICAL results —
  * the r16 ADVICE scale-safety item for the ER/contamination
  * stop-lists.
  */
class BroadcastsSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("below the bound the hint yields a broadcast join") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val small = Seq(1, 2).toDF("k")
    val j = big.join(Broadcasts.bounded(small, maxRows = 100), Seq("k"), "left_anti")
    assert(plan(j).contains("BroadcastHashJoin"))
    assert(j.count() == 1000L - 2 * 143) // k in {1,2}: 143 ids each
  }

  test("above the bound the hint is dropped; the planner (with accurate " +
      "cached-size stats) decides, and a shuffled fallback is identical") {
    // At test scale the un-hinted join still auto-broadcasts — off the
    // planner's own (accurate, post-materialization) estimate, which is
    // the designed behavior: the guard only removes the FORCED hint.
    // Emulate "estimate too big" by disabling auto-broadcast.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val big = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("id", "k")
    val small = Seq(1, 2).toDF("k")
    val j = big.join(Broadcasts.bounded(small, maxRows = 1), Seq("k"), "left_anti")
    assert(!plan(j).contains("BroadcastHashJoin"),
      "over-bound stop-list must fall back to a shuffled join")
    val hinted = big.join(broadcast(small), Seq("k"), "left_anti")
    assert(j.orderBy("id").collect().toSeq ==
      hinted.orderBy("id").collect().toSeq)
  }

  test("ER hot-block guard path survives an over-bound stop-list " +
      "(shuffled anti-join, same candidates)") {
    def build(s: org.apache.spark.sql.SparkSession) = {
      import s.implicits._
      // two sides sharing one hot key ("aa" from many records) plus
      // distinct near-dup names; cap 2 stop-lists the hot key
      val left = ((1 to 40).map(i => (i.toLong, "aa")) ++
        Seq((100L, "bob"), (101L, "rob"))).toDF("dirty_id", "name")
      val right = ((1 to 40).map(i => (i.toLong + 1000, "aa")) ++
        Seq((200L, "bob"))).toDF("clean_id", "name")
      EntityResolution.candidates(
        left, "dirty_id", right, "clean_id", "name", maxBlockDf = Some(2L))
    }
    val sBig = spark.newSession() // default bound: broadcast path
    val sZero = spark.newSession() // bound 0: every stop-list "too big"
    sZero.conf.set("graft.broadcast.maxRows", "0")
    // see above: emulate a too-big-to-auto-broadcast estimate so the
    // fallback path is actually observable at test scale
    sZero.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val viaBroadcast = build(sBig)
    val viaShuffle = build(sZero)
    // the inner block join may legitimately broadcast either way; the
    // guard governs the stop-list ANTI-joins specifically
    def antiLines(df: org.apache.spark.sql.DataFrame): Seq[String] =
      plan(df).linesIterator.filter(_.contains("LeftAnti")).toSeq
    assert(antiLines(viaBroadcast).exists(_.contains("BroadcastHashJoin")))
    assert(antiLines(viaShuffle).nonEmpty &&
      !antiLines(viaShuffle).exists(_.contains("Broadcast")),
      "over-bound stop-list must fall back to shuffled anti-joins")
    val a = viaBroadcast.orderBy("dirty_id", "clean_id").collect().toSeq
    val b = viaShuffle.orderBy("dirty_id", "clean_id").collect().toSeq
    assert(a == b, "guard path must not change candidates")
    assert(a.nonEmpty)
    assert(!a.exists(r => r.getString(1) == "aa"),
      "hot key must be stop-listed")
  }
}
