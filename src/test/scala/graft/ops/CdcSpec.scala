package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("scd2Merge: update closes + reopens, no-op keeps, insert births, history passes through") {
    val dim = Seq(
      // closed history row — must pass through untouched
      (1L, "alice", 10.0, d("2023-01-01"), Option(d("2024-01-01"))),
      // open rows
      (1L, "alice", 20.0, d("2024-01-01"), None: Option[java.sql.Date]),
      (2L, "bob", 30.0, d("2024-01-01"), None),
      (3L, "carol", 40.0, d("2024-01-01"), None)
    ).toDF("id", "name", "bal", "valid_from", "valid_to")
    val changes = Seq(
      (1L, "alice", 25.0),  // update: bal differs
      (2L, "bob", 30.0),    // no-op echo: identical
      (9L, "zoe", 5.0)      // brand-new key
    ).toDF("id", "name", "bal")

    val got = Cdc.scd2Merge(dim, changes, Seq("id"), lit(d("2024-06-01")))
      .orderBy(col("id"), col("valid_from"), col("valid_to").asc_nulls_last)
      .collect()

    val rows = got.map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getDate(3).toString, Option(r.getDate(4)).map(_.toString)))
    assert(rows.toSeq == Seq(
      (1L, "alice", 10.0, "2023-01-01", Some("2024-01-01")), // history
      (1L, "alice", 20.0, "2024-01-01", Some("2024-06-01")), // closed now
      (1L, "alice", 25.0, "2024-06-01", None),               // reopened
      (2L, "bob", 30.0, "2024-01-01", None),                 // no-op kept open
      (3L, "carol", 40.0, "2024-01-01", None),               // untouched
      (9L, "zoe", 5.0, "2024-06-01", None)))                 // born
  }

  test("scd2Merge: null attributes compare null-safely (null == null is a no-op)") {
    val dim = Seq(
      (1L, null.asInstanceOf[String], d("2024-01-01"), None: Option[java.sql.Date]),
      (2L, "x", d("2024-01-01"), None)
    ).toDF("id", "name", "valid_from", "valid_to")
    val changes = Seq(
      (1L, null.asInstanceOf[String]), // identical (both null) -> no churn
      (2L, null.asInstanceOf[String])  // x -> null is a REAL change
    ).toDF("id", "name")
    val got = Cdc.scd2Merge(dim, changes, Seq("id"), lit(d("2024-06-01")))
      .orderBy(col("id"), col("valid_from")).collect()
    assert(got.length == 3)
    assert(got(0).getLong(0) == 1L && got(0).isNullAt(3), "null no-op stays open")
    assert(got(1).getLong(0) == 2L && got(1).getDate(3) == d("2024-06-01"))
    assert(got(2).getLong(0) == 2L && got(2).isNullAt(1) && got(2).isNullAt(3))
  }

  test("scd2Merge: idempotent — replaying the same batch changes nothing") {
    val dim = Seq((1L, "a", d("2024-01-01"), None: Option[java.sql.Date]))
      .toDF("id", "name", "valid_from", "valid_to")
    val changes = Seq((1L, "b")).toDF("id", "name")
    val once = Cdc.scd2Merge(dim, changes, Seq("id"), lit(d("2024-06-01")))
    val twice = Cdc.scd2Merge(once, changes, Seq("id"), lit(d("2024-06-01")))
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty,
      "re-applying an applied batch must be a no-op")
  }

  test("scd2Merge rejects a change batch with wrong columns") {
    val dim = Seq((1L, "a", d("2024-01-01"), None: Option[java.sql.Date]))
      .toDF("id", "name", "valid_from", "valid_to")
    val bad = Seq((1L, "a", 1.0)).toDF("id", "name", "extra")
    intercept[IllegalArgumentException] {
      Cdc.scd2Merge(dim, bad, Seq("id"), lit(d("2024-06-01")))
    }
  }

  test("scd2Merge: exact-duplicate change rows collapse; conflicting rows " +
      "for one key fail fast") {
    val dim = Seq((1L, "a", d("2024-01-01"), None: Option[java.sql.Date]))
      .toDF("id", "name", "valid_from", "valid_to")
    // at-least-once delivery: the same event twice is fine
    val dup = Seq((1L, "b"), (1L, "b")).toDF("id", "name")
    val merged = Cdc.scd2Merge(dim, dup, Seq("id"), lit(d("2024-06-01")))
    assert(merged.filter($"valid_to".isNull).count() == 1,
      "exactly one open version after a duplicated change event")
    // two DIFFERING rows for one key at one effectiveTs is a contradiction
    val conflict = Seq((1L, "b"), (1L, "c")).toDF("id", "name")
    val ex = intercept[Exception] {
      Cdc.scd2Merge(dim, conflict, Seq("id"), lit(d("2024-06-01"))).count()
    }
    assert(ex.getMessage.contains("conflicting change rows"), ex.getMessage)
  }

  test("scd2Merge: NULL business keys version like any other value") {
    val dim = Seq(
      (Option.empty[java.lang.Long], "a", d("2024-01-01"), None: Option[java.sql.Date]),
      (Option(2L): Option[java.lang.Long], "x", d("2024-01-01"), None: Option[java.sql.Date]))
      .toDF("id", "name", "valid_from", "valid_to")
    val changes = Seq((Option.empty[java.lang.Long], "b"))
      .toDF("id", "name")
    val merged = Cdc.scd2Merge(dim, changes, Seq("id"), lit(d("2024-06-01")))
      .orderBy($"id".asc_nulls_first, $"valid_from")
    // the null-keyed open row was closed and a new version born; row 2 kept
    assert(merged.count() == 3)
    val nullRows = merged.filter($"id".isNull).collect()
    assert(nullRows.length == 2)
    assert(nullRows.count(_.isNullAt(3)) == 1, "one open null-key version")
    assert(nullRows.exists(r => r.getString(1) == "b" && r.isNullAt(3)),
      "the born version carries the new attributes")
  }

  test("scd2Merge shuffles the dimension once: exchanges are reused across " +
      "the kept/closed/born branches") {
    val dim = spark.range(0L, 10000L).toDF("id")
      .withColumn("name", concat(lit("n"), col("id")))
      .withColumn("valid_from", lit(d("2024-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
    val changes = spark.range(0L, 100L).toDF("id")
      .withColumn("name", lit("changed"))
    val merged = Cdc.scd2Merge(dim, changes, Seq("id"), lit(d("2024-06-01")))
    merged.count() // materialize so AQE finalizes the physical plan
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("TableCacheQueryStage")
      || plan.count(_ == '\n') > 0 && "Exchange hashpartitioning".r
        .findAllIn(plan).size <= 2,
      s"branches must reuse the join exchanges, not re-shuffle:\n$plan")
  }

  test("upsertLatest: highest seq wins, delete overrides earlier " +
      "update, insert lands, untouched keys pass through") {
    val base = Seq((1L, "one", 10.0), (2L, "two", 20.0), (3L, "three", 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq(
      (1L, "one_v1", 11.0, "U", 1),   // superseded by seq 2
      (1L, "one_v2", 12.0, "U", 2),   // wins
      (2L, "two_x", 0.0, "U", 1),     // superseded by the delete
      (2L, "two_x", 0.0, "D", 2),     // key 2 gone
      (9L, "nine", 90.0, "I", 1))     // new key
      .toDF("k", "name", "bal", "op", "seq")
    val got = Cdc.upsertLatest(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(got == Map(
      1L -> (("one_v2", 12.0)),
      3L -> (("three", 30.0)),
      9L -> (("nine", 90.0))), s"got $got")
  }

  test("upsertLatest rejects a change batch with extra or missing columns") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val bad = Seq((1L, "a", "U")).toDF("k", "v", "op")
    intercept[IllegalArgumentException] {
      Cdc.upsertLatest(base, bad, Seq("k"), "seq", "op")
    }
  }

  test("snapshot store: unmarked version invisible until its marked " +
      "retry; asOf time-travels the version chain") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_snap").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val v0 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val v1 = Seq((1L, "a2"), (3L, "c")).toDF("k", "v")
    Cdc.writeSnapshot(v0, dir, 0L)
    // crashed v1: data without its marker
    v1.write.mode("overwrite").parquet(s"$dir/data/batch=1")
    assert(rows(Cdc.serveSnapshot(spark, dir)) == rows(v0),
      "unmarked version must stay invisible")
    Cdc.writeSnapshot(v1, dir, 1L) // marked retry
    assert(rows(Cdc.serveSnapshot(spark, dir)) == rows(v1))
    assert(rows(Cdc.serveSnapshot(spark, dir, asOf = Some(0L))) == rows(v0),
      "asOf reads the chain as of that version")
  }

  test("snapshotDiff: added/removed/changed/unchanged classified from " +
      "two committed versions; doubles compare numerically") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_cdc_diff").toString
    val v1 = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("k", "name", "bal")
    val v2 = Seq((1L, "a", 1.5), (2L, "B", 2.5), (4L, "d", 4.5))
      .toDF("k", "name", "bal")
    Cdc.writeSnapshot(v1, path, 1L)
    Cdc.writeSnapshot(v2, path, 2L)
    val r = Cdc.snapshotDiff(spark, path, 1L, 2L, Seq("k"),
      Seq("name", "bal")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 1L, 1L, 1L))) // +4, -3, 2 changed, 1 unchanged
  }
}
