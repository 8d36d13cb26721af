package graft.ops

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def recs(rows: (Long, String)*) = rows.toDF("id", "name")

  test("deletion blocking finds every radius-1 edit class and nothing past it") {
    val clean = recs((1L, "alpha"), (2L, "bravo"), (3L, "omega"))
    val dirty = recs(
      (11L, "alpha"),  // exact
      (12L, "alpht"),  // substitution of last char
      (13L, "brav"),   // deletion
      (14L, "bravoo"), // insertion
      (15L, "xxxxx"))  // unrelated — must not match
    val m = EntityResolution.verifiedPairs(dirty, "id",
      clean.withColumnRenamed("id", "cid"), "cid", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(m === Set((11L, 1L, 0L), (12L, 1L, 1L), (13L, 2L, 1L),
      (14L, 2L, 1L)))
  }

  test("bestMatch picks lowest distance, then lowest right id") {
    val clean = recs((1L, "aaab"), (2L, "aaac"))
    val dirty = recs((10L, "aaab"), (20L, "aaaa"))
    // 10 matches 1 at dist 0 (and 2 at dist 1): keep (1, 0)
    // 20 matches both at dist 1: tie → lower clean id 1
    val b = EntityResolution.bestMatch(dirty, "id",
      clean.withColumnRenamed("id", "cid"), "cid", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(b === Set((10L, 1L, 0L), (20L, 1L, 1L)))
  }

  test("clusters resolve-then-group: ambiguous record joins ONE entity; " +
      "unmatched stay singletons") {
    val clean = recs((1L, "aaaa"), (2L, "aaab"), (3L, "zzzz"))
    val dirty = recs((10L, "aaa"), (20L, "qqqq"))
    // "aaa" is one insertion from BOTH "aaaa" and "aaab", but clustering
    // runs over best-match edges: it resolves to the lower id 1 only —
    // the two clean entities must NOT merge through it
    val c = EntityResolution.clusters(dirty, "id",
      clean.withColumnRenamed("id", "cid"), "cid", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    assert(c === List((1L, 1L, 2L), (2L, 2L, 1L), (3L, 3L, 1L),
      (10L, 1L, 2L), (20L, 20L, 1L)))
  }

  test("clusters: several dirty records resolved to one entity form one " +
      "star; clean entities never merge") {
    val clean = recs((1L, "id01"), (2L, "id02"))
    val dirty = recs((10L, "id0"), (11L, "id01"), (12L, "xd01"))
    val c = EntityResolution.clusters(dirty, "id",
      clean.withColumnRenamed("id", "cid"), "cid", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // 10/11/12 all best-match entity 1 → star {1,10,11,12}; 2 singleton
    assert(c === List((1L, 1L, 4L), (2L, 2L, 1L), (10L, 1L, 4L),
      (11L, 1L, 4L), (12L, 1L, 4L)))
  }

  test("golden: clean record wins over a longer dirty name; a " +
      "singleton cluster elects itself") {
    import spark.implicits._
    // dirty 101 resolves to clean 1 at distance 1; dirty 202 matches
    // nothing (distance 2 from everything)
    val clean = Seq((1L, "alice")).toDF("clean_id", "name")
    val dirty = Seq((101L, "alicex"), (202L, "zzzzzz"))
      .toDF("dirty_id", "name")
    val r = EntityResolution.golden(dirty, "dirty_id", clean, "clean_id",
      "name").collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))).toMap
    // cluster of {1, 101}: clean-first beats the LONGER dirty name
    assert(r(1L) === ((2L, 1L, 1L, "alice")))
    // singleton: itself, zero clean members
    assert(r(202L) === ((1L, 0L, 202L, "zzzzzz")))
  }

  test("maxBlockDf stop-lists keys hot on BOTH sides; pairs with no " +
      "other shared key drop, distinct-key pairs survive") {
    val clean = recs((1L, "alpha"), (2L, "unk"), (3L, "unk"), (4L, "unk"))
    val dirty = recs((11L, "alphx"), (12L, "unk"), (13L, "unk"), (14L, "unk"))
    def pairs(cap: Option[Long]) = EntityResolution.verifiedPairs(
      dirty, "id", clean.withColumnRenamed("id", "cid"), "cid", "name",
      maxDist = 1, maxBlockDf = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped: the 3x3 placeholder block (dist 0) plus the real pair
    assert(pairs(None).size === 10)
    // cap 2: every key of "unk" (identity + each deletion) has df 3 on
    // BOTH sides -> stop-listed; the junk block vanishes entirely while
    // the unique-keyed real pair survives
    assert(pairs(Some(2L)) === Set((11L, 1L)))
  }

  test("maxBlockDf: one-sided heat is NOT stop-listed (linear already)") {
    val clean = recs((1L, "unk"))
    val dirty = recs((12L, "unk"), (13L, "unk"), (14L, "unk"))
    val p = EntityResolution.verifiedPairs(dirty, "id",
      clean.withColumnRenamed("id", "cid"), "cid", "name",
      maxDist = 1, maxBlockDf = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // lc("unk") = 1 <= cap: key survives, all three matches kept
    assert(p === Set((12L, 1L), (13L, 1L), (14L, 1L)))
  }

  test("maxBlockDf counts DOCUMENT frequency: colliding deletions of " +
      "one record contribute one, not one per occurrence") {
    // "aaaa" has four identical deletions "aaa" — deletionKeys dedups,
    // so df("aaa") = 3 records per side, not 12 occurrences; at cap 3
    // nothing is hot and the full 3x3 block survives
    val clean = recs((1L, "aaaa"), (2L, "aaaa"), (3L, "aaaa"))
    val dirty = recs((11L, "aaaa"), (12L, "aaaa"), (13L, "aaaa"))
    val n = EntityResolution.verifiedPairs(dirty, "id",
      clean.withColumnRenamed("id", "cid"), "cid", "name",
      maxDist = 1, maxBlockDf = Some(3L)).count()
    assert(n === 9L)
  }

  test("blockingMetrics: disjoint name universes report 0 (not NULL) " +
      "verified/matched; maxBlockDf shrinks the candidate count") {
    import spark.implicits._
    // no shared deletion key between the two sides -> empty candidates
    val clean = Seq((1L, "aaaaa")).toDF("clean_id", "name")
    val dirty = Seq((101L, "zzzzz")).toDF("dirty_id", "name")
    val r = EntityResolution.blockingMetrics(dirty, "dirty_id",
      clean, "clean_id", "name").collect().head
    assert(!r.isNullAt(4) && r.getLong(4) == 0L, "n_verified must be 0")
    assert(!r.isNullAt(5) && r.getLong(5) == 0L, "n_matched must be 0")
    // capped report: the placeholder block (3x3 on both sides) is
    // stop-listed, so n_candidates drops to the real pair only
    val c2 = Seq((1L, "alpha"), (2L, "unk"), (3L, "unk"), (4L, "unk"))
      .toDF("clean_id", "name")
    val d2 = Seq((11L, "alphx"), (12L, "unk"), (13L, "unk"), (14L, "unk"))
      .toDF("dirty_id", "name")
    val capped = EntityResolution.blockingMetrics(d2, "dirty_id",
      c2, "clean_id", "name", maxDist = 1, maxBlockDf = Some(2L))
      .collect().head
    assert(capped.getLong(3) == 1L && capped.getLong(4) == 1L &&
      capped.getLong(5) == 1L)
  }

  test("blockingMetrics: exact counts, quadratic space avoided, " +
      "reduction ratio and match rate") {
    import spark.implicits._
    val clean = Seq((1L, "alice"), (2L, "bobby")).toDF("clean_id", "name")
    val dirty = Seq((101L, "alicex"), (202L, "zzzzzz"))
      .toDF("dirty_id", "name")
    val r = EntityResolution.blockingMetrics(dirty, "dirty_id",
      clean, "clean_id", "name").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getString(2) == "4")
    // only (101, alice) blocks AND verifies at distance 1
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L && r.getLong(5) == 1L)
    assert(r.getDouble(6) == 1.0 - 0.25)
    assert(r.getDouble(7) == 0.5)
  }
}
