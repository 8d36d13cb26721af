package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redact scrubs emails, SSNs, and long numbers in pass order") {
    val df = Seq(
      "mail me at jo.doe+x@lab.example.org now",
      "ssn 123-45-6789 acct 99887766 short 12345",
      "clean text, nothing to scrub").toDF("t")
    val got = df.select(Curation.redact($"t")).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> now")
    assert(got(1) == "ssn <SSN> acct <ID> short 12345")
    assert(got(2) == "clean text, nothing to scrub")
  }

  test("matchCount counts per pattern against the original text") {
    val df = Seq("a@b.co and c@d.co, id 1234567, ssn 000-11-2222").toDF("t")
    val row = df.select(
      Curation.matchCount($"t", Curation.EmailRe).as("e"),
      Curation.matchCount($"t", Curation.SsnRe).as("s"),
      Curation.matchCount($"t", Curation.LongNumberRe).as("n")).collect()(0)
    assert(row.getLong(0) == 2 && row.getLong(1) == 1 && row.getLong(2) == 1)
  }

  test("packSequences: budget boundary starts a new sequence; shards independent") {
    // shard A: 3 docs of 100 tokens at budget 256 -> cum-before 0,100,200
    // (all seq 0), 4th doc cum-before 300 -> seq 1. shard B independent.
    def doc(n: Int) = (1 to n).map("w" + _).mkString(" ")
    val df = Seq(
      ("A", 1L, doc(100)), ("A", 2L, doc(100)), ("A", 3L, doc(100)),
      ("A", 4L, doc(100)), ("B", 9L, doc(10))).toDF("src", "id", "text")
    val got = Curation.packSequences(df, "src", "id", "text", 256)
      .select($"src", $"id", $"seq_id").as[(String, Long, Long)]
      .collect().toSet
    assert(got == Set(("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 0L),
      ("A", 4L, 1L), ("B", 9L, 0L)))
  }

  test("stratifiedSample is deterministic and respects per-stratum rates") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zz"))
      .toDF("id", "lang")
    val kept = Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 0.5), defaultRate = 0.1)
    val counts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // 1000 per stratum; md5 buckets are uniform — allow generous slack
    assert(counts("en") > 400 && counts("en") < 600)
    assert(counts("zz") > 50 && counts("zz") < 160)
    // rerun is bit-identical (no RNG state)
    val again = Curation.stratifiedSample(df, "lang", "id",
      Map("en" -> 0.5), defaultRate = 0.1)
    assert(kept.orderBy("id").collect().toSeq == again.orderBy("id").collect().toSeq)
  }
}
