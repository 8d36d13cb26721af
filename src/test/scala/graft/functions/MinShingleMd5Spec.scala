package graft.functions

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The fused [[MinShingleMd5]] expression must be BIT-EQUAL to the
  * Column formulation `array_min(transform(charShingles(c,k), md5))` —
  * a performance rewrite, never a semantic fork.
  */
class MinShingleMd5Spec extends SparkSpec {
  import spark.implicits._

  private def assertEqual(df: DataFrame, k: Int): Unit = {
    val both = df.select(
      col("doc_id"),
      MinShingleMd5(col("text"), k).as("fused"),
      array_min(transform(Dedup.charShingles(col("text"), k), sh => md5(sh)))
        .as("colform"))
    val bad = both.filter(!(col("fused") <=> col("colform")))
    assert(bad.isEmpty, bad.collect().take(5).mkString("\n"))
  }

  test("fused == Column formulation on edge cases, k=16 and k=3") {
    val docs = Seq(
      (1L, ""),
      (2L, "short"),
      (3L, "exactly sixteen!"),          // length == k for k=16
      (4L, "a" * 17),
      (5L, "héllo wörld 日本語 テスト mixed multibyte content here"),
      (6L, "the quick brown fox jumps over the lazy dog " * 5),
      (7L, "controlchars and\ttabs\nnewlines"),
      (8L, "𝕊upplementary 𝄞 plane chars 🎵 beyond the BMP")
    ).toDF("doc_id", "text")
    assertEqual(docs, 16)
    assertEqual(docs, 3)
  }

  test("fused == Column formulation on the documents fixture (cleaned)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        graft.ops.TextOps.cleanMsg(col("text")).as("text"))
    assertEqual(docs, 16)
  }

  test("property: fused == Column formulation on random multibyte text") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ch = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.const(" "),
      Gen.oneOf("é", "日", "𝄞", "🎵", "\n", "."))
    val textGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, ch).map(_.mkString))
    val texts = (0 until 150)
      .flatMap(i => textGen(Gen.Parameters.default, Seed(i.toLong)))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    assertEqual(df, 16)
    assertEqual(df, 2)
  }

  test("malformed UTF-8 steps exactly like UTF8String.substring") {
    // parquet doesn't validate UTF-8; a stray continuation byte must
    // shingle identically to the Column form (whose charShingles use
    // Spark's substr stepping). Reference = min over md5(substring)
    // computed with UTF8String's own code-point API.
    import org.apache.spark.unsafe.types.UTF8String
    import java.security.MessageDigest
    val cases = Seq[Array[Byte]](
      Array(0x61, 0x80, 0x62, 0x63, 0x64).map(_.toByte),        // a <cont> b c d
      Array(0x61, 0xc3, 0xa9, 0x80, 0x62).map(_.toByte),        // a é <cont> b
      Array(0xf0, 0x9d, 0x84, 0x9e, 0x80, 0x61).map(_.toByte),  // 𝄞 <cont> a
      Array(0xf8, 0x61, 0x62).map(_.toByte))                    // invalid lead
    for (bytes <- cases; k <- Seq(2, 3)) {
      val t = UTF8String.fromBytes(bytes)
      val n = t.numChars()
      val m = math.max(n - k + 1, 1)
      val md = MessageDigest.getInstance("MD5")
      val ref = (0 until m).map { j =>
        md.reset()
        md.update(t.substring(j, math.min(j + k, n)).getBytes)
        md.digest().map(b => f"${b & 0xff}%02x").mkString
      }.min
      val got = MinShingleMd5Table.minShingle(t, k).toString
      assert(got == ref, s"k=$k bytes=${bytes.mkString(",")}")
    }
  }

  test("fused expression is codegen'd and shuffle-free as a projection") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), MinShingleMd5(col("text"), 16).as("fp"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("*(1) Project"), plan)
  }
}
