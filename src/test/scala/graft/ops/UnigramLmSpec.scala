package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnigramTable

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("trainLocal: deterministic, chars always kept, prune cap holds") {
    val wf = Array(("banana", 5L), ("bandana", 3L), ("nab", 2L))
    val cfg = UnigramLm.Config(maxPieceLen = 3, seedSize = 10,
      pruneTo = 6, emIters = 2, maxWordLen = 12)
    val (v1, t1) = UnigramLm.trainLocal(wf, cfg)
    val (v2, t2) = UnigramLm.trainLocal(wf, cfg)
    assert(v1 == v2 && t1 == t2, "training must be a pure function")
    // closure: every distinct char survives pruning
    val chars = wf.flatMap(_._1.toSeq).map(_.toString).distinct
    chars.foreach(c => assert(v1.exists(_._1 == c), s"char '$c' dropped"))
    // cap: at most pruneTo multi-char pieces beyond the kept chars
    assert(v1.count(_._1.length > 1) <= cfg.pruneTo)
    // order pin: (usage desc, piece asc)
    assert(v1 == v1.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca > cb else pa < pb }) // ASCII: String order = cp order
  }

  test("UnigramTable Viterbi equals brute-force max-product enumeration " +
      "with (score desc, pieces asc) tie-break, zero-prob pieces included") {
    val vocab = Seq(("ba", 4L), ("na", 4L), ("ban", 3L), ("ana", 0L),
      ("b", 2L), ("a", 5L), ("n", 1L))
    val total = vocab.map(_._2).sum
    val t = new UnigramTable(vocab, total, 3)
    val probs = vocab.map { case (p, c) => p -> c.toDouble / total.toDouble }
      .toMap
    def enumerate(w: String): Seq[(Double, String)] =
      if (w.isEmpty) Seq((1.0, ""))
      else (1 to math.min(3, w.length)).flatMap { l =>
        val piece = w.substring(0, l)
        probs.get(piece).toSeq.flatMap { p =>
          enumerate(w.substring(l)).map { case (s, str) =>
            (p * s, if (str.isEmpty) piece else piece + " " + str)
          }
        }
      }
    for (w <- Seq("banana", "ban", "nab", "aaa", "banban", "ananab")) {
      // enumeration multiplies left-to-right like the DP: rescore the
      // piece string in path order for the comparison
      val paths = enumerate(w).map { case (_, str) =>
        (str.split(" ").foldLeft(1.0)((acc, p) => acc * probs(p)), str)
      }
      val best = paths.sortWith { case ((sa, pa), (sb, pb)) =>
        if (sa != sb) sa > sb else pa < pb }.head._2
      assert(t.segmentWord(w) == best, s"word $w")
    }
    // unsegmentable: unseen character
    assert(t.segmentWord("xy") == null)
    assert(t.segmentWord("") == "")
  }

  test("encode: distributed Viterbi expression matches the driver-side " +
      "table on the fixture corpus; unseen-char words yield null") {
    val docs = graft.core.Tables.documents(spark, graft.SparkSpec.Sf0001)
    val (vocab, total) = UnigramLm.train(docs, "text")
    val table = new UnigramTable(vocab, total, 4)
    val got = UnigramLm.encode(docs, "doc_id", "text", vocab, total)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty && got.forall(_._3 != null),
      "fixture corpus words must all be segmentable")
    // spot-check 50 rows against the driver-side segmentation of the
    // original word (pieces concatenated = the word)
    got.take(50).foreach { case (_, _, pieces) =>
      assert(pieces.split(" ").mkString("") ==
        table.segmentWord(pieces.replace(" ", "")).split(" ").mkString(""))
    }
    // an unseen character (corpus is ASCII alnum) → null pieces
    val weird = Seq((1L, "café")).toDF("doc_id", "text")
    val w = UnigramLm.encode(weird, "doc_id", "text", vocab, total).collect()
    assert(w.length == 1 && w.head.isNullAt(2))
  }
}
