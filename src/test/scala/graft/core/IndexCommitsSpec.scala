package graft.core

import graft.SparkSpec
import graft.ops.Retrieval

class IndexCommitsSpec extends SparkSpec {
  import spark.implicits._

  /** Build the resurrection-prone marker chain: batch_0 (two docs),
    * del_1 (tombstones doc 2), compact_2 (supersedes batch_0 + del_1),
    * compact_3 (supersedes batch_2 — a chained compaction, so compact_2
    * itself becomes a superseded unit). Served state: batches={3}.
    */
  private def buildChain(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft_vacuum_order").toString
    Retrieval.writeIndex(
      Seq((1L, "apple banana"), (2L, "banana cherry")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    Retrieval.deleteFromIndex(Seq(2L).toDF("doc_id"), "doc_id", path, 1L)
    Retrieval.compactIndex(spark, path, "doc_id", newBatchId = 2L)
    Retrieval.compactIndex(spark, path, "doc_id", newBatchId = 3L)
    assert(IndexCommits.servedState(spark, path) ==
      IndexCommits.State(Seq(3L), Seq.empty))
    path
  }

  private val retrievalDirs: (String, Long) => Seq[String] = {
    case ("del", id) => Seq(s"tombstones/batch=$id")
    case (_, id)     => Seq(s"postings/batch=$id", s"stats/batch=$id")
  }

  test("vacuum sweeps markers in resurrection-safe order: a crash at ANY " +
      "superseded unit leaves servedState unchanged and the retry heals") {
    // Superseded units: batch_0, del_1, compact_2. Crash the sweep AT
    // each of them in turn (dirsFor throws when asked about that unit):
    // everything processed earlier is already gone, and replay must
    // still say batches={3} — the ordering invariant. The classic
    // failure this pins down: lexicographic listing puts compact_2
    // BEFORE del_1, so an unordered sweep deleting compact_2 first
    // resurrects the del_1 tombstone against the compacted batch (its
    // docs get anti-joined and its length double-subtracted), and a
    // crash there corrupts serving until the retry.
    for (abortAt <- Seq(("batch", 0L), ("del", 1L), ("compact", 2L))) {
      val path = buildChain()
      val want = Retrieval.bm25FromIndex(spark, path, "doc_id",
        Seq("banana", "cherry"), 10).collect().toSeq
      intercept[RuntimeException] {
        IndexCommits.vacuum(spark, path, (kind, id) =>
          if ((kind, id) == abortAt)
            throw new RuntimeException(s"injected crash at $abortAt")
          else retrievalDirs(kind, id))
      }
      assert(IndexCommits.servedState(spark, path) ==
        IndexCommits.State(Seq(3L), Seq.empty),
        s"mid-sweep crash at $abortAt resurrected superseded units")
      assert(Retrieval.bm25FromIndex(spark, path, "doc_id",
        Seq("banana", "cherry"), 10).collect().toSeq == want,
        s"serving drifted after a mid-sweep crash at $abortAt")
      // the retry completes the sweep; state and serving still intact
      Retrieval.vacuumIndex(spark, path)
      assert(IndexCommits.servedState(spark, path) ==
        IndexCommits.State(Seq(3L), Seq.empty))
      assert(Retrieval.bm25FromIndex(spark, path, "doc_id",
        Seq("banana", "cherry"), 10).collect().toSeq == want)
      val f = IndexCommits.fs(spark, path)
      assert(!f.exists(new org.apache.hadoop.fs.Path(path + "/postings/batch=0")))
      assert(!f.exists(new org.apache.hadoop.fs.Path(path + "/tombstones/batch=1")))
      assert(!f.exists(new org.apache.hadoop.fs.Path(path + "/postings/batch=2")))
    }
  }
}
