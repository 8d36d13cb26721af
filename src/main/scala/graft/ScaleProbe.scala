package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev tool: scale-up probe for the dedup path — replicates the documents
  * table `mult`× (shifted ids, salted text so replicas aren't exact dups)
  * and times minhash/jaccard, verifying the quadratic guards hold when
  * the corpus grows 10×. Usage:
  *   sbt "runMain graft.ScaleProbe [mult]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val docs = (0 until mult).map { i =>
      base.select((col("doc_id") + lit(i * n)).as("doc_id"),
        // salt replica text so cross-replica pairs aren't all near-dups
        concat(col("text"), lit(s" replica_marker_$i")).as("text"))
    }.reduce(_ unionByName _).repartition(32).cache()
    println(s"docs: ${docs.count()}")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    time("warm minhash")(Dedup.minhashCandidates(
      base.limit(500).cache(), "doc_id", "text").count())
    time(s"minhash x$mult")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time(s"jaccard x$mult")(Dedup.jaccardPairs(docs, "doc_id", "text").count())
    time(s"simhash x$mult")(Dedup.simhash16(docs, "doc_id", "text").count())

    val embBase = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val en = embBase.count()
    val emb = (0 until mult).map { i =>
      embBase.select((col("vec_id") + lit(i * en)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _).repartition(32).cache()
    println(s"vectors: ${emb.count()}")
    time(s"emb near-dup x$mult")(Dedup.embeddingNearDups(
      emb, "vec_id", "embedding", "label", 0.4).count())
    val q = graft.ops.Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
    time(s"brute topk x$mult")(
      graft.ops.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10).count())
    time(s"ivf topk x$mult")(graft.ops.Similarity.ivfTopK(
      emb, "vec_id", "embedding", "label", q, 10, 3).count())
    spark.stop()
  }
}
