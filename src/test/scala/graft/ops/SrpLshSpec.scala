package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SrpLshSpec extends SparkSpec {

  test("srpPlane is deterministic and bounded") {
    val p = Similarity.srpPlane(0, 64)
    assert(p == Similarity.srpPlane(0, 64))
    assert(p.forall(v => v >= -0.5 && v <= 0.4375))
    assert(p != Similarity.srpPlane(1, 64))
  }

  test("srpTopK: query lands in its own bucket and ranks itself first") {
    val emb = graft.core.Tables.embeddings(spark, graft.SparkSpec.Sf0001)
    val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
    val top = Similarity.srpTopK(emb, "vec_id", "embedding", q, 5, nPlanes = 4)
      .collect()
    assert(top.nonEmpty)
    assert(top(0).getAs[Long]("vec_id") == 0L)
    assert(math.abs(top(0).getAs[Double]("cos_sim") - 1.0) < 1e-9)
  }

  test("bucket results are a subset of brute-force over the same vectors") {
    val emb = graft.core.Tables.embeddings(spark, graft.SparkSpec.Sf0001)
    val q = Similarity.vectorOf(emb, "vec_id", "embedding", 7L)
    val all = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.srpTopK(emb, "vec_id", "embedding", q, 10, nPlanes = 4)
      .collect()
    // every LSH hit carries the same exact cosine the brute force computed
    lsh.foreach(r => assert(all(r.getLong(0)) == r.getDouble(1)))
  }
}
