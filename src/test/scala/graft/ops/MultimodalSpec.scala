package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractMeta: deterministic stub metadata with real schema/batching") {
    val df = Seq((1L, "hello")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val m = Multimodal.extractMeta(df, "payload").select("meta.*").collect()(0)
    assert(m.getAs[Long]("n_bytes") == 5L)
    assert(m.getAs[Long]("width") == 32 + 5 % 224)
    assert(m.getAs[Long]("height") == 32 + (5 * 7) % 224)
    assert(m.getAs[String]("format") == "webp") // 5 % 3 == 2
    assert(m.getAs[String]("content_md5") == "5d41402abc4b2a76b9719d911017c592")
  }

  test("resize stub: target-sized payload with consistent metadata") {
    val df = Seq((1L, "some image bytes here")).toDF("id", "t")
      .select($"id", encode($"t", "UTF-8").as("payload"))
    val out = Multimodal.resize(df, "payload", 64, 64).collect()(0)
    assert(out.getAs[Array[Byte]]("resized").length == 64 * 64 / 64)
    val m = out.getAs[org.apache.spark.sql.Row]("resized_meta")
    assert(m.getAs[Long]("width") == 64L && m.getAs[Long]("height") == 64L)
    assert(m.getAs[Long]("n_bytes") == 64L)
  }

  test("resize stub: empty payload yields a zero-filled target-sized payload") {
    val df = Seq((1L, Array.empty[Byte])).toDF("id", "payload")
    val out = Multimodal.resize(df, "payload", 64, 64).collect()(0)
    val resized = out.getAs[Array[Byte]]("resized")
    assert(resized.length == 64 * 64 / 64)
    assert(resized.forall(_ == 0))
  }

  test("sampleFrames: every stride-th chunk becomes a frame row") {
    val bytes = Array.tabulate[Byte](300)(_.toByte)
    val df = Seq((1L, bytes)).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload",
      chunkBytes = 64, stride = 2).collect()
    // 300 bytes -> chunks 0..4 (last partial); strides keep 0, 2, 4
    assert(frames.map(_.getAs[Long]("frame_no")).toSeq == Seq(0L, 2L, 4L))
    assert(frames(0).getAs[Array[Byte]]("frame").length == 64)
    assert(frames(2).getAs[Array[Byte]]("frame").length == 300 - 4 * 64)
  }
}
