package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): treat image/audio/
  * video as opaque `binary` columns with typed metadata, and run decode /
  * feature-extract / resize / frame-sample as batched partition-local
  * operators.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment — the decode below is a clearly-marked deterministic fake),
  * but everything Spark-side is real and load-bearing at scale:
  *  - schema: `binary` payload + `struct` metadata, the layout that lets
  *    the parquet scan prune payload bytes when only metadata is read;
  *  - batching: mapPartitions with micro-batches, the same shape as the
  *    Inference operator (real decoders amortize codec init per batch);
  *  - partitioning: payload-heavy stages repartition by byte budget, not
  *    row count (callers size partitions so batch_bytes fits the codec's
  *    working set).
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("content_md5", StringType, nullable = false)))

  /** STUB decode: deterministic metadata from the raw bytes. A real
    * implementation calls the image codec here (per-batch, partition-local)
    * — the function signature, batching, and output schema are the real
    * contract; only the body is fake.
    */
  private[graft] def decodeStub(bytes: Array[Byte]): Row = {
    val n = bytes.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    Row(n, 32L + n % 224L, 32L + (n * 7L) % 224L, fmt, hex)
  }

  /** Decode a binary column into a metadata struct, micro-batched per
    * partition. Output column `meta` has [[metaSchema]].
    */
  def extractMeta(df: DataFrame, binCol: String, batchSize: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("meta", metaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // real codecs initialize here, once per partition
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          Row.fromSeq(row.toSeq :+ decodeStub(row.getAs[Array[Byte]](binIdx)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** STUB resize for image-like payloads: emits a payload whose size
    * matches the target dimensions (a real codec decodes, scales, and
    * re-encodes here — batched, partition-local, same column contract).
    * Output columns: `resized` (binary) + `resized_meta` ([[metaSchema]]).
    */
  def resize(df: DataFrame, binCol: String, width: Int, height: Int,
             batchSize: Int = 16): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("resized", BinaryType, nullable = false))
      .add(StructField("resized_meta", metaSchema, nullable = false))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // real codecs initialize here, once per partition
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          // empty payload -> zero-filled output (bytes(i % len) would
          // index into the empty array)
          val resized =
            if (bytes == null || bytes.isEmpty) new Array[Byte](width * height / 64)
            else Array.tabulate[Byte](width * height / 64)(i => bytes(i % bytes.length))
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(resized).map(b => f"$b%02x").mkString
          Row.fromSeq(row.toSeq :+ resized :+
            Row(resized.length.toLong, width.toLong, height.toLong, "raw", hex))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** STUB frame-sample for video-like payloads: every `stride`-th chunk of
    * `chunkBytes` bytes becomes one "frame" row (schema/explode shape is
    * what a real frame sampler produces).
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
                   chunkBytes: Int = 64, stride: Int = 4): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(Seq(
      df.schema(idIdx),
      StructField("frame_no", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val frames = bytes.grouped(chunkBytes).zipWithIndex
          .filter(_._2 % stride == 0)
        frames.map { case (chunk, i) =>
          Row(row.get(idIdx), i.toLong, chunk)
        }
      }
    }(Encoders.row(outSchema))
  }
}
