package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{abs, coalesce, col, count, lag, lit, max, min, row_number, sum, when}
import org.apache.spark.sql.types._

/** Multimodal-column operators (north-star extension): treat image/audio/
  * video as opaque `binary` columns with typed metadata, and run decode /
  * resize / frame-sample as batched partition-local operators.
  *
  * The image path is a REAL codec: `javax.imageio` (ships with the JDK)
  * decodes PNG/JPEG/GIF/BMP payloads, reports genuine width/height/format,
  * and re-encodes after a real `Graphics2D` rescale. Everything Spark-side
  * is shaped for scale:
  *  - schema: `binary` payload + `struct` metadata, the layout that lets
  *    the parquet scan prune payload bytes when only metadata is read;
  *  - batching: mapPartitions with micro-batches (codec buffers amortize
  *    per batch, one metadata row per image);
  *  - partitioning: payload-heavy stages repartition by byte budget, not
  *    row count — [[Layout.repartitionByBytes]] packs rows into
  *    partitions of bounded payload bytes (exact bound: budget + one
  *    payload) so per-task codec working sets are even; the mm_resize /
  *    mm_frames registry queries run the codec behind it.
  *
  * Oracle strategy (the part DuckDB cannot do): the fixture generator
  * [[imageFixture]] emits real single-color grayscale PNGs whose
  * dimensions and fill value are pure functions of the row id. PNG is
  * lossless, so after a genuine encode→decode roundtrip the decoded
  * width/height/format and the md5 of the raw pixel bytes are exactly
  * predictable in SQL (`md5(repeat(chr(gray), w*h))`) — the codec work is
  * real, the expected values are known by construction.
  *
  * Reference surface: BCCancerRegistry/DataEngineer `prostate_dag.py`
  * moves opaque heavy payloads through the same scan→per-record-op→sink
  * shape; this generalizes it to binary media columns.
  */
object Multimodal {

  ImageIO.setUseCache(false) // no temp-file disk cache on executors

  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("pixel_md5", StringType, nullable = false)))

  // ---------------------------------------------------------------- codec

  /** Real decode via javax.imageio: (lowercased format name, image), or
    * None when no installed reader recognizes the bytes.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(String, BufferedImage)] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          Some((reader.getFormatName.toLowerCase, reader.read(0)))
        } catch {
          case _: java.io.IOException => None // recognized header, corrupt body
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  private[graft] def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** md5 over raw raster samples, row-major, band-interleaved per pixel,
    * one byte per sample. Content-addresses the *pixels*, so it is
    * invariant to the encoder's byte stream (two encoders producing
    * different PNG bytes for the same image agree here) and expressible
    * in the oracle for constructed images.
    */
  private[graft] def pixelMd5(img: BufferedImage): String = {
    val raster = img.getRaster
    val w = img.getWidth
    val bands = raster.getNumBands
    val md = java.security.MessageDigest.getInstance("MD5")
    val row = new Array[Int](w * bands)
    var y = 0
    while (y < img.getHeight) {
      raster.getPixels(0, y, w, 1, row)
      var i = 0
      while (i < row.length) { md.update((row(i) & 0xff).toByte); i += 1 }
      y += 1
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Real rescale: Graphics2D bilinear draw into a fresh image of the
    * source's color class (grayscale stays 1-band, everything else lands
    * in 3-byte BGR).
    */
  private[graft] def scaleImage(src: BufferedImage, w: Int, h: Int): BufferedImage = {
    val targetType =
      if (src.getColorModel.getNumComponents == 1) BufferedImage.TYPE_BYTE_GRAY
      else BufferedImage.TYPE_3BYTE_BGR
    val dst = new BufferedImage(w, h, targetType)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    dst
  }

  private def metaRow(bytes: Array[Byte]): Row = decodeImage(bytes) match {
    case Some((fmt, img)) =>
      Row(bytes.length.toLong, img.getWidth.toLong, img.getHeight.toLong,
        fmt, pixelMd5(img))
    case None => null
  }

  // ------------------------------------------------------------- fixture

  /** Oracle contract for [[imageFixture]]: pure functions of the row id.
    * Gray values stay in 32..95 (single-byte UTF-8) so the oracle's
    * `repeat(chr(gray), …)` hashes the identical byte stream.
    */
  private[graft] def fixtureWidth(id: Long): Int = (4 + math.floorMod(id, 13L)).toInt
  private[graft] def fixtureHeight(id: Long): Int = (4 + math.floorMod(id * 7L, 17L)).toInt
  private[graft] def fixtureGray(id: Long): Int = (32 + math.floorMod(id, 64L)).toInt

  private[graft] def solidGray(w: Int, h: Int, gray: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(gray, gray, gray))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    img
  }

  /** Append a `payload` column of REAL PNG bytes (ImageIO-encoded solid
    * grayscale, dimensions/fill from [[fixtureWidth]]/[[fixtureHeight]]/
    * [[fixtureGray]] of `idCol`). Deterministic across runs and engines —
    * the fixture half of the oracle-checkable codec roundtrip.
    */
  def imageFixture(df: DataFrame, idCol: String, batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("payload", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          val png = encodePng(solidGray(fixtureWidth(id), fixtureHeight(id), fixtureGray(id)))
          Row.fromSeq(row.toSeq :+ png)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Raw-file ingestion — the front door of a 100 TB multimodal corpus:
    * Spark's `binaryFile` source reads a directory tree of media files
    * into (uri, length, mod_time, payload) rows. Scale properties come
    * from the source itself: files are PACKED into input partitions up to
    * `spark.sql.files.maxPartitionBytes` (small-file batching for free),
    * listing is distributed for large trees, and `pathGlobFilter` prunes
    * non-media files at LISTING time (never opened, never read). Chain
    * [[extractMeta]] / [[resize]] / [[Layout.repartitionByBytes]] behind
    * it for the decode → layout pipeline.
    */
  def ingestBinaryFiles(spark: org.apache.spark.sql.SparkSession,
                        dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path").as("uri"), col("length"),
        col("modificationTime").as("mod_time"), col("content").as("payload"))

  // ------------------------------------------------------------ operators

  /** Decode a binary image column into a metadata struct, micro-batched
    * per partition. Output column `meta` has [[metaSchema]]; null when no
    * installed codec recognizes the payload.
    */
  def extractMeta(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("meta", metaSchema, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          Row.fromSeq(row.toSeq :+ metaRow(row.getAs[Array[Byte]](binIdx)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Real resize: decode → Graphics2D rescale → re-encode as PNG → decode
    * AGAIN for the reported metadata, so `resized_meta` proves the full
    * encode/decode roundtrip rather than echoing the request. Output
    * columns: `resized` (binary PNG, null if input undecodable) +
    * `resized_meta` ([[metaSchema]], null likewise).
    */
  def resize(df: DataFrame, binCol: String, width: Int, height: Int,
             batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("resized", BinaryType, nullable = true))
      .add(StructField("resized_meta", metaSchema, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val bytes = row.getAs[Array[Byte]](binIdx)
          decodeImage(bytes) match {
            case Some((_, img)) =>
              val png = encodePng(scaleImage(img, width, height))
              Row.fromSeq(row.toSeq :+ png :+ metaRow(png))
            case None =>
              Row.fromSeq(row.toSeq :+ null :+ null)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** md5 over getRGB bytes (row-major, r/g/b per pixel): content-addresses
    * the COLORS, so a palette-indexed decode (GIF) and a truecolor decode
    * of the same image hash identically — the representation-proof
    * counterpart of [[pixelMd5]].
    */
  private[graft] def rgbMd5(img: BufferedImage): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        md.update(((rgb >> 16) & 0xff).toByte)
        md.update(((rgb >> 8) & 0xff).toByte)
        md.update((rgb & 0xff).toByte)
        x += 1
      }
      y += 1
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Animated-GIF fixture contract: frame dims and per-frame fill are
    * pure functions of the row id (grays stay single-byte UTF-8 for the
    * oracle's `repeat(chr(g), w*h*3)`).
    */
  val GifFrameW = 8
  val GifFrameH = 6
  private[graft] def gifFrameCount(id: Long): Int = (2 + math.floorMod(id, 4L)).toInt
  private[graft] def gifFrameGray(id: Long, frame: Int): Int =
    (32 + math.floorMod(id * 7L + frame * 11L, 64L)).toInt

  private[graft] def encodeGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Append a `payload` column of REAL animated-GIF bytes:
    * [[gifFrameCount]] solid frames of [[GifFrameW]]×[[GifFrameH]], frame
    * i filled with [[gifFrameGray]](id, i). The multi-frame counterpart
    * of [[imageFixture]].
    */
  def gifFixture(df: DataFrame, idCol: String, batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("payload", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          val frames = (0 until gifFrameCount(id)).map(i =>
            solidGray(GifFrameW, GifFrameH, gifFrameGray(id, i)))
          Row.fromSeq(row.toSeq :+ encodeGif(frames))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** REAL frame sampling: decode a multi-frame payload (animated GIF —
    * any multi-image `javax.imageio` reader works) and emit one row per
    * `stride`-th frame with the decoded dimensions and the
    * representation-proof [[rgbMd5]]. Undecodable payloads emit no rows.
    */
  def sampleImageFrames(df: DataFrame, idCol: String, binCol: String,
                        stride: Int = 2): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(Seq(
      df.schema(idIdx),
      StructField("frame_no", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("rgb_md5", StringType, nullable = false)))
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          try {
            val readers = ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Iterator.empty
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                (0 until n by stride).map { i =>
                  val img = reader.read(i)
                  Row(row.get(idIdx), i.toLong, img.getWidth.toLong,
                    img.getHeight.toLong, rgbMd5(img))
                }.iterator
              } finally reader.dispose()
            }
          } finally iis.close()
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame-sample for video-like payloads: every `stride`-th chunk of
    * `chunkBytes` bytes becomes one "frame" row. The chunker is
    * codec-agnostic byte plumbing (container demuxers slot in here); the
    * schema/explode shape is what a real frame sampler produces — for the
    * REAL image-decoder form see [[sampleImageFrames]].
    */
  // -------------------------------------------------- perceptual hashing

  /** 64-bit DIFFERENCE HASH (dHash, Krawetz's "Kind of Like That"
    * family) over a decoded image — the image analogue of MinHash: two
    * images that differ only by re-encoding, mild rescaling, or small
    * local edits land within a few bits of each other, so the
    * [[Dedup.simhashPairs]] Hamming pigeonhole machinery finds
    * near-duplicate images with an equi-join, never a cross join.
    *
    * All arithmetic is EXACT integers, so Spark, the oracle SQL and the
    * spec compute bit-identical signatures:
    *  - per-pixel luma = 299·R + 587·G + 114·B (fixed-point ITU-R 601,
    *    the /1000 deferred — comparisons are scale-invariant); getRGB
    *    makes grayscale and truecolor decodes of the same image agree;
    *  - a 9×8 grid of cells by exact integer area partition: pixel x
    *    belongs to cell ⌊x·9/w⌋ (resp. ⌊y·8/h⌋) — cell luma sums and
    *    pixel counts accumulate in Long;
    *  - bit cy·8+cx is set iff cell (cx+1, cy)'s MEAN luma is strictly
    *    greater than cell (cx, cy)'s, compared exactly by
    *    cross-multiplied sums (sumB·cntA > sumA·cntB — no double
    *    division anywhere).
    *
    * Images narrower/shorter than the grid leave some cells empty
    * (count 0 compares as mean 0); real pipelines hash after a resize
    * to at least 9×8, which [[resize]] provides.
    */
  private[graft] def dHash64(img: BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val sums = Array.ofDim[Long](gh, gw)
    val cnts = Array.ofDim[Long](gh, gw)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * gh / h).toInt
      var x = 0
      while (x < w) {
        val cx = (x.toLong * gw / w).toInt
        val rgb = img.getRGB(x, y)
        val luma = 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
          114L * (rgb & 0xff)
        sums(cy)(cx) += luma
        cnts(cy)(cx) += 1L
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw - 1) {
        if (sums(cy)(cx + 1) * cnts(cy)(cx) > sums(cy)(cx) * cnts(cy)(cx + 1))
          hash |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    hash
  }

  /** Integer luma statistics of a decoded image: Σ over pixels of the
    * fixed-point ITU-R 601 luma (299R + 587G + 114B — the [[dHash64]]
    * scale, /1000 deferred) as an exact Long `sum_luma`, plus the pixel
    * count. The brightness/exposure quality signal a multimodal
    * curation gate filters on, exact enough for a SQL oracle to restate
    * from constructed images. Null for undecodable payloads.
    */
  def imageLumaStats(df: DataFrame, binCol: String,
                     batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("sum_luma", LongType, nullable = true))
      .add(StructField("n_pixels", LongType, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          decodeImage(row.getAs[Array[Byte]](binIdx)) match {
            case Some((_, img)) =>
              // single-band grayscale: luma = raw sample × 1000 (the
              // stored value — getRGB would route it through the gray →
              // sRGB color-space curve, which is monotone (dHash-safe)
              // but not identity, and the gate compares absolute sums)
              val gray = img.getColorModel.getNumComponents == 1
              var sum = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  sum +=
                    (if (gray) 1000L * img.getRaster.getSample(x, y, 0)
                     else {
                       val rgb = img.getRGB(x, y)
                       299L * ((rgb >> 16) & 0xff) +
                         587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                     })
                  x += 1
                }
                y += 1
              }
              Row.fromSeq(row.toSeq :+ sum :+
                (img.getWidth.toLong * img.getHeight))
            case None => Row.fromSeq(row.toSeq :+ null :+ null)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Decode a binary image column and append its [[dHash64]] as a
    * `phash` LongType column (null when no codec recognizes the
    * payload) — micro-batched mapPartitions like [[extractMeta]].
    * Near-dup pipeline: `perceptualHash` → rename to `simhash` →
    * [[Dedup.simhashPairs]](bits = 64).
    */
  def perceptualHash(df: DataFrame, binCol: String,
                     batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("phash", LongType, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val h = decodeImage(row.getAs[Array[Byte]](binIdx)) match {
            case Some((_, img)) => java.lang.Long.valueOf(dHash64(img))
            case None           => null
          }
          Row.fromSeq(row.toSeq :+ h)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Structured-gradient fixture for the perceptual-hash oracle: each id
    * becomes a REAL 18×16 grayscale PNG of 2×2 constant cells whose
    * gray values are a pure function of the id — and consecutive id
    * PAIRS (gid = id/2) share the same pattern up to one bumped cell,
    * planting near-duplicates the mm_neardup query must find. Cell
    * (cx, cy) of image id has gray
    * `32 + (gid·7 + cx·5 + cy·3 + (id%2)·bump(cx,cy)) % 64` with
    * bump = 9 at (4, 3) and 0 elsewhere, so an odd image differs from
    * its even partner in exactly one cell (≤ 2 dHash bits) while
    * different gids shift the whole mod-64 pattern. 18×16 makes each
    * dHash grid cell exactly one 2×2 fixture cell — the oracle
    * restates the hash directly over the cell function with no
    * area-averaging to express in SQL.
    */
  def gradientFixture(df: DataFrame, idCol: String,
                      batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("payload", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          Row.fromSeq(row.toSeq :+ encodePng(gradientImage(id)))
        }
      }
    }(Encoders.row(outSchema))
  }

  private[graft] def gradientCellGray(id: Long, cx: Int, cy: Int): Int = {
    val gid = Math.floorDiv(id, 2L)
    val odd = Math.floorMod(id, 2L)
    val bump = if (cx == 4 && cy == 3) 9L else 0L
    (32L + Math.floorMod(gid * 7L + cx * 5L + cy * 3L + odd * bump, 64L)).toInt
  }

  private[graft] def gradientImage(id: Long): BufferedImage = {
    val img = new BufferedImage(18, 16, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 18) {
        raster.setSample(x, y, 0, gradientCellGray(id, x / 2, y / 2))
        x += 1
      }
      y += 1
    }
    img
  }

  // ------------------------------------------------------------- audio

  /** Real WAV encode via `javax.sound.sampled` (ships with the JDK, like
    * ImageIO): PCM16 signed little-endian mono samples → a genuine RIFF
    * container written by `AudioSystem.write`.
    */
  private[graft] def encodeWavPcm16(samples: Array[Short],
                                    rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(bytes), fmt,
      samples.length)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode: `AudioSystem` parses the RIFF header and streams
    * the PCM frames; None for unrecognized/corrupt payloads or formats
    * outside 16-bit mono PCM (the only shape the fixtures emit — a real
    * pipeline would transcode first).
    */
  private[graft] def decodeWavPcm16(bytes: Array[Byte]): Option[(Float, Array[Short])] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      import javax.sound.sampled._
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (fmt.isBigEndian)
                (((data(2 * i) & 0xff) << 8) | (data(2 * i + 1) & 0xff)).toShort
              else
                (((data(2 * i + 1) & 0xff) << 8) | (data(2 * i) & 0xff)).toShort
            i += 1
          }
          Some((fmt.getSampleRate, out))
        }
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Audio fixture contract — sample values and counts are pure integer
    * functions of the row id, so every decoded statistic is predictable
    * in SQL while the RIFF encode/decode is a real codec roundtrip.
    * Like [[gradientCellGray]], consecutive id PAIRS (gid = id/2) share
    * the signal up to one bumped FRAME, planting audio near-duplicates:
    * n = 400 + (gid % 5)·40 samples at 8 kHz,
    * sample(id, i) = (gid·31 + i·17) % 2001 − 1000
    *                 + (id % 2)·25·[i/8 = 7]  (fits int16),
    * so an odd signal differs from its even partner only inside frame 7
    * (≤ 2 energy-delta hash bits) while different gids shift the whole
    * mod-2001 phase.
    */
  private[graft] def fixtureSampleCount(id: Long): Int =
    (400 + Math.floorMod(Math.floorDiv(id, 2L), 5L) * 40).toInt
  private[graft] def fixtureSample(id: Long, i: Int): Short = {
    val gid = Math.floorDiv(id, 2L)
    val bump = if (i / 8 == 7) Math.floorMod(id, 2L) * 25L else 0L
    (Math.floorMod(gid * 31L + i * 17L, 2001L) - 1000L + bump).toShort
  }
  private[graft] val FixtureRate = 8000f

  /** Append a `payload` column of REAL WAV bytes (AudioSystem-encoded
    * PCM16 mono from the [[fixtureSample]] function of `idCol`).
    */
  def wavFixture(df: DataFrame, idCol: String, batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("payload", BinaryType, nullable = false))
    val idIdx = inSchema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val id = row.getLong(idIdx)
          val samples = Array.tabulate(fixtureSampleCount(id))(i =>
            fixtureSample(id, i))
          Row.fromSeq(row.toSeq :+ encodeWavPcm16(samples, FixtureRate))
        }
      }
    }(Encoders.row(outSchema))
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", LongType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_samples", LongType, nullable = false),
    StructField("sum_squares", LongType, nullable = false),
    StructField("zero_crossings", LongType, nullable = false)))

  /** Decode a binary audio column into integer-exact signal statistics:
    * sample count, Σs and Σs² (the content fingerprint — exact BIGINTs a
    * SQL oracle can predict for constructed signals, where an md5 of raw
    * PCM bytes could not be restated portably), and the zero-crossing
    * count (sign(s) with s ≥ 0 as non-negative; a crossing is any
    * adjacent sign change — the classic voiced/unvoiced signal feature).
    * Null struct when no codec recognizes the payload.
    */
  def audioMeta(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("audio", audioMetaSchema, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val meta = decodeWavPcm16(row.getAs[Array[Byte]](binIdx)) match {
            case Some((rate, s)) =>
              var sum = 0L; var sq = 0L; var zc = 0L
              var i = 0
              while (i < s.length) {
                sum += s(i); sq += s(i).toLong * s(i)
                if (i > 0 && ((s(i - 1) >= 0) != (s(i) >= 0))) zc += 1
                i += 1
              }
              Row(rate.toLong, s.length.toLong, sum, sq, zc)
            case None => null
          }
          Row.fromSeq(row.toSeq :+ meta)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Real audio RESAMPLE — the audio analogue of [[resize]]: decode,
    * linear-interpolate to the target rate, re-encode as a genuine WAV,
    * and decode AGAIN for the reported stats (the roundtrip proves the
    * codec, not the request). Interpolation is EXACT integer rational
    * arithmetic, floor-rounded, so an oracle restates every output
    * sample: output i sits at source position i·src/dst = lo + r/dst
    * (lo = (i·src) div dst, r = (i·src) mod dst), and
    * out(i) = (s(lo)·(dst−r) + s(lo+1)·r) / dst TRUNCATED toward zero
    * (the div both engines share: Long `/` here, `//` on positive-and-
    * negative BIGINTs in DuckDB), with the last source sample clamped
    * (s(n) ≡ s(n−1)). Output length
    * n_out = ⌈n·dst/src⌉ covers the same duration. Output columns:
    * `resampled` (binary WAV, null if undecodable) + `resampled_meta`
    * ([[audioMetaSchema]], decoded from the re-encoded bytes).
    */
  def audioResample(df: DataFrame, binCol: String, dstRate: Int,
                    batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add(StructField("resampled", BinaryType, nullable = true))
      .add(StructField("resampled_meta", audioMetaSchema, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          decodeWavPcm16(row.getAs[Array[Byte]](binIdx)) match {
            case Some((srcRateF, s)) if s.nonEmpty =>
              val src = srcRateF.toLong
              val dst = dstRate.toLong
              val nOut = ((s.length * dst + src - 1) / src).toInt
              val out = new Array[Short](nOut)
              var i = 0
              while (i < nOut) {
                val num = i.toLong * src
                val lo = (num / dst).toInt
                val r = num % dst
                val a = s(math.min(lo, s.length - 1)).toLong
                val b = s(math.min(lo + 1, s.length - 1)).toLong
                out(i) = ((a * (dst - r) + b * r) / dst).toShort
                i += 1
              }
              val wav = encodeWavPcm16(out, dstRate.toFloat)
              val meta = decodeWavPcm16(wav) match {
                case Some((rate, d)) =>
                  var sum = 0L; var sq = 0L; var zc = 0L
                  var j = 0
                  while (j < d.length) {
                    sum += d(j); sq += d(j).toLong * d(j)
                    if (j > 0 && ((d(j - 1) >= 0) != (d(j) >= 0))) zc += 1
                    j += 1
                  }
                  Row(rate.toLong, d.length.toLong, sum, sq, zc)
                case None => null
              }
              Row.fromSeq(row.toSeq :+ wav :+ meta)
            case _ => Row.fromSeq(row.toSeq :+ null :+ null)
          }
        }
      }
    }(Encoders.row(outSchema))
  }

  /** 64-bit ENERGY-DELTA hash — dHash for audio: decode, compute
    * `frameSize`-sample frame energies (exact Σs² in Long), set bit f
    * iff energy(f+1) > energy(f), for f < min(63, frames−1). Robust the
    * way dHash is: re-encoding is lossless (PCM), small localized edits
    * flip only their frames' delta bits, and gain changes that scale
    * all samples equally preserve every comparison. Near-dup pipeline:
    * rename to `simhash` → [[Dedup.simhashPairs]](bits = 64) — the
    * SAME Hamming pigeonhole blocking as text SimHash and image dHash,
    * completing near-dup across all three modalities. Null when the
    * payload doesn't decode.
    */
  def audioDHash(df: DataFrame, binCol: String, frameSize: Int = 8,
                 batchSize: Int = 32): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(StructField("ahash", LongType, nullable = true))
    val binIdx = inSchema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          val h = decodeWavPcm16(row.getAs[Array[Byte]](binIdx)) match {
            case Some((_, s)) =>
              val energies = s.grouped(frameSize).map { fr =>
                var sq = 0L; fr.foreach(v => sq += v.toLong * v); sq
              }.toArray
              var hash = 0L
              var f = 0
              while (f < 64 && f + 1 < energies.length) {
                if (energies(f + 1) > energies(f)) hash |= 1L << f
                f += 1
              }
              java.lang.Long.valueOf(hash)
            case None => null
          }
          Row.fromSeq(row.toSeq :+ h)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame-level energy: decode, split the signal into fixed
    * `frameSize`-sample frames (last frame ragged), emit one row per
    * frame with its exact Σs² — the feature-extraction shape every
    * audio pipeline's VAD/quality gate starts from. Undecodable
    * payloads contribute no rows.
    */
  def audioFrameEnergy(df: DataFrame, idCol: String, binCol: String,
                       frameSize: Int = 160): DataFrame = {
    val inSchema = df.schema
    val idIdx = inSchema.fieldIndex(idCol)
    val binIdx = inSchema.fieldIndex(binCol)
    val outSchema = StructType(Seq(
      inSchema(idIdx),
      StructField("frame_no", LongType, nullable = false),
      StructField("n_in_frame", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    df.mapPartitions { it =>
      it.flatMap { row =>
        decodeWavPcm16(row.getAs[Array[Byte]](binIdx)) match {
          case Some((_, s)) =>
            s.grouped(frameSize).zipWithIndex.map { case (frame, f) =>
              var sq = 0L
              frame.foreach(v => sq += v.toLong * v)
              Row(row.get(idIdx), f.toLong, frame.length.toLong, sq)
            }
          case None => Iterator.empty
        }
      }
    }(Encoders.row(outSchema))
  }

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

  /** Per-frame integer RGB ENERGY of a multi-frame payload: decode
    * every frame (same `javax.imageio` walk as [[sampleImageFrames]])
    * and emit (id, frame_no, energy, n_pixels) where energy is the
    * exact Long Σ(R+G+B) over the frame's pixels — the
    * representation-proof scalar per frame that [[sceneCuts]] and the
    * audio-style delta analyses consume. Undecodable payloads emit no
    * rows.
    */
  def frameEnergies(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = StructType(Seq(
      df.schema(idIdx),
      StructField("frame_no", LongType, nullable = false),
      StructField("energy", LongType, nullable = false),
      StructField("n_pixels", LongType, nullable = false)))
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
          try {
            val readers = ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Iterator.empty
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val n = reader.getNumImages(true)
                (0 until n).map { i =>
                  val img = reader.read(i)
                  var e = 0L
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      val rgb = img.getRGB(x, y)
                      e += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) +
                        (rgb & 0xFF)
                      x += 1
                    }
                    y += 1
                  }
                  Row(row.get(idIdx), i.toLong, e,
                    img.getWidth.toLong * img.getHeight)
                }.iterator
              } finally reader.dispose()
            }
          } finally iis.close()
        }
      }
    }(Encoders.row(outSchema))
  }

  /** SILENCE/low-energy span report over [[audioFrameEnergy]] rows —
    * the audio structure pass a speech pipeline runs before chunking
    * (cut at silences, not mid-word): a frame is silent when its MEAN
    * per-sample energy is under `threshold`, compared exactly as
    * energy < threshold·n_in_frame (cross-multiplied integers), and
    * consecutive silent frames collapse into spans via the
    * gaps-and-islands trick (frame_no − row_number within the silent
    * subset is constant per run — pure integer arithmetic). Per clip:
    * frames, silent frames, span count, longest span (0 when none).
    * One per-id window + two keyed aggregates; nothing quadratic.
    */
  def silenceReport(frames: DataFrame, idCol: String,
                    threshold: Long): DataFrame = {
    require(threshold >= 1, "threshold = mean per-sample energy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame_no"))
    val sil = frames
      .withColumn("__s", col("energy") < lit(threshold) * col("n_in_frame"))
    val spans = sil.filter(col("__s"))
      .withColumn("__grp", col("frame_no") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"), max(col("__len")).as("longest"))
    sil.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("n_silent"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol), col("n_frames"), col("n_silent"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("longest"), lit(0L)).as("longest_span"))
      .orderBy(col(idCol))
  }

  /** SCENE-CUT detection over [[frameEnergies]] rows: a cut is a frame
    * whose energy jumps from its predecessor by at least `threshold`
    * gray levels PER PIXEL on average — compared exactly as
    * |ΔE| ≥ threshold·3·n_pixels (cross-multiplied integers, no
    * division; 3 channels). Per video: frame count, cut count, first
    * cut frame (NULL when none) — the shot-boundary structure a video
    * training-data pipeline samples frames around, as opposed to
    * [[sampleImageFrames]]'s blind stride. One per-id window lag (ids
    * already co-locate after the decode exchange) + one keyed
    * aggregate; nothing frame-count-quadratic.
    */
  def sceneCuts(frames: DataFrame, idCol: String,
                threshold: Int = 16): DataFrame = {
    require(threshold >= 1, "threshold in gray levels per pixel")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("frame_no"))
    val isCut = col("__de") >= lit(threshold.toLong) * 3L * col("n_pixels")
    frames
      .withColumn("__de", abs(col("energy") - lag(col("energy"), 1).over(w)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(isCut, 1L).otherwise(0L)).as("n_cuts"),
        min(when(isCut, col("frame_no"))).as("first_cut"))
      .orderBy(col(idCol))
  }
}
