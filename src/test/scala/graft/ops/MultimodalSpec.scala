package graft.ops

import java.awt.image.BufferedImage

import graft.SparkSpec
import org.apache.spark.sql.Row

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map(b => f"$b%02x").mkString

  test("extractMeta decodes a real PNG: dimensions, format, pixel bytes") {
    val id = 42L
    val w = Multimodal.fixtureWidth(id)
    val h = Multimodal.fixtureHeight(id)
    val g = Multimodal.fixtureGray(id)
    val png = Multimodal.encodePng(Multimodal.solidGray(w, h, g))
    // sanity: these are real PNG bytes (magic header), not a fake
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))

    val df = Seq((id, png)).toDF("id", "payload")
    val m = Multimodal.extractMeta(df, "payload").select("meta.*").collect()(0)
    assert(m.getAs[Long]("n_bytes") == png.length.toLong)
    assert(m.getAs[Long]("width") == w.toLong)
    assert(m.getAs[Long]("height") == h.toLong)
    assert(m.getAs[String]("format") == "png")
    assert(m.getAs[String]("pixel_md5") ==
      md5hex(Array.fill[Byte](w * h)(g.toByte)))
  }

  test("extractMeta: RGB PNG roundtrips with 3-band interleaved pixel md5") {
    val img = new BufferedImage(2, 1, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x102030) // (r,g,b) = (16,32,48)
    img.setRGB(1, 0, 0x405060) // (r,g,b) = (64,80,96)
    val png = Multimodal.encodePng(img)
    val df = Seq((1L, png)).toDF("id", "payload")
    val m = Multimodal.extractMeta(df, "payload").select("meta.*").collect()(0)
    assert(m.getAs[Long]("width") == 2L && m.getAs[Long]("height") == 1L)
    assert(m.getAs[String]("pixel_md5") ==
      md5hex(Array[Byte](16, 32, 48, 64, 80, 96)))
  }

  test("extractMeta decodes JPEG too (format detection beyond PNG)") {
    val img = Multimodal.solidGray(12, 9, 80)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    val df = Seq((1L, jpeg)).toDF("id", "payload")
    val m = Multimodal.extractMeta(df, "payload").select("meta.*").collect()(0)
    assert(m.getAs[String]("format") == "jpeg")
    assert(m.getAs[Long]("width") == 12L && m.getAs[Long]("height") == 9L)
    // lossy codec: dimensions/format exact, pixels only near the fill value
    val resized = Multimodal.resize(df, "payload", 4, 3).collect()(0)
    val rm = resized.getAs[Row]("resized_meta")
    assert(rm.getAs[Long]("width") == 4L && rm.getAs[Long]("height") == 3L)
    assert(rm.getAs[String]("format") == "png") // re-encode normalizes to PNG
  }

  test("extractMeta: undecodable payload yields null meta, not a crash") {
    val df = Seq((1L, "not an image at all".getBytes("UTF-8")),
        (2L, Array.empty[Byte]))
      .toDF("id", "payload")
    val rows = Multimodal.extractMeta(df, "payload")
      .select($"id", $"meta").orderBy("id").collect()
    assert(rows.forall(_.isNullAt(1)))
  }

  test("ingestBinaryFiles: glob prunes at listing, payload bytes survive, meta chains") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binf")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("nested"))
    val ids = Seq(1L, 2L, 3L)
    val pngs = ids.map { id =>
      val png = Multimodal.encodePng(Multimodal.solidGray(
        Multimodal.fixtureWidth(id), Multimodal.fixtureHeight(id),
        Multimodal.fixtureGray(id)))
      val target = if (id == 3L) sub else dir
      java.nio.file.Files.write(target.resolve(s"img_$id.png"), png)
      id -> png
    }.toMap
    // a decoy the glob must prune at listing time
    java.nio.file.Files.write(dir.resolve("notes.txt"), "not an image".getBytes)

    val got = Multimodal.ingestBinaryFiles(spark, dir.toString, "*.png")
    assert(got.columns.toSeq == Seq("uri", "length", "mod_time", "payload"))
    val rows = got.orderBy("uri").collect()
    assert(rows.length == 3, "glob must exclude notes.txt; recursion must find nested/")
    rows.foreach { r =>
      val id = r.getString(0).replaceAll(".*img_|\\.png", "").toLong
      assert(r.getAs[Array[Byte]]("payload").toSeq == pngs(id).toSeq)
      assert(r.getLong(1) == pngs(id).length.toLong)
    }
    // the decode stage chains directly on the ingested payload
    val meta = Multimodal.extractMeta(got, "payload")
      .select("meta.width", "meta.format").collect()
    assert(meta.forall(_.getString(1) == "png"))
  }

  test("resize: real decode→rescale→re-encode→re-decode roundtrip") {
    val png = Multimodal.encodePng(Multimodal.solidGray(9, 7, 77))
    val df = Seq((1L, png)).toDF("id", "payload")
    val out = Multimodal.resize(df, "payload", 4, 4).collect()(0)
    val resized = out.getAs[Array[Byte]]("resized")
    // output is itself a real PNG
    assert(resized.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val m = out.getAs[Row]("resized_meta")
    assert(m.getAs[Long]("width") == 4L && m.getAs[Long]("height") == 4L)
    assert(m.getAs[String]("format") == "png")
    // bilinear over a constant image is the constant
    assert(m.getAs[String]("pixel_md5") == md5hex(Array.fill[Byte](16)(77)))
  }

  test("resize: undecodable input yields null resized/meta") {
    val df = Seq((1L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val out = Multimodal.resize(df, "payload", 4, 4).collect()(0)
    assert(out.isNullAt(out.fieldIndex("resized")))
    assert(out.isNullAt(out.fieldIndex("resized_meta")))
  }

  test("imageFixture payloads decode to the oracle-contract values") {
    val df = Seq(0L, 1L, 12L, 13L, 64L, 1000L).toDF("doc_id")
    val rows = Multimodal.extractMeta(
        Multimodal.imageFixture(df, "doc_id"), "payload")
      .select($"doc_id", $"meta.width", $"meta.height", $"meta.format",
        $"meta.pixel_md5")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h, g) = (Multimodal.fixtureWidth(id), Multimodal.fixtureHeight(id),
        Multimodal.fixtureGray(id))
      assert(r.getLong(1) == w.toLong && r.getLong(2) == h.toLong)
      assert(r.getString(3) == "png")
      assert(r.getString(4) == md5hex(Array.fill[Byte](w * h)(g.toByte)))
    }
  }

  test("sampleImageFrames: real animated-GIF decode, stride sampling, " +
    "palette-proof rgb hash") {
    val id = 6L // 2 + 6%4 = 4 frames
    val gif = Multimodal.encodeGif((0 until Multimodal.gifFrameCount(id)).map(i =>
      Multimodal.solidGray(Multimodal.GifFrameW, Multimodal.GifFrameH,
        Multimodal.gifFrameGray(id, i))))
    assert(new String(gif.take(3), "US-ASCII") == "GIF") // real container
    val df = Seq((id, gif), (7L, "junk".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val rows = Multimodal.sampleImageFrames(df, "doc_id", "payload", stride = 2)
      .orderBy("frame_no").collect()
    // 4 frames, stride 2 -> frames 0 and 2; junk payload emits nothing
    assert(rows.map(_.getAs[Long]("frame_no")).toSeq == Seq(0L, 2L))
    rows.foreach { r =>
      assert(r.getAs[Long]("width") == 8L && r.getAs[Long]("height") == 6L)
      val g = Multimodal.gifFrameGray(id, r.getAs[Long]("frame_no").toInt)
      assert(r.getAs[String]("rgb_md5") ==
        md5hex(Array.fill[Byte](8 * 6 * 3)(g.toByte)))
    }
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

  test("repartitionByBytes bounds per-partition payload bytes on a " +
    "skewed fixture (budget + one payload, rows preserved)") {
    import org.apache.spark.sql.functions._
    // 120 payloads: every 10th is 20 KB, the rest 200 B — and the range
    // partition on id clumps all the heavy ids into the low partitions,
    // the exact straggler layout row-count partitioning produces.
    val rows = (0 until 120).map { i =>
      val heavy = i < 12 // heavy ids clumped at the front
      (i.toLong, Array.fill[Byte](if (heavy) 20000 else 200)(i.toByte))
    }
    val skewed = rows.toDF("id", "payload").repartitionByRange(4, $"id")
    val before = skewed
      .select(spark_partition_id().as("p"), length($"payload").as("l"))
      .groupBy("p").agg(sum("l").as("bytes")).collect()
      .map(_.getAs[Long]("bytes"))
    assert(before.max > 100000, "fixture must start skewed") // ~240 KB in p0

    val budget = 32768L
    val out = Multimodal.extractMeta( // codec stage runs over the new layout
      graft.ops.Layout.repartitionByBytes(skewed, "payload", budget,
        minPartitions = 1),
      "payload")
    val perPart = out
      .select(spark_partition_id().as("p"), length($"payload").as("l"))
      .groupBy("p").agg(sum("l").as("bytes")).collect()
      .map(_.getAs[Long]("bytes"))
    // exact bound: a bin closes once its running bytes pass the budget,
    // so it can exceed it by at most one payload (here max 20 KB)
    assert(perPart.max <= budget + 20000,
      s"per-partition bytes ${perPart.toSeq} exceed budget+maxPayload")
    assert(perPart.length > 1, "the skewed load must actually split")
    // rows survive the identity-partitioner hop intact
    assert(out.select("id").as[Long].collect().sorted.toSeq ==
      (0L until 120L))
  }

  test("repartitionByBytes never shrinks parallelism below minPartitions") {
    import org.apache.spark.sql.functions._
    val tiny = (0 until 64).map(i => (i.toLong, Array.fill[Byte](100)(1)))
      .toDF("id", "payload")
    // budget (64 MB) dwarfs the 6.4 KB total: the effective budget
    // tightens to total/minPartitions instead of coalescing to 1 task
    val out = graft.ops.Layout.repartitionByBytes(
      tiny, "payload", targetBytes = 64L << 20, minPartitions = 4)
    assert(out.rdd.getNumPartitions == 4)
    val perPart = out
      .select(spark_partition_id().as("p"), length($"payload").as("l"))
      .groupBy("p").agg(sum("l").as("bytes")).collect()
      .map(_.getAs[Long]("bytes"))
    // even spread: total/4 = 1600 B, +one payload slack
    assert(perPart.forall(b => b <= 1700),
      s"uneven byte spread: ${perPart.toSeq}")
  }

  test("dHash64: lossless re-encode preserves the signature exactly, a " +
      "2x bilinear rescale stays within a few bits (the near-dup " +
      "robustness claim), and even/odd fixture partners are planted " +
      "near-dups; solid images hash to 0") {
    val img = Multimodal.gradientImage(42L)
    val h = Multimodal.dHash64(img)
    // PNG is lossless: encode -> decode -> identical signature
    val re = Multimodal.decodeImage(Multimodal.encodePng(img)).get._2
    assert(Multimodal.dHash64(re) == h, "re-encoded image must hash equal")
    // a REAL bilinear 2x upscale + re-encode: orderings of cell means
    // survive smooth rescaling - the property that makes dHash a
    // near-dup signature rather than an exact fingerprint
    val up = Multimodal.decodeImage(Multimodal.encodePng(
      Multimodal.scaleImage(img, 36, 32))).get._2
    val hu = Multimodal.dHash64(up)
    // the gradient fixture has mod-64 WRAP boundaries (adjacent cells
    // jumping 59 -> 0), where bilinear smoothing legitimately flips the
    // comparison; measured drift is 6 bits - still well inside the
    // 64-bit space and exactly the "near, not equal" regime dHash is
    // for. A smooth (wrap-free) image must not drift at all (below).
    assert(java.lang.Long.bitCount(h ^ hu) <= 8,
      s"2x-rescaled image drifted ${java.lang.Long.bitCount(h ^ hu)} bits")
    // smooth monotone gradient: rescaling preserves every cell-mean
    // ordering - zero drift
    val smooth = new BufferedImage(18, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 18)
      smooth.getRaster.setSample(x, y, 0, 40 + 4 * (x / 2) + 3 * (y / 2))
    val hs = Multimodal.dHash64(smooth)
    val hsUp = Multimodal.dHash64(Multimodal.decodeImage(
      Multimodal.encodePng(Multimodal.scaleImage(smooth, 36, 32))).get._2)
    assert(hs == hsUp, "smooth gradient must survive a 2x rescale exactly")
    // the planted pair: odd partner differs in ONE bumped cell
    val h2 = Multimodal.dHash64(Multimodal.gradientImage(43L))
    assert(java.lang.Long.bitCount(h ^ h2) <= 2,
      s"planted near-dup pair too far: ${java.lang.Long.bitCount(h ^ h2)}")
    // different gids are far apart (mod-64 wrap pattern shifts)
    val h3 = Multimodal.dHash64(Multimodal.gradientImage(40L))
    assert(h3 != h)
    // no gradient, no bits
    assert(Multimodal.dHash64(Multimodal.solidGray(7, 5, 50)) == 0L)
  }

  test("perceptualHash pipeline: simhashPairs blocking over dHash64 " +
      "signatures recovers every planted even/odd pair (complete " +
      "recall of the pigeonhole equi-join at 64 bits)") {
    import org.apache.spark.sql.functions.col
    val ids = (0L until 40L).toDF("doc_id")
    val sig = Multimodal.perceptualHash(
        Multimodal.gradientFixture(ids, "doc_id"), "payload")
      .select(col("doc_id"), col("phash").as("simhash"))
    val pairs = Dedup.simhashPairs(sig, "doc_id", maxHamming = 3, bits = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    (0L until 40L by 2).foreach { e =>
      assert(pairs.contains((e, e + 1)),
        s"planted pair ($e, ${e + 1}) missed by the blocking join")
    }
  }

  test("WAV codec roundtrip: encode -> AudioSystem decode recovers every " +
      "sample exactly; corrupt payloads decode to None") {
    val samples = Array.tabulate(500)(i => Multimodal.fixtureSample(7L, i))
    val wav = Multimodal.encodeWavPcm16(samples, Multimodal.FixtureRate)
    // real RIFF container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val Some((rate, decoded)) = Multimodal.decodeWavPcm16(wav)
    assert(rate == 8000f)
    assert(decoded.toSeq == samples.toSeq, "PCM roundtrip must be lossless")
    assert(Multimodal.decodeWavPcm16("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeWavPcm16(Array.emptyByteArray).isEmpty)
    // truncated header
    assert(Multimodal.decodeWavPcm16(wav.take(10)).isEmpty)
  }

  test("audioMeta/audioFrameEnergy: stats match a direct fold over the " +
      "fixture function; undecodable rows yield null meta / no frames") {
    import org.apache.spark.sql.functions.col
    val df = Seq(3L, 4L).toDF("doc_id")
    val meta = Multimodal.audioMeta(
        Multimodal.wavFixture(df, "doc_id"), "payload")
      .select(col("doc_id"), col("audio.n_samples"), col("audio.sum_samples"),
        col("audio.sum_squares"), col("audio.zero_crossings"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    Seq(3L, 4L).foreach { id =>
      val s = Array.tabulate(Multimodal.fixtureSampleCount(id))(i =>
        Multimodal.fixtureSample(id, i))
      val zc = (1 until s.length).count(i => (s(i - 1) >= 0) != (s(i) >= 0))
      assert(meta(id) == ((s.length.toLong,
        s.map(_.toLong).sum, s.map(v => v.toLong * v).sum, zc.toLong)),
        s"id $id")
    }
    val frames = Multimodal.audioFrameEnergy(
        Multimodal.wavFixture(df, "doc_id"), "doc_id", "payload")
      .collect()
    // id 3: gid 1 -> 440 samples -> frames (160,160,120)
    val f3 = frames.filter(_.getLong(0) == 3L).map(_.getLong(2)).toSeq
    assert(f3 == Seq(160L, 160L, 120L), s"frame sizes: $f3")
    // corrupt payload: null meta, zero frames
    val bad = Seq((9L, "junk".getBytes)).toDF("doc_id", "payload")
    assert(Multimodal.audioMeta(bad, "payload").collect().head.isNullAt(2))
    assert(Multimodal.audioFrameEnergy(bad, "doc_id", "payload").count() == 0)
  }

  test("audioDHash: planted even/odd fixture pairs are near-dups; the " +
      "hash is invariant to lossless re-encode and uniform gain") {
    def hashOf(samples: Array[Short]): Long = {
      import org.apache.spark.sql.functions.col
      val wav = Multimodal.encodeWavPcm16(samples, Multimodal.FixtureRate)
      Multimodal.audioDHash(
          Seq((1L, wav)).toDF("doc_id", "payload"), "payload")
        .select(col("ahash")).collect().head.getLong(0)
    }
    val even = Array.tabulate(Multimodal.fixtureSampleCount(42L))(i =>
      Multimodal.fixtureSample(42L, i))
    val odd = Array.tabulate(Multimodal.fixtureSampleCount(43L))(i =>
      Multimodal.fixtureSample(43L, i))
    val (he, ho) = (hashOf(even), hashOf(odd))
    assert(java.lang.Long.bitCount(he ^ ho) <= 2,
      s"planted audio pair too far: ${java.lang.Long.bitCount(he ^ ho)}")
    // different gid: phase-shifted signal, different hash
    val other = Array.tabulate(Multimodal.fixtureSampleCount(40L))(i =>
      Multimodal.fixtureSample(40L, i))
    assert(hashOf(other) != he)
    // uniform gain x2 preserves every energy comparison
    assert(hashOf(even.map(v => (v * 2).toShort)) == he,
      "uniform gain must not move the energy-delta hash")
    // losslessly re-encoded bytes hash identically (roundtrip spec above
    // already proves sample equality; this pins the operator end-to-end)
    assert(hashOf(even) == he)
  }

  test("frameEnergies: every decoded GIF frame's integer energy is " +
      "exactly 3 * 48 * fixture gray") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 8L).toDF("doc_id")
    val r = Multimodal.frameEnergies(
        Multimodal.gifFixture(ids, "doc_id"), "doc_id", "payload")
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (id, f) = (row.getLong(0), row.getLong(1))
      assert(row.getLong(3) == 48L)
      assert(row.getLong(2) ==
        3L * 48L * Multimodal.gifFrameGray(id, f.toInt),
        s"energy of (doc $id, frame $f)")
    }
  }

  test("sceneCuts: the fixture's mod-64 gray walk cuts exactly at the " +
      "wrap (|delta| 53) and nowhere else (|delta| 11)") {
    import spark.implicits._
    val ids = Seq(0L, 8L).toDF("doc_id")
    val r = Multimodal.sceneCuts(
        Multimodal.frameEnergies(
          Multimodal.gifFixture(ids, "doc_id"), "doc_id", "payload"),
        "doc_id", threshold = 16)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3)))).toMap
    // id 0: grays 32, 43 - no wrap, no cut, first_cut NULL
    assert(r(0L) === ((2L, 0L, -1L)))
    // id 8: grays 88 -> 35 (wrap between frames 0 and 1)
    assert(r(8L) === ((2L, 1L, 1L)))
  }

  test("silenceReport: gaps-and-islands run lengths, boundary-exclusive " +
      "threshold, and the no-silence clip reporting zeros") {
    import spark.implicits._
    // frames: (id, frame_no, n_in_frame, energy); threshold 10 =>
    // silent iff energy < 10 * n
    val frames = Seq(
      (1L, 0L, 4L, 39L), (1L, 1L, 4L, 39L), (1L, 2L, 4L, 40L), // run of 2, then loud (40 == 10*4 NOT silent)
      (1L, 3L, 4L, 0L), // second run of 1
      (2L, 0L, 4L, 999L), (2L, 1L, 4L, 999L)) // never silent
      .toDF("doc_id", "frame_no", "n_in_frame", "energy")
    val r = Multimodal.silenceReport(frames, "doc_id", threshold = 10L)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r(1L) === ((4L, 3L, 2L, 2L)))
    assert(r(2L) === ((2L, 0L, 0L, 0L)))
  }
}
