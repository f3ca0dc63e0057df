package graft

import org.apache.spark.sql.functions._
import graft.operators.MediaCodec

/** Real-codec multimodal kernels: the decode path must reproduce the
  * fixture formulas exactly (BMP hand-rolled bytes AND PNG through the
  * JDK encoder), the resample must be the integer nearest-neighbor
  * contract, and corrupt payloads must be dropped, not crash the
  * partition. */
class MediaCodecSpec extends SparkSpec {

  private def media = MediaCodec.fixturesDF(spark)

  test("image decode reproduces the pixel formulas for BMP and PNG alike") {
    val got = MediaCodec.imageStats(media).collect().map(s => s.doc -> s).toMap
    assert(got.keySet == Set("icon", "banner", "photo", "tall"))
    // banner (97x41, odd width → padded BMP rows): recompute expectations
    // in-test from the shared formulas
    val b = got("banner")
    assert((b.width, b.height, b.n_pixels) == (97, 41, 3977L))
    val expSumR = (for (y <- 0 until 41; x <- 0 until 97) yield MediaCodec.pixelR(x, y)).sum.toLong
    assert(b.sum_r == expSumR)
    // PNG round-trips losslessly: same formulas, compressed codec path
    val p = got("photo")
    val expSumG = (for (y <- 0 until 48; x <- 0 until 64) yield MediaCodec.pixelG(x, y)).sum.toLong
    assert(p.sum_g == expSumG)
    // identical pixels → identical CRC whether the payload was BMP or PNG
    val crcIcon = got("icon").rgb_crc32
    val viaPng = {
      val df = spark.createDataFrame(
        Seq(("icon2", "image", "png", MediaCodec.pngBytes(16, 16))))
        .toDF("doc", "modality", "codec", "payload")
      MediaCodec.imageStats(df).collect().head.rgb_crc32
    }
    assert(crcIcon == viaPng)
  }

  test("nearest-neighbor resize keeps aspect and is unscaled under the cap") {
    val got = MediaCodec.imageResize(media, maxSide = 32).collect()
      .map(r => r.doc -> r).toMap
    assert(!got("icon").scaled && got("icon").out_width == 16)
    assert(got("banner").scaled &&
      (got("banner").out_width, got("banner").out_height) == (32, 13))
    assert((got("tall").out_width, got("tall").out_height) == (5, 32))
  }

  test("corrupt image payloads are dropped, not fatal") {
    // two corruption shapes: bytes NO reader claims (null-return branch)
    // and a payload with an intact PNG signature whose body is rotted —
    // a reader CLAIMS those bytes and then THROWS mid-decode, the branch
    // decodeImage's Try exists for (a bare ImageIO.read here fails the
    // whole task, not the row)
    val claimed = MediaCodec.pngBytes(16, 16).take(24) ++ Array.fill[Byte](64)(0)
    val df = media.unionByName(
      spark.createDataFrame(Seq(
        ("junk", "image", "bmp", Array[Byte](1, 2, 3)),
        ("rotted", "image", "png", claimed)))
        .toDF("doc", "modality", "codec", "payload"))
    for (got <- Seq(
        MediaCodec.imageStats(df).collect().map(_.doc).toSet,
        MediaCodec.imageResize(df, maxSide = 8).collect().map(_.doc).toSet,
        MediaCodec.imageEmbedding(df).collect().map(_.doc).toSet))
      assert(got == Set("icon", "banner", "photo", "tall"),
        "both corruption shapes must drop the row on every decode path")
  }

  test("corrupt audio payloads are dropped, not fatal") {
    val valid = MediaCodec.wavStats(media).collect().map(_.doc).toSet
    val df = media.unionByName(
      spark.createDataFrame(Seq(("noise", "audio", "wav", Array[Byte](9, 9, 9))))
        .toDF("doc", "modality", "codec", "payload"))
    val docs = MediaCodec.wavStats(df).collect().map(_.doc).toSet
    assert(docs == valid, "the junk payload must be skipped, valid rows kept")
  }

  test("a valid WAV of an unsupported shape (8-bit PCM) is dropped, not misread") {
    // a real RIFF/WAVE container that AudioSystem parses fine, but whose
    // samples are 8-bit: the 16-bit short-reading loop would fuse byte
    // pairs into garbage stats while the bits column truthfully said 8 —
    // the format guard must drop the row instead
    val n = 64
    val buf = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    buf.put("data".getBytes("US-ASCII")).putInt(n)
    for (i <- 0 until n) buf.put((i * 3).toByte)
    val df = media.unionByName(
      spark.createDataFrame(Seq(("eightbit", "audio", "wav", buf.array())))
        .toDF("doc", "modality", "codec", "payload"))
    val docs = MediaCodec.wavStats(df).collect().map(_.doc).toSet
    assert(!docs.contains("eightbit"), "8-bit PCM must be dropped, not fused")
    assert(docs == MediaCodec.wavStats(media).collect().map(_.doc).toSet)
  }

  test("wav decode reads the real format header and exact PCM stats") {
    val got = MediaCodec.wavStats(media).collect().map(s => s.doc -> s).toMap
    val beep = got("beep")
    assert((beep.channels, beep.sample_rate_hz, beep.bits, beep.n_frames) ==
      (1, 8000, 16, 800L))
    val expSum = (0 until 800).map(i => math.abs(MediaCodec.pcmSample(i, 0))).map(_.toLong).sum
    assert(beep.sum_abs == expSum && beep.peak_abs == 10000)
    assert(got("tone").channels == 2 && got("tone").n_frames == 1600L)
  }

  test("avi decode walks the RIFF container and reproduces the frame formulas") {
    val got = MediaCodec.aviFrames(media, step = 1).collect()
      .map(s => (s.doc, s.frame_idx) -> s).toMap
    // every frame of both fixtures decoded at step=1
    assert(got.keySet == ((0 until 12).map(("clip", _)) ++ (0 until 3).map(("short", _))).toSet)
    val c7 = got(("clip", 7))
    assert((c7.width, c7.height, c7.n_frames, c7.frame_ts_ms) == (24, 16, 12, 280L))
    val expSumR = (for (y <- 0 until 16; x <- 0 until 24)
      yield MediaCodec.frameR(x, y, 7)).sum.toLong
    assert(c7.sum_r == expSumR)
    // frame 0 IS the still-image formula: its CRC equals the BMP/PNG
    // decode of the same geometry (pixel path, bottom-up flip and all)
    val img = spark.createDataFrame(Seq(("ref", "image", "bmp", MediaCodec.bmpBytes(24, 16))))
      .toDF("doc", "modality", "codec", "payload")
    assert(got(("clip", 0)).rgb_crc32 ==
      MediaCodec.imageStats(img).collect().head.rgb_crc32)
    // short runs at 10 fps → 100 ms per frame
    assert(got(("short", 2)).frame_ts_ms == 200L)
  }

  test("avi frame sampling keeps every step-th frame; corrupt payloads drop") {
    val sampled = MediaCodec.aviFrames(media, step = 5).collect()
    assert(sampled.map(s => (s.doc, s.frame_idx)).toSet ==
      Set(("clip", 0), ("clip", 5), ("clip", 10), ("short", 0)))
    val df = media.unionByName(
      spark.createDataFrame(Seq(
        ("static", "video", "avi", Array[Byte](82, 73, 70, 70)),  // truncated RIFF
        ("wrong", "video", "avi", MediaCodec.wavBytes(8000, 1, 4)))) // RIFF but WAVE
        .toDF("doc", "modality", "codec", "payload"))
    val docs = MediaCodec.aviFrames(df, step = 5).collect().map(_.doc).toSet
    assert(docs == Set("clip", "short"), "non-AVI payloads must be skipped")
  }

  test("mjpg avi decode: JPEG frames through the container walk give exact stats") {
    import java.io.ByteArrayInputStream
    import java.util.zip.CRC32
    import javax.imageio.ImageIO
    val got = MediaCodec.aviFrames(MediaCodec.mjpgFixturesDF(spark), step = 1)
      .collect().map(s => (s.doc, s.frame_idx) -> s).toMap
    // every frame of both clips decodes — no silent parsed-but-empty stream
    assert(got.keySet == ((0 until 12).map(("anim", _)) ++ (0 until 3).map(("mini", _))).toSet)
    // stats must equal an INDEPENDENT decode of the same frame's JPEG
    // bytes (no RIFF container in this loop)
    val img = ImageIO.read(new ByteArrayInputStream(MediaCodec.mjpgFrameJpeg(24, 16, 7)))
    var (sr, sg, sb) = (0L, 0L, 0L)
    val crc = new CRC32()
    for (y <- 0 until 16; x <- 0 until 24) {
      val p = img.getRGB(x, y)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      crc.update((p >> 16) & 0xFF); crc.update((p >> 8) & 0xFF); crc.update(p & 0xFF)
    }
    val a7 = got(("anim", 7))
    assert((a7.sum_r, a7.sum_g, a7.sum_b, a7.rgb_crc32) == ((sr, sg, sb, crc.getValue)))
    assert((a7.width, a7.height, a7.n_frames, a7.frame_ts_ms) == ((24, 16, 12, 280L)))
    // mini runs at 10 fps → 100 ms per frame
    assert(got(("mini", 2)).frame_ts_ms == 200L)
  }

  test("a corrupt JPEG frame drops that frame, not the job or the clip") {
    // damage ONE frame's JPEG body in place: keep the FF D8 FF signature
    // (so the JDK JPEG reader CLAIMS the bytes) and zero the rest (so
    // the decode THROWS mid-parse rather than returning null) — the
    // exact shape that must not escape the task as an exception
    val bytes = MediaCodec.mjpgAviBytes(8, 8, 3)
    val dc = "00dc".getBytes("US-ASCII")
    val chunks = (0 to bytes.length - 4)
      .filter(i => dc.indices.forall(j => bytes(i + j) == dc(j)))
    assert(chunks.size == 3, "fixture must contain three frame chunks")
    val patched = bytes.clone()
    val dataStart = chunks(1) + 8 // skip fourcc + length
    val len = java.nio.ByteBuffer.wrap(bytes, chunks(1) + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    java.util.Arrays.fill(patched, dataStart + 3, dataStart + len, 0.toByte)
    val df = spark.createDataFrame(Seq(("damaged", "video", "avi", patched)))
      .toDF("doc", "modality", "codec", "payload")
    val got = MediaCodec.aviFrames(df, step = 1).collect()
    assert(got.map(_.frame_idx).sorted.toSeq == Seq(0, 2),
      "intact frames must survive a corrupt sibling frame")
  }

  test("unsupported biCompression rejects the stream; mixed codec tables decode per row") {
    // patch strf.biCompression (the SECOND 'MJPG' in the container — the
    // first is the strh handler fourcc) to an unknown codec
    val bytes = MediaCodec.mjpgAviBytes(8, 8, 2)
    val mjpg = "MJPG".getBytes("US-ASCII")
    val hits = (0 to bytes.length - 4).filter(i => mjpg.indices.forall(j => bytes(i + j) == mjpg(j)))
    assert(hits.size >= 2, "fixture must contain handler + biCompression fourccs")
    val patched = bytes.clone()
    "XVID".getBytes("US-ASCII").copyToArray(patched, hits(1))
    assert(scala.util.Try(MediaCodec.parseAvi(patched)).isFailure,
      "an unknown biCompression must reject the stream at parse time")
    // a mixed dib+mjpg table decodes each row on its own codec branch
    val mixed = media.unionByName(MediaCodec.mjpgFixturesDF(spark))
    val docs = MediaCodec.aviFrames(mixed, step = 5).collect().map(_.doc).toSet
    assert(docs == Set("clip", "short", "anim", "mini"))
  }

  test("image embeddings are codec-invariant and drive cosine retrieval") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    // same pixels as BMP and as PNG → identical embedding
    val both = spark.createDataFrame(Seq(
        ("as_bmp", "image", "bmp", MediaCodec.bmpBytes(16, 16)),
        ("as_png", "image", "png", MediaCodec.pngBytes(16, 16))))
      .toDF("doc", "modality", "codec", "payload")
    val e = MediaCodec.imageEmbedding(both).collect().map(r => r.doc -> r.embedding).toMap
    assert(e("as_bmp") == e("as_png"))
    // unit norm, and knnCosine ranks the identical image first at 1.0
    val emb = MediaCodec.imageEmbedding(MediaCodec.fixturesDF(spark)).toDF()
      .select(col("doc").as("vec_id"), col("embedding"))
    val qs = emb.filter(col("vec_id") === "icon")
      .select(col("vec_id").as("q_vec_id"), col("embedding").as("q_embedding"))
    val top = graft.operators.Retrieval.knnCosine(qs, emb, k = 2, idCol = "vec_id")
      .orderBy("rank").collect()
    assert(top.head.getString(1) == "icon" && top.head.getDouble(2) == 1.0)
    assert(top(1).getDouble(2) < 1.0)
  }

  test("dHash: codec twins hash identically, brightness shift is invariant") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    def png(shift: Int): Array[Byte] = {
      val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 30; x <- 0 until 40) {
        def c(v: Int) = math.min(255, math.max(0, v + shift))
        img.setRGB(x, y, (c((x * 6) % 200) << 16) | (c((y * 7) % 200) << 8) |
          c((x + y) % 200))
      }
      val out = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val df = spark.createDataFrame(Seq(
        ("base", "image", "png", png(0)),
        ("bright", "image", "png", png(40)),   // +40 on every channel
        ("bmp_twin", "image", "bmp", MediaCodec.bmpBytes(64, 48)),
        ("png_twin", "image", "png", MediaCodec.pngBytes(64, 48))))
      .toDF("doc", "modality", "codec", "payload")
    val h = MediaCodec.imageDHash(df).collect().map(r => r.doc -> r.dhash).toMap
    // gradients survive a uniform brightness shift (unclipped region)
    assert(h("base") === h("bright"))
    // identical pixels through different codecs: identical hash
    assert(h("bmp_twin") === h("png_twin"))
    val pairs = MediaCodec.imageNearDups(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs.contains(("base", "bright", 0)))
    assert(pairs.contains(("bmp_twin", "png_twin", 0)))
    // the twin pairs are unrelated images: no cross pair
    assert(!pairs.exists(p => Set(p._1, p._2) == Set("base", "bmp_twin")))
  }

  test("video trimmed-copy and audio volume-twin detection") {
    val df = MediaCodec.dhashFixturesDF(spark)
    // clip2 = clip's first 8 frames: full containment, no short match
    val vp = MediaCodec.videoSharedFrames(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(vp === Map(("clip", "clip2") -> ((8L, 12L, 8L))))
    // beep_soft (half volume) fingerprints identically to beep
    val fp = MediaCodec.wavFingerprint(df).collect()
      .map(r => r.doc -> (r.n_windows, r.fingerprint)).toMap
    assert(fp("beep") === fp("beep_soft"))
    assert(fp("beep") !== fp("tone"))
    val ap = MediaCodec.audioNearDups(df).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(ap === Set(("beep", "beep_soft")))
    // the MJPG decode path hashes every sampled frame (NOTE: no
    // dib-proximity claim here — the fixture's modular-arithmetic
    // pixels are high-frequency noise, JPEG's worst case, and its
    // quantization legitimately moves gradient bits; on smooth real
    // photos dHash survives re-encoding, which is its design point)
    val jpg = MediaCodec.aviFrameDHash(MediaCodec.mjpgFixturesDF(spark)).collect()
    assert(jpg.count(_.doc == "anim") === 12)
    assert(jpg.count(_.doc == "mini") === 3)
    // step sampling composes with the hash walk
    val stepped = MediaCodec.aviFrameDHash(MediaCodec.fixturesDF(spark), step = 5)
      .collect().filter(_.doc == "clip").map(_.frame_idx).sorted
    assert(stepped.toSeq === Seq(0, 5, 10))
  }

  test("capped perceptual pair joins: exact parity within the cap " +
      "(the simhashPairsCapped contract on media)") {
    val df = MediaCodec.hostileDedupFixturesDF(spark)
    // cap >= every bucket's occupancy => capped output IS the uncapped
    // output, row for row (5 spacers / 4 black frames / 4 silences)
    def rows(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      d.collect().map(_.toSeq).toSet
    assert(rows(MediaCodec.imageNearDupsCapped(df, cap = 5)) ===
      rows(MediaCodec.imageNearDups(df)))
    assert(rows(MediaCodec.videoSharedFramesCapped(df, cap = 4)) ===
      rows(MediaCodec.videoSharedFrames(df)))
    assert(rows(MediaCodec.audioNearDupsCapped(df, cap = 4)) ===
      rows(MediaCodec.audioNearDups(df)))
    // and on the NON-hostile fixture any cap >= 2 is already a no-op
    val benign = MediaCodec.dhashFixturesDF(spark)
    assert(rows(MediaCodec.imageNearDupsCapped(benign, cap = 2)) ===
      rows(MediaCodec.imageNearDups(benign)))
    assert(rows(MediaCodec.audioNearDupsCapped(benign, cap = 2)) ===
      rows(MediaCodec.audioNearDups(benign)))
  }

  test("past the cap only the `cap` smallest docs act as pair sources; " +
      "legitimate twins keep resolving") {
    val df = MediaCodec.hostileDedupFixturesDF(spark)
    // five identical spacers, cap 2: a0/a1 source; a2-a4 still flagged
    val img = MediaCodec.imageNearDupsCapped(df, cap = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val spacerPairs = Set(("a0", "a1"), ("a0", "a2"), ("a0", "a3"),
      ("a0", "a4"), ("a1", "a2"), ("a1", "a3"), ("a1", "a4"))
    assert(img === spacerPairs + (("photo", "poster")),
      "capped image pairs: keeper-sourced spacers + the codec twin")
    // every spacer beyond the cap still has SOME keeper
    assert(Set("a2", "a3", "a4").subsetOf(img.map(_._2)))
    // four videos share one black frame, cap 2: v0/v1 source
    val vid = MediaCodec.videoSharedFramesCapped(df, cap = 2).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(vid.keySet === Set(("v0", "v1"), ("v0", "v2"), ("v0", "v3"),
      ("v1", "v2"), ("v1", "v3")))
    assert(vid.values.toSet === Set((1L, 2L, 2L)),
      "each pair shares exactly the black frame; stripe frames are unique")
    // four silent audios, cap 2: s0/s1 source; the volume twin survives
    val aud = MediaCodec.audioNearDupsCapped(df, cap = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(aud === Set(("s0", "s1"), ("s0", "s2"), ("s0", "s3"),
      ("s1", "s2"), ("s1", "s3"), ("beep", "beep_soft")))
    // the hostile fixture is what it claims: stripes hash distinct and
    // nonzero, spacers/silence collapse to the degenerate value
    val stripeHashes = MediaCodec.aviFrameDHash(df).collect()
      .filter(_.frame_idx == 0).map(_.dhash)
    assert(stripeHashes.distinct.length === 4 && !stripeHashes.contains(0L))
    val spacerHashes = MediaCodec.imageDHash(df).collect()
      .filter(_.doc.startsWith("a")).map(_.dhash).toSet
    assert(spacerHashes === Set(0L))
  }

  test("payload column is pruned out of the scan for metadata-only projections") {
    // through a real parquet round trip — pruning must reach ReadSchema
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    media.write.mode("overwrite").parquet(tmp)
    val p = spark.read.parquet(tmp).select("doc", "codec").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty && !readSchema.contains("payload"),
      "metadata projection must not read the payload bytes from parquet")
  }
}
