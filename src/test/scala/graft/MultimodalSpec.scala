package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic media has the contract schema") {
    val media = Multimodal.syntheticMedia(tables.Tables.documents(spark, sf))
    assert(media.schema.fieldNames.toSeq ===
      Seq("media_id", "kind", "payload", "width", "height", "duration_ms"))
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.select("kind").distinct().count() === 3)
  }

  test("decodeBatch emits fixed-shape deterministic features, payload dropped") {
    val media = Multimodal.syntheticMedia(tables.Tables.documents(spark, sf)).limit(20)
    val f1 = Multimodal.decodeBatch(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeBatch(media).collect().sortBy(_.media_id)
    assert(f1.length === 20)
    assert(f1.forall(_.features.length === 8))
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("real PNG payload decodes via ImageIO, not the stub") {
    // 4x2 image: left half pure red, right half pure blue.
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    assert(Multimodal.sniff(png) === "image")
    val media = Seq((1L, "image", png, 4, 2, 0L))
      .toDF("media_id", "kind", "payload", "width", "height", "duration_ms")
    val f = Multimodal.decodeBatch(media).collect().head.features
    assert(f(0) === 4 / 1024f)            // width
    assert(f(1) === 2 / 1024f)            // height
    assert(f(2) === 2.0f)                 // aspect
    assert(math.abs(f(3) - 0.5f) < 1e-6)  // mean R: half the pixels full red
    assert(f(4) === 0.0f)                 // mean G
    assert(math.abs(f(5) - 0.5f) < 1e-6)  // mean B
  }

  test("real WAV payload decodes via the PCM parser, not the stub") {
    // Mono 16-bit PCM, 8 kHz, 800 samples (0.1 s) of a full-scale
    // square wave at 400 Hz (10 samples half-period → 80 sign flips).
    val sr = 8000
    val n = 800
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(sr)
    bb.putInt(sr * 2); bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataLen)
    for (i <- 0 until n)
      bb.putShort(if ((i / 10) % 2 == 0) 32767.toShort else (-32767).toShort)
    val wav = bb.array()

    assert(Multimodal.sniff(wav) === "wav")
    val media = Seq((1L, "audio", wav, 0, 0, 100L))
      .toDF("media_id", "kind", "payload", "width", "height", "duration_ms")
    val f = Multimodal.decodeBatch(media).collect().head.features
    assert(f(0) === sr / 48000.0f)              // sample rate
    assert(f(1) === 1.0f)                       // channels
    assert(math.abs(f(2) - 0.1f) < 1e-6)        // duration
    assert(math.abs(f(3) - 1.0f) < 1e-3)        // RMS of full-scale square
    assert(math.abs(f(4) - 1.0f) < 1e-3)        // peak
    assert(math.abs(f(5) - 79f / 800f) < 1e-6)  // zero crossings
  }

  test("non-media payloads fall back to the deterministic stub") {
    val text = "just plain text".getBytes
    assert(Multimodal.sniff(text) === "unknown")
    assert(Multimodal.decodeFeatures(text).toSeq ===
      Multimodal.fakeDecodeFeatures(text).toSeq)
  }

  test("decodePaths pins dispatch: encoded fixture all real, text fixture all stub") {
    val docs = tables.Tables.documents(spark, sf).limit(30)
    val real = Multimodal.decodePaths(Multimodal.syntheticMediaEncoded(docs)).collect()
    assert(real.length === 30)
    assert(real.forall(_.real), "every encoded payload must real-decode")
    val codecByKind = real.map(p => p.kind -> p.codec).toSet
    assert(codecByKind === Set("image" -> "image", "audio" -> "wav", "video" -> "avi"))
    // text-byte payloads sniff as unknown and report the stub path
    val stub = Multimodal.decodePaths(Multimodal.syntheticMedia(docs)).collect()
    assert(stub.forall(p => !p.real && p.codec === "unknown"))
  }

  test("featureStats aggregates per kind") {
    val media = Multimodal.syntheticMedia(tables.Tables.documents(spark, sf))
    val stats = Multimodal.featureStats(media).collect()
    assert(stats.length === 3)
    assert(stats.map(_.getAs[Long]("n_media")).sum === media.count())
  }

  test("resizeBatch really resizes images, passes non-images through") {
    val media = Multimodal.syntheticMediaEncoded(
      tables.Tables.documents(spark, sf).limit(30))
    val resized = Multimodal.resizeBatch(media, maxDim = 4).collect()
    val byKind = resized.groupBy(_.kind)
    // every image fits the box, is a real PNG again, and decodes
    byKind("image").foreach { r =>
      assert(math.max(r.width, r.height) <= 4)
      assert(Multimodal.sniff(r.payload) === "image")
      val again = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(again.getWidth === r.width && again.getHeight === r.height)
    }
    // non-images pass through with payload format intact
    byKind("audio").foreach(r => assert(Multimodal.sniff(r.payload) === "wav"))
    byKind("video").foreach(r => assert(Multimodal.sniff(r.payload) === "avi"))
  }

  test("real MJPEG-AVI payload demuxes and decodes per frame, not the stub") {
    val avi = Multimodal.encodeMjpegAvi(7L, w = 8, h = 6, nFrames = 4)
    assert(Multimodal.sniff(avi) === "avi")

    val Some((usPerFrame, frames)) = Multimodal.demuxAvi(avi)
    assert(usPerFrame === 40000L) // 25 fps
    assert(frames.length === 4)
    // every demuxed chunk is a real JPEG that ImageIO can decode
    frames.foreach { f =>
      assert(Multimodal.sniff(f) === "image")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img.getWidth === 8 && img.getHeight === 6)
    }
    // whole-clip features = per-frame image features averaged: real
    // dimensions land in f0/f1/f2, unlike the byte-histogram stub
    val clip = Multimodal.decodeFeatures(avi)
    assert(clip(0) === 8 / 1024f && clip(1) === 6 / 1024f)
    assert(math.abs(clip(2) - 8f / 6f) < 1e-6)
    assert(clip.toSeq !== Multimodal.fakeDecodeFeatures(avi).toSeq)
  }

  test("sampleFrames emits one typed row per sampled timestamp, video only") {
    val media = Multimodal.syntheticMediaEncoded(
      tables.Tables.documents(spark, sf).limit(30))
    // everyMs = the fixture's real frame interval (25 fps) → one row
    // per demuxed frame, each decoded from its own JPEG
    val frames = Multimodal.sampleFrames(media, everyMs = 40).collect()
    assert(frames.nonEmpty)
    val videoIds = media.filter(org.apache.spark.sql.functions.col("kind") === "video")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(frames.map(_.media_id).toSet === videoIds)
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      assert(fs.length >= 3) // fixture videos have 3..6 frames
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until fs.length))
      assert(fs.forall(f => f.frame_ms === f.frame_idx * 40L))
      assert(fs.forall(_.features.length === Multimodal.FeatureDim))
      // real per-frame decode: frame pixels vary by frame index, so
      // consecutive frames must yield distinct feature vectors
      assert(fs.map(_.features.toSeq).distinct.length === fs.length)
    }
    // deterministic end-to-end (encode → demux → decode)
    val f2 = Multimodal.sampleFrames(media, everyMs = 40).collect()
    assert(frames.sortBy(f => (f.media_id, f.frame_idx)).map(_.features.toSeq).toSeq ===
      f2.sortBy(f => (f.media_id, f.frame_idx)).map(_.features.toSeq).toSeq)
  }

  test("encoded fixture routes image/audio rows through the real codecs") {
    val media = Multimodal.syntheticMediaEncoded(
      tables.Tables.documents(spark, sf).limit(30))
    val feats = Multimodal.decodeBatch(media).collect()
    val byKind = feats.groupBy(_.kind)
    // image features come from ImageIO: f0/f1 are normalized W/H,
    // which for the stub (byte histogram) would be < 0.004 — real
    // decode puts them at (4..11)/1024 with f2 = aspect ratio ≥ 0.5
    assert(byKind("image").forall { f =>
      f.features(0) >= 4 / 1024f && f.features(2) >= 0.5f
    })
    // audio features come from the PCM parser: channels == 1.0 exactly,
    // RMS of a ±16384 square wave == 0.5
    assert(byKind("audio").forall { f =>
      f.features(1) === 1.0f && math.abs(f.features(3) - 0.5f) < 1e-3
    })
    // video features come from the AVI demux + per-frame JPEG decode:
    // f0/f1 are real normalized dimensions (4..11 px), f2 a real
    // aspect ratio — the stub's byte histogram puts all lanes < 0.004
    assert(byKind("video").forall { f =>
      f.features(0) >= 4 / 1024f && f.features(2) >= 0.4f
    })
    // determinism end-to-end (encode → decode)
    val again = Multimodal.decodeBatch(media).collect()
    assert(feats.sortBy(_.media_id).map(_.features.toSeq).toSeq ===
      again.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  test("image dup groups: identical payloads always reunite; non-images ignored") {
    val docs = tables.Tables.documents(spark, sf).filter($"doc_id" < 60)
    val media = Multimodal.syntheticMediaEncoded(docs)
    val copies = media.filter($"kind" === "image" && $"media_id" < 10)
      .withColumn("media_id", $"media_id" + 1000L)
    val out = Multimodal.imageDupGroups(media.unionByName(copies))
      .as[(Long, Long)].collect().toSeq
    // every planted copy shares a group with its original
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val planted = out.map(_._2).filter(_ >= 1000L)
    assert(planted.nonEmpty)
    planted.foreach { c =>
      val g = out.find(_._2 == c).get._1
      assert(byGroup(g).contains(c - 1000L),
        s"copy $c not grouped with its original")
    }
    // only image rows participate (audio/video ids: id % 3 != 0)
    assert(out.forall { case (_, m) => (m % 3 == 0) || (m >= 1000L && (m - 1000L) % 3 == 0) })
    // deterministic under repartitioning
    val again = Multimodal.imageDupGroups(
      media.unionByName(copies).repartition(7))
      .as[(Long, Long)].collect().toSeq
    assert(again.sorted === out.sorted)
  }

  test("audio dup groups: spectral hash reunites copies, separates pitches, ignores non-audio") {
    val docs = tables.Tables.documents(spark, sf).filter($"doc_id" < 60)
    val media = Multimodal.syntheticMediaEncoded(docs)
    val copies = media.filter($"kind" === "audio" && $"media_id" < 10)
      .withColumn("media_id", $"media_id" + 1000L)
    val out = Multimodal.audioDupGroups(media.unionByName(copies))
      .as[(Long, Long)].collect().toSeq
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val planted = out.map(_._2).filter(_ >= 1000L)
    assert(planted.nonEmpty)
    planted.foreach { c =>
      val g = out.find(_._2 == c).get._1
      assert(byGroup(g).contains(c - 1000L),
        s"copy $c not grouped with its original")
    }
    // only audio rows participate (audio ids: id % 3 == 1)
    assert(out.forall { case (_, m) => (m % 3 == 1) || (m >= 1000L && (m - 1000L) % 3 == 1) })
    // deterministic under repartitioning
    val again = Multimodal.audioDupGroups(
      media.unionByName(copies).repartition(7))
      .as[(Long, Long)].collect().toSeq
    assert(again.sorted === out.sorted)
  }

  test("audioHash64: pitch-sensitive, amplitude-invariant, total on junk") {
    // distinct pitches (different halfPeriod) → different fingerprints
    val h1 = Multimodal.audioHash64(Multimodal.encodeWav(1L))
    val h4 = Multimodal.audioHash64(Multimodal.encodeWav(4L))
    val h7 = Multimodal.audioHash64(Multimodal.encodeWav(7L))
    assert(h1.isDefined && h4.isDefined && h7.isDefined)
    assert(Set(h1.get, h4.get, h7.get).size === 3,
      "different pitches must fingerprint differently")
    // byte-identical → identical
    assert(Multimodal.audioHash64(Multimodal.encodeWav(1L)) === h1)
    // amplitude scaling: halve every sample of the id-1 wave — the
    // per-window normalization keeps the fingerprint identical
    val wav = Multimodal.encodeWav(1L)
    val scaled = wav.clone()
    val bb = java.nio.ByteBuffer.wrap(scaled)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 44
    while (off + 1 < scaled.length) {
      bb.putShort(off, (bb.getShort(off) / 2).toShort)
      off += 2
    }
    assert(Multimodal.audioHash64(scaled) === h1,
      "fingerprint must be amplitude-invariant")
    // malformed / non-audio payloads → None, never a throw
    assert(Multimodal.audioHash64(Array[Byte]()) === None)
    assert(Multimodal.audioHash64("not a wav at all".getBytes) === None)
    // truncated mid-header (before the data chunk header) → None;
    // NB a payload truncated after a complete header still hashes
    // over whatever samples survive, matching decodeWavFeatures
    assert(Multimodal.audioHash64(wav.take(40)) === None)
  }

  test("audioHash64: resampling-invariant — half-rate re-encode collides") {
    // the commonest real-world audio dup: the same clip re-encoded at
    // a lower sample rate. Fixed-physical-Hz Goertzel bands over the
    // FULL clip (r12; the r11 8-window slicing flipped bits on short
    // clips) make the fingerprint rate-invariant; the pre-r11
    // cycles-per-sample bands doubled every band frequency under 2×
    // downsampling and never collided.
    def toneWav(sr: Int, freqHz: Double, durSec: Double,
                channels: Int = 1): Array[Byte] = {
      val nFrames = (sr * durSec).toInt
      val dataLen = nFrames * channels * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
      bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(sr)
      bb.putInt(sr * channels * 2); bb.putShort((channels * 2).toShort)
      bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(dataLen)
      var i = 0
      while (i < nFrames) {
        val s = (0.6 * 32767 *
          math.sin(2.0 * math.Pi * freqHz * i / sr)).toShort
        var c = 0
        while (c < channels) { bb.putShort(s); c += 1 }
        i += 1
      }
      bb.array()
    }
    val full = Multimodal.audioHash64(toneWav(44100, 400.0, 0.2))
    val half = Multimodal.audioHash64(toneWav(22050, 400.0, 0.2))
    val other = Multimodal.audioHash64(toneWav(44100, 900.0, 0.2))
    assert(full.isDefined && half.isDefined && other.isDefined)
    assert(full === half,
      "half-rate re-encode of the same clip must fingerprint identically")
    assert(full !== other, "distinct pitches must not collide")
    // stereo spread of the same mono content collides too (channel-0 walk)
    val stereo = Multimodal.audioHash64(toneWav(44100, 400.0, 0.2, channels = 2))
    assert(stereo === full,
      "stereo re-encode of the same content must fingerprint identically")
  }

  test("resampleWav: a REAL 22.05 kHz re-encode of every fixture clip collides") {
    // the driver-gate plant (plantedAudioMedia id+20000): linear-
    // interp resampling over the payload BYTES, covering every
    // half-period the encodeWav fixture generates (4..15 via id%12)
    // and every length residue (id%100) the first-100-docs audio ids
    // take — so the check row's exact-count pin can't hide a pitch
    // that only mostly survives resampling.
    (0L until 100L).filter(_ % 3 == 1).foreach { id =>
      val orig = Multimodal.encodeWav(id)
      val re = Multimodal.resampleWav(orig, 22050)
      assert(re.isDefined, s"fixture clip $id must resample")
      // a genuine re-encode: different container bytes, different rate
      assert(!java.util.Arrays.equals(re.get, orig))
      assert(Multimodal.audioHash64(re.get) === Multimodal.audioHash64(orig),
        s"22.05 kHz re-encode of clip $id must fingerprint identically")
    }
    // degenerate payloads refuse instead of throwing
    assert(Multimodal.resampleWav("not a wav".getBytes, 22050) === None)
    assert(Multimodal.resampleWav(Multimodal.encodeWav(1L).take(40), 22050) === None)
  }

  test("mp4 metadata path: stts/stss/stsd walk, sniff dispatch, totality") {
    // id 7 → 27 samples, keyframe step 3 → keyframes 1,4,…,25 = 9
    val p7 = Multimodal.encodeMp4AvcStub(7L)
    assert(Multimodal.sniff(p7) === "mp4")
    assert(Multimodal.sniffFormat(p7) === "mp4")
    val m7 = Multimodal.parseMp4Meta(p7)
    // id 7 dims: 320+16*7=432, 240+16*2=272 (avcC SPS parse)
    assert(m7 === Some(Multimodal.Mp4Meta("avc1", 27 * 40L, 27L, 9L,
      432, 272)))
    // id 0 → 20 samples, step 2 → 10 keyframes; 320×240
    assert(Multimodal.parseMp4Meta(Multimodal.encodeMp4AvcStub(0L)) ===
      Some(Multimodal.Mp4Meta("avc1", 800L, 20L, 10L, 320, 240)))
    // malformed payloads → None, never a throw
    assert(Multimodal.parseMp4Meta(Array[Byte]()) === None)
    assert(Multimodal.parseMp4Meta("junk that is not a box".getBytes) === None)
    assert(Multimodal.parseMp4Meta(p7.take(40)) === None) // moov truncated away
    // non-mp4 containers take their own path
    assert(Multimodal.parseMp4Meta(Multimodal.encodeWav(1L)) === None)
    // keyframe stats unify both container walks with exact structure
    val docs = tables.Tables.documents(spark, sf).filter($"doc_id" < 30)
    val stats = Multimodal.videoKeyframeStats(
      Multimodal.syntheticMediaEncoded(docs)
        .unionByName(Multimodal.syntheticMp4Media(docs)))
      .as[(Long, String, String, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    val (avi, mp4) = stats.partition(_._2 == "avi")
    assert(mp4.length === 30 && avi.nonEmpty)
    avi.foreach { case (id, _, codec, dur, ns, nk, w, h) =>
      val nFrames = 3 + id % 4
      assert(codec === "mjpeg" && ns === nFrames && nk === nFrames &&
        dur === nFrames * 40)
      // container dims from the avih header walk
      assert(w === 4 + id % 8 && h === 4 + id % 6)
    }
    mp4.foreach { case (mid, _, codec, dur, ns, nk, w, h) =>
      val id = mid - 1000000L
      val n = 20 + id % 10
      val step = 2 + id % 3
      assert(codec === "avc1" && ns === n && dur === n * 40 &&
        nk === (n - 1) / step + 1)
      // bitstream dims from the avcC SPS parse
      assert(w === 320 + 16 * (id % 8) && h === 240 + 16 * (id % 5))
    }
  }

  test("SPS parse: roundtrip over all stub dims, cropping arithmetic, emulation prevention, totality") {
    // every (w, h) the stub emits roundtrips through the real encoder
    for (w <- Seq(320, 336, 432, 1920); h <- Seq(240, 256, 304, 1088))
      assert(Multimodal.parseSpsDims(Multimodal.encodeSps(w, h)) ===
        Some((w, h)))
    // frame cropping: hand-code 1920×1080 = 120×68 MBs cropped 8
    // bottom lines (crop_bottom = 4 chroma units at 4:2:0) — the
    // standard HD shape every real encoder emits
    val bits = new scala.collection.mutable.ArrayBuffer[Int]()
    def u(v: Int, n: Int): Unit =
      (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1))
    def ue(v: Int): Unit = {
      val k = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(k)
      u(0, len - 1); u(k, len)
    }
    u(66, 8); u(0, 8); u(40, 8)
    ue(0); ue(0); ue(0); ue(0); ue(1); u(0, 1)
    ue(119); ue(67) // 120×68 MBs
    u(1, 1); u(0, 1) // frame_mbs_only, direct_8x8
    u(1, 1); ue(0); ue(0); ue(0); ue(4) // crop: bottom 4 units × 2
    u(0, 1); u(1, 1) // no vui; stop bit
    while (bits.length % 8 != 0) bits += 0
    val raw = bits.grouped(8)
      .map(g => g.foldLeft(0)((a, b) => (a << 1) | b).toByte).toArray
    assert(Multimodal.parseSpsDims(0x67.toByte +: raw) ===
      Some((1920, 1080)))
    // totality: junk and truncation → None, never a throw
    assert(Multimodal.parseSpsDims(Array[Byte](0x67)) === None)
    assert(Multimodal.parseSpsDims(Array[Byte](0x67, 66, 0, 30)) === None)
  }

  test("multi-format fixture: all four JDK image codecs sniff + decode real") {
    val docs = tables.Tables.documents(spark, sf).filter($"doc_id" < 40)
    val paths = Multimodal.decodePaths(
      Multimodal.syntheticImagesMultiFormat(docs)).collect().toSeq
    assert(paths.map(_.format).toSet === Set("png", "gif", "bmp", "jpeg"))
    assert(paths.forall(_.real), "every format must take its real codec path")
    assert(paths.forall(_.codec === "image"))
    // the format follows the id rotation
    paths.foreach { p =>
      val expect = (p.media_id % 4) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "bmp"; case _ => "jpeg"
      }
      assert(p.format === expect)
    }
  }

  test("frame dup groups: byte-identical clip copies reunite frame by frame") {
    val docs = tables.Tables.documents(spark, sf).filter($"doc_id" < 30)
    val media = Multimodal.syntheticMediaEncoded(docs)
    val videos = media.filter($"kind" === "video")
    val copies = videos.withColumn("media_id", $"media_id" + 1000L)
    val all = media.unionByName(copies)
    // every video frame hashes; per-clip frame count = 3 + id % 4
    val fh = Multimodal.frameHashes(all).collect().toSeq
    val perClip = fh.groupBy(_.media_id).view.mapValues(_.size).toMap
    perClip.foreach { case (m, n) =>
      val origId = if (m >= 1000L) m - 1000L else m
      assert(n === 3 + (origId % 4).toInt, s"clip $m decoded $n frames")
    }
    // copies hash identically to originals, frame for frame
    val byKey = fh.map(f => (f.media_id, f.frame_idx) -> f.ahash).toMap
    fh.filter(_.media_id >= 1000L).foreach { f =>
      assert(byKey((f.media_id - 1000L, f.frame_idx)) === f.ahash)
    }
    // frameDupGroups reunites every copy frame with its original
    val groups = Multimodal.frameDupGroups(all)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val members = groups.groupBy(g => (g._1, g._2))
      .view.mapValues(_.map(g => (g._3, g._4)).toSet).toMap
    fh.filter(_.media_id >= 1000L).foreach { f =>
      val g = groups.find(x => x._3 == f.media_id && x._4 == f.frame_idx)
      assert(g.isDefined, s"copy frame (${f.media_id}, ${f.frame_idx}) not grouped")
      assert(members(g.get._1 -> g.get._2)
        .contains((f.media_id - 1000L, f.frame_idx)))
    }
  }
}
