package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def assets = {
    import spark.implicits._
    Multimodal.syntheticAssets(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"), (5L, "epsilon"), (6L, "zeta"))
        .toDF("doc_id", "text"), "doc_id", "text")
  }

  test("syntheticAssets covers all modalities with payloads and typed meta") {
    val rows = assets.collect()
    assert(rows.map(_.getAs[String]("modality")).toSet == Set("image", "audio", "video"))
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("bytes").nonEmpty)
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getAs[Int]("width") > 0 && meta.getAs[Int]("height") > 0)
    }
  }

  test("decodeImageFeaturesSynthetic is deterministic, batch-shaped, length-stable") {
    def decode() = Multimodal.decodeImageFeaturesSynthetic(assets, dim = 8).collect()
      .map(r => r.getAs[Long]("asset_id") ->
        r.getAs[scala.collection.Seq[Float]]("features").toList).toMap
    val a = decode(); val b = decode()
    assert(a == b, "stub decode must be deterministic")
    assert(a.values.forall(_.length == 8))
  }

  test("resizeImagesSynthetic rewrites image dims, passes others through, keeps schema") {
    val resized = Multimodal.resizeImagesSynthetic(assets, 64, 64)
    // same columns, and union-compatible with the source (nullability may
    // tighten through the encoder — unionByName inside resizeImagesSynthetic already
    // enforces structural compatibility)
    assert(resized.columns.sameElements(assets.columns))
    assert(resized.unionByName(assets).count() == 12)
    val byId = resized.collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    val origById = assets.collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    byId.foreach { case (id, r) =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      if (r.getAs[String]("modality") == "image") {
        assert(meta.getAs[Int]("width") == 64 && meta.getAs[Int]("height") == 64)
      } else {
        assert(r == origById(id), "non-image assets must pass through untouched")
      }
    }
  }

  test("decodePng reads a PNG written by an INDEPENDENT encoder bit-exactly") {
    // golden: a 3x2 RGB PNG produced by a from-scratch Python zlib/struct
    // writer (no ImageIO involved) — proves the decode is a real codec, not
    // a roundtrip of our own encoder's quirks
    val golden = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAMAAAACCAIAAAASFvFNAAAAF0lEQVR4nGP4z8DAAMFcInIaRjZuAVEAM1kEwOQkmMsAAAAASUVORK5CYII=")
    val img = Multimodal.decodePng(golden).getOrElse(fail("golden PNG did not decode"))
    assert(img.getWidth == 3 && img.getHeight == 2)
    val expect = Map(
      (0, 0) -> 0xFFFF0000, (1, 0) -> 0xFF00FF00, (2, 0) -> 0xFF0000FF,
      (0, 1) -> 0xFF0A141E, (1, 1) -> 0xFF28323C, (2, 1) -> 0xFF46505A)
    expect.foreach { case ((x, y), argb) =>
      assert(img.getRGB(x, y) == argb,
        f"pixel ($x,$y): got ${img.getRGB(x, y)}%08x want $argb%08x")
    }
    assert(Multimodal.decodePng(Array[Byte](1, 2, 3)).isEmpty, "garbage must not decode")
    assert(Multimodal.decodePng(null).isEmpty && Multimodal.decodePng(Array.emptyByteArray).isEmpty)
  }

  test("encodePng → decodePng roundtrips the deterministic pattern bit-exactly") {
    val id = 4242L
    val (w, h) = Multimodal.patternDims(id)
    val img = Multimodal.decodePng(
      Multimodal.encodePng(w, h, (x, y) => Multimodal.patternGray(id, x, y)))
      .getOrElse(fail("pattern PNG did not decode"))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val g = Multimodal.patternGray(id, x, y)
      assert((img.getRGB(x, y) & 0xFFFFFF) == ((g << 16) | (g << 8) | g),
        s"pixel ($x,$y) of asset $id")
    }
  }

  test("pngAssets → decodeImageStats: real decode matches the closed form; resize resamples exactly") {
    import spark.implicits._
    val ids = Seq(7L, 100L, 9999L)
    val a = Multimodal.pngAssets(ids.toDF("id"), "id")
    val stats = Multimodal.decodeImageStats(a).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.patternDims(id)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.patternGray(id, x, y).toLong).sum
      val r = stats(id)
      assert(r.getAs[Boolean]("decode_ok"))
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("sum_gray") == want, s"asset $id gray sum")
    }
    val rz = Multimodal.decodeImageStats(Multimodal.resizeImagesReal(a, 8, 6))
      .collect().map(r => r.getAs[Long]("asset_id") -> r).toMap
    ids.foreach { id =>
      val (w, h) = Multimodal.patternDims(id)
      val want = (for (y <- 0 until 6; x <- 0 until 8)
        yield Multimodal.patternGray(id, x * w / 8, y * h / 6).toLong).sum
      val r = rz(id)
      assert(r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 6)
      assert(r.getAs[Long]("sum_gray") == want, s"asset $id resized gray sum")
    }
  }

  test("scenePngAssets → dHash63: engine hash replays bit-exactly from the closed form") {
    import spark.implicits._
    val ids = Seq(0L, 3L, 53L, 103L, 499L, 12345L)
    val got = Multimodal.dHash63(Multimodal.scenePngAssets(ids.toDF("id"), "id"))
      .collect().map(r => r.getAs[Long]("asset_id") ->
        (r.getAs[Boolean]("decode_ok"), r.get(r.fieldIndex("dhash")))).toMap
    ids.foreach { id =>
      // driver replay from the pattern, independent of the codec path
      val (w, h) = Multimodal.scenePatternDims(id)
      var want = 0L
      for (by <- 0 until Multimodal.DHashGridH; bx <- 0 until Multimodal.DHashGridW) {
        val sy = by * h / Multimodal.DHashGridH
        val g1 = Multimodal.scenePatternGray(id, bx * w / (Multimodal.DHashGridW + 1), sy)
        val g2 = Multimodal.scenePatternGray(id, (bx + 1) * w / (Multimodal.DHashGridW + 1), sy)
        if (g2 > g1) want |= 1L << (by * Multimodal.DHashGridW + bx)
      }
      assert(got(id)._1, s"asset $id must decode")
      assert(got(id)._2 == want, s"asset $id dhash")
      assert(want >= 0L, "63-bit hash stays non-negative")
    }
  }

  test("dHash63 is brightness-robust: same-scene replicas land near, distinct scenes far") {
    import spark.implicits._
    // ids 30, 80, 130 share scene 30 at increasing brightness shifts; 31
    // is a different scene. The bounds are the measured pattern values with
    // margin — the CLAIM under test is the ordering: a brightness shift
    // flips only wrap-line bits, a different scene flips gradient structure.
    val df = Multimodal.dHash63(Multimodal.scenePngAssets(
      Seq(30L, 80L, 130L, 31L).toDF("id"), "id"))
      .collect().map(r => r.getAs[Long]("asset_id") -> r.getAs[Long]("dhash")).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(df(30L), df(80L)) <= 3, "one brightness step flips only wrap-line bits")
    assert(ham(df(30L), df(130L)) <= 3, "two steps stay near")
    assert(ham(df(30L), df(31L)) > 10, "a different scene is far")
  }

  test("dHash63 reports decode_ok=false with null hash on corrupt payloads") {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.AssetSchema)
    val good = Multimodal.scenePngAssets(Seq(5L).toDF("id"), "id")
    val corrupt = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(99L, "image", Array[Byte](1, 2, 3), null),
        org.apache.spark.sql.Row(98L, "image", null, null)),
      Multimodal.AssetSchema)
    val out = Multimodal.dHash63(good.unionByName(corrupt)).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(out(5L).getAs[Boolean]("decode_ok"))
    assert(!out(99L).getAs[Boolean]("decode_ok") && out(99L).isNullAt(1))
    assert(!out(98L).getAs[Boolean]("decode_ok") && out(98L).isNullAt(1))
  }

  test("vadSegments merges consecutive active windows into maximal regions; one exchange") {
    import spark.implicits._
    // hand fixture: asset 1 windows active/inactive = A A _ A _ A A A
    val rows = Seq(
      (1L, 0L, 0L, 200L, 100_000_000L, true), (1L, 1L, 25L, 200L, 90_000_000L, true),
      (1L, 2L, 50L, 200L, 1L, true), (1L, 3L, 75L, 200L, 80_000_000L, true),
      (1L, 4L, 100L, 200L, 2L, true), (1L, 5L, 125L, 200L, 70_000_000L, true),
      (1L, 6L, 150L, 200L, 70_000_000L, true), (1L, 7L, 175L, 100L, 35_000_000L, true),
      (2L, 0L, 0L, 200L, 5L, true),            // silent asset: no regions
      (3L, 0L, 0L, 200L, 99_000_000L, false))  // undecodable window never joins
      .toDF("asset_id", "seg_idx", "seg_start_ms", "n_samples", "sum_sq", "decode_ok")
    val out = Multimodal.vadSegments(rows, thresholdMeanSq = 334000L)
    val got = out.select("asset_id", "start_idx", "end_idx", "n_windows", "n_samples")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 1L, 2L, 400L), (1L, 3L, 3L, 1L, 200L),
      (1L, 5L, 7L, 3L, 500L)), s"got $got")
    val exchanges = "Exchange".r.findAllIn(
      out.queryExecution.executedPlan.toString).length
    assert(exchanges <= 1, s"island window + region agg must share one exchange, saw $exchanges")
  }

  test("sampleFramesSynthetic emits one row per everyMs of duration (video only)") {
    val frames = Multimodal.sampleFramesSynthetic(assets, everyMs = 10000L).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Long]("ts_ms") % 10000L == 0))
    val durations = assets.filter(org.apache.spark.sql.functions.col("modality") === "video")
      .select("asset_id", "meta.duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = frames.groupBy(_.getAs[Long]("asset_id")).view.mapValues(_.length).toMap
    durations.foreach { case (id, dur) =>
      assert(counts(id) == (dur / 10000L).toInt + 1, s"asset $id frame count")
    }
  }

  test("decodeWavPcm16 reads a WAV written by an INDEPENDENT encoder sample-exactly") {
    // golden: AudioSystem's own WAV writer (not our RIFF writer) — proves
    // decodeWavPcm16 is a real codec parse, not a roundtrip of our header
    val samples = Array.tabulate(1234)(i => Multimodal.patternPcm(77L, i).toShort)
    val pcm = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(pcm.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (rate, got) = Multimodal.decodeWavPcm16(bos.toByteArray)
      .getOrElse(fail("golden WAV did not decode"))
    assert(rate == 8000 && got.sameElements(samples))
    // and the converse: OUR writer's bytes parse through the JDK codec
    val ours = Multimodal.encodeWavPcm16(8000, samples)
    val (r2, got2) = Multimodal.decodeWavPcm16(ours)
      .getOrElse(fail("our RIFF writer's WAV did not decode via AudioSystem"))
    assert(r2 == 8000 && got2.sameElements(samples))
    assert(Multimodal.decodeWavPcm16(Array[Byte](1, 2, 3)).isEmpty, "garbage must not decode")
    assert(Multimodal.decodeWavPcm16(null).isEmpty &&
      Multimodal.decodeWavPcm16(Array.emptyByteArray).isEmpty)
  }

  test("wavAssets → segmentAudioReal: real decode matches closed-form window energies") {
    import spark.implicits._
    val ids = Seq(3L, 100L, 9999L)
    val segs = Multimodal.segmentAudioReal(
        Multimodal.wavAssets(ids.toDF("id"), "id"), windowMs = 100L)
      .collect().groupBy(_.getAs[Long]("asset_id"))
    ids.foreach { id =>
      val n = Multimodal.patternSampleCount(id)
      val spw = 100 * Multimodal.WavSampleRate / 1000 // 800
      val rows = segs(id).sortBy(_.getAs[Long]("seg_idx"))
      assert(rows.length == (n + spw - 1) / spw, s"asset $id window count")
      rows.foreach { r =>
        assert(r.getAs[Boolean]("decode_ok"))
        val w = r.getAs[Long]("seg_idx").toInt
        val s0 = w * spw
        val s1 = math.min(n, s0 + spw)
        val want = (s0 until s1).map { i =>
          val v = Multimodal.patternPcm(id, i).toLong; v * v
        }.sum
        assert(r.getAs[Long]("seg_start_ms") == w * 100L)
        assert(r.getAs[Long]("n_samples") == s1 - s0)
        assert(r.getAs[Long]("sum_sq") == want, s"asset $id window $w energy")
      }
    }
    // corrupt payload degrades to decode_ok = false, never a lost asset
    import org.apache.spark.sql.functions.{col, lit, when}
    val corrupted = Multimodal.wavAssets(ids.toDF("id"), "id")
      .withColumn("bytes", when(col("asset_id") === 3L,
        lit(Array[Byte](9, 9, 9))).otherwise(col("bytes")))
    val marks = Multimodal.segmentAudioReal(corrupted, windowMs = 100L)
      .collect().groupBy(_.getAs[Long]("asset_id"))
    assert(marks(3L).length == 1 && !marks(3L).head.getAs[Boolean]("decode_ok"))
    assert(marks(100L).forall(_.getAs[Boolean]("decode_ok")))
  }

  test("videoAssets → sampleFramesReal: GFV1 demux + real per-frame decode match closed form") {
    import spark.implicits._
    val ids = Seq(5L, 42L, 1000L)
    val frames = Multimodal.sampleFramesReal(
        Multimodal.videoAssets(ids.toDF("id"), "id"), everyN = 2)
      .collect().groupBy(_.getAs[Long]("asset_id"))
    ids.foreach { id =>
      val (w, h) = Multimodal.patternDims(id)
      val nf = Multimodal.patternFrameCount(id)
      val sampled = (0 until nf by 2).toSeq
      val rows = frames(id).sortBy(_.getAs[Long]("frame_idx"))
      assert(rows.map(_.getAs[Long]("frame_idx").toInt).toSeq == sampled, s"asset $id frames")
      rows.foreach { r =>
        val f = r.getAs[Long]("frame_idx").toInt
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.patternFrameGray(id, f, x, y).toLong).sum
        assert(r.getAs[Boolean]("decode_ok"))
        assert(r.getAs[Long]("ts_ms") == f * Multimodal.VideoFrameMs)
        assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
        assert(r.getAs[Long]("sum_gray") == want, s"asset $id frame $f gray sum")
      }
    }
    // container corruption (bad magic) → one decode_ok=false row
    assert(Multimodal.splitGfv1Frames("XXXX0000".getBytes).isEmpty)
    assert(Multimodal.splitGfv1Frames(null).isEmpty)
    // truncated mid-frame → rejected, not a partial parse
    val good = Multimodal.encodeGfv1(Seq(
      Multimodal.encodePng(4, 4, (x, y) => x + y)))
    assert(Multimodal.splitGfv1Frames(good).nonEmpty)
    assert(Multimodal.splitGfv1Frames(good.dropRight(5)).isEmpty)
  }

  test("videoAssetsAvi → sampleFramesReal: real AVI demux + per-frame decode match closed form") {
    import spark.implicits._
    val ids = Seq(5L, 42L, 1000L)
    val frames = Multimodal.sampleFramesReal(
        Multimodal.videoAssetsAvi(ids.toDF("id"), "id"), everyN = 2)
      .collect().groupBy(_.getAs[Long]("asset_id"))
    ids.foreach { id =>
      val (w, h) = Multimodal.patternDims(id)
      val nf = Multimodal.patternFrameCount(id)
      val rows = frames(id).sortBy(_.getAs[Long]("frame_idx"))
      assert(rows.map(_.getAs[Long]("frame_idx").toInt).toSeq == (0 until nf by 2).toSeq)
      rows.foreach { r =>
        val f = r.getAs[Long]("frame_idx").toInt
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield Multimodal.patternFrameGray(id, f, x, y).toLong).sum
        assert(r.getAs[Boolean]("decode_ok"))
        assert(r.getAs[Long]("ts_ms") == f * Multimodal.VideoFrameMs,
          "ts must derive from the container's avih period")
        assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
        assert(r.getAs[Long]("sum_gray") == want, s"asset $id frame $f gray sum")
      }
    }
  }

  test("demuxAvi reads an AVI assembled by an INDEPENDENT muxer (MJPEG frames)") {
    // hand-assemble the RIFF layout from the public spec — a separate code
    // path from encodeAviMjpeg, so mux and demux are not mirror images
    def le(v: Int): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def s16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def fcc(s: String) = s.getBytes("US-ASCII")
    // REAL JPEG frames via the JDK's own encoder — the genuine MJPEG payload
    def jpegFrame(shade: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (w, h) = (6, 5)
    val payloads = Seq(jpegFrame(40, w, h), jpegFrame(120, w, h), jpegFrame(220, w, h))
    val periodUs = 100000 // 10 fps — NOT the engine default, proves avih is read
    val avih = fcc("avih") ++ le(56) ++ le(periodUs) ++ le(0) ++ le(0) ++ le(0x10) ++
      le(payloads.size) ++ le(0) ++ le(1) ++ le(0) ++ le(w) ++ le(h) ++ Array.fill(16)(0.toByte)
    val strh = fcc("strh") ++ le(56) ++ fcc("vids") ++ fcc("MJPG") ++ le(0) ++
      s16(0) ++ s16(0) ++ le(0) ++ le(100) ++ le(1000) ++ le(0) ++ le(payloads.size) ++
      le(0) ++ le(-1) ++ le(0) ++ s16(0) ++ s16(0) ++ s16(w) ++ s16(h)
    val strf = fcc("strf") ++ le(40) ++ le(40) ++ le(w) ++ le(h) ++ s16(1) ++ s16(24) ++
      fcc("MJPG") ++ le(w * h * 3) ++ le(0) ++ le(0) ++ le(0) ++ le(0)
    val strl = fcc("LIST") ++ le(4 + strh.length + strf.length) ++ fcc("strl") ++ strh ++ strf
    val hdrl = fcc("LIST") ++ le(4 + avih.length + strl.length) ++ fcc("hdrl") ++ avih ++ strl
    val moviChunks = payloads.flatMap { p =>
      val padded = if (p.length % 2 == 1) p :+ 0.toByte else p
      fcc("00dc") ++ le(p.length) ++ padded
    }.toArray
    val movi = fcc("LIST") ++ le(4 + moviChunks.length) ++ fcc("movi") ++ moviChunks
    val body = fcc("AVI ") ++ hdrl ++ movi
    val avi = fcc("RIFF") ++ le(body.length) ++ body

    val Some((got, periodMs)) = Multimodal.demuxAvi(avi)
    assert(periodMs == 100L, s"avih period must be honored, got $periodMs")
    assert(got.size == payloads.size)
    got.zip(payloads).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "payloads must demux byte-identically")
    }
    // and the JDK genuinely decodes the MJPEG payloads with exact dims
    got.foreach { p =>
      val img = Multimodal.decodePng(p)
      assert(img.exists(i => i.getWidth == w && i.getHeight == h))
    }
    // corrupt containers are verdicts, not exceptions
    assert(Multimodal.demuxAvi(avi.dropRight(7)).isEmpty, "truncated AVI rejected")
    assert(Multimodal.demuxAvi("RIFFxxxxWAVE".getBytes).isEmpty, "non-AVI RIFF rejected")
    assert(Multimodal.demuxAvi(Array[Byte](1, 2, 3)).isEmpty)
    // and the engine's own muxer round-trips through the same demuxer
    val muxed = Multimodal.encodeAviMjpeg(payloads, w, h, periodMs = 100L)
    val Some((rt, rtMs)) = Multimodal.demuxAvi(muxed)
    assert(rtMs == 100L && rt.size == payloads.size &&
      rt.zip(payloads).forall { case (a, b) => java.util.Arrays.equals(a, b) })
  }

  test("segmentAudioSynthetic tiles the duration exactly (audio only); windows sum to duration") {
    val segs = Multimodal.segmentAudioSynthetic(assets, windowMs = 30000L).collect()
    assert(segs.nonEmpty)
    assert(segs.forall(_.getAs[Long]("seg_start_ms") % 30000L == 0))
    assert(segs.forall(r => r.getAs[Long]("energy_ppm") >= 0 && r.getAs[Long]("energy_ppm") < 1000000L))
    val durations = assets.filter(org.apache.spark.sql.functions.col("modality") === "audio")
      .select("asset_id", "meta.duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byAsset = segs.groupBy(_.getAs[Long]("asset_id"))
    assert(byAsset.keySet == durations.keySet, "every audio asset segments; nothing else does")
    durations.foreach { case (id, dur) =>
      val ws = byAsset(id).map(_.getAs[Long]("seg_ms"))
      assert(ws.sum == dur, s"asset $id windows must tile the duration exactly")
      assert(ws.init.forall(_ == 30000L), s"asset $id non-final windows are full-size")
    }
  }
}
