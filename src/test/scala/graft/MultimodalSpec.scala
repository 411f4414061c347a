package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.syntheticMedia(Tables.documents(spark, sf0001))

  test("synthetic media table has the canonical schema") {
    assert(media.columns.toSeq === Multimodal.mediaColumns)
    assert(media.count() === 500)
  }

  test("feature extraction is deterministic and shape-correct") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect()
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(f1.length === 500)
    assert(f1.forall(_.feature.length === 16))
    val m1 = f1.map(f => f.media_id -> f.feature.toSeq).toMap
    val m2 = f2.map(f => f.media_id -> f.feature.toSeq).toMap
    assert(m1 === m2, "stub decode must be deterministic")
    assert(f1.forall(f => f.n_bytes > 0))
  }

  test("resize plan preserves aspect ratio and caps the long side") {
    val r = Multimodal.resizePlan(media, maxSide = 256)
      .select("width", "height", "target_width", "target_height").collect()
    r.foreach { row =>
      val (w, h, tw, th) = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      assert(math.max(tw, th) <= 256)
      if (math.max(w, h) <= 256) { assert(tw === w && th === h) }
    }
  }

  test("frame sampling only produces timestamps for videos, within duration") {
    val r = Multimodal.frameSamplePlan(media, everyMs = 1000L)
      .select("kind", "duration_ms", "frame_ts_ms").collect()
    r.foreach { row =>
      val kind = row.getString(0)
      val frames = row.getSeq[Long](2)
      if (kind == "video") {
        assert(frames.nonEmpty)
        assert(frames.forall(t => t >= 0 && t <= row.getLong(1)))
      } else assert(frames.isEmpty)
    }
  }

  test("WAV roundtrip: real parser recovers the encoder's parameters") {
    for ((sr, ch, bits, n) <- Seq((8000, 1, 16, 50), (16000, 2, 16, 149),
        (44100, 1, 8, 33))) {
      val meta = Multimodal.parseWav(7L, Multimodal.wavBytes(sr, ch, bits, n))
      assert(meta.isDefined, s"($sr,$ch,$bits,$n) failed to parse")
      val m = meta.get
      assert(m.sample_rate == sr && m.channels == ch &&
        m.bits_per_sample == bits && m.n_samples == n)
      assert(m.duration_ms == n * 1000L / sr)
    }
  }

  test("WAV parser quarantines garbage instead of throwing") {
    assert(Multimodal.parseWav(1L, null).isEmpty)
    assert(Multimodal.parseWav(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseWav(1L,
      Array.fill[Byte](100)(0x41)).isEmpty) // "AAAA..." — wrong magic
    val valid = Multimodal.wavBytes(8000, 1, 16, 10)
    assert(Multimodal.parseWav(1L, valid.take(30)).isEmpty) // truncated
    // declared chunk size overruns the buffer -> reject, not read OOB
    val lying = valid.clone()
    lying(40) = 0x7F.toByte; lying(41) = 0x7F.toByte
    lying(42) = 0x7F.toByte; lying(43) = 0x7F.toByte
    assert(Multimodal.parseWav(1L, lying).isEmpty)
    // size crafted so off+8+size wraps negative in int arithmetic — the
    // long-bound check must quarantine, not walk out of the buffer
    val wrap = valid.clone()
    java.nio.ByteBuffer.wrap(wrap).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue - 20)
    assert(Multimodal.parseWav(1L, wrap).isEmpty)
  }

  test("BMP roundtrip: parser recovers dimensions incl. row padding and top-down") {
    for ((w, h) <- Seq((16, 9), (33, 21), (1, 1), (640, 480))) {
      val m = Multimodal.parseBmp(3L, Multimodal.bmpBytes(w, h))
      assert(m.isDefined, s"($w,$h) failed")
      assert(m.get.width == w && m.get.height == h &&
        m.get.bits_per_pixel == 24 && m.get.n_pixels == w.toLong * h)
    }
    // top-down BMP (negative height) decodes to |height|
    val td = Multimodal.bmpBytes(8, 4)
    val buf = java.nio.ByteBuffer.wrap(td).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -4)
    assert(Multimodal.parseBmp(1L, td).get.height == 4)
    // garbage and size-lying headers quarantine
    assert(Multimodal.parseBmp(1L, Array[Byte]('B', 'M', 0)).isEmpty)
    val lying = Multimodal.bmpBytes(8, 4)
    java.nio.ByteBuffer.wrap(lying).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(2, 123456)
    assert(Multimodal.parseBmp(1L, lying).isEmpty)
  }

  test("dHash: constructed BMPs hash to their exact target; pixel decode roundtrips") {
    import spark.implicits._
    val targets = Seq(0L, -1L, 0x123456789ABCDEFL,
      Multimodal.mix64(7L), Multimodal.mix64(42L))
    // driver-side roundtrip of the integer pipeline
    targets.foreach { t =>
      val (w, h, gray) = Multimodal.parseBmpGray(Multimodal.bmpWithDhash(t)).get
      assert((w, h) === (72, 64))
      assert(Multimodal.dhashOfGray(w, h, gray) === t,
        s"dHash roundtrip broke for target $t")
    }
    // distributed kernel agrees
    val media = targets.zipWithIndex
      .map { case (t, i) => (i.toLong, Multimodal.bmpWithDhash(t)) }
      .toDF("media_id", "bytes")
    val got = Multimodal.bmpDhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === targets.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap)
    // corrupt bytes and sub-grid images quarantine, never throw
    val junk = Seq(
      (100L, Array[Byte](1, 2, 3)),
      (101L, Multimodal.bmpBytes(4, 4)), // 4×4 < the 9×8 grid
      (102L, Multimodal.wavBytes(8000, 1, 16, 10))) // not a BMP at all
      .toDF("media_id", "bytes")
    assert(Multimodal.bmpDhash(junk).count() === 0L)
    // arbitrary (non-cell-aligned) sizes hash deterministically
    val synth = Multimodal.syntheticBmp(
      spark.range(40).select(col("id").as("doc_id")))
    val h1 = Multimodal.bmpDhash(synth).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.bmpDhash(synth).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 === h2 && h1.size === 40)
  }

  test("hammingBandedPairs is complete for hamming < bands and exact on distances") {
    import spark.implicits._
    import graft.operators.Dedup
    // 60 random-ish hashes + planted near-dups at known distances
    val bases = (0L until 60L).map(i => i -> Multimodal.mix64(i))
    val planted = bases.collect { case (i, h) if i % 6 == 0 =>
      var mask = 0L
      (0 until (1 + (i % 5)).toInt)
        .foreach(j => mask |= 1L << ((i * 11 + j * 13) % 64).toInt)
      (i + 1000L) -> (h ^ mask)
    }
    val all = (bases ++ planted).toDF("id", "hash")
    val banded = Dedup.hammingBandedPairs(all, "id", "hash",
        maxHamming = 6, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exact all-pairs truth
    val rows = (bases ++ planted)
    val exact = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d.toLong)).toSet
    assert(banded === exact,
      "8-band pigeonhole must find EVERY pair within hamming 6")
    assert(banded.nonEmpty && banded.size >= planted.size)
    // the guard refuses an incomplete configuration loudly
    val e = intercept[IllegalArgumentException] {
      Dedup.hammingBandedPairs(all, "id", "hash", maxHamming = 8, bands = 8)
    }
    assert(e.getMessage.contains("pigeonhole"))
    // end-to-end image dedup keeps exactly one representative (the min
    // id) per planted near-dup cluster and every singleton
    val media = rows.map { case (i, h) => (i, Multimodal.bmpWithDhash(h)) }
      .toDF("media_id", "bytes")
    val kept = Multimodal.dropNearDupBmps(media).select("media_id")
      .collect().map(_.getLong(0)).toSet
    // driver-side union-find truth: keep each component's min, singletons
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exact.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expectedLosers = rows.map(_._1).filter(i => find(i) != i).toSet
    assert(kept === rows.map(_._1).toSet -- expectedLosers)
  }

  test("audio fingerprint: constructed WAVs hash to their exact target; near-dedup keeps representatives") {
    import spark.implicits._
    import graft.operators.Dedup
    val targets = Seq(0L, -1L, 0x0F0F0F0F0F0F0F0FL,
      Multimodal.mix64(9L), Multimodal.mix64(77L))
    // driver-side roundtrip of the integer pipeline
    targets.foreach { t =>
      val samples = Multimodal.parsePcm16(Multimodal.wavWithFingerprint(t)).get
      assert(samples.length === 65 * 64)
      assert(Multimodal.energyFingerprint(samples) === t,
        s"fingerprint roundtrip broke for target $t")
    }
    // stereo decode channel-sums per frame (exact integers, no division)
    assert(Multimodal.parsePcm16(
      Multimodal.wavBytes(8000, 2, 16, 200)).get.length === 200)
    // distributed kernel agrees; quarantine on junk
    val media = targets.zipWithIndex
      .map { case (t, i) => (i.toLong, Multimodal.wavWithFingerprint(t)) }
      .toDF("media_id", "bytes")
    val got = Multimodal.wavFingerprint(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === targets.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap)
    val junk = Seq(
      (100L, Array[Byte](82, 73, 70, 70)),
      (101L, Multimodal.bmpBytes(16, 16)), // not a WAV
      (102L, Multimodal.wavBytes(8000, 1, 16, 30))) // < 65 samples
      .toDF("media_id", "bytes")
    assert(Multimodal.wavFingerprint(junk).count() === 0L)
    // end-to-end audio dedup: planted near-identical clip drops, its
    // base and all singletons survive
    val withDup = (targets.zipWithIndex.map { case (t, i) =>
      (i.toLong, Multimodal.wavWithFingerprint(t)) } :+
      (1000L, Multimodal.wavWithFingerprint(targets(3) ^ 3L))) // hamming 2 to id 3
      .toDF("media_id", "bytes")
    val kept = Multimodal.dropNearDupWavs(withDup).select("media_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 1L, 2L, 3L, 4L),
      s"near-identical clip must fold into its base, got $kept")
  }

  test("AVI roundtrip: real RIFF walk recovers per-frame dHashes; video near-dup counts aligned frames") {
    import spark.implicits._
    // encode 3 frames with known hashes, decode, hash — bit-exact
    val targets = Seq(Multimodal.mix64(1L), Multimodal.mix64(2L), 0L)
    val avi = Multimodal.aviBytes(72, 64,
      targets.map(Multimodal.dibFrameWithDhash))
    val parsed = Multimodal.parseAviGray(avi).get
    assert((parsed._1, parsed._2, parsed._3.size) === (72, 64, 3))
    parsed._3.zip(targets).foreach { case (gray, t) =>
      assert(Multimodal.dhashOfGray(72, 64, gray) === t)
    }
    // junk quarantines (truncated, non-AVI RIFF, random bytes)
    assert(Multimodal.parseAviGray(avi.take(100)) === None)
    assert(Multimodal.parseAviGray(
      Multimodal.wavBytes(8000, 1, 16, 50)) === None)
    assert(Multimodal.parseAviGray(Array[Byte](1, 2, 3)) === None)
    // distributed per-frame hashes
    val media = Seq((5L, avi)).toDF("media_id", "bytes")
    val hashes = Multimodal.aviFrameDhashes(media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(hashes === targets.zipWithIndex
      .map { case (t, i) => (5L, i, t) }.toSet)
    // near-dup: clip B shares 3 of A's 4 frames (one within hamming 2),
    // clip C shares only 1 — with minCloseFrames = 3, (A,B) pairs, C
    // stays out despite its single aligned match
    def clip(hs: Seq[Long]) =
      Multimodal.aviBytes(72, 64, hs.map(Multimodal.dibFrameWithDhash))
    val hA = (0 until 4).map(f => Multimodal.mix64(100L + f))
    val hB = Seq(hA(0), hA(1) ^ 3L, hA(2), Multimodal.mix64(999L))
    val hC = Seq(hA(0), Multimodal.mix64(777L), Multimodal.mix64(778L),
      Multimodal.mix64(779L))
    val clips = Seq((1L, clip(hA)), (2L, clip(hB)), (3L, clip(hC)))
      .toDF("media_id", "bytes")
    val pairs = Multimodal.videoNearDupPairs(clips, minCloseFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 3L)))
    // alignment matters: the same frames SHIFTED by one slot don't pair
    val hShift = Seq(Multimodal.mix64(998L), hA(0), hA(1), hA(2))
    val shifted = Seq((1L, clip(hA)), (9L, clip(hShift)))
      .toDF("media_id", "bytes")
    assert(Multimodal.videoNearDupPairs(shifted, minCloseFrames = 3)
      .count() === 0L)
  }

  test("distributed decode: every synthetic WAV parses, none quarantined") {
    val docs = Tables.documents(spark, sf0001)
    val wav = Multimodal.syntheticWav(docs)
    val decoded = Multimodal.decodeWavMeta(wav)
    assert(decoded.count() === docs.count())
    // spot-check one row against the generator arithmetic
    val r = decoded.filter(col("media_id") === 7L).head()
    assert(r.sample_rate == 8000 + (7 % 4) * 4000 && r.channels == 1 + 7 % 2)
    assert(r.n_samples == 50 + 7 % 100)
  }

  test("crafted overflow headers quarantine in the pixel decoders, never throw") {
    // BMP: width 0x55555556 makes (w*3+3)/4*4 Int-overflow to a small
    // positive stride — the Long-math bound + pixel cap must reject it
    // BEFORE any allocation (round-10 ADVICE)
    val bmp = Multimodal.bmpBytes(16, 9)
    val evil = bmp.clone()
    val bb = java.nio.ByteBuffer.wrap(evil)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 0x55555556) // width
    bb.putInt(22, 1) // height
    assert(Multimodal.parseBmpGray(evil) === None)
    bb.putInt(22, Int.MinValue) // |height| still negative
    assert(Multimodal.parseBmpGray(evil) === None)
    // ODD width + Int.MinValue height: the Long bounds check does NOT
    // fire (both products negative), so only parseBmp's height <= 0
    // reject stands between the header and a negative-Int allocation —
    // the confirmed NegativeArraySizeException repro from self-review
    val evil3 = bmp.clone()
    val bb3 = java.nio.ByteBuffer.wrap(evil3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb3.putInt(18, 17)
    bb3.putInt(22, Int.MinValue)
    assert(Multimodal.parseBmp(9L, evil3) === None)
    assert(Multimodal.parseBmpGray(evil3) === None)
    // huge-but-individually-plausible dims past the pixel cap
    val evil2 = bmp.clone()
    val bb2 = java.nio.ByteBuffer.wrap(evil2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putInt(18, 100000); bb2.putInt(22, 100000)
    assert(Multimodal.parseBmpGray(evil2) === None)
    // AVI: same class via an unvalidated strf header — size check used
    // to Int-overflow negative and pass; the clip must quarantine whole
    val avi = Multimodal.aviBytes(72, 64,
      Seq(Multimodal.dibFrameWithDhash(0L)))
    def corruptStrf(w: Int, h: Int): Array[Byte] = {
      val c = avi.clone()
      // strf BITMAPINFOHEADER starts right after the 'strf'+size tags;
      // find it by scanning for the tag (fixed layout in aviBytes)
      val idx = c.indexOfSlice("strf".getBytes("US-ASCII"))
      val cb = java.nio.ByteBuffer.wrap(c)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      cb.putInt(idx + 12, w) // biWidth
      cb.putInt(idx + 16, h) // biHeight
      c
    }
    assert(Multimodal.parseAviGray(corruptStrf(0x55555556, 1)) === None)
    assert(Multimodal.parseAviGray(corruptStrf(0x55555556, -2)) === None)
    assert(Multimodal.parseAviGray(corruptStrf(100000, 100000)) === None)
    assert(Multimodal.parseAviGray(corruptStrf(72, Int.MinValue)) === None)
    // and the distributed kernels survive a poisoned row alongside good ones
    import spark.implicits._
    val mixed = Seq((1L, Multimodal.bmpWithDhash(7L)), (2L, evil))
      .toDF("media_id", "bytes")
    assert(Multimodal.bmpDhash(mixed).count() === 1L)
  }

  test("videoNearDupPairs enforces its id-packing contract loudly") {
    import spark.implicits._
    def clip(hs: Seq[Long]) =
      Multimodal.aviBytes(72, 64, hs.map(Multimodal.dibFrameWithDhash))
    val good = clip((0 until 4).map(f => Multimodal.mix64(50L + f)))
    // a negative id would silently alias into another video's key space
    // — the packed-key guard must fail the job with the named error
    val negative = Seq((-1L, good), (2L, good)).toDF("media_id", "bytes")
    val eNeg = intercept[Exception] {
      Multimodal.videoNearDupPairs(negative).collect()
    }
    assert(eNeg.getMessage != null &&
      eNeg.getMessage.contains("id-packing contract"),
      s"wrong error: ${eNeg.getMessage}")
    // a clip longer than maxFrames aliases its tail frames: loud too
    val long = Seq((1L, clip((0 until 5).map(f => Multimodal.mix64(60L + f)))))
      .toDF("media_id", "bytes")
    val eLong = intercept[Exception] {
      Multimodal.videoNearDupPairs(long, maxFrames = 4).collect()
    }
    assert(eLong.getMessage != null &&
      eLong.getMessage.contains("id-packing contract"),
      s"wrong error: ${eLong.getMessage}")
    // ids at the contract edge still work
    val maxOkId = Long.MaxValue / (1 << 16) - 1
    val edge = Seq((maxOkId, good), (maxOkId - 1, good))
      .toDF("media_id", "bytes")
    assert(Multimodal.videoNearDupPairs(edge, minCloseFrames = 3)
      .count() === 1L)
  }

  test("alignment-free video matching pairs shifted clips; padding cannot fake a pair") {
    import spark.implicits._
    def clip(hs: Seq[Long]) =
      Multimodal.aviBytes(72, 64, hs.map(Multimodal.dibFrameWithDhash))
    val hA = (0 until 4).map(f => Multimodal.mix64(300L + f))
    // B = A shifted one slot (trim+prepend) with one frame within hamming 2
    val hShift = Seq(Multimodal.mix64(998L), hA(0), hA(1) ^ 3L, hA(2))
    // C repeats ONE of A's frames 4 times — a static-scene pad; counting
    // matched PAIRS would score 4, the distinct-min rollup scores 1
    val hPad = Seq(hA(3), hA(3), hA(3), hA(3))
    val clips = Seq((1L, clip(hA)), (2L, clip(hShift)), (3L, clip(hPad)))
      .toDF("media_id", "bytes")
    // the aligned mode misses the shifted copy by construction...
    assert(Multimodal.videoNearDupPairs(clips, minCloseFrames = 3)
      .count() === 0L)
    // ...the alignment-free mode finds exactly it, and the padded clip
    // stays out (min(distinct-a, distinct-b) = 1 < 3)
    val pairs = Multimodal.videoNearDupPairsShifted(clips, minCloseFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 3L)))
  }

  test("decodeImageMeta reads dims from headers; quarantines junk") {
    import spark.implicits._
    val m1 = Multimodal.parseImageMeta(1L, Multimodal.encodedImage(33, 21, "png")).get
    assert((m1.format, m1.width, m1.height, m1.n_pixels) === ("png", 33, 21, 693L))
    val m2 = Multimodal.parseImageMeta(2L, Multimodal.encodedImage(64, 48, "jpg")).get
    assert((m2.format, m2.width, m2.height) === ("jpeg", 64, 48))
    // the hand-rolled BMP encoder's output reads through the same path
    val m3 = Multimodal.parseImageMeta(3L, Multimodal.bmpBytes(16, 9)).get
    assert((m3.format, m3.width, m3.height) === ("bmp", 16, 9))
    assert(Multimodal.parseImageMeta(4L, Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.parseImageMeta(5L, null) === None)
    // distributed: junk rows drop, good rows keep exact dims
    val media = Seq(
      (1L, Multimodal.encodedImage(20, 10, "png")),
      (2L, Array[Byte](9, 9))).toDF("media_id", "bytes")
    val got = Multimodal.decodeImageMeta(media).collect()
    assert(got.length === 1 && got.head.width === 20 && got.head.height === 10)
  }

  test("resizeImages: integer box-average keeps exact dHash, floors dims, passes small images through") {
    import spark.implicits._
    val t = Multimodal.mix64(77L)
    // 72×64 construct → 36×32: every resized pixel is its uniform cell's
    // exact value, so the dHash survives the full decode → resize →
    // re-encode → decode chain bit-for-bit
    val (outBytes, tw, th) =
      Multimodal.resizeOneImage(Multimodal.imageWithDhash(t, "png"), 36).get
    assert((tw, th) === (36, 32))
    val (w2, h2, gray2) = Multimodal.parseImageGray(outBytes).get
    assert((w2, h2) === (36, 32))
    assert(Multimodal.dhashOfGray(w2, h2, gray2) === t)
    // non-multiple dims floor like resizePlan's column math
    val bmp = Multimodal.bmpBytes(33, 21)
    val (_, rw, rh) = Multimodal.resizeOneImage(bmp, 16).get
    assert((rw, rh) === (16, 21 * 16 / 33))
    // already-small images pass through with UNCHANGED bytes
    val small = Multimodal.imageWithDhash(t, "png")
    val (same, sw, sh) = Multimodal.resizeOneImage(small, 100).get
    assert(same eq small)
    assert((sw, sh) === (72, 64))
    // junk quarantines NON-DESTRUCTIVELY (round-11 verdict item 4): the
    // output IS the replacement corpus, so the row SURVIVES with its
    // ORIGINAL bytes and NULL dims — cardinality preserved, loss
    // observable, never a silently deleted document
    assert(Multimodal.resizeOneImage(Array[Byte](1, 2, 3), 36) === None)
    val junkBytes = Array[Byte](7, 7, 7)
    val media = Seq(
      (1L, Multimodal.imageWithDhash(t, "png")),
      (2L, Multimodal.imageWithDhash(t, "jpg")),
      (3L, junkBytes))
      .toDF("media_id", "bytes")
    val resized = Multimodal.resizeImages(media, maxSide = 36).collect()
    assert(resized.length === 3, "quarantine must preserve cardinality")
    val byId = resized.map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      assert(byId(id).getInt(2) === 36 && byId(id).getInt(3) === 32)
    }
    assert(byId(3L).isNullAt(2) && byId(3L).isNullAt(3),
      "NULL dims must flag the quarantined row")
    assert(byId(3L).getAs[Array[Byte]](1).toSeq === junkBytes.toSeq,
      "quarantined bytes must pass through unchanged")
  }

  /** A spec-valid PNG whose IHDR header DECLARES `w`×`h` but carries no
    * pixel data: the adversarial shape whose decode would allocate the
    * full raster — the header gate must reject it before ImageIO.read. */
  private def hugeHeaderPng(w: Int, h: Int): Array[Byte] = {
    val ihdrBody = java.nio.ByteBuffer.allocate(17)
    ihdrBody.put("IHDR".getBytes("US-ASCII"))
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte) // bit depth 8, truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32()
    crc.update(ihdrBody.array())
    val out = java.nio.ByteBuffer.allocate(8 + 4 + 17 + 4)
    out.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
      .putInt(13).put(ihdrBody.array()).putInt(crc.getValue.toInt)
    out.array()
  }

  test("header-declared huge dims quarantine BEFORE ImageIO decode allocates") {
    // round-11 ADVICE (high): ImageIO.read of a 60000×60000 header would
    // allocate the ~14 GB raster DURING decode and die with an
    // OutOfMemoryError that NonFatal does not catch — the cap must run
    // on header fields alone, like the BMP/AVI walkers
    val evil = hugeHeaderPng(60000, 60000)
    // the header parse itself sees the declared dims...
    assert(Multimodal.imageHeaderDims(evil) === Some((60000, 60000)))
    // ...and every pixel path quarantines on them without decoding
    assert(Multimodal.parseImageGray(evil) === None)
    assert(Multimodal.resizeOneImage(evil, 36) === None)
    // a sane header still decodes through the same gate
    val ok = Multimodal.imageWithDhash(Multimodal.mix64(3L), "png")
    assert(Multimodal.imageHeaderDims(ok) === Some((72, 64)))
    assert(Multimodal.parseImageGray(ok).isDefined)
    // resizeImages passes the poisoned row through, quarantined
    import spark.implicits._
    val media = Seq((1L, ok), (2L, evil)).toDF("media_id", "bytes")
    val out = Multimodal.resizeImages(media, maxSide = 36).collect()
      .map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(out === Map(1L -> false, 2L -> true))
  }

  test("ImageIO decode: PNG lossless and JPEG MCU-aligned constructs keep their exact dHash") {
    import spark.implicits._
    val targets = Seq(0L, -1L, 0x123456789ABCDEFL,
      Multimodal.mix64(11L), Multimodal.mix64(23L))
    for (fmt <- Seq("png", "jpg")) {
      targets.foreach { t =>
        val bytes = Multimodal.imageWithDhash(t, fmt)
        val (w, h, gray) = Multimodal.parseImageGray(bytes).get
        assert((w, h) === (72, 64))
        assert(Multimodal.dhashOfGray(w, h, gray) === t,
          s"$fmt round-trip broke dHash for target $t")
      }
    }
    // ImageIO also reads the hand-rolled BMP encoder's output, and both
    // decode paths agree bit-for-bit on the same bytes
    val bmp = Multimodal.bmpWithDhash(Multimodal.mix64(5L))
    val viaImageIO = Multimodal.parseImageGray(bmp).get
    val viaWalker = Multimodal.parseBmpGray(bmp).get
    assert(viaImageIO._3.toSeq === viaWalker._3.toSeq)
    // distributed kernel: mixed-format corpus, one dHash column out
    val media = Seq(
      (1L, Multimodal.imageWithDhash(Multimodal.mix64(1L), "png")),
      (2L, Multimodal.imageWithDhash(Multimodal.mix64(1L) ^ 5L, "jpg")),
      (3L, Multimodal.bmpWithDhash(Multimodal.mix64(99L))),
      (4L, Array[Byte](9, 9, 9))) // junk quarantines
      .toDF("media_id", "bytes")
    val hashes = Multimodal.imageDhash(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.size === 3)
    assert(hashes(1L) === Multimodal.mix64(1L))
    assert(hashes(2L) === (Multimodal.mix64(1L) ^ 5L))
    // cross-format near-dedup: the PNG and its 2-bit-off JPEG cluster;
    // min-id representative survives
    val kept = Multimodal.dropNearDupImages(media)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L))
  }

  test("extractFeatures pools REAL decoded pixels/samples; stub only for undecodable kinds") {
    import spark.implicits._
    // image: constant-gray PNG → every grid-cell mean IS that gray
    def flatPng(v: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach(x =>
        img.setRGB(x, y, (v << 16) | (v << 8) | v)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // audio: constant-amplitude mono PCM-16 → every window energy = amp
    def flatWav(amp: Short, n: Int): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(8000)
        .putInt(16000).putShort(2).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(n * 2)
      (0 until n).foreach(i =>
        buf.putShort(if (i % 2 == 0) amp else (-amp).toShort): Unit)
      buf.array()
    }
    // video: uniform-brightness DIB frames → per-frame mean = brightness
    def flatAvi(vals: Seq[Int]): Array[Byte] = {
      val stride = (16 * 3 + 3) / 4 * 4
      Multimodal.aviBytes(16, 16,
        vals.map(v => Array.fill[Byte](stride * 16)(v.toByte)))
    }
    val media = Seq(
      (1L, "image", flatPng(100)),
      (2L, "audio", flatWav(500, 4 * 1600)),
      (3L, "video", flatAvi(Seq(30, 90))),
      (4L, "text", "hello".getBytes("UTF-8")), // no decoder → stub
      (5L, "image", Array[Byte](1, 2, 3))) // undecodable → stub fallback
      .toDF("media_id", "kind", "bytes")
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(feats(1L) === Seq.fill(16)(100.0f),
      "constant image must pool to its gray in every grid cell")
    assert(feats(2L) === Seq.fill(16)(500.0f),
      "constant-amplitude audio must pool to |amp| in every window")
    assert(feats(3L).take(2) === Seq(30.0f, 90.0f) &&
      feats(3L).drop(2) === Seq.fill(14)(0.0f),
      "video features are per-frame mean grays, zero-padded")
    // the stub fallback is the documented byte-window hash, unchanged
    def stub(bytes: Array[Byte]): Seq[Float] = {
      val f = new Array[Float](16)
      bytes.indices.foreach(i => f(i % 16) += (bytes(i) & 0xFF) * 0.001f)
      f.toSeq
    }
    assert(feats(4L) === stub("hello".getBytes("UTF-8")))
    assert(feats(5L) === stub(Array[Byte](1, 2, 3)),
      "undecodable media bytes fall back to the stub, never throw")
  }

  test("windowed audio fingerprints roundtrip; shifted mode pairs trimmed clips where the aligned mode scores zero") {
    import spark.implicits._
    // multi-window construct: each window's LOCAL fingerprint is exactly
    // its target, and the one-target clip IS wavWithFingerprint
    val ts = Seq(Multimodal.mix64(1L), Multimodal.mix64(2L),
      Multimodal.mix64(3L), 0L)
    assert(Multimodal.wavWithWindowFingerprints(Seq(ts.head)).toSeq ===
      Multimodal.wavWithFingerprint(ts.head).toSeq,
      "single-window generator must be byte-identical to wavWithFingerprint")
    val clip = Multimodal.wavWithWindowFingerprints(ts)
    val wfps = Multimodal.wavWindowFingerprints(
        Seq((9L, clip)).toDF("media_id", "bytes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(wfps === ts.zipWithIndex.map { case (t, i) => (9L, i, t) }.toSet)
    // trimmed copy: drop last window, prepend junk, 2-bit flip in one
    // carried window — the q202 edit class, audio edition
    val hA = (0 until 4).map(f => Multimodal.mix64(400L + f))
    val hShift = Seq(Multimodal.mix64(888L), hA(0), hA(1) ^ 3L, hA(2))
    // padding control: one window of A looped 4× — two-sided distinct
    // rollup scores min(1, 4) = 1, not 4
    val hPad = Seq(hA(3), hA(3), hA(3), hA(3))
    val clips = Seq(
      (1L, Multimodal.wavWithWindowFingerprints(hA)),
      (2L, Multimodal.wavWithWindowFingerprints(hShift)),
      (3L, Multimodal.wavWithWindowFingerprints(hPad)))
      .toDF("media_id", "bytes")
    // the aligned whole-clip mode misses the trim BY CONSTRUCTION
    // (every one of its 65 window boundaries shifted)...
    val aligned = graft.operators.Dedup.hammingBandedPairs(
      Multimodal.wavFingerprint(clips), "media_id", "afp",
      maxHamming = 6, bands = 8)
    assert(aligned.count() === 0L, "aligned mode must score recall 0 here")
    // ...the shifted mode finds exactly the trimmed pair, and padding
    // cannot fake one
    val pairs = Multimodal.audioNearDupPairsShifted(clips,
        minCloseWindows = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 3L)))
    // junk and sub-window clips quarantine
    val junk = Seq((7L, Array[Byte](1, 2, 3)),
      (8L, Multimodal.wavBytes(8000, 1, 16, 100))) // < one window
      .toDF("media_id", "bytes")
    assert(Multimodal.wavWindowFingerprints(junk).count() === 0L)
  }

  test("overlapped windows pair arbitrary-offset trims where the non-overlapping mode scores zero") {
    import spark.implicits._
    // round-12 verdict item 3: q205 catches WINDOW-multiple trims only;
    // the commonest edit (trim a little off the front) shifts
    // within-window content and defeats it. Overlapping windows
    // (stride = W/2) align any HALF-window-multiple trim exactly.
    val W = 65 * 64
    def clip(seed: Long) = Multimodal.wavWithWindowFingerprints(
      (0 until 4).map(f => Multimodal.mix64(seed + f)))
    val a = clip(500L)
    val b = clip(600L)
    // overlapped fingerprints: 7 windows on a 4-window clip, with the
    // even-indexed ones (offsets 0, W, 2W, 3W) equal to the constructs
    val over = Multimodal.wavWindowFingerprints(
        Seq((9L, a)).toDF("media_id", "bytes"), strideSamples = W / 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toMap
    assert(over.size === 7)
    (0 until 4).foreach(f =>
      assert(over(2 * f) === Multimodal.mix64(500L + f),
        "even overlapped windows must reproduce the aligned fingerprints"))
    val clips = Seq(
      (1L, a), (2L, Multimodal.wavTrimmed(a, W / 2)), // half-window trim
      (3L, b), (4L, Multimodal.wavTrimmed(b, 3 * W / 2)), // 1.5-window trim
      (5L, clip(700L))) // unrelated singleton
      .toDF("media_id", "bytes")
    // q205's non-overlapping mode misses both trims BY CONSTRUCTION
    // (within-window content shifted by half a window)...
    assert(Multimodal.audioNearDupPairsShifted(clips, minCloseWindows = 3)
      .count() === 0L,
      "non-overlapping mode must score recall 0 on half-window trims")
    // ...the overlapped mode recovers both exactly: base has 7 windows,
    // the W/2-trimmed copy 6 (all aligned), the 3W/2-trimmed copy 4
    val pairs = Multimodal.audioNearDupPairsShifted(clips,
        minCloseWindows = 3, strideSamples = W / 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 6L), (3L, 4L, 4L)))
    // stride contract is loud: a stride above the window length would
    // silently skip samples
    intercept[IllegalArgumentException] {
      Multimodal.wavWindowFingerprints(clips, strideSamples = W + 1)
    }
  }

  test("sub-stride trims: halving the stride trades rows for recall (W/4 trim: stride W/2 misses, stride W/4 recovers)") {
    import spark.implicits._
    // round-13 verdict item 5: offsets strictly inside (0, stride)
    // degrade to Hamming tolerance BY DESIGN — the recovery dial is the
    // stride itself. Measured with numbers, not prose: a planted W/4
    // front trim scores recall 0 at stride W/2 and recall 1 at stride
    // W/4, at the documented cost of windowSamples/stride × fingerprint
    // rows into the banded pass (7 → 13 windows on the same 4-window
    // clip).
    val W = 65 * 64
    def clip(seed: Long) = Multimodal.wavWithWindowFingerprints(
      (0 until 4).map(f => Multimodal.mix64(seed + f)))
    val a = clip(800L)
    val clips = Seq(
      (1L, a), (2L, Multimodal.wavTrimmed(a, W / 4)), // quarter-window trim
      (3L, clip(900L))) // unrelated singleton
      .toDF("media_id", "bytes")
    // the rows half of the dial, stamped: 2× overlap → 7 windows,
    // 4× overlap → 13 windows on the same clip
    val base = Seq((9L, a)).toDF("media_id", "bytes")
    assert(Multimodal.wavWindowFingerprints(base,
      strideSamples = W / 2).count() === 7L)
    assert(Multimodal.wavWindowFingerprints(base,
      strideSamples = W / 4).count() === 13L)
    // stride W/2: the W/4 trim shifts within-window content on EVERY
    // overlapped window — recall 0 by design (the q207 mode's bound)
    assert(Multimodal.audioNearDupPairsShifted(clips, minCloseWindows = 3,
      strideSamples = W / 2).count() === 0L,
      "a sub-stride trim must defeat the W/2 stride by design")
    // stride W/4: every trimmed window re-aligns with a base window —
    // the pair is recovered with all least(13, 12) = 12 windows matched
    val pairs = Multimodal.audioNearDupPairsShifted(clips,
        minCloseWindows = 3, strideSamples = W / 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 12L)))
  }

  test("MJPEG AVI: JPEG frame chunks decode through ImageIO; unknown codecs quarantine") {
    import spark.implicits._
    // MCU-aligned constructs survive JPEG's lossy round-trip bit-exactly
    // (the q201 argument), so the full container → JPEG → dHash chain
    // recovers every frame target
    val ts = Seq(Multimodal.mix64(21L), Multimodal.mix64(22L), 0L)
    val avi = Multimodal.aviMjpegBytes(72, 64,
      ts.map(t => Multimodal.imageWithDhash(t, "jpg")))
    val (w, h, frames) = Multimodal.parseAviGray(avi).get
    assert((w, h, frames.size) === (72, 64, 3))
    frames.zip(ts).foreach { case (gray, t) =>
      assert(Multimodal.dhashOfGray(72, 64, gray) === t)
    }
    // a frame whose decoded dims disagree with the stream header is
    // corrupt → the whole clip quarantines (loud absence, not wrong dims)
    val mismatched = Multimodal.aviMjpegBytes(72, 64,
      Seq(Multimodal.encodedImage(16, 16, "jpg")))
    assert(Multimodal.parseAviGray(mismatched) === None)
    // an unknown codec fourcc (no JDK decoder) quarantines too
    val h264 = avi.clone()
    val strfAt = h264.indexOfSlice("strf".getBytes("US-ASCII"))
    "H264".getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) =>
      h264(strfAt + 8 + 16 + i) = b } // biCompression field
    assert(Multimodal.parseAviGray(h264) === None)
    // end-to-end: the aligned near-dup recipe runs on the codec format —
    // clip B carries 3 of A's 4 frames (one within hamming 2)
    def clip(hs: Seq[Long]) = Multimodal.aviMjpegBytes(72, 64,
      hs.map(t => Multimodal.imageWithDhash(t, "jpg")))
    val hA = (0 until 4).map(f => Multimodal.mix64(500L + f))
    val hB = Seq(hA(0), hA(1) ^ 3L, hA(2), Multimodal.mix64(654L))
    val clips = Seq((1L, clip(hA)), (2L, clip(hB)))
      .toDF("media_id", "bytes")
    val pairs = Multimodal.videoNearDupPairs(clips, minCloseFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 3L)))
  }

  test("FrameDecoder seam: a plugged fake codec matches the built-in DIB path bit-for-bit; contracts stay loud") {
    import spark.implicits._
    // 12x8 gray frames; DIB twin: 24bpp bottom-up, BGR = (g,g,g) so the
    // built-in decode recovers exactly the same gray values
    val w = 12; val h = 8; val stride = (w * 3 + 3) / 4 * 4
    def dib(gray: Array[Int]): Array[Byte] = {
      val out = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        val off = (h - 1 - y) * stride + x * 3
        val g = gray(y * w + x).toByte
        out(off) = g; out(off + 1) = g; out(off + 2) = g
      }
      out
    }
    val gA = Array.tabulate(w * h)(i => (i * 7 + 3) % 256)
    val gB = Array.tabulate(w * h)(i => (i * 13 + 1) % 256)
    val aviDib = Multimodal.aviBytes(w, h, Seq(dib(gA), dib(gB)))
    val aviFake = Multimodal.aviCodecBytes(w, h, "H264",
      Seq(gA.map(_.toByte), gB.map(_.toByte)))
    // MJPG generalization is byte-identical through the shared builder
    val jf = Seq(Multimodal.imageWithDhash(Multimodal.mix64(31L), "jpg"))
    assert(Multimodal.aviMjpegBytes(72, 64, jf).toSeq ===
      Multimodal.aviCodecBytes(72, 64, "MJPG", jf).toSeq)
    // without a plugged decoder the unknown codec quarantines (the
    // pre-seam behavior, unchanged)
    val fakeDf = Seq((1L, aviFake)).toDF("media_id", "bytes")
    assert(Multimodal.aviFrameDhashes(fakeDf).count() === 0L)
    // with the fake codec plugged, the full container walk -> header
    // gate -> decode -> dHash chain produces EXACTLY the built-in DIB
    // path's rows on the same gray content
    val viaFake = Multimodal.aviFrameDhashes(fakeDf,
        decoders = Seq(new FakeGrayCodec("H264"))).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    val viaDib = Multimodal.aviFrameDhashes(
        Seq((1L, aviDib)).toDF("media_id", "bytes")).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(viaFake === viaDib && viaFake.size === 2,
      "plugged decoder must be indistinguishable from the built-in path " +
        "on identical gray content")
    // a corrupt frame (wrong payload size -> decoder None) quarantines
    // the clip — the engine-wide loud-absence contract
    val corrupt = Multimodal.aviCodecBytes(w, h,
      "H264", Seq(gA.map(_.toByte), Array[Byte](1, 2, 3)))
    assert(Multimodal.aviFrameDhashes(Seq((2L, corrupt))
        .toDF("media_id", "bytes"),
      decoders = Seq(new FakeGrayCodec("H264"))).count() === 0L)
    // a MISBEHAVING decoder (wrong-length Some) also quarantines rather
    // than corrupting downstream frames
    assert(Multimodal.aviFrameDhashes(fakeDf,
      decoders = Seq(new WrongLengthCodec("H264"))).count() === 0L)
    // the header gate still fronts the plugged decoder: an
    // over-MaxDecodePixels header quarantines before any decode
    val huge = {
      val b = Multimodal.aviCodecBytes(w, h, "H264", Seq(gA.map(_.toByte)))
      // patch strf biWidth/biHeight to 60000x60000 (strf payload starts
      // after the fixed 12+8+64+12+8+64... find it by scanning for 'strf')
      val i = b.indexOfSlice("strf".getBytes("US-ASCII"))
      val buf = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putInt(i + 12, 60000); buf.putInt(i + 16, 60000)
      b
    }
    assert(Multimodal.aviFrameDhashes(Seq((3L, huge))
        .toDF("media_id", "bytes"),
      decoders = Seq(new FakeGrayCodec("H264"))).count() === 0L,
      "the MaxDecodePixels header gate must front plugged decoders too")
  }

  test("MediaEmbedder seam: plugged embeddings cover the stub leg only; wrong-length embeddings fail loudly") {
    import spark.implicits._
    // constant-gray PNG: the REAL pooled path, which the embedder must
    // never override
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      img.setRGB(x, y, (100 << 16) | (100 << 8) | 100)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      (1L, "image", bos.toByteArray), // real decode -> pooled, not embedded
      (2L, "text", "hello".getBytes("UTF-8")), // embedder covers
      (3L, "blob", Array[Byte](7, 8))) // embedder declines -> stub
      .toDF("media_id", "kind", "bytes")
    val feats = Multimodal.extractFeatures(media, dim = 16,
        embedder = Some(new FakeTextEmbedder)).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(feats(1L) === Seq.fill(16)(100.0f),
      "a successful decode leg must win over the embedder")
    assert(feats(2L) === (0 until 16).map(i => (i + 5).toFloat),
      "the embedder must cover the former stub leg for its kinds")
    val stub3 = {
      val b = Array[Byte](7, 8)
      val f = new Array[Float](16)
      b.indices.foreach(i => f(i % 16) += (b(i) & 0xFF) * 0.001f)
      f.toSeq
    }
    assert(feats(3L) === stub3,
      "an embedder that declines falls through to the deterministic stub")
    // wrong-length embedding: loud in-task failure, never truncation
    val e = intercept[Throwable] {
      Multimodal.extractFeatures(media, dim = 16,
        embedder = Some(new WrongDimEmbedder)).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("contract is exactly dim")))
  }
}

/** Identity "codec" for the [[graft.operators.FrameDecoder]] seam spec:
  * each frame chunk IS the raw w*h gray bytes. Top-level (not nested in
  * the suite) so the closure serializes without dragging the suite in —
  * exactly the constraint a real JNI decoder wrapper lives under. */
private class FakeGrayCodec(override val fourcc: String)
    extends graft.operators.FrameDecoder {
  def decodeGray(w: Int, h: Int, fb: Array[Byte]): Option[Array[Int]] =
    if (fb != null && fb.length == w * h) Some(fb.map(_ & 0xFF)) else None
}

/** Misbehaving decoder: always returns a wrong-length frame. */
private class WrongLengthCodec(override val fourcc: String)
    extends graft.operators.FrameDecoder {
  def decodeGray(w: Int, h: Int, fb: Array[Byte]): Option[Array[Int]] =
    Some(Array(1, 2, 3))
}

/** Fake learned embedder: deterministic floats for kind "text", declines
  * everything else. */
private class FakeTextEmbedder extends graft.operators.MediaEmbedder {
  def embed(kind: String, bytes: Array[Byte],
      dim: Int): Option[Array[Float]] =
    if (kind == "text")
      Some(Array.tabulate(dim)(i =>
        (i + (if (bytes == null) 0 else bytes.length)).toFloat))
    else None
}

/** Contract violator: returns dim-1 floats. */
private class WrongDimEmbedder extends graft.operators.MediaEmbedder {
  def embed(kind: String, bytes: Array[Byte],
      dim: Int): Option[Array[Float]] =
    Some(new Array[Float](dim - 1))
}
