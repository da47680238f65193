package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {

  test("feature extraction: deterministic, right shapes, per-kind semantics") {
    val media = Multimodal.syntheticMedia(spark, 60)
    val codec = new StubCodec(32)
    val feats = Multimodal.extractFeatures(media, codec).collect()
    assert(feats.length == 60)
    assert(feats.forall(_.features.length == 32))
    assert(feats.filter(_.kind == "video").forall(_.frames_sampled >= 1))
    assert(feats.filter(_.kind != "video").forall(_.frames_sampled == 1))
    assert(feats.forall(f => f.out_width <= 224 && f.out_height <= 224))
    // determinism across runs
    val again = Multimodal.extractFeatures(media, codec).collect()
      .map(f => f.media_id -> f.checksum).toMap
    assert(feats.forall(f => again(f.media_id) == f.checksum))
  }

  test("resize bookkeeping preserves aspect ratio") {
    assert(Multimodal.resizeDims(640, 480) == ((224, 168)))
    assert(Multimodal.resizeDims(480, 640) == ((168, 224)))
    assert(Multimodal.resizeDims(0, 0) == ((224, 224)))
  }

  test("frame sampling matches duration * fps") {
    assert(Multimodal.framesToSample(10000, 1.0) == 10)
    assert(Multimodal.framesToSample(500, 1.0) == 1)
    assert(Multimodal.framesToSample(4000, 2.5) == 10)
  }

  test("stub codec features are a normalized byte histogram") {
    val codec = new StubCodec(8)
    val f = codec.decodeFeatures(Array[Byte](0, 8, 16, 24), "image")
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(f(0) == 1.0f) // all bytes fold to bucket 0 (mod 8)
  }

  test("imageio: PNG round-trip decodes exact closed-form pixels") {
    val metas = Multimodal.decodeImageMeta(Multimodal.syntheticPngMedia(spark, 50))
      .collect().map(m => m.media_id -> m).toMap
    assert(metas.size == 50)
    metas.values.foreach { m =>
      assert(m.decode_ok)
      val w = 8 + (m.media_id % 16).toInt
      val h = 8 + ((3 * m.media_id) % 16).toInt
      assert(m.width == w && m.height == h && m.n_px == w.toLong * h)
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield ((7 * x + 13 * y + m.media_id) % 256)).sum
      assert(m.px_sum == expected, s"pixel sum mismatch for id ${m.media_id}")
    }
  }

  test("imageio codec: real luminance histogram from PNG; corrupt bytes are data, not errors") {
    val codec = new ImageIoCodec(64)
    // 4x4 all-gray-128 PNG: every pixel lands in bin 128*64/256 = 32
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 4).foreach(y => (0 until 4).foreach(x =>
      img.getRaster.setSample(x, y, 0, 128)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val f = codec.decodeFeatures(out.toByteArray, "image")
    assert(f(32) == 1.0f && f.sum == 1.0f)
    // JPEG: lossy pixels but REAL decoded dimensions
    val jout = new java.io.ByteArrayOutputStream()
    val rgb = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(javax.imageio.ImageIO.write(rgb, "jpg", jout))
    val jimg = Multimodal.decodeImage(jout.toByteArray)
    assert(jimg.exists(i => i.getWidth == 17 && i.getHeight == 9))
    // corrupt payload: zero vector, no exception
    val bad = codec.decodeFeatures(Array[Byte](1, 2, 3, 4), "image")
    assert(bad.forall(_ == 0.0f))
    // non-image kinds route to the stub fallback (pipeline stays total)
    val audio = codec.decodeFeatures(Array[Byte](0, 0, 0), "audio")
    assert(math.abs(audio.sum - 1.0f) < 1e-6)
  }

  test("imageio codec: PLUGIN-DISCOVERED second codecs (GIF/BMP/TIFF) decode through the same seam") {
    // the MediaCodec seam is format-blind by design: ImageIO dispatches on
    // the payload's magic bytes, so every reader plugin the runtime ships
    // is a REAL additional codec with zero new code. Probe the installed
    // plugins and drive each lossless-capable one end-to-end against the
    // PNG-decoded truth; formats absent from this JDK (webp, jpeg2000)
    // are documented by the probe rather than silently skipped.
    val installed = javax.imageio.ImageIO.getWriterFormatNames
      .map(_.toLowerCase).toSet
    assert(Set("png", "jpg").subsetOf(installed), "baseline plugins missing")
    val codec = new ImageIoCodec(64)
    // a 16x16 grayscale gradient: <=256 distinct values, so every
    // lossless/palette format round-trips the exact pixels
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)))
    def enc(fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
      out.toByteArray
    }
    val truth = codec.decodeFeatures(enc("png"), "image")
    assert(truth.sum > 0.99f && truth.sum < 1.01f)
    val lossless = Seq("gif", "bmp", "tiff").filter(installed.contains)
    assert(lossless.nonEmpty, "JDK 11+ ships GIF/BMP/TIFF readers")
    lossless.foreach { fmt =>
      val bytes = enc(fmt)
      assert(!java.util.Arrays.equals(bytes, enc("png")),
        s"$fmt must be a distinct encoding, not a PNG alias")
      assert(codec.decodeFeatures(bytes, "image").toSeq === truth.toSeq,
        s"$fmt decode drifted from the PNG-decoded pixel truth")
    }
    // the environment limit, probed not assumed: no webp/jp2 plugin here;
    // if a deployment adds one (e.g. TwelveMonkeys on the classpath) the
    // same seam serves it with no code change
    Seq("webp", "jp2").foreach { fmt =>
      if (installed.contains(fmt))
        assert(Multimodal.decodeImage(enc(fmt)).nonEmpty,
          s"installed $fmt plugin must decode")
      else
        assert(Multimodal.decodeImage(
          Array[Byte](0x52, 0x49, 0x46, 0x46, 0, 0, 0, 0)).isEmpty,
          s"absent $fmt reader must yield None (data, not error)")
    }
    import spark.implicits._
    // decodeImage NORMALIZES, so every decode site shares the contract:
    // a palette GIF through the meta and aHash walks (these read RGB
    // bands — they crashed on the 1-band index raster before the shared
    // fix) and through the codec all agree with the PNG truth
    val gifMedia = Seq(Multimodal.MediaFile(70L, "image", enc("gif"),
      16, 16, 0L, "image/gif")).toDS()
    val gifMeta = Multimodal.decodeImageMeta(gifMedia).collect().head
    assert(gifMeta.decode_ok && gifMeta.width == 16 && gifMeta.height == 16)
    val pngMeta = Multimodal.decodeImageMeta(Seq(Multimodal.MediaFile(
      71L, "image", enc("png"), 16, 16, 0L, "image/png")).toDS())
      .collect().head
    assert(gifMeta.px_sum == pngMeta.px_sum,
      "palette expansion must reproduce the gray pixel sums")
    val gifHash = Multimodal.imageAHash(gifMedia).collect().head
    assert(gifHash.decode_ok, "aHash must decode palette images")
    // 16-bit depth: samples up to 65535 would index the 64-bin histogram
    // out of bounds — the normalization folds deep images to 8-bit RGB
    val deep = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    (0 until 8).foreach(y => (0 until 8).foreach(x =>
      deep.getRaster.setSample(x, y, 0, 65535)))
    val dout = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(deep, "png", dout), "16-bit png writer")
    val df16 = codec.decodeFeatures(dout.toByteArray, "image")
    assert(df16(63) == 1.0f,
      "all-white 16-bit image lands whole mass in the top 8-bit bin")
  }

  test("imageio codec swaps into extractFeatures where media bytes are real PNGs") {
    val media = Multimodal.syntheticPngMedia(spark, 12)
    val feats = Multimodal.extractFeatures(media, new ImageIoCodec(64)).collect()
    assert(feats.length == 12)
    // every histogram is a real distribution over decoded pixels
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-5))
    assert(feats.forall(f => f.features.exists(_ > 0.0f)))
  }

  test("wav: JDK round-trip decodes exact closed-form PCM; corrupt bytes are data") {
    val metas = Multimodal.decodeAudioMeta(Multimodal.syntheticWavMedia(spark, 8))
      .collect().map(m => m.media_id -> m).toMap
    (0L until 8L).foreach { i =>
      val m = metas(i)
      val frames = 64 + (i % 64).toInt
      val samples = (0 until frames).map(k => (((31 * i + 17 * k) % 65536) - 32768).toInt)
      assert(m.decode_ok && m.sample_rate == 8000 && m.channels == 1 && m.bits == 16)
      assert(m.n_frames == frames.toLong)
      assert(m.pcm_sum == samples.map(_.toLong).sum)
      assert(m.pcm_min == samples.min && m.pcm_max == samples.max)
    }
    // corrupt payload decodes to a decode_ok=false row, not an exception
    import spark.implicits._
    val bad = Seq(Multimodal.MediaFile(99L, "audio", Array[Byte](1, 2, 3, 4),
      0, 0, 0L, "audio/wav")).toDS()
    val badMeta = Multimodal.decodeAudioMeta(bad).collect().head
    assert(!badMeta.decode_ok && badMeta.n_frames == 0L)
  }

  /** The round-14 compressed-audio seam: G.711 μ-law is a REAL lossy
    * codec (8-bit companded bytes carrying ~14-bit dynamic range) the
    * stock JDK's FormatConversionProvider expands — so the compressed
    * path is exercised against PCM truth with no plugin. Truth is an
    * INDEPENDENT expansion table built from the CCITT G.711 algorithm in
    * this spec, checked over ALL 256 code points; MP3/OGG are probed and
    * documented absent (the WebP/JP2 precedent — a plugin jar joins the
    * same decodeAudio path with zero new code).
    */
  test("compressed audio: mu-law expands through the SPI conversion, exact over all 256 code points") {
    import javax.sound.sampled._
    // CCITT G.711 μ-law → linear, written from the public algorithm (not
    // the JDK's table): invert, split sign/exponent/mantissa, rebuild
    // with the 0x84 bias
    def ulaw2linear(b: Int): Int = {
      val u = (~b) & 0xff
      var t = ((u & 0x0f) << 3) + 0x84
      t <<= (u & 0x70) >> 4
      if ((u & 0x80) != 0) 0x84 - t else t - 0x84
    }
    // stock-JDK discovery: the G.711 family converts; MP3/OGG only with
    // an SPI plugin on the classpath (absent here — probe, don't assume)
    assert(Multimodal.audioConversionSupported("ULAW"),
      "stock JDK must ship a ULAW FormatConversionProvider")
    assert(Multimodal.audioConversionSupported("ALAW"))
    val mp3 = Multimodal.audioConversionSupported("MPEG1L3")
    val ogg = Multimodal.audioConversionSupported("VORBIS")
    info(s"SPI plugins: MP3=$mp3 OGG=$ogg (expected absent on the stock JDK)")
    // every possible companded byte, wrapped in a real ULAW WAV
    val companded = (0 until 256).map(_.toByte).toArray
    val fmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(companded), fmt, 256L),
      AudioFileFormat.Type.WAVE, out)
    val decoded = Multimodal.decodeAudio(out.toByteArray)
    assert(decoded.isDefined, "ULAW WAV must decode through the SPI seam")
    val (pcmFmt, samples) = decoded.get
    assert(pcmFmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      pcmFmt.getSampleSizeInBits == 16)
    assert(samples.length == 256)
    val expect = (0 until 256).map(ulaw2linear)
    assert(samples.toSeq == expect,
      s"JDK expansion != independent G.711 table; first diffs: ${
        samples.toSeq.zip(expect).zipWithIndex.filter(p => p._1._1 != p._1._2)
          .take(4)}")
    // and the Spark-side stats path serves the EXPANDED truth, not the
    // companded bytes mis-read as PCM (what the old decodeWav route did)
    import spark.implicits._
    val media = Seq(Multimodal.MediaFile(7L, "audio", out.toByteArray,
      0, 0, 32L, "audio/wav")).toDS()
    val meta = Multimodal.decodeAudioMeta(media).collect().head
    assert(meta.decode_ok && meta.bits == 16)
    assert(meta.pcm_sum == expect.map(_.toLong).sum)
    assert(meta.pcm_min == expect.min && meta.pcm_max == expect.max)
  }

  test("wav decode honors the header, not our writer: a big-endian AIFF decodes too") {
    // encode the same samples as AIFF (big-endian) through the JDK writer;
    // decodeWav must flip byte order by the declared format
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val samples = Array(-32768, -1, 0, 1, 32767)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, k) =>
      pcm(2 * k) = ((v >> 8) & 0xff).toByte
      pcm(2 * k + 1) = (v & 0xff).toByte
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val decoded = Multimodal.decodeWav(out.toByteArray)
    assert(decoded.exists(_._2.toSeq == samples.toSeq))
  }

  test("image aHash: brightness-shift invariant, structure-sensitive, corrupt -> not ok") {
    import spark.implicits._
    def png(id: Long, f: (Int, Int) => Int): MediaFile = {
      val (w, h) = (16, 12)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        img.getRaster.setSample(x, y, 0, f(x, y))))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      MediaFile(id, "image", out.toByteArray, w, h, 0L, "image/png")
    }
    val media = Seq(
      png(1, (x, _) => if (x < 8) 40 else 200),        // left-dark split
      png(2, (x, _) => if (x < 8) 60 else 220),        // same structure, +20
      png(3, (_, y) => if (y < 6) 40 else 200),        // transposed structure
      MediaFile(4, "image", Array[Byte](1, 2, 3), 0, 0, 0L, "corrupt")
    ).toDS()
    val got = Multimodal.imageAHash(media).collect()
      .map(h => h.media_id -> ((h.ahash_lo, h.ahash_hi), h.decode_ok)).toMap
    assert(got(1L)._2 && got(2L)._2 && got(3L)._2 && !got(4L)._2)
    // aHash is invariant to a uniform brightness shift (both means move
    // together) but distinguishes different structure
    assert(got(1L)._1 == got(2L)._1)
    assert(got(1L)._1 != got(3L)._1)
    assert(got(4L)._1 == ((0L, 0L)))
  }

  test("video container metadata: MP4 box tree and MKV EBML tree round-trip") {
    import graft.multimodal.Multimodal
    // direct parser round-trips at representative parameter corners
    Seq((1000L, 320, 240, 1), (5999L, 432, 320, 3), (1L, 16, 16, 2))
      .foreach { case (d, w, h, t) =>
        assert(Multimodal.parseMp4Meta(
          Multimodal.writeMp4Header(d, 1000L, w, h, t)) == Some((d, w, h, t)))
        assert(Multimodal.parseMkvMeta(
          Multimodal.writeMkvHeader(d, w, h, t)) == Some((d, w, h, t)))
      }
    // mp4 duration honors a non-ms timescale (90 kHz is the common one)
    assert(Multimodal.parseMp4Meta(
      Multimodal.writeMp4Header(90000L * 3, 90000L, 100, 100, 1))
      == Some((3000L, 100, 100, 1)))
  }

  test("video container metadata: corrupt bytes are DATA, not exceptions") {
    import spark.implicits._
    import graft.multimodal.Multimodal
    import Multimodal.MediaFile
    val good = Multimodal.writeMp4Header(1500L, 1000L, 320, 240, 2)
    val goodMkv = Multimodal.writeMkvHeader(2500L, 256, 144, 1)
    val media = Seq(
      MediaFile(1, "video", good, 0, 0, 0L, "video/mp4"),
      MediaFile(2, "video", goodMkv, 0, 0, 0L, "video/x-matroska"),
      // truncated mid-box: magic valid, structure not
      MediaFile(3, "video", good.take(good.length / 2), 0, 0, 0L, "video/mp4"),
      MediaFile(4, "video", goodMkv.take(12), 0, 0, 0L, "video/x-matroska"),
      // wrong magic entirely
      MediaFile(5, "video", Array.tabulate[Byte](64)(i => (i * 7).toByte),
        0, 0, 0L, "video/mp4"),
      MediaFile(6, "video", Array.emptyByteArray, 0, 0, 0L, "video/mp4")
    ).toDS()
    val got = Multimodal.decodeVideoMeta(media).collect()
      .map(v => v.media_id -> v).toMap
    assert(got(1L).decode_ok && got(1L).container == "mp4" &&
      got(1L).duration_ms == 1500L && got(1L).n_tracks == 2)
    assert(got(2L).decode_ok && got(2L).container == "mkv" &&
      got(2L).duration_ms == 2500L && got(2L).width == 256)
    Seq(3L, 4L, 5L, 6L).foreach { id =>
      assert(!got(id).decode_ok, s"corrupt payload $id claimed to decode")
      assert(got(id).duration_ms == 0L && got(id).n_tracks == 0)
    }
  }

  test("AVI frame decode: Motion-PNG frames reproduce the closed form exactly") {
    import Multimodal._
    val media = syntheticAviMedia(spark, 12)
    val got = videoFrames(media, sampleEvery = 1).collect()
      .map(f => (f.media_id, f.frame_idx) -> f).toMap
    (0L until 12L).foreach { i =>
      val (w, h, nf) = (8 + (i % 8).toInt, 8 + ((3 * i) % 8).toInt, 2 + (i % 3).toInt)
      (0 until nf).foreach { f =>
        val vf = got((i, f))
        assert(vf.decode_ok && vf.width == w && vf.height == h)
        val want = (for (y <- 0 until h; x <- 0 until w)
          yield ((7 * x + 13 * y + i + 31 * f) % 256)).sum
        assert(vf.px_sum == want, s"video $i frame $f sum ${vf.px_sum} != $want")
      }
      assert(!got.contains((i, nf)), "phantom frame past the stream length")
    }
    // container metadata agrees with the writer's timing fields
    val meta = parseAviMeta(media.filter(_.media_id == 5L).head().bytes).get
    assert(meta == (40L * (2 + 5 % 3), 8 + 5 % 8, 8 + (3 * 5) % 8, 2 + 5 % 3))
  }

  test("AVI frame decode: sampling, MJPG handler, and corrupt bytes as data") {
    import Multimodal._
    // sampling: every 2nd frame of a 3-frame video = indices 0 and 2
    val m3 = syntheticAviMedia(spark, 2).filter(_.media_id == 1L) // 3 frames
    val sampled = videoFrames(m3, sampleEvery = 2).collect().map(_.frame_idx).sorted
    assert(sampled.toSeq == Seq(0, 2), s"sampler picked ${sampled.toSeq}")
    // MJPG: JPEG frames ride the same RIFF walk and decode for real
    // (dims exact; pixel values are the decoder's, not asserted)
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 8).foreach(y => (0 until 16).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpegAvi = writeAvi(Seq(out.toByteArray, out.toByteArray), 16, 8,
      usPerFrame = 33333L, fourcc = "MJPG")
    import spark.implicits._
    val mj = spark.createDataset(Seq(
      MediaFile(50L, "video", jpegAvi, 16, 8, 66L, "video/x-msvideo"),
      // truncated container -> ONE frame_idx = -1 row
      MediaFile(51L, "video", jpegAvi.take(30), 0, 0, 0L, "video/x-msvideo"),
      // valid container, garbage frame payload -> per-frame decode_ok false
      MediaFile(52L, "video",
        writeAvi(Seq(Array.tabulate[Byte](64)(i => (i * 3).toByte)), 4, 4,
          40000L), 4, 4, 40L, "video/x-msvideo")))
    val byId = videoFrames(mj).collect().groupBy(_.media_id)
    assert(byId(50L).length == 2 && byId(50L).forall(f =>
      f.decode_ok && f.width == 16 && f.height == 8))
    assert(byId(51L).toSeq.map(f => (f.frame_idx, f.decode_ok)) == Seq((-1, false)))
    assert(byId(52L).toSeq.map(f => (f.frame_idx, f.decode_ok)) == Seq((0, false)))
  }

  test("Motion-JPEG: pixel truth — container decode ≡ direct decode, quantization bounded") {
    import Multimodal._
    // the INDEPENDENT twin of videoFrames' luma fold: direct ImageIO
    // decode of a raw payload + the same Rec.601 integer rule (JPEG is a
    // lossy codec, so pixel values are the DECODER's — the container
    // walk must add exactly nothing on top of them)
    def directLumaSum(payload: Array[Byte]): (Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      val raster = img.getRaster
      val gray = img.getColorModel.getNumComponents == 1
      var sum = 0L
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        sum += (if (gray) raster.getSample(x, y, 0)
                else (299 * raster.getSample(x, y, 0) +
                      587 * raster.getSample(x, y, 1) +
                      114 * raster.getSample(x, y, 2)) / 1000)
      (img.getWidth, img.getHeight, sum)
    }
    val media = syntheticMjpegMedia(spark, 12).collect()
    val got = videoFrames(spark.createDataset(media.toSeq)(
        org.apache.spark.sql.Encoders.product[MediaFile]), sampleEvery = 1)
      .collect().map(f => (f.media_id, f.frame_idx) -> f).toMap
    media.foreach { m =>
      val i = m.media_id
      val (w, h, nf) =
        (16 + (i % 8).toInt, 16 + ((3 * i) % 8).toInt, 2 + (i % 3).toInt)
      val frames = aviFrameChunks(m.bytes).get
      assert(frames.size == nf)
      frames.zipWithIndex.foreach { case (payload, f) =>
        // every frame payload is a REAL JPEG (SOI marker), not PNG
        assert((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8,
          s"video $i frame $f is not a JPEG payload")
        val vf = got((i, f))
        val (dw, dh, dsum) = directLumaSum(payload)
        assert(vf.decode_ok && vf.width == w && vf.height == h)
        assert((dw, dh) == (w, h), "JPEG must preserve dimensions exactly")
        assert(vf.px_sum == dsum,
          s"container decode drifted from direct decode: video $i frame $f " +
            s"${vf.px_sum} != $dsum")
      }
      // container metadata stays exact closed-form despite the lossy codec
      assert(parseAviMeta(m.bytes).get ==
        ((nf * 33333L) / 1000L, w, h, nf))
    }
    // quantization honesty: a UNIFORM frame decodes to (approximately)
    // its source value — |mean - v| <= 2 bounds the codec's error, and a
    // WRONG decode path (byte-histogram stub, wrong plane order) lands
    // nowhere near it
    Seq(20, 77, 128, 219).foreach { v =>
      val img = new java.awt.image.BufferedImage(24, 16,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 16).foreach(y => (0 until 24).foreach(x =>
        img.getRaster.setSample(x, y, 0, v)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      val avi = writeAvi(Seq(out.toByteArray), 24, 16, 33333L, fourcc = "MJPG")
      import spark.implicits._
      val vf = videoFrames(spark.createDataset(Seq(
        MediaFile(90L, "video", avi, 24, 16, 33L, "video/x-msvideo")))).head()
      assert(vf.decode_ok && vf.n_px == 24L * 16L)
      val mean = vf.px_sum.toDouble / vf.n_px
      assert(math.abs(mean - v) <= 2.0,
        s"uniform-$v frame decoded to mean $mean — not a real JPEG decode")
    }
  }

  test("GDIF: lossless encode/decode round trip; P-frames are genuinely inter-coded") {
    val w = 12; val h = 9
    val frames = (0 until 4).map { f =>
      Array.tabulate(w * h)(p => ((p * 7 + f * 31) % 256).toByte)
    }
    val bits = Multimodal.gdifEncode(frames, w, h)
    val Some((dw, dh, dec)) = Multimodal.gdifDecode(bits)
    assert(dw == w && dh == h && dec.size == 4)
    dec.zip(frames).foreach { case (d, o) =>
      assert(java.util.Arrays.equals(d, o), "GDIF round trip not lossless")
    }
    // frame 1's stored block is a DELTA, not the raw frame — decoding it
    // without frame 0 is impossible (the property that forces the
    // stateful external-decoder shape)
    val stored1 = java.util.Arrays.copyOfRange(bits, 16 + w * h, 16 + 2 * w * h)
    assert(!java.util.Arrays.equals(stored1, frames(1)),
      "frame 1 stored raw — that's intra-coding, not the P-frame seam")
    // corrupt payloads are data
    assert(Multimodal.gdifDecode("nope".getBytes).isEmpty)
    assert(Multimodal.gdifDecode(bits.dropRight(1)).isEmpty)
  }

  test("external decoder seam: a REAL subprocess decodes GDIF to the exact closed form") {
    val media = Multimodal.syntheticGdifMedia(spark, 30)
    val got = Multimodal.videoFramesExternal(media,
        Multimodal.selfJvmDecoderCmd, sampleEvery = 2)
      .collect().map(v => (v.media_id, v.frame_idx) -> v).toMap
    (0 until 30).foreach { i =>
      val w = 8 + i % 8; val h = 8 + (3 * i) % 8
      val nFrames = 2 + i % 3
      (0 until nFrames).foreach { f =>
        if (f % 2 == 0) {
          val v = got((i.toLong, f))
          assert(v.decode_ok && v.width == w && v.height == h &&
            v.n_px == w.toLong * h)
          val expect = (for { y <- 0 until h; x <- 0 until w }
            yield (7 * x + 13 * y + i + 31 * f) % 256).map(_.toLong).sum
          assert(v.px_sum == expect,
            s"video $i frame $f: px_sum ${v.px_sum} != closed form $expect")
        } else assert(!got.contains((i.toLong, f)),
          s"sampler emitted unsampled frame $f of video $i")
      }
    }
  }

  test("external decoder seam: a corrupt bitstream is data (frame_idx = -1), the batch continues") {
    import spark.implicits._
    val goodBits = Multimodal.gdifEncode(
      Seq(Array.tabulate(16)(p => (p * 3).toByte)), 4, 4)
    val media = Seq(
      MediaFile(0L, "video", "garbage!".getBytes, 0, 0, 0L, "video/x-graft-gdif"),
      MediaFile(1L, "video", goodBits, 4, 4, 40L, "video/x-graft-gdif"))
      .toDS().coalesce(1) // one partition: both videos share one decoder
    val rows = Multimodal.videoFramesExternal(media,
        Multimodal.selfJvmDecoderCmd)
      .collect().sortBy(v => (v.media_id, v.frame_idx))
    assert(rows.length == 2)
    assert(rows(0).media_id == 0L && rows(0).frame_idx == -1 && !rows(0).decode_ok)
    assert(rows(1).media_id == 1L && rows(1).frame_idx == 0 && rows(1).decode_ok &&
      rows(1).px_sum == (0 until 16).map(_ * 3).sum.toLong)
  }
}
