package graft

import graft.operators.{MediaCodecs, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class MediaCodecsSpec extends AnyFunSuite {

  // ---- fixture builders (real byte layouts) ---------------------------

  /** 24-bit BI_RGB BMP, bottom-up, 4-byte padded rows. */
  private def bmpBytes(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val out = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    out.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- h - 1 to 0 by -1) { // bottom-up
      for (x <- 0 until w) {
        val (r, g, b) = px(x, y)
        out.put(b.toByte).put(g.toByte).put(r.toByte)
      }
      out.put(new Array[Byte](rowSize - w * 3))
    }
    out.array()
  }

  /** 8-bit PNG with given color type; rows pre-filtered with `filters`. */
  private def pngBytes(w: Int, h: Int, channels: Int,
                       raw: Array[Byte], filters: Array[Int]): Array[Byte] = {
    val colorType = channels match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val stride = w * channels
    // apply the requested filter per row (encoder side)
    val filtered = new Array[Byte](h * (stride + 1))
    for (y <- 0 until h) {
      filtered(y * (stride + 1)) = filters(y).toByte
      for (x <- 0 until stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= channels) raw(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= channels && y > 0) raw((y - 1) * stride + x - channels) & 0xff else 0
        val enc = filters(y) match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            cur - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        filtered(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
      }
    }
    val d = new java.util.zip.Deflater()
    d.setInput(filtered); d.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) zout.write(buf, 0, d.deflate(buf))
    val idat = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    out.toByteArray
  }

  /** RIFF PCM16 WAV. */
  private def wavBytes(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    out.put("data".getBytes).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  // ---- tests ----------------------------------------------------------

  test("BMP decode: exact pixels, padding and bottom-up rows handled") {
    val img = MediaCodecs.decodeBmp(
      bmpBytes(3, 2, (x, y) => (x * 40, y * 100, 200))).get
    assert(img.width === 3 && img.height === 2)
    assert(img.pixel(0, 0) === ((0, 0, 200)))
    assert(img.pixel(2, 1) === ((80, 100, 200)))
  }

  test("PNG decode: RGB with all five filter types round-trips exactly") {
    val w = 4; val h = 5; val ch = 3
    val raw = Array.tabulate(h * w * ch)(i => ((i * 31 + 7) % 256).toByte)
    val png = pngBytes(w, h, ch, raw, Array(0, 1, 2, 3, 4))
    val img = MediaCodecs.decodePng(png).get
    assert(img.width === w && img.height === h)
    val expected = raw.map(_ & 0xff)
    assert(img.rgb.toSeq === expected.toSeq)
  }

  test("PNG decode: grayscale and RGBA expand to RGB") {
    val gray = pngBytes(2, 2, 1, Array[Byte](10, 20, 30, 40), Array(0, 0))
    val g = MediaCodecs.decodePng(gray).get
    assert(g.pixel(1, 1) === ((40, 40, 40)))
    val rgbaRaw = Array.tabulate(2 * 2 * 4)(i => (i * 10).toByte)
    val rgba = pngBytes(2, 2, 4, rgbaRaw, Array(0, 0))
    val a = MediaCodecs.decodePng(rgba).get
    assert(a.pixel(0, 0) === ((0, 10, 20))) // alpha dropped
  }

  test("WAV decode: PCM16 samples, duration, stereo") {
    val a = MediaCodecs.decodeWav(
      wavBytes(8000, 2, Array[Short](0, 16384, -16384, 32767))).get
    assert(a.sampleRate === 8000 && a.channels === 2)
    assert(a.samples.length === 4)
    assert(math.abs(a.samples(1) - 0.5f) < 1e-6)
    assert(math.abs(a.durationSec - 2.0 / 8000) < 1e-9)
  }

  test("resize: nearest neighbor doubles and halves") {
    val img = MediaCodecs.decodeBmp(
      bmpBytes(2, 2, (x, y) => (x * 255, y * 255, 0))).get
    val up = MediaCodecs.resize(img, 4, 4)
    assert(up.pixel(0, 0) === img.pixel(0, 0))
    assert(up.pixel(3, 3) === img.pixel(1, 1))
    val down = MediaCodecs.resize(up, 2, 2)
    assert(down.rgb.toSeq === img.rgb.toSeq)
  }

  test("feature extraction: image means/histogram and audio rms/zcr") {
    val img = MediaCodecs.decodeBmp(bmpBytes(2, 1, (_, _) => (100, 150, 200))).get
    val f = MediaCodecs.imageFeatures(img)
    assert(f.length === 14)
    assert(f(3) === 100f && f(4) === 150f && f(5) === 200f)
    assert(math.abs(f.drop(6).sum - 1.0f) < 1e-6) // histogram normalized
    val audio = MediaCodecs.decodeWav(
      wavBytes(8000, 1, Array[Short](16384, -16384, 16384, -16384))).get
    val af = MediaCodecs.audioFeatures(audio)
    assert(math.abs(af(3) - 0.5f) < 1e-3)  // rms of +-0.5 square wave
    assert(af(5) === 1.0f)                 // alternating signs: zcr 1
  }

  test("RealDecoder routes by magic and falls back to fake for unknown bytes") {
    val dec = MediaCodecs.RealDecoder(16)
    val bmp = dec.decode("image", bmpBytes(2, 2, (_, _) => (1, 2, 3)))
    assert(bmp.take(6).toSeq === Seq(2f, 2f, 1f, 1f, 2f, 3f))
    assert(bmp.length === 16)
    val wav = dec.decode("audio", wavBytes(8000, 1, Array[Short](0, 100)))
    assert(wav(1) === 8000f)
    val junk = "definitely not an image".getBytes
    assert(dec.decode("image", junk).toSeq ===
      Multimodal.FakeDecoder(16).decode("image", junk).toSeq)
  }

  test("JPEG decode: real pixels via the JDK ImageIO codec") {
    // author a 16×8 solid-color JPEG with the same codec family; lossy,
    // so assert channel means within quantization tolerance
    val img = new java.awt.image.BufferedImage(16, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0xC04020)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8)
    val decoded = MediaCodecs.decodeJpeg(bytes)
    assert(decoded.isDefined)
    val d = decoded.get
    assert(d.width === 16 && d.height === 8)
    val feats = MediaCodecs.imageFeatures(d)
    assert(feats(0) === 16f && feats(1) === 8f)
    assert(math.abs(feats(3) - 0xC0) < 13f, s"meanR=${feats(3)}") // 0-255 scale, ±5%
    assert(math.abs(feats(4) - 0x40) < 13f, s"meanG=${feats(4)}")
    assert(math.abs(feats(5) - 0x20) < 13f, s"meanB=${feats(5)}")
    // the probe and the decode agree on dimensions
    assert(MediaCodecs.jpegDims(bytes).map(t => (t._1, t._2)) === Some((16, 8)))
    // RealDecoder sniffs the JPEG magic and produces the same features
    val viaDecoder = MediaCodecs.RealDecoder(16).decode("image", bytes)
    assert(viaDecoder.take(14).toSeq === feats.toSeq)
  }

  test("GIF decode: real pixels via the JDK ImageIO codec, lossless") {
    val img = new java.awt.image.BufferedImage(12, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 12) img.setRGB(x, y, 0x30A070)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val bytes = bos.toByteArray
    assert(bytes(0) === 'G'.toByte && bytes(3) === '8'.toByte)
    val d = MediaCodecs.decodeGif(bytes).get
    assert(d.width === 12 && d.height === 6)
    // GIF is palette-lossless for a solid color: exact channel means
    val feats = MediaCodecs.imageFeatures(d)
    assert(feats(3) === 0x30.toFloat && feats(4) === 0xA0.toFloat && feats(5) === 0x70.toFloat)
    // probe agrees without decoding; router sniffs the magic
    assert(MediaCodecs.probeDims(bytes) === Some((12, 6, 3)))
    assert(MediaCodecs.RealDecoder(16).decode("image", bytes).take(14).toSeq === feats.toSeq)
    // malformed: magic but truncated body → None, not a throw
    assert(MediaCodecs.decodeGif(bytes.take(10)) === None)
  }

  test("PNG decode: truncated/oversized chunk length terminates with None") {
    // valid signature, then an IHDR whose length field claims far more
    // bytes than the buffer holds — must return None, not loop or throw
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val lying = sig ++ java.nio.ByteBuffer.allocate(8)
      .putInt(0x7ffffff0).put("IHDR".getBytes("US-ASCII")).array()
    assert(MediaCodecs.decodePng(lying).isEmpty)
    // a real PNG truncated mid-IDAT (length field intact, data cut off:
    // drop the 12-byte IEND, the 4-byte IDAT crc, and 4 data bytes)
    val whole = pngBytes(2, 2, 3, Array.fill[Byte](12)(7), Array(0, 0))
    assert(MediaCodecs.decodePng(whole.take(whole.length - 20)).isEmpty)
  }

  test("WAV decode: huge chunk length cannot overflow the scan position") {
    // RIFF/WAVE header followed by a junk chunk whose length would push
    // the Int position negative — the scan must clamp and return None
    val out = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(12).put("WAVE".getBytes)
    out.put("junk".getBytes).putInt(0x7fffffff)
    assert(MediaCodecs.decodeWav(out.array()).isEmpty)
  }

  private def jpegBytes(w: Int, h: Int, nComp: Int, sofMarker: Int = 0xC0): Array[Byte] = {
    val sofLen = 8 + 3 * nComp
    val out = java.nio.ByteBuffer.allocate(2 + 18 + 2 + 2 + sofLen)
    out.put(0xFF.toByte).put(0xD8.toByte)                       // SOI
    out.put(0xFF.toByte).put(0xE0.toByte).putShort(16)          // APP0, len 16
    out.put("JFIF".getBytes("US-ASCII")).put(new Array[Byte](10))
    out.put(0xFF.toByte).put(sofMarker.toByte).putShort(sofLen.toShort)
    out.put(8.toByte)                                           // precision
    out.putShort(h.toShort).putShort(w.toShort).put(nComp.toByte)
    for (c <- 0 until nComp) { out.put((c + 1).toByte).put(0x11.toByte).put(0.toByte) }
    out.array()
  }

  test("JPEG SOF frame-header probe: baseline, progressive, grayscale, malformed") {
    assert(MediaCodecs.jpegDims(jpegBytes(640, 480, 3)) === Some((640, 480, 3)))
    assert(MediaCodecs.jpegDims(jpegBytes(31, 17, 3, sofMarker = 0xC2)) === Some((31, 17, 3)))
    assert(MediaCodecs.jpegDims(jpegBytes(100, 50, 1)) === Some((100, 50, 1)))
    // DHT (C4) must NOT be mistaken for a SOF
    val withDht = {
      val b = jpegBytes(8, 8, 3)
      val dht = Array[Byte](0xFF.toByte, 0xC4.toByte, 0, 4, 0, 0)
      b.take(20) ++ dht ++ b.drop(20) // splice after APP0
    }
    assert(MediaCodecs.jpegDims(withDht) === Some((8, 8, 3)))
    assert(MediaCodecs.jpegDims(jpegBytes(640, 480, 3).take(10)) === None)
    assert(MediaCodecs.jpegDims("nope".getBytes) === None)
    // a length field pointing past the buffer must not loop or throw
    val lying = jpegBytes(8, 8, 3)
    lying(4) = 0x7F; lying(5) = 0xFF.toByte // APP0 len = 32767
    assert(MediaCodecs.jpegDims(lying) === None)
  }

  test("probeDims reads header dims for BMP, PNG and JPEG without decoding") {
    val bmp = bmpBytes(5, 3, (_, _) => (1, 2, 3))
    assert(MediaCodecs.probeDims(bmp) === Some((5, 3, 3)))
    val png = pngBytes(4, 2, 3, new Array[Byte](4 * 2 * 3), Array(0, 0))
    assert(MediaCodecs.probeDims(png) === Some((4, 2, 3)))
    assert(MediaCodecs.probeDims(jpegBytes(320, 200, 3)) === Some((320, 200, 3)))
    assert(MediaCodecs.probeDims(Array.fill[Byte](64)(7)) === None)
  }

  test("Multimodal.probeDimensions over a binary column (real + unknown)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = Seq(
      (0L, "image", jpegBytes(64, 32, 3)),
      (1L, "image", bmpBytes(5, 3, (_, _) => (0, 0, 0))),
      (2L, "audio", Array.fill[Byte](32)(1))) // unknown container
    val out = Multimodal.probeDimensions(
        rows.toDF("asset_id", "modality", "content"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getInt(3))))).toMap
    assert(out(0L) === Some((64, 32, 3)))
    assert(out(1L) === Some((5, 3, 3)))
    assert(out(2L) === None)
  }

  test("Multimodal.extractFeatures end-to-end with the real decoder") {
    val spark = TestSpark.spark
    import spark.implicits._
    val assets = Seq(
      (1L, "image", bmpBytes(2, 2, (x, y) => (x, y, 100)), Map("w" -> "2", "h" -> "2")),
      (2L, "audio", wavBytes(8000, 1, Array[Short](1000, -1000)), Map.empty[String, String]),
      (3L, "video", Array[Byte](9, 9, 9), Map.empty[String, String])
    ).toDF("asset_id", "modality", "content", "meta")
    val out = Multimodal.extractFeatures(assets, MediaCodecs.RealDecoder(16))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(out(1L)(0) === 2f)        // width
    assert(out(2L)(1) === 8000f)     // sample rate
    assert(out(3L).length === 16)    // fake fallback still shaped
  }

  test("mp3 probe: frame-header walk with ID3v2 skip, exact duration math") {
    val frame = MediaFixtures.mp3Frame
    val bytes = MediaFixtures.id3v2(5) ++ frame ++ frame ++ frame
    val info = MediaCodecs.probeMp3(bytes).get
    assert(info.bitrateKbps === 128)
    assert(info.sampleRate === 44100)
    assert(info.channels === 2)
    assert(info.nFrames === 3)
    assert(info.durationMs === 3L * 1152 * 1000 / 44100) // 78 ms
    // mono flag (channel mode 3)
    val mono = frame.clone(); mono(3) = 0xc0.toByte
    assert(MediaCodecs.probeMp3(mono).get.channels === 1)
    // garbage and truncation refuse cleanly
    assert(MediaCodecs.probeMp3("not audio".getBytes).isEmpty)
    assert(MediaCodecs.probeMp3(bytes.take(12)).isEmpty)
  }

  test("mp4 probe: ftyp brand, mvhd timescale/duration, trak count") {
    val info = MediaCodecs.probeMp4(
      MediaFixtures.mp4("isom", timescale = 600, duration = 1200, nTraks = 2)).get
    assert(info.brand === "isom")
    assert(info.timescale === 600L)
    assert(info.durationMs === 2000L) // 1200 / 600 s
    assert(info.nTracks === 2)
    // a WAV (RIFF) or image is not ISO-BMFF
    assert(MediaCodecs.probeMp4("RIFFxxxxWAVE".getBytes).isEmpty)
  }
}
