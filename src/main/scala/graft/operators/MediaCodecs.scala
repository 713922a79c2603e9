package graft.operators

import java.util.zip.Inflater

/**
 * Pure-JVM media codecs for the multimodal column pipeline — the real
 * replacements for the round-1 stub decoder, in the same spirit as the
 * PDF/DOCX parsers ([[graft.sources.BinaryText]]). The lossless formats
 * are public byte layouts parsed by hand with the JDK alone, and JPEG
 * decodes through the JDK's own `javax.imageio` reader (part of
 * `java.desktop` — no external libraries):
 *
 *  - BMP: 24-bit uncompressed BI_RGB (header + padded bottom-up rows)
 *  - PNG: 8-bit gray/RGB/RGBA, non-interlaced — zlib IDAT via
 *    java.util.zip + the five scanline filters (None/Sub/Up/Avg/Paeth)
 *  - WAV: RIFF PCM 16-bit (fmt + data chunks)
 *  - JPEG: baseline+progressive via ImageIO ([[decodeJpeg]])
 *  - GIF: 87a/89a via ImageIO, first frame ([[decodeGif]])
 *
 * Decoded pixels/samples feed REAL feature extraction (channel means,
 * luminance histogram, RMS/ZCR) and a real nearest-neighbor resize.
 * MP3/MP4 still route to the deterministic fake — swapping in a native
 * codec changes nothing around it.
 */
object MediaCodecs {

  /** Decoded raster: row-major RGB triples (0-255 ints). */
  final case class RasterImage(width: Int, height: Int, rgb: Array[Int]) {
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val base = (y * width + x) * 3
      (rgb(base), rgb(base + 1), rgb(base + 2))
    }
  }

  /** Decoded PCM audio: interleaved samples in [-1, 1]. */
  final case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Float]) {
    def durationSec: Double =
      if (sampleRate == 0 || channels == 0) 0.0
      else samples.length.toDouble / channels / sampleRate
  }

  // ------------------------------------------------------------------ jpeg

  /**
   * JPEG via the JDK's OWN codec: `java.desktop` ships a full
   * baseline+progressive JPEG reader behind `javax.imageio.ImageIO` —
   * no external libraries, works headless. (Round 1 assumed no image
   * codecs in the container; that is true of native/ffmpeg ones, but
   * the ImageIO JPEG reader is part of the JDK itself.) Pixels are
   * converted to the same row-major RGB layout the hand-written BMP/PNG
   * decoders produce, so features/resize downstream are format-blind.
   */
  def decodeJpeg(bytes: Array[Byte]): Option[RasterImage] = {
    if (bytes == null || bytes.length < 3 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8 || (bytes(2) & 0xff) != 0xff) None
    else imageIORead(bytes)
  }

  /** GIF via the same JDK ImageIO reader (87a/89a; an animated GIF
    * decodes as its first frame — the frame-sample story for stills). */
  def decodeGif(bytes: Array[Byte]): Option[RasterImage] = {
    if (bytes == null || bytes.length < 6 || bytes(0) != 'G' ||
        bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != '8' ||
        (bytes(4) != '7' && bytes(4) != '9') || bytes(5) != 'a') None
    else imageIORead(bytes)
  }

  private def imageIORead(bytes: Array[Byte]): Option[RasterImage] = {
    try {
      // memory-backed image stream: the default ImageIO path wraps the
      // (already in-memory) bytes in a FileCacheImageInputStream — a
      // temp-file write per decode on every executor
      val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream itself on
      // completion; the quiet re-close only covers the exception path
      val img =
        try javax.imageio.ImageIO.read(stream)
        finally {
          try stream.close() catch { case _: java.io.IOException => () }
        }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        // one bulk conversion pass — per-pixel getRGB pays a virtual
        // dispatch + ColorModel conversion per call
        val argb = img.getRGB(0, 0, w, h, null, 0, w)
        val rgb = new Array[Int](w * h * 3)
        var p = 0
        while (p < argb.length) {
          val v = argb(p)
          rgb(p * 3) = (v >> 16) & 0xff
          rgb(p * 3 + 1) = (v >> 8) & 0xff
          rgb(p * 3 + 2) = v & 0xff
          p += 1
        }
        Some(RasterImage(w, h, rgb))
      }
    } catch { case _: Exception => None } // Exception, not Throwable: match
    // the other decoders — a VM error must fail the task, not fake features
  }

  // ------------------------------------------------------------------- bmp

  def decodeBmp(bytes: Array[Byte]): Option[RasterImage] = {
    try {
      if (bytes == null || bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M')
        return None
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      val dataOffset = u32(10)
      val width = u32(18)
      val heightRaw = u32(22)
      val topDown = heightRaw < 0
      val height = math.abs(heightRaw)
      val bpp = u16(28)
      val compression = u32(30)
      if (bpp != 24 || compression != 0 || width <= 0 || height <= 0) return None
      val rowSize = (width * 3 + 3) / 4 * 4
      if (dataOffset + rowSize.toLong * height > bytes.length) return None
      val rgb = new Array[Int](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = if (topDown) y else height - 1 - y
        val rowBase = dataOffset + srcRow * rowSize
        var x = 0
        while (x < width) {
          val p = rowBase + x * 3
          val o = (y * width + x) * 3
          rgb(o) = bytes(p + 2) & 0xff     // BGR on disk
          rgb(o + 1) = bytes(p + 1) & 0xff
          rgb(o + 2) = bytes(p) & 0xff
          x += 1
        }
        y += 1
      }
      Some(RasterImage(width, height, rgb))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------- png

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def decodePng(bytes: Array[Byte]): Option[RasterImage] = {
    try {
      if (bytes == null || bytes.length < 8 + 25) return None
      var i = 0
      while (i < 8) { if (bytes(i) != PngMagic(i)) return None; i += 1 }
      def u32(o: Int): Int = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      var pos = 8
      var width = 0; var height = 0; var bitDepth = 0; var colorType = 0
      var interlace = 0
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && pos + 8 <= bytes.length) {
        val len = u32(pos)
        val typ = new String(bytes, pos + 4, 4, "US-ASCII")
        val dataStart = pos + 8
        // A negative or truncated length field would stall or reverse the
        // walk; treat it as malformed input.
        if (len < 0 || len > bytes.length - dataStart) return None
        typ match {
          case "IHDR" =>
            width = u32(dataStart); height = u32(dataStart + 4)
            bitDepth = bytes(dataStart + 8) & 0xff
            colorType = bytes(dataStart + 9) & 0xff
            interlace = bytes(dataStart + 12) & 0xff
          case "IDAT" => idat.write(bytes, dataStart, len)
          case "IEND" => done = true
          case _ =>
        }
        pos = dataStart + len + 4 // skip crc
      }
      if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0) return None
      val channels = colorType match {
        case 0 => 1 // gray
        case 2 => 3 // rgb
        case 4 => 2 // gray+alpha
        case 6 => 4 // rgba
        case _ => return None
      }
      // inflate the filtered scanlines
      val inf = new Inflater()
      inf.setInput(idat.toByteArray)
      val raw = new Array[Byte](height * (1 + width * channels))
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None
        off += n
      }
      inf.end()
      if (off < raw.length) return None
      // unfilter scanline by scanline
      val stride = width * channels
      val img = new Array[Byte](height * stride)
      var y = 0
      while (y < height) {
        val filter = raw(y * (stride + 1)) & 0xff
        val src = y * (stride + 1) + 1
        val dst = y * stride
        var x = 0
        while (x < stride) {
          val rawv = raw(src + x) & 0xff
          val a = if (x >= channels) img(dst + x - channels) & 0xff else 0        // left
          val b = if (y > 0) img(dst - stride + x) & 0xff else 0                  // up
          val c = if (x >= channels && y > 0) img(dst - stride + x - channels) & 0xff else 0 // up-left
          val v = filter match {
            case 0 => rawv
            case 1 => rawv + a
            case 2 => rawv + b
            case 3 => rawv + ((a + b) / 2)
            case 4 => // Paeth
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              rawv + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None
          }
          img(dst + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      // expand to RGB triples
      val rgb = new Array[Int](width * height * 3)
      var p = 0
      while (p < width * height) {
        val base = p * channels
        val (r, g, bl) = channels match {
          case 1 => val v = img(base) & 0xff; (v, v, v)
          case 2 => val v = img(base) & 0xff; (v, v, v)
          case _ => (img(base) & 0xff, img(base + 1) & 0xff, img(base + 2) & 0xff)
        }
        rgb(p * 3) = r; rgb(p * 3 + 1) = g; rgb(p * 3 + 2) = bl
        p += 1
      }
      Some(RasterImage(width, height, rgb))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------------- wav

  def decodeWav(bytes: Array[Byte]): Option[PcmAudio] = {
    try {
      if (bytes == null || bytes.length < 44) return None
      def tag(o: Int) = new String(bytes, o, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      def u32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      var pos = 12
      var sampleRate = 0; var channels = 0; var bits = 0
      var samples: Array[Float] = null
      while (pos + 8 <= bytes.length) {
        val id = tag(pos); val len = u32(pos + 4)
        id match {
          case "fmt " =>
            val fmt = u16(pos + 8)
            channels = u16(pos + 10)
            sampleRate = u32(pos + 12)
            bits = u16(pos + 22)
            if (fmt != 1 || bits != 16) return None // PCM16 only
          case "data" =>
            val n = math.min(len, bytes.length - pos - 8) / 2
            samples = new Array[Float](n)
            var s = 0
            while (s < n) {
              val lo = bytes(pos + 8 + s * 2) & 0xff
              val hi = bytes(pos + 8 + s * 2 + 1).toInt
              samples(s) = ((hi << 8) | lo).toShort / 32768.0f
              s += 1
            }
          case _ =>
        }
        if (len < 0) return None
        // Advance in Long space: a huge length would overflow Int and move
        // pos backwards; clamp to the end of the buffer instead.
        val next = pos.toLong + 8L + len.toLong + (len & 1)
        pos = if (next > bytes.length) bytes.length else next.toInt
      }
      if (samples == null || sampleRate == 0 || channels == 0) None
      else Some(PcmAudio(sampleRate, channels, samples))
    } catch { case _: Exception => None }
  }

  // -------------------------------------------------------------- writers

  /** 24-bit uncompressed BMP writer — the exact inverse of the layout
    * [[decodeBmp]] accepts: 54-byte BITMAPFILEHEADER+BITMAPINFOHEADER,
    * bottom-up rows, BGR sample order, rows padded to 4-byte boundaries.
    * The sink half of the image round trip: what [[decodeBmp]] reads,
    * this writes, byte for byte — which is what lets q69 gate the whole
    * image path on a SQL oracle. */
  def encodeBmp(img: RasterImage): Array[Byte] = {
    val rowSize = (img.width * 3 + 3) / 4 * 4
    val dataSize = rowSize * img.height
    val out = new Array[Byte](54 + dataSize)
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Int): Unit = { p16(o, v); p16(o + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    p32(2, 54 + dataSize)      // file size
    p32(10, 54)                // pixel data offset
    p32(14, 40)                // BITMAPINFOHEADER size
    p32(18, img.width)
    p32(22, img.height)        // positive height = bottom-up rows
    p16(26, 1)                 // color planes
    p16(28, 24)                // bits per pixel
    p32(30, 0)                 // BI_RGB (uncompressed)
    p32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * rowSize
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dstRow + x * 3
        out(d) = img.rgb(s + 2).toByte     // B
        out(d + 1) = img.rgb(s + 1).toByte // G
        out(d + 2) = img.rgb(s).toByte     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Canonical 44-byte-header PCM16 WAV writer — inverse of
    * [[decodeWav]]'s accepted shape (RIFF/WAVE, fmt tag 1, 16-bit
    * little-endian interleaved data chunk). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def tag(o: Int, s: String): Unit = {
      var i = 0; while (i < 4) { out(o + i) = s.charAt(i).toByte; i += 1 }
    }
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Int): Unit = { p16(o, v); p16(o + 2, v >>> 16) }
    tag(0, "RIFF"); p32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, channels)
    p32(24, sampleRate); p32(28, sampleRate * channels * 2)
    p16(32, channels * 2); p16(34, 16)
    tag(36, "data"); p32(40, dataLen)
    var i = 0
    while (i < samples.length) { p16(44 + i * 2, samples(i) & 0xffff); i += 1 }
    out
  }

  // ----------------------------------------------------------- operations

  /** Nearest-neighbor resize — the real pixel operation behind the
    * reference pipeline's thumbnailing step. */
  def resize(img: RasterImage, newW: Int, newH: Int): RasterImage = {
    val out = new Array[Int](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = math.min(img.height - 1, y * img.height / newH)
      var x = 0
      while (x < newW) {
        val sx = math.min(img.width - 1, x * img.width / newW)
        val s = (sy * img.width + sx) * 3
        val d = (y * newW + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    RasterImage(newW, newH, out)
  }

  /** Image features: [width, height, aspect, meanR, meanG, meanB,
    * 8-bin luminance histogram (normalized)] = 14 dims. */
  def imageFeatures(img: RasterImage): Array[Float] = {
    val n = img.width * img.height
    var r = 0.0; var g = 0.0; var b = 0.0
    val hist = new Array[Float](8)
    var p = 0
    while (p < n) {
      val pr = img.rgb(p * 3); val pg = img.rgb(p * 3 + 1); val pb = img.rgb(p * 3 + 2)
      r += pr; g += pg; b += pb
      val lum = (0.299 * pr + 0.587 * pg + 0.114 * pb).toInt
      hist(math.min(7, lum >> 5)) += 1f
      p += 1
    }
    val head = Array(img.width.toFloat, img.height.toFloat,
      img.width.toFloat / img.height, (r / n).toFloat, (g / n).toFloat, (b / n).toFloat)
    head ++ hist.map(_ / n)
  }

  /** Audio features: [durationSec, sampleRate, channels, rms, peak,
    * zeroCrossingRate] = 6 dims. */
  def audioFeatures(a: PcmAudio): Array[Float] = {
    var sumSq = 0.0; var peak = 0.0f; var zc = 0
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i)
      sumSq += s.toDouble * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (s >= 0) != (a.samples(i - 1) >= 0)) zc += 1
      i += 1
    }
    val rms = if (a.samples.isEmpty) 0.0 else math.sqrt(sumSq / a.samples.length)
    Array(a.durationSec.toFloat, a.sampleRate.toFloat, a.channels.toFloat,
      rms.toFloat, peak,
      if (a.samples.length > 1) zc.toFloat / (a.samples.length - 1) else 0f)
  }

  // ----------------------------------------------------------- dim probe

  /**
   * JPEG frame-header scan: walks the marker segments to the first SOFn
   * (C0–CF except DHT C4 / JPG C8 / DAC CC) and reads (width, height,
   * components) — REAL metadata for a format whose entropy-coded pixels
   * we deliberately do not decode. Stops at SOS; clamps every length
   * field (malformed input returns None, never loops or overflows).
   */
  def jpegDims(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    try {
      if (bytes == null || bytes.length < 4 ||
          (bytes(0) & 0xff) != 0xFF || (bytes(1) & 0xff) != 0xD8) return None
      var pos = 2
      while (pos + 2 <= bytes.length) {
        if ((bytes(pos) & 0xff) != 0xFF) return None
        var p = pos
        while (p < bytes.length && (bytes(p) & 0xff) == 0xFF) p += 1 // fill bytes
        if (p >= bytes.length) return None
        val marker = bytes(p) & 0xff
        p += 1
        if (marker == 0xD8 || marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
          pos = p // standalone marker, no length field
        } else {
          if (p + 2 > bytes.length) return None
          val len = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
          if (len < 2 || p + len > bytes.length) return None
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (len < 8) return None
            val h = ((bytes(p + 3) & 0xff) << 8) | (bytes(p + 4) & 0xff)
            val w = ((bytes(p + 5) & 0xff) << 8) | (bytes(p + 6) & 0xff)
            val nc = bytes(p + 7) & 0xff
            return if (w > 0 && h > 0 && nc > 0) Some((w, h, nc)) else None
          }
          if (marker == 0xDA) return None // SOS reached with no SOF: malformed
          pos = p + len
        }
      }
      None
    } catch { case _: Exception => None }
  }

  /** Header-only (width, height, channels) probe across the supported
    * image containers — no pixel decode, so it also covers JPEG. */
  def probeDims(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    try {
      if (bytes == null || bytes.length < 26) None
      else if (bytes(0) == 'B' && bytes(1) == 'M') {
        def u32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
        val bpp = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
        val w = u32(18); val h = math.abs(u32(22))
        if (w > 0 && h > 0 && bpp % 8 == 0 && bpp > 0) Some((w, h, bpp / 8)) else None
      } else if (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
        def u32(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
          ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
        // IHDR is mandatory-first: length at 8, type at 12, data at 16
        if (new String(bytes, 12, 4, "US-ASCII") != "IHDR") None
        else {
          val w = u32(16); val h = u32(20)
          val channels = (bytes(25) & 0xff) match {
            case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
            case _ => -1
          }
          if (w > 0 && h > 0 && channels > 0) Some((w, h, channels)) else None
        }
      } else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') {
        // logical screen descriptor: u16le width at 6, height at 8
        val w = (bytes(6) & 0xff) | ((bytes(7) & 0xff) << 8)
        val h = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
        if (w > 0 && h > 0) Some((w, h, 3)) else None
      } else jpegDims(bytes)
    } catch { case _: Exception => None }
  }

  /**
   * Real decoder for the multimodal pipeline: sniffs the container magic
   * (not the modality tag) and routes BMP/PNG/WAV through the
   * hand-written codecs and JPEG through the JDK's ImageIO reader;
   * anything else (MP3, MP4…) falls back to the deterministic fake,
   * zero-padded/truncated to `dim` either way.
   */
  case class RealDecoder(dim: Int = 16) extends Multimodal.AssetDecoder {
    private val fake = Multimodal.FakeDecoder(dim)
    def decode(modality: String, bytes: Array[Byte]): Array[Float] = {
      val feats =
        if (bytes != null && bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M')
          decodeBmp(bytes).map(imageFeatures)
        else if (bytes != null && bytes.length >= 8 && bytes(0) == 0x89.toByte && bytes(1) == 'P')
          decodePng(bytes).map(imageFeatures)
        else if (bytes != null && bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
                 (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff)
          decodeJpeg(bytes).map(imageFeatures)
        else if (bytes != null && bytes.length >= 6 && bytes(0) == 'G' &&
                 bytes(1) == 'I' && bytes(2) == 'F')
          decodeGif(bytes).map(imageFeatures)
        else if (bytes != null && bytes.length >= 12 &&
                 bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
          decodeWav(bytes).map(audioFeatures)
        else None
      feats match {
        case Some(f) => java.util.Arrays.copyOf(f, dim)
        case None => fake.decode(modality, bytes)
      }
    }
  }

  // --------------------------------------------------------- mp3 / mp4

  /** MPEG-audio stream metadata from frame headers (no PCM decode —
    * that genuinely needs a codec library this container lacks; the
    * header walk is plain byte parsing and REAL). */
  final case class Mp3Info(version: Int, layer: Int, bitrateKbps: Int,
                           sampleRate: Int, channels: Int,
                           nFrames: Int, durationMs: Long)

  /** ISO-BMFF (MP4/M4A/MOV) metadata from the box structure: major
    * brand from `ftyp`, timescale/duration from `moov/mvhd`, track
    * count from `moov/trak` children. */
  final case class Mp4Info(brand: String, timescale: Long,
                           durationMs: Long, nTracks: Int)

  private val Mp3Bitrates = // MPEG1 Layer III column of the bitrate table
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  /**
   * Walk MPEG-1 Layer III frames: skip an ID3v2 tag if present (syncsafe
   * size), then parse each 4-byte frame header (sync, bitrate index,
   * sample-rate index, padding, channel mode) and hop
   * `144·bitrate/rate + padding` bytes to the next frame. Reports the
   * FIRST frame's parameters plus the frame count and the exact
   * 1152-samples-per-frame duration. Truncated/never-synced input → None.
   */
  def probeMp3(bytes: Array[Byte]): Option[Mp3Info] = {
    try {
      if (bytes == null || bytes.length < 4) return None
      var pos = 0
      // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe u28 size; the v2.4
      // footer flag (0x10) adds a trailing 10-byte footer to the tag
      if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3' && bytes.length >= 10) {
        val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
          ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
        pos = 10 + size + (if ((bytes(5) & 0x10) != 0) 10 else 0)
      }
      // initial sync acquisition tolerates inter-tag padding: scan forward
      // (bounded) for the first 0xFF sync byte; frames after the first
      // must be contiguous per the spec, so only this first hop scans
      val scanLimit = math.min(bytes.length - 4, pos + 65536)
      while (pos <= scanLimit && (bytes(pos) & 0xff) != 0xff) pos += 1
      var first: Option[(Int, Int, Int)] = None // (kbps, rate, channels)
      var frames = 0
      while (pos + 4 <= bytes.length) {
        val b1 = bytes(pos) & 0xff; val b2 = bytes(pos + 1) & 0xff
        // MPEG1 Layer III sync: 11 set bits, version 11, layer 01
        if (b1 != 0xff || (b2 & 0xfe) != 0xfa) return finishMp3(first, frames)
        val brIdx = (bytes(pos + 2) & 0xf0) >>> 4
        val srIdx = (bytes(pos + 2) & 0x0c) >>> 2
        val padding = (bytes(pos + 2) & 0x02) >>> 1
        val chMode = (bytes(pos + 3) & 0xc0) >>> 6
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return finishMp3(first, frames)
        val kbps = Mp3Bitrates(brIdx)
        val rate = Mp3Rates(srIdx)
        val channels = if (chMode == 3) 1 else 2
        if (first.isEmpty) first = Some((kbps, rate, channels))
        frames += 1
        val frameLen = 144 * kbps * 1000 / rate + padding
        if (frameLen <= 4) return finishMp3(first, frames)
        pos += frameLen
      }
      finishMp3(first, frames)
    } catch { case _: Exception => None }
  }

  private def finishMp3(first: Option[(Int, Int, Int)], frames: Int): Option[Mp3Info] =
    first.map { case (kbps, rate, ch) =>
      Mp3Info(1, 3, kbps, rate, ch, frames, frames.toLong * 1152L * 1000L / rate)
    }

  /** Top-level + `moov`-children box walk. Box = u32 big-endian size
    * (1 → u64 extended size follows) + 4-char type. */
  def probeMp4(bytes: Array[Byte]): Option[Mp4Info] = {
    try {
      if (bytes == null || bytes.length < 16) return None
      def u32(o: Int): Long =
        ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
          ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
      def boxType(o: Int) = new String(bytes, o + 4, 4, "US-ASCII")
      def boxSize(o: Int): Long = {
        val s = u32(o)
        if (s == 1 && o + 16 <= bytes.length)
          (u32(o + 8) << 32) | u32(o + 12)
        else s
      }
      if (boxType(0) != "ftyp") return None
      val brand = new String(bytes, 8, 4, "US-ASCII")
      var brandOk = brand.forall(c => c >= ' ' && c < 127)
      if (!brandOk) return None
      var timescale = 0L; var duration = 0L; var tracks = 0
      var pos = 0L
      while (pos + 8 <= bytes.length) {
        val size = boxSize(pos.toInt)
        if (size < 8) return Some(Mp4Info(brand, timescale,
          if (timescale > 0) duration * 1000L / timescale else 0L, tracks))
        if (boxType(pos.toInt) == "moov") {
          // children start after the box header: 8 bytes, or 16 when the
          // size field is 1 (64-bit largesize follows the type)
          var p = pos + (if (u32(pos.toInt) == 1) 16 else 8)
          val end = math.min(pos + size, bytes.length.toLong)
          var ok = true
          while (ok && p + 8 <= end) {
            val cs = boxSize(p.toInt)
            // a corrupt child size ends the moov walk but KEEPS whatever
            // was already parsed (the top-level walk's partial rule)
            if (cs < 8) ok = false
            else boxType(p.toInt) match {
              case "mvhd" if p + 28 <= end =>
                val ver = bytes(p.toInt + 8) & 0xff
                if (ver == 0) { // v0: ..., timescale u32 @+20, duration u32 @+24
                  timescale = u32(p.toInt + 20); duration = u32(p.toInt + 24)
                } else if (p + 40 <= end) { // v1: 64-bit times
                  timescale = u32(p.toInt + 28)
                  duration = (u32(p.toInt + 32) << 32) | u32(p.toInt + 36)
                }
              case "trak" => tracks += 1
              case _ =>
            }
            p += cs
          }
        }
        pos += size
      }
      Some(Mp4Info(brand, timescale,
        if (timescale > 0) duration * 1000L / timescale else 0L, tracks))
    } catch { case _: Exception => None }
  }
}
