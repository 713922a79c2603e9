package graft

/** Hand-assembled MP3/MP4 container bytes shared by MediaCodecsSpec and
  * MultimodalSpec — one definition of the frame/box layouts so the two
  * suites can never drift apart. */
object MediaFixtures {

  def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** One MPEG-1 Layer III frame: 0xFFFB, bitrate idx 9 (128 kbps), rate
    * idx 0 (44100), no padding → frame length 144·128000/44100 = 417. */
  def mp3Frame: Array[Byte] = {
    val frame = new Array[Byte](417)
    frame(0) = 0xff.toByte; frame(1) = 0xfb.toByte; frame(2) = 0x90.toByte
    frame
  }

  /** ID3v2.4 header with syncsafe size `tagSize` (no footer flag). */
  def id3v2(tagSize: Int): Array[Byte] =
    Array[Byte]('I', 'D', '3', 4, 0, 0,
      ((tagSize >> 21) & 0x7f).toByte, ((tagSize >> 14) & 0x7f).toByte,
      ((tagSize >> 7) & 0x7f).toByte, (tagSize & 0x7f).toByte) ++
      new Array[Byte](tagSize)

  /** `mvhd` v0 box: timescale at payload +12, duration at +16. */
  def mvhd(timescale: Long, duration: Long): Array[Byte] = {
    val payload = new Array[Byte](100)
    System.arraycopy(u32(timescale), 0, payload, 12, 4)
    System.arraycopy(u32(duration), 0, payload, 16, 4)
    u32(108) ++ "mvhd".getBytes ++ payload
  }

  def ftyp(brand: String): Array[Byte] =
    u32(16) ++ "ftyp".getBytes ++ brand.getBytes ++ u32(0)

  /** Minimal MP4: ftyp + moov(mvhd [+ nTraks empty trak boxes]). */
  def mp4(brand: String, timescale: Long, duration: Long, nTraks: Int = 0): Array[Byte] = {
    val traks = Array.fill(nTraks)(u32(8) ++ "trak".getBytes).flatten
    val body = mvhd(timescale, duration) ++ traks
    ftyp(brand) ++ u32(8L + body.length) ++ "moov".getBytes ++ body
  }
}
