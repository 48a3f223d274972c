package graft.functions

import java.io.ByteArrayOutputStream

/** Real ISO BMFF (MP4) box walker for the video multimodal lane — the
  * analog of [[AudioHeaders]]' RIFF/WAV chunk walker: header-only
  * metadata extraction over opaque binary columns, no codec work. Walks
  * the top-level box sequence (32-bit sizes, the 64-bit `largesize`
  * escape, and the size-0 "to end of file" form), descends into `moov`,
  * skips unknown boxes at both levels, and reads `mvhd` version 0 or 1
  * for (timescale, duration). The actual frame DECODE step would be a
  * codec library behind `mapInPandas`/`mapPartitions` at the same batch
  * shape — the plumbing here (schema, partitioning, per-partition
  * walker) is the real and tested part.
  */
object VideoHeaders {

  final case class Mp4Info(brand: String, timescale: Long, duration: Long,
      topBoxes: Int) {
    def durationMicros: Long =
      if (timescale <= 0) 0L else duration * 1000000L / timescale
  }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long = (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse one box header at `off`; returns (payloadStart, boxEnd, type)
    * or None on structural garbage.
    */
  private def boxAt(b: Array[Byte], off: Int, limit: Int): Option[(Int, Int, String)] = {
    if (off + 8 > limit) return None
    val size32 = be32(b, off)
    val tpe = fourcc(b, off + 4)
    val (payload, end) =
      if (size32 == 1L) {
        if (off + 16 > limit) return None
        val sz = be64(b, off + 8)
        if (sz < 16 || off + sz > limit) return None
        (off + 16, off + sz.toInt)
      } else if (size32 == 0L) {
        (off + 8, limit) // box extends to end of file
      } else {
        if (size32 < 8 || off + size32 > limit) return None
        (off + 8, off + size32.toInt)
      }
    Some((payload, end, tpe))
  }

  /** Walk the file; None on anything structurally broken. */
  def decodeMp4(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes == null || bytes.length < 8) return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var off = 0
    var topBoxes = 0
    while (off < bytes.length) {
      val (payload, end, tpe) = boxAt(bytes, off, bytes.length) match {
        case Some(x) => x
        case None    => return None
      }
      topBoxes += 1
      tpe match {
        case "ftyp" =>
          if (payload + 4 > end) return None
          brand = fourcc(bytes, payload)
        case "moov" =>
          var c = payload
          while (c < end) {
            val (cp, ce, ct) = boxAt(bytes, c, end) match {
              case Some(x) => x
              case None    => return None
            }
            if (ct == "mvhd") {
              if (cp + 4 > ce) return None
              val version = bytes(cp) & 0xff
              if (version == 0) {
                if (cp + 20 > ce) return None
                timescale = be32(bytes, cp + 12)
                duration = be32(bytes, cp + 16)
              } else if (version == 1) {
                if (cp + 32 > ce) return None
                timescale = be32(bytes, cp + 20)
                duration = be64(bytes, cp + 24)
              } else return None
            } // unknown children skipped
            c = ce
          }
        case _ => () // unknown top-level box skipped
      }
      off = end
    }
    if (brand == null || timescale < 0) None
    else Some(Mp4Info(brand, timescale, duration, topBoxes))
  }

  /** Deterministic minimal-but-valid MP4: ftyp + moov(free + mvhd v0/v1)
    * + free(pad) + mdat(pad, written with the 64-bit largesize form when
    * v1 to exercise that path). Byte length is closed-form:
    * v0 → 160 + 2·pad, v1 → 180 + 2·pad (the q144 oracle relies on it).
    */
  def syntheticMp4(timescale: Int, duration: Long, pad: Int, v1: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    def w64(v: Long): Unit = { w32(v >>> 32); w32(v & 0xffffffffL) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    // ftyp (20)
    w32(20); tag("ftyp"); tag("isom"); w32(0); tag("mp41")
    // moov = header 8 + free 8 + mvhd
    val mvhdSize = if (v1) 120 else 108
    w32(8 + 8 + mvhdSize); tag("moov")
    w32(8); tag("free") // unknown child the walker must skip
    w32(mvhdSize); tag("mvhd")
    if (v1) {
      w32(0x01000000L) // version 1, flags 0
      w64(0L); w64(0L) // creation, modification
      w32(timescale); w64(duration)
    } else {
      w32(0L)          // version 0, flags 0
      w32(0L); w32(0L) // creation, modification
      w32(timescale); w32(duration)
    }
    w32(0x00010000L); w32(0) // rate, volume+reserved
    w64(0L)                  // reserved2
    (0 until 9).foreach(i => w32(if (i == 0 || i == 4) 0x00010000L else if (i == 8) 0x40000000L else 0L))
    (0 until 6).foreach(_ => w32(0L)) // pre_defined
    w32(2L)                  // next_track_id
    // free(pad)
    w32(8 + pad); tag("free"); (0 until pad).foreach(i => out.write(i & 0xff))
    // mdat(pad): largesize form under v1
    if (v1) { w32(1); tag("mdat"); w64(16L + pad) }
    else { w32(8 + pad); tag("mdat") }
    (0 until pad).foreach(i => out.write((i * 7) & 0xff))
    out.toByteArray
  }
}
