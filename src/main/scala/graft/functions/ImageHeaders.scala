package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

/** Pure-JVM image header codec for the multimodal pipeline (SURVEY §2.11
  * "multimodal columns"): extracts true pixel dimensions from PNG and
  * JPEG/JFIF byte streams by walking the real container structure — the
  * PNG IHDR chunk (PNG spec §11.2.2: width/height are the first two
  * big-endian u32s of the first chunk after the 8-byte signature) and the
  * JPEG SOFₙ frame header (ITU T.81 §B.2.2: lines/samples-per-line as
  * big-endian u16s following the marker's precision byte), skipping
  * intervening segments by their declared lengths.
  *
  * Only the first ~KB of a file is ever touched, which is the point at
  * 100 TB: dimension/metadata extraction reads headers, not payloads, so
  * the operator is I/O-bound on a few bytes per object and needs no codec
  * library. Full pixel decode (which DOES need a codec) stays behind the
  * documented stub boundary in the q40/q56 pipelines.
  *
  * The synthetic builders fabricate structurally valid PNG / JFIF streams
  * (correct signatures, chunk CRCs, segment lengths) with an arbitrary
  * payload size — the sandbox ships no image files, so the gates generate
  * their own; the DECODER is the real operator and is additionally
  * validated against JDK ImageIO-encoded images in ImageHeadersSpec.
  */
object ImageHeaders {

  /** (format, width, height) from the header bytes, or None if the bytes
    * are neither a parsable PNG nor JPEG.
    */
  def decodeDims(b: Array[Byte]): Option[(String, Int, Int)] =
    pngDims(b).orElse(jpegDims(b))

  // ------------------------------------------------------------- PNG

  private val PngSig: Array[Int] = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  def pngDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 24) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != PngSig(i)) return None; i += 1 }
    // first chunk must be IHDR (spec §5.6); its data starts at offset 16
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) None else Some(("png", w, h))
  }

  // ------------------------------------------------------------- JPEG

  /** SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC), per T.81 table B.1. */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  def jpegDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced: not a marker
      var m = b(i + 1) & 0xff
      // fill bytes: any number of 0xFF may pad before a marker (§B.1.1.2)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff }
      if (isSof(m)) {
        // segment: len(2) precision(1) height(2) width(2) ...
        if (i + 8 >= b.length) return None
        val h = be16(b, i + 5)
        val w = be16(b, i + 7)
        return if (w <= 0 || h <= 0) None else Some(("jpeg", w, h))
      }
      if (m == 0xd9 || m == 0xda) return None // EOI / start-of-scan: no SOF seen
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // parameterless markers
      else i += 2 + be16(b, i + 2) // skip by declared segment length
    }
    None
  }

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  // ---------------------------------------------- synthetic builders

  /** Structurally valid PNG: signature + IHDR (8-bit truecolor) + an IDAT
    * chunk of `pad` zero bytes (fake compressed stream — structure, not
    * content) + IEND. Total size = 57 + pad bytes (8 sig + 25 IHDR +
    * 12+pad IDAT + 12 IEND); q40's oracle relies on that constant,
    * ImageHeadersSpec pins it.
    */
  def syntheticPng(w: Int, h: Int, pad: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(57 + pad)
    PngSig.foreach(out.write)
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, colour type 2 (truecolor)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", new Array[Byte](pad))
    writeChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val len = new Array[Byte](4); putBe32(len, 0, data.length); out.write(len, 0, 4)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(tb); crc.update(data)
    val cb = new Array[Byte](4); putBe32(cb, 0, crc.getValue.toInt); out.write(cb, 0, 4)
  }

  /** Structurally valid JFIF: SOI + APP0 + a COM segment of `pad` bytes +
    * SOF0 (one 8-bit component) + EOI. Total size = 39 + pad bytes
    * (2 + 18 + 4+pad + 13 + 2); q40's oracle relies on that constant,
    * ImageHeadersSpec pins it.
    */
  def syntheticJpeg(w: Int, h: Int, pad: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(39 + pad)
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    out.write(0); out.write(16)      // len = 16: JFIF\0 1.1, dpi 1x1, no thumb
    out.write("JFIF".getBytes("US-ASCII"), 0, 4); out.write(0)
    out.write(1); out.write(1); out.write(0)
    out.write(0); out.write(1); out.write(0); out.write(1)
    out.write(0); out.write(0)
    out.write(0xff); out.write(0xfe) // COM carrying the pad bytes
    val clen = pad + 2
    out.write((clen >> 8) & 0xff); out.write(clen & 0xff)
    out.write(new Array[Byte](pad), 0, pad)
    out.write(0xff); out.write(0xc0) // SOF0
    out.write(0); out.write(11)      // len: 2 + precision 1 + h 2 + w 2 + 1 + comp 3
    out.write(8)                     // precision
    out.write((h >> 8) & 0xff); out.write(h & 0xff)
    out.write((w >> 8) & 0xff); out.write(w & 0xff)
    out.write(1)                     // one component
    out.write(1); out.write(0x11); out.write(0)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }
}
