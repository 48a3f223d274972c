package graft.functions

import java.io.ByteArrayOutputStream

/** Pure-JVM audio header codec for the multimodal pipeline (SURVEY §2.11
  * "multimodal columns", audio lane): extracts the true stream parameters
  * from WAV byte streams by walking the real RIFF container — little-
  * endian chunk framing with word alignment (RIFF spec: every odd-sized
  * chunk is followed by a pad byte), the `fmt ` chunk's
  * (audioFormat, channels, sampleRate, blockAlign, bitsPerSample) fields,
  * and the `data` chunk's payload length. Unknown chunks (LIST/INFO,
  * cue, bext, ...) are skipped by their declared sizes, exactly as a real
  * reader must.
  *
  * Only the header bytes up to the `data` chunk are touched for metadata
  * extraction — the 100 TB posture: duration/channel/rate audits over an
  * audio corpus are I/O-bound on a few dozen bytes per object. Sample-
  * level DSP ([[rmsAndPeak]]) reads the PCM payload and slots into the
  * same mapPartitions batch shape when a pipeline opts in.
  *
  * The synthetic builder fabricates structurally valid PCM WAV streams
  * (correct RIFF sizes, pad bytes, an optional LIST chunk) with a
  * deterministic sample pattern — the sandbox ships no audio files, so
  * the gates generate their own; the DECODER is the real operator and is
  * additionally validated against the JDK's javax.sound.sampled reader
  * in AudioHeadersSpec.
  *
  * Reference analog: none — the reference engine (SURVEY §2) stops at
  * byte-stream parsing; this extends the repo's multimodal surface the
  * same way ImageHeaders does for PNG/JPEG.
  */
object AudioHeaders {

  /** Decoded WAV stream parameters. `dataBytes` is the PCM payload length;
    * frames = dataBytes / blockAlign; duration follows from sampleRate.
    */
  final case class WavInfo(
      audioFormat: Int, // 1 = PCM integer, 3 = IEEE float
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      blockAlign: Int,
      dataBytes: Long,
      dataOffset: Int) {
    def frames: Long = if (blockAlign > 0) dataBytes / blockAlign else 0L
    def durationMicros: Long =
      if (sampleRate > 0) frames * 1000000L / sampleRate else 0L
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def fourcc(b: Array[Byte], i: Int, a: Char, c2: Char, c3: Char, c4: Char): Boolean =
    b(i) == a.toByte && b(i + 1) == c2.toByte && b(i + 2) == c3.toByte && b(i + 3) == c4.toByte

  /** Walk the RIFF structure and return the stream parameters, or None
    * when the bytes are not a parsable WAV (wrong magic, truncated chunk
    * framing, no `fmt `/`data`). A `data` chunk whose declared size runs
    * past the buffer is clamped to the bytes actually present (streamed
    * WAVs in the wild declare 0xFFFFFFFF), keeping frames/duration
    * honest for what is really there.
    */
  def decodeWav(b: Array[Byte]): Option[WavInfo] = {
    if (b.length < 12) return None
    if (!fourcc(b, 0, 'R', 'I', 'F', 'F') || !fourcc(b, 8, 'W', 'A', 'V', 'E')) return None
    var i = 12
    var fmt: (Int, Int, Int, Int, Int) = null // format, ch, rate, align, bits
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      val body = i + 8
      if (fourcc(b, i, 'f', 'm', 't', ' ')) {
        if (size < 16 || body + 16 > b.length) return None
        fmt = (le16(b, body), le16(b, body + 2), le32(b, body + 4).toInt,
          le16(b, body + 12), le16(b, body + 14))
      } else if (fourcc(b, i, 'd', 'a', 't', 'a')) {
        if (fmt == null) return None // fmt must precede data (spec order)
        val (af, ch, rate, align, bits) = fmt
        if (ch <= 0 || rate <= 0 || align <= 0) return None
        val avail = (b.length - body).toLong
        return Some(WavInfo(af, ch, rate, bits, align, math.min(size, avail), body))
      }
      // skip unknown chunk; odd sizes carry one pad byte (word alignment)
      val step = size + (size & 1L)
      if (step > Int.MaxValue || body + step > b.length) return None
      i = body + step.toInt
    }
    None
  }

  /** Deterministic PCM16 sample value for frame `i`, channel `c` — a
    * triangle-ish integer pattern both the builder and any verifier can
    * recompute exactly (no trig, no floats).
    */
  def sampleValue(i: Long, c: Int): Short = {
    val period = 400 + 37 * c
    val phase = (i % period).toInt
    val amp = 6000 + 500 * c
    (if (phase < period / 2) -amp + (4 * amp * phase) / period
     else 3 * amp - (4 * amp * phase) / period).toShort
  }

  /** Structurally valid PCM16 WAV: RIFF size fields, fmt chunk, an
    * optional odd-sized LIST/INFO chunk (exercises the mandatory pad
    * byte in any real walker), interleaved deterministic samples.
    */
  def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int,
      listBytes: Int = 0): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0)
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val out = new ByteArrayOutputStream(44 + dataSize + listBytes + 16)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
      out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = s.foreach(c => out.write(c.toInt))
    val listChunk = if (listBytes > 0) 8 + listBytes + (listBytes & 1) else 0
    tag("RIFF"); w32(4 + listChunk + 24 + 8 + dataSize); tag("WAVE")
    if (listBytes > 0) {
      tag("LIST"); w32(listBytes)
      (0 until listBytes).foreach(j => out.write('I' + (j % 13)))
      if ((listBytes & 1) == 1) out.write(0) // pad byte: odd chunk sizes
    }
    tag("fmt "); w32(16)
    w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate.toLong * blockAlign); w16(blockAlign); w16(16)
    tag("data"); w32(dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) { w16(sampleValue(i, c) & 0xffff); c += 1 }
      i += 1
    }
    out.toByteArray
  }

  /** Real sample-level DSP over the PCM16 payload: per-channel-interleaved
    * RMS (rounded down to a Long of squared-sum scale) and peak |sample|.
    * One pass over the data bytes — the batch-shape partner to header-
    * only metadata extraction.
    */
  def rmsAndPeak(b: Array[Byte], info: WavInfo): (Double, Int) = {
    val start = info.dataOffset
    var sumSq = 0.0
    var peak = 0
    var i = 0
    val n = (info.dataBytes / 2).toInt
    while (i < n) {
      val off = start + i * 2
      val s = ((b(off) & 0xff) | (b(off + 1) << 8)).toShort.toInt
      sumSq += s.toDouble * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    (if (n == 0) 0.0 else math.sqrt(sumSq / n), peak)
  }
}
