package graft.spark

import graft.functions.VideoHeaders
import org.scalatest.funsuite.AnyFunSuite

/** The MP4 box walker: correct mvhd v0/v1 parsing, the 64-bit largesize
  * escape, unknown-box skipping at top level and inside moov, closed-form
  * synthetic byte lengths (which the q144 oracle relies on), and loud
  * refusal of structural garbage.
  */
class VideoHeadersSpec extends AnyFunSuite {

  test("v0 synthesis round-trips; byte length is 160 + 2*pad") {
    for (pad <- 0 to 6) {
      val b = VideoHeaders.syntheticMp4(1000, 2500L, pad, v1 = false)
      assert(b.length == 160 + 2 * pad)
      val info = VideoHeaders.decodeMp4(b).get
      assert(info.brand == "isom")
      assert(info.timescale == 1000L && info.duration == 2500L)
      assert(info.durationMicros == 2500000L)
      assert(info.topBoxes == 4) // ftyp, moov, free, mdat
    }
  }

  test("v1 synthesis (64-bit mvhd fields + largesize mdat); length 180 + 2*pad") {
    for (pad <- 0 to 6) {
      val b = VideoHeaders.syntheticMp4(90000, 123456789L, pad, v1 = true)
      assert(b.length == 180 + 2 * pad)
      val info = VideoHeaders.decodeMp4(b).get
      assert(info.timescale == 90000L && info.duration == 123456789L)
      assert(info.durationMicros == 123456789L * 1000000L / 90000L)
    }
  }

  test("unknown boxes are skipped at both levels (free inside moov, free top-level)") {
    // syntheticMp4 already embeds both; corrupting the free tag to an
    // arbitrary fourcc must not change the parse
    val b = VideoHeaders.syntheticMp4(600, 60L, 3, v1 = false)
    val idx = indexOfTag(b, "free")
    b(idx) = 'z'.toByte // "zree" — still just an unknown box
    val info = VideoHeaders.decodeMp4(b).get
    assert(info.timescale == 600L && info.duration == 60L)
  }

  test("structural garbage refuses: truncation, undersized box, bad version") {
    val good = VideoHeaders.syntheticMp4(1000, 100L, 2, v1 = false)
    assert(VideoHeaders.decodeMp4(good.take(good.length - 1)).isEmpty)
    assert(VideoHeaders.decodeMp4(good.take(10)).isEmpty)
    assert(VideoHeaders.decodeMp4(Array[Byte](0, 0, 0, 4, 'f', 't')).isEmpty)
    val badVersion = good.clone()
    badVersion(indexOfTag(badVersion, "mvhd") + 4) = 7 // unsupported mvhd version
    assert(VideoHeaders.decodeMp4(badVersion).isEmpty)
    assert(VideoHeaders.decodeMp4(null).isEmpty)
    assert(VideoHeaders.decodeMp4(Array.emptyByteArray).isEmpty)
  }

  test("size-0 box (extends to EOF) is accepted as the final box") {
    val base = VideoHeaders.syntheticMp4(1000, 100L, 0, v1 = false)
    // rewrite the trailing mdat's size to 0 (to-EOF form)
    val mdatAt = indexOfTag(base, "mdat") - 4
    base(mdatAt) = 0; base(mdatAt + 1) = 0; base(mdatAt + 2) = 0; base(mdatAt + 3) = 0
    val info = VideoHeaders.decodeMp4(base).get
    assert(info.timescale == 1000L)
  }

  private def indexOfTag(b: Array[Byte], tag: String): Int = {
    val t = tag.getBytes("US-ASCII")
    (0 until b.length - 3).find(i =>
      b(i) == t(0) && b(i + 1) == t(1) && b(i + 2) == t(2) && b(i + 3) == t(3))
      .getOrElse(fail(s"no $tag box"))
  }
}
