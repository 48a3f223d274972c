package graft.spark

import graft.functions.AudioHeaders
import org.scalatest.funsuite.AnyFunSuite

/** The WAV walker is validated two ways: (1) differentially against the
  * JDK's own javax.sound.sampled reader over the synthetic streams — an
  * independent implementation of the same spec must agree on rate,
  * channels, bits, and frame count; (2) structurally — odd-chunk pad
  * bytes, unknown-chunk skipping, truncation, and garbage must behave
  * exactly as the RIFF spec demands.
  */
class AudioHeadersSpec extends AnyFunSuite {

  private def jdkFormat(b: Array[Byte]) = {
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(b))
    (aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
      aff.getFormat.getSampleSizeInBits, aff.getFrameLength)
  }

  test("decode agrees with the JDK reader across rates/channels/frame counts") {
    for {
      rate <- Seq(8000, 16000, 44100)
      ch <- Seq(1, 2)
      n <- Seq(0, 1, 441, 1000)
    } {
      val b = AudioHeaders.syntheticWav(rate, ch, n)
      val info = AudioHeaders.decodeWav(b).getOrElse(fail(s"undecodable $rate/$ch/$n"))
      assert(info.audioFormat == 1 && info.channels == ch &&
        info.sampleRate == rate && info.bitsPerSample == 16 &&
        info.blockAlign == ch * 2 && info.frames == n)
      val (jr, jc, jb, jf) = jdkFormat(b)
      assert((jr, jc, jb) == (rate, ch, 16), s"JDK disagrees on format for $rate/$ch/$n")
      assert(jf == n, s"JDK disagrees on frame count for $rate/$ch/$n")
    }
  }

  test("unknown chunks are skipped with correct odd-size padding") {
    for (listBytes <- Seq(7, 8, 33)) { // odd sizes force the pad byte
      val b = AudioHeaders.syntheticWav(16000, 1, 50, listBytes = listBytes)
      val info = AudioHeaders.decodeWav(b).get
      assert(info.frames == 50 && info.sampleRate == 16000)
      val (jr, jc, _, jf) = jdkFormat(b)
      assert(jr == 16000 && jc == 1 && jf == 50,
        s"JDK rejects the LIST-chunk layout at $listBytes bytes")
    }
  }

  test("duration and DSP are exact over the deterministic pattern") {
    val b = AudioHeaders.syntheticWav(8000, 2, 4000)
    val info = AudioHeaders.decodeWav(b).get
    assert(info.durationMicros == 500000L) // 4000 frames @ 8 kHz = 0.5 s
    val (rms, peak) = AudioHeaders.rmsAndPeak(b, info)
    // recompute directly from the generator
    var sumSq = 0.0
    var expectPeak = 0
    for (i <- 0L until 4000L; c <- 0 until 2) {
      val s = AudioHeaders.sampleValue(i, c).toInt
      sumSq += s.toDouble * s
      expectPeak = math.max(expectPeak, math.abs(s))
    }
    assert(peak == expectPeak)
    assert(math.abs(rms - math.sqrt(sumSq / 8000)) < 1e-9)
  }

  test("garbage, truncation, and missing chunks return None") {
    assert(AudioHeaders.decodeWav(Array.empty[Byte]).isEmpty)
    assert(AudioHeaders.decodeWav("not a wav at all".getBytes).isEmpty)
    val ok = AudioHeaders.syntheticWav(8000, 1, 100)
    // truncated mid-fmt: unparsable
    assert(AudioHeaders.decodeWav(ok.take(20)).isEmpty)
    // truncated mid-data: data length clamps to what is present
    val cut = ok.take(ok.length - 50)
    val info = AudioHeaders.decodeWav(cut).get
    assert(info.dataBytes == 200 - 50 && info.frames == 75)
    // RIFF magic but wrong form type
    val avi = ok.clone(); avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(AudioHeaders.decodeWav(avi).isEmpty)
    // a stream with no data chunk walks off the end cleanly
    assert(AudioHeaders.decodeWav(ok.take(36)).isEmpty)
  }
}
