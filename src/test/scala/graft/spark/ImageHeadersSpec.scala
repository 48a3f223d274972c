package graft.spark

import graft.functions.ImageHeaders
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** The dimension decoder against an INDEPENDENT encoder: images produced
  * by the JDK's own ImageIO writers (real PNG + real baseline JPEG) must
  * decode to their true dimensions; the synthetic builders must round-trip
  * and keep the byte-size constants q40's oracle depends on; garbage and
  * truncated streams must refuse rather than misreport.
  */
class ImageHeadersSpec extends AnyFunSuite {

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    // non-constant pixels so the JPEG writer emits a realistic stream
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"no $fmt writer available")
    out.toByteArray
  }

  private val dims = Seq((1, 1), (16, 16), (63, 17), (640, 480), (300, 5000))

  test("ImageIO-encoded PNGs decode to their true dimensions") {
    for ((w, h) <- dims) {
      assert(ImageHeaders.decodeDims(imageBytes("png", w, h)) == Some(("png", w, h)))
    }
  }

  test("ImageIO-encoded JPEGs decode to their true dimensions") {
    for ((w, h) <- dims) {
      assert(ImageHeaders.decodeDims(imageBytes("jpg", w, h)) == Some(("jpeg", w, h)))
    }
  }

  test("synthetic builders round-trip and keep their documented sizes") {
    for ((w, h) <- dims; pad <- Seq(0, 1, 100)) {
      val p = ImageHeaders.syntheticPng(w, h, pad)
      assert(ImageHeaders.decodeDims(p) == Some(("png", w, h)))
      assert(p.length == 57 + pad, s"png size w=$w h=$h pad=$pad: ${p.length}")
      val j = ImageHeaders.syntheticJpeg(w, h, pad)
      assert(ImageHeaders.decodeDims(j) == Some(("jpeg", w, h)))
      assert(j.length == 39 + pad, s"jpeg size w=$w h=$h pad=$pad: ${j.length}")
    }
  }

  test("synthetic PNGs satisfy the JDK reader (structure really is valid)") {
    // dims-only check: the IDAT stream is fake, but ImageIO's PNG reader
    // parses the IHDR header eagerly and reports dimensions
    val bytes = ImageHeaders.syntheticPng(40, 25, 10)
    val it = ImageIO.getImageReaders(
      ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes)))
    assert(it.hasNext, "JDK found no reader for the synthetic PNG")
    val reader = it.next()
    reader.setInput(ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes)))
    assert(reader.getWidth(0) == 40 && reader.getHeight(0) == 25)
  }

  test("garbage, truncation, and dimension-free streams refuse") {
    assert(ImageHeaders.decodeDims(Array[Byte]()).isEmpty)
    assert(ImageHeaders.decodeDims("not an image at all".getBytes).isEmpty)
    val png = ImageHeaders.syntheticPng(10, 10, 0)
    assert(ImageHeaders.decodeDims(png.take(20)).isEmpty) // IHDR cut short
    val jpeg = ImageHeaders.syntheticJpeg(10, 10, 0)
    assert(ImageHeaders.decodeDims(jpeg.take(6)).isEmpty)
    // SOI + EOI only: a JPEG with no frame header has no dimensions
    assert(ImageHeaders.decodeDims(
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
  }
}
