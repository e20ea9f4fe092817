package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-JDK PNG/BMP decoders against the corpus's closed-form
  * pixel formula — the same arithmetic tools/gen_images.py wrote the
  * bytes from and the m02/m07 DuckDB oracles recompute. A decoder that
  * mis-reconstructs any PNG filter, flips BMP row order, swaps
  * channels, or mis-strides padding fails on exact pixel values here
  * (and would fail the oracle hash at query level). */
class ImageCodecSpec extends AnyFunSuite {

  private def expected(k: Int, x: Int, y: Int): (Int, Int, Int) = {
    val j = k % 48
    val r = (j * 3 + x * 5 + y * 7) % 256
    var g = (j * 11 + x * 13 + y * 17) % 256
    val b = (j * 19 + x * 23 + y * 29) % 256
    if (k >= 48 && x == 0 && y == 0) g = (g + 100) % 256
    (r, g, b)
  }

  private def check(k: Int): Unit = {
    val codec = new ImageCodec.Handle
    val bytes = ImageCodec.corpus().find(_._1 == k).get._3
    val img = codec.decode(bytes)
    assert(img.width === 16 && img.height === 16)
    for (y <- 0 until 16; x <- 0 until 16) {
      val o = (y * 16 + x) * 3
      val got = (img.rgb(o), img.rgb(o + 1), img.rgb(o + 2))
      assert(got === expected(k, x, y), s"img $k pixel ($x,$y)")
    }
  }

  test("PNG decode matches the closed form on every pixel (all filters)") {
    // even ids are PNG; the generator cycles filter = y % 5, so a
    // 16-row image exercises None/Sub/Up/Average/Paeth repeatedly.
    // k = 48 also covers the perturbed pixel.
    Seq(0, 2, 30, 48, 62).foreach(check)
  }

  test("BMP decode matches the closed form (bottom-up, BGR)") {
    Seq(1, 3, 31, 49, 63).foreach(check)
  }

  test("handle decodes the whole corpus with one reused inflater") {
    val codec = new ImageCodec.Handle
    val all = ImageCodec.corpus()
    assert(all.size === 64)
    val sizes = all.map { case (_, _, bytes) =>
      val img = codec.decode(bytes)
      (img.width, img.height)
    }
    assert(sizes.forall(_ == (16, 16)))
  }

  test("BMP stride padding: the 5x3 fixture decodes positionally") {
    val in = getClass.getResourceAsStream("/graft/media/img_pad_05x03.bmp")
    assert(in != null, "padding fixture missing")
    val bytes = try in.readAllBytes() finally in.close()
    val img = new ImageCodec.Handle().decodeBmp(bytes)
    assert(img.width === 5 && img.height === 3)
    for (y <- 0 until 3; x <- 0 until 5) {
      val o = (y * 5 + x) * 3
      assert(img.rgb(o) === (x * 40 + y) % 256, s"r at ($x,$y)")
      assert(img.rgb(o + 1) === (x * 7 + y * 3) % 256, s"g at ($x,$y)")
      assert(img.rgb(o + 2) === (x * 11 + y * 5) % 256, s"b at ($x,$y)")
    }
  }

  test("unknown magic is rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      new ImageCodec.Handle().decode(Array[Byte](1, 2, 3, 4, 5))
    }
    assert(e.getMessage.contains("unknown image magic"))
  }
}
