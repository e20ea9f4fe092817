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

  test("Encode round-trips through the decoders (m08's volume path)") {
    // the throughput row's epistemics: round-trip equality here plus
    // the cross-language corpus pins above — see Encode scaladoc
    val codec = new ImageCodec.Handle
    for (seed <- Seq(0, 13, 96)) {
      val rgb = Array.tabulate(16 * 16 * 3) { i =>
        val p = i / 3; val x = p % 16; val y = p / 16
        ((seed * 7 + x * 5 + y * 11 + i % 3 * 31) % 256)
      }
      val png = codec.decode(ImageCodec.Encode.png(16, 16, rgb))
      assert(png.width === 16 && png.height === 16)
      assert(png.rgb.toSeq === rgb.toSeq, s"png round-trip seed=$seed")
      val bmp = codec.decode(ImageCodec.Encode.bmp(16, 16, rgb))
      assert(bmp.rgb.toSeq === rgb.toSeq, s"bmp round-trip seed=$seed")
    }
    // non-4-aligned width exercises encoder stride padding too
    val rgb5 = Array.tabulate(5 * 3 * 3)(i => (i * 37) % 256)
    val bmp5 = codec.decode(ImageCodec.Encode.bmp(5, 3, rgb5))
    assert(bmp5.width === 5 && bmp5.height === 3)
    assert(bmp5.rgb.toSeq === rgb5.toSeq, "padded bmp round-trip")
  }

  test("truncated PNG zlib stream fails loudly, never hangs") {
    // round-12 advice fix: Inflater.inflate returns 0 with
    // finished()==false on a short stream — the decode loop must break
    // and let the length require report, not spin forever. Rebuild the
    // PNG with the IDAT BODY halved but chunk framing intact (the
    // walker must stay in-bounds so the inflate loop is what's
    // exercised; CRCs are not verified by the decoder).
    val rgb = Array.tabulate(16 * 16 * 3)(i => (i * 17) % 256)
    val full = ImageCodec.Encode.png(16, 16, rgb)
    def be32(o: Int): Int =
      ((full(o) & 0xFF) << 24) | ((full(o + 1) & 0xFF) << 16) |
        ((full(o + 2) & 0xFF) << 8) | (full(o + 3) & 0xFF)
    val out = new java.io.ByteArrayOutputStream()
    out.write(full, 0, 8)
    var pos = 8
    while (pos + 8 <= full.length) {
      val len = be32(pos)
      val tag = new String(full, pos + 4, 4, "US-ASCII")
      if (tag == "IDAT") {
        val nl = len / 2
        out.write(Array((nl >>> 24).toByte, (nl >>> 16).toByte,
          (nl >>> 8).toByte, nl.toByte), 0, 4)
        out.write(full, pos + 4, 4)       // tag
        out.write(full, pos + 8, nl)      // halved body
        out.write(full, pos + 8 + len, 4) // stale CRC (unchecked)
      } else out.write(full, pos, 12 + len)
      pos += 12 + len
    }
    val e = intercept[IllegalArgumentException] {
      new ImageCodec.Handle().decodePng(out.toByteArray)
    }
    assert(e.getMessage.contains("PNG stream short"))
  }
}
