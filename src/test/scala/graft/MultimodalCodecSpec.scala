package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The REAL (codec-free) media parsers: binary PPM and PCM-16 WAVE.
  * The catalog entry (q_multimodal_codec) pins the happy path against a
  * DuckDB arithmetic oracle; this spec pins the parser EDGES — header
  * comments, chunk order, padding, torn payloads — and the
  * nearest-neighbor PPM resize as a real pixel operation.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  test("PPM: header comments and arbitrary whitespace parse; torn planes refuse") {
    val px = Array.tabulate[Byte](3 * 2 * 2)(i => (i * 11 + 3).toByte)
    val header = "P6 # a comment\n# another line\n 2\t2 # dims\n255\n"
    val ok = header.getBytes("US-ASCII") ++ px
    val Some((w, h, sums)) = Multimodal.decodePpm(ok)
    assert(w == 2 && h == 2)
    assert(sums.toSeq == Seq(
      (0 until 12 by 3).map(i => (px(i) & 0xFF).toLong).sum,
      (1 until 12 by 3).map(i => (px(i) & 0xFF).toLong).sum,
      (2 until 12 by 3).map(i => (px(i) & 0xFF).toLong).sum))
    // plane short by one byte -> not served as an image
    assert(Multimodal.decodePpm(ok.dropRight(1)).isEmpty)
    // 16-bit maxval (> 255) is out of scope -> refuse, don't mis-sum
    assert(Multimodal.decodePpm("P6\n2 2\n65535\n".getBytes ++ px).isEmpty)
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes ++ px).isEmpty)
  }

  test("WAV: data-before-fmt chunk order, odd-size padding, non-PCM refusal") {
    def chunk(tag: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(tag.getBytes("US-ASCII")).putInt(body.length).put(body)
      b.array()
    }
    val fmt = {
      val b = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putShort(1).putShort(2).putInt(44100).putInt(176400).putShort(4).putShort(16)
      b.array()
    }
    val samples = Array[Short](100, -200, 300, -400)
    val data = {
      val b = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(b.putShort); b.array()
    }
    // an odd-sized junk chunk BEFORE fmt/data: the walk must pad to even
    val junk = chunk("LIST", Array[Byte](1, 2, 3))
    val wav = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++ "WAVE".getBytes ++
      junk ++ chunk("data", data) ++ chunk("fmt ", fmt)
    val Some((rate, ch, n, sumAbs)) = Multimodal.decodeWav(wav)
    assert(rate == 44100 && ch == 2 && n == 4)
    assert(sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    // non-PCM format code refuses
    val badFmt = fmt.clone(); badFmt(0) = 3
    assert(Multimodal.decodeWav("RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes ++ chunk("fmt ", badFmt) ++ chunk("data", data)).isEmpty)
    assert(Multimodal.decodeWav(wav.take(20)).isEmpty)
  }

  test("synthetic fixtures roundtrip their generating arithmetic") {
    for (id <- Seq(0L, 1L, 7L, 12L, 49L, 1234L)) {
      val Some((w, h, sums)) = Multimodal.decodePpm(Multimodal.syntheticPpm(id))
      assert(w == (id % 13 + 2).toInt && h == (id % 7 + 2).toInt)
      val expect = Array.tabulate(3)(c =>
        (0 until w * h).map(p => (id * 31 + 3 * p + c) % 256).sum)
      assert(sums.toSeq == expect.toSeq, s"id $id channel sums")
      val Some((rate, ch, n, sumAbs)) = Multimodal.decodeWav(Multimodal.syntheticWav(id))
      assert(rate == 8000 && ch == 1 && n == (id % 50 + 10).toInt)
      assert(sumAbs == (0 until n).map(i => math.abs((id * 7 + 13L * i) % 2001 - 1000)).sum)
    }
  }

  test("JDK codecs: PNG/BMP round-trip exact pixels, JPEG dims, AIFF samples") {
    for (id <- Seq(0L, 3L, 12L, 49L, 777L)) {
      val w = (id % 13 + 2).toInt; val h = (id % 7 + 2).toInt
      val expectSums = Array.tabulate(3)(c =>
        (0 until w * h).map(p => (id * 31 + 3 * p + c) % 256).sum)
      for (fmt <- Seq("png", "bmp")) { // lossless: exact channel sums
        val Some((f, w2, h2, sums)) =
          Multimodal.decodeImage(Multimodal.syntheticImage(id, fmt))
        assert(f == fmt && w2 == w && h2 == h)
        assert(sums.toSeq == expectSums.toSeq, s"id $id $fmt channel sums")
      }
      val Some((fj, wj, hj, _)) = // lossy: dims+format only
        Multimodal.decodeImage(Multimodal.syntheticImage(id, "jpeg"))
      assert(fj == "jpeg" && wj == w && hj == h)
      val Some((container, rate, ch, n, sumAbs)) =
        Multimodal.decodeAudio(Multimodal.syntheticAiff(id))
      assert(container == "aiff" && rate == 8000 && ch == 1 && n == (id % 50 + 10).toInt)
      assert(sumAbs == (0 until n).map(i => math.abs((id * 7 + 13L * i) % 2001 - 1000)).sum)
    }
    // sniff refuses non-image bytes; a sniffed-but-truncated PNG decodes to None
    assert(Multimodal.sniffImageFormat("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Multimodal.syntheticImage(5L, "png").take(20)).isEmpty)
  }

  test("GIF and TIFF round-trip through the JDK writers/readers") {
    // GIF: palette format — seed from a 4-color palette so the writer's
    // 256-color quantizer is lossless and sums replay exactly
    val w = 9; val h = 7
    val palette = Array(0x102030, 0x405060, 0x708090, 0xA0B0C0)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (p <- 0 until w * h) img.setRGB(p % w, p / w, palette(p % 4))
    val expect = Array.tabulate(3)(c =>
      (0 until w * h).map { p =>
        ((palette(p % 4) >> (16 - 8 * c)) & 0xFF).toLong
      }.sum)
    for (fmt <- Seq("gif", "tiff")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
      val Some((f, w2, h2, sums)) = Multimodal.decodeImage(bos.toByteArray)
      assert(f == fmt && w2 == w && h2 == h, s"$fmt dims/format")
      assert(sums.toSeq == expect.toSeq, s"$fmt channel sums")
    }
  }

  test("NN resize of a compressed image replays the generating arithmetic") {
    val id = 17L // 6x5 source
    val src = Multimodal.syntheticImage(id, "png")
    val Some((_, w, h, _)) = Multimodal.decodeImage(src)
    val Some(resized) = Multimodal.resizeImage(src, 3, 2)
    val Some((fmt, w2, h2, sums)) = Multimodal.decodeImage(resized)
    assert(fmt == "png" && w2 == 3 && h2 == 2)
    val expect = new Array[Long](3)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3) {
      val sy = y.toLong * h / 2; val sx = x.toLong * w / 3
      expect(c) += (id * 31 + 3 * (sy * w + sx) + c) % 256
    }
    assert(sums.toSeq == expect.toSeq)
    // audio bytes and malformed targets refuse
    assert(Multimodal.resizeImage(Multimodal.syntheticAiff(id), 2, 2).isEmpty)
    assert(Multimodal.resizeImage(src, 0, 2).isEmpty)
    assert(Multimodal.resizeImage(src, 1 << 16, 1 << 15).isEmpty)
  }

  test("nearest-neighbor PPM resize: dims change, pixels come from source grid") {
    val id = 17L
    val src = Multimodal.syntheticPpm(id) // 6x5
    val Some((w, h, _)) = Multimodal.decodePpm(src)
    val Some(resized) = Multimodal.resizePpm(src, 3, 2)
    val Some((w2, h2, sums2)) = Multimodal.decodePpm(resized)
    assert(w2 == 3 && h2 == 2)
    // replay nearest-neighbor selection against the generating arithmetic
    val headerLen = s"P6\n$w $h\n255\n".length
    val expect = new Array[Long](3)
    for (y <- 0 until 2; x <- 0 until 3; c <- 0 until 3) {
      val sy = y.toLong * h / 2; val sx = x.toLong * w / 3
      val j = 3 * (sy.toInt * w + sx.toInt) + c
      expect(c) += (src(headerLen + j) & 0xFF).toLong
    }
    assert(sums2.toSeq == expect.toSeq)
    // resizing audio bytes is a type error, not garbage output
    assert(Multimodal.resizePpm(Multimodal.syntheticWav(id), 2, 2).isEmpty)
    // malformed TARGET dims refuse like malformed input does (ADVICE r10):
    // non-positive would NegativeArraySize, huge would overflow 3*w*h
    assert(Multimodal.resizePpm(src, 0, 2).isEmpty)
    assert(Multimodal.resizePpm(src, 3, -1).isEmpty)
    assert(Multimodal.resizePpm(src, 1 << 16, 1 << 15).isEmpty)
  }
}
