package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Jpeg
import graft.multimodal.Jpeg.Gray

/** Baseline JPEG is LOSSY, so the contract is not bit-round-trip but:
  * valid JFIF structure, exact dimensions (incl. non-multiple-of-8 with
  * edge replication), deterministic encode AND decode, and reconstruction
  * within a PSNR bound appropriate to the content class.
  */
class JpegSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Gray =
    Gray(w, h, Array.tabulate[Byte](w * h)(i => ((i % w) * 255 / math.max(1, w - 1)).toByte))

  private def noise(w: Int, h: Int): Gray =
    Gray(w, h, Array.tabulate[Byte](w * h)(i => (((i * 2654435761L) >>> 9) % 256).toByte))

  test("smooth content round-trips above 30 dB PSNR; dims exact") {
    for ((w, h) <- Seq((64, 64), (48, 32), (100, 52), (17, 9), (8, 8), (1, 1))) {
      val img = gradient(w, h)
      val back = Jpeg.decode(Jpeg.encode(img))
      assert(back.width == w && back.height == h, s"${w}x$h dims")
      val p = Jpeg.psnr(img, back)
      assert(p > 30.0, s"${w}x$h gradient PSNR $p dB")
    }
  }

  test("constant image is near-lossless (DC-only blocks)") {
    val img = Gray(40, 24, Array.fill[Byte](40 * 24)(200.toByte))
    val p = Jpeg.psnr(img, Jpeg.decode(Jpeg.encode(img)))
    assert(p > 40.0, s"constant-image PSNR $p dB")
  }

  test("encode and decode are deterministic; noise survives decode") {
    val img = noise(72, 40)
    val e1 = Jpeg.encode(img)
    val e2 = Jpeg.encode(img)
    assert(e1.sameElements(e2), "encode must be byte-deterministic")
    val d1 = Jpeg.decode(e1)
    val d2 = Jpeg.decode(e1)
    assert(d1.pixels.sameElements(d2.pixels), "decode must be deterministic")
    assert(Jpeg.psnr(img, d1) > 15.0) // noise quantizes hard but must survive
  }

  test("JFIF structure: SOI/EOI framing, rejects non-JPEG and progressive markers") {
    val bytes = Jpeg.encode(gradient(16, 16))
    assert((bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8, "SOI")
    assert((bytes(bytes.length - 2) & 0xff) == 0xFF &&
      (bytes(bytes.length - 1) & 0xff) == 0xD9, "EOI")
    assert(new String(bytes, 6, 4, "US-ASCII") == "JFIF")
    intercept[IllegalArgumentException](Jpeg.decode("not a jpeg".getBytes))
    // flip SOF0 -> SOF2 (progressive): decoder must refuse loudly
    val prog = bytes.clone()
    val sof = prog.indices.find(i => (prog(i) & 0xff) == 0xFF && (prog(i + 1) & 0xff) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    intercept[IllegalArgumentException](Jpeg.decode(prog))
  }

  test("compression is real on smooth content") {
    val img = gradient(256, 256)
    val enc = Jpeg.encode(img)
    assert(enc.length < img.pixels.length / 4,
      s"expected >4x compression on a gradient, got ${img.pixels.length}->${enc.length}")
  }
}
