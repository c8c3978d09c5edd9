package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaCodec

/** Byte-level codec tests: encode→decode must round-trip pixel- and
  * sample-exact, and the decoder must reject malformed containers
  * rather than produce garbage features.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def det(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 131 + seed * 31 + 7) % 251).toByte)

  test("BMP round-trips pixels exactly, including padded row widths") {
    // w=3 → rowSize 12 (pad 3), w=4 → rowSize 12 (pad 0), w=5 → pad 1
    for ((w, h) <- Seq((3, 2), (4, 4), (5, 3), (16, 11), (1, 1))) {
      val rgb = det(w * h * 3, w * 100 + h)
      val enc = MediaCodec.encodeBmp(w, h, rgb)
      assert(enc.length == MediaCodec.bmpSize(w, h))
      val (dw, dh, back) = MediaCodec.decodeBmp(enc)
      assert((dw, dh) == (w, h))
      assert(back.toSeq == rgb.toSeq, s"pixel mismatch at ${w}x$h")
    }
  }

  test("BMP header fields are genuine little-endian values") {
    val enc = MediaCodec.encodeBmp(5, 3, det(45, 1))
    assert(enc(0) == 'B' && enc(1) == 'M')
    // fileSize LE at offset 2: rowSize(5*3→16) * 3 + 54 = 102
    val fileSize = (enc(2) & 0xff) | ((enc(3) & 0xff) << 8) |
      ((enc(4) & 0xff) << 16) | ((enc(5) & 0xff) << 24)
    assert(fileSize == enc.length)
    assert((enc(28) & 0xff) == 24)       // bpp
  }

  test("BMP decoder rejects bad magic and wrong bpp") {
    val good = MediaCodec.encodeBmp(4, 2, det(24, 2))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badMagic))
    val badBpp = good.clone(); badBpp(28) = 8
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(badBpp))
  }

  test("WAV round-trips samples and sample rate exactly") {
    val samples = Array.tabulate(777)(i => ((i * 257 - 4000) % 32768).toShort)
    val enc = MediaCodec.encodeWav(8000, samples)
    assert(enc.length == MediaCodec.wavSize(samples.length))
    val (sr, back) = MediaCodec.decodeWav(enc)
    assert(sr == 8000)
    assert(back.toSeq == samples.toSeq)
  }

  test("WAV decoder walks unknown chunks (LIST before data) and pad bytes") {
    val samples = Array[Short](1, -2, 300, -32768, 32767)
    val canonical = MediaCodec.encodeWav(44100, samples)
    // splice an odd-sized junk chunk between fmt and data
    val junkBody = Array[Byte]('j', 'u', 'n')           // size 3 → 1 pad byte
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0) ++ junkBody ++ Array[Byte](0)
    val spliced = canonical.take(36) ++ junk ++ canonical.drop(36)
    // fix RIFF size field
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    val (sr, back) = MediaCodec.decodeWav(spliced)
    assert(sr == 44100)
    assert(back.toSeq == samples.toSeq)
  }

  test("WAV decoder rejects non-RIFF and non-PCM input") {
    intercept[IllegalArgumentException](
      MediaCodec.decodeWav("nonsense bytes here".getBytes))
    val nonPcm = MediaCodec.encodeWav(8000, Array[Short](1, 2))
    nonPcm(20) = 3                                      // IEEE float format tag
    intercept[IllegalArgumentException](MediaCodec.decodeWav(nonPcm))
  }

  test("concatenated-BMP video round-trips every frame in order") {
    val frames = (0 until 7).map(f => det(4 * 4 * 3, f))
    val enc = MediaCodec.encodeBmpVideo(4, 4, frames)
    assert(enc.length == 7 * MediaCodec.bmpSize(4, 4))
    val back = MediaCodec.decodeBmpVideo(enc)
    assert(back.length == 7)
    back.zip(frames).foreach { case ((w, h, rgb), orig) =>
      assert((w, h) == (4, 4))
      assert(rgb.toSeq == orig.toSeq)
    }
  }
}
