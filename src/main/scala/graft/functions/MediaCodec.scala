package graft.functions

/** Real pure-JVM codecs for the multimodal column family: BMP (24-bpp
  * uncompressed images), WAV (PCM16 mono audio), and a concatenated-BMP
  * video container. No external libraries — the byte-level formats are
  * public and simple enough to implement directly, which turns the
  * multimodal DECODE step from a stub into a genuine parse: magic
  * numbers, little-endian header fields, row padding, chunk walking.
  *
  * Container shapes follow the published specs:
  *  - BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B) +
  *    bottom-up rows of BGR pixels, each row padded to a 4-byte
  *    boundary.
  *  - WAV: RIFF header + "fmt " chunk (PCM, mono, 16-bit) + "data"
  *    chunk of little-endian signed 16-bit samples; the decoder walks
  *    chunks generically (skipping unknown ones, honoring the odd-size
  *    pad byte) rather than assuming a fixed layout.
  *  - Video: frames as back-to-back BMPs; the parser advances by each
  *    frame's own fileSize header field — no out-of-band frame index.
  */
object MediaCodec {

  // ---- little-endian primitives ----
  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  // ================= BMP (24-bpp, bottom-up) =================

  final val BmpHeaderSize = 54

  /** Bytes on disk for a w×h 24-bpp BMP (rows pad to 4 bytes). */
  def bmpSize(width: Int, height: Int): Int =
    BmpHeaderSize + ((width * 3 + 3) / 4 * 4) * height

  /** Encode top-down row-major RGB triplets as a standards-compliant
    * 24-bpp BMP (stored bottom-up, BGR, rows 4-byte padded).
    */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"pixel buffer ${rgb.length} != ${width * height * 3}")
    val rowSize = (width * 3 + 3) / 4 * 4
    val fileSize = BmpHeaderSize + rowSize * height
    val out = new Array[Byte](fileSize)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, fileSize)
    putU32(out, 10, BmpHeaderSize)          // pixel data offset
    putU32(out, 14, 40)                     // BITMAPINFOHEADER size
    putU32(out, 18, width)
    putU32(out, 22, height)                 // positive = bottom-up
    putU16(out, 26, 1)                      // planes
    putU16(out, 28, 24)                     // bits per pixel
    putU32(out, 30, 0)                      // BI_RGB (uncompressed)
    putU32(out, 34, rowSize * height)       // image size
    var y = 0
    while (y < height) {
      val srcRow = y * width * 3
      val dstRow = BmpHeaderSize + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        // RGB (caller order) -> BGR (disk order)
        out(dstRow + x * 3) = rgb(srcRow + x * 3 + 2)
        out(dstRow + x * 3 + 1) = rgb(srcRow + x * 3 + 1)
        out(dstRow + x * 3 + 2) = rgb(srcRow + x * 3)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bpp uncompressed BMP starting at `off`; returns
    * (width, height, top-down row-major RGB triplets, container bytes
    * consumed). Rejects anything that is not the magic/bpp/compression
    * this encoder family writes — a decoder that silently accepts
    * garbage hides pipeline bugs.
    */
  def decodeBmpAt(bytes: Array[Byte], off: Int): (Int, Int, Array[Byte], Int) = {
    require(bytes.length - off >= BmpHeaderSize, "truncated BMP header")
    require(bytes(off) == 'B' && bytes(off + 1) == 'M', "bad BMP magic")
    val fileSize = u32(bytes, off + 2)
    val dataOff = u32(bytes, off + 10)
    val width = u32(bytes, off + 18)
    val rawH = u32(bytes, off + 22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    // validate dims BEFORE any size arithmetic: a corrupt header must
    // fail the reject-garbage contract cleanly, not via negative-array
    // or Int-overflow-masked out-of-bounds errors
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"bad BMP dims ${width}x$rawH")
    require(dataOff >= BmpHeaderSize && dataOff <= bytes.length - off,
      s"bad BMP data offset $dataOff")
    require(u16(bytes, off + 28) == 24, "not 24-bpp")
    require(u32(bytes, off + 30) == 0, "compressed BMP unsupported")
    val rowSize = (width * 3 + 3) / 4 * 4
    require(off.toLong + dataOff.toLong + rowSize.toLong * height <= bytes.length,
      "truncated BMP pixels")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = off + dataOff + (if (topDown) y else height - 1 - y) * rowSize
      val dstRow = y * width * 3
      var x = 0
      while (x < width) {
        rgb(dstRow + x * 3) = bytes(srcRow + x * 3 + 2)
        rgb(dstRow + x * 3 + 1) = bytes(srcRow + x * 3 + 1)
        rgb(dstRow + x * 3 + 2) = bytes(srcRow + x * 3)
        x += 1
      }
      y += 1
    }
    (width, height, rgb, fileSize)
  }

  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, rgb, _) = decodeBmpAt(bytes, 0)
    (w, h, rgb)
  }

  // ================= WAV (RIFF / PCM16 mono) =================

  final val WavHeaderSize = 44

  def wavSize(nSamples: Int): Int = WavHeaderSize + nSamples * 2

  /** Encode mono 16-bit PCM as a canonical RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataSize = samples.length * 2
    val out = new Array[Byte](WavHeaderSize + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16)                     // fmt chunk size
    putU16(out, 20, 1)                      // PCM
    putU16(out, 22, 1)                      // mono
    putU32(out, 24, sampleRate)
    putU32(out, 28, sampleRate * 2)         // byte rate
    putU16(out, 32, 2)                      // block align
    putU16(out, 34, 16)                     // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putU16(out, WavHeaderSize + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Parse a RIFF/WAVE container: walks the chunk list (any order,
    * unknown chunks skipped, odd sizes padded per spec) until it has
    * the fmt and data chunks. Returns (sampleRate, samples).
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 12, "truncated RIFF header")
    require(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F',
      "bad RIFF magic")
    require(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E',
      "not a WAVE file")
    var off = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = new String(bytes.slice(off, off + 4), "US-ASCII")
      val size = u32(bytes, off + 4)
      // a corrupt size field must fail cleanly: negative would walk the
      // chunk list backwards (infinite loop), oversized would read past
      // the buffer inside the fmt/data branches
      require(size >= 0 && off + 8 + size.toLong <= bytes.length,
        s"bad RIFF chunk size $size at offset $off")
      id match {
        case "fmt " =>
          require(u16(bytes, off + 8) == 1, "non-PCM WAV unsupported")
          require(u16(bytes, off + 10) == 1, "non-mono WAV unsupported")
          require(u16(bytes, off + 22) == 16, "not 16-bit PCM")
          sampleRate = u32(bytes, off + 12)
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = u16(bytes, off + 8 + i * 2).toShort
            i += 1
          }
        case _ => ()                        // skip unknown chunk
      }
      off += 8 + size + (size & 1)          // odd chunk sizes carry a pad byte
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (sampleRate, samples)
  }

  // ================= concatenated-BMP video =================

  /** Encode frames (each top-down RGB for the same w×h) back-to-back;
    * each frame is a self-describing BMP.
    */
  def encodeBmpVideo(width: Int, height: Int,
                     frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "empty frame list")
    // pre-sized single allocation: an iterator reduce(_ ++ _) would
    // recopy the growing prefix per frame — O(F^2) for F frames
    val frameSize = bmpSize(width, height)
    val out = new Array[Byte](frameSize * frames.length)
    frames.iterator.zipWithIndex.foreach { case (f, i) =>
      System.arraycopy(encodeBmp(width, height, f), 0, out, i * frameSize, frameSize)
    }
    out
  }

  /** Parse a concatenated-BMP stream into frames by walking each
    * frame's own fileSize field.
    */
  def decodeBmpVideo(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Int, Array[Byte])]
    var off = 0
    while (off < bytes.length) {
      val (w, h, rgb, consumed) = decodeBmpAt(bytes, off)
      out += ((w, h, rgb))
      require(consumed > 0, "zero-size frame")
      off += consumed
    }
    out.result()
  }
}
