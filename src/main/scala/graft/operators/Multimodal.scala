package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MediaCodec

/** Multimodal-column operators: media as opaque `binary` columns with
  * typed metadata, processed in partition-sized batches.
  *
  * The payloads are REAL containers — BMP images, RIFF/WAVE PCM
  * audio, concatenated-BMP video — encoded and decoded by the
  * pure-JVM `MediaCodec` (magic numbers, little-endian headers, row
  * padding, chunk walking). `decodeFeatures` genuinely parses the
  * container and computes features over the decoded pixels/samples;
  * nothing downstream sees the source text the fixtures derive from.
  *
  * At cluster scale the binary payloads dominate I/O; the design
  * keeps them in one column read straight off parquet (no
  * row-explode), processes per-partition via typed `mapPartitions`
  * (amortizing codec init once per task — the same shape a
  * mapInPandas batch UDF has), and emits only small fixed-width
  * features downstream. The feature stats are integer-exact sums, so
  * they aggregate order-independently and oracle-compare exactly.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)
  /** Integer-exact decoded stats + a fixed-width float feature vector.
    * Per kind: image → n_units = pixels, sum_a/b/c = R/G/B channel
    * sums; audio → n_units = samples, sum_a = signed sum, sum_b =
    * abs sum, sum_c = negative-sample count; video → totals across
    * frames of the image stats.
    */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           frame_count: Int, width: Int, height: Int,
                           n_units: Long, sum_a: Long, sum_b: Long,
                           sum_c: Long, feature: Array[Float])
  case class FrameRow(media_id: Long, frame_no: Int, width: Int,
                      height: Int, frame: Array[Byte])

  val FeatureDim = 8

  /** Encoder source row (public: Spark's generated deserializer
    * cannot access a private class).
    */
  case class DocSrc(doc_id: Long, text: String)

  // fixture geometry: image = 16-wide rows of RGB triplets, audio =
  // 8 kHz PCM16 from byte pairs, video = 4x4 frames of 48 bytes
  private final val ImgW = 16
  private final val FrameW = 4
  private final val FrameH = 4
  private final val FrameBytes = FrameW * FrameH * 3
  private final val SampleRate = 8000

  private def kindOf(id: Long): String = (id % 3) match {
    case 0 => "image"; case 1 => "audio"; case _ => "video"
  }

  /** Derive a media table from `documents`: the text bytes become the
    * pixel/sample stream, ENCODED into a real container (BMP / WAV /
    * concatenated-BMP). Gives the plumbing a distributed input whose
    * payloads are genuinely parseable media files. Streams shorter
    * than one image row-block / frame are zero-padded; longer streams
    * truncate to whole pixels/samples/frames.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[DocSrc].mapPartitions { it =>
      it.map { d =>
        val bytes = d.text.getBytes("UTF-8")
        kindOf(d.doc_id) match {
          case "image" =>
            val h = math.max(1, bytes.length / (ImgW * 3))
            val pix = java.util.Arrays.copyOf(bytes, ImgW * 3 * h)
            MediaRow(d.doc_id, "image", MediaCodec.encodeBmp(ImgW, h, pix),
              ImgW, h)
          case "audio" =>
            val n = math.max(1, bytes.length / 2)
            val samples = new Array[Short](n)
            var j = 0
            while (j < n) {
              val lo = if (2 * j < bytes.length) bytes(2 * j) & 0xff else 0
              val hi = if (2 * j + 1 < bytes.length) bytes(2 * j + 1) & 0xff else 0
              samples(j) = (lo | (hi << 8)).toShort
              j += 1
            }
            MediaRow(d.doc_id, "audio", MediaCodec.encodeWav(SampleRate, samples),
              0, 0)
          case _ =>
            val nf = math.max(1, bytes.length / FrameBytes)
            val frames = (0 until nf).map { f =>
              java.util.Arrays.copyOfRange(bytes, f * FrameBytes,
                (f + 1) * FrameBytes) // copyOfRange zero-pads past the end
            }
            MediaRow(d.doc_id, "video",
              MediaCodec.encodeBmpVideo(FrameW, FrameH, frames), FrameW, FrameH)
        }
      }
    }.toDF()
  }

  /** Batch decode: one pass per partition — a real container parse
    * per row (header validation, padding strip, chunk walk), then
    * integer-exact stats over the decoded pixels/samples plus a
    * fixed-width float feature vector for downstream similarity.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        r.kind match {
          case "image" =>
            val (w, h, rgb) = MediaCodec.decodeBmp(r.payload)
            val (sr, sg, sb) = channelSums(rgb)
            mk(r, 1, w, h, w.toLong * h, sr, sg, sb)
          case "audio" =>
            val (_, samples) = MediaCodec.decodeWav(r.payload)
            var sum = 0L; var absSum = 0L; var neg = 0L
            var i = 0
            while (i < samples.length) {
              val s = samples(i).toLong
              sum += s; absSum += math.abs(s); if (s < 0) neg += 1
              i += 1
            }
            mk(r, 1, 0, 0, samples.length.toLong, sum, absSum, neg)
          case _ =>
            val frames = MediaCodec.decodeBmpVideo(r.payload)
            var sr = 0L; var sg = 0L; var sb = 0L; var units = 0L
            frames.foreach { case (w, h, rgb) =>
              val (a, b, c) = channelSums(rgb)
              sr += a; sg += b; sb += c; units += w.toLong * h
            }
            val (w0, h0, _) = frames.head
            mk(r, frames.length, w0, h0, units, sr, sg, sb)
        }
      }
    }
  }

  /** Perceptual image fingerprint (blocked-mean aHash): decode, bucket
    * the pixel grays (r+g+b, scan order) into 64 equal blocks, set
    * bit b iff block b's mean exceeds the global mean — compared as
    * exact integer cross-products (blockSum·n > total·blockN), so the
    * hash is bit-identical in any engine that replays the rule over
    * the same pixels. Robust to brightness-preserving noise the way
    * content hashes (q29's md5) are not: two images differing in a
    * few pixels land within a small hamming distance instead of in
    * different md5 buckets. Packed as two 32-bit halves in BIGINTs
    * (h1 = bits 0-31, h2 = bits 32-63) so SQL engines without
    * unsigned 64-bit shifts replay it without sign-bit traps.
    * Images with fewer than 64 pixels leave their empty blocks at
    * bit 0 (0 > 0 is false) — still deterministic.
    */
  def imageHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "image").mapPartitions { it =>
      it.map { r =>
        val (w, h, rgb) = MediaCodec.decodeBmp(r.payload)
        // bound the loop by the DECODED array, not the header's w*h:
        // rgb.length = 3*w*h is proven by the codec's size require, and
        // an Int bound keeps the index arithmetic overflow-free even
        // against an adversarial header
        require(rgb.length == 3L * w * h, s"decoded size mismatch ${w}x$h")
        val n = rgb.length / 3
        val bs = new Array[Long](64)
        val bn = new Array[Long](64)
        var tot = 0L
        var j = 0
        while (j < n) {
          val g = (rgb(3 * j) & 0xff) + (rgb(3 * j + 1) & 0xff) +
            (rgb(3 * j + 2) & 0xff)
          val b = ((j * 64L) / n).toInt
          bs(b) += g; bn(b) += 1; tot += g
          j += 1
        }
        var h1 = 0L
        var h2 = 0L
        var b = 0
        while (b < 64) {
          if (bs(b) * n > tot * bn(b)) {
            if (b < 32) h1 |= 1L << b else h2 |= 1L << (b - 32)
          }
          b += 1
        }
        (r.media_id, h1, h2)
      }
    }.toDF("media_id", "h1", "h2")
  }

  /** Perceptual audio fingerprint — the [[imageHashes]] rule over the
    * decoded sample stream's ABSOLUTE amplitudes (energy envelope):
    * 64 equal blocks in sample order, bit b set iff block b's mean
    * |amplitude| exceeds the global mean, integer cross-product
    * compares, two 32-bit halves. Same determinism contract: a SQL
    * engine replaying the rule over the same samples reproduces every
    * bit.
    */
  def audioHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "audio").mapPartitions { it =>
      it.map { r =>
        val (_, samples) = MediaCodec.decodeWav(r.payload)
        val n = samples.length.toLong
        val bs = new Array[Long](64)
        val bn = new Array[Long](64)
        var tot = 0L
        var j = 0
        while (j < samples.length) {
          val e = math.abs(samples(j).toLong)
          val b = ((j * 64L) / n).toInt
          bs(b) += e; bn(b) += 1; tot += e
          j += 1
        }
        var h1 = 0L
        var h2 = 0L
        var b = 0
        while (b < 64) {
          if (bs(b) * n > tot * bn(b)) {
            if (b < 32) h1 |= 1L << b else h2 |= 1L << (b - 32)
          }
          b += 1
        }
        (r.media_id, h1, h2)
      }
    }.toDF("media_id", "h1", "h2")
  }

  /** Per-frame perceptual fingerprints for the video modality: decode
    * the container, apply the [[imageHashes]] blocked-mean rule to
    * EVERY frame independently, return (media_id, frame_no, h1, h2).
    * A video's identity for dedup purposes is its frame-fingerprint
    * SET ([[videoNearDups]]) — the keyframe-overlap scheme, robust to
    * re-cuts and frame drops in a way one whole-stream hash is not.
    */
  def videoFrameHashes(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.decodeBmpVideo(r.payload).zipWithIndex.map {
          case ((w, h, rgb), f) =>
            // same decoded-array bound discipline as [[imageHashes]]
            require(rgb.length == 3L * w * h, s"decoded size mismatch ${w}x$h")
            val n = rgb.length / 3
            val bs = new Array[Long](64)
            val bn = new Array[Long](64)
            var tot = 0L
            var j = 0
            while (j < n) {
              val g = (rgb(3 * j) & 0xff) + (rgb(3 * j + 1) & 0xff) +
                (rgb(3 * j + 2) & 0xff)
              val b = ((j * 64L) / n).toInt
              bs(b) += g; bn(b) += 1; tot += g
              j += 1
            }
            var h1 = 0L
            var h2 = 0L
            var b = 0
            while (b < 64) {
              if (bs(b) * n > tot * bn(b)) {
                if (b < 32) h1 |= 1L << b else h2 |= 1L << (b - 32)
              }
              b += 1
            }
            (r.media_id, f.toLong, h1, h2)
        }
      }
    }.toDF("media_id", "frame_no", "h1", "h2")
  }

  /** Video near-duplicate candidates: pairs sharing at least
    * `minShared` DISTINCT frame fingerprints. One equality self-join
    * keyed on the fingerprint value — the q65/contamination shape, so
    * the cost is bucketed by hash, never all-pairs — then a keyed
    * pair count. Returns (id_a, id_b, n_shared), id_a < id_b.
    */
  def videoNearDups(frameHashes: DataFrame, minShared: Int = 2,
                    maxFrameFreq: Long = Long.MaxValue): DataFrame = {
    require(minShared >= 1 && maxFrameFreq >= 1)
    val fsets = frameHashes.select(col("media_id"), col("h1"), col("h2"))
      .distinct()
    // stop-fingerprint cap (the maxShingleFreq discipline): a frame
    // fingerprint present in more than `maxFrameFreq` videos — black
    // frames, title cards, boilerplate intros — is evidence of
    // NOTHING and would make its bucket quadratically hot; dropping
    // it changes semantics the same documented way stop-shingles do
    val eligible =
      if (maxFrameFreq == Long.MaxValue) fsets
      else fsets.join(
        fsets.groupBy(col("h1"), col("h2"))
          .agg(count(lit(1)).as("__vf"))
          .filter(col("__vf") <= maxFrameFreq)
          .select(col("h1"), col("h2")),
        Seq("h1", "h2"), "left_semi")
    eligible.as("l").join(eligible.as("r"),
        col("l.h1") === col("r.h1") && col("l.h2") === col("r.h2") &&
          col("l.media_id") < col("r.media_id"))
      .groupBy(col("l.media_id").as("id_a"), col("r.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Perceptual near-duplicate image pairs at hamming ≤ `maxHamming`
    * over the [[imageHashes]] fingerprints: 4×16-bit banded self-join
    * (the simhash discipline — same-band pairs are the only
    * candidates, and by pigeonhole the banding is COMPLETE for
    * hamming ≤ 3: at most 3 differing bits cannot touch all 4 bands),
    * verified with the exact popcount. Never an all-pairs join — at
    * corpus scale the band join is the whole cost surface, and AQE
    * skew-splitting covers hot bands like every other banded operator
    * here.
    */
  def imageNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingNearDups(hashes, maxHamming)

  /** The banded hamming join itself, generic over any (media_id, h1,
    * h2) fingerprint relation — images ([[imageHashes]]) and audio
    * ([[audioHashes]]) share it. Identical fingerprints CONTRACT to
    * one representative before the band self-join (the family-wide
    * `Dedup.contractBy` discipline): a clone-heavy media corpus —
    * the normal case at crawl scale — would otherwise make every
    * band of the clone cluster quadratically hot. Expansion restores
    * member pairs (intra-cluster pairs are hamming 0), so the output
    * is IDENTICAL to the uncontracted join.
    */
  def hammingNearDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 banding is complete only for hamming <= 3, got $maxHamming")
    // one fingerprint row per media item — tiny, but derived from the
    // DECODE pass; materialize so the contraction probe, the rep
    // relation, and the band/verify consumers all read the cache
    // instead of re-decoding the corpus per consumer
    val keyed = hashes.select(col("media_id").as("id"),
      struct(col("h1"), col("h2")).as("hk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    keyed.count()
    val (groups, members) = Dedup.contractBy(keyed, "id", "hk")
    val reps = groups.select(col("rid").as("id"),
      col("hk.h1").as("h1"), col("hk.h2").as("h2"))
    val mask = lit(0xFFFFL)
    val banded = reps.select(col("id"), col("h1"), col("h2"),
      explode(array(
        struct(lit(0).as("band"), col("h1").bitwiseAND(mask).as("bv")),
        struct(lit(1).as("band"), shiftright(col("h1"), 16).bitwiseAND(mask).as("bv")),
        struct(lit(2).as("band"), col("h2").bitwiseAND(mask).as("bv")),
        struct(lit(3).as("band"), shiftright(col("h2"), 16).bitwiseAND(mask).as("bv"))
      )).as("b"))
      .select(col("id"), col("h1"), col("h2"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val hamming = (bit_count(col("l.h1").bitwiseXOR(col("r.h1"))) +
      bit_count(col("l.h2").bitwiseXOR(col("r.h2")))).cast("int")
    val repPairs = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bv") === col("r.bv") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    Dedup.expandPairs(repPairs, members,
      intraValue = lit(0), valueName = "hamming")
  }

  private def channelSums(rgb: Array[Byte]): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < rgb.length) {
      sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
      i += 3
    }
    (sr, sg, sb)
  }

  private def mk(r: MediaRow, frames: Int, w: Int, h: Int, units: Long,
                 a: Long, b: Long, c: Long): MediaFeatures = {
    val kindId = (r.media_id % 3).toFloat
    val n = math.max(1L, units).toFloat
    MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, frames, w, h,
      units, a, b, c,
      Array(kindId, frames.toFloat, units.toFloat, a / n, b / n, c / n,
        w.toFloat, h.toFloat))
  }

  /** Real nearest-neighbor downsample: decode, keep every `stride`-th
    * pixel column/row (image, per video frame) or every `stride`-th
    * sample with a proportionally reduced sample rate (audio), then
    * re-encode. Bytes-to-smaller-bytes with updated metadata — the
    * actual resize contract, not a byte-stride stub.
    */
  def resize(media: DataFrame, stride: Int = 4): DataFrame = {
    require(stride >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    def shrinkRgb(w: Int, h: Int, rgb: Array[Byte]): (Int, Int, Array[Byte]) = {
      val nw = (w + stride - 1) / stride
      val nh = (h + stride - 1) / stride
      val out = new Array[Byte](nw * nh * 3)
      var y = 0
      while (y < nh) {
        var x = 0
        while (x < nw) {
          val src = ((y * stride) * w + x * stride) * 3
          val dst = (y * nw + x) * 3
          out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
          x += 1
        }
        y += 1
      }
      (nw, nh, out)
    }
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        r.kind match {
          case "image" =>
            val (w, h, rgb) = MediaCodec.decodeBmp(r.payload)
            val (nw, nh, small) = shrinkRgb(w, h, rgb)
            MediaRow(r.media_id, r.kind, MediaCodec.encodeBmp(nw, nh, small), nw, nh)
          case "audio" =>
            val (sr, samples) = MediaCodec.decodeWav(r.payload)
            val dec = Array.range(0, samples.length, stride).map(samples)
            MediaRow(r.media_id, r.kind,
              MediaCodec.encodeWav(math.max(1, sr / stride), dec), 0, 0)
          case _ =>
            val frames = MediaCodec.decodeBmpVideo(r.payload)
            val shrunk = frames.map { case (w, h, rgb) => shrinkRgb(w, h, rgb) }
            val (nw, nh, _) = shrunk.head
            MediaRow(r.media_id, r.kind,
              MediaCodec.encodeBmpVideo(nw, nh, shrunk.map(_._3)), nw, nh)
        }
      }
    }.toDF()
  }

  /** Frame sampling for video payloads: parse the concatenated-BMP
    * container and keep every `everyN`-th frame, each re-emitted as a
    * self-contained single-frame BMP — the shape a downstream vision
    * featurizer consumes. Non-video rows are filtered out (they have
    * no frame structure).
    */
  def sampleFrames(media: DataFrame, everyN: Int = 2): Dataset[FrameRow] = {
    require(everyN >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.decodeBmpVideo(r.payload).zipWithIndex.collect {
          case ((w, h, rgb), i) if i % everyN == 0 =>
            FrameRow(r.media_id, i, w, h, MediaCodec.encodeBmp(w, h, rgb))
        }
      }
    }
  }
}
