package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-sized batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub (`StubCodec`) — but everything
  * Spark-side is real and tested: the schema, the binary column
  * handling, the batch-shaped `mapPartitions` pipeline, and the
  * feature-vector output that feeds Similarity.
  *
  * At cluster scale the binary payloads dominate I/O; the design
  * keeps them in one column read straight off parquet (no
  * row-explode), processes per-partition (amortizing codec init once
  * per task, the same shape a Pandas-UDF/mapInPandas batch has), and
  * emits only small fixed-width features downstream.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           frame_count: Int, feature: Array[Float])

  /** STUB codec — deterministic fake in place of a real image/audio
    * decode (libs absent in this container). Real deployments swap
    * `decode` for e.g. a JPEG decoder; the signature (bytes in,
    * fixed-width float features out) is the contract.
    */
  object StubCodec {
    val FeatureDim = 8
    /** ??? in spirit: a rolling byte hash folded into FeatureDim
      * floats — stands in for decode+feature-extract.
      */
    def decode(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Long](FeatureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % FeatureDim) = acc(i % FeatureDim) * 31 + (payload(i) & 0xff)
        i += 1
      }
      acc.map(v => ((v & 0xffff).toFloat / 65535.0f))
    }
    /** Deterministic frame sampling: one "frame" per 64 bytes. */
    def frameCount(payload: Array[Byte]): Int = math.max(1, payload.length / 64)
  }

  /** Derive a media table from `documents` (text bytes as the opaque
    * payload) — gives the plumbing a real distributed input.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 640 + 16).cast("int").as("width"),
      (col("n_chars") % 480 + 16).cast("int").as("height"))

  /** Batch decode: one pass per partition, codec "initialized" once
    * per task — the Scala analogue of a mapInPandas batch UDF.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-task codec init would go here
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          StubCodec.frameCount(r.payload), StubCodec.decode(r.payload))
      }
    }
  }

  /** "Resize": deterministic stub for the image-resize step — real
    * deployments decode → resample → re-encode; the plumbing contract
    * is bytes-to-smaller-bytes with updated metadata. The stub keeps
    * every `stride`-th byte (columnar expressions only; the payload
    * never leaves the JVM row format).
    */
  def resize(media: DataFrame, stride: Int = 4): DataFrame = {
    require(stride >= 1)
    val hexed = hex(col("payload"))
    // keep every stride-th byte = every stride-th hex PAIR
    val kept = regexp_replace(hexed,
      "(..)" + ("(..)" * (stride - 1)), "$1")
    media
      .withColumn("payload", unhex(kept))
      .withColumn("width", greatest(lit(1), (col("width") / stride).cast("int")))
      .withColumn("height", greatest(lit(1), (col("height") / stride).cast("int")))
  }

  /** Frame sampling for video-kind payloads: one 64-byte "frame"
    * every `everyN` frames, exploded to (media_id, frame_no, frame)
    * rows — the shape a downstream vision featurizer consumes.
    */
  def sampleFrames(media: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN >= 1)
    val frameCount = greatest(lit(1), (length(col("payload")) / 64).cast("int"))
    media
      .withColumn("frame_no",
        explode(sequence(lit(0), frameCount - 1, lit(everyN))))
      .select(col("media_id"), col("kind"), col("frame_no"),
        col("payload").substr(col("frame_no") * 64 + 1, lit(64)).as("frame"))
  }
}
